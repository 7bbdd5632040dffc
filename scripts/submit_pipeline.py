#!/usr/bin/env python3
"""Training-data corpus pipeline — the spark-submit surface for the
LLM-data-side operators (the crawl side's sibling job):

    spark-submit --py-files crawl4ai_scraper_spark.zip scripts/submit_pipeline.py \
        --input s3://lake/documents --output s3://lake/clean_corpus

Locally (this sandbox):

    python scripts/submit_pipeline.py \
        --input /root/testdata/sf0.01/documents.parquet \
        --output /root/repo/.tmp/clean_corpus

Stages (each optional via flags, all composed as ONE lazy plan except the
iterative cluster step):

  0. host boilerplate strip          (--boilerplate-strip: CCNet/Onion
     site-chrome removal — text REWRITE, so it runs before anything that
     reads the text; all-boilerplate docs vanish)
  1. Gopher-style quality filter     (pure projection — scan speed)
  2. naive-Bayes classifier filter   (--nb-label-lang: train log-odds
     weights on the corpus, broadcast them back, keep score > threshold —
     the fastText-style model-based filtering stage)
  2b. bigram-LM perplexity filter    (--ppl-keep-quantile / --ppl-max:
     CCNet-style — train an add-α or Kneser-Ney (--ppl-model kn) bigram
     LM on the corpus or a --ppl-train-lang trusted slice, keep the
     most-natural docs)
  3. exact dedup                     (md5 groupBy keep-min-id, one shuffle)
  4. near-dup MinHash-LSH → connected components → keep-one-per-cluster
     (band equi-join carries ids only; min-label propagation rounds)
  4a. benchmark decontamination     (--decontaminate EVAL.parquet: drop
     docs whose n-grams overlap the eval suite — broadcast gram set)
  4b. quality-weighted subsetting   (--weighted-sample-k: deterministic
     Efraimidis-Spirakis K-doc sample, quality-proportional, after dedup
     so duplicates can't buy extra tickets)
  4b1. containment dedup           (--containment: one-sided near-dup via
     the prefix-filtered overlap join — drops the SHORTER side of every
     excerpt⊂document pair symmetric Jaccard cannot see)
  4b2. SemDeDup semantic dedup     (--semdedup EMB.parquet: cell-bounded
     embedding cosine, keep-most-atypical survivor per duplicate
     relation — catches paraphrases the shingle passes miss)
  4c. DSIR importance resampling    (--dsir-k K --dsir-target-lang XX:
     hashed-ngram profiles of the target slice vs the surviving corpus →
     per-doc log importance weights → Gumbel-top-k without replacement —
     distribution-matching selection, Xie et al. 2023)
  4d. exact per-group quota          (--quota-per-group K: balanced final
     selection — exactly K docs per --quota-group-col via the
     screen-then-trim sampler, no hot-group window sort)
  5. enrichment: lang-ID, quality, token counts, fingerprint, repetition
     signals (pure projection)
  6. optional BPE tokenization (--bpe-merges: distributed word count +
     driver-side merge learning, Arrow re-segmentation, broadcast serving
     map → n_pieces / pieces columns on the survivors; --bpe-load reuses a
     saved tokenizer instead of training; --bpe-save persists merges +
     piece vocabulary as a portable JSON artifact; --bpe-encode appends
     dense-id token_ids under the piece vocabulary)
  7. optional sequence packing (--pack-seq-len L: the encoded corpus laid
     end-to-end into L-token drop-last training sequences via the two-phase
     global cumsum → a second (seq_id, n_docs, token_ids) parquet output)
  8. parquet write + one-line JSON summary on stdout

The stage order is the cost-correct one for 100 TB: the cheap filters first
(shrinks everything downstream), exact dedup before near-dup (shrinks the
pair graph), enrichment and tokenization last (only survivors pay them).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="LLM training-data corpus pipeline")
    p.add_argument("--input", required=True, help="documents parquet path")
    p.add_argument("--output", help="output parquet path (omit with --dry-run)")
    p.add_argument("--id-col", default="doc_id")
    p.add_argument("--text-col", default="text")
    p.add_argument("--skip-filter", action="store_true", help="skip the Gopher filter stage")
    p.add_argument("--skip-exact-dedup", action="store_true")
    p.add_argument("--skip-near-dup", action="store_true")
    p.add_argument("--min-jaccard", type=float, default=0.8,
                   help="near-dup verify threshold (default 0.8)")
    p.add_argument("--n-hashes", type=int, default=8)
    p.add_argument("--n-bands", type=int, default=4)
    p.add_argument("--strip-spans", type=int, default=0, metavar="K",
                   help="exact-substring dedup rewrite: strip repeated K-token "
                        "spans, first copy wins (rewrites the text column to "
                        "the whitespace-normalized surviving tokens)")
    p.add_argument("--nb-label-lang", metavar="XX",
                   help="model-based quality filter: train a naive-Bayes "
                        "classifier with (lang == XX) as the positive class "
                        "and keep docs scoring above --nb-threshold")
    p.add_argument("--nb-threshold", type=float, default=None,
                   help="absolute score cut (score > T). At small corpus "
                        "sizes the Laplace +V smoothing shifts all scores "
                        "when the class totals are unbalanced, so the "
                        "quantile cut below is the calibration-free default")
    p.add_argument("--nb-keep-quantile", type=float, default=0.5,
                   help="keep the top fraction of docs by classifier score "
                        "(default 0.5; ignored when --nb-threshold is set)")
    p.add_argument("--nb-vocab-size", type=int, default=1000)
    p.add_argument("--ppl-keep-quantile", type=float, default=None, metavar="Q",
                   help="CCNet-style LM filter: keep the Q lowest-cross-"
                        "entropy fraction of docs under a bigram LM "
                        "(trained on the corpus itself, or on the "
                        "--ppl-train-lang slice)")
    p.add_argument("--ppl-max", type=float, default=None,
                   help="absolute perplexity cut (keep ppl <= X); takes "
                        "precedence over --ppl-keep-quantile")
    p.add_argument("--ppl-model", choices=["addk", "kn"], default="addk",
                   help="LM family for the perplexity filter: add-α bigram "
                        "(default) or interpolated Kneser-Ney (KenLM-style)")
    p.add_argument("--ppl-train-lang", metavar="XX",
                   help="train the LM on the (lang == XX) slice only — the "
                        "CCNet trusted-corpus arrangement; default trains "
                        "on all surviving docs")
    p.add_argument("--decontaminate", metavar="EVAL.parquet",
                   help="drop docs whose word n-grams overlap the eval "
                        "suite beyond --decontaminate-threshold (broadcast "
                        "eval-gram set; the pre-training contamination gate)")
    p.add_argument("--decontaminate-col", default="text")
    p.add_argument("--decontaminate-n", type=int, default=3)
    p.add_argument("--decontaminate-threshold", type=float, default=0.05)
    p.add_argument("--bpe-merges", type=int, default=0, metavar="N",
                   help="learn N BPE merges on the surviving corpus and "
                        "append (n_pieces, pieces) subword columns")
    p.add_argument("--bpe-load", metavar="TOK.json",
                   help="skip training: segment/encode under a saved "
                        "tokenizer artifact (see --bpe-save)")
    p.add_argument("--bpe-save", metavar="TOK.json",
                   help="persist the trained tokenizer (merges + piece "
                        "vocabulary) as a portable JSON artifact")
    p.add_argument("--bpe-vocab-size", type=int, default=32768,
                   help="piece-vocabulary size for --bpe-save/--bpe-encode "
                        "(default 32768)")
    p.add_argument("--bpe-encode", action="store_true",
                   help="also append dense-id columns (n_bpe_pieces, "
                        "token_ids) under the trained/loaded tokenizer")
    p.add_argument("--pack-seq-len", type=int, default=0, metavar="L",
                   help="with --bpe-encode: pack the encoded corpus into "
                        "L-token training sequences (drop-last)")
    p.add_argument("--pack-shuffle-salt", default=None, metavar="SALT",
                   help="pack in deterministic pseudo-random (md5) order "
                        "instead of id order — the per-epoch training "
                        "shuffle; a different salt is a fresh shuffle")
    p.add_argument("--pack-output", metavar="DIR",
                   help="where the packed (seq_id, n_docs, token_ids) "
                        "sequences land (default <output>_sequences)")
    p.add_argument("--weighted-sample-k", type=int, default=0, metavar="K",
                   help="after dedup, keep a K-doc quality-weighted sample "
                        "(Efraimidis-Spirakis without replacement; "
                        "deterministic — same salt, same subset)")
    p.add_argument("--weighted-sample-salt", default="w1")
    p.add_argument("--dsir-k", type=int, default=0, metavar="K",
                   help="DSIR importance resampling: keep K docs sampled "
                        "∝ exp(log target/raw hashed-ngram likelihood "
                        "ratio) toward the --dsir-target-lang slice "
                        "(Gumbel-top-k, deterministic)")
    p.add_argument("--dsir-target-lang", metavar="XX",
                   help="the target distribution for --dsir-k: docs whose "
                        "lang (metadata column, else the lang_id heuristic) "
                        "equals XX")
    p.add_argument("--dsir-buckets", type=int, default=4096,
                   help="hashed-ngram feature buckets (default 4096)")
    p.add_argument("--dsir-salt", default="g1")
    p.add_argument("--containment", action="store_true",
                   help="one-sided near-dup pass (containment >= "
                        "--containment-threshold over word shingles): drop "
                        "the shorter doc of each excerpt-in-document pair")
    p.add_argument("--containment-threshold", type=float, default=0.8,
                   help="containment cut (converted to an exact fraction "
                        "for the integer-exact threshold math)")
    p.add_argument("--semdedup", metavar="EMB.parquet",
                   help="SemDeDup semantic dedup (Abbas et al. 2023): drop "
                        "docs whose embedding loses the cell-bounded "
                        "keep-most-atypical rule; the parquet must carry "
                        "(--semdedup-id-col, --semdedup-vec-col)")
    p.add_argument("--semdedup-threshold", type=float, default=0.96)
    p.add_argument("--semdedup-cells", type=int, default=64)
    p.add_argument("--semdedup-id-col", default="vec_id")
    p.add_argument("--semdedup-vec-col", default="embedding")
    p.add_argument("--semdedup-dim", type=int, default=64)
    p.add_argument("--boilerplate-strip", action="store_true",
                   help="host-scoped boilerplate segment removal (CCNet/"
                        "Onion site-chrome pass) BEFORE quality filters; "
                        "needs --host-col on the input")
    p.add_argument("--host-col", default="source")
    p.add_argument("--boilerplate-min-docs", type=int, default=3)
    p.add_argument("--boilerplate-ratio-pct", type=int, default=10)
    p.add_argument("--quota-per-group", type=int, default=0, metavar="K",
                   help="final EXACT K-docs-per-group sample (screen-then-"
                        "trim, no hot-group window sort)")
    p.add_argument("--quota-group-col", default="lang",
                   help="grouping column for --quota-per-group")
    p.add_argument("--quota-salt", default="q1")
    p.add_argument("--split", action="store_true",
                   help="append a deterministic train/validation/test column")
    p.add_argument("--val-rate", type=float, default=0.01)
    p.add_argument("--test-rate", type=float, default=0.01)
    p.add_argument("--shuffle-partitions", type=int, default=None)
    p.add_argument("--dry-run", action="store_true",
                   help="print the physical plan of each stage; no write")
    return p.parse_args(argv)


def run_pipeline(spark, args):
    from pyspark.sql import functions as F

    from crawl4ai_scraper_spark.operators import textops as T
    from crawl4ai_scraper_spark.operators.clustering import dedup_survivors, dup_clusters
    from crawl4ai_scraper_spark.operators.dedup import minhash_lsh_pairs, text_key

    ic, tc = args.id_col, args.text_col
    docs = spark.read.parquet(args.input)
    summary = {"input_rows": docs.count()}

    if args.boilerplate_strip:
        # text REWRITE, so it runs before anything that reads the text:
        # strip each host's repeated chrome, drop all-boilerplate docs
        from crawl4ai_scraper_spark.operators.dedup import host_boilerplate_strip

        cleaned = host_boilerplate_strip(
            docs, tc, ic, args.host_col,
            min_docs=args.boilerplate_min_docs,
            ratio_pct=args.boilerplate_ratio_pct,
        ).select(ic, F.col("clean_text"))
        docs = docs.drop(tc).join(cleaned, ic).withColumnRenamed("clean_text", tc)
        summary["after_boilerplate_strip"] = docs.count()

    if not args.skip_filter:
        flags = T.gopher_filter(docs, tc, ic).filter(F.col("keep")).select(ic)
        docs = docs.join(flags, ic)  # AQE broadcasts / shuffles as sizes dictate
        summary["after_filter"] = docs.count()

    if args.nb_label_lang:
        # label source: a `lang` metadata column when the input has one,
        # else the heuristic lang_id over the text (the same signal stage 5
        # enriches with); NULL langs are explicitly negative examples
        lang_col = F.col("lang") if "lang" in docs.columns else T.lang_id(F.col(tc))
        labeled = docs.withColumn(
            "_y", F.coalesce(lang_col == args.nb_label_lang, F.lit(False))
        )
        weights = T.nb_token_weights(labeled, tc, "_y",
                                     vocab_size=args.nb_vocab_size)
        scored = T.nb_score(docs, tc, ic, weights).persist()
        if args.nb_threshold is not None:
            kept = scored.filter(F.col("score") > args.nb_threshold)
        else:
            # top-quantile keep: one scalar percentile agg broadcast back —
            # calibration-free (same shape as ccnet quality_buckets)
            q = max(0.0, min(1.0, 1.0 - args.nb_keep_quantile))
            cut = scored.agg(
                F.percentile(F.col("score").cast("double"), q).alias("c")
            )
            kept = scored.crossJoin(F.broadcast(cut)).filter(
                F.col("score").cast("double") >= F.col("c")
            )
        docs = docs.join(kept.select(F.col("id").alias(ic)), ic)
        summary["after_nb_filter"] = docs.count()

    if args.ppl_keep_quantile is not None or args.ppl_max is not None:
        # CCNet-style LM filter: cross-entropy under an add-α bigram model;
        # lower = more natural. The kept docs carry (xent_bits, ppl) into
        # the output so downstream bucketing can reuse the signal.
        train = None
        if args.ppl_train_lang:
            lang_col = F.col("lang") if "lang" in docs.columns else T.lang_id(F.col(tc))
            train = docs.filter(
                F.coalesce(lang_col == args.ppl_train_lang, F.lit(False))
            )
        lm = (T.kn_lm_perplexity if args.ppl_model == "kn"
              else T.bigram_lm_perplexity)
        scored = lm(docs, tc, ic, train=train).persist()
        if args.ppl_max is not None:
            kept = scored.filter(F.col("ppl") <= args.ppl_max)
        else:
            q = max(0.0, min(1.0, args.ppl_keep_quantile))
            cut = scored.agg(
                F.percentile(F.col("xent_bits").cast("double"), q).alias("c")
            )
            kept = scored.crossJoin(F.broadcast(cut)).filter(
                F.col("xent_bits").cast("double") <= F.col("c")
            )
        docs = docs.join(kept.select(ic, "xent_bits", "ppl"), ic)
        summary["after_ppl_filter"] = docs.count()

    if not args.skip_exact_dedup:
        keep = (
            docs.groupBy(text_key(F.col(tc)).alias("_k"))
            .agg(F.min(F.col(ic)).alias(ic))
            .select(ic)
        )
        docs = docs.join(keep, ic)
        summary["after_exact_dedup"] = docs.count()

    if not args.skip_near_dup:
        pairs = minhash_lsh_pairs(
            docs, tc, ic, k=3, n_hashes=args.n_hashes, n_bands=args.n_bands,
            jaccard_threshold=args.min_jaccard,
        )
        clusters = dup_clusters(pairs)
        docs = dedup_survivors(docs, clusters, ic)
        summary["after_near_dup"] = docs.count()

    if args.strip_spans:
        from crawl4ai_scraper_spark.operators.dedup import strip_dup_spans

        rewritten = strip_dup_spans(docs, tc, ic, k=args.strip_spans).select(
            F.col("id").alias(ic), "text_stripped", "kept_tokens"
        )
        docs = (
            docs.drop(tc)
            .join(rewritten, ic)
            .withColumnRenamed("text_stripped", tc)
        )
        summary["after_strip_spans"] = docs.count()

    if args.containment:
        # one-sided pass AFTER symmetric near-dup: the cluster stage already
        # collapsed high-Jaccard copies, so what remains here is exactly the
        # excerpt⊂document class; drop the shorter side (ties: larger id)
        from fractions import Fraction

        from crawl4ai_scraper_spark.operators.dedup import containment_pairs

        frac = Fraction(args.containment_threshold).limit_denominator(1000)
        pairs = containment_pairs(
            docs, tc, ic, k=3, num=frac.numerator, den=frac.denominator
        )
        nw = docs.select(
            F.col(ic).alias("_cid"),
            F.size(F.split(F.trim(F.col(tc)), "\\s+")).alias("_nw"),
        )
        sized = (
            pairs.join(
                nw.select(F.col("_cid").alias("id_a"), F.col("_nw").alias("_na")),
                "id_a",
            ).join(
                nw.select(F.col("_cid").alias("id_b"), F.col("_nw").alias("_nb")),
                "id_b",
            )
        )
        losers = sized.select(
            F.when(F.col("_na") < F.col("_nb"), F.col("id_a"))
            .when(F.col("_nb") < F.col("_na"), F.col("id_b"))
            .otherwise(F.greatest("id_a", "id_b"))
            .alias(ic)
        ).distinct()
        docs = docs.join(losers, ic, "left_anti")
        summary["after_containment"] = docs.count()

    if args.semdedup:
        # semantic dedup after the lexical passes: MinHash catches copies,
        # SemDeDup catches paraphrases/translations the shingles miss
        from crawl4ai_scraper_spark.operators.similarity import semdedup

        emb = spark.read.parquet(args.semdedup)
        marks = semdedup(
            emb, args.semdedup_id_col, args.semdedup_vec_col,
            threshold=args.semdedup_threshold, n_cells=args.semdedup_cells,
            dim=args.semdedup_dim,
        )
        # docs without an embedding row survive (left join, keep-null)
        losers = marks.filter(~F.col("keep")).select(
            F.col("vec_id").alias(ic)
        )
        docs = docs.join(losers, ic, "left_anti")
        summary["after_semdedup"] = docs.count()

    if args.decontaminate:
        eval_df = spark.read.parquet(args.decontaminate)
        scores = T.contamination_vs(
            docs, tc, ic, eval_df, eval_text_col=args.decontaminate_col,
            n=args.decontaminate_n, threshold=args.decontaminate_threshold,
        )
        # docs with NO n-gram rows (shorter than n tokens) have no score
        # row and must survive — so drop the contaminated set via anti join
        # rather than inner-joining the clean set
        dirty = scores.filter(F.col("contaminated")).select(ic)
        docs = docs.join(dirty, ic, "left_anti")
        summary["after_decontaminate"] = docs.count()

    if args.dsir_k:
        # DSIR (Xie et al. 2023): match the kept corpus to the target-lang
        # slice's hashed-ngram distribution. Runs after dedup/decontamination
        # (duplicates can't stuff the raw profile) and before the quality
        # sample — distribution first, quality within it.
        if not args.dsir_target_lang:
            raise SystemExit("--dsir-k requires --dsir-target-lang")
        from crawl4ai_scraper_spark.operators import selection as SEL

        lang_col = F.col("lang") if "lang" in docs.columns else T.lang_id(F.col(tc))
        target = docs.filter(
            F.coalesce(lang_col == args.dsir_target_lang, F.lit(False))
        )
        tp = SEL.dsir_profile(target, tc, ic, n_buckets=args.dsir_buckets)
        rp = SEL.dsir_profile(docs, tc, ic, n_buckets=args.dsir_buckets)
        w = SEL.dsir_log_weights(docs, tc, ic, tp, rp, n_buckets=args.dsir_buckets)
        kept = SEL.dsir_select(w, ic, k=args.dsir_k, salt=args.dsir_salt)
        docs = docs.join(kept.select(ic), ic)
        summary["after_dsir"] = docs.count()

    if args.weighted_sample_k:
        # quality-weighted corpus subsetting (Efraimidis-Spirakis without
        # replacement): higher-quality docs are proportionally likelier to
        # survive, but no hard cutoff — the long tail keeps diversity. Runs
        # after dedup so duplicates can't buy extra tickets.
        kept = T.weighted_sample(
            docs, ic, T.quality_score(F.col(tc)) + F.lit(1e-3),
            k=args.weighted_sample_k, salt=args.weighted_sample_salt,
        )
        docs = docs.join(kept.select(ic), ic)
        summary["after_weighted_sample"] = docs.count()

    if args.quota_per_group:
        # exact K per group as the LAST selection stage — balanced output
        # regardless of how skewed the surviving corpus is
        docs = T.quota_sample(
            docs, ic, args.quota_group_col, args.quota_per_group,
            salt=args.quota_salt,
        ).drop("sample_rank")
        summary["after_quota_sample"] = docs.count()

    if args.split:
        docs = T.dataset_split(docs, ic, val_rate=args.val_rate,
                               test_rate=args.test_rate)

    enriched = docs.select(
        "*",
        T.lang_id(F.col(tc)).alias("lang_pred"),
        T.quality_score(F.col(tc)).alias("quality"),
        T.token_count_ws(F.col(tc)).alias("n_ws_tokens"),
        T.token_count_bpe(F.col(tc)).cast("bigint").alias("n_bpe_tokens"),
        T.fingerprint(F.col(tc)).alias("fp"),
        T.dup_word_fraction(F.col(tc)).alias("dup_word_frac"),
        T.dup_ngram_fraction(F.col(tc), 3).alias("dup_3gram_frac"),
        T.mean_word_length(F.col(tc)).alias("mean_word_len"),
        T.symbol_word_ratio(F.col(tc)).alias("symbol_ratio"),
    )

    packed_out = None
    if args.bpe_merges or args.bpe_load:
        from crawl4ai_scraper_spark.operators import bpe as B

        # the surviving corpus is consumed three times below (word count,
        # serving map, segmentation join-back) — cut the filter/dedup/
        # cluster lineage once instead of recomputing it per consumer
        enriched = enriched.persist()
        vocab = None
        if args.bpe_load:
            merges, vocab_rows = B.load_tokenizer(args.bpe_load)
            vocab = B.vocab_frame(spark, vocab_rows)
            summary["bpe_artifact"] = args.bpe_load
        else:
            merges = B.bpe_train_local(enriched, tc, n_merges=args.bpe_merges)
            summary["bpe_merges_learned"] = len(merges)
        serving = B.apply_merges_arrow(B.word_syms(enriched, tc), merges)
        if (args.bpe_save or args.bpe_encode or args.pack_seq_len) and vocab is None:
            vocab = B.piece_vocab(serving, vocab_size=args.bpe_vocab_size)
        if args.bpe_save:
            B.save_tokenizer(args.bpe_save, merges, vocab)
            summary["bpe_artifact"] = args.bpe_save
        seg = B.bpe_segment(enriched, tc, ic, serving).select(
            F.col("id").alias(ic), "n_pieces", "pieces"
        )
        # LEFT join: tokenization must never change the row set (null/empty
        # texts have no token rows and would vanish under an inner join)
        enriched = enriched.join(seg, ic, "left").withColumn(
            "n_pieces", F.coalesce(F.col("n_pieces"), F.lit(0))
        )
        if args.bpe_encode or args.pack_seq_len:
            enc = B.bpe_encode_ids(enriched, tc, ic, serving, vocab, unk_id=0)
            enriched = enriched.join(
                enc.select(F.col("id").alias(ic), "token_ids"), ic, "left"
            )
            if args.pack_seq_len:
                from crawl4ai_scraper_spark.operators.packing import (
                    pack_token_ids,
                    packed_sequences,
                )

                packed = pack_token_ids(enc, "id", "token_ids",
                                        seq_len=args.pack_seq_len,
                                        shuffle_salt=args.pack_shuffle_salt)
                packed_out = packed_sequences(packed, "id", args.pack_seq_len)

    if args.dry_run:
        enriched.explain("formatted")
        if packed_out is not None:
            packed_out.explain("formatted")
    else:
        enriched.write.mode("overwrite").parquet(args.output)
        out = spark.read.parquet(args.output)
        summary["output_rows"] = out.count()
        summary["output_path"] = args.output
        if packed_out is not None:
            pdir = args.pack_output or args.output.rstrip("/") + "_sequences"
            packed_out.write.mode("overwrite").parquet(pdir)
            summary["sequences_written"] = spark.read.parquet(pdir).count()
            summary["sequences_path"] = pdir
    return summary


def main(argv=None):
    args = parse_args(argv)
    if not args.dry_run and not args.output:
        print("error: --output required unless --dry-run", file=sys.stderr)
        return 2

    from crawl4ai_scraper_spark.session import build_session
    from crawl4ai_scraper_spark.sizing import autosize_path

    # Self-size from the input's parquet footers (VERDICT r4 #2) unless the
    # caller pinned --shuffle-partitions; driver heap derived + asserted
    # against host memory at submit time, env vars as overrides.
    sizing = autosize_path(args.input, int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    spark = build_session(app_name="corpus-pipeline",
                          shuffle_partitions=(args.shuffle_partitions
                                              or sizing.shuffle_partitions),
                          extra_conf={"spark.driver.memory": sizing.driver_memory})
    spark.sparkContext.setLogLevel("WARN")
    summary = run_pipeline(spark, args)
    print(json.dumps(summary))
    return 0


if __name__ == "__main__":
    sys.exit(main())
