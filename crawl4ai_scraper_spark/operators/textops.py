"""Text-analysis operators over a document table — native Column builders.

Scale notes: every function here is a pure Column expression — no shuffle, no
UDF, fully pipelined inside whole-stage codegen; at 100 TB these run at scan
speed. Stopword lists are tiny literals (broadcast-free).
"""

from __future__ import annotations

from typing import Dict, List

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Deterministic mini stopword lists (ordered; the CASE chain below must use
# the same order as the SQL oracle for tie-breaking).
STOPWORDS = {
    "en": ["the", "a", "of", "and", "to", "in", "is"],
    "de": ["der", "die", "das", "und", "ist", "ein", "zu"],
    "fr": ["le", "la", "les", "et", "est", "un", "une"],
    "es": ["el", "la", "los", "y", "es", "un", "una"],
}
LANG_ORDER = ["en", "de", "fr", "es"]

# BPE-ish token regex: letter runs | digit runs | single non-space symbol.
BPE_TOKEN_RX = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"


def tokens(text: Column) -> Column:
    """Whitespace tokenization (empty-safe)."""
    return F.split(F.trim(text), "\\s+")


def token_count_ws(text: Column) -> Column:
    return F.when(F.length(F.trim(text)) == 0, F.lit(0)).otherwise(F.size(tokens(text)))


def token_count_bpe(text: Column) -> Column:
    """Count of BPE-ish tokens — letters / digits / punctuation pieces."""
    return F.size(F.regexp_extract_all(text, F.lit(BPE_TOKEN_RX), 0))


def stopword_hits(text: Column, lang: str) -> Column:
    words = STOPWORDS[lang]
    toks = tokens(F.lower(text))
    return F.size(F.filter(toks, lambda t: t.isin(*words)))


def lang_id(text: Column) -> Column:
    """Heuristic language-ID: most stopword hits wins, ties resolved in
    LANG_ORDER; zero hits everywhere → 'und'. Same CASE chain as the SQL
    oracle so results hash-match."""
    s = {lang: stopword_hits(text, lang) for lang in LANG_ORDER}
    return (
        F.when(
            (s["en"] > 0) & (s["en"] >= s["de"]) & (s["en"] >= s["fr"]) & (s["en"] >= s["es"]),
            F.lit("en"),
        )
        .when((s["de"] > 0) & (s["de"] >= s["fr"]) & (s["de"] >= s["es"]), F.lit("de"))
        .when((s["fr"] > 0) & (s["fr"] >= s["es"]), F.lit("fr"))
        .when(s["es"] > 0, F.lit("es"))
        .otherwise(F.lit("und"))
    )


def punct_count(text: Column) -> Column:
    return F.size(F.regexp_extract_all(text, F.lit("[^A-Za-z0-9\\s]"), 0))


def quality_score(text: Column) -> Column:
    """Composite quality in [0,1]: length saturation, stopword ratio, low
    punctuation density — rounded to 4dp for cross-engine hash stability."""
    n_tok = token_count_ws(text).cast("double")
    sw = stopword_hits(text, "en").cast("double")
    punct = punct_count(text).cast("double")
    len_part = F.least(F.lit(1.0), n_tok / F.lit(100.0))
    sw_part = F.least(F.lit(1.0), F.lit(4.0) * sw / F.greatest(n_tok, F.lit(1.0)))
    punct_part = F.greatest(F.lit(0.0), F.lit(1.0) - punct / F.greatest(n_tok, F.lit(1.0)))
    return F.round(F.lit(0.4) * len_part + F.lit(0.3) * sw_part + F.lit(0.3) * punct_part, 4)


def fingerprint(text: Column) -> Column:
    """Document fingerprint = md5 of the whitespace-collapsed, lowercased
    first-100-char prefix — the reference's extracted-part dedup key
    (selector_utils.py:199-210, O-31) promoted to a document operator."""
    norm = F.substring(F.regexp_replace(F.lower(text), "\\s+", " "), 1, 100)
    return F.md5(norm)


# ---------------------------------------------------------------------------
# Repetition / quality-filter signals (Gopher-style; Rae et al. 2021 §A1.1)
# ---------------------------------------------------------------------------
# All column builders below are pure expressions (no shuffle, codegen'd);
# the only shuffled repetition op is top_ngram_stats, which needs a per-doc
# mode and uses the explode→groupBy→min-struct shape (map-side combine, keys
# uniform in doc_id — no skew at any corpus size).

def words(text: Column) -> Column:
    """Lowercased whitespace tokens (the repetition-signal token unit)."""
    return F.split(F.trim(F.lower(text)), "\\s+")


def ngrams_from_tokens(toks: Column, n: int) -> Column:
    """Word n-grams from an ALREADY-MATERIALIZED token-array column; docs
    shorter than n yield one joined gram (same degenerate-case convention as
    dedup.shingles).

    Built as an (n-1)-fold ``zip_with`` of shifted slices rather than
    ``transform(sequence, i -> concat_ws(slice(toks, i+1, n)))``: the
    per-gram slice in the lambda is evaluated interpreted and re-walks the
    array per gram — measured 8.7× slower at sf0.1 (identical output
    multiset). Callers that explode the grams should still materialize the
    tokens in a prior select so the split isn't re-run per consumer.

    Null-token convention: a NULL array element nulls the WHOLE gram it
    appears in (``concat`` semantics; the pre-rewrite ``concat_ws`` silently
    skipped nulls instead). Every in-repo caller passes ``split()`` output,
    which never contains null elements; callers with nullable elements must
    coalesce them first. The negative-length ``slice`` in the short-doc case
    is reached only under the ``when(cnt < n)`` guard — do not hoist ``arr``
    out of the conditional."""
    cnt = F.size(toks)
    m = cnt - (n - 1)  # gram count when cnt >= n
    arr = F.slice(toks, 1, m)
    for j in range(1, n):
        arr = F.zip_with(
            arr,
            F.slice(toks, 1 + j, m),
            lambda a, b: F.concat(a, F.lit(" "), b),
        )
    return F.when(cnt < n, F.array(F.concat_ws(" ", toks))).otherwise(arr)


def word_ngrams(text: Column, n: int) -> Column:
    """Word n-grams of a text column (for pure-projection ratio use; see
    ngrams_from_tokens for the explode path)."""
    return ngrams_from_tokens(words(text), n)


def dup_word_fraction(text: Column) -> Column:
    """1 − distinct/total over words: fraction of word occurrences that are
    repeats of an earlier word."""
    w = words(text)
    n = F.size(w).cast("double")
    return F.round(
        F.lit(1.0) - F.size(F.array_distinct(w)).cast("double") / F.greatest(n, F.lit(1.0)), 4
    )


def dup_ngram_fraction(text: Column, n: int) -> Column:
    """1 − distinct/total over word n-grams (Gopher's duplicate-n-gram
    fraction, word-stream form)."""
    g = word_ngrams(text, n)
    total = F.size(g).cast("double")
    return F.round(
        F.lit(1.0) - F.size(F.array_distinct(g)).cast("double") / F.greatest(total, F.lit(1.0)),
        4,
    )


def mean_word_length(text: Column) -> Column:
    """Mean characters per whitespace word, 4dp."""
    n = token_count_ws(text).cast("double")
    chars = F.length(F.regexp_replace(F.trim(text), "\\s+", "")).cast("double")
    return F.round(chars / F.greatest(n, F.lit(1.0)), 4)


def symbol_word_ratio(text: Column) -> Column:
    """Non-alphanumeric symbols per word, 4dp (Gopher's symbol-to-word)."""
    return F.round(
        punct_count(text).cast("double")
        / F.greatest(token_count_ws(text).cast("double"), F.lit(1.0)),
        4,
    )


# Gopher-inspired keep thresholds, adapted to the synthetic word-stream corpus
# (documents are 20-100-word single-line streams, so the 50-word floor of the
# paper would reject most of the corpus; the STRUCTURE of each rule is the
# paper's).
GOPHER_MIN_WORDS = 20
GOPHER_MAX_WORDS = 100_000
GOPHER_MIN_MEAN_WORD_LEN = 2.0
GOPHER_MAX_MEAN_WORD_LEN = 10.0
GOPHER_MAX_SYMBOL_RATIO = 0.1
GOPHER_MIN_STOPWORD_HITS = 2
GOPHER_MAX_DUP_3GRAM_FRAC = 0.25


def gopher_flags(text: Column) -> Dict[str, Column]:
    """Named boolean pass/fail columns for each Gopher-style rule."""
    n = token_count_ws(text)
    return {
        "ok_word_count": (n >= GOPHER_MIN_WORDS) & (n <= GOPHER_MAX_WORDS),
        "ok_mean_word_len": (mean_word_length(text) >= GOPHER_MIN_MEAN_WORD_LEN)
        & (mean_word_length(text) <= GOPHER_MAX_MEAN_WORD_LEN),
        "ok_symbol_ratio": symbol_word_ratio(text) <= GOPHER_MAX_SYMBOL_RATIO,
        "ok_stopwords": stopword_hits(text, "en") >= GOPHER_MIN_STOPWORD_HITS,
        "ok_dup_3gram": dup_ngram_fraction(text, 3) <= GOPHER_MAX_DUP_3GRAM_FRAC,
    }


def gopher_filter(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Per-doc rule flags + overall keep verdict. Pure projection — runs at
    scan speed; at 100 TB this is the pre-dedup corpus filter pass."""
    flags = gopher_flags(F.col(text_col))
    keep = None
    cols = [F.col(id_col)]
    for name, c in flags.items():
        cols.append(c.alias(name))
        keep = c if keep is None else (keep & c)
    return df.select(*cols, keep.alias("keep"))


def top_ngram_stats(df: DataFrame, text_col: str, id_col: str, n: int = 2) -> DataFrame:
    """Most frequent word n-gram per document plus the fraction of the doc's
    non-space characters it accounts for (Gopher's top-n-gram character
    fraction).

    Shape: explode → groupBy(id, gram) count → min-struct argmax per id.
    Two shuffles, both keyed by (or prefixed with) the uniform doc id — at
    100 TB this is two linear passes with map-side combine; ties break
    deterministically (highest count, then lexicographically smallest gram).
    """
    toks = df.select(
        F.col(id_col).alias("_id"),
        F.length(F.regexp_replace(F.trim(F.col(text_col)), "\\s+", "")).alias("_chars"),
        words(F.col(text_col)).alias("_toks"),
    )
    base = toks.select(
        "_id", "_chars", F.explode(ngrams_from_tokens(F.col("_toks"), n)).alias("gram")
    )
    counts = base.groupBy("_id", "_chars", "gram").agg(F.count(F.lit(1)).alias("cnt"))
    best = counts.groupBy("_id", "_chars").agg(
        F.min(F.struct((-F.col("cnt")).alias("neg"), F.col("gram").alias("g"))).alias("top")
    )
    return best.select(
        F.col("_id").alias(id_col),
        F.col("top.g").alias("top_gram"),
        (-F.col("top.neg")).alias("top_count"),
        F.round(
            (-F.col("top.neg")).cast("double")
            * F.length(F.regexp_replace(F.col("top.g"), "\\s+", "")).cast("double")
            / F.greatest(F.col("_chars").cast("double"), F.lit(1.0)),
            4,
        ).alias("top_char_frac"),
    )


# ---------------------------------------------------------------------------
# Deterministic sampling + PII redaction (training-data pipeline utilities)
# ---------------------------------------------------------------------------

# Regexes restricted to the Java-regex ∩ RE2 common subset so the SAME
# pattern string runs in Spark (Java) and the DuckDB oracle (RE2).
EMAIL_RX = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
PHONE_RX = "\\+?[0-9]{3}-[0-9]{3,4}-[0-9]{4}"
IPV4_RX = "\\b([0-9]{1,3}\\.){3}[0-9]{1,3}\\b"


def redact_pii(text: Column) -> Column:
    """Replace emails / dashed phone numbers / IPv4 literals with typed
    placeholder tags — pure regexp_replace chain, codegen'd, scan-speed."""
    out = F.regexp_replace(text, EMAIL_RX, "<EMAIL>")
    out = F.regexp_replace(out, PHONE_RX, "<PHONE>")
    return F.regexp_replace(out, IPV4_RX, "<IP>")


def pii_counts(text: Column) -> Dict[str, Column]:
    """Per-doc counts of each PII kind (for filtering / audit columns)."""
    return {
        "n_emails": F.size(F.regexp_extract_all(text, F.lit(EMAIL_RX), 0)),
        "n_phones": F.size(F.regexp_extract_all(text, F.lit(PHONE_RX), 0)),
        "n_ips": F.size(F.regexp_extract_all(text, F.lit(IPV4_RX), 0)),
    }


def sample_digest(key_col: Column, salt: str) -> Column:
    """The shared 3-hex-digit sampling digest: substring(md5(salt:key),1,3).
    Single source of the repeatable-slice protocol used by hash_sample,
    stratified_sample and similarity.cluster_balance — 1/4096 granularity,
    engine/partitioning-independent; compare against format(steps,'03x')."""
    return F.substring(
        F.md5(F.concat(F.lit(salt + ":"), key_col.cast("string"))), 1, 3
    )


def hash_sample(df: DataFrame, key_col: str, rate: float, salt: str = "s1") -> DataFrame:
    """Deterministic, engine-reproducible sampling: keep rows where
    md5(salt ‖ key) is lexicographically below a hex threshold — a pure
    filter (no shuffle, no RNG state) whose selection is stable across runs,
    engines, partitionings and cluster sizes, with 1/4096 rate granularity.

    This is how a 100 TB pipeline takes repeatable dev/eval slices: the same
    (salt, rate) always selects the same rows, different salts give
    independent slices, and the filter pushes down to the scan."""
    steps = max(0, min(4096, round(rate * 4096)))
    if steps >= 4096:
        return df
    return df.filter(sample_digest(F.col(key_col), salt) < F.lit(format(steps, "03x")))


def stratified_sample(
    df: DataFrame,
    key_col: str,
    strata_col: str,
    rates: Dict[str, float],
    default_rate: float = 0.0,
    salt: str = "s1",
) -> DataFrame:
    """Per-stratum deterministic sampling — e.g. language rebalancing of a
    training corpus ({'en': 0.1, 'de': 0.5, ...}). Same md5-threshold
    mechanics as hash_sample so every stratum's selection is repeatable and
    nested across rates; one CASE expression, still a pure pushed-down
    filter (no shuffle, no per-stratum passes)."""
    digest3 = sample_digest(F.col(key_col), salt)

    def thresh(rate: float) -> str:
        return format(max(0, min(4096, round(rate * 4096))), "03x")

    expr = None
    for stratum, rate in sorted(rates.items()):
        cond = F.col(strata_col) == stratum
        hit = F.lit(True) if rate >= 1.0 else (digest3 < F.lit(thresh(rate)))
        expr = F.when(cond, hit) if expr is None else expr.when(cond, hit)
    default_hit = (
        F.lit(True) if default_rate >= 1.0
        else (digest3 < F.lit(thresh(default_rate))) if default_rate > 0.0
        else F.lit(False)
    )
    keep = default_hit if expr is None else expr.otherwise(default_hit)
    return df.filter(keep)


def normalize_text(text: Column) -> Column:
    """Canonical text normalization before hashing/dedup: Unicode NFC via a
    vectorized Arrow UDF (Spark has no native NFC), then control-char strip
    and whitespace collapse natively. The NFC step is the ONLY Python here
    and it is pandas_udf-batched — at 100 TB it rides the same scan pass as
    the rest of the projection."""
    normed = _nfc_udf(text)
    no_ctrl = F.regexp_replace(normed, "[\\x00-\\x08\\x0b\\x0c\\x0e-\\x1f\\x7f]", "")
    return F.trim(F.regexp_replace(no_ctrl, "\\s+", " "))


def _make_nfc_udf():
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    def _nfc(s):
        import unicodedata

        return s.map(lambda x: None if x is None else unicodedata.normalize("NFC", x))

    # real type objects (module uses `from __future__ import annotations`, so
    # inline hints would be unresolvable strings to pandas_udf)
    _nfc.__annotations__ = {"s": pd.Series, "return": pd.Series}
    return pandas_udf("string")(_nfc)


class _LazyNfc:
    """Defer pandas_udf creation until first use (needs an active session)."""

    _fn = None

    def __call__(self, col):
        if _LazyNfc._fn is None:
            _LazyNfc._fn = _make_nfc_udf()
        return _LazyNfc._fn(col)


_nfc_udf = _LazyNfc()


def bm25_scores(
    df: DataFrame,
    text_col: str,
    id_col: str,
    query_terms: List[str],
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Okapi BM25 relevance of every document against a fixed query-term set
    (Robertson et al.; the idf form is ln((N − df + 0.5)/(df + 0.5) + 1)).

    Scale shape: term frequencies are per-row array math (no explode); the
    corpus statistics (N, avgdl, per-term document frequencies) are ONE
    single-row aggregate cross-joined back as a broadcast — so the whole op
    is a scan + one scalar-sized agg, no per-term passes and no shuffle of
    document payloads. All float math is the same expression tree the DuckDB
    oracle evaluates, rounded to 4dp at the end."""
    toks = words(F.col(text_col))

    def term_freq(term: str) -> Column:
        # closure, NOT a defaulted lambda parameter: a 2-arg lambda would be
        # interpreted by F.filter as (element, index)
        return F.size(F.filter(toks, lambda x: x == F.lit(term))).cast("double")

    base = df.select(
        F.col(id_col),
        F.size(toks).cast("double").alias("_dl"),
        *[term_freq(t).alias(f"_tf_{i}") for i, t in enumerate(query_terms)],
    )
    stats = base.agg(
        F.count(F.lit(1)).cast("double").alias("_n"),
        (F.sum("_dl") / F.count(F.lit(1))).alias("_avgdl"),
        *[
            F.sum(F.when(F.col(f"_tf_{i}") > 0, 1).otherwise(0))
            .cast("double").alias(f"_df_{i}")
            for i in range(len(query_terms))
        ],
    )
    joined = base.crossJoin(F.broadcast(stats))
    score = None
    for i in range(len(query_terms)):
        idf = F.log(
            (F.col("_n") - F.col(f"_df_{i}") + F.lit(0.5))
            / (F.col(f"_df_{i}") + F.lit(0.5)) + F.lit(1.0)
        )
        tf = F.col(f"_tf_{i}")
        part = idf * (tf * F.lit(k1 + 1.0)) / (
            tf + F.lit(k1) * (F.lit(1.0 - b) + F.lit(b) * F.col("_dl") / F.col("_avgdl"))
        )
        score = part if score is None else score + part
    return joined.select(id_col, F.round(score, 4).alias("bm25"))


def corpus_topk_ngrams(df: DataFrame, text_col: str, n: int = 2, k: int = 20) -> DataFrame:
    """Corpus-wide vocabulary statistics: the k most frequent word n-grams
    with their counts, ordered (count desc, gram asc).

    Shape: explode → groupBy(gram) with map-side combine → TakeOrdered
    (orderBy + limit compiles to TakeOrderedAndProject: per-partition top-k
    heaps, k rows to the driver — no global sort, no single-partition
    window). Vocabulary keys follow a Zipf distribution, but partial
    aggregation collapses the hot head map-side, so the shuffle carries at
    most distinct-grams-per-partition rows.
    """
    toks = df.select(words(F.col(text_col)).alias("_toks"))
    grams = toks.select(F.explode(ngrams_from_tokens(F.col("_toks"), n)).alias("gram"))
    counts = grams.groupBy("gram").agg(F.count(F.lit(1)).alias("cnt"))
    return counts.orderBy(F.col("cnt").desc(), F.col("gram")).limit(k)


def contamination(
    df: DataFrame,
    text_col: str,
    id_col: str,
    eval_mod: int = 97,
    n: int = 3,
    threshold: float = 0.05,
) -> DataFrame:
    """Benchmark decontamination: flag training docs whose word n-grams
    overlap the held-out eval slice's n-gram set (the standard "n-gram
    collision" test-set-contamination check run before LLM training).

    The eval set here is the deterministic slice ``id % eval_mod == 0`` of
    the same table (in production: the benchmark suite). Its distinct n-gram
    set is SMALL relative to the corpus — eval suites are MBs against a
    100 TB corpus — so the plan broadcasts it into the scan side:

    * eval grams: filter → explode → distinct (one small shuffle);
    * train side: explode distinct grams per doc, LEFT join against
      broadcast(eval grams) — no corpus-wide shuffle on gram; the only
      big-data shuffle is the per-doc count groupBy on doc_id (uniform key);
    * at eval sets too large for a broadcast hash table, the same shape
      degrades to a bloom-filter pre-gate + shuffled semi-join.

    Per-doc n-grams are SET-deduped (array_distinct) so the fraction is
    set-overlap, not occurrence-weighted. Output: (doc_id, n_grams, n_hits,
    contaminated_frac, contaminated) over the train slice only.
    """
    grams = F.array_distinct(ngrams_from_tokens(F.col("_toks"), n))
    base = df.select(
        F.col(id_col), words(F.col(text_col)).alias("_toks")
    ).select(F.col(id_col), grams.alias("_g"))
    eval_side = base.filter(F.col(id_col) % eval_mod == 0).select("_g")
    train = base.filter(F.col(id_col) % eval_mod != 0)
    return _contamination_counts(train, eval_side, id_col, threshold)


def _contamination_counts(train_grams, eval_grams, id_col, threshold):
    """Shared core: train (_g gram arrays keyed by id) scored against the
    broadcast distinct gram set of eval (_g arrays)."""
    ev = (
        eval_grams.select(F.explode("_g").alias("gram"))
        .distinct()
        .withColumn("hit", F.lit(1))
    )
    stream = train_grams.select(F.col(id_col), F.explode("_g").alias("gram"))
    counted = (
        stream.join(F.broadcast(ev), "gram", "left")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_grams"), F.count("hit").alias("n_hits"))
    )
    frac = F.round(F.col("n_hits") / F.col("n_grams"), 4)
    return counted.select(
        F.col(id_col),
        F.col("n_grams"),
        F.col("n_hits"),
        frac.alias("contaminated_frac"),
        (frac >= F.lit(threshold)).alias("contaminated"),
    )


def contamination_vs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    eval_df: DataFrame,
    eval_text_col: str = "text",
    n: int = 3,
    threshold: float = 0.05,
) -> DataFrame:
    """``contamination`` against an EXTERNAL eval corpus (the production
    arrangement: the benchmark suite lives in its own table). Same plan
    shape — the eval suite's distinct n-gram set broadcasts into the train
    scan; the only corpus-volume shuffle is the per-doc count groupBy."""
    grams = F.array_distinct(ngrams_from_tokens(F.col("_toks"), n))
    train = df.select(
        F.col(id_col), words(F.col(text_col)).alias("_toks")
    ).select(F.col(id_col), grams.alias("_g"))
    ev = eval_df.select(words(F.col(eval_text_col)).alias("_toks")).select(
        grams.alias("_g")
    )
    return _contamination_counts(train, ev, id_col, threshold)


def c4_filter(
    df: DataFrame,
    text_col: str,
    id_col: str,
    min_words_per_line: int = 5,
    min_lines: int = 3,
    require_terminal_punct: bool = True,
) -> DataFrame:
    """C4-style line/document cleaning (Raffel et al. 2020, §2.2 of the T5
    paper): keep only lines with ≥ ``min_words_per_line`` words (and, when
    ``require_terminal_punct``, ending in terminal punctuation ``. ! ? "``);
    drop whole documents that retain fewer than ``min_lines`` lines, mention
    "lorem ipsum", or contain ``{`` (the code-page heuristic).

    Pure Column math — line split, lambda filter, rejoin — no UDF, no
    shuffle: at 100 TB this runs at scan speed inside whole-stage codegen,
    exactly like the Gopher signals above. Output keeps both the verdict and
    the cleaned text so the pipeline can either filter or rewrite.
    """
    text = F.col(text_col)

    def _keep(line: Column) -> Column:
        t = F.trim(line)
        wc = F.size(F.filter(F.split(t, "\\s+"), lambda w: w != ""))
        cond = wc >= F.lit(min_words_per_line)
        if require_terminal_punct:
            cond = cond & t.rlike('[.!?"”]$')
        return cond

    lines = F.split(text, "\n")
    kept = F.filter(lines, _keep)
    has_lorem = F.lower(text).contains("lorem ipsum")
    has_brace = text.contains("{")
    return df.select(
        F.col(id_col),
        F.size(lines).alias("n_lines"),
        F.size(kept).alias("n_kept_lines"),
        F.array_join(kept, "\n").alias("kept_text"),
        has_lorem.alias("has_lorem"),
        has_brace.alias("has_brace"),
        (
            (F.size(kept) >= F.lit(min_lines)) & ~has_lorem & ~has_brace
        ).alias("keep"),
    )


def unigram_lm_scores(
    df: DataFrame,
    text_col: str,
    id_col: str,
    vocab_size: int = 1000,
    alpha: float = 0.5,
) -> DataFrame:
    """CCNet-style unigram-LM scoring: fit a unigram language model on the
    corpus (top-``vocab_size`` tokens by frequency, ties broken
    lexicographically), then score every document by its mean token
    log-probability; ``perplexity = exp(-avg_logprob)``. CCNet buckets docs
    into head/middle/tail on exactly this kind of score (there with a
    KenLM 5-gram; the unigram model keeps this sandbox dependency-free while
    exercising the same plan shape).

    Scale shape (two passes, both shuffle-light):
    * **fit** — token counts with map-side combine (one shuffle at distinct-
      token volume, not token volume), then ``orderBy(cnt desc, tok).limit``
      = TakeOrderedAndProject — no global sort; the resulting vocab is a
      model artifact of ≤ vocab_size rows.
    * **score** — the corpus token stream LEFT-joins the *broadcast* vocab
      (OOV tokens get the ``ln(alpha/total)`` floor) and aggregates per doc:
      the only big-data shuffle is the map-side-combined per-doc partial sum.
    Per-token log-probs are rounded to 12dp and summed in DECIMAL(28,12) so
    the sum is order-free and an external oracle reproduces it exactly.

    In production the LM is fit on a reference corpus (CCNet uses Wikipedia)
    and only the score pass touches the 100 TB corpus; fitting on ``df``
    itself (as here) adds one more scan but no new shuffle shape.
    """
    toks = df.select(F.col(id_col), F.explode(words(F.col(text_col))).alias("tok"))
    counts = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("cnt"))
    # total from the (distinct-token-sized) counts, not a second corpus scan;
    # Catalyst reuses the token-count exchange for both consumers.
    total_row = counts.agg(F.sum("cnt").cast("double").alias("_total"))
    vocab = (
        counts.orderBy(F.col("cnt").desc(), F.col("tok"))
        .limit(vocab_size)
        .crossJoin(F.broadcast(total_row))
        .select(
            "tok",
            F.round(F.log(F.col("cnt") / F.col("_total")), 12)
            .cast("decimal(28,12)")
            .alias("logp"),
        )
    )
    floor_lp = (
        F.round(F.log(F.lit(float(alpha)) / F.col("_total")), 12).cast("decimal(28,12)")
    )
    scored = (
        toks.join(F.broadcast(vocab), "tok", "left")
        .crossJoin(F.broadcast(total_row))
        .select(F.col(id_col), F.coalesce(F.col("logp"), floor_lp).alias("lp"))
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_tokens"), F.sum("lp").alias("_sum"))
    )
    avg = F.col("_sum").cast("double") / F.col("n_tokens")
    return scored.select(
        F.col(id_col),
        F.col("n_tokens"),
        F.round(avg, 6).alias("avg_logprob"),
        F.round(F.exp(-avg), 4).alias("perplexity"),
    )


def length_percentiles(
    df: DataFrame, value_col: str, group_col: str
) -> DataFrame:
    """Exact per-group quantiles (p25/p50/p75/p90) + count/mean of a numeric
    column — the corpus length-distribution report that decides truncation
    and packing budgets before training. Uses the exact ``percentile``
    aggregate (linear interpolation at rank (n-1)·p, the same convention as
    DuckDB/Postgres ``quantile_cont``): one shuffle on the group key; at
    100 TB swap in ``approx_percentile`` for a sketch-merge of the same
    shape when groups no longer fit the exact buffer."""
    v = F.col(value_col)
    return df.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(F.avg(v), 6).alias("mean_val"),
        F.round(F.percentile(v, F.lit(0.25)), 6).alias("p25"),
        F.round(F.percentile(v, F.lit(0.5)), 6).alias("p50"),
        F.round(F.percentile(v, F.lit(0.75)), 6).alias("p75"),
        F.round(F.percentile(v, F.lit(0.9)), 6).alias("p90"),
    )


def quality_buckets(
    df: DataFrame,
    text_col: str,
    id_col: str,
    vocab_size: int = 1000,
    alpha: float = 0.5,
) -> DataFrame:
    """CCNet head/middle/tail quality bucketing: score every doc with the
    unigram LM, compute the corpus perplexity terciles, and label each doc
    by which side of the cuts it falls on.

    The scale-relevant part is HOW the terciles are applied: not a global
    ``ntile(3)`` window (one partition sorting the whole corpus) but a
    2-value percentile aggregate broadcast back into the scan — the
    compute-thresholds-then-broadcast pattern that replaces any
    whole-corpus-ordering window at 100 TB."""
    scored = unigram_lm_scores(df, text_col, id_col, vocab_size, alpha)
    cuts = scored.agg(
        F.round(F.percentile(F.col("perplexity"), F.lit(1.0 / 3)), 6).alias("c1"),
        F.round(F.percentile(F.col("perplexity"), F.lit(2.0 / 3)), 6).alias("c2"),
    )
    return scored.crossJoin(F.broadcast(cuts)).select(
        F.col(id_col),
        F.col("perplexity"),
        F.when(F.col("perplexity") <= F.col("c1"), F.lit("head"))
        .when(F.col("perplexity") <= F.col("c2"), F.lit("middle"))
        .otherwise(F.lit("tail"))
        .alias("bucket"),
    )


def mixture_weights(
    df: DataFrame,
    source_col: str,
    text_col: str,
    targets: Dict[str, float],
) -> DataFrame:
    """Data-mixture rebalancing (Pile/Dolma-style): given target corpus
    shares per source, compute each source's actual token share and the
    per-source keep rate (≤1) that realizes the target under downsampling;
    ``oversample_factor`` reports how far above 1× an undersized source
    would need replication. Feed ``keep_rate`` into ``hash_sample`` for the
    deterministic filter pass.

    One groupBy(source) aggregate (map-side combined) + a scalar total
    broadcast back — sources number in the dozens, so every join side after
    the first agg is tiny."""
    tok = F.when(
        F.length(F.trim(F.col(text_col))) == 0, F.lit(0)
    ).otherwise(F.size(F.split(F.trim(F.col(text_col)), "\\s+")))
    stats = df.groupBy(source_col).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(tok).alias("tokens"),
    )
    total = stats.agg(F.sum("tokens").cast("double").alias("_total"))
    pairs = []
    for k in sorted(targets):
        pairs += [F.lit(k), F.lit(float(targets[k]))]
    tmap = F.create_map(*pairs)
    tgt = F.coalesce(tmap[F.col(source_col)], F.lit(0.0))
    raw = tgt * F.col("_total") / F.col("tokens")
    return stats.crossJoin(F.broadcast(total)).select(
        F.col(source_col),
        F.col("n_docs"),
        F.col("tokens"),
        F.round(F.col("tokens") / F.col("_total"), 6).alias("actual_share"),
        tgt.alias("target_share"),
        F.round(F.least(F.lit(1.0), raw), 6).alias("keep_rate"),
        F.round(raw, 4).alias("oversample_factor"),
    )


def token_windows(
    df: DataFrame,
    text_col: str,
    id_col: str,
    window: int = 128,
    stride: int = 96,
) -> DataFrame:
    """Training-sample chunking: split each document into fixed-size
    whitespace-token windows with overlap (window=128 / stride=96 → 32-token
    overlap, the standard sliding-context prep before packing/embedding).
    Output: (id, win_idx, win_start, n_win_tokens, win_text) — one row per
    window, short tail windows kept, empty docs dropped.

    Pure column math at scan speed (split → sequence of start offsets →
    posexplode → slice + array_join): no shuffle at all — the explode is a
    narrow Generate, so the operator composes with downstream groupBys
    without adding an exchange of its own."""
    toks = F.split(F.trim(F.col(text_col)), "\\s+")
    n = F.when(F.length(F.trim(F.col(text_col))) == 0, F.lit(0)).otherwise(F.size(toks))
    starts = F.sequence(F.lit(0), F.greatest(n - 1, F.lit(0)), F.lit(stride))
    slim = df.select(
        F.col(id_col).alias("id"), toks.alias("_toks"), n.alias("_n"), starts.alias("_starts")
    ).filter(F.col("_n") > 0)
    win = slim.select(
        "id", "_toks", "_n",
        F.posexplode("_starts").alias("win_idx", "win_start"),
    )
    piece = F.slice(F.col("_toks"), F.col("win_start") + 1, window)
    return win.select(
        "id",
        "win_idx",
        "win_start",
        F.least(F.lit(window), F.col("_n") - F.col("win_start")).alias("n_win_tokens"),
        F.array_join(piece, " ").alias("win_text"),
    )


def vocab_build(df: DataFrame, text_col: str, vocab_size: int = 1000) -> DataFrame:
    """Corpus vocabulary: the top-``vocab_size`` tokens by (count desc, token
    asc) with dense ids 1..V. Token counting shuffles at DISTINCT-token
    volume with map-side combine; the TakeOrderedAndProject top-V avoids a
    global sort, and the id-assigning window runs over the ≤V-row model
    artifact only — never over the corpus."""
    from pyspark.sql import Window

    counts = (
        df.select(F.explode(words(F.col(text_col))).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    top = counts.orderBy(F.col("cnt").desc(), F.col("tok")).limit(vocab_size)
    w = Window.orderBy(F.col("cnt").desc(), F.col("tok"))
    return top.select("tok", F.row_number().over(w).cast("int").alias("token_id"))


def vocab_encode(
    df: DataFrame,
    text_col: str,
    id_col: str,
    vocab: DataFrame,
    oov_id: int = 0,
) -> DataFrame:
    """Tokenize-to-ids: every document's token stream mapped through the
    (broadcast) vocabulary, OOV → ``oov_id``, original token order preserved.
    → (id, n_tokens, token_ids array<int>). One corpus-volume shuffle — the
    per-doc reassembly groupBy; the vocab join is a broadcast, so hot tokens
    ("the") never skew an exchange. The packing/windowing ops compose
    downstream (sequence_pack consumes n_tokens; token_windows the text)."""
    stream = df.select(
        F.col(id_col).alias("id"),
        F.posexplode(words(F.col(text_col))).alias("pos", "tok"),
    )
    enc = stream.join(F.broadcast(vocab), "tok", "left").select(
        "id", "pos",
        F.coalesce(F.col("token_id"), F.lit(oov_id)).cast("int").alias("tid"),
    )
    packed = enc.groupBy("id").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "tid"))), lambda s: s["tid"]
        ).alias("token_ids"),
    )
    return packed


def dataset_split(
    df: DataFrame,
    key_col: str,
    val_rate: float = 0.01,
    test_rate: float = 0.01,
    salt: str = "s1",
) -> DataFrame:
    """Deterministic train/validation/test assignment — the same
    md5-threshold scheme as ``hash_sample`` (engine/partitioning/run stable,
    1/4096 granularity, different salts give independent splits): the hash
    band [0, val) → validation, [val, val+test) → test, the rest → train.
    A pure projected CASE at scan speed — no shuffle, no RNG state; every
    row lands in exactly one split, forever."""
    val_steps = max(0, min(4096, round(val_rate * 4096)))
    test_steps = max(0, min(4096 - val_steps, round(test_rate * 4096)))

    def _thr(steps: int) -> str:
        # 'g' sorts above every 3-char hex digest → the band is "everything"
        # (format(4096) would be the 4-char '1000', which compares WRONG
        # against 3-char digests — the hash_sample steps>=4096 guard, here
        # as a saturating threshold so val+test can legitimately cover 100%)
        return format(steps, "03x") if steps < 4096 else "g"

    digest = F.substring(
        F.md5(F.concat(F.lit(salt + ":"), F.col(key_col).cast("string"))), 1, 3
    )
    split = (
        # NULL keys have no stable hash identity: assign them explicitly (and
        # documentedly) to train rather than letting them fall through the
        # null comparisons in silence
        F.when(F.col(key_col).isNull(), F.lit("train"))
        .when(digest < F.lit(_thr(val_steps)), F.lit("validation"))
        .when(digest < F.lit(_thr(val_steps + test_steps)), F.lit("test"))
        .otherwise(F.lit("train"))
    )
    return df.withColumn("split", split)


def host_reputation(
    df: DataFrame,
    source_col: str = "source",
    text_col: str = "text",
    prior_weight: float = 25.0,
    prior_mean: float = 0.5,
) -> DataFrame:
    """Bayesian-smoothed per-host quality — the crawl-prioritization signal
    (OPIC/quality-biased frontier ordering: hosts whose pages score well get
    their outlinks crawled first; cf. reference crawler.py's single-host
    politeness loop, which has no cross-host ordering at all).

        reputation = (Σ quality + w·m) / (n + w)

    with prior mean ``m`` and prior weight ``w``: a host with few pages is
    pulled toward the neutral prior, so one lucky page can't promote a spam
    host above a consistently good one.

    Scale shape: per-doc quality is pure column math at scan speed; the only
    shuffle is ONE map-side-combined groupBy on the host key (each partition
    pre-collapses to its distinct hosts before the exchange, so hot hosts
    don't skew). The per-doc scores are 4dp-rounded and summed as
    DECIMAL(18,4) — exact, order-free arithmetic, so the result is identical
    under any partitioning (and hash-stable vs the SQL oracle); the division
    happens once per host, in DOUBLE, after the exact sums.

    Output: (host, reputation, n_docs). Feed straight into ``run_crawl``'s
    priority mode as a host-keyed signal frame."""
    q = quality_score(F.col(text_col)).cast("decimal(18,4)")
    return (
        df.select(F.col(source_col).alias("host"), q.alias("q"))
        .groupBy("host")
        .agg(
            F.round(
                (F.sum("q").cast("double") + F.lit(prior_weight * prior_mean))
                / (F.count(F.lit(1)).cast("double") + F.lit(prior_weight)),
                4,
            ).alias("reputation"),
            F.count(F.lit(1)).alias("n_docs"),
        )
    )


def nb_token_weights(
    df: DataFrame,
    text_col: str,
    label_col: str,
    vocab_size: int = 1000,
) -> DataFrame:
    """Train a naive-Bayes text classifier's token weights — the
    distributed stand-in for the fastText quality classifier every modern
    pretraining pipeline runs (GPT-3/LLaMA/RefinedWeb: score each page by a
    linear model over its tokens, trained good-corpus-vs-crawl).

    Per top-``vocab_size`` token (by total count, ties lexicographic):

        weight = ln((pos_cnt + 1) / (pos_total + V))
               - ln((neg_cnt + 1) / (neg_total + V))

    Laplace-smoothed log-odds with V = ``vocab_size``. Output
    ``(tok, weight DECIMAL(28,12), pos_cnt, neg_cnt)`` — a bounded model
    artifact for broadcasting into the scoring scan.

    Scale shape: ONE corpus-volume explode feeding a map-side-combined
    groupBy at distinct-token key space (per-class counts as conditional
    sums — no second pass); totals reduce from the counts frame, not the
    corpus; the top-V cut is TakeOrderedAndProject. Weights are per-row
    double math rounded to 12dp then DECIMAL — exact, order-free, and
    reproducible by the SQL oracle."""
    lbl = F.col(label_col).cast("boolean")
    toks = df.select(
        lbl.alias("_y"), F.explode(words(F.col(text_col))).alias("tok")
    )
    counts = toks.groupBy("tok").agg(
        F.sum(F.when(F.col("_y"), 1).otherwise(0)).alias("pos_cnt"),
        F.sum(F.when(F.col("_y"), 0).otherwise(1)).alias("neg_cnt"),
    )
    totals = counts.agg(
        F.sum("pos_cnt").cast("double").alias("_pt"),
        F.sum("neg_cnt").cast("double").alias("_nt"),
    )
    top = (
        counts.orderBy((F.col("pos_cnt") + F.col("neg_cnt")).desc(), F.col("tok"))
        .limit(vocab_size)
        .crossJoin(F.broadcast(totals))
    )
    v = float(vocab_size)
    w = F.log((F.col("pos_cnt") + 1.0) / (F.col("_pt") + v)) - F.log(
        (F.col("neg_cnt") + 1.0) / (F.col("_nt") + v)
    )
    return top.select(
        "tok",
        F.round(w, 12).cast("decimal(28,12)").alias("weight"),
        "pos_cnt",
        "neg_cnt",
    )


def nb_score(
    df: DataFrame,
    text_col: str,
    id_col: str,
    weights: DataFrame,
    prior: float = 0.0,
) -> DataFrame:
    """Score documents under trained naive-Bayes token weights →
    ``(id, n_tokens, score, keep)``: score = prior + Σ weight(tok) (OOV
    tokens contribute 0), keep = score > 0 — the classifier-filter verdict.

    The weight table (≤ vocab_size rows) is broadcast into the corpus token
    stream, so hot tokens never skew an exchange; the per-doc sum is the one
    map-side-combined corpus-volume shuffle. DECIMAL sums keep the score
    exact under any partitioning; the prior (a scalar, e.g. ln(P+1 docs /
    N+1 docs) computed upstream) is rounded into the same DECIMAL grid."""
    stream = df.select(
        F.col(id_col).alias("id"),
        F.explode(words(F.col(text_col))).alias("tok"),
    )
    joined = stream.join(F.broadcast(weights.select("tok", "weight")), "tok", "left")
    zero = F.lit(0).cast("decimal(28,12)")
    prior_c = F.round(F.lit(float(prior)), 12).cast("decimal(18,12)")
    agg = joined.groupBy("id").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.sum(F.coalesce(F.col("weight"), zero)).alias("_s"),
    )
    # The SUM comes out as DECIMAL(38,12); adding the prior at that precision
    # would overflow 38 and make Spark silently drop to scale 11 (re-rounding
    # the exact sum). Narrow the sum first — |score| < 10^24 is guaranteed by
    # |weight| < 100 and < 10^22 tokens/doc — so the add stays exact.
    score = (F.col("_s").cast("decimal(36,12)") + prior_c).cast("decimal(38,12)")
    # keep is decided on the exact DECIMAL score; the OUTPUT score column is
    # cast to DOUBLE (the 12dp value converts identically in Spark and DuckDB)
    # so downstream pandas canonicalization renders both engines the same —
    # trailing-zero DECIMALs do not (VERDICT r2 fix #1).
    return agg.select(
        "id", "n_tokens",
        score.cast("double").alias("score"), (score > 0).alias("keep"),
    )


# ---------------------------------------------------------------------------
# Bigram language-model perplexity (CCNet-style quality signal)
# ---------------------------------------------------------------------------
# CCNet / RefinedWeb-style pipelines keep or bucket documents by their
# perplexity under a small LM trained on a trusted corpus. This is that
# signal with a self-contained bigram model: add-alpha smoothed
# p(w2 | w1) = (C(w1 w2) + a) / (C(w1) + a*V), first token scored by the
# unigram p(w) = (C(w) + a) / (N + a*V); per-doc cross-entropy in
# bits/token and perplexity 2^H.
#
# Scale shape: two count aggregations (unigram, bigram — explode →
# groupBy, map-side combine), two equi-joins of the scoring stream
# against the count tables (broadcast when the vocabulary is small,
# sort-merge above; the probe side is Zipf-skewed on hot grams — counts
# side is one row per gram, AQE skew-join splits oversized probe
# partitions), one final groupBy doc. (N, V) are two driver scalars.

def _bigram_structs(toks: Column) -> Column:
    """Per-position (w1, 'w1 w2') structs; docs under 2 tokens yield an
    EMPTY array (a true conditional LM has no bigram events there — unlike
    ngrams_from_tokens' degenerate whole-text gram)."""
    cnt = F.size(toks)
    pairs = F.transform(
        F.sequence(F.lit(1), cnt - 1),
        lambda i: F.struct(
            F.element_at(toks, i).alias("w1"),
            F.concat_ws(
                " ", F.element_at(toks, i), F.element_at(toks, i + 1)
            ).alias("gram"),
        ),
    )
    return F.when(
        cnt < 2, F.array().cast("array<struct<w1:string,gram:string>>")
    ).otherwise(pairs)


def bigram_lm_perplexity(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    train: DataFrame = None,
    alpha: float = 0.5,
) -> DataFrame:
    """→ (id_col, n_tokens, xent_bits, ppl) per document: cross-entropy and
    perplexity under an add-alpha bigram LM trained on ``train`` (defaults
    to ``df`` itself — self-scoring; pass a trusted-corpus frame for the
    CCNet arrangement). Tokens are the repo-wide lowercased whitespace
    convention (``words``); ppl is derived from the 4-decimal-rounded
    cross-entropy so the pair is self-consistent and engine-stable."""
    toks_df = df.select(F.col(id_col).alias("_doc"), words(F.col(text_col)).alias("w"))
    train_toks = (
        toks_df
        if train is None
        else train.select(words(F.col(text_col)).alias("w"))
    )

    uni = (
        train_toks.select(F.explode("w").alias("w1"))
        .groupBy("w1")
        .agg(F.count(F.lit(1)).alias("c1"))
    )
    totals = uni.agg(
        F.sum("c1").alias("n"), F.count(F.lit(1)).alias("v")
    ).collect()[0]
    n_total, vocab = float(totals["n"]), float(totals["v"])
    a = float(alpha)

    big = (
        train_toks.select(F.explode(_bigram_structs(F.col("w"))).alias("g"))
        .select(F.col("g.gram").alias("gram"))
        .groupBy("gram")
        .agg(F.count(F.lit(1)).alias("c2"))
    )

    first = toks_df.select(
        "_doc",
        F.size("w").alias("n_tokens"),
        F.element_at("w", 1).alias("w1"),
    )
    t0 = -F.log2(
        (F.coalesce(F.col("c1"), F.lit(0)) + F.lit(a)) / F.lit(n_total + a * vocab)
    )
    first = first.join(uni, "w1", "left").select("_doc", "n_tokens", t0.alias("t0"))

    dg = toks_df.select(
        "_doc", F.explode(_bigram_structs(F.col("w"))).alias("g")
    ).select("_doc", F.col("g.w1").alias("w1"), F.col("g.gram").alias("gram"))
    t = -F.log2(
        (F.coalesce(F.col("c2"), F.lit(0)) + F.lit(a))
        / (F.coalesce(F.col("c1"), F.lit(0)) + F.lit(a * vocab))
    )
    bsum = (
        dg.join(big, "gram", "left")
        .join(uni, "w1", "left")
        .select("_doc", t.alias("t"))
        .groupBy("_doc")
        .agg(F.sum("t").alias("bs"))
    )

    xent = F.round(
        (F.col("t0") + F.coalesce(F.col("bs"), F.lit(0.0))) / F.col("n_tokens"), 4
    )
    return (
        first.join(bsum, "_doc", "left")
        .select(
            F.col("_doc").alias(id_col),
            F.col("n_tokens").cast("long").alias("n_tokens"),
            xent.alias("xent_bits"),
        )
        .withColumn("ppl", F.round(F.pow(F.lit(2.0), F.col("xent_bits")), 4))
    )


def weighted_sample(
    df: DataFrame,
    key_col: str,
    weight: Column,
    k: int,
    salt: str = "w1",
) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement — Efraimidis-
    Spirakis A-Res: each row draws u from its md5 digest and ranks by
    ``-ln(u) / w``; the k smallest keys win. Rows with higher weight draw
    systematically smaller keys, giving exactly the
    weight-proportional-without-replacement distribution (quality-weighted
    corpus subsetting, importance-sampled eval slices) while staying
    engine-reproducible: u = (first 12 md5 hex digits + 1) / 2^48, so the
    same (salt, key) always draws the same u in any engine.

    The top-k is orderBy+limit — TakeOrderedAndProject, per-partition heaps,
    no global sort; the digest math is a pure projection. Rows with NULL or
    non-positive weight never qualify. → input columns + ``samp_key``."""
    u = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit(salt + ":"), F.col(key_col).cast("string"))),
                1,
                12,
            ),
            16,
            10,
        ).cast("double")
        + F.lit(1.0)
    ) / F.lit(float(1 << 48))
    key = -F.log(u) / weight
    return (
        df.filter(weight.isNotNull() & (weight > 0))
        .withColumn("samp_key", key)
        .orderBy("samp_key", key_col)
        .limit(k)
    )


def kn_lm_perplexity(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    train: DataFrame = None,
    discount: float = 0.75,
) -> DataFrame:
    """Interpolated Kneser-Ney bigram perplexity — the smoothing family
    KenLM (and therefore CCNet's real filter) uses, next to the add-α
    baseline ``bigram_lm_perplexity``:

        P(w2|w1) = max(c(w1 w2) - D, 0)/c(w1·)
                   + D·N1+(w1,·)/c(w1·) · Pcont(w2)
        Pcont(w2) = (N1+(·,w2) + 1) / (N_bigram_types + V_cont + 1)

    with context counts from bigram events, continuation probability from
    DISTINCT-predecessor counts (the "how many contexts license this word"
    insight that makes KN beat frequency smoothing), +1/+V_cont+1 floors so
    unseen words keep positive mass, and P = Pcont(w2) when w1 was never a
    context. The first token scores -log2(Pcont(w1)). Train on ``train``
    (trusted slice) or self-score.

    Scale shape mirrors bigram_lm_perplexity: three training groupBys at
    gram/word key space, scoring joins on gram/w1/w2, ONE per-doc sum. Each
    event's bits are rounded to 12dp and summed as DECIMAL(28,12) — exact,
    order-free arithmetic, so the result is identical under any
    partitioning (and hash-stable vs the SQL oracle); only the final
    per-doc division runs in DOUBLE. → (id_col, n_tokens, xent_bits, ppl),
    4dp like the add-α op."""
    D = float(discount)
    toks_df = df.select(F.col(id_col).alias("_doc"), words(F.col(text_col)).alias("w"))
    train_toks = (
        toks_df if train is None else train.select(words(F.col(text_col)).alias("w"))
    )

    ev_t = train_toks.select(
        F.explode(_bigram_structs(F.col("w"))).alias("g")
    ).select(
        F.col("g.w1").alias("w1"),
        F.col("g.gram").alias("gram"),
        F.element_at(F.split(F.col("g.gram"), " ", 2), 2).alias("w2"),
    )
    c2 = ev_t.groupBy("gram").agg(F.count(F.lit(1)).alias("c2"))
    ctx = ev_t.groupBy("w1").agg(
        F.count(F.lit(1)).alias("c1"), F.countDistinct("w2").alias("nfol")
    )
    pred = ev_t.groupBy("w2").agg(F.countDistinct("w1").alias("npred"))
    tots = c2.agg(F.count(F.lit(1)).alias("nt")).collect()[0]
    vc = pred.count()
    n_types, v_cont = float(tots["nt"]), float(vc)

    def pcont(npred_col):
        return (F.coalesce(npred_col, F.lit(0)) + F.lit(1.0)) / F.lit(
            n_types + v_cont + 1.0
        )

    def bits(p):
        return F.round(-F.log2(p), 12).cast("decimal(28,12)")

    first = toks_df.select(
        "_doc", F.size("w").alias("n_tokens"), F.element_at("w", 1).alias("w2")
    )
    first = first.join(pred, "w2", "left").select(
        "_doc", "n_tokens", bits(pcont(F.col("npred"))).alias("t0")
    )

    dg = toks_df.select(
        "_doc", F.explode(_bigram_structs(F.col("w"))).alias("g")
    ).select(
        "_doc",
        F.col("g.w1").alias("w1"),
        F.col("g.gram").alias("gram"),
        F.element_at(F.split(F.col("g.gram"), " ", 2), 2).alias("w2"),
    )
    pc = pcont(F.col("npred"))
    p = F.when(
        F.col("c1").isNull(), pc
    ).otherwise(
        F.greatest(F.coalesce(F.col("c2"), F.lit(0)) - F.lit(D), F.lit(0.0))
        / F.col("c1")
        + F.lit(D) * F.col("nfol") / F.col("c1") * pc
    )
    bsum = (
        dg.join(c2, "gram", "left")
        .join(ctx, "w1", "left")
        .join(pred, "w2", "left")
        .select("_doc", bits(p).alias("t"))
        .groupBy("_doc")
        .agg(F.sum("t").alias("bs"))
    )

    xent = F.round(
        (
            F.col("t0").cast("double")
            + F.coalesce(F.col("bs").cast("double"), F.lit(0.0))
        )
        / F.col("n_tokens"),
        4,
    )
    return (
        first.join(bsum, "_doc", "left")
        .select(
            F.col("_doc").alias(id_col),
            F.col("n_tokens").cast("long").alias("n_tokens"),
            xent.alias("xent_bits"),
        )
        .withColumn("ppl", F.round(F.pow(F.lit(2.0), F.col("xent_bits")), 4))
    )


def classifier_pr_table(
    df: DataFrame,
    label_col: str,
    score_col: str,
    thresholds: List[float],
) -> DataFrame:
    """Precision/recall/F1 of a score column against boolean labels at each
    threshold — the calibration table every model-based filter needs before
    it is trusted with a corpus cut (where do I set the fastText/NB score
    cut for 95% precision?).

    ONE pass at corpus volume: each row fans out onto the literal threshold
    list (a constant ≤|thresholds| factor, no second scan per threshold),
    then a map-side-combined groupBy(threshold) with conditional COUNTs.
    Ratios divide exact integers in DOUBLE (numerator cast first, both
    engines), NULL when undefined. Returns
    (threshold, tp, fp, fn, precision, recall, f1).
    """
    thr = F.explode(
        F.array([F.lit(float(t)) for t in thresholds])
    ).alias("threshold")
    e = df.select(
        F.col(label_col).alias("_y"), F.col(score_col).alias("_s")
    ).select("_y", "_s", thr)
    agg = e.groupBy("threshold").agg(
        F.count(F.when(F.col("_y") & (F.col("_s") >= F.col("threshold")), 1)).alias("tp"),
        F.count(F.when(~F.col("_y") & (F.col("_s") >= F.col("threshold")), 1)).alias("fp"),
        F.count(F.when(F.col("_y") & (F.col("_s") < F.col("threshold")), 1)).alias("fn"),
    )
    tp_d = F.col("tp").cast("double")
    precision = F.when(
        F.col("tp") + F.col("fp") > 0,
        F.round(tp_d / (F.col("tp") + F.col("fp")), 6),
    )
    recall = F.when(
        F.col("tp") + F.col("fn") > 0,
        F.round(tp_d / (F.col("tp") + F.col("fn")), 6),
    )
    f1 = F.when(
        F.lit(2) * F.col("tp") + F.col("fp") + F.col("fn") > 0,
        F.round(
            F.lit(2.0) * tp_d
            / (F.lit(2) * F.col("tp") + F.col("fp") + F.col("fn")),
            6,
        ),
    )
    return agg.select(
        "threshold", "tp", "fp", "fn",
        precision.alias("precision"), recall.alias("recall"), f1.alias("f1"),
    )


def chunk_sentences(
    docs: DataFrame,
    max_chars: int = 200,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Sentence-boundary chunking — the RAG/embedding-window op: split each
    document into naive sentences (maximal ``[^.!?]+[.!?]*`` runs, the
    RE2∩Java-regex splitter — no lookbehind, so both engines agree) and pack
    consecutive sentences into ~``max_chars`` chunks WITHOUT ever splitting
    a sentence: chunk_id = cum_chars_before DIV max_chars, i.e. boundaries
    fall on the document's global character offsets and a sentence belongs
    to the chunk where it starts. Unlike greedy reset-packing this is a
    closed-form window expression (no per-doc sequential state), which is
    what makes it one pass at 100 TB; chunks overshoot by at most one
    sentence.

    Scale shape: Generate (sentence explode) off the pruned scan, ONE
    doc-key window for (sent_idx, cum_before), one (doc, chunk) groupBy with
    map-side combine. Ordered reassembly via array_sort(struct) — no second
    window.

    Returns (doc_id, chunk_id, n_sentences, n_chars, chunk_text)."""
    from pyspark.sql import Window

    sents = (
        docs.select(
            F.col(id_col).alias("doc_id"),
            F.posexplode(
                F.expr(f"regexp_extract_all({text_col}, '[^.!?]+[.!?]*', 0)")
            ).alias("pos", "raw"),
        )
        .select("doc_id", "pos", F.trim(F.col("raw")).alias("s"))
        .filter(F.col("s") != "")
    )
    w = Window.partitionBy("doc_id").orderBy("pos")
    wsum = w.rowsBetween(Window.unboundedPreceding, -1)
    staged = sents.select(
        "doc_id",
        "s",
        F.row_number().over(w).alias("sent_idx"),
        F.coalesce(F.sum(F.length("s")).over(wsum), F.lit(0)).alias("cum_before"),
    ).withColumn(
        "chunk_id", F.expr(f"CAST(cum_before DIV {max_chars} AS INT)")
    )
    return (
        staged.groupBy("doc_id", "chunk_id")
        .agg(
            F.count(F.lit(1)).alias("n_sentences"),
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("sent_idx", "s"))),
                    lambda x: x["s"],
                ),
                " ",
            ).alias("chunk_text"),
        )
        .select(
            "doc_id",
            "chunk_id",
            "n_sentences",
            F.length("chunk_text").alias("n_chars"),
            "chunk_text",
        )
    )


# --- corpus novelty -----------------------------------------------------------

def doc_novelty(
    docs: DataFrame,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document novelty: the fraction of a document's DISTINCT word
    n-grams that occur in NO other document (corpus df = 1) — the
    diversity-selection signal dual to ``contamination`` (overlap vs an
    eval set) and ``dup_span_stats`` (overlap as spans): high-novelty docs
    add new content to the corpus, near-zero-novelty docs are assembled
    from boilerplate even when no single duplicate pair flags them.

    Plan: distinct (doc, gram) once, then TWO aggregations of it — a
    doc-keyed count (n_grams) and a gram-keyed df count whose df=1 rows
    keep their single owner via min=max (so novel counts need NO join back
    through the gram table) — joined doc-to-doc at 1 row per doc.
    Gram volume shuffles twice (doc key, gram key), never joins against
    itself; both aggs combine map-side. Returns
    (doc_id, n_grams, n_novel, novelty) with novelty rounded to 4dp."""
    dg = (
        docs.select(
            F.col(id_col).alias("doc_id"),
            F.explode(F.array_distinct(word_ngrams(F.col(text_col), n))).alias("gram"),
        )
        .filter(F.col("gram") != "")
        .localCheckpoint(eager=True)
    )
    totals = dg.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_grams"))
    novel = (
        dg.groupBy("gram")
        .agg(F.count(F.lit(1)).alias("df"), F.min("doc_id").alias("owner"))
        .filter(F.col("df") == 1)
        .groupBy(F.col("owner").alias("doc_id"))
        .agg(F.count(F.lit(1)).alias("n_novel"))
    )
    return (
        totals.join(novel, "doc_id", "left")
        .select(
            "doc_id",
            F.col("n_grams").cast("bigint").alias("n_grams"),
            F.coalesce(F.col("n_novel"), F.lit(0)).cast("bigint").alias("n_novel"),
            F.round(
                F.coalesce(F.col("n_novel"), F.lit(0)).cast("double")
                / F.col("n_grams"),
                4,
            ).alias("novelty"),
        )
    )


# --- readability --------------------------------------------------------------

def readability(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Flesch reading-ease and Flesch–Kincaid grade per document — the
    classic quality-filter features (too-hard and too-easy tails both
    correlate with boilerplate/spam in webtext mixes). Heuristic syllables:
    maximal vowel-group runs ``[aeiouy]+`` of the lowercased text; sentences:
    the chunk_sentences splitter (maximal ``[^.!?]+[.!?]*`` runs, non-blank);
    words: whitespace tokens. All three are pure regexp/array projections at
    scan speed (no shuffle, no Python), and the two scores are single double
    expressions written identically in the oracle, rounded to 4dp.

    Docs with zero words or zero sentences are excluded (scores undefined).
    Returns (doc_id, n_sents, n_words, n_syllables, flesch, fk_grade)."""
    toks = words(F.col(text_col))
    n_words = F.size(F.filter(toks, lambda t: t != F.lit("")))
    n_sents = F.size(
        F.filter(
            F.expr(f"regexp_extract_all({text_col}, '[^.!?]+[.!?]*', 0)"),
            lambda s: F.trim(s) != F.lit(""),
        )
    )
    n_syll = F.size(F.expr(f"regexp_extract_all(lower({text_col}), '[aeiouy]+', 0)"))
    staged = docs.select(
        F.col(id_col).alias("doc_id"),
        n_sents.cast("bigint").alias("n_sents"),
        n_words.cast("bigint").alias("n_words"),
        n_syll.cast("bigint").alias("n_syllables"),
    ).filter((F.col("n_words") > 0) & (F.col("n_sents") > 0))
    wps = F.col("n_words").cast("double") / F.col("n_sents")
    spw = F.col("n_syllables").cast("double") / F.col("n_words")
    return staged.select(
        "doc_id",
        "n_sents",
        "n_words",
        "n_syllables",
        F.round(F.lit(206.835) - F.lit(1.015) * wps - F.lit(84.6) * spw, 4).alias(
            "flesch"
        ),
        F.round(F.lit(0.39) * wps + F.lit(11.8) * spw - F.lit(15.59), 4).alias(
            "fk_grade"
        ),
    )


# --- per-host corpus report -----------------------------------------------------

def host_corpus_report(
    docs: DataFrame,
    host_col: str = "source",
    text_col: str = "text",
    lang_col: str = "lang",
) -> DataFrame:
    """The per-host corpus dashboard row: how many docs a host contributed,
    how internally duplicated it is (exact-text dup rate — boilerplate
    mills and parked domains sit near 1), its token mass and language
    spread — the aggregates a crawl operator reads before deciding host
    budgets (host_budget_cap) and recrawl priorities.

    ONE groupBy(host); the exact distinct-text count rides the same
    aggregate (Spark plans the count-distinct expand, keys ≈ |hosts| —
    model-sized output). Returns (host, n_docs, n_distinct_texts,
    total_tokens, n_langs, dup_rate, avg_tokens)."""
    toks = F.size(F.filter(words(F.col(text_col)), lambda t: t != F.lit("")))
    agg = docs.groupBy(F.col(host_col).alias("host")).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct(F.md5(F.col(text_col))).alias("n_distinct_texts"),
        F.sum(toks).alias("total_tokens"),
        F.countDistinct(F.col(lang_col)).alias("n_langs"),
    )
    return agg.select(
        "host",
        F.col("n_docs").cast("bigint").alias("n_docs"),
        F.col("n_distinct_texts").cast("bigint").alias("n_distinct_texts"),
        F.col("total_tokens").cast("bigint").alias("total_tokens"),
        F.col("n_langs").cast("bigint").alias("n_langs"),
        F.round(
            F.lit(1.0)
            - F.col("n_distinct_texts").cast("double") / F.col("n_docs"),
            4,
        ).alias("dup_rate"),
        F.round(F.col("total_tokens").cast("double") / F.col("n_docs"), 2).alias(
            "avg_tokens"
        ),
    )


# --- language-ID evaluation ------------------------------------------------------

def lang_confusion(
    docs: DataFrame, text_col: str = "text", label_col: str = "lang"
) -> DataFrame:
    """Confusion matrix of the stopword language-ID against the labeled
    language — the eval a pipeline runs before trusting lang_id for
    filtering decisions (which languages it silently mislabels, and into
    what). ONE groupBy over (label, prediction): map-side combine collapses
    each task to ≤ |langs|² rows; output is model-sized.
    Returns (lang, lang_pred, n)."""
    return (
        docs.groupBy(
            F.col(label_col).alias("lang"), lang_id(F.col(text_col)).alias("lang_pred")
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .select("lang", "lang_pred", F.col("n").cast("bigint").alias("n"))
    )


# --- encoding-damage (mojibake) stats --------------------------------------------

MOJIBAKE_MARKERS = ("�", "Ã", "Â", "â€")


def mojibake_stats(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    markers=MOJIBAKE_MARKERS,
) -> DataFrame:
    """Encoding-damage stats per document: occurrences of the replacement
    char U+FFFD and the classic UTF-8-read-as-Latin-1 mojibake leaders
    (Ã, Â, â€) — the CCNet-family signal for pages fetched with a wrong
    charset. Counting is pure length arithmetic (length minus length-after-
    replace, divided by the marker length) — whole-stage codegen over the
    scan, zero shuffles, identical in any engine.
    Returns (id, n_chars, n_bad, bad_ratio, is_clean)."""
    text = F.col(text_col)
    counts = [
        (F.length(text) - F.length(F.replace(text, F.lit(m), F.lit("")))) / len(m)
        for m in markers
    ]
    n_bad = sum(counts[1:], counts[0]).cast("bigint")
    return docs.select(
        F.col(id_col).alias("id"),
        F.length(text).cast("bigint").alias("n_chars"),
        n_bad.alias("n_bad"),
        F.round(
            n_bad.cast("double") / F.greatest(F.length(text), F.lit(1)), 6
        ).alias("bad_ratio"),
        (n_bad == 0).alias("is_clean"),
    )


# --- Unicode script profile -------------------------------------------------------

def script_stats(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Unicode SCRIPT profile per document — the writing-system complement
    of lang_id (which only separates Latin-script languages): counts of
    Latin / Cyrillic / Han / Arabic script characters and the dominant
    script. A multilingual pipeline routes documents to per-script
    tokenizers and filters on this, and mixed-script anomalies (Latin text
    stuffed with Cyrillic look-alikes) are a spam signal.

    Pure regexp_count column math over the scan — Java regex script
    properties (\\p{IsLatin} …), zero shuffles, codegen'd. Ties in the
    dominant-script argmax break in fixed order (latin > cyrillic > han >
    arabic), 'none' when no scripted character occurs.
    Returns (id, n_latin, n_cyrillic, n_han, n_arabic, script)."""
    t = F.col(text_col)
    n_lat = F.regexp_count(t, F.lit(r"\p{IsLatin}"))
    n_cyr = F.regexp_count(t, F.lit(r"\p{IsCyrillic}"))
    n_han = F.regexp_count(t, F.lit(r"\p{IsHan}"))
    n_ara = F.regexp_count(t, F.lit(r"\p{IsArabic}"))
    return docs.select(
        F.col(id_col).alias("id"),
        n_lat.cast("bigint").alias("n_latin"),
        n_cyr.cast("bigint").alias("n_cyrillic"),
        n_han.cast("bigint").alias("n_han"),
        n_ara.cast("bigint").alias("n_arabic"),
        F.when(
            (n_lat > 0) & (n_lat >= n_cyr) & (n_lat >= n_han) & (n_lat >= n_ara),
            F.lit("latin"),
        )
        .when((n_cyr > 0) & (n_cyr >= n_han) & (n_cyr >= n_ara), F.lit("cyrillic"))
        .when((n_han > 0) & (n_han >= n_ara), F.lit("han"))
        .when(n_ara > 0, F.lit("arabic"))
        .otherwise(F.lit("none"))
        .alias("script"),
    )


def quota_sample(
    df: DataFrame,
    key_col: str,
    group_col: str,
    quota: int,
    salt: str = "q1",
    overshoot: int = 4,
) -> DataFrame:
    """EXACT deterministic N-per-group sampling (eval-set quotas, per-language
    dev slices, balanced audits): the output is precisely

        ROW_NUMBER() OVER (PARTITION BY group
                           ORDER BY md5digest(key), key) <= quota

    — repeatable across runs, engines, partitionings — but computed WITHOUT
    the naive plan's fatal flaw: a hot group (one language = 80% of a 100-TB
    corpus) makes that window sort 10^9 rows in ONE partition.

    Two-phase screen-then-trim instead:
    1. per-group row counts (a |groups|-row broadcast) set a per-group hex
       threshold keeping ~``overshoot``×quota expected candidates — a pure
       pushed-down digest filter at scan speed (the same 48-bit md5-prefix
       protocol as DSIR/weighted_sample);
    2. the exact row_number trim runs over the bounded candidate set only
       (window partitions ≈ overshoot×quota rows, never the group).

    The screen cannot create wrong answers, only (astronomically rarely)
    too few candidates: a group whose candidate count undershoots
    min(quota, n) — binomial tail P ≈ exp(-quota·(overshoot-1)²/(2·overshoot))
    per group, and deterministic for a given corpus — is detected by
    counting candidates and rescued with its full row set (the naive path,
    paid only by the failing group). Groups with n ≤ quota·overshoot skip
    the screen entirely (keep-all threshold).

    Output: df's columns + ``sample_rank`` (1-based within group).
    """
    from pyspark.sql import Window

    dig = F.substring(
        F.md5(F.concat(F.lit(salt + ":"), F.col(key_col).cast("string"))), 1, 12
    )
    base = df.withColumn("_qdig", dig)
    counts = base.groupBy(group_col).agg(F.count(F.lit(1)).alias("_n"))
    # steps = floor(min(1, overshoot*quota/n) * 2^48); keep-all when the
    # overshoot budget covers the whole group (avoids the 13-hex edge case)
    keep_all = F.col("_n") <= F.lit(quota * overshoot)
    steps = F.floor(
        (F.lit(float(quota * overshoot)) / F.col("_n")) * F.lit(281474976710656.0)
    ).cast("bigint")
    thresh = F.lower(F.lpad(F.conv(steps.cast("string"), 10, 16), 12, "0"))
    gates = F.broadcast(
        counts.select(
            group_col, "_n", keep_all.alias("_all"), thresh.alias("_th")
        )
    )
    cand = base.join(gates, group_col).filter(
        F.col("_all") | (F.col("_qdig") < F.col("_th"))
    )
    cand_counts = cand.groupBy(group_col).agg(F.count(F.lit(1)).alias("_c"))
    bad = F.broadcast(
        cand_counts.join(counts, group_col)
        .filter(F.col("_c") < F.least(F.lit(quota), F.col("_n")))
        .select(group_col)
    )
    good = cand.join(bad, group_col, "left_anti")
    rescue = base.join(bad, group_col, "left_semi").join(gates, group_col)
    pool = good.unionByName(rescue)
    w = Window.partitionBy(group_col).orderBy("_qdig", key_col)
    return (
        pool.withColumn("sample_rank", F.row_number().over(w))
        .filter(F.col("sample_rank") <= quota)
        .select(*df.columns, "sample_rank")
    )


def grouped_topk(
    df: DataFrame,
    key_col: str,
    group_col: str,
    score_col: str,
    k: int,
    salt: str = "t1",
    sample_target: int = 512,
) -> DataFrame:
    """EXACT top-k rows per group by score (best k pages per host by
    PageRank, k longest docs per language, k highest-quality docs per
    source) — output is precisely

        ROW_NUMBER() OVER (PARTITION BY group
                           ORDER BY score DESC, key) <= k

    without the naive window's hot-group pathology (one group with 10^9
    rows = one 10^9-row sort partition). Same screen-then-trim-with-rescue
    discipline as ``quota_sample``, but the screen threshold must be
    LEARNED (scores, unlike digests, have no known distribution):

    1. per-group counts broadcast; a ~``sample_target``-row deterministic
       digest sample per group estimates the k-th largest score as the
       (2·k·c/n)-th largest sample score (the ×2 biases toward overshoot);
       groups with n ≤ sample_target estimate from the FULL group (exact);
    2. candidates = rows with score >= estimate (scan-speed pushed-down
       filter; ties included);
    3. exact row_number trim over the bounded candidates;
    4. any group whose candidate count undershoots min(k, n) — estimator
       failure, detected by counting — is rescued with its full row set.

    Caveat: massive score ties at the threshold widen the candidate set
    (all ties pass the screen); a group where ALL scores are equal
    degenerates to the naive plan for that group — the trim stays correct,
    only the bound weakens.

    Output: df's columns + ``topk_rank`` (1-based, best first).
    """
    from pyspark.sql import Window

    dig = F.substring(
        F.md5(F.concat(F.lit(salt + ":"), F.col(key_col).cast("string"))), 1, 12
    )
    base = df.withColumn("_tdig", dig)
    counts = df.groupBy(group_col).agg(F.count(F.lit(1)).alias("_n"))
    keep_all = F.col("_n") <= F.lit(sample_target)
    steps = F.floor(
        (F.lit(float(sample_target)) / F.col("_n")) * F.lit(281474976710656.0)
    ).cast("bigint")
    thresh = F.lower(F.lpad(F.conv(steps.cast("string"), 10, 16), 12, "0"))
    gates = F.broadcast(
        counts.select(group_col, "_n", keep_all.alias("_all"), thresh.alias("_th"))
    )
    samp = base.join(gates, group_col).filter(
        F.col("_all") | (F.col("_tdig") < F.col("_th"))
    )
    # per-group sample size c and the target sample rank q:
    # full groups (_all) use q = k exactly; sampled groups use 2·k·c/n
    sw = Window.partitionBy(group_col).orderBy(
        F.col(score_col).desc(), F.col(key_col)
    )
    sc = Window.partitionBy(group_col)
    ranked_samp = samp.select(
        group_col, score_col,
        F.row_number().over(sw).alias("_srn"),
        F.count(F.lit(1)).over(sc).alias("_c"),
        F.col("_n"), F.col("_all"),
    )
    q = F.when(F.col("_all"), F.least(F.lit(k), F.col("_c"))).otherwise(
        F.least(
            F.col("_c"),
            F.greatest(
                F.lit(1),
                F.ceil(F.lit(2.0 * k) * F.col("_c") / F.col("_n")).cast("int"),
            ),
        )
    )
    t_est = F.broadcast(
        ranked_samp.filter(F.col("_srn") == q)
        .select(group_col, F.col(score_col).alias("_test"))
    )
    cand = base.join(gates, group_col).join(t_est, group_col, "left").filter(
        F.col("_test").isNull() | (F.col(score_col) >= F.col("_test"))
    )
    cand_counts = cand.groupBy(group_col).agg(F.count(F.lit(1)).alias("_cc"))
    bad = F.broadcast(
        cand_counts.join(counts, group_col)
        .filter(F.col("_cc") < F.least(F.lit(k), F.col("_n")))
        .select(group_col)
    )
    good = cand.join(bad, group_col, "left_anti")
    rescue = (
        base.join(bad, group_col, "left_semi")
        .join(gates, group_col)
        .withColumn("_test", F.lit(None).cast(dict(df.dtypes)[score_col]))
    )
    pool = good.unionByName(rescue)
    w = Window.partitionBy(group_col).orderBy(F.col(score_col).desc(), F.col(key_col))
    return (
        pool.withColumn("topk_rank", F.row_number().over(w))
        .filter(F.col("topk_rank") <= k)
        .select(*df.columns, "topk_rank")
    )
