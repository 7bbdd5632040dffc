"""Large-scale training-data pipeline operators (first-class, per the build
brief): deduplication (exact / MinHash-LSH / SimHash / n-gram Jaccard /
embedding-cosine, plus connected-component duplicate clustering and
keep-one-per-cluster survivor selection), similarity search (brute-force
cosine, IVF-cell with computed assignment, LSH hyperplane buckets), text
analysis (language-ID, quality scoring, token counting, fingerprinting,
Gopher-style repetition signals and quality filtering, top-n-gram statistics,
PII redaction, deterministic hash sampling, naive-Bayes model-based quality
classification), BPE tokenizer training + segmentation, cross-corpus exact
dedup, temporal ops (as-of join, keep-latest revision dedup, bucketed
interval/range join), multimodal binary-column plumbing, full-text search
(inverted + positional index, conjunctive tf-idf, phrase, KWIC), skew-salted
joins, token-budgeted JSONL shard export, ordered-sequence event analytics
(funnels, cohorts, transition matrices, session paths, volume z-scores) and
degree-ordered triangle counting.

Everything is built from native ``pyspark.sql.functions`` (JVM-side,
whole-stage-codegen-friendly) except where binary decoding genuinely needs
Python — and there it is Arrow-batched ``mapInPandas``, never per-row UDFs.
Each operator has a DuckDB-SQL oracle in ``__spark_entry__.oracle_sql`` built
from the same deterministic primitives (md5 / regex / list ops), so the
driver's value-hash comparison holds bit-for-bit.
"""
