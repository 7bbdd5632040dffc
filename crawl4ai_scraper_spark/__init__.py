"""crawl4ai_scraper_spark — a from-scratch, PySpark-native crawl-and-extract engine.

Re-expresses the capabilities of the reference crawler
(devoperand/crawl4ai-scraper, a sequential crawl4ai/Playwright CLI) as a
distributed Spark DataFrame pipeline over a lakehouse of Common-Crawl-style
pages ``(url, warc_ts, html, text, lang)``:

* ``kernel``    — pure-Python semantics library (URL canonicalization, wildcard
                  patterns, HTML link/text extraction, the byte-identical
                  markdown-cleaning pipeline, filename/path generation).
                  Shared verbatim by the sequential oracle and the Arrow UDFs,
                  so extracted text is byte-identical by construction.
* ``fixtures``  — deterministic synthetic web generator (pages derived from the
                  url alone, so any scale can be produced without materializing).
* ``oracle``    — sequential reference simulator (golden crawl order / seen set
                  / extracted text), transcribing the semantics of
                  /root/reference/crawler.py:167-250 and the extraction pass.
* ``functions`` — vectorized pandas/Arrow UDFs wrapping the kernel (no
                  per-row Python UDFs anywhere).
* ``plans``     — the frontier engine: level-synchronous BFS rounds as
                  DataFrame plans (fetch join, link explode, pattern/domain/
                  depth filters, first-appender window, anti-join vs the seen
                  set, bloom pre-filter, budget truncation, politeness virtual
                  time, checkpointed snapshots with per-partition lineage).
* ``operators`` — large-scale training-data ops (exact/MinHash-LSH/SimHash
                  dedup, n-gram Jaccard, embedding ANN, language-ID, quality
                  scoring, token counting, fingerprinting, multimodal plumbing).
* ``sources``   — pages/seed readers and snapshot-table IO (Parquet + manifest;
                  Iceberg jars are not bundled with this PySpark build).
"""

__version__ = "0.1.0"
