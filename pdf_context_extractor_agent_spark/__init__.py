"""PySpark-native document content-extraction engine.

A from-scratch, Spark-first reimplementation of the capabilities of
``cuiqinsain-cloud/pdf_context_extractor_agent`` (reference read-only at
/root/reference): a deterministic, LLM-free pipeline that extracts
structured financial statements, footnotes, and main-content text from
document byte streams stored in Common-Crawl-style tables
``(url string, warc_ts timestamp, html binary, text string, lang string)``.

Architecture (SURVEY.md §7):

* **layout stratum** (:mod:`.kernels`) — Arrow-vectorized ``mapInPandas``
  kernels that turn ``html binary`` into per-page text lines (with layout
  Y positions) and tables. The only place imperative parsing lives.
* **relational stratum** (:mod:`.operators`) — everything else is plain
  DataFrame algebra: regex boundary pruning, ordered cross-page merges,
  broadcast pattern joins with first-match-wins windows, interval joins
  for footnote/table assignment, and ``groupBy(url)`` validation
  aggregates. Catalyst owns the physical plan.
* **scale machinery** (:mod:`.plans`, :mod:`.sources`) — salted
  repartitioning by url-hash, per-partition lineage/checkpoint metrics,
  resumable runs via anti-join, AQE-friendly plan shapes.
"""

__version__ = "0.1.0"
