"""etl_mudah_spark — a PySpark-native analytics engine.

A from-scratch engine providing the query and data-processing
capabilities of the ``0xffakhrul/etl-mudah`` reference application
(REST-scrape ETL + Postgres upsert + pandas dashboard analytics +
sklearn price model), re-expressed Spark-first:

- DataFrame / Spark SQL for every relational operator (Catalyst does
  pushdown/pruning/join-selection; we never hand-schedule).
- A Spark 4 Python DataSource for the paginated, rate-limited REST scan.
- An idempotent merge/upsert writer (keep-one-per-key window rewrite).
- Structured Streaming for the incremental contract (watermarked dedup,
  windowed aggregation, foreachBatch merge).
- pyspark.ml for the price-regression surface.
- Large-scale training-data operators beyond the reference: exact and
  near-duplicate detection (MinHash/LSH, SimHash, n-gram Jaccard,
  embedding cosine), ANN similarity search, text analysis, multimodal
  column plumbing.

Designed for a 1000-executor cluster on ~100 TB: broadcast the small
side, partial-aggregate before shuffles, keep expressions inside
whole-stage codegen, Arrow-batched Pandas UDFs for anything Python.
"""

__version__ = "0.1.0"
