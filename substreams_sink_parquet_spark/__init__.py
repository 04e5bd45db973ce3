"""substreams_sink_parquet_spark — a PySpark-native analytics engine.

A from-scratch re-expression of the capabilities of the reference sink
(Data-Nexus-Web3/substreams-sink-parquet, surveyed in /root/repo/SURVEY.md):

- ingest block-scoped protobuf payloads, derive a StructType schema once from
  protobuf descriptors, decode to columns, optionally explode root repeated
  fields into child tables, and write block-range-partitioned zero-pad-named
  Parquet with rotation + empty-range backfill (``sink/``, ``streaming/``);
- a full relational query surface over the resulting Parquet lake
  (``operators/``), declared via the DataFrame API so Catalyst plans it;
- LLM-data-pipeline operators: dedup (exact / MinHash-LSH / SimHash /
  n-gram Jaccard / embedding-cosine), similarity search, text analysis,
  multimodal binary columns (``llm/``).

Everything is DataFrame-first: no RDDs, no driver-side loops over data.
"""

__version__ = "0.1.0"
