"""LLM-training-data pipeline operators: deduplication, similarity search,
text analysis, multimodal binary columns. All shuffle-aware compositions of
DataFrame primitives — designed so each stage partitions by a key whose
cardinality grows with the data (shingle, band bucket, LSH bucket), never by
anything requiring a driver-side collect.
"""
