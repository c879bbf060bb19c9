"""Relational / dataflow operators: the IoT pipeline stages, star-schema
ETL, dashboard analytics, and the large-scale data-pipeline extensions
(dedup, similarity search, text analysis, multimodal plumbing)."""
