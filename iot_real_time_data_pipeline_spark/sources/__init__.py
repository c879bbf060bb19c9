"""Sources & sinks: raw-event readers (batch + streaming), dead-letter
routing, and the partitioned parquet lake layout."""
