"""Sources/sinks: parquet staging ingestion + callback handle registry."""
