"""Sources: parquet/lance readers and deterministic derivations/fixtures."""
