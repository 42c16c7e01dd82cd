"""Sources & sinks: synthetic pages, driver parquet tables, checkpoints."""
