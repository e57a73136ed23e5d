"""Sources & sinks: table IO (parquet sandbox / Iceberg cluster) and the
deterministic synthetic fixture generator."""
