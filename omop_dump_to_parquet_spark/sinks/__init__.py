from .parquet_sink import write_parquet, REFERENCE_SIZING  # noqa: F401
