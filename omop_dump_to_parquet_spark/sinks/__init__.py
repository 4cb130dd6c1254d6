from .parquet_sink import write_parquet, REFERENCE_SIZING  # noqa: F401
from .bucketed import read_bucketed, write_bucketed  # noqa: F401
from .compact import compact_parquet_dir  # noqa: F401
