from .dump import dump_table, DumpResult  # noqa: F401
from .stream_dump import stream_dump  # noqa: F401
from .upsert import upsert_parquet  # noqa: F401
