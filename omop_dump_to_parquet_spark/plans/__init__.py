from .dump import dump_table, DumpResult  # noqa: F401
