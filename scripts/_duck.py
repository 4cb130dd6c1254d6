"""Shared DuckDB fixture-view bootstrap for the measurement scripts
(one table list, one CREATE VIEW loop — a new fixture table gets
added HERE and every consumer sees it)."""
from __future__ import annotations

FIXTURE_TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def create_views(con, sf_dir: str) -> None:
    for t in FIXTURE_TABLES:
        con.sql(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')"
        )
