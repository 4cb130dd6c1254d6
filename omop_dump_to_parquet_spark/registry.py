"""Query catalog registry.

Every operator module registers its queries here via the ``@query``
decorator; ``__spark_entry__.py`` exposes the assembled dicts to the
driver. A query is a ``(spark, sf_dir) -> DataFrame`` callable; its
optional ``oracle`` is the ANSI-SQL equivalent DuckDB runs on the same
parquet tables for the differential-correctness gate (SURVEY.md §5).

Determinism contract (cross-engine value hashing):
- every computed/aggregate column is aliased identically in the Spark
  plan and the oracle SQL;
- double *sums* are rounded at a precision where the data's decimal
  quantization makes summation-order noise unobservable (fixture
  monetary columns are 2-decimal: ``ROUND(sum, 2)`` is exact-safe),
  or routed through DECIMAL for products (exact arithmetic);
- rankings over doubles order by the ROUNDED value with an id
  tie-break, so both engines pick identical top-k sets.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}

_LOADED = False


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register ``fn`` under ``name``; ``oracle=None`` → rows-only check
    (genuinely non-SQL-expressible ops)."""

    def deco(fn: QueryFn) -> QueryFn:
        def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
            from .session import apply_runtime_confs

            apply_runtime_confs(spark)
            return fn(spark, sf_dir)

        wrapped.__name__ = fn.__name__
        wrapped.__doc__ = fn.__doc__
        QUERIES[name] = wrapped
        if oracle is not None:
            ORACLES[name] = oracle
        return wrapped

    return deco


def load_catalog() -> tuple[dict[str, QueryFn], dict[str, str]]:
    """Import all operator modules (side effect: registration)."""
    global _LOADED
    if not _LOADED:
        from .operators import (  # noqa: F401
            dedup,
            multimodal,
            relational,
            similarity,
            skew,
            text,
            windows,
        )
        from .streaming import stream_queries  # noqa: F401

        _LOADED = True
    return QUERIES, ORACLES
