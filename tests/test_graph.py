"""Connected-components kernel tests (operators/graph.py).

The differential oracle (tests/test_parity.py + the driver) pins the
full d06 pipeline; these pin the star-algorithm kernel on adversarial
shapes the fixture graph doesn't contain — long chains (the case that
breaks plain label propagation), orientation/duplicate noise, and the
non-convergence safety valve.
"""

import pytest

from omop_dump_to_parquet_spark.operators.graph import connected_components


def _cc(spark, edges, **kw):
    df = spark.createDataFrame(edges, "u long, v long")
    rows = connected_components(df, "u", "v", **kw).collect()
    return {r.node: r.component_id for r in rows}


def test_two_components_and_star(spark):
    got = _cc(spark, [(1, 2), (2, 3), (3, 1), (10, 11)])
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}


def test_long_chain_converges_to_min(spark):
    # A 64-node path: diameter 63 — label propagation would need ~63
    # rounds; the star algorithm must land it well inside max_rounds.
    n = 64
    got = _cc(spark, [(i, i + 1) for i in range(1, n)], max_rounds=20)
    assert got == {i: 1 for i in range(1, n + 1)}


def test_orientation_and_duplicates_ignored(spark):
    # Same edge both ways + repeats + self-loops must not change the
    # result (canonicalization layer).
    got = _cc(spark, [(2, 1), (1, 2), (2, 1), (1, 1), (3, 2)])
    assert got == {1: 1, 2: 1, 3: 1}


def test_max_rounds_raises_not_partial(spark):
    df = spark.createDataFrame(
        [(i, i + 1) for i in range(1, 40)], "u long, v long"
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(df, "u", "v", max_rounds=1)
