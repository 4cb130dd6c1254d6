"""The driver's correctness harness checks the first ``_WINDOW``
entries of ``queries()`` per round; the catalog exceeds the window, so
registration order IS the rotation policy.  These tests pin the
policy's contract: stalest evidence first, rewritten operators always
re-checked, and determinism (the order is a pure function of the
committed CORRECTNESS artifacts).
"""

from __future__ import annotations

from omop_dump_to_parquet_spark import load_catalog
from omop_dump_to_parquet_spark.registry import (
    _FORCE_IN_WINDOW,
    _WINDOW,
    _driver_check_history,
)


def test_forced_rewritten_ops_lead_the_window():
    queries, _ = load_catalog()
    names = list(queries)
    for forced in _FORCE_IN_WINDOW:
        assert forced in names[: len(_FORCE_IN_WINDOW)], (
            f"{forced} was rewritten since its last driver check and must "
            "be at the front of the checked window"
        )


def test_window_prefers_stalest_evidence():
    """No query outside the window may carry OLDER evidence (earlier
    last-checked round; never-checked = round 0) than a non-forced
    query inside it — the window bounds evidence AGE.  (The r1-r4
    policy keyed on times-checked instead, which let an id checked
    once recently displace one unchecked since r2.)"""
    queries, _ = load_catalog()
    names = list(queries)
    history = _driver_check_history()
    in_last = [
        history.get(n, (0, 0))[1]
        for n in names[:_WINDOW]
        if n not in _FORCE_IN_WINDOW
    ]
    out_last = [history.get(n, (0, 0))[1] for n in names[_WINDOW:]]
    if in_last and out_last:
        assert max(in_last) <= min(out_last)


def test_ordering_is_deterministic():
    queries, _ = load_catalog()
    first = list(queries)
    queries2, _ = load_catalog()
    assert list(queries2) == first


def test_history_ignores_real_failures(tmp_path, monkeypatch):
    """Only a clean full run (err null) counts as evidence: a genuine
    err keeps the query in the window until it passes, and historic
    rows-only ``no_oracle`` runs are discounted as weaker checks (r10
    cleanup — zero rows-only ids remain in the catalog)."""
    import json

    import omop_dump_to_parquet_spark.registry as registry

    art = tmp_path / "CORRECTNESS_r07.json"
    art.write_text(
        json.dumps(
            {
                "ok_query": {"err": None},
                "rows_only_query": {"err": "no_oracle"},
                "broken_query": {"err": "AnalysisException: boom"},
            }
        )
    )
    # registry-local seam, not the process-global os.path.dirname
    # (r10 test review: patching the stdlib function leaked into every
    # dirname call made during the history scan)
    monkeypatch.setattr(registry, "_artifact_root", lambda: str(tmp_path))
    history = registry._driver_check_history()
    assert history["ok_query"] == (1, 7)
    assert "rows_only_query" not in history
    assert "broken_query" not in history
