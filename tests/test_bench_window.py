"""bench.py's driver-window fitter: the one JSON line the driver records.

Pure-python tests (no Spark): failures always survive, rotation moves the
drop set between rounds, output always fits and parses."""

from __future__ import annotations

import json
import os
import sys

# repo root derived from this file, NOT hardcoded: a hardcoded
# /root/repo would shadow a worktree checkout and silently test the
# main checkout's bench.py
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from bench import fit_to_window


def _doc(timings):
    return {
        "metric": "total_query_wall_seconds",
        "value": round(sum(t for t in timings.values() if t >= 0), 4),
        "unit": "sec",
        "queries": {k: round(v, 2) for k, v in timings.items()},
        "sf": 0.1,
        "runs": 2,
        "aggregation": "min_per_query",
        "loadavg_start": [1.0, 1.0, 1.0],
        "loadavg_end": [1.0, 1.0, 1.0],
    }


def _timings(n=160, fail=("broken_query_one", "broken_query_two")):
    t = {f"synthetic_query_name_{i:03d}": (i % 9) * 0.41 + 0.02 for i in range(n)}
    for f in fail:
        t[f] = -1.0
    return t


def test_fits_parses_and_keeps_failures():
    t = _timings()
    for rnd in range(6):
        line = fit_to_window(_doc(t), t, rnd)
        assert len(line) <= 4000
        doc = json.loads(line)
        assert doc["queries_omitted"] > 0
        assert doc["queries"]["broken_query_one"] == -1.0
        assert doc["queries"]["broken_query_two"] == -1.0
        assert len(doc["queries"]) + doc["queries_omitted"] == len(t)


def test_rotation_moves_the_drop_set():
    t = _timings()
    dropped = [
        set(t) - set(json.loads(fit_to_window(_doc(t), t, rnd))["queries"])
        for rnd in range(4)
    ]
    # consecutive rounds must not omit the identical set, and the union
    # over a few rounds must not exceed what any single round omits by 0
    assert dropped[0] != dropped[1]
    assert len(set().union(*dropped)) > len(dropped[0])


def test_small_doc_untouched():
    t = {"q1": 1.0, "q2": -1.0}
    line = fit_to_window(_doc(t), t, 3)
    doc = json.loads(line)
    assert "queries_omitted" not in doc
    assert doc["queries"] == {"q1": 1.0, "q2": -1.0}


def test_mass_failure_degrades_to_parseable_summary():
    """When the failure entries alone exceed the window, the line must
    degrade (count + truncated name list) rather than overflow and get
    cut mid-JSON by the driver's stdout tail."""
    t = {f"catastrophically_long_failing_query_name_{i:04d}": -1.0 for i in range(400)}
    t["the_one_that_worked"] = 0.5
    line = fit_to_window(_doc(t), t, 2)
    assert len(line) <= 4000
    doc = json.loads(line)
    assert doc["failed_count"] == 400
    assert doc["queries_omitted"] == len(t)
    assert doc["failed_names"].endswith("...")
    assert "catastrophically_long_failing_query_name_0000" in doc["failed_names"]


def test_sidecar_covers_every_registered_query():
    """bench_full.json (the committed sidecar) must record every query in
    the registry — it is the only complete per-round record when the
    stdout line drops entries."""
    import os

    sidecar = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "bench_full.json")
    if not os.path.exists(sidecar):
        import pytest

        pytest.skip("no bench_full.json yet in this checkout")
    with open(sidecar) as f:
        doc = json.load(f)
    from xarray_beam_spark.registry import _collect

    registered = set(_collect())
    recorded = set(doc["queries"])
    missing = registered - recorded
    # new queries land in the registry before the round-end bench run
    # records them; the new-gate budget is <=3 per round, so a gap wider
    # than that means the bench loop dropped real coverage (a whole
    # operator family going missing must fail here, not hide under a
    # loose tolerance)
    assert len(missing) <= 3, f"sidecar missing queries: {sorted(missing)}"
    stale = recorded - registered
    assert len(stale) <= 3, f"sidecar records unregistered names: {sorted(stale)}"


def test_oversized_nonquery_fields_hard_fallback():
    """ADVICE r9: even when a non-query field is so large that the
    truncated-name floor still overflows, the emitted line must fit the
    window and parse, keeping failed_count."""
    t = {f"fail_{i:03d}": -1.0 for i in range(50)}
    doc = _doc(t)
    doc["giant_diagnostic_blob"] = "x" * 8000  # would defeat name truncation
    line = fit_to_window(doc, t, 1)
    assert len(line) <= 4000
    parsed = json.loads(line)
    assert parsed["failed_count"] == 50
    assert "giant_diagnostic_blob" not in parsed

