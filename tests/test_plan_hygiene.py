"""Bulk plan hygiene: no accidental cartesian products anywhere.

Builds every registered batch query lazily at sf0.001 and asserts its
physical plan contains no BroadcastNestedLoopJoin / CartesianProduct,
except where a 1-row scalar broadcast is the intended plan (those are
whitelisted explicitly). This is the regression net for the scale rule
"joins never go quadratic": a future edit that knocks a join off its
equi-join keys fails here, not at 100 TB.
"""

from __future__ import annotations

import pytest

from xarray_beam_spark import registry

# Queries whose plan INTENTIONALLY contains a broadcast nested-loop join
# against a 1-row (scalar aggregate) build side — constant-size, benign.
SCALAR_BROADCAST_OK = {
    "q11_important_stock",   # fraction-of-total threshold scalar
    "q22_sales_opportunity", # avg acctbal scalar
    # bounded broadcast side by design (the stated all-pairs baseline):
    # the small query set broadcasts against the corpus — linear in the
    # corpus, never corpus×corpus. The scale path is ann_lsh/ann_ivf.
    "ann_brute_force_topk",
    "text_tfidf_topterms",   # corpus-size N scalar (1-row broadcast)
}

# Streaming gates execute eagerly through a sink when called; their join
# safety is covered by their own oracle gates.
SKIP_PREFIXES = ("stream_",)


def _collect_lazy_plans(spark, sf_dir):
    out = {}
    for name, fn in sorted(registry.queries().items()):
        if name.startswith(SKIP_PREFIXES):
            continue
        df = fn(spark, sf_dir)
        out[name] = df._jdf.queryExecution().executedPlan().toString()
    return out


def test_no_unintended_cartesian_products(spark, sf_dir):
    plans = _collect_lazy_plans(spark, sf_dir)
    assert len(plans) > 90
    bad = []
    for name, plan in plans.items():
        has_nested = "BroadcastNestedLoopJoin" in plan or "CartesianProduct" in plan
        if has_nested and name not in SCALAR_BROADCAST_OK:
            bad.append(name)
    assert not bad, f"unexpected nested-loop/cartesian joins in: {bad}"


def test_scalar_broadcast_whitelist_is_tight(spark, sf_dir):
    """Every whitelisted query must actually need its scalar broadcast —
    prune the whitelist when a plan improves."""
    plans = _collect_lazy_plans(spark, sf_dir)
    stale = [
        name
        for name in SCALAR_BROADCAST_OK
        if name in plans
        and "BroadcastNestedLoopJoin" not in plans[name]
        and "CartesianProduct" not in plans[name]
    ]
    assert not stale, f"whitelist entries no longer needed: {stale}"
