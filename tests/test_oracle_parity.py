"""Every registered query must match its DuckDB oracle (the driver's gate)."""

from __future__ import annotations

import pytest

from xarray_beam_spark import oracle, registry


def _names():
    return sorted(registry.queries().keys())


@pytest.mark.parametrize("name", _names())
def test_query_matches_oracle(spark, sf_dir, name):
    problems = oracle.check_query(spark, name, sf_dir)
    assert not problems, f"{name}: " + "; ".join(problems)
