"""Property-based tests (Hypothesis) for the round-3 operator family:
interp regridding vs np.interp, stack/unstack and split/concat
roundtrips, roll vs np.roll — random shapes, chunkings, and inputs."""

from __future__ import annotations

import numpy as np
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from xarray_beam_spark import dataset as dsmod
from xarray_beam_spark.dataset import Dataset
from xarray_beam_spark.ndarray_ds import NDDataset

_SLOW = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _mk(spark, n, chunk, seed):
    rng = np.random.default_rng(seed)
    nd = NDDataset(
        {"v": (("t", "y"), rng.normal(size=(n, 3)))},
        coords={"t": np.arange(n, dtype=np.float64), "y": np.arange(3.0)},
    )
    return nd, Dataset.from_numpy(spark, nd, chunks={"t": chunk})


@_SLOW
@given(data=st.data())
def test_interp_matches_np_interp(spark, data):
    n = data.draw(st.integers(2, 20), label="n")
    chunk = data.draw(st.integers(1, 20), label="chunk")
    seed = data.draw(st.integers(0, 2**16), label="seed")
    nd, d = _mk(spark, n, min(chunk, n), seed)
    rng = np.random.default_rng(seed + 1)
    new_t = np.sort(rng.uniform(-2.0, n + 1.0, size=7))
    got = d.interp("t", new_t).collect()
    arr = nd.data_vars["v"].values
    want = np.stack(
        [np.interp(new_t, np.arange(n, dtype=np.float64), arr[:, j]) for j in range(3)],
        axis=1,
    )
    oob = (new_t < 0) | (new_t > n - 1)
    want[oob] = np.nan
    np.testing.assert_allclose(
        got.data_vars["v"].values, want, rtol=1e-9, atol=1e-12, equal_nan=True
    )


@_SLOW
@given(data=st.data())
def test_stack_unstack_roundtrip_prop(spark, data):
    n = data.draw(st.integers(2, 16), label="n")
    chunk = data.draw(st.integers(1, 16), label="chunk")
    seed = data.draw(st.integers(0, 2**16), label="seed")
    nd, d = _mk(spark, n, min(chunk, n), seed)
    s = d.stack("z", ["t", "y"])
    back = s.unstack(
        "z",
        {"t": n, "y": 3},
        coords={"t": nd.coords["t"].values, "y": nd.coords["y"].values},
    ).collect()
    np.testing.assert_array_equal(
        back.data_vars["v"].values, nd.data_vars["v"].values
    )
    np.testing.assert_array_equal(back.coords["t"].values, nd.coords["t"].values)


@_SLOW
@given(data=st.data())
def test_roll_matches_np_roll_prop(spark, data):
    n = data.draw(st.integers(1, 18), label="n")
    chunk = data.draw(st.integers(1, 18), label="chunk")
    k = data.draw(st.integers(-40, 40), label="k")
    seed = data.draw(st.integers(0, 2**16), label="seed")
    nd, d = _mk(spark, n, min(chunk, n), seed)
    got = d.roll("t", k).collect()
    np.testing.assert_array_equal(
        got.data_vars["v"].values,
        np.roll(nd.data_vars["v"].values, k % n, axis=0),
    )
    np.testing.assert_array_equal(
        got.coords["t"].values, np.roll(nd.coords["t"].values, k % n)
    )


@_SLOW
@given(data=st.data())
def test_split_concat_roundtrip_prop(spark, data):
    # split at a chunk-aligned boundary, concat back -> identical
    n_chunks = data.draw(st.integers(2, 5), label="n_chunks")
    chunk = data.draw(st.integers(1, 5), label="chunk")
    cut_c = data.draw(st.integers(1, n_chunks - 1), label="cut")
    seed = data.draw(st.integers(0, 2**16), label="seed")
    n = n_chunks * chunk
    nd, d = _mk(spark, n, chunk, seed)
    cut = cut_c * chunk
    a = d.isel(t=slice(0, cut))
    b = d.isel(t=slice(cut, n))
    back = dsmod.concat([a, b], "t").collect()
    assert back.identical(nd)
