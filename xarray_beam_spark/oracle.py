"""Local mirror of the driver's DuckDB-oracle comparison.

Runs a registered Spark query and its oracle SQL side-by-side and compares
row count, column names, and order-insensitive values — so we catch gate
failures before the driver does.
"""

from __future__ import annotations

import math

import duckdb
import pandas as pd
from pyspark.sql import SparkSession

from xarray_beam_spark.tables import TABLE_NAMES


def run_oracle(sql: str, sf_dir: str) -> pd.DataFrame:
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con.execute(sql).df()


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64")
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
        elif df[c].dtype == object:
            # Arrow-enabled toPandas yields numpy arrays for ArrayType
            # columns — without the ndarray branch sort_values raises
            # "truth value of an array ... is ambiguous"
            # Recursive: nested array<array<T>> cells are ndarrays OF
            # ndarrays, and a shallow tuple() reintroduces the ambiguous-
            # truth-value crash one level down; numpy scalars (0-d,
            # iteration would raise) pass through via the ndim check.
            def _tuplize(v):
                if isinstance(v, (list, tuple)) or (
                    hasattr(v, "__array__") and getattr(v, "ndim", 0) > 0
                ):
                    return tuple(_tuplize(x) for x in v)
                return v

            df[c] = df[c].apply(_tuplize)
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)


def compare(spark_df, oracle_df: pd.DataFrame, float_exact: bool = True) -> list[str]:
    """Return a list of mismatch descriptions (empty == pass)."""
    got = _canon(spark_df.toPandas())
    want = _canon(oracle_df)
    problems: list[str] = []
    if list(got.columns) != list(want.columns):
        problems.append(f"columns: spark={list(got.columns)} oracle={list(want.columns)}")
        return problems
    if len(got) != len(want):
        problems.append(f"rowcount: spark={len(got)} oracle={len(want)}")
        return problems
    for c in got.columns:
        a, b = got[c], want[c]
        if pd.api.types.is_float_dtype(a) and pd.api.types.is_float_dtype(b):
            aa, bb = a.to_numpy(), b.to_numpy()
            both_nan = pd.isna(aa) & pd.isna(bb)
            if float_exact:
                ok = (aa == bb) | both_nan
            else:
                ok = [
                    (x == y) or (pd.isna(x) and pd.isna(y)) or math.isclose(x, y, rel_tol=1e-12)
                    for x, y in zip(aa, bb)
                ]
            if not all(ok):
                bad = [i for i, v in enumerate(ok) if not v][:3]
                problems.append(
                    f"col {c}: first diffs at rows {bad}: "
                    f"spark={[aa[i] for i in bad]} oracle={[bb[i] for i in bad]}"
                )
        else:
            if not a.equals(b):
                neq = a[a != b]
                if len(neq) == 0:
                    # values compare equal elementwise but .equals failed:
                    # the difference is the dtype itself (e.g. int64 vs
                    # float64 after canon) — name that, not "0 diffs"
                    problems.append(
                        f"col {c}: dtype mismatch spark={a.dtype} oracle={b.dtype}"
                    )
                else:
                    problems.append(
                        f"col {c}: {len(neq)} diffs, e.g. {neq.head(3).to_dict()} vs oracle"
                    )
    return problems


def check_query(spark: SparkSession, name: str, sf_dir: str) -> list[str]:
    from xarray_beam_spark import registry

    fn = registry.queries()[name]
    sql = registry.oracle_sql().get(name)
    df = fn(spark, sf_dir)
    if sql is None:
        # noop sink, not count(): count() lets Catalyst column-prune the
        # projection to a column-less scan, so a broken output expression
        # would pass here and fail only when the driver materializes it
        # (same hole the r13 noop-basis fix closed in bench.py). And not
        # collect(): that pulls the full result into the driver, risking
        # driver OOM on a large rows-only query at higher scale factors
        # (ADVICE r14). The noop write evaluates every column of every
        # row executor-side; a broken query surfaces as its exception.
        df.write.format("noop").mode("overwrite").save()
        return []
    return compare(df, run_oracle(sql, sf_dir))
