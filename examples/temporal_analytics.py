"""Temporal analytics example: as-of enrichment + trend/correlation maps.

Composes the operators a production event pipeline chains together:

1. ``asof_join`` — enrich every click with the same user's most recent
   purchase (distributed merge_asof: one shuffle, no join node).
2. ``interval_join`` — attribute clicks to the 6-hour window after the
   same user's signup (time-bin bucketed equi-join, never a nested loop).
3. Grid analytics — build the dense (day × hour × event_type) activity
   grid and reduce it to a per-cell linear **trend** (OLS slope over
   days) and a **count-vs-users correlation** map, both via the narrow
   pre-aggregate + tree-merge reduction path.

Run:  python examples/temporal_analytics.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from xarray_beam_spark.dataset import Dataset
from xarray_beam_spark.operators.temporal import asof_join, interval_join
from xarray_beam_spark.session import get_spark
from xarray_beam_spark.tables import load


def main(sf_dir: str = "/root/testdata/sf0.001") -> None:
    spark = get_spark("temporal-analytics")
    spark.sparkContext.setLogLevel("ERROR")
    ev = load(spark, sf_dir, "events")

    clicks = ev.where(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "user_id", F.col("ts").alias("p_ts"), F.col("value").alias("p_value")
    )
    enriched = asof_join(
        clicks, purchases, on=["user_id"], left_time="ts", right_time="p_ts"
    )
    n_matched = enriched.where(F.col("p_ts").isNotNull()).count()
    print(f"asof: {n_matched} of {enriched.count()} clicks have a prior purchase")

    signups = ev.where(F.col("event_type") == "signup").select(
        "user_id",
        F.col("event_id").alias("signup_id"),
        F.col("ts").alias("lo"),
        (F.col("ts") + F.expr("INTERVAL 6 HOUR")).alias("hi"),
    )
    attributed = interval_join(
        clicks.withColumnRenamed("event_id", "click_id").withColumnRenamed(
            "ts", "click_ts"
        ),
        signups,
        on=["user_id"],
        point_time="click_ts",
        lo="lo",
        hi="hi",
        bin_width=6 * 3600,
    )
    print(f"interval: {attributed.count()} clicks within 6h of a signup")

    cells = (
        ev.groupBy(
            F.date_trunc("day", F.col("ts")).alias("day"),
            F.hour(F.col("ts")).cast("long").alias("hour"),
            F.col("event_type"),
        )
        .agg(
            F.count(F.lit(1)).cast("double").alias("cnt"),
            F.countDistinct("user_id").cast("double").alias("users"),
        )
    )
    row = cells.agg(
        F.collect_set("day").alias("d"), F.collect_set("event_type").alias("e")
    ).first()
    grid = Dataset.from_table(
        cells,
        dims=["day", "hour", "event_type"],
        coords={
            "day": np.array(sorted(row["d"]), dtype="datetime64[us]"),
            "hour": np.arange(24, dtype=np.int64),
            "event_type": np.array(sorted(row["e"])),
        },
        var_cols=["cnt", "users"],
        chunks={"day": 7},
    )
    slope = grid.trend("day").collect()
    print("trend NDDataset:", dict(slope.sizes))
    r = grid.corr("cnt", "users", "day").collect()
    finite = np.isfinite(r.data_vars["corr"].values)
    print(
        f"corr map: {int(finite.sum())} defined cells, "
        f"mean r = {np.nanmean(r.data_vars['corr'].values):.3f}"
    )


if __name__ == "__main__":
    main(*sys.argv[1:])
