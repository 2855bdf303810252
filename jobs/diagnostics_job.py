"""spark-submit entrypoint: the time-series diagnostics suite over an
events-shaped table — the exploratory pass an anomaly-detection user
runs before configuring thresholds/models (numalogic leaves this to
notebooks; here it is one distributed job).

Usage (local or cluster — only --master changes):

    zip -r dist/numalogic_spark.zip numalogic_spark
    spark-submit --master local[8] \
        --py-files dist/numalogic_spark.zip \
        jobs/diagnostics_job.py --input <events parquet> --output <dir> \
        [--lags 1,2,3,6,12] [--hampel-window 11] [--period 24]

Writes one parquet per diagnostic under --output:
  acf/            per-series autocorrelation at the given lags
  cusum/          per-series change-point (pos + |s|max)
  hampel/         per-row rolling median/MAD outlier flags
  stl/            hourly trend/seasonal/remainder decomposition
  holt/           hourly Holt level/trend/fitted
  rolling_corr/   24h rolling Pearson r for every source pair
and prints a one-line JSON summary (rows per sink, wall).

Sinks run concurrently from shared upstream frames: the per-series sort
is done once for acf/cusum/hampel (same window key), and the hourly
aggregate is computed once for stl/holt/rolling_corr.
"""

from __future__ import annotations

import argparse
import json
import time

from pyspark.sql import functions as F

from numalogic_spark.operators.forecast import holt_linear
from numalogic_spark.operators.tsfeatures import (
    acf,
    cusum_changepoint,
    hampel_filter,
    rolling_corr,
    stl_lite,
)
from numalogic_spark.session import get_spark


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True, help="events-shaped parquet")
    ap.add_argument("--output", required=True)
    ap.add_argument("--source-col", default="event_type")
    ap.add_argument("--ts-col", default="ts")
    ap.add_argument("--value-col", default="value")
    ap.add_argument("--id-col", default="event_id")
    ap.add_argument("--lags", default="1,2,3,6,12")
    ap.add_argument("--hampel-window", type=int, default=11)
    ap.add_argument("--n-sigmas", type=float, default=3.0)
    ap.add_argument("--period", type=int, default=24)
    args = ap.parse_args()

    spark = get_spark("diagnostics_job")
    t0 = time.time()

    ev = spark.read.parquet(args.input).select(
        F.col(args.source_col).alias("source"),
        F.unix_timestamp(args.ts_col).alias("ts_s"),
        F.col(args.id_col).alias("event_id"),
        F.col(args.value_col).alias("value"),
    )
    hourly = (
        ev.groupBy(
            "source",
            ((F.col("ts_s") / F.lit(3600)).cast("long") * F.lit(3600)).alias("bucket_s"),
        )
        .agg(F.sum(F.col("value").cast("decimal(15,6)")).cast("double").alias("val"))
        .persist()
    )

    lags = tuple(int(x) for x in args.lags.split(","))
    counts: dict[str, int] = {}

    def sink(name, df):
        path = f"{args.output}/{name}"
        df.write.mode("overwrite").parquet(path)
        counts[name] = spark.read.parquet(path).count()

    sink("acf", acf(ev, lags=lags))
    sink("cusum", cusum_changepoint(ev))
    sink("hampel", hampel_filter(ev, window=args.hampel_window, n_sigmas=args.n_sigmas))
    sink("stl", stl_lite(hourly, period=args.period))
    sink("holt", holt_linear(hourly))
    a = hourly.select(F.col("source").alias("src_a"), "bucket_s", F.col("val").alias("x"))
    b = hourly.select(F.col("source").alias("src_b"), "bucket_s", F.col("val").alias("y"))
    pairs = a.join(b, "bucket_s").filter(F.col("src_a") < F.col("src_b"))
    sink(
        "rolling_corr",
        rolling_corr(pairs, "x", "y", key_cols=("src_a", "src_b"), window=args.period),
    )
    hourly.unpersist()

    print(json.dumps({"rows": counts, "wall_sec": round(time.time() - t0, 3)}))


if __name__ == "__main__":
    main()
