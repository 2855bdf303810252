"""spark-submit entrypoint: batch autoencoder-inference scoring — the
reference's inference vertex (udfs/inference.py:62-110) as an at-rest
job over an events table.

Usage:

    zip -r dist/numalogic_spark.zip numalogic_spark
    spark-submit --master local[8] \
        --py-files dist/numalogic_spark.zip \
        jobs/score_job.py --input <events parquet> --output <scores dir> \
        --family vanilla [--artifact <weights.json>] [--seq-len 8] \
        [--stride 4] [--threshold <err_mean cutoff>]

Design notes for the cluster deployment this mirrors:

- the window/z construction is operators/score.strided_z_windows — the
  SAME pipeline (and expression text) the driver-gated queries verify
  against DuckDB, so job output is oracle-proven arithmetic;
- ONE exchange on the series key; the forward pass is a single Arrow
  kernel with the KB-sized artifact riding the closure (no registry
  round-trips inside tasks, unlike the reference's per-message fetch —
  the artifact is loaded once on the driver);
- output parquet partitioned by source for downstream partition pruning;
- --artifact takes a frozen-weights JSON (the registry-style artifact
  the functions/*_ae modules read/write); without it the family's
  deterministic demo artifact is used (smoke/CI mode);
- --threshold adds an `is_anomaly` flag on err_mean — the static-
  threshold tail of the reference's scoring chain; the full
  threshold→postprocess pipeline lives in operators/pipeline.py.
"""

from __future__ import annotations

import argparse
import json

from numalogic_spark.session import get_spark


def main() -> None:
    from pyspark.sql import functions as F

    from numalogic_spark.operators.score import (
        FAMILIES,
        demo_weights,
        load_weights,
        score_windows,
        strided_z_windows,
    )

    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True, help="events parquet (event_id, ts, event_type, value)")
    ap.add_argument("--output", required=True)
    ap.add_argument("--family", required=True, choices=list(FAMILIES))
    ap.add_argument("--artifact", default=None,
                    help="frozen-weights JSON path; omit for the demo artifact")
    ap.add_argument("--seq-len", type=int, default=8)
    ap.add_argument("--stride", type=int, default=4)
    ap.add_argument("--threshold", type=float, default=None,
                    help="flag windows with err_mean above this")
    args = ap.parse_args()

    if args.artifact:
        with open(args.artifact) as f:
            weights = load_weights(args.family, f.read())
    else:
        weights = demo_weights(args.family, args.seq_len)

    spark = get_spark("score_job")
    ev = spark.read.parquet(args.input).select(
        F.col("event_type").alias("source"),
        F.unix_timestamp("ts").alias("ts_s"),
        "event_id",
        F.col("value").cast("double").alias("value"),
    )
    wins = strided_z_windows(ev, args.seq_len, args.stride)
    scored = score_windows(wins, args.family, weights).select(
        "source", "ts_s", "event_id", "err_mean", "err_max"
    )
    if args.threshold is not None:
        scored = scored.withColumn(
            "is_anomaly", F.col("err_mean") > F.lit(args.threshold)
        )
    scored.write.mode("overwrite").partitionBy("source").parquet(args.output)

    out = spark.read.parquet(args.output)
    summary = {
        "windows": out.count(),
        "sources": out.select("source").distinct().count(),
        "family": args.family,
    }
    if args.threshold is not None:
        summary["anomalies"] = out.filter("is_anomaly").count()
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
