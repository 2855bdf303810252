"""Connector-shape readers: Prometheus, RDS/JDBC, Wavefront (S3/S4/S5).

The reference pulls observability data through four HTTP/DB connectors and
normalizes each into the same frame contract the pipeline consumes. This
module re-expresses those normalizations as DataFrame plans over whatever
Spark source carries the raw payloads (parquet landing zone, Kafka topic,
JDBC) — the network client is out of scope (SURVEY §0), the FRAME CONTRACT
is what a user porting a numalogic config needs:

- Prometheus (connectors/prometheus.py:113-118 _consolidate_df, :197-205
  fetch): response rows carry a values array of (epoch_s, value-string);
  normalize = explode → float cast → epoch→timestamp → one column per
  metric (multi-metric outer join on timestamp+labels) → optional
  per-timestamp mean aggregation (:193-195 _agg_df).
- RDS (connectors/rds/_rds.py:34-71 fetch, rds/_base.py:43-58
  format_dataframe): arbitrary SQL rows; normalize = datetime column →
  epoch-MILLISECOND `timestamp` + optional group-by-sum + optional pivot.
- Wavefront (connectors/wavefront.py:71-159): timeseries rows carry a data
  array of (epoch_s, value); normalize = explode → (timestamp, value),
  time-sorted.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_prometheus_frame(
    df: DataFrame,
    metric_names: list[str],
    metric_col: str = "metric_name",
    values_col: str = "values",
    return_labels: list[str] | None = None,
    aggregate: bool = True,
    decimal_mean: bool = False,
) -> DataFrame:
    """Prometheus response rows → the reference's connector frame.

    Input rows: (metric_name, <label cols>, values: array<struct<ts:long,
    value:string>>) — the shape of a json-normalized query_range response
    landed in a table. Output: (timestamp[, *return_labels], <one double
    column per metric>), with `aggregate` collapsing to the per-timestamp
    mean of each metric (ref: prometheus.py:193-195). `decimal_mean`
    computes that mean via exact decimal(20,6) sums — order-independent
    under distributed aggregation (for reproducibility-gated pipelines;
    quantizes values to 6dp).
    """
    labels = return_labels or []
    long = df.select(
        F.col(metric_col).alias("_metric"),
        *[F.col(c) for c in labels],
        F.explode(F.col(values_col)).alias("_tv"),
    ).select(
        "_metric",
        *labels,
        F.timestamp_seconds(F.col("_tv.ts")).alias("timestamp"),
        F.col("_tv.value").cast("double").alias("_value"),
    )
    if aggregate:
        # join-then-mean collapses label combinations per timestamp
        # (ref _agg_df) — one pivot with avg expresses both steps
        mean = (
            (F.sum(F.col("_value").cast("decimal(20,6)")).cast("double") / F.count("_value"))
            if decimal_mean
            else F.avg("_value")
        )
        return (
            long.groupBy("timestamp")
            .pivot("_metric", metric_names)
            .agg(mean)
            .orderBy("timestamp")
        )
    return (
        long.groupBy("timestamp", *labels)
        .pivot("_metric", metric_names)
        .agg(F.first("_value"))
        .orderBy("timestamp")
    )


@dataclass(frozen=True)
class Pivot:
    """Mirror of the reference's pivot config (rds/_config.py)."""

    index: str = "timestamp"
    columns: list[str] = field(default_factory=list)
    value: list[str] = field(default_factory=lambda: ["count"])


def normalize_sql_frame(
    df: DataFrame,
    datetime_column_name: str,
    group_by: list[str] | None = None,
    pivot: Pivot | None = None,
) -> DataFrame:
    """format_dataframe (rds/_base.py:43-58) as a plan: datetime column →
    epoch-ms `timestamp`, optional group-by-sum of the numeric columns,
    optional pivot to one column per category value."""
    out = df.withColumn(
        "timestamp", F.unix_millis(F.col(datetime_column_name).cast("timestamp"))
    ).drop(datetime_column_name)
    if group_by:
        num_cols = [
            f.name
            for f in out.schema.fields
            if f.name not in group_by and f.dataType.typeName() in
            ("integer", "long", "double", "float", "decimal", "short")
        ]
        out = out.groupBy(*group_by).agg(*[F.sum(c).alias(c) for c in num_cols])
    if pivot and pivot.columns:
        out = (
            out.groupBy(pivot.index)
            .pivot(pivot.columns[0])
            .agg(F.first(pivot.value[0]))
        )
    return out


def read_rds_source(
    spark: SparkSession,
    query: str,
    datetime_column_name: str,
    jdbc_url: str | None = None,
    jdbc_properties: dict[str, str] | None = None,
    group_by: list[str] | None = None,
    pivot: Pivot | None = None,
    df: DataFrame | None = None,
) -> DataFrame:
    """RDS fetch (rds/_rds.py:34-71): run `query` over JDBC (or over
    registered temp views when no jdbc_url — also the test seam), then
    apply the reference's frame normalization."""
    if df is None:
        if jdbc_url:
            reader = spark.read.format("jdbc").option("url", jdbc_url).option("query", query)
            for k, v in (jdbc_properties or {}).items():
                reader = reader.option(k, v)
            df = reader.load()
        else:
            df = spark.sql(query)
    return normalize_sql_frame(df, datetime_column_name, group_by, pivot)


def read_wavefront_frame(df: DataFrame, data_col: str = "data") -> DataFrame:
    """Wavefront timeseries rows → (timestamp, value), time-sorted
    (ref: wavefront.py:52-70 _format_results)."""
    return (
        df.select(F.explode(F.col(data_col)).alias("_tv"))
        .select(
            F.timestamp_seconds(F.col("_tv.ts")).alias("timestamp"),
            F.col("_tv.value").cast("double").alias("value"),
        )
        .orderBy("timestamp")
    )
