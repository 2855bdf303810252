"""Connector frame-contract tests: golden frames mirror the reference's
pandas normalizations (prometheus.py _consolidate_df/_agg_df,
rds/_base.py format_dataframe, wavefront.py _format_results) computed by
hand on tiny fixtures."""

import datetime as dt

import pandas as pd
import pytest

from numalogic_spark.sources.connectors import (
    Pivot,
    normalize_sql_frame,
    read_prometheus_frame,
    read_rds_source,
    read_wavefront_frame,
)

UTC = dt.timezone.utc


@pytest.fixture(scope="module")
def prom_response(spark):
    # two metrics, two pods each — the json-normalized query_range shape
    rows = [
        ("cpu", "p1", [(100, "1.0"), (160, "2.0")]),
        ("cpu", "p2", [(100, "3.0"), (160, "5.0")]),
        ("mem", "p1", [(100, "10.0"), (160, "20.0")]),
        ("mem", "p2", [(100, "30.0"), (160, "40.0")]),
    ]
    return spark.createDataFrame(
        rows, "metric_name string, pod string, values array<struct<ts: long, value: string>>"
    )


def test_prometheus_frame_aggregate(spark, prom_response):
    got = read_prometheus_frame(prom_response, ["cpu", "mem"], aggregate=True).toPandas()
    # reference: per-timestamp mean across label combinations
    assert got["timestamp"].tolist() == [
        dt.datetime(1970, 1, 1, 0, 1, 40),
        dt.datetime(1970, 1, 1, 0, 2, 40),
    ]
    assert got["cpu"].tolist() == [2.0, 3.5]
    assert got["mem"].tolist() == [20.0, 30.0]


def test_prometheus_frame_with_labels(spark, prom_response):
    got = read_prometheus_frame(
        prom_response, ["cpu", "mem"], return_labels=["pod"], aggregate=False
    ).toPandas()
    assert sorted(got.columns) == ["cpu", "mem", "pod", "timestamp"]
    row = got[(got["pod"] == "p2") & (got["cpu"] == 5.0)]
    assert len(row) == 1 and row["mem"].iloc[0] == 40.0
    assert len(got) == 4  # (2 timestamps × 2 pods), metrics joined wide


def test_rds_format_dataframe(spark):
    pdf = pd.DataFrame(
        {
            "eventdatetime": pd.to_datetime(
                ["2024-01-01 00:00:01", "2024-01-01 00:00:01", "2024-01-01 00:00:02"]
            ),
            "service": ["a", "b", "a"],
            "count": [1, 2, 3],
        }
    )
    df = spark.createDataFrame(pdf)
    # plain normalization: datetime → epoch-ms timestamp (ref _base.py:43)
    got = normalize_sql_frame(df, "eventdatetime").toPandas()
    assert "eventdatetime" not in got.columns
    assert got["timestamp"].tolist() == [1704067201000, 1704067201000, 1704067202000]
    # group-by-sum (ref _base.py:46-47)
    g = normalize_sql_frame(df, "eventdatetime", group_by=["service"]).toPandas()
    assert dict(zip(g["service"], g["count"])) == {"a": 4, "b": 2}
    # pivot (ref _base.py:49-56): one column per category value
    p = normalize_sql_frame(
        df, "eventdatetime", pivot=Pivot(index="timestamp", columns=["service"], value=["count"])
    ).toPandas().sort_values("timestamp")
    assert p[p["timestamp"] == 1704067201000][["a", "b"]].iloc[0].tolist() == [1, 2]


def test_rds_reader_sql_seam(spark):
    pdf = pd.DataFrame(
        {
            "eventdatetime": pd.to_datetime(["2024-01-01 00:00:01"]),
            "count": [7],
        }
    )
    spark.createDataFrame(pdf).createOrReplaceTempView("rds_stub")
    got = read_rds_source(
        spark, "SELECT * FROM rds_stub", datetime_column_name="eventdatetime"
    ).toPandas()
    assert got["timestamp"].tolist() == [1704067201000] and got["count"].tolist() == [7]


def test_wavefront_frame(spark):
    df = spark.createDataFrame(
        [([(200, 1.5), (100, 0.5)],)], "data array<struct<ts: long, value: double>>"
    )
    got = read_wavefront_frame(df).toPandas()
    assert got["timestamp"].tolist() == [
        dt.datetime(1970, 1, 1, 0, 1, 40),
        dt.datetime(1970, 1, 1, 0, 3, 20),
    ]
    assert got["value"].tolist() == [0.5, 1.5]
