import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from numalogic_spark.operators.multimodal import (
    FEATURE_DIM,
    attach_media,
    decode_stub,
    extract_features,
    frame_sample_plan,
)


@pytest.fixture(scope="module")
def media(spark):
    pdf = pd.DataFrame({"doc_id": [f"m{i}" for i in range(10)], "text": [f"payload {i}" for i in range(10)]})
    return attach_media(spark.createDataFrame(pdf))


def test_media_schema_and_features(spark, media):
    feats = extract_features(media).orderBy("doc_id").toPandas()
    assert len(feats) == 10
    assert all(len(v) == FEATURE_DIM for v in feats["features"])
    assert (feats["payload_bytes"] == [len(f"payload {i}") for i in range(10)]).all()
    # deterministic: same payload → same features across runs
    again = extract_features(media).orderBy("doc_id").toPandas()
    for a, b in zip(feats["features"], again["features"]):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # features are normalized to [0, 1]
    allv = np.concatenate([np.asarray(v) for v in feats["features"]])
    assert allv.min() >= 0.0 and allv.max() <= 1.0


def test_decode_stub_raises():
    with pytest.raises(NotImplementedError):
        decode_stub(b"\x00", "image")


def test_frame_sample_plan(spark):
    pdf = pd.DataFrame({"doc_id": ["v1"], "text": ["vid"]})
    media = attach_media(spark.createDataFrame(pdf)).withColumn(
        "meta",
        F.struct(
            F.lit("video/fake").alias("mime"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(5000).cast("int").alias("duration_ms"),
        ),
    )
    frames = frame_sample_plan(media, every_ms=1000).toPandas()
    assert frames["frame_ms"].tolist() == [0, 1000, 2000, 3000, 4000, 5000]
