from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from numalogic_spark.datagen import gen_tokens_pandas
from numalogic_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("numalogic_spark_tests", cores=4, shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def tokens_pdf() -> pd.DataFrame:
    return gen_tokens_pandas(n_rows=20_000, n_sources=20)


@pytest.fixture(scope="session")
def tokens_df(spark, tokens_pdf):
    from numalogic_spark.datagen import TOKEN_SCHEMA

    df = spark.createDataFrame(tokens_pdf, schema=TOKEN_SCHEMA)
    df.persist()
    df.count()
    return df


def assert_frames_match(spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame, sort_cols, float_cols=(), atol=0.0):
    a = spark_pdf.sort_values(list(sort_cols), ignore_index=True)
    b = oracle_pdf.sort_values(list(sort_cols), ignore_index=True)
    assert list(a.columns) == list(b.columns), (list(a.columns), list(b.columns))
    assert len(a) == len(b), (len(a), len(b))
    for c in a.columns:
        if c in float_cols:
            np.testing.assert_allclose(
                a[c].to_numpy(dtype=float), b[c].to_numpy(dtype=float), atol=atol, rtol=1e-12, err_msg=c
            )
        else:
            pd.testing.assert_series_equal(a[c], b[c], check_names=False, obj=c)
