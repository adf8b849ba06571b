from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from calidad_del_aire_etl_spark import functions as fx


@pytest.fixture(scope="module")
def one(spark):
    return spark.range(1)


def _eval(one, col):
    return one.select(col.alias("x")).collect()[0]["x"]


@pytest.mark.parametrize(
    "pm25,expected",
    [
        (0.0, 0.0),
        (12.0, 50.0),
        (24.0, round(50 + (50 / 23.3) * (24 - 12.1), 4)),
        (55.4, round(100 + (50 / 19.9) * (55.4 - 35.5), 4)),
        (200.0, round(200 + (100 / 99.9) * (200 - 150.5), 4)),
    ],
)
def test_aqi_breakpoints(one, pm25, expected):
    assert _eval(one, fx.aqi_from_pm25(F.lit(pm25))) == pytest.approx(expected)


def test_aqi_null_passthrough(one):
    assert _eval(one, fx.aqi_from_pm25(F.lit(None).cast("double"))) is None


def test_aqi_monotone(spark):
    df = spark.range(0, 3000).select((F.col("id") / 10.0).alias("pm25"))
    df = df.select("pm25", fx.aqi_from_pm25(F.col("pm25")).alias("aqi"))
    from pyspark.sql import Window

    w = Window.orderBy("pm25")
    bad = df.select(
        (F.col("aqi") < F.lag("aqi").over(w) - 1e-9).alias("dec")
    ).filter("dec").count()
    assert bad == 0


@pytest.mark.parametrize(
    "aqi,label",
    [
        (None, "Unknown"),
        (10.0, "Good"),
        (75.0, "Moderate"),
        (120.0, "Unhealthy for Sensitive"),
        (180.0, "Unhealthy"),
        (300.0, "Very Unhealthy"),
    ],
)
def test_category(one, aqi, label):
    col = fx.quality_category(F.lit(aqi).cast("double"))
    assert _eval(one, col) == label


def test_char_entropy_known_values(spark):
    from calidad_del_aire_etl_spark.operators import text as t

    df = spark.createDataFrame(
        [(1, "aaaa"), (2, "abab"), (3, "abcd")], "doc_id bigint, text string"
    )
    out = {r["doc_id"]: r for r in t.char_entropy(df, "doc_id", "text").collect()}
    assert out[1]["entropy_bits"] == 0.0          # single symbol
    assert out[2]["entropy_bits"] == 1.0          # two equiprobable symbols
    assert out[3]["entropy_bits"] == 2.0          # four equiprobable symbols
    assert out[3]["n_distinct_chars"] == 4
