"""Salted two-phase aggregation: identical results to direct groupBy,
plus skew metrics shape.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from hsearch_spark.operators.skew import (
    key_skew_metrics,
    salted_agg,
    salted_repartition,
)


def _skewed(spark):
    # key "hot" has 5000 rows; 10 cold keys have 10 each
    hot = [("hot", float(i % 7), i) for i in range(5000)]
    cold = [(f"k{j}", float(j), 10_000 + j * 10 + i) for j in range(10) for i in range(10)]
    return spark.createDataFrame(hot + cold, "key string, val double, doc_id long")


def test_salted_agg_matches_direct_groupby(spark):
    df = _skewed(spark)
    direct = {
        r["key"]: (r["n"], round(r["s"], 6), r["mx"])
        for r in df.groupBy("key")
        .agg(F.count("*").alias("n"), F.sum("val").alias("s"), F.max("val").alias("mx"))
        .collect()
    }
    salted = {
        r["key"]: (r["n"], round(r["s"], 6), r["mx"])
        for r in salted_agg(
            df, ["key"], {"n": "count(*)", "s": "sum(val)", "mx": "max(val)"}, 8
        ).collect()
    }
    assert direct == salted


def test_salted_agg_rejects_non_decomposable(spark):
    df = _skewed(spark)
    import pytest

    with pytest.raises(ValueError):
        salted_agg(df, ["key"], {"a": "avg(val)"})


def test_key_skew_metrics_orders_hot_first(spark):
    rows = key_skew_metrics(_skewed(spark), "key").collect()
    assert rows[0]["key"] == "hot"
    assert rows[0]["n_rows"] == 5000
    assert abs(rows[0]["share"] - 5000 / 5100) < 1e-9


def test_salted_repartition_spreads_hot_key(spark):
    df = _skewed(spark).repartition(1)
    out = salted_repartition(df, "key", salt_factor=8)
    # rows of the hot key should land in >1 partition
    parts = (
        out.where(F.col("key") == "hot")
        .select(F.spark_partition_id().alias("p"))
        .distinct()
        .count()
    )
    assert parts > 1
    assert out.count() == 5100
