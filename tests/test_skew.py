"""Salted aggregation/join correctness (vs plain equivalents) and
bucketed-table shuffle elimination."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_pipelines_cu_spark.operators import skew


def _skewed(spark):
    # one hot key (90%), several cold keys
    hot = spark.range(900).select(
        F.lit("hot").alias("k"), (F.col("id") % 7).cast("double").alias("v")
    )
    cold = spark.range(100).select(
        F.concat(F.lit("c"), (F.col("id") % 10)).alias("k"),
        F.col("id").cast("double").alias("v"),
    )
    return hot.unionByName(cold)


def test_salted_agg_matches_plain(spark):
    df = _skewed(spark)
    plain = {
        (r.k): (r.s, r.n, r.mn, r.mx)
        for r in df.groupBy("k")
        .agg(
            F.sum("v").alias("s"),
            F.count(F.lit(1)).alias("n"),
            F.min("v").alias("mn"),
            F.max("v").alias("mx"),
        )
        .collect()
    }
    salted = {
        (r.k): (r.s, r.n, r.mn, r.mx)
        for r in skew.salted_agg(
            df,
            ["k"],
            {
                "s": ("sum", "v"),
                "n": ("count", "v"),
                "mn": ("min", "v"),
                "mx": ("max", "v"),
            },
            n_salts=8,
        ).collect()
    }
    assert salted == plain


def test_salted_broadcast_left_matches_plain_join(spark):
    big = _skewed(spark)
    small = spark.createDataFrame(
        [("hot", 1.5), ("c1", 2.0)], ["k", "weight"]
    )
    plain = big.join(small, "k").agg(F.sum(F.col("v") * F.col("weight"))).first()[0]
    salted = (
        skew.salted_broadcast_left(big, small, "k", n_salts=4)
        .agg(F.sum(F.col("v") * F.col("weight")))
        .first()[0]
    )
    assert abs(plain - salted) < 1e-9


def test_bucketed_join_has_no_shuffle(spark, tmp_path):
    # warehouse dir is a static conf; tables land in ./spark-warehouse
    # (gitignored). A stale dir without catalog metadata blocks creation —
    # clear both first.
    import shutil

    for t in ("bk_a", "bk_b"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        shutil.rmtree(f"spark-warehouse/{t}", ignore_errors=True)
    a = spark.range(1000).select(F.col("id").alias("k"), F.rand(1).alias("x"))
    b = spark.range(1000).select(F.col("id").alias("k"), F.rand(2).alias("y"))
    skew.write_bucketed(a, "bk_a", "k", n_buckets=4, sort_col="k")
    skew.write_bucketed(b, "bk_b", "k", n_buckets=4, sort_col="k")
    # force the non-broadcast path: the point is that identical bucketing
    # replaces the shuffle a SortMergeJoin would otherwise need
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table("bk_a").join(spark.table("bk_b"), "k")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange hashpartitioning" not in plan  # no shuffle: co-located
        assert joined.count() == 1000
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "64MB")
