"""Scale mechanics: salted joins (hot-key mitigation) and bucketed
co-located joins (no shuffle on either side)."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_salted_join_matches_plain_join(spark):
    from griddb_spark.operators import salted_join

    # hot key: 90% of left rows share key 7
    left = spark.range(2000).select(
        F.when(F.col("id") % 10 < 9, 7).otherwise(F.col("id") % 100).alias("k"),
        F.col("id").alias("lv"),
    )
    right = spark.range(100).select(
        F.col("id").alias("k"), (F.col("id") * 10).alias("rv")
    )
    got = salted_join(left, right, on="k", salt=8)
    want = left.join(right, "k")
    assert got.count() == want.count()
    assert (
        got.agg(F.sum(F.col("lv") + F.col("rv")).alias("s")).first().s
        == want.agg(F.sum(F.col("lv") + F.col("rv")).alias("s")).first().s
    )
    # left join keeps unmatched rows exactly once
    left2 = left.withColumn("k", F.col("k") + 1000)  # no matches
    lj = salted_join(left2, right, on="k", how="left", salt=8)
    assert lj.count() == left2.count()
    assert lj.filter(F.col("rv").isNotNull()).count() == 0


def test_bucketed_join_has_no_shuffle(spark, tmp_path):
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        a = spark.range(10000).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("a")
        )
        b = spark.range(10000).select(
            F.col("id").alias("k"), (F.col("id") * 3).alias("b")
        )
        for name, df in (("bkt_a", a), ("bkt_b", b)):
            df.write.mode("overwrite").bucketBy(8, "k").sortBy("k").saveAsTable(name)
        joined = spark.table("bkt_a").join(spark.table("bkt_b"), "k")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        # co-located: bucketed layout replaces both shuffle exchanges
        assert "Exchange hashpartitioning" not in plan, plan
        assert joined.count() == 10000
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.sql("DROP TABLE IF EXISTS bkt_a")
        spark.sql("DROP TABLE IF EXISTS bkt_b")
