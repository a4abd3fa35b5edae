"""Bucketed co-located joins: zero exchanges on the join key."""

from pyspark.sql import functions as F

from thesaurus_based_ner_spark.sources.catalog import write_bucketed


def test_bucketed_join_has_no_exchange(spark):
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        big = (
            spark.range(20000)
            .withColumn("k", F.col("id") % 1000)
            .withColumn("v", F.md5(F.col("id").cast("string")))
        )
        dim = (
            spark.range(5000)
            .withColumn("k", F.col("id") % 1000)
            .withColumn("w", F.md5(F.col("id").cast("string")))
        )
        write_bucketed(spark, big, "bktest_big", ["k"], n_buckets=8)
        write_bucketed(spark, dim, "bktest_dim", ["k"], n_buckets=8)
        j = spark.table("bktest_big").join(spark.table("bktest_dim"), "k")
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        assert j.count() == 20000 * 5
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        spark.sql("DROP TABLE IF EXISTS bktest_big")
        spark.sql("DROP TABLE IF EXISTS bktest_dim")
