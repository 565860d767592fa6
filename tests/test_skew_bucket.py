"""Salted join equivalence + bucketed join shuffle elimination."""

from pyspark.sql import Row, functions as F

from varda_spark.operators.skew import salted_join


def test_salted_join_equals_plain(spark):
    facts = spark.createDataFrame(
        [Row(k=i % 3, v=i) for i in range(200)]  # key 0/1/2, heavy overlap
    )
    dim = spark.createDataFrame([Row(k=0, name="a"), Row(k=1, name="b"), Row(k=9, name="z")])
    plain = facts.join(dim, "k").select("k", "v", "name")
    salted = salted_join(facts, dim, "k", n_salts=4).select("k", "v", "name")
    assert salted.exceptAll(plain).count() == 0
    assert plain.exceptAll(salted).count() == 0


def test_bucketed_join_has_no_shuffle(spark, tmp_path):
    from varda_spark.sources.sinks import write_bucketed

    a = spark.range(0, 1000).withColumn("v", F.col("id") * 2)
    b = spark.range(0, 1000).withColumn("w", F.col("id") * 3)
    write_bucketed(a, "bkt_a", "id", n_buckets=8, path=str(tmp_path / "bkt_a"))
    write_bucketed(b, "bkt_b", "id", n_buckets=8, path=str(tmp_path / "bkt_b"))
    joined = spark.table("bkt_a").join(spark.table("bkt_b"), "id")
    plan = joined._jdf.queryExecution().executedPlan().toString()
    # co-located: no Exchange feeds the SortMergeJoin
    assert "Exchange hashpartitioning" not in plan
    assert joined.count() == 1000
    spark.sql("DROP TABLE IF EXISTS bkt_a")
    spark.sql("DROP TABLE IF EXISTS bkt_b")
