"""Plan-shape regression guards: the queries the engine advertises as
scale-critical must KEEP the physical plan that makes them scale — a
refactor that silently reintroduces a cartesian product, loses a broadcast,
or un-pushes a filter should fail here, not in a 100 TB run.
(tools/audit_plans.py sweeps every key for anti-patterns; these tests pin
the positive shape of a few load-bearing plans.)"""

from varda_spark.catalog import REGISTRY

SF = "/root/testdata/sf0.001"


def plan_of(spark, name: str) -> str:
    return REGISTRY[name].fn(spark, SF)._jdf.queryExecution().executedPlan().toString()


def test_freq_variant_broadcasts_dims(spark):
    plan = plan_of(spark, "freq_variant")
    assert "BroadcastHashJoin" in plan          # sample dim arrives broadcast
    assert "CartesianProduct" not in plan


def test_paginate_seek_is_take_ordered(spark):
    plan = plan_of(spark, "paginate_seek")
    assert "TakeOrderedAndProject" in plan       # per-partition top-n + tiny merge
    assert "Exchange SinglePartition" not in plan
    # the cursor predicate reaches the parquet scan
    assert "PushedFilters: [" in plan and "PushedFilters: []" not in plan


def test_filter_pushdown_and_column_pruning(spark):
    plan = plan_of(spark, "filter_eq")
    assert "PushedFilters: []" not in plan       # predicate at the scan
    plan2 = plan_of(spark, "agg_sum")
    # column pruning: the lineitem scan must not read all 16 columns
    scan = [ln for ln in plan2.splitlines() if "ReadSchema" in ln][0]
    schema = scan.split("ReadSchema: struct<", 1)[1]
    assert schema.count(",") + 1 <= 6, f"agg_sum scan reads too many columns: {scan}"


def test_join_interval_is_equi_join(spark):
    plan = plan_of(spark, "join_interval")
    assert "BroadcastNestedLoopJoin" not in plan  # binned rewrite, not theta
    assert "CartesianProduct" not in plan


def test_array_output_guard_trips(spark):
    """tools/check_oracle.py must reject array/map-typed output columns in
    oracle-twinned keys — the driver's canonicalizer cannot sort such
    cells (the four CORRECTNESS_r04 errs). A deliberately array-returning
    result must trip the guard; a scalar-only one must not."""
    import sys

    sys.path.insert(0, "/root/repo/tools")
    from check_oracle import array_output_cols

    bad = spark.sql(
        "SELECT 1 AS k, array(1, 2, 3) AS arr, map('a', 1) AS m"
    ).toPandas()
    assert set(array_output_cols(bad)) == {"arr", "m"}

    ok = spark.sql(
        "SELECT 1 AS k, array_join(array('a', 'b'), ',') AS joined"
    ).toPandas()
    assert array_output_cols(ok) == []


def test_partition_pruning_reaches_scan(spark):
    """scan_partition_pruned's year filter must arrive as a PartitionFilter
    on the hive-partitioned scratch table — metadata-only elimination, no
    data files read for other years."""
    plan = plan_of(spark, "scan_partition_pruned")
    assert "PartitionFilters: [" in plan
    seg = plan.split("PartitionFilters: [", 1)[1].split("]", 1)[0]
    assert "o_year" in seg, f"year predicate not pushed to partitions: {seg!r}"


def test_bucketed_agg_has_no_exchange(spark):
    """agg_bucketed_noshuffle's GROUP BY on the bucket key must run with
    ZERO Exchange — the bucket layout satisfies the hash-distribution
    requirement, which is the point of the key."""
    plan = plan_of(spark, "agg_bucketed_noshuffle")
    assert "Exchange hashpartitioning" not in plan, plan
