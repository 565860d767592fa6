"""Operator catalog: every driver-checked query lives here, Spark + oracle.

Each entry pairs a Spark callable ``(spark, sf_dir) -> DataFrame`` with the
equivalent DuckDB ANSI SQL (or None for non-SQL-expressible ops → the
driver does a rows-only check). Column names are aliased identically on
both sides — the driver's hash compare sorts columns by name.

ONE file on purpose: each query sits beside the oracle that defines its
semantics (the pairs are reviewed and greppable together), registration
order is the file order (with the curated `_DRIVER_PRIORITY` re-order at
the bottom), and the heavy lifting lives in the operator modules this file
merely wires up — splitting by family would separate queries from their
oracles and buy nothing but import ceremony.

Float discipline (SURVEY.md §7 "hardest five things" #5): double
aggregation is order-sensitive, and Spark and DuckDB will sum in different
orders. Every aggregate therefore runs on DECIMAL(18,4) interior values
(exact, associative) and only the FINAL result is cast to double — a
deterministic conversion that yields bit-identical values in both engines.
Counts are cast to bigint on both sides.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.window import Window

from varda_spark.sources.tables import read_table


@dataclass
class Q:
    fn: Callable[[SparkSession, str], DataFrame]
    sql: str | None  # DuckDB oracle; None → rows-only check


REGISTRY: dict[str, Q] = {}


def q(name: str, sql: str | None):
    def deco(fn):
        # a silent re-registration would orphan the first key's oracle
        # AND invalidate any driver hash certified under the old
        # semantics (the round-7 win_bollinger near-miss)
        assert name not in REGISTRY, f"duplicate catalog key: {name}"
        REGISTRY[name] = Q(fn, sql)
        return fn

    return deco


# ---- exact-aggregation helpers (see module docstring) ----

def dec(col, scale: int = 4):
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(f"decimal(18,{scale})")


def dsum(col, scale: int = 4) -> F.Column:
    """Exact sum of a double column; deterministic double result."""
    return F.sum(dec(col, scale)).cast("double")


def davg(col, scale: int = 4) -> F.Column:
    """sum(decimal)/count — identical arithmetic in DuckDB oracle."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(dec(col, scale)).cast("double") / F.count(c).cast("double")


# DuckDB twins of dsum/davg (for composing oracle SQL strings)
def osum(col: str, scale: int = 4) -> str:
    return f"CAST(SUM(CAST({col} AS DECIMAL(18,{scale}))) AS DOUBLE)"


def oavg(col: str, scale: int = 4) -> str:
    return f"CAST(SUM(CAST({col} AS DECIMAL(18,{scale}))) AS DOUBLE) / CAST(COUNT({col}) AS DOUBLE)"


# ---- warehouse scratch hygiene (physical-design keys) ----

_SCRATCH_PREFIXES = (
    "bkt_orders_", "bkt_customer_", "bktagg_orders_", "part_orders_",
)


def _sweep_stale_scratch(max_age_h: float = 6.0) -> None:
    """Remove warehouse scratch dirs left behind by PRIOR sessions.

    The physical-design keys (join_bucketed, agg_bucketed_noshuffle,
    scan_partition_pruned) write session-scoped scratch tables
    (applicationId suffix — fixed names race across concurrent
    sessions: FAILED_READ_FILE). The returned DataFrames read those
    files LAZILY, so the writing session cannot try/finally-delete them
    itself; instead each invocation sweeps sibling dirs whose directory
    MTIME is older than ``max_age_h`` — old enough that no live session
    still references them, so the sweep cannot recreate the race the
    suffix prevents. Aging by mtime, not by the applicationId timestamp
    embedded in the name (ADVICE r6): the appId encodes session START,
    so a sibling session alive >6h would have its freshly WRITTEN dirs
    deleted under the old rule. Bounds spark-warehouse/ growth across
    bench/test runs (ADVICE r5: previously three full parquet copies of
    orders leaked per session, unbounded)."""
    import os
    import shutil
    import time

    wh = "/root/repo/spark-warehouse"
    cutoff_s = time.time() - max_age_h * 3600.0
    try:
        entries = os.listdir(wh)
    except OSError:
        return
    for name in entries:
        if not name.startswith(_SCRATCH_PREFIXES):
            continue
        path = os.path.join(wh, name)
        try:
            if os.path.getmtime(path) < cutoff_s:
                shutil.rmtree(path, ignore_errors=True)
        except OSError:
            continue  # concurrent sweep already removed it


# =====================================================================
# B. Projections / filters
# =====================================================================

@q(
    "filter_eq",
    """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
       FROM lineitem WHERE l_returnflag = 'R' AND l_linestatus = 'F'""",
)
def filter_eq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B1 variant-key-style equality filter; pushed down to parquet scan."""
    li = read_table(spark, sf_dir, "lineitem")
    return li.filter((F.col("l_returnflag") == "R") & (F.col("l_linestatus") == "F")).select(
        "l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice"
    )


@q(
    "filter_bool",
    """SELECT o_orderkey, o_totalprice FROM orders
       WHERE o_totalprice > 100000 AND o_orderstatus = 'O'""",
)
def filter_bool(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B2 boolean-conjunction gating (sample-status predicate shape)."""
    o = read_table(spark, sf_dir, "orders")
    return o.filter((F.col("o_totalprice") > 100000) & (F.col("o_orderstatus") == "O")).select(
        "o_orderkey", "o_totalprice"
    )


@q(
    "expr_select",
    """SELECT c_custkey, c_name FROM customer
       WHERE (c_mktsegment = 'BUILDING' OR c_mktsegment = 'MACHINERY')
         AND NOT c_acctbal < 0""",
)
def expr_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B3 expression-DSL shape: parsed boolean tree → Column predicate.

    The genomic DSL itself (expressions.compile_selection) is golden-tested
    in pytest; this exercises the same compiled-predicate path on driver
    tables.
    """
    c = read_table(spark, sf_dir, "customer")
    pred = ((F.col("c_mktsegment") == "BUILDING") | (F.col("c_mktsegment") == "MACHINERY")) & ~(
        F.col("c_acctbal") < 0
    )
    return c.filter(pred).select("c_custkey", "c_name")


# =====================================================================
# C. Joins
# =====================================================================

@q(
    "join_equi",
    """SELECT c.c_mktsegment AS mktsegment,
              CAST(COUNT(*) AS BIGINT) AS n_orders,
              {sum_price} AS sum_price
       FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
       GROUP BY c.c_mktsegment""".format(sum_price=osum("o.o_totalprice", 2)),
)
def join_equi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C2 FK equi join orders→customer + aggregate."""
    o = read_table(spark, sf_dir, "orders")
    c = read_table(spark, sf_dir, "customer")
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy(F.col("c_mktsegment").alias("mktsegment"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_orders"),
            dsum("o_totalprice", 2).alias("sum_price"),
        )
    )


@q(
    "join_broadcast",
    """SELECT n.n_name AS nation, CAST(COUNT(*) AS BIGINT) AS n_customers
       FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
       GROUP BY n.n_name""",
)
def join_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C2 with explicit broadcast of the dimension (25 rows → every executor)."""
    c = read_table(spark, sf_dir, "customer")
    n = read_table(spark, sf_dir, "nation")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_customers"))
    )


@q(
    "join_semi",
    """SELECT c_custkey, c_name FROM customer c
       WHERE EXISTS (SELECT 1 FROM orders o
                     WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 200000)""",
)
def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C3 semi join: customers with ≥1 big order, each exactly once."""
    c = read_table(spark, sf_dir, "customer")
    o = read_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 200000)
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select("c_custkey", "c_name")


@q(
    "join_anti",
    """SELECT c_custkey, c_name FROM customer c
       WHERE NOT EXISTS (SELECT 1 FROM orders o
                         WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000)""",
)
def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4 anti join: customers with no big order (checksum-dedup shape A7)."""
    c = read_table(spark, sf_dir, "customer")
    o = read_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 300000)
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select("c_custkey", "c_name")


@q(
    "join_left",
    """SELECT c.c_custkey,
              CAST(COALESCE(agg.n, 0) AS BIGINT) AS n_orders,
              CAST(COALESCE(agg.s, 0) AS DOUBLE) AS sum_price
       FROM customer c LEFT JOIN (
           SELECT o_custkey, COUNT(*) AS n, {s} AS s
           FROM orders GROUP BY o_custkey) agg
       ON c.c_custkey = agg.o_custkey""".format(s=osum("o_totalprice", 2)),
)
def join_left(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C5 left outer join: every left row survives, zeros for misses."""
    c = read_table(spark, sf_dir, "customer")
    o = read_table(spark, sf_dir, "orders")
    agg = o.groupBy("o_custkey").agg(
        F.count(F.lit(1)).alias("n"), dsum("o_totalprice", 2).alias("s")
    )
    return (
        c.join(agg, c.c_custkey == agg.o_custkey, "left")
        .select(
            "c_custkey",
            F.coalesce(F.col("n"), F.lit(0)).cast("bigint").alias("n_orders"),
            F.coalesce(F.col("s"), F.lit(0.0)).cast("double").alias("sum_price"),
        )
    )


@q(
    "join_range",
    """SELECT o.o_orderkey, CAST(COUNT(*) AS BIGINT) AS n_in_window
       FROM orders o JOIN lineitem l
         ON l.l_orderkey = o.o_orderkey
        AND l.l_shipdate >= o.o_orderdate
        AND l.l_shipdate <= o.o_orderdate + INTERVAL 90 DAY
       GROUP BY o.o_orderkey""",
)
def join_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C6 range join with an equi component: lineitems shipped ≤90d of order.

    The equi key keeps this a hash join; the range is a residual predicate —
    the same plan shape the binned interval join produces.
    """
    o = read_table(spark, sf_dir, "orders")
    li = read_table(spark, sf_dir, "lineitem")
    cond = (
        (li.l_orderkey == o.o_orderkey)
        & (li.l_shipdate >= o.o_orderdate)
        & (li.l_shipdate <= F.col("o_orderdate") + F.expr("INTERVAL 90 DAY"))
    )
    return o.join(li, cond).groupBy("o_orderkey").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_in_window")
    )


# =====================================================================
# D. Aggregations
# =====================================================================

@q(
    "agg_sum",
    """SELECT l_returnflag, l_linestatus,
              {qty} AS sum_qty,
              {price} AS sum_price,
              CAST(COUNT(*) AS BIGINT) AS n_rows
       FROM lineitem GROUP BY l_returnflag, l_linestatus""".format(
        qty=osum("l_quantity", 2), price=osum("l_extendedprice", 2)
    ),
)
def agg_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D1 numerator shape: grouped support sums (TPC-H Q1 skeleton)."""
    li = read_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        dsum("l_quantity", 2).alias("sum_qty"),
        dsum("l_extendedprice", 2).alias("sum_price"),
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
    )


@q(
    "agg_conditional",
    """SELECT l_returnflag,
              {hi} AS sum_hi_discount,
              {lo} AS sum_lo_discount
       FROM lineitem GROUP BY l_returnflag""".format(
        hi="CAST(SUM(CASE WHEN l_discount > 0.05 THEN CAST(l_quantity AS DECIMAL(18,2)) ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)",
        lo="CAST(SUM(CASE WHEN l_discount <= 0.05 THEN CAST(l_quantity AS DECIMAL(18,2)) ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)",
    ),
)
def agg_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D2 denominator shape: conditional sums (covered vs unconditional)."""
    li = read_table(spark, sf_dir, "lineitem")
    z = F.lit(0).cast("decimal(18,2)")
    return li.groupBy("l_returnflag").agg(
        F.sum(F.when(F.col("l_discount") > 0.05, dec("l_quantity", 2)).otherwise(z))
        .cast("double")
        .alias("sum_hi_discount"),
        F.sum(F.when(F.col("l_discount") <= 0.05, dec("l_quantity", 2)).otherwise(z))
        .cast("double")
        .alias("sum_lo_discount"),
    )


@q(
    "agg_ratio",
    """SELECT l_returnflag,
              {num} / {den} AS avg_qty
       FROM lineitem GROUP BY l_returnflag""".format(
        num=osum("l_quantity", 2), den="CAST(COUNT(l_quantity) AS DOUBLE)"
    ),
)
def agg_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D3 frequency derivation: exact sum ÷ count → deterministic double."""
    li = read_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(davg("l_quantity", 2).alias("avg_qty"))


@q(
    "agg_count_distinct",
    """SELECT event_type, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
       FROM events GROUP BY event_type""",
)
def agg_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D4 distinct samples per variant → distinct users per event type."""
    ev = read_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.countDistinct("user_id").cast("bigint").alias("n_users")
    )


@q(
    "agg_count",
    """SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_events
       FROM events GROUP BY event_type""",
)
def agg_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D5 import statistics: plain grouped counts."""
    ev = read_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(F.count(F.lit(1)).cast("bigint").alias("n_events"))


@q(
    "agg_rollup",
    """SELECT l_returnflag, l_linestatus,
              {qty} AS sum_qty
       FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)""".format(
        qty=osum("l_quantity", 2)
    ),
)
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D6 rollup: (flag,status), (flag), () grand total."""
    li = read_table(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(dsum("l_quantity", 2).alias("sum_qty"))


@q(
    "agg_cube",
    """SELECT l_returnflag, l_linestatus,
              CAST(COUNT(*) AS BIGINT) AS n_rows
       FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)""",
)
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D6 cube: all grouping-set combinations."""
    li = read_table(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows")
    )


# =====================================================================
# F. Sorts / limits
# =====================================================================

@q(
    "sort_limit",
    """SELECT o_orderkey, o_totalprice FROM orders
       ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10""",
)
def sort_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1 ordered pagination page 1 (top-k; tie-broken deterministically)."""
    o = read_table(spark, sf_dir, "orders")
    return (
        o.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .select("o_orderkey", "o_totalprice")
        .limit(10)
    )


@q(
    "sort_multi",
    """SELECT l_orderkey, l_linenumber, l_shipdate FROM lineitem
       WHERE l_orderkey < 100 ORDER BY l_orderkey, l_linenumber""",
)
def sort_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F2 multi-key global sort (VCF position-order shape)."""
    li = read_table(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_orderkey") < 100)
        .orderBy("l_orderkey", "l_linenumber")
        .select("l_orderkey", "l_linenumber", "l_shipdate")
    )


# =====================================================================
# G. Set operations
# =====================================================================

@q(
    "set_union",
    """SELECT nationkey, CAST(COUNT(*) AS BIGINT) AS n FROM (
         SELECT c_nationkey AS nationkey FROM customer
         UNION ALL
         SELECT s_nationkey AS nationkey FROM supplier
       ) GROUP BY nationkey""",
)
def set_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G1 UNION ALL accumulation (multi-import shape)."""
    c = read_table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = read_table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.unionByName(s).groupBy("nationkey").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )


@q(
    "set_intersect",
    """SELECT c_nationkey AS nationkey FROM customer
       INTERSECT
       SELECT s_nationkey AS nationkey FROM supplier""",
)
def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G2 INTERSECT (distinct semantics)."""
    c = read_table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = read_table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.intersect(s)


@q(
    "set_except",
    """SELECT c_custkey AS custkey FROM customer
       EXCEPT
       SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 150000""",
)
def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G2 EXCEPT (distinct set-difference semantics → `subtract`)."""
    c = read_table(spark, sf_dir, "customer").select(F.col("c_custkey").alias("custkey"))
    o = (
        read_table(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > 150000)
        .select(F.col("o_custkey").alias("custkey"))
    )
    return c.subtract(o)


# =====================================================================
# E. Window functions
# =====================================================================

@q(
    "win_rank",
    """SELECT c_custkey, c_nationkey, rnk FROM (
         SELECT c_custkey, c_nationkey,
                CAST(ROW_NUMBER() OVER (PARTITION BY c_nationkey
                     ORDER BY c_acctbal DESC, c_custkey) AS BIGINT) AS rnk
         FROM customer) WHERE rnk <= 3""",
)
def win_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E1/E4 ranking + top-k per group (deterministic tie-break)."""
    c = read_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy(F.col("c_acctbal").desc(), F.col("c_custkey"))
    return (
        c.withColumn("rnk", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rnk") <= 3)
        .select("c_custkey", "c_nationkey", "rnk")
    )


@q(
    "win_lag",
    """SELECT o_custkey, o_orderkey,
              CAST(LAG(o_orderkey) OVER (PARTITION BY o_custkey
                   ORDER BY o_orderdate, o_orderkey) AS BIGINT) AS prev_orderkey
       FROM orders WHERE o_custkey < 100""",
)
def win_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E2 analytic lag: previous order per customer."""
    o = read_table(spark, sf_dir, "orders").filter(F.col("o_custkey") < 100)
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.lag("o_orderkey").over(w).cast("bigint").alias("prev_orderkey"),
    )


@q(
    "win_running",
    """SELECT o_custkey, o_orderkey,
              CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
                   OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
                  AS running_total
       FROM orders WHERE o_custkey < 100""",
)
def win_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E3 frame aggregate: running total per customer (exact decimal interior)."""
    o = read_table(spark, sf_dir, "orders").filter(F.col("o_custkey") < 100)
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.sum(dec("o_totalprice", 2)).over(w).cast("double").alias("running_total"),
    )


@q(
    "win_topk",
    """SELECT event_type, user_id, n_events FROM (
         SELECT event_type, user_id, CAST(COUNT(*) AS BIGINT) AS n_events,
                ROW_NUMBER() OVER (PARTITION BY event_type
                     ORDER BY COUNT(*) DESC, user_id) AS rn
         FROM events GROUP BY event_type, user_id) WHERE rn <= 5""",
)
def win_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E4 top-k per group: most active users per event type."""
    ev = read_table(spark, sf_dir, "events")
    agg = ev.groupBy("event_type", "user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events")
    )
    w = Window.partitionBy("event_type").orderBy(F.col("n_events").desc(), F.col("user_id"))
    return (
        agg.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 5)
        .select("event_type", "user_id", "n_events")
    )


@q(
    "paginate_window",
    """SELECT c_custkey, c_name FROM (
         SELECT c_custkey, c_name,
                ROW_NUMBER() OVER (ORDER BY c_name, c_custkey) AS rn
         FROM customer) WHERE rn > 20 AND rn <= 40""",
)
def paginate_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A8 REST Range-header paging: ordered offset/limit page 2.

    SCALE NOTE: offset paging needs a global row_number — an Exchange
    SinglePartition through one task. Kept only as the offset-compat shape
    for small results (tools/audit_plans.py whitelists exactly this key);
    the scale path is `paginate_seek` below.
    """
    c = read_table(spark, sf_dir, "customer")
    # pmod(key,1)≡0 partition key: still one task (documented above), but
    # the non-foldable constant keeps the partitionSpec non-empty (a bare
    # literal is folded out) so WindowExec stops spamming "No Partition
    # Defined" over every bench/driver log tail
    w = Window.partitionBy(F.pmod(F.col("c_custkey"), F.lit(1))).orderBy("c_name", "c_custkey")
    return (
        c.withColumn("rn", F.row_number().over(w))
        .filter((F.col("rn") > 20) & (F.col("rn") <= 40))
        .select("c_custkey", "c_name")
    )


_SEEK_NAME, _SEEK_KEY = "Customer#000000020", 20


@q(
    "paginate_seek",
    f"""SELECT c_custkey, c_name FROM customer
        WHERE c_name > '{_SEEK_NAME}'
           OR (c_name = '{_SEEK_NAME}' AND c_custkey > {_SEEK_KEY})
        ORDER BY c_name, c_custkey LIMIT 20""",
)
def paginate_seek(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A8 at scale: keyset (seek) pagination.

    The client passes the last (c_name, c_custkey) tuple of the previous
    page as a cursor; the next page is WHERE (name,key) > cursor ORDER BY
    name,key LIMIT n. The tuple predicate pushes down to the parquet scan
    (min/max row-group pruning on a sorted warehouse layout) and the plan
    is TakeOrderedAndProject — per-partition top-n, then a tiny driver
    merge. No global window, no single-partition exchange: this shape is
    O(page) at any table size, which offset paging is not.
    """
    c = read_table(spark, sf_dir, "customer")
    after = (F.col("c_name") > _SEEK_NAME) | (
        (F.col("c_name") == _SEEK_NAME) & (F.col("c_custkey") > _SEEK_KEY)
    )
    return (
        c.filter(after)
        .orderBy("c_name", "c_custkey")
        .limit(20)
        .select("c_custkey", "c_name")
    )


# =====================================================================
# C1. The binned interval join (genomic-shaped data synthesized from
#     driver tables so the DuckDB oracle can theta-join-check it)
# =====================================================================

def _points_intervals(spark: SparkSession, sf_dir: str):
    """points from part, coverage-style intervals from supplier."""
    p = read_table(spark, sf_dir, "part").select(
        (F.col("p_partkey") % 5).cast("string").alias("chromosome"),
        (F.col("p_partkey") * 31 + 1).cast("long").alias("position"),
        F.col("p_partkey"),
    )
    s = read_table(spark, sf_dir, "supplier").select(
        (F.col("s_suppkey") % 5).cast("string").alias("chromosome"),
        (F.col("s_suppkey") * 97 + 1).cast("long").alias("begin"),
        F.col("s_suppkey").alias("sample_key"),
    ).withColumn("end", F.col("begin") + 200 + (F.col("sample_key") % 7) * 500)
    return p, s


@q(
    "join_interval",
    """WITH pts AS (
         SELECT CAST(p_partkey % 5 AS VARCHAR) AS chromosome,
                CAST(p_partkey * 31 + 1 AS BIGINT) AS position,
                p_partkey
         FROM part),
       ivs AS (
         SELECT CAST(s_suppkey % 5 AS VARCHAR) AS chromosome,
                CAST(s_suppkey * 97 + 1 AS BIGINT) AS begin,
                CAST(s_suppkey * 97 + 1 + 200 + (s_suppkey % 7) * 500 AS BIGINT) AS "end",
                s_suppkey AS sample_key
         FROM supplier)
       SELECT p.chromosome, CAST(COUNT(*) AS BIGINT) AS n_pairs,
              CAST(COUNT(DISTINCT p.p_partkey) AS BIGINT) AS n_points_covered
       FROM pts p JOIN ivs i
         ON p.chromosome = i.chromosome
        AND p.position >= i.begin AND p.position <= i."end"
       GROUP BY p.chromosome""",
)
def join_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C1 point-in-interval join via the UCSC binning equi-join rewrite.

    The oracle is the naive theta join; the Spark side runs the binned
    rewrite (operators/interval.py) — equal results prove the rewrite.
    """
    from varda_spark.operators.interval import interval_join

    p, s = _points_intervals(spark, sf_dir)
    joined = interval_join(p, s, strategy="binned")  # the rewrite under proof
    return joined.groupBy("chromosome").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
        F.countDistinct("p_partkey").cast("bigint").alias("n_points_covered"),
    )


# =====================================================================
# H. Scalar functions
# =====================================================================

@q(
    "str_normalize",
    """SELECT n_nationkey, CASE
           WHEN upper(regexp_replace(raw, '^(?i)chr', '')) IN ('M', 'MT') THEN 'MT'
           ELSE regexp_replace(raw, '^(?i)chr', '') END AS chromosome
       FROM (SELECT n_nationkey, CASE
               WHEN n_nationkey % 7 = 0 THEN 'chrM'
               WHEN n_nationkey % 5 = 0 THEN 'M'
               ELSE 'chr' || CAST(n_nationkey AS VARCHAR) END AS raw
             FROM nation)""",
)
def str_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H1 normalize_chromosome: strip chr prefix, canonicalize M→MT."""
    from varda_spark.functions.variant import normalize_chromosome

    n = read_table(spark, sf_dir, "nation")
    raw = (
        F.when(F.col("n_nationkey") % 7 == 0, F.lit("chrM"))
        .when(F.col("n_nationkey") % 5 == 0, F.lit("M"))
        .otherwise(F.concat(F.lit("chr"), F.col("n_nationkey").cast("string")))
    )
    return n.select("n_nationkey", normalize_chromosome(raw))


@q(
    "str_trim_alleles",
    """SELECT p_partkey,
              CAST(p_partkey + 4 AS BIGINT) AS position,
              CASE kind WHEN 0 THEN 'A' ELSE '' END AS reference,
              CASE kind WHEN 0 THEN 'G' ELSE 'CA' END AS observed
       FROM part, (SELECT unnest(range(2)) AS kind)""",
)
def str_trim_alleles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H2 normalize_variant: suffix-then-prefix allele trimming.

    Alleles are constructed from an md5-hex prefix (lowercase, so it can
    never collide with the uppercase allele letters): the generic trimming
    algorithm must therefore produce a result the oracle knows in closed
    form — kind 0: SNV {prefix}AT>{prefix}GT → pos+4 A>G; kind 1: pure
    insertion {prefix}T>{prefix}CAT → pos+4 ''>'CA'. Edge cases beyond
    this get golden pytest coverage (tests/test_variant.py).
    """
    from varda_spark.functions.variant import normalize_variant_cols

    p = read_table(spark, sf_dir, "part").select("p_partkey")
    pref = F.substring(F.md5(F.col("p_partkey").cast("string").cast("binary")), 1, 4)
    rows = p.select(
        "p_partkey",
        F.col("p_partkey").cast("long").alias("position"),
        F.concat(pref, F.lit("AT")).alias("reference"),
        F.concat(pref, F.lit("GT")).alias("observed"),
        F.lit(0).alias("kind"),
    ).unionByName(
        p.select(
            "p_partkey",
            F.col("p_partkey").cast("long").alias("position"),
            F.concat(pref, F.lit("T")).alias("reference"),
            F.concat(pref, F.lit("CAT")).alias("observed"),
            F.lit(1).alias("kind"),
        )
    )
    return normalize_variant_cols(rows).select("p_partkey", "position", "reference", "observed")


@q(
    "str_digest",
    """SELECT c_custkey, md5(c_name) AS name_md5 FROM customer""",
)
def str_digest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H3 content digest (engine also has sha1; DuckDB 1.0 lacks it →
    oracle uses md5, same dedup-guard semantics)."""
    from varda_spark.functions.scalar import md5_digest

    c = read_table(spark, sf_dir, "customer")
    return c.select("c_custkey", md5_digest("c_name").alias("name_md5"))


@q(
    "date_trunc",
    """SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
              CAST(COUNT(*) AS BIGINT) AS n_events
       FROM events GROUP BY 1""",
)
def date_trunc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H4 date/time truncation (DATE output — identical py objects both engines)."""
    ev = read_table(spark, sf_dir, "events")
    return ev.groupBy(F.to_date(F.date_trunc("day", F.col("ts"))).alias("day")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events")
    )


@q(
    "date_extract",
    """SELECT CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS yr,
              CAST(EXTRACT(month FROM o_orderdate) AS BIGINT) AS mo,
              CAST(COUNT(*) AS BIGINT) AS n_orders,
              {s} AS sum_price
       FROM orders GROUP BY 1, 2""".format(s=osum("o_totalprice", 2)),
)
def date_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H4 date part extraction + per-month rollup."""
    o = read_table(spark, sf_dir, "orders")
    return o.groupBy(
        F.year("o_orderdate").cast("bigint").alias("yr"),
        F.month("o_orderdate").cast("bigint").alias("mo"),
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_orders"),
        dsum("o_totalprice", 2).alias("sum_price"),
    )


@q(
    "math_round",
    """SELECT c_custkey,
              round(c_acctbal, 1) AS bal_round,
              floor(c_acctbal) AS bal_floor,
              ceil(c_acctbal) AS bal_ceil,
              abs(c_acctbal) AS bal_abs
       FROM customer""",
)
def math_round(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H5 math: round/floor/ceil/abs (both engines round half away from 0)."""
    c = read_table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.round("c_acctbal", 1).alias("bal_round"),
        F.floor("c_acctbal").cast("double").alias("bal_floor"),
        F.ceil("c_acctbal").cast("double").alias("bal_ceil"),
        F.abs("c_acctbal").alias("bal_abs"),
    )


@q(
    "arr_explode",
    """SELECT tok, CAST(COUNT(*) AS BIGINT) AS n
       FROM (SELECT unnest(string_split(text, ' ')) AS tok FROM documents)
       GROUP BY tok HAVING COUNT(*) >= 20""",
)
def arr_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H6 array explode (the VCF per-ALT decomposition shape): token counts."""
    d = read_table(spark, sf_dir, "documents")
    return (
        d.select(F.explode(F.split(F.col("text"), " ")).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
        .filter(F.col("n") >= 20)
    )


@q(
    "arr_transform",
    """SELECT vec_id,
              CAST(list_sum(list_transform(embedding,
                   x -> CAST(floor(CAST(x AS DOUBLE) * 10000) AS BIGINT))) AS BIGINT) AS qsum,
              CAST(len(embedding) AS BIGINT) AS dim
       FROM embeddings""",
)
def arr_transform(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H6 array transform/aggregate: quantized element sum (exact ints)."""
    e = read_table(spark, sf_dir, "embeddings")
    return e.select(
        "vec_id",
        F.expr(
            "aggregate(transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 10000) AS BIGINT)), "
            "CAST(0 AS BIGINT), (acc, v) -> acc + v)"
        ).alias("qsum"),
        F.size("embedding").cast("bigint").alias("dim"),
    )


@q(
    "json_extract",
    """SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
              CAST(COUNT(*) AS BIGINT) AS n
       FROM events GROUP BY 1""",
)
def json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H7 JSON field extraction from events.props."""
    from varda_spark.functions.scalar import json_int

    ev = read_table(spark, sf_dir, "events")
    return ev.groupBy(json_int("props", "$.k").alias("k")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )


@q(
    "str_funcs",
    """SELECT c_custkey,
              lower(c_name) AS name_lower,
              concat(c_mktsegment, '|', CAST(c_nationkey AS VARCHAR)) AS seg_nation,
              substring(c_name, 1, 8) AS name_prefix,
              CAST(length(c_name) AS BIGINT) AS name_len
       FROM customer WHERE c_name LIKE 'Customer%'""",
)
def str_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H8 general string ops: lower/concat/substring/length/LIKE."""
    c = read_table(spark, sf_dir, "customer")
    return c.filter(F.col("c_name").like("Customer%")).select(
        "c_custkey",
        F.lower("c_name").alias("name_lower"),
        F.concat_ws("|", F.col("c_mktsegment"), F.col("c_nationkey").cast("string")).alias(
            "seg_nation"
        ),
        F.substring("c_name", 1, 8).alias("name_prefix"),
        F.length("c_name").cast("bigint").alias("name_len"),
    )


# =====================================================================
# I. Streaming (batch cores — oracle-checkable; wrappers in streaming/)
# =====================================================================

@q(
    "stream_tumbling",
    """SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS win_start,
              event_type,
              CAST(COUNT(*) AS BIGINT) AS n_events,
              {s} AS sum_value
       FROM events GROUP BY 1, 2""".format(s=osum("value", 4)),
)
def stream_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """I1 tumbling 1h window (batch core of the streaming operator)."""
    from varda_spark.streaming.windows import tumbling_counts

    return tumbling_counts(read_table(spark, sf_dir, "events"))


@q(
    "stream_sliding",
    """SELECT CAST(epoch(date_trunc('epoch', ts)) AS BIGINT) / 0 AS never -- replaced below
    """,
)
def stream_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """I2 sliding 1h window every 15min."""
    from varda_spark.streaming.windows import sliding_counts

    return sliding_counts(read_table(spark, sf_dir, "events"))


# real oracle for stream_sliding: each event belongs to 4 slide windows
REGISTRY["stream_sliding"].sql = """
    WITH slides AS (
      SELECT event_type,
             CAST(floor(epoch(ts) / 900) * 900 - k.range * 900 AS BIGINT) AS win_start
      FROM events, range(4) k)
    SELECT win_start, event_type, CAST(COUNT(*) AS BIGINT) AS n_events
    FROM slides GROUP BY 1, 2"""


@q(
    "stream_session",
    """WITH marked AS (
         SELECT user_id, epoch_us(ts) AS t, value,
                CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
                       OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > 30*60*1000000
                     THEN 1 ELSE 0 END AS new_s
         FROM events
         WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
       sessions AS (
         SELECT user_id, t, value,
                SUM(new_s) OVER (PARTITION BY user_id ORDER BY t
                                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_seq
         FROM marked)
       SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq,
              MIN(t) AS session_start_us, MAX(t) AS session_end_us,
              CAST(COUNT(*) AS BIGINT) AS n_events,
              {s} AS sum_value
       FROM sessions GROUP BY user_id, session_seq""".format(s=osum("value", 4)),
)
def stream_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    """I3 session windows (30-min gap), batch gaps-and-islands core."""
    from varda_spark.streaming.windows import session_windows_batch

    return session_windows_batch(read_table(spark, sf_dir, "events"))


# =====================================================================
# K. LLM-pipeline operators (documents / embeddings)
# =====================================================================

@q(
    "dedup_exact",
    """WITH hashed AS (
         SELECT doc_id, md5(lower(trim(text))) AS h,
                ROW_NUMBER() OVER (PARTITION BY md5(lower(trim(text)))
                                   ORDER BY doc_id) AS rn
         FROM documents)
       SELECT doc_id FROM hashed WHERE rn = 1""",
)
def dedup_exact_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K1/A7 exact dedup: deterministic keep-lowest-key survivor set."""
    from varda_spark.operators.dedup import dedup_exact

    d = read_table(spark, sf_dir, "documents")
    return dedup_exact(d).select("doc_id")


@q(
    "dedup_minhash",
    """WITH words AS (
         SELECT doc_id, string_split(text, ' ') AS w FROM documents),
       sh AS (
         SELECT doc_id,
                unnest(list_transform(range(1, greatest(len(w) - 1, 1)),
                       i -> w[i] || ' ' || w[i + 1] || ' ' || w[i + 2])) AS shingle
         FROM words),
       sigs AS (
         SELECT doc_id,
                MIN(md5('0|' || shingle)) AS sig_0, MIN(md5('1|' || shingle)) AS sig_1,
                MIN(md5('2|' || shingle)) AS sig_2, MIN(md5('3|' || shingle)) AS sig_3,
                MIN(md5('4|' || shingle)) AS sig_4, MIN(md5('5|' || shingle)) AS sig_5,
                MIN(md5('6|' || shingle)) AS sig_6, MIN(md5('7|' || shingle)) AS sig_7
         FROM sh GROUP BY doc_id),
       banded AS (
         SELECT doc_id, band FROM (
           SELECT doc_id,
                  ['0|' || sig_0 || '|' || sig_1, '1|' || sig_2 || '|' || sig_3,
                   '2|' || sig_4 || '|' || sig_5, '3|' || sig_6 || '|' || sig_7] AS bands
           FROM sigs), UNNEST(bands) AS u(band))
       SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
       FROM banded a JOIN banded b ON a.band = b.band AND a.doc_id < b.doc_id""",
)
def dedup_minhash_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K2 MinHash LSH candidate pairs (8 hashes, 4 bands × 2 rows).

    Pure-DF minhash (md5-based, engine-portable) — NOT ml.feature.MinHashLSH
    — precisely so the oracle can recompute it.
    """
    from varda_spark.operators.dedup import minhash_candidates

    d = read_table(spark, sf_dir, "documents")
    return minhash_candidates(d, num_hashes=8, bands=4, shingle_n=3)


@q(
    "sim_topk",
    """WITH q AS (
         SELECT vec_id, label,
                list_transform(embedding,
                    x -> CAST(floor(CAST(x AS DOUBLE) * 10000) AS BIGINT)) AS e
         FROM embeddings),
       pairs AS (
         SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
                (SELECT SUM(a.e[i.range] * b.e[i.range])
                 FROM range(1, 65) i) AS dot_q
         FROM q a JOIN q b ON a.label = b.label AND a.vec_id <> b.vec_id),
       ranked AS (
         SELECT query_id, neighbor_id, CAST(dot_q AS BIGINT) AS dot_q,
                CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                     ORDER BY dot_q DESC, neighbor_id) AS BIGINT) AS rank
         FROM pairs)
       SELECT query_id, neighbor_id, dot_q, rank FROM ranked WHERE rank <= 3""",
)
def sim_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K3 top-k similarity search, label-blocked (IVF-style scale path).

    Integer-quantized dot ranking → exact across engines (float cosine API
    is operators/similarity.cosine_topk, pytest-compared to this ranking).
    Runs the blocked-matmul applyInPandas path (9× the pair-join plan;
    bit-identical — see similarity.quantized_topk for the DF reference).
    """
    from varda_spark.operators.similarity import quantized_topk_fast

    e = read_table(spark, sf_dir, "embeddings")
    return quantized_topk_fast(e, k=3)


@q(
    "text_tokens",
    """SELECT doc_id,
              CAST(len(string_split(trim(text), ' ')) AS BIGINT) AS n_tokens,
              CAST(length(text) AS BIGINT) AS n_chars_m,
              CAST(len(list_distinct(string_split(trim(text), ' '))) AS BIGINT) AS n_distinct_tokens
       FROM documents""",
)
def text_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K4 token counting per document."""
    from varda_spark.operators.text import with_token_stats

    d = read_table(spark, sf_dir, "documents")
    return with_token_stats(d).select("doc_id", "n_tokens", "n_chars_m", "n_distinct_tokens")


@q(
    "text_ngrams",
    """WITH words AS (SELECT doc_id, string_split(trim(text), ' ') AS w FROM documents),
       grams AS (
         SELECT unnest(list_transform(range(1, greatest(len(w), 1)),
                       i -> w[i] || ' ' || w[i + 1])) AS ngram
         FROM words)
       SELECT ngram, CAST(COUNT(*) AS BIGINT) AS n
       FROM grams GROUP BY ngram HAVING COUNT(*) >= 5""",
)
def text_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K4 word bigrams with counts."""
    from varda_spark.operators.text import ngrams

    d = read_table(spark, sf_dir, "documents")
    return (
        ngrams(d.select("doc_id", "text"), n=2)
        .groupBy("ngram")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
        .filter(F.col("n") >= 5)
    )


@q(
    "text_stats",
    """SELECT lang,
              CAST(COUNT(*) AS BIGINT) AS n_docs,
              CAST(SUM(len(string_split(trim(text), ' '))) AS BIGINT) AS total_tokens,
              CAST(SUM(length(text)) AS BIGINT) AS total_chars
       FROM documents GROUP BY lang""",
)
def text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K4 corpus statistics per language."""
    from varda_spark.operators.text import tokens

    d = read_table(spark, sf_dir, "documents")
    return d.groupBy("lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum(F.size(tokens("text"))).cast("bigint").alias("total_tokens"),
        F.sum(F.length("text")).cast("bigint").alias("total_chars"),
    )


@q(
    "text_quality",
    """WITH t AS (
         SELECT doc_id, string_split(trim(text), ' ') AS w FROM documents),
       scored AS (
         SELECT doc_id, len(w) AS n,
                CAST(floor(len(list_distinct(w)) * 100 / greatest(len(w), 1)) AS BIGINT)
                    AS distinct_ratio_pct
         FROM t)
       SELECT doc_id,
              CAST(100
                - (CASE WHEN n < 5 THEN 40 WHEN n < 20 THEN 10 ELSE 0 END)
                - (CASE WHEN distinct_ratio_pct < 30 THEN 30
                        WHEN distinct_ratio_pct < 60 THEN 10 ELSE 0 END)
                AS BIGINT) AS quality,
              distinct_ratio_pct
       FROM scored""",
)
def text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K4 quality scoring: integer 0..100 heuristic (oracle-exact)."""
    from varda_spark.operators.text import quality_score

    d = read_table(spark, sf_dir, "documents")
    return quality_score(d).select("doc_id", "quality", "distinct_ratio_pct")


@q(
    "text_fingerprint",
    """SELECT doc_id,
              md5(lower(array_to_string(string_split(trim(text), ' '), ' '))) AS fp
       FROM documents""",
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K4/A7 document fingerprint (content address of token stream)."""
    from varda_spark.operators.text import fingerprint

    d = read_table(spark, sf_dir, "documents")
    return fingerprint(d).select("doc_id", "fp")


# =====================================================================
# The varda core as a driver-checked query: full frequency pipeline on
# synthesized genomic-shaped tables (samples/regions/observations from
# supplier/lineitem so the oracle can rebuild everything in SQL)
# =====================================================================

def _genomic_trio(spark: SparkSession, sf_dir: str):
    sup = read_table(spark, sf_dir, "supplier")
    li = read_table(spark, sf_dir, "lineitem")
    samples = sup.select(
        F.col("s_suppkey").alias("sample_id"),
        F.concat(F.lit("s"), F.col("s_suppkey").cast("string")).alias("name"),
        F.when(F.col("s_suppkey") % 10 == 0, F.lit(10)).otherwise(F.lit(1)).alias("pool_size"),
        (F.col("s_suppkey") % 3 != 0).alias("coverage_profile"),
        (F.col("s_suppkey") % 2 == 0).alias("public"),
        (F.col("s_suppkey") % 11 != 0).alias("active"),
    )
    regions = sup.select(
        F.col("s_suppkey").alias("sample_id"),
        (F.col("s_suppkey") % 5).cast("string").alias("chromosome"),
        (F.col("s_suppkey") * 97 + 1).cast("long").alias("begin"),
    ).withColumn("end", F.col("begin") + 200 + (F.col("sample_id") % 7) * 500)
    observations = li.select(
        F.col("l_suppkey").alias("sample_id"),
        (F.col("l_partkey") % 5).cast("string").alias("chromosome"),
        (F.col("l_partkey") * 31 + 1).cast("long").alias("position"),
        F.lit("A").alias("reference"),
        F.lit("G").alias("observed"),
        F.when(F.col("l_linenumber") % 3 == 0, F.lit("homozygous"))
        .when(F.col("l_linenumber") % 3 == 1, F.lit("heterozygous"))
        .otherwise(F.lit(None).cast("string"))
        .alias("zygosity"),
        (1 + F.col("l_linenumber") % 2).cast("int").alias("support"),
    )
    return samples, regions, observations


_FREQ_ORACLE = """
WITH samples AS (
  SELECT s_suppkey AS sample_id,
         CASE WHEN s_suppkey % 10 = 0 THEN 10 ELSE 1 END AS pool_size,
         s_suppkey % 3 <> 0 AS coverage_profile,
         s_suppkey % 11 <> 0 AS active
  FROM supplier),
regions AS (
  SELECT s_suppkey AS sample_id,
         CAST(s_suppkey % 5 AS VARCHAR) AS chromosome,
         CAST(s_suppkey * 97 + 1 AS BIGINT) AS begin,
         CAST(s_suppkey * 97 + 1 + 200 + (s_suppkey % 7) * 500 AS BIGINT) AS "end"
  FROM supplier),
obs AS (
  SELECT l_suppkey AS sample_id,
         CAST(l_partkey % 5 AS VARCHAR) AS chromosome,
         CAST(l_partkey * 31 + 1 AS BIGINT) AS position,
         'A' AS reference, 'G' AS observed,
         CASE WHEN l_linenumber % 3 = 0 THEN 'homozygous'
              WHEN l_linenumber % 3 = 1 THEN 'heterozygous' END AS zygosity,
         1 + l_linenumber % 2 AS support
  FROM lineitem),
sel AS (SELECT * FROM samples WHERE active),
keys AS (SELECT DISTINCT chromosome, position, reference, observed FROM obs),
num AS (
  SELECT chromosome, position, reference, observed,
         CAST(SUM(support) AS BIGINT) AS vc
  FROM obs JOIN sel USING (sample_id)
  GROUP BY 1, 2, 3, 4),
cov_samples AS (
  SELECT DISTINCT k.chromosome, k.position, r.sample_id
  FROM (SELECT DISTINCT chromosome, position FROM keys) k
  JOIN regions r ON r.chromosome = k.chromosome
                AND k.position >= r.begin AND k.position <= r."end"
  JOIN sel s ON s.sample_id = r.sample_id AND s.coverage_profile),
covered AS (
  SELECT c.chromosome, c.position, CAST(SUM(s.pool_size) AS BIGINT) AS vn_covered
  FROM cov_samples c JOIN sel s USING (sample_id)
  GROUP BY 1, 2),
uncond AS (
  SELECT CAST(COALESCE(SUM(pool_size), 0) AS BIGINT) AS vn_uncond
  FROM sel WHERE NOT coverage_profile)
SELECT k.chromosome, k.position, k.reference, k.observed,
       CAST(COALESCE(c.vn_covered, 0) + u.vn_uncond AS BIGINT) AS vn,
       CAST(COALESCE(n.vc, 0) AS BIGINT) AS vc,
       CASE WHEN COALESCE(c.vn_covered, 0) + u.vn_uncond > 0
            THEN CAST(COALESCE(n.vc, 0) AS DOUBLE)
                 / CAST(COALESCE(c.vn_covered, 0) + u.vn_uncond AS DOUBLE)
            ELSE 0.0 END AS vf
FROM keys k
LEFT JOIN num n USING (chromosome, position, reference, observed)
LEFT JOIN covered c ON c.chromosome = k.chromosome AND c.position = k.position
CROSS JOIN uncond u
"""


@q("freq_variant", _FREQ_ORACLE)
def freq_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """THE reference core (SURVEY.md §3): variant frequency VN/VC/VF via
    binned interval join + broadcast dims + left-join completeness,
    end-to-end, oracle-checked against a full SQL rebuild."""
    from varda_spark.frequency import frequency

    samples, regions, observations = _genomic_trio(spark, sf_dir)
    out = frequency(None, observations, regions, samples)
    return out.select(
        "chromosome",
        "position",
        "reference",
        "observed",
        F.col("vn").cast("bigint").alias("vn"),
        F.col("vc").cast("bigint").alias("vc"),
        F.col("vf").cast("double").alias("vf"),
    )


_FREQ_SEL_ORACLE = _FREQ_ORACLE.replace(
    "         s_suppkey % 11 <> 0 AS active",
    "         s_suppkey % 2 = 0 AS public,\n         s_suppkey % 11 <> 0 AS active",
).replace(
    "sel AS (SELECT * FROM samples WHERE active)",
    "sel AS (SELECT * FROM samples WHERE active AND public)",
)


@q("freq_selected", _FREQ_SEL_ORACLE)
def freq_selected(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The varda core under a sample-selection expression: the B3 boolean
    DSL ('public') compiles to a Column that restricts the sample dimension
    BEFORE anything heavy runs — numerator, covered pool, and unconditional
    pool all shrink together, exactly like varda's named annotation
    queries. Same single plan as freq_variant."""
    from varda_spark.expressions import compile_selection
    from varda_spark.frequency import frequency

    samples, regions, observations = _genomic_trio(spark, sf_dir)
    out = frequency(None, observations, regions, samples, selection=compile_selection("public"))
    return out.select(
        "chromosome",
        "position",
        "reference",
        "observed",
        F.col("vn").cast("bigint").alias("vn"),
        F.col("vc").cast("bigint").alias("vc"),
        F.col("vf").cast("double").alias("vf"),
    )


_FREQ_KEYS_ORACLE = _FREQ_ORACLE.replace(
    "keys AS (SELECT DISTINCT chromosome, position, reference, observed FROM obs),",
    "keys AS (SELECT DISTINCT chromosome, position, reference, observed FROM obs\n"
    "         WHERE position % 3 = 0),",
)


@q("freq_keys", _FREQ_KEYS_ORACLE)
def freq_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The annotate-a-VCF path: frequency() with an explicit variant_keys
    set (every 3rd position stands in for an uploaded VCF's keys). This
    exercises the OTHER branch of frequency(): the numerator left-semi-joins
    observations against the requested keys BEFORE aggregating — at 100 TB
    the semi-join prunes the fact scan down to the queried loci, and
    left-join completeness still yields a row per requested key."""
    from varda_spark.frequency import frequency

    samples, regions, observations = _genomic_trio(spark, sf_dir)
    keys = (
        observations.select("chromosome", "position", "reference", "observed")
        .filter(F.col("position") % 3 == 0)
        .distinct()
    )
    out = frequency(keys, observations, regions, samples)
    return out.select(
        "chromosome",
        "position",
        "reference",
        "observed",
        F.col("vn").cast("bigint").alias("vn"),
        F.col("vc").cast("bigint").alias("vc"),
        F.col("vf").cast("double").alias("vf"),
    )


_FREQ_ANNOTATE_ORACLE = """
WITH samples AS (
  SELECT s_suppkey AS sample_id,
         CASE WHEN s_suppkey % 10 = 0 THEN 10 ELSE 1 END AS pool_size,
         s_suppkey % 3 <> 0 AS coverage_profile,
         s_suppkey % 2 = 0 AS public,
         s_suppkey % 11 <> 0 AS active
  FROM supplier),
regions AS (
  SELECT s_suppkey AS sample_id,
         CAST(s_suppkey % 5 AS VARCHAR) AS chromosome,
         CAST(s_suppkey * 97 + 1 AS BIGINT) AS begin,
         CAST(s_suppkey * 97 + 1 + 200 + (s_suppkey % 7) * 500 AS BIGINT) AS "end"
  FROM supplier),
obs AS (
  SELECT l_suppkey AS sample_id,
         CAST(l_partkey % 5 AS VARCHAR) AS chromosome,
         CAST(l_partkey * 31 + 1 AS BIGINT) AS position,
         'A' AS reference, 'G' AS observed,
         1 + l_linenumber % 2 AS support
  FROM lineitem),
keys AS (SELECT DISTINCT chromosome, position, reference, observed FROM obs
         WHERE position % 3 = 0),
kpos AS (SELECT DISTINCT chromosome, position FROM keys),
sel_pub AS (SELECT * FROM samples WHERE active AND public),
sel_priv AS (SELECT * FROM samples WHERE active AND NOT public),
num_pub AS (
  SELECT chromosome, position, reference, observed, CAST(SUM(support) AS BIGINT) AS vc
  FROM obs JOIN sel_pub USING (sample_id) GROUP BY 1, 2, 3, 4),
num_priv AS (
  SELECT chromosome, position, reference, observed, CAST(SUM(support) AS BIGINT) AS vc
  FROM obs JOIN sel_priv USING (sample_id) GROUP BY 1, 2, 3, 4),
cov_pub AS (
  SELECT c.chromosome, c.position, CAST(SUM(s.pool_size) AS BIGINT) AS vn_covered
  FROM (SELECT DISTINCT k.chromosome, k.position, r.sample_id
        FROM kpos k JOIN regions r ON r.chromosome = k.chromosome
             AND k.position >= r.begin AND k.position <= r."end"
        JOIN sel_pub s ON s.sample_id = r.sample_id AND s.coverage_profile) c
  JOIN sel_pub s USING (sample_id) GROUP BY 1, 2),
cov_priv AS (
  SELECT c.chromosome, c.position, CAST(SUM(s.pool_size) AS BIGINT) AS vn_covered
  FROM (SELECT DISTINCT k.chromosome, k.position, r.sample_id
        FROM kpos k JOIN regions r ON r.chromosome = k.chromosome
             AND k.position >= r.begin AND k.position <= r."end"
        JOIN sel_priv s ON s.sample_id = r.sample_id AND s.coverage_profile) c
  JOIN sel_priv s USING (sample_id) GROUP BY 1, 2),
un_pub AS (SELECT CAST(COALESCE(SUM(pool_size), 0) AS BIGINT) AS vn_uncond
           FROM sel_pub WHERE NOT coverage_profile),
un_priv AS (SELECT CAST(COALESCE(SUM(pool_size), 0) AS BIGINT) AS vn_uncond
            FROM sel_priv WHERE NOT coverage_profile)
SELECT k.chromosome, k.position, k.reference, k.observed,
       CAST(COALESCE(cp.vn_covered, 0) + up.vn_uncond AS BIGINT) AS pub_vn,
       CASE WHEN COALESCE(cp.vn_covered, 0) + up.vn_uncond > 0
            THEN CAST(COALESCE(np.vc, 0) AS DOUBLE)
                 / CAST(COALESCE(cp.vn_covered, 0) + up.vn_uncond AS DOUBLE)
            ELSE 0.0 END AS pub_vf,
       CAST(COALESCE(cv.vn_covered, 0) + uv.vn_uncond AS BIGINT) AS priv_vn,
       CASE WHEN COALESCE(cv.vn_covered, 0) + uv.vn_uncond > 0
            THEN CAST(COALESCE(nv.vc, 0) AS DOUBLE)
                 / CAST(COALESCE(cv.vn_covered, 0) + uv.vn_uncond AS DOUBLE)
            ELSE 0.0 END AS priv_vf
FROM keys k
LEFT JOIN num_pub np USING (chromosome, position, reference, observed)
LEFT JOIN cov_pub cp ON cp.chromosome = k.chromosome AND cp.position = k.position
LEFT JOIN num_priv nv USING (chromosome, position, reference, observed)
LEFT JOIN cov_priv cv ON cv.chromosome = k.chromosome AND cv.position = k.position
CROSS JOIN un_pub up CROSS JOIN un_priv uv
"""


@q("freq_annotate", _FREQ_ANNOTATE_ORACLE)
def freq_annotate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's §3.2 annotation workflow as ONE driver key: a keys
    set (every 3rd position, standing in for an uploaded VCF) annotated
    with per-query VN/VF columns for TWO named selections ('public' and
    'not public') — the columnar equivalent of varda's {QUERY}_VN/VF INFO
    fields. Each query is one frequency() plan over the SAME pre-filtered
    dims; the keys semi-join prunes the fact scan to the queried loci."""
    from varda_spark.annotate import annotate_keys

    samples, regions, observations = _genomic_trio(spark, sf_dir)
    keys = (
        observations.select("chromosome", "position", "reference", "observed")
        .filter(F.col("position") % 3 == 0)
        .distinct()
    )
    ann = annotate_keys(
        keys, observations, regions, samples, {"pub": "public", "priv": "not public"}
    )
    return ann.select(
        "chromosome",
        "position",
        "reference",
        "observed",
        F.col("pub_vn").cast("bigint").alias("pub_vn"),
        F.col("pub_vf").cast("double").alias("pub_vf"),
        F.col("priv_vn").cast("bigint").alias("priv_vn"),
        F.col("priv_vf").cast("double").alias("priv_vf"),
    )


_FREQ_ZYG_ORACLE = _FREQ_ORACLE.replace(
    """         CAST(SUM(support) AS BIGINT) AS vc
  FROM obs JOIN sel USING (sample_id)""",
    """         CAST(SUM(support) AS BIGINT) AS vc,
         CAST(SUM(CASE WHEN zygosity = 'homozygous' THEN support ELSE 0 END) AS BIGINT) AS vc_hom,
         CAST(SUM(CASE WHEN zygosity = 'heterozygous' THEN support ELSE 0 END) AS BIGINT) AS vc_het
  FROM obs JOIN sel USING (sample_id)""",
).replace(
    """            ELSE 0.0 END AS vf
FROM keys k""",
    """            ELSE 0.0 END AS vf,
       CAST(COALESCE(n.vc_hom, 0) AS BIGINT) AS vc_hom,
       CAST(COALESCE(n.vc_het, 0) AS BIGINT) AS vc_het
FROM keys k""",
)


@q("freq_zygosity", _FREQ_ZYG_ORACLE)
def freq_zygosity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zygosity-split frequency (varda's frequency endpoint exposes
    vc_hom/vc_het alongside VN/VC/VF): same single plan as freq_variant,
    two more conditional sums in the numerator aggregate — free at scale
    (same shuffle, map-side partials). Keys with zero observations return
    0 for both splits (coalesced like vc)."""
    from varda_spark.frequency import frequency

    samples, regions, observations = _genomic_trio(spark, sf_dir)
    out = frequency(None, observations, regions, samples, split_zygosity=True)
    return out.select(
        "chromosome",
        "position",
        "reference",
        "observed",
        F.col("vn").cast("bigint").alias("vn"),
        F.col("vc").cast("bigint").alias("vc"),
        F.col("vf").cast("double").alias("vf"),
        F.col("vc_hom").cast("bigint").alias("vc_hom"),
        F.col("vc_het").cast("bigint").alias("vc_het"),
    )


# =====================================================================
# J. UDF surface
# =====================================================================

@q(
    "udf_pandas_scalar",
    """SELECT l_orderkey, l_linenumber,
              l_quantity * 2.0 + 1.0 AS score
       FROM lineitem WHERE l_orderkey < 1000""",
)
def udf_pandas_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J: Arrow-batched scalar pandas UDF (IEEE-deterministic poly)."""
    from varda_spark.functions.udfs import poly_score

    li = read_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 1000)
    return li.select("l_orderkey", "l_linenumber", poly_score("l_quantity").alias("score"))


@q(
    "udf_grouped_agg",
    """SELECT l_returnflag,
              CAST(SUM(CAST(floor(l_quantity * 100) AS BIGINT)) AS BIGINT) AS qsum
       FROM lineitem GROUP BY l_returnflag""",
)
def udf_grouped_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J: grouped-agg pandas UDF (exact integer arithmetic in pandas)."""
    from varda_spark.functions.udfs import quantized_sum

    li = read_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(quantized_sum("l_quantity").alias("qsum"))


@q("udf_grouped_map", None)  # float std is order-sensitive → rows-only
def udf_grouped_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J: applyInPandas grouped-map (per-segment z-score of acctbal)."""
    from varda_spark.functions.udfs import zscore_by_group

    c = read_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment", "c_acctbal")
    return zscore_by_group(c, "c_mktsegment", "c_acctbal")


# =====================================================================
# D4 approx + I5 stream dedup
# =====================================================================

@q("agg_approx_cd", None)  # HLL estimate is engine-specific → rows-only
def agg_approx_cd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D4 approx_count_distinct — the 100 TB substitute for exact
    countDistinct (single-pass HLL, no dedup shuffle)."""
    ev = read_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", rsd=0.02).alias("approx_users")
    )


@q("agg_approx_pct", None)  # t-digest/KLL estimate is engine-specific → rows-only
def agg_approx_pct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D: approx_percentile — the 100 TB percentile path agg_quantile's
    docstring advertises (bounded-memory sketch, single pass, map-side
    mergeable; exact sort-based percentile needs the whole group in one
    place). accuracy=10000 ≈ 0.01% rank error."""
    li = read_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.expr("approx_percentile(CAST(l_quantity AS DOUBLE), 0.5, 10000)").alias("med_qty"),
        F.expr(
            "approx_percentile(CAST(l_extendedprice AS DOUBLE), array(0.5, 0.9, 0.99), 10000)"
        ).alias("price_pcts"),
    )


@q(
    "stream_dedup",
    """SELECT user_id, event_type, CAST(COUNT(*) AS BIGINT) AS n_first_views
       FROM (
         SELECT user_id, event_type,
                ROW_NUMBER() OVER (PARTITION BY user_id, event_type,
                                   date_trunc('minute', ts)
                                   ORDER BY ts, event_id) AS rn
         FROM events)
       WHERE rn = 1 GROUP BY user_id, event_type""",
)
def stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """I5 batch core of dropDuplicatesWithinWatermark: first event per
    (user, type, minute); streaming twin in streaming/windows.py."""
    ev = read_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type", F.date_trunc("minute", "ts")).orderBy(
        "ts", "event_id"
    )
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .groupBy("user_id", "event_type")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_first_views"))
    )


# =====================================================================
# K5. Multimodal columns
# =====================================================================

@q(
    "multimodal_meta",
    """SELECT doc_id AS item_id,
              CASE WHEN doc_id % 3 = 0 THEN 'image/png'
                   WHEN doc_id % 3 = 1 THEN 'audio/wav'
                   ELSE 'video/mp4' END AS mime,
              md5(text) AS content_md5,
              CAST(length(text) AS BIGINT) AS n_bytes
       FROM documents""",
)
def multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K5: binary payload column + typed metadata, content-addressed.

    Payloads are synthesized (utf-8 bytes of text — container has no
    codecs); the schema/addressing pipeline is the real one.
    """
    from varda_spark.sources.multimodal import synthesize_blobs

    d = read_table(spark, sf_dir, "documents")
    return synthesize_blobs(d).select("item_id", "mime", "content_md5", "n_bytes")


@q("multimodal_features", None)  # mapInPandas stage → rows-only
def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K5: Arrow-batched mapInPandas decode stage (deterministic fake)."""
    from varda_spark.sources.multimodal import decode_image_features, synthesize_blobs

    d = read_table(spark, sf_dir, "documents")
    return decode_image_features(synthesize_blobs(d), fake=True)


# =====================================================================
# TPC-H classics — relational breadth + the bench-critical scale paths
# (multi-way joins, selective date filters, grouped decimal aggs)
# =====================================================================

@q(
    "tpch_q1",
    """SELECT l_returnflag, l_linestatus,
              CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
              CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_base_price,
              CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))
                       * CAST(1 - l_discount AS DECIMAL(18,4))) AS DOUBLE) AS sum_disc_price,
              CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))
                       * CAST(1 - l_discount AS DECIMAL(18,4))
                       * CAST(1 + l_tax AS DECIMAL(18,4))) AS DOUBLE) AS sum_charge,
              CAST(COUNT(*) AS BIGINT) AS count_order
       FROM lineitem
       WHERE l_shipdate <= DATE '1998-09-02'
       GROUP BY l_returnflag, l_linestatus""",
)
def tpch_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 pricing summary: the canonical full-scan grouped agg.

    Decimal interior math (exact, associative) → oracle-exact doubles.
    Scale: map-side partial agg into 6 groups — shuffle is ~bytes."""
    li = read_table(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
    d = lambda c: F.col(c).cast("decimal(18,4)") if isinstance(c, str) else c.cast("decimal(18,4)")
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum(d("l_quantity")).cast("double").alias("sum_qty"),
        F.sum(d("l_extendedprice")).cast("double").alias("sum_base_price"),
        F.sum(d("l_extendedprice") * d(F.lit(1) - F.col("l_discount"))).cast("double").alias("sum_disc_price"),
        F.sum(
            d("l_extendedprice") * d(F.lit(1) - F.col("l_discount")) * d(F.lit(1) + F.col("l_tax"))
        ).cast("double").alias("sum_charge"),
        F.count(F.lit(1)).cast("bigint").alias("count_order"),
    )


@q(
    "tpch_q3",
    """SELECT l_orderkey,
              CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))
                       * CAST(1 - l_discount AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
              o_orderdate
       FROM customer JOIN orders ON c_custkey = o_custkey
                     JOIN lineitem ON l_orderkey = o_orderkey
       WHERE c_mktsegment = 'BUILDING'
         AND o_orderdate < DATE '1997-03-15' AND l_shipdate > DATE '1997-03-15'
       GROUP BY l_orderkey, o_orderdate
       ORDER BY revenue DESC, o_orderdate, l_orderkey LIMIT 10""",
)
def tpch_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shipping priority: selective 3-way join + top-10.

    customer filter → broadcast into orders; date filters pushed to scans."""
    c = read_table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = read_table(spark, sf_dir, "orders").filter(F.col("o_orderdate") < F.lit("1997-03-15"))
    li = read_table(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > F.lit("1997-03-15"))
    dd = lambda c_: F.col(c_).cast("decimal(18,4)")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(
            F.sum(dd("l_extendedprice") * (F.lit(1) - F.col("l_discount")).cast("decimal(18,4)"))
            .cast("double").alias("revenue")
        )
        .select("l_orderkey", "revenue", "o_orderdate")
        .orderBy(F.col("revenue").desc(), "o_orderdate", "l_orderkey")
        .limit(10)
    )


@q(
    "tpch_q5",
    """SELECT n_name,
              CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))
                       * CAST(1 - l_discount AS DECIMAL(18,4))) AS DOUBLE) AS revenue
       FROM customer JOIN orders ON c_custkey = o_custkey
                     JOIN lineitem ON l_orderkey = o_orderkey
                     JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
                     JOIN nation ON s_nationkey = n_nationkey
                     JOIN region ON n_regionkey = r_regionkey
       WHERE r_name = 'ASIA'
         AND o_orderdate >= DATE '1996-01-01' AND o_orderdate < DATE '1997-01-01'
       GROUP BY n_name""",
)
def tpch_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 local-supplier revenue: 6-way join, dims broadcast."""
    c = read_table(spark, sf_dir, "customer")
    o = read_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01")) & (F.col("o_orderdate") < F.lit("1997-01-01"))
    )
    li = read_table(spark, sf_dir, "lineitem")
    s = read_table(spark, sf_dir, "supplier")
    n = read_table(spark, sf_dir, "nation")
    r = read_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    dd = lambda c_: F.col(c_).cast("decimal(18,4)")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(s, (li.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey))
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(
            F.sum(dd("l_extendedprice") * (F.lit(1) - F.col("l_discount")).cast("decimal(18,4)"))
            .cast("double").alias("revenue")
        )
    )


@q(
    "tpch_q10",
    """SELECT c_custkey, c_name,
              CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))
                       * CAST(1 - l_discount AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
              CAST(c_acctbal AS DOUBLE) AS c_acctbal, n_name
       FROM customer JOIN orders ON c_custkey = o_custkey
                     JOIN lineitem ON l_orderkey = o_orderkey
                     JOIN nation ON c_nationkey = n_nationkey
       WHERE o_orderdate >= DATE '1996-10-01' AND o_orderdate < DATE '1997-01-01'
         AND l_returnflag = 'R'
       GROUP BY c_custkey, c_name, c_acctbal, n_name
       ORDER BY revenue DESC, c_custkey LIMIT 20""",
)
def tpch_q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 returned-item reporting: join + group + top-20."""
    c = read_table(spark, sf_dir, "customer")
    o = read_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-10-01")) & (F.col("o_orderdate") < F.lit("1997-01-01"))
    )
    li = read_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = read_table(spark, sf_dir, "nation")
    dd = lambda c_: F.col(c_).cast("decimal(18,4)")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(
            F.sum(dd("l_extendedprice") * (F.lit(1) - F.col("l_discount")).cast("decimal(18,4)"))
            .cast("double").alias("revenue")
        )
        .select(
            "c_custkey", "c_name", "revenue", F.col("c_acctbal").cast("double").alias("c_acctbal"), "n_name"
        )
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )


# =====================================================================
# K (continued): SimHash, n-gram Jaccard, embedding near-dup, IVF ANN,
# language ID — the remaining graded LLM-pipeline operators
# =====================================================================

_SIMHASH_FP_SQL = """
  tok AS (
    SELECT doc_id, unnest(string_split(trim(text), ' ')) AS tok FROM documents),
  h AS (
    SELECT doc_id, CAST('0x' || substr(md5(tok), 1, 15) AS BIGINT) AS h FROM tok),
  votes AS (
    SELECT doc_id, j.range AS j,
           SUM(CASE WHEN (h >> j.range) & 1 = 1 THEN 1 ELSE -1 END) AS v
    FROM h CROSS JOIN range(60) j GROUP BY 1, 2),
  fp AS (
    SELECT doc_id,
           SUM(CASE WHEN v > 0 THEN 1::BIGINT << j ELSE 0::BIGINT END) AS simhash
    FROM votes GROUP BY doc_id)
"""


@q(
    "dedup_simhash",
    """WITH """ + _SIMHASH_FP_SQL + """
       SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
              CAST(bit_count(xor(a.simhash, b.simhash)) AS INT) AS hamming
       FROM fp a JOIN fp b ON a.doc_id < b.doc_id
       WHERE bit_count(xor(a.simhash, b.simhash)) <= 10
         AND ((a.simhash >> 0) & 32767 = (b.simhash >> 0) & 32767
           OR (a.simhash >> 15) & 32767 = (b.simhash >> 15) & 32767
           OR (a.simhash >> 30) & 32767 = (b.simhash >> 30) & 32767
           OR (a.simhash >> 45) & 32767 = (b.simhash >> 45) & 32767)""",
)
def dedup_simhash_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K2 SimHash near-dup: 60-bit md5 bit-vote fingerprints, 4×15-bit
    chunk banding (pigeonhole-complete for Hamming ≤ 3), exact
    bit_count(xor) distance on candidates. Oracle brute-forces pairs;
    the Spark plan never does — band equi-join only."""
    from varda_spark.operators.dedup import simhash_pairs

    d = read_table(spark, sf_dir, "documents")
    return simhash_pairs(d, max_hamming=10).select(
        "doc_a", "doc_b", F.col("hamming").cast("int").alias("hamming")
    )


@q(
    "dedup_ngram",
    """WITH words AS (
         SELECT doc_id, string_split(trim(text), ' ') AS w FROM documents),
       sh AS (
         SELECT DISTINCT doc_id,
                unnest(list_transform(range(1, greatest(len(w) - 1, 1)),
                       i -> w[i] || ' ' || w[i + 1] || ' ' || w[i + 2])) AS shingle
         FROM words),
       sizes AS (SELECT doc_id, COUNT(DISTINCT shingle) AS n_sh FROM sh GROUP BY doc_id),
       inter AS (
         SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_inter
         FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
         GROUP BY 1, 2)
       SELECT doc_a, doc_b,
              CAST(n_inter AS BIGINT) AS n_inter,
              CAST(sa.n_sh + sb.n_sh - n_inter AS BIGINT) AS n_union,
              CAST(floor(n_inter * 100 / (sa.n_sh + sb.n_sh - n_inter)) AS BIGINT) AS jaccard_pct
       FROM inter JOIN sizes sa ON sa.doc_id = doc_a
                  JOIN sizes sb ON sb.doc_id = doc_b
       WHERE floor(n_inter * 100 / (sa.n_sh + sb.n_sh - n_inter)) >= 20""",
)
def dedup_ngram_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K2 n-gram (3-shingle) Jaccard near-dup via inverted-index join —
    fan-out bounded by shingle frequency, never an all-pairs join."""
    from varda_spark.operators.dedup import ngram_jaccard

    d = read_table(spark, sf_dir, "documents")
    return ngram_jaccard(d).filter(F.col("jaccard_pct") >= 20).select(
        "doc_a", "doc_b",
        F.col("n_inter").cast("bigint").alias("n_inter"),
        F.col("n_union").cast("bigint").alias("n_union"),
        "jaccard_pct",
    )


# shared by dedup_components and dedup_stars: both compute the SAME
# clustering (min-reachable-id over the MinHash candidate graph), by two
# different distributed algorithms — one oracle defines both
_CC_ORACLE_SQL = """WITH RECURSIVE words AS (
         SELECT doc_id, string_split(text, ' ') AS w FROM documents),
       sh AS (
         SELECT doc_id,
                unnest(list_transform(range(1, greatest(len(w) - 1, 1)),
                       i -> w[i] || ' ' || w[i + 1] || ' ' || w[i + 2])) AS shingle
         FROM words),
       sigs AS (
         SELECT doc_id,
                MIN(md5('0|' || shingle)) AS sig_0, MIN(md5('1|' || shingle)) AS sig_1,
                MIN(md5('2|' || shingle)) AS sig_2, MIN(md5('3|' || shingle)) AS sig_3,
                MIN(md5('4|' || shingle)) AS sig_4, MIN(md5('5|' || shingle)) AS sig_5,
                MIN(md5('6|' || shingle)) AS sig_6, MIN(md5('7|' || shingle)) AS sig_7
         FROM sh GROUP BY doc_id),
       banded AS (
         SELECT doc_id, band FROM (
           SELECT doc_id,
                  ['0|' || sig_0 || '|' || sig_1, '1|' || sig_2 || '|' || sig_3,
                   '2|' || sig_4 || '|' || sig_5, '3|' || sig_6 || '|' || sig_7] AS bands
           FROM sigs), UNNEST(bands) AS u(band)),
       pairs AS (
         SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
         FROM banded a JOIN banded b ON a.band = b.band AND a.doc_id < b.doc_id),
       edges AS (
         SELECT doc_a AS src, doc_b AS dst FROM pairs
         UNION SELECT doc_b AS src, doc_a AS dst FROM pairs),
       verts AS (SELECT DISTINCT src AS id FROM edges),
       walk(id, comp) AS (
         SELECT id, id FROM verts
         UNION
         SELECT e.dst, w.comp FROM walk w JOIN edges e ON e.src = w.id)
       SELECT id AS doc_id, CAST(MIN(comp) AS BIGINT) AS component,
              id = MIN(comp) AS is_canonical
       FROM walk GROUP BY id"""


@q("dedup_components", _CC_ORACLE_SQL)
def dedup_components_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K2 completion: MinHash candidate pairs → connected components →
    canonical survivor per cluster (min doc id). The step every real dedup
    pipeline needs between 'found near-dup pairs' and 'dropped duplicates':
    pairs are not transitive-closed, clusters are. Spark side is iterative
    min-label propagation (operators/dedup.py connected_components); the
    oracle is the same closure via DuckDB recursive CTE."""
    from varda_spark.operators.dedup import connected_components, minhash_candidates

    d = read_table(spark, sf_dir, "documents")
    pairs = minhash_candidates(d, num_hashes=8, bands=4, shingle_n=3)
    cc = connected_components(pairs)
    return cc.select(
        F.col("id").cast("bigint").alias("doc_id"),
        F.col("comp").cast("bigint").alias("component"),
        (F.col("id") == F.col("comp")).alias("is_canonical"),
    )


@q("dedup_stars", _CC_ORACLE_SQL)
def dedup_stars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K2 scale variant: the SAME clustering as dedup_components, computed
    by large-star/small-star edge rewriting (operators/dedup.py cc_stars)
    instead of label propagation — the algorithm of record when the
    candidate graph has hub-degree skew (label propagation re-shuffles a
    hub's whole neighborhood through one key every round; star rewriting
    shrinks it geometrically). One oracle, two algorithms: both must hash
    to the identical component table."""
    from varda_spark.operators.dedup import cc_stars, minhash_candidates

    d = read_table(spark, sf_dir, "documents")
    pairs = minhash_candidates(d, num_hashes=8, bands=4, shingle_n=3)
    cc = cc_stars(pairs)
    return cc.select(
        F.col("id").cast("bigint").alias("doc_id"),
        F.col("comp").cast("bigint").alias("component"),
        (F.col("id") == F.col("comp")).alias("is_canonical"),
    )


@q(
    "dedup_embcos",
    """WITH q AS (
         SELECT vec_id, label,
                list_transform(embedding,
                    x -> CAST(floor(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS e
         FROM embeddings),
       n AS (
         SELECT vec_id, label, e,
                (SELECT SUM(e[i.range] * e[i.range]) FROM range(1, 65) i) AS n2
         FROM q),
       pairs AS (
         SELECT a.vec_id AS doc_a, b.vec_id AS doc_b,
                (SELECT SUM(a.e[i.range] * b.e[i.range]) FROM range(1, 65) i) AS dq,
                a.n2 AS na2, b.n2 AS nb2
         FROM n a JOIN n b ON a.label = b.label AND a.vec_id < b.vec_id)
       SELECT doc_a, doc_b,
              CAST(floor(100.0 * dq / sqrt(CAST(na2 * nb2 AS DOUBLE))) AS BIGINT) AS cos_pct
       FROM pairs
       WHERE dq > 0 AND floor(100.0 * dq / sqrt(CAST(na2 * nb2 AS DOUBLE))) >= 30""",
)
def dedup_embcos(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K near-dup by embedding cosine ≥ 0.30, label-blocked.

    Integer-quantized dot/norms (exact) + single correctly-rounded IEEE
    sqrt/div/floor → bit-identical across engines."""
    from varda_spark.operators.similarity import quantized_neardup

    e = read_table(spark, sf_dir, "embeddings")
    return quantized_neardup(e, threshold_pct=30)


def _lsh_oracle() -> str:
    """Oracle for sim_lsh: the SAME md5-derived ±1 hyperplane matrix
    (operators/similarity.py lsh_hyperplane_coefs) baked as a VALUES list;
    projections, sign buckets, bucket join, and exact quantized-cosine
    verification all recomputed in SQL."""
    from varda_spark.operators.similarity import lsh_hyperplane_coefs

    coefs = lsh_hyperplane_coefs(tables=4, bits=6, dim=64)
    rows = ", ".join(f"({t}, {coefs[t]})" for t in range(24))
    return f"""WITH hp(t, co) AS (SELECT * FROM (VALUES {rows}) v(t, co)),
       q AS (
         SELECT vec_id, list_transform(embedding,
                    x -> CAST(floor(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS e
         FROM embeddings),
       n AS (
         SELECT vec_id, e,
                (SELECT SUM(e[i.range] * e[i.range]) FROM range(1, 65) i) AS n2
         FROM q),
       proj AS (
         SELECT q.vec_id, hp.t,
                (SELECT SUM(q.e[r.range] * hp.co[r.range]) FROM range(1, 65) r) AS s
         FROM q CROSS JOIN hp),
       buckets AS (
         SELECT vec_id,
                CAST(t // 6 AS VARCHAR) || '|' ||
                string_agg(CASE WHEN s >= 0 THEN '1' ELSE '0' END, '' ORDER BY t) AS bucket
         FROM proj GROUP BY vec_id, t // 6),
       cand AS (
         SELECT DISTINCT a.vec_id AS doc_a, b.vec_id AS doc_b
         FROM buckets a JOIN buckets b ON a.bucket = b.bucket AND a.vec_id < b.vec_id),
       pairs AS (
         SELECT doc_a, doc_b,
                (SELECT SUM(na.e[i.range] * nb.e[i.range]) FROM range(1, 65) i) AS dq,
                na.n2 AS na2, nb.n2 AS nb2
         FROM cand JOIN n na ON na.vec_id = doc_a JOIN n nb ON nb.vec_id = doc_b)
       SELECT doc_a, doc_b,
              CAST(floor(100.0 * dq / sqrt(CAST(na2 * nb2 AS DOUBLE))) AS BIGINT) AS cos_pct
       FROM pairs
       WHERE dq > 0 AND floor(100.0 * dq / sqrt(CAST(na2 * nb2 AS DOUBLE))) >= 30"""


@q("sim_lsh", _lsh_oracle())
def sim_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K3 content-based ANN: 4 tables × 6-bit hyperplane (sign-random-
    projection) LSH buckets generate candidates from the vector itself —
    no label column needed — then exact quantized cosine verifies. The
    100 TB shape when no natural blocking key exists: bucket fan-out
    bounded by 2^bits per table, all math integer or single-IEEE-op."""
    from varda_spark.operators.similarity import lsh_neardup

    e = read_table(spark, sf_dir, "embeddings")
    return lsh_neardup(e, threshold_pct=30)


def _kmeans_oracle(k: int = 8, iters: int = 3, tail: str | None = None) -> str:
    """Machine-generated oracle for sim_kmeans: the same fixed number of
    Lloyd rounds (assignment CTE + per-dim floor-avg update CTE per round,
    empty cells keep their previous centroid) unrolled as chained CTEs."""
    head = f"""WITH q AS (
         SELECT vec_id, list_transform(embedding,
                    x -> CAST(floor(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS e
         FROM embeddings),
       c0 AS (
         SELECT ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS cell_id, e AS ce
         FROM (SELECT vec_id, e FROM q ORDER BY vec_id LIMIT {k}))"""
    blocks = []
    for it in range(iters + 1):
        blocks.append(f"""
       s{it} AS (
         SELECT q.vec_id, c{it}.cell_id,
                (SELECT SUM(-2 * q.e[i.range] * c{it}.ce[i.range]
                            + c{it}.ce[i.range] * c{it}.ce[i.range])
                 FROM range(1, 65) i) AS score
         FROM q CROSS JOIN c{it}),
       a{it} AS (
         SELECT vec_id, cell_id FROM (
           SELECT vec_id, cell_id,
                  ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY score, cell_id) AS rn
           FROM s{it}) WHERE rn = 1)""")
        if it < iters:
            blocks.append(f"""
       u{it} AS (
         SELECT a.cell_id, d.i AS dim,
                CAST(floor(CAST(SUM(q.e[d.i]) AS DOUBLE) / COUNT(*)) AS BIGINT) AS cv
         FROM a{it} a JOIN q USING (vec_id), range(1, 65) d(i)
         GROUP BY a.cell_id, d.i),
       c{it + 1} AS (
         SELECT p.cell_id, COALESCE(n.ce, p.ce) AS ce
         FROM c{it} p LEFT JOIN (
           SELECT cell_id, list(cv ORDER BY dim) AS ce FROM u{it} GROUP BY cell_id
         ) n USING (cell_id))""")
    if tail is None:
        tail = f"""
       SELECT vec_id, CAST(cell_id AS BIGINT) AS cell_id FROM a{iters}"""
    return head + "," + ",".join(blocks) + tail


@q("sim_kmeans", _kmeans_oracle())
def sim_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K3: real Lloyd's k-means coarse quantizer (3 rounds, deterministic
    integer math) — upgrades sim_ivf's seeded-centroid stand-in. Broadcast
    centroids, map-side assignment, (cell,dim) shuffle only for updates."""
    from varda_spark.operators.similarity import kmeans_assign

    e = read_table(spark, sf_dir, "embeddings")
    return kmeans_assign(e, k=8, iters=3)


@q(
    "sim_ivf",
    """WITH q AS (
         SELECT vec_id, list_transform(embedding,
                    x -> CAST(floor(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS e
         FROM embeddings),
       cents AS (
         SELECT vec_id AS cell_id, e AS ec FROM q ORDER BY vec_id LIMIT 8),
       scored AS (
         SELECT q.vec_id, cents.cell_id,
                (SELECT SUM(q.e[i.range] * cents.ec[i.range]) FROM range(1, 65) i) AS cd
         FROM q CROSS JOIN cents),
       assigned AS (
         SELECT vec_id, cell_id FROM (
           SELECT vec_id, cell_id,
                  ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY cd DESC, cell_id) AS arn
           FROM scored) WHERE arn = 1),
       pairs AS (
         SELECT a.vec_id AS query_id, a.cell_id, b.vec_id AS neighbor_id,
                (SELECT SUM(qa.e[i.range] * qb.e[i.range]) FROM range(1, 65) i) AS dot_q
         FROM assigned a JOIN assigned b ON a.cell_id = b.cell_id AND a.vec_id <> b.vec_id
              JOIN q qa ON qa.vec_id = a.vec_id
              JOIN q qb ON qb.vec_id = b.vec_id)
       SELECT query_id, CAST(cell_id AS BIGINT) AS cell_id, neighbor_id,
              CAST(dot_q AS BIGINT) AS dot_q, rank
       FROM (
         SELECT query_id, cell_id, neighbor_id, dot_q,
                CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                     ORDER BY dot_q DESC, neighbor_id) AS BIGINT) AS rank
         FROM pairs) WHERE rank <= 3""",
)
def sim_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K3 IVF-bucketed ANN: broadcast coarse quantizer (8 cells), map-side
    assignment, within-cell exact top-3 — the 100 TB similarity path."""
    from varda_spark.operators.similarity import ivf_topk

    e = read_table(spark, sf_dir, "embeddings")
    return ivf_topk(e, n_centroids=8, k=3)


@q(
    "text_langid",
    """WITH t AS (
         SELECT doc_id, lang, string_split(trim(text), ' ') AS w FROM documents),
       s AS (
         SELECT doc_id, lang,
                list_contains(w,'the')::INT + list_contains(w,'and')::INT + list_contains(w,'of')::INT AS s_en,
                list_contains(w,'le')::INT + list_contains(w,'la')::INT + list_contains(w,'et')::INT AS s_fr,
                list_contains(w,'el')::INT + list_contains(w,'los')::INT + list_contains(w,'que')::INT AS s_es,
                list_contains(w,'der')::INT + list_contains(w,'und')::INT + list_contains(w,'die')::INT AS s_de,
                list_contains(w,'de')::INT + list_contains(w,'shi')::INT + list_contains(w,'le')::INT AS s_zh
         FROM t),
       g AS (SELECT *, greatest(s_en, s_fr, s_es, s_de, s_zh) AS gsc FROM s)
       SELECT doc_id, lang,
              CASE WHEN gsc = 0 THEN 'unknown'
                   WHEN s_en = gsc THEN 'en'
                   WHEN s_fr = gsc THEN 'fr'
                   WHEN s_es = gsc THEN 'es'
                   WHEN s_de = gsc THEN 'de'
                   ELSE 'zh' END AS lang_pred,
              CAST(gsc AS BIGINT) AS lang_score
       FROM g""",
)
def text_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K4 language-ID heuristic (marker n-gram voting, pure Column)."""
    from varda_spark.operators.text import language_id

    d = read_table(spark, sf_dir, "documents")
    return language_id(d).select("doc_id", "lang", "lang_pred", "lang_score")


@q(
    "stream_watermark",
    """WITH mx AS (SELECT MAX(epoch_us(ts)) AS m FROM events),
       kept AS (
         SELECT * FROM events CROSS JOIN mx
         WHERE epoch_us(ts) >= m - 1440::BIGINT * 60 * 1000000)
       SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS win_start,
              event_type,
              CAST(COUNT(*) AS BIGINT) AS n_events,
              CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
       FROM kept GROUP BY 1, 2""",
)
def stream_watermark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """I4 watermark batch core: drop events older than max(ts)-1d,
    then the tumbling agg — the final state of the streaming query."""
    from varda_spark.streaming.windows import watermark_tumbling_batch

    return watermark_tumbling_batch(read_table(spark, sf_dir, "events"), delay_minutes=1440)


# =====================================================================
# TPC-H continued (adapted where the driver's column subset requires:
# lineitem has no commitdate/receiptdate/shipmode, part no container)
# =====================================================================

@q(
    "tpch_q6",
    """SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))
                       * CAST(l_discount AS DECIMAL(18,4))) AS DOUBLE) AS revenue
       FROM lineitem
       WHERE l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1997-01-01'
         AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24""",
)
def tpch_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 forecasting revenue change: pure scan+filter+agg.

    All three predicates push to the parquet scan; zero shuffle rows
    (single scalar out of map-side partials)."""
    li = read_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01"))
        & (F.col("l_shipdate") < F.lit("1997-01-01"))
        & (F.col("l_discount") >= 0.05) & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    )
    return li.agg(
        F.sum(F.col("l_extendedprice").cast("decimal(18,4)") * F.col("l_discount").cast("decimal(18,4)"))
        .cast("double").alias("revenue")
    )


@q(
    "tpch_q7",
    """SELECT supp_nation, cust_nation, l_year,
              CAST(SUM(CAST(volume AS DECIMAL(18,4))) AS DOUBLE) AS revenue
       FROM (
         SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
                CAST(year(l_shipdate) AS BIGINT) AS l_year,
                CAST(l_extendedprice AS DECIMAL(18,4))
                  * CAST(1 - l_discount AS DECIMAL(18,4)) AS volume
         FROM supplier JOIN lineitem ON s_suppkey = l_suppkey
              JOIN orders ON o_orderkey = l_orderkey
              JOIN customer ON c_custkey = o_custkey
              JOIN nation n1 ON s_nationkey = n1.n_nationkey
              JOIN nation n2 ON c_nationkey = n2.n_nationkey
         WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
             OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
           AND l_shipdate BETWEEN DATE '1996-01-01' AND DATE '1997-12-31') shipping
       GROUP BY supp_nation, cust_nation, l_year""",
)
def tpch_q7(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 volume shipping between two nations (disjunctive join pred)."""
    s = read_table(spark, sf_dir, "supplier")
    li = read_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01")) & (F.col("l_shipdate") <= F.lit("1997-12-31"))
    )
    o = read_table(spark, sf_dir, "orders")
    c = read_table(spark, sf_dir, "customer")
    n1 = read_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    n2 = read_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation")
    )
    j = (
        li.join(s, li.l_suppkey == s.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("s_nk"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("c_nk"))
        .filter(
            ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
            | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
        )
    )
    return (
        j.select(
            "supp_nation", "cust_nation",
            F.year("l_shipdate").cast("bigint").alias("l_year"),
            (F.col("l_extendedprice").cast("decimal(18,4)")
             * (F.lit(1) - F.col("l_discount")).cast("decimal(18,4)")).alias("volume"),
        )
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(F.sum(F.col("volume").cast("decimal(18,4)")).cast("double").alias("revenue"))
    )


@q(
    "tpch_q12",
    """SELECT l_linestatus,
              CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                            THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
              CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                            THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
       FROM orders JOIN lineitem ON o_orderkey = l_orderkey
       WHERE l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1997-01-01'
       GROUP BY l_linestatus""",
)
def tpch_q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 (adapted: linestatus for shipmode, shipdate for receipt —
    driver schema has neither shipmode nor receiptdate): priority counts."""
    o = read_table(spark, sf_dir, "orders")
    li = read_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01")) & (F.col("l_shipdate") < F.lit("1997-01-01"))
    )
    hi = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(hi, 1).otherwise(0)).cast("bigint").alias("high_line_count"),
            F.sum(F.when(~hi, 1).otherwise(0)).cast("bigint").alias("low_line_count"),
        )
    )


@q(
    "tpch_q14",
    """SELECT 100.0 * CAST(promo AS DOUBLE) / CAST(total AS DOUBLE) AS promo_revenue
       FROM (
         SELECT SUM(CASE WHEN p_type LIKE 'PROMO%'
                         THEN CAST(l_extendedprice AS DECIMAL(18,4))
                              * CAST(1 - l_discount AS DECIMAL(18,4))
                         ELSE CAST(0 AS DECIMAL(18,4)) END) AS promo,
                SUM(CAST(l_extendedprice AS DECIMAL(18,4))
                    * CAST(1 - l_discount AS DECIMAL(18,4))) AS total
         FROM lineitem JOIN part ON l_partkey = p_partkey
         WHERE l_shipdate >= DATE '1996-09-01' AND l_shipdate < DATE '1996-10-01')""",
)
def tpch_q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 promotion effect: conditional agg over lineitem⋈part.

    Decimal ratio → deterministic double. part is broadcast."""
    li = read_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-09-01")) & (F.col("l_shipdate") < F.lit("1996-10-01"))
    )
    p = read_table(spark, sf_dir, "part")
    disc = F.col("l_extendedprice").cast("decimal(18,4)") * (F.lit(1) - F.col("l_discount")).cast("decimal(18,4)")
    j = li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
    agg = j.agg(
        F.sum(F.when(F.col("p_type").like("PROMO%"), disc).otherwise(F.lit(0).cast("decimal(18,4)"))).alias("promo"),
        F.sum(disc).alias("total"),
    )
    return agg.select(
        (F.lit(100.0) * F.col("promo").cast("double") / F.col("total").cast("double")).alias("promo_revenue")
    )


@q(
    "tpch_q18",
    """SELECT c_name, c_custkey, o_orderkey, o_orderdate,
              CAST(o_totalprice AS DOUBLE) AS o_totalprice,
              CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty
       FROM customer JOIN orders ON c_custkey = o_custkey
            JOIN lineitem ON o_orderkey = l_orderkey
       WHERE o_orderkey IN (
         SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
         HAVING SUM(CAST(l_quantity AS DECIMAL(18,4))) > 212)
       GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
       ORDER BY o_totalprice DESC, o_orderdate, o_orderkey LIMIT 100""",
)
def tpch_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 large-volume customers: HAVING subquery as a semi-join."""
    c = read_table(spark, sf_dir, "customer")
    o = read_table(spark, sf_dir, "orders")
    li = read_table(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(18,4)")).alias("q"))
        .filter(F.col("q") > 212)
        .select("l_orderkey")
    )
    return (
        li.join(big.withColumnRenamed("l_orderkey", "o_orderkey"), li.l_orderkey == F.col("o_orderkey"), "left_semi")
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(F.sum(F.col("l_quantity").cast("decimal(18,4)")).cast("double").alias("sum_qty"))
        .select(
            "c_name", "c_custkey", "o_orderkey", "o_orderdate",
            F.col("o_totalprice").cast("double").alias("o_totalprice"), "sum_qty",
        )
        .orderBy(F.col("o_totalprice").desc(), "o_orderdate", "o_orderkey")
        .limit(100)
    )


@q(
    "tpch_q19",
    """SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))
                       * CAST(1 - l_discount AS DECIMAL(18,4))) AS DOUBLE) AS revenue
       FROM lineitem JOIN part ON p_partkey = l_partkey
       WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
              AND l_quantity >= 1 AND l_quantity <= 30)
          OR (p_brand = 'Brand#2' AND p_size BETWEEN 10 AND 30
              AND l_quantity >= 10 AND l_quantity <= 40)""",
)
def tpch_q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 (adapted: no p_container in driver schema) — disjunctive
    join predicates; Catalyst extracts p_partkey=l_partkey as the equi key
    and evaluates the OR residual post-join (broadcast part side)."""
    li = read_table(spark, sf_dir, "lineitem")
    p = read_table(spark, sf_dir, "part")
    j = li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
    c1 = (F.col("p_brand") == "Brand#1") & F.col("p_size").between(1, 15) & F.col("l_quantity").between(1, 30)
    c2 = (F.col("p_brand") == "Brand#2") & F.col("p_size").between(10, 30) & F.col("l_quantity").between(10, 40)
    return j.filter(c1 | c2).agg(
        F.sum(F.col("l_extendedprice").cast("decimal(18,4)")
              * (F.lit(1) - F.col("l_discount")).cast("decimal(18,4)")).cast("double").alias("revenue")
    )


# =====================================================================
# Pivot + SQL API surface
# =====================================================================

@q(
    "agg_pivot",
    """SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
              CAST(SUM(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS signup,
              CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS click,
              CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS view,
              CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchase,
              CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS error
       FROM events GROUP BY 1""",
)
def agg_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D: pivot (wide conditional agg). Explicit value list → single pass,
    no values-discovery job; DuckDB twin is the CASE WHEN expansion."""
    ev = read_table(spark, sf_dir, "events")
    types = ["signup", "click", "view", "purchase", "error"]
    out = (
        ev.withColumn("day", F.date_trunc("day", "ts").cast("date"))
        .groupBy("day")
        .pivot("event_type", types)
        .count()
    )
    return out.select("day", *[F.coalesce(F.col(t), F.lit(0)).cast("bigint").alias(t) for t in types])


_SQL_API = """
    SELECT n_name,
           CAST(COUNT(*) AS BIGINT) AS n_customers,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE) AS total_acctbal
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    GROUP BY n_name
"""


@q("sql_api", _SQL_API)
def sql_api(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SQL entry point: identical ANSI text runs on spark.sql and the
    DuckDB oracle (engine parity at the SQL surface, not just DataFrame)."""
    for t in ("customer", "nation"):
        read_table(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(_SQL_API)


# =====================================================================
# As-of join, deterministic sampling, multimodal frame sampling
# =====================================================================

@q(
    "join_asof",
    """WITH v AS (
         SELECT user_id, ts, MAX(event_id) AS view_event_id
         FROM events WHERE event_type = 'view' GROUP BY user_id, ts),
       p AS (
         SELECT user_id, ts, event_id FROM events WHERE event_type = 'purchase')
       SELECT p.user_id, p.event_id,
              epoch_us(p.ts) AS ts_us,
              v.view_event_id,
              epoch_us(v.ts) AS view_ts_us,
              epoch_us(p.ts) - epoch_us(v.ts) AS gap_us
       FROM p ASOF LEFT JOIN v ON p.user_id = v.user_id AND p.ts >= v.ts""",
)
def join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C: as-of join — each purchase matched to the user's most recent
    view at-or-before it. One shuffle + one carry-forward window (no
    per-row subquery, no range self-join); DuckDB's native ASOF JOIN is
    the oracle."""
    from varda_spark.operators.asof import asof_join

    ev = read_table(spark, sf_dir, "events")
    views = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("view_event_id"))
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select("user_id", "ts", "event_id")
    out = asof_join(purchases, views, by="user_id", on="ts", right_cols=["view_event_id"])
    return out.select(
        "user_id",
        "event_id",
        F.unix_micros("ts").alias("ts_us"),
        F.col("view_event_id_right").alias("view_event_id"),
        F.unix_micros("ts_right").alias("view_ts_us"),
        (F.unix_micros("ts") - F.unix_micros("ts_right")).alias("gap_us"),
    )


@q(
    "sample_hash",
    """SELECT l_orderkey, l_linenumber, l_quantity
       FROM lineitem
       WHERE CAST('0x' || substr(md5(l_orderkey || '-' || l_linenumber), 1, 4) AS INT) % 10 = 0""",
)
def sample_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic ~10% sample by content hash — reproducible across
    engines, runs, and partitionings (unlike TABLESAMPLE/rand(seed));
    the train/test-split primitive of a data pipeline. Pure map-side."""
    li = read_table(spark, sf_dir, "lineitem")
    key = F.concat_ws("-", F.col("l_orderkey").cast("string"), F.col("l_linenumber").cast("string"))
    bucket = F.conv(F.substring(F.md5(key.cast("binary")), 1, 4), 16, 10).cast("int") % 10
    return li.filter(bucket == 0).select("l_orderkey", "l_linenumber", "l_quantity")


@q(
    "multimodal_frames",
    """WITH mm AS (
         SELECT doc_id AS item_id,
                CASE WHEN doc_id % 3 = 0 THEN 'image/png'
                     WHEN doc_id % 3 = 1 THEN 'audio/wav'
                     ELSE 'video/mp4' END AS mime,
                text, length(text) AS n_bytes
         FROM documents),
       idx AS (
         SELECT item_id, mime, text,
                unnest(range(0, least(CAST(floor(n_bytes / 64) AS BIGINT), 3) + 1)) AS frame_idx
         FROM mm)
       SELECT item_id, mime, CAST(frame_idx AS INT) AS frame_idx,
              md5(substring(text, CAST(frame_idx * 64 + 1 AS INT), 64)) AS frame_md5
       FROM idx""",
)
def multimodal_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K5 frame sampling: fixed-stride blob slices (the keyframe-extraction
    plan shape; codec call swaps in via mapInPandas at deployment)."""
    from varda_spark.sources.multimodal import frame_sample, synthesize_blobs

    d = read_table(spark, sf_dir, "documents")
    return frame_sample(synthesize_blobs(d)).select("item_id", "mime", "frame_idx", "frame_md5")


# =====================================================================
# TPC-H continued: Q4/Q8/Q13/Q15/Q17 (adapted to driver column subset)
# =====================================================================

@q(
    "tpch_q4",
    """SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
       FROM orders
       WHERE o_orderdate >= DATE '1996-07-01' AND o_orderdate < DATE '1996-10-01'
         AND EXISTS (SELECT 1 FROM lineitem
                     WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
       GROUP BY o_orderpriority""",
)
def tpch_q4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 order priority checking (adapted: EXISTS on returned
    lineitems — driver schema has no commit/receipt dates). EXISTS → semi
    join; aggregation after, so each order counts once."""
    o = read_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-07-01")) & (F.col("o_orderdate") < F.lit("1996-10-01"))
    )
    li = read_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    return (
        o.join(li.select("l_orderkey"), o.o_orderkey == li.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).cast("bigint").alias("order_count"))
    )


@q(
    "tpch_q8",
    """SELECT o_year,
              CAST(CAST(SUM(CASE WHEN supp_nation = 'NATION_3' THEN volume
                                 ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
                   / CAST(SUM(volume) AS DOUBLE) AS DOUBLE) AS mkt_share
       FROM (
         SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
                CAST(l_extendedprice AS DECIMAL(18,4))
                  * CAST(1 - l_discount AS DECIMAL(18,4)) AS volume,
                n1.n_name AS supp_nation
         FROM lineitem JOIN orders ON l_orderkey = o_orderkey
              JOIN supplier ON l_suppkey = s_suppkey
              JOIN customer ON o_custkey = c_custkey
              JOIN nation n1 ON s_nationkey = n1.n_nationkey
              JOIN nation n2 ON c_nationkey = n2.n_nationkey
              JOIN region ON n2.n_regionkey = r_regionkey
         WHERE r_name = 'AMERICA'
           AND o_orderdate BETWEEN DATE '1996-01-01' AND DATE '1997-12-31')
       GROUP BY o_year""",
)
def tpch_q8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 national market share (no part table in the driver's
    lineitem keys needed): conditional share of a nation's supply volume."""
    li = read_table(spark, sf_dir, "lineitem")
    o = read_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01")) & (F.col("o_orderdate") <= F.lit("1997-12-31"))
    )
    s = read_table(spark, sf_dir, "supplier")
    c = read_table(spark, sf_dir, "customer")
    n1 = read_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    n2 = read_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_regionkey").alias("c_rk")
    )
    r = read_table(spark, sf_dir, "region").filter(F.col("r_name") == "AMERICA")
    vol = (F.col("l_extendedprice").cast("decimal(18,4)")
           * (F.lit(1) - F.col("l_discount")).cast("decimal(18,4)"))
    j = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("s_nk"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("c_nk"))
        .join(F.broadcast(r), F.col("c_rk") == F.col("r_regionkey"))
        .select(F.year("o_orderdate").cast("bigint").alias("o_year"),
                vol.alias("volume"), "supp_nation")
    )
    zero = F.lit(0).cast("decimal(18,4)")
    return j.groupBy("o_year").agg(
        (F.sum(F.when(F.col("supp_nation") == "NATION_3", F.col("volume")).otherwise(zero)).cast("double")
         / F.sum("volume").cast("double")).cast("double").alias("mkt_share")
    )


@q(
    "tpch_q13",
    """SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
       FROM (
         SELECT c_custkey, CAST(COUNT(o_orderkey) AS BIGINT) AS c_count
         FROM customer LEFT JOIN orders ON c_custkey = o_custkey
         GROUP BY c_custkey)
       GROUP BY c_count""",
)
def tpch_q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 customer order-count distribution: left join preserves
    zero-order customers, two-level aggregation."""
    c = read_table(spark, sf_dir, "customer")
    o = read_table(spark, sf_dir, "orders")
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").cast("bigint").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).cast("bigint").alias("custdist"))


@q(
    "tpch_q15",
    """WITH revenue AS (
         SELECT l_suppkey AS supplier_no,
                SUM(CAST(l_extendedprice AS DECIMAL(18,4))
                    * CAST(1 - l_discount AS DECIMAL(18,4))) AS total_revenue
         FROM lineitem
         WHERE l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1996-04-01'
         GROUP BY l_suppkey)
       SELECT s_suppkey, s_name, CAST(total_revenue AS DOUBLE) AS total_revenue
       FROM supplier JOIN revenue ON s_suppkey = supplier_no
       WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)""",
)
def tpch_q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 top supplier: scalar-subquery max on EXACT decimal
    revenue (double equality would be engine-dependent; decimal is not)."""
    li = read_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01")) & (F.col("l_shipdate") < F.lit("1996-04-01"))
    )
    rev = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.sum(F.col("l_extendedprice").cast("decimal(18,4)")
              * (F.lit(1) - F.col("l_discount")).cast("decimal(18,4)")).alias("total_revenue")
    )
    mx = rev.agg(F.max("total_revenue").alias("mx"))
    s = read_table(spark, sf_dir, "supplier")
    return (
        rev.crossJoin(F.broadcast(mx))
        .filter(F.col("total_revenue") == F.col("mx"))
        .join(s, F.col("supplier_no") == s.s_suppkey)
        .select("s_suppkey", "s_name", F.col("total_revenue").cast("double").alias("total_revenue"))
    )


@q(
    "tpch_q17",
    """SELECT CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE)
                   / 7.0 AS DOUBLE) AS avg_yearly
       FROM lineitem JOIN part ON p_partkey = l_partkey
            JOIN (SELECT l_partkey AS pk,
                         SUM(CAST(l_quantity AS DECIMAL(18,4))) AS sum_qty,
                         COUNT(*) AS cnt
                  FROM lineitem GROUP BY l_partkey) pp ON pk = l_partkey
       WHERE p_brand = 'Brand#1'
         AND CAST(l_quantity AS DECIMAL(18,4)) * 5 * cnt < sum_qty""",
)
def tpch_q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 small-quantity revenue (adapted: brand filter only — no
    p_container). Correlated avg subquery → one pre-aggregation joined
    back; the 0.2*avg comparison cross-multiplies to stay in EXACT
    decimals (qty*5*count < sum — no float threshold ambiguity)."""
    li = read_table(spark, sf_dir, "lineitem")
    p = read_table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#1")
    per_part = li.groupBy(F.col("l_partkey").alias("pk")).agg(
        F.sum(F.col("l_quantity").cast("decimal(18,4)")).alias("sum_qty"),
        F.count(F.lit(1)).alias("cnt"),
    )
    j = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(per_part, li.l_partkey == F.col("pk"))
        .filter(F.col("l_quantity").cast("decimal(18,4)") * 5 * F.col("cnt") < F.col("sum_qty"))
    )
    return j.agg(
        (F.sum(F.col("l_extendedprice").cast("decimal(18,4)")).cast("double") / F.lit(7.0))
        .cast("double").alias("avg_yearly")
    )


# =====================================================================
# BPE-ish tokens, stream-stream join core, Q22, ntile windows
# =====================================================================

@q(
    "text_tokens_bpe",
    """SELECT doc_id,
              CAST(len(regexp_extract_all(lower(text), '[a-z0-9]+|[^a-z0-9\\s]')) AS BIGINT)
                  AS n_bpe_tokens,
              CAST(len(list_distinct(regexp_extract_all(lower(text),
                  '[a-z0-9]+|[^a-z0-9\\s]'))) AS BIGINT) AS n_distinct_bpe
       FROM documents""",
)
def text_tokens_bpe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K4 BPE-pretokenizer counting (word runs + punctuation marks) —
    the token-budget estimator of a training pipeline."""
    from varda_spark.operators.text import bpe_ish_tokens

    d = read_table(spark, sf_dir, "documents")
    t = bpe_ish_tokens("text")
    return d.select(
        "doc_id",
        F.size(t).cast("bigint").alias("n_bpe_tokens"),
        F.size(F.array_distinct(t)).cast("bigint").alias("n_distinct_bpe"),
    )


@q(
    "stream_join",
    """SELECT p.user_id, p.event_id AS purchase_id,
              epoch_us(p.ts) AS p_ts_us,
              v.event_id AS view_id,
              epoch_us(v.ts) AS v_ts_us
       FROM (SELECT * FROM events WHERE event_type = 'purchase') p
       JOIN (SELECT * FROM events WHERE event_type = 'view') v
         ON p.user_id = v.user_id
        AND v.ts <= p.ts
        AND v.ts >= p.ts - INTERVAL 60 MINUTES""",
)
def stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """I5 stream-stream join batch core: purchases × preceding-hour views
    per user. The time bound is what makes the streaming twin's state
    finite (see streaming/windows.purchase_view_join_stream)."""
    from varda_spark.streaming.windows import purchase_view_join_batch

    return purchase_view_join_batch(read_table(spark, sf_dir, "events"))


@q(
    "tpch_q22",
    """WITH avg_bal AS (
         SELECT AVG(CAST(c_acctbal AS DECIMAL(18,4))) AS ab
         FROM customer WHERE c_acctbal > 0),
       eligible AS (
         SELECT c_custkey, c_nationkey, c_acctbal
         FROM customer CROSS JOIN avg_bal
         WHERE CAST(c_acctbal AS DECIMAL(18,4)) > ab
           AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                           AND o_orderdate >= DATE '1999-01-01'))
       SELECT CAST(c_nationkey AS BIGINT) AS cntry,
              CAST(COUNT(*) AS BIGINT) AS numcust,
              CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE) AS totacctbal
       FROM eligible GROUP BY c_nationkey""",
)
def tpch_q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 global sales opportunity (adapted: nationkey for phone
    country code): above-average-balance customers with no orders —
    scalar subquery + anti join + grouped agg."""
    c = read_table(spark, sf_dir, "customer")
    o = read_table(spark, sf_dir, "orders")
    avg_bal = c.filter(F.col("c_acctbal") > 0).agg(
        F.avg(F.col("c_acctbal").cast("decimal(18,4)")).alias("ab")
    )
    return (
        c.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal").cast("decimal(18,4)") > F.col("ab"))
        .join(o.filter(F.col("o_orderdate") >= F.lit("1999-01-01")), c.c_custkey == o.o_custkey, "left_anti")
        .groupBy(F.col("c_nationkey").cast("bigint").alias("cntry"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("numcust"),
            F.sum(F.col("c_acctbal").cast("decimal(18,4)")).cast("double").alias("totacctbal"),
        )
    )


@q(
    "win_ntile",
    """SELECT c_custkey, c_mktsegment,
              CAST(ntile(4) OVER w AS BIGINT) AS quartile,
              percent_rank() OVER w AS pct_rank,
              cume_dist() OVER w AS cum_dist
       FROM customer
       WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey)""",
)
def win_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E: ntile / percent_rank / cume_dist (total order via custkey
    tiebreak → deterministic; the ratios are single IEEE divisions)."""
    c = read_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy("c_acctbal", "c_custkey")
    return c.select(
        "c_custkey",
        "c_mktsegment",
        F.ntile(4).over(w).cast("bigint").alias("quartile"),
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cum_dist"),
    )


# =====================================================================
# H (continued): edit distance, regex, null handling, date arithmetic,
# exact percentiles
# =====================================================================

@q(
    "str_editdist",
    """SELECT c_custkey,
              CAST(levenshtein(substring(c_name, 1, 8), 'Customer') AS BIGINT) AS d_prefix,
              CAST(levenshtein(c_mktsegment, 'BUILDING') AS BIGINT) AS d_seg
       FROM customer WHERE c_custkey <= 200""",
)
def str_editdist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H8 Levenshtein edit distance (fuzzy-matching primitive)."""
    c = read_table(spark, sf_dir, "customer").filter(F.col("c_custkey") <= 200)
    return c.select(
        "c_custkey",
        F.levenshtein(F.substring("c_name", 1, 8), F.lit("Customer")).cast("bigint").alias("d_prefix"),
        F.levenshtein("c_mktsegment", F.lit("BUILDING")).cast("bigint").alias("d_seg"),
    )


@q(
    "str_regex",
    """SELECT p_partkey,
              regexp_extract(p_type, '^([A-Z]+)', 1) AS type_head,
              regexp_replace(p_name, '[aeiou]', '_', 'g') AS name_devoweled,
              CAST(p_name ~ '^Part.*[02468]$' AS BOOLEAN) AS even_tail
       FROM part WHERE p_partkey <= 300""",
)
def str_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H8 regex extract / global replace / match."""
    p = read_table(spark, sf_dir, "part").filter(F.col("p_partkey") <= 300)
    return p.select(
        "p_partkey",
        F.regexp_extract("p_type", r"^([A-Z]+)", 1).alias("type_head"),
        F.regexp_replace("p_name", r"[aeiou]", "_").alias("name_devoweled"),
        F.col("p_name").rlike(r"^Part.*[02468]$").alias("even_tail"),
    )


@q(
    "null_funcs",
    """SELECT o_orderkey,
              coalesce(nullif(o_orderstatus, 'O'), 'OPEN') AS status_or_open,
              CAST(o_totalprice IS NOT NULL AS BOOLEAN) AS has_price,
              ifnull(CAST(NULL AS VARCHAR), o_orderpriority) AS prio
       FROM orders WHERE o_orderkey <= 500""",
)
def null_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H: NULL semantics — coalesce / nullif / ifnull / IS NOT NULL."""
    o = read_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 500)
    return o.select(
        "o_orderkey",
        F.coalesce(F.nullif("o_orderstatus", F.lit("O")), F.lit("OPEN")).alias("status_or_open"),
        F.col("o_totalprice").isNotNull().alias("has_price"),
        F.ifnull(F.lit(None).cast("string"), F.col("o_orderpriority")).alias("prio"),
    )


@q(
    "date_arith",
    """SELECT o_orderkey,
              CAST(o_orderdate + INTERVAL 30 DAY AS DATE) AS due_date,
              CAST(datediff('day', DATE '1995-01-01', o_orderdate) AS BIGINT) AS days_since_epoch_start,
              CAST(last_day(o_orderdate) AS DATE) AS month_end,
              CAST(year(o_orderdate) * 100 + month(o_orderdate) AS BIGINT) AS yyyymm
       FROM orders WHERE o_orderkey <= 400""",
)
def date_arith(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H4 date arithmetic: interval add, datediff, last_day, parts."""
    o = read_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 400)
    return o.select(
        "o_orderkey",
        F.date_add(F.col("o_orderdate").cast("date"), 30).alias("due_date"),
        F.datediff(F.col("o_orderdate").cast("date"), F.lit("1995-01-01").cast("date"))
        .cast("bigint").alias("days_since_epoch_start"),
        F.last_day(F.col("o_orderdate")).alias("month_end"),
        (F.year("o_orderdate") * 100 + F.month("o_orderdate")).cast("bigint").alias("yyyymm"),
    )


@q(
    "agg_quantile",
    """SELECT l_returnflag,
              quantile_cont(CAST(l_quantity AS DOUBLE), 0.5) AS med_qty,
              quantile_cont(CAST(l_extendedprice AS DOUBLE), 0.9) AS p90_price
       FROM lineitem GROUP BY l_returnflag""",
)
def agg_quantile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D: exact percentiles (sort-based; linear interpolation matches
    DuckDB quantile_cont). At 100 TB use approx_percentile — same API
    shape, sketch-based (see agg_approx_cd for the HLL analog)."""
    li = read_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.expr("percentile(CAST(l_quantity AS DOUBLE), 0.5)").alias("med_qty"),
        F.expr("percentile(CAST(l_extendedprice AS DOUBLE), 0.9)").alias("p90_price"),
    )


@q(
    "arr_funcs",
    """WITH e AS (
         SELECT vec_id,
                list_transform(embedding,
                    x -> CAST(floor(CAST(x AS DOUBLE) * 100) AS BIGINT)) AS q
         FROM embeddings WHERE vec_id < 200)
       SELECT vec_id,
              list_sort(q)[1] AS q_min,
              list_max(q) AS q_max,
              CAST(list_position(q, list_max(q)) AS BIGINT) AS argmax_1based,
              array_to_string(list_slice(list_reverse(q), 1, 3), ',')
                  AS last3_reversed,
              CAST(len(list_filter(q, x -> x > 0)) AS BIGINT) AS n_positive,
              CAST(list_reduce(q, (a, b) -> a + b) AS BIGINT) AS q_sum
       FROM e""",
)
def arr_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H6 array breadth: sort/max/position/slice/reverse/filter/reduce
    over quantized embeddings — the Column-level toolkit for vector and
    list-shaped feature columns.

    Output columns are scalar-only (r4 driver lesson): the array result
    is emitted as a ','-joined string so the driver's canonicalizer can
    sort it."""
    e = read_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 200)
    q_ = F.expr("transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 100) AS BIGINT))")
    d = e.select("vec_id", q_.alias("q"))
    return d.select(
        "vec_id",
        F.element_at(F.sort_array("q"), 1).alias("q_min"),
        F.array_max("q").alias("q_max"),
        F.array_position("q", F.array_max("q")).cast("bigint").alias("argmax_1based"),
        F.array_join(
            F.transform(F.slice(F.reverse("q"), 1, 3), lambda x: x.cast("string")), ","
        ).alias("last3_reversed"),
        F.size(F.filter("q", lambda x: x > 0)).cast("bigint").alias("n_positive"),
        F.aggregate("q", F.lit(0).cast("bigint"), lambda a, b: a + b).alias("q_sum"),
    )


# =====================================================================
# Join-type completeness (full outer, bounded cross, null-safe equality)
# and argmin/argmax + ordered-collect aggregates
# =====================================================================

@q(
    "join_full",
    """WITH big AS (
         SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS n_orders
         FROM orders WHERE o_totalprice > 400000 GROUP BY o_custkey),
       rich AS (
         SELECT c_custkey, c_name FROM customer WHERE c_acctbal > 9000)
       SELECT COALESCE(c_custkey, o_custkey) AS custkey,
              c_name, n_orders
       FROM rich FULL OUTER JOIN big ON c_custkey = o_custkey""",
)
def join_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C: FULL OUTER join — rows survive from both unmatched sides."""
    o = read_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 400000)
    big = o.groupBy("o_custkey").agg(F.count(F.lit(1)).cast("bigint").alias("n_orders"))
    rich = read_table(spark, sf_dir, "customer").filter(F.col("c_acctbal") > 9000).select(
        "c_custkey", "c_name"
    )
    j = rich.join(big, rich.c_custkey == big.o_custkey, "full_outer")
    return j.select(
        F.coalesce("c_custkey", "o_custkey").alias("custkey"), "c_name", "n_orders"
    )


@q(
    "join_cross",
    """SELECT n_name, r_name FROM nation CROSS JOIN region""",
)
def join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C: bounded cross join (25×5) — dims only; a cross join on facts
    would be flagged by tools/audit_plans.py."""
    n = read_table(spark, sf_dir, "nation").select("n_name")
    r = read_table(spark, sf_dir, "region").select("r_name")
    return n.crossJoin(F.broadcast(r))


@q(
    "join_nullsafe",
    """WITH a AS (
         SELECT o_orderkey, nullif(o_orderstatus, 'O') AS st FROM orders
         WHERE o_orderkey <= 200),
       b AS (
         SELECT nullif(o_orderstatus, 'O') AS st,
                CAST(COUNT(*) AS BIGINT) AS n
         FROM orders GROUP BY 1)
       SELECT a.o_orderkey, a.st, b.n
       FROM a JOIN b ON a.st IS NOT DISTINCT FROM b.st""",
)
def join_nullsafe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C: null-safe equality join (<=> / IS NOT DISTINCT FROM) — NULL
    keys match NULL keys instead of vanishing."""
    o = read_table(spark, sf_dir, "orders")
    a = o.filter(F.col("o_orderkey") <= 200).select(
        "o_orderkey", F.nullif("o_orderstatus", F.lit("O")).alias("st")
    )
    b = o.select(F.nullif("o_orderstatus", F.lit("O")).alias("st")).groupBy("st").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    return a.join(b.withColumnRenamed("st", "st_b"), a.st.eqNullSafe(F.col("st_b"))).select(
        "o_orderkey", "st", "n"
    )


@q(
    "agg_minmax_by",
    """SELECT c_mktsegment,
              arg_min(c_name, c_acctbal) AS poorest,
              arg_max(c_name, c_acctbal) AS richest,
              CAST(min(c_acctbal) AS DOUBLE) AS min_bal,
              CAST(max(c_acctbal) AS DOUBLE) AS max_bal
       FROM customer GROUP BY c_mktsegment""",
)
def agg_minmax_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D: argmin/argmax (min_by/max_by) — unique acctbals in testdata
    make the arg deterministic."""
    c = read_table(spark, sf_dir, "customer")
    return c.groupBy("c_mktsegment").agg(
        F.expr("min_by(c_name, c_acctbal)").alias("poorest"),
        F.expr("max_by(c_name, c_acctbal)").alias("richest"),
        F.min("c_acctbal").cast("double").alias("min_bal"),
        F.max("c_acctbal").cast("double").alias("max_bal"),
    )


@q(
    "agg_collect",
    """SELECT n_nationkey,
              array_to_string(list(s_name ORDER BY s_acctbal DESC, s_name)[1:3], ',')
                  AS top3_suppliers
       FROM nation JOIN supplier ON n_nationkey = s_nationkey
       GROUP BY n_nationkey""",
)
def agg_collect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D: ordered collect (top-3 names per nation) — sort_array over
    collected structs gives deterministic order; the top-3 list is
    emitted as a ','-joined string (scalar-only outputs, r4 driver
    lesson)."""
    n = read_table(spark, sf_dir, "nation")
    s = read_table(spark, sf_dir, "supplier")
    j = n.join(s, n.n_nationkey == s.s_nationkey)
    collected = F.expr(
        "array_join(slice(transform(array_sort(collect_list(struct(-s_acctbal AS neg, s_name AS name))), "
        "x -> x.name), 1, 3), ',')"
    )
    return j.groupBy("n_nationkey").agg(collected.alias("top3_suppliers"))


_IVF_KMEANS_TAIL = """,
       kpairs AS (
         SELECT a.vec_id AS query_id, a.cell_id, b.vec_id AS neighbor_id,
                (SELECT SUM(qa.e[i.range] * qb.e[i.range]) FROM range(1, 65) i) AS dot_q
         FROM a3 a JOIN a3 b ON a.cell_id = b.cell_id AND a.vec_id <> b.vec_id
              JOIN q qa ON qa.vec_id = a.vec_id
              JOIN q qb ON qb.vec_id = b.vec_id)
       SELECT query_id, CAST(cell_id AS BIGINT) AS cell_id, neighbor_id,
              CAST(dot_q AS BIGINT) AS dot_q, rank
       FROM (
         SELECT query_id, cell_id, neighbor_id, dot_q,
                CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                     ORDER BY dot_q DESC, neighbor_id) AS BIGINT) AS rank
         FROM kpairs) WHERE rank <= 3"""


@q("sim_ivf_kmeans", _kmeans_oracle(8, 3, _IVF_KMEANS_TAIL))
def sim_ivf_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K3 full production ANN: Lloyd's k-means coarse quantizer (sim_kmeans)
    feeding the vectorized blocked-matmul exact top-k within each learned
    cell — the composition a 100 TB similarity pipeline actually runs.
    Oracle = the unrolled k-means CTE chain + within-cell top-k SQL."""
    from varda_spark.operators.similarity import blocked_topk_pandas, kmeans_assign, quantized

    e = read_table(spark, sf_dir, "embeddings")
    cells = kmeans_assign(e, k=8, iters=3)
    assigned = e.select("vec_id", quantized("embedding", 1000).alias("_q")).join(cells, "vec_id")
    topk = blocked_topk_pandas(assigned, k=3, key="vec_id", block="cell_id")
    return topk.select(
        "query_id",
        F.col("cell_id").cast("bigint").alias("cell_id"),
        "neighbor_id",
        "dot_q",
        F.col("rank").cast("bigint").alias("rank"),
    )


@q(
    "dedup_pipeline",
    """WITH RECURSIVE hashed AS (
         SELECT doc_id, text,
                ROW_NUMBER() OVER (PARTITION BY md5(lower(trim(text)))
                                   ORDER BY doc_id) AS rn
         FROM documents),
       d1 AS (SELECT doc_id, text FROM hashed WHERE rn = 1),
       words AS (
         SELECT doc_id, string_split(text, ' ') AS w FROM d1),
       sh AS (
         SELECT doc_id,
                unnest(list_transform(range(1, greatest(len(w) - 1, 1)),
                       i -> w[i] || ' ' || w[i + 1] || ' ' || w[i + 2])) AS shingle
         FROM words),
       sigs AS (
         SELECT doc_id,
                MIN(md5('0|' || shingle)) AS sig_0, MIN(md5('1|' || shingle)) AS sig_1,
                MIN(md5('2|' || shingle)) AS sig_2, MIN(md5('3|' || shingle)) AS sig_3,
                MIN(md5('4|' || shingle)) AS sig_4, MIN(md5('5|' || shingle)) AS sig_5,
                MIN(md5('6|' || shingle)) AS sig_6, MIN(md5('7|' || shingle)) AS sig_7
         FROM sh GROUP BY doc_id),
       banded AS (
         SELECT doc_id, band FROM (
           SELECT doc_id,
                  ['0|' || sig_0 || '|' || sig_1, '1|' || sig_2 || '|' || sig_3,
                   '2|' || sig_4 || '|' || sig_5, '3|' || sig_6 || '|' || sig_7] AS bands
           FROM sigs), UNNEST(bands) AS u(band)),
       pairs AS (
         SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
         FROM banded a JOIN banded b ON a.band = b.band AND a.doc_id < b.doc_id),
       cedges AS (
         SELECT doc_a AS src, doc_b AS dst FROM pairs
         UNION SELECT doc_b AS src, doc_a AS dst FROM pairs),
       verts AS (SELECT DISTINCT src AS id FROM cedges),
       walk(id, comp) AS (
         SELECT id, id FROM verts
         UNION
         SELECT e.dst, w.comp FROM walk w JOIN cedges e ON e.src = w.id),
       comp AS (SELECT id AS doc_id, MIN(comp) AS component FROM walk GROUP BY id)
       SELECT d1.doc_id FROM d1 LEFT JOIN comp USING (doc_id)
       WHERE comp.component IS NULL OR comp.component = d1.doc_id""",
)
def dedup_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K1+K2 end-to-end corpus dedup — what a user actually runs: exact
    dedup (content-hash keep-first) → MinHash LSH candidate pairs over the
    survivors → connected components → keep only cluster canonicals.
    Output = surviving doc_ids. Every stage is the oracle-checked operator
    it composes (dedup_exact, dedup_minhash, dedup_components)."""
    from varda_spark.operators.dedup import (
        connected_components,
        dedup_exact,
        minhash_candidates,
    )

    d = read_table(spark, sf_dir, "documents")
    # s1 feeds BOTH the pair generation and the final anti-join — compute
    # the exact-dedup window once, not twice
    s1 = dedup_exact(d).localCheckpoint()
    pairs = minhash_candidates(s1, num_hashes=8, bands=4, shingle_n=3)
    cc = connected_components(pairs)
    losers = cc.filter(F.col("id") != F.col("comp")).select(F.col("id").alias("doc_id"))
    return s1.join(losers, "doc_id", "left_anti").select("doc_id")


@q(
    "join_nearest",
    """WITH pts AS (
         SELECT CAST(p_partkey % 5 AS VARCHAR) AS chromosome,
                CAST(p_partkey * 31 + 1 AS BIGINT) AS position,
                p_partkey
         FROM part),
       ivs AS (
         SELECT CAST(s_suppkey % 5 AS VARCHAR) AS chromosome,
                CAST(s_suppkey * 97 + 1 AS BIGINT) AS begin,
                CAST(s_suppkey * 97 + 1 + 200 + (s_suppkey % 7) * 500 AS BIGINT) AS "end",
                s_suppkey AS sample_key
         FROM supplier),
       cand AS (
         SELECT p.chromosome, p.position, p.p_partkey, i.sample_key,
                GREATEST(i.begin - p.position, p.position - i."end", 0) AS distance
         FROM pts p JOIN ivs i USING (chromosome))
       SELECT chromosome, position, p_partkey,
              CAST(sample_key AS BIGINT) AS nearest_key,
              CAST(distance AS BIGINT) AS distance
       FROM (
         SELECT *, ROW_NUMBER() OVER (PARTITION BY chromosome, position, p_partkey
                                      ORDER BY distance, sample_key) AS rn
         FROM cand) WHERE rn = 1""",
)
def join_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C1+ bedtools-closest: nearest interval per point via the two-sided
    sorted sweep (operators/interval.py nearest_interval) — one chromosome
    shuffle + two windows, NO pair join; the oracle is the brute-force
    theta-join nearest it provably equals."""
    from varda_spark.operators.interval import nearest_interval

    p, s = _points_intervals(spark, sf_dir)
    return nearest_interval(p, s)


@q(
    "agg_coverage",
    """WITH ivs AS (
         SELECT CAST(s_suppkey % 5 AS VARCHAR) AS chromosome,
                CAST(s_suppkey * 97 + 1 AS BIGINT) AS begin,
                CAST(s_suppkey * 97 + 1 + 200 + (s_suppkey % 7) * 500 AS BIGINT) AS "end"
         FROM supplier)
       , tiles AS (
         SELECT chromosome,
                unnest(range(begin // 1000, "end" // 1000 + 1)) AS tile
         FROM ivs)
       SELECT chromosome, CAST(tile AS BIGINT) AS tile,
              CAST(COUNT(*) AS BIGINT) AS depth
       FROM tiles GROUP BY chromosome, tile""",
)
def agg_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Genome-coverage rollup (bedtools genomecov at tile granularity):
    each interval explodes to its covered 1 kb tiles, then a plain
    count per (chromosome, tile). Tile fan-out is interval_length/1000 —
    bounded — and the aggregate combines map-side; the 100 TB shape for
    depth tracks."""
    _, s = _points_intervals(spark, sf_dir)
    tiles = s.select(
        "chromosome",
        F.explode(
            F.sequence(F.floor(F.col("begin") / 1000), F.floor(F.col("end") / 1000))
        ).alias("tile"),
    )
    return tiles.groupBy("chromosome", F.col("tile").cast("bigint").alias("tile")).agg(
        F.count(F.lit(1)).cast("bigint").alias("depth")
    )


@q(
    "pack_sequences",
    """WITH RECURSIVE counted AS (
         SELECT doc_id,
                CASE WHEN text IS NULL OR trim(text) = '' THEN 0
                     ELSE len(regexp_split_to_array(trim(text), '\\s+'))
                END AS n_tokens,
                CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)
                     AS BIGINT) % 16 AS shard
         FROM documents),
       ordered AS (
         SELECT *, ROW_NUMBER() OVER (PARTITION BY shard ORDER BY doc_id) AS i
         FROM counted),
       walk(shard, i, doc_id, n_tokens, bin_id, fill) AS (
         SELECT shard, i, doc_id, n_tokens, 0, n_tokens
         FROM ordered WHERE i = 1
         UNION ALL
         SELECT o.shard, o.i, o.doc_id, o.n_tokens,
                CASE WHEN w.fill > 0 AND w.fill + o.n_tokens > 512
                     THEN w.bin_id + 1 ELSE w.bin_id END,
                CASE WHEN w.fill > 0 AND w.fill + o.n_tokens > 512
                     THEN o.n_tokens ELSE w.fill + o.n_tokens END
         FROM walk w JOIN ordered o ON o.shard = w.shard AND o.i = w.i + 1)
       SELECT CAST(shard AS BIGINT) AS shard, CAST(bin_id AS BIGINT) AS bin_id,
              doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
              n_tokens > 512 AS overflow
       FROM walk""",
)
def pack_sequences_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K+ training-shard packing (operators/packing.py): hash-bucketed
    shards, greedy next-fit bins of ≤512 tokens per shard. Invariants
    (every doc once, bin sums bounded, determinism) are pytest-proven;
    the oracle replays the EXACT sequential next-fit per shard as a
    DuckDB recursive CTE (one recursion step per doc in doc_id order,
    all shards advancing in parallel), upgrading this key from
    rows-only to a full value-hash check — the per-shard greedy state
    that Spark carries in applyInPandas is small enough that SQL
    recursion expresses it directly."""
    from varda_spark.operators.packing import pack_sequences

    d = read_table(spark, sf_dir, "documents")
    return pack_sequences(d, max_tokens=512, n_shards=16)


@q(
    "win_range_frame",
    """SELECT user_id, event_id, ts,
              CAST(COUNT(*) OVER (PARTITION BY user_id ORDER BY ts
                   RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
                   AS BIGINT) AS n_last_hour
       FROM events""",
)
def win_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E+: time-RANGE window frame — events per user in the trailing hour,
    inclusive bounds on event time (not row count). Spark side ranges over
    unix_micros; identical to the INTERVAL frame the oracle runs."""
    ev = read_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros(F.col("ts")))
        .rangeBetween(-3600 * 1000000, 0)
    )
    return ev.select(
        "user_id", "event_id", "ts", F.count(F.lit(1)).over(w).cast("bigint").alias("n_last_hour")
    )


@q(
    "bit_funcs",
    """SELECT event_id,
              CAST(event_id & 255 AS BIGINT) AS low_byte,
              CAST(event_id | 15 AS BIGINT) AS or15,
              CAST(xor(event_id, 12345) AS BIGINT) AS xored,
              CAST(bit_count(event_id) AS BIGINT) AS popcount,
              CAST(event_id << 2 AS BIGINT) AS shl2,
              CAST(event_id >> 3 AS BIGINT) AS shr3
       FROM events WHERE event_id < 5000""",
)
def bit_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H+: bitwise function breadth (and/or/xor/popcount/shifts) — the
    primitives the SimHash/LSH family builds on, exposed as a surface."""
    ev = read_table(spark, sf_dir, "events").filter(F.col("event_id") < 5000)
    e = F.col("event_id")
    return ev.select(
        "event_id",
        e.bitwiseAND(F.lit(255)).cast("bigint").alias("low_byte"),
        e.bitwiseOR(F.lit(15)).cast("bigint").alias("or15"),
        e.bitwiseXOR(F.lit(12345)).cast("bigint").alias("xored"),
        F.bit_count(e).cast("bigint").alias("popcount"),
        F.shiftleft(e, 2).cast("bigint").alias("shl2"),
        F.shiftright(e, 3).cast("bigint").alias("shr3"),
    )


@q(
    "multimodal_audio",
    """WITH mm AS (
         SELECT doc_id AS item_id, text, length(text) AS n_bytes
         FROM documents WHERE doc_id % 3 = 1),
       idx AS (
         SELECT item_id, text, n_bytes,
                unnest(range(0, CAST(ceil(n_bytes / 32.0) AS BIGINT))) AS chunk_idx
         FROM mm)
       SELECT item_id, CAST(chunk_idx AS BIGINT) AS chunk_idx,
              CAST(chunk_idx * 32 AS BIGINT) AS offset,
              CAST(least(32, n_bytes - chunk_idx * 32) AS BIGINT) AS chunk_len,
              substring(text, CAST(chunk_idx * 32 + 1 AS INT), 32) AS chunk_text
       FROM idx""",
)
def multimodal_audio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K5 audio segmentation (sources/multimodal.py chunk_audio): payloads
    synthesized from document text (mime audio/wav ⇔ doc_id%3==1), split
    into 32-byte chunks entirely map-side. The oracle re-chunks the same
    text with VARCHAR math — byte == char for this ASCII corpus."""
    from varda_spark.sources.multimodal import chunk_audio, synthesize_blobs

    d = read_table(spark, sf_dir, "documents")
    return chunk_audio(synthesize_blobs(d), chunk_bytes=32)


@q(
    "win_fill_forward",
    """SELECT user_id, event_id, ts,
              last_value(v IGNORE NULLS) OVER (
                  PARTITION BY user_id ORDER BY ts, event_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled
       FROM (
         SELECT user_id, event_id, ts,
                CASE WHEN event_id % 5 = 0 THEN NULL ELSE value END AS v
         FROM events)""",
)
def win_fill_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E+ gap-fill: forward-fill the last non-null reading per user
    (telemetry backfill): last(ignorenulls) over an ordered running frame.
    Values pass through unchanged — no float arithmetic, exact."""
    ev = read_table(spark, sf_dir, "events")
    v = F.when(F.col("event_id") % 5 == 0, F.lit(None)).otherwise(F.col("value"))
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return ev.withColumn("v", v).select(
        "user_id", "event_id", "ts", F.last("v", ignorenulls=True).over(w).alias("filled")
    )


@q(
    "agg_stats",
    """WITH b AS (
         SELECT l_returnflag,
                CAST(floor(l_quantity * 100) AS BIGINT) AS x,
                CAST(floor(l_extendedprice) AS BIGINT) AS y
         FROM lineitem),
       s AS (
         SELECT l_returnflag,
                CAST(COUNT(*) AS DOUBLE) AS n,
                CAST(SUM(x) AS DOUBLE) AS sx, CAST(SUM(y) AS DOUBLE) AS sy,
                CAST(SUM(x * x) AS DOUBLE) AS sxx, CAST(SUM(y * y) AS DOUBLE) AS syy,
                CAST(SUM(x * y) AS DOUBLE) AS sxy
         FROM b GROUP BY l_returnflag)
       SELECT l_returnflag,
              (n * sxy - sx * sy) / (n * n) AS covar_pop,
              (n * sxy - sx * sy)
                  / (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy)) AS corr,
              sqrt(n * sxx - sx * sx) / n AS stddev_x,
              sqrt(n * syy - sy * sy) / n AS stddev_y
       FROM s""",
)
def agg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D+ second-moment statistics (covar_pop/corr/stddev_pop) WITHOUT the
    engine's order-sensitive float accumulators: all moments are exact
    integer sums (decimal interior — mergeable, partition-order-free), and
    the final formula is the same short double expression in both engines
    → bit-identical. The pattern scales: moments combine map-side."""
    li = read_table(spark, sf_dir, "lineitem")
    b = li.select(
        "l_returnflag",
        F.floor(F.col("l_quantity") * 100).cast("decimal(19,0)").alias("x"),
        F.floor(F.col("l_extendedprice")).cast("decimal(19,0)").alias("y"),
    )
    s = b.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum("x").cast("double").alias("sx"),
        F.sum("y").cast("double").alias("sy"),
        F.sum(F.col("x") * F.col("x")).cast("double").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast("double").alias("syy"),
        F.sum(F.col("x") * F.col("y")).cast("double").alias("sxy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxx, syy, sxy = F.col("sxx"), F.col("syy"), F.col("sxy")
    return s.select(
        "l_returnflag",
        ((n * sxy - sx * sy) / (n * n)).alias("covar_pop"),
        ((n * sxy - sx * sy) / (F.sqrt(n * sxx - sx * sx) * F.sqrt(n * syy - sy * sy))).alias(
            "corr"
        ),
        (F.sqrt(n * sxx - sx * sx) / n).alias("stddev_x"),
        (F.sqrt(n * syy - sy * sy) / n).alias("stddev_y"),
    )


@q(
    "agg_histogram",
    """SELECT CAST(floor(CAST(l_extendedprice AS DOUBLE) / 5000) * 5000 AS BIGINT) AS bucket_lo,
              CAST(COUNT(*) AS BIGINT) AS n,
              CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS qty_in_bucket
       FROM lineitem GROUP BY 1""",
)
def agg_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D+ fixed-width histogram: floor-bucket + count/sum — the exact
    map-side-combining shape dashboards need at 100 TB (contrast
    width_bucket UDAFs that ship value lists)."""
    li = read_table(spark, sf_dir, "lineitem")
    bucket = (F.floor(F.col("l_extendedprice").cast("double") / 5000) * 5000).cast("bigint")
    return li.groupBy(bucket.alias("bucket_lo")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        dsum("l_quantity").alias("qty_in_bucket"),
    )


@q(
    "text_pii_scrub",
    r"""SELECT doc_id,
               regexp_replace(
                 regexp_replace(
                   regexp_replace(text,
                     '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
                   '\b[0-9]{3}-[0-9]{3}-[0-9]{4}\b', '<PHONE>', 'g'),
                 '\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b', '<IP>', 'g') AS scrubbed,
               CAST(length(text)
                    - length(regexp_replace(text,
                        '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '', 'g'))
                    AS BIGINT) AS email_chars
        FROM documents WHERE doc_id < 200""",
)
def text_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K4 PII scrubbing (the CommonCrawl-pipeline masking step): email /
    phone / IPv4 patterns replaced map-side with regexp_replace — Spark's
    is global by default, the oracle passes the 'g' flag. Pure codegen'd
    Column work, no shuffle at any scale."""
    d = read_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    email = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
    phone = r"\b[0-9]{3}-[0-9]{3}-[0-9]{4}\b"
    ip = r"\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b"
    scrubbed = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(F.col("text"), email, "<EMAIL>"), phone, "<PHONE>"
        ),
        ip,
        "<IP>",
    )
    return d.select(
        "doc_id",
        scrubbed.alias("scrubbed"),
        (F.length("text") - F.length(F.regexp_replace(F.col("text"), email, ""))).cast(
            "bigint"
        ).alias("email_chars"),
    )


@q(
    "text_decontaminate",
    """WITH bench AS (
         SELECT DISTINCT unnest(list_transform(
                  range(1, greatest(len(string_split(text, ' ')) - 5, 1)),
                  i -> array_to_string(string_split(text, ' ')[i:i+6], ' '))) AS gram
         FROM documents WHERE doc_id % 97 = 0),
       doc_grams AS (
         SELECT doc_id, unnest(list_transform(
                  range(1, greatest(len(string_split(text, ' ')) - 5, 1)),
                  i -> array_to_string(string_split(text, ' ')[i:i+6], ' '))) AS gram
         FROM documents),
       hits AS (
         SELECT doc_id, CAST(COUNT(DISTINCT d.gram) AS BIGINT) AS n_hits
         FROM doc_grams d JOIN bench USING (gram)
         GROUP BY doc_id)
       SELECT doc_id, n_hits FROM hits WHERE n_hits >= 3""",
)
def text_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K4 eval decontamination: flag corpus docs sharing ≥3 distinct
    7-grams with a benchmark set (here: every 97th doc stands in for the
    eval corpus). Inverted-index equi-join on the gram — the benchmark
    side is tiny and broadcast; the corpus side explodes map-side. The
    GPT-3/Llama-style contamination filter, shuffle-bounded at 100 TB."""
    d = read_table(spark, sf_dir, "documents")
    w = F.split(F.col("text"), " ")
    grams = F.expr(
        "transform(sequence(1, greatest(size(split(text, ' ')) - 6, 0)), "
        "i -> array_join(slice(split(text, ' '), i, 7), ' '))"
    )
    bench = (
        d.filter(F.col("doc_id") % 97 == 0)
        .select(F.explode(grams).alias("gram"))
        .distinct()
    )
    doc_grams = d.select("doc_id", F.explode(grams).alias("gram"))
    return (
        doc_grams.join(F.broadcast(bench), "gram")
        .groupBy("doc_id")
        .agg(F.count_distinct("gram").cast("bigint").alias("n_hits"))
        .filter(F.col("n_hits") >= 3)
    )


@q(
    "dedup_keep_best",
    """WITH scored AS (
         SELECT doc_id, text, md5(lower(trim(text))) AS h,
                CAST(len(list_distinct(string_split(trim(text), ' '))) AS BIGINT) AS quality
         FROM documents)
       SELECT doc_id, quality FROM (
         SELECT doc_id, quality,
                ROW_NUMBER() OVER (PARTITION BY h
                                   ORDER BY quality DESC, doc_id) AS rn
         FROM scored) WHERE rn = 1""",
)
def dedup_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K1 quality-aware survivor selection: within an exact-dup cluster
    keep the HIGHEST-quality copy (distinct-word count as the stand-in
    score), not the lowest id — what production dedup actually wants when
    copies differ in extraction quality. Same single hash-shuffle shape
    as dedup_exact."""
    d = read_table(spark, sf_dir, "documents")
    quality = F.size(F.array_distinct(F.split(F.trim(F.col("text")), " "))).cast("bigint")
    h = F.md5(F.lower(F.trim(F.col("text"))))
    scored = d.select("doc_id", h.alias("_h"), quality.alias("quality"))
    w = Window.partitionBy("_h").orderBy(F.col("quality").desc(), F.col("doc_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("doc_id", "quality")
    )


@q(
    "agg_salted",
    """SELECT l_returnflag,
              CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty
       FROM lineitem GROUP BY l_returnflag""",
)
def agg_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D+ skew pattern: two-stage salted aggregation (operators/skew.py
    salted_agg) — a hot key spreads over 16 (key, salt) reducers before the
    tiny final combine. The oracle is the PLAIN grouped sum: decimal sums
    are associative, so the salted plan must be bit-identical — which is
    the entire point of the pattern."""
    from varda_spark.operators.skew import salted_agg

    li = read_table(spark, sf_dir, "lineitem").select(
        "l_returnflag", dec("l_quantity").alias("qty")
    )
    out = salted_agg(li, ["l_returnflag"], "qty", n_salts=16)
    return out.select("l_returnflag", F.col("sum_qty").cast("double").alias("sum_qty"))


@q("udtf_sentences", None)  # UDTF surface demo; SQL twin checked in pytest
def udtf_sentences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J+ Python UDTF (Spark 4 table function): one input doc → N output
    sentence rows with ordinals. The lateral-join surface the reference's
    per-record decompose loops map to when logic outgrows Columns; Arrow
    handles the batching. Kept rows-only: the same split is SQL-expressible
    (pytest proves equivalence), the key exercises the UDTF machinery."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="doc_id: bigint, sent_idx: bigint, sentence: string", useArrow=True)
    class SplitSentences:
        def eval(self, doc_id: int, text: str):
            for i, s in enumerate(t.strip() for t in (text or "").split(".")):
                if s:
                    yield doc_id, i, s

    spark.udtf.register("split_sentences", SplitSentences)
    d = read_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    d.createOrReplaceTempView("_docs_udtf")
    return spark.sql(
        "SELECT s.doc_id, s.sent_idx, s.sentence "
        "FROM _docs_udtf, LATERAL split_sentences(doc_id, text) s"
    )


@q(
    "rollup_incremental",
    """WITH obs AS (
         SELECT l_suppkey AS sample_id,
                CAST(l_partkey % 5 AS VARCHAR) AS chromosome,
                CAST(l_partkey * 31 + 1 AS BIGINT) AS position,
                1 + l_linenumber % 2 AS support
         FROM lineitem)
       SELECT chromosome, CAST(position // 1000 AS BIGINT) AS tile,
              CAST(SUM(support) AS BIGINT) AS support_sum,
              CAST(COUNT(*) AS BIGINT) AS n_obs
       FROM obs GROUP BY chromosome, position // 1000""",
)
def rollup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style continuous aggregate (operators/merge.py
    merge_rollups): the per-(chromosome, 1kb-tile) support rollup is built
    from TWO independent batch rollups (orderkey parity split) merged by
    summing partials — and the oracle is the single-pass rollup over
    everything, which the merge must equal exactly. The refresh path a
    100 TB observation warehouse needs: aggregate the delta, merge
    partials, never re-scan history."""
    from varda_spark.operators.merge import merge_rollups

    _, _, observations = _genomic_trio(spark, sf_dir)
    obs = observations.withColumn("tile", (F.col("position") / 1000).cast("bigint"))

    def batch_rollup(b):
        return b.groupBy("chromosome", "tile").agg(
            F.sum("support").alias("support_sum"),
            F.count(F.lit(1)).alias("n_obs"),
        )

    # two "import batches": the deterministic parity split of the fact rows
    old = batch_rollup(obs.filter(F.crc32(F.concat_ws("|", "sample_id", "position")) % 2 == 0))
    new = batch_rollup(obs.filter(F.crc32(F.concat_ws("|", "sample_id", "position")) % 2 == 1))
    merged = merge_rollups([old, new], ["chromosome", "tile"], ["support_sum", "n_obs"])
    return merged.select(
        "chromosome",
        "tile",
        F.col("support_sum").cast("bigint").alias("support_sum"),
        F.col("n_obs").cast("bigint").alias("n_obs"),
    )


@q(
    "sample_per_group",
    """SELECT event_type, event_id FROM (
         SELECT event_type, event_id,
                ROW_NUMBER() OVER (PARTITION BY event_type
                                   ORDER BY md5(CAST(event_id AS VARCHAR)), event_id) AS rn
         FROM events) WHERE rn <= 20""",
)
def sample_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-count deterministic sample per group: hash-ordered row_number
    gives every group exactly n pseudo-random rows, reproducible across
    engines, runs, and partitionings (unlike rand()-based sampleBy).
    The eval-set / debugging-slice primitive for a 100 TB corpus."""
    ev = read_table(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy(
        F.md5(F.col("event_id").cast("string")), F.col("event_id")
    )
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 20)
        .select("event_type", "event_id")
    )


def _zorder_exprs():
    """Morton (Z-order) interleave of two 16-bit dimensions via the classic
    bit-spread ladder, generated once for both engines (only the shift
    syntax differs: Spark shiftleft(), DuckDB <<)."""

    def spread(col, shl):
        x = f"({col} & 65535)"
        for n, m in ((8, 16711935), (4, 252645135), (2, 858993459), (1, 1431655765)):
            x = f"(({x} | {shl(x, n)}) & {m})"
        return x

    def z(xc, yc, shl):
        return f"({shl(spread(xc, shl), 1)} | {spread(yc, shl)})"

    spark_shl = lambda x, n: f"shiftleft({x}, {n})"  # noqa: E731
    duck_shl = lambda x, n: f"({x} << {n})"  # noqa: E731
    xc, yc = "(p_partkey * 31 + 1)", "p_partkey"
    return z(xc, yc, spark_shl), z(xc, yc, duck_shl)


_Z_SPARK, _Z_DUCK = _zorder_exprs()


@q(
    "sort_zorder",
    f"""SELECT p_partkey, CAST({_Z_DUCK} AS BIGINT) AS zorder
        FROM part ORDER BY zorder, p_partkey LIMIT 200""",
)
def sort_zorder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F+ data-layout primitive: Morton/Z-order key over two dimensions
    (position × part key). Writing a warehouse sorted by this key keeps
    rows close in BOTH dimensions within each parquet row group, so
    min/max skipping prunes 2-D predicates — the Delta/Iceberg OPTIMIZE
    ZORDER trick as a plain sortable column; pure codegen'd bit math."""
    p = read_table(spark, sf_dir, "part")
    return (
        p.select("p_partkey", F.expr(_Z_SPARK).cast("bigint").alias("zorder"))
        .orderBy("zorder", "p_partkey")
        .limit(200)
    )


@q(
    "join_band",
    """SELECT o.o_orderkey, c.c_custkey
       FROM orders o JOIN customer c
         ON abs(CAST(o.o_totalprice AS DOUBLE) - CAST(c.c_acctbal AS DOUBLE) * 20) <= 50
       WHERE o.o_orderkey < 2000""",
)
def join_band(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C6+ band join WITHOUT a nested loop: |x - y| <= δ becomes an
    equi-join on floor(x/δ) against each side's three candidate buckets
    (b-1, b, b+1) plus the exact residual predicate — the same rewrite
    the UCSC binning does for intervals, applied to a numeric band. The
    oracle is the plain theta join; at 100 TB the theta version is a
    broadcast nested loop at best, this shuffles on an even bucket key."""
    o = read_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 2000).select(
        "o_orderkey", F.col("o_totalprice").cast("double").alias("x")
    )
    c = read_table(spark, sf_dir, "customer").select(
        "c_custkey", (F.col("c_acctbal").cast("double") * 20).alias("y")
    )
    delta = 50.0
    ob = o.withColumn("_b", F.explode(F.array(
        F.floor(F.col("x") / delta) - 1, F.floor(F.col("x") / delta), F.floor(F.col("x") / delta) + 1
    )))
    cb = c.withColumn("_b", F.floor(F.col("y") / delta))
    return (
        ob.join(cb, "_b")
        .filter(F.abs(F.col("x") - F.col("y")) <= delta)
        .select("o_orderkey", "c_custkey")
    )


@q(
    "agg_gsets",
    """SELECT o_orderpriority, o_orderstatus,
              CAST(COUNT(*) AS BIGINT) AS n,
              CAST(GROUPING(o_orderpriority) * 2 + GROUPING(o_orderstatus) AS BIGINT) AS gid
       FROM orders
       GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus), ())""",
)
def agg_gsets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D6+ arbitrary GROUPING SETS (not just rollup/cube prefixes) with
    grouping_id disambiguation of the NULL-vs-missing ambiguity."""
    o = read_table(spark, sf_dir, "orders")
    o.createOrReplaceTempView("_orders_gs")
    return spark.sql(
        """SELECT o_orderpriority, o_orderstatus,
                  CAST(COUNT(*) AS BIGINT) AS n,
                  CAST(GROUPING(o_orderpriority) * 2 + GROUPING(o_orderstatus) AS BIGINT) AS gid
           FROM _orders_gs
           GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus), ())"""
    )


@q(
    "win_gaps",
    """WITH s AS (
         SELECT user_id, event_id,
                LEAD(event_id) OVER (PARTITION BY user_id ORDER BY event_id) AS nxt
         FROM events)
       SELECT user_id,
              CAST(event_id + 1 AS BIGINT) AS gap_start,
              CAST(nxt - 1 AS BIGINT) AS gap_end,
              CAST(nxt - event_id - 1 AS BIGINT) AS gap_len
       FROM s WHERE nxt - event_id > 1""",
)
def win_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E+ sequence-gap detection (missing ids per user): one lead() pass
    emits each hole as a range — the integrity check an event warehouse
    runs after every ingest; no self-join, no explode of the id space."""
    ev = read_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("event_id")
    s = ev.select("user_id", "event_id", F.lead("event_id").over(w).alias("nxt"))
    return s.filter(F.col("nxt") - F.col("event_id") > 1).select(
        "user_id",
        (F.col("event_id") + 1).cast("bigint").alias("gap_start"),
        (F.col("nxt") - 1).cast("bigint").alias("gap_end"),
        (F.col("nxt") - F.col("event_id") - 1).cast("bigint").alias("gap_len"),
    )


@q(
    "join_recip_overlap",
    """WITH a AS (
         SELECT CAST(s_suppkey % 5 AS VARCHAR) AS chromosome,
                CAST(s_suppkey * 97 + 1 AS BIGINT) AS begin,
                CAST(s_suppkey * 97 + 1 + 200 + (s_suppkey % 7) * 500 AS BIGINT) AS "end",
                s_suppkey AS a_key
         FROM supplier WHERE s_suppkey % 2 = 0),
       b AS (
         SELECT CAST(s_suppkey % 5 AS VARCHAR) AS chromosome,
                CAST(s_suppkey * 97 + 1 AS BIGINT) AS begin,
                CAST(s_suppkey * 97 + 1 + 200 + (s_suppkey % 7) * 500 AS BIGINT) AS "end",
                s_suppkey AS b_key
         FROM supplier WHERE s_suppkey % 2 = 1)
       SELECT a_key, b_key,
              CAST(least(a."end", b."end") - greatest(a.begin, b.begin) + 1 AS BIGINT) AS ov_len
       FROM a JOIN b ON a.chromosome = b.chromosome
          AND a.begin <= b."end" AND a."end" >= b.begin
       WHERE (least(a."end", b."end") - greatest(a.begin, b.begin) + 1) * 2
                >= (a."end" - a.begin + 1)
         AND (least(a."end", b."end") - greatest(a.begin, b.begin) + 1) * 2
                >= (b."end" - b.begin + 1)""",
)
def join_recip_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C1+ reciprocal-overlap join (bedtools intersect -f 0.5 -r, the SV
    variant-matching criterion): intervals pair iff the overlap covers
    ≥50% of BOTH. Candidates come from the binned range_overlap_join —
    never a theta join — with the fraction test as an exact integer
    residual (overlap*2 >= length avoids any division)."""
    from varda_spark.operators.interval import range_overlap_join

    _, s = _points_intervals(spark, sf_dir)
    a = s.filter(F.col("sample_key") % 2 == 0).select(
        "chromosome", "begin", "end", F.col("sample_key").alias("a_key")
    )
    b = s.filter(F.col("sample_key") % 2 == 1).select(
        "chromosome", "begin", "end", F.col("sample_key").alias("b_key")
    )
    j = range_overlap_join(a, b)
    ov = F.least(F.col("end"), F.col("r_end")) - F.greatest(F.col("begin"), F.col("r_begin")) + 1
    return (
        j.withColumn("ov_len", ov)
        .filter(
            (F.col("ov_len") * 2 >= F.col("end") - F.col("begin") + 1)
            & (F.col("ov_len") * 2 >= F.col("r_end") - F.col("r_begin") + 1)
        )
        .select("a_key", "b_key", F.col("ov_len").cast("bigint").alias("ov_len"))
    )


@q(
    "str_funcs2",
    """SELECT c_custkey,
              split_part(c_name, '#', 2) AS name_num,
              lpad(CAST(c_custkey AS VARCHAR), 10, '0') AS padded,
              translate(c_mktsegment, 'AEIOU', 'aeiou') AS deaccented,
              repeat('ab', 3) AS repeated,
              reverse(c_mktsegment) AS revd,
              upper(substring(lower(c_mktsegment), 1, 1))
                  || substring(lower(c_mktsegment), 2) AS capped
       FROM customer WHERE c_custkey < 500""",
)
def str_funcs2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H8 breadth II: split_part / lpad / translate / repeat / reverse +
    a capitalization built from the shared primitives (initcap's word
    handling differs across engines; composing upper+substring is
    portable and proves the same surface)."""
    c = read_table(spark, sf_dir, "customer").filter(F.col("c_custkey") < 500)
    low = F.lower(F.col("c_mktsegment"))
    return c.select(
        "c_custkey",
        F.split_part(F.col("c_name"), F.lit("#"), F.lit(2)).alias("name_num"),
        F.lpad(F.col("c_custkey").cast("string"), 10, "0").alias("padded"),
        F.translate(F.col("c_mktsegment"), "AEIOU", "aeiou").alias("deaccented"),
        F.repeat(F.lit("ab"), 3).alias("repeated"),
        F.reverse(F.col("c_mktsegment")).alias("revd"),
        F.concat(F.upper(F.substring(low, 1, 1)), F.expr("substring(lower(c_mktsegment), 2)")).alias(
            "capped"
        ),
    )


@q(
    "win_first_last",
    """SELECT user_id, event_id,
              first_value(event_type) OVER w AS first_type,
              last_value(event_type) OVER w AS last_type,
              nth_value(event_type, 2) OVER w AS second_type
       FROM events
       WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)""",
)
def win_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E+ frame navigation: first/last/nth event type per user over the
    full-partition frame (session entry/exit/second-touch attribution)."""
    ev = read_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return ev.select(
        "user_id",
        "event_id",
        F.first("event_type").over(w).alias("first_type"),
        F.last("event_type").over(w).alias("last_type"),
        F.nth_value("event_type", 2).over(w).alias("second_type"),
    )


@q(
    "date_spine",
    """WITH bounds AS (
         SELECT user_id, CAST(MIN(ts) AS DATE) AS d0, CAST(MAX(ts) AS DATE) AS d1
         FROM events GROUP BY user_id),
       spine AS (
         SELECT user_id, d0 + CAST(g AS INTEGER) AS day
         FROM (SELECT user_id, d0,
                      unnest(range(0, date_diff('day', d0, d1) + 1)) AS g
               FROM bounds)),
       actual AS (
         SELECT user_id, CAST(ts AS DATE) AS day, CAST(COUNT(*) AS BIGINT) AS n
         FROM events GROUP BY user_id, CAST(ts AS DATE))
       SELECT s.user_id, s.day, CAST(COALESCE(a.n, 0) AS BIGINT) AS n_events
       FROM spine s LEFT JOIN actual a ON a.user_id = s.user_id AND a.day = s.day
       WHERE s.user_id < 50""",
)
def date_spine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Densification: generate each user's full day spine between first and
    last event and left-join actual counts — zero-filled gaps make
    time-series windows honest (a rolling average over missing days must
    see 0, not skip). sequence() explodes map-side; the spine is bounded
    by the date range, never by the fact count."""
    ev = read_table(spark, sf_dir, "events").filter(F.col("user_id") < 50)
    bounds = ev.groupBy("user_id").agg(
        F.min(F.to_date("ts")).alias("d0"), F.max(F.to_date("ts")).alias("d1")
    )
    spine = bounds.select(
        "user_id", F.explode(F.sequence(F.col("d0"), F.col("d1"))).alias("day")
    )
    actual = ev.groupBy("user_id", F.to_date("ts").alias("day")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    return spine.join(actual, ["user_id", "day"], "left").select(
        "user_id", "day", F.coalesce(F.col("n"), F.lit(0)).cast("bigint").alias("n_events")
    )


@q(
    "text_lm_score",
    """WITH words AS (
         SELECT doc_id, string_split(trim(text), ' ') AS w FROM documents),
       bg AS (
         SELECT doc_id,
                unnest(list_transform(range(1, greatest(len(w), 1)),
                       i -> w[i] || ' ' || w[i + 1])) AS bigram
         FROM words),
       counts AS (
         SELECT bigram, COUNT(*) AS c FROM bg GROUP BY bigram),
       scored AS (
         SELECT b.doc_id,
                CAST(SUM(length(printf('%b', c)) - 1) AS BIGINT) AS logsum,
                CAST(COUNT(*) AS BIGINT) AS n_bigrams
         FROM bg b JOIN counts USING (bigram)
         GROUP BY b.doc_id)
       SELECT doc_id, logsum, n_bigrams,
              CAST(logsum AS DOUBLE) / CAST(n_bigrams AS DOUBLE) AS avg_log2_freq
       FROM scored""",
)
def text_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K4 corpus-LM quality score (the CCNet idea without an external
    model): how 'ordinary' is a document under the corpus's own bigram
    distribution — avg over the doc's bigrams of floor(log2(corpus count)).
    Boilerplate/templated docs score high, lorem-noise scores low.
    floor(log2 n) is computed EXACTLY as length(bin(n))-1 (no float log —
    libm rounding differs across engines), so everything until the final
    single divide is integer. Two shuffles: bigram count, doc re-join —
    both map-side-combining; the count table is the corpus LM."""
    d = read_table(spark, sf_dir, "documents")
    # NB sequence() is inclusive AND descends when stop < start (sequence(1,0)
    # = [1,0]) — gate the empty case explicitly instead of greatest()
    bigram = F.expr(
        "explode(CASE WHEN size(split(trim(text), ' ')) < 2 THEN array() "
        "ELSE transform(sequence(1, size(split(trim(text), ' ')) - 1), "
        "i -> concat_ws(' ', element_at(split(trim(text), ' '), i), "
        "element_at(split(trim(text), ' '), i + 1))) END)"
    )
    bg = d.select("doc_id", bigram.alias("bigram"))
    counts = bg.groupBy("bigram").agg(F.count(F.lit(1)).alias("c"))
    scored = (
        bg.join(counts, "bigram")
        .groupBy("doc_id")
        .agg(
            F.sum(F.length(F.bin(F.col("c"))) - 1).cast("bigint").alias("logsum"),
            F.count(F.lit(1)).cast("bigint").alias("n_bigrams"),
        )
    )
    return scored.select(
        "doc_id",
        "logsum",
        "n_bigrams",
        (F.col("logsum").cast("double") / F.col("n_bigrams").cast("double")).alias(
            "avg_log2_freq"
        ),
    )


@q(
    "text_domain_mix",
    """WITH t AS (
         SELECT doc_id, lang, string_split(trim(text), ' ') AS w FROM documents),
       scored AS (
         SELECT doc_id, lang, len(w) AS n_tokens,
                CASE WHEN len(w) < 20 THEN 'short'
                     WHEN len(w) < 60 THEN 'medium' ELSE 'long' END AS bucket
         FROM t)
       SELECT lang, bucket,
              CAST(COUNT(*) AS BIGINT) AS n_docs,
              CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
              CAST(floor(SUM(n_tokens) * 1000000.0 /
                   (SELECT SUM(len(string_split(trim(text), ' '))) FROM documents))
                   AS BIGINT) AS ppm_of_corpus
       FROM scored GROUP BY lang, bucket""",
)
def text_domain_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K4 data-mixture report: docs and tokens per (language, length
    bucket) with parts-per-million of the total token budget — the table
    every training-mix decision starts from. One scan + one tiny
    aggregate; the corpus-total is a 1-row broadcast."""
    d = read_table(spark, sf_dir, "documents")
    n = F.size(F.split(F.trim(F.col("text")), " "))
    scored = d.select(
        "lang",
        n.alias("n_tokens"),
        F.when(n < 20, "short").when(n < 60, "medium").otherwise("long").alias("bucket"),
    )
    total = scored.agg(F.sum("n_tokens").alias("_total"))
    mix = scored.groupBy("lang", "bucket").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("n_tokens").cast("bigint").alias("n_tokens"),
    )
    return mix.crossJoin(F.broadcast(total)).select(
        "lang", "bucket", "n_docs", "n_tokens",
        F.floor(F.col("n_tokens") * 1000000.0 / F.col("_total")).cast("bigint").alias(
            "ppm_of_corpus"
        ),
    )


@q(
    "dedup_cross_corpus",
    """WITH split AS (
         SELECT doc_id, text,
                CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT) % 10
                    AS fold
         FROM documents),
       train AS (SELECT doc_id, text FROM split WHERE fold <> 0),
       eval_fp AS (
         SELECT DISTINCT md5(lower(trim(text))) AS h FROM split WHERE fold = 0)
       SELECT t.doc_id FROM train t
       WHERE md5(lower(trim(t.text))) NOT IN (SELECT h FROM eval_fp)""",
)
def dedup_cross_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K1+ train/eval leakage removal: hash-fold the corpus into train and
    held-out, fingerprint the held-out side, ANTI-join train against it —
    don't train on (exact copies of) eval. The eval fingerprint set is tiny
    and broadcast; train never shuffles. Composes with text_decontaminate
    for the n-gram (partial-overlap) version."""
    d = read_table(spark, sf_dir, "documents")
    fold = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 15), 16, 10).cast("bigint")
        % 10
    )
    s = d.withColumn("_fold", fold)
    h = F.md5(F.lower(F.trim(F.col("text"))))
    train = s.filter(F.col("_fold") != 0).select("doc_id", h.alias("_h"))
    eval_fp = s.filter(F.col("_fold") == 0).select(h.alias("_h")).distinct()
    return train.join(F.broadcast(eval_fp), "_h", "left_anti").select("doc_id")


@q(
    "sim_range_search",
    """WITH q AS (
         SELECT vec_id, list_transform(embedding,
                    x -> CAST(floor(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS e
         FROM embeddings),
       probe AS (SELECT e AS pe FROM q WHERE vec_id = 0),
       scored AS (
         SELECT q.vec_id,
                (SELECT SUM(q.e[i.range] * probe.pe[i.range]) FROM range(1, 65) i) AS dq,
                (SELECT SUM(q.e[i.range] * q.e[i.range]) FROM range(1, 65) i) AS n2,
                (SELECT SUM(probe.pe[i.range] * probe.pe[i.range]) FROM range(1, 65) i) AS pn2
         FROM q CROSS JOIN probe WHERE q.vec_id <> 0)
       SELECT vec_id,
              CAST(floor(100.0 * dq / sqrt(CAST(n2 * pn2 AS DOUBLE))) AS BIGINT) AS cos_pct
       FROM scored
       WHERE dq > 0 AND floor(100.0 * dq / sqrt(CAST(n2 * pn2 AS DOUBLE))) >= 10
       ORDER BY cos_pct DESC, vec_id LIMIT 50""",
)
def sim_range_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K3 single-probe range search: all vectors within cosine ≥ 0.10 of a
    query vector (vec_id 0 stands in for a user embedding), top-50. The
    online-lookup path: the probe broadcasts, scoring is a pure map-side
    scan (no self-join of any kind), TakeOrderedAndProject returns the
    page — O(corpus scan) with no shuffle at any size."""
    from varda_spark.operators.similarity import qdot, quantized

    q_ = read_table(spark, sf_dir, "embeddings").select(
        "vec_id", quantized("embedding", 1000).alias("_q")
    )
    probe = q_.filter(F.col("vec_id") == 0).select(
        F.col("_q").alias("_pe")
    )
    scored = (
        q_.filter(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(probe))
        .withColumn("_dq", qdot("_q", "_pe"))
        .withColumn("_n2", qdot("_q", "_q"))
        .withColumn("_pn2", qdot("_pe", "_pe"))
    )
    cos_pct = F.floor(
        F.lit(100).cast("double") * F.col("_dq").cast("double")
        / F.sqrt((F.col("_n2") * F.col("_pn2")).cast("double"))
    ).cast("bigint")
    return (
        scored.withColumn("cos_pct", cos_pct)
        .filter((F.col("_dq") > 0) & (F.col("cos_pct") >= 10))
        .select("vec_id", "cos_pct")
        .orderBy(F.col("cos_pct").desc(), "vec_id")
        .limit(50)
    )


@q(
    "arr_set_ops",
    """WITH t AS (
         SELECT doc_id, string_split(trim(text), ' ') AS w FROM documents
         WHERE doc_id < 100),
       halves AS (
         SELECT doc_id,
                w[1 : greatest(len(w) // 2, 1)] AS a,
                w[greatest(len(w) // 2, 1) + 1 : len(w)] AS b
         FROM t)
       SELECT doc_id,
              COALESCE(array_to_string(
                  list_sort(list_distinct(list_intersect(a, b))), ','), '')
                  AS common,
              CAST(len(list_distinct(list_concat(a, b))) AS BIGINT) AS n_union,
              CAST(len(list_distinct(list_filter(a, x -> NOT list_contains(b, x))))
                   AS BIGINT) AS n_only_first,
              len(list_intersect(a, b)) > 0 AS overlaps
       FROM halves""",
)
def arr_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H6+ array set algebra: intersect / union-size / difference-size /
    overlap between the two halves of each doc's token stream — all
    JVM-side array kernels, sorted+distinct on both engines so the
    comparison is set-semantics clean."""
    d = read_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    w = F.split(F.trim(F.col("text")), " ")
    half = F.greatest(F.floor(F.size(w) / 2).cast("int"), F.lit(1))
    t = d.select(
        "doc_id",
        F.slice(w, 1, half).alias("a"),
        F.expr(
            "slice(split(trim(text), ' '), greatest(CAST(floor(size(split(trim(text), ' ')) / 2) AS INT), 1) + 1, "
            "size(split(trim(text), ' ')))"
        ).alias("b"),
    )
    return t.select(
        "doc_id",
        F.array_join(
            F.array_sort(F.array_distinct(F.array_intersect("a", "b"))), ","
        ).alias("common"),
        F.size(F.array_distinct(F.concat("a", "b"))).cast("bigint").alias("n_union"),
        F.size(F.array_distinct(F.array_except("a", "b"))).cast("bigint").alias("n_only_first"),
        F.arrays_overlap("a", "b").alias("overlaps"),
    )


@q(
    "regex_extract_all",
    """SELECT doc_id,
              COALESCE(array_to_string(regexp_extract_all(text, '[a-z]{6,}'), ' '), '')
                  AS long_words,
              CAST(len(regexp_extract_all(text, '[a-z]{6,}')) AS BIGINT) AS n_long
       FROM documents WHERE doc_id < 200""",
)
def regex_extract_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H8+ regexp_extract_all: every ≥6-letter run per doc, duplicates and
    order preserved, emitted as a space-joined string (scalar-only
    outputs, r4 driver lesson)."""
    d = read_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    all_matches = F.expr("regexp_extract_all(text, '[a-z]{6,}', 0)")
    return d.select(
        "doc_id",
        F.array_join(all_matches, " ").alias("long_words"),
        F.size(all_matches).cast("bigint").alias("n_long"),
    )


@q(
    "interval_merge",
    """WITH ivs AS (
         SELECT CAST(s_suppkey % 5 AS VARCHAR) AS chromosome,
                CAST(s_suppkey * 97 + 1 AS BIGINT) AS begin,
                CAST(s_suppkey * 97 + 1 + 200 + (s_suppkey % 7) * 500 AS BIGINT) AS "end"
         FROM supplier),
       o AS (
         SELECT chromosome, begin, "end",
                CASE WHEN MAX("end") OVER w IS NULL OR begin > MAX("end") OVER w
                     THEN 1 ELSE 0 END AS new_i
         FROM ivs
         WINDOW w AS (PARTITION BY chromosome ORDER BY begin, "end"
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)),
       s AS (
         SELECT chromosome, begin, "end",
                SUM(new_i) OVER (PARTITION BY chromosome ORDER BY begin, "end"
                                 ROWS UNBOUNDED PRECEDING) AS island
         FROM o)
       SELECT chromosome, CAST(MIN(begin) AS BIGINT) AS begin,
              CAST(MAX("end") AS BIGINT) AS "end",
              CAST(COUNT(*) AS BIGINT) AS n_merged
       FROM s GROUP BY chromosome, island""",
)
def interval_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C1+ bedtools merge (operators/interval.py merge_intervals):
    overlapping coverage regions collapse to maximal disjoint runs via
    one partitioned running-max window + one aggregate — no joins, scales
    to any interval count. The primitive that keeps a coverage warehouse
    canonical (varda's region table accumulates overlapping imports)."""
    from varda_spark.operators.interval import merge_intervals

    _, s = _points_intervals(spark, sf_dir)
    out = merge_intervals(s.select("chromosome", "begin", "end"))
    return out.select(
        "chromosome",
        F.col("begin").cast("bigint").alias("begin"),
        F.col("end").cast("bigint").alias("end"),
        "n_merged",
    )


@q(
    "agg_mode",
    """SELECT user_id, event_type AS mode_type, CAST(n AS BIGINT) AS n
       FROM (
         SELECT user_id, event_type, COUNT(*) AS n,
                ROW_NUMBER() OVER (PARTITION BY user_id
                                   ORDER BY COUNT(*) DESC, event_type) AS rn
         FROM events GROUP BY user_id, event_type)
       WHERE rn = 1""",
)
def agg_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D+ mode (most frequent value) per group with a deterministic
    lexicographic tie-break — count + one partitioned window over the
    already-aggregated (group, value) rows, never over raw events."""
    ev = read_table(spark, sf_dir, "events")
    counts = ev.groupBy("user_id", "event_type").agg(F.count(F.lit(1)).alias("n"))
    w = Window.partitionBy("user_id").orderBy(F.col("n").desc(), F.col("event_type"))
    return (
        counts.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", F.col("event_type").alias("mode_type"), F.col("n").cast("bigint").alias("n"))
    )


@q(
    "merge_upsert",
    """WITH base AS (
         SELECT l_orderkey, l_linenumber,
                CAST(l_quantity AS DOUBLE) AS quantity, 0 AS version
         FROM lineitem),
       updates AS (
         SELECT l_orderkey, l_linenumber,
                CAST(l_quantity AS DOUBLE) + 100.0 AS quantity, 1 AS version
         FROM lineitem WHERE l_orderkey % 7 = 0),
       merged AS (SELECT * FROM base UNION ALL SELECT * FROM updates)
       SELECT l_orderkey, l_linenumber, quantity, CAST(version AS BIGINT) AS version
       FROM (
         SELECT *, ROW_NUMBER() OVER (PARTITION BY l_orderkey, l_linenumber
                                      ORDER BY version DESC, quantity) AS rn
         FROM merged) WHERE rn = 1""",
)
def merge_upsert_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5+ MERGE INTO keep-latest (operators/merge.py): an update batch
    replaces same-key warehouse rows in ONE hash shuffle on the merge keys
    — the Delta/Iceberg MERGE data motion without the table format."""
    from varda_spark.operators.merge import merge_upsert

    li = read_table(spark, sf_dir, "lineitem")
    base = li.select(
        "l_orderkey", "l_linenumber",
        F.col("l_quantity").cast("double").alias("quantity"), F.lit(0).alias("version"),
    )
    updates = li.filter(F.col("l_orderkey") % 7 == 0).select(
        "l_orderkey", "l_linenumber",
        (F.col("l_quantity").cast("double") + 100.0).alias("quantity"), F.lit(1).alias("version"),
    )
    out = merge_upsert(base, updates, ["l_orderkey", "l_linenumber"], tiebreak=["quantity"])
    return out.select(
        "l_orderkey", "l_linenumber", "quantity", F.col("version").cast("bigint").alias("version")
    )


@q(
    "stream_enrich",
    """SELECT c_mktsegment, event_type, CAST(COUNT(*) AS BIGINT) AS n_events
       FROM events JOIN customer ON user_id = c_custkey
       GROUP BY c_mktsegment, event_type""",
)
def stream_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """I+ stream-static join: events enriched against a broadcast customer
    dimension, counted per (segment, event_type). Batch core of the
    streaming wrapper (streaming/windows.py enrich_counts — the same code
    runs on a readStream source; equivalence in tests/test_streaming.py)."""
    from varda_spark.streaming.windows import enrich_counts

    ev = read_table(spark, sf_dir, "events")
    c = read_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    return enrich_counts(ev, c)


@q(
    "text_gopher",
    """WITH t AS (
         SELECT doc_id, text, string_split(trim(text), ' ') AS w FROM documents),
       m AS (
         SELECT doc_id, text, w, len(w) AS n,
                CAST(floor(list_sum(list_transform(w, x -> length(x))) * 100.0
                     / greatest(len(w), 1)) AS BIGINT) AS mwl_x100,
                CAST(floor(len(list_filter(w, x -> regexp_matches(x, '[A-Za-z]'))) * 100.0
                     / greatest(len(w), 1)) AS BIGINT) AS alpha_pct,
                CAST(len(list_intersect(list_transform(w, x -> lower(x)),
                     ['the','be','to','of','and','that','have','with'])) AS BIGINT) AS n_stop,
                CAST(floor((length(text) - length(replace(text, '#', ''))) * 100.0
                     / greatest(length(text), 1)) AS BIGINT) AS hash_pct
         FROM t)
       SELECT doc_id, CAST(n AS BIGINT) AS n_words, mwl_x100, alpha_pct, n_stop, hash_pct,
              (n >= 3 AND n <= 10000 AND mwl_x100 >= 150 AND mwl_x100 <= 1000
               AND alpha_pct >= 80 AND n_stop >= 2 AND hash_pct <= 10) AS gopher_pass
       FROM m""",
)
def text_gopher(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K4 Gopher-style quality rules (Rae et al. 2021, public): word count
    band, mean word length band, alphabetic-word ratio, stopword presence,
    symbol (#) density → per-doc signals + pass flag. Pure higher-order
    Column functions — no explode, no UDF, whole-stage codegen throughout;
    at 100 TB this is a single map-side scan."""
    d = read_table(spark, sf_dir, "documents")
    w = F.split(F.trim(F.col("text")), " ")
    n = F.size(w)
    g1 = F.greatest(n, F.lit(1))
    mwl = F.floor(
        F.expr(
            "aggregate(transform(split(trim(text), ' '), x -> CAST(length(x) AS BIGINT)), "
            "CAST(0 AS BIGINT), (a, v) -> a + v)"
        )
        * 100.0 / g1
    ).cast("bigint")
    alpha = F.floor(
        F.size(F.expr("filter(split(trim(text), ' '), x -> x rlike '[A-Za-z]')")) * 100.0 / g1
    ).cast("bigint")
    stops = F.array(*[F.lit(s) for s in ["the", "be", "to", "of", "and", "that", "have", "with"]])
    n_stop = F.size(F.array_intersect(F.expr("transform(split(trim(text), ' '), x -> lower(x))"), stops)).cast("bigint")
    tl = F.length("text")
    hash_pct = F.floor(
        (tl - F.length(F.replace(F.col("text"), F.lit("#"), F.lit("")))) * 100.0
        / F.greatest(tl, F.lit(1))
    ).cast("bigint")
    out = d.select(
        "doc_id",
        n.cast("bigint").alias("n_words"),
        mwl.alias("mwl_x100"),
        alpha.alias("alpha_pct"),
        n_stop.alias("n_stop"),
        hash_pct.alias("hash_pct"),
    )
    return out.withColumn(
        "gopher_pass",
        (F.col("n_words") >= 3) & (F.col("n_words") <= 10000)
        & (F.col("mwl_x100") >= 150) & (F.col("mwl_x100") <= 1000)
        & (F.col("alpha_pct") >= 80) & (F.col("n_stop") >= 2) & (F.col("hash_pct") <= 10),
    )


@q(
    "win_sessionize",
    """WITH o AS (
         SELECT user_id, ts, event_id,
                CASE WHEN LAG(ts) OVER w IS NULL
                     OR epoch_us(ts) - epoch_us(LAG(ts) OVER w) > 1800000000
                     THEN 1 ELSE 0 END AS new_s
         FROM events
         WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
       s AS (
         SELECT user_id, ts,
                SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                 ROWS UNBOUNDED PRECEDING) AS session_seq
         FROM o)
       SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq,
              CAST(COUNT(*) AS BIGINT) AS n_events,
              MIN(ts) AS session_start, MAX(ts) AS session_end
       FROM s GROUP BY user_id, session_seq""",
)
def win_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E+: batch sessionization (gaps-and-islands): a >30-min silence opens
    a new session per user; lag flag + running sum numbers the islands.
    The batch twin of the streaming session window (I3) — partitioned
    window, shuffles once on user_id, no global ordering anywhere."""
    ev = read_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts").over(w))
    new_s = F.when(F.lag("ts").over(w).isNull() | (gap_us > 1800 * 1000000), 1).otherwise(0)
    return (
        ev.withColumn("session_seq", F.sum(new_s).over(w))
        .groupBy("user_id", F.col("session_seq").cast("bigint").alias("session_seq"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
        )
    )


@q(
    "sample_stratified",
    """SELECT c_custkey, c_mktsegment FROM customer
       WHERE CAST('0x' || substr(md5(CAST(c_custkey AS VARCHAR)), 1, 15) AS BIGINT) % 100
             < CASE c_mktsegment WHEN 'BUILDING' THEN 20 WHEN 'MACHINERY' THEN 10 ELSE 5 END""",
)
def sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-stratum deterministic sampling (sampleBy's contract without RNG
    state): keep a row iff md5(key) mod 100 falls under its stratum's rate.
    Content-hash selection is reproducible across engines, runs, and
    cluster sizes — the property a 100 TB training-data pipeline needs for
    resumable sampling; pure map-side, no shuffle."""
    c = read_table(spark, sf_dir, "customer")
    bucket = F.conv(F.substring(F.md5(F.col("c_custkey").cast("string")), 1, 15), 16, 10).cast(
        "bigint"
    ) % 100
    rate = (
        F.when(F.col("c_mktsegment") == "BUILDING", 20)
        .when(F.col("c_mktsegment") == "MACHINERY", 10)
        .otherwise(5)
    )
    return c.filter(bucket < rate).select("c_custkey", "c_mktsegment")


# =====================================================================
# Round-3 breadth: funnel/cohort analytics, co-occurrence graph,
# containment dedup, percentile windows, byte-budget sharding
# =====================================================================

@q(
    "win_funnel",
    """WITH m AS (
         SELECT user_id,
                min(CASE WHEN event_type = 'view' THEN ts END) AS t_view,
                min(CASE WHEN event_type = 'click' THEN ts END) AS t_click,
                min(CASE WHEN event_type = 'purchase' THEN ts END) AS t_purchase
         FROM events GROUP BY user_id)
       SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
              CAST(COUNT(t_view) AS BIGINT) AS n_view,
              CAST(COUNT(CASE WHEN t_click > t_view THEN 1 END) AS BIGINT) AS n_view_click,
              CAST(COUNT(CASE WHEN t_purchase > t_click AND t_click > t_view THEN 1 END)
                   AS BIGINT) AS n_full_funnel
       FROM m""",
)
def win_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-funnel conversion (view → click-after-view → purchase-after-
    click), the product-analytics staple: per-user conditional-min
    timestamps collapse each user to one row map-side (partial agg), then
    ordered-timestamp comparisons count each stage. Two shuffles total
    (user_id, then global 1-row) regardless of event volume — the shape
    that survives 100 TB of clickstream."""
    ev = read_table(spark, sf_dir, "events")
    m = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).alias("t_view"),
        F.min(F.when(F.col("event_type") == "click", F.col("ts"))).alias("t_click"),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias("t_purchase"),
    )
    return m.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_users"),
        F.count("t_view").cast("bigint").alias("n_view"),
        F.count(F.when(F.col("t_click") > F.col("t_view"), 1)).cast("bigint").alias("n_view_click"),
        F.count(
            F.when((F.col("t_purchase") > F.col("t_click")) & (F.col("t_click") > F.col("t_view")), 1)
        ).cast("bigint").alias("n_full_funnel"),
    )


@q(
    "agg_cohort",
    """WITH f AS (
         SELECT user_id, CAST(date_trunc('week', min(ts)) AS DATE) AS cohort
         FROM events GROUP BY user_id),
       a AS (
         SELECT DISTINCT user_id, CAST(date_trunc('week', ts) AS DATE) AS wk
         FROM events)
       SELECT cohort,
              CAST(date_diff('day', cohort, wk) / 7 AS BIGINT) AS week_n,
              CAST(COUNT(*) AS BIGINT) AS n_users
       FROM a JOIN f USING (user_id)
       GROUP BY cohort, week_n""",
)
def agg_cohort(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort-retention matrix: users bucketed by first-seen week, counted
    in each subsequent active week. Monday-truncation agrees between
    engines; week_n divides an exact multiple of 7 days, so the double
    division is exact. Scale: (user, week) distinct then two grouped aggs
    — the cohort dimension is tiny, the fact scan dominates."""
    ev = read_table(spark, sf_dir, "events")
    f = ev.groupBy("user_id").agg(F.to_date(F.date_trunc("week", F.min("ts"))).alias("cohort"))
    a = ev.select("user_id", F.to_date(F.date_trunc("week", "ts")).alias("wk")).distinct()
    return (
        a.join(f, "user_id")
        .select("cohort", (F.datediff("wk", "cohort") / 7).cast("bigint").alias("week_n"))
        .groupBy("cohort", "week_n")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_users"))
    )


_COORDER_EDGES_SQL = """
  lp AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
  e AS (
    SELECT DISTINCT a.l_partkey AS pa, b.l_partkey AS pb
    FROM lp a JOIN lp b
      ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey)
"""


def _coorder_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic co-purchase graph: undirected edge (pa < pb) iff the
    two parts appear in the same order. Per-order fan-out is bounded by
    order width (≤ 7 lines in the testdata; at scale a cap/filter on
    degenerate baskets bounds it), then DISTINCT collapses multiplicity —
    the standard market-basket graph build."""
    li = read_table(spark, sf_dir, "lineitem")
    lp = li.select("l_orderkey", "l_partkey").distinct()
    a, b = lp.alias("a"), lp.alias("b")
    return (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .select(F.col("a.l_partkey").alias("pa"), F.col("b.l_partkey").alias("pb"))
        .distinct()
    )


@q(
    "graph_degree",
    f"""WITH {_COORDER_EDGES_SQL},
       deg AS (
         SELECT node, COUNT(*) AS degree FROM (
           SELECT pa AS node FROM e UNION ALL SELECT pb AS node FROM e)
         GROUP BY node)
       SELECT CAST(degree AS BIGINT) AS degree,
              CAST(COUNT(*) AS BIGINT) AS n_parts
       FROM deg GROUP BY degree""",
)
def graph_degree(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree distribution of the co-purchase graph — the first question
    asked of any graph (skew check before heavier algorithms; a hub here
    is exactly the key that needs salting downstream). Edge ends explode
    via UNION ALL, one grouped count per node, one histogram agg."""
    e = _coorder_edges(spark, sf_dir)
    deg = (
        e.select(F.col("pa").alias("node"))
        .unionAll(e.select(F.col("pb").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("degree"))
    )
    return deg.groupBy(F.col("degree").cast("bigint").alias("degree")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_parts")
    )


@q(
    "graph_triangles",
    f"""WITH {_COORDER_EDGES_SQL},
       deg AS (
         SELECT node, COUNT(*) AS degree FROM (
           SELECT pa AS node FROM e UNION ALL SELECT pb AS node FROM e)
         GROUP BY node),
       tri AS (
         SELECT COUNT(*) AS n_triangles
         FROM e e1 JOIN e e2 ON e1.pb = e2.pa
                   JOIN e e3 ON e3.pa = e1.pa AND e3.pb = e2.pb),
       wed AS (SELECT SUM(degree * (degree - 1)) AS deg_pairs2 FROM deg),
       cnt AS (SELECT COUNT(*) AS n_edges FROM e)
       SELECT CAST(n_edges AS BIGINT) AS n_edges,
              CAST(n_triangles AS BIGINT) AS n_triangles,
              CAST(deg_pairs2 AS BIGINT) AS deg_pairs2,
              6.0 * n_triangles / deg_pairs2 AS clustering
       FROM tri, wed, cnt""",
)
def graph_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle count + global clustering coefficient on the co-purchase
    graph, with DEGREE-ORDERED wedge enumeration (the standard
    distributed algorithm, done properly): every canonical edge a<b is
    re-directed from its lower-(degree, id) endpoint to the higher one,
    wedges are enumerated only at each triangle's minimum-degree corner,
    and the closing edge is probed against the canonical edge set. Wedge
    volume drops from Σ deg² to Σ outdeg² with outdeg ≤ O(√E) — on a
    power-law graph (hubs) that is the difference between exploding and
    finishing; on THIS near-regular testdata graph (20k nodes, avg deg
    120, 1.9M triangles) outdeg ≈ deg/2 and the ~7·10⁷ surviving wedges
    are the intrinsic cost (~22 s at sf0.1 — dense-graph triangle
    counting is genuinely quadratic-in-degree work). The oracle keeps
    the brute-force id-ordered join: the count is algorithm-independent,
    so the spec stays simple while the engine runs the skew-safe path.
    clustering = 6·tri / Σ deg·(deg−1): one double division,
    engine-identical."""
    e = _coorder_edges(spark, sf_dir).localCheckpoint()  # reused 4× below
    deg = (
        e.select(F.col("pa").alias("node"))
        .unionAll(e.select(F.col("pb").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("degree"))
    )
    da = deg.withColumnRenamed("node", "pa").withColumnRenamed("degree", "dega")
    db = deg.withColumnRenamed("node", "pb").withColumnRenamed("degree", "degb")
    # direct each edge low→high by (degree, id); (u, v) with u the lesser
    dir_e = (
        e.join(da, "pa")
        .join(db, "pb")
        .select(
            F.when(
                (F.col("dega") < F.col("degb"))
                | ((F.col("dega") == F.col("degb")) & (F.col("pa") < F.col("pb"))),
                F.col("pa"),
            ).otherwise(F.col("pb")).alias("u"),
            F.when(
                (F.col("dega") < F.col("degb"))
                | ((F.col("dega") == F.col("degb")) & (F.col("pa") < F.col("pb"))),
                F.col("pb"),
            ).otherwise(F.col("pa")).alias("v"),
        )
        .localCheckpoint()
    )
    w1, w2 = dir_e.alias("w1"), dir_e.alias("w2")
    # wedges at the min-(degree,id) corner; unordered pair canonicalized by id
    wedge = w1.join(
        w2, (F.col("w1.u") == F.col("w2.u")) & (F.col("w1.v") < F.col("w2.v"))
    ).select(F.col("w1.v").alias("x"), F.col("w2.v").alias("y"))
    tri = wedge.join(
        e, (F.col("x") == F.col("pa")) & (F.col("y") == F.col("pb"))
    ).agg(F.count(F.lit(1)).alias("n_triangles"))
    wed = deg.agg(F.sum(F.col("degree") * (F.col("degree") - 1)).alias("deg_pairs2"))
    cnt = e.agg(F.count(F.lit(1)).alias("n_edges"))
    return (
        tri.join(F.broadcast(wed))
        .join(F.broadcast(cnt))
        .select(
            F.col("n_edges").cast("bigint").alias("n_edges"),
            F.col("n_triangles").cast("bigint").alias("n_triangles"),
            F.col("deg_pairs2").cast("bigint").alias("deg_pairs2"),
            (F.lit(6.0) * F.col("n_triangles") / F.col("deg_pairs2")).alias("clustering"),
        )
    )


@q(
    "graph_triangles_approx",
    f"""WITH {_COORDER_EDGES_SQL},
       se AS (
         SELECT pa, pb FROM e
         WHERE CAST('0x' || substr(md5(pa || '-' || pb), 1, 4) AS INT) % 5 = 0),
       tri AS (
         SELECT COUNT(*) AS n_tri_sampled
         FROM se e1 JOIN se e2 ON e1.pb = e2.pa
                    JOIN se e3 ON e3.pa = e1.pa AND e3.pb = e2.pb),
       cnt AS (SELECT COUNT(*) AS n_edges_sampled FROM se)
       SELECT CAST(n_edges_sampled AS BIGINT) AS n_edges_sampled,
              CAST(n_tri_sampled AS BIGINT) AS n_tri_sampled,
              CAST(125 * n_tri_sampled AS BIGINT) AS est_triangles
       FROM tri, cnt""",
)
def graph_triangles_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate triangle count by DOULION edge sparsification
    (Tsourakakis et al., KDD'09): keep each edge with probability
    p = 1/5 using the repo's deterministic content-hash coin (same
    md5 idiom as sample_hash — reproducible across engines, runs, and
    partitionings, which is what lets a sampled estimator have an EXACT
    DuckDB twin), count triangles on the sampled graph, scale by
    1/p³ = 125. Each triangle survives with probability p³, so
    E[est] = true count; on the dense near-regular testdata graph the
    wedge volume drops by p² (~25×), turning graph_triangles' intrinsic
    ~22 s at sf0.1 into ~1 s — the documented trade for a ±few-percent
    estimate (1.9M triangles → ~15k sampled, rel. stderr ≈ 1/√15k <
    1%). All-integer output (125·n is exact BIGINT math). At 100 TB
    this is THE triangle plan: sparsify first, the exact key stays for
    verification on subgraphs."""
    e = _coorder_edges(spark, sf_dir)
    key = F.concat_ws(
        "-", F.col("pa").cast("string"), F.col("pb").cast("string")
    )
    coin = F.conv(F.substring(F.md5(key.cast("binary")), 1, 4), 16, 10).cast("int") % 5
    se = e.filter(coin == 0).localCheckpoint()  # sampled graph reused 3×
    e1, e2, e3 = se.alias("e1"), se.alias("e2"), se.alias("e3")
    tri = (
        e1.join(e2, F.col("e1.pb") == F.col("e2.pa"))
        .join(
            e3,
            (F.col("e3.pa") == F.col("e1.pa")) & (F.col("e3.pb") == F.col("e2.pb")),
        )
        .agg(F.count(F.lit(1)).alias("n_tri_sampled"))
    )
    cnt = se.agg(F.count(F.lit(1)).alias("n_edges_sampled"))
    return tri.join(F.broadcast(cnt)).select(
        F.col("n_edges_sampled").cast("bigint").alias("n_edges_sampled"),
        F.col("n_tri_sampled").cast("bigint").alias("n_tri_sampled"),
        (F.lit(125) * F.col("n_tri_sampled")).cast("bigint").alias("est_triangles"),
    )


@q(
    "text_containment",
    """WITH words AS (
         SELECT doc_id, string_split(trim(text), ' ') AS w FROM documents),
       sh AS (
         SELECT DISTINCT doc_id,
                unnest(list_transform(range(1, greatest(len(w) - 1, 1)),
                       i -> w[i] || ' ' || w[i + 1] || ' ' || w[i + 2])) AS shingle
         FROM words),
       sizes AS (SELECT doc_id, COUNT(DISTINCT shingle) AS n_sh FROM sh GROUP BY doc_id),
       inter AS (
         SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_inter
         FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id <> b.doc_id
         GROUP BY 1, 2)
       SELECT doc_a, doc_b,
              CAST(n_inter AS BIGINT) AS n_inter,
              CAST(floor(n_inter * 100 / sa.n_sh) AS BIGINT) AS containment_pct
       FROM inter JOIN sizes sa ON sa.doc_id = doc_a
       WHERE floor(n_inter * 100 / sa.n_sh) >= 40""",
)
def text_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K2+ directed shingle containment |A∩B|/|A| — catches a short doc
    EMBEDDED in a long one (boilerplate wrappers, quote farms, concat
    dumps) where symmetric Jaccard is diluted below threshold by the long
    side. Same bounded inverted-index join as dedup_ngram."""
    from varda_spark.operators.dedup import shingle_containment

    d = read_table(spark, sf_dir, "documents")
    return shingle_containment(d, threshold_pct=40)


@q(
    "win_pctrank",
    """SELECT c_custkey, c_mktsegment,
              percent_rank() OVER w AS pct_rank,
              cume_dist() OVER w AS cume
       FROM customer
       WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey)""",
)
def win_pctrank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E+ relative-standing windows: percent_rank ((rank−1)/(n−1)) and
    cume_dist (rows≤current / n) per market segment. Both are single
    integer-ratio double divisions — engine-identical; partitioned by
    segment so no global window."""
    c = read_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy("c_acctbal", "c_custkey")
    return c.select(
        "c_custkey",
        "c_mktsegment",
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cume"),
    )


@q(
    "multimodal_shard",
    """WITH mm AS (
         SELECT doc_id AS item_id,
                CASE WHEN doc_id % 3 = 0 THEN 'image/png'
                     WHEN doc_id % 3 = 1 THEN 'audio/wav'
                     ELSE 'video/mp4' END AS mime,
                CAST(length(text) AS BIGINT) AS n_bytes
         FROM documents),
       c AS (
         SELECT item_id, mime, n_bytes,
                COALESCE(SUM(n_bytes) OVER (
                    PARTITION BY mime ORDER BY item_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS bytes_before
         FROM mm)
       SELECT item_id, mime, n_bytes,
              CAST(floor(bytes_before / 4096) AS BIGINT) AS shard_id,
              CAST(bytes_before % 4096 AS BIGINT) AS shard_offset
       FROM c""",
)
def multimodal_shard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K5+ byte-budget shard layout: items stream into ~4 KiB shards per
    modality via a running byte total (items may straddle a boundary —
    the tar-like packed-stream layout where shard_offset is the seek
    position). One partitioned window per mime group, no joins; shard ids
    are stable under re-runs because the order key is the content id."""
    from varda_spark.sources.multimodal import synthesize_blobs

    d = read_table(spark, sf_dir, "documents")
    mm = synthesize_blobs(d).select("item_id", "mime", "n_bytes")
    w = (
        Window.partitionBy("mime")
        .orderBy("item_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    bytes_before = F.coalesce(F.sum("n_bytes").over(w), F.lit(0))
    return mm.select(
        "item_id",
        "mime",
        "n_bytes",
        F.floor(bytes_before / 4096).cast("bigint").alias("shard_id"),
        (bytes_before % 4096).cast("bigint").alias("shard_offset"),
    )


@q(
    "merge_scd2",
    """WITH o AS (
         SELECT user_id, ts, event_id, event_type,
                lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
         FROM events),
       chg AS (
         SELECT user_id, ts, event_id, event_type
         FROM o WHERE prev IS NULL OR prev <> event_type),
       v AS (
         SELECT user_id, event_type, ts AS valid_from,
                lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to
         FROM chg)
       SELECT user_id, event_type, valid_from, valid_to,
              valid_to IS NULL AS is_current
       FROM v""",
)
def merge_scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5+ slowly-changing-dimension type-2 history build: collapse a raw
    event stream into validity intervals — a new version opens only when
    the tracked attribute CHANGES (lag filter), valid_to = next change's
    start (lead), open-ended row flagged current. Two window passes on the
    same (user, time) sort — Catalyst reuses the one shuffle+sort. The
    warehouse pattern for dimension history at any scale."""
    ev = read_table(spark, sf_dir, "events")
    wo = Window.partitionBy("user_id").orderBy("ts", "event_id")
    chg = ev.withColumn("prev", F.lag("event_type").over(wo)).filter(
        F.col("prev").isNull() | (F.col("prev") != F.col("event_type"))
    )
    return chg.select(
        "user_id",
        "event_type",
        F.col("ts").alias("valid_from"),
        F.lead("ts").over(wo).alias("valid_to"),
    ).withColumn("is_current", F.col("valid_to").isNull())


@q(
    "interval_complement",
    """WITH ivs AS (
         SELECT CAST(s_suppkey % 5 AS VARCHAR) AS chromosome,
                CAST(s_suppkey * 97 + 1 AS BIGINT) AS begin,
                CAST(s_suppkey * 97 + 1 + 200 + (s_suppkey % 7) * 500 AS BIGINT) AS "end"
         FROM supplier WHERE s_suppkey % 3 = 0),
       o AS (
         SELECT chromosome, begin, "end",
                CASE WHEN MAX("end") OVER w IS NULL OR begin > MAX("end") OVER w
                     THEN 1 ELSE 0 END AS new_i
         FROM ivs
         WINDOW w AS (PARTITION BY chromosome ORDER BY begin, "end"
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)),
       s AS (
         SELECT chromosome, begin, "end",
                SUM(new_i) OVER (PARTITION BY chromosome ORDER BY begin, "end"
                                 ROWS UNBOUNDED PRECEDING) AS island
         FROM o),
       merged AS (
         SELECT chromosome, MIN(begin) AS begin, MAX("end") AS "end"
         FROM s GROUP BY chromosome, island),
       g AS (
         SELECT chromosome, "end",
                lead(begin) OVER (PARTITION BY chromosome ORDER BY begin) AS nxt
         FROM merged)
       SELECT chromosome,
              CAST("end" + 1 AS BIGINT) AS begin,
              CAST(nxt - 1 AS BIGINT) AS "end"
       FROM g WHERE nxt > "end" + 1""",
)
def interval_complement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C1+ bedtools complement (operators/interval.py complement_intervals):
    the NO-coverage gaps between merged runs — varda's coverage question
    inverted, and the worklist for any backfill job. Merge window + one
    lead() pass, no joins."""
    from varda_spark.operators.interval import complement_intervals

    _, s = _points_intervals(spark, sf_dir)
    # every 3rd interval: sparse coverage so real gaps exist to find
    sparse = s.filter(F.col("sample_key") % 3 == 0)
    return complement_intervals(sparse.select("chromosome", "begin", "end"))


@q(
    "agg_weighted_median",
    """WITH b AS (
         SELECT l_returnflag, l_extendedprice AS p,
                CAST(l_quantity AS BIGINT) AS w
         FROM lineitem),
       c AS (
         SELECT l_returnflag, p,
                SUM(w) OVER (PARTITION BY l_returnflag ORDER BY p) AS cumw,
                SUM(w) OVER (PARTITION BY l_returnflag) AS total
         FROM b)
       SELECT l_returnflag, MIN(p) AS wmedian
       FROM c WHERE 2 * cumw >= total
       GROUP BY l_returnflag""",
)
def agg_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D+ exact weighted median (price weighted by quantity) per group —
    no sketch, no sort-to-driver: one cumulative-weight window per group
    and a min over the half-mass crossing point. Weights are integral, so
    the running sums are exact bigints; 2·cumw ≥ total keeps the compare
    in integers (no /2 float). The RANGE default frame makes tied prices
    share one cumw in both engines."""
    li = read_table(spark, sf_dir, "lineitem")
    b = li.select(
        "l_returnflag",
        F.col("l_extendedprice").alias("p"),
        F.col("l_quantity").cast("bigint").alias("w"),
    )
    wo = Window.partitionBy("l_returnflag").orderBy("p")
    wt = Window.partitionBy("l_returnflag")
    c = b.select(
        "l_returnflag",
        "p",
        F.sum("w").over(wo).alias("cumw"),
        F.sum("w").over(wt).alias("total"),
    )
    return (
        c.filter(2 * F.col("cumw") >= F.col("total"))
        .groupBy("l_returnflag")
        .agg(F.min("p").alias("wmedian"))
    )


@q(
    "agg_unpivot",
    """WITH s AS (
         SELECT l_returnflag,
                CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
                CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_price,
                CAST(COUNT(*) AS DOUBLE) AS n_rows
         FROM lineitem GROUP BY l_returnflag)
       SELECT l_returnflag, 'sum_qty' AS metric, sum_qty AS value FROM s
       UNION ALL SELECT l_returnflag, 'sum_price', sum_price FROM s
       UNION ALL SELECT l_returnflag, 'n_rows', n_rows FROM s""",
)
def agg_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D+ unpivot/melt — agg_pivot's inverse: wide metric columns become
    (group, metric, value) long rows, the shape BI exports and metric
    stores want. Spark's native unpivot is a zero-shuffle Expand over the
    already-aggregated (tiny) frame; the oracle is the portable UNION ALL
    equivalent."""
    li = read_table(spark, sf_dir, "lineitem")
    s = li.groupBy("l_returnflag").agg(
        dsum("l_quantity").alias("sum_qty"),
        dsum("l_extendedprice").alias("sum_price"),
        F.count(F.lit(1)).cast("double").alias("n_rows"),
    )
    return s.unpivot(
        ["l_returnflag"], ["sum_qty", "sum_price", "n_rows"], "metric", "value"
    )


@q(
    "merge_cdc",
    """WITH cdc AS (
         SELECT user_id AS k, ts, event_id,
                CASE WHEN event_id % 10 = 0 THEN 'D' ELSE 'U' END AS op,
                value
         FROM events),
       latest AS (
         SELECT k, op, value,
                ROW_NUMBER() OVER (PARTITION BY k ORDER BY ts DESC, event_id DESC) AS rn
         FROM cdc)
       SELECT k, value FROM latest WHERE rn = 1 AND op <> 'D'""",
)
def merge_cdc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5+ CDC apply: collapse an upsert/delete change stream to final
    table state — last writer wins per key, and a terminal DELETE
    tombstone erases the key entirely (the semantics merge_upsert lacks).
    One partitioned window on (key, seq-desc); at 100 TB this is the
    per-micro-batch compaction step of a CDC ingest, shuffling once on
    the key. Change ops are synthesized deterministically from events
    (every 10th event id is a delete)."""
    ev = read_table(spark, sf_dir, "events")
    cdc = ev.select(
        F.col("user_id").alias("k"),
        "ts",
        "event_id",
        F.when(F.col("event_id") % 10 == 0, F.lit("D")).otherwise(F.lit("U")).alias("op"),
        "value",
    )
    w = Window.partitionBy("k").orderBy(F.col("ts").desc(), F.col("event_id").desc())
    return (
        cdc.withColumn("rn", F.row_number().over(w))
        .filter((F.col("rn") == 1) & (F.col("op") != "D"))
        .select("k", "value")
    )


# =====================================================================
# Synthetic partsupp → the six TPC-H queries the testdata couldn't run
# =====================================================================
# /root/testdata ships no partsupp.parquet, which blocked q2/q9/q11/q16/
# q20/q21. Derive it DETERMINISTICALLY from part × supplier with integer
# modular arithmetic — the identical derivation is inlined in each DuckDB
# oracle (both engines read the same parquet, so the synthesized rows are
# bit-identical; same pattern as `_points_intervals`). Shape follows spec
# dbgen: 4 suppliers per part, supplier chosen by a partkey-dependent
# stride mod |supplier| (s_suppkey is dense 0..S-1 in the testdata, so the
# modulus IS a valid key — no rank lookup needed). availqty/supplycost are
# modular functions of (partkey, suppkey); supplycost's /100.0+1.0 maps an
# exact int to the same IEEE double in both engines.
#
# Scale: part × 4 is a map-side explode; the |supplier| count rides in as
# a 1-row broadcast (whitelisted BNLJ — same shape as freq_variant's pool
# scalar), so partsupp never materializes and Catalyst prunes/pushes into
# it like any view.

_PARTSUPP_SQL = """
  partsupp AS (
    SELECT ps_partkey, ps_suppkey,
           CAST((ps_partkey * 31 + ps_suppkey * 7) % 9999 + 1 AS BIGINT) AS ps_availqty,
           CAST((ps_partkey * 29 + ps_suppkey * 11) % 100000 AS DOUBLE) / 100.0 + 1.0 AS ps_supplycost
    FROM (
      SELECT p_partkey AS ps_partkey,
             CAST((p_partkey * 13 + i * 37) % s_cnt AS BIGINT) AS ps_suppkey
      FROM part
           CROSS JOIN (SELECT CAST(COUNT(*) AS BIGINT) AS s_cnt FROM supplier) sc
           CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS i) ii
    )
  )
"""


def _partsupp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synthesize partsupp(ps_partkey, ps_suppkey, ps_availqty,
    ps_supplycost) exactly as `_PARTSUPP_SQL` does (see section comment)."""
    p = read_table(spark, sf_dir, "part").select("p_partkey")
    s_cnt = read_table(spark, sf_dir, "supplier").agg(
        F.count(F.lit(1)).cast("bigint").alias("s_cnt")
    )
    expanded = (
        p.join(F.broadcast(s_cnt))
        .select(
            "p_partkey",
            F.explode(F.array(*[F.lit(i) for i in range(4)])).alias("i"),
            "s_cnt",
        )
        .select(
            F.col("p_partkey").alias("ps_partkey"),
            ((F.col("p_partkey") * 13 + F.col("i") * 37) % F.col("s_cnt"))
            .cast("bigint")
            .alias("ps_suppkey"),
        )
    )
    return expanded.select(
        "ps_partkey",
        "ps_suppkey",
        ((F.col("ps_partkey") * 31 + F.col("ps_suppkey") * 7) % 9999 + 1)
        .cast("bigint")
        .alias("ps_availqty"),
        (
            ((F.col("ps_partkey") * 29 + F.col("ps_suppkey") * 11) % 100000).cast("double")
            / 100.0
            + 1.0
        ).alias("ps_supplycost"),
    )


@q(
    "tpch_q2",
    f"""WITH {_PARTSUPP_SQL}
       SELECT s_acctbal, s_name, n_name, p_partkey, p_brand, ps_supplycost
       FROM partsupp
            JOIN part ON p_partkey = ps_partkey
            JOIN supplier ON s_suppkey = ps_suppkey
            JOIN nation ON s_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey
       WHERE p_size IN (10, 15, 20) AND r_name = 'EUROPE'
         AND ps_supplycost = (
               SELECT MIN(ps2.ps_supplycost)
               FROM partsupp ps2
                    JOIN supplier s2 ON s2.s_suppkey = ps2.ps_suppkey
                    JOIN nation n2 ON s2.s_nationkey = n2.n_nationkey
                    JOIN region r2 ON n2.n_regionkey = r2.r_regionkey
               WHERE ps2.ps_partkey = p_partkey AND r2.r_name = 'EUROPE')
       ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
       LIMIT 100""",
)
def tpch_q2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 minimum-cost supplier (correlated MIN decorrelated).

    The correlated scalar subquery becomes a grouped-min + equi-join —
    the decorrelation Catalyst would do, written explicitly so the join
    keys are visible. Dims (supplier/nation/region) broadcast; the only
    shuffle is the per-part min agg. Sort keys include p_partkey+s_name
    (unique per row) so LIMIT 100 is deterministic across engines."""
    ps = _partsupp(spark, sf_dir)
    s = read_table(spark, sf_dir, "supplier")
    n = read_table(spark, sf_dir, "nation")
    r = read_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    p = read_table(spark, sf_dir, "part").filter(F.col("p_size").isin(10, 15, 20))
    eu_ps = (
        ps.join(F.broadcast(s), ps.ps_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
    )
    min_cost = eu_ps.groupBy("ps_partkey").agg(F.min("ps_supplycost").alias("min_cost"))
    return (
        eu_ps.join(F.broadcast(p), F.col("ps_partkey") == p.p_partkey)
        .join(
            min_cost.withColumnRenamed("ps_partkey", "mc_partkey"),
            (F.col("ps_partkey") == F.col("mc_partkey"))
            & (F.col("ps_supplycost") == F.col("min_cost")),
        )
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "p_brand", "ps_supplycost")
        .orderBy(F.col("s_acctbal").desc(), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


@q(
    "tpch_q9",
    f"""WITH {_PARTSUPP_SQL}
       SELECT nation, o_year, CAST(SUM(amount) AS DOUBLE) AS sum_profit
       FROM (
         SELECT n_name AS nation,
                CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS o_year,
                CAST(l_extendedprice AS DECIMAL(18,4)) * CAST(1 - l_discount AS DECIMAL(18,4))
                - CAST(ps_supplycost AS DECIMAL(18,4)) * CAST(l_quantity AS DECIMAL(18,4)) AS amount
         FROM lineitem
              JOIN part ON p_partkey = l_partkey
              JOIN supplier ON s_suppkey = l_suppkey
              JOIN partsupp ON ps_partkey = l_partkey AND ps_suppkey = l_suppkey
              JOIN orders ON o_orderkey = l_orderkey
              JOIN nation ON s_nationkey = n_nationkey
         WHERE p_name LIKE '%red%'
       ) profit
       GROUP BY nation, o_year
       ORDER BY nation, o_year DESC""",
)
def tpch_q9(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 product-type profit by nation and year.

    5-way join: fact lineitem joins synthesized partsupp on the composite
    (partkey, suppkey) — inner, so only lines whose supplier is one of the
    part's 4 synthetic suppliers contribute (deterministic on both
    engines). Decimal interior math keeps the profit sum exact."""
    li = read_table(spark, sf_dir, "lineitem")
    p = read_table(spark, sf_dir, "part").filter(F.col("p_name").like("%red%"))
    s = read_table(spark, sf_dir, "supplier")
    ps = _partsupp(spark, sf_dir)
    o = read_table(spark, sf_dir, "orders")
    n = read_table(spark, sf_dir, "nation")
    amount = dec("l_extendedprice") * dec(F.lit(1) - F.col("l_discount")) - dec(
        "ps_supplycost"
    ) * dec("l_quantity")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(
            ps,
            (li.l_partkey == ps.ps_partkey) & (li.l_suppkey == ps.ps_suppkey),
        )
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .select(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("bigint").alias("o_year"),
            amount.alias("amount"),
        )
        .groupBy("nation", "o_year")
        .agg(F.sum("amount").cast("double").alias("sum_profit"))
        .orderBy("nation", F.col("o_year").desc())
    )


@q(
    "tpch_q11",
    f"""WITH {_PARTSUPP_SQL}
       SELECT ps_partkey,
              CAST(SUM(CAST(ps_supplycost AS DECIMAL(18,4)) * ps_availqty) AS DOUBLE) AS part_value
       FROM partsupp
            JOIN supplier ON ps_suppkey = s_suppkey
            JOIN nation ON s_nationkey = n_nationkey
       WHERE n_name = 'NATION_7'
       GROUP BY ps_partkey
       HAVING SUM(CAST(ps_supplycost AS DECIMAL(18,4)) * ps_availqty) * 10000 >
              (SELECT SUM(CAST(ps_supplycost AS DECIMAL(18,4)) * ps_availqty)
               FROM partsupp
                    JOIN supplier ON ps_suppkey = s_suppkey
                    JOIN nation ON s_nationkey = n_nationkey
               WHERE n_name = 'NATION_7')
       ORDER BY part_value DESC, ps_partkey""",
)
def tpch_q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 important stock identification.

    The spec's `> total * 0.0001` is rewritten `* 10000 > total` so the
    threshold compare stays in EXACT decimal on both engines (multiplying
    the sum by an int is exact; multiplying by 0.0001 is not). The 1-row
    grand total rides in as a broadcast (whitelisted BNLJ scalar)."""
    ps = _partsupp(spark, sf_dir)
    s = read_table(spark, sf_dir, "supplier")
    n = read_table(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_7")
    base = (
        ps.join(F.broadcast(s), ps.ps_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .select("ps_partkey", (dec("ps_supplycost") * F.col("ps_availqty")).alias("v"))
    )
    per_part = base.groupBy("ps_partkey").agg(F.sum("v").alias("value_dec"))
    total = base.agg(F.sum("v").alias("total_dec"))
    return (
        per_part.join(F.broadcast(total))
        .filter(F.col("value_dec") * 10000 > F.col("total_dec"))
        .select("ps_partkey", F.col("value_dec").cast("double").alias("part_value"))
        .orderBy(F.col("part_value").desc(), "ps_partkey")
    )


@q(
    "tpch_q16",
    f"""WITH {_PARTSUPP_SQL}
       SELECT p_brand, p_type, p_size,
              CAST(COUNT(DISTINCT ps_suppkey) AS BIGINT) AS supplier_cnt
       FROM partsupp JOIN part ON p_partkey = ps_partkey
       WHERE p_brand <> 'Brand#13' AND p_type NOT LIKE 'MEDIUM%'
         AND p_size IN (1, 4, 7, 10, 14, 19, 25, 28)
         AND ps_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
       GROUP BY p_brand, p_type, p_size
       ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""",
)
def tpch_q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 parts/supplier relationship.

    Spec's exclusion set is suppliers with complaint comments; testdata
    ships no s_comment, so the adapted exclusion is s_acctbal < 0 (same
    NOT IN anti-join shape, still a non-empty set). Anti-join broadcasts
    the tiny exclusion list; count-distinct shuffles once on the group."""
    ps = _partsupp(spark, sf_dir)
    p = read_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#13")
        & (~F.col("p_type").like("MEDIUM%"))
        & (F.col("p_size").isin(1, 4, 7, 10, 14, 19, 25, 28))
    )
    bad_s = (
        read_table(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    return (
        ps.join(F.broadcast(p), ps.ps_partkey == p.p_partkey)
        .join(F.broadcast(bad_s), ps.ps_suppkey == bad_s.s_suppkey, "left_anti")
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("ps_suppkey").cast("bigint").alias("supplier_cnt"))
        .orderBy(F.col("supplier_cnt").desc(), "p_brand", "p_type", "p_size")
    )


@q(
    "tpch_q20",
    f"""WITH {_PARTSUPP_SQL}
       SELECT s_name, s_acctbal
       FROM supplier JOIN nation ON s_nationkey = n_nationkey
       WHERE n_name = 'NATION_3'
         AND s_suppkey IN (
           SELECT ps_suppkey FROM partsupp
           WHERE ps_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'red%')
             AND ps_availqty > (
                   SELECT 0.5 * SUM(l_quantity) FROM lineitem
                   WHERE l_partkey = ps_partkey AND l_suppkey = ps_suppkey
                     AND l_shipdate >= DATE '1996-01-01'
                     AND l_shipdate < DATE '1997-01-01'))
       ORDER BY s_name""",
)
def tpch_q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 potential part promotion.

    The correlated half-of-shipped-quantity subquery decorrelates to a
    grouped sum over the filtered year joined back on (partkey, suppkey);
    an empty correlation group means SUM IS NULL → predicate false, which
    the INNER join reproduces exactly. l_quantity is integral in the
    testdata so the double half-sum is exact. Semi-join up to supplier."""
    ps = _partsupp(spark, sf_dir)
    red_parts = (
        read_table(spark, sf_dir, "part")
        .filter(F.col("p_name").like("red%"))
        .select("p_partkey")
    )
    li = read_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01")) & (F.col("l_shipdate") < F.lit("1997-01-01"))
    )
    shipped = li.groupBy("l_partkey", "l_suppkey").agg(
        (F.lit(0.5) * F.sum("l_quantity")).alias("half_qty")
    )
    qualifying = (
        ps.join(F.broadcast(red_parts), ps.ps_partkey == red_parts.p_partkey, "left_semi")
        .join(
            shipped,
            (ps.ps_partkey == shipped.l_partkey) & (ps.ps_suppkey == shipped.l_suppkey),
        )
        .filter(F.col("ps_availqty") > F.col("half_qty"))
        .select("ps_suppkey")
    )
    s = read_table(spark, sf_dir, "supplier")
    n = read_table(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_3")
    return (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(qualifying, s.s_suppkey == qualifying.ps_suppkey, "left_semi")
        .select("s_name", "s_acctbal")
        .orderBy("s_name")
    )


@q(
    "tpch_q21",
    """SELECT s_name, CAST(COUNT(*) AS BIGINT) AS numwait
       FROM supplier
            JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
            JOIN orders ON o_orderkey = l1.l_orderkey
            JOIN nation ON s_nationkey = n_nationkey
       WHERE o_orderstatus = 'F' AND l1.l_returnflag = 'R' AND n_name = 'NATION_5'
         AND EXISTS (SELECT 1 FROM lineitem l2
                     WHERE l2.l_orderkey = l1.l_orderkey
                       AND l2.l_suppkey <> l1.l_suppkey)
         AND NOT EXISTS (SELECT 1 FROM lineitem l3
                         WHERE l3.l_orderkey = l1.l_orderkey
                           AND l3.l_suppkey <> l1.l_suppkey
                           AND l3.l_returnflag = 'R')
       GROUP BY s_name
       ORDER BY numwait DESC, s_name
       LIMIT 100""",
)
def tpch_q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 suppliers who kept orders waiting (adapted).

    Testdata has no l_receiptdate/l_commitdate, so "late" is adapted to
    l_returnflag = 'R' — the EXISTS / NOT-EXISTS double correlated
    subquery over the same fact table (the hard part of Q21) is
    preserved verbatim. Spark side: the EXISTS pair becomes a left-semi
    then left-anti join on (orderkey, ≠suppkey) pairs, expressed as
    non-equi semi/anti joins on orderkey with the suppkey disequality in
    the join condition — still hash-partitionable on l_orderkey."""
    s = read_table(spark, sf_dir, "supplier")
    n = read_table(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_5")
    o = read_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    li = read_table(spark, sf_dir, "lineitem")
    l1 = li.filter(F.col("l_returnflag") == "R").alias("l1")
    l2 = li.select("l_orderkey", "l_suppkey").alias("l2")
    l3 = (
        li.filter(F.col("l_returnflag") == "R")
        .select("l_orderkey", "l_suppkey")
        .alias("l3")
    )
    waited = (
        l1.join(o, F.col("l1.l_orderkey") == o.o_orderkey, "left_semi")
        .join(
            l2,
            (F.col("l1.l_orderkey") == F.col("l2.l_orderkey"))
            & (F.col("l1.l_suppkey") != F.col("l2.l_suppkey")),
            "left_semi",
        )
        .join(
            l3,
            (F.col("l1.l_orderkey") == F.col("l3.l_orderkey"))
            & (F.col("l1.l_suppkey") != F.col("l3.l_suppkey")),
            "left_anti",
        )
    )
    return (
        waited.join(F.broadcast(s), F.col("l1.l_suppkey") == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).cast("bigint").alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(100)
    )


# =====================================================================
# Round-3 breadth: statistics, graph ranking, record linkage, TWA
# =====================================================================


@q(
    "agg_corr",
    """WITH b AS (
         SELECT l_returnflag AS flag,
                CAST(FLOOR(l_quantity) AS BIGINT) AS x,
                CAST(CAST(l_extendedprice AS DECIMAL(18,4)) * 10000 AS BIGINT) AS y
         FROM lineitem),
       s AS (
         SELECT flag,
                CAST(COUNT(*) AS DOUBLE) AS n,
                CAST(SUM(x) AS DOUBLE) AS sx,
                CAST(SUM(CAST(y AS DECIMAL(38,0))) AS DOUBLE) AS sy,
                CAST(SUM(CAST(x AS DECIMAL(38,0)) * x) AS DOUBLE) AS sxx,
                CAST(SUM(CAST(x AS DECIMAL(38,0)) * y) AS DOUBLE) AS sxy,
                CAST(SUM(CAST(y AS DECIMAL(38,0)) * y) AS DOUBLE) AS syy
         FROM b GROUP BY flag)
       SELECT flag,
              CAST(n AS BIGINT) AS n_rows,
              ((sxy - sx * sy / n) / (n - 1)) / 10000.0 AS covar_samp,
              (n * sxy - sx * sy)
                / (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy)) AS corr
       FROM s""",
)
def agg_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D+ exact two-variable statistics: Pearson correlation and sample
    covariance of (l_quantity, l_extendedprice) per return flag. Spark's
    native corr()/covar_samp() accumulate doubles in partition order —
    non-deterministic across engines AND across retries — so the moments
    are summed as exact integers instead (quantity is integral; price is
    scaled to 1e-4 units through a decimal cast), and only the FINAL
    closed-form expression runs in float: every operation in it is a
    single IEEE op on identical inputs, hence bit-identical in both
    engines. One shuffle (the groupBy); all five moments come from the
    same partial-aggregate pass, so at 100 TB this costs exactly what a
    plain sum does — map-side combine into 5 longs/decimals per group."""
    li = read_table(spark, sf_dir, "lineitem")
    b = li.select(
        F.col("l_returnflag").alias("flag"),
        F.expr("CAST(FLOOR(l_quantity) AS BIGINT)").alias("x"),
        F.expr("CAST(CAST(l_extendedprice AS DECIMAL(18,4)) * 10000 AS BIGINT)").alias("y"),
    )
    s = b.groupBy("flag").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum("x").cast("double").alias("sx"),
        F.sum(F.expr("CAST(y AS DECIMAL(38,0))")).cast("double").alias("sy"),
        F.sum(F.expr("CAST(x AS DECIMAL(38,0)) * x")).cast("double").alias("sxx"),
        F.sum(F.expr("CAST(x AS DECIMAL(38,0)) * y")).cast("double").alias("sxy"),
        F.sum(F.expr("CAST(y AS DECIMAL(38,0)) * y")).cast("double").alias("syy"),
    )
    return s.select(
        "flag",
        F.col("n").cast("bigint").alias("n_rows"),
        F.expr("((sxy - sx * sy / n) / (n - 1)) / 10000.0").alias("covar_samp"),
        F.expr(
            "(n * sxy - sx * sy)"
            " / (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy))"
        ).alias("corr"),
    )


_PAGERANK_ITER_SQL = """
       c{i} AS (
         SELECT s.dst AS node,
                SUM(CAST(FLOOR(r.pr / d.outdeg) AS BIGINT)) AS c
         FROM sym s JOIN r{p} r ON s.src = r.node JOIN deg d ON s.src = d.src
         GROUP BY s.dst),
       r{i} AS (
         SELECT node, 150000 + CAST(FLOOR(c * 85 / 100) AS BIGINT) AS pr
         FROM c{i})"""


@q(
    "graph_pagerank",
    f"""WITH {_COORDER_EDGES_SQL},
       sym AS (SELECT pa AS src, pb AS dst FROM e
               UNION ALL SELECT pb AS src, pa AS dst FROM e),
       deg AS (SELECT src, CAST(COUNT(*) AS BIGINT) AS outdeg FROM sym GROUP BY src),
       r0 AS (SELECT src AS node, CAST(1000000 AS BIGINT) AS pr FROM deg),
       {_PAGERANK_ITER_SQL.format(i=1, p=0)},
       {_PAGERANK_ITER_SQL.format(i=2, p=1)},
       {_PAGERANK_ITER_SQL.format(i=3, p=2)}
       SELECT node, pr AS pr_scaled FROM r3
       ORDER BY pr_scaled DESC, node LIMIT 20""",
)
def graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-point PageRank (damping 0.85, 3 unrolled iterations) on the
    co-purchase graph, top-20 hubs. Floats are banned from the iteration:
    ranks live as 1e-6-scaled BIGINTs and every division is the shared
    CAST(FLOOR(a/b) AS BIGINT) idiom (inputs < 2^53, so the double divide
    is exact), which makes a 3-round recursive computation bit-identical
    across engines — the same trick production graph pipelines use to get
    RETRY-deterministic ranks. Per iteration: one broadcast-sized
    (node, share) projection joined to the edge list, one shuffle on dst.
    Degree is precomputed once. At 100 TB the edge join shuffles on src
    — the natural partitioning — and a hub-heavy graph would salt `dst`
    before the contribution sum; iteration count is fixed, so lineage is
    bounded and needs no checkpoint."""
    e = _coorder_edges(spark, sf_dir)
    sym = e.select(F.col("pa").alias("src"), F.col("pb").alias("dst")).unionAll(
        e.select(F.col("pb").alias("src"), F.col("pa").alias("dst"))
    )
    deg = sym.groupBy("src").agg(F.count(F.lit(1)).cast("bigint").alias("outdeg"))
    ranks = deg.select(F.col("src").alias("node"), F.lit(1000000).cast("bigint").alias("pr"))
    for _ in range(3):
        shares = ranks.join(deg, ranks["node"] == deg["src"]).select(
            "src", F.expr("CAST(FLOOR(pr / outdeg) AS BIGINT)").alias("share")
        )
        contrib = sym.join(shares, "src").groupBy("dst").agg(F.sum("share").alias("c"))
        ranks = contrib.select(
            F.col("dst").alias("node"),
            F.expr("150000 + CAST(FLOOR(c * 85 / 100) AS BIGINT)").alias("pr"),
        )
    return ranks.orderBy(F.desc("pr"), "node").limit(20).select(
        "node", F.col("pr").alias("pr_scaled")
    )


@q(
    "join_fuzzy",
    """SELECT a.p_partkey AS probe_key, b.p_partkey AS cand_key,
              CAST(levenshtein(a.p_name, b.p_name) AS BIGINT) AS dist
       FROM part a JOIN part b
         ON split_part(a.p_name, ' ', 2) = split_part(b.p_name, ' ', 2)
        AND a.p_partkey <> b.p_partkey
       WHERE a.p_partkey % 50 = 0
         AND levenshtein(a.p_name, b.p_name) <= 2""",
)
def join_fuzzy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C+ blocked fuzzy record linkage: for a deterministic probe subset
    of parts, find near-duplicate names (levenshtein ≤ 2) WITHOUT an
    all-pairs comparison — candidate pairs come only from an equi-join on
    a blocking key (the name's noun token), so the comparison count is
    sum(|block_a|·|block_b|), not n². This is the standard entity-
    resolution shape: at 100 TB the block key shuffles both sides
    (co-partitioned equi-join), the edit-distance filter runs inside the
    join stage JVM-side (Spark's levenshtein is codegen'd), and skewed
    blocks are the documented salting case. Probe restriction stands in
    for the real workload's 'new batch vs reference' asymmetry."""
    part = read_table(spark, sf_dir, "part")
    blocked = part.withColumn("blk", F.expr("split_part(p_name, ' ', 2)"))
    a = blocked.filter(F.col("p_partkey") % 50 == 0).select(
        F.col("p_partkey").alias("probe_key"), F.col("p_name").alias("a_name"), "blk"
    )
    b = blocked.select(
        F.col("p_partkey").alias("cand_key"), F.col("p_name").alias("b_name"), "blk"
    )
    return (
        a.join(b, "blk")
        .filter(F.col("probe_key") != F.col("cand_key"))
        .filter(F.levenshtein("a_name", "b_name") <= 2)
        .select(
            "probe_key",
            "cand_key",
            F.levenshtein("a_name", "b_name").cast("bigint").alias("dist"),
        )
    )


@q(
    "win_time_weighted",
    """WITH s AS (
         SELECT user_id, value, epoch_us(ts) AS t, event_id FROM events),
       d AS (
         SELECT user_id, value,
                CAST(FLOOR((LEAD(t) OVER (PARTITION BY user_id ORDER BY t, event_id) - t)
                           / 1000000) AS BIGINT) AS dt_s
         FROM s)
       SELECT user_id,
              CAST(COUNT(*) AS BIGINT) AS n_segments,
              CAST(SUM(dt_s) AS BIGINT) AS span_s,
              CAST(SUM(CAST(value AS DECIMAL(18,4)) * CAST(dt_s AS DECIMAL(18,0))) AS DOUBLE)
                / CAST(SUM(dt_s) AS DOUBLE) AS twa
       FROM d WHERE dt_s IS NOT NULL AND dt_s > 0
       GROUP BY user_id""",
)
def win_time_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E+ time-weighted average (step interpolation): each reading holds
    until the next one, so its weight is the gap to the successor — the
    metric a billing/telemetry system wants when samples are irregular
    (a plain avg over-weights bursts). One lead() per user stream gives
    the segment lengths; the weighted sum runs in DECIMAL (value at 1e-4
    resolution × whole seconds — exact, associative, shuffle-order-proof)
    with a single final double divide. Scale: one shuffle on user_id for
    the window, the aggregation reuses that partitioning (no second
    exchange); segments with dt=0 (same-second readings) drop out
    identically in both engines via the floored-seconds filter."""
    ev = read_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("t", "event_id")
    d = (
        ev.select("user_id", "value", F.unix_micros("ts").alias("t"), "event_id")
        .withColumn("_lead_t", F.lead("t").over(w))
        .withColumn("dt_s", F.expr("CAST(FLOOR((_lead_t - t) / 1000000) AS BIGINT)"))
    )
    return (
        d.filter(F.col("dt_s").isNotNull() & (F.col("dt_s") > 0))
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_segments"),
            F.sum("dt_s").cast("bigint").alias("span_s"),
            (
                F.sum(
                    F.expr("CAST(value AS DECIMAL(18,4)) * CAST(dt_s AS DECIMAL(18,0))")
                ).cast("double")
                / F.sum("dt_s").cast("double")
            ).alias("twa"),
        )
    )


@q(
    "agg_bitagg",
    """SELECT CAST(user_id % 16 AS BIGINT) AS g,
              CAST(COUNT(*) AS BIGINT) AS n,
              CAST(bit_or(event_id) AS BIGINT) AS b_or,
              CAST(bit_and(event_id) AS BIGINT) AS b_and,
              CAST(bit_xor(event_id) AS BIGINT) AS b_xor
       FROM events GROUP BY user_id % 16""",
)
def agg_bitagg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D+ bitwise aggregates: OR/AND/XOR-fold of a key per group — the
    primitive behind roaring-bitmap-style set encodings, permission-mask
    rollups, and parity checks. All three are associative+commutative, so
    Spark computes them map-side (partial aggregate) exactly like a sum;
    one shuffle of 16 tiny groups regardless of input size — the ideal
    100 TB aggregation shape."""
    ev = read_table(spark, sf_dir, "events")
    return ev.groupBy((F.col("user_id") % 16).cast("bigint").alias("g")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.expr("bit_or(event_id)").cast("bigint").alias("b_or"),
        F.expr("bit_and(event_id)").cast("bigint").alias("b_and"),
        F.expr("bit_xor(event_id)").cast("bigint").alias("b_xor"),
    )


@q(
    "win_streak",
    """WITH days AS (
         SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events),
       s AS (
         SELECT user_id, d,
                ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY d) AS rn
         FROM days),
       isl AS (SELECT user_id, d - CAST(rn AS INTEGER) AS grp FROM s),
       streaks AS (
         SELECT user_id, grp, COUNT(*) AS len FROM isl GROUP BY user_id, grp)
       SELECT user_id,
              CAST(MAX(len) AS BIGINT) AS max_streak,
              CAST(COUNT(*) AS BIGINT) AS n_streaks,
              CAST(SUM(len) AS BIGINT) AS active_days
       FROM streaks GROUP BY user_id""",
)
def win_streak(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E+ calendar gaps-and-islands: longest consecutive-day activity
    streak per user (the engagement metric every product dashboard has).
    Classic island id = date − row_number(): consecutive days share the
    difference, a gap shifts it. win_gaps finds holes in an ID sequence;
    this is its calendar twin over DISTINCT active days. One shuffle on
    user_id serves the distinct, the window, and both aggregations —
    Spark reuses the hash partitioning across all four stages, which is
    exactly the single-exchange plan you want at 100 TB."""
    ev = read_table(spark, sf_dir, "events")
    days = ev.select("user_id", F.col("ts").cast("date").alias("d")).distinct()
    w = Window.partitionBy("user_id").orderBy("d")
    isl = days.withColumn("rn", F.row_number().over(w)).select(
        "user_id", F.expr("date_sub(d, CAST(rn AS INT))").alias("grp")
    )
    streaks = isl.groupBy("user_id", "grp").agg(F.count(F.lit(1)).alias("len"))
    return streaks.groupBy("user_id").agg(
        F.max("len").cast("bigint").alias("max_streak"),
        F.count(F.lit(1)).cast("bigint").alias("n_streaks"),
        F.sum("len").cast("bigint").alias("active_days"),
    )


@q(
    "text_tfidf",
    """WITH w AS (
         SELECT doc_id, unnest(string_split(trim(text), ' ')) AS term
         FROM documents),
       tf AS (
         SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
         FROM w WHERE term <> '' GROUP BY doc_id, term),
       df AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY term),
       n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents),
       sc AS (
         SELECT t.doc_id, t.term, t.tf,
                t.tf * CAST(FLOOR(1000000 * n.n_docs / d.df) AS BIGINT) AS score
         FROM tf t JOIN df d ON t.term = d.term CROSS JOIN n
         WHERE t.doc_id % 20 = 0),
       rk AS (
         SELECT doc_id, term, tf, score,
                ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY score DESC, term) AS rn
         FROM sc)
       SELECT doc_id, term, tf, score FROM rk WHERE rn <= 3""",
)
def text_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K4+ TF-IDF keyword extraction: top-3 most characteristic terms per
    document (probe subset keeps output bounded). IDF is integer-scaled
    — floor(1e6·N/df) — instead of ln(N/df): libm log implementations
    are not guaranteed bit-identical across engines, and monotone
    transforms preserve the ranking, so the integer form gives the same
    top-k with exact cross-engine determinism. Plan shape at 100 TB:
    token explode → (doc,term) partial-agg, df is a second agg over the
    *already deduplicated* tf table (much smaller than the token stream),
    N is a 1-row broadcast scalar (whitelisted BNLJ), and top-k is a
    bounded window per doc. No float, no all-pairs, no driver loop."""
    docs = read_table(spark, sf_dir, "documents")
    w_ = docs.select(
        "doc_id", F.explode(F.split(F.trim("text"), " ")).alias("term")
    ).filter(F.col("term") != "")
    tf = w_.groupBy("doc_id", "term").agg(F.count(F.lit(1)).cast("bigint").alias("tf"))
    df_ = tf.groupBy("term").agg(F.count(F.lit(1)).cast("bigint").alias("df"))
    n = docs.agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"))
    sc = (
        tf.filter(F.col("doc_id") % 20 == 0)
        .join(df_, "term")
        .crossJoin(F.broadcast(n))
        .withColumn(
            "score",
            F.expr("tf * CAST(FLOOR(1000000 * n_docs / df) AS BIGINT)"),
        )
    )
    wk = Window.partitionBy("doc_id").orderBy(F.desc("score"), "term")
    return (
        sc.withColumn("rn", F.row_number().over(wk))
        .filter(F.col("rn") <= 3)
        .select("doc_id", "term", "tf", "score")
    )


@q(
    "win_attribution",
    """WITH s AS (
         SELECT user_id, event_id, event_type, epoch_us(ts) AS t FROM events),
       a AS (
         SELECT user_id, event_id, event_type, t,
                MAX(CASE WHEN event_type = 'click' THEN t END) OVER
                  (PARTITION BY user_id ORDER BY t, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS last_click_t
         FROM s)
       SELECT user_id, event_id AS purchase_id,
              CAST(t - last_click_t AS BIGINT) AS latency_us
       FROM a
       WHERE event_type = 'purchase' AND last_click_t IS NOT NULL
         AND t - last_click_t <= 604800000000""",
)
def win_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E+ last-touch attribution: tie each purchase to the most recent
    preceding click by the same user within a 7-day window — the core of
    every marketing-attribution pipeline. One conditional running-max
    (MAX(CASE WHEN click)) over the user's event stream replaces the
    naive purchase×click self-join (which is quadratic per user); the
    single window shuffle on user_id is the whole cost, so the plan is
    identical at 100 TB. Timestamps stay integer micros end-to-end."""
    ev = read_table(spark, sf_dir, "events")
    s = ev.select(
        "user_id", "event_id", "event_type", F.unix_micros("ts").alias("t")
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("t", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    a = s.withColumn(
        "last_click_t",
        F.max(F.when(F.col("event_type") == "click", F.col("t"))).over(w),
    )
    return a.filter(
        (F.col("event_type") == "purchase")
        & F.col("last_click_t").isNotNull()
        & (F.col("t") - F.col("last_click_t") <= 604800000000)
    ).select(
        "user_id",
        F.col("event_id").alias("purchase_id"),
        (F.col("t") - F.col("last_click_t")).cast("bigint").alias("latency_us"),
    )


_MOMENT_VAR = "(s2 / n - (s1 / n) * (s1 / n))"
_MOMENT_SKEW = (
    "(s3 / n - 3 * (s1 / n) * (s2 / n)"
    " + 2 * (s1 / n) * (s1 / n) * (s1 / n))"
    f" / ({_MOMENT_VAR} * sqrt({_MOMENT_VAR}))"
)
_MOMENT_KURT = (
    "(s4 / n - 4 * (s1 / n) * (s3 / n)"
    " + 6 * (s1 / n) * (s1 / n) * (s2 / n)"
    " - 3 * (s1 / n) * (s1 / n) * (s1 / n) * (s1 / n))"
    f" / ({_MOMENT_VAR} * {_MOMENT_VAR}) - 3"
)


@q(
    "agg_moments",
    f"""WITH b AS (
         SELECT l_returnflag AS flag, CAST(FLOOR(l_quantity) AS BIGINT) AS x
         FROM lineitem),
       s AS (
         SELECT flag,
                CAST(COUNT(*) AS DOUBLE) AS n,
                CAST(SUM(x) AS DOUBLE) AS s1,
                CAST(SUM(x * x) AS DOUBLE) AS s2,
                CAST(SUM(x * x * x) AS DOUBLE) AS s3,
                CAST(SUM(x * x * x * x) AS DOUBLE) AS s4
         FROM b GROUP BY flag)
       SELECT flag, CAST(n AS BIGINT) AS n_rows,
              s1 / n AS mean,
              {_MOMENT_VAR} AS var_pop,
              {_MOMENT_SKEW} AS skew,
              {_MOMENT_KURT} AS kurt_excess
       FROM s""",
)
def agg_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D+ exact higher moments: population variance, skewness, excess
    kurtosis of l_quantity per return flag from raw integer power sums
    (quantity ≤ 50, so x⁴ sums stay < 2^53 — every sum is exact and its
    double image is exact). The closed-form moment expressions are the
    SAME text in Spark and the oracle, so each IEEE op sequence is
    identical → bit-identical floats, unlike the engines' built-in
    skewness()/kurtosis() whose accumulation order varies by partition.
    m2^1.5 is written m2·sqrt(m2) (single correctly-rounded ops), never
    pow() — libm pow is not cross-engine stable. One partial-agg pass,
    5 longs per group: the cheapest possible 100 TB statistics scan."""
    li = read_table(spark, sf_dir, "lineitem")
    b = li.select(
        F.col("l_returnflag").alias("flag"),
        F.expr("CAST(FLOOR(l_quantity) AS BIGINT)").alias("x"),
    )
    s = b.groupBy("flag").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum("x").cast("double").alias("s1"),
        F.sum(F.expr("x * x")).cast("double").alias("s2"),
        F.sum(F.expr("x * x * x")).cast("double").alias("s3"),
        F.sum(F.expr("x * x * x * x")).cast("double").alias("s4"),
    )
    return s.select(
        "flag",
        F.col("n").cast("bigint").alias("n_rows"),
        F.expr("s1 / n").alias("mean"),
        F.expr(_MOMENT_VAR).alias("var_pop"),
        F.expr(_MOMENT_SKEW).alias("skew"),
        F.expr(_MOMENT_KURT).alias("kurt_excess"),
    )


@q(
    "agg_rfm",
    """WITH cust AS (
         SELECT c.c_custkey, c.c_nationkey,
                CAST(date_diff('day', CAST(MAX(o.o_orderdate) AS DATE),
                               DATE '2002-01-01') AS BIGINT) AS rec_days,
                CAST(COUNT(*) AS BIGINT) AS freq,
                CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS mon
         FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
         GROUP BY c.c_custkey, c.c_nationkey),
       qq AS (
         SELECT c_custkey, c_nationkey,
                NTILE(4) OVER (PARTITION BY c_nationkey
                               ORDER BY rec_days, c_custkey) AS r_q,
                NTILE(4) OVER (PARTITION BY c_nationkey
                               ORDER BY freq DESC, c_custkey) AS f_q,
                NTILE(4) OVER (PARTITION BY c_nationkey
                               ORDER BY mon DESC, c_custkey) AS m_q
         FROM cust)
       SELECT CAST(c_nationkey AS BIGINT) AS nation, c_custkey,
              CAST(r_q AS BIGINT) AS r_q, CAST(f_q AS BIGINT) AS f_q,
              CAST(m_q AS BIGINT) AS m_q,
              CAST(r_q * 100 + f_q * 10 + m_q AS BIGINT) AS segment
       FROM qq""",
)
def agg_rfm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D+ RFM segmentation: quartile-code every customer on recency /
    frequency / monetary within their nation (partitioned quartiles keep
    the window distributed — a GLOBAL ntile would single-task, the exact
    anti-pattern the plan audit flags). Recency anchors on a fixed date
    so reruns are stable; monetary sums in decimal. Ties break on
    c_custkey so ntile is deterministic in both engines. Plan: one agg
    shuffle on custkey, one window shuffle on nationkey — both keyed,
    both AQE-coalescible at 100 TB."""
    c = read_table(spark, sf_dir, "customer")
    o = read_table(spark, sf_dir, "orders")
    cust = (
        c.join(o, c["c_custkey"] == o["o_custkey"])
        .groupBy("c_custkey", "c_nationkey")
        .agg(
            F.expr(
                "CAST(datediff(DATE '2002-01-01', CAST(MAX(o_orderdate) AS DATE)) AS BIGINT)"
            ).alias("rec_days"),
            F.count(F.lit(1)).cast("bigint").alias("freq"),
            F.sum(dec("o_totalprice")).cast("double").alias("mon"),
        )
    )
    pb = Window.partitionBy("c_nationkey")
    qq = cust.select(
        "c_custkey",
        "c_nationkey",
        F.ntile(4).over(pb.orderBy("rec_days", "c_custkey")).alias("r_q"),
        F.ntile(4).over(pb.orderBy(F.desc("freq"), "c_custkey")).alias("f_q"),
        F.ntile(4).over(pb.orderBy(F.desc("mon"), "c_custkey")).alias("m_q"),
    )
    return qq.select(
        F.col("c_nationkey").cast("bigint").alias("nation"),
        "c_custkey",
        F.col("r_q").cast("bigint").alias("r_q"),
        F.col("f_q").cast("bigint").alias("f_q"),
        F.col("m_q").cast("bigint").alias("m_q"),
        (F.col("r_q") * 100 + F.col("f_q") * 10 + F.col("m_q"))
        .cast("bigint")
        .alias("segment"),
    )


@q(
    "qa_integrity",
    """SELECT 'orphan_lineitems' AS chk, CAST(COUNT(*) AS BIGINT) AS n_bad
       FROM lineitem l LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey
       WHERE o.o_orderkey IS NULL
       UNION ALL
       SELECT 'childless_orders', CAST(COUNT(*) AS BIGINT)
       FROM orders o LEFT JOIN (SELECT DISTINCT l_orderkey FROM lineitem) l
         ON o.o_orderkey = l.l_orderkey
       WHERE l.l_orderkey IS NULL
       UNION ALL
       SELECT 'orders_bad_customer', CAST(COUNT(*) AS BIGINT)
       FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
       WHERE c.c_custkey IS NULL
       UNION ALL
       SELECT 'customers_no_orders', CAST(COUNT(*) AS BIGINT)
       FROM customer c LEFT JOIN (SELECT DISTINCT o_custkey FROM orders) o
         ON c.c_custkey = o.o_custkey
       WHERE o.o_custkey IS NULL
       UNION ALL
       SELECT 'dup_orderkeys', CAST(COUNT(*) AS BIGINT) FROM (
         SELECT o_orderkey FROM orders GROUP BY o_orderkey HAVING COUNT(*) > 1)
       UNION ALL
       SELECT 'null_order_dates', CAST(COUNT(*) AS BIGINT)
       FROM orders WHERE o_orderdate IS NULL""",
)
def qa_integrity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5+ referential-integrity audit: the post-ingest QA gate a
    warehouse runs before publishing a snapshot — orphan facts, childless
    parents, dangling FKs, duplicate PKs, null partitions keys — one row
    per check. Spark side uses left_anti joins (the oracle spells them
    LEFT JOIN … IS NULL — same cardinality); every check is an equi-join
    or grouped count, so the audit costs a handful of keyed shuffles and
    each anti-join broadcast-prunes when the parent side is small. The
    fixed 6-row output makes it a cheap per-batch CI assertion at any
    scale."""
    li = read_table(spark, sf_dir, "lineitem")
    o = read_table(spark, sf_dir, "orders")
    c = read_table(spark, sf_dir, "customer")

    def chk(name: str, df: DataFrame) -> DataFrame:
        return df.agg(F.count(F.lit(1)).cast("bigint").alias("n_bad")).select(
            F.lit(name).alias("chk"), "n_bad"
        )

    dup = o.groupBy("o_orderkey").agg(F.count(F.lit(1)).alias("c")).filter("c > 1")
    return (
        chk("orphan_lineitems", li.join(o, li["l_orderkey"] == o["o_orderkey"], "left_anti"))
        .unionAll(chk("childless_orders", o.join(li, o["o_orderkey"] == li["l_orderkey"], "left_anti")))
        .unionAll(chk("orders_bad_customer", o.join(c, o["o_custkey"] == c["c_custkey"], "left_anti")))
        .unionAll(chk("customers_no_orders", c.join(o, c["c_custkey"] == o["o_custkey"], "left_anti")))
        .unionAll(chk("dup_orderkeys", dup))
        .unionAll(chk("null_order_dates", o.filter(F.col("o_orderdate").isNull())))
    )


@q(
    "win_outlier",
    """WITH b AS (
         SELECT user_id, event_id, event_type,
                CAST(CAST(value AS DECIMAL(18,4)) * 10000 AS BIGINT) AS y
         FROM events),
       st AS (
         SELECT event_type,
                CAST(COUNT(*) AS DOUBLE) AS n,
                CAST(SUM(y) AS DOUBLE) AS sy,
                CAST(SUM(CAST(y AS DECIMAL(38,0)) * y) AS DOUBLE) AS syy
         FROM b GROUP BY event_type),
       z AS (
         SELECT b.user_id, b.event_id, b.event_type,
                (CAST(b.y AS DOUBLE) - st.sy / st.n)
                  / sqrt(st.syy / st.n - (st.sy / st.n) * (st.sy / st.n)) AS z
         FROM b JOIN st ON b.event_type = st.event_type)
       SELECT user_id, event_id, event_type, z FROM z WHERE abs(z) > 2""",
)
def win_outlier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D+ z-score anomaly flagging: events whose value sits > 2σ from
    their type's mean. Two-pass shape — exact integer/decimal moment
    sums per type (5 rows), broadcast-hash-joined back onto the stream —
    NOT a window over the whole table, so nothing single-tasks and the
    stats side is constant-size at any scale. The z expression is the
    same text in both engines (single IEEE ops on identical inputs →
    identical bits). The 1e-4 fixed-point scaling cancels in z."""
    ev = read_table(spark, sf_dir, "events")
    b = ev.select(
        "user_id",
        "event_id",
        "event_type",
        F.expr("CAST(CAST(value AS DECIMAL(18,4)) * 10000 AS BIGINT)").alias("y"),
    )
    st = b.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum("y").cast("double").alias("sy"),
        F.sum(F.expr("CAST(y AS DECIMAL(38,0)) * y")).cast("double").alias("syy"),
    )
    z = b.join(F.broadcast(st), "event_type").withColumn(
        "z",
        F.expr(
            "(CAST(y AS DOUBLE) - sy / n)"
            " / sqrt(syy / n - (sy / n) * (sy / n))"
        ),
    )
    return z.filter(F.abs(F.col("z")) > 2).select(
        "user_id", "event_id", "event_type", "z"
    )


@q(
    "agg_hhi",
    """WITH y AS (
         SELECT s.s_nationkey AS nation, l.l_suppkey AS supp,
                CAST(CAST(l.l_extendedprice AS DECIMAL(18,4)) * 10000 AS BIGINT) AS yc
         FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey),
       rev AS (SELECT nation, supp, SUM(yc) AS rev_c FROM y GROUP BY nation, supp),
       tot AS (SELECT nation, SUM(rev_c) AS tot_c FROM rev GROUP BY nation),
       sh AS (
         SELECT r.nation,
                CAST(FLOOR(1000000 * r.rev_c / t.tot_c) AS BIGINT) AS ppm
         FROM rev r JOIN tot t ON r.nation = t.nation)
       SELECT CAST(nation AS BIGINT) AS nation,
              CAST(COUNT(*) AS BIGINT) AS n_suppliers,
              CAST(SUM(ppm * ppm) AS BIGINT) AS hhi_ppm2
       FROM sh GROUP BY nation""",
)
def agg_hhi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D+ market concentration (Herfindahl–Hirschman index): per nation,
    sum of squared supplier revenue shares — the antitrust/risk metric,
    and a useful skew diagnostic for partitioning decisions. Shares are
    parts-per-million integers (floor of a division whose operands are
    identical exact bigints in both engines), so the index is exact —
    no float share accumulation. Revenue rolls up in integer 1e-4 units.
    Plan: fact-side partial agg on (nation,supp) → 25-row total broadcast
    → tiny squared-share agg; the only big shuffle is the first keyed
    aggregation, which is unavoidable and map-combined."""
    li = read_table(spark, sf_dir, "lineitem")
    s = read_table(spark, sf_dir, "supplier")
    y = li.join(F.broadcast(s), li["l_suppkey"] == s["s_suppkey"]).select(
        F.col("s_nationkey").alias("nation"),
        F.col("l_suppkey").alias("supp"),
        F.expr("CAST(CAST(l_extendedprice AS DECIMAL(18,4)) * 10000 AS BIGINT)").alias("yc"),
    )
    rev = y.groupBy("nation", "supp").agg(F.sum("yc").alias("rev_c"))
    tot = rev.groupBy("nation").agg(F.sum("rev_c").alias("tot_c"))
    sh = rev.join(F.broadcast(tot), "nation").select(
        "nation", F.expr("CAST(FLOOR(1000000 * rev_c / tot_c) AS BIGINT)").alias("ppm")
    )
    return sh.groupBy(F.col("nation").cast("bigint").alias("nation")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_suppliers"),
        F.sum(F.expr("ppm * ppm")).cast("bigint").alias("hhi_ppm2"),
    )


@q(
    "sample_weighted",
    """SELECT doc_id, source, n_chars
       FROM documents
       WHERE CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT) % 1000
             < least(n_chars, 1000)""",
)
def sample_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K+ deterministic importance sampling: keep each document with
    probability proportional to its weight (here n_chars, capped at the
    1000 scale) — the length-weighted draw a training-mix builder uses so
    long documents aren't under-represented per-document. The coin is the
    60-bit md5 of the key, so the decision is a pure map-side filter:
    reproducible across runs/retries/engines, no RNG state, no shuffle,
    and it composes with pushdown (the filter reaches the scan). Same
    hash idiom as sample_hash; the weight just modulates the threshold."""
    docs = read_table(spark, sf_dir, "documents")
    h = F.expr(
        "CAST(conv(substring(md5(CAST(doc_id AS STRING)), 1, 15), 16, 10) AS BIGINT)"
    )
    return docs.filter(h % 1000 < F.least("n_chars", F.lit(1000))).select(
        "doc_id", "source", "n_chars"
    )


@q(
    "emb_norm_hist",
    """WITH n2 AS (
         SELECT vec_id,
                list_sum(list_transform(embedding,
                  x -> CAST(FLOOR(CAST(x AS DOUBLE) * 1000000) AS BIGINT)
                       * CAST(FLOOR(CAST(x AS DOUBLE) * 1000000) AS BIGINT))) AS norm2_q
         FROM embeddings)
       SELECT CAST(FLOOR(norm2_q / 100000) AS BIGINT) AS bucket,
              CAST(COUNT(*) AS BIGINT) AS n
       FROM n2 GROUP BY bucket""",
)
def emb_norm_hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K3+ embedding QA: histogram of squared L2 norms — the first check
    before any cosine-based dedup/ANN (un-normalized vectors silently
    break cosine ≈ dot shortcuts; this table IS normalized, and the
    histogram proves it instead of assuming it). Elements quantize to
    1e-6 integers (float32 widened to double first so both engines run
    the identical multiply), the squared sum is pure integer fold inside
    a higher-order function — no Python, no explode, no shuffle until
    the 15-bucket count. Map-side cost is 64 multiplies/row: the same
    whole-stage-codegen'd loop at any scale."""
    emb = read_table(spark, sf_dir, "embeddings")
    qsq = (
        "aggregate(transform(embedding,"
        " x -> CAST(FLOOR(CAST(x AS DOUBLE) * 1000000) AS BIGINT)"
        " * CAST(FLOOR(CAST(x AS DOUBLE) * 1000000) AS BIGINT)),"
        " CAST(0 AS BIGINT), (a, b) -> a + b)"
    )
    n2 = emb.select(F.expr(qsq).alias("norm2_q"))
    return n2.groupBy(
        F.expr("CAST(FLOOR(norm2_q / 100000) AS BIGINT)").alias("bucket")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n"))


@q(
    "qa_profile",
    """SELECT 'o_orderkey' AS col,
              CAST(COUNT(*) - COUNT(o_orderkey) AS BIGINT) AS n_null,
              CAST(COUNT(DISTINCT o_orderkey) AS BIGINT) AS n_distinct,
              CAST(MIN(o_orderkey) AS VARCHAR) AS min_s,
              CAST(MAX(o_orderkey) AS VARCHAR) AS max_s
       FROM orders
       UNION ALL
       SELECT 'o_custkey', CAST(COUNT(*) - COUNT(o_custkey) AS BIGINT),
              CAST(COUNT(DISTINCT o_custkey) AS BIGINT),
              CAST(MIN(o_custkey) AS VARCHAR), CAST(MAX(o_custkey) AS VARCHAR)
       FROM orders
       UNION ALL
       SELECT 'o_orderstatus', CAST(COUNT(*) - COUNT(o_orderstatus) AS BIGINT),
              CAST(COUNT(DISTINCT o_orderstatus) AS BIGINT),
              MIN(o_orderstatus), MAX(o_orderstatus)
       FROM orders
       UNION ALL
       SELECT 'o_orderpriority', CAST(COUNT(*) - COUNT(o_orderpriority) AS BIGINT),
              CAST(COUNT(DISTINCT o_orderpriority) AS BIGINT),
              MIN(o_orderpriority), MAX(o_orderpriority)
       FROM orders
       UNION ALL
       SELECT 'o_orderdate', CAST(COUNT(*) - COUNT(o_orderdate) AS BIGINT),
              CAST(COUNT(DISTINCT CAST(o_orderdate AS DATE)) AS BIGINT),
              CAST(MIN(CAST(o_orderdate AS DATE)) AS VARCHAR),
              CAST(MAX(CAST(o_orderdate AS DATE)) AS VARCHAR)
       FROM orders""",
)
def qa_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5+ column profiler: null count, exact distinct count, min/max per
    column — the stats block a catalog/data-contract check publishes per
    snapshot. One row per column via UNION ALL of single-pass aggregates
    (Catalyst shares the scan). Doubles are deliberately absent: float
    min/max→string formatting differs across engines, and a profile's
    numeric columns are served by the typed stats keys (agg_stats);
    dates render as ISO in both engines. Distinct counts are exact here;
    the approx key family covers the sketch path for 100 TB cardinality."""
    o = read_table(spark, sf_dir, "orders")

    def prof(col: str, expr_col, minmax_str: bool) -> DataFrame:
        c = expr_col
        mn = F.min(c) if minmax_str else F.min(c).cast("string")
        mx = F.max(c) if minmax_str else F.max(c).cast("string")
        return o.agg(
            (F.count(F.lit(1)) - F.count(c)).cast("bigint").alias("n_null"),
            F.countDistinct(c).cast("bigint").alias("n_distinct"),
            mn.alias("min_s"),
            mx.alias("max_s"),
        ).select(F.lit(col).alias("col"), "n_null", "n_distinct", "min_s", "max_s")

    return (
        prof("o_orderkey", F.col("o_orderkey"), False)
        .unionAll(prof("o_custkey", F.col("o_custkey"), False))
        .unionAll(prof("o_orderstatus", F.col("o_orderstatus"), True))
        .unionAll(prof("o_orderpriority", F.col("o_orderpriority"), True))
        .unionAll(prof("o_orderdate", F.col("o_orderdate").cast("date"), False))
    )


@q(
    "interval_density",
    """WITH b AS (
         SELECT CAST(FLOOR(epoch_us(ts) / 1000000 / 900) * 900 AS BIGINT) AS w
         FROM events),
       lim AS (SELECT MIN(w) AS lo, MAX(w) AS hi FROM b),
       spine AS (SELECT unnest(range(lo, hi + 900, 900)) AS win_start FROM lim),
       cnt AS (SELECT w AS win_start, CAST(COUNT(*) AS BIGINT) AS n
               FROM b GROUP BY w)
       SELECT s.win_start, COALESCE(c.n, CAST(0 AS BIGINT)) AS n
       FROM spine s LEFT JOIN cnt c ON s.win_start = c.win_start""",
)
def interval_density(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H4+ zero-filled time density: events per 15-minute bin INCLUDING
    empty bins — the gap a plain GROUP BY silently hides and exactly what
    monitoring/alerting needs (a zero row IS the signal). The spine
    explodes from a 1-row min/max scalar (whitelisted broadcast; bin
    count = time-range/900 regardless of data volume), the counts side
    is one keyed agg, and the left join zero-fills. DuckDB's range() is
    stop-exclusive vs Spark's inclusive sequence() — the oracle adds one
    stride to compensate (documented engine trap)."""
    ev = read_table(spark, sf_dir, "events")
    b = ev.select(
        F.expr("CAST(FLOOR(unix_micros(ts) / 1000000 / 900) * 900 AS BIGINT)").alias("w")
    )
    lim = b.agg(F.min("w").alias("lo"), F.max("w").alias("hi"))
    spine = lim.select(
        F.explode(F.expr("sequence(lo, hi, CAST(900 AS BIGINT))")).alias("win_start")
    )
    cnt = b.groupBy(F.col("w").alias("win_start")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    return spine.join(cnt, "win_start", "left").select(
        "win_start", F.coalesce("n", F.lit(0).cast("bigint")).alias("n")
    )


@q(
    "graph_markov",
    """WITH s AS (
         SELECT user_id, event_type, epoch_us(ts) AS t, event_id FROM events),
       tr AS (
         SELECT LAG(event_type) OVER (PARTITION BY user_id
                                      ORDER BY t, event_id) AS prev,
                event_type AS nxt
         FROM s),
       cnt AS (
         SELECT prev, nxt, CAST(COUNT(*) AS BIGINT) AS n
         FROM tr WHERE prev IS NOT NULL GROUP BY prev, nxt),
       tot AS (SELECT prev, SUM(n) AS tot FROM cnt GROUP BY prev)
       SELECT c.prev, c.nxt, c.n,
              CAST(FLOOR(1000000 * c.n / t.tot) AS BIGINT) AS p_ppm
       FROM cnt c JOIN tot t ON c.prev = t.prev""",
)
def graph_markov(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E+ first-order Markov transition matrix of the event stream: for
    each (previous type → next type) pair, the count and the transition
    probability in exact ppm — the clickstream model behind next-action
    prediction and funnel leak analysis. One lag() per user stream (the
    only big shuffle), then two tiny aggregations; probabilities use the
    shared floor-division idiom so the matrix is bit-stable. At 100 TB
    the lag window shuffles once on user_id and the |types|² matrix stays
    constant-size."""
    ev = read_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("t", "event_id")
    tr = (
        ev.select("user_id", "event_type", F.unix_micros("ts").alias("t"), "event_id")
        .select(F.lag("event_type").over(w).alias("prev"), F.col("event_type").alias("nxt"))
        .filter(F.col("prev").isNotNull())
    )
    cnt = tr.groupBy("prev", "nxt").agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    tot = cnt.groupBy("prev").agg(F.sum("n").alias("tot"))
    return cnt.join(tot, "prev").select(
        "prev",
        "nxt",
        "n",
        F.expr("CAST(FLOOR(1000000 * n / tot) AS BIGINT)").alias("p_ppm"),
    )


@q(
    "agg_gini",
    """WITH y AS (
         SELECT s.s_nationkey AS nation, l.l_suppkey AS supp,
                CAST(CAST(l.l_extendedprice AS DECIMAL(18,4)) * 10000 AS BIGINT) AS yc
         FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey),
       rev AS (SELECT nation, supp, SUM(yc) AS rev_c FROM y GROUP BY nation, supp),
       rk AS (
         SELECT nation, rev_c,
                ROW_NUMBER() OVER (PARTITION BY nation
                                   ORDER BY rev_c, supp) AS i
         FROM rev),
       s AS (
         SELECT nation,
                CAST(COUNT(*) AS DOUBLE) AS n,
                CAST(SUM(CAST(i AS DECIMAL(38,0)) * rev_c) AS DOUBLE) AS sixi,
                CAST(SUM(CAST(rev_c AS DECIMAL(38,0))) AS DOUBLE) AS sx
         FROM rk GROUP BY nation)
       SELECT CAST(nation AS BIGINT) AS nation, CAST(n AS BIGINT) AS n_suppliers,
              2 * sixi / (n * sx) - (n + 1) / n AS gini
       FROM s""",
)
def agg_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D+ Gini coefficient of supplier revenue per nation — the
    inequality twin of agg_hhi's concentration index (and a practical
    partition-skew diagnostic: gini of bytes-per-key predicts shuffle
    stragglers). Computed from the rank-weighted closed form over exact
    integer revenues: one keyed agg, one rank window partitioned by
    nation, one final single-expression float (identical text both
    engines → bit-identical). Ranks tie-break on supp for determinism."""
    li = read_table(spark, sf_dir, "lineitem")
    s = read_table(spark, sf_dir, "supplier")
    y = li.join(F.broadcast(s), li["l_suppkey"] == s["s_suppkey"]).select(
        F.col("s_nationkey").alias("nation"),
        F.col("l_suppkey").alias("supp"),
        F.expr("CAST(CAST(l_extendedprice AS DECIMAL(18,4)) * 10000 AS BIGINT)").alias("yc"),
    )
    rev = y.groupBy("nation", "supp").agg(F.sum("yc").alias("rev_c"))
    rk = rev.withColumn(
        "i",
        F.row_number().over(Window.partitionBy("nation").orderBy("rev_c", "supp")),
    )
    agg = rk.groupBy("nation").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum(F.expr("CAST(i AS DECIMAL(38,0)) * rev_c")).cast("double").alias("sixi"),
        F.sum(F.expr("CAST(rev_c AS DECIMAL(38,0))")).cast("double").alias("sx"),
    )
    return agg.select(
        F.col("nation").cast("bigint").alias("nation"),
        F.col("n").cast("bigint").alias("n_suppliers"),
        F.expr("2 * sixi / (n * sx) - (n + 1) / n").alias("gini"),
    )


_IVS_2SET_SQL = """
  ivs AS (
    SELECT CAST(s_suppkey % 2 AS INTEGER) AS st,
           CAST(s_suppkey % 5 AS VARCHAR) AS chromosome,
           CAST(s_suppkey * 97 + 1 AS BIGINT) AS b,
           CAST(s_suppkey * 97 + 1 + 200 + (s_suppkey % 7) * 500 AS BIGINT) AS e
    FROM supplier),
  o AS (
    SELECT st, chromosome, b, e,
           CASE WHEN MAX(e) OVER w IS NULL OR b > MAX(e) OVER w
                THEN 1 ELSE 0 END AS ni
    FROM ivs
    WINDOW w AS (PARTITION BY st, chromosome ORDER BY b, e
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)),
  sr AS (
    SELECT st, chromosome, b, e,
           SUM(ni) OVER (PARTITION BY st, chromosome ORDER BY b, e
                         ROWS UNBOUNDED PRECEDING) AS isl
    FROM o),
  m AS (
    SELECT st, chromosome, MIN(b) AS b, MAX(e) AS e
    FROM sr GROUP BY st, chromosome, isl)"""


@q(
    "interval_jaccard",
    f"""WITH {_IVS_2SET_SQL},
       bp AS (SELECT st, chromosome, SUM(e - b + 1) AS bp
              FROM m GROUP BY st, chromosome),
       inter AS (
         SELECT a.chromosome,
                SUM(least(a.e, x.e) - greatest(a.b, x.b) + 1) AS ibp
         FROM m a JOIN m x
           ON a.chromosome = x.chromosome AND a.st = 0 AND x.st = 1
          AND a.b <= x.e AND a.e >= x.b
         GROUP BY a.chromosome)
       SELECT p0.chromosome,
              CAST(p0.bp AS BIGINT) AS bp_a,
              CAST(p1.bp AS BIGINT) AS bp_b,
              CAST(COALESCE(i.ibp, 0) AS BIGINT) AS inter_bp,
              CAST(FLOOR(1000000 * COALESCE(i.ibp, 0)
                         / (p0.bp + p1.bp - COALESCE(i.ibp, 0))) AS BIGINT) AS jaccard_ppm
       FROM bp p0
       JOIN bp p1 ON p0.chromosome = p1.chromosome AND p0.st = 0 AND p1.st = 1
       LEFT JOIN inter i ON p0.chromosome = i.chromosome""",
)
def interval_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C1+ bedtools-jaccard: base-pair Jaccard similarity between two
    interval sets per chromosome — the genomics measure of how much two
    coverage tracks agree. Both sets are first collapsed to disjoint
    merged runs (running-max islands, windowed per set×chromosome), so
    the pairwise overlap join cannot double-count; intersection bp over
    union bp then reduces to exact integer arithmetic with the ppm
    floor-division idiom. At scale each per-chromosome partition merges
    and joins independently — same plan, any genome size."""
    sup = read_table(spark, sf_dir, "supplier")
    ivs = sup.select(
        (F.col("s_suppkey") % 2).cast("int").alias("st"),
        (F.col("s_suppkey") % 5).cast("string").alias("chromosome"),
        F.expr("CAST(s_suppkey * 97 + 1 AS BIGINT)").alias("b"),
        F.expr(
            "CAST(s_suppkey * 97 + 1 + 200 + (s_suppkey % 7) * 500 AS BIGINT)"
        ).alias("e"),
    )
    wprev = (
        Window.partitionBy("st", "chromosome")
        .orderBy("b", "e")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    wcum = (
        Window.partitionBy("st", "chromosome")
        .orderBy("b", "e")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    o = ivs.withColumn("pm", F.max("e").over(wprev)).withColumn(
        "ni",
        F.when(F.col("pm").isNull() | (F.col("b") > F.col("pm")), 1).otherwise(0),
    )
    m = (
        o.withColumn("isl", F.sum("ni").over(wcum))
        .groupBy("st", "chromosome", "isl")
        .agg(F.min("b").alias("b"), F.max("e").alias("e"))
    )
    bp = m.groupBy("st", "chromosome").agg(F.sum(F.col("e") - F.col("b") + 1).alias("bp"))
    a = m.filter(F.col("st") == 0).select("chromosome", F.col("b").alias("ab"), F.col("e").alias("ae"))
    x = m.filter(F.col("st") == 1).select("chromosome", F.col("b").alias("xb"), F.col("e").alias("xe"))
    inter = (
        a.join(x, "chromosome")
        .filter((F.col("ab") <= F.col("xe")) & (F.col("ae") >= F.col("xb")))
        .groupBy("chromosome")
        .agg(
            F.sum(
                F.least("ae", "xe") - F.greatest("ab", "xb") + 1
            ).alias("ibp")
        )
    )
    p0 = bp.filter(F.col("st") == 0).select("chromosome", F.col("bp").alias("bp_a"))
    p1 = bp.filter(F.col("st") == 1).select("chromosome", F.col("bp").alias("bp_b"))
    return (
        p0.join(p1, "chromosome")
        .join(inter, "chromosome", "left")
        .select(
            "chromosome",
            F.col("bp_a").cast("bigint").alias("bp_a"),
            F.col("bp_b").cast("bigint").alias("bp_b"),
            F.coalesce("ibp", F.lit(0)).cast("bigint").alias("inter_bp"),
            F.expr(
                "CAST(FLOOR(1000000 * COALESCE(ibp, 0)"
                " / (bp_a + bp_b - COALESCE(ibp, 0))) AS BIGINT)"
            ).alias("jaccard_ppm"),
        )
    )


@q(
    "win_drawdown",
    """WITH b AS (
         SELECT user_id, epoch_us(ts) AS t, event_id,
                CAST(CAST(value AS DECIMAL(18,4)) * 10000 AS BIGINT) AS yc
         FROM events),
       c AS (
         SELECT user_id, t, event_id,
                SUM(yc) OVER (PARTITION BY user_id ORDER BY t, event_id
                              ROWS UNBOUNDED PRECEDING) AS cum
         FROM b),
       d AS (
         SELECT user_id, cum,
                MAX(cum) OVER (PARTITION BY user_id ORDER BY t, event_id
                               ROWS UNBOUNDED PRECEDING) AS peak
         FROM c)
       SELECT user_id,
              CAST(MAX(peak - cum) AS BIGINT) AS max_drawdown_c,
              CAST(MAX(cum) AS BIGINT) AS peak_c,
              CAST(COUNT(*) AS BIGINT) AS n
       FROM d GROUP BY user_id""",
)
def win_drawdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E+ maximum drawdown per user: largest peak-to-current drop of the
    cumulative value series — the risk metric for any monotone-resetting
    running total (balances, quota burn, rate budgets). Running sum and
    running max are two frames over ONE window shuffle on user_id; the
    values are exact 1e-4 fixed-point integers so the result is
    bit-stable. The peak is the running max in TIME order (a peak must
    precede its trough), so both windows share one time-ordered shuffle."""
    ev = read_table(spark, sf_dir, "events")
    b = ev.select(
        "user_id",
        F.unix_micros("ts").alias("t"),
        "event_id",
        F.expr("CAST(CAST(value AS DECIMAL(18,4)) * 10000 AS BIGINT)").alias("yc"),
    )
    wtime = (
        Window.partitionBy("user_id")
        .orderBy("t", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    c = b.select("user_id", "t", "event_id", F.sum("yc").over(wtime).alias("cum"))
    d = c.select("user_id", "cum", F.max("cum").over(wtime).alias("peak"))
    return d.groupBy("user_id").agg(
        F.max(F.col("peak") - F.col("cum")).cast("bigint").alias("max_drawdown_c"),
        F.max("cum").cast("bigint").alias("peak_c"),
        F.count(F.lit(1)).cast("bigint").alias("n"),
    )


@q(
    "agg_mad",
    """WITH b AS (
         SELECT l_returnflag AS flag, CAST(FLOOR(l_quantity) AS BIGINT) AS x
         FROM lineitem),
       c AS (
         SELECT flag, x,
                SUM(CAST(1 AS BIGINT)) OVER (PARTITION BY flag ORDER BY x) AS cumn,
                SUM(CAST(1 AS BIGINT)) OVER (PARTITION BY flag) AS total
         FROM b),
       med AS (
         SELECT flag, MIN(x) AS m FROM c WHERE 2 * cumn >= total GROUP BY flag),
       dev AS (
         SELECT b.flag, abs(b.x - med.m) AS d
         FROM b JOIN med ON b.flag = med.flag),
       c2 AS (
         SELECT flag, d,
                SUM(CAST(1 AS BIGINT)) OVER (PARTITION BY flag ORDER BY d) AS cumn,
                SUM(CAST(1 AS BIGINT)) OVER (PARTITION BY flag) AS total
         FROM dev)
       SELECT dev2.flag, CAST(MIN(med2.m) AS BIGINT) AS median,
              CAST(MIN(dev2.d) AS BIGINT) AS mad
       FROM (SELECT flag, d FROM c2 WHERE 2 * cumn >= total) dev2
       JOIN med med2 ON dev2.flag = med2.flag
       GROUP BY dev2.flag""",
)
def agg_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D+ median absolute deviation: the robust scale estimate (immune to
    the outliers that inflate win_outlier's σ). Two passes of the exact
    half-mass median idiom (integer cumulative counts, 2·cum ≥ total —
    no float, no percentile sketch): median of x, then median of
    |x − median|. The 3-row median table broadcast-joins back onto the
    fact, so the second pass costs the same one keyed window as the
    first. Lower-median convention ties both engines deterministically."""
    li = read_table(spark, sf_dir, "lineitem")
    b = li.select(
        F.col("l_returnflag").alias("flag"),
        F.expr("CAST(FLOOR(l_quantity) AS BIGINT)").alias("x"),
    )

    def half_mass_min(df: DataFrame, col: str) -> DataFrame:
        wo = Window.partitionBy("flag").orderBy(col)
        wt = Window.partitionBy("flag")
        c = df.select(
            "flag",
            col,
            F.sum(F.lit(1).cast("bigint")).over(wo).alias("cumn"),
            F.sum(F.lit(1).cast("bigint")).over(wt).alias("total"),
        )
        return (
            c.filter(2 * F.col("cumn") >= F.col("total"))
            .groupBy("flag")
            .agg(F.min(col).alias(f"_{col}_med"))
        )

    med = half_mass_min(b, "x").withColumnRenamed("_x_med", "m")
    dev = b.join(F.broadcast(med), "flag").select(
        "flag", F.abs(F.col("x") - F.col("m")).alias("d")
    )
    mad = half_mass_min(dev, "d").withColumnRenamed("_d_med", "mad")
    return med.join(mad, "flag").select(
        "flag",
        F.col("m").cast("bigint").alias("median"),
        F.col("mad").cast("bigint").alias("mad"),
    )


@q(
    "agg_ks",
    """WITH b AS (
         SELECT l_linestatus AS status,
                CAST(FLOOR(l_quantity) AS BIGINT) AS x,
                CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS g1,
                CASE WHEN l_returnflag = 'N' THEN 1 ELSE 0 END AS g2
         FROM lineitem WHERE l_returnflag IN ('R', 'N')),
       c AS (
         SELECT status, x,
                CAST(SUM(g1) AS BIGINT) AS c1,
                CAST(SUM(g2) AS BIGINT) AS c2
         FROM b GROUP BY status, x),
       w AS (
         SELECT status, x,
                SUM(c1) OVER (PARTITION BY status ORDER BY x) AS cum1,
                SUM(c2) OVER (PARTITION BY status ORDER BY x) AS cum2
         FROM c),
       t AS (
         SELECT status, CAST(SUM(c1) AS BIGINT) AS n1,
                CAST(SUM(c2) AS BIGINT) AS n2
         FROM c GROUP BY status),
       d AS (
         SELECT w.status,
                MAX(ABS(CAST(w.cum1 AS DECIMAL(38,0)) * t.n2
                        - CAST(w.cum2 AS DECIMAL(38,0)) * t.n1)) AS ks_num
         FROM w JOIN t ON w.status = t.status GROUP BY w.status)
       SELECT d.status, t.n1, t.n2,
              CAST(d.ks_num AS BIGINT) AS ks_num,
              CAST(d.ks_num AS DOUBLE)
                / (CAST(t.n1 AS DOUBLE) * CAST(t.n2 AS DOUBLE)) AS ks_stat
       FROM d JOIN t ON d.status = t.status""",
)
def agg_ks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D+ two-sample Kolmogorov–Smirnov statistic, per segment: the
    distribution-drift test a training pipeline runs between two data
    slices (here returned-vs-not quantity mix within each linestatus;
    in production, train vs eval feature drift). Entirely exact: the
    pooled empirical CDFs are integer cumulative counts over the grouped
    value domain, and D's numerator max|cum1·n2 − cum2·n1| stays in
    integer space — only the final normalization divides (two IEEE ops on
    identical operands → bit-identical both engines). The cumulative
    window is PARTITIONED by the segment key, so at 100 TB each segment's
    CDF scan parallelizes and nothing is a global single-partition sort.
    One shuffle for the (status,x) group, one keyed window, a 2-row
    broadcast join for totals."""
    li = read_table(spark, sf_dir, "lineitem")
    b = li.filter(F.col("l_returnflag").isin("R", "N")).select(
        F.col("l_linestatus").alias("status"),
        F.expr("CAST(FLOOR(l_quantity) AS BIGINT)").alias("x"),
        F.expr("CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END").alias("g1"),
        F.expr("CASE WHEN l_returnflag = 'N' THEN 1 ELSE 0 END").alias("g2"),
    )
    c = b.groupBy("status", "x").agg(
        F.sum("g1").cast("bigint").alias("c1"),
        F.sum("g2").cast("bigint").alias("c2"),
    )
    wspec = Window.partitionBy("status").orderBy("x")
    w = c.select(
        "status",
        "x",
        F.sum("c1").over(wspec).alias("cum1"),
        F.sum("c2").over(wspec).alias("cum2"),
    )
    t = c.groupBy("status").agg(
        F.sum("c1").cast("bigint").alias("n1"),
        F.sum("c2").cast("bigint").alias("n2"),
    )
    d = (
        w.join(F.broadcast(t), "status")
        .select(
            "status",
            F.expr(
                "ABS(CAST(cum1 AS DECIMAL(38,0)) * n2"
                " - CAST(cum2 AS DECIMAL(38,0)) * n1)"
            ).alias("gap"),
        )
        .groupBy("status")
        .agg(F.max("gap").alias("ks_num"))
    )
    return d.join(F.broadcast(t), "status").select(
        "status",
        "n1",
        "n2",
        F.col("ks_num").cast("bigint").alias("ks_num"),
        F.expr(
            "CAST(ks_num AS DOUBLE) / (CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE))"
        ).alias("ks_stat"),
    )


@q(
    "agg_chisq",
    """WITH o AS (
         SELECT l_returnflag AS flag, l_linestatus AS status,
                CAST(COUNT(*) AS BIGINT) AS obs
         FROM lineitem GROUP BY flag, status),
       rt AS (SELECT flag, CAST(SUM(obs) AS BIGINT) AS r FROM o GROUP BY flag),
       ct AS (SELECT status, CAST(SUM(obs) AS BIGINT) AS c FROM o GROUP BY status),
       tot AS (SELECT CAST(SUM(obs) AS BIGINT) AS n FROM o)
       SELECT o.flag, o.status, o.obs,
              CAST(rt.r AS DOUBLE) * CAST(ct.c AS DOUBLE)
                / CAST(tot.n AS DOUBLE) AS expected,
              (CAST(o.obs * tot.n - rt.r * ct.c AS DOUBLE) / CAST(tot.n AS DOUBLE))
                * (CAST(o.obs * tot.n - rt.r * ct.c AS DOUBLE) / CAST(tot.n AS DOUBLE))
                / (CAST(rt.r AS DOUBLE) * CAST(ct.c AS DOUBLE) / CAST(tot.n AS DOUBLE))
                AS chisq_contrib
       FROM o JOIN rt ON o.flag = rt.flag
              JOIN ct ON o.status = ct.status
              CROSS JOIN tot""",
)
def agg_chisq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D+ chi-square independence table for two categoricals (return flag
    × line status): per-cell observed, expected, and (O−E)²/E residual —
    the categorical-drift twin of agg_ks, and the standard check that a
    sampled corpus preserves a label mix. Marginals and the difference
    O·N − rt·ct are exact BIGINT (products ≤ 1e18 even at sf100); the
    residual is one fixed-order float expression with identical text in
    both engines, so no float accumulation happens anywhere — the cell
    rows ARE the result (summing 6 doubles would be order-sensitive;
    residuals per cell are the more useful artifact anyway). Plan: one
    map-combined group on the fact, then tiny broadcast joins (marginals
    are k-row; the 1-row total is a whitelisted broadcast cross join)."""
    li = read_table(spark, sf_dir, "lineitem")
    o = li.groupBy(
        F.col("l_returnflag").alias("flag"), F.col("l_linestatus").alias("status")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("obs"))
    rt = o.groupBy("flag").agg(F.sum("obs").cast("bigint").alias("r"))
    ct = o.groupBy("status").agg(F.sum("obs").cast("bigint").alias("c"))
    tot = o.agg(F.sum("obs").cast("bigint").alias("n"))
    return (
        o.join(F.broadcast(rt), "flag")
        .join(F.broadcast(ct), "status")
        .crossJoin(F.broadcast(tot))
        .select(
            "flag",
            "status",
            "obs",
            F.expr(
                "CAST(r AS DOUBLE) * CAST(c AS DOUBLE) / CAST(n AS DOUBLE)"
            ).alias("expected"),
            F.expr(
                "(CAST(obs * n - r * c AS DOUBLE) / CAST(n AS DOUBLE))"
                " * (CAST(obs * n - r * c AS DOUBLE) / CAST(n AS DOUBLE))"
                " / (CAST(r AS DOUBLE) * CAST(c AS DOUBLE) / CAST(n AS DOUBLE))"
            ).alias("chisq_contrib"),
        )
    )


@q(
    "agg_benford",
    """WITH d AS (
         SELECT substr(CAST(CAST(CAST(o_totalprice AS DECIMAL(18,4)) * 100
                        AS BIGINT) AS VARCHAR), 1, 1) AS digit
         FROM orders WHERE o_totalprice > 0),
       c AS (SELECT digit, CAST(COUNT(*) AS BIGINT) AS n FROM d GROUP BY digit),
       t AS (SELECT CAST(SUM(n) AS BIGINT) AS tot FROM c)
       SELECT c.digit, c.n,
              CAST(FLOOR(1000000 * c.n / t.tot) AS BIGINT) AS share_ppm
       FROM c CROSS JOIN t""",
)
def agg_benford(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D+/QA Benford first-digit profile of order totals — the classic
    fabricated-data screen (organic amounts follow log-uniform leading
    digits; synthetic or tampered ones don't). The leading digit comes
    from the DECIMAL-scaled integer cents rendered as a string — never
    from float formatting, which the two engines do differently — and
    shares are exact floor-ppm on identical bigints (agg_hhi idiom).
    Plan: map-side digit projection, 9-group combine, 1-row total
    broadcast; at 100 TB this is a single map-combined pass."""
    o = read_table(spark, sf_dir, "orders")
    d = o.filter(F.col("o_totalprice") > 0).select(
        F.expr(
            "substr(CAST(CAST(CAST(o_totalprice AS DECIMAL(18,4)) * 100"
            " AS BIGINT) AS STRING), 1, 1)"
        ).alias("digit")
    )
    c = d.groupBy("digit").agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    t = c.agg(F.sum("n").cast("bigint").alias("tot"))
    return c.crossJoin(F.broadcast(t)).select(
        "digit",
        "n",
        F.expr("CAST(FLOOR(1000000 * n / tot) AS BIGINT)").alias("share_ppm"),
    )


@q(
    "graph_jaccard",
    """WITH lp AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
       deg AS (SELECT l_partkey AS node, CAST(COUNT(*) AS BIGINT) AS degree
               FROM lp GROUP BY l_partkey),
       common AS (
         SELECT a.l_partkey AS a, b.l_partkey AS b, CAST(COUNT(*) AS BIGINT) AS cn
         FROM lp a JOIN lp b
           ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
         GROUP BY a.l_partkey, b.l_partkey),
       jac AS (
         SELECT c.a, c.b, c.cn,
                da.degree + db.degree - c.cn AS un,
                CAST(FLOOR(1000000 * c.cn / (da.degree + db.degree - c.cn))
                     AS BIGINT) AS jac_ppm
         FROM common c JOIN deg da ON c.a = da.node
                       JOIN deg db ON c.b = db.node)
       SELECT a, b, cn, CAST(un AS BIGINT) AS un, jac_ppm
       FROM jac ORDER BY jac_ppm DESC, a, b LIMIT 20""",
)
def graph_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Graph node similarity: item–item Jaccard over ORDER-SETS in the
    bipartite purchase graph — |orders(a) ∩ orders(b)| over the union,
    the "customers who bought X also bought Y" scorer. The pivot matters
    at scale: candidate pairs are generated per ORDER (fan-out ≤
    basket-width², ≤ 7² here — cap degenerate baskets at 100 TB), NOT
    per item, whose popularity degree is unbounded — the item-centered
    wedge join this replaced was Σ deg(item)² and measured 60× slower
    at sf0.1 on the exact same data. Jaccard in exact floor-ppm ints;
    top-20 by (score, a, b) is a TakeOrderedAndProject, no global
    sort."""
    li = read_table(spark, sf_dir, "lineitem")
    lp = li.select("l_orderkey", "l_partkey").distinct().localCheckpoint()
    deg = lp.groupBy(F.col("l_partkey").alias("node")).agg(
        F.count(F.lit(1)).cast("bigint").alias("degree")
    )
    a, b = lp.alias("a"), lp.alias("b")
    common = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(F.col("a.l_partkey").alias("a"), F.col("b.l_partkey").alias("b"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("cn"))
    )
    da = deg.withColumnRenamed("node", "a").withColumnRenamed("degree", "dega")
    db = deg.withColumnRenamed("node", "b").withColumnRenamed("degree", "degb")
    jac = (
        common.join(da, "a")
        .join(db, "b")
        .select(
            "a",
            "b",
            "cn",
            F.expr("CAST(dega + degb - cn AS BIGINT)").alias("un"),
            F.expr(
                "CAST(FLOOR(1000000 * cn / (dega + degb - cn)) AS BIGINT)"
            ).alias("jac_ppm"),
        )
    )
    return jac.orderBy(F.desc("jac_ppm"), "a", "b").limit(20)


@q(
    "emb_quantize",
    """WITH x AS (
         SELECT vec_id, CAST(t.i AS BIGINT) AS dim,
                CAST(FLOOR(CAST(embedding[CAST(t.i AS INTEGER) + 1] AS DOUBLE)
                           * 1000000) AS BIGINT) AS vq
         FROM embeddings, unnest(range(len(embedding))) AS t(i)),
       st AS (
         SELECT dim, MIN(vq) AS mn, MAX(vq) AS mx FROM x GROUP BY dim),
       code AS (
         SELECT x.vec_id, x.dim,
                CASE WHEN st.mx = st.mn THEN 0
                     ELSE CAST(FLOOR(255 * (x.vq - st.mn) / (st.mx - st.mn))
                               AS BIGINT) END AS c
         FROM x JOIN st ON x.dim = st.dim)
       SELECT dim, c AS code, CAST(COUNT(*) AS BIGINT) AS n
       FROM code GROUP BY dim, c""",
)
def emb_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K3+ int8 scalar quantization of the embedding table — the standard
    4× memory compression before ANN serving (each dimension maps to a
    0..255 code over its own min/max range), reported as the per-(dim,
    code) histogram that QA's the codebook (a dimension collapsing to few
    codes means dead features; a uniform spread means healthy range use).
    Elements quantize to 1e-6 integers FIRST (emb_norm_hist idiom), so
    min/max and the 255·(v−mn)/(mx−mn) floor-division run on identical
    exact bigints in both engines. Plan: posexplode is map-side; the only
    shuffles are the 64-row per-dim stats (broadcast back) and the final
    bounded histogram (≤ 64×256 groups) — at 100 TB the explode never
    materializes wide rows, and the stats join is a broadcast."""
    emb = read_table(spark, sf_dir, "embeddings")
    x = emb.select(
        "vec_id",
        F.posexplode(
            F.expr(
                "transform(embedding,"
                " v -> CAST(FLOOR(CAST(v AS DOUBLE) * 1000000) AS BIGINT))"
            )
        ).alias("dim", "vq"),
    ).withColumn("dim", F.col("dim").cast("bigint"))
    st = x.groupBy("dim").agg(F.min("vq").alias("mn"), F.max("vq").alias("mx"))
    code = x.join(F.broadcast(st), "dim").select(
        "dim",
        F.expr(
            "CASE WHEN mx = mn THEN 0"
            " ELSE CAST(FLOOR(255 * (vq - mn) / (mx - mn)) AS BIGINT) END"
        ).alias("code"),
    )
    return code.groupBy("dim", "code").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )


@q(
    "win_ewma",
    """WITH b AS (
         SELECT event_id, user_id, ts,
                CAST(CAST(value AS DECIMAL(18,4)) * 10000 AS BIGINT) AS xq
         FROM events),
       w AS (
         SELECT event_id, user_id,
                128 * xq
                  + 64 * COALESCE(LAG(xq, 1) OVER win, 0)
                  + 32 * COALESCE(LAG(xq, 2) OVER win, 0)
                  + 16 * COALESCE(LAG(xq, 3) OVER win, 0)
                  + 8 * COALESCE(LAG(xq, 4) OVER win, 0)
                  + 4 * COALESCE(LAG(xq, 5) OVER win, 0)
                  + 2 * COALESCE(LAG(xq, 6) OVER win, 0)
                  + 1 * COALESCE(LAG(xq, 7) OVER win, 0) AS num,
                128
                  + CASE WHEN LAG(xq, 1) OVER win IS NULL THEN 0 ELSE 64 END
                  + CASE WHEN LAG(xq, 2) OVER win IS NULL THEN 0 ELSE 32 END
                  + CASE WHEN LAG(xq, 3) OVER win IS NULL THEN 0 ELSE 16 END
                  + CASE WHEN LAG(xq, 4) OVER win IS NULL THEN 0 ELSE 8 END
                  + CASE WHEN LAG(xq, 5) OVER win IS NULL THEN 0 ELSE 4 END
                  + CASE WHEN LAG(xq, 6) OVER win IS NULL THEN 0 ELSE 2 END
                  + CASE WHEN LAG(xq, 7) OVER win IS NULL THEN 0 ELSE 1 END AS den
         FROM b
         WINDOW win AS (PARTITION BY user_id ORDER BY ts, event_id))
       SELECT event_id, user_id, CAST(num AS BIGINT) AS num,
              CAST(den AS BIGINT) AS den,
              CAST(num AS DOUBLE) / CAST(den AS DOUBLE) / 10000.0 AS ewma
       FROM w""",
)
def win_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E+ exponentially weighted moving average (α = 1/2, depth 8) of
    event value per user — the smoothing every monitoring/feature
    pipeline wants next to win_time_weighted's step integral. True EWMA
    recursion is order-float-sensitive, so the geometric weights are
    truncated at 8 taps where 2⁻⁸ < 0.4% of mass: each tap is an exact
    integer LAG·2ᵏ product summed in BIGINT, the denominator counts only
    the taps that exist (no partition-edge bias), and one final
    fixed-order float division de-scales. Identical window text in both
    engines. Plan: a single keyed window (partition user, order ts) — 8
    LAGs share one sort, no extra shuffle, embarrassing parallel at
    100 TB."""
    ev = read_table(spark, sf_dir, "events")
    b = ev.select(
        "event_id",
        "user_id",
        "ts",
        F.expr("CAST(CAST(value AS DECIMAL(18,4)) * 10000 AS BIGINT)").alias("xq"),
    )
    win = Window.partitionBy("user_id").orderBy("ts", "event_id")
    num = F.lit(0).cast("bigint")
    den = F.lit(0).cast("bigint")
    for k in range(8):
        wt = 1 << (7 - k)
        lagged = F.col("xq") if k == 0 else F.lag("xq", k).over(win)
        num = num + F.coalesce(lagged, F.lit(0)) * wt
        den = den + F.when(lagged.isNull(), 0).otherwise(wt)
    w = b.select(
        "event_id",
        "user_id",
        num.cast("bigint").alias("num"),
        den.cast("bigint").alias("den"),
    )
    return w.select(
        "event_id",
        "user_id",
        "num",
        "den",
        F.expr("CAST(num AS DOUBLE) / CAST(den AS DOUBLE) / 10000.0").alias("ewma"),
    )


@q(
    "text_readability",
    """WITH t AS (
         SELECT lang,
                CAST(len(string_split(trim(text), ' ')) AS BIGINT) AS words,
                CAST(greatest(len(regexp_extract_all(text, '[.!?]+')), 1)
                     AS BIGINT) AS sentences,
                CAST(len(regexp_extract_all(lower(text), '[aeiouy]+'))
                     AS BIGINT) AS syllables
         FROM documents),
       s AS (
         SELECT lang,
                CAST(COUNT(*) AS BIGINT) AS n_docs,
                CAST(SUM(words) AS BIGINT) AS sw,
                CAST(SUM(sentences) AS BIGINT) AS ss,
                CAST(SUM(syllables) AS BIGINT) AS sy
         FROM t GROUP BY lang)
       SELECT lang, n_docs, sw AS total_words,
              206.835
                - 1.015 * (CAST(sw AS DOUBLE) / CAST(ss AS DOUBLE))
                - 84.6 * (CAST(sy AS DOUBLE) / CAST(sw AS DOUBLE))
                AS flesch
       FROM s""",
)
def text_readability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K4+ corpus readability per language: Flesch reading-ease from
    integer counts — words (whitespace tokens, text_stats idiom),
    sentences (terminal-punctuation runs), and a vowel-group syllable
    proxy (the standard dictionary-free approximation). All three counts
    are exact integers via regexp_extract_all (parity proven by the
    regex_extract_all key); the Flesch formula is one fixed-order float
    expression over the per-language totals, so the result is
    bit-identical in both engines. Readability joins text_quality/
    text_gopher as a selection signal for training-mix curation. Plan:
    map-side counting, one 2-group combine — a single pass at any
    scale."""
    d = read_table(spark, sf_dir, "documents")
    t = d.select(
        "lang",
        F.expr("CAST(size(split(trim(text), ' ')) AS BIGINT)").alias("words"),
        F.expr(
            "CAST(greatest(size(regexp_extract_all(text, '[.!?]+', 0)), 1)"
            " AS BIGINT)"
        ).alias("sentences"),
        F.expr(
            "CAST(size(regexp_extract_all(lower(text), '[aeiouy]+', 0)) AS BIGINT)"
        ).alias("syllables"),
    )
    s = t.groupBy("lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("words").cast("bigint").alias("sw"),
        F.sum("sentences").cast("bigint").alias("ss"),
        F.sum("syllables").cast("bigint").alias("sy"),
    )
    return s.select(
        "lang",
        "n_docs",
        F.col("sw").alias("total_words"),
        F.expr(
            "206.835"
            " - 1.015 * (CAST(sw AS DOUBLE) / CAST(ss AS DOUBLE))"
            " - 84.6 * (CAST(sy AS DOUBLE) / CAST(sw AS DOUBLE))"
        ).alias("flesch"),
    )


@q(
    "sample_temperature",
    """WITH d AS (
         SELECT doc_id,
                CASE WHEN doc_id % 100 < 60 THEN 'web'
                     WHEN doc_id % 100 < 90 THEN 'news'
                     ELSE 'code' END AS domain
         FROM documents),
       counts AS (
         SELECT domain, CAST(COUNT(*) AS BIGINT) AS n_s FROM d GROUP BY domain),
       mn AS (SELECT CAST(MIN(n_s) AS BIGINT) AS n_min FROM counts),
       thr AS (
         SELECT c.domain,
                CAST(FLOOR(1000000 * SQRT(CAST(m.n_min AS DOUBLE)
                                          / CAST(c.n_s AS DOUBLE)))
                     AS BIGINT) AS thr_ppm
         FROM counts c CROSS JOIN mn m)
       SELECT d.doc_id, d.domain
       FROM d JOIN thr t ON d.domain = t.domain
       WHERE CAST('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 15) AS BIGINT)
             % 1000000 < t.thr_ppm""",
)
def sample_temperature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K+ temperature-balanced source remixing (τ = ½): downsample every
    domain toward the smallest so kept counts go as √(n_min·n_s) — the
    standard flattening that stops a dominant web crawl from drowning
    small high-quality sources in a training mix. The per-domain keep
    threshold is ppm-integer: SQRT is the ONE float op and IEEE-754
    requires it correctly rounded, so both engines floor the identical
    value (unlike ln/exp, sqrt is deterministic cross-engine). The coin
    is the 60-bit md5 of the doc id (sample_hash idiom) → reproducible
    map-side filter, no RNG state. Plan: k-row domain counts → 1-row min
    broadcast → threshold join pushed to the scan; one tiny shuffle
    regardless of corpus size. Domains are synthesized 60/30/10 from the
    id (the shipped corpus is uniform by source on purpose)."""
    docs = read_table(spark, sf_dir, "documents")
    d = docs.select(
        "doc_id",
        F.expr(
            "CASE WHEN doc_id % 100 < 60 THEN 'web'"
            " WHEN doc_id % 100 < 90 THEN 'news' ELSE 'code' END"
        ).alias("domain"),
    )
    counts = d.groupBy("domain").agg(F.count(F.lit(1)).cast("bigint").alias("n_s"))
    mn = counts.agg(F.min("n_s").cast("bigint").alias("n_min"))
    thr = counts.crossJoin(F.broadcast(mn)).select(
        "domain",
        F.expr(
            "CAST(FLOOR(1000000 * SQRT(CAST(n_min AS DOUBLE)"
            " / CAST(n_s AS DOUBLE))) AS BIGINT)"
        ).alias("thr_ppm"),
    )
    coin = F.expr(
        "CAST(conv(substring(md5(CAST(doc_id AS STRING)), 1, 15), 16, 10)"
        " AS BIGINT) % 1000000"
    )
    return d.join(F.broadcast(thr), "domain").filter(coin < F.col("thr_ppm")).select(
        "doc_id", "domain"
    )


@q(
    "text_span_mask",
    """WITH t AS (
         SELECT doc_id, string_split(trim(text), ' ') AS w FROM documents),
       m AS (
         SELECT doc_id, len(w) AS n_tokens,
                list_transform(range(1, len(w) + 1),
                  i -> CASE WHEN CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)
                                 || '|' || CAST(i AS VARCHAR)), 1, 15) AS BIGINT)
                                 % 100 < 15
                            THEN '<extra_id>' ELSE w[i] END) AS cw,
                list_filter(range(1, len(w) + 1),
                  i -> CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)
                            || '|' || CAST(i AS VARCHAR)), 1, 15) AS BIGINT)
                            % 100 < 15) AS mpos
         FROM t)
       SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
              CAST(len(mpos) AS BIGINT) AS n_masked,
              array_to_string(cw, ' ') AS corrupted,
              COALESCE(array_to_string(list_transform(mpos,
                         i -> CAST(i AS VARCHAR)), ','), '') AS mask_positions
       FROM m""",
)
def text_span_mask(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K4+ deterministic span corruption (T5/BERT-style masking) — turn a
    corpus into (corrupted, positions) training pairs with NO RNG: token
    i of doc d is masked iff the 60-bit md5 of (d, i) lands under 15% —
    reproducible across runs, retries, and engines, and the mask is
    recoverable from (doc_id, i) alone so the label side never needs to
    be stored. Pure higher-order functions over the token array: zero
    Python, zero shuffle, the whole transform is one map stage at any
    scale. range(1, n+1)/sequence(1, n) are safe here because split('')
    yields ≥ 1 token (the documented sequence-descends footgun cannot
    fire)."""
    docs = read_table(spark, sf_dir, "documents")
    coin = (
        "CAST(conv(substring(md5(concat(CAST(doc_id AS STRING), '|',"
        " CAST(i AS STRING))), 1, 15), 16, 10) AS BIGINT) % 100 < 15"
    )
    t = docs.select("doc_id", F.split(F.trim(F.col("text")), " ").alias("w"))
    m = t.select(
        "doc_id",
        F.size("w").cast("bigint").alias("n_tokens"),
        F.expr(
            f"transform(sequence(1, size(w)),"
            f" i -> CASE WHEN {coin} THEN '<extra_id>'"
            f" ELSE element_at(w, i) END)"
        ).alias("cw"),
        F.expr(f"filter(sequence(1, size(w)), i -> {coin})").alias("mpos"),
    )
    return m.select(
        "doc_id",
        "n_tokens",
        F.size("mpos").cast("bigint").alias("n_masked"),
        F.array_join("cw", " ").alias("corrupted"),
        F.expr(
            "array_join(transform(mpos, i -> CAST(i AS STRING)), ',')"
        ).alias("mask_positions"),
    )


@q(
    "agg_kmv",
    """WITH h AS (
         SELECT DISTINCT event_type,
                CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15)
                     AS BIGINT) AS hv
         FROM events),
       rk AS (
         SELECT event_type, hv,
                ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY hv) AS rn
         FROM h),
       kth AS (
         SELECT event_type, CAST(MAX(rn) AS BIGINT) AS k_used,
                CAST(MAX(hv) AS BIGINT) AS kth_hash
         FROM rk WHERE rn <= 64 GROUP BY event_type)
       SELECT event_type, k_used, kth_hash,
              CASE WHEN k_used < 64 THEN CAST(k_used AS DOUBLE)
                   ELSE (63.0 * 1152921504606846976.0) / CAST(kth_hash AS DOUBLE)
              END AS est_distinct
       FROM kth""",
)
def agg_kmv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D4+ k-minimum-values distinct sketch (k = 64) for users per event
    type — the ORACLE-CHECKABLE cousin of agg_approx_cd: HLL estimates
    are engine-private (rows-only check), but KMV over the shared 60-bit
    md5 hash is bit-reproducible, so the ESTIMATE itself gets the full
    hash gate. Estimator: (k−1)/x_k with x_k = kth smallest hash / 2⁶⁰;
    below k distinct values the sketch IS the exact count. KMV partials
    are mergeable (union the hash sets, keep the k smallest), which is
    what makes it a real sketch at 100 TB — here the keyed window over
    DISTINCT hashes stands in for the merge tree; the production path
    for unbounded groups stays approx_count_distinct. Final division is
    one fixed-order float expression."""
    ev = read_table(spark, sf_dir, "events")
    h = ev.select(
        "event_type",
        F.expr(
            "CAST(conv(substring(md5(CAST(user_id AS STRING)), 1, 15), 16, 10)"
            " AS BIGINT)"
        ).alias("hv"),
    ).distinct()
    rk = h.withColumn(
        "rn", F.row_number().over(Window.partitionBy("event_type").orderBy("hv"))
    )
    kth = (
        rk.filter(F.col("rn") <= 64)
        .groupBy("event_type")
        .agg(
            F.max("rn").cast("bigint").alias("k_used"),
            F.max("hv").cast("bigint").alias("kth_hash"),
        )
    )
    return kth.select(
        "event_type",
        "k_used",
        "kth_hash",
        F.expr(
            "CASE WHEN k_used < 64 THEN CAST(k_used AS DOUBLE)"
            " ELSE (63.0 * 1152921504606846976.0) / CAST(kth_hash AS DOUBLE) END"
        ).alias("est_distinct"),
    )


@q(
    "win_cusum",
    """WITH daily AS (
         SELECT event_type, CAST(ts AS DATE) AS day,
                CAST(COUNT(*) AS BIGINT) AS cnt
         FROM events GROUP BY event_type, day),
       tot AS (
         SELECT event_type, CAST(SUM(cnt) AS BIGINT) AS total,
                CAST(COUNT(*) AS BIGINT) AS ndays
         FROM daily GROUP BY event_type),
       dev AS (
         SELECT d.event_type, d.day, d.cnt,
                d.cnt * t.ndays - t.total AS dev_s, t.ndays
         FROM daily d JOIN tot t ON d.event_type = t.event_type)
       SELECT event_type, day, cnt,
              CAST(SUM(dev_s) OVER (PARTITION BY event_type ORDER BY day)
                   AS BIGINT) AS cusum_scaled,
              CAST(SUM(dev_s) OVER (PARTITION BY event_type ORDER BY day)
                   AS DOUBLE) / CAST(ndays AS DOUBLE) AS cusum
       FROM dev""",
)
def win_cusum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E+ CUSUM change detection on daily event volume per type: the
    running sum of deviations from the per-type mean, the classic
    level-shift detector (a sustained drift grows linearly in CUSUM
    while noise cancels — win_outlier's z-score twin for MEANS over
    time). Exactness trick: (cnt − mean) scaled by ndays is the integer
    cnt·ndays − total, so the cumulative sum stays in BIGINT and only
    the final de-scaling divides (fixed-order float, engine-identical).
    Plan: one daily rollup (map-combined), k-row totals broadcast back,
    one keyed cumulative window — partitioned by event_type, so 100 TB
    of history parallelizes per series."""
    ev = read_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.col("ts").cast("date").alias("day")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    tot = daily.groupBy("event_type").agg(
        F.sum("cnt").cast("bigint").alias("total"),
        F.count(F.lit(1)).cast("bigint").alias("ndays"),
    )
    dev = daily.join(F.broadcast(tot), "event_type").select(
        "event_type",
        "day",
        "cnt",
        F.expr("cnt * ndays - total").alias("dev_s"),
        "ndays",
    )
    w = Window.partitionBy("event_type").orderBy("day")
    return dev.select(
        "event_type",
        "day",
        "cnt",
        F.sum("dev_s").over(w).cast("bigint").alias("cusum_scaled"),
        (F.sum("dev_s").over(w).cast("double") / F.col("ndays").cast("double")).alias(
            "cusum"
        ),
    )


@q(
    "join_bloom",
    """WITH dim AS (
         SELECT s_suppkey AS k FROM supplier WHERE s_acctbal > 7000),
       dprobe AS (
         SELECT CAST('0x' || substr(md5(CAST(k AS VARCHAR) || '|'
                     || CAST(j AS VARCHAR)), 1, 15) AS BIGINT) % 992 AS pos
         FROM dim, unnest([0, 1, 2]) AS u(j)),
       bloom AS (
         SELECT CAST(FLOOR(pos / 62) AS BIGINT) AS word,
                bit_or(CAST(1 AS BIGINT) << CAST(pos % 62 AS INTEGER)) AS bits
         FROM dprobe GROUP BY word),
       fg AS (
         SELECT l_orderkey, l_linenumber, l_suppkey,
                CAST(COUNT(*) AS BIGINT) AS m
         FROM lineitem GROUP BY l_orderkey, l_linenumber, l_suppkey),
       fprobe AS (
         SELECT f.l_orderkey, f.l_linenumber, f.l_suppkey, f.m,
                CAST('0x' || substr(md5(CAST(f.l_suppkey AS VARCHAR) || '|'
                     || CAST(j AS VARCHAR)), 1, 15) AS BIGINT) % 992 AS pos
         FROM fg f, unnest([0, 1, 2]) AS u(j)),
       hit AS (
         SELECT f.l_orderkey, f.l_linenumber, f.l_suppkey, MIN(f.m) AS m
         FROM fprobe f JOIN bloom b
           ON CAST(FLOOR(f.pos / 62) AS BIGINT) = b.word
          AND (b.bits & (CAST(1 AS BIGINT) << CAST(f.pos % 62 AS INTEGER)))
              = (CAST(1 AS BIGINT) << CAST(f.pos % 62 AS INTEGER))
         GROUP BY f.l_orderkey, f.l_linenumber, f.l_suppkey
         HAVING COUNT(*) = 3),
       nf AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_fact FROM lineitem),
       np AS (SELECT CAST(COALESCE(SUM(m), 0) AS BIGINT) AS n_pass FROM hit),
       nt AS (
         SELECT CAST(COALESCE(SUM(m), 0) AS BIGINT) AS n_true
         FROM hit WHERE l_suppkey IN (SELECT k FROM dim))
       SELECT nf.n_fact, np.n_pass, nt.n_true,
              np.n_pass - nt.n_true AS n_false_pos
       FROM nf CROSS JOIN np CROSS JOIN nt""",
)
def join_bloom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C+ runtime bloom-filter pre-join: hash the selective dim keys into
    a 992-bit bloom (16 62-bit words via bit_or aggregate — the sign bit
    is never set, keeping BIGINT shifts portable), broadcast the ≤16-row
    bitmap, and pre-filter the fact with 3 map-side probes BEFORE the
    exact join — the runtime-filter pattern engines inject to kill
    shuffle volume when the dim predicate is selective (Spark's own
    InjectRuntimeFilter, here explicit and oracle-checkable). Output is
    the filter's quality sheet: fact rows, bloom-pass rows, true
    matches, false positives (3 probes into 992 bits at 28 keys ⇒ tiny
    fp rate). At 100 TB the bloom build is a k-row aggregate and the
    probe is map-side — the shuffled volume drops to the bloom-pass
    fraction. The 1-row stats cross joins are whitelisted."""
    s = read_table(spark, sf_dir, "supplier")
    li = read_table(spark, sf_dir, "lineitem")
    dim = s.filter(F.col("s_acctbal") > 7000).select(F.col("s_suppkey").alias("k"))
    dprobe = dim.select(
        F.explode(F.array(F.lit(0), F.lit(1), F.lit(2))).alias("j"), "k"
    ).select(
        F.expr(
            "CAST(conv(substring(md5(concat(CAST(k AS STRING), '|',"
            " CAST(j AS STRING))), 1, 15), 16, 10) AS BIGINT) % 992"
        ).alias("pos")
    )
    bloom = dprobe.groupBy(
        F.expr("CAST(FLOOR(pos / 62) AS BIGINT)").alias("word")
    ).agg(F.expr("bit_or(shiftleft(CAST(1 AS BIGINT), CAST(pos % 62 AS INT)))").alias("bits"))
    fg = li.groupBy("l_orderkey", "l_linenumber", "l_suppkey").agg(
        F.count(F.lit(1)).cast("bigint").alias("m")
    )
    fprobe = fg.select(
        "l_orderkey",
        "l_linenumber",
        "l_suppkey",
        "m",
        F.explode(F.array(F.lit(0), F.lit(1), F.lit(2))).alias("j"),
    ).select(
        "l_orderkey",
        "l_linenumber",
        "l_suppkey",
        "m",
        F.expr(
            "CAST(conv(substring(md5(concat(CAST(l_suppkey AS STRING), '|',"
            " CAST(j AS STRING))), 1, 15), 16, 10) AS BIGINT) % 992"
        ).alias("pos"),
    )
    hit = (
        fprobe.withColumn("word", F.expr("CAST(FLOOR(pos / 62) AS BIGINT)"))
        .withColumn(
            "mask", F.expr("shiftleft(CAST(1 AS BIGINT), CAST(pos % 62 AS INT))")
        )
        .join(F.broadcast(bloom), "word")
        .filter(F.expr("(bits & mask) = mask"))
        .groupBy("l_orderkey", "l_linenumber", "l_suppkey")
        .agg(F.count(F.lit(1)).alias("nprobe"), F.min("m").alias("m"))
        .filter(F.col("nprobe") == 3)
        .select("l_orderkey", "l_linenumber", "l_suppkey", "m")
    )
    hit = hit.localCheckpoint()  # reused by n_pass and n_true below
    nf = li.agg(F.count(F.lit(1)).cast("bigint").alias("n_fact"))
    np_ = hit.agg(
        F.coalesce(F.sum("m"), F.lit(0)).cast("bigint").alias("n_pass")
    )
    nt = (
        hit.join(F.broadcast(dim), hit["l_suppkey"] == dim["k"], "left_semi")
        .agg(F.coalesce(F.sum("m"), F.lit(0)).cast("bigint").alias("n_true"))
    )
    return (
        nf.crossJoin(F.broadcast(np_))
        .crossJoin(F.broadcast(nt))
        .select(
            "n_fact",
            "n_pass",
            "n_true",
            F.expr("n_pass - n_true").alias("n_false_pos"),
        )
    )


@q(
    "agg_autocorr",
    """WITH daily AS (
         SELECT event_type, CAST(ts AS DATE) AS day,
                CAST(COUNT(*) AS BIGINT) AS cnt
         FROM events GROUP BY event_type, day),
       p AS (
         SELECT event_type, cnt AS x,
                LAG(cnt) OVER (PARTITION BY event_type ORDER BY day) AS y
         FROM daily),
       s AS (
         SELECT event_type,
                CAST(COUNT(*) AS DOUBLE) AS n,
                CAST(SUM(x) AS DOUBLE) AS sx,
                CAST(SUM(y) AS DOUBLE) AS sy,
                CAST(SUM(CAST(x AS DECIMAL(38,0)) * x) AS DOUBLE) AS sxx,
                CAST(SUM(CAST(x AS DECIMAL(38,0)) * y) AS DOUBLE) AS sxy,
                CAST(SUM(CAST(y AS DECIMAL(38,0)) * y) AS DOUBLE) AS syy
         FROM p WHERE y IS NOT NULL GROUP BY event_type)
       SELECT event_type, CAST(n AS BIGINT) AS n_pairs,
              (n * sxy - sx * sy)
                / (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy)) AS autocorr
       FROM s""",
)
def agg_autocorr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D+ lag-1 autocorrelation of daily event volume per type — the
    seasonality/persistence probe that tells a forecaster whether
    yesterday predicts today (win_cusum finds level SHIFTS; this finds
    MEMORY). The (x_t, x_{t−1}) pairs come from one keyed LAG window on
    the daily rollup; then the agg_corr discipline: all five moments as
    exact integer/decimal sums, one shared-text closed form (sqrt is
    IEEE-deterministic) at the end. Two keyed shuffles total, both on
    event_type."""
    ev = read_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.col("ts").cast("date").alias("day")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    p = daily.select(
        "event_type",
        F.col("cnt").alias("x"),
        F.lag("cnt").over(Window.partitionBy("event_type").orderBy("day")).alias("y"),
    ).filter(F.col("y").isNotNull())
    s = p.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum("x").cast("double").alias("sx"),
        F.sum("y").cast("double").alias("sy"),
        F.sum(F.expr("CAST(x AS DECIMAL(38,0)) * x")).cast("double").alias("sxx"),
        F.sum(F.expr("CAST(x AS DECIMAL(38,0)) * y")).cast("double").alias("sxy"),
        F.sum(F.expr("CAST(y AS DECIMAL(38,0)) * y")).cast("double").alias("syy"),
    )
    return s.select(
        "event_type",
        F.col("n").cast("bigint").alias("n_pairs"),
        F.expr(
            "(n * sxy - sx * sy)"
            " / (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy))"
        ).alias("autocorr"),
    )


@q(
    "win_bollinger",
    """WITH daily AS (
         SELECT event_type, CAST(ts AS DATE) AS day,
                CAST(COUNT(*) AS BIGINT) AS cnt
         FROM events GROUP BY event_type, day),
       w AS (
         SELECT event_type, day, cnt,
                SUM(cnt) OVER win AS s1,
                SUM(cnt * cnt) OVER win AS s2,
                COUNT(*) OVER win AS n
         FROM daily
         WINDOW win AS (PARTITION BY event_type ORDER BY day
                        ROWS BETWEEN 6 PRECEDING AND CURRENT ROW))
       SELECT event_type, day, cnt,
              CAST(s1 AS BIGINT) AS s1, CAST(n AS BIGINT) AS n,
              CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE) AS mid,
              CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE)
                + 2.0 * (sqrt(CAST(n * s2 - s1 * s1 AS DOUBLE)) / CAST(n AS DOUBLE))
                AS upper,
              CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE)
                - 2.0 * (sqrt(CAST(n * s2 - s1 * s1 AS DOUBLE)) / CAST(n AS DOUBLE))
                AS lower
       FROM w""",
)
def win_bollinger(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E+ rolling mean ± 2σ bands (Bollinger) over a 7-day frame of daily
    volumes per type — the envelope monitoring dashboards draw, and the
    rolling companion to the global z-score in win_outlier. The frame
    sums Σx and Σx² stay BIGINT (n·Σx² − (Σx)² ≥ 0 exactly, by
    Cauchy–Schwarz on integers), so σ = √(nΣx²−(Σx)²)/n is one
    deterministic sqrt on an exactly-represented integer — the band
    expressions share identical text in both engines. One keyed window,
    two shared-frame sums; nothing global."""
    ev = read_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.col("ts").cast("date").alias("day")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    win = (
        Window.partitionBy("event_type").orderBy("day").rowsBetween(-6, 0)
    )
    w = daily.select(
        "event_type",
        "day",
        "cnt",
        F.sum("cnt").over(win).alias("s1"),
        F.sum(F.expr("cnt * cnt")).over(win).alias("s2"),
        F.count(F.lit(1)).over(win).alias("n"),
    )
    return w.select(
        "event_type",
        "day",
        "cnt",
        F.col("s1").cast("bigint").alias("s1"),
        F.col("n").cast("bigint").alias("n"),
        F.expr("CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE)").alias("mid"),
        F.expr(
            "CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE)"
            " + 2.0 * (sqrt(CAST(n * s2 - s1 * s1 AS DOUBLE)) / CAST(n AS DOUBLE))"
        ).alias("upper"),
        F.expr(
            "CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE)"
            " - 2.0 * (sqrt(CAST(n * s2 - s1 * s1 AS DOUBLE)) / CAST(n AS DOUBLE))"
        ).alias("lower"),
    )


@q(
    "sample_split",
    """SELECT doc_id,
              CASE WHEN CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)
                        AS BIGINT) % 100 < 90 THEN 'train'
                   WHEN CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)
                        AS BIGINT) % 100 < 95 THEN 'valid'
                   ELSE 'test' END AS split
       FROM documents""",
)
def sample_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K+ deterministic train/valid/test assignment (90/5/5) from the
    md5 coin — the split every experiment depends on being STABLE:
    content-addressed by id, so re-runs, retries, engine changes, and
    corpus growth never move an existing document across splits (the
    leakage mode rand()-based splits suffer). Pure map-side projection;
    composes with pushdown. Disjointness and coverage are trivially
    total (CASE over one coin)."""
    docs = read_table(spark, sf_dir, "documents")
    coin = (
        "CAST(conv(substring(md5(CAST(doc_id AS STRING)), 1, 15), 16, 10)"
        " AS BIGINT) % 100"
    )
    return docs.select(
        "doc_id",
        F.expr(
            f"CASE WHEN {coin} < 90 THEN 'train'"
            f" WHEN {coin} < 95 THEN 'valid' ELSE 'test' END"
        ).alias("split"),
    )


@q(
    "text_paragraph_dedup",
    """WITH t AS (
         SELECT doc_id,
                list_filter(list_transform(regexp_extract_all(text, '[^.!?]+'),
                                           x -> trim(x)),
                            x -> x <> '') AS s
         FROM documents),
       e AS (
         SELECT doc_id, CAST(i AS BIGINT) AS i,
                s[CAST(i AS INTEGER)] AS sent,
                lower(s[CAST(i AS INTEGER)]) AS norm
         FROM t, unnest(range(1, len(s) + 1)) AS u(i)),
       w AS (
         SELECT doc_id, i, sent,
                ROW_NUMBER() OVER (PARTITION BY norm ORDER BY doc_id, i) AS rn
         FROM e),
       kept AS (
         SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_kept,
                string_agg(sent, '. ' ORDER BY i) AS clean_text
         FROM w WHERE rn = 1 GROUP BY doc_id),
       tot AS (
         SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_sent FROM e GROUP BY doc_id)
       SELECT tot.doc_id,
              COALESCE(kept.n_kept, 0) AS n_kept,
              tot.n_sent - COALESCE(kept.n_kept, 0) AS n_dropped,
              COALESCE(kept.clean_text, '') AS clean_text
       FROM tot LEFT JOIN kept ON tot.doc_id = kept.doc_id""",
)
def text_paragraph_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K2+ sub-document span dedup, C4-style: split every document into
    sentence spans, keep only the GLOBALLY FIRST occurrence of each
    normalized span (by (doc_id, position) — deterministic survivor),
    and reassemble documents from their surviving spans in original
    order. This is the dedup granularity document-level MinHash cannot
    reach: boilerplate repeated across distinct pages (cookie banners,
    license headers) dies here while the unique prose survives. Plan:
    one explode (map-side, positions from sequence so both engines index
    identically), one keep-first window partitioned by the span hash —
    near-uniform key distribution at 100 TB — and one ordered
    re-aggregation per doc (array_sort(struct(i, sent)) twins DuckDB's
    ORDER BY inside string_agg). Docs whose every span is claimed
    elsewhere come back empty rather than vanishing (left join), so
    downstream counts stay total."""
    docs = read_table(spark, sf_dir, "documents")
    t = docs.select(
        "doc_id",
        F.expr(
            "filter(transform(regexp_extract_all(text, '[^.!?]+', 0),"
            " x -> trim(x)), x -> x <> '')"
        ).alias("s"),
    )
    e = t.select(
        "doc_id",
        F.posexplode(F.col("s")).alias("i0", "sent"),
    ).select(
        "doc_id",
        (F.col("i0") + 1).cast("bigint").alias("i"),
        "sent",
        F.lower("sent").alias("norm"),
    )
    w = e.withColumn(
        "rn",
        F.row_number().over(Window.partitionBy("norm").orderBy("doc_id", "i")),
    )
    kept = (
        w.filter(F.col("rn") == 1)
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_kept"),
            F.expr(
                "concat_ws('. ', transform(array_sort(collect_list(struct(i, sent))),"
                " x -> x.sent))"
            ).alias("clean_text"),
        )
    )
    tot = e.groupBy("doc_id").agg(F.count(F.lit(1)).cast("bigint").alias("n_sent"))
    return tot.join(kept, "doc_id", "left").select(
        "doc_id",
        F.coalesce(F.col("n_kept"), F.lit(0)).cast("bigint").alias("n_kept"),
        (F.col("n_sent") - F.coalesce(F.col("n_kept"), F.lit(0)))
        .cast("bigint")
        .alias("n_dropped"),
        F.coalesce(F.col("clean_text"), F.lit("")).alias("clean_text"),
    )


@q(
    "win_rolling_median",
    """WITH daily AS (
         SELECT event_type, CAST(ts AS DATE) AS day,
                CAST(COUNT(*) AS BIGINT) AS cnt
         FROM events GROUP BY event_type, day),
       pairs AS (
         SELECT a.event_type, a.day, m.cnt AS v, m.day AS vday
         FROM daily a JOIN daily m
           ON a.event_type = m.event_type
          AND m.day BETWEEN a.day - 6 AND a.day),
       rk AS (
         SELECT event_type, day, v,
                SUM(CAST(1 AS BIGINT)) OVER (PARTITION BY event_type, day
                                             ORDER BY v, vday) AS cumn,
                SUM(CAST(1 AS BIGINT)) OVER (PARTITION BY event_type, day) AS total
         FROM pairs)
       SELECT event_type, day,
              CAST(MIN(v) AS BIGINT) AS rolling_median,
              CAST(MIN(total) AS BIGINT) AS n_window
       FROM rk WHERE 2 * cumn >= total GROUP BY event_type, day""",
)
def win_rolling_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E+ rolling 7-day MEDIAN of daily volume per type — the robust
    companion to win_bollinger's mean ± 2σ (one outage day drags a mean
    band for a week; the median shrugs). No sorted-frame aggregate
    exists in either engine, so the window materializes via a bounded
    self-join (each anchor day joins its ≤ 7 member days — fan-out is
    the frame length, constant, not data-sized) and the exact half-mass
    median idiom (integer cumulative counts, lower-median tie-break by
    (value, day)) picks the median per (type, anchor). At 100 TB the
    join key (type, day-range) is the partition key and the 7× blowup
    is a constant factor — the same shape as the agg_mad second pass."""
    ev = read_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.col("ts").cast("date").alias("day")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    a = daily.select("event_type", "day")
    m = daily.select(
        F.col("event_type").alias("m_type"),
        F.col("day").alias("vday"),
        F.col("cnt").alias("v"),
    )
    pairs = a.join(
        m,
        (F.col("event_type") == F.col("m_type"))
        & F.expr("vday BETWEEN date_sub(day, 6) AND day"),
    ).select("event_type", "day", "v", "vday")
    wo = Window.partitionBy("event_type", "day").orderBy("v", "vday")
    wt = Window.partitionBy("event_type", "day")
    rk = pairs.select(
        "event_type",
        "day",
        "v",
        F.sum(F.lit(1).cast("bigint")).over(wo).alias("cumn"),
        F.sum(F.lit(1).cast("bigint")).over(wt).alias("total"),
    )
    return (
        rk.filter(2 * F.col("cumn") >= F.col("total"))
        .groupBy("event_type", "day")
        .agg(
            F.min("v").cast("bigint").alias("rolling_median"),
            F.min("total").cast("bigint").alias("n_window"),
        )
    )


@q(
    "join_interval_knn",
    """WITH pts AS (
         SELECT CAST(p_partkey % 5 AS VARCHAR) AS chromosome,
                CAST(p_partkey * 31 + 1 AS BIGINT) AS position,
                p_partkey
         FROM part),
       ivs AS (
         SELECT CAST(s_suppkey % 5 AS VARCHAR) AS chromosome,
                CAST(s_suppkey * 97 + 1 AS BIGINT) AS begin,
                CAST(s_suppkey * 97 + 1 + 200 + (s_suppkey % 7) * 500
                     AS BIGINT) AS "end",
                s_suppkey AS sample_key
         FROM supplier),
       cand AS (
         SELECT p.chromosome, p.position, p.p_partkey, i.sample_key,
                GREATEST(i.begin - p.position, p.position - i."end", 0) AS distance
         FROM pts p JOIN ivs i USING (chromosome)),
       rk AS (
         SELECT chromosome, position, p_partkey, sample_key, distance,
                ROW_NUMBER() OVER (PARTITION BY chromosome, position, p_partkey
                                   ORDER BY distance, sample_key) AS rn
         FROM cand)
       SELECT chromosome, position, p_partkey,
              CAST(sample_key AS BIGINT) AS nearest_key,
              CAST(distance AS BIGINT) AS distance,
              CAST(rn AS BIGINT) AS k_rank
       FROM rk WHERE rn <= 3""",
)
def join_interval_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C1+ k-nearest intervals per point (k = 3) — join_nearest's
    generalization for ambiguity-aware annotation (report ALL plausible
    nearby features with distances, let the caller threshold). Candidates
    come from the per-chromosome equi-join (at 100 TB: the UCSC-binned
    neighborhood join bounds candidates per point; here chromosomes are
    the demo partition), distance = GREATEST(begin−pos, pos−end, 0), and
    a (distance, sample_key)-ordered rank window keeps k — deterministic
    under ties. One shuffle on chromosome, one keyed window."""
    p, s = _points_intervals(spark, sf_dir)
    cand = p.join(s, "chromosome").select(
        "chromosome",
        "position",
        "p_partkey",
        F.col("sample_key"),
        F.expr(
            "GREATEST(begin - position, position - end, CAST(0 AS BIGINT))"
        ).alias("distance"),
    )
    w = Window.partitionBy("chromosome", "position", "p_partkey").orderBy(
        "distance", "sample_key"
    )
    return (
        cand.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select(
            "chromosome",
            "position",
            "p_partkey",
            F.col("sample_key").cast("bigint").alias("nearest_key"),
            F.col("distance").cast("bigint").alias("distance"),
            F.col("rn").cast("bigint").alias("k_rank"),
        )
    )


@q(
    "agg_leadtime",
    """WITH j AS (
         SELECT o.o_orderpriority AS priority,
                CAST(date_diff('day', CAST(o.o_orderdate AS DATE),
                               CAST(l.l_shipdate AS DATE)) AS BIGINT) AS days
         FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey),
       rk AS (
         SELECT priority, days,
                SUM(CAST(1 AS BIGINT)) OVER (PARTITION BY priority
                                             ORDER BY days) AS cumn,
                SUM(CAST(1 AS BIGINT)) OVER (PARTITION BY priority) AS total
         FROM j),
       med AS (
         SELECT priority, CAST(MIN(days) AS BIGINT) AS median_days
         FROM rk WHERE 2 * cumn >= total GROUP BY priority),
       s AS (
         SELECT priority,
                CAST(COUNT(*) AS BIGINT) AS n_lines,
                CAST(MIN(days) AS BIGINT) AS min_days,
                CAST(MAX(days) AS BIGINT) AS max_days,
                CAST(SUM(days) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS avg_days
         FROM j GROUP BY priority)
       SELECT s.priority, s.n_lines, s.min_days, s.max_days,
              med.median_days, s.avg_days
       FROM s JOIN med ON s.priority = med.priority""",
)
def agg_leadtime(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D+ order-to-ship lead time per priority class — the fulfillment
    SLA sheet (and the latency-distribution shape every ops dashboard
    needs): count, min/max, exact lower-median via the half-mass idiom,
    and a mean whose numerator is an exact integer day sum (datediff is
    integral, so no decimal scaling is even needed — the one division is
    fixed-order float). One fact join on the order key (the natural
    co-partition key at 100 TB — bucketing both tables on it makes this
    shuffle-free), one keyed median window, one grouped agg."""
    o = read_table(spark, sf_dir, "orders")
    li = read_table(spark, sf_dir, "lineitem")
    j = o.join(li, o["o_orderkey"] == li["l_orderkey"]).select(
        F.col("o_orderpriority").alias("priority"),
        F.expr(
            "CAST(datediff(CAST(l_shipdate AS DATE), CAST(o_orderdate AS DATE))"
            " AS BIGINT)"
        ).alias("days"),
    )
    wo = Window.partitionBy("priority").orderBy("days")
    wt = Window.partitionBy("priority")
    rk = j.select(
        "priority",
        "days",
        F.sum(F.lit(1).cast("bigint")).over(wo).alias("cumn"),
        F.sum(F.lit(1).cast("bigint")).over(wt).alias("total"),
    )
    med = (
        rk.filter(2 * F.col("cumn") >= F.col("total"))
        .groupBy("priority")
        .agg(F.min("days").cast("bigint").alias("median_days"))
    )
    s = j.groupBy("priority").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_lines"),
        F.min("days").cast("bigint").alias("min_days"),
        F.max("days").cast("bigint").alias("max_days"),
        F.expr(
            "CAST(SUM(days) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)"
        ).alias("avg_days"),
    )
    return s.join(F.broadcast(med), "priority").select(
        "priority", "n_lines", "min_days", "max_days", "median_days", "avg_days"
    )


@q(
    "agg_trimmed_mean",
    """WITH b AS (
         SELECT l_returnflag AS flag,
                CAST(FLOOR(l_quantity) AS BIGINT) AS x,
                l_orderkey, l_linenumber
         FROM lineitem),
       rk AS (
         SELECT flag, x,
                ROW_NUMBER() OVER (PARTITION BY flag
                                   ORDER BY x, l_orderkey, l_linenumber) AS rn,
                COUNT(*) OVER (PARTITION BY flag) AS n
         FROM b),
       kept AS (
         SELECT flag, x, n FROM rk
         WHERE rn > CAST(FLOOR(n / 10) AS BIGINT)
           AND rn <= n - CAST(FLOOR(n / 10) AS BIGINT))
       SELECT flag,
              CAST(MIN(n) AS BIGINT) AS n_total,
              CAST(COUNT(*) AS BIGINT) AS n_kept,
              CAST(SUM(x) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS trimmed_mean
       FROM kept GROUP BY flag""",
)
def agg_trimmed_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D+ 10% trimmed mean per group — the robust location estimate
    between agg_mad's median and the plain mean: drop the bottom and top
    decile BY RANK (deterministic total order: value, then row identity)
    and average the middle 80% as an exact integer sum over kept rows.
    Trimming depends only on the value multiset, so the tie-break choice
    cannot change the result — it only pins both engines to the same
    rows. One keyed rank window + one grouped agg; the division is the
    single fixed-order float op."""
    li = read_table(spark, sf_dir, "lineitem")
    b = li.select(
        F.col("l_returnflag").alias("flag"),
        F.expr("CAST(FLOOR(l_quantity) AS BIGINT)").alias("x"),
        "l_orderkey",
        "l_linenumber",
    )
    rk = b.select(
        "flag",
        "x",
        F.row_number()
        .over(Window.partitionBy("flag").orderBy("x", "l_orderkey", "l_linenumber"))
        .alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy("flag")).alias("n"),
    )
    kept = rk.filter(
        (F.col("rn") > F.expr("CAST(FLOOR(n / 10) AS BIGINT)"))
        & (F.col("rn") <= F.col("n") - F.expr("CAST(FLOOR(n / 10) AS BIGINT)"))
    )
    return kept.groupBy("flag").agg(
        F.min("n").cast("bigint").alias("n_total"),
        F.count(F.lit(1)).cast("bigint").alias("n_kept"),
        F.expr("CAST(SUM(x) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)").alias(
            "trimmed_mean"
        ),
    )


@q(
    "agg_quartile_skew",
    """WITH b AS (
         SELECT l_returnflag AS flag, CAST(FLOOR(l_quantity) AS BIGINT) AS x
         FROM lineitem),
       c AS (
         SELECT flag, x,
                SUM(CAST(1 AS BIGINT)) OVER (PARTITION BY flag ORDER BY x) AS cumn,
                SUM(CAST(1 AS BIGINT)) OVER (PARTITION BY flag) AS total
         FROM b),
       q AS (
         SELECT flag,
                MIN(CASE WHEN 4 * cumn >= total THEN x END) AS q1,
                MIN(CASE WHEN 4 * cumn >= 2 * total THEN x END) AS q2,
                MIN(CASE WHEN 4 * cumn >= 3 * total THEN x END) AS q3
         FROM c GROUP BY flag)
       SELECT flag,
              CAST(q1 AS BIGINT) AS q1, CAST(q2 AS BIGINT) AS q2,
              CAST(q3 AS BIGINT) AS q3,
              CASE WHEN q3 > q1
                   THEN (CAST(q3 AS DOUBLE) + CAST(q1 AS DOUBLE)
                         - 2.0 * CAST(q2 AS DOUBLE))
                        / (CAST(q3 AS DOUBLE) - CAST(q1 AS DOUBLE))
                   ELSE 0.0 END AS bowley_skew
       FROM q""",
)
def agg_quartile_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D+ Bowley (quartile) skewness — the robust asymmetry measure that
    ignores tails entirely, complementing agg_moments' moment skewness
    (one outlier can dominate a third moment; quartiles shrug). All
    three quartiles come from ONE cumulative window via the generalized
    half-mass rule (min x with 4·cum ≥ k·total — lower-quartile
    convention, exact integers, conditional-min per k); the normalized
    skew is one shared-text float CASE. Same single-window cost as
    agg_mad's first pass."""
    li = read_table(spark, sf_dir, "lineitem")
    b = li.select(
        F.col("l_returnflag").alias("flag"),
        F.expr("CAST(FLOOR(l_quantity) AS BIGINT)").alias("x"),
    )
    wo = Window.partitionBy("flag").orderBy("x")
    wt = Window.partitionBy("flag")
    c = b.select(
        "flag",
        "x",
        F.sum(F.lit(1).cast("bigint")).over(wo).alias("cumn"),
        F.sum(F.lit(1).cast("bigint")).over(wt).alias("total"),
    )
    q_ = c.groupBy("flag").agg(
        F.min(F.expr("CASE WHEN 4 * cumn >= total THEN x END")).alias("q1"),
        F.min(F.expr("CASE WHEN 4 * cumn >= 2 * total THEN x END")).alias("q2"),
        F.min(F.expr("CASE WHEN 4 * cumn >= 3 * total THEN x END")).alias("q3"),
    )
    return q_.select(
        "flag",
        F.col("q1").cast("bigint").alias("q1"),
        F.col("q2").cast("bigint").alias("q2"),
        F.col("q3").cast("bigint").alias("q3"),
        F.expr(
            "CASE WHEN q3 > q1"
            " THEN (CAST(q3 AS DOUBLE) + CAST(q1 AS DOUBLE)"
            " - 2.0 * CAST(q2 AS DOUBLE))"
            " / (CAST(q3 AS DOUBLE) - CAST(q1 AS DOUBLE))"
            " ELSE 0.0 END"
        ).alias("bowley_skew"),
    )


_SQL_API2 = """
    WITH per_order AS (
      SELECT l_returnflag AS flag, l_orderkey,
             SUM(CAST(FLOOR(l_quantity) AS BIGINT)) AS qty
      FROM lineitem GROUP BY l_returnflag, l_orderkey),
    ranked AS (
      SELECT flag, l_orderkey, qty,
             ROW_NUMBER() OVER (PARTITION BY flag
                                ORDER BY qty DESC, l_orderkey) AS rn
      FROM per_order),
    top100 AS (SELECT flag, l_orderkey, qty FROM ranked WHERE rn <= 100)
    SELECT t.flag,
           CAST(COUNT(*) AS BIGINT) AS n_top,
           CAST(SUM(t.qty) AS BIGINT) AS top_qty,
           CAST(COUNT(DISTINCT o.o_custkey) AS BIGINT) AS n_customers
    FROM top100 t JOIN orders o ON t.l_orderkey = o.o_orderkey
    GROUP BY t.flag
"""


@q("sql_api2", _SQL_API2)
def sql_api2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Second identical-ANSI-text proof, exercising the harder SQL
    surface in one shared string: chained CTEs, a partitioned rank
    window with a deterministic tie-break, top-N semantics, a join back
    to a second fact, and COUNT(DISTINCT) — the exact text runs verbatim
    on spark.sql AND the DuckDB oracle (sql_api covers the basic
    join-aggregate shape; this one covers the analyst query shape).
    Integer-only aggregates, so parity is bit-level by construction."""
    for t in ("lineitem", "orders"):
        read_table(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(_SQL_API2)


@q(
    "win_dod_growth",
    """WITH daily AS (
         SELECT event_type, CAST(ts AS DATE) AS day,
                CAST(COUNT(*) AS BIGINT) AS cnt
         FROM events GROUP BY event_type, day),
       w AS (
         SELECT event_type, day, cnt,
                LAG(cnt) OVER (PARTITION BY event_type ORDER BY day) AS prev
         FROM daily)
       SELECT event_type, day, cnt, CAST(prev AS BIGINT) AS prev,
              CAST(FLOOR(1000000 * (cnt - prev) / prev) AS BIGINT) AS growth_ppm
       FROM w WHERE prev IS NOT NULL""",
)
def win_dod_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E+ day-over-day growth per series in exact floor-ppm — the
    metric every KPI dashboard leads with, done without the float
    percent that drifts across engines (the ppm integer IS the result;
    render ÷10⁴ as a percent at display time). One daily rollup + one
    keyed LAG window; first day of each series is excluded rather than
    fabricated. Negative growth floors toward −∞ like every other ppm
    key (consistent floor semantics both engines)."""
    ev = read_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.col("ts").cast("date").alias("day")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    w = daily.select(
        "event_type",
        "day",
        "cnt",
        F.lag("cnt").over(Window.partitionBy("event_type").orderBy("day")).alias("prev"),
    ).filter(F.col("prev").isNotNull())
    return w.select(
        "event_type",
        "day",
        "cnt",
        F.col("prev").cast("bigint").alias("prev"),
        F.expr("CAST(FLOOR(1000000 * (cnt - prev) / prev) AS BIGINT)").alias(
            "growth_ppm"
        ),
    )


@q(
    "freq_trio_mendel",
    """WITH obs AS (
         SELECT l_suppkey AS sample_id,
                CAST(l_partkey % 5 AS VARCHAR) AS chromosome,
                CAST(l_partkey * 31 + 1 AS BIGINT) AS position,
                CASE WHEN l_linenumber % 3 = 0 THEN 2
                     WHEN l_linenumber % 3 = 1 THEN 1 END AS gt
         FROM lineitem WHERE l_linenumber % 3 <> 2),
       g AS (
         SELECT sample_id, chromosome, position, CAST(MAX(gt) AS BIGINT) AS gt
         FROM obs GROUP BY sample_id, chromosome, position),
       child AS (
         SELECT CAST(sample_id / 3 AS BIGINT) AS trio_id,
                sample_id, chromosome, position, gt AS cgt
         FROM g WHERE sample_id % 3 = 0),
       j AS (
         SELECT c.trio_id, c.chromosome, c.position, c.cgt,
                COALESCE(f.gt, 0) AS fgt, COALESCE(m.gt, 0) AS mgt
         FROM child c
         LEFT JOIN g f ON f.sample_id = c.sample_id - 2
                      AND f.chromosome = c.chromosome AND f.position = c.position
         LEFT JOIN g m ON m.sample_id = c.sample_id - 1
                      AND m.chromosome = c.chromosome AND m.position = c.position),
       v AS (
         SELECT trio_id,
                CASE WHEN cgt < (CASE WHEN fgt = 2 THEN 1 ELSE 0 END
                                 + CASE WHEN mgt = 2 THEN 1 ELSE 0 END)
                       OR cgt > (CASE WHEN fgt >= 1 THEN 1 ELSE 0 END
                                 + CASE WHEN mgt >= 1 THEN 1 ELSE 0 END)
                     THEN 1 ELSE 0 END AS viol
         FROM j)
       SELECT trio_id,
              CAST(COUNT(*) AS BIGINT) AS n_sites,
              CAST(SUM(viol) AS BIGINT) AS n_violations,
              CAST(FLOOR(1000000 * SUM(viol) / COUNT(*)) AS BIGINT) AS violation_ppm
       FROM v GROUP BY trio_id""",
)
def freq_trio_mendel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Varda-domain trio QC: Mendelian-consistency rate per family trio —
    the standard sample-swap / contamination screen a population-genetics
    warehouse runs after import (a mislabeled child lights up as an
    elevated violation ppm). Samples group into (father, mother, child) =
    (3t+1, 3t+2, 3t+3); genotype = max alt-dosage per (sample, site)
    (dedup across observation lines); a missing parent site is
    homozygous-reference by the dataset's absence semantics. Violation
    test is the exact transmission interval: child dosage must lie in
    [#{hom parents}, #{parents with an alt}] — pure integer CASE logic,
    no floats until the final ppm floor. Plan: one keyed genotype
    dedup, two site-keyed left joins (child side shuffles once on the
    same (chromosome, position) key), one per-trio rollup."""
    li = read_table(spark, sf_dir, "lineitem")
    obs = li.filter(F.expr("l_linenumber % 3 <> 2")).select(
        F.col("l_suppkey").alias("sample_id"),
        F.expr("CAST(l_partkey % 5 AS STRING)").alias("chromosome"),
        F.expr("CAST(l_partkey * 31 + 1 AS BIGINT)").alias("position"),
        F.expr(
            "CASE WHEN l_linenumber % 3 = 0 THEN 2"
            " WHEN l_linenumber % 3 = 1 THEN 1 END"
        ).alias("gt"),
    )
    g = obs.groupBy("sample_id", "chromosome", "position").agg(
        F.max("gt").cast("bigint").alias("gt")
    )
    child = g.filter(F.expr("sample_id % 3 = 0")).select(
        F.expr("CAST(sample_id / 3 AS BIGINT)").alias("trio_id"),
        "sample_id",
        "chromosome",
        "position",
        F.col("gt").alias("cgt"),
    )
    f = g.select(
        F.col("sample_id").alias("f_id"),
        F.col("chromosome").alias("f_chr"),
        F.col("position").alias("f_pos"),
        F.col("gt").alias("f_gt"),
    )
    m = g.select(
        F.col("sample_id").alias("m_id"),
        F.col("chromosome").alias("m_chr"),
        F.col("position").alias("m_pos"),
        F.col("gt").alias("m_gt"),
    )
    j = (
        child.join(
            f,
            (F.col("f_id") == F.col("sample_id") - 2)
            & (F.col("f_chr") == F.col("chromosome"))
            & (F.col("f_pos") == F.col("position")),
            "left",
        )
        .join(
            m,
            (F.col("m_id") == F.col("sample_id") - 1)
            & (F.col("m_chr") == F.col("chromosome"))
            & (F.col("m_pos") == F.col("position")),
            "left",
        )
        .select(
            "trio_id",
            "cgt",
            F.coalesce(F.col("f_gt"), F.lit(0)).alias("fgt"),
            F.coalesce(F.col("m_gt"), F.lit(0)).alias("mgt"),
        )
    )
    v = j.select(
        "trio_id",
        F.expr(
            "CASE WHEN cgt < (CASE WHEN fgt = 2 THEN 1 ELSE 0 END"
            " + CASE WHEN mgt = 2 THEN 1 ELSE 0 END)"
            " OR cgt > (CASE WHEN fgt >= 1 THEN 1 ELSE 0 END"
            " + CASE WHEN mgt >= 1 THEN 1 ELSE 0 END)"
            " THEN 1 ELSE 0 END"
        ).alias("viol"),
    )
    return v.groupBy("trio_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_sites"),
        F.sum("viol").cast("bigint").alias("n_violations"),
        F.expr(
            "CAST(FLOOR(1000000 * SUM(viol) / COUNT(*)) AS BIGINT)"
        ).alias("violation_ppm"),
    )


@q(
    "agg_runs_test",
    """WITH daily AS (
         SELECT event_type, CAST(ts AS DATE) AS day,
                CAST(COUNT(*) AS BIGINT) AS cnt
         FROM events GROUP BY event_type, day),
       d AS (
         SELECT event_type, day, cnt,
                cnt - LAG(cnt) OVER (PARTITION BY event_type ORDER BY day) AS diff
         FROM daily),
       s AS (
         SELECT event_type, day,
                CASE WHEN diff > 0 THEN 1 ELSE 0 END AS up,
                CASE WHEN diff > 0 THEN 1 ELSE 0 END
                  - LAG(CASE WHEN diff > 0 THEN 1 ELSE 0 END)
                      OVER (PARTITION BY event_type ORDER BY day) AS flip
         FROM d WHERE diff IS NOT NULL AND diff <> 0),
       agg AS (
         SELECT event_type,
                CAST(SUM(up) AS BIGINT) AS n1,
                CAST(COUNT(*) - SUM(up) AS BIGINT) AS n2,
                CAST(1 + SUM(CASE WHEN flip <> 0 THEN 1 ELSE 0 END)
                     AS BIGINT) AS runs
         FROM s GROUP BY event_type)
       SELECT event_type, n1, n2, runs,
              (CAST(runs AS DOUBLE)
               - (2.0 * CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)
                  / (CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE)) + 1.0))
              / sqrt(CAST(2 * n1 * n2 * (2 * n1 * n2 - n1 - n2) AS DOUBLE)
                     / (CAST((n1 + n2) * (n1 + n2) * (n1 + n2 - 1) AS DOUBLE)))
              AS runs_z
       FROM agg WHERE n1 > 0 AND n2 > 0 AND n1 + n2 > 1""",
)
def agg_runs_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D+ Wald–Wolfowitz runs test on the up/down sequence of daily
    volume moves — completes the exact statistical-test family (agg_ks:
    distribution drift, agg_chisq: label independence, agg_autocorr:
    linear memory; runs: NON-linear serial dependence — a metric that
    alternates too regularly or trends too long both fail here while
    passing autocorrelation). Ties (zero diffs) drop per the classical
    test. The run count comes from one LAG flip-detect window; n1/n2/
    runs are exact integers, and the z-statistic is one shared-text
    float expression whose only transcendental is the IEEE-exact sqrt
    — the variance numerator/denominator are exact BIGINTs cast once
    (< 2⁵³ through sf100 on daily series). Two keyed windows, one
    rollup."""
    ev = read_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.col("ts").cast("date").alias("day")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    w = Window.partitionBy("event_type").orderBy("day")
    d = daily.select(
        "event_type",
        "day",
        (F.col("cnt") - F.lag("cnt").over(w)).alias("diff"),
    ).filter(F.col("diff").isNotNull() & (F.col("diff") != 0))
    s = d.select(
        "event_type",
        "day",
        F.expr("CASE WHEN diff > 0 THEN 1 ELSE 0 END").alias("up"),
    ).select(
        "event_type",
        "up",
        (F.col("up") - F.lag("up").over(w)).alias("flip"),
    )
    agg = s.groupBy("event_type").agg(
        F.sum("up").cast("bigint").alias("n1"),
        (F.count(F.lit(1)) - F.sum("up")).cast("bigint").alias("n2"),
        (1 + F.sum(F.expr("CASE WHEN flip <> 0 THEN 1 ELSE 0 END")))
        .cast("bigint")
        .alias("runs"),
    )
    return agg.filter("n1 > 0 AND n2 > 0 AND n1 + n2 > 1").select(
        "event_type",
        "n1",
        "n2",
        "runs",
        F.expr(
            "(CAST(runs AS DOUBLE)"
            " - (2.0 * CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)"
            " / (CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE)) + 1.0))"
            " / sqrt(CAST(2 * n1 * n2 * (2 * n1 * n2 - n1 - n2) AS DOUBLE)"
            " / (CAST((n1 + n2) * (n1 + n2) * (n1 + n2 - 1) AS DOUBLE)))"
        ).alias("runs_z"),
    )


@q(
    "win_minmax_scale",
    """WITH b AS (
         SELECT vec_id, label,
                CAST(FLOOR(CAST(embedding[1] AS DOUBLE) * 1000000) AS BIGINT) AS vq
         FROM embeddings),
       st AS (
         SELECT label, MIN(vq) AS mn, MAX(vq) AS mx FROM b GROUP BY label)
       SELECT b.vec_id, b.label,
              CASE WHEN st.mx = st.mn THEN 0
                   ELSE CAST(FLOOR(1000000 * (b.vq - st.mn) / (st.mx - st.mn))
                             AS BIGINT) END AS scaled_ppm
       FROM b JOIN st ON b.label = st.label""",
)
def win_minmax_scale(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D/E feature scaling: per-group min-max normalization to exact
    ppm units (here: first embedding dimension per label) — the
    preprocessing primitive before distance-based methods when groups
    live on different scales. emb_quantize's 0..255 codes are the
    storage variant; this is the full-resolution 0..1e6 feature form.
    Group stats are a k-row broadcast back onto the fact; constant
    groups scale to 0 rather than dividing by zero. Everything integer
    until nothing — there is no float at all in the output."""
    emb = read_table(spark, sf_dir, "embeddings")
    b = emb.select(
        "vec_id",
        "label",
        F.expr(
            "CAST(FLOOR(CAST(element_at(embedding, 1) AS DOUBLE) * 1000000)"
            " AS BIGINT)"
        ).alias("vq"),
    )
    st = b.groupBy("label").agg(F.min("vq").alias("mn"), F.max("vq").alias("mx"))
    return b.join(F.broadcast(st), "label").select(
        "vec_id",
        "label",
        F.expr(
            "CASE WHEN mx = mn THEN 0"
            " ELSE CAST(FLOOR(1000000 * (vq - mn) / (mx - mn)) AS BIGINT) END"
        ).alias("scaled_ppm"),
    )


@q(
    "text_ngram_novelty",
    """WITH words AS (
         SELECT doc_id, string_split(trim(text), ' ') AS w FROM documents),
       sh AS (
         SELECT DISTINCT doc_id,
                unnest(list_transform(range(1, greatest(len(w) - 1, 1)),
                       i -> w[i] || ' ' || w[i + 1] || ' ' || w[i + 2])) AS shingle
         FROM words),
       firsts AS (
         SELECT shingle, CAST(MIN(doc_id) AS BIGINT) AS first_doc FROM sh
         GROUP BY shingle),
       per AS (
         SELECT sh.doc_id,
                CAST(COUNT(*) AS BIGINT) AS n_shingles,
                CAST(SUM(CASE WHEN f.first_doc = sh.doc_id THEN 1 ELSE 0 END)
                     AS BIGINT) AS n_novel
         FROM sh JOIN firsts f ON sh.shingle = f.shingle
         GROUP BY sh.doc_id)
       SELECT doc_id, n_shingles, n_novel,
              CAST(FLOOR(1000000 * n_novel / n_shingles) AS BIGINT) AS novelty_ppm
       FROM per""",
)
def text_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K4+ corpus novelty curve: per document, the fraction of its
    3-gram shingles never seen in any LOWER-id document — the
    redundancy-growth diagnostic behind dedup budgeting (novelty
    trending to zero means additional crawl is re-collecting the same
    text; per-source novelty decides which feeds to keep). First-seer
    attribution is a MIN over doc ids per shingle (the same inverted
    index dedup_ngram builds — near-uniform shuffle key), joined back
    map-side. Exact floor-ppm output; the ordering is by ingest id, the
    stable content-address analog of arrival time."""
    docs = read_table(spark, sf_dir, "documents")
    from varda_spark.operators.dedup import shingles

    sh = shingles(docs.select("doc_id", "text"), n=3).distinct()
    firsts = sh.groupBy("shingle").agg(
        F.min("doc_id").cast("bigint").alias("first_doc")
    )
    per = (
        sh.join(firsts, "shingle")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_shingles"),
            F.sum(
                F.expr("CASE WHEN first_doc = doc_id THEN 1 ELSE 0 END")
            ).cast("bigint").alias("n_novel"),
        )
    )
    return per.select(
        "doc_id",
        "n_shingles",
        "n_novel",
        F.expr(
            "CAST(FLOOR(1000000 * n_novel / n_shingles) AS BIGINT)"
        ).alias("novelty_ppm"),
    )


@q(
    "agg_seasonality",
    """WITH d AS (
         SELECT event_type,
                CAST(date_part('dow', CAST(ts AS DATE)) AS BIGINT) AS dow
         FROM events),
       c AS (
         SELECT event_type, dow, CAST(COUNT(*) AS BIGINT) AS n
         FROM d GROUP BY event_type, dow),
       t AS (
         SELECT event_type, CAST(SUM(n) AS BIGINT) AS total
         FROM c GROUP BY event_type)
       SELECT c.event_type, c.dow, c.n,
              CAST(FLOOR(1000000 * c.n / t.total) AS BIGINT) AS share_ppm
       FROM c JOIN t ON c.event_type = t.event_type""",
)
def agg_seasonality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D+ weekly seasonality fingerprint: event share per (type,
    day-of-week) in exact floor-ppm — the profile that separates
    human-driven series (weekday peaks) from machine-driven ones (flat),
    and the baseline win_cusum/win_outlier should be read against.
    Day-of-week convention is pinned to 0 = Sunday on both engines
    (Spark's dayofweek() is 1-based Sunday, so the Column subtracts 1 —
    the one place the engines' calendar functions disagree and the twin
    texts intentionally differ). k-row totals broadcast back; one
    map-combined pass."""
    ev = read_table(spark, sf_dir, "events")
    d = ev.select(
        "event_type",
        (F.dayofweek(F.col("ts").cast("date")) - 1).cast("bigint").alias("dow"),
    )
    c = d.groupBy("event_type", "dow").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    t = c.groupBy("event_type").agg(F.sum("n").cast("bigint").alias("total"))
    return c.join(F.broadcast(t), "event_type").select(
        "event_type",
        "dow",
        "n",
        F.expr("CAST(FLOOR(1000000 * n / total) AS BIGINT)").alias("share_ppm"),
    )


@q(
    "win_peak_detect",
    """WITH daily AS (
         SELECT event_type, CAST(ts AS DATE) AS day,
                CAST(COUNT(*) AS BIGINT) AS cnt
         FROM events GROUP BY event_type, day),
       w AS (
         SELECT event_type, day, cnt,
                LAG(cnt) OVER (PARTITION BY event_type ORDER BY day) AS prev,
                LEAD(cnt) OVER (PARTITION BY event_type ORDER BY day) AS next
         FROM daily)
       SELECT event_type, day, cnt,
              CAST(prev AS BIGINT) AS prev, CAST(next AS BIGINT) AS next
       FROM w
       WHERE prev IS NOT NULL AND next IS NOT NULL
         AND cnt > prev AND cnt > next""",
)
def win_peak_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E+ local-maximum detection on daily series: days strictly above
    both neighbors — the spike picker that feeds incident review (CUSUM
    finds sustained shifts; this finds one-day bursts). Strict
    inequality keeps plateaus out (a flat top is not a spike);
    boundary days are excluded, not fabricated. One keyed window
    carrying both LAG and LEAD in a single sort."""
    ev = read_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.col("ts").cast("date").alias("day")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    w = Window.partitionBy("event_type").orderBy("day")
    d = daily.select(
        "event_type",
        "day",
        "cnt",
        F.lag("cnt").over(w).alias("prev"),
        F.lead("cnt").over(w).alias("next"),
    )
    return d.filter(
        F.col("prev").isNotNull()
        & F.col("next").isNotNull()
        & (F.col("cnt") > F.col("prev"))
        & (F.col("cnt") > F.col("next"))
    ).select(
        "event_type",
        "day",
        "cnt",
        F.col("prev").cast("bigint").alias("prev"),
        F.col("next").cast("bigint").alias("next"),
    )


@q(
    "interval_tile",
    """WITH ivs AS (
         SELECT CAST(s_suppkey % 5 AS VARCHAR) AS chromosome,
                CAST(s_suppkey * 97 + 1 AS BIGINT) AS begin,
                CAST(s_suppkey * 97 + 1 + 200 + (s_suppkey % 7) * 500
                     AS BIGINT) AS "end",
                s_suppkey AS sample_key
         FROM supplier),
       t AS (
         SELECT chromosome, sample_key, begin, "end", CAST(i AS BIGINT) AS tile_idx
         FROM ivs,
              unnest(range(0, CAST(CEIL(("end" - begin) / 500.0) AS BIGINT)))
              AS u(i))
       SELECT chromosome, CAST(sample_key AS BIGINT) AS sample_key, tile_idx,
              begin + tile_idx * 500 AS tile_start,
              LEAST(begin + (tile_idx + 1) * 500, "end") AS tile_end
       FROM t""",
)
def interval_tile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C1+ fixed-width interval tiling (bedtools makewindows): chop every
    interval into 500-unit tiles, last tile clipped at the interval end
    — the layout primitive under per-window coverage, rolling genomic
    stats, and parallel region dispatch (each tile is an independent
    work unit, which is exactly why a 100 TB scatter wants this shape).
    Tile counts are exact ceil-division integers; the explode is
    map-side (sequence length = interval length / width, bounded by the
    data's own max interval: 3.7k units → ≤ 8 tiles). Empty intervals
    cannot occur here (end > begin by construction), so the
    sequence-descends footgun is structurally excluded."""
    _, s = _points_intervals(spark, sf_dir)
    t = s.select(
        "chromosome",
        F.col("sample_key").cast("bigint").alias("sample_key"),
        "begin",
        "end",
        F.explode(
            F.expr("sequence(CAST(0 AS BIGINT),"
                   " CAST(CEIL((end - begin) / 500.0) AS BIGINT) - 1)")
        ).alias("tile_idx"),
    )
    return t.select(
        "chromosome",
        "sample_key",
        "tile_idx",
        F.expr("begin + tile_idx * 500").alias("tile_start"),
        F.expr("LEAST(begin + (tile_idx + 1) * 500, end)").alias("tile_end"),
    )


@q(
    "agg_interarrival",
    """WITH p AS (
         SELECT event_type, ts,
                epoch_us(ts) - epoch_us(LAG(ts) OVER
                  (PARTITION BY event_type ORDER BY ts, event_id)) AS gap_us
         FROM events),
       g AS (SELECT event_type, CAST(gap_us AS BIGINT) AS gap_us
             FROM p WHERE gap_us IS NOT NULL),
       rk AS (
         SELECT event_type, gap_us,
                SUM(CAST(1 AS BIGINT)) OVER (PARTITION BY event_type
                                             ORDER BY gap_us) AS cumn,
                SUM(CAST(1 AS BIGINT)) OVER (PARTITION BY event_type) AS total
         FROM g),
       med AS (
         SELECT event_type, CAST(MIN(gap_us) AS BIGINT) AS median_gap_us
         FROM rk WHERE 2 * cumn >= total GROUP BY event_type),
       s AS (
         SELECT event_type,
                CAST(COUNT(*) AS BIGINT) AS n_gaps,
                CAST(MIN(gap_us) AS BIGINT) AS min_gap_us,
                CAST(MAX(gap_us) AS BIGINT) AS max_gap_us,
                CAST(SUM(gap_us) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS mean_gap_us
         FROM g GROUP BY event_type)
       SELECT s.event_type, s.n_gaps, s.min_gap_us, s.max_gap_us,
              med.median_gap_us, s.mean_gap_us
       FROM s JOIN med ON s.event_type = med.event_type""",
)
def agg_interarrival(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D+ inter-arrival gap distribution per event type — the traffic-
    shape sheet (median ≪ mean flags burstiness against the Poisson
    null; the capacity planner's first look, and the natural prior for
    stream watermark tuning). Gaps come from one LAG window in exact
    epoch-microseconds ((ts, event_id) order pins ties); median via the
    half-mass idiom, mean from an exact integer sum. Two keyed windows,
    one rollup — partitioned by series throughout."""
    ev = read_table(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    g = ev.select(
        "event_type",
        (F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w))).alias("gap_us"),
    ).filter(F.col("gap_us").isNotNull())
    wo = Window.partitionBy("event_type").orderBy("gap_us")
    wt = Window.partitionBy("event_type")
    rk = g.select(
        "event_type",
        "gap_us",
        F.sum(F.lit(1).cast("bigint")).over(wo).alias("cumn"),
        F.sum(F.lit(1).cast("bigint")).over(wt).alias("total"),
    )
    med = (
        rk.filter(2 * F.col("cumn") >= F.col("total"))
        .groupBy("event_type")
        .agg(F.min("gap_us").cast("bigint").alias("median_gap_us"))
    )
    s = g.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_gaps"),
        F.min("gap_us").cast("bigint").alias("min_gap_us"),
        F.max("gap_us").cast("bigint").alias("max_gap_us"),
        F.expr(
            "CAST(SUM(gap_us) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)"
        ).alias("mean_gap_us"),
    )
    return s.join(F.broadcast(med), "event_type").select(
        "event_type",
        "n_gaps",
        "min_gap_us",
        "max_gap_us",
        "median_gap_us",
        "mean_gap_us",
    )


@q(
    "agg_abc_class",
    """WITH rev AS (
         SELECT l_partkey,
                CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,4)) * 10000
                              AS BIGINT)) AS BIGINT) AS rev_c
         FROM lineitem GROUP BY l_partkey),
       tot AS (SELECT CAST(SUM(rev_c) AS BIGINT) AS tot_c FROM rev),
       rk AS (
         SELECT r.l_partkey, r.rev_c, t.tot_c,
                SUM(r.rev_c) OVER (ORDER BY r.rev_c DESC, r.l_partkey) AS cum_c
         FROM rev r CROSS JOIN tot t),
       cls AS (
         SELECT l_partkey, rev_c,
                CASE WHEN 100 * CAST(cum_c - rev_c AS DECIMAL(38,0))
                          < 80 * CAST(tot_c AS DECIMAL(38,0)) THEN 'A'
                     WHEN 100 * CAST(cum_c - rev_c AS DECIMAL(38,0))
                          < 95 * CAST(tot_c AS DECIMAL(38,0)) THEN 'B'
                     ELSE 'C' END AS abc
         FROM rk)
       SELECT abc,
              CAST(COUNT(*) AS BIGINT) AS n_parts,
              CAST(SUM(rev_c) AS BIGINT) AS class_rev_c
       FROM cls GROUP BY abc""",
)
def agg_abc_class(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D+ ABC (Pareto) classification of parts by revenue: A = items
    before the 80% cumulative-revenue line, B to 95%, C the tail — the
    inventory-policy partition every ops team quotes, and the
    quantitative cousin of agg_hhi's concentration index. Boundary rule
    is "class by the share BEFORE this item" (cum − own) in exact 1e-4
    currency units, so the line item that crosses the threshold still
    counts toward the class it started in — deterministic, no float
    shares; the ×100/×80 threshold compare runs in DECIMAL(38,0) in both
    engines so it cannot overflow int64 at large scale factors (total
    revenue ×100 passes 2^63 around sf≈40 in 1e-4 units). The cumulative
    window is global by construction (a ranking
    of ALL parts); at 100 TB the part-level rollup (the only fact-sized
    shuffle) reduces to one row per part first, so the windowed set is
    dimension-sized — documented single-partition window, whitelisted
    like paginate_window."""
    li = read_table(spark, sf_dir, "lineitem")
    rev = li.groupBy("l_partkey").agg(
        F.sum(
            F.expr("CAST(CAST(l_extendedprice AS DECIMAL(18,4)) * 10000 AS BIGINT)")
        ).cast("bigint").alias("rev_c")
    )
    tot = rev.agg(F.sum("rev_c").cast("bigint").alias("tot_c"))
    rk = rev.crossJoin(F.broadcast(tot)).withColumn(
        "cum_c",
        F.sum("rev_c").over(
            Window.orderBy(F.desc("rev_c"), F.col("l_partkey"))
        ),
    )
    cls = rk.select(
        "rev_c",
        F.expr(
            "CASE WHEN 100 * CAST(cum_c - rev_c AS DECIMAL(38,0))"
            " < 80 * CAST(tot_c AS DECIMAL(38,0)) THEN 'A'"
            " WHEN 100 * CAST(cum_c - rev_c AS DECIMAL(38,0))"
            " < 95 * CAST(tot_c AS DECIMAL(38,0)) THEN 'B'"
            " ELSE 'C' END"
        ).alias("abc"),
    )
    return cls.groupBy("abc").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_parts"),
        F.sum("rev_c").cast("bigint").alias("class_rev_c"),
    )


@q(
    "win_vwap",
    """WITH b AS (
         SELECT l_returnflag AS flag, l_shipdate, l_orderkey, l_linenumber,
                CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,4)) * 10000
                              AS BIGINT)
                         * CAST(FLOOR(l_quantity) AS BIGINT)) AS BIGINT) AS pq,
                CAST(SUM(CAST(FLOOR(l_quantity) AS BIGINT)) AS BIGINT) AS qty
         FROM lineitem
         GROUP BY l_returnflag, l_shipdate, l_orderkey, l_linenumber),
       w AS (
         SELECT flag, l_shipdate, l_orderkey, l_linenumber,
                SUM(CAST(pq AS DECIMAL(38,0))) OVER win AS cum_pq,
                SUM(qty) OVER win AS cum_q
         FROM b
         WINDOW win AS (PARTITION BY flag
                        ORDER BY l_shipdate, l_orderkey, l_linenumber))
       SELECT flag, l_orderkey, l_linenumber,
              CAST(cum_q AS BIGINT) AS cum_q,
              CAST(cum_pq AS DOUBLE) / CAST(cum_q AS DOUBLE) / 10000.0 AS vwap
       FROM w""",
)
def win_vwap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E+ running value-weighted average price per flag, in ship-date
    order — the VWAP every execution desk tracks, generalizing to any
    running weighted mean (cost per unit to date, blended rate). Both
    cumulative sums are exact integers (price in 1e-4 units ×
    integral quantity, DECIMAL(38,0) against overflow on the product
    sum); the OUTPUT carries only cum_q (bigint-safe) and the de-scaled
    double vwap — the raw cum_pq column is deliberately NOT emitted: a
    bigint cast would cap the operator at the sf where the running
    product-sum passes 2^63 (~sf40), and a DECIMAL(38,0) output column
    round-trips as Decimal objects on the Spark side but float64 on the
    DuckDB side, breaking the driver's canonical row sort. The ratio is
    the only float, de-scaled in a fixed-order expression over the
    exact interior. The keyed pre-aggregation is load-bearing: the
    shipped lineitem has BAG semantics and ~3 (flag, date, order, line)
    sort-key ties carry DIFFERENT price/qty, so a cumulative window over
    raw rows emits order-dependent intermediate sums at the ties —
    collapsing to one point per line id first makes every cum value
    content-determined (same fix as win_rolling_corr). One keyed window,
    two sums sharing one sort."""
    li = read_table(spark, sf_dir, "lineitem")
    b = (
        li.groupBy(
            F.col("l_returnflag").alias("flag"),
            "l_shipdate",
            "l_orderkey",
            "l_linenumber",
        ).agg(
            F.sum(
                F.expr(
                    "CAST(CAST(l_extendedprice AS DECIMAL(18,4)) * 10000"
                    " AS BIGINT) * CAST(FLOOR(l_quantity) AS BIGINT)"
                )
            ).cast("bigint").alias("pq"),
            F.sum(F.expr("CAST(FLOOR(l_quantity) AS BIGINT)"))
            .cast("bigint")
            .alias("qty"),
        )
    )
    win = Window.partitionBy("flag").orderBy(
        "l_shipdate", "l_orderkey", "l_linenumber"
    )
    w = b.select(
        "flag",
        "l_orderkey",
        "l_linenumber",
        F.sum(F.expr("CAST(pq AS DECIMAL(38,0))")).over(win).alias("cum_pq"),
        F.sum("qty").over(win).alias("cum_q"),
    )
    return w.select(
        "flag",
        "l_orderkey",
        "l_linenumber",
        F.col("cum_q").cast("bigint").alias("cum_q"),
        F.expr(
            "CAST(cum_pq AS DOUBLE) / CAST(cum_q AS DOUBLE) / 10000.0"
        ).alias("vwap"),
    )


@q(
    "join_basket_lift",
    """WITH lp AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
       n_ord AS (SELECT CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS n FROM lp),
       item AS (SELECT l_partkey, CAST(COUNT(*) AS BIGINT) AS n_i
                FROM lp GROUP BY l_partkey),
       pair AS (
         SELECT a.l_partkey AS pa, b.l_partkey AS pb,
                CAST(COUNT(*) AS BIGINT) AS n_ab
         FROM lp a JOIN lp b
           ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
         GROUP BY a.l_partkey, b.l_partkey
         HAVING COUNT(*) >= 3),
       lift AS (
         SELECT p.pa, p.pb, p.n_ab,
                CAST(FLOOR(100 * p.n_ab * o.n / (ia.n_i * ib.n_i)) AS BIGINT)
                  AS lift_centi
         FROM pair p
         JOIN item ia ON p.pa = ia.l_partkey
         JOIN item ib ON p.pb = ib.l_partkey
         CROSS JOIN n_ord o)
       SELECT pa, pb, n_ab, lift_centi
       FROM lift ORDER BY lift_centi DESC, pa, pb LIMIT 20""",
)
def join_basket_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Association-rule lift for co-purchased pairs: lift = P(a,b) /
    (P(a)·P(b)) — the measure that separates genuinely associated items
    from merely popular ones (graph_jaccard scores overlap; lift
    NORMALIZES it by both marginals, so two niche items always bought
    together outrank two staples that co-occur by chance). Support
    floor (≥ 3 baskets) kills noise pairs before the join. Centi-scaled
    exact integers: 100·n_ab·N stays < 2⁵³ through sf100 daily volumes,
    so the floor is deterministic cross-engine; pair generation fans
    out per basket (bounded width), the rule every market-basket
    pipeline at scale follows. Top-20 is TakeOrderedAndProject."""
    li = read_table(spark, sf_dir, "lineitem")
    lp = li.select("l_orderkey", "l_partkey").distinct().localCheckpoint()
    n_ord = lp.agg(
        F.countDistinct("l_orderkey").cast("bigint").alias("n")
    )
    item = lp.groupBy("l_partkey").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_i")
    )
    a, b = lp.alias("a"), lp.alias("b")
    pair = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(F.col("a.l_partkey").alias("pa"), F.col("b.l_partkey").alias("pb"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_ab"))
        .filter(F.col("n_ab") >= 3)
    )
    ia = item.withColumnRenamed("l_partkey", "pa").withColumnRenamed("n_i", "na")
    ib = item.withColumnRenamed("l_partkey", "pb").withColumnRenamed("n_i", "nb")
    lift = (
        pair.join(ia, "pa")
        .join(ib, "pb")
        .crossJoin(F.broadcast(n_ord))
        .select(
            "pa",
            "pb",
            "n_ab",
            F.expr(
                "CAST(FLOOR(100 * n_ab * n / (na * nb)) AS BIGINT)"
            ).alias("lift_centi"),
        )
    )
    return lift.orderBy(F.desc("lift_centi"), "pa", "pb").limit(20)


@q(
    "emb_pair_dist_hist",
    """WITH q AS (
         SELECT vec_id, label,
                list_transform(embedding,
                    x -> CAST(floor(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS e
         FROM embeddings),
       n AS (
         SELECT vec_id, label, e,
                CAST(list_sum(list_transform(e, x -> x * x)) AS BIGINT) AS n2
         FROM q),
       pairs AS (
         SELECT a.label,
                CAST(list_sum(list_transform(list_zip(a.e, b.e),
                                             s -> s[1] * s[2])) AS BIGINT) AS dq,
                a.n2 AS na2, b.n2 AS nb2
         FROM n a JOIN n b ON a.label = b.label AND a.vec_id < b.vec_id),
       bins AS (
         SELECT label,
                CAST(FLOOR(10.0 * (1.0 - dq / sqrt(CAST(na2 * nb2 AS DOUBLE))))
                     AS BIGINT) AS dist_decile
         FROM pairs)
       SELECT label, dist_decile, CAST(COUNT(*) AS BIGINT) AS n
       FROM bins GROUP BY label, dist_decile""",
)
def emb_pair_dist_hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K3+ embedding-space health histogram: within-label pairwise
    cosine-DISTANCE deciles — the collapse diagnostic that norms
    (emb_norm_hist) cannot see: an encoder whose outputs bunch up shows
    mass piling into decile 0 while a healthy space spreads, and the
    per-label view separates a collapsed class from a collapsed model.
    Pairs are label-blocked (the dedup_embcos bound — never corpus ×
    corpus); dot and norms are exact quantized integers computed
    dimension-agnostically in both engines (list_zip/list_sum on the
    DuckDB side, zip_with/aggregate on the Spark side — no hardcoded
    width), and the decile
    edge is floor of a fixed-order expression whose one transcendental
    is IEEE-exact sqrt. Output is a bounded (labels × 11)-row table no
    matter the corpus size."""
    from varda_spark.operators.similarity import quantized

    e = read_table(spark, sf_dir, "embeddings")
    q_ = e.select("vec_id", "label", quantized("embedding", scale=1000).alias("e"))
    n = q_.select(
        "vec_id",
        "label",
        "e",
        F.expr(
            "aggregate(transform(e, x -> x * x), CAST(0 AS BIGINT), (a, b) -> a + b)"
        ).alias("n2"),
    )
    a_ = n.select(
        F.col("vec_id").alias("a_id"),
        "label",
        F.col("e").alias("ea"),
        F.col("n2").alias("na2"),
    )
    b_ = n.select(
        F.col("vec_id").alias("b_id"),
        "label",
        F.col("e").alias("eb"),
        F.col("n2").alias("nb2"),
    )
    pairs = a_.join(b_, "label").filter(F.col("a_id") < F.col("b_id")).select(
        "label",
        F.expr(
            "aggregate(zip_with(ea, eb, (x, y) -> x * y),"
            " CAST(0 AS BIGINT), (a, b) -> a + b)"
        ).alias("dq"),
        "na2",
        "nb2",
    )
    bins = pairs.select(
        "label",
        F.expr(
            "CAST(FLOOR(10.0 * (1.0 - dq / sqrt(CAST(na2 * nb2 AS DOUBLE))))"
            " AS BIGINT)"
        ).alias("dist_decile"),
    )
    return bins.groupBy("label", "dist_decile").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )


@q(
    "text_code_detect",
    """WITH m AS (
         SELECT doc_id,
                CAST(length(text) AS BIGINT) AS n_chars,
                CAST(length(text)
                     - length(regexp_replace(text, '[{{}};()\\[\\]<>=]', '', 'g'))
                     AS BIGINT) AS n_codechars,
                CAST(len(regexp_extract_all(text,
                     '(def |class |import |return |void |int |function )'))
                     AS BIGINT) AS n_keywords
         FROM documents),
       s AS (
         SELECT doc_id, n_chars, n_codechars, n_keywords,
                CAST(FLOOR(1000000 * n_codechars / greatest(n_chars, 1))
                     AS BIGINT) AS codechar_ppm
         FROM m)
       SELECT doc_id, n_chars, codechar_ppm, n_keywords,
              (codechar_ppm >= 20000 OR n_keywords >= 2) AS looks_like_code
       FROM s""",
)
def text_code_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K4+ code-vs-prose detector: the training-mix router that decides
    whether a document goes to the code pipeline (different dedup
    granularity, different quality rules) or the prose one. Two cheap
    signals, both exact integers: density of code-ish punctuation
    (braces/semicolons/brackets, counted via the replace-length trick
    so no regex-count semantics can diverge) and a keyword hit count
    from regexp_extract_all (parity proven by the regex keys). The
    verdict is a boolean OR of thresholds — one map-side pass, filter
    reaches the scan. On this prose corpus nearly everything is
    not-code, which is itself the property the test asserts."""
    docs = read_table(spark, sf_dir, "documents")
    m = docs.select(
        "doc_id",
        F.length("text").cast("bigint").alias("n_chars"),
        (
            F.length("text")
            - F.length(F.regexp_replace("text", r"[{};()\[\]<>=]", ""))
        ).cast("bigint").alias("n_codechars"),
        F.expr(
            "CAST(size(regexp_extract_all(text,"
            " '(def |class |import |return |void |int |function )', 0))"
            " AS BIGINT)"
        ).alias("n_keywords"),
    )
    s = m.select(
        "doc_id",
        "n_chars",
        "n_keywords",
        F.expr(
            "CAST(FLOOR(1000000 * n_codechars / greatest(n_chars, 1)) AS BIGINT)"
        ).alias("codechar_ppm"),
    )
    return s.select(
        "doc_id",
        "n_chars",
        "codechar_ppm",
        "n_keywords",
        ((F.col("codechar_ppm") >= 20000) | (F.col("n_keywords") >= 2)).alias(
            "looks_like_code"
        ),
    )


@q(
    "agg_dup_factor",
    """WITH words AS (
         SELECT doc_id, source, string_split(trim(text), ' ') AS w FROM documents),
       sh AS (
         SELECT doc_id, source,
                unnest(list_transform(range(1, greatest(len(w) - 1, 1)),
                       i -> w[i] || ' ' || w[i + 1] || ' ' || w[i + 2])) AS shingle
         FROM words),
       s AS (
         SELECT source,
                CAST(COUNT(*) AS BIGINT) AS n_total,
                CAST(COUNT(DISTINCT shingle) AS BIGINT) AS n_distinct
         FROM sh GROUP BY source)
       SELECT source, n_total, n_distinct,
              CAST(FLOOR(1000000 * n_total / n_distinct) AS BIGINT)
                AS dup_factor_ppm
       FROM s""",
)
def agg_dup_factor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K4+ duplication factor per source: total 3-gram occurrences over
    distinct 3-grams — the single number that ranks feeds by internal
    redundancy (1.0× = every shingle unique; a boilerplate-heavy feed
    reads 3–10×) and prioritizes where dedup spend pays. Complements
    text_ngram_novelty's per-document curve with the per-source rollup
    a pipeline owner actually budgets by. Occurrence counting keeps
    WITHIN-document repeats (unlike the novelty key's distinct set) —
    that is the point: template spam repeats inside documents too.
    Exact floor-ppm; one explode + one two-level aggregate."""
    from varda_spark.operators.dedup import shingles

    docs = read_table(spark, sf_dir, "documents")
    sh = shingles(docs.select("doc_id", "source", "text"), n=3).select(
        "source", "shingle"
    )
    s = sh.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_total"),
        F.countDistinct("shingle").cast("bigint").alias("n_distinct"),
    )
    return s.select(
        "source",
        "n_total",
        "n_distinct",
        F.expr(
            "CAST(FLOOR(1000000 * n_total / n_distinct) AS BIGINT)"
        ).alias("dup_factor_ppm"),
    )


@q(
    "agg_regression",
    """WITH b AS (
         SELECT p.p_brand AS brand,
                CAST(FLOOR(l.l_quantity) AS BIGINT) AS x,
                CAST(CAST(l.l_extendedprice AS DECIMAL(18,4)) * 10000 AS BIGINT)
                  AS y
         FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey),
       s AS (
         SELECT brand,
                CAST(COUNT(*) AS DOUBLE) AS n,
                CAST(SUM(x) AS DOUBLE) AS sx,
                CAST(SUM(CAST(y AS DECIMAL(38,0))) AS DOUBLE) AS sy,
                CAST(SUM(CAST(x AS DECIMAL(38,0)) * x) AS DOUBLE) AS sxx,
                CAST(SUM(CAST(x AS DECIMAL(38,0)) * y) AS DOUBLE) AS sxy
         FROM b GROUP BY brand)
       SELECT brand, CAST(n AS BIGINT) AS n_rows,
              ((n * sxy - sx * sy) / (n * sxx - sx * sx)) / 10000.0 AS slope,
              ((sy - ((n * sxy - sx * sy) / (n * sxx - sx * sx)) * sx) / n)
                / 10000.0 AS intercept
       FROM s WHERE n * sxx - sx * sx <> 0""",
)
def agg_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D+ per-group OLS fit (price ~ quantity per brand): slope and
    intercept from the closed-form normal equations — the regression
    primitive under elasticity estimates, trend removal, and per-segment
    calibration, completing the bivariate family (agg_corr measures
    association; this FITS the line). The agg_corr discipline: all four
    moments exact integer/decimal sums in one map-combined pass, then
    one shared-text float expression (the slope subexpression is
    repeated verbatim in the intercept so both engines evaluate the
    identical tree). Degenerate groups (zero x-variance) are excluded
    rather than emitting NaN."""
    li = read_table(spark, sf_dir, "lineitem")
    p = read_table(spark, sf_dir, "part")
    b = li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"]).select(
        F.col("p_brand").alias("brand"),
        F.expr("CAST(FLOOR(l_quantity) AS BIGINT)").alias("x"),
        F.expr(
            "CAST(CAST(l_extendedprice AS DECIMAL(18,4)) * 10000 AS BIGINT)"
        ).alias("y"),
    )
    s = b.groupBy("brand").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum("x").cast("double").alias("sx"),
        F.sum(F.expr("CAST(y AS DECIMAL(38,0))")).cast("double").alias("sy"),
        F.sum(F.expr("CAST(x AS DECIMAL(38,0)) * x")).cast("double").alias("sxx"),
        F.sum(F.expr("CAST(x AS DECIMAL(38,0)) * y")).cast("double").alias("sxy"),
    )
    return s.filter("n * sxx - sx * sx <> 0").select(
        "brand",
        F.col("n").cast("bigint").alias("n_rows"),
        F.expr(
            "((n * sxy - sx * sy) / (n * sxx - sx * sx)) / 10000.0"
        ).alias("slope"),
        F.expr(
            "((sy - ((n * sxy - sx * sy) / (n * sxx - sx * sx)) * sx) / n)"
            " / 10000.0"
        ).alias("intercept"),
    )


@q(
    "text_upsample_plan",
    """WITH c AS (
         SELECT lang,
                CAST(COUNT(*) AS BIGINT) AS n_docs,
                CAST(SUM(len(string_split(trim(text), ' '))) AS BIGINT) AS n_tokens
         FROM documents GROUP BY lang),
       m AS (SELECT CAST(MAX(n_tokens) AS BIGINT) AS max_tok FROM c)
       SELECT c.lang, c.n_docs, c.n_tokens,
              LEAST(CAST(FLOOR(m.max_tok / c.n_tokens) AS BIGINT), 4)
                AS repeat_factor,
              c.n_tokens * LEAST(CAST(FLOOR(m.max_tok / c.n_tokens) AS BIGINT), 4)
                AS effective_tokens
       FROM c CROSS JOIN m""",
)
def text_upsample_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K+ minority-language upsampling plan: integer repeat factor per
    language = floor(largest language's tokens / own tokens), capped at
    4× — the epoch-repetition table a multilingual mix actually ships
    (the cap encodes the empirical limit where repeating data stops
    helping; cf. sample_temperature which DOWNsamples the majority —
    the two compose into a full rebalancing policy). Exact integer
    division on token counts; 1-row max broadcast (whitelisted). The
    effective_tokens column is the post-plan budget the scheduler
    allocates against."""
    docs = read_table(spark, sf_dir, "documents")
    c = docs.groupBy("lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum(F.expr("size(split(trim(text), ' '))")).cast("bigint").alias("n_tokens"),
    )
    m = c.agg(F.max("n_tokens").cast("bigint").alias("max_tok"))
    return c.crossJoin(F.broadcast(m)).select(
        "lang",
        "n_docs",
        "n_tokens",
        F.expr(
            "LEAST(CAST(FLOOR(max_tok / n_tokens) AS BIGINT), 4)"
        ).alias("repeat_factor"),
        F.expr(
            "n_tokens * LEAST(CAST(FLOOR(max_tok / n_tokens) AS BIGINT), 4)"
        ).alias("effective_tokens"),
    )


# =====================================================================
# Round-4 additions: sweep-line interval depth, text-quality breadth,
# estimator-quality audits, skew-safe salted join, rolling correlation,
# embedding drift
# =====================================================================


@q(
    "interval_depth_hist",
    """WITH iv AS (
         SELECT CAST(s_suppkey % 5 AS VARCHAR) AS chromosome,
                s_suppkey * 97 + 1 AS begin,
                s_suppkey * 97 + 1 + 200 + (s_suppkey % 7) * 500
                  AS iv_end
         FROM supplier),
       ev AS (
         SELECT chromosome, begin AS pos, 1 AS delta FROM iv
         UNION ALL
         SELECT chromosome, iv_end AS pos, -1 AS delta FROM iv),
       agg AS (
         SELECT chromosome, pos, SUM(delta) AS d
         FROM ev GROUP BY chromosome, pos),
       sw AS (
         SELECT chromosome, pos,
                SUM(d) OVER (PARTITION BY chromosome ORDER BY pos) AS depth,
                LEAD(pos) OVER (PARTITION BY chromosome ORDER BY pos)
                  AS next_pos
         FROM agg)
       SELECT CAST(depth AS BIGINT) AS depth,
              CAST(SUM(next_pos - pos) AS BIGINT) AS bases,
              CAST(COUNT(*) AS BIGINT) AS n_segments
       FROM sw WHERE next_pos IS NOT NULL AND depth > 0
       GROUP BY depth""",
)
def interval_depth_hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C1+ coverage-depth histogram by SWEEP LINE — the samtools-depth /
    bedtools-genomecov shape: how many bases of the genome are covered by
    exactly d intervals. +1/−1 endpoint events, ties collapsed by a keyed
    pre-aggregation (so within-position order can't matter), a running
    sum per chromosome gives the depth of each gap between consecutive
    event positions, and a histogram weights each depth by gap length.
    All integers — no floats anywhere. Scale: the window partitions by
    chromosome (parallel across chromosomes; at 100 TB you range-bucket
    (chromosome, pos) and carry each bucket's boundary depth forward — a
    two-pass prefix-sum, same plan family as win_running). The naive
    alternative — join every base against every interval — is quadratic;
    the sweep is O(n log n) and never materializes per-base rows."""
    _, s = _points_intervals(spark, sf_dir)
    iv = s.select("chromosome", "begin", F.col("end").alias("iv_end"))
    ev = iv.select(
        "chromosome", F.col("begin").alias("pos"), F.lit(1).alias("delta")
    ).unionAll(
        iv.select(
            "chromosome", F.col("iv_end").alias("pos"), F.lit(-1).alias("delta")
        )
    )
    agg = ev.groupBy("chromosome", "pos").agg(F.sum("delta").alias("d"))
    w = Window.partitionBy("chromosome").orderBy("pos")
    sw = agg.select(
        "pos",
        F.sum("d").over(w).alias("depth"),
        F.lead("pos").over(w).alias("next_pos"),
    )
    return (
        sw.filter(F.col("next_pos").isNotNull() & (F.col("depth") > 0))
        .groupBy(F.col("depth").cast("bigint").alias("depth"))
        .agg(
            F.sum(F.col("next_pos") - F.col("pos")).cast("bigint").alias("bases"),
            F.count(F.lit(1)).cast("bigint").alias("n_segments"),
        )
    )


@q(
    "text_repetition",
    """WITH words AS (
         SELECT doc_id, string_split(text, ' ') AS w FROM documents),
       bg AS (
         SELECT doc_id,
                unnest(list_transform(range(1, len(w)),
                       i -> w[i] || ' ' || w[i + 1])) AS bigram
         FROM words WHERE len(w) >= 2),
       m AS (
         SELECT doc_id, bigram, COUNT(*) AS m
         FROM bg GROUP BY doc_id, bigram),
       s AS (
         SELECT doc_id, SUM(m) AS n2, COUNT(*) AS d2, MAX(m) AS m2
         FROM m GROUP BY doc_id)
       SELECT doc_id,
              CAST(n2 AS BIGINT) AS n2,
              CAST(d2 AS BIGINT) AS d2,
              CAST(FLOOR((n2 - d2) * 1000000.0 / n2) AS BIGINT) AS dup_ppm,
              CAST(FLOOR(m2 * 1000000.0 / n2) AS BIGINT) AS top_ppm
       FROM s""",
)
def text_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K4+ within-document repetition signals (the Gopher repetition
    filters, Rae et al. 2021 §A.1.2 — the axis text_gopher's band checks
    don't cover): duplicate-bigram mass (1 − distinct/total, in ppm) and
    top-bigram concentration (most frequent bigram's share, in ppm). A
    looping generator or boilerplate-stuffed page shows high dup_ppm /
    top_ppm at normal length, which is exactly what length-band filters
    miss. Explode + two keyed aggregations — deliberately NOT a per-doc
    higher-order-function fold (quadratic in doc length); the explode
    stream reduces map-side so the shuffle carries one row per distinct
    (doc, bigram). Docs under 2 words have no bigrams and drop out (same
    empty-shingle rule as dedup_minhash)."""
    from varda_spark.operators.dedup import shingles

    d = read_table(spark, sf_dir, "documents")
    bg = shingles(d.select("doc_id", "text"), n=2, out="bigram")
    m = bg.groupBy("doc_id", "bigram").agg(F.count(F.lit(1)).alias("m"))
    s = m.groupBy("doc_id").agg(
        F.sum("m").alias("n2"),
        F.count(F.lit(1)).alias("d2"),
        F.max("m").alias("m2"),
    )
    return s.select(
        "doc_id",
        F.col("n2").cast("bigint").alias("n2"),
        F.col("d2").cast("bigint").alias("d2"),
        F.expr("CAST(FLOOR((n2 - d2) * 1000000.0 / n2) AS BIGINT)").alias("dup_ppm"),
        F.expr("CAST(FLOOR(m2 * 1000000.0 / n2) AS BIGINT)").alias("top_ppm"),
    )


@q(
    "text_c4_filters",
    """WITH f AS (
         SELECT doc_id,
                (text LIKE '%.' OR text LIKE '%!' OR text LIKE '%?'
                 OR text LIKE '%"') AS ends_terminal,
                len(string_split(trim(text), ' ')) >= 5 AS min_words,
                (instr(text, '{') > 0 OR instr(text, '}') > 0
                 OR instr(lower(text), 'javascript') > 0) AS code_marker,
                (instr(lower(text), 'lorem ipsum') > 0
                 OR instr(lower(text), 'cookie') > 0
                 OR instr(lower(text), 'terms of use') > 0) AS boilerplate
         FROM documents)
       SELECT doc_id, ends_terminal, min_words, code_marker, boilerplate,
              (ends_terminal AND min_words AND NOT code_marker
               AND NOT boilerplate) AS c4_pass
       FROM f""",
)
def text_c4_filters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K4+ C4-style page filters (Raffel et al. 2020 §2.2, public): the
    classic web-corpus cleaning rules — terminal punctuation, minimum
    word count, curly-brace / 'javascript' code markers, boilerplate
    phrases ('lorem ipsum', cookie/terms notices). Complements
    text_gopher (statistical bands) and text_repetition (within-doc
    duplication) as the third standard filter family; together they are
    the C4+Gopher preprocessing stack. Pure string predicates — one
    map-side scan, whole-stage codegen, zero shuffles; at 100 TB this is
    bandwidth-bound, exactly as a filter should be."""
    d = read_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.expr(
            "text LIKE '%.' OR text LIKE '%!' OR text LIKE '%?'"
            " OR text LIKE '%\"'"
        ).alias("ends_terminal"),
        (F.size(F.split(F.trim(F.col("text")), " ")) >= 5).alias("min_words"),
        F.expr(
            "instr(text, '{') > 0 OR instr(text, '}') > 0"
            " OR instr(lower(text), 'javascript') > 0"
        ).alias("code_marker"),
        F.expr(
            "instr(lower(text), 'lorem ipsum') > 0"
            " OR instr(lower(text), 'cookie') > 0"
            " OR instr(lower(text), 'terms of use') > 0"
        ).alias("boilerplate"),
    ).withColumn(
        "c4_pass",
        F.col("ends_terminal")
        & F.col("min_words")
        & ~F.col("code_marker")
        & ~F.col("boilerplate"),
    )


@q(
    "dedup_minhash_recall",
    """WITH words AS (
         SELECT doc_id, string_split(text, ' ') AS w FROM documents),
       sh AS (
         SELECT doc_id,
                unnest(list_transform(range(1, greatest(len(w) - 1, 1)),
                       i -> w[i] || ' ' || w[i + 1] || ' ' || w[i + 2])) AS shingle
         FROM words),
       sigs AS (
         SELECT doc_id,
                MIN(md5('0|' || shingle)) AS sig_0, MIN(md5('1|' || shingle)) AS sig_1,
                MIN(md5('2|' || shingle)) AS sig_2, MIN(md5('3|' || shingle)) AS sig_3,
                MIN(md5('4|' || shingle)) AS sig_4, MIN(md5('5|' || shingle)) AS sig_5,
                MIN(md5('6|' || shingle)) AS sig_6, MIN(md5('7|' || shingle)) AS sig_7
         FROM sh GROUP BY doc_id),
       banded AS (
         SELECT doc_id, band FROM (
           SELECT doc_id,
                  ['0|' || sig_0 || '|' || sig_1, '1|' || sig_2 || '|' || sig_3,
                   '2|' || sig_4 || '|' || sig_5, '3|' || sig_6 || '|' || sig_7] AS bands
           FROM sigs), UNNEST(bands) AS u(band))
       , cand AS (
         SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
         FROM banded a JOIN banded b ON a.band = b.band AND a.doc_id < b.doc_id),
       est AS (
         SELECT c.doc_a, c.doc_b,
                (CASE WHEN sa.sig_0 = sb.sig_0 THEN 1 ELSE 0 END
                 + CASE WHEN sa.sig_1 = sb.sig_1 THEN 1 ELSE 0 END
                 + CASE WHEN sa.sig_2 = sb.sig_2 THEN 1 ELSE 0 END
                 + CASE WHEN sa.sig_3 = sb.sig_3 THEN 1 ELSE 0 END
                 + CASE WHEN sa.sig_4 = sb.sig_4 THEN 1 ELSE 0 END
                 + CASE WHEN sa.sig_5 = sb.sig_5 THEN 1 ELSE 0 END
                 + CASE WHEN sa.sig_6 = sb.sig_6 THEN 1 ELSE 0 END
                 + CASE WHEN sa.sig_7 = sb.sig_7 THEN 1 ELSE 0 END) AS est_matches
         FROM cand c JOIN sigs sa ON sa.doc_id = c.doc_a
                     JOIN sigs sb ON sb.doc_id = c.doc_b),
       dsh AS (SELECT DISTINCT doc_id, shingle FROM sh),
       sizes AS (SELECT doc_id, COUNT(*) AS nsh FROM dsh GROUP BY doc_id),
       co AS (
         SELECT x.doc_id AS doc_a, y.doc_id AS doc_b, COUNT(*) AS n_inter
         FROM dsh x JOIN dsh y
           ON x.shingle = y.shingle AND x.doc_id < y.doc_id
         GROUP BY x.doc_id, y.doc_id)
       SELECT e.doc_a, e.doc_b,
              CAST(e.est_matches AS BIGINT) AS est_matches,
              CAST(COALESCE(co.n_inter, 0) AS BIGINT) AS n_inter,
              CAST(za.nsh + zb.nsh - COALESCE(co.n_inter, 0) AS BIGINT) AS n_union,
              CAST(FLOOR(e.est_matches * 100.0 / 8) AS BIGINT) AS est_pct,
              CAST(FLOOR(COALESCE(co.n_inter, 0) * 100.0
                         / (za.nsh + zb.nsh - COALESCE(co.n_inter, 0)))
                   AS BIGINT) AS jac_pct
       FROM est e
       JOIN sizes za ON za.doc_id = e.doc_a
       JOIN sizes zb ON zb.doc_id = e.doc_b
       LEFT JOIN co ON co.doc_a = e.doc_a AND co.doc_b = e.doc_b""",
)
def dedup_minhash_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K2+ estimator-quality audit for MinHash LSH: for every banding
    candidate pair, the ESTIMATED Jaccard (matching signature slots / 8)
    next to the EXACT shingle-set Jaccard — the calibration table that
    tells you whether your banding threshold is doing what the MinHash
    math promises (E[est] = true Jaccard; 8 hashes → coarse but
    unbiased). This is the audit every production dedup pipeline runs
    before trusting a threshold at scale. Exact side uses the inverted
    shingle index (co-occurrence counts via shingle-key join, never
    all-pairs); candidates always share their band's argmin shingles so
    the LEFT join is belt-and-braces, COALESCE(0) in both engines.
    All-integer output (ppm-style pct floors)."""
    from varda_spark.operators.dedup import minhash_candidates, minhash_signatures, shingles

    d = read_table(spark, sf_dir, "documents")
    cand = minhash_candidates(d, num_hashes=8, bands=4, shingle_n=3)
    sigs = minhash_signatures(d, num_hashes=8, shingle_n=3)
    sa = sigs.select(
        F.col("doc_id").alias("doc_a"),
        *[F.col(f"sig_{i}").alias(f"a_sig_{i}") for i in range(8)],
    )
    sb = sigs.select(
        F.col("doc_id").alias("doc_b"),
        *[F.col(f"sig_{i}").alias(f"b_sig_{i}") for i in range(8)],
    )
    est_col = sum(
        F.when(F.col(f"a_sig_{i}") == F.col(f"b_sig_{i}"), 1).otherwise(0)
        for i in range(8)
    )
    est = cand.join(sa, "doc_a").join(sb, "doc_b").select(
        "doc_a", "doc_b", est_col.alias("est_matches")
    )
    dsh = shingles(d.select("doc_id", "text"), n=3).distinct()
    sizes = dsh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("nsh"))
    x, y = dsh.alias("x"), dsh.alias("y")
    co = (
        x.join(
            y,
            (F.col("x.shingle") == F.col("y.shingle"))
            & (F.col("x.doc_id") < F.col("y.doc_id")),
        )
        .groupBy(
            F.col("x.doc_id").alias("doc_a"), F.col("y.doc_id").alias("doc_b")
        )
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    za = sizes.select(F.col("doc_id").alias("doc_a"), F.col("nsh").alias("na"))
    zb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("nsh").alias("nb"))
    out = (
        est.join(za, "doc_a")
        .join(zb, "doc_b")
        .join(co, ["doc_a", "doc_b"], "left")
        .select(
            "doc_a",
            "doc_b",
            F.col("est_matches").cast("bigint").alias("est_matches"),
            F.coalesce(F.col("n_inter"), F.lit(0)).cast("bigint").alias("n_inter"),
            (
                F.col("na") + F.col("nb") - F.coalesce(F.col("n_inter"), F.lit(0))
            ).cast("bigint").alias("n_union"),
            F.expr("CAST(FLOOR(est_matches * 100.0 / 8) AS BIGINT)").alias("est_pct"),
        )
    )
    return out.withColumn(
        "jac_pct",
        F.expr("CAST(FLOOR(n_inter * 100.0 / n_union) AS BIGINT)"),
    )


@q(
    "join_salted",
    """SELECT l_returnflag AS flag,
              CAST(COUNT(*) AS BIGINT) AS n,
              CAST(SUM(CAST(FLOOR(l_quantity) AS BIGINT)) AS BIGINT) AS qty
       FROM lineitem
       JOIN (SELECT DISTINCT l_returnflag AS flag FROM lineitem) dim
         ON l_returnflag = dim.flag
       GROUP BY l_returnflag""",
)
def join_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C2+ SKEW-SAFE salted join, the explicit form: the fact side's join
    key has 3 distinct values (l_returnflag — pathological skew: a plain
    shuffle join puts ~200k rows in each of 3 tasks and idles the rest of
    the cluster). Treatment: fact rows get a deterministic content-hash
    salt in [0,16), the dim side is exploded ×16, and the join runs on
    (key, salt) — 48 evenly-sized groups instead of 3 hot ones. The salt
    is invisible to the result (oracle = plain join), which is the point:
    salting is a physical rewrite, not a semantic one. The merge-join
    hint forces the shuffle path so the demo is honest — with a 3-row dim
    Spark would otherwise broadcast (which also beats skew and is the
    right first answer when the dim fits; salting is for when BOTH sides
    are too big to broadcast — here it's demonstrated on a small dim so
    the oracle stays cheap). AQE's skewedJoin does this adaptively;
    the explicit form works on any Spark and under any config."""
    li = read_table(spark, sf_dir, "lineitem")
    dim = li.select(F.col("l_returnflag").alias("flag")).distinct()
    n_salts = 16
    salt_key = F.concat_ws(
        "-", F.col("l_orderkey").cast("string"), F.col("l_linenumber").cast("string")
    )
    fact = li.select(
        "l_returnflag",
        F.expr("CAST(FLOOR(l_quantity) AS BIGINT)").alias("qty"),
        (
            F.conv(F.substring(F.md5(salt_key.cast("binary")), 1, 4), 16, 10)
            .cast("int") % n_salts
        ).alias("salt"),
    )
    dim_salted = dim.withColumn(
        "salt", F.explode(F.array(*[F.lit(s) for s in range(n_salts)]))
    )
    joined = fact.join(
        dim_salted.hint("merge"),
        (F.col("l_returnflag") == F.col("flag")) & (fact.salt == dim_salted.salt),
    )
    return joined.groupBy(F.col("l_returnflag").alias("flag")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("qty").cast("bigint").alias("qty"),
    )


@q(
    "win_rolling_corr",
    """WITH b AS (
         SELECT l_returnflag AS flag, l_shipdate, l_orderkey, l_linenumber,
                SUM(CAST(FLOOR(l_quantity) AS BIGINT)) AS x,
                SUM(CAST(FLOOR(CAST(l_extendedprice AS DECIMAL(18,4)) * 100)
                         AS BIGINT)) AS y
         FROM lineitem
         GROUP BY l_returnflag, l_shipdate, l_orderkey, l_linenumber),
       w AS (
         SELECT flag, l_orderkey, l_linenumber,
                COUNT(*) OVER win AS n,
                SUM(x) OVER win AS sx, SUM(y) OVER win AS sy,
                SUM(x * x) OVER win AS sxx, SUM(y * y) OVER win AS syy,
                SUM(x * y) OVER win AS sxy
         FROM b
         WINDOW win AS (PARTITION BY flag
                        ORDER BY l_shipdate, l_orderkey, l_linenumber
                        ROWS BETWEEN 19 PRECEDING AND CURRENT ROW))
       SELECT flag, l_orderkey, l_linenumber, CAST(n AS BIGINT) AS n,
              CASE WHEN n >= 2 AND n * sxx - sx * sx > 0
                        AND n * syy - sy * sy > 0
                   THEN (CAST(n AS DOUBLE) * sxy
                         - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                        / (sqrt(CAST(n AS DOUBLE) * sxx
                                - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                           * sqrt(CAST(n AS DOUBLE) * syy
                                  - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))
                   END AS roll_corr
       FROM w""",
)
def win_rolling_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E3+ rolling 20-row Pearson correlation between quantity and price
    per flag in ship order — the moving-relationship detector (beta
    drift, sensor cross-talk) that the global agg_corr can't see. The
    keyed pre-aggregation is load-bearing, not cosmetic: the shipped
    lineitem has BAG semantics ((l_orderkey, l_linenumber) repeats), so
    a ROWS frame over raw rows is tie-order-nondeterministic — collapsing
    to one point per line id first makes every frame content-determined.
    Six exact-integer window sums over ONE shared 20-row frame (price in
    CENTS, not 1e-4 units: y² summed over 20 rows must stay under 2^63,
    and cents give 10^14 × 20 ≈ 2·10^15 with every double conversion
    below 2^53 → the closed form is bit-deterministic, sqrt being the
    only IEEE-exact transcendental). Degenerate windows (n<2 or zero
    variance) yield NULL via integer-exact guards in both engines."""
    li = read_table(spark, sf_dir, "lineitem")
    b = (
        li.groupBy(
            F.col("l_returnflag").alias("flag"),
            "l_shipdate",
            "l_orderkey",
            "l_linenumber",
        ).agg(
            F.sum(F.expr("CAST(FLOOR(l_quantity) AS BIGINT)")).alias("x"),
            F.sum(
                F.expr(
                    "CAST(FLOOR(CAST(l_extendedprice AS DECIMAL(18,4)) * 100)"
                    " AS BIGINT)"
                )
            ).alias("y"),
        )
    )
    win = (
        Window.partitionBy("flag")
        .orderBy("l_shipdate", "l_orderkey", "l_linenumber")
        .rowsBetween(-19, 0)
    )
    w = b.select(
        "flag",
        "l_orderkey",
        "l_linenumber",
        F.count(F.lit(1)).over(win).alias("n"),
        F.sum("x").over(win).alias("sx"),
        F.sum("y").over(win).alias("sy"),
        F.sum(F.col("x") * F.col("x")).over(win).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).over(win).alias("syy"),
        F.sum(F.col("x") * F.col("y")).over(win).alias("sxy"),
    )
    return w.select(
        "flag",
        "l_orderkey",
        "l_linenumber",
        F.col("n").cast("bigint").alias("n"),
        F.expr(
            "CASE WHEN n >= 2 AND n * sxx - sx * sx > 0"
            " AND n * syy - sy * sy > 0"
            " THEN (CAST(n AS DOUBLE) * sxy"
            " - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))"
            " / (sqrt(CAST(n AS DOUBLE) * sxx"
            " - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))"
            " * sqrt(CAST(n AS DOUBLE) * syy"
            " - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))"
            " END"
        ).alias("roll_corr"),
    )


@q(
    "emb_centroid_shift",
    """WITH q AS (
         SELECT vec_id, label, vec_id % 2 AS par,
                list_transform(embedding,
                    x -> CAST(floor(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS e
         FROM embeddings),
       d AS (
         SELECT label, par, i.range AS dim, SUM(e[i.range]) AS s
         FROM q CROSS JOIN range(1, 4097) i
         WHERE i.range <= len(e)
         GROUP BY label, par, i.range),
       n AS (
         SELECT label, par, COUNT(*) AS cnt FROM q GROUP BY label, par),
       t AS (
         SELECT a.label,
                SUM(CAST(a.s * nb.cnt - b.s * na.cnt AS DECIMAL(38,0))
                    * CAST(a.s * nb.cnt - b.s * na.cnt AS DECIMAL(38,0)))
                  AS tot,
                MIN(na.cnt) AS na, MIN(nb.cnt) AS nb
         FROM d a
         JOIN d b ON a.label = b.label AND a.dim = b.dim
                  AND a.par = 0 AND b.par = 1
         JOIN n na ON na.label = a.label AND na.par = 0
         JOIN n nb ON nb.label = a.label AND nb.par = 1
         GROUP BY a.label)
       SELECT label,
              CAST(na AS BIGINT) AS n_even, CAST(nb AS BIGINT) AS n_odd,
              sqrt(CAST(tot AS DOUBLE)) / na / nb / 1000.0 AS shift
       FROM t""",
)
def emb_centroid_shift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K3+ embedding drift detector: per label, the L2 distance between
    the centroid of even vec_ids and the centroid of odd vec_ids — the
    split-half consistency check (an encoder re-run, a corpus refresh, a
    quantization change all show up as centroid shift long before top-k
    overlap degrades). Exact integer interior: per-(label, dim, parity)
    sums, then Σ_d (s_even·n_odd − s_odd·n_even)² in DECIMAL(38,0) —
    the cross-multiplied form avoids division until the single final
    float expression (sqrt/divide, both IEEE-deterministic; the
    DECIMAL→DOUBLE conversion is correctly rounded in both engines).
    Spark side posexplodes (dimension-agnostic); the oracle cross-joins
    a guarded range(1, 4097) because DuckDB lacks lateral range(col) —
    documented 4096-dim oracle ceiling, engine side has none. Scale:
    everything is map-side partial aggregation on (label, dim, parity);
    output is one row per label."""
    from varda_spark.operators.similarity import quantized

    e = read_table(spark, sf_dir, "embeddings")
    q_ = e.select(
        "vec_id",
        "label",
        (F.col("vec_id") % 2).alias("par"),
        quantized("embedding", scale=1000).alias("e"),
    )
    d = (
        q_.select("label", "par", F.posexplode("e").alias("dim0", "v"))
        .groupBy("label", "par", (F.col("dim0") + 1).alias("dim"))
        .agg(F.sum("v").alias("s"))
    )
    n = q_.groupBy("label", "par").agg(F.count(F.lit(1)).alias("cnt"))
    a = d.filter(F.col("par") == 0).select("label", "dim", F.col("s").alias("sa"))
    b = d.filter(F.col("par") == 1).select("label", "dim", F.col("s").alias("sb"))
    na = n.filter(F.col("par") == 0).select("label", F.col("cnt").alias("na"))
    nb = n.filter(F.col("par") == 1).select("label", F.col("cnt").alias("nb"))
    t = (
        a.join(b, ["label", "dim"])
        .join(F.broadcast(na), "label")
        .join(F.broadcast(nb), "label")
        .groupBy("label")
        .agg(
            F.sum(
                F.expr(
                    "CAST(sa * nb - sb * na AS DECIMAL(38,0))"
                    " * CAST(sa * nb - sb * na AS DECIMAL(38,0))"
                )
            ).alias("tot"),
            F.min("na").alias("na"),
            F.min("nb").alias("nb"),
        )
    )
    return t.select(
        "label",
        F.col("na").cast("bigint").alias("n_even"),
        F.col("nb").cast("bigint").alias("n_odd"),
        F.expr("sqrt(CAST(tot AS DOUBLE)) / na / nb / 1000.0").alias("shift"),
    )


def _lsh_recall_oracle() -> str:
    """Oracle for sim_lsh_recall: exact within-label top-3 (sim_topk's
    ×10000 quantization) LEFT-joined against raw LSH bucket-collision
    candidates (sim_lsh's ×1000 quantization + the same baked hyperplane
    matrix), recall aggregated per label in exact ppm."""
    from varda_spark.operators.similarity import lsh_hyperplane_coefs

    coefs = lsh_hyperplane_coefs(tables=4, bits=6, dim=64)
    rows = ", ".join(f"({t}, {coefs[t]})" for t in range(24))
    return f"""WITH hp(t, co) AS (SELECT * FROM (VALUES {rows}) v(t, co)),
       q AS (
         SELECT vec_id, label,
                list_transform(embedding,
                    x -> CAST(floor(CAST(x AS DOUBLE) * 10000) AS BIGINT)) AS e,
                list_transform(embedding,
                    x -> CAST(floor(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS el
         FROM embeddings),
       pairs AS (
         SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
                (SELECT SUM(a.e[i.range] * b.e[i.range])
                 FROM range(1, 65) i) AS dot_q
         FROM q a JOIN q b ON a.label = b.label AND a.vec_id <> b.vec_id
         WHERE a.vec_id % 4 = 0),
       topk AS (
         SELECT query_id, neighbor_id FROM (
           SELECT query_id, neighbor_id,
                  ROW_NUMBER() OVER (PARTITION BY query_id
                       ORDER BY dot_q DESC, neighbor_id) AS rank
           FROM pairs) WHERE rank <= 3),
       proj AS (
         SELECT q.vec_id, hp.t,
                (SELECT SUM(q.el[r.range] * hp.co[r.range])
                 FROM range(1, 65) r) AS s
         FROM q CROSS JOIN hp),
       buckets AS (
         SELECT vec_id,
                CAST(t // 6 AS VARCHAR) || '|' ||
                string_agg(CASE WHEN s >= 0 THEN '1' ELSE '0' END,
                           '' ORDER BY t) AS bucket
         FROM proj GROUP BY vec_id, t // 6),
       cand AS (
         SELECT DISTINCT a.vec_id AS da, b.vec_id AS db
         FROM buckets a JOIN buckets b
           ON a.bucket = b.bucket AND a.vec_id <> b.vec_id),
       hits AS (
         SELECT t.query_id,
                CASE WHEN c.da IS NULL THEN 0 ELSE 1 END AS hit
         FROM topk t LEFT JOIN cand c
           ON c.da = t.query_id AND c.db = t.neighbor_id)
       SELECT ql.label,
              CAST(COUNT(*) AS BIGINT) AS n_edges,
              CAST(SUM(hit) AS BIGINT) AS n_hit,
              CAST(FLOOR(SUM(hit) * 1000000.0 / COUNT(*)) AS BIGINT)
                AS recall_ppm
       FROM hits JOIN q ql ON ql.vec_id = hits.query_id
       GROUP BY ql.label"""


@q("sim_lsh_recall", _lsh_recall_oracle())
def sim_lsh_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K3+ ANN recall audit — the number that decides whether an LSH
    index is shippable: per label, the fraction of exact top-3 neighbor
    edges (ground truth = the label-blocked integer-quantized ranking of
    sim_topk) that appear among sim_lsh's raw bucket-collision
    candidates. 4 tables × 6 bits at these densities recalls imperfectly
    BY DESIGN (collision prob (1−θ/π)^6 per table) — the audit makes the
    quality/cost trade measurable instead of hoped-for, exactly like
    dedup_minhash_recall does for the MinHash estimator. Everything
    integer: ground truth and candidates are both deterministic, recall
    reported in exact floor-ppm. Scale: the exact side is label-blocked
    (never corpus²), and the audit runs on a deterministic 1-in-4 query
    sample (vec_id % 4 — how a recall audit is actually run at 100 TB:
    ground truth for a sample of queries, candidates for the full
    corpus)."""
    from varda_spark.operators.similarity import lsh_candidate_pairs, quantized_topk_fast

    e = read_table(spark, sf_dir, "embeddings")
    topk = (
        quantized_topk_fast(e, k=3)
        .filter(F.col("query_id") % 4 == 0)  # sampled query set (see docstring)
        .select("query_id", "neighbor_id")
    )
    cand = lsh_candidate_pairs(e)
    sym = cand.unionAll(
        cand.select(F.col("doc_b").alias("doc_a"), F.col("doc_a").alias("doc_b"))
    )
    hits = topk.join(
        sym,
        (F.col("query_id") == F.col("doc_a"))
        & (F.col("neighbor_id") == F.col("doc_b")),
        "left",
    ).select(
        "query_id",
        F.when(F.col("doc_a").isNull(), 0).otherwise(1).alias("hit"),
    )
    labels = e.select("vec_id", "label")
    return (
        hits.join(labels, hits.query_id == labels.vec_id)
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_edges"),
            F.sum("hit").cast("bigint").alias("n_hit"),
            F.expr(
                "CAST(FLOOR(SUM(hit) * 1000000.0 / COUNT(*)) AS BIGINT)"
            ).alias("recall_ppm"),
        )
    )


@q(
    "agg_pow2_hist",
    """WITH c AS (
         SELECT CAST(FLOOR(CAST(l_extendedprice AS DECIMAL(18,4)) * 100)
                     AS BIGINT) AS cents
         FROM lineitem)
       SELECT CAST(length(bin(cents)) AS BIGINT) AS pow2_bucket,
              CAST(COUNT(*) AS BIGINT) AS n,
              CAST(SUM(cents) AS BIGINT) AS sum_cents,
              CAST(MIN(cents) AS BIGINT) AS min_cents,
              CAST(MAX(cents) AS BIGINT) AS max_cents
       FROM c GROUP BY length(bin(cents))""",
)
def agg_pow2_hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D+ power-of-two (log2) magnitude histogram — the long-tail
    profiler for any positive measure (latencies, file sizes, revenue):
    bucket k holds values in [2^(k-1), 2^k). The log2 is EXACT in both
    engines via the bin-length trick — length(bin(x)) = floor(log2 x)+1
    for x ≥ 1, pure integer string-length math, no floating log anywhere
    (engine ln/log differ in the last ulp and would split boundary
    values). One map-side bucket expression + one grouped agg; output is
    ≤ 64 rows regardless of input size."""
    li = read_table(spark, sf_dir, "lineitem")
    c = li.select(
        F.expr(
            "CAST(FLOOR(CAST(l_extendedprice AS DECIMAL(18,4)) * 100) AS BIGINT)"
        ).alias("cents")
    )
    return c.groupBy(
        F.length(F.bin("cents")).cast("bigint").alias("pow2_bucket")
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("cents").cast("bigint").alias("sum_cents"),
        F.min("cents").cast("bigint").alias("min_cents"),
        F.max("cents").cast("bigint").alias("max_cents"),
    )


@q(
    "join_bucketed",
    """SELECT c_mktsegment AS segment,
              CAST(COUNT(*) AS BIGINT) AS n_orders,
              CAST(SUM(CAST(FLOOR(o_totalprice) AS BIGINT)) AS BIGINT) AS tot
       FROM orders JOIN customer ON o_custkey = c_custkey
       GROUP BY c_mktsegment""",
)
def join_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C2+ ZERO-SHUFFLE co-located join via bucketing — the physical
    design that, at 100 TB, replaces a full-network shuffle of both fact
    tables with a local merge per bucket: both sides are written
    bucketBy(16) on the join key (bucket metadata lives in the session
    catalog, which is why this goes through saveAsTable), and Catalyst
    sees the hash-distribution requirement already satisfied — the
    SortMergeJoin consumes both scans with NO Exchange
    (tests/test_skew_bucket.py proves the plan property on the library
    helper; test_plans covers this key). The write cost is paid once and
    amortized over every subsequent co-located join/agg on the key —
    the standard warehouse layout decision for a repeatedly-joined pair.
    Oracle = the same join unbucketed: bucketing is physical, not
    semantic. Tables land under the repo's spark-warehouse dir."""
    from varda_spark.sources.sinks import write_bucketed

    o = read_table(spark, sf_dir, "orders").select(
        "o_custkey", F.expr("CAST(FLOOR(o_totalprice) AS BIGINT)").alias("tp")
    )
    c = read_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    # Scratch tables are session-scoped: a fixed name races when two
    # sessions run this key concurrently (one overwrites the files the
    # other's cached file listing still points at → FAILED_READ_FILE).
    # The suffix changes the PHYSICAL name only — the data, bucket
    # layout, and result are byte-identical run to run.
    tag = "".join(ch if ch.isalnum() else "_" for ch in spark.sparkContext.applicationId)
    t_o, t_c = f"bkt_orders_{tag}", f"bkt_customer_{tag}"
    _sweep_stale_scratch()
    wh = "/root/repo/spark-warehouse"
    write_bucketed(o, t_o, "o_custkey", n_buckets=16, path=f"{wh}/{t_o}")
    write_bucketed(c, t_c, "c_custkey", n_buckets=16, path=f"{wh}/{t_c}")
    j = spark.table(t_o).join(
        # merge hint: at test sf the dim fits a broadcast, which would
        # bypass the bucket layout entirely — force the SMJ this key
        # demonstrates (at 100 TB neither side broadcasts and SMJ is
        # what Catalyst picks unaided; the buckets then kill both
        # exchanges, which test_plans asserts)
        spark.table(t_c).hint("merge"),
        F.col("o_custkey") == F.col("c_custkey"),
    )
    return j.groupBy(F.col("c_mktsegment").alias("segment")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_orders"),
        F.sum("tp").cast("bigint").alias("tot"),
    )


@q(
    "text_hashing_tf",
    """WITH tok AS (
         SELECT doc_id, unnest(string_split(trim(text), ' ')) AS tok
         FROM documents),
       b AS (
         SELECT doc_id,
                CAST('0x' || substr(md5(tok), 1, 4) AS INT) % 16 AS bucket
         FROM tok)
       SELECT doc_id, CAST(bucket AS BIGINT) AS bucket,
              CAST(COUNT(*) AS BIGINT) AS tf
       FROM b GROUP BY doc_id, bucket""",
)
def text_hashing_tf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K4+ hashing-trick term-frequency vectorizer (the HashingTF idea,
    Weinberger et al. 2009, without MLlib): token → md5 bucket in
    [0, 16), per-doc bucket counts in SPARSE form — which is the scale
    form: no vocabulary pass, no dictionary to broadcast or update, new
    tokens land deterministically, and downstream dot products join on
    (bucket) instead of materializing dense width-V rows. The md5 bucket
    is the repo's standard cross-engine coin (sample_hash), so the
    featurization is reproducible anywhere. Explode + one keyed count —
    partial aggregation collapses map-side."""
    d = read_table(spark, sf_dir, "documents")
    tok = d.select(
        "doc_id", F.explode(F.split(F.trim(F.col("text")), " ")).alias("tok")
    )
    bucket = (
        F.conv(F.substring(F.md5(F.col("tok").cast("binary")), 1, 4), 16, 10)
        .cast("int") % 16
    )
    return (
        tok.select("doc_id", bucket.cast("bigint").alias("bucket"))
        .groupBy("doc_id", "bucket")
        .agg(F.count(F.lit(1)).cast("bigint").alias("tf"))
    )


@q(
    "agg_countmin",
    """WITH tok AS (
         SELECT unnest(string_split(trim(text), ' ')) AS tok FROM documents),
       cells AS (
         SELECT r.range AS row,
                CAST('0x' || substr(md5(CAST(r.range AS VARCHAR) || '|' || tok),
                                    1, 4) AS INT) % 64 AS col
         FROM tok CROSS JOIN range(0, 4) r)
       SELECT CAST(row AS BIGINT) AS row, CAST(col AS BIGINT) AS col,
              CAST(COUNT(*) AS BIGINT) AS cnt
       FROM cells GROUP BY row, col""",
)
def agg_countmin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D+ Count-Min sketch (Cormode & Muthukrishnan 2005) over the token
    stream: 4 rows × 64 columns of md5-derived counters; a point query
    min(row_r[h_r(x)]) over-estimates a token's frequency by at most
    εN with the classic guarantees. The sketch TABLE is the operator —
    256 bounded cells that merge by addition across partitions, shards,
    days (the reason CM sketches are the standard distributed
    heavy-hitter substrate: the merge is a groupBy-sum, and at 100 TB
    the token stream never leaves the mappers un-aggregated; the
    shuffle carries ≤ 256 rows per partition). Deterministic md5 hash
    rows — the same sketch everywhere, so the DuckDB twin is EXACT
    despite this being an approximation structure (same trick as
    graph_triangles_approx: derandomized estimator ⇒ exact parity).
    Companion to agg_kmv (distinct-count sketch) on the frequency side."""
    from varda_spark.operators.text import countmin_cells

    d = read_table(spark, sf_dir, "documents")
    cells = countmin_cells(d)
    return cells.groupBy(
        F.col("row").cast("bigint").alias("row"),
        F.col("col").cast("bigint").alias("col"),
    ).agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))


@q(
    "graph_labelprop",
    f"""WITH {_COORDER_EDGES_SQL},
       nodes AS (
         SELECT DISTINCT v FROM (
           SELECT pa AS v FROM e UNION ALL SELECT pb AS v FROM e)),
       adj AS (
         SELECT pa AS v, pb AS n FROM e
         UNION ALL SELECT pb AS v, pa AS n FROM e),
       l0 AS (SELECT v, v AS lab FROM nodes),
       r1 AS (
         SELECT v, lab FROM (
           SELECT a.v, l.lab, COUNT(*) AS c,
                  ROW_NUMBER() OVER (PARTITION BY a.v
                       ORDER BY COUNT(*) DESC, l.lab) AS rn
           FROM adj a JOIN l0 l ON l.v = a.n
           GROUP BY a.v, l.lab) WHERE rn = 1),
       r2 AS (
         SELECT v, lab FROM (
           SELECT a.v, l.lab, COUNT(*) AS c,
                  ROW_NUMBER() OVER (PARTITION BY a.v
                       ORDER BY COUNT(*) DESC, l.lab) AS rn
           FROM adj a JOIN r1 l ON l.v = a.n
           GROUP BY a.v, l.lab) WHERE rn = 1)
       SELECT CAST(lab AS BIGINT) AS community,
              CAST(COUNT(*) AS BIGINT) AS n_members
       FROM r2 GROUP BY lab""",
)
def graph_labelprop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Graph community detection by SYNCHRONOUS label propagation
    (Raghavan et al. 2007), 2 fixed rounds, deterministic: each node
    adopts the most frequent label among its neighbors, ties broken by
    smallest label (count DESC, label ASC — pinned identically in both
    engines; async LPA is run-order-dependent and could never have an
    oracle). Complements the connectivity family: dedup_components finds
    what IS connected, label propagation finds DENSELY connected regions
    inside one component. Fixed-round unrolling is the oracle trick
    (same as sim_kmeans): semantics = exactly N sync rounds, not
    convergence. Scale: each round is one join on the adjacency list +
    one (v, label) count + one argmax window per node — all shuffle-
    bounded by |E|; Spark side localCheckpoints between rounds to keep
    lineage flat (the dedup_components discipline)."""
    # checkpoint the EDGE list, not the doubled adjacency: caching 2|E|
    # rows OOMs an 8 g heap at sf5 (~60M edges) — the graph_conductance
    # lesson; adj is a cheap projection over e's cached blocks.
    e = _coorder_edges(spark, sf_dir).localCheckpoint()
    adj = e.select(F.col("pa").alias("v"), F.col("pb").alias("n")).unionAll(
        e.select(F.col("pb").alias("v"), F.col("pa").alias("n"))
    )
    labels = adj.select("v").distinct().select("v", F.col("v").alias("lab"))
    for _ in range(2):
        nb = adj.join(
            labels.select(F.col("v").alias("n"), "lab"), "n"
        ).groupBy("v", "lab").agg(F.count(F.lit(1)).alias("c"))
        w = Window.partitionBy("v").orderBy(F.desc("c"), F.asc("lab"))
        labels = (
            nb.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("v", "lab")
            .localCheckpoint()
        )
    return labels.groupBy(F.col("lab").cast("bigint").alias("community")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_members")
    )


@q(
    "agg_topn_share",
    """WITH rev AS (
         SELECT c.c_mktsegment AS segment, o.o_custkey,
                CAST(SUM(CAST(FLOOR(o_totalprice) AS BIGINT)) AS BIGINT) AS r
         FROM orders o JOIN customer c ON o_custkey = c_custkey
         GROUP BY c.c_mktsegment, o.o_custkey),
       rk AS (
         SELECT segment, r,
                ROW_NUMBER() OVER (PARTITION BY segment
                     ORDER BY r DESC, o_custkey) AS rn
         FROM rev)
       SELECT segment,
              CAST(COUNT(*) AS BIGINT) AS n_customers,
              CAST(SUM(r) AS BIGINT) AS total_rev,
              CAST(SUM(CASE WHEN rn <= 10 THEN r ELSE 0 END) AS BIGINT)
                AS top10_rev,
              CAST(FLOOR(SUM(CASE WHEN rn <= 10 THEN r ELSE 0 END)
                         * 1000000.0 / SUM(r)) AS BIGINT) AS top10_ppm
       FROM rk GROUP BY segment""",
)
def agg_topn_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D+ top-N concentration share per segment: what fraction of
    revenue the 10 largest customers carry — the account-concentration
    number next to agg_hhi's index form and agg_abc_class's inventory
    form (three standard views of the same risk question). Deterministic
    (r DESC, custkey) rank tie-break; share in exact floor-ppm. Scale:
    the only fact-sized shuffle is the per-customer rollup; the ranking
    window runs on the customer dimension, partitioned by segment."""
    o = read_table(spark, sf_dir, "orders")
    c = read_table(spark, sf_dir, "customer")
    rev = (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy(F.col("c_mktsegment").alias("segment"), "o_custkey")
        .agg(
            F.sum(F.expr("CAST(FLOOR(o_totalprice) AS BIGINT)"))
            .cast("bigint")
            .alias("r")
        )
    )
    w = Window.partitionBy("segment").orderBy(F.desc("r"), F.asc("o_custkey"))
    rk = rev.withColumn("rn", F.row_number().over(w))
    return rk.groupBy("segment").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_customers"),
        F.sum("r").cast("bigint").alias("total_rev"),
        F.sum(F.when(F.col("rn") <= 10, F.col("r")).otherwise(0))
        .cast("bigint")
        .alias("top10_rev"),
        F.expr(
            "CAST(FLOOR(SUM(CASE WHEN rn <= 10 THEN r ELSE 0 END)"
            " * 1000000.0 / SUM(r)) AS BIGINT)"
        ).alias("top10_ppm"),
    )


@q(
    "agg_countmin_query",
    """WITH tok AS (
         SELECT unnest(string_split(trim(text), ' ')) AS tok FROM documents),
       sketch AS (
         SELECT row, col, COUNT(*) AS cnt FROM (
           SELECT r.range AS row,
                  CAST('0x' || substr(md5(CAST(r.range AS VARCHAR) || '|' || tok),
                                      1, 4) AS INT) % 64 AS col
           FROM tok CROSS JOIN range(0, 4) r)
         GROUP BY row, col),
       top20 AS (
         SELECT tok, COUNT(*) AS true_cnt FROM tok GROUP BY tok
         ORDER BY COUNT(*) DESC, tok LIMIT 20),
       probes AS (
         SELECT t.tok, t.true_cnt, r.range AS row,
                CAST('0x' || substr(md5(CAST(r.range AS VARCHAR) || '|' || t.tok),
                                    1, 4) AS INT) % 64 AS col
         FROM top20 t CROSS JOIN range(0, 4) r)
       SELECT p.tok, CAST(MIN(p.true_cnt) AS BIGINT) AS true_cnt,
              CAST(MIN(s.cnt) AS BIGINT) AS est_cnt
       FROM probes p JOIN sketch s ON s.row = p.row AND s.col = p.col
       GROUP BY p.tok""",
)
def agg_countmin_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D+ Count-Min POINT QUERY — the read side of agg_countmin's sketch:
    estimate(x) = min over hash rows of the addressed counters, compared
    against the exact count for the 20 most frequent tokens (rank pinned
    count DESC, token ASC). The CM guarantee est ≥ true, est ≤ true + εN
    is visible row by row (pytest asserts the lower bound exactly). The
    sketch is 256 cells — the probe join is a broadcast against a
    dimension that never grows with the corpus; at 100 TB the sketch is
    built incrementally (see the streaming twin test) and queries never
    touch the raw stream. Build + query + audit: the full sketch
    lifecycle as catalog keys."""
    from varda_spark.operators.text import countmin_cells

    d = read_table(spark, sf_dir, "documents")
    sketch = countmin_cells(d).groupBy("row", "col").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    tok = d.select(F.explode(F.split(F.trim(F.col("text")), " ")).alias("tok"))
    top20 = (
        tok.groupBy("tok")
        .agg(F.count(F.lit(1)).alias("true_cnt"))
        .orderBy(F.desc("true_cnt"), F.asc("tok"))
        .limit(20)
    )
    probes = top20.select(
        "tok",
        "true_cnt",
        F.explode(F.array(*[F.lit(r) for r in range(4)])).alias("row"),
    ).select(
        "tok",
        "true_cnt",
        "row",
        (
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(F.col("row").cast("string"), F.lit("|"), F.col("tok")).cast("binary")
                    ),
                    1,
                    4,
                ),
                16,
                10,
            ).cast("int")
            % 64
        ).alias("col"),
    )
    return (
        probes.join(F.broadcast(sketch), ["row", "col"])
        .groupBy("tok")
        .agg(
            F.min("true_cnt").cast("bigint").alias("true_cnt"),
            F.min("cnt").cast("bigint").alias("est_cnt"),
        )
    )


def _kcore_round_sql(src: str, dst: str, k: int) -> str:
    """One unrolled peeling round: degrees on {src}, drop nodes under k,
    keep only edges with both endpoints surviving as {dst}."""
    return f"""
       deg_{dst} AS MATERIALIZED (
         SELECT v, COUNT(*) AS d FROM (
           SELECT pa AS v FROM {src} UNION ALL SELECT pb AS v FROM {src})
         GROUP BY v),
       keep_{dst} AS MATERIALIZED (SELECT v FROM deg_{dst} WHERE d >= {k}),
       {dst} AS MATERIALIZED (
         SELECT e.pa, e.pb FROM {src} e
         JOIN keep_{dst} ka ON ka.v = e.pa
         JOIN keep_{dst} kb ON kb.v = e.pb)"""


@q(
    "graph_kcore",
    f"""WITH {_COORDER_EDGES_SQL},
       e0 AS MATERIALIZED (SELECT pa, pb FROM e),
       {_kcore_round_sql('e0', 'e1', 10)},
       {_kcore_round_sql('e1', 'e2', 10)},
       {_kcore_round_sql('e2', 'e3', 10)},
       stats AS (
         SELECT 0 AS round,
                (SELECT COUNT(*) FROM (SELECT DISTINCT v FROM (
                   SELECT pa AS v FROM e0 UNION ALL SELECT pb AS v FROM e0)))
                  AS n_nodes,
                (SELECT COUNT(*) FROM e0) AS n_edges
         UNION ALL SELECT 1,
                (SELECT COUNT(*) FROM (SELECT DISTINCT v FROM (
                   SELECT pa AS v FROM e1 UNION ALL SELECT pb AS v FROM e1))),
                (SELECT COUNT(*) FROM e1)
         UNION ALL SELECT 2,
                (SELECT COUNT(*) FROM (SELECT DISTINCT v FROM (
                   SELECT pa AS v FROM e2 UNION ALL SELECT pb AS v FROM e2))),
                (SELECT COUNT(*) FROM e2)
         UNION ALL SELECT 3,
                (SELECT COUNT(*) FROM (SELECT DISTINCT v FROM (
                   SELECT pa AS v FROM e3 UNION ALL SELECT pb AS v FROM e3))),
                (SELECT COUNT(*) FROM e3))
       SELECT CAST(round AS BIGINT) AS round,
              CAST(n_nodes AS BIGINT) AS n_nodes,
              CAST(n_edges AS BIGINT) AS n_edges
       FROM stats""",
)
def graph_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Graph k-core peeling (k=10, 3 fixed synchronous rounds): each
    round drops every node with degree < k in the CURRENT induced
    subgraph and keeps only edges between survivors — the standard
    densest-region / influence-backbone extraction (Seidman 1983), and
    the degeneracy-ordering building block. Fixed-round semantics (not
    to-convergence) keeps the oracle an unrolled CTE chain, the
    sim_kmeans/graph_labelprop trick; on this graph the survivor counts
    per round ARE the result (a monotone shrinking sequence — pytest
    asserts monotonicity and the degree invariant after round 3). Scale:
    each round is one degree count + two semi-join-shaped filters,
    shuffle bounded by |E|; Spark localCheckpoints the shrinking edge
    set between rounds so lineage stays flat."""
    e = _coorder_edges(spark, sf_dir).localCheckpoint()
    k = 10
    stats = []
    cur = e
    for rnd in range(4):
        nodes = (
            cur.select(F.col("pa").alias("v"))
            .unionAll(cur.select(F.col("pb").alias("v")))
        )
        n_nodes = nodes.distinct().agg(F.count(F.lit(1)).alias("n_nodes"))
        n_edges = cur.agg(F.count(F.lit(1)).alias("n_edges"))
        stats.append(
            n_nodes.crossJoin(F.broadcast(n_edges)).select(
                F.lit(rnd).cast("bigint").alias("round"),
                F.col("n_nodes").cast("bigint").alias("n_nodes"),
                F.col("n_edges").cast("bigint").alias("n_edges"),
            )
        )
        if rnd == 3:
            break
        deg = nodes.groupBy("v").agg(F.count(F.lit(1)).alias("d"))
        keep = deg.filter(F.col("d") >= k).select("v")
        cur = (
            cur.join(keep.withColumnRenamed("v", "pa"), "pa")
            .join(keep.withColumnRenamed("v", "pb"), "pb")
            .select("pa", "pb")
            .localCheckpoint()
        )
    out = stats[0]
    for s in stats[1:]:
        out = out.unionAll(s)
    return out


@q(
    "freq_sample_qc",
    """WITH obs AS (
         SELECT l_suppkey AS sample_id,
                (['A','C','G','T'])[(l_partkey % 4) + 1] AS ref,
                (['A','C','G','T'])[((l_partkey % 4 + 1
                    + (l_partkey // 4) % 3) % 4) + 1] AS alt,
                CASE WHEN l_linenumber % 3 = 0 THEN 'homozygous'
                     WHEN l_linenumber % 3 = 1 THEN 'heterozygous' END
                  AS zygosity
         FROM lineitem),
       cls AS (
         SELECT sample_id, zygosity,
                CASE WHEN (ref IN ('A','G') AND alt IN ('A','G'))
                       OR (ref IN ('C','T') AND alt IN ('C','T'))
                     THEN 1 ELSE 0 END AS is_ti
         FROM obs)
       SELECT sample_id,
              CAST(COUNT(*) AS BIGINT) AS n_obs,
              CAST(SUM(CASE WHEN zygosity = 'heterozygous' THEN 1 ELSE 0 END)
                   AS BIGINT) AS n_het,
              CAST(SUM(CASE WHEN zygosity = 'homozygous' THEN 1 ELSE 0 END)
                   AS BIGINT) AS n_hom,
              CAST(FLOOR(SUM(CASE WHEN zygosity = 'heterozygous' THEN 1 ELSE 0
                             END) * 1000000.0
                         / NULLIF(SUM(CASE WHEN zygosity IS NOT NULL
                                           THEN 1 ELSE 0 END), 0))
                   AS BIGINT) AS het_ppm,
              CAST(SUM(is_ti) AS BIGINT) AS n_ti,
              CAST(SUM(1 - is_ti) AS BIGINT) AS n_tv,
              CAST(FLOOR(SUM(is_ti) * 1000000.0
                         / NULLIF(SUM(1 - is_ti), 0)) AS BIGINT) AS titv_ppm
       FROM cls GROUP BY sample_id""",
)
def freq_sample_qc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Varda-core sample QC sheet — the per-sample screen run after every
    VCF import, before activation: heterozygosity rate (the sample-swap /
    contamination detector; an outlier het_ppm vs the cohort flags a
    mixed or duplicated sample) and transition/transversion ratio (the
    genotyping-error detector; random errors drag Ti/Tv toward 0.5 vs
    the genome-wide ~2.0-2.1 expectation for true variants). Alleles are
    synthesized deterministically (ref from partkey%4, alt offset 1-3 so
    alt ≠ ref always) with the same trick in both engines; transition =
    purine↔purine or pyrimidine↔pyrimidine. Exact integer counts, ppm
    ratios with NULLIF zero-guards. One grouped agg over the fact scan —
    map-side partials, sample-count-sized output."""
    li = read_table(spark, sf_dir, "lineitem")
    acgt = F.array(F.lit("A"), F.lit("C"), F.lit("G"), F.lit("T"))
    obs = li.select(
        F.col("l_suppkey").alias("sample_id"),
        F.element_at(acgt, (F.col("l_partkey") % 4 + 1).cast("int")).alias("ref"),
        F.element_at(
            acgt,
            F.expr("CAST((l_partkey % 4 + 1 + (l_partkey DIV 4) % 3) % 4 + 1 AS INT)"),
        ).alias("alt"),
        F.when(F.col("l_linenumber") % 3 == 0, F.lit("homozygous"))
        .when(F.col("l_linenumber") % 3 == 1, F.lit("heterozygous"))
        .otherwise(F.lit(None).cast("string"))
        .alias("zygosity"),
    )
    cls = obs.select(
        "sample_id",
        "zygosity",
        F.expr(
            "CASE WHEN (ref IN ('A','G') AND alt IN ('A','G'))"
            " OR (ref IN ('C','T') AND alt IN ('C','T')) THEN 1 ELSE 0 END"
        ).alias("is_ti"),
    )
    return cls.groupBy("sample_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_obs"),
        F.sum(F.expr("CASE WHEN zygosity = 'heterozygous' THEN 1 ELSE 0 END"))
        .cast("bigint")
        .alias("n_het"),
        F.sum(F.expr("CASE WHEN zygosity = 'homozygous' THEN 1 ELSE 0 END"))
        .cast("bigint")
        .alias("n_hom"),
        F.expr(
            "CAST(FLOOR(SUM(CASE WHEN zygosity = 'heterozygous' THEN 1 ELSE 0 END)"
            " * 1000000.0 / NULLIF(SUM(CASE WHEN zygosity IS NOT NULL"
            " THEN 1 ELSE 0 END), 0)) AS BIGINT)"
        ).alias("het_ppm"),
        F.sum("is_ti").cast("bigint").alias("n_ti"),
        F.sum(F.lit(1) - F.col("is_ti")).cast("bigint").alias("n_tv"),
        F.expr(
            "CAST(FLOOR(SUM(is_ti) * 1000000.0 / NULLIF(SUM(1 - is_ti), 0))"
            " AS BIGINT)"
        ).alias("titv_ppm"),
    )


@q(
    "interval_cluster",
    """WITH ivs AS (
         SELECT s_suppkey AS iv_id,
                CAST(s_suppkey % 5 AS VARCHAR) AS chromosome,
                CAST(s_suppkey * 97 + 1 AS BIGINT) AS begin,
                CAST(s_suppkey * 97 + 1 + 200 + (s_suppkey % 7) * 500
                     AS BIGINT) AS "end"
         FROM supplier),
       o AS (
         SELECT iv_id, chromosome, begin, "end",
                CASE WHEN MAX("end") OVER w IS NULL OR begin > MAX("end") OVER w
                     THEN 1 ELSE 0 END AS new_i
         FROM ivs
         WINDOW w AS (PARTITION BY chromosome ORDER BY begin, "end", iv_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)),
       s AS (
         SELECT iv_id, chromosome, begin, "end",
                SUM(new_i) OVER (PARTITION BY chromosome
                                 ORDER BY begin, "end", iv_id
                                 ROWS UNBOUNDED PRECEDING) AS cluster
         FROM o)
       SELECT iv_id, chromosome, begin, "end",
              CAST(cluster AS BIGINT) AS cluster,
              CAST(COUNT(*) OVER (PARTITION BY chromosome, cluster)
                   AS BIGINT) AS cluster_size
       FROM s""",
)
def interval_cluster(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C1+ bedtools cluster: every interval keeps its identity but gains a
    per-chromosome cluster id (the gaps-and-islands id from interval_merge,
    un-aggregated) plus the cluster's member count — the primitive behind
    "which overlapping imports does this coverage region belong to" without
    collapsing them. Same single partitioned-window pass as interval_merge
    (no joins, per-chromosome parallel); the cluster_size window runs over
    the already-keyed (chromosome, cluster) partition. Scale: one shuffle
    on chromosome; at 100 TB chromosome alone is too coarse a key, so the
    production path would range-partition on (chromosome, begin-bucket) and
    stitch islands across bucket seams — documented here, not needed at
    bench scale."""
    _, s = _points_intervals(spark, sf_dir)
    ivs = s.select(
        F.col("sample_key").alias("iv_id"), "chromosome",
        F.col("begin").cast("long").alias("begin"),
        F.col("end").cast("long").alias("end"),
    )
    w = Window.partitionBy("chromosome").orderBy("begin", "end", "iv_id")
    prev_max = F.max("end").over(w.rowsBetween(Window.unboundedPreceding, -1))
    new_i = F.when(prev_max.isNull() | (F.col("begin") > prev_max), 1).otherwise(0)
    clustered = ivs.withColumn(
        "cluster",
        F.sum(new_i).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)),
    )
    wc = Window.partitionBy("chromosome", "cluster")
    return clustered.select(
        "iv_id", "chromosome", "begin", "end",
        F.col("cluster").cast("bigint").alias("cluster"),
        F.count(F.lit(1)).over(wc).cast("bigint").alias("cluster_size"),
    )


_SUBTRACT_B_SQL = """
       braw AS (
         SELECT CAST(p_partkey % 5 AS VARCHAR) AS chromosome,
                CAST(p_partkey * 31 + 1 AS BIGINT) AS begin,
                CAST(p_partkey * 31 + 1 + 100 + (p_partkey % 4) * 200
                     AS BIGINT) AS "end"
         FROM part WHERE p_partkey % 11 = 0),
       bo AS (
         SELECT chromosome, begin, "end",
                CASE WHEN MAX("end") OVER w IS NULL OR begin > MAX("end") OVER w
                     THEN 1 ELSE 0 END AS new_i
         FROM braw
         WINDOW w AS (PARTITION BY chromosome ORDER BY begin, "end"
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)),
       bs AS (
         SELECT chromosome, begin, "end",
                SUM(new_i) OVER (PARTITION BY chromosome ORDER BY begin, "end"
                                 ROWS UNBOUNDED PRECEDING) AS island
         FROM bo),
       bm AS (
         SELECT chromosome, MIN(begin) AS begin, MAX("end") AS "end"
         FROM bs GROUP BY chromosome, island)
"""


@q(
    "interval_subtract",
    f"""WITH a AS (
         SELECT s_suppkey AS iv_id,
                CAST(s_suppkey % 5 AS VARCHAR) AS chromosome,
                CAST(s_suppkey * 97 + 1 AS BIGINT) AS ab,
                CAST(s_suppkey * 97 + 1 + 200 + (s_suppkey % 7) * 500
                     AS BIGINT) AS ae
         FROM supplier),
       {_SUBTRACT_B_SQL},
       ov AS (
         SELECT a.iv_id, a.chromosome, a.ab, a.ae, b.begin AS bb, b."end" AS be
         FROM a JOIN bm b
           ON a.chromosome = b.chromosome
          AND b.begin <= a.ae AND b."end" >= a.ab),
       gaps AS (
         SELECT iv_id, chromosome,
                GREATEST(ab, COALESCE(
                  LAG(be) OVER (PARTITION BY iv_id ORDER BY bb) + 1, ab)) AS s,
                bb - 1 AS e
         FROM ov
         UNION ALL
         SELECT iv_id, chromosome, GREATEST(ab, MAX(be) + 1) AS s, ae AS e
         FROM ov GROUP BY iv_id, chromosome, ab, ae),
       untouched AS (
         SELECT iv_id, chromosome, ab AS s, ae AS e FROM a
         WHERE iv_id NOT IN (SELECT iv_id FROM ov))
       SELECT iv_id, chromosome, CAST(s AS BIGINT) AS seg_begin,
              CAST(e AS BIGINT) AS seg_end
       FROM (SELECT * FROM gaps WHERE s <= e
             UNION ALL SELECT * FROM untouched)""",
)
def interval_subtract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C1+ bedtools subtract: residual pieces of each A interval after
    removing every B interval (closed-interval semantics) — the masking
    primitive (exclude blacklist/repeat regions from coverage). B is first
    collapsed to disjoint runs (merge_intervals), so per A interval the
    overlapping B's are non-overlapping and sorted: the residual segments
    are exactly the gap before each B (LAG of previous B end, clipped to
    A's begin), the tail after the last B (one grouped agg), and untouched
    A's via anti-join. The A x merged-B overlap uses the UCSC-binned
    range_overlap_join — equi-shuffle on (chromosome, bin), never a theta
    join — and every window partitions on iv_id (per-interval, unskewed).
    Scale: merge is one window pass; overlap join is the binned scale
    path; output is data-sized. All integer arithmetic."""
    from varda_spark.operators.interval import merge_intervals, range_overlap_join

    _, s = _points_intervals(spark, sf_dir)
    a = s.select(
        F.col("sample_key").alias("iv_id"), "chromosome",
        F.col("begin").cast("long").alias("ab"),
        F.col("end").cast("long").alias("ae"),
    )
    part = read_table(spark, sf_dir, "part").filter(F.col("p_partkey") % 11 == 0)
    braw = part.select(
        (F.col("p_partkey") % 5).cast("string").alias("chromosome"),
        (F.col("p_partkey") * 31 + 1).cast("long").alias("begin"),
        (F.col("p_partkey") * 31 + 1 + 100
         + (F.col("p_partkey") % 4) * 200).cast("long").alias("end"),
    )
    bm = merge_intervals(braw).select(
        "chromosome", F.col("begin").cast("long").alias("begin"),
        F.col("end").cast("long").alias("end"),
    )
    ov = range_overlap_join(
        a.withColumnRenamed("ab", "begin").withColumnRenamed("ae", "end"), bm
    ).select(
        "iv_id", "chromosome",
        F.col("begin").alias("ab"), F.col("end").alias("ae"),
        F.col("r_begin").alias("bb"), F.col("r_end").alias("be"),
    )
    wiv = Window.partitionBy("iv_id").orderBy("bb")
    gaps = ov.select(
        "iv_id", "chromosome",
        F.greatest(
            F.col("ab"),
            F.coalesce(F.lag("be").over(wiv) + 1, F.col("ab")),
        ).alias("s"),
        (F.col("bb") - 1).alias("e"),
    )
    tails = ov.groupBy("iv_id", "chromosome", "ab", "ae").agg(
        F.max("be").alias("maxbe")
    ).select(
        "iv_id", "chromosome",
        F.greatest(F.col("ab"), F.col("maxbe") + 1).alias("s"),
        F.col("ae").alias("e"),
    )
    untouched = a.join(ov.select("iv_id").distinct(), "iv_id", "left_anti").select(
        "iv_id", "chromosome", F.col("ab").alias("s"), F.col("ae").alias("e")
    )
    segs = gaps.filter(F.col("s") <= F.col("e")).unionAll(
        tails.filter(F.col("s") <= F.col("e"))
    ).unionAll(untouched)
    return segs.select(
        "iv_id", "chromosome",
        F.col("s").cast("bigint").alias("seg_begin"),
        F.col("e").cast("bigint").alias("seg_end"),
    )


@q(
    "graph_assortativity",
    f"""WITH {_COORDER_EDGES_SQL},
       deg AS (
         SELECT node, COUNT(*) AS d FROM (
           SELECT pa AS node FROM e UNION ALL SELECT pb AS node FROM e)
         GROUP BY node),
       sym AS (
         SELECT pa AS src, pb AS dst FROM e
         UNION ALL SELECT pb AS src, pa AS dst FROM e),
       xy AS (
         SELECT CAST(ds.d AS DECIMAL(38,0)) AS x,
                CAST(dd.d AS DECIMAL(38,0)) AS y
         FROM sym JOIN deg ds ON sym.src = ds.node
                  JOIN deg dd ON sym.dst = dd.node),
       sums AS (
         SELECT CAST(COUNT(*) AS DECIMAL(38,0)) AS n,
                SUM(x) AS sx, SUM(x * y) AS sxy, SUM(x * x) AS sxx
         FROM xy)
       SELECT CAST(n AS BIGINT) AS n_endpoints,
              CAST(sx AS BIGINT) AS sum_deg,
              CAST(sxy AS BIGINT) AS sum_xy,
              CAST(sxx AS BIGINT) AS sum_xx,
              CAST(n * sxy - sx * sx AS DOUBLE)
                / CAST(n * sxx - sx * sx AS DOUBLE) AS assortativity
       FROM sums""",
)
def graph_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree assortativity (Newman 2002) of the co-purchase graph: the
    Pearson correlation of endpoint degrees over the symmetrized edge
    list — positive = hubs attach to hubs (social-network shape),
    negative = hub-and-spoke (internet/biology shape). Decides whether
    degree-based partitioning tricks (hub salting, high-degree vertex
    mirroring) will pay off downstream. Exact: all moment sums accumulate
    in DECIMAL(38,0) (no int64 overflow at any sf — the advisory
    agg_abc_class lesson), symmetry makes Sy=Sx and Syy=Sxx so one pass
    suffices; the final r is one deterministic double division. Plan:
    degree agg + two broadcast-friendly joins (deg is node-sized) + one
    global 1-row agg — map-side partials everywhere."""
    e = _coorder_edges(spark, sf_dir)
    nodes = e.select(F.col("pa").alias("node")).unionAll(
        e.select(F.col("pb").alias("node"))
    )
    deg = nodes.groupBy("node").agg(F.count(F.lit(1)).alias("d"))
    sym = e.select(F.col("pa").alias("src"), F.col("pb").alias("dst")).unionAll(
        e.select(F.col("pb").alias("src"), F.col("pa").alias("dst"))
    )
    xy = (
        sym.join(F.broadcast(deg).withColumnRenamed("node", "src")
                 .withColumnRenamed("d", "x"), "src")
        .join(F.broadcast(deg).withColumnRenamed("node", "dst")
              .withColumnRenamed("d", "y"), "dst")
        .select(F.col("x").cast("decimal(38,0)").alias("x"),
                F.col("y").cast("decimal(38,0)").alias("y"))
    )
    sums = xy.agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("n"),
        F.sum("x").alias("sx"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    return sums.select(
        F.col("n").cast("bigint").alias("n_endpoints"),
        F.col("sx").cast("bigint").alias("sum_deg"),
        F.col("sxy").cast("bigint").alias("sum_xy"),
        F.col("sxx").cast("bigint").alias("sum_xx"),
        (
            (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sx")).cast("double")
            / (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
        ).alias("assortativity"),
    )


@q(
    "win_rsi",
    """WITH b AS (
         SELECT event_id, user_id, ts,
                CAST(CAST(value AS DECIMAL(18,4)) * 10000 AS BIGINT) AS xq
         FROM events),
       d AS (
         SELECT event_id, user_id, ts,
                xq - LAG(xq) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                  AS diff
         FROM b),
       w AS (
         SELECT event_id, user_id,
                SUM(CASE WHEN diff > 0 THEN diff ELSE 0 END) OVER win AS sgain,
                SUM(CASE WHEN diff < 0 THEN -diff ELSE 0 END) OVER win AS sloss,
                COUNT(diff) OVER win AS nd
         FROM d
         WINDOW win AS (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS BETWEEN 13 PRECEDING AND CURRENT ROW))
       SELECT event_id, user_id,
              CAST(sgain AS BIGINT) AS sgain, CAST(sloss AS BIGINT) AS sloss,
              CAST(FLOOR(1000000.0 * sgain / NULLIF(sgain + sloss, 0))
                   AS BIGINT) AS rsi_ppm
       FROM w WHERE nd = 14""",
)
def win_rsi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E+ 14-period RSI (Cutler's simple-average variant) of event value
    per user — the bounded momentum oscillator next to win_bollinger and
    win_cusum; Cutler's SMA form instead of Wilder's smoothing because
    the recursion-free rolling sum is exact in integer arithmetic (the
    win_ewma lesson: EWMA-style recursions are float-order-sensitive).
    Gains/losses are LAG diffs on the 1e4 fixed-point grid, summed over
    a 14-row frame; rows with fewer than 14 observed diffs are dropped
    (COUNT(diff) guard — no partition-edge bias); rsi_ppm is one final
    deterministic float floor. Plan: both windows share one (user_id)
    sort — single shuffle, embarrassing parallel."""
    ev = read_table(spark, sf_dir, "events")
    b = ev.select(
        "event_id", "user_id", "ts",
        F.expr("CAST(CAST(value AS DECIMAL(18,4)) * 10000 AS BIGINT)").alias("xq"),
    )
    wo = Window.partitionBy("user_id").orderBy("ts", "event_id")
    d = b.withColumn("diff", F.col("xq") - F.lag("xq").over(wo))
    frame = wo.rowsBetween(-13, Window.currentRow)
    w = d.select(
        "event_id", "user_id",
        F.sum(F.when(F.col("diff") > 0, F.col("diff")).otherwise(0)).over(frame).alias("sgain"),
        F.sum(F.when(F.col("diff") < 0, -F.col("diff")).otherwise(0)).over(frame).alias("sloss"),
        F.count("diff").over(frame).alias("nd"),
    )
    return w.filter(F.col("nd") == 14).select(
        "event_id", "user_id",
        F.col("sgain").cast("bigint").alias("sgain"),
        F.col("sloss").cast("bigint").alias("sloss"),
        F.expr(
            "CAST(FLOOR(1000000.0 * sgain / NULLIF(sgain + sloss, 0)) AS BIGINT)"
        ).alias("rsi_ppm"),
    )


@q(
    "win_stochastic",
    """WITH b AS (
         SELECT event_id, user_id, ts,
                CAST(CAST(value AS DECIMAL(18,4)) * 10000 AS BIGINT) AS xq
         FROM events),
       w AS (
         SELECT event_id, user_id, xq,
                MIN(xq) OVER win AS mn, MAX(xq) OVER win AS mx,
                COUNT(*) OVER win AS nn
         FROM b
         WINDOW win AS (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS BETWEEN 13 PRECEDING AND CURRENT ROW))
       SELECT event_id, user_id,
              CAST(mn AS BIGINT) AS low14, CAST(mx AS BIGINT) AS high14,
              CAST(FLOOR(1000000.0 * (xq - mn) / NULLIF(mx - mn, 0))
                   AS BIGINT) AS pctk_ppm
       FROM w WHERE nn = 14""",
)
def win_stochastic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E+ stochastic oscillator %K over a 14-row frame: where the current
    value sits inside the recent [low, high] envelope, in ppm — the
    range-position normalization (win_minmax_scale's rolling cousin;
    flat-envelope rows yield NULL via the NULLIF guard rather than a
    fake 0). Exact on the 1e4 fixed-point grid; full-frame rows only.
    Plan: rolling MIN/MAX/COUNT share one keyed sort — single shuffle."""
    ev = read_table(spark, sf_dir, "events")
    b = ev.select(
        "event_id", "user_id", "ts",
        F.expr("CAST(CAST(value AS DECIMAL(18,4)) * 10000 AS BIGINT)").alias("xq"),
    )
    frame = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        -13, Window.currentRow
    )
    w = b.select(
        "event_id", "user_id", "xq",
        F.min("xq").over(frame).alias("mn"),
        F.max("xq").over(frame).alias("mx"),
        F.count(F.lit(1)).over(frame).alias("nn"),
    )
    return w.filter(F.col("nn") == 14).select(
        "event_id", "user_id",
        F.col("mn").cast("bigint").alias("low14"),
        F.col("mx").cast("bigint").alias("high14"),
        F.expr(
            "CAST(FLOOR(1000000.0 * (xq - mn) / NULLIF(mx - mn, 0)) AS BIGINT)"
        ).alias("pctk_ppm"),
    )


@q(
    "text_zipf",
    """WITH toks AS (
         SELECT unnest(string_split(trim(text), ' ')) AS tok FROM documents),
       c AS (SELECT tok, COUNT(*) AS cnt FROM toks GROUP BY tok),
       t AS (SELECT tok, cnt FROM c ORDER BY cnt DESC, tok LIMIT 50),
       r AS (SELECT tok, cnt,
                    ROW_NUMBER() OVER (ORDER BY cnt DESC, tok) AS rnk
             FROM t)
       SELECT tok, CAST(cnt AS BIGINT) AS cnt, CAST(rnk AS BIGINT) AS rnk,
              CAST(FLOOR(1000000.0 * cnt * rnk / (SELECT MAX(cnt) FROM t))
                   AS BIGINT) AS zipf_ppm
       FROM r""",
)
def text_zipf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K4+ Zipf-law fit check over the corpus vocabulary: top-50 tokens by
    frequency with rank and zipf_ppm = 1e6 * (cnt_r * r / cnt_1) — under a
    perfect 1/r law every row reads 1e6; systematic drift up/down exposes
    head-heavy (template/boilerplate) or head-light (scrambled) corpora.
    The natural-language sanity check next to text_ngram_novelty. Scale:
    token count is one grouped agg (map-side partials over the corpus
    scan); the top-50 uses orderBy+limit = TakeOrderedAndProject (per-
    partition heap top-k, never a global sort); rank window and the 1-row
    cnt_1 scalar both run over the 50-row result (whitelisted one-task
    shapes, vocabulary-head-sized by construction)."""
    d = read_table(spark, sf_dir, "documents")
    counts = (
        d.select(F.explode(F.split(F.trim(F.col("text")), " ")).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    top = counts.orderBy(F.col("cnt").desc(), "tok").limit(50)
    ranked = top.withColumn(
        "rnk", F.row_number().over(Window.orderBy(F.col("cnt").desc(), "tok"))
    )
    c1 = top.agg(F.max("cnt").alias("c1"))
    return ranked.crossJoin(F.broadcast(c1)).select(
        "tok",
        F.col("cnt").cast("bigint").alias("cnt"),
        F.col("rnk").cast("bigint").alias("rnk"),
        F.expr("CAST(FLOOR(1000000.0 * cnt * rnk / c1) AS BIGINT)").alias("zipf_ppm"),
    )


@q(
    "agg_simpson",
    """WITH c AS (
         SELECT user_id, event_type, COUNT(*) AS cnt
         FROM events GROUP BY user_id, event_type),
       s AS (
         SELECT user_id, SUM(cnt) AS n, SUM(cnt * cnt) AS s2,
                COUNT(*) AS n_types
         FROM c GROUP BY user_id)
       SELECT user_id, CAST(n AS BIGINT) AS n_events,
              CAST(n_types AS BIGINT) AS n_types,
              CAST((1000000 * (n * n - s2)) // (n * n) AS BIGINT)
                AS simpson_ppm,
              CAST((1000000 * n * n) // s2 AS BIGINT) AS eff_types_ppm
       FROM s""",
)
def agg_simpson(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D+ Gini-Simpson diversity per user over event types: the
    probability two random events differ in type (1 - sum p_i^2) and the
    effective number of types (inverse Simpson, N^2/sum c_i^2) — the
    diversity index chosen over Shannon entropy deliberately: it is a
    pure RATIONAL function of integer counts, so both engines compute it
    bit-exactly with integer division (ppm floor), where entropy's
    per-category log2 is correctly-rounded differently across libm
    implementations and would break the value hash (the repo-wide
    no-float-log rule; see agg_pow2_hist's bin-length trick). Plan: two
    grouped aggs with map-side partials; per-user counts stay well under
    the 1e6*n^2 < int64 ceiling (n per key < ~3e6 — docstring contract,
    DECIMAL(38,0) is the escape hatch beyond)."""
    ev = read_table(spark, sf_dir, "events")
    c = ev.groupBy("user_id", "event_type").agg(F.count(F.lit(1)).alias("cnt"))
    s = c.groupBy("user_id").agg(
        F.sum("cnt").alias("n"),
        F.sum(F.col("cnt") * F.col("cnt")).alias("s2"),
        F.count(F.lit(1)).alias("n_types"),
    )
    return s.select(
        "user_id",
        F.col("n").cast("bigint").alias("n_events"),
        F.col("n_types").cast("bigint").alias("n_types"),
        F.expr("CAST((1000000 * (n * n - s2)) DIV (n * n) AS BIGINT)").alias(
            "simpson_ppm"
        ),
        F.expr("CAST((1000000 * n * n) DIV s2 AS BIGINT)").alias("eff_types_ppm"),
    )


@q(
    "agg_welch_ttest",
    """WITH s AS (
         SELECT
           CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT) AS n1,
           CAST(SUM(CASE WHEN l_returnflag = 'A' THEN 1 ELSE 0 END) AS BIGINT) AS n2,
           CAST(SUM(CASE WHEN l_returnflag = 'R'
                         THEN CAST(l_quantity AS DECIMAL(18,4)) END) AS DOUBLE) AS s1,
           CAST(SUM(CASE WHEN l_returnflag = 'A'
                         THEN CAST(l_quantity AS DECIMAL(18,4)) END) AS DOUBLE) AS s2,
           CAST(SUM(CASE WHEN l_returnflag = 'R'
                         THEN CAST(l_quantity AS DECIMAL(18,4))
                              * CAST(l_quantity AS DECIMAL(18,4)) END)
                AS DOUBLE) AS ss1,
           CAST(SUM(CASE WHEN l_returnflag = 'A'
                         THEN CAST(l_quantity AS DECIMAL(18,4))
                              * CAST(l_quantity AS DECIMAL(18,4)) END)
                AS DOUBLE) AS ss2
         FROM lineitem),
       m AS (
         SELECT n1, n2, s1 / n1 AS m1, s2 / n2 AS m2,
                (ss1 - s1 * s1 / n1) / (n1 - 1) AS v1,
                (ss2 - s2 * s2 / n2) / (n2 - 1) AS v2
         FROM s)
       SELECT n1, n2, m1, m2,
              (m1 - m2) / sqrt(v1 / n1 + v2 / n2) AS t_stat,
              (v1 / n1 + v2 / n2) * (v1 / n1 + v2 / n2)
                / ((v1 / n1) * (v1 / n1) / (n1 - 1)
                   + (v2 / n2) * (v2 / n2) / (n2 - 1)) AS welch_df
       FROM m""",
)
def agg_welch_ttest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D+ Welch's unequal-variance t-test between two cohorts (returned
    vs accepted lineitems, on quantity): t statistic and
    Welch-Satterthwaite degrees of freedom — the A/B-test primitive.
    Float discipline: the sufficient statistics (n, sum, sum-of-squares)
    accumulate EXACTLY in DECIMAL(18,4)/(38,8) so shuffle order cannot
    change them; only then does ONE deterministic cast to double feed a
    fixed-shape expression tree of IEEE ops (+,-,*,/,sqrt — all
    correctly rounded, hence bit-identical across engines). Single-pass
    conditional aggregation: one scan, map-side partials, 1-row output."""
    li = read_table(spark, sf_dir, "lineitem")
    dq = F.col("l_quantity").cast("decimal(18,4)")
    s = li.agg(
        F.sum(F.when(F.col("l_returnflag") == "R", 1).otherwise(0)).cast("bigint").alias("n1"),
        F.sum(F.when(F.col("l_returnflag") == "A", 1).otherwise(0)).cast("bigint").alias("n2"),
        F.sum(F.when(F.col("l_returnflag") == "R", dq)).cast("double").alias("s1"),
        F.sum(F.when(F.col("l_returnflag") == "A", dq)).cast("double").alias("s2"),
        F.sum(F.when(F.col("l_returnflag") == "R", dq * dq)).cast("double").alias("ss1"),
        F.sum(F.when(F.col("l_returnflag") == "A", dq * dq)).cast("double").alias("ss2"),
    )
    m = s.select(
        "n1", "n2",
        F.expr("s1 / n1").alias("m1"),
        F.expr("s2 / n2").alias("m2"),
        F.expr("(ss1 - s1 * s1 / n1) / (n1 - 1)").alias("v1"),
        F.expr("(ss2 - s2 * s2 / n2) / (n2 - 1)").alias("v2"),
    )
    return m.select(
        "n1", "n2", "m1", "m2",
        F.expr("(m1 - m2) / sqrt(v1 / n1 + v2 / n2)").alias("t_stat"),
        F.expr(
            "(v1 / n1 + v2 / n2) * (v1 / n1 + v2 / n2)"
            " / ((v1 / n1) * (v1 / n1) / (n1 - 1)"
            "    + (v2 / n2) * (v2 / n2) / (n2 - 1))"
        ).alias("welch_df"),
    )


@q(
    "graph_bfs",
    f"""WITH {_COORDER_EDGES_SQL},
       sym AS (SELECT pa AS src, pb AS dst FROM e
               UNION ALL SELECT pb AS src, pa AS dst FROM e),
       f0 AS (SELECT MIN(pa) AS v FROM e),
       vis0 AS (SELECT v FROM f0),
       f1 AS (SELECT DISTINCT s.dst AS v FROM sym s JOIN f0 ON s.src = f0.v
              WHERE s.dst NOT IN (SELECT v FROM vis0)),
       vis1 AS (SELECT v FROM vis0 UNION SELECT v FROM f1),
       f2 AS (SELECT DISTINCT s.dst AS v FROM sym s JOIN f1 ON s.src = f1.v
              WHERE s.dst NOT IN (SELECT v FROM vis1)),
       vis2 AS (SELECT v FROM vis1 UNION SELECT v FROM f2),
       f3 AS (SELECT DISTINCT s.dst AS v FROM sym s JOIN f2 ON s.src = f2.v
              WHERE s.dst NOT IN (SELECT v FROM vis2)),
       vis3 AS (SELECT v FROM vis2 UNION SELECT v FROM f3)
       SELECT 0 AS round, CAST((SELECT COUNT(*) FROM f0) AS BIGINT) AS frontier,
              CAST((SELECT COUNT(*) FROM vis0) AS BIGINT) AS visited
       UNION ALL SELECT 1, (SELECT COUNT(*) FROM f1), (SELECT COUNT(*) FROM vis1)
       UNION ALL SELECT 2, (SELECT COUNT(*) FROM f2), (SELECT COUNT(*) FROM vis2)
       UNION ALL SELECT 3, (SELECT COUNT(*) FROM f3), (SELECT COUNT(*) FROM vis3)""",
)
def graph_bfs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Breadth-first expansion from the minimum-id node of the co-purchase
    graph, 3 synchronous rounds: per-round frontier and cumulative visited
    counts — the reachability/diameter probe (and the skeleton of every
    label-push algorithm here: frontier join + anti-join dedup, the
    graph_labelprop/graph_kcore family). Fixed-round unrolled-CTE oracle
    like kcore; Spark iterates with localCheckpoint on the visited set so
    lineage stays flat. Scale: each round is one join shuffled on the
    frontier key + one anti-join against visited (both data-sized,
    frontier-bounded); no driver state beyond the loop counter."""
    e = _coorder_edges(spark, sf_dir)
    sym = e.select(F.col("pa").alias("src"), F.col("pb").alias("dst")).unionAll(
        e.select(F.col("pb").alias("src"), F.col("pa").alias("dst"))
    ).localCheckpoint()
    f = e.agg(F.min("pa").alias("v"))
    vis = f
    out = []
    for rnd in range(4):
        fc = f.agg(F.count(F.lit(1)).alias("frontier"))
        vc = vis.agg(F.count(F.lit(1)).alias("visited"))
        out.append(
            fc.crossJoin(F.broadcast(vc)).select(
                F.lit(rnd).alias("round"),
                F.col("frontier").cast("bigint").alias("frontier"),
                F.col("visited").cast("bigint").alias("visited"),
            )
        )
        if rnd == 3:
            break
        nxt = (
            sym.join(f.withColumnRenamed("v", "src"), "src")
            .select(F.col("dst").alias("v"))
            .distinct()
            .join(vis, "v", "left_anti")
            .localCheckpoint()
        )
        vis = vis.unionAll(nxt).localCheckpoint()
        f = nxt
    res = out[0]
    for o in out[1:]:
        res = res.unionAll(o)
    return res


@q(
    "win_macd",
    """WITH b AS (
         SELECT event_id, user_id, ts,
                CAST(CAST(value AS DECIMAL(18,4)) * 10000 AS BIGINT) AS xq
         FROM events),
       w AS (
         SELECT event_id, user_id,
                128 * xq
                  + 64 * COALESCE(LAG(xq, 1) OVER win, 0)
                  + 32 * COALESCE(LAG(xq, 2) OVER win, 0)
                  + 16 * COALESCE(LAG(xq, 3) OVER win, 0)
                  + 8 * COALESCE(LAG(xq, 4) OVER win, 0)
                  + 4 * COALESCE(LAG(xq, 5) OVER win, 0)
                  + 2 * COALESCE(LAG(xq, 6) OVER win, 0)
                  + 1 * COALESCE(LAG(xq, 7) OVER win, 0) AS fnum,
                128
                  + CASE WHEN LAG(xq, 1) OVER win IS NULL THEN 0 ELSE 64 END
                  + CASE WHEN LAG(xq, 2) OVER win IS NULL THEN 0 ELSE 32 END
                  + CASE WHEN LAG(xq, 3) OVER win IS NULL THEN 0 ELSE 16 END
                  + CASE WHEN LAG(xq, 4) OVER win IS NULL THEN 0 ELSE 8 END
                  + CASE WHEN LAG(xq, 5) OVER win IS NULL THEN 0 ELSE 4 END
                  + CASE WHEN LAG(xq, 6) OVER win IS NULL THEN 0 ELSE 2 END
                  + CASE WHEN LAG(xq, 7) OVER win IS NULL THEN 0 ELSE 1 END AS fden,
                16384 * xq
                  + 12288 * COALESCE(LAG(xq, 1) OVER win, 0)
                  + 9216 * COALESCE(LAG(xq, 2) OVER win, 0)
                  + 6912 * COALESCE(LAG(xq, 3) OVER win, 0)
                  + 5184 * COALESCE(LAG(xq, 4) OVER win, 0)
                  + 3888 * COALESCE(LAG(xq, 5) OVER win, 0)
                  + 2916 * COALESCE(LAG(xq, 6) OVER win, 0)
                  + 2187 * COALESCE(LAG(xq, 7) OVER win, 0) AS snum,
                16384
                  + CASE WHEN LAG(xq, 1) OVER win IS NULL THEN 0 ELSE 12288 END
                  + CASE WHEN LAG(xq, 2) OVER win IS NULL THEN 0 ELSE 9216 END
                  + CASE WHEN LAG(xq, 3) OVER win IS NULL THEN 0 ELSE 6912 END
                  + CASE WHEN LAG(xq, 4) OVER win IS NULL THEN 0 ELSE 5184 END
                  + CASE WHEN LAG(xq, 5) OVER win IS NULL THEN 0 ELSE 3888 END
                  + CASE WHEN LAG(xq, 6) OVER win IS NULL THEN 0 ELSE 2916 END
                  + CASE WHEN LAG(xq, 7) OVER win IS NULL THEN 0 ELSE 2187 END AS sden
         FROM b
         WINDOW win AS (PARTITION BY user_id ORDER BY ts, event_id))
       SELECT event_id, user_id,
              CAST(fnum AS BIGINT) AS fnum, CAST(fden AS BIGINT) AS fden,
              CAST(snum AS BIGINT) AS snum, CAST(sden AS BIGINT) AS sden,
              CAST(fnum AS DOUBLE) / CAST(fden AS DOUBLE) / 10000.0
                - CAST(snum AS DOUBLE) / CAST(sden AS DOUBLE) / 10000.0 AS macd
       FROM w""",
)
def win_macd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E+ MACD: difference of a fast (alpha=1/2) and slow (alpha=1/4)
    exponentially weighted average of event value per user — the trend-
    shift detector layered on the win_ewma machinery. Both EWMAs use the
    8-tap truncated-geometric trick with EXACT integer weights: fast taps
    2^(7-k), slow taps 3^k*4^(7-k) (the alpha=1/4 geometric ratio 3/4
    integerized by 4^7), so every tap product and the tap-present
    denominators are exact BIGINTs; one final fixed-order double
    expression de-scales and subtracts. All four accumulators share ONE
    keyed window sort — same single-shuffle plan as win_ewma."""
    ev = read_table(spark, sf_dir, "events")
    b = ev.select(
        "event_id", "user_id", "ts",
        F.expr("CAST(CAST(value AS DECIMAL(18,4)) * 10000 AS BIGINT)").alias("xq"),
    )
    win = Window.partitionBy("user_id").orderBy("ts", "event_id")
    fw = [1 << (7 - k) for k in range(8)]
    sw = [(3 ** k) * (4 ** (7 - k)) for k in range(8)]
    fnum = F.lit(0).cast("bigint")
    fden = F.lit(0).cast("bigint")
    snum = F.lit(0).cast("bigint")
    sden = F.lit(0).cast("bigint")
    for k in range(8):
        lagged = F.col("xq") if k == 0 else F.lag("xq", k).over(win)
        fnum = fnum + F.coalesce(lagged, F.lit(0)) * fw[k]
        fden = fden + F.when(lagged.isNull(), 0).otherwise(fw[k])
        snum = snum + F.coalesce(lagged, F.lit(0)) * sw[k]
        sden = sden + F.when(lagged.isNull(), 0).otherwise(sw[k])
    w = b.select(
        "event_id", "user_id",
        fnum.cast("bigint").alias("fnum"), fden.cast("bigint").alias("fden"),
        snum.cast("bigint").alias("snum"), sden.cast("bigint").alias("sden"),
    )
    return w.select(
        "event_id", "user_id", "fnum", "fden", "snum", "sden",
        F.expr(
            "CAST(fnum AS DOUBLE) / CAST(fden AS DOUBLE) / 10000.0"
            " - CAST(snum AS DOUBLE) / CAST(sden AS DOUBLE) / 10000.0"
        ).alias("macd"),
    )


@q(
    "agg_decile_lift",
    """WITH spend AS (
         SELECT o_custkey,
                CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,4)) * 10000
                              AS BIGINT)) AS BIGINT) AS cents
         FROM orders GROUP BY o_custkey),
       dec AS (
         SELECT o_custkey, cents,
                NTILE(10) OVER (ORDER BY cents DESC, o_custkey) AS decile
         FROM spend),
       g AS (
         SELECT decile, COUNT(*) AS n_customers, SUM(cents) AS rev_c
         FROM dec GROUP BY decile),
       c AS (
         SELECT decile, n_customers, rev_c,
                SUM(rev_c) OVER (ORDER BY decile
                                 ROWS UNBOUNDED PRECEDING) AS cum_c,
                SUM(rev_c) OVER () AS tot_c
         FROM g)
       SELECT CAST(decile AS BIGINT) AS decile,
              CAST(n_customers AS BIGINT) AS n_customers,
              CAST(rev_c AS BIGINT) AS rev_c,
              CAST((1000000 * CAST(cum_c AS HUGEINT))
                   // CAST(tot_c AS HUGEINT) AS BIGINT) AS cum_share_ppm,
              CAST((10000000 * CAST(rev_c AS HUGEINT))
                   // CAST(tot_c AS HUGEINT) AS BIGINT) AS lift_ppm
       FROM c""",
)
def agg_decile_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D+ decile lift table: customers ranked by total spend, cut into 10
    equal-count buckets; per decile the revenue share, cumulative share,
    and lift vs a uniform decile (1e6 = average) — the campaign-targeting
    / whale-concentration readout next to agg_abc_class's ABC cut and
    agg_hhi's concentration index. Exact: spend in fixed-point cents,
    NTILE ties broken by custkey, ppm floors. The NTILE window is global
    but runs over the CUSTOMER-dimension aggregate (one row per customer,
    dimension-sized by construction — whitelisted one-task shape, same
    argument as agg_abc_class); the cumulative/total windows run over the
    10-row decile table."""
    o = read_table(spark, sf_dir, "orders")
    spend = o.groupBy("o_custkey").agg(
        F.sum(F.expr("CAST(CAST(o_totalprice AS DECIMAL(18,4)) * 10000 AS BIGINT)"))
        .cast("bigint")
        .alias("cents")
    )
    dec_w = Window.orderBy(F.col("cents").desc(), "o_custkey")
    dec = spend.withColumn("decile", F.ntile(10).over(dec_w))
    g = dec.groupBy("decile").agg(
        F.count(F.lit(1)).alias("n_customers"), F.sum("cents").alias("rev_c")
    )
    cum_w = Window.orderBy("decile").rowsBetween(Window.unboundedPreceding, 0)
    tot_w = Window.partitionBy()
    c = g.select(
        "decile", "n_customers", "rev_c",
        F.sum("rev_c").over(cum_w).alias("cum_c"),
        F.sum("rev_c").over(tot_w).alias("tot_c"),
    )
    return c.select(
        F.col("decile").cast("bigint").alias("decile"),
        F.col("n_customers").cast("bigint").alias("n_customers"),
        F.col("rev_c").cast("bigint").alias("rev_c"),
        F.expr(
            "CAST((1000000 * CAST(cum_c AS DECIMAL(38,0)))"
            " DIV CAST(tot_c AS DECIMAL(38,0)) AS BIGINT)"
        ).alias("cum_share_ppm"),
        F.expr(
            "CAST((10000000 * CAST(rev_c AS DECIMAL(38,0)))"
            " DIV CAST(tot_c AS DECIMAL(38,0)) AS BIGINT)"
        ).alias("lift_ppm"),
    )


@q(
    "text_winnowing",
    """WITH words AS (
         SELECT doc_id, string_split(trim(text), ' ') AS w FROM documents),
       grams AS (
         SELECT doc_id,
                unnest(range(1, greatest(len(w) - 1, 1))) AS i, w
         FROM words),
       h AS (
         SELECT doc_id, i,
                CAST('0x' || substr(md5(w[i] || ' ' || w[i + 1] || ' '
                                        || w[i + 2]), 1, 10) AS BIGINT)
                  * 65536 + (65535 - i % 65536) AS combined
         FROM grams),
       win AS (
         SELECT doc_id,
                MIN(combined) OVER w AS fp,
                COUNT(*) OVER w AS nn
         FROM h
         WINDOW w AS (PARTITION BY doc_id ORDER BY i
                      ROWS BETWEEN 3 PRECEDING AND CURRENT ROW))
       SELECT doc_id,
              CAST(COUNT(*) AS BIGINT) AS n_windows,
              CAST(COUNT(DISTINCT fp) AS BIGINT) AS n_fingerprints
       FROM win WHERE nn = 4 GROUP BY doc_id""",
)
def text_winnowing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K4+ winnowing fingerprints (Schleimer/Wilkerson/Aiken, the MOSS
    algorithm): hash every word 3-gram, slide a w=4 window, keep each
    window's minimal hash — guarantees any shared run of >= w+k-1 tokens
    between two documents shares a fingerprint, at ~2/(w+1) the density
    of full shingling. The local-copy detector that complements
    dedup_minhash's global similarity. Rightmost-tie robustness is packed
    INTO the min: combined = hash*2^16 + (2^16-1 - i mod 2^16), so the
    minimum simultaneously selects the smallest 40-bit hash and, on hash
    ties, the rightmost position — one MIN instead of an order-sensitive
    argmin (identical semantics both engines; docs beyond 65536 grams
    recycle tie-break positions — deterministic either way). Plan:
    explode to grams (map-side), one per-doc window sort, one grouped
    agg; everything partitions on doc_id, unskewed."""
    d = read_table(spark, sf_dir, "documents")
    words = d.select("doc_id", F.split(F.trim(F.col("text")), " ").alias("w"))
    grams = words.select(
        "doc_id",
        F.explode(
            F.expr(
                "CASE WHEN size(w) >= 3 THEN sequence(1, size(w) - 2)"
                " ELSE CAST(array() AS ARRAY<INT>) END"
            )
        ).alias("i"),
        "w",
    )
    h = grams.select(
        "doc_id", "i",
        F.expr(
            "CAST(conv(substring(md5(concat(element_at(w, i), ' ',"
            " element_at(w, i + 1), ' ', element_at(w, i + 2))), 1, 10), 16, 10)"
            " AS BIGINT) * 65536 + (65535 - i % 65536)"
        ).alias("combined"),
    )
    w = Window.partitionBy("doc_id").orderBy("i").rowsBetween(-3, Window.currentRow)
    win = h.select(
        "doc_id",
        F.min("combined").over(w).alias("fp"),
        F.count(F.lit(1)).over(w).alias("nn"),
    )
    return (
        win.filter(F.col("nn") == 4)
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_windows"),
            F.countDistinct("fp").cast("bigint").alias("n_fingerprints"),
        )
    )


# =====================================================================
# Driver-visible ordering
# =====================================================================
# The correctness driver oracle-checks only the FIRST 50 registered keys
# (insertion order; CORRECTNESS_r01..r06 are each exactly
# list(REGISTRY)[:50]). Rounds 1-6 green-lit 264 distinct keys, so round
# 7 ROTATES the window again: all 50 slots are oracle-twinned keys the
# driver has NEVER sampled (rows-only keys stay out so every driver row
# is a full hash check). Everything else keeps its relative order after
# slot 50 and is still verified by tools/check_oracle.py (all keys,
# every round). tools/check_rotation.py asserts the window has zero
# overlap with the union of prior CORRECTNESS PASSES (erred rows don't
# count as certified), except keys listed in _DRIVER_RECERT whose prior
# hashes are stale and need one re-certification pass.

# LIVE round-7 window (promoted from the R7 staging list at round-7
# open, per VERDICT r6 item 1): statistics + physical-design keys named
# in VERDICT r5 first, then the round-5 late adds, genomics, LLM-data,
# stats, graph, calendar, and streaming breadth.
_DRIVER_PRIORITY = [
    # VERDICT-named statistics + physical design
    "agg_auc", "agg_cramers_v", "agg_bootstrap",
    "agg_bucketed_noshuffle", "sim_ivf_scaled",
    # round-5 late adds never staged
    "dedup_incremental", "dedup_cluster_stats", "agg_geo_rollup",
    "join_asof_tolerance", "qa_expectations", "text_tokenizer_fertility",
    "agg_backlog_aging",
    # genomics / interval breadth
    "freq_sample_qc", "freq_hwe", "freq_fst", "freq_popmax",
    "freq_split_multiallelic", "merge_snapshot_diff", "interval_liftover",
    "interval_atomize", "join_interval_coverage", "join_interval_weight",
    # LLM-data / text / embedding
    "text_sft_pack", "text_chunk_rag", "text_boilerplate_strip",
    "text_winnowing", "text_zipf", "text_rake", "text_collocations",
    "text_burstiness", "pack_epoch_plan", "sample_importance_ht",
    "emb_prefix_recall", "emb_label_outliers",
    # statistics / QA
    "agg_calibration_bins", "agg_winsorized_mean", "agg_rate_wilson",
    "agg_cuped", "agg_ab_srm", "agg_power_analysis", "qa_drift_tvd",
    "agg_simpson", "agg_survival",
    # graph
    "graph_bfs", "graph_hits", "graph_modularity", "graph_butterflies",
    # calendar + streaming
    "date_business_days", "date_fiscal_445", "stream_wtopk",
]

# Keys whose r1–r4 driver hashes are STALE: the r5 synthetic-coordinate
# rewrite (% 100000 wrap removal, commit b6de946) and the r6 F_ROH
# data-derived span changed their outputs after certification.
# Spark/DuckDB parity was never broken (both twins changed together;
# every full sweep since is EXACT), but the hard driver row predates the
# semantics, so these 15 are allowed back into a driver window ONCE for
# re-certification. tools/check_rotation.py excludes them from its
# overlap failure while they remain listed here; remove each key after
# its fresh driver row lands (R8).
_DRIVER_RECERT = [
    "join_interval", "freq_variant", "freq_selected", "freq_keys",
    "freq_annotate", "freq_zygosity", "join_nearest", "agg_coverage",
    "rollup_incremental", "sort_zorder", "join_recip_overlap",
    "interval_merge", "interval_complement", "freq_trio_mendel",
    "freq_roh",
]

# Staged round-8 window (refreshed at round-7 close): the round-6 and
# round-7 additions (17) + 18 older never-sampled breadth keys + the 15
# _DRIVER_RECERT keys = 50. The remaining ~20 never-sampled breadth
# keys (win_rsi, win_stochastic, agg_peak_concurrency, qa_freshness, …)
# form R9. Promote to _DRIVER_PRIORITY at round-8 open.
_DRIVER_PRIORITY_R8 = [
    # round-6 additions
    "sim_pq_codes", "sim_pq_adc_topk", "freq_pgs_score", "freq_sex_check",
    "agg_k_anonymity", "store_compaction_plan",
    # round-7 additions
    "sim_ivfpq", "emb_semantic_dedup", "dedup_substring_spans",
    "store_zone_map_skip", "freq_denovo", "freq_compound_het",
    "agg_event_transitions", "store_table_stats", "agg_mad_outliers",
    "freq_ibs_pairs", "win_bollinger_breach", "agg_exact_percentiles",
    "sim_recall_eval", "text_bpe_pair_counts", "dedup_recall_eval",
    # older never-sampled breadth
    "graph_assortativity", "win_macd", "agg_decile_lift",
    "win_seasonal_decompose", "agg_distinct_growth", "agg_forecast_mase",
    "agg_target_encode", "win_interpolate", "agg_growth_accounting",
    "join_grid_knn", "graph_markov_stationary", "agg_retention_dn",
    "stream_watermark_audit", "agg_ltv_curve",
    # re-certification set (_DRIVER_RECERT)
    "join_interval", "freq_variant", "freq_selected", "freq_keys",
    "freq_annotate", "freq_zygosity", "join_nearest", "agg_coverage",
    "rollup_incremental", "sort_zorder", "join_recip_overlap",
    "interval_merge", "interval_complement", "freq_trio_mendel",
    "freq_roh",
]

# Staged round-9 window (computed at round-7 continuation close): every
# remaining never-driver-sampled oracle-twinned key after R7+R8 land —
# the pre-r7 breadth tail (TA windows, ops/QA, physical design), the
# round-7 continuation batches (A–E), and the round-7 batch-F/G
# additions. 48 keys; 2 slots free for round-8 additions. The 6
# rows-only keys (udf_grouped_map, agg_approx_cd, agg_approx_pct,
# multimodal_features, udtf_sentences, text_compress_ratio) stay out of
# every window by design. Promote at round-9 open.
_DRIVER_PRIORITY_R9 = [
    # pre-r7 breadth tail
    "win_rsi", "win_stochastic", "agg_price_index", "graph_paths3",
    "agg_standardize", "sql_api3", "agg_peak_concurrency",
    "qa_column_diversity", "join_pit_scd2", "win_rolling_slope",
    "agg_skyline", "agg_chainladder", "agg_recency_score",
    "join_absence_sla", "graph_degree_ccdf",
    "agg_session_gap_sensitivity", "qa_freshness",
    # round-7 continuation batches A-E
    "agg_kmv_intersect", "agg_l_diversity", "qa_candidate_keys",
    "scan_dpp", "text_anneal_plan", "emb_knn_classify",
    "store_vacuum_plan", "text_vocab_growth", "agg_gk_tau",
    "text_softdedup_weights", "emb_kcenter_coreset",
    "store_partition_skew", "store_cluster_advisor", "text_domain_score",
    "sim_hamming_topk", "agg_diff_in_diff", "agg_price_elasticity",
    "agg_shapley_attribution", "freq_tdt", "sample_group_kfold",
    "graph_conductance", "sim_hamming_recall", "win_atr",
    # round-7 batch F (FP&A bridge, FDR, physical design, fusion, TA)
    "agg_pvm_bridge", "agg_fdr_bh", "store_bloom_advisor",
    "sim_rrf_fusion", "win_adstock",
    # round-7 batch G (training-data mining, LM, retrieval diversity)
    "emb_hard_negatives", "text_kn_bigram", "sim_mmr_rerank",
    # round-7 batch H (fills the 2 spare slots)
    "graph_rich_club", "interval_coverage_gini",
]

# Round-10 overflow: never-sampled keys that did not fit R9's 50 slots.
# Grows as later batches land; promote (and top up from any new tail)
# at round-10 open.
_DRIVER_PRIORITY_R10 = [
    "text_bleu_pairs", "store_deletion_vectors",
]


@q(
    "agg_survival",
    """WITH lead AS (
         SELECT o.o_orderkey,
                date_diff('day', CAST(o.o_orderdate AS DATE),
                          CAST(MIN(l.l_shipdate) AS DATE)) AS lead_day
         FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
         GROUP BY o.o_orderkey, o.o_orderdate),
       ev AS (
         SELECT lead_day, CAST(COUNT(*) AS BIGINT) AS d
         FROM lead GROUP BY lead_day),
       tot AS (SELECT CAST(SUM(d) AS BIGINT) AS n FROM ev),
       rk AS (
         SELECT e.lead_day, e.d,
                t.n - COALESCE(SUM(e.d) OVER (ORDER BY e.lead_day
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                      0) AS n_risk
         FROM ev e CROSS JOIN tot t),
       hz AS (
         SELECT lead_day, d, n_risk,
                (1000000 * d) // n_risk AS hazard_ppm
         FROM rk)
       SELECT CAST(lead_day AS BIGINT) AS lead_day,
              CAST(n_risk AS BIGINT) AS n_risk,
              CAST(d AS BIGINT) AS n_events,
              CAST(hazard_ppm AS BIGINT) AS hazard_ppm,
              CAST(SUM(hazard_ppm) OVER (ORDER BY lead_day
                     ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_hazard_ppm
       FROM hz""",
)
def agg_survival(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D+ survival / time-to-event curve on order fulfilment: per
    lead-time day (order date to first shipment), the at-risk count,
    events, discrete hazard d/n ppm, and the Nelson-Aalen cumulative
    hazard — the retention-curve primitive (swap orders for users and
    shipment for churn). Exactness: hazard terms are integer-floored ppm
    BEFORE summation (floor-then-sum is the contract, documented here;
    the alternative sum-then-floor needs rational accumulation) — no
    float anywhere, so the curve is bit-stable. The classic KM survival
    PRODUCT is deliberately not emitted: exact cross-engine products
    need log-space floats (banned by the no-float-log rule);
    exp(-cum_hazard) is the standard recovery for readers. Plan: the
    order-grain lead-time agg shuffles once on orderkey; everything
    after runs on the DAY-grain table, bounded by the lead-time domain
    (~a few hundred rows at ANY sf — the global windows are one-task
    over that dimension-sized table, whitelisted in audit_plans)."""
    o = read_table(spark, sf_dir, "orders")
    li = read_table(spark, sf_dir, "lineitem")
    lead = (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("o_orderkey", "o_orderdate")
        .agg(F.min("l_shipdate").alias("first_ship"))
        .select(
            F.datediff(
                F.col("first_ship").cast("date"), F.col("o_orderdate").cast("date")
            ).alias("lead_day")
        )
    )
    ev = lead.groupBy("lead_day").agg(F.count(F.lit(1)).cast("bigint").alias("d"))
    tot = ev.agg(F.sum("d").cast("bigint").alias("n"))
    prior_w = Window.orderBy("lead_day").rowsBetween(
        Window.unboundedPreceding, -1
    )
    rk = ev.crossJoin(F.broadcast(tot)).select(
        "lead_day", "d",
        (F.col("n") - F.coalesce(F.sum("d").over(prior_w), F.lit(0))).alias(
            "n_risk"
        ),
    )
    hz = rk.withColumn("hazard_ppm", F.expr("(1000000 * d) DIV n_risk"))
    cum_w = Window.orderBy("lead_day").rowsBetween(Window.unboundedPreceding, 0)
    return hz.select(
        F.col("lead_day").cast("bigint").alias("lead_day"),
        F.col("n_risk").cast("bigint").alias("n_risk"),
        F.col("d").cast("bigint").alias("n_events"),
        F.col("hazard_ppm").cast("bigint").alias("hazard_ppm"),
        F.sum("hazard_ppm").over(cum_w).cast("bigint").alias("cum_hazard_ppm"),
    )


@q(
    "qa_drift_tvd",
    """WITH tagged AS (
         SELECT event_type,
                (date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) // 7) % 2
                  AS cohort
         FROM events),
       c AS (
         SELECT event_type,
                CAST(SUM(CASE WHEN cohort = 0 THEN 1 ELSE 0 END) AS BIGINT) AS c1,
                CAST(SUM(CASE WHEN cohort = 1 THEN 1 ELSE 0 END) AS BIGINT) AS c2
         FROM tagged GROUP BY event_type),
       n AS (
         SELECT CAST(SUM(c1) AS BIGINT) AS n1, CAST(SUM(c2) AS BIGINT) AS n2,
                CAST((1000000 * CAST(SUM(ABS(c1 * CAST(
                        (SELECT SUM(c2) FROM c) AS HUGEINT)
                        - c2 * CAST((SELECT SUM(c1) FROM c) AS HUGEINT)))
                      AS HUGEINT))
                     // (2 * CAST(SUM(c1) AS HUGEINT) * CAST(SUM(c2) AS HUGEINT))
                     AS BIGINT) AS tvd_ppm
         FROM c)
       SELECT c.event_type, c.c1, c.c2, n.n1, n.n2,
              CAST((1000000 * ABS(c.c1 * CAST(n.n2 AS HUGEINT)
                                  - c.c2 * CAST(n.n1 AS HUGEINT)))
                   // (CAST(n.n1 AS HUGEINT) * CAST(n.n2 AS HUGEINT))
                   AS BIGINT) AS delta_ppm,
              n.tvd_ppm
       FROM c CROSS JOIN n""",
)
def qa_drift_tvd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """QA+ distribution-drift monitor: total-variation distance between
    the event-type mix of even vs odd epoch-weeks (the canonical "did
    this week's data shift vs last week's" gate before a training run).
    TVD chosen over PSI/KL deliberately: those need log (banned —
    engines' libm differ); TVD = ½·Σ|p−q| is a pure RATIONAL of counts,
    so cross-multiplied int128/DECIMAL(38,0) arithmetic makes both the
    per-type delta and the total exact at any sf (c·n products pass
    int64 around sf≈1e3; HUGEINT/DECIMAL carry to 1e38). Output: one row
    per event type with its ppm contribution plus the corpus TVD
    replicated — the 1-row totals side is a broadcast scalar (BNLJ
    whitelist pattern). Plan: one scan, one k-types-row agg, map-side
    partials; the cohort tag is a pure projection so pruning and
    pushdown survive."""
    ev = read_table(spark, sf_dir, "events")
    tagged = ev.select(
        "event_type",
        F.expr(
            "(datediff(CAST(ts AS DATE), DATE'1970-01-01') DIV 7) % 2"
        ).alias("cohort"),
    )
    c = tagged.groupBy("event_type").agg(
        F.sum(F.when(F.col("cohort") == 0, 1).otherwise(0))
        .cast("bigint")
        .alias("c1"),
        F.sum(F.when(F.col("cohort") == 1, 1).otherwise(0))
        .cast("bigint")
        .alias("c2"),
    )
    nrow = c.agg(
        F.sum("c1").cast("bigint").alias("n1"),
        F.sum("c2").cast("bigint").alias("n2"),
    )
    with_delta = c.crossJoin(F.broadcast(nrow)).withColumn(
        "delta_ppm",
        F.expr(
            "CAST((1000000 * ABS(CAST(c1 AS DECIMAL(38,0))"
            " * CAST(n2 AS DECIMAL(38,0))"
            " - CAST(c2 AS DECIMAL(38,0)) * CAST(n1 AS DECIMAL(38,0))))"
            " DIV (CAST(n1 AS DECIMAL(38,0)) * CAST(n2 AS DECIMAL(38,0)))"
            " AS BIGINT)"
        ),
    )
    tvd = with_delta.agg(
        F.expr(
            "CAST((1000000 * CAST(SUM(ABS(CAST(c1 AS DECIMAL(38,0))"
            " * CAST(n2 AS DECIMAL(38,0))"
            " - CAST(c2 AS DECIMAL(38,0)) * CAST(n1 AS DECIMAL(38,0))))"
            " AS DECIMAL(38,0)))"
            " DIV (2 * CAST(MAX(n1) AS DECIMAL(38,0))"
            " * CAST(MAX(n2) AS DECIMAL(38,0))) AS BIGINT)"
        ).alias("tvd_ppm")
    )
    return with_delta.crossJoin(F.broadcast(tvd)).select(
        "event_type", "c1", "c2", "n1", "n2", "delta_ppm", "tvd_ppm"
    )




@q(
    "text_rake",
    """WITH norm AS (
         SELECT doc_id,
                string_split(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'),
                             ' ') AS w
         FROM documents),
       tok AS (
         SELECT doc_id, i, w[i] AS t
         FROM (SELECT doc_id, unnest(range(1, len(w) + 1)) AS i, w FROM norm)
         WHERE w[i] <> ''),
       kw AS (
         SELECT doc_id, i, t,
                i - ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY i) AS grp
         FROM tok
         WHERE t NOT IN ('the','a','an','of','and','or','in','on','to','is',
                         'are','was','for','with','as','by','at','it','this',
                         'that','be','from')),
       island AS (
         SELECT doc_id, grp, COUNT(*) AS plen,
                string_agg(t, ' ' ORDER BY i) AS phrase
         FROM kw GROUP BY doc_id, grp),
       member AS (
         SELECT k.doc_id, k.grp, k.t, s.plen, s.phrase
         FROM kw k JOIN island s ON s.doc_id = k.doc_id AND s.grp = k.grp
         WHERE s.plen <= 4),
       word AS (
         SELECT t, CAST(COUNT(*) AS BIGINT) AS freq,
                CAST(SUM(plen) AS BIGINT) AS degree,
                (1000000 * CAST(SUM(plen) AS BIGINT)) // COUNT(*) AS score_ppm
         FROM member GROUP BY t),
       iscore AS (
         SELECT m.doc_id, m.grp, m.phrase,
                CAST(SUM(w.score_ppm) AS BIGINT) AS s
         FROM member m JOIN word w ON w.t = m.t
         GROUP BY m.doc_id, m.grp, m.phrase)
       SELECT phrase, CAST(COUNT(*) AS BIGINT) AS n_occ,
              CAST(MIN(s) AS BIGINT) AS score_ppm
       FROM iscore GROUP BY phrase
       ORDER BY score_ppm DESC, phrase LIMIT 50""",
)
def text_rake(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K4+ RAKE keyword extraction (Rose et al. 2010, public): candidate
    phrases are maximal stopword-free token runs (gaps-and-islands on
    token position — pos minus dense row number, pure integer window
    math); word score = co-occurrence degree / frequency as an exact
    ppm ratio; phrase score = Σ member-word scores. Top-50 phrases by
    score. Every score is integer (counts and floored ratios), so both
    engines agree bit-for-bit — no tf-idf-style float log. Islands are
    capped at 4 tokens (standard RAKE practice; also bounds the
    string_agg). Plan: token explode is map-side; the two shuffles are
    the (doc,island) group and the corpus word table; phrase dedup
    reuses the island group keys; final top-50 is a TakeOrdered, no
    global window. 100 TB: the word table is vocabulary-sized, islands
    are document-local — both shuffle keys are well-distributed."""
    docs = read_table(spark, sf_dir, "documents")
    tok = (
        docs.select(
            "doc_id",
            F.posexplode(
                F.split(
                    F.regexp_replace(F.lower("text"), "[^a-z0-9 ]", " "), " "
                )
            ).alias("i0", "t"),
        )
        .filter(F.col("t") != "")
        .select("doc_id", (F.col("i0") + 1).alias("i"), "t")
    )
    stops = [
        "the", "a", "an", "of", "and", "or", "in", "on", "to", "is",
        "are", "was", "for", "with", "as", "by", "at", "it", "this",
        "that", "be", "from",
    ]
    isl_w = Window.partitionBy("doc_id").orderBy("i")
    kw = tok.filter(~F.col("t").isin(stops)).withColumn(
        "grp", F.col("i") - F.row_number().over(isl_w)
    )
    island = kw.groupBy("doc_id", "grp").agg(
        F.count(F.lit(1)).alias("plen"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("i", "t"))),
                lambda s: s["t"],
            ),
            " ",
        ).alias("phrase"),
    )
    member = kw.join(island.filter(F.col("plen") <= 4), ["doc_id", "grp"])
    word = member.groupBy("t").agg(
        F.count(F.lit(1)).cast("bigint").alias("freq"),
        F.sum("plen").cast("bigint").alias("degree"),
    ).withColumn("score_ppm", F.expr("(1000000 * degree) DIV freq"))
    iscore = member.join(word.select("t", "score_ppm"), "t").groupBy(
        "doc_id", "grp", "phrase"
    ).agg(F.sum("score_ppm").cast("bigint").alias("s"))
    return (
        iscore.groupBy("phrase")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_occ"),
            F.min("s").cast("bigint").alias("score_ppm"),
        )
        .orderBy(F.col("score_ppm").desc(), "phrase")
        .limit(50)
    )


@q(
    "agg_bootstrap",
    """WITH keyed AS (
         SELECT l_orderkey * 8 + l_linenumber AS rk,
                CAST(CAST(l_quantity AS DECIMAL(18,4)) * 10000 AS BIGINT) AS qc
         FROM lineitem),
       grp AS (
         SELECT rk, qc, g,
                md5(CAST(rk AS VARCHAR) || ':' || CAST(g AS VARCHAR)) AS h
         FROM keyed, unnest(range(0, 6)) AS t(g)),
       xs AS (
         SELECT qc, g,
                CAST('0x' || substr(h, 1, 15) AS BIGINT) AS x1,
                CAST('0x' || substr(h, 16, 15) AS BIGINT) AS x2
         FROM grp),
       wts AS (
         SELECT qc, g,
                CASE WHEN x1 % 1048576 < 385749 THEN 0 WHEN x1 % 1048576 < 771499 THEN 1 WHEN x1 % 1048576 < 964373 THEN 2 WHEN x1 % 1048576 < 1028665 THEN 3 WHEN x1 % 1048576 < 1044738 THEN 4 WHEN x1 % 1048576 < 1047952 THEN 5 WHEN x1 % 1048576 < 1048488 THEN 6 WHEN x1 % 1048576 < 1048565 THEN 7 WHEN x1 % 1048576 < 1048574 THEN 8 ELSE 9 END AS wt0,
                CASE WHEN (x1 // 1048576) % 1048576 < 385749 THEN 0 WHEN (x1 // 1048576) % 1048576 < 771499 THEN 1 WHEN (x1 // 1048576) % 1048576 < 964373 THEN 2 WHEN (x1 // 1048576) % 1048576 < 1028665 THEN 3 WHEN (x1 // 1048576) % 1048576 < 1044738 THEN 4 WHEN (x1 // 1048576) % 1048576 < 1047952 THEN 5 WHEN (x1 // 1048576) % 1048576 < 1048488 THEN 6 WHEN (x1 // 1048576) % 1048576 < 1048565 THEN 7 WHEN (x1 // 1048576) % 1048576 < 1048574 THEN 8 ELSE 9 END AS wt1,
                CASE WHEN x1 // 1099511627776 < 385749 THEN 0 WHEN x1 // 1099511627776 < 771499 THEN 1 WHEN x1 // 1099511627776 < 964373 THEN 2 WHEN x1 // 1099511627776 < 1028665 THEN 3 WHEN x1 // 1099511627776 < 1044738 THEN 4 WHEN x1 // 1099511627776 < 1047952 THEN 5 WHEN x1 // 1099511627776 < 1048488 THEN 6 WHEN x1 // 1099511627776 < 1048565 THEN 7 WHEN x1 // 1099511627776 < 1048574 THEN 8 ELSE 9 END AS wt2,
                CASE WHEN x2 % 1048576 < 385749 THEN 0 WHEN x2 % 1048576 < 771499 THEN 1 WHEN x2 % 1048576 < 964373 THEN 2 WHEN x2 % 1048576 < 1028665 THEN 3 WHEN x2 % 1048576 < 1044738 THEN 4 WHEN x2 % 1048576 < 1047952 THEN 5 WHEN x2 % 1048576 < 1048488 THEN 6 WHEN x2 % 1048576 < 1048565 THEN 7 WHEN x2 % 1048576 < 1048574 THEN 8 ELSE 9 END AS wt3,
                CASE WHEN (x2 // 1048576) % 1048576 < 385749 THEN 0 WHEN (x2 // 1048576) % 1048576 < 771499 THEN 1 WHEN (x2 // 1048576) % 1048576 < 964373 THEN 2 WHEN (x2 // 1048576) % 1048576 < 1028665 THEN 3 WHEN (x2 // 1048576) % 1048576 < 1044738 THEN 4 WHEN (x2 // 1048576) % 1048576 < 1047952 THEN 5 WHEN (x2 // 1048576) % 1048576 < 1048488 THEN 6 WHEN (x2 // 1048576) % 1048576 < 1048565 THEN 7 WHEN (x2 // 1048576) % 1048576 < 1048574 THEN 8 ELSE 9 END AS wt4,
                CASE WHEN x2 // 1099511627776 < 385749 THEN 0 WHEN x2 // 1099511627776 < 771499 THEN 1 WHEN x2 // 1099511627776 < 964373 THEN 2 WHEN x2 // 1099511627776 < 1028665 THEN 3 WHEN x2 // 1099511627776 < 1044738 THEN 4 WHEN x2 // 1099511627776 < 1047952 THEN 5 WHEN x2 // 1099511627776 < 1048488 THEN 6 WHEN x2 // 1099511627776 < 1048565 THEN 7 WHEN x2 // 1099511627776 < 1048574 THEN 8 ELSE 9 END AS wt5
         FROM xs),
       agg AS (
         SELECT g,
                CAST(SUM(wt0) AS BIGINT) AS n0,
                CAST(SUM(wt0 * qc) AS BIGINT) AS s0,
                CAST(SUM(wt1) AS BIGINT) AS n1,
                CAST(SUM(wt1 * qc) AS BIGINT) AS s1,
                CAST(SUM(wt2) AS BIGINT) AS n2,
                CAST(SUM(wt2 * qc) AS BIGINT) AS s2,
                CAST(SUM(wt3) AS BIGINT) AS n3,
                CAST(SUM(wt3 * qc) AS BIGINT) AS s3,
                CAST(SUM(wt4) AS BIGINT) AS n4,
                CAST(SUM(wt4 * qc) AS BIGINT) AS s4,
                CAST(SUM(wt5) AS BIGINT) AS n5,
                CAST(SUM(wt5 * qc) AS BIGINT) AS s5
         FROM wts GROUP BY g),
       flat AS (
         SELECT 6 * g + j AS b,
                CASE j WHEN 0 THEN n0 WHEN 1 THEN n1 WHEN 2 THEN n2
                       WHEN 3 THEN n3 WHEN 4 THEN n4 ELSE n5 END AS n_eff,
                CASE j WHEN 0 THEN s0 WHEN 1 THEN s1 WHEN 2 THEN s2
                       WHEN 3 THEN s3 WHEN 4 THEN s4 ELSE s5 END AS s
         FROM agg, unnest(range(0, 6)) AS u(j)
         WHERE 6 * g + j < 32)
       SELECT CAST(b AS BIGINT) AS replicate,
              CAST(n_eff AS BIGINT) AS n_eff,
              CAST(s AS DOUBLE) / 10000.0 / n_eff AS mean_qty
       FROM flat""",
)
def agg_bootstrap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D+ Poissonized bootstrap: 32 deterministic resampling replicates
    of mean(l_quantity) for uncertainty bands without collecting data —
    the scalable bootstrap (each row's replicate-b multiplicity is an
    independent-ish Poisson(1) draw, the standard streaming-bootstrap
    trick). Entropy layout and expression shape are perf-critical,
    measured at sf0.1: one md5 per (row, replicate) = 23.7 s; one md5
    per sextet but six conv() calls + decimal sums = 16.6 s; this form =
    ~7 s — TWO conv() calls per digest (15 hex chars each, bit-sliced
    into three 20-bit draws with integer DIV/%), weights evaluated as
    SIX COLUMNS, quantity pre-scaled to BIGINT cents so all 12
    aggregates are long sums, and the per-replicate reshape explodes
    only the 6-ROW aggregate. Draws map through the Poisson(1) CDF
    quantized to exact /2^20 thresholds (integer compares, no modulo
    bias) — both engines sample IDENTICAL weights; the one float op is
    the final mean. Plan: one 6x map-side fan-out, partial aggregation
    to 6 rows per partition, a 6-key shuffle, constant-sized reshape.
    Row key l_orderkey*8+l_linenumber is unique (linenumber <= 7)."""
    li = read_table(spark, sf_dir, "lineitem")
    keyed = li.select(
        (F.col("l_orderkey") * 8 + F.col("l_linenumber")).alias("rk"),
        F.expr(
            "CAST(CAST(l_quantity AS DECIMAL(18,4)) * 10000 AS BIGINT)"
        ).alias("qc"),
    )
    grp = keyed.select(
        "qc", "rk", F.explode(F.sequence(F.lit(0), F.lit(5))).alias("g")
    ).withColumn(
        "h",
        F.md5(
            F.expr(
                "CAST(CAST(rk AS STRING) || ':' || CAST(g AS STRING)"
                " AS BINARY)"
            )
        ),
    )
    xs = grp.select(
        "qc", "g",
        F.expr("CAST(conv(substring(h, 1, 15), 16, 10) AS BIGINT)").alias("x1"),
        F.expr("CAST(conv(substring(h, 16, 15), 16, 10) AS BIGINT)").alias("x2"),
    )
    spark_u = [
        "x1 % 1048576",
        "(x1 DIV 1048576) % 1048576",
        "x1 DIV 1099511627776",
        "x2 % 1048576",
        "(x2 DIV 1048576) % 1048576",
        "x2 DIV 1099511627776",
    ]

    def wt(u: str) -> str:
        return (
            f"CASE WHEN {u} < 385749 THEN 0 WHEN {u} < 771499 THEN 1"
            f" WHEN {u} < 964373 THEN 2 WHEN {u} < 1028665 THEN 3"
            f" WHEN {u} < 1044738 THEN 4 WHEN {u} < 1047952 THEN 5"
            f" WHEN {u} < 1048488 THEN 6 WHEN {u} < 1048565 THEN 7"
            f" WHEN {u} < 1048574 THEN 8 ELSE 9 END"
        )

    wts = xs.select(
        "qc", "g",
        *[F.expr(wt(u)).alias(f"wt{j}") for j, u in enumerate(spark_u)],
    )
    agg = wts.groupBy("g").agg(
        *[
            a
            for j in range(6)
            for a in (
                F.sum(f"wt{j}").cast("bigint").alias(f"n{j}"),
                F.sum(F.col(f"wt{j}") * F.col("qc"))
                .cast("bigint")
                .alias(f"s{j}"),
            )
        ]
    )
    flat = (
        agg.select(
            "*", F.explode(F.sequence(F.lit(0), F.lit(5))).alias("j")
        )
        .filter(F.expr("6 * g + j < 32"))
        .select(
            F.expr("6 * g + j").alias("b"),
            F.expr(
                "CASE j WHEN 0 THEN n0 WHEN 1 THEN n1 WHEN 2 THEN n2"
                " WHEN 3 THEN n3 WHEN 4 THEN n4 ELSE n5 END"
            ).alias("n_eff"),
            F.expr(
                "CASE j WHEN 0 THEN s0 WHEN 1 THEN s1 WHEN 2 THEN s2"
                " WHEN 3 THEN s3 WHEN 4 THEN s4 ELSE s5 END"
            ).alias("s"),
        )
    )
    return flat.select(
        F.col("b").cast("bigint").alias("replicate"),
        F.col("n_eff").cast("bigint").alias("n_eff"),
        (F.col("s").cast("double") / 10000.0 / F.col("n_eff")).alias(
            "mean_qty"
        ),
    )

@q(
    "dedup_binary_chunks",
    """WITH b AS (
         SELECT doc_id, hex(CAST(text AS BLOB)) AS h FROM documents
         WHERE octet_length(CAST(text AS BLOB)) >= 16),
       chunks AS (
         SELECT DISTINCT doc_id, substr(h, 1 + 32 * i, 32) AS c
         FROM (SELECT doc_id, h,
                      unnest(range(0, CAST(length(h) // 32 AS BIGINT))) AS i
               FROM b)),
       per_doc AS (
         SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_chunks
         FROM chunks GROUP BY doc_id),
       shared AS (
         SELECT c FROM chunks GROUP BY c
         HAVING COUNT(*) BETWEEN 2 AND 64),
       pairs AS (
         SELECT x.doc_id AS item_a, y.doc_id AS item_b,
                CAST(COUNT(*) AS BIGINT) AS shared_chunks
         FROM chunks x
         JOIN shared s ON s.c = x.c
         JOIN chunks y ON y.c = x.c AND y.doc_id > x.doc_id
         GROUP BY x.doc_id, y.doc_id)
       SELECT p.item_a, p.item_b, p.shared_chunks,
              da.n_chunks AS chunks_a, db.n_chunks AS chunks_b,
              (1000000 * p.shared_chunks)
                // least(da.n_chunks, db.n_chunks) AS containment_ppm
       FROM pairs p
       JOIN per_doc da ON da.doc_id = p.item_a
       JOIN per_doc db ON db.doc_id = p.item_b""",
)
def dedup_binary_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K5+ chunk-level binary dedup (CDC-style, fixed 16-byte aligned
    chunks): the multimodal-blob analogue of shingle dedup — two items
    sharing raw byte chunks are storage-dup or partial-copy candidates
    even when whole-file digests differ (truncated uploads, re-muxed
    containers, concatenated shards). Operates on the same deterministic
    text-bytes payloads as synthesize_blobs (sources/multimodal.py), so
    the DuckDB twin sees identical bytes; with real binaryFile blobs the
    pipeline is unchanged. Chunks are compared via their 32-hex-char
    identity (hex() is uppercase in BOTH engines, checked); chunks seen
    in >64 items are dropped as boilerplate (zero blocks, format
    headers) — the fan-out cap that keeps the pair join from exploding
    on a hot chunk at 100 TB. Plan: map-side chunk explode + DISTINCT,
    inverted-index self-join keyed on chunk (shuffle on a
    well-distributed 128-bit key), bounded pair output; containment ppm
    is exact integer floor division."""
    docs = read_table(spark, sf_dir, "documents")
    b = docs.select(
        "doc_id", F.hex(F.col("text").cast("binary")).alias("h")
    ).filter(F.length(F.col("text").cast("binary")) >= 16)
    chunks = (
        b.select(
            "doc_id",
            F.explode(
                F.expr("sequence(0, CAST(length(h) DIV 32 AS INT) - 1)")
            ).alias("i"),
            "h",
        )
        .select(
            "doc_id", F.expr("substring(h, 1 + 32 * i, 32)").alias("c")
        )
        .distinct()
    )
    per_doc = chunks.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_chunks")
    )
    shared = (
        chunks.groupBy("c")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter((F.col("cnt") >= 2) & (F.col("cnt") <= 64))
        .select("c")
    )
    x = chunks.join(shared, "c")
    y = chunks.withColumnRenamed("doc_id", "doc_b")
    pairs = (
        x.join(y, "c")
        .filter(F.col("doc_b") > F.col("doc_id"))
        .groupBy(
            F.col("doc_id").alias("item_a"), F.col("doc_b").alias("item_b")
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("shared_chunks"))
    )
    da = per_doc.select(
        F.col("doc_id").alias("item_a"), F.col("n_chunks").alias("chunks_a")
    )
    db_ = per_doc.select(
        F.col("doc_id").alias("item_b"), F.col("n_chunks").alias("chunks_b")
    )
    return (
        pairs.join(da, "item_a")
        .join(db_, "item_b")
        .select(
            "item_a", "item_b", "shared_chunks", "chunks_a", "chunks_b",
            F.expr(
                "(1000000 * shared_chunks) DIV least(chunks_a, chunks_b)"
            ).alias("containment_ppm"),
        )
    )



@q(
    "freq_hwe",
    """WITH gt AS (
         SELECT l_partkey AS site_id,
                CASE WHEN l_orderkey % 3 = 0 THEN 2
                     WHEN l_orderkey % 3 = 1 THEN 1 ELSE 0 END AS n_ref
         FROM lineitem),
       cnt AS (
         SELECT site_id,
                CAST(COUNT(*) AS BIGINT) AS n,
                CAST(SUM(CASE WHEN n_ref = 2 THEN 1 ELSE 0 END) AS BIGINT)
                  AS n_hom_ref,
                CAST(SUM(CASE WHEN n_ref = 1 THEN 1 ELSE 0 END) AS BIGINT)
                  AS n_het,
                CAST(SUM(CASE WHEN n_ref = 0 THEN 1 ELSE 0 END) AS BIGINT)
                  AS n_hom_alt
         FROM gt GROUP BY site_id),
       poly AS (
         SELECT site_id, n, n_hom_ref, n_het, n_hom_alt,
                2 * n_hom_ref + n_het AS x
         FROM cnt
         WHERE 2 * n_hom_ref + n_het > 0
           AND 2 * n_hom_ref + n_het < 2 * n),
       chi AS (
         SELECT site_id, n, n_hom_ref, n_het, n_hom_alt,
                (1000000 * (4 * CAST(n AS HUGEINT) * n_hom_ref
                            - CAST(x AS HUGEINT) * x)
                         * (4 * CAST(n AS HUGEINT) * n_hom_ref
                            - CAST(x AS HUGEINT) * x))
                  // (4 * CAST(n AS HUGEINT) * x * x)
                + (1000000 * (2 * CAST(n AS HUGEINT) * n_het
                              - CAST(x AS HUGEINT) * (2 * n - x))
                           * (2 * CAST(n AS HUGEINT) * n_het
                              - CAST(x AS HUGEINT) * (2 * n - x)))
                  // (2 * CAST(n AS HUGEINT) * x * (2 * n - x))
                + (1000000 * (4 * CAST(n AS HUGEINT) * n_hom_alt
                              - CAST(2 * n - x AS HUGEINT) * (2 * n - x))
                           * (4 * CAST(n AS HUGEINT) * n_hom_alt
                              - CAST(2 * n - x AS HUGEINT) * (2 * n - x)))
                  // (4 * CAST(n AS HUGEINT) * (2 * n - x) * (2 * n - x))
                  AS chi2_ppm
         FROM poly)
       SELECT site_id, n, n_hom_ref, n_het, n_hom_alt,
              CAST(chi2_ppm AS BIGINT) AS chi2_ppm,
              chi2_ppm >= 3841459 AS hwe_fail
       FROM chi""",
)
def freq_hwe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Varda-core Hardy-Weinberg equilibrium test per variant site: the
    population-genetics QC that flags genotyping artifacts (sites whose
    hom/het mix is impossible under random mating — batch effects,
    alignment errors, CNVs masquerading as SNVs). chi² with 1 df against
    expected p², 2pq, q² where p is the REF allele frequency. Exactness:
    p = x/2n is kept RATIONAL — each (obs−exp)²/exp term is
    cross-multiplied to the integer identity (4n·oRR − x²)²/(4n·x²) etc.,
    so chi2_ppm is three floored non-negative integer divisions summed
    (floor-then-sum contract, same as agg_survival) in int128/DECIMAL —
    no float. hwe_fail is the 5% critical value 3.841459 as a ppm
    integer compare. Monomorphic sites (x=0 or x=2n) are excluded —
    HWE is undefined there. Genotypes are synthesized 1:1:1 from
    orderkey%3 (both engines identically). Plan: one grouped agg over
    the call matrix (site-keyed shuffle, map-side partials), then pure
    per-row integer math — site-count-sized output."""
    li = read_table(spark, sf_dir, "lineitem")
    gt = li.select(
        F.col("l_partkey").alias("site_id"),
        F.expr(
            "CASE WHEN l_orderkey % 3 = 0 THEN 2"
            " WHEN l_orderkey % 3 = 1 THEN 1 ELSE 0 END"
        ).alias("n_ref"),
    )
    cnt = gt.groupBy("site_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.when(F.col("n_ref") == 2, 1).otherwise(0))
        .cast("bigint")
        .alias("n_hom_ref"),
        F.sum(F.when(F.col("n_ref") == 1, 1).otherwise(0))
        .cast("bigint")
        .alias("n_het"),
        F.sum(F.when(F.col("n_ref") == 0, 1).otherwise(0))
        .cast("bigint")
        .alias("n_hom_alt"),
    )
    poly = cnt.withColumn("x", F.expr("2 * n_hom_ref + n_het")).filter(
        (F.col("x") > 0) & (F.col("x") < 2 * F.col("n"))
    )
    D = "DECIMAL(38,0)"
    t1 = (
        f"(1000000 * (4 * CAST(n AS {D}) * n_hom_ref - CAST(x AS {D}) * x)"
        f" * (4 * CAST(n AS {D}) * n_hom_ref - CAST(x AS {D}) * x))"
        f" DIV (4 * CAST(n AS {D}) * x * x)"
    )
    t2 = (
        f"(1000000 * (2 * CAST(n AS {D}) * n_het"
        f" - CAST(x AS {D}) * (2 * n - x))"
        f" * (2 * CAST(n AS {D}) * n_het - CAST(x AS {D}) * (2 * n - x)))"
        f" DIV (2 * CAST(n AS {D}) * x * (2 * n - x))"
    )
    t3 = (
        f"(1000000 * (4 * CAST(n AS {D}) * n_hom_alt"
        f" - CAST(2 * n - x AS {D}) * (2 * n - x))"
        f" * (4 * CAST(n AS {D}) * n_hom_alt"
        f" - CAST(2 * n - x AS {D}) * (2 * n - x)))"
        f" DIV (4 * CAST(n AS {D}) * (2 * n - x) * (2 * n - x))"
    )
    chi = poly.withColumn("chi2_ppm", F.expr(f"{t1} + {t2} + {t3}"))
    return chi.select(
        "site_id", "n", "n_hom_ref", "n_het", "n_hom_alt",
        F.col("chi2_ppm").cast("bigint").alias("chi2_ppm"),
        (F.col("chi2_ppm") >= 3841459).alias("hwe_fail"),
    )


@q(
    "graph_modularity",
    f"""WITH {_COORDER_EDGES_SQL},
       nodes AS (
         SELECT DISTINCT v FROM (
           SELECT pa AS v FROM e UNION ALL SELECT pb AS v FROM e)),
       adj AS (
         SELECT pa AS v, pb AS n FROM e
         UNION ALL SELECT pb AS v, pa AS n FROM e),
       l0 AS (SELECT v, v AS lab FROM nodes),
       r1 AS (
         SELECT v, lab FROM (
           SELECT a.v, l.lab, COUNT(*) AS c,
                  ROW_NUMBER() OVER (PARTITION BY a.v
                       ORDER BY COUNT(*) DESC, l.lab) AS rn
           FROM adj a JOIN l0 l ON l.v = a.n
           GROUP BY a.v, l.lab) WHERE rn = 1),
       r2 AS (
         SELECT v, lab FROM (
           SELECT a.v, l.lab, COUNT(*) AS c,
                  ROW_NUMBER() OVER (PARTITION BY a.v
                       ORDER BY COUNT(*) DESC, l.lab) AS rn
           FROM adj a JOIN r1 l ON l.v = a.n
           GROUP BY a.v, l.lab) WHERE rn = 1),
       m AS (SELECT CAST(COUNT(*) AS BIGINT) AS m FROM e),
       ein AS (
         SELECT la.lab AS community, CAST(COUNT(*) AS BIGINT) AS e_in
         FROM e JOIN r2 la ON la.v = e.pa
                JOIN r2 lb ON lb.v = e.pb
         WHERE la.lab = lb.lab GROUP BY la.lab),
       deg AS (
         SELECT l.lab AS community, CAST(COUNT(*) AS BIGINT) AS d_tot
         FROM adj a JOIN r2 l ON l.v = a.v GROUP BY l.lab),
       com AS (
         SELECT d.community, COALESCE(i.e_in, 0) AS e_in, d.d_tot
         FROM deg d LEFT JOIN ein i ON i.community = d.community)
       SELECT c.community, c.e_in, c.d_tot,
              CAST((1000000 * (4 * CAST(mm.m AS HUGEINT) * c.e_in
                               - CAST(c.d_tot AS HUGEINT) * c.d_tot
                               + 4 * CAST(mm.m AS HUGEINT) * mm.m))
                   // (4 * CAST(mm.m AS HUGEINT) * mm.m) AS BIGINT)
                - 1000000 AS q_ppm
       FROM com c CROSS JOIN m mm""",
)
def graph_modularity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Graph community QUALITY: Newman modularity contribution per
    label-propagation community — Q_c = e_c/m − (d_c/2m)², the standard
    "is this partition better than random" score (sum over communities
    = Q; Q>0.3 is conventionally 'real structure'). Runs the exact
    2-round synchronous LPA of graph_labelprop, then three |E|-bounded
    aggregates: intra-community edge counts, community degree sums, and
    one 1-row edge total. Exactness with SIGNED values: Spark DIV
    truncates toward zero while DuckDB // floors — they differ on
    negatives, so the ppm ratio is SHIFTED by +4m² (d_c ≤ 2m guarantees
    non-negativity), floored identically, then 1e6 is subtracted back —
    the negative-division parity trick, reusable wherever a signed
    rational needs flooring. int128/DECIMAL(38,0) interior (d_c² passes
    int64 near 3e9 edges). Plan: LPA rounds shuffle on |E|; scoring adds
    two broadcast-joinable label maps and a 1-row scalar (BNLJ
    whitelist)."""
    e = _coorder_edges(spark, sf_dir).localCheckpoint()
    # adj stays a projection over e's cached blocks — caching the doubled
    # adjacency too OOMs an 8 g heap at sf5 (the graph_conductance lesson)
    adj = e.select(F.col("pa").alias("v"), F.col("pb").alias("n")).unionAll(
        e.select(F.col("pb").alias("v"), F.col("pa").alias("n"))
    )
    labels = adj.select("v").distinct().select("v", F.col("v").alias("lab"))
    for _ in range(2):
        nb = adj.join(
            labels.select(F.col("v").alias("n"), "lab"), "n"
        ).groupBy("v", "lab").agg(F.count(F.lit(1)).alias("c"))
        w = Window.partitionBy("v").orderBy(F.desc("c"), F.asc("lab"))
        labels = (
            nb.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("v", "lab")
            .localCheckpoint()
        )
    m = e.agg(F.count(F.lit(1)).cast("bigint").alias("m"))
    la = labels.select(F.col("v").alias("pa"), F.col("lab").alias("lab_a"))
    lb = labels.select(F.col("v").alias("pb"), F.col("lab").alias("lab_b"))
    ein = (
        e.join(la, "pa")
        .join(lb, "pb")
        .filter(F.col("lab_a") == F.col("lab_b"))
        .groupBy(F.col("lab_a").alias("community"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("e_in"))
    )
    deg = (
        adj.join(labels, "v")
        .groupBy(F.col("lab").alias("community"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("d_tot"))
    )
    com = deg.join(ein, "community", "left").select(
        "community",
        F.coalesce("e_in", F.lit(0)).cast("bigint").alias("e_in"),
        "d_tot",
    )
    D = "DECIMAL(38,0)"
    return com.crossJoin(F.broadcast(m)).select(
        "community", "e_in", "d_tot",
        (
            F.expr(
                f"CAST((1000000 * (4 * CAST(m AS {D}) * e_in"
                f" - CAST(d_tot AS {D}) * d_tot"
                f" + 4 * CAST(m AS {D}) * m))"
                f" DIV (4 * CAST(m AS {D}) * m) AS BIGINT)"
            )
            - 1000000
        ).alias("q_ppm"),
    )


@q(
    "win_seasonal_decompose",
    """WITH day AS (
         SELECT CAST(o_orderdate AS DATE) AS d,
                CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,4)) * 10000
                              AS BIGINT)) AS BIGINT) AS rev_c
         FROM orders GROUP BY CAST(o_orderdate AS DATE)),
       tr AS (
         SELECT d, rev_c,
                CASE WHEN COUNT(*) OVER w = 7
                     THEN (SUM(rev_c) OVER w) // 7 END AS trend_c,
                date_diff('day', DATE '1970-01-01', d) % 7 AS dow
         FROM day
         WINDOW w AS (ORDER BY d ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)),
       det AS (
         SELECT d, rev_c, trend_c, dow, rev_c - trend_c AS detr
         FROM tr WHERE trend_c IS NOT NULL),
       seas AS (
         SELECT dow,
                CAST(SUM(CAST(detr AS DECIMAL(38,0))) AS DOUBLE)
                  / COUNT(*) AS seasonal_c
         FROM det GROUP BY dow)
       SELECT t.d AS day, t.rev_c, t.trend_c, CAST(t.dow AS BIGINT) AS dow,
              s.seasonal_c,
              CAST(t.rev_c - t.trend_c AS DOUBLE) - s.seasonal_c AS resid_c
       FROM det t JOIN seas s ON s.dow = t.dow""",
)
def win_seasonal_decompose(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E+ classical seasonal decomposition of daily revenue:
    trend = centered 7-day moving average (exact cents DIV 7, emitted
    only for full windows), seasonal = day-of-week mean of the detrended
    series, residual = rev − trend − seasonal — the additive
    trend/seasonal/residual split behind every anomaly dashboard
    (complements agg_seasonality's fingerprint and win_peak_detect).
    Float discipline: the detrended values are SIGNED, and signed
    integer division diverges between engines (Spark DIV truncates,
    DuckDB // floors) — so the seasonal mean uses the davg idiom
    instead: exact DECIMAL sum, ONE deterministic cast to double,
    divide by count. dow is epoch-day mod 7 (engine-portable; no
    locale-dependent DAYOFWEEK). Plan: order scan → day-grain rollup
    (map-side partials); all windows run on the DAY table
    (calendar-bounded at any sf — one-task whitelisted); the 7-row
    dow table broadcast-joins back."""
    o = read_table(spark, sf_dir, "orders")
    day = o.groupBy(F.col("o_orderdate").cast("date").alias("d")).agg(
        F.sum(
            F.expr("CAST(CAST(o_totalprice AS DECIMAL(18,4)) * 10000 AS BIGINT)")
        )
        .cast("bigint")
        .alias("rev_c")
    )
    w = Window.orderBy("d").rowsBetween(-3, 3)
    tr = day.select(
        "d", "rev_c",
        F.when(
            F.count(F.lit(1)).over(w) == 7,
            F.expr("1").cast("bigint"),
        ).alias("_full"),
        F.sum("rev_c").over(w).alias("_s7"),
        F.expr("datediff(d, DATE'1970-01-01') % 7").alias("dow"),
    ).select(
        "d", "rev_c", "dow",
        F.when(F.col("_full") == 1, F.expr("_s7 DIV 7")).alias("trend_c"),
    )
    det = tr.filter(F.col("trend_c").isNotNull()).withColumn(
        "detr", F.col("rev_c") - F.col("trend_c")
    )
    seas = det.groupBy("dow").agg(
        (
            F.sum(F.col("detr").cast("decimal(38,0)")).cast("double")
            / F.count(F.lit(1))
        ).alias("seasonal_c")
    )
    return det.join(F.broadcast(seas), "dow").select(
        F.col("d").alias("day"), "rev_c", "trend_c",
        F.col("dow").cast("bigint").alias("dow"),
        "seasonal_c",
        (
            (F.col("rev_c") - F.col("trend_c")).cast("double")
            - F.col("seasonal_c")
        ).alias("resid_c"),
    )


@q(
    "agg_distinct_growth",
    """WITH first_day AS (
         SELECT user_id, MIN(CAST(ts AS DATE)) AS d0 FROM events
         GROUP BY user_id),
       per_day AS (
         SELECT d0 AS day, CAST(COUNT(*) AS BIGINT) AS new_users
         FROM first_day GROUP BY d0)
       SELECT day, new_users,
              CAST(SUM(new_users) OVER (ORDER BY day
                     ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_users
       FROM per_day""",
)
def agg_distinct_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D+ cumulative-distinct growth curve: new users per day (by first
    event) and the running total of distinct users ever seen — the
    audience/corpus growth readout that a naive per-day
    COUNT(DISTINCT ...) over expanding windows computes at O(days·|data|)
    cost. The first-touch reformulation is the scale trick: ONE
    user-keyed aggregate (min day per user — well-distributed shuffle),
    then the cumulative sum runs on the DAY-grain table (calendar-
    bounded, one-task whitelisted). Entity-level twin of
    text_ngram_novelty's content-level novelty curve. Exact integers
    throughout."""
    ev = read_table(spark, sf_dir, "events")
    first_day = ev.groupBy("user_id").agg(
        F.min(F.col("ts").cast("date")).alias("d0")
    )
    per_day = first_day.groupBy(F.col("d0").alias("day")).agg(
        F.count(F.lit(1)).cast("bigint").alias("new_users")
    )
    cum_w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    return per_day.select(
        "day", "new_users",
        F.sum("new_users").over(cum_w).cast("bigint").alias("cum_users"),
    )



@q(
    "join_interval_coverage",
    """WITH regions AS (
         SELECT CAST(s_suppkey % 5 AS VARCHAR) AS chromosome,
                CAST(s_suppkey * 97 + 1 AS BIGINT) AS rb,
                CAST(s_suppkey * 97 + 1 + 200 + (s_suppkey % 7) * 500
                     AS BIGINT) AS re,
                s_suppkey AS region_id
         FROM supplier),
       feats AS (
         SELECT CAST(p_partkey % 5 AS VARCHAR) AS chromosome,
                CAST(p_partkey * 31 + 1 AS BIGINT) AS fb,
                CAST(p_partkey * 31 + 1 + 100 + (p_partkey % 5) * 50
                     AS BIGINT) AS fe
         FROM part),
       hit AS (
         SELECT r.region_id, r.chromosome, r.rb, r.re,
                greatest(f.fb, r.rb) AS cb, least(f.fe, r.re) AS ce
         FROM regions r JOIN feats f
           ON f.chromosome = r.chromosome AND f.fb < r.re AND f.fe > r.rb),
       o AS (
         SELECT region_id, rb, re, cb, ce,
                CASE WHEN MAX(ce) OVER w IS NULL OR cb > MAX(ce) OVER w
                     THEN 1 ELSE 0 END AS new_i
         FROM hit
         WINDOW w AS (PARTITION BY region_id ORDER BY cb, ce
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)),
       s AS (
         SELECT region_id, rb, re, cb, ce,
                SUM(new_i) OVER (PARTITION BY region_id ORDER BY cb, ce
                                 ROWS UNBOUNDED PRECEDING) AS island
         FROM o),
       merged AS (
         SELECT region_id, MIN(rb) AS rb, MIN(re) AS re,
                MIN(cb) AS mb, MAX(ce) AS me, COUNT(*) AS n_feat
         FROM s GROUP BY region_id, island)
       SELECT region_id,
              CAST(MIN(re - rb) AS BIGINT) AS region_len,
              CAST(SUM(me - mb) AS BIGINT) AS covered_bp,
              CAST(SUM(n_feat) AS BIGINT) AS n_features,
              CAST((1000000 * SUM(me - mb)) // MIN(re - rb) AS BIGINT)
                AS coverage_ppm
       FROM merged GROUP BY region_id""",
)
def join_interval_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C1+ bedtools-coverage: per region, how many base pairs a second
    feature set covers — overlap join, clip each feature to the region,
    merge the clipped intervals (gaps-and-islands per region — double
    counting is THE classic coverage bug, merged-union length is the
    fix), then sum island lengths and emit the exact ppm fraction. The
    genomics workhorse behind "is this exon adequately covered" and the
    general measure-overlap-density primitive. Plan: the overlap join
    runs on (chromosome, fb<re, fe>rb) — at this demo cardinality a
    5-key chromosome equi-join; at genome scale the binned strategy of
    join_interval (operators/binning.py) is the drop-in scale path, and
    the merge windows are PARTITIONED per region (distributed, not
    global). Counts and lengths are integers; coverage_ppm is floor
    division. Per-region output, region-count-sized."""
    s = read_table(spark, sf_dir, "supplier")
    pt = read_table(spark, sf_dir, "part")
    regions = s.select(
        (F.col("s_suppkey") % 5).cast("string").alias("chromosome"),
        (F.col("s_suppkey") * 97 + 1).cast("long").alias("rb"),
        (
            F.col("s_suppkey") * 97 + 1 + 200
            + (F.col("s_suppkey") % 7) * 500
        ).cast("long").alias("re"),
        F.col("s_suppkey").alias("region_id"),
    )
    feats = pt.select(
        (F.col("p_partkey") % 5).cast("string").alias("chromosome"),
        (F.col("p_partkey") * 31 + 1).cast("long").alias("fb"),
        (
            F.col("p_partkey") * 31 + 1 + 100
            + (F.col("p_partkey") % 5) * 50
        ).cast("long").alias("fe"),
    )
    hit = regions.join(
        feats,
        (regions.chromosome == feats.chromosome)
        & (feats.fb < regions.re)
        & (feats.fe > regions.rb),
    ).select(
        "region_id", "rb", "re",
        F.greatest("fb", "rb").alias("cb"),
        F.least("fe", "re").alias("ce"),
    )
    prior_w = (
        Window.partitionBy("region_id")
        .orderBy("cb", "ce")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    o = hit.withColumn(
        "new_i",
        F.when(
            F.max("ce").over(prior_w).isNull()
            | (F.col("cb") > F.max("ce").over(prior_w)),
            1,
        ).otherwise(0),
    )
    cum_w = (
        Window.partitionBy("region_id")
        .orderBy("cb", "ce")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    si = o.withColumn("island", F.sum("new_i").over(cum_w))
    merged = si.groupBy("region_id", "island").agg(
        F.min("rb").alias("rb"), F.min("re").alias("re"),
        F.min("cb").alias("mb"), F.max("ce").alias("me"),
        F.count(F.lit(1)).alias("n_feat"),
    )
    return merged.groupBy("region_id").agg(
        F.min(F.col("re") - F.col("rb")).cast("bigint").alias("region_len"),
        F.sum(F.col("me") - F.col("mb")).cast("bigint").alias("covered_bp"),
        F.sum("n_feat").cast("bigint").alias("n_features"),
        F.expr(
            "CAST((1000000 * SUM(me - mb)) DIV MIN(re - rb) AS BIGINT)"
        ).alias("coverage_ppm"),
    )


@q(
    "freq_fst",
    """WITH gt AS (
         SELECT l_partkey AS site_id,
                l_suppkey % 2 AS pop,
                CASE WHEN l_orderkey % 3 = 0 THEN 2
                     WHEN l_orderkey % 3 = 1 THEN 1 ELSE 0 END AS n_ref
         FROM lineitem),
       cnt AS (
         SELECT site_id,
                CAST(2 * SUM(CASE WHEN pop = 0 THEN 1 ELSE 0 END) AS BIGINT)
                  AS a,
                CAST(SUM(CASE WHEN pop = 0 THEN n_ref ELSE 0 END) AS BIGINT)
                  AS x1,
                CAST(2 * SUM(CASE WHEN pop = 1 THEN 1 ELSE 0 END) AS BIGINT)
                  AS b,
                CAST(SUM(CASE WHEN pop = 1 THEN n_ref ELSE 0 END) AS BIGINT)
                  AS x2
         FROM gt GROUP BY site_id),
       poly AS (
         SELECT site_id, a, x1, b, x2, a + b AS n, x1 + x2 AS x
         FROM cnt
         WHERE a > 0 AND b > 0 AND x1 + x2 > 0 AND x1 + x2 < a + b)
       SELECT site_id, a AS alleles_pop1, x1 AS ref_pop1,
              b AS alleles_pop2, x2 AS ref_pop2,
              1000000 - CAST(
                (1000000 * CAST(n AS HUGEINT)
                   * (CAST(b AS HUGEINT) * x1 * (a - x1)
                      + CAST(a AS HUGEINT) * x2 * (b - x2)))
                // (CAST(a AS HUGEINT) * b * x * (n - x)) AS BIGINT)
                AS fst_ppm
       FROM poly""",
)
def freq_fst(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Varda-core population differentiation: per-site Wright's Fst
    between two cohorts (suppkey parity), Fst = 1 − Hs/Ht with
    heterozygosities kept RATIONAL — the whole estimator reduces to the
    integer identity Fst = 1 − N·[B·x1(A−x1) + A·x2(B−x2)] /
    (A·B·X·(N−X)) over allele counts (A,B = population allele totals,
    X = pooled ref count, N = A+B), so fst_ppm is one floored
    non-negative int128/DECIMAL division subtracted from 1e6 — slightly
    negative Fst (Hs > Ht) survives exactly because the subtraction
    happens AFTER the floor, identically in both engines. The
    batch-effect / population-structure screen that pairs with
    freq_hwe. Monomorphic or single-population sites excluded. Plan:
    one site-keyed grouped agg (map-side partials), then per-row
    integer math — site-count-sized output."""
    li = read_table(spark, sf_dir, "lineitem")
    gt = li.select(
        F.col("l_partkey").alias("site_id"),
        (F.col("l_suppkey") % 2).alias("pop"),
        F.expr(
            "CASE WHEN l_orderkey % 3 = 0 THEN 2"
            " WHEN l_orderkey % 3 = 1 THEN 1 ELSE 0 END"
        ).alias("n_ref"),
    )
    cnt = gt.groupBy("site_id").agg(
        (2 * F.sum(F.when(F.col("pop") == 0, 1).otherwise(0)))
        .cast("bigint")
        .alias("a"),
        F.sum(F.when(F.col("pop") == 0, F.col("n_ref")).otherwise(0))
        .cast("bigint")
        .alias("x1"),
        (2 * F.sum(F.when(F.col("pop") == 1, 1).otherwise(0)))
        .cast("bigint")
        .alias("b"),
        F.sum(F.when(F.col("pop") == 1, F.col("n_ref")).otherwise(0))
        .cast("bigint")
        .alias("x2"),
    )
    poly = cnt.withColumn("n", F.col("a") + F.col("b")).withColumn(
        "x", F.col("x1") + F.col("x2")
    ).filter(
        (F.col("a") > 0) & (F.col("b") > 0)
        & (F.col("x") > 0) & (F.col("x") < F.col("n"))
    )
    D = "DECIMAL(38,0)"
    return poly.select(
        "site_id",
        F.col("a").alias("alleles_pop1"), F.col("x1").alias("ref_pop1"),
        F.col("b").alias("alleles_pop2"), F.col("x2").alias("ref_pop2"),
        F.expr(
            f"1000000 - CAST((1000000 * CAST(n AS {D})"
            f" * (CAST(b AS {D}) * x1 * (a - x1)"
            f" + CAST(a AS {D}) * x2 * (b - x2)))"
            f" DIV (CAST(a AS {D}) * b * x * (n - x)) AS BIGINT)"
        ).alias("fst_ppm"),
    )


@q(
    "pack_epoch_plan",
    """WITH plan AS (
         SELECT doc_id, epoch,
                md5(CAST(epoch AS VARCHAR) || ':' || CAST(doc_id AS VARCHAR))
                  AS h
         FROM documents, unnest(range(0, 2)) AS t(epoch)),
       sharded AS (
         SELECT doc_id, epoch, h,
                CAST('0x' || substr(h, 1, 15) AS BIGINT) % 4 AS shard
         FROM plan)
       SELECT doc_id, CAST(epoch AS BIGINT) AS epoch,
              CAST(shard AS BIGINT) AS shard,
              CAST(ROW_NUMBER() OVER (PARTITION BY epoch, shard ORDER BY h)
                   AS BIGINT) AS position
       FROM sharded""",
)
def pack_epoch_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K+ deterministic training-epoch shuffle plan: every document gets
    a (epoch, shard, position) — a fresh content-addressed global
    permutation per epoch, pre-sharded for the data-loader fleet. This
    replaces RNG-state shuffles (irreproducible across engine versions,
    resume-hostile) with md5(epoch:doc) ordering: re-runs, retries, and
    a grown corpus reproduce every already-assigned position prefix
    within a shard bucket. Position is a ROW_NUMBER per (epoch, shard)
    partition — DISTRIBUTED windows (one per shard bucket), never a
    global sort; shards are md5-uniform so the 2×|docs| fan-out spreads
    evenly at any scale. The md5 hex string itself is the sort key
    (lexicographic = unbiased uniform order, no int collision
    tiebreak needed)."""
    docs = read_table(spark, sf_dir, "documents")
    plan = docs.select(
        "doc_id", F.explode(F.sequence(F.lit(0), F.lit(1))).alias("epoch")
    ).withColumn(
        "h",
        F.md5(
            F.expr(
                "CAST(CAST(epoch AS STRING) || ':'"
                " || CAST(doc_id AS STRING) AS BINARY)"
            )
        ),
    )
    sharded = plan.withColumn(
        "shard",
        F.expr(
            "CAST(conv(substring(h, 1, 15), 16, 10) AS BIGINT) % 4"
        ),
    )
    w = Window.partitionBy("epoch", "shard").orderBy("h")
    return sharded.select(
        "doc_id",
        F.col("epoch").cast("bigint").alias("epoch"),
        F.col("shard").cast("bigint").alias("shard"),
        F.row_number().over(w).cast("bigint").alias("position"),
    )



@q(
    "text_collocations",
    """WITH norm AS (
         SELECT doc_id,
                string_split(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'),
                             ' ') AS w
         FROM documents),
       tok AS (
         SELECT doc_id, i, w[i] AS t
         FROM (SELECT doc_id, unnest(range(1, len(w) + 1)) AS i, w FROM norm)
         WHERE w[i] <> ''),
       seq AS (
         SELECT doc_id, t,
                ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY i) AS p
         FROM tok),
       bg AS (
         SELECT a.t AS w1, b.t AS w2, CAST(COUNT(*) AS BIGINT) AS c_ab
         FROM seq a JOIN seq b ON b.doc_id = a.doc_id AND b.p = a.p + 1
         GROUP BY a.t, b.t),
       uni AS (
         SELECT t, CAST(COUNT(*) AS BIGINT) AS c FROM seq GROUP BY t),
       tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM seq)
       SELECT g.w1, g.w2, g.c_ab, ua.c AS c_w1, ub.c AS c_w2,
              CAST((1000000 * CAST(t.n AS HUGEINT) * g.c_ab)
                   // (CAST(ua.c AS HUGEINT) * ub.c) AS BIGINT) AS lift_ppm
       FROM bg g
       JOIN uni ua ON ua.t = g.w1
       JOIN uni ub ON ub.t = g.w2
       CROSS JOIN tot t
       WHERE g.c_ab >= 5
       ORDER BY lift_ppm DESC, g.w1, g.w2 LIMIT 50""",
)
def text_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K4+ collocation mining: adjacent-word pairs ranked by LIFT —
    P(w1w2)/(P(w1)·P(w2)) as the exact rational N·c_ab/(c_a·c_b) in ppm
    (lift ≡ exp(PMI), monotone in it, chosen because PMI's log is
    banned by the no-float-log rule — the same trade agg_simpson makes
    vs entropy). Support floor c_ab ≥ 5 kills the hapax-pair noise that
    dominates raw PMI rankings. The corpus-statistics primitive behind
    phrase detection ("new york" sticks, "the of" doesn't) —
    complements RAKE (stopword islands) and join_basket_lift (order
    baskets). Token positions are re-numbered per doc with a
    PARTITIONED row_number so the bigram self-join key (doc, p+1) skips
    the dropped empty tokens identically in both engines. Plan: bigram
    formation is a doc-local self-join on (doc_id, position) —
    co-partitioned, no fan-out; vocabulary joins are word-keyed
    shuffles; lift math is int128/DECIMAL (N·c_ab passes int64 near
    1e18 token-pairs); final top-50 is a TakeOrdered."""
    docs = read_table(spark, sf_dir, "documents")
    tok = (
        docs.select(
            "doc_id",
            F.posexplode(
                F.split(
                    F.regexp_replace(F.lower("text"), "[^a-z0-9 ]", " "), " "
                )
            ).alias("i", "t"),
        )
        .filter(F.col("t") != "")
    )
    w = Window.partitionBy("doc_id").orderBy("i")
    seq = tok.select("doc_id", "t", F.row_number().over(w).alias("p"))
    a = seq.select("doc_id", F.col("t").alias("w1"), "p")
    b = seq.select(
        "doc_id", F.col("t").alias("w2"), (F.col("p") - 1).alias("p")
    )
    bg = (
        a.join(b, ["doc_id", "p"])
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c_ab"))
        .filter(F.col("c_ab") >= 5)
    )
    uni = seq.groupBy("t").agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    tot = seq.agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    D = "DECIMAL(38,0)"
    return (
        bg.join(uni.select(F.col("t").alias("w1"), F.col("c").alias("c_w1")), "w1")
        .join(uni.select(F.col("t").alias("w2"), F.col("c").alias("c_w2")), "w2")
        .crossJoin(F.broadcast(tot))
        .select(
            "w1", "w2", "c_ab", "c_w1", "c_w2",
            F.expr(
                f"CAST((1000000 * CAST(n AS {D}) * c_ab)"
                f" DIV (CAST(c_w1 AS {D}) * c_w2) AS BIGINT)"
            ).alias("lift_ppm"),
        )
        .orderBy(F.col("lift_ppm").desc(), "w1", "w2")
        .limit(50)
    )


@q(
    "agg_mannwhitney",
    """WITH obs AS (
         SELECT CAST(l_quantity AS DECIMAL(18,4)) AS q,
                CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS g1
         FROM lineitem WHERE l_returnflag IN ('R', 'A')),
       v AS (
         SELECT q,
                CAST(SUM(g1) AS BIGINT) AS n1_v,
                CAST(SUM(1 - g1) AS BIGINT) AS n2_v,
                CAST(COUNT(*) AS BIGINT) AS t_v
         FROM obs GROUP BY q),
       rk AS (
         SELECT n1_v, n2_v, t_v,
                2 * COALESCE(SUM(t_v) OVER (ORDER BY q
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                  + t_v + 1 AS avg_rank_2x
         FROM v),
       s AS (
         SELECT CAST(SUM(n1_v) AS BIGINT) AS n1,
                CAST(SUM(n2_v) AS BIGINT) AS n2,
                CAST(SUM(n1_v * avg_rank_2x) AS BIGINT) AS r1_2x,
                CAST(SUM(t_v * t_v * t_v - t_v) AS BIGINT) AS tie_sum
         FROM rk)
       SELECT n1, n2,
              CAST(r1_2x - n1 * (n1 + 1) AS BIGINT) AS u1_2x,
              CAST(2 * n1 * n2 - (r1_2x - n1 * (n1 + 1)) AS BIGINT) AS u2_2x,
              CAST(r1_2x - n1 * (n1 + 1) - n1 * n2 AS DOUBLE)
                / (2.0 * sqrt((CAST(n1 AS DOUBLE) * n2 / 12.0)
                       * ((n1 + n2 + 1)
                          - CAST(tie_sum AS DOUBLE)
                            / ((n1 + n2) * CAST(n1 + n2 - 1 AS DOUBLE)))))
                AS z_score
       FROM s""",
)
def agg_mannwhitney(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D+ Mann-Whitney U rank-sum test (returned vs accepted quantity):
    the nonparametric sibling of agg_welch_ttest — distribution-free
    ordinal shift detection with the tie-corrected normal z. The scale
    reformulation is the point: ranks are NOT assigned by a global sort
    of the data — quantity is grouped to its VALUE DOMAIN (≤ ~50
    distinct values), per-value cohort counts are exact, and the
    average rank per value falls out of a cumulative count over that
    tiny value table (2×-scaled to stay integer through .5 tie
    midpoints). U is emitted 2×-SCALED (u1_2x/u2_2x) because tied midranks make U a
    half-integer and engines round the .5 differently — the tie
    correction Σ(t³−t) and rank sums are exact BIGINTs; the z-score is ONE fixed float expression tail (sqrt and
    division — IEEE-deterministic). A naive rank() over 1e11 rows is a
    global sort; this is one value-keyed agg + a 50-row window
    (whitelisted one-task, value-domain bounded). 1-row output."""
    li = read_table(spark, sf_dir, "lineitem")
    obs = li.filter(F.col("l_returnflag").isin("R", "A")).select(
        F.col("l_quantity").cast("decimal(18,4)").alias("q"),
        F.when(F.col("l_returnflag") == "R", 1).otherwise(0).alias("g1"),
    )
    v = obs.groupBy("q").agg(
        F.sum("g1").cast("bigint").alias("n1_v"),
        F.sum(1 - F.col("g1")).cast("bigint").alias("n2_v"),
        F.count(F.lit(1)).cast("bigint").alias("t_v"),
    )
    prior_w = Window.orderBy("q").rowsBetween(Window.unboundedPreceding, -1)
    rk = v.select(
        "n1_v", "n2_v", "t_v",
        (
            2 * F.coalesce(F.sum("t_v").over(prior_w), F.lit(0))
            + F.col("t_v") + 1
        ).alias("avg_rank_2x"),
    )
    s = rk.agg(
        F.sum("n1_v").cast("bigint").alias("n1"),
        F.sum("n2_v").cast("bigint").alias("n2"),
        F.sum(F.col("n1_v") * F.col("avg_rank_2x")).cast("bigint").alias("r1_2x"),
        F.sum(
            F.col("t_v") * F.col("t_v") * F.col("t_v") - F.col("t_v")
        ).cast("bigint").alias("tie_sum"),
    )
    return s.select(
        "n1", "n2",
        F.expr("CAST(r1_2x - n1 * (n1 + 1) AS BIGINT)").alias("u1_2x"),
        F.expr(
            "CAST(2 * n1 * n2 - (r1_2x - n1 * (n1 + 1)) AS BIGINT)"
        ).alias("u2_2x"),
        F.expr(
            "CAST(r1_2x - n1 * (n1 + 1) - n1 * n2 AS DOUBLE)"
            " / (2.0 * sqrt((CAST(n1 AS DOUBLE) * n2 / 12.0)"
            " * ((n1 + n2 + 1) - CAST(tie_sum AS DOUBLE)"
            " / ((n1 + n2) * CAST(n1 + n2 - 1 AS DOUBLE)))))"
        ).alias("z_score"),
    )



@q(
    "emb_pca_power",
    """WITH q AS (
         SELECT vec_id,
                list_transform(embedding,
                  x -> CAST(FLOOR(CAST(x AS DOUBLE) * 1000000) AS BIGINT)) AS e
         FROM embeddings),
       ex AS (
         SELECT vec_id, i, e[i] AS val
         FROM (SELECT vec_id, unnest(range(1, len(e) + 1)) AS i, e FROM q)),
       d0 AS (
         SELECT vec_id, CAST(SUM(val) AS HUGEINT) AS dot0
         FROM ex GROUP BY vec_id),
       sv0 AS (
         SELECT i, SUM(CAST(val AS HUGEINT) * dot0) AS s
         FROM ex JOIN d0 USING (vec_id) GROUP BY i),
       m0 AS (SELECT MAX(ABS(s)) AS m FROM sv0),
       v1 AS (
         SELECT i, (s * 1000000) // m AS v
         FROM sv0 CROSS JOIN m0),
       d1 AS (
         SELECT vec_id, SUM(CAST(val AS HUGEINT) * v) AS dot1
         FROM ex JOIN v1 USING (i) GROUP BY vec_id),
       w AS (
         SELECT i, SUM(CAST(val AS HUGEINT) * dot1) AS s
         FROM ex JOIN d1 USING (vec_id) GROUP BY i),
       mw AS (SELECT MAX(ABS(s)) AS m FROM w),
       wq AS (
         SELECT i, CAST((s * 1048576) // m AS BIGINT) AS v
         FROM w CROSS JOIN mw),
       nrm AS (SELECT CAST(SUM(v * v) AS BIGINT) AS n2 FROM wq)
       SELECT CAST(i - 1 AS BIGINT) AS dim,
              CAST(v AS BIGINT) AS loading_q,
              CAST(v AS DOUBLE) / sqrt(CAST(n2 AS DOUBLE)) AS loading
       FROM wq CROSS JOIN nrm""",
)
def emb_pca_power(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K3+ distributed PCA by power iteration: the top principal
    direction of the embedding second-moment matrix via TWO matrix-free
    iterations — S·v is never a 64×64 materialization but a per-row
    fold (dot = e·v, then accumulate e·dot per dimension), the classic
    trick that makes power iteration one scan per iteration at any
    row count. Spark evaluates both dots as ARRAY higher-order
    functions (aggregate/zip_with — JVM codegen, zero extra shuffles;
    the only shuffles are two 64-key dimension aggregates), while the
    oracle uses the exploded-join formulation — same integers. Cross-
    engine exactness: elements are quantized to 1e-6 units (the
    emb_norm_hist idiom), every accumulation is int128/DECIMAL(38,0),
    and the INTER-ITERATION RESCALE — v1 = (S·v0)·1e6 // max|S·v0| —
    keeps magnitudes bounded where raw S²·v0 would overflow any fixed
    width; signed floor division uses the DIV-remainder parity
    adjustment on Spark to match DuckDB's flooring //. The final
    loading is wq/sqrt(Σwq²) with wq ≤ 2^20 — both factors exact
    integers cast once to double, so even the float tail is
    bit-identical. Uncentered by design (the dominant direction /
    anisotropy diagnostic, cf. emb_centroid_shift for the mean);
    deterministic up to the fixed all-ones start, no RNG."""
    emb = read_table(spark, sf_dir, "embeddings")
    D = "DECIMAL(38,0)"

    def fdiv(a: str, b: str) -> str:
        return (
            f"((({a}) DIV ({b}))"
            f" - (CASE WHEN ({a}) % ({b}) != 0 AND ({a}) < 0"
            f" THEN 1 ELSE 0 END))"
        )

    q = emb.select(
        "vec_id",
        F.expr(
            "transform(embedding,"
            " x -> CAST(FLOOR(CAST(x AS DOUBLE) * 1000000) AS BIGINT))"
        ).alias("e"),
    )
    with_dot0 = q.withColumn(
        "dot0",
        F.expr(f"aggregate(e, CAST(0 AS {D}), (acc, x) -> acc + x)"),
    )
    ex0 = with_dot0.select(
        "dot0", F.posexplode("e").alias("dim", "val")
    )
    sv0 = ex0.groupBy("dim").agg(
        F.sum(F.expr(f"CAST(val AS {D}) * dot0")).alias("s")
    )
    m0 = sv0.agg(F.max(F.abs(F.col("s"))).alias("m"))
    v1 = sv0.crossJoin(F.broadcast(m0)).select(
        "dim", F.expr(fdiv("s * 1000000", "m")).alias("v")
    )
    varr = v1.agg(
        F.expr(
            "transform(array_sort(collect_list(struct(dim, v))),"
            " p -> p.v)"
        ).alias("varr")
    )
    with_dot1 = q.crossJoin(F.broadcast(varr)).withColumn(
        "dot1",
        F.expr(
            f"aggregate(zip_with(e, varr, (x, y) -> CAST(x AS {D}) * y),"
            f" CAST(0 AS {D}), (acc, x) -> acc + x)"
        ),
    )
    ex1 = with_dot1.select("dot1", F.posexplode("e").alias("dim", "val"))
    w = ex1.groupBy("dim").agg(
        F.sum(F.expr(f"CAST(val AS {D}) * dot1")).alias("s")
    )
    mw = w.agg(F.max(F.abs(F.col("s"))).alias("m"))
    wq = w.crossJoin(F.broadcast(mw)).select(
        "dim", F.expr(f"CAST({fdiv('s * 1048576', 'm')} AS BIGINT)").alias("v")
    )
    nrm = wq.agg(F.sum(F.col("v") * F.col("v")).cast("bigint").alias("n2"))
    return wq.crossJoin(F.broadcast(nrm)).select(
        F.col("dim").cast("bigint").alias("dim"),
        F.col("v").cast("bigint").alias("loading_q"),
        (
            F.col("v").cast("double")
            / F.sqrt(F.col("n2").cast("double"))
        ).alias("loading"),
    )



@q(
    "merge_snapshot_diff",
    """WITH v1 AS (
         SELECT o_orderkey AS k,
                CAST(CAST(o_totalprice AS DECIMAL(18,4)) * 10000 AS BIGINT)
                  AS price_c
         FROM orders WHERE o_orderkey % 11 <> 0),
       v2 AS (
         SELECT o_orderkey AS k,
                CAST(CAST(o_totalprice AS DECIMAL(18,4)) * 10000 AS BIGINT)
                  + CASE WHEN o_orderkey % 7 = 0 THEN 10000 ELSE 0 END
                  AS price_c
         FROM orders WHERE o_orderkey % 13 <> 0)
       SELECT COALESCE(a.k, b.k) AS k,
              CASE WHEN a.k IS NULL THEN 'I'
                   WHEN b.k IS NULL THEN 'D'
                   ELSE 'U' END AS op,
              a.price_c AS old_price_c,
              b.price_c AS new_price_c
       FROM v1 a FULL OUTER JOIN v2 b ON b.k = a.k
       WHERE a.k IS NULL OR b.k IS NULL OR a.price_c <> b.price_c""",
)
def merge_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5+ CDC EXTRACTION — the inverse of merge_cdc: diff two table
    snapshots into a minimal changelog (I/U/D rows; unchanged keys are
    filtered out, which is the point — a 100 TB snapshot pair usually
    differs in <1%, and downstream consumers replay only the delta).
    One full-outer join on the snapshot key: null-left = insert,
    null-right = delete, both-but-different = update. Prices compare in
    exact fixed-point cents, never float equality. Snapshots are
    synthesized deterministically (mod-11 absent from v1 → inserts,
    mod-13 absent from v2 → deletes, mod-7 repriced → updates). At
    scale both sides shuffle once on the key — or zero times if the
    warehouse bucketed both snapshots on it (join_bucketed shows that
    path); the anti-pattern this replaces is pairwise EXCEPT scans
    (two full passes per direction)."""
    o = read_table(spark, sf_dir, "orders")
    cents = "CAST(CAST(o_totalprice AS DECIMAL(18,4)) * 10000 AS BIGINT)"
    v1 = o.filter(F.col("o_orderkey") % 11 != 0).select(
        F.col("o_orderkey").alias("k"), F.expr(cents).alias("price_c")
    )
    v2 = o.filter(F.col("o_orderkey") % 13 != 0).select(
        F.col("o_orderkey").alias("k"),
        F.expr(
            cents + " + CASE WHEN o_orderkey % 7 = 0 THEN 10000 ELSE 0 END"
        ).alias("price_c"),
    )
    a = v1.alias("a")
    b = v2.alias("b")
    j = a.join(b, F.col("a.k") == F.col("b.k"), "full_outer")
    return j.filter(
        F.col("a.k").isNull()
        | F.col("b.k").isNull()
        | (F.col("a.price_c") != F.col("b.price_c"))
    ).select(
        F.coalesce(F.col("a.k"), F.col("b.k")).alias("k"),
        F.when(F.col("a.k").isNull(), "I")
        .when(F.col("b.k").isNull(), "D")
        .otherwise("U")
        .alias("op"),
        F.col("a.price_c").alias("old_price_c"),
        F.col("b.price_c").alias("new_price_c"),
    )


@q(
    "sample_importance_ht",
    """WITH d AS (
         SELECT doc_id,
                CASE WHEN n_chars < 200 THEN 'short'
                     WHEN n_chars < 400 THEN 'mid' ELSE 'long' END AS bucket
         FROM documents),
       pr AS (
         SELECT bucket,
                CASE bucket WHEN 'short' THEN 250000
                            WHEN 'mid' THEN 500000
                            ELSE 1000000 END AS p_ppm,
                CAST(COUNT(*) AS BIGINT) AS n_true
         FROM d GROUP BY bucket),
       kept AS (
         SELECT d.bucket, CAST(COUNT(*) AS BIGINT) AS n_kept
         FROM d JOIN pr USING (bucket)
         WHERE CAST('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 15)
                    AS BIGINT) % 1000000 < pr.p_ppm
         GROUP BY d.bucket)
       SELECT p.bucket, p.n_true, p.p_ppm,
              COALESCE(k.n_kept, 0) AS n_kept,
              (1000000 * COALESCE(k.n_kept, 0)) // p.p_ppm AS est_n,
              (1000000 * ABS((1000000 * COALESCE(k.n_kept, 0)) // p.p_ppm
                             - p.n_true)) // p.n_true AS err_ppm
       FROM pr p LEFT JOIN kept k ON k.bucket = p.bucket""",
)
def sample_importance_ht(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K+ importance sampling with a Horvitz-Thompson audit: documents
    are kept with a per-quality-bucket probability (long docs always,
    short ones at 25%) via the md5 ppm coin, and the HT estimator
    n̂_b = kept_b / p_b reconstructs the TRUE bucket counts from the
    sample — the correction that makes statistics computed on a biased
    curation sample unbiased again (the step most quality-filtered
    training mixes skip and then misreport token counts). Output is the
    per-bucket audit sheet: true count, inclusion probability, kept
    count, HT estimate, and exact ppm error — deterministic in both
    engines because the coin, probabilities, and estimator are all
    integer math (the estimator-audit family: dedup_minhash_recall,
    sim_lsh_recall). Plan: map-side filter against a 3-row broadcast
    probability table, one bucket-keyed agg; no shuffle of the kept
    data itself."""
    docs = read_table(spark, sf_dir, "documents")
    d = docs.select(
        "doc_id",
        F.expr(
            "CASE WHEN n_chars < 200 THEN 'short'"
            " WHEN n_chars < 400 THEN 'mid' ELSE 'long' END"
        ).alias("bucket"),
    )
    pr = d.groupBy("bucket").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_true")
    ).withColumn(
        "p_ppm",
        F.expr(
            "CASE bucket WHEN 'short' THEN 250000"
            " WHEN 'mid' THEN 500000 ELSE 1000000 END"
        ),
    )
    coin = (
        "CAST(conv(substring(md5(CAST(doc_id AS STRING)), 1, 15), 16, 10)"
        " AS BIGINT) % 1000000"
    )
    kept = (
        d.join(F.broadcast(pr.select("bucket", "p_ppm")), "bucket")
        .filter(F.expr(coin) < F.col("p_ppm"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_kept"))
    )
    return (
        pr.join(kept, "bucket", "left")
        .select(
            "bucket", "n_true", "p_ppm",
            F.coalesce("n_kept", F.lit(0)).cast("bigint").alias("n_kept"),
            F.expr(
                "(1000000 * COALESCE(n_kept, 0)) DIV p_ppm"
            ).alias("est_n"),
            F.expr(
                "(1000000 * ABS((1000000 * COALESCE(n_kept, 0)) DIV p_ppm"
                " - n_true)) DIV n_true"
            ).alias("err_ppm"),
        )
    )


@q(
    "agg_forecast_mase",
    """WITH day AS (
         SELECT CAST(o_orderdate AS DATE) AS d,
                CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,4)) * 10000
                              AS BIGINT)) AS BIGINT) AS rev_c
         FROM orders GROUP BY CAST(o_orderdate AS DATE)),
       lagd AS (
         SELECT d, rev_c,
                LAG(rev_c, 7) OVER (ORDER BY d) AS f7,
                LAG(rev_c, 1) OVER (ORDER BY d) AS f1
         FROM day),
       ev AS (
         SELECT d, rev_c, f7, f1 FROM lagd
         WHERE f7 IS NOT NULL AND f1 IS NOT NULL)
       SELECT CAST(COUNT(*) AS BIGINT) AS n_days,
              CAST(SUM(ABS(rev_c - f7)) // COUNT(*) AS BIGINT) AS mae7_c,
              CAST(SUM(ABS(rev_c - f1)) // COUNT(*) AS BIGINT) AS mae1_c,
              CAST((1000000 * CAST(SUM(ABS(rev_c - f7)) AS HUGEINT))
                   // SUM(ABS(rev_c - f1)) AS BIGINT) AS mase_ppm
       FROM ev""",
)
def agg_forecast_mase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D+ forecast-quality gate: seasonal-naive forecast (ŷ_d = y_{d−7})
    scored by MASE against the random-walk baseline (y_{d−1}) — the
    scale-free forecast metric (Hyndman 2006): mase < 1e6 ppm means the
    weekly pattern genuinely beats "tomorrow = today", the go/no-go for
    shipping any fancier model. Errors are exact integer cents; MASE is
    one int128 cross-multiplied ppm floor (no float MAE intermediates,
    so the gate itself can be asserted bit-exactly in CI). Eval days
    require BOTH lags (identical NULL window edges in both engines).
    Plan: order scan → day-grain rollup with map-side partials; lags
    run on the calendar-bounded day table (one-task whitelisted);
    1-row output."""
    o = read_table(spark, sf_dir, "orders")
    day = o.groupBy(F.col("o_orderdate").cast("date").alias("d")).agg(
        F.sum(
            F.expr("CAST(CAST(o_totalprice AS DECIMAL(18,4)) * 10000 AS BIGINT)")
        )
        .cast("bigint")
        .alias("rev_c")
    )
    w = Window.orderBy("d")
    lagd = day.select(
        "d", "rev_c",
        F.lag("rev_c", 7).over(w).alias("f7"),
        F.lag("rev_c", 1).over(w).alias("f1"),
    )
    ev = lagd.filter(F.col("f7").isNotNull() & F.col("f1").isNotNull())
    D = "DECIMAL(38,0)"
    return ev.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_days"),
        F.expr(
            "CAST(SUM(ABS(rev_c - f7)) DIV COUNT(*) AS BIGINT)"
        ).alias("mae7_c"),
        F.expr(
            "CAST(SUM(ABS(rev_c - f1)) DIV COUNT(*) AS BIGINT)"
        ).alias("mae1_c"),
        F.expr(
            f"CAST((1000000 * CAST(SUM(ABS(rev_c - f7)) AS {D}))"
            f" DIV SUM(ABS(rev_c - f1)) AS BIGINT)"
        ).alias("mase_ppm"),
    )



@q(
    "graph_hits",
    """WITH lp AS (
         SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
       a1 AS (
         SELECT p, CAST(COUNT(*) AS BIGINT) AS a FROM lp GROUP BY p),
       h1 AS (
         SELECT lp.o, CAST(SUM(a1.a) AS BIGINT) AS h
         FROM lp JOIN a1 USING (p) GROUP BY lp.o),
       mh AS (SELECT MAX(h) AS m FROM h1),
       h1q AS (
         SELECT o, (h * 1000000) // m AS hq FROM h1 CROSS JOIN mh),
       a2 AS (
         SELECT lp.p, CAST(SUM(h1q.hq) AS BIGINT) AS a
         FROM lp JOIN h1q USING (o) GROUP BY lp.p),
       ma AS (SELECT MAX(a) AS m FROM a2)
       SELECT a2.p AS part, a1.a AS degree,
              CAST((a2.a * 1000000) // ma.m AS BIGINT) AS authority_q
       FROM a2 JOIN a1 USING (p) CROSS JOIN ma
       ORDER BY authority_q DESC, part LIMIT 100""",
)
def graph_hits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Graph+ HITS hubs-and-authorities on the bipartite order↔part
    graph, 1.5 synchronous iterations (a₁ = part degree → hubs h₁ =
    Σ a₁ over the order's parts → authorities a₂ = Σ h₁ over orders
    containing the part): a₂ ranks parts by co-occurrence with BROAD
    baskets, which is a different signal than raw degree (a niche part
    bought only in huge mixed orders outranks a commodity bought alone)
    — Kleinberg's algorithm, fixed-round contract like graph_labelprop
    and emb_pca_power. All-positive integer scores with the 1e6 // max
    inter-round rescale (no sign parity trap here); deterministic
    (degree seed, no RNG). Plan: each half-iteration is one
    data-sized join + keyed agg (map-side partials), the rescale maxima
    are 1-row broadcasts (BNLJ whitelist); top-100 is a TakeOrdered."""
    li = read_table(spark, sf_dir, "lineitem")
    lp = li.select(
        F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p")
    ).distinct()
    a1 = lp.groupBy("p").agg(F.count(F.lit(1)).cast("bigint").alias("a"))
    h1 = (
        lp.join(a1, "p")
        .groupBy("o")
        .agg(F.sum("a").cast("bigint").alias("h"))
    )
    mh = h1.agg(F.max("h").alias("m"))
    h1q = h1.crossJoin(F.broadcast(mh)).select(
        "o", F.expr("(h * 1000000) DIV m").alias("hq")
    )
    a2 = (
        lp.join(h1q, "o")
        .groupBy("p")
        .agg(F.sum("hq").cast("bigint").alias("a2"))
    )
    ma = a2.agg(F.max("a2").alias("m"))
    return (
        a2.join(a1, "p")
        .crossJoin(F.broadcast(ma))
        .select(
            F.col("p").alias("part"),
            F.col("a").alias("degree"),
            F.expr("CAST((a2 * 1000000) DIV m AS BIGINT)").alias(
                "authority_q"
            ),
        )
        .orderBy(F.col("authority_q").desc(), "part")
        .limit(100)
    )


@q(
    "text_burstiness",
    """WITH norm AS (
         SELECT doc_id,
                string_split(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'),
                             ' ') AS w
         FROM documents),
       tok AS (
         SELECT doc_id, w[i] AS t
         FROM (SELECT doc_id, unnest(range(1, len(w) + 1)) AS i, w FROM norm)
         WHERE w[i] <> ''),
       dw AS (
         SELECT t, doc_id, CAST(COUNT(*) AS BIGINT) AS c
         FROM tok GROUP BY t, doc_id),
       wstat AS (
         SELECT t, CAST(SUM(c) AS BIGINT) AS tot,
                CAST(SUM(c * c) AS BIGINT) AS ss,
                CAST(COUNT(*) AS BIGINT) AS n_docs_present
         FROM dw GROUP BY t),
       dd AS (SELECT CAST(COUNT(*) AS BIGINT) AS d FROM documents)
       SELECT t AS word, tot, n_docs_present,
              CAST((1000000 * (CAST(dd.d AS HUGEINT) * ss - CAST(tot AS HUGEINT) * tot))
                   // (CAST(dd.d AS HUGEINT) * tot) AS BIGINT) AS vmr_ppm
       FROM wstat CROSS JOIN dd
       WHERE tot >= 20
       ORDER BY vmr_ppm DESC, word LIMIT 50""",
)
def text_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K4+ word burstiness: variance-to-mean ratio of per-document
    counts INCLUDING the zero docs — Katz's burstiness, the signal that
    separates topical words (appear many times in few docs, VMR >> 1)
    from function words (spread thin, VMR ≈ 1 Poisson). The zeros never
    materialize: over D docs, VMR = (D·Σc² − T²)/(D·T) needs only the
    presence rows (Σc², T) plus the corpus doc count — the sparse
    identity that makes this one scan at any corpus size. Exact int128
    cross-multiplied ppm; support floor T ≥ 20; top-50 TakeOrdered.
    Complements text_collocations (association) and text_zipf
    (frequency law) as the third corpus-statistics lens."""
    docs = read_table(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id",
        F.explode(
            F.split(F.regexp_replace(F.lower("text"), "[^a-z0-9 ]", " "), " ")
        ).alias("t"),
    ).filter(F.col("t") != "")
    dw = tok.groupBy("t", "doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    wstat = dw.groupBy("t").agg(
        F.sum("c").cast("bigint").alias("tot"),
        F.sum(F.col("c") * F.col("c")).cast("bigint").alias("ss"),
        F.count(F.lit(1)).cast("bigint").alias("n_docs_present"),
    ).filter(F.col("tot") >= 20)
    dd = docs.agg(F.count(F.lit(1)).cast("bigint").alias("d"))
    D = "DECIMAL(38,0)"
    return (
        wstat.crossJoin(F.broadcast(dd))
        .select(
            F.col("t").alias("word"), "tot", "n_docs_present",
            F.expr(
                f"CAST((1000000 * (CAST(d AS {D}) * ss"
                f" - CAST(tot AS {D}) * tot))"
                f" DIV (CAST(d AS {D}) * tot) AS BIGINT)"
            ).alias("vmr_ppm"),
        )
        .orderBy(F.col("vmr_ppm").desc(), "word")
        .limit(50)
    )


@q(
    "agg_target_encode",
    """WITH t AS (
         SELECT o_orderkey, o_orderpriority AS cat,
                CAST(CAST(o_totalprice AS DECIMAL(18,4)) * 10000 AS BIGINT)
                  AS y_c
         FROM orders),
       g AS (
         SELECT cat, CAST(SUM(y_c) AS BIGINT) AS s,
                CAST(COUNT(*) AS BIGINT) AS n
         FROM t GROUP BY cat)
       SELECT t.o_orderkey, t.cat, g.n AS n_cat,
              CAST((g.s - t.y_c) // (g.n - 1) AS BIGINT) AS loo_enc_c
       FROM t JOIN g USING (cat)
       WHERE g.n > 1""",
)
def agg_target_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ML+ leave-one-out target encoding: each row's category feature
    becomes the mean target of OTHER rows in its category —
    (Σy − y_own)/(n−1) — the encoding that avoids the self-leakage of
    naive mean encoding (a row seeing its own label) while staying a
    pure two-pass computation: one category aggregate (cardinality-
    sized, broadcast back) + one map-side subtraction per row. Exact
    fixed-point cents with floor division (targets non-negative, so
    DIV == // — the sign trap doesn't arise); singleton categories are
    excluded (LOO undefined at n=1, the standard fallback is the global
    prior — documented, not silently imputed). Deterministic row-level
    output sized like the input, the shape a feature-store write
    expects."""
    o = read_table(spark, sf_dir, "orders")
    t = o.select(
        "o_orderkey",
        F.col("o_orderpriority").alias("cat"),
        F.expr(
            "CAST(CAST(o_totalprice AS DECIMAL(18,4)) * 10000 AS BIGINT)"
        ).alias("y_c"),
    )
    g = t.groupBy("cat").agg(
        F.sum("y_c").cast("bigint").alias("s"),
        F.count(F.lit(1)).cast("bigint").alias("n"),
    )
    return (
        t.join(F.broadcast(g), "cat")
        .filter(F.col("n") > 1)
        .select(
            "o_orderkey", "cat",
            F.col("n").alias("n_cat"),
            F.expr("CAST((s - y_c) DIV (n - 1) AS BIGINT)").alias(
                "loo_enc_c"
            ),
        )
    )



@q(
    "sim_sparse_cosine",
    """WITH tok AS (
         SELECT doc_id, unnest(string_split(trim(text), ' ')) AS tok
         FROM documents),
       vec AS (
         SELECT doc_id,
                CAST('0x' || substr(md5(tok), 1, 4) AS INT) % 4096 AS bucket,
                CAST(COUNT(*) AS BIGINT) AS tf
         FROM tok GROUP BY doc_id, bucket),
       nrm AS (
         SELECT doc_id, CAST(SUM(tf * tf) AS BIGINT) AS n2
         FROM vec GROUP BY doc_id),
       keep AS (
         SELECT bucket FROM vec GROUP BY bucket
         HAVING COUNT(*) <= 64),
       dots AS (
         SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                CAST(SUM(a.tf * b.tf) AS BIGINT) AS dot
         FROM vec a
         JOIN keep k ON k.bucket = a.bucket
         JOIN vec b ON b.bucket = a.bucket AND b.doc_id > a.doc_id
         GROUP BY a.doc_id, b.doc_id),
       scored AS (
         SELECT d.doc_a, d.doc_b, d.dot,
                CAST((1000000 * CAST(d.dot AS HUGEINT) * d.dot)
                     // (CAST(na.n2 AS HUGEINT) * nb.n2) AS BIGINT)
                  AS cos2_ppm
         FROM dots d
         JOIN nrm na ON na.doc_id = d.doc_a
         JOIN nrm nb ON nb.doc_id = d.doc_b),
       ranked AS (
         SELECT doc_a, doc_b, dot, cos2_ppm,
                ROW_NUMBER() OVER (PARTITION BY doc_a
                     ORDER BY cos2_ppm DESC, doc_b) AS rn
         FROM scored)
       SELECT doc_a, doc_b, dot, cos2_ppm
       FROM ranked WHERE rn <= 3""",
)
def sim_sparse_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K3+ SPARSE-vector similarity: top-3 neighbors per document by
    hashed-TF cosine via a bucket inverted index — the lexical
    retrieval path next to the dense-embedding ANN family (sim_lsh /
    sim_ivf): exact sparse dot products Σ tf_a·tf_b accumulate only
    over SHARED buckets (never a dense 4096-dim product), candidates
    come from co-occurrence in the index, and buckets held by >64 docs
    are dropped as stopword mass — the df cut that bounds the
    pair fan-out at corpus scale (same cap discipline as
    dedup_binary_chunks). Ranking and output use cos² in exact
    cross-multiplied ppm (dot²·1e6 // (|a|²·|b|²)) so ordering never
    touches a float — engines would round a sqrt'd cosine identically,
    but ties wouldn't be provably stable; squared form needs no sqrt at
    all. Plan: token explode → (doc,bucket) agg → bucket-keyed
    self-join (well-distributed 4096-key shuffle) → per-doc top-3
    window (PARTITIONED, distributed)."""
    docs = read_table(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id",
        F.explode(F.split(F.trim(F.col("text")), " ")).alias("tok"),
    )
    vec = tok.groupBy(
        "doc_id",
        F.expr(
            "CAST(conv(substring(md5(tok), 1, 4), 16, 10) AS INT) % 4096"
        ).alias("bucket"),
    ).agg(F.count(F.lit(1)).cast("bigint").alias("tf"))
    nrm = vec.groupBy("doc_id").agg(
        F.sum(F.col("tf") * F.col("tf")).cast("bigint").alias("n2")
    )
    keep = (
        vec.groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") <= 64)
        .select("bucket")
    )
    a = vec.join(keep, "bucket").select(
        "bucket", F.col("doc_id").alias("doc_a"), F.col("tf").alias("tf_a")
    )
    b = vec.select(
        "bucket", F.col("doc_id").alias("doc_b"), F.col("tf").alias("tf_b")
    )
    dots = (
        a.join(b, "bucket")
        .filter(F.col("doc_b") > F.col("doc_a"))
        .groupBy("doc_a", "doc_b")
        .agg(F.sum(F.col("tf_a") * F.col("tf_b")).cast("bigint").alias("dot"))
    )
    D = "DECIMAL(38,0)"
    scored = (
        dots.join(
            nrm.select(F.col("doc_id").alias("doc_a"), F.col("n2").alias("n2a")),
            "doc_a",
        )
        .join(
            nrm.select(F.col("doc_id").alias("doc_b"), F.col("n2").alias("n2b")),
            "doc_b",
        )
        .select(
            "doc_a", "doc_b", "dot",
            F.expr(
                f"CAST((1000000 * CAST(dot AS {D}) * dot)"
                f" DIV (CAST(n2a AS {D}) * n2b) AS BIGINT)"
            ).alias("cos2_ppm"),
        )
    )
    w = Window.partitionBy("doc_a").orderBy(F.col("cos2_ppm").desc(), "doc_b")
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("doc_a", "doc_b", "dot", "cos2_ppm")
    )


@q(
    "win_interpolate",
    """WITH day AS (
         SELECT CAST(o_orderdate AS DATE) AS d,
                CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,4)) * 10000
                              AS BIGINT)) AS BIGINT) AS rev_c
         FROM orders GROUP BY CAST(o_orderdate AS DATE)),
       bounds AS (SELECT MIN(d) AS d0, MAX(d) AS d1 FROM day),
       spine AS (
         SELECT d0 + CAST(i AS INT) AS d
         FROM bounds,
              unnest(range(0, date_diff('day', d0, d1) + 1)) AS t(i)),
       gapped AS (
         SELECT s.d,
                CASE WHEN date_diff('day', DATE '1970-01-01', s.d) % 5 = 0
                     THEN NULL ELSE day.rev_c END AS rev_c
         FROM spine s LEFT JOIN day ON day.d = s.d),
       ctx AS (
         SELECT d, rev_c,
                last_value(rev_c IGNORE NULLS) OVER
                  (ORDER BY d ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                  AS pv,
                last_value(CASE WHEN rev_c IS NOT NULL THEN d END IGNORE NULLS)
                  OVER (ORDER BY d ROWS BETWEEN UNBOUNDED PRECEDING
                        AND 1 PRECEDING) AS pd,
                first_value(rev_c IGNORE NULLS) OVER
                  (ORDER BY d ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)
                  AS nv,
                first_value(CASE WHEN rev_c IS NOT NULL THEN d END IGNORE NULLS)
                  OVER (ORDER BY d ROWS BETWEEN 1 FOLLOWING
                        AND UNBOUNDED FOLLOWING) AS nd
         FROM gapped)
       SELECT d AS day, rev_c,
              CASE WHEN rev_c IS NOT NULL THEN CAST(rev_c AS DOUBLE)
                   WHEN pv IS NULL OR nv IS NULL THEN NULL
                   ELSE CAST(pv AS DOUBLE)
                        + CAST(nv - pv AS DOUBLE)
                          * date_diff('day', pd, d)
                          / date_diff('day', pd, nd) END AS interp_c
       FROM ctx""",
)
def win_interpolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E+ gap interpolation: densify daily revenue onto the full
    calendar spine and LINEARLY interpolate missing days between their
    nearest observed neighbors — the imputation step time-series models
    need where win_fill_forward's LOCF would flatline through gaps
    (every 5th epoch-day is nulled deterministically to create them).
    prev/next value AND date come from IGNORE NULLS frame navigation
    in one window sort each direction; the interpolated value is a
    fixed-shape double expression over exact integer cents and
    day offsets (one multiply, one divide — IEEE-identical across
    engines; integer floor here would hit the signed-DIV parity trap
    since gaps can span falling revenue). Spine generation is a 1-row
    min/max scalar exploded (interval_density idiom). Day-grain table →
    one-task windows, whitelisted; at entity grain the same windows
    PARTITION BY key and distribute."""
    o = read_table(spark, sf_dir, "orders")
    day = o.groupBy(F.col("o_orderdate").cast("date").alias("d")).agg(
        F.sum(
            F.expr("CAST(CAST(o_totalprice AS DECIMAL(18,4)) * 10000 AS BIGINT)")
        )
        .cast("bigint")
        .alias("rev_c")
    )
    bounds = day.agg(F.min("d").alias("d0"), F.max("d").alias("d1"))
    spine = bounds.select(
        F.explode(
            F.expr("sequence(0, datediff(d1, d0))")
        ).alias("i"),
        "d0",
    ).select(F.expr("date_add(d0, i)").alias("d"))
    gapped = spine.join(day, "d", "left").select(
        "d",
        F.when(
            F.expr("datediff(d, DATE'1970-01-01') % 5 = 0"), F.lit(None)
        )
        .otherwise(F.col("rev_c"))
        .alias("rev_c"),
    )
    back = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, -1)
    fwd = Window.orderBy("d").rowsBetween(1, Window.unboundedFollowing)
    ctx = gapped.select(
        "d", "rev_c",
        F.last("rev_c", ignorenulls=True).over(back).alias("pv"),
        F.last(
            F.when(F.col("rev_c").isNotNull(), F.col("d")), ignorenulls=True
        ).over(back).alias("pd"),
        F.first("rev_c", ignorenulls=True).over(fwd).alias("nv"),
        F.first(
            F.when(F.col("rev_c").isNotNull(), F.col("d")), ignorenulls=True
        ).over(fwd).alias("nd"),
    )
    return ctx.select(
        F.col("d").alias("day"), "rev_c",
        F.expr(
            "CASE WHEN rev_c IS NOT NULL THEN CAST(rev_c AS DOUBLE)"
            " WHEN pv IS NULL OR nv IS NULL THEN NULL"
            " ELSE CAST(pv AS DOUBLE) + CAST(nv - pv AS DOUBLE)"
            " * datediff(d, pd) / datediff(nd, pd) END"
        ).alias("interp_c"),
    )


@q(
    "stream_wtopk",
    """WITH w AS (
         SELECT CAST(date_trunc('day', ts) AS DATE) AS win_day, event_type
         FROM events),
       c AS (
         SELECT win_day, event_type, CAST(COUNT(*) AS BIGINT) AS n
         FROM w GROUP BY win_day, event_type),
       r AS (
         SELECT win_day, event_type, n,
                ROW_NUMBER() OVER (PARTITION BY win_day
                     ORDER BY n DESC, event_type) AS rn
         FROM c)
       SELECT win_day, event_type, n, CAST(rn AS BIGINT) AS rnk
       FROM r WHERE rn <= 3""",
)
def stream_wtopk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """I+ windowed heavy hitters: top-3 event types per tumbling
    event-time day — the per-window leaderboard every ops dashboard
    streams (alongside stream_tumbling's plain counts). Batch core
    shown here (the catalog's streaming-twin discipline: identical
    logic runs under readStream with a watermark + the same groupBy
    window — the count aggregation is watermark-compatible and the
    rank is applied on the emitted window rows downstream, since
    windows past the watermark are final). Tie-break pinned count
    DESC, type ASC. Plan: one (day,type)-keyed agg with map-side
    partials; the top-3 window PARTITIONS per day — distributed, never
    global."""
    ev = read_table(spark, sf_dir, "events")
    c = ev.select(
        F.col("ts").cast("date").alias("win_day"), "event_type"
    ).groupBy("win_day", "event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    w = Window.partitionBy("win_day").orderBy(F.col("n").desc(), "event_type")
    return (
        c.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select(
            "win_day", "event_type", "n",
            F.col("rn").cast("bigint").alias("rnk"),
        )
    )


@q(
    "date_business_days",
    """WITH lead AS (
         SELECT date_diff('day', DATE '1970-01-01', CAST(o.o_orderdate AS DATE))
                  AS sn,
                date_diff('day', DATE '1970-01-01',
                          CAST(MIN(l.l_shipdate) AS DATE)) AS en
         FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
         GROUP BY o.o_orderkey, o.o_orderdate),
       bd AS (
         SELECT (5 * ((en + 4) // 7) + least((en + 4) % 7, 5))
                - (5 * ((sn + 4) // 7) + least((sn + 4) % 7, 5)) AS bdays
         FROM lead)
       SELECT CAST(bdays AS BIGINT) AS business_days,
              CAST(COUNT(*) AS BIGINT) AS n_orders
       FROM bd GROUP BY bdays""",
)
def date_business_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H4+ business-day arithmetic in closed form: the order→first-ship
    lead time counted in WEEKDAYS — B(e)−B(s) where B(n) =
    5·((n+4) DIV 7) + LEAST((n+4) mod 7, 5) counts business days from
    the epoch through day n (the +4 aligns the week so Monday ≡ 0;
    verified against a 2000-case brute force in tests) — O(1) integer
    math per row, no calendar-spine explode, no locale-dependent
    DAYOFWEEK (epoch-day arithmetic is engine-portable; DIV is safe
    because post-1970 day numbers are non-negative). The SLA
    counterpart of agg_leadtime's calendar days. Output: lead-time
    histogram in business days — bounded by the lead-time domain."""
    o = read_table(spark, sf_dir, "orders")
    li = read_table(spark, sf_dir, "lineitem")
    lead = (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("o_orderkey", "o_orderdate")
        .agg(F.min("l_shipdate").alias("ship"))
        .select(
            F.expr(
                "datediff(CAST(o_orderdate AS DATE), DATE'1970-01-01')"
            ).alias("sn"),
            F.expr(
                "datediff(CAST(ship AS DATE), DATE'1970-01-01')"
            ).alias("en"),
        )
    )
    bfun = "(5 * (({n} + 4) DIV 7) + least(({n} + 4) % 7, 5))"
    bd = lead.select(
        F.expr(
            bfun.format(n="en") + " - " + bfun.format(n="sn")
        ).alias("bdays")
    )
    return bd.groupBy(F.col("bdays").cast("bigint").alias("business_days")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_orders")
    )



@q(
    "agg_auc",
    """WITH obs AS (
         SELECT CAST(FLOOR(CAST(l_extendedprice AS DECIMAL(18,4))) AS BIGINT)
                  AS sd,
                CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS g1
         FROM lineitem WHERE l_returnflag IN ('R', 'A')),
       v AS (
         SELECT sd, CAST(SUM(g1) AS BIGINT) AS n1_v,
                CAST(SUM(1 - g1) AS BIGINT) AS n2_v
         FROM obs GROUP BY sd),
       rk AS (
         SELECT n1_v, n2_v,
                COALESCE(SUM(n2_v) OVER (ORDER BY sd
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                  AS cum2
         FROM v),
       s AS (
         SELECT CAST(SUM(n1_v) AS BIGINT) AS n1,
                CAST(SUM(n2_v) AS BIGINT) AS n2,
                CAST(SUM(n1_v * (2 * cum2 + n2_v)) AS BIGINT) AS num_2x
         FROM rk)
       SELECT n1, n2, num_2x,
              CAST((1000000 * CAST(num_2x AS HUGEINT))
                   // (2 * CAST(n1 AS HUGEINT) * n2) AS BIGINT) AS auc_ppm
       FROM s""",
)
def agg_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ML+ exact ROC AUC: P(score_pos > score_neg) + ½P(tie) for price
    as a returned-vs-accepted discriminator — THE ranking-model metric,
    computed WITHOUT a global sort: scores collapse to their
    whole-dollar VALUE DOMAIN (bounded by the price range at any sf,
    ~100k rows through one cumulative window — constant work while the
    data grows), per-value cohort counts are exact, and the
    Mann-Whitney identity AUC = U/(n1·n2) runs in 2×-scaled integers
    (ties contribute n2_v/2 each — the 2× keeps half-integers exact,
    the agg_mannwhitney discipline). auc_ppm is one int128 floor.
    Plan: one value-keyed agg with map-side partials + a value-domain
    window (whitelisted) + 1-row output."""
    li = read_table(spark, sf_dir, "lineitem")
    obs = li.filter(F.col("l_returnflag").isin("R", "A")).select(
        F.expr(
            "CAST(FLOOR(CAST(l_extendedprice AS DECIMAL(18,4))) AS BIGINT)"
        ).alias("sd"),
        F.when(F.col("l_returnflag") == "R", 1).otherwise(0).alias("g1"),
    )
    v = obs.groupBy("sd").agg(
        F.sum("g1").cast("bigint").alias("n1_v"),
        F.sum(1 - F.col("g1")).cast("bigint").alias("n2_v"),
    )
    prior_w = Window.orderBy("sd").rowsBetween(Window.unboundedPreceding, -1)
    rk = v.select(
        "n1_v", "n2_v",
        F.coalesce(F.sum("n2_v").over(prior_w), F.lit(0)).alias("cum2"),
    )
    s = rk.agg(
        F.sum("n1_v").cast("bigint").alias("n1"),
        F.sum("n2_v").cast("bigint").alias("n2"),
        F.sum(F.col("n1_v") * (2 * F.col("cum2") + F.col("n2_v")))
        .cast("bigint")
        .alias("num_2x"),
    )
    D = "DECIMAL(38,0)"
    return s.select(
        "n1", "n2", "num_2x",
        F.expr(
            f"CAST((1000000 * CAST(num_2x AS {D}))"
            f" DIV (2 * CAST(n1 AS {D}) * n2) AS BIGINT)"
        ).alias("auc_ppm"),
    )


@q(
    "agg_calibration_bins",
    """WITH obs AS (
         SELECT CAST(CAST(l_discount AS DECIMAL(18,6)) * 1000000 AS BIGINT)
                  AS pred_ppm,
                CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS y
         FROM lineitem WHERE l_returnflag IN ('R', 'A'))
       SELECT pred_ppm,
              CAST(COUNT(*) AS BIGINT) AS n,
              CAST(SUM(y) AS BIGINT) AS n_pos,
              CAST((1000000 * SUM(y)) // COUNT(*) AS BIGINT) AS obs_ppm,
              CAST((1000000 * SUM(y)) // COUNT(*) AS BIGINT) - pred_ppm
                AS gap_ppm
       FROM obs GROUP BY pred_ppm""",
)
def agg_calibration_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ML+ calibration table: treating the discount as a predicted
    return probability, each predicted-value bin reports its OBSERVED
    outcome rate and the calibration gap — the reliability-diagram
    numbers behind "is this model's 30% actually 30%" (pairs with agg_auc:
    AUC measures ranking, calibration measures probability truth; a
    model can ace one and fail the other). Bins are the predictor's
    exact value domain (11 discount levels — no quantile binning
    needed); observed rates are exact ppm floors; the gap is a plain
    integer SUBTRACTION of two already-floored ppms, so signed values
    never meet a division (the DIV/floor parity trap is structurally
    avoided). One grouped agg, map-side partials, domain-sized
    output."""
    li = read_table(spark, sf_dir, "lineitem")
    obs = li.filter(F.col("l_returnflag").isin("R", "A")).select(
        F.expr(
            "CAST(CAST(l_discount AS DECIMAL(18,6)) * 1000000 AS BIGINT)"
        ).alias("pred_ppm"),
        F.when(F.col("l_returnflag") == "R", 1).otherwise(0).alias("y"),
    )
    return obs.groupBy("pred_ppm").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("y").cast("bigint").alias("n_pos"),
        F.expr("CAST((1000000 * SUM(y)) DIV COUNT(*) AS BIGINT)").alias(
            "obs_ppm"
        ),
        (
            F.expr("CAST((1000000 * SUM(y)) DIV COUNT(*) AS BIGINT)")
            - F.col("pred_ppm")
        ).alias("gap_ppm"),
    )


@q(
    "agg_winsorized_mean",
    """WITH obs AS (
         SELECT l_returnflag AS flag,
                CAST(CAST(l_quantity AS DECIMAL(18,4)) * 10000 AS BIGINT)
                  AS qc
         FROM lineitem),
       v AS (
         SELECT flag, qc, CAST(COUNT(*) AS BIGINT) AS cnt
         FROM obs GROUP BY flag, qc),
       cum AS (
         SELECT flag, qc, cnt,
                SUM(cnt) OVER (PARTITION BY flag ORDER BY qc
                               ROWS UNBOUNDED PRECEDING) AS cr,
                SUM(cnt) OVER (PARTITION BY flag) AS n
         FROM v),
       lims AS (
         SELECT flag,
                MIN(CASE WHEN cr >= (n + 9) // 10 THEN qc END) AS p10,
                MIN(CASE WHEN cr >= (9 * n + 9) // 10 THEN qc END) AS p90,
                MIN(n) AS n
         FROM cum GROUP BY flag)
       SELECT c.flag, l.n,
              CAST(MIN(l.p10) AS BIGINT) AS p10_c,
              CAST(MIN(l.p90) AS BIGINT) AS p90_c,
              CAST(SUM(least(greatest(c.qc, l.p10), l.p90) * c.cnt)
                   AS DOUBLE) / l.n / 10000.0 AS winsorized_mean
       FROM cum c JOIN lims l ON l.flag = c.flag
       GROUP BY c.flag, l.n""",
)
def agg_winsorized_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D+ 10% winsorized mean per cohort: clamp the tails to the
    10th/90th percentile values, then average — the robust-mean
    sibling of agg_trimmed_mean (trimming DELETES tails and shrinks n;
    winsorizing CLAMPS them and keeps n — the right choice when the
    tail rows are real but their magnitudes aren't trusted). Runs on
    the VALUE DOMAIN like agg_mannwhitney/agg_auc: per-cohort value
    counts, percentile cut values from cumulative counts at rank
    ⌈n/10⌉ / ⌈9n/10⌉ (exact integer rank arithmetic, no interpolation
    ambiguity), clamp applied to the VALUE TABLE weighted by count —
    the raw data is scanned once and never sorted. Sums are exact
    fixed-point; the mean is one deterministic double tail. Windows
    partition per cohort over ≤~50 value rows each."""
    li = read_table(spark, sf_dir, "lineitem")
    obs = li.select(
        F.col("l_returnflag").alias("flag"),
        F.expr(
            "CAST(CAST(l_quantity AS DECIMAL(18,4)) * 10000 AS BIGINT)"
        ).alias("qc"),
    )
    v = obs.groupBy("flag", "qc").agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt")
    )
    cum_w = Window.partitionBy("flag").orderBy("qc").rowsBetween(
        Window.unboundedPreceding, 0
    )
    tot_w = Window.partitionBy("flag")
    cum = v.select(
        "flag", "qc", "cnt",
        F.sum("cnt").over(cum_w).alias("cr"),
        F.sum("cnt").over(tot_w).alias("n"),
    )
    lims = cum.groupBy("flag").agg(
        F.min(
            F.when(F.col("cr") >= F.expr("(n + 9) DIV 10"), F.col("qc"))
        ).alias("p10"),
        F.min(
            F.when(F.col("cr") >= F.expr("(9 * n + 9) DIV 10"), F.col("qc"))
        ).alias("p90"),
        F.min("n").alias("n"),
    )
    return (
        cum.join(F.broadcast(lims.drop("n")), "flag")
        .groupBy("flag", "n")
        .agg(
            F.min("p10").cast("bigint").alias("p10_c"),
            F.min("p90").cast("bigint").alias("p90_c"),
            (
                F.sum(
                    F.expr("least(greatest(qc, p10), p90) * cnt")
                ).cast("double")
                / F.col("n")
                / 10000.0
            ).alias("winsorized_mean"),
        )
        .select("flag", "n", "p10_c", "p90_c", "winsorized_mean")
    )



@q(
    "agg_growth_accounting",
    """WITH active AS (
         SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events),
       seq AS (
         SELECT user_id, d,
                LAG(d) OVER (PARTITION BY user_id ORDER BY d) AS prev_d
         FROM active),
       cls AS (
         SELECT d,
                CAST(COUNT(*) AS BIGINT) AS n_active,
                CAST(SUM(CASE WHEN prev_d IS NULL THEN 1 ELSE 0 END)
                     AS BIGINT) AS n_new,
                CAST(SUM(CASE WHEN prev_d = d - 1 THEN 1 ELSE 0 END)
                     AS BIGINT) AS n_retained,
                CAST(SUM(CASE WHEN prev_d IS NOT NULL AND prev_d < d - 1
                              THEN 1 ELSE 0 END) AS BIGINT) AS n_resurrected
         FROM seq GROUP BY d)
       SELECT d AS day, n_active, n_new, n_retained, n_resurrected,
              COALESCE(LAG(n_active) OVER (ORDER BY d), 0) - n_retained
                AS n_churned
       FROM cls""",
)
def agg_growth_accounting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D+ growth accounting: every product-analytics deck's DAU
    decomposition — each active (user, day) is NEW (first ever),
    RETAINED (also active yesterday) or RESURRECTED (returning after a
    gap), and churn falls out of the conservation law churned(d) =
    active(d−1) − retained(d) (no per-user forward scan needed). The
    identity active(d) = new + retained + resurrected holds row-exactly
    and is pytest-asserted. Plan: the classification lag PARTITIONS BY
    USER (fully distributed — the heavy window); only the final
    churn lag runs on the DAY-grain rollup (calendar-bounded,
    whitelisted). One distinct + one user-keyed window + one day agg —
    no self-joins, no expanding windows."""
    ev = read_table(spark, sf_dir, "events")
    active = ev.select(
        "user_id", F.col("ts").cast("date").alias("d")
    ).distinct()
    uw = Window.partitionBy("user_id").orderBy("d")
    seq = active.withColumn("prev_d", F.lag("d").over(uw))
    cls = seq.groupBy("d").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_active"),
        F.sum(F.when(F.col("prev_d").isNull(), 1).otherwise(0))
        .cast("bigint")
        .alias("n_new"),
        F.sum(
            F.when(F.col("prev_d") == F.date_sub(F.col("d"), 1), 1).otherwise(0)
        )
        .cast("bigint")
        .alias("n_retained"),
        F.sum(
            F.when(
                F.col("prev_d").isNotNull()
                & (F.col("prev_d") < F.date_sub(F.col("d"), 1)),
                1,
            ).otherwise(0)
        )
        .cast("bigint")
        .alias("n_resurrected"),
    )
    dw = Window.orderBy("d")
    return cls.select(
        F.col("d").alias("day"), "n_active", "n_new", "n_retained",
        "n_resurrected",
        (
            F.coalesce(F.lag("n_active").over(dw), F.lit(0))
            - F.col("n_retained")
        ).alias("n_churned"),
    )


@q(
    "join_grid_knn",
    """WITH pts AS (
         SELECT p_partkey AS pid,
                (p_partkey * 31) % 1000 AS x, (p_partkey * 57) % 1000 AS y
         FROM part),
       qs AS (
         SELECT s_suppkey AS qid,
                (s_suppkey * 13) % 1000 AS qx, (s_suppkey * 41) % 1000 AS qy
         FROM supplier),
       probes AS (
         SELECT qid, qx, qy,
                (qx // 50) + dx AS cx, (qy // 50) + dy AS cy
         FROM qs, unnest(range(-1, 2)) AS tx(dx), unnest(range(-1, 2)) AS ty(dy)),
       cand AS (
         SELECT p.qid, p.qx, p.qy, t.pid,
                (t.x - p.qx) * (t.x - p.qx) + (t.y - p.qy) * (t.y - p.qy)
                  AS dist2
         FROM probes p
         JOIN pts t ON t.x // 50 = p.cx AND t.y // 50 = p.cy),
       ranked AS (
         SELECT qid, pid, dist2,
                ROW_NUMBER() OVER (PARTITION BY qid
                     ORDER BY dist2, pid) AS rn
         FROM cand)
       SELECT qid, pid, CAST(dist2 AS BIGINT) AS dist2
       FROM ranked WHERE rn = 1""",
)
def join_grid_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C+ spatial grid join: nearest 2D point per query via 50-unit
    grid bucketing — each query probes its own cell plus the 8
    neighbors (a 9-row map-side fan-out), candidates arrive through an
    EQUI-join on the cell key, and a per-query window keeps the
    closest: the standard grid/cell method that turns a quadratic
    spatial cross-join into a shuffle on a well-distributed cell id
    (same family as the genomic binned interval join — binning.py —
    in 2D). Contract: a query whose true nearest neighbor lies beyond
    the 3×3 ring (farther than one cell width) emits the ring-local
    nearest or nothing — the documented grid-method trade; shrink the
    cell or widen the ring to tighten it. Integer coordinates and
    squared distances, ties by point id — fully deterministic."""
    pt = read_table(spark, sf_dir, "part")
    s = read_table(spark, sf_dir, "supplier")
    pts = pt.select(
        F.col("p_partkey").alias("pid"),
        ((F.col("p_partkey") * 31) % 1000).alias("x"),
        ((F.col("p_partkey") * 57) % 1000).alias("y"),
    ).withColumn("cx", F.expr("x DIV 50")).withColumn("cy", F.expr("y DIV 50"))
    qs = s.select(
        F.col("s_suppkey").alias("qid"),
        ((F.col("s_suppkey") * 13) % 1000).alias("qx"),
        ((F.col("s_suppkey") * 41) % 1000).alias("qy"),
    )
    probes = (
        qs.select(
            "qid", "qx", "qy",
            F.explode(F.sequence(F.lit(-1), F.lit(1))).alias("dx"),
        )
        .select(
            "qid", "qx", "qy", "dx",
            F.explode(F.sequence(F.lit(-1), F.lit(1))).alias("dy"),
        )
        .select(
            "qid", "qx", "qy",
            (F.expr("qx DIV 50") + F.col("dx")).alias("cx"),
            (F.expr("qy DIV 50") + F.col("dy")).alias("cy"),
        )
    )
    cand = probes.join(pts, ["cx", "cy"]).select(
        "qid", "pid",
        (
            (F.col("x") - F.col("qx")) * (F.col("x") - F.col("qx"))
            + (F.col("y") - F.col("qy")) * (F.col("y") - F.col("qy"))
        ).alias("dist2"),
    )
    w = Window.partitionBy("qid").orderBy("dist2", "pid")
    return (
        cand.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("qid", "pid", F.col("dist2").cast("bigint").alias("dist2"))
    )


@q(
    "agg_cramers_v",
    """WITH o AS (
         SELECT l_returnflag AS flag, l_linestatus AS status,
                CAST(COUNT(*) AS BIGINT) AS obs
         FROM lineitem GROUP BY flag, status),
       rt AS (SELECT flag, CAST(SUM(obs) AS BIGINT) AS r FROM o GROUP BY flag),
       ct AS (SELECT status, CAST(SUM(obs) AS BIGINT) AS c
              FROM o GROUP BY status),
       tot AS (SELECT CAST(SUM(obs) AS BIGINT) AS n,
                      CAST(COUNT(DISTINCT flag) AS BIGINT) AS nr,
                      CAST(COUNT(DISTINCT status) AS BIGINT) AS nc
               FROM o),
       cells AS (
         SELECT o.obs, rt.r, ct.c, tot.n, tot.nr, tot.nc,
                CAST(o.obs AS HUGEINT) * tot.n
                  - CAST(rt.r AS HUGEINT) * ct.c AS d
         FROM o JOIN rt ON o.flag = rt.flag
                JOIN ct ON o.status = ct.status
                CROSS JOIN tot),
       s AS (
         SELECT MIN(n) AS n, MIN(nr) AS nr, MIN(nc) AS nc,
                CAST(SUM((1000000 * d * d)
                         // (CAST(n AS HUGEINT) * r * c)) AS BIGINT)
                  AS chi2_ppm
         FROM cells)
       SELECT n, CAST(least(nr, nc) - 1 AS BIGINT) AS df_min,
              chi2_ppm,
              sqrt(CAST(chi2_ppm AS DOUBLE) / 1000000.0
                   / CAST(n AS DOUBLE) / CAST(least(nr, nc) - 1 AS DOUBLE))
                AS cramers_v
       FROM s""",
)
def agg_cramers_v(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D+ Cramér's V effect size for the returnflag×linestatus
    contingency table — the companion number agg_chisq's significance
    can't give: with 1e11 rows EVERYTHING is significant, and V =
    √(χ²/(N·min(r−1,c−1))) ∈ [0,1] says whether the association is
    MATERIAL. χ² here is EXACT (unlike agg_chisq's per-cell double
    diagnostics): each cell's (obs·n − r·c)²/(n·r·c) is a floored
    int128 ppm term, summed under the floor-then-sum contract —
    d = obs·n − r·c stays under 1e38 up to n ≈ 3e9 rows (docstring
    ceiling; beyond, the double-path agg_chisq is the fallback). The
    single sqrt is the one float tail. 1-row output; all-broadcast
    margins."""
    li = read_table(spark, sf_dir, "lineitem")
    o = li.groupBy(
        F.col("l_returnflag").alias("flag"),
        F.col("l_linestatus").alias("status"),
    ).agg(F.count(F.lit(1)).cast("bigint").alias("obs"))
    rt = o.groupBy("flag").agg(F.sum("obs").cast("bigint").alias("r"))
    ct = o.groupBy("status").agg(F.sum("obs").cast("bigint").alias("c"))
    tot = o.agg(
        F.sum("obs").cast("bigint").alias("n"),
        F.countDistinct("flag").cast("bigint").alias("nr"),
        F.countDistinct("status").cast("bigint").alias("nc"),
    )
    D = "DECIMAL(38,0)"
    cells = (
        o.join(F.broadcast(rt), "flag")
        .join(F.broadcast(ct), "status")
        .crossJoin(F.broadcast(tot))
        .select(
            "n", "nr", "nc", "r", "c",
            F.expr(
                f"CAST(obs AS {D}) * n - CAST(r AS {D}) * c"
            ).alias("d"),
        )
    )
    s = cells.agg(
        F.min("n").alias("n"), F.min("nr").alias("nr"), F.min("nc").alias("nc"),
        F.expr(
            f"CAST(SUM((1000000 * d * d)"
            f" DIV (CAST(n AS {D}) * r * c)) AS BIGINT)"
        ).alias("chi2_ppm"),
    )
    return s.select(
        "n",
        F.expr("CAST(least(nr, nc) - 1 AS BIGINT)").alias("df_min"),
        "chi2_ppm",
        F.expr(
            "sqrt(CAST(chi2_ppm AS DOUBLE) / 1000000.0 / CAST(n AS DOUBLE)"
            " / CAST(least(nr, nc) - 1 AS DOUBLE))"
        ).alias("cramers_v"),
    )


@q(
    "interval_atomize",
    """WITH ivs AS (
         SELECT CAST(s_suppkey % 5 AS VARCHAR) AS chromosome,
                CAST(s_suppkey * 97 + 1 AS BIGINT) AS b,
                CAST(s_suppkey * 97 + 1 + 200 + (s_suppkey % 7) * 500
                     AS BIGINT) AS e
         FROM supplier),
       ev AS (
         SELECT chromosome, b AS pos, 1 AS delta FROM ivs
         UNION ALL
         SELECT chromosome, e AS pos, -1 AS delta FROM ivs),
       bp AS (
         SELECT chromosome, pos, CAST(SUM(delta) AS BIGINT) AS d
         FROM ev GROUP BY chromosome, pos),
       sweep AS (
         SELECT chromosome, pos,
                SUM(d) OVER (PARTITION BY chromosome ORDER BY pos
                             ROWS UNBOUNDED PRECEDING) AS depth,
                LEAD(pos) OVER (PARTITION BY chromosome ORDER BY pos)
                  AS next_pos
         FROM bp)
       SELECT chromosome, CAST(pos AS BIGINT) AS seg_begin,
              CAST(next_pos AS BIGINT) AS seg_end,
              CAST(depth AS BIGINT) AS depth
       FROM sweep
       WHERE next_pos IS NOT NULL AND depth > 0""",
)
def interval_atomize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C1+ atomic segmentation: flatten an interval set into DISJOINT
    segments between consecutive breakpoints, each carrying its overlap
    depth — the reusable sweep-line core that interval_depth_hist
    histograms and interval_merge collapses; emitted as a table because
    every downstream interval algebra (per-segment annotation,
    proportional overlap weights, depth-conditional masks) starts from
    exactly this shape. ±1 endpoint events, breakpoint pre-aggregation
    (ties collapse BEFORE the window so the running sum sees one row
    per position), per-chromosome running depth + LEAD — distributed
    across chromosomes, linear in breakpoints. Zero-depth gaps are
    dropped (the complement is interval_complement's job)."""
    s = read_table(spark, sf_dir, "supplier")
    ivs = s.select(
        (F.col("s_suppkey") % 5).cast("string").alias("chromosome"),
        (F.col("s_suppkey") * 97 + 1).cast("long").alias("b"),
        (
            F.col("s_suppkey") * 97 + 1 + 200
            + (F.col("s_suppkey") % 7) * 500
        ).cast("long").alias("e"),
    )
    ev = ivs.select(
        "chromosome", F.col("b").alias("pos"), F.lit(1).alias("delta")
    ).unionAll(
        ivs.select(
            "chromosome", F.col("e").alias("pos"), F.lit(-1).alias("delta")
        )
    )
    bp = ev.groupBy("chromosome", "pos").agg(
        F.sum("delta").cast("bigint").alias("d")
    )
    sw = Window.partitionBy("chromosome").orderBy("pos")
    sweep = bp.select(
        "chromosome", "pos",
        F.sum("d").over(sw.rowsBetween(Window.unboundedPreceding, 0)).alias(
            "depth"
        ),
        F.lead("pos").over(sw).alias("next_pos"),
    )
    return sweep.filter(
        F.col("next_pos").isNotNull() & (F.col("depth") > 0)
    ).select(
        "chromosome",
        F.col("pos").cast("bigint").alias("seg_begin"),
        F.col("next_pos").cast("bigint").alias("seg_end"),
        F.col("depth").cast("bigint").alias("depth"),
    )



@q("text_compress_ratio", None)  # zlib inside an Arrow UDF → rows-only
def text_compress_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K4+ compression-ratio quality signal: deflate(text)/len(text) —
    the cheap entropy proxy used by every large corpus cleaner
    (boilerplate and generated spam compress far below ~0.4; random or
    encrypted junk sits near 1.0; natural prose ~0.5-0.8). zlib level 6,
    computed in a VECTORIZED Arrow-batched pandas UDF (the sanctioned
    Python path — per-batch loop over materialized strings, never a
    row-at-a-time Python UDF in the plan; audit_plans verifies no
    BatchEvalPython). No DuckDB twin exists (no deflate in SQL), so this
    is a rows-only key — invariants (ratio bounds, monotone-ish length
    relation) are pytest-asserted instead. Output: per-doc ratio_ppm
    (integer, deterministic: zlib level 6 output length is fully
    specified by the input bytes) + a corpus histogram-friendly
    bucket."""
    import pandas as pd

    docs = read_table(spark, sf_dir, "documents")

    def _ratio(batches):
        import zlib

        for pdf in batches:
            texts = pdf["text"].astype(str)
            n = texts.str.len().clip(lower=1)
            comp = [len(zlib.compress(t.encode("utf-8"), 6)) for t in texts]
            out = pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_chars": n.astype("int64"),
                    "ratio_ppm": (
                        pd.Series(comp, index=pdf.index) * 1_000_000 // n
                    ).astype("int64"),
                }
            )
            out["bucket"] = (out.ratio_ppm // 100_000).astype("int64")
            yield out

    return docs.select("doc_id", "text").mapInPandas(
        _ratio, "doc_id bigint, n_chars bigint, ratio_ppm bigint, bucket bigint"
    )


@q(
    "join_interval_weight",
    """WITH regions AS (
         SELECT CAST(s_suppkey % 5 AS VARCHAR) AS chromosome,
                CAST(s_suppkey * 97 + 1 AS BIGINT) AS rb,
                CAST(s_suppkey * 97 + 1 + 200 + (s_suppkey % 7) * 500
                     AS BIGINT) AS re,
                s_suppkey AS region_id
         FROM supplier),
       feats AS (
         SELECT p_partkey AS feat_id,
                CAST(p_partkey % 5 AS VARCHAR) AS chromosome,
                CAST(p_partkey * 31 + 1 AS BIGINT) AS fb,
                CAST(p_partkey * 31 + 1 + 100 + (p_partkey % 5) * 50
                     AS BIGINT) AS fe
         FROM part)
       SELECT f.feat_id, r.region_id,
              CAST(least(f.fe, r.re) - greatest(f.fb, r.rb) AS BIGINT)
                AS overlap_bp,
              CAST((1000000 * (least(f.fe, r.re) - greatest(f.fb, r.rb)))
                   // (f.fe - f.fb) AS BIGINT) AS weight_ppm
       FROM feats f JOIN regions r
         ON r.chromosome = f.chromosome AND f.fb < r.re AND f.fe > r.rb""",
)
def join_interval_weight(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C1+ proportional overlap allocation: each (feature, region)
    overlap pair carries the fraction of the FEATURE's length inside
    the region in exact ppm — the weight matrix behind
    expression-quantification-style attribution (a read spanning two
    exons contributes fractionally to each) and any split-by-overlap
    rollup; downstream, SUM(value · weight_ppm) allocates a feature's
    measure across regions without double counting. Same overlap join
    as join_interval_coverage (binned strategy is the genome-scale
    drop-in); weights are pure integer floor ppm of clipped length over
    feature length. Pair-level output — the deliberately reusable
    intermediate (cf. interval_atomize for the segment-level core)."""
    s = read_table(spark, sf_dir, "supplier")
    pt = read_table(spark, sf_dir, "part")
    regions = s.select(
        (F.col("s_suppkey") % 5).cast("string").alias("chromosome"),
        (F.col("s_suppkey") * 97 + 1).cast("long").alias("rb"),
        (
            F.col("s_suppkey") * 97 + 1 + 200
            + (F.col("s_suppkey") % 7) * 500
        ).cast("long").alias("re"),
        F.col("s_suppkey").alias("region_id"),
    )
    feats = pt.select(
        F.col("p_partkey").alias("feat_id"),
        (F.col("p_partkey") % 5).cast("string").alias("chromosome"),
        (F.col("p_partkey") * 31 + 1).cast("long").alias("fb"),
        (
            F.col("p_partkey") * 31 + 1 + 100
            + (F.col("p_partkey") % 5) * 50
        ).cast("long").alias("fe"),
    )
    j = feats.join(
        regions,
        (feats.chromosome == regions.chromosome)
        & (feats.fb < regions.re)
        & (feats.fe > regions.rb),
    )
    return j.select(
        "feat_id", "region_id",
        (F.least("fe", "re") - F.greatest("fb", "rb"))
        .cast("bigint")
        .alias("overlap_bp"),
        F.expr(
            "CAST((1000000 * (least(fe, re) - greatest(fb, rb)))"
            " DIV (fe - fb) AS BIGINT)"
        ).alias("weight_ppm"),
    )


@q(
    "date_fiscal_445",
    """WITH d AS (
         SELECT date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))
                  AS n,
                CAST(CAST(o_totalprice AS DECIMAL(18,4)) * 10000 AS BIGINT)
                  AS price_c
         FROM orders),
       fw AS (
         SELECT price_c, (n + 3) // 7 AS wk FROM d),
       cal AS (
         SELECT price_c, wk,
                1970 + wk // 52 AS fy,
                (wk % 52) // 13 + 1 AS fq,
                CASE WHEN (wk % 13) < 4 THEN 1
                     WHEN (wk % 13) < 8 THEN 2 ELSE 3 END AS period
         FROM fw)
       SELECT CAST(fy AS BIGINT) AS fiscal_year,
              CAST(fq AS BIGINT) AS fiscal_quarter,
              CAST(period AS BIGINT) AS period,
              CAST(COUNT(*) AS BIGINT) AS n_orders,
              CAST(SUM(price_c) AS BIGINT) AS rev_c
       FROM cal GROUP BY fy, fq, period""",
)
def date_fiscal_445(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H4+ retail 4-4-5 fiscal calendar rollup: orders mapped to
    Monday-aligned fiscal weeks ((n+3) DIV 7 — the same epoch-day
    alignment as date_business_days), 13-week quarters split into
    4-, 4- and 5-week periods, 52-week fiscal years — the calendar
    retail BI actually reports on, where every period has a whole
    number of weeks so same-period comparisons are day-of-week-fair.
    The pure 52-week form drifts ~1 day/year against the solar
    calendar (real deployments insert a 53rd week roughly every 5-6
    years — a policy choice deliberately NOT hardcoded; the drift is
    the documented contract here). Closed-form integer mapping, no
    calendar table join; one grouped agg with map-side partials."""
    o = read_table(spark, sf_dir, "orders")
    d = o.select(
        F.expr(
            "datediff(CAST(o_orderdate AS DATE), DATE'1970-01-01')"
        ).alias("n"),
        F.expr(
            "CAST(CAST(o_totalprice AS DECIMAL(18,4)) * 10000 AS BIGINT)"
        ).alias("price_c"),
    )
    cal = d.select(
        "price_c",
        F.expr("1970 + ((n + 3) DIV 7) DIV 52").alias("fy"),
        F.expr("(((n + 3) DIV 7) % 52) DIV 13 + 1").alias("fq"),
        F.expr(
            "CASE WHEN ((n + 3) DIV 7) % 13 < 4 THEN 1"
            " WHEN ((n + 3) DIV 7) % 13 < 8 THEN 2 ELSE 3 END"
        ).alias("period"),
    )
    return cal.groupBy(
        F.col("fy").cast("bigint").alias("fiscal_year"),
        F.col("fq").cast("bigint").alias("fiscal_quarter"),
        F.col("period").cast("bigint").alias("period"),
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_orders"),
        F.sum("price_c").cast("bigint").alias("rev_c"),
    )



@q(
    "agg_ab_srm",
    """WITH assign AS (
         SELECT CASE WHEN CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)),
                                1, 15) AS BIGINT) % 2 = 0
                     THEN 'A' ELSE 'B' END AS arm
         FROM (SELECT DISTINCT user_id FROM events)),
       c AS (
         SELECT CAST(SUM(CASE WHEN arm = 'A' THEN 1 ELSE 0 END) AS BIGINT)
                  AS n_a,
                CAST(SUM(CASE WHEN arm = 'B' THEN 1 ELSE 0 END) AS BIGINT)
                  AS n_b
         FROM assign)
       SELECT n_a, n_b,
              CAST((1000000 * CAST(n_a - n_b AS HUGEINT) * (n_a - n_b))
                   // (n_a + n_b) AS BIGINT) AS chi2_ppm,
              (1000000 * CAST(n_a - n_b AS HUGEINT) * (n_a - n_b))
                // (n_a + n_b) >= 3841459 AS srm_detected
       FROM c""",
)
def agg_ab_srm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ML+ sample-ratio-mismatch gate: the FIRST check every A/B
    platform runs before reading any metric — with a 50/50 md5
    assignment, χ²₁ = (n_A−n_B)²/(n_A+n_B) against the 3.84 critical
    value detects broken randomization (bot filtering, logging loss,
    redirect asymmetry) that silently invalidates the experiment.
    (n_A−n_B)² is the signed-value SQUARE — non-negative by
    construction, so the int128 floor division has no DIV/floor parity
    trap. The assignment coin is the deterministic md5 idiom
    (sample_split), so the whole gate is bit-exact and CI-assertable.
    Plan: distinct users (one shuffle), conditional counts, 1-row
    output."""
    ev = read_table(spark, sf_dir, "events")
    assign = ev.select("user_id").distinct().select(
        F.expr(
            "CASE WHEN CAST(conv(substring(md5(CAST(user_id AS STRING)),"
            " 1, 15), 16, 10) AS BIGINT) % 2 = 0 THEN 'A' ELSE 'B' END"
        ).alias("arm")
    )
    c = assign.agg(
        F.sum(F.when(F.col("arm") == "A", 1).otherwise(0))
        .cast("bigint")
        .alias("n_a"),
        F.sum(F.when(F.col("arm") == "B", 1).otherwise(0))
        .cast("bigint")
        .alias("n_b"),
    )
    D = "DECIMAL(38,0)"
    chi = (
        f"(1000000 * CAST(n_a - n_b AS {D}) * (n_a - n_b))"
        f" DIV (n_a + n_b)"
    )
    return c.select(
        "n_a", "n_b",
        F.expr(f"CAST({chi} AS BIGINT)").alias("chi2_ppm"),
        F.expr(f"{chi} >= 3841459").alias("srm_detected"),
    )


@q(
    "graph_markov_stationary",
    """WITH seq AS (
         SELECT user_id, event_type, ts, event_id,
                LEAD(event_type) OVER (PARTITION BY user_id
                     ORDER BY ts, event_id) AS nxt
         FROM events),
       c AS (
         SELECT event_type AS src, nxt AS dst, CAST(COUNT(*) AS BIGINT) AS n
         FROM seq WHERE nxt IS NOT NULL GROUP BY event_type, nxt),
       r AS (SELECT src, CAST(SUM(n) AS BIGINT) AS rt FROM c GROUP BY src),
       v0 AS (SELECT src AS t, CAST(1000000 AS BIGINT) AS v FROM r),
       v1 AS (
         SELECT c.dst AS t,
                CAST(SUM((v0.v * c.n) // r.rt) AS BIGINT) AS v
         FROM c JOIN r USING (src) JOIN v0 ON v0.t = c.src
         GROUP BY c.dst),
       v2 AS (
         SELECT c.dst AS t,
                CAST(SUM((v1.v * c.n) // r.rt) AS BIGINT) AS v
         FROM c JOIN r USING (src) JOIN v1 ON v1.t = c.src
         GROUP BY c.dst),
       tot AS (SELECT CAST(SUM(v) AS BIGINT) AS s FROM v2)
       SELECT v2.t AS event_type,
              CAST((1000000 * v2.v) // tot.s AS BIGINT) AS stationary_ppm
       FROM v2 CROSS JOIN tot""",
)
def graph_markov_stationary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Graph+ stationary distribution of the event-type Markov chain:
    two power iterations of vᵀP from uniform, renormalized to ppm —
    where the user base settles if today's transition behavior holds
    (the long-run forecast graph_markov's one-step matrix implies).
    Each iteration's entries are (v_src·c_src,dst) DIV rowsum_src,
    floored per term then summed (floor-then-sum contract; all values
    non-negative so DIV == //). Fixed-round contract like
    emb_pca_power — the k-type state space makes every vector table
    type-count-sized, so iterations are broadcast-joinable at any sf;
    the heavy step is the ONE transition-count aggregate over the
    per-user LEAD window (partitioned, distributed — the graph_markov
    plan)."""
    ev = read_table(spark, sf_dir, "events")
    uw = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "user_id", "event_type", "ts", "event_id",
        F.lead("event_type").over(uw).alias("nxt"),
    )
    c = (
        seq.filter(F.col("nxt").isNotNull())
        .groupBy(F.col("event_type").alias("src"), F.col("nxt").alias("dst"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )
    r = c.groupBy("src").agg(F.sum("n").cast("bigint").alias("rt"))
    v = r.select(F.col("src").alias("t"), F.lit(1000000).cast("bigint").alias("v"))
    for _ in range(2):
        v = (
            c.join(F.broadcast(r), "src")
            .join(F.broadcast(v.withColumnRenamed("t", "src")), "src")
            .groupBy(F.col("dst").alias("t"))
            .agg(
                F.sum(F.expr("(v * n) DIV rt")).cast("bigint").alias("v")
            )
        )
    tot = v.agg(F.sum("v").cast("bigint").alias("s"))
    return v.crossJoin(F.broadcast(tot)).select(
        F.col("t").alias("event_type"),
        F.expr("CAST((1000000 * v) DIV s AS BIGINT)").alias("stationary_ppm"),
    )


@q(
    "agg_retention_dn",
    """WITH active AS (
         SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events),
       first_day AS (
         SELECT user_id, MIN(d) AS d0 FROM active GROUP BY user_id),
       horizon AS (SELECT MAX(d) AS dmax FROM active),
       ns AS (SELECT unnest([1, 7, 14]) AS nd),
       cohort AS (
         SELECT ns.nd, f.user_id, f.d0
         FROM first_day f CROSS JOIN horizon h CROSS JOIN ns
         WHERE f.d0 + CAST(ns.nd AS INT) <= h.dmax),
       ret AS (
         SELECT c.nd, CAST(COUNT(*) AS BIGINT) AS n_retained
         FROM cohort c JOIN active a
           ON a.user_id = c.user_id AND a.d = c.d0 + CAST(c.nd AS INT)
         GROUP BY c.nd)
       SELECT CAST(c.nd AS BIGINT) AS day_n,
              CAST(COUNT(*) AS BIGINT) AS n_cohort,
              CAST(COALESCE(MIN(r.n_retained), 0) AS BIGINT) AS n_retained,
              CAST((1000000 * COALESCE(MIN(r.n_retained), 0)) // COUNT(*)
                   AS BIGINT) AS retention_ppm
       FROM cohort c LEFT JOIN ret r ON r.nd = c.nd
       GROUP BY c.nd""",
)
def agg_retention_dn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D+ classic day-N retention (D1/D7/D14): of users whose first
    touch is at least N days before the data horizon (the
    right-censoring guard naive retention skips — without it late
    cohorts dilute the rate), the exact ppm active again exactly N days
    later. Complements agg_growth_accounting (daily flows) and
    agg_cohort (matrix): this is the single-number-per-N KPI.
    Plan: distinct (user, day) once; first-touch agg (user-keyed
    shuffle); the 3-row N spine and 1-row horizon are broadcast; the
    retention probe is an equi-join on (user, exact day) — no
    expanding windows, no per-N rescans of the raw events."""
    ev = read_table(spark, sf_dir, "events")
    active = ev.select("user_id", F.col("ts").cast("date").alias("d")).distinct()
    first_day = active.groupBy("user_id").agg(F.min("d").alias("d0"))
    horizon = active.agg(F.max("d").alias("dmax"))
    ns = spark.range(1).select(
        F.explode(F.array(F.lit(1), F.lit(7), F.lit(14))).alias("nd")
    )
    cohort = (
        first_day.crossJoin(F.broadcast(horizon))
        .crossJoin(F.broadcast(ns))
        .filter(F.expr("date_add(d0, nd) <= dmax"))
        .select("nd", "user_id", "d0")
    )
    ret = (
        cohort.join(
            active,
            (cohort.user_id == active.user_id)
            & (active.d == F.expr("date_add(d0, nd)")),
        )
        .groupBy(cohort.nd)
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_retained"))
    )
    return (
        cohort.groupBy("nd")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_cohort"))
        .join(ret, "nd", "left")
        .select(
            F.col("nd").cast("bigint").alias("day_n"),
            "n_cohort",
            F.coalesce("n_retained", F.lit(0)).cast("bigint").alias(
                "n_retained"
            ),
            F.expr(
                "CAST((1000000 * COALESCE(n_retained, 0)) DIV n_cohort"
                " AS BIGINT)"
            ).alias("retention_ppm"),
        )
    )


@q(
    "stream_watermark_audit",
    """WITH ev AS (
         SELECT ts, ts + ((event_id % 7) * (event_id % 11)) * INTERVAL 1 MINUTE
                  AS proc_ts
         FROM events),
       delay AS (
         SELECT date_diff('minute', ts, proc_ts) AS delay_min FROM ev),
       wm AS (SELECT unnest([0, 5, 15, 30]) AS w)
       SELECT CAST(wm.w AS BIGINT) AS watermark_min,
              CAST(COUNT(*) AS BIGINT) AS n_events,
              CAST(SUM(CASE WHEN d.delay_min > wm.w THEN 1 ELSE 0 END)
                   AS BIGINT) AS n_late,
              CAST((1000000 * SUM(CASE WHEN d.delay_min > wm.w
                                       THEN 1 ELSE 0 END)) // COUNT(*)
                   AS BIGINT) AS late_ppm
       FROM delay d CROSS JOIN wm GROUP BY wm.w""",
)
def stream_watermark_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """I+ watermark sizing audit: for candidate watermark delays, the
    exact fraction of events whose (synthesized, deterministic)
    processing-time lag exceeds it — i.e. what each watermark choice
    would DROP. This is the capacity-planning table you read before
    setting stream_watermark's delay: completeness (late_ppm → 0) vs
    state size and latency grow together, and the knee of this curve is
    the right setting. Arrival skew is event_id-derived ((id%7)·(id%11)
    minutes — heavy-tailed-ish, identical in both engines); the 4-row
    watermark spine is a broadcast. One scan, conditional sums, exact
    ppm. The streaming-runtime counterpart reads
    observedMetrics/StreamingQueryProgress — same numbers, live."""
    ev = read_table(spark, sf_dir, "events")
    delay = ev.select(
        F.expr(
            "CAST((unix_timestamp(ts + make_interval(0, 0, 0, 0, 0,"
            " (event_id % 7) * (event_id % 11), 0))"
            " - unix_timestamp(ts)) / 60 AS BIGINT)"
        ).alias("delay_min")
    )
    wm = spark.range(1).select(
        F.explode(
            F.array(F.lit(0), F.lit(5), F.lit(15), F.lit(30))
        ).alias("w")
    )
    return (
        delay.crossJoin(F.broadcast(wm))
        .groupBy(F.col("w").cast("bigint").alias("watermark_min"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            F.sum(F.when(F.col("delay_min") > F.col("w"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_late"),
            F.expr(
                "CAST((1000000 * SUM(CASE WHEN delay_min > w THEN 1 ELSE 0"
                " END)) DIV COUNT(*) AS BIGINT)"
            ).alias("late_ppm"),
        )
    )



@q(
    "agg_ltv_curve",
    """WITH ev AS (
         SELECT user_id,
                (date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) + 3)
                  // 7 AS m,
                CAST(CAST(value AS DECIMAL(18,4)) * 10000 AS BIGINT) AS v_c
         FROM events),
       first_m AS (
         SELECT user_id, MIN(m) AS m0 FROM ev GROUP BY user_id),
       csize AS (
         SELECT m0, CAST(COUNT(*) AS BIGINT) AS n_users
         FROM first_m GROUP BY m0),
       rev AS (
         SELECT f.m0, e.m - f.m0 AS age,
                CAST(SUM(e.v_c) AS BIGINT) AS rev_c
         FROM ev e JOIN first_m f ON f.user_id = e.user_id
         GROUP BY f.m0, e.m - f.m0),
       cum AS (
         SELECT r.m0, r.age, r.rev_c, c.n_users,
                SUM(r.rev_c) OVER (PARTITION BY r.m0 ORDER BY r.age
                                   ROWS UNBOUNDED PRECEDING) AS cum_c
         FROM rev r JOIN csize c ON c.m0 = r.m0)
       SELECT CAST(m0 AS BIGINT) AS cohort_week,
              CAST(age AS BIGINT) AS age_weeks,
              CAST(n_users AS BIGINT) AS n_users,
              CAST(rev_c AS BIGINT) AS rev_c,
              CAST(cum_c // n_users AS BIGINT) AS ltv_c
       FROM cum""",
)
def agg_ltv_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D+ cohort LTV curves: users grouped by first-touch WEEK
    (Monday-aligned epoch weeks — the shipped corpus spans ~a month, so
    weekly cohorts keep the curve non-degenerate; at production spans
    swap the key for year·12+month), their cumulative value per user
    tracked by account age — the lifetime-value table behind every
    payback-period decision (read a row: "the week-N cohort is worth
    ltv_c cents/user by age 3 weeks"). No months_between — engines
    disagree on fractional months; integer epoch arithmetic only. Exact fixed-point value
    cents; cum per cohort over the MONTHS-SQUARED-sized (cohort, age)
    table — the window partitions by cohort and is calendar-bounded at
    any sf. Heavy steps: one user-keyed first-touch agg + one
    (cohort, age) revenue agg, both map-side-partial shuffles;
    per-user LTV is floor cents (values non-negative)."""
    ev_t = read_table(spark, sf_dir, "events")
    ev = ev_t.select(
        "user_id",
        F.expr(
            "(datediff(CAST(ts AS DATE), DATE'1970-01-01') + 3) DIV 7"
        ).alias("m"),
        F.expr("CAST(CAST(value AS DECIMAL(18,4)) * 10000 AS BIGINT)").alias(
            "v_c"
        ),
    )
    first_m = ev.groupBy("user_id").agg(F.min("m").alias("m0"))
    csize = first_m.groupBy("m0").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_users")
    )
    rev = (
        ev.join(first_m, "user_id")
        .groupBy("m0", (F.col("m") - F.col("m0")).alias("age"))
        .agg(F.sum("v_c").cast("bigint").alias("rev_c"))
    )
    cw = Window.partitionBy("m0").orderBy("age").rowsBetween(
        Window.unboundedPreceding, 0
    )
    cum = rev.join(F.broadcast(csize), "m0").select(
        "m0", "age", "rev_c", "n_users",
        F.sum("rev_c").over(cw).alias("cum_c"),
    )
    return cum.select(
        F.col("m0").cast("bigint").alias("cohort_week"),
        F.col("age").cast("bigint").alias("age_weeks"),
        F.col("n_users").cast("bigint").alias("n_users"),
        F.col("rev_c").cast("bigint").alias("rev_c"),
        F.expr("CAST(cum_c DIV n_users AS BIGINT)").alias("ltv_c"),
    )


@q(
    "agg_price_index",
    """WITH li AS (
         SELECT l_partkey AS pk,
                CASE WHEN EXTRACT(year FROM l_shipdate) < 1995 THEN 0 ELSE 1
                  END AS period,
                CAST(CAST(l_quantity AS DECIMAL(18,4)) AS BIGINT) AS q,
                CAST(CAST(l_extendedprice AS DECIMAL(18,4)) * 10000 AS BIGINT)
                  AS e_c
         FROM lineitem),
       pp AS (
         SELECT pk, period, CAST(SUM(q) AS BIGINT) AS qt,
                CAST(SUM(e_c) AS BIGINT) AS et
         FROM li GROUP BY pk, period),
       up AS (
         SELECT pk, period, qt, et // qt AS p_c
         FROM pp WHERE qt > 0),
       paired AS (
         SELECT a.pk, a.qt AS q0, a.p_c AS p0, b.qt AS q1, b.p_c AS p1
         FROM up a JOIN up b ON b.pk = a.pk AND a.period = 0 AND b.period = 1),
       s AS (
         SELECT CAST(SUM(CAST(p1 AS HUGEINT) * q0) AS HUGEINT) AS l_num,
                CAST(SUM(CAST(p0 AS HUGEINT) * q0) AS HUGEINT) AS l_den,
                CAST(SUM(CAST(p1 AS HUGEINT) * q1) AS HUGEINT) AS p_num,
                CAST(SUM(CAST(p0 AS HUGEINT) * q1) AS HUGEINT) AS p_den,
                CAST(COUNT(*) AS BIGINT) AS n_parts
         FROM paired)
       SELECT n_parts,
              CAST((1000000 * l_num) // l_den AS BIGINT) AS laspeyres_ppm,
              CAST((1000000 * p_num) // p_den AS BIGINT) AS paasche_ppm,
              sqrt((CAST((1000000 * l_num) // l_den AS DOUBLE) / 1000000.0)
                   * (CAST((1000000 * p_num) // p_den AS DOUBLE) / 1000000.0))
                AS fisher_index
       FROM s""",
)
def agg_price_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D+ price indices between two periods (pre/post-1995 shipments):
    Laspeyres (base-period basket), Paasche (current basket), and their
    geometric-mean Fisher ideal — the inflation/pricing-power readout
    over the part catalog. Unit prices are per-part period aggregates
    floored to exact cents (Σext/Σqty — the deliberate one-cent
    quantization that keeps every downstream number integer;
    documented contract), index ratios are int128 cross-multiplied ppm
    floors over parts present in BOTH periods, and the single sqrt for
    Fisher is the one float tail. Plan: one (part, period) agg with
    map-side partials, a part-keyed self-join, 1-row output."""
    li_t = read_table(spark, sf_dir, "lineitem")
    li = li_t.select(
        F.col("l_partkey").alias("pk"),
        F.expr(
            "CASE WHEN year(l_shipdate) < 1995 THEN 0 ELSE 1 END"
        ).alias("period"),
        F.expr("CAST(CAST(l_quantity AS DECIMAL(18,4)) AS BIGINT)").alias("q"),
        F.expr(
            "CAST(CAST(l_extendedprice AS DECIMAL(18,4)) * 10000 AS BIGINT)"
        ).alias("e_c"),
    )
    pp = li.groupBy("pk", "period").agg(
        F.sum("q").cast("bigint").alias("qt"),
        F.sum("e_c").cast("bigint").alias("et"),
    )
    up = pp.filter(F.col("qt") > 0).withColumn("p_c", F.expr("et DIV qt"))
    a = up.filter(F.col("period") == 0).select(
        "pk", F.col("qt").alias("q0"), F.col("p_c").alias("p0")
    )
    b = up.filter(F.col("period") == 1).select(
        "pk", F.col("qt").alias("q1"), F.col("p_c").alias("p1")
    )
    both = a.join(b, "pk")
    D = "DECIMAL(38,0)"
    s = both.agg(
        F.sum(F.expr(f"CAST(p1 AS {D}) * q0")).alias("l_num"),
        F.sum(F.expr(f"CAST(p0 AS {D}) * q0")).alias("l_den"),
        F.sum(F.expr(f"CAST(p1 AS {D}) * q1")).alias("p_num"),
        F.sum(F.expr(f"CAST(p0 AS {D}) * q1")).alias("p_den"),
        F.count(F.lit(1)).cast("bigint").alias("n_parts"),
    )
    return s.select(
        "n_parts",
        F.expr("CAST((1000000 * l_num) DIV l_den AS BIGINT)").alias(
            "laspeyres_ppm"
        ),
        F.expr("CAST((1000000 * p_num) DIV p_den AS BIGINT)").alias(
            "paasche_ppm"
        ),
        F.expr(
            "sqrt((CAST((1000000 * l_num) DIV l_den AS DOUBLE) / 1000000.0)"
            " * (CAST((1000000 * p_num) DIV p_den AS DOUBLE) / 1000000.0))"
        ).alias("fisher_index"),
    )



@q(
    "agg_power_analysis",
    """WITH base AS (
         SELECT event_type,
                CAST(COUNT(*) AS BIGINT) AS n,
                CAST(SUM(CASE WHEN value > 1.0 THEN 1 ELSE 0 END) AS BIGINT)
                  AS n_conv
         FROM events GROUP BY event_type),
       rate AS (
         SELECT event_type, n, n_conv,
                CAST((1000000 * n_conv) // n AS BIGINT) AS p_ppm
         FROM base WHERE n_conv > 0 AND n_conv < n)
       SELECT event_type, n, n_conv, p_ppm,
              CAST(CEIL(
                (1.959964 + 0.841621) * (1.959964 + 0.841621)
                * 2.0 * (CAST(p_ppm AS DOUBLE) / 1000000.0)
                * (1.0 - CAST(p_ppm AS DOUBLE) / 1000000.0)
                / ((0.1 * CAST(p_ppm AS DOUBLE) / 1000000.0)
                   * (0.1 * CAST(p_ppm AS DOUBLE) / 1000000.0))
              ) AS BIGINT) AS n_per_arm_10pct
       FROM rate""",
)
def agg_power_analysis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ML+ experiment sizing: per event type, the observed conversion
    rate (value > 1 as the conversion proxy) and the REQUIRED
    per-arm sample size to detect a +10% relative lift at α=5%
    (two-sided) and 80% power — n = (z_{α/2}+z_β)²·2p(1−p)/δ² — the
    number that decides whether an A/B test is even worth launching
    (pairs with agg_ab_srm's validity gate and agg_welch_ttest's
    readout). The baseline rate is an exact ppm floor; the sizing
    formula is ONE fixed-shape float expression with the z constants
    pinned to 6 decimals (1.959964, 0.841621 — literals, not a stats
    library call, so both engines evaluate identical IEEE ops) and
    CEIL to whole subjects. Degenerate rates (0 or 1) are excluded.
    One grouped agg, type-count-sized output."""
    ev = read_table(spark, sf_dir, "events")
    base = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.when(F.col("value") > 1.0, 1).otherwise(0))
        .cast("bigint")
        .alias("n_conv"),
    )
    rate = base.filter(
        (F.col("n_conv") > 0) & (F.col("n_conv") < F.col("n"))
    ).withColumn("p_ppm", F.expr("CAST((1000000 * n_conv) DIV n AS BIGINT)"))
    return rate.select(
        "event_type", "n", "n_conv", "p_ppm",
        F.expr(
            "CAST(CEIL((1.959964 + 0.841621) * (1.959964 + 0.841621)"
            " * 2.0 * (CAST(p_ppm AS DOUBLE) / 1000000.0)"
            " * (1.0 - CAST(p_ppm AS DOUBLE) / 1000000.0)"
            " / ((0.1 * CAST(p_ppm AS DOUBLE) / 1000000.0)"
            " * (0.1 * CAST(p_ppm AS DOUBLE) / 1000000.0))) AS BIGINT)"
        ).alias("n_per_arm_10pct"),
    )


@q(
    "emb_prefix_recall",
    """WITH q AS (
         SELECT vec_id, label,
                list_transform(embedding,
                    x -> CAST(floor(CAST(x AS DOUBLE) * 10000) AS BIGINT)) AS e
         FROM embeddings),
       pairs AS (
         SELECT a.vec_id AS qid, a.label, b.vec_id AS nid,
                CAST(list_sum(list_transform(list_zip(a.e[1:16], b.e[1:16]),
                                             s -> s[1] * s[2])) AS BIGINT)
                  AS dot16,
                CAST(list_sum(list_transform(list_zip(a.e, b.e),
                                             s -> s[1] * s[2])) AS BIGINT)
                  AS dot_full
         FROM q a JOIN q b ON a.label = b.label AND a.vec_id <> b.vec_id),
       top16 AS (
         SELECT qid, label, nid FROM (
           SELECT qid, label, nid,
                  ROW_NUMBER() OVER (PARTITION BY qid
                       ORDER BY dot16 DESC, nid) AS rn
           FROM pairs) WHERE rn = 1),
       topf AS (
         SELECT qid, nid FROM (
           SELECT qid, nid,
                  ROW_NUMBER() OVER (PARTITION BY qid
                       ORDER BY dot_full DESC, nid) AS rn
           FROM pairs) WHERE rn = 1)
       SELECT t.label,
              CAST(COUNT(*) AS BIGINT) AS n_queries,
              CAST(SUM(CASE WHEN t.nid = f.nid THEN 1 ELSE 0 END) AS BIGINT)
                AS n_agree,
              CAST((1000000 * SUM(CASE WHEN t.nid = f.nid THEN 1 ELSE 0 END))
                   // COUNT(*) AS BIGINT) AS recall_ppm
       FROM top16 t JOIN topf f ON f.qid = t.qid
       GROUP BY t.label""",
)
def emb_prefix_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K3+ Matryoshka/prefix-dimension retrieval audit: does the FIRST
    16 dimensions' top-1 neighbor agree with the full-vector top-1?
    recall@1 per label block in exact ppm — the decision table for
    truncating MRL-style embeddings (serve 16-dim at ¼ the memory and
    flops if recall holds; the modern ANN cost lever next to
    emb_quantize's scalar quantization and sim_lsh's hashing). Both
    rankings run on the SAME quantized integer dots (sim_topk idiom —
    exact, tie-stable), full-dim length is data-derived (no hardcoded
    64 — the emb_pair_dist_hist lesson). Label-blocked pair join like
    sim_topk; per-query argmax windows partition by query. The recall
    of PREFIX dims is the audit the estimator-audit family
    (lsh/minhash recall) runs for subspace truncation."""
    emb = read_table(spark, sf_dir, "embeddings")
    q = emb.select(
        "vec_id", "label",
        F.expr(
            "transform(embedding,"
            " x -> CAST(floor(CAST(x AS DOUBLE) * 10000) AS BIGINT))"
        ).alias("e"),
    )
    a = q.select(
        F.col("vec_id").alias("qid"), "label", F.col("e").alias("ea")
    )
    b = q.select(
        F.col("vec_id").alias("nid"),
        F.col("label").alias("lb"),
        F.col("e").alias("eb"),
    )
    pairs = (
        a.join(b, (F.col("label") == F.col("lb")) & (F.col("qid") != F.col("nid")))
        .select(
            "qid", "label", "nid",
            F.expr(
                "aggregate(zip_with(slice(ea, 1, least(16, size(ea))),"
                " slice(eb, 1, least(16, size(eb))), (x, y) -> x * y),"
                " 0L, (acc, v) -> acc + v)"
            ).alias("dot16"),
            F.expr(
                "aggregate(zip_with(ea, eb, (x, y) -> x * y),"
                " 0L, (acc, v) -> acc + v)"
            ).alias("dot_full"),
        )
    )
    w16 = Window.partitionBy("qid").orderBy(F.col("dot16").desc(), "nid")
    wf = Window.partitionBy("qid").orderBy(F.col("dot_full").desc(), "nid")
    top16 = (
        pairs.withColumn("rn", F.row_number().over(w16))
        .filter(F.col("rn") == 1)
        .select("qid", "label", F.col("nid").alias("nid16"))
    )
    topf = (
        pairs.withColumn("rn", F.row_number().over(wf))
        .filter(F.col("rn") == 1)
        .select("qid", F.col("nid").alias("nidf"))
    )
    return (
        top16.join(topf, "qid")
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_queries"),
            F.sum(F.when(F.col("nid16") == F.col("nidf"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_agree"),
            F.expr(
                "CAST((1000000 * SUM(CASE WHEN nid16 = nidf THEN 1 ELSE 0"
                " END)) DIV COUNT(*) AS BIGINT)"
            ).alias("recall_ppm"),
        )
    )



@q(
    "graph_paths3",
    """WITH seq AS (
         SELECT user_id, event_type, ts, event_id,
                LEAD(event_type, 1) OVER w AS e2,
                LEAD(event_type, 2) OVER w AS e3
         FROM events
         WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
       tri AS (
         SELECT event_type AS e1, e2, e3, CAST(COUNT(*) AS BIGINT) AS n
         FROM seq WHERE e3 IS NOT NULL
         GROUP BY event_type, e2, e3),
       tot AS (SELECT CAST(SUM(n) AS BIGINT) AS t FROM tri)
       SELECT e1, e2, e3, n,
              CAST((1000000 * n) // tot.t AS BIGINT) AS share_ppm
       FROM tri CROSS JOIN tot
       ORDER BY n DESC, e1, e2, e3 LIMIT 25""",
)
def graph_paths3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Graph+ 3-step path mining: the top event-type TRIGRAMS across
    user journeys — the funnel-path table behind "what do users
    actually do in sequence" (one step beyond graph_markov's pair
    transitions and the input to any path-drop-off analysis; win_funnel
    checks ONE prescribed path, this discovers the empirical ones).
    Two LEADs share a single per-user window sort (partitioned,
    distributed), trigram counts aggregate with map-side partials, the
    1-row total is broadcast, shares are exact ppm, top-25 is a
    TakeOrdered with fully pinned tie order."""
    ev = read_table(spark, sf_dir, "events")
    uw = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        F.col("event_type").alias("e1"),
        F.lead("event_type", 1).over(uw).alias("e2"),
        F.lead("event_type", 2).over(uw).alias("e3"),
    )
    tri = (
        seq.filter(F.col("e3").isNotNull())
        .groupBy("e1", "e2", "e3")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )
    tot = tri.agg(F.sum("n").cast("bigint").alias("t"))
    return (
        tri.crossJoin(F.broadcast(tot))
        .select(
            "e1", "e2", "e3", "n",
            F.expr("CAST((1000000 * n) DIV t AS BIGINT)").alias("share_ppm"),
        )
        .orderBy(F.col("n").desc(), "e1", "e2", "e3")
        .limit(25)
    )


@q(
    "agg_standardize",
    """WITH obs AS (
         SELECT l_orderkey, l_linenumber, l_returnflag AS flag,
                CAST(l_quantity AS DECIMAL(18,4)) AS q
         FROM lineitem),
       st AS (
         SELECT flag,
                CAST(COUNT(*) AS BIGINT) AS n,
                CAST(SUM(q) AS DECIMAL(38,4)) AS s,
                CAST(SUM(q * q) AS DECIMAL(38,8)) AS ss
         FROM obs GROUP BY flag)
       SELECT o.l_orderkey, o.l_linenumber, o.flag,
              CAST(o.q AS DOUBLE) AS qty,
              (CAST(o.q AS DOUBLE) - CAST(st.s AS DOUBLE) / st.n)
                / sqrt((CAST(st.ss AS DOUBLE)
                        - CAST(st.s AS DOUBLE) * CAST(st.s AS DOUBLE) / st.n)
                       / (st.n - 1)) AS z
       FROM obs o JOIN st ON st.flag = o.flag""",
)
def agg_standardize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ML+ per-group z-score standardization: (x − μ_g)/σ_g as a
    ROW-LEVEL feature transform — the other half of feature prep next
    to win_minmax_scale (z-scores preserve outlier magnitude where
    min-max clamps the range; models disagree about which they want,
    so the engine ships both). Sufficient statistics per group
    accumulate EXACTLY in decimal (the agg_welch_ttest discipline —
    shuffle order cannot perturb them), broadcast back, and each row's
    z is one fixed-shape float expression (sub, div, sqrt — IEEE-
    identical across engines). Group stats are a tiny broadcast; the
    transform is map-side; output is input-sized, the feature-store
    shape (cf. agg_target_encode)."""
    li = read_table(spark, sf_dir, "lineitem")
    obs = li.select(
        "l_orderkey", "l_linenumber",
        F.col("l_returnflag").alias("flag"),
        F.col("l_quantity").cast("decimal(18,4)").alias("q"),
    )
    st = obs.groupBy("flag").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("q").cast("decimal(38,4)").alias("s"),
        F.sum(F.col("q") * F.col("q")).cast("decimal(38,8)").alias("ss"),
    )
    return obs.join(F.broadcast(st), "flag").select(
        "l_orderkey", "l_linenumber", "flag",
        F.col("q").cast("double").alias("qty"),
        F.expr(
            "(CAST(q AS DOUBLE) - CAST(s AS DOUBLE) / n)"
            " / sqrt((CAST(ss AS DOUBLE)"
            " - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / n) / (n - 1))"
        ).alias("z"),
    )



_SQL_API3 = """
    WITH flagged AS (
      SELECT o.o_orderpriority AS pri,
             CAST(EXTRACT(year FROM o.o_orderdate) AS BIGINT) AS yr
      FROM orders o
      WHERE EXISTS (SELECT 1 FROM lineitem l
                    WHERE l.l_orderkey = o.o_orderkey
                      AND l.l_returnflag = 'R'))
    SELECT COALESCE(pri, 'ALL') AS pri,
           COALESCE(CAST(yr AS VARCHAR(8)), 'ALL') AS yr,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM flagged
    GROUP BY GROUPING SETS ((pri, yr), (pri), ())
"""


@q("sql_api3", _SQL_API3)
def sql_api3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Third identical-ANSI-text proof: a correlated EXISTS semi-join
    feeding GROUPING SETS with COALESCE'd rollup labels — the BI
    drill-down query shape (sql_api covers join-aggregate, sql_api2
    the ranked-top-N shape). The exact string runs verbatim on
    spark.sql AND DuckDB; counts only, so parity is bit-level by
    construction. EXISTS compiles to a semi-join in both engines
    (never a correlated per-row subquery at scale); grouping-null
    labeling via COALESCE is portable where GROUPING() vendor
    variations are not."""
    for t in ("lineitem", "orders"):
        read_table(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(_SQL_API3)


@q(
    "agg_peak_concurrency",
    """WITH ev AS (
         SELECT user_id, ts, event_id,
                CASE WHEN LAG(ts) OVER (PARTITION BY user_id
                          ORDER BY ts, event_id) IS NULL
                       OR date_diff('second', LAG(ts) OVER (
                            PARTITION BY user_id ORDER BY ts, event_id), ts)
                          > 1800
                     THEN 1 ELSE 0 END AS new_s
         FROM events),
       sid AS (
         SELECT user_id, ts,
                SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                 ROWS UNBOUNDED PRECEDING) AS s
         FROM ev),
       sess AS (
         SELECT user_id, s,
                date_diff('second', TIMESTAMP '1970-01-01', MIN(ts)) AS b,
                date_diff('second', TIMESTAMP '1970-01-01', MAX(ts)) + 1 AS e
         FROM sid GROUP BY user_id, s),
       bp AS (
         SELECT b // 86400 AS day, b % 86400 AS sec, 1 AS delta FROM sess
         UNION ALL
         SELECT e // 86400 AS day, e % 86400 AS sec, -1 AS delta
         FROM sess WHERE e // 86400 = b // 86400),
       agg AS (
         SELECT day, sec, CAST(SUM(delta) AS BIGINT) AS d
         FROM bp GROUP BY day, sec),
       sweep AS (
         SELECT day,
                SUM(d) OVER (PARTITION BY day ORDER BY sec
                             ROWS UNBOUNDED PRECEDING) AS run
         FROM agg),
       carry AS (
         SELECT b // 86400 AS day, CAST(COUNT(*) AS BIGINT) AS carried
         FROM sess WHERE e // 86400 > b // 86400
         GROUP BY b // 86400),
       starts AS (
         SELECT b // 86400 AS day, CAST(COUNT(*) AS BIGINT) AS n_sessions
         FROM sess GROUP BY b // 86400)
       SELECT s.day AS epoch_day, s.n_sessions,
              CAST(COALESCE(c.carried, 0) AS BIGINT) AS n_crossing,
              CAST(MAX(w.run) + COALESCE(c.carried, 0) AS BIGINT)
                AS peak_concurrent
       FROM starts s
       JOIN sweep w ON w.day = s.day
       LEFT JOIN carry c ON c.day = s.day
       GROUP BY s.day, s.n_sessions, c.carried""",
)
def agg_peak_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D+ peak concurrent sessions per day: sessionize (30-min gap,
    the win_sessionize discipline), then a ±1 endpoint sweep — the
    capacity-planning number ("how many sessions were open AT ONCE")
    that avg-sessions-per-day hides. The scale structure is the point:
    the running sum PARTITIONS BY DAY (each day's sweep is its own
    task — never one global time-ordered scan), and sessions that
    cross midnight join in as a per-day CARRY-IN count instead of
    extending the sweep (within-day closes of crossing sessions are
    intentionally counted at day grain — peak_concurrent is an upper
    bound that is exact whenever crossings close before the day's
    peak; documented contract, exact in both engines identically).
    All integer epoch-second arithmetic."""
    ev_t = read_table(spark, sf_dir, "events")
    uw = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ev = ev_t.select(
        "user_id", "ts", "event_id",
        F.when(
            F.lag("ts").over(uw).isNull()
            | (
                F.unix_timestamp("ts")
                - F.unix_timestamp(F.lag("ts").over(uw))
                > 1800
            ),
            1,
        ).otherwise(0).alias("new_s"),
    )
    sid = ev.select(
        "user_id", "ts",
        F.sum("new_s").over(
            uw.rowsBetween(Window.unboundedPreceding, 0)
        ).alias("s"),
    )
    sess = sid.groupBy("user_id", "s").agg(
        F.unix_timestamp(F.min("ts")).alias("b"),
        (F.unix_timestamp(F.max("ts")) + 1).alias("e"),
    )
    bp = sess.select(
        F.expr("b DIV 86400").alias("day"),
        F.expr("b % 86400").alias("sec"),
        F.lit(1).alias("delta"),
    ).unionAll(
        sess.filter(F.expr("e DIV 86400 = b DIV 86400")).select(
            F.expr("e DIV 86400").alias("day"),
            F.expr("e % 86400").alias("sec"),
            F.lit(-1).alias("delta"),
        )
    )
    agg = bp.groupBy("day", "sec").agg(F.sum("delta").cast("bigint").alias("d"))
    dw = Window.partitionBy("day").orderBy("sec").rowsBetween(
        Window.unboundedPreceding, 0
    )
    sweep = agg.select("day", F.sum("d").over(dw).alias("run"))
    carry = (
        sess.filter(F.expr("e DIV 86400 > b DIV 86400"))
        .groupBy(F.expr("b DIV 86400").alias("day"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("carried"))
    )
    starts = sess.groupBy(F.expr("b DIV 86400").alias("day")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_sessions")
    )
    return (
        starts.join(sweep, "day")
        .join(carry, "day", "left")
        .groupBy("day", "n_sessions", "carried")
        .agg(F.max("run").alias("mx"))
        .select(
            F.col("day").alias("epoch_day"),
            "n_sessions",
            F.coalesce("carried", F.lit(0)).cast("bigint").alias("n_crossing"),
            (F.col("mx") + F.coalesce("carried", F.lit(0)))
            .cast("bigint")
            .alias("peak_concurrent"),
        )
    )


@q(
    "qa_column_diversity",
    """WITH u AS (
         SELECT 'o_orderpriority' AS col, o_orderpriority AS v FROM orders
         UNION ALL
         SELECT 'o_orderstatus', o_orderstatus FROM orders
         UNION ALL
         SELECT 'l_returnflag', l_returnflag FROM lineitem
         UNION ALL
         SELECT 'l_linestatus', l_linestatus FROM lineitem),
       c AS (
         SELECT col, v, CAST(COUNT(*) AS BIGINT) AS cnt
         FROM u GROUP BY col, v),
       s AS (
         SELECT col, CAST(SUM(cnt) AS BIGINT) AS n,
                CAST(SUM(cnt * cnt) AS HUGEINT) AS s2,
                CAST(COUNT(*) AS BIGINT) AS n_distinct
         FROM c GROUP BY col)
       SELECT col, n, n_distinct,
              CAST((1000000 * (CAST(n AS HUGEINT) * n - s2))
                   // (CAST(n AS HUGEINT) * n) AS BIGINT) AS simpson_ppm,
              CAST((1000000 * CAST(n AS HUGEINT) * n) // s2 AS BIGINT)
                AS eff_values_ppm
       FROM s""",
)
def qa_column_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """QA+ categorical-column diversity profile: per column, the
    Gini-Simpson index and effective number of values (inverse
    Simpson) — the profiling number qa_profile's raw n_distinct
    can't give (a column with 1M distincts where one value is 99.9%
    of rows is effectively constant; eff_values says so). Same
    rational-ppm discipline as agg_simpson, per column, in
    int128/DECIMAL. Skew in categorical columns is also the
    join-planning signal (a dominant value is the hot key
    join_salted exists for). One union-of-projections scan per
    column, value-count-sized intermediates, 4-row output."""
    o = read_table(spark, sf_dir, "orders")
    li = read_table(spark, sf_dir, "lineitem")
    u = (
        o.select(F.lit("o_orderpriority").alias("col"),
                 F.col("o_orderpriority").alias("v"))
        .unionAll(o.select(F.lit("o_orderstatus"), F.col("o_orderstatus")))
        .unionAll(li.select(F.lit("l_returnflag"), F.col("l_returnflag")))
        .unionAll(li.select(F.lit("l_linestatus"), F.col("l_linestatus")))
    )
    c = u.groupBy("col", "v").agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    D = "DECIMAL(38,0)"
    s = c.groupBy("col").agg(
        F.sum("cnt").cast("bigint").alias("n"),
        F.sum(F.expr(f"CAST(cnt AS {D}) * cnt")).alias("s2"),
        F.count(F.lit(1)).cast("bigint").alias("n_distinct"),
    )
    return s.select(
        "col", "n", "n_distinct",
        F.expr(
            f"CAST((1000000 * (CAST(n AS {D}) * n - s2))"
            f" DIV (CAST(n AS {D}) * n) AS BIGINT)"
        ).alias("simpson_ppm"),
        F.expr(
            f"CAST((1000000 * CAST(n AS {D}) * n) DIV s2 AS BIGINT)"
        ).alias("eff_values_ppm"),
    )



@q(
    "join_pit_scd2",
    """WITH o AS (
         SELECT user_id, ts, event_id, event_type,
                lag(event_type) OVER (PARTITION BY user_id
                    ORDER BY ts, event_id) AS prev
         FROM events),
       chg AS (
         SELECT user_id, ts, event_id, event_type
         FROM o WHERE prev IS NULL OR prev <> event_type),
       dim AS (
         SELECT user_id, event_type AS state, ts AS valid_from,
                lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                  AS valid_to
         FROM chg),
       probes AS (
         SELECT user_id, ts AS at_ts, event_id
         FROM events WHERE event_id % 17 = 0)
       SELECT p.user_id, p.event_id, d.state
       FROM probes p JOIN dim d
         ON d.user_id = p.user_id
        AND d.valid_from <= p.at_ts
        AND (d.valid_to IS NULL OR p.at_ts < d.valid_to)""",
)
def join_pit_scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5/C+ point-in-time dimension lookup: the standard CONSUMER of
    merge_scd2's type-2 dimension — "what was this user's state at
    time T" resolved by joining each probe into its validity window
    (valid_from ≤ T < valid_to, NULL = open-ended current row). This is
    THE feature-store correctness join: training examples must see
    attribute values as-of the label time, and the half-open window
    predicate is exactly what prevents the future-leakage bug a naive
    latest-value join commits. Plan: the window predicate rides on a
    USER-keyed equi-join (co-partitioned with the dimension — never a
    broadcast-nested-loop, because the equality on user_id drives the
    join), and each probe matches exactly ONE version row by
    construction (windows partition time). Probes are a deterministic
    1-in-17 sample of events. The global COUNT window is over the
    already-joined result for a self-describing row count — removed at
    scale or partitioned in production (one-task whitelist)."""
    ev = read_table(spark, sf_dir, "events")
    uw = Window.partitionBy("user_id").orderBy("ts", "event_id")
    o = ev.select(
        "user_id", "ts", "event_id", "event_type",
        F.lag("event_type").over(uw).alias("prev"),
    )
    chg = o.filter(
        F.col("prev").isNull() | (F.col("prev") != F.col("event_type"))
    )
    dim = chg.select(
        "user_id",
        F.col("event_type").alias("state"),
        F.col("ts").alias("valid_from"),
        F.lead("ts").over(uw).alias("valid_to"),
    )
    probes = ev.filter(F.col("event_id") % 17 == 0).select(
        "user_id", F.col("ts").alias("at_ts"), "event_id"
    )
    return probes.join(
        dim,
        (probes.user_id == dim.user_id)
        & (dim.valid_from <= probes.at_ts)
        & (dim.valid_to.isNull() | (probes.at_ts < dim.valid_to)),
    ).select(probes.user_id, "event_id", "state")


@q(
    "text_boilerplate_strip",
    """WITH lines AS (
         SELECT doc_id, trim(l) AS line
         FROM (SELECT doc_id, unnest(string_split(text, '.')) AS l
               FROM documents)
         WHERE trim(l) <> ''),
       df AS (
         SELECT line, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs
         FROM lines GROUP BY line),
       flagged AS (
         SELECT l.doc_id, l.line, df.n_docs >= 20 AS is_boiler
         FROM lines l JOIN df ON df.line = l.line)
       SELECT doc_id,
              CAST(COUNT(*) AS BIGINT) AS n_lines,
              CAST(SUM(CASE WHEN is_boiler THEN 1 ELSE 0 END) AS BIGINT)
                AS n_boiler,
              CAST(SUM(CASE WHEN is_boiler THEN 0 ELSE length(line) END)
                   AS BIGINT) AS kept_chars,
              CAST((1000000 * SUM(CASE WHEN is_boiler THEN 1 ELSE 0 END))
                   // COUNT(*) AS BIGINT) AS boiler_ppm
       FROM flagged GROUP BY doc_id""",
)
def text_boilerplate_strip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K4+ boilerplate line stripping: sentences (dot-split, the
    corpus's line proxy) that recur across ≥20 documents are navigation/
    footer/template mass, not content — the frequency-based cleaner
    every web-scale corpus runs BEFORE dedup (template text inflates
    near-dup scores and poisons n-gram stats; cf. the same df-cap idea
    in sim_sparse_cosine and dedup_binary_chunks). Output per doc: line
    counts, boilerplate fraction in exact ppm, and the character mass
    that survives stripping — the downstream pipeline reads kept_chars
    as the true content size. Plan: line explode → line-keyed df agg
    (the only data-wide shuffle, well-distributed) → broadcast-scale
    flag join back → per-doc rollup."""
    docs = read_table(spark, sf_dir, "documents")
    lines = docs.select(
        "doc_id",
        F.explode(F.split(F.col("text"), "\\.")).alias("l"),
    ).select("doc_id", F.trim(F.col("l")).alias("line")).filter(
        F.col("line") != ""
    )
    df = lines.groupBy("line").agg(
        F.countDistinct("doc_id").cast("bigint").alias("n_docs")
    )
    flagged = lines.join(df, "line").select(
        "doc_id", "line", (F.col("n_docs") >= 20).alias("is_boiler")
    )
    return flagged.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_lines"),
        F.sum(F.when(F.col("is_boiler"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_boiler"),
        F.sum(
            F.when(F.col("is_boiler"), 0).otherwise(F.length("line"))
        )
        .cast("bigint")
        .alias("kept_chars"),
        F.expr(
            "CAST((1000000 * SUM(CASE WHEN is_boiler THEN 1 ELSE 0 END))"
            " DIV COUNT(*) AS BIGINT)"
        ).alias("boiler_ppm"),
    )


@q(
    "win_rolling_slope",
    """WITH day AS (
         SELECT CAST(o_orderdate AS DATE) AS d,
                date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))
                  AS x,
                CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,4)) * 10000
                              AS BIGINT)) AS BIGINT) AS y
         FROM orders GROUP BY CAST(o_orderdate AS DATE)),
       f AS (
         SELECT d, y,
                CAST(COUNT(*) OVER w AS BIGINT) AS n,
                CAST(SUM(CAST(x AS HUGEINT)) OVER w AS HUGEINT) AS sx,
                CAST(SUM(CAST(y AS HUGEINT)) OVER w AS HUGEINT) AS sy,
                CAST(SUM(CAST(x AS HUGEINT) * x) OVER w AS HUGEINT) AS sxx,
                CAST(SUM(CAST(x AS HUGEINT) * y) OVER w AS HUGEINT) AS sxy
         FROM day
         WINDOW w AS (ORDER BY d ROWS BETWEEN 19 PRECEDING AND CURRENT ROW))
       SELECT d AS day, y AS rev_c,
              CASE WHEN n = 20 THEN
                CAST(n * sxy - sx * sy AS DOUBLE)
                  / CAST(n * sxx - sx * sx AS DOUBLE) END AS slope_c_per_day
       FROM f""",
)
def win_rolling_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E+ rolling 20-day OLS trend: the least-squares slope of daily
    revenue against the day index over a sliding window — the trend
    detector that answers "is revenue RISING" with a rate (cents/day),
    where win_dod_growth gives one noisy step and agg_regression fits
    one global line. All five sufficient sums share ONE window sort
    (the win_rolling_corr discipline) and accumulate exactly in
    int128/DECIMAL; the slope is a single double division of two exact
    integers (IEEE-identical), emitted only for full 20-day windows.
    Day-grain window — one-task whitelisted; per-entity trends
    PARTITION BY key and distribute."""
    o = read_table(spark, sf_dir, "orders")
    day = o.groupBy(F.col("o_orderdate").cast("date").alias("d")).agg(
        F.sum(
            F.expr("CAST(CAST(o_totalprice AS DECIMAL(18,4)) * 10000 AS BIGINT)")
        )
        .cast("bigint")
        .alias("y"),
    ).withColumn("x", F.expr("datediff(d, DATE'1970-01-01')"))
    D = "DECIMAL(38,0)"
    w = Window.orderBy("d").rowsBetween(-19, 0)
    f = day.select(
        "d", "y",
        F.count(F.lit(1)).over(w).alias("n"),
        F.sum(F.expr(f"CAST(x AS {D})")).over(w).alias("sx"),
        F.sum(F.expr(f"CAST(y AS {D})")).over(w).alias("sy"),
        F.sum(F.expr(f"CAST(x AS {D}) * x")).over(w).alias("sxx"),
        F.sum(F.expr(f"CAST(x AS {D}) * y")).over(w).alias("sxy"),
    )
    return f.select(
        F.col("d").alias("day"),
        F.col("y").alias("rev_c"),
        F.when(
            F.col("n") == 20,
            F.expr(
                "CAST(n * sxy - sx * sy AS DOUBLE)"
                " / CAST(n * sxx - sx * sx AS DOUBLE)"
            ),
        ).alias("slope_c_per_day"),
    )



@q(
    "interval_liftover",
    """WITH ivs AS (
         SELECT s_suppkey AS iv_id,
                CAST(s_suppkey % 5 AS VARCHAR) AS chromosome,
                CAST(s_suppkey * 97 + 1 AS BIGINT) AS b,
                CAST(s_suppkey * 97 + 1 + 200 + (s_suppkey % 7) * 500
                     AS BIGINT) AS e
         FROM supplier),
       chain AS (
         SELECT CAST(c AS VARCHAR) AS chromosome,
                CAST(k * 10000 AS BIGINT) AS src_s,
                CAST((k + 1) * 10000 AS BIGINT) AS src_e,
                CAST(500000 + c * 200000 + k * 10000
                     + (k * 977 + c * 131) % 5000 AS BIGINT) AS dst_s
         FROM unnest(range(0, 5)) AS tc(c), unnest(range(0, 11)) AS tk(k)
         WHERE k <> 7),
       mapped AS (
         SELECT i.iv_id, i.chromosome, i.b, i.e,
                greatest(i.b, c.src_s) AS cb, least(i.e, c.src_e) AS ce,
                c.dst_s + greatest(i.b, c.src_s) - c.src_s AS db,
                c.dst_s + least(i.e, c.src_e) - c.src_s AS de
         FROM ivs i JOIN chain c
           ON c.chromosome = i.chromosome
          AND i.b < c.src_e AND i.e > c.src_s)
       SELECT iv_id, chromosome, CAST(b AS BIGINT) AS src_begin,
              CAST(e AS BIGINT) AS src_end,
              CAST(db AS BIGINT) AS dst_begin, CAST(de AS BIGINT) AS dst_end,
              CAST(ce - cb AS BIGINT) AS mapped_bp,
              CAST((1000000 * (ce - cb)) // (e - b) AS BIGINT)
                AS mapped_ppm
       FROM mapped""",
)
def interval_liftover(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4/C1+ coordinate liftover: remap intervals between genome
    assemblies through a chain of (src block → dst offset) alignment
    blocks — the UCSC liftOver operation every cross-build variant
    database needs (varda-core: GRCh37 coordinates arriving into a
    GRCh38 warehouse). Each interval joins its overlapping chain
    blocks (chromosome-keyed equi-join + overlap predicate, binned
    strategy at genome scale), is CLIPPED to each block, and emits one
    remapped fragment per block — intervals spanning a chain gap (the
    synthetic chain drops block k=7, like real assembly gaps) lose
    that slice, and mapped_ppm reports exactly how much survived (the
    partial-mapping accounting real liftOver prints as warnings).
    Deterministic synthetic chain in both engines; integer coordinate
    arithmetic throughout."""
    s = read_table(spark, sf_dir, "supplier")
    ivs = s.select(
        F.col("s_suppkey").alias("iv_id"),
        (F.col("s_suppkey") % 5).cast("string").alias("chromosome"),
        (F.col("s_suppkey") * 97 + 1).cast("long").alias("b"),
        (
            F.col("s_suppkey") * 97 + 1 + 200
            + (F.col("s_suppkey") % 7) * 500
        ).cast("long").alias("e"),
    )
    chain = (
        spark.range(5)
        .select(F.col("id").alias("c"))
        .select(
            "c", F.explode(F.sequence(F.lit(0), F.lit(10))).alias("k")
        )
        .filter(F.col("k") != 7)
        .select(
            F.col("c").cast("string").alias("chromosome"),
            (F.col("k") * 10000).cast("long").alias("src_s"),
            ((F.col("k") + 1) * 10000).cast("long").alias("src_e"),
            (
                F.lit(500000)
                + F.col("c") * 200000
                + F.col("k") * 10000
                + (F.col("k") * 977 + F.col("c") * 131) % 5000
            ).cast("long").alias("dst_s"),
        )
    )
    m = ivs.join(
        F.broadcast(chain),
        (ivs.chromosome == chain.chromosome)
        & (ivs.b < chain.src_e)
        & (ivs.e > chain.src_s),
    ).select(
        "iv_id", ivs.chromosome, "b", "e",
        F.greatest("b", "src_s").alias("cb"),
        F.least("e", "src_e").alias("ce"),
        (F.col("dst_s") + F.greatest("b", "src_s") - F.col("src_s")).alias(
            "db"
        ),
        (F.col("dst_s") + F.least("e", "src_e") - F.col("src_s")).alias("de"),
    )
    return m.select(
        "iv_id", "chromosome",
        F.col("b").cast("bigint").alias("src_begin"),
        F.col("e").cast("bigint").alias("src_end"),
        F.col("db").cast("bigint").alias("dst_begin"),
        F.col("de").cast("bigint").alias("dst_end"),
        (F.col("ce") - F.col("cb")).cast("bigint").alias("mapped_bp"),
        F.expr(
            "CAST((1000000 * (ce - cb)) DIV (e - b) AS BIGINT)"
        ).alias("mapped_ppm"),
    )


@q(
    "freq_popmax",
    """WITH gt AS (
         SELECT l_partkey AS site_id, l_suppkey % 3 AS pop,
                CASE WHEN l_orderkey % 3 = 0 THEN 2
                     WHEN l_orderkey % 3 = 1 THEN 1 ELSE 0 END AS n_ref
         FROM lineitem),
       af AS (
         SELECT site_id, pop,
                CAST(SUM(2 - n_ref) AS BIGINT) AS alt_c,
                CAST(2 * COUNT(*) AS BIGINT) AS an
         FROM gt GROUP BY site_id, pop),
       ppm AS (
         SELECT site_id, pop,
                CAST((1000000 * alt_c) // an AS BIGINT) AS af_ppm
         FROM af WHERE an > 0),
       px AS (
         SELECT site_id, MAX(af_ppm) AS popmax_ppm FROM ppm GROUP BY site_id)
       SELECT p.site_id, p.popmax_ppm,
              CAST(MIN(m.pop) AS BIGINT) AS popmax_pop,
              CAST(COUNT(*) AS BIGINT) AS n_pops_at_max
       FROM px p JOIN ppm m
         ON m.site_id = p.site_id AND m.af_ppm = p.popmax_ppm
       GROUP BY p.site_id, p.popmax_ppm""",
)
def freq_popmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Varda-core popmax allele frequency: per site, the MAXIMUM
    alternate-allele frequency across populations and which population
    attains it — the gnomAD-style number clinical filtering keys on
    (a variant common in ANY population is unlikely pathogenic, even
    if rare in the pooled cohort — pooled AF systematically
    understates; that's the whole point of popmax). Per-population AFs
    are exact ppm floors; the argmax resolves ties to the smallest
    population id and reports the tie width. Three populations from
    suppkey%3, genotypes the freq_hwe synthesis. Plan: one
    (site, pop)-keyed agg, one site-keyed max + argmax join — both
    map-side-partial shuffles, site-sized output."""
    li = read_table(spark, sf_dir, "lineitem")
    gt = li.select(
        F.col("l_partkey").alias("site_id"),
        (F.col("l_suppkey") % 3).alias("pop"),
        F.expr(
            "CASE WHEN l_orderkey % 3 = 0 THEN 2"
            " WHEN l_orderkey % 3 = 1 THEN 1 ELSE 0 END"
        ).alias("n_ref"),
    )
    af = gt.groupBy("site_id", "pop").agg(
        F.sum(2 - F.col("n_ref")).cast("bigint").alias("alt_c"),
        (2 * F.count(F.lit(1))).cast("bigint").alias("an"),
    )
    ppm = af.filter(F.col("an") > 0).select(
        "site_id", "pop",
        F.expr("CAST((1000000 * alt_c) DIV an AS BIGINT)").alias("af_ppm"),
    )
    px = ppm.groupBy("site_id").agg(F.max("af_ppm").alias("popmax_ppm"))
    m = ppm.select(
        F.col("site_id").alias("m_site"), "pop",
        F.col("af_ppm").alias("m_ppm"),
    )
    return (
        px.join(
            m,
            (F.col("m_site") == px.site_id)
            & (F.col("m_ppm") == px.popmax_ppm),
        )
        .groupBy("site_id", "popmax_ppm")
        .agg(
            F.min("pop").cast("bigint").alias("popmax_pop"),
            F.count(F.lit(1)).cast("bigint").alias("n_pops_at_max"),
        )
        .select("site_id", "popmax_ppm", "popmax_pop", "n_pops_at_max")
    )



@q(
    "freq_split_multiallelic",
    """WITH rec AS (
         SELECT p_partkey AS site_id,
                CAST(p_partkey % 5 AS VARCHAR) AS chromosome,
                CAST(p_partkey * 31 + 1 AS BIGINT) AS position,
                1 + p_partkey % 3 AS n_alts,
                CAST(100 + p_partkey % 50 AS BIGINT) AS an
         FROM part),
       split AS (
         SELECT site_id, chromosome, position, n_alts, an,
                CAST(a AS BIGINT) AS allele_idx,
                CAST((site_id * 7 + a * 13) % (an // 2) AS BIGINT) AS ac
         FROM rec, unnest(range(1, n_alts + 1)) AS t(a))
       SELECT site_id, chromosome, position, allele_idx,
              CAST(n_alts AS BIGINT) AS n_alts, ac, an,
              CAST((1000000 * ac) // an AS BIGINT) AS af_ppm,
              n_alts > 1 AS was_multiallelic
       FROM split""",
)
def freq_split_multiallelic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1/H2+ multiallelic decomposition: records carrying several ALT
    alleles explode into ONE ROW PER ALLELE with per-allele AC and the
    shared AN — bcftools norm -m- semantics, the normalization step
    every variant warehouse runs before keys are comparable (a biallelic
    row for G>A must match whether it arrived alone or inside a
    G>A,T record; varda's variant-key normalization assumes it —
    cf. str_trim_alleles for the complementary allele-trim step).
    Synthetic records: 1-3 alts from partkey, deterministic per-allele
    counts bounded by AN/2 in both engines. Plan: map-side explode
    (fan-out ≤ 3), no shuffle at all — the whole operator is a
    projection; af_ppm exact floors."""
    pt = read_table(spark, sf_dir, "part")
    rec = pt.select(
        F.col("p_partkey").alias("site_id"),
        (F.col("p_partkey") % 5).cast("string").alias("chromosome"),
        (F.col("p_partkey") * 31 + 1).cast("long").alias(
            "position"
        ),
        (1 + F.col("p_partkey") % 3).alias("n_alts"),
        (100 + F.col("p_partkey") % 50).cast("long").alias("an"),
    )
    split = rec.select(
        "site_id", "chromosome", "position", "n_alts", "an",
        F.explode(F.expr("sequence(1, CAST(n_alts AS INT))")).alias(
            "allele_idx"
        ),
    ).withColumn(
        "ac",
        F.expr(
            "CAST((site_id * 7 + allele_idx * 13) % (an DIV 2) AS BIGINT)"
        ),
    )
    return split.select(
        "site_id", "chromosome", "position",
        F.col("allele_idx").cast("bigint").alias("allele_idx"),
        F.col("n_alts").cast("bigint").alias("n_alts"),
        "ac", "an",
        F.expr("CAST((1000000 * ac) DIV an AS BIGINT)").alias("af_ppm"),
        (F.col("n_alts") > 1).alias("was_multiallelic"),
    )


@q(
    "agg_rate_wilson",
    """WITH base AS (
         SELECT event_type,
                CAST(COUNT(*) AS BIGINT) AS n,
                CAST(SUM(CASE WHEN value > 1.0 THEN 1 ELSE 0 END) AS BIGINT)
                  AS k
         FROM events GROUP BY event_type)
       SELECT event_type, n, k,
              CAST((1000000 * k) // n AS BIGINT) AS rate_ppm,
              (CAST(k AS DOUBLE) / n + 1.959964 * 1.959964 / (2.0 * n)
               - 1.959964 * sqrt((CAST(k AS DOUBLE) / n)
                                 * (1.0 - CAST(k AS DOUBLE) / n) / n
                                 + 1.959964 * 1.959964 / (4.0 * n * n)))
                / (1.0 + 1.959964 * 1.959964 / n) AS wilson_lo,
              (CAST(k AS DOUBLE) / n + 1.959964 * 1.959964 / (2.0 * n)
               + 1.959964 * sqrt((CAST(k AS DOUBLE) / n)
                                 * (1.0 - CAST(k AS DOUBLE) / n) / n
                                 + 1.959964 * 1.959964 / (4.0 * n * n)))
                / (1.0 + 1.959964 * 1.959964 / n) AS wilson_hi
       FROM base""",
)
def agg_rate_wilson(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D+ rate with Wilson 95% score interval per event type — the
    uncertainty band every dashboard rate should carry (Wilson beats
    the naive ±1.96·se Wald interval near 0/1 and at small n, where
    Wald's bounds escape [0,1]). The point rate is an exact ppm floor;
    the interval is one fixed-shape float expression with the z
    constant pinned as a literal (the agg_power_analysis discipline) —
    sub/mul/div/sqrt only, IEEE-identical across engines. One grouped
    agg, type-count-sized output; pairs with agg_calibration_bins
    (is the rate RIGHT) and agg_ab_srm (is the denominator right)."""
    ev = read_table(spark, sf_dir, "events")
    base = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.when(F.col("value") > 1.0, 1).otherwise(0))
        .cast("bigint")
        .alias("k"),
    )
    z2 = "1.959964 * 1.959964"
    core = (
        f"(CAST(k AS DOUBLE) / n + {z2} / (2.0 * n) {{sign}} 1.959964"
        f" * sqrt((CAST(k AS DOUBLE) / n) * (1.0 - CAST(k AS DOUBLE) / n)"
        f" / n + {z2} / (4.0 * n * n))) / (1.0 + {z2} / n)"
    )
    return base.select(
        "event_type", "n", "k",
        F.expr("CAST((1000000 * k) DIV n AS BIGINT)").alias("rate_ppm"),
        F.expr(core.format(sign="-")).alias("wilson_lo"),
        F.expr(core.format(sign="+")).alias("wilson_hi"),
    )



@q(
    "graph_butterflies",
    """WITH lp AS (
         SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
       pairs AS (
         SELECT a.p AS p1, b.p AS p2, CAST(COUNT(*) AS BIGINT) AS co
         FROM lp a JOIN lp b ON b.o = a.o AND b.p > a.p
         GROUP BY a.p, b.p),
       bf AS (
         SELECT CAST(SUM(co * (co - 1) / 2) AS BIGINT) AS butterflies,
                CAST(SUM(CASE WHEN co >= 2 THEN 1 ELSE 0 END) AS BIGINT)
                  AS n_pairs_ge2,
                CAST(COUNT(*) AS BIGINT) AS n_pairs,
                CAST(SUM(co) AS BIGINT) AS wedges
         FROM pairs)
       SELECT butterflies, n_pairs_ge2, n_pairs, wedges,
              CAST((1000000 * CAST(butterflies AS HUGEINT))
                   // greatest(wedges, 1) AS BIGINT) AS closure_ppm
       FROM bf""",
)
def graph_butterflies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Graph+ butterfly counting: the number of complete 2×2 bicliques
    (two orders sharing the same two parts) in the bipartite
    order-part graph — the bipartite analog of the triangle count, and
    the base of bipartite clustering coefficients (closure_ppm =
    butterflies / co-purchase wedges — how often a shared-part pair
    repeats across baskets; recommender datasets live on this number).
    Counting identity: Σ over part pairs of C(co-occurrence, 2) —
    candidate pairs fan out PER BASKET (the graph_jaccard lesson:
    per-order pair generation is bounded by basket width ≤ 7, never by
    part popularity), co-counts aggregate with map-side partials, and
    the final row is four exact integers + one int128 ppm. co·(co−1)/2
    is always even product — integer division exact in both engines."""
    li = read_table(spark, sf_dir, "lineitem")
    lp = li.select(
        F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p")
    ).distinct()
    a, b = lp.alias("a"), lp.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.o") == F.col("b.o")) & (F.col("b.p") > F.col("a.p")),
        )
        .groupBy(F.col("a.p").alias("p1"), F.col("b.p").alias("p2"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("co"))
    )
    D = "DECIMAL(38,0)"
    bf = pairs.agg(
        F.sum(F.expr("co * (co - 1) DIV 2")).cast("bigint").alias(
            "butterflies"
        ),
        F.sum(F.when(F.col("co") >= 2, 1).otherwise(0))
        .cast("bigint")
        .alias("n_pairs_ge2"),
        F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
        F.sum("co").cast("bigint").alias("wedges"),
    )
    return bf.select(
        "butterflies", "n_pairs_ge2", "n_pairs", "wedges",
        F.expr(
            f"CAST((1000000 * CAST(butterflies AS {D}))"
            f" DIV greatest(wedges, 1) AS BIGINT)"
        ).alias("closure_ppm"),
    )


@q(
    "text_chunk_rag",
    """WITH words AS (
         SELECT doc_id, string_split(trim(text), ' ') AS w FROM documents),
       chunks AS (
         SELECT doc_id, CAST(k AS BIGINT) AS chunk_idx,
                1 + 20 * k AS tok_begin,
                least(1 + 20 * k + 39, len(w)) AS tok_end, w
         FROM (SELECT doc_id, w,
                      unnest(range(0, greatest((len(w) - 20 + 19) // 20, 1)))
                        AS k
               FROM words))
       SELECT doc_id, chunk_idx,
              CAST(tok_begin AS BIGINT) AS tok_begin,
              CAST(tok_end AS BIGINT) AS tok_end,
              CAST(tok_end - tok_begin + 1 AS BIGINT) AS n_tokens,
              md5(array_to_string(w[tok_begin:tok_end], ' ')) AS chunk_md5
       FROM chunks WHERE tok_begin <= len(w)""",
)
def text_chunk_rag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K4+ retrieval-ingestion chunking: 40-token windows with stride
    20 (50% overlap) per document (sized to the shipped ~40-90-token
    docs; production RAG uses 100/50 — same integer machinery), each chunk carrying its token span
    and a content digest — the exact shape a RAG indexing pipeline
    feeds to the embedder (overlap so no answer straddles a boundary;
    spans so citations can highlight; digests so re-ingestion skips
    unchanged chunks — the dedup_exact guard at chunk grain). Chunk
    count is ⌈(len−20)/20⌉ with a 1-chunk floor for short docs (both
    engines compute the identical ceiling in integers). Map-side
    explode with fan-out len/50 — no shuffle; the digest is md5 of the
    space-joined token slice, bit-identical across engines."""
    docs = read_table(spark, sf_dir, "documents")
    words = docs.select(
        "doc_id", F.split(F.trim(F.col("text")), " ").alias("w")
    )
    chunks = words.select(
        "doc_id", "w",
        F.explode(
            F.expr(
                "sequence(0, CAST(greatest((size(w) - 20 + 19) DIV 20, 1)"
                " AS INT) - 1)"
            )
        ).alias("k"),
    ).select(
        "doc_id",
        F.col("k").cast("bigint").alias("chunk_idx"),
        (1 + 20 * F.col("k")).alias("tok_begin"),
        F.expr("least(1 + 20 * k + 39, size(w))").alias("tok_end"),
        "w",
    ).filter(F.expr("tok_begin <= size(w)"))
    return chunks.select(
        "doc_id", "chunk_idx",
        F.col("tok_begin").cast("bigint").alias("tok_begin"),
        F.col("tok_end").cast("bigint").alias("tok_end"),
        (F.col("tok_end") - F.col("tok_begin") + 1)
        .cast("bigint")
        .alias("n_tokens"),
        F.md5(
            F.expr(
                "CAST(array_join(slice(w, CAST(tok_begin AS INT),"
                " CAST(tok_end - tok_begin + 1 AS INT)), ' ') AS BINARY)"
            )
        ).alias("chunk_md5"),
    )



@q(
    "agg_skyline",
    """WITH pts AS (
         SELECT DISTINCT o.o_orderpriority AS grp,
                CAST(CAST(o.o_totalprice AS DECIMAL(18,4)) * 10000 AS BIGINT)
                  AS price_c,
                date_diff('day', CAST(o.o_orderdate AS DATE),
                          CAST(MIN(l.l_shipdate) AS DATE)) AS lead_d
         FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
         GROUP BY o.o_orderkey, o.o_orderpriority, o.o_orderdate,
                  o.o_totalprice),
       rm AS (
         SELECT grp, price_c, lead_d,
                MIN(lead_d) OVER (PARTITION BY grp
                     ORDER BY price_c, lead_d
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                  AS rmin
         FROM pts)
       SELECT grp, price_c, CAST(lead_d AS BIGINT) AS lead_d
       FROM rm WHERE rmin IS NULL OR lead_d < rmin""",
)
def agg_skyline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D+ skyline / Pareto frontier (Börzsönyi et al. 2001): per
    priority class, the orders not DOMINATED on (price, lead time) —
    no other order is both cheaper and faster — the multi-criteria
    shortlist operator of the OLAP literature. The formulation is the
    scale story: the textbook dominance test is a quadratic non-equi
    self-join, but in 2D the skyline is exactly the prefix-minimum
    chain — sort by (price asc, lead asc), keep a point iff its lead
    beats the running MIN over all strictly-preceding rows — one
    PARTITIONED window per group, O(n log n), distributed (the
    block-nested-loop skyline this replaces cannot survive 100×).
    DISTINCT (price, lead) first: coincident points tie (dominance
    needs one strict inequality), and the prefix-min form keeps
    exactly one representative — the documented convention. Exact
    fixed-point cents and integer days."""
    o = read_table(spark, sf_dir, "orders")
    li = read_table(spark, sf_dir, "lineitem")
    pts = (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("o_orderkey", "o_orderpriority", "o_orderdate", "o_totalprice")
        .agg(F.min("l_shipdate").alias("ship"))
        .select(
            F.col("o_orderpriority").alias("grp"),
            F.expr(
                "CAST(CAST(o_totalprice AS DECIMAL(18,4)) * 10000 AS BIGINT)"
            ).alias("price_c"),
            F.expr(
                "datediff(CAST(ship AS DATE), CAST(o_orderdate AS DATE))"
            ).alias("lead_d"),
        )
        .distinct()
    )
    w = (
        Window.partitionBy("grp")
        .orderBy("price_c", "lead_d")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    rm = pts.withColumn("rmin", F.min("lead_d").over(w))
    return rm.filter(
        F.col("rmin").isNull() | (F.col("lead_d") < F.col("rmin"))
    ).select("grp", "price_c", F.col("lead_d").cast("bigint").alias("lead_d"))



@q(
    "agg_cuped",
    """WITH u AS (
         SELECT user_id,
                CASE WHEN CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)),
                                1, 15) AS BIGINT) % 2 = 0
                     THEN 'A' ELSE 'B' END AS arm,
                CAST(SUM(CASE WHEN event_id % 2 = 0
                              THEN CAST(value AS DECIMAL(18,4)) END)
                     AS DECIMAL(38,4)) AS x,
                CAST(SUM(CASE WHEN event_id % 2 = 1
                              THEN CAST(value AS DECIMAL(18,4)) END)
                     AS DECIMAL(38,4)) AS y
         FROM events GROUP BY user_id),
       f AS (
         SELECT arm, x, y FROM u WHERE x IS NOT NULL AND y IS NOT NULL),
       g AS (
         SELECT CAST(COUNT(*) AS BIGINT) AS n,
                CAST(SUM(x) AS DOUBLE) AS sx, CAST(SUM(y) AS DOUBLE) AS sy,
                CAST(SUM(x * x) AS DOUBLE) AS sxx,
                CAST(SUM(x * y) AS DOUBLE) AS sxy
         FROM f),
       arm_stats AS (
         SELECT arm, CAST(COUNT(*) AS BIGINT) AS n_arm,
                CAST(SUM(x) AS DOUBLE) AS sx_a,
                CAST(SUM(y) AS DOUBLE) AS sy_a
         FROM f GROUP BY arm)
       SELECT a.arm, a.n_arm,
              a.sy_a / a.n_arm AS raw_mean,
              a.sy_a / a.n_arm
                - ((g.n * g.sxy - g.sx * g.sy) / (g.n * g.sxx - g.sx * g.sx))
                  * (a.sx_a / a.n_arm - g.sx / g.n) AS cuped_mean,
              (g.n * g.sxy - g.sx * g.sy) / (g.n * g.sxx - g.sx * g.sx)
                AS theta
       FROM arm_stats a CROSS JOIN g""",
)
def agg_cuped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ML+ CUPED variance reduction (Deng et al. 2013): adjust each
    arm's metric by the pre-experiment covariate, Ŷ = Ȳ −
    θ(X̄_arm − X̄), θ = cov(X,Y)/var(X) — the standard trick that cuts
    experiment runtime ~30-50% when a correlated pre-period metric
    exists (here: even-id events as pre-period X, odd-id as in-period
    Y, per user). The ALGEBRAIC form is the exactness trick: the
    per-row adjustment collapses to group-level sufficient statistics,
    so no order-dependent sum of adjusted doubles exists — decimal-
    exact sums take ONE deterministic cast and feed a fixed-shape
    float expression (the agg_welch_ttest discipline). Completes the
    experimentation suite: agg_ab_srm (validity) → agg_power_analysis
    (sizing) → CUPED (efficiency) → welch/mannwhitney (readout).
    1-user-keyed agg + arm rollup + 1-row broadcast."""
    ev = read_table(spark, sf_dir, "events")
    u = ev.groupBy("user_id").agg(
        F.sum(
            F.when(
                F.col("event_id") % 2 == 0,
                F.col("value").cast("decimal(18,4)"),
            )
        ).cast("decimal(38,4)").alias("x"),
        F.sum(
            F.when(
                F.col("event_id") % 2 == 1,
                F.col("value").cast("decimal(18,4)"),
            )
        ).cast("decimal(38,4)").alias("y"),
    ).withColumn(
        "arm",
        F.expr(
            "CASE WHEN CAST(conv(substring(md5(CAST(user_id AS STRING)),"
            " 1, 15), 16, 10) AS BIGINT) % 2 = 0 THEN 'A' ELSE 'B' END"
        ),
    )
    f = u.filter(F.col("x").isNotNull() & F.col("y").isNotNull())
    g = f.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").cast("double").alias("sx"),
        F.sum("y").cast("double").alias("sy"),
        F.sum(F.col("x") * F.col("x")).cast("double").alias("sxx"),
        F.sum(F.col("x") * F.col("y")).cast("double").alias("sxy"),
    )
    arm_stats = f.groupBy("arm").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_arm"),
        F.sum("x").cast("double").alias("sx_a"),
        F.sum("y").cast("double").alias("sy_a"),
    )
    return arm_stats.crossJoin(F.broadcast(g)).select(
        "arm", "n_arm",
        F.expr("sy_a / n_arm").alias("raw_mean"),
        F.expr(
            "sy_a / n_arm - ((n * sxy - sx * sy) / (n * sxx - sx * sx))"
            " * (sx_a / n_arm - sx / n)"
        ).alias("cuped_mean"),
        F.expr("(n * sxy - sx * sy) / (n * sxx - sx * sx)").alias("theta"),
    )


@q(
    "agg_chainladder",
    """WITH ev AS (
         SELECT user_id,
                (date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) + 3)
                  // 7 AS wk,
                CAST(CAST(value AS DECIMAL(18,4)) * 10000 AS BIGINT) AS v_c
         FROM events),
       fw AS (SELECT user_id, MIN(wk) AS w0 FROM ev GROUP BY user_id),
       tri AS (
         SELECT f.w0 AS cohort, e.wk - f.w0 AS age,
                CAST(SUM(e.v_c) AS BIGINT) AS inc_c
         FROM ev e JOIN fw f ON f.user_id = e.user_id
         GROUP BY f.w0, e.wk - f.w0),
       cum AS (
         SELECT cohort, age,
                CAST(SUM(inc_c) OVER (PARTITION BY cohort ORDER BY age
                       ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_c
         FROM tri),
       pairs AS (
         SELECT a.age AS from_age,
                CAST(SUM(b.cum_c) AS BIGINT) AS next_sum,
                CAST(SUM(a.cum_c) AS BIGINT) AS base_sum,
                CAST(COUNT(*) AS BIGINT) AS n_cohorts
         FROM cum a JOIN cum b
           ON b.cohort = a.cohort AND b.age = a.age + 1
         GROUP BY a.age)
       SELECT CAST(from_age AS BIGINT) AS from_age, n_cohorts,
              base_sum AS base_cum_c, next_sum AS next_cum_c,
              CAST((1000000 * CAST(next_sum AS HUGEINT)) // base_sum
                   AS BIGINT) AS factor_ppm
       FROM pairs""",
)
def agg_chainladder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D+ chain-ladder development factors: the cohort×age cumulative
    triangle's age-to-age ratios f_a = Σ_c cum_{c,a+1} / Σ_c cum_{c,a}
    (volume-weighted over every cohort observed at both ages) — the
    actuarial/SaaS forecasting tool that answers "given what week-k
    cohorts did by age 2, what will the newest cohort reach": multiply
    the latest diagonal through the remaining factors. Factors are
    exact int128 ppm; the triangle itself reuses the agg_ltv_curve
    cumulative machinery (weekly cohorts, calendar-bounded windows).
    Emitting FACTORS (not the chained forecast) keeps every number
    exact — chaining multiplies ppm ratios, which the reader applies
    in their tolerance; the triangle-completion product is one line
    downstream. Heavy steps: first-touch agg + (cohort, age) agg —
    both map-side-partial shuffles."""
    ev_t = read_table(spark, sf_dir, "events")
    ev = ev_t.select(
        "user_id",
        F.expr(
            "(datediff(CAST(ts AS DATE), DATE'1970-01-01') + 3) DIV 7"
        ).alias("wk"),
        F.expr("CAST(CAST(value AS DECIMAL(18,4)) * 10000 AS BIGINT)").alias(
            "v_c"
        ),
    )
    fw = ev.groupBy("user_id").agg(F.min("wk").alias("w0"))
    tri = (
        ev.join(fw, "user_id")
        .groupBy(
            F.col("w0").alias("cohort"),
            (F.col("wk") - F.col("w0")).alias("age"),
        )
        .agg(F.sum("v_c").cast("bigint").alias("inc_c"))
    )
    cw = Window.partitionBy("cohort").orderBy("age").rowsBetween(
        Window.unboundedPreceding, 0
    )
    cum = tri.select(
        "cohort", "age", F.sum("inc_c").over(cw).cast("bigint").alias("cum_c")
    )
    a = cum.select(
        F.col("cohort").alias("ca"), F.col("age").alias("from_age"),
        F.col("cum_c").alias("base_c"),
    )
    b = cum.select(
        F.col("cohort").alias("cb"), F.col("age").alias("age_b"),
        F.col("cum_c").alias("next_c"),
    )
    pairs = (
        a.join(
            b,
            (F.col("cb") == F.col("ca"))
            & (F.col("age_b") == F.col("from_age") + 1),
        )
        .groupBy("from_age")
        .agg(
            F.sum("next_c").cast("bigint").alias("next_sum"),
            F.sum("base_c").cast("bigint").alias("base_sum"),
            F.count(F.lit(1)).cast("bigint").alias("n_cohorts"),
        )
    )
    D = "DECIMAL(38,0)"
    return pairs.select(
        F.col("from_age").cast("bigint").alias("from_age"),
        "n_cohorts",
        F.col("base_sum").alias("base_cum_c"),
        F.col("next_sum").alias("next_cum_c"),
        F.expr(
            f"CAST((1000000 * CAST(next_sum AS {D})) DIV base_sum AS BIGINT)"
        ).alias("factor_ppm"),
    )



@q(
    "agg_recency_score",
    """WITH mx AS (
         SELECT MAX(CAST(o_orderdate AS DATE)) AS dmax FROM orders),
       w AS (
         SELECT o_custkey,
                CAST(CAST(o_totalprice AS DECIMAL(18,4)) * 10000 AS BIGINT)
                  AS price_c,
                least(date_diff('day', CAST(o_orderdate AS DATE), mx.dmax)
                      // 28, 19) AS k
         FROM orders CROSS JOIN mx)
       SELECT o_custkey AS custkey,
              CAST(COUNT(*) AS BIGINT) AS n_orders,
              CAST(SUM(price_c) AS BIGINT) AS total_c,
              CAST(SUM(price_c * (1048576 >> k)) // 1048576 AS BIGINT)
                AS recency_score_c
       FROM w GROUP BY o_custkey""",
)
def agg_recency_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D+ recency-decayed customer value: each order's cents are
    weighted by 2^-(age/28d) — a 4-week half-life — and the trick is
    that restricting the half-life to WHOLE periods makes exponential
    decay EXACT integer math: weight = (2^20 >> k)/2^20, a bit shift,
    no pow()/exp() float (which engines round differently — the same
    ban as log; cf. agg_pow2_hist's exact log2). Ages cap at k=19 so
    the shift never zeroes int64 semantics differently. This is the
    CRM "hot customer" score that total spend (agg_rfm's M) misses —
    a churned whale decays, a rising regular compounds. One scan +
    customer-keyed agg with map-side partials; the 1-row max-date
    scalar broadcasts (BNLJ whitelist)."""
    o = read_table(spark, sf_dir, "orders")
    mx = o.agg(F.max(F.col("o_orderdate").cast("date")).alias("dmax"))
    w = o.crossJoin(F.broadcast(mx)).select(
        "o_custkey",
        F.expr(
            "CAST(CAST(o_totalprice AS DECIMAL(18,4)) * 10000 AS BIGINT)"
        ).alias("price_c"),
        F.expr(
            "least(datediff(dmax, CAST(o_orderdate AS DATE)) DIV 28, 19)"
        ).alias("k"),
    )
    return w.groupBy(F.col("o_custkey").alias("custkey")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_orders"),
        F.sum("price_c").cast("bigint").alias("total_c"),
        F.expr(
            "CAST(SUM(price_c * shiftright(1048576, CAST(k AS INT)))"
            " DIV 1048576 AS BIGINT)"
        ).alias("recency_score_c"),
    )



@q(
    "join_absence_sla",
    """WITH met AS (
         SELECT DISTINCT o.o_orderkey
         FROM orders o JOIN lineitem l
           ON l.l_orderkey = o.o_orderkey
          AND CAST(l.l_shipdate AS DATE)
                <= CAST(o.o_orderdate AS DATE) + 30
          AND CAST(l.l_shipdate AS DATE) >= CAST(o.o_orderdate AS DATE))
       SELECT o.o_orderkey, o.o_orderpriority,
              CAST(o.o_orderdate AS DATE) AS orderdate
       FROM orders o LEFT JOIN met m ON m.o_orderkey = o.o_orderkey
       WHERE m.o_orderkey IS NULL""",
)
def join_absence_sla(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C+ ABSENCE detection: orders with NO shipment inside the 30-day
    SLA window — the negative-space query ("which entities did NOT do
    X within T") that trips up naive writers into per-row correlated
    NOT EXISTS scans. Formulated as: one equi-join restricted by the
    window predicate builds the MET set (semi-join semantics,
    key-partitioned, the range rides along on the equi key), then one
    anti-join subtracts it — two shuffles on the same key, AQE-mergeable,
    never a nested-loop. Complements agg_leadtime (how long) and
    agg_survival (hazard over time): this is the breach LIST a
    follow-up action consumes. Both-side date casts pin identical
    day-granular comparison."""
    o = read_table(spark, sf_dir, "orders")
    li = read_table(spark, sf_dir, "lineitem")
    met = (
        o.join(
            li,
            (li.l_orderkey == o.o_orderkey)
            & (
                li.l_shipdate.cast("date")
                <= F.date_add(o.o_orderdate.cast("date"), 30)
            )
            & (li.l_shipdate.cast("date") >= o.o_orderdate.cast("date")),
        )
        .select(o.o_orderkey)
        .distinct()
    )
    return o.join(met, "o_orderkey", "left_anti").select(
        "o_orderkey", "o_orderpriority",
        F.col("o_orderdate").cast("date").alias("orderdate"),
    )


@q(
    "emb_label_outliers",
    """WITH q AS (
         SELECT vec_id, label,
                list_transform(embedding,
                    x -> CAST(floor(CAST(x AS DOUBLE) * 10000) AS BIGINT)) AS e
         FROM embeddings),
       cen AS (
         SELECT label, CAST(COUNT(*) AS BIGINT) AS n,
                i AS dim, CAST(SUM(val) AS BIGINT) AS s
         FROM (SELECT vec_id, label, unnest(range(1, len(e) + 1)) AS i, e
               FROM q) t, LATERAL (SELECT e[i] AS val) v
         GROUP BY label, i),
       d AS (
         SELECT x.vec_id, x.label,
                CAST(SUM((CAST(c.n AS HUGEINT) * x.e[c.dim] - c.s)
                         * (CAST(c.n AS HUGEINT) * x.e[c.dim] - c.s))
                     AS HUGEINT) AS dist2_n2,
                MIN(c.n) AS n
         FROM q x JOIN cen c ON c.label = x.label
         GROUP BY x.vec_id, x.label),
       rk AS (
         SELECT vec_id, label,
                CAST(dist2_n2 // (CAST(n AS HUGEINT) * n) AS BIGINT)
                  AS dist2_q,
                ROW_NUMBER() OVER (PARTITION BY label
                     ORDER BY dist2_n2 DESC, vec_id) AS rn
         FROM d)
       SELECT label, vec_id, dist2_q, CAST(rn AS BIGINT) AS outlier_rank
       FROM rk WHERE rn <= 5""",
)
def emb_label_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K3+ mislabel detection: per label, the 5 vectors FARTHEST from
    their own label centroid — the confident-learning-style screen that
    surfaces annotation errors and contamination before training
    (embedding-space outliers against their class are the classic
    mislabel signature; pairs with emb_centroid_shift's drift view).
    Exactness: the centroid is kept RATIONAL (mean = s/n never
    materializes) — distance² ranks by Σ_d (n·x_d − s_d)², an exact
    int128 integer per vector, so the per-label ordering is bit-stable;
    the reported dist2_q de-scales by n² with one floor. Plan: per-
    (label, dim) centroid sums (map-side partials over the exploded
    rows), broadcast back as a (label, dim)-keyed join, per-label
    top-5 window — all distributed by label."""
    emb = read_table(spark, sf_dir, "embeddings")
    q = emb.select(
        "vec_id", "label",
        F.expr(
            "transform(embedding,"
            " x -> CAST(floor(CAST(x AS DOUBLE) * 10000) AS BIGINT))"
        ).alias("e"),
    )
    ex = q.select("vec_id", "label", F.posexplode("e").alias("dim0", "val"))
    cen = ex.groupBy("label", "dim0").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("val").cast("bigint").alias("s"),
    )
    D = "DECIMAL(38,0)"
    d = (
        ex.join(cen, ["label", "dim0"])
        .groupBy("vec_id", "label")
        .agg(
            F.sum(
                F.expr(
                    f"(CAST(n AS {D}) * val - s) * (CAST(n AS {D}) * val - s)"
                )
            ).alias("dist2_n2"),
            F.min("n").alias("n"),
        )
    )
    w = Window.partitionBy("label").orderBy(
        F.col("dist2_n2").desc(), "vec_id"
    )
    rk = d.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= 5)
    return rk.select(
        "label", "vec_id",
        F.expr(
            f"CAST(dist2_n2 DIV (CAST(n AS {D}) * n) AS BIGINT)"
        ).alias("dist2_q"),
        F.col("rn").cast("bigint").alias("outlier_rank"),
    )



@q(
    "graph_degree_ccdf",
    f"""WITH {_COORDER_EDGES_SQL},
       deg AS (
         SELECT node, CAST(COUNT(*) AS BIGINT) AS degree FROM (
           SELECT pa AS node FROM e UNION ALL SELECT pb AS node FROM e)
         GROUP BY node),
       b AS (
         SELECT CAST(length(bin(degree)) AS BIGINT) AS pow2_bucket,
                CAST(COUNT(*) AS BIGINT) AS n_nodes
         FROM deg GROUP BY length(bin(degree))),
       t AS (SELECT CAST(SUM(n_nodes) AS BIGINT) AS total FROM b)
       SELECT b.pow2_bucket, b.n_nodes,
              CAST(SUM(b2.n_nodes) AS BIGINT) AS n_ge,
              CAST((1000000 * SUM(b2.n_nodes)) // t.total AS BIGINT)
                AS ccdf_ppm
       FROM b JOIN b b2 ON b2.pow2_bucket >= b.pow2_bucket
       CROSS JOIN t
       GROUP BY b.pow2_bucket, b.n_nodes, t.total""",
)
def graph_degree_ccdf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Graph+ degree-distribution CCDF in power-of-two buckets: the
    scale-free / heavy-tail check (a straight CCDF line on log-log
    axes ⇒ power law ⇒ hub-aware plans like join_salted and the
    degree-ordered triangle orientation are mandatory; a bent one ⇒
    near-regular, like the shipped co-purchase graph — which is WHY
    graph_triangles costs what it does, cf. BASELINE notes). Buckets
    use the exact-log2 bin-length trick (agg_pow2_hist — no float
    log); the CCDF accumulates over the ≤64-row bucket table with a
    tiny triangular self-join (bucket-count-sized, not data-sized).
    Degree agg is the one data shuffle."""
    e = _coorder_edges(spark, sf_dir)
    deg = (
        e.select(F.col("pa").alias("node"))
        .unionAll(e.select(F.col("pb").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("bigint").alias("degree"))
    )
    b = deg.groupBy(
        F.expr("CAST(length(bin(degree)) AS BIGINT)").alias("pow2_bucket")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n_nodes"))
    t = b.agg(F.sum("n_nodes").cast("bigint").alias("total"))
    b2 = b.select(
        F.col("pow2_bucket").alias("pb2"), F.col("n_nodes").alias("nn2")
    )
    return (
        b.join(F.broadcast(b2), F.col("pb2") >= F.col("pow2_bucket"))
        .crossJoin(F.broadcast(t))
        .groupBy("pow2_bucket", "n_nodes", "total")
        .agg(F.sum("nn2").cast("bigint").alias("n_ge"))
        .select(
            "pow2_bucket", "n_nodes", "n_ge",
            F.expr("CAST((1000000 * n_ge) DIV total AS BIGINT)").alias(
                "ccdf_ppm"
            ),
        )
    )


@q(
    "agg_session_gap_sensitivity",
    """WITH seq AS (
         SELECT user_id,
                date_diff('second',
                          LAG(ts) OVER (PARTITION BY user_id
                                        ORDER BY ts, event_id),
                          ts) AS gap_s
         FROM events),
       gaps AS (SELECT gap_s FROM seq WHERE gap_s IS NOT NULL),
       u AS (SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
             FROM events),
       thr AS (SELECT unnest([900, 1800, 3600]) AS t)
       SELECT CAST(thr.t AS BIGINT) AS gap_threshold_s,
              u.n_users,
              CAST(u.n_users + SUM(CASE WHEN g.gap_s > thr.t THEN 1 ELSE 0
                                   END) AS BIGINT) AS n_sessions,
              CAST((1000000 * SUM(CASE WHEN g.gap_s > thr.t THEN 1 ELSE 0
                                  END)) // COUNT(*) AS BIGINT)
                AS break_ppm
       FROM gaps g CROSS JOIN thr CROSS JOIN u
       GROUP BY thr.t, u.n_users""",
)
def agg_session_gap_sensitivity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """I+ sessionization-parameter calibration: total session counts
    under candidate inactivity gaps (15/30/60 min) from ONE pass — the
    identity sessions(T) = users + #(inter-event gaps > T) means the
    sensitivity table needs only the gap distribution, not a re-
    sessionization per threshold (the watermark-audit trick applied to
    the session gap; pick the knee where counts stabilize). Gaps come
    from the per-user LAG window (partitioned, distributed); the
    3-row threshold spine and 1-row user count broadcast; counts and
    break fractions are exact."""
    ev = read_table(spark, sf_dir, "events")
    uw = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        (
            F.unix_timestamp("ts")
            - F.unix_timestamp(F.lag("ts").over(uw))
        ).alias("gap_s")
    )
    gaps = seq.filter(F.col("gap_s").isNotNull())
    u = ev.agg(F.countDistinct("user_id").cast("bigint").alias("n_users"))
    thr = spark.range(1).select(
        F.explode(
            F.array(F.lit(900), F.lit(1800), F.lit(3600))
        ).alias("t")
    )
    return (
        gaps.crossJoin(F.broadcast(thr))
        .crossJoin(F.broadcast(u))
        .groupBy(
            F.col("t").cast("bigint").alias("gap_threshold_s"), "n_users"
        )
        .agg(
            (
                F.first("n_users")
                + F.sum(F.when(F.col("gap_s") > F.col("t"), 1).otherwise(0))
            )
            .cast("bigint")
            .alias("n_sessions"),
            F.expr(
                "CAST((1000000 * SUM(CASE WHEN gap_s > t THEN 1 ELSE 0 END))"
                " DIV COUNT(*) AS BIGINT)"
            ).alias("break_ppm"),
        )
        .select("gap_threshold_s", "n_users", "n_sessions", "break_ppm")
    )



@q(
    "text_sft_pack",
    """WITH ranked AS (
         SELECT doc_id, source, text,
                ROW_NUMBER() OVER (PARTITION BY source ORDER BY doc_id)
                  AS rn
         FROM documents),
       pairs AS (
         SELECT a.source, a.doc_id AS prompt_id, b.doc_id AS response_id,
                '### User:\n' || a.text || '\n### Assistant:\n' || b.text
                  AS rendered
         FROM ranked a JOIN ranked b
           ON b.source = a.source AND b.rn = a.rn + 1
         WHERE a.rn % 2 = 1)
       SELECT source, prompt_id, response_id,
              CAST(length(rendered) AS BIGINT) AS n_chars,
              CAST(len(string_split(rendered, ' ')) AS BIGINT) AS n_tokens_ws,
              md5(rendered) AS sample_md5
       FROM pairs""",
)
def text_sft_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K4+ SFT sample rendering: pair consecutive documents per source
    into (prompt, response) turns under a fixed chat template and emit
    the training-sample manifest — rendered length, whitespace token
    count, and a content digest (the idempotency key: re-rendering an
    unchanged pair hashes identically, so incremental SFT-data builds
    skip it — the dedup_exact guard at sample grain). Pairing is a
    deterministic per-source ROW_NUMBER chain (odd rank = prompt, its
    successor = response) — PARTITIONED windows, and the pair join is
    co-partitioned on (source, rank). The template is a literal string
    concat; both engines produce byte-identical renders, hence
    identical md5s. Complements pack_sequences (token packing) and
    text_chunk_rag (retrieval chunks) as the third training-data
    shape."""
    docs = read_table(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy("doc_id")
    ranked = docs.select(
        "doc_id", "source", "text", F.row_number().over(w).alias("rn")
    )
    a = ranked.filter(F.col("rn") % 2 == 1).select(
        "source",
        F.col("doc_id").alias("prompt_id"),
        F.col("text").alias("pt"),
        F.col("rn").alias("ra"),
    )
    b = ranked.select(
        F.col("source").alias("sb"),
        F.col("doc_id").alias("response_id"),
        F.col("text").alias("rt"),
        (F.col("rn") - 1).alias("ra"),
    )
    pairs = a.join(
        b, (F.col("sb") == F.col("source")) & (b.ra == a.ra)
    ).select(
        "source", "prompt_id", "response_id",
        F.concat(
            F.lit("### User:\n"), F.col("pt"),
            F.lit("\n### Assistant:\n"), F.col("rt"),
        ).alias("rendered"),
    )
    return pairs.select(
        "source", "prompt_id", "response_id",
        F.length("rendered").cast("bigint").alias("n_chars"),
        F.expr("CAST(size(split(rendered, ' ')) AS BIGINT)").alias(
            "n_tokens_ws"
        ),
        F.md5(F.col("rendered").cast("binary")).alias("sample_md5"),
    )



@q(
    "qa_freshness",
    """WITH per AS (
         SELECT 'orders' AS tbl, MAX(CAST(o_orderdate AS DATE)) AS max_d
         FROM orders
         UNION ALL
         SELECT 'lineitem', MAX(CAST(l_shipdate AS DATE)) FROM lineitem
         UNION ALL
         SELECT 'events', MAX(CAST(ts AS DATE)) FROM events),
       anchor AS (SELECT MAX(max_d) AS a FROM per)
       SELECT per.tbl, per.max_d AS max_date,
              CAST(date_diff('day', per.max_d, anchor.a) AS BIGINT)
                AS staleness_days,
              date_diff('day', per.max_d, anchor.a) > 30 AS stale_flag
       FROM per CROSS JOIN anchor""",
)
def qa_freshness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """QA+ freshness board: each fact table's latest event date and its
    staleness against the NEWEST date across all tables — the
    data-ops first-look that catches a stalled ingest (one table's max
    frozen while siblings advance). The anchor is data-derived (max
    over all tables), NOT wall-clock — wall-clock freshness is
    non-reproducible and would break oracle parity; production swaps
    the anchor for the scheduler's logical date. Three MAX scans
    (metadata-cheap under parquet statistics), a 1-row anchor
    broadcast, 3-row output with a >30-day breach flag."""
    o = read_table(spark, sf_dir, "orders")
    li = read_table(spark, sf_dir, "lineitem")
    ev = read_table(spark, sf_dir, "events")
    per = (
        o.agg(F.max(F.col("o_orderdate").cast("date")).alias("max_d"))
        .select(F.lit("orders").alias("tbl"), "max_d")
        .unionAll(
            li.agg(
                F.max(F.col("l_shipdate").cast("date")).alias("max_d")
            ).select(F.lit("lineitem").alias("tbl"), "max_d")
        )
        .unionAll(
            ev.agg(F.max(F.col("ts").cast("date")).alias("max_d")).select(
                F.lit("events").alias("tbl"), "max_d"
            )
        )
    )
    anchor = per.agg(F.max("max_d").alias("a"))
    return per.crossJoin(F.broadcast(anchor)).select(
        "tbl",
        F.col("max_d").alias("max_date"),
        F.expr("CAST(datediff(a, max_d) AS BIGINT)").alias("staleness_days"),
        F.expr("datediff(a, max_d) > 30").alias("stale_flag"),
    )



# =====================================================================
# Round-5 composites — operator fusion and pipeline chaining over keys
# that are already individually oracle-certified (VERDICT r4 item 8).
# =====================================================================

@q(
    "freq_gnomad_style",
    """WITH gt AS (
         SELECT l_partkey AS site_id, l_suppkey % 3 AS pop,
                CASE WHEN l_orderkey % 3 = 0 THEN 2
                     WHEN l_orderkey % 3 = 1 THEN 1 ELSE 0 END AS n_ref
         FROM lineitem),
       cnt AS (
         SELECT site_id,
                CAST(COUNT(*) AS BIGINT) AS n,
                CAST(SUM(CASE WHEN n_ref = 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_hom_ref,
                CAST(SUM(CASE WHEN n_ref = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_het,
                CAST(SUM(CASE WHEN n_ref = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_hom_alt,
                CAST(SUM(CASE WHEN pop = 0 THEN 2 - n_ref ELSE 0 END) AS BIGINT) AS alt0,
                CAST(2 * SUM(CASE WHEN pop = 0 THEN 1 ELSE 0 END) AS BIGINT) AS an0,
                CAST(SUM(CASE WHEN pop = 1 THEN 2 - n_ref ELSE 0 END) AS BIGINT) AS alt1,
                CAST(2 * SUM(CASE WHEN pop = 1 THEN 1 ELSE 0 END) AS BIGINT) AS an1,
                CAST(SUM(CASE WHEN pop = 2 THEN 2 - n_ref ELSE 0 END) AS BIGINT) AS alt2,
                CAST(2 * SUM(CASE WHEN pop = 2 THEN 1 ELSE 0 END) AS BIGINT) AS an2
         FROM gt GROUP BY site_id),
       x_ AS (
         SELECT *, 2 * n_hom_ref + n_het AS x,
                CASE WHEN an0 > 0 THEN (1000000 * alt0) // an0 ELSE -1 END AS af0,
                CASE WHEN an1 > 0 THEN (1000000 * alt1) // an1 ELSE -1 END AS af1,
                CASE WHEN an2 > 0 THEN (1000000 * alt2) // an2 ELSE -1 END AS af2
         FROM cnt),
       mx AS (
         SELECT *, GREATEST(af0, af1, af2) AS pm FROM x_)
       SELECT site_id,
              CAST(2 * n AS BIGINT) AS an,
              CAST(2 * n - x AS BIGINT) AS ac,
              CAST((1000000 * (2 * n - x)) // (2 * n) AS BIGINT) AS af_ppm,
              CAST(CASE WHEN pm >= 0 THEN pm END AS BIGINT) AS popmax_ppm,
              CAST(CASE WHEN pm < 0 THEN NULL
                        WHEN af0 = pm THEN 0
                        WHEN af1 = pm THEN 1 ELSE 2 END AS BIGINT) AS popmax_pop,
              n_het,
              CAST(CASE WHEN x > 0 AND x < 2 * n THEN
                (1000000 * (4 * CAST(n AS HUGEINT) * n_hom_ref
                            - CAST(x AS HUGEINT) * x)
                         * (4 * CAST(n AS HUGEINT) * n_hom_ref
                            - CAST(x AS HUGEINT) * x))
                  // (4 * CAST(n AS HUGEINT) * x * x)
                + (1000000 * (2 * CAST(n AS HUGEINT) * n_het
                              - CAST(x AS HUGEINT) * (2 * n - x))
                           * (2 * CAST(n AS HUGEINT) * n_het
                              - CAST(x AS HUGEINT) * (2 * n - x)))
                  // (2 * CAST(n AS HUGEINT) * x * (2 * n - x))
                + (1000000 * (4 * CAST(n AS HUGEINT) * n_hom_alt
                              - CAST(2 * n - x AS HUGEINT) * (2 * n - x))
                           * (4 * CAST(n AS HUGEINT) * n_hom_alt
                              - CAST(2 * n - x AS HUGEINT) * (2 * n - x)))
                  // (4 * CAST(n AS HUGEINT) * (2 * n - x) * (2 * n - x))
              END AS BIGINT) AS chi2_ppm
       FROM mx""",
)
def freq_gnomad_style(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fused gnomAD-style per-site summary — popmax + pooled AF + HWE in
    ONE shared scan and ONE site-keyed shuffle (operator fusion over
    freq_popmax + freq_hwe, each individually oracle-certified).

    Why fusion matters at 100 TB: freq_popmax and freq_hwe each scan the
    full call matrix and shuffle on site_id; a user running the standard
    site-QC board pays that twice. Here the (site, pop) conditional
    aggregates (3 fixed pops → 6 extra agg columns, NOT an extra
    grouping key) and the HWE genotype counts ride the SAME groupBy —
    per-site math afterwards is pure projection. Exactness: identical
    integer identities as the parents (ppm floors on non-negative
    counts, cross-multiplied chi² in int128/DECIMAL(38,0)); popmax ties
    resolve to the smallest population id; monomorphic sites emit NULL
    chi² (HWE undefined) but keep their AF row — the composite must not
    drop sites the popmax parent reports."""
    li = read_table(spark, sf_dir, "lineitem")
    gt = li.select(
        F.col("l_partkey").alias("site_id"),
        (F.col("l_suppkey") % 3).alias("pop"),
        F.expr(
            "CASE WHEN l_orderkey % 3 = 0 THEN 2"
            " WHEN l_orderkey % 3 = 1 THEN 1 ELSE 0 END"
        ).alias("n_ref"),
    )
    pop_aggs = []
    for p in range(3):
        pop_aggs.append(
            F.sum(F.when(F.col("pop") == p, 2 - F.col("n_ref")).otherwise(0))
            .cast("bigint").alias(f"alt{p}")
        )
        pop_aggs.append(
            (2 * F.sum(F.when(F.col("pop") == p, 1).otherwise(0)))
            .cast("bigint").alias(f"an{p}")
        )
    cnt = gt.groupBy("site_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.when(F.col("n_ref") == 2, 1).otherwise(0)).cast("bigint").alias("n_hom_ref"),
        F.sum(F.when(F.col("n_ref") == 1, 1).otherwise(0)).cast("bigint").alias("n_het"),
        F.sum(F.when(F.col("n_ref") == 0, 1).otherwise(0)).cast("bigint").alias("n_hom_alt"),
        *pop_aggs,
    )
    x_ = cnt.withColumn("x", F.expr("2 * n_hom_ref + n_het"))
    for p in range(3):
        x_ = x_.withColumn(
            f"af{p}",
            F.expr(
                f"CASE WHEN an{p} > 0 THEN (1000000 * alt{p}) DIV an{p} ELSE -1 END"
            ),
        )
    mx = x_.withColumn("pm", F.greatest("af0", "af1", "af2"))
    D = "DECIMAL(38,0)"
    t1 = (
        f"(1000000 * (4 * CAST(n AS {D}) * n_hom_ref - CAST(x AS {D}) * x)"
        f" * (4 * CAST(n AS {D}) * n_hom_ref - CAST(x AS {D}) * x))"
        f" DIV (4 * CAST(n AS {D}) * x * x)"
    )
    t2 = (
        f"(1000000 * (2 * CAST(n AS {D}) * n_het"
        f" - CAST(x AS {D}) * (2 * n - x))"
        f" * (2 * CAST(n AS {D}) * n_het - CAST(x AS {D}) * (2 * n - x)))"
        f" DIV (2 * CAST(n AS {D}) * x * (2 * n - x))"
    )
    t3 = (
        f"(1000000 * (4 * CAST(n AS {D}) * n_hom_alt"
        f" - CAST(2 * n - x AS {D}) * (2 * n - x))"
        f" * (4 * CAST(n AS {D}) * n_hom_alt"
        f" - CAST(2 * n - x AS {D}) * (2 * n - x)))"
        f" DIV (4 * CAST(n AS {D}) * (2 * n - x) * (2 * n - x))"
    )
    return mx.select(
        "site_id",
        F.expr("CAST(2 * n AS BIGINT)").alias("an"),
        F.expr("CAST(2 * n - x AS BIGINT)").alias("ac"),
        F.expr("CAST((1000000 * (2 * n - x)) DIV (2 * n) AS BIGINT)").alias("af_ppm"),
        F.expr("CAST(CASE WHEN pm >= 0 THEN pm END AS BIGINT)").alias("popmax_ppm"),
        F.expr(
            "CAST(CASE WHEN pm < 0 THEN NULL WHEN af0 = pm THEN 0"
            " WHEN af1 = pm THEN 1 ELSE 2 END AS BIGINT)"
        ).alias("popmax_pop"),
        "n_het",
        F.expr(
            f"CAST(CASE WHEN x > 0 AND x < 2 * n THEN {t1} + {t2} + {t3} END AS BIGINT)"
        ).alias("chi2_ppm"),
    )


@q(
    "dedup_pipeline_v2",
    """WITH RECURSIVE hashed AS (
         SELECT doc_id, text,
                ROW_NUMBER() OVER (PARTITION BY md5(lower(trim(text)))
                                   ORDER BY doc_id) AS rn
         FROM documents),
       d1 AS (SELECT doc_id, text FROM hashed WHERE rn = 1),
       words AS (
         SELECT doc_id, string_split(text, ' ') AS w FROM d1),
       sh AS (
         SELECT doc_id,
                unnest(list_transform(range(1, greatest(len(w) - 1, 1)),
                       i -> w[i] || ' ' || w[i + 1] || ' ' || w[i + 2])) AS shingle
         FROM words),
       sigs AS (
         SELECT doc_id,
                MIN(md5('0|' || shingle)) AS sig_0, MIN(md5('1|' || shingle)) AS sig_1,
                MIN(md5('2|' || shingle)) AS sig_2, MIN(md5('3|' || shingle)) AS sig_3,
                MIN(md5('4|' || shingle)) AS sig_4, MIN(md5('5|' || shingle)) AS sig_5,
                MIN(md5('6|' || shingle)) AS sig_6, MIN(md5('7|' || shingle)) AS sig_7
         FROM sh GROUP BY doc_id),
       banded AS (
         SELECT doc_id, band FROM (
           SELECT doc_id,
                  ['0|' || sig_0 || '|' || sig_1, '1|' || sig_2 || '|' || sig_3,
                   '2|' || sig_4 || '|' || sig_5, '3|' || sig_6 || '|' || sig_7] AS bands
           FROM sigs), UNNEST(bands) AS u(band)),
       pairs AS (
         SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
         FROM banded a JOIN banded b ON a.band = b.band AND a.doc_id < b.doc_id),
       dsh AS (SELECT DISTINCT doc_id, shingle FROM sh),
       sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM dsh GROUP BY doc_id),
       inter AS (
         SELECT p.doc_a, p.doc_b, COUNT(*) AS n_inter
         FROM pairs p JOIN dsh a ON a.doc_id = p.doc_a
                      JOIN dsh b ON b.doc_id = p.doc_b AND b.shingle = a.shingle
         GROUP BY p.doc_a, p.doc_b),
       ver AS (
         SELECT i.doc_a, i.doc_b
         FROM inter i JOIN sizes xa ON xa.doc_id = i.doc_a
                      JOIN sizes xb ON xb.doc_id = i.doc_b
         WHERE (100 * i.n_inter) // (xa.n_sh + xb.n_sh - i.n_inter) >= 50),
       cedges AS (
         SELECT doc_a AS src, doc_b AS dst FROM ver
         UNION SELECT doc_b AS src, doc_a AS dst FROM ver),
       verts AS (SELECT DISTINCT src AS id FROM cedges),
       walk(id, comp) AS (
         SELECT id, id FROM verts
         UNION
         SELECT e.dst, w.comp FROM walk w JOIN cedges e ON e.src = w.id),
       comp AS (SELECT id AS doc_id, MIN(comp) AS component FROM walk GROUP BY id),
       allc AS (
         SELECT d1.doc_id, COALESCE(comp.component, d1.doc_id) AS component
         FROM d1 LEFT JOIN comp USING (doc_id)),
       cs AS (
         SELECT component, CAST(COUNT(*) AS BIGINT) AS cluster_size
         FROM allc GROUP BY component)
       SELECT a.doc_id, a.component, c.cluster_size,
              a.doc_id = a.component AS survivor
       FROM allc a JOIN cs c USING (component)""",
)
def dedup_pipeline_v2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K1+K2 corpus dedup v2 — candidate → VERIFY → cluster, the shape a
    production pipeline actually ships: exact dedup (content-hash
    keep-first) → MinHash LSH candidate pairs → exact-Jaccard
    verification of every candidate (distinct 3-shingle sets, integer
    percent floor, threshold 50) → large-star/small-star connected
    components over only the VERIFIED edges → per-doc cluster assignment
    with cluster size and canonical (survivor) flag.

    v1 (dedup_pipeline) trusts the LSH bands; v2 inserts the gate that
    dedup_minhash_recall calibrates: estimated-Jaccard candidates are
    re-scored EXACTLY before any edge reaches clustering, so band
    false-positives cannot glue unrelated clusters together (the classic
    LSH failure at corpus scale — one bad mega-component). Cost shape at
    100 TB: the verify join touches only candidate pairs (LSH-bounded,
    never all-pairs) keyed on (doc, shingle); cc_stars is the
    degree-skew-safe CC. Every stage composes an individually
    oracle-certified operator."""
    from varda_spark.operators.dedup import (
        cc_stars,
        dedup_exact,
        minhash_candidates,
        shingles,
    )

    d = read_table(spark, sf_dir, "documents")
    s1 = dedup_exact(d).localCheckpoint()
    # dsh feeds the banding stage, sizes, AND both sides of the verify
    # join — localCheckpoint materializes the split/explode/distinct
    # ONCE for all four consumers (exchange reuse does not cover them
    # across the join tree). MinHash MIN is duplicate-insensitive, so
    # the banding stage reads the same DISTINCT set the verify stage
    # needs (one shingle pass total; was two before r6).
    dsh = shingles(s1, n=3).select("doc_id", "shingle").distinct().localCheckpoint()
    cand = minhash_candidates(s1, num_hashes=8, bands=4, shingle_n=3, shingle_df=dsh)
    sizes = dsh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    sa = dsh.select(F.col("doc_id").alias("doc_a"), "shingle")
    sb = dsh.select(F.col("doc_id").alias("b_doc"), F.col("shingle").alias("shingle_b"))
    inter = (
        cand.join(sa, "doc_a")
        .join(sb, (F.col("doc_b") == F.col("b_doc")) & (F.col("shingle") == F.col("shingle_b")))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    ver = (
        inter.join(sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("na")), "doc_a")
        .join(sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("nb")), "doc_b")
        .filter(F.expr("(100 * n_inter) DIV (na + nb - n_inter) >= 50"))
        .select("doc_a", "doc_b")
    )
    cc = cc_stars(ver, "doc_a", "doc_b")
    allc = (
        s1.select("doc_id")
        .join(cc, s1.doc_id == cc.id, "left")
        .select("doc_id", F.coalesce(F.col("comp"), F.col("doc_id")).alias("component"))
    )
    cs = allc.groupBy("component").agg(F.count(F.lit(1)).cast("bigint").alias("cluster_size"))
    return allc.join(cs, "component").select(
        "doc_id", "component", "cluster_size",
        (F.col("doc_id") == F.col("component")).alias("survivor"),
    )


@q(
    "text_quality_pipeline",
    """WITH t AS (
         SELECT doc_id, source, text, string_split(trim(text), ' ') AS w
         FROM documents),
       flags AS (
         SELECT doc_id, source,
                (text LIKE '%.' OR text LIKE '%!' OR text LIKE '%?'
                 OR text LIKE '%"')
                AND len(w) >= 5
                AND NOT (instr(text, '{') > 0 OR instr(text, '}') > 0
                         OR instr(lower(text), 'javascript') > 0)
                AND NOT (instr(lower(text), 'lorem ipsum') > 0
                         OR instr(lower(text), 'cookie') > 0
                         OR instr(lower(text), 'terms of use') > 0) AS c4_pass,
                len(w) >= 3 AND len(w) <= 10000
                AND CAST(floor(list_sum(list_transform(w, x -> length(x))) * 100.0
                     / greatest(len(w), 1)) AS BIGINT) BETWEEN 150 AND 1000
                AND CAST(floor(len(list_filter(w, x -> regexp_matches(x, '[A-Za-z]'))) * 100.0
                     / greatest(len(w), 1)) AS BIGINT) >= 80
                AND CAST(len(list_intersect(list_transform(w, x -> lower(x)),
                     ['the','be','to','of','and','that','have','with'])) AS BIGINT) >= 2
                AND CAST(floor((length(text) - length(replace(text, '#', ''))) * 100.0
                     / greatest(length(text), 1)) AS BIGINT) <= 10 AS gopher_pass
         FROM t),
       bg AS (
         SELECT doc_id,
                unnest(list_transform(range(1, len(w)),
                       i -> w[i] || ' ' || w[i + 1])) AS bigram
         FROM t WHERE len(w) >= 2),
       m AS (
         SELECT doc_id, bigram, COUNT(*) AS m FROM bg GROUP BY doc_id, bigram),
       rep AS (
         SELECT doc_id,
                FLOOR((SUM(m) - COUNT(*)) * 1000000.0 / SUM(m)) <= 300000
                AND FLOOR(MAX(m) * 1000000.0 / SUM(m)) <= 100000 AS rep_pass
         FROM m GROUP BY doc_id),
       j AS (
         SELECT f.source, f.c4_pass, f.gopher_pass,
                COALESCE(r.rep_pass, TRUE) AS rep_pass
         FROM flags f LEFT JOIN rep r USING (doc_id))
       SELECT source,
              CAST(COUNT(*) AS BIGINT) AS n_docs,
              CAST(SUM(CASE WHEN c4_pass THEN 1 ELSE 0 END) AS BIGINT) AS n_c4,
              CAST(SUM(CASE WHEN gopher_pass THEN 1 ELSE 0 END) AS BIGINT) AS n_gopher,
              CAST(SUM(CASE WHEN rep_pass THEN 1 ELSE 0 END) AS BIGINT) AS n_rep,
              CAST(SUM(CASE WHEN c4_pass AND gopher_pass AND rep_pass
                       THEN 1 ELSE 0 END) AS BIGINT) AS n_all,
              CAST((1000000 * SUM(CASE WHEN c4_pass AND gopher_pass AND rep_pass
                       THEN 1 ELSE 0 END)) // COUNT(*) AS BIGINT) AS retention_ppm
       FROM j GROUP BY source""",
)
def text_quality_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K4 fused quality funnel — the C4 + Gopher + repetition stack
    (text_c4_filters, text_gopher, text_repetition — each individually
    oracle-certified) evaluated in ONE pass, reported as a per-source
    retention funnel: docs in, per-family pass counts, all-pass count,
    retention ppm.

    Fusion story at 100 TB: run as three separate jobs this is three
    full corpus scans; fused, the c4 + gopher flags are codegen'd into
    ONE map-side scan, and only the repetition family (intrinsically an
    explode + keyed agg — deliberately not a quadratic per-row fold)
    adds a shuffle, joined back doc-keyed. The funnel agg itself is a
    map-side partial count per source. Repetition thresholds: duplicate
    bigram mass ≤ 30% AND top-bigram share ≤ 10% (docs with <2 words
    have no bigrams → vacuous rep pass, then fail Gopher's word band)."""
    from varda_spark.operators.dedup import shingles

    d = read_table(spark, sf_dir, "documents")
    w = F.split(F.trim(F.col("text")), " ")
    n = F.size(w)
    g1 = F.greatest(n, F.lit(1))
    mwl = F.floor(
        F.expr(
            "aggregate(transform(split(trim(text), ' '), x -> CAST(length(x) AS BIGINT)), "
            "CAST(0 AS BIGINT), (a, v) -> a + v)"
        ) * 100.0 / g1
    ).cast("bigint")
    alpha = F.floor(
        F.size(F.expr("filter(split(trim(text), ' '), x -> x rlike '[A-Za-z]')")) * 100.0 / g1
    ).cast("bigint")
    stops = F.array(*[F.lit(s) for s in ["the", "be", "to", "of", "and", "that", "have", "with"]])
    n_stop = F.size(
        F.array_intersect(F.expr("transform(split(trim(text), ' '), x -> lower(x))"), stops)
    ).cast("bigint")
    tl = F.length("text")
    hash_pct = F.floor(
        (tl - F.length(F.replace(F.col("text"), F.lit("#"), F.lit("")))) * 100.0
        / F.greatest(tl, F.lit(1))
    ).cast("bigint")
    c4_pass = (
        F.expr(
            "text LIKE '%.' OR text LIKE '%!' OR text LIKE '%?' OR text LIKE '%\"'"
        )
        & (n >= 5)
        & ~F.expr(
            "instr(text, '{') > 0 OR instr(text, '}') > 0"
            " OR instr(lower(text), 'javascript') > 0"
        )
        & ~F.expr(
            "instr(lower(text), 'lorem ipsum') > 0"
            " OR instr(lower(text), 'cookie') > 0"
            " OR instr(lower(text), 'terms of use') > 0"
        )
    )
    gopher_pass = (
        (n >= 3) & (n <= 10000)
        & mwl.between(150, 1000)
        & (alpha >= 80) & (n_stop >= 2) & (hash_pct <= 10)
    )
    flags = d.select(
        "doc_id", "source", c4_pass.alias("c4_pass"), gopher_pass.alias("gopher_pass")
    )
    bg = shingles(d.select("doc_id", "text"), n=2, out="bigram")
    m = bg.groupBy("doc_id", "bigram").agg(F.count(F.lit(1)).alias("m"))
    rep = m.groupBy("doc_id").agg(
        (
            (F.floor((F.sum("m") - F.count(F.lit(1))) * 1000000.0 / F.sum("m")) <= 300000)
            & (F.floor(F.max("m") * 1000000.0 / F.sum("m")) <= 100000)
        ).alias("rep_pass")
    )
    j = flags.join(rep, "doc_id", "left").select(
        "source", "c4_pass", "gopher_pass",
        F.coalesce(F.col("rep_pass"), F.lit(True)).alias("rep_pass"),
    )
    all_pass = F.when(
        F.col("c4_pass") & F.col("gopher_pass") & F.col("rep_pass"), 1
    ).otherwise(0)
    return j.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum(F.when(F.col("c4_pass"), 1).otherwise(0)).cast("bigint").alias("n_c4"),
        F.sum(F.when(F.col("gopher_pass"), 1).otherwise(0)).cast("bigint").alias("n_gopher"),
        F.sum(F.when(F.col("rep_pass"), 1).otherwise(0)).cast("bigint").alias("n_rep"),
        F.sum(all_pass).cast("bigint").alias("n_all"),
        F.expr(
            "CAST((1000000 * SUM(CASE WHEN c4_pass AND gopher_pass AND rep_pass"
            " THEN 1 ELSE 0 END)) DIV COUNT(*) AS BIGINT)"
        ).alias("retention_ppm"),
    )


@q(
    "freq_titv",
    """WITH gt AS (
         SELECT l_partkey AS site_id, l_suppkey % 3 AS pop,
                CASE WHEN l_orderkey % 3 = 0 THEN 2
                     WHEN l_orderkey % 3 = 1 THEN 1 ELSE 0 END AS n_ref
         FROM lineitem),
       seen AS (
         SELECT site_id, pop
         FROM gt GROUP BY site_id, pop
         HAVING SUM(2 - n_ref) > 0),
       ann AS (
         SELECT site_id, pop,
                substr('ACGT', CAST(site_id % 4 AS INT) + 1, 1) AS ref,
                substr('ACGT',
                       CAST((site_id % 4 + 1 + (site_id // 4) % 3) % 4 AS INT) + 1,
                       1) AS alt
         FROM seen),
       fl AS (
         SELECT pop,
                CASE WHEN (ref = 'A' AND alt = 'G') OR (ref = 'G' AND alt = 'A')
                       OR (ref = 'C' AND alt = 'T') OR (ref = 'T' AND alt = 'C')
                     THEN 1 ELSE 0 END AS is_ti
         FROM ann)
       SELECT CAST(pop AS BIGINT) AS pop,
              CAST(SUM(is_ti) AS BIGINT) AS n_ti,
              CAST(SUM(1 - is_ti) AS BIGINT) AS n_tv,
              CAST((1000000 * SUM(is_ti)) // SUM(1 - is_ti) AS BIGINT) AS titv_ppm
       FROM fl GROUP BY pop""",
)
def freq_titv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Varda-core transition/transversion ratio per population — THE
    sequencing-QC headline number (genome-wide Ti/Tv ≈ 2.0-2.1 for real
    human variation; a ratio drifting toward 0.5, the random-error
    expectation, means the callset is contaminated with artifacts).
    A site counts for a population when that population carries ≥1 alt
    allele there. REF/ALT bases are pure functions of site_id (both
    engines identically), so the annotation is a PROJECTION after the
    (site, pop) aggregate — no dimension join at all; the whole operator
    is one grouped agg + one 3-row reduction. titv_ppm is an exact
    integer floor (Ti and Tv are disjoint so no rational cancellation
    issues)."""
    li = read_table(spark, sf_dir, "lineitem")
    gt = li.select(
        F.col("l_partkey").alias("site_id"),
        (F.col("l_suppkey") % 3).alias("pop"),
        F.expr(
            "CASE WHEN l_orderkey % 3 = 0 THEN 2"
            " WHEN l_orderkey % 3 = 1 THEN 1 ELSE 0 END"
        ).alias("n_ref"),
    )
    seen = (
        gt.groupBy("site_id", "pop")
        .agg(F.sum(2 - F.col("n_ref")).alias("alt_c"))
        .filter(F.col("alt_c") > 0)
    )
    ann = seen.select(
        "pop",
        F.expr("substr('ACGT', CAST(site_id % 4 AS INT) + 1, 1)").alias("ref"),
        F.expr(
            "substr('ACGT', CAST((site_id % 4 + 1 + (site_id DIV 4) % 3) % 4 AS INT) + 1, 1)"
        ).alias("alt"),
    )
    is_ti = F.expr(
        "CASE WHEN (ref = 'A' AND alt = 'G') OR (ref = 'G' AND alt = 'A')"
        " OR (ref = 'C' AND alt = 'T') OR (ref = 'T' AND alt = 'C')"
        " THEN 1 ELSE 0 END"
    )
    return (
        ann.select(F.col("pop"), is_ti.alias("is_ti"))
        .groupBy(F.col("pop").cast("bigint").alias("pop"))
        .agg(
            F.sum("is_ti").cast("bigint").alias("n_ti"),
            F.sum(1 - F.col("is_ti")).cast("bigint").alias("n_tv"),
            F.expr(
                "CAST((1000000 * SUM(is_ti)) DIV SUM(1 - is_ti) AS BIGINT)"
            ).alias("titv_ppm"),
        )
    )


@q(
    "freq_maf_spectrum",
    """WITH gt AS (
         SELECT l_partkey AS site_id,
                CASE WHEN l_orderkey % 3 = 0 THEN 2
                     WHEN l_orderkey % 3 = 1 THEN 1 ELSE 0 END AS n_ref
         FROM lineitem),
       cnt AS (
         SELECT site_id,
                CAST(2 * COUNT(*) AS BIGINT) AS an,
                CAST(SUM(2 - n_ref) AS BIGINT) AS ac
         FROM gt GROUP BY site_id),
       maf AS (
         SELECT site_id,
                LEAST((1000000 * ac) // an,
                      1000000 - (1000000 * ac) // an) AS maf_ppm
         FROM cnt WHERE ac > 0 AND ac < an)
       SELECT CAST(maf_ppm // 25000 AS BIGINT) AS bin,
              CAST((maf_ppm // 25000) * 25000 AS BIGINT) AS lo_ppm,
              CAST(COUNT(*) AS BIGINT) AS n_sites
       FROM maf GROUP BY 1, 2""",
)
def freq_maf_spectrum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Varda-core site-frequency spectrum: histogram of minor-allele
    frequency across polymorphic sites in 2.5%-wide bins — the shape
    population geneticists read selection and demography from, and the
    QC plot that exposes batch effects as spikes (an excess of
    singleton-like bins = calling artifacts). MAF folds AF at 50%
    (LEAST of floor and complement — both already-floored ppms, so the
    fold is exact integer math per the subtraction-of-floors rule).
    Monomorphic sites are excluded (MAF undefined). One site-keyed agg
    + one 20-row histogram agg, both map-side partial."""
    li = read_table(spark, sf_dir, "lineitem")
    gt = li.select(
        F.col("l_partkey").alias("site_id"),
        F.expr(
            "CASE WHEN l_orderkey % 3 = 0 THEN 2"
            " WHEN l_orderkey % 3 = 1 THEN 1 ELSE 0 END"
        ).alias("n_ref"),
    )
    cnt = gt.groupBy("site_id").agg(
        (2 * F.count(F.lit(1))).cast("bigint").alias("an"),
        F.sum(2 - F.col("n_ref")).cast("bigint").alias("ac"),
    )
    maf = cnt.filter((F.col("ac") > 0) & (F.col("ac") < F.col("an"))).select(
        F.expr(
            "LEAST((1000000 * ac) DIV an, 1000000 - (1000000 * ac) DIV an)"
        ).alias("maf_ppm")
    )
    return (
        maf.groupBy(
            F.expr("CAST(maf_ppm DIV 25000 AS BIGINT)").alias("bin"),
            F.expr("CAST((maf_ppm DIV 25000) * 25000 AS BIGINT)").alias("lo_ppm"),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_sites"))
    )


@q(
    "freq_ld_pairs",
    """WITH sites AS (
         SELECT DISTINCT l_partkey AS site_id FROM lineitem),
       loc AS (
         SELECT site_id,
                CAST(site_id % 5 AS VARCHAR) AS chromosome,
                CAST(site_id * 31 + 1 AS BIGINT) AS position
         FROM sites),
       pairs AS (
         SELECT a.site_id AS site_a, b.site_id AS site_b
         FROM loc a JOIN loc b
           ON a.chromosome = b.chromosome
          AND a.position // 500 = b.position // 500
          AND a.site_id < b.site_id),
       gt AS (
         SELECT l_partkey AS site_id, l_suppkey AS sample_id,
                CAST(MIN((l_partkey * 31 + l_suppkey * 17) % 2) AS BIGINT) AS allele
         FROM lineitem GROUP BY l_partkey, l_suppkey),
       joint AS (
         SELECT p.site_a, p.site_b,
                CAST(COUNT(*) AS BIGINT) AS n,
                CAST(SUM(ga.allele * gb.allele) AS BIGINT) AS n11,
                CAST(SUM(ga.allele) AS BIGINT) AS n1,
                CAST(SUM(gb.allele) AS BIGINT) AS n2
         FROM pairs p
         JOIN gt ga ON ga.site_id = p.site_a
         JOIN gt gb ON gb.site_id = p.site_b AND gb.sample_id = ga.sample_id
         GROUP BY p.site_a, p.site_b)
       SELECT site_a, site_b, n, n11, n1, n2,
              CAST((1000000 * (CAST(n AS HUGEINT) * n11 - CAST(n1 AS HUGEINT) * n2)
                            * (CAST(n AS HUGEINT) * n11 - CAST(n1 AS HUGEINT) * n2))
                   // (CAST(n1 AS HUGEINT) * (n - n1) * n2 * (n - n2))
                   AS BIGINT) AS r2_ppm
       FROM joint
       WHERE n1 > 0 AND n1 < n AND n2 > 0 AND n2 < n""",
)
def freq_ld_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Varda-core linkage disequilibrium: haploid r² between nearby site
    pairs (same chromosome, same 500 bp tile) — the plink --r2 shape
    that drives LD pruning before association tests and imputation
    panels. r² = (n·n11 − n1·n2)² / (n1(n−n1)·n2(n−n2)) over samples
    observed at BOTH sites (complete-case), kept fully rational: the
    covariance numerator is squared (so sign-safe), cross-multiplied in
    int128/DECIMAL(38,0), one floored division to ppm. In-sample
    monomorphic pairs are excluded (r² undefined). Scale shape: pair
    candidates come from a TILE-bucketed self-join on the site map
    (never position-theta over the call matrix); the synthetic genome
    span GROWS with the site space (position = 31·site_id, no modulo),
    so sites-per-tile — and with it pairs-per-site — stays constant at
    every scale factor (the fixed-span variant measured 3.5× super-
    linear at sf1 in the round-5 scaling smoke; this is the fix), and the genotype join
    fans out only candidate pairs keyed on (site, sample) — the same
    bounded-candidate discipline as dedup_pipeline_v2's verify stage.
    Sample alleles collapse to one row per (site, sample) first, so the
    pair join runs on the deduplicated matrix."""
    li = read_table(spark, sf_dir, "lineitem")
    loc = (
        li.select(F.col("l_partkey").alias("site_id")).distinct()
        .select(
            "site_id",
            (F.col("site_id") % 5).cast("string").alias("chromosome"),
            (F.col("site_id") * 31 + 1).cast("long").alias("position"),
        )
        .withColumn("tile", F.expr("position DIV 500"))
    )
    a = loc.select(
        F.col("site_id").alias("site_a"), "chromosome", "tile"
    )
    b = loc.select(
        F.col("site_id").alias("site_b"),
        F.col("chromosome").alias("chr_b"),
        F.col("tile").alias("tile_b"),
    )
    pairs = a.join(
        b,
        (F.col("chromosome") == F.col("chr_b"))
        & (F.col("tile") == F.col("tile_b"))
        & (F.col("site_a") < F.col("site_b")),
    ).select("site_a", "site_b")
    gt = (
        li.groupBy(
            F.col("l_partkey").alias("site_id"),
            F.col("l_suppkey").alias("sample_id"),
        )
        .agg(
            F.min(
                F.expr("(l_partkey * 31 + l_suppkey * 17) % 2")
            ).cast("bigint").alias("allele")
        )
    )
    ga = gt.select(
        F.col("site_id").alias("site_a"),
        F.col("sample_id"),
        F.col("allele").alias("allele_a"),
    )
    gb = gt.select(
        F.col("site_id").alias("b_site"),
        F.col("sample_id").alias("sample_b"),
        F.col("allele").alias("allele_b"),
    )
    joint = (
        pairs.join(ga, "site_a")
        .join(gb, (F.col("site_b") == F.col("b_site")) & (F.col("sample_id") == F.col("sample_b")))
        .groupBy("site_a", "site_b")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum(F.col("allele_a") * F.col("allele_b")).cast("bigint").alias("n11"),
            F.sum("allele_a").cast("bigint").alias("n1"),
            F.sum("allele_b").cast("bigint").alias("n2"),
        )
    )
    D = "DECIMAL(38,0)"
    return joint.filter(
        (F.col("n1") > 0) & (F.col("n1") < F.col("n"))
        & (F.col("n2") > 0) & (F.col("n2") < F.col("n"))
    ).select(
        "site_a", "site_b", "n", "n11", "n1", "n2",
        F.expr(
            f"CAST((1000000 * (CAST(n AS {D}) * n11 - CAST(n1 AS {D}) * n2)"
            f" * (CAST(n AS {D}) * n11 - CAST(n1 AS {D}) * n2))"
            f" DIV (CAST(n1 AS {D}) * (n - n1) * n2 * (n - n2)) AS BIGINT)"
        ).alias("r2_ppm"),
    )


@q(
    "agg_stickiness",
    """WITH dau AS (
         SELECT CAST(year(ts) * 100 + month(ts) AS BIGINT) AS ym,
                CAST(ts AS DATE) AS d,
                CAST(COUNT(DISTINCT user_id) AS BIGINT) AS dau
         FROM events GROUP BY 1, 2),
       byday AS (
         SELECT ym,
                CAST(SUM(dau) AS BIGINT) AS sum_dau,
                CAST(COUNT(*) AS BIGINT) AS n_days
         FROM dau GROUP BY ym),
       mau AS (
         SELECT CAST(year(ts) * 100 + month(ts) AS BIGINT) AS ym,
                CAST(COUNT(DISTINCT user_id) AS BIGINT) AS mau
         FROM events GROUP BY 1)
       SELECT b.ym, b.sum_dau, b.n_days, m.mau,
              CAST((1000000 * b.sum_dau) // (b.n_days * m.mau) AS BIGINT)
                AS stickiness_ppm
       FROM byday b JOIN mau m USING (ym)""",
)
def agg_stickiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D+ product-analytics stickiness (avg DAU / MAU per month) — the
    engagement ratio every growth dashboard leads with. avg-DAU/MAU is
    kept rational: (Σ daily distincts) / (days × monthly distinct), one
    ppm floor. Two COUNT(DISTINCT) aggregates at different grains over
    the same scan + a 12-row join; the distincts are the real cost and
    both shuffle on (period, user) — partial-agg friendly because
    user_id repeats heavily within a day at event grain."""
    ev = read_table(spark, sf_dir, "events")
    ym = (F.year("ts") * 100 + F.month("ts")).cast("bigint").alias("ym")
    dau = ev.groupBy(ym, F.col("ts").cast("date").alias("d")).agg(
        F.countDistinct("user_id").cast("bigint").alias("dau")
    )
    byday = dau.groupBy("ym").agg(
        F.sum("dau").cast("bigint").alias("sum_dau"),
        F.count(F.lit(1)).cast("bigint").alias("n_days"),
    )
    mau = ev.groupBy(ym).agg(
        F.countDistinct("user_id").cast("bigint").alias("mau")
    )
    return byday.join(mau, "ym").select(
        "ym", "sum_dau", "n_days", "mau",
        F.expr(
            "CAST((1000000 * sum_dau) DIV (n_days * mau) AS BIGINT)"
        ).alias("stickiness_ppm"),
    )


@q(
    "qa_schema_drift",
    """WITH prof AS (
         SELECT CASE WHEN o_orderdate < '1998-01-01' THEN 'old' ELSE 'new' END AS snap,
                CAST(COUNT(*) AS BIGINT) AS n_rows,
                CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS custkey_distinct,
                CAST(COUNT(DISTINCT o_orderpriority) AS BIGINT) AS prio_distinct,
                CAST(MIN(FLOOR(o_totalprice)) AS BIGINT) AS price_min,
                CAST(MAX(FLOOR(o_totalprice)) AS BIGINT) AS price_max,
                CAST(COUNT(DISTINCT o_orderstatus) AS BIGINT) AS status_distinct
         FROM orders GROUP BY 1),
       u AS (
         SELECT snap, 'n_rows' AS metric, n_rows AS v FROM prof
         UNION ALL SELECT snap, 'custkey_distinct', custkey_distinct FROM prof
         UNION ALL SELECT snap, 'prio_distinct', prio_distinct FROM prof
         UNION ALL SELECT snap, 'price_min', price_min FROM prof
         UNION ALL SELECT snap, 'price_max', price_max FROM prof
         UNION ALL SELECT snap, 'status_distinct', status_distinct FROM prof)
       SELECT o.metric, o.v AS v_old, n.v AS v_new,
              n.v - o.v AS delta,
              CASE WHEN o.v <> 0
                   THEN (1000000 * (n.v - o.v)) // o.v END AS drift_ppm
       FROM u o JOIN u n ON o.metric = n.metric
       WHERE o.snap = 'old' AND n.snap = 'new'""",
)
def qa_schema_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """QA+ snapshot profile drift — the data-contract check a warehouse
    runs between loads: row count, key cardinalities, numeric ranges,
    and null/empty rates profiled per snapshot (here the pre/post-1998
    halves of orders) and diffed metric-by-metric with a signed drift
    ppm. Catches the silent schema rots row-count monitoring misses —
    a key column collapsing in cardinality, a price range exploding, a
    suddenly-null text field. One conditional-aggregate scan (both
    snapshots profiled in a single pass — no per-snapshot jobs), a
    6-metric unpivot, and a tiny self-join. drift_ppm uses signed
    floor division — consistent in both engines because // and DIV
    agree here via the same floor-direction on the shared sign (the
    divisor n_rows-class metrics are positive; numerator may be
    negative, so this relies on BIGINT // flooring in DuckDB matching
    Spark DIV truncation ONLY when exact — guarded by the oracle)."""
    o = read_table(spark, sf_dir, "orders")
    prof = o.groupBy(
        F.when(F.col("o_orderdate") < "1998-01-01", "old").otherwise("new").alias("snap")
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.countDistinct("o_custkey").cast("bigint").alias("custkey_distinct"),
        F.countDistinct("o_orderpriority").cast("bigint").alias("prio_distinct"),
        F.min(F.floor("o_totalprice")).cast("bigint").alias("price_min"),
        F.max(F.floor("o_totalprice")).cast("bigint").alias("price_max"),
        F.countDistinct("o_orderstatus").cast("bigint").alias("status_distinct"),
    )
    metrics = [
        "n_rows", "custkey_distinct", "prio_distinct",
        "price_min", "price_max", "status_distinct",
    ]
    stack_expr = "stack({}, {}) AS (metric, v)".format(
        len(metrics), ", ".join(f"'{m}', {m}" for m in metrics)
    )
    u = prof.select("snap", F.expr(stack_expr))
    old = u.filter(F.col("snap") == "old").select("metric", F.col("v").alias("v_old"))
    new = u.filter(F.col("snap") == "new").select(
        F.col("metric").alias("m_new"), F.col("v").alias("v_new")
    )
    return old.join(new, old.metric == new.m_new).select(
        "metric", "v_old", "v_new",
        (F.col("v_new") - F.col("v_old")).alias("delta"),
        F.expr(
            "CASE WHEN v_old <> 0 THEN"
            " CAST((1000000 * (v_new - v_old)) AS BIGINT) DIV v_old END"
        ).alias("drift_ppm"),
    )


@q(
    "agg_kmv_union",
    """WITH a AS (
         SELECT DISTINCT o_custkey AS k FROM orders
         WHERE o_orderpriority = '1-URGENT'),
       b AS (
         SELECT DISTINCT o_custkey AS k FROM orders
         WHERE o_orderpriority = '2-HIGH'),
       ha AS (
         SELECT k, CAST('0x' || substr(md5(CAST(k AS VARCHAR)), 1, 15) AS BIGINT) AS h
         FROM a),
       hb AS (
         SELECT k, CAST('0x' || substr(md5(CAST(k AS VARCHAR)), 1, 15) AS BIGINT) AS h
         FROM b),
       ka AS (SELECT h FROM ha ORDER BY h LIMIT 64),
       kb AS (SELECT h FROM hb ORDER BY h LIMIT 64),
       ku AS (SELECT h FROM (SELECT h FROM ha UNION SELECT h FROM hb)
              ORDER BY h LIMIT 64),
       tha AS (SELECT MAX(h) AS t FROM ka),
       thb AS (SELECT MAX(h) AS t FROM kb),
       thu AS (SELECT MAX(h) AS t FROM ku),
       shared AS (
         SELECT CAST(COUNT(*) AS BIGINT) AS n_shared
         FROM ku JOIN ha ON ku.h = ha.h
                 JOIN hb ON ku.h = hb.h),
       est AS (
         SELECT
           CAST((63 * CAST(1152921504606846976 AS HUGEINT)) // (SELECT t FROM tha)
                AS BIGINT) AS est_a,
           CAST((63 * CAST(1152921504606846976 AS HUGEINT)) // (SELECT t FROM thb)
                AS BIGINT) AS est_b,
           CAST((63 * CAST(1152921504606846976 AS HUGEINT)) // (SELECT t FROM thu)
                AS BIGINT) AS est_union,
           (SELECT n_shared FROM shared) AS k_shared)
       SELECT est_a, est_b, est_union, k_shared,
              CAST((est_union * k_shared) // 64 AS BIGINT) AS est_inter,
              (SELECT CAST(COUNT(*) AS BIGINT) FROM a) AS exact_a,
              (SELECT CAST(COUNT(*) AS BIGINT) FROM b) AS exact_b
       FROM est""",
)
def agg_kmv_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D4+ KMV sketch ALGEBRA — the property that makes sketches a
    warehouse primitive: two k-minimum-values sketches (k=64, md5
    60-bit hashes) MERGE into the union's sketch by just re-taking the
    k smallest, and the intersection estimate falls out of the
    inclusion rule est∩ = est∪ · |shared k-mins|/k. agg_kmv certifies
    the single-set estimator; this key certifies union/intersection
    composition against the exact per-set distincts carried alongside.
    Everything is deterministic integer math ((k−1)·2⁶⁰ floor-divided
    by the k-th min in int128/DECIMAL), so the 'estimate' is
    bit-reproducible cross-engine. Scale shape: each sketch is a
    64-row TakeOrdered (per-partition top-k then tiny merge — no
    global sort), and merges touch only sketch rows, never the data —
    exactly how a 100 TB rollup keeps distinct counts composable."""
    o = read_table(spark, sf_dir, "orders")
    h60 = "CAST(conv(substring(md5(CAST(k AS STRING)), 1, 15), 16, 10) AS BIGINT)"

    def sketch(df):
        return df.selectExpr(f"{h60} AS h").orderBy("h").limit(64)

    a = o.filter(F.col("o_orderpriority") == "1-URGENT").select(
        F.col("o_custkey").alias("k")
    ).distinct()
    b = o.filter(F.col("o_orderpriority") == "2-HIGH").select(
        F.col("o_custkey").alias("k")
    ).distinct()
    ha, hb = a.selectExpr(f"{h60} AS h"), b.selectExpr(f"{h60} AS h")
    ka, kb = sketch(a), sketch(b)
    ku = ha.union(hb).distinct().orderBy("h").limit(64)
    D = "DECIMAL(38,0)"
    two60 = "1152921504606846976"

    def est(kdf, name):
        return kdf.agg(
            F.expr(
                f"CAST((63 * CAST({two60} AS {D})) DIV MAX(h) AS BIGINT)"
            ).alias(name)
        )

    shared = (
        ku.join(ha, "h").join(hb, "h")
        .agg(F.count(F.lit(1)).cast("bigint").alias("k_shared"))
    )
    row = (
        est(ka, "est_a")
        .crossJoin(F.broadcast(est(kb, "est_b")))
        .crossJoin(F.broadcast(est(ku, "est_union")))
        .crossJoin(F.broadcast(shared))
        .crossJoin(F.broadcast(a.agg(F.count(F.lit(1)).cast("bigint").alias("exact_a"))))
        .crossJoin(F.broadcast(b.agg(F.count(F.lit(1)).cast("bigint").alias("exact_b"))))
    )
    return row.select(
        "est_a", "est_b", "est_union", "k_shared",
        F.expr("CAST((est_union * k_shared) DIV 64 AS BIGINT)").alias("est_inter"),
        "exact_a", "exact_b",
    )


@q(
    "dedup_blocking",
    """WITH ents AS (
         SELECT p_partkey AS ent_id,
                p_name || ' ' || p_brand AS name,
                p_name || '|' || p_type || '|' || CAST(p_size AS VARCHAR)
                  AS block_key
         FROM part),
       ordered AS (
         SELECT ent_id, name, block_key,
                ROW_NUMBER() OVER (PARTITION BY block_key
                                   ORDER BY name, ent_id) AS rn
         FROM ents),
       probes AS (
         SELECT ent_id, name, block_key, rn + k AS rn_b
         FROM ordered, unnest(range(1, 9)) AS t(k)),
       cand AS (
         SELECT p.ent_id AS ent_a, b.ent_id AS ent_b,
                p.name AS name_a, b.name AS name_b
         FROM probes p JOIN ordered b
           ON b.block_key = p.block_key AND b.rn = p.rn_b)
       SELECT LEAST(ent_a, ent_b) AS ent_a,
              GREATEST(ent_a, ent_b) AS ent_b,
              CAST(levenshtein(name_a, name_b) AS BIGINT) AS edit_dist
       FROM cand
       WHERE abs(length(name_a) - length(name_b)) <= 3
         AND levenshtein(name_a, name_b) <= 3""",
)
def dedup_blocking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K1+ entity-resolution blocking + SORTED NEIGHBORHOOD — the OTHER
    dedup discipline (record linkage on short entity strings, vs
    MinHash's long-document world): entity = product name + brand;
    blocks = name × type × size (cheap, high-recall keys); within each
    block entities sort by name and each one is verified (exact
    Levenshtein ≤ 3, with a length-band pre-guard) against only its
    NEXT 8 neighbors. The window is what makes the pair space LINEAR
    (n·w) no matter how dense a block gets — the naive within-block
    pairing measured 2.9-3.2× super-linear on the sf0.1→sf1 scaling
    smoke because the synthetic catalog densifies fixed name vocabulary;
    sorted-neighborhood is the standard ER answer (Hernández &
    Stolfo 1995, public). Plan: one block-partitioned rank window, a
    fixed 8× offset explode, and an equi-join on (block, rank) — no
    non-equi join, no width² blowup; both engines compute the identical
    integer edit distance so the match set is bit-stable."""
    pt = read_table(spark, sf_dir, "part")
    ents = pt.select(
        F.col("p_partkey").alias("ent_id"),
        F.concat_ws(" ", "p_name", "p_brand").alias("name"),
        F.concat_ws("|", "p_name", "p_type", F.col("p_size").cast("string")).alias("block_key"),
    )
    w = Window.partitionBy("block_key").orderBy("name", "ent_id")
    ordered = ents.withColumn("rn", F.row_number().over(w))
    probes = ordered.select(
        F.col("ent_id").alias("ent_a"), F.col("name").alias("name_a"),
        "block_key",
        F.explode(F.expr("sequence(rn + 1, rn + 8)")).alias("rn_b"),
    )
    b = ordered.select(
        F.col("ent_id").alias("eb"), F.col("name").alias("name_b"),
        F.col("block_key").alias("bk_b"), F.col("rn").alias("rn_bb"),
    )
    cand = probes.join(
        b, (F.col("block_key") == F.col("bk_b")) & (F.col("rn_b") == F.col("rn_bb"))
    )
    dist = F.levenshtein("name_a", "name_b")
    len_ok = F.abs(F.length("name_a") - F.length("name_b")) <= 3
    return cand.filter(len_ok & (dist <= 3)).select(
        F.least("ent_a", "eb").alias("ent_a"),
        F.greatest("ent_a", "eb").alias("ent_b"),
        dist.cast("bigint").alias("edit_dist"),
    )


@q(
    "agg_spc_rules",
    """WITH daily AS (
         SELECT event_type, CAST(ts AS DATE) AS d,
                CAST(COUNT(*) AS BIGINT) AS x
         FROM events GROUP BY 1, 2),
       stats AS (
         SELECT event_type,
                CAST(COUNT(*) AS BIGINT) AS nd,
                CAST(SUM(x) AS BIGINT) AS t,
                CAST(SUM(x * x) AS BIGINT) AS q
         FROM daily GROUP BY event_type),
       j AS (
         SELECT d.event_type, d.d, d.x,
                (d.x * s.nd - s.t) * (d.x * s.nd - s.t) AS dev2,
                s.nd * s.q - s.t * s.t AS var2
         FROM daily d JOIN stats s USING (event_type)
         WHERE s.nd * s.q > s.t * s.t)
       SELECT event_type, d, x,
              CAST((1000000 * dev2) // var2 AS BIGINT) AS z2_ppm,
              dev2 > 4 * var2 AS breach_2s,
              dev2 > 9 * var2 AS breach_3s
       FROM j""",
)
def agg_spc_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D+ statistical process control (Shewhart rule 1): the full
    control chart for each event type's daily counts — squared z-score
    in ppm plus 2σ/3σ breach flags, the ops-monitoring primitive behind
    every anomaly dashboard. The test is kept FULLY integer by
    cross-multiplication: with μ = T/D and σ² = (DQ−T²)/D², z² =
    (xD−T)²/(DQ−T²) — no float mean, no float variance, no sqrt; the
    breach flags compare dev² against 4·/9· the variance term exactly. Plan: one
    daily rollup, one per-type sufficient-stats agg (5-ish rows), and a
    broadcast-sized join back — the classic two-pass z-score shape that
    scales because the second pass carries only (type)-level scalars."""
    ev = read_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.col("ts").cast("date").alias("d")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("x"))
    stats = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("nd"),
        F.sum("x").cast("bigint").alias("t"),
        F.sum(F.col("x") * F.col("x")).cast("bigint").alias("q"),
    )
    j = (
        daily.join(F.broadcast(stats), "event_type")
        .filter(F.expr("nd * q > t * t"))
        .withColumn("dev2", F.expr("(x * nd - t) * (x * nd - t)"))
        .withColumn("var2", F.expr("nd * q - t * t"))
    )
    return j.select(
        "event_type", "d", "x",
        F.expr("CAST((1000000 * dev2) DIV var2 AS BIGINT)").alias("z2_ppm"),
        F.expr("dev2 > 4 * var2").alias("breach_2s"),
        F.expr("dev2 > 9 * var2").alias("breach_3s"),
    )


@q(
    "agg_changepoint",
    """WITH daily AS (
         SELECT event_type, CAST(ts AS DATE) AS d,
                CAST(COUNT(*) AS BIGINT) AS x
         FROM events GROUP BY 1, 2),
       cum AS (
         SELECT event_type, d, x,
                SUM(x) OVER (PARTITION BY event_type ORDER BY d
                             ROWS UNBOUNDED PRECEDING) AS s,
                ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY d) AS i,
                SUM(x) OVER (PARTITION BY event_type) AS t,
                COUNT(*) OVER (PARTITION BY event_type) AS nd
         FROM daily),
       scored AS (
         SELECT event_type, d, i, nd,
                ABS(s * nd - i * t) AS score,
                ROW_NUMBER() OVER (PARTITION BY event_type
                                   ORDER BY ABS(s * nd - i * t) DESC, d) AS rk
         FROM cum WHERE i < nd)
       SELECT event_type, d AS cp_day, CAST(i AS BIGINT) AS cp_index,
              CAST(nd AS BIGINT) AS n_days, CAST(score AS BIGINT) AS score
       FROM scored WHERE rk = 1""",
)
def agg_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D+ single changepoint detection per series (binary-segmentation
    score, integer form): for each event type's daily-count series the
    split day maximizing |S_i·D − i·T| — the scaled mean-shift CUSUM
    statistic (the float form |S_i − i·T/D| times D). Ties resolve to
    the earliest day; the last index is excluded (a split needs a
    non-empty right side). Where win_cusum tracks the RUNNING drift,
    this key reports the single most likely break — what an on-call
    engineer actually asks ('when did the rate change?'). Plan: daily
    rollup, one partitioned window pass for cumsum/rank, one top-1 —
    all per-type partitions, no global window."""
    ev = read_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.col("ts").cast("date").alias("d")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("x"))
    w_ord = Window.partitionBy("event_type").orderBy("d")
    w_all = Window.partitionBy("event_type")
    cum = daily.select(
        "event_type", "d", "x",
        F.sum("x").over(w_ord.rowsBetween(Window.unboundedPreceding, 0)).alias("s"),
        F.row_number().over(w_ord).alias("i"),
        F.sum("x").over(w_all).alias("t"),
        F.count(F.lit(1)).over(w_all).alias("nd"),
    )
    scored = cum.filter(F.col("i") < F.col("nd")).withColumn(
        "score", F.abs(F.col("s") * F.col("nd") - F.col("i") * F.col("t"))
    )
    w_rk = Window.partitionBy("event_type").orderBy(F.col("score").desc(), "d")
    return (
        scored.withColumn("rk", F.row_number().over(w_rk))
        .filter(F.col("rk") == 1)
        .select(
            "event_type", F.col("d").alias("cp_day"),
            F.col("i").cast("bigint").alias("cp_index"),
            F.col("nd").cast("bigint").alias("n_days"),
            F.col("score").cast("bigint").alias("score"),
        )
    )


@q(
    "text_mix_dedup_report",
    """WITH per_text AS (
         SELECT source, md5(lower(trim(text))) AS h,
                CAST(COUNT(*) AS BIGINT) AS cnt,
                CAST(MIN(len(string_split(trim(text), ' '))) AS BIGINT) AS tok
         FROM documents GROUP BY source, h),
       per_src AS (
         SELECT source,
                CAST(SUM(cnt) AS BIGINT) AS n_docs,
                CAST(COUNT(*) AS BIGINT) AS n_unique,
                CAST(SUM(cnt * tok) AS BIGINT) AS tokens,
                CAST(SUM(tok) AS BIGINT) AS unique_tokens
         FROM per_text GROUP BY source),
       tot AS (
         SELECT CAST(SUM(tokens) AS BIGINT) AS tot_tokens,
                CAST(SUM(unique_tokens) AS BIGINT) AS tot_unique
         FROM per_src)
       SELECT source, n_docs, n_unique,
              CAST((1000000 * n_docs) // n_unique AS BIGINT) AS dup_factor_ppm,
              tokens, unique_tokens,
              CAST((1000000 * tokens) // tot_tokens AS BIGINT) AS share_before_ppm,
              CAST((1000000 * unique_tokens) // tot_unique AS BIGINT) AS share_after_ppm
       FROM per_src CROSS JOIN tot""",
)
def text_mix_dedup_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K4+K1 mixture-shift report — the table a data-mixture owner reads
    before training: per source, docs and tokens BEFORE and AFTER exact
    dedup, the duplication factor, and the source's share of the total
    token budget pre/post. Dedup silently reweights a mixture (a 3×-
    duplicated crawl shrinks relative to a clean corpus after dedup);
    this key quantifies that shift, composing dedup_exact's content-hash
    semantics with text_domain_mix's share accounting in ONE pass:
    a (source, content-hash) agg (duplicate token counts collapse by
    construction — identical text has identical token count, so MIN is
    exact, not a choice), a source-level rollup, and a 1-row total
    broadcast (whitelisted scalar)."""
    d = read_table(spark, sf_dir, "documents")
    per_text = d.groupBy(
        "source", F.md5(F.lower(F.trim(F.col("text")))).alias("h")
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt"),
        F.min(F.size(F.split(F.trim(F.col("text")), " "))).cast("bigint").alias("tok"),
    )
    per_src = per_text.groupBy("source").agg(
        F.sum("cnt").cast("bigint").alias("n_docs"),
        F.count(F.lit(1)).cast("bigint").alias("n_unique"),
        F.sum(F.col("cnt") * F.col("tok")).cast("bigint").alias("tokens"),
        F.sum("tok").cast("bigint").alias("unique_tokens"),
    )
    tot = per_src.agg(
        F.sum("tokens").cast("bigint").alias("tot_tokens"),
        F.sum("unique_tokens").cast("bigint").alias("tot_unique"),
    )
    return per_src.crossJoin(F.broadcast(tot)).select(
        "source", "n_docs", "n_unique",
        F.expr("CAST((1000000 * n_docs) DIV n_unique AS BIGINT)").alias("dup_factor_ppm"),
        "tokens", "unique_tokens",
        F.expr("CAST((1000000 * tokens) DIV tot_tokens AS BIGINT)").alias("share_before_ppm"),
        F.expr("CAST((1000000 * unique_tokens) DIV tot_unique AS BIGINT)").alias("share_after_ppm"),
    )


@q(
    "freq_kinship",
    """WITH gt AS (
         SELECT l_partkey AS site_id, l_suppkey % 20 AS sample_id,
                MIN(CASE WHEN l_orderkey % 3 = 0 THEN 2
                         WHEN l_orderkey % 3 = 1 THEN 1 ELSE 0 END) AS g
         FROM lineitem GROUP BY 1, 2),
       pairs AS (
         SELECT a.sample_id AS sample_a, b.sample_id AS sample_b,
                CAST(COUNT(*) AS BIGINT) AS n_shared,
                CAST(SUM(CASE WHEN a.g = 1 AND b.g = 1 THEN 1 ELSE 0 END)
                     AS BIGINT) AS n_hh,
                CAST(SUM(CASE WHEN (a.g = 2 AND b.g = 0)
                             OR (a.g = 0 AND b.g = 2) THEN 1 ELSE 0 END)
                     AS BIGINT) AS n_opp,
                CAST(SUM(CASE WHEN a.g = 1 THEN 1 ELSE 0 END) AS BIGINT) AS het_a,
                CAST(SUM(CASE WHEN b.g = 1 THEN 1 ELSE 0 END) AS BIGINT) AS het_b
         FROM gt a JOIN gt b
           ON a.site_id = b.site_id AND a.sample_id < b.sample_id
         GROUP BY 1, 2)
       SELECT sample_a, sample_b, n_shared, n_hh, n_opp, het_a, het_b,
              CAST((1000000 * (n_hh - 2 * n_opp)) // (het_a + het_b)
                   AS BIGINT) AS phi_ppm
       FROM pairs WHERE het_a + het_b > 0""",
)
def freq_kinship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Varda-core sample relatedness: the KING-robust kinship estimator
    (Manichaikul et al. 2010, public) for every sample pair — φ =
    (N_het,het − 2·N_opposite-hom) / (N_het(a) + N_het(b)) over sites
    called in BOTH samples. Duplicate-sample detection (φ≈0.5),
    unexpected relatedness, and sample swaps are the QC this catches
    before any association run. Exactness: the numerator is SIGNED
    (unrelated pairs drift negative); Spark BIGINT DIV and DuckDB
    BIGINT // both truncate toward zero, so the quotient twins exactly
    without adjustment. Plan: the genotype
    matrix collapses to one row per (site, sample) first, then a
    site-keyed self-join bounded by samples-per-site fan-out (never
    pair-per-site-squared materialization beyond the per-site width),
    grouped straight into the 190-row pair table — the biobank-scale
    shape where sites stream and pair state stays tiny."""
    li = read_table(spark, sf_dir, "lineitem")
    gt = li.groupBy(
        F.col("l_partkey").alias("site_id"),
        (F.col("l_suppkey") % 20).alias("sample_id"),
    ).agg(
        F.min(
            F.expr(
                "CASE WHEN l_orderkey % 3 = 0 THEN 2"
                " WHEN l_orderkey % 3 = 1 THEN 1 ELSE 0 END"
            )
        ).alias("g")
    )
    a = gt.select(
        "site_id", F.col("sample_id").alias("sample_a"), F.col("g").alias("ga")
    )
    b = gt.select(
        F.col("site_id").alias("site_b"),
        F.col("sample_id").alias("sample_b"),
        F.col("g").alias("gb"),
    )
    pairs = (
        a.join(b, (F.col("site_id") == F.col("site_b")) & (F.col("sample_a") < F.col("sample_b")))
        .groupBy("sample_a", "sample_b")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_shared"),
            F.sum(F.when((F.col("ga") == 1) & (F.col("gb") == 1), 1).otherwise(0))
            .cast("bigint").alias("n_hh"),
            F.sum(
                F.when(
                    ((F.col("ga") == 2) & (F.col("gb") == 0))
                    | ((F.col("ga") == 0) & (F.col("gb") == 2)), 1
                ).otherwise(0)
            ).cast("bigint").alias("n_opp"),
            F.sum(F.when(F.col("ga") == 1, 1).otherwise(0)).cast("bigint").alias("het_a"),
            F.sum(F.when(F.col("gb") == 1, 1).otherwise(0)).cast("bigint").alias("het_b"),
        )
    )
    # Signed division: Spark BIGINT DIV truncates toward zero and so
    # does DuckDB BIGINT // (verified: -7 // 2 = -3) — plain DIV is the
    # exact twin here; only DECIMAL-typed // degrades to float on the
    # duck side, which this key never uses.
    phi = "(1000000 * (n_hh - 2 * n_opp)) DIV (het_a + het_b)"
    return pairs.filter(F.expr("het_a + het_b > 0")).select(
        "sample_a", "sample_b", "n_shared", "n_hh", "n_opp", "het_a", "het_b",
        F.expr(f"CAST({phi} AS BIGINT)").alias("phi_ppm"),
    )


@q(
    "agg_hist_quantile",
    """WITH v AS (
         SELECT CAST(FLOOR(o_totalprice) AS BIGINT) AS x FROM orders),
       hist AS (
         SELECT x // 5000 AS bucket, CAST(COUNT(*) AS BIGINT) AS cnt
         FROM v GROUP BY 1),
       cum AS (
         SELECT bucket, cnt,
                SUM(cnt) OVER (ORDER BY bucket ROWS UNBOUNDED PRECEDING) AS cum,
                SUM(cnt) OVER () AS n
         FROM hist),
       spine AS (SELECT unnest([50, 90, 99]) AS p),
       cand AS (
         SELECT s.p, c.bucket, c.cnt, c.cum, c.n,
                (s.p * c.n + 99) // 100 AS target,
                ROW_NUMBER() OVER (PARTITION BY s.p ORDER BY c.bucket) AS rk
         FROM spine s JOIN cum c ON c.cum >= (s.p * c.n + 99) // 100)
       SELECT CAST(p AS BIGINT) AS p, CAST(n AS BIGINT) AS n,
              CAST(target AS BIGINT) AS target_rank,
              CAST(bucket * 5000
                   + (5000 * (target - (cum - cnt))) // cnt AS BIGINT) AS est_value
       FROM cand WHERE rk = 1""",
)
def agg_hist_quantile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D4+ histogram-sketch quantiles — the MERGEABLE alternative to a
    global sort: order totals bucket into fixed 5000-wide bins (a
    histogram sketch that unions across partitions/partitions-of-data by
    just adding counts — the property exact quantiles lack), then p50/
    p90/p99 are read off the cumulative histogram with integer linear
    interpolation inside the target bucket. Everything is floored
    integer math (ceil(p·n/100) as (p·n+99)//100), so the 'estimate' is
    bit-stable cross-engine. Plan: one map-side histogram agg (bucket
    count bounded by the value domain, ~120 buckets), a bucket-count-
    sized cumulative window, and a 3-row percentile spine join — at
    100 TB the data-sized work is exactly one scan."""
    o = read_table(spark, sf_dir, "orders")
    hist = (
        o.select(F.expr("CAST(FLOOR(o_totalprice) AS BIGINT) DIV 5000").alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    )
    # bucket-count-sized global window (value-domain-bounded, ~120 rows)
    w = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, 0)
    cum = hist.select(
        "bucket", "cnt",
        F.sum("cnt").over(w).alias("cum"),
        F.sum("cnt").over(Window.partitionBy()).alias("n"),
    )
    spine = spark.range(1).selectExpr("explode(array(50, 90, 99)) AS p")
    cand = (
        F.broadcast(spine)
        .join(cum, F.col("cum") >= F.expr("(p * n + 99) DIV 100"))
        .withColumn("target", F.expr("(p * n + 99) DIV 100"))
        .withColumn(
            "rk", F.row_number().over(Window.partitionBy("p").orderBy("bucket"))
        )
    )
    return cand.filter(F.col("rk") == 1).select(
        F.col("p").cast("bigint").alias("p"),
        F.col("n").cast("bigint").alias("n"),
        F.col("target").cast("bigint").alias("target_rank"),
        F.expr(
            "CAST(bucket * 5000 + (5000 * (target - (cum - cnt))) DIV cnt AS BIGINT)"
        ).alias("est_value"),
    )


@q(
    "freq_burden",
    """WITH calls AS (
         SELECT l_partkey AS site_id, l_suppkey % 40 AS sample_id,
                CASE WHEN (l_orderkey + l_partkey * 13)
                          % (10 + l_partkey % 40) = 0
                     THEN 1 ELSE 0 END AS dose
         FROM lineitem),
       persite AS (
         SELECT site_id, sample_id, MAX(dose) AS dose
         FROM calls GROUP BY site_id, sample_id),
       af AS (
         SELECT site_id,
                CAST(SUM(dose) AS BIGINT) AS ac,
                CAST(COUNT(*) AS BIGINT) AS n
         FROM persite GROUP BY site_id),
       rare AS (
         SELECT site_id FROM af
         WHERE ac > 0 AND (1000000 * ac) // n < 50000),
       carrier AS (
         SELECT p.site_id // 50 AS gene_id, p.sample_id,
                MAX(p.dose) AS carrier
         FROM persite p JOIN rare r USING (site_id)
         GROUP BY 1, 2),
       tab AS (
         SELECT gene_id,
                CAST(SUM(CASE WHEN sample_id % 2 = 0 THEN carrier ELSE 0 END)
                     AS BIGINT) AS a,
                CAST(SUM(CASE WHEN sample_id % 2 = 0 THEN 1 - carrier ELSE 0 END)
                     AS BIGINT) AS b,
                CAST(SUM(CASE WHEN sample_id % 2 = 1 THEN carrier ELSE 0 END)
                     AS BIGINT) AS c,
                CAST(SUM(CASE WHEN sample_id % 2 = 1 THEN 1 - carrier ELSE 0 END)
                     AS BIGINT) AS d
         FROM carrier GROUP BY gene_id)
       SELECT gene_id, a AS carriers_case, b AS noncar_case,
              c AS carriers_ctrl, d AS noncar_ctrl,
              CAST((1000000 * (a + b + c + d)
                    * (a * d - b * c) * (a * d - b * c))
                   // ((a + b) * (c + d) * (a + c) * (b + d))
                   AS BIGINT) AS chi2_ppm
       FROM tab
       WHERE (a + b) > 0 AND (c + d) > 0 AND (a + c) > 0 AND (b + d) > 0""",
)
def freq_burden(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Varda-core gene-level rare-variant burden test (CAST/collapsing
    test): rare sites (pooled alt frequency < 5%, carrier rates varying
    by site so the MAF gate genuinely splits) collapse per gene to a
    per-sample carrier flag; each gene's carriers split by case/control
    into a 2×2 table scored with the integer-exact chi² identity
    N(ad−bc)²/((a+b)(c+d)(a+c)(b+d)) as a ppm floor. This is how
    sequencing studies recover power on variants individually too rare
    to test — the canonical downstream consumer of freq_maf_spectrum's
    rare tail. Plan: call-matrix dedup agg → site AF agg → rare-site
    semi-join (broadcast-sized) → (gene, sample) collapse → gene-level
    2×2 — every stage a keyed partial agg; nothing wider than the gene
    table ever materializes."""
    li = read_table(spark, sf_dir, "lineitem")
    calls = li.select(
        F.col("l_partkey").alias("site_id"),
        (F.col("l_suppkey") % 40).alias("sample_id"),
        F.expr(
            "CASE WHEN (l_orderkey + l_partkey * 13) % (10 + l_partkey % 40) = 0"
            " THEN 1 ELSE 0 END"
        ).alias("dose"),
    )
    persite = calls.groupBy("site_id", "sample_id").agg(F.max("dose").alias("dose"))
    af = persite.groupBy("site_id").agg(
        F.sum("dose").cast("bigint").alias("ac"),
        F.count(F.lit(1)).cast("bigint").alias("n"),
    )
    rare = af.filter(
        (F.col("ac") > 0) & (F.expr("(1000000 * ac) DIV n") < 50000)
    ).select("site_id")
    carrier = (
        persite.join(rare, "site_id", "left_semi")
        .groupBy(
            F.expr("site_id DIV 50").alias("gene_id"), "sample_id"
        )
        .agg(F.max("dose").alias("carrier"))
    )
    tab = carrier.groupBy("gene_id").agg(
        F.sum(F.when(F.col("sample_id") % 2 == 0, F.col("carrier")).otherwise(0))
        .cast("bigint").alias("a"),
        F.sum(F.when(F.col("sample_id") % 2 == 0, 1 - F.col("carrier")).otherwise(0))
        .cast("bigint").alias("b"),
        F.sum(F.when(F.col("sample_id") % 2 == 1, F.col("carrier")).otherwise(0))
        .cast("bigint").alias("c"),
        F.sum(F.when(F.col("sample_id") % 2 == 1, 1 - F.col("carrier")).otherwise(0))
        .cast("bigint").alias("d"),
    )
    return tab.filter(
        F.expr("(a + b) > 0 AND (c + d) > 0 AND (a + c) > 0 AND (b + d) > 0")
    ).select(
        "gene_id",
        F.col("a").alias("carriers_case"), F.col("b").alias("noncar_case"),
        F.col("c").alias("carriers_ctrl"), F.col("d").alias("noncar_ctrl"),
        F.expr(
            "CAST((1000000 * (a + b + c + d) * (a * d - b * c) * (a * d - b * c))"
            " DIV ((a + b) * (c + d) * (a + c) * (b + d)) AS BIGINT)"
        ).alias("chi2_ppm"),
    )


@q(
    "win_ohlc",
    """WITH t AS (
         SELECT event_type, CAST(ts AS DATE) AS d,
                CAST(FLOOR(value * 100) AS BIGINT) AS cents, ts, event_id
         FROM events),
       o AS (
         SELECT event_type, d, cents,
                ROW_NUMBER() OVER w AS rn_open,
                ROW_NUMBER() OVER (PARTITION BY event_type, d
                                   ORDER BY ts DESC, event_id DESC) AS rn_close
         FROM t
         WINDOW w AS (PARTITION BY event_type, d ORDER BY ts, event_id)),
       agg AS (
         SELECT event_type, d,
                CAST(MAX(CASE WHEN rn_open = 1 THEN cents END) AS BIGINT) AS open,
                CAST(MAX(cents) AS BIGINT) AS high,
                CAST(MIN(cents) AS BIGINT) AS low,
                CAST(MAX(CASE WHEN rn_close = 1 THEN cents END) AS BIGINT) AS close,
                CAST(COUNT(*) AS BIGINT) AS volume
         FROM o GROUP BY event_type, d)
       SELECT * FROM agg""",
)
def win_ohlc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E+ OHLC candle rollup — the time-series downsampling every
    monitoring and market system runs: per (series, day) the first,
    max, min, and last observation plus volume. First/last are made
    deterministic by the (ts, event_id) total order (two rank windows
    per partition — no min_by/arg_min, whose struct-ordering semantics
    differ subtly across engines); values are floored to integer cents.
    Plan: one (type, day)-partitioned window pass feeding one grouped
    agg — shuffles once on the partition key, volume-weighted cousin of
    win_vwap."""
    ev = read_table(spark, sf_dir, "events")
    t = ev.select(
        "event_type", F.col("ts").cast("date").alias("d"),
        F.expr("CAST(FLOOR(value * 100) AS BIGINT)").alias("cents"),
        "ts", "event_id",
    )
    w_a = Window.partitionBy("event_type", "d").orderBy("ts", "event_id")
    w_d = Window.partitionBy("event_type", "d").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    o = t.select(
        "event_type", "d", "cents",
        F.row_number().over(w_a).alias("rn_open"),
        F.row_number().over(w_d).alias("rn_close"),
    )
    return o.groupBy("event_type", "d").agg(
        F.max(F.when(F.col("rn_open") == 1, F.col("cents"))).cast("bigint").alias("open"),
        F.max("cents").cast("bigint").alias("high"),
        F.min("cents").cast("bigint").alias("low"),
        F.max(F.when(F.col("rn_close") == 1, F.col("cents"))).cast("bigint").alias("close"),
        F.count(F.lit(1)).cast("bigint").alias("volume"),
    )


@q(
    "scan_partition_pruned",
    """SELECT o_orderpriority,
              CAST(COUNT(*) AS BIGINT) AS n,
              CAST(SUM(CAST(FLOOR(o_totalprice) AS BIGINT)) AS BIGINT) AS tot
       FROM orders
       WHERE year(o_orderdate) = 1998
       GROUP BY o_orderpriority""",
)
def scan_partition_pruned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5+ PARTITION PRUNING — the other half of physical layout design
    (join_bucketed covers co-location; this covers scan elimination):
    orders land partitioned by order year (hive-style year=YYYY
    directories), and a year-filtered read touches ONLY that
    directory's files — at 100 TB the difference between scanning one
    partition and scanning the table. The filter arrives as a
    PartitionFilter (metadata-only, zero data read for other years),
    which tests/test_plans.py asserts on the physical plan. Scratch
    table is session-scoped like join_bucketed's (concurrent sessions
    must not clobber each other's files); the oracle is the same
    aggregate with a plain filter — partitioning is physical, not
    semantic."""
    o = read_table(spark, sf_dir, "orders").withColumn(
        "o_year", F.year("o_orderdate")
    )
    tag = "".join(ch if ch.isalnum() else "_" for ch in spark.sparkContext.applicationId)
    path = f"/root/repo/spark-warehouse/part_orders_{tag}"
    _sweep_stale_scratch()
    o.write.mode("overwrite").partitionBy("o_year").parquet(path)
    back = spark.read.parquet(path).filter(F.col("o_year") == 1998)
    return back.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.expr("CAST(FLOOR(o_totalprice) AS BIGINT)")).cast("bigint").alias("tot"),
    )


@q(
    "sim_mips_prune",
    """WITH q AS (
         SELECT vec_id,
                list_transform(embedding,
                    x -> CAST(floor(CAST(x AS DOUBLE) * 100) AS BIGINT)) AS e
         FROM embeddings),
       n AS (
         SELECT vec_id, e,
                CAST(list_sum(list_transform(e, x -> x * x)) AS BIGINT) AS n2
         FROM q),
       queries AS (SELECT * FROM n WHERE vec_id % 97 = 0),
       topn AS (
         SELECT * FROM n ORDER BY n2 DESC, vec_id LIMIT 16),
       p1 AS (
         SELECT qu.vec_id AS query_id,
                MAX(CAST(list_sum(list_transform(list_zip(qu.e, t.e),
                                                 s -> s[1] * s[2]))
                         AS BIGINT)) AS best0
         FROM queries qu JOIN topn t ON t.vec_id <> qu.vec_id
         GROUP BY qu.vec_id),
       p2 AS (
         SELECT qu.vec_id AS query_id, c.vec_id AS cand_id,
                CAST(list_sum(list_transform(list_zip(qu.e, c.e),
                                             s -> s[1] * s[2])) AS BIGINT) AS dot_q
         FROM queries qu
         JOIN p1 ON p1.query_id = qu.vec_id
         JOIN n c ON c.vec_id <> qu.vec_id
                 AND (p1.best0 < 0 OR c.n2 * qu.n2 >= p1.best0 * p1.best0)),
       ranked AS (
         SELECT query_id, cand_id, dot_q,
                ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY dot_q DESC, cand_id) AS rk,
                COUNT(*) OVER (PARTITION BY query_id) AS scanned
         FROM p2),
       tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_total FROM n)
       SELECT query_id, cand_id AS top1_id, dot_q,
              CAST(scanned AS BIGINT) AS scanned, n_total,
              CAST((1000000 * (n_total - 1 - scanned)) // (n_total - 1)
                   AS BIGINT) AS pruned_ppm
       FROM ranked CROSS JOIN tot WHERE rk = 1""",
)
def sim_mips_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K3+ EXACT maximum-inner-product search with Cauchy-Schwarz norm
    pruning — the two-phase trick that makes exact MIPS tractable at
    scale: (1) score each query against only the 16 largest-norm vectors
    to get a lower bound best₀; (2) scan only candidates whose norm
    bound can beat it (‖x‖²·‖q‖² ≥ best₀², squared so sqrt-free; if
    best₀ < 0 the bound is vacuous and the scan falls back to full).
    The result is PROVABLY the global top-1 (any beater has
    dot > best₀ ≥ 0 and dot² ≤ ‖q‖²‖x‖²), unlike LSH/IVF which trade
    recall — and pruned_ppm reports how much of the corpus the bound
    eliminated. All dots and norms are quantized integers computed
    dimension-agnostically (zip_with/aggregate ≡ list_zip/list_sum).
    Plan: the norm top-16 is a TakeOrdered (per-partition top-k), the
    phase-2 probe is a broadcast of the ~20-row query+bound table into
    a codegen'd filter over one corpus scan — query-sample-sized build
    side, whitelisted."""
    e = read_table(spark, sf_dir, "embeddings")
    qcol = F.expr(
        "transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 100) AS BIGINT))"
    )
    n = e.select("vec_id", qcol.alias("e")).withColumn(
        "n2", F.expr("CAST(aggregate(e, 0L, (a, x) -> a + x * x) AS BIGINT)")
    )
    queries = n.filter(F.col("vec_id") % 97 == 0).select(
        F.col("vec_id").alias("query_id"), F.col("e").alias("qe"), F.col("n2").alias("qn2")
    )
    topn = n.orderBy(F.col("n2").desc(), "vec_id").limit(16).select(
        F.col("vec_id").alias("t_id"), F.col("e").alias("te")
    )
    dot_t = F.expr("CAST(aggregate(zip_with(qe, te, (x, y) -> x * y), 0L, (a, v) -> a + v) AS BIGINT)")
    p1 = (
        queries.crossJoin(F.broadcast(topn))
        .filter(F.col("t_id") != F.col("query_id"))
        .groupBy("query_id")
        .agg(F.max(dot_t).alias("best0"))
    )
    probe = queries.join(p1, "query_id")
    p2 = (
        n.join(
            F.broadcast(probe),
            (F.col("vec_id") != F.col("query_id"))
            & (
                (F.col("best0") < 0)
                | (F.col("n2") * F.col("qn2") >= F.col("best0") * F.col("best0"))
            ),
        )
        .select(
            "query_id", F.col("vec_id").alias("cand_id"),
            F.expr(
                "CAST(aggregate(zip_with(qe, e, (x, y) -> x * y), 0L, (a, v) -> a + v) AS BIGINT)"
            ).alias("dot_q"),
        )
    )
    w_rk = Window.partitionBy("query_id").orderBy(F.col("dot_q").desc(), "cand_id")
    w_ct = Window.partitionBy("query_id")
    ranked = p2.select(
        "query_id", "cand_id", "dot_q",
        F.row_number().over(w_rk).alias("rk"),
        F.count(F.lit(1)).over(w_ct).alias("scanned"),
    )
    tot = n.agg(F.count(F.lit(1)).cast("bigint").alias("n_total"))
    return (
        ranked.filter(F.col("rk") == 1)
        .crossJoin(F.broadcast(tot))
        .select(
            "query_id", F.col("cand_id").alias("top1_id"), "dot_q",
            F.col("scanned").cast("bigint").alias("scanned"), "n_total",
            F.expr(
                "CAST((1000000 * (n_total - 1 - scanned)) DIV (n_total - 1) AS BIGINT)"
            ).alias("pruned_ppm"),
        )
    )


@q(
    "freq_roh",
    """WITH gt AS (
         SELECT l_partkey AS site_id, l_suppkey % 10 AS sample_id,
                MIN(CASE WHEN l_orderkey % 3 = 0 THEN 2
                         WHEN l_orderkey % 3 = 1 THEN 1 ELSE 0 END) AS g
         FROM lineitem GROUP BY 1, 2),
       loc AS (
         SELECT sample_id, g <> 1 AS hom,
                CAST(site_id % 5 AS VARCHAR) AS chromosome,
                CAST(site_id * 31 + 1 AS BIGINT) AS position
         FROM gt),
       grp AS (
         SELECT sample_id, chromosome, position, hom,
                SUM(CASE WHEN hom THEN 0 ELSE 1 END)
                  OVER (PARTITION BY sample_id, chromosome
                        ORDER BY position ROWS UNBOUNDED PRECEDING) AS island
         FROM loc),
       runs AS (
         SELECT sample_id, chromosome, island,
                CAST(COUNT(*) AS BIGINT) AS n_sites,
                CAST(MAX(position) - MIN(position) AS BIGINT) AS span_bp
         FROM grp WHERE hom
         GROUP BY sample_id, chromosome, island
         HAVING COUNT(*) >= 5),
       genome AS (
         SELECT CAST(SUM(mx) AS BIGINT) AS genome_bp FROM (
           SELECT chromosome, MAX(position) AS mx FROM loc GROUP BY chromosome))
       SELECT CAST(sample_id AS BIGINT) AS sample_id,
              CAST(COUNT(*) AS BIGINT) AS n_runs,
              CAST(MAX(n_sites) AS BIGINT) AS longest_sites,
              CAST(MAX(span_bp) AS BIGINT) AS longest_bp,
              CAST((1000000 * SUM(span_bp)) // MAX(genome_bp) AS BIGINT) AS froh_ppm
       FROM runs CROSS JOIN genome GROUP BY sample_id""",
)
def freq_roh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Varda-core runs of homozygosity (plink --homozyg): per sample,
    stretches of ≥5 consecutive homozygous sites along each chromosome —
    the autozygosity signal behind consanguinity QC and recessive-disease
    gene mapping; F_ROH (fraction of the genome in runs) is the standard
    inbreeding estimate. The island segmentation is the gaps-and-islands
    pattern at genome scale: a running count of heterozygous breaks
    assigns every hom site to its run (one partitioned window per
    (sample, chromosome) — never a global sort), then runs aggregate to
    per-sample stats with an exact ppm F_ROH. The denominator is
    DATA-DERIVED: genome span = Σ per-chromosome MAX(position)
    (broadcast 1-row scalar), so F_ROH stays a genome FRACTION at every
    scale factor — positions are unbounded (site_id·31+1, no modulo;
    the fixed-span wrap was the r5 quadratic-density lesson), so any
    hardcoded span would drift with sf (ADVICE r5). Genotypes collapse
    to one call per (site, sample) first, same matrix discipline as
    freq_kinship."""
    li = read_table(spark, sf_dir, "lineitem")
    gt = li.groupBy(
        F.col("l_partkey").alias("site_id"),
        (F.col("l_suppkey") % 10).alias("sample_id"),
    ).agg(
        F.min(
            F.expr(
                "CASE WHEN l_orderkey % 3 = 0 THEN 2"
                " WHEN l_orderkey % 3 = 1 THEN 1 ELSE 0 END"
            )
        ).alias("g")
    )
    loc = gt.select(
        "sample_id",
        (F.col("g") != 1).alias("hom"),
        (F.col("site_id") % 5).cast("string").alias("chromosome"),
        (F.col("site_id") * 31 + 1).cast("long").alias("position"),
    )
    w = (
        Window.partitionBy("sample_id", "chromosome")
        .orderBy("position")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    grp = loc.withColumn(
        "island", F.sum(F.when(F.col("hom"), 0).otherwise(1)).over(w)
    )
    runs = (
        grp.filter(F.col("hom"))
        .groupBy("sample_id", "chromosome", "island")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_sites"),
            (F.max("position") - F.min("position")).cast("bigint").alias("span_bp"),
        )
        .filter(F.col("n_sites") >= 5)
    )
    genome = (
        loc.groupBy("chromosome")
        .agg(F.max("position").alias("mx"))
        .agg(F.sum("mx").cast("bigint").alias("genome_bp"))
    )
    return (
        runs.crossJoin(F.broadcast(genome))
        .groupBy(F.col("sample_id").cast("bigint").alias("sample_id"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_runs"),
            F.max("n_sites").cast("bigint").alias("longest_sites"),
            F.max("span_bp").cast("bigint").alias("longest_bp"),
            F.expr(
                "CAST((1000000 * SUM(span_bp)) DIV MAX(genome_bp) AS BIGINT)"
            ).alias("froh_ppm"),
        )
    )


@q(
    "join_asof_tolerance",
    """WITH v AS (
         SELECT user_id, ts, MAX(event_id) AS view_event_id
         FROM events WHERE event_type = 'view' GROUP BY user_id, ts),
       p AS (
         SELECT user_id, ts, event_id FROM events WHERE event_type = 'purchase'),
       j AS (
         SELECT p.user_id, p.event_id, epoch_us(p.ts) AS ts_us,
                v.view_event_id,
                epoch_us(p.ts) - epoch_us(v.ts) AS gap_us
         FROM p ASOF LEFT JOIN v ON p.user_id = v.user_id AND p.ts >= v.ts)
       SELECT user_id, event_id, ts_us,
              CASE WHEN gap_us <= 3600000000 THEN view_event_id END
                AS view_event_id,
              CASE WHEN gap_us <= 3600000000 THEN gap_us END AS gap_us,
              gap_us IS NOT NULL AND gap_us > 3600000000 AS expired
       FROM j""",
)
def join_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C+ as-of join WITH TOLERANCE (pandas merge_asof semantics): each
    purchase matches the user's most recent view only if it happened
    within the last hour — a stale match is reported as expired and the
    payload columns go NULL. The staleness bound is what production
    feature joins actually need (a price quote or feature vector older
    than the tolerance is worse than missing — it's silently wrong).
    Same single carry-forward-window plan as join_asof; the tolerance is
    a post-window projection, so the bound costs nothing extra."""
    from varda_spark.operators.asof import asof_join

    TOL_US = 3600 * 1000000
    ev = read_table(spark, sf_dir, "events")
    views = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("view_event_id"))
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "event_id"
    )
    out = asof_join(purchases, views, by="user_id", on="ts", right_cols=["view_event_id"])
    gap = F.unix_micros("ts") - F.unix_micros("ts_right")
    return out.select(
        "user_id", "event_id",
        F.unix_micros("ts").alias("ts_us"),
        F.when(gap <= TOL_US, F.col("view_event_id_right")).alias("view_event_id"),
        F.when(gap <= TOL_US, gap).alias("gap_us"),
        (gap.isNotNull() & (gap > TOL_US)).alias("expired"),
    )


@q(
    "qa_expectations",
    """WITH m AS (
         SELECT CAST(COUNT(*) AS BIGINT) AS n,
                CAST(SUM(CASE WHEN o_custkey IS NOT NULL THEN 1 ELSE 0 END)
                     AS BIGINT) AS custkey_nn,
                CAST(COUNT(DISTINCT o_orderkey) AS BIGINT) AS orderkey_distinct,
                CAST(SUM(CASE WHEN o_orderstatus IN ('O', 'F', 'P')
                         THEN 1 ELSE 0 END) AS BIGINT) AS status_ok,
                CAST(SUM(CASE WHEN o_totalprice > 0 AND o_totalprice < 1000000
                         THEN 1 ELSE 0 END) AS BIGINT) AS price_ok,
                CAST(SUM(CASE WHEN o_orderdate >= '1990-01-01'
                         THEN 1 ELSE 0 END) AS BIGINT) AS date_ok
         FROM orders),
       u AS (
         SELECT 'custkey_not_null' AS rule, custkey_nn AS hits, n,
                1000000 AS threshold_ppm FROM m
         UNION ALL SELECT 'orderkey_unique', orderkey_distinct, n, 1000000 FROM m
         UNION ALL SELECT 'status_in_set', status_ok, n, 1000000 FROM m
         UNION ALL SELECT 'price_in_range', price_ok, n, 999000 FROM m
         UNION ALL SELECT 'date_after_1990', date_ok, n, 1000000 FROM m)
       SELECT rule, CAST((1000000 * hits) // n AS BIGINT) AS metric_ppm,
              CAST(threshold_ppm AS BIGINT) AS threshold_ppm,
              (1000000 * hits) // n >= threshold_ppm AS pass
       FROM u""",
)
def qa_expectations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """QA+ declarative expectation suite (the Great-Expectations shape):
    a fixed rule set — not-null, key uniqueness, value-set membership,
    numeric range, date floor — evaluated over orders in ONE
    conditional-aggregate scan, each rule reported as measured ppm vs
    its threshold with a pass flag. This is the data-contract gate a
    warehouse runs on every load; the single-scan shape matters at
    100 TB because N rules must never mean N scans. Uniqueness rides
    the same scan as a COUNT(DISTINCT) partial; everything else is a
    codegen'd CASE sum."""
    o = read_table(spark, sf_dir, "orders")
    m = o.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.when(F.col("o_custkey").isNotNull(), 1).otherwise(0))
        .cast("bigint").alias("custkey_nn"),
        F.countDistinct("o_orderkey").cast("bigint").alias("orderkey_distinct"),
        F.sum(F.when(F.col("o_orderstatus").isin("O", "F", "P"), 1).otherwise(0))
        .cast("bigint").alias("status_ok"),
        F.sum(
            F.when((F.col("o_totalprice") > 0) & (F.col("o_totalprice") < 1000000), 1)
            .otherwise(0)
        ).cast("bigint").alias("price_ok"),
        F.sum(F.when(F.col("o_orderdate") >= "1990-01-01", 1).otherwise(0))
        .cast("bigint").alias("date_ok"),
    )
    rules = [
        ("custkey_not_null", "custkey_nn", 1000000),
        ("orderkey_unique", "orderkey_distinct", 1000000),
        ("status_in_set", "status_ok", 1000000),
        ("price_in_range", "price_ok", 999000),
        ("date_after_1990", "date_ok", 1000000),
    ]
    stack = "stack({}, {}) AS (rule, hits, threshold_ppm)".format(
        len(rules),
        ", ".join(f"'{r}', {c}, {t}" for r, c, t in rules),
    )
    u = m.select(F.expr(stack), "n")
    return u.select(
        "rule",
        F.expr("CAST((1000000 * hits) DIV n AS BIGINT)").alias("metric_ppm"),
        F.col("threshold_ppm").cast("bigint").alias("threshold_ppm"),
        F.expr("(1000000 * hits) DIV n >= threshold_ppm").alias("pass"),
    )


@q(
    "dedup_cluster_stats",
    """WITH groups AS (
         SELECT md5(lower(trim(substr(text, 1, 80)))) AS h,
                CAST(COUNT(*) AS BIGINT) AS sz
         FROM documents GROUP BY h),
       hist AS (
         SELECT sz, CAST(COUNT(*) AS BIGINT) AS n_clusters,
                CAST(sz * COUNT(*) AS BIGINT) AS n_docs
         FROM groups GROUP BY sz),
       tot AS (SELECT CAST(SUM(n_docs) AS BIGINT) AS total FROM hist)
       SELECT sz AS cluster_size, n_clusters, n_docs,
              CAST((1000000 * n_docs) // total AS BIGINT) AS doc_share_ppm,
              CAST(CASE WHEN sz > 1 THEN (sz - 1) * n_clusters ELSE 0 END
                   AS BIGINT) AS removable_docs
       FROM hist CROSS JOIN tot""",
)
def dedup_cluster_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K1+ duplicate-cluster size distribution — the shape a curation
    owner inspects before turning dedup on: how many 80-char-prefix-fingerprint
    clusters (the cheap near-dup signal: shared openings catch template
    pages and syndicated copies whole-text hashing misses) exist at
    each size, the document mass per size, and how
    many docs dedup would remove (size−1 per cluster). A corpus whose
    mass sits in a few huge clusters needs boilerplate treatment, not
    just keep-first; a long tail of size-2 clusters is ordinary crawl
    duplication — the histogram tells them apart. One prefix-fingerprint agg,
    one ≤max-size histogram agg, one 1-row total broadcast
    (whitelisted)."""
    d = read_table(spark, sf_dir, "documents")
    groups = d.groupBy(
        F.md5(F.lower(F.trim(F.substring(F.col("text"), 1, 80)))).alias("h")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("sz"))
    hist = groups.groupBy("sz").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_clusters"),
        (F.col("sz") * F.count(F.lit(1))).cast("bigint").alias("n_docs"),
    )
    tot = hist.agg(F.sum("n_docs").cast("bigint").alias("total"))
    return hist.crossJoin(F.broadcast(tot)).select(
        F.col("sz").alias("cluster_size"), "n_clusters", "n_docs",
        F.expr("CAST((1000000 * n_docs) DIV total AS BIGINT)").alias("doc_share_ppm"),
        F.expr(
            "CAST(CASE WHEN sz > 1 THEN (sz - 1) * n_clusters ELSE 0 END AS BIGINT)"
        ).alias("removable_docs"),
    )


@q(
    "dedup_incremental",
    """WITH tagged AS (
         SELECT doc_id, text, doc_id >= 400 AS is_delta,
                md5(lower(trim(text))) AS h
         FROM documents),
       base AS (SELECT * FROM tagged WHERE NOT is_delta),
       delta0 AS (
         SELECT doc_id, text, h,
                ROW_NUMBER() OVER (PARTITION BY h ORDER BY doc_id) AS rn
         FROM tagged WHERE is_delta),
       exact AS (
         SELECT d.doc_id, d.text, d.h,
                d.rn > 1 OR b.h IS NOT NULL AS exact_dup
         FROM delta0 d LEFT JOIN (SELECT DISTINCT h FROM base) b USING (h)),
       words AS (
         SELECT doc_id, string_split(text, ' ') AS w, is_delta FROM tagged),
       sh AS (
         SELECT doc_id, is_delta,
                unnest(list_transform(range(1, greatest(len(w) - 1, 1)),
                       i -> w[i] || ' ' || w[i + 1] || ' ' || w[i + 2])) AS shingle
         FROM words),
       sigs AS (
         SELECT doc_id, is_delta,
                MIN(md5('0|' || shingle)) AS sig_0, MIN(md5('1|' || shingle)) AS sig_1,
                MIN(md5('2|' || shingle)) AS sig_2, MIN(md5('3|' || shingle)) AS sig_3,
                MIN(md5('4|' || shingle)) AS sig_4, MIN(md5('5|' || shingle)) AS sig_5,
                MIN(md5('6|' || shingle)) AS sig_6, MIN(md5('7|' || shingle)) AS sig_7
         FROM sh GROUP BY doc_id, is_delta),
       banded AS (
         SELECT doc_id, is_delta, band FROM (
           SELECT doc_id, is_delta,
                  ['0|' || sig_0 || '|' || sig_1, '1|' || sig_2 || '|' || sig_3,
                   '2|' || sig_4 || '|' || sig_5, '3|' || sig_6 || '|' || sig_7] AS bands
           FROM sigs), UNNEST(bands) AS u(band)),
       near AS (
         SELECT d.doc_id, MIN(b.doc_id) AS near_base_id
         FROM banded d JOIN banded b
           ON d.band = b.band AND d.is_delta AND NOT b.is_delta
         GROUP BY d.doc_id)
       SELECT e.doc_id,
              CASE WHEN e.exact_dup THEN 'exact_dup'
                   WHEN n.near_base_id IS NOT NULL THEN 'near_dup'
                   ELSE 'kept' END AS status,
              n.near_base_id
       FROM exact e LEFT JOIN near n ON n.doc_id = e.doc_id""",
)
def dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K1+K2 INCREMENTAL dedup — the production shape: a new delta batch
    (doc_id ≥ 400) dedupes against the EXISTING corpus without
    reclustering it. Exact: delta-internal keep-first + content-hash
    anti-probe into the base hash set. Near: the delta's MinHash band
    keys join the base's stored band INDEX (band equality, delta→base
    only — never base×base, which is the whole point: work is
    O(delta · bands), independent of corpus size). Each delta doc gets
    a verdict: kept / exact_dup / near_dup (+ the smallest matching
    base id as evidence). At 100 TB this is how daily crawl batches
    land: the base band index persists in the warehouse and only the
    delta is fingerprinted."""
    from varda_spark.operators.dedup import minhash_signatures

    d = read_table(spark, sf_dir, "documents")
    tagged = d.select(
        "doc_id", "text", (F.col("doc_id") >= 400).alias("is_delta"),
        F.md5(F.lower(F.trim(F.col("text")))).alias("h"),
    )
    base_h = tagged.filter(~F.col("is_delta")).select("h").distinct()
    w_h = Window.partitionBy("h").orderBy("doc_id")
    delta0 = tagged.filter(F.col("is_delta")).withColumn("rn", F.row_number().over(w_h))
    exact = delta0.join(
        base_h.withColumn("in_base", F.lit(True)), "h", "left"
    ).select(
        "doc_id",
        ((F.col("rn") > 1) | F.col("in_base").isNotNull()).alias("exact_dup"),
    )
    sigs = minhash_signatures(tagged.select("doc_id", "text"), num_hashes=8, shingle_n=3)
    band_cols = [
        F.concat_ws("|", F.lit(str(b)), F.col(f"sig_{b * 2}"), F.col(f"sig_{b * 2 + 1}")).alias(
            f"band_{b}"
        )
        for b in range(4)
    ]
    banded = (
        sigs.select("doc_id", *band_cols)
        .select(
            "doc_id",
            F.explode(F.array(*[F.col(f"band_{b}") for b in range(4)])).alias("band"),
        )
        .join(tagged.select("doc_id", "is_delta"), "doc_id")
    )
    db = banded.filter(F.col("is_delta")).select("doc_id", "band")
    bb = banded.filter(~F.col("is_delta")).select(
        F.col("doc_id").alias("base_id"), F.col("band").alias("band_b")
    )
    near = (
        db.join(bb, F.col("band") == F.col("band_b"))
        .groupBy("doc_id")
        .agg(F.min("base_id").alias("near_base_id"))
    )
    return exact.join(near, "doc_id", "left").select(
        "doc_id",
        F.when(F.col("exact_dup"), "exact_dup")
        .when(F.col("near_base_id").isNotNull(), "near_dup")
        .otherwise("kept")
        .alias("status"),
        "near_base_id",
    )


@q(
    "agg_geo_rollup",
    """WITH pts AS (
         SELECT CAST(user_id % 360 AS BIGINT) - 180 AS x,
                CAST((event_id * 7) % 180 AS BIGINT) - 90 AS y
         FROM events),
       cells AS (
         SELECT ((x + 180) // 30) * 1000 + (y + 90) // 30 AS c1,
                ((x + 180) // 10) * 1000 + (y + 90) // 10 AS c2,
                (x + 180) * 1000 + (y + 90) AS c3
         FROM pts)
       SELECT CAST(GROUPING(c1) + GROUPING(c2) + GROUPING(c3) AS BIGINT)
                AS coarse_levels,
              c1, c2, c3, CAST(COUNT(*) AS BIGINT) AS n
       FROM cells
       GROUP BY GROUPING SETS ((c1), (c1, c2), (c1, c2, c3))""",
)
def agg_geo_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D6+ multi-resolution spatial rollup (the H3/geohash aggregation
    pattern): synthetic lon/lat points land in integer grid cells at
    three nested resolutions (30° / 10° / 1°), aggregated in ONE pass
    via GROUPING SETS — the tile-pyramid a map dashboard reads at every
    zoom level without re-scanning. Cell ids are integers (x·1000+y),
    so grouping keys stay fixed-width; partial aggregation collapses
    map-side at the finest level and the coarser levels reduce from it.
    The spatial analog of agg_rollup's calendar hierarchy."""
    ev = read_table(spark, sf_dir, "events")
    pts = ev.select(
        (F.col("user_id") % 360 - 180).cast("long").alias("x"),
        ((F.col("event_id") * 7) % 180 - 90).cast("long").alias("y"),
    )
    cells = pts.select(
        F.expr("((x + 180) DIV 30) * 1000 + (y + 90) DIV 30").alias("c1"),
        F.expr("((x + 180) DIV 10) * 1000 + (y + 90) DIV 10").alias("c2"),
        F.expr("(x + 180) * 1000 + (y + 90)").alias("c3"),
    )
    cells.createOrReplaceTempView("_geo_cells")
    return spark.sql(
        """SELECT CAST(GROUPING(c1) + GROUPING(c2) + GROUPING(c3) AS BIGINT)
                    AS coarse_levels,
                  c1, c2, c3, CAST(COUNT(*) AS BIGINT) AS n
           FROM _geo_cells
           GROUP BY GROUPING SETS ((c1), (c1, c2), (c1, c2, c3))"""
    )


@q(
    "text_tokenizer_fertility",
    """WITH t AS (
         SELECT lang, source,
                CAST(len(regexp_extract_all(lower(text), '[a-z0-9]+|[^a-z0-9\\s]'))
                     AS BIGINT) AS bpe,
                CAST(len(string_split(trim(text), ' ')) AS BIGINT) AS words
         FROM documents)
       SELECT lang, source,
              CAST(COUNT(*) AS BIGINT) AS n_docs,
              CAST(SUM(bpe) AS BIGINT) AS bpe_tokens,
              CAST(SUM(words) AS BIGINT) AS words,
              CAST((1000000 * SUM(bpe)) // SUM(words) AS BIGINT) AS fertility_ppm
       FROM t GROUP BY lang, source""",
)
def text_tokenizer_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K4+ tokenizer FERTILITY per (language, source): BPE-ish tokens per
    whitespace word, in exact ppm — the number that decides how much of
    a token budget each corpus slice really consumes (a language whose
    tokenizer fragments words 2× eats 2× the budget per word; mixture
    weights set on document or word counts silently misallocate). Pooled
    ratio, not mean-of-ratios — long docs weigh in proportionally. One
    map-side codegen scan + a (lang, source) agg."""
    from varda_spark.operators.text import bpe_ish_tokens

    d = read_table(spark, sf_dir, "documents")
    t = d.select(
        "lang", "source",
        F.size(bpe_ish_tokens("text")).cast("bigint").alias("bpe"),
        F.size(F.split(F.trim(F.col("text")), " ")).cast("bigint").alias("words"),
    )
    return t.groupBy("lang", "source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("bpe").cast("bigint").alias("bpe_tokens"),
        F.sum("words").cast("bigint").alias("words"),
        F.expr("CAST((1000000 * SUM(bpe)) DIV SUM(words) AS BIGINT)").alias("fertility_ppm"),
    )


@q(
    "agg_backlog_aging",
    """WITH anchor AS (
         SELECT MAX(CAST(o_orderdate AS DATE)) AS a FROM orders),
       open_o AS (
         SELECT o_orderkey, o_orderpriority,
                CAST(FLOOR(o_totalprice) AS BIGINT) AS val,
                date_diff('day', CAST(o_orderdate AS DATE), an.a) AS age_days
         FROM orders CROSS JOIN anchor an
         WHERE o_orderstatus = 'O')
       SELECT o_orderpriority,
              CASE WHEN age_days <= 30 THEN '0-30'
                   WHEN age_days <= 90 THEN '31-90'
                   WHEN age_days <= 365 THEN '91-365' ELSE '365+' END AS bucket,
              CAST(COUNT(*) AS BIGINT) AS n_orders,
              CAST(SUM(val) AS BIGINT) AS value
       FROM open_o GROUP BY 1, 2""",
)
def agg_backlog_aging(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D+ backlog aging report: open orders bucketed by how long they
    have been open (0-30/31-90/91-365/365+ days) per priority, with
    order counts and value — the receivables/ops-queue view every
    fulfillment dashboard leads with. The aging anchor is DATA-DERIVED
    (max order date, one 1-row broadcast — the qa_freshness discipline)
    so the report is reproducible: wall-clock anchors would break both
    the oracle and any backfill. One filtered scan + a tiny grouped
    agg."""
    o = read_table(spark, sf_dir, "orders")
    anchor = o.agg(F.max(F.col("o_orderdate").cast("date")).alias("a"))
    open_o = (
        o.filter(F.col("o_orderstatus") == "O")
        .crossJoin(F.broadcast(anchor))
        .select(
            "o_orderpriority",
            F.expr("CAST(FLOOR(o_totalprice) AS BIGINT)").alias("val"),
            F.expr("datediff(a, CAST(o_orderdate AS DATE))").alias("age_days"),
        )
    )
    bucket = (
        F.when(F.col("age_days") <= 30, "0-30")
        .when(F.col("age_days") <= 90, "31-90")
        .when(F.col("age_days") <= 365, "91-365")
        .otherwise("365+")
    )
    return open_o.groupBy("o_orderpriority", bucket.alias("bucket")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_orders"),
        F.sum("val").cast("bigint").alias("value"),
    )


@q(
    "agg_bucketed_noshuffle",
    """SELECT o_custkey,
              CAST(COUNT(*) AS BIGINT) AS n_orders,
              CAST(SUM(CAST(FLOOR(o_totalprice) AS BIGINT)) AS BIGINT) AS tot
       FROM orders
       GROUP BY o_custkey
       HAVING COUNT(*) >= 8""",
)
def agg_bucketed_noshuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5+ ZERO-SHUFFLE aggregation on a bucketed table — the third leg
    of physical layout design (join_bucketed: co-located joins;
    scan_partition_pruned: scan elimination; this: exchange-free
    aggregation): orders land bucketBy(16) on o_custkey, and a GROUP BY
    on the bucket key needs NO Exchange — Catalyst sees the hash
    distribution already satisfied, so at 100 TB the aggregate runs as
    a local sort/hash per bucket file instead of an all-network
    shuffle of the fact table. The write cost amortizes over every
    subsequent key-grained aggregate and join. Scratch table is
    session-scoped (applicationId suffix) like join_bucketed's; the
    oracle is the same aggregate unbucketed — bucketing is physical,
    not semantic."""
    from varda_spark.sources.sinks import write_bucketed

    o = read_table(spark, sf_dir, "orders").select(
        "o_custkey", F.expr("CAST(FLOOR(o_totalprice) AS BIGINT)").alias("tp")
    )
    tag = "".join(ch if ch.isalnum() else "_" for ch in spark.sparkContext.applicationId)
    t_o = f"bktagg_orders_{tag}"
    _sweep_stale_scratch()
    write_bucketed(o, t_o, "o_custkey", n_buckets=16, path=f"/root/repo/spark-warehouse/{t_o}")
    return (
        spark.table(t_o)
        .groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_orders"),
            F.sum("tp").cast("bigint").alias("tot"),
        )
        .filter(F.col("n_orders") >= 8)
    )


@q(
    "sim_ivf_scaled",
    """WITH q AS (
         SELECT vec_id, list_transform(embedding,
                    x -> CAST(floor(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS e
         FROM embeddings),
       cents AS (
         SELECT vec_id AS cell_id, e AS ec FROM q ORDER BY vec_id
         LIMIT (SELECT GREATEST(8, CAST(FLOOR(sqrt(COUNT(*))) AS BIGINT)) FROM q)),
       scored AS (
         SELECT q.vec_id, cents.cell_id,
                (SELECT SUM(q.e[i.range] * cents.ec[i.range]) FROM range(1, 65) i) AS cd
         FROM q CROSS JOIN cents),
       assigned AS (
         SELECT vec_id, cell_id FROM (
           SELECT vec_id, cell_id,
                  ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY cd DESC, cell_id) AS arn
           FROM scored) WHERE arn = 1),
       pairs AS (
         SELECT a.vec_id AS query_id, a.cell_id, b.vec_id AS neighbor_id,
                (SELECT SUM(qa.e[i.range] * qb.e[i.range]) FROM range(1, 65) i) AS dot_q
         FROM assigned a JOIN assigned b ON a.cell_id = b.cell_id AND a.vec_id <> b.vec_id
              JOIN q qa ON qa.vec_id = a.vec_id
              JOIN q qb ON qb.vec_id = b.vec_id)
       SELECT query_id, CAST(cell_id AS BIGINT) AS cell_id, neighbor_id,
              CAST(dot_q AS BIGINT) AS dot_q, rank
       FROM (
         SELECT query_id, cell_id, neighbor_id, dot_q,
                CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                     ORDER BY dot_q DESC, neighbor_id) AS BIGINT) AS rank
         FROM pairs) WHERE rank <= 3""",
)
def sim_ivf_scaled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K3+ IVF with nlist GROWING as √n — the standard index sizing rule
    (nlist ≈ √n keeps both the quantizer pass, n·nlist, and the
    within-cell exact pass, n·(n/nlist), at n^1.5 TOTAL instead of the
    fixed-k variant's n²/k): this is the configuration a 100 TB
    deployment actually runs, and the answer to sim_ivf's measured
    quadratic drift on densifying data (BASELINE.md round-5 sf5 row —
    sim_ivf 4.1× normalized vs this key's near-linear growth). The cell
    count is DATA-DERIVED identically in both engines (floor(√count),
    floored-correctly-rounded sqrt is exact cross-engine; DuckDB's
    LIMIT takes the subquery directly, Spark computes the same count
    driver-side as index configuration — the documented bounded-collect
    class). Same plan family as sim_ivf: broadcast quantizer, map-side
    assignment, cell-keyed exact top-3."""
    import math

    from varda_spark.operators.similarity import ivf_topk

    e = read_table(spark, sf_dir, "embeddings")
    n = e.count()
    nlist = max(8, math.isqrt(n))
    return ivf_topk(e, n_centroids=nlist, k=3)



# =====================================================================
# Round 6 additions: PQ compression/search, polygenic scores, sample
# sex QC, k-anonymity audit, small-file compaction planning.
# =====================================================================

_PQ_CB = """WITH q AS (
         SELECT vec_id, list_transform(embedding,
                    x -> CAST(floor(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS e
         FROM embeddings),
       cb AS (
         SELECT ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS code_id, e AS ce
         FROM q ORDER BY vec_id LIMIT 8),
       scored AS (
         SELECT q.vec_id, cb.code_id,
           list_sum(list_transform(range(1, 17),
               i -> (q.e[i] - cb.ce[i]) * (q.e[i] - cb.ce[i]))) AS d0,
           list_sum(list_transform(range(17, 33),
               i -> (q.e[i] - cb.ce[i]) * (q.e[i] - cb.ce[i]))) AS d1,
           list_sum(list_transform(range(33, 49),
               i -> (q.e[i] - cb.ce[i]) * (q.e[i] - cb.ce[i]))) AS d2,
           list_sum(list_transform(range(49, 65),
               i -> (q.e[i] - cb.ce[i]) * (q.e[i] - cb.ce[i]))) AS d3
         FROM q CROSS JOIN cb),
       pick AS (
         SELECT vec_id, code_id, d0, d1, d2, d3,
           ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d0, code_id) AS r0,
           ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d1, code_id) AS r1,
           ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2, code_id) AS r2,
           ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d3, code_id) AS r3
         FROM scored),
       codes AS (
         SELECT c0.vec_id,
                CAST(c0.code_id AS BIGINT) AS code_0,
                CAST(c1.code_id AS BIGINT) AS code_1,
                CAST(c2.code_id AS BIGINT) AS code_2,
                CAST(c3.code_id AS BIGINT) AS code_3,
                CAST(c0.d0 + c1.d1 + c2.d2 + c3.d3 AS BIGINT) AS qerr
         FROM (SELECT vec_id, code_id, d0 FROM pick WHERE r0 = 1) c0
         JOIN (SELECT vec_id, code_id, d1 FROM pick WHERE r1 = 1) c1 USING (vec_id)
         JOIN (SELECT vec_id, code_id, d2 FROM pick WHERE r2 = 1) c2 USING (vec_id)
         JOIN (SELECT vec_id, code_id, d3 FROM pick WHERE r3 = 1) c3 USING (vec_id))"""


@q(
    "sim_pq_codes",
    _PQ_CB + """
       SELECT vec_id, code_0, code_1, code_2, code_3, qerr FROM codes""",
)
def sim_pq_codes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K3+ product quantization encode (Jegou et al. 2011): each 64-dim
    embedding compresses to m=4 codebook ids (one per 16-dim subspace,
    k=8 codewords, argmin integer L2, ties -> lowest code id) plus the
    total squared quantization error. THE memory-bound ANN lever at
    100 TB: codes are m bytes per vector in a packed layout vs 256 for
    the floats, and the ADC search key below never touches raw vectors.
    Codebooks are the k lowest-id vectors' subvectors (the sim_ivf
    deterministic-init discipline; production would Lloyd-refine each
    subspace with kmeans_fit). Plan: one TakeOrdered(8) for the
    codebooks + ONE mapInPandas pass, codebooks closure-shipped -- no
    join, no shuffle on the corpus side. Exactness: all-integer
    distances; oracle replays the same argmin via per-subspace
    (distance, code_id) rank windows."""
    from varda_spark.operators.similarity import pq_codes

    e = read_table(spark, sf_dir, "embeddings")
    return pq_codes(e, m=4, k=8)


@q(
    "sim_pq_adc_topk",
    _PQ_CB + """,
       queries AS (
         SELECT vec_id AS query_id, e AS qe FROM q ORDER BY vec_id LIMIT 5),
       lut AS (
         SELECT query_id, code_id,
           list_sum(list_transform(range(1, 17),
               i -> (qe[i] - ce[i]) * (qe[i] - ce[i]))) AS l0,
           list_sum(list_transform(range(17, 33),
               i -> (qe[i] - ce[i]) * (qe[i] - ce[i]))) AS l1,
           list_sum(list_transform(range(33, 49),
               i -> (qe[i] - ce[i]) * (qe[i] - ce[i]))) AS l2,
           list_sum(list_transform(range(49, 65),
               i -> (qe[i] - ce[i]) * (qe[i] - ce[i]))) AS l3
         FROM queries CROSS JOIN cb),
       adc AS (
         SELECT l0.query_id, c.vec_id, l0.l0 + l1.l1 + l2.l2 + l3.l3 AS adc
         FROM codes c
         JOIN lut l0 ON l0.code_id = c.code_0
         JOIN lut l1 ON l1.query_id = l0.query_id AND l1.code_id = c.code_1
         JOIN lut l2 ON l2.query_id = l0.query_id AND l2.code_id = c.code_2
         JOIN lut l3 ON l3.query_id = l0.query_id AND l3.code_id = c.code_3),
       ranked AS (
         SELECT query_id, vec_id, adc,
                ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY adc, vec_id) AS rank
         FROM adc)
       SELECT query_id, CAST(rank AS BIGINT) AS rank, vec_id,
              CAST(adc AS BIGINT) AS adc
       FROM ranked WHERE rank <= 3""",
)
def sim_pq_adc_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K3+ asymmetric-distance (ADC) top-k over PQ codes: 5 probe
    vectors search the encoded corpus; distance = sum of per-subspace
    LOOKUPS into a q x m x k table built once per query batch -- the
    corpus-side scan reads codes only and does NO vector math per pair.
    This is the production IVF-PQ inner loop (IVF prunes which rows,
    PQ/ADC prunes bytes-per-row); at 100 TB the scan streams m-byte
    codes with table lookups, ~64x less IO than raw floats. Two-phase
    exact top-k: each Arrow batch emits only its local top-3 per query
    under the total (adc, vec_id) order (np.lexsort), the final window
    ranks batches*q*3 survivors -- never n*q rows. All-integer; ties ->
    lowest vec_id."""
    from varda_spark.operators.similarity import pq_adc_topk

    e = read_table(spark, sf_dir, "embeddings")
    out = pq_adc_topk(e, n_queries=5, topk=3, m=4, k=8)
    return out.select(
        "query_id", F.col("rank").cast("bigint").alias("rank"), "vec_id", "adc"
    )


_GT_CTE = """gt AS (
         SELECT l_partkey AS site_id, l_suppkey % 10 AS sample_id,
                MIN(CASE WHEN l_orderkey % 3 = 0 THEN 2
                         WHEN l_orderkey % 3 = 1 THEN 1 ELSE 0 END) AS g
         FROM lineitem GROUP BY 1, 2)"""


@q(
    "freq_pgs_score",
    "WITH " + _GT_CTE + """,
       w AS (
         SELECT site_id,
                CAST(CAST('0x' || substr(md5(CAST(site_id AS VARCHAR)), 1, 15)
                     AS BIGINT) % 101 - 50 AS BIGINT) AS wt
         FROM (SELECT DISTINCT site_id FROM gt))
       SELECT CAST(sample_id AS BIGINT) AS sample_id,
              CAST(COUNT(*) AS BIGINT) AS n_sites,
              CAST(SUM(CASE WHEN g > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_effect,
              CAST(SUM(wt * g) AS BIGINT) AS pgs,
              CAST((1000000 * SUM(wt * g)) // COUNT(*) AS BIGINT) AS pgs_per_site_ppm
       FROM gt JOIN w USING (site_id)
       GROUP BY sample_id""",
)
def freq_pgs_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Varda-core polygenic score (plink --score): per sample, the
    weighted dosage sum over all sites -- the portability layer between
    GWAS summary statistics and individual risk. Weights are the
    repo's standard md5 60-bit coin mapped to [-50, 50] (deterministic
    per site in both engines; a real scoring file would join on
    (chrom, pos, allele)). Genotypes collapse to one call per
    (site, sample) first (freq_kinship matrix discipline); the weight
    join shuffles on site_id -- the score agg is then one keyed sum, no
    windows, map-side partials all the way. Signed integer ppm uses
    DIV/// which BOTH engines truncate toward zero on BIGINT."""
    li = read_table(spark, sf_dir, "lineitem")
    gt = li.groupBy(
        F.col("l_partkey").alias("site_id"),
        (F.col("l_suppkey") % 10).alias("sample_id"),
    ).agg(
        F.min(
            F.expr(
                "CASE WHEN l_orderkey % 3 = 0 THEN 2"
                " WHEN l_orderkey % 3 = 1 THEN 1 ELSE 0 END"
            )
        ).alias("g")
    )
    w = gt.select("site_id").distinct().select(
        "site_id",
        (
            F.conv(F.substring(F.md5(F.col("site_id").cast("string").cast("binary")), 1, 15), 16, 10)
            .cast("bigint") % 101 - 50
        ).cast("bigint").alias("wt"),
    )
    return (
        gt.join(w, "site_id")
        .groupBy(F.col("sample_id").cast("bigint").alias("sample_id"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_sites"),
            F.sum(F.when(F.col("g") > 0, 1).otherwise(0)).cast("bigint").alias("n_effect"),
            F.sum(F.col("wt") * F.col("g")).cast("bigint").alias("pgs"),
            F.expr(
                "CAST((1000000 * SUM(wt * g)) DIV COUNT(*) AS BIGINT)"
            ).alias("pgs_per_site_ppm"),
        )
    )


@q(
    "freq_sex_check",
    "WITH " + _GT_CTE + """,
       x AS (SELECT sample_id, g FROM gt WHERE site_id % 5 = 0)
       SELECT CAST(sample_id AS BIGINT) AS sample_id,
              CAST(COUNT(*) AS BIGINT) AS n_x_sites,
              CAST(SUM(CASE WHEN g = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_het,
              CAST((1000000 * SUM(CASE WHEN g = 1 THEN 1 ELSE 0 END))
                   // COUNT(*) AS BIGINT) AS het_ppm,
              (1000000 * SUM(CASE WHEN g = 1 THEN 1 ELSE 0 END))
                   // COUNT(*) >= 250000 AS is_xx
       FROM x GROUP BY sample_id""",
)
def freq_sex_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Varda-core sample sex QC (plink --check-sex): X-chromosome
    heterozygosity per sample -- XY samples are hemizygous on X, so
    true het calls there are genotyping artifacts and a high X het
    rate on a male-labelled sample flags a swap or contamination.
    Chromosome 0 of the synthetic 5-chromosome genome stands in for X;
    the call is het_ppm >= 250000 (plink's 0.25 F-stat boundary
    restated on the het rate). One chromosome filter (pushed to the
    scan) + one keyed agg; boolean + ppm outputs, all integer."""
    li = read_table(spark, sf_dir, "lineitem")
    gt = li.groupBy(
        F.col("l_partkey").alias("site_id"),
        (F.col("l_suppkey") % 10).alias("sample_id"),
    ).agg(
        F.min(
            F.expr(
                "CASE WHEN l_orderkey % 3 = 0 THEN 2"
                " WHEN l_orderkey % 3 = 1 THEN 1 ELSE 0 END"
            )
        ).alias("g")
    )
    x = gt.filter(F.col("site_id") % 5 == 0)
    het = F.sum(F.when(F.col("g") == 1, 1).otherwise(0))
    return x.groupBy(F.col("sample_id").cast("bigint").alias("sample_id")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_x_sites"),
        het.cast("bigint").alias("n_het"),
        F.expr(
            "CAST((1000000 * SUM(CASE WHEN g = 1 THEN 1 ELSE 0 END))"
            " DIV COUNT(*) AS BIGINT)"
        ).alias("het_ppm"),
        F.expr(
            "(1000000 * SUM(CASE WHEN g = 1 THEN 1 ELSE 0 END))"
            " DIV COUNT(*) >= 250000"
        ).alias("is_xx"),
    )


@q(
    "agg_k_anonymity",
    """WITH b AS (
         SELECT c_mktsegment AS segment, c_nationkey,
                CAST(FLOOR(CAST(c_acctbal AS DECIMAL(18,4))) AS BIGINT) // 1000
                  AS bal_bucket
         FROM customer),
       g AS (
         SELECT segment, c_nationkey, bal_bucket,
                CAST(COUNT(*) AS BIGINT) AS sz
         FROM b GROUP BY 1, 2, 3)
       SELECT segment,
              CAST(COUNT(*) AS BIGINT) AS n_groups,
              CAST(MIN(sz) AS BIGINT) AS k_anonymity,
              CAST(SUM(CASE WHEN sz < 5 THEN 1 ELSE 0 END) AS BIGINT)
                AS n_small_groups,
              CAST(SUM(CASE WHEN sz < 5 THEN sz ELSE 0 END) AS BIGINT)
                AS n_suppressed,
              CAST((1000000 * SUM(CASE WHEN sz < 5 THEN sz ELSE 0 END))
                   // SUM(sz) AS BIGINT) AS suppression_ppm
       FROM g GROUP BY segment""",
)
def agg_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """QA+ k-anonymity audit (Sweeney 2002) -- the privacy gate before a
    table ships to a wider audience: group by the quasi-identifier set
    (segment, nation, $1000 balance bucket), report per segment the
    worst-case group size (k), how many groups fall below k=5, and the
    row fraction that suppression would remove. Training-data releases
    run exactly this before publishing metadata columns. Two keyed
    aggs (QI grain, then segment grain), map-side partials, no window;
    bucket edges are exact decimal floor -> bigint truncating division
    (identical signed semantics both engines)."""
    c = read_table(spark, sf_dir, "customer")
    b = c.select(
        F.col("c_mktsegment").alias("segment"),
        "c_nationkey",
        F.expr(
            "CAST(FLOOR(CAST(c_acctbal AS DECIMAL(18,4))) AS BIGINT) DIV 1000"
        ).alias("bal_bucket"),
    )
    g = b.groupBy("segment", "c_nationkey", "bal_bucket").agg(
        F.count(F.lit(1)).cast("bigint").alias("sz")
    )
    small = F.when(F.col("sz") < 5, F.col("sz")).otherwise(0)
    return g.groupBy("segment").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_groups"),
        F.min("sz").cast("bigint").alias("k_anonymity"),
        F.sum(F.when(F.col("sz") < 5, 1).otherwise(0)).cast("bigint").alias("n_small_groups"),
        F.sum(small).cast("bigint").alias("n_suppressed"),
        F.expr(
            "CAST((1000000 * SUM(CASE WHEN sz < 5 THEN sz ELSE 0 END))"
            " DIV SUM(sz) AS BIGINT)"
        ).alias("suppression_ppm"),
    )


@q(
    "store_compaction_plan",
    """WITH f AS (
         SELECT CAST(year(CAST(o_orderdate AS DATE)) * 100
                     + month(CAST(o_orderdate AS DATE)) AS BIGINT) AS ym,
                CAST(o_orderdate AS DATE) AS d,
                CAST(SUM(CAST(FLOOR(o_totalprice) AS BIGINT)) AS BIGINT) AS bytes,
                CAST(COUNT(*) AS BIGINT) AS n_rows
         FROM orders GROUP BY 1, 2),
       c AS (
         SELECT ym, d, bytes, n_rows,
                SUM(bytes) OVER (PARTITION BY ym ORDER BY d
                                 ROWS UNBOUNDED PRECEDING) AS cum
         FROM f),
       a AS (SELECT ym, (cum - bytes) // 2000000 AS bucket, bytes, n_rows FROM c)
       SELECT ym, CAST(bucket AS BIGINT) AS bucket,
              CAST(COUNT(*) AS BIGINT) AS n_files,
              CAST(SUM(bytes) AS BIGINT) AS bytes,
              CAST(SUM(n_rows) AS BIGINT) AS rows_total
       FROM a GROUP BY ym, bucket""",
)
def store_compaction_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5+ small-file compaction planner -- the maintenance half of the
    warehouse story (merge/SCD2/CDC write; THIS decides what to
    rewrite): per month-partition, day-grain "files" (size = summed
    whole-dollar order value as the byte stand-in) are packed
    date-ordered into ~2 MB compaction buckets by running-sum
    bucketing: bucket = floor(cum_before / target). The plan emits per
    (partition, bucket) the file count and total bytes -- exactly the
    manifest a compactor executes, and the policy HMS/Iceberg-style
    maintenance jobs apply (pack adjacent small files, never split
    one). One window per month partition (distributed, calendar-
    bounded) + one keyed agg. cum and bytes are non-negative so
    truncating and flooring division agree across engines."""
    o = read_table(spark, sf_dir, "orders")
    f = o.groupBy(
        (F.year("o_orderdate") * 100 + F.month("o_orderdate")).cast("bigint").alias("ym"),
        F.col("o_orderdate").cast("date").alias("d"),
    ).agg(
        F.sum(F.expr("CAST(FLOOR(o_totalprice) AS BIGINT)")).cast("bigint").alias("bytes"),
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
    )
    w = Window.partitionBy("ym").orderBy("d").rowsBetween(Window.unboundedPreceding, 0)
    c = f.withColumn("cum", F.sum("bytes").over(w))
    a = c.select(
        "ym",
        F.expr("CAST((cum - bytes) DIV 2000000 AS BIGINT)").alias("bucket"),
        "bytes",
        "n_rows",
    )
    return a.groupBy("ym", "bucket").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_files"),
        F.sum("bytes").cast("bigint").alias("bytes"),
        F.sum("n_rows").cast("bigint").alias("rows_total"),
    )


# =====================================================================
# Round 7 additions
# =====================================================================

# the IVF-PQ CTE chain (coarse cells, routing, LUTs, ADC ranking) is
# shared by sim_ivfpq and sim_recall_eval
_IVFPQ_CTES = """,
       cents AS (
         SELECT vec_id AS cell_id, e AS ce FROM q ORDER BY vec_id LIMIT 8),
       assign AS (
         SELECT q.vec_id, c.cell_id,
                list_sum(list_transform(list_zip(q.e, c.ce),
                    s -> s[1] * s[2])) AS dot
         FROM q CROSS JOIN cents c),
       cell AS (
         SELECT vec_id, cell_id FROM (
           SELECT vec_id, cell_id,
                  ROW_NUMBER() OVER (PARTITION BY vec_id
                                     ORDER BY dot DESC, cell_id) AS r
           FROM assign) WHERE r = 1),
       queries AS (
         SELECT vec_id AS query_id, e AS qe FROM q ORDER BY vec_id LIMIT 5),
       probe AS (
         SELECT query_id, cell_id FROM (
           SELECT qu.query_id, c.cell_id,
                  ROW_NUMBER() OVER (PARTITION BY qu.query_id
                      ORDER BY list_sum(list_transform(list_zip(qu.qe, c.ce),
                                   s -> s[1] * s[2])) DESC, c.cell_id) AS r
           FROM queries qu CROSS JOIN cents c) WHERE r <= 2),
       lut AS (
         SELECT query_id, code_id,
           list_sum(list_transform(range(1, 17),
               i -> (qe[i] - ce[i]) * (qe[i] - ce[i]))) AS l0,
           list_sum(list_transform(range(17, 33),
               i -> (qe[i] - ce[i]) * (qe[i] - ce[i]))) AS l1,
           list_sum(list_transform(range(33, 49),
               i -> (qe[i] - ce[i]) * (qe[i] - ce[i]))) AS l2,
           list_sum(list_transform(range(49, 65),
               i -> (qe[i] - ce[i]) * (qe[i] - ce[i]))) AS l3
         FROM queries CROSS JOIN cb),
       adc AS (
         SELECT p.query_id, c.vec_id, cl.cell_id,
                l0.l0 + l1.l1 + l2.l2 + l3.l3 AS adc
         FROM codes c
         JOIN cell cl USING (vec_id)
         JOIN probe p ON p.cell_id = cl.cell_id
         JOIN lut l0 ON l0.query_id = p.query_id AND l0.code_id = c.code_0
         JOIN lut l1 ON l1.query_id = p.query_id AND l1.code_id = c.code_1
         JOIN lut l2 ON l2.query_id = p.query_id AND l2.code_id = c.code_2
         JOIN lut l3 ON l3.query_id = p.query_id AND l3.code_id = c.code_3),
       ranked AS (
         SELECT query_id, vec_id, cell_id, adc,
                ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY adc, vec_id) AS rank
         FROM adc)"""


@q(
    "sim_ivfpq",
    _PQ_CB + _IVFPQ_CTES + """
       SELECT query_id, CAST(rank AS BIGINT) AS rank, vec_id, cell_id,
              CAST(adc AS BIGINT) AS adc
       FROM ranked WHERE rank <= 3""",
)
def sim_ivfpq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K3+ IVF-PQ: the composed production ANN query (VERDICT r6 item
    5) — IVF routing bounds WHICH rows each query scans (nprobe=2 of 8
    coarse cells by argmax integer dot, ties -> lowest cell), PQ/ADC
    bounds the BYTES per scanned row (m=4 codes, per-query lookup
    tables). At 100 TB: one encode pass materializes (cell_id, codes)
    — m bytes + a partition key per vector; each query then touches
    only its probed cells' code stripes via a broadcast equi-join on
    cell_id, distances by whole-stage-codegen element_at lookups — no
    python, no vector math, no n·q blowup on the corpus side. Both
    halves were driver-certified separately (sim_ivf_scaled r6,
    sim_pq_adc_topk local-EXACT); this key certifies the composition.
    All-integer; ties -> lowest vec_id."""
    from varda_spark.operators.similarity import ivf_pq_topk

    e = read_table(spark, sf_dir, "embeddings")
    return ivf_pq_topk(e, ncells=8, nprobe=2, n_queries=5, topk=3, m=4, k=8)


@q(
    "sim_recall_eval",
    _PQ_CB + _IVFPQ_CTES + """,
       approx AS (SELECT query_id, vec_id FROM ranked WHERE rank <= 3),
       exd AS (
         SELECT queries.query_id, q.vec_id,
                list_sum(list_transform(list_zip(q.e, queries.qe),
                    s -> (s[1] - s[2]) * (s[1] - s[2]))) AS d2
         FROM q CROSS JOIN queries),
       exr AS (
         SELECT query_id, vec_id,
                ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY d2, vec_id) AS r
         FROM exd),
       ex AS (SELECT query_id, vec_id FROM exr WHERE r <= 3)
       SELECT ex.query_id,
              CAST(COUNT(*) AS BIGINT) AS n_exact,
              CAST(SUM(CASE WHEN a.vec_id IS NOT NULL THEN 1 ELSE 0 END)
                   AS BIGINT) AS n_hits,
              CAST((1000000 * SUM(CASE WHEN a.vec_id IS NOT NULL
                                       THEN 1 ELSE 0 END))
                   // COUNT(*) AS BIGINT) AS recall_ppm
       FROM ex LEFT JOIN approx a USING (query_id, vec_id)
       GROUP BY ex.query_id""",
)
def sim_recall_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K3+ ANN index QUALITY evaluation — recall@3 of the IVF-PQ index
    against the exact integer-L2 ground truth for the same probe set:
    the number a production ANN deployment watches when tuning nprobe /
    m / k (speed is meaningless without it). Exact side is linear in n
    for the fixed probe set (closure-shipped queries, per-batch local
    top-k, bounded final window — exact_l2_topk); approx side is the
    certified sim_ivfpq; the comparison is a 15-row join. The engine
    evaluating its own index, end to end, bit-exactly."""
    from varda_spark.operators.similarity import exact_l2_topk, ivf_pq_topk

    e = read_table(spark, sf_dir, "embeddings")
    ex = exact_l2_topk(e, n_queries=5, topk=3).select("query_id", "vec_id")
    ap = ivf_pq_topk(e, ncells=8, nprobe=2, n_queries=5, topk=3, m=4, k=8).select(
        "query_id", F.col("vec_id").alias("a_vec")
    )
    j = ex.join(
        ap,
        (ex.query_id == ap.query_id) & (ex.vec_id == ap.a_vec),
        "left",
    ).select(ex.query_id.alias("qid"), "vec_id", "a_vec")
    return (
        j.groupBy(F.col("qid").alias("query_id"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_exact"),
            F.sum(F.when(F.col("a_vec").isNotNull(), 1).otherwise(0))
            .cast("bigint")
            .alias("n_hits"),
        )
        .withColumn(
            "recall_ppm",
            F.expr("CAST((1000000 * n_hits) DIV n_exact AS BIGINT)"),
        )
    )


@q(
    "text_bpe_pair_counts",
    """WITH words AS (
         SELECT unnest(string_split(trim(text), ' ')) AS w FROM documents),
       pairs AS (
         SELECT unnest(list_transform(range(1, greatest(len(w), 1)),
                       i -> substr(w, i, 2))) AS pair
         FROM words WHERE len(w) >= 2),
       cnt AS (
         SELECT pair, CAST(COUNT(*) AS BIGINT) AS n FROM pairs GROUP BY pair),
       rk AS (
         SELECT pair, n,
                ROW_NUMBER() OVER (ORDER BY n DESC, pair) AS rank
         FROM cnt)
       SELECT CAST(rank AS BIGINT) AS rank, pair, n
       FROM rk WHERE rank <= 50""",
)
def text_bpe_pair_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K4+ the first iteration of BPE tokenizer training: count every
    adjacent character pair inside words across the corpus and rank the
    merge candidates — at 100 TB this keyed count IS the expensive step
    of byte-pair-encoding training, and its shape (explode → hash agg →
    TakeOrdered(50)) is exactly what a distributed BPE trainer runs per
    merge round (Sennrich et al. 2016). Map-side partials collapse the
    pair space to ≤ charset² before the wire; the top-50 is a
    TakeOrdered, not a global sort. Pair extraction is 1-based
    substr(w, i, 2) — identical semantics in both engines."""
    d = read_table(spark, sf_dir, "documents")
    words = d.select(F.explode(F.split(F.trim("text"), " ")).alias("w")).filter(
        F.length("w") >= 2
    )
    pairs = words.select(
        F.explode(
            F.expr("transform(sequence(1, length(w) - 1), i -> substring(w, i, 2))")
        ).alias("pair")
    )
    cnt = pairs.groupBy("pair").agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    w = Window.orderBy(F.col("n").desc(), F.col("pair").asc())
    return (
        cnt.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= 50)
        .select("rank", "pair", "n")
    )


@q(
    "dedup_recall_eval",
    """WITH words AS (
         SELECT doc_id, string_split(text, ' ') AS w FROM documents),
       sh AS (
         SELECT doc_id,
                unnest(list_transform(range(1, greatest(len(w) - 1, 1)),
                       i -> w[i] || ' ' || w[i + 1] || ' ' || w[i + 2])) AS shingle
         FROM words),
       shd AS (SELECT DISTINCT doc_id, shingle FROM sh),
       sigs AS (
         SELECT doc_id,
                MIN(md5('0|' || shingle)) AS sig_0, MIN(md5('1|' || shingle)) AS sig_1,
                MIN(md5('2|' || shingle)) AS sig_2, MIN(md5('3|' || shingle)) AS sig_3,
                MIN(md5('4|' || shingle)) AS sig_4, MIN(md5('5|' || shingle)) AS sig_5,
                MIN(md5('6|' || shingle)) AS sig_6, MIN(md5('7|' || shingle)) AS sig_7
         FROM sh GROUP BY doc_id),
       banded AS (
         SELECT doc_id, band FROM (
           SELECT doc_id,
                  ['0|' || sig_0 || '|' || sig_1, '1|' || sig_2 || '|' || sig_3,
                   '2|' || sig_4 || '|' || sig_5, '3|' || sig_6 || '|' || sig_7] AS bands
           FROM sigs), UNNEST(bands) AS u(band)),
       cand AS (
         SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
         FROM banded a JOIN banded b ON a.band = b.band AND a.doc_id < b.doc_id),
       sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM shd GROUP BY doc_id),
       inter AS (
         SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS ni
         FROM shd a JOIN shd b
           ON a.shingle = b.shingle AND a.doc_id < b.doc_id
         GROUP BY 1, 2),
       truth AS (
         SELECT doc_a, doc_b
         FROM inter JOIN sizes sa ON sa.doc_id = doc_a
                    JOIN sizes sb ON sb.doc_id = doc_b
         WHERE 3 * ni >= sa.n_sh + sb.n_sh),
       nc AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_cand FROM cand)
       SELECT CAST(COUNT(*) AS BIGINT) AS n_truth,
              nc.n_cand,
              CAST(SUM(CASE WHEN c.doc_a IS NOT NULL THEN 1 ELSE 0 END)
                   AS BIGINT) AS n_hits,
              CAST((1000000 * SUM(CASE WHEN c.doc_a IS NOT NULL
                                       THEN 1 ELSE 0 END))
                   // GREATEST(COUNT(*), 1) AS BIGINT) AS recall_ppm,
              CAST((1000000 * SUM(CASE WHEN c.doc_a IS NOT NULL
                                       THEN 1 ELSE 0 END))
                   // GREATEST(nc.n_cand, 1) AS BIGINT) AS precision_ppm
       FROM truth t
       LEFT JOIN cand c ON c.doc_a = t.doc_a AND c.doc_b = t.doc_b
       CROSS JOIN nc
       GROUP BY nc.n_cand""",
)
def dedup_recall_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K2+ dedup index QUALITY evaluation — the LSH analog of
    sim_recall_eval: MinHash banding (8 hashes, 4 bands × 2 rows, the
    certified dedup_minhash config) scored against the exact-Jaccard
    ≥50% ground truth from the shared shingle sets. Recall here is the
    S-curve value 1−(1−s²)⁴ made measurable (≈68% at s=0.5, higher for
    closer pairs) and precision counts the band-collision false
    positives the verify stage must absorb — the two numbers that
    decide bands×rows before a 100 TB dedup run. Ground truth is
    inverted-index bounded (pairs share ≥1 shingle — never all-pairs);
    the comparison is a pair-keyed join and a 1-row rollup. Exact
    ground truth is the documented cost here (sf1→sf5 normalized 0.48,
    sub-linear, but ~2.4× the banding pass alone): at 100 TB a
    production evaluation runs this same plan over a document SAMPLE —
    the estimator is unbiased per pair — while the banding side stays
    full-corpus."""
    from varda_spark.operators.dedup import minhash_candidates, ngram_jaccard

    d = read_table(spark, sf_dir, "documents")
    truth = ngram_jaccard(d).filter(F.col("jaccard_pct") >= 50).select("doc_a", "doc_b")
    cand = minhash_candidates(d, num_hashes=8, bands=4, shingle_n=3).select(
        F.col("doc_a").alias("c_a"), F.col("doc_b").alias("c_b")
    )
    nc = cand.agg(F.count(F.lit(1)).cast("bigint").alias("n_cand"))
    j = truth.join(
        cand, (truth.doc_a == cand.c_a) & (truth.doc_b == cand.c_b), "left"
    )
    return (
        j.agg(
            F.count(F.lit(1)).cast("bigint").alias("n_truth"),
            F.sum(F.when(F.col("c_a").isNotNull(), 1).otherwise(0))
            .cast("bigint")
            .alias("n_hits"),
        )
        .crossJoin(F.broadcast(nc))
        .select(
            "n_truth",
            "n_cand",
            "n_hits",
            F.expr(
                "CAST((1000000 * n_hits) DIV GREATEST(n_truth, 1) AS BIGINT)"
            ).alias("recall_ppm"),
            F.expr(
                "CAST((1000000 * n_hits) DIV GREATEST(n_cand, 1) AS BIGINT)"
            ).alias("precision_ppm"),
        )
    )


@q(
    "emb_semantic_dedup",
    """WITH q AS (
         SELECT vec_id, list_transform(embedding,
                    x -> CAST(floor(CAST(x AS DOUBLE) * 100) AS BIGINT)) AS e
         FROM embeddings),
       cents AS (
         SELECT vec_id AS cell_id, e AS ce FROM q ORDER BY vec_id
         LIMIT (SELECT GREATEST(8, CAST(FLOOR(sqrt(COUNT(*))) AS BIGINT)) FROM q)),
       scored AS (
         SELECT q.vec_id, cents.cell_id,
                list_sum(list_transform(list_zip(q.e, cents.ce),
                    s -> s[1] * s[2])) AS cd
         FROM q CROSS JOIN cents),
       assigned AS (
         SELECT vec_id, cell_id FROM (
           SELECT vec_id, cell_id,
                  ROW_NUMBER() OVER (PARTITION BY vec_id
                                     ORDER BY cd DESC, cell_id) AS r
           FROM scored) WHERE r = 1),
       v AS (
         SELECT vec_id, cell_id, e,
                list_sum(list_transform(e, x -> x * x)) AS n2
         FROM assigned JOIN q USING (vec_id)),
       flag AS (
         SELECT a.cell_id, b.vec_id AS b_id,
                CASE WHEN list_sum(list_transform(list_zip(a.e, b.e),
                              s -> s[1] * s[2])) > 0
                      AND list_sum(list_transform(list_zip(a.e, b.e),
                              s -> s[1] * s[2]))
                          * list_sum(list_transform(list_zip(a.e, b.e),
                              s -> s[1] * s[2])) * 10000
                          >= 9025 * a.n2 * b.n2
                     THEN 1 ELSE 0 END AS dup
         FROM v a JOIN v b ON a.cell_id = b.cell_id AND a.vec_id < b.vec_id),
       ps AS (
         SELECT cell_id, CAST(COUNT(*) AS BIGINT) AS n_pairs,
                CAST(SUM(dup) AS BIGINT) AS n_dup_pairs,
                CAST(COUNT(DISTINCT CASE WHEN dup = 1 THEN b_id END) AS BIGINT)
                    AS n_removed
         FROM flag GROUP BY cell_id),
       cv AS (SELECT cell_id, CAST(COUNT(*) AS BIGINT) AS n_vecs
              FROM assigned GROUP BY cell_id)
       SELECT cv.cell_id, cv.n_vecs,
              COALESCE(ps.n_pairs, 0) AS n_pairs,
              COALESCE(ps.n_dup_pairs, 0) AS n_dup_pairs,
              COALESCE(ps.n_removed, 0) AS n_removed
       FROM cv LEFT JOIN ps USING (cell_id)""",
)
def emb_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K2/K3+ SemDeDup (Abbas et al. 2023): embedding-space near-dup
    removal for training corpora — cluster into √n cells, test cosine ≥
    0.95 only WITHIN cells, drop the higher id of each duplicate pair.
    Per-cell stats out: n_vecs / n_pairs / n_dup_pairs / n_removed.
    Scale: the cluster step cuts the pair space from n² to ~n·√n and
    the pair join shuffles on cell_id only; the cosine test is
    all-integer (dot²·10⁴ ≥ 95²·‖a‖²·‖b‖², scale-100 quantization keeps
    every product inside BIGINT) so both engines agree bit-exactly."""
    from varda_spark.operators.similarity import semantic_dedup

    e = read_table(spark, sf_dir, "embeddings")
    return semantic_dedup(e, threshold_pct=95)


@q(
    "dedup_substring_spans",
    """WITH words AS (
         SELECT doc_id, string_split(trim(text), ' ') AS w FROM documents),
       sp AS (
         SELECT doc_id,
                unnest(list_transform(range(1, greatest(len(w) - 6, 1)),
                       i -> substr(md5(array_to_string(w[i:i+7], ' ')), 1, 16)))
                    AS h
         FROM words),
       hs AS (SELECT h, MIN(doc_id) <> MAX(doc_id) AS dup FROM sp GROUP BY h)
       SELECT doc_id,
              CAST(COUNT(*) AS BIGINT) AS n_spans,
              CAST(SUM(CASE WHEN dup THEN 1 ELSE 0 END) AS BIGINT)
                  AS n_dup_spans,
              CAST((1000000 * SUM(CASE WHEN dup THEN 1 ELSE 0 END))
                   // COUNT(*) AS BIGINT) AS dup_ppm
       FROM sp JOIN hs USING (h)
       GROUP BY doc_id""",
)
def dedup_substring_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K1/K2+ substring-level dedup (Lee et al. 2022, "Deduplicating
    Training Data Makes Language Models Better"): document-level dedup
    misses REPEATED PASSAGES inside otherwise-distinct documents
    (boilerplate, licenses, quoted chunks). Every 8-token span is
    hashed (64-bit md5 prefix — identical in both engines, and half
    the shuffle payload of the full digest); a span position is
    duplicated when its hash occurs in ≥2 distinct documents —
    detected as MIN(doc)≠MAX(doc), which aggregates with plain
    map-side partials (the countDistinct formulation this replaced
    pays a two-phase expand; min≠max is equivalent for the
    ≥2-distinct question). The document scan is REPARTITIONED to
    2×cores before the span explode — the expensive md5-per-span
    generation otherwise runs at the parquet file-count's parallelism
    (2 tasks at sf1: the r7 profile showed 19 s of a 21 s wall in
    that 2-task stage; with the spread it reads 4.7 s at sf1,
    32.9→17.6 s at sf5). Scale: one explode to n·(len−7) span rows,
    one groupBy on the hash (no skew: natural-language spans are
    near-unique), and the flag join reuses the same hash partitioning
    — the paper's suffix-array global scan re-expressed as two keyed
    aggregates."""
    d = read_table(spark, sf_dir, "documents")
    par = spark.sparkContext.defaultParallelism * 2
    w = (
        d.select("doc_id", F.trim("text").alias("t"))
        .repartition(par)
        .select("doc_id", F.split("t", " ").alias("w"))
    )
    sp = w.filter(F.size("w") >= 8).select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size("w") - 7),
                lambda i: F.substring(
                    F.md5(F.concat_ws(" ", F.slice("w", i, F.lit(8)))), 1, 16
                ),
            )
        ).alias("h"),
    )
    hs = sp.groupBy("h").agg(
        (F.min("doc_id") != F.max("doc_id")).alias("dup")
    )
    return (
        sp.join(hs, "h")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_spans"),
            F.sum(F.when(F.col("dup"), 1).otherwise(0)).cast("bigint").alias("n_dup_spans"),
        )
        .withColumn(
            "dup_ppm",
            F.expr("CAST((1000000 * n_dup_spans) DIV n_spans AS BIGINT)"),
        )
    )


@q(
    "store_zone_map_skip",
    """WITH files AS (
         SELECT l_orderkey // 1024 AS file_id,
                MIN(CAST(l_shipdate AS DATE)) AS mn,
                MAX(CAST(l_shipdate AS DATE)) AS mx
         FROM lineitem GROUP BY 1),
       months AS (
         SELECT DISTINCT CAST(date_trunc('month', CAST(l_shipdate AS DATE))
                              AS DATE) AS m0
         FROM lineitem)
       SELECT CAST(year(m0) * 100 + month(m0) AS BIGINT) AS ym,
              CAST(COUNT(*) AS BIGINT) AS n_files,
              CAST(SUM(CASE WHEN mx < m0 OR mn > last_day(m0)
                            THEN 1 ELSE 0 END) AS BIGINT) AS n_skipped,
              CAST((1000000 * SUM(CASE WHEN mx < m0 OR mn > last_day(m0)
                                       THEN 1 ELSE 0 END))
                   // COUNT(*) AS BIGINT) AS skip_ppm
       FROM months CROSS JOIN files
       GROUP BY 1""",
)
def store_zone_map_skip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5+ zone-map (min/max data-skipping) effectiveness audit — the
    number that decides whether a table needs re-clustering: per file
    (~1024-orderkey stripes, the ingestion order), the l_shipdate
    min/max zone map; per query month, how many files a month-range
    predicate prunes without reading. Because orderkey order correlates
    with date, skipping is high — the audit quantifies exactly how
    much, and a falling skip_ppm is the trigger for store_compaction /
    sort_zorder maintenance. Scale: file stats are one keyed agg (at
    100 TB, one row per parquet file — this IS the manifest); the
    month probe set is calendar-bounded (~84 rows) and broadcast, so
    the audit never shuffles the manifest."""
    li = read_table(spark, sf_dir, "lineitem")
    files = li.groupBy(F.expr("l_orderkey DIV 1024").alias("file_id")).agg(
        F.min(F.col("l_shipdate").cast("date")).alias("mn"),
        F.max(F.col("l_shipdate").cast("date")).alias("mx"),
    )
    months = li.select(
        F.date_trunc("month", F.col("l_shipdate").cast("date")).cast("date").alias("m0")
    ).distinct()
    skipped = F.when((F.col("mx") < F.col("m0")) | (F.col("mn") > F.last_day("m0")), 1).otherwise(0)
    return (
        files.crossJoin(F.broadcast(months))
        .groupBy((F.year("m0") * 100 + F.month("m0")).cast("bigint").alias("ym"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_files"),
            F.sum(skipped).cast("bigint").alias("n_skipped"),
        )
        .withColumn(
            "skip_ppm",
            F.expr("CAST((1000000 * n_skipped) DIV n_files AS BIGINT)"),
        )
    )


@q(
    "freq_denovo",
    """WITH obs AS (
         SELECT l_suppkey AS sample_id,
                CAST(l_partkey % 5 AS VARCHAR) AS chromosome,
                CAST(l_partkey * 31 + 1 AS BIGINT) AS position,
                CASE WHEN l_linenumber % 3 = 0 THEN 2
                     WHEN l_linenumber % 3 = 1 THEN 1 END AS gt
         FROM lineitem WHERE l_linenumber % 3 <> 2),
       g AS (
         SELECT sample_id, chromosome, position, CAST(MAX(gt) AS BIGINT) AS gt
         FROM obs GROUP BY sample_id, chromosome, position),
       child AS (
         SELECT CAST(sample_id / 3 AS BIGINT) AS trio_id,
                sample_id, chromosome, position, gt AS cgt
         FROM g WHERE sample_id % 3 = 0),
       j AS (
         SELECT c.trio_id, c.cgt,
                COALESCE(f.gt, 0) AS fgt, COALESCE(m.gt, 0) AS mgt
         FROM child c
         LEFT JOIN g f ON f.sample_id = c.sample_id - 2
                      AND f.chromosome = c.chromosome AND f.position = c.position
         LEFT JOIN g m ON m.sample_id = c.sample_id - 1
                      AND m.chromosome = c.chromosome AND m.position = c.position)
       SELECT trio_id,
              CAST(COUNT(*) AS BIGINT) AS n_sites,
              CAST(SUM(CASE WHEN cgt >= 1 AND fgt = 0 AND mgt = 0
                            THEN 1 ELSE 0 END) AS BIGINT) AS n_denovo,
              CAST((1000000 * SUM(CASE WHEN cgt >= 1 AND fgt = 0 AND mgt = 0
                                       THEN 1 ELSE 0 END))
                   // COUNT(*) AS BIGINT) AS denovo_ppm
       FROM j GROUP BY trio_id""",
)
def freq_denovo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Varda-domain de novo candidate screen: per family trio, child
    sites carrying an alt allele that NEITHER parent carries (missing
    parent site = homozygous-reference, the dataset's absence
    semantics — same trio synthesis and join shape as freq_trio_mendel,
    which certifies the plumbing). The de novo rate per trio is the
    first-pass filter for rare-disease analysis and doubles as a
    contamination screen (a swapped child's rate explodes). Plan: one
    keyed genotype dedup, two site-keyed left joins sharing one
    (chromosome, position) shuffle, one per-trio rollup — all keyed
    aggregates, nothing driver-side."""
    li = read_table(spark, sf_dir, "lineitem")
    obs = li.filter(F.expr("l_linenumber % 3 <> 2")).select(
        F.col("l_suppkey").alias("sample_id"),
        F.expr("CAST(l_partkey % 5 AS STRING)").alias("chromosome"),
        F.expr("CAST(l_partkey * 31 + 1 AS BIGINT)").alias("position"),
        F.expr(
            "CASE WHEN l_linenumber % 3 = 0 THEN 2"
            " WHEN l_linenumber % 3 = 1 THEN 1 END"
        ).alias("gt"),
    )
    g = obs.groupBy("sample_id", "chromosome", "position").agg(
        F.max("gt").cast("bigint").alias("gt")
    )
    child = g.filter(F.expr("sample_id % 3 = 0")).select(
        F.expr("CAST(sample_id / 3 AS BIGINT)").alias("trio_id"),
        "sample_id",
        "chromosome",
        "position",
        F.col("gt").alias("cgt"),
    )
    f = g.select(
        F.col("sample_id").alias("f_id"),
        F.col("chromosome").alias("f_chr"),
        F.col("position").alias("f_pos"),
        F.col("gt").alias("f_gt"),
    )
    m = g.select(
        F.col("sample_id").alias("m_id"),
        F.col("chromosome").alias("m_chr"),
        F.col("position").alias("m_pos"),
        F.col("gt").alias("m_gt"),
    )
    j = (
        child.join(
            f,
            (F.col("f_id") == F.col("sample_id") - 2)
            & (F.col("f_chr") == F.col("chromosome"))
            & (F.col("f_pos") == F.col("position")),
            "left",
        )
        .join(
            m,
            (F.col("m_id") == F.col("sample_id") - 1)
            & (F.col("m_chr") == F.col("chromosome"))
            & (F.col("m_pos") == F.col("position")),
            "left",
        )
        .select(
            "trio_id",
            "cgt",
            F.coalesce("f_gt", F.lit(0)).alias("fgt"),
            F.coalesce("m_gt", F.lit(0)).alias("mgt"),
        )
    )
    dn = F.when((F.col("cgt") >= 1) & (F.col("fgt") == 0) & (F.col("mgt") == 0), 1).otherwise(0)
    return (
        j.groupBy("trio_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_sites"),
            F.sum(dn).cast("bigint").alias("n_denovo"),
        )
        .withColumn(
            "denovo_ppm",
            F.expr("CAST((1000000 * n_denovo) DIV n_sites AS BIGINT)"),
        )
    )


@q(
    "freq_compound_het",
    "WITH " + _GT_CTE + """
       SELECT CAST(site_id % 100 AS BIGINT) AS gene_id,
              CAST(sample_id AS BIGINT) AS sample_id,
              CAST(COUNT(*) AS BIGINT) AS n_sites,
              CAST(SUM(CASE WHEN g = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_het
       FROM gt GROUP BY 1, 2
       HAVING SUM(CASE WHEN g = 1 THEN 1 ELSE 0 END) >= 2""",
)
def freq_compound_het(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Varda-domain compound-heterozygote candidate screen: genes where
    a sample carries ≥2 distinct heterozygous sites — phase-unaware,
    the recessive-disease shortlist every clinical pipeline computes
    before phasing. Gene model = site_id % 100 (the synthetic gene
    map; output stays bounded at genes×samples). One keyed aggregate
    over the shared genotype synthesis (_GT_CTE), HAVING pushed after
    the partial agg — map-side combine does the heavy lifting."""
    li = read_table(spark, sf_dir, "lineitem")
    gt = (
        li.groupBy(
            F.col("l_partkey").alias("site_id"),
            (F.col("l_suppkey") % 10).alias("sample_id"),
        )
        .agg(
            F.min(
                F.when(F.col("l_orderkey") % 3 == 0, 2)
                .when(F.col("l_orderkey") % 3 == 1, 1)
                .otherwise(0)
            ).alias("g")
        )
    )
    return (
        gt.groupBy(
            (F.col("site_id") % 100).cast("bigint").alias("gene_id"),
            F.col("sample_id").cast("bigint").alias("sample_id"),
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_sites"),
            F.sum(F.when(F.col("g") == 1, 1).otherwise(0)).cast("bigint").alias("n_het"),
        )
        .filter(F.col("n_het") >= 2)
    )


@q(
    "agg_event_transitions",
    """WITH seq AS (
         SELECT user_id, event_type,
                LAG(event_type) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id) AS prev_type
         FROM events)
       SELECT prev_type, event_type AS next_type,
              CAST(COUNT(*) AS BIGINT) AS n,
              CAST((1000000 * COUNT(*)) //
                   SUM(COUNT(*)) OVER (PARTITION BY prev_type)
                   AS BIGINT) AS row_ppm
       FROM seq WHERE prev_type IS NOT NULL
       GROUP BY prev_type, event_type""",
)
def agg_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E2+/I-family event-type transition matrix: per user, each event's
    LAG neighbor under the deterministic (ts, event_id) order gives the
    (prev → next) edge; counts roll up globally and row_ppm normalizes
    each source row — the empirical Markov kernel behind funnel /
    next-action models (graph_markov_stationary consumes exactly this
    shape). Plan: one window shuffle on user_id (bounded per-user
    partitions), one keyed agg over a types² (≤25-row) result, one
    tiny window for the row sums. Integer ppm via BIGINT DIV ≡ //."""
    ev = read_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "user_id", "event_type", F.lag("event_type").over(w).alias("prev_type")
    ).filter(F.col("prev_type").isNotNull())
    counts = seq.groupBy("prev_type", F.col("event_type").alias("next_type")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    wrow = Window.partitionBy("prev_type")
    return counts.withColumn("_tot", F.sum("n").over(wrow)).select(
        "prev_type",
        "next_type",
        "n",
        F.expr("CAST((1000000 * n) DIV _tot AS BIGINT)").alias("row_ppm"),
    )


@q(
    "store_table_stats",
    """WITH s AS (
         SELECT o_orderkey, o_custkey, o_orderstatus,
                CAST(FLOOR(o_totalprice) AS BIGINT) AS price_usd,
                CAST(o_orderdate AS DATE) AS d
         FROM orders)
       SELECT 'o_orderkey' AS col_name, CAST(COUNT(*) AS BIGINT) AS n_rows,
              CAST(COUNT(*) - COUNT(o_orderkey) AS BIGINT) AS n_nulls,
              CAST(COUNT(DISTINCT o_orderkey) AS BIGINT) AS ndv,
              CAST(MIN(o_orderkey) AS VARCHAR) AS min_val,
              CAST(MAX(o_orderkey) AS VARCHAR) AS max_val
       FROM s
       UNION ALL
       SELECT 'o_custkey', CAST(COUNT(*) AS BIGINT),
              CAST(COUNT(*) - COUNT(o_custkey) AS BIGINT),
              CAST(COUNT(DISTINCT o_custkey) AS BIGINT),
              CAST(MIN(o_custkey) AS VARCHAR), CAST(MAX(o_custkey) AS VARCHAR)
       FROM s
       UNION ALL
       SELECT 'o_orderstatus', CAST(COUNT(*) AS BIGINT),
              CAST(COUNT(*) - COUNT(o_orderstatus) AS BIGINT),
              CAST(COUNT(DISTINCT o_orderstatus) AS BIGINT),
              MIN(o_orderstatus), MAX(o_orderstatus)
       FROM s
       UNION ALL
       SELECT 'price_usd', CAST(COUNT(*) AS BIGINT),
              CAST(COUNT(*) - COUNT(price_usd) AS BIGINT),
              CAST(COUNT(DISTINCT price_usd) AS BIGINT),
              CAST(MIN(price_usd) AS VARCHAR), CAST(MAX(price_usd) AS VARCHAR)
       FROM s
       UNION ALL
       SELECT 'o_orderdate', CAST(COUNT(*) AS BIGINT),
              CAST(COUNT(*) - COUNT(d) AS BIGINT),
              CAST(COUNT(DISTINCT d) AS BIGINT),
              CAST(MIN(d) AS VARCHAR), CAST(MAX(d) AS VARCHAR)
       FROM s""",
)
def store_table_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5+ ANALYZE-TABLE-style column statistics collection: per column,
    row count / null count / exact NDV / min / max (as canonical
    strings) — the numbers a cost-based optimizer and a zone-map
    builder both feed on. ONE scan: Spark computes all five columns'
    stats in a single aggregate (Catalyst expands the multi-distinct
    into one pass) and unpivots the 1-row result via an inline array —
    at 100 TB this is the standard stats job, scan-bound with map-side
    partials; no per-column rescans (the oracle's UNION ALL is the
    semantic spec, not the plan)."""
    o = read_table(spark, sf_dir, "orders")
    s = o.select(
        "o_orderkey",
        "o_custkey",
        "o_orderstatus",
        F.expr("CAST(FLOOR(o_totalprice) AS BIGINT)").alias("price_usd"),
        F.col("o_orderdate").cast("date").alias("d"),
    )
    agg = s.agg(
        F.count(F.lit(1)).alias("_n"),
        *[
            e
            for c in ["o_orderkey", "o_custkey", "o_orderstatus", "price_usd", "d"]
            for e in (
                F.count(c).alias(f"_c_{c}"),
                F.countDistinct(c).alias(f"_ndv_{c}"),
                F.min(c).cast("string").alias(f"_mn_{c}"),
                F.max(c).cast("string").alias(f"_mx_{c}"),
            )
        ],
    )
    cols = ["o_orderkey", "o_custkey", "o_orderstatus", "price_usd", "o_orderdate"]
    srcs = ["o_orderkey", "o_custkey", "o_orderstatus", "price_usd", "d"]
    rows = F.array(
        *[
            F.struct(
                F.lit(name).alias("col_name"),
                F.col("_n").cast("bigint").alias("n_rows"),
                (F.col("_n") - F.col(f"_c_{src}")).cast("bigint").alias("n_nulls"),
                F.col(f"_ndv_{src}").cast("bigint").alias("ndv"),
                F.col(f"_mn_{src}").alias("min_val"),
                F.col(f"_mx_{src}").alias("max_val"),
            )
            for name, src in zip(cols, srcs)
        ]
    )
    return agg.select(F.explode(rows).alias("r")).select("r.*")


@q(
    "agg_mad_outliers",
    """WITH daily AS (
         SELECT CAST(o_orderdate AS DATE) AS d,
                CAST(SUM(CAST(FLOOR(o_totalprice) AS BIGINT)) AS BIGINT) AS x
         FROM orders GROUP BY 1),
       n AS (SELECT CAST(COUNT(*) AS BIGINT) AS nd FROM daily),
       med AS (
         SELECT x AS m FROM (
           SELECT x, ROW_NUMBER() OVER (ORDER BY x, d) AS rn FROM daily) r
         CROSS JOIN n WHERE rn = (nd + 1) // 2),
       dev AS (
         SELECT d, x, ABS(x - m) AS dv FROM daily CROSS JOIN med),
       mad AS (
         SELECT dv AS md FROM (
           SELECT dv, ROW_NUMBER() OVER (ORDER BY dv, d) AS rn FROM dev) r
         CROSS JOIN n WHERE rn = (nd + 1) // 2)
       SELECT d, x AS revenue_usd, m AS med, md AS mad, dv AS dev
       FROM dev CROSS JOIN med CROSS JOIN mad
       WHERE dv > 5 * md""",
)
def agg_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust daily-revenue anomaly detection via median absolute
    deviation — the outlier screen that, unlike z-scores, one whale
    order can't poison (median and MAD have 50% breakdown). Lower
    medians by deterministic (value, day) rank — integer-exact, no
    interpolation, so both engines agree bit-for-bit. Plan: one keyed
    day rollup (map-side partials), then two rank windows over the
    CALENDAR-BOUNDED day table (~2.4k rows at any sf — whitelisted) and
    1-row median/MAD scalars broadcast back across the days."""
    o = read_table(spark, sf_dir, "orders")
    daily = o.groupBy(F.col("o_orderdate").cast("date").alias("d")).agg(
        F.sum(F.expr("CAST(FLOOR(o_totalprice) AS BIGINT)")).cast("bigint").alias("x")
    )
    nd = daily.agg(F.count(F.lit(1)).cast("bigint").alias("nd"))
    ranked = daily.withColumn(
        "rn", F.row_number().over(Window.orderBy("x", "d"))
    ).crossJoin(F.broadcast(nd))
    med = ranked.filter(F.expr("rn = (nd + 1) DIV 2")).select(F.col("x").alias("m"))
    dev = daily.crossJoin(F.broadcast(med)).select(
        "d", "x", F.abs(F.col("x") - F.col("m")).alias("dv"), "m"
    )
    ranked2 = dev.withColumn(
        "rn", F.row_number().over(Window.orderBy("dv", "d"))
    ).crossJoin(F.broadcast(nd))
    mad = ranked2.filter(F.expr("rn = (nd + 1) DIV 2")).select(F.col("dv").alias("md"))
    return (
        dev.crossJoin(F.broadcast(mad))
        .filter(F.col("dv") > 5 * F.col("md"))
        .select(
            "d",
            F.col("x").alias("revenue_usd"),
            F.col("m").alias("med"),
            F.col("md").alias("mad"),
            F.col("dv").alias("dev"),
        )
    )


@q(
    "freq_ibs_pairs",
    "WITH " + _GT_CTE + """
       SELECT CAST(a.sample_id AS BIGINT) AS sample_a,
              CAST(b.sample_id AS BIGINT) AS sample_b,
              CAST(COUNT(*) AS BIGINT) AS n_shared,
              CAST(SUM(CASE WHEN ABS(a.g - b.g) = 2 THEN 1 ELSE 0 END)
                   AS BIGINT) AS ibs0,
              CAST(SUM(CASE WHEN ABS(a.g - b.g) = 1 THEN 1 ELSE 0 END)
                   AS BIGINT) AS ibs1,
              CAST(SUM(CASE WHEN a.g = b.g THEN 1 ELSE 0 END)
                   AS BIGINT) AS ibs2,
              CAST((1000000 * (2 * SUM(CASE WHEN a.g = b.g THEN 1 ELSE 0 END)
                               + SUM(CASE WHEN ABS(a.g - b.g) = 1
                                          THEN 1 ELSE 0 END)))
                   // (2 * COUNT(*)) AS BIGINT) AS similarity_ppm
       FROM gt a JOIN gt b
         ON a.site_id = b.site_id AND a.sample_id < b.sample_id
       GROUP BY 1, 2""",
)
def freq_ibs_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Varda-domain identity-by-state sharing (plink --genome's IBS
    half): per sample pair over co-observed sites, the counts of sites
    where dosages differ by 2 / 1 / 0 and the classic similarity
    (2·IBS2 + IBS1) / (2·shared) in ppm — duplicate-sample and
    close-relative detection that complements freq_kinship's moment
    estimator. Plan: the genotype synthesis shuffles once on site_id;
    the pair join is site-keyed (fan-out = samples² per site, bounded
    at 10 samples) and rolls straight into a 45-row keyed agg with
    map-side partials — never an all-pairs-of-rows join."""
    li = read_table(spark, sf_dir, "lineitem")
    gt = (
        li.groupBy(
            F.col("l_partkey").alias("site_id"),
            (F.col("l_suppkey") % 10).alias("sample_id"),
        )
        .agg(
            F.min(
                F.when(F.col("l_orderkey") % 3 == 0, 2)
                .when(F.col("l_orderkey") % 3 == 1, 1)
                .otherwise(0)
            ).alias("g")
        )
    )
    a = gt.select("site_id", F.col("sample_id").alias("sample_a"), F.col("g").alias("ga"))
    b = gt.select("site_id", F.col("sample_id").alias("sample_b"), F.col("g").alias("gb"))
    j = a.join(b, "site_id").filter(F.col("sample_a") < F.col("sample_b"))
    d = F.abs(F.col("ga") - F.col("gb"))
    out = j.groupBy(
        F.col("sample_a").cast("bigint").alias("sample_a"),
        F.col("sample_b").cast("bigint").alias("sample_b"),
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_shared"),
        F.sum(F.when(d == 2, 1).otherwise(0)).cast("bigint").alias("ibs0"),
        F.sum(F.when(d == 1, 1).otherwise(0)).cast("bigint").alias("ibs1"),
        F.sum(F.when(d == 0, 1).otherwise(0)).cast("bigint").alias("ibs2"),
    )
    return out.withColumn(
        "similarity_ppm",
        F.expr("CAST((1000000 * (2 * ibs2 + ibs1)) DIV (2 * n_shared) AS BIGINT)"),
    )


@q(
    "win_bollinger_breach",
    """WITH daily AS (
         SELECT CAST(o_orderdate AS DATE) AS d,
                CAST(SUM(CAST(FLOOR(o_totalprice) AS BIGINT)) AS BIGINT) AS x
         FROM orders GROUP BY 1),
       w AS (
         SELECT d, x,
                CAST(COUNT(*) OVER win AS BIGINT) AS n20,
                CAST(SUM(x) OVER win AS BIGINT) AS s20,
                SUM(CAST(x AS HUGEINT) * x) OVER win AS q20
         FROM daily
         WINDOW win AS (ORDER BY d ROWS BETWEEN 19 PRECEDING AND CURRENT ROW))
       SELECT d, x AS revenue_usd, n20,
              CASE WHEN n20 * x - s20 > 0
                    AND CAST(n20 * x - s20 AS HUGEINT)
                        * CAST(n20 * x - s20 AS HUGEINT)
                        > 4 * (CAST(n20 AS HUGEINT) * q20
                               - CAST(s20 AS HUGEINT) * CAST(s20 AS HUGEINT))
                   THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END AS breach_hi,
              CASE WHEN n20 * x - s20 < 0
                    AND CAST(n20 * x - s20 AS HUGEINT)
                        * CAST(n20 * x - s20 AS HUGEINT)
                        > 4 * (CAST(n20 AS HUGEINT) * q20
                               - CAST(s20 AS HUGEINT) * CAST(s20 AS HUGEINT))
                   THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END AS breach_lo
       FROM w""",
)
def win_bollinger_breach(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E3+ Bollinger-band breach detection with NO square root: a day
    breaches the ±2σ band iff (n·x − Σx)² > k²·(n·Σx² − (Σx)²) — the
    band test squared and cleared of denominators, so the whole thing
    is integer arithmetic (HUGEINT ↔ DECIMAL(38,0) for the squares,
    which overflow BIGINT once daily revenue passes ~3e9 at high sf)
    and bit-exact across engines. One keyed day rollup then one
    ordered 20-row frame over the CALENDAR-BOUNDED day table (~2.4k
    rows at any sf — whitelisted global window, same argument as
    win_rolling_slope)."""
    o = read_table(spark, sf_dir, "orders")
    daily = o.groupBy(F.col("o_orderdate").cast("date").alias("d")).agg(
        F.sum(F.expr("CAST(FLOOR(o_totalprice) AS BIGINT)")).cast("bigint").alias("x")
    )
    win = Window.orderBy("d").rowsBetween(-19, 0)
    w = daily.select(
        "d",
        "x",
        F.count(F.lit(1)).over(win).cast("bigint").alias("n20"),
        F.sum("x").over(win).cast("bigint").alias("s20"),
        # x² fits BIGINT but the 20-day frame SUM does not once daily
        # revenue passes ~7e8 (hit at sf5) — accumulate in DECIMAL(38,0)
        F.sum(F.expr("CAST(x AS DECIMAL(19,0)) * x")).over(win).alias("q20"),
    )
    lhs = (
        "CAST(n20 * x - s20 AS DECIMAL(19,0)) * CAST(n20 * x - s20 AS DECIMAL(19,0))"
    )
    rhs = (
        "4 * (CAST(n20 AS DECIMAL(38,0)) * q20"
        " - CAST(s20 AS DECIMAL(19,0)) * CAST(s20 AS DECIMAL(19,0)))"
    )
    return w.select(
        "d",
        F.col("x").alias("revenue_usd"),
        "n20",
        F.expr(
            f"CAST(CASE WHEN n20 * x - s20 > 0 AND {lhs} > {rhs}"
            " THEN 1 ELSE 0 END AS BIGINT)"
        ).alias("breach_hi"),
        F.expr(
            f"CAST(CASE WHEN n20 * x - s20 < 0 AND {lhs} > {rhs}"
            " THEN 1 ELSE 0 END AS BIGINT)"
        ).alias("breach_lo"),
    )


@q(
    "agg_exact_percentiles",
    """WITH v AS (
         SELECT c_mktsegment AS segment,
                CAST(FLOOR(c_acctbal * 100) AS BIGINT) AS cents
         FROM customer),
       r AS (
         SELECT segment, cents,
                ROW_NUMBER() OVER (PARTITION BY segment
                                   ORDER BY cents) AS rn,
                COUNT(*) OVER (PARTITION BY segment) AS n
         FROM v)
       SELECT segment, CAST(MAX(n) AS BIGINT) AS n,
              CAST(MIN(CASE WHEN rn = (50 * n + 99) // 100
                            THEN cents END) AS BIGINT) AS p50_cents,
              CAST(MIN(CASE WHEN rn = (90 * n + 99) // 100
                            THEN cents END) AS BIGINT) AS p90_cents,
              CAST(MIN(CASE WHEN rn = (99 * n + 99) // 100
                            THEN cents END) AS BIGINT) AS p99_cents
       FROM r GROUP BY segment""",
)
def agg_exact_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D+ EXACT grouped percentiles — the ground-truth companion to the
    sketch keys (agg_approx_pct, agg_hist_quantile): per segment, the
    lower-percentile p50/p90/p99 of the balance in integer cents, idx =
    ceil(p·n/100) by rank — no interpolation, no floats, so both
    engines agree on the exact member value. Plan: one rank window per
    GROUP (partitioned, distributed — this is the exact-percentile
    shape that scales: the global-sort variant would not), then one
    keyed agg folding the three picked ranks. At 100 TB exact grouped
    percentiles are a real ask (SLA reporting); the documented
    trade-off vs the mergeable sketches is one sort-shuffle of the
    group's rows."""
    c = read_table(spark, sf_dir, "customer")
    v = c.select(
        F.col("c_mktsegment").alias("segment"),
        F.expr("CAST(FLOOR(c_acctbal * 100) AS BIGINT)").alias("cents"),
    )
    w = Window.partitionBy("segment").orderBy("cents")
    wn = Window.partitionBy("segment")
    r = v.select(
        "segment",
        "cents",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(wn).alias("n"),
    )
    pick = lambda p: F.min(  # noqa: E731
        F.when(F.col("rn") == F.expr(f"({p} * n + 99) DIV 100"), F.col("cents"))
    ).cast("bigint")
    return r.groupBy("segment").agg(
        F.max("n").cast("bigint").alias("n"),
        pick(50).alias("p50_cents"),
        pick(90).alias("p90_cents"),
        pick(99).alias("p99_cents"),
    )


# =====================================================================
# Round 7 continuation batch A
# =====================================================================

@q(
    "agg_kmv_intersect",
    """WITH ha AS (
         SELECT DISTINCT CAST('0x' || substr(md5(CAST(o_custkey AS VARCHAR)), 1, 15)
                              AS BIGINT) AS h
         FROM orders WHERE o_orderstatus = 'F'),
       hb AS (
         SELECT DISTINCT CAST('0x' || substr(md5(CAST(o_custkey AS VARCHAR)), 1, 15)
                              AS BIGINT) AS h
         FROM orders WHERE o_orderstatus = 'O'),
       ska AS (SELECT h FROM ha ORDER BY h LIMIT 128),
       skb AS (SELECT h FROM hb ORDER BY h LIMIT 128),
       th AS (SELECT LEAST((SELECT MAX(h) FROM ska),
                           (SELECT MAX(h) FROM skb)) AS theta),
       com AS (
         SELECT CAST(COUNT(*) AS BIGINT) AS n_common
         FROM ska JOIN skb ON ska.h = skb.h CROSS JOIN th
         WHERE ska.h < th.theta),
       ex AS (
         SELECT CAST(COUNT(*) AS BIGINT) AS exact_inter FROM (
           SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'F'
           INTERSECT
           SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'O')),
       est AS (
         SELECT theta, n_common, exact_inter,
                CAST(CAST(n_common AS HUGEINT) * 1152921504606846976 // theta
                     AS BIGINT) AS est_inter
         FROM th CROSS JOIN com CROSS JOIN ex)
       SELECT CAST(128 AS BIGINT) AS k, theta, n_common, est_inter, exact_inter,
              CASE WHEN exact_inter = 0 THEN NULL
                   ELSE CAST(CAST(ABS(est_inter - exact_inter) AS HUGEINT)
                             * 1000000 // exact_inter AS BIGINT)
              END AS err_ppm
       FROM est""",
)
def agg_kmv_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D4+ theta-sketch SET INTERSECTION estimate — the companion to
    agg_kmv_union (union cardinality) completing the sketch algebra a
    segmentation engine needs (|A∩B| of two audience segments without
    a distinct-join): KMV(k=128) per set over the 60-bit md5 hash,
    theta = min of the two kth-smallest values, estimate = |{common
    entries < theta}| · 2^60 / theta (Dasgupta et al., DataSketches
    theta algebra). The exact intersection rides along as the accuracy
    yardstick (err_ppm) — the half a production run would skip. Scale:
    each k-smallest is TakeOrdered (per-partition top-k, k·P merge on
    one reducer — never a global sort); the sketch∧sketch join is two
    128-row broadcasts; only the yardstick INTERSECT shuffles. The
    128·2^60 product exceeds int64, so the estimate multiplies in
    DECIMAL(38,0)/HUGEINT (the win_bollinger_breach overflow lesson);
    all operands non-negative so truncating division agrees."""
    o = read_table(spark, sf_dir, "orders")
    h60 = "CAST(conv(substring(md5(CAST(o_custkey AS STRING)), 1, 15), 16, 10) AS BIGINT)"

    def hashes(status: str) -> DataFrame:
        return (
            o.filter(F.col("o_orderstatus") == status)
            .select("o_custkey")
            .distinct()
            .select(F.expr(h60).alias("h"))
        )

    ska = hashes("F").orderBy("h").limit(128)
    skb = hashes("O").orderBy("h").limit(128)
    th = (
        ska.agg(F.max("h").alias("tha"))
        .crossJoin(F.broadcast(skb.agg(F.max("h").alias("thb"))))
        .select(F.least("tha", "thb").alias("theta"))
    )
    nc = (
        ska.join(skb, "h")
        .crossJoin(F.broadcast(th))
        .where(F.col("h") < F.col("theta"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_common"))
    )
    ex = (
        o.filter(F.col("o_orderstatus") == "F").select("o_custkey").distinct()
        .intersect(
            o.filter(F.col("o_orderstatus") == "O").select("o_custkey").distinct()
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("exact_inter"))
    )
    est = (
        th.crossJoin(F.broadcast(nc))
        .crossJoin(F.broadcast(ex))
        .withColumn(
            "est_inter",
            F.expr(
                "CAST(CAST(n_common AS DECIMAL(38,0)) * 1152921504606846976"
                " DIV theta AS BIGINT)"
            ),
        )
    )
    return est.select(
        F.lit(128).cast("bigint").alias("k"),
        "theta",
        "n_common",
        "est_inter",
        "exact_inter",
        F.expr(
            "CASE WHEN exact_inter = 0 THEN NULL"
            " ELSE CAST(CAST(ABS(est_inter - exact_inter) AS DECIMAL(38,0))"
            " * 1000000 DIV exact_inter AS BIGINT) END"
        ).alias("err_ppm"),
    )


@q(
    "agg_l_diversity",
    """WITH s AS (
         SELECT CAST(year(CAST(o_orderdate AS DATE)) AS BIGINT) AS qi_year,
                o_orderpriority AS qi_priority, o_orderstatus AS sens,
                CAST(COUNT(*) AS BIGINT) AS c
         FROM orders GROUP BY 1, 2, 3)
       SELECT qi_year, qi_priority,
              CAST(SUM(c) AS BIGINT) AS n,
              CAST(COUNT(*) AS BIGINT) AS l_distinct,
              CAST(SUM(CAST(c AS HUGEINT) * c) * 1000000
                   // (CAST(SUM(c) AS HUGEINT) * SUM(c)) AS BIGINT) AS simpson_ppm,
              COUNT(*) >= 3 AS meets_l3
       FROM s GROUP BY qi_year, qi_priority""",
)
def agg_l_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D+ l-DIVERSITY audit — the release-gate companion to
    agg_k_anonymity (group SIZE says nothing about whether everyone in
    the group shares one sensitive value): per quasi-identifier group
    (order year × priority), the distinct count of the sensitive
    attribute (status), the Simpson concentration in ppm (Σc²/n² —
    the entropy-free diversity measure, the agg_simpson discipline:
    no float log cross-engine), and the l≥3 pass flag. Scale: two
    keyed aggregates, both with map-side partials — the (QI, sens)
    pre-aggregate collapses the fact table before the per-group fold,
    so the shuffle carries |QI|·|sens| rows, not the table. Squares
    accumulate in HUGEINT/DECIMAL(38,0); all terms non-negative so
    truncating division agrees."""
    o = read_table(spark, sf_dir, "orders")
    s = o.groupBy(
        F.year("o_orderdate").cast("bigint").alias("qi_year"),
        F.col("o_orderpriority").alias("qi_priority"),
        F.col("o_orderstatus").alias("sens"),
    ).agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    return s.groupBy("qi_year", "qi_priority").agg(
        F.sum("c").cast("bigint").alias("n"),
        F.count(F.lit(1)).cast("bigint").alias("l_distinct"),
        F.expr(
            "CAST(SUM(CAST(c AS DECIMAL(38,0)) * c) * 1000000"
            " DIV (CAST(SUM(c) AS DECIMAL(38,0)) * SUM(c)) AS BIGINT)"
        ).alias("simpson_ppm"),
        (F.count(F.lit(1)) >= 3).alias("meets_l3"),
    )


@q(
    "qa_candidate_keys",
    """WITH e AS (
         SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts, event_type,
                CAST(CAST(ts AS TIMESTAMP) AS DATE) AS d
         FROM events),
       c1 AS (SELECT CAST(COUNT(*) AS BIGINT) AS c FROM e GROUP BY event_id),
       c2 AS (SELECT CAST(COUNT(*) AS BIGINT) AS c FROM e GROUP BY user_id, ts),
       c3 AS (SELECT CAST(COUNT(*) AS BIGINT) AS c FROM e
              GROUP BY user_id, event_type, d)
       SELECT 'event_id' AS candidate, CAST(SUM(c) AS BIGINT) AS n_rows,
              CAST(COUNT(*) AS BIGINT) AS n_keys,
              CAST(SUM(c) - COUNT(*) AS BIGINT) AS dup_rows,
              CAST(MAX(c) AS BIGINT) AS max_mult, MAX(c) = 1 AS is_unique
       FROM c1
       UNION ALL
       SELECT 'user_id,ts', CAST(SUM(c) AS BIGINT), CAST(COUNT(*) AS BIGINT),
              CAST(SUM(c) - COUNT(*) AS BIGINT), CAST(MAX(c) AS BIGINT), MAX(c) = 1
       FROM c2
       UNION ALL
       SELECT 'user_id,event_type,day', CAST(SUM(c) AS BIGINT),
              CAST(COUNT(*) AS BIGINT), CAST(SUM(c) - COUNT(*) AS BIGINT),
              CAST(MAX(c) AS BIGINT), MAX(c) = 1
       FROM c3""",
)
def qa_candidate_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """QA+ candidate-key uniqueness audit — the contract check
    qa_profile's per-COLUMN stats cannot answer (a composite key's
    multiplicity is a property of the tuple): for each declared
    candidate key of the event stream (event_id; (user_id, ts);
    (user_id, event_type, day)) one row with row count, distinct key
    count, duplicate-row count and the MAX multiplicity — max_mult is
    what an upsert/merge planner needs (merge_upsert assumes 1; a
    2 means last-writer-wins semantics activate). Scale: each
    candidate is one keyed count + one fold, map-side partials
    throughout; no distinct-on-driver, no window."""
    e = read_table(spark, sf_dir, "events").select(
        "event_id", "user_id",
        F.col("ts").cast("timestamp").alias("ts"),
        "event_type",
        F.col("ts").cast("timestamp").cast("date").alias("d"),
    )

    def audit(name: str, cols: list[str]) -> DataFrame:
        c = e.groupBy(*cols).agg(F.count(F.lit(1)).cast("bigint").alias("c"))
        return c.agg(
            F.lit(name).alias("candidate"),
            F.sum("c").cast("bigint").alias("n_rows"),
            F.count(F.lit(1)).cast("bigint").alias("n_keys"),
            (F.sum("c") - F.count(F.lit(1))).cast("bigint").alias("dup_rows"),
            F.max("c").cast("bigint").alias("max_mult"),
            (F.max("c") == 1).alias("is_unique"),
        )

    return (
        audit("event_id", ["event_id"])
        .unionAll(audit("user_id,ts", ["user_id", "ts"]))
        .unionAll(audit("user_id,event_type,day", ["user_id", "event_type", "d"]))
    )


@q(
    "scan_dpp",
    """SELECT CAST(year(CAST(o_orderdate AS DATE)) * 100
                  + month(CAST(o_orderdate AS DATE)) AS BIGINT) AS ym,
              CAST(COUNT(*) AS BIGINT) AS n_orders,
              CAST(SUM(CAST(FLOOR(o_totalprice) AS BIGINT)) AS BIGINT) AS tot
       FROM orders
       WHERE month(CAST(o_orderdate AS DATE)) <= 3
       GROUP BY 1""",
)
def scan_dpp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5+ DYNAMIC partition pruning — the runtime half of scan
    elimination (scan_partition_pruned covers the STATIC case where
    the literal filter is on the partition column): the fact lands
    partitioned by month key ym, and the query filters on a DIMENSION
    attribute (quarter) that only reaches ym through a join — no
    static filter exists at plan time, so Catalyst inserts a
    dynamicpruning subquery that executes the broadcast dim first and
    prunes fact partitions with the ym values that survive
    (tests/test_plans.py asserts `dynamicpruning` in the partition
    filters). At 100 TB this is the star-join pattern: a date-dim
    filter eliminating fact partitions without anyone hand-writing
    the partition predicate. Scratch table session-scoped like
    scan_partition_pruned's; the oracle states the pruned semantics
    directly (quarter ≤ Q1 months)."""
    o = read_table(spark, sf_dir, "orders").withColumn(
        "ym",
        (F.year("o_orderdate") * 100 + F.month("o_orderdate")).cast("bigint"),
    )
    tag = "".join(ch if ch.isalnum() else "_" for ch in spark.sparkContext.applicationId)
    path = f"/root/repo/spark-warehouse/dpp_orders_{tag}"
    _sweep_stale_scratch()
    o.write.mode("overwrite").partitionBy("ym").parquet(path)
    fact = spark.read.parquet(path)
    dim = (
        o.select("ym", F.quarter("o_orderdate").alias("qtr")).distinct()
    )
    return (
        fact.join(F.broadcast(dim.filter(F.col("qtr") == 1)), "ym")
        .groupBy("ym")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_orders"),
            F.sum(F.expr("CAST(FLOOR(o_totalprice) AS BIGINT)")).cast("bigint").alias("tot"),
        )
    )


@q(
    "text_anneal_plan",
    """WITH d AS (
         SELECT source, (n_chars + 3) // 4 AS toks,
                CASE WHEN (100 * length(regexp_replace(text, '[^A-Za-z ]', '', 'g')))
                          // GREATEST(length(text), 1) >= 60
                     THEN (n_chars + 3) // 4 ELSE 0 END AS hq
         FROM documents),
       s AS (
         SELECT source, CAST(SUM(toks) AS BIGINT) AS toks,
                CAST(SUM(hq) AS BIGINT) AS hq_toks
         FROM d GROUP BY source),
       t AS (SELECT SUM(toks) AS w1, SUM(hq_toks) AS w2 FROM s),
       base AS (
         SELECT source, toks, hq_toks,
                CAST(CAST(toks AS HUGEINT) * 1000000 // w1 AS BIGINT) AS f1,
                CAST(CAST(toks AS HUGEINT) * 1000000 % w1 AS BIGINT) AS r1,
                CAST(CAST(hq_toks AS HUGEINT) * 250000 // w2 AS BIGINT) AS f2,
                CAST(CAST(hq_toks AS HUGEINT) * 250000 % w2 AS BIGINT) AS r2
         FROM s CROSS JOIN t),
       fin AS (
         SELECT source, toks, hq_toks, f1, f2,
                ROW_NUMBER() OVER (ORDER BY r1 DESC, source) AS rn1,
                ROW_NUMBER() OVER (ORDER BY r2 DESC, source) AS rn2,
                SUM(f1) OVER () AS tot1, SUM(f2) OVER () AS tot2
         FROM base)
       SELECT source, toks, hq_toks,
              CAST(f1 + CASE WHEN rn1 <= 1000000 - tot1 THEN 1 ELSE 0 END
                   AS BIGINT) AS p1_tokens,
              CAST(f2 + CASE WHEN rn2 <= 250000 - tot2 THEN 1 ELSE 0 END
                   AS BIGINT) AS p2_tokens
       FROM fin""",
)
def text_anneal_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K+ two-phase CURRICULUM/anneal mixture plan — the mid-training
    reweighting step every modern pretraining run ships (phase 1:
    1M-token budget split ∝ raw tokens; phase 2 "anneal": 250k-token
    budget split ∝ HIGH-QUALITY tokens only, quality = the integer
    alpha-ratio heuristic ≥ 60) — composing with text_domain_mix
    (the report) and text_upsample_plan (the single-phase rebalance).
    Budgets are EXACT by largest-remainder apportionment: floor the
    proportional share, then +1 to the largest remainders until the
    budget is met — Σ p1_tokens = 1,000,000 and Σ p2_tokens = 250,000
    hold exactly (asserted in tests). Scale: one scan + one keyed agg
    per source; the apportionment windows run over |sources| rows
    (value-domain-bounded — whitelisted), never the corpus. Integer
    arithmetic throughout; the 1e6-scaled multiplies sit in
    HUGEINT/DECIMAL(38,0)."""
    # NOTE: unlike dedup_substring_spans, a pre-repartition does NOT pay
    # here — the regex is one pass per char (comparable to the shuffle
    # cost of shipping the text), measured 10.5→12.7 s at sf5 with it
    d = read_table(spark, sf_dir, "documents").select(
        "source",
        F.expr("(n_chars + 3) DIV 4").alias("toks"),
        F.expr(
            "CASE WHEN (100 * length(regexp_replace(text, '[^A-Za-z ]', '')))"
            " DIV GREATEST(length(text), 1) >= 60"
            " THEN (n_chars + 3) DIV 4 ELSE 0 END"
        ).alias("hq"),
    )
    s = d.groupBy("source").agg(
        F.sum("toks").cast("bigint").alias("toks"),
        F.sum("hq").cast("bigint").alias("hq_toks"),
    )
    t = s.agg(F.sum("toks").alias("w1"), F.sum("hq_toks").alias("w2"))
    base = s.crossJoin(F.broadcast(t)).select(
        "source", "toks", "hq_toks",
        F.expr("CAST(CAST(toks AS DECIMAL(38,0)) * 1000000 DIV w1 AS BIGINT)").alias("f1"),
        F.expr(
            "CAST(CAST(toks AS DECIMAL(38,0)) * 1000000 % CAST(w1 AS DECIMAL(38,0))"
            " AS BIGINT)"
        ).alias("r1"),
        F.expr("CAST(CAST(hq_toks AS DECIMAL(38,0)) * 250000 DIV w2 AS BIGINT)").alias("f2"),
        F.expr(
            "CAST(CAST(hq_toks AS DECIMAL(38,0)) * 250000 % CAST(w2 AS DECIMAL(38,0))"
            " AS BIGINT)"
        ).alias("r2"),
    )
    w_all = Window.orderBy(F.lit(1)).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    fin = base.select(
        "source", "toks", "hq_toks", "f1", "f2",
        F.row_number().over(Window.orderBy(F.col("r1").desc(), "source")).alias("rn1"),
        F.row_number().over(Window.orderBy(F.col("r2").desc(), "source")).alias("rn2"),
        F.sum("f1").over(w_all).alias("tot1"),
        F.sum("f2").over(w_all).alias("tot2"),
    )
    return fin.select(
        "source", "toks", "hq_toks",
        F.expr(
            "CAST(f1 + CASE WHEN rn1 <= 1000000 - tot1 THEN 1 ELSE 0 END AS BIGINT)"
        ).alias("p1_tokens"),
        F.expr(
            "CAST(f2 + CASE WHEN rn2 <= 250000 - tot2 THEN 1 ELSE 0 END AS BIGINT)"
        ).alias("p2_tokens"),
    )


# =====================================================================
# Round 7 continuation batch B
# =====================================================================

@q(
    "emb_knn_classify",
    """WITH q AS (
         SELECT vec_id, label,
                list_transform(embedding,
                    x -> CAST(floor(CAST(x AS DOUBLE) * 100) AS BIGINT)) AS e
         FROM embeddings),
       qs AS (
         SELECT vec_id AS query_id, label AS true_label, e AS qe
         FROM q ORDER BY vec_id LIMIT 50),
       pairs AS (
         SELECT qs.query_id, qs.true_label, c.vec_id, c.label,
                CAST(list_sum(list_transform(list_zip(c.e, qs.qe),
                     s -> s[1] * s[2])) AS BIGINT) AS dot
         FROM q c CROSS JOIN qs WHERE c.vec_id <> qs.query_id),
       knn AS (
         SELECT query_id, true_label, label FROM (
           SELECT query_id, true_label, label,
                  ROW_NUMBER() OVER (PARTITION BY query_id
                                     ORDER BY dot DESC, vec_id) AS rn
           FROM pairs) WHERE rn <= 5),
       votes AS (
         SELECT query_id, true_label, label, CAST(COUNT(*) AS BIGINT) AS c
         FROM knn GROUP BY 1, 2, 3)
       SELECT query_id, true_label, label AS pred_label, c AS n_votes,
              label = true_label AS correct
       FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                          ORDER BY c DESC, label) AS vr
             FROM votes) WHERE vr = 1""",
)
def emb_knn_classify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K3+ kNN LABEL EVALUATION — the quality loop every embedding
    pipeline closes (does the vector space actually predict the
    label?): the 50 lowest-key vectors are classified by majority vote
    of their 5 nearest neighbors (integer dot, self excluded; vote
    ties → lexicographically smallest label, distance ties → lowest
    id), each row reporting predicted vs true. Composes the sim_*
    search machinery into the metric a model-selection decision reads
    (leave-one-out accuracy). Scale: the query matrix ships in the
    task closure; the corpus pass is ONE mapInPandas int64 matmul per
    Arrow batch with per-batch local top-5 (query_sample_dot_topk —
    the pq_adc_topk two-phase discipline; the JVM HOF-dot formulation
    it replaced measured 38.8 s at sf5 vs 2.1 s), and the final
    window ranks batches·50·5 survivors — never corpus×corpus.
    Production swaps the exact scan for sim_ivfpq routing; this key
    is the ground-truth yardstick."""
    from varda_spark.operators.similarity import query_sample_dot_topk

    e = read_table(spark, sf_dir, "embeddings")
    knn = query_sample_dot_topk(
        e, n_queries=50, topk=5, key="vec_id", vec="embedding", scale=100,
        carry=("label",),
    )
    truth = (
        e.orderBy("vec_id")
        .limit(50)
        .select(
            F.col("vec_id").alias("query_id"), F.col("label").alias("true_label")
        )
    )
    votes = (
        knn.join(F.broadcast(truth), "query_id")
        .groupBy("query_id", "true_label", "label")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    wv = Window.partitionBy("query_id").orderBy(F.col("c").desc(), F.col("label"))
    return (
        votes.withColumn("vr", F.row_number().over(wv))
        .filter(F.col("vr") == 1)
        .select(
            "query_id", "true_label",
            F.col("label").alias("pred_label"),
            F.col("c").alias("n_votes"),
            (F.col("label") == F.col("true_label")).alias("correct"),
        )
    )


@q(
    "store_vacuum_plan",
    """WITH f AS (
         SELECT CAST(year(CAST(o_orderdate AS DATE)) * 100
                     + month(CAST(o_orderdate AS DATE)) AS BIGINT) AS ym,
                CAST(o_orderdate AS DATE) AS d,
                CAST(SUM(CAST(FLOOR(o_totalprice) AS BIGINT)) AS BIGINT) AS bytes
         FROM orders GROUP BY 1, 2),
       a AS (SELECT MAX(d) AS anchor FROM f),
       m AS (SELECT ym, d, bytes, MAX(d) OVER (PARTITION BY ym) AS latest_day
             FROM f),
       c AS (
         SELECT m.*, (d < CAST(anchor - INTERVAL 90 DAY AS DATE)
                      AND d <> latest_day) AS del
         FROM m CROSS JOIN a)
       SELECT ym, CAST(COUNT(*) AS BIGINT) AS n_files,
              CAST(SUM(CASE WHEN del THEN 1 ELSE 0 END) AS BIGINT) AS n_delete,
              CAST(SUM(CASE WHEN del THEN bytes ELSE 0 END) AS BIGINT)
                   AS bytes_reclaimed,
              MAX(latest_day) AS latest_day
       FROM c GROUP BY ym""",
)
def store_vacuum_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5+ retention VACUUM planner — the garbage-collection half of
    warehouse maintenance (store_compaction_plan packs small files;
    THIS decides what expires): day-grain "files" (the compaction
    key's byte stand-in) older than the 90-day retention horizon are
    marked deletable EXCEPT each month-partition's latest file, which
    is pinned as the snapshot anchor a time-travel read needs — the
    Delta/Iceberg VACUUM rule (age out, but never break the newest
    snapshot). The horizon anchors on MAX(data date), not wall-clock
    (the qa_freshness reproducibility discipline). Scale: one keyed
    agg, one per-month window (calendar-bounded), a 1-row anchor
    broadcast; the plan emits per partition the file count, deletable
    count and reclaimed bytes — the manifest the delete job executes."""
    o = read_table(spark, sf_dir, "orders")
    f = o.groupBy(
        (F.year("o_orderdate") * 100 + F.month("o_orderdate")).cast("bigint").alias("ym"),
        F.col("o_orderdate").cast("date").alias("d"),
    ).agg(F.sum(F.expr("CAST(FLOOR(o_totalprice) AS BIGINT)")).cast("bigint").alias("bytes"))
    a = f.agg(F.max("d").alias("anchor"))
    m = f.withColumn("latest_day", F.max("d").over(Window.partitionBy("ym")))
    c = m.crossJoin(F.broadcast(a)).withColumn(
        "del",
        (F.col("d") < F.date_sub("anchor", 90)) & (F.col("d") != F.col("latest_day")),
    )
    return c.groupBy("ym").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_files"),
        F.sum(F.when(F.col("del"), 1).otherwise(0)).cast("bigint").alias("n_delete"),
        F.sum(F.when(F.col("del"), F.col("bytes")).otherwise(0)).cast("bigint")
        .alias("bytes_reclaimed"),
        F.max("latest_day").alias("latest_day"),
    )


@q(
    "text_vocab_growth",
    """WITH tok AS (
         SELECT doc_id % 10 AS b, unnest(string_split(trim(text), ' ')) AS t
         FROM documents),
       occ AS (SELECT b, CAST(COUNT(*) AS BIGINT) AS n_occ FROM tok GROUP BY b),
       fs AS (
         SELECT fb AS b, CAST(COUNT(*) AS BIGINT) AS n_new FROM (
           SELECT t, MIN(b) AS fb FROM tok GROUP BY t) GROUP BY fb),
       dpb AS (SELECT doc_id % 10 AS b, CAST(COUNT(*) AS BIGINT) AS n_docs
               FROM documents GROUP BY 1),
       sp AS (
         SELECT dpb.b, dpb.n_docs, occ.n_occ, COALESCE(fs.n_new, 0) AS n_new
         FROM dpb JOIN occ ON dpb.b = occ.b LEFT JOIN fs ON dpb.b = fs.b)
       SELECT CAST(b AS BIGINT) AS bucket,
              CAST(SUM(n_docs) OVER (ORDER BY b ROWS UNBOUNDED PRECEDING)
                   AS BIGINT) AS docs_cum,
              CAST(SUM(n_occ) OVER (ORDER BY b ROWS UNBOUNDED PRECEDING)
                   AS BIGINT) AS tokens_cum,
              CAST(SUM(n_new) OVER (ORDER BY b ROWS UNBOUNDED PRECEDING)
                   AS BIGINT) AS vocab_cum
       FROM sp""",
)
def text_vocab_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K4+ VOCABULARY GROWTH curve (Heaps' law) — the tokenizer-budget
    question (how fast does the type count grow with corpus size?)
    answered the scalable way: corpus prefixes are HASH SHARDS
    (doc_id % 10 accumulating shard-by-shard), not a global document
    ordering — so "first seen in prefix b" is MIN(shard) per token,
    one keyed agg, and no global row-numbering of the corpus exists
    anywhere. Emits per prefix the cumulative docs, token occurrences
    and distinct vocabulary — the curve whose flattening says when a
    bigger tokenizer vocab stops paying. Scale: one tokenize/explode
    pass, two keyed aggs (token grain — the linear heavy part), and a
    10-row cumulative window (shard-count-bounded — whitelisted)."""
    d = read_table(spark, sf_dir, "documents")
    tok = d.select(
        (F.col("doc_id") % 10).alias("b"),
        F.explode(F.split(F.trim("text"), " ")).alias("t"),
    )
    occ = tok.groupBy("b").agg(F.count(F.lit(1)).cast("bigint").alias("n_occ"))
    fs = (
        tok.groupBy("t").agg(F.min("b").alias("fb"))
        .groupBy(F.col("fb").alias("b"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_new"))
    )
    dpb = d.groupBy((F.col("doc_id") % 10).alias("b")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs")
    )
    sp = (
        dpb.join(occ, "b")
        .join(fs, "b", "left")
        .select("b", "n_docs", "n_occ", F.coalesce("n_new", F.lit(0)).alias("n_new"))
    )
    w = Window.orderBy("b").rowsBetween(Window.unboundedPreceding, 0)
    return sp.select(
        F.col("b").cast("bigint").alias("bucket"),
        F.sum("n_docs").over(w).cast("bigint").alias("docs_cum"),
        F.sum("n_occ").over(w).cast("bigint").alias("tokens_cum"),
        F.sum("n_new").over(w).cast("bigint").alias("vocab_cum"),
    )


@q(
    "agg_gk_tau",
    """WITH cells AS (
         SELECT event_type AS x,
                CAST(FLOOR(value / 50) AS BIGINT) AS y,
                CAST(COUNT(*) AS BIGINT) AS c
         FROM events GROUP BY 1, 2),
       xm AS (
         SELECT x, SUM(CAST(c AS HUGEINT) * c) AS sx, SUM(c) AS nx
         FROM cells GROUP BY x),
       ym AS (
         SELECT y, SUM(c) AS ny FROM cells GROUP BY y),
       tot AS (
         SELECT (SELECT SUM(c) FROM cells) AS n,
                (SELECT CAST(COUNT(*) AS BIGINT) FROM xm) AS kx,
                (SELECT CAST(COUNT(*) AS BIGINT) FROM ym) AS ky,
                (SELECT SUM(sx * 1000000 // nx) FROM xm) AS a_xy,
                (SELECT SUM(CAST(ny AS HUGEINT) * ny) FROM ym) AS sy),
       rev AS (
         SELECT SUM(sy2 * 1000000 // ny2) AS a_yx FROM (
           SELECT y, SUM(CAST(c AS HUGEINT) * c) AS sy2, SUM(c) AS ny2
           FROM cells GROUP BY y)),
       xsq AS (
         SELECT SUM(CAST(nx AS HUGEINT) * nx) AS sxm FROM xm)
       SELECT CAST(n AS BIGINT) AS n, kx AS n_x, ky AS n_y,
              CAST((a_xy - sy * 1000000 // n) * 1000000
                   // (CAST(n AS HUGEINT) * 1000000 - sy * 1000000 // n)
                   AS BIGINT) AS tau_xy_ppm,
              CAST((a_yx - sxm * 1000000 // n) * 1000000
                   // (CAST(n AS HUGEINT) * 1000000 - sxm * 1000000 // n)
                   AS BIGINT) AS tau_yx_ppm
       FROM tot CROSS JOIN rev CROSS JOIN xsq""",
)
def agg_gk_tau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D+ GOODMAN–KRUSKAL TAU — the asymmetric categorical association
    measure (how much does knowing event_type reduce the error of
    proportionally predicting the value bucket, and vice versa) that
    agg_cramers_v's symmetric chi-square cannot give. Entirely in the
    Simpson/concentration algebra (squares and ratios — no float log,
    the agg_simpson discipline): tau = (Σ_x Σ_y c²/n_x − Σ_y n_y²/N) /
    (N − Σ_y n_y²/N), here ppm-QUANTIZED with a fixed truncating-
    division protocol (each /n_x term scaled by 1e6 then truncated —
    both engines run the identical integer protocol, so the quantized
    value is bit-exact; the quantization error is < |X| ppm,
    documented). Scale: ONE shuffle builds the |X|·|Y| contingency
    cells with map-side partials; everything after runs on the tiny
    cell table. Squares in HUGEINT/DECIMAL(38,0) — n²·1e6 exceeds
    int64 past ~3M rows."""
    e = read_table(spark, sf_dir, "events")
    cells = e.groupBy(
        F.col("event_type").alias("x"),
        F.expr("CAST(FLOOR(value / 50) AS BIGINT)").alias("y"),
    ).agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    big = "CAST(c AS DECIMAL(38,0))"
    xm = cells.groupBy("x").agg(
        F.expr(f"SUM({big} * c)").alias("sx"), F.sum("c").alias("nx")
    )
    ymt = cells.groupBy("y").agg(
        F.expr("SUM(CAST(c AS DECIMAL(38,0)) * c)").alias("sy2"),
        F.sum("c").alias("ny"),
    )
    a_xy = xm.agg(
        F.expr("SUM(sx * 1000000 DIV CAST(nx AS DECIMAL(38,0)))").alias("a_xy"),
        F.count(F.lit(1)).cast("bigint").alias("n_x"),
        F.expr("SUM(CAST(nx AS DECIMAL(38,0)) * nx)").alias("sxm"),
    )
    a_yx = ymt.agg(
        F.expr("SUM(sy2 * 1000000 DIV CAST(ny AS DECIMAL(38,0)))").alias("a_yx"),
        F.count(F.lit(1)).cast("bigint").alias("n_y"),
        F.expr("SUM(CAST(ny AS DECIMAL(38,0)) * ny)").alias("sy"),
    )
    n = cells.agg(F.sum("c").alias("n"))
    return (
        n.crossJoin(F.broadcast(a_xy))
        .crossJoin(F.broadcast(a_yx))
        .select(
            F.col("n").cast("bigint").alias("n"),
            "n_x",
            "n_y",
            F.expr(
                "CAST((a_xy - sy * 1000000 DIV CAST(n AS DECIMAL(38,0))) * 1000000"
                " DIV (CAST(n AS DECIMAL(38,0)) * 1000000"
                " - sy * 1000000 DIV CAST(n AS DECIMAL(38,0)))"
                " AS BIGINT)"
            ).alias("tau_xy_ppm"),
            F.expr(
                "CAST((a_yx - sxm * 1000000 DIV CAST(n AS DECIMAL(38,0))) * 1000000"
                " DIV (CAST(n AS DECIMAL(38,0)) * 1000000"
                " - sxm * 1000000 DIV CAST(n AS DECIMAL(38,0)))"
                " AS BIGINT)"
            ).alias("tau_yx_ppm"),
        )
    )


@q(
    "text_softdedup_weights",
    """WITH h AS (SELECT doc_id, md5(text) AS hash FROM documents),
       c AS (SELECT hash, CAST(COUNT(*) AS BIGINT) AS csize
             FROM h GROUP BY hash)
       SELECT h.doc_id, c.csize AS cluster_size,
              CAST(1000000 // c.csize AS BIGINT) AS weight_ppm
       FROM h JOIN c ON h.hash = c.hash""",
)
def text_softdedup_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K1+ SOFT deduplication (SoftDedup: reweight, don't remove — each
    exact-duplicate cluster keeps ALL members at loss weight 1/c, so
    no document is discarded but duplicated content contributes one
    document's worth of gradient): per doc, its content-hash cluster
    size and the ppm loss weight. The keep-or-drop alternatives are
    dedup_exact / dedup_keep_best; this is the third policy modern
    pretraining runs choose when near-boundary duplicates carry
    distinct metadata. Scale: one hash-groupBy (map-side partials) +
    one hash-keyed join back — both shuffles on the 32-char digest,
    uniform by construction (no skew: cluster sizes are small by
    definition of content hashing)."""
    d = read_table(spark, sf_dir, "documents")
    h = d.select("doc_id", F.md5(F.col("text").cast("binary")).alias("hash"))
    c = h.groupBy("hash").agg(F.count(F.lit(1)).cast("bigint").alias("csize"))
    return h.join(c, "hash").select(
        "doc_id",
        F.col("csize").alias("cluster_size"),
        F.expr("CAST(1000000 DIV csize AS BIGINT)").alias("weight_ppm"),
    )


def _kcenter_oracle(k: int = 8) -> str:
    """Unrolled greedy k-center as k chained CTEs (DuckDB lacks an
    argmax-per-iteration recursive form that is portable; k is a fixed
    small constant so the unroll is the honest twin). Distances use the
    proven list_zip + list_transform struct-index idiom."""

    def dist(a: str, b: str) -> str:
        return (
            f"list_aggregate(list_transform(list_zip({a}, {b}),"
            " s -> (s[1]-s[2])*(s[1]-s[2])), 'sum')"
        )

    parts = [
        "WITH qv AS (SELECT vec_id, list_transform(embedding,"
        " x -> CAST(floor(CAST(x AS DOUBLE) * 10000) AS BIGINT)) AS e"
        " FROM embeddings)",
        "c1 AS (SELECT vec_id, e FROM qv ORDER BY vec_id LIMIT 1)",
        f"d1 AS (SELECT qv.vec_id, qv.e, {dist('qv.e', 'c1.e')} AS md"
        " FROM qv CROSS JOIN c1)",
    ]
    for j in range(2, k + 1):
        parts.append(
            f"c{j} AS (SELECT vec_id, e, md FROM d{j-1}"
            " ORDER BY md DESC, vec_id LIMIT 1)"
        )
        if j < k:
            parts.append(
                f"d{j} AS (SELECT d.vec_id, d.e,"
                f" LEAST(d.md, {dist('d.e', f'c{j}.e')}) AS md"
                f" FROM d{j-1} d CROSS JOIN c{j})"
            )
    sel = [
        "SELECT CAST(1 AS BIGINT) AS step, vec_id,"
        " CAST(0 AS BIGINT) AS dist2 FROM c1"
    ]
    for j in range(2, k + 1):
        sel.append(f"SELECT CAST({j} AS BIGINT), vec_id, CAST(md AS BIGINT) FROM c{j}")
    return ",\n  ".join(parts) + "\n  " + "\n  UNION ALL ".join(sel)


@q("emb_kcenter_coreset", _kcenter_oracle(8))
def emb_kcenter_coreset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K3+ coreset / diversity selection — greedy k-center (Gonzalez
    1985 farthest-point traversal; Sener & Savarese ICLR 2018 pick
    training subsets with exactly this loop): the 8 maximally-spread
    embedding vectors, i.e. the anchor set a curation pipeline keeps
    when it wants coverage rather than density (the complement of
    emb_semantic_dedup, which removes the DENSE near-duplicates).
    Exactness: integer L2 squared on the floor(x*1e4) grid, ties to the
    lowest vec_id — both engines run the identical deterministic greedy.
    Scale: k-1 corpus scans, each one mapInPandas pass whose batches
    reduce to ONE (id, dist2, vec) candidate row before the wire
    (batch-local argmax of the min-distance; the <=k x dim center
    matrix ships in the closure), then a TakeOrdered over the per-batch
    survivors — driver state is k rows, never a pairwise materialization
    (operators/similarity.py kcenter_greedy)."""
    from varda_spark.operators.similarity import kcenter_greedy

    e = read_table(spark, sf_dir, "embeddings")
    return kcenter_greedy(e, k=8)


@q(
    "store_partition_skew",
    """WITH p AS (
         SELECT CAST(year(CAST(o_orderdate AS DATE)) * 100
                     + month(CAST(o_orderdate AS DATE)) AS BIGINT) AS ym,
                CAST(COUNT(*) AS BIGINT) AS n_rows
         FROM orders GROUP BY 1),
       r AS (
         SELECT ym, n_rows,
                CAST(ROW_NUMBER() OVER (ORDER BY n_rows, ym) AS HUGEINT) AS i,
                CAST(COUNT(*) OVER () AS BIGINT) AS n,
                CAST(SUM(n_rows) OVER () AS HUGEINT) AS t
         FROM p),
       s AS (
         SELECT CAST(MAX(n) AS BIGINT) AS n_partitions,
                CAST(MAX(t) AS BIGINT) AS total_rows,
                CAST(MIN(n_rows) AS BIGINT) AS min_rows,
                CAST(MAX(n_rows) AS BIGINT) AS max_rows,
                CAST(MAX(CASE WHEN i = (n + 1) // 2 THEN n_rows END) AS BIGINT)
                  AS p50_rows,
                SUM(i * n_rows) AS s_rank
         FROM r)
       SELECT n_partitions, total_rows, min_rows, max_rows, p50_rows,
              CAST(CAST(max_rows AS HUGEINT) * 1000000 // p50_rows AS BIGINT)
                AS skew_ppm,
              CAST((2 * s_rank - (CAST(n_partitions AS HUGEINT) + 1) * total_rows)
                   * 1000000
                   // (CAST(n_partitions AS HUGEINT) * total_rows) AS BIGINT)
                AS gini_ppm
       FROM s""",
)
def store_partition_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5+ partition-size skew audit — the input a repartitioning /
    salting decision reads: per month-partition row counts summarized as
    max/median skew ratio and the Gini concentration of partition sizes
    (straggler risk in one number; a balanced layout reads ~0 ppm, one
    hot partition drives it toward 1e6). Exactness: the median is the
    deterministic LOWER median (rank (n+1)//2 under (n_rows, ym) order)
    and the Gini uses the exact rank formula (2*sum(i*x) - (n+1)*total)
    / (n*total) in HUGEINT/DECIMAL(38,0), ppm-truncated — no float.
    Scale: one keyed agg with map-side partials builds the month table;
    every window after runs over the CALENDAR-BOUNDED partition list
    (~80 rows at any sf — whitelisted one-task window, the
    store_compaction_plan argument)."""
    o = read_table(spark, sf_dir, "orders")
    p = o.groupBy(
        F.expr(
            "CAST(year(CAST(o_orderdate AS DATE)) * 100"
            " + month(CAST(o_orderdate AS DATE)) AS BIGINT)"
        ).alias("ym")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n_rows"))
    D = "DECIMAL(38,0)"
    w = Window.orderBy("n_rows", "ym")
    wall = Window.partitionBy()
    r = p.select(
        "n_rows",
        F.row_number().over(w).cast("bigint").alias("i"),
        F.count(F.lit(1)).over(wall).cast("bigint").alias("n"),
        F.sum("n_rows").over(wall).cast("bigint").alias("t"),
    )
    s = r.agg(
        F.max("n").cast("bigint").alias("n_partitions"),
        F.max("t").cast("bigint").alias("total_rows"),
        F.min("n_rows").cast("bigint").alias("min_rows"),
        F.max("n_rows").cast("bigint").alias("max_rows"),
        F.expr("CAST(MAX(CASE WHEN i = (n + 1) DIV 2 THEN n_rows END) AS BIGINT)")
        .alias("p50_rows"),
        F.expr(f"SUM(CAST(i AS {D}) * n_rows)").alias("s_rank"),
    )
    return s.select(
        "n_partitions",
        "total_rows",
        "min_rows",
        "max_rows",
        "p50_rows",
        F.expr(
            f"CAST(CAST(max_rows AS {D}) * 1000000 DIV p50_rows AS BIGINT)"
        ).alias("skew_ppm"),
        F.expr(
            f"CAST((2 * s_rank - (CAST(n_partitions AS {D}) + 1) * total_rows)"
            f" * 1000000 DIV (CAST(n_partitions AS {D}) * total_rows) AS BIGINT)"
        ).alias("gini_ppm"),
    )


@q(
    "store_cluster_advisor",
    """WITH o AS (
         SELECT CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT)
                  AS vdate,
                CAST(o_custkey AS BIGINT) AS vkey,
                CAST(CAST(o_totalprice AS DECIMAL(18,4)) * 100 AS BIGINT)
                  AS vcents,
                CAST(year(CAST(o_orderdate AS DATE)) * 12
                     + month(CAST(o_orderdate AS DATE)) AS BIGINT) AS m
         FROM orders),
       u AS (
         SELECT 'date' AS cand, vdate AS v, m FROM o
         UNION ALL SELECT 'custkey', vkey, m FROM o
         UNION ALL SELECT 'price', vcents, m FROM o),
       mm AS (SELECT cand, MIN(v) AS vmin, MAX(v) AS vmax FROM u GROUP BY cand),
       fl AS (
         SELECT u.cand,
                CAST((u.v - mm.vmin) * 20 // (mm.vmax - mm.vmin + 1) AS BIGINT)
                  AS file_id,
                u.m
         FROM u JOIN mm ON u.cand = mm.cand),
       f AS (SELECT cand, file_id, MIN(m) AS mlo, MAX(m) AS mhi
             FROM fl GROUP BY cand, file_id),
       mo AS (SELECT m, CAST(ROW_NUMBER() OVER (ORDER BY m) AS BIGINT) AS r
              FROM (SELECT DISTINCT m FROM o)),
       ov AS (
         SELECT f.cand, CAST(COUNT(*) AS BIGINT) AS n_files,
                CAST(SUM(hi.r - lo.r + 1) AS BIGINT) AS files_read
         FROM f JOIN mo lo ON f.mlo = lo.m JOIN mo hi ON f.mhi = hi.m
         GROUP BY f.cand),
       nq AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_queries FROM mo)
       SELECT cand, n_files, n_queries, files_read,
              CAST(files_read * 1000000 // (n_queries * n_files) AS BIGINT)
                AS avg_files_read_ppm
       FROM ov CROSS JOIN nq""",
)
def store_cluster_advisor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5+ sort-order / clustering advisor — which sort key should the
    writer cluster on? For each candidate (order date, customer key,
    order value in cents) the key simulates a 20-file equal-width
    range-partitioned layout, records each file's month zone map
    (min/max month actually landing in the file), and scores the
    monthly-predicate workload: how many files must a month query read,
    as ppm of files x queries. Date-clustered reads ~5% (one file per
    month); key- or value-clustered layouts read 100% — the number that
    justifies re-clustering before a 100 TB scan-heavy workload (the
    decision half of store_zone_map_skip's audit). Exactness: file ids
    by integer width bucketing ((v-min)*20 DIV (range+1)), overlap
    counted by month-RANK difference (both span endpoints are observed
    months by construction, so the equi-joins are exact) — no float.
    Scale: the 3x stack explodes once (one scan), files build in one
    keyed agg; the month spine (~80 rows, calendar-bounded rank window,
    whitelisted) broadcasts into equi-joins; the final 1-row n_queries
    scalar is a broadcast cross join (whitelisted BNLJ)."""
    o = read_table(spark, sf_dir, "orders").select(
        F.expr(
            "CAST(datediff(CAST(o_orderdate AS DATE), DATE '1970-01-01')"
            " AS BIGINT)"
        ).alias("vdate"),
        F.col("o_custkey").cast("bigint").alias("vkey"),
        F.expr("CAST(CAST(o_totalprice AS DECIMAL(18,4)) * 100 AS BIGINT)").alias(
            "vcents"
        ),
        F.expr(
            "CAST(year(CAST(o_orderdate AS DATE)) * 12"
            " + month(CAST(o_orderdate AS DATE)) AS BIGINT)"
        ).alias("m"),
    )
    u = o.selectExpr(
        "stack(3, 'date', vdate, 'custkey', vkey, 'price', vcents) AS (cand, v)",
        "m",
    )
    mm = u.groupBy("cand").agg(F.min("v").alias("vmin"), F.max("v").alias("vmax"))
    fl = u.join(F.broadcast(mm), "cand").select(
        "cand",
        F.expr("CAST((v - vmin) * 20 DIV (vmax - vmin + 1) AS BIGINT)").alias(
            "file_id"
        ),
        "m",
    )
    f = fl.groupBy("cand", "file_id").agg(
        F.min("m").alias("mlo"), F.max("m").alias("mhi")
    )
    mo = (
        o.select("m")
        .distinct()
        .withColumn("r", F.row_number().over(Window.orderBy("m")).cast("bigint"))
    )
    lo = mo.select(F.col("m").alias("mlo"), F.col("r").alias("rlo"))
    hi = mo.select(F.col("m").alias("mhi"), F.col("r").alias("rhi"))
    ov = (
        f.join(F.broadcast(lo), "mlo")
        .join(F.broadcast(hi), "mhi")
        .groupBy("cand")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_files"),
            F.sum(F.expr("rhi - rlo + 1")).cast("bigint").alias("files_read"),
        )
    )
    nq = mo.agg(F.count(F.lit(1)).cast("bigint").alias("n_queries"))
    return (
        ov.crossJoin(F.broadcast(nq))
        .select(
            "cand",
            "n_files",
            "n_queries",
            "files_read",
            F.expr(
                "CAST(files_read * 1000000 DIV (n_queries * n_files) AS BIGINT)"
            ).alias("avg_files_read_ppm"),
        )
    )


@q(
    "text_domain_score",
    """WITH tok AS (
         SELECT doc_id, unnest(list_distinct(string_split(trim(text), ' '))) AS t
         FROM documents WHERE lang = 'en'),
       df AS (SELECT t, CAST(COUNT(*) AS BIGINT) AS df FROM tok GROUP BY t),
       seed AS (SELECT t FROM df ORDER BY df DESC, t LIMIT 50),
       a AS (
         SELECT doc_id, unnest(list_distinct(string_split(trim(text), ' '))) AS t
         FROM documents),
       h AS (
         SELECT a.doc_id, CAST(COUNT(s.t) AS BIGINT) AS seed_hits
         FROM a LEFT JOIN seed s ON a.t = s.t GROUP BY a.doc_id),
       nd AS (
         SELECT doc_id,
                CAST(len(list_distinct(string_split(trim(text), ' '))) AS BIGINT)
                  AS n_distinct
         FROM documents)
       SELECT nd.doc_id, nd.n_distinct, h.seed_hits,
              CAST(h.seed_hits * 1000000 // nd.n_distinct AS BIGINT) AS score_ppm
       FROM nd JOIN h ON nd.doc_id = h.doc_id""",
)
def text_domain_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K4+ target-domain importance scoring (the DSIR idea, Xie et al.
    2023, with hashed-ngram features reduced to the seed-vocabulary
    membership its importance weights rank by): score every document by
    its distinct-token overlap with the 50 highest-document-frequency
    tokens of the TARGET domain (here lang='en' stands in for the
    curated seed corpus) — the cheap first-pass filter that decides
    which of 100 TB of crawl even reaches quality scoring. Exactness:
    seed set is deterministic (df DESC, token ASC, exact integer
    counts); per-doc score is distinct-hit count ppm of distinct
    tokens, truncating DIV. Scale: seed fits in one TakeOrdered(50) and
    ships as a 1-row broadcast array; scoring is then ONE scan with
    array_intersect in codegen — no explode join on the big side, no
    shuffle after the seed build."""
    d = read_table(spark, sf_dir, "documents")
    toks = F.array_distinct(F.split(F.trim(F.col("text")), r"\s+"))
    en = d.filter(F.col("lang") == "en").select(F.explode(toks).alias("t"))
    seed = (
        en.groupBy("t")
        .agg(F.count(F.lit(1)).alias("df"))
        .orderBy(F.col("df").desc(), F.col("t").asc())
        .limit(50)
        .agg(F.collect_list("t").alias("seed"))
    )
    return (
        d.select("doc_id", toks.alias("ts"))
        .crossJoin(F.broadcast(seed))
        .select(
            "doc_id",
            F.size("ts").cast("bigint").alias("n_distinct"),
            F.size(F.array_intersect("ts", "seed")).cast("bigint").alias("seed_hits"),
        )
        .withColumn(
            "score_ppm", F.expr("CAST(seed_hits * 1000000 DIV n_distinct AS BIGINT)")
        )
    )


_W32 = [1 << (31 - i) for i in range(32)]


@q(
    "sim_hamming_topk",
    f"""WITH w AS (
         SELECT vec_id,
                list_aggregate(list_transform(
                    list_zip(embedding[1:32], {_W32}),
                    s -> CASE WHEN CAST(s[1] AS DOUBLE) >= 0
                         THEN s[2] ELSE 0 END), 'sum') AS w1,
                list_aggregate(list_transform(
                    list_zip(embedding[33:64], {_W32}),
                    s -> CASE WHEN CAST(s[1] AS DOUBLE) >= 0
                         THEN s[2] ELSE 0 END), 'sum') AS w2
         FROM embeddings),
       qs AS (SELECT vec_id AS query_id, w1 AS q1, w2 AS q2
              FROM w ORDER BY vec_id LIMIT 5),
       d AS (
         SELECT qs.query_id, w.vec_id,
                CAST(bit_count(xor(w.w1, qs.q1))
                     + bit_count(xor(w.w2, qs.q2)) AS BIGINT) AS hamming
         FROM w CROSS JOIN qs WHERE w.vec_id != qs.query_id),
       r AS (
         SELECT query_id, vec_id, hamming,
                CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                     ORDER BY hamming, vec_id) AS BIGINT) AS rank
         FROM d)
       SELECT query_id, rank, vec_id, hamming FROM r WHERE rank <= 3""",
)
def sim_hamming_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K3+ binary-embedding ANN (sign hashing a la Charikar 2002 SimHash
    for vectors / 'binary embeddings' in production vector stores): each
    64-dim vector compresses to TWO int64 words of sign bits (8 bytes a
    vector — even smaller than PQ codes), and search is Hamming top-k =
    bit_count(xor) in whole-stage codegen, no arithmetic on the floats
    at query time. The sign test is the only float op and involves no
    arithmetic, so both engines agree bit-exactly; packing is an
    order-independent weighted SUM of bits (no sequential fold). Scale:
    encode is one scan; the 5-query probe table broadcasts (whitelisted
    tiny BNLJ fan-out, 5x rows); top-3 is TWO-PHASE — a (query, vec_id
    mod 64)-salted window takes local top-3, the final window ranks only
    the <= 5*64*3 survivors — so no single task ever sees a full
    query's candidate list (the query_sample_dot_topk discipline in
    pure DataFrame ops)."""
    e = read_table(spark, sf_dir, "embeddings")
    lits = ", ".join(str(x) for x in _W32)

    def word(lo: int) -> str:
        return (
            f"aggregate(zip_with(slice(embedding, {lo}, 32), array({lits}),"
            " (x, p) -> CASE WHEN CAST(x AS DOUBLE) >= 0"
            " THEN p ELSE CAST(0 AS BIGINT) END),"
            " CAST(0 AS BIGINT), (acc, v) -> acc + v)"
        )

    w = e.select(
        "vec_id", F.expr(word(1)).alias("w1"), F.expr(word(33)).alias("w2")
    )
    qs = (
        w.orderBy("vec_id")
        .limit(5)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("w1").alias("q1"),
            F.col("w2").alias("q2"),
        )
    )
    d = (
        w.crossJoin(F.broadcast(qs))
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            "vec_id",
            F.expr(
                "CAST(bit_count(w1 ^ q1) + bit_count(w2 ^ q2) AS BIGINT)"
            ).alias("hamming"),
            F.expr("pmod(vec_id, 64)").alias("_salt"),
        )
    )
    w1 = Window.partitionBy("query_id", "_salt").orderBy("hamming", "vec_id")
    local = d.withColumn("_r", F.row_number().over(w1)).filter(F.col("_r") <= 3)
    w2_ = Window.partitionBy("query_id").orderBy("hamming", "vec_id")
    return (
        local.withColumn("rank", F.row_number().over(w2_).cast("bigint"))
        .filter(F.col("rank") <= 3)
        .select("query_id", "rank", "vec_id", "hamming")
    )


@q(
    "agg_diff_in_diff",
    """WITH j AS (
         SELECT CASE WHEN c.c_mktsegment = 'BUILDING' THEN 1 ELSE 0 END AS treat,
                CASE WHEN o.o_orderdate >= TIMESTAMP '1998-01-01'
                     THEN 1 ELSE 0 END AS post,
                CAST(CAST(o.o_totalprice AS DECIMAL(18,4)) * 100 AS BIGINT)
                  AS cents
         FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey),
       g AS (
         SELECT treat, post, CAST(SUM(CAST(cents AS HUGEINT)) AS HUGEINT) AS s,
                CAST(COUNT(*) AS BIGINT) AS n
         FROM j GROUP BY treat, post),
       m AS (
         SELECT CAST(MAX(CASE WHEN treat = 1 AND post = 1 THEN n END) AS BIGINT)
                  AS n11,
                CAST(MAX(CASE WHEN treat = 1 AND post = 0 THEN n END) AS BIGINT)
                  AS n10,
                CAST(MAX(CASE WHEN treat = 0 AND post = 1 THEN n END) AS BIGINT)
                  AS n01,
                CAST(MAX(CASE WHEN treat = 0 AND post = 0 THEN n END) AS BIGINT)
                  AS n00,
                CAST(MAX(CASE WHEN treat = 1 AND post = 1
                          THEN s * 1000 // n END) AS BIGINT) AS m11,
                CAST(MAX(CASE WHEN treat = 1 AND post = 0
                          THEN s * 1000 // n END) AS BIGINT) AS m10,
                CAST(MAX(CASE WHEN treat = 0 AND post = 1
                          THEN s * 1000 // n END) AS BIGINT) AS m01,
                CAST(MAX(CASE WHEN treat = 0 AND post = 0
                          THEN s * 1000 // n END) AS BIGINT) AS m00
         FROM g)
       SELECT n11, n10, n01, n00, m11, m10, m01, m00,
              (m11 - m10) - (m01 - m00) AS did_millicents
       FROM m""",
)
def agg_diff_in_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D+ difference-in-differences estimator (Card & Krueger 1994 —
    THE quasi-experimental workhorse): effect of the post-1998 period on
    BUILDING-segment customers' mean order value, net of the secular
    trend in the other segments — (treated post - pre) minus (control
    post - pre). Exactness: the four cell means are milli-cent-quantized
    with the shared truncating-division protocol (HUGEINT /
    DECIMAL(38,0), both engines truncate toward zero — proven signed),
    so the estimator is an exact integer. Scale: one custkey equi-join
    (segment is a dimension attribute) + ONE 4-cell keyed agg with
    map-side partials; everything after is a 1-row reshape."""
    o = read_table(spark, sf_dir, "orders")
    c = read_table(spark, sf_dir, "customer")
    D = "DECIMAL(38,0)"
    j = o.join(c, o.o_custkey == c.c_custkey).select(
        F.expr("CASE WHEN c_mktsegment = 'BUILDING' THEN 1 ELSE 0 END").alias(
            "treat"
        ),
        F.expr(
            "CASE WHEN o_orderdate >= TIMESTAMP '1998-01-01' THEN 1 ELSE 0 END"
        ).alias("post"),
        F.expr("CAST(CAST(o_totalprice AS DECIMAL(18,4)) * 100 AS BIGINT)").alias(
            "cents"
        ),
    )
    g = j.groupBy("treat", "post").agg(
        F.expr(f"SUM(CAST(cents AS {D}))").alias("s"),
        F.count(F.lit(1)).cast("bigint").alias("n"),
    )
    cells = []
    for t, p, tag in ((1, 1, "11"), (1, 0, "10"), (0, 1, "01"), (0, 0, "00")):
        cells.append(
            F.expr(
                f"CAST(MAX(CASE WHEN treat = {t} AND post = {p} THEN n END)"
                " AS BIGINT)"
            ).alias(f"n{tag}")
        )
    for t, p, tag in ((1, 1, "11"), (1, 0, "10"), (0, 1, "01"), (0, 0, "00")):
        cells.append(
            F.expr(
                f"CAST(MAX(CASE WHEN treat = {t} AND post = {p}"
                " THEN s * 1000 DIV n END) AS BIGINT)"
            ).alias(f"m{tag}")
        )
    return g.agg(*cells).withColumn(
        "did_millicents", F.expr("(m11 - m10) - (m01 - m00)")
    )


@q(
    "agg_price_elasticity",
    """WITH mth AS (
         SELECT CAST(year(CAST(l_shipdate AS DATE)) * 12
                     + month(CAST(l_shipdate AS DATE)) AS BIGINT) AS m,
                CAST(SUM(CAST(CAST(l_quantity AS DECIMAL(18,4)) AS BIGINT))
                     AS BIGINT) AS q_units,
                CAST(SUM(CAST(CAST(CAST(l_extendedprice AS DECIMAL(18,4)) * 100
                     AS BIGINT) AS HUGEINT)) AS HUGEINT) AS r_cents
         FROM lineitem GROUP BY 1),
       pm AS (
         SELECT m, q_units,
                CAST(r_cents * 1000 // q_units AS BIGINT) AS p_milli
         FROM mth),
       lg AS (
         SELECT m, q_units, p_milli,
                LAG(q_units) OVER (ORDER BY m) AS qp,
                LAG(p_milli) OVER (ORDER BY m) AS pp
         FROM pm)
       SELECT m, q_units, p_milli,
              CAST(CAST((q_units - qp) AS HUGEINT) * (p_milli + pp) * 1000000
                   // ((p_milli - pp) * CAST((q_units + qp) AS HUGEINT))
                   AS BIGINT) AS elasticity_ppm
       FROM lg WHERE qp IS NOT NULL AND p_milli != pp""",
)
def agg_price_elasticity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D+ arc price elasticity of demand (the midpoint formula —
    %change in quantity over %change in unit price between consecutive
    ship months), the econ analytics twin of win_dod_growth: per month,
    units shipped, milli-cent unit price (revenue DIV units), and
    elasticity vs the prior month. No float: the midpoint ratio
    ((dQ*(P1+P2)) / (dP*(Q1+Q2))) is computed ppm-quantized entirely in
    HUGEINT/DECIMAL(38,0) with the shared signed truncating division;
    months where the unit price did not move are excluded (undefined
    elasticity) rather than emitted as NULL. Scale: one keyed agg with
    map-side partials builds the month table; the LAG window runs over
    the CALENDAR-BOUNDED ~80-row month list (whitelisted one-task
    window, the store_partition_skew argument)."""
    li = read_table(spark, sf_dir, "lineitem")
    D = "DECIMAL(38,0)"
    mth = li.groupBy(
        F.expr(
            "CAST(year(CAST(l_shipdate AS DATE)) * 12"
            " + month(CAST(l_shipdate AS DATE)) AS BIGINT)"
        ).alias("m")
    ).agg(
        F.expr(
            "CAST(SUM(CAST(CAST(l_quantity AS DECIMAL(18,4)) AS BIGINT))"
            " AS BIGINT)"
        ).alias("q_units"),
        F.expr(
            "SUM(CAST(CAST(CAST(l_extendedprice AS DECIMAL(18,4)) * 100"
            f" AS BIGINT) AS {D}))"
        ).alias("r_cents"),
    )
    pm = mth.select(
        "m",
        "q_units",
        F.expr("CAST(r_cents * 1000 DIV q_units AS BIGINT)").alias("p_milli"),
    )
    w = Window.orderBy("m")
    lg = pm.select(
        "m",
        "q_units",
        "p_milli",
        F.lag("q_units").over(w).alias("qp"),
        F.lag("p_milli").over(w).alias("pp"),
    )
    return lg.filter(F.col("qp").isNotNull() & (F.col("p_milli") != F.col("pp"))).select(
        "m",
        "q_units",
        "p_milli",
        F.expr(
            f"CAST(CAST((q_units - qp) AS {D}) * (p_milli + pp) * 1000000"
            f" DIV ((p_milli - pp) * CAST((q_units + qp) AS {D})) AS BIGINT)"
        ).alias("elasticity_ppm"),
    )


@q(
    "agg_shapley_attribution",
    """WITH u AS (
         SELECT user_id,
                bit_or(CASE event_type WHEN 'view' THEN 1 WHEN 'click' THEN 2
                       WHEN 'signup' THEN 4 WHEN 'error' THEN 8 ELSE 0 END)
                  AS mask,
                MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS conv
         FROM events GROUP BY user_id),
       um AS (
         SELECT mask, CAST(COUNT(*) AS BIGINT) AS cu
         FROM u WHERE conv = 1 AND mask != 0 GROUP BY mask),
       sp AS (SELECT unnest(range(0, 16)) AS s),
       v AS (
         SELECT sp.s, CAST(SUM(COALESCE(um.cu, 0)) AS BIGINT) AS vv
         FROM sp LEFT JOIN um ON (um.mask & sp.s) = um.mask
         GROUP BY sp.s),
       ch AS (SELECT * FROM (VALUES ('view', 1), ('click', 2),
              ('signup', 4), ('error', 8)) AS t(channel, bit)),
       sh AS (
         SELECT ch.channel, ch.bit,
                SUM((CASE bit_count(CAST(v0.s AS BIGINT))
                     WHEN 0 THEN 6 WHEN 1 THEN 2 WHEN 2 THEN 2 ELSE 6 END)
                    * (v1.vv - v0.vv)) AS shapley_scaled
         FROM ch JOIN v v0 ON (v0.s & ch.bit) = 0
                 JOIN v v1 ON v1.s = v0.s + ch.bit
         GROUP BY ch.channel, ch.bit),
       tot AS (SELECT vv AS total_conv FROM v WHERE s = 15)
       SELECT channel, CAST(bit AS BIGINT) AS bit,
              CAST(shapley_scaled AS BIGINT) AS shapley_scaled,
              CAST(total_conv AS BIGINT) AS total_conv,
              CAST(COALESCE(shapley_scaled * 1000000
                   // NULLIF(24 * total_conv, 0), 0) AS BIGINT) AS shapley_ppm
       FROM sh CROSS JOIN tot""",
)
def agg_shapley_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D+ EXACT Shapley-value marketing attribution (Shapley 1953; the
    game-theoretic answer to win_attribution's first/last-touch rules):
    each non-purchase channel's fair share of converting users, where
    the coalition value v(S) counts converting users whose touched
    channel set fits inside S. With 4 channels the full 2^4 lattice is
    enumerable, so this is the exact Shapley sum (weights k!(3-k)! over
    a common /4! denominator — pure integers; the efficiency axiom
    sum_i phi_i = v(full) holds exactly and is asserted in pytest), not
    a sampling approximation. Scale: the corpus-sized work is ONE
    user-keyed agg (bit_or mask + conversion flag, map-side partials);
    everything after runs on the <=15-row mask rollup joined against a
    16-row subset spine (whitelisted tiny BNLJ). At 100 TB attribution
    cost is the user rollup, exactly as it should be."""
    e = read_table(spark, sf_dir, "events")
    u = e.groupBy("user_id").agg(
        F.expr(
            "bit_or(CASE event_type WHEN 'view' THEN 1 WHEN 'click' THEN 2"
            " WHEN 'signup' THEN 4 WHEN 'error' THEN 8 ELSE 0 END)"
        ).alias("mask"),
        F.expr(
            "MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)"
        ).alias("conv"),
    )
    um = (
        u.filter("conv = 1 AND mask != 0")
        .groupBy("mask")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cu"))
    )
    sp = spark.range(0, 16).select(F.col("id").alias("s"))
    v = (
        sp.join(F.broadcast(um), F.expr("(mask & s) = mask"), "left")
        .groupBy("s")
        .agg(F.expr("CAST(SUM(COALESCE(cu, 0)) AS BIGINT)").alias("vv"))
    )
    ch = spark.createDataFrame(
        [("view", 1), ("click", 2), ("signup", 4), ("error", 8)],
        "channel string, bit bigint",
    )
    v0 = v.select(F.col("s").alias("s0"), F.col("vv").alias("vv0"))
    v1 = v.select(F.col("s").alias("s1"), F.col("vv").alias("vv1"))
    sh = (
        ch.join(F.broadcast(v0), F.expr("(s0 & bit) = 0"))
        .join(F.broadcast(v1), F.expr("s1 = s0 + bit"))
        .groupBy("channel", "bit")
        .agg(
            F.expr(
                "SUM((CASE bit_count(s0) WHEN 0 THEN 6 WHEN 1 THEN 2"
                " WHEN 2 THEN 2 ELSE 6 END) * (vv1 - vv0))"
            ).alias("shapley_scaled")
        )
    )
    tot = v.filter("s = 15").select(F.col("vv").alias("total_conv"))
    return sh.crossJoin(F.broadcast(tot)).select(
        "channel",
        F.col("bit").cast("bigint").alias("bit"),
        F.col("shapley_scaled").cast("bigint").alias("shapley_scaled"),
        F.col("total_conv").cast("bigint").alias("total_conv"),
        F.expr(
            "CAST(COALESCE(shapley_scaled * 1000000"
            " DIV NULLIF(24 * total_conv, 0), 0) AS BIGINT)"
        ).alias("shapley_ppm"),
    )


@q(
    "freq_tdt",
    """WITH obs AS (
         SELECT l_suppkey AS sample_id,
                CAST(l_partkey % 5 AS VARCHAR) AS chromosome,
                CAST(l_partkey * 31 + 1 AS BIGINT) AS position,
                CASE WHEN l_linenumber % 3 = 0 THEN 2
                     WHEN l_linenumber % 3 = 1 THEN 1 END AS gt
         FROM lineitem WHERE l_linenumber % 3 <> 2),
       g AS (
         SELECT sample_id, chromosome, position, CAST(MAX(gt) AS BIGINT) AS gt
         FROM obs GROUP BY sample_id, chromosome, position),
       child AS (
         SELECT sample_id, chromosome, position, gt AS cgt
         FROM g WHERE sample_id % 3 = 0),
       j AS (
         SELECT c.chromosome, c.position, c.cgt,
                COALESCE(f.gt, 0) AS fgt, COALESCE(m.gt, 0) AS mgt
         FROM child c
         LEFT JOIN g f ON f.sample_id = c.sample_id - 2
                      AND f.chromosome = c.chromosome AND f.position = c.position
         LEFT JOIN g m ON m.sample_id = c.sample_id - 1
                      AND m.chromosome = c.chromosome AND m.position = c.position),
       k AS (
         SELECT chromosome, position,
                (CASE WHEN fgt = 1 THEN 1 ELSE 0 END
                 + CASE WHEN mgt = 1 THEN 1 ELSE 0 END) AS h,
                cgt - (CASE WHEN fgt = 2 THEN 1 ELSE 0 END
                       + CASE WHEN mgt = 2 THEN 1 ELSE 0 END) AS b
         FROM j
         WHERE cgt >= (CASE WHEN fgt = 2 THEN 1 ELSE 0 END
                       + CASE WHEN mgt = 2 THEN 1 ELSE 0 END)
           AND cgt <= (CASE WHEN fgt >= 1 THEN 1 ELSE 0 END
                       + CASE WHEN mgt >= 1 THEN 1 ELSE 0 END)),
       s AS (
         SELECT chromosome, position,
                CAST(SUM(b) AS BIGINT) AS b,
                CAST(SUM(h - b) AS BIGINT) AS c,
                CAST(SUM(h) AS BIGINT) AS n_informative
         FROM k GROUP BY chromosome, position)
       SELECT chromosome, position, b, c, n_informative,
              CAST(CAST((b - c) AS HUGEINT) * (b - c) * 1000000
                   // n_informative AS BIGINT) AS tdt_chi2_ppm
       FROM s WHERE n_informative > 0""",
)
def freq_tdt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Varda-domain transmission disequilibrium test (Spielman et al.
    1993) per site: within Mendelian-CONSISTENT trios (freq_trio_mendel's
    transmission-interval filter — TDT excludes Mendel errors by
    definition), the alt-allele transmissions from heterozygous parents
    are b = child dosage minus the hom-alt parents' forced contribution
    and c = (het parents) - b, both exact integers; the McNemar-form TDT
    statistic (b-c)^2/(b+c) is emitted ppm-quantized (HUGEINT /
    DECIMAL(38,0) interior). The family-based association test that is
    immune to population stratification — the reason trios are collected
    at all. Scale: same shape as freq_trio_mendel (one genotype dedup,
    two site-keyed left joins sharing the (chromosome, position)
    shuffle, one site-keyed agg with map-side partials)."""
    li = read_table(spark, sf_dir, "lineitem")
    obs = li.filter(F.expr("l_linenumber % 3 <> 2")).select(
        F.col("l_suppkey").alias("sample_id"),
        F.expr("CAST(l_partkey % 5 AS STRING)").alias("chromosome"),
        F.expr("CAST(l_partkey * 31 + 1 AS BIGINT)").alias("position"),
        F.expr(
            "CASE WHEN l_linenumber % 3 = 0 THEN 2"
            " WHEN l_linenumber % 3 = 1 THEN 1 END"
        ).alias("gt"),
    )
    g = obs.groupBy("sample_id", "chromosome", "position").agg(
        F.max("gt").cast("bigint").alias("gt")
    )
    child = g.filter("sample_id % 3 = 0").select(
        "sample_id", "chromosome", "position", F.col("gt").alias("cgt")
    )
    f = g.select(
        F.col("sample_id").alias("f_id"),
        F.col("chromosome").alias("f_chr"),
        F.col("position").alias("f_pos"),
        F.col("gt").alias("f_gt"),
    )
    m = g.select(
        F.col("sample_id").alias("m_id"),
        F.col("chromosome").alias("m_chr"),
        F.col("position").alias("m_pos"),
        F.col("gt").alias("m_gt"),
    )
    j = (
        child.join(
            f,
            (F.col("f_id") == F.col("sample_id") - 2)
            & (F.col("f_chr") == F.col("chromosome"))
            & (F.col("f_pos") == F.col("position")),
            "left",
        )
        .join(
            m,
            (F.col("m_id") == F.col("sample_id") - 1)
            & (F.col("m_chr") == F.col("chromosome"))
            & (F.col("m_pos") == F.col("position")),
            "left",
        )
        .select(
            "chromosome",
            "position",
            "cgt",
            F.coalesce(F.col("f_gt"), F.lit(0)).alias("fgt"),
            F.coalesce(F.col("m_gt"), F.lit(0)).alias("mgt"),
        )
    )
    hom = "(CASE WHEN fgt = 2 THEN 1 ELSE 0 END + CASE WHEN mgt = 2 THEN 1 ELSE 0 END)"
    cap = "(CASE WHEN fgt >= 1 THEN 1 ELSE 0 END + CASE WHEN mgt >= 1 THEN 1 ELSE 0 END)"
    k = j.filter(F.expr(f"cgt >= {hom} AND cgt <= {cap}")).select(
        "chromosome",
        "position",
        F.expr(
            "(CASE WHEN fgt = 1 THEN 1 ELSE 0 END"
            " + CASE WHEN mgt = 1 THEN 1 ELSE 0 END)"
        ).alias("h"),
        F.expr(f"cgt - {hom}").alias("b"),
    )
    s = k.groupBy("chromosome", "position").agg(
        F.sum("b").cast("bigint").alias("b"),
        F.expr("CAST(SUM(h - b) AS BIGINT)").alias("c"),
        F.sum("h").cast("bigint").alias("n_informative"),
    )
    return s.filter("n_informative > 0").select(
        "chromosome",
        "position",
        "b",
        "c",
        "n_informative",
        F.expr(
            "CAST(CAST((b - c) AS DECIMAL(38,0)) * (b - c) * 1000000"
            " DIV n_informative AS BIGINT)"
        ).alias("tdt_chi2_ppm"),
    )


@q(
    "sample_group_kfold",
    """WITH c AS (
         SELECT c_custkey,
                CAST('0x' || substr(md5(CAST(c_custkey AS VARCHAR)), 1, 15)
                     AS BIGINT) % 5 AS fold
         FROM customer),
       j AS (
         SELECT c.fold, c.c_custkey, o.o_orderkey
         FROM c LEFT JOIN orders o ON o.o_custkey = c.c_custkey),
       g AS (
         SELECT fold, CAST(COUNT(DISTINCT c_custkey) AS BIGINT) AS n_groups,
                CAST(COUNT(o_orderkey) AS BIGINT) AS n_rows
         FROM j GROUP BY fold),
       t AS (SELECT CAST(SUM(n_rows) AS BIGINT) AS total FROM g)
       SELECT CAST(fold AS BIGINT) AS fold, n_groups, n_rows,
              CAST(n_rows * 1000000 // total AS BIGINT) AS rows_ppm,
              CAST(n_rows * 1000000 // total - 200000 AS BIGINT) AS dev_ppm
       FROM g CROSS JOIN t""",
)
def sample_group_kfold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D+ GROUP k-fold assignment (the sklearn GroupKFold contract,
    hash-deterministic): every customer lands in exactly one of 5 folds
    by md5, so no group ever straddles a train/validation boundary (the
    leakage sample_split's row-hash cannot prevent when rows share an
    entity), and the fold board reports per-fold group count, row count,
    and the ppm deviation from the ideal 20% — the balance audit that
    says whether group sizes skewed a fold. Scale: fold assignment is a
    pure Column over the dimension; the LEFT join to facts shuffles on
    custkey once; the 5-row board and its 1-row total compose via a
    broadcast cross join (whitelisted). distinct-count runs per fold
    over disjoint custkeys — expand is fold-bounded."""
    c = read_table(spark, sf_dir, "customer").select(
        "c_custkey",
        F.expr(
            "conv(substring(md5(CAST(c_custkey AS STRING)), 1, 15), 16, 10)"
            " % 5"
        ).alias("fold"),
    )
    o = read_table(spark, sf_dir, "orders").select("o_custkey", "o_orderkey")
    j = c.join(o, c.c_custkey == o.o_custkey, "left")
    g = j.groupBy("fold").agg(
        F.countDistinct("c_custkey").cast("bigint").alias("n_groups"),
        F.count("o_orderkey").cast("bigint").alias("n_rows"),
    )
    t = g.agg(F.sum("n_rows").cast("bigint").alias("total"))
    return g.crossJoin(F.broadcast(t)).select(
        F.col("fold").cast("bigint").alias("fold"),
        "n_groups",
        "n_rows",
        F.expr("CAST(n_rows * 1000000 DIV total AS BIGINT)").alias("rows_ppm"),
        F.expr("CAST(n_rows * 1000000 DIV total - 200000 AS BIGINT)").alias(
            "dev_ppm"
        ),
    )


@q(
    "graph_conductance",
    f"""WITH {_COORDER_EDGES_SQL},
       nodes AS (
         SELECT DISTINCT v FROM (
           SELECT pa AS v FROM e UNION ALL SELECT pb AS v FROM e)),
       adj AS (
         SELECT pa AS v, pb AS n FROM e
         UNION ALL SELECT pb AS v, pa AS n FROM e),
       l0 AS (SELECT v, v AS lab FROM nodes),
       r1 AS (
         SELECT v, lab FROM (
           SELECT a.v, l.lab, COUNT(*) AS c,
                  ROW_NUMBER() OVER (PARTITION BY a.v
                       ORDER BY COUNT(*) DESC, l.lab) AS rn
           FROM adj a JOIN l0 l ON l.v = a.n
           GROUP BY a.v, l.lab) WHERE rn = 1),
       r2 AS (
         SELECT v, lab FROM (
           SELECT a.v, l.lab, COUNT(*) AS c,
                  ROW_NUMBER() OVER (PARTITION BY a.v
                       ORDER BY COUNT(*) DESC, l.lab) AS rn
           FROM adj a JOIN r1 l ON l.v = a.n
           GROUP BY a.v, l.lab) WHERE rn = 1),
       deg AS (SELECT v, CAST(COUNT(*) AS BIGINT) AS d FROM adj GROUP BY v),
       vol AS (
         SELECT l.lab, CAST(SUM(d.d) AS BIGINT) AS vol,
                CAST(COUNT(*) AS BIGINT) AS n_members
         FROM r2 l JOIN deg d ON d.v = l.v GROUP BY l.lab),
       m1 AS (SELECT CAST(COUNT(*) AS BIGINT) * 2 AS m2 FROM e),
       ecut AS (
         SELECT la.lab AS lab_a, lb.lab AS lab_b
         FROM e JOIN r2 la ON la.v = e.pa JOIN r2 lb ON lb.v = e.pb
         WHERE la.lab != lb.lab),
       cutc AS (
         SELECT lab, CAST(COUNT(*) AS BIGINT) AS cut FROM (
           SELECT lab_a AS lab FROM ecut
           UNION ALL SELECT lab_b AS lab FROM ecut)
         GROUP BY lab)
       SELECT CAST(vol.lab AS BIGINT) AS community, vol.n_members, vol.vol,
              CAST(COALESCE(cutc.cut, 0) AS BIGINT) AS cut_edges,
              CAST(CASE WHEN LEAST(vol.vol, m1.m2 - vol.vol) = 0 THEN 0
                   ELSE COALESCE(cutc.cut, 0) * 1000000
                        // LEAST(vol.vol, m1.m2 - vol.vol) END AS BIGINT)
                AS conductance_ppm
       FROM vol LEFT JOIN cutc ON cutc.lab = vol.lab CROSS JOIN m1""",
)
def graph_conductance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Graph community QUALITY, the cut view: conductance phi(C) =
    cut(C) / min(vol(C), 2m - vol(C)) per label-propagation community
    (Kannan, Vempala & Vetta 2004 — THE standard community-goodness
    score next to graph_modularity's null-model view; low phi = a real
    cluster, phi near 1e6 ppm = a random slice). Communities are the
    exact 2-round synchronous LPA of graph_labelprop (same deterministic
    tie-break), so the two quality keys grade the SAME partition.
    All-integer: cut and volume are counts, the ratio is ppm-truncated;
    a community spanning the whole graph reports 0 by convention.
    Scale: LPA rounds shuffle on |E| (localCheckpoint between rounds);
    scoring adds one degree agg, one two-sided label join of the edge
    list, and a 1-row 2m scalar cross join (whitelisted BNLJ)."""
    e = _coorder_edges(spark, sf_dir).localCheckpoint()
    # adj is a cheap projection over the CHECKPOINTED edge list — caching
    # it too doubles the cached graph (2|E| rows) and OOMs an 8 g heap at
    # sf5 (~60M edges); recomputing the union per round costs one extra
    # pass over e's cached blocks.
    adj = e.select(F.col("pa").alias("v"), F.col("pb").alias("n")).unionAll(
        e.select(F.col("pb").alias("v"), F.col("pa").alias("n"))
    )
    labels = adj.select("v").distinct().select("v", F.col("v").alias("lab"))
    for _ in range(2):
        nb = (
            adj.join(labels.select(F.col("v").alias("n"), "lab"), "n")
            .groupBy("v", "lab")
            .agg(F.count(F.lit(1)).alias("c"))
        )
        w = Window.partitionBy("v").orderBy(F.desc("c"), F.asc("lab"))
        labels = (
            nb.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("v", "lab")
            .localCheckpoint()
        )
    deg = adj.groupBy("v").agg(F.count(F.lit(1)).cast("bigint").alias("d"))
    vol = (
        labels.join(deg, "v")
        .groupBy("lab")
        .agg(
            F.sum("d").cast("bigint").alias("vol"),
            F.count(F.lit(1)).cast("bigint").alias("n_members"),
        )
    )
    m1 = e.agg(F.expr("CAST(COUNT(*) AS BIGINT) * 2").alias("m2"))
    la = labels.select(F.col("v").alias("pa"), F.col("lab").alias("lab_a"))
    lb = labels.select(F.col("v").alias("pb"), F.col("lab").alias("lab_b"))
    ecut = (
        e.join(la, "pa").join(lb, "pb").filter(F.col("lab_a") != F.col("lab_b"))
    )
    cutc = (
        ecut.select(F.col("lab_a").alias("lab"))
        .unionAll(ecut.select(F.col("lab_b").alias("lab")))
        .groupBy("lab")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cut"))
    )
    return (
        vol.join(cutc, "lab", "left")
        .crossJoin(F.broadcast(m1))
        .select(
            F.col("lab").cast("bigint").alias("community"),
            "n_members",
            "vol",
            F.expr("CAST(COALESCE(cut, 0) AS BIGINT)").alias("cut_edges"),
            F.expr(
                "CAST(CASE WHEN LEAST(vol, m2 - vol) = 0 THEN 0"
                " ELSE COALESCE(cut, 0) * 1000000"
                " DIV LEAST(vol, m2 - vol) END AS BIGINT)"
            ).alias("conductance_ppm"),
        )
    )


@q(
    "sim_hamming_recall",
    f"""WITH w AS (
         SELECT vec_id,
                list_aggregate(list_transform(
                    list_zip(embedding[1:32], {_W32}),
                    s -> CASE WHEN CAST(s[1] AS DOUBLE) >= 0
                         THEN s[2] ELSE 0 END), 'sum') AS w1,
                list_aggregate(list_transform(
                    list_zip(embedding[33:64], {_W32}),
                    s -> CASE WHEN CAST(s[1] AS DOUBLE) >= 0
                         THEN s[2] ELSE 0 END), 'sum') AS w2
         FROM embeddings),
       hq AS (SELECT vec_id AS query_id, w1 AS q1, w2 AS q2
              FROM w ORDER BY vec_id LIMIT 5),
       hd AS (
         SELECT hq.query_id, w.vec_id,
                bit_count(xor(w.w1, hq.q1))
                + bit_count(xor(w.w2, hq.q2)) AS hamming
         FROM w CROSS JOIN hq WHERE w.vec_id != hq.query_id),
       hr AS (
         SELECT query_id, vec_id,
                ROW_NUMBER() OVER (PARTITION BY query_id
                     ORDER BY hamming, vec_id) AS rank
         FROM hd),
       approx AS (SELECT query_id, vec_id FROM hr WHERE rank <= 3),
       qv AS (
         SELECT vec_id, list_transform(embedding,
                x -> CAST(floor(CAST(x AS DOUBLE) * 10000) AS BIGINT)) AS e
         FROM embeddings),
       queries AS (SELECT vec_id AS query_id, e AS qe
                   FROM qv ORDER BY vec_id LIMIT 5),
       exd AS (
         SELECT queries.query_id, qv.vec_id,
                list_sum(list_transform(list_zip(qv.e, queries.qe),
                    s -> (s[1] - s[2]) * (s[1] - s[2]))) AS d2
         FROM qv CROSS JOIN queries WHERE qv.vec_id != queries.query_id),
       exr AS (
         SELECT query_id, vec_id,
                ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY d2, vec_id) AS r
         FROM exd),
       ex AS (SELECT query_id, vec_id FROM exr WHERE r <= 3)
       SELECT ex.query_id,
              CAST(COUNT(*) AS BIGINT) AS n_exact,
              CAST(SUM(CASE WHEN a.vec_id IS NOT NULL THEN 1 ELSE 0 END)
                   AS BIGINT) AS n_hits,
              CAST((1000000 * SUM(CASE WHEN a.vec_id IS NOT NULL
                                       THEN 1 ELSE 0 END))
                   // COUNT(*) AS BIGINT) AS recall_ppm
       FROM ex LEFT JOIN approx a USING (query_id, vec_id)
       GROUP BY ex.query_id""",
)
def sim_hamming_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K3+ binary-index QUALITY evaluation — recall@3 of the 8-byte
    sign-hash Hamming index (sim_hamming_topk) against the exact
    self-excluded integer-L2 ground truth for the same probes: the
    number that says how much ranking quality the 32x compression
    (64 floats -> 2 words) gave up, next to sim_recall_eval's IVF-PQ
    recall — together they map the memory/recall frontier this engine
    offers. Both sides are the certified components; the comparison is
    a 15-row join. Scale: one signature scan + one exact mapInPandas
    scan (per-batch local top-k, linear in n for the fixed probe set)."""
    from varda_spark.operators.similarity import exact_l2_topk

    e = read_table(spark, sf_dir, "embeddings")
    ex = exact_l2_topk(
        e, n_queries=5, topk=3, scale=10000, exclude_self=True
    ).select("query_id", "vec_id")
    ap = sim_hamming_topk(spark, sf_dir).select(
        F.col("query_id").alias("a_qid"), F.col("vec_id").alias("a_vec")
    )
    j = ex.join(
        ap,
        (ex.query_id == F.col("a_qid")) & (ex.vec_id == F.col("a_vec")),
        "left",
    )
    return j.groupBy("query_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_exact"),
        F.expr(
            "CAST(SUM(CASE WHEN a_vec IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)"
        ).alias("n_hits"),
        F.expr(
            "CAST((1000000 * SUM(CASE WHEN a_vec IS NOT NULL THEN 1 ELSE 0 END))"
            " DIV COUNT(*) AS BIGINT)"
        ).alias("recall_ppm"),
    )


@q(
    "win_atr",
    """WITH t AS (
         SELECT event_type, CAST(ts AS DATE) AS d,
                CAST(FLOOR(value * 100) AS BIGINT) AS cents, ts, event_id
         FROM events),
       o AS (
         SELECT event_type, d, cents,
                ROW_NUMBER() OVER (PARTITION BY event_type, d
                                   ORDER BY ts DESC, event_id DESC) AS rn_close
         FROM t),
       agg AS (
         SELECT event_type, d,
                CAST(MAX(cents) AS BIGINT) AS high,
                CAST(MIN(cents) AS BIGINT) AS low,
                CAST(MAX(CASE WHEN rn_close = 1 THEN cents END) AS BIGINT)
                  AS close
         FROM o GROUP BY event_type, d),
       tr AS (
         SELECT event_type, d, high, low, close,
                LAG(close) OVER (PARTITION BY event_type ORDER BY d) AS pc
         FROM agg),
       tr2 AS (
         SELECT event_type, d,
                CAST(CASE WHEN pc IS NULL THEN high - low
                     ELSE GREATEST(high - low, ABS(high - pc), ABS(low - pc))
                     END AS BIGINT) AS tr_cents
         FROM tr)
       SELECT event_type, d, tr_cents,
              CAST(SUM(tr_cents) OVER w
                   // COUNT(*) OVER w AS BIGINT) AS atr_cents
       FROM tr2
       WINDOW w AS (PARTITION BY event_type ORDER BY d
                    ROWS BETWEEN 13 PRECEDING AND CURRENT ROW)""",
)
def win_atr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E+ Average True Range (Wilder 1978, the simple-moving-average
    variant) per series: true range = max(high-low, |high-prev close|,
    |low-prev close|) over the deterministic daily OHLC rollup (the
    win_ohlc synthesis), averaged over a 14-day frame — the volatility
    band sizing every stop-loss / anomaly threshold reads, completing
    the TA family beside RSI/MACD/stochastic/Bollinger. All integer
    cents; the frame average is SUM DIV COUNT over the same frame (no
    float mean). Plan: one (type, day) rollup, then LAG + one 14-row
    frame on the (type)-PARTITIONED day-grain table — everything
    partitioned, calendar-bounded per partition."""
    e = read_table(spark, sf_dir, "events")
    t = e.select(
        "event_type",
        F.expr("CAST(ts AS DATE)").alias("d"),
        F.expr("CAST(FLOOR(value * 100) AS BIGINT)").alias("cents"),
        "ts",
        "event_id",
    )
    wend = Window.partitionBy("event_type", "d").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    o = t.withColumn("rn_close", F.row_number().over(wend))
    agg = o.groupBy("event_type", "d").agg(
        F.max("cents").cast("bigint").alias("high"),
        F.min("cents").cast("bigint").alias("low"),
        F.expr("CAST(MAX(CASE WHEN rn_close = 1 THEN cents END) AS BIGINT)")
        .alias("close"),
    )
    wd = Window.partitionBy("event_type").orderBy("d")
    tr = agg.withColumn("pc", F.lag("close").over(wd)).select(
        "event_type",
        "d",
        F.expr(
            "CAST(CASE WHEN pc IS NULL THEN high - low"
            " ELSE GREATEST(high - low, ABS(high - pc), ABS(low - pc))"
            " END AS BIGINT)"
        ).alias("tr_cents"),
    )
    wf = (
        Window.partitionBy("event_type")
        .orderBy("d")
        .rowsBetween(-13, Window.currentRow)
    )
    return tr.select(
        "event_type",
        "d",
        "tr_cents",
        F.expr(
            "CAST(SUM(tr_cents) OVER (PARTITION BY event_type ORDER BY d"
            " ROWS BETWEEN 13 PRECEDING AND CURRENT ROW)"
            " DIV COUNT(*) OVER (PARTITION BY event_type ORDER BY d"
            " ROWS BETWEEN 13 PRECEDING AND CURRENT ROW) AS BIGINT)"
        ).alias("atr_cents"),
    )


@q(
    "agg_pvm_bridge",
    """WITH j AS (
         SELECT p.p_brand AS brand,
                CAST(year(CAST(l.l_shipdate AS DATE)) AS BIGINT) AS yr,
                CAST(CAST(l.l_quantity AS DECIMAL(18,4)) AS BIGINT) AS units,
                CAST(CAST(l.l_extendedprice AS DECIMAL(18,4)) * 100 AS BIGINT)
                  AS cents
         FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
         WHERE year(CAST(l.l_shipdate AS DATE)) IN (1996, 1997)),
       g AS (
         SELECT brand, yr,
                CAST(SUM(units) AS BIGINT) AS q,
                CAST(SUM(CAST(cents AS HUGEINT)) AS HUGEINT) AS r
         FROM j GROUP BY brand, yr),
       pv AS (
         SELECT brand,
                CAST(MAX(CASE WHEN yr = 1996 THEN q END) AS BIGINT) AS q0,
                CAST(MAX(CASE WHEN yr = 1997 THEN q END) AS BIGINT) AS q1,
                CAST(MAX(CASE WHEN yr = 1996 THEN r END) AS HUGEINT) AS r0,
                CAST(MAX(CASE WHEN yr = 1997 THEN r END) AS HUGEINT) AS r1
         FROM g GROUP BY brand
         HAVING MAX(CASE WHEN yr = 1996 THEN q END) IS NOT NULL
            AND MAX(CASE WHEN yr = 1997 THEN q END) IS NOT NULL),
       eff AS (
         SELECT brand, q0, q1,
                CAST(r0 AS BIGINT) AS r0_cents,
                CAST(r1 AS BIGINT) AS r1_cents,
                r0 * 1000 // q0 AS p0_milli,
                r1 * 1000 // q1 AS p1_milli
         FROM pv)
       SELECT brand, q0, q1, r0_cents, r1_cents,
              CAST(p0_milli AS BIGINT) AS p0_milli,
              CAST(p1_milli AS BIGINT) AS p1_milli,
              CAST(r1_cents - r0_cents AS BIGINT) AS delta_cents,
              CAST((p1_milli - p0_milli) * CAST(q1 AS HUGEINT) // 1000
                   AS BIGINT) AS price_eff_cents,
              CAST(CAST(q1 - q0 AS HUGEINT) * p0_milli // 1000
                   AS BIGINT) AS volume_eff_cents,
              CAST((r1_cents - r0_cents)
                   - (p1_milli - p0_milli) * CAST(q1 AS HUGEINT) // 1000
                   - CAST(q1 - q0 AS HUGEINT) * p0_milli // 1000
                   AS BIGINT) AS mix_resid_cents
       FROM eff""",
)
def agg_pvm_bridge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D+ price-volume-mix revenue bridge (the FP&A waterfall: how much
    of each brand's 1996→1997 revenue change came from unit-price moves
    vs unit-volume moves, with the quantization cross-term as the
    explicit mix residual): per brand present in both years, price
    effect = Δp·q1, volume effect = Δq·p0, residual = Δrev − price −
    volume, so the three effects reconcile to the delta EXACTLY by
    construction. Exactness: unit prices are milli-cent-quantized with
    the shared HUGEINT/DECIMAL(38,0) truncating division; every effect
    is an integer product DIV 1000. Scale: one partkey equi-join (brand
    is a part attribute), ONE (brand, year) keyed agg with map-side
    partials; the pivot and arithmetic run on the 25-row brand
    dimension."""
    li = read_table(spark, sf_dir, "lineitem")
    p = read_table(spark, sf_dir, "part")
    D = "DECIMAL(38,0)"
    j = (
        li.join(p, li.l_partkey == p.p_partkey)
        .filter(F.expr("year(CAST(l_shipdate AS DATE)) IN (1996, 1997)"))
        .select(
            F.col("p_brand").alias("brand"),
            F.expr("CAST(year(CAST(l_shipdate AS DATE)) AS BIGINT)").alias("yr"),
            F.expr("CAST(CAST(l_quantity AS DECIMAL(18,4)) AS BIGINT)").alias(
                "units"
            ),
            F.expr(
                "CAST(CAST(l_extendedprice AS DECIMAL(18,4)) * 100 AS BIGINT)"
            ).alias("cents"),
        )
    )
    g = j.groupBy("brand", "yr").agg(
        F.expr("CAST(SUM(units) AS BIGINT)").alias("q"),
        F.expr(f"SUM(CAST(cents AS {D}))").alias("r"),
    )
    pv = (
        g.groupBy("brand")
        .agg(
            F.expr("CAST(MAX(CASE WHEN yr = 1996 THEN q END) AS BIGINT)").alias(
                "q0"
            ),
            F.expr("CAST(MAX(CASE WHEN yr = 1997 THEN q END) AS BIGINT)").alias(
                "q1"
            ),
            F.expr(
                f"CAST(MAX(CASE WHEN yr = 1996 THEN r END) AS {D})"
            ).alias("r0"),
            F.expr(
                f"CAST(MAX(CASE WHEN yr = 1997 THEN r END) AS {D})"
            ).alias("r1"),
        )
        .filter("q0 IS NOT NULL AND q1 IS NOT NULL")
    )
    eff = pv.select(
        "brand",
        "q0",
        "q1",
        F.expr("CAST(r0 AS BIGINT)").alias("r0_cents"),
        F.expr("CAST(r1 AS BIGINT)").alias("r1_cents"),
        F.expr("r0 * 1000 DIV q0").alias("p0_milli"),
        F.expr("r1 * 1000 DIV q1").alias("p1_milli"),
    )
    return eff.select(
        "brand",
        "q0",
        "q1",
        "r0_cents",
        "r1_cents",
        F.expr("CAST(p0_milli AS BIGINT)").alias("p0_milli"),
        F.expr("CAST(p1_milli AS BIGINT)").alias("p1_milli"),
        F.expr("CAST(r1_cents - r0_cents AS BIGINT)").alias("delta_cents"),
        F.expr(
            f"CAST((p1_milli - p0_milli) * CAST(q1 AS {D}) DIV 1000 AS BIGINT)"
        ).alias("price_eff_cents"),
        F.expr(
            f"CAST(CAST(q1 - q0 AS {D}) * p0_milli DIV 1000 AS BIGINT)"
        ).alias("volume_eff_cents"),
        F.expr(
            f"CAST((r1_cents - r0_cents)"
            f" - (p1_milli - p0_milli) * CAST(q1 AS {D}) DIV 1000"
            f" - CAST(q1 - q0 AS {D}) * p0_milli DIV 1000 AS BIGINT)"
        ).alias("mix_resid_cents"),
    )


@q(
    "agg_fdr_bh",
    """WITH RECURSIVE samp AS (
         SELECT p.p_brand AS brand, l.l_orderkey AS ok,
                CASE WHEN CAST(l.l_discount AS DECIMAL(18,4)) > 0.0500 THEN 1
                     WHEN CAST(l.l_discount AS DECIMAL(18,4)) < 0.0500 THEN -1
                     ELSE 0 END AS sgn
         FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
         WHERE l.l_orderkey % 97 = 1 AND l.l_linenumber = 1),
       capped AS (
         SELECT brand, sgn,
                ROW_NUMBER() OVER (PARTITION BY brand ORDER BY ok) AS rn
         FROM samp),
       stats AS (
         SELECT brand,
                CAST(SUM(CASE WHEN sgn != 0 THEN 1 ELSE 0 END) AS BIGINT) AS n,
                CAST(SUM(CASE WHEN sgn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS pos
         FROM capped WHERE rn <= 40
         GROUP BY brand
         HAVING SUM(CASE WHEN sgn != 0 THEN 1 ELSE 0 END) > 0),
       kk AS (
         SELECT brand, n, pos, LEAST(pos, n - pos) AS k FROM stats),
       bt AS (
         SELECT brand, n, k, 0 AS i,
                CAST(1 AS HUGEINT) AS c, CAST(1 AS HUGEINT) AS s
         FROM kk
         UNION ALL
         SELECT brand, n, k, i + 1,
                c * (n - i) // (i + 1),
                s + c * (n - i) // (i + 1)
         FROM bt WHERE i < k),
       pvals AS (
         SELECT kk.brand, kk.n, kk.pos,
                CAST(LEAST(CAST(1000000 AS HUGEINT),
                     2000000 * bt.s // (CAST(1 AS HUGEINT) << kk.n))
                     AS BIGINT) AS p_ppm
         FROM kk JOIN bt ON bt.brand = kk.brand AND bt.i = kk.k),
       ranked AS (
         SELECT brand, n AS n_obs, pos AS n_pos, p_ppm,
                CAST(ROW_NUMBER() OVER (ORDER BY p_ppm, brand) AS BIGINT)
                  AS rnk,
                CAST(COUNT(*) OVER () AS BIGINT) AS m
         FROM pvals),
       thr AS (
         SELECT *, MAX(CASE WHEN p_ppm * m <= rnk * 50000 THEN rnk
                            ELSE 0 END) OVER () AS t
         FROM ranked)
       SELECT brand, n_obs, n_pos, p_ppm, rnk, m,
              rnk <= t AS reject
       FROM thr""",
)
def agg_fdr_bh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D+ Benjamini–Hochberg FDR control (Benjamini & Hochberg 1995)
    over EXACT two-sided sign-test p-values — the multiple-testing
    gate every per-segment screening dashboard needs: per brand, H0
    says the median discount is 0.05; p = min(1, 2·P(Bin(n,1/2) ≤
    min(pos, neg))) computed with exact integer binomial coefficients
    (the stepwise C(n,i) = C(n,i-1)·(n-i+1)/i recurrence is
    always-integer, folded in a JVM HOF here and a recursive CTE in the
    oracle), ppm-quantized; BH rejects ranks ≤ the largest i with
    p_(i)·m ≤ i·α (α = 0.05). No float anywhere. Scale: the sample is
    a PUSHED modulus predicate (~1% of the scan) capped at 40
    obs/brand by a brand-partitioned window over that 1%; everything
    after runs on the 25-row brand dimension (whitelisted one-task
    windows, dimension-bounded — the agg_abc_class argument)."""
    li = read_table(spark, sf_dir, "lineitem")
    p = read_table(spark, sf_dir, "part")
    samp = (
        li.filter("l_orderkey % 97 = 1 AND l_linenumber = 1")
        .join(p, li.l_partkey == p.p_partkey)
        .select(
            F.col("p_brand").alias("brand"),
            F.col("l_orderkey").alias("ok"),
            F.expr(
                "CASE WHEN CAST(l_discount AS DECIMAL(18,4)) > 0.0500 THEN 1"
                " WHEN CAST(l_discount AS DECIMAL(18,4)) < 0.0500 THEN -1"
                " ELSE 0 END"
            ).alias("sgn"),
        )
    )
    wcap = Window.partitionBy("brand").orderBy("ok")
    stats = (
        samp.withColumn("rn", F.row_number().over(wcap))
        .filter("rn <= 40")
        .groupBy("brand")
        .agg(
            F.expr(
                "CAST(SUM(CASE WHEN sgn != 0 THEN 1 ELSE 0 END) AS BIGINT)"
            ).alias("n"),
            F.expr(
                "CAST(SUM(CASE WHEN sgn = 1 THEN 1 ELSE 0 END) AS BIGINT)"
            ).alias("pos"),
        )
        .filter("n > 0")
    )
    # exact binomial tail: s = sum_{i=0..k} C(n,i), folded stepwise so
    # every intermediate stays an exact BIGINT (max C(40,20)*40 ~ 5.5e12)
    tail = (
        "CASE WHEN k = 0 THEN CAST(1 AS BIGINT) ELSE aggregate(sequence(1, k),"
        " named_struct('c', CAST(1 AS BIGINT), 's', CAST(1 AS BIGINT)),"
        " (acc, i) -> named_struct("
        "   'c', acc.c * (n - i + 1) DIV i,"
        "   's', acc.s + acc.c * (n - i + 1) DIV i),"
        " acc -> acc.s) END"
    )
    pvals = stats.withColumn("k", F.expr("LEAST(pos, n - pos)")).select(
        "brand",
        "n",
        "pos",
        F.expr(
            f"CAST(LEAST(CAST(1000000 AS BIGINT),"
            f" 2000000 * ({tail}) DIV shiftleft(CAST(1 AS BIGINT), CAST(n AS INT)))"
            f" AS BIGINT)"
        ).alias("p_ppm"),
    )
    wall = Window.orderBy("p_ppm", "brand")
    wfull = Window.partitionBy().orderBy().rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    ranked = pvals.select(
        "brand",
        F.col("n").alias("n_obs"),
        F.col("pos").alias("n_pos"),
        "p_ppm",
        F.row_number().over(wall).cast("bigint").alias("rnk"),
    ).withColumn("m", F.count(F.lit(1)).over(wfull).cast("bigint"))
    thr = ranked.withColumn(
        "t",
        F.expr("MAX(CASE WHEN p_ppm * m <= rnk * 50000 THEN rnk ELSE 0 END)").over(
            wfull
        ),
    )
    return thr.select(
        "brand", "n_obs", "n_pos", "p_ppm", "rnk", "m",
        F.expr("rnk <= t").alias("reject"),
    )


@q(
    "store_bloom_advisor",
    """WITH part_stats AS (
         SELECT CAST(year(CAST(o_orderdate AS DATE)) * 100
                     + month(CAST(o_orderdate AS DATE)) AS BIGINT) AS part_ym,
                CAST(COUNT(*) AS BIGINT) AS n_rows,
                CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS ndv
         FROM orders GROUP BY 1)
       SELECT part_ym, n_rows, ndv,
              CAST((ndv * 9585 + 999) // 1000 AS BIGINT) AS bloom_bits,
              CAST(((ndv * 9585 + 999) // 1000 + 7) // 8 AS BIGINT)
                AS bloom_bytes,
              CAST((((ndv * 9585 + 999) // 1000) * 693 * 2 + ndv * 1000)
                   // (ndv * 2000) AS BIGINT) AS k_hashes,
              ((ndv * 9585 + 999) // 1000 + 7) // 8 <= 1048576 AS recommend
       FROM part_stats""",
)
def store_bloom_advisor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5+ per-partition bloom-filter sizing advisor (the Parquet
    bloom_filter_enabled decision a warehouse makes per file): for each
    month partition of orders, the exact NDV of the point-lookup column
    (o_custkey) sizes an fpp=1% filter — m = ceil(ndv·9.585) bits
    (9585/1000 is ln(1/0.01)/ln²2 as an exact rational), k =
    round(0.693·m/ndv) hashes, with the recommendation gated on the
    filter fitting a 1 MiB page budget. All integer ceil/round via the
    shared truncating-DIV protocol. Scale: ONE keyed agg; exact
    COUNT(DISTINCT) per partition is the expensive-but-honest half
    (two-phase expand on (partition, custkey)) — the approx_cd sketch
    path exists for when ±2% suffices."""
    o = read_table(spark, sf_dir, "orders")
    g = o.groupBy(
        F.expr(
            "CAST(year(CAST(o_orderdate AS DATE)) * 100"
            " + month(CAST(o_orderdate AS DATE)) AS BIGINT)"
        ).alias("part_ym")
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.countDistinct("o_custkey").cast("bigint").alias("ndv"),
    )
    return g.select(
        "part_ym",
        "n_rows",
        "ndv",
        F.expr("CAST((ndv * 9585 + 999) DIV 1000 AS BIGINT)").alias("bloom_bits"),
        F.expr(
            "CAST(((ndv * 9585 + 999) DIV 1000 + 7) DIV 8 AS BIGINT)"
        ).alias("bloom_bytes"),
        F.expr(
            "CAST((((ndv * 9585 + 999) DIV 1000) * 693 * 2 + ndv * 1000)"
            " DIV (ndv * 2000) AS BIGINT)"
        ).alias("k_hashes"),
        F.expr(
            "((ndv * 9585 + 999) DIV 1000 + 7) DIV 8 <= 1048576"
        ).alias("recommend"),
    )


@q(
    "sim_rrf_fusion",
    f"""WITH qz AS (
         SELECT vec_id,
                list_transform(embedding,
                    x -> CAST(FLOOR(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS qv,
                list_aggregate(list_transform(
                    list_zip(embedding[1:32], {_W32}),
                    s -> CASE WHEN CAST(s[1] AS DOUBLE) >= 0
                         THEN s[2] ELSE 0 END), 'sum') AS w1,
                list_aggregate(list_transform(
                    list_zip(embedding[33:64], {_W32}),
                    s -> CASE WHEN CAST(s[1] AS DOUBLE) >= 0
                         THEN s[2] ELSE 0 END), 'sum') AS w2
         FROM embeddings),
       qs AS (SELECT vec_id AS query_id, qv AS pq, w1 AS b1, w2 AS b2
              FROM qz ORDER BY vec_id LIMIT 5),
       dense AS (
         SELECT query_id, vec_id,
                CAST(ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY
                     list_aggregate(list_transform(list_zip(qv, pq),
                         s -> s[1] * s[2]), 'sum') DESC, vec_id)
                     AS BIGINT) AS ra
         FROM qz CROSS JOIN qs WHERE vec_id != query_id),
       binry AS (
         SELECT query_id, vec_id,
                CAST(ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY
                     bit_count(xor(w1, b1)) + bit_count(xor(w2, b2)), vec_id)
                     AS BIGINT) AS rb
         FROM qz CROSS JOIN qs WHERE vec_id != query_id),
       fused AS (
         SELECT COALESCE(d.query_id, b.query_id) AS query_id,
                COALESCE(d.vec_id, b.vec_id) AS vec_id,
                COALESCE(d.ra, 0) AS rank_dense,
                COALESCE(b.rb, 0) AS rank_binary,
                CAST(CASE WHEN d.ra IS NULL THEN 0
                     ELSE 1000000 // (60 + d.ra) END
                   + CASE WHEN b.rb IS NULL THEN 0
                     ELSE 1000000 // (60 + b.rb) END AS BIGINT) AS rrf_ppm
         FROM (SELECT * FROM dense WHERE ra <= 10) d
         FULL OUTER JOIN (SELECT * FROM binry WHERE rb <= 10) b
           ON d.query_id = b.query_id AND d.vec_id = b.vec_id)
       SELECT query_id,
              CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                   ORDER BY rrf_ppm DESC, vec_id) AS BIGINT) AS rank,
              vec_id, rrf_ppm, rank_dense, rank_binary
       FROM fused
       QUALIFY rank <= 5""",
)
def sim_rrf_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K3+ reciprocal-rank fusion (Cormack et al. 2009 — the standard
    hybrid-retrieval merge): fuse a dense retriever (integer-quantized
    dot-product top-10) with a binary retriever (sign-bit Hamming
    top-10) per query, score = Σ 1/(60+rank) ppm-floored, emit the
    fused top-5 — the two-tower + rerank shape every production RAG
    stack runs. Exactness: quantization is floor(x·1000) (one
    deterministic IEEE multiply, no accumulation), dots/hamming are
    integer, RRF terms are truncating DIV. Scale: BOTH retrievers are
    one broadcast-5-query scan with the salted two-phase top-k
    (sim_hamming_topk discipline); the fusion join and final window
    touch ≤ 5·20 survivor rows."""
    e = read_table(spark, sf_dir, "embeddings")
    lits = ", ".join(str(x) for x in _W32)

    def word(lo: int) -> str:
        return (
            f"aggregate(zip_with(slice(embedding, {lo}, 32), array({lits}),"
            " (x, p) -> CASE WHEN CAST(x AS DOUBLE) >= 0"
            " THEN p ELSE CAST(0 AS BIGINT) END),"
            " CAST(0 AS BIGINT), (acc, v) -> acc + v)"
        )

    z = e.select(
        "vec_id",
        F.expr(
            "transform(embedding,"
            " x -> CAST(FLOOR(CAST(x AS DOUBLE) * 1000) AS BIGINT))"
        ).alias("qv"),
        F.expr(word(1)).alias("w1"),
        F.expr(word(33)).alias("w2"),
    )
    qs = (
        z.orderBy("vec_id")
        .limit(5)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("qv").alias("pq"),
            F.col("w1").alias("b1"),
            F.col("w2").alias("b2"),
        )
    )
    cand = z.crossJoin(F.broadcast(qs)).filter(F.col("vec_id") != F.col("query_id"))

    def two_phase(df: DataFrame, score: str, asc: bool, out: str) -> DataFrame:
        d = df.select(
            "query_id",
            "vec_id",
            F.expr(score).alias("_s"),
            F.expr("pmod(vec_id, 64)").alias("_salt"),
        )
        order = [F.col("_s").asc() if asc else F.col("_s").desc(), F.col("vec_id")]
        wloc = Window.partitionBy("query_id", "_salt").orderBy(*order)
        wglob = Window.partitionBy("query_id").orderBy(*order)
        return (
            d.withColumn("_r", F.row_number().over(wloc))
            .filter(F.col("_r") <= 10)
            .withColumn(out, F.row_number().over(wglob).cast("bigint"))
            .filter(F.col(out) <= 10)
            .select("query_id", "vec_id", out)
        )

    dense = two_phase(
        cand,
        "aggregate(zip_with(qv, pq, (a, b) -> a * b),"
        " CAST(0 AS BIGINT), (acc, v) -> acc + v)",
        asc=False,
        out="ra",
    )
    binry = two_phase(
        cand,
        "CAST(bit_count(w1 ^ b1) + bit_count(w2 ^ b2) AS BIGINT)",
        asc=True,
        out="rb",
    )
    fused = (
        dense.join(binry, ["query_id", "vec_id"], "full_outer")
        .select(
            "query_id",
            "vec_id",
            F.expr("COALESCE(ra, 0)").alias("rank_dense"),
            F.expr("COALESCE(rb, 0)").alias("rank_binary"),
            F.expr(
                "CAST(CASE WHEN ra IS NULL THEN 0 ELSE 1000000 DIV (60 + ra) END"
                " + CASE WHEN rb IS NULL THEN 0"
                " ELSE 1000000 DIV (60 + rb) END AS BIGINT)"
            ).alias("rrf_ppm"),
        )
    )
    wq = Window.partitionBy("query_id").orderBy(
        F.col("rrf_ppm").desc(), F.col("vec_id")
    )
    return (
        fused.withColumn("rank", F.row_number().over(wq).cast("bigint"))
        .filter(F.col("rank") <= 5)
        .select("query_id", "rank", "vec_id", "rrf_ppm", "rank_dense", "rank_binary")
    )


@q(
    "win_adstock",
    """WITH day AS (
         SELECT o_orderpriority AS prio, CAST(o_orderdate AS DATE) AS d,
                CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,4)) * 100
                     AS BIGINT)) AS BIGINT) AS cents
         FROM orders GROUP BY 1, 2),
       lagd AS (
         SELECT prio, d, cents,
                """
    + ",\n                ".join(
        f"COALESCE(LAG(cents, {j}) OVER (PARTITION BY prio ORDER BY d), 0)"
        f" AS l{j}"
        for j in range(1, 11)
    )
    + """
         FROM day)
       SELECT prio, d, cents,
              CAST(cents + """
    + " + ".join(f"l{j} // {1 << j}" for j in range(1, 11))
    + """ AS BIGINT) AS adstock_cents,
              CAST(CASE WHEN cents + """
    + " + ".join(f"l{j} // {1 << j}" for j in range(1, 11))
    + """ = 0 THEN 0
                   ELSE ("""
    + " + ".join(f"l{j} // {1 << j}" for j in range(1, 11))
    + """) * 1000000
                        // (cents + """
    + " + ".join(f"l{j} // {1 << j}" for j in range(1, 11))
    + """) END AS BIGINT) AS carryover_ppm
       FROM lagd""",
)
def win_adstock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E+ geometric adstock transform (Broadbent 1979; the carryover
    term in every media-mix model): per order-priority channel, daily
    spend plus a half-life-one-day decayed tail of the prior 10 days —
    adstock_t = Σ_{j=0..10} spend_{t-j} DIV 2^j — and the carryover
    share of the transformed series. Powers of two make the geometric
    decay EXACT integer arithmetic (truncating DIV per lag, identical
    in both engines) instead of a float pow chain. Scale: one (channel,
    day) keyed rollup with map-side partials, then 10 LAGs in a single
    window pass over the channel-PARTITIONED day-grain table
    (calendar-bounded ~2.4k rows per channel)."""
    o = read_table(spark, sf_dir, "orders")
    day = o.groupBy(
        F.col("o_orderpriority").alias("prio"),
        F.expr("CAST(o_orderdate AS DATE)").alias("d"),
    ).agg(
        F.expr(
            "CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,4)) * 100 AS BIGINT))"
            " AS BIGINT)"
        ).alias("cents")
    )
    w = Window.partitionBy("prio").orderBy("d")
    lagd = day.select(
        "prio",
        "d",
        "cents",
        *[
            F.coalesce(F.lag("cents", j).over(w), F.lit(0)).alias(f"l{j}")
            for j in range(1, 11)
        ],
    )
    tail_expr = " + ".join(f"l{j} DIV {1 << j}" for j in range(1, 11))
    return lagd.select(
        "prio",
        "d",
        "cents",
        F.expr(f"CAST(cents + {tail_expr} AS BIGINT)").alias("adstock_cents"),
        F.expr(
            f"CAST(CASE WHEN cents + {tail_expr} = 0 THEN 0"
            f" ELSE ({tail_expr}) * 1000000 DIV (cents + {tail_expr}) END"
            f" AS BIGINT)"
        ).alias("carryover_ppm"),
    )


@q(
    "emb_hard_negatives",
    f"""WITH qz AS (
         SELECT vec_id, label,
                list_transform(embedding,
                    x -> CAST(FLOOR(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS qv
         FROM embeddings),
       qs AS (SELECT vec_id AS anchor_id, label AS alabel, qv AS aq
              FROM qz ORDER BY vec_id LIMIT 5),
       cand AS (
         SELECT anchor_id, alabel, vec_id, label,
                CAST(list_aggregate(list_transform(list_zip(qv, aq),
                     s -> s[1] * s[2]), 'sum') AS BIGINT) AS dot,
                label = alabel AS same
         FROM qz CROSS JOIN qs WHERE vec_id != anchor_id),
       best AS (
         SELECT anchor_id, alabel, vec_id, dot, same,
                ROW_NUMBER() OVER (PARTITION BY anchor_id, same
                                   ORDER BY dot DESC, vec_id) AS rn
         FROM cand)
       SELECT anchor_id,
              CAST(MAX(alabel) AS BIGINT) AS label,
              CAST(MAX(CASE WHEN same THEN vec_id END) AS BIGINT) AS pos_id,
              CAST(MAX(CASE WHEN same THEN dot END) AS BIGINT) AS pos_dot,
              CAST(MAX(CASE WHEN NOT same THEN vec_id END) AS BIGINT)
                AS neg_id,
              CAST(MAX(CASE WHEN NOT same THEN dot END) AS BIGINT) AS neg_dot,
              CAST(MAX(CASE WHEN same THEN dot END)
                   - MAX(CASE WHEN NOT same THEN dot END) AS BIGINT) AS margin
       FROM best WHERE rn = 1 GROUP BY anchor_id""",
)
def emb_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K3+ triplet mining for contrastive training (the hard-negative
    selection step of every embedding-model data pipeline, Schroff et
    al. 2015 FaceNet semi-hard mining made exact): per anchor, the
    nearest SAME-label vector is the positive, the nearest
    DIFFERENT-label vector is the hard negative, and the margin
    pos_dot − neg_dot is the triplet's difficulty (negative margin =
    the anchor violates the metric — exactly the triplets worth
    training on). Exactness: floor(x·1000) quantization, integer dots,
    integer margin. Scale: one broadcast-5-anchor scan; top-1 per
    (anchor, same-label) side is the salted two-phase window
    (sim_hamming_topk discipline), so no task holds a full candidate
    list; the pivot runs on 10 rows."""
    e = read_table(spark, sf_dir, "embeddings")
    z = e.select(
        "vec_id",
        F.col("label").cast("bigint").alias("label"),
        F.expr(
            "transform(embedding,"
            " x -> CAST(FLOOR(CAST(x AS DOUBLE) * 1000) AS BIGINT))"
        ).alias("qv"),
    )
    qs = (
        z.orderBy("vec_id")
        .limit(5)
        .select(
            F.col("vec_id").alias("anchor_id"),
            F.col("label").alias("alabel"),
            F.col("qv").alias("aq"),
        )
    )
    cand = (
        z.crossJoin(F.broadcast(qs))
        .filter(F.col("vec_id") != F.col("anchor_id"))
        .select(
            "anchor_id",
            "alabel",
            "vec_id",
            F.expr(
                "CAST(aggregate(zip_with(qv, aq, (a, b) -> a * b),"
                " CAST(0 AS BIGINT), (acc, v) -> acc + v) AS BIGINT)"
            ).alias("dot"),
            F.expr("label = alabel").alias("same"),
            F.expr("pmod(vec_id, 64)").alias("_salt"),
        )
    )
    wloc = Window.partitionBy("anchor_id", "same", "_salt").orderBy(
        F.col("dot").desc(), F.col("vec_id")
    )
    wglob = Window.partitionBy("anchor_id", "same").orderBy(
        F.col("dot").desc(), F.col("vec_id")
    )
    best = (
        cand.withColumn("_r", F.row_number().over(wloc))
        .filter(F.col("_r") == 1)
        .withColumn("rn", F.row_number().over(wglob))
        .filter(F.col("rn") == 1)
    )
    return best.groupBy("anchor_id").agg(
        F.expr("CAST(MAX(alabel) AS BIGINT)").alias("label"),
        F.expr("CAST(MAX(CASE WHEN same THEN vec_id END) AS BIGINT)").alias(
            "pos_id"
        ),
        F.expr("CAST(MAX(CASE WHEN same THEN dot END) AS BIGINT)").alias(
            "pos_dot"
        ),
        F.expr("CAST(MAX(CASE WHEN NOT same THEN vec_id END) AS BIGINT)").alias(
            "neg_id"
        ),
        F.expr("CAST(MAX(CASE WHEN NOT same THEN dot END) AS BIGINT)").alias(
            "neg_dot"
        ),
        F.expr(
            "CAST(MAX(CASE WHEN same THEN dot END)"
            " - MAX(CASE WHEN NOT same THEN dot END) AS BIGINT)"
        ).alias("margin"),
    )


@q(
    "text_kn_bigram",
    """WITH toks AS (
         SELECT doc_id, string_split_regex(trim(text), '\\s+') AS ts
         FROM documents WHERE lang = 'en' AND
              len(string_split_regex(trim(text), '\\s+')) >= 2),
       bg AS (
         SELECT ts[i] AS v, ts[i + 1] AS w
         FROM toks, unnest(range(1, len(ts))) AS r(i)),
       cvw AS (
         SELECT v, w, CAST(COUNT(*) AS BIGINT) AS c_vw
         FROM bg GROUP BY v, w),
       cv AS (
         SELECT v, CAST(SUM(c_vw) AS BIGINT) AS c_v,
                CAST(COUNT(*) AS BIGINT) AS n1_fwd
         FROM cvw GROUP BY v),
       cw AS (
         SELECT w, CAST(COUNT(*) AS BIGINT) AS n1_bwd
         FROM cvw GROUP BY w),
       tt AS (SELECT CAST(COUNT(*) AS BIGINT) AS t_types FROM cvw),
       kn AS (
         SELECT b.v, b.w, b.c_vw, cv.c_v, cv.n1_fwd, cw.n1_bwd, tt.t_types,
                CAST(1000000 * (GREATEST(4 * CAST(b.c_vw AS HUGEINT) - 3, 0)
                         * tt.t_types
                       + 3 * CAST(cv.n1_fwd AS HUGEINT) * cw.n1_bwd)
                     // (4 * CAST(cv.c_v AS HUGEINT) * tt.t_types)
                     AS BIGINT) AS p_kn_ppm
         FROM cvw b
         JOIN cv ON cv.v = b.v
         JOIN cw ON cw.w = b.w
         CROSS JOIN tt)
       SELECT v, w, c_vw, c_v, n1_fwd, n1_bwd, t_types, p_kn_ppm
       FROM kn ORDER BY c_vw DESC, v, w LIMIT 50""",
)
def text_kn_bigram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K4+ Kneser–Ney smoothed bigram language model (Kneser & Ney 1995
    — the classical n-gram LM every perplexity-based quality filter
    descends from): p(w|v) = (max(c(vw)−D, 0) + D·N1+(v·)·p_cont(w)) /
    c(v) with the continuation probability p_cont(w) = N1+(·w)/|types|.
    The discount D = 0.75 = 3/4 makes the whole formula EXACT integer
    arithmetic in quarters — numerator and denominator are multiplied
    through by 4·|types|, then ppm-quantized with the shared truncating
    DIV (no float anywhere; the oracle twin runs the same rational).
    Emits the 50 highest-count bigrams with their smoothed
    probabilities. Scale: bigram generation is one scan with an
    index-HOF explode (no self-join); the three count tables are keyed
    aggs with map-side partials; |types| is a 1-row broadcast scalar;
    top-50 is TakeOrdered."""
    d = read_table(spark, sf_dir, "documents")
    toks = (
        d.filter(F.col("lang") == "en")
        .select(F.split(F.trim(F.col("text")), r"\s+").alias("ts"))
        .filter(F.expr("size(ts) >= 2"))
    )
    bg = toks.select(
        F.expr(
            "explode(transform(sequence(1, size(ts) - 1),"
            " i -> named_struct('v', element_at(ts, i),"
            " 'w', element_at(ts, i + 1))))"
        ).alias("p")
    ).select(F.col("p.v").alias("v"), F.col("p.w").alias("w"))
    cvw = bg.groupBy("v", "w").agg(F.count(F.lit(1)).cast("bigint").alias("c_vw"))
    cv = cvw.groupBy("v").agg(
        F.expr("CAST(SUM(c_vw) AS BIGINT)").alias("c_v"),
        F.count(F.lit(1)).cast("bigint").alias("n1_fwd"),
    )
    cw = cvw.groupBy("w").agg(F.count(F.lit(1)).cast("bigint").alias("n1_bwd"))
    tt = cvw.agg(F.count(F.lit(1)).cast("bigint").alias("t_types"))
    D = "DECIMAL(38,0)"
    kn = (
        cvw.join(cv, "v")
        .join(cw, "w")
        .crossJoin(F.broadcast(tt))
        .select(
            "v",
            "w",
            "c_vw",
            "c_v",
            "n1_fwd",
            "n1_bwd",
            "t_types",
            F.expr(
                f"CAST(1000000 * (GREATEST(4 * CAST(c_vw AS {D}) - 3, 0)"
                f" * t_types + 3 * CAST(n1_fwd AS {D}) * n1_bwd)"
                f" DIV (4 * CAST(c_v AS {D}) * t_types) AS BIGINT)"
            ).alias("p_kn_ppm"),
        )
    )
    return kn.orderBy(F.col("c_vw").desc(), "v", "w").limit(50)


def _mmr_oracle_sql(k: int = 5) -> str:
    """Unrolled k-round MMR greedy as DuckDB CTEs (round r excludes the
    r-1 already-selected ids and penalizes by the GREATEST pairwise
    dot to them)."""
    rounds = []
    selects = ["SELECT query_id, 1 AS round, vec_id, score FROM s1"]
    rounds.append(
        """s1 AS (
         SELECT query_id, vec_id, rel AS score FROM pool
         QUALIFY ROW_NUMBER() OVER (PARTITION BY query_id
                  ORDER BY rel DESC, vec_id) = 1)"""
    )
    for r in range(2, k + 1):
        prev = range(1, r)
        excl = " AND ".join(f"p.vec_id != s{i}.vec_id" for i in prev)
        joins = "\n         ".join(
            f"JOIN s{i} ON s{i}.query_id = p.query_id" for i in prev
        )
        pjoins = "\n         ".join(
            f"JOIN pairs d{i} ON d{i}.query_id = p.query_id"
            f" AND d{i}.da = p.vec_id AND d{i}.db = s{i}.vec_id"
            for i in prev
        )
        pen = (
            f"GREATEST({', '.join(f'd{i}.d' for i in prev)})"
            if r > 2
            else "d1.d"
        )
        rounds.append(
            f"""c{r} AS (
         SELECT p.query_id, p.vec_id, p.rel - {pen} AS score
         FROM pool p
         {joins}
         {pjoins}
         WHERE {excl}),
       s{r} AS (
         SELECT query_id, vec_id, score FROM c{r}
         QUALIFY ROW_NUMBER() OVER (PARTITION BY query_id
                  ORDER BY score DESC, vec_id) = 1)"""
        )
        selects.append(
            f"SELECT query_id, {r} AS round, vec_id, score FROM s{r}"
        )
    body = ",\n       ".join(rounds)
    union = "\n       UNION ALL ".join(selects)
    return f"""WITH qz AS (
         SELECT vec_id,
                list_transform(embedding,
                    x -> CAST(FLOOR(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS qv
         FROM embeddings),
       qs AS (SELECT vec_id AS query_id, qv AS pq
              FROM qz ORDER BY vec_id LIMIT 5),
       cand AS (
         SELECT query_id, vec_id, qv,
                CAST(list_aggregate(list_transform(list_zip(qv, pq),
                     s -> s[1] * s[2]), 'sum') AS BIGINT) AS rel
         FROM qz CROSS JOIN qs WHERE vec_id != query_id),
       pool AS (
         SELECT query_id, vec_id, qv, rel FROM cand
         QUALIFY ROW_NUMBER() OVER (PARTITION BY query_id
                  ORDER BY rel DESC, vec_id) <= 10),
       pairs AS (
         SELECT a.query_id, a.vec_id AS da, b.vec_id AS db,
                CAST(list_aggregate(list_transform(list_zip(a.qv, b.qv),
                     s -> s[1] * s[2]), 'sum') AS BIGINT) AS d
         FROM pool a JOIN pool b
           ON a.query_id = b.query_id AND a.vec_id != b.vec_id),
       {body},
       res AS ({union})
       SELECT query_id, CAST(round AS BIGINT) AS round, vec_id,
              CAST(score AS BIGINT) AS mmr_score
       FROM res"""


@q("sim_mmr_rerank", _mmr_oracle_sql())
def sim_mmr_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K3+ Maximal Marginal Relevance re-rank (Carbonell & Goldstein
    1998 — the diversity pass between retrieval and the context
    window): per query, greedily pick 5 of the dot-product top-10 to
    maximize relevance minus max-similarity-to-selected (λ = 1/2 makes
    the argmax rel − max_sim, exact integers). Spark path: salted
    two-phase top-10 pools, then ONE applyInPandas group per query
    where the pairwise-penalty matrix is a 10×10 int64 matmul
    (operators/similarity.py:mmr_rerank); the oracle unrolls the 5
    greedy rounds as CTEs — same selections, proven bit-identical.
    Scale: candidate pools bound every task; the greedy group is
    pool-sized regardless of corpus size."""
    from varda_spark.operators.similarity import mmr_rerank

    e = read_table(spark, sf_dir, "embeddings")
    return mmr_rerank(e, n_queries=5, pool=10, k=5, scale=1000)


@q(
    "graph_rich_club",
    f"""WITH {_COORDER_EDGES_SQL},
       deg AS (
         SELECT node, CAST(COUNT(*) AS BIGINT) AS degree FROM (
           SELECT pa AS node FROM e UNION ALL SELECT pb AS node FROM e)
         GROUP BY node),
       ehist AS (
         SELECT LEAST(da.degree, db.degree) AS mindeg,
                CAST(COUNT(*) AS BIGINT) AS cnt
         FROM e JOIN deg da ON da.node = e.pa
                JOIN deg db ON db.node = e.pb
         GROUP BY 1),
       nhist AS (
         SELECT degree, CAST(COUNT(*) AS BIGINT) AS cnt
         FROM deg GROUP BY degree),
       ks AS (SELECT unnest([2, 4, 8, 16, 32]) AS k),
       club AS (
         SELECT ks.k,
                (SELECT COALESCE(SUM(cnt), 0) FROM nhist
                 WHERE degree > ks.k) AS n_nodes,
                (SELECT COALESCE(SUM(cnt), 0) FROM ehist
                 WHERE mindeg > ks.k) AS n_edges
         FROM ks)
       SELECT CAST(k AS BIGINT) AS k,
              CAST(n_nodes AS BIGINT) AS n_nodes,
              CAST(n_edges AS BIGINT) AS n_edges,
              CAST(CASE WHEN n_nodes >= 2
                   THEN 2000000 * n_edges // (n_nodes * (n_nodes - 1))
                   ELSE 0 END AS BIGINT) AS phi_ppm
       FROM club""",
)
def graph_rich_club(spark: SparkSession, sf_dir: str) -> DataFrame:
    """graph+ rich-club coefficient (Zhou & Mondragón 2004): for each
    degree threshold k, the density φ(k) = 2·E_k / (N_k·(N_k−1)) among
    nodes of degree > k — do the hubs of the co-purchase graph wire to
    each other more than chance (the hub-interconnection question
    behind core decomposition and assortativity, both shipped). Exact:
    integer counts, ppm truncating DIV. Scale: degrees are one keyed
    agg; per-edge min-degree needs the same two deg joins every graph
    key pays; both reduce to DEGREE-HISTOGRAMS (bounded by the distinct
    degree count), and the 5-threshold spine probes those tiny tables —
    no per-threshold rescans of the edge list."""
    e = _coorder_edges(spark, sf_dir)
    deg = (
        e.select(F.col("pa").alias("node"))
        .unionAll(e.select(F.col("pb").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("bigint").alias("degree"))
    )
    ehist = (
        e.join(deg.withColumnRenamed("node", "pa").withColumnRenamed("degree", "dda"), "pa")
        .join(deg.withColumnRenamed("node", "pb").withColumnRenamed("degree", "ddb"), "pb")
        .groupBy(F.expr("LEAST(dda, ddb)").alias("mindeg"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    )
    nhist = deg.groupBy("degree").agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt")
    )
    ks = spark.range(1).select(
        F.explode(F.expr("array(2, 4, 8, 16, 32)")).alias("k")
    )
    nn = (
        ks.join(F.broadcast(nhist), F.col("degree") > F.col("k"), "left")
        .groupBy("k")
        .agg(F.expr("CAST(COALESCE(SUM(cnt), 0) AS BIGINT)").alias("n_nodes"))
    )
    ne = (
        ks.join(F.broadcast(ehist), F.col("mindeg") > F.col("k"), "left")
        .groupBy("k")
        .agg(F.expr("CAST(COALESCE(SUM(cnt), 0) AS BIGINT)").alias("n_edges"))
    )
    return nn.join(ne, "k").select(
        F.col("k").cast("bigint").alias("k"),
        "n_nodes",
        "n_edges",
        F.expr(
            "CAST(CASE WHEN n_nodes >= 2"
            " THEN 2000000 * n_edges DIV (n_nodes * (n_nodes - 1))"
            " ELSE 0 END AS BIGINT)"
        ).alias("phi_ppm"),
    )


@q(
    "interval_coverage_gini",
    """WITH iv AS (
         SELECT CAST(s_suppkey % 5 AS VARCHAR) AS chromosome,
                s_suppkey * 97 + 1 AS begin,
                s_suppkey * 97 + 1 + 200 + (s_suppkey % 7) * 500 AS iv_end
         FROM supplier),
       ev AS (
         SELECT chromosome, begin AS pos, 1 AS delta FROM iv
         UNION ALL
         SELECT chromosome, iv_end AS pos, -1 AS delta FROM iv),
       agg AS (
         SELECT chromosome, pos, SUM(delta) AS d
         FROM ev GROUP BY chromosome, pos),
       sw AS (
         SELECT chromosome, pos,
                SUM(d) OVER (PARTITION BY chromosome ORDER BY pos) AS depth,
                LEAD(pos) OVER (PARTITION BY chromosome ORDER BY pos)
                  AS next_pos
         FROM agg),
       hist AS (
         SELECT CAST(depth AS BIGINT) AS depth,
                CAST(SUM(next_pos - pos) AS BIGINT) AS bases
         FROM sw WHERE next_pos IS NOT NULL AND depth > 0
         GROUP BY depth),
       ranked AS (
         SELECT depth, bases,
                SUM(bases) OVER (ORDER BY depth) AS cw,
                SUM(bases) OVER () AS w,
                SUM(depth * bases) OVER () AS s
         FROM hist)
       SELECT CAST(COUNT(*) AS BIGINT) AS n_depths,
              CAST(MAX(w) AS BIGINT) AS covered_bases,
              CAST(1000 * MAX(s) // MAX(w) AS BIGINT) AS mean_depth_milli,
              CAST(1000000 * SUM(CAST(depth AS HUGEINT) * bases
                       * (2 * cw - bases - w))
                   // (CAST(MAX(w) AS HUGEINT) * MAX(s)) AS BIGINT)
                AS gini_ppm
       FROM ranked""",
)
def interval_coverage_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C1+ coverage-uniformity Gini (the evenness score sequencing QC
    reports next to mean depth — Picard/mosdepth territory): the Gini
    coefficient of the per-base depth distribution over covered bases,
    from the same sweep-line depth segments as interval_depth_hist.
    Exactness: the weighted sorted-rank identity Σ w·d·(2·CW − w − W) /
    (W·Σ w·d) is computed entirely in HUGEINT/DECIMAL(38,0) on the
    depth HISTOGRAM (grouped weights make the classic rank formula
    exact — no per-base rows, no floats), ppm-quantized. Scale: sweep
    line is chromosome-partitioned; the Gini windows run over the
    depth-histogram (≤ max-depth rows, value-domain-bounded —
    whitelisted)."""
    _, s = _points_intervals(spark, sf_dir)
    iv = s.select("chromosome", "begin", F.col("end").alias("iv_end"))
    ev = iv.select(
        "chromosome", F.col("begin").alias("pos"), F.lit(1).alias("delta")
    ).unionAll(
        iv.select(
            "chromosome", F.col("iv_end").alias("pos"), F.lit(-1).alias("delta")
        )
    )
    agg = ev.groupBy("chromosome", "pos").agg(F.sum("delta").alias("d"))
    w = Window.partitionBy("chromosome").orderBy("pos")
    sw = agg.select(
        "pos",
        F.sum("d").over(w).alias("depth"),
        F.lead("pos").over(w).alias("next_pos"),
    )
    hist = (
        sw.filter(F.col("next_pos").isNotNull() & (F.col("depth") > 0))
        .groupBy(F.col("depth").cast("bigint").alias("depth"))
        .agg(F.sum(F.col("next_pos") - F.col("pos")).cast("bigint").alias("bases"))
    )
    wr = Window.orderBy("depth")
    wfull = Window.partitionBy().orderBy().rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    D = "DECIMAL(38,0)"
    ranked = hist.select(
        "depth",
        "bases",
        F.sum("bases").over(wr).alias("cw"),
        F.sum("bases").over(wfull).alias("w"),
        F.expr("depth * bases").alias("db"),
    ).withColumn("s", F.expr("SUM(db)").over(wfull))
    return ranked.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_depths"),
        F.expr("CAST(MAX(w) AS BIGINT)").alias("covered_bases"),
        F.expr("CAST(1000 * MAX(s) DIV MAX(w) AS BIGINT)").alias(
            "mean_depth_milli"
        ),
        F.expr(
            f"CAST(1000000 * SUM(CAST(depth AS {D}) * bases"
            f" * (2 * cw - bases - w))"
            f" DIV (CAST(MAX(w) AS {D}) * MAX(s)) AS BIGINT)"
        ).alias("gini_ppm"),
    )


@q(
    "text_bleu_pairs",
    """WITH en AS (
         SELECT doc_id, text,
                ROW_NUMBER() OVER (ORDER BY doc_id) AS rn
         FROM documents WHERE lang = 'en'
         ORDER BY doc_id LIMIT 20),
       pairs AS (
         SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
         FROM en a JOIN en b ON b.rn = a.rn + 1 WHERE a.rn % 2 = 1),
       toks AS (
         SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS t
         FROM en),
       uni AS (
         SELECT doc_id, t, CAST(COUNT(*) AS BIGINT) AS c
         FROM toks GROUP BY doc_id, t),
       bi AS (
         SELECT doc_id, ts[i] || ' ' || ts[i + 1] AS t,
                CAST(COUNT(*) AS BIGINT) AS c
         FROM (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS ts
               FROM en WHERE len(string_split_regex(trim(text), '\\s+')) >= 2),
              unnest(range(1, len(ts))) AS r(i)
         GROUP BY doc_id, t),
       p1 AS (
         SELECT p.doc_a, p.doc_b,
                CAST(SUM(LEAST(a.c, COALESCE(b.c, 0))) AS BIGINT) AS hits,
                CAST(SUM(a.c) AS BIGINT) AS total
         FROM pairs p
         JOIN uni a ON a.doc_id = p.doc_a
         LEFT JOIN uni b ON b.doc_id = p.doc_b AND b.t = a.t
         GROUP BY p.doc_a, p.doc_b),
       p2 AS (
         SELECT p.doc_a, p.doc_b,
                CAST(SUM(LEAST(a.c, COALESCE(b.c, 0))) AS BIGINT) AS hits,
                CAST(SUM(a.c) AS BIGINT) AS total
         FROM pairs p
         JOIN bi a ON a.doc_id = p.doc_a
         LEFT JOIN bi b ON b.doc_id = p.doc_b AND b.t = a.t
         GROUP BY p.doc_a, p.doc_b)
       SELECT p1.doc_a, p1.doc_b,
              CAST(1000000 * p1.hits // p1.total AS BIGINT) AS bleu1_ppm,
              CAST(1000000 * p2.hits // p2.total AS BIGINT) AS bleu2_ppm,
              p1.total AS n_unigrams, p2.total AS n_bigrams
       FROM p1 JOIN p2 ON p2.doc_a = p1.doc_a AND p2.doc_b = p1.doc_b""",
)
def text_bleu_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K4+ modified n-gram precision (the BLEU-1/BLEU-2 core, Papineni
    et al. 2002, without the brevity penalty's float exp) between the
    10 consecutive pairs of the first 20 'en' documents — the
    similarity EVAL metric (clipped multiset overlap) that Jaccard /
    containment keys can't express because they ignore counts.
    Exactness: min-clipped integer counts, ppm truncating DIV. Scale:
    the eval set is a TakeOrdered(20) head (documented — BLEU is an
    eval-set metric, not a corpus scan); n-gram count tables are keyed
    aggs over those 20 docs only; everything joins on (doc, gram)."""
    d = read_table(spark, sf_dir, "documents")
    en = (
        d.filter(F.col("lang") == "en")
        .select("doc_id", "text")
        .orderBy("doc_id")
        .limit(20)
        .withColumn("rn", F.row_number().over(Window.orderBy("doc_id")))
    )
    pairs = (
        en.alias("a")
        .join(en.alias("b"), F.expr("b.rn = a.rn + 1 AND a.rn % 2 = 1"))
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
    )
    toks = en.select(
        "doc_id", F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("t")
    )
    uni = toks.groupBy("doc_id", "t").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    bi = (
        en.select("doc_id", F.split(F.trim(F.col("text")), r"\s+").alias("ts"))
        .filter(F.expr("size(ts) >= 2"))
        .select(
            "doc_id",
            F.expr(
                "explode(transform(sequence(1, size(ts) - 1),"
                " i -> concat(element_at(ts, i), ' ', element_at(ts, i + 1))))"
            ).alias("t"),
        )
        .groupBy("doc_id", "t")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )

    def prec(grams: DataFrame) -> DataFrame:
        a = grams.alias("a")
        b = grams.alias("b")
        return (
            pairs.join(a, F.expr("a.doc_id = doc_a"))
            .join(
                b,
                F.expr("b.doc_id = doc_b AND b.t = a.t"),
                "left",
            )
            .groupBy("doc_a", "doc_b")
            .agg(
                F.expr(
                    "CAST(SUM(LEAST(a.c, COALESCE(b.c, 0))) AS BIGINT)"
                ).alias("hits"),
                F.expr("CAST(SUM(a.c) AS BIGINT)").alias("total"),
            )
        )

    p1 = prec(uni).select(
        "doc_a",
        "doc_b",
        F.expr("CAST(1000000 * hits DIV total AS BIGINT)").alias("bleu1_ppm"),
        F.col("total").alias("n_unigrams"),
    )
    p2 = prec(bi).select(
        "doc_a",
        "doc_b",
        F.expr("CAST(1000000 * hits DIV total AS BIGINT)").alias("bleu2_ppm"),
        F.col("total").alias("n_bigrams"),
    )
    return p1.join(p2, ["doc_a", "doc_b"]).select(
        "doc_a", "doc_b", "bleu1_ppm", "bleu2_ppm", "n_unigrams", "n_bigrams"
    )


@q(
    "store_deletion_vectors",
    """WITH dv AS (
         SELECT o_orderkey FROM orders WHERE o_orderkey % 13 = 0),
       live AS (
         SELECT o.* FROM orders o
         WHERE NOT EXISTS (SELECT 1 FROM dv
                           WHERE dv.o_orderkey = o.o_orderkey)),
       stats AS (
         SELECT CAST(year(CAST(o_orderdate AS DATE)) * 100
                     + month(CAST(o_orderdate AS DATE)) AS BIGINT) AS part_ym,
                CAST(COUNT(*) AS BIGINT) AS n_rows,
                CAST(SUM(CASE WHEN o_orderkey % 13 = 0 THEN 1 ELSE 0 END)
                     AS BIGINT) AS n_deleted
         FROM orders GROUP BY 1),
       lv AS (
         SELECT CAST(year(CAST(o_orderdate AS DATE)) * 100
                     + month(CAST(o_orderdate AS DATE)) AS BIGINT) AS part_ym,
                CAST(COUNT(*) AS BIGINT) AS n_live
         FROM live GROUP BY 1)
       SELECT s.part_ym, s.n_rows, s.n_deleted, lv.n_live,
              CAST(1000000 * s.n_deleted // s.n_rows AS BIGINT) AS dv_ppm,
              1000000 * s.n_deleted // s.n_rows > 200000 AS rewrite
       FROM stats s JOIN lv ON lv.part_ym = s.part_ym""",
)
def store_deletion_vectors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5+ deletion-vector maintenance (the Delta/Iceberg merge-on-read
    DELETE path): a DV side table marks rows deleted without rewriting
    data files (here every 13th orderkey, simulating a later MERGE
    batch); the live view is the base table ANTI-JOINED against the DV,
    and per month-partition the advisor reports the DV ratio and flags
    partitions past the 20% rewrite threshold (the compaction trigger
    real lakehouses use — complements store_compaction_plan's
    small-file half). Exactness: integer counts, ppm truncating DIV,
    and n_live comes from the REAL anti-join (not n_rows − n_deleted)
    so the key also proves the read path. Scale: the anti-join shuffles
    on the table's own key (co-partitioned at write time in a real
    layout); both rollups are keyed aggs with map-side partials."""
    o = read_table(spark, sf_dir, "orders")
    ym = F.expr(
        "CAST(year(CAST(o_orderdate AS DATE)) * 100"
        " + month(CAST(o_orderdate AS DATE)) AS BIGINT)"
    )
    dv = o.filter("o_orderkey % 13 = 0").select("o_orderkey")
    live = o.join(dv, "o_orderkey", "left_anti")
    stats = o.groupBy(ym.alias("part_ym")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.expr(
            "CAST(SUM(CASE WHEN o_orderkey % 13 = 0 THEN 1 ELSE 0 END)"
            " AS BIGINT)"
        ).alias("n_deleted"),
    )
    lv = live.groupBy(ym.alias("part_ym")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_live")
    )
    return stats.join(lv, "part_ym").select(
        "part_ym",
        "n_rows",
        "n_deleted",
        "n_live",
        F.expr("CAST(1000000 * n_deleted DIV n_rows AS BIGINT)").alias("dv_ppm"),
        F.expr("1000000 * n_deleted DIV n_rows > 200000").alias("rewrite"),
    )


def _reorder_registry() -> None:
    missing = [k for k in _DRIVER_PRIORITY if k not in REGISTRY]
    assert not missing, f"_DRIVER_PRIORITY names unknown keys: {missing}"
    snapshot = dict(REGISTRY)
    rest = [k for k in snapshot if k not in set(_DRIVER_PRIORITY)]
    REGISTRY.clear()
    for k in [*_DRIVER_PRIORITY, *rest]:
        REGISTRY[k] = snapshot[k]


_reorder_registry()
