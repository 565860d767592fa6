"""Operator catalog: every driver-checked query lives here, Spark + oracle.

Each entry pairs a Spark callable ``(spark, sf_dir) -> DataFrame`` with the
equivalent DuckDB ANSI SQL (or None for non-SQL-expressible ops → the
driver does a rows-only check). Column names are aliased identically on
both sides — the driver's hash compare sorts columns by name.

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
    """A8 REST Range-header paging: ordered offset/limit page 2."""
    c = read_table(spark, sf_dir, "customer")
    w = Window.orderBy("c_name", "c_custkey")
    return (
        c.withColumn("rn", F.row_number().over(w))
        .filter((F.col("rn") > 20) & (F.col("rn") <= 40))
        .select("c_custkey", "c_name")
    )
