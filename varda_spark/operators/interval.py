"""Point-in-interval and range-overlap joins — THE core join of the engine.

Reference shape (public varda denominator query, SURVEY.md §2.C1): "which
samples have a coverage Region containing (chromosome, position)?". In
PostgreSQL that's a composite-index lookup on (chromosome, bin); our Spark
translation is the binned equi-join rewrite from operators/binning.py.

Scale behaviour: both sides shuffle-hash-partition on (chromosome, bin) —
at 100 TB that's an even, prunable key space (chromosome is also the
parquet partition key, so partition pruning kicks in for single-locus
lookups); no nested-loop, no cross product. Point-side fan-out is exactly
5 rows per point (the 5 bin levels), interval side is 1 row each.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from varda_spark.operators.binning import point_bins, range_bins, with_bin


# Cap for choosing the BNLJ-broadcast strategy, deliberately far below
# autoBroadcastJoinThreshold: a broadcast NESTED-LOOP join compares every
# point row against EVERY broadcast interval (no hash index on a range
# predicate), so its cost is O(points × intervals) no matter how cheaply
# the intervals ship. "Fits in the broadcast" is the wrong test — at sf5
# Catalyst estimated a 50k-row interval side at 414 KB, and the resulting
# nested loop read 245 s (round-9 sf5 smoke). 64 KB ≈ ~8k interval rows
# keeps the per-point loop comparable to the binned path's per-point
# candidate count while preserving the measured sf0.1 broadcast win
# (0.4 s vs 1.4 s binned on a ~1k-row side).
_BNLJ_BROADCAST_CAP = 64 * 1024


def _fits_broadcast(df: DataFrame) -> bool:
    """True iff Catalyst's optimized-plan size estimate for ``df`` (the
    whole row ships in the broadcast) is within BOTH the session's
    autoBroadcastJoinThreshold and the BNLJ work cap above. Plan
    statistics only — no job runs."""
    spark = df.sparkSession
    try:
        thr = int(spark._jsparkSession.sessionState().conf().autoBroadcastJoinThreshold())
    except Exception:
        thr = 10 * 1024 * 1024
    if thr <= 0:  # broadcast disabled session-wide → honor it
        return False
    thr = min(thr, _BNLJ_BROADCAST_CAP)
    size = int(str(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()))
    return 0 <= size <= thr


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    *,
    point_chrom: str = "chromosome",
    point_pos: str = "position",
    ival_chrom: str = "chromosome",
    ival_begin: str = "begin",
    ival_end: str = "end",
    how: str = "inner",
    strategy: str = "auto",
) -> DataFrame:
    """Join each point to every closed interval [begin,end] containing it.

    strategy='binned': equi-join on (chromosome, bin) + residual range
    predicate — the scale path; both sides shuffle on an even key.
    strategy='broadcast': plain theta join with the interval side broadcast
    (BroadcastNestedLoop) — measured FASTER when the interval side fits in
    a broadcast (sf0.1: 0.4s vs 1.4s binned) because it skips the explode
    and shuffle entirely; unusable when both sides are large.
    strategy='auto' (default): pick broadcast iff Catalyst's own plan
    statistics put the interval side at or under
    spark.sql.autoBroadcastJoinThreshold — the same size estimate and
    threshold Spark's planner uses for its broadcast decision, read off
    the optimized plan at ZERO job cost (file-size based for scans,
    propagated through filters/projects). This is the knob a real user
    otherwise gets wrong: at 100 TB the interval side is usually a
    bounded region dimension, and silently running the binned shuffle for
    a 2 MB BED file wastes the whole win.

    Interval columns keep their names; clashing names on the interval side
    get an ``i_`` prefix.
    """
    if strategy == "auto":
        strategy = "broadcast" if _fits_broadcast(intervals) else "binned"
    if strategy == "broadcast":
        return interval_join_naive(
            points,
            F.broadcast(intervals),
            point_chrom=point_chrom,
            point_pos=point_pos,
            ival_chrom=ival_chrom,
            ival_begin=ival_begin,
            ival_end=ival_end,
        )
    pts = points.withColumn("_bin", F.explode(point_bins(point_pos)))
    ivs = with_bin(intervals, ival_begin, ival_end, out="_bin")
    # disambiguate clashing column names (e.g. both sides have 'chromosome')
    clash = set(pts.columns) & set(ivs.columns) - {"_bin"}
    for c in clash:
        ivs = ivs.withColumnRenamed(c, f"i_{c}")
        if c == ival_chrom:
            ival_chrom = f"i_{c}"
        if c == ival_begin:
            ival_begin = f"i_{c}"
        if c == ival_end:
            ival_end = f"i_{c}"
    cond = (
        (F.col(point_chrom) == F.col(ival_chrom))
        & (pts["_bin"] == ivs["_bin"])
        & (F.col(point_pos) >= F.col(ival_begin))
        & (F.col(point_pos) <= F.col(ival_end))
    )
    return pts.join(ivs, cond, how).drop("_bin")


def range_overlap_join(
    left: DataFrame,
    right: DataFrame,
    *,
    left_keys: tuple[str, str, str] = ("chromosome", "begin", "end"),
    right_keys: tuple[str, str, str] = ("chromosome", "begin", "end"),
) -> DataFrame:
    """Join intervals that overlap (closed-interval semantics).

    The smaller/query side explodes to all candidate bins (bounded by the
    5-level hierarchy), the stored side carries its single enclosing bin.
    """
    lc, lb, le = left_keys
    rc, rb, re_ = right_keys
    lft = left.withColumn("_bin", F.explode(range_bins(lb, le)))
    rgt = with_bin(right, rb, re_, out="_bin")
    clash = set(lft.columns) & set(rgt.columns) - {"_bin"}
    for c in clash:
        rgt = rgt.withColumnRenamed(c, f"r_{c}")
        if c == rc:
            rc = f"r_{c}"
        if c == rb:
            rb = f"r_{c}"
        if c == re_:
            re_ = f"r_{c}"
    cond = (
        (F.col(lc) == F.col(rc))
        & (lft["_bin"] == rgt["_bin"])
        & (F.col(lb) <= F.col(re_))
        & (F.col(le) >= F.col(rb))
    )
    return lft.join(rgt, cond, "inner").drop("_bin")


def interval_join_naive(
    points: DataFrame,
    intervals: DataFrame,
    *,
    point_chrom: str = "chromosome",
    point_pos: str = "position",
    ival_chrom: str = "chromosome",
    ival_begin: str = "begin",
    ival_end: str = "end",
) -> DataFrame:
    """Reference implementation: plain theta join (BroadcastNestedLoop).

    Only for property-testing the binned rewrite and for genuinely tiny
    interval sides. Never the scale path.
    """
    ivs = intervals
    clash = set(points.columns) & set(ivs.columns)
    for c in clash:
        ivs = ivs.withColumnRenamed(c, f"i_{c}")
        if c == ival_chrom:
            ival_chrom = f"i_{c}"
        if c == ival_begin:
            ival_begin = f"i_{c}"
        if c == ival_end:
            ival_end = f"i_{c}"
    cond = (
        (F.col(point_chrom) == F.col(ival_chrom))
        & (F.col(point_pos) >= F.col(ival_begin))
        & (F.col(point_pos) <= F.col(ival_end))
    )
    return points.join(ivs, cond, "inner")


def nearest_interval(
    points: DataFrame,
    intervals: DataFrame,
    point_key: str = "p_partkey",
    interval_key: str = "sample_key",
) -> DataFrame:
    """bedtools-closest: for each point the nearest interval (distance 0 if
    overlapping; ties broken by lowest interval key) — WITHOUT an all-pairs
    join, at any scale.

    Three bounded candidate sources, no pair blow-up anywhere:
    1. overlapping intervals (distance 0) from the binned interval join,
       keeping the min key per point — handles the many-overlaps tie,
       where a sweep's single best-end candidate is not the min-key one;
    2. best strictly-left interval from an ascending sweep: running max of
       struct(end, -key) over intervals with begin <= pos (for positive
       distance pos-end, equal distance implies equal end, so -key inside
       the max resolves the tie);
    3. best strictly-right interval from a descending sweep: running min
       of struct(begin, key) (equal distance implies equal begin).
    The brute-force nearest with (distance, key) tie-break — which is what
    the oracle computes — is provably one of the three. Cost: one shuffle
    on (chromosome, bin), one on chromosome, two sorted windows.
    """
    from pyspark.sql.window import Window

    ev_iv = intervals.select(
        "chromosome",
        F.col("begin").alias("k"),
        F.lit(0).alias("tag"),
        F.struct(F.col("end").alias("e"), (-F.col(interval_key)).alias("nk")).alias("lcand"),
        F.struct(F.col("begin").alias("b"), F.col(interval_key).alias("pk")).alias("rcand"),
        F.lit(None).cast("long").alias("position"),
        F.lit(None).cast("long").alias(point_key),
    )
    ev_pt = points.select(
        "chromosome",
        F.col("position").alias("k"),
        F.lit(1).alias("tag"),
        F.lit(None).cast("struct<e:long,nk:long>").alias("lcand"),
        F.lit(None).cast("struct<b:long,pk:long>").alias("rcand"),
        "position",
        point_key,
    )
    ev = ev_iv.unionByName(ev_pt)
    # ascending: intervals (tag 0) before points at equal k → begin <= pos
    wl = Window.partitionBy("chromosome").orderBy("k", "tag").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    # descending: intervals before points at equal k → begin >= pos
    wr = Window.partitionBy("chromosome").orderBy(F.col("k").desc(), F.col("tag").asc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    swept = (
        ev.withColumn("bestl", F.max("lcand").over(wl))
        .withColumn("bestr", F.min("rcand").over(wr))
        .filter(F.col("tag") == 1)
    )
    # left candidate only counts when strictly left (end < pos): overlap is
    # source 1's job, and a left-overlapping best-end interval need not be
    # the min-key overlap
    dl = F.when(F.col("bestl.e") < F.col("position"), F.col("position") - F.col("bestl.e"))
    kl = -F.col("bestl.nk")
    dr = F.when(F.col("bestr.b") > F.col("position"), F.col("bestr.b") - F.col("position"))
    kr = F.col("bestr.pk")
    use_left = dl.isNotNull() & (dr.isNull() | (dl < dr) | ((dl == dr) & (kl <= kr)))
    side = swept.select(
        "chromosome",
        "position",
        point_key,
        F.when(use_left, kl).otherwise(kr).cast("bigint").alias("s_key"),
        F.when(use_left, dl).otherwise(dr).cast("bigint").alias("s_dist"),
    )
    ov = (
        interval_join(
            points,
            intervals.select("chromosome", "begin", "end", interval_key),
            strategy="binned",
        )
        .groupBy("chromosome", "position", point_key)
        .agg(F.min(interval_key).alias("ov_key"))
    )
    return side.join(ov, ["chromosome", "position", point_key], "left").select(
        "chromosome",
        "position",
        point_key,
        F.coalesce(F.col("ov_key"), F.col("s_key")).cast("bigint").alias("nearest_key"),
        F.when(F.col("ov_key").isNotNull(), F.lit(0))
        .otherwise(F.col("s_dist"))
        .cast("bigint")
        .alias("distance"),
    )


def knn_intervals(
    points: DataFrame,
    intervals: DataFrame,
    k: int = 3,
    point_key: str = "p_partkey",
    interval_key: str = "sample_key",
) -> DataFrame:
    """k nearest intervals per point by (distance, key) — WITHOUT a
    per-chromosome pair join, at any scale (the k>1 generalization of
    nearest_interval's sweep; replaces the plan that read 243 s at sf1,
    normalized 16.9, in the round-9 full-catalog smoke).

    Three bounded candidate pools, provably covering the exact top-k:
    1. OVERLAPS (distance 0): binned interval join, k smallest keys per
       point — any overlap in the true top-k must be among them, since
       overlaps all tie at distance 0 and tie-break by key;
    2. STRICT LEFT (distance = pos − end > 0): the true left top-k is
       the first k in (end DESC, key ASC) order ≡ the LAST k in
       (end ASC, key DESC) rank order — exact even with tied ends. A
       merged sweep (points and interval ENDS sorted together, points
       first at equal coordinate so end == pos stays out) counts cl =
       #​intervals strictly left, and an equi-join on rank ∈
       {cl−k+1..cl} fetches the candidates;
    3. STRICT RIGHT symmetric: rank by (begin ASC, key ASC), intervals
       first at equal coordinate so begin == pos counts as overlap, and
       candidates are rank ∈ {cr+1..cr+k}.
    The pools are disjoint (end < pos / begin ≤ pos ≤ end / begin > pos)
    so a final ≤3k-row-per-point (distance, key) window yields the exact
    answer the brute-force oracle computes. Cost: two interval rank
    windows + two merged chromosome sweeps + the binned overlap join —
    all chromosome-partitioned, no quadratic pair set anywhere.
    """
    from pyspark.sql.window import Window

    iv = intervals.select("chromosome", "begin", "end", interval_key)
    iv_l = iv.withColumn(
        "rk",
        F.row_number().over(
            Window.partitionBy("chromosome").orderBy(
                F.col("end").asc(), F.col(interval_key).desc()
            )
        ),
    )
    iv_r = iv.withColumn(
        "rk",
        F.row_number().over(
            Window.partitionBy("chromosome").orderBy(
                F.col("begin").asc(), F.col(interval_key).asc()
            )
        ),
    )
    pts = points.select("chromosome", "position", point_key)

    def swept_counts(iv_coord: str, iv_tag: int, pt_tag: int) -> DataFrame:
        ev_iv = iv.select(
            "chromosome",
            F.col(iv_coord).alias("kk"),
            F.lit(iv_tag).alias("tag"),
            F.lit(1).alias("is_iv"),
            F.lit(None).cast("long").alias("position"),
            F.lit(None).cast("long").alias(point_key),
        )
        ev_pt = pts.select(
            "chromosome",
            F.col("position").alias("kk"),
            F.lit(pt_tag).alias("tag"),
            F.lit(0).alias("is_iv"),
            "position",
            point_key,
        )
        w = Window.partitionBy("chromosome").orderBy("kk", "tag").rowsBetween(
            Window.unboundedPreceding, Window.currentRow
        )
        return (
            ev_iv.unionByName(ev_pt)
            .withColumn("c", F.sum("is_iv").over(w))
            .filter(F.col("is_iv") == 0)
            .select("chromosome", "position", point_key, "c")
        )

    # left: points (tag 0) BEFORE interval ends (tag 1) at equal kk
    # → c counts end < pos strictly
    cl = swept_counts("end", iv_tag=1, pt_tag=0)
    # right: interval begins (tag 0) BEFORE points (tag 1) at equal kk
    # → c counts begin <= pos
    cr = swept_counts("begin", iv_tag=0, pt_tag=1)

    offs = F.explode(F.sequence(F.lit(0), F.lit(k - 1))).alias("j")
    lcand = (
        cl.select("chromosome", "position", point_key, "c", offs)
        .withColumn("rk", F.col("c") - F.col("j"))
        .filter(F.col("rk") >= 1)
        .join(iv_l, ["chromosome", "rk"])
        .filter(F.col("end") < F.col("position"))
    )
    rcand = (
        cr.select("chromosome", "position", point_key, "c", offs)
        .withColumn("rk", F.col("c") + 1 + F.col("j"))
        .join(iv_r, ["chromosome", "rk"])
        .filter(F.col("begin") > F.col("position"))
    )
    # binned FORCED (the nearest_interval precedent): the overlap pool's
    # point side is the full point table, so the BNLJ-broadcast shortcut
    # is never the right plan here regardless of interval-side size
    ov = interval_join(pts, iv, strategy="binned")
    wov = Window.partitionBy("chromosome", "position", point_key).orderBy(
        interval_key
    )
    ovc = (
        ov.withColumn("rn", F.row_number().over(wov))
        .filter(F.col("rn") <= k)
    )
    cols = ["chromosome", "position", point_key, "begin", "end", interval_key]
    pool = (
        lcand.select(*cols)
        .unionByName(rcand.select(*cols))
        .unionByName(ovc.select(*cols))
        .withColumn(
            "distance",
            F.greatest(
                F.col("begin") - F.col("position"),
                F.col("position") - F.col("end"),
                F.lit(0),
            ),
        )
    )
    wfin = Window.partitionBy("chromosome", "position", point_key).orderBy(
        "distance", interval_key
    )
    return (
        pool.withColumn("rn", F.row_number().over(wfin))
        .filter(F.col("rn") <= k)
        .select(
            "chromosome",
            "position",
            point_key,
            F.col(interval_key).cast("bigint").alias("nearest_key"),
            F.col("distance").cast("bigint").alias("distance"),
            F.col("rn").cast("bigint").alias("k_rank"),
        )
    )


def merge_intervals(
    intervals: DataFrame,
    chrom: str = "chromosome",
    begin: str = "begin",
    end: str = "end",
) -> DataFrame:
    """bedtools merge: collapse overlapping/touching intervals per
    chromosome into maximal disjoint runs → (chromosome, begin, end,
    n_merged). Gaps-and-islands: sorted per chromosome, an interval opens
    a new island iff its begin exceeds the running max end of everything
    before it; islands then group (one partitioned-window pass + one
    aggregate, no joins — scales to any interval count)."""
    from pyspark.sql.window import Window

    w = Window.partitionBy(chrom).orderBy(begin, end)
    prev_max = F.max(end).over(w.rowsBetween(Window.unboundedPreceding, -1))
    new_island = F.when(prev_max.isNull() | (F.col(begin) > prev_max), 1).otherwise(0)
    island = F.sum(new_island).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return (
        intervals.withColumn("_island", island)
        .groupBy(chrom, "_island")
        .agg(
            F.min(begin).alias(begin),
            F.max(end).alias(end),
            F.count(F.lit(1)).cast("bigint").alias("n_merged"),
        )
        .drop("_island")
    )


def complement_intervals(
    intervals: DataFrame,
    chrom: str = "chromosome",
    begin: str = "begin",
    end: str = "end",
) -> DataFrame:
    """bedtools complement (within the covered span): the gaps BETWEEN
    merged coverage runs per chromosome → (chromosome, begin, end). The
    question varda's coverage model keeps asking inverted — "where do we
    have NO coverage?" — and the input to any fill/backfill job.

    merge first (gaps-and-islands window), then one lead() per merged run:
    a gap exists iff the next run starts more than 1 past this run's end.
    Two partitioned window passes, no joins — scales with interval count."""
    from pyspark.sql.window import Window

    merged = merge_intervals(intervals, chrom, begin, end)
    w = Window.partitionBy(chrom).orderBy(begin)
    nxt = F.lead(begin).over(w)
    return (
        merged.select(chrom, F.col(begin), F.col(end), nxt.alias("_nxt"))
        .filter(F.col("_nxt") > F.col(end) + 1)
        .select(
            chrom,
            (F.col(end) + 1).cast("bigint").alias(begin),
            (F.col("_nxt") - 1).cast("bigint").alias(end),
        )
    )
