package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed POINT-IN-INTERVAL (range) join — the missing join flavor
  * between the equi-join family and [[AsOfJoin]]: match every point
  * `p` to every interval `[start, end]` containing it, where the two
  * sides share NO equi-key. Spark's native plan for a bare range
  * condition is a broadcast nested-loop (or a cartesian) — O(P × I)
  * comparisons, a scale-killer the moment neither side broadcasts.
  *
  * The scale shape instead is the classic bucketed rewrite (interval
  * trees flattened into a hash join; e.g. Chawda et al., "Processing
  * Interval Joins On Map-Reduce", EDBT 2014): intervals EXPLODE to the
  * fixed-width buckets they overlap, points map to their single bucket,
  * the sides meet in an ordinary equi-join on the bucket id, and the
  * exact containment predicate prunes boundary false-positives. A
  * matching point lies in exactly one bucket, so no output pair
  * duplicates and no distinct is needed. Work per bucket is
  * (points in bucket) × (intervals overlapping it) — the bucket width
  * is the dial that trades interval replication (span/width rows per
  * interval) against per-bucket join fan-in, and the join itself is
  * shuffle-partitioned on bucket id: co-located, AQE-skew-splittable,
  * never a driver loop, never P × I.
  *
  * Contract: coordinates are integral (cast timestamps to epoch
  * millis/micros first — the catalog's oracle-determinism convention)
  * and bounds are INCLUSIVE on both ends. Intervals spanning >=
  * `maxIntervalBuckets` buckets — the handful of degenerate year-long
  * rows real telemetry always carries — are ROUTED instead of
  * replicated: they broadcast into a nested-loop term unioned with the
  * bucketed join (each matches nearly everything anyway, so a
  * broadcast predicate term is the right plan for them), behind a
  * COUNT fence (`maxWideIntervals`) that fails loudly when "a few
  * degenerate rows" turns out to be a misconfigured bucket width.
  * Empty intervals (start > end) always fail loudly. Bucket ids are
  * computed in PURE INTEGER arithmetic (floor division on longs), so
  * coordinates anywhere in the long range bucket exactly — a
  * double-rounded floor would silently drop boundary pairs above
  * ~2^52 (epoch-nanosecond regimes).
  */
object RangeJoin {

  /** floor(c / width) on longs without a double round-trip:
    * (c - pmod(c, width)) is an exact multiple of width, so the
    * integral divide is exact for any long coordinate (pmod keeps the
    * floor semantics for negative coordinates).
    */
  private def bucketOf(c: Column, width: Long): Column = {
    val cl = c.cast("long")
    val floored = cl - pmod(cl, lit(width))
    org.apache.spark.sql.GraftBridge.column(
      org.apache.spark.sql.catalyst.expressions.IntegralDivide(
        org.apache.spark.sql.GraftBridge.expression(floored),
        org.apache.spark.sql.GraftBridge.expression(lit(width))))
  }

  private def guarded(df: DataFrame, s: String, e: String,
      bucketWidth: Long, maxIntervalBuckets: Long): DataFrame = {
    val b0 = bucketOf(col(s), bucketWidth)
    val b1 = bucketOf(col(e), bucketWidth)
    df.withColumn("__rj_guard", assert_true(
        col(s) <= col(e) && (b1 - b0) < lit(maxIntervalBuckets),
        concat(lit(s"RangeJoin: interval [$s, $e] = ["),
          col(s), lit(", "), col(e),
          lit(s"] is empty or spans >= $maxIntervalBuckets buckets of " +
            s"width $bucketWidth — widen bucketWidth or broadcast " +
            "degenerate intervals separately"))))
      .withColumn("__rj_bucket", explode(sequence(b0, b1)))
      .drop("__rj_guard")
  }

  /** Split an interval frame on the replication fence: (narrow, wide,
    * wide count). Empty intervals (start > end) fail LOUDLY here — on
    * the driver, eagerly, since the split must count the wide side
    * anyway. The interval side (the small side by construction) is
    * PINNED with a localCheckpoint before anything reads it: the fence
    * count, the narrow/wide filters, and the downstream joins must all
    * see the SAME rows — with a nondeterministic or recomputed source,
    * an unpinned count could validate a different wide set than the
    * rows the broadcast term later joins (r12 ADVICE), turning the
    * fence into a fiction. The pin also collapses the split's driver
    * work to one materialization plus one aggregation over cached
    * blocks. The pinned blocks live until the session ends (the
    * returned lazy frames reference them, so they cannot be released
    * here) — interval-side-sized, small by the routing premise.
    */
  private def splitOnSpan(df0: DataFrame, s: String, e: String,
      bucketWidth: Long, maxIntervalBuckets: Long,
      maxWideIntervals: Long): (DataFrame, DataFrame, Long) = {
    val df = df0.localCheckpoint()
    val span = bucketOf(col(e), bucketWidth) - bucketOf(col(s), bucketWidth)
    val counts = df.agg(
      count(when(col(s) > col(e), lit(1))).as("empty"),
      count(when(col(s) <= col(e) && span >= maxIntervalBuckets, lit(1)))
        .as("wide")).head()
    require(counts.getLong(0) == 0L,
      s"RangeJoin: ${counts.getLong(0)} interval(s) with $s > $e — empty " +
        "intervals are a data error, not a match-nothing row")
    val nWide = counts.getLong(1)
    require(nWide <= maxWideIntervals,
      s"RangeJoin: $nWide intervals span >= $maxIntervalBuckets buckets of " +
        s"width $bucketWidth (fence: $maxWideIntervals) — that many " +
        "wide intervals would swamp the broadcast term; widen bucketWidth")
    (df.filter(span < maxIntervalBuckets),
      df.filter(span >= maxIntervalBuckets), nWide)
  }

  def pointInInterval(points: DataFrame, intervals: DataFrame,
      pointCol: String, startCol: String, endCol: String,
      bucketWidth: Long, maxIntervalBuckets: Long = 4096L,
      maxWideIntervals: Long = 100000L): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    require(maxIntervalBuckets > 0, "maxIntervalBuckets must be positive")
    require(maxWideIntervals >= 0, "maxWideIntervals must be non-negative")
    val clash = points.columns.toSet.intersect(intervals.columns.toSet)
    require(clash.isEmpty,
      s"point and interval column names must be disjoint; both carry: " +
        clash.toSeq.sorted.mkString(", "))
    val (narrow, wide, nWide) = splitOnSpan(intervals, startCol, endCol,
      bucketWidth, maxIntervalBuckets, maxWideIntervals)
    val bucketed = points
      .withColumn("__rj_bucket", bucketOf(col(pointCol), bucketWidth))
      .join(guarded(narrow, startCol, endCol, bucketWidth, maxIntervalBuckets),
        Seq("__rj_bucket"))
      .filter(col(pointCol) >= col(startCol) && col(pointCol) <= col(endCol))
      .drop("__rj_bucket")
    if (nWide == 0L) bucketed
    else bucketed.unionByName(
      // the degenerate few: a broadcast predicate join — each wide
      // interval matches a large fraction of the points anyway, so
      // replicating it into thousands of buckets buys nothing a
      // broadcast term doesn't
      points.join(broadcast(wide),
        col(pointCol) >= col(startCol) && col(pointCol) <= col(endCol)))
  }

  /** Interval-overlap join: pairs of intervals (aStart,aEnd) ×
    * (bStart,bEnd) that INTERSECT — the two-sided generalization, same
    * bucketed rewrite. Both sides explode; a pair sharing k buckets
    * would match k times, so the pair is kept only in the FIRST bucket
    * the overlap occupies (the standard dedup-free trick: emit where
    * the bucket holds max(aStart, bStart)) — no distinct, no double
    * counting.
    */
  def intervalOverlap(a: DataFrame, b: DataFrame,
      aStart: String, aEnd: String, bStart: String, bEnd: String,
      bucketWidth: Long, maxIntervalBuckets: Long = 4096L,
      maxWideIntervals: Long = 100000L): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    require(maxIntervalBuckets > 0, "maxIntervalBuckets must be positive")
    require(maxWideIntervals >= 0, "maxWideIntervals must be non-negative")
    val clash = a.columns.toSet.intersect(b.columns.toSet)
    require(clash.isEmpty,
      s"interval column names must be disjoint; both carry: " +
        clash.toSeq.sorted.mkString(", "))
    val (na, wa, nWideA) = splitOnSpan(a, aStart, aEnd,
      bucketWidth, maxIntervalBuckets, maxWideIntervals)
    val (nb, wb, nWideB) = splitOnSpan(b, bStart, bEnd,
      bucketWidth, maxIntervalBuckets, maxWideIntervals)
    val overlap = col(aStart) <= col(bEnd) && col(bStart) <= col(aEnd)
    val bucketed = guarded(na, aStart, aEnd, bucketWidth, maxIntervalBuckets)
      .join(guarded(nb, bStart, bEnd, bucketWidth, maxIntervalBuckets)
          .withColumnRenamed("__rj_bucket", "__rj_b2"),
        col("__rj_bucket") === col("__rj_b2"))
      .filter(overlap)
      .filter(col("__rj_bucket") ===
        bucketOf(greatest(col(aStart), col(bStart)), bucketWidth))
      .drop("__rj_bucket", "__rj_b2")
    // wide terms partition the pair space disjointly (no distinct
    // needed): narrow×narrow is the bucketed join, wide-a meets ALL of
    // b in one broadcast term, and narrow-a meets wide-b in the other.
    // "ALL of b" is rebuilt from the PINNED split (nb ∪ wb), never the
    // raw frame: with a nondeterministic source, a recomputed b could
    // disagree with the rows the fence counted and the bucketed term
    // joined, double-counting or dropping pairs.
    val terms = Seq(
      if (nWideA > 0L) Some(broadcast(wa).join(nb.unionByName(wb), overlap))
      else None,
      if (nWideB > 0L) Some(na.join(broadcast(wb), overlap)) else None).flatten
    terms.foldLeft(bucketed)((acc, t) => acc.unionByName(t))
  }
}
