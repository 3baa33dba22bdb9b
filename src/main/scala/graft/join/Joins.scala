package graft.join

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/**
 * Join operators Spark's built-ins don't express directly: as-of
 * (point-in-time) joins and interval/range joins — both staples of
 * event-log and feature-engineering pipelines.
 *
 * Both are composed from Spark relational primitives so Catalyst/AQE keep
 * full visibility (predicate pushdown, broadcast decisions, skew handling) —
 * no custom physical operator is needed to get the right plan shape.
 */
object Joins {

  /**
   * Backward as-of join: for every left row, attach the payload of the
   * single right row with the same `keys` and the largest `rightTsCol`
   * that is `<= leftTsCol` (inclusive). Left rows with no such match keep
   * null payloads — the classic point-in-time lookup ("state as of then")
   * used for feature joins without time-travel leakage.
   *
   * Plan shape (the reason this is not `left JOIN right ON ts <= ts` +
   * window): a naive inequality join is O(|L| × matches) and Spark plans it
   * as broadcast-nested-loop. Instead both sides are unioned and sorted ONCE
   * per key partition — one hash shuffle on `keys`, one partition-local
   * sort, then a running `last(payload, ignoreNulls)` window carries the
   * most recent right payload forward into each left row. Cost is
   * sort-merge-join-like: O((|L|+|R|) log) per partition, no quadratic
   * blow-up, no broadcast requirement. At equal timestamps the right row
   * sorts first (tag 0 < 1), so equality matches, mirroring SQL ASOF
   * semantics.
   *
   * Hot keys: by default each key's whole history sorts in ONE partition —
   * a single dominant entity bounds the join at one task. Pass `timeBucket`
   * (a monotone map from the timestamp column to a coarse bucket id, e.g.
   * `ts => floor(ts / 86400)`) to sub-key the shuffle by (keys, bucket):
   * each bucket sorts independently, and the state crossing bucket
   * boundaries is stitched back in with one tiny per-(key, bucket)
   * aggregate (latest right row per bucket, prefix-carried across the
   * bucket sequence — the same ~16-bytes-per-bucket coordination pattern as
   * [[graft.RowNumbers]]). Results are identical to the unbucketed plan;
   * pick a width that keeps single-key-single-bucket row counts
   * executor-sized.
   *
   * The right payload travels as ONE struct through the window, so all
   * payload columns are guaranteed to come from the same right row.
   *
   * Determinism: if the right side has several rows with the same
   * (keys, timestamp), which of them matches is arbitrary — pre-aggregate
   * the right side to one row per (keys, timestamp) when that matters (as
   * the gated `asof_join` query does).
   *
   * `tolerance`: optional maximum time distance — a match further than this
   * from the left timestamp is nulled out. Express it in the timestamp
   * type's difference algebra (a long delta for numeric timestamps, an
   * INTERVAL literal for timestamp columns).
   *
   * `direction`: "backward" (default — latest right row at-or-before, the
   * point-in-time lookup) or "forward" (earliest right row at-or-after,
   * e.g. "next maintenance event after each reading").
   *
   * Output: every left column, then `<prefix>ts` (the matched right
   * timestamp) and `<prefix><payload>` for each requested payload column.
   */
  def asofJoin(
      left: DataFrame, right: DataFrame,
      keys: Seq[String],
      leftTsCol: String, rightTsCol: String,
      rightPayload: Seq[String],
      prefix: String = "asof_",
      tolerance: Option[Column] = None,
      direction: String = "backward",
      timeBucket: Option[Column => Column] = None): DataFrame = {
    require(keys.nonEmpty, "asofJoin needs at least one equi-key")
    require(rightPayload.nonEmpty, "asofJoin needs at least one right payload column")
    require(direction == "backward" || direction == "forward",
      s"direction must be 'backward' or 'forward': $direction")
    val backward = direction == "backward"
    val p = graft.functions.distinctPrefixFor((left.columns ++ right.columns).toSeq)
    val ts = p + "ts"
    val tag = p + "tag"
    val pay = p + "pay"

    val leftDataCols = left.columns
      .filterNot(c => keys.contains(c) || c == leftTsCol).toSeq
    val payStructR = struct(
      (col(rightTsCol).as("ts") +: rightPayload.map(c => col(c).as(c))): _*)
    // Null timestamps have no position in the as-of order: a null-ts right
    // row must never become anyone's "latest state" (it would sort NULLS
    // FIRST and leak into every left row), and a null-ts left row has no
    // point in time to look up — both are dropped, matching SQL ASOF.
    // right rows: keys, ts, tag 0, payload struct, nulled left columns
    val rightSchema = right.select(payStructR).schema.head.dataType
    val r = right.filter(col(rightTsCol).isNotNull).select(
      keys.map(col) ++ Seq(col(rightTsCol).as(ts), lit(0).as(tag), payStructR.as(pay)) ++
        leftDataCols.map(c => lit(null).cast(left.schema(c).dataType).as(c)): _*)
    // left rows: keys, ts, tag 1, null payload, left columns
    val l = left.filter(col(leftTsCol).isNotNull).select(
      keys.map(col) ++ Seq(col(leftTsCol).as(ts), lit(1).as(tag),
        lit(null).cast(rightSchema).as(pay)) ++ leftDataCols.map(col): _*)

    // backward: ascending scan carries the latest right row at-or-before;
    // forward: descending scan carries the earliest right row at-or-after
    // (the right-first tag break keeps equality matching in both directions)
    val tsOrder = if (backward) col(ts).asc else col(ts).desc

    val carried = timeBucket match {
      case None =>
        val w = Window.partitionBy(keys.map(col): _*).orderBy(tsOrder, col(tag).asc)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        r.unionByName(l)
          .withColumn(pay, last(col(pay), ignoreNulls = true).over(w))
          .filter(col(tag) === 1)

      case Some(bucketFn) =>
        // Hot-key mitigation: sub-key the scan by (keys, bucket). The state a
        // bucket inherits from its predecessors is reconstructed from one
        // tiny aggregate — the scan-terminal right row per (keys, bucket) —
        // prefix-carried across the bucket sequence and re-injected as one
        // synthetic right row per left-occupied bucket (keeping its ORIGINAL
        // timestamp, so tolerance and the asof_ts output are unchanged).
        val bkt = p + "bucket"
        val qtag = p + "qtag"
        val state = p + "state"
        val carry = p + "carry"
        val rb = r.withColumn(bkt, bucketFn(col(ts)))
        val lb = l.withColumn(bkt, bucketFn(col(ts)))

        // scan-terminal right row per (keys, bucket): latest for backward,
        // earliest for forward — i.e. the state the NEXT bucket would see
        // (ties on equal ts are arbitrary, as documented above)
        val terminal =
          if (backward) max_by(col(pay), col(ts))
          else min_by(col(pay), col(ts))
        val states = rb.groupBy((keys.map(col) :+ col(bkt)): _*)
          .agg(terminal.as(state))
          .withColumn(qtag, lit(1))
        val queryBuckets = lb.select((keys.map(col) :+ col(bkt)): _*).distinct()
          .withColumn(state, lit(null).cast(rightSchema))
          .withColumn(qtag, lit(0))

        // prefix-carry over the bucket sequence (tiny: one row per key ×
        // bucket). Query rows sort BEFORE state rows of the same bucket, so
        // a bucket inherits only STRICTLY earlier buckets' state — its own
        // right rows are already in the main scan.
        val bucketOrder = if (backward) col(bkt).asc else col(bkt).desc
        val wState = Window.partitionBy(keys.map(col): _*)
          .orderBy(bucketOrder, col(qtag).asc)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val carryIns = states.unionByName(queryBuckets)
          .withColumn(carry, last(col(state), ignoreNulls = true).over(wState))
          .filter(col(qtag) === 0 && col(carry).isNotNull)
        val carryRows = carryIns.select(
          keys.map(col) ++ Seq(col(carry)("ts").as(ts), lit(0).as(tag),
            col(carry).as(pay), col(bkt)) ++
            leftDataCols.map(c => lit(null).cast(left.schema(c).dataType).as(c)): _*)

        val w = Window.partitionBy((keys.map(col) :+ col(bkt)): _*)
          .orderBy(tsOrder, col(tag).asc)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        rb.unionByName(lb).unionByName(carryRows)
          .withColumn(pay, last(col(pay), ignoreNulls = true).over(w))
          .filter(col(tag) === 1)
          .drop(bkt)
    }

    val bounded = tolerance match {
      case Some(maxDistance) =>
        val distance =
          if (backward) col(ts) - col(pay)("ts") else col(pay)("ts") - col(ts)
        carried.withColumn(pay,
          when(col(pay).isNotNull && distance <= maxDistance, col(pay)))
      case None => carried
    }
    bounded.select(
      keys.map(col) ++ Seq(col(ts).as(leftTsCol)) ++ leftDataCols.map(col) ++
        (col(pay)("ts").as(prefix + "ts") +:
          rightPayload.map(c => col(pay)(c).as(prefix + c))): _*)
  }

  /**
   * Range (interval) join: every (point, interval) pair with
   * `lo <= point <= hi` (both bounds inclusive).
   *
   * Plan shape: a naive `JOIN ON point BETWEEN lo AND hi` has no equi-key,
   * so Spark plans broadcast-nested-loop — O(|P| × |I|). Binning turns it
   * into an equi-join: intervals explode into the fixed-width bins they
   * overlap, points map to exactly one bin, and the join runs hash/sort-merge
   * on the bin id with the exact BETWEEN as a post-filter. Each qualifying
   * pair appears exactly once (a point lives in one bin). Work scales as
   * |P| + |I| × (avg interval width / binWidth) + output — pick `binWidth`
   * near the typical interval width so intervals explode into O(1) bins.
   *
   * `keys`: optional equi-keys present on BOTH sides (same names) — e.g.
   * per-user maintenance windows. They join alongside the bin id, so a hot
   * value range on one entity doesn't collide with every other entity's.
   *
   * Apart from `keys`, column names of `points` and `intervals` must be
   * disjoint (the result carries both sides' columns).
   */
  def rangeJoin(
      points: DataFrame, pointCol: String,
      intervals: DataFrame, loCol: String, hiCol: String,
      binWidth: Double, keys: Seq[String] = Seq.empty): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive: $binWidth")
    val overlap = points.columns.toSet.intersect(intervals.columns.toSet) -- keys
    require(overlap.isEmpty, s"points/intervals column names must be disjoint, both have: $overlap")
    val p = graft.functions.distinctPrefixFor((points.columns ++ intervals.columns).toSeq)
    val bin = p + "bin"
    // floor (toward -inf, not trunc) keeps negative values in the right bin
    val binnedPoints = points.withColumn(bin, floor(col(pointCol) / binWidth).cast("long"))
    val binnedIntervals = intervals
      .withColumn(bin, explode(sequence(
        floor(col(loCol) / binWidth).cast("long"), floor(col(hiCol) / binWidth).cast("long"))))
    binnedPoints.join(binnedIntervals, keys :+ bin)
      .filter(col(pointCol).between(col(loCol), col(hiCol)))
      .drop(bin)
  }

  /**
   * Skew-safe equi-join: identical result to `left.join(right, keys,
   * joinType)`, but a hot join key no longer funnels into one reducer.
   *
   * Mechanics: every left row gets a deterministic salt in
   * `[0, saltFactor)` (hash of the whole row, so the assignment is stable
   * across runs and partitionings — no `rand()`); the right side is
   * replicated once per salt value (a narrow `explode`, no shuffle). The
   * join key becomes `keys :+ salt`, so the rows of a hot key spread over
   * `saltFactor` reducers instead of one. Replication multiplies only the
   * RIGHT side — put the small/dimension side there (`saltFactor` × |right|
   * extra shuffle rows buys `saltFactor`-way parallelism on the hot key).
   *
   * When to reach for this instead of AQE's skew-join: AQE only splits
   * skewed partitions of a sort-merge join after the shuffle files exist;
   * it does not help a shuffled hash join building a giant hash table on
   * the hot key, a `groupBy` downstream of the join keyed on the same
   * column, or engines/paths where AQE is off. Salting fixes the key
   * distribution itself, ahead of time.
   *
   * Supported join types: inner and left/left_outer. (Right/full-outer
   * would emit one unmatched copy of a right row PER salt — post-dedup
   * would be needed, defeating the point; flip the sides instead.)
   */
  def saltedJoin(
      left: DataFrame, right: DataFrame,
      keys: Seq[String], saltFactor: Int,
      joinType: String = "inner"): DataFrame = {
    require(keys.nonEmpty, "saltedJoin needs at least one equi-key")
    require(saltFactor >= 1, s"saltFactor must be >= 1: $saltFactor")
    val supported = Set("inner", "left", "left_outer", "leftouter")
    require(supported.contains(joinType.toLowerCase.replace("_", "")) ||
      supported.contains(joinType.toLowerCase),
      s"saltedJoin supports inner and left joins, not: $joinType")
    val p = graft.functions.distinctPrefixFor((left.columns ++ right.columns).toSeq)
    val salt = p + "salt"
    val l = left.withColumn(salt,
      pmod(xxhash64(left.columns.map(col): _*), lit(saltFactor)).cast("int"))
    val r = right.withColumn(salt,
      explode(array((0 until saltFactor).map(lit): _*)))
    l.join(r, keys :+ salt, joinType).drop(salt)
  }
}
