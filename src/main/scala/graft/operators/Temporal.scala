package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Temporal / event-sequence family — the operations a training-data or
  * clickstream pipeline runs over the same changelog the reference tails
  * (reference: HbaseSolrIndexCoprocesser.java:38 captures the mutation
  * stream; its README's "统计" use case stops at plain aggregation — this
  * family is the sequence-aware tier above it, SURVEY.md §2.C scope).
  *
  * Spark-first shapes, chosen for the 100 TB plan:
  *
  * - [[sessions]] (gap sessionization): ONE shuffle on `user_id`; the
  *   window functions and the per-session aggregate all reuse that same
  *   hash partitioning (`HashPartitioning(user_id)` satisfies the
  *   clustered distribution of `groupBy(user_id, sess_no)`), so the plan
  *   is scan → exchange → sort → window → partial/final agg with no
  *   second exchange — pinned in TemporalSpec.
  *
  * - [[asofJoin]]: the UNION-TAG pattern, not a per-row subquery and not
  *   a range join. Both sides are tagged and unioned, then one window
  *   pass per key carries the latest right-side row forward
  *   (`last(..., ignoreNulls)` over rows-unbounded-preceding). Cost is
  *   one shuffle of |L|+|R| rows — the classic scalable as-of; a
  *   correlated "max ts ≤ t per row" oracle shape would be O(L×R) per
  *   key and a non-equi join would fall off the hash-join path entirely.
  *
  * - [[activeIntervalCounts]] (range/interval join): GRID BUCKETING.
  *   Intervals explode to the fixed-width time cells they cover, points
  *   map to their one cell, and the match becomes an EQUI-join on the
  *   cell id followed by the exact containment filter. Spark plans a
  *   plain shuffled hash join — no BroadcastNestedLoopJoin, no cartesian
  *   (pinned). A point's cell is covered at most once by each matching
  *   interval, so the join is duplicate-free by construction (no
  *   dedup pass). Cell width trades explode factor against join
  *   selectivity; one hour over month-long data keeps both small.
  *
  * - [[qJsonField]]: Solr's dynamic-field story for semi-structured
  *   payloads — `get_json_object` is a codegen'd path expression over
  *   the `props` column, evaluated inside the scan's project (no UDF,
  *   no shuffle beyond the final aggregate's).
  */
object Temporal {
  type Q = (SparkSession, String) => DataFrame

  /** Session gap: a new session starts after 30 idle minutes (µs). */
  val SessionGapUs: Long = 30L * 60 * 1000000

  /** Grid cell width for the interval join: one hour in µs. */
  val CellUs: Long = 3600L * 1000000

  /** Each event annotated with its gap-session ordinal `sess_no`
    * (1-based per user): the shared sessionization core — two window
    * passes over ONE `user_id` exchange. Deterministic under ts ties via
    * the `event_id` tiebreak. `events` needs `user_id`, `event_id`,
    * `ts` (epoch-µs long). */
  def withSessionIds(events: DataFrame): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    events
      .withColumn("prev_ts", lag("ts", 1).over(w))
      .withColumn("is_new",
        when(col("prev_ts").isNull ||
          col("ts") - col("prev_ts") > lit(SessionGapUs), 1L).otherwise(0L))
      .withColumn("sess_no", sum("is_new").over(w))
      .drop("prev_ts", "is_new")
  }

  /** Gap-based sessionization: one row per (user, session) with event
    * count, span, and value sum. The aggregate reuses
    * [[withSessionIds]]'s `user_id` partitioning — still one shuffle. */
  def sessions(events: DataFrame): DataFrame =
    withSessionIds(events)
      .groupBy("user_id", "sess_no")
      .agg(
        count(lit(1)).as("n_events"),
        min("ts").as("start_us"),
        max("ts").as("end_us"),
        round(sum("value"), 2).as("sum_value"))

  /** As-of join (backward, inclusive): each left row picks the right row
    * with the greatest `(ts, tieCol)` such that `right.ts <= left.ts`
    * within the same `keyCol` group, or nulls when none precedes it.
    * Right-side columns come back as `asof_<payload col>`.
    *
    * Left rows keep all their columns. `rightPayload` columns must exist
    * on the right side; at equal `ts` the right row sorts BEFORE the left
    * row (inclusive semantics) and later `tieCol` wins among right ties.
    * `toleranceUs` bounds how stale a match may be: a right row older
    * than `left.ts - toleranceUs` nulls out instead of matching (the
    * pandas merge_asof / kdb aj tolerance contract) — applied AFTER the
    * window pass, so it costs a per-row comparison, not a second join. */
  def asofJoin(left: DataFrame, right: DataFrame, keyCol: String,
               tsCol: String, tieCol: String,
               rightPayload: Seq[String],
               toleranceUs: Option[Long] = None): DataFrame = {
    val payloadAs = rightPayload.map(c => col(c).as(s"asof_$c"))
    val l = left.withColumn("_side", lit(1))
    val r = right.select(
      (Seq(col(keyCol), col(tsCol), col(tieCol).as("_rtie")) ++ payloadAs): _*)
      .withColumn("_side", lit(0))
    // at equal ts: right (side 0) sorts first = visible to the left row;
    // among right ties the largest tie value is the one carried forward
    val u = l.unionByName(r, allowMissingColumns = true)
      .withColumn("_ord", coalesce(col("_rtie"), col(tieCol)))
    val w = Window.partitionBy(keyCol)
      .orderBy(col(tsCol), col("_side"), col("_ord"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // the matched right row carries forward as ONE struct: carrying each
    // payload column through its own last(..., ignoreNulls) would, when
    // the matched row's value is NULL, skip past it to an OLDER right
    // row — the output would mix columns from different right rows (and
    // a tolerance keyed on _match_ts would pass the stale value). The
    // struct is non-null for every right row even when its fields are
    // null, so ignoreNulls only skips LEFT rows — and one window
    // expression replaces |payload| + 1 of them.
    val matchStruct = struct(
      (col(tsCol).as("_mts") +: rightPayload.map(c => col(s"asof_$c").as(c))): _*)
    val withMatch = u.withColumn("_m",
      last(when(col("_side") === 0, matchStruct), ignoreNulls = true).over(w))
    val carried = rightPayload.foldLeft(withMatch) { (df, c) =>
        df.withColumn(s"asof_$c", col("_m").getField(c))
      }.withColumn("_match_ts", col("_m").getField("_mts"))
    val bounded = toleranceUs match {
      case None => carried
      case Some(tol) =>
        val fresh = col("_match_ts").isNotNull &&
          col(tsCol) - col("_match_ts") <= lit(tol)
        rightPayload.foldLeft(carried) { (df, c) =>
          df.withColumn(s"asof_$c", when(fresh, col(s"asof_$c")))
        }
    }
    bounded.filter(col("_side") === 1)
      .drop("_side", "_rtie", "_ord", "_match_ts", "_m")
  }

  /** For each point row, the number of intervals containing its `ts`
    * (inclusive bounds), via the grid-cell equi-join. `points` needs
    * `ts`; `intervals` needs `start_us`/`end_us`. Returns the point's
    * `idCol` + `n_active`. Points contained by no interval are absent
    * (inner-join semantics). */
  def activeIntervalCounts(points: DataFrame, intervals: DataFrame,
                           idCol: String): DataFrame = {
    val cells = intervals
      .withColumn("cell",
        explode(sequence(expr(s"start_us div $CellUs"), expr(s"end_us div $CellUs"))))
      .select(col("cell"), col("start_us"), col("end_us"))
    points
      .withColumn("cell", expr(s"ts div $CellUs"))
      .join(cells, "cell")
      .filter(col("ts") >= col("start_us") && col("ts") <= col("end_us"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_active"))
  }

  /** The session rollup over the events table at `dir`, MATERIALIZED once
    * per session (the [[Materialize]] seam every shared derived artifact
    * rides): one row per (user, session) — interval-index-sized, far
    * smaller than the events corpus it summarizes. Three keys consume it
    * (q_sessionize, q_range_join, q_active_sweep), and before this seam
    * each re-ran the full sessionization (events scan + user_id exchange
    * + two window passes) inside its own plan — 0.2–0.5 s of identical
    * work per query at sf0.1, the dominant constant of the sweep's leg
    * (round-16 verdict #2). At 100 TB this artifact is the incrementally
    * maintained session table the streaming pipeline keeps
    * ([[graft.streaming.StreamingAggregates]] holds the watermarked
    * form); the in-process cache is the session-lifetime complement, and
    * corpus changes invalidate it through the same
    * [[Materialize.invalidate]] hook as every other derived artifact. */
  private[graft] def sharedSessions(spark: SparkSession, dir: String): DataFrame =
    Materialize.artifact(spark, "event_sessions", dir)(
      sessions(Tables.events(spark, dir)))

  private def qSessionize(spark: SparkSession, dir: String): DataFrame =
    sharedSessions(spark, dir).orderBy("user_id", "sess_no")

  // one builder serves q_asof_join and q_asof_tolerance — the pair must
  // never drift apart except in the staleness bound
  private def asofQuery(spark: SparkSession, dir: String,
                        toleranceUs: Option[Long]): DataFrame = {
    val ev = Tables.events(spark, dir)
    val purchases = ev.filter(col("event_type") === "purchase")
    val clicks = ev.filter(col("event_type") === "click")
    asofJoin(purchases, clicks, "user_id", "ts", "event_id",
      Seq("event_id", "ts"), toleranceUs)
      .select(
        col("event_id").as("purchase_id"),
        col("user_id"),
        col("asof_event_id").as("click_id"),
        (col("ts") - col("asof_ts")).as("lag_us"))
      .orderBy("purchase_id")
  }

  private def qAsofJoin(spark: SparkSession, dir: String): DataFrame =
    asofQuery(spark, dir, None)

  private def qAsofTolerance(spark: SparkSession, dir: String): DataFrame =
    // The bounded-staleness as-of: same join as q_asof_join but a match
    // older than one hour nulls out (pandas merge_asof's tolerance /
    // kdb aj's window) — the gate proving the tolerance path end to end.
    asofQuery(spark, dir, Some(3600L * 1000000))

  private def qRangeJoin(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val sess = sharedSessions(spark, dir).select("start_us", "end_us")
    val errors = ev.filter(col("event_type") === "error").select("event_id", "ts")
    activeIntervalCounts(errors, sess, "event_id").orderBy("event_id")
  }

  /** The sweep's BOUNDARY INDEX over the session intervals at `dir`,
    * materialized once per session: one row per distinct boundary
    * instant with its net active-count delta (+1 at each start, −1 just
    * past each inclusive end, summed). This is the interval-tree
    * equivalent a temporal store keeps standing — a pure function of
    * the session set (segment width plays no part; segments are added
    * per query), ≤ 2·|sessions| rows. Profiled round 17: rebuilding it
    * in-plan (union + groupBy shuffle) was the sweep leg's single
    * largest stage (1.6 s of a 4.1 s busy-box leg) for work that is
    * identical every call. Derived from [[sharedSessions]] — the same
    * artifact-on-artifact layering as `doc_lens` over postings. */
  private[graft] def sharedSweepBounds(spark: SparkSession, dir: String): DataFrame =
    Materialize.artifact(spark, "sweep_bounds", dir)(
      boundsOf(sharedSessions(spark, dir)))

  /** Boundary deltas of an interval set: (ts, d) with d the net count
    * change AT ts — +1 per start, −1 just past each inclusive end. */
  private def boundsOf(sess: DataFrame): DataFrame =
    sess.select(col("start_us").as("ts"), lit(1L).as("d"))
      .unionByName(sess.select((col("end_us") + 1).as("ts"), lit(-1L).as("d")))
      .groupBy("ts").agg(sum("d").as("d"))

  /** The fully-indexed form of the boundary index for one segment width:
    * boundaries carry their IN-SEGMENT prefix-summed active count
    * (`run`), and a dense per-segment incoming-count table (`off`) covers
    * every segment in the boundary range — together they are the classic
    * sorted-endpoints interval index (step function + block offsets).
    * Both are pure functions of (session set, segUs); a point query then
    * needs ONE window pass (carry the last step to each point) + one
    * broadcast join — no per-query prefix-sum rebuild. Out-of-range
    * segments need no offset row: before the first boundary the count is
    * 0, and past the last every interval has closed (the deltas sum to
    * 0), so the left join's null fills 0 correctly on both sides. */
  /** Per-segment prefix-summed steps of a boundary-delta frame (ts, d):
    * one row per boundary with its in-segment running active count. */
  private[graft] def stepsOf(bounds: DataFrame, segUs: Long): DataFrame =
    bounds
      .withColumn("seg", floor(col("ts") / segUs))
      .withColumn("run", sum("d").over(
        Window.partitionBy("seg").orderBy("ts")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select("seg", "ts", "run")

  /** Dense per-segment incoming counts over the boundary seg range: a
    * point-only segment between boundaries reads its incoming count
    * directly (|segments| rows — bounded metadata; the single-partition
    * window runs once, in the build). */
  private[graft] def offsetsOf(bounds: DataFrame, segUs: Long): DataFrame = {
    val tots = bounds
      .groupBy(floor(col("ts") / segUs).as("seg")).agg(sum("d").as("tot"))
    tots.agg(min("seg").as("lo"), max("seg").as("hi"))
      .select(explode(sequence(col("lo"), col("hi"))).as("seg"))
      .join(tots, Seq("seg"), "left").na.fill(0L, Seq("tot"))
      .withColumn("off", coalesce(sum("tot").over(Window.orderBy("seg")
        .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select("seg", "off")
  }

  /** The indexed sweep's per-query read: carry the last step to each
    * point (one window), add the segment's incoming offset (broadcast).
    * `errors` needs (event_id, ts, seg) with seg at the SAME segUs the
    * index was built with. */
  private[graft] def activeSweepIndexed(steps: DataFrame, offsets: DataFrame,
                                        errors: DataFrame): DataFrame = {
    val wSeg = Window.partitionBy("seg").orderBy(col("ts"), col("tag"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    steps.select(col("seg"), col("ts"), lit(0).as("tag"), col("run"),
        lit(null).cast("long").as("event_id"))
      .unionByName(errors.select(col("seg"), col("ts"), lit(1).as("tag"),
        lit(null).cast("long").as("run"), col("event_id")))
      // a boundary AT the point's ts sorts first (inclusive semantics,
      // the as-of tie rule); points carry the last step's run or fall
      // back to the segment's incoming offset
      .withColumn("r", last(col("run"), ignoreNulls = true).over(wSeg))
      .filter(col("tag") === 1)
      .join(broadcast(offsets), Seq("seg"), "left")
      .select(col("event_id"),
        (coalesce(col("r"), lit(0L)) + coalesce(col("off"), lit(0L)))
          .as("n_active"))
      .orderBy("event_id")
  }

  private[graft] def sharedSweepSteps(spark: SparkSession, dir: String,
                                      segUs: Long): DataFrame =
    Materialize.artifact(spark, s"sweep_steps_$segUs", dir)(
      stepsOf(sharedSweepBounds(spark, dir), segUs))

  private[graft] def sharedSweepOffsets(spark: SparkSession, dir: String,
                                        segUs: Long): DataFrame =
    Materialize.artifact(spark, s"sweep_offsets_$segUs", dir)(
      offsetsOf(sharedSweepBounds(spark, dir), segUs))

  private def qActiveSweep(spark: SparkSession, dir: String): DataFrame = {
    // the oracle key rides the fully-indexed sweep: same semantics as
    // [[activeSweepBounds]] (TemporalSpec pins the strategies equal on
    // random interval sets; the q_range_join oracle is shared), per-query
    // work reduced to the point carry
    val segUs = 6L * 3600000000L // 6 h segments
    activeSweepIndexed(
      sharedSweepSteps(spark, dir, segUs),
      sharedSweepOffsets(spark, dir, segUs),
      Tables.events(spark, dir)
        .filter(col("event_type") === "error")
        .select(col("event_id"), col("ts"), floor(col("ts") / segUs).as("seg")))
  }

  /** The boundary-sweep active-interval count, segment width exposed so
    * the growth probe can vary |segments| at a fixed corpus (the
    * round-12 verdict's one-factor-at-a-time decomposition ask) —
    * semantics identical at every width. This form re-derives the
    * session intervals and their boundary deltas in-plan (the growth
    * probe's cold-build shape); the query key rides [[activeSweepBounds]]
    * with the [[sharedSweepBounds]] standing index. */
  private[graft] def activeSweep(ev: DataFrame, segUs: Long): DataFrame =
    activeSweepBounds(boundsOf(sessions(ev)), ev, segUs)

  private[graft] def activeSweepBounds(bounds0: DataFrame, ev: DataFrame,
                                       segUs: Long): DataFrame = {
    // SAME semantics as q_range_join — "how many sessions are active at
    // each error event" — by the boundary-SWEEP algorithm instead of the
    // pairwise grid join: every interval contributes +1 at start and -1
    // just past its inclusive end, a running sum over the sorted
    // boundaries is the active count at every instant, and each point
    // as-of joins to the latest boundary at-or-before it. Work is
    // O((|intervals| + |points|) log ·) with NO pairwise fan-out — the
    // plan that survives when intervals stack up (the grid join's
    // per-cell row product is its skew hazard). The two keys share one
    // oracle: two physical strategies, one semantics, both proven. The
    // sweep itself is a single ordered pass (constant join key); at
    // 100 TB one range-partitions the boundary sort — points only need
    // the running total at their own position, which a per-range offset
    // (prefix sum of range totals, a tiny driver-side frame) restores.
    // Distributed prefix sum, for real (not just documented): boundaries
    // and points land in coarse TIME SEGMENTS; running sums are
    // per-segment windows (partitioned — no global single-partition
    // pass), and each segment's incoming count comes from an exclusive
    // prefix sum over the tiny per-segment totals (|segments| rows —
    // bounded metadata, broadcast back). A point with no boundary before
    // it in its own segment takes the segment's incoming count. Same
    // shape as q_del_batch_count's segmented rank.
    // segUs tunes |segments| to stay metadata-sized at the default
    val bounds = bounds0.withColumn("seg", floor(col("ts") / segUs))
    val errors = ev.filter(col("event_type") === "error")
      .select(col("event_id"), col("ts"), floor(col("ts") / segUs).as("seg"))
    // per-segment totals over EVERY segment either side touches (a
    // point-only segment still needs its incoming offset), then the
    // exclusive prefix sum — the only unpartitioned window, |segments|
    // rows of metadata
    val segTotals = bounds.select("seg").union(errors.select("seg")).distinct()
      .join(bounds.groupBy("seg").agg(sum("d").as("tot")), Seq("seg"), "left")
      .na.fill(0L, Seq("tot"))
    val offsets = segTotals.withColumn("off",
        coalesce(sum("tot").over(Window.orderBy("seg")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select("seg", "off")
    // one union-tag pass per segment: boundaries carry their in-segment
    // running count forward; a point reads the latest carried value (a
    // boundary AT the point's ts sorts first — inclusive semantics, the
    // same tie rule as the as-of join) or falls back to the incoming
    // offset
    val wSeg = Window.partitionBy("seg").orderBy(col("ts"), col("tag"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tagged = bounds
      .select(col("seg"), col("ts"), lit(0).as("tag"),
        col("d"), lit(null).cast("long").as("event_id"))
      .unionByName(errors.select(col("seg"), col("ts"), lit(1).as("tag"),
        lit(null).cast("long").as("d"), col("event_id")))
    tagged
      .withColumn("run", sum(col("d")).over(wSeg))
      .filter(col("tag") === 1)
      .join(broadcast(offsets), "seg")
      .select(col("event_id"),
        (coalesce(col("run"), lit(0L)) + col("off")).as("n_active"))
      .orderBy("event_id")
  }

  /** Funnel stage order for [[qFunnel]] — the classic view → click →
    * purchase conversion ladder. */
  private val FunnelSteps = Seq("view", "click", "purchase")

  /** Conversion-funnel analysis (the MATCH_RECOGNIZE shape): per gap-
    * session, the furthest stage of `steps` reached IN ORDER — an
    * ordered-subsequence test, not a bag-of-types one. The greedy
    * automaton runs as ONE codegen'd `aggregate` lambda over the
    * session's time-sorted events (greedy is correct for subsequence
    * existence: the first step-0 event arms the step-1 check, etc.), so
    * per-session work is linear and the whole query stays on the
    * sessionizer's single `user_id` exchange. Returns one row per
    * (user_id, sess_no) with `stage` ∈ [0, steps.length]. */
  def funnelStages(events: DataFrame, steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    // step names are spliced into the lambda's SQL — keep them literal
    require(steps.forall(_.matches("[A-Za-z0-9_-]+")),
      s"funnel step names must be alphanumeric, got: ${steps.mkString(", ")}")
    val caseArms = steps.zipWithIndex
      .map { case (s, i) => s"WHEN st = $i AND e.event_type = '$s' THEN ${i + 1}" }
      .mkString(" ")
    withSessionIds(events)
      .groupBy("user_id", "sess_no")
      .agg(sort_array(collect_list(
        struct(col("ts"), col("event_id"), col("event_type")))).as("evs"))
      .select(col("user_id"), col("sess_no"), expr(
        s"aggregate(evs, 0, (st, e) -> CASE $caseArms ELSE st END)").as("stage"))
  }

  private def qFunnel(spark: SparkSession, dir: String): DataFrame =
    funnelStages(Tables.events(spark, dir), FunnelSteps)
      .groupBy("stage")
      .agg(count(lit(1)).as("n_sessions"))
      .orderBy("stage")

  private def qRollingAvg(spark: SparkSession, dir: String): DataFrame = {
    // 7-day rolling average of daily revenue — the trailing-window KPI
    // every monitoring surface draws. Two-step shape: the corpus-sized
    // work is the partial-aggregated daily rollup (one exchange on day);
    // the RANGE window then runs over ~|days| rows — a final reduction,
    // not a corpus pass (at 100 TB one would partition the window by
    // series key; the single-series case is deliberately the one row
    // group). round() applies once per output column, never twice.
    val daily = Tables.events(spark, dir)
      .groupBy(expr(s"ts div ${24L * 3600 * 1000000}").as("day"))
      .agg(sum("value").as("rev"))
    val w = Window.orderBy("day").rangeBetween(-6, 0)
    daily.select(col("day"), round(col("rev"), 2).as("revenue"),
        round(avg(col("rev")).over(w), 2).as("avg7"))
      .orderBy("day")
  }

  private def qJsonField(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
      .groupBy("event_type")
      .agg(
        count(lit(1)).as("n"),
        round(avg("k"), 2).as("avg_k"),
        min("k").as("min_k"),
        max("k").as("max_k"))
      .orderBy("event_type")

  val queries: Map[String, Q] = Map(
    "q_sessionize" -> qSessionize,
    "q_asof_join" -> qAsofJoin,
    "q_asof_tolerance" -> qAsofTolerance,
    "q_range_join" -> qRangeJoin,
    "q_active_sweep" -> qActiveSweep,
    "q_funnel" -> qFunnel,
    "q_rolling_avg" -> qRollingAvg,
    "q_json_field" -> qJsonField)

  // the as-of CTE shared by the q_asof_join / q_asof_tolerance oracles —
  // `j` ranks each purchase's candidate clicks by (ts, event_id) DESC
  private val asofCte =
    """WITH p AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'),
      |c AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'),
      |j AS (
      |  SELECT p.event_id AS purchase_id, p.user_id,
      |         c.event_id AS click_id,
      |         epoch_us(CAST(p.ts AS TIMESTAMP)) - epoch_us(CAST(c.ts AS TIMESTAMP)) AS lag_us,
      |         row_number() OVER (PARTITION BY p.event_id
      |                            ORDER BY c.ts DESC, c.event_id DESC) AS rn
      |  FROM p LEFT JOIN c ON p.user_id = c.user_id AND c.ts <= p.ts)""".stripMargin

  // the sessionization CTE, shared by the q_sessionize and q_range_join
  // oracles — DuckDB reads ts as TIMESTAMP, so epoch_us() lands on the
  // same epoch-µs longs the Spark reader normalizes to
  private val sessionsCte =
    """WITH o AS (
      |  SELECT user_id, event_id, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us, value, event_type,
      |         lag(epoch_us(CAST(ts AS TIMESTAMP))) OVER
      |           (PARTITION BY user_id ORDER BY ts, event_id) AS prev_us
      |  FROM events),
      |s AS (
      |  SELECT user_id, event_id, ts_us, value, event_type,
      |         sum(CASE WHEN prev_us IS NULL OR ts_us - prev_us > 1800000000
      |                  THEN 1 ELSE 0 END)
      |           OVER (PARTITION BY user_id ORDER BY ts_us, event_id
      |                 ROWS UNBOUNDED PRECEDING) AS sess_no
      |  FROM o),
      |sess AS (
      |  SELECT user_id, CAST(sess_no AS BIGINT) AS sess_no,
      |         count(*) AS n_events, min(ts_us) AS start_us,
      |         max(ts_us) AS end_us, round(sum(value), 2) AS sum_value
      |  FROM s GROUP BY 1, 2)""".stripMargin

  val oracle: Map[String, String] = Map(
    "q_sessionize" ->
      (sessionsCte + "\nSELECT * FROM sess ORDER BY user_id, sess_no"),
    "q_asof_join" ->
      (asofCte + """
        |SELECT purchase_id, user_id, click_id, lag_us
        |FROM j WHERE rn = 1 ORDER BY purchase_id""".stripMargin),
    "q_range_join" ->
      (sessionsCte +
        """,
          |err AS (SELECT event_id, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us
          |        FROM events WHERE event_type = 'error')
          |SELECT e.event_id, count(*) AS n_active
          |FROM err e JOIN sess s ON e.ts_us BETWEEN s.start_us AND s.end_us
          |GROUP BY 1 ORDER BY 1""".stripMargin),
    // the sweep computes the SAME answer as the grid join — one oracle,
    // two physical strategies
    "q_active_sweep" ->
      (sessionsCte +
        """,
          |err AS (SELECT event_id, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us
          |        FROM events WHERE event_type = 'error')
          |SELECT e.event_id, count(*) AS n_active
          |FROM err e JOIN sess s ON e.ts_us BETWEEN s.start_us AND s.end_us
          |GROUP BY 1 ORDER BY 1""".stripMargin),
    "q_asof_tolerance" ->
      (asofCte + """
        |SELECT purchase_id, user_id,
        |       CASE WHEN lag_us <= 3600000000 THEN click_id END AS click_id,
        |       CASE WHEN lag_us <= 3600000000 THEN lag_us END AS lag_us
        |FROM j WHERE rn = 1 ORDER BY purchase_id""".stripMargin),
    "q_funnel" ->
      (sessionsCte +
        """,
          |w1 AS (
          |  SELECT user_id, sess_no, ts_us, event_id, event_type,
          |         max(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
          |           OVER (PARTITION BY user_id, sess_no ORDER BY ts_us, event_id
          |                 ROWS UNBOUNDED PRECEDING) AS s1
          |  FROM s),
          |w2 AS (
          |  SELECT *, max(CASE WHEN event_type = 'click' AND s1 = 1 THEN 1 ELSE 0 END)
          |           OVER (PARTITION BY user_id, sess_no ORDER BY ts_us, event_id
          |                 ROWS UNBOUNDED PRECEDING) AS s2
          |  FROM w1),
          |w3 AS (
          |  SELECT *, max(CASE WHEN event_type = 'purchase' AND s2 = 1 THEN 1 ELSE 0 END)
          |           OVER (PARTITION BY user_id, sess_no ORDER BY ts_us, event_id
          |                 ROWS UNBOUNDED PRECEDING) AS s3
          |  FROM w2),
          |f AS (
          |  SELECT user_id, sess_no,
          |         CAST(max(s1) + max(s2) + max(s3) AS INTEGER) AS stage
          |  FROM w3 GROUP BY 1, 2)
          |SELECT stage, count(*) AS n_sessions FROM f GROUP BY 1 ORDER BY 1""".stripMargin),
    "q_rolling_avg" ->
      """WITH d AS (
        |  SELECT epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS day,
        |         sum(value) AS rev
        |  FROM events GROUP BY 1)
        |SELECT day, round(rev, 2) AS revenue,
        |       round(avg(rev) OVER (ORDER BY day
        |               RANGE BETWEEN 6 PRECEDING AND CURRENT ROW), 2) AS avg7
        |FROM d ORDER BY day""".stripMargin,
    "q_json_field" ->
      """SELECT event_type, count(*) AS n, round(avg(k), 2) AS avg_k,
        |       min(k) AS min_k, max(k) AS max_k
        |FROM (SELECT event_type,
        |             CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
        |      FROM events)
        |GROUP BY 1 ORDER BY 1""".stripMargin)
}
