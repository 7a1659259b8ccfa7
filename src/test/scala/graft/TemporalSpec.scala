package graft

import org.apache.spark.sql.functions._
import graft.operators.Temporal

/** Temporal family: gap sessionization, union-tag as-of join, grid-cell
  * interval join, JSON field extraction — crafted-data correctness plus
  * the plan shapes the Scaladoc promises. */
class TemporalSpec extends SparkSpec {
  import org.apache.spark.sql.DataFrame

  private val M = 60L * 1000000 // one minute in µs

  private def ev(rows: (Long, Long, Long, Double)*): DataFrame = {
    import spark.implicits._
    rows.toDF("user_id", "event_id", "ts", "value")
  }

  test("sessions split at gaps > 30 min and aggregate per session") {
    // user 1: events at 0, 10, 50 min (10→50 is a 40-min gap → split);
    // user 2: single event
    val df = Temporal.sessions(ev(
      (1L, 1L, 0L, 1.0), (1L, 2L, 10 * M, 2.0), (1L, 3L, 50 * M, 4.0),
      (2L, 4L, 5 * M, 8.0)))
      .orderBy("user_id", "sess_no")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5)))
    assert(df.toSeq == Seq(
      (1L, 1L, 2L, 0L, 10 * M, 3.0),
      (1L, 2L, 1L, 50 * M, 50 * M, 4.0),
      (2L, 1L, 1L, 5 * M, 5 * M, 8.0)))
  }

  test("a gap of exactly 30 minutes does NOT split (strictly-greater rule)") {
    val df = Temporal.sessions(ev(
      (1L, 1L, 0L, 1.0), (1L, 2L, Temporal.SessionGapUs, 1.0)))
      .collect()
    assert(df.length == 1 && df(0).getAs[Long]("n_events") == 2L)
  }

  test("asofJoin picks the latest right row at-or-before, per key") {
    val left = ev((1L, 10L, 100 * M, 0.0), (1L, 11L, 5 * M, 0.0),
      (2L, 12L, 50 * M, 0.0))
    val right = ev((1L, 1L, 20 * M, 0.0), (1L, 2L, 90 * M, 0.0),
      (1L, 3L, 200 * M, 0.0)) // user 2 has no right rows
    val out = Temporal.asofJoin(left, right, "user_id", "ts", "event_id", Seq("event_id"))
      .select("event_id", "asof_event_id").orderBy("event_id")
      .collect().map(r => (r.getLong(0), Option(r.get(1)).map(_.asInstanceOf[Long])))
    assert(out.toSeq == Seq(
      (10L, Some(2L)),  // 90 min ≤ 100 min, latest
      (11L, None),      // nothing at-or-before 5 min
      (12L, None)))     // user 2: no clicks at all
  }

  test("asofJoin: equal-ts right row is visible (inclusive) and max tie wins") {
    val left = ev((1L, 10L, 50 * M, 0.0))
    val right = ev((1L, 1L, 50 * M, 0.0), (1L, 2L, 50 * M, 0.0), (1L, 3L, 10 * M, 0.0))
    val out = Temporal.asofJoin(left, right, "user_id", "ts", "event_id", Seq("event_id"))
      .select("asof_event_id").collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(2L)) // equal ts included; tie → max event_id
  }

  test("asofJoin tolerance nulls matches staler than the bound") {
    val left = ev((1L, 10L, 100 * M, 0.0), (1L, 11L, 25 * M, 0.0))
    val right = ev((1L, 1L, 20 * M, 0.0))
    val out = Temporal.asofJoin(left, right, "user_id", "ts", "event_id",
      Seq("event_id"), toleranceUs = Some(10 * M))
      .select("event_id", "asof_event_id").orderBy("event_id")
      .collect().map(r => (r.getLong(0), Option(r.get(1)).map(_.asInstanceOf[Long])))
    assert(out.toSeq == Seq(
      (10L, None),      // 80 min stale > 10 min tolerance
      (11L, Some(1L)))) // 5 min stale, inside tolerance
  }

  test("asofJoin: a matched right row's NULL payload stays NULL (no older-row bleed)") {
    import spark.implicits._
    // the at-or-before match (ts=10) carries a NULL payload; an older
    // right row (ts=5) has a value. The contract picks the ROW, so the
    // output must be NULL — a per-column ignoreNulls carry would skip to
    // the older row's 'x' and mix columns from two right rows
    val left = Seq((1L, 12L, 100L)).toDF("user_id", "event_id", "ts")
    val right = Seq(
      (1L, 1L, 50L, Some("x")),
      (1L, 2L, 90L, None: Option[String]))
      .toDF("user_id", "event_id", "ts", "payload")
    val out = Temporal.asofJoin(left, right, "user_id", "ts", "event_id",
      Seq("payload"))
      .select("asof_payload").collect()
    assert(out.length === 1 && out.head.isNullAt(0),
      s"matched row's null payload must not bleed an older row's value: " +
        out.head.toString)
    // and the tolerance path judges freshness by the MATCHED row too
    val tol = Temporal.asofJoin(left, right, "user_id", "ts", "event_id",
      Seq("payload"), toleranceUs = Some(20L))
      .select("asof_payload").collect()
    assert(tol.head.isNullAt(0))
  }

  test("activeIntervalCounts: inclusive bounds, multi-cell intervals count once") {
    import spark.implicits._
    // interval A spans 3 grid cells; point P sits in its middle cell —
    // grid join must yield exactly one match, not one per covered cell
    val intervals = Seq(
      (0L, 3 * Temporal.CellUs),                       // A: wide
      (Temporal.CellUs, Temporal.CellUs + 10 * M),     // B: overlaps P's cell
      (10 * Temporal.CellUs, 11 * Temporal.CellUs))    // C: far away
      .toDF("start_us", "end_us")
    val points = Seq(
      (100L, Temporal.CellUs + 5 * M),   // inside A and B
      (101L, 3 * Temporal.CellUs),       // exactly at A's inclusive end
      (102L, 20 * Temporal.CellUs))      // inside nothing → absent
      .toDF("event_id", "ts")
    val out = Temporal.activeIntervalCounts(points, intervals, "event_id")
      .orderBy("event_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(out.toSeq == Seq((100L, 2L), (101L, 1L)))
  }

  test("grid join, raw sweep, and indexed sweep agree on random interval sets") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    import spark.implicits._
    // deterministic pseudo-random intervals and points spanning several
    // segments, including point-only segments (between sparse intervals)
    // and points outside the boundary range on both sides — the dense-
    // offset fallback's edge cases
    val H = 3600000000L
    val segUs = 2 * H // small width ⇒ many segments at this fixture size
    val iGen = Gen.listOfN(60, for {
      s <- Gen.choose(0L, 40 * H)
      len <- Gen.choose(1L, 6 * H)
    } yield (s, s + len))
    val pGen = Gen.listOfN(80, Gen.choose(-2 * H, 50 * H))
    val intervals = iGen(Gen.Parameters.default, Seed(7L)).get
      .toDF("start_us", "end_us")
    val points = pGen(Gen.Parameters.default, Seed(11L)).get
      .zipWithIndex.map { case (ts, i) => (i.toLong, ts) }
      .toDF("event_id", "ts")
    val bounds = intervals
      .select(col("start_us").as("ts"), lit(1L).as("d"))
      .unionByName(intervals.select((col("end_us") + 1).as("ts"), lit(-1L).as("d")))
      .groupBy("ts").agg(sum("d").as("d"))
    val errors = points.select(col("event_id"), col("ts"),
      floor(col("ts") / segUs).as("seg"))
    val indexed = Temporal.activeSweepIndexed(
        Temporal.stepsOf(bounds, segUs), Temporal.offsetsOf(bounds, segUs),
        errors)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    // the general (un-indexed) sweep — identical rows, zero counts kept
    val ev = points.select(col("event_id"), col("ts"))
      .withColumn("event_type", lit("error"))
      .withColumn("user_id", lit(0L)).withColumn("value", lit(0.0))
    val raw = Temporal.activeSweepBounds(bounds, ev, segUs)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(indexed === raw,
      s"indexed sweep diverged from the raw sweep: ${indexed.toSet.diff(raw.toSet)}")
    // the grid join (inner — zero-count points absent) agrees on positives
    val grid = Temporal.activeIntervalCounts(points, intervals, "event_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(indexed.filter(_._2 > 0L) === grid,
      s"sweep positives diverged from grid join")
    assert(grid.nonEmpty && indexed.exists(_._2 == 0L),
      "fixture must exercise both matched and zero-count points")
  }

  test("funnel stage requires the steps IN ORDER, not as a bag of types") {
    import spark.implicits._
    // user 1: purchase → click → view (all types present, wrong order) = stage 1
    // user 2: view → purchase → click → purchase = stage 3 (subsequence)
    // user 3: click only = stage 0
    val events = Seq(
      (1L, 1L, 1 * M, "purchase"), (1L, 2L, 2 * M, "click"), (1L, 3L, 3 * M, "view"),
      (2L, 4L, 1 * M, "view"), (2L, 5L, 2 * M, "purchase"), (2L, 6L, 3 * M, "click"),
      (2L, 7L, 4 * M, "purchase"),
      (3L, 8L, 1 * M, "click"))
      .toDF("user_id", "event_id", "ts", "event_type")
    val staged = Temporal.funnelStages(events, Seq("view", "click", "purchase"))
      .collect().map(r => r.getLong(0) -> r.getInt(2)).toMap
    assert(staged === Map(1L -> 1, 2L -> 3, 3L -> 0))
    // step names reach a SQL lambda — non-literal names are rejected
    intercept[IllegalArgumentException] {
      Temporal.funnelStages(events, Seq("view'; --"))
    }
  }

  test("sessionize plans ONE exchange: window and agg share the user_id partitioning") {
    val df = Temporal.sessions(ev((1L, 1L, 0L, 1.0), (2L, 2L, 0L, 1.0)))
    df.collect()
    // the AQE plan string prints Final and Initial sections — count the final only
    val plan = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    assert("Exchange hashpartitioning".r.findAllIn(plan).length == 1, plan)
  }

  test("range join is an equi-join on the grid cell — no nested-loop, no cartesian") {
    val dir = "/root/testdata/sf0.001"
    val df = SparkEntry.queries("q_range_join")(spark, dir)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"), plan)
  }

  test("sessions equal an independent driver-side model on random event sets") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    import spark.implicits._
    val gen = for {
      u <- Gen.choose(0L, 3L)
      ts <- Gen.choose(0L, 3 * Temporal.SessionGapUs)
    } yield (u, ts)
    for (seed <- 1 to 5) {
      val rows = Gen.listOfN(40, gen)
        .pureApply(Gen.Parameters.default, Seed(seed.toLong))
        .zipWithIndex.map { case ((u, ts), i) => (u, i.toLong, ts, 1.0) }
      val got = Temporal.sessions(rows.toDF("user_id", "event_id", "ts", "value"))
        .select("user_id", "sess_no", "n_events", "start_us", "end_us")
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
        .toSet
      // the model: per user, sort by (ts, id) and fold gap splits
      val want = rows.groupBy(_._1).toSeq.flatMap { case (u, es) =>
        val sorted = es.sortBy(e => (e._3, e._2))
        val sessions = sorted.foldLeft(List.empty[List[(Long, Long, Long, Double)]]) {
          (acc, e) => acc match {
            case cur :: rest if e._3 - cur.head._3 <= Temporal.SessionGapUs =>
              (e :: cur) :: rest
            case _ => List(e) :: acc
          }
        }.reverse.map(_.reverse)
        sessions.zipWithIndex.map { case (s, i) =>
          (u, (i + 1).toLong, s.length.toLong, s.head._3, s.last._3)
        }
      }.toSet
      assert(got === want, s"seed $seed")
    }
  }

  test("asofJoin equals an independent driver-side model, including ts ties") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    import spark.implicits._
    // a tiny ts range forces equal-ts collisions on and across sides
    val gen = for {
      u <- Gen.choose(0L, 2L)
      ts <- Gen.choose(0L, 15L)
    } yield (u, ts * M)
    for (seed <- 1 to 5) {
      val all = Gen.listOfN(40, gen)
        .pureApply(Gen.Parameters.default, Seed(100L + seed))
        .zipWithIndex.map { case ((u, ts), i) => (u, i.toLong, ts, 0.0) }
      val (lefts, rights) = all.partition(_._2 % 2 == 0)
      val got = Temporal.asofJoin(
        lefts.toDF("user_id", "event_id", "ts", "value"),
        rights.toDF("user_id", "event_id", "ts", "value"),
        "user_id", "ts", "event_id", Seq("event_id"))
        .select("event_id", "asof_event_id")
        .collect()
        .map(r => r.getLong(0) -> Option(r.get(1)).map(_.asInstanceOf[Long]))
        .toMap
      val want = lefts.map { l =>
        l._2 -> rights.filter(r => r._1 == l._1 && r._3 <= l._3)
          .sortBy(r => (r._3, r._2)).lastOption.map(_._2)
      }.toMap
      assert(got === want, s"seed $seed")
    }
  }

  test("q_asof_join returns one row per purchase at sf0.001") {
    val dir = "/root/testdata/sf0.001"
    val n = SparkEntry.queries("q_asof_join")(spark, dir).count()
    val purchases = Tables.events(spark, dir).filter(col("event_type") === "purchase").count()
    assert(n == purchases && n > 0)
  }

  test("q_json_field extracts props.k without a UDF and aggregates per type") {
    val dir = "/root/testdata/sf0.001"
    val rows = SparkEntry.queries("q_json_field")(spark, dir).collect()
    assert(rows.length == 5) // the five event types
    assert(rows.forall(r => r.getAs[Long]("min_k") >= 0))
  }
}
