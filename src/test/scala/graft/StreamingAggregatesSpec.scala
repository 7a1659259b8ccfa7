package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.StreamingAggregates
import graft.streaming.StreamingAggregates.{Ev, KeyState}

class StreamingAggregatesSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("watermarked 30s windows aggregate event time across micro-batches") {
    implicit val ctx = spark.sqlContext
    val source = MemoryStream[(Timestamp, String)]
    val df = source.toDF().toDF("ts", "event_type")
    val q = StreamingAggregates.windowedCounts(df).writeStream
      .format("memory").queryName("win_counts").outputMode("update").start()
    try {
      source.addData(
        (ts("2024-01-01 00:00:05"), "click"),
        (ts("2024-01-01 00:00:25"), "click"),
        (ts("2024-01-01 00:00:31"), "view"))
      q.processAllAvailable()
      // second batch: same window updated, late-but-within-watermark event
      source.addData((ts("2024-01-01 00:00:10"), "click"))
      q.processAllAvailable()
      val rows = spark.sql(
        """SELECT win_start, event_type, max(n) AS n FROM win_counts
          |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin).collect()
        .map(r => (r.getTimestamp(0).toString, r.getString(1), r.getLong(2)))
      assert(rows.toSet === Set(
        ("2024-01-01 00:00:00.0", "click", 3L),
        ("2024-01-01 00:00:30.0", "view", 1L)))
    } finally q.stop()
  }

  test("session windows merge within the gap and split across it, per user") {
    implicit val ctx = spark.sqlContext
    val source = MemoryStream[(Timestamp, Long, Double)]
    val df = source.toDF().toDF("ts", "user_id", "value")
    // session windows are append-only: a session emits exactly once, when
    // the watermark passes its end — the contract that bounds state
    val q = StreamingAggregates.sessionCounts(df, gap = "10 minutes").writeStream
      .format("memory").queryName("sess_counts").outputMode("append").start()
    try {
      // user 1: 00:00 and 00:05 chain into one session; 00:30 starts a new
      // one. user 2: a lone event. Split across two micro-batches so the
      // chaining happens through the state store, not within one batch.
      source.addData(
        (ts("2024-01-01 00:00:00"), 1L, 1.0),
        (ts("2024-01-01 00:05:00"), 1L, 2.0))
      q.processAllAvailable()
      source.addData(
        (ts("2024-01-01 00:30:00"), 1L, 4.0),
        (ts("2024-01-01 00:31:00"), 2L, 8.0))
      q.processAllAvailable()
      // a far-future sentinel pushes the watermark past every session's
      // end + gap, closing and emitting them (its own session stays open)
      source.addData((ts("2024-01-01 02:00:00"), 99L, 0.0))
      q.processAllAvailable()
      val rows = spark.sql(
        """SELECT user_id, sess_start, sess_end, n_events, sum_value
          |FROM sess_counts ORDER BY user_id, sess_start""".stripMargin).collect()
        .map(r => (r.getLong(0), r.getTimestamp(1).toString,
          r.getTimestamp(2).toString, r.getLong(3), r.getDouble(4)))
      assert(rows.toSeq === Seq(
        (1L, "2024-01-01 00:00:00.0", "2024-01-01 00:15:00.0", 2L, 3.0),
        (1L, "2024-01-01 00:30:00.0", "2024-01-01 00:40:00.0", 1L, 4.0),
        (2L, "2024-01-01 00:31:00.0", "2024-01-01 00:41:00.0", 1L, 8.0)))
    } finally q.stop()
  }

  test("flatMapGroupsWithState emits only keys a batch actually changed") {
    implicit val ctx = spark.sqlContext
    val source = MemoryStream[Ev]
    val q = StreamingAggregates.changedState(source.toDS()).writeStream
      .format("memory").queryName("changed_state").outputMode("update").start()
    try {
      source.addData(Ev("a", 1, "put", "v1"), Ev("b", 2, "put", "v2"))
      q.processAllAvailable()
      assert(spark.table("changed_state").count() === 2)

      // stale event for a, real update for b → exactly ONE emission
      source.addData(Ev("a", 0, "put", "stale"), Ev("b", 3, "put", "v3"))
      q.processAllAvailable()
      val rows = spark.table("changed_state").as[KeyState].collect()
      assert(rows.length === 3)
      assert(rows.count(_.rowkey == "a") === 1) // no second emission for a
      assert(rows.exists(r => r.rowkey == "b" && r.payload == "v3"))
    } finally q.stop()
  }

  test("mapGroupsWithState keeps the latest event per rowkey across batches") {
    implicit val ctx = spark.sqlContext
    val source = MemoryStream[Ev]
    val q = StreamingAggregates.latestState(source.toDS()).writeStream
      .format("memory").queryName("latest_state").outputMode("update").start()
    try {
      source.addData(Ev("a", 1, "put", "v1"), Ev("b", 2, "put", "v2"))
      q.processAllAvailable()
      source.addData(Ev("a", 3, "put", "v3"), Ev("b", 0, "put", "stale"))
      q.processAllAvailable()
      val latest = spark.table("latest_state").as[KeyState].collect()
        .groupBy(_.rowkey).map { case (k, vs) => k -> vs.maxBy(_.event_id) }
      assert(latest("a").payload === "v3")
      // the stale event_id=0 for b must NOT displace event_id=2
      assert(latest("b").payload === "v2")
    } finally q.stop()
  }

  test("dedupStream emits only the first occurrence of each content hash") {
    implicit val ctx = spark.sqlContext
    val source = MemoryStream[(Long, String)]
    val df = source.toDF().toDF("doc_id", "text")
    val q = StreamingAggregates.dedupStream(df).writeStream
      .format("memory").queryName("dedup_out").outputMode("append").start()
    try {
      source.addData((1L, "alpha beta"), (2L, "gamma"), (3L, "alpha beta"))
      q.processAllAvailable()
      // a later batch re-sending known content must emit nothing new
      source.addData((4L, "gamma"), (5L, "delta"))
      q.processAllAvailable()
      val ids = spark.sql("SELECT doc_id FROM dedup_out ORDER BY doc_id")
        .collect().map(_.getLong(0)).toSeq
      assert(ids === Seq(1L, 2L, 5L))
    } finally q.stop()
  }

  test("dedupStreamWithin suppresses duplicates inside the watermark horizon") {
    implicit val ctx = spark.sqlContext
    val source = MemoryStream[(Long, Timestamp, String)]
    val df = source.toDF().toDF("doc_id", "ts", "text")
    val q = StreamingAggregates.dedupStreamWithin(df, "10 minutes").writeStream
      .format("memory").queryName("dedup_wm").outputMode("append").start()
    try {
      source.addData(
        (1L, ts("2024-01-01 00:00:00"), "alpha"),
        (2L, ts("2024-01-01 00:01:00"), "alpha")) // dup within horizon
      q.processAllAvailable()
      val ids = spark.sql("SELECT doc_id FROM dedup_wm ORDER BY doc_id")
        .collect().map(_.getLong(0)).toSeq
      assert(ids === Seq(1L))
    } finally q.stop()
  }
}
