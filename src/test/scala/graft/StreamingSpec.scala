package graft

import java.nio.file.Files
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger
import graft.streaming.IncrementalIndex

/** The streaming flavor of the reference's incremental index maintenance:
  * micro-batches merged into a materialized state table via foreachBatch
  * (SURVEY.md §2.A O7–O10). */
class StreamingSpec extends SparkSpec {
  import spark.implicits._

  case class Change(rowkey: String, event_id: Long, op: String, payload: String)

  test("foreachBatch merge maintains latest-wins state across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val source = MemoryStream[Change]
    val statePath = Files.createTempDirectory("graft_state").toString + "/state"
    val checkpoint = Files.createTempDirectory("graft_ckpt").toString

    val query = IncrementalIndex.start(
      source.toDF(), statePath, checkpoint, intervalSeconds = 1)
    try {
      // Batch 1: two puts.
      def live: Map[String, String] =
        IncrementalIndex.readState(spark, statePath).collect()
          .map(r => r.getAs[String]("rowkey") -> r.getAs[String]("payload")).toMap

      source.addData(Change("a", 0L, "put", "v0"), Change("b", 1L, "put", "v1"))
      query.processAllAvailable()
      assert(live === Map("a" -> "v0", "b" -> "v1"))

      // Batch 2: upsert a, delete b, insert c.
      source.addData(Change("a", 2L, "put", "v2"), Change("b", 3L, "delete", ""),
        Change("c", 4L, "put", "v4"))
      query.processAllAvailable()
      assert(live === Map("a" -> "v2", "c" -> "v4"))

      // Batch 3: a STALE put for b (event_id below its tombstone) must NOT
      // resurrect it — the persisted tombstone wins.
      source.addData(Change("b", 1L, "put", "stale"))
      query.processAllAvailable()
      assert(live === Map("a" -> "v2", "c" -> "v4"))

      // Batch 4: a genuinely newer put for b takes effect.
      source.addData(Change("b", 5L, "put", "v5"))
      query.processAllAvailable()
      assert(live === Map("a" -> "v2", "b" -> "v5", "c" -> "v4"))
    } finally query.stop()
  }

  test("a stream started with a rollup keeps the maintained aggregate current") {
    implicit val sqlCtx = spark.sqlContext
    val source = MemoryStream[Change]
    val base = Files.createTempDirectory("graft_sroll").toString
    val statePath = base + "/state"
    val sp = graft.streaming.IncrementalRollup.Spec(
      base + "/rollup", Seq("payload"))
    val query = IncrementalIndex.start(
      source.toDF(), statePath, base + "/ckpt", intervalSeconds = 1,
      rollup = Some(sp))
    try {
      def groups: Map[String, Long] =
        graft.streaming.IncrementalRollup.read(spark, sp).collect()
          .map(r => r.getAs[String]("payload") -> r.getAs[Long]("n")).toMap
      source.addData(Change("a", 0L, "put", "x"), Change("b", 1L, "put", "y"))
      query.processAllAvailable()
      assert(groups === Map("x" -> 1L, "y" -> 1L))
      // an update moves a's group; a delete retires b's
      source.addData(Change("a", 2L, "put", "y"), Change("b", 3L, "delete", ""))
      query.processAllAvailable()
      assert(groups === Map("y" -> 1L))
    } finally query.stop()
  }

  test("first_delay holds the FIRST merge only (reference timer's initial delay)") {
    // Unit-level check of the gate both starts share: the first call waits
    // out the remainder of the delay, later calls return immediately.
    val gate = IncrementalIndex.firstBatchGate(1)
    val t0 = System.nanoTime()
    gate()
    val firstMs = (System.nanoTime() - t0) / 1000000L
    assert(firstMs >= 900L, s"first call returned after ${firstMs}ms")
    val t1 = System.nanoTime()
    gate()
    assert((System.nanoTime() - t1) / 1000000L < 200L, "second call must not wait")
  }

  test("a stream started with firstDelaySeconds commits its first batch late") {
    implicit val sqlCtx = spark.sqlContext
    val source = MemoryStream[Change]
    val statePath = Files.createTempDirectory("graft_stateD").toString + "/state"
    val checkpoint = Files.createTempDirectory("graft_ckptD").toString
    val t0 = System.nanoTime()
    val query = IncrementalIndex.start(
      source.toDF(), statePath, checkpoint, intervalSeconds = 1, firstDelaySeconds = 1)
    try {
      source.addData(Change("a", 0L, "put", "v0"))
      query.processAllAvailable() // blocks through the gate + the merge
      val elapsedMs = (System.nanoTime() - t0) / 1000000L
      assert(elapsedMs >= 1000L, s"first commit landed after only ${elapsedMs}ms")
      assert(IncrementalIndex.readState(spark, statePath).count() === 1L)
    } finally query.stop()
  }
}
