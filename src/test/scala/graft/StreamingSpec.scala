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
      source.addData(Change("a", 0L, "put", "v0"), Change("b", 1L, "put", "v1"))
      query.processAllAvailable()
      val s1 = spark.read.parquet(statePath).collect()
        .map(r => r.getAs[String]("rowkey") -> r.getAs[String]("payload")).toMap
      assert(s1 === Map("a" -> "v0", "b" -> "v1"))

      // Batch 2: upsert a, delete b, insert c.
      source.addData(Change("a", 2L, "put", "v2"), Change("b", 3L, "delete", ""),
        Change("c", 4L, "put", "v4"))
      query.processAllAvailable()
      val s2 = spark.read.parquet(statePath).collect()
        .map(r => r.getAs[String]("rowkey") -> r.getAs[String]("payload")).toMap
      assert(s2 === Map("a" -> "v2", "c" -> "v4"))

      // Batch 3: put b back after its delete.
      source.addData(Change("b", 5L, "put", "v5"))
      query.processAllAvailable()
      val s3 = spark.read.parquet(statePath).collect()
        .map(r => r.getAs[String]("rowkey") -> r.getAs[String]("payload")).toMap
      assert(s3 === Map("a" -> "v2", "b" -> "v5", "c" -> "v4"))
    } finally query.stop()
  }
}
