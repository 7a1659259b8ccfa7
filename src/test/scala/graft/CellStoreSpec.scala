package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.streaming.CellStore

/** Replay-idempotence contract of the cell-level state (the property the
  * prefix-atomic commit depends on): re-merging an already-committed batch
  * must leave the retained set unchanged — an at-least-once duplicate put
  * must neither be retained twice nor evict a genuinely older distinct
  * version past maxVersions. */
class CellStoreSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("rowkey", StringType),
    StructField("qualifier", StringType),
    StructField("event_id", LongType),
    StructField("op", StringType),
    StructField("value", DoubleType)))

  private def df(rows: Seq[(String, String, Long, String, Double)]) =
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map(r =>
        Row(r._1, r._2, java.lang.Long.valueOf(r._3), r._4,
          java.lang.Double.valueOf(r._5))), 2),
      schema)

  private def retained(statePath: String): Set[(String, String, Long, Long)] = {
    val live = graft.streaming.StateStore.liveBuckets(spark, statePath)
    spark.read.parquet(live.map(d => s"$statePath/$d"): _*)
      .select("rowkey", "qualifier", "event_id", "version")
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getAs[Number](3).longValue()))
      .toSet
  }

  test("compactCells collapses whole-row duplicate puts before ranking") {
    // 4 distinct versions of one cell, maxVersions=3 → e4,e3,e2 retained.
    // The newest put arrives DUPLICATED (replay): without the dedupe the
    // duplicate pair would occupy ranks 1-2 and evict e2.
    val in = df(Seq(
      ("r1", "qA", 1L, "put", 1.0),
      ("r1", "qA", 2L, "put", 2.0),
      ("r1", "qA", 3L, "put", 3.0),
      ("r1", "qA", 4L, "put", 4.0),
      ("r1", "qA", 4L, "put", 4.0)))
    val out = CellStore.compactCells(in, maxVersions = 3)
      .select("event_id", "version").collect()
      .map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(out === Set((4L, 1), (3L, 2), (2L, 3)))
  }

  test("compactCells keeps distinct puts that share an event_id") {
    // Same event_id, different payload: both are genuine versions (the
    // stable hash tiebreak orders them), not replay duplicates.
    val in = df(Seq(
      ("r1", "qA", 7L, "put", 1.0),
      ("r1", "qA", 7L, "put", 2.0)))
    val out = CellStore.compactCells(in, maxVersions = 3)
    assert(out.count() === 2L)
    assert(out.select("version").collect().map(_.getInt(0)).sorted
      .toSeq === Seq(1, 2))
  }

  test("mergeCells replay of an already-committed batch is a no-op") {
    val root = java.nio.file.Files
      .createTempDirectory("graft_cellreplay").toString + "/state"
    val batch1 = df(Seq(
      ("r1", "qA", 1L, "put", 1.0),
      ("r1", "qA", 2L, "put", 2.0),
      ("r1", "qB", 3L, "put", 3.0),
      ("r2", "qA", 4L, "put", 4.0)))
    val batch2 = df(Seq(
      ("r1", "qA", 5L, "put", 5.0),
      ("r2", null, 6L, "delete", 0.0),
      ("r3", "qC", 7L, "put", 7.0)))
    CellStore.mergeCells(spark, batch1, root, maxVersions = 2, numBuckets = 4)
    CellStore.mergeCells(spark, batch2, root, maxVersions = 2, numBuckets = 4)
    val before = retained(root)
    // crash-after-partial-commit: the SAME batch is merged again
    CellStore.mergeCells(spark, batch2, root, maxVersions = 2, numBuckets = 4)
    assert(retained(root) === before,
      "replaying a committed batch must not change the retained cell set")
    // and the state is still the expected one: r1/qA top-2 = e5,e2;
    // r2 reduced to its tombstone; r3/qC = e7
    assert(before === Set(
      ("r1", "qA", 5L, 1L), ("r1", "qA", 2L, 2L), ("r1", "qB", 3L, 1L),
      ("r2", null, 6L, 1L), ("r3", "qC", 7L, 1L)))
  }

  test("mergeCells replay cannot evict an older distinct version") {
    val root = java.nio.file.Files
      .createTempDirectory("graft_cellreplay2").toString + "/state"
    val seed = df(Seq(
      ("r9", "qZ", 10L, "put", 1.0),
      ("r9", "qZ", 11L, "put", 2.0)))
    val dup = df(Seq(("r9", "qZ", 12L, "put", 3.0)))
    CellStore.mergeCells(spark, seed, root, maxVersions = 3, numBuckets = 4)
    CellStore.mergeCells(spark, dup, root, maxVersions = 3, numBuckets = 4)
    CellStore.mergeCells(spark, dup, root, maxVersions = 3, numBuckets = 4)
    val got = retained(root)
    assert(got === Set(
      ("r9", "qZ", 12L, 1L), ("r9", "qZ", 11L, 2L), ("r9", "qZ", 10L, 3L)),
      s"duplicate must collapse and e10 must survive, got $got")
  }
}
