package graft

import java.nio.file.Files
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.streaming.IncrementalIndex

/** The core invariant of the incremental design, on real fixture data:
  * folding the changelog through per-chunk merges (the streaming
  * `foreachBatch` path) must land in exactly the state a full recompaction
  * produces — for any chunking. */
class IncrementalMergeSpec extends SparkSpec {

  private def changelog: DataFrame =
    Tables.events(spark, "/root/testdata/sf0.001").select(
      col("user_id").cast("string").as("rowkey"),
      col("event_id"),
      when(col("event_type") === "error", "delete").otherwise("put").as("op"),
      round(col("value"), 2).as("payload"))

  private def stateMap(df: DataFrame): Map[String, (Long, Double)] =
    df.collect().map(r => r.getAs[String]("rowkey") ->
      (r.getAs[Long]("event_id"), r.getAs[Double]("payload"))).toMap

  test("chunked incremental merges equal full recompaction (1000 events, 4 chunks)") {
    val ev = changelog
    val statePath = Files.createTempDirectory("graft_inc").toString + "/state"
    val bounds = Seq((0L, 250L), (250L, 500L), (500L, 750L), (750L, 1000000L))
    bounds.foreach { case (lo, hi) =>
      val chunk = ev.filter(col("event_id") >= lo && col("event_id") < hi)
      IncrementalIndex.mergeBatch(spark, chunk, statePath)
    }
    val incremental = stateMap(IncrementalIndex.readState(spark, statePath))
    val full = stateMap(IncrementalIndex.compact(ev))
    assert(incremental === full)
    assert(incremental.nonEmpty)
  }

  test("out-of-order chunks converge too (tombstones block stale resurrection)") {
    val ev = changelog
    val statePath = Files.createTempDirectory("graft_incO").toString + "/state"
    // deliver the NEWEST quarter first, oldest last — worst-case reordering
    val bounds = Seq((750L, 1000000L), (500L, 750L), (250L, 500L), (0L, 250L))
    bounds.foreach { case (lo, hi) =>
      IncrementalIndex.mergeBatch(spark,
        ev.filter(col("event_id") >= lo && col("event_id") < hi), statePath)
    }
    assert(stateMap(IncrementalIndex.readState(spark, statePath)) ===
      stateMap(IncrementalIndex.compact(ev)))
  }

  test("leftover .tmp/.old dirs from an interrupted merge don't break the next one") {
    val ev = changelog
    val base = Files.createTempDirectory("graft_incL").toString + "/state"
    IncrementalIndex.mergeBatch(spark, ev.filter(col("event_id") < 500), base)
    // simulate an interrupted previous swap
    new java.io.File(base + ".tmp").mkdirs()
    new java.io.File(base + ".old").mkdirs()
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(base + ".old", "junk"), "stale")
    IncrementalIndex.mergeBatch(spark, ev.filter(col("event_id") >= 500), base)
    assert(stateMap(IncrementalIndex.readState(spark, base)) ===
      stateMap(IncrementalIndex.compact(ev)))
    assert(!new java.io.File(base + ".old").exists())
  }

  test("a crash between the swap's renames doesn't lose state (.old is restored)") {
    // The ADVICE-flagged hole: dying between `rename(target, backup)` and
    // `rename(tmp, target)` leaves the ONLY copy of the state at `.old`.
    // The replayed merge must restore it before reading — otherwise it
    // would promote a batch-only state and silently drop chunk 1.
    val ev = changelog
    val base = Files.createTempDirectory("graft_incR").toString + "/state"
    IncrementalIndex.mergeBatch(spark, ev.filter(col("event_id") < 500), base)
    val p = new org.apache.hadoop.fs.Path(base)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    assert(fs.rename(p, new org.apache.hadoop.fs.Path(base + ".old")))
    // replay of the interrupted batch + the next chunk
    IncrementalIndex.mergeBatch(spark, ev.filter(col("event_id") >= 500), base)
    assert(stateMap(IncrementalIndex.readState(spark, base)) ===
      stateMap(IncrementalIndex.compact(ev)))
  }

  test("an empty micro-batch leaves the state unchanged") {
    val ev = changelog
    val base = Files.createTempDirectory("graft_incE").toString + "/state"
    IncrementalIndex.mergeBatch(spark, ev.filter(col("event_id") < 500), base)
    val before = stateMap(IncrementalIndex.readState(spark, base))
    IncrementalIndex.mergeBatch(spark, ev.filter(lit(false)), base)
    assert(stateMap(IncrementalIndex.readState(spark, base)) === before)
    assert(before.nonEmpty)
  }

  test("merge order of a chunk's internal rows doesn't matter") {
    val ev = changelog
    val statePathA = Files.createTempDirectory("graft_incA").toString + "/state"
    // single merge of everything, pre-shuffled
    IncrementalIndex.mergeBatch(spark, ev.orderBy(md5(col("rowkey"))), statePathA)
    assert(stateMap(IncrementalIndex.readState(spark, statePathA)) ===
      stateMap(IncrementalIndex.compact(ev)))
  }
}
