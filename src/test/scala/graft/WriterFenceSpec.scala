package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.streaming.{IncrementalIndex, IngestPipeline, StateStore, WriterFence}

/** The cross-process single-writer fence: epoch claims are atomic and
  * strictly increasing, a newer claim makes every older writer fail its
  * next check, a live stream is fenced out mid-flight, and a rescale's
  * whole-root swap preserves the fence history. */
class WriterFenceSpec extends SparkSpec {
  import spark.implicits._

  test("claims increase; the older holder fails its next check; stale epochs are GC'd") {
    val root = Files.createTempDirectory("graft_wf").toString + "/state"
    val f1 = WriterFence.claim(spark, root)
    assert(f1.epoch === 1L)
    f1.check(spark) // sole holder: passes
    val f2 = WriterFence.claim(spark, root)
    assert(f2.epoch === 2L)
    f2.check(spark)
    val ex = intercept[WriterFence.FencedException] { f1.check(spark) }
    assert(ex.getMessage.contains("fenced out by epoch 2"))
    // the claimant owns the max epoch — older epoch files are gone
    assert(WriterFence.maxEpoch(spark, root).contains(2L))
    val files = new java.io.File(root + "/_writers").listFiles().map(_.getName)
      .filter(_.startsWith("e=")).toSet // RawLocalFS also keeps .crc sidecars
    assert(files === Set("e=2"))
  }

  test("a dead claimant's tmp never blocks or poisons later claims") {
    val root = Files.createTempDirectory("graft_wfT").toString + "/state"
    val wdir = new java.io.File(root + "/_writers")
    assert(wdir.mkdirs())
    assert(new java.io.File(wdir, "e=7.tmp-deadbeef").createNewFile())
    val f = WriterFence.claim(spark, root)
    assert(f.epoch === 1L) // the tmp is not a claimed epoch
    f.check(spark)
    assert(!new java.io.File(wdir, "e=7.tmp-deadbeef").exists()) // swept
  }

  test("a running merge stream is fenced out by a new claim instead of double-writing") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val source = MemoryStream[(String, Long, String, Double)]
    val base = Files.createTempDirectory("graft_wfS").toString
    val statePath = s"$base/state"
    val query = IncrementalIndex.start(
      source.toDF().toDF("rowkey", "event_id", "op", "payload"),
      statePath, s"$base/ckpt", intervalSeconds = 1)
    try {
      source.addData(("1", 0L, "put", 1.0), ("2", 1L, "put", 2.0))
      query.processAllAvailable()
      assert(IncrementalIndex.readState(spark, statePath).count() === 2L)
      // a replacement writer claims the root — e.g. a second driver
      WriterFence.claim(spark, statePath)
      source.addData(("3", 2L, "put", 3.0))
      val ex = intercept[Exception] { query.processAllAvailable() }
      def causes(t: Throwable): Seq[Throwable] =
        if (t == null) Seq.empty else t +: causes(t.getCause)
      assert(causes(ex).exists(_.isInstanceOf[WriterFence.FencedException]))
      // the fenced batch wrote nothing
      assert(IncrementalIndex.readState(spark, statePath).count() === 2L)
    } finally query.stop()
  }

  test("absent fence history fences: a root replaced wholesale grants no free pass") {
    val root = Files.createTempDirectory("graft_wfA").toString + "/state"
    val fence = WriterFence.claim(spark, root)
    fence.check(spark) // normal: history exists, we are the max
    // simulate a restore/manual replacement that dropped _writers
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rm)
      java.nio.file.Files.delete(f.toPath)
    }
    rm(new java.io.File(s"$root/_writers"))
    val e = intercept[WriterFence.FencedException] { fence.check(spark) }
    assert(e.getMessage.contains("no fence history"))
  }

  test("racing claimants never share an epoch (exclusive create + read-back)") {
    val root = Files.createTempDirectory("graft_wfC").toString + "/state"
    val pool = java.util.concurrent.Executors.newFixedThreadPool(8)
    try {
      val claims = (1 to 16).map { _ =>
        pool.submit(new java.util.concurrent.Callable[Long] {
          def call(): Long = WriterFence.claim(spark, root).epoch
        })
      }.map(_.get())
      assert(claims.distinct.size === claims.size, claims.sorted)
      assert(WriterFence.maxEpoch(spark, root).contains(claims.max))
    } finally pool.shutdown()
  }

  test("a zombie subroot stream is fenced after a pipeline restore (fence dir gone)") {
    val root = Files.createTempDirectory("graft_wfZ").toString + "/pipe"
    IngestPipeline.applyBatch(spark,
      Seq(("1", 0L, "put", "alpha beta gamma")).toDF("rowkey", "event_id", "op", "text"),
      root, batchId = 0L, numBuckets = 4)
    val dest = Files.createTempDirectory("graft_wfZd").toString + "/snap"
    IngestPipeline.snapshot(spark, root, dest)
    // a stream holds a fence on the POSTINGS subroot (IncrementalPostings
    // .start's claim) — restore swaps the whole pipeline root, and only
    // the pipeline root's own fence history is preserved
    val zombie = WriterFence.claim(spark, IngestPipeline.postingsRoot(root))
    IngestPipeline.restore(spark, dest, root)
    // the subroot's fence dir is gone; absent history must fence the
    // zombie rather than let it merge into the restored state
    intercept[WriterFence.FencedException] { zombie.check(spark) }
  }

  test("pipeline rescale fences out the stream's fence; state rescale keeps fence history") {
    val root = Files.createTempDirectory("graft_wfR").toString + "/pipe"
    IngestPipeline.applyBatch(spark,
      Seq(("1", 0L, "put", "alpha beta gamma"),
        ("2", 1L, "put", "delta epsilon zeta"))
        .toDF("rowkey", "event_id", "op", "text"),
      root, batchId = 0L, numBuckets = 4)
    val streamFence = WriterFence.claim(spark, root) // plays the running stream
    IngestPipeline.rescale(spark, root, 8)
    intercept[WriterFence.FencedException] { streamFence.check(spark) }
    // the row-state subroot went through a whole-root swap; a fence
    // claimed on it BEFORE the swap must still be visible after
    val sub = IngestPipeline.stateRoot(root)
    val subFence = WriterFence.claim(spark, sub)
    StateStore.rescale(spark, sub, "rowkey", 16)
    assert(WriterFence.maxEpoch(spark, sub).contains(subFence.epoch))
    subFence.check(spark) // still the holder — history survived the swap
  }
}
