package graft

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev harness (not shipped): JOB COUNT + wall-clock per gated 50-doc
  * flush — the shape where per-batch fixed cost amortizes worst (the
  * round-12 verdict's small-flush profile ask). Seeds a pipeline with
  * 2000 docs, then applies three 50-doc gated batches, printing per batch
  * the Spark job count and the gate/merge second split. Read beside
  * [[GateProfile]] (which splits the gate's own steps over a bulk batch).
  * `Test/runMain graft.FlushProfile`. */
object FlushProfile {
  def main(args: Array[String]): Unit = {
    java.util.Locale.setDefault(java.util.Locale.ROOT)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.streaming.IngestPipeline
    val root = java.nio.file.Files.createTempDirectory("graft_flushprof")
      .toString + "/pipe"
    val jobs = new AtomicInteger(0)
    val sites = new java.util.concurrent.ConcurrentHashMap[String, AtomicInteger]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        jobs.incrementAndGet()
        // AQE/broadcast sub-jobs run under opaque future callsites; the
        // submitting action's callsite survives in the job properties
        val site = Option(j.properties)
          .flatMap(p => Option(p.getProperty("callSite.short")))
          .filter(_.nonEmpty)
          .orElse(j.stageInfos.lastOption.map(_.name))
          .getOrElse("?")
        sites.computeIfAbsent(site, _ => new AtomicInteger(0))
          .incrementAndGet(): Unit
      }
    })
    val all = Tables.documents(spark, sfDir)
      .select(col("doc_id").cast("string").as("rowkey"),
        col("doc_id").as("event_id"), lit("put").as("op"), col("text"))
      .limit(2150).localCheckpoint()
    def batchOf(lo: Long, hi: Long) =
      all.filter(col("event_id") >= lo && col("event_id") < hi)
    // seed: one bulk gated batch — the steady-state background
    IngestPipeline.applyBatch(spark, batchOf(0, 2000), root, batchId = 0L)
    for (i <- 0 until 3) {
      val lo = 2000L + i * 50
      jobs.set(0)
      sites.clear()
      val t0 = System.nanoTime()
      val (gateSec, mergeSec) = IngestPipeline.applyBatchTimed(spark,
        batchOf(lo, lo + 50), root, batchId = i + 1L)
      val sec = (System.nanoTime() - t0) / 1e9
      // listener events are async (private bus); a short settle is enough
      // for a dev profile — job STARTS have all fired by the time the
      // actions returned, the sleep just covers bus dispatch
      Thread.sleep(300)
      println(f"PROFILE flush50 batch=${i + 1} jobs=${jobs.get()} " +
        f"sec=$sec%.2f gate=$gateSec%.2f merge=$mergeSec%.2f")
      if (i == 2) {
        import scala.jdk.CollectionConverters._
        sites.asScala.toSeq.sortBy(-_._2.get()).take(25).foreach {
          case (site, n) => println(s"PROFILE   site ${n.get()}x $site")
        }
      }
    }
    graft.operators.Materialize.deleteLocalDir(root.stripSuffix("/pipe"))
    spark.stop()
  }
}
