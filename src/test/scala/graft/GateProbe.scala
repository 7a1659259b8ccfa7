package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev harness (not shipped): ONE fresh-JVM sample of the bench's
  * small-flush ingest leg — bootstrap(5k docs) + five 1000-doc gated
  * batches against the growing state — printing the gate phase split
  * (sketch/probe/score/log_commit) and per-batch probe seconds as one
  * JSON line. Round-18 verdict item #2's measurement tool: the per-batch
  * STATE-PROBE fixed cost (~3.1–3.6 s/batch on r17 records) is the
  * binding small-flush term; this isolates it from the bench's 9-minute
  * full run so the fused-bucket-id-job + listing-cache changes can be
  * A/B'd in minutes. `Test/runMain graft.GateProbe`. */
object GateProbe {
  def main(args: Array[String]): Unit = {
    java.util.Locale.setDefault(java.util.Locale.ROOT)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val tag = sys.env.getOrElse("SPARK_GRAFT_AB_TAG", "untagged")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // job-level attribution: (start epoch ms, duration ms) per job id —
    // distinguishes "many small fixed-overhead jobs" from "one big job"
    val jobLog = new java.util.concurrent.ConcurrentHashMap[Int, (Long, Long, String)]()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      private val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        val site = j.stageInfos.lastOption.map(_.name).getOrElse("?")
        starts.put(j.jobId, (j.time, site)): Unit
      }
      override def onJobEnd(j: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
        val (s, site) = starts.getOrDefault(j.jobId, (j.time, "?"))
        jobLog.put(j.jobId, (s, j.time - s, site)): Unit
      }
    })
    def loadavg1m(): Double = try {
      java.nio.file.Files.readAllLines(
        java.nio.file.Paths.get("/proc/loadavg")).get(0).split(" ")(0).toDouble
    } catch { case _: Throwable => -1.0 }
    val root = java.nio.file.Files.createTempDirectory("graft_gateProbe")
    val pipe = root.toString + "/pipe"
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id").cast("string").as("rowkey"),
        col("doc_id").as("event_id"), lit("put").as("op"), col("text"))
      .withColumn("rn",
        row_number().over(
          org.apache.spark.sql.expressions.Window.orderBy("event_id")) - 1)
      .withColumn("b", floor(col("rn") / 1000L)).drop("rn")
      .localCheckpoint()
    val nBatches = docs.agg(max(col("b"))).head().getLong(0) + 1
    // bootstrap the SAME corpus first (the bench leg's shape): every
    // gated batch then probes a fully-populated state
    graft.streaming.IngestPipeline.bootstrap(spark, docs.drop("b"),
      root.toString + "/boot")
    val load0 = loadavg1m()
    var gateSec = 0.0; var mergeSec = 0.0
    val phases = scala.collection.mutable.LinkedHashMap[String, Double]()
    val perBatchProbe = scala.collection.mutable.ArrayBuffer[Double]()
    val t0 = System.nanoTime()
    val batchJobs = scala.collection.mutable.ArrayBuffer[String]()
    (0L until nBatches).foreach { b =>
      val probe0 = phases.getOrElse("probe", 0.0)
      val jobs0 = jobLog.size()
      val (g, m, ph) = graft.streaming.IngestPipeline.applyBatchPhased(spark,
        docs.filter(col("b") === b).drop("b"), pipe, b)
      gateSec += g; mergeSec += m
      ph.foreach { case (n, s) => phases(n) = phases.getOrElse(n, 0.0) + s }
      perBatchProbe += phases.getOrElse("probe", 0.0) - probe0
      import scala.jdk.CollectionConverters._
      val durs = jobLog.asScala.toSeq.sortBy(_._1).drop(jobs0)
        .map { case (_, (_, d, site)) => (d, site) }
      val top = durs.sortBy(-_._1).take(12)
        .map { case (d, s) => s""""$s:$d"""" }.mkString(",")
      batchJobs += s"""{"n_jobs":${durs.size},"top":[$top]}"""
    }
    val sec = (System.nanoTime() - t0) / 1e9
    // probe-only attribution: re-run the DECISION procedure alone (no
    // commit, no merge — gateDecisions is pure) on the last batch against
    // the accumulated state, and log every job it runs with its call site
    locally {
      import scala.jdk.CollectionConverters._
      val jobs0 = jobLog.size()
      val tg0 = System.nanoTime()
      graft.streaming.IncrementalShingles.gateDecisions(spark, pipe + "/shingles",
        docs.filter(col("b") === (nBatches - 1)).drop("b")).count(): Unit
      val tg = (System.nanoTime() - tg0) / 1e9
      val js = jobLog.asScala.toSeq.sortBy(_._1).drop(jobs0)
        .map { case (_, (_, d, site)) => f""""${site.take(60)}%s":$d""" }
      println(f"""GATEDECIDE {"sec":$tg%.3f,"n_jobs":${js.size},"jobs":[${js.mkString(",")}]}""")
    }
    val phJson = phases.map { case (n, s) => f""""$n":$s%.3f""" }
      .mkString("{", ",", "}")
    val pbJson = perBatchProbe.map(s => f"$s%.3f").mkString("[", ",", "]")
    try graft.operators.Materialize.deleteLocalDir(root.toString)
    catch { case _: Throwable => }
    println(f"""GATEJSON {"tag":"$tag","t_epoch_ms":${System.currentTimeMillis()},"batches":$nBatches,"sec":$sec%.3f,"gate_sec":$gateSec%.3f,"merge_sec":$mergeSec%.3f,"gate_phases":$phJson,"probe_per_batch":$pbJson,"batch_jobs":[${batchJobs.mkString(",")}],"loadavg_1m":$load0%.2f}""")
    spark.stop()
  }
}
