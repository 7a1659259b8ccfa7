package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev harness (not shipped): ONE fresh-JVM sample of the bench's two
  * driver-flagged ingest legs — `ingest_bulk` (one batch of the whole
  * documents table) and `ingest_10k` (the doubled corpus's one 10k-doc
  * batch) — with the gate/merge phase split and the io/cpu counters,
  * printed as one JSON line. The round-16 adjudication driver alternates
  * invocations of this main between two checkouts (r13-close d1e5d18 vs
  * HEAD) to bisect the quiet-box merge_sec drift (bulk 4.1→4.3→7.0 s
  * across r13/r14/r15 heads) into CODE vs ENVIRONMENT, the same
  * interleaved protocol that closed the PQ-batch creep in round 15.
  * `Test/runMain graft.IngestAbProbe`. */
object IngestAbProbe {
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
    def diskStats(): (Long, Long, Long) = try {
      val dev = "^(sd[a-z]+|vd[a-z]+|nvme\\d+n\\d+|xvd[a-z]+)$".r
      var (sr, sw, busy) = (0L, 0L, 0L)
      java.nio.file.Files.readAllLines(
        java.nio.file.Paths.get("/proc/diskstats")).forEach { line =>
        val f = line.trim.split("\\s+")
        if (f.length >= 13 && dev.findFirstIn(f(2)).isDefined) {
          sr += f(5).toLong; sw += f(9).toLong; busy += f(12).toLong
        }
      }
      (sr, sw, busy)
    } catch { case _: Throwable => (0L, 0L, 0L) }
    def cpuStat(): (Long, Long, Long, Long, Long) = try {
      val f = java.nio.file.Files.readAllLines(
        java.nio.file.Paths.get("/proc/stat")).get(0).trim.split("\\s+")
      // irq+softirq fold into sys — an incomplete jiffy denominator
      // redistributed kernel-storm time into the other fractions
      // (round-16 ADVICE; same fix as Bench.cpuStat)
      (f(1).toLong + f(2).toLong,
        f(3).toLong + (if (f.length > 6) f(6).toLong else 0L) +
          (if (f.length > 7) f(7).toLong else 0L),
        f(4).toLong, f(5).toLong,
        if (f.length > 8) f(8).toLong else 0L)
    } catch { case _: Throwable => (0L, 0L, 0L, 0L, 0L) }
    def gcMillis(): Long = {
      var t = 0L
      java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
        .forEach(b => t += math.max(0L, b.getCollectionTime))
      t
    }
    def loadavg1m(): Double = try {
      java.nio.file.Files.readAllLines(
        java.nio.file.Paths.get("/proc/loadavg")).get(0).split(" ")(0).toDouble
    } catch { case _: Throwable => -1.0 }

    // Bench's ingestAt, stripped to the two flagged legs: no bootstrap,
    // no rollup/registry, one leg per call against a fresh root.
    def leg(label: String, doubled: Boolean): String = {
      val root = java.nio.file.Files.createTempDirectory(s"graft_abIngest_$label")
      val pipe = root.toString + "/pipe"
      val base = Tables.documents(spark, sfDir)
        .select(col("doc_id").cast("string").as("rowkey"),
          col("doc_id").as("event_id"), lit("put").as("op"), col("text"))
      val corpus = if (!doubled) base else base.unionAll(
        base.select(
          concat(col("event_id") + 1000000L).cast("string").as("rowkey"),
          (col("event_id") + 1000000L).as("event_id"), col("op"),
          concat_ws(" ", reverse(split(col("text"), " "))).as("text")))
      val docs = corpus.localCheckpoint()
      val nDocs = docs.count()
      val load0 = loadavg1m()
      val (sr0, sw0, busy0) = diskStats()
      val (us0, sy0, id0, io0, st0) = cpuStat()
      val gc0 = gcMillis()
      val t0 = System.nanoTime()
      val (g, m) = graft.streaming.IngestPipeline.applyBatchTimed(spark,
        docs, pipe, 0L)
      val sec = (System.nanoTime() - t0) / 1e9
      val (sr1, sw1, busy1) = diskStats()
      val (us1, sy1, id1, io1, st1) = cpuStat()
      val gc1 = gcMillis()
      val jifTot = math.max(1L,
        (us1 - us0) + (sy1 - sy0) + (id1 - id0) + (io1 - io0) + (st1 - st0))
      try graft.operators.Materialize.deleteLocalDir(root.toString)
      catch { case _: Throwable => }
      f""""$label":{"docs":$nDocs,"sec":$sec%.3f,"docs_per_sec":${nDocs / sec}%.1f,"gate_sec":$g%.3f,"merge_sec":$m%.3f,"io":{"sectors_read":${sr1 - sr0},"sectors_written":${sw1 - sw0},"busy_frac":${(busy1 - busy0) / (sec * 1000)}%.3f,"loadavg_1m":$load0%.2f,"user_frac":${(us1 - us0).toDouble / jifTot}%.3f,"sys_frac":${(sy1 - sy0).toDouble / jifTot}%.3f,"idle_frac":${(id1 - id0).toDouble / jifTot}%.3f,"iowait_frac":${(io1 - io0).toDouble / jifTot}%.3f,"steal_frac":${(st1 - st0).toDouble / jifTot}%.3f,"gc_ms":${gc1 - gc0}}}"""
    }
    val bulk = leg("bulk", doubled = false)
    val tenK = leg("b10k", doubled = true)
    println(s"""ABJSON {"tag":"$tag","t_epoch_ms":${System.currentTimeMillis()},$bulk,$tenK}""")
    spark.stop()
  }
}
