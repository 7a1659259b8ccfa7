package graft

import org.apache.spark.sql.SparkSession

/** Dump `.explain("formatted")` for declared queries to files — the
  * optimization rounds' plan-evidence artifact (`plans/r<N>/<key>_*.txt`).
  * Args: <outDir> <suffix> [key,key,...] — keys default to all declared
  * queries. Session config mirrors Bench so the captured plan is the plan
  * the bench times (same shuffle partitions, same nanos handling). The
  * warmup pass builds session artifacts first, so plans show the
  * warm-index read shape the bench measures, not one-time builds. */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val suffix = args(1)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val keys: Seq[String] =
      if (args.length > 2) args(2).split(",").map(_.trim).filter(_.nonEmpty).toSeq
      else SparkEntry.queries.keys.toSeq.sorted
    val unknown = keys.filterNot(SparkEntry.queries.contains)
    require(unknown.isEmpty, s"unknown keys: ${unknown.mkString(",")}")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm pass: fixtures + shared artifacts exist before plans are read
    keys.foreach { k =>
      try SparkEntry.queries(k)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      catch { case t: Throwable => System.err.println(s"warmup $k: $t") }
    }
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    keys.foreach { k =>
      try {
        val df = SparkEntry.queries(k)(spark, sfDir)
        val plan = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        java.nio.file.Files.write(
          java.nio.file.Paths.get(outDir, s"${k}_$suffix.txt"),
          plan.getBytes("UTF-8"))
        println(s"dumped $k")
      } catch { case t: Throwable => System.err.println(s"plan $k: $t") }
    }
    spark.stop()
  }
}
