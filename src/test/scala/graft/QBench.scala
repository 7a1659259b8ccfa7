package graft
import org.apache.spark.sql.SparkSession

/** Dev harness: time the named queries only (same session shape and
  * min-of-3 protocol as Bench) — for iterating on one query's plan without
  * paying the full-suite warmup. `runMain graft.QBench q_a q_b …` */
object QBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def run(name: String): Unit =
      SparkEntry.queries(name)(spark, sfDir).write.format("noop").mode("overwrite").save()
    args.foreach { name =>
      run(name) // warmup
      val trials = Seq.fill(3) {
        val t0 = System.nanoTime(); run(name); (System.nanoTime() - t0) / 1e9
      }
      println(f"QBENCH $name min=${trials.min}%.3f trials=${trials.map(t => f"$t%.3f").mkString(",")}")
    }
    spark.stop()
  }
}
