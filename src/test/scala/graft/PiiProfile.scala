package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.Pii

/** Interleaved A/B of the q_pii_redact formulations (round 17): the r16
  * built-in chain (3× regexp_replace + 3× regexp_count — six regex passes
  * per row) vs the fused RegexpReplaceCount form (three passes).
  * Run: sbt -batch "Test/runMain graft.PiiProfile [sfDir] [trials]" */
object PiiProfile {
  def main(args: Array[String]): Unit = {
    val dir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val trials = if (args.length > 1) args(1).toInt else 6
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def oldShape(): DataFrame = {
      val d = Pii.decorated(Tables.documents(spark, dir))
      d.select(col("doc_id") +: Pii.counts(col("text")) :+
          Pii.redact(col("text")).as("clean"): _*)
        .orderBy("doc_id")
    }
    def newShape(): DataFrame = SparkEntry.queries("q_pii_redact")(spark, dir)
    def time(f: () => DataFrame): Double = {
      val t0 = System.nanoTime()
      f().write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    time(oldShape); time(newShape): Unit
    val olds = collection.mutable.ArrayBuffer[Double]()
    val news = collection.mutable.ArrayBuffer[Double]()
    (1 to trials).foreach { _ =>
      olds += time(oldShape)
      news += time(newShape)
    }
    println(f"PII_AB old min=${olds.min}%.3f trials=${olds.map(t => f"$t%.3f").mkString(",")}")
    println(f"PII_AB new min=${news.min}%.3f trials=${news.map(t => f"$t%.3f").mkString(",")}")
    spark.stop()
  }
}
