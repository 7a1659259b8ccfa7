package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev harness (not shipped): the ingest bench's loop alone — sustained
  * docs/s through the full gated pipeline at two flush sizes, with the
  * gate/merge phase split. `Test/runMain graft.IngestProfile`. */
object IngestProfile {
  def main(args: Array[String]): Unit = {
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
    for (batchSize <- Seq(1000L, 5000L)) {
      val root = java.nio.file.Files.createTempDirectory("graft_ingprof")
      val pipe = root.toString + "/pipe"
      val docs = Tables.documents(spark, sfDir)
        .select(col("doc_id").cast("string").as("rowkey"),
          col("doc_id").as("event_id"), lit("put").as("op"), col("text"),
          floor(col("doc_id") / batchSize).as("b"))
        .limit(5000).localCheckpoint()
      val nDocs = docs.count()
      val nBatches = docs.agg(max(col("b"))).head().getLong(0) + 1
      val t0 = System.nanoTime()
      var gateSec = 0.0; var mergeSec = 0.0
      (0L until nBatches).foreach { b =>
        val (g, m) = graft.streaming.IngestPipeline.applyBatchTimed(spark,
          docs.filter(col("b") === b).drop("b"), pipe, b)
        gateSec += g; mergeSec += m
      }
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"INGEST batch=$batchSize docs=$nDocs sec=$sec%.1f docs_per_sec=${nDocs / sec}%.1f gate=$gateSec%.1f merge=$mergeSec%.1f")
      graft.operators.Materialize.deleteLocalDir(root.toString)
    }
    // the reference's true 10k flush: doubled corpus (word-reversed copy,
    // ids offset — Bench's ingest_10k derivation), ONE 10k batch
    locally {
      val root = java.nio.file.Files.createTempDirectory("graft_ingprof10k")
      val pipe = root.toString + "/pipe"
      val base = Tables.documents(spark, sfDir)
        .select(col("doc_id").cast("string").as("rowkey"),
          col("doc_id").as("event_id"), lit("put").as("op"), col("text"))
      val docs = base.unionAll(base.select(
          concat(col("event_id") + 1000000L).cast("string").as("rowkey"),
          (col("event_id") + 1000000L).as("event_id"), col("op"),
          concat_ws(" ", reverse(split(col("text"), " "))).as("text")))
        .localCheckpoint()
      val nDocs = docs.count()
      val t0 = System.nanoTime()
      val (g, m) = graft.streaming.IngestPipeline.applyBatchTimed(spark,
        docs, pipe, 0L)
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"INGEST batch=$nDocs docs=$nDocs sec=$sec%.1f docs_per_sec=${nDocs / sec}%.1f gate=$g%.1f merge=$m%.1f")
      graft.operators.Materialize.deleteLocalDir(root.toString)
    }
    spark.stop()
  }
}
