package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scratch profiler for the q_active_sweep / q_percolate_rich constant
  * hunt (round-17 verdict #2): times each stage of the two legs in
  * isolation under the bench session shape. Dev harness, not a spec. */
object SweepProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def time(name: String)(f: => Unit): Unit = {
      f // warm
      val ts = Seq.fill(3) {
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"PROFILE $name min=${ts.min}%.3f trials=${ts.map(t => f"$t%.3f").mkString(",")}")
    }
    val segUs = 6L * 3600000000L
    val sess = graft.operators.Temporal.sharedSessions(spark, sfDir)
    val ev = Tables.events(spark, sfDir)
    time("sessions_cached")(noop(sess))
    val bounds = sess.select(col("start_us").as("ts"), lit(1L).as("d"))
      .unionByName(sess.select((col("end_us") + 1).as("ts"), lit(-1L).as("d")))
      .groupBy("ts").agg(sum("d").as("d"))
      .withColumn("seg", floor(col("ts") / segUs))
    time("bounds_build")(noop(bounds))
    val errors = ev.filter(col("event_type") === "error")
      .select(col("event_id"), col("ts"), floor(col("ts") / segUs).as("seg"))
    time("errors_scan")(noop(errors))
    time("full_sweep")(noop(
      graft.operators.Temporal.activeSweepBounds(
        graft.operators.Temporal.sharedSweepBounds(spark, sfDir), ev, segUs)))

    // percolate_rich: run once so the family artifacts exist, then time
    // the stages against the SAME cached frames the query reads
    time("perc_rich_full")(noop(
      SparkEntry.queries("q_percolate_rich")(spark, sfDir)))
    val docTerms = graft.operators.Materialize.artifact(
      spark, "percolate_doc_terms", sfDir)(sys.error("expected cache hit"))
    val docOrdered = graft.operators.Materialize.artifact(
      spark, "doc_tokens_ordered", sfDir)(sys.error("expected cache hit"))
    import spark.implicits._
    val reg = graft.operators.Percolate
      .explodeRoles(graft.operators.Percolate.demoRichQueries)
      .toDF("query_id", "term", "role")
    val termHits = docTerms
      .join(broadcast(reg.filter(col("role").isin("all", "any", "none") ||
        col("role").startsWith("grp"))), "term")
      .select("doc_id", "query_id", "role")
    time("perc_term_hits")(noop(termHits))
    val phraseKeys = reg.filter(col("role") === "phrase")
      .select(col("query_id"), split(col("term"), " ").as("gram"))
      .withColumn("k", size(col("gram")))
    val gramSet = phraseKeys.select("gram").distinct()
    val phraseHits = docOrdered.join(broadcast(gramSet),
        graft.functions.GramCount.gram_count(col("ot"), col("gram")) > 0)
      .join(broadcast(phraseKeys.select("query_id", "gram")), Seq("gram"))
      .select("doc_id", "query_id", "gram").distinct()
    time("perc_phrase_scan")(noop(phraseHits))
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text"), col("n_chars"))
    val rangeMelt = docs.select(col("doc_id"), lit("n_chars").as("field"),
      col("n_chars").cast("double").as("v"))
    time("perc_range_melt")(noop(rangeMelt))
    spark.stop()
  }
}
