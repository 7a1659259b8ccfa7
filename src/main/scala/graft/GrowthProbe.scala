package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.Percolate
import graft.operators.Percolate.StoredQuery

/** One-factor-at-a-time growth decomposition for the two keys whose
  * N×-corpus curve the round-11/12 scale probes measured but did not
  * EXPLAIN: `q_percolate_rich` and `q_active_sweep` (round-12 verdict
  * task 3). Each leg varies exactly one factor:
  *
  * percolate_rich — factors: corpus size, registry SIZE, registry ROLE
  * mix (terms / phrases / range isolate the three matchesBool stages):
  *   - `pr_<roles>_1x` / `pr_<roles>_Nx`: same registry, corpus 1× vs N×
  *     → each stage's corpus exponent.
  *   - `pr_full_reg16_1x`: 16× the registry ids on the 1× corpus
  *     → the registry-linear term at fixed corpus.
  *
  * active_sweep — factors: corpus size, segment width (|segments| is the
  * only UNPARTITIONED window in the plan; the replicated events corpus
  * keeps its time window, so N× grows rows-per-segment, not segments):
  *   - `as_seg6h_1x` / `as_seg6h_Nx`: default width, corpus 1× vs N×.
  *   - `as_seg3m_1x`: 120× the segments at 1× corpus — if the metadata
  *     prefix-sum mattered, this leg shows it.
  *   - `as_seg48h_Nx`: 8× fewer segments at N× — if per-segment sort
  *     depth dominated, this leg shows it.
  *
  * Reuses [[ScaleProbe]]'s derived corpus (`.tmp/scale<N>/asis`); run
  * ScaleProbe first or let this derive it. Prints ONE JSON line.
  * Measurement discipline: warmup pass per leg, then min-of-3. */
object GrowthProbe {
  private def time(f: => Unit): Double = {
    f // warmup (artifact/fixture effects land here)
    val trials = Seq.fill(3) {
      val t0 = System.nanoTime()
      f
      (System.nanoTime() - t0) / 1e9
    }
    trials.min
  }

  private def noop(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  /** The rich registry split by role family — each variant isolates one
    * matchesBool stage (term join / phrase-gram expansion / range melt).
    * Built from [[Percolate.demoRichQueries]] so the probe measures the
    * SHIPPED key's own predicates. */
  private def roleVariants: Map[String, Seq[StoredQuery]] = {
    val full = Percolate.demoRichQueries
    Map(
      "full" -> full,
      "terms" -> full.flatMap(q =>
        if (q.all.nonEmpty || q.any.nonEmpty || q.none.nonEmpty)
          // none-only is not a legal query; anchor with a positive term
          Some(q.copy(phrases = Nil, range = None,
            all = if (q.all.nonEmpty || q.any.nonEmpty) q.all
                  else Seq("spark")))
        else None),
      "phrases" -> full.filter(_.phrases.nonEmpty)
        .map(q => q.copy(all = Nil, any = Nil, none = Nil, range = None)),
      "range" -> full.flatMap(q => q.range.map(r =>
        q.copy(all = Nil, any = Nil, none = Nil, phrases = Nil,
          range = Some(r)))))
  }

  private def percolateRich(spark: SparkSession, dir: String,
                            reg: Seq[StoredQuery]): Unit =
    noop(Percolate.matchesBool(
        Tables.documents(spark, dir)
          .select(col("doc_id"), col("text"), col("n_chars")),
        reg)
      .groupBy("query_id").agg(count(lit(1)).as("n_docs")))

  private def activeSweep(spark: SparkSession, dir: String,
                          segUs: Long): Unit =
    noop(graft.operators.Temporal
      .activeSweep(Tables.events(spark, dir), segUs))

  def main(args: Array[String]): Unit = {
    java.util.Locale.setDefault(java.util.Locale.ROOT)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val n = sys.env.getOrElse("SPARK_GRAFT_SCALE_FACTOR", "10").toInt
    val root = s".tmp/scale$n"
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    ScaleProbe.derive(spark, sfDir, root, n)
    val nx = s"$root/asis"

    val H = 3600000000L // 1 h in µs
    val legs = scala.collection.mutable.LinkedHashMap[String, Double]()

    // --- percolate_rich: corpus × role-mix grid ------------------------
    for ((label, reg) <- roleVariants) {
      legs(s"pr_${label}_1x") = time(percolateRich(spark, sfDir, reg))
      legs(s"pr_${label}_${n}x") = time(percolateRich(spark, nx, reg))
    }
    // registry-size leg: 16× ids (same predicates, distinct ids), 1× corpus
    val reg16 = (0 until 16).flatMap(i =>
      Percolate.demoRichQueries.map(q => q.copy(id = s"${q.id}_$i")))
    legs("pr_full_reg16_1x") = time(percolateRich(spark, sfDir, reg16))

    // --- active_sweep: corpus × segment-width grid ----------------------
    legs("as_seg6h_1x") = time(activeSweep(spark, sfDir, 6 * H))
    legs(s"as_seg6h_${n}x") = time(activeSweep(spark, nx, 6 * H))
    legs("as_seg3m_1x") = time(activeSweep(spark, sfDir, H / 20))
    legs(s"as_seg48h_${n}x") = time(activeSweep(spark, nx, 48 * H))
    // component legs at both scales: the sessionize input alone, so the
    // sweep-specific residue is separable from the shared session build
    legs("as_sessions_1x") = time(noop(
      graft.operators.Temporal.sessions(Tables.events(spark, sfDir))))
    legs(s"as_sessions_${n}x") = time(noop(
      graft.operators.Temporal.sessions(Tables.events(spark, nx))))

    val body = legs.map { case (k, v) => f""""$k":$v%.3f""" }.mkString(",")
    println(s"""{"metric":"growth_probe","factor":$n,"sf":"$sfDir",$body}""")
    spark.stop()
  }
}
