package graft

/** q_repetition — the Gopher-style repetition filters (top-bigram share,
  * duplicate-bigram share, top-word share). Checked two ways: value
  * equality against an INDEPENDENT driver-side model (plain Scala string
  * ops over the fixture corpus — no shared Spark expression code), and a
  * plan pin that the signals stay pure per-row (no aggregation shuffle —
  * the property that makes the filter embarrassingly parallel at 100 TB).
  */
class RepetitionSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def round4(x: Double): Double =
    BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("q_repetition matches an independent per-document model") {
    val got = SparkEntry.queries("q_repetition")(spark, dir)
      .collect().map(r => r.getLong(0) -> r).toMap
    val docs = Tables.documents(spark, dir)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val expected = docs.filter(_._2.split(" ", -1).length >= 2)
    assert(got.keySet == expected.keySet)
    expected.foreach { case (id, text) =>
      val t = text.split(" ", -1).toSeq
      val bg = t.sliding(2).map(_.mkString(" ")).toSeq
      val topBg = bg.groupBy(identity).values.map(_.size).max
      val topW = t.groupBy(identity).values.map(_.size).max
      val r = got(id)
      assert(r.getLong(1) == bg.size.toLong, s"doc $id n_bigrams")
      assert(r.getLong(2) == topBg.toLong, s"doc $id top_bigram_n")
      assert(r.getLong(3) == bg.distinct.size.toLong, s"doc $id n_distinct_bigrams")
      assert(r.getLong(4) == topW.toLong, s"doc $id top_word_n")
      assert(r.getLong(5) == t.size.toLong, s"doc $id n_tokens")
      assert(math.abs(r.getDouble(6) - round4(topBg.toDouble / bg.size)) < 1e-9,
        s"doc $id top_bigram_frac")
      assert(math.abs(r.getDouble(7) -
        round4(1.0 - bg.distinct.size.toDouble / bg.size)) < 1e-9,
        s"doc $id dup_bigram_frac")
      assert(math.abs(r.getDouble(8) - round4(topW.toDouble / t.size)) < 1e-9,
        s"doc $id top_word_frac")
    }
  }

  test("repetition signals arm the ingest quality gate as admitIf predicates") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val root = java.nio.file.Files.createTempDirectory("graft_repgate")
      .toString + "/pipe"
    val toks = graft.operators.Analyzer.default.tokens(col("text"))
    graft.streaming.IngestPipeline.applyBatch(spark, Seq(
      DocChange("1", 0, "put", "spam spam spam spam spam spam spam spam"),
      DocChange("2", 1, "put", "a genuinely varied document with distinct words")).toDF(),
      root, 0, threshold = 0.5,
      admitIf = Some(graft.operators.TextAnalysis.topBigramFrac(toks) < 0.5))
    val verdicts = graft.streaming.IngestPipeline.admissionLog(spark, root)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(verdicts === Map("1" -> "quality_reject", "2" -> "admitted"))
  }

  test("topBigramFrac and topWordFrac are NULL below their minimum lengths") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val df = Seq("solo", "", "two words").toDF("text")
      .select(graft.operators.TextAnalysis.topBigramFrac(split(col("text"), " ")).as("b"),
        graft.operators.TextAnalysis.topWordFrac(split(col("text"), " ")).as("w"))
      .collect()
    assert(df(0).isNullAt(0) && df(0).getDouble(1) === 1.0) // "solo"
    // "" splits to [""]: one token, no bigram
    assert(df(1).isNullAt(0) && df(1).getDouble(1) === 1.0)
    assert(df(2).getDouble(0) === 1.0 && df(2).getDouble(1) === 0.5)
  }

  test("q_repetition plan has no aggregation shuffle — signals are per-row") {
    val p = SparkEntry.queries("q_repetition")(spark, dir)
      .queryExecution.executedPlan.toString
    // the only allowed exchange is the final presentation sort's range
    // partitioning; a hashpartitioning exchange would mean the per-doc
    // signal regressed to a groupBy shuffle
    assert(!p.contains("hashpartitioning"), p)
  }

  test("RunLengthStats expression matches a plain Scala model on random token arrays") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    // tokens include repeats, empties, and non-ASCII so UTF8String
    // comparison order and pair identity are both exercised
    val tokGen = Gen.oneOf("a", "b", "bb", "", "\u4e2d\u6587", "z9", "a")
    val arrGen = Gen.choose(0, 12).flatMap(n => Gen.listOfN(n, tokGen))
    val samples = (1 to 60).map(i =>
      arrGen.pureApply(Gen.Parameters.default, Seed(i.toLong)))
    val got = samples.toDF("t")
      .select(graft.functions.RunLengthStats.run_length_stats(col("t")).as("rs"))
      .select("rs.top_bigram_n", "rs.n_distinct_bigrams",
        "rs.top_word_n", "rs.n_distinct_words")
      .collect()
    samples.zip(got).foreach { case (t, r) =>
      val bg = if (t.size >= 2) t.sliding(2).toSeq else Seq.empty
      val expTopBg = if (bg.isEmpty) 0L else bg.groupBy(identity).values.map(_.size).max.toLong
      val expDisBg = bg.distinct.size.toLong
      val expTopW = if (t.isEmpty) 0L else t.groupBy(identity).values.map(_.size).max.toLong
      val expDisW = t.distinct.size.toLong
      assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ===
        ((expTopBg, expDisBg, expTopW, expDisW)), s"tokens=$t")
    }
    // a null ELEMENT nulls the result (loud, not miscounted)
    val withNull = spark.sql("SELECT array('a', CAST(NULL AS STRING), 'b') AS t")
      .select(graft.functions.RunLengthStats.run_length_stats(col("t")).as("rs"))
      .collect()
    assert(withNull(0).isNullAt(0))
  }
}
