package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.operators.Percolate

/** Percolation (reverse search): the compiled-into-the-plan strategy and
  * the join strategy must agree exactly, and the compiled form must run
  * stateless under Structured Streaming append mode. */
class PercolateSpec extends SparkSpec {
  import spark.implicits._

  private val registry = Percolate.demoQueries

  private def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, String)] =
    df.collect().map(r =>
      (r.getAs[Long]("doc_id"), r.getAs[String]("query_id"))).toSet

  test("compiled and join strategies produce identical match pairs on fixture docs") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val compiled = pairs(Percolate.matchesCompiled(docs, registry))
    val joined = pairs(Percolate.matches(docs, registry))
    assert(compiled === joined)
    assert(compiled.nonEmpty, "fixture vocabulary should trigger some alerts")
  }

  test("conjunction semantics: all terms required, duplicates in a doc count once") {
    val docs = Seq(
      (1L, "spark join spark join"), // matches alert_spark_join
      (2L, "spark only here"),       // missing 'join'
      (3L, "join alone")             // missing 'spark'
    ).toDF("doc_id", "text")
    val expected = Set((1L, "alert_spark_join"))
    assert(pairs(Percolate.matches(docs, registry)) === expected)
    assert(pairs(Percolate.matchesCompiled(docs, registry)) === expected)
  }

  test("boolean semantics: all/any/none agree across both strategies") {
    val docs = Seq(
      (1L, "spark join fast"),   // q1: all ok, none absent → match
      (2L, "spark join slow"),   // q1: 'slow' excluded → no match
      (3L, "spark merge here"),  // q2: any(merge) present → match
      (4L, "spark alone here"),  // q2: no any term → no match
      (5L, "join merge alone")   // q2: all(spark) missing → no match
    ).toDF("doc_id", "text")
    val qs = Seq(
      Percolate.StoredQuery("q1", all = Seq("spark", "join"),
        none = Seq("slow")),
      Percolate.StoredQuery("q2", all = Seq("spark"),
        any = Seq("merge", "vector")))
    val expected = Set((1L, "q1"), (3L, "q2"))
    assert(pairs(Percolate.matchesBool(docs, qs)) === expected)
    assert(pairs(Percolate.matchesCompiledBool(docs, qs)) === expected)
    // fixture-scale agreement too, with every role populated
    val fix = Tables.documents(spark, "/root/testdata/sf0.001")
    val rich = Seq(Percolate.StoredQuery("rich", all = Seq("spark"),
      any = Seq("join", "merge"), none = Seq("slow")))
    val a = pairs(Percolate.matchesBool(fix, rich))
    assert(a === pairs(Percolate.matchesCompiledBool(fix, rich)))
    assert(a.nonEmpty)
  }

  test("compiled percolation is stateless under streaming append mode (per-batch alerting)") {
    implicit val sqlCtx = spark.sqlContext
    val source = MemoryStream[(Long, String)]
    val alerts = Percolate.matchesCompiled(
      source.toDF().toDF("doc_id", "text"), registry)
    val query = alerts.writeStream
      .format("memory").queryName("percolate_alerts")
      .outputMode("append") // no aggregation state: append works as-is
      .start()
    try {
      source.addData((10L, "slow query ahead"), (11L, "nothing to see"))
      query.processAllAvailable()
      val got = pairs(spark.table("percolate_alerts"))
      assert(got === Set((10L, "alert_slow_query")))
    } finally {
      query.stop()
      spark.sql("DROP TABLE IF EXISTS percolate_alerts")
    }
  }

  test("phrase and range predicates agree across both strategies; adjacency is positional") {
    val docs = Seq(
      (1L, "the fast merge path wins", 100L),  // phrase adjacent
      (2L, "fast path then merge", 100L),      // both words, NOT adjacent
      (3L, "a fast merge again", 500L),        // adjacent but out of range
      (4L, "merge fast reversed", 100L),       // wrong order
      (5L, "tiny spark doc", 80L),             // range + term query hits
      (6L, "spark but very long", 300L)        // term hits, range misses
    ).toDF("doc_id", "text", "n_chars")
    val qs = Seq(
      Percolate.StoredQuery("ph", all = Nil, phrases = Seq("fast merge"),
        range = Some(Percolate.RangePred("n_chars", 0, 200))),
      Percolate.StoredQuery("sp", all = Seq("spark"),
        range = Some(Percolate.RangePred("n_chars", 0, 120))))
    val expected = Set((1L, "ph"), (5L, "sp"))
    assert(pairs(Percolate.matchesBool(docs, qs)) === expected)
    assert(pairs(Percolate.matchesCompiledBool(docs, qs)) === expected)
    // multi-phrase conjunction: BOTH phrases must appear
    val two = Seq(Percolate.StoredQuery("p2", all = Nil,
      phrases = Seq("fast merge", "path wins")))
    val e2 = Set((1L, "p2"))
    assert(pairs(Percolate.matchesBool(docs, two)) === e2)
    assert(pairs(Percolate.matchesCompiledBool(docs, two)) === e2)
    // the demo rich registry agrees at fixture scale too
    val fix = Tables.documents(spark, "/root/testdata/sf0.001")
      .select(org.apache.spark.sql.functions.col("doc_id"),
        org.apache.spark.sql.functions.col("text"),
        org.apache.spark.sql.functions.col("n_chars"))
    val a = pairs(Percolate.matchesBool(fix, Percolate.demoRichQueries))
    assert(a === pairs(Percolate.matchesCompiledBool(fix, Percolate.demoRichQueries)))
    assert(a.nonEmpty)
  }

  test("phrase strategies agree across the GramScanMax dispatch and the anchor gate") {
    // Three physical strategies, one semantics: the compiled projection,
    // the small-gram-set containment SCAN (≤ GramScanMax distinct grams,
    // codegen'd GramCount pairs), and the large-gram-set EXPANSION with
    // the selectivity-gated rarest-anchor prefilter. Force each and pin
    // them to the compiled answer.
    val fix = Tables.documents(spark, "/root/testdata/sf0.001")
      .select(org.apache.spark.sql.functions.col("doc_id"),
        org.apache.spark.sql.functions.col("text"),
        org.apache.spark.sql.functions.col("n_chars"))
    // >GramScanMax distinct phrases: 30 nonsense bigrams (absent from the
    // corpus — df-0 anchors, the SELECTIVE branch: the prefilter prunes
    // every doc) + the demo phrases (common tokens) + filler real-word
    // bigrams. Total distinct grams > 32 → expansion path.
    val nonsense = (0 until 30).map(i =>
      Percolate.StoredQuery(s"gz$i", all = Nil,
        phrases = Seq(s"zqx$i wvu$i")))
    val real = Seq(
      Percolate.StoredQuery("pf", all = Nil, phrases = Seq("fast merge")),
      Percolate.StoredQuery("pq", all = Nil, phrases = Seq("slow query")),
      Percolate.StoredQuery("pm", all = Nil,
        phrases = Seq("merge sort", "query plan")))
    val big = nonsense ++ real
    // each strategy FORCED through the gramScanMax seam (the registry no
    // longer needs to exceed the dispatch constant — it is measured at
    // 512 now, far above a spec-sized fixture)
    import spark.implicits._
    def frameOf(qs: Seq[Percolate.StoredQuery]) =
      Percolate.explodeRoles(qs).toDF("query_id", "term", "role")
    val viaScan = pairs(Percolate.matchesBoolFrame(fix, frameOf(big),
      gramScanMax = Long.MaxValue))
    val viaExpansion = pairs(Percolate.matchesBoolFrame(fix, frameOf(big),
      gramScanMax = 0L))
    assert(viaScan === pairs(Percolate.matchesCompiledBool(fix, big)))
    assert(viaExpansion === viaScan)
    assert(viaScan.nonEmpty && viaScan.forall(_._2.startsWith("p")),
      "nonsense phrases must match nothing; real phrases must still match")
    // the NON-selective large registry (all-common tokens — the gate must
    // SKIP the filter and still agree): 40 copies of the demo phrases
    // under distinct ids, plus distinct common-word filler grams
    val common = Seq("fast", "merge", "slow", "query", "plan", "sort",
      "scan", "spark", "data", "table")
    val filler = (0 until 40).map { i =>
      val a = common(i % common.size); val b = common((i / 2 + 1) % common.size)
      Percolate.StoredQuery(s"cf$i", all = Nil, phrases = Seq(s"$a $b"))
    }
    val viaExpansion2 = pairs(Percolate.matchesBoolFrame(fix, frameOf(filler),
      gramScanMax = 0L))
    assert(viaExpansion2 === pairs(Percolate.matchesCompiledBool(fix, filler)))
    assert(viaExpansion2 === pairs(Percolate.matchesBool(fix, filler)))
    assert(viaExpansion2.nonEmpty)
  }

  test("registry-compile dispatch is purely physical: local ≡ frame on every role") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // every role populated (all/any/none/phrase/range/groups), PLUS a
    // duplicate registry row — the frame path counts duplicate rows in
    // its sizes aggregation, and the compiled path must count identically
    val fix = Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("doc_id"), col("text"), col("n_chars"))
    val qs = Percolate.demoRichQueries ++ Percolate.demoBoolQueries ++
      Percolate.demoGroupQueries
    val rows = Percolate.explodeRoles(qs) ++
      Seq(("need_spark_not_slow", "spark", "all")) // duplicate 'all' row
    val reg = rows.toDF("query_id", "term", "role")
    def pairsOf(df: org.apache.spark.sql.DataFrame): Set[(Long, String)] =
      df.collect().map(r => (r.getLong(0), r.getString(1))).toSet
    // the four dispatch corners: {local, frame} × {scan, expansion}
    val localScan = pairsOf(Percolate.matchesBoolFrame(fix, reg))
    val frameScan = pairsOf(Percolate.matchesBoolFrame(fix, reg,
      registryCompileMax = 0))
    val localExp = pairsOf(Percolate.matchesBoolFrame(fix, reg,
      gramScanMax = 0L))
    val frameExp = pairsOf(Percolate.matchesBoolFrame(fix, reg,
      gramScanMax = 0L, registryCompileMax = 0))
    assert(localScan === frameScan,
      s"local/frame diverge (scan): ${localScan.diff(frameScan)} | ${frameScan.diff(localScan)}")
    assert(localScan === localExp && localScan === frameExp)
    assert(localScan.nonEmpty)
    // the duplicated 'all' row inflates n_all AND hit_all equally (the
    // join fans out per registry row), so the query must still match in
    // BOTH paths — a path counting dups on one side only would drop it
    assert(localScan.exists(_._2 == "need_spark_not_slow"),
      "duplicate registry rows must inflate sizes and hits symmetrically")
  }

  test("null-emitting tokenizers see identical phrase matches from both dispatch branches") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, split, transform, when}
    // a tokenize that nulls one token (the stopword-removal-gone-wrong
    // shape: transform + when without otherwise) — the round-14 review
    // found the scan branch nulling a WHOLE doc on any null token while
    // the expansion still matched its null-free regions, so registering
    // a 33rd phrase could flip existing docs' alerts
    val tok: org.apache.spark.sql.Column => org.apache.spark.sql.Column =
      c => transform(split(c, " "), t => when(t =!= "xx", t))
    val docs = Seq(
      (1L, "fast merge xx fast merge", 100L), // nulls between two matches
      (2L, "fast xx merge", 100L),            // null splits the phrase
      (3L, "fast merge", 100L)
    ).toDF("doc_id", "text", "n_chars")
    val probe = Percolate.StoredQuery("pp", all = Nil,
      phrases = Seq("fast merge"))
    val reg = probe +: (0 until 40).map(i =>
      Percolate.StoredQuery(s"f$i", all = Nil, phrases = Seq(s"zz$i yy$i")))
    // both branches forced via the gramScanMax seam on ONE registry
    def hits(forced: Long): Set[Long] =
      Percolate.matchesBoolFrame(docs,
          Percolate.explodeRoles(reg).toDF("query_id", "term", "role"),
          tok, gramScanMax = forced)
        .filter(col("query_id") === "pp")
        .select("doc_id").collect().map(_.getLong(0)).toSet
    val s = hits(Long.MaxValue) // compiled scan
    val l = hits(0L)            // expansion
    assert(s === l, s"the dispatch must be purely physical: scan=$s expansion=$l")
    assert(s === Set(1L, 3L),
      "null-free regions match; a window overlapping the null does not")
  }

  test("role rows round-trip: explodeRoles and fromRoleRows are inverses") {
    val qs = Percolate.demoRichQueries ++ Percolate.demoBoolQueries ++
      Percolate.demoGroupQueries
    val back = Percolate.fromRoleRows(Percolate.explodeRoles(qs))
    assert(back.sortBy(_.id) === qs.sortBy(_.id))
  }

  test("AND-of-OR groups agree across both strategies; groups are conjunctive") {
    val docs = Seq(
      (1L, "quick table scan"),      // grp {quick,fast} + grp {table,row}
      (2L, "fast row lookup"),       // other members of both groups
      (3L, "quick lookup only"),     // first group only — must NOT match
      (4L, "table row no speed"),    // second group only — must NOT match
      (5L, "fast table error")       // both groups but none-term present
    ).toDF("doc_id", "text")
    val qs = Seq(Percolate.StoredQuery("g", all = Nil,
      groups = Seq(Seq("quick", "fast"), Seq("table", "row")),
      none = Seq("error")))
    val expected = Set((1L, "g"), (2L, "g"))
    assert(pairs(Percolate.matchesBool(docs, qs)) === expected)
    assert(pairs(Percolate.matchesCompiledBool(docs, qs)) === expected)
    // one term in TWO groups of one query satisfies both (distinct
    // roles): doc 1's "scan" covers both groups alone; doc 2 ("row" but
    // no scan/quick) fails the first group
    val twice = Seq(Percolate.StoredQuery("t", all = Nil,
      groups = Seq(Seq("scan", "quick"), Seq("scan", "row"))))
    val eTwice = Set((1L, "t"))
    assert(pairs(Percolate.matchesBool(docs, twice)) === eTwice)
    assert(pairs(Percolate.matchesCompiledBool(docs, twice)) === eTwice)
    // fixture-scale parity for the demo group registry
    val fix = Tables.documents(spark, "/root/testdata/sf0.001")
    val a = pairs(Percolate.matchesBool(fix, Percolate.demoGroupQueries))
    assert(a === pairs(Percolate.matchesCompiledBool(fix, Percolate.demoGroupQueries)))
    assert(a.nonEmpty)
  }

  test("phrase percolation is scheme-generic: CJK bigram adjacency, both strategies") {
    // the phrase text goes through the SAME analyzer as the docs, so a
    // space-free phrase matches by character-bigram adjacency — present
    // contiguously in doc 1 only (doc 2 has both words non-adjacent,
    // doc 3 reversed)
    val tok = graft.operators.Analyzer.Cjk.tokens(_)
    val docs = Seq(
      (1L, "\u4eca\u5929\u5317\u4eac\u6b22\u8fce\u4f60\u6765"),
      (2L, "\u5317\u4eac\u771f\u597d\u6b22\u8fce\u5149\u4e34"),
      (3L, "\u6b22\u8fce\u5317\u4eac")
    ).toDF("doc_id", "text")
    val qs = Seq(Percolate.StoredQuery("cn", all = Nil,
      phrases = Seq("\u5317\u4eac\u6b22\u8fce")))
    val expected = Set((1L, "cn"))
    assert(pairs(Percolate.matchesBool(docs, qs, tok)) === expected)
    assert(pairs(Percolate.matchesCompiledBool(docs, qs, tok)) === expected)
  }

  test("strategies agree on NULL-text docs: empty token set, not NULL propagation") {
    // a null text must read as ZERO tokens in BOTH strategies — the join
    // form's explode naturally yields no term rows, and the compiled
    // form coalesces to the empty array; NULL-propagating array_contains
    // would silently flip matches at the CompiledRegistryMax dispatch
    val docs = Seq((1L, null.asInstanceOf[String], 100L),
      (2L, "error here now", 100L),
      (3L, null.asInstanceOf[String], 500L))
      .toDF("doc_id", "text", "n_chars")
    val qs = Seq(Percolate.StoredQuery("nr", all = Nil, none = Seq("error"),
      range = Some(Percolate.RangePred("n_chars", 0, 200))))
    val expected = Set((1L, "nr"))
    assert(pairs(Percolate.matchesBool(docs, qs)) === expected)
    assert(pairs(Percolate.matchesCompiledBool(docs, qs)) === expected)
  }
}
