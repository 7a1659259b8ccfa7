package graft

import org.apache.spark.sql.functions._
import graft.api.Graft
import graft.functions.{GraftExtensions, GraftFunctions}

/** The user-facing facade + SQL function registration, on real fixture
  * data (sf0.001). */
class GraftApiSpec extends SparkSpec {

  private lazy val g = Graft(spark, "/root/testdata/sf0.001")

  test("search composes AND / OR / NOT over the token index") {
    val hits = g.search(all = Seq("scan"), any = Seq("merge", "sort"), none = Seq("spark"))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(hits.nonEmpty)
    // matches the fixed oracle-checked query's semantics
    val fixed = SparkEntry.queries("q_fulltext_bool")(spark, "/root/testdata/sf0.001")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(hits === fixed)
  }

  test("indexState + lookup behave like the compaction query") {
    assert(g.lookup("7").count() <= 1)
    assert(g.indexState.count() ===
      SparkEntry.queries("q_index_state")(spark, "/root/testdata/sf0.001").count())
  }

  test("hashSample is deterministic and roughly proportional") {
    val a = g.hashSample("split0", 2).count()
    val b = g.hashSample("split0", 2).count()
    assert(a === b)
    val total = g.documents.count()
    assert(a > total / 16 && a < total / 3) // 2/16 expected, generous band
    // different seed → different membership
    assert(g.hashSample("split1", 2).select("doc_id").collect().toSet !==
      g.hashSample("split0", 2).select("doc_id").collect().toSet)
  }

  test("shuffled produces a deterministic permutation") {
    val p1 = g.shuffled("seed42").select("doc_id").collect().map(_.getLong(0)).toSeq
    val p2 = g.shuffled("seed42").select("doc_id").collect().map(_.getLong(0)).toSeq
    assert(p1 === p2)
    assert(p1.sorted !== p1) // actually permuted
    assert(p1.toSet === g.documents.select("doc_id").collect().map(_.getLong(0)).toSet)
  }

  test("facets/stats/topPerGroup compose over arbitrary tables") {
    val li = Tables.lineitem(spark, "/root/testdata/sf0.001")
    assert(g.facetField(li, "l_returnflag").count() === 3)
    val st = g.stats(li, "l_linestatus", "l_quantity").collect()
    assert(st.forall(r => r.getAs[Double]("min") <= r.getAs[Double]("max")))
    val orders = Tables.orders(spark, "/root/testdata/sf0.001")
    val top = g.topPerGroup(orders, "o_custkey", "o_totalprice", "o_orderkey")
    assert(top.groupBy("o_custkey").count().filter(col("count") > 1).count() === 0)
  }

  test("bm25TopK ranks the pinned q_bm25_topk result identically") {
    val viaApi = g.bm25TopK(Seq("merge", "sort"), 20)
      .select("doc_id").collect().map(_.getLong(0)).toSeq
    val pinned = SparkEntry.queries("q_bm25_topk")(spark, "/root/testdata/sf0.001")
      .select("doc_id").collect().map(_.getLong(0)).toSeq
    assert(viaApi === pinned && viaApi.nonEmpty)
  }

  test("maintained-state facade reads agree with their corpus-scoped twins") {
    // one maintained root from the fixture corpus, then every maintained
    // facade read checked against its corpus-scoped counterpart
    import graft.streaming.IncrementalPostings
    val root = java.nio.file.Files.createTempDirectory("graft_apiM").toString + "/p"
    IncrementalPostings.mergeBatch(spark,
      g.documents.select(col("doc_id").cast("string").as("rowkey"),
        col("doc_id").as("event_id"), lit("put").as("op"), col("text")), root)
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.get(0).toString -> r.get(1)).toSeq
    assert(pairs(g.bm25Maintained(root, Seq("merge", "sort"))) ===
      pairs(g.bm25TopK(Seq("merge", "sort"), 20) // facade scores are unrounded
        .select(col("doc_id").cast("string").as("doc_id"), round(col("score"), 4).as("score"))
        .orderBy(col("score").desc, col("doc_id"))))
    assert(pairs(g.tfidfMaintained(root, Seq("merge", "sort"))).nonEmpty)
    assert(pairs(g.moreLikeThisMaintained(root, "0")).nonEmpty)
    assert(g.searchMaintained(root, Seq("merge")).count() > 0)
    // the events Get facade: same row the compaction lookup returns
    val idxRoot = java.nio.file.Files.createTempDirectory("graft_apiG").toString + "/s"
    graft.streaming.IncrementalIndex.mergeBatch(spark,
      g.events.select(col("user_id").cast("string").as("rowkey"), col("event_id"),
        when(col("event_type") === "error", "delete").otherwise("put").as("op"),
        col("event_type")), idxRoot)
    assert(g.getMaintained(idxRoot, Seq("7")).count() === g.lookup("7").count())
  }

  test("phrase matches are a subset of the AND search and adjacency-strict") {
    val ph = g.phrase(Seq("merge", "sort")).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    val and = g.search(all = Seq("merge", "sort")).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(ph.subsetOf(and))
  }

  test("spellCorrect surfaces the intended vocabulary term") {
    val cands = g.spellCorrect("mirge").select("tok")
      .collect().map(_.getString(0)).toSeq
    assert(cands.contains("merge"))
  }

  test("contamination joins eval fingerprints against the training split only") {
    val c = g.contamination().collect()
    val testIds = c.map(_.getLong(0)).toSet
    val trainIds = c.map(_.getLong(1)).toSet
    // a doc can never contaminate from its own split
    assert(testIds.intersect(trainIds).isEmpty)
  }

  test("packBatches respects per-source capacity for every pack but the overfull singleton") {
    val packs = g.packBatches(capacity = 1000)
      .groupBy("source", "pack_id")
      .agg(sum(col("n_tokens")).as("tok"), count(lit(1)).as("n"))
      .collect()
    assert(packs.nonEmpty)
    // exclusive-prefix-sum packing: a pack exceeds capacity only via its
    // final (straddling) doc, so tokens < capacity + max doc length
    val maxDoc = g.documents
      .select(max(size(split(col("text"), " ")))).head().getInt(0)
    assert(packs.forall(r => r.getAs[Long]("tok") < 1000 + maxDoc))
  }

  test("createViews exposes tables and derived views to spark.sql") {
    g.createViews()
    val viaSql = spark.sql(
      """SELECT rowkey FROM graft_index_state ORDER BY CAST(rowkey AS BIGINT)""")
      .collect().map(_.getString(0)).toSeq
    val viaApi = g.indexState.orderBy(col("rowkey").cast("long"))
      .select("rowkey").collect().map(_.getString(0)).toSeq
    assert(viaSql === viaApi && viaSql.nonEmpty)
    val p = spark.sql(
      "SELECT df FROM graft_postings WHERE tok = 'merge'").head().getLong(0)
    assert(p > 0)
  }

  test("facade streaming start wires the config's interval and delay end-to-end") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.StreamingAggregates.Ev
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val source = MemoryStream[Ev]
    val base = java.nio.file.Files.createTempDirectory("graft_apiStream").toString
    val fast = Graft(spark, "/root/testdata/sf0.001",
      GraftConfig.default.copy(commitIntervalSec = 1, firstDelaySec = 0))
    val query = fast.startIndexMaintenance(source.toDF(), s"$base/state", s"$base/ckpt")
    try {
      source.addData(Ev("a", 0L, "put", "v0"), Ev("b", 1L, "delete", ""))
      query.processAllAvailable()
      val live = graft.streaming.IncrementalIndex.readState(spark, s"$base/state")
        .collect().map(_.getAs[String]("rowkey")).toSet
      assert(live === Set("a"))
    } finally query.stop()
  }

  test("facade postings maintenance + searchMaintained round-trip") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val source = MemoryStream[DocChange]
    val base = java.nio.file.Files.createTempDirectory("graft_apiSearch").toString
    val fast = Graft(spark, "/root/testdata/sf0.001",
      GraftConfig.default.copy(commitIntervalSec = 1, firstDelaySec = 0))
    val query = fast.startPostingsMaintenance(
      source.toDF(), s"$base/postings", s"$base/ckpt")
    try {
      source.addData(
        DocChange("1", 0, "put", "spark merge sort"),
        DocChange("2", 1, "put", "spark hash join"))
      query.processAllAvailable()
      val hits = fast.searchMaintained(s"$base/postings", Seq("spark", "merge"))
        .select("rowkey").collect().map(_.getString(0)).toSet
      assert(hits === Set("1"))
    } finally query.stop()
  }

  test("facade shingle maintenance + near-dup probe + tombstone GC round-trip") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val source = MemoryStream[DocChange]
    val base = java.nio.file.Files.createTempDirectory("graft_apiShingle").toString
    val fast = Graft(spark, "/root/testdata/sf0.001",
      GraftConfig.default.copy(commitIntervalSec = 1, firstDelaySec = 0))
    val root = s"$base/shingles"
    val query = fast.startShingleMaintenance(source.toDF(), root, s"$base/ckpt")
    def probe(): Map[String, Double] =
      fast.nearDuplicatesOf(root, "alpha beta gamma delta", threshold = 0.5)
        .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    try {
      source.addData(
        DocChange("1", 0, "put", "alpha beta gamma delta"),
        DocChange("2", 1, "put", "alpha beta gamma delta zeta"),
        DocChange("3", 2, "put", "totally different text here"))
      query.processAllAvailable()
      // an arriving doc finds its exact and near duplicate from the
      // maintained state (2 of 3 shingles shared -> 0.6667)
      assert(probe() === Map("1" -> 1.0, "2" -> 0.6667))
      // a streamed delete drops the duplicate from the live probe
      source.addData(DocChange("1", 3, "delete", ""))
      query.processAllAvailable()
      assert(probe() === Map("2" -> 0.6667))
      // horizon GC drops the expired tombstone; results are unchanged
      fast.gcPostings(root, horizonEventId = 4)
      val rawOps = spark.read.parquet(graft.streaming.StateStore
          .liveBuckets(spark, s"$root/docs").map(d => s"$root/docs/$d"): _*)
        .collect().map(r => r.getAs[String]("rowkey") -> r.getAs[String]("op")).toMap
      assert(!rawOps.contains("1"))
      assert(probe() === Map("2" -> 0.6667))
    } finally query.stop()
  }

  test("facade IVF round-trip: build a persisted index, probe it") {
    val path = java.nio.file.Files.createTempDirectory("graft_apiIvf")
      .toString + "/ivf"
    g.buildIvfIndex(path, nlist = 4, iters = 2)
    val q = Tables.embeddings(spark, "/root/testdata/sf0.001")
      .filter(col("vec_id") === 1).head().getSeq[Float](1)
    val hits = g.ivfSearch(path, q, k = 5, probes = 4).collect()
    assert(hits.length === 5)
    // probing every cell must surface the query vector itself on top
    assert(hits.head.getLong(0) === 1L)
    // a freshly trained index does not trip the drift guard
    assert(!g.ivfNeedsRebuild(path))
  }

  test("facade hybrid round-trip: fused and filtered first-stage reads over two roots") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft_apiHyb").toString
    val postings = s"$base/postings"
    val ivf = s"$base/ivf"
    graft.streaming.IncrementalPostings.mergeBatch(spark, Seq(
      ("1", 1L, "put", "merge merge sort"),
      ("2", 2L, "put", "merge z z"),
      ("3", 3L, "put", "merge y y")
    ).toDF("rowkey", "event_id", "op", "text"), postings)
    graft.operators.IvfIndex.build(Seq(
      (1L, Array(1f, 0f), "a"), (2L, Array(0.9f, 0.43589f), "b"),
      (3L, Array(0f, 1f), "b")
    ).toDF("vec_id", "embedding", "grp"), ivf,
      nlist = 1, iters = 1, attrs = Seq("grp"))
    val fused = g.hybridSearch(postings, ivf, Seq("merge", "sort"),
      qv = Seq(1f, 0f), probes = 1).collect()
    assert(fused.nonEmpty && fused.head.getLong(0) === 1L,
      "doc 1 leads both legs, so it must lead the fusion")
    val filtered = g.hybridSearchFiltered(postings, ivf, Seq("merge"),
      qv = Seq(1f, 0f), predicate = col("grp") === "b", probes = 1)
      .collect().map(_.getLong(0)).toSet
    assert(filtered === Set(2L, 3L),
      s"only grp='b' docs may surface, got $filtered")
  }

  test("vec_dot_f is callable from SQL after registration") {
    GraftFunctions.register(spark)
    Tables.embeddings(spark, "/root/testdata/sf0.001").limit(5)
      .createOrReplaceTempView("emb_test")
    val rows = spark.sql(
      "SELECT round(vec_dot_f(embedding, embedding), 3) AS n FROM emb_test").collect()
    assert(rows.nonEmpty && rows.forall(_.getDouble(0) === 1.0)) // unit-norm
  }

  test("temporal + maintained-highlight facade surfaces work end to end") {
    // sessions: covers every event exactly once
    assert(g.sessions.agg(sum("n_events")).head().getLong(0) === g.events.count())
    // asofJoin: one output row per left row
    val purchases = g.events.filter(col("event_type") === "purchase")
    val clicks = g.events.filter(col("event_type") === "click")
    val aj = g.asofJoin(purchases, clicks, "user_id", "ts", "event_id", Seq("event_id"))
    assert(aj.count() === purchases.count())
    // maintained phrase + highlight against a fixture root
    import graft.streaming.IncrementalPostings
    val root = java.nio.file.Files.createTempDirectory("graft_apiT").toString + "/p"
    IncrementalPostings.mergeBatch(spark,
      g.documents.select(col("doc_id").cast("string").as("rowkey"),
        col("doc_id").as("event_id"), lit("put").as("op"), col("text")), root)
    assert(g.phraseSearchMaintained(root, Seq("merge", "sort")).count() > 0)
    val hl = g.highlightMaintained(root, "merge")
    assert(hl.count() > 0 && hl.columns.toSeq === Seq("doc_id", "positions", "n_hits"))
  }

  test("forgetPipeline takes down matching docs and logs them") {
    import graft.streaming.IngestPipeline
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft_apiF").toString + "/pipe"
    IngestPipeline.applyBatch(spark, Seq(
      ("1", 0L, "put", "alpha beta gamma delta"),
      ("2", 1L, "put", "totally different words entirely here"))
      .toDF("rowkey", "event_id", "op", "text"), root, 0, threshold = 0.5)
    assert(g.forgetPipeline(root, col("text").contains("different"), -2L) === 1L)
    assert(graft.streaming.IncrementalIndex
      .readState(spark, IngestPipeline.stateRoot(root))
      .collect().map(_.getAs[String]("rowkey")).toSet === Set("1"))
    assert(g.admissionLog(root).filter(col("verdict") === "forgotten").count() === 1L)
  }

  test("GraftExtensions injects the function via SparkSessionExtensions") {
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new GraftExtensions().apply(ext) // must not throw
    GraftFunctions.register(spark)
    intercept[Exception] { // arity mismatch is rejected at analysis
      spark.sql("SELECT vec_dot_f()").collect()
    }
  }

  test("facade bootstrapPipeline scrubs through textTransform like the stream would") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft_apiPii").toString
    val corpus = Seq(
      DocChange("1", 0, "put", "write to bob@corp.example.com today"),
      DocChange("2", 1, "put", "nothing sensitive in here at all")).toDF()
    g.bootstrapPipeline(corpus, s"$base/pipe",
      textTransform = Some(graft.operators.Pii.redact _))
    val stored = graft.streaming.IncrementalIndex
      .readState(spark, graft.streaming.IngestPipeline.stateRoot(s"$base/pipe"))
      .filter(org.apache.spark.sql.functions.col("rowkey") === "1")
      .head().getAs[String]("text")
    assert(stored === "write to <EMAIL> today", stored)
  }
}
