package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Empirical scale probe — measures the headline query families at the
  * bench SF and at an N× corpus DERIVED from it, and reports per-family
  * wall-times plus the observed scaling exponent. Every 100 TB claim in
  * this repo otherwise rests on plan shape and pruning pins; this main
  * converts the central ones to measurements (SCALE.md records results).
  *
  * Derivation (testdata is read-only, so the derived corpus lands under
  * `.tmp/scale<N>/`): each big table is unioned from N re-keyed replicas.
  *  - `asis/` replicates `documents` text VERBATIM (posting lists and
  *    facet groups grow N× — the right model for search/aggregate
  *    scaling) alongside N×-rekeyed `events` (user spaces disjoint per
  *    replica: N× users, same per-user history) and `embeddings`
  *    (per-vector deterministic jitter so replicas are distinct points);
  *    dimension tables copy unchanged.
  *  - `tagged/` replicates `documents` with a per-replica token prefix:
  *    cross-replica grams never collide, so the corpus carries exactly N
  *    copies of the original's internal duplication structure. This is
  *    the honest corpus for span dedup and the near-dup gate — verbatim
  *    replication would saturate the dup fraction (every gram duplicated)
  *    and measure a workload-shape change, not scale.
  *
  * Query timing mirrors Bench: two untimed warmup passes absorb JIT and
  * one-time artifact/fixture builds (reported separately per scale from
  * the Materialize build clock), then min-of-3 timed runs through the
  * noop sink. EXCEPTION: families listed in [[ColdArtifacts]] have their
  * session artifacts dropped before EVERY run — for those, the timed
  * number deliberately INCLUDES the leg(s') build (the cold read is the
  * scaling question), and those same seconds also accrue to the build
  * clock, so don't sum the two for them. The ingest probe bootstraps the
  * tagged corpus at each scale and then times ONE gated 1000-doc flush
  * of fresh docs against each bootstrapped state — the
  * per-batch-cost-vs-state-size question that decides whether sustained
  * ingest survives a growing index.
  *
  * `SPARK_GRAFT_PROBE_FAMILIES=q_a,q_b` runs a FOCUSED re-measure: only
  * the named families (from either list), emitting a families-only JSON
  * and skipping the probe-budget/rescale/ingest blocks — for re-reading
  * specific curves after a fix without paying the full protocol.
  */
object ScaleProbe {

  private val Families = Seq(
    "q_index_state", "q_search_maintained", "q_bm25_maintained",
    "q_ann_pq_batch", "q_active_sweep", "q_facet_maintained",
    "q_neardup_probe",
    // round-10 families (round-11 verdict task 4): counter merge+read,
    // cuboid-served nested facet stats, and the large-registry
    // percolation strategy, all against the N× event/doc state
    "q_counter_maintained", "q_facet_stats_maintained", "q_percolate_rich",
    // round-11's own addition: the per-field BM25 read over the maintained
    // multi-field postings — N× posting lists and per-field sidecars
    "q_multifield_bm25_maintained",
    // round-14 (round-13 verdict task 4): the two-root hybrid read — the
    // one new plan shape with no measurement above sf0.1; legs are
    // probe-bounded (bucket-pruned BM25 + probed IVF), expected
    // flat-to-mild
    "q_hybrid_maintained", "q_hybrid_rerank_maintained",
    // round-14's own addition: the filtered IVF probe — predicate
    // evaluated inside the probed cell files (no metadata join); the
    // growth term should be cell size (corpus / nlist), not corpus
    "q_ann_filtered_maintained",
    // and the filtered two-root read (predicate over BOTH hybrid legs):
    // cold per run via ColdArtifacts — candidate-bounded attr fetch +
    // filtered probe, expected in the unfiltered twins' flat band
    "q_hybrid_filtered_maintained")

  /** Session artifacts to DROP before every run of a family, so the probe
    * times the family's real read instead of a cache hit: the hybrid
    * twins serve their ranked legs from the Materialize seam (one build
    * per session — correct for Bench's warm-read protocol, but here the
    * leg build IS the scaling question). */
  private val ColdArtifacts: Map[String, Seq[String]] = Map(
    "q_hybrid_maintained" -> Seq("hybrid_bm_leg", "hybrid_vec_leg"),
    // rerank consumes ONLY the lexical leg (its vector side is the keyed
    // vectorsForIds fetch, not a ranked leg) — invalidating the vec leg
    // here would re-build an artifact the plan never reads
    "q_hybrid_rerank_maintained" -> Seq("hybrid_bm_leg"),
    // probed cold as a family (listed above): both filtered-leg
    // artifacts drop per run so the probe times the real filtered
    // two-root read, not a leg-cache hit
    "q_hybrid_filtered_maintained" -> Seq("hybrid_bmf_leg", "hybrid_vecf_leg"))
  // tagged corpus: replica-prefixed tokens grow the VOCABULARY N× — the
  // honest corpus for reads whose cost scales with vocabulary size.
  // q_wildcard_maintained's prefix expansion is exactly that read (its
  // prefix matches nothing in the tagged token space, so the timing
  // isolates the vocabulary range-scan component — the growth term).
  private val TaggedFamilies = Seq("q_span_dedup", "q_dedup_near",
    "q_wildcard_maintained")

  private def taggedText(r: Int): org.apache.spark.sql.Column =
    concat_ws(" ", transform(split(col("text"), " "),
      w => concat(lit(s"r${r}x"), w)))

  /** Derive the N× corpus dirs (idempotent: a `_derived` marker recording
    * (sfDir, n) skips re-derivation; a MISMATCHED marker fails loudly —
    * silently reusing replicas of a different base would compare two
    * corpora and report it as a scaling exponent). */
  def derive(spark: SparkSession, sfDir: String, root: String, n: Int): Unit = {
    val marker = java.nio.file.Paths.get(root, "_derived")
    val stamp = s"$sfDir|$n"
    // tagged1: ONE tagged replica — the workload-symmetric 1× baseline for
    // the tagged families (tagging changes token shapes, so an untagged 1×
    // leg would mix that workload change into the exponent — the same
    // argument the ingest probe's baseline already follows; round-11
    // review caught the query families still using the untagged leg).
    // Derived on demand so corpora built before it existed back-fill.
    def ensureTagged1(): Unit =
      if (!java.nio.file.Files.exists(
          java.nio.file.Paths.get(s"$root/tagged1/documents.parquet"))) {
        Tables.documents(spark, sfDir)
          .withColumn("text", taggedText(0))
          .withColumn("n_chars", length(col("text")).cast("long"))
          .write.mode("overwrite").parquet(s"$root/tagged1/documents.parquet")
      }
    if (java.nio.file.Files.exists(marker)) {
      val recorded = java.nio.file.Files.readString(marker).trim
      require(recorded == stamp,
        s"derived corpus at $root was built from '$recorded', not '$stamp' — " +
          "delete the directory to re-derive")
      ensureTagged1()
      return
    }
    val asis = s"$root/asis"
    val tagged = s"$root/tagged"
    ensureTagged1()

    def replicate(base: DataFrame, rekey: (DataFrame, Int) => DataFrame): DataFrame =
      (0 until n).map(r => rekey(base, r)).reduce(_ unionByName _)

    // events: disjoint user/event id spaces per replica, shared window
    replicate(Tables.events(spark, sfDir), (d, r) =>
      d.withColumn("event_id", col("event_id") + lit(r * 100000000L))
        .withColumn("user_id", col("user_id") + lit(r * 10000000L)))
      .write.mode("overwrite").parquet(s"$asis/events.parquet")

    // documents, verbatim text (N× posting lists)
    replicate(Tables.documents(spark, sfDir), (d, r) =>
      d.withColumn("doc_id", col("doc_id") + lit(r * 10000000L)))
      .write.mode("overwrite").parquet(s"$asis/documents.parquet")

    // documents, replica-tagged text (N copies of the dup structure)
    replicate(Tables.documents(spark, sfDir), (d, r) =>
      d.withColumn("doc_id", col("doc_id") + lit(r * 10000000L))
        .withColumn("text", taggedText(r))
        .withColumn("n_chars", length(col("text")).cast("long")))
      .write.mode("overwrite").parquet(s"$tagged/documents.parquet")

    // embeddings: constant per-vector jitter keeps replicas distinct
    // points with the original's cluster structure; the residue modulus
    // is coprime to the replica stride so no two replicas of one vector
    // ever collide (period 997 in r, not the replica count)
    replicate(Tables.embeddings(spark, sfDir), (d, r) =>
      d.withColumn("vec_id", col("vec_id") + lit(r * 1000000L))
        .withColumn("embedding", expr(
          s"transform(embedding, x -> cast(x + ((vec_id % 97 + $r * 131) % 997 - 498) * 0.00002 as float))")))
      .write.mode("overwrite").parquet(s"$asis/embeddings.parquet")

    // dimension/fact tables copy unchanged (query deps outside the
    // scaled families read 1× data; only the probed tables scale)
    Seq("region", "nation", "customer", "supplier", "part", "orders",
        "lineitem").foreach { t =>
      spark.read.parquet(s"$sfDir/$t.parquet")
        .write.mode("overwrite").parquet(s"$asis/$t.parquet")
    }
    java.nio.file.Files.writeString(marker, stamp): Unit
  }

  private def runQ(spark: SparkSession, name: String, dir: String): Unit = {
    ColdArtifacts.getOrElse(name, Nil)
      .foreach(a => graft.operators.Materialize.invalidate(a, dir))
    SparkEntry.queries(name)(spark, dir)
      .write.format("noop").mode("overwrite").save()
  }

  /** Warmup twice (fixture/artifact builds land here), then min-of-3. */
  private def timeFamilies(spark: SparkSession, names: Seq[String],
                           dir: String): Map[String, Double] = {
    names.foreach(n => runQ(spark, n, dir))
    names.foreach(n => runQ(spark, n, dir))
    names.map { n =>
      System.gc()
      val trials = Seq.fill(3) {
        val t0 = System.nanoTime()
        runQ(spark, n, dir)
        (System.nanoTime() - t0) / 1e9
      }
      n -> trials.min
    }.toMap
  }

  /** Bootstrap the given corpus, then time one gated 1000-doc flush of
    * FRESH (tag-disjoint) docs against the bootstrapped state, plus the
    * gate-DECISION cost alone (exact vs candidate-budget 200) — the
    * state-probe component the budget targets, isolated from the merges
    * and the admission-log commit — for the full 1000-doc batch AND a
    * 50-doc small-flush slice (the shape where batch amortization is
    * weakest). Returns (bootstrapSec, flushSec, nDocs, gateExactSec,
    * gateBudgetSec, gate50ExactSec, gate50BudgetSec). */
  private def ingestProbe(spark: SparkSession, corpus: DataFrame,
                          fresh: DataFrame, label: String): (Double, Double, Long, Double, Double, Double, Double) = {
    // phase hygiene: drop every SQL-cache entry accumulated by the family
    // and probe phases. A stale entry can match a merge-internal cache by
    // plan fingerprint ("Data has already been cached"), and AQE's
    // TableCacheQueryStageExec materializing such a cross-phase entry has
    // NPE'd once at 30× (SparkPlan.session null — a Spark-internal race
    // the probe has no business exposing itself to); every merge below
    // caches and unpersists within itself, so nothing here needs the
    // cache warm
    spark.catalog.clearCache()
    val root = java.nio.file.Files
      .createTempDirectory(s"graft_scale_$label").toString + "/pipe"
    val docs = corpus.localCheckpoint()
    val nDocs = docs.count()
    val t0 = System.nanoTime()
    graft.streaming.IngestPipeline.bootstrap(spark, docs, root)
    val bootSec = (System.nanoTime() - t0) / 1e9
    val batch = fresh.localCheckpoint()
    batch.count()
    val t1 = System.nanoTime()
    graft.streaming.IngestPipeline.applyBatch(spark, batch, root,
      batchId = 1L)
    val flushSec = (System.nanoTime() - t1) / 1e9
    // gate-only decisions over the same batch (now stored, so each doc
    // finds at least its own copy — the self-exempt update path, which
    // costs the same probe): min-of-3 after one warm run per variant
    def gateSecFor(b: DataFrame, maxCand: Int): Double = {
      def run(): Unit = graft.streaming.IncrementalShingles
        .gateDecisions(spark, graft.streaming.IngestPipeline.shingleRoot(root),
          b, maxCandidates = maxCand)
        .write.format("noop").mode("overwrite").save()
      run()
      Seq.fill(3) {
        val g0 = System.nanoTime(); run(); (System.nanoTime() - g0) / 1e9
      }.min
    }
    val gateExact = gateSecFor(batch, 0)
    val gateBudget = gateSecFor(batch, 200)
    // the small-flush shape: 50 docs against the same state — here the
    // batch-amortization argument is weakest (per-doc probe cost is the
    // batch cost / 50), so this is the deployment where the candidate
    // budget either pays or provably doesn't
    val small = batch.limit(50).localCheckpoint()
    small.count()
    val gate50Exact = gateSecFor(small, 0)
    val gate50Budget = gateSecFor(small, 200)
    try graft.operators.Materialize.deleteLocalDir(
      new java.io.File(root).getParent)
    catch { case _: Throwable => }
    (bootSec, flushSec, nDocs, gateExact, gateBudget, gate50Exact, gate50Budget)
  }

  private def docChanges(d: DataFrame): DataFrame =
    d.select(col("doc_id").cast("string").as("rowkey"),
      col("doc_id").as("event_id"), lit("put").as("op"), col("text"))

  def main(args: Array[String]): Unit = {
    // pin the locale: the emitted JSON doubles use f"…%.3f" (see Bench)
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

    derive(spark, sfDir, root, n)

    def buildDelta[A](f: => A): (A, Double) = {
      val b0 = graft.operators.Materialize.buildSeconds
      val a = f
      (a, graft.operators.Materialize.buildSeconds - b0)
    }

    def exp0(a: Double, b: Double): Double =
      math.log(b / a) / math.log(n.toDouble)
    def familiesJson(t1: Map[String, Double], tN: Map[String, Double]): String =
      t1.toSeq.sortBy(_._1).map { case (k, v1) =>
        val vN = tN(k)
        f""""$k":{"t1":$v1%.3f,"tN":$vN%.3f,"ratio":${vN / v1}%.2f,"exponent":${exp0(v1, vN)}%.2f}"""
      }.mkString("{", ",", "}")

    // Focused ingest-only re-measure: bootstrap + flush + gate legs in a
    // session that has run NOTHING else — for separating a real ingest
    // regression from accumulated-session pressure (fixture builds, GC)
    // in the full protocol's late ingest phase.
    if (sys.env.get("SPARK_GRAFT_PROBE_INGEST_ONLY").contains("1")) {
      val base1i = Tables.documents(spark, sfDir)
      val corpus1i = docChanges(base1i.withColumn("text", taggedText(0)))
      val corpusNi = (0 until n).map(r => docChanges(
        base1i.withColumn("doc_id", col("doc_id") + lit(r * 10000000L))
          .withColumn("text", taggedText(r)))).reduce(_ unionByName _)
      val freshI = docChanges(
        base1i.limit(1000)
          .withColumn("doc_id", col("doc_id") + lit(n * 10000000L))
          .withColumn("text", taggedText(n)))
      val (b1i, f1i, n1i, ge1, gb1, g5e1, g5b1) = ingestProbe(spark, corpus1i, freshI, "i1")
      val (bNi, fNi, nNi, geN, gbN, g5eN, g5bN) = ingestProbe(spark, corpusNi, freshI, "iN")
      def e(a: Double, b: Double) = math.log(b / a) / math.log(n.toDouble)
      val json =
        f"""{"metric":"scale_probe_ingest_only","factor":$n,"sf":"$sfDir",""" +
        f""""docs1":$n1i,"docsN":$nNi,"bootstrap1":$b1i%.1f,"bootstrapN":$bNi%.1f,""" +
        f""""bootstrap_exponent":${e(b1i, bNi)}%.2f,"flush1k_vs_1x_state":$f1i%.2f,""" +
        f""""flush1k_vs_${n}x_state":$fNi%.2f,""" +
        f""""gate_exact_1x":$ge1%.2f,"gate_b200_1x":$gb1%.2f,""" +
        f""""gate_exact_${n}x":$geN%.2f,"gate_b200_${n}x":$gbN%.2f,""" +
        f""""gate50_exact_1x":$g5e1%.2f,"gate50_b200_1x":$g5b1%.2f,""" +
        f""""gate50_exact_${n}x":$g5eN%.2f,"gate50_b200_${n}x":$g5bN%.2f}"""
      println(json)
      try {
        val out = java.nio.file.Paths.get(".tmp")
        java.nio.file.Files.createDirectories(out)
        java.nio.file.Files.write(out.resolve("scale_probe_ingest_only.json"),
          (json + "\n").getBytes("UTF-8")): Unit
      } catch { case ex: Throwable => System.err.println(s"write failed: $ex") }
      spark.stop()
      return
    }

    // Focused re-measure: only the named families, families-only JSON.
    sys.env.get("SPARK_GRAFT_PROBE_FAMILIES").foreach { raw =>
      val want = raw.split(",").map(_.trim).filter(_.nonEmpty).toSet
      val unknown = want -- (Families ++ TaggedFamilies).toSet
      require(unknown.isEmpty,
        s"SPARK_GRAFT_PROBE_FAMILIES names unprobed families: ${unknown.toSeq.sorted.mkString(",")}")
      val fams = Families.filter(want)
      val tfams = TaggedFamilies.filter(want)
      val t1 = timeFamilies(spark, fams, sfDir) ++
        timeFamilies(spark, tfams, s"$root/tagged1")
      val tN = timeFamilies(spark, fams, s"$root/asis") ++
        timeFamilies(spark, tfams, s"$root/tagged")
      val json =
        s"""{"metric":"scale_probe_focused","factor":$n,"sf":"$sfDir","families":${familiesJson(t1, tN)}}"""
      println(json)
      try {
        val out = java.nio.file.Paths.get(".tmp")
        java.nio.file.Files.createDirectories(out)
        java.nio.file.Files.write(out.resolve("scale_probe_focused.json"),
          (json + "\n").getBytes("UTF-8")): Unit
      } catch { case e: Throwable => System.err.println(s"write failed: $e") }
      spark.stop()
      return
    }

    // 1× then N×, same session, fixtures keyed per (session, dir)
    val (t1q, b1) = buildDelta(timeFamilies(spark, Families, sfDir))
    // tagged families' 1× leg runs on the ONE-replica tagged corpus so
    // both legs see the same token shapes (see ensureTagged1 in derive)
    val (t1t, b1t) = buildDelta(timeFamilies(spark, TaggedFamilies, s"$root/tagged1"))
    val (tNq, bN) = buildDelta(timeFamilies(spark, Families, s"$root/asis"))
    val (tNt, bNt) = buildDelta(timeFamilies(spark, TaggedFamilies, s"$root/tagged"))

    // Per-probe shingle budget (round-11 verdict task 5): the unbudgeted
    // per-doc probe touches every entry bucket (a typical doc has more
    // distinct shingles than the root has buckets), so its latency grows
    // with state. The budget (bottom-K crc32 shingles generate candidates;
    // scores stay exact full-sketch Jaccard) bounds the entries read.
    // Timed against the SAME fixture state the q_neardup_probe family
    // uses (already warm from the family passes), with result parity
    // checked at each scale.
    def probeRoot(proot: String, text: String, budget: Int,
                  maxCand: Int = 0): (Double, Set[(String, Double)]) = {
      def run(): Unit = graft.streaming.IncrementalShingles
        .nearDuplicates(spark, proot, text, threshold = 0.5,
          maxQueryShingles = budget, maxCandidates = maxCand)
        .write.format("noop").mode("overwrite").save()
      run() // warm this variant (candidate collect + fetch plan)
      val trials = Seq.fill(3) {
        val t0 = System.nanoTime()
        run()
        (System.nanoTime() - t0) / 1e9
      }
      val rows = graft.streaming.IncrementalShingles
        .nearDuplicates(spark, proot, text, threshold = 0.5,
          maxQueryShingles = budget, maxCandidates = maxCand)
        .collect().map(r => (r.getString(0), r.getDouble(1))).toSet
      (trials.min, rows)
    }
    def probeAt(dir: String, budget: Int,
                maxCand: Int = 0): (Double, Set[(String, Double)]) = {
      val (proot, text) = graft.operators.Dedup.probeFixtureFor(spark, dir)
      probeRoot(proot, text, budget, maxCand)
    }
    val (pbE1, prE1) = probeAt(sfDir, 0)
    val (pbB1, prB1) = probeAt(sfDir, 16)
    val (pbEN, prEN) = probeAt(s"$root/asis", 0)
    val (pbBN, prBN) = probeAt(s"$root/asis", 16)
    // candidate budget (rarest-shingle-first): bounds the doc FETCH —
    // the axis the rescale experiment showed dominates at N× (verbatim
    // replication multiplies every candidate N×). CandCap=200 is the
    // production pairing with the 16-shingle budget; parity REPORTED not
    // asserted (on a replica corpus the cap can legitimately drop copies
    // of true dups — the documented recall trade).
    val CandCap = 200
    val (pbCN, prCN) = probeAt(s"$root/asis", 16, CandCap)

    // The budget's I/O bound only bites when buckets are SMALLER than the
    // query's shingle spread: at the default 16 buckets, 16 probed
    // shingles still touch ~10 of 16 buckets (measured: −8% at 10×). The
    // production pairing is budget × RESCALE — re-bucket the grown state
    // (the pipeline's growth-gated auto-rescale) so K probed shingles
    // read ≤ K of many small buckets. Measured here on a rescaled COPY of
    // the N× fixture root (the family timings keep their own root
    // untouched). Two SEPARATE parity contracts: the rescaled EXACT leg
    // must match the un-rescaled exact result (rescale is a pure
    // re-bucketing — a miss is a bug, so it's require()d below and NOT
    // emitted: the require's loud abort is the signal, a JSON field here
    // could only ever read true); the rescaled BUDGETED leg is ALLOWED
    // to differ by the documented recall trade, so its flag is recorded,
    // never asserted.
    val RescaledBuckets = 256
    val (rsE, rsB, rsC, rsB16Parity) = {
      val (prootN, textN) = graft.operators.Dedup.probeFixtureFor(spark, s"$root/asis")
      val rsRoot = java.nio.file.Files
        .createTempDirectory("graft_rsprobe").toString + "/shingles"
      val srcP = java.nio.file.Paths.get(prootN)
      val walk = java.nio.file.Files.walk(srcP)
      try walk.forEach { p =>
        val t = java.nio.file.Paths.get(rsRoot).resolve(srcP.relativize(p))
        if (java.nio.file.Files.isDirectory(p))
          java.nio.file.Files.createDirectories(t)
        else {
          java.nio.file.Files.createDirectories(t.getParent)
          java.nio.file.Files.copy(p, t): Unit
        }
      } finally walk.close()
      graft.streaming.IncrementalShingles.rescale(spark, rsRoot, RescaledBuckets)
      val (e, re) = probeRoot(rsRoot, textN, 0)
      val (b, rb) = probeRoot(rsRoot, textN, 16)
      // the full production stack: rescaled buckets + shingle budget +
      // candidate budget — what a long-lived pipeline would actually run
      val (c, _) = probeRoot(rsRoot, textN, 16, CandCap)
      require(re == prEN, s"rescale changed an EXACT probe result at " +
        s"$RescaledBuckets buckets — re-bucketing must be semantics-free " +
        s"(got ${re.size} rows vs ${prEN.size})")
      try graft.operators.Materialize.deleteLocalDir(
        new java.io.File(rsRoot).getParent)
      catch { case _: Throwable => }
      (e, b, c, rb == prEN)
    }

    // ingest: tagged replicas preserve gate structure; the fresh flush
    // batch carries its own tag so the gate scores, not drops. The 1×
    // baseline is ONE tagged replica — tagging changes token shapes, so
    // an untagged baseline would mix that workload change into the
    // exponent exactly like verbatim replication would at N×
    val base1 = Tables.documents(spark, sfDir)
    val corpus1 = docChanges(base1.withColumn("text", taggedText(0)))
    val corpusN = (0 until n).map(r => docChanges(
      base1.withColumn("doc_id", col("doc_id") + lit(r * 10000000L))
        .withColumn("text", taggedText(r)))).reduce(_ unionByName _)
    // the sentinel offset/tag are derived from n so the "fresh" docs can
    // never collide with replica key/token space at ANY factor (replicas
    // use offsets 0..(n-1)·1e7 and tag indexes 0..n-1; a fixed 9e8/99
    // sentinel collided with replicas 90/99 at factors >= 91)
    val freshBatch = docChanges(
      base1.limit(1000)
        .withColumn("doc_id", col("doc_id") + lit(n * 10000000L))
        .withColumn("text", taggedText(n)))
    val (boot1, flush1, nd1, gE1, gB1, g5E1, g5B1) = ingestProbe(spark, corpus1, freshBatch, "s1")
    val (bootN, flushN, ndN, gEN, gBN, g5EN, g5BN) = ingestProbe(spark, corpusN, freshBatch, "sN")

    def exp(a: Double, b: Double): Double = exp0(a, b)
    val all = familiesJson(t1q ++ t1t, tNq ++ tNt)
    val json =
      f"""{"metric":"scale_probe","factor":$n,"sf":"$sfDir","families":$all,""" +
      f""""probe_budget":{"k":16,"exact_1x":$pbE1%.3f,"b16_1x":$pbB1%.3f,""" +
      f""""exact_nx":$pbEN%.3f,"b16_nx":$pbBN%.3f,""" +
      f""""parity_1x":${prE1 == prB1},"parity_nx":${prEN == prBN},""" +
      f""""cand_cap":$CandCap,"b16_c${CandCap}_nx":$pbCN%.3f,""" +
      f""""c${CandCap}_parity_nx":${prCN == prEN},""" +
      f""""rescaled_buckets":$RescaledBuckets,"rescaled_exact_nx":$rsE%.3f,""" +
      f""""rescaled_b16_nx":$rsB%.3f,"rescaled_b16_c${CandCap}_nx":$rsC%.3f,""" +
      f""""rescaled_b16_parity":$rsB16Parity},""" +
      f""""build_sec":{"q1":${b1 + b1t}%.1f,"qN":${bN + bNt}%.1f,"exponent":${exp(b1 + b1t, bN + bNt)}%.2f},""" +
      f""""ingest":{"docs1":$nd1,"docsN":$ndN,"bootstrap1":$boot1%.1f,"bootstrapN":$bootN%.1f,""" +
      f""""bootstrap_exponent":${exp(boot1, bootN)}%.2f,"flush1k_vs_1x_state":$flush1%.2f,""" +
      f""""flush1k_vs_${n}x_state":$flushN%.2f,""" +
      f""""gate_exact_1x":$gE1%.2f,"gate_b200_1x":$gB1%.2f,""" +
      f""""gate_exact_${n}x":$gEN%.2f,"gate_b200_${n}x":$gBN%.2f,""" +
      f""""gate50_exact_1x":$g5E1%.2f,"gate50_b200_1x":$g5B1%.2f,""" +
      f""""gate50_exact_${n}x":$g5EN%.2f,"gate50_b200_${n}x":$g5BN%.2f}}"""
    println(json)
    try {
      val out = java.nio.file.Paths.get(".tmp")
      java.nio.file.Files.createDirectories(out)
      java.nio.file.Files.write(out.resolve("scale_probe.json"),
        (json + "\n").getBytes("UTF-8")): Unit
    } catch { case e: Throwable => System.err.println(s"write failed: $e") }
    spark.stop()
  }
}
