package graft

import java.nio.file.Files
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.streaming.{IncrementalIndex, IncrementalPostings, IncrementalShingles, IngestPipeline, StateStore, WriterFence}

/** Bucket-count rescale — the planned resize a growing deployment runs
  * when buckets outgrow their rewrite unit. The invariants: the rescaled
  * root serves EXACTLY the same reads, the new count is pinned (old-count
  * writers fail loudly), growth by an integer multiple adds no exchange,
  * and a crash leaves either the old layout or the new one, never a mix. */
class RescaleSpec extends SparkSpec {
  import spark.implicits._

  private def changelog: DataFrame =
    Tables.events(spark, "/root/testdata/sf0.001").select(
      col("user_id").cast("string").as("rowkey"),
      col("event_id"),
      when(col("event_type") === "error", "delete").otherwise("put").as("op"),
      round(col("value"), 2).as("payload"))

  private def stateMap(df: DataFrame): Map[String, (Long, Double)] =
    df.collect().map(r => r.getAs[String]("rowkey") ->
      (r.getAs[Long]("event_id"), r.getAs[Double]("payload"))).toMap

  private def bucketDirs(base: String): Seq[String] =
    new java.io.File(base).listFiles().map(_.getName)
      .filter(n => n.startsWith("b=") && !n.endsWith(".old") && !n.endsWith(".tmp"))
      .toSeq.sorted

  test("row state rescale: grow ×2 and shrink — same reads, new count pinned, old count refused") {
    val ev = changelog
    val root = Files.createTempDirectory("graft_rs").toString + "/state"
    IncrementalIndex.mergeBatch(spark, ev.filter(col("event_id") < 500), root,
      numBuckets = 4)
    val before = stateMap(IncrementalIndex.readState(spark, root))
    assert(before.nonEmpty)

    StateStore.rescale(spark, root, "rowkey", 8)
    assert(StateStore.bucketCount(spark, root).contains(8))
    assert(bucketDirs(root).forall(_.stripPrefix("b=").toInt < 8))
    assert(stateMap(IncrementalIndex.readState(spark, root)) === before)
    // point gets hash with the NEW count into the right dirs
    val someKey = before.keys.head
    val got = IncrementalIndex.get(spark, root, Seq(someKey))
      .select("rowkey").collect().map(_.getString(0)).toSet
    assert(got === Set(someKey))

    // a writer still presenting the old count must fail loudly, and the
    // new count must merge cleanly
    val more = ev.filter(col("event_id") >= 500)
    intercept[java.io.IOException] {
      IncrementalIndex.mergeBatch(spark, more, root, numBuckets = 4)
    }
    IncrementalIndex.mergeBatch(spark, more, root, numBuckets = 8)
    assert(stateMap(IncrementalIndex.readState(spark, root)) ===
      stateMap(IncrementalIndex.compact(ev)))

    // shrink (non-multiple): still the same state, re-pinned at 3
    val full = stateMap(IncrementalIndex.readState(spark, root))
    StateStore.rescale(spark, root, "rowkey", 3)
    assert(StateStore.bucketCount(spark, root).contains(3))
    assert(bucketDirs(root).forall(_.stripPrefix("b=").toInt < 3))
    assert(stateMap(IncrementalIndex.readState(spark, root)) === full)
  }

  test("integer-multiple growth plans without an exchange; arbitrary counts repartition") {
    val root = Files.createTempDirectory("graft_rsx").toString + "/state"
    IncrementalIndex.mergeBatch(spark, changelog, root, numBuckets = 4)
    // the shuffle-free claim is structural: b_new mod old == b_old, so
    // every row of every old bucket lands in a new bucket derived from it
    val dirs = StateStore.liveBuckets(spark, root)
    val rows = spark.read.parquet(dirs.map(d => s"$root/$d"): _*)
      .select(col("rowkey"),
        pmod(crc32(col("rowkey")), lit(4)).cast("int").as("b4"),
        pmod(crc32(col("rowkey")), lit(8)).cast("int").as("b8"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getInt(2) % 4 === r.getInt(1)))
  }

  test("postings rescale: term/BM25/phrase reads identical, dstats re-derived, sidecar repinned") {
    val root = Files.createTempDirectory("graft_rsp").toString + "/postings"
    IncrementalPostings.mergeBatch(spark, Seq(
      DocChange("1", 0, "put", "quick merge sort pass"),
      DocChange("2", 1, "put", "merge then sort"),
      DocChange("3", 2, "put", "sort merge sort merge sort"),
      DocChange("4", 3, "put", "unrelated text entirely"),
      DocChange("2", 4, "delete", "")).toDF(), root, numBuckets = 4)

    def term = IncrementalPostings.termSearch(spark, root, Seq("merge"))
      .select("rowkey").collect().map(_.getString(0)).toSet
    def bm25 = IncrementalPostings.bm25Search(spark, root, Seq("merge", "sort"), 10)
      .select("doc_id", "score").collect()
      .map(r => (r.get(0).toString, math.rint(r.getDouble(1) * 1e9))).toSet
    def phrase = IncrementalPostings.phraseSearch(spark, root, Seq("merge", "sort"))
      .select("rowkey").collect().map(_.getString(0)).toSet

    val (t0, b0, p0) = (term, bm25, phrase)
    assert(t0.nonEmpty && b0.nonEmpty && p0.nonEmpty)

    IncrementalPostings.rescale(spark, root, 8)
    for (sub <- Seq("docs", "entries", "dstats"))
      assert(StateStore.bucketCount(spark, s"$root/$sub").contains(8), sub)
    assert(term === t0)
    assert(bm25 === b0) // scores depend on dstats (N, avgdl) — equality proves the re-derivation
    assert(phrase === p0) // positions survived the rewrite

    // the next merge at the new count keeps working end-to-end
    IncrementalPostings.mergeBatch(spark,
      Seq(DocChange("5", 5, "put", "merge sort again")).toDF(), root,
      numBuckets = 8)
    assert(phrase === p0 + "5")
  }

  test("shingle rescale: the online near-dup probe answers identically; scheme mismatch refused") {
    val root = Files.createTempDirectory("graft_rss").toString + "/shingles"
    IncrementalShingles.mergeBatch(spark, Seq(
      DocChange("10", 0, "put", "the quick brown fox jumps over the lazy dog today"),
      DocChange("11", 1, "put", "the quick brown fox jumps over the lazy dog tonight"),
      DocChange("12", 2, "put", "completely different content with no overlap at all")).toDF(),
      root, numBuckets = 4)
    def probe = IncrementalShingles.nearDuplicates(spark, root,
      "the quick brown fox jumps over the lazy dog this day", 0.5)
      .select("rowkey").collect().map(_.getString(0)).toSet
    val before = probe
    assert(before === Set("10", "11"))
    IncrementalShingles.rescale(spark, root, 8)
    assert(probe === before)
    intercept[java.io.IOException] {
      IncrementalShingles.rescale(spark, root, 16, IncrementalShingles.CharSketch)
    }
  }

  test("pipeline rescale moves all three hash-bucketed states; stream resumes at the new count") {
    val root = Files.createTempDirectory("graft_rsq").toString + "/pipe"
    def batch(rows: (String, Long, String, String)*): DataFrame =
      rows.toSeq.toDF("rowkey", "event_id", "op", "text")
    IngestPipeline.applyBatch(spark,
      batch(("1", 0, "put", "alpha beta gamma delta"),
        ("2", 1, "put", "epsilon zeta eta theta")),
      root, batchId = 0L, numBuckets = 4)
    IngestPipeline.rescale(spark, root, 8)
    for (r <- Seq(IngestPipeline.stateRoot(root),
        IngestPipeline.postingsRoot(root) + "/docs",
        IngestPipeline.shingleRoot(root) + "/docs"))
      assert(StateStore.bucketCount(spark, r).contains(8), r)
    // the pipeline resolves the count MARKER-FIRST: a stream still
    // presenting its start()-time count keeps running after the rescale,
    // its merges landing at the marker's 8 (this is what lets the
    // growth-gated in-place rescale avoid a stream restart). The
    // low-level guard is unchanged: a direct merge presenting the stale
    // count still fails loudly.
    intercept[java.io.IOException] {
      IncrementalIndex.mergeBatch(spark,
        batch(("x", 9, "put", "nu xi")),
        IngestPipeline.stateRoot(root), numBuckets = 4)
    }
    IngestPipeline.applyBatch(spark,
      batch(("3", 2, "put", "iota kappa lambda mu")), root,
      batchId = 1L, numBuckets = 4)
    val hits = IncrementalPostings.termSearch(spark,
      IngestPipeline.postingsRoot(root), Seq("kappa"))
      .select("rowkey").collect().map(_.getString(0)).toSet
    assert(hits === Set("3"))
    assert(IncrementalIndex.get(spark, IngestPipeline.stateRoot(root), Seq("1"))
      .count() === 1L)
  }

  test("a dead rescale's leftover .tmp is cleared; no-op rescale leaves the root untouched") {
    val root = Files.createTempDirectory("graft_rsl").toString + "/state"
    IncrementalIndex.mergeBatch(spark, changelog, root, numBuckets = 4)
    val before = stateMap(IncrementalIndex.readState(spark, root))
    // simulate a rescale that died mid-write: a stale whole-root tmp
    val tmp = new java.io.File(root + ".tmp")
    assert(tmp.mkdirs())
    assert(new java.io.File(tmp, "junk").createNewFile())
    StateStore.rescale(spark, root, "rowkey", 8)
    assert(stateMap(IncrementalIndex.readState(spark, root)) === before)
    assert(!tmp.exists())
    // already at the target: returns without touching the layout
    val mtimes = bucketDirs(root).map(d => new java.io.File(root, d).lastModified())
    StateStore.rescale(spark, root, "rowkey", 8)
    assert(bucketDirs(root).map(d => new java.io.File(root, d).lastModified()) === mtimes)
  }

  test("growth-gated rescale: maintain re-buckets in place under budget pressure and the stream continues") {
    val root = Files.createTempDirectory("graft_rsauto").toString + "/pipe"
    IngestPipeline.applyBatch(spark, Seq(
      DocChange("1", 0, "put", "alpha beta gamma delta epsilon"),
      DocChange("2", 1, "put", "totally different words entirely here"),
      DocChange("3", 2, "put", "red green blue yellow purple")).toDF(),
      root, 0, threshold = 0.5, numBuckets = 2)
    val sroot = IngestPipeline.stateRoot(root)
    assert(StateStore.bucketCount(spark, sroot).contains(2))
    val beforeKeys = IncrementalIndex.readState(spark, sroot)
      .collect().map(_.getAs[String]("rowkey")).toSet

    // budget off: pressure is REPORTED, nothing moves
    val idle = IngestPipeline.maintain(spark, root,
      Long.MinValue, Long.MinValue)
    assert(idle.rescaledTo.isEmpty && idle.bucketPressureBytes > 0L)

    // a budget the state already exceeds ×2 but not ×4 → target 4
    val budget = idle.bucketPressureBytes / 4 + 1
    val report = IngestPipeline.maintain(spark, root,
      Long.MinValue, Long.MinValue, bucketByteBudget = budget)
    assert(report.rescaledTo.contains(4))
    assert(StateStore.bucketCount(spark, sroot).contains(4))
    assert(StateStore.bucketCount(spark,
      IngestPipeline.postingsRoot(root) + "/entries").contains(4))
    assert(StateStore.bucketCount(spark,
      IngestPipeline.shingleRoot(root) + "/entries").contains(4))

    // the NEXT batch still presents the start()-time count (2) — the
    // marker wins, the merge lands at 4, and every read sees the union
    IngestPipeline.applyBatch(spark, Seq(
      DocChange("4", 10, "put", "unrelated fresh content nothing shared")).toDF(),
      root, 1, threshold = 0.5, numBuckets = 2)
    assert(IncrementalIndex.readState(spark, sroot)
      .collect().map(_.getAs[String]("rowkey")).toSet === beforeKeys + "4")
    val hits = IncrementalPostings.termSearch(spark,
        IngestPipeline.postingsRoot(root), Seq("unrelated"))
      .select("rowkey").collect().map(_.getString(0)).toSet
    assert(hits === Set("4"))

    // a mis-set budget cannot explode the layout: growth caps at ×8/pass
    val capped = IngestPipeline.maintain(spark, root,
      Long.MinValue, Long.MinValue, bucketByteBudget = 1L)
    assert(capped.rescaledTo.contains(32))
  }

  test("growth-gated rescale under a held fence keeps the stream's claim; an unheld one fences it out") {
    val root = Files.createTempDirectory("graft_rsfence").toString + "/pipe"
    IngestPipeline.applyBatch(spark, Seq(
      DocChange("1", 0, "put", "alpha beta gamma delta epsilon"),
      DocChange("2", 1, "put", "totally different words entirely here")).toDF(),
      root, 0, threshold = 0.5, numBuckets = 2)
    val stream = WriterFence.claim(spark, root)
    val pressure = IngestPipeline.maintain(spark, root,
      Long.MinValue, Long.MinValue).bucketPressureBytes

    // maintenance from the stream's own slot: rescale runs under the
    // stream's claim — its epoch survives
    val held = IngestPipeline.maintain(spark, root,
      Long.MinValue, Long.MinValue, bucketByteBudget = pressure / 4 + 1,
      heldFence = Some(stream))
    assert(held.rescaledTo.contains(4))
    stream.check(spark) // still the newest claim

    // an EXTERNAL maintain that rescales claims its own epoch — the
    // stream must die at its next check, not merge into the moved layout
    // (re-measure first: the rescale rewrote every file, so byte sizes
    // drifted from the pre-rescale reading)
    val p2 = IngestPipeline.maintain(spark, root,
      Long.MinValue, Long.MinValue).bucketPressureBytes
    val external = IngestPipeline.maintain(spark, root,
      Long.MinValue, Long.MinValue, bucketByteBudget = p2 / 8 + 1)
    assert(external.rescaledTo.contains(8))
    intercept[WriterFence.FencedException] { stream.check(spark) }
  }
}
