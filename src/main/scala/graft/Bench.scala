package graft
import org.apache.spark.sql.SparkSession
/** Driver-run benchmark: one JSON line with per-query seconds at
  * SPARK_GRAFT_SF_DIR. A first untimed pass absorbs one-time JVM/codegen
  * warmup so timings measure the queries, not JIT compilation (session
  * startup is likewise excluded per BASELINE.md).
  *
  * The warmup pass also builds the session's materialized index artifacts
  * (shingle index, postings, term vectors — `operators/Materialize`), so
  * timed numbers are WARM-INDEX query latency, mirroring the reference:
  * Solr answers every query from a prebuilt index and its build cost is
  * likewise outside query latency. The one-time build cost is measured
  * and reported separately as `artifact_build_sec` so it stays visible
  * and per-query numbers stay comparable round-over-round. */
object Bench {
  def main(args: Array[String]): Unit = {
    // every emitted double goes through a locale-sensitive f"…%.3f"
    // interpolator; under a comma-decimal default locale the JSON line
    // would be unparseable — pin the process locale once instead of
    // wrapping each of the ~15 format sites (round-12 ADVICE)
    java.util.Locale.setDefault(java.util.Locale.ROOT)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // SPARK_GRAFT_BENCH_ONLY=q_a,q_b: time just those keys (focused
    // re-measure of a suspected drift — Verify's SPARK_GRAFT_ONLY twin);
    // SPARK_GRAFT_BENCH_TRIALS overrides the min-of-N trial count.
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val trialsN = sys.env.getOrElse("SPARK_GRAFT_BENCH_TRIALS", "3").toInt
    // fail fast, not mid-bench: 0/negative trials made Seq.fill empty and
    // trials.min throw after the (long) warmup; a typo'd BENCH_ONLY key
    // silently produced an empty bench that read as a clean run
    require(trialsN > 0, s"SPARK_GRAFT_BENCH_TRIALS must be >= 1, got $trialsN")
    only.foreach { keys =>
      val unknown = keys -- SparkEntry.queries.keySet
      require(unknown.isEmpty,
        s"SPARK_GRAFT_BENCH_ONLY names unknown keys: ${unknown.toSeq.sorted.mkString(",")}")
    }
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // The noop sink executes the complete plan (all columns, sorts
    // included) without materializing rows on the driver.
    def run(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Unit =
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
    // Warmup: execute every query once, untimed (artifact builds land here;
    // their cost is captured by the build clock and reported below).
    val benchKeys = SparkEntry.queries.filter { case (k, _) =>
      only.forall(_.contains(k)) }
    // Cold-start leg (round-17 verdict #7 — honesty guard for the
    // Materialize seam): ONE designated key per artifact family, timed on
    // its FIRST execution in this fresh session, BEFORE any artifact or
    // fixture exists — the build+query latency a first query pays, kept
    // in-record beside the warm numbers. Runs before the warmup passes,
    // so the timed region of the 150 keys is untouched (these builds
    // would have happened in warmup anyway; the clock just reads them).
    // Order-dependent by design: a family's shared sub-artifact (e.g.
    // the shingle index under minhash_pairs) attributes to whichever
    // designated key runs first — the list is ordered so each key's time
    // covers its OWN family's artifacts.
    val coldKeys = Seq(
      "q_bm25_topk",       // postings_default + doc_lens
      "q_dedup_near",      // shingle_index + near_dup_pairs
      "q_dedup_minhash",   // minhash_pairs (over the now-built shingles)
      "q_dedup_simhash",   // simhash_fp + doc_fingerprints
      "q_dedup_cjk",       // cjk_sketch_index + cjk_near_dup_pairs
      "q_active_sweep",    // event_sessions + sweep_bounds/steps/offsets
      "q_percolate_rich",  // percolate_doc_terms + doc_tokens_ordered
      "q_hybrid_search",   // hybrid_*_leg + hybrid_*_scored
      "q_bigram_pmi",      // bigram_counts (+ postings stats, already built)
      "q_bm25_maintained", // maintained_postings_fixture
      "q_ann_maintained")  // ann_maintained_fixture
    val coldJson = if (only.nonEmpty) "" else {
      val entries = coldKeys.flatMap { k =>
        SparkEntry.queries.get(k).map { fn =>
          val t0 = System.nanoTime()
          val okCold = try { run(fn); true } catch { case _: Throwable => false }
          val sec = if (okCold) (System.nanoTime() - t0) / 1e9 else -1.0
          f""""$k":$sec%.3f"""
        }
      }
      entries.mkString(""","cold":{""", ",", "}")
    }
    benchKeys.foreach { case (_, fn) =>
      try run(fn) catch { case _: Throwable => }
    }
    // Second warmup pass: the probe/maintained fixtures built during the
    // first pass REGISTER their corpus scope, which invalidates every
    // corpus-derived artifact built earlier in the pass (cache coherence —
    // a registered scope's artifacts must be fed from the maintained
    // state). Without this pass the first timed trial of an affected key
    // pays a rebuild; min-of-3 hides it from the reported number, but the
    // build clock advancing during timing (and double-counted builds in
    // artifact_builds, e.g. round 8's 12× simhash_fp) made warmup churn
    // read as a query regression. All fixtures exist after pass one, so
    // pass two triggers no further invalidation.
    benchKeys.foreach { case (_, fn) =>
      try run(fn) catch { case _: Throwable => }
    }
    val warmupBuildSec = graft.operators.Materialize.buildSeconds
    // Timed: min of 3 trials per query — the standard way to report the
    // query's cost rather than transient GC/load noise on a shared box.
    def timeOnce(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      val ok = try { run(fn); true } catch { case _: Throwable => false }
      // a failed query must not masquerade as a fast success
      if (ok) (System.nanoTime() - t0) / 1e9 else -1.0
    }
    // Box-I/O reading around each ingest leg (and, below, each slow
    // query's trial loop): /proc/diskstats deltas (sectors read/written +
    // device-busy ms, summed over whole physical devices) and the 1-min
    // loadavg — so a low docs/s record carries its own evidence of
    // whether the BOX was busy, instead of that being inferred after the
    // fact from unrelated artifact-build times. Zero-cost reads of proc
    // metadata; absent files (non-Linux) degrade to zeros rather than
    // failing the bench.
    def diskStats(): (Long, Long, Long) = try {
      val dev = "^(sd[a-z]+|vd[a-z]+|nvme\\d+n\\d+|xvd[a-z]+)$".r
      var (sr, sw, busy) = (0L, 0L, 0L)
      java.nio.file.Files.readAllLines(
        java.nio.file.Paths.get("/proc/diskstats")).forEach { line =>
        val f = line.trim.split("\\s+")
        if (f.length >= 13 && dev.findFirstIn(f(2)).isDefined) {
          sr += f(5).toLong; sw += f(9).toLong; busy += f(12).toLong
        }
      }
      (sr, sw, busy)
    } catch { case _: Throwable => (0L, 0L, 0L) }
    def loadavg1m(): Double = try {
      java.nio.file.Files.readAllLines(
        java.nio.file.Paths.get("/proc/loadavg")).get(0).split(" ")(0).toDouble
    } catch { case _: Throwable => -1.0 }
    // CPU-side counters (round-15 verdict: the io block exonerated the
    // DISK for the slow driver ingest legs — busy_frac 0.003 while the
    // merge ran 14× its quiet cost — so the next anomalous record must
    // carry the CPU-side evidence too): /proc/stat aggregate jiffies
    // split user/system/idle/iowait/steal, and the JVM's own GC time.
    // steal names a noisy-neighbor hypervisor; iowait names cold reads;
    // a user gap with idle high names throttling outside this process;
    // gc_frac names the JVM itself. Zeros on non-Linux, like diskStats.
    def cpuStat(): (Long, Long, Long, Long, Long) = try {
      val f = java.nio.file.Files.readAllLines(
        java.nio.file.Paths.get("/proc/stat")).get(0).trim.split("\\s+")
      // cpu user nice system idle iowait irq softirq steal — irq+softirq
      // FOLD INTO sys: omitting them from the jiffy total silently
      // redistributed kernel-interrupt time into the other fractions,
      // in exactly the kernel-storm mode this block exists to adjudicate
      // (round-16 ADVICE)
      (f(1).toLong + f(2).toLong,
        f(3).toLong + (if (f.length > 6) f(6).toLong else 0L) +
          (if (f.length > 7) f(7).toLong else 0L),
        f(4).toLong, f(5).toLong,
        if (f.length > 8) f(8).toLong else 0L)
    } catch { case _: Throwable => (0L, 0L, 0L, 0L, 0L) }
    def gcMillis(): Long = try {
      var t = 0L
      java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
        .forEach(b => t += math.max(0L, b.getCollectionTime))
      t
    } catch { case _: Throwable => 0L }
    // Per-key detail: ALL trial times plus the key's wall-clock start —
    // min-of-N absorbs transient noise but also HIDES it; when the
    // round artifact shows one key over the bar while every quiet
    // re-measure is fine (r11's q_fuzzy_maintained: driver 2.854 s vs
    // three quiet runs at 0.65–0.94 s), the per-trial record is what
    // distinguishes "this plan is slow" (all rounds' trials slow) from
    // "the box was busy for these N seconds" (one contiguous trial
    // window inflated, neighbors' trials in the same window inflated
    // too). t0_epoch_ms timestamps make the window checkable against
    // box-level evidence.
    case class KeyRun(min: Double, trials: Seq[Double], t0EpochMs: Long,
                      cpuJson: String)
    // Per-query rows over this min SELF-ADJUDICATE (round-16 verdict #1:
    // the first driver-record breach of the 2 s hard bar had to be
    // exonerated by cross-commit inference because per-query rows carried
    // no CPU evidence): keys whose min lands above the threshold emit a
    // `cpu` sub-block — the same /proc/stat + GC deltas the ingest legs
    // carry, measured over the key's OWN trial window — so the next
    // breach record names steal/sys/gc in-record.
    val CpuDetailMinSec = 1.2
    val detail = benchKeys.map { case (name, fn) =>
      // Collect predecessors' garbage before timing: otherwise a query's
      // trials pay GC debt accrued by whichever queries happened to run
      // before it in map order, which is noise, not the query's cost.
      System.gc()
      val load0 = loadavg1m()
      val (us0, sy0, id0, io0, st0) = cpuStat()
      val gc0 = gcMillis()
      val t0 = System.currentTimeMillis()
      val trials = Seq.fill(trialsN)(timeOnce(fn))
      val wallSec = math.max(1e-3, (System.currentTimeMillis() - t0) / 1e3)
      val (us1, sy1, id1, io1, st1) = cpuStat()
      val gc1 = gcMillis()
      val min = if (trials.exists(_ < 0)) -1.0 else trials.min
      val cpuJson = if (min <= CpuDetailMinSec) "" else {
        val jifTot = math.max(1L, (us1 - us0) + (sy1 - sy0) + (id1 - id0) +
          (io1 - io0) + (st1 - st0))
        f""","cpu":{"wall_sec":$wallSec%.3f,"loadavg_1m":$load0%.2f,"user_frac":${(us1 - us0).toDouble / jifTot}%.3f,"sys_frac":${(sy1 - sy0).toDouble / jifTot}%.3f,"idle_frac":${(id1 - id0).toDouble / jifTot}%.3f,"iowait_frac":${(io1 - io0).toDouble / jifTot}%.3f,"steal_frac":${(st1 - st0).toDouble / jifTot}%.3f,"gc_ms":${gc1 - gc0},"gc_frac":${(gc1 - gc0) / (wallSec * 1000)}%.3f}"""
      }
      name -> KeyRun(min, trials, t0, cpuJson)
    }
    val results = detail.map { case (k, r) => k -> r.min }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val trialsJson = detail.map { case (k, r) =>
      s"\"" + k + "\":{\"t0_epoch_ms\":" + r.t0EpochMs + ",\"trials\":" +
        r.trials.map(t => f"$t%.3f").mkString("[", ",", "]") + r.cpuJson + "}"
    }.mkString("{", ",", "}")
    val ok = results.filter(_._2 >= 0)
    val nFailed = results.size - ok.size
    // total/worst over SUCCESSFUL keys only: folding -1 sentinels in
    // shrank the total and could never surface as worst_key, so a
    // tail-only capture read a failing run as clean
    val total = if (ok.nonEmpty) ok.values.sum else 0.0
    // Build attribution is read AFTER the timed loop: a build whose warmup
    // run failed (exceptions are swallowed above) re-runs inside a timed
    // trial — it must still appear in artifact_build_sec, and the clock
    // advancing during timing is flagged so the affected query's number is
    // read with that in mind.
    val buildSec = graft.operators.Materialize.buildSeconds
    if (buildSec > warmupBuildSec + 0.01)
      System.err.println(f"WARNING: artifact builds ran during timed trials " +
        f"(${buildSec - warmupBuildSec}%.2f s after a $warmupBuildSec%.2f s warmup) — " +
        "some query timing includes a one-time build")
    val buildMap = graft.operators.Materialize.buildBreakdown.toSeq.sortBy(-_._2)
      .map { case (k, v) => s"\"" + k + "\":" + v }.mkString("{", ",", "}")
    // Gated-ingest throughput — the reference's actual workload (its only
    // published numbers are ingest-side: "several million rows/day"
    // through 10k-doc flush batches, README.md:5 + application.
    // properties:14). The documents table streams through the FULL gated
    // write path (quality-free text dedup gate, admission log, row state
    // + postings + shingle merges) in micro-batches against a growing
    // maintained state, and the sustained docs/sec is reported beside the
    // query numbers. Measured after the timed query loop so ingest GC
    // debt never pollutes query latency. 4M docs/day ≈ 46 docs/s is the
    // reference's envelope; this number is the engine's answer to it.
    // Two flush sizes: 1000-doc micro-batches (5 batches at sf0.1 — the
    // growing-state path) and ONE bulk batch of the whole table (the
    // reference's add_batchCount=10000 envelope, capped by the table's row
    // count) — the pair shows how the per-batch fixed cost (state probe +
    // touched-bucket listings + checkpoint-shaped overheads) amortizes
    // with flush size, which is the reference's own tuning knob.
    def ingestAt(label: String, batchSizeOf: Long => Long,
                 withBootstrap: Boolean, doubled: Boolean = false,
                 fullFeatures: Boolean = false): String = try {
      import org.apache.spark.sql.functions._
      val root = java.nio.file.Files.createTempDirectory(s"graft_benchIngest_$label")
      val pipe = root.toString + "/pipe"
      // one count serves both the batch-size function and nDocs — the
      // checkpoint materializes the frame either way. `lang` rides as the
      // facet column the full-featured run's rollup groups on.
      val base = Tables.documents(spark, sfDir)
        .select(col("doc_id").cast("string").as("rowkey"),
          col("doc_id").as("event_id"), lit("put").as("op"), col("text"),
          col("lang"))
      // `doubled`: reach the reference's FULL 10k flush size even where the
      // table has fewer rows, by unioning a word-REVERSED copy (ids offset
      // past the table). Reversal is a bijection on word 3-grams, so the
      // derived half carries the SAME internal near-dup structure as the
      // original (the gate does its real pair-scoring work, roughly twice
      // over) while no derived doc is a near-dup of its source (reversed
      // shingles ≠ forward shingles) — docs/s stays an honest gated number,
      // not a measurement of the drop path.
      val corpus = if (!doubled) base else base.unionAll(
        base.select(
          concat(col("event_id") + 1000000L).cast("string").as("rowkey"),
          (col("event_id") + 1000000L).as("event_id"), col("op"),
          concat_ws(" ", reverse(split(col("text"), " "))).as("text"),
          col("lang")))
      val docsRaw = corpus
        .localCheckpoint() // decouple the source read from the timed loop
      val nDocs = docsRaw.count()
      val batchSize = batchSizeOf(nDocs)
      // batches must be DENSE in arrival order, not floor(event_id/size):
      // the doubled corpus offsets half its ids by 1e6, and id-derived
      // batch numbers would split 10k docs into 2 real + 99 EMPTY batches
      // — each empty one still paying the full per-batch fixed cost, so
      // the "10k flush" number would measure 101 flushes, not 1
      val docs = docsRaw.withColumn("rn",
          org.apache.spark.sql.functions.row_number().over(
            org.apache.spark.sql.expressions.Window.orderBy("event_id")) - 1)
        .withColumn("b", floor(col("rn") / batchSize)).drop("rn")
        .localCheckpoint() // the window must not re-run per filtered batch
      val nBatches = docs.agg(max(col("b"))).head().getLong(0) + 1
      // initial load first: the same corpus through the one-pass bootstrap
      // (gate-free — the curated-corpus case) into its own root
      val bootJson = if (!withBootstrap) "" else {
        val tb = System.nanoTime()
        graft.streaming.IngestPipeline.bootstrap(spark, docs.drop("b"),
          root.toString + "/boot")
        val bootSec = (System.nanoTime() - tb) / 1e9
        f""","bootstrap_sec":$bootSec%.3f,"bootstrap_docs_per_sec":${nDocs / bootSec}%.1f"""
      }
      // the full-featured run measures the WHOLE maintained surface: a
      // language-facet rollup and a standing-query registry ride every
      // batch, so docs/s includes the aggregate sidecar and alerting cost
      if (fullFeatures) {
        graft.streaming.IngestPipeline.enableRollup(spark, pipe, Seq("lang"))
        graft.streaming.IngestPipeline.registerQueries(spark, pipe,
          graft.operators.Percolate.demoQueries)
      }
      val load0 = loadavg1m()
      val (sr0, sw0, busy0) = diskStats()
      val (us0, sy0, id0, io0, st0) = cpuStat()
      val gc0 = gcMillis()
      val t0 = System.nanoTime()
      // phase split: gate (admission decision + durable log commit) vs the
      // four state merges — WHICH half of the per-batch fixed cost binds
      // is the question the dual-flush-size comparison raises. The gate
      // half further splits into its sub-phases (sketch / probe / score /
      // log_commit — round-16 verdict #4: the gate became the dominant
      // ingest half with no instrumentation of its own), summed across
      // the leg's batches.
      var gateSec = 0.0; var mergeSec = 0.0
      val gatePhases = scala.collection.mutable.LinkedHashMap[String, Double]()
      (0L until nBatches).foreach { b =>
        val (g, m, ph) = graft.streaming.IngestPipeline.applyBatchPhased(spark,
          docs.filter(col("b") === b).drop("b"), pipe, b)
        gateSec += g; mergeSec += m
        ph.foreach { case (name, sec) =>
          gatePhases(name) = gatePhases.getOrElse(name, 0.0) + sec }
      }
      val gatePhaseJson = gatePhases.map { case (name, sec) =>
        f""""$name":$sec%.3f""" }.mkString(""","gate_phases":{""", ",", "}")
      val sec = (System.nanoTime() - t0) / 1e9
      val (sr1, sw1, busy1) = diskStats()
      val (us1, sy1, id1, io1, st1) = cpuStat()
      val gc1 = gcMillis()
      // device busy fraction over the leg's own wall-clock: ~0 on an idle
      // box whose writes fit the page cache; near (or over, multi-device)
      // 1.0 exactly when "the box was loaded" — the r14 adjudication,
      // now measured in-record. The cpu sub-block adjudicates the
      // disk-exonerated case: fractions are of the BOX's total jiffies
      // over the leg (so user+sys+idle+iowait+steal ≈ 1), gc_frac is of
      // the leg's wall-clock.
      val jifTot = math.max(1L,
        (us1 - us0) + (sy1 - sy0) + (id1 - id0) + (io1 - io0) + (st1 - st0))
      val ioJson = f""","io":{"sectors_read":${sr1 - sr0},"sectors_written":${sw1 - sw0},"busy_ms":${busy1 - busy0},"busy_frac":${(busy1 - busy0) / (sec * 1000)}%.3f,"loadavg_1m":$load0%.2f,"cpu":{"user_frac":${(us1 - us0).toDouble / jifTot}%.3f,"sys_frac":${(sy1 - sy0).toDouble / jifTot}%.3f,"idle_frac":${(id1 - id0).toDouble / jifTot}%.3f,"iowait_frac":${(io1 - io0).toDouble / jifTot}%.3f,"steal_frac":${(st1 - st0).toDouble / jifTot}%.3f,"gc_ms":${gc1 - gc0},"gc_frac":${(gc1 - gc0) / (sec * 1000)}%.3f}}"""
      // what the gate actually did — docs/sec over a gate that drops
      // nothing would be a hollow number
      val verdicts = graft.streaming.IngestPipeline.admissionLog(spark, pipe)
        .groupBy("verdict").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      val admitted = verdicts.getOrElse("admitted", 0L)
      val dropped = verdicts.values.sum - admitted
      val featJson = if (!fullFeatures) "" else {
        val groups = graft.streaming.IngestPipeline.readRollup(spark, pipe).count()
        val alerts = graft.streaming.IngestPipeline.alerts(spark, pipe).count()
        s""","rollup_groups":$groups,"alerts":$alerts"""
      }
      try graft.operators.Materialize.deleteLocalDir(root.toString)
      catch { case _: Throwable => }
      f""","$label":{"docs":$nDocs,"batches":$nBatches,"batch_docs":$batchSize,"sec":$sec%.3f,"docs_per_sec":${nDocs / sec}%.1f,"gate_sec":$gateSec%.3f$gatePhaseJson,"merge_sec":$mergeSec%.3f,"admitted":$admitted,"dropped":$dropped$ioJson$featJson$bootJson}"""
    } catch { case e: Throwable =>
      System.err.println(s"$label bench failed: $e"); ""
    }
    // ANN quality: recall@10 vs brute force over a clean IVF-PQ index of
    // the embeddings table — the PQ keys are oracle-exact on their rerank
    // arithmetic, but only this measures how often the probed/PQ
    // shortlist MISSES true neighbors (the recall/latency tradeoff the
    // probes/shortlist defaults buy; SCALE.md carries the analysis).
    val annJson = if (only.nonEmpty) "" else try {
      import org.apache.spark.sql.functions._
      val aRoot = java.nio.file.Files.createTempDirectory("graft_benchAnn")
      val root = aRoot.toString + "/ivf"
      val e = Tables.embeddings(spark, sfDir)
      graft.operators.IvfIndex.build(e.select("vec_id", "embedding"), root,
        nlist = 16, iters = 5, pq = Some(graft.operators.IvfIndex.PqSpec()))
      val qs = e.filter(col("vec_id") % 61 === 0).limit(32)
        .select(col("vec_id").as("qid"), col("embedding").as("qv"))
        .localCheckpoint()
      val truth = AnnEval.top(graft.operators.IvfIndex.searchBatch(spark, root, qs,
        k = 10, probes = 16)) // probes = nlist ⇒ exact over the index
      val settings = Seq[(String, () => org.apache.spark.sql.DataFrame)](
        "ivf_p1" -> (() => graft.operators.IvfIndex.searchBatch(spark, root, qs, 10, probes = 1)),
        "ivf_p2" -> (() => graft.operators.IvfIndex.searchBatch(spark, root, qs, 10, probes = 2)),
        "ivf_p4" -> (() => graft.operators.IvfIndex.searchBatch(spark, root, qs, 10, probes = 4)),
        "pq_p2_sl100" -> (() => graft.operators.IvfIndex.searchBatchPq(spark, root, qs, 10, probes = 2)),
        "pq_p4_sl100" -> (() => graft.operators.IvfIndex.searchBatchPq(spark, root, qs, 10, probes = 4)),
        "pq_p4_sl30" -> (() => graft.operators.IvfIndex.searchBatchPq(spark, root, qs, 10, probes = 4, shortlist = 30)))
      val entries = settings.map { case (name, f) =>
        AnnEval.entryJson(name, truth, f)
      }.mkString(",")
      // clustered-corpus recall (round-15 verdict #6): the sf fixture is
      // near-uniform, so its recall numbers (kept above, for drift) say
      // little about IVF quality — real embedding corpora cluster, and a
      // query's true neighbors live in its own cluster. This leg rides
      // FilteredRecallProbe's deterministic mixture-of-Gaussians corpus
      // so BOTH drift signals (uniform floor, clustered quality) are in
      // every bench record, not in a probe run from rounds ago.
      // Dynamic range (round-16 verdict #3, REDONE round 17): nlist 64 >
      // 48 clusters alone did NOT move the needle — assignment ranks by
      // DOT PRODUCT, and with tight blobs (noise ±0.25) on huge centers
      // (±5) two centroids landing in one blob differ by a small delta d,
      // so every member's assignment margin center·Δd ± noise·Δd is
      // dominated by the CONSTANT center term (~35×): the whole blob goes
      // to one centroid, the loser starves, and p1 reads 1.000 at ANY
      // nlist (measured: live_cells=48 of 64, p1=1.000 —
      // ClusteredCalProbe). Mid-scale needs within-blob spread comparable
      // to the center scale. Calibrated sweep (ClusteredCalProbe, round
      // 17): 16 clusters / noise ±2.5 / nlist 64 → all 64 cells live,
      // p1 = 0.500 (the drift needle, dead mid-scale), p2 = 0.825,
      // p4 = 1.000 (the quality pin ≥ 0.95). Deterministic hash corpus —
      // the numbers are reproducible, not seeded.
      val ClusteredNlist = 64
      val ClusteredK = 16
      val cRoot = aRoot.toString + "/clustered"
      val cCorpus = spark.range(20000L).select(
          col("id").as("vec_id"),
          expr(
            s"""transform(sequence(0, 63, 1), j -> cast(
              |  (pmod(hash(id % $ClusteredK, j, 'center'), 10000) / 10000.0) * 10.0 - 5.0 +
              |  (pmod(hash(id, j, 'noise'), 1000) / 1000.0) * 5.0 - 2.5
              | as float))""".stripMargin).as("embedding"))
        .localCheckpoint()
      graft.operators.IvfIndex.build(cCorpus, cRoot, nlist = ClusteredNlist, iters = 5)
      val cqs = cCorpus.filter(col("vec_id") % 1250 === 0)
        .select(col("vec_id").as("qid"), col("embedding").as("qv"))
        .localCheckpoint()
      val cTruth = AnnEval.top(graft.operators.IvfIndex.searchBatch(
        spark, cRoot, cqs, k = 10, probes = ClusteredNlist)) // probes = nlist ⇒ exact
      val cEntries = Seq(1, 2, 4).map { p =>
        AnnEval.entryJson(s"p$p", cTruth,
          () => graft.operators.IvfIndex.searchBatch(spark, cRoot, cqs, 10, probes = p))
      }.mkString(",")
      try graft.operators.Materialize.deleteLocalDir(aRoot.toString)
      catch { case _: Throwable => }
      s""","ann_recall":{"k":10,"n_queries":${truth.size},"nlist":16,$entries,""" +
        s""""clustered":{"n_vec":20000,"clusters":$ClusteredK,"dim":64,"nlist":$ClusteredNlist,"n_queries":${cTruth.size},$cEntries}}"""
    } catch { case t: Throwable =>
      System.err.println(s"ann recall bench failed: $t"); ""
    }
    val ingestJson = if (only.nonEmpty) "" else
      ingestAt("ingest", _ => 1000L, withBootstrap = true,
        fullFeatures = true) +
      ingestAt("ingest_bulk", total => math.min(total, 10000L),
        withBootstrap = false) +
      // the reference's add_batchCount=10000 at its ACTUAL flush size: one
      // 10k-doc batch over the doubled corpus (see `doubled` above)
      ingestAt("ingest_10k", total => math.min(total, 10000L),
        withBootstrap = false, doubled = true)
    val json =
      s"""{"metric":"total","value":$total,"unit":"sec","n_failed":$nFailed,"queries":$qs,"trial_detail":$trialsJson,"sf":"$sfDir","artifact_build_sec":$buildSec,"artifact_builds":$buildMap$coldJson$annJson$ingestJson}"""
    println(json)
    // Stdout of driver runs has been truncated before (BENCH_r06 lost 16
    // per-query numbers to a clipped capture) — persist the full line too.
    try {
      val out = java.nio.file.Paths.get(".tmp")
      java.nio.file.Files.createDirectories(out)
      java.nio.file.Files.write(out.resolve("bench.json"),
        (json + "\n").getBytes("UTF-8")): Unit
    } catch { case e: Throwable => System.err.println(s"bench.json write failed: $e") }
    // The driver has twice captured only the TAIL of stdout, leaving the
    // (single, long) JSON line truncated from the front and unparseable.
    // Emit a compact self-contained summary as the very LAST line so even
    // a tail capture yields a parseable record; the full per-key JSON is
    // in .tmp/bench.json above.
    //
    // Round-17 verdict #1: every BENCH record since round 14 carries
    // "parsed": null — the driver's parser extracts per-query seconds
    // from neither the giant full-JSON line (front-truncated by the tail
    // capture) nor this summary line (which carried only totals). The
    // per-query seconds map therefore now rides THIS closing line too,
    // compact (3 decimals, no trial detail — ~25 bytes/key), alongside
    // the original one-line contract fields (metric/value/unit/queries/
    // sf) and all previously existing summary fields. Timing methodology
    // is untouched; this is output plumbing only.
    locally {
      val n = ok.size
      val worst = if (ok.nonEmpty) ok.maxBy(_._2) else ("", 0.0)
      // worst_trials: the worst key's FULL trial vector + start time, so
      // even a tail-only driver capture carries enough to attribute an
      // outlier to a time window (all trials inflated ⇒ contention
      // spanning the window; one trial ⇒ min-of-N already absorbed it)
      val wDetail = detail.collectFirst { case (k, r) if k == worst._1 => r }
      val wTrials = wDetail.map(r => r.trials.map(t => f"$t%.3f")
        .mkString("[", ",", "]")).getOrElse("[]")
      val wT0 = wDetail.map(_.t0EpochMs).getOrElse(0L)
      // the worst key's cpu block rides the tail summary too — a breach
      // record must self-adjudicate even under a tail-only capture
      val wCpu = wDetail.map(_.cpuJson).getOrElse("")
        .replaceFirst("^,\"cpu\":", ",\"worst_cpu\":")
      val qsCompact = results.map { case (k, v) => f""""$k":$v%.3f""" }
        .mkString("{", ",", "}")
      // field order is deliberate: the driver stores only the LAST ~2k
      // chars of stdout in its record, so the human-auditable summary
      // fields (worst key, cold block, sf) sit at the END of the line
      // where a truncated capture still shows them; the parseable map
      // sits in front for a full-stdout parser.
      println(f"""{"metric":"bench_summary","value":$total,"unit":"sec",""" +
        s""""queries":$qsCompact,""" +
        f""""total_sec":$total%.2f,"n_keys":$n,""" +
        f""""n_failed":$nFailed,""" +
        f""""per_key_avg":${if (n > 0) total / n else 0.0}%.4f,""" +
        f""""worst_key":"${worst._1}","worst_sec":${worst._2}%.3f,""" +
        f""""worst_trials":$wTrials,"worst_t0_epoch_ms":$wT0$wCpu""" +
        s"""$coldJson,"sf":"$sfDir"}""")
    }
    spark.stop()
  }
}
