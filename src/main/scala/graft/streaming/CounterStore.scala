package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Maintained COUNTER state — HBase's `Increment` mutation family
  * (SURVEY.md §2.A O11 deepened a second way): per (rowkey, qualifier)
  * the value is the running SUM of deltas, not the latest put. This is a
  * commutative-aggregate merge semantic, architecturally distinct from
  * the latest-wins stores ([[IncrementalIndex]], [[CellStore]]): state
  * rows are PARTIALS (total, n_incr, last_id), never raw history, so a
  * hot counter costs O(1) storage regardless of increment volume —
  * exactly why HBase ships Increment instead of read-modify-write puts.
  *
  * Layout mirrors [[CellStore]]: `b=<i>` bucket dirs keyed by
  * `pmod(crc32(rowkey), numBuckets)`, prefix-atomic per-bucket commits,
  * merges rewriting only touched buckets.
  *
  * Semantics:
  *  - `op = 'incr'` rows add `delta` to cell (rowkey, qualifier);
  *  - a row tombstone (`op = 'delete'`, qualifier NULL) RESETS every
  *    cell of the row at or below its event_id (HBase delete-row over
  *    counter columns); the latest tombstone is retained;
  *  - replay-safe via the HIGH-WATER contract (HBase's own seqid
  *    discipline): a cell's partial carries `last_id`, and a batch row
  *    with `event_id <= last_id` is already folded in and is dropped.
  *    This requires per-key MONOTONE batch arrival — event ids of later
  *    batches exceed earlier ones for the same key, which the changelog
  *    total order (and any per-key-ordered source, e.g. a partitioned
  *    log) provides. An out-of-order cross-batch delta below the high
  *    water would be dropped as a replay; that is the same trade HBase
  *    makes, and the monotone contract is documented at every entry.
  *    Whole-row duplicate raws WITHIN one batch collapse exactly like
  *    [[CellStore.compactCells]]'s replay dedupe.
  *
  * 100 TB: merges shuffle O(batch + touched buckets) on rowkey — the
  * intra-batch dedupe is one all-columns aggregate over that bounded
  * set, the high-water drop and tombstone mask share one rowkey
  * exchange, and the final per-cell fold is a partial aggregate over
  * already-co-located rows. Reads are pure scan-project; point reads
  * open one bucket.
  */
object CounterStore {

  val DefaultBuckets = 16

  private def bucketCol(numBuckets: Int): Column =
    pmod(crc32(col("rowkey")), lit(numBuckets)).cast("int")

  /** Compact (state partials ∪ raw batch) to fresh per-cell partials.
    * Input schema: `rowkey STRING, qualifier STRING (NULL for row
    * deletes), last_id LONG (the raw event_id for batch rows), op STRING
    * ('incr'|'delete'), total DOUBLE (the raw delta for batch rows),
    * n_incr LONG (1 for batch rows), agg BOOLEAN (true for state
    * partials)`. */
  /** The compaction input annotated with its keep/drop verdicts — the
    * shared head of [[compactCounters]] (which keeps) and the merge's
    * hw-drop metric (which counts the drops). `hw_dropped` marks exactly
    * the rows the HIGH-WATER filter suppresses: raw non-delete rows that
    * survive the tombstone but fall at or below their cell's folded
    * last_id. Under the documented monotone-arrival contract those are
    * replays; under a contract VIOLATION (a genuine out-of-order
    * cross-batch increment) they are silent data loss — which is why the
    * merge counts them (see [[lastMergeHwDrops]]). */
  private def annotated(changes: DataFrame): DataFrame = {
    val del = col("op") === "delete"
    // intra-batch at-least-once duplicates collapse (CellStore's replay
    // dedupe); distinct deltas sharing an event_id survive as distinct
    val deduped = changes.dropDuplicates(changes.columns.toIndexedSeq)
    val wRow = Window.partitionBy("rowkey")
    val wCell = Window.partitionBy(col("rowkey"), col("qualifier"))
    deduped
      .withColumn("tomb", max(when(del, col("last_id"))).over(wRow))
      // high water: raw rows at or below a partial's last_id are replays
      .withColumn("hw",
        max(when(col("agg") && !del, col("last_id"))).over(wCell))
      .withColumn("hw_dropped",
        !del && !col("agg") &&
          col("last_id") > coalesce(col("tomb"), lit(-1L)) &&
          col("last_id") <= coalesce(col("hw"), lit(-1L)))
      .withColumn("kept",
        when(del, col("last_id") === col("tomb")) // latest tombstone
          .otherwise(
            col("last_id") > coalesce(col("tomb"), lit(-1L)) &&
            (col("agg") || col("last_id") > coalesce(col("hw"), lit(-1L)))))
  }

  /** The per-cell fold over the annotated frame's kept rows — one body
    * shared by [[compactCounters]] and the merge (two copies would drift
    * on the next schema change). */
  private def fold(ann: DataFrame): DataFrame =
    ann.filter(col("kept"))
      .groupBy("rowkey", "qualifier", "op")
      .agg(max(col("last_id")).as("last_id"),
        sum(col("total")).as("total"),
        sum(col("n_incr")).as("n_incr"))
      .withColumn("agg", lit(true))

  def compactCounters(changes: DataFrame): DataFrame =
    fold(annotated(changes))

  /** Rows the last [[mergeCounters]] ON THIS ROOT suppressed as
    * high-water replays — the observability seam for the monotone-arrival
    * contract: expected checkpoint replays show up here too, but a
    * NON-ZERO count outside a replay window means genuine out-of-order
    * increments were dropped (the documented trade). Keyed per statePath
    * so concurrent pipelines in one JVM never overwrite each other's
    * counts (a process-global last-merge-wins field was unreliable
    * exactly when multiple roots merge at once); [[mergeCounters]] also
    * RETURNS the count so callers needn't consult the map at all.
    * Per-JVM side metric, not state. */
  private val hwDropsByRoot =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Long]()

  /** One canonical key per root: an unnormalized variant of the same path
    * (trailing slash, `./`-relative vs absolute) must read the SAME
    * metric slot, not silently 0 (round-12 ADVICE). Hadoop Path handles
    * the slash/scheme canonicalization; the explicit absolutize covers
    * relative-vs-absolute spellings of a local root. */
  private def rootKey(statePath: String): String = {
    val p = new org.apache.hadoop.fs.Path(statePath)
    val scheme = p.toUri.getScheme
    if (scheme == null || scheme == "file") {
      // local root: `file:`-URI, relative, `./`-relative, and
      // trailing-slash spellings all collapse to one absolute NORMALIZED
      // filesystem path — File.getAbsolutePath keeps `.`/`..` segments
      // ('./x' → '/cwd/./x' ≠ '/cwd/x'), which would silently split the
      // metric slot this key exists to unify (round-13 ADVICE)
      val raw = if (scheme == null) statePath else p.toUri.getPath
      java.nio.file.Paths.get(raw).toAbsolutePath.normalize
        .toString.stripSuffix("/")
    } else p.toUri.toString.stripSuffix("/")
  }

  /** The last merge's hw-replay drop count for `statePath` (0 if this JVM
    * has not merged that root). */
  def lastMergeHwDrops(statePath: String): Long =
    Option(hwDropsByRoot.get(rootKey(statePath))).map(_.longValue).getOrElse(0L)

  private def normalize(batch: DataFrame): DataFrame =
    batch.select(col("rowkey"), col("qualifier"),
      col("event_id").as("last_id"), col("op"),
      col("delta").cast("double").as("total"),
      when(col("op") === "delete", 0L).otherwise(1L).as("n_incr"),
      lit(false).as("agg"))

  /** Merge one batch of increment/delete mutations (schema: rowkey,
    * qualifier, event_id, op, delta) into the bucketed counter state.
    * Same crash contract as [[CellStore.mergeCells]]; same monotone
    * high-water replay contract as the object doc. Returns the number of
    * raw increments suppressed as high-water replays (also readable
    * afterwards via [[lastMergeHwDrops]]). */
  def mergeCounters(spark: SparkSession, batch: DataFrame, statePath: String,
                    numBuckets: Int = DefaultBuckets): Long = {
    val withB = normalize(batch).withColumn("b", bucketCol(numBuckets))
    val touched = withB.select("b").distinct().collect().map(_.getInt(0)).sorted
    // an empty batch suppresses nothing: reset BEFORE the early return so
    // the last-merge-wins metric can never attribute a previous merge's
    // drops to a no-op batch
    hwDropsByRoot.put(rootKey(statePath), 0L)
    if (touched.isEmpty) return 0L
    StateStore.ensureBucketCount(spark, statePath, numBuckets)
    val live = StateStore.liveBuckets(spark, statePath).toSet
    val touchedDirs = touched.toSeq.map(b => s"b=$b")
    val oldPaths = touchedDirs.filter(live.contains).map(d => s"$statePath/$d")
    val oldTouched =
      if (oldPaths.nonEmpty)
        spark.read.parquet(oldPaths: _*).withColumn("b", bucketCol(numBuckets))
      else withB.limit(0)
    // annotate once, cache: the kept rows feed the fold, the hw-dropped
    // rows feed the replay-suppression metric — one window pass for both
    val ann = annotated(oldTouched.unionByName(withB)).cache()
    val merged = fold(ann)
      .withColumn("b", bucketCol(numBuckets))
      .repartition(col("b")).cache()
    merged.count() // materialize before the swap touches the input paths
    val hwDrops = ann.filter(col("hw_dropped")).count()
    hwDropsByRoot.put(rootKey(statePath), hwDrops)
    if (hwDrops > 0)
      System.err.println(s"CounterStore.mergeCounters: $hwDrops " +
        s"raw increment(s) at or below their cell's high water were " +
        s"suppressed as replays at $statePath — expected under checkpoint " +
        s"replay; outside a replay window this is the monotone-arrival " +
        s"contract being violated (out-of-order increments dropped)")
    try StateStore.commitBuckets(spark, statePath, touchedDirs) { tmpRoot =>
      merged.sortWithinPartitions("b", "rowkey", "qualifier")
        .write.partitionBy("b").mode("overwrite").parquet(tmpRoot)
    } finally { merged.unpersist(); ann.unpersist(): Unit }
    hwDrops
  }

  /** Live counters (tombstone rows filtered): (rowkey, qualifier, total,
    * n_incr, last_id). Pure scan-project. */
  def readCounters(spark: SparkSession, statePath: String): DataFrame = {
    val dirs = StateStore.liveBuckets(spark, statePath)
    require(dirs.nonEmpty, s"no committed counter state at $statePath")
    spark.read.parquet(dirs.map(d => s"$statePath/$d"): _*)
      .filter(col("op") =!= "delete")
      .select("rowkey", "qualifier", "total", "n_incr", "last_id")
  }

  /** Point fetch of one row's counters (HBase `Get` over counter
    * columns): opens only the keys' buckets. */
  def getCounters(spark: SparkSession, statePath: String,
                  rowkeys: Seq[String]): DataFrame = {
    require(rowkeys.nonEmpty, "getCounters needs at least one rowkey")
    val live = StateStore.liveBuckets(spark, statePath)
    require(live.nonEmpty, s"no committed counter state at $statePath")
    val wanted = StateStore.bucketDirsFor(spark, statePath, rowkeys.distinct)
    val (dirs, none) =
      if (wanted.nonEmpty) (wanted, false) else (live.take(1), true)
    val rows = spark.read.parquet(dirs.map(d => s"$statePath/$d"): _*)
      .filter(col("op") =!= "delete")
      .filter(col("rowkey").isin(rowkeys.distinct: _*))
      .select("rowkey", "qualifier", "total", "n_incr", "last_id")
    if (none) rows.limit(0) else rows
  }
}
