package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import graft.operators.{Analyzer, Materialize}

/** Incremental maintenance of the dedup family's shingle inverted index —
  * the reference's architecture (an index kept current by the mutation
  * stream, HbaseSolrIndexCoprocesser.java:38-61 → SolrIndexTools.java:93-144)
  * applied to the repo's most expensive derived artifact. The state reuses
  * [[IncrementalPostings]]' bucketed-delta machinery verbatim — the
  * "token" is a word 3-gram — so every property proven there holds here:
  * per-batch writes are O(touched doc buckets + touched shingle buckets),
  * never O(state); per-bucket swaps are prefix-atomic with idempotent
  * replay (double anti-join + tombstoned docs state).
  *
  * Read side: [[shingleIndex]] serves the maintained state in exactly
  * `Dedup.shingleIndex`'s batch shape — (s, sorted numeric ids) with the
  * document-frequency cap applied AT READ (the cap is query semantics, not
  * state semantics: a shingle that crosses the cap as docs arrive must
  * drop out of candidate generation, and one whose docs get deleted must
  * re-enter — capping the persisted state would bake in arrival order).
  *
  * Wiring: [[register]] points a corpus scope (data directory) at a
  * maintained state root; `Dedup.sharedShingleIndex` then feeds the
  * session's materialized artifact from the maintained table instead of
  * rebuilding from the corpus — and every merge into that root invalidates
  * the registered scopes' session caches ([[Materialize.invalidate]]), so
  * no session serves a stale shingle index or near-dup pair set after the
  * stream has moved the state forward.
  *
  * Contract: the changelog `rowkey` is the decimal string form of the
  * corpus `doc_id` (the fixture corpus's natural key) — the read side
  * casts ids back to long for the pair generators' numeric ordering.
  */
object IncrementalShingles {

  /** Word 3-gram shingling as a pure column expression, shingle-set
    * identical per document to the batch builder (`TextAnalysis.shingles`):
    * whitespace tokens; documents under 3 tokens yield no shingles. The
    * merge keys entries by (shingle, doc) — multiplicity rides in the tf
    * column; the read side treats postings as a set. */
  val shingleize: Column => Column = text => {
    val t = Analyzer.default.tokens(text)
    when(size(t) >= 3,
      transform(sequence(lit(1), size(t) - 2),
        i => concat_ws(" ", slice(t, i, lit(3)))))
      .otherwise(array().cast("array<string>"))
  }

  /** Driver-local twin of [[shingleize]] for single-string probe texts:
    * identical output to the column expression (property-tested in
    * PropertySpec), without scheduling a Spark job to shingleize one
    * driver-resident string. Tokenization matches `Analyzer.default`
    * exactly — Spark's `split(text, " ")` is Java regex split with
    * limit -1 (trailing empty tokens kept). */
  private[graft] def shingleizeLocal(text: String): Seq[String] = {
    val t = text.split(" ", -1)
    if (t.length < 3) Seq.empty
    else (0 to t.length - 3).map(i => s"${t(i)} ${t(i + 1)} ${t(i + 2)}")
  }

  /** corpus scope (session, data dir) → maintained shingle-state root. */
  private val registry =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), String]()
  Materialize.onSessionFreed(s => registry.keySet.removeIf(_._1 eq s): Unit)

  /** Serve `corpusDir`'s shingle index from the maintained state at
    * `rootPath` (drops the scope's cached shingle artifacts so the switch
    * takes effect immediately). */
  def register(spark: SparkSession, corpusDir: String, rootPath: String): Unit = {
    registry.put((spark, corpusDir), rootPath)
    invalidateScope(corpusDir)
  }

  /** Back to batch-building `corpusDir`'s shingle index from the corpus. */
  def unregister(spark: SparkSession, corpusDir: String): Unit = {
    registry.remove((spark, corpusDir))
    invalidateScope(corpusDir)
  }

  private[graft] def maintainedRoot(spark: SparkSession, corpusDir: String): Option[String] =
    Option(registry.get((spark, corpusDir)))

  /** The scope's LIVE documents as (doc_id, text): the maintained docs
    * state when `corpusDir` is [[register]]ed — so per-doc derived
    * artifacts (SimHash fingerprints, min-shingle fingerprints) are fed
    * from the state the changelog keeps current, with no corpus scan —
    * otherwise the corpus table itself. Every maintained-state merge
    * invalidates the scope's session artifacts ([[mergeBatch]]), so a
    * registered scope's fingerprint tables can never lag the state.
    * Rowkeys are the decimal doc_id strings (the class contract). */
  private[graft] def liveDocs(spark: SparkSession, corpusDir: String): DataFrame =
    maintainedRoot(spark, corpusDir)
      .map(root => IncrementalPostings.docsState(spark, root)
        .select(col("rowkey").cast("long").as("doc_id"), col("text")))
      .getOrElse(graft.Tables.documents(spark, corpusDir).select("doc_id", "text"))

  /** Every artifact derived from the scope's corpus must drop when its
    * source changes (registration or a maintained-state merge) — the whole
    * scope, not a name list: fingerprints, postings, and any artifact
    * added later are corpus-derived too, and a stale survivor would
    * silently serve pre-mutation results. */
  private def invalidateScope(corpusDir: String): Unit =
    Materialize.invalidate(corpusDir)

  /** Fold one changelog micro-batch (rowkey, event_id, op, text) into the
    * maintained shingle state, then invalidate every session artifact fed
    * by this root — the cache-coherence half of ADVICE's stale-artifact
    * concern: a corpus mutated through the pipeline cannot keep serving
    * pre-mutation dedup artifacts. */
  def mergeBatch(spark: SparkSession, batch: DataFrame, rootPath: String,
                 numBuckets: Int = IncrementalIndex.DefaultBuckets): Unit = {
    IncrementalPostings.mergeBatch(spark, batch, rootPath, shingleize, numBuckets)
    registry.forEach { (key, root) =>
      if (root == rootPath) invalidateScope(key._2)
    }
  }

  /** The maintained shingle inverted index in the batch builder's shape:
    * (s, sorted numeric doc ids), shingles over the DF cap dropped at
    * read. */
  def shingleIndex(spark: SparkSession, rootPath: String, dfCap: Int): DataFrame =
    IncrementalPostings.postings(spark, rootPath)
      .filter(col("df") <= dfCap)
      .select(col("tok").as("s"),
        sort_array(transform(col("ids"), _.cast("long"))).as("ids"))

  /** Query-time near-duplicate probe against the MAINTAINED state — the
    * ingestion-time dedup check a training-data pipeline runs per arriving
    * document, with no corpus scan anywhere (the online form of the batch
    * family's `q_dedup_near`; the reference's search-then-fetch topology
    * applied to dedup). Three steps:
    *
    *   1. the arriving text's own shingles (one doc — driver-side
    *      metadata, computed through the SAME column expression as the
    *      index's write side);
    *   2. candidate ids from the entries read bucket-pruned to those
    *      shingles ([[IncrementalPostings.prunedEntries]]), with the
    *      document-frequency cap applied exactly (a shingle's posting
    *      list is complete within its bucket): a shingle shared by more
    *      than `dfCap` docs carries no near-dup signal but quadratic
    *      fan-out — same recall contract as the batch family;
    *   3. the candidate list — bounded by dfCap × |query shingles| by
    *      construction — fetches its live rows from ONLY the doc buckets
    *      the candidates hash to (the HBase-Get shape), and the score is
    *      the EXACT Jaccard between the two shingle sets, recomputed
    *      from the fetched texts: candidates are cap-bounded, the
    *      reported score is uncapped truth.
    *
    * Per-query I/O: |query-shingle entry buckets| + |candidate doc
    * buckets|, never the index or the corpus. Returns (rowkey, jaccard)
    * ≥ `threshold`, best match first. */
  def nearDuplicates(spark: SparkSession, rootPath: String, text: String,
                     threshold: Double = 0.8,
                     dfCap: Int = graft.operators.Dedup.DfCap): DataFrame = {
    val qsh = shingleizeLocal(text).distinct
    if (qsh.isEmpty) // under 3 tokens: no shingles, no candidates — empty, not an error
      return spark.range(0).select(lit("").as("rowkey"), lit(0.0).as("jaccard"))
    // one pass over the pruned entries: per-shingle df and posting list
    // together, cap filter, then the union of surviving posting lists.
    // The candidate list is collected — bounded by dfCap × |query
    // shingles| by construction — so the live-row fetch below prunes to
    // the candidates' own doc buckets (the HBase-Get shape).
    val candIds = IncrementalPostings.prunedEntries(spark, rootPath, qsh)
      .groupBy("tok")
      .agg(count(lit(1)).as("df"), collect_set(col("doc_id")).as("ids"))
      .filter(col("df") <= dfCap)
      .select(explode(col("ids")).as("rowkey"))
      .distinct()
      .collect().map(_.getString(0)).toSeq
    if (candIds.isEmpty)
      return spark.range(0).select(lit("").as("rowkey"), lit(0.0).as("jaccard"))
    val qArr = typedlit(qsh)
    IncrementalPostings.prunedDocs(spark, rootPath, candIds)
      .select(col("rowkey"), array_distinct(shingleize(col("text"))).as("bs"))
      .withColumn("c", size(array_intersect(col("bs"), qArr)).cast("long"))
      .withColumn("jaccard",
        round(col("c") / (size(col("bs")) + lit(qsh.length) - col("c")), 4))
      .filter(col("jaccard") >= threshold)
      .select("rowkey", "jaccard")
      .orderBy(col("jaccard").desc, col("rowkey"))
  }

  /** Batch form of [[nearDuplicates]] — a micro-batch of arriving
    * documents probes the maintained state in ONE job (the shape an
    * ingest pipeline runs per batch, not per doc): one shingle explode
    * over the batch, the entries read BUCKET-PRUNED to the batch's
    * shingles (the shingle VALUES are data, but the bucket ids they hash
    * to are driver metadata bounded by the bucket count —
    * [[IncrementalPostings.prunedEntriesForTokens]], the same
    * touched-bucket collect the merge itself runs), per-shingle df and
    * posting list aggregated together, candidates df-capped exactly as
    * the per-doc probe, then the candidate rows fetched from ONLY the doc
    * buckets the candidates hash to
    * ([[IncrementalPostings.prunedDocsForKeys]]) and scored by the exact
    * text-derived Jaccard. Per-batch I/O is O(touched entry buckets +
    * candidate doc buckets) — never the index, never the corpus — which
    * is what lets [[dedupGate]] run this on EVERY ingest micro-batch.
    * `docs` is (qid STRING, text); returns (qid, rowkey, jaccard) ≥
    * `threshold`. */
  def nearDuplicatesBatch(spark: SparkSession, rootPath: String, docs: DataFrame,
                          threshold: Double = 0.8,
                          dfCap: Int = graft.operators.Dedup.DfCap): DataFrame = {
    // checkpointed: the shingle set feeds the bucket-id collect, the
    // qid→candidate join, and (via cands) the fetch pruning — one
    // batch-sized materialization instead of three shingleize passes
    val qsh = docs.select(col("qid"),
      explode(array_distinct(shingleize(col("text")))).as("tok")).localCheckpoint()
    val hit = IncrementalPostings.prunedEntriesForTokens(spark, rootPath,
        qsh.select("tok").distinct())
      .groupBy("tok")
      .agg(count(lit(1)).as("df"), collect_set(col("doc_id")).as("ids"))
      .filter(col("df") <= dfCap)
    // df-cap-bounded by construction (≤ dfCap × |batch shingles| rows);
    // checkpointed so the fetch's bucket-id collect and the join read one
    // materialization
    val cands = hit.select(col("tok"), explode(col("ids")).as("rowkey"))
      .join(qsh, "tok")
      .select(col("qid"), col("rowkey")).distinct().localCheckpoint()
    val qArr = docs.select(col("qid"),
      array_distinct(shingleize(col("text"))).as("qs"))
    IncrementalPostings.prunedDocsForKeys(spark, rootPath, cands.select("rowkey"))
      .join(cands, "rowkey")
      .join(qArr, "qid")
      .select(col("qid"), col("rowkey"),
        array_distinct(shingleize(col("text"))).as("bs"), col("qs"))
      .withColumn("c", size(array_intersect(col("bs"), col("qs"))).cast("long"))
      .withColumn("jaccard",
        round(col("c") / (size(col("bs")) + size(col("qs")) - col("c")), 4))
      .filter(col("jaccard") >= threshold)
      .select("qid", "rowkey", "jaccard")
  }

  /** Rowkeys to DROP among one batch's own documents: near-dup pairs at
    * `threshold` are generated within the batch (df-capped shingle
    * buckets → posting-list pair expansion — `Dedup.pairsFromBuckets`'s
    * shape, batch-sized), and a rowkey is dropped iff it has a near-dup
    * partner with a SMALLER rowkey. Pairs are emitted ordered (da < db
    * lexicographically, from the sorted bucket arrays), so the drop set
    * is just the distinct `db` side — and the admitted set is pairwise
    * near-dup-free by construction: if two admitted keys were near-dups,
    * the larger would appear as some pair's `db`. Keeping every local
    * minimum (rather than only each connected component's global minimum)
    * admits strictly more data under the same invariant — near-dup is not
    * transitive, so two docs that merely share a common near-dup are not
    * themselves duplicates and both belong in the corpus. */
  private def intraBatchDrops(docs: DataFrame, threshold: Double,
                              dfCap: Int): DataFrame = {
    val sh = docs.select(col("rowkey"),
      explode(array_distinct(shingleize(col("text")))).as("s"))
    val buckets = sh.groupBy("s")
      .agg(sort_array(collect_set(col("rowkey"))).as("ids"))
      .filter(size(col("ids")) <= dfCap)
    val co = graft.operators.Dedup.pairsFromBuckets(buckets, "ids")
      .groupBy("da", "db").agg(count(lit(1)).as("c"))
    val cnt = sh.groupBy("rowkey").agg(count(lit(1)).as("nsh"))
    co
      .join(cnt.select(col("rowkey").as("da"), col("nsh").as("na")), "da")
      .join(cnt.select(col("rowkey").as("db"), col("nsh").as("nb")), "db")
      .filter(round(col("c") / (col("na") + col("nb") - col("c")), 4) >= threshold)
      .select(col("db").as("rowkey")).distinct()
  }

  /** The ingestion-time admission filter — the dedup gate an LLM-data
    * pipeline runs before letting a batch into the corpus. Two passes:
    *
    *   1. AGAINST THE MAINTAINED STATE: puts whose text already has a
    *      near-duplicate in the state (at `threshold`) are dropped — via
    *      the bucket-pruned [[nearDuplicatesBatch]], so the per-batch I/O
    *      is O(touched buckets), never the index;
    *   2. WITHIN THE BATCH: two novel near-identical documents arriving
    *      in the SAME micro-batch (invisible to pass 1 — neither is in
    *      the state yet) are deduped against each other: each near-dup
    *      pair keeps its smaller rowkey ([[intraBatchDrops]]), so the
    *      admitted set is pairwise near-dup-free and the gated corpus
    *      invariant holds across AND within batches.
    *
    * Deletes always pass through unchanged, ready for the merge sinks. */
  def dedupGate(spark: SparkSession, rootPath: String, batch: DataFrame,
                threshold: Double = 0.8): DataFrame = {
    val puts = batch.filter(col("op") =!= "delete")
    // a put whose only near-dup is its OWN stored version is an UPDATE,
    // not a duplicate — qid = rowkey matches must not gate it out, or
    // every minor edit to an existing document would be silently lost
    val dupIds = nearDuplicatesBatch(spark, rootPath,
        puts.select(col("rowkey").as("qid"), col("text")), threshold)
      .filter(col("qid") =!= col("rowkey"))
      .select(col("qid").as("rowkey")).distinct()
    // checkpointed: state-pass survivors feed both the intra-batch pair
    // generation and the final anti-join — one probe, not two
    val survivors = puts.join(dupIds, Seq("rowkey"), "left_anti").localCheckpoint()
    // intra-batch pairing operates at document granularity: latest event
    // per rowkey (the version the merge would keep)
    val latest = survivors.groupBy("rowkey")
      .agg(max_by(col("text"), col("event_id")).as("text"))
    val drops = intraBatchDrops(latest, threshold, graft.operators.Dedup.DfCap)
    batch.filter(col("op") === "delete")
      .unionByName(survivors.join(drops, Seq("rowkey"), "left_anti"))
  }

  /** Wire a streaming document changelog into the shingle-state merge —
    * same knobs as [[IncrementalPostings.start]]. */
  def start(changes: DataFrame, rootPath: String, checkpoint: String,
            intervalSeconds: Int = 30, firstDelaySeconds: Int = 0,
            numBuckets: Int = IncrementalIndex.DefaultBuckets): StreamingQuery = {
    val gate = IncrementalIndex.firstBatchGate(firstDelaySeconds)
    changes.writeStream
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime(s"$intervalSeconds seconds"))
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        gate()
        mergeBatch(batch.sparkSession, batch, rootPath, numBuckets)
      }
      .start()
  }
}
