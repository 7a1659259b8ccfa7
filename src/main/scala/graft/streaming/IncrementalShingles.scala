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
    * per-doc distinct is applied by the merge (postings are a set). */
  val shingleize: Column => Column = text => {
    val t = Analyzer.default.tokens(text)
    when(size(t) >= 3,
      transform(sequence(lit(1), size(t) - 2),
        i => concat_ws(" ", slice(t, i, lit(3)))))
      .otherwise(array().cast("array<string>"))
  }

  /** corpus scope (session, data dir) → maintained shingle-state root. */
  private val registry =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), String]()

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

  /** The shingle artifacts derived from the index — both must drop when
    * the index's source changes (registration or a maintained-state merge). */
  private def invalidateScope(corpusDir: String): Unit = {
    Materialize.invalidate("shingle_index", corpusDir)
    Materialize.invalidate("near_dup_pairs", corpusDir)
  }

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
