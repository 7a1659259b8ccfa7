package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.storage.StorageLevel

/** Session-scoped materialized index artifacts. The reference keeps ONE
  * inverted index that every query reads (Solr holds it between requests,
  * /root/reference/README.md:12-13); the engine-native equivalent of that
  * discipline is building each derived index artifact exactly once per
  * session and serving every consumer — every branch of one plan AND every
  * query of the family — from the materialized copy, instead of
  * re-deriving the artifact inside each query plan.
  *
  * Artifacts are persisted MEMORY_AND_DISK and computed EAGERLY at first
  * request: consumers never race to compute partitions, and a plan that
  * references the artifact N times reads cached blocks N times instead of
  * embedding N copies of the build subtree. What goes in the cache is
  * always a derived INDEX component — posting lists and shingle indexes
  * (vocabulary-sized), pair sets (result-sized), per-document term
  * vectors (the same per-doc artifact Lucene optionally stores for
  * highlighting/MLT — index-sized, not raw input) — never an unprocessed
  * copy of the source table. At 100 TB the same seam is a persisted table
  * maintained incrementally by the changelog pipeline
  * (`streaming/IncrementalPostings.scala` is the file-backed maintained
  * form; `operators/IvfIndex.scala` the vector one); the in-process cache
  * is the session-lifetime complement, spilling to local disk past
  * memory.
  *
  * Concurrency: builds are guarded per key — two threads requesting
  * DIFFERENT artifacts build in parallel; two requesting the same key get
  * one build. Cache hits never block on a build. Keys hold the session
  * reference itself (identity equality — the cached DataFrames retain the
  * session anyway), so distinct sessions can never collide.
  */
object Materialize {
  private type Key = (SparkSession, String, String)
  private val cache = new java.util.concurrent.ConcurrentHashMap[Key, DataFrame]()
  private val locks = new java.util.concurrent.ConcurrentHashMap[Key, Object]()

  /** The artifact `name` over scope `scope` (the data directory), built at
    * most once per SparkSession; later calls return the persisted copy. */
  def artifact(spark: SparkSession, name: String, scope: String)
              (build: => DataFrame): DataFrame = {
    val key: Key = (spark, name, scope)
    val hit = cache.get(key)
    if (hit != null) return hit
    val lock = locks.computeIfAbsent(key, _ => new Object)
    lock.synchronized {
      val again = cache.get(key)
      if (again != null) again
      else {
        val df = build.persist(StorageLevel.MEMORY_AND_DISK)
        df.count() // eager: the build runs here, once — not in consumer plans
        cache.put(key, df)
        df
      }
    }
  }

  /** Drop every artifact cached for `spark` (unpersist + forget) — called
    * when a session's artifacts should no longer pin executor storage
    * (spec teardown wires this per suite; a long-lived driver cycling
    * sessions calls it at session retirement). */
  private[graft] def reset(spark: SparkSession): Unit = {
    val it = cache.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      if (e.getKey._1 eq spark) {
        e.getValue.unpersist()
        locks.remove(e.getKey)
        it.remove()
      }
    }
  }
}
