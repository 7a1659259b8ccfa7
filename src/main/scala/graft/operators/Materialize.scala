package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.storage.StorageLevel

/** Session-scoped materialized index artifacts. The reference keeps ONE
  * inverted index that every query reads (Solr holds it between requests,
  * /root/reference/README.md:12-13); the engine-native equivalent of that
  * discipline is building each derived index artifact (shingle inverted
  * index, posting lists, analyzed term vectors) exactly once per session
  * and serving every consumer — every branch of one plan AND every query
  * of the family — from the materialized copy, instead of re-deriving the
  * artifact inside each query plan.
  *
  * Artifacts are persisted MEMORY_AND_DISK and computed EAGERLY at first
  * request: consumers never race to compute partitions, and a plan that
  * references the artifact N times reads cached blocks N times instead of
  * embedding N copies of the build subtree. At 100 TB the same seam is a
  * persisted table maintained incrementally by the changelog pipeline
  * (`streaming/IncrementalPostings.scala` is the file-backed maintained
  * form; `operators/IvfIndex.scala` the vector one); the in-process cache
  * is the session-lifetime complement — it holds the ARTIFACT (vocabulary /
  * shingle set / term vectors), never the corpus, and spills to local disk
  * past memory.
  */
object Materialize {
  private val cache = scala.collection.mutable.Map.empty[(Int, String, String), DataFrame]

  /** The artifact `name` over scope `scope` (the data directory), built at
    * most once per SparkSession; later calls return the persisted copy. */
  def artifact(spark: SparkSession, name: String, scope: String)
              (build: => DataFrame): DataFrame = synchronized {
    cache.getOrElseUpdate((System.identityHashCode(spark), name, scope), {
      val df = build.persist(StorageLevel.MEMORY_AND_DISK)
      df.count() // eager: the build runs here, once — not in consumer plans
      df
    })
  }

  /** Test seam: drop every artifact cached for `spark` (unpersist + forget). */
  private[graft] def reset(spark: SparkSession): Unit = synchronized {
    val id = System.identityHashCode(spark)
    cache.filterInPlace { case ((sid, _, _), df) =>
      if (sid == id) { df.unpersist(); false } else true
    }: Unit
  }
}
