package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the complete operator inventory of SURVEY.md §2 (changelog
  * O1–O11, delegated Solr surface S1–S12, pipeline extensions X1–X5 plus
  * the dedup/similarity/text/multimodal variants). Every key with
  * SQL-expressible semantics has a matching DuckDB oracle in `oracleSql`;
  * `q_distinct_approx` is HLL-sketch-based and intentionally has none
  * (rows-only check).
  */
object SparkEntry {

  /** Flagship: latest-wins changelog compaction (the reference's entire
    * reason for existing — index state = latest put per rowkey minus
    * deletes; SURVEY.md §2.A O11). Driver smoke-checks rows > 0. */
  def entry(spark: SparkSession): DataFrame =
    Changelog.queries("q_index_state")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Changelog.queries ++ Search.queries ++ Facets.queries ++ Fetch.queries ++
      TextAnalysis.queries ++ Dedup.queries ++ Vectors.queries ++
      Multimodal.queries ++ Index.queries ++ Temporal.queries ++
      Percolate.queries ++ Pii.queries ++ Multifield.queries ++ Hybrid.queries

  /** For each key in queries, equivalent SQL runnable by DuckDB on the same
    * parquet tables. Omitted for non-SQL-expressible ops (HLL sketches). */
  def oracleSql: Map[String, String] =
    Changelog.oracle ++ Search.oracle ++ Facets.oracle ++ Fetch.oracle ++
      TextAnalysis.oracle ++ Dedup.oracle ++ Vectors.oracle ++
      Multimodal.oracle ++ Index.oracle ++ Temporal.oracle ++
      Percolate.oracle ++ Pii.oracle ++ Multifield.oracle ++ Hybrid.oracle
}
