package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** Full-text search family — the read surface the reference delegates to
  * Solr (SURVEY.md §2.B S1–S5; requirement "全文检索" /root/reference
  * README.md:6, solr-solrj dependency pom.xml:22).
  *
  * The Solr analyzer chain becomes a pure-SQL tokenizer (`split` on the
  * corpus's whitespace tokenization); term match is `array_contains`;
  * relevance is term frequency via the higher-order `filter` function. All
  * codegen'd built-ins — no UDFs — so predicates stay inside whole-stage
  * codegen and the parquet scan prunes to (doc_id, text, …) only.
  *
  * Scale notes: term-match over 100 TB is a full scan the first time; the
  * production path is to materialize `q_text_tokens`-style posting lists
  * (token → doc ids, bucketed by token) once and semi-join them, which is
  * exactly the inverted index the reference maintains in Solr. Top-k is
  * `TakeOrderedAndProject` (per-partition heap + driver merge of k rows) —
  * no global sort at any scale.
  */
object Search {
  type Q = (SparkSession, String) => DataFrame

  private def toks = split(col("text"), " ")
  private def hasTok(t: String) = array_contains(toks, t)

  private def qFulltextSearch(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .filter(hasTok("merge"))
      .select("doc_id", "lang", "source", "n_chars")
      .orderBy("doc_id")

  private def qFulltextBool(spark: SparkSession, dir: String): DataFrame =
    // S2: AND / OR / NOT clause combination.
    Tables.documents(spark, dir)
      .filter(hasTok("scan") && (hasTok("merge") || hasTok("sort")) && !hasTok("spark"))
      .select("doc_id", "lang", "source")
      .orderBy("doc_id")

  private def qFilterRange(spark: SparkSession, dir: String): DataFrame =
    // S3: fq=field:[a TO b] — structured range predicates; both reach the
    // parquet scan as PushedFilters.
    Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= lit("1995-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1996-01-01").cast("timestamp") &&
        col("l_quantity").between(10, 20))
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
        round(col("l_extendedprice"), 2).as("price"))
      .orderBy("l_orderkey", "l_linenumber")

  private def qTopkRelevance(spark: SparkSession, dir: String): DataFrame = {
    // S4: TF relevance ranking. orderBy.limit compiles to
    // TakeOrderedAndProject — per-partition top-k, no global sort.
    val tf = Tables.documents(spark, dir)
      .select(col("doc_id"),
        size(filter(toks, t => t === "key")).cast("long").as("tf"))
    tf.filter(col("tf") > 0)
      .orderBy(col("tf").desc, col("doc_id"))
      .limit(20)
  }

  private def qSortPage(spark: SparkSession, dir: String): DataFrame = {
    // S5: sort + pagination (start=100, rows=20). Take the top 120 with
    // TakeOrderedAndProject first (scales: k rows to the driver, not a
    // global sort), then number the tiny result for the offset.
    val top = Tables.orders(spark, dir)
      .select("o_orderkey", "o_totalprice")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(120)
    top
      .withColumn("rn", row_number()
        .over(Window.orderBy(col("o_totalprice").desc, col("o_orderkey")))
        .cast("long"))
      .filter(col("rn") > 100)
      .select(col("o_orderkey"), round(col("o_totalprice"), 2).as("price"), col("rn"))
      .orderBy("rn")
  }

  val queries: Map[String, Q] = Map(
    "q_fulltext_search" -> qFulltextSearch,
    "q_fulltext_bool" -> qFulltextBool,
    "q_filter_range" -> qFilterRange,
    "q_topk_relevance" -> qTopkRelevance,
    "q_sort_page" -> qSortPage)

  val oracle: Map[String, String] = Map(
    "q_fulltext_search" ->
      """SELECT doc_id, lang, source, n_chars FROM documents
        |WHERE list_contains(string_split(text, ' '), 'merge') ORDER BY doc_id""".stripMargin,
    "q_fulltext_bool" ->
      """SELECT doc_id, lang, source FROM documents
        |WHERE list_contains(string_split(text, ' '), 'scan')
        |  AND (list_contains(string_split(text, ' '), 'merge')
        |       OR list_contains(string_split(text, ' '), 'sort'))
        |  AND NOT list_contains(string_split(text, ' '), 'spark')
        |ORDER BY doc_id""".stripMargin,
    "q_filter_range" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, round(l_extendedprice, 2) AS price
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1995-01-01' AND l_shipdate < TIMESTAMP '1996-01-01'
        |  AND l_quantity BETWEEN 10 AND 20
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q_topk_relevance" ->
      """SELECT doc_id, tf FROM (
        |  SELECT doc_id, len(list_filter(string_split(text, ' '), t -> t = 'key')) AS tf
        |  FROM documents) WHERE tf > 0
        |ORDER BY tf DESC, doc_id LIMIT 20""".stripMargin,
    "q_sort_page" ->
      """WITH r AS (
        |  SELECT o_orderkey, o_totalprice,
        |         row_number() OVER (ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |  FROM orders)
        |SELECT o_orderkey, round(o_totalprice, 2) AS price, rn
        |FROM r WHERE rn BETWEEN 101 AND 120 ORDER BY rn""".stripMargin)
}
