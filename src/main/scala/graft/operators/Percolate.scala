package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Percolation — reverse search: a registry of STORED queries matched
  * against each incoming document (the Solr/Elasticsearch percolator, the
  * alerting face of the reference's search surface: instead of "which docs
  * match this query", "which standing queries match this doc"). A stored
  * query here is a conjunction of terms (the reference's default AND
  * semantics for multi-term Solr queries, SURVEY.md §2.B S2).
  *
  * Two physical strategies, chosen by registry size:
  *
  *  - [[matchesCompiled]] COMPILES the registry into the plan: one
  *    codegen'd boolean column per query (`array_contains` conjunctions
  *    over the doc's token array), no shuffle, no join, STATELESS — safe
  *    under Structured Streaming append mode with zero state store, which
  *    makes it the per-batch alerting path in an ingest pipeline. Right
  *    while the registry fits a projection (hundreds of queries).
  *  - [[matches]] JOINS doc tokens against the exploded registry: distinct
  *    doc terms ⋈ broadcast(query terms), count matched terms per
  *    (doc, query), keep full-coverage pairs. The registry never touches
  *    the driver plan size, so it scales to millions of stored queries;
  *    the doc side shuffles once on the implicit group-by. This is the
  *    100 TB path — both sides are plain exchanges AQE can re-plan.
  *
  * PercolateSpec pins the two strategies equal on fixture data; the oracle
  * checks the join form against DuckDB every round.
  */
object Percolate {
  type Q = (SparkSession, String) => DataFrame

  /** A stored boolean query — the reference's S2 semantics turned
    * standing: every `all` term required, at least one `any` term (when
    * any are given), no `none` term present. */
  final case class StoredQuery(id: String, all: Seq[String],
                               any: Seq[String] = Nil,
                               none: Seq[String] = Nil) {
    require(all.nonEmpty || any.nonEmpty,
      s"stored query '$id' needs at least one positive term")
  }

  /** The fixed demo registry for the oracle key — term conjunctions over
    * the documents fixture's vocabulary. */
  val demoQueries: Seq[(String, Seq[String])] = Seq(
    "alert_spark_join" -> Seq("spark", "join"),
    "alert_slow_query" -> Seq("slow", "query"),
    "alert_vector_merge" -> Seq("vector", "merge", "fast"))

  private def conjunctions(qs: Seq[(String, Seq[String])]): Seq[StoredQuery] =
    qs.map { case (id, terms) => StoredQuery(id, terms) }

  private def tokenized(docs: DataFrame,
                        tokenize: Column => Column): DataFrame =
    docs.select(col("doc_id"),
      array_distinct(tokenize(col("text"))).as("toks"))

  /** Registry compiled into the plan: (doc_id, query_id) match pairs via
    * per-query boolean conditions — stateless, shuffle-free,
    * streaming-safe. `tokenize` must be the SAME analyzer the matched
    * corpus is indexed with (a CJK corpus percolated with the whitespace
    * default would silently never match). */
  def matchesCompiled(docs: DataFrame, queries: Seq[(String, Seq[String])],
                      tokenize: Column => Column = split(_, " ")): DataFrame =
    matchesCompiledBool(docs, conjunctions(queries), tokenize)

  def matchesCompiledBool(docs: DataFrame, queries: Seq[StoredQuery],
                          tokenize: Column => Column = split(_, " ")): DataFrame = {
    require(queries.nonEmpty, "percolate needs at least one stored query")
    def has(t: String): Column = array_contains(col("toks"), t)
    val hits: Column = array(queries.map { q =>
      val allOk = q.all.map(has).foldLeft(lit(true))(_ && _)
      val anyOk =
        if (q.any.isEmpty) lit(true) else q.any.map(has).reduce(_ || _)
      val noneOk = q.none.map(t => !has(t)).foldLeft(lit(true))(_ && _)
      when(allOk && anyOk && noneOk, lit(q.id))
    }: _*)
    tokenized(docs, tokenize).select(col("doc_id"),
      explode(filter(hits, _.isNotNull)).as("query_id"))
  }

  /** Registry joined as data: scales to registries too large to compile
    * into a projection. One broadcast of the (small) exploded role-tagged
    * registry, one conditional aggregate keyed (doc_id, query_id):
    * all-coverage == |all|, ≥1 any hit (when any exist), zero none hits. */
  def matches(docs: DataFrame, queries: Seq[(String, Seq[String])],
              tokenize: Column => Column = split(_, " ")): DataFrame =
    matchesBool(docs, conjunctions(queries), tokenize)

  /** A registry exploded to (query_id, term, role) rows — the one
    * serialization both the join strategy and the pipeline's persisted
    * registry use, so match semantics and storage can never desync. */
  def explodeRoles(queries: Seq[StoredQuery]): Seq[(String, String, String)] =
    queries.flatMap { q =>
      q.all.distinct.map(t => (q.id, t, "all")) ++
        q.any.distinct.map(t => (q.id, t, "any")) ++
        q.none.distinct.map(t => (q.id, t, "none"))
    }

  def matchesBool(docs: DataFrame, queries: Seq[StoredQuery],
                  tokenize: Column => Column = split(_, " ")): DataFrame = {
    require(queries.nonEmpty, "percolate needs at least one stored query")
    val spark = docs.sparkSession
    import spark.implicits._
    val reg = explodeRoles(queries).toDF("query_id", "term", "role")
    val sizes = queries.map(q =>
      (q.id, q.all.distinct.size.toLong, q.any.distinct.size.toLong))
      .toDF("query_id", "n_all", "n_any")
    tokenized(docs, tokenize)
      .select(col("doc_id"), explode(col("toks")).as("term"))
      .join(broadcast(reg), "term")
      .groupBy("doc_id", "query_id")
      .agg(
        count(when(col("role") === "all", 1)).as("hit_all"),
        count(when(col("role") === "any", 1)).as("hit_any"),
        count(when(col("role") === "none", 1)).as("hit_none"))
      .join(broadcast(sizes), "query_id")
      .filter(col("hit_all") === col("n_all") &&
        (col("n_any") === 0 || col("hit_any") > 0) &&
        col("hit_none") === 0)
      .select("doc_id", "query_id")
  }

  private def qPercolate(spark: SparkSession, dir: String): DataFrame =
    matches(Tables.documents(spark, dir), demoQueries)
      .groupBy("query_id")
      .agg(count(lit(1)).as("n_docs"))
      .orderBy("query_id")

  /** The boolean registry for the second oracle key — every role
    * populated. */
  val demoBoolQueries: Seq[StoredQuery] = Seq(
    StoredQuery("need_spark_not_slow", all = Seq("spark"),
      none = Seq("slow")),
    StoredQuery("joins_or_merges_no_error", all = Seq("table"),
      any = Seq("join", "merge"), none = Seq("error")),
    StoredQuery("any_vector_family", all = Nil,
      any = Seq("vector", "centroid")))

  private def qPercolateBool(spark: SparkSession, dir: String): DataFrame =
    matchesBool(Tables.documents(spark, dir), demoBoolQueries)
      .groupBy("query_id")
      .agg(count(lit(1)).as("n_docs"))
      .orderBy("query_id")

  val queries: Map[String, Q] = Map(
    "q_percolate" -> qPercolate,
    "q_percolate_bool" -> qPercolateBool)

  val oracle: Map[String, String] = Map(
    "q_percolate" ->
      """WITH reg(query_id, term) AS (
        |  SELECT * FROM (VALUES
        |    ('alert_spark_join', 'spark'), ('alert_spark_join', 'join'),
        |    ('alert_slow_query', 'slow'), ('alert_slow_query', 'query'),
        |    ('alert_vector_merge', 'vector'), ('alert_vector_merge', 'merge'),
        |    ('alert_vector_merge', 'fast'))),
        |sizes AS (SELECT query_id, count(*) AS n_terms FROM reg GROUP BY 1),
        |toks AS (
        |  SELECT DISTINCT doc_id, tok FROM (
        |    SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents)),
        |hits AS (
        |  SELECT t.doc_id, r.query_id
        |  FROM toks t JOIN reg r ON t.tok = r.term
        |  JOIN sizes s ON s.query_id = r.query_id
        |  GROUP BY t.doc_id, r.query_id, s.n_terms
        |  HAVING count(*) = s.n_terms)
        |SELECT query_id, count(*) AS n_docs FROM hits
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_percolate_bool" ->
      """WITH reg(query_id, term, role) AS (
        |  SELECT * FROM (VALUES
        |    ('need_spark_not_slow', 'spark', 'all'),
        |    ('need_spark_not_slow', 'slow', 'none'),
        |    ('joins_or_merges_no_error', 'table', 'all'),
        |    ('joins_or_merges_no_error', 'join', 'any'),
        |    ('joins_or_merges_no_error', 'merge', 'any'),
        |    ('joins_or_merges_no_error', 'error', 'none'),
        |    ('any_vector_family', 'vector', 'any'),
        |    ('any_vector_family', 'centroid', 'any'))),
        |sizes AS (
        |  SELECT query_id,
        |         count(*) FILTER (WHERE role = 'all') AS n_all,
        |         count(*) FILTER (WHERE role = 'any') AS n_any
        |  FROM reg GROUP BY 1),
        |toks AS (
        |  SELECT DISTINCT doc_id, tok FROM (
        |    SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents)),
        |hits AS (
        |  SELECT t.doc_id, r.query_id,
        |         count(*) FILTER (WHERE r.role = 'all') AS hit_all,
        |         count(*) FILTER (WHERE r.role = 'any') AS hit_any,
        |         count(*) FILTER (WHERE r.role = 'none') AS hit_none
        |  FROM toks t JOIN reg r ON t.tok = r.term
        |  GROUP BY 1, 2),
        |m AS (
        |  SELECT h.doc_id, h.query_id
        |  FROM hits h JOIN sizes s USING (query_id)
        |  WHERE h.hit_all = s.n_all AND (s.n_any = 0 OR h.hit_any > 0)
        |    AND h.hit_none = 0)
        |SELECT query_id, count(*) AS n_docs FROM m
        |GROUP BY 1 ORDER BY 1""".stripMargin)
}
