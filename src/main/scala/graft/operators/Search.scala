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

  // Tokenization goes through the Analyzer seam (the Solr schema's
  // analyzer role); the query map pins the corpus-default whitespace
  // analyzer, whose expression is identical to the former hard-coded
  // split — the oracles are untouched. CJK corpora pass Analyzer.Cjk.
  private def toks = Analyzer.default.tokens(col("text"))
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

  private def qFunctionBoost(spark: SparkSession, dir: String): DataFrame = {
    // S4 (function-query flavor): Solr's boost/bf surface — the text
    // relevance signal multiplied by a field FUNCTION, here the classic
    // recip(x, m, a, b) = a/(m·x+b) decay on a numeric field (Solr boosts
    // recency with exactly this shape over a date's age; n_chars is this
    // corpus's decay field). Same scan-project-TakeOrdered plan as the
    // plain ranking: function queries add arithmetic, never a join.
    Tables.documents(spark, dir)
      .select(col("doc_id"),
        size(filter(toks, t => t === "key")).cast("long").as("tf"),
        col("n_chars"))
      .filter(col("tf") > 0)
      .withColumn("score",
        round(col("tf") * lit(100.0) / (col("n_chars") + lit(100.0)), 4))
      .select(col("doc_id"), col("tf"), col("score"))
      .orderBy(col("score").desc, col("doc_id"))
      .limit(20)
  }

  /** Editorial pins for [[qElevate]] — Solr's elevate.xml maps a query
    * text to doc ids forced to the top in the given order. Ids chosen
    * inside every SF's doc_id range so all scales exercise the surface. */
  private val elevatedIds = Seq(42L -> 1, 7L -> 2, 19L -> 3)

  private def qElevate(spark: SparkSession, dir: String): DataFrame = {
    // Solr QueryElevationComponent: elevated docs first in EDITORIAL
    // order (included even when they don't match the query — the
    // component's default), then the organic relevance ranking. One
    // broadcast hash join tags elevation positions onto the tf scan —
    // the elevation map is editorial config, bounded and tiny — and the
    // combined (elev_pos NULLS LAST, tf DESC) order compiles to a single
    // TakeOrderedAndProject; the final row_number runs over the 20-row
    // page only (qSortPage's numbering pattern), never the corpus.
    import spark.implicits._
    val elev = broadcast(elevatedIds.toDF("doc_id", "elev_pos"))
    val ord = Seq(coalesce(col("elev_pos"), lit(Int.MaxValue)).asc,
      col("tf").desc, col("doc_id").asc)
    Tables.documents(spark, dir)
      .select(col("doc_id"),
        size(filter(toks, t => t === "key")).cast("long").as("tf"))
      .join(elev, Seq("doc_id"), "left")
      .filter(col("tf") > 0 || col("elev_pos").isNotNull)
      .orderBy(ord: _*)
      .limit(20)
      .withColumn("rank", row_number().over(Window.orderBy(ord: _*)).cast("long"))
      .select(col("rank"), col("doc_id"), col("tf"),
        col("elev_pos").isNotNull.as("elevated"))
      .orderBy("rank")
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

  /** Keyset (cursor) page: the top `n` rows strictly AFTER the cursor in
    * `(sortCol DESC, keyCol ASC)` order — Solr's `cursorMark`, the deep-
    * paging form the delegated read surface needs because `start`/`rows`
    * offset paging re-sorts the whole prefix at depth (an offset-10⁶ page
    * at 100 TB sorts a million rows to throw them away; the cursor form
    * reads one page regardless of depth). The cursor predicate is a plain
    * comparison on scan columns, so it pushes to the parquet scan
    * (row-group pruning on the sort column), and the page itself is a
    * TakeOrderedAndProject — per-partition top-k, k rows to the driver.
    * Page N+1's cursor is page N's last `(sortVal, keyVal)`.
    *
    * Rows with a NULL sort value are excluded from EVERY page (first page
    * included): a null sorts after all values in the DESC order but is
    * not addressable by a `(Double, Long)` cursor, so including it on
    * page 1 and silently dropping it after the first cursor would make
    * end-of-chain lie about end-of-data. Solr's cursorMark likewise
    * requires a sortable, present field; the paged set here is defined as
    * the non-null-sort rows, and the page-chain ≡ offset-pages invariant
    * (PlanSpec) holds over exactly that set. */
  def cursorPage(df: DataFrame, sortCol: String, keyCol: String, n: Int,
                 cursor: Option[(Double, Long)] = None): DataFrame = {
    val nonNull = df.filter(col(sortCol).isNotNull)
    cursor.fold(nonNull) { case (sv, kv) =>
      nonNull.filter(col(sortCol) < sv ||
        (col(sortCol) === sv && col(keyCol) > kv))
    }.orderBy(col(sortCol).desc, col(keyCol)).limit(n)
  }

  private def qCursorPage(spark: SparkSession, dir: String): DataFrame =
    // S5 deep-paging flavor: one page AFTER a fixed cursor — the query a
    // client issues with the cursorMark a previous page returned.
    cursorPage(Tables.orders(spark, dir).select("o_orderkey", "o_totalprice"),
        "o_totalprice", "o_orderkey", 20, Some((150000.0, 1000L)))
      .select(col("o_orderkey"), round(col("o_totalprice"), 2).as("price"))

  private def qHighlight(spark: SparkSession, dir: String): DataFrame =
    // Solr highlighting, the structural core: per-document 1-based term
    // positions of the matched token (the snippet builder consumes these).
    // posexplode (a codegen'd generate) + filter + collect beats the
    // index-lambda formulation (`filter(sequence(1, size(t)), i ->
    // element_at(t, i) = …)`) ~8×: the latter interprets a lambda per
    // position per row. sort_array makes the collect order deterministic.
    // The position list is emitted as a canonical comma-joined string, not
    // ARRAY<BIGINT>: a scalar column hashes in any downstream comparator,
    // and the encoding is order-preserving and unambiguous.
    Tables.documents(spark, dir)
      .select(col("doc_id"), posexplode(toks).as(Seq("i", "tok")))
      .filter(col("tok") === "merge")
      .groupBy("doc_id")
      .agg(sort_array(collect_list((col("i") + 1).cast("long"))).as("pos_arr"))
      .select(col("doc_id"),
        array_join(col("pos_arr").cast("array<string>"), ",").as("positions"),
        size(col("pos_arr")).cast("long").as("n_hits"))
      .orderBy("doc_id")

  private def qHighlightSnippet(spark: SparkSession, dir: String): DataFrame =
    // Solr highlighting's actual payload: a text fragment around each hit
    // (hl.fragsize in token terms — ±3 tokens here), one row per hit.
    // The token array is computed once per row and shared by the position
    // explode and the fragment slice; the slice bounds clamp at the
    // document edges. Everything is codegen'd built-ins over the row's own
    // array — embarrassingly parallel, no joins, no index needed (snippet
    // build happens on the already-matched hit set in a real pipeline).
    Tables.documents(spark, dir)
      .select(col("doc_id"), Analyzer.default.tokens(col("text")).as("t"))
      .select(col("doc_id"), col("t"), posexplode(col("t")).as(Seq("i", "tok")))
      .filter(col("tok") === "merge")
      .select(col("doc_id"), (col("i") + 1).cast("long").as("pos"),
        array_join(expr(
          "slice(t, greatest(i + 1 - 3, 1), least(i + 1 + 3, size(t)) - greatest(i + 1 - 3, 1) + 1)"),
          " ").as("snippet"))
      .orderBy("doc_id", "pos")

  private def qMoreLikeThis(spark: SparkSession, dir: String): DataFrame =
    // Solr MoreLikeThis: rank documents by distinct-term overlap with a
    // seed document — served ENTIRELY from the standing index. The seed's
    // term set is the posting rows whose id list contains the seed doc;
    // exploding just those rows' postings counts, per other doc, the
    // number of shared distinct terms. No corpus scan, no join at all:
    // per-query work is Σ df(seed term) posting entries.
    Index.sharedPostings(spark, dir)
      .filter(array_contains(col("ids"), lit(0L)))
      .select(explode(col("ids")).as("doc_id"))
      .filter(col("doc_id") =!= 0)
      .groupBy("doc_id")
      .agg(count(lit(1)).as("overlap"))
      .orderBy(col("overlap").desc, col("doc_id"))
      .limit(10)

  private def qSuggestPrefix(spark: SparkSession, dir: String): DataFrame =
    // Solr suggester: prefix-ranked completion candidates with corpus
    // frequencies — a pure vocabulary query, answered from the
    // MATERIALIZED posting lists' occurrence counts (Solr's suggester
    // likewise reads the standing index/FST, never the stored docs). The
    // prefix filter runs once per DISTINCT vocabulary term over cached
    // blocks; zero corpus file scans (PlanSpec pins this).
    Index.sharedPostings(spark, dir)
      .filter(col("tok").startsWith("s"))
      .select(col("tok"), col("n"))
      .orderBy(col("n").desc, col("tok"))
      .limit(10)

  private def qPhraseSearch(spark: SparkSession, dir: String): DataFrame =
    // Solr phrase query ("merge sort"~0): adjacent-token match. For a
    // whitespace analyzer, phrase containment over the token stream is
    // EXACTLY substring containment of the space-joined phrase against the
    // space-padded text — one codegen'd Contains per row, no explode, no
    // positions join. (Position-list adjacency is the general-analyzer
    // path; the padded-contains form is the classic equivalent.)
    Tables.documents(spark, dir)
      .filter(concat(lit(" "), col("text"), lit(" ")).contains(" merge sort "))
      .select("doc_id", "lang", "source")
      .orderBy("doc_id")

  private def qSpellCorrect(spark: SparkSession, dir: String): DataFrame =
    // Solr SpellCheckComponent: correction candidates for a misspelled
    // query term = vocabulary terms within edit distance 1, ranked by
    // corpus frequency. The levenshtein scan runs over the MATERIALIZED
    // vocabulary (the posting lists' tok/n columns) — once per distinct
    // term over cached blocks, never per token occurrence, and with zero
    // corpus file scans (PlanSpec pins this).
    Index.sharedPostings(spark, dir)
      .filter(levenshtein(col("tok"), lit("mirge")) <= 1)
      .select(col("tok"), col("n"))
      .orderBy(col("n").desc, col("tok"))
      .limit(5)

  private def qFuzzySearch(spark: SparkSession, dir: String): DataFrame = {
    // Solr fuzzy query (term~1): documents containing a token within edit
    // distance 1 of the query term. levenshtein is a built-in with
    // identical semantics in Spark and DuckDB, so even fuzzy match is
    // oracle-checkable. Production shape (vs the naive scan-side
    // exists(levenshtein) over every token of every row): expand the query
    // term against the MATERIALIZED posting lists (Index.sharedPostings) —
    // the edit-distance scan runs once per distinct vocabulary term over
    // cached blocks, bounded by |vocab|, not once per token occurrence
    // over 100 TB — then hit the posting lists with the (tiny) expansion
    // set and fetch matched docs by key. Reading the persisted artifact
    // also removes the old `|| df < 0` optimizer-barrier hack: with no
    // aggregate left in this plan, there is nothing for Catalyst to push
    // the levenshtein predicate beneath. PlanSpec pins the shape.
    val docs = Tables.documents(spark, dir)
    // (no distinct on the exploded ids: the left_semi join deduplicates —
    // an aggregate here would just add a shuffle)
    val hits = Index.sharedPostings(spark, dir)
      .filter(levenshtein(col("tok"), lit("merge")) <= 1)
      .select(explode(col("ids")).as("doc_id"))
    docs.join(hits, Seq("doc_id"), "left_semi")
      .select("doc_id", "lang", "source")
      .orderBy("doc_id")
  }

  /** The manufactured CJK corpus with its analyzed term vectors,
    * MATERIALIZED once per session. The reference is a Chinese-language
    * system (/root/reference/README.md:5-6) whose Solr schema analyzes
    * space-free han prose — Lucene's CJKAnalyzer emits overlapping
    * character bigrams; re-running that analyzer per query is the cost
    * the Solr index exists to avoid, so the analyzed term vectors (and the
    * posting lists derived from them, [[cjkPostings]]) are session
    * artifacts every CJK query reads. The fixture corpus is
    * space-delimited, so both engines manufacture the CJK shape
    * identically: docs with doc_id % 3 == 0 keep their text (the
    * whitespace branch), the rest have spaces removed (space-free prose —
    * the bigram branch); Analyzer.Cjk branches per row on `contains(' ')`,
    * and the oracles mirror that same branch. */
  private def cjkTermVectors(spark: SparkSession, dir: String): DataFrame =
    Materialize.artifact(spark, "cjk_term_vectors", dir) {
      val z = when(col("doc_id") % 3 === 0, col("text"))
        .otherwise(regexp_replace(col("text"), " ", ""))
      Tables.documents(spark, dir)
        .select(col("doc_id"), Analyzer.Cjk.tokens(z).as("terms"))
    }

  /** Bigram posting lists over the CJK term vectors — the inverted-index
    * artifact a CJK term query touches instead of the corpus. */
  private def cjkPostings(spark: SparkSession, dir: String): DataFrame =
    Materialize.artifact(spark, "cjk_postings", dir)(
      cjkTermVectors(spark, dir)
        .select(col("doc_id"), explode(col("terms")).as("tok"))
        .groupBy("tok")
        .agg(sort_array(collect_set(col("doc_id"))).as("ids"),
          countDistinct(col("doc_id")).as("df")))

  private def qFulltextCjk(spark: SparkSession, dir: String): DataFrame =
    // Every row of the corpus oracle-checks BOTH analyzer paths: term
    // count and the term frequency of the 2-char query "rg" — computed
    // over the materialized term vectors, not a fresh analyzer pass.
    cjkTermVectors(spark, dir)
      .select(col("doc_id"),
        size(col("terms")).cast("long").as("n_terms"),
        size(filter(col("terms"), t => t === "rg")).cast("long").as("tf"))
      .orderBy("doc_id")

  private def qCjkSearch(spark: SparkSession, dir: String): DataFrame = {
    // CJK term search — the reference's actual read path for its actual
    // language context: the query bigram hits the MATERIALIZED posting
    // list (|postings("rg")| rows, not a corpus scan), then matched docs
    // are fetched by key (search-then-fetch, semi-join). The maintained
    // streaming form of the same index is IncrementalPostings.start with
    // Analyzer.Cjk.tokens as the tokenize function.
    val hits = cjkPostings(spark, dir)
      .filter(col("tok") === "rg")
      .select(explode(col("ids")).as("doc_id"))
    Tables.documents(spark, dir)
      .join(hits, Seq("doc_id"), "left_semi")
      .select("doc_id", "lang", "source")
      .orderBy("doc_id")
  }

  private def qFulltextFolded(spark: SparkSession, dir: String): DataFrame = {
    // S1 through the full text_general analyzer chain (tokenize →
    // lowercase → stop), the reference Solr schema's standard latin
    // configuration. The fixture corpus is already lowercase, so case
    // folding is exercised by upper-casing the text identically in both
    // engines first; the stop list is the engine's standard five. Every
    // row oracle-checks both stages: the stop-filtered term count and the
    // folded tf of "merge".
    val chain = Analyzer.textGeneral(Seq("the", "a", "of", "and", "in"))
    val terms = chain.tokens(upper(col("text")))
    Tables.documents(spark, dir)
      .select(col("doc_id"),
        size(terms).cast("long").as("n_terms"),
        size(filter(terms, t => t === "merge")).cast("long").as("tf"))
      .orderBy("doc_id")
  }

  /** Synonym config for the synonym-search keys — Solr's synonyms.txt
    * shape, bounded analyzer CONFIG (the reference's pre-defined schema
    * story, /root/reference/README.md:33). Neither "quick" nor "combine"
    * occurs in the fixture corpus, so un-expanded search returns nothing:
    * the keys prove the expansion is doing the matching. */
  private[operators] val demoSynonyms: Seq[(String, Seq[String])] =
    Seq("quick" -> Seq("fast"), "combine" -> Seq("merge", "join"))
  private[operators] val synonymQueryTerms: Seq[String] = Seq("quick", "combine")

  private def qSynonymSearch(spark: SparkSession, dir: String): DataFrame = {
    // S1 with query-time synonym expansion (Solr SynonymGraphFilter on
    // the query analyzer): each query term becomes an OR group, groups
    // AND together. Served from the materialized posting lists: per-group
    // posting union (|expansion| vocabulary rows), intersect via the
    // group-count aggregate, then the keyed corpus fetch — the index
    // stays unexpanded, matching Solr's query-time deployment, and no
    // corpus scan happens on the search side.
    val groups = Analyzer.expandQuery(synonymQueryTerms, demoSynonyms)
    val post = Index.sharedPostings(spark, dir)
    val perGroup = groups.zipWithIndex.map { case (g, i) =>
      post.filter(col("tok").isin(g: _*))
        .select(explode(col("ids")).as("doc_id")).distinct()
        .withColumn("grp", lit(i))
    }.reduce(_ unionByName _)
    val hits = perGroup.groupBy("doc_id")
      .agg(count(lit(1)).as("ng"))
      .filter(col("ng") === groups.size)
      .select("doc_id")
    Tables.documents(spark, dir).join(broadcast(hits), "doc_id")
      .select("doc_id", "lang", "source")
      .orderBy("doc_id")
  }

  private def qWildcardSearch(spark: SparkSession, dir: String): DataFrame = {
    // S1 (wildcard flavor): Solr `q=text:s*` — docs containing ANY term
    // with the prefix. Served from the materialized postings: the prefix
    // scans the VOCABULARY (Solr's term-dictionary range scan — bounded
    // by |vocab|, not the corpus), matched terms' posting lists union,
    // and the corpus is touched only by the final keyed fetch.
    val post = Index.sharedPostings(spark, dir)
    val hits = post.filter(col("tok").startsWith("s"))
      .select(explode(col("ids")).as("doc_id")).distinct()
    Tables.documents(spark, dir).join(broadcast(hits), "doc_id")
      .select("doc_id", "lang", "source")
      .orderBy("doc_id")
  }

  private def qMinShouldMatch(spark: SparkSession, dir: String): DataFrame = {
    // S2 (edismax mm): docs matching at least 2 of the 3 query terms,
    // match count carried — the middle ground between AND (all) and OR
    // (any) that real Solr deployments tune. One posting read, one
    // count-distinct aggregate; no corpus scan.
    val terms = Seq("merge", "sort", "scan")
    Index.sharedPostings(spark, dir)
      .filter(col("tok").isin(terms: _*))
      .select(col("tok"), explode(col("ids")).as("doc_id"))
      .groupBy("doc_id")
      .agg(countDistinct(col("tok")).as("n_matched"))
      .filter(col("n_matched") >= 2)
      .orderBy("doc_id")
  }

  val queries: Map[String, Q] = Map(
    "q_wildcard_search" -> qWildcardSearch,
    "q_min_should_match" -> qMinShouldMatch,
    "q_synonym_search" -> qSynonymSearch,
    "q_fulltext_search" -> qFulltextSearch,
    "q_fulltext_cjk" -> qFulltextCjk,
    "q_cjk_search" -> qCjkSearch,
    "q_fulltext_folded" -> qFulltextFolded,
    "q_fuzzy_search" -> qFuzzySearch,
    "q_fulltext_bool" -> qFulltextBool,
    "q_filter_range" -> qFilterRange,
    "q_topk_relevance" -> qTopkRelevance,
    "q_function_boost" -> qFunctionBoost,
    "q_elevate" -> qElevate,
    "q_phrase_search" -> qPhraseSearch,
    "q_spell_correct" -> qSpellCorrect,
    "q_sort_page" -> qSortPage,
    "q_cursor_page" -> qCursorPage,
    "q_highlight" -> qHighlight,
    "q_highlight_snippet" -> qHighlightSnippet,
    "q_more_like_this" -> qMoreLikeThis,
    "q_suggest_prefix" -> qSuggestPrefix)

  val oracle: Map[String, String] = Map(
    "q_wildcard_search" ->
      """SELECT doc_id, lang, source FROM documents
        |WHERE len(list_filter(string_split(text, ' '),
        |                      t -> starts_with(t, 's'))) > 0
        |ORDER BY doc_id""".stripMargin,
    "q_min_should_match" ->
      """SELECT doc_id, n_matched FROM (
        |  SELECT doc_id, count(DISTINCT tok) AS n_matched
        |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
        |        FROM documents)
        |  WHERE tok IN ('merge', 'sort', 'scan')
        |  GROUP BY doc_id)
        |WHERE n_matched >= 2
        |ORDER BY doc_id""".stripMargin,
    "q_synonym_search" ->
      """SELECT doc_id, lang, source FROM documents
        |WHERE (list_contains(string_split(text, ' '), 'quick')
        |    OR list_contains(string_split(text, ' '), 'fast'))
        |  AND (list_contains(string_split(text, ' '), 'combine')
        |    OR list_contains(string_split(text, ' '), 'merge')
        |    OR list_contains(string_split(text, ' '), 'join'))
        |ORDER BY doc_id""".stripMargin,
    "q_fulltext_search" ->
      """SELECT doc_id, lang, source, n_chars FROM documents
        |WHERE list_contains(string_split(text, ' '), 'merge') ORDER BY doc_id""".stripMargin,
    "q_fulltext_cjk" ->
      """WITH z AS (
        |  SELECT doc_id,
        |         CASE WHEN doc_id % 3 = 0 THEN text
        |              ELSE replace(text, ' ', '') END AS zt
        |  FROM documents)
        |SELECT doc_id,
        |       CASE WHEN contains(zt, ' ') THEN len(string_split(zt, ' '))
        |            WHEN len(zt) <= 1 THEN 1
        |            ELSE len(zt) - 1 END AS n_terms,
        |       CASE WHEN contains(zt, ' ')
        |            THEN len(list_filter(string_split(zt, ' '), t -> t = 'rg'))
        |            ELSE len(list_filter(generate_series(1, len(zt) - 1),
        |                                 i -> substr(zt, i, 2) = 'rg')) END AS tf
        |FROM z ORDER BY doc_id""".stripMargin,
    "q_cjk_search" ->
      """WITH z AS (
        |  SELECT doc_id, lang, source,
        |         CASE WHEN doc_id % 3 = 0 THEN text
        |              ELSE replace(text, ' ', '') END AS zt
        |  FROM documents)
        |SELECT doc_id, lang, source FROM z
        |WHERE CASE WHEN contains(zt, ' ')
        |           THEN list_contains(string_split(zt, ' '), 'rg')
        |           ELSE len(zt) > 1
        |                AND len(list_filter(generate_series(1, len(zt) - 1),
        |                                    i -> substr(zt, i, 2) = 'rg')) > 0 END
        |ORDER BY doc_id""".stripMargin,
    "q_fulltext_folded" ->
      """WITH t AS (
        |  SELECT doc_id,
        |         list_filter(list_transform(string_split(upper(text), ' '),
        |                                    x -> lower(x)),
        |                     x -> x NOT IN ('the', 'a', 'of', 'and', 'in')) AS terms
        |  FROM documents)
        |SELECT doc_id, len(terms) AS n_terms,
        |       len(list_filter(terms, x -> x = 'merge')) AS tf
        |FROM t ORDER BY doc_id""".stripMargin,
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
    "q_function_boost" ->
      """SELECT doc_id, tf, round(tf * 100.0 / (n_chars + 100.0), 4) AS score
        |FROM (
        |  SELECT doc_id, n_chars,
        |         len(list_filter(string_split(text, ' '), t -> t = 'key')) AS tf
        |  FROM documents) WHERE tf > 0
        |ORDER BY score DESC, doc_id LIMIT 20""".stripMargin,
    "q_elevate" ->
      """WITH elev(doc_id, elev_pos) AS (VALUES (42, 1), (7, 2), (19, 3)),
        |tf AS (
        |  SELECT doc_id, len(list_filter(string_split(text, ' '), t -> t = 'key')) AS tf
        |  FROM documents),
        |page AS (
        |  SELECT t.doc_id, t.tf, e.elev_pos
        |  FROM tf t LEFT JOIN elev e ON t.doc_id = e.doc_id
        |  WHERE t.tf > 0 OR e.elev_pos IS NOT NULL
        |  ORDER BY coalesce(e.elev_pos, 2147483647), t.tf DESC, t.doc_id
        |  LIMIT 20)
        |SELECT row_number() OVER (ORDER BY coalesce(elev_pos, 2147483647),
        |                          tf DESC, doc_id) AS rank,
        |       doc_id, tf, elev_pos IS NOT NULL AS elevated
        |FROM page ORDER BY rank""".stripMargin,
    "q_fuzzy_search" ->
      """SELECT doc_id, lang, source FROM documents
        |WHERE len(list_filter(string_split(text, ' '),
        |                      t -> levenshtein(t, 'merge') <= 1)) > 0
        |ORDER BY doc_id""".stripMargin,
    "q_phrase_search" ->
      """SELECT doc_id, lang, source FROM documents
        |WHERE contains(' ' || text || ' ', ' merge sort ')
        |ORDER BY doc_id""".stripMargin,
    "q_spell_correct" ->
      """SELECT tok, count(*) AS n
        |FROM (SELECT unnest(string_split(text, ' ')) AS tok FROM documents)
        |GROUP BY tok HAVING levenshtein(tok, 'mirge') <= 1
        |ORDER BY n DESC, tok LIMIT 5""".stripMargin,
    "q_highlight" ->
      """SELECT doc_id, array_to_string(pos_arr, ',') AS positions,
        |       len(pos_arr) AS n_hits FROM (
        |  SELECT doc_id,
        |         list_filter(generate_series(1, len(string_split(text, ' '))),
        |                     i -> string_split(text, ' ')[i] = 'merge') AS pos_arr
        |  FROM documents)
        |WHERE len(pos_arr) > 0 ORDER BY doc_id""".stripMargin,
    "q_highlight_snippet" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |p AS (
        |  SELECT doc_id, t, i
        |  FROM t, unnest(generate_series(1, len(t))) AS g(i)
        |  WHERE t[i] = 'merge')
        |SELECT doc_id, CAST(i AS BIGINT) AS pos,
        |       array_to_string(list_slice(t, greatest(i - 3, 1), least(i + 3, len(t))), ' ') AS snippet
        |FROM p ORDER BY doc_id, pos""".stripMargin,
    "q_more_like_this" ->
      """WITH toks AS (
        |  SELECT DISTINCT doc_id, tok FROM (
        |    SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents)),
        |seed AS (SELECT tok FROM toks WHERE doc_id = 0)
        |SELECT doc_id, count(*) AS overlap
        |FROM toks JOIN seed USING (tok)
        |WHERE doc_id <> 0
        |GROUP BY doc_id ORDER BY overlap DESC, doc_id LIMIT 10""".stripMargin,
    "q_suggest_prefix" ->
      """SELECT tok, count(*) AS n
        |FROM (SELECT unnest(string_split(text, ' ')) AS tok FROM documents)
        |WHERE tok LIKE 's%'
        |GROUP BY tok ORDER BY n DESC, tok LIMIT 10""".stripMargin,
    "q_cursor_page" ->
      """SELECT o_orderkey, round(o_totalprice, 2) AS price
        |FROM orders
        |WHERE o_totalprice < 150000.0
        |   OR (o_totalprice = 150000.0 AND o_orderkey > 1000)
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 20""".stripMargin,
    "q_sort_page" ->
      """WITH r AS (
        |  SELECT o_orderkey, o_totalprice,
        |         row_number() OVER (ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |  FROM orders)
        |SELECT o_orderkey, round(o_totalprice, 2) AS price, rn
        |FROM r WHERE rn BETWEEN 101 AND 120 ORDER BY rn""".stripMargin)
}
