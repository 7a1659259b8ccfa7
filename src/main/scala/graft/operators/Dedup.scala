package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Deduplication family for training-data pipelines (driver contract;
  * SURVEY.md §2.C X1/X2): exact content-hash dedup, n-gram Jaccard
  * near-dup, MinHash+LSH candidate generation, SimHash hamming near-dup,
  * and embedding-cosine near-dup with sign-LSH blocking (in Vectors.scala's
  * data but implemented here with the other dedup shapes).
  *
  * Every variant avoids the O(n²) all-pairs join — the only thing that
  * matters at 100 TB:
  *  - exact: one hash-aggregate on md5(text);
  *  - n-gram Jaccard: inverted shingle join with a document-frequency cap
  *    (super-frequent shingles are dropped before the pair join, bounding
  *    per-shingle fan-out; the cap is part of the operator's semantics and
  *    mirrored in the oracle);
  *  - MinHash+LSH: fixed 8-permutation signature (min over md5 with per-
  *    permutation salt — a valid min-wise hash family), banded 4×2 so the
  *    pair join only touches band-bucket collisions;
  *  - SimHash: 32-bit fingerprint, 4×8-bit bands — pairs at hamming ≤ 3
  *    are guaranteed to collide in ≥ 1 band (pigeonhole), so blocking is
  *    lossless for the declared threshold.
  *
  * All hashing is md5 (identical lowercase hex in Spark and DuckDB), which
  * keeps each operator bit-for-bit oracle-checkable — no JVM-private hash
  * functions in semantics-bearing positions.
  */
object Dedup {
  type Q = (SparkSession, String) => DataFrame

  /** Document-frequency cap for the shingle inverted index: shingles
    * occurring in more docs than this carry no near-dup signal but create
    * quadratic fan-out in the pair join. */
  private val DfCap = 200

  private def qDedupExact(spark: SparkSession, dir: String): DataFrame =
    // X1: exact dedup via content hash; survivor = min doc_id per hash.
    Tables.documents(spark, dir)
      .groupBy(md5(col("text")).as("h"))
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_dups"))
      .orderBy("keep_id")

  /** Shingle index with the DF cap applied (shared by Jaccard + MinHash). */
  private def cappedShingles(docs: DataFrame): DataFrame = {
    val sh = TextAnalysis.shingles(docs)
    val kept = sh.groupBy("s").agg(count(lit(1)).as("df"))
      .filter(col("df") <= DfCap).select("s")
    sh.join(kept, "s")
  }

  private def qDedupNgram(spark: SparkSession, dir: String): DataFrame = {
    // X2a: n-gram (3-shingle) Jaccard similarity over the inverted index.
    val shk = cappedShingles(Tables.documents(spark, dir))
    val cnt = shk.groupBy("doc_id").agg(count(lit(1)).as("nsh"))
    val pairs = shk.as("a").join(shk.as("b"),
        col("a.s") === col("b.s") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("da"), col("b.doc_id").as("db"))
      .agg(count(lit(1)).as("c"))
    val ca = cnt.select(col("doc_id").as("da"), col("nsh").as("na"))
    val cb = cnt.select(col("doc_id").as("db"), col("nsh").as("nb"))
    pairs.join(ca, "da").join(cb, "db")
      .withColumn("jaccard", round(col("c") / (col("na") + col("nb") - col("c")), 4))
      .filter(col("jaccard") >= 0.8)
      .select("da", "db", "jaccard")
      .orderBy("da", "db")
  }

  private def qDedupMinhash(spark: SparkSession, dir: String): DataFrame = {
    // X2b: MinHash (8 salted-md5 permutations) + LSH (4 bands × 2 rows).
    val sh = cappedShingles(Tables.documents(spark, dir))
    val mins = (0 until 8).map(i =>
      min(md5(concat(lit(s"$i:"), col("s")))).as(s"m$i"))
    val sig = sh.groupBy("doc_id").agg(mins.head, mins.tail: _*)
    val bands = sig.select(col("doc_id"),
      md5(concat(col("m0"), col("m1"))).as("b0"),
      md5(concat(col("m2"), col("m3"))).as("b1"),
      md5(concat(col("m4"), col("m5"))).as("b2"),
      md5(concat(col("m6"), col("m7"))).as("b3"))
    val unp = bands.selectExpr("doc_id",
      "stack(4, 0, b0, 1, b1, 2, b2, 3, b3) AS (bi, bv)")
    unp.as("a").join(unp.as("b"),
        col("a.bi") === col("b.bi") && col("a.bv") === col("b.bv") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("da"), col("b.doc_id").as("db"))
      .distinct()
      .orderBy("da", "db")
  }

  private def qDedupSimhash(spark: SparkSession, dir: String): DataFrame = {
    // X2c: 32-bit SimHash. Bit j of the fingerprint is the sign of the sum,
    // over all token occurrences, of ±1 according to bit j of md5(token)
    // (the high bit of hex digit j — '8'..'f'). Weighted by multiplicity,
    // the classic Charikar construction.
    val toksMd5 = Tables.documents(spark, dir)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
      .select(col("doc_id"), md5(col("tok")).as("h"))
    val bitSums = (1 to 32).map(j =>
      sum(when(substring(col("h"), j, 1) >= "8", 1).otherwise(-1)).as(s"s$j"))
    val sums = toksMd5.groupBy("doc_id").agg(bitSums.head, bitSums.tail: _*)
    val fpExpr = (1 to 32).map(j =>
      when(col(s"s$j") > 0, lit(1L << (j - 1))).otherwise(lit(0L))).reduce(_ + _)
    val fp = sums.select(col("doc_id"), fpExpr.as("fp"))
    val banded = fp.selectExpr("doc_id", "fp",
      """stack(4, 0, fp & 255, 1, shiftright(fp, 8) & 255,
        |         2, shiftright(fp, 16) & 255, 3, shiftright(fp, 24) & 255) AS (bi, bv)""".stripMargin)
    banded.as("a").join(banded.as("b"),
        col("a.bi") === col("b.bi") && col("a.bv") === col("b.bv") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("da"), col("b.doc_id").as("db"),
        col("a.fp").as("fa"), col("b.fp").as("fb"))
      .distinct()
      .withColumn("hamming", bit_count(col("fa").bitwiseXOR(col("fb"))).cast("long"))
      .filter(col("hamming") <= 3)
      .select("da", "db", "hamming")
      .orderBy("da", "db")
  }

  val queries: Map[String, Q] = Map(
    "q_dedup_exact" -> qDedupExact,
    "q_dedup_ngram" -> qDedupNgram,
    "q_dedup_minhash" -> qDedupMinhash,
    "q_dedup_simhash" -> qDedupSimhash)

  private val cappedCte: String = TextAnalysis.shingleCte +
    """,
      |kept AS (SELECT s FROM sh GROUP BY s HAVING count(*) <= 200),
      |shk AS (SELECT doc_id, s FROM sh JOIN kept USING (s))""".stripMargin

  private val simhashSumsSql: String =
    (1 to 32).map(j =>
      s"sum(CASE WHEN substr(h, $j, 1) >= '8' THEN 1 ELSE -1 END) AS s$j").mkString(",\n         ")

  private val simhashFpSql: String =
    (1 to 32).map(j => s"(CASE WHEN s$j > 0 THEN ${1L << (j - 1)} ELSE 0 END)").mkString(" + ")

  val oracle: Map[String, String] = Map(
    "q_dedup_exact" ->
      """SELECT md5(text) AS h, min(doc_id) AS keep_id, count(*) AS n_dups
        |FROM documents GROUP BY 1 ORDER BY keep_id""".stripMargin,
    "q_dedup_ngram" -> (cappedCte +
      """,
        |cnt AS (SELECT doc_id, count(*) AS nsh FROM shk GROUP BY 1),
        |pairs AS (
        |  SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS c
        |  FROM shk a JOIN shk b ON a.s = b.s AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2)
        |SELECT da, db, round(c * 1.0 / (ca.nsh + cb.nsh - c), 4) AS jaccard
        |FROM pairs JOIN cnt ca ON ca.doc_id = da JOIN cnt cb ON cb.doc_id = db
        |WHERE round(c * 1.0 / (ca.nsh + cb.nsh - c), 4) >= 0.8
        |ORDER BY da, db""".stripMargin),
    "q_dedup_minhash" -> (cappedCte +
      """,
        |sig AS (
        |  SELECT doc_id,
        |         min(md5('0:' || s)) AS m0, min(md5('1:' || s)) AS m1,
        |         min(md5('2:' || s)) AS m2, min(md5('3:' || s)) AS m3,
        |         min(md5('4:' || s)) AS m4, min(md5('5:' || s)) AS m5,
        |         min(md5('6:' || s)) AS m6, min(md5('7:' || s)) AS m7
        |  FROM shk GROUP BY doc_id),
        |bands AS (
        |  SELECT doc_id, md5(m0 || m1) AS b0, md5(m2 || m3) AS b1,
        |         md5(m4 || m5) AS b2, md5(m6 || m7) AS b3
        |  FROM sig),
        |unp AS (
        |  SELECT doc_id, 0 AS bi, b0 AS bv FROM bands
        |  UNION ALL SELECT doc_id, 1, b1 FROM bands
        |  UNION ALL SELECT doc_id, 2, b2 FROM bands
        |  UNION ALL SELECT doc_id, 3, b3 FROM bands)
        |SELECT DISTINCT a.doc_id AS da, b.doc_id AS db
        |FROM unp a JOIN unp b
        |  ON a.bi = b.bi AND a.bv = b.bv AND a.doc_id < b.doc_id
        |ORDER BY da, db""".stripMargin),
    "q_dedup_simhash" ->
      (s"""WITH h AS (
         |  SELECT doc_id, md5(tok) AS h
         |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents)),
         |s AS (
         |  SELECT doc_id,
         |         $simhashSumsSql
         |  FROM h GROUP BY doc_id),
         |f AS (SELECT doc_id, CAST($simhashFpSql AS BIGINT) AS fp FROM s),
         |u AS (
         |  SELECT doc_id, fp, 0 AS bi, fp & 255 AS bv FROM f
         |  UNION ALL SELECT doc_id, fp, 1, (fp >> 8) & 255 FROM f
         |  UNION ALL SELECT doc_id, fp, 2, (fp >> 16) & 255 FROM f
         |  UNION ALL SELECT doc_id, fp, 3, (fp >> 24) & 255 FROM f),
         |p AS (
         |  SELECT DISTINCT a.doc_id AS da, b.doc_id AS db, a.fp AS fa, b.fp AS fb
         |  FROM u a JOIN u b ON a.bi = b.bi AND a.bv = b.bv AND a.doc_id < b.doc_id)
         |SELECT da, db, CAST(bit_count(xor(fa, fb)) AS BIGINT) AS hamming
         |FROM p WHERE bit_count(xor(fa, fb)) <= 3
         |ORDER BY da, db""".stripMargin))
}
