package graft

import java.nio.file.Files

/** Dedup family on a tiny synthetic corpus written to parquet (the query
  * functions take an sf directory, so the fixture mimics one). */
class DedupSpec extends SparkSpec {
  import spark.implicits._

  private lazy val dir: String = {
    val d = Files.createTempDirectory("graft_dedup").toString
    val base = "the quick brown fox jumps over the lazy dog again and again today"
    val docs = Seq(
      (0L, base, "en", "src0", base.length.toLong),
      (1L, base, "en", "src1", base.length.toLong),                  // exact dup of 0
      (2L, base.replace("today", "tomorrow"), "en", "src2", 0L),     // near dup of 0
      (3L, "completely different words entirely unrelated content here now", "en", "src3", 0L),
      (4L, "yet another separate document with its own vocabulary set", "en", "src4", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    docs.write.mode("overwrite").parquet(s"$d/documents.parquet")
    d
  }

  test("exact dedup groups identical texts under the min doc_id") {
    val rows = SparkEntry.queries("q_dedup_exact")(spark, dir).collect()
    val byKeep = rows.map(r => r.getAs[Long]("keep_id") -> r.getAs[Long]("n_dups")).toMap
    assert(byKeep(0L) === 2L) // docs 0 and 1 collapse
    assert(byKeep(3L) === 1L)
  }

  test("ngram jaccard finds the exact and near pair, not the unrelated ones") {
    val pairs = SparkEntry.queries("q_dedup_near")(spark, dir).collect()
      .map(r => (r.getAs[Long]("da"), r.getAs[Long]("db"))).toSet
    assert(pairs.contains((0L, 1L)))
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L))
  }

  test("clustering groups the near-dup trio under the min doc_id survivor") {
    val rows = SparkEntry.queries("q_dedup_cluster")(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("cluster_id"), r.getAs[Int]("is_survivor"))).toMap
    // docs 0,1,2 are mutual near-dups → one cluster, survivor 0
    assert(rows(0L) === (0L, 1))
    assert(rows(1L) === (0L, 0))
    assert(rows(2L) === (0L, 0))
    assert(!rows.contains(3L) && !rows.contains(4L)) // unrelated docs absent
  }

  test("clustering's small and large branches agree (threshold-forced)") {
    // The single-partition fast path is gated on the pair count; above the
    // threshold the pair partitioning is kept and each composition level
    // is deduplicated. Same propagation, same labels — forced here by
    // running the identical pair list through both branches.
    val pairs = Seq((0L, 1L), (1L, 2L), (5L, 6L), (7L, 8L), (8L, 9L))
      .toDF("da", "db")
    val small = graft.operators.Dedup.clusterFromPairs(pairs).collect().toSeq
    val large = graft.operators.Dedup.clusterFromPairs(pairs, smallLimit = 0L)
      .collect().toSeq
    assert(small === large)
    val labels = small.map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("cluster_id")).toMap
    assert(labels === Map(0L -> 0L, 1L -> 0L, 2L -> 0L,
      5L -> 5L, 6L -> 5L, 7L -> 7L, 8L -> 7L, 9L -> 7L))
  }

  test("minhash LSH surfaces identical docs as candidates") {
    val pairs = SparkEntry.queries("q_dedup_minhash")(spark, dir).collect()
      .map(r => (r.getAs[Long]("da"), r.getAs[Long]("db"))).toSet
    assert(pairs.contains((0L, 1L))) // identical signature → all bands match
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("char-5-gram near-dup pairs space-free CJK text; unrelated text not paired") {
    val docs = Seq(
      (1L, "我爱北京天安门广场"),    // 9 chars → 5 five-grams
      (2L, "我爱北京天安门广场啊"),  // superset: shares all 5 → j = 5/6 = 0.8333
      (3L, "完全不同的文本内容这里")) // disjoint
      .toDF("doc_id", "t")
    val got = graft.operators.Dedup.charNgramPairs(docs, 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got === Set((1L, 2L, 0.8333)))
    // under 5 chars: no grams, never paired
    val short = Seq((1L, "我爱北京"), (2L, "我爱北京")).toDF("doc_id", "t")
    assert(graft.operators.Dedup.charNgramPairs(short, 0.1).count() === 0L)
  }

  test("the sketch index has a maintained form: postings merge with charSketch converges to the batch build") {
    import org.apache.spark.sql.functions._
    import graft.streaming.IncrementalPostings
    val root = Files.createTempDirectory("graft_sketchM").toString + "/sketch"
    def merge(changes: DocChange*): Unit =
      IncrementalPostings.mergeBatch(spark, changes.toSeq.toDF(), root,
        tokenize = graft.operators.Dedup.charSketch)
    merge(
      DocChange("1", 0, "put", "我爱北京天安门广场"),
      DocChange("2", 1, "put", "我爱北京天安门广场啊"),
      DocChange("3", 2, "put", "完全不同的文本内容这里"))
    merge(
      DocChange("2", 3, "put", "换了一段新的内容文字"), // update: old sketch grams leave
      DocChange("3", 4, "delete", ""))
    def idxMap(df: org.apache.spark.sql.DataFrame): Map[String, Seq[Long]] =
      df.collect().map(r => r.getAs[String]("s") -> r.getSeq[Long](1).sorted).toMap
    val maintained = idxMap(IncrementalPostings.postings(spark, root)
      .select(col("tok").as("s"),
        sort_array(org.apache.spark.sql.functions.transform(col("ids"), _.cast("long"))).as("ids")))
    val want = idxMap(graft.operators.Dedup.charSketchIndex(Seq(
      (1L, "我爱北京天安门广场"), (2L, "换了一段新的内容文字")).toDF("doc_id", "t")))
    assert(maintained === want)
    assert(want.nonEmpty)
  }

  test("simhash: identical docs at hamming 0; unrelated docs not paired") {
    val rows = SparkEntry.queries("q_dedup_simhash")(spark, dir).collect()
      .map(r => (r.getAs[Long]("da"), r.getAs[Long]("db"), r.getAs[Long]("hamming")))
    assert(rows.exists(r => r._1 == 0L && r._2 == 1L && r._3 == 0L))
    assert(!rows.exists(r => r._1 == 3L || r._2 == 3L))
  }
}
