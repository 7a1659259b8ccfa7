package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.streaming.IncrementalPostings

/** Multi-field (edismax `qf`) retrieval: per-field postings with per-field
  * statistics, boost-weighted scoring, and the maintained state's
  * bucket-pruned read shape. The reference maps every HBase qualifier to
  * its own Solr field (HbaseSolrIndexCoprocesser.java:45-49), so
  * multi-field documents are its NATIVE shape. */
case class FieldDoc(rowkey: String, event_id: Long, op: String,
                    title: String, body: String)

class MultifieldSpec extends SparkSpec {
  import spark.implicits._

  private val fields = Seq("title", "body")

  private def newRoot(tag: String): String =
    Files.createTempDirectory(s"graft_mf$tag").toString + "/postings"

  private def merge(root: String, changes: FieldDoc*): Unit =
    IncrementalPostings.mergeBatchFields(spark, changes.toSeq.toDF(), root, fields)

  private def ranking(df: DataFrame): Seq[String] =
    df.orderBy(col("score").desc, col("rowkey")).select("rowkey")
      .collect().map(_.getString(0)).toSeq

  test("boost order changes the ranking (qf=title^2 body vs body^2 title)") {
    val root = newRoot("boost")
    // docA: term once in TITLE; docB: term once in BODY. Under title^2
    // A outranks B (2.0 vs 1.0); under body^2 the order flips.
    merge(root,
      FieldDoc("A", 0, "put", "merge alpha", "beta gamma"),
      FieldDoc("B", 1, "put", "alpha delta", "merge gamma"))
    val titleHeavy = ranking(IncrementalPostings.termSearchFields(
      spark, root, "merge", Seq("title" -> 2.0, "body" -> 1.0)))
    val bodyHeavy = ranking(IncrementalPostings.termSearchFields(
      spark, root, "merge", Seq("body" -> 2.0, "title" -> 1.0)))
    assert(titleHeavy === Seq("A", "B"))
    assert(bodyHeavy === Seq("B", "A"), "swapping qf boosts must flip the order")

    // the ranked (BM25) form flips too: same docs, per-field stats
    def bm25Top(boosts: Seq[(String, Double)]): String =
      IncrementalPostings.bm25SearchFields(spark, root, Seq("merge"), boosts)
        .collect().head.getString(0)
    assert(bm25Top(Seq("title" -> 5.0, "body" -> 1.0)) === "A")
    assert(bm25Top(Seq("body" -> 5.0, "title" -> 1.0)) === "B")
  }

  test("per-field statistics are each field's OWN (df, docCount, avgdl)") {
    val root = newRoot("stats")
    merge(root,
      FieldDoc("1", 0, "put", "merge sort", "long body text here merge"),
      FieldDoc("2", 1, "put", "scan filter", "short one"),
      FieldDoc("3", 2, "put", "merge scan", "another body row"))
    val stats = IncrementalPostings.fieldStats(spark, root)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    // titles: 2+2+2 tokens over 3 docs; bodies: 5+2+3 over 3 docs
    assert(stats("title") === ((3L, 2.0)))
    assert(stats("body") === ((3L, 10.0 / 3.0)))
    // df is per (term, field): 'merge' appears in 2 titles but 1 body
    val ent = IncrementalPostings.termSearchFields(spark, root, "merge",
      Seq("title" -> 1.0, "body" -> 1.0))
    val tfs = ent.select("rowkey", "tf_title", "tf_body").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(tfs === Map("1" -> ((1L, 1L)), "3" -> ((1L, 0L))))
  }

  test("multi-field merges converge under updates, deletes, and replay") {
    val root = newRoot("conv")
    merge(root,
      FieldDoc("1", 0, "put", "merge sort", "spark rows"),
      FieldDoc("2", 1, "put", "hash join", "merge pass"))
    // update doc 1: its OLD tokens in BOTH fields must be removed
    merge(root, FieldDoc("1", 2, "put", "scan only", "fresh body"))
    // delete doc 2 entirely
    merge(root, FieldDoc("2", 3, "delete", "", ""))
    // stale replay below the tombstone: must stay dead
    merge(root, FieldDoc("2", 1, "put", "hash join", "merge pass"))
    val hits = IncrementalPostings.termSearchFields(spark, root, "merge",
      Seq("title" -> 2.0, "body" -> 1.0))
    assert(hits.count() === 0L,
      "old postings of an updated doc and all postings of a deleted doc must be gone")
    val scan = IncrementalPostings.termSearchFields(spark, root, "scan",
      Seq("title" -> 2.0, "body" -> 1.0)).collect()
    assert(scan.map(_.getAs[String]("rowkey")).toSeq === Seq("1"))
    // the sidecar tracked the post-update lengths (title 2, body 2 of doc 1)
    val stats = IncrementalPostings.fieldStats(spark, root)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(stats === Map("title" -> ((1L, 2.0)), "body" -> ((1L, 2.0))))
  }

  test("reads are bucket-pruned: one entries bucket per term, hit docs' buckets only") {
    val root = newRoot("pins")
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val batch = graft.operators.Multifield.fielded(spark, "/root/testdata/sf0.001")
      .select(col("doc_id").cast("string").as("rowkey"),
        col("doc_id").as("event_id"), lit("put").as("op"),
        col("title"), col("body"))
    IncrementalPostings.mergeBatchFields(spark, batch, root, fields)
    def bucketOf(key: String): String = {
      val crc = new java.util.zip.CRC32()
      crc.update(key.getBytes("UTF-8"))
      s"b=${java.lang.Math.floorMod(crc.getValue, graft.streaming.IncrementalIndex.DefaultBuckets.toLong)}"
    }
    // qf term search: every entries file read hashes to the TERM's bucket
    // (all fields of a term share its bucket — field is payload)
    val frame = IncrementalPostings.termSearchFields(spark, root, "merge",
      Seq("title" -> 2.0, "body" -> 1.0))
    val entryFiles = frame.inputFiles.filter(_.contains("/entries/"))
    assert(entryFiles.nonEmpty)
    for (f <- entryFiles)
      assert(f.contains(s"/${bucketOf("merge")}/"),
        s"qf search read an entry bucket outside the term's: $f")
    // ... and no corpus file: every input is under the state root
    assert(frame.inputFiles.forall(_.contains("/postings/")),
      "qf search must be served from maintained state only")
    // per-field BM25: final frame reads NO entries (checkpointed hits),
    // and fetches only the hit docs' own buckets
    val bm = IncrementalPostings.bm25SearchFields(spark, root,
      Seq("merge", "sort"), Seq("title" -> 2.0, "body" -> 1.0))
    assert(bm.inputFiles.count(_.contains("/entries/")) === 0,
      "bm25's final frame re-read the entries instead of the checkpointed hits")
    val hitDocs = docs
      .filter(array_contains(split(col("text"), " "), "merge") ||
        array_contains(split(col("text"), " "), "sort"))
      .select(col("doc_id").cast("string")).collect().map(_.getString(0))
    val wantedDocB = hitDocs.map(bucketOf).toSet
    val docFiles = bm.inputFiles.filter(_.contains("/docs/"))
    assert(docFiles.nonEmpty)
    for (f <- docFiles)
      assert(wantedDocB.exists(b => f.contains(s"/$b/")),
        s"per-field bm25 fetched a doc bucket outside the hits': $f")
  }

  test("a query term absent from the index returns empty, and single-field ranked reads fail loudly") {
    val root = newRoot("edge")
    merge(root, FieldDoc("1", 0, "put", "merge sort", "spark rows"))
    // empty hit list: the per-field dl melt must resolve against the docs
    // state's OWN schema (a naive single-field fallback frame lacks the
    // field columns and crashed this with UNRESOLVED_COLUMN)
    assert(IncrementalPostings.bm25SearchFields(spark, root,
      Seq("zzz_absent_term"), Seq("title" -> 2.0, "body" -> 1.0))
      .count() === 0L)
    // ...and so must the boosted term search
    assert(IncrementalPostings.termSearchFields(spark, root,
      "zzz_absent_term", Seq("title" -> 2.0, "body" -> 1.0)).count() === 0L)
    // guard symmetry with the _fields WRITE marker: a single-field ranked
    // read has no statistics on a multi-field root — loud, not null scores
    val ex = intercept[IllegalStateException] {
      IncrementalPostings.bm25Search(spark, root, Seq("merge")).collect()
    }
    assert(ex.getMessage.contains("multi-field"))
  }

  test("the _fields marker keeps single- and multi-field writers off each other's roots") {
    val root = newRoot("guard")
    merge(root, FieldDoc("1", 0, "put", "merge sort", "spark rows"))
    // a single-field merge would strand title/body postings — refused
    val exS = intercept[java.io.IOException] {
      IncrementalPostings.mergeBatch(spark,
        Seq(("1", 1L, "put", "plain text")).toDF("rowkey", "event_id", "op", "text"),
        root)
    }
    assert(exS.getMessage.contains("_fields"))
    // ... and a multi-field merge with a DIFFERENT field list too
    val exF = intercept[java.io.IOException] {
      IncrementalPostings.mergeBatchFields(spark,
        Seq(("1", 1L, "put", "x", "y", "z"))
          .toDF("rowkey", "event_id", "op", "title", "body", "footer"),
        root, Seq("title", "body", "footer"))
    }
    assert(exF.getMessage.contains("_fields"))
  }

  test("legacy pre-field state adopts the default field on read") {
    // a root written before the field column existed: simulate by
    // stripping the column from committed entries and dstats bucket files
    // — exactly what a pre-round-11 root's parquet footers look like
    val root = newRoot("legacy")
    IncrementalPostings.mergeBatch(spark,
      Seq(("1", 0L, "put", "merge sort rows"), ("2", 1L, "put", "scan merge"))
        .toDF("rowkey", "event_id", "op", "text"),
      root)
    for (sub <- Seq("entries", "dstats")) {
      val dirs = new java.io.File(s"$root/$sub").listFiles()
        .filter(f => f.isDirectory && f.getName.startsWith("b="))
      for (d <- dirs) {
        val stripped = spark.read.parquet(d.toString).drop("field").cache()
        stripped.count()
        val tmp = d.toString + ".strip"
        stripped.write.mode("overwrite").parquet(tmp)
        stripped.unpersist()
        graft.operators.Materialize.deleteLocalDir(d.toString)
        assert(new java.io.File(tmp).renameTo(d))
      }
    }
    // single-field reads see the stripped rows as the default field
    val got = IncrementalPostings.termSearch(spark, root, Seq("merge"))
      .select("rowkey").collect().map(_.getString(0)).toSet
    assert(got === Set("1", "2"))
    val fs = IncrementalPostings.fieldStats(spark, root).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(fs === Map("text" -> 2L))
    // ... and a post-upgrade merge over the legacy root still removes the
    // updated doc's OLD (adopted) postings
    IncrementalPostings.mergeBatch(spark,
      Seq(("1", 2L, "put", "fresh words")).toDF("rowkey", "event_id", "op", "text"),
      root)
    val after = IncrementalPostings.termSearch(spark, root, Seq("merge"))
      .select("rowkey").collect().map(_.getString(0)).toSet
    assert(after === Set("2"), "the adopted legacy postings of doc 1 must be removed")
  }
}
