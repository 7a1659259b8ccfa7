package graft

import org.apache.spark.sql.functions._

/** The scale probe's corpus derivation: re-keyed replicas, tag-disjoint
  * dup structure, and a provenance marker that refuses to silently reuse
  * replicas of a different base. */
class ScaleProbeSpec extends SparkSpec {

  test("derive replicates with disjoint key spaces and records provenance") {
    val root = java.nio.file.Files
      .createTempDirectory("graft_probeDerive").toString
    ScaleProbe.derive(spark, "/root/testdata/sf0.001", root, 2)
    val docs = spark.read.parquet(s"$root/asis/documents.parquet")
    val base = Tables.documents(spark, "/root/testdata/sf0.001")
    assert(docs.count() === base.count() * 2)
    assert(docs.select("doc_id").distinct().count() === docs.count(),
      "replica doc_ids must not collide")
    // verbatim text: posting lists genuinely double
    val dfMerge = docs.filter(array_contains(split(col("text"), " "), "merge")).count()
    val dfBase = base.filter(array_contains(split(col("text"), " "), "merge")).count()
    assert(dfMerge === dfBase * 2)
    // tagged corpus: replicas share NO tokens (dup structure per replica only)
    val tagged = spark.read.parquet(s"$root/tagged/documents.parquet")
    val overlap = tagged.filter(col("doc_id") < 1000000)
      .select(explode(split(col("text"), " ")).as("t")).distinct()
      .join(tagged.filter(col("doc_id") >= 1000000)
        .select(explode(split(col("text"), " ")).as("t")).distinct(), "t")
    assert(overlap.count() === 0L, "tagged replicas must be token-disjoint")
    // embeddings: replicas of one vector are distinct points
    val emb = spark.read.parquet(s"$root/asis/embeddings.parquet")
    val pairs = emb.filter(col("vec_id") < 1000000).as("a")
      .join(emb.filter(col("vec_id") >= 1000000).as("b"),
        col("b.vec_id") === col("a.vec_id") + 1000000L)
      .filter(col("a.embedding") === col("b.embedding"))
    assert(pairs.count() === 0L, "jittered replicas must differ from their source")
    // idempotent on matching (sfDir, n); loud on mismatch
    ScaleProbe.derive(spark, "/root/testdata/sf0.001", root, 2)
    val ex = intercept[IllegalArgumentException] {
      ScaleProbe.derive(spark, "/root/testdata/sf0.01", root, 2)
    }
    assert(ex.getMessage.contains("re-derive"))
  }
}
