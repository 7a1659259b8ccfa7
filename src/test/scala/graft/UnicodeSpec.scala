package graft

import org.apache.spark.sql.functions._
import graft.api.Graft

/** The reference served Chinese text through Solr's analyzers
  * (/root/reference/README.md:5-6). The engine's tokenization and hashing
  * must at minimum be byte-correct on non-ASCII input: whitespace
  * tokenization treats a CJK run as one token, md5 hashes the UTF-8 bytes
  * (so dedup/fingerprints stay engine-portable), and byte vs char lengths
  * diverge exactly as UTF-8 dictates. */
class UnicodeSpec extends SparkSpec {
  import spark.implicits._

  private val zh = "增量 索引 更新 hbase 集成"

  test("whitespace tokenization yields CJK word tokens; search matches them") {
    val df = Seq((0L, zh, "zh", "s", 0L)).toDF("doc_id", "text", "lang", "source", "n_chars")
    val toks = df.select(explode(split(col("text"), " ")).as("t"))
      .collect().map(_.getString(0))
    assert(toks.toSeq === Seq("增量", "索引", "更新", "hbase", "集成"))
    assert(df.filter(array_contains(split(col("text"), " "), "索引")).count() === 1)
  }

  test("md5 of non-ASCII text is the UTF-8 digest (engine-portable)") {
    val got = Seq(Tuple1("增量索引")).toDF("t").select(md5(col("t"))).head().getString(0)
    val expect = java.security.MessageDigest.getInstance("MD5")
      .digest("增量索引".getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(got === expect)
  }

  test("octet_length counts UTF-8 bytes, length counts characters") {
    val r = Seq(Tuple1("增量ab")).toDF("t")
      .select(octet_length(col("t")), length(col("t"))).head()
    assert(r.getInt(0) === 8) // 2 CJK chars × 3 bytes + 2 ASCII
    assert(r.getInt(1) === 4)
  }

  test("exact dedup collapses identical CJK docs") {
    import java.nio.file.Files
    val d = Files.createTempDirectory("graft_zh").toString
    Seq((0L, zh, "zh", "s0", 0L), (1L, zh, "zh", "s1", 0L),
      (2L, "另一 篇 文档", "zh", "s2", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    val survivors = Graft(spark, d).dedupExact.select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(survivors === Set(0L, 2L))
  }
}
