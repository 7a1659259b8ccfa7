package graft

import java.nio.file.Files
import graft.sources.ChangelogSource
import graft.streaming.IncrementalIndex

/** The same changelog must compact to the same state regardless of the
  * physical format it arrived in. */
class ChangelogSourceSpec extends SparkSpec {
  import spark.implicits._

  private val rows = Seq(
    ("a", 1L, "put", "v1"), ("b", 2L, "put", "v2"),
    ("a", 3L, "put", "v3"), ("b", 4L, "delete", ""),
    ("c", 5L, "put", "v5"))

  test("parquet, csv, and json-lines inputs compact identically") {
    val base = Files.createTempDirectory("graft_src").toString
    val df = rows.toDF("rowkey", "event_id", "op", "payload")
    df.write.mode("overwrite").parquet(s"$base/p")
    df.write.mode("overwrite").option("header", "true").csv(s"$base/c")
    df.write.mode("overwrite").json(s"$base/j")

    def state(d: org.apache.spark.sql.DataFrame): Map[String, String] =
      IncrementalIndex.compact(d).collect()
        .map(r => r.getAs[String]("rowkey") -> r.getAs[String]("payload")).toMap

    val expect = Map("a" -> "v3", "c" -> "v5")
    assert(state(ChangelogSource.parquet(spark, s"$base/p")) === expect)
    assert(state(ChangelogSource.csv(spark, s"$base/c")) === expect)
    assert(state(ChangelogSource.jsonLines(spark, s"$base/j")) === expect)
  }

  test("a drifted producer fails loudly, not silently") {
    val base = Files.createTempDirectory("graft_src_bad").toString
    Files.writeString(java.nio.file.Paths.get(base, "bad.json"),
      """{"rowkey": "a", "event_id": "not-a-number", "op": "put", "payload": "x"}""")
    intercept[Exception] {
      ChangelogSource.jsonLines(spark, base).collect()
    }
  }
}
