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

    df.write.mode("overwrite").orc(s"$base/o")
    val expect = Map("a" -> "v3", "c" -> "v5")
    assert(state(ChangelogSource.parquet(spark, s"$base/p")) === expect)
    assert(state(ChangelogSource.csv(spark, s"$base/c")) === expect)
    assert(state(ChangelogSource.jsonLines(spark, s"$base/j")) === expect)
    assert(state(ChangelogSource.orc(spark, s"$base/o")) === expect)
  }

  test("landing-zone file stream feeds the bucketed state merge end-to-end") {
    val base = Files.createTempDirectory("graft_srcS").toString
    val in = s"$base/in"; new java.io.File(in).mkdirs()
    val statePath = s"$base/state"
    def drop(name: String, lines: Seq[String]): Unit =
      Files.writeString(java.nio.file.Paths.get(in, name), lines.mkString("\n"))
    drop("f1.json", Seq(
      """{"rowkey": "a", "event_id": 1, "op": "put", "payload": "v1"}""",
      """{"rowkey": "b", "event_id": 2, "op": "put", "payload": "v2"}"""))
    val query = IncrementalIndex.start(
      ChangelogSource.stream(spark, in), statePath, s"$base/ckpt", intervalSeconds = 1)
    def live: Map[String, String] =
      IncrementalIndex.readState(spark, statePath).collect()
        .map(r => r.getAs[String]("rowkey") -> r.getAs[String]("payload")).toMap
    try {
      query.processAllAvailable()
      assert(live === Map("a" -> "v1", "b" -> "v2"))
      drop("f2.json", Seq(
        """{"rowkey": "b", "event_id": 3, "op": "delete", "payload": ""}""",
        """{"rowkey": "c", "event_id": 4, "op": "put", "payload": "v4"}"""))
      query.processAllAvailable()
      assert(live === Map("a" -> "v1", "c" -> "v4"))
    } finally query.stop()
  }

  test("a drifted ORC producer fails loudly too (schema checked, not null-filled)") {
    val base = Files.createTempDirectory("graft_srcO").toString
    rows.toDF("key", "event_id", "op", "payload") // rowkey renamed away
      .write.mode("overwrite").orc(s"$base/drifted")
    val e = intercept[IllegalArgumentException] {
      ChangelogSource.orc(spark, s"$base/drifted")
    }
    assert(e.getMessage.contains("rowkey"))
  }

  test("the streaming reader keeps the strict-ingest contract (FAILFAST)") {
    val base = Files.createTempDirectory("graft_srcF").toString
    val in = s"$base/in"; new java.io.File(in).mkdirs()
    Files.writeString(java.nio.file.Paths.get(in, "bad.json"),
      """{"rowkey": "a", "event_id": "not-a-number", "op": "put", "payload": "x"}""")
    val query = ChangelogSource.stream(spark, in).writeStream
      .format("memory").queryName("graft_srcF_out")
      .option("checkpointLocation", s"$base/ckpt").start()
    try intercept[Exception] { query.processAllAvailable() }
    finally query.stop()
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
