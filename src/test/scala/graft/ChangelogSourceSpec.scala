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

  test("an oversized drop is split across micro-batches (size half of the dual trigger)") {
    val base = Files.createTempDirectory("graft_srcM").toString
    val in = s"$base/in"; new java.io.File(in).mkdirs()
    for (i <- 1 to 3)
      Files.writeString(java.nio.file.Paths.get(in, s"f$i.json"),
        s"""{"rowkey": "k$i", "event_id": $i, "op": "put", "payload": "v$i"}""")
    val statePath = s"$base/state"
    val query = IncrementalIndex.start(
      ChangelogSource.stream(spark, in, maxFilesPerTrigger = Some(1)),
      statePath, s"$base/ckpt", intervalSeconds = 1)
    try {
      query.processAllAvailable()
      val live = IncrementalIndex.readState(spark, statePath).collect()
        .map(_.getAs[String]("rowkey")).toSet
      assert(live === Set("k1", "k2", "k3"))
      val dataBatches = query.recentProgress.count(_.numInputRows > 0)
      assert(dataBatches >= 3,
        s"expected the 3-file drop split into >=3 micro-batches, saw $dataBatches")
    } finally query.stop()
  }

  test("a byte budget splits an oversized drop regardless of file sizes") {
    val base = Files.createTempDirectory("graft_srcY").toString
    val in = s"$base/in"; new java.io.File(in).mkdirs()
    // deliberately UNEVEN files — the case where the file-count heuristic
    // degrades and the byte budget still bounds each micro-batch
    Files.writeString(java.nio.file.Paths.get(in, "big.json"), (1 to 5).map(i =>
      s"""{"rowkey": "k$i", "event_id": $i, "op": "put", "payload": "v$i"}""").mkString("\n"))
    Files.writeString(java.nio.file.Paths.get(in, "small.json"),
      """{"rowkey": "k6", "event_id": 6, "op": "put", "payload": "v6"}""")
    val statePath = s"$base/state"
    val query = IncrementalIndex.start(
      ChangelogSource.stream(spark, in, maxBytesPerTrigger = Some(16L)),
      statePath, s"$base/ckpt", intervalSeconds = 1)
    try {
      query.processAllAvailable()
      assert(IncrementalIndex.readState(spark, statePath).count() === 6L)
      val dataBatches = query.recentProgress.count(_.numInputRows > 0)
      assert(dataBatches >= 2,
        s"expected the drop split into >=2 byte-bounded batches, saw $dataBatches")
    } finally query.stop()
    // the two admission knobs are mutually exclusive
    intercept[IllegalArgumentException] {
      ChangelogSource.stream(spark, in,
        maxFilesPerTrigger = Some(1), maxBytesPerTrigger = Some(16L))
    }
  }

  test("the facade threads add_batchCount into source admission (dual-trigger parity)") {
    val base = Files.createTempDirectory("graft_srcA").toString
    val in = s"$base/in"; new java.io.File(in).mkdirs()
    for (i <- 1 to 4)
      Files.writeString(java.nio.file.Paths.get(in, s"f$i.json"),
        s"""{"rowkey": "k$i", "event_id": $i, "op": "put", "payload": "v$i"}""")
    // add_batchCount=2 at one event per file → 2 files admitted per batch
    val cfg = GraftConfig(Seq("click"), "user_id", "error",
      addBatchCount = 2, delBatchCount = 1, commitIntervalSec = 1, firstDelaySec = 0)
    val g = graft.api.Graft(spark, "/root/testdata/sf0.001", cfg)
    val statePath = s"$base/state"
    val query = g.startIndexMaintenance(g.changeStream(in), statePath, s"$base/ckpt")
    try {
      query.processAllAvailable()
      assert(IncrementalIndex.readState(spark, statePath).count() === 4L)
      val dataBatches = query.recentProgress.count(_.numInputRows > 0)
      assert(dataBatches >= 2,
        s"expected the 4-file drop split into >=2 admission-bounded batches, saw $dataBatches")
    } finally query.stop()
  }

  test("the facade's file budget rounds UP so admission honors the row threshold") {
    val base = Files.createTempDirectory("graft_srcC").toString
    val in = s"$base/in"; new java.io.File(in).mkdirs()
    for (i <- 1 to 4) // 4 files x 2 events
      Files.writeString(java.nio.file.Paths.get(in, s"f$i.json"), Seq(
        s"""{"rowkey": "k${i}a", "event_id": ${2 * i}, "op": "put", "payload": "v"}""",
        s"""{"rowkey": "k${i}b", "event_id": ${2 * i + 1}, "op": "put", "payload": "v"}""")
        .mkString("\n"))
    // threshold 3 rows at 2 events/file: ceil(3/2)=2 files/trigger — the
    // first admission CROSSING the threshold (the reference flushes at
    // buffer >= add_batchCount); floored division would drain 1 file at a
    // time, twice the batches the threshold asks for
    val cfg = GraftConfig(Seq("click"), "user_id", "error",
      addBatchCount = 3, delBatchCount = 1, commitIntervalSec = 1, firstDelaySec = 0)
    val g = graft.api.Graft(spark, "/root/testdata/sf0.001", cfg)
    intercept[IllegalArgumentException] { g.changeStream(in, eventsPerFile = 0) }
    intercept[IllegalArgumentException] { g.changeStreamBytes(in, bytesPerEvent = 0) }
    val statePath = s"$base/state"
    val query = g.startIndexMaintenance(
      g.changeStream(in, eventsPerFile = 2), statePath, s"$base/ckpt")
    try {
      query.processAllAvailable()
      assert(IncrementalIndex.readState(spark, statePath).count() === 8L)
      assert(query.recentProgress.count(_.numInputRows > 0) === 2)
    } finally query.stop()
  }

  test("broker-shaped records project through the declared schema; drift fails loudly") {
    import org.apache.spark.sql.functions.{col, lit}
    val vals = Seq(
      """{"rowkey": "a", "event_id": 1, "op": "put", "payload": "v1"}""",
      """{"rowkey": "b", "event_id": 2, "op": "put", "payload": "v2"}""")
    // the broker shape: payload as BYTES plus source metadata columns
    val records = vals.toDF("value")
      .select(col("value").cast("binary").as("value"),
        lit("changelog").as("topic"), lit(0L).as("offset"))
    val got = ChangelogSource.fromBroker(records).collect()
      .map(r => r.getAs[String]("rowkey") -> r.getAs[Long]("event_id")).toMap
    assert(got === Map("a" -> 1L, "b" -> 2L))
    val drifted = Seq("""{"rowkey": "a", "event_id": "not-a-number", "op": "put", "payload": ""}""")
      .toDF("value")
    intercept[Exception] {
      ChangelogSource.fromBroker(drifted).collect()
    }
    // a producer that dropped/renamed the payload field null-fills it on
    // parse — drift, not a legal event (deletes carry "", never null)
    val noPayload = Seq("""{"rowkey": "a", "event_id": 1, "op": "put"}""").toDF("value")
    intercept[Exception] {
      ChangelogSource.fromBroker(noPayload).collect()
    }
  }

  test("a broker-shaped stream feeds index maintenance end-to-end") {
    implicit val sqlCtx = spark.sqlContext
    val source = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[String]
    val base = Files.createTempDirectory("graft_srcB").toString
    val statePath = s"$base/state"
    val cfg = GraftConfig(Seq("click"), "user_id", "error",
      addBatchCount = 100, delBatchCount = 1, commitIntervalSec = 1, firstDelaySec = 0)
    val g = graft.api.Graft(spark, "/root/testdata/sf0.001", cfg)
    val query = g.startIndexMaintenance(
      g.brokerChanges(source.toDF()), statePath, s"$base/ckpt")
    def live: Map[String, String] =
      IncrementalIndex.readState(spark, statePath).collect()
        .map(r => r.getAs[String]("rowkey") -> r.getAs[String]("payload")).toMap
    try {
      source.addData(
        """{"rowkey": "a", "event_id": 1, "op": "put", "payload": "v1"}""",
        """{"rowkey": "b", "event_id": 2, "op": "put", "payload": "v2"}""")
      query.processAllAvailable()
      assert(live === Map("a" -> "v1", "b" -> "v2"))
      source.addData(
        """{"rowkey": "a", "event_id": 3, "op": "delete", "payload": ""}""",
        """{"rowkey": "c", "event_id": 4, "op": "put", "payload": "v4"}""")
      query.processAllAvailable()
      assert(live === Map("b" -> "v2", "c" -> "v4"))
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
