package graft

import org.apache.spark.sql.functions._

/** Evidence for the SCALE.md bucketed-state-table design: with the index
  * state and an incoming batch both bucketed by rowkey, the merge join
  * needs NO exchange on either side, and a point lookup prunes to a single
  * bucket before the scan. */
class BucketingSpec extends SparkSpec {
  import spark.implicits._

  private def mkState(name: String, rows: Seq[(String, Long, Double)]): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS $name")
    // the metastore is session-scoped but the warehouse dir persists across
    // JVMs — clear any orphaned location from a previous run
    val loc = new java.io.File(
      spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"), name)
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(): Unit
    }
    if (loc.exists()) rm(loc)
    rows.toDF("rowkey", "event_id", "value")
      .write.bucketBy(8, "rowkey").sortBy("rowkey")
      .mode("overwrite").saveAsTable(name)
  }

  test("bucket-aligned state merge joins without any exchange") {
    mkState("g_state", (0 until 100).map(i => (s"k$i", i.toLong, i * 1.0)))
    mkState("g_batch", (50 until 150).map(i => (s"k$i", i.toLong + 1000, i * 2.0)))
    val prior = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val j = spark.table("g_state").join(spark.table("g_batch"), "rowkey")
      j.collect()
      val p = j.queryExecution.executedPlan.toString
      assert(p.contains("SortMergeJoin"), p)
      assert(!p.contains("Exchange hashpartitioning"),
        s"bucketed join must not shuffle:\n$p")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prior)
  }

  test("date-partitioned state layout prunes partitions on a date filter") {
    val dir = java.nio.file.Files.createTempDirectory("graft_part").toString
    (0 until 300).map(i => (s"k$i", i.toLong, f"2024-01-${1 + i % 3}%02d"))
      .toDF("rowkey", "event_id", "day")
      .write.partitionBy("day").mode("overwrite").parquet(dir)
    val df = spark.read.parquet(dir).filter(col("day") === "2024-01-02")
    val p = df.queryExecution.executedPlan.toString
    // the day predicate must land in PartitionFilters (directory pruning),
    // not in DataFilters (row filtering after reading everything)
    assert(p.contains("PartitionFilters: [isnotnull(day"), p)
    assert(p.contains("(day#") && p.contains("= 2024-01-02"), p)
    assert(df.count() === 100)
  }

  test("point lookup on the bucketed state scans one bucket") {
    mkState("g_state_pl", (0 until 100).map(i => (s"k$i", i.toLong, i * 1.0)))
    // auto-bucketed-scan turns bucketed reading off when no join wants the
    // distribution; force it to exercise bucket pruning on the filter
    val key = "spark.sql.sources.bucketing.autoBucketedScan.enabled"
    val prior = spark.conf.get(key)
    try {
      spark.conf.set(key, "false")
      val df = spark.table("g_state_pl").filter(col("rowkey") === "k42")
      val p = df.queryExecution.executedPlan.toString
      assert(p.contains("SelectedBucketsCount: 1 out of 8"), p)
      assert(df.collect().map(_.getLong(1)).toSeq === Seq(42L))
    } finally spark.conf.set(key, prior)
  }
}
