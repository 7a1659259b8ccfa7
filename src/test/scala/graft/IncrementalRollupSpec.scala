package graft

import java.nio.file.Files
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.streaming.{IncrementalIndex, IncrementalRollup, StateStore}

/** The incrementally-maintained aggregate sidecar (IncrementalRollup):
  * per-bucket partials recomputed only for the buckets each merge touches
  * must always collapse to exactly the aggregate a full recompute over the
  * live state produces — for any chunking, with replacements and deletes,
  * under replay, and with untouched partials never rewritten. */
class IncrementalRollupSpec extends SparkSpec {

  private def changelog: DataFrame =
    Tables.events(spark, "/root/testdata/sf0.001").select(
      col("user_id").cast("string").as("rowkey"),
      col("event_id"),
      when(col("event_type") === "error", "delete").otherwise("put").as("op"),
      col("event_type"),
      round(col("value"), 2).as("value"))

  private def spec(base: String) =
    IncrementalRollup.Spec(base + "/rollup", Seq("event_type"), Some("value"))

  private def rollupMap(s: IncrementalRollup.Spec): Map[String, (Long, Double)] =
    IncrementalRollup.read(spark, s).collect()
      .map(r => r.getAs[String]("event_type") ->
        (r.getAs[Long]("n"),
          math.rint(r.getAs[Double]("sum_value") * 100) / 100)).toMap

  private def recompute(statePath: String): Map[String, (Long, Double)] =
    IncrementalIndex.readState(spark, statePath)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_value"))
      .collect().map(r => r.getAs[String]("event_type") ->
        (r.getAs[Long]("n"), r.getAs[Double]("sum_value"))).toMap

  test("chunked merges maintain the rollup exactly (updates + deletes, 4 chunks)") {
    val ev = changelog
    val base = Files.createTempDirectory("graft_ru").toString
    val st = base + "/state"
    val sp = spec(base)
    Seq((0L, 250L), (250L, 500L), (500L, 750L), (750L, 1000000L)).foreach {
      case (lo, hi) =>
        IncrementalIndex.mergeBatch(spark,
          ev.filter(col("event_id") >= lo && col("event_id") < hi), st,
          rollup = Some(sp))
    }
    val maintained = rollupMap(sp)
    assert(maintained === recompute(st))
    assert(maintained.nonEmpty)
  }

  test("replaying a chunk is idempotent; untouched partials are not rewritten") {
    val ev = changelog
    val base = Files.createTempDirectory("graft_ruR").toString
    val st = base + "/state"
    val sp = spec(base)
    IncrementalIndex.mergeBatch(spark, ev.filter(col("event_id") < 500), st,
      rollup = Some(sp))
    val before = rollupMap(sp)
    // checkpoint replay: the exact same chunk a second time
    IncrementalIndex.mergeBatch(spark, ev.filter(col("event_id") < 500), st,
      rollup = Some(sp))
    assert(rollupMap(sp) === before)
    // now merge ONE key's update and check other partial buckets' bytes
    val one = ev.orderBy(col("event_id").desc).limit(1)
      .withColumn("value", lit(99.0))
      .withColumn("event_id", col("event_id") + 1000000L)
    val touchedKey = one.head().getAs[String]("rowkey")
    val touchedDir = StateStore.bucketDirsFor(spark, sp.path, Seq(touchedKey))
    def bytesByDir(): Map[String, Long] =
      StateStore.liveBuckets(spark, sp.path).map { d =>
        val f = new java.io.File(sp.path, d)
        d -> f.listFiles().map(_.length()).sum
      }.toMap
    val bytesBefore = bytesByDir()
    IncrementalIndex.mergeBatch(spark, one, st, rollup = Some(sp))
    val bytesAfter = bytesByDir()
    (bytesBefore.keySet ++ bytesAfter.keySet).filterNot(touchedDir.contains)
      .foreach(d => assert(bytesBefore.get(d) === bytesAfter.get(d),
        s"untouched rollup bucket $d was rewritten"))
    assert(rollupMap(sp) === recompute(st))
  }

  test("a bucket emptied by deletes drops its rollup dir; totals stay exact") {
    val base = Files.createTempDirectory("graft_ruD").toString
    val st = base + "/state"
    val sp = IncrementalRollup.Spec(base + "/rollup", Seq("g"))
    import spark.implicits._
    val puts = Seq(("k1", 1L, "put", "a"), ("k2", 2L, "put", "b"))
      .toDF("rowkey", "event_id", "op", "g")
    IncrementalIndex.mergeBatch(spark, puts, st, rollup = Some(sp))
    assert(IncrementalRollup.read(spark, sp).count() === 2)
    val dels = Seq(("k1", 3L, "delete", "a"), ("k2", 4L, "delete", "b"))
      .toDF("rowkey", "event_id", "op", "g")
    IncrementalIndex.mergeBatch(spark, dels, st, rollup = Some(sp))
    assert(IncrementalRollup.read(spark, sp).count() === 0)
    // tombstones remain in the ROW state, but no rollup bucket dir survives
    assert(StateStore.liveBuckets(spark, sp.path).isEmpty)
  }

  test("rebuild from the row state equals the maintained rollup; spec drift fails loudly") {
    val ev = changelog
    val base = Files.createTempDirectory("graft_ruB").toString
    val st = base + "/state"
    val sp = spec(base)
    IncrementalIndex.mergeBatch(spark, ev.filter(col("event_id") < 600), st,
      rollup = Some(sp))
    IncrementalIndex.mergeBatch(spark, ev.filter(col("event_id") >= 600), st,
      rollup = Some(sp))
    val maintained = rollupMap(sp)
    IncrementalRollup.rebuild(spark, st, sp)
    assert(rollupMap(sp) === maintained)
    // a writer presenting a different grouping must fail, not mix partials
    val drift = IncrementalRollup.Spec(sp.path, Seq("op"), None)
    val e = intercept[Exception] {
      IncrementalIndex.mergeBatch(spark, ev.limit(1), st, rollup = Some(drift))
    }
    assert(e.getMessage.contains("_rollup"))
  }

  test("HLL distinct rollup tracks the live set through updates and deletes") {
    val base = Files.createTempDirectory("graft_ruH").toString
    val st = base + "/state"
    val sp = IncrementalRollup.Spec(base + "/rollup", Seq("g"),
      distinctCol = Some("u"))
    import spark.implicits._
    def put(k: String, id: Long, g: String, u: String) = (k, id, "put", g, u)
    val b0 = Seq(put("k1", 1, "a", "u1"), put("k2", 2, "a", "u2"),
      put("k3", 3, "b", "u1"), put("k4", 4, "a", "u1"))
      .toDF("rowkey", "event_id", "op", "g", "u")
    IncrementalIndex.mergeBatch(spark, b0, st, rollup = Some(sp))
    def distincts(): Map[String, Long] =
      IncrementalRollup.read(spark, sp).collect()
        .map(r => r.getAs[String]("g") -> r.getAs[Long]("n_distinct_u")).toMap
    // sketches union across buckets: u1 appears under 'a' twice + 'b' once
    assert(distincts() === Map("a" -> 2L, "b" -> 1L))
    // a delete RETRACTS from the estimate (bucket re-sketched from its
    // live contents — the thing a plain streaming HLL cannot do), and an
    // update that moves a key's value re-counts it
    val b1 = Seq(("k2", 10L, "delete", "a", ""),
      put("k4", 11, "a", "u9")).toDF("rowkey", "event_id", "op", "g", "u")
    IncrementalIndex.mergeBatch(spark, b1, st, rollup = Some(sp))
    assert(distincts() === Map("a" -> 2L, "b" -> 1L)) // {u1,u9}, {u1}
    val b2 = Seq(("k1", 20L, "delete", "a", ""),
      ("k4", 21L, "delete", "a", "")).toDF("rowkey", "event_id", "op", "g", "u")
    IncrementalIndex.mergeBatch(spark, b2, st, rollup = Some(sp))
    assert(distincts() === Map("b" -> 1L))
    // rebuild agrees with the maintained sketches
    IncrementalRollup.rebuild(spark, st, sp)
    assert(distincts() === Map("b" -> 1L))
  }

  test("readBy serves every coarser facet from one cuboid, sketches included") {
    val base = Files.createTempDirectory("graft_ruC").toString
    val st = base + "/state"
    val sp = IncrementalRollup.Spec(base + "/rollup", Seq("lang", "source"),
      sumCol = Some("v"), distinctCol = Some("u"))
    import spark.implicits._
    val rows = Seq(
      ("k1", 1L, "put", "en", "web", 1.0, "u1"),
      ("k2", 2L, "put", "en", "web", 2.0, "u2"),
      ("k3", 3L, "put", "en", "book", 4.0, "u1"),
      ("k4", 4L, "put", "de", "web", 8.0, "u3"))
      .toDF("rowkey", "event_id", "op", "lang", "source", "v", "u")
    IncrementalIndex.mergeBatch(spark, rows, st, rollup = Some(sp))
    def by(cols: String*): Map[Seq[String], (Long, Double, Long)] =
      IncrementalRollup.readBy(spark, sp, cols).collect()
        .map(r => cols.map(r.getAs[String]) ->
          (r.getAs[Long]("n"), r.getAs[Double]("sum_v"),
            r.getAs[Long]("n_distinct_u"))).toMap
    // full cuboid
    assert(by("lang", "source") === Map(
      Seq("en", "web") -> (2L, 3.0, 2L), Seq("en", "book") -> (1L, 4.0, 1L),
      Seq("de", "web") -> (1L, 8.0, 1L)))
    // coarser facets from the SAME partials: counts/sums add, sketches
    // union (u1 appears under both en-sources — distinct must stay 2)
    assert(by("lang") === Map(
      Seq("en") -> (3L, 7.0, 2L), Seq("de") -> (1L, 8.0, 1L)))
    assert(by("source") === Map(
      Seq("web") -> (3L, 11.0, 3L), Seq("book") -> (1L, 4.0, 1L)))
    // a non-subset read fails loudly
    val e = intercept[IllegalArgumentException] {
      IncrementalRollup.readBy(spark, sp, Seq("missing"))
    }
    assert(e.getMessage.contains("subset"))
  }

  test("min/max/avg stats rollup converges through updates and deletes, cuboids included") {
    val base = Files.createTempDirectory("graft_ruM").toString
    val st = base + "/state"
    val sp = IncrementalRollup.Spec(base + "/rollup", Seq("lang", "source"),
      statsCol = Some("v"))
    import spark.implicits._
    def put(k: String, id: Long, lang: String, source: String, v: Double) =
      (k, id, "put", lang, source, v)
    val b0 = Seq(put("k1", 1, "en", "web", 1.0), put("k2", 2, "en", "web", 9.0),
      put("k3", 3, "en", "book", 5.0), put("k4", 4, "de", "web", 8.0))
      .toDF("rowkey", "event_id", "op", "lang", "source", "v")
    IncrementalIndex.mergeBatch(spark, b0, st, rollup = Some(sp))
    def by(cols: String*): Map[Seq[String], (Long, Double, Double, Double)] =
      IncrementalRollup.readBy(spark, sp, cols).collect()
        .map(r => cols.map(r.getAs[String]).toSeq ->
          (r.getAs[Long]("n"), r.getAs[Double]("min_v"),
            r.getAs[Double]("max_v"), r.getAs[Double]("avg_v"))).toMap
    assert(by("lang", "source") === Map(
      Seq("en", "web") -> (2L, 1.0, 9.0, 5.0),
      Seq("en", "book") -> (1L, 5.0, 5.0, 5.0),
      Seq("de", "web") -> (1L, 8.0, 8.0, 8.0)))
    // the SAME partials serve the coarser stat (cuboid): min of mins,
    // max of maxs, avg re-derived from summed (ssum, scnt)
    assert(by("lang") === Map(
      Seq("en") -> (3L, 1.0, 9.0, 5.0), Seq("de") -> (1L, 8.0, 8.0, 8.0)))
    // deleting the current MAX retracts it — the retraction aggregate
    // delta maintenance famously cannot do, and the per-touched-bucket
    // recompute does for free (same argument as the deletable HLL)
    val b1 = Seq(("k2", 10L, "delete", "", "", 0.0),
      put("k3", 11, "en", "book", 2.0))
      .toDF("rowkey", "event_id", "op", "lang", "source", "v")
    IncrementalIndex.mergeBatch(spark, b1, st, rollup = Some(sp))
    val after = Map(
      Seq("en", "web") -> (1L, 1.0, 1.0, 1.0),
      Seq("en", "book") -> (1L, 2.0, 2.0, 2.0),
      Seq("de", "web") -> (1L, 8.0, 8.0, 8.0))
    assert(by("lang", "source") === after)
    // rebuild from the row state agrees with the maintained partials
    IncrementalRollup.rebuild(spark, st, sp)
    assert(by("lang", "source") === after)
  }

  test("rollup after a row-root rescale: rebuild repairs the moved buckets") {
    val ev = changelog
    val base = Files.createTempDirectory("graft_ruS").toString
    val st = base + "/state"
    val sp = spec(base)
    IncrementalIndex.mergeBatch(spark, ev, st, rollup = Some(sp))
    val before = rollupMap(sp)
    StateStore.rescale(spark, st, "rowkey", 32)
    // partials are stale in LAYOUT (bucket ids moved), not in content —
    // the collapse still reads them all, so totals survive; rebuild
    // re-buckets the sidecar to the new count for delta maintenance
    IncrementalRollup.rebuild(spark, st, sp)
    assert(StateStore.bucketCount(spark, sp.path) === Some(32))
    assert(rollupMap(sp) === before)
    assert(rollupMap(sp) === recompute(st))
  }
}
