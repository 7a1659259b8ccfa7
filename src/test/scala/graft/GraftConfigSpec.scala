package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.api.Graft
import graft.operators.Changelog

/** O13: operator parameters are config-driven (the reference's
  * application.properties), and a non-default binding visibly changes
  * operator behavior while the default reproduces the pinned oracle
  * queries. */
class GraftConfigSpec extends SparkSpec {

  test("fromProperties reads the reference's key names; defaults fill gaps") {
    val p = new java.util.Properties()
    p.setProperty("hbase_column_family", "cf_product,cf_order")
    p.setProperty("solr_hbase_rowkey_name", "rowkey")
    p.setProperty("add_batchCount", "10000")
    p.setProperty("del_batchCount", "2000")
    p.setProperty("interval_commit_index", "30")
    val cfg = GraftConfig.fromProperties(p)
    assert(cfg.cfAllowlist === Seq("cf_product", "cf_order"))
    assert(cfg.rowkeyField === "rowkey")
    assert(cfg.addBatchCount === 10000 && cfg.delBatchCount === 2000)
    assert(cfg.commitIntervalSec === 30)
    assert(cfg.deleteClass === GraftConfig.default.deleteClass) // unset → default
    assert(cfg.firstDelaySec === 10) // unset → the reference's shipped value
  }

  test("first_delay (the flush timer's initial delay) parses and validates") {
    val p = new java.util.Properties()
    p.setProperty("first_delay", "25")
    assert(GraftConfig.fromProperties(p).firstDelaySec === 25)
    intercept[IllegalArgumentException] {
      GraftConfig.default.copy(firstDelaySec = -1)
    }
  }

  test("load() parses a .properties file") {
    val f = Files.createTempFile("graft", ".properties")
    Files.writeString(f,
      "hbase_column_family=click,view\nadd_batchCount=500\n")
    val cfg = GraftConfig.load(f.toString)
    assert(cfg.cfAllowlist === Seq("click", "view"))
    assert(cfg.addBatchCount === 500)
    assert(cfg.rowkeyField === "user_id")
  }

  test("a custom allowlist changes the CF filter; the default matches the pinned query") {
    val ev = Tables.events(spark, "/root/testdata/sf0.001")
    val narrow = GraftConfig.default.copy(cfAllowlist = Seq("click"))
    val nNarrow = Changelog.filterCf(ev, narrow).count()
    val nDefault = Changelog.filterCf(ev).count()
    val nPinned = SparkEntry.queries("q_filter_cf")(spark, "/root/testdata/sf0.001").count()
    assert(nNarrow > 0 && nNarrow < nDefault)
    assert(nDefault === nPinned)
    assert(Changelog.filterCf(ev, narrow)
      .select("event_type").distinct().collect().map(_.getString(0)).toSeq === Seq("click"))
  }

  test("a custom delete class flips which rows survive the index state") {
    val ev = Tables.events(spark, "/root/testdata/sf0.001")
    val asDefault = Changelog.indexState(ev)
    val flipped = Changelog.indexState(ev,
      GraftConfig.default.copy(deleteClass = "click"))
    assert(asDefault.filter(col("event_type") === "error").count() === 0)
    assert(flipped.filter(col("event_type") === "click").count() === 0)
    assert(flipped.filter(col("event_type") === "error").count() > 0)
  }

  test("Graft facade accepts a config binding end-to-end") {
    val g = Graft(spark, "/root/testdata/sf0.001",
      GraftConfig.default.copy(cfAllowlist = Seq("purchase")))
    assert(g.allowedEvents.select("event_type").distinct()
      .collect().map(_.getString(0)).toSeq === Seq("purchase"))
  }

  test("invalid configs are rejected at construction") {
    intercept[IllegalArgumentException] {
      GraftConfig.default.copy(cfAllowlist = Nil)
    }
    intercept[IllegalArgumentException] {
      GraftConfig.default.copy(addBatchCount = 0)
    }
  }
}
