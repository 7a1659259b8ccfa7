package graft

import org.apache.spark.sql.DataFrame
import graft.operators.Changelog

/** Compaction semantics on literal changelogs (SURVEY.md §5 item 4):
  * put→put→delete→put sequences, delete-wins, determinism. */
class ChangelogSpec extends SparkSpec {
  import spark.implicits._

  // (event_id, ts_ns, user_id, event_type, value, props)
  private def events(rows: (Long, Long, Long, String, Double, String)*): DataFrame =
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")

  private def stateOf(df: DataFrame): Map[String, String] =
    Changelog.indexState(df).collect()
      .map(r => r.getAs[String]("rowkey") -> r.getAs[String]("event_type")).toMap

  test("latest put wins per rowkey") {
    val st = stateOf(events(
      (0L, 1000L, 1L, "click", 1.0, "{}"),
      (1L, 2000L, 1L, "view", 2.0, "{}"),
      (2L, 1500L, 2L, "signup", 3.0, "{}")))
    assert(st === Map("1" -> "view", "2" -> "signup"))
  }

  test("rowkey whose latest event is delete-class is absent") {
    val st = stateOf(events(
      (0L, 1000L, 1L, "click", 1.0, "{}"),
      (1L, 2000L, 1L, "error", 2.0, "{}"),   // tombstone last → gone
      (2L, 1000L, 2L, "error", 1.0, "{}"),
      (3L, 2000L, 2L, "view", 2.0, "{}")))   // put after delete → back
    assert(st === Map("2" -> "view"))
  }

  test("commit order (event_id) breaks ties, not input order") {
    val a = events((5L, 1L, 1L, "view", 1.0, "{}"), (9L, 1L, 1L, "click", 2.0, "{}"))
    val b = events((9L, 1L, 1L, "click", 2.0, "{}"), (5L, 1L, 1L, "view", 1.0, "{}"))
    assert(stateOf(a) === Map("1" -> "click"))
    assert(stateOf(b) === Map("1" -> "click"))
  }

  test("compaction is idempotent on an already-compacted changelog") {
    val ev = events(
      (0L, 1000L, 1L, "click", 1.0, "{}"),
      (1L, 2000L, 1L, "view", 2.0, "{}"),
      (2L, 9000L, 3L, "error", 0.0, "{}"),
      (3L, 1500L, 2L, "signup", 3.0, "{}"))
    val once = Changelog.indexState(ev)
    // Re-feed the compacted state as a changelog (reconstruct the shape).
    val again = Changelog.indexState(
      once.selectExpr("CAST(rowkey AS BIGINT) AS user_id",
        "CAST(rowkey AS BIGINT) AS event_id", "ts_us * 1000 AS ts",
        "event_type", "value", "concat('{\"k\": ', k, '}') AS props"))
    assert(once.select("rowkey", "event_type").collect().toSet ===
      again.select("rowkey", "event_type").collect().toSet)
  }
}
