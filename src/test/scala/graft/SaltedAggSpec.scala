package graft

import org.apache.spark.sql.functions._
import graft.api.Graft

/** The salted two-phase distinct count must agree exactly with the plain
  * countDistinct, on skewed fixture data (events.user_id is deliberately
  * hot-keyed). */
class SaltedAggSpec extends SparkSpec {

  test("salted distinct count equals plain countDistinct on skewed keys") {
    val g = Graft(spark, "/root/testdata/sf0.001")
    val ev = g.events
    val salted = g.distinctCountSalted(ev, "user_id", "event_id", buckets = 8)
      .collect().map(r => r.getAs[Long]("user_id") -> r.getAs[Long]("n_distinct")).toMap
    val plain = ev.groupBy("user_id").agg(countDistinct(col("event_id")).as("n"))
      .collect().map(r => r.getAs[Long]("user_id") -> r.getAs[Long]("n")).toMap
    assert(salted === plain)
    assert(salted.values.sum === 1000L) // every event_id is unique
  }

  test("salted distinct count with one bucket degenerates to the plain form") {
    val g = Graft(spark, "/root/testdata/sf0.001")
    val one = g.distinctCountSalted(g.events, "event_type", "user_id", buckets = 1)
      .collect().map(r => r.getString(0) -> r.getAs[Long]("n_distinct")).toMap
    assert(one.values.forall(v => v > 0 && v <= 15))
  }
}
