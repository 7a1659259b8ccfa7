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

  test("q_distinct_approx HLL estimate is within 5% of the exact count (sf0.01)") {
    // q_distinct_approx has no DuckDB oracle by design (engine-specific
    // sketch); this pins its accuracy against the exact q_distinct counts
    // instead. approx_count_distinct's default rsd is 5%, and on sf0.01
    // cardinalities (~10^4 distinct parts per line status) the estimate
    // lands well inside that envelope.
    val dir = "/root/testdata/sf0.01"
    val approx = SparkEntry.queries("q_distinct_approx")(spark, dir)
      .collect().map(r => r.getString(0) ->
        (r.getAs[Long]("approx_parts"), r.getAs[Long]("approx_supps"))).toMap
    val exact = SparkEntry.queries("q_distinct")(spark, dir)
      .collect().map(r => r.getString(0) ->
        (r.getAs[Long]("n_parts"), r.getAs[Long]("n_supps"))).toMap
    assert(approx.keySet === exact.keySet)
    for ((k, (ep, es)) <- exact) {
      val (ap, as_) = approx(k)
      assert(math.abs(ap - ep).toDouble / ep < 0.05, s"parts estimate off >5% for $k: $ap vs $ep")
      assert(math.abs(as_ - es).toDouble / es < 0.05, s"supps estimate off >5% for $k: $as_ vs $es")
    }
  }
}
