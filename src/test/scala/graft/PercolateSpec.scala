package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.operators.Percolate

/** Percolation (reverse search): the compiled-into-the-plan strategy and
  * the join strategy must agree exactly, and the compiled form must run
  * stateless under Structured Streaming append mode. */
class PercolateSpec extends SparkSpec {
  import spark.implicits._

  private val registry = Percolate.demoQueries

  private def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, String)] =
    df.collect().map(r =>
      (r.getAs[Long]("doc_id"), r.getAs[String]("query_id"))).toSet

  test("compiled and join strategies produce identical match pairs on fixture docs") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val compiled = pairs(Percolate.matchesCompiled(docs, registry))
    val joined = pairs(Percolate.matches(docs, registry))
    assert(compiled === joined)
    assert(compiled.nonEmpty, "fixture vocabulary should trigger some alerts")
  }

  test("conjunction semantics: all terms required, duplicates in a doc count once") {
    val docs = Seq(
      (1L, "spark join spark join"), // matches alert_spark_join
      (2L, "spark only here"),       // missing 'join'
      (3L, "join alone")             // missing 'spark'
    ).toDF("doc_id", "text")
    val expected = Set((1L, "alert_spark_join"))
    assert(pairs(Percolate.matches(docs, registry)) === expected)
    assert(pairs(Percolate.matchesCompiled(docs, registry)) === expected)
  }

  test("compiled percolation is stateless under streaming append mode (per-batch alerting)") {
    implicit val sqlCtx = spark.sqlContext
    val source = MemoryStream[(Long, String)]
    val alerts = Percolate.matchesCompiled(
      source.toDF().toDF("doc_id", "text"), registry)
    val query = alerts.writeStream
      .format("memory").queryName("percolate_alerts")
      .outputMode("append") // no aggregation state: append works as-is
      .start()
    try {
      source.addData((10L, "slow query ahead"), (11L, "nothing to see"))
      query.processAllAvailable()
      val got = pairs(spark.table("percolate_alerts"))
      assert(got === Set((10L, "alert_slow_query")))
    } finally {
      query.stop()
      spark.sql("DROP TABLE IF EXISTS percolate_alerts")
    }
  }
}
