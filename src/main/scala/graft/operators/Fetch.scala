package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Row-fetch family — the reference's read topology: query Solr for matching
  * rowkeys, then multi-Get the full rows from HBase
  * (/root/reference/README.md:12-13; SURVEY.md §2.B S12). In one engine this
  * collapses to a join: the filtered "index hit" side drives a fetch of full
  * rows.
  *
  * Scale notes: the hit side (filtered customers) is small relative to the
  * fact table, so it is explicitly `broadcast()` — the 100 TB orders scan
  * never shuffles; each task probes a broadcast hash map. Verified in the
  * plan: BroadcastHashJoin with BuildRight, zero Exchange on the probe side.
  */
object Fetch {
  type Q = (SparkSession, String) => DataFrame

  private def qRowkeyJoin(spark: SparkSession, dir: String): DataFrame = {
    val hits = Tables.customer(spark, dir)
      .filter(col("c_mktsegment") === "BUILDING")
      .select("c_custkey", "c_name")
    Tables.orders(spark, dir)
      .join(broadcast(hits), col("o_custkey") === col("c_custkey"))
      .select(col("o_orderkey"), col("o_custkey"), col("c_name"),
        round(col("o_totalprice"), 2).as("price"))
      .orderBy("o_orderkey")
  }

  val queries: Map[String, Q] = Map(
    "q_rowkey_join" -> qRowkeyJoin)

  val oracle: Map[String, String] = Map(
    "q_rowkey_join" ->
      """SELECT o_orderkey, o_custkey, c_name, round(o_totalprice, 2) AS price
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING'
        |ORDER BY o_orderkey""".stripMargin)
}
