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

  private def qStarJoin(spark: SparkSession, dir: String): DataFrame = {
    // The TPC-H Q5 star shape — revenue per (region, nation) for one
    // order year — planned the way a 100 TB warehouse wants it: the
    // whole dimension chain customer→nation→region is built first and
    // BROADCAST (dims are orders-of-magnitude below the fact tables;
    // nation/region are constant-sized), so the only real shuffle is the
    // fact-fact lineitem⋈orders equi-join on orderkey — at scale the
    // pair one co-partitions/buckets on that key. The date filter is a
    // RANGE predicate (not year(...)), so it pushes to the orders
    // parquet scan and prunes row groups before the join.
    val dims = Tables.customer(spark, dir)
      .join(Tables.nation(spark, dir), col("c_nationkey") === col("n_nationkey"))
      .join(Tables.region(spark, dir), col("n_regionkey") === col("r_regionkey"))
      .select(col("c_custkey"), col("n_name"), col("r_name"))
    val orders96 = Tables.orders(spark, dir)
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
      .select("o_orderkey", "o_custkey")
    Tables.lineitem(spark, dir)
      .select(col("l_orderkey"),
        (col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("rev"))
      .join(orders96, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(dims), col("o_custkey") === col("c_custkey"))
      .groupBy("r_name", "n_name")
      .agg(round(sum(col("rev")), 2).as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy("r_name", "n_name")
  }

  val queries: Map[String, Q] = Map(
    "q_rowkey_join" -> qRowkeyJoin,
    "q_star_join" -> qStarJoin)

  val oracle: Map[String, String] = Map(
    "q_rowkey_join" ->
      """SELECT o_orderkey, o_custkey, c_name, round(o_totalprice, 2) AS price
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING'
        |ORDER BY o_orderkey""".stripMargin,
    "q_star_join" ->
      """SELECT r_name, n_name,
        |       round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue,
        |       count(*) AS n_items
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate < TIMESTAMP '1997-01-01'
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)
}
