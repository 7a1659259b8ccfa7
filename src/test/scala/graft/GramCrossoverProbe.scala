package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev harness (not shipped): the percolation phrase-stage CROSSOVER —
  * compiled `GramCount` containment scan vs k-gram array expansion,
  * measured at registry sizes {8, 32, 128, 512} distinct grams on the
  * 1× and 30× corpus, both strategies FORCED at every size (the
  * `gramScanMax` seam). Round 14 chose `GramScanMax = 32` from the
  * endpoints; this measures the actual crossover so the constant is
  * justified (or moved) by data. Results parity-checked per cell.
  * `Test/runMain graft.GramCrossoverProbe`. */
object GramCrossoverProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.Percolate

    val base = Tables.documents(spark, sfDir).select("doc_id", "text")
    def corpusAt(n: Int) =
      (0 until n).map(r => base.select(
        (col("doc_id") + r * 1000000L).as("doc_id"), col("text")))
        .reduce(_ unionAll _).localCheckpoint()
    // registry phrases: REAL corpus 3-gram shingles (so the scan does its
    // true work — phrases that hit), picked deterministically by hash.
    // 2048 covers the round-16 crossover legs (round 15 measured up to
    // 512 and EXTRAPOLATED the crossover to ~1-2k grams; these legs pin
    // it with data).
    val allGrams = base
      .select(explode(graft.streaming.IncrementalShingles
        .shingleize(col("text"))).as("g"))
      .distinct()
      .orderBy(abs(hash(col("g"))), col("g"))
      .limit(2048).collect().map(_.getString(0))
    println(s"GRAMX distinct corpus grams available=${allGrams.length}")
    def registry(n: Int) = {
      import spark.implicits._
      allGrams.take(n).zipWithIndex
        .map { case (g, i) => (i.toLong, g, "phrase") }
        .toSeq.toDF("query_id", "term", "role")
        .localCheckpoint()
    }
    def minOf3(f: => Long): (Double, Long) = {
      f // warm
      var rows = 0L
      val t = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); rows = f
        (System.nanoTime() - t0) / 1e9
      }.min
      (t, rows)
    }
    val out = new StringBuilder("{\"metric\":\"gram_crossover\"")
    for ((scale, n) <- Seq(("1x", 1), ("30x", 30))) {
      val docs = corpusAt(n)
      println(s"GRAMX corpus $scale docs=${docs.count()}")
      for (size <- Seq(8, 32, 128, 512, 1024, 2048)) {
        val reg = registry(size)
        def run(forced: Long): (Double, Long) = minOf3 {
          Percolate.matchesBoolFrame(docs, reg, gramScanMax = forced)
            .count()
        }
        val (scanSec, scanRows) = run(Long.MaxValue)
        val (expSec, expRows) = run(0L)
        require(scanRows == expRows,
          s"strategy parity broken at $scale/$size: $scanRows vs $expRows")
        println(f"GRAMX $scale grams=$size scan=$scanSec%.2f s expansion=$expSec%.2f s rows=$scanRows")
        out.append(f""","${scale}_g$size":{"scan":$scanSec%.3f,"expansion":$expSec%.3f}""")
      }
    }
    out.append("}")
    println(out.toString)
    spark.stop()
  }
}
