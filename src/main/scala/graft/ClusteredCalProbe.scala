package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Calibration probe for the bench's clustered-recall leg (round-16
  * verdict #3, re-opened in round 17): finds corpus/nlist settings where
  * the p1 needle sits MID-SCALE instead of pinned at 1.000.
  *
  * Why the r16 fix (nlist 64 > 48 clusters) did not move the needle: cell
  * assignment ranks by DOT PRODUCT, and with tight blobs on huge centers
  * (center coords ±5, noise ±0.25) two centroids that land in one blob
  * differ by a small delta d — every member's assignment margin is
  * center·(d1−d2) ± noise·(d1−d2), and the CONSTANT center term is ~35×
  * the noise term, so the whole blob goes to one centroid and the other
  * starves. A blob can therefore never split across live cells, and p1
  * reads 1.000 at ANY nlist. Mid-scale needs within-blob spread
  * comparable to the center scale (noise·Δ competitive with center·Δ), so
  * this probe sweeps the noise half-width and nlist and reports recall at
  * probes ∈ {1,2,4} per setting.
  *
  * Args: space-separated settings `clusters:noiseHw:nlist[:nvec]`, e.g.
  * `48:2.5:64 8:3.0:64:20000`. Deterministic corpus (hash-based), so the
  * chosen setting is stable across runs and boxes. */
object ClusteredCalProbe {
  def main(args: Array[String]): Unit = {
    java.util.Locale.setDefault(java.util.Locale.ROOT)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val settings = args.toSeq.map { s =>
      val p = s.split(":")
      (p(0).toInt, p(1).toDouble, p(2).toInt,
        if (p.length > 3) p(3).toLong else 20000L)
    }
    settings.foreach { case (clusters, noiseHw, nlist, nVec) =>
      val root = java.nio.file.Files.createTempDirectory("graft_ccal").toString + "/ivf"
      val corpus = spark.range(nVec).select(
          col("id").as("vec_id"),
          expr(
            s"""transform(sequence(0, 63, 1), j -> cast(
               |  (pmod(hash(id % $clusters, j, 'center'), 10000) / 10000.0) * 10.0 - 5.0 +
               |  (pmod(hash(id, j, 'noise'), 1000) / 1000.0) * ${2 * noiseHw} - $noiseHw
               | as float))""".stripMargin).as("embedding"))
        .localCheckpoint()
      graft.operators.IvfIndex.build(corpus, root, nlist = nlist, iters = 5)
      val qs = corpus.filter(col("vec_id") % (nVec / 16) === 0)
        .select(col("vec_id").as("qid"), col("embedding").as("qv"))
        .localCheckpoint()
      val truth = AnnEval.top(graft.operators.IvfIndex.searchBatch(
        spark, root, qs, k = 10, probes = nlist))
      val live = spark.read.parquet(root + "/vectors")
        .select("cell").distinct().count()
      val entries = Seq(1, 2, 4, 8).map { p =>
        val got = AnnEval.top(
          graft.operators.IvfIndex.searchBatch(spark, root, qs, 10, probes = p))
        f"p$p=${AnnEval.recall(truth, got)}%.3f"
      }.mkString(" ")
      println(s"CAL clusters=$clusters noiseHw=$noiseHw nlist=$nlist " +
        s"nvec=$nVec live_cells=$live $entries")
      try graft.operators.Materialize.deleteLocalDir(
        new java.io.File(root).getParent)
      catch { case _: Throwable => }
    }
    spark.stop()
  }
}
