package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.operators.Vectors

class VectorsSpec extends SparkSpec {
  import spark.implicits._

  test("dot() is the double-precision left-fold dot product") {
    val df = Seq((Array(1.0f, 2.0f, 3.0f), Array(4.0f, 5.0f, 6.0f)))
      .toDF("a", "b")
      .select(Vectors.dot("a", "b").as("d"))
    assert(df.head().getDouble(0) === 32.0)
  }

  test("signBucket packs the first 8 sign bits little-endian") {
    val v = Array(1f, -1f, 1f, -1f, -1f, -1f, -1f, 1f, 9f) // bits 0,2,7 set
    val df = Seq(Tuple1(v)).toDF("embedding")
      .select(Vectors.signBucket("embedding").as("b"))
    assert(df.head().getInt(0) === (1 | 4 | 128))
  }

  test("multi-probe recall dominates single-cell IVF") {
    // Probing 2 cells must return results at least as similar as probing
    // only the query's own cell: the multiprobe top-10's worst sim ≥ the
    // single-probe top-10's worst sim whenever both are full.
    val dir = "/root/testdata/sf0.001"
    def worst(q: String): Double = {
      val sims = SparkEntry.queries(q)(spark, dir)
        .collect().map(_.getAs[Double]("sim"))
      assert(sims.nonEmpty); sims.min
    }
    assert(worst("q_ann_multiprobe") >= worst("q_ann_ivf"))
  }

  test("centroids average to the per-cell mean, one row per (label, dim)") {
    val dir = "/root/testdata/sf0.001"
    val c = SparkEntry.queries("q_vector_centroid")(spark, dir).collect()
    val nLabels = c.map(_.getAs[Any]("label")).distinct.length
    val dims = c.map(_.getAs[Long]("dim")).max
    assert(c.length === nLabels * dims)
    // centroid components of unit vectors stay inside the unit ball
    assert(c.forall(r => math.abs(r.getAs[Double]("c")) <= 1.0))
  }

  test("vector top-k ranks an identical vector first") {
    val d = Files.createTempDirectory("graft_vec").toString
    val q = Array.fill(4)(0.5f)
    val rows = Seq(
      (0L, q, 0),
      (1L, q, 0),                                 // identical to the query
      (2L, Array(1f, 0f, 0f, 0f), 1),
      (3L, Array(-0.5f, -0.5f, -0.5f, -0.5f), 2)) // opposite
    rows.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$d/embeddings.parquet")
    val top = SparkEntry.queries("q_vector_topk")(spark, d).collect()
    assert(top.head.getAs[Long]("vec_id") === 1L)
    assert(top.head.getAs[Double]("sim") === 1.0)
    assert(top.last.getAs[Double]("sim") === -1.0)
  }

  test("PQ codes are 16 4-bit ids per vector; ADC shortlist holds the exact in-cell top-10") {
    import org.apache.spark.sql.functions._
    val dir = "/root/testdata/sf0.001"
    val codes = graft.operators.Vectors.sharedPqCodes(spark, dir).collect()
    assert(codes.nonEmpty)
    // 16 subspace ids in [0, 16): a 64-d float vector (256 bytes) encodes
    // to 16 4-bit ids (8 bytes packed) — the 16x-compression contract
    codes.foreach { r =>
      val cs = r.getSeq[Int](r.fieldIndex("codes"))
      assert(cs.length === 16 && cs.forall(c => c >= 0 && c < 16), r.toString)
    }
    // every embedding encodes exactly once
    assert(codes.map(_.getAs[Long]("vec_id")).distinct.length === codes.length)
    // recall contract behind q_ann_pq's exact oracle: the final top-10
    // equals the brute-force in-cell top-10 (rerank is exact, so this
    // holds iff the ADC shortlist contained the true winners)
    val pq = SparkEntry.queries("q_ann_pq")(spark, dir).collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Double]("sim"))).toSeq
    val brute = SparkEntry.queries("q_ann_ivf")(spark, dir).collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Double]("sim"))).toSeq
    assert(pq === brute)
  }
}
