package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.operators.{Hybrid, IvfIndex}
import graft.streaming.IncrementalPostings

/** Hybrid BM25 ⊕ vector retrieval (RRF fusion) over maintained state. */
class HybridSpec extends SparkSpec {
  import spark.implicits._

  test("RRF fusion ranks a doc first that NEITHER leg ranks first") {
    val tmp = Files.createTempDirectory("graft_hyb").toString
    val postings = tmp + "/postings"
    val ivf = tmp + "/ivf"
    // Lexical: A wins (tf 3+1), C second (tf 1+1), B absent (no term).
    // Vector (qv = [1,0]): B wins (sim 1.0), C second (0.8); legDepth=2
    // drops A from the vector leg. Fusion: C = 1/62 + 1/62 ≈ 0.0323
    // beats A = B = 1/61 ≈ 0.0164 — consensus outranks either champion,
    // the property that makes RRF fusion an operator and not a concat.
    IncrementalPostings.mergeBatch(spark, Seq(
      ("1", 1L, "put", "merge merge merge sort pad"),
      ("2", 2L, "put", "zzz yyy xxx"),
      ("3", 3L, "put", "merge sort pad")
    ).toDF("rowkey", "event_id", "op", "text"), postings)
    IvfIndex.build(Seq(
      (1L, Array(0f, 1f)),
      (2L, Array(1f, 0f)),
      (3L, Array(0.8f, 0.6f))
    ).toDF("vec_id", "embedding"), ivf, nlist = 2, iters = 2)
    val fused = Hybrid.hybridSearchMaintained(spark, postings, ivf,
      terms = Seq("merge", "sort"), qv = Seq(1f, 0f), probes = 2,
      legDepth = 2)
      .select("doc_id", "bm25_rank", "vec_rank", "rrf").collect()
    val order = fused.map(_.getLong(0)).toSeq
    assert(order === Seq(3L, 1L, 2L),
      s"RRF must rank the consensus doc (3) over each leg's own #1, got $order")
    val byId = fused.map(r =>
      r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(byId(3L) === ((2L, 2L)), "doc 3 is rank 2 in BOTH legs")
    assert(byId(1L) === ((1L, 0L)), "doc 1: lexical #1, absent from vector leg")
    assert(byId(2L) === ((0L, 1L)), "doc 2: vector #1, absent from lexical leg")
    // each leg alone would have led with its own champion — 1 and 2 —
    // and the fused head is neither
    assert(order.head != 1L && order.head != 2L)
  }

  test("an absent leg contributes exactly 0, never a rank-0 reciprocal") {
    val tmp = Files.createTempDirectory("graft_hyb0").toString
    val postings = tmp + "/postings"
    val ivf = tmp + "/ivf"
    IncrementalPostings.mergeBatch(spark, Seq(
      ("7", 1L, "put", "merge sort")
    ).toDF("rowkey", "event_id", "op", "text"), postings)
    IvfIndex.build(Seq((8L, Array(1f, 0f)))
      .toDF("vec_id", "embedding"), ivf, nlist = 1, iters = 1)
    val got = Hybrid.hybridSearchMaintained(spark, postings, ivf,
      terms = Seq("merge"), qv = Seq(1f, 0f), probes = 1)
      .select("doc_id", "rrf").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // 1/(60+1) rounded to 6 dp — a doc absent from one leg scores the
    // OTHER leg's reciprocal only (0-filled rank never enters the sum,
    // which would wrongly add 1/60)
    val one = BigDecimal(1.0 / 61).setScale(6, BigDecimal.RoundingMode.HALF_UP)
      .toDouble
    assert(got === Map(7L -> one, 8L -> one))
  }

  test("the maintained twin reads ONLY the two state roots — no corpus file") {
    val frame = Hybrid.queries("q_hybrid_maintained")(
      spark, "/root/testdata/sf0.001")
    val inputs = frame.inputFiles
    assert(inputs.nonEmpty)
    for (f <- inputs)
      assert(f.contains("/postings/") || f.contains("/ivf/"),
        s"hybrid maintained read outside the postings/IVF state roots: $f")
    assert(!inputs.exists(_.contains("/testdata/")),
      "hybrid maintained must never scan a corpus parquet")
  }
}
