package graft

import org.apache.spark.sql.DataFrame

/** Shared ANN measurement kernel for the two recall harnesses
  * (`Bench`'s `ann_recall` block and `graft.RecallProbe`) — one copy of
  * the per-query top-k collection, the truth-relative recall fold, and
  * the warm-then-time discipline, so a metric fix can never land in one
  * harness and silently not the other (round 10's recall-denominator fix
  * had to be applied twice). */
private[graft] object AnnEval {

  /** qid -> returned vec_id set, collected (bounded: n_queries × k). */
  def top(df: DataFrame): Map[Long, Set[Long]] =
    df.select("qid", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).map { case (q, rs) => q -> rs.map(_._2).toSet }

  /** Mean per-query recall vs `truth` — each query divided by its OWN
    * truth-set size (an exact search returning < k rows must not
    * silently understate recall). */
  def recall(truth: Map[Long, Set[Long]], got: Map[Long, Set[Long]]): Double =
    truth.map { case (q, t) =>
      got.getOrElse(q, Set.empty[Long]).intersect(t).size.toDouble /
        math.max(t.size, 1)
    }.sum / truth.size

  /** One warm EXECUTION (codegen, broadcasts — not just plan
    * construction), then one timed run: (results, seconds). */
  def warmThenTime(f: () => DataFrame): (Map[Long, Set[Long]], Double) = {
    top(f()): Unit
    val t0 = System.nanoTime()
    val m = top(f())
    (m, (System.nanoTime() - t0) / 1e9)
  }

  /** The JSON fragment both harnesses emit per setting. */
  def entryJson(name: String, truth: Map[Long, Set[Long]],
                f: () => DataFrame): String = {
    val (m, sec) = warmThenTime(f)
    f""""$name":{"recall":${recall(truth, m)}%.3f,"sec":$sec%.2f}"""
  }
}
