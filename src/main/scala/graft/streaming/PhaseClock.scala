package graft.streaming

/** Wall-clock attribution for the named phases of a multi-stage driver
  * operation — the instrumentation seam behind the ingest gate's
  * phase-split (round-16 verdict #4: the gate became the dominant half of
  * the per-batch fixed cost with three rounds of merge-side proof and none
  * of its own; `gate_sec` alone cannot say WHETHER the probe, the scoring,
  * or the durable log commit binds).
  *
  * Phases accumulate: the same name timed across N micro-batches sums, so
  * a bench leg's per-phase totals are comparable to its `gate_sec`.
  * Driver-thread use only (the bench protocol runs batches sequentially);
  * a LinkedHashMap keeps emission in first-seen phase order. */
final class PhaseClock {
  private val acc = scala.collection.mutable.LinkedHashMap[String, Double]()

  def time[T](name: String)(f: => T): T = {
    val t0 = System.nanoTime()
    try f
    finally acc(name) = acc.getOrElse(name, 0.0) + (System.nanoTime() - t0) / 1e9
  }

  /** (phase, cumulative seconds) in first-seen order. */
  def phases: Seq[(String, Double)] = acc.toSeq
}
