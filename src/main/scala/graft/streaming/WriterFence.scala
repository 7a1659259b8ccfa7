package graft.streaming

import java.io.IOException

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Cross-PROCESS single-writer fence for a state root — the epoch
  * ("fencing token") pattern: each writer claims a strictly increasing
  * epoch with an atomic rename, and a writer whose epoch is no longer the
  * maximum fails its next check loudly instead of corrupting the state.
  *
  * WHY: [[StateStore]]'s contract is one writer per root. WITHIN one
  * process a Structured Streaming query provides that (foreachBatch
  * invocations are serialized), but nothing stops an operations mistake —
  * two streams started on one root, a [[IngestPipeline.rescale]] racing a
  * live stream, or the classic zombie: a driver presumed dead (GC pause,
  * network partition) resuming its in-flight merge after a replacement
  * driver was started. Interleaved bucket swaps from two writers are
  * exactly the corruption the single-writer rule exists to prevent.
  *
  * PROTOCOL (all through the Hadoop FileSystem API, like the swaps):
  *   - claim: list `<root>/_writers/e=<n>`, take `max + 1`, write a tmp
  *     file and RENAME it to `e=<mine>` — rename-if-absent is the
  *     filesystem's atomic arbiter (HDFS semantics; same primitive as
  *     every marker here), so of two racing claimants exactly one owns
  *     each epoch and the loser retries on the next number. Epochs only
  *     grow; stale epoch FILES below the claimed one are garbage-collected
  *     by the claimant (owning the max means owning the root).
  *   - check: re-list; if any epoch exceeds mine, throw [[FencedException]].
  *     Run it at every writer entrypoint — batch start, maintenance pass,
  *     rescale — so a fenced-out writer dies at the next boundary.
  *
  * GUARANTEE AND LIMIT: a new claim makes every older writer fail its
  * NEXT check; a zombie that already passed its check and is mid-swap is
  * not interrupted — directory renames give atomic arbitration but no
  * compare-and-swap, so the residual window is one in-flight batch. The
  * merges themselves are idempotent latest-wins rewrites, which bounds
  * that window's damage to a stale-but-consistent bucket a checkpointed
  * replay rewrites; closing it entirely needs a commit primitive with CAS
  * (a lock service, or the MERGE-capable table formats SCALE.md names for
  * object stores). This is the standard fencing discipline on
  * rename-atomic filesystems.
  *
  * Fences do not auto-expire: liveness is the operator's (or the
  * replacement process's) decision — the REPLACEMENT claims, the old
  * writer fences out. There is deliberately no `release`: deleting the
  * max epoch would let an older zombie become the maximum again. */
object WriterFence {

  /** Thrown by [[Fence.check]] when a newer writer has claimed the root.
    * Extends IOException so existing fail-loudly paths treat it as the
    * state-integrity error it is. */
  final class FencedException(message: String) extends IOException(message)

  /** A claimed writer epoch on `rootPath`. `check` is cheap (one
    * directory listing) — run it at every writer entrypoint. */
  final class Fence private[WriterFence] (val rootPath: String, val epoch: Long) {
    def check(spark: SparkSession): Unit = {
      val newest = maxEpoch(spark, rootPath)
      if (newest.exists(_ > epoch))
        throw new FencedException(
          s"writer epoch $epoch on $rootPath fenced out by epoch ${newest.get}: " +
            "a newer writer claimed this root (second stream, rescale, or " +
            "replacement driver); this writer must stop")
    }
  }

  /** Name of the per-root fence directory (claimed epochs live under it). */
  val FenceDir = "_writers"

  private def writersDir(rootPath: String) = s"$rootPath/$FenceDir"

  /** The highest claimed epoch, if any writer ever claimed this root. */
  def maxEpoch(spark: SparkSession, rootPath: String): Option[Long] = {
    val dir = new Path(writersDir(rootPath))
    val fs = dir.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(dir)) None
    else fs.listStatus(dir).map(_.getPath.getName)
      .filter(_.startsWith("e="))
      .flatMap(n => scala.util.Try(n.stripPrefix("e=").toLong).toOption)
      .maxOption
  }

  /** Claim the next writer epoch on `rootPath`. Returns the fence the
    * claimant must `check` at every subsequent writer entrypoint. Racing
    * claimants are serialized by rename-if-absent; the loser retries on
    * the next epoch number. */
  def claim(spark: SparkSession, rootPath: String): Fence = {
    val dir = new Path(writersDir(rootPath))
    val fs = dir.getFileSystem(spark.sessionState.newHadoopConf())
    fs.mkdirs(dir)
    val token = java.util.UUID.randomUUID().toString
    var attempt = maxEpoch(spark, rootPath).getOrElse(0L) + 1
    var claimed = -1L
    while (claimed < 0) {
      val tmp = new Path(dir, s"e=$attempt.tmp-$token")
      val out = fs.create(tmp, true)
      try out.write(token.getBytes("UTF-8")) finally out.close()
      if (fs.rename(tmp, new Path(dir, s"e=$attempt"))) claimed = attempt
      else {
        // another claimant owns this epoch — step past it
        fs.delete(tmp, true)
        attempt = math.max(attempt + 1, maxEpoch(spark, rootPath).getOrElse(0L) + 1)
      }
    }
    // owning the max epoch means owning the root: clear stale epoch files
    // and dead claim tmps (an e= name that doesn't parse is a tmp whose
    // claimant either renamed it already or died before the rename)
    fs.listStatus(dir).map(_.getPath.getName)
      .filter(_.startsWith("e="))
      .filter(n => scala.util.Try(n.stripPrefix("e=").toLong).toOption
        .forall(_ < claimed))
      .foreach(n => fs.delete(new Path(dir, n), true): Unit)
    new Fence(rootPath, claimed)
  }
}
