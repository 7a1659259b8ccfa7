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
  *   - claim: list `<root>/_writers/e=<n>`, take `max + 1`, EXCLUSIVE-
  *     CREATE `e=<mine>` with a unique token and verify the token by
  *     read-back (see [[claim]] — atomic create arbitrates on
  *     HDFS/object stores; the read-back closes RawLocalFileSystem's
  *     check-then-act create). Epochs only grow; stale epoch FILES below
  *     the claimed one are garbage-collected by the claimant (owning the
  *     max means owning the root).
  *   - check: re-list; if any epoch exceeds mine — or the fence history
  *     is GONE (the root was replaced wholesale, e.g. a restore) — throw
  *     [[FencedException]].
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
    def check(spark: SparkSession): Unit = maxEpoch(spark, rootPath) match {
      case Some(newest) if newest > epoch =>
        throw new FencedException(
          s"writer epoch $epoch on $rootPath fenced out by epoch $newest: " +
            "a newer writer claimed this root (second stream, rescale, or " +
            "replacement driver); this writer must stop")
      case Some(_) => // still the newest claim — proceed
      case None =>
        // the fence history this writer claimed into no longer exists:
        // the root was replaced wholesale (restore, manual surgery).
        // Whatever now lives here is NOT the state this writer was
        // advancing — absent history must fence, not grant a free pass
        throw new FencedException(
          s"writer epoch $epoch on $rootPath found no fence history: the " +
            "root was replaced since this claim (restore or manual " +
            "replacement); this writer must stop and re-claim")
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
    * claimant must `check` at every subsequent writer entrypoint.
    *
    * Arbitration: EXCLUSIVE CREATE of the epoch file (`create` with
    * `overwrite = false`) — atomic on HDFS and object stores, where a
    * losing racer gets `FileAlreadyExistsException` and steps to the
    * next number. Rename-if-absent was the previous arbiter and is WRONG
    * off-HDFS: POSIX rename (RawLocalFileSystem, and S3A's copy-based
    * rename) silently overwrites an existing destination, so two racers
    * could both "own" one epoch. On `file://`, where Hadoop's exclusive
    * create is itself check-then-act, the claim drops to NIO
    * `createFile` (O_EXCL — the kernel's atomic arbiter; a race spec
    * caught two owners of one epoch before this). Elsewhere a READ-BACK
    * VERIFICATION backstops create: each claimant writes a unique token
    * and re-reads — the file holds one token, so at most one claimant
    * verifies. (On object stores without conditional puts the residual
    * is the store's own create semantics — the same caveat as every
    * rename-based commit here; SCALE.md points those deployments at a
    * table format / lock service.) */
  def claim(spark: SparkSession, rootPath: String): Fence = {
    val dir = new Path(writersDir(rootPath))
    val fs = dir.getFileSystem(spark.sessionState.newHadoopConf())
    fs.mkdirs(dir)
    val token = java.util.UUID.randomUUID().toString
    var attempt = maxEpoch(spark, rootPath).getOrElse(0L) + 1
    var claimed = -1L
    var failures = 0
    while (claimed < 0) {
      val target = new Path(dir, s"e=$attempt")
      val won =
        try {
          if (fs.getScheme == "file") {
            // RawLocalFileSystem's create(overwrite = false) is
            // check-then-act — a race spec produced two owners of one
            // epoch through it. O_EXCL (NIO createFile) is the local
            // filesystem's REAL atomic arbiter; the content write after
            // it is informational only
            val local = java.nio.file.Paths.get(target.toUri.getPath)
            java.nio.file.Files.createFile(local)
            java.nio.file.Files.write(local, token.getBytes("UTF-8"))
            true
          } else {
            val out = fs.create(target, false)
            try out.write(token.getBytes("UTF-8")) finally out.close()
            val in = fs.open(target)
            val content = try new String(in.readAllBytes(), "UTF-8") finally in.close()
            content == token
          }
        } catch {
          case e: IOException =>
            // exists / racing — step past; but a persistently failing
            // filesystem must surface, not spin epochs forever
            failures += 1
            if (failures > 100)
              throw new IOException(
                s"cannot claim a writer epoch under $dir after $failures attempts", e)
            false
        }
      if (won) {
        // winning the CREATE is not yet winning the EPOCH: a newer
        // claimant GCs retired epoch files, and its delete can land
        // between this racer computing `attempt` and creating the file —
        // the create then resurrects a number the newer claimant already
        // owned and retired (two writers would report one epoch). The
        // newer claimant's own file is created BEFORE it GCs, so a
        // resurrection is always visible as max > attempt: discard the
        // corpse and step past the newest instead.
        val newest = maxEpoch(spark, rootPath).getOrElse(attempt)
        if (newest > attempt) {
          fs.delete(target, true): Unit
          attempt = newest + 1
        } else claimed = attempt
      }
      else attempt = math.max(attempt + 1, maxEpoch(spark, rootPath).getOrElse(0L) + 1)
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
