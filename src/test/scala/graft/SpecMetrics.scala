package graft

/** Byte-level IO measurement for specs that pin WHAT a read touches, not
  * just which files it opens.
  *
  * The obvious counters don't work for local parquet in this Spark build:
  * `taskMetrics.inputMetrics.bytesRead` and the Hadoop scheme-global
  * storage statistics both see only footer traffic (data pages go through
  * a read path that never lands on those counters), and the scan node has
  * no per-projection byte metric (`filesSize` is the total file size
  * whatever the projection). `/proc/self/io`'s `rchar` counts every
  * read() syscall the JVM makes — page-cache hits included — and the
  * forked test JVM hosts both the driver and the local[4] executors, so a
  * delta around one action measures that action's real read volume (plus
  * a small, stable baseline of footer/metadata reads that subtracts out
  * when two scans over the same files are compared). Suites run
  * sequentially in the forked JVM, so deltas are attributable. */
object SpecMetrics {

  private def rchar(): Long = {
    val it = java.nio.file.Files.readAllLines(
      java.nio.file.Paths.get("/proc/self/io")).iterator()
    while (it.hasNext) {
      val line = it.next()
      if (line.startsWith("rchar:")) return line.split("\\s+")(1).toLong
    }
    sys.error("/proc/self/io has no rchar line")
  }

  /** Bytes read (read() syscalls, JVM-wide) while `f` runs.
    *
    * USAGE CONSTRAINT: rchar counts every read syscall — sockets (the
    * local executor RPC), /proc, classloading — which adds a fixed
    * ~100s-of-KiB baseline per Spark action. A pin built on this must
    * therefore compare two STRUCTURALLY IDENTICAL actions (same plan
    * shape, same files) whose only difference is the bytes under test,
    * and assert on the DELTA with a margin well above the baseline
    * jitter — e.g. column A's scan vs column B's scan of one table
    * (IvfPqSpec), or the same search on a with-payload vs without-payload
    * root (IncrementalPostingsSpec). Comparing two DIFFERENT operators'
    * totals drowns in the baseline. */
  def fsBytesRead(f: => Unit): Long = {
    val before = rchar()
    f
    rchar() - before
  }
}
