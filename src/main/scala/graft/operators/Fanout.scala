package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** Scale-adaptive scan fan-out (guide §2.5/§2.6 discipline: partitioning
  * derived from the input, never a constant tuned for one deployment).
  *
  * The local fixture tables are single-row-group parquet files, so a scan
  * cannot split below one task and every explode/aggregate downstream of
  * it inherits serial execution — the historical fix was an unconditional
  * `repartition(col)`, which buys 32-way parallelism locally but becomes
  * a full corpus-payload exchange the moment the same operator runs over
  * a table that already has thousands of splits (the 100 TB case, where
  * the repartition is pure waste). `scan` repartitions ONLY when the
  * scan's planned parallelism is far below the cluster's
  * (`defaultParallelism / 2`), so the exchange exists exactly where it
  * pays for itself and disappears at scale.
  *
  * The partition probe (`rdd.getNumPartitions`) is driver-side planning
  * metadata — file listing, no job — and file-source listings are cached
  * per session, so repeated calls cost nothing measurable. */
object Fanout {
  def scan(df: DataFrame): DataFrame = {
    val sc = df.sparkSession.sparkContext
    val target = sc.defaultParallelism
    if (df.rdd.getNumPartitions * 2 < target) df.repartition(target) else df
  }

  /** [[scan]] keyed: hash-repartition on `key` when fan-out is needed —
    * for downstreams that also want the key's clustering (e.g. a per-key
    * aggregate right after the expansion). */
  def scanBy(df: DataFrame, key: String): DataFrame = {
    val sc = df.sparkSession.sparkContext
    val target = sc.defaultParallelism
    if (df.rdd.getNumPartitions * 2 < target) df.repartition(target, col(key))
    else df
  }
}
