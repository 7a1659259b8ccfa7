package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.streaming.StateStore

/** Persisted IVF (inverted-file) vector index — the materialized form of
  * the ANN scale path that `q_ann_ivf` / `q_ann_multiprobe` demonstrate
  * inline (SCALE.md §vectors: "at 100 TB the cell assignment comes from
  * offline k-means and the table is partitioned by cell"). This object IS
  * that offline path:
  *
  *   - [[build]] trains a coarse quantizer with Lloyd's k-means
  *     (deterministically seeded), assigns every vector to its nearest
  *     cell, and writes `<path>/centroids` plus `<path>/vectors`
  *     PARTITIONED BY cell;
  *   - [[search]] ranks cells by query·centroid (nlist rows — metadata),
  *     and reads ONLY the probed cells' directories: the filter on the
  *     partition column prunes at the file listing, so a probe touches
  *     probes/nlist of the data before any arithmetic (asserted on
  *     `inputFiles` in IvfIndexSpec).
  *
  * All arithmetic is the same double-cast fold the query family uses; the
  * fixture embeddings are unit vectors, so argmax dot == argmin L2 and
  * cell assignment by max similarity is exact k-means assignment.
  *
  * At 100 TB: train on a hash-sample (`Index`-style deterministic split),
  * then one assignment pass + one partitioned write materialize the
  * index; incremental upserts ride the changelog pipeline into per-cell
  * bucket rewrites exactly like `IncrementalIndex`.
  */
object IvfIndex {

  /** query·centroid / vector·centroid in double precision: both sides cast
    * elementwise, left-to-right fold — bit-stable across plans. */
  private def dotDD(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, p) => acc + p)

  /** Nearest-cell assignment of every vector against the (broadcast)
    * centroid table: one narrow pass, top-1 per vector via
    * WindowGroupLimit (no global sort). */
  private def assign(vectors: DataFrame, centroids: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("vec_id")).orderBy(col("sim").desc, col("cell"))
    vectors.crossJoin(broadcast(centroids))
      .withColumn("sim", dotDD(col("cent"), col("embedding")))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .drop("rn", "sim", "cent")
  }

  /** Per-cell mean of the assigned vectors (the k-means update step —
    * the same two-level aggregation as `q_vector_centroid`). */
  private def recompute(assigned: DataFrame): DataFrame =
    assigned
      .select(col("cell"), posexplode(col("embedding")).as(Seq("i", "v")))
      .groupBy("cell", "i")
      .agg(avg(col("v").cast("double")).as("c"))
      .groupBy("cell")
      .agg(transform(array_sort(collect_list(struct(col("i"), col("c")))),
        s => s.getField("c")).as("cent"))

  /** Train the coarse quantizer and materialize the index. Seeding is the
    * `nlist` smallest vec_ids — deterministic, so rebuilds are stable.
    * Each iteration checkpoints the (tiny) centroid table to truncate the
    * iterative lineage. */
  def build(vectors: DataFrame, path: String, nlist: Int = 16, iters: Int = 5): Unit = {
    val e = vectors.select(col("vec_id"), col("embedding"))
    var centroids = e.orderBy("vec_id").limit(nlist)
      .select(
        (row_number().over(Window.orderBy("vec_id")) - 1).cast("int").as("cell"),
        transform(col("embedding"), _.cast("double")).as("cent"))
      .localCheckpoint()
    for (_ <- 1 to iters)
      centroids = recompute(assign(e, centroids)).localCheckpoint()
    centroids.write.mode("overwrite").parquet(path + "/centroids")
    assign(e, centroids).write.mode("overwrite")
      .partitionBy("cell").parquet(path + "/vectors")
  }

  /** The trained centroid table (cell, centroid). */
  def centroids(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path + "/centroids")

  /** Incrementally upsert vectors into a built index: assign against the
    * TRAINED centroids (the quantizer is not retrained — the standard IVF
    * maintenance contract; drifted distributions call for a rebuild), then
    * read + rewrite ONLY the cells the vectors land in, replacing rows by
    * vec_id (new wins). Per-cell swaps ride the same prefix-atomic
    * [[StateStore.commitBuckets]] protocol as the changelog merges, safe
    * under replay because re-running the same upsert reproduces the same
    * assignment and replacement. */
  def upsert(spark: SparkSession, path: String, vectors: DataFrame): Unit = {
    val vecRoot = path + "/vectors"
    val assigned = assign(vectors.select(col("vec_id"), col("embedding")),
      centroids(spark, path)).cache()
    try {
      val touched = assigned.select("cell").distinct().collect().map(_.getInt(0)).sorted
      if (touched.isEmpty) return
      val live = StateStore.liveBuckets(spark, vecRoot, "cell=").toSet
      val dirs = touched.toSeq.map(c => s"cell=$c")
      val oldPaths = dirs.filter(live.contains).map(d => s"$vecRoot/$d")
      val old =
        if (oldPaths.nonEmpty)
          spark.read.option("basePath", vecRoot).parquet(oldPaths: _*)
        else assigned.limit(0)
      val merged = old
        .join(assigned.select(col("vec_id").as("upserted")),
          col("vec_id") === col("upserted"), "left_anti")
        .unionByName(assigned)
        .cache()
      merged.count() // decouple from the cell files before the swap
      try StateStore.commitBuckets(spark, vecRoot, dirs) { tmpRoot =>
        merged.write.partitionBy("cell").mode("overwrite").parquet(tmpRoot)
      } finally merged.unpersist(): Unit
    } finally assigned.unpersist(): Unit
  }

  /** Probed ANN search: rank cells by query·centroid, then scan only the
    * top `probes` cells' partitions for the exact top-k. The cell list is
    * collected — it is nlist rows of metadata, never data. */
  def search(spark: SparkSession, path: String, query: Seq[Float],
             k: Int = 10, probes: Int = 2): DataFrame = {
    val qv = typedlit(query)
    val probed = centroids(spark, path)
      .withColumn("csim", dotDD(col("cent"), qv))
      .orderBy(col("csim").desc, col("cell"))
      .limit(probes)
      .select("cell").collect().map(_.getInt(0)).toSeq
    // heal any interrupted upsert swap before partition discovery (a
    // leftover cell=<c>.old dir would corrupt the inferred cell column)
    StateStore.liveBuckets(spark, path + "/vectors", "cell=")
    spark.read.parquet(path + "/vectors") // partition-discovered `cell` column
      .filter(col("cell").isin(probed: _*)) // prunes to probed directories
      .withColumn("sim", dotDD(col("embedding"), qv))
      .select(col("vec_id"), col("cell"), col("sim"))
      .orderBy(col("sim").desc, col("vec_id"))
      .limit(k)
  }
}
