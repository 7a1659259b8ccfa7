package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev harness (not shipped): the q_ann_pq_batch constant bisect — the
  * round-14 diff added a colocated attribute column (`label`) to the
  * maintained ANN fixture's cell files, and the suite's most expensive
  * key has crept toward the 2 s bar across rounds. This A/Bs the EXACT
  * read (`searchBatchPq`, same batch, same parameters) against two roots
  * built by the fixture's own recipe — one with the attribute column,
  * one without — plus a job-count reading, so "the attrs widened the
  * scan" is either confirmed with a number or retired.
  * `Test/runMain graft.PqBatchProbe`. */
object PqBatchProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.IvfIndex
    val nlist = graft.operators.Vectors.AnnFixtureNlist
    val e = Tables.embeddings(spark, sfDir)
    val qs = e.as("a")
      .join(e.as("b"), col("b.vec_id") === col("a.vec_id") + 100)
      .filter(col("a.vec_id") < 3)
      .select(col("a.vec_id").as("qid"), col("b.embedding").as("qv"))
      .localCheckpoint()
    def buildRoot(withAttrs: Boolean): String = {
      val root = java.nio.file.Files
        .createTempDirectory(s"graft_pqab_$withAttrs").toString + "/ivf"
      val t0 = System.nanoTime()
      val (cols, attrs) =
        if (withAttrs) (e.select("vec_id", "embedding", "label"), Seq("label"))
        else (e.select("vec_id", "embedding"), Seq.empty[String])
      IvfIndex.build(cols, root, nlist = nlist, iters = 2,
        pq = Some(IvfIndex.PqSpec()), attrs = attrs)
      val tb = (System.nanoTime() - t0) / 1e9
      val t1 = System.nanoTime()
      val delta0 = e.as("a")
        .join(e.as("b"), col("b.vec_id") === col("a.vec_id") + 100)
        .filter(col("a.vec_id") < 10)
        .select(col("a.vec_id").as("vec_id"),
          col("b.embedding").as("embedding"), col("a.label").as("label"))
      val delta = if (withAttrs) delta0 else delta0.drop("label")
      IvfIndex.upsert(spark, root, delta)
      IvfIndex.delete(spark, root,
        e.filter(col("vec_id") % 37 === 11 || col("vec_id") === 100)
          .select("vec_id"))
      val tm = (System.nanoTime() - t1) / 1e9
      println(f"PQAB build(attrs=$withAttrs) build=$tb%.2f s upsert+delete=$tm%.2f s")
      root
    }
    def time(root: String, label: String): Unit = {
      def run(): Unit = IvfIndex.searchBatchPq(spark, root, qs, k = 3,
          probes = nlist, shortlist = 1 << 20)
        .write.format("noop").mode("overwrite").save()
      run() // warm
      val jobs = SpecMetrics.jobsRun(spark)(run())
      val trials = (1 to 7).map { _ =>
        val t0 = System.nanoTime(); run(); (System.nanoTime() - t0) / 1e9
      }
      println(f"PQAB $label jobs=$jobs min=${trials.min}%.3f " +
        s"trials=${trials.map(t => f"$t%.3f").mkString(",")}")
    }
    val plain = buildRoot(withAttrs = false)
    val attrs = buildRoot(withAttrs = true)
    time(plain, "searchBatchPq(plain)")
    time(attrs, "searchBatchPq(attrs)")
    // interleave once more to push scheduling noise off the comparison
    time(plain, "searchBatchPq(plain#2)")
    time(attrs, "searchBatchPq(attrs#2)")
    spark.stop()
  }
}
