package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Filtered-ANN recall vs predicate SELECTIVITY — the measurement behind
  * `IvfIndex.searchFiltered`'s "selective predicates warrant more probes"
  * guidance (round-14 left it as prose; this gives it numbers).
  *
  * Corpus: RecallProbe's deterministic mixture of Gaussians (a query's
  * true neighbors are its own cluster's members by construction), built
  * FRESH with a colocated attribute `grp = vec_id % 100` — uniform across
  * clusters, so predicate selectivity is independent of cluster geometry
  * (the common "filter by tenant/language, rank by similarity" shape).
  * Predicates grp < {50, 10, 1} give selectivities {0.5, 0.1, 0.01}.
  *
  * For each selectivity × probes ∈ {1, 2, 4, nlist}: mean recall@10 of
  * `searchFiltered` against the filtered exact answer (probes = nlist
  * reads every cell, so it IS filtered brute force over the index).
  * Output: one JSON line (also .tmp/filtered_recall_probe.json);
  * SCALE.md carries the table and the derived probe guidance. */
object FilteredRecallProbe {

  def main(args: Array[String]): Unit = {
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

    val nlist = 16
    val clusters = 48
    val dim = 64
    val nVec = 20000
    // RecallProbe's corpus, plus the attribute column
    val corpus = spark.range(nVec.toLong).select(
      col("id").as("vec_id"),
      expr(
        s"""transform(sequence(0, ${dim - 1}, 1), j -> cast(
           |  (pmod(hash(id % $clusters, j, 'center'), 10000) / 10000.0) * 10.0 - 5.0 +
           |  (pmod(hash(id, j, 'noise'), 1000) / 1000.0) * 0.5 - 0.25
           | as float))""".stripMargin).as("embedding"),
      (col("id") % 100).cast("int").as("grp"))
      .localCheckpoint()
    val aRoot = java.nio.file.Files.createTempDirectory("graft_frecall")
    val root = aRoot.toString + "/ivf"
    IvfIndex.build(corpus, root, nlist = nlist, iters = 5,
      attrs = Seq("grp"))

    // 16 queries, one per 1250 ids — cluster members, like RecallProbe's
    val queries = corpus.filter(col("vec_id") % 1250 === 0)
      .select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1)))
    def top(df: DataFrame): Seq[Long] =
      df.collect().map(_.getLong(0)).toSeq
    val selectivities = Seq(("0.50", 50), ("0.10", 10), ("0.01", 1))
    val probeSettings = Seq(1, 2, 4, nlist)
    val blocks = selectivities.map { case (selLabel, cut) =>
      val pred = col("grp") < cut
      // truth per query: filtered EXACT top-10 (probes = nlist reads
      // every cell — filtered brute force over the index)
      val truth = queries.map { case (qid, qv) =>
        qid -> top(IvfIndex.searchFiltered(spark, root, qv, pred,
          k = 10, probes = nlist))
      }.toMap
      val cells = probeSettings.map { p =>
        val recalls = queries.map { case (qid, qv) =>
          val got = top(IvfIndex.searchFiltered(spark, root, qv, pred,
            k = 10, probes = p)).toSet
          val t = truth(qid)
          if (t.isEmpty) 1.0 else t.count(got.contains).toDouble / t.size
        }
        val mean = recalls.sum / recalls.length
        println(f"FRECALL sel=$selLabel probes=$p recall@10=$mean%.3f")
        f""""p$p":$mean%.3f"""
      }
      s""""sel_$selLabel":{${cells.mkString(",")}}"""
    }
    val json =
      s"""{"metric":"filtered_recall","clusters":$clusters,"nlist":$nlist,""" +
        s""""n_vec":$nVec,"n_queries":${queries.length},"k":10,""" +
        blocks.mkString(",") + "}"
    println(json)
    try {
      val out = java.nio.file.Paths.get(".tmp")
      java.nio.file.Files.createDirectories(out)
      java.nio.file.Files.write(out.resolve("filtered_recall_probe.json"),
        (json + "\n").getBytes("UTF-8")): Unit
    } catch { case e: Throwable => System.err.println(s"write failed: $e") }
    try graft.operators.Materialize.deleteLocalDir(aRoot.toString)
    catch { case _: Throwable => }
    spark.stop()
  }
}
