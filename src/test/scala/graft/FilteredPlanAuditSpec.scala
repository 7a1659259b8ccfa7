package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.operators.IvfIndex

/** Plan-shape audit for the filtered probe: the attribute predicate must
  * reach the parquet scan of the probed cells as a PUSHED filter (data
  * skipping at the row-group level), not evaluate post-scan only — the
  * "scan-pushed" claim searchFiltered's doc makes. */
class FilteredPlanAuditSpec extends SparkSpec {
  import spark.implicits._

  test("searchFiltered's predicate reaches the cell scan as a pushed filter") {
    val ivf = Files.createTempDirectory("graft_fpa").toString + "/ivf"
    val vecs = (0L until 16L).map(i =>
      (i, Array(math.cos(0.1 * i).toFloat, math.sin(0.1 * i).toFloat),
        if (i % 2 == 0) "even" else "odd"))
    IvfIndex.build(vecs.toDF("vec_id", "embedding", "grp"), ivf,
      nlist = 2, iters = 2, attrs = Seq("grp"))
    val plan = IvfIndex.searchFiltered(spark, ivf, Seq(1f, 0f),
        col("grp") === "even", k = 4, probes = 2)
      .queryExecution.executedPlan.toString
    // the scan node must advertise the attribute equality in
    // PushedFilters — that is what turns the predicate into row-group
    // skipping at 100 TB instead of a decode-then-drop
    assert(plan.contains("PushedFilters:") &&
      plan.matches("(?s).*PushedFilters: \\[[^\\]]*EqualTo\\(grp,even\\).*"),
      s"grp = 'even' must be pushed to the parquet scan; got plan:\n$plan")
  }
}
