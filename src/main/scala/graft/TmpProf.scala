package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object TmpProf {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    def t(name: String)(df: => org.apache.spark.sql.DataFrame): Unit = {
      df.write.format("noop").mode("overwrite").save() // warm
      val xs = Seq.fill(3) {
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"PROF $name min=${xs.min}%.3f")
    }
    val docs = graft.Tables.documents(spark, dir)
    val sh = graft.operators.TextAnalysis.shingles(docs)
    t("shingles_explode") { sh }
    val idx = sh.groupBy("s").agg(sort_array(collect_set(col("doc_id"))).as("ids"))
      .filter(size(col("ids")) <= 200)
    t("shingle_index") { idx }
    val pairs = idx.filter(size(col("ids")) >= 2)
      .select(posexplode(col("ids")).as(Seq("i", "da")), col("ids").as("ids_"))
      .select(col("da"), explode(expr("slice(ids_, i + 2, size(ids_))")).as("db"))
      .groupBy("da", "db").agg(count(lit(1)).as("c"))
    t("pairs_agg") { pairs }
    val cnt = idx.select(explode(col("ids")).as("doc_id"))
      .groupBy("doc_id").agg(count(lit(1)).as("nsh"))
    t("cnt") { cnt }
    t("near_full") { SparkEntry.queries("q_dedup_near")(spark, dir) }
    spark.stop()
  }
}
