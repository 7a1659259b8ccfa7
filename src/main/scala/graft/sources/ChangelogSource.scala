package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._

/** Format-agnostic changelog ingestion. The reference's mutation stream
  * arrives as HBase RPCs (HbaseSolrIndexCoprocesser.java:38,56); in the
  * engine it is a table with a fixed logical schema, and the physical
  * format is an ingestion detail — the same declared schema is applied to
  * parquet, CSV, or JSON-lines input, so every downstream operator
  * (compaction, windows, facets) is format-blind.
  *
  * Scale notes: columnar parquet is the steady-state format (vectorized
  * scan, pushdown, pruning — see SCALE.md); CSV/JSON cover the landing
  * zone, where files arrive from producers before compaction into the
  * columnar log. Schema is always DECLARED, never inferred: inference on a
  * text format is a full extra pass over the data, and a drifting producer
  * should fail loudly (columnNameOfCorruptRecord) rather than silently
  * widen types.
  */
object ChangelogSource {

  /** Logical changelog schema (format-independent). */
  val schema: StructType = StructType(Seq(
    StructField("rowkey", StringType),
    StructField("event_id", LongType),
    StructField("op", StringType),
    StructField("payload", StringType)))

  def parquet(spark: SparkSession, path: String): DataFrame =
    spark.read.schema(schema).parquet(path)

  def csv(spark: SparkSession, path: String): DataFrame =
    spark.read.schema(schema)
      .option("header", "true")
      .option("mode", "FAILFAST") // drifted producers fail loudly
      .csv(path)

  def jsonLines(spark: SparkSession, path: String): DataFrame =
    spark.read.schema(schema)
      .option("mode", "FAILFAST")
      .json(path)

  def orc(spark: SparkSession, path: String): DataFrame = {
    // FAILFAST doesn't apply to self-describing formats: with a declared
    // schema, by-name resolution silently null-fills columns a drifted
    // producer renamed or dropped. Check the file schema explicitly so
    // drift fails loudly here too (a footer read — metadata, not data).
    val fileFields = spark.read.orc(path).schema.fieldNames.toSet
    val missing = schema.fieldNames.filterNot(fileFields.contains)
    if (missing.nonEmpty)
      throw new IllegalArgumentException(
        s"ORC changelog at $path is missing required columns " +
          s"${missing.mkString(", ")} — drifted producer")
    spark.read.schema(schema).orc(path)
  }

  /** Streaming flavor of the landing zone: the same DECLARED schema over a
    * file stream (new files picked up per micro-batch, offsets
    * checkpointed by the sink's query) — wires directly into
    * `IncrementalIndex.start` / `IncrementalPostings.start`. At scale this
    * is the producer-drop directory; `maxFilesPerTrigger` (pass via
    * `options`) bounds per-batch ingest so one huge drop cannot starve the
    * commit interval. */
  def stream(spark: SparkSession, path: String, format: String = "json",
             options: Map[String, String] = Map.empty): DataFrame =
    spark.readStream.schema(schema)
      .options(options)
      .option("mode", "FAILFAST") // unconditional: same strict contract as batch
      .format(format).load(path)
}
