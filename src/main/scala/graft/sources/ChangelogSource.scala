package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{coalesce, col, concat, from_json, lit, raise_error, to_json, when}
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
    * is the producer-drop directory.
    *
    * `maxFilesPerTrigger` / `maxBytesPerTrigger` are the SIZE half of the
    * reference's dual flush trigger (buffer ≥ `add_batchCount` docs OR the
    * commit timer, SolrIndexTools.java:124 + :46-49): the time half is the
    * sink query's `Trigger.ProcessingTime`; the size half is source
    * admission — one oversized drop is split across micro-batches instead
    * of starving the commit interval. Admission on a file source is
    * file-granular (the Spark-native unit); the FILE count translates a
    * row threshold through the producer's file size, so it degrades when
    * file sizes vary — the BYTE budget bounds the batch regardless of how
    * the producer sliced its files and is the sturdier knob when rows are
    * ~fixed-size. The two are mutually exclusive (also enforced by the
    * source itself). */
  def stream(spark: SparkSession, path: String, format: String = "json",
             options: Map[String, String] = Map.empty,
             maxFilesPerTrigger: Option[Int] = None,
             maxBytesPerTrigger: Option[Long] = None): DataFrame = {
    require(maxFilesPerTrigger.isEmpty || maxBytesPerTrigger.isEmpty,
      "set at most one of maxFilesPerTrigger and maxBytesPerTrigger")
    val admission =
      maxFilesPerTrigger.map(n => Map("maxFilesPerTrigger" -> n.toString))
        .orElse(maxBytesPerTrigger.map(n => Map("maxBytesPerTrigger" -> n.toString)))
        .getOrElse(Map.empty)
    spark.readStream.schema(schema)
      .options(options ++ admission)
      .option("mode", "FAILFAST") // unconditional: same strict contract as batch
      .format(format).load(path)
  }

  /** Queue-shaped ingestion seam — the async-queue decoupling the
    * reference names as its intended architecture
    * (/root/reference/README.md:29, Kafka). Broker sources deliver records
    * with the payload as bytes (`value` plus key/topic/offset metadata);
    * this projects the value bytes through the SAME declared schema and
    * FAILFAST contract as the file landing zone, so the merge pipeline
    * stays source-shape-blind: `fromBroker(spark.readStream.format("kafka")
    * .…load())` wires into `IncrementalIndex.start` exactly like a file
    * drop. Works on batch and streaming frames alike (no broker in this
    * environment — any frame with a `value` column has the shape). */
  def fromBroker(records: DataFrame): DataFrame = {
    val parsed = records.select(from_json(col("value").cast("string"), schema,
      Map("mode" -> "FAILFAST")).as("c"))
    // FAILFAST only fires on malformed/untypeable records: a RENAMED or
    // DROPPED field and a null payload (a broker tombstone) both parse
    // cleanly to nulls — the exact silent null-fill the ORC reader above
    // guards against. A changelog contract needs every event keyed and
    // typed (deletes are explicit op='delete' events carrying payload "",
    // never bare null values — the file-source contract), so ALL FOUR
    // fields must be present; a null in any of them is drift and must fail
    // loudly, per row. The check rides the projected column itself so no
    // optimizer can prune it.
    val drifted = col("c").isNull ||
      schema.fieldNames.toSeq.map(f => col(s"c.$f").isNull).reduce(_ || _)
    parsed
      .select(when(drifted, raise_error(concat(
          lit("drifted broker record (missing rowkey/event_id/op or null payload): "),
          coalesce(to_json(col("c")), lit("null")))))
        .otherwise(col("c")).as("c"))
      .select("c.*")
  }
}
