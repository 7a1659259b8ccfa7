package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** Incremental maintenance of the materialized posting-list table — the
  * reference's actual product (HBase mutations kept in sync with a Solr
  * inverted index, HbaseSolrIndexCoprocesser.java:38-61) expressed over the
  * engine's own postings table (`Index.postings`): each changelog
  * micro-batch of document puts/deletes is folded into a persisted inverted
  * index, so term queries read |postings(term)| rows instead of re-scanning
  * the corpus (SCALE.md §search names this as the 100 TB search path).
  *
  * State layout (one root, swapped atomically as a unit by [[StateStore]]):
  *   - `<root>/docs`    — latest event per rowkey INCLUDING tombstones
  *     (same discipline as [[IncrementalIndex]]: without tombstones a stale
  *     put in a later batch would resurrect a deleted doc's postings);
  *   - `<root>/entries` — the inverted index as (tok, doc_id) rows, one per
  *     distinct token per live document.
  *
  * The per-batch delta is keyed by TOKEN on both sides, which is the scale
  * property: removals are the touched docs' OLD tokens and additions their
  * NEW tokens, so with `entries` bucketed by `tok` a batch touches only the
  * buckets its tokens hash to — never the full index. (A doc_id-keyed
  * anti-join would shuffle the whole entries table per batch.)
  */
object IncrementalPostings {

  private val entriesSchema = StructType(Seq(
    StructField("tok", StringType), StructField("doc_id", StringType)))

  /** Whitespace tokenization by default; pass e.g. `Analyzer.cjk.tokens`
    * for space-free scripts. Distinct per doc — postings are a set. */
  private def docToks(docs: DataFrame, tokenize: Column => Column): DataFrame =
    docs.filter(col("op") =!= "delete")
      .select(col("rowkey").as("doc_id"),
        explode(array_distinct(tokenize(col("text")))).as("tok"))
      .select("tok", "doc_id")

  /** Fold one micro-batch (rowkey STRING, event_id LONG, op put|delete,
    * text STRING) into the persisted postings state. */
  def mergeBatch(spark: SparkSession, batch: DataFrame, rootPath: String,
                 tokenize: Column => Column = split(_, " ")): Unit = {
    StateStore.recover(spark, rootPath)
    val hasState = StateStore.nonEmpty(spark, rootPath)
    val oldDocs =
      if (hasState) spark.read.parquet(rootPath + "/docs")
      else spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        batch.schema)
    val oldEntries =
      if (hasState) spark.read.parquet(rootPath + "/entries")
      else spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        entriesSchema)

    // Only rowkeys present in the batch can change; everything is derived
    // from this (small) touched set.
    val touched = batch.select("rowkey").distinct()
    val mergedDocs = IncrementalIndex.compactAll(oldDocs.unionByName(batch)).cache()
    // removals: the touched docs' PREVIOUS tokens (tok-keyed delta);
    // additions: their tokens after the merge. A stale batch event leaves
    // both sides equal, so the entries are rewritten unchanged — idempotent.
    val removals = docToks(oldDocs.join(broadcast(touched), "rowkey"), tokenize)
    val additions = docToks(mergedDocs.join(broadcast(touched), "rowkey"), tokenize)
    val newEntries = oldEntries
      .join(removals, Seq("tok", "doc_id"), "left_anti")
      .unionByName(additions)
      .cache()

    mergedDocs.count(); newEntries.count() // decouple from the input files
    try StateStore.commit(spark, rootPath) { tmp =>
      mergedDocs.write.mode("overwrite").parquet(tmp + "/docs")
      newEntries.write.mode("overwrite").parquet(tmp + "/entries")
    } finally { mergedDocs.unpersist(); newEntries.unpersist(): Unit }
  }

  /** The maintained inverted index, in `Index.postings` shape:
    * (tok, sorted doc ids, document frequency). */
  def postings(spark: SparkSession, rootPath: String): DataFrame = {
    StateStore.recover(spark, rootPath)
    spark.read.parquet(rootPath + "/entries")
      .groupBy("tok")
      .agg(sort_array(collect_set(col("doc_id"))).as("ids"),
        countDistinct(col("doc_id")).as("df"))
  }

  /** Wire a streaming document changelog into the postings merge sink. */
  def start(changes: DataFrame, rootPath: String, checkpoint: String,
            intervalSeconds: Int = 30,
            tokenize: Column => Column = split(_, " ")): StreamingQuery =
    changes.writeStream
      .outputMode("append")
      .trigger(Trigger.ProcessingTime(s"$intervalSeconds seconds"))
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        mergeBatch(batch.sparkSession, batch, rootPath, tokenize)
      }
      .start()
}
