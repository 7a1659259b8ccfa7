package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Streaming flavor of the reference's incremental index maintenance
  * (SURVEY.md §2.A O7–O10): the coprocessor's buffer + dual-trigger flush
  * (size threshold at SolrIndexTools.java:124, 30 s timer at :46-49)
  * becomes a Structured Streaming micro-batch pipeline — `readStream` →
  * `foreachBatch` merge into the materialized index state, with
  * `Trigger.ProcessingTime("30 seconds")` playing the commit interval.
  *
  * What the re-architecture removes (SURVEY.md §4): the single-flusher
  * semaphore (SolrIndexTools.java:110,121 — the reference's acknowledged
  * throughput killer) is replaced by parallel per-partition writes, and the
  * volatile in-memory buffer that loses data on a crash
  * (/root/reference/README.md:19-20) is replaced by checkpointed source
  * offsets — exactly-once per micro-batch.
  *
  * Scale notes: each micro-batch merge shuffles only on `rowkey`, and the
  * union-with-state recompaction below is the simple form; on a real lake
  * the state table is a bucketed/MERGE-capable table so a batch touches only
  * the buckets its rowkeys hash to, not the full state.
  */
object IncrementalIndex {

  /** Latest-wins compaction of a (possibly already-compacted ∪ new) slice
    * of the changelog: one row per rowkey, deletes dropped. */
  def compact(changes: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("rowkey")).orderBy(col("event_id").desc)
    changes
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1 && col("op") =!= "delete")
      .drop("rn")
  }

  /** Merge one micro-batch into the state at `statePath` (parquet).
    * Reference semantics: client.add = upsert-by-id, client.deleteById =
    * drop (SolrIndexTools.java:60,63,127,129). Keeping deletes' tombstones
    * out of the state is safe because `compact` keeps only each batch's
    * latest event per rowkey and a delete wins by arriving last. */
  def mergeBatch(spark: SparkSession, batch: DataFrame, statePath: String): Unit = {
    val dir = new java.io.File(statePath)
    val existing =
      if (dir.exists() && dir.listFiles() != null && dir.listFiles().nonEmpty)
        Some(spark.read.parquet(statePath))
      else None
    // State rows carry op='put' by construction; union with the raw batch
    // and recompact — event_id totally orders state vs batch rows.
    val all = existing.map(_.unionByName(batch)).getOrElse(batch)
    val merged = compact(all).cache()
    merged.count() // materialize before overwriting the input path
    val tmp = statePath + ".tmp"
    merged.write.mode("overwrite").parquet(tmp)
    merged.unpersist()
    val target = new java.io.File(statePath)
    if (target.exists()) {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(): Unit
      }
      rm(target)
    }
    new java.io.File(tmp).renameTo(target): Unit
  }

  /** Wire a streaming changelog (schema: rowkey STRING, event_id LONG,
    * op STRING, …) into the merge sink. */
  def start(changes: DataFrame, statePath: String, checkpoint: String,
            intervalSeconds: Int = 30): StreamingQuery =
    changes.writeStream
      .outputMode("append")
      .trigger(Trigger.ProcessingTime(s"$intervalSeconds seconds"))
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        mergeBatch(batch.sparkSession, batch, statePath)
      }
      .start()
}
