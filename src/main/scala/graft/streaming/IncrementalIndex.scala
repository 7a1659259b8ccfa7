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
    * of the changelog: one row per rowkey, deletes dropped. Read-side
    * view; the persisted state keeps tombstones (see [[compactAll]]). */
  def compact(changes: DataFrame): DataFrame =
    compactAll(changes).filter(col("op") =!= "delete")

  /** Latest event per rowkey with tombstones retained. The state table
    * must keep delete tombstones: if they were dropped, a stale put
    * (lower event_id) arriving in a later batch would resurrect a deleted
    * row. At 100 TB tombstones are garbage-collected once the source can
    * no longer replay events older than the tombstone (retention horizon),
    * the same discipline as compacted-topic / LSM deletes. */
  def compactAll(changes: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("rowkey")).orderBy(col("event_id").desc)
    changes
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .drop("rn")
  }

  /** Merge one micro-batch into the state at `statePath` (parquet).
    * Reference semantics: client.add = upsert-by-id, client.deleteById =
    * drop (SolrIndexTools.java:60,63,127,129). The state persists the
    * latest event per rowkey INCLUDING tombstones; readers apply
    * `op != 'delete'` (or use [[readState]]). */
  def mergeBatch(spark: SparkSession, batch: DataFrame, statePath: String): Unit = {
    // Heal an interrupted swap first: if a previous merge died mid-swap,
    // the previous state is sitting at `.old` and must be restored BEFORE
    // the existence check below — otherwise the replayed batch would merge
    // against nothing and promote a batch-only state over the only
    // surviving copy.
    StateStore.recover(spark, statePath)
    val existing =
      if (StateStore.nonEmpty(spark, statePath)) Some(spark.read.parquet(statePath))
      else None
    // event_id totally orders state rows vs batch rows.
    val all = existing.map(_.unionByName(batch)).getOrElse(batch)
    val merged = compactAll(all).cache()
    merged.count() // materialize before the swap touches the input path
    // Crash-safe swap through the Hadoop FileSystem API (HDFS-compatible;
    // see StateStore for the protocol and the object-store caveat).
    try StateStore.commit(spark, statePath) { tmp =>
      merged.write.mode("overwrite").parquet(tmp)
    } finally merged.unpersist(): Unit
  }

  /** Read the live view of the persisted state (tombstones filtered). */
  def readState(spark: SparkSession, statePath: String): DataFrame = {
    StateStore.recover(spark, statePath)
    spark.read.parquet(statePath).filter(col("op") =!= "delete")
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
