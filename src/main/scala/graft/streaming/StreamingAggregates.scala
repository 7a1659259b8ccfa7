package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.GroupStateTimeout

/** Streaming read-side counterparts of the batch operators (SURVEY.md §2.A
  * O7–O9 and §2.B S6/S9 in streaming form).
  *
  * - [[windowedCounts]] is the reference's 30 s interval flush
  *   (SolrIndexTools.java:46-49) as a first-class event-time window with a
  *   watermark: late events inside the watermark still land in their
  *   window; events later than that are dropped explicitly — unlike the
  *   reference, whose only lateness policy was unbounded buffering and
  *   data loss on crash (/root/reference/README.md:19-20).
  * - [[latestState]] is the coprocessor's per-rowkey "current document"
  *   view as fault-tolerant keyed state (mapGroupsWithState): state lives
  *   in the state store, checkpointed, sharded by key across executors —
  *   not in a regionserver heap behind a semaphore.
  *
  * Scale notes: both shapes shard by key/window across executors; state
  * size is bounded by live keys (latestState) or open windows
  * (windowedCounts with watermark-driven eviction). At 100 TB/day the
  * knobs are the state-store provider (RocksDB) and watermark delay.
  */
object StreamingAggregates {

  /** Event-time 30 s tumbling-window counts with a 2-minute watermark.
    * Expects a streaming DataFrame with `ts TIMESTAMP` and `event_type`. */
  def windowedCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 minutes")
      .groupBy(window(col("ts"), "30 seconds"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("win_start"), col("event_type"), col("n"))

  /** Event-time SESSION windows — the streaming face of
    * [[graft.operators.Temporal.sessions]]: a per-user window extends
    * while events keep arriving within `gap` of the previous one and
    * closes once the watermark passes last-event + gap. Same gap rule as
    * the batch operator (strictly-greater splits); the window's `end` is
    * last-event + gap (Spark's session_window contract), where the batch
    * form reports the last event itself — both identify the same event
    * sets. State is one open session per active user, watermark-evicted:
    * bounded by concurrently-ACTIVE users, not by history — the property
    * that lets this run forever at 100 TB/day. Expects `ts TIMESTAMP`,
    * `user_id`, `value`.
    *
    * `watermarkDelay` is the LATENESS BOUND: events arriving later than
    * it (in event time) are dropped from their session, so size it to
    * the source's real skew — mobile/offline clients routinely need
    * minutes-to-hours, and an undersized delay silently undercounts. */
  def sessionCounts(events: DataFrame, gap: String = "30 minutes",
                    watermarkDelay: String = "2 minutes"): DataFrame =
    events
      .withWatermark("ts", watermarkDelay)
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"), round(sum("value"), 2).as("sum_value"))
      .select(
        col("session_window.start").as("sess_start"),
        col("session_window.end").as("sess_end"),
        col("user_id"), col("n_events"), col("sum_value"))

  case class Ev(rowkey: String, event_id: Long, op: String, payload: String)
  case class KeyState(rowkey: String, event_id: Long, op: String, payload: String)

  /** Keyed latest-wins state: for each rowkey, the highest-event_id event
    * seen so far (tombstones included — downstream filters `op`), updated
    * per micro-batch through the checkpointed state store. */
  def latestState(events: Dataset[Ev]): Dataset[KeyState] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.rowkey)
      .mapGroupsWithState[KeyState, KeyState](GroupStateTimeout.NoTimeout) {
        (_, batch, state) =>
          val prior = state.getOption
            .map(s => Ev(s.rowkey, s.event_id, s.op, s.payload)).iterator
          val best = (prior ++ batch).maxBy(_.event_id)
          val next = KeyState(best.rowkey, best.event_id, best.op, best.payload)
          state.update(next)
          next
      }
  }

  /** Change-data-capture flavor (flatMapGroupsWithState): emit a key's
    * state only when this micro-batch actually CHANGED it — stale events
    * produce no output. This is what feeds a downstream index updater at
    * scale: the emitted stream is proportional to real changes, not to
    * batch size × touched keys. */
  def changedState(events: Dataset[Ev]): Dataset[KeyState] = {
    import events.sparkSession.implicits._
    import org.apache.spark.sql.streaming.OutputMode
    events
      .groupByKey(_.rowkey)
      .flatMapGroupsWithState[KeyState, KeyState](
        OutputMode.Update(), GroupStateTimeout.NoTimeout) {
        (_, batch, state) =>
          val prior = state.getOption
          val priorEv = prior.map(s => Ev(s.rowkey, s.event_id, s.op, s.payload)).iterator
          val best = (priorEv ++ batch).maxBy(_.event_id)
          val next = KeyState(best.rowkey, best.event_id, best.op, best.payload)
          if (prior.contains(next)) Iterator.empty
          else { state.update(next); Iterator.single(next) }
      }
  }

  /** A buffered event released by a threshold flush: the original event
    * plus which shard buffer and which flush batch released it. */
  case class FlushedEv(rowkey: String, event_id: Long, op: String,
                       payload: String, shard: Int, flush_seq: Long)

  private case class BufState(flushSeq: Long, buf: List[Ev])

  /** Count-threshold flush — O7's streaming face. The reference keeps an
    * add buffer and a delete buffer per regionserver and flushes each the
    * moment it reaches its batch count (add_batchCount=10000 /
    * del_batchCount=2000, SolrIndexTools.java:62-75,93-101); the interval
    * timer is the separate, complementary trigger (already covered by the
    * interval-driven streaming starts). Here each (op-class, shard) key
    * owns one buffer in the checkpointed state store — the shard plays the
    * regionserver: buffers fill and flush independently, and adding
    * executors spreads them, exactly how adding regionservers did. Unlike
    * the reference's heap buffer, a crash replays into the SAME buffer
    * instead of losing it (README.md:19-20 documents the reference's data
    * loss).
    *
    * State per key is bounded by the threshold (a full buffer always
    * drains), so state size is `shards × (addBatchCount + delBatchCount)`
    * rows regardless of stream volume. Rows are buffered in event_id order
    * (arrival order within a micro-batch is not deterministic); each
    * emitted row carries its buffer's running `flush_seq`, so a downstream
    * sink sees exactly the reference's "one addDocs call per full buffer"
    * batching. */
  def thresholdFlush(events: Dataset[Ev], addBatchCount: Int,
                     delBatchCount: Int, shards: Int = 32,
                     deleteOp: String = "delete"): Dataset[FlushedEv] = {
    import events.sparkSession.implicits._
    import org.apache.spark.sql.streaming.OutputMode
    require(addBatchCount > 0 && delBatchCount > 0 && shards > 0,
      "thresholds and shard count must be positive")
    events
      .groupByKey(e => (e.op == deleteOp,
        math.floorMod(e.rowkey.hashCode, shards)))
      .flatMapGroupsWithState[BufState, FlushedEv](
        OutputMode.Append(), GroupStateTimeout.NoTimeout) {
        case ((isDelete, shard), batch, state) =>
          val threshold = if (isDelete) delBatchCount else addBatchCount
          val prior = state.getOption.getOrElse(BufState(0L, Nil))
          var buf = prior.buf ++ batch.toSeq.sortBy(_.event_id)
          var seq = prior.flushSeq
          val out = List.newBuilder[FlushedEv]
          while (buf.lengthCompare(threshold) >= 0) {
            val (flush, rest) = buf.splitAt(threshold)
            out ++= flush.map(e =>
              FlushedEv(e.rowkey, e.event_id, e.op, e.payload, shard, seq))
            seq += 1
            buf = rest
          }
          state.update(BufState(seq, buf))
          out.result().iterator
      }
  }

  /** Streaming exact dedup (X1's streaming face): emit only the FIRST
    * document carrying each content hash, across micro-batches. State is
    * one entry per distinct hash, sharded by hash across executors — at
    * 100 TB/day the knob is the watermarked variant below, which lets the
    * store evict hashes older than the duplicate-arrival horizon instead
    * of growing forever. Expects `doc_id` and `text` columns. */
  def dedupStream(docs: DataFrame): DataFrame =
    docs.withColumn("h", md5(col("text"))).dropDuplicates("h")

  /** Watermarked streaming dedup: duplicates are only suppressed when
    * they arrive within `horizon` of the first occurrence's event time —
    * the bounded-state form (state evicts beyond the watermark). Expects
    * an event-time `ts TIMESTAMP` column alongside `text`. */
  def dedupStreamWithin(docs: DataFrame, horizon: String): DataFrame =
    docs.withColumn("h", md5(col("text")))
      .withWatermark("ts", horizon)
      .dropDuplicatesWithinWatermark("h")
}
