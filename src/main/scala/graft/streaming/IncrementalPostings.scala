package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.{IntegerType, LongType, StringType, StructField, StructType}

/** Incremental maintenance of the materialized posting-list table — the
  * reference's actual product (HBase mutations kept in sync with a Solr
  * inverted index, HbaseSolrIndexCoprocesser.java:38-61) expressed over the
  * engine's own postings table (`Index.postings`): each changelog
  * micro-batch of document puts/deletes is folded into a persisted inverted
  * index, so term queries read |postings(term)| rows instead of re-scanning
  * the corpus (SCALE.md §search names this as the 100 TB search path).
  *
  * State layout — two bucketed roots, each in the `b=<i>` layout of
  * [[StateStore.commitBuckets]]:
  *   - `<root>/docs`    — latest event per rowkey INCLUDING tombstones,
  *     bucketed by `crc32(rowkey)` (same discipline as
  *     [[IncrementalIndex]]: without tombstones a stale put in a later
  *     batch would resurrect a deleted doc's postings);
  *   - `<root>/entries` — the inverted index as (tok, doc_id, tf) rows
  *     (tf = the term's per-doc occurrence count, Lucene's posting
  *     payload), bucketed by `crc32(tok)`;
  *   - `<root>/dstats` — a per-doc-bucket stats sidecar (live doc count,
  *     total token length) rewritten with exactly the touched doc
  *     buckets, so corpus-level ranking statistics (N, avgdl — BM25's
  *     denominators) are a ≤-bucket-count metadata read, never a docs
  *     scan.
  *
  * The per-batch delta is keyed by TOKEN on both sides, which is the scale
  * property: removals are the touched docs' OLD tokens and additions their
  * NEW tokens, so a batch reads and rewrites only the entry buckets those
  * tokens hash to — never the full index. (A doc_id-keyed anti-join would
  * shuffle the whole entries table per batch.) Write volume per batch is
  * O(touched doc buckets + touched token buckets), not O(state).
  *
  * Crash protocol: per-bucket swaps are prefix-atomic, so the merge itself
  * must be idempotent under replay against ANY partially-promoted state.
  * Two ingredients guarantee that:
  *   1. entries commit BEFORE docs — replay after a crash between the two
  *      recomputes removals from the still-old docs, so old tokens are
  *      re-removed (or already gone: anti-join no-op);
  *   2. the entries rewrite anti-joins BOTH removals and additions before
  *      unioning the additions once — re-applying it to an
  *      already-promoted entry bucket reproduces identical content instead
  *      of duplicating the additions.
  */
object IncrementalPostings {

  private val entriesSchema = StructType(Seq(
    StructField("tok", StringType), StructField("doc_id", StringType),
    StructField("tf", LongType),
    StructField("positions", org.apache.spark.sql.types.ArrayType(IntegerType)),
    StructField("field", StringType),
    StructField("b", IntegerType)))

  /** The default field name — what every single-field root indexes as,
    * and what legacy pre-field entries/dstats rows adopt. The reference
    * maps each HBase qualifier to its own Solr field
    * (HbaseSolrIndexCoprocesser.java:45-49); a single-text-column root is
    * the one-qualifier case. */
  val DefaultField = "text"

  /** The documented merge-batch schema — the shape of the docs state. */
  private val docsSchema = StructType(Seq(
    StructField("rowkey", StringType), StructField("event_id", LongType),
    StructField("op", StringType), StructField("text", StringType)))

  private def emptyDf(spark: SparkSession, schema: StructType): DataFrame =
    spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)

  /** Adopt entries written before the tf column existed ((tok, doc_id)
    * rows): default tf to 1, so pre-upgrade state roots keep merging and
    * reading. Occurrence counts degrade to document counts for legacy
    * rows, and the default is PERSISTENT for a document until that
    * document is itself re-put — a bucket rewrite carries untouched
    * docs' rows through the anti-join unchanged (it never re-tokenizes
    * them), so only a new put recomputes true tf. The positions column
    * (the payload [[phraseSearch]] intersects) likewise defaults — to
    * NULL, not an empty array: a legacy row has UNKNOWN positions, and
    * phrase search fails loudly on null rather than silently never
    * matching the doc ([[phraseSearch]]'s contract). */
  private def withTf(entries: DataFrame): DataFrame = {
    val tf =
      if (entries.columns.contains("tf"))
        // fill per-ROW legacy nulls too: on a root mixing pre- and
        // post-upgrade buckets (mergeSchema read) or under the explicit-
        // schema read (readEntriesRaw), a pre-tf file surfaces tf as
        // null — the documented default is 1, uniformly
        entries.withColumn("tf", coalesce(col("tf"), lit(1L)))
      else entries.withColumn("tf", lit(1L))
    val pos =
      if (tf.columns.contains("positions")) tf
      else tf.withColumn("positions", lit(null).cast("array<int>"))
    // field adoption (the multi-field upgrade, round 11): a pre-field row
    // indexed the root's single text column, so it IS the default field.
    // Unlike positions, the default is exact — no information was lost —
    // and on a root mixing pre- and post-upgrade buckets readMerged
    // surfaces NULL for the legacy rows, coalesced here.
    if (pos.columns.contains("field"))
      pos.withColumn("field", coalesce(col("field"), lit(DefaultField)))
    else pos.withColumn("field", lit(DefaultField))
  }

  private def docBucket(numBuckets: Int): Column =
    pmod(crc32(col("rowkey")), lit(numBuckets)).cast("int")
  private def tokBucket(numBuckets: Int): Column =
    pmod(crc32(col("tok")), lit(numBuckets)).cast("int")

  /** The live bucket dirs a DataFrame of keys hashes into — the frame
    * twin of [[StateStore.bucketDirsFor]] for key sets that are DATA
    * (too many to collect): only the distinct bucket ids (bounded by the
    * bucket count) come to the driver. A missing `_nbuckets` marker
    * (pre-marker root) falls back to all live dirs. */
  private def bucketDirsForFrame(spark: SparkSession, root: String,
                                 keys: DataFrame, key: String): Seq[String] = {
    val live = StateStore.liveBuckets(spark, root)
    if (live.isEmpty) return Seq.empty // no state: skip the bucket-id job
    StateStore.bucketCount(spark, root) match {
      case Some(n) =>
        val wanted = keys.select(pmod(crc32(col(key)), lit(n)).cast("int").as("b"))
          .distinct().collect().map(r => s"b=${r.getInt(0)}").toSet
        live.filter(wanted.contains)
      case None => live
    }
  }

  /** Per-doc-bucket, PER-FIELD stats rows (live doc count + total token
    * length) for the dstats sidecar — a pure function of each bucket's
    * docs content, which is what makes the sidecar idempotent under
    * replay. Lucene semantics per field: a doc counts toward a field's
    * docCount (and its avgdl denominator) iff it HAS the field (non-null
    * value) — exactly the rows the merge indexes for that field, so the
    * sidecar and the entries can never disagree about N. Single-field
    * roots write one row per bucket under [[DefaultField]]. */
  private def bucketStats(docs: DataFrame, tokenize: Column => Column,
                          fields: Seq[String]): DataFrame =
    fields.map { f =>
      docs.groupBy("b").agg(
        count(when(col("op") =!= "delete" && col(f).isNotNull, lit(1))).as("n_docs"),
        // the isNotNull guard must mirror n_docs': under legacy sizeOfNull
        // (ANSI off) size(tokenize(NULL)) is -1, and an unguarded sum
        // would silently SUBTRACT one per null-field doc — dl_sum and the
        // entries would then disagree about the field's length mass
        coalesce(sum(when(col("op") =!= "delete" && col(f).isNotNull,
          size(tokenize(col(f))).cast("long"))), lit(0L)).as("dl_sum"))
        .withColumn("field", lit(f))
    }.reduce(_ unionByName _)

  /** Whitespace tokenization by default; pass e.g. `Analyzer.cjk.tokens`
    * for space-free scripts. One row per (tok, doc) carrying the per-doc
    * term frequency AND the token's sorted position list — the full
    * Lucene-shaped posting entry (frequencies + positions), so ranked
    * retrieval (BM25/tf-idf), occurrence-ranked vocabulary reads, and
    * phrase queries ([[phraseSearch]]'s adjacency intersection) are all
    * served from the maintained entries alone. `keepPositions = false`
    * stores NULL instead (the shingle family's root: a shingle's offsets
    * carry no query semantics, so the array would be dead weight in every
    * bucket rewrite). The aggregate is batch-sized (it feeds the delta,
    * never the state) and partial-aggregates map-side; positions are a
    * pure function of the doc's text, so replay reproduces identical
    * rows — the merge stays idempotent. */
  private def docToks(docs: DataFrame, tokenize: Column => Column,
                      keepPositions: Boolean = true,
                      fields: Seq[String] = Seq(DefaultField)): DataFrame =
    fields.map { f =>
      // a null field value means the doc doesn't HAVE the field — it
      // indexes nothing for it (Lucene's absent-field semantics)
      val base = docs.filter(col("op") =!= "delete" && col(f).isNotNull)
      val toks =
        if (keepPositions)
          base.select(col("rowkey").as("doc_id"),
              posexplode(tokenize(col(f))).as(Seq("pos", "tok")))
            .groupBy("tok", "doc_id")
            .agg(count(lit(1)).as("tf"),
              sort_array(collect_list(col("pos"))).as("positions"))
        else
          base.select(col("rowkey").as("doc_id"), explode(tokenize(col(f))).as("tok"))
            .groupBy("tok", "doc_id").agg(count(lit(1)).as("tf"),
              lit(null).cast("array<int>").as("positions"))
      toks.withColumn("field", lit(f))
    }.reduce(_ unionByName _)

  /** Multi-bucket state read with schema MERGE across files: bucket
    * files written before a payload column existed (tf, positions — the
    * upgrade paths [[withTf]] adopts) must surface the column as null
    * for THEIR rows only. Schema-less inference reads ONE file's footer
    * and, on a root mixing pre- and post-upgrade buckets, can drop the
    * column for every row — a merge would then rewrite real positions
    * as null, permanent data loss masquerading as a clean upgrade.
    * Footer-merge cost is bounded by the touched files. */
  private def readMerged(spark: SparkSession, paths: Seq[String]): DataFrame =
    spark.read.option("mergeSchema", "true").parquet(paths: _*)

  /** Entries read under the EXPLICIT post-upgrade schema instead of a
    * mergeSchema footer sweep: parquet surfaces a column absent from a
    * file as null under an explicit schema, so pre-tf/positions/field
    * files keep exactly the null-for-their-rows semantics the
    * mergeSchema read gave them ([[withTf]] fills the defaults either
    * way) — WITHOUT the distributed footer-merge job mergeSchema runs
    * per read. That job was pure fixed cost on the flush path (gate
    * probe + two entry merges per batch), and its footer sweep grows
    * with the touched-file count at scale. The entries schema is closed
    * (tok, doc_id, tf, positions, field — the multi-field upgrade is the
    * newest column), unlike the DOCS schema, which is root-dependent
    * (multi-field roots store their field columns), so docs reads keep
    * mergeSchema. */
  private def readEntriesRaw(spark: SparkSession, paths: Seq[String]): DataFrame =
    spark.read.schema(StructType(entriesSchema.filterNot(_.name == "b")))
      .parquet(paths: _*)

  private def readBuckets(spark: SparkSession, root: String, dirs: Seq[String],
                          fallback: => DataFrame): DataFrame = {
    val live = StateStore.liveBuckets(spark, root).toSet
    val paths = dirs.filter(live.contains).map(d => s"$root/$d")
    if (paths.nonEmpty) readMerged(spark, paths) else fallback
  }

  /** [[readBuckets]] for ENTRY buckets — the explicit-schema read
    * ([[readEntriesRaw]]), no footer-merge job. */
  private def readEntryBuckets(spark: SparkSession, root: String,
                               dirs: Seq[String],
                               fallback: => DataFrame): DataFrame = {
    val live = StateStore.liveBuckets(spark, root).toSet
    val paths = dirs.filter(live.contains).map(d => s"$root/$d")
    if (paths.nonEmpty) readEntriesRaw(spark, paths) else fallback
  }

  /** Fold one micro-batch (rowkey STRING, event_id LONG, op put|delete,
    * text STRING) into the persisted postings state. The touched-bucket
    * lists collected to the driver are bounded by `numBuckets` each —
    * metadata, not data. */
  def mergeBatch(spark: SparkSession, batch: DataFrame, rootPath: String,
                 tokenize: Column => Column = split(_, " "),
                 numBuckets: Int = IncrementalIndex.DefaultBuckets,
                 tokenizerName: Option[String] = None,
                 keepPositions: Boolean = true): Unit =
    mergeImpl(spark, batch, rootPath, Seq(DefaultField), tokenize, numBuckets,
      tokenizerName, keepPositions)

  /** Fold one MULTI-FIELD micro-batch into the persisted postings state —
    * the reference's actual document shape: every HBase qualifier becomes
    * its own Solr field (HbaseSolrIndexCoprocesser.java:45-49,
    * `doc.addField(qualifier, value)`), so a document is (rowkey,
    * event_id, op, one string column PER FIELD). Entries carry a `field`
    * column ((tok, field, doc_id) is the posting key — Lucene's terms ARE
    * (field, term) pairs); the dstats sidecar keeps per-field length
    * stats, so per-field BM25 ([[bm25SearchFields]]) reads exact N/avgdl
    * per field with no docs scan. A null field value means the doc
    * doesn't have the field. The field list is pinned in a `_fields`
    * root marker: single- and multi-field writers can never interleave
    * on one root (a single-field merge would strand the other fields'
    * stale postings — its removals only re-tokenize its own column). */
  def mergeBatchFields(spark: SparkSession, batch: DataFrame, rootPath: String,
                       fields: Seq[String],
                       tokenize: Column => Column = split(_, " "),
                       numBuckets: Int = IncrementalIndex.DefaultBuckets,
                       tokenizerName: Option[String] = None,
                       keepPositions: Boolean = true): Unit = {
    require(fields.nonEmpty && fields.distinct == fields,
      s"field list must be non-empty and duplicate-free, got $fields")
    mergeImpl(spark, batch, rootPath, fields, tokenize, numBuckets,
      tokenizerName, keepPositions)
  }

  private def mergeImpl(spark: SparkSession, batch: DataFrame, rootPath: String,
                        fields: Seq[String], tokenize: Column => Column,
                        numBuckets: Int, tokenizerName: Option[String],
                        keepPositions: Boolean): Unit = {
    // the merge computes removals by RE-tokenizing each touched doc's old
    // text — entries written under one tokenizer and removed under
    // another never match, stranding stale postings forever. A named
    // tokenizer pins itself in a `_tokenizer` root marker (the shingle
    // family's `_scheme` move): the first named merge records, a later
    // named merge with a different name fails loudly. Anonymous lambdas
    // (None) can't be checked and validate nothing — name the tokenizer
    // wherever the root outlives one writer.
    tokenizerName.foreach(n =>
      StateStore.ensureTag(spark, rootPath, "_tokenizer", n))
    // the FIELD LIST is always checkable (it's data, not code): the first
    // merge records it, and a later merge with a different list fails
    // loudly instead of stranding the missing fields' stale postings
    StateStore.ensureTag(spark, rootPath, "_fields", fields.mkString(","))
    val docsRoot = rootPath + "/docs"
    val entriesRoot = rootPath + "/entries"

    val withB = batch.withColumn("b", docBucket(numBuckets))
    val touchedDocB = withB.select("b").distinct().collect().map(_.getInt(0)).sorted
    if (touchedDocB.isEmpty) return // empty micro-batch: nothing to rewrite
    StateStore.ensureBucketCount(spark, docsRoot, numBuckets)
    StateStore.ensureBucketCount(spark, entriesRoot, numBuckets)
    val docDirs = touchedDocB.toSeq.map(b => s"b=$b")
    // Bucket dirs are read directly (no partition discovery); bucket ids
    // are recomputed from the keys where needed.
    val oldDocs = readBuckets(spark, docsRoot, docDirs, batch.limit(0))

    // Only rowkeys present in the batch can change; everything is derived
    // from this (small) touched set.
    val touched = batch.select("rowkey").distinct()
    // repartition by bucket: one file per rewritten bucket dir, so reads
    // open |buckets| files, not |buckets × writer partitions| (see
    // IncrementalIndex.mergeBatch)
    val mergedDocs = IncrementalIndex.compactAll(oldDocs.unionByName(batch))
      .withColumn("b", docBucket(numBuckets))
      .repartition(col("b")).cache()
    // removals: the touched docs' PREVIOUS tokens (tok-keyed delta);
    // additions: their tokens after the merge. A stale batch event leaves
    // both sides equal, so the entries are rewritten unchanged — idempotent.
    // Both are cached: each feeds the touched-bucket collect AND the
    // entries rewrite, and the tokenize explode is the merge's dominant
    // cost — recomputing it doubled the batch time.
    // removals never need positions — they are pure (tok, doc_id) anti-join
    // keys — so they always take the cheap explode path regardless of the
    // root's positions setting
    val removals = docToks(oldDocs.join(broadcast(touched), "rowkey"), tokenize,
      keepPositions = false, fields).cache()
    val additions = docToks(mergedDocs.drop("b").join(broadcast(touched), "rowkey"),
      tokenize, keepPositions, fields).cache()

    val touchedTokB = removals.select(tokBucket(numBuckets).as("b"))
      .unionByName(additions.select(tokBucket(numBuckets).as("b")))
      .distinct().collect().map(_.getInt(0)).sorted
    val entryDirs = touchedTokB.toSeq.map(b => s"b=$b")
    val oldEntries = withTf(readEntryBuckets(spark, entriesRoot, entryDirs,
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        entriesSchema).drop("b")))
    // Double anti-join (see crash protocol in the class doc): removals for
    // the delta, additions so replay over an already-promoted bucket
    // cannot duplicate them.
    val newEntries = oldEntries
      .join(removals, Seq("tok", "field", "doc_id"), "left_anti")
      .join(additions, Seq("tok", "field", "doc_id"), "left_anti")
      .unionByName(additions)
      .withColumn("b", tokBucket(numBuckets))
      .repartition(col("b")) // one file per rewritten entry bucket
      .cache()

    // Per-bucket doc stats for the touched buckets: a pure function of the
    // bucket's post-merge content, so replay reproduces identical rows —
    // idempotent exactly like the bucket rewrites themselves. Committed
    // LAST: a crash before this commit leaves stats one batch behind, and
    // the checkpointed replay recomputes them from the (already-new) docs.
    val statsRoot = rootPath + "/dstats"
    StateStore.ensureBucketCount(spark, statsRoot, numBuckets)
    val stats = bucketStats(mergedDocs, tokenize, fields)

    mergedDocs.count(); newEntries.count() // decouple from the input files
    try {
      // Bucket files are written CLUSTERED by their read key (entries by
      // tok, docs by rowkey) — Lucene's sorted term dictionary expressed
      // as parquet page statistics: a term/key predicate pushed into the
      // scan then skips the pages (and at scale, row groups) outside the
      // key's range instead of decoding the whole bucket. The sort runs
      // over the already-cached delta (batch-sized); [b, key] ordering
      // satisfies the partitioned writer's required [b] prefix, so no
      // order-destroying re-sort is inserted.
      if (entryDirs.nonEmpty)
        StateStore.commitBuckets(spark, entriesRoot, entryDirs) { tmp =>
          newEntries.sortWithinPartitions("b", "tok")
            .write.partitionBy("b").mode("overwrite").parquet(tmp)
        }
      StateStore.commitBuckets(spark, docsRoot, docDirs) { tmp =>
        mergedDocs.sortWithinPartitions("b", "rowkey")
          .write.partitionBy("b").mode("overwrite").parquet(tmp)
      }
      StateStore.commitBuckets(spark, statsRoot, docDirs) { tmp =>
        stats.write.partitionBy("b").mode("overwrite").parquet(tmp)
      }
      // Adopt pre-sidecar roots: any committed docs bucket still missing
      // its stats row gets one now (one-time, legacy buckets only), so a
      // partially-adopted sidecar can never under-count the corpus.
      val missing = (StateStore.liveBuckets(spark, docsRoot).toSet --
        StateStore.liveBuckets(spark, statsRoot).toSet).toSeq.sorted
      if (missing.nonEmpty) {
        val legacy = bucketStats(
          spark.read.parquet(missing.map(d => s"$docsRoot/$d"): _*)
            .withColumn("b", docBucket(numBuckets)), tokenize, fields)
        StateStore.commitBuckets(spark, statsRoot, missing) { tmp =>
          legacy.write.partitionBy("b").mode("overwrite").parquet(tmp)
        }
      }
      // df sidecar (opt-in, [[enableDfSidecar]]): each touched entries
      // bucket's dfs twin is recomputed from the already-cached post-merge
      // content — pure function of bucket content, so replay reproduces
      // identical rows. Committed after the entries (a crash between
      // leaves the sidecar one batch behind; the checkpointed replay
      // recomputes it from the already-new entries — dstats' argument).
      if (entryDirs.nonEmpty && dfSidecarEnabled(spark, rootPath)) {
        StateStore.ensureBucketCount(spark, dfsRoot(rootPath), numBuckets)
        StateStore.commitBuckets(spark, dfsRoot(rootPath), entryDirs) { tmp =>
          dfsOf(newEntries.drop("b"), numBuckets)
            .sortWithinPartitions("b", "tok")
            .write.partitionBy("b").mode("overwrite").parquet(tmp)
        }
      }
    } finally {
      mergedDocs.unpersist(); newEntries.unpersist()
      removals.unpersist(); additions.unpersist(): Unit
    }
  }

  /** Garbage-collect doc tombstones older than the source's replay horizon
    * — the retention discipline the docs state names (see
    * [[IncrementalIndex.gcTombstones]]; same contract: `horizonEventId`
    * must be ≤ the smallest event_id the source can still replay, or a
    * stale put below a GC'd tombstone could resurrect the doc). Tombstones
    * live ONLY in the docs state: a delete's postings are removed from the
    * entries at merge time ([[docToks]] drops deletes), so GC rewrites only
    * the doc buckets holding expired tombstones and never opens an entry
    * bucket — [[termSearch]] results are unchanged by construction. The
    * docs root shares `IncrementalIndex`'s layout (latest event per rowkey,
    * `crc32(rowkey)` buckets), so the rewrite is the proven one. */
  def gcTombstones(spark: SparkSession, rootPath: String, horizonEventId: Long,
                   numBuckets: Int = IncrementalIndex.DefaultBuckets): Unit =
    IncrementalIndex.gcTombstones(spark, rootPath + "/docs", horizonEventId, numBuckets)

  /** Re-bucket the whole postings root to `newBuckets` — the planned
    * resize when doc/entry buckets outgrow their rewrite unit (see
    * [[StateStore.rescale]] for the protocol and the shuffle-free
    * integer-multiple growth path). Docs re-hash by `rowkey`, entries by
    * `tok`, each under its own atomic whole-root swap; the dstats sidecar
    * is a per-docs-bucket AGGREGATE (its rows are keyed by the bucket id
    * itself), so it cannot be re-hashed — it is recomputed from the
    * rescaled docs, the same pure-function-of-bucket-content derivation
    * the merge writes, and committed with its own swap. A crash between
    * the three swaps leaves a mixed-count root whose next writer fails
    * [[StateStore.ensureBucketCount]] loudly (counts are pinned per
    * subroot) — re-running `rescale` converges: done subroots no-op.
    *
    * `tokenize` must be the root's own analyzer (it feeds the dstats
    * dl_sum recompute); a `tokenizerName` is validated against the
    * `_tokenizer` marker exactly as the merge validates it. Single-writer
    * contract: stop the stream first. */
  def rescale(spark: SparkSession, rootPath: String, newBuckets: Int,
              tokenizerName: Option[String] = None): Unit = {
    tokenizerName.foreach(n => StateStore.ensureTag(spark, rootPath, "_tokenizer", n))
    // the tokenizer-free dl derivation below is only valid when every
    // live entry carries a REAL tf: legacy pre-tf entry files (the
    // upgrade path withTf/readMerged's mergeSchema exists for) surface tf
    // as null (mixed root) or lose the column entirely (all-legacy root),
    // and summing withTf's tf=1 default would silently write dl_sum as
    // distinct-term counts — skewed BM25 length norms with no error.
    // Fail loudly, and BEFORE the bucket swaps: throwing after docs/
    // entries had re-bucketed would strand the root mixed-count, where
    // the prescribed remedy (a put merge) itself fails ensureBucketCount.
    // Pre-swap, the root is untouched and a re-merge then rescale works.
    locally {
      val entRoot = rootPath + "/entries"
      val entDirs = StateStore.liveBuckets(spark, entRoot)
      if (entDirs.nonEmpty) {
        val raw = readMerged(spark, entDirs.map(d => s"$entRoot/$d"))
        val legacy = !raw.columns.contains("tf") ||
          raw.filter(col("tf").isNull).limit(1).count() > 0
        if (legacy) throw new IllegalStateException(
          s"entries under $entRoot contain legacy rows without a tf " +
            "column; the tokenizer-free dl recompute cannot derive " +
            "document lengths from them — re-index those docs (a put " +
            "merge rewrites their buckets with true tf) before rescale")
      }
    }
    StateStore.rescale(spark, rootPath + "/docs", "rowkey", newBuckets)
    StateStore.rescale(spark, rootPath + "/entries", "tok", newBuckets)
    val docsRoot = rootPath + "/docs"
    val statsRoot = rootPath + "/dstats"
    val dirs = StateStore.liveBuckets(spark, docsRoot)
    if (dirs.nonEmpty) {
      // dl is recomputed TOKENIZER-FREE: each live doc's length is the
      // sum of its entries' term frequencies — the entries were derived
      // from the same text by the same analyzer at merge time, so the
      // sums are identical to re-tokenizing, for ANY scheme (word, CJK
      // bigram, char sketch). The previous implementation re-tokenized
      // the docs here, which forced the growth-gated auto-rescale to
      // reconstruct the analyzer from its name marker and silently fell
      // back to whitespace for an anonymous custom tokenizer — wrong
      // dl units with no error. Deriving from the index itself cannot
      // mismatch the index.
      // per-FIELD recompute (the `_fields` marker names the root's fields;
      // pre-marker roots are single-field by construction): a field's dl
      // is the sum of the doc's entries' tfs FOR THAT FIELD — same
      // tokenizer-free derivation as before, now keyed (doc, field) so a
      // multi-field root's sidecar keeps exact per-field N/avgdl
      val fields = StateStore.readTag(spark, rootPath, "_fields")
        .map(_.split(",").toSeq).getOrElse(Seq(DefaultField))
      val live = readMerged(spark, dirs.map(d => s"$docsRoot/$d"))
        .withColumn("b", docBucket(newBuckets))
        .filter(col("op") =!= "delete")
      val dl = allEntries(spark, rootPath)
        .groupBy("doc_id", "field").agg(sum("tf").as("dl"))
      val stats = fields.map { f =>
        val had = live.filter(col(f).isNotNull).select(col("rowkey"), col("b"))
        val dlf = dl.filter(col("field") === lit(f))
          .withColumnRenamed("doc_id", "rowkey").drop("field")
        had.join(dlf, Seq("rowkey"), "left")
          .groupBy("b").agg(
            count(lit(1)).as("n_docs"),
            coalesce(sum("dl"), lit(0L)).as("dl_sum"))
          .withColumn("field", lit(f))
      }.reduce(_ unionByName _).cache()
      stats.count() // decouple from the old dstats files before the swap
      try StateStore.commit(spark, statsRoot)(tmp =>
        stats.write.partitionBy("b").mode("overwrite").parquet(tmp))
      finally stats.unpersist(): Unit
    }
    else if (StateStore.nonEmpty(spark, statsRoot)) {
      // docs gone but a stale sidecar remains: clear it so the re-pin
      // below cannot collide with the old count's marker
      val p = new org.apache.hadoop.fs.Path(statsRoot)
      p.getFileSystem(spark.sessionState.newHadoopConf()).delete(p, true): Unit
    }
    // the swap replaced the sidecar root, marker included — re-pin
    StateStore.ensureBucketCount(spark, statsRoot, newBuckets)
    // df sidecar: tok-keyed, but recomputed from the rescaled entries
    // rather than re-hashed — the same pure-function-of-bucket-content
    // derivation the merge writes. The old root (old bucket-count marker
    // included) is dropped first; a crash between the delete and the
    // backfill leaves an enabled-but-empty sidecar, which reads as
    // "nothing saturated" — probes then read every list, the exact
    // fallback behavior (absent rows are always the safe direction), and
    // re-running rescale or the backfill converges.
    if (dfSidecarEnabled(spark, rootPath)) {
      val p = new org.apache.hadoop.fs.Path(dfsRoot(rootPath))
      p.getFileSystem(spark.sessionState.newHadoopConf()).delete(p, true)
      enableDfSidecar(spark, rootPath)
    }
  }

  /** All live entries rows (tok, doc_id) — the full-index read behind the
    * vocabulary and batch-probe paths (per-TERM reads use the bucket-
    * pruned [[prunedEntries]] instead). */
  private[streaming] def allEntries(spark: SparkSession, rootPath: String): DataFrame = {
    val root = rootPath + "/entries"
    val dirs = StateStore.liveBuckets(spark, root)
    withTf(
      if (dirs.nonEmpty) readEntriesRaw(spark, dirs.map(d => s"$root/$d"))
      else spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        entriesSchema).drop("b"))
  }

  /** The maintained inverted index, in `Index.postings` shape:
    * (tok, sorted doc ids, document frequency, total occurrence count). */
  def postings(spark: SparkSession, rootPath: String): DataFrame =
    allEntries(spark, rootPath).groupBy("tok")
      .agg(sort_array(collect_set(col("doc_id"))).as("ids"),
        countDistinct(col("doc_id")).as("df"),
        sum(col("tf")).as("n"))

  /** The maintained index's vocabulary — (tok, df, n). A vocabulary-sized
    * scan of the entries, never the docs: the read surface Solr's
    * suggester/spellchecker serve from the standing index. The entries'
    * tf column makes `n` the occurrence count, so maintained-state
    * vocabulary reads rank identically to the corpus-scoped
    * `q_suggest_prefix`/`q_spell_correct`. Aggregated straight from the
    * entries — NOT via [[postings]], whose sort_array(collect_set(id))
    * materializes a posting-mass-sized id array per token that a
    * (df, n) read never looks at (round-13 ADVICE). */
  def vocabulary(spark: SparkSession, rootPath: String): DataFrame =
    allEntries(spark, rootPath).groupBy("tok")
      .agg(countDistinct(col("doc_id")).as("df"),
        sum(col("tf")).as("n"))

  // ——— per-token document-frequency sidecar ———————————————————————————
  //
  // The remedy behind MaintenanceReport.dfSidecarAdvised (SCALE.md
  // §df-cap): on a boilerplate-heavy corpus most posting MASS belongs to
  // crowd tokens over the near-dup df cap, and candidate generation reads
  // those lists only to drop them. The sidecar keeps (tok, df) — two
  // columns, vocabulary-sized — in its own bucketed subroot, maintained
  // like dstats (each dfs bucket is a pure function of its entries
  // bucket's post-merge content, recomputed for exactly the touched
  // buckets), so a probe can learn WHICH of its query tokens are
  // saturated from rows proportional to the query, then skip reading the
  // saturated posting lists entirely. Opt-in ([[enableDfSidecar]]) —
  // a second maintained state is only worth keeping consistent once the
  // saturation trigger fires.

  private def dfsRoot(rootPath: String): String = rootPath + "/dfs"

  /** Whether `rootPath` maintains the per-token df sidecar (the `_dfs`
    * root marker [[enableDfSidecar]] sets). */
  def dfSidecarEnabled(spark: SparkSession, rootPath: String): Boolean =
    StateStore.readTag(spark, rootPath, "_dfs").contains("1")

  /** The (b, tok, df) rows for one set of entries buckets — the pure
    * function of bucket content both the backfill and the per-merge
    * maintenance write: a token's posting list is complete within its
    * bucket, so per-bucket df is exact. */
  private def dfsOf(entries: DataFrame, numBuckets: Int): DataFrame =
    entries.withColumn("b", tokBucket(numBuckets))
      .groupBy("b", "tok").agg(countDistinct(col("doc_id")).as("df"))

  /** Turn the df sidecar ON for an existing root and backfill it from the
    * live entries (one pass — vocabulary-shaped aggregate, committed
    * bucket-by-bucket under the usual swap protocol). Idempotent: re-run
    * recomputes the same rows. Every later merge keeps the touched
    * buckets current ([[mergeBatch]]); [[rescale]] recomputes it like
    * dstats. Single-writer contract as for any maintenance pass. */
  def enableDfSidecar(spark: SparkSession, rootPath: String): Unit = {
    val entriesRoot = rootPath + "/entries"
    val n = StateStore.bucketCount(spark, entriesRoot)
      .getOrElse(IncrementalIndex.DefaultBuckets)
    StateStore.ensureTag(spark, rootPath, "_dfs", "1")
    StateStore.ensureBucketCount(spark, dfsRoot(rootPath), n)
    val dirs = StateStore.liveBuckets(spark, entriesRoot)
    if (dirs.nonEmpty) {
      val dfs = dfsOf(withTf(readEntriesRaw(spark,
        dirs.map(d => s"$entriesRoot/$d"))), n).cache()
      dfs.count() // decouple from any prior dfs files before the swaps
      try StateStore.commitBuckets(spark, dfsRoot(rootPath), dirs) { tmp =>
        dfs.sortWithinPartitions("b", "tok")
          .write.partitionBy("b").mode("overwrite").parquet(tmp)
      } finally dfs.unpersist(): Unit
    }
  }

  /** The sidecar's (tok, df) rows for exactly `toks`, reading only the dfs
    * buckets those tokens hash to — per-probe I/O proportional to the
    * query's tokens, never the vocabulary. None when the root does not
    * maintain the sidecar (callers fall back to reading the lists). A
    * token with no postings has no row — absent means df = 0. */
  private[graft] def dfsForTokens(spark: SparkSession, rootPath: String,
                                  toks: Seq[String]): Option[DataFrame] = {
    if (!dfSidecarEnabled(spark, rootPath)) return None
    val root = dfsRoot(rootPath)
    val dirs = StateStore.bucketDirsFor(spark, root, toks)
    if (dirs.isEmpty)
      return Some(emptyDf(spark, StructType(Seq(
        StructField("tok", StringType), StructField("df", LongType)))))
    Some(spark.read.parquet(dirs.map(d => s"$root/$d"): _*)
      .filter(col("tok").isin(toks: _*))
      .select("tok", "df"))
  }

  /** [[dfsForTokens]] for a token FRAME (values are data, bucket ids are
    * driver metadata — [[bucketDirsForFrame]]'s contract): the batch
    * probe's sidecar read. None when the sidecar is disabled. */
  private[graft] def dfsForTokensFrame(spark: SparkSession, rootPath: String,
                                       toks: DataFrame): Option[DataFrame] = {
    if (!dfSidecarEnabled(spark, rootPath)) return None
    val root = dfsRoot(rootPath)
    val dirs = bucketDirsForFrame(spark, root, toks, "tok")
    dfsReadDirs(spark, root, dirs, toks)
  }

  /** [[dfsForTokensFrame]] served from an ENTRY-dir list already resolved
    * for the same token set ([[entryBucketDirsForFrame]]): the sidecar is
    * pinned to the entries' bucket count at enable time, so the same
    * `b=NN` names address the same tokens' dfs buckets — no second
    * distinct-bucket-id job. Falls back to its own derivation when the
    * counts are not provably equal (a root mid-adoption). */
  private[graft] def dfsForTokensFrameIn(spark: SparkSession, rootPath: String,
      entryDirs: Seq[String], toks: DataFrame): Option[DataFrame] = {
    if (!dfSidecarEnabled(spark, rootPath)) return None
    val root = dfsRoot(rootPath)
    val nEntries = StateStore.bucketCount(spark, rootPath + "/entries")
    val nDfs = StateStore.bucketCount(spark, root)
    if (nEntries.isEmpty || nEntries != nDfs)
      return dfsForTokensFrame(spark, rootPath, toks)
    val wanted = entryDirs.toSet
    val dirs = StateStore.liveBuckets(spark, root).filter(wanted.contains)
    dfsReadDirs(spark, root, dirs, toks)
  }

  private def dfsReadDirs(spark: SparkSession, root: String, dirs: Seq[String],
                          toks: DataFrame): Option[DataFrame] = {
    if (dirs.isEmpty)
      return Some(emptyDf(spark, StructType(Seq(
        StructField("tok", StringType), StructField("df", LongType)))))
    Some(spark.read.parquet(dirs.map(d => s"$root/$d"): _*)
      .join(toks.select("tok").distinct(), "tok")
      .select("tok", "df"))
  }

  /** The full sidecar (tok, df) view — the cheap source for saturation
    * monitoring once the sidecar exists (two columns of vocabulary-sized
    * metadata; no entries scan, no posting lists). None when disabled. */
  private[graft] def dfsAll(spark: SparkSession, rootPath: String): Option[DataFrame] = {
    if (!dfSidecarEnabled(spark, rootPath)) return None
    val root = dfsRoot(rootPath)
    val dirs = StateStore.liveBuckets(spark, root)
    if (dirs.isEmpty)
      return Some(emptyDf(spark, StructType(Seq(
        StructField("tok", StringType), StructField("df", LongType)))))
    Some(spark.read.parquet(dirs.map(d => s"$root/$d"): _*).select("tok", "df"))
  }

  /** Prefix completions from the MAINTAINED vocabulary, ranked by corpus
    * occurrence count — the same ranking as the corpus-scoped suggester. */
  def suggest(spark: SparkSession, rootPath: String, prefix: String,
              k: Int = 10): DataFrame =
    vocabulary(spark, rootPath)
      .filter(col("tok").startsWith(prefix))
      .select(col("tok"), col("n"))
      .orderBy(col("n").desc, col("tok"))
      .limit(k)

  /** Correction candidates from the MAINTAINED vocabulary: terms within
    * `maxEdits` of the query term, occurrence-ranked like the
    * corpus-scoped speller. */
  def spellCorrect(spark: SparkSession, rootPath: String, term: String,
                   maxEdits: Int = 1, k: Int = 5): DataFrame =
    vocabulary(spark, rootPath)
      .filter(levenshtein(col("tok"), lit(term)) <= maxEdits)
      .select(col("tok"), col("n"))
      .orderBy(col("n").desc, col("tok"))
      .limit(k)

  /** Fuzzy term query over MAINTAINED state — Solr's `term~maxEdits`:
    * live docs containing ANY vocabulary term within the edit bound.
    * Two-phase, like the corpus-scoped q_fuzzy_search: the edit-distance
    * scan runs once per distinct VOCABULARY term (the same entries-only
    * read suggest/spellCorrect use — bounded by |vocab|, never the
    * corpus), then the expansion set is served exactly like termSearch —
    * entries bucket-pruned to the expansion's buckets, hits key-fetched
    * from only their own doc buckets. */
  def fuzzySearch(spark: SparkSession, rootPath: String, term: String,
                  maxEdits: Int = 1): DataFrame = {
    val expansion = vocabulary(spark, rootPath)
      .filter(levenshtein(col("tok"), lit(term)) <= maxEdits)
      .select("tok")
    val hits = prunedEntriesForTokens(spark, rootPath, expansion)
      .select(col("doc_id").as("rowkey"))
    prunedDocsForKeys(spark, rootPath, hits)
  }

  /** Live view of the maintained document state (tombstones filtered);
    * empty with the documented schema before the first merge. */
  def docsState(spark: SparkSession, rootPath: String): DataFrame = {
    val root = rootPath + "/docs"
    val dirs = StateStore.liveBuckets(spark, root)
    // marker-derived schema (docsSchemaFor): single-footer inference
    // could miss a field column absent from the one sampled bucket
    val docs =
      if (dirs.nonEmpty)
        spark.read.schema(docsSchemaFor(spark, rootPath))
          .parquet(dirs.map(d => s"$root/$d"): _*)
      else emptyDocs(spark, rootPath)
    docs.filter(col("op") =!= "delete")
  }


  /** The entries rows for exactly `toks`, reading ONLY the buckets those
    * tokens hash to — per-query I/O is |touched buckets|, not the index.
    * A token's posting list is COMPLETE within its bucket, so per-token
    * counts (df) over this frame are exact. */
  private[graft] def prunedEntries(spark: SparkSession, rootPath: String,
                                       toks: Seq[String]): DataFrame = {
    val entriesRoot = rootPath + "/entries"
    val dirs = StateStore.bucketDirsFor(spark, entriesRoot, toks)
    val entries = withTf(
      if (dirs.nonEmpty) readEntriesRaw(spark, dirs.map(d => s"$entriesRoot/$d"))
      else emptyDf(spark, entriesSchema).drop("b"))
    entries.filter(col("tok").isin(toks: _*))
  }

  /** The entries rows matching a DataFrame of tokens whose VALUES are data
    * (too many to collect) but whose touched-BUCKET set is driver metadata
    * bounded by the bucket count: collect the distinct bucket ids the
    * tokens hash to (same move as the merge's touched-bucket collect),
    * read only those bucket dirs, and join. Per-call I/O is O(touched
    * entry buckets), never the index — the batch-probe analogue of
    * [[prunedEntries]]. A token's posting list is complete within its
    * bucket, so per-token counts over the result are exact. A missing
    * `_nbuckets` marker (pre-marker root) falls back to all live dirs. */
  private[graft] def prunedEntriesForTokens(spark: SparkSession, rootPath: String,
                                            toks: DataFrame): DataFrame =
    prunedEntriesForTokensIn(spark, rootPath,
      entryBucketDirsForFrame(spark, rootPath, toks), toks)

  /** The entry-bucket dirs `toks` hash into — the ONE distinct-bucket-id
    * driver job of [[prunedEntriesForTokens]], exposed so a caller with
    * several tok-keyed pruned reads of the SAME token set (the gate
    * probe: entries + dfs sidecar + candidate entries) runs the job once
    * and shares the result (round-17 verdict #2 — the probe's per-batch
    * fixed cost was dominated by repeated identical metadata jobs). */
  private[graft] def entryBucketDirsForFrame(spark: SparkSession,
      rootPath: String, toks: DataFrame): Seq[String] =
    bucketDirsForFrame(spark, rootPath + "/entries", toks, "tok")

  /** [[prunedEntriesForTokens]] over an already-resolved dir list
    * ([[entryBucketDirsForFrame]]). Passing a SUPERSET of the tokens'
    * own dirs is sound — the token join restricts rows either way; the
    * trade is scan width for driver jobs, the caller's call. */
  private[graft] def prunedEntriesForTokensIn(spark: SparkSession,
      rootPath: String, dirs: Seq[String], toks: DataFrame): DataFrame = {
    val entriesRoot = rootPath + "/entries"
    val entries = withTf(
      if (dirs.nonEmpty) readEntriesRaw(spark, dirs.map(d => s"$entriesRoot/$d"))
      else emptyDf(spark, entriesSchema).drop("b"))
    entries.join(toks.select("tok").distinct(), "tok")
  }

  /** The LIVE doc rows matching a DataFrame of rowkeys — bucket-pruned
    * like [[prunedEntriesForTokens]]: the keys stay distributed, only
    * their distinct bucket ids (≤ bucket count) are collected, and only
    * those doc buckets are opened. The batch form of the HBase-Get-shaped
    * [[prunedDocs]] fetch. */
  /** The docs state's schema from the root's own `_fields` marker — the
    * authority for which per-field columns a fields root stores (the
    * marker is ensured at every fields merge, and it is what keeps
    * single- and multi-field writers off each other's roots), so the
    * read-path fetches resolve every field column WITHOUT a mergeSchema
    * footer sweep: that sweep ran as a distributed job per fetch — pure
    * fixed cost on the gate and on every maintained query's read path —
    * and a SINGLE-footer inference could miss columns added after that
    * bucket last merged (the UNRESOLVED_COLUMN crash this schema
    * derivation, like the sweep before it, exists to prevent). Files
    * written before a field column existed surface it as null for their
    * rows, exactly as under mergeSchema. */
  private def docsSchemaFor(spark: SparkSession, rootPath: String): StructType =
    StateStore.readTag(spark, rootPath, "_fields") match {
      case Some(fs) => StructType(
        docsSchema.filterNot(_.name == "text") ++
          fs.split(",").toSeq.map(f => StructField(f, StringType)))
      case None => docsSchema
    }

  /** Zero rows in the docs state's OWN schema ([[docsSchemaFor]]): a
    * multi-field root's docs carry per-field columns, and an empty fetch
    * must still resolve them (the per-field dl melt selects the field
    * columns even when the hit list is empty). */
  private def emptyDocs(spark: SparkSession, rootPath: String): DataFrame =
    emptyDf(spark, docsSchemaFor(spark, rootPath))

  private[graft] def prunedDocsForKeys(spark: SparkSession, rootPath: String,
                                       keys: DataFrame): DataFrame = {
    val docsRoot = rootPath + "/docs"
    val dirs = bucketDirsForFrame(spark, docsRoot, keys, "rowkey")
    val docs =
      if (dirs.nonEmpty)
        spark.read.schema(docsSchemaFor(spark, rootPath))
          .parquet(dirs.map(d => s"$docsRoot/$d"): _*)
      else emptyDocs(spark, rootPath)
    docs.filter(col("op") =!= "delete").join(keys.select("rowkey").distinct(), "rowkey")
  }

  /** The LIVE doc rows for exactly `rowkeys`, reading only the buckets
    * those keys hash to — the HBase-Get-shaped fetch for hit lists with a
    * KNOWN bound (the probe's candidates are df-capped). Unbounded hit
    * lists (e.g. [[termSearch]]'s) stay DataFrame-joined against the full
    * docs state instead: collecting them would move data, not metadata. */
  private[graft] def prunedDocs(spark: SparkSession, rootPath: String,
                                    rowkeys: Seq[String]): DataFrame = {
    val docsRoot = rootPath + "/docs"
    val dirs = StateStore.bucketDirsFor(spark, docsRoot, rowkeys)
    val docs =
      if (dirs.nonEmpty)
        spark.read.schema(docsSchemaFor(spark, rootPath))
          .parquet(dirs.map(d => s"$docsRoot/$d"): _*)
      else emptyDocs(spark, rootPath)
    docs.filter(col("op") =!= "delete").filter(col("rowkey").isin(rowkeys: _*))
  }

  /** The reference's read topology over the MAINTAINED state — multi-term
    * AND via posting intersection, then key-fetch of the live rows (Solr
    * hit list → HBase Get, /root/reference/README.md:12-13) — with no
    * corpus scan anywhere. The entries read is bucket-pruned to the query
    * terms ([[prunedEntries]]); the (small) hit list broadcasts into the
    * fetch join. */
  def termSearch(spark: SparkSession, rootPath: String, terms: Seq[String]): DataFrame = {
    require(terms.nonEmpty, "termSearch needs at least one term")
    val uniq = terms.distinct
    val hits = prunedEntries(spark, rootPath, uniq)
      .groupBy(col("doc_id").as("rowkey"))
      .agg(countDistinct(col("tok")).as("nt"))
      .filter(col("nt") === uniq.length)
      .select("rowkey")
    docsState(spark, rootPath).join(broadcast(hits), "rowkey")
  }

  /** Wildcard/prefix search over the maintained state — Solr's
    * `field:pre*`: the prefix expands against the maintained VOCABULARY
    * (a term-dictionary range scan, the same cost shape as Solr's; the
    * expansion is data, never collected), then the expansion's postings
    * are served bucket-pruned and the hit docs key-fetched — the
    * [[fuzzySearch]] topology with a prefix predicate in place of edit
    * distance. */
  def wildcardSearch(spark: SparkSession, rootPath: String,
                     prefix: String): DataFrame = {
    require(prefix.nonEmpty, "wildcard search needs a non-empty prefix")
    val expansion = vocabulary(spark, rootPath)
      .filter(col("tok").startsWith(prefix))
      .select("tok")
    val hits = prunedEntriesForTokens(spark, rootPath, expansion)
      .select(col("doc_id").as("rowkey"))
    prunedDocsForKeys(spark, rootPath, hits)
  }

  /** Minimum-should-match retrieval over the maintained state — Solr
    * edismax's `mm` parameter: docs matching at least `minMatch` of the
    * query terms, with the match count carried for ranking. Same
    * bucket-pruned entries + broadcast-hit-list fetch as [[termSearch]]
    * (`termSearch` ≡ `minMatch = terms.size`). */
  def termSearchMinMatch(spark: SparkSession, rootPath: String,
                         terms: Seq[String], minMatch: Int): DataFrame = {
    val uniq = terms.distinct
    require(minMatch >= 1 && minMatch <= uniq.size,
      s"minMatch must be in [1, ${uniq.size}], got $minMatch")
    val hits = prunedEntries(spark, rootPath, uniq)
      .groupBy(col("doc_id").as("rowkey"))
      .agg(countDistinct(col("tok")).as("n_matched"))
      .filter(col("n_matched") >= minMatch)
    docsState(spark, rootPath).join(broadcast(hits), "rowkey")
  }

  /** Grouped-OR retrieval over the maintained state — the query shape
    * query-time synonym expansion produces (Solr's SynonymGraphFilter at
    * query time): each group is an OR of interchangeable terms, groups
    * AND together. `termSearch(ts)` ≡ `termSearchGroups(ts.map(Seq(_)))`.
    * Same bucket-pruned topology: entries open only the expansion terms'
    * buckets, the (tok → group) tag is driver-literal config broadcast
    * into the hit aggregation, and the hit list broadcasts into the
    * live-row fetch. Per-query I/O is Σ|postings(expansion)|, never the
    * corpus. */
  def termSearchGroups(spark: SparkSession, rootPath: String,
                       groups: Seq[Seq[String]]): DataFrame = {
    require(groups.nonEmpty && groups.forall(_.nonEmpty),
      "grouped search needs at least one non-empty term group")
    import spark.implicits._
    val uniq = groups.map(_.distinct)
    val tokGroup = uniq.zipWithIndex
      .flatMap { case (g, i) => g.map(t => (t, i)) }.toDF("tok", "grp")
    val hits = prunedEntries(spark, rootPath, uniq.flatten.distinct)
      .join(broadcast(tokGroup), "tok")
      .groupBy(col("doc_id").as("rowkey"))
      .agg(countDistinct(col("grp")).as("ng"))
      .filter(col("ng") === uniq.size)
      .select("rowkey")
    docsState(spark, rootPath).join(broadcast(hits), "rowkey")
  }

  /** `_seq`-stamped cache of tiny derived metadata frames (round-17
    * verdict #4): the ranking-statistics sidecar aggregates
    * ([[docStats]]/[[fieldStats]]) are ≤-field-count rows re-derived by a
    * full Spark action on EVERY ranked maintained read, although they can
    * only change when a commit lands on the root — which
    * [[StateStore.stateToken]] detects with one getFileStatus + two small
    * `_seq` reads, no job. A hit returns the collected rows as a
    * LocalRelation, so the consumer's `broadcast(...)`/`head()` runs
    * driver-side with ZERO Spark jobs — one fewer action per ranked
    * maintained query, the read-fresh contract preserved by construction
    * (any commit moves the token; seqlock fill as in the listing cache:
    * cache only when the token is unchanged across the compute).
    * Session-scoped (dropped with the session, like every artifact —
    * never persisted, never keyed on input paths across sessions). */
  private val metaFrameCache = new java.util.concurrent.ConcurrentHashMap[
    (SparkSession, String),
    (String, (org.apache.spark.sql.types.StructType, Array[org.apache.spark.sql.Row]))]()
  graft.operators.Materialize.onSessionFreed { s =>
    metaFrameCache.keySet.removeIf(_._1 eq s): Unit
  }

  private def cachedMetaFrame(spark: SparkSession, cacheKey: String,
      tokenRoot: String)(build: => DataFrame): DataFrame = {
    def local(schema: org.apache.spark.sql.types.StructType,
              rows: Array[org.apache.spark.sql.Row]): DataFrame =
      spark.createDataFrame(java.util.Arrays.asList(rows: _*), schema)
    val token = StateStore.stateToken(spark, tokenRoot)
    if (token.isEmpty) return build
    val k = (spark, cacheKey)
    val hit = metaFrameCache.get(k)
    if (hit != null && hit._1 == token.get) return local(hit._2._1, hit._2._2)
    val df = build
    val rows = df.collect()
    if (StateStore.stateToken(spark, tokenRoot) == token)
      metaFrameCache.put(k, (token.get, (df.schema, rows))): Unit
    local(df.schema, rows)
  }

  /** Corpus-level ranking statistics over the maintained state — one row
    * (n_docs, avgdl) summed from the per-bucket stats sidecar: ≤
    * bucket-count rows of metadata, no docs scan. avgdl is the exact
    * integer token-length sum over the exact live count, divided once in
    * double — the same arithmetic as the corpus-scoped BM25's `avg`.
    * Served from the `_seq`-stamped [[cachedMetaFrame]] when the sidecar
    * root is tokenizable (the fallback corpus aggregate of a pre-sidecar
    * root is never cached — no token root to validate against). */
  def docStats(spark: SparkSession, rootPath: String,
               tokenize: Column => Column = split(_, " ")): DataFrame =
    cachedMetaFrame(spark, s"docStats:$rootPath", rootPath + "/dstats")(
      docStatsUncached(spark, rootPath, tokenize))

  private def docStatsUncached(spark: SparkSession, rootPath: String,
               tokenize: Column => Column): DataFrame = {
    // guard symmetry with the `_fields` WRITE marker: a single-field
    // ranked read against a multi-field root would filter the sidecar to
    // a field that doesn't exist and score every document with NULL
    // statistics — silently. Fail loudly instead, like the write path.
    StateStore.readTag(spark, rootPath, "_fields").foreach { f =>
      if (f != DefaultField) throw new IllegalStateException(
        s"state at $rootPath is a multi-field root (fields=$f); " +
          "single-field ranked reads have no statistics here — use " +
          "bm25SearchFields/termSearchFields with explicit field boosts")
    }
    val root = rootPath + "/dstats"
    val dirs = StateStore.liveBuckets(spark, root)
    val per =
      if (dirs.nonEmpty) {
        // the sidecar went per-field in round 11: single-field reads take
        // the default field's rows (≡ all rows on a single-field root;
        // legacy pre-field rows surface field = NULL under mergeSchema
        // and ARE the default field). Summing across fields here would
        // silently hand a multi-field root's combined length mass to a
        // single-field ranking.
        val raw = readMerged(spark, dirs.map(d => s"$root/$d"))
        if (raw.columns.contains("field"))
          raw.filter(coalesce(col("field"), lit(DefaultField)) === DefaultField)
        else raw
      }
      else
        // pre-sidecar root: a one-time corpus-sized fallback aggregate,
        // measured with the CALLER's tokenizer so dl and avgdl stay in
        // the same units (one merge through the current code adopts the
        // sidecar for the touched buckets and onward)
        docsState(spark, rootPath).select(lit(1L).as("n_docs"),
          size(tokenize(col("text"))).cast("long").as("dl_sum"))
    per.agg(sum(col("n_docs")).as("n_docs"), sum(col("dl_sum")).as("dl_sum"))
      .select(col("n_docs"), (col("dl_sum").cast("double") / col("n_docs")).as("avgdl"))
  }

  /** PER-FIELD ranking statistics from the dstats sidecar — one row per
    * field (field, n_docs, avgdl), where n_docs is the field's docCount
    * (docs that HAVE the field — Lucene's per-field similarity statistic)
    * and avgdl its exact-integer length sum over that count. ≤ bucket ×
    * field rows of metadata, no docs scan. Legacy pre-field rows adopt
    * [[DefaultField]]. */
  def fieldStats(spark: SparkSession, rootPath: String): DataFrame =
    cachedMetaFrame(spark, s"fieldStats:$rootPath", rootPath + "/dstats")(
      fieldStatsUncached(spark, rootPath))

  private def fieldStatsUncached(spark: SparkSession, rootPath: String): DataFrame = {
    val root = rootPath + "/dstats"
    val dirs = StateStore.liveBuckets(spark, root)
    require(dirs.nonEmpty,
      s"no dstats sidecar at $rootPath — merge a batch first")
    val raw = readMerged(spark, dirs.map(d => s"$root/$d"))
    val per =
      if (raw.columns.contains("field"))
        raw.withColumn("field", coalesce(col("field"), lit(DefaultField)))
      else raw.withColumn("field", lit(DefaultField))
    per.groupBy("field")
      .agg(sum(col("n_docs")).as("n_docs"), sum(col("dl_sum")).as("dl_sum"))
      .select(col("field"), col("n_docs"),
        (col("dl_sum").cast("double") / col("n_docs")).as("avgdl"))
  }

  /** Multi-field boosted term search over the maintained state — Solr
    * edismax's `qf` (e.g. `qf=title^2 body`) with `tie=1.0`, i.e. the
    * per-field term frequencies (summed over the query's DISTINCT terms
    * — real `qf` queries are multi-term) weighted by their field boosts
    * and SUMMED. One bucket-pruned entries read serves every (term,
    * field): a term's postings for ALL fields live in the one bucket the
    * term hashes to (the field is posting payload, not part of the hash
    * key), so per-query I/O is the terms' buckets + the hit docs' own
    * buckets — never a corpus scan. Returns the live hit rows with
    * per-field `tf_<field>` counts and the weighted `score`. Docs
    * matching ONLY non-boosted fields are excluded (edismax searches
    * `qf` fields only). */
  def termSearchFields(spark: SparkSession, rootPath: String,
                       terms: Seq[String],
                       boosts: Seq[(String, Double)]): DataFrame = {
    // checkpoint the hit list: it is consumed THREE times (the bucket-dir
    // collect inside prunedDocsForKeys, the pruning join, the final
    // broadcast), and without the checkpoint each consumer re-decodes the
    // pruned entry buckets from parquet
    val hits = qfHits(spark, rootPath, terms, boosts).localCheckpoint()
    prunedDocsForKeys(spark, rootPath, hits.select("rowkey"))
      .join(broadcast(hits), "rowkey")
  }

  /** The `qf` hit frame shared by [[termSearchFields]] and
    * [[phraseBoostSearchFields]]: (rowkey, tf_<field>…, score) — per-doc
    * per-field tf summed over the query terms, boost-weighted. Σ df(term)
    * input rows from the bucket-pruned entries; never a corpus scan. */
  private def qfHits(spark: SparkSession, rootPath: String,
                     terms: Seq[String],
                     boosts: Seq[(String, Double)]): DataFrame =
    qfHitsFrom(prunedEntries(spark, rootPath, terms.distinct), terms, boosts)

  /** [[qfHits]] over an already-read entries frame — so
    * [[phraseBoostSearchFields]] can serve qf tf AND phrase positions from
    * ONE bucket-pruned read (the qf terms and the phrase terms usually
    * overlap; round 12's shipped key had them identical, and the two
    * independent `prunedEntries` reads opened and decoded the same
    * buckets twice). */
  private def qfHitsFrom(ent: DataFrame, terms: Seq[String],
                         boosts: Seq[(String, Double)]): DataFrame = {
    require(terms.nonEmpty, "qf needs at least one term")
    require(boosts.nonEmpty && boosts.map(_._1).distinct.size == boosts.size,
      s"qf needs a non-empty, duplicate-free field->boost list, got $boosts")
    val e = ent.filter(col("tok").isin(terms.distinct: _*))
    val tfAggs = boosts.map { case (f, _) =>
      sum(when(col("field") === f, col("tf"))).as(s"tf_$f") }
    val score = boosts.map { case (f, w) =>
      coalesce(col(s"tf_$f"), lit(0L)) * lit(w) }.reduce(_ + _)
    e.groupBy(col("doc_id").as("rowkey"))
      .agg(tfAggs.head, tfAggs.tail: _*)
      .filter(boosts.map { case (f, _) => col(s"tf_$f").isNotNull }.reduce(_ || _))
      .select(col("rowkey") +:
        boosts.map { case (f, _) => coalesce(col(s"tf_$f"), lit(0L)).as(s"tf_$f") } :+
        score.as("score"): _*)
  }

  /** Per-doc, per-field phrase frequency from the POSITIONS payload —
    * one row per matching doc (`rowkey`, `pf_<field>`…): the number of
    * positions where the whole phrase occurs contiguously in each of the
    * `fields` given, the classic positional start-witness intersection
    * ([[phraseSearch]]'s algorithm) COUNTED per field instead of
    * collapsed to a match set. Input is the phrase terms' entry rows
    * (from the caller's shared bucket-pruned read, pre-restricted to the
    * qf HIT docs — pf is boost-only, so a non-hit doc's rows can never
    * affect results and are dropped BEFORE the positions
    * check); output is ≤ |matching doc| rows. Fails loudly on a
    * positions-free row of a HIT doc, like [[phraseSearch]] — a
    * positions-free row of a non-hit doc (legacy or keepPositions=false
    * re-put) no longer aborts the query (round-12 ADVICE). */
  private def phraseTfFields(spark: SparkSession, ent: DataFrame,
                             hitKeys: DataFrame,
                             phrase: Seq[String],
                             fields: Seq[String]): DataFrame = {
    require(phrase.length >= 2, "a phrase boost needs >= 2 terms")
    import spark.implicits._
    val slots = phrase.zipWithIndex.toDF("tok", "slot")
    // The null-positions guard lives AFTER an explode_outer, not in a
    // pre-explode projection: a plain explode makes Catalyst infer
    // `size(positions) > 0 AND isnotnull(positions)` from the generator —
    // a filter CONTAINING the raise_error CASE — and push it below the
    // hit-docs semi-join to the scan, re-widening the blast radius this
    // join exists to shrink. explode_outer infers nothing (its output is
    // nullable: a null array yields one null-pos row, which the guard
    // converts to the loud failure), and the guard can't be pushed below
    // the generator whose output it references. A kept entry row always
    // has non-empty positions (tf ≥ 1), so pos-null ⟺ positions-null.
    ent.filter(col("tok").isin(phrase.distinct: _*))
      .filter(col("field").isin(fields: _*))
      .join(broadcast(hitKeys.select(col("rowkey").as("doc_id"))),
        Seq("doc_id"), "left_semi")
      .join(broadcast(slots), "tok")
      .select(col("tok"), col("doc_id"), col("field"), col("slot"),
        explode_outer(col("positions")).as("pos0"))
      .select(col("doc_id"), col("field"), col("slot"),
        when(col("pos0").isNull, raise_error(concat(
          lit("no position payload for term '"), col("tok"),
          lit("' of doc "), col("doc_id"),
          lit(" (pre-positions row or keepPositions=false root); "),
          lit("re-put the doc or use the corpus-scoped phrase boost"))))
          .otherwise(col("pos0")).as("pos"))
      // count(1), not countDistinct(slot) (which plans an Expand): for a
      // fixed (doc, field, start), slot s contributes at most ONE row —
      // its witnessing position is pinned to start + s and a term's
      // positions are distinct — so the row count IS the distinct-slot
      // count (repeated phrase terms are distinct slots, same as
      // [[phraseSearch]])
      .groupBy(col("doc_id"), col("field"), (col("pos") - col("slot")).as("start"))
      .agg(count(lit(1)).as("nslots"))
      .filter(col("nslots") === phrase.length)
      // widen to one row per doc HERE (conditional per-field counts)
      // instead of a (doc, field) groupBy followed by the caller's (doc)
      // pivot — the chained regroup was a third shuffle for nothing
      .groupBy(col("doc_id").as("rowkey"))
      .agg(fields.map(f =>
          sum(when(col("field") === f, 1L)).as(s"pf_$f")).head,
        fields.map(f =>
          sum(when(col("field") === f, 1L)).as(s"pf_$f")).tail: _*)
  }

  /** Edismax `qf` + `pf` over the maintained state — the full deployed
    * form: the multi-term [[termSearchFields]] score, PLUS a phrase-
    * proximity boost for documents where the query terms appear as a
    * contiguous phrase in a `pf` field (Solr's `pf=title^3 body^1.5`:
    * docs already matching the main query get `pfBoost_f × phraseTf_f`
    * added — pf boosts, it never admits new docs). The phrase
    * frequencies come from the round-9 POSITIONS payload
    * ([[phraseTfFields]]); the whole read is ONE bucket-pruned entry pass
    * over the union of the qf and phrase terms' buckets
    * (`localCheckpoint`ed, the [[termHits]] discipline — qf tf and phrase
    * positions are both served from it) and the hit docs' keyed fetch —
    * no corpus scan. Returns the live hit rows with `tf_<field>` counts,
    * `pf_<field>` phrase counts, and the combined `score`. */
  def phraseBoostSearchFields(spark: SparkSession, rootPath: String,
                              terms: Seq[String],
                              boosts: Seq[(String, Double)],
                              phrase: Seq[String],
                              pf: Seq[(String, Double)]): DataFrame = {
    require(pf.nonEmpty && pf.map(_._1).distinct.size == pf.size,
      s"pf needs a non-empty, duplicate-free field->boost list, got $pf")
    // one read of the union'd pruned buckets serves qf tf AND phrase
    // positions (in the deployed form the term sets overlap or coincide;
    // two independent prunedEntries reads decoded the same buckets twice)
    val ent = prunedEntries(spark, rootPath, (terms ++ phrase).distinct)
      .select("tok", "field", "doc_id", "tf", "positions")
      .localCheckpoint()
    val hits = qfHitsFrom(ent, terms, boosts)
    // already wide — one row per hit doc with per-field phrase counts
    // (conditional aggregation inside phraseTfFields' own groupBy; a
    // .pivot() here would plan TWO extra aggregates for a known field list)
    val pfWide = phraseTfFields(spark, ent, hits.select("rowkey"),
      phrase, pf.map(_._1))
    val pfScore = pf.map { case (f, w) =>
      coalesce(col(s"pf_$f"), lit(0L)) * lit(w) }.reduce(_ + _)
    // left join: pf BOOSTS qf hits, it never admits a phrase-only doc.
    // Checkpointed: `boosted` is consumed three times (bucket-dir collect,
    // pruning join, final broadcast) and its subtree — qf agg + the whole
    // phrase-intersection pipeline — would otherwise run once per consumer.
    val boosted = hits.withColumnRenamed("score", "qf_score")
      .join(pfWide, Seq("rowkey"), "left")
      .select(col("rowkey") +:
        (boosts.map { case (f, _) => col(s"tf_$f") } ++
          pf.map { case (f, _) => coalesce(col(s"pf_$f"), lit(0L)).as(s"pf_$f") }) :+
        (col("qf_score") + pfScore).as("score"): _*)
      .localCheckpoint()
    prunedDocsForKeys(spark, rootPath, boosted.select("rowkey"))
      .join(broadcast(boosted), "rowkey")
  }

  /** Multi-field BM25 over the maintained state — Lucene's per-field
    * similarity under edismax `qf` with `tie=1.0`: every field is its own
    * index with its OWN statistics (df per (term, field), docCount and
    * avgdl per field from the [[fieldStats]] sidecar, dl per (doc,
    * field) from the fetched rows), each (term, field) contribution is
    * the standard BM25 term (k1=1.2, b=0.75, constant-folded literals as
    * everywhere), weighted by the field boost, and summed per doc. Read
    * shape is [[bm25Search]]'s: bucket-pruned entries (a (term, field)
    * posting set is complete within the term's bucket, so df is exact),
    * metadata-sized sidecar, hit-list-broadcast fetch of only the hit
    * docs' buckets — no corpus file opened. `tokenize` must match the
    * state's merge tokenizer. */
  def bm25SearchFields(spark: SparkSession, rootPath: String,
                       terms: Seq[String], boosts: Seq[(String, Double)],
                       k: Int = 20,
                       tokenize: Column => Column = split(_, " ")): DataFrame = {
    require(terms.nonEmpty, "ranked retrieval needs at least one term")
    require(boosts.nonEmpty && boosts.map(_._1).distinct.size == boosts.size,
      s"qf needs a non-empty, duplicate-free field->boost list, got $boosts")
    import spark.implicits._
    val fieldNames = boosts.map(_._1)
    // sidecar first: an un-merged root fails HERE with fieldStats'
    // "merge a batch first" instead of an unresolved-column error from
    // the per-field dl melt over the empty docs fallback
    val fstats = fieldStats(spark, rootPath)
    val ent = prunedEntries(spark, rootPath, terms.distinct)
      .filter(col("field").isin(fieldNames: _*))
      .select("tok", "field", "doc_id", "tf")
      .localCheckpoint() // one read of the pruned buckets for df AND tf
    val hits = ent
      .join(broadcast(ent.groupBy("tok", "field").agg(count(lit(1)).as("df"))),
        Seq("tok", "field"))
    val boostDf = boosts.toDF("field", "boost")
    // per-field dl of the hit docs, from the fetched rows' own columns —
    // ONE pass over the (bucket-pruned) fetch: the fields melt through a
    // single explode instead of one read per field. A null field value
    // (doc doesn't have the field) surfaces dl -1 under this engine's
    // legacy sizeOfNull (size(NULL) = -1, not NULL — same semantics as
    // the bucketStats guard) and is dropped by the >= 0 filter; the
    // isNotNull leg covers a future ANSI flip where size(NULL) IS NULL.
    val docs = prunedDocsForKeys(spark, rootPath,
      hits.select(col("doc_id").as("rowkey")))
    val dls = docs.select(col("rowkey").as("doc_id"),
        explode(array(fieldNames.map(f => struct(lit(f).as("field"),
          size(tokenize(col(f))).cast("long").as("dl"))): _*)).as("fd"))
      .select(col("doc_id"), col("fd.field").as("field"), col("fd.dl").as("dl"))
      .filter(col("dl").isNotNull && col("dl") >= 0)
    dls.join(broadcast(hits), Seq("doc_id", "field"))
      .join(broadcast(fstats), "field")
      .join(broadcast(boostDf), "field")
      .withColumn("contrib",
        col("boost") *
          log(lit(1.0) + (col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5))) *
          (lit(2.2) * col("tf")) /
          (col("tf") + lit(1.2) * (lit(0.25) + lit(0.75) * col("dl") / col("avgdl"))))
      .groupBy("doc_id")
      .agg(round(sum(col("contrib")), 4).as("score"))
      .orderBy(col("score").desc, col("doc_id"))
      .limit(k)
  }

  /** The query terms' posting rows with their per-term df joined in —
    * (tok, doc_id, tf, df) from the bucket-pruned entries; the shared
    * head of both ranked-retrieval reads. */
  private def termHits(spark: SparkSession, rootPath: String,
                       terms: Seq[String]): DataFrame = {
    require(terms.nonEmpty, "ranked retrieval needs at least one term")
    val ent = prunedEntries(spark, rootPath, terms.distinct)
      .select("tok", "doc_id", "tf")
    // checkpointed: the hit frame feeds the fetch's bucket-id collect AND
    // the scoring join (bm25 additionally broadcasts it) — one read of
    // the pruned entry buckets instead of one per consumer
    ent.join(broadcast(ent.groupBy("tok").agg(count(lit(1)).as("df"))), "tok")
      .localCheckpoint()
  }

  /** BM25 ranked retrieval served ENTIRELY from the maintained state —
    * Solr's default similarity (BM25Similarity, k1=1.2, b=0.75, the
    * reference's actual ranking) over the incrementally-maintained index:
    * tf and df from the query terms' BUCKET-PRUNED entries (a term's
    * posting list is complete within its bucket, so both are exact),
    * N/avgdl from the [[docStats]] sidecar (metadata-sized), and dl from
    * the hit rows' text at fetch time. The hit list (Σ df(term) rows)
    * broadcasts into the docs join — the same hit-list-into-fetch
    * topology as [[termSearch]]. Arithmetic is operation-for-operation
    * the corpus-scoped `Index.qBm25Topk`'s (constant-folded 2.2/0.25
    * literals, one round at the end), so converged state ranks
    * identically — spec-pinned and oracle-checked (`q_bm25_maintained`).
    * `tokenize` must match the one the state was merged with. */
  def bm25Search(spark: SparkSession, rootPath: String, terms: Seq[String],
                 k: Int = 20, tokenize: Column => Column = split(_, " ")): DataFrame =
    bm25Scored(spark, rootPath, terms, tokenize)
      .orderBy(col("score").desc, col("doc_id"))
      .limit(k)

  /** The query terms' hit rows — (tok, doc_id, tf, df), checkpointed —
    * exposed so a caller composing a predicate (Hybrid's filtered
    * lexical leg) can derive the candidate ids from ONE entry-bucket
    * read and hand the frame back to [[bm25ScoredFrom]]. */
  private[graft] def bm25Hits(spark: SparkSession, rootPath: String,
      terms: Seq[String]): DataFrame = termHits(spark, rootPath, terms)

  /** [[bm25Search]]'s scored candidates PRE top-k — every doc matching at
    * least one term, as (doc_id, score). The seam a FILTERED search
    * composes a predicate into: filtering here, before the rank
    * truncation, keeps k-fill semantics (the leg fills its depth from
    * MATCHING docs — post-filtering a ranked list returns only the
    * matchers that happened to rank), while scoring stats stay the full
    * state's (Lucene's fq discipline: a filter never changes idf/avgdl).
    * Candidate-bounded (Σ df(term) docs), never corpus-sized. */
  private[graft] def bm25Scored(spark: SparkSession, rootPath: String,
      terms: Seq[String],
      tokenize: Column => Column = split(_, " ")): DataFrame =
    bm25ScoredFrom(spark, rootPath, termHits(spark, rootPath, terms),
      None, tokenize)

  /** [[bm25Scored]] over an already-built hit frame ([[bm25Hits]]),
    * optionally RESTRICTED to `among` (a (doc_id) frame): the semi-join
    * applies before the doc-length fetch, so only the surviving hits'
    * buckets are opened — a selective predicate prunes the expensive
    * half of scoring, not just the rank. Restricting candidates never
    * changes a survivor's score: tf/df/dl are per-doc or per-term facts
    * and n_docs/avgdl are state-level ([[docStats]]), none affected by
    * which OTHER candidates are scored. */
  private[graft] def bm25ScoredFrom(spark: SparkSession, rootPath: String,
      hits0: DataFrame, among: Option[DataFrame],
      tokenize: Column => Column = split(_, " ")): DataFrame = {
    val hits = among.map(a =>
        hits0.join(broadcast(a.select(col("doc_id"))), Seq("doc_id"), "left_semi")
          .localCheckpoint())
      .getOrElse(hits0)
    val stats = docStats(spark, rootPath, tokenize)
    // the length fetch opens only the hit docs' own buckets: the hit KEYS
    // stay distributed, but their distinct bucket ids are collectable
    // metadata (prunedDocsForKeys) — same O(touched buckets) discipline
    // as the probe's fetch, instead of scanning every doc bucket for dl
    prunedDocsForKeys(spark, rootPath, hits.select(col("doc_id").as("rowkey")))
      .select(col("rowkey").as("doc_id"), size(tokenize(col("text"))).cast("long").as("dl"))
      .join(broadcast(hits), "doc_id")
      .crossJoin(broadcast(stats))
      .withColumn("contrib",
        log(lit(1.0) + (col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5))) *
          (lit(2.2) * col("tf")) /
          (col("tf") + lit(1.2) * (lit(0.25) + lit(0.75) * col("dl") / col("avgdl"))))
      .groupBy("doc_id")
      .agg(round(sum(col("contrib")), 4).as("score"))
  }

  /** BM25 with query-time synonym expansion over the maintained state —
    * Lucene's SynonymQuery scoring (what Solr does when the query
    * analyzer expands a term): each OR group scores as ONE pseudo-term,
    * tf(doc) = Σ member tf, df = MAX member df (SynonymQuery#docFreq),
    * so a synonym group never inflates idf the way separately-scored OR
    * terms would. Same bucket-pruned read shape and constant-folded
    * arithmetic as [[bm25Search]] (`bm25Search(ts)` ≡ singleton groups);
    * the corpus-scoped twin is `Index.qSynonymBm25`, one oracle checks
    * both. `tokenize` must match the state's merge tokenizer. */
  def bm25SearchGroups(spark: SparkSession, rootPath: String,
                       groups: Seq[Seq[String]], k: Int = 20,
                       tokenize: Column => Column = split(_, " ")): DataFrame = {
    require(groups.nonEmpty && groups.forall(_.nonEmpty),
      "grouped ranked retrieval needs at least one non-empty term group")
    import spark.implicits._
    val uniq = groups.map(_.distinct)
    val tokGroup = uniq.zipWithIndex
      .flatMap { case (g, i) => g.map(t => (t, i)) }.toDF("tok", "grp")
    val tagged = prunedEntries(spark, rootPath, uniq.flatten.distinct)
      .select("tok", "doc_id", "tf")
      .join(broadcast(tokGroup), "tok")
      .localCheckpoint() // one read of the pruned buckets for df AND tf
    val dfg = tagged.select("grp", "tok", "doc_id").distinct()
      .groupBy("grp", "tok").agg(count(lit(1)).as("df"))
      .groupBy("grp").agg(max(col("df")).as("df"))
    val hits = tagged.groupBy("grp", "doc_id").agg(sum(col("tf")).as("tf"))
      .join(broadcast(dfg), "grp")
    val stats = docStats(spark, rootPath, tokenize)
    prunedDocsForKeys(spark, rootPath, hits.select(col("doc_id").as("rowkey")))
      .select(col("rowkey").as("doc_id"), size(tokenize(col("text"))).cast("long").as("dl"))
      .join(broadcast(hits), "doc_id")
      .crossJoin(broadcast(stats))
      .withColumn("contrib",
        log(lit(1.0) + (col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5))) *
          (lit(2.2) * col("tf")) /
          (col("tf") + lit(1.2) * (lit(0.25) + lit(0.75) * col("dl") / col("avgdl"))))
      .groupBy("doc_id")
      .agg(round(sum(col("contrib")), 4).as("score"))
      .orderBy(col("score").desc, col("doc_id"))
      .limit(k)
  }

  /** TF-IDF ranked retrieval from the maintained state — same read shape
    * as [[bm25Search]] (bucket-pruned entries for tf/df, N from the stats
    * sidecar), same arithmetic as the corpus-scoped `q_tfidf_topk`
    * (score = Σ tf·ln(N/df), one round at the end), so a converged corpus
    * ranks identically. No docs read at all: unlike BM25 there is no
    * length normalization, so the whole query is answered from the
    * entries plus one metadata row. */
  def tfidfSearch(spark: SparkSession, rootPath: String, terms: Seq[String],
                  k: Int = 20): DataFrame = {
    termHits(spark, rootPath, terms)
      .crossJoin(broadcast(docStats(spark, rootPath).select("n_docs")))
      .groupBy("doc_id")
      .agg(round(sum(col("tf") * log(col("n_docs") / col("df"))), 4).as("score"))
      .orderBy(col("score").desc, col("doc_id"))
      .limit(k)
  }

  /** More-like-this over the MAINTAINED state — Solr's MLT served with
    * zero corpus scans: the seed document's distinct terms are fetched by
    * key (one [[prunedDocs]] Get — a single doc's vocabulary is driver
    * metadata, the same bound as the probe's query shingles), then the
    * overlap count per candidate comes from the bucket-pruned entries of
    * exactly those terms. Returns (doc_id, overlap), best first, seed
    * excluded. `tokenize` must match the state's merge tokenizer. */
  def moreLikeThis(spark: SparkSession, rootPath: String, seedKey: String,
                   k: Int = 10,
                   tokenize: Column => Column = split(_, " ")): DataFrame = {
    val seedToks = prunedDocs(spark, rootPath, Seq(seedKey))
      .select(explode(array_distinct(tokenize(col("text")))).as("tok"))
      .collect().map(_.getString(0)).toSeq.distinct
    if (seedToks.isEmpty) // unknown or deleted seed: empty, not an error
      return spark.range(0).select(lit("").as("doc_id"), lit(0L).as("overlap"))
    prunedEntries(spark, rootPath, seedToks)
      .filter(col("doc_id") =!= seedKey)
      .groupBy("doc_id").agg(count(lit(1)).as("overlap"))
      .orderBy(col("overlap").desc, col("doc_id"))
      .limit(k)
  }

  /** Phrase query over the MAINTAINED state — Solr's `"t0 t1 …"~0` served
    * from the entries' position lists by adjacency intersection, the
    * classic positional-index algorithm: an occurrence of slot-i's term at
    * position p witnesses a phrase START at p − i, and a document matches
    * iff some start is witnessed by EVERY slot (row count per start ==
    * phrase length: slot s's witness is pinned to position start + s and
    * a term's positions are distinct, so each slot contributes at most
    * one row — plain count(1) IS the distinct-slot count, without
    * countDistinct's Expand. Repeated terms in the phrase are distinct
    * slots, so "a a" requires two adjacent positions, not one counted
    * twice).
    * The start-group key includes FIELD (like [[phraseTfFields]]): a
    * multi-field root stores one entry row per (tok, doc, field), so a
    * (doc, start) group without field would mix witnesses across fields
    * — 'a'@1 in title plus 'a'@1 in body would count as two slots of a
    * two-term phrase, and a genuine per-field match could be rejected
    * when cross-field rows push the count past the phrase length. A
    * phrase matches within ONE field; matching fields collapse to the
    * doc set afterwards.
    * Read shape is [[termSearch]]'s: the entries read is bucket-pruned to
    * the phrase's distinct terms, per-query work is Σ tf(term) position
    * rows, and the matched rows are key-fetched from only their own doc
    * buckets ([[prunedDocsForKeys]]) — no corpus scan anywhere.
    *
    * Positions are NULL on rows written before the positions payload (or
    * under `keepPositions = false` — the shingle family); a phrase query
    * over such a root fails loudly rather than silently never matching
    * the affected docs — re-put the docs (any put recomputes its rows) or
    * keep phrase queries on the corpus-scoped path for legacy roots. */
  def phraseSearch(spark: SparkSession, rootPath: String,
                   phrase: Seq[String]): DataFrame = {
    require(phrase.nonEmpty, "phraseSearch needs at least one term")
    import spark.implicits._
    val slots = phrase.zipWithIndex.toDF("tok", "slot")
    val starts = prunedEntries(spark, rootPath, phrase.distinct)
      .select(col("tok"), col("doc_id"),
        coalesce(col("field"), lit(DefaultField)).as("field"),
        when(col("positions").isNull, raise_error(concat(
          lit("no position payload for term '"), col("tok"),
          lit("' of doc "), col("doc_id"),
          lit(" (pre-positions row or keepPositions=false root); "),
          lit("re-put the doc or use the corpus-scoped phrase query"))))
          .otherwise(col("positions")).as("positions"))
      .join(broadcast(slots), "tok")
      .select(col("doc_id"), col("field"), col("slot"),
        explode(col("positions")).as("pos"))
      .groupBy(col("doc_id"), col("field"),
        (col("pos") - col("slot")).as("start"))
      .agg(count(lit(1)).as("nslots"))
      .filter(col("nslots") === phrase.length)
    prunedDocsForKeys(spark, rootPath,
      starts.select(col("doc_id").as("rowkey")).distinct())
  }

  /** Solr highlighting served from MAINTAINED state: each live doc's
    * sorted position list for `term`, straight from the entries' position
    * payload — no corpus scan and no re-tokenization at read time; I/O is
    * the term's single entry bucket (deletes already anti-joined their
    * entries away, so every row here is a live doc). Positions come back
    * 1-based and comma-joined — the corpus-scoped q_highlight's canonical
    * encoding, so the two surfaces are directly comparable. Fails loudly
    * on a positions-free root, like [[phraseSearch]]. */
  def highlight(spark: SparkSession, rootPath: String, term: String): DataFrame =
    prunedEntries(spark, rootPath, Seq(term))
      .select(col("doc_id"),
        when(col("positions").isNull, raise_error(concat(
          lit(s"no position payload for term '$term' of doc "), col("doc_id"),
          lit(" (pre-positions row or keepPositions=false root); "),
          lit("re-put the doc or use the corpus-scoped highlight"))))
          .otherwise(col("positions")).as("positions"))
      .select(col("doc_id"),
        array_join(transform(col("positions"),
          p => (p + 1).cast("string")), ",").as("positions"),
        size(col("positions")).cast("long").as("n_hits"))

  /** Wire a streaming document changelog into the postings merge sink.
    * `firstDelaySeconds` mirrors the reference's `first_delay`
    * (application.properties:10) — see [[IncrementalIndex.start]]. */
  def start(changes: DataFrame, rootPath: String, checkpoint: String,
            intervalSeconds: Int = 30,
            tokenize: Column => Column = split(_, " "),
            firstDelaySeconds: Int = 0,
            numBuckets: Int = IncrementalIndex.DefaultBuckets,
            tokenizerName: Option[String] = None): StreamingQuery = {
    val gate = IncrementalIndex.firstBatchGate(firstDelaySeconds)
    val fence = WriterFence.claim(changes.sparkSession, rootPath)
    changes.writeStream
      .outputMode("append")
      .trigger(Trigger.ProcessingTime(s"$intervalSeconds seconds"))
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        gate()
        fence.check(batch.sparkSession)
        mergeBatch(batch.sparkSession, batch, rootPath, tokenize, numBuckets,
          tokenizerName)
      }
      .start()
  }
}
