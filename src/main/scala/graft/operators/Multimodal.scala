package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Multimodal-column plumbing (driver contract): media as opaque `binary`
  * columns with typed metadata, decode/feature-extraction as a batched
  * per-partition transform.
  *
  * The container has no image/audio codecs, so the decode step is a
  * clearly-marked deterministic stub ([[MultimodalStub.decodeStub]]); what
  * is real and tested is the Spark-side plumbing: the binary column + typed
  * metadata schema, the per-partition batching (`mapPartitions` over a
  * typed Dataset — the Scala analog of `mapInPandas`: one iterator per
  * partition, amortized setup), and the pipeline shape that keeps binary
  * payloads out of shuffles (extract features first, shuffle the small
  * feature rows, never the blobs).
  *
  * Scale notes: at 100 TB the media bytes dominate storage; the rule
  * enforced here is that wide binary columns are scanned and reduced to
  * fixed-width features in the map stage, so every exchange downstream
  * carries features (a few hundred bytes) instead of payloads (MBs). The
  * oracle-checked `q_multimodal_meta` covers the metadata math on the
  * codegen path.
  */
object Multimodal {
  type Q = (SparkSession, String) => DataFrame

  /** A media row: opaque payload + typed metadata. */
  case class MediaRecord(doc_id: Long, media: Array[Byte], format: String, nbytes: Long)

  /** Extracted fixed-width features (what flows through shuffles). */
  case class MediaFeatures(doc_id: Long, nbytes: Long, digest: String,
                           fake_width: Int, fake_height: Int)

  /** Attach a binary media column (fixture: the UTF-8 text bytes stand in
    * for an encoded image payload) plus typed metadata. */
  def withMedia(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      encode(col("text"), "UTF-8").as("media"),
      lit("fake/rgb8").as("format"),
      octet_length(col("text")).cast("long").as("nbytes"))

  /** Batched per-partition featurizer over the typed Dataset — the
    * mapInPandas-shaped path for codecs that only exist as JVM/native
    * libraries: the codec context is opened once per partition, and rows
    * flow through in fixed-size batches (the arrow-batch shape — real
    * decoders amortize model/codec invocation across a batch, not a row).
    * Decode itself is stubbed (no codecs in this container); the
    * partitioning, batching, and schema contract are the real, tested
    * part. */
  def featurize(media: Dataset[MediaRecord], maxBatchRows: Int = 64,
                maxBatchBytes: Long = 4L << 20): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      // Per-partition setup: a real impl opens the codec/model once here.
      val codec = MultimodalStub
      // Batches are bounded in BYTES as well as rows: payloads are
      // MB-scale, so a row-only bound would buffer hundreds of MB per
      // task. A batch closes at maxBatchRows rows or maxBatchBytes of
      // payload, whichever first (a single oversized payload still forms
      // its own batch).
      byteBudgetedBatches(it, maxBatchRows, maxBatchBytes).flatMap { batch =>
        // a real impl hands the whole batch to the codec in one call
        val decoded = codec.decodeBatchStub(batch.map(_.media))
        batch.lazyZip(decoded).map { (r, px) =>
          MediaFeatures(r.doc_id, r.nbytes, px.digest, px.width, px.height)
        }
      }
    }
  }

  private def byteBudgetedBatches(it: Iterator[MediaRecord], maxRows: Int,
                                  maxBytes: Long): Iterator[Seq[MediaRecord]] =
    new Iterator[Seq[MediaRecord]] {
      override def hasNext: Boolean = it.hasNext
      override def next(): Seq[MediaRecord] = {
        val buf = scala.collection.mutable.ArrayBuffer.empty[MediaRecord]
        var bytes = 0L
        while (it.hasNext && buf.length < maxRows &&
          (buf.isEmpty || bytes < maxBytes)) {
          val r = it.next()
          buf += r
          bytes += r.media.length
        }
        buf.toSeq
      }
    }

  private def qMultimodalMeta(spark: SparkSession, dir: String): DataFrame =
    // Metadata math on the codegen path (mirrors decodeStub's geometry so
    // the oracle covers the same arithmetic the stub performs).
    withMedia(Tables.documents(spark, dir))
      .select(col("doc_id"), col("format"), col("nbytes"),
        md5(col("media")).as("digest"),
        (col("nbytes") % 640).cast("long").as("fake_width"),
        ((col("nbytes") * 7) % 480).cast("long").as("fake_height"))
      .orderBy("doc_id")

  val queries: Map[String, Q] = Map(
    "q_multimodal_meta" -> qMultimodalMeta)

  val oracle: Map[String, String] = Map(
    "q_multimodal_meta" ->
      """SELECT doc_id, 'fake/rgb8' AS format, CAST(strlen(text) AS BIGINT) AS nbytes,
        |       md5(text) AS digest,
        |       CAST(strlen(text) % 640 AS BIGINT) AS fake_width,
        |       CAST((strlen(text) * 7) % 480 AS BIGINT) AS fake_height
        |FROM documents ORDER BY doc_id""".stripMargin)
}

/** Stub boundary for codecs absent from this container. Deterministic fake
  * so the pipeline is testable end-to-end; swap the body for a real decoder
  * (ImageIO / ffmpeg bindings) in production. */
object MultimodalStub {
  case class DecodedMedia(width: Int, height: Int, digest: String)

  /** STUB: a real implementation would decode the payload. The fake derives
    * geometry from the byte length and digests the payload — deterministic
    * and schema-identical to a real decoder's output. */
  def decodeStub(payload: Array[Byte]): DecodedMedia = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val digest = md.digest(payload).map("%02x".format(_)).mkString
    // Long arithmetic, matching qMultimodalMeta / the oracle (`nbytes * 7 %
    // 480` on BIGINT): an Int product would overflow for payloads > ~306 MB
    val nbytes = payload.length.toLong
    DecodedMedia((nbytes % 640).toInt, (nbytes * 7 % 480).toInt, digest)
  }

  /** STUB: batch entry point — a real decoder processes the batch in one
    * native/model call; the fake maps the scalar stub. */
  def decodeBatchStub(payloads: Seq[Array[Byte]]): Seq[DecodedMedia] =
    payloads.map(decodeStub)
}
