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
                maxBatchBytes: Long = 4L << 20,
                resizeTo: Option[(Int, Int)] = None): Dataset[MediaFeatures] = {
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
        batch.lazyZip(decoded).map { (r, px0) =>
          val px = resizeTo.fold(px0) { case (w, h) => codec.resizeStub(px0, w, h) }
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

  /** A video row: opaque payload + duration metadata (fixture: text bytes
    * stand in for the container stream; 40 ms of fake video per byte). */
  case class VideoRecord(doc_id: Long, media: Array[Byte], duration_ms: Long)

  /** One sampled, decoded frame (fixed-width — what flows onward). */
  case class FrameFeatures(doc_id: Long, frame_idx: Long, ts_ms: Long,
                           digest: String, width: Int, height: Int)

  /** Attach the fake video payload + duration metadata. */
  def withVideo(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      encode(col("text"), "UTF-8").as("media"),
      octet_length(col("text")).cast("long").as("nbytes"),
      (octet_length(col("text")) * 40).cast("long").as("duration_ms"))

  /** Frame sampling, codec face: uniform every `everyMs` (≥ 1 frame per
    * video), decoded per partition — the sample plan is derived from
    * METADATA, and each payload is consulted only inside its own task, so
    * video bytes are never replicated across frame rows or shuffled.
    * Decode is [[MultimodalStub.decodeFrameStub]] (no codecs in this
    * container); MultimodalSpec pins this face equal to the
    * oracle-checked declarative form (`q_frame_sample`). */
  def sampleFrames(videos: Dataset[VideoRecord],
                   everyMs: Long = 1000L): Dataset[FrameFeatures] = {
    import videos.sparkSession.implicits._
    videos.mapPartitions { it =>
      val codec = MultimodalStub // real impl: open the demuxer once here
      it.flatMap { v =>
        val n = math.max(1L, v.duration_ms / everyMs)
        (0L until n).iterator.map { i =>
          val ts = i * everyMs
          val px = codec.decodeFrameStub(v.media, ts)
          FrameFeatures(v.doc_id, i, ts, px.digest, px.width, px.height)
        }
      }
    }
  }

  /** An audio row: opaque payload + PCM metadata (fixture: text bytes stand
    * in for the encoded stream; 16 fake samples per byte at 16 kHz). */
  case class AudioRecord(doc_id: Long, media: Array[Byte], sample_rate: Int,
                         n_samples: Long)

  /** One analysis window's fixed-width features (what flows onward). */
  case class AudioFeatures(doc_id: Long, win_idx: Long, start_sample: Long,
                           ts_ms: Long, digest: String, energy: Long)

  /** Window geometry shared by the codec face, the declarative form, and
    * the oracle: 2000-sample windows, 1000-sample hop, every clip gets at
    * least one (possibly partial) window. */
  private[graft] val AudioWindow = 2000L
  private[graft] val AudioHop = 1000L

  /** Attach the fake audio payload + PCM metadata. */
  def withAudio(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      encode(col("text"), "UTF-8").as("media"),
      lit(16000).as("sample_rate"),
      (octet_length(col("text")) * 16).cast("long").as("n_samples"))

  /** Audio chunking, codec face: fixed window/hop analysis frames — the
    * window list is derived from METADATA (`n_samples`), and each payload
    * is consulted only inside its own task, so audio bytes are never
    * replicated across window rows or shuffled. Decode is
    * [[MultimodalStub.decodeAudioWindowStub]] (no codecs in this
    * container); MultimodalSpec pins this face equal to the oracle-checked
    * declarative form (`q_audio_chunks`). */
  def chunkAudio(audios: Dataset[AudioRecord],
                 windowSamples: Long = AudioWindow,
                 hopSamples: Long = AudioHop): Dataset[AudioFeatures] = {
    import audios.sparkSession.implicits._
    audios.mapPartitions { it =>
      val codec = MultimodalStub // real impl: open the decoder once here
      it.flatMap { a =>
        // max(0, n-w)/hop + 1 windows — ≥ 1 per clip, non-negative
        // arithmetic only (floor vs truncate division never diverges).
        val n = math.max(0L, a.n_samples - windowSamples) / hopSamples + 1
        (0L until n).iterator.map { i =>
          val start = i * hopSamples
          val w = codec.decodeAudioWindowStub(a.media, start, a.n_samples)
          AudioFeatures(a.doc_id, i, start,
            start * 1000 / a.sample_rate, w.digest, w.energy)
        }
      }
    }
  }

  private def qAudioChunks(spark: SparkSession, dir: String): DataFrame =
    // Declarative audio chunking: the window list explodes from SAMPLE
    // METADATA (sequence over window indices), the payload column is
    // projected away before the output sort — audio bytes never cross an
    // exchange. The stub's digest is md5(payload ++ "#" ++ start_sample),
    // which the oracle reproduces byte-for-byte on the text fixture.
    // greatest(0, n-w) keeps the division non-negative: Spark `div`
    // truncates while DuckDB `//` floors, and they only disagree below 0.
    withAudio(Tables.documents(spark, dir))
      .select(col("doc_id"), col("media"), col("n_samples"), col("sample_rate"),
        explode(sequence(lit(0L),
          expr(s"greatest(0L, n_samples - $AudioWindow) div $AudioHop"))).as("win_idx"))
      .withColumn("start_sample", col("win_idx") * AudioHop)
      .select(col("doc_id"), col("win_idx"), col("start_sample"),
        expr("start_sample * 1000 div sample_rate").as("ts_ms"),
        md5(concat(col("media"),
          encode(concat(lit("#"), col("start_sample").cast("string")), "UTF-8"))).as("digest"),
        ((col("n_samples") + col("start_sample")) % 1000).cast("long").as("energy"))
      .orderBy("doc_id", "win_idx")

  private def qFrameSample(spark: SparkSession, dir: String): DataFrame =
    // Declarative frame sampling: the frame list explodes from DURATION
    // METADATA (sequence over frame indices), so the generate is driven by
    // a scalar, and the payload column is projected away before the output
    // sort — video bytes never cross an exchange. The stub's digest is
    // md5(payload ++ ":" ++ ts), which the oracle reproduces byte-for-byte
    // on the text fixture — even the decode arithmetic is oracle-checked.
    withVideo(Tables.documents(spark, dir))
      .select(col("doc_id"), col("media"), col("nbytes"),
        explode(sequence(lit(0L),
          greatest(lit(0L), expr("duration_ms div 1000") - 1))).as("frame_idx"))
      .withColumn("ts_ms", col("frame_idx") * 1000)
      .select(col("doc_id"), col("frame_idx"), col("ts_ms"),
        md5(concat(col("media"),
          encode(concat(lit(":"), col("ts_ms").cast("string")), "UTF-8"))).as("digest"),
        ((col("nbytes") + col("ts_ms")) % 640).cast("long").as("width"),
        ((col("nbytes") * 7 + col("ts_ms")) % 480).cast("long").as("height"))
      .orderBy("doc_id", "frame_idx")

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
    "q_multimodal_meta" -> qMultimodalMeta,
    "q_frame_sample" -> qFrameSample,
    "q_audio_chunks" -> qAudioChunks)

  val oracle: Map[String, String] = Map(
    "q_audio_chunks" ->
      """WITH a AS (
        |  SELECT doc_id, text, strlen(text) * 16 AS n_samples
        |  FROM documents),
        |w AS (
        |  SELECT doc_id, text, n_samples,
        |         unnest(generate_series(0, greatest(0, n_samples - 2000) // 1000)) AS win_idx
        |  FROM a)
        |SELECT doc_id, win_idx, win_idx * 1000 AS start_sample,
        |       (win_idx * 1000 * 1000) // 16000 AS ts_ms,
        |       md5(text || '#' || CAST(win_idx * 1000 AS VARCHAR)) AS digest,
        |       CAST((n_samples + win_idx * 1000) % 1000 AS BIGINT) AS energy
        |FROM w ORDER BY doc_id, win_idx""".stripMargin,
    "q_frame_sample" ->
      """WITH v AS (
        |  SELECT doc_id, text, strlen(text) AS nbytes,
        |         strlen(text) * 40 AS duration_ms
        |  FROM documents),
        |f AS (
        |  SELECT doc_id, text, nbytes,
        |         unnest(generate_series(0, greatest(0, duration_ms // 1000 - 1))) AS frame_idx
        |  FROM v)
        |SELECT doc_id, frame_idx, frame_idx * 1000 AS ts_ms,
        |       md5(text || ':' || CAST(frame_idx * 1000 AS VARCHAR)) AS digest,
        |       CAST((nbytes + frame_idx * 1000) % 640 AS BIGINT) AS width,
        |       CAST((nbytes * 7 + frame_idx * 1000) % 480 AS BIGINT) AS height
        |FROM f ORDER BY doc_id, frame_idx""".stripMargin,
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

  /** STUB: resize to fit within (maxW, maxH) preserving aspect ratio —
    * downscale-only, never below 1×1, identity when already inside the
    * box. A real impl calls the codec's scaler; the geometry contract
    * (bounded output, preserved ratio, idempotent no-op) is the tested
    * part. */
  def resizeStub(d: DecodedMedia, maxW: Int, maxH: Int): DecodedMedia = {
    require(maxW > 0 && maxH > 0, "resize bounds must be positive")
    if (d.width <= maxW && d.height <= maxH) d
    else {
      val scale = math.min(maxW.toDouble / d.width, maxH.toDouble / d.height)
      DecodedMedia(
        math.max(1, (d.width * scale).toInt),
        math.max(1, (d.height * scale).toInt), d.digest)
    }
  }

  case class DecodedAudioWindow(energy: Long, digest: String)

  /** STUB: decode + analyze one PCM window starting at `startSample`. The
    * fake digests payload ++ "#" ++ startSample and derives a fake energy
    * from the sample geometry — deterministic, schema-identical to a real
    * analysis frame, and reproducible in plain SQL so the declarative
    * `q_audio_chunks` oracle covers the same arithmetic. */
  def decodeAudioWindowStub(payload: Array[Byte], startSample: Long,
                            nSamplesTotal: Long): DecodedAudioWindow = {
    val md = java.security.MessageDigest.getInstance("MD5")
    md.update(payload)
    md.update(s"#$startSample".getBytes("UTF-8"))
    val digest = md.digest().map("%02x".format(_)).mkString
    DecodedAudioWindow((nSamplesTotal + startSample) % 1000, digest)
  }

  /** STUB: seek + decode one frame at `tsMs`. The fake digests
    * payload ++ ":" ++ ts — deterministic, schema-identical to a real
    * frame grab, and reproducible in plain SQL so the declarative
    * `q_frame_sample` oracle covers the same arithmetic. */
  def decodeFrameStub(payload: Array[Byte], tsMs: Long): DecodedMedia = {
    val md = java.security.MessageDigest.getInstance("MD5")
    md.update(payload)
    md.update(s":$tsMs".getBytes("UTF-8"))
    val digest = md.digest().map("%02x".format(_)).mkString
    val nbytes = payload.length.toLong
    DecodedMedia(((nbytes + tsMs) % 640).toInt, ((nbytes * 7 + tsMs) % 480).toInt, digest)
  }
}
