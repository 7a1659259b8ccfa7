package graft

import org.apache.spark.sql.functions._
import graft.operators.{Multimodal, MultimodalStub}

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    (0L, "hello world", "en", "src0", 11L),
    (1L, "tiny", "en", "src1", 4L))
    .toDF("doc_id", "text", "lang", "source", "n_chars")

  test("withMedia produces a binary payload with typed metadata") {
    val m = Multimodal.withMedia(docs).collect()
    val r0 = m.find(_.getAs[Long]("doc_id") == 0L).get
    assert(new String(r0.getAs[Array[Byte]]("media"), "UTF-8") === "hello world")
    assert(r0.getAs[Long]("nbytes") === 11L)
    assert(r0.getAs[String]("format") === "fake/rgb8")
  }

  test("featurize runs per-partition over the typed Dataset and matches the stub") {
    val media = Multimodal.withMedia(docs).as[Multimodal.MediaRecord]
    val feats = Multimodal.featurize(media).collect().sortBy(_.doc_id)
    val expect = MultimodalStub.decodeStub("hello world".getBytes("UTF-8"))
    assert(feats(0).digest === expect.digest)
    assert(feats(0).fake_width === expect.width)
    assert(feats(0).fake_height === expect.height)
  }

  test("stub decode is deterministic and geometry is bounded") {
    val a = MultimodalStub.decodeStub(Array[Byte](1, 2, 3))
    val b = MultimodalStub.decodeStub(Array[Byte](1, 2, 3))
    assert(a === b)
    assert(a.width >= 0 && a.width < 640 && a.height >= 0 && a.height < 480)
  }

  test("resize stage fits frames inside the target box, preserving aspect ratio") {
    import graft.operators.MultimodalStub.DecodedMedia
    val big = DecodedMedia(600, 400, "d")
    val r = MultimodalStub.resizeStub(big, 300, 300)
    assert(r.width === 300 && r.height === 200) // scale 0.5, ratio preserved
    assert(r.digest === "d")
    // identity inside the box; never collapses to zero
    assert(MultimodalStub.resizeStub(DecodedMedia(100, 50, "x"), 300, 300) ===
      DecodedMedia(100, 50, "x"))
    val tiny = MultimodalStub.resizeStub(DecodedMedia(5000, 1, "y"), 10, 10)
    assert(tiny.width >= 1 && tiny.height >= 1)
    // and through the featurizer: every output fits the box
    val media = Multimodal.withMedia(docs).as[Multimodal.MediaRecord]
    val feats = Multimodal.featurize(media, resizeTo = Some((4, 4))).collect()
    assert(feats.nonEmpty)
    feats.foreach(f => assert(f.fake_width <= 4 && f.fake_height <= 4))
  }

  test("frame sampling: codec face equals the declarative oracle-checked form") {
    val real = Tables.documents(spark, "/root/testdata/sf0.001")
    val declarative = SparkEntry.queries("q_frame_sample")(spark, "/root/testdata/sf0.001")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3),
        r.getLong(4), r.getLong(5))).toSet
    val typed = Multimodal.sampleFrames(
        Multimodal.withVideo(real).select("doc_id", "media", "duration_ms")
          .as[Multimodal.VideoRecord])
      .collect()
      .map(f => (f.doc_id, f.frame_idx, f.ts_ms, f.digest,
        f.width.toLong, f.height.toLong)).toSet
    assert(declarative === typed && declarative.nonEmpty)
  }

  test("every video yields at least one frame; frame count tracks duration") {
    val videos = Seq(
      Multimodal.VideoRecord(0L, "x".getBytes, 0L),        // degenerate: 1 frame
      Multimodal.VideoRecord(1L, "abc".getBytes, 3500L))   // 3 full seconds
      .toDS()
    val frames = Multimodal.sampleFrames(videos).collect().groupBy(_.doc_id)
    assert(frames(0L).map(_.ts_ms).toSeq === Seq(0L))
    assert(frames(1L).map(_.ts_ms).sorted.toSeq === Seq(0L, 1000L, 2000L))
  }

  test("audio chunking: codec face equals the declarative oracle-checked form") {
    val real = Tables.documents(spark, "/root/testdata/sf0.001")
    val declarative = SparkEntry.queries("q_audio_chunks")(spark, "/root/testdata/sf0.001")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4), r.getLong(5))).toSet
    val typed = Multimodal.chunkAudio(Multimodal.withAudio(real).as[Multimodal.AudioRecord])
      .collect()
      .map(a => (a.doc_id, a.win_idx, a.start_sample, a.ts_ms, a.digest, a.energy))
      .toSet
    assert(declarative === typed && declarative.nonEmpty)
  }

  test("every clip yields at least one window; window count tracks samples") {
    val clips = Seq(
      Multimodal.AudioRecord(0L, "x".getBytes, 16000, 100L),   // < one window
      Multimodal.AudioRecord(1L, "abc".getBytes, 16000, 4500L)) // 2000+1000k spans
      .toDS()
    val wins = Multimodal.chunkAudio(clips).collect().groupBy(_.doc_id)
    assert(wins(0L).map(_.start_sample).toSeq === Seq(0L))
    // windows start every 1000 samples while a full-or-partial tail remains:
    // max(0, 4500-2000)/1000 + 1 = 3 windows
    assert(wins(1L).map(_.start_sample).sorted.toSeq === Seq(0L, 1000L, 2000L))
    // ts_ms derives from the hop and rate: 1000 samples at 16 kHz = 62 ms
    assert(wins(1L).sortBy(_.win_idx).map(_.ts_ms).toSeq === Seq(0L, 62L, 125L))
  }

  test("query metadata math agrees with the mapPartitions featurizer") {
    // The oracle-checked q_multimodal_meta and the typed featurize path
    // must compute the same digest/geometry.
    val viaQuery = Multimodal.withMedia(docs)
      .select(col("doc_id"), md5(col("media")).as("digest"),
        (col("nbytes") % 640).cast("int").as("w"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2))).toSet
    val viaTyped = Multimodal.featurize(Multimodal.withMedia(docs).as[Multimodal.MediaRecord])
      .collect().map(f => (f.doc_id, f.digest, f.fake_width)).toSet
    assert(viaQuery === viaTyped)
  }
}
