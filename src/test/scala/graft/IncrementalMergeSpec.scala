package graft

import java.nio.file.Files
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.streaming.{IncrementalIndex, StateStore}

/** The core invariant of the incremental design, on real fixture data:
  * folding the changelog through per-chunk merges (the streaming
  * `foreachBatch` path) must land in exactly the state a full recompaction
  * produces — for any chunking. */
class IncrementalMergeSpec extends SparkSpec {

  private def changelog: DataFrame =
    Tables.events(spark, "/root/testdata/sf0.001").select(
      col("user_id").cast("string").as("rowkey"),
      col("event_id"),
      when(col("event_type") === "error", "delete").otherwise("put").as("op"),
      round(col("value"), 2).as("payload"))

  private def stateMap(df: DataFrame): Map[String, (Long, Double)] =
    df.collect().map(r => r.getAs[String]("rowkey") ->
      (r.getAs[Long]("event_id"), r.getAs[Double]("payload"))).toMap

  test("chunked incremental merges equal full recompaction (1000 events, 4 chunks)") {
    val ev = changelog
    val statePath = Files.createTempDirectory("graft_inc").toString + "/state"
    val bounds = Seq((0L, 250L), (250L, 500L), (500L, 750L), (750L, 1000000L))
    bounds.foreach { case (lo, hi) =>
      val chunk = ev.filter(col("event_id") >= lo && col("event_id") < hi)
      IncrementalIndex.mergeBatch(spark, chunk, statePath)
    }
    val incremental = stateMap(IncrementalIndex.readState(spark, statePath))
    val full = stateMap(IncrementalIndex.compact(ev))
    assert(incremental === full)
    assert(incremental.nonEmpty)
  }

  test("out-of-order chunks converge too (tombstones block stale resurrection)") {
    val ev = changelog
    val statePath = Files.createTempDirectory("graft_incO").toString + "/state"
    // deliver the NEWEST quarter first, oldest last — worst-case reordering
    val bounds = Seq((750L, 1000000L), (500L, 750L), (250L, 500L), (0L, 250L))
    bounds.foreach { case (lo, hi) =>
      IncrementalIndex.mergeBatch(spark,
        ev.filter(col("event_id") >= lo && col("event_id") < hi), statePath)
    }
    assert(stateMap(IncrementalIndex.readState(spark, statePath)) ===
      stateMap(IncrementalIndex.compact(ev)))
  }

  private def bucketDirs(base: String): Seq[String] =
    new java.io.File(base).listFiles().map(_.getName)
      .filter(n => n.startsWith("b=") && !n.endsWith(".old")).toSeq.sorted

  test("leftover .tmpbatch/.old dirs from an interrupted merge don't break the next one") {
    val ev = changelog
    val base = Files.createTempDirectory("graft_incL").toString + "/state"
    IncrementalIndex.mergeBatch(spark, ev.filter(col("event_id") < 500), base)
    // simulate an interrupted previous bucketed commit: a stale tmp root,
    // plus a completed commit's leftover backup next to a live bucket
    new java.io.File(base + ".tmpbatch/b=0").mkdirs()
    val live = bucketDirs(base).head
    new java.io.File(s"$base/$live.old").mkdirs()
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$base/$live.old", "junk"), "stale")
    IncrementalIndex.mergeBatch(spark, ev.filter(col("event_id") >= 500), base)
    assert(stateMap(IncrementalIndex.readState(spark, base)) ===
      stateMap(IncrementalIndex.compact(ev)))
    assert(!new java.io.File(s"$base/$live.old").exists())
  }

  test("a crash between a bucket swap's renames doesn't lose state (.old is restored)") {
    // Dying between `rename(target, backup)` and `rename(tmp, target)`
    // leaves the ONLY copy of that bucket at `b=<i>.old`. The next
    // merge/read must restore it before reading — otherwise the bucket's
    // rows would silently vanish from the state.
    val ev = changelog
    val base = Files.createTempDirectory("graft_incR").toString + "/state"
    IncrementalIndex.mergeBatch(spark, ev.filter(col("event_id") < 500), base)
    val victim = bucketDirs(base).head
    val p = new org.apache.hadoop.fs.Path(s"$base/$victim")
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    assert(fs.rename(p, new org.apache.hadoop.fs.Path(s"$base/$victim.old")))
    // the next chunk's merge heals the bucket whether or not it touches it
    IncrementalIndex.mergeBatch(spark, ev.filter(col("event_id") >= 500), base)
    assert(stateMap(IncrementalIndex.readState(spark, base)) ===
      stateMap(IncrementalIndex.compact(ev)))
  }

  private def snapshot(base: String): Map[String, Map[String, String]] =
    bucketDirs(base).map { d =>
      d -> new java.io.File(s"$base/$d").listFiles().filter(_.isFile).map { f =>
        val bytes = java.nio.file.Files.readAllBytes(f.toPath)
        f.getName -> java.security.MessageDigest.getInstance("MD5").digest(bytes)
          .map("%02x".format(_)).mkString
      }.toMap
    }.toMap

  test("a merge rewrites ONLY the buckets the batch touches (untouched dirs byte-identical)") {
    // The delta-sized-write property — the reference's whole point
    // (SolrIndexTools.java:93-144 flushes the delta, never the index).
    val ev = changelog
    val base = Files.createTempDirectory("graft_incD").toString + "/state"
    IncrementalIndex.mergeBatch(spark, ev, base)
    val before = snapshot(base)
    val oneKey = ev.select("rowkey").orderBy("rowkey").limit(1)
      .collect().head.getString(0)
    IncrementalIndex.mergeBatch(spark,
      ev.filter(col("rowkey") === oneKey)
        .withColumn("event_id", col("event_id") + 1000000L), base)
    val after = snapshot(base)
    val crc = new java.util.zip.CRC32()
    crc.update(oneKey.getBytes("UTF-8"))
    val touched = s"b=${java.lang.Math.floorMod(crc.getValue, IncrementalIndex.DefaultBuckets.toLong)}"
    assert(before.keySet === after.keySet)
    assert(before.contains(touched))
    for (d <- before.keySet if d != touched)
      assert(before(d) === after(d), s"untouched bucket $d was rewritten")
    assert(before(touched) !== after(touched), "touched bucket should be rewritten")
  }

  test("get opens only the key's bucket dir and respects tombstones (the HBase Get)") {
    val root = Files.createTempDirectory("graft_get").toString + "/state"
    IncrementalIndex.mergeBatch(spark, changelog, root)
    def bucketOf(key: String): String = {
      val crc = new java.util.zip.CRC32()
      crc.update(key.getBytes("UTF-8"))
      s"b=${java.lang.Math.floorMod(crc.getValue, IncrementalIndex.DefaultBuckets.toLong)}"
    }
    val full = stateMap(IncrementalIndex.readState(spark, root))
    val someLive = full.keySet.take(2).toSeq
    val got = IncrementalIndex.get(spark, root, someLive)
    assert(stateMap(got) === full.view.filterKeys(someLive.contains).toMap)
    // the Get's lineage opens ONLY the requested keys' bucket dirs
    val wanted = someLive.map(bucketOf).toSet
    val files = got.inputFiles
    assert(files.nonEmpty)
    for (f <- files)
      assert(wanted.exists(b => f.contains(s"/$b/")),
        s"get read a bucket outside the keys': $f")
    // a tombstoned rowkey returns no row
    val dead = stateMap(IncrementalIndex.compactAll(changelog)
      .filter(col("op") === "delete").select("rowkey", "event_id", "payload"))
      .keySet.headOption
    for (d <- dead)
      assert(IncrementalIndex.get(spark, root, Seq(d)).count() === 0L)
    // absent keys: empty, schema intact
    val none = IncrementalIndex.get(spark, root, Seq("no-such-key"))
    assert(none.count() === 0L)
    assert(none.columns.contains("rowkey"))
  }

  test("a mismatched numBuckets is rejected instead of silently duplicating state") {
    val ev = changelog
    val base = Files.createTempDirectory("graft_incN").toString + "/state"
    IncrementalIndex.mergeBatch(spark, ev.filter(col("event_id") < 500), base, numBuckets = 4)
    val e = intercept[java.io.IOException] {
      IncrementalIndex.mergeBatch(spark, ev.filter(col("event_id") >= 500), base) // default 16
    }
    assert(e.getMessage.contains("numBuckets=4"))
    // a pre-marker (legacy) root is cross-checked against its bucket dirs:
    // b=<i> outside the presented count proves the count wrong
    val fs = new org.apache.hadoop.fs.Path(base)
      .getFileSystem(spark.sessionState.newHadoopConf())
    fs.delete(new org.apache.hadoop.fs.Path(base + "/_nbuckets"), false)
    val e2 = intercept[java.io.IOException] {
      IncrementalIndex.mergeBatch(spark, ev.filter(col("event_id") >= 500), base, numBuckets = 2)
    }
    assert(e2.getMessage.contains("outside numBuckets=2"))
    // re-adopting with the true count works
    StateStore.ensureBucketCount(spark, base, 4)
    // the matching count still works
    IncrementalIndex.mergeBatch(spark, ev.filter(col("event_id") >= 500), base, numBuckets = 4)
    assert(stateMap(IncrementalIndex.readState(spark, base)) ===
      stateMap(IncrementalIndex.compact(ev)))
  }

  test("tombstone GC drops only expired deletes; live rows and newer tombstones survive") {
    val ev = changelog
    val base = Files.createTempDirectory("graft_incG").toString + "/state"
    IncrementalIndex.mergeBatch(spark, ev, base)
    val liveBefore = stateMap(IncrementalIndex.readState(spark, base))
    def tombstones(): Seq[(String, Long)] = {
      val dirs = bucketDirs(base).map(d => s"$base/$d")
      spark.read.parquet(dirs: _*).filter(col("op") === "delete")
        .select("rowkey", "event_id").collect()
        .map(r => (r.getString(0), r.getLong(1))).toSeq
    }
    val ts = tombstones()
    assert(ts.nonEmpty, "fixture changelog must produce tombstones")
    val horizon = ts.map(_._2).min + 1 // expire exactly the oldest tombstone
    IncrementalIndex.gcTombstones(spark, base, horizon)
    assert(tombstones().toSet === ts.filter(_._2 >= horizon).toSet)
    assert(stateMap(IncrementalIndex.readState(spark, base)) === liveBefore)
    // gc past everything removes all tombstones, live view still unchanged
    IncrementalIndex.gcTombstones(spark, base, Long.MaxValue)
    assert(tombstones().isEmpty)
    assert(stateMap(IncrementalIndex.readState(spark, base)) === liveBefore)
    // documented contract: a put BELOW a GC'd tombstone CAN now resurrect —
    // which is why the horizon must trail the source's replay horizon
    val dead = ts.map(_._1).head
    IncrementalIndex.mergeBatch(spark,
      ev.filter(col("rowkey") === dead && col("op") =!= "delete").limit(1), base)
    assert(stateMap(IncrementalIndex.readState(spark, base)).contains(dead))
  }

  test("replaying the same micro-batch is a no-op (prefix-atomic commit safety)") {
    val ev = changelog
    val base = Files.createTempDirectory("graft_incP").toString + "/state"
    IncrementalIndex.mergeBatch(spark, ev.filter(col("event_id") < 500), base)
    val chunk2 = ev.filter(col("event_id") >= 500)
    IncrementalIndex.mergeBatch(spark, chunk2, base)
    val once = stateMap(IncrementalIndex.readState(spark, base))
    IncrementalIndex.mergeBatch(spark, chunk2, base) // checkpoint replay
    assert(stateMap(IncrementalIndex.readState(spark, base)) === once)
  }

  test("an empty micro-batch leaves the state unchanged") {
    val ev = changelog
    val base = Files.createTempDirectory("graft_incE").toString + "/state"
    IncrementalIndex.mergeBatch(spark, ev.filter(col("event_id") < 500), base)
    val before = stateMap(IncrementalIndex.readState(spark, base))
    IncrementalIndex.mergeBatch(spark, ev.filter(lit(false)), base)
    assert(stateMap(IncrementalIndex.readState(spark, base)) === before)
    assert(before.nonEmpty)
  }

  test("merge order of a chunk's internal rows doesn't matter") {
    val ev = changelog
    val statePathA = Files.createTempDirectory("graft_incA").toString + "/state"
    // single merge of everything, pre-shuffled
    IncrementalIndex.mergeBatch(spark, ev.orderBy(md5(col("rowkey"))), statePathA)
    assert(stateMap(IncrementalIndex.readState(spark, statePathA)) ===
      stateMap(IncrementalIndex.compact(ev)))
  }

  test("versionStamp distinguishes two same-mtime, same-size commits via the _seq counter") {
    // The seqlock stamp's residual risk was mtime GRANULARITY: two
    // same-name re-swaps landing in one filesystem tick with unchanged
    // entry sizes alias under (mtime, length) alone, and the one-epoch
    // read would wrongly certify a torn read. This CONSTRUCTS that alias
    // — two commits with byte-identical, identically-named content, all
    // entry mtimes then pinned to one instant — and proves the folded
    // `_seq` commit counter still tells them apart (round-16 verdict #5).
    val root = Files.createTempDirectory("graft_seq").toString + "/state"
    val conf = spark.sessionState.newHadoopConf()
    val fs = new org.apache.hadoop.fs.Path(root).getFileSystem(conf)
    def commitOnce(): Unit =
      StateStore.commitBuckets(spark, root, Seq("b=0")) { tmp =>
        val f = new org.apache.hadoop.fs.Path(s"$tmp/b=0/part-00000")
        val out = fs.create(f, true)
        try out.write("fixed content".getBytes("UTF-8")) finally out.close()
      }
    def pinMtimes(): Unit = {
      val t = 1700000000000L
      def touch(p: org.apache.hadoop.fs.Path): Unit = {
        if (fs.getFileStatus(p).isDirectory)
          fs.listStatus(p).foreach(c => touch(c.getPath))
        fs.setTimes(p, t, t)
      }
      touch(new org.apache.hadoop.fs.Path(root))
    }
    commitOnce(); pinMtimes()
    val s1 = StateStore.versionStamp(spark, root)
    commitOnce(); pinMtimes()
    val s2 = StateStore.versionStamp(spark, root)
    // the construction is a TRUE alias for the metadata-only stamp: every
    // (name, mtime, length) entry identical across the two commits
    // ("1" and "2" are both one byte)
    val meta1 = s1.view.filterKeys(!_.endsWith("#value")).toMap
    val meta2 = s2.view.filterKeys(!_.endsWith("#value")).toMap
    assert(meta1 === meta2,
      s"expected a metadata alias, got diff ${meta1.toSet.diff(meta2.toSet)}")
    // ...and the folded counter value still distinguishes them
    assert(s1 !== s2, "the _seq value must break the alias")
    assert(s1("_seq#value")._1 + 1L === s2("_seq#value")._1,
      s"counter must advance by one: ${s1.get("_seq#value")} -> ${s2.get("_seq#value")}")
  }
}
