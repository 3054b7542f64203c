package graft

import org.apache.spark.sql.functions._

import graft.engine.Tables
import graft.operators.Multimodal

/** The multimodal tier must run a REAL codec (javax.imageio PNG), not
  * spec arithmetic: decoded metadata equals the analytic fixture spec on
  * well-formed payloads, arbitrary hand-built PNGs decode to their true
  * pixel statistics, and corrupt payloads quarantine per row instead of
  * failing the task. */
class MultimodalSpec extends SparkSpec {

  test("decoded PNG metadata equals the analytic fixture spec; corrupt rows quarantined") {
    val docs = Tables.documents(spark, sf)
    val out = Multimodal.decodeImages(spark,
      Multimodal.pngMediaFromDocuments(spark, docs)).collect()
    assert(out.nonEmpty)
    val corrupt = out.filter(_.status == "corrupt")
    assert(corrupt.nonEmpty, "fixture must exercise the quarantine path")
    corrupt.foreach { d =>
      assert(Multimodal.isCorrupt(d.media_id))
      assert(d.width.isEmpty && d.height.isEmpty &&
        d.mean_r.isEmpty && d.mean_g.isEmpty && d.mean_b.isEmpty)
    }
    out.filter(_.status == "ok").foreach { d =>
      val (w, h, tr, tg, tb, br, bg, bb) = Multimodal.specOf(d.media_id)
      assert(d.width.contains(w) && d.height.contains(h))
      val n = (w * h).toDouble
      // PNG is lossless: decoded sums are the exact closed forms.
      assert(d.mean_r.contains((w * tr + w * (h - 1) * br) / n))
      assert(d.mean_g.contains((w * tg + w * (h - 1) * bg) / n))
      assert(d.mean_b.contains((w * tb + w * (h - 1) * bb) / n))
      assert(d.n_bytes > 8, "ok rows carry full PNG payloads")
    }
  }

  test("the decoder is a real codec: arbitrary PNG bytes yield true pixel stats") {
    import spark.implicits._
    // An image the fixture spec can never produce (per-pixel colors):
    // if decode were arithmetic over ids, these numbers would be wrong.
    val img = new java.awt.image.BufferedImage(
      3, 2, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val px = Seq(
      (0, 0, 0xff0000), (1, 0, 0x00ff00), (2, 0, 0x0000ff),
      (0, 1, 0x102030), (1, 1, 0x405060), (2, 1, 0x708090))
    px.foreach { case (x, y, rgb) => img.setRGB(x, y, rgb) }
    val bytes = {
      val out = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", out)
      out.toByteArray
    }
    val media = Seq(
      Multimodal.MediaRow(1L, bytes, "image/png"),
      Multimodal.MediaRow(2L, Array[Byte](1, 2, 3), "image/png")).toDS()
    val got = Multimodal.decodeImages(spark, media)
      .collect().map(d => d.media_id -> d).toMap
    val ok = got(1L)
    assert(ok.status == "ok" && ok.width.contains(3) && ok.height.contains(2))
    assert(ok.mean_r.contains((0xff + 0x10 + 0x40 + 0x70) / 6.0))
    assert(ok.mean_g.contains((0xff + 0x20 + 0x50 + 0x80) / 6.0))
    assert(ok.mean_b.contains((0xff + 0x30 + 0x60 + 0x90) / 6.0))
    assert(got(2L).status == "corrupt", "garbage bytes must quarantine, not throw")
  }

  test("audio decode: real WAV parse matches the fixture spec; corrupt rows quarantined") {
    import spark.implicits._
    val docs = Seq(41L, 42L, 43L).toDF("doc_id") // 41 is the corrupt slot
    val got = Multimodal.decodeAudio(spark,
        Multimodal.wavMediaFromDocuments(spark, docs))
      .collect().map(d => d.media_id -> d).toMap
    assert(got(41L).status == "corrupt" &&
      got(41L).sample_rate.isEmpty && got(41L).mean_abs.isEmpty)
    for (id <- Seq(42L, 43L)) {
      val (n, amp) = Multimodal.audioSpecOf(id)
      val d = got(id)
      assert(d.status == "ok" && d.sample_rate.contains(8000))
      assert(d.n_samples.contains(n.toLong))
      // Square wave: every sample is ±amp — mean |s| and peak are exact.
      assert(d.mean_abs.contains(amp.toDouble), s"id=$id got ${d.mean_abs}")
      assert(d.peak.contains(amp))
    }
  }

  test("video frame-sampling: real GIF parse matches the fixture spec; corrupt rows quarantined") {
    import spark.implicits._
    val docs = Seq(43L, 44L, 45L).toDF("doc_id") // 43 is the corrupt slot
    val got = Multimodal.sampleVideoFrames(spark,
        Multimodal.gifMediaFromDocuments(spark, docs))
      .collect().map(d => d.media_id -> d).toMap
    assert(got(43L).status == "corrupt" &&
      got(43L).n_frames.isEmpty && got(43L).mean_r.isEmpty)
    for (id <- Seq(44L, 45L)) {
      val (w, h, n) = Multimodal.videoSpecOf(id)
      val d = got(id)
      assert(d.status == "ok" && d.width.contains(w) && d.height.contains(h))
      assert(d.n_frames.contains(n))
      val sampledFrames = 0 until n by 3
      assert(d.n_sampled.contains(sampledFrames.size))
      // Lossless explicit-palette GIF: each sampled frame's pixel sum is
      // exactly color·w·h, so the mean reduces to sum(color)/count.
      def mean(ch: ((Int, Int, Int)) => Int): Double = {
        val s = sampledFrames.map(f => ch(Multimodal.frameColor(id, f))).sum
        (s.toLong * w * h).toDouble / (sampledFrames.size.toLong * w * h)
      }
      assert(d.mean_r.contains(mean(_._1)), s"id=$id got ${d.mean_r}")
      assert(d.mean_g.contains(mean(_._2)))
      assert(d.mean_b.contains(mean(_._3)))
    }
  }

  test("the video decoder is a real codec: hand-built GIF bytes yield true frame stats") {
    import spark.implicits._
    import java.awt.image.{BufferedImage, IndexColorModel}
    // 5 frames of per-frame colors the fixture spec can never produce;
    // stride 2 samples frames 0, 2, 4.
    val colors = Seq(0xff0000, 0x00ff00, 0x0000ff, 0x102030, 0x405060)
    val icm = new IndexColorModel(8, colors.size,
      colors.map(c => ((c >> 16) & 0xff).toByte).toArray,
      colors.map(c => ((c >> 8) & 0xff).toByte).toArray,
      colors.map(c => (c & 0xff).toByte).toArray)
    val wr = javax.imageio.ImageIO.getImageWritersBySuffix("gif").next()
    val bos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    wr.setOutput(ios)
    // Interlace off — the JDK writer's interlace passes drop rows at
    // h=3 (see the encoder comment in Multimodal.encodeGif).
    val param = wr.getDefaultWriteParam
    param.setProgressiveMode(javax.imageio.ImageWriteParam.MODE_DISABLED)
    wr.prepareWriteSequence(null)
    colors.indices.foreach { f =>
      val img = new BufferedImage(4, 3, BufferedImage.TYPE_BYTE_INDEXED, icm)
      (0 until 3).foreach(y => (0 until 4).foreach(x =>
        img.getRaster.setSample(x, y, 0, f)))
      wr.writeToSequence(new javax.imageio.IIOImage(img, null, null), param)
    }
    wr.endWriteSequence(); ios.close(); wr.dispose()
    val media = Seq(
      Multimodal.MediaRow(1L, bos.toByteArray, "video/gif"),
      Multimodal.MediaRow(2L, Array[Byte](0x47, 0x49, 0x46), "video/gif")).toDS()
    val got = Multimodal.sampleVideoFrames(spark, media, step = 2)
      .collect().map(d => d.media_id -> d).toMap
    val ok = got(1L)
    assert(ok.status == "ok" && ok.n_frames.contains(5) && ok.n_sampled.contains(3))
    assert(ok.width.contains(4) && ok.height.contains(3))
    assert(ok.mean_r.contains((0xff + 0x00 + 0x40) / 3.0))
    assert(ok.mean_g.contains((0x00 + 0x00 + 0x50) / 3.0))
    assert(ok.mean_b.contains((0x00 + 0xff + 0x60) / 3.0))
    assert(got(2L).status == "corrupt", "garbage bytes must quarantine, not throw")
  }

  test("frame sampling decodes ONLY the sampled frames (measured, full-frame streams)") {
    import spark.implicits._
    // The decode counter reports every raster decode the ImageIO reader
    // ACTUALLY performs (IIOReadProgressListener.imageStarted — any
    // internal compositing read would count too), so equality with
    // sum(ceil(n/step)) over ok payloads MEASURES the sampled-only
    // claim for this fixture's sequential full-frame streams, instead
    // of assuming it. (Delta/disposal GIFs would legitimately exceed
    // it — scoped in the sampleVideoFrames scaladoc.)
    val ids = Seq(43L, 44L, 45L, 46L, 47L) // 43 is the corrupt slot
    val docs = ids.toDF("doc_id")
    val step = 3
    val acc = spark.sparkContext.longAccumulator("gif-frame-decodes")
    val out = Multimodal.sampleVideoFrames(spark,
      Multimodal.gifMediaFromDocuments(spark, docs), step, Some(acc))
      .collect()
    val expected = ids.filterNot(Multimodal.isCorruptVideo).map { id =>
      val n = Multimodal.videoSpecOf(id)._3
      (n + step - 1) / step
    }.sum
    assert(out.count(_.status == "ok") == 4)
    assert(acc.value == expected.toLong,
      s"reader performed ${acc.value} raster decodes, sampled-only is $expected")
    assert(expected < ids.filterNot(Multimodal.isCorruptVideo)
      .map(Multimodal.videoSpecOf(_)._3).sum,
      "fixture must make sampling actually skip frames")
  }

  test("materializedMedia caches byte-identical payloads and reuses the stored table") {
    import spark.implicits._
    val root = s"${graft.engine.Sinks.scratch}/multimodal-fixture-cache-spec"
    graft.streaming.IncrementalIngest.deleteDir(spark, root)
    val docs = Seq(41L, 44L, 45L).toDF("doc_id")
    var builds = 0
    def build(d: org.apache.spark.sql.DataFrame) = {
      builds += 1
      Multimodal.wavMediaFromDocuments(spark, d)
    }
    val first = Multimodal.materializedMedia(spark, docs, root, "wav", build)
      .collect().map(r => r.media_id -> r.content.toSeq).toMap
    val again = Multimodal.materializedMedia(spark, docs, root, "wav", build)
      .collect().map(r => r.media_id -> r.content.toSeq).toMap
    assert(builds == 1, "a warm cache must not re-encode")
    assert(first == again, "stored bytes must round-trip identically")
    val direct = Multimodal.wavMediaFromDocuments(spark, docs)
      .collect().map(r => r.media_id -> r.content.toSeq).toMap
    assert(first == direct, "cache must serve exactly the encoder's bytes")
    // A DIFFERENT id set (same count, different max) misses the cache.
    Multimodal.materializedMedia(spark,
      Seq(41L, 44L, 46L).toDF("doc_id"), root, "wav", build)
    assert(builds == 2, "a changed id fingerprint must rebuild, not serve stale bytes")
  }

  test("binaryFile ingest: per-item files round-trip to the in-memory media rows") {
    import spark.implicits._
    val dir = s"${graft.engine.Sinks.scratch}/multimodal-binary-spec"
    graft.streaming.IncrementalIngest.deleteDir(spark, dir)
    val docs = Seq(43L, 44L, 45L).toDF("doc_id") // incl. the corrupt slot
    val mem = Multimodal.gifMediaFromDocuments(spark, docs)
    Multimodal.writeMediaFiles(mem, dir, "gif")
    val viaFiles = Multimodal.readBinaryMedia(spark, dir, "gif", "video/gif")
      .collect().map(r => r.media_id -> r.content.toSeq).toMap
    val inMem = mem.collect().map(r => r.media_id -> r.content.toSeq).toMap
    assert(viaFiles == inMem, "file round-trip must be byte-identical")
    // And the decode downstream of the file route matches the spec.
    val decoded = Multimodal.sampleVideoFrames(spark,
        Multimodal.readBinaryMedia(spark, dir, "gif", "video/gif"))
      .collect().map(d => d.media_id -> d.status).toMap
    assert(decoded == Map(43L -> "corrupt", 44L -> "ok", 45L -> "ok"))
  }

  test("the audio decoder is a real codec: hand-built WAV bytes yield true sample stats") {
    import spark.implicits._
    import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}
    // 4 samples: 100, -200, 300, -400 → mean_abs 250, peak 400.
    val samples = Seq(100, -200, 300, -400)
    val pcm = samples.flatMap(s =>
      Seq((s & 0xff).toByte, ((s >> 8) & 0xff).toByte)).toArray
    val out = new java.io.ByteArrayOutputStream()
    AudioSystem.write(new AudioInputStream(
      new java.io.ByteArrayInputStream(pcm),
      new AudioFormat(8000f, 16, 1, true, false), 4L),
      AudioFileFormat.Type.WAVE, out)
    val media = Seq(Multimodal.MediaRow(7L, out.toByteArray, "audio/wav"))
      .toDS()
    val d = Multimodal.decodeAudio(spark, media).collect().head
    assert(d.status == "ok" && d.n_samples.contains(4L))
    assert(d.mean_abs.contains(250.0) && d.peak.contains(400))
  }

  test("audio near-dup: exactly the planted twins, through the REAL codec") {
    import spark.implicits._
    // ids 0..49: twins planted at id % 5 == 1 (1,6,...,46), EXCEPT the
    // corrupt id 41 (truncated payload -> quarantined before banding,
    // so its twin is never emitted and must not pair).
    val docs = (0L until 50L).map(id => (id, s"d$id")).toDF("doc_id", "text")
    val got = Multimodal.audioNearDup(spark, docs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(3)))
      .toSet
    graft.engine.Caches.release()
    val expected = (0L until 50L)
      .filter(id => id % 5 == 1 && id % 41 != 0)
      .map(id => (id, id + Multimodal.AudioTwinOffset, 8.0)).toSet
    assert(got == expected, s"got $got")
    // The twins are re-RENDERED, not byte-copied: their payloads differ,
    // so exact dedup could never find these pairs.
    val bytes = Multimodal.toneMedia(spark, docs).collect()
      .map(r => r.media_id -> r.content.toSeq).toMap
    assert(bytes(1L) != bytes(1L + Multimodal.AudioTwinOffset))
  }
}
