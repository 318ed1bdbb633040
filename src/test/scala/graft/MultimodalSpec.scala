package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.multimodal.Multimodal
import graft.multimodal.Multimodal.MediaRow

/** Multimodal plumbing edge cases: empty payloads, stride validation,
  * and geometry coherence between decode and frame sampling.
  */
class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("empty media payloads still carry a zero-byte meta row") {
    val media = Seq(MediaRow(1L, Array.emptyByteArray),
      MediaRow(2L, "hello world".getBytes("UTF-8"))).toDS()
    val meta = Multimodal.decodeMeta(media).collect().map(m => m.doc_id -> m).toMap
    assert(meta(1L).n_bytes === 0L)
    assert(meta(2L).n_bytes === 11L)
  }

  test("a non-positive frame stride is rejected") {
    val docs = Seq((1L, "x")).toDF("doc_id", "text")
    assertThrows[IllegalArgumentException] {
      Multimodal.decodeGifFrames(Multimodal.deriveGif(docs), everyK = 0)
    }
  }

  test("synthesized GIFs are real multi-frame GIFs: header-true frame " +
      "count, bit-exact rasters through the container") {
    val docs = Seq((7L, "a" * 100), (3L, ""), (11L, "b" * 37))
      .toDF("doc_id", "text")
    val media = Multimodal.deriveGif(docs).collect()
    // genuine GIF byte stream: signature on every payload
    media.foreach(m => assert(
      new String(m.media.take(6), "US-ASCII").startsWith("GIF8"),
      s"doc ${m.doc_id} payload is not a GIF"))
    // stride 1: EVERY frame decodes, count matches the geometry formula
    val frames = Multimodal.decodeGifFrames(
      Multimodal.deriveGif(docs), everyK = 1).collect()
    for ((id, text) <- Seq(7L -> ("a" * 100), 3L -> "", 11L -> ("b" * 37))) {
      val o = text.getBytes("UTF-8").length.toLong
      val fs = frames.filter(_.doc_id == id).sortBy(_.frame_idx)
      assert(fs.map(_.frame_idx).toSeq ===
        (0L until (o % Multimodal.FramesMod + 1)))
      // every frame's decoded raster checksum equals the synthesis
      // formula — the GIF round trip is pixel-exact
      fs.foreach { fr =>
        val w = fr.width; val h = fr.height
        var expect = 0L
        for (y <- 0 until h; x <- 0 until w)
          expect += (((id % 1048573L) * 31 + fr.frame_idx * 131 +
            x * 31 + y * 7) % 256)
        assert(fr.pixel_sum === expect,
          s"doc $id frame ${fr.frame_idx} raster checksum drifted")
      }
    }
    // default stride samples every FrameStride-th frame only
    val sampled = Multimodal.decodeGifFrames(
      Multimodal.deriveGif(docs)).collect()
      .filter(_.doc_id == 7L).map(_.frame_idx).sorted
    assert(sampled.toSeq ===
      (0L until (100L % Multimodal.FramesMod + 1)
        by Multimodal.FrameStride.toLong))
  }

  test("synthesized PNGs are real PNGs and decode to header-true geometry") {
    val docs = Seq((1L, "short"), (2L, "x" * 200), (3L, ""))
      .toDF("doc_id", "text")
    val media = Multimodal.derivePng(docs).collect()
    // genuine PNG byte stream: 8-byte signature on every payload
    val sig = Array(0x89, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A).map(_.toByte)
    media.foreach(m => assert(m.media.take(8).sameElements(sig),
      s"doc ${m.doc_id} payload is not a PNG"))
    val (ok, quarantine) = Multimodal.decodePng(Multimodal.derivePng(docs))
    assert(quarantine.count() === 0)
    val got = ok.collect().map(m => m.doc_id -> m).toMap
    for ((id, text) <- Seq(1L -> "short", 2L -> ("x" * 200), 3L -> "")) {
      val o = text.getBytes("UTF-8").length.toLong
      assert(got(id).width === Multimodal.pngWidth(o))
      assert(got(id).height === Multimodal.pngHeight(o))
      assert(got(id).n_pixels ===
        got(id).width.toLong * got(id).height)
      assert(got(id).mime === "image/png")
    }
  }

  test("synthesized WAVs are real WAVs: RIFF header, true format, exact samples") {
    val docs = Seq((3L, "abc"), (4L, "x" * 123)).toDF("doc_id", "text")
    val media = Multimodal.deriveWav(docs).collect()
    media.foreach { m =>
      assert(new String(m.media.take(4), "US-ASCII") === "RIFF")
      assert(new String(m.media.slice(8, 12), "US-ASCII") === "WAVE")
    }
    val got = Multimodal.decodeWav(Multimodal.deriveWav(docs))
      .collect().map(w => w.doc_id -> w).toMap
    for ((id, text) <- Seq(3L -> "abc", 4L -> ("x" * 123))) {
      val o = text.getBytes("UTF-8").length.toLong
      val n = Multimodal.wavSamples(o)
      assert(got(id).sample_rate === 8000)
      assert(got(id).bits === 16 && got(id).channels === 1)
      assert(got(id).n_samples === n.toLong)
      val expected = (0 until n).map(i =>
        ((id % 1048573L) * 31 + i.toLong * 7) % 65536L - 32768L).sum
      assert(got(id).sample_sum === expected)
    }
  }

  test("a corrupt payload quarantines with a reason; good rows decode on") {
    val docs = Seq((1L, "alpha"), (2L, "beta")).toDF("doc_id", "text")
    val good = Multimodal.derivePng(docs).collect()
    val corrupted = good.map { m =>
      if (m.doc_id == 2L)
        // truncate mid-stream: header parses, the raster read fails —
        // exactly the poison shape that must NOT kill the partition
        MediaRow(m.doc_id, m.media.take(m.media.length / 2))
      else m
    }
    val (ok, quarantine) = Multimodal.decodePng(corrupted.toSeq.toDS())
    assert(ok.collect().map(_.doc_id).toSeq === Seq(1L))
    val q = quarantine.collect()
    assert(q.map(_.doc_id).toSeq === Seq(2L))
    assert(q.head.reason.nonEmpty)
    // garbage bytes (not a PNG at all) quarantine too
    val (ok2, q2) = Multimodal.decodePng(
      Seq(MediaRow(9L, Array.fill[Byte](32)(0x42))).toDS())
    assert(ok2.count() === 0 && q2.collect().map(_.doc_id).toSeq === Seq(9L))
    // and the strict registered-query path refuses to silently drop
    val e = intercept[Exception] {
      graft.multimodal.Multimodal.decodePng(corrupted.toSeq.toDS()) match {
        case (okRows, qRows) =>
          require(qRows.take(1).isEmpty, s"quarantined: doc ${qRows.take(1).head.doc_id}")
          okRows.count()
      }
    }
    assert(e.getMessage.contains("quarantined"))
  }

  test("synthesized AVIs are structurally real RIFF containers: demux " +
      "geometry is header-true, frames decode pixel-exact, corruption " +
      "fails loudly") {
    val docs = Seq((3L, "abcdefgh"), (4L, "a much longer document body " +
      "to vary the geometry of the second container"))
      .toDF("doc_id", "text")
    val media = Multimodal.deriveAvi(docs).collect()
    media.foreach { r =>
      // RIFF framing invariants any AVI demuxer relies on
      assert(new String(r.media.take(4), "US-ASCII") === "RIFF")
      assert(new String(r.media.slice(8, 12), "US-ASCII") === "AVI ")
      val declared = (r.media(4) & 0xFF) | ((r.media(5) & 0xFF) << 8) |
        ((r.media(6) & 0xFF) << 16) | ((r.media(7) & 0xFF) << 24)
      assert(declared === r.media.length - 8)
      assert(new String(r.media, "ISO-8859-1").contains("idx1"))
    }
    // every frame (stride 1) matches the synthesis formula exactly
    val frames = Multimodal.decodeAviFrames(media.toSeq.toDS(), everyK = 1)
      .collect().map(f => (f.doc_id, f.frame_idx) -> f).toMap
    docs.as[(Long, String)].collect().foreach { case (id, text) =>
      val o = text.getBytes("UTF-8").length.toLong
      val (w, h, nf) = (Multimodal.aviWidth(o), Multimodal.aviHeight(o),
        Multimodal.aviFrames(o))
      (0 until nf).foreach { f =>
        val got = frames((id, f.toLong))
        assert(got.width === w && got.height === h)
        val want = (for { x <- 0 until w; y <- 0 until h }
          yield Multimodal.aviLum(id, f.toLong, x, y).toLong).sum
        assert(got.pixel_sum === want, s"doc $id frame $f")
      }
    }
    assert(frames.size === docs.as[(Long, String)].collect().map {
      case (_, t) => Multimodal.aviFrames(t.getBytes("UTF-8").length.toLong)
    }.sum)
    // a truncated container fails loudly (strict: own payloads)
    val broken = media.head.media.take(media.head.media.length - 10)
    val e = intercept[Exception](
      Multimodal.decodeAviFrames(
        Seq(MediaRow(99L, broken)).toDS(), everyK = 1).collect())
    assert(e.getMessage.contains("99"))
    // a frame-count header lie is caught (declared != present)
    val lied = media.head.media.clone()
    // strh length field sits at offset 12+8+4+8+56+12+8 + 32 = 140
    lied(140) = (lied(140) + 1).toByte
    val e2 = intercept[Exception](
      Multimodal.decodeAviFrames(
        Seq(MediaRow(98L, lied)).toDS(), everyK = 1).collect())
    assert(e2.getMessage.contains("declares"))
    // a chunk size near Int.MaxValue must hit the range require, not
    // overflow the Int bound check and index past the array (ADVICE
    // r14: p + 8 + size wraps negative; the walk compares in Long)
    val huge = media.head.media.clone()
    // first child chunk of the outer RIFF starts at offset 12; its
    // size field is at 16..19 — patch to 0x7FFFFFF0
    huge(16) = 0xF0.toByte; huge(17) = 0xFF.toByte
    huge(18) = 0xFF.toByte; huge(19) = 0x7F.toByte
    val e3 = intercept[Exception](
      Multimodal.decodeAviFrames(
        Seq(MediaRow(97L, huge)).toDS(), everyK = 1).collect())
    assert(e3.getMessage.contains("corrupt container"),
      s"expected the loud range require, got: ${e3.getMessage}")
  }
}
