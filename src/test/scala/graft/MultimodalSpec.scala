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

  test("empty media payloads produce no frames and a zero-byte meta row") {
    val media = Seq(MediaRow(1L, Array.emptyByteArray),
      MediaRow(2L, "hello world".getBytes("UTF-8"))).toDS()
    val frames = Multimodal.sampleFrames(media).collect()
    assert(frames.forall(_.doc_id == 2L), "empty payload must yield no frames")
    assert(frames.nonEmpty)
    val meta = Multimodal.decodeMeta(media).collect().map(m => m.doc_id -> m).toMap
    assert(meta(1L).n_bytes === 0L)
    assert(meta(2L).n_bytes === 11L)
  }

  test("a non-positive stride is rejected") {
    val media = Seq(MediaRow(1L, "x".getBytes)).toDS()
    assertThrows[IllegalArgumentException] {
      Multimodal.sampleFrames(media, everyK = 0)
    }
  }

  test("sampled frame indices agree with the decoded frame count") {
    val media = Seq(MediaRow(7L, ("a" * 100).getBytes("UTF-8"))).toDS()
    val n = Multimodal.decodeMeta(media).collect().head.n_frames
    val idxs = Multimodal.sampleFrames(media, everyK = 1).collect().map(_.frame_idx)
    assert(idxs.toSeq === (0L until n.toLong))
    assert(idxs.forall(i => i < n))
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
}
