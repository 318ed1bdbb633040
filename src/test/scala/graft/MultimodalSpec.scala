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
}
