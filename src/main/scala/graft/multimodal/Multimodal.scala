package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media as opaque `binary` columns with
  * typed metadata, decoded per-partition (SURVEY §7.6; builder-brief
  * multimodal mandate).
  *
  * The container has no image/audio codecs, so [[decodeMeta]]'s byte →
  * (width, height, frames) step is a clearly-marked DETERMINISTIC STUB —
  * the Spark-side plumbing around it is real: binary column derivation,
  * a typed `Dataset[MediaRow]`, partition-granular batch decode via
  * `mapPartitions` (the shape a vectorized decoder needs: amortize codec
  * init per partition, stream rows within it), and a schema contract the
  * DuckDB oracle can mirror because the stub is a pure function of the
  * byte length.
  */
object Multimodal {

  final case class MediaRow(doc_id: Long, media: Array[Byte])
  final case class MediaMeta(doc_id: Long, mime: String, n_bytes: Long,
      width: Int, height: Int, n_frames: Int)

  /** Stub geometry constants — ONE definition for both decode and frame
    * sampling, interpolated into the oracle SQL strings so the invariant
    * is structural.
    */
  val FramesMod = 30
  val FrameStride = 5
  private[graft] def nFrames(nBytes: Long): Long = (nBytes % FramesMod) + 1

  /** Stand-in payload: the document text's UTF-8 bytes as the opaque
    * media blob (real pipelines carry jpeg/wav/mp4 bytes here).
    */
  def deriveMedia(documents: DataFrame): DataFrame =
    documents.select(col("doc_id"),
      encode(col("text"), "utf-8").cast("binary").as("media"))

  /** STUB decode — stands where an image/audio decoder would run.
    * Deterministic pure function of the payload so tests and the SQL
    * oracle can verify the plumbing end-to-end. Partition-granular: one
    * "codec init" per partition, rows streamed through it.
    */
  def decodeMeta(media: Dataset[MediaRow]): Dataset[MediaMeta] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // real code would initialize the decoder ONCE here per partition
      rows.map { r =>
        val n = r.media.length.toLong
        MediaMeta(r.doc_id, "image/fake", n,
          width = (n % 640).toInt + 1,
          height = ((n * 7) % 480).toInt + 1,
          n_frames = nFrames(n).toInt)
      }
    }
  }

  /** documents → typed media metadata (the registered query's body). */
  def documentsMeta(documents: DataFrame): DataFrame = {
    import documents.sparkSession.implicits._
    decodeMeta(deriveMedia(documents).as[MediaRow]).toDF()
  }

  final case class FrameRef(doc_id: Long, frame_idx: Long, frame_off: Long,
      frame_len: Long)

  /** Frame sampling: every `everyK`-th frame of each media payload,
    * emitted as (offset, length) references into the blob — the shape a
    * video pipeline fans out to per-frame feature extraction. The frame
    * geometry is the same DETERMINISTIC STUB family as [[decodeMeta]]
    * (offset = idx*7 mod size), so the plumbing — per-partition batch
    * iteration, one-to-many flatMap, typed output — is fully
    * oracle-checkable.
    */
  def sampleFrames(media: Dataset[MediaRow],
      everyK: Int = FrameStride): Dataset[FrameRef] = {
    require(everyK > 0, s"frame stride must be positive, got $everyK")
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // real code would open the container/codec once per partition
      rows.flatMap { r =>
        val n = r.media.length.toLong
        if (n == 0) Iterator.empty // empty payload: nothing to sample
        else (0L until nFrames(n) by everyK.toLong).iterator.map { i =>
          val off = (i * 7) % n
          FrameRef(r.doc_id, i, off, math.min(16L, n - off))
        }
      }
    }
  }
}
