package graft.queries

import org.apache.spark.sql.functions._
import graft.engine.Tables.t
import graft.ingest.OdsBuilder
import graft.multimodal.Multimodal
import graft.sources.CsvTables

/** Remaining §2 coverage: the CSV hop (S5/S6), JSON serialization +
  * run-date formatting + key interpolation (F7/F5/F9), and the multimodal
  * binary-column plumbing.
  */
object MiscQueries {

  /** Temp sink for the format round trips. Session-scoped path
    * (concurrent sessions must not race on one shared dir — overwrite
    * mode would delete a sibling run's files mid-read); the write runs
    * ONCE per (session, path) — re-planning the query (e.g. the
    * PlanSpec registry sweep) must not re-execute the write side
    * effect — and the directory is removed at JVM exit, so repeated
    * applications don't accumulate corpus-sized copies under tmpdir.
    */
  private val sinkOnce = new graft.engine.SessionKeyedCache[Unit]

  private def tempSink(s: org.apache.spark.sql.SparkSession, tag: String)(
      write: String => Unit): String = {
    val path = s"${System.getProperty("java.io.tmpdir")}/" +
      s"graft_${tag}_${s.sparkContext.applicationId}"
    sinkOnce.getOrElseUpdate(s, path) {
      write(path)
      Runtime.getRuntime.addShutdownHook(
        new Thread(() => deleteRecursively(new java.io.File(path))))
    }
    path
  }

  private def deleteRecursively(f: java.io.File): Unit = {
    val kids = f.listFiles()
    if (kids != null) kids.foreach(deleteRecursively)
    f.delete(); ()
  }

  /** S5+S6: ODS rows → `;`-delimited CSV with header → read back with the
    * declared schema. The oracle checks the round trip is lossless by
    * recomputing the same ODS straight from the raw JSON: any
    * quoting/typing loss in the CSV hop would break the hash.
    */
  val qCsvRoundtrip = QueryDef(
    "q_csv_roundtrip",
    (s, _) => {
      val path = tempSink(s, "csv_roundtrip")(p =>
        CsvTables.writeOdsCsv(OdsBuilder.ingest(s), p))
      CsvTables.readOdsCsv(s, path)
        .orderBy(col("source_date"), col("country"), col("song_rank"))
    },
    // same oracle as lastfm_ingest — the CSV hop must be invisible
    IngestQueries.ingestQuery.oracle,
    bench = false)

  /** S2 (line-JSON variant): ODS rows → newline-delimited JSON → read
    * back with the declared schema. The reference lands raw JSON as one
    * pretty-printed document per (country, date)
    * (`raw_from_api_to_s3.py:47-54`) — human-auditable but unsplittable
    * (README "Known limitations"); JSONL is the shape the same landing
    * zone takes at scale: splittable, schema-stable, append-friendly.
    * Same losslessness contract and oracle as the CSV hop.
    */
  val qJsonlRoundtrip = QueryDef(
    "q_jsonl_roundtrip",
    (s, _) => {
      val path = tempSink(s, "jsonl_roundtrip")(p =>
        OdsBuilder.ingest(s)
          .select(CsvTables.odsCsvSchema.fieldNames.toIndexedSeq.map(col): _*)
          .write.mode("overwrite").json(p))
      s.read.schema(CsvTables.odsCsvSchema).json(path)
        .orderBy(col("source_date"), col("country"), col("song_rank"))
    },
    IngestQueries.ingestQuery.oracle,
    bench = false)

  /** F7+F5+F9: reconstruct the reference's S3 key
    * (`top_100/raw/{date}/{country}_{date}.json`,
    * `raw_from_api_to_s3.py:47`) and a JSON payload per chart row.
    * Spark `to_json` and DuckDB `to_json` emit the identical compact
    * encoding (verified), so the serialization itself is hash-checked.
    */
  val qToJson = QueryDef(
    "q_to_json",
    (s, _) => OdsBuilder.ingest(s)
      .select(
        concat(lit("top_100/raw/"), date_format(col("source_date"), "yyyy-MM-dd"),
          lit("/"), col("country"), lit("_"),
          date_format(col("source_date"), "yyyy-MM-dd"), lit(".json")).as("s3_key"),
        col("song_rank"),
        to_json(struct(col("song_name"), col("artist_name"),
          col("duration_sec"))).as("payload"))
      .orderBy(col("s3_key"), col("song_rank")),
    Some(IngestQueries.odsCteSql + """
      SELECT 'top_100/raw/' || strftime(source_date, '%Y-%m-%d') || '/' ||
             country || '_' || strftime(source_date, '%Y-%m-%d') || '.json' AS s3_key,
             song_rank,
             CAST(to_json(struct_pack(song_name := song_name,
               artist_name := artist_name,
               duration_sec := duration_sec)) AS VARCHAR) AS payload
      FROM ods ORDER BY s3_key, song_rank"""),
    bench = false)

  /** Multimodal with REAL media (round 11): per-document synthesized
    * PNG bytes decoded back executor-side by the JDK's ImageIO — the
    * emitted width/height/n_pixels are HEADER-TRUE values read from the
    * actual payload, full-raster-verified, with corrupt payloads routed
    * to a quarantine rather than failing the partition
    * ([[Multimodal.decodePng]]). The oracle mirrors the deterministic
    * synthesis geometry in SQL, so a green diff proves the decoder read
    * exactly what the encoder wrote through a genuine PNG byte stream.
    */
  val qMultimodalMeta = QueryDef(
    "q_multimodal_meta",
    (s, dir) => Multimodal.documentsPngMeta(t(s, dir, "documents"))
      .orderBy(col("doc_id")),
    Some(s"""
      SELECT doc_id, 'image/png' AS mime,
             CAST(octet_length(encode(text)) % ${Multimodal.WidthMod} + 1
                  AS INTEGER) AS width,
             CAST((octet_length(encode(text)) * 7) % ${Multimodal.HeightMod} + 1
                  AS INTEGER) AS height,
             CAST((octet_length(encode(text)) % ${Multimodal.WidthMod} + 1) *
                  ((octet_length(encode(text)) * 7) % ${Multimodal.HeightMod} + 1)
                  AS BIGINT) AS n_pixels
      FROM documents ORDER BY doc_id"""))

  /** The raster-level strengthening of q_multimodal_meta: a full-pixel
    * checksum of every DECODED image against the synthesis formula
    * computed independently in SQL — bit-parity of 24-bit RGB values
    * through a genuine PNG encode/decode cycle, per pixel, per
    * document. (The SQL side double-unnests (x, y) ranges — fine for
    * an oracle; the engine side reads the decoded raster in a tight
    * per-partition loop, no shuffle, no explode.)
    */
  val qMultimodalPixels = QueryDef(
    "q_multimodal_pixels",
    (s, dir) => {
      import s.implicits._
      // deterministic 1-in-4 subsample, mirrored in the oracle — the
      // per-document raster round trip is what this verifies, and the
      // full corpus made it the suite's second-heaviest bench entry
      // (q_multimodal_meta stays full-corpus as the breadth probe)
      Multimodal.decodePixelSums(
        Multimodal.derivePng(
          t(s, dir, "documents").filter(col("doc_id") % 4 === 0)))
        .toDF().orderBy(col("doc_id"))
    },
    Some(s"""
      WITH d AS (
        SELECT doc_id, octet_length(encode(text)) AS o FROM documents
        WHERE doc_id % 4 = 0),
      g AS (SELECT doc_id, o % ${Multimodal.WidthMod} + 1 AS w,
                   (o * 7) % ${Multimodal.HeightMod} + 1 AS h
            FROM d),
      px AS (SELECT doc_id, w, h, unnest(range(0, w)) AS x FROM g),
      pxy AS (SELECT doc_id, w, h, x, unnest(range(0, h)) AS y FROM px)
      SELECT doc_id, CAST(w * h AS BIGINT) AS n_pixels,
             CAST(SUM(((doc_id % 1048573) * 2654435761 + x * 31 + y)
                      & 16777215)
                  AS BIGINT) AS pixel_sum
      FROM pxy GROUP BY doc_id, w, h
      ORDER BY doc_id"""))

  /** The audio twin of the PNG pair (round 11): genuine 16-bit PCM WAV
    * payloads synthesized and containerized by the JDK's AudioSystem,
    * decoded back executor-side — sample rate / bit depth / channel
    * count are HEADER-TRUE values parsed from the container, and the
    * exact integer sum of every decoded PCM sample is mirrored in SQL
    * from the synthesis formula. Image, audio: real bytes through real
    * codecs; video joined them in round 14 ([[qVideoFrames]]).
    */
  val qMultimodalAudio = QueryDef(
    "q_multimodal_audio",
    (s, dir) => {
      import s.implicits._
      // same 1-in-4 depth-probe subsample as the pixel/frame twins
      Multimodal.decodeWav(Multimodal.deriveWav(
        t(s, dir, "documents").filter(col("doc_id") % 4 === 0)))
        .toDF().orderBy(col("doc_id"))
    },
    Some(s"""
      WITH d AS (
        SELECT doc_id, octet_length(encode(text)) AS o FROM documents
        WHERE doc_id % 4 = 0),
      g AS (SELECT doc_id,
                   o % ${Multimodal.SamplesMod} + ${Multimodal.SamplesMin}
                     AS n
            FROM d),
      smp AS (SELECT doc_id, n, unnest(range(0, n)) AS i FROM g)
      SELECT doc_id, CAST(8000 AS INTEGER) AS sample_rate,
             CAST(16 AS INTEGER) AS bits, CAST(1 AS INTEGER) AS channels,
             CAST(n AS BIGINT) AS n_samples,
             CAST(SUM(((doc_id % 1048573) * 31 + i * 7) % 65536 - 32768)
                  AS BIGINT) AS sample_sum
      FROM smp GROUP BY doc_id, n
      ORDER BY doc_id"""))

  /** REAL multi-frame decode + frame sampling (round 13, retiring the
    * last multimodal stub): every document becomes a genuine ANIMATED
    * GIF (`nFrames` frames of indexed-gray raster, JDK GIF writer's
    * sequence API), and every ${Multimodal.FrameStride}-th frame is
    * decoded back executor-side — frame count header-true from
    * `getNumImages`, per-frame dimensions and exact raster checksums
    * from the decoded pixels. The oracle mirrors every pixel of every
    * sampled frame from the synthesis formula by range-unnesting, so a
    * green diff pins the whole multi-frame encode→container→decode
    * round trip, not just the fan-out cardinality.
    *
    * Runs on a DETERMINISTIC 1-in-4 document subsample (`doc_id % 4`,
    * mirrored in the oracle, so the check stays pixel-exact at every
    * SF): the probe verifies the codec round trip per document, and
    * round-13 bench showed full-corpus synthesis was 5% of the suite
    * in this one query — per-doc coverage at a quarter of the codec
    * work loses nothing the oracle measures (round-13 verdict item 6).
    */
  val qMultimodalFrames = QueryDef(
    "q_multimodal_frames",
    (s, dir) => {
      Multimodal.decodeGifFrames(
        Multimodal.deriveGif(
          t(s, dir, "documents").filter(col("doc_id") % 4 === 0)))
        .toDF().orderBy(col("doc_id"), col("frame_idx"))
    },
    Some(s"""
      WITH d AS (
        SELECT doc_id, octet_length(encode(text)) AS o FROM documents
        WHERE doc_id % 4 = 0),
      g AS (SELECT doc_id,
                   o % ${Multimodal.GifWidthMod} + 1 AS w,
                   (o * 7) % ${Multimodal.GifHeightMod} + 1 AS h,
                   o % ${Multimodal.FramesMod} + 1 AS nf
            FROM d),
      fr AS (SELECT doc_id, w, h,
                    unnest(range(0, nf, ${Multimodal.FrameStride}))
                      AS frame_idx FROM g),
      px AS (SELECT doc_id, w, h, frame_idx,
                    unnest(range(0, w)) AS x FROM fr),
      pxy AS (SELECT doc_id, w, h, frame_idx, x,
                     unnest(range(0, h)) AS y FROM px)
      SELECT doc_id, frame_idx,
             CAST(w AS INTEGER) AS width, CAST(h AS INTEGER) AS height,
             CAST(SUM(((doc_id % 1048573) * 31 + frame_idx * 131
                       + x * 31 + y * 7) % 256) AS BIGINT) AS pixel_sum
      FROM pxy GROUP BY doc_id, frame_idx, w, h
      ORDER BY doc_id, frame_idx"""))

  /** Columnar-format breadth beyond parquet: the same ODS rows pushed
    * through an ORC write/read cycle (Spark's second built-in columnar
    * format — predicate pushdown, column pruning, and splittable stripes
    * all hold, so a user with an ORC-based lake gets the same engine).
    * Same oracle as lastfm_ingest: the format hop must be lossless.
    */
  val qOrcRoundtrip = QueryDef(
    "q_orc_roundtrip",
    (s, _) => {
      val ods = OdsBuilder.ingest(s)
      val path = tempSink(s, "orc_roundtrip")(p =>
        ods.write.mode("overwrite").orc(p))
      s.read.schema(ods.schema).orc(path)
        .orderBy(col("source_date"), col("country"), col("song_rank"))
    },
    IngestQueries.ingestQuery.oracle,
    bench = false)

  /** S2 (raw-text variant), completing the source matrix (parquet /
    * CSV / JSON / JSONL / ORC / text): documents → one tab-framed line
    * each via the text sink → read back with the line reader and
    * re-parsed. The identity oracle reads the same rows from parquet:
    * any framing or encoding loss breaks the md5. Lossless here because
    * the corpus text is newline/tab-free (checked by the parse filter —
    * a frame that split would drop its row and fail the row count);
    * binary-unsafe payloads belong in parquet/ORC, which is the point
    * this query documents.
    *
    * Scale: the text source is splittable by line, so reader
    * parallelism follows HDFS splits; the md5 witness keeps the oracle
    * diff payload-free (same trick as q_pii_redact).
    */
  val qTextRoundtrip = QueryDef(
    "q_text_roundtrip",
    (s, dir) => {
      // unlike the fixture-driven ODS round trips, the payload here is
      // dir-dependent — the sink key (and path) must carry the corpus
      val path = tempSink(s,
        s"text_roundtrip_${Integer.toHexString(dir.hashCode)}")(p =>
        t(s, dir, "documents")
          .select(concat_ws("\t", col("doc_id").cast("string"), col("text"))
            .as("value"))
          .write.mode("overwrite").text(p))
      s.read.text(path)
        .select(split(col("value"), "\t", 2).as("parts"))
        .filter(size(col("parts")) === 2)
        .select(col("parts").getItem(0).cast("bigint").as("doc_id"),
          md5(col("parts").getItem(1)).as("text_md5"))
        .orderBy(col("doc_id"))
    },
    Some("""
      SELECT doc_id, md5(text) AS text_md5
      FROM documents ORDER BY doc_id"""),
    bench = false)

  /** REAL video (round 14, retiring the last multimodal limitation):
    * every sampled document becomes a structurally complete AVI — RIFF
    * container, avih/strh/strf headers, movi `00db` chunks, idx1 —
    * carrying uncompressed 24-bit DIB frames, and the decode side is a
    * genuine hand-rolled RIFF DEMUX (header-true geometry and frame
    * counts cross-validated against the chunks actually present) plus a
    * bottom-up padded-BGR raster decode. Uncompressed DIB is the one
    * video codec that is bit-deterministic without external libraries,
    * so the oracle mirrors every pixel of every sampled frame — the
    * pixel-exact contract of the PNG/WAV/GIF family extended to a real
    * video container. Same 1-in-4 depth-probe subsample.
    */
  val qVideoFrames = QueryDef(
    "q_video_frames",
    (s, dir) => {
      Multimodal.decodeAviFrames(
        Multimodal.deriveAvi(
          t(s, dir, "documents").filter(col("doc_id") % 4 === 0)))
        .toDF().orderBy(col("doc_id"), col("frame_idx"))
    },
    Some(s"""
      WITH d AS (
        SELECT doc_id, octet_length(encode(text)) AS o FROM documents
        WHERE doc_id % 4 = 0),
      g AS (SELECT doc_id,
                   o % ${Multimodal.AviWidthMod} + 1 AS w,
                   (o * 11) % ${Multimodal.AviHeightMod} + 1 AS h,
                   (o * 3) % ${Multimodal.AviFramesMod} + 1 AS nf
            FROM d),
      fr AS (SELECT doc_id, w, h,
                    unnest(range(0, nf, ${Multimodal.AviFrameStride}))
                      AS frame_idx FROM g),
      px AS (SELECT doc_id, w, h, frame_idx,
                    unnest(range(0, w)) AS x FROM fr),
      pxy AS (SELECT doc_id, w, h, frame_idx, x,
                     unnest(range(0, h)) AS y FROM px)
      SELECT doc_id, frame_idx,
             CAST(w AS INTEGER) AS width, CAST(h AS INTEGER) AS height,
             CAST(SUM(((doc_id % 1048573) * 37 + frame_idx * 151
                       + x * 29 + y * 11) % 256) AS BIGINT) AS pixel_sum
      FROM pxy GROUP BY doc_id, frame_idx, w, h
      ORDER BY doc_id, frame_idx"""))

  val all: Seq[QueryDef] = Seq(qCsvRoundtrip, qJsonlRoundtrip, qToJson,
    qMultimodalMeta, qMultimodalPixels, qMultimodalAudio, qMultimodalFrames,
    qVideoFrames, qOrcRoundtrip, qTextRoundtrip)
}
