package graft.queries

import org.apache.spark.sql.functions._
import graft.ingest.OdsBuilder
import graft.star.StarBuilder
import graft.marts.Marts

/** Raw-JSON ingest coverage (SURVEY §2.1 S1-S4, §2.2 P1-P4, §2.7 F6/F8)
  * over the authored fixture set at [[OdsBuilder.fixtureRoot]]
  * (reference-shaped per FIXTURES.md A1; layout
  * `dags/raw_from_api_to_s3.py:47-54`). The DuckDB oracle reads the very
  * same JSON files via `read_json(..., filename=true)`, so the whole
  * extract path — multiLine parse, array flatten, nested projection,
  * string→int casts, filename→(country, date) recovery, first-wins
  * dedup — is hash-checked end-to-end.
  *
  * These queries are fixture-driven and ignore `sfDir` (the landing dir
  * is a fixed path, like the reference's bucket prefix).
  */
object IngestQueries {

  private val fx = OdsBuilder.fixtureRoot

  /** Shared oracle prefix: raw JSON → deduped ODS (mirror of
    * [[OdsBuilder.toOds]]).
    */
  private[queries] val odsCteSql: String = s"""
    WITH raw AS (
      SELECT generate_subscripts(tracks.track, 1) AS pos,
             unnest(tracks.track) AS t,
             regexp_extract(filename, '([^/]+)_\\d{4}-\\d{2}-\\d{2}\\.json$$', 1) AS country,
             CAST(regexp_extract(filename, '_(\\d{4}-\\d{2}-\\d{2})\\.json$$', 1) AS DATE) AS source_date
      FROM read_json('$fx/*/*.json', filename=true)),
    proj AS (
      SELECT t.name AS song_name, t.artist.name AS artist_name,
             CAST(t.duration AS INTEGER) AS duration_sec,
             CAST(t.listeners AS INTEGER) AS listeners_count,
             CAST(t."@attr".rank AS INTEGER) AS song_rank,
             source_date, country, pos
      FROM raw),
    ods AS (
      SELECT song_name, artist_name, duration_sec, listeners_count,
             song_rank, source_date, country
      FROM (SELECT *, row_number() OVER (
              PARTITION BY song_rank, source_date, country ORDER BY pos) AS rn
            FROM proj)
      WHERE rn = 1)
    """

  /** S1-S4 + P1-P4 + F6/F8 + first-wins dedup — the reference's DAG 2
    * (`transformed_from_s3_to_pg.py`) as one declarative plan.
    */
  val ingestQuery = QueryDef(
    "lastfm_ingest",
    (s, _) => OdsBuilder.ingest(s)
      .orderBy(col("source_date"), col("country"), col("song_rank")),
    Some(odsCteSql + """
      SELECT * FROM ods ORDER BY source_date, country, song_rank"""))

  /** The imputed ingest feeds four star branches (3 dims + fact) — left
    * unpersisted, every branch re-reads and re-flattens the raw JSON
    * landing zone (the multiLine files are unsplittable, so that cost
    * does not parallelize away). Materialized once per (session,
    * fixture-state), like a real pipeline lands its ODS before the star
    * build.
    */
  private val ingestCache = new graft.engine.SessionKeyedCache[
    org.apache.spark.sql.DataFrame](_.unpersist())

  private def filledFixture(s: org.apache.spark.sql.SparkSession) =
    ingestCache.getOrElseUpdate(s, fx,
      graft.engine.SessionKeyedCache.fileFingerprint(s, fx))(
      StarBuilder.imputePerDate(OdsBuilder.ingest(s)).persist())

  /** The full reference vertical from raw JSON: ingest → imputation →
    * star dims+fact → royalties mart (DAGs 2+3+4 in one plan;
    * SURVEY §7.3's minimum end-to-end slice on real raw input).
    */
  val e2eRoyaltiesQuery = QueryDef(
    "lastfm_e2e_royalties",
    (s, _) => {
      val filled = filledFixture(s)
      val dimArtist = StarBuilder.dimArtist(filled)
      val fact = StarBuilder.fact(filled, dimArtist,
        StarBuilder.dimSong(filled), StarBuilder.dimCountry(filled))
      Marts.expectedArtistRoyaltiesByDate(fact, dimArtist)
    },
    Some(odsCteSql + """,
    imp AS (
      SELECT source_date,
             CAST((2 * SUM(duration_sec) + COUNT(*)) // (2 * COUNT(*)) AS INTEGER) AS imputed
      FROM ods WHERE duration_sec > 0 GROUP BY source_date),
    filled AS (
      SELECT o.*, CASE WHEN o.duration_sec = 0 THEN imp.imputed
                       ELSE o.duration_sec END AS duration_filled
      FROM ods o LEFT JOIN imp ON o.source_date = imp.source_date),
    dim_artist AS (
      SELECT row_number() OVER (ORDER BY artist_name) AS artist_id, artist_name
      FROM (SELECT DISTINCT artist_name FROM filled)),
    fact AS (
      SELECT f.source_date AS date, f.artist_name, f.listeners_count
      FROM filled f)
    SELECT date, artist_name,
           CAST((SUM(listeners_count) * 3 + 5) // 10 AS DOUBLE) / 100 AS royalties
    FROM fact JOIN dim_artist USING(artist_name)
    GROUP BY date, artist_name
    ORDER BY date, royalties DESC, artist_name"""))

  /** The quarantine-capable ingest ([[OdsBuilder.ingestChecked]]) on a
    * CLEAN feed must be indistinguishable from the strict path — same
    * oracle as `lastfm_ingest`. The try_cast row-routing and PERMISSIVE
    * corrupt-record handling may only ever REMOVE poison rows, never
    * change clean ones; the poison-input behavior itself is unit-tested
    * (OdsBuilderSpec) where the oracle can't follow (DuckDB's read_json
    * has no per-file corrupt-record routing).
    */
  val ingestCheckedQuery = QueryDef(
    "lastfm_ingest_checked",
    (s, _) => OdsBuilder.ingestChecked(s).ods
      .orderBy(col("source_date"), col("country"), col("song_rank")),
    Some(odsCteSql + """
      SELECT * FROM ods ORDER BY source_date, country, song_rank"""),
    bench = false)

  val all: Seq[QueryDef] = Seq(ingestQuery, e2eRoyaltiesQuery,
    ingestCheckedQuery)
}
