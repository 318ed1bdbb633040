package graft.model

import java.sql.Date

/** Typed row contracts for the warehouse layers (§1.3 canonical schemas)
  * — `Dataset[T]` entry points where compile-time safety helps library
  * consumers; the dynamic-schema `DataFrame` API remains the engine's
  * internal currency.
  */
object Schemas {

  /** `ods.daily_data` (`scripts/ddl_ods.sql:14-24`), minus the serial id
    * (surrogate ids live in the DDS layer).
    */
  final case class OdsRow(
      song_name: String,
      artist_name: String,
      duration_sec: Int,
      listeners_count: Int,
      song_rank: Int,
      source_date: Date,
      country: String)

  /** `dds.fact_daily_top_100` (`scripts/ddl_dds.sql:23-32`). */
  final case class FactRow(
      date: Date,
      country_id: Long,
      song_id: Long,
      artist_id: Long,
      song_rank: Long,
      listeners_count: Long)

  /** `dm.expected_artist_royalties_by_date` (`scripts/ddl_dm.sql:18-23`). */
  final case class RoyaltyRow(date: Date, artist_name: String, royalties: Double)
}
