package graft

import java.sql.Date
import org.scalatest.funsuite.AnyFunSuite
import graft.marts.Marts

/** Mart golden-row units, including the royalties rounding boundary
  * (PG `ROUND(numeric, 2)` is half-away-from-zero; `ddl_dm.sql:17`'s
  * 0.003/listen rate).
  */
class MartsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val d1 = Date.valueOf("2024-05-01")

  test("royalties round half-up at the cent boundary") {
    // artist A: 15 listeners -> 0.045 -> rounds UP to 0.05
    // artist B: 1000 listeners -> exactly 3.00
    // artist C: 11 listeners -> 0.033 -> 0.03 (round down)
    val fact = Seq((d1, 1L, 10), (d1, 1L, 5), (d1, 2L, 1000), (d1, 3L, 11))
      .toDF("date", "artist_id", "listeners_count")
    val dim = Seq((1L, "A"), (2L, "B"), (3L, "C")).toDF("artist_id", "artist_name")
    val out = Marts.expectedArtistRoyaltiesByDate(fact, dim)
      .select("artist_name", "royalties").as[(String, Double)].collect().toMap
    assert(out === Map("A" -> 0.05, "B" -> 3.00, "C" -> 0.03))
  }

  test("average duration is exact (sum/count, not float accumulation)") {
    val f = Seq((d1, 1L, 10L), (d1, 1L, 11L)).toDF("date", "country_id", "song_id")
    val dimSong = Seq((10L, "s1", 100L), (11L, "s2", 101L))
      .toDF("song_id", "song_name", "duration_sec")
    val dimCountry = Seq((1L, "US")).toDF("country_id", "country_name")
    val out = Marts.avgSongDurationByCountry(f, dimSong, dimCountry)
      .select("avg_duration_sec").as[Double].collect().toSeq
    assert(out === Seq(100.5))
  }

  test("appearances counts rows per (date, artist)") {
    val f = Seq((d1, 1L), (d1, 1L), (d1, 2L)).toDF("date", "artist_id")
    val dim = Seq((1L, "A"), (2L, "B")).toDF("artist_id", "artist_name")
    val out = Marts.artistAppearancesByDate(f, dim)
      .select("artist_name", "cnt_appearance").as[(String, Long)].collect().toMap
    assert(out === Map("A" -> 2L, "B" -> 1L))
  }

  test("royalties integer formula matches BigDecimal HALF_UP over a value sweep") {
    // library formula: cents = (sum * 3 + 5) div 10, royalties = cents / 100
    val rnd = new scala.util.Random(42)
    (0 until 2000).foreach { _ =>
      val sum = math.abs(rnd.nextLong() % 1000000000L)
      val lib = ((sum * 3 + 5) / 10).toDouble / 100
      val ref = BigDecimal(sum).*(BigDecimal("0.003"))
        .setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(lib === ref, s"sum=$sum")
    }
  }
}
