package graft

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import graft.ingest.{OdsBuilder, RawFeed}

/** S1/S2 with a fake transport: fetch → land → read back through the
  * real ingest path.
  */
class RawFeedSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def fakeBody(country: String): String = {
    val tracks = (1 to 3).map { r =>
      s"""{
         |    "name": "T$r",
         |    "duration": "${100 + r}",
         |    "listeners": "${1000 - r}",
         |    "artist": { "name": "A${r % 2}" },
         |    "@attr": { "rank": "$r" }
         |}""".stripMargin
    }.mkString(",\n")
    s"""{ "tracks": { "track": [\n$tracks\n] } }"""
  }

  test("fetch -> land -> ingest round trip with an injected transport") {
    val root = Files.createTempDirectory("graft-rawfeed").toString
    val urlsSeen = scala.collection.mutable.ArrayBuffer.empty[String]
    val fetch: RawFeed.Fetch = { url =>
      urlsSeen += url
      val c = java.net.URLDecoder.decode(
        url.split("country=")(1).split("&")(0), "UTF-8")
      fakeBody(c)
    }
    RawFeed.land(fetch, apiKey = "k", root = root, date = "2024-06-01")
    assert(urlsSeen.size === 3)
    assert(urlsSeen.forall(_.contains("method=geo.gettoptracks")))

    val ods = OdsBuilder.ingest(spark, root)
    assert(ods.count() === 9) // 3 countries × 3 tracks
    assert(ods.select("country").distinct().count() === 3)

    // replace=True: landing the same day twice is idempotent
    RawFeed.land(fetch, apiKey = "k", root = root, date = "2024-06-01")
    assert(OdsBuilder.ingest(spark, root).count() === 9)
  }
}
