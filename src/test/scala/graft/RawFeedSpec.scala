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

  test("liveFetch drives the real HTTP client against a local stub server") {
    // The live-shape path of `raw_from_api_to_s3.py:21-54`: real
    // java.net.http transport, per-country loop with the reference's
    // query params, idempotent overwrite, non-2xx -> loud failure.
    val seen = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val phase = new java.util.concurrent.atomic.AtomicInteger(1)
    val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/2.0/", { ex =>
      val q = ex.getRequestURI.getRawQuery
      seen.add(q)
      val (code, body) =
        if (q.contains("api_key=bad")) (403, """{"error":6}""")
        else {
          val c = java.net.URLDecoder.decode(
            q.split("country=")(1).split("&")(0), "UTF-8")
          (200, fakeBody(c) + s"""/* phase ${phase.get} $c */""")
        }
      val bytes = body.getBytes("UTF-8")
      ex.sendResponseHeaders(code, bytes.length)
      ex.getResponseBody.write(bytes)
      ex.close()
    })
    server.start()
    try {
      val base = s"http://127.0.0.1:${server.getAddress.getPort}/2.0/"
      val root = Files.createTempDirectory("graft-rawfeed-live").toString
      val paths = RawFeed.land(RawFeed.liveFetch, apiKey = "k",
        root = root, date = "2024-06-02", base = base)
      // one GET per country, reference param shape on every request
      assert(seen.size === RawFeed.defaultCountries.size)
      seen.forEach { q =>
        assert(q.contains("method=geo.gettoptracks"), q)
        assert(q.contains("limit=100"), q)
        assert(q.contains("format=json"), q)
        assert(q.contains("api_key=k"), q)
      }
      assert(paths.map(_.getFileName.toString).toSet ===
        RawFeed.defaultCountries.map(c => s"${c}_2024-06-02.json").toSet)
      assert(paths.forall(p =>
        Files.readString(p).contains("phase 1")))
      // replace=True: re-landing overwrites in place with fresh bodies
      phase.set(2)
      RawFeed.land(RawFeed.liveFetch, apiKey = "k",
        root = root, date = "2024-06-02", base = base)
      assert(paths.forall(p =>
        Files.readString(p).contains("phase 2")))
      // non-2xx must throw, never land an error body as raw data
      val err = intercept[java.io.IOException] {
        RawFeed.land(RawFeed.liveFetch, apiKey = "bad",
          root = root, date = "2024-06-03", base = base)
      }
      assert(err.getMessage.contains("403"))
      assert(!Files.exists(
        java.nio.file.Paths.get(root, "2024-06-03",
          s"${RawFeed.defaultCountries.head}_2024-06-03.json")))
    } finally server.stop(0)
  }
}
