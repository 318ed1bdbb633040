package graft.ingest

import java.nio.file.{Files, Path, Paths}

/** S1/S2 — the live feed half of the reference's DAG 1
  * (`dags/raw_from_api_to_s3.py`): one `geo.getTopTracks` GET per country
  * per day, raw body landed verbatim (EL, not ETL) at
  * `{root}/{date}/{country}_{date}.json` with idempotent overwrite
  * (`raw_from_api_to_s3.py:21-54`).
  *
  * The fetch is driver-side by design — one tiny request per (country,
  * day) is orchestration, not data-parallel work; executors only get
  * involved when [[OdsBuilder]] reads the landed files back. The
  * transport is injectable so the zero-egress harness and the tests run
  * on fixtures; production passes [[liveFetch]].
  */
object RawFeed {

  type Fetch = String => String

  /** `COUNTRIES` per `raw_from_api_to_s3.py:14-18`. */
  val defaultCountries: Seq[String] =
    Seq("Russian Federation", "United States", "Kazakhstan")

  /** Endpoint per `raw_from_api_to_s3.py:21` — overridable so the
    * integration test can point the REAL transport at a local stub
    * server (the zero-egress harness never reaches the live host).
    */
  val defaultBase = "https://ws.audioscrobbler.com/2.0/"

  /** Request URL shape per `raw_from_api_to_s3.py:21-44` (method,
    * country, limit=100, json format).
    */
  def requestUrl(country: String, apiKey: String,
      base: String = defaultBase): String = {
    val c = java.net.URLEncoder.encode(country, "UTF-8")
    s"$base?method=geo.gettoptracks" +
      s"&country=$c&limit=100&api_key=$apiKey&format=json"
  }

  /** Real transport (java.net.http; the reference uses `requests`).
    * One shared client; non-2xx responses throw rather than landing an
    * error body as raw data (which the declared read schema would parse
    * to an empty day — silent loss).
    */
  lazy val liveFetch: Fetch = {
    val client = java.net.http.HttpClient.newHttpClient()
    url => {
      val req = java.net.http.HttpRequest.newBuilder(java.net.URI.create(url))
        .GET().build()
      val resp = client.send(req,
        java.net.http.HttpResponse.BodyHandlers.ofString())
      if (resp.statusCode() / 100 != 2)
        throw new java.io.IOException(
          s"feed returned HTTP ${resp.statusCode()} for $url")
      resp.body()
    }
  }

  /** Fetch + land one day's files; returns the written paths. Re-running
    * overwrites in place (`replace=True`, `raw_from_api_to_s3.py:54`).
    */
  def land(fetch: Fetch, apiKey: String, root: String, date: String,
      countries: Seq[String] = defaultCountries,
      base: String = defaultBase): Seq[Path] = {
    val dir = Paths.get(root, date)
    Files.createDirectories(dir)
    countries.map { c =>
      val body = fetch(requestUrl(c, apiKey, base))
      Files.writeString(dir.resolve(s"${c}_$date.json"), body)
    }
  }
}
