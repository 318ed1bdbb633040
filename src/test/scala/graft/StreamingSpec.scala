package graft

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.GraftStreaming

/** Streaming-only semantics: AvailableNow daily-drop incremental ingest
  * (second drop appends exactly the new date) and watermark-driven
  * late-data handling on event-time windows.
  */
class StreamingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def tmp(name: String): Path =
    Files.createTempDirectory(s"graft-stream-$name")

  private def copyDate(landing: Path, date: String): Unit = {
    val src = Paths.get(graft.ingest.OdsBuilder.fixtureRoot, date)
    val dst = landing.resolve(date)
    Files.createDirectories(dst)
    Files.list(src).forEach(f =>
      Files.copy(f, dst.resolve(f.getFileName.toString),
        StandardCopyOption.REPLACE_EXISTING))
  }

  test("streaming mart publish lands exactly once across retries and " +
      "full replays") {
    val src = tmp("mart-src")
    val ckpt = tmp("mart-ckpt")
    val url = "jdbc:derby:memory:graft_stream_mart;create=true"
    def ev(id: Long, ts: String, typ: String, v: Double) =
      (id, Timestamp.valueOf(ts), id, typ, v, "{}")
    Seq(ev(1, "2024-05-01 10:05:00", "play", 1.25),
        ev(2, "2024-05-01 10:40:00", "play", 2.50),
        ev(3, "2024-05-01 11:10:00", "skip", 4.00))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("append").parquet(src.toString)
    def runOnce(): Unit = {
      val events = spark.readStream
        .schema("event_id LONG, ts TIMESTAMP, user_id LONG, " +
          "event_type STRING, value DOUBLE, props STRING")
        .parquet(src.toString)
      val mart = GraftStreaming.windowedEventStats(events, "1 hour")
      GraftStreaming.martPublishStream(mart, url, "s_win_mart",
        Seq("window_start", "event_type"), ckpt.toString)
        .awaitTermination()
    }
    def snapshot() = spark.read
      .jdbc(url, "s_win_mart", new java.util.Properties())
      .as[(Timestamp, String, Long, Double)].collect().toSet
    val want = Set(
      (Timestamp.valueOf("2024-05-01 10:00:00"), "play", 2L, 3.75),
      (Timestamp.valueOf("2024-05-01 11:00:00"), "skip", 1L, 4.00))

    runOnce()
    assert(snapshot() === want)
    // no new files, same checkpoint: nothing re-lands
    runOnce()
    assert(snapshot() === want)
    // checkpoint LOST: the stream replays everything as epoch 0 again —
    // the graft_epochs ledger refuses the already-committed epoch, so
    // the full replay lands zero duplicate rows
    org.apache.commons.io.FileUtils.deleteDirectory(ckpt.toFile)
    runOnce()
    assert(snapshot() === want)
  }

  test("AvailableNow daily drops: second drop appends exactly the new date") {
    val landing = tmp("landing")
    val ods = tmp("ods").resolve("ods").toString
    val ckpt = tmp("ckpt").toString

    copyDate(landing, "2024-05-01")
    GraftStreaming.dailyDropIngest(spark, landing.toString, ods, ckpt)
      .awaitTermination()
    assert(spark.read.parquet(ods).count() === 33)

    copyDate(landing, "2024-05-02")
    GraftStreaming.dailyDropIngest(spark, landing.toString, ods, ckpt)
      .awaitTermination()
    val back = spark.read.parquet(ods)
    assert(back.count() === 66)
    assert(back.select("source_date").distinct().count() === 2)

    // replay with a FRESH checkpoint (lost-checkpoint scenario): the
    // upsert layer still makes it a no-op
    GraftStreaming.dailyDropIngest(spark, landing.toString, ods,
      tmp("ckpt2").toString).awaitTermination()
    assert(spark.read.parquet(ods).count() === 66)
  }

  test("named sink format(\"graft\") lands into a catalog-readable table " +
      "exactly once; checkpoint-loss replay lands zero duplicates " +
      "(round 17)") {
    import org.apache.spark.sql.types._
    val drops = tmp("gsink-drop")
    val table = tmp("gsink-tbl").resolve("t").toString
    val ckpt = tmp("gsink-ckpt")
    def writeDrop(name: String, rows: Seq[(Long, String)]): Unit =
      Files.write(drops.resolve(name),
        rows.map { case (k, d) => s"""{"k":$k,"d":"$d"}""" }
          .mkString("\n").getBytes("UTF-8"))
    // d is DATE end-to-end: the partition directory reads back as DATE,
    // so a string-typed stream would trip the schema drift gate on the
    // second batch (the gate working as designed)
    val schema = StructType(Seq(
      StructField("k", LongType), StructField("d", DateType)))
    def runOnce(cp: String): Unit =
      spark.readStream.schema(schema).json(s"$drops/*.json")
        .writeStream.format("graft")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .option("path", table)
        .option("dateCol", "d")
        .option("appId", "gsink_test")
        .option("checkpointLocation", cp)
        .start().awaitTermination()
    writeDrop("a.json", Seq((1L, "2024-05-01"), (2L, "2024-05-01")))
    runOnce(ckpt.toString)
    val t0 = graft.engine.Manifest.read(spark, table)
    assert(t0.count() === 2L)
    // the sink lands a real manifest table: partitioned by dateCol,
    // every later read zero-cost snapshot-isolated
    assert(graft.engine.Manifest.currentLive(spark, table)
      .forall(_.startsWith("d=")))
    // second drop appends exactly the new rows under the same checkpoint
    writeDrop("b.json", Seq((3L, "2024-05-02")))
    runOnce(ckpt.toString)
    assert(graft.engine.Manifest.read(spark, table)
      .select("k").as[Long].collect().sorted.toSeq === Seq(1L, 2L, 3L))
    // checkpoint LOST: the fresh stream re-delivers everything under
    // already-committed batchIds — the manifest epoch ledger skips them
    // by one metadata read; zero duplicate rows
    org.apache.commons.io.FileUtils.deleteDirectory(ckpt.toFile)
    runOnce(ckpt.toString)
    assert(graft.engine.Manifest.read(spark, table)
      .select("k").as[Long].collect().sorted.toSeq === Seq(1L, 2L, 3L))
    // non-append output modes refuse loudly at sink construction
    val e = intercept[Exception] {
      implicit val sqlCtx = spark.sqlContext
      val in = MemoryStream[(Long, String)]
      in.toDF().toDF("k", "d").groupBy("d").count()
        .writeStream.format("graft").outputMode("complete")
        .option("path", table)
        .option("checkpointLocation", tmp("gsink-ckpt2").toString)
        .start()
    }
    assert(e.getMessage.contains("append-only") ||
      e.getMessage.toLowerCase.contains("complete"), e.getMessage)
  }

  test("watermarked tumbling windows finalize and drop late events") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Timestamp, String, Double)]
    val events = in.toDF().toDF("ts", "event_type", "value")
    val out = GraftStreaming.windowedEventStats(events, "10 minutes",
      watermark = "10 minutes")
    val q = out.writeStream.format("memory").queryName("win")
      .outputMode("append").start()

    def t(s: String) = Timestamp.valueOf(s)
    // two on-time events in the 10:00-10:10 window
    in.addData((t("2024-05-01 10:02:00"), "click", 1.0),
      (t("2024-05-01 10:08:00"), "click", 2.0))
    q.processAllAvailable()
    // advance the watermark far past the window end -> window finalizes
    in.addData((t("2024-05-01 11:30:00"), "click", 5.0))
    q.processAllAvailable()
    val finalized = spark.table("win")
      .filter(col("window_start") === t("2024-05-01 10:00:00"))
      .select("n_events", "sum_value").as[(Long, Double)].collect()
    assert(finalized.toSeq === Seq((2L, 3.0)))

    // a LATE event for the already-finalized window is dropped
    in.addData((t("2024-05-01 10:03:00"), "click", 100.0))
    q.processAllAvailable()
    val after = spark.table("win")
      .filter(col("window_start") === t("2024-05-01 10:00:00"))
      .select("n_events", "sum_value").as[(Long, Double)].collect()
    assert(after.toSeq === Seq((2L, 3.0)), "late event must not reopen the window")
    q.stop()
  }

  test("stream-stream outer interval join matches and null-pads after watermark") {
    implicit val sqlCtx = spark.sqlContext
    val pIn = MemoryStream[(Long, Long, Timestamp)]
    val cIn = MemoryStream[(Long, Long, Timestamp)]
    def ev(in: MemoryStream[(Long, Long, Timestamp)]) =
      in.toDF().toDF("event_id", "user_id", "ts")
    val out = GraftStreaming.clickAttribution(ev(pIn), ev(cIn),
      lookback = "10 minutes", watermark = "10 minutes")
    val q = out.writeStream.format("memory").queryName("attr")
      .outputMode("append").start()

    def t(s: String) = Timestamp.valueOf(s)
    // user 7: click 4 min before the purchase (in lookback);
    // user 8: purchase with NO click in lookback (click 20 min earlier)
    cIn.addData((100L, 7L, t("2024-05-01 10:00:00")),
      (101L, 8L, t("2024-05-01 09:40:00")))
    pIn.addData((200L, 7L, t("2024-05-01 10:04:00")),
      (201L, 8L, t("2024-05-01 10:00:00")))
    q.processAllAvailable()
    // inner match emits without waiting for the watermark
    val matched = spark.table("attr").filter(col("p_id") === 200L)
      .select("c_id").as[Long].collect()
    assert(matched.toSeq === Seq(100L))

    // advance BOTH watermarks far past user 8's purchase -> Spark can
    // prove no future click can match it and emits the null-padded row
    cIn.addData((110L, 99L, t("2024-05-01 12:00:00")))
    pIn.addData((210L, 99L, t("2024-05-01 12:00:00")))
    q.processAllAvailable()
    val unmatched = spark.table("attr").filter(col("p_id") === 201L)
      .select("c_id").collect()
    assert(unmatched.length === 1 && unmatched.head.isNullAt(0),
      "watermark-expired purchase must emit exactly one null-padded row")
    q.stop()
  }

  test("stream-static enrichment is stateless and sees a dim swap on the next run") {
    implicit val sqlCtx = spark.sqlContext
    val dimDir = tmp("dim").resolve("dim_country").toString
    Seq((1L, "Italy")).toDF("country_id", "country_name")
      .write.mode("overwrite").parquet(dimDir)

    val in = MemoryStream[(Long, Long)]
    def start(name: String) = GraftStreaming.dimEnrich(
      in.toDF().toDF("event_id", "country_id"),
      spark.read.parquet(dimDir), Seq("country_id"))
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()

    val q1 = start("enrich1")
    in.addData((10L, 1L), (11L, 2L))
    q1.processAllAvailable()
    val run1 = spark.table("enrich1")
      .select("event_id", "country_name").as[(Long, Option[String])]
      .collect().toMap
    assert(run1(10L) === Some("Italy"))
    assert(run1(11L) === None, "unknown dim key must left-join to null")
    q1.stop()

    // the daily-cadence dim swap: next invocation re-plans and re-reads
    // the static side; the stream source position carries on
    Seq((1L, "Italy"), (2L, "Ghana")).toDF("country_id", "country_name")
      .write.mode("overwrite").parquet(dimDir)
    val q2 = start("enrich2")
    in.addData((12L, 2L))
    q2.processAllAvailable()
    val run2 = spark.table("enrich2").filter(col("event_id") === 12L)
      .select("country_name").as[String].collect()
    assert(run2.toSeq === Seq("Ghana"))
    q2.stop()
  }

  test("watermarked streaming dedup emits first arrival and drops replays") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Timestamp, Long, String)]
    val events = in.toDF().toDF("ts", "event_id", "payload")
    val out = GraftStreaming.dedupStream(events, Seq("event_id"),
      watermark = "10 minutes")
    val q = out.writeStream.format("memory").queryName("dedup")
      .outputMode("append").start()

    def t(s: String) = Timestamp.valueOf(s)
    // key 1 twice in one batch, key 2 once
    in.addData((t("2024-05-01 10:00:00"), 1L, "first"),
      (t("2024-05-01 10:00:30"), 1L, "dup-same-batch"),
      (t("2024-05-01 10:01:00"), 2L, "first"))
    q.processAllAvailable()
    // key 1 again in a LATER batch, still within the watermark horizon
    in.addData((t("2024-05-01 10:02:00"), 1L, "dup-cross-batch"))
    q.processAllAvailable()
    val rows = spark.table("dedup")
      .select("event_id", "payload").as[(Long, String)].collect().toSet
    assert(rows === Set((1L, "first"), (2L, "first")))
    q.stop()
  }

  test("transformWithState keyed dedup drops in-batch and cross-batch replays") {
    import graft.streaming.KeyedStateDedup
    import graft.streaming.KeyedStateDedup.KeyedEvent
    implicit val sqlCtx = spark.sqlContext
    // transformWithState requires the RocksDB state store; scope the
    // provider switch to this query and restore the session default after.
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val prior = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val in = MemoryStream[(String, Timestamp, Double)]
      val events = in.toDS()
        .map { case (k, ts, p) => KeyedEvent(k, ts, p) }
      val q = KeyedStateDedup.dedup(events, retentionMinutes = 10)
        .writeStream.format("memory").queryName("tws_dedup")
        .outputMode("append").start()

      def t(s: String) = Timestamp.valueOf(s)
      in.addData(("a", t("2024-05-01 10:00:00"), 1.0),
        ("a", t("2024-05-01 10:00:10"), 2.0), // in-batch replay: dropped
        ("b", t("2024-05-01 10:00:20"), 3.0))
      q.processAllAvailable()
      in.addData(("a", t("2024-05-01 10:05:00"), 4.0), // cross-batch replay
        ("c", t("2024-05-01 10:06:00"), 5.0))
      q.processAllAvailable()
      // d advances the max event time; the watermark itself moves to
      // 10:30 only AFTER this batch completes (watermarks lag one batch)
      in.addData(("d", t("2024-05-01 10:30:00"), 6.0))
      q.processAllAvailable()
      // e's batch runs with watermark 10:30 -> a/b/c eviction timers
      // (first-seen + 10 min) fire during it
      in.addData(("e", t("2024-05-01 10:32:00"), 8.0))
      q.processAllAvailable()
      // 'a' is forgotten -> re-admitted as a fresh first arrival
      in.addData(("a", t("2024-05-01 10:33:00"), 7.0))
      q.processAllAvailable()
      val rows = spark.table("tws_dedup")
        .select("key", "payload").as[(String, Double)].collect().toSet
      assert(rows === Set(("a", 1.0), ("b", 3.0), ("c", 5.0),
        ("d", 6.0), ("e", 8.0), ("a", 7.0)))
      q.stop()
    } finally restoreProvider(prior)
  }

  test("burst detector flags only keys crossing the in-window threshold") {
    import graft.streaming.BurstDetector
    import graft.streaming.BurstDetector.KeyedTick
    implicit val sqlCtx = spark.sqlContext
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val prior = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val in = MemoryStream[(String, Timestamp)]
      val q = BurstDetector.detect(
        in.toDS().map { case (k, ts) => KeyedTick(k, ts) },
        windowMinutes = 5, threshold = 3)
        .writeStream.format("memory").queryName("bursts")
        .outputMode("append").start()
      def t(s: String) = Timestamp.valueOf(s)
      // bot: 3 events inside 5 min; human: 2 spread events
      in.addData(("bot", t("2024-05-01 10:00:00")),
        ("bot", t("2024-05-01 10:01:00")),
        ("human", t("2024-05-01 10:00:30")))
      q.processAllAvailable()
      in.addData(("bot", t("2024-05-01 10:03:00")),
        ("human", t("2024-05-01 10:20:00")))
      q.processAllAvailable()
      // bot again much later: the old window has aged out -> no burst
      in.addData(("bot", t("2024-05-01 11:00:00")))
      q.processAllAvailable()
      val bursts = spark.table("bursts")
        .select("key", "n_events").as[(String, Long)].collect().toList
      assert(bursts === List(("bot", 3L)))
      q.stop()
    } finally restoreProvider(prior)
  }

  test("MapState top-type tracker follows count changes and evicts idle keys") {
    import graft.streaming.TopTypeTracker
    import graft.streaming.TopTypeTracker.TypedEvent
    implicit val sqlCtx = spark.sqlContext
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val prior = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val in = MemoryStream[(String, String, Timestamp)]
      val q = TopTypeTracker.track(
        in.toDS().map { case (k, et, ts) => TypedEvent(k, et, ts) },
        retentionMinutes = 10)
        .writeStream.format("memory").queryName("top_types")
        .outputMode("append").start()
      def t(s: String) = Timestamp.valueOf(s)
      // a: click leads 2-1; c: 1-1 tie broken to the lex-smaller type
      in.addData(("a", "click", t("2024-05-01 10:00:00")),
        ("a", "click", t("2024-05-01 10:00:10")),
        ("a", "view", t("2024-05-01 10:00:20")),
        ("b", "view", t("2024-05-01 10:00:30")),
        ("c", "view", t("2024-05-01 10:00:40")),
        ("c", "click", t("2024-05-01 10:00:50")))
      q.processAllAvailable()
      // a: view overtakes click 3-2 across batches
      in.addData(("a", "view", t("2024-05-01 10:05:00")),
        ("a", "view", t("2024-05-01 10:05:10")))
      q.processAllAvailable()
      // d advances max event time; watermark moves after the batch ends
      in.addData(("d", "view", t("2024-05-01 10:40:00")))
      q.processAllAvailable()
      // e's batch runs with watermark 10:40 -> idle timers for a/b/c fire
      in.addData(("e", "view", t("2024-05-01 10:42:00")))
      q.processAllAvailable()
      // a returns after eviction: counters restart from zero
      in.addData(("a", "purchase", t("2024-05-01 10:43:00")))
      q.processAllAvailable()
      val rows = spark.table("top_types")
        .as[(String, String, Long, Long)].collect().toList
      val expected = List(
        ("a", "click", 2L, 3L), ("b", "view", 1L, 1L), ("c", "click", 1L, 2L),
        ("a", "view", 3L, 5L), ("d", "view", 1L, 1L), ("e", "view", 1L, 1L),
        ("a", "purchase", 1L, 1L))
      assert(rows.sorted === expected.sorted)
      q.stop()
    } finally restoreProvider(prior)
  }

  private def restoreProvider(prior: Option[String]): Unit = {
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    prior match {
      case Some(v) => spark.conf.set(providerKey, v)
      case None => spark.conf.unset(providerKey)
    }
  }

  test("streaming corpus drops admit only novel docs; checkpoint loss replay is a no-op") {
    val root = Files.createTempDirectory("graft-dropadmit").toString
    val drops = s"$root/drops"; val adm = s"$root/admitted"
    val ckpt = s"$root/ckpt"
    new java.io.File(drops).mkdirs()
    // long texts so one changed word keeps estimated Jaccard >= 11/12
    val base = ("alpha bravo charlie delta echo foxtrot golf hotel india " +
      "juliet kilo lima mike november oscar papa quebec romeo sierra tango " +
      "uniform victor whiskey xray yankee zulu one two three four five six " +
      "seven eight nine ten eleven twelve thirteen fourteen").split(" ")
    def text(changed: Int): String = base.zipWithIndex.map { case (w, i) =>
      if (i < changed) s"swapped$i" else w }.mkString(" ")
    def jsonl(name: String, rows: Seq[(Long, String)]): Unit =
      Files.writeString(Paths.get(s"$drops/$name"), rows.map {
        case (id, tx) => s"""{"doc_id": $id, "text": "$tx"}"""
      }.mkString("\n"))
    def admitted(): Set[Long] =
      spark.read.parquet(adm).select("doc_id").as[Long].collect().toSet

    jsonl("drop1.jsonl", Seq(
      1L -> text(0),
      2L -> "completely different words entirely unrelated to the corpus body here"))
    GraftStreaming.corpusDropAdmit(spark, drops, adm, ckpt)
      .awaitTermination()
    assert(admitted() === Set(1L, 2L))

    jsonl("drop2.jsonl", Seq(
      10L -> text(1), // near-dup of admitted doc 1 -> reject
      11L -> "another genuinely novel document with its own fresh vocabulary set",
      12L -> "another genuinely novel document with its own fresh vocabulary set"))
    GraftStreaming.corpusDropAdmit(spark, drops, adm, ckpt)
      .awaitTermination()
    assert(admitted() === Set(1L, 2L, 11L),
      "corpus near-dup and in-batch dup must both reject")

    // lose the checkpoint: both drops replay, every doc is near-dup to
    // its own admitted copy -> the gate absorbs the replay entirely
    def rmrf(p: java.io.File): Unit = {
      Option(p.listFiles()).foreach(_.foreach(rmrf)); p.delete(); ()
    }
    rmrf(new java.io.File(ckpt))
    GraftStreaming.corpusDropAdmit(spark, drops, adm, s"$root/ckpt2")
      .awaitTermination()
    assert(admitted() === Set(1L, 2L, 11L),
      "replay after checkpoint loss must admit nothing new")
  }

  test("public change-feed stream delivers each commit once; checkpoint " +
      "loss replays zero duplicate change rows") {
    import java.sql.Date
    val root = Files.createTempDirectory("graft-cdcstream").toString
    val src = s"$root/src"; val sink = s"$root/sink"
    val d1 = Date.valueOf("2024-07-01")
    graft.engine.Upsert.append(spark, src,
      Seq((1, d1, 10L), (2, d1, 20L)).toDF("k", "d", "cents"), Some("d"))
    def drain(ckpt: String): Unit =
      GraftStreaming.changeFeedStream(spark, src, Seq("k", "d"), "c1",
        ckpt)(b => b.write.mode("append").parquet(sink))
        .awaitTermination()
    def delivered(): Seq[(Int, Long, String)] =
      spark.read.parquet(sink)
        .select(col("k"), col("cents"),
          col(graft.engine.ChangeFeed.ChangeCol))
        .as[(Int, Long, String)].collect().toSeq.sorted

    // first delivery: the whole snapshot as inserts (new consumer)
    drain(s"$root/ckpt1")
    assert(delivered() === Seq((1, 10L, "insert"), (2, 20L, "insert")))

    // checkpoint LOST: a fresh stream replays every manifest file, but
    // the durable consumer offset absorbs it — zero new rows
    drain(s"$root/ckpt2")
    assert(delivered() === Seq((1, 10L, "insert"), (2, 20L, "insert")),
      "checkpoint-loss replay must deliver zero duplicate change rows")

    // a new commit delivers exactly its delta (update = two images)
    graft.engine.Upsert.mergePartitioned(spark, src,
      Seq((2, d1, 999L)).toDF("k", "d", "cents"), Seq("k", "d"), "d")
    drain(s"$root/ckpt3")
    assert(delivered() === Seq((1, 10L, "insert"), (2, 20L, "insert"),
      (2, 20L, "update_preimage"), (2, 999L, "update_postimage")))

    // seek rewinds: replaying from 0 re-delivers the current snapshot
    graft.engine.ChangeFeed.seekConsumer(spark, src, "c1", 0L)
    val sink2 = s"$root/sink2"
    GraftStreaming.changeFeedStream(spark, src, Seq("k", "d"), "c1",
      s"$root/ckpt4")(b => b.write.mode("append").parquet(sink2))
      .awaitTermination()
    assert(spark.read.parquet(sink2)
      .select(col("k"), col("cents"),
        col(graft.engine.ChangeFeed.ChangeCol))
      .as[(Int, Long, String)].collect().toSeq.sorted ===
      Seq((1, 10L, "insert"), (2, 999L, "insert")))
  }

  test("named source format(\"graft\") streams the change feed; " +
      "checkpoint loss replays zero duplicate rows") {
    import java.sql.Date
    val root = Files.createTempDirectory("graft-gsource").toString
    val src = s"$root/src"; val sink = s"$root/sink"
    val d1 = Date.valueOf("2024-07-01")
    graft.engine.Upsert.append(spark, src,
      Seq((1, d1, 10L), (2, d1, 20L)).toDF("k", "d", "cents"), Some("d"))
    // foreachBatch append, NOT the parquet file sink: the file sink
    // keeps its own _spark_metadata batch log per OUTPUT dir, which
    // would dedup replayed batchIds itself and mask what this test
    // pins — that the SOURCE's durable consumer pointer alone delivers
    // zero duplicates across checkpoint loss
    def drain(ckpt: String): Unit =
      spark.readStream.format("graft")
        .option("path", src)
        .option("keyCols", "k,d")
        .option("consumerId", "gsrc1")
        .load()
        .writeStream
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .option("checkpointLocation", ckpt)
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          b.write.mode("append").parquet(sink); ()
        }
        .start()
        .awaitTermination()
    def delivered(): Seq[(Int, Long, String)] =
      spark.read.parquet(sink)
        .select(col("k"), col("cents"),
          col(graft.engine.ChangeFeed.ChangeCol))
        .as[(Int, Long, String)].collect().toSeq.sorted

    // first delivery: the whole snapshot as inserts
    drain(s"$root/ckpt1")
    assert(delivered() === Seq((1, 10L, "insert"), (2, 20L, "insert")))

    // checkpoint LOST: the durable consumer pointer (advanced in
    // Source.commit) absorbs the replay — zero new rows
    drain(s"$root/ckpt2")
    assert(delivered() === Seq((1, 10L, "insert"), (2, 20L, "insert")),
      "checkpoint-loss replay through the named source must deliver " +
        "zero duplicate change rows")

    // a new commit streams exactly its delta through the same source
    graft.engine.Upsert.mergePartitioned(spark, src,
      Seq((2, d1, 999L)).toDF("k", "d", "cents"), Seq("k", "d"), "d")
    drain(s"$root/ckpt3")
    assert(delivered() === Seq((1, 10L, "insert"), (2, 20L, "insert"),
      (2, 20L, "update_preimage"), (2, 999L, "update_postimage")))

    // without a consumerId the stream is checkpoint-scoped: a fresh
    // checkpoint restarts at startingVersion (0 = full snapshot)
    val sink2 = s"$root/sink2"
    spark.readStream.format("graft")
      .option("path", src).option("keyCols", "k,d")
      .load()
      .writeStream
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .format("parquet").option("path", sink2)
      .option("checkpointLocation", s"$root/ckpt4")
      .start().awaitTermination()
    assert(spark.read.parquet(sink2)
      .select(col("k"), col("cents"),
        col(graft.engine.ChangeFeed.ChangeCol))
      .as[(Int, Long, String)].collect().toSeq.sorted ===
      Seq((1, 10L, "insert"), (2, 999L, "insert")))
  }
}
