package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.engine.{AnnIndex, Incremental, Manifest, Upsert}

/** The persisted ANN index (round 15): four manifest-managed tables
  * built once, maintained append-only off the source's manifest diff,
  * and probed by the registered q_ann_* queries — which must provably
  * read the INDEX tables, never the raw embeddings (the round-14
  * verdict's "index built inside each query" gap).
  */
class AnnIndexSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // lloyd = 0 keeps the deterministic-seed assertions meaningful; the
  // k-means build (the round-16 default) gets its own test below and
  // the full oracle-checked fixture in VectorQueries
  private val spec = AnnIndex.Spec(dim = 8, m = 2, pqK = 4, lloyd = 0)

  /** n deterministic quantized vectors (id, v[8], n2) starting at id0. */
  private def vecs(id0: Int, n: Int) =
    (id0 until id0 + n).map { i =>
      val v = (0 until 8).map(j => ((i * 31 + j * 7) % 2000 - 1000).toLong)
      (i.toLong, v, v.map(x => x * x).sum)
    }.toDF("vec_id", "v", "n2")
      // parquet reads arrays back nullable — match that shape so the
      // second append survives the drift gate
      .withColumn("v", col("v").cast("array<bigint>"))

  private def freshPaths(): (String, String) = {
    val base = Files.createTempDirectory("graft-annidx").toString
    (s"$base/src", s"$base/idx")
  }

  test("build + refresh: every vector indexed exactly once, refresh " +
      "touches only the added files, centroids stay frozen") {
    val (src, idx) = freshPaths()
    Upsert.append(spark, src, vecs(0, 40), None)
    val n0 = AnnIndex.buildIvfPq(spark, src, idx, spec)
    assert(n0 === 40L)
    val centsAtBuild = Manifest.read(spark,
      AnnIndex.centroidsPath(idx)).select("cent_id")
      .as[Long].collect().sorted.toSeq
    assert(centsAtBuild.size === math.ceil(math.sqrt(40.0)).toInt)
    assert(centsAtBuild === (0L until centsAtBuild.size).toSeq,
      "deterministic seeding: the lowest vec_ids of the build snapshot")
    val assignedV1 = Manifest.currentVersion(spark,
      AnnIndex.assignmentsPath(idx)).get
    // append a second batch to the source, fold it in
    Upsert.append(spark, src, vecs(40, 15), None)
    val added = AnnIndex.refresh(spark, src, idx)
    assert(added === 15L)
    // centroids and codebooks are untouched by the refresh
    assert(Manifest.read(spark, AnnIndex.centroidsPath(idx))
      .select("cent_id").as[Long].collect().sorted.toSeq === centsAtBuild)
    // the assignments table appended exactly once (no rewrite)
    val hist = Manifest.history(spark, AnnIndex.assignmentsPath(idx))
    assert(hist.last.version === assignedV1 + 1 && hist.last.retired === 0)
    // every vector present exactly once, codes complete
    val a = Manifest.read(spark, AnnIndex.assignmentsPath(idx))
    assert(a.count() === 55L &&
      a.select("vec_id").distinct().count() === 55L)
    assert(Manifest.read(spark, AnnIndex.codesPath(idx)).count()
      === 55L * spec.m)
    // refresh assignments agree with a from-scratch assignment rule:
    // nearest frozen centroid by cosine (spot-check: re-derive for the
    // refresh batch via a brute-force join)
    val cents = Manifest.read(spark, AnnIndex.centroidsPath(idx))
    val brute = vecs(40, 15).crossJoin(broadcast(cents))
      .select(col("vec_id"), col("cent_id"),
        (graft.functions.LongArrayDot(col("v"), col("cv")).cast("double") /
          (sqrt(col("n2").cast("double")) *
            sqrt(col("cn2").cast("double")))).as("ccos"))
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("vec_id"))
          .orderBy(col("ccos").desc, col("cent_id"))))
      .filter(col("rk") === 1).select(col("vec_id"), col("cent_id"))
      .as[(Long, Long)].collect().toMap
    val got = a.filter(col("vec_id") >= 40)
      .select("vec_id", "cent_id").as[(Long, Long)].collect().toMap
    assert(got === brute)
  }

  test("refresh is a bookmark no-op at the same source version; " +
      "rebuild of a built root refuses") {
    val (src, idx) = freshPaths()
    Upsert.append(spark, src, vecs(0, 20), None)
    AnnIndex.buildIvfPq(spark, src, idx, spec)
    assert(AnnIndex.refresh(spark, src, idx) === 0L)
    val e = intercept[IllegalArgumentException](
      AnnIndex.buildIvfPq(spark, src, idx, spec))
    assert(e.getMessage.contains("already built"))
  }

  private def bookmarkFile(idx: String) =
    new org.apache.hadoop.fs.Path(
      s"${AnnIndex.assignmentsPath(idx)}/_graft_manifest/source_version")

  private def fs(p: org.apache.hadoop.fs.Path) =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  test("a refresh killed before its bookmark replays without " +
      "duplicating a single vector (txn-marker idempotency)") {
    val (src, idx) = freshPaths()
    Upsert.append(spark, src, vecs(0, 20), None)
    AnnIndex.buildIvfPq(spark, src, idx, spec)
    val buildBookmark = {
      val in = fs(bookmarkFile(idx)).open(bookmarkFile(idx))
      try new String(in.readAllBytes(), "UTF-8") finally in.close()
    }
    Upsert.append(spark, src, vecs(20, 10), None)
    assert(AnnIndex.refresh(spark, src, idx) === 10L)
    // simulate the crash window: appends landed, bookmark write didn't
    val out = fs(bookmarkFile(idx)).create(bookmarkFile(idx), true)
    try out.write(buildBookmark.getBytes("UTF-8")) finally out.close()
    AnnIndex.refresh(spark, src, idx) // replay
    val a = Manifest.read(spark, AnnIndex.assignmentsPath(idx))
    assert(a.count() === 30L &&
      a.select("vec_id").distinct().count() === 30L,
      "replayed refresh must not re-append the delta")
    assert(Manifest.read(spark, AnnIndex.codesPath(idx)).count()
      === 30L * spec.m)
  }

  test("a crashed refresh replayed AFTER the source advanced further " +
      "indexes the overlap exactly once (per-table marker floor)") {
    val (src, idx) = freshPaths()
    Upsert.append(spark, src, vecs(0, 20), None)
    AnnIndex.buildIvfPq(spark, src, idx, spec)
    val buildBookmark = {
      val in = fs(bookmarkFile(idx)).open(bookmarkFile(idx))
      try new String(in.readAllBytes(), "UTF-8") finally in.close()
    }
    Upsert.append(spark, src, vecs(20, 10), None)
    assert(AnnIndex.refresh(spark, src, idx) === 10L)
    // crash window: both appends landed, bookmark write didn't …
    val out = fs(bookmarkFile(idx)).create(bookmarkFile(idx), true)
    try out.write(buildBookmark.getBytes("UTF-8")) finally out.close()
    // … and the SOURCE then advances before the replay — the new toV
    // passes the plain lastTxn >= batchId guard, so only the marker
    // FLOOR keeps the 20..30 overlap from indexing twice
    Upsert.append(spark, src, vecs(30, 5), None)
    assert(AnnIndex.refresh(spark, src, idx) === 5L)
    val a = Manifest.read(spark, AnnIndex.assignmentsPath(idx))
    assert(a.count() === 35L &&
      a.select("vec_id").distinct().count() === 35L,
      "the overlap batch must not be indexed twice")
    assert(Manifest.read(spark, AnnIndex.codesPath(idx)).count()
      === 35L * spec.m)
  }

  test("a build crashed before its bookmark replays at its ORIGINAL " +
      "pinned version even when the source advanced") {
    val (src, idx) = freshPaths()
    Upsert.append(spark, src, vecs(0, 20), None)
    AnnIndex.buildIvfPq(spark, src, idx, spec)
    fs(bookmarkFile(idx)).delete(bookmarkFile(idx), false)
    Upsert.append(spark, src, vecs(20, 10), None) // source moves on
    AnnIndex.buildIvfPq(spark, src, idx, spec) // replay: pinned, no dup
    assert(Manifest.read(spark, AnnIndex.assignmentsPath(idx)).count()
      === 20L, "the replayed build must cover its pinned snapshot only")
    // the post-crash batch arrives through the normal refresh
    assert(AnnIndex.refresh(spark, src, idx) === 10L)
    val a = Manifest.read(spark, AnnIndex.assignmentsPath(idx))
    assert(a.count() === 30L &&
      a.select("vec_id").distinct().count() === 30L)
  }

  test("a build killed before its bookmark replays without duplicating " +
      "centroids, codebooks, or assignments") {
    val (src, idx) = freshPaths()
    Upsert.append(spark, src, vecs(0, 20), None)
    AnnIndex.buildIvfPq(spark, src, idx, spec)
    // simulate: all four appends landed, the bookmark write didn't
    fs(bookmarkFile(idx)).delete(bookmarkFile(idx), false)
    AnnIndex.buildIvfPq(spark, src, idx, spec) // replay passes the guard
    assert(Manifest.read(spark, AnnIndex.centroidsPath(idx)).count()
      === math.ceil(math.sqrt(20.0)).toLong)
    assert(Manifest.read(spark, AnnIndex.assignmentsPath(idx)).count()
      === 20L)
    assert(Manifest.read(spark, AnnIndex.codesPath(idx)).count()
      === 20L * spec.m)
    assert(Manifest.read(spark, AnnIndex.codebooksPath(idx)).count()
      === spec.pqK.toLong * spec.m)
  }

  test("refresh reads the PERSISTED PQ geometry — a caller cannot " +
      "supply a mismatched spec") {
    val (src, idx) = freshPaths()
    Upsert.append(spark, src, vecs(0, 20), None)
    AnnIndex.buildIvfPq(spark, src, idx, spec)
    assert(AnnIndex.persistedSpec(spark, idx) === spec)
    // an index root without persisted geometry refuses refresh
    val e = intercept[IllegalStateException](
      AnnIndex.persistedSpec(spark, s"$idx-nope"))
    assert(e.getMessage.contains("persisted"))
  }

  test("a source rewrite refuses the append-only refresh loudly") {
    val (src, idx) = freshPaths()
    Upsert.append(spark, src, vecs(0, 20), None)
    AnnIndex.buildIvfPq(spark, src, idx, spec)
    // a merge rewrites the file holding vec_id 3
    Upsert.mergeParquet(spark, src,
      vecs(3, 1).withColumn("n2", col("n2") + 0L), Seq("vec_id"))
    val e = intercept[IllegalArgumentException](
      AnnIndex.refresh(spark, src, idx))
    assert(e.getMessage.contains("append-only"))
  }

  test("k-means-trained centroids (round 16): deterministic bit-exact " +
      "training, cells keep seed identity, geometry frozen through " +
      "refresh, exact-integer cn2 contract") {
    val (src, idx) = freshPaths()
    Upsert.append(spark, src, vecs(0, 40), None)
    val trained = AnnIndex.Spec(dim = 8, m = 2, pqK = 4, lloyd = 2)
    AnnIndex.buildIvfPq(spark, src, idx, trained)
    assert(AnnIndex.persistedSpec(spark, idx) === trained)
    val cents = Manifest.read(spark, AnnIndex.centroidsPath(idx))
    val ids = cents.select("cent_id").as[Long].collect().sorted.toSeq
    val k = math.ceil(math.sqrt(40.0)).toInt
    assert(ids.nonEmpty && ids.forall(_ < k),
      "trained cells keep their seed cent_id (k can only shrink)")
    assert(ids.distinct === ids)
    // the exact-integer contract: cn2 is dot(cv, cv), components stay
    // within the input's quantization scale (mean of members)
    assert(cents.filter(graft.functions.LongArrayDot(col("cv"), col("cv"))
      =!= col("cn2")).count() === 0L)
    // bit-exact determinism: an identical corpus in a fresh root
    // trains identical centroids
    val (src2, idx2) = freshPaths()
    Upsert.append(spark, src2, vecs(0, 40), None)
    AnnIndex.buildIvfPq(spark, src2, idx2, trained)
    def snap(p: String) = Manifest.read(spark, AnnIndex.centroidsPath(p))
      .orderBy("cent_id").collect().map(_.toString).toSeq
    val c1 = snap(idx)
    assert(snap(idx2) === c1)
    // refresh freezes the trained geometry and assigns the delta
    // against it — spot-checked brute-force, same as the seeded build
    Upsert.append(spark, src, vecs(40, 15), None)
    assert(AnnIndex.refresh(spark, src, idx) === 15L)
    assert(snap(idx) === c1)
    val brute = vecs(40, 15).crossJoin(broadcast(cents))
      .select(col("vec_id"), col("cent_id"),
        (graft.functions.LongArrayDot(col("v"), col("cv")).cast("double") /
          (sqrt(col("n2").cast("double")) *
            sqrt(col("cn2").cast("double")))).as("ccos"))
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("vec_id"))
          .orderBy(col("ccos").desc, col("cent_id"))))
      .filter(col("rk") === 1).select(col("vec_id"), col("cent_id"))
      .as[(Long, Long)].collect().toMap
    val got = Manifest.read(spark, AnnIndex.assignmentsPath(idx))
      .filter(col("vec_id") >= 40)
      .select("vec_id", "cent_id").as[(Long, Long)].collect().toMap
    assert(got === brute)
  }

  test("the registered ANN probes read ONLY the persisted index tables " +
      "(inputFiles assertion), and the index content matches its oracle " +
      "semantics end-to-end") {
    val dir = "/root/testdata/sf0.001"
    val root = graft.queries.VectorQueries.ivfIndexRoot(spark, dir)
    Seq(
      SparkEntry.queries("q_ann_ivf_topk")(spark, dir),
      SparkEntry.queries("q_ann_ivfpq_topk")(spark, dir),
      SparkEntry.queries("q_ann_index_stats")(spark, dir)
    ).foreach { df =>
      val inputs = df.inputFiles.toSeq
      assert(inputs.nonEmpty)
      assert(inputs.forall(_.contains("graft_annidx_")),
        s"probe must scan the persisted index only, got:\n" +
          inputs.filterNot(_.contains("graft_annidx_")).take(3)
            .mkString("\n"))
      assert(!inputs.exists(_.contains("embeddings.parquet")),
        "probe must never scan the raw embeddings")
    }
    // the probe scan excludes the index's SOURCE table too: only the
    // four index tables appear
    val probe = SparkEntry.queries("q_ann_ivfpq_topk")(spark, dir)
    assert(!probe.inputFiles.exists(_.contains("/source/")),
      "probes read the index tables, not the quantized source copy")
    // bookmark reflects the refreshed source version
    assert(Incremental.appliedSourceVersion(spark,
      AnnIndex.assignmentsPath(root)).contains(
      Manifest.currentVersion(spark, s"${root.stripSuffix("/ivfpq")}/source")
        .get))
  }
}
