package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.engine.Tables.t

/** Similarity search over the `embeddings` table (`vec_id`,
  * `embedding array<float>`, `label`) — the ANN surface of a training-data
  * pipeline: exact brute-force cosine top-k as the correctness baseline,
  * a random-hyperplane LSH-bucketed variant as the scale path, and
  * bucketed embedding near-dup pairs.
  *
  * Engine-parity design: floats are quantized once —
  * `floor(double(x) * 1e6)` as BIGINT, bit-identical in Spark and DuckDB
  * since float→double is exact and both floor correctly — and every dot
  * product / norm is EXACT integer arithmetic (order-independent, no
  * float-summation drift). The only floating point is the final
  * `dot / (sqrt(na) * sqrt(nb))`, a fixed chain of correctly-rounded IEEE
  * ops, so cosines hash-match across engines. Unit-norm 64-dim inputs
  * keep all sums far below 2^63 (|q| ≤ 1e6 ⇒ Σx² ≤ 6.4e13).
  *
  * Everything is built-in higher-order functions (`zip_with` +
  * `aggregate`) inside whole-stage codegen — no UDFs, nothing collected
  * to the driver.
  */
object VectorQueries {

  private val Dim = 64
  private val Scale = 1000000L
  private val NQueries = 8
  private val TopK = 3

  /** LSH planes: weights in [-1000, 1000], derived from md5 of
    * "plane_p_dim_j" at CONSTANT-GENERATION time (plain Scala) and
    * embedded as literals in both the Spark plan and the DuckDB oracle —
    * hash parity by construction, zero runtime hashing cost.
    */
  private val NPlanes = 4

  private def h44Const(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    java.lang.Long.parseLong(d.map("%02x".format(_)).mkString.take(11), 16)
  }

  private[graft] val planes: Seq[Seq[Long]] =
    (0 until NPlanes).map(p =>
      (0 until Dim).map(j => (h44Const(s"plane_${p}_dim_$j") % 2001) - 1000))

  // ---- Spark-side builders ---------------------------------------------

  /** embeddings → (vec_id, v BIGINT[], n2) with quantized vector + norm². */
  private def quantized(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "embeddings").select(col("vec_id"),
      transform(col("embedding"),
        x => floor(x.cast("double") * Scale).cast("bigint")).as("v"))
      .withColumn("n2", dot(col("v"), col("v")))

  /** Native codegen'd integer dot product (see [[graft.functions.LongArrayDot]]
    * — the HOF aggregate/zip_with formulation runs interpreted).
    */
  private def dot(a: Column, b: Column): Column =
    graft.functions.LongArrayDot(a, b)

  private def cosine(d: Column, na: Column, nb: Column): Column =
    d.cast("double") / (sqrt(na.cast("double")) * sqrt(nb.cast("double")))

  /** Signed-projection LSH bucket (NPlanes bits) of a quantized vector. */
  private def bucket(v: Column): Column =
    planes.zipWithIndex.map { case (w, p) =>
      val wLit = array(w.map(lit): _*)
      when(dot(v, wLit) > 0, lit(1 << p)).otherwise(lit(0))
    }.reduce(_ + _)

  // ---- DuckDB-side mirrors ---------------------------------------------

  private val quantizedSql =
    s"""SELECT vec_id,
          list_transform(embedding,
            x -> CAST(floor(CAST(x AS DOUBLE) * $Scale) AS BIGINT)) AS v
        FROM embeddings"""

  private val n2Sql = "CAST(list_sum([x * x for x in v]) AS BIGINT)"

  private def dotSql(a: String, b: String): String =
    s"CAST(list_sum([p[1] * p[2] for p in list_zip($a, $b)]) AS BIGINT)"

  private def cosineSql(d: String, na: String, nb: String): String =
    s"CAST($d AS DOUBLE) / (sqrt(CAST($na AS DOUBLE)) * sqrt(CAST($nb AS DOUBLE)))"

  private val bucketSql: String =
    planes.zipWithIndex.map { case (w, p) =>
      val wLit = w.mkString("[", ", ", "]")
      s"CASE WHEN ${dotSql("v", wLit)} > 0 THEN ${1 << p} ELSE 0 END"
    }.mkString("(", " + ", ")")

  // ---- Queries ----------------------------------------------------------

  /** Exact cosine top-k: broadcast the (small) query set against the full
    * corpus — one scan, no shuffle of the corpus side; per-query top-k by
    * ranking window on the (tiny) scored pairs. The correctness baseline
    * every ANN variant is judged against.
    */
  val qCosineTopk = QueryDef(
    "q_cosine_topk",
    (s, dir) => {
      val base = quantized(s, dir)
      val qs = base.filter(col("vec_id") < NQueries)
        .select(col("vec_id").as("query_id"), col("v").as("qv"), col("n2").as("qn2"))
      val scored = base.join(broadcast(qs), col("vec_id") =!= col("query_id"))
        .select(col("query_id"), col("vec_id"),
          cosine(dot(col("qv"), col("v")), col("qn2"), col("n2")).as("cosine"))
      val w = Window.partitionBy(col("query_id"))
        .orderBy(col("cosine").desc, col("vec_id"))
      scored.withColumn("rk", row_number().over(w).cast("long"))
        .filter(col("rk") <= TopK)
        .select(col("query_id"), col("rk"), col("vec_id"), col("cosine"))
        .orderBy(col("query_id"), col("rk"))
    },
    Some(s"""
      WITH base AS ($quantizedSql),
      n AS (SELECT vec_id, v, $n2Sql AS n2 FROM base),
      scored AS (
        SELECT q.vec_id AS query_id, c.vec_id,
               ${cosineSql(dotSql("q.v", "c.v"), "q.n2", "c.n2")} AS cosine
        FROM n q JOIN n c ON q.vec_id < $NQueries AND c.vec_id <> q.vec_id)
      SELECT query_id, rk, vec_id, cosine FROM (
        SELECT *, row_number() OVER (
          PARTITION BY query_id ORDER BY cosine DESC, vec_id) AS rk
        FROM scored)
      WHERE rk <= $TopK ORDER BY query_id, rk"""))

  /** LSH-bucketed ANN top-k: random-hyperplane sign bits put each vector
    * in one of 2^NPlanes buckets; candidates are ONLY the query's bucket
    * (equi-join on the bucket key). At 100 TB the bucket column is the
    * partition key — each query touches 1/2^b of the corpus, trading
    * recall (vs [[qCosineTopk]]) for a corpus-scan-free plan. Recall of
    * this variant vs the exact baseline is asserted in the test suite.
    */
  val qAnnLshTopk = QueryDef(
    "q_ann_lsh_topk",
    (s, dir) => {
      val base = quantized(s, dir).withColumn("bucket", bucket(col("v")))
      val qs = base.filter(col("vec_id") < NQueries)
        .select(col("vec_id").as("query_id"), col("v").as("qv"),
          col("n2").as("qn2"), col("bucket"))
      val scored = base.join(broadcast(qs), Seq("bucket"))
        .filter(col("vec_id") =!= col("query_id"))
        .select(col("query_id"), col("vec_id"),
          cosine(dot(col("qv"), col("v")), col("qn2"), col("n2")).as("cosine"))
      val w = Window.partitionBy(col("query_id"))
        .orderBy(col("cosine").desc, col("vec_id"))
      scored.withColumn("rk", row_number().over(w).cast("long"))
        .filter(col("rk") <= TopK)
        .select(col("query_id"), col("rk"), col("vec_id"), col("cosine"))
        .orderBy(col("query_id"), col("rk"))
    },
    Some(s"""
      WITH base AS ($quantizedSql),
      n AS (SELECT vec_id, v, $n2Sql AS n2, $bucketSql AS bucket FROM base),
      scored AS (
        SELECT q.vec_id AS query_id, c.vec_id,
               ${cosineSql(dotSql("q.v", "c.v"), "q.n2", "c.n2")} AS cosine
        FROM n q JOIN n c ON q.bucket = c.bucket AND q.vec_id < $NQueries
                          AND c.vec_id <> q.vec_id)
      SELECT query_id, rk, vec_id, cosine FROM (
        SELECT *, row_number() OVER (
          PARTITION BY query_id ORDER BY cosine DESC, vec_id) AS rk
        FROM scored)
      WHERE rk <= $TopK ORDER BY query_id, rk"""))

  /** IVF-flat ANN top-k: the corpus is PARTITIONED into inverted lists
    * by nearest centroid; a query probes only its own centroid's list.
    * Centroids here are deterministic seeds (the first ceil(sqrt(N))
    * vectors) so the oracle can mirror them — a production build would
    * k-means-train them; the partition/probe machinery (the scale part)
    * is identical. Complements [[qAnnLshTopk]]: IVF gives data-adaptive
    * cells, LSH gives constant-time hashing.
    */

  /** Corpus → nearest-seed-centroid assignment (vec_id, v, n2, cent_id)
    * — shared by the IVF probe and the centroid-update step.
    */
  /** Centroid count scaled to the corpus: ceil(sqrt(N)) — the standard
    * IVF sizing law. A FIXED count saturates recall as the corpus grows
    * (measured in round 14: 16 centroids held 0.79 recall@3 at 2k
    * vectors but plateaued at 0.58 at 20k regardless of nprobe — the
    * cells get so populous that PQ ordering error inside them swamps
    * the shortlist). The count(*) is one footer-stats job, cached per
    * (session, dir); the SQL mirror computes the identical threshold
    * with a scalar subquery, so hash parity holds at every scale.
    */
  private val centCountCache = new graft.engine.SessionKeyedCache[Long]
  private def nCentroids(s: SparkSession, dir: String): Long =
    centCountCache.getOrElseUpdate(s, s"ncent:$dir",
      graft.engine.SessionKeyedCache.fileFingerprint(
        s, s"$dir/embeddings.parquet"))(
      math.ceil(math.sqrt(
        t(s, dir, "embeddings").count().toDouble)).toLong)

  // ---- persisted IVF-PQ index fixture (round 15) ---------------------

  /** The registered ANN probes read a PERSISTED index
    * ([[graft.engine.AnnIndex]]): four manifest-managed tables built
    * ONCE from the first ⌈2N/3⌉ vectors of the corpus, then the
    * remaining third appended to the source and folded in by the
    * bookmark-driven [[graft.engine.AnnIndex.refresh]] — so every probe
    * also proves the incremental-maintenance path, and the probe plans
    * provably scan the index tables, never the raw embeddings
    * (AnnIndexSpec pins that with an inputFiles assertion).
    */
  private[graft] val IdxSpec = graft.engine.AnnIndex.Spec(Dim, 8, 16)
  private val idxOnce = new graft.engine.SessionKeyedCache[String]
  private[graft] def ivfIndexRoot(s: SparkSession, dir: String): String =
    idxOnce.getOrElseUpdate(s, s"annidx:$dir",
      graft.engine.SessionKeyedCache.fileFingerprint(
        s, s"$dir/embeddings.parquet"))({
      val root = s"${System.getProperty("java.io.tmpdir")}/graft_annidx_" +
        s"${s.sparkContext.applicationId}_${Integer.toHexString(dir.hashCode)}"
      val fs = new org.apache.hadoop.fs.Path(root)
        .getFileSystem(s.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(root), true)
      val srcPath = s"$root/source"
      val base = quantized(s, dir)
      // contiguous low/high split: vec_ids are dense 0..N-1, so the
      // build slice ⌈2N/3⌉ keeps the deterministic seed set (lowest
      // ids) identical in kind to the corpus-wide rule — the refresh
      // batch only grows the inverted lists, exactly like production
      // appends against a trained index
      val splitAt = {
        val n = base.count()
        (2 * n + 2) / 3
      }
      graft.engine.Upsert.append(s, srcPath,
        base.filter(col("vec_id") < splitAt), None)
      graft.engine.AnnIndex.buildIvfPq(s, srcPath, s"$root/ivfpq", IdxSpec)
      graft.engine.Upsert.append(s, srcPath,
        base.filter(col("vec_id") >= splitAt), None)
      graft.engine.AnnIndex.refresh(s, srcPath, s"$root/ivfpq")
      s"$root/ivfpq"
    })

  /** One k-medoids-flavoured Lloyd round of the build's centroid
    * train, as DuckDB CTEs (round 16, the mirror of
    * [[graft.engine.AnnIndex]].lloydRound): assign the build slice `a`
    * to the nearest round-`i-1` centroid (cosine, ties to the lower
    * cent_id — identical to the probe rule), exact integer per-cell
    * component sums, then re-seat each cell on the member maximizing
    * `dot(v, sv) / √n2` (cosine to the cell's sum direction — the
    * sum's own norm is a per-cell constant, so it cancels from the
    * ranking), ties to the lower vec_id. Centroids stay DATA POINTS
    * (cn2 = the member's own n2): all integer math, one fixed IEEE
    * double chain for the ranking — hash parity by construction.
    * Emits `cent_s$i(cent_id, cv, cn2)`.
    */
  private def lloydRoundSql(i: Int): String = s"""
      asg_l$i AS (
        SELECT vec_id, v, n2, cent_id FROM (
          SELECT r.vec_id, r.v, r.n2, c.cent_id,
                 row_number() OVER (PARTITION BY r.vec_id ORDER BY
                   ${cosineSql(dotSql("r.v", "c.cv"), "r.n2", "c.cn2")} DESC,
                   c.cent_id) AS rk
          FROM a r, cent_s${i - 1} c)
        WHERE rk = 1),
      flat_l$i AS (
        SELECT cent_id, CAST(generate_subscripts(v, 1) AS BIGINT) AS dim,
               unnest(v) AS val
        FROM asg_l$i),
      sums_l$i AS (
        SELECT cent_id, dim, CAST(sum(val) AS BIGINT) AS s
        FROM flat_l$i GROUP BY cent_id, dim),
      svec_l$i AS (
        SELECT cent_id, list(s ORDER BY dim) AS sv
        FROM sums_l$i GROUP BY cent_id),
      cent_s$i AS (
        SELECT cent_id, v AS cv, n2 AS cn2 FROM (
          SELECT g.cent_id, g.v, g.n2, g.vec_id,
                 row_number() OVER (PARTITION BY g.cent_id ORDER BY
                   CAST(${dotSql("g.v", "s.sv")} AS DOUBLE) /
                     sqrt(CAST(g.n2 AS DOUBLE)) DESC,
                   g.vec_id) AS rk
          FROM asg_l$i g JOIN svec_l$i s USING (cent_id))
        WHERE rk = 1)"""

  /** SQL mirror of the PERSISTED index content: seeds = the lowest
    * ⌈√|A|⌉ vec_ids of the build slice A, k-means-refined by
    * [[lloydRoundSql]] × `IdxSpec.lloyd` (round 16) and frozen through
    * the refresh; every vector — build batch and refresh batch alike —
    * assigned by the same nearest-centroid rule. CTE chain ending in
    * `assigned(vec_id, v, n2, cent_id)`; also exposes `n` (all
    * vectors), `a` (build slice) and `cent` (the FROZEN trained
    * centroids).
    */
  private val persistedAssignedSql: String = s"""
      base AS ($quantizedSql),
      n AS (SELECT vec_id, v, $n2Sql AS n2 FROM base),
      a AS (SELECT * FROM n
            WHERE vec_id < (SELECT (2 * count(*) + 2) // 3 FROM n)),
      cent_s0 AS (
        SELECT vec_id AS cent_id, v AS cv, n2 AS cn2 FROM a
        WHERE vec_id <
          (SELECT CAST(ceil(sqrt(count(*))) AS BIGINT) FROM a)),
      ${(1 to IdxSpec.lloyd).map(lloydRoundSql).mkString(",\n")}${
        if (IdxSpec.lloyd > 0) "," else ""}
      cent AS (SELECT cent_id, cv, cn2 FROM cent_s${IdxSpec.lloyd}),
      assigned AS (
        SELECT vec_id, v, n2, cent_id FROM (
          SELECT n.vec_id, n.v, n.n2, cent.cent_id,
                 row_number() OVER (PARTITION BY n.vec_id ORDER BY
                   ${cosineSql(dotSql("n.v", "cent.cv"), "n.n2", "cent.cn2")} DESC,
                   cent.cent_id) AS rk
          FROM n, cent)
        WHERE rk = 1)"""

  private def ivfAssigned(s: SparkSession, dir: String): DataFrame = {
    val base = quantized(s, dir)
    val cent = base.filter(col("vec_id") < lit(nCentroids(s, dir)))
      .select(col("vec_id").as("cent_id"), col("v").as("cv"), col("n2").as("cn2"))
    val assignW = Window.partitionBy(col("vec_id"))
      .orderBy(col("ccos").desc, col("cent_id"))
    base.crossJoin(broadcast(cent))
      .select(col("vec_id"), col("v"), col("n2"), col("cent_id"),
        cosine(dot(col("v"), col("cv")), col("n2"), col("cn2")).as("ccos"))
      .withColumn("rk", row_number().over(assignW))
      .filter(col("rk") === 1)
      .select(col("vec_id"), col("v"), col("n2"), col("cent_id"))
  }

  /** SQL mirror of [[ivfAssigned]] — CTE chain ending in
    * `assigned(vec_id, v, n2, cent_id)`. No leading WITH.
    */
  private val ivfAssignedSql: String = s"""
      base AS ($quantizedSql),
      n AS (SELECT vec_id, v, $n2Sql AS n2 FROM base),
      cent AS (SELECT vec_id AS cent_id, v AS cv, n2 AS cn2 FROM n
               WHERE vec_id <
                 (SELECT CAST(ceil(sqrt(count(*))) AS BIGINT) FROM n)),
      assigned AS (
        SELECT vec_id, v, n2, cent_id FROM (
          SELECT n.vec_id, n.v, n.n2, cent.cent_id,
                 row_number() OVER (PARTITION BY n.vec_id ORDER BY
                   ${cosineSql(dotSql("n.v", "cent.cv"), "n.n2", "cent.cn2")} DESC,
                   cent.cent_id) AS rk
          FROM n, cent)
        WHERE rk = 1)"""

  val qAnnIvfTopk = QueryDef(
    "q_ann_ivf_topk",
    (s, dir) => {
      // probe the PERSISTED inverted lists (round 15): the only scan is
      // the index's assignments table — queries pull their own cell,
      // candidates come through the cent_id equi-join, never a corpus
      // scan. At 100 TB the assignments table is cent_id-clusterable
      // and the probe prunes to the queried cells.
      val root = ivfIndexRoot(s, dir)
      val assigned = graft.engine.Manifest.read(s,
        graft.engine.AnnIndex.assignmentsPath(root))
      val qs = assigned.filter(col("vec_id") < NQueries)
        .select(col("vec_id").as("query_id"), col("v").as("qv"),
          col("n2").as("qn2"), col("cent_id"))
      val scored = assigned.join(broadcast(qs), Seq("cent_id"))
        .filter(col("vec_id") =!= col("query_id"))
        .select(col("query_id"), col("vec_id"),
          cosine(dot(col("qv"), col("v")), col("qn2"), col("n2")).as("cosine"))
      val w = Window.partitionBy(col("query_id"))
        .orderBy(col("cosine").desc, col("vec_id"))
      scored.withColumn("rk", row_number().over(w).cast("long"))
        .filter(col("rk") <= TopK)
        .select(col("query_id"), col("rk"), col("vec_id"), col("cosine"))
        .orderBy(col("query_id"), col("rk"))
    },
    Some(s"""
      WITH $persistedAssignedSql,
      q AS (SELECT vec_id AS query_id, v AS qv, n2 AS qn2, cent_id
            FROM assigned WHERE vec_id < $NQueries),
      scored AS (
        SELECT q.query_id, c.vec_id,
               ${cosineSql(dotSql("q.qv", "c.v"), "q.qn2", "c.n2")} AS cosine
        FROM assigned c JOIN q ON c.cent_id = q.cent_id
                             AND c.vec_id <> q.query_id)
      SELECT query_id, rk, vec_id, cosine FROM (
        SELECT *, row_number() OVER (
          PARTITION BY query_id ORDER BY cosine DESC, vec_id) AS rk
        FROM scored)
      WHERE rk <= $TopK ORDER BY query_id, rk"""))

  /** Embedding-cosine near-dup pairs, LSH-blocked: pairs are generated
    * only within a bucket (the banded design again — the all-pairs
    * variant is exactly what a 100 TB pipeline must never run).
    */
  val qEmbeddingNeardup = QueryDef(
    "q_embedding_neardup",
    (s, dir) => {
      val base = quantized(s, dir).withColumn("bucket", bucket(col("v")))
      val a = base.select(col("bucket"), col("vec_id").as("vec_a"),
        col("v").as("va"), col("n2").as("na"))
      val b = base.select(col("bucket"), col("vec_id").as("vec_b"),
        col("v").as("vb"), col("n2").as("nb"))
      a.join(b, Seq("bucket"))
        .filter(col("vec_a") < col("vec_b"))
        .select(col("vec_a"), col("vec_b"),
          cosine(dot(col("va"), col("vb")), col("na"), col("nb")).as("cosine"))
        .filter(col("cosine") >= 0.3)
        .orderBy(col("vec_a"), col("vec_b"))
    },
    Some(s"""
      WITH base AS ($quantizedSql),
      n AS (SELECT vec_id, v, $n2Sql AS n2, $bucketSql AS bucket FROM base)
      SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
             ${cosineSql(dotSql("a.v", "b.v"), "a.n2", "b.n2")} AS cosine
      FROM n a JOIN n b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
      WHERE ${cosineSql(dotSql("a.v", "b.v"), "a.n2", "b.n2")} >= 0.3
      ORDER BY vec_a, vec_b"""))

  /** One Lloyd iteration of IVF/k-means centroid training: element-wise
    * sum + count per cell via the typed [[graft.functions.VectorSumAgg]]
    * UDAF, final means as exact-int/int division in double. The shuffle
    * carries ONE packed array per (cell, partition) — map-side combine,
    * no 64× dimension explosion (the built-in route the oracle mirrors).
    * Output is flattened to (cent_id, dim) rows only for the tiny
    * 16×64 result.
    */
  val qIvfCentroids = QueryDef(
    "q_ivf_centroids",
    (s, dir) => ivfAssigned(s, dir)
      .groupBy(col("cent_id"))
      .agg(graft.functions.VectorSumAgg(col("v")).as("sv"),
        count(lit(1)).as("n_members"))
      .select(col("cent_id"), col("n_members"),
        posexplode(col("sv")).as(Seq("pos", "sum_q")))
      .select(col("cent_id"), (col("pos") + 1).cast("long").as("dim"),
        col("sum_q"), col("n_members"),
        (col("sum_q").cast("double") / col("n_members")).as("mean_q"))
      .orderBy(col("cent_id"), col("dim")),
    Some(s"""
      WITH $ivfAssignedSql,
      flat AS (
        SELECT cent_id, CAST(generate_subscripts(v, 1) AS BIGINT) AS dim,
               unnest(v) AS val
        FROM assigned),
      cells AS (SELECT cent_id, count(*) AS n_members
                FROM assigned GROUP BY cent_id)
      SELECT f.cent_id, f.dim, CAST(sum(f.val) AS BIGINT) AS sum_q,
             c.n_members,
             CAST(CAST(sum(f.val) AS BIGINT) AS DOUBLE) / c.n_members AS mean_q
      FROM flat f JOIN cells c USING (cent_id)
      GROUP BY f.cent_id, f.dim, c.n_members
      ORDER BY cent_id, dim"""))

  /** Int8 max-abs quantization of the embedding column — the standard
    * 4× memory/IO cut before an ANN index is built at corpus scale
    * (float32 → int8 per dimension, one scale per vector). All in exact
    * integer math over the 1e6-quantized components: q_i = sign(x_i) ·
    * (|x_i|·127 div amax) with truncating division — identical on both
    * engines for non-negative operands — and the reconstruction error
    * |127·x_i − q_i·amax| stays a BIGINT until the single final
    * division, so the output hash pins the whole quantize/dequantize
    * round trip, not a float approximation of it.
    *
    * Shape: posexplode → per-vector hash aggregate (amax) → join back on
    * vec_id → final hash aggregate. Two shuffles, both keyed on the
    * data-scaled vec_id — embarrassingly parallel at 100 TB. (A
    * higher-order-function formulation would avoid the explode shuffle
    * but drops out of whole-stage codegen — measured 4× slower on array
    * math here; see SURVEY §7.5.)
    */
  val qEmbedQuantize = QueryDef(
    "q_embed_quantize",
    (s, dir) => {
      val base = t(s, dir, "embeddings")
        .select(col("vec_id"), posexplode(col("embedding")).as(Seq("pos", "x")))
        .select(col("vec_id"),
          floor(col("x").cast("double") * 1e6).cast("bigint").as("a"))
      val g = base.groupBy(col("vec_id"))
        .agg(max(abs(col("a"))).as("amax"), count(lit(1)).as("n_dims"))
      val q = (when(col("a") < 0, -1L).otherwise(1L) *
        call_function("div", abs(col("a")) * 127, greatest(col("amax"), lit(1L))))
        .as("q")
      base.join(g, Seq("vec_id"))
        .select(col("vec_id"), col("a"), col("amax"), col("n_dims"), q)
        .groupBy(col("vec_id"))
        .agg(max(col("n_dims")).as("n_dims"),
          min(col("q")).as("q_min"), max(col("q")).as("q_max"),
          (sum(abs(col("a") * 127 - col("q") * col("amax"))).cast("double") /
            (lit(127000000.0) * max(col("n_dims")).cast("double")))
            .as("mean_abs_err"))
        .orderBy(col("vec_id"))
    },
    Some("""
      WITH base AS (
        SELECT vec_id, CAST(floor(CAST(x AS DOUBLE) * 1000000) AS BIGINT) AS a
        FROM (SELECT vec_id, unnest(embedding) AS x FROM embeddings)),
      g AS (SELECT vec_id, max(abs(a)) AS amax, count(*) AS n_dims
            FROM base GROUP BY 1),
      j AS (SELECT b.vec_id, a, amax, n_dims,
                   (CASE WHEN a < 0 THEN -1 ELSE 1 END)
                     * ((abs(a) * 127) // greatest(amax, 1)) AS q
            FROM base b JOIN g USING (vec_id))
      SELECT vec_id, max(n_dims) AS n_dims,
             min(q) AS q_min, max(q) AS q_max,
             CAST(CAST(SUM(abs(a * 127 - q * amax)) AS BIGINT) AS DOUBLE)
               / (127000000.0 * CAST(max(n_dims) AS DOUBLE)) AS mean_abs_err
      FROM j GROUP BY vec_id ORDER BY vec_id"""))

  /** Product-quantization code assignment: the 64-dim vector splits
    * into M = 4 subspaces of 16 dims; per subspace a K = 8 codebook
    * (deterministic init: the subvectors of vec_id 0..7, the standard
    * seeding before Lloyd refinement — q_ivf_centroids is the
    * refinement step) and each vector's subvector maps to its nearest
    * centroid by EXACT integer L2, via ‖a−b‖² = n²(a) + n²(b) − 2·a·b
    * with the codegen'd [[graft.functions.LongArrayDot]]. Output is the
    * (vec_id, subspace, code) assignment plus its distortion — 4 codes
    * ≈ 4 bytes per vector, the 64× compression an IVF-PQ index stores.
    *
    * Scale: the codebook is M·K tiny rows → broadcast; assignment is
    * one scan of the corpus with K distance evaluations per subspace
    * (a map-side loop, no shuffle of the vectors); the argmin is a
    * WindowGroupLimit-shaped rank-1 filter keyed on the vector itself.
    * Ties break on code — deterministic on both engines.
    */
  val qPqCodes = QueryDef(
    "q_pq_codes",
    (s, dir) => {
      val M = 4
      val Sub = Dim / M
      val base = quantized(s, dir)
      val subs = base.select(col("vec_id"),
        explode(array((0 until M).map(m => struct(lit(m.toLong).as("m"),
          slice(col("v"), m * Sub + 1, Sub).as("sub"))): _*)).as("e"))
        .select(col("vec_id"), col("e.m").as("m"), col("e.sub").as("sub"))
        .withColumn("sn2", dot(col("sub"), col("sub")))
      val cents = subs.filter(col("vec_id") < 8)
        .select(col("m"), col("vec_id").as("code"), col("sub").as("csub"),
          col("sn2").as("cn2"))
      subs.join(broadcast(cents), Seq("m"))
        .withColumn("d2",
          col("sn2") + col("cn2") - lit(2L) * dot(col("sub"), col("csub")))
        .withColumn("rn", row_number().over(
          Window.partitionBy(col("vec_id"), col("m"))
            .orderBy(col("d2"), col("code"))))
        .filter(col("rn") === 1)
        .select(col("vec_id"), col("m"), col("code"), col("d2"))
        .orderBy(col("vec_id"), col("m"))
    },
    Some(s"""
      WITH base AS ($quantizedSql),
      subs AS (
        SELECT vec_id, m,
               list_slice(v, m * ${Dim / 4} + 1, (m + 1) * ${Dim / 4}) AS sub
        FROM base, (SELECT unnest([0, 1, 2, 3]) AS m)),
      n AS (
        SELECT vec_id, CAST(m AS BIGINT) AS m, sub,
               CAST(list_sum([x * x for x in sub]) AS BIGINT) AS sn2
        FROM subs),
      cents AS (
        SELECT m, vec_id AS code, sub AS csub, sn2 AS cn2
        FROM n WHERE vec_id < 8),
      scored AS (
        SELECT s.vec_id, s.m, c.code,
               s.sn2 + c.cn2 - 2 * ${dotSql("s.sub", "c.csub")} AS d2
        FROM n s JOIN cents c USING (m)),
      ranked AS (
        SELECT vec_id, m, code, d2,
               row_number() OVER (PARTITION BY vec_id, m
                                  ORDER BY d2, code) AS rn
        FROM scored)
      SELECT vec_id, m, code, d2 FROM ranked WHERE rn = 1
      ORDER BY vec_id, m"""))

  /** Shortlist size of the PQ candidate stage — larger than TopK so the
    * exact rerank has slack to repair PQ's quantization error.
    */
  private val PqShortlist = 64

  /** IVF-PQ codebook size per subspace (round 13: 8 → 16, halving the
    * per-subspace quantization cells' diameter) and the query-side
    * MULTIPROBE width: each query scans its 2 nearest cells' inverted
    * lists instead of 1. Coarse-probe loss dominates IVF recall — a
    * true neighbor sitting just across a Voronoi boundary is invisible
    * to a 1-probe scan no matter how exact the rerank — so probing 2 of
    * ceil(sqrt(N)) cells roughly doubles candidate coverage at 2× the
    * (still cell-local) scan cost: the standard nprobe/recall dial of
    * every IVF deployment, here at its smallest useful setting.
    * Measured at sf0.001 in LshRecallSpec: recall@3 0.625 → ≥ 0.8.
    */
  private val PqK = 16
  private val IvfProbes = 2

  /** IVF-PQ composed ANN (round-10 verdict item 4): the three-stage
    * shape every billion-vector pipeline actually runs, built from the
    * engine's existing pieces —
    *
    *   1. COARSE PROBE, MULTIPROBE 2 (round 13): a query scans the
    *      inverted lists of its [[IvfProbes]] nearest cells — never
    *      the corpus; the corpus stays 1-cell-assigned
    *      ([[ivfAssigned]]).
    *   2. ASYMMETRIC PQ SCAN: cell members are represented by their
    *      M=8 × K=16 product-quantization codes (finer than the
    *      q_pq_codes teaching assignment, which stays at M=4 × K=8);
    *      each query precomputes a tiny LUT of exact integer L2
    *      distances to every (subspace, codeword) — 128 rows per
    *      query — and a member's approximate distance is the SUM of
    *      M LUT lookups. At index scale this replaces a 64-dim float
    *      scan with 8 byte-indexed adds per candidate; here the LUT
    *      join is a broadcast and the sum a map-side-combined aggregate
    *      keyed on (query, vec) — no shuffle of the vectors.
    *   3. EXACT RERANK: the [[PqShortlist]] best PQ candidates per
    *      query re-score with the full-precision cosine and the TopK
    *      survive — the standard repair for PQ distortion.
    *
    * Everything is exact integer math until the final cosine, so the
    * DuckDB oracle mirrors all three stages bit-for-bit (pq_d2 rides
    * into the output to pin stage 2, not just the reranked ranks).
    * Recall vs the exact scan is measured in LshRecallSpec alongside
    * the LSH and IVF-flat variants.
    */
  val qAnnIvfpqTopk = QueryDef(
    "q_ann_ivfpq_topk",
    (s, dir) => ivfpqTopkDf(s, dir, IvfProbes),
    ivfpqOracle)

  /** The IVF-PQ pipeline with the MULTIPROBE WIDTH as a parameter — the
    * registered query pins `probes = IvfProbes`; LshRecallSpec sweeps
    * this dial to measure the recall-vs-nprobe curve recorded in
    * SCALE.md (round-14 verdict item 7).
    */
  private[graft] def ivfpqTopkDf(s: SparkSession, dir: String,
      nprobe: Int): DataFrame =
    ivfpqTopkFromRoot(s, ivfIndexRoot(s, dir), nprobe)

  /** The IVF-PQ probe pipeline against ANY index root — the seam the
    * recall-baseline comparison (LshRecallSpec round 16) probes
    * alternative builds (e.g. lloyd = 0) through.
    */
  private[graft] def ivfpqTopkFromRoot(s: SparkSession, root: String,
      nprobe: Int): DataFrame = {
      val M = IdxSpec.m
      val Sub = IdxSpec.sub
      // every stage reads the PERSISTED index tables (round 15): the
      // inverted lists, the PQ codes, the frozen codebooks, and the
      // frozen coarse centroids — the raw embeddings are never scanned
      val assigned = graft.engine.Manifest.read(s,
        graft.engine.AnnIndex.assignmentsPath(root))
      val codes = graft.engine.Manifest.read(s,
        graft.engine.AnnIndex.codesPath(root))
      val cents = graft.engine.Manifest.read(s,
        graft.engine.AnnIndex.codebooksPath(root))
      val coarse = graft.engine.Manifest.read(s,
        graft.engine.AnnIndex.centroidsPath(root))
      val qvecs = assigned.filter(col("vec_id") < NQueries)
      val qs = qvecs
        .select(col("vec_id").as("query_id"), col("v").as("qv"),
          col("n2").as("qn2"))
      // MULTIPROBE: each query's nprobe nearest cells, not just its
      // own — the corpus stays 1-cell-assigned; only the probe widens
      val probes = qvecs.select(col("vec_id"), col("v"), col("n2"))
        .crossJoin(broadcast(coarse.select(col("cent_id"), col("cv"),
          col("cn2").as("cn2c"))))
        .select(col("vec_id").as("query_id"), col("cent_id"),
          cosine(dot(col("v"), col("cv")), col("n2"), col("cn2c"))
            .as("ccos"))
        .withColumn("prk", row_number().over(
          Window.partitionBy(col("query_id"))
            .orderBy(col("ccos").desc, col("cent_id"))))
        .filter(col("prk") <= nprobe)
        .select(col("query_id"), col("cent_id"))
      // the 8-query LUT: query subvectors (sliced on the fly from the
      // index row) × frozen codebooks — M×K exact distances per query
      val qsubs = qvecs.select(col("vec_id"),
        explode(array((0 until M).map(m => struct(lit(m.toLong).as("m"),
          slice(col("v"), m * Sub + 1, Sub).as("sub"))): _*)).as("e"))
        .select(col("vec_id"), col("e.m").as("m"), col("e.sub").as("sub"))
        .withColumn("sn2", dot(col("sub"), col("sub")))
      val lut = qsubs
        .select(col("vec_id").as("query_id"), col("m"),
          col("sub").as("qsub"), col("sn2").as("qsn2"))
        .join(cents, Seq("m"))
        .select(col("query_id"), col("m"), col("code"),
          (col("qsn2") + col("cn2") - lit(2L) * dot(col("qsub"), col("csub")))
            .as("lut_d2"))
      // probes descend from the same assignments scan as the list side
      // — rename the probe key so the equi-join is unambiguous
      val cand = assigned.select(col("vec_id"), col("cent_id"))
        .join(broadcast(probes.select(col("query_id"),
          col("cent_id").as("__probe_cent"))),
          col("cent_id") === col("__probe_cent"))
        .drop("__probe_cent")
        .filter(col("vec_id") =!= col("query_id"))
        .join(codes, Seq("vec_id"))
        .join(broadcast(lut), Seq("query_id", "m", "code"))
        .groupBy(col("query_id"), col("vec_id"))
        .agg(sum(col("lut_d2")).as("pq_d2"))
      val short = cand.withColumn("crk", row_number().over(
          Window.partitionBy(col("query_id"))
            .orderBy(col("pq_d2"), col("vec_id"))))
        // shortlist scales WITH the probe width (PqShortlist/IvfProbes
        // = 32 per probed cell, so it equals the oracle's constant at
        // the registered nprobe): with a FIXED shortlist, widening the
        // probe floods the rerank with PQ-approximate imposters from
        // the extra cells and recall DROPS as nprobe rises — measured
        // at sf0.1 in round 14 (0.833@1 → 0.667@4) before this scaling
        .filter(col("crk") <= lit(PqShortlist / IvfProbes * nprobe))
        .select(col("query_id"), col("vec_id"), col("pq_d2"))
      short
        .join(assigned.select(col("vec_id"), col("v"), col("n2")),
          Seq("vec_id"))
        .join(broadcast(qs.select(col("query_id"), col("qv"), col("qn2"))),
          Seq("query_id"))
        .select(col("query_id"), col("vec_id"), col("pq_d2"),
          cosine(dot(col("qv"), col("v")), col("qn2"), col("n2")).as("cosine"))
        .withColumn("rk", row_number().over(
          Window.partitionBy(col("query_id"))
            .orderBy(col("cosine").desc, col("vec_id"))).cast("long"))
        .filter(col("rk") <= TopK)
        .select(col("query_id"), col("rk"), col("vec_id"), col("pq_d2"),
          col("cosine"))
        .orderBy(col("query_id"), col("rk"))
  }

  private def ivfpqOracle: Option[String] =
    Some(s"""
      WITH $persistedAssignedSql,
      subs AS (
        SELECT vec_id, CAST(m AS BIGINT) AS m,
               list_slice(v, m * ${Dim / 8} + 1, (m + 1) * ${Dim / 8}) AS sub
        FROM assigned, (SELECT unnest([0, 1, 2, 3, 4, 5, 6, 7]) AS m)),
      sn AS (
        SELECT vec_id, m, sub,
               CAST(list_sum([x * x for x in sub]) AS BIGINT) AS sn2
        FROM subs),
      cents AS (
        -- frozen PQ codebooks: the lowest PqK vec_ids of the BUILD
        -- slice — ids are dense from 0, so that is vec_id < PqK
        SELECT m, vec_id AS code, sub AS csub, sn2 AS cn2
        FROM sn WHERE vec_id < $PqK),
      codes AS (
        SELECT vec_id, m, code FROM (
          SELECT s.vec_id, s.m, c.code,
                 row_number() OVER (PARTITION BY s.vec_id, s.m ORDER BY
                   s.sn2 + c.cn2 - 2 * ${dotSql("s.sub", "c.csub")}, c.code)
                   AS rn
          FROM sn s JOIN cents c USING (m))
        WHERE rn = 1),
      q AS (SELECT vec_id AS query_id, v AS qv, n2 AS qn2
            FROM assigned WHERE vec_id < $NQueries),
      qp AS (
        SELECT query_id, cent_id FROM (
          SELECT n.vec_id AS query_id, cent.cent_id,
                 row_number() OVER (PARTITION BY n.vec_id ORDER BY
                   ${cosineSql(dotSql("n.v", "cent.cv"), "n.n2", "cent.cn2")}
                     DESC, cent.cent_id) AS prk
          FROM n, cent WHERE n.vec_id < $NQueries)
        WHERE prk <= $IvfProbes),
      lut AS (
        SELECT s.vec_id AS query_id, s.m, c.code,
               s.sn2 + c.cn2 - 2 * ${dotSql("s.sub", "c.csub")} AS lut_d2
        FROM sn s JOIN cents c USING (m) WHERE s.vec_id < $NQueries),
      cand AS (
        SELECT p.query_id, a.vec_id, CAST(SUM(l.lut_d2) AS BIGINT) AS pq_d2
        FROM assigned a
        JOIN qp p ON a.cent_id = p.cent_id AND a.vec_id <> p.query_id
        JOIN codes cd ON cd.vec_id = a.vec_id
        JOIN lut l ON l.query_id = p.query_id AND l.m = cd.m
                  AND l.code = cd.code
        GROUP BY 1, 2),
      short AS (
        SELECT query_id, vec_id, pq_d2 FROM (
          SELECT *, row_number() OVER (PARTITION BY query_id
                                       ORDER BY pq_d2, vec_id) AS crk
          FROM cand)
        WHERE crk <= $PqShortlist),
      rer AS (
        SELECT s.query_id, s.vec_id, s.pq_d2,
               ${cosineSql(dotSql("q.qv", "a.v"), "q.qn2", "a.n2")} AS cosine
        FROM short s JOIN assigned a ON a.vec_id = s.vec_id
                     JOIN q ON q.query_id = s.query_id)
      SELECT query_id, rk, vec_id, pq_d2, cosine FROM (
        SELECT *, row_number() OVER (
          PARTITION BY query_id ORDER BY cosine DESC, vec_id) AS rk
        FROM rer)
      WHERE rk <= $TopK ORDER BY query_id, rk""")

  /** The persisted index AS A TABLE (round 15): per-cell inverted-list
    * sizes and an exact content checksum (Σn2) straight off the
    * assignments table — build batch ∪ refresh batch. A green hash
    * proves the on-disk index content (not just probe results): every
    * vector present exactly once, assigned to the frozen-centroid cell
    * the deterministic rule names, across both maintenance paths.
    */
  val qAnnIndexStats = QueryDef(
    "q_ann_index_stats",
    (s, dir) => {
      val root = ivfIndexRoot(s, dir)
      // staleness (round 17): indexed-now / built-on — the frozen-
      // geometry growth dial ([[graft.engine.AnnIndex.stats]]; the
      // fixture built on ⌈2N/3⌉ and refreshed the rest in, so the exact
      // expected value is N / ⌈2N/3⌉ and the oracle restates it from
      // the same two counts)
      val st = graft.engine.AnnIndex.stats(s, root)
      graft.engine.Manifest.read(s,
        graft.engine.AnnIndex.assignmentsPath(
          graft.engine.AnnIndex.currentRoot(s, root)))
        .groupBy(col("cent_id"))
        .agg(count(lit(1)).as("n_members"),
          sum(col("n2")).cast("long").as("sum_n2"))
        .withColumn("staleness", lit(st.staleness))
        .orderBy(col("cent_id"))
    },
    Some(s"""
      WITH $persistedAssignedSql
      SELECT cent_id, count(*) AS n_members,
             CAST(sum(n2) AS BIGINT) AS sum_n2,
             CAST((SELECT count(*) FROM n) AS DOUBLE) /
               CAST((SELECT count(*) FROM a) AS DOUBLE) AS staleness
      FROM assigned GROUP BY 1 ORDER BY 1"""))

  val all: Seq[QueryDef] = Seq(qCosineTopk, qAnnLshTopk, qAnnIvfTopk,
    qEmbeddingNeardup, qIvfCentroids, qEmbedQuantize, qPqCodes,
    qAnnIvfpqTopk, qAnnIndexStats)
}
