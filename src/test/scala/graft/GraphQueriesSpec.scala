package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.GraphQueries

/** The relational PageRank iteration must agree with a direct reference
  * implementation of the same exact-integer recurrence, and conserve
  * (never inflate) rank mass. The recurrence under test:
  *   share(u)  = pr(u) div outdeg(u)            (truncating)
  *   pr'(v)    = 1.5e11 + (85 · Σ_{u→v} share(u)) div 100
  * with every node seeded 1e12.
  */
class GraphQueriesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val Seed = BigInt("1000000000000")
  private val Base = BigInt("150000000000")

  /** Reference implementation on an adjacency list, BigInt throughout.
    * Mirrors the relational semantics exactly: the state after a round
    * holds only nodes with INCOMING contributions, so a source-only
    * node (out-edges, no in-edges) contributes in round 1 and then
    * leaves the recurrence — the same drop the rank⋈edges join and the
    * oracle's CTE join perform. The fulfillment graph is bidirectional,
    * so production never hits this; the TVF documents it as caller
    * contract.
    */
  private def refPagerank(edges: Seq[(Long, Long)],
      iters: Int): Map[Long, BigInt] = {
    val out = edges.groupBy(_._1).view.mapValues(_.size).toMap
    var pr: Map[Long, BigInt] = out.map { case (n, _) => n -> Seed }
    for (_ <- 1 to iters) {
      // flatMap mirrors the edgesW⋈ranks join: ranked nodes without
      // out-edges (possible in arbitrary digraphs) send nothing
      val shares = pr.flatMap { case (n, r) => out.get(n).map(o => n -> r / o) }
      val in = edges.filter(e => shares.contains(e._1)).groupBy(_._2).view
        .mapValues(_.map(e => shares(e._1)).sum).toMap
      pr = in.map { case (n, m) => n -> (Base + (m * 85) / 100) }
    }
    pr
  }

  private def sparkPagerank(edges: Seq[(Long, Long)],
      iters: Int): Map[Long, BigInt] = {
    val (w, deg) = GraphQueries.weight(edges.toDF("src", "dst"))
    GraphQueries.pagerankIterate(w, deg, iters)
      .collect().map(r => r.getLong(0) -> BigInt(r.getLong(1))).toMap
  }

  // path graph a–b–c (bidirectional), asymmetric degrees
  private val path = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 2L))

  test("matches the reference recurrence on a path graph, 1 and 3 iters") {
    assert(sparkPagerank(path, 1) === refPagerank(path, 1))
    assert(sparkPagerank(path, 3) === refPagerank(path, 3))
  }

  test("matches the reference on a star + cycle graph with hub skew") {
    // hub 10 ← spokes 1..5 (bidirectional) plus a 3-cycle 20→21→22→20
    val spokes = (1L to 5L).flatMap(s => Seq((10L, s), (s, 10L)))
    val cycle = Seq((20L, 21L), (21L, 22L), (22L, 20L))
    val g = spokes ++ cycle
    assert(sparkPagerank(g, 4) === refPagerank(g, 4))
  }

  test("rank mass is conserved up to truncation loss, never inflated") {
    val got = sparkPagerank(path, 3)
    val mass = got.values.sum
    val totalSeed = Seed * got.size
    assert(mass <= totalSeed)
    // truncation loses at most a few units per node per iteration —
    // anything larger means mass leaked through the recurrence
    assert(totalSeed - mass < BigInt(got.size.toLong * 3L * 1000L))
  }

  test("symmetric nodes get identical ranks") {
    val got = sparkPagerank(path, 3)
    assert(got(1L) === got(3L)) // the two path endpoints are isomorphic
  }

  /** Reference BFS (hop distance, capped rounds) on an adjacency list. */
  private def refBfs(edges: Seq[(Long, Long)], seeds: Set[Long],
      rounds: Int): Map[Long, Int] = {
    var dist = seeds.map(_ -> 0).toMap
    for (_ <- 1 to rounds) {
      val relaxed = edges.flatMap { case (s, d) =>
        dist.get(s).map(x => d -> (x + 1))
      }
      dist = (dist.toSeq ++ relaxed).groupBy(_._1).view
        .mapValues(_.map(_._2).min).toMap
    }
    dist
  }

  private def sparkBfs(edges: Seq[(Long, Long)], seeds: Set[Long],
      rounds: Int): Map[Long, Int] =
    GraphQueries.bfsHops(edges.toDF("src", "dst"),
      seeds.toSeq.toDF("node").select(col("node"), lit(0).as("d")), rounds)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap

  test("bfs hop distances match reference; unreached nodes absent") {
    // chain 1–2–3–4–5 (bidirectional) plus isolated pair 8–9
    val chain = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 2L), (3L, 4L),
      (4L, 3L), (4L, 5L), (5L, 4L), (8L, 9L), (9L, 8L))
    val got = sparkBfs(chain, Set(1L), 3)
    assert(got === refBfs(chain, Set(1L), 3))
    assert(got === Map(1L -> 0, 2L -> 1, 3L -> 2, 4L -> 3))
    assert(!got.contains(5L) && !got.contains(8L)) // radius-capped / island
  }

  test("pagerank matches the reference on random graphs (20 seeds)") {
    // random digraphs where every node has outdeg >= 1 (the operator's
    // contract): n in 5..24, each node gets 1..3 out-edges
    for (seed <- 1 to 20) {
      val rnd = new scala.util.Random(seed)
      val n = 5 + rnd.nextInt(20)
      val edges = (0L until n.toLong).flatMap { u =>
        val fanout = 1 + rnd.nextInt(3)
        (1 to fanout).map(_ => u -> rnd.nextInt(n).toLong)
      }
      val iters = 1 + rnd.nextInt(3)
      assert(sparkPagerank(edges, iters) === refPagerank(edges, iters),
        s"seed=$seed n=$n iters=$iters")
    }
  }

  test("bfs matches the reference on random graphs (20 seeds)") {
    for (seed <- 1 to 20) {
      val rnd = new scala.util.Random(100 + seed)
      val n = 5 + rnd.nextInt(20)
      val edges = (0L until n.toLong).flatMap { u =>
        (1 to 1 + rnd.nextInt(2)).map(_ => u -> rnd.nextInt(n).toLong)
      }
      val seeds = Set(rnd.nextInt(n).toLong, rnd.nextInt(n).toLong)
      val rounds = 1 + rnd.nextInt(3)
      assert(sparkBfs(edges, seeds, rounds) === refBfs(edges, seeds, rounds),
        s"seed=$seed n=$n rounds=$rounds")
    }
  }

  /** Reference K-round Bellman-Ford on a weighted adjacency list. */
  private def refRelax(wedges: Seq[(Long, Long, Long)],
      seeds: Map[Long, Long], rounds: Int): Map[Long, Long] = {
    var dist = seeds
    for (_ <- 1 to rounds) {
      val relaxed = wedges.flatMap { case (s, t, w) =>
        dist.get(s).map(x => t -> (x + w))
      }
      dist = (dist.toSeq ++ relaxed).groupBy(_._1).view
        .mapValues(_.map(_._2).min).toMap
    }
    dist
  }

  private def sparkRelax(wedges: Seq[(Long, Long, Long)],
      seeds: Map[Long, Long], rounds: Int): Map[Long, Long] = {
    val w = wedges.toDF("src", "dst", "w")
    val seedsDf = seeds.toSeq.toDF("node", "d")
    val nodes = w.select(col("src").as("node"))
      .unionByName(w.select(col("dst").as("node")))
      .unionByName(seedsDf.select(col("node")))
      .distinct()
    GraphQueries.relaxRounds(GraphQueries.withLoops(w, nodes),
      seedsDf, rounds)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("weighted relaxation: a 2-edge detour beats a direct expensive edge") {
    val g = Seq((1L, 2L, 10L), (1L, 3L, 1L), (3L, 2L, 2L))
    assert(sparkRelax(g, Map(1L -> 0L), 1) ===
      Map(1L -> 0L, 2L -> 10L, 3L -> 1L)) // detour not yet visible
    assert(sparkRelax(g, Map(1L -> 0L), 2) ===
      Map(1L -> 0L, 2L -> 3L, 3L -> 1L))  // 1→3→2 = 3 wins
    assert(sparkRelax(g, Map(1L -> 0L), 2) === refRelax(g, Map(1L -> 0L), 2))
  }

  test("weighted relaxation matches reference on random graphs (15 seeds)") {
    for (seed <- 1 to 15) {
      val rnd = new scala.util.Random(200 + seed)
      val n = 5 + rnd.nextInt(15)
      val g = (0L until n.toLong).flatMap { u =>
        (1 to 1 + rnd.nextInt(2)).map(_ =>
          (u, rnd.nextInt(n).toLong, rnd.nextInt(20).toLong))
      }
      val seeds = Map(rnd.nextInt(n).toLong -> 0L)
      val rounds = 1 + rnd.nextInt(3)
      assert(sparkRelax(g, seeds, rounds) === refRelax(g, seeds, rounds),
        s"seed=$seed n=$n rounds=$rounds")
    }
  }

  test("bfs takes the min over multiple seeds and converging paths") {
    val g = Seq((1L, 3L), (3L, 1L), (2L, 3L), (3L, 2L), (3L, 4L),
      (4L, 3L), (2L, 4L), (4L, 2L))
    val got = sparkBfs(g, Set(1L, 2L), 3)
    assert(got === refBfs(g, Set(1L, 2L), 3))
    assert(got(4L) === 1) // via seed 2 directly, not 1→3→4
  }

  test("the overflow guard trips loudly when the seed exceeds the BIGINT bound") {
    // 3 sources aiming at one sink, each with outdeg 1, seeded at
    // 4e18: the sink's incoming mass is 1.2e19 > (Long.Max)·100/85
    val g = Seq((1L, 4L), (2L, 4L), (3L, 4L), (4L, 1L))
    val (w, deg) = GraphQueries.weight(g.toDF("src", "dst"))
    val e = intercept[Throwable] {
      GraphQueries.pagerankIterate(w, deg, 1,
        seed = 4_000_000_000_000_000_000L, base = 0L).collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => x.getMessage +: messages(x.getCause))
    assert(messages(e).exists(m => m != null && m.contains("shrink the")),
      s"expected the shrink-the-seed instruction, got: $e")
    // while a custom (smaller) seed passes through the same guard
    val ok = GraphQueries.pagerankIterate(w, deg, 1,
      seed = 1000L, base = 150L).collect()
    assert(ok.nonEmpty)
  }

  test("pagerankConverged stops exactly at tolerance and equals fixed-K there") {
    val tol = 50_000_000_000L
    val (w, deg) = GraphQueries.weight(path.toDF("src", "dst"))
    val (ranks, k) = GraphQueries.pagerankConverged(w, deg, tol)
    val got = ranks.collect().map(r => r.getLong(0) -> BigInt(r.getLong(1))).toMap
    assert(k >= 2 && k < 64, s"k=$k")
    // the converged state IS the fixed-K chain's state at the stop round
    assert(got === sparkPagerank(path, k))
    assert(got === refPagerank(path, k))
    // the stop is exact, not premature or late: the k-1→k move is
    // within tolerance, the k-2→k-1 move is not (reference recurrence)
    def move(a: Map[Long, BigInt], b: Map[Long, BigInt]): BigInt =
      a.map { case (n, v) => (b(n) - v).abs }.max
    assert(move(refPagerank(path, k - 1), refPagerank(path, k)) <= BigInt(tol))
    assert(move(refPagerank(path, k - 2), refPagerank(path, k - 1)) > BigInt(tol))
  }

  /** Reference min-label components by union-find (path halving,
    * min-root union) — an independent third implementation next to the
    * pointer-doubling propagation and the fixed-K relaxation.
    */
  private def refComponents(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      var r = x
      while (parent(r) != r) { parent(r) = parent(parent(r)); r = parent(r) }
      r
    }
    edges.foreach { case (a, b) =>
      parent.getOrElseUpdate(a, a); parent.getOrElseUpdate(b, b)
      val ra = find(a); val rb = find(b)
      if (ra != rb) { if (ra < rb) parent(rb) = ra else parent(ra) = rb }
    }
    parent.keys.map(n => n -> find(n)).toMap
  }

  // Round-18 loop internals (fused 1-hop init; union+agg propagation;
  // old-label threading for the join-free convergence test): a long
  // chain forces several propagation+shortcut rounds past the fused
  // init, a star converges AT the init (the early-exit path), and both
  // must land on the component-min fixpoint.
  test("label-propagation: chain (multi-round) and star (init-converged) hit the fixpoint") {
    val chain = (1L to 8L).sliding(2).map(p => (p(0), p(1))).toSeq
    val symChain = chain ++ chain.map(_.swap)
    val gotChain = graft.engine.LabelPropagation
      .components(symChain.toDF("src", "dst"), "spec-chain")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(gotChain === (1L to 8L).map(_ -> 1L).toMap)
    val star = (2L to 6L).map(n => (1L, n))
    val symStar = star ++ star.map(_.swap)
    val gotStar = graft.engine.LabelPropagation
      .components(symStar.toDF("src", "dst"), "spec-star")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(gotStar === (1L to 6L).map(_ -> 1L).toMap)
  }

  // Round-18 relaxRounds internals (shared keyed repartition + uniform
  // null filter): the loop relation's contract is non-null endpoints;
  // a null endpoint must be ignored, not crash the round and not mint
  // a null-keyed distance row.
  test("relaxRounds ignores null edge endpoints") {
    val rows = Seq[(java.lang.Long, java.lang.Long, java.lang.Long)](
      (1L, 2L, 1L), (2L, 3L, 1L), (null, 2L, 1L), (3L, null, 1L),
      (1L, 1L, 0L), (2L, 2L, 0L), (3L, 3L, 0L))
    val rel = rows.toDF("src", "dst", "w")
    val seeds = Seq((1L, 0L)).toDF("node", "d")
    val got = graft.queries.GraphQueries.relaxRounds(rel, seeds, 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 0L, 2L -> 1L, 3L -> 2L))
  }

  // Round-19 contract hardening: the symmetric-edges contract is
  // checkable — with graft.labelprop.checkSymmetry=true a directed
  // edge list fails loudly before the loop; a symmetrized one passes.
  test("label-propagation symmetry guard rejects directed input when enabled") {
    val spark0 = spark
    spark0.conf.set("graft.labelprop.checkSymmetry", "true")
    try {
      val directed = Seq((1L, 2L), (2L, 3L)).toDF("src", "dst")
      val e = intercept[IllegalArgumentException] {
        graft.engine.LabelPropagation.components(directed, "spec-asym")
      }
      assert(e.getMessage.contains("symmetric"))
      val sym = Seq((1L, 2L), (2L, 1L)).toDF("src", "dst")
      val got = graft.engine.LabelPropagation.components(sym, "spec-sym")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got === Map(1L -> 1L, 2L -> 1L))
    } finally spark0.conf.set("graft.labelprop.checkSymmetry", "false")
  }

  test("label-propagation components match union-find on random graphs (10 seeds)") {
    for (seed <- 1 to 10) {
      val rnd = new scala.util.Random(300 + seed)
      val n = 5 + rnd.nextInt(25)
      val base = (1 to n)
        .map(_ => (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter(e => e._1 != e._2)
      val sym = (base ++ base.map(_.swap)).distinct
      if (sym.nonEmpty) {
        val got = graft.engine.LabelPropagation
          .components(sym.toDF("src", "dst"))
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        assert(got === refComponents(sym), s"seed=$seed n=$n")
      }
    }
  }

  /** Reference personalized PageRank, BigInt throughout — mirrors the
    * union-then-aggregate semantics exactly: the state after a round is
    * the set of nodes with incoming mass UNION the seeds (base applies
    * only to seeds; absent = rank 0).
    */
  private def refPpr(edges: Seq[(Long, Long)], seeds: Set[Long],
      iters: Int): Map[Long, BigInt] = {
    val out = edges.groupBy(_._1).view.mapValues(_.size).toMap
    var pr: Map[Long, BigInt] = seeds.map(_ -> Seed).toMap
    for (_ <- 1 to iters) {
      val shares = pr.flatMap { case (n, r) => out.get(n).map(o => n -> r / o) }
      val in = edges.filter(e => shares.contains(e._1)).groupBy(_._2).view
        .mapValues(_.map(e => shares(e._1)).sum).toMap
      pr = (in.keySet ++ seeds).map(v => v ->
        ((if (seeds(v)) Base else BigInt(0)) +
          (in.getOrElse(v, BigInt(0)) * 85) / 100)).toMap
    }
    pr
  }

  private def sparkPpr(edges: Seq[(Long, Long)], seeds: Set[Long],
      iters: Int): Map[Long, BigInt] = {
    val (w, _) = GraphQueries.weight(edges.toDF("src", "dst"))
    GraphQueries.pprIterate(w, seeds.toSeq.toDF("node"), iters)
      .collect().map(r => r.getLong(0) -> BigInt(r.getLong(1))).toMap
  }

  test("ppr matches the reference and the state is the reached set, not |V|") {
    // directed line 1→2→3→4: mass radiates from the seed one hop per
    // round; nodes beyond the frontier must be ABSENT, not zero-ranked
    val line = Seq((1L, 2L), (2L, 3L), (3L, 4L))
    val r1 = sparkPpr(line, Set(1L), 1)
    assert(r1 === refPpr(line, Set(1L), 1))
    assert(r1.keySet === Set(1L, 2L))
    val r2 = sparkPpr(line, Set(1L), 2)
    assert(r2 === refPpr(line, Set(1L), 2))
    assert(r2.keySet === Set(1L, 2L, 3L))
  }

  test("a seed with no in-edges keeps exactly its restart base") {
    val g = Seq((1L, 2L), (2L, 3L), (3L, 2L))
    val got = sparkPpr(g, Set(1L), 2)
    assert(got === refPpr(g, Set(1L), 2))
    assert(got(1L) === Base) // nothing flows back to the seed
  }

  test("ppr matches the reference on random graphs (15 seeds)") {
    for (seed <- 1 to 15) {
      val rnd = new scala.util.Random(400 + seed)
      val n = 5 + rnd.nextInt(20)
      val edges = (0L until n.toLong).flatMap { u =>
        (1 to 1 + rnd.nextInt(3)).map(_ => u -> rnd.nextInt(n).toLong)
      }
      val seeds = Set(rnd.nextInt(n).toLong, rnd.nextInt(n).toLong)
      val iters = 1 + rnd.nextInt(3)
      assert(sparkPpr(edges, seeds, iters) === refPpr(edges, seeds, iters),
        s"seed=$seed n=$n iters=$iters")
    }
  }

  /** Brute-force per-node triangle counts over a canonical undirected
    * edge list — enumerates all id-ordered triples.
    */
  private def refTriangles(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val es = edges.map { case (a, b) => (a min b, a max b) }.toSet
    val nodes = es.toSeq.flatMap(e => Seq(e._1, e._2)).distinct.sorted
    val counts = scala.collection.mutable.Map[Long, Long]()
    for {
      i <- nodes.indices; j <- (i + 1) until nodes.size
      k <- (j + 1) until nodes.size
      a = nodes(i); b = nodes(j); c = nodes(k)
      if es((a, b)) && es((a, c)) && es((b, c))
    } Seq(a, b, c).foreach(v =>
      counts(v) = counts.getOrElse(v, 0L) + 1L)
    counts.toMap
  }

  private def sparkTriangles(edges: Seq[(Long, Long)]): Map[Long, Long] =
    GraphQueries.triangleCounts(
      GraphQueries.orientByDegree(edges.toDF("s1", "s2")))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("triangle counts: K4, a triangle with a tail, and a triangle-free star") {
    val k4 = for (a <- 1L to 4L; b <- (a + 1) to 4L) yield (a, b)
    assert(sparkTriangles(k4) === Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
    val tail = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L))
    assert(sparkTriangles(tail) === Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
    val star = (2L to 6L).map(s => (1L, s))
    assert(sparkTriangles(star) === Map.empty)
  }

  test("triangle counts match brute force on random graphs (15 seeds)") {
    for (seed <- 1 to 15) {
      val rnd = new scala.util.Random(500 + seed)
      val n = 5 + rnd.nextInt(14)
      val edges = for {
        a <- 1L to n.toLong; b <- (a + 1) to n.toLong
        if rnd.nextDouble() < 0.4
      } yield (a, b)
      if (edges.nonEmpty)
        assert(sparkTriangles(edges) === refTriangles(edges),
          s"seed=$seed n=$n |E|=${edges.size}")
    }
  }

  test("fixed-K components equal the fixpoint iff K covers the radius from the min node") {
    // chain 1–…–9: node 9 is 8 hops from the component minimum
    val chain = (1L to 8L).flatMap(i => Seq((i, i + 1), (i + 1, i)))
    val e = chain.toDF("src", "dst")
    val nodes = e.select(col("src").as("node"))
      .unionByName(e.select(col("dst").as("node"))).distinct()
    val k8 = GraphQueries.componentsK(e, nodes, 8)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(k8 === refComponents(chain)) // all label 1
    assert(k8.values.toSet === Set(1L))
    // K=3 exposes the documented bounded semantics: node 9's min
    // label within 3 hops is 6, not the component min
    val k3 = GraphQueries.componentsK(e, nodes, 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(k3(9L) === 6L)
    assert(k3(4L) === 1L) // within 3 hops of the min, already exact
  }

  /** Reference k-core: iterated low-degree removal on an in-memory
    * adjacency map — the independent third formulation next to the
    * distributed peel and the unrolled oracle CTE.
    */
  private def refKcore(edges: Seq[(Long, Long)], k: Int): Map[Long, Long] = {
    var nodes = edges.flatMap(e => Seq(e._1, e._2)).toSet
    var changed = true
    while (changed && nodes.nonEmpty) {
      val deg = edges.filter(e => nodes(e._1) && nodes(e._2))
        .flatMap(e => Seq(e._1, e._2))
        .groupBy(identity).map { case (v, xs) => v -> xs.size }
      val keep = nodes.filter(v => deg.getOrElse(v, 0) >= k)
      changed = keep.size != nodes.size
      nodes = keep
    }
    edges.filter(e => nodes(e._1) && nodes(e._2))
      .flatMap(e => Seq(e._1, e._2))
      .groupBy(identity).map { case (v, xs) => v -> xs.size.toLong }
  }

  test("kcorePeel matches the reference peeler on random graphs") {
    for (seed <- 1 to 4) {
      val rnd = new scala.util.Random(900 + seed)
      val n = 12 + rnd.nextInt(20)
      val undirected = for {
        a <- 1L to n.toLong; b <- (a + 1) to n.toLong
        if rnd.nextDouble() < 0.15
      } yield (a, b)
      if (undirected.nonEmpty) {
        val k = 2 + rnd.nextInt(2)
        val sym = undirected.flatMap { case (a, b) => Seq((a, b), (b, a)) }
          .toDF("src", "dst")
        val got = GraphQueries.kcorePeel(sym, k, s"spec-kcore-$seed")
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        assert(got === refKcore(undirected, k),
          s"seed=$seed n=$n k=$k |E|=${undirected.size}")
      }
    }
  }

  test("kcorePeel on a graph the peel empties returns no rows") {
    // a path: every peel round removes both endpoints under k=2
    val path = (1L to 5L).flatMap(i => Seq((i, i + 1), (i + 1, i)))
    val got = GraphQueries.kcorePeel(path.toDF("src", "dst"), 2, "spec-empty")
    assert(got.count() === 0)
    // and the reference agrees the 2-core of a path is empty
    assert(refKcore((1L to 5L).map(i => (i, i + 1)), 2).isEmpty)
  }
}
