package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.engine.Tables.t
import graft.queries.{DocQueries, VectorQueries}

/** Probabilistic-path validation against exact ground truth on the
  * deterministic sf0.001 testdata: MinHash-LSH candidate recall vs exact
  * Jaccard, and LSH-ANN overlap vs brute-force cosine top-k. The data is
  * fixed, so measured recalls are stable; floors are set well under the
  * measured values but far above chance.
  */
class LshRecallSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("MinHash LSH recovers most pairs with exact Jaccard >= 0.9") {
    val docs = t(spark, dir, "documents").filter(col("doc_id") < 200)
    val sets = docs.select(col("doc_id"),
      array_distinct(graft.functions.TextFunctions.words(col("text"))).as("ws"))
    val a = sets.select(col("doc_id").as("doc_a"), col("ws").as("wa"))
    val b = sets.select(col("doc_id").as("doc_b"), col("ws").as("wb"))
    val exact = a.crossJoin(b).filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        (size(array_intersect(col("wa"), col("wb"))).cast("double") /
          size(array_union(col("wa"), col("wb")))).as("j"))
      .filter(col("j") >= 0.9)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    val cand = DocQueries.minhashCandidates(docs)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(exact.nonEmpty, "fixture slice should contain high-Jaccard pairs")
    val recall = exact.count(cand.contains).toDouble / exact.size
    info(s"minhash LSH recall@j>=0.9: $recall (${exact.size} true pairs)")
    assert(recall >= 0.6)
  }

  test("LSH ANN neighbors overlap brute-force top-k and are bucket-consistent") {
    val exact = VectorQueries.qCosineTopk.run(spark, dir)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    val ann = VectorQueries.qAnnLshTopk.run(spark, dir)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    assert(ann.nonEmpty)
    val overlap = ann.count(exact.contains).toDouble / exact.size
    info(s"ANN overlap with exact top-3: $overlap")
    // 4-bit buckets keep ~1/16 of the corpus per query; chance overlap of
    // top-3 would be ~3/500 ≈ 0.6%. Measured 0.167 on this data — any
    // sizable overlap shows the buckets preserve cosine structure.
    assert(overlap >= 0.1)
  }

  test("IVF-PQ neighbors overlap brute-force top-k and rerank repairs PQ error") {
    val exact = VectorQueries.qCosineTopk.run(spark, dir)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    val ivfFlat = VectorQueries.qAnnIvfTopk.run(spark, dir)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    val ivfpq = VectorQueries.qAnnIvfpqTopk.run(spark, dir)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    assert(ivfpq.nonEmpty)
    val overlap = ivfpq.count(exact.contains).toDouble / exact.size
    info(s"IVF-PQ overlap with exact top-3: $overlap")
    // round 13: 2-cell multiprobe + M=8 × K=16 codebooks + shortlist 32.
    // Measured on this data the PQ ORDERING, not the coarse probe,
    // dominated the old 0.625 (flat single-probe already hit 0.917):
    // finer subspaces + a deeper rerank shortlist recovered it. Gate 0.8.
    val flatOverlap = ivfFlat.count(exact.contains).toDouble / exact.size
    info(s"IVF-flat overlap with exact top-3: $flatOverlap")
    assert(overlap >= 0.8,
      s"IVF-PQ recall gate: $overlap < 0.8 vs exact top-3")
    // and multiprobe must not fall below the single-probe flat scan
    assert(overlap >= flatOverlap,
      s"PQ+multiprobe lost recall vs flat: $overlap vs $flatOverlap")
  }

  test("IVF-PQ recall holds at sf0.1 (4x corpus) and the nprobe dial is " +
      "monotone") {
    // round-14 verdict item 7: the recall gate previously ran only at
    // sf0.001 (500 vectors); this asserts it at the largest committed
    // testdata scale (sf0.1, 2000 vectors) and records the
    // recall-vs-nprobe curve (SCALE.md round-14 section).
    val big = "/root/testdata/sf0.1"
    val exact = VectorQueries.qCosineTopk.run(spark, big)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    val curve = (1 to 4).map { np =>
      val got = VectorQueries.ivfpqTopkDf(spark, big, np)
        .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
      np -> got.count(exact.contains).toDouble / exact.size
    }
    info(s"sf0.1 IVF-PQ recall@3 by nprobe: " +
      curve.map { case (np, r) => s"$np->${"%.3f".format(r)}" }
        .mkString(", "))
    val atDefault = curve(1)._2 // nprobe = 2, the registered query's dial
    // with sqrt(N)-scaled centroids + 32-per-probe shortlist (round 14)
    // the measured value is 1.000; gate well under it but far above the
    // pre-fix 0.792
    assert(atDefault >= 0.9,
      s"IVF-PQ recall gate at sf0.1: $atDefault < 0.9 vs exact top-3")
    // widening the probe never loses recall (candidate sets are nested)
    curve.sliding(2).foreach { case Seq((_, lo), (_, hi)) =>
      assert(hi >= lo - 1e-9, s"nprobe curve not monotone: $curve")
    }
  }

  test("k-means-trained centroids never lose recall vs the deterministic " +
      "seeding, at sf0.001 AND sf0.1 (round 16)") {
    // Build BOTH variants fresh from the same source snapshot (the
    // session fixture's quantized copy), probe through the identical
    // IVF-PQ pipeline, and compare recall@3 against the exact scan.
    // Lloyd rounds re-center cells on the data; with everything else
    // frozen the trained index must match or beat the seeded one.
    Seq(dir, "/root/testdata/sf0.1").foreach { d =>
      val sessionRoot = VectorQueries.ivfIndexRoot(spark, d)
      val srcPath = sessionRoot.stripSuffix("/ivfpq") + "/source"
      val base = java.nio.file.Files
        .createTempDirectory("graft-kmeans-cmp").toString
      val spec0 = VectorQueries.IdxSpec.copy(lloyd = 0)
      val spec2 = VectorQueries.IdxSpec
      assert(spec2.lloyd > 0, "the registered spec must train")
      graft.engine.AnnIndex.buildIvfPq(spark, srcPath, s"$base/l0", spec0)
      graft.engine.AnnIndex.buildIvfPq(spark, srcPath, s"$base/l2", spec2)
      val exact = VectorQueries.qCosineTopk.run(spark, d)
        .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
      def recall(root: String): Double = {
        val got = VectorQueries.ivfpqTopkFromRoot(spark, root, 2)
          .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
        got.count(exact.contains).toDouble / exact.size
      }
      val (r0, r2) = (recall(s"$base/l0"), recall(s"$base/l2"))
      info(s"$d recall@3 nprobe=2: seeded=${"%.3f".format(r0)} " +
        s"kmeans=${"%.3f".format(r2)}")
      assert(r2 >= r0 - 1e-9,
        s"k-means training lost recall at $d: $r2 < $r0")
    }
  }

  test("prefix-filtered setsim join equals brute-force trigram Jaccard >= 0.6") {
    // Unlike LSH (recall floor), prefix filtering is EXACT — the check
    // is set equality against an all-pairs computation on the corpus.
    val tri = t(spark, dir, "documents")
      .select(col("doc_id"),
        graft.functions.TextFunctions.words(col("text")).as("ws"))
      .filter(size(col("ws")) >= 3)
      .select(col("doc_id"), array_distinct(
        transform(sequence(lit(1), size(col("ws")) - 2),
          i => array_join(slice(col("ws"), i, lit(3)), " "))).as("ts"))
    val a = tri.select(col("doc_id").as("doc_a"), col("ts").as("ta"))
    val b = tri.select(col("doc_id").as("doc_b"), col("ts").as("tb"))
    val brute = a.crossJoin(b).filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        size(array_intersect(col("ta"), col("tb"))).cast("long").as("i"),
        size(array_union(col("ta"), col("tb"))).cast("long").as("u"))
      .filter(col("i") * 5 >= col("u") * 3)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    val got = graft.queries.SearchQueries.qSetsimJoin.run(spark, dir)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(brute.nonEmpty, "fixture corpus should contain near-dup pairs")
    assert(got === brute)
  }
}
