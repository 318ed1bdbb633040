package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.{LongArrayDot, Md5Prefix44, MinHashSig, SimHash32, SpanHashes, WordShingles}

/** Session extensions — the documented registration path for the
  * engine's native expressions (set
  * `spark.sql.extensions=graft.GraftExtensions`). Makes `md5_prefix44`,
  * `long_array_dot`, and `word_shingles` available to SQL text as well
  * as the Column API, and exposes Spark's own bloom-filter expression
  * pair (`bloom_filter_agg` / `might_contain`) — the exact expressions
  * `InjectRuntimeFilter` plants, which Spark builds in but does not
  * register for SQL. Registering them lets a pipeline build a filter
  * ONCE and apply it across stages or jobs (the cross-query runtime
  * filter the optimizer can't infer), fully executor-side and
  * codegen'd — no UDF, no driver-side key list.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectOptimizerRule(_ => graft.plans.BandedRangeJoin)
    // SQL surface for the library engines (SURVEY §2.9 note): the
    // distributed-rank operator as a planned table function, the
    // grouped-quantiles engine as an analysis-time TVF expansion.
    ext.injectPlannerStrategy(_ => graft.plans.GraftStrategies)
    ext.injectResolutionRule(s => graft.plans.ExpandGroupedQuantiles(s))
    ext.injectTableFunction((
      FunctionIdentifier("global_rank"),
      new ExpressionInfo(classOf[graft.plans.GlobalRank].getName,
        "global_rank"),
      (children: Seq[Expression]) => graft.plans.GlobalRank.fromArgs(children)))
    ext.injectTableFunction((
      FunctionIdentifier("grouped_quantiles"),
      new ExpressionInfo(classOf[graft.plans.GroupedQuantilesPlan].getName,
        "grouped_quantiles"),
      (children: Seq[Expression]) =>
        graft.plans.GroupedQuantilesTvf.fromArgs(children)))
    ext.injectResolutionRule(s => graft.plans.ExpandPageRank(s))
    ext.injectTableFunction((
      FunctionIdentifier("pagerank"),
      new ExpressionInfo(classOf[graft.plans.PageRankPlan].getName,
        "pagerank"),
      (children: Seq[Expression]) =>
        graft.plans.PageRankTvf.fromArgs(children)))
    ext.injectResolutionRule(s => graft.plans.ExpandPpr(s))
    ext.injectTableFunction((
      FunctionIdentifier("ppr"),
      new ExpressionInfo(classOf[graft.plans.PprPlan].getName, "ppr"),
      (children: Seq[Expression]) => graft.plans.PprTvf.fromArgs(children)))
    ext.injectResolutionRule(s => graft.plans.ExpandComponents(s))
    ext.injectTableFunction((
      FunctionIdentifier("connected_components"),
      new ExpressionInfo(classOf[graft.plans.ComponentsPlan].getName,
        "connected_components"),
      (children: Seq[Expression]) =>
        graft.plans.ComponentsTvf.fromArgs(children)))
    // persisted matviews re-arm before the rewrite rule can run
    // (round 18: SQL DDL for materialized views)
    ext.injectResolutionRule(s => graft.plans.LoadGraftMatviews(s))
    ext.injectResolutionRule(s =>
      graft.engine.MaterializedViews.RewriteToMv(s))
    ext.injectResolutionRule(s => graft.plans.ExpandTableChanges(s))
    // SQL UPDATE / MERGE INTO over catalog-resolved warehouse tables →
    // the engine's snapshot-committing verbs (round 13)
    ext.injectResolutionRule(s => graft.plans.RewriteGraftDml(s))
    // SQL reads of RENAME COLUMN'd tables → union scan + coalesce
    // projection (round 15)
    ext.injectResolutionRule(s => graft.plans.ExpandRenamedScan(s))
    // SQL reads of snapshots carrying deletion vectors (round 17
    // merge-on-read DML) → the DV-applied V1 plan; a stock scan would
    // resurrect deleted rows
    ext.injectResolutionRule(s => graft.plans.ApplyDeletionVectors(s))
    // persistent views (round 17): CREATE/DROP/SHOW VIEW intercepted at
    // the parser seam (stock Spark refuses them on V2 catalogs), reads
    // expanded by re-parsing the stored text in its captured context
    ext.injectParser((s, delegate) =>
      new graft.plans.GraftViewParser(s, delegate))
    ext.injectResolutionRule(s => graft.plans.ResolveGraftViews(s))
    ext.injectTableFunction((
      FunctionIdentifier("table_changes"),
      new ExpressionInfo(classOf[graft.plans.TableChangesPlan].getName,
        "table_changes"),
      (children: Seq[Expression]) =>
        graft.plans.TableChangesTvf.fromArgs(children)))
    ext.injectFunction((
      FunctionIdentifier("bloom_filter_agg"),
      new ExpressionInfo(
        classOf[org.apache.spark.sql.catalyst.expressions.aggregate
          .BloomFilterAggregate].getName, "bloom_filter_agg"),
      (children: Seq[Expression]) => children match {
        case Seq(c) =>
          new org.apache.spark.sql.catalyst.expressions.aggregate
            .BloomFilterAggregate(c)
        case Seq(c, n) =>
          new org.apache.spark.sql.catalyst.expressions.aggregate
            .BloomFilterAggregate(c, n)
        case Seq(c, n, b) =>
          new org.apache.spark.sql.catalyst.expressions.aggregate
            .BloomFilterAggregate(c, n, b)
        case other =>
          throw org.apache.spark.sql.graftshim.Shims
            .wrongNumArgs("bloom_filter_agg", 1, other.size)
      }))
    ext.injectFunction((
      FunctionIdentifier("might_contain"),
      new ExpressionInfo(
        classOf[org.apache.spark.sql.catalyst.expressions
          .BloomFilterMightContain].getName, "might_contain"),
      (children: Seq[Expression]) => children match {
        case Seq(bf, v) =>
          org.apache.spark.sql.catalyst.expressions
            .BloomFilterMightContain(bf, v)
        case other =>
          throw org.apache.spark.sql.graftshim.Shims
            .wrongNumArgs("might_contain", 2, other.size)
      }))
    ext.injectFunction((
      FunctionIdentifier("md5_prefix44"),
      new ExpressionInfo(classOf[Md5Prefix44].getName, "md5_prefix44"),
      (children: Seq[Expression]) => children match {
        case Seq(c) => Md5Prefix44(c)
        case other =>
          throw org.apache.spark.sql.graftshim.Shims
            .wrongNumArgs("md5_prefix44", 1, other.size)
      }))
    ext.injectFunction((
      FunctionIdentifier("long_array_dot"),
      new ExpressionInfo(classOf[LongArrayDot].getName, "long_array_dot"),
      (children: Seq[Expression]) => children match {
        case Seq(a, b) => LongArrayDot(a, b)
        case other =>
          throw org.apache.spark.sql.graftshim.Shims
            .wrongNumArgs("long_array_dot", 2, other.size)
      }))
    ext.injectFunction((
      FunctionIdentifier("word_shingles"),
      new ExpressionInfo(classOf[WordShingles].getName, "word_shingles"),
      (children: Seq[Expression]) => children match {
        case Seq(ws, n) =>
          val width = n match {
            case org.apache.spark.sql.catalyst.expressions
              .Literal(v: Int, org.apache.spark.sql.types.IntegerType) => v
            case _ => throw new IllegalArgumentException(
              "word_shingles requires a literal integer width")
          }
          WordShingles(ws, width)
        case other =>
          throw org.apache.spark.sql.graftshim.Shims
            .wrongNumArgs("word_shingles", 2, other.size)
      }))
    ext.injectFunction((
      FunctionIdentifier("span_hashes"),
      new ExpressionInfo(classOf[SpanHashes].getName, "span_hashes"),
      (children: Seq[Expression]) => children match {
        case Seq(ws, n) =>
          val width = n match {
            case org.apache.spark.sql.catalyst.expressions
              .Literal(v: Int, org.apache.spark.sql.types.IntegerType) => v
            case _ => throw new IllegalArgumentException(
              "span_hashes requires a literal integer width")
          }
          SpanHashes(ws, width)
        case other =>
          throw org.apache.spark.sql.graftshim.Shims
            .wrongNumArgs("span_hashes", 2, other.size)
      }))
    ext.injectFunction((
      FunctionIdentifier("simhash32"),
      new ExpressionInfo(classOf[SimHash32].getName, "simhash32"),
      (children: Seq[Expression]) => children match {
        case Seq(hs) => SimHash32(hs)
        case other =>
          throw org.apache.spark.sql.graftshim.Shims
            .wrongNumArgs("simhash32", 1, other.size)
      }))
    ext.injectFunction((
      FunctionIdentifier("minhash_sig"),
      new ExpressionInfo(classOf[MinHashSig].getName, "minhash_sig"),
      (children: Seq[Expression]) => children match {
        case Seq(ws) => MinHashSig(ws)
        case other =>
          throw org.apache.spark.sql.graftshim.Shims
            .wrongNumArgs("minhash_sig", 1, other.size)
      }))
  }
}
