package graft.engine

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import scala.util.chaining._

/** Min-label connected components by distributed label propagation with
  * a pointer-doubling shortcut — the until-convergence twin of the
  * bounded-K declarative relaxation (`GraphQueries.relaxRounds` at zero
  * weight). Extracted from the dedup family's dup-group resolution
  * (round 10) so the graph surface offers components as a first-class
  * operator: the same machinery labels near-dup document components
  * (`DocQueries.dupGroups`) and fulfillment-graph components
  * (`GraphQueries.components` / `q_components`).
  *
  * Contract: `edges(src, dst)` must be SYMMETRIC (callers supply both
  * directions — components of a directed graph are its weakly connected
  * components, so symmetrize first). Returns `(node, label)`, `label` =
  * the component's minimum node id, for every node of the relation:
  * under the symmetric contract every node appears as BOTH a source and
  * a destination, and the fused init below seeds the node set from the
  * DESTINATION side. A contract-violating asymmetric caller silently
  * gets only dst-side nodes (and wrong weak components) — there is no
  * cheap per-round guard for that, so the contract is checkable instead:
  * set `graft.labelprop.checkSymmetry=true` (debug-mode; one extra
  * anti-join pass over the edges per call) and any directed edge list
  * fails loudly before the loop starts. Both production callers
  * symmetrize by construction (`GraphQueries.components` unions the
  * bidirectional fulfillment pairs; `DocQueries.dupGroups` unions
  * swapped candidate pairs); LabelPropagationSpec pins the guard.
  *
  * 100 TB design: each round is one equi-join + min-aggregate over the
  * edge relation (O(|E|) shuffled rows) plus the pointer-doubling
  * lookup self-join over the |V|-sized state; the shortcut halves the
  * remaining label-tree depth every round, so the round count is
  * O(log diameter), not O(diameter) — ~30 neighbor-min rounds collapse
  * to ≤8 on the measured corpora (SCALE.md §Round-9). Every round ends
  * in an EAGER checkpoint through the [[Checkpoints]] seam
  * (`graft.iter.checkpoint = local|reliable` — preemptible clusters
  * set `reliable` so a lost executor costs a task retry, not the whole
  * fixpoint): the state is referenced more than once
  * per round (propagation join + shortcut self-join + convergence
  * test), so without the checkpoint the logical plan doubles per round
  * (measured as an OOM while Spark merely stringified the plan). The
  * convergence test itself is join-free: each round threads its
  * starting label through as `old`, so "did anything move" is a
  * filter+count over the round's own checkpoint blocks.
  */
object LabelPropagation {

  /** @param edges symmetric `(src, dst)` edge relation
    * @param tag    stderr progress tag (per-round changed counts — at
    *               scale the loop dominates its caller's wall clock, so
    *               convergence is observable, not silent)
    */
  def components(edges: DataFrame, tag: String = "label-prop"): DataFrame = {
    // Debug-mode symmetry guard (round-19, advice item): an asymmetric
    // edge list violates the operator contract and silently yields
    // dst-seeded partial output — opt in here to fail loudly instead.
    // Left-anti join (edges minus their own transpose) rather than
    // except: except DISTINCTs both sides; anti-join short-circuits on
    // the first unmatched direction via limit(1).
    if (edges.sparkSession.conf
        .get("graft.labelprop.checkSymmetry", "false").toBoolean) {
      val rev = edges.select(col("dst").as("src"), col("src").as("dst"))
      val missing = edges.select(col("src"), col("dst"))
        .join(rev, Seq("src", "dst"), "left_anti").limit(1)
        .collect()
      require(missing.isEmpty,
        s"$tag: edges must be symmetric (both directions present); " +
          s"missing reverse of (${missing.headOption.map(_.toSeq.mkString(", "))
            .getOrElse("")}) — symmetrize the edge list first")
    }
    // Fused init (round-18 optimization): the old shape seeded
    // labels = id and paid a full first round to fold in the 1-hop
    // neighbor minimum; seeding with least(node, min incoming src)
    // IS that first propagation — one aggregate over the edges, one
    // round fewer through the loop. Every node of a symmetric edge
    // relation appears as a dst, so the aggregate covers the node set.
    var labels = edges.groupBy(col("dst").as("node"))
      .agg(min(col("src")).as("nmin"))
      .select(col("node"), least(col("node"), col("nmin")).as("label"))
      .pipe(Checkpoints.iter)
    var converged = false
    var rounds = 0
    val maxRounds = 64
    while (!converged && rounds < maxRounds) {
      // One propagation = ONE join + ONE aggregate (round-18, guide
      // §2.3/§2.4): each node's standing row rides the same shuffle as
      // its incoming neighbor labels via a union branch (the self-loop
      // trick of GraphQueries.relaxRounds, applied to the fixpoint
      // loop), replacing the old neighborMin-aggregate THEN left-join
      // shape — one exchange and one join fewer per round. The
      // round-start label rides along as `old` (non-null exactly once
      // per node, so max() recovers it through the aggregate) and the
      // convergence test below is a bare filter+count over the round's
      // checkpoint instead of a |V|-row shuffle join.
      val nullLabel = lit(null).cast(edges.schema("src").dataType)
      val prop = labels.select(col("node"), col("label"),
          col("label").as("old"))
        .unionByName(edges
          .join(labels.select(col("node").as("dst"), col("label")),
            Seq("dst"))
          .select(col("src").as("node"), col("label"),
            nullLabel.as("old")))
        .groupBy(col("node"))
        .agg(min(col("label")).as("label"), max(col("old")).as("old"))
        .pipe(Checkpoints.iter)
      // Pointer-doubling shortcut: jump to the label's OWN label
      // (labels are always node ids, so the lookup self-join is total).
      val next = prop
        .join(prop.select(col("node").as("l2node"), col("label").as("l2label")),
          prop("label") === col("l2node"), "left")
        .select(prop("node"),
          least(prop("label"), coalesce(col("l2label"), prop("label"))).as("label"),
          prop("old"))
        .pipe(Checkpoints.iter)
      val changed = next.filter(col("label") =!= col("old")).count()
      labels = next.select(col("node"), col("label"))
      converged = changed == 0
      rounds += 1
      System.err.println(s"[$tag] round $rounds: changed=$changed")
    }
    // A silent partial fixpoint would mislabel components — fail loudly.
    if (!converged) throw new IllegalStateException(
      s"$tag label propagation did not converge in $maxRounds rounds " +
        "(component diameter exceeds the cap)")
    // labels is already a checkpointed leaf; the ContextCleaner reclaims
    // intermediate round blocks as their frames go unreferenced.
    labels
  }
}
