package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components by iterative minimum-label propagation —
  * the clustering step of a near-dup dedup stack (pairs alone don't
  * dedup; transitive groups do).
  *
  * Each node starts labeled with its own id; every round each node
  * takes the minimum of its label and its neighbors' labels. Converges
  * in O(component diameter) rounds — near-dup graphs are
  * small-diameter by construction (pairs/cliques), so this terminates
  * in 2-4 rounds where a general graph would want the large-star/
  * small-star alternation.
  *
  * Scale: each round is one shuffle join on the node key plus an
  * aggregate; lineage truncated per round (cluster: swap
  * localCheckpoint for checkpoint).
  *
  * MEASURED (tools.CcScale, local[32]): 1M nodes in 200k chain-of-5
  * components (diameter 4, so propagation genuinely iterates) labeled
  * in 13.1 s with every cluster equal to its chain minimum — asserted
  * exactly, not sampled.
  */
object ConnectedComponents {

  /** @param edges two-column DataFrame of undirected edges.
    * @return (node, cluster) where cluster = min node id reachable.
    */
  def labels(edges: DataFrame, maxRounds: Int = 20): DataFrame = {
    val Array(aCol, bCol) = edges.columns
    val sym0 = edges
      .select(col(aCol).as("a"), col(bCol).as("b"))
      .union(edges.select(col(bCol).as("a"), col(aCol).as("b")))
      .distinct()
      .localCheckpoint()
    // byte-sized compaction (no count() job — see compactFrontierAuto;
    // the r19 advisor flagged the two jobs this loop paid per round)
    val sym = Graph.compactFrontierAuto(sym0)

    val labels0 = sym.select(col("a").as("node")).distinct()
      .withColumn("cluster", col("node"))
      .localCheckpoint()
    var labels = Graph.compactFrontierAuto(labels0)

    var changed = true
    var rounds = 0
    while (changed && rounds < maxRounds) {
      val neighborMin = sym
        .join(labels, sym("b") === labels("node"))
        .groupBy(col("a"))
        .agg(min(col("cluster")).as("nmin"))
      // the changed flag rides along in the SAME pass (nmin < cluster
      // is exactly "this round lowered the label"), so convergence
      // needs only a cached-scan filter probe instead of the extra
      // next-vs-old shuffle join per round this loop used to pay
      val step = labels
        .join(neighborMin, labels("node") === neighborMin("a"), "left_outer")
        .select(
          col("node"),
          least(col("cluster"), coalesce(col("nmin"), col("cluster"))).as("cluster"),
          (col("nmin") < col("cluster")).as("chg")
        )
        .localCheckpoint()
      // ONE flat job per round yields BOTH the convergence flag and the
      // row count the compaction needs (r19 paid two jobs here — an
      // isEmpty probe plus a count — the regression its own A/B flagged
      // on the incremental consumers; an isEmpty alone would still pay
      // the limit scale-up's sequential mini-jobs on the converged
      // round). max(chg) ignores the null chg of no-neighbor rows.
      val probe = step.agg(count(lit(1)), max(col("chg"))).head()
      changed = !probe.isNullAt(1) && probe.getBoolean(1)
      labels = Graph.compactFrontier(step.select(col("node"), col("cluster")), probe.getLong(0))
      rounds += 1
    }
    // min-label covers one hop per round, so a component with
    // diameter > maxRounds would silently keep split labels — make
    // exhaustion an error, not a result (near-dup graphs converge in
    // 2-4 rounds; a general deep graph needs the star-contraction
    // family instead). `changed` only says the LAST round did work;
    // convergence may have landed exactly on it, so confirm with one
    // extra probe before declaring divergence.
    if (changed) {
      val probeMin = sym
        .join(labels, sym("b") === labels("node"))
        .groupBy(col("a"))
        .agg(min(col("cluster")).as("nmin"))
      val wouldChange = !labels
        .join(probeMin, labels("node") === probeMin("a"))
        .filter(col("nmin") < col("cluster"))
        .isEmpty
      if (wouldChange)
        throw new IllegalStateException(
          s"ConnectedComponents.labels: labels still changing after $maxRounds rounds " +
            "(component diameter exceeds maxRounds); raise maxRounds")
    }
    labels
  }
}
