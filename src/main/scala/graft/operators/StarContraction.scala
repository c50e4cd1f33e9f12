package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components by alternating LARGE-STAR / SMALL-STAR
  * contraction (Kiveris et al. 2014, "Connected Components in
  * MapReduce and Beyond", the Alternating algorithm) — the deep-graph
  * counterpart of [[ConnectedComponents]]'s min-label propagation.
  *
  * Propagation covers ONE hop per round, so its cost is
  * O(component diameter); star contraction instead rewires the edge
  * set itself — each round every node folds its neighborhood onto the
  * neighborhood minimum. The alternating variant implemented here is
  * proven to converge in O(log^2 n) rounds REGARDLESS of diameter
  * (in practice ~2 log2 n: a 10k-long chain converges in ~14
  * alternations where propagation would need 10k rounds; the paper's
  * Two-Phase variant, which iterates large-star to an inner fixpoint
  * each phase, carries the O(log n) bound). Use propagation for
  * small-diameter near-dup graphs (cheaper per round, 2-4 rounds);
  * use this for chains, lineage graphs, or any component whose
  * diameter is not known to be small.
  *
  * Per alternation (all hash-partitioned on the node key — no global
  * structure, no driver state):
  *  - large-star: for each node u with m = min(N(u) + u), re-point
  *    every STRICTLY LARGER neighbor v > u at m;
  *  - small-star: group the (v < u) half-edges by u and re-point
  *    every smaller neighbor (and u itself) at their minimum.
  * The fixpoint is a union of stars: every edge is (node, component
  * minimum). Self-loops are dropped each round; the final labels
  * re-attach roots and isolated nodes to themselves.
  *
  * Scale: each phase is one partial-agg'd groupBy + one equi-join on
  * the node key plus a limit-1 convergence probe; lineage is
  * truncated per alternation (cluster: swap localCheckpoint for
  * checkpoint). Termination is boundary-exact like the closure
  * family: `changed` after the loop only proves the LAST round did
  * work — convergence may have landed exactly on it — so exhaustion
  * runs ONE confirming alternation and throws only if it would still
  * change the edge set, never on an exact-fit maxRounds.
  *
  * MEASURED (tools.DeepCcScale, local[32]): 1M nodes in 100 chains
  * of 10,000 (component diameter 9,999 — propagation's guard throws
  * at its default 20 rounds) labeled exactly in 39.2 s, every
  * cluster asserted equal to its chain minimum; at 10x the diameter
  * (10 chains of 100,000) 46.6 s — +19% time for 10x depth, the
  * round count is effectively diameter-independent.
  */
object StarContraction {

  /** @param edges two-column DataFrame of undirected edges.
    * @return (node, cluster) where cluster = min node id in the
    *         component — the same contract as
    *         [[ConnectedComponents.labels]].
    */
  def labels(edges: DataFrame, maxRounds: Int = 60): DataFrame = {
    val Array(aCol, bCol) = edges.columns
    val allNodes0 = edges
      .select(col(aCol).as("n")).union(edges.select(col(bCol).as("n")))
      .distinct()
      .localCheckpoint()
    val allNodes = Graph.compactFrontierAuto(allNodes0)

    val cur0 = edges
      .select(col(aCol).as("a"), col(bCol).as("b"))
      .filter(col("a") =!= col("b"))
      .distinct()
      .localCheckpoint()
    var cur = Graph.compactFrontierAuto(cur0)

    // one large-star + small-star alternation. No checkpoint or
    // distinct after large-star: the whole alternation materializes
    // ONCE into small-star's checkpoint (large's shuffle is reused
    // across its two consumers via exchange reuse), and small's
    // trailing distinct absorbs any duplicate emissions.
    def alternate(in: DataFrame): DataFrame = {
      val sym = in.union(in.select(col("b").as("a"), col("a").as("b")))
      val mLarge = sym.groupBy(col("a"))
        .agg(min(col("b")).as("mb"))
        .select(col("a").as("u"), least(col("mb"), col("a")).as("m"))
      val large = sym.filter(col("b") > col("a"))
        .join(mLarge, col("a") === col("u"))
        .select(col("b").as("a"), col("m").as("b"))
        .filter(col("a") =!= col("b"))

      val half = large
        .select(greatest(col("a"), col("b")).as("u"), least(col("a"), col("b")).as("v"))
      val mSmall = half.groupBy(col("u")).agg(min(col("v")).as("m"))
      half
        .join(mSmall, "u")
        .select(col("v").as("a"), col("m").as("b"))
        .union(mSmall.select(col("u").as("a"), col("m").as("b")))
        .filter(col("a") =!= col("b"))
        .distinct()
        .localCheckpoint()
    }
    // see Graph.compactFrontierAuto: checkpointed star sets keep full
    // shuffle partitioning; compacting them shrinks every later
    // alternation's map-side task count. Sized from stored bytes, NOT
    // a count() — the per-alternation count job was the r19 regression
    // on q_dedup_clusters_deep (6.43 -> 6.98 s in its own A/B); now
    // each alternation pays only the differs probe below, like the
    // pre-compaction code, and keeps the compaction.
    def compacted(df: DataFrame): DataFrame =
      Graph.compactFrontierAuto(df)

    // fixpoint probe: the star set is stable when nothing entered or
    // left — both sides are distinct sets, so the two exceptAlls form
    // the exact symmetric difference, probed in ONE limit-1 job (two
    // separate isEmpty probes would double the per-round job count,
    // which dominates at fixture scale)
    def differs(x: DataFrame, y: DataFrame): Boolean =
      !x.exceptAll(y).union(y.exceptAll(x)).isEmpty

    var changed = true
    var rounds = 0
    while (changed && rounds < maxRounds) {
      val next = compacted(alternate(cur))
      changed = differs(next, cur)
      cur = next
      rounds += 1
    }
    // boundary-exact exhaustion: the loop may have landed on the
    // fixpoint exactly at maxRounds (changed only says the LAST round
    // did work) — confirm with one more alternation and only throw on
    // real divergence, mirroring ConnectedComponents.labels
    if (changed && differs(alternate(cur), cur))
      throw new IllegalStateException(
        s"StarContraction.labels: edge set still contracting after $maxRounds rounds; " +
          "raise maxRounds (the alternating algorithm is proven to converge in " +
          "O(log^2 n) rounds, ~2 log2 n in practice)")

    // at the fixpoint every edge is (node, root); min() guards the
    // (never-observed) multi-star case and re-attaches roots/isolated
    // nodes to themselves
    allNodes
      .join(cur, allNodes("n") === cur("a"), "left_outer")
      .groupBy(col("n"))
      .agg(min(col("b")).as("mb"))
      .select(col("n").as("node"), coalesce(col("mb"), col("n")).as("cluster"))
  }
}
