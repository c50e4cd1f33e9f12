package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** INCREMENTAL near-dup cluster maintenance — the state layer that
  * completes the incremental-dedup family: a production corpus needs
  * cluster ids that are STABLE across batch ingest (corpus versioning,
  * keep-one-per-cluster sampling, dedup audits all key on them), and
  * recomputing connected components over the whole corpus per batch is
  * O(corpus) forever. Instead the pipeline persists a CLUSTER MAP —
  * (doc_id, cluster), invariant: cluster = MIN doc_id of the
  * component — alongside the MinHash band index, and each batch
  * updates it with work proportional to the batch plus any clusters it
  * merges:
  *
  *  1. the batch's verified near-dup pairs are computed exactly as
  *     q_dedup_incremental does (MinHashLsh.candidatesAgainst /
  *     verifyAgainst vs the index, plus in-batch candidates/verify);
  *  2. [[maintain]] contracts every touched OLD component to its
  *     representative (one supernode per cluster id) and runs
  *     connected components on the resulting MINI-GRAPH — new docs +
  *     touched cluster representatives only, so the closure is
  *     batch-sized no matter how large the corpus map is;
  *  3. the returned rows — every new doc's assignment plus the
  *     relabeled members of any cluster that LOST a merge — go
  *     through the shard-scoped crash-atomic upsert
  *     (Streaming.upsertPartitionedBatch on a MinHashLsh.withShard
  *     map), so untouched shards keep their bytes.
  *
  * Stability argument: ingest ids are monotone, so a new doc can never
  * steal an existing component's min; a cluster id only changes when
  * two OLD clusters genuinely merge (a new doc bridges them — with
  * Jaccard tau 0.8, two docs can each clear tau against a bridge while
  * sitting below tau of each other, e.g. one-token variants at two
  * different positions), and the merged id is the smaller of the two —
  * still the component min. Because old components enter the
  * mini-graph already contracted to their representative (itself the
  * component min), the mini-closure's min IS the global component min:
  * the incremental map equals the from-scratch clustering of the full
  * corpus at every batch boundary (IncrementalClustersSpec proves the
  * merge case; tools/IncClusterScale proves map-equality against a
  * whole-corpus recompute at 1M docs).
  *
  * Reference analogue: the per-ingest latest-version dedup the
  * reference runs on every literature load
  * (literature/PreProcessing.scala:8-27), upgraded from exact-id
  * replacement to transitive near-dup group maintenance.
  */
object IncrementalClusters {

  /** Compute the cluster-map upsert rows for one batch.
    *
    * @param clusterMap persisted (doc_id, cluster) map; cluster = min
    *   doc_id of the component (the invariant this operator preserves)
    * @param newDocs one column of this batch's doc ids — ids must be
    *   new (not in the map) and greater than every mapped id
    *   (monotone ingest, the same contract as the id-range shards)
    * @param crossEdges verified (d_new, d_old) near-dup pairs between
    *   the batch and the indexed corpus
    * @param inBatchEdges verified (d1, d2) pairs within the batch
    * @return (doc_id, cluster) rows to upsert: EVERY new doc (isolated
    *   docs map to themselves) plus every OLD doc whose cluster id
    *   changed because its cluster lost a merge. Cost: connected
    *   components over new docs + touched representatives (batch-
    *   sized), one partition-prunable semi-join into the map per
    *   touched cluster set.
    */
  def maintain(
      clusterMap: DataFrame,
      newDocs: DataFrame,
      crossEdges: DataFrame,
      inBatchEdges: DataFrame
  ): DataFrame = {
    val idCol = newDocs.columns.head
    // contract old endpoints to their cluster representative: the
    // mini-graph never sees an old component's members, only its id
    val cross = crossEdges
      .join(clusterMap.select(col("doc_id").as("d_old"), col("cluster")), Seq("d_old"))
      .select(col("d_new").as("a"), col("cluster").as("b"))
    val Array(e1, e2) = inBatchEdges.columns
    val mini = cross.unionByName(
      inBatchEdges.select(col(e1).as("a"), col(e2).as("b")))

    if (mini.isEmpty) {
      // edge-free batch: every doc is its own singleton cluster
      return newDocs.select(col(idCol).as("doc_id"), col(idCol).as("cluster"))
    }
    // batch-sized closure: nodes are new ids + touched old cluster ids
    val lbl = ConnectedComponents.labels(mini).localCheckpoint()

    // new docs: component label, or self for isolated docs
    val newRows = newDocs
      .select(col(idCol).as("doc_id"))
      .join(lbl.withColumnRenamed("node", "doc_id"), Seq("doc_id"), "left_outer")
      .select(col("doc_id"), coalesce(col("cluster"), col("doc_id")).as("cluster"))

    // merge losers: a mini-node that (a) changed label and (b) IS an
    // old cluster id marks a cluster whose every member relabels.
    // New ids never collide with old cluster ids (ids are new), so the
    // join alone selects the old supernodes.
    val losers = lbl
      .filter(col("node") =!= col("cluster"))
      .select(col("node").as("old_cluster"), col("cluster").as("new_cluster"))
    val relabeled = clusterMap
      .join(losers, clusterMap("cluster") === losers("old_cluster"))
      .select(col("doc_id"), col("new_cluster").as("cluster"))

    newRows.unionByName(relabeled)
  }

  /** Compute the cluster-map rows for a REMOVAL — the decremental half
    * of the lifecycle ([[maintain]] handles ingest). Deleting a doc can
    * break the map's invariant two ways: the doc was its component's
    * MIN (the cluster id itself must change) or an articulation point
    * (the component splits into several). Both reduce to the same
    * repair: recluster ONLY the touched components over their SURVIVING
    * members' edges. Exactness: components are closed under near-dup
    * edges, so no edge leaves a component — survivors of untouched
    * clusters keep their labels, and the touched components' survivors
    * need only their own edges to land exactly where a whole-corpus
    * reclustering would put them (the same equality theorem as
    * [[maintain]], proven per-fixture by q_dedup_clusters_removal's
    * oracle and at 1M docs by tools/IncClusterScale).
    *
    * @param clusterMap persisted (doc_id, cluster) map
    * @param removedIds one column of doc ids to retract
    * @param survivorEdges verified near-dup pairs among the SURVIVING
    *   members of the touched clusters (the caller recomputes them from
    *   the persisted MinHash index — survivors' stored shingle sets, a
    *   component-sized subset; see q_dedup_clusters_removal)
    * @return (doc_id, cluster) rows re-labeling EVERY surviving member
    *   of a touched cluster (isolated survivors map to themselves; new
    *   cluster id = min surviving member by the closure's min-label).
    *   The caller upserts these and deletes the removed ids' rows —
    *   both through the shard-scoped crash-atomic swap
    *   (Streaming.upsertPartitionedBatch / deleteFromPartitioned).
    *   Cost: component-sized closure + two map joins; ∝ touched
    *   components, not corpus.
    */
  def remove(
      clusterMap: DataFrame,
      removedIds: DataFrame,
      survivorEdges: DataFrame
  ): DataFrame = {
    val idCol = removedIds.columns.head
    val removed = removedIds.select(col(idCol).as("doc_id")).distinct()
    val touched = clusterMap
      .join(removed, Seq("doc_id"), "left_semi")
      .select(col("cluster")).distinct()
    val survivors = clusterMap
      .join(broadcast(touched), Seq("cluster"), "left_semi")
      .join(removed, Seq("doc_id"), "left_anti")
      .select(col("doc_id"))
    val Array(e1, e2) = survivorEdges.columns
    val lbl = ConnectedComponents
      .labels(survivorEdges.select(col(e1), col(e2)))
      .withColumnRenamed("node", "doc_id")
    survivors
      .join(lbl, Seq("doc_id"), "left_outer")
      .select(col("doc_id"), coalesce(col("cluster"), col("doc_id")).as("cluster"))
  }

  /** Compute the cluster-map rows for an EDIT — a re-ingested id whose
    * content changed (an upstream re-crawl): remove-then-add.
    * [[remove]] repairs the old neighborhood (the edited doc's former
    * cluster must NOT retain it — a shrunk neighborhood splits or
    * relabels exactly as a deletion would), then [[maintain]] inserts
    * the id back with its NEW content's edges against the post-removal
    * map. [[maintain]]'s monotone-id contract relaxes soundly here:
    * the re-used id is absent from the post-removal map and — because
    * [[remove]] relabels its former cluster to a surviving min — can
    * no longer equal any live cluster id, which is all the loser
    * detection needs; and if the edited id becomes its new component's
    * min, the min-label closure relabels that component to it, which
    * IS the invariant. Per-doc delta: maintain's row wins over
    * remove's when both touch the same doc (the merge happened after
    * the repair).
    *
    * @param survivorEdges verified pairs among the surviving members
    *   of the edited ids' OLD clusters (old-content neighborhood)
    * @param crossEdges verified (d_new, d_old) pairs between the
    *   edited docs' NEW content and the index MINUS the edited ids
    *   (the caller replaces the index rows latest-wins and must not
    *   let an edited doc match its own stored row)
    * @param inBatchEdges verified pairs among the edited docs
    * @return (doc_id, cluster) rows to upsert; the edited ids keep a
    *   row (re-added), no map delete is needed.
    */
  def edit(
      clusterMap: DataFrame,
      editedIds: DataFrame,
      survivorEdges: DataFrame,
      crossEdges: DataFrame,
      inBatchEdges: DataFrame
  ): DataFrame = {
    val idCol = editedIds.columns.head
    val edited = editedIds.select(col(idCol).as("doc_id")).distinct()
    val repairs = remove(clusterMap, edited, survivorEdges).localCheckpoint()
    val mapAfter = clusterMap
      .join(edited, Seq("doc_id"), "left_anti")
      .join(repairs.select(col("doc_id")), Seq("doc_id"), "left_anti")
      .unionByName(repairs)
    val added = maintain(mapAfter, edited, crossEdges, inBatchEdges).localCheckpoint()
    repairs
      .join(added.select(col("doc_id")), Seq("doc_id"), "left_anti")
      .unionByName(added)
  }
}
