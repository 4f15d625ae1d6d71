package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed connected components over an edge list — the closure step a
  * near-dup pipeline needs: pairwise candidates (MinHash/Jaccard/SimHash) are
  * only EDGES; "keep one doc per duplicate cluster" requires the transitive
  * component (A~B, B~C ⇒ {A,B,C} even though A,C never paired).
  *
  * Algorithm: iterative min-label propagation (the Pregel formulation GraphX
  * uses) — every node starts labeled with its own id; each round, a node
  * adopts the minimum label among itself and its neighbors; converges when no
  * label changes. Rounds needed = graph diameter, which for dedup cluster
  * graphs is small (clusters are near-cliques); for adversarially long path
  * graphs the alternating large-star/small-star variant (Kiveris et al.,
  * "Connected Components in MapReduce and Beyond") converges in O(log n)
  * rounds — same per-round plan shape, swap-in if diameters grow.
  *
  * Scale shape per round: one shuffle of (edge ⋈ labels) on node id + a
  * map-side-combining min aggregate — both linear in |E|. Labels are
  * localCheckpoint'ed each round: iterative DataFrame loops otherwise
  * accumulate lineage and replan the whole history every round (on a
  * cluster, use reliable checkpointing to survive executor loss).
  */
object Components {

  /** Returns (id, component) for every node appearing in `edges`, where
    * `component` is the minimum node id in the connected component. */
  def connectedComponents(edges: DataFrame, srcCol: String, dstCol: String,
      maxIter: Int = 30): DataFrame = {
    // undirected, deduped, id-only: propagation must flow both ways
    val und = edges.select(col(srcCol).as("nbr_id"), col(dstCol).as("id"))
      .union(edges.select(col(dstCol).as("nbr_id"), col(srcCol).as("id")))
      .distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    var labels = und.select(col("id")).distinct()
      .withColumn("comp", col("id"))
      .localCheckpoint(true)
    var changed = 1L
    var iter = 0
    while (changed > 0 && iter < maxIter) {
      // min label among neighbors, joined against each node's own label
      val nbrMin = und
        .join(labels.select(col("id").as("nbr_id"), col("comp")), "nbr_id")
        .groupBy("id").agg(min("comp").as("nbr_comp"))
      val next = labels.join(nbrMin, Seq("id"), "left")
        .select(col("id"),
          least(col("comp"), coalesce(col("nbr_comp"), col("comp"))).as("comp"),
          (col("nbr_comp") < col("comp")).as("_changed"))
        .localCheckpoint(true)
      changed = next.where(col("_changed")).count()
      labels = next.drop("_changed")
      iter += 1
    }
    und.unpersist()
    labels
  }

  /** Cluster representatives: one keeper per component (the min id), plus the
    * component size — the "which docs survive dedup" projection. */
  def keepers(components: DataFrame): DataFrame =
    components.groupBy("comp")
      .agg(min("id").as("keeper_id"), count(lit(1)).as("cluster_size"))
}
