package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/**
 * Bounded-depth hierarchy operators — the recursive-CTE family (org
 * charts, thread trees, taxonomies, referral chains) that Spark's
 * DataFrame surface lacks, rebuilt as pointer-doubling joins so the
 * recursion depth costs log₂(depth) shuffles instead of depth.
 *
 * Contract: the parent table maps each node to AT MOST ONE parent (a
 * forest / functional graph). Under that contract every (node, dist)
 * walk endpoint is unique, so the doubling composition below never
 * manufactures duplicate rows and needs no distinct() — the same
 * UNION ALL semantics a recursive CTE has on a forest.
 */
object Hierarchy {

  /**
   * The bounded ancestor closure: one row (node, anc, dist) per ancestor
   * within `maxDepth` parent hops. Pointer doubling: after round k the
   * frame holds every pair with dist ≤ 2ᵏ; the round composes the
   * dist = 2ᵏ "jump table" (a FILTER of the closure, not a second join)
   * with the whole closure, and a pair at dist d ∈ (2ᵏ, 2ᵏ⁺¹] splits
   * UNIQUELY as (node → its 2ᵏ-th ancestor) + (that ancestor → anc),
   * so the union is duplicate-free by construction.
   *
   * Scale shape: ⌈log₂ maxDepth⌉ hash equi-joins keyed on the midpoint
   * node, each over the ≤ n·depth-row closure — never a driver collect,
   * never a cartesian. Hub ancestors (the root appears once per
   * descendant) sit on the BUILD side's value, not the join key, so the
   * composition does not skew. Each round's closure is persisted (it
   * feeds both the union and the next join) and freed via
   * [[Scale.releaseAfterUse]] once the caller's first action completes.
   */
  def ancestors(parents: DataFrame, nodeCol: String, parentCol: String,
      maxDepth: Int): DataFrame = {
    require(maxDepth >= 1, s"maxDepth must be >= 1: $maxDepth")
    var p = parents.filter(col(parentCol).isNotNull)
      .select(col(nodeCol).as("node"), col(parentCol).as("anc"),
        lit(1L).as("dist"))
    var reach = 1L
    val held = scala.collection.mutable.ArrayBuffer[DataFrame]()
    while (reach < maxDepth) {
      val pp = p.persist(StorageLevel.MEMORY_AND_DISK)
      held += pp
      val comp = pp.filter(col("dist") === reach)
        .select(col("node"), col("anc").as("__mid"))
        .join(pp.select(col("node").as("__mid"), col("anc"), col("dist")),
          "__mid")
        .select(col("node"), col("anc"), (col("dist") + lit(reach)).as("dist"))
      p = pp.unionByName(comp)
      reach *= 2
    }
    Scale.releaseAfterUse(p.filter(col("dist") <= maxDepth), held.toSeq)
  }

  /**
   * Subtree rollup: for every node in the parent table, the count and sum
   * of a per-node measure over its subtree (descendants AND itself) within
   * `maxDepth` hops — the closure from [[ancestors]] extended with the
   * trivial self pair, joined to the measure, one hash aggregate on the
   * ancestor. Nodes absent from `values` contribute nothing; nodes whose
   * subtree is empty still report their own row. The self frame is the
   * DISTINCT union of nodeCol and parentCol values, so with the common
   * child→parent-only table shape (roots never appear as node rows) a
   * root still counts its own measure — and a node listed both ways
   * counts itself exactly once. Returns (node, n_desc, sum_value) where
   * n_desc counts subtree nodes that HAVE a measure row.
   */
  def subtreeAgg(parents: DataFrame, nodeCol: String, parentCol: String,
      values: DataFrame, keyCol: String, valueCol: String,
      maxDepth: Int): DataFrame = {
    val self = parents.select(col(nodeCol).as("node"))
      .unionByName(parents.filter(col(parentCol).isNotNull)
        .select(col(parentCol).as("node")))
      .distinct()
      .select(col("node"), col("node").as("__desc"))
    val pairs = ancestors(parents, nodeCol, parentCol, maxDepth)
      .select(col("anc").as("node"), col("node").as("__desc"))
      .unionByName(self)
    pairs
      .join(values.select(col(keyCol).as("__desc"), col(valueCol).as("__v")),
        Seq("__desc"), "left")
      .groupBy("node")
      .agg(count(col("__v")).as("n_desc"), sum(col("__v")).as("sum_value"))
  }
}
