package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Graph analytics beyond connected components (`Dedup.connectedComponents`):
 * weighted-edge derivation from event streams and a fixed-point PageRank
 * whose arithmetic is exact integer — every engine, partitioning, and
 * re-run produces bit-identical ranks, the property float PageRank cannot
 * give (float contribution sums reorder under shuffle). The reference has
 * no graph surface; this extends the engine the way a training-data
 * pipeline uses link analysis (source authority for crawl prioritization,
 * quality propagation over near-dup clusters).
 */
object Graph {

  /** Weighted transition edges: one edge (previous `typeCol` → `typeCol`)
    * per consecutive pair within a key (ordered by `ordCols`), aggregated
    * to (src, dst, w). One shuffle on the key for the lag window, then one
    * hash aggregate — no global order anywhere. */
  def transitionEdges(df: DataFrame, keyCol: String, typeCol: String,
      ordCols: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(ordCols: _*)
    df.select(col(typeCol).as("dst"), lag(col(typeCol), 1).over(w).as("src"))
      .filter(col("src").isNotNull)
      .groupBy("src", "dst").agg(count(lit(1)).as("w"))
  }

  /**
   * PageRank (damping 0.85) over weighted edges, `iters` synchronous
   * iterations, in scaled-integer arithmetic: ranks live at `scale`
   * (default 10¹²ths, initial rank = scale per node), each edge
   * contribution is the exact integral quotient
   * `(85 · rank · w) div (100 · outw)` computed in decimal(38,0) (no
   * overflow for any long rank × long weight), and the teleport term is
   * the exact long `15·scale/100`. Dangling mass (nodes with no
   * out-edges) is dropped — the standard simplification, documented so
   * the operator stays a pure function of (edges, iters, scale).
   *
   * Scale shape: the canonical distributed PR — per iteration ONE join of
   * the |V|-row rank table onto the persisted edge list (shuffle on src)
   * and ONE hash aggregate on dst. The driver holds nothing; a fixed
   * iteration count bounds lineage (3 iterations ≈ 6 stages — no
   * checkpointing needed, unlike the unbounded-round connected
   * components).
   */
  def pageRank(edges: DataFrame, iters: Int,
      scale: Long = 1000000000000L): DataFrame = {
    require(iters >= 1, "iters must be >= 1")
    val outw = edges.groupBy("src").agg(sum(col("w")).as("outw"))
    val e = edges.join(outw, Seq("src"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nodes = edges.select(col("src").as("node"))
      .union(edges.select(col("dst"))).distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val teleport = 15L * scale / 100L
    var rank = nodes.select(col("node"), lit(scale).as("rank"))
    (1 to iters).foreach { _ =>
      val contrib = e.join(rank.withColumnRenamed("node", "src"), Seq("src"))
        .select(col("dst").as("node"),
          expr("CAST((CAST(rank AS DECIMAL(38,0)) * 85 * w) div " +
            "(100 * CAST(outw AS DECIMAL(38,0))) AS BIGINT)").as("__c"))
        .groupBy("node").agg(sum(col("__c")).as("__s"))
      rank = nodes.join(contrib, Seq("node"), "left")
        .select(col("node"),
          (lit(teleport) + coalesce(col("__s"), lit(0L))).as("rank"))
    }
    rank
  }

  /**
   * Triangle enumeration over an undirected graph given as (src, dst)
   * edges: emits each triangle once as an ordered triple a < b < c.
   * Canonicalization (least/greatest + distinct) folds both directions
   * and self-loops away, so callers can feed raw directed edge lists.
   *
   * Shape: the classic two-join triangle count. Wedges come from one
   * self-join of the canonical edge list on its lower endpoint (b < c
   * keeps each wedge once); a LEFT SEMI join back onto the edge list
   * closes them. Both joins shuffle on bounded keys and the semi join
   * never materializes payload columns. At web scale the refinement is
   * degree-based orientation (point each edge at the higher-degree
   * endpoint so wedge fan-out is O(m^1.5) worst case, not O(d_max²));
   * with id-ordered orientation a single celebrity node can dominate —
   * documented trade-off, the standard first cut (MR triangle counting,
   * Suri & Vassilvitskii WWW'11). The edge list persists because the
   * wedge join consumes it twice and the closer a third time.
   */
  def triangles(edges: DataFrame): DataFrame = {
    val und = edges.select(
        least(col("src"), col("dst")).as("a"),
        greatest(col("src"), col("dst")).as("b"))
      .filter(col("a") < col("b")).distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val wedges = und.join(und.select(col("a"), col("b").as("c")), Seq("a"))
      .filter(col("b") < col("c"))
    wedges.join(und.select(col("a").as("b"), col("b").as("c")),
        Seq("b", "c"), "left_semi")
      .select("a", "b", "c")
  }
}
