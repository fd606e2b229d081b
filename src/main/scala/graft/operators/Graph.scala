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
    val teleport = 15L * scale / 100L
    // A node with NO in-edges is exactly teleport from iteration 1 on,
    // and a node WITH in-edges always receives a contribution row (ranks
    // stay positive, so the grouped sum exists even when quotients floor
    // to 0) — so each iteration is contrib ∪ this constant frame, not a
    // nodes-left-join: one join fewer per iteration, same ranks.
    // The no-in-edge set folds into ONE endpoint aggregate (node,
    // max(is-dst)) instead of union+distinct / dst-distinct / anti-join —
    // same rows, two exchanges and one persist fewer (the nodes frame's
    // only consumer was this anti-join; the it=1 rank below never
    // evaluates, its constant folds into the first iteration).
    val noIn = edges
      .select(explode(array(
        struct(col("src").as("node"), lit(0).as("d")),
        struct(col("dst").as("node"), lit(1).as("d")))).as("x"))
      .groupBy(col("x.node").as("node"))
      .agg(max(col("x.d")).as("__hasIn"))
      .filter(col("__hasIn") === 0)
      .select(col("node"), lit(teleport).as("rank"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    var rank: DataFrame = null
    (1 to iters).foreach { it =>
      // iteration 1's rank is the CONSTANT `scale` for every node, and
      // every src in e is a node — so the |V|-row rank join is a no-op
      // there and folds into a scan of the persisted edge list (one
      // corpus-scale join and the nodes-frame dependency saved; ranks
      // bit-identical). Later iterations carry a genuinely per-node
      // rank and keep the canonical join.
      val scored = if (it == 1)
        e.withColumn("rank", lit(scale))
      else e.join(rank.withColumnRenamed("node", "src"), Seq("src"))
      val contrib = scored
        .select(col("dst").as("node"),
          expr("CAST((CAST(rank AS DECIMAL(38,0)) * 85 * w) div " +
            "(100 * CAST(outw AS DECIMAL(38,0))) AS BIGINT)").as("__c"))
        .groupBy("node").agg(sum(col("__c")).as("__s"))
      rank = contrib
        .select(col("node"), (lit(teleport) + col("__s")).as("rank"))
        .unionByName(noIn)
    }
    Scale.releaseAfterUse(rank, Seq(e, noIn))
  }

  /** Degree-oriented directed view of a canonical (a < b) edge list:
    * each edge points from its lower-(degree, id) endpoint `u` to the
    * higher one `v`; `dv` carries v's degree so downstream wedge ordering
    * needs no further join. Every node's out-degree is then O(√m) in the
    * amortized sense (a node of degree d only keeps out-edges to
    * neighbors of degree ≥ d), which is what bounds wedge fan-out.
    * Exposed package-private so GraphSpec can pin the celebrity-node
    * property (hub out-degree 0) structurally. */
  private[graft] def orientEdges(und: DataFrame): DataFrame = {
    val deg = und.select(col("a").as("node"))
      .union(und.select(col("b")))
      .groupBy("node").agg(count(lit(1)).as("deg"))
    // a < b already, so (da, a) < (db, b) reduces to da <= db.
    und
      .join(deg.select(col("node").as("a"), col("deg").as("da")), Seq("a"))
      .join(deg.select(col("node").as("b"), col("deg").as("db")), Seq("b"))
      .select(
        when(col("da") <= col("db"), col("a")).otherwise(col("b")).as("u"),
        when(col("da") <= col("db"), col("b")).otherwise(col("a")).as("v"),
        greatest(col("da"), col("db")).as("dv"))
  }

  /**
   * Triangle enumeration over an undirected graph given as (src, dst)
   * edges: emits each triangle once as an ordered triple a < b < c.
   * Canonicalization (least/greatest + distinct) folds both directions
   * and self-loops away, so callers can feed raw directed edge lists.
   *
   * Shape: MR triangle counting with degree orientation (Suri &
   * Vassilvitskii WWW'11). Edges are first oriented toward their
   * higher-(degree, id) endpoint, so wedges fan out from the LOWEST-degree
   * corner of each triangle: total wedge count is O(m^1.5) worst case
   * instead of O(d_max²) — one celebrity node (a hub event type, a viral
   * doc) no longer concentrates C(d,2) wedge pairs in a single join key.
   * One self-join of the oriented list on `u` builds wedges (endpoints
   * kept in (degree, id) order so each wedge appears once); a LEFT SEMI
   * join back onto the oriented list closes them — under the same total
   * order the closing edge {x, y} can only be stored as x→y, so one probe
   * direction suffices. The oriented list persists because the wedge join
   * consumes it twice and the closer a third time; each triangle is
   * re-sorted by id at the end so output is orientation-independent.
   */
  def triangles(edges: DataFrame): DataFrame = {
    val und = edges.select(
        least(col("src"), col("dst")).as("a"),
        greatest(col("src"), col("dst")).as("b"))
      .filter(col("a") < col("b")).distinct()
      // consumed 4× inside the oriented plan (degree union + both
      // degree-join sides); persisting keeps the distinct shuffle single
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val oriented = orientEdges(und)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val wedges = oriented
      .select(col("u"), col("v").as("x"), col("dv").as("dx"))
      .join(oriented.select(col("u"), col("v").as("y"), col("dv").as("dy")),
        Seq("u"))
      .filter(col("dx") < col("dy") ||
        (col("dx") === col("dy") && col("x") < col("y")))
    Scale.releaseAfterUse(
      wedges.join(oriented.select(col("u").as("x"), col("v").as("y")),
          Seq("x", "y"), "left_semi")
        .select(sort_array(array(col("u"), col("x"), col("y"))).as("__t"))
        .select(col("__t")(0).as("a"), col("__t")(1).as("b"),
          col("__t")(2).as("c")),
      Seq(und, oriented))
  }

  /**
   * Bounded-radius harmonic centrality over a directed edge list — the
   * crawl-prioritization ranking Common Crawl publishes for hosts
   * (Boldi & Vigna, "Axioms for Centrality", 2014): H(v) = Σ_{u≠v}
   * 1/d(u, v), summed over nodes that can REACH v, truncated at
   * `radius` hops (distant nodes contribute ≤ 1/(radius+1) each — the
   * truncation is the declared approximation, standard for this metric
   * since exact all-radii needs the full neighborhood function).
   *
   * Arithmetic is exact integer: the output is H scaled by
   * lcm(1..radius) — e.g. radius 3 → h_x6 = 6·n1 + 3·n2 + 2·n3 — so
   * ranks are bit-identical across engines, partitionings and re-runs
   * (the [[pageRank]] property; float 1/d sums would reorder under
   * shuffle). Returns (node, n1..n_radius, h_scaled) with one row per
   * node, zero counts for unreachable ones.
   *
   * Scale shape: `radius` synchronous reverse-BFS rounds, each ONE
   * equi-join of the frontier onto the persisted reversed edge list plus
   * ONE distinct and an anti-join against the visited set — all shuffles
   * keyed on the node, no global structure anywhere. Work is bounded by
   * the radius-r reachability pair count (web-scale graphs: tens of
   * neighbors^3); for graphs where that explodes, the published scale
   * path is HyperBall's counter registers over the same round structure
   * — a sketch, so deliberately NOT this oracle-checked operator.
   */
  def harmonicCentrality(edges: DataFrame, radius: Int = 3): DataFrame = {
    require(radius >= 1 && radius <= 6, "radius must be in [1, 6]")
    val lcm = (1 to radius).foldLeft(1L)((a, b) =>
      a / BigInt(a).gcd(BigInt(b)).toLong * b)
    // reversed simple edges: walking predecessors from each target v
    val rev = edges.select(col("dst").as("v"), col("src").as("u"))
      .filter(col("u") =!= col("v")).distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nodes = edges.select(col("src").as("node"))
      .union(edges.select(col("dst"))).distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // visited(v, u) = d(u, v) <= current round; round 0 is the identity
    var visited = nodes.select(col("node").as("v"), col("node").as("u"))
    var frontier = visited
    var result = nodes
    val held = scala.collection.mutable.Buffer[DataFrame](rev, nodes)
    (1 to radius).foreach { r =>
      frontier = frontier
        .join(rev.select(col("v").as("u"), col("u").as("w")), Seq("u"))
        .select(col("v"), col("w").as("u")).distinct()
        .join(visited, Seq("v", "u"), "left_anti")
        // consumed three times (visited union, n_r count, next round's
        // expansion); held until the caller's first action completes
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      held += frontier
      visited = visited.union(frontier)
      val nr = frontier.groupBy(col("v").as("node"))
        .agg(count(lit(1)).as(s"n$r"))
      result = result.join(nr, Seq("node"), "left")
        .withColumn(s"n$r", coalesce(col(s"n$r"), lit(0L)))
    }
    val h = (1 to radius).map(r => col(s"n$r") * lit(lcm / r)).reduce(_ + _)
    Scale.releaseAfterUse(result.withColumn("h_scaled", h), held.toSeq)
  }
}
