package graft

import graft.operators.Graph
import org.apache.spark.sql.functions._

/** Fixed-point integer PageRank and transition-edge derivation
  * (operators/Graph.scala). All expected values are exact integers —
  * the operator's portability claim is that nothing else is possible. */
class GraphSpec extends SparkSpec {

  private val S = 1000000000000L // default scale
  private val T = 150000000000L  // teleport = 15·S/100

  test("transitionEdges: consecutive pairs per key, weighted") {
    import spark.implicits._
    val ev = Seq((1L, 1L, "a"), (1L, 2L, "b"), (1L, 3L, "a"),
      (2L, 4L, "a"), (2L, 5L, "b")).toDF("k", "ord", "t")
    val got = Graph.transitionEdges(ev, "k", "t", Seq(col("ord")))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      .toSet
    assert(got == Set(("a", "b", 2L), ("b", "a", 1L)))
  }

  test("pageRank: a symmetric 2-cycle is a fixed point at rank = scale") {
    import spark.implicits._
    val edges = Seq(("A", "B", 1L), ("B", "A", 1L)).toDF("src", "dst", "w")
    val got = Graph.pageRank(edges, 3).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // teleport + 85% of a full rank = exactly a full rank, every round
    assert(got == Map("A" -> S, "B" -> S))
  }

  test("pageRank: dangling sink keeps teleport rank; source feeds it " +
      "exactly (85·rank div 100)") {
    import spark.implicits._
    val edges = Seq(("A", "B", 1L)).toDF("src", "dst", "w")
    val it1 = Graph.pageRank(edges, 1).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(it1 == Map("A" -> T, "B" -> (T + 85L * S / 100L)))
    val it2 = Graph.pageRank(edges, 2).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // B now receives 85% of A's teleport-only rank
    assert(it2 == Map("A" -> T, "B" -> (T + 85L * T / 100L)))
  }

  test("pageRank: weighted out-edges split contributions 3:1 exactly") {
    import spark.implicits._
    val edges = Seq(("A", "B", 3L), ("A", "C", 1L)).toDF("src", "dst", "w")
    val got = Graph.pageRank(edges, 1).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // contrib = (85·S·w) div (100·4): B gets 637500000000, C 212500000000
    assert(got == Map("A" -> T,
      "B" -> (T + 85L * S * 3L / 400L), "C" -> (T + 85L * S / 400L)))
  }

  test("triangles: finds each triangle once, canonicalized, across " +
      "directions/duplicates/self-loops; open wedges excluded") {
    import spark.implicits._
    // K3 on {a,b,c} given with mixed directions + a duplicate edge + a
    // self-loop + an open wedge c-d, d-e (no closing edge c-e).
    val edges = Seq(("b", "a"), ("b", "c"), ("a", "c"), ("c", "a"),
      ("a", "a"), ("c", "d"), ("d", "e")).toDF("src", "dst")
    val got = Graph.triangles(edges).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2)))
    assert(got.toSeq == Seq(("a", "b", "c")))
  }

  test("triangles: degree orientation strips the celebrity node — hub " +
      "out-degree 0, spoke fan-out bounded, planted triangle still found") {
    import spark.implicits._
    // One hub ("aaa", lexicographically SMALLEST so id-ordered
    // orientation would fan C(500,2)=124,750 wedges out of it) with 500
    // spokes, plus one spoke-spoke edge closing a triangle.
    val spokes = (1 to 500).map(i => f"s$i%03d")
    val edges = (spokes.map(("aaa", _)) :+ ("s001", "s002"))
      .toDF("src", "dst")
    val und = edges.select(
        least(col("src"), col("dst")).as("a"),
        greatest(col("src"), col("dst")).as("b"))
      .filter(col("a") < col("b")).distinct()
    val outDeg = Graph.orientEdges(und)
      .groupBy("u").agg(count(lit(1)).as("od"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // Every edge points AT the degree-501 hub: it never appears as u.
    assert(!outDeg.contains("aaa"))
    // Spokes have degree ≤ 2, so oriented out-degree ≤ 2 — wedge fan-out
    // per node is C(2,2)=1, not C(500,2).
    assert(outDeg.values.max <= 2)
    val got = Graph.triangles(edges).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2)))
    assert(got.toSeq == Seq(("aaa", "s001", "s002")))
  }

  test("triangles: two triangles sharing an edge are both reported") {
    import spark.implicits._
    val edges = Seq(("a", "b"), ("b", "c"), ("a", "c"),
      ("b", "d"), ("c", "d")).toDF("src", "dst")
    val got = Graph.triangles(edges).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
    assert(got == Set(("a", "b", "c"), ("b", "c", "d")))
  }

  test("harmonicCentrality: exact per-radius counts on a directed path " +
      "a->b->c->d->e, truncated at radius 3") {
    import spark.implicits._
    val edges = Seq(("a", "b"), ("b", "c"), ("c", "d"), ("d", "e"))
      .map { case (s, d) => (s, d, 1L) }.toDF("src", "dst", "w")
    val got = Graph.harmonicCentrality(edges, 3).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    // d(u,v) along the path; radius-3 truncation drops a->e (distance 4)
    assert(got("a") == (0L, 0L, 0L, 0L))
    assert(got("b") == (1L, 0L, 0L, 6L))
    assert(got("c") == (1L, 1L, 0L, 9L))
    assert(got("d") == (1L, 1L, 1L, 11L))
    assert(got("e") == (1L, 1L, 1L, 11L)) // a at distance 4: dropped
  }

  test("harmonicCentrality: a star's hub collects every spoke at " +
      "distance 1; spokes reach nothing (directed toward the hub)") {
    import spark.implicits._
    val edges = (1 to 50).map(i => (f"s$i%02d", "hub", 1L))
      .toDF("src", "dst", "w")
    val got = Graph.harmonicCentrality(edges, 3).collect()
      .map(r => r.getString(0) -> r.getLong(4)).toMap
    assert(got("hub") == 50L * 6)
    assert((1 to 50).forall(i => got(f"s$i%02d") == 0L))
  }

  test("harmonicCentrality: cycles and self-loops do not double-count " +
      "(distance sets are exact, not walk counts)") {
    import spark.implicits._
    // 3-cycle with a self-loop: every node reaches both others once
    val edges = Seq(("a", "b"), ("b", "c"), ("c", "a"), ("a", "a"))
      .map { case (s, d) => (s, d, 1L) }.toDF("src", "dst", "w")
    val got = Graph.harmonicCentrality(edges, 3).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    Seq("a", "b", "c").foreach { n =>
      assert(got(n) == (1L, 1L, 0L, 9L), s"node $n: ${got(n)}")
    }
  }
}
