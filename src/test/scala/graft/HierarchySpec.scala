package graft

import graft.operators.Hierarchy
import org.apache.spark.sql.functions._

/** Bounded ancestor closure + subtree rollup (pointer doubling). */
class HierarchySpec extends SparkSpec {

  import spark.implicits._

  private def chain(n: Int) =
    (0 until n).map(i => (i.toLong, if (i == 0) None else Some(i.toLong - 1)))
      .toDF("node", "parent")

  test("chain: closure holds every (node, anc, dist) pair exactly once " +
      "and respects maxDepth even across doubling rounds") {
    // depth 9 on a 10-chain, maxDepth 6 (not a power of two: the last
    // doubling round overshoots to 8 and the final filter must trim)
    val out = Hierarchy.ancestors(chain(10), "node", "parent", 6)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val want = for {
      node <- 0 until 10; d <- 1 to 6; if node - d >= 0
    } yield (node.toLong, (node - d).toLong, d.toLong)
    assert(out.sorted.toSeq == want.sorted)
    assert(out.length == out.distinct.length, "doubling must not duplicate")
  }

  test("forest: two roots stay separate; depth-1 tree needs no rounds") {
    val parents = Seq(
      (1L, None), (2L, Some(1L)), (3L, Some(1L)),
      (10L, None), (11L, Some(10L))).toDF("node", "parent")
    val out = Hierarchy.ancestors(parents, "node", "parent", 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(out == Set((2L, 1L, 1L), (3L, 1L, 1L), (11L, 10L, 1L)))
  }

  test("randomized forests: closure equals the brute-force parent walk " +
      "(8 seeded shapes × random maxDepth)") {
    val rnd = new scala.util.Random(42)
    (1 to 8).foreach { _ =>
      val n = 2 + rnd.nextInt(28)
      // parent(i) < i or none — guaranteed acyclic forest
      val parents = (0 until n).map { i =>
        (i.toLong,
          if (i == 0 || rnd.nextInt(4) == 0) None
          else Some(rnd.nextInt(i).toLong))
      }
      val maxDepth = 1 + rnd.nextInt(8)
      val got = Hierarchy.ancestors(parents.toDF("node", "parent"),
          "node", "parent", maxDepth).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val pmap = parents.collect { case (k, Some(p)) => k -> p }.toMap
      val want = parents.map(_._1).flatMap { k =>
        var cur = pmap.get(k)
        var d = 1L
        var acc = List.empty[(Long, Long, Long)]
        while (cur.isDefined && d <= maxDepth) {
          acc ::= ((k, cur.get, d)); cur = pmap.get(cur.get); d += 1
        }
        acc
      }.toSet
      assert(got == want, s"n=$n maxDepth=$maxDepth")
      // subtreeAgg law on the same forest: each node's rollup equals the
      // brute-force sum over {self} ∪ {descendants within maxDepth}
      val values = (0 until n).map(i => (i.toLong, (i * 7 + 1).toLong))
      val agg = Hierarchy.subtreeAgg(parents.toDF("node", "parent"),
          "node", "parent", values.toDF("k", "v"), "k", "v", maxDepth)
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
        .toMap
      val desc = want.groupBy(_._2).view
        .mapValues(_.map(_._1).toSet).toMap // anc -> descendants
      values.foreach { case (node, _) =>
        val members = desc.getOrElse(node, Set.empty) + node
        val vs = values.filter(p => members(p._1)).map(_._2)
        assert(agg(node) == ((vs.size.toLong, vs.sum)),
          s"rollup mismatch at node=$node n=$n maxDepth=$maxDepth")
      }
    }
  }

  test("subtreeAgg: descendants + self, measureless nodes count zero") {
    val parents = Seq(
      (1L, None), (2L, Some(1L)), (3L, Some(1L)), (4L, Some(2L)))
      .toDF("node", "parent")
    // node 3 has no measure row
    val values = Seq((1L, 10L), (2L, 20L), (4L, 40L)).toDF("k", "v")
    val out = Hierarchy.subtreeAgg(parents, "node", "parent",
        values, "k", "v", 8)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), Option(r.get(2)).map(_.asInstanceOf[Long]))).toMap
    assert(out(1L) == (3L, Some(70L))) // 1+2+4 have measures, 3 doesn't
    assert(out(2L) == (2L, Some(60L)))
    assert(out(3L) == (0L, None))      // leaf without a measure row
    assert(out(4L) == (1L, Some(40L)))
  }
}
