package graft

import graft.operators.Sketch
import org.apache.spark.sql.functions._

/** KMV distinct sketches: estimator branches, merge/Jaccard, bounds. */
class SketchSpec extends SparkSpec {
  import spark.implicits._

  private def hashesOf(rows: Seq[(String, String)]) =
    Sketch.fingerprintHashes(rows.toDF("source", "text"), "source", "text")

  test("incomplete sketch (n < k): estimate IS the exact count, sketch " +
      "stays complete and ascending") {
    val rows = (1 to 7).map(i => ("a", s"doc number $i"))
    val sk = Sketch.kmv(hashesOf(rows), "source", k = 16)
      .select(col("source"), col("sketch"), col("n_distinct"),
        Sketch.kmvEstimate(col("sketch"), 16).as("est"))
      .collect().head
    assert(sk.getAs[Long]("n_distinct") == 7L)
    assert(sk.getAs[Double]("est") == 7.0)
    val arr = sk.getSeq[Long](sk.fieldIndex("sketch"))
    assert(arr.size == 7 && arr == arr.sorted)
  }

  test("estimator: 1000 planted distinct docs, k=64 -> estimate within " +
      "40% of truth (KMV stderr ~ 1/sqrt(k-2) ~ 13%)") {
    val rows = (1 to 1000).map(i => ("a", s"unique content line $i"))
    val est = Sketch.kmv(hashesOf(rows), "source", k = 64)
      .select(Sketch.kmvEstimate(col("sketch"), 64).as("est"))
      .as[Double].collect().head
    assert(est > 600 && est < 1400, s"estimate $est far from 1000")
  }

  test("duplicate texts collapse before sketching (distinct-value " +
      "semantics, not row counts)") {
    val rows = (1 to 50).map(i => ("a", s"only ${i % 5} distinct texts"))
    val sk = Sketch.kmv(hashesOf(rows), "source", k = 16).collect().head
    assert(sk.getAs[Long]("n_distinct") == 5L)
    assert(sk.getSeq[Long](sk.fieldIndex("sketch")).size == 5)
  }

  test("pairwise Jaccard: identical sources -> 1.0, disjoint -> 0.0, " +
      "half-overlap lands near 0.33") {
    val shared = (1 to 200).map(i => s"shared doc $i")
    val aOnly = (1 to 200).map(i => s"a only doc $i")
    val bOnly = (1 to 200).map(i => s"b only doc $i")
    val rows =
      (shared ++ aOnly).map(("a", _)) ++
        (shared ++ bOnly).map(("b", _)) ++
        (shared ++ aOnly).map(("c", _)) ++ // c == a
        (1 to 200).map(i => ("d", s"d only doc $i")) // d disjoint
    val sk = Sketch.kmv(hashesOf(rows), "source", k = 64)
    val got = Sketch.kmvJaccardPairs(sk, "source", k = 64).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        r.getAs[Double]("jaccard_est")).toMap
    assert(got(("a", "c")) == 1.0) // identical sets: merged == both
    assert(got(("a", "d")) == 0.0 && got(("b", "d")) == 0.0)
    // true J(a,b) = 200/600 = 0.333; k=64 sample -> generous tolerance
    assert(got(("a", "b")) > 0.13 && got(("a", "b")) < 0.55,
      s"a-b estimate ${got(("a", "b"))}")
  }

  test("set algebra: complete merges report EXACT union and intersection; " +
      "large merges estimate within KMV error") {
    // small sources: |A|=6, |B|=6, |A∩B|=3 -> union 9 < k=16, so the
    // merged sketch is the exact union set and inter_est = n_shared
    val shared = (1 to 3).map(i => s"shared doc $i")
    val rows = (shared ++ (1 to 3).map(i => s"a only $i")).map(("a", _)) ++
      (shared ++ (1 to 3).map(i => s"b only $i")).map(("b", _))
    val sk = Sketch.kmv(hashesOf(rows), "source", k = 16)
    val got = Sketch.kmvSetPairs(sk, "source", k = 16).collect().head
    assert(got.getAs[Double]("union_est") == 9.0)
    assert(got.getAs[Double]("inter_est") == 3.0)
    // large sources: true union 600, inter 200 -> estimates in range
    val big = ((1 to 200).map(i => s"s $i") ++ (1 to 200).map(i => s"x $i"))
      .map(("a", _)) ++
      ((1 to 200).map(i => s"s $i") ++ (1 to 200).map(i => s"y $i"))
        .map(("b", _))
    val skb = Sketch.kmv(hashesOf(big), "source", k = 64)
    val g2 = Sketch.kmvSetPairs(skb, "source", k = 64).collect().head
    val u = g2.getAs[Double]("union_est")
    val i2 = g2.getAs[Double]("inter_est")
    assert(u > 350 && u < 900, s"union estimate $u far from 600")
    assert(i2 > 60 && i2 < 400, s"inter estimate $i2 far from 200")
    // identical sources: merged sketch == each side's, so union and
    // intersection estimates coincide (jaccard 1 scales union by 1)
    val same = ((1 to 100).map(i => s"doc $i")).flatMap(t =>
      Seq(("a", t), ("b", t)))
    val sks = Sketch.kmv(hashesOf(same), "source", k = 32)
    val g3 = Sketch.kmvSetPairs(sks, "source", k = 32).collect().head
    assert(g3.getAs[Double]("union_est") == g3.getAs[Double]("inter_est"))
  }

  test("map-side bound: the aggregate buffer never exceeds k (MinKAgg " +
      "merge keeps k smallest of both halves)") {
    val agg = new graft.functions.MinKAgg(4)
    val a = agg.merge(List(1L, 5L, 9L), List(2L, 3L, 10L, 11L))
    assert(a == List(1L, 2L, 3L, 5L))
    val b = (1L to 100L).foldLeft(List.empty[Long])((buf, v) =>
      agg.reduce(buf, 101L - v))
    assert(b == List(1L, 2L, 3L, 4L))
  }
}
