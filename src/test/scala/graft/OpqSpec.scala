package graft

import graft.operators.{Opq, Similarity}
import org.apache.spark.sql.functions._

/** OPQ-style Walsh–Hadamard rotation (operators/Opq.scala): the sign
  * matrix, the exact-integer involution, and the isometry law that
  * makes the rotated pipeline's truth side equal the original's. */
class OpqSpec extends SparkSpec {

  private def vecDf(rows: Seq[(Long, Seq[Double])]) = {
    import org.apache.spark.sql.types._
    spark.createDataFrame(
      java.util.Arrays.asList(rows.map { case (id, v) =>
        org.apache.spark.sql.Row(id, v) }: _*),
      StructType(Seq(StructField("vec_id", LongType),
        StructField("emb", ArrayType(DoubleType)))))
  }

  test("rotate matches the explicit (-1)^popcount((i-1)&(j-1)) matrix " +
      "at dim 4") {
    val v = Seq(1.0, 2.0, 3.0, 4.0)
    val got = vecDf(Seq((0L, v)))
      .select(Opq.rotate(col("emb"), 4).as("r"))
      .collect()(0).getSeq[Double](0)
    val s = 2.0 * 1e6 // sqrt(4) * quantization scale
    val q = v.map(x => math.round(x * 1e6))
    val want = (0 until 4).map { i =>
      (0 until 4).map { j =>
        val sign = if (Integer.bitCount(i & j) % 2 == 0) 1L else -1L
        sign * q(j)
      }.sum / s
    }
    assert(got == want)
  }

  test("involution: rotating twice recovers the vector up to the two " +
      "quantizations (H·H = dim·I)") {
    val rnd = new scala.util.Random(11)
    val rows = (0L until 8L).map(i =>
      (i, Seq.fill(16)(rnd.nextDouble() * 2 - 1)))
    val back = vecDf(rows)
      .select(col("vec_id"),
        Opq.rotate(Opq.rotate(col("emb"), 16), 16).as("r"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    rows.foreach { case (id, v) =>
      v.zip(back(id)).foreach { case (x, y) =>
        assert(math.abs(x - y) < 2e-6, s"vec $id: $x vs $y")
      }
    }
  }

  test("householder: exact involution (H self-inverse), isometric " +
      "top-k, and the degenerate u = 0 is the identity") {
    val rnd = new scala.util.Random(17)
    val rows = (0L until 24L).map(i =>
      (i, Seq.fill(16)(rnd.nextDouble() * 2 - 1)))
    val emb = vecDf(rows)
    // a plausible direction (need not be the true PC for the laws)
    val q = Array.tabulate(16)(i => 1000000L - i * 50000L)
    val u = graft.operators.Opq.householderFromPca(q)
    val rot = graft.operators.Opq.rotateHouseholder(emb, "emb", u)
    // involution: H(H(v)) == v up to the two quantizations
    val back = graft.operators.Opq.rotateHouseholder(rot, "emb", u)
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    rows.foreach { case (id, v) =>
      v.zip(back(id)).foreach { case (x, y) =>
        assert(math.abs(x - y) < 3e-6, s"vec $id: $x vs $y")
      }
    }
    // isometry: exact top-5 neighbour sets agree per query
    def top(df: org.apache.spark.sql.DataFrame) = {
      val qs = df.filter(col("vec_id") < 3)
        .select(col("vec_id").as("q_id"), col("emb").as("q_emb"))
      Similarity.exactTopK(df, qs, 5)
        .select(col("q_id"), col("vec_id")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    }
    assert(top(emb) == top(rot))
    // degenerate: all-zero direction passes vectors through unchanged
    val idem = graft.operators.Opq.rotateHouseholder(emb, "emb",
        graft.operators.Opq.householderFromPca(Array.fill(16)(0L)))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    rows.foreach { case (id, v) => assert(idem(id) == v) }
  }

  test("non-perfect-square dims: the scale-16 axis still yields an exact " +
      "isometry and aims the direction at the diagonal 20x tighter than " +
      "the round(sqrt(dim)) axis (dim 12)") {
    // the r12 axis used round(sqrt(dim)) — exact only for perfect
    // squares; at dim 12 its reflected image of the top direction
    // spreads 282% around the diagonal (measured), the scale-16
    // rationals cut that to 13% (the residual is the reflection's
    // intrinsic amplification of the bounded 1/32-per-unit axis error,
    // not further fixable by a rational of this size). Isometry — the
    // property the recall pipeline rides on — is EXACT either way.
    val rnd = new scala.util.Random(23)
    val rows = (0L until 20L).map(i =>
      (i, Seq.fill(12)(rnd.nextDouble() * 2 - 1)))
    val emb = vecDf(rows)
    val q = Array.tabulate(12)(i => 1000000L - i * 70000L)
    val u = Opq.householderFromPca(q)
    // aiming: reflect q itself and measure the image's coordinate
    // spread around its mean (0 would be a perfect diagonal image)
    val qDf = vecDf(Seq((0L, q.map(_ / 1e6).toSeq)))
    val hq = Opq.rotateHouseholder(qDf, "emb", u)
      .collect()(0).getSeq[Double](1)
    val spread = (hq.max - hq.min) / math.abs(hq.sum / hq.length)
    assert(spread <= 0.15, s"scale-16 image spread $spread (want <= 0.15)")
    // the OLD r12 axis for comparison: round(sqrt(12)) = 3 vs 3.464
    val uOld = q.map(x => 3L * x - math.round(math.sqrt(
      q.map(v => v.toDouble * v).sum)))
    val hqOld = Opq.rotateHouseholder(qDf, "emb", uOld)
      .collect()(0).getSeq[Double](1)
    val spreadOld = (hqOld.max - hqOld.min) /
      math.abs(hqOld.sum / hqOld.length)
    assert(spread * 20 <= spreadOld,
      s"expected >=20x tighter aiming: new $spread vs old $spreadOld")
    // exact isometry holds regardless of the aiming rational: top-k
    // neighbour sets agree between original and rotated space
    def top(df: org.apache.spark.sql.DataFrame) = {
      val qs = df.filter(col("vec_id") < 3)
        .select(col("vec_id").as("q_id"), col("emb").as("q_emb"))
      Similarity.exactTopK(df, qs, 5)
        .select(col("q_id"), col("vec_id")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    }
    assert(top(emb) == top(Opq.rotateHouseholder(emb, "emb", u)))
  }

  test("rank-2: the composed reflections are an isometry, the second " +
      "axis is orthogonal to the all-ones diagonal for orthogonal " +
      "directions, and degenerate inputs yield the identity axis") {
    val rnd = new scala.util.Random(19)
    val rows = (0L until 24L).map(i =>
      (i, Seq.fill(16)(rnd.nextDouble() * 2 - 1)))
    val emb = vecDf(rows)
    // exactly orthogonal integer directions (q1 ⊥ q2 by construction)
    val q1 = Array.tabulate(16)(i => if (i < 8) 1000000L else 500000L)
    val q2 = Array.tabulate(16)(i => if (i < 8) 500000L else -1000000L)
    assert(q1.zip(q2).map { case (a, b) => a * b }.sum == 0L)
    val u1 = Opq.householderFromPca(q1)
    val u2 = Opq.householder2FromPca(q2, u1)
    // u2 ⊥ ones up to quantization: H2 fixes H1's all-ones target, so
    // the second reflection cannot undo the first's energy spreading
    val sumU2 = u2.sum.toDouble
    val normU2 = math.sqrt(u2.map(x => x.toDouble * x.toDouble).sum)
    assert(math.abs(sumU2) / (4 * normU2) < 1e-4,
      s"u2 not ~orthogonal to ones: sum=$sumU2 |u2|=$normU2")
    // composed isometry: exact top-5 neighbour sets agree per query
    val rot2 = Opq.rotateHouseholder(
      Opq.rotateHouseholder(emb, "emb", u1), "emb", u2)
    def top(df: org.apache.spark.sql.DataFrame) = {
      val qs = df.filter(col("vec_id") < 3)
        .select(col("vec_id").as("q_id"), col("emb").as("q_emb"))
      Similarity.exactTopK(df, qs, 5)
        .select(col("q_id"), col("vec_id")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    }
    assert(top(emb) == top(rot2))
    // degenerate contracts: zero u1 or zero q2 give the identity axis
    assert(Opq.householder2FromPca(q2, Array.fill(16)(0L)).forall(_ == 0L))
    assert(Opq.householder2FromPca(Array.fill(16)(0L), u1).forall(_ == 0L))
  }

  test("isometry: norms are preserved and the exact cosine top-k in " +
      "rotated space equals the original space's") {
    val rnd = new scala.util.Random(13)
    val rows = (0L until 30L).map(i =>
      (i, Seq.fill(8)(rnd.nextDouble() * 2 - 1)))
    val emb = vecDf(rows)
    val rot = emb.select(col("vec_id"), Opq.rotate(col("emb"), 8).as("emb"))
    // norm preservation (Parseval) within quantization noise
    val norms = emb.join(rot.withColumnRenamed("emb", "remb"), "vec_id")
      .select(
        aggregate(col("emb"), lit(0.0), (a, x) => a + x * x).as("n"),
        aggregate(col("remb"), lit(0.0), (a, x) => a + x * x).as("rn"))
      .collect()
    norms.foreach(r =>
      assert(math.abs(r.getDouble(0) - r.getDouble(1)) < 1e-4))
    // ranking preservation: exact top-5 neighbour sets agree per query
    def top(df: org.apache.spark.sql.DataFrame) = {
      val qs = df.filter(col("vec_id") < 3)
        .select(col("vec_id").as("q_id"), col("emb").as("q_emb"))
      Similarity.exactTopK(df, qs, 5)
        .select(col("q_id"), col("vec_id")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    }
    assert(top(emb) == top(rot))
  }
}
