package graft

import graft.functions.VectorOps
import graft.operators.Pca
import org.apache.spark.sql.functions._

/** Distributed PCA projection + spectrum report over embedding columns. */
class PcaSpec extends SparkSpec {

  private lazy val emb = queries.Q.t(spark, "/root/testdata/sf0.001", "embeddings")
    .select(col("vec_id"), VectorOps.asDouble(col("embedding")).as("emb"))

  test("planted dominant direction: pc1 orders by the planted coefficient") {
    // vectors t·e0 + small fixed noise on e1 — the first principal
    // direction is e0 (up to sign), so pc1 must be monotone in t
    import spark.implicits._
    val dim = 8
    val rows = (0 until 40).map { k =>
      val t = (k - 20).toDouble // spread ±20 along e0
      val v = Array.fill(dim)(0.0)
      v(0) = t
      v(1) = (k % 3).toDouble * 0.1 // tiny off-axis noise
      (k.toLong, v.toSeq)
    }
    val df = rows.toDF("vec_id", "emb")
    val pc1 = Pca.projectPc1(df, "vec_id", "emb", dim)
      .orderBy("vec_id").collect().map(_.getAs[Double]("pc1"))
    // monotone in t (vec_id order IS t order), allowing exact ties
    val sign = math.signum(pc1.last - pc1.head)
    assert(sign != 0.0)
    pc1.sliding(2).foreach { case Array(a, b) =>
      assert(sign * (b - a) >= -1e-6, s"not monotone: $a -> $b")
    }
    // and the spectrum says e0 dominates: frac close to 1
    val v = Pca.varianceExplained(df, "emb", dim).collect().head
    assert(v.getAs[Double]("frac") > 0.9)
    assert(v.getAs[Double]("lambda1") <= v.getAs[Double]("trace") + 1e-6)
  }

  test("projectTop2: planted orthogonal components split onto pc1/pc2; " +
      "rank-1 data degenerates pc2 to 0.0") {
    import spark.implicits._
    val dim = 8
    // dim0 carries spread +-20, dim3 an independent +-2 pattern: pc1 must
    // follow dim0, pc2 dim3 (up to sign), and pc1 == projectPc1's pc1
    val rows = (0 until 40).map { k =>
      val v = Array.fill(dim)(0.0)
      v(0) = (k - 20).toDouble
      v(3) = ((k * 7) % 5 - 2).toDouble
      (k.toLong, v.toSeq)
    }
    val df = rows.toDF("vec_id", "emb")
    val top2 = Pca.projectTop2(df, "vec_id", "emb", dim)
      .orderBy("vec_id").collect()
    val pc1 = top2.map(_.getAs[Double]("pc1"))
    val pc2 = top2.map(_.getAs[Double]("pc2"))
    val base = Pca.projectPc1(df, "vec_id", "emb", dim)
      .orderBy("vec_id").collect().map(_.getAs[Double]("pc1"))
    assert(pc1.toSeq == base.toSeq, "pc1 must match projectPc1 exactly")
    // pc2 recovers the dim3 pattern: same value for same v(3), monotone
    // in v(3) up to one global sign
    // pc2 recovers the dim3 pattern up to the quantized direction's tiny
    // e0 leakage: rows sharing v(3) cluster tightly (spread << the
    // between-group range), and group means are monotone in v(3)
    val byU = rows.map(_._2(3)).zip(pc2)
    val grouped = byU.groupBy(_._1).map { case (u, vs) =>
      u -> vs.map(_._2) }
    val range = pc2.max - pc2.min
    assert(range > 0.5, s"pc2 flat: range $range")
    grouped.foreach { case (u, vs) =>
      assert(vs.max - vs.min < 0.1 * range,
        s"pc2 cluster for v3=$u too wide: ${vs.min}..${vs.max}")
    }
    val ordered = grouped.toSeq.sortBy(_._1)
      .map { case (_, vs) => vs.sum / vs.size }
    val sign = math.signum(ordered.last - ordered.head)
    assert(sign != 0.0)
    ordered.sliding(2).foreach { case Seq(a, b) =>
      assert(sign * (b - a) > 0, s"pc2 means not monotone in v(3): $a -> $b")
    }
    // rank-1 corpus: nothing left after deflation
    val flat = (0 until 30).map { k =>
      val v = Array.fill(dim)(0.0); v(2) = k.toDouble; (k.toLong, v.toSeq)
    }.toDF("vec_id", "emb")
    val deg = Pca.projectTop2(flat, "vec_id", "emb", dim).collect()
    assert(deg.forall(r => math.abs(r.getAs[Double]("pc2")) < 1e-3),
      "rank-1 data must leave pc2 ~ 0")
  }

  test("zero-variance corpus: zero direction, pc1 = 0.0, guarded report") {
    import spark.implicits._
    val df = (0 until 10).map(i => (i.toLong, Seq.fill(4)(2.5))).toDF("vec_id", "emb")
    val pc1 = Pca.projectPc1(df, "vec_id", "emb", 4).collect()
    assert(pc1.length == 10)
    assert(pc1.forall(_.getAs[Double]("pc1") == 0.0))
    val v = Pca.varianceExplained(df, "emb", 4).collect().head
    assert(v.getAs[Double]("lambda1") == 0.0)
    assert(v.getAs[Double]("frac") == 0.0)
  }

  test("fixture embeddings: projection exists for every vector and the " +
      "Rayleigh estimate is within the spectrum bounds") {
    val n = emb.count()
    val p = Pca.projectPc1(emb, "vec_id", "emb", 64)
    assert(p.count() == n)
    val v = Pca.varianceExplained(emb, "emb", 64).collect().head
    val lambda1 = v.getAs[Double]("lambda1")
    val trace = v.getAs[Double]("trace")
    val frac = v.getAs[Double]("frac")
    assert(lambda1 > 0.0 && trace > 0.0)
    // Rayleigh quotient of any vector is <= lambda_max <= trace, and the
    // top eigenvalue of a dim-64 PSD matrix is >= trace/64
    assert(lambda1 <= trace + 1e-6)
    assert(frac <= 1.0 + 1e-9)
    assert(frac >= 1.0 / 64 - 1e-3)
  }

  test("degenerate vectors: null elements skipped (no NPE), empty vectors " +
      "dropped from the projection, short vectors projected") {
    import spark.implicits._
    val rows: Seq[(Long, Seq[java.lang.Double])] = Seq(
      (0L, Seq[java.lang.Double](1.0, 2.0, 3.0, 4.0)),
      (1L, Seq[java.lang.Double](2.0, null, 1.0, 0.0)),
      (2L, Seq.empty[java.lang.Double]),
      (3L, Seq[java.lang.Double](0.5, 1.5)))
    val df = rows.toDF("vec_id", "emb")
    // the moments pass must not NPE on the null element, and the empty
    // vector must not pad a pc=0.0 row out of zip_with (the oracle's
    // unnest+join emits no row for it)
    val out = Pca.projectTop2(df, "vec_id", "emb", 4).orderBy("vec_id").collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(0L, 1L, 3L))
    val v = Pca.varianceExplained(df, "emb", 4).collect().head
    assert(v.getAs[Double]("trace") >= 0.0)
  }
}
