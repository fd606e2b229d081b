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
}
