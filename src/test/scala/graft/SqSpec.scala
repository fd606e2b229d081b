package graft

import graft.operators.Sq
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** SQ8 scalar quantization (operators/Sq.scala): exact-integer laws of
  * the scales / codes / reconstruction / asymmetric-score chain. */
class SqSpec extends SparkSpec {

  private def vecs(rows: (Long, Seq[Double])*) =
    spark.createDataFrame(
      java.util.Arrays.asList(rows.map { case (i, v) => Row(i, v) }: _*),
      StructType(Seq(StructField("vec_id", LongType),
        StructField("emb", ArrayType(DoubleType)))))

  test("scales span the corpus; codes hit 0 at the min, 255 at the max, " +
      "stay in [0,255] everywhere, and a collapsed dimension codes 0") {
    // dim 0 spans [-1, 1]; dim 1 is constant (d = 0); dim 2 spans [0, 2]
    val corpus = vecs(
      (0L, Seq(-1.0, 5.0, 0.0)), (1L, Seq(0.0, 5.0, 1.0)),
      (2L, Seq(1.0, 5.0, 2.0)))
    val (mn, d) = Sq.trainScales(corpus, "emb", 3)
    assert(mn.toSeq == Seq(-1000000L, 5000000L, 0L))
    assert(d.toSeq == Seq(2000000L, 0L, 2000000L))
    val codes = corpus.select(col("vec_id"),
        Sq.codes(col("emb"), mn, d).as("c"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(codes(0L) == Seq(0L, 0L, 0L))     // mins → 0; constant dim → 0
    assert(codes(1L) == Seq(128L, 0L, 128L)) // midpoint half-up
    assert(codes(2L) == Seq(255L, 0L, 255L)) // maxes → 255
    codes.values.foreach(c => assert(c.forall(x => x >= 0L && x <= 255L)))
  }

  test("reconstruction law: |255·X_d − R_d| <= d_d / 2 for every corpus " +
      "element (the half-up code is the nearest grid point) — seeded " +
      "random sweep across the full |x| < 8 magnitude contract") {
    val rnd = new scala.util.Random(42)
    val dims = 8
    val corpus = vecs((0L until 200L).map(i =>
      i -> Seq.fill(dims)(rnd.nextDouble() * 16.0 - 8.0)): _*)
    val (mn, d) = Sq.trainScales(corpus, "emb", dims)
    val rows = corpus.select(
        Sq.microInts(col("emb")).as("x"),
        Sq.reconstruct(Sq.codes(col("emb"), mn, d), mn, d).as("r"))
      .collect()
    rows.foreach { row =>
      val x = row.getSeq[Long](0); val r = row.getSeq[Long](1)
      (0 until dims).foreach { j =>
        assert(math.abs(255L * x(j) - r(j)) * 2 <= d(j),
          s"dim $j: 255*${x(j)} vs ${r(j)} exceeds d=${d(j)}/2")
      }
    }
  }

  test("sq8TopK: self-excluded, ranks contiguous, scores non-increasing, " +
      "and on a clean geometry the SQ8 ranking equals the exact one") {
    // well-separated directions: quantization noise cannot flip ranks
    val corpus = vecs(
      (1L, Seq(1.0, 0.0)), (2L, Seq(0.9, 0.44)), (3L, Seq(0.0, 1.0)),
      (4L, Seq(-1.0, 0.0)), (5L, Seq(0.7, 0.72)))
    val qs = vecs((1L, Seq(1.0, 0.0)))
      .select(col("vec_id").as("q_id"), col("emb").as("q_emb"))
    val out = Sq.sq8TopK(corpus, qs, topK = 4, dim = 2)
      .orderBy("rn").collect()
    assert(!out.map(_.getAs[Long]("vec_id")).contains(1L), "self excluded")
    assert(out.map(_.getAs[Long]("rn")).toSeq == Seq(1L, 2L, 3L, 4L))
    val scores = out.map(_.getAs[Long]("score")).toSeq
    assert(scores == scores.sorted.reverse, "scores non-increasing")
    // exact inner-product order for query (1,0): 2 (0.9) > 5 (0.7) >
    // 3 (0.0) > 4 (-1.0)
    assert(out.map(_.getAs[Long]("vec_id")).toSeq == Seq(2L, 5L, 3L, 4L))
  }

  test("degenerate corpora are total: empty corpus yields zero scales " +
      "and an empty top-k; a one-row corpus collapses every dim to " +
      "code 0 and serves (nothing but itself, so empty with self-filter)") {
    val empty = vecs().select(col("vec_id"), col("emb"))
    val (mn0, d0) = Sq.trainScales(empty, "emb", 2)
    assert(mn0.toSeq == Seq(0L, 0L) && d0.toSeq == Seq(0L, 0L))
    val one = vecs((7L, Seq(0.5, -0.5)))
    val (mn1, d1) = Sq.trainScales(one, "emb", 2)
    assert(d1.toSeq == Seq(0L, 0L))
    val qs = one.select(col("vec_id").as("q_id"), col("emb").as("q_emb"))
    assert(Sq.sq8TopK(one, qs, topK = 3, dim = 2).count() == 0L)
  }
}
