package graft

import graft.functions.TopKAgg
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Laws for the bounded per-group top-k Aggregator. */
class TopKAggSpec extends SparkSpec {

  test("TopKAgg agrees with the window-rank formulation on seeded data") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val rows = Seq.tabulate(500)(i =>
      (s"g${rnd.nextInt(4)}", math.floor(rnd.nextDouble() * 50) / 10, i.toLong))
    val df = rows.toDF("g", "score", "id").repartition(7)
    val topk = udaf(new TopKAgg(5))
    val got = df.groupBy("g").agg(topk(col("score"), col("id")).as("top"))
      .select(col("g"), posexplode(col("top")))
      .select(col("g"), (col("pos") + 1).as("rnk"),
        col("col._1").as("score"), col("col._2").as("id"))
      .orderBy("g", "rnk")
      .collect().map(r => (r.getString(0), r.getInt(1), r.getDouble(2), r.getLong(3)))
    val w = Window.partitionBy("g").orderBy(col("score").desc, col("id").desc)
    val want = df.withColumn("rnk", row_number().over(w)).filter(col("rnk") <= 5)
      .select("g", "rnk", "score", "id").orderBy("g", "rnk")
      .collect().map(r => (r.getString(0), r.getInt(1), r.getDouble(2), r.getLong(3)))
    assert(got.toSeq == want.toSeq)
  }

  test("TopKAgg merge is bounded, ordered, and associative on hand cases") {
    val agg = new TopKAgg(3)
    val a = List((9.0, 1L), (7.0, 2L), (5.0, 3L))
    val b = List((8.0, 4L), (7.0, 5L), (1.0, 6L))
    val m = agg.merge(a, b)
    assert(m == List((9.0, 1L), (8.0, 4L), (7.0, 5L))) // tie 7.0: id 5 > id 2
    assert(agg.merge(a, Nil) == a && agg.merge(Nil, b) == b)
    // associativity over a third list
    val c = List((10.0, 7L), (0.5, 8L))
    assert(agg.merge(agg.merge(a, b), c) == agg.merge(a, agg.merge(b, c)))
    // reduce keeps the cap
    assert(agg.reduce(a, (6.0, 9L)) == List((9.0, 1L), (7.0, 2L), (6.0, 9L)))
  }
}
