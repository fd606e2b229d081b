package graft

import org.apache.spark.sql.functions._

/**
 * Sketch surface (SURVEY §2.10): the engine's approximate-structure needs
 * are covered by Spark's built-in sketches — `approx_count_distinct`
 * (HLL++, exercised by q_agg_approx), and the `df.stat` builders below —
 * rather than custom UDAFs. Each sketch is built DISTRIBUTED (partial
 * sketches merged on the driver) and is broadcast-sized, which is what
 * makes e.g. a bloom-filter pre-join viable at 100 TB: ship the sketch,
 * not the table.
 */
class SketchesSpec extends SparkSpec {

  private lazy val orders =
    queries.Q.t(spark, "/root/testdata/sf0.001", "orders")
  private lazy val customer =
    queries.Q.t(spark, "/root/testdata/sf0.001", "customer")

  test("bloomFilter: no false negatives; fpp within an order of the ask") {
    val keys = customer.select(col("c_custkey"))
    val n = keys.count()
    val bloom = keys.stat.bloomFilter("c_custkey", n, 0.03)
    // every real key must hit
    val real = keys.collect().map(_.getLong(0))
    assert(real.forall(bloom.mightContain))
    // keys far outside the domain: observed fp rate should be near fpp
    val probes = (1000000L until 1010000L)
    val fp = probes.count(bloom.mightContain).toDouble / probes.size
    assert(fp < 0.1, s"false-positive rate $fp way above requested 0.03")
  }

  test("countMinSketch: estimate >= truth, within eps * total") {
    val cms = orders.stat.countMinSketch("o_custkey", eps = 0.01,
      confidence = 0.95, seed = 42)
    val truth = orders.groupBy("o_custkey").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val total = truth.values.sum
    truth.take(50).foreach { case (k, c) =>
      val est = cms.estimateCount(k)
      assert(est >= c, s"CMS underestimated key $k: $est < $c")
      assert(est <= c + (0.01 * total).toLong + 1,
        s"CMS estimate $est for $k exceeds truth $c + eps*N")
    }
  }

  test("approxQuantile: quantiles land within the relative-error rank band") {
    val err = 0.01
    val Array(q25, q50, q75) =
      orders.stat.approxQuantile("o_totalprice", Array(0.25, 0.5, 0.75), err)
    assert(q25 <= q50 && q50 <= q75)
    val n = orders.count().toDouble
    val below = orders.filter(col("o_totalprice") <= q50).count() / n
    assert(math.abs(below - 0.5) <= err + 0.01,
      s"approx median rank off: $below vs 0.5")
  }

  test("distributed CountMin: estimates bound truth; merge law holds exactly") {
    import operators.CountMin
    val key = col("o_custkey")
    val cells = CountMin.sketch(orders, key)
    // ≤ d·w cells regardless of input size
    assert(cells.count() <= 4L * 256L)
    val truth = orders.groupBy("o_custkey").count()
    val est = CountMin.estimate(cells, truth.select("o_custkey"), "o_custkey")
    val joined = est.join(truth, "o_custkey")
      .select(col("cms_est"), col("count")).collect()
    joined.foreach { r =>
      assert(r.getLong(0) >= r.getLong(1),
        s"CMS underestimated: ${r.getLong(0)} < ${r.getLong(1)}")
    }
    // merge(sketch(A), sketch(B)) == sketch(A ∪ B), cell for cell
    val (a, b) = (orders.filter(key % 2 === 0), orders.filter(key % 2 === 1))
    val merged = CountMin.merge(CountMin.sketch(a, key), CountMin.sketch(b, key))
    assert(merged.exceptAll(cells).isEmpty && cells.exceptAll(merged).isEmpty)
  }

  test("freqItems finds every value more frequent than the support") {
    val fi = orders.stat.freqItems(Array("o_orderstatus"), 0.4)
      .head().getSeq[String](0).toSet
    // 'O' and 'F' each dominate well above 40% support in TPC-H orders
    val top = orders.groupBy("o_orderstatus").count()
      .orderBy(col("count").desc).head().getString(0)
    assert(fi.contains(top))
  }
}
