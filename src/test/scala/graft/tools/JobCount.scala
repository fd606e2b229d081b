package graft.tools

import graft.SparkEntry
import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted}

/**
 * Overhead probe: `Test/runMain graft.tools.JobCount <query> [sfDir]` warms the
 * query at sf0.001, then runs it once and prints wall-clock + Spark
 * job/stage counts — the companion to [[Explain]] for deciding whether a
 * slow small-scale number is data work or fixed per-job overhead (an
 * AQE stage materialization costs ~100ms locally; 30 jobs ≈ 3s of
 * overhead that vanishes at cluster scale while data cost grows).
 */
object JobCount {
  def main(args: Array[String]): Unit = {
    val q = args(0); val dir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions","32")
      .config("spark.sql.session.timeZone","UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong","true")
      .config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm
    try SparkEntry.queries(q)(spark, "/root/testdata/sf0.001").count() catch { case _: Throwable => () }
    spark.sharedState.cacheManager.clearCache()
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
    @volatile var jobs = 0; @volatile var stages = 0
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = { jobs += 1 }
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = { stages += 1 }
    })
    val t0 = System.nanoTime()
    val n = SparkEntry.queries(q)(spark, dir).count()
    val sec = (System.nanoTime()-t0)/1e9
    org.apache.spark.GraftListenerBridge.waitForListeners(spark.sparkContext)
    println(f"query=$q rows=$n sec=$sec%.3f jobs=$jobs stages=$stages")
    spark.stop()
  }
}
