package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch: print context around Exchange SinglePartition in named plans. */
object PlanProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", false).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (n <- args) {
      val p = graft.SparkEntry.queries(n)(spark, "/root/testdata/sf0.001")
        .queryExecution.executedPlan.toString
      val ls = p.split("\n")
      val hits = ls.zipWithIndex.filter(_._1.contains("Exchange SinglePartition"))
      println(s"=== $n: ${hits.length} hits")
      hits.foreach { case (_, i) =>
        (math.max(0, i - 3) to math.min(ls.length - 1, i + 4)).foreach { j =>
          println(s"  $j| ${ls(j).trim.take(150)}")
        }
        println("  ---")
      }
    }
    spark.stop()
  }
}
