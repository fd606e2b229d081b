package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch: time one registered query standalone at a given sf dir. */
object ScratchOne {
  def main(args: Array[String]): Unit = {
    val name = args(0); val dir = args(1)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", false).getOrCreate()
    var i = 0
    while (i < args.drop(2).headOption.map(_.toInt).getOrElse(1)) {
      val t0 = System.nanoTime()
      val n = graft.SparkEntry.queries(name)(spark, dir).count()
      println(s"RUN$i $name: ${(System.nanoTime()-t0)/1e9}%.3f s, rows=$n"
        .replace("%.3f", ""))
      i += 1
    }
    spark.stop()
  }
}
