package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Scratch: stage-by-stage timing of the NB lang-id pipeline. */
object Scratch2 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", false).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    def lnDec(c: org.apache.spark.sql.Column) =
      log(c.cast("double")).cast("decimal(17,10)")
    for (r <- 1 to 2) {
      var t0 = System.nanoTime()
      def lap(tag: String): Unit = {
        println(f"r$r $tag: ${(System.nanoTime() - t0) / 1e9}%.3f s")
        t0 = System.nanoTime()
      }
      val docGrams = graft.operators.Scale.spreadForCompute(
          docs.filter(col("text").isNotNull), col("doc_id"))
        .select(col("doc_id"), col("lang").as("__actual"), explode(expr(
          "transform(sequence(1, greatest(length(text) - 2, 1))," +
            " i -> substring(text, i, 3))")).as("__g"))
        .groupBy(col("doc_id"), col("__actual"), col("__g"))
        .agg(count(lit(1)).as("__dn"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      println(s"  docGrams rows=${docGrams.count()}")
      lap("docGrams")
      val weights = docGrams.filter(col("__actual").isNotNull)
        .groupBy(col("__actual").as("__lang"), col("__g"))
        .agg(sum(col("__dn")).as("__c"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      println(s"  weights rows=${weights.count()}")
      lap("weights")
      val langTotals = weights.groupBy("__lang").agg(sum(col("__c")).as("__t"))
      val vocab = weights.select("__g").distinct().agg(count(lit(1)).as("__v"))
      val docTotals = docGrams.groupBy(col("doc_id"))
        .agg(sum(col("__dn")).as("__n"))
      val firstTerm = docGrams.drop("__actual")
        .join(weights.withColumnRenamed("__g", "__gw"),
          col("__g") === col("__gw"))
        .groupBy(col("doc_id"), col("__lang"))
        .agg(sum(col("__dn") * lnDec(col("__c") + 1)).as("__s1"))
      println(s"  firstTerm rows=${firstTerm.count()}")
      lap("firstTerm")
      val base = docTotals
        .crossJoin(broadcast(langTotals.crossJoin(vocab)
          .select(col("__lang"), lnDec(col("__t") + col("__v")).as("__pen1"))))
        .select(col("doc_id"), col("__lang"),
          (col("__n") * col("__pen1")).as("__pen"))
      val scored = base.join(firstTerm, Seq("doc_id", "__lang"), "left")
        .select(col("doc_id"), col("__lang"),
          (coalesce(col("__s1"), lit(0).cast("decimal(38,10)")) - col("__pen"))
            .as("__sc"))
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("doc_id").orderBy(col("__sc").desc, col("__lang"))
      val pred = scored.withColumn("__rn", row_number().over(w))
        .filter(col("__rn") === 1)
      println(s"  pred rows=${pred.count()}")
      lap("pred")
      docGrams.unpersist(); weights.unpersist()
    }
    spark.stop()
  }
}
