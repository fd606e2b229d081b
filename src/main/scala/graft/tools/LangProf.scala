package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel
object LangProf {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", false).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    def lnDec(c: org.apache.spark.sql.Column) = log(c.cast("double")).cast("decimal(17,10)")
    for (r <- 1 to 2) {
      var t0 = System.nanoTime()
      val docGrams = docs.filter(col("text").isNotNull)
        .repartition(32, col("doc_id"))
        .select(col("doc_id"), col("lang").as("__actual"), explode(expr(
          s"transform(sequence(1, greatest(length(text) - 2, 1)), i -> substring(text, i, 3))")).as("__g"))
        .groupBy(col("doc_id"), col("__actual"), col("__g"))
        .agg(count(lit(1)).as("__dn"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      println(s"r$r docGrams: ${docGrams.count()} rows in ${(System.nanoTime()-t0)/1e9}s")
      t0 = System.nanoTime()
      val weights = docGrams.filter(col("__actual").isNotNull)
        .groupBy(col("__actual").as("__lang"), col("__g"))
        .agg(sum(col("__dn")).as("__c"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      println(s"r$r weights: ${weights.count()} rows in ${(System.nanoTime()-t0)/1e9}s")
      t0 = System.nanoTime()
      val firstTerm = docGrams.drop("__actual")
        .join(weights.withColumnRenamed("__g", "__gw"), col("__g") === col("__gw"))
        .groupBy(col("doc_id"), col("__lang"))
        .agg(sum(col("__dn") * lnDec(col("__c") + 1)).as("__s1"))
      println(s"r$r firstTerm: ${firstTerm.count()} rows in ${(System.nanoTime()-t0)/1e9}s")
      t0 = System.nanoTime()
      val ft2 = docGrams.drop("__actual")
        .join(weights.withColumnRenamed("__g", "__gw"), col("__g") === col("__gw"))
        .groupBy(col("doc_id"), col("__lang"))
        .agg(count(lit(1)).as("__s1"))
      println(s"r$r firstTermCountOnly: ${ft2.count()} rows in ${(System.nanoTime()-t0)/1e9}s")
      docGrams.unpersist(true); weights.unpersist(true)
    }
    spark.stop()
  }
}
