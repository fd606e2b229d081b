package graft

import graft.sources.Sources
import org.apache.spark.sql.functions._

/** Source/sink round-trips beyond parquet (generic engine capability; the
  * reference's only source is Postgres, mapped to Sources.jdbc). */
class SourcesSpec extends SparkSpec {

  private lazy val customer =
    queries.Q.t(spark, "/root/testdata/sf0.001", "customer")

  test("csv round-trip preserves rows and (declared) schema") {
    val dir = java.nio.file.Files.createTempDirectory("graft-csv").toString
    customer.write.mode("overwrite").option("header", "true").csv(dir)
    val back = spark.read.option("header", "true").schema(customer.schema).csv(dir)
    assert(back.count() == customer.count())
    assert(back.schema == customer.schema)
    val a = customer.orderBy("c_custkey").collect().toSeq
    val b = back.orderBy("c_custkey").collect().toSeq
    assert(a == b)
  }

  test("json-lines round-trip preserves rows") {
    val dir = java.nio.file.Files.createTempDirectory("graft-json").toString
    customer.write.mode("overwrite").json(dir)
    val back = spark.read.schema(customer.schema).json(dir)
    assert(back.orderBy("c_custkey").collect().toSeq ==
      customer.orderBy("c_custkey").collect().toSeq)
  }

  test("orc round-trip preserves rows and schema") {
    val dir = java.nio.file.Files.createTempDirectory("graft-orc").toString
    Sources.writeOrc(customer, dir)
    val back = Sources.orc(spark, dir)
    assert(back.schema == customer.schema)
    assert(back.orderBy("c_custkey").collect().toSeq ==
      customer.orderBy("c_custkey").collect().toSeq)
  }

  test("parquet sink/source round-trip via Sources helpers") {
    val dir = java.nio.file.Files.createTempDirectory("graft-pq").toString
    Sources.writeParquet(customer, dir)
    val back = Sources.parquet(spark, dir)
    assert(back.count() == customer.count())
  }

  test("partitioned layout: partition filter prunes at planning time") {
    val dir = java.nio.file.Files.createTempDirectory("graft-part").toString
    val events = queries.Q.t(spark, "/root/testdata/sf0.001", "events")
    Sources.writePartitioned(events, dir, Seq("event_type"))
    val back = Sources.readPartitioned(spark, dir)
    // values survive the layout round-trip (partition col moves to the end)
    assert(back.count() == events.count())
    val oneType = back.filter(col("event_type") === "click")
    assert(oneType.count() ==
      events.filter(col("event_type") === "click").count())
    // the predicate must land in PartitionFilters (directory pruning),
    // not in the post-scan Filter: planning-time pruning is what keeps a
    // partition-key query O(selected partitions) at 100 TB.
    val scan = oneType.queryExecution.executedPlan.collectLeaves().head.toString
    assert(scan.contains("PartitionFilters") &&
      scan.replaceAll("(?s).*PartitionFilters: \\[([^\\]]*)\\].*", "$1")
        .contains("event_type"), s"partition filter not pushed:\n$scan")
  }

  test("catalogFromDir lists tables sorted and reads them") {
    val cat = Tables.catalogFromDir(spark, "/root/testdata/sf0.001")
    assert(cat.keySet == Tables.names.toSet)
    assert(cat("region").count() == 5)
  }
}
