package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * Table catalog over the harness parquet layout (`TESTDATA.md`): one parquet
 * file per table under an sf directory. The Spark analogue of the reference's
 * information_schema introspection (`src/schema/schema-reader.ts:16-37`) —
 * parquet schemas are self-describing, so listing + `df.schema` replaces the
 * two metadata queries.
 */
object Tables {
  /** All harness tables, sorted (the reference sorts by table_name). */
  val names: Seq[String] = Seq(
    "customer", "documents", "embeddings", "events", "lineitem",
    "nation", "orders", "part", "region", "supplier")

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    // events.parquet carries TIMESTAMP(NANOS); Spark only reads those as
    // raw nanos-longs (see queries.Q.tsCol for the conversion back).
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$dir/$name.parquet")
  }

  /** Full catalog for a scale-factor directory. */
  def catalog(spark: SparkSession, dir: String): Map[String, DataFrame] =
    names.map(n => n -> load(spark, dir, n)).toMap

  /**
   * Catalog by directory listing — any `<table>.parquet` under `dir`, sorted
   * by name (the reference's information_schema scan orders by table_name,
   * `schema-reader.ts:22`). Listing is driver-side metadata only.
   */
  def catalogFromDir(spark: SparkSession, dir: String): Map[String, DataFrame] = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val files = Option(new java.io.File(dir).listFiles()).getOrElse(Array.empty)
    // ListMap keeps the sorted-name iteration order (a plain Map would
    // rehash it away)
    scala.collection.immutable.ListMap(
      files.filter(_.getName.endsWith(".parquet")).sortBy(_.getName)
        .map(f => f.getName.stripSuffix(".parquet") -> spark.read.parquet(f.getPath))
        .toSeq: _*)
  }
}
