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

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Full catalog for a scale-factor directory. */
  def catalog(spark: SparkSession, dir: String): Map[String, DataFrame] =
    names.map(n => n -> load(spark, dir, n)).toMap
}
