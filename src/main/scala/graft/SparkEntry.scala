package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q_anonymize_full")(spark, "/root/testdata/sf0.001")
  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.Core.queries ++ graft.queries.Relational.queries ++
      graft.queries.Events.queries ++ graft.queries.Pipeline.queries ++
      graft.queries.Privacy.queries
  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    graft.queries.Core.oracles ++ graft.queries.Relational.oracles ++
      graft.queries.Events.oracles ++ graft.queries.Pipeline.oracles ++
      graft.queries.Privacy.oracles
  /** Local-iteration subset filter shared by Verify and Bench:
    * SPARK_GRAFT_ONLY="q_a, q_b" selects just those queries (whitespace
    * tolerated). The driver never sets it, so its runs stay exhaustive. */
  def selectedQueries: Map[String, (SparkSession, String) => DataFrame] =
    sys.env.get("SPARK_GRAFT_ONLY") match {
      case Some(ks) =>
        val set = ks.split(",").map(_.trim).filter(_.nonEmpty).toSet
        queries.filter { case (k, _) => set(k) }
      case None => queries
    }
}
