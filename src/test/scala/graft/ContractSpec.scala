package graft

/**
 * Driver-contract regression net: the queries/oracle key relationship stays
 * consistent, and every registered query actually executes at sf0.001.
 */
class ContractSpec extends SparkSpec {

  /** Queries intentionally registered WITHOUT a SQL oracle (engine-specific
    * hashing or training); the driver records a rows-only check for these
    * and ScalaTest owns their semantics. */
  private val rowsOnly = Set.empty[String]

  test("every oracle key names a registered query") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracle entries without queries: $orphans")
  }

  test("every query without an oracle is on the known rows-only list") {
    val missing = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(missing == rowsOnly,
      s"unexpected oracle-less queries: ${missing -- rowsOnly}; " +
        s"stale rows-only entries: ${rowsOnly -- missing}")
  }

  test("every oracle is deterministic: a full ORDER BY is present") {
    // heuristic: the LAST "ORDER BY" must come after the LAST "OVER" so a
    // window-only ORDER BY (which does not order the result) cannot satisfy
    // the check on its own
    val unordered = SparkEntry.oracleSql.collect {
      case (name, sql)
          if sql.toUpperCase.lastIndexOf("ORDER BY") <
            math.max(0, sql.toUpperCase.lastIndexOf("OVER")) ||
            !sql.toUpperCase.contains("ORDER BY") => name
    }
    assert(unordered.isEmpty, s"oracles without outer ORDER BY: $unordered")
  }

  test("every registered query executes at sf0.001") {
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        try { fn(spark, "/root/testdata/sf0.001").count(); None }
        catch { case e: Throwable => Some(s"$name: ${e.getMessage}") }
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }

  test("every registered query executes on EMPTY and ONE-ROW fixtures") {
    // The degenerate-input sweep as a single harness instead of per-
    // operator spot checks: schema-preserving limit(n) copies of every
    // fixture table, then the full query map against each. Catches the
    // whole class of empty-input failures (head() on nothing, seeds from
    // an empty corpus, aggregates feeding NULL into required casts) for
    // every FUTURE query too — registration alone buys the guarantee.
    for (n <- Seq(0, 1)) {
      val dir = java.nio.file.Files.createTempDirectory(s"graft_fix$n").toString
      Tables.names.foreach { t =>
        spark.read.parquet(s"/root/testdata/sf0.001/$t.parquet")
          .limit(n).write.parquet(s"$dir/$t.parquet")
      }
      val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
        case (name, fn) =>
          try { fn(spark, dir).count(); None }
          catch { case e: Throwable => Some(s"[$n-row] $name: ${e.getMessage}") }
      }
      assert(failures.isEmpty, failures.mkString("\n"))
    }
  }
}
