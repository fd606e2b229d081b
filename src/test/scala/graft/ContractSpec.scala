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
}
