package graft

/**
 * Config → Plan resolution (reference `src/planner/plan-builder.ts:19-107`)
 * and preflight gates (`src/validators/preflight.ts:3-21`). Pure driver-side
 * functions — no Spark types, no row data.
 */
object Planner {

  /**
   * Strategy resolution precedence per column
   * (`plan-builder.ts:19-47`):
   *   1. any entry in the table's rule list for this column **with an
   *      explicit strategy** — the reference searches the whole list
   *      (`plan-builder.ts:25-27`), so `[{column: c}, {column: c,
   *      strategy: REDACT}]` resolves REDACT for both entries
   *   2. global column_strategy, iterated in insertion order
   *      (`plan-builder.ts:37-43`; array-valued entries only — our typed
   *      model makes them all Seq-valued, so that guard is structural)
   *   3. default KEEP
   */
  def resolveStrategy(
      columnName: String,
      tableColumns: Seq[ColumnRule],
      global: Seq[(String, Seq[String])]): PlannedColumn = {
    tableColumns.find(c => c.column == columnName && c.strategy.isDefined) match {
      case Some(over) =>
        PlannedColumn(columnName, Strategy.parse(over.strategy.get), over.params)
      case None =>
        val fromGlobal = global.collectFirst {
          case (strat, cols) if cols.contains(columnName) => Strategy.parse(strat)
        }
        PlannedColumn(columnName, fromGlobal.getOrElse(Strategy.Keep))
    }
  }

  /**
   * Split `schema.table`, exactly as the reference does
   * (`plan-builder.ts:52-60`): `full.split(".")` destructured to the FIRST
   * two segments — extra dot-segments are silently dropped, and only a
   * missing/empty schema or name throws "Invalid table name".
   */
  def splitTable(table: String): (String, String) = {
    val parts = table.split("\\.", -1)
    if (parts.length >= 2 && parts(0).nonEmpty && parts(1).nonEmpty)
      (parts(0), parts(1))
    else
      throw new IllegalArgumentException(
        s"""Invalid table name "$table". Expected format: schema.table""")
  }

  /**
   * Denylist match: the raw `rule.table` string OR the bare table name
   * (`plan-builder.ts:70-75`).
   */
  def isDenied(rawTable: String, bareName: String, denylist: Seq[String]): Boolean =
    denylist.contains(rawTable) || denylist.contains(bareName)

  /**
   * Build the full plan: drop disabled rules, drop denylisted tables, resolve
   * every listed column (`plan-builder.ts:65-107`). Columns NOT listed in a
   * rule are simply absent from the plan — the engine carries them through
   * unchanged, matching the reference's UPDATE that only SETs planned columns.
   */
  def buildPlan(config: Config, createdAt: String): Plan = {
    val tables = config.rules
      .filter { rule =>
        rule.enabled && !isDenied(rule.table, Planner.splitTable(rule.table)._2,
          config.scope.denylistTables)
      }
      .map { rule =>
        val (schema, name) = splitTable(rule.table)
        val cols = rule.columns.map { cr =>
          resolveStrategy(cr.column, rule.columns, config.columnStrategy)
        }
        PlannedTable(rule.table, schema, name, cols)
      }
    Plan(createdAt, tables)
  }

  sealed trait Mode
  case object DryRun extends Mode
  case object Apply extends Mode

  /**
   * Preflight gates (`preflight.ts:3-21`): version must be 1; `reviewed`
   * required for apply only; ≥1 enabled table; non-empty column_strategy.
   * Returns the list of violations (empty = valid).
   */
  def preflight(config: Config, mode: Mode): Seq[String] = {
    val errs = Seq.newBuilder[String]
    if (config.version != 1)
      errs += s"unsupported config version: ${config.version}"
    if (mode == Apply && !config.reviewed)
      errs += "config must be reviewed before apply (set reviewed: true)"
    if (!config.rules.exists(_.enabled))
      errs += "no enabled tables in config"
    if (config.columnStrategy.isEmpty)
      errs += "column_strategy must not be empty"
    errs.result()
  }
}
