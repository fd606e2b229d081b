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
   *   1. table-level rule **with an explicit strategy**
   *   2. global column_strategy — array-valued entries only (the reference's
   *      `Array.isArray` guard at `plan-builder.ts:38-42` silently ignores
   *      object-valued entries; our typed model makes them all Seq-valued,
   *      so the guard is structural)
   *   3. default KEEP
   */
  def resolveStrategy(
      rule: Option[ColumnRule],
      columnName: String,
      global: Map[String, Seq[String]]): PlannedColumn = {
    rule.flatMap(r => r.strategy.map(s => (s, r.params))) match {
      case Some((name, params)) =>
        PlannedColumn(columnName, Strategy.parse(name), params)
      case None =>
        val fromGlobal = global.collectFirst {
          case (strat, cols) if cols.contains(columnName) => Strategy.parse(strat)
        }
        PlannedColumn(columnName, fromGlobal.getOrElse(Strategy.Keep))
    }
  }

  /**
   * Denylist match: either the full `schema.table` or the bare table name
   * (`plan-builder.ts:73-75`).
   */
  def isDenied(schema: String, name: String, denylist: Seq[String]): Boolean =
    denylist.contains(s"$schema.$name") || denylist.contains(name)

  private def splitTable(table: String, defaultSchema: String): (String, String) =
    table.split("\\.", 2) match {
      case Array(s, n) => (s, n)
      case Array(n)    => (defaultSchema, n)
    }

  /**
   * Build the full plan: drop disabled rules, drop denylisted tables, resolve
   * every listed column (`plan-builder.ts:65-107`). Columns NOT listed in a
   * rule are simply absent from the plan — the engine carries them through
   * unchanged, matching the reference's UPDATE that only SETs planned columns.
   */
  def buildPlan(config: Config, createdAt: String): Plan = {
    val tables = config.rules
      .filter(_.enabled)
      .flatMap { rule =>
        val (schema, name) = splitTable(rule.table, config.scope.schema)
        if (isDenied(schema, name, config.scope.denylistTables)) None
        else {
          val cols = rule.columns.map { cr =>
            resolveStrategy(Some(cr), cr.column, config.columnStrategy)
          }
          Some(PlannedTable(s"$schema.$name", schema, name, cols))
        }
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
