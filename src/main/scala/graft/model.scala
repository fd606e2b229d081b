package graft

/**
 * Core data model of the anonymization engine.
 *
 * Mirrors the reference's config/plan shapes (semantics, not code):
 *  - strategy enum: reference `src/config/generated-config.types.ts:1-7`
 *  - config tree:   reference `src/config/generated-config.types.ts:25-44`
 *  - plan tree:     reference `src/planner/plan-types.ts:4-21`
 */
sealed abstract class Strategy(val name: String)

object Strategy {
  /** No-op; column is carried through unchanged. */
  case object Keep extends Strategy("KEEP")
  /** Unconditionally NULL every row (reference `query-builder.ts:25-26`). */
  case object SetNull extends Strategy("SET_NULL")
  /** Unconditionally `'***'` every row, NULLs included (`query-builder.ts:29-30`). */
  case object Redact extends Strategy("REDACT")
  /**
   * Despite the name, the reference computes **md5** hex
   * (`query-builder.ts:33-34`); NULL hashes to md5("") — non-NULL out.
   */
  case object HashSha256 extends Strategy("HASH_SHA256")
  /** LEFT(coalesce(col,''), n), n defaults to 4 (`query-builder.ts:37-42`). */
  case object Truncate extends Strategy("TRUNCATE")
  /** Deterministic `md5(col) || '@example.com'` (`query-builder.ts:44-45`). */
  case object EmailFake extends Strategy("EMAIL_FAKE")
  /** Unknown names survive parsing and compile to a no-op (`query-builder.ts:48-50`). */
  final case class Unknown(raw: String) extends Strategy(raw)

  val builtins: Seq[Strategy] =
    Seq(Keep, SetNull, Redact, HashSha256, Truncate, EmailFake)

  def parse(s: String): Strategy =
    builtins.find(_.name == s).getOrElse(Unknown(s))
}

/** 7-way column type grouping (reference `src/schema/type-mapper.ts:3-10`). */
sealed trait TypeGroup
object TypeGroup {
  case object STRING extends TypeGroup
  case object NUMBER extends TypeGroup
  case object BOOLEAN extends TypeGroup
  case object DATE extends TypeGroup
  case object JSON extends TypeGroup
  case object UUID extends TypeGroup
  case object OTHER extends TypeGroup
}

/** Per-strategy parameters; today only TRUNCATE's `n` (`query-builder.ts:37-42`). */
final case class StrategyParams(n: Option[Int] = None)
object StrategyParams { val empty: StrategyParams = StrategyParams() }

/** One column entry of a table rule (`generated-config.types.ts:14-19`). */
final case class ColumnRule(
    column: String,
    strategy: Option[String] = None,
    params: StrategyParams = StrategyParams.empty)

/** One table rule (`generated-config.types.ts:9-13`). */
final case class TableRule(
    table: String,
    enabled: Boolean = true,
    columns: Seq[ColumnRule] = Nil)

/** Scope block (`generated-config.types.ts:28-32`). */
final case class Scope(schema: String = "public", denylistTables: Seq[String] = Nil)

/** Samples block — stored but unused downstream, kept for config parity. */
final case class Samples(limit: Int = 3, masked: Boolean = true)

/**
 * Full generated config (`generated-config.types.ts:25-44`).
 * `columnStrategy` is the global name-keyed map: strategy -> column names
 * it applies to everywhere (`config-generator.ts:11-17`). It is an ordered
 * sequence of pairs, not a Map: the reference iterates the YAML object in
 * insertion order (`plan-builder.ts:37-43`), and a column listed under two
 * strategies resolves to the FIRST.
 */
final case class Config(
    version: Int = 1,
    generatedAt: String = "",
    reviewed: Boolean = false,
    scope: Scope = Scope(),
    samples: Samples = Samples(),
    columnStrategy: Seq[(String, Seq[String])] = Nil,
    rules: Seq[TableRule] = Nil)

/** Resolved per-column action (`plan-types.ts:4-9`). */
final case class PlannedColumn(
    column: String,
    strategy: Strategy,
    params: StrategyParams = StrategyParams.empty)

/** Resolved per-table plan (`plan-types.ts:11-16`). */
final case class PlannedTable(
    table: String,   // full "schema.name"
    schema: String,
    name: String,
    columns: Seq[PlannedColumn])

/** Whole-run plan (`plan-types.ts:18-21`). */
final case class Plan(createdAt: String, tables: Seq[PlannedTable])
