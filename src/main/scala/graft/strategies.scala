package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, StringType}

/**
 * The expression compiler: each [[Strategy]] compiles to a single Catalyst
 * `Column` built purely from `org.apache.spark.sql.functions._` — all
 * codegen'd, no UDFs, so the whole anonymization pass stays inside one
 * whole-stage-codegen loop regardless of how many columns are transformed.
 *
 * Semantics are bit-for-bit the reference's SQL fragments
 * (`src/executor/query-builder.ts:21-51`), including the quirks:
 *  - HASH_SHA256 is md5 (hex), NULL → md5('') = d41d8cd9…  (non-NULL out)
 *  - EMAIL_FAKE  is md5(col)||'@example.com', deterministic
 *  - TRUNCATE    NULL → '' ; n defaults to 4
 *  - REDACT / SET_NULL are unconditional over every row
 *  - unknown strategies are a silent no-op
 */
object Strategies {
  import Strategy._

  private def asText(c: Column): Column = coalesce(c.cast(StringType), lit(""))

  /**
   * Compile one column's strategy. `dt` is the column's pre-transform type
   * (needed so SET_NULL preserves the original type, as the in-place UPDATE
   * of the reference implicitly did).
   */
  def compile(colName: String, strategy: Strategy, params: StrategyParams, dt: DataType): Column = {
    val c = col(colName)
    val out = strategy match {
      case Keep        => c
      case SetNull     => lit(null).cast(dt)
      case Redact      => lit("***")
      case HashSha256  => md5(asText(c))
      case Truncate    => substring(asText(c), 1, params.n.getOrElse(4))
      case EmailFake   => concat(md5(asText(c)), lit("@example.com"))
      case Unknown(_)  => c // silent no-op (query-builder.ts:48-50)
    }
    out.as(colName)
  }

  /**
   * Type-safety normalization (reference `src/executor/executor.ts:45-85`):
   * EMAIL_FAKE/REDACT/TRUNCATE require a STRING column; HASH_SHA256 allows
   * STRING or OTHER; KEEP/SET_NULL always pass; violations downgrade to KEEP.
   */
  def normalize(strategy: Strategy, group: TypeGroup): Strategy = strategy match {
    case EmailFake | Redact | Truncate if group != TypeGroup.STRING => Keep
    case HashSha256 if group != TypeGroup.STRING && group != TypeGroup.OTHER => Keep
    case s => s
  }

  /** Normalize against a Spark DataType directly. */
  def normalizeFor(strategy: Strategy, dt: DataType): Strategy =
    normalize(strategy, TypeMap.group(dt))

  /**
   * Sample masking for config previews (reference `src/pi/patterns.ts:3-9`):
   * NULL/'' pass through, length ≤ 6 → '***', else first2 + '***' + last2.
   */
  def maskSample(c: Column): Column =
    when(c.isNull || c === lit(""), c)
      .when(length(c) <= 6, lit("***"))
      .otherwise(concat(substring(c, 1, 2), lit("***"), substring(c, -2, 2)))
}
