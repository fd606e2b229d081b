package graft

import org.apache.spark.sql.types._

/**
 * Column-type grouping (reference `src/schema/type-mapper.ts:12-62`).
 *
 * Two entry points:
 *  - [[TypeMap.group]] — the Spark-native path: a parquet/JDBC schema is
 *    authoritative, so grouping pattern-matches on `DataType` directly.
 *  - [[TypeMap.groupOfPgName]] — name-based parity path for configs that
 *    carry Postgres type names (`data_type` / `udt_name`), preserving the
 *    reference's string-matching rules including the udt_name preference
 *    (`type-mapper.ts:18`).
 */
object TypeMap {
  import TypeGroup._

  /**
   * Spark `DataType` → group. JSON/UUID are not distinguishable from a
   * parquet physical schema (both arrive as strings); callers that know
   * better (e.g. a JDBC udt_name) use [[groupOfPgName]].
   */
  def group(dt: DataType): TypeGroup = dt match {
    case StringType | _: VarcharType | _: CharType                   => STRING
    case ByteType | ShortType | IntegerType | LongType               => NUMBER
    case FloatType | DoubleType | _: DecimalType                     => NUMBER
    case BooleanType                                                 => BOOLEAN
    case DateType | TimestampType | TimestampNTZType                 => DATE
    case _                                                           => OTHER
  }

  /**
   * PG name-based grouping, udt_name preferred. Mirrors the reference's
   * contains-based matching exactly (`type-mapper.ts:12-62`): some checks run
   * against `dt` (the declared data_type) even when `udt` is present, and
   * most are substring matches — e.g. array udt `_numeric` is NUMBER,
   * `character varying` matches on dt.
   */
  def groupOfPgName(dataType: String, udtName: Option[String] = None): TypeGroup = {
    val dt = Option(dataType).getOrElse("").toLowerCase
    val udt = udtName.getOrElse("").toLowerCase
    val t = if (udt.nonEmpty) udt else dt
    if (dt.contains("character") || dt.contains("text") ||
        t.contains("varchar") || t.contains("bpchar") || t.contains("char") ||
        t == "citext") STRING
    else if (t.contains("int") || t.contains("numeric") || t.contains("decimal") ||
             t.contains("float") || t.contains("double") || t.contains("real")) NUMBER
    else if (t == "bool" || dt == "boolean") BOOLEAN
    else if (dt.contains("timestamp") || dt.contains("date") || dt.contains("time")) DATE
    else if (t == "json" || t == "jsonb" || dt == "json" || dt == "jsonb") JSON
    else if (t == "uuid" || dt == "uuid") UUID
    else OTHER
  }

  /** Group name as the reference spells it (used in schema-introspection output). */
  def groupName(g: TypeGroup): String = g match {
    case STRING  => "STRING"
    case NUMBER  => "NUMBER"
    case BOOLEAN => "BOOLEAN"
    case DATE    => "DATE"
    case JSON    => "JSON"
    case UUID    => "UUID"
    case OTHER   => "OTHER"
  }
}
