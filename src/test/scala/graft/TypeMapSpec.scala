package graft

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Type grouping parity (reference `src/schema/type-mapper.ts:12-62`). */
class TypeMapSpec extends AnyFunSuite {
  import TypeGroup._

  test("Spark DataType grouping") {
    assert(TypeMap.group(StringType) == STRING)
    assert(TypeMap.group(IntegerType) == NUMBER)
    assert(TypeMap.group(DoubleType) == NUMBER)
    assert(TypeMap.group(DecimalType(10, 2)) == NUMBER)
    assert(TypeMap.group(BooleanType) == BOOLEAN)
    assert(TypeMap.group(TimestampType) == DATE)
    assert(TypeMap.group(DateType) == DATE)
    assert(TypeMap.group(ArrayType(FloatType)) == OTHER)
    assert(TypeMap.group(BinaryType) == OTHER)
  }

  test("PG-name grouping: udt preferred, contains-based matching") {
    assert(TypeMap.groupOfPgName("character varying", Some("varchar")) == STRING)
    assert(TypeMap.groupOfPgName("ARRAY", Some("_numeric")) == NUMBER) // array udt
    assert(TypeMap.groupOfPgName("integer", Some("int4")) == NUMBER)
    assert(TypeMap.groupOfPgName("boolean", None) == BOOLEAN)
    assert(TypeMap.groupOfPgName("timestamp without time zone", Some("timestamp")) == DATE)
    assert(TypeMap.groupOfPgName("jsonb", Some("jsonb")) == JSON)
    assert(TypeMap.groupOfPgName("uuid", Some("uuid")) == UUID)
    assert(TypeMap.groupOfPgName("tsvector", Some("tsvector")) == OTHER)
  }

  test("dt-based checks fire even when udt is present (reference quirk)") {
    // dt says character/text → STRING even with an exotic udt
    assert(TypeMap.groupOfPgName("character varying", Some("citext")) == STRING)
    // timestamp check reads dt, not udt
    assert(TypeMap.groupOfPgName("timestamp with time zone", Some("timestamptz")) == DATE)
  }
}
