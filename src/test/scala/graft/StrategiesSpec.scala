package graft

import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._

/**
 * Quirk-parity tests for the strategy expression compiler — the FIXTURES.md
 * §B expected-behavior table (reference `src/executor/query-builder.ts:21-51`,
 * `src/pi/patterns.ts:3-9`).
 */
class StrategiesSpec extends SparkSpec {
  import Strategy._

  private val emptyMd5 = "d41d8cd98f00b204e9800998ecf8427e"

  private def applyStrategy(st: Strategy, values: Seq[String],
      params: StrategyParams = StrategyParams.empty): Seq[String] =
    collectStrings(strDf("c", values)
      .select(Strategies.compile("c", st, params, StringType)))

  test("HASH_SHA256 computes md5 hex; NULL hashes to md5('') — non-NULL out") {
    val out = applyStrategy(HashSha256, Seq("Customer#000000001", null))
    assert(out.head == md5Hex("Customer#000000001"))
    assert(out(1) == emptyMd5)
  }

  test("EMAIL_FAKE is deterministic md5 || @example.com; NULL gets empty-md5 mail") {
    val out = applyStrategy(EmailFake, Seq("alice", "alice", null))
    assert(out(0) == md5Hex("alice") + "@example.com")
    assert(out(0) == out(1))
    assert(out(2) == s"$emptyMd5@example.com")
  }

  test("TRUNCATE defaults to n=4 and maps NULL to empty string") {
    assert(applyStrategy(Truncate, Seq("BUILDING", null)) == Seq("BUIL", ""))
    assert(applyStrategy(Truncate, Seq("BUILDING"), StrategyParams(Some(2))) == Seq("BU"))
  }

  test("REDACT and SET_NULL are unconditional over every row, NULLs included") {
    assert(applyStrategy(Redact, Seq("x", null)) == Seq("***", "***"))
    assert(applyStrategy(SetNull, Seq("x", null)) == Seq(null, null))
  }

  test("SET_NULL preserves the original column type") {
    val df = spark.createDataFrame(
      java.util.Arrays.asList(org.apache.spark.sql.Row(java.lang.Double.valueOf(1.5))),
      StructType(Seq(StructField("d", DoubleType, nullable = true))))
    val out = df.select(Strategies.compile("d", SetNull, StrategyParams.empty, DoubleType))
    assert(out.schema.head.dataType == DoubleType)
    assert(out.collect().head.isNullAt(0))
  }

  test("unknown strategies are a silent no-op") {
    assert(applyStrategy(Unknown("SCRAMBLE"), Seq("keepme", null)) == Seq("keepme", null))
  }

  test("maskSample: falsy passthrough, <=6 chars → '***', else 2+'***'+2") {
    val out = collectStrings(strDf("c", Seq(null, "", "abcdef", "abcdefg", "ab"))
      .select(Strategies.maskSample(col("c"))))
    assert(out == Seq(null, "", "***", "ab***fg", "***"))
  }

  test("type-safety: EMAIL/REDACT/TRUNCATE need STRING; HASH allows STRING|OTHER") {
    import TypeGroup._
    for (st <- Seq(EmailFake, Redact, Truncate)) {
      assert(Strategies.normalize(st, STRING) == st)
      for (g <- Seq(NUMBER, BOOLEAN, DATE, JSON, UUID, OTHER))
        assert(Strategies.normalize(st, g) == Keep, s"$st over $g")
    }
    assert(Strategies.normalize(HashSha256, STRING) == HashSha256)
    assert(Strategies.normalize(HashSha256, OTHER) == HashSha256)
    assert(Strategies.normalize(HashSha256, NUMBER) == Keep)
    for (g <- Seq(STRING, NUMBER, BOOLEAN, DATE, JSON, UUID, OTHER)) {
      assert(Strategies.normalize(Keep, g) == Keep)
      assert(Strategies.normalize(SetNull, g) == SetNull)
    }
  }

  test("strategy parse: builtins round-trip, anything else is Unknown") {
    assert(Strategy.parse("HASH_SHA256") == HashSha256)
    assert(Strategy.parse("nope") == Unknown("nope"))
  }

  private def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
}
