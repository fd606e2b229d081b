package graft

import graft.functions.VectorOps
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The custom codegen'd DotProduct expression: value parity with the
  * higher-order-function fold, SQL registration, null/shape edges. */
class DotProductSpec extends SparkSpec {

  private def vecs(rows: (Seq[Double], Seq[Double])*) =
    spark.createDataFrame(
      java.util.Arrays.asList(rows.map { case (a, b) => Row(a, b) }: _*),
      StructType(Seq(StructField("a", ArrayType(DoubleType)),
        StructField("b", ArrayType(DoubleType)))))

  test("matches the HOF fold bit-for-bit on assorted vectors") {
    val df = vecs(
      (Seq(1.5, -2.25, 3.0), Seq(0.5, 4.0, -1.25)),
      (Seq(0.1, 0.2, 0.3), Seq(0.3, 0.2, 0.1)),
      (Seq.tabulate(64)(i => math.sin(i.toDouble)), Seq.tabulate(64)(i => math.cos(i.toDouble))))
    val out = df.select(VectorOps.dot(col("a"), col("b")).as("fast"),
      VectorOps.dotHof(col("a"), col("b")).as("ref")).collect()
    out.foreach(r => assert(
      java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(1))))
  }

  test("registered as SQL function graft_dot via SparkSessionExtensions") {
    val r = spark.sql("SELECT graft_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d")
      .collect().head.getDouble(0)
    assert(r == 11.0)
  }

  test("curation kit registers as SQL functions — same Catalyst trees as " +
      "the Column API, callable from pure SQL") {
    val r = spark.sql(
      """SELECT graft_clean_text(' The  Quick,  FOX!! ') AS clean,
                graft_fingerprint('A  b') AS fp1,
                graft_fingerprint('a b') AS fp2,
                graft_redact_pii('mail bob@x.io or 415-555-1234') AS red,
                graft_canonical_host('https://WWW.Example.org/p?q=1') AS host,
                graft_lang_id(' the cat sat on a mat ') AS lid,
                graft_quality('x') AS q
      """).collect().head
    assert(r.getAs[String]("clean") == "the quick fox")
    assert(r.getAs[String]("fp1") == r.getAs[String]("fp2"),
      "fingerprint is whitespace/case-canonical")
    assert(r.getAs[String]("red") == "mail [EMAIL] or [PHONE]")
    assert(r.getAs[String]("host") == "example.org")
    assert(r.getAs[String]("lid") == "en")
    assert(r.getAs[Double]("q") == 0.0)
    // arity is enforced at registration
    intercept[Exception] {
      spark.sql("SELECT graft_quality('a', 'b')").collect()
    }
    // round-9 additions: HTML extraction and the portable SimHash
    val r2 = spark.sql(
      """SELECT graft_strip_html('<p>Hello <b>world</b></p>') AS txt,
                graft_simhash('a b a') AS sh1,
                graft_simhash('a b a') AS sh2""").collect().head
    assert(r2.getAs[String]("txt") == "Hello world")
    assert(r2.getAs[Long]("sh1") == r2.getAs[Long]("sh2"))
    assert(r2.getAs[Long]("sh1") >= 0L &&
      r2.getAs[Long]("sh1") < (1L << 16))
    // the portable hash primitive, SQL-first — equals the md5-prefix form
    val r3 = spark.sql(
      """SELECT graft_portable_hash('abc') AS fast,
                cast(conv(substring(md5('abc'), 1, 15), 16, 10)
                  AS bigint) AS slow""").collect().head
    assert(r3.getAs[Long]("fast") == r3.getAs[Long]("slow"))
  }

  test("null array → null; length mismatch dots the common prefix") {
    val df = vecs((null, Seq(1.0)), (Seq(1.0, 2.0, 9.0), Seq(3.0, 4.0)))
    val out = df.select(VectorOps.dot(col("a"), col("b"))).collect()
    assert(out(0).isNullAt(0))
    assert(out(1).getDouble(0) == 11.0)
  }

  test("type check rejects non-double arrays") {
    val bad = spark.createDataFrame(
      java.util.Arrays.asList(Row(Seq("x"), Seq("y"))),
      StructType(Seq(StructField("a", ArrayType(StringType)),
        StructField("b", ArrayType(StringType)))))
    assertThrows[org.apache.spark.sql.AnalysisException](
      bad.select(VectorOps.dot(col("a"), col("b"))).collect())
  }
}
