package graft

import graft.operators.{Dedup, Scale, Similarity}
import graft.functions.VectorOps
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Skew salting and the LSH embedding-dedup scale path. */
class ScaleSpec extends SparkSpec {

  test("saltedJoin returns exactly the plain join's rows, salt column dropped") {
    import spark.implicits._
    // heavily skewed: 90 rows of key 1, a few of others
    val large = ((1 to 90).map(i => (1L, s"v$i")) ++ Seq((2L, "x"), (3L, "y")))
      .toDF("k", "v")
    val small = Seq((1L, "one"), (2L, "two"), (4L, "four")).toDF("k", "name")
    val plain = large.join(small, Seq("k")).select("k", "v", "name")
      .orderBy("k", "v").collect().toSeq
    val salted = Scale.saltedJoin(large, small, "k", saltFactor = 8,
      saltFrom = Seq("k", "v")).select("k", "v", "name")
      .orderBy("k", "v").collect().toSeq
    assert(salted == plain)
    assert(salted.length == 91)
  }

  test("LSH embedding near-dup finds the planted duplicate pair, no O(n^2)") {
    val base = Seq.tabulate(8)(i => math.sin(i + 1.0))
    val near = base.updated(0, base.head * 1.01)
    val far = Seq.tabulate(8)(i => math.cos(3.0 * i) * (if (i % 2 == 0) 1 else -1))
    val df = spark.createDataFrame(
      java.util.Arrays.asList(Row(1L, base), Row(2L, near), Row(3L, far)),
      StructType(Seq(StructField("vec_id", LongType),
        StructField("emb", ArrayType(DoubleType)))))
    val planes = Similarity.hyperplanes(4, 8)
    val out = Dedup.embeddingNearDupsLsh(df, "vec_id", "emb", 0.99, planes)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(out.toSeq == Seq((1L, 2L)))
    // exact variant agrees on this fixture
    val exact = Dedup.embeddingNearDupsExact(df, "vec_id", "emb", 0.99)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(exact.toSeq == Seq((1L, 2L)))
  }

  test("upsert: change rows replace base rows by key; new keys insert") {
    import spark.implicits._
    val base = Seq((1L, "a", 0), (2L, "b", 0), (3L, "c", 0))
      .toDF("k", "v", "version")
    val changes = Seq((2L, "B", 1), (4L, "D", 1)).toDF("k", "v", "version")
    val out = Scale.upsert(base, changes, Seq("k"), "version")
      .orderBy("k").collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(out == Seq((1L, "a"), (2L, "B"), (3L, "c"), (4L, "D")))
  }

  test("profile: per-column null/distinct/min/max in one aggregate pass") {
    import spark.implicits._
    val df = Seq((Some(1L), "x"), (Some(2L), "y"), (None, "y"))
      .toDF("id", "s")
    val out = Scale.profile(df, Seq("id", "s")).orderBy("column_name")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getString(4), r.getString(5))).toSeq
    assert(out == Seq(
      ("id", 3L, 2L, 2L, "1", "2"),
      ("s", 3L, 3L, 2L, "x", "y")))
  }
}
