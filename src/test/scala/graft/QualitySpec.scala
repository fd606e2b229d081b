package graft

import graft.operators.Quality
import graft.operators.Quality.RowCheck
import org.apache.spark.sql.functions._

/** Constraint-suite report and drift TVD (operators/Quality.scala). */
class QualitySpec extends SparkSpec {

  private def checks = Seq(
    RowCheck("complete", "v", col("v").isNotNull),
    RowCheck("positive", "x", col("x") > 0))

  test("report: counts failures per constraint in one pass, exact metrics") {
    import spark.implicits._
    val df = Seq((1L, Some("a"), 5), (2L, None, -1), (2L, Some("c"), 0))
      .toDF("id", "v", "x")
    val rep = Quality.report(df, checks, uniqueCols = Seq("id"))
      .orderBy("constraint").collect()
    val byName = rep.map(r => r.getString(0) ->
      (r.getLong(2), r.getDouble(3), r.getBoolean(4))).toMap
    assert(byName("complete") == ((1L, 2.0 / 3, false)))
    assert(byName("positive") == ((2L, 1.0 / 3, false)))
    // 3 rows, 2 distinct ids → 1 duplicate
    assert(byName("unique") == ((1L, 2.0 / 3, false)))
    assert(rep.map(_.getString(0)).sorted.toSeq ==
      Seq("complete", "positive", "unique"))
  }

  test("report: all-green table passes every constraint with metric 1.0") {
    import spark.implicits._
    val df = Seq((1L, Some("a"), 5), (2L, Some("b"), 7)).toDF("id", "v", "x")
    val rep = Quality.report(df, checks, Seq("id")).collect()
    assert(rep.forall(_.getBoolean(4)))
    assert(rep.forall(_.getDouble(3) == 1.0))
    assert(rep.forall(_.getLong(2) == 0L))
  }

  test("report: empty table is vacuously green (no ANSI 0/0)") {
    import spark.implicits._
    val df = Seq.empty[(Long, Option[String], Int)].toDF("id", "v", "x")
    val rep = Quality.report(df, checks, Seq("id")).collect()
    assert(rep.length == 3)
    assert(rep.forall(r => r.getBoolean(4) && r.getDouble(3) == 1.0))
  }

  test("refIntegrity: counts orphans, null fk is an orphan") {
    import spark.implicits._
    val child = Seq(Some(1L), Some(1L), Some(9L), None).toDF("fk")
    val parent = Seq(1L, 2L).toDF("pk")
    val r = Quality.refIntegrity(child, "fk", parent, "pk").head()
    assert(r.getString(0) == "ref_integrity")
    assert(r.getLong(2) == 2L) // key 9 and the null
    assert(r.getDouble(3) == 0.5)
    assert(!r.getBoolean(4))
  }

  test("driftTvd: identical group distributions give exactly 0") {
    import spark.implicits._
    val df = (Seq.fill(4)(("a", 1)) ++ Seq.fill(2)(("a", 2)) ++
      Seq.fill(8)(("b", 1)) ++ Seq.fill(4)(("b", 2))).toDF("g", "x")
    val tvd = Quality.driftTvd(df, "g", col("x")).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(tvd("a") == 0.0 && tvd("b") == 0.0)
  }

  test("driftTvd: disjoint supports give the maximal distance") {
    import spark.implicits._
    // corpus is half bin-1, half bin-2; each group sits entirely in one
    // bin → TVD vs corpus = 1/2 for both
    val df = (Seq.fill(5)(("a", 1)) ++ Seq.fill(5)(("b", 2))).toDF("g", "x")
    val tvd = Quality.driftTvd(df, "g", col("x")).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(tvd("a") == 0.5 && tvd("b") == 0.5)
    // zero-count cells must contribute: a never hits bin 2, b never bin 1
  }

  test("driftTvdFromCells stays exact at multi-billion-row magnitudes " +
      "(long c·N would overflow)") {
    import spark.implicits._
    // c·N ≈ 6e9 · 8e9 ≈ 5e19 > Long.MaxValue: long products threw (ANSI);
    // decimal(38,0) is exact. a = 6e9 all bin-0; b = 2e9 split 50/50.
    // corpus = (7e9, 1e9)/8e9 → tvd_a = ½(|6/6−7/8| + |0−1/8|) = 1/8,
    // tvd_b = ½(|1/2−7/8| + |1/2−1/8|) = 3/8.
    val cells = Seq(("a", 0, 6_000_000_000L),
      ("b", 0, 1_000_000_000L), ("b", 1, 1_000_000_000L))
      .toDF("g", "__bin", "__c")
    val tvd = Quality.driftTvdFromCells(cells, "g").collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(tvd("a") == 0.125 && tvd("b") == 0.375)
  }

  test("driftTvd: single group matches the corpus exactly (tvd 0)") {
    import spark.implicits._
    val df = Seq(("a", 1), ("a", 2), ("a", 2)).toDF("g", "x")
    val tvd = Quality.driftTvd(df, "g", col("x")).head().getDouble(1)
    assert(tvd == 0.0)
  }

  test("compressionStats: repetitive text compresses well below an " +
      "incompressible string of equal length; both stay in deflate's " +
      "worst-case bound") {
    import spark.implicits._
    val rep = "spam " * 400                            // 2000 chars, one word
    val rnd = new scala.util.Random(7)
    val noise = Array.fill(2000)((33 + rnd.nextInt(94)).toChar).mkString
    val df = Seq((1L, rep), (2L, noise)).toDF("doc_id", "text")
    val got = Quality.compressionStats(df, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val (rawRep, defRep) = got(1L)
    val (rawRnd, defRnd) = got(2L)
    assert(rawRep == 2000L && rawRnd == 2000L)
    // the curation signal: boilerplate ≪ prose ≪ noise compressibility
    assert(defRep < rawRep / 10, s"repetitive deflate $defRep")
    assert(defRnd > rawRnd / 2, s"random deflate $defRnd")
    // worst-case deflate bound holds even for incompressible input
    for ((raw, d) <- got.values) {
      assert(d >= 1 && d <= raw + 5 * (raw / 16384 + 1) + 6)
    }
  }

  test("compressionStats: deterministic across re-runs and partitionings; " +
      "empty and null text measure as zero raw bytes") {
    import spark.implicits._
    val df = Seq((1L, "hello hello hello"), (2L, ""), (3L, null))
      .toDF("doc_id", "text")
    def run(parts: Int) =
      Quality.compressionStats(df.repartition(parts), "doc_id", "text")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .toSet
    val once = run(1)
    assert(run(3) == once && run(2) == once)
    val zeroRaw = once.filter(_._2 == 0L).map(_._1)
    assert(zeroRaw == Set(2L, 3L))
  }

  test("linearClassifierScore: token counting, exact margin, verdict " +
      "(degenerate single-bucket weights isolate the plumbing from the " +
      "hash)") {
    import spark.implicits._
    import graft.operators.TextAnalysis
    val docs = Seq((1L, "aa bb  cc"), (2L, "x"), (3L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    // one bucket, weight +1: margin == n_tokens, everything passes
    val pos = TextAnalysis.linearClassifierScore(docs, "doc_id", "text", Seq(1L))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getBoolean(4))).toSet
    assert(pos == Set((1L, 3L, 3L, 1.0, true), (2L, 1L, 1L, 1.0, true)))
    // weight -1: margin == -n_tokens, nothing passes
    val neg = TextAnalysis.linearClassifierScore(docs, "doc_id", "text", Seq(-1L))
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getBoolean(4))).toSet
    assert(neg == Set((1L, -3L, false), (2L, -1L, false)))
  }

  test("trainTokenLogOdds: class-exclusive tokens get signed weights, " +
      "shared tokens sit between; trained scoring separates the classes") {
    import spark.implicits._
    import graft.operators.TextAnalysis
    // 2 positive and 2 negative docs; 'good' only in positives, 'bad'
    // only in negatives, 'the' everywhere
    val docs = Seq(
      (1L, "the good good text", true), (2L, "the good stuff", true),
      (3L, "the bad bad text", false), (4L, "the bad junk", false))
      .toDF("doc_id", "text", "y")
    val w = TextAnalysis.trainTokenLogOdds(docs, "doc_id", "text", "y")
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getDecimal(3).doubleValue()))).toMap
    assert(w("good")._1 == 3L && w("good")._2 == 0L)
    assert(w("bad") == ((0L, 3L, -w("good")._3))) // symmetric corpus
    assert(w("good")._3 > w("the")._3 && w("the")._3 > w("bad")._3)
    // balanced classes → the everywhere-token is exactly neutral here
    assert(math.abs(w("the")._3) < 1e-9)
    // trained weights classify their own training docs
    val scored = TextAnalysis.scoreWithTokenWeights(docs, "doc_id", "text",
        TextAnalysis.trainTokenLogOdds(docs, "doc_id", "text", "y"))
      .collect().map(r => r.getLong(0) -> r.getBoolean(3)).toMap
    assert(scored == Map(1L -> true, 2L -> true, 3L -> false, 4L -> false))
    // unseen tokens contribute zero: a doc of only-unseen words scores 0
    val unseen = TextAnalysis.scoreWithTokenWeights(
        Seq((9L, "zz qq")).toDF("doc_id", "text"), "doc_id", "text",
        TextAnalysis.trainTokenLogOdds(docs, "doc_id", "text", "y"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getBoolean(3))).toSeq
    assert(unseen == Seq((9L, 2L, 0.0, true)))
  }

  test("trainTokenLogOdds robustness: empty corpus and single-class " +
      "corpus both train without error") {
    import spark.implicits._
    import graft.operators.TextAnalysis
    val empty = Seq.empty[(Long, String, Boolean)].toDF("doc_id", "text", "y")
    assert(TextAnalysis.trainTokenLogOdds(empty, "doc_id", "text", "y")
      .count() == 0)
    // all-positive corpus: n_neg = 0 everywhere, ln(0+1) = 0 stays total
    val onesided = Seq((1L, "aa bb", true), (2L, "bb cc", true))
      .toDF("doc_id", "text", "y")
    val w = TextAnalysis.trainTokenLogOdds(onesided, "doc_id", "text", "y")
      .collect().map(r => r.getString(0) -> r.getDecimal(3).doubleValue())
      .toMap
    assert(w.keySet == Set("aa", "bb", "cc"))
    // within one class, the more frequent token scores higher
    assert(w("bb") > w("aa") && w("aa") == w("cc"))
  }
}
