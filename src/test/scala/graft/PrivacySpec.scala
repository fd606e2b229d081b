package graft

import graft.operators.Privacy
import org.apache.spark.sql.functions._

/** Semantic laws for the privacy-risk operators (queries/Privacy.scala
  * carries the oracle checks; this spec owns the properties the oracle
  * can't express). */
class PrivacySpec extends SparkSpec {
  import spark.implicits._

  private def people = Seq(
    // (id, zip, age, disease) — zip is the QI, disease the sensitive value
    (1L, "111", 30, "flu"), (2L, "111", 31, "flu"), (3L, "111", 32, "flu"),
    (4L, "222", 40, "flu"), (5L, "222", 41, "cold"),
    (6L, "333", 50, "cold"))
    .toDF("id", "zip", "age", "disease")

  test("kAnonymity flags exactly the classes smaller than k") {
    val out = Privacy.kAnonymity(people, Seq("zip"), 3)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getBoolean(2)))
      .toMap
    assert(out === Map("111" -> (3L, false), "222" -> (2L, true),
      "333" -> (1L, true)))
  }

  test("lDiversity catches a k-anonymous but sensitive-homogeneous class") {
    val out = Privacy.lDiversity(people, Seq("zip"), col("disease"), 2)
      .collect().map(r => r.getString(0) -> (r.getLong(2), r.getBoolean(3)))
      .toMap
    // zip 111 is 3-anonymous yet every member has the same disease: l=1.
    assert(out("111") === (1L, true))
    assert(out("222") === (2L, false))
  }

  test("suppressBelowK: re-auditing the suppressed output finds no class below k") {
    val out = Privacy.suppressBelowK(people, Seq("zip"), 3)
    // zips 222 (2 members) and 333 (1) merge into the '*' class of 3;
    // zip 111 (3 members) survives untouched
    val reaudit = Privacy.kAnonymity(out, Seq("zip"), 3)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getBoolean(2)))
      .toMap
    assert(reaudit === Map("111" -> (3L, false), "*" -> (3L, false)))
    // non-QI columns pass through untouched
    assert(out.columns.toSeq == people.columns.toSeq)
    assert(out.select("id", "disease").exceptAll(
      people.select("id", "disease")).isEmpty)
  }

  test("suppressBelowK drops rows when the merged '*' class would itself be below k") {
    // one class of 3 and one singleton, k=3: masking alone would create a
    // '*' class of 1 — re-identifiable. The singleton is dropped instead.
    val d = Seq((1L, "111"), (2L, "111"), (3L, "111"), (4L, "999"))
      .toDF("id", "zip")
    val out = Privacy.suppressBelowK(d, Seq("zip"), 3)
    assert(out.count() == 3)
    assert(out.select("zip").distinct().as[String].collect().toSeq == Seq("111"))
    // a below-k NULL-QI class gets the same treatment (the class join is
    // null-safe): masked into '*', never released unmasked
    val withNull = Seq((1L, Some("111")), (2L, Some("111")), (3L, Some("111")),
      (4L, None), (5L, None), (6L, Some("999"))).toDF("id", "zip")
    val out2 = Privacy.suppressBelowK(withNull, Seq("zip"), 3)
    val classes = Privacy.kAnonymity(out2, Seq("zip"), 3)
      .collect().map(r => Option(r.getString(0)).getOrElse("<null>") ->
        r.getBoolean(2)).toMap
    assert(classes === Map("111" -> false, "*" -> false))
  }

  test("tCloseness: 0 for a class matching the global distribution; exact " +
      "EMD for a concentrated one") {
    // zips A and B, two balance bins. A sits entirely in bin 0, B in bin 1:
    // global is (.5, .5), each class is (1,0)/(0,1) → EMD 0.5 for both.
    val skewed = Seq(("A", 0), ("A", 0), ("B", 1), ("B", 1)).toDF("zip", "bin")
    val s = Privacy.tCloseness(skewed, Seq("zip"), col("bin"), 0.25)
      .collect().map(r => r.getString(0) -> (r.getDouble(2), r.getBoolean(3)))
      .toMap
    assert(s("A") === ((0.5, true)) && s("B") === ((0.5, true)))
    // identical per-class distributions → EMD exactly 0, nobody at risk
    val uniform = Seq(("A", 0), ("A", 1), ("B", 0), ("B", 1)).toDF("zip", "bin")
    val u = Privacy.tCloseness(uniform, Seq("zip"), col("bin"), 0.25)
      .collect().map(r => r.getString(0) -> (r.getDouble(2), r.getBoolean(3)))
      .toMap
    assert(u("A") === ((0.0, false)) && u("B") === ((0.0, false)))
  }

  test("tClosenessFromCounts stays exact at multi-billion-row magnitudes " +
      "(long cb·tot would overflow)") {
    // counts chosen so cb·tot ≈ 4.5e9 · 9e9 ≈ 4e19 > Long.MaxValue: the
    // old long arithmetic threw (ANSI) past ~3e9 rows; decimal(38,0) is
    // exact. Class A is all bin-0, class B all bin-1, equal sizes → the
    // global split is (.5, .5) and each class's EMD is exactly 0.5.
    val big = 4_500_000_000L // > Int.MaxValue, sum 9e9 rows
    val counts = Seq(("A", 0, big), ("B", 1, big))
      .toDF("zip", "__bin", "__cb")
    val out = Privacy.tClosenessFromCounts(counts, Seq("zip"), 0.25)
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2),
        r.getBoolean(3))).toMap
    assert(out("A") === ((big, 0.5, true)))
    assert(out("B") === ((big, 0.5, true)))
    // skewed magnitudes too: A = 6e9 in bin 0; B = 2e9 split 50/50.
    // global = (7e9, 1e9)/8e9; EMD_A = |6e9·8e9 − 7e9·6e9|/(6e9·8e9·1)
    //        = 1/8; EMD_B = |1e9·8e9 − 7e9·2e9| / (2e9·8e9) = 3/8.
    val skew = Seq(("A", 0, 6_000_000_000L),
      ("B", 0, 1_000_000_000L), ("B", 1, 1_000_000_000L))
      .toDF("zip", "__bin", "__cb")
    val s = Privacy.tClosenessFromCounts(skew, Seq("zip"), 0.25)
      .collect().map(r => r.getString(0) -> (r.getDouble(2), r.getBoolean(3)))
      .toMap
    assert(s("A") === ((0.125, false)) && s("B") === ((0.375, true)))
  }

  test("suppressBelowK tolerates input columns named 'n' (helper names are " +
      "__-prefixed)") {
    val df = people.withColumnRenamed("age", "n")
    val out = Privacy.suppressBelowK(df, Seq("zip"), 3)
    assert(out.columns.toSeq === Seq("id", "zip", "n", "disease"))
    // the 'n' data column passes through untouched for surviving rows
    val kept = out.filter(col("zip") === "111").select("n")
      .as[Int].collect().sorted.toSeq
    assert(kept === Seq(30, 31, 32))
    val reaudit = Privacy.kAnonymity(out, Seq("zip"), 3)
      .filter(col("at_risk")).count()
    assert(reaudit === 0L)
  }

  test("binLabel tiles the line: negative values get their own width bin") {
    val labels = Seq(-1500.0, -0.01, 0.0, 999.99, 1000.0).toDF("x")
      .select(Privacy.binLabel(col("x"), 1000).as("b"))
      .as[String].collect().toSeq
    assert(labels === Seq("-2000--1000", "-1000-0", "0-1000", "0-1000",
      "1000-2000"))
  }

  test("date shift preserves intra-key intervals and stays within ±maxDays") {
    val orders = Tables.load(spark, "/root/testdata/sf0.001", "orders")
    val shifted = orders.select(col("o_custkey"),
      col("o_orderdate").cast("timestamp").cast("long").as("orig"),
      Privacy.shiftedEpoch(col("o_orderdate"), col("o_custkey"), "s1", 90)
        .as("shift"))
    // per-key constant delta ⇒ exactly one distinct (shift - orig) per key
    val perKey = shifted.groupBy("o_custkey")
      .agg(countDistinct(col("shift") - col("orig")).as("nd"),
        max(abs(col("shift") - col("orig"))).as("mx"))
      .agg(max("nd").as("nd"), max("mx").as("mx")).head()
    assert(perKey.getLong(0) === 1L)
    assert(perKey.getLong(1) <= 90L * 86400L)
  }

  test("perturbation is bounded, deterministic, and mean-preserving-ish") {
    val c = Tables.load(spark, "/root/testdata/sf0.001", "customer")
    val p = c.select(col("c_acctbal").as("v"),
      Privacy.perturb(col("c_acctbal"), col("c_custkey"), "n1", 100).as("pv"))
      .persist()
    val bad = p.filter(abs(col("pv") - col("v")) > abs(col("v")) * 0.1 + 1e-9)
      .count()
    assert(bad === 0L)
    // same salt+key ⇒ identical output on a re-run
    val p2 = c.select(
      Privacy.perturb(col("c_acctbal"), col("c_custkey"), "n1", 100).as("pv2"))
    assert(p.select("pv").exceptAll(p2).count() === 0L)
    p.unpersist()
  }

  test("shiftDays rejects ranges the 16-bit hash cannot cover") {
    intercept[IllegalArgumentException] {
      Privacy.shiftDays(lit(1), "s", 40000)
    }
    ()
  }

  test("dpCounts: noise is genuinely added, Laplace(1/eps)-bounded in " +
      "practice, deterministic under one salt, different under another") {
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val truth = docs.groupBy("source", "lang").count()
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap
    def release(salt: String) =
      Privacy.dpCounts(docs, Seq("source", "lang"), epsilon = 0.5, salt)
        .collect()
        .map(r => (r.getString(0), r.getString(1)) ->
          (r.getDouble(2), r.getDouble(3))).toMap
    val rel = release("dp-test")
    assert(rel.keySet == truth.keySet)
    assert(rel.values.forall(_._2 == 0.5))
    val noise = rel.map { case (k, (v, _)) => v - truth(k) }
    // Laplace(b=2): P(|x| > 40) = e^-20 — a violation means broken math,
    // not bad luck
    assert(noise.forall(n => math.abs(n) < 40.0), s"noise out of range")
    // the mechanism actually perturbs (u is never exactly 1/2 → noise 0
    // has probability ~0 across dozens of groups)
    assert(noise.count(_ != 0.0) > noise.size / 2)
    // replayable under the same salt, different under a fresh one
    assert(release("dp-test") == rel)
    assert(release("dp-other") != rel)
  }

  test("dpSum: contribution bounding caps any single row's influence at " +
      "clip; noise scales with clip/eps; deterministic per salt") {
    import spark.implicits._
    val base = Seq(("a", 100.0), ("a", 200.0), ("a", -50.0), ("b", 10.0))
      .toDF("g", "v")
    def rel(df: org.apache.spark.sql.DataFrame) =
      Privacy.dpSum(df, Seq("g"), "v", clip = 150.0, epsilon = 1.0, "dps-t")
        .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val r0 = rel(base)
    // clipped truth: a = 100 + 150 + 0 = 250, b = 10; Laplace(150)
    // noise at the seeded u stays well under 150·30
    assert(math.abs(r0("a") - 250.0) < 4500.0)
    // a 1e9 outlier joins group a but moves the release by AT MOST clip
    // (the noise term is unchanged — same group key, same salt)
    val spiked = rel(base.unionAll(Seq(("a", 1e9)).toDF("g", "v")))
    assert(math.abs(spiked("a") - r0("a") - 150.0) < 1e-6)
    assert(spiked("b") == r0("b"))
    assert(rel(base) == r0, "seeded release replays exactly")
  }
}
