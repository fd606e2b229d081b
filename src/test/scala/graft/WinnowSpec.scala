package graft

import graft.operators.Winnow

/** Winnowing fingerprint selection and MOSS overlap detection. */
class WinnowSpec extends SparkSpec {
  import spark.implicits._

  test("codegen'd WinnowFps selection is bit-identical to the composed " +
      "higher-order formulation on fixture texts and adversarial strings") {
    import org.apache.spark.sql.functions.{col, explode}
    val adversarial = Seq(
      "aaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaa", // all-tie windows
      "naïve café über schön — unicode grams cross byte boundaries here",
      "日本語のテキストで文字とバイトの境界がずれる場合の検査です長めに",
      "short", "exactly twenty-four chars!!", "x" * 500,
      "MiXeD Case   with\t\twhitespace\n\ncollapsing and   runs")
    val fixture = Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .select(col("text")).as[String].collect().toSeq.filter(_ != null)
    val probe = (adversarial ++ fixture).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    Seq((24, 16), (8, 4), (2, 4), (3, 1)).foreach { case (k, w) =>
      val fast = Winnow.fingerprints(probe, "doc_id", "text", k, w)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val slow = probe
        .select(col("doc_id"),
          explode(Winnow.fingerprintArrayComposed(col("text"), k, w))
            .as("f"))
        .select(col("doc_id"), col("f.fp"), col("f.pos"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(fast == slow, s"k=$k w=$w: ${(fast diff slow).take(3)} vs " +
        s"${(slow diff fast).take(3)}")
    }
  }

  test("guarantee: a shared substring of >= w+k-1 chars yields at least " +
      "one shared fingerprint, whatever its position") {
    val k = 8; val w = 4 // threshold t = 11 chars
    val shared = "the quick brown fox jumps over the lazy dog" // 44 chars
    val a = s"$shared and then some completely different tail content here"
    val b = s"unrelated prefix text first then $shared"
    val df = Seq((1L, a), (2L, b)).toDF("doc_id", "text")
    val fp = Winnow.fingerprints(df, "doc_id", "text", k, w)
    val fa = fp.filter($"doc_id" === 1L).select("fp").as[Long].collect().toSet
    val fb = fp.filter($"doc_id" === 2L).select("fp").as[Long].collect().toSet
    assert((fa & fb).nonEmpty, "planted 44-char overlap produced no shared fp")
  }

  test("density: every w consecutive windows select at least one " +
      "fingerprint, and never more than one per window") {
    val k = 8; val w = 4
    val text = "word soup " * 20 + (1 to 30).mkString(" ")
    val df = Seq((1L, text)).toDF("doc_id", "text")
    val m = text.toLowerCase.replaceAll("\\s+", " ").length - k + 1
    val nw = math.max(m - w + 1, 1)
    val nFps = Winnow.fingerprints(df, "doc_id", "text", k, w).count()
    assert(nFps <= nw)
    // one selected (hash, pos) can be the min of at most w windows
    assert(nFps >= math.ceil(nw.toDouble / w).toLong, s"$nFps < $nw/$w")
  }

  test("tie-break: equal window-min hashes select the RIGHTMOST position " +
      "(the paper's rule)") {
    // "aaaaaaa": every 2-gram is "aa" (same hash); window j of width 4
    // must select its rightmost slot j+3
    val df = Seq((1L, "aaaaaaa")).toDF("doc_id", "text")
    val got = Winnow.fingerprints(df, "doc_id", "text", k = 2, w = 4)
      .select("pos").as[Long].collect().toSet
    // 6 grams, 3 windows at j=1,2,3 -> rightmost slots 4,5,6
    assert(got == Set(4L, 5L, 6L))
  }

  test("overlap: a planted near-dup pair is detected; unrelated docs are " +
      "not, and sub-threshold docs emit no fingerprints") {
    val shared = "all work and no play makes jack a dull boy " * 3
    val docs = Seq(
      (1L, shared + "ending one for the first document variant"),
      (2L, "different opening for the second one " + shared),
      (3L, "completely unrelated content about query optimizers and joins"),
      (4L, "short")) // < k chars after canon: no grams, no fingerprints
    val df = docs.toDF("doc_id", "text")
    val pairs = Winnow.overlapPairs(df, "doc_id", "text",
        minShared = 3, maxBlock = 64)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 2L)))
    assert(Winnow.fingerprints(df.filter($"doc_id" === 4L),
      "doc_id", "text").count() == 0L)
  }

  test("deltaOverlap: a delta doc is matched against the corpus doc it " +
      "plagiarizes, corpus boilerplate is capped on the corpus side") {
    val shared = "the three laws of robotics state that a robot may not " +
      "injure a human being or through inaction allow harm"
    val corpus = Seq(
      (1L, shared + " plus the corpus framing around the original passage"),
      (2L, "a completely different corpus document about stream joins"))
      .toDF("doc_id", "text")
    val delta = Seq(
      (100L, "new submission quoting verbatim: " + shared),
      (101L, "an original new document with nothing copied at all"))
      .toDF("doc_id", "text")
    val got = Winnow.deltaOverlap(corpus, delta, "doc_id", "text",
        minShared = 2, maxBlock = 64)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((100L, 1L)))
    // boilerplate: the same header across 12 corpus docs, cap 10 — a
    // delta copy of it must match nothing
    val boiler = "standard license header repeated across the whole corpus"
    val bigCorpus = (1L to 12L).map((_, boiler)).toDF("doc_id", "text")
    val d2 = Seq((200L, boiler)).toDF("doc_id", "text")
    assert(Winnow.deltaOverlap(bigCorpus, d2, "doc_id", "text",
      minShared = 1, maxBlock = 10).count() == 0L)
  }

  test("boilerplate cap: a fingerprint shared by more than maxBlock docs " +
      "is census-dropped before pairing") {
    val boiler = "this exact license header appears on every single file " +
      "in the corpus and must not explode the pair join"
    val df = (1L to 10L).map(i => (i, boiler)).toDF("doc_id", "text")
    // every fp is in all 10 docs; cap at 9 drops them all -> no pairs
    assert(Winnow.overlapPairs(df, "doc_id", "text",
      minShared = 1, maxBlock = 9).count() == 0L)
    // raising the cap restores detection
    assert(Winnow.overlapPairs(df, "doc_id", "text",
      minShared = 1, maxBlock = 10).count() == 45L)
  }

  test("densityReport: totals reconcile with fingerprints, per-doc density " +
      "obeys the 1/w..1 bounds, and corpus density tracks 2/(w+1)") {
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val k = Winnow.DefaultK; val w = Winnow.DefaultW
    val r = Winnow.densityReport(docs, "doc_id", "text", k, w).collect().head
    val nDocs = r.getAs[Long]("n_docs")
    val fps = r.getAs[Long]("total_fps")
    val grams = r.getAs[Long]("total_grams")
    assert(nDocs > 0 && fps ==
      Winnow.fingerprints(docs, "doc_id", "text", k, w).count())
    // winnowing selects at most one fp per gram, and roughly one per w
    // grams at worst (the exact floor is (m-w+1)/(w·m), slightly under
    // 1/w for short docs) — assert a halved-1/w floor with that margin
    assert(r.getAs[Long]("min_ppm") > 1000000L / (2 * w))
    assert(r.getAs[Long]("max_ppm") <= 1000000L)
    // the paper's expected density for random hashes is 2/(w+1): real text
    // is not adversarial, so the corpus-wide figure lands near it
    val ppm = r.getAs[Long]("density_ppm")
    assert(ppm == fps * 1000000L / grams)
    assert(ppm > 80000L && ppm < 180000L, s"density $ppm ppm vs 2/(w+1)=" +
      (2000000L / (w + 1)))
  }
}
