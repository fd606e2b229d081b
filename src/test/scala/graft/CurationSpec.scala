package graft

import graft.operators.Curation
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Unit laws for the corpus-curation operators (decontamination,
  * boilerplate chunks, sequence packing, int8 quantization). */
class CurationSpec extends SparkSpec {

  private def docs(rows: (Long, String)*) = {
    spark.createDataFrame(
      java.util.Arrays.asList(rows.map(r => Row(r._1, r._2)): _*),
      StructType(Seq(StructField("doc_id", LongType),
        StructField("text", StringType))))
  }

  test("gopherFlags: each Table-A1 rule fires on its planted failure " +
      "mode and a clean document passes them all") {
    val good = Seq.fill(3)("the quality of training data and the care " +
      "that models have with it really matters for everyone involved " +
      "today.").mkString(" ")
    val d = docs(
      1L -> good,
      2L -> "short doc.",
      3L -> (good + " # # # # # # # #"),
      4L -> (Seq.fill(10)("- bullet line").mkString("\n") + "\nend"),
      5L -> (Seq.fill(4)("so it goes...").mkString("\n") + "\nend"),
      6L -> (good + " " + Seq.fill(60)("12345").mkString(" ")),
      7L -> Seq.fill(10)("zebra quokka lorem ipsum dolor amet")
        .mkString(" "),
      8L -> Seq.fill(30)("ab cd").mkString(" "))
    val out = Curation.gopherFlags(d, "doc_id", "text")
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(out(1L).getAs[Boolean]("keep"))
    assert(!out(2L).getAs[Boolean]("r_word_count"))
    assert(!out(3L).getAs[Boolean]("r_symbol") &&
      out(3L).getAs[Boolean]("r_word_count"))
    assert(!out(4L).getAs[Boolean]("r_bullet"))
    assert(!out(5L).getAs[Boolean]("r_ellipsis"))
    assert(!out(6L).getAs[Boolean]("r_alpha"))
    assert(!out(7L).getAs[Boolean]("r_stop"))
    assert(!out(8L).getAs[Boolean]("r_mean_len"))
    assert(out.values.count(!_.getAs[Boolean]("keep")) == 7)
  }

  test("pmiTopK ranks a planted exclusive collocation first; the count " +
      "floor hides rare pairs") {
    val filler = "the quick brown fox jumps over the lazy dog again and again"
    val corpus = docs((1L to 20L).map(i =>
      (i, s"$filler foo bar $filler")): _*)
    val out = Curation.pmiTopK(corpus, "doc_id", "text", minCount = 5, k = 5)
      .collect().map(r => (r.getString(0), r.getString(1)))
    // foo/bar occur ONLY as the pair — maximal PMI beats every filler pair
    assert(out.head == (("foo", "bar")), s"got ${out.toSeq}")
    // a pair under the floor (appears once) never surfaces
    val rare = docs((1L, s"$filler unique pairing $filler"))
    val rareOut = Curation.pmiTopK(rare, "doc_id", "text", minCount = 5,
      k = 50).collect().map(r => (r.getString(0), r.getString(1)))
    assert(!rareOut.contains(("unique", "pairing")))
  }

  test("contaminated flags exactly the docs sharing an n-gram with bench") {
    val bench = docs((100L, "the quick brown fox jumps over the lazy dog"))
    val train = docs(
      (1L, "something about the quick brown fox here"), // shares 4-gram
      (2L, "completely unrelated words appear in this doc"),
      (3L, "quick brown fox jumps elsewhere entirely today")) // shares 4-gram
    val hit = Curation.contaminated(train, bench, "doc_id", "text", n = 4)
      .collect().map(_.getLong(0)).toSet
    assert(hit == Set(1L, 3L))
  }

  test("removeBoilerplate drops only cross-doc chunks, preserves order, " +
      "keeps fully-boilerplate docs with empty text") {
    val df = docs(
      (1L, "x y a b c d"), // chunks: "x y" (shared), "a b", "c d"
      (2L, "x y e f"),     // chunks: "x y" (shared), "e f"
      (3L, "g h i j"),     // all chunks unique
      (4L, "x y"))         // every chunk boilerplate
    val out = Curation.removeBoilerplate(df, "doc_id", "text", w = 2)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3))))
      .toMap
    assert(out(1L) === ((3L, 2L, "a b c d")))
    assert(out(2L) === ((2L, 1L, "e f")))
    assert(out(3L) === ((2L, 2L, "g h i j")))
    assert(out(4L) === ((1L, 0L, ""))) // survives the LEFT join, empty text
  }

  test("sourceOverlap reports only shingle-sharing pairs with exact Jaccard") {
    import spark.implicits._
    val df = Seq(
      (1L, "a b c d", "s1"), // shingles: "a b c", "b c d"
      (2L, "a b c e", "s2"), // shares "a b c" with s1
      (3L, "p q r s", "s3")) // shares nothing
      .toDF("doc_id", "text", "source")
    val out = Curation.sourceOverlap(df, "source", "text", 3).collect()
    assert(out.length === 1) // s3 overlaps nobody, so no row for it
    val r = out.head
    assert((r.getString(0), r.getString(1)) === (("s1", "s2")))
    assert((r.getLong(2), r.getLong(3), r.getLong(4)) === ((1L, 2L, 2L)))
    assert(r.getDouble(5) === 1.0 / 3.0) // one shared of three distinct
  }

  test("bloom filter: no false negatives; false positives stay rare") {
    val vals = (0 until 2000).map(i => (i.toLong, s"member-$i"))
    val members = docs(vals: _*)
    // ~10 bits/element → expected FP rate ≈ 1% at k=5
    val bitmap = Curation.bloomBuild(members.select(col("text")), "text",
      mBits = 1 << 15, k = 5)
    val probeAll = docs(((0 until 2000).map(i => (i.toLong, s"member-$i")) ++
      (0 until 2000).map(i => (10000L + i, s"absent-$i"))): _*)
      .withColumn("hit", Curation.bloomMightContain(col("text"), bitmap, 5))
      .collect().map(r => (r.getLong(0), r.getBoolean(2)))
    val falseNeg = probeAll.count { case (id, hit) => id < 10000 && !hit }
    val falsePos = probeAll.count { case (id, hit) => id >= 10000 && hit }
    assert(falseNeg == 0)          // one-sided error, structurally
    assert(falsePos < 2000 * 0.05) // generous bound over the ~1% expectation
  }

  test("contaminatedBloom is bit-identical to the exact broadcast variant") {
    val bench = docs(
      (100L, "the quick brown fox jumps over the lazy dog"),
      (101L, "pack my box with five dozen liquor jugs"))
    val train = docs((0 until 40).map { i =>
      val tail = if (i % 7 == 0) "the quick brown fox appears"
        else if (i % 11 == 0) "with five dozen liquor jugs inside"
        else s"benign filler text number $i keeps going on"
      (i.toLong, tail)
    }: _*)
    val exact = Curation.contaminated(train, bench, "doc_id", "text", n = 4)
      .collect().map(_.getLong(0)).toSet
    val bloom = Curation.contaminatedBloom(train, bench, "doc_id", "text",
      n = 4, mBits = 1 << 10, k = 5)
      .collect().map(_.getLong(0)).toSet
    assert(bloom == exact)
    assert(exact.nonEmpty)
    // past LitBloomMaxBits the bitmap binds via a one-row broadcast cross
    // join instead of a per-task plan literal — same result, same FP-proof
    // verify join
    assert(Curation.LitBloomMaxBits < (1L << 21))
    val bloomBig = Curation.contaminatedBloom(train, bench, "doc_id", "text",
      n = 4, mBits = 1 << 21, k = 5)
      .collect().map(_.getLong(0)).toSet
    assert(bloomBig == exact)
  }

  test("bigramLmScore: in-distribution text outscores out-of-distribution") {
    val d = docs(
      (1L, "the cat sat on the mat"),
      (2L, "the cat sat on the mat"),
      (3L, "zeta xylo quorx veldt nubra klaxon"),
      (4L, "one")) // <2 words → no bigrams → absent from output
    val out = Curation.bigramLmScore(d, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(out.keySet == Set(1L, 2L, 3L))
    assert(out(1L)._1 == 5L)            // 6 words → 5 bigram occurrences
    assert(out(1L) == out(2L))          // identical docs, identical score
    assert(out(1L)._2 > out(3L)._2)     // repeated bigrams beat hapaxes
  }

  test("knBigramScore: hand-computed Kneser-Ney probabilities (d=0.75) " +
      "and the continuation-count effect") {
    // corpus: "a b", "a b", "a c" -> c(a,b)=2 c(a,c)=1 c(a)=3,
    // N1+(a,·)=2, N1+(·,b)=N1+(·,c)=1, types=2
    // P(b|a) = (max(2-.75,0) + .75·2·(1/2))/3 = 2/3;  P(c|a) = 1/3
    val d = docs((1L, "a b"), (2L, "a b"), (3L, "a c"))
    val out = Curation.knBigramScore(d, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(out.keySet == Set(1L, 2L, 3L))
    assert(out(1L)._1 == 1L && out(3L)._1 == 1L)
    assert(math.abs(out(1L)._2 - math.log(2.0 / 3)) < 1e-4, out(1L).toString)
    assert(math.abs(out(3L)._2 - math.log(1.0 / 3)) < 1e-4, out(3L).toString)
    // within one context, observed-bigram probabilities + discount mass
    // behave: better-attested bigram scores strictly higher
    assert(out(1L)._2 > out(3L)._2)
  }

  test("fairGate laws: keep(0.3) ⊆ keep(0.7); per-group keep count is " +
      "floor(f·(n−1))+1; groups gate independently") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val rows = for (g <- Seq("a", "b", "c"); i <- 1 to (5 + rnd.nextInt(8)))
      yield (g, i.toLong, rnd.nextDouble())
    val df = rows.toDF("src", "id", "score")
    def kept(f: Double) = Curation.fairGate(df, "src", "score", "id", f)
      .select("src", "id").collect().map(r => (r.getString(0), r.getLong(1)))
      .toSet
    val k3 = kept(0.3); val k7 = kept(0.7)
    assert(k3.subsetOf(k7), "larger keepFrac must be a superset")
    val sizes = rows.groupBy(_._1).view.mapValues(_.size).toMap
    k3.groupBy(_._1).foreach { case (g, s) =>
      val n = sizes(g)
      assert(s.size == math.floor(0.3 * (n - 1)).toInt + 1,
        s"group $g n=$n kept=${s.size}")
    }
  }

  test("chunks: non-overlapping, order-preserving, trailing partial kept") {
    val out = docs((1L, "a b c d e f g"))
      .select(Curation.chunks(col("text"), 3).as("c"))
      .collect().head.getSeq[String](0)
    assert(out == Seq("a b c", "d e f", "g"))
  }

  test("boilerplateChunks reports only cross-doc repeats with true counts") {
    val d = docs(
      (1L, "common header line one unique tail alpha"),
      (2L, "common header line one unique tail beta"),
      (3L, "totally different content in this document here"))
    val out = Curation.boilerplateChunks(d, "doc_id", "text", w = 4)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(out == Set(("common header line one", 2L, 2L)))
  }

  test("packSequences: budget boundaries honored, totals preserved") {
    val d = spark.createDataFrame(
      java.util.Arrays.asList(
        Row(1L, "en", 300L), Row(2L, "en", 300L), Row(3L, "en", 300L),
        Row(4L, "de", 100L)),
      StructType(Seq(StructField("doc_id", LongType),
        StructField("lang", StringType), StructField("n_tokens", LongType))))
    val out = Curation.packSequences(d, "lang", "doc_id", "n_tokens", 512)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    // en: doc1 starts at 0 -> seq 0; doc2 starts at 300 -> seq 0;
    //     doc3 starts at 600 -> seq 1. de: doc4 -> seq 0.
    assert(out == Set(("en", 0L, 2L, 600L), ("en", 1L, 1L, 300L),
      ("de", 0L, 1L, 100L)))
  }

  test("quantizeInt8 round-trips within half a quantization step") {
    val d = spark.createDataFrame(
      java.util.Arrays.asList(Row(1L, Seq(-1.0, -0.5, 0.0, 0.5, 1.0))),
      StructType(Seq(StructField("vec_id", LongType),
        StructField("v", ArrayType(DoubleType)))))
      .withColumn("mn", array_min(col("v")))
      .withColumn("mx", array_max(col("v")))
    val row = d
      .withColumn("qv", Curation.quantizeInt8(col("v"), col("mn"), col("mx")))
      .withColumn("err",
        Curation.meanAbsDequantError(col("v"), col("qv"), col("mn"), col("mx")))
      .select("qv", "err").collect().head
    val qv = row.getSeq[Int](0)
    assert(qv.head == -128 && qv.last == 127) // range endpoints hit the rails
    assert(qv == qv.sorted) // monotone
    assert(row.getDouble(1) <= (2.0 / 255.0) / 2 + 1e-12) // <= half step
  }

  test("quantizeInt8 on a constant vector is defined (all -128, zero error)") {
    val d = spark.createDataFrame(
      java.util.Arrays.asList(Row(1L, Seq(0.25, 0.25, 0.25))),
      StructType(Seq(StructField("vec_id", LongType),
        StructField("v", ArrayType(DoubleType)))))
      .withColumn("mn", array_min(col("v")))
      .withColumn("mx", array_max(col("v")))
    val row = d
      .withColumn("qv", Curation.quantizeInt8(col("v"), col("mn"), col("mx")))
      .select("qv").collect().head
    assert(row.getSeq[Int](0).forall(_ == -128))
  }

  test("semanticContamination: a planted copy of a benchmark vector " +
      "scores max_cos 1.0, an orthogonal one scores 0.0") {
    import org.apache.spark.sql.types._
    def vecs(rows: Seq[(Long, Seq[Double])]) = spark.createDataFrame(
      java.util.Arrays.asList(rows.map { case (id, v) =>
        org.apache.spark.sql.Row(id, v) }: _*),
      StructType(Seq(StructField("id", LongType),
        StructField("emb", ArrayType(DoubleType)))))
    val bench = vecs(Seq((100L, Seq(1.0, 0.0, 0.0)),
      (101L, Seq(0.0, 1.0, 0.0))))
    val train = vecs(Seq(
      (1L, Seq(2.0, 0.0, 0.0)),   // scaled copy of bench 100 -> cos 1
      (2L, Seq(0.0, 0.0, 5.0)),   // orthogonal to both -> cos 0
      (3L, Seq(1.0, 1.0, 0.0))))  // 45 degrees to both -> cos 1/sqrt(2)
    val got = Curation.semanticContamination(train, bench, "id", "emb")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got(1L) == 1.0)
    assert(got(2L) == 0.0)
    assert(math.abs(got(3L) - 1.0 / math.sqrt(2)) < 1e-12)
  }

  test("semanticOrder: pos is a 0..n-1 permutation sorted by (cell, pc1, " +
      "id), and adjacent docs are semantically CLOSER than in id order " +
      "(the in-context-pretraining locality win)") {
    import org.apache.spark.sql.functions._
    val emb = queries.Q.t(spark, "/root/testdata/sf0.001", "embeddings")
      .select(col("vec_id"),
        graft.functions.VectorOps.asDouble(col("embedding")).as("emb"))
    val out = Curation.semanticOrder(emb, "vec_id", "emb", dim = 64)
      .collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
    val n = out.length
    assert(n == emb.count())
    // a permutation: every position 0..n-1 exactly once
    assert(out.map(_._4).sorted.toSeq == (0L until n.toLong))
    // sorted by (cell, pc1, id) along positions
    val byPos = out.sortBy(_._4)
    val ord = Ordering.Tuple3[Long, Double, Long]
    byPos.sliding(2).foreach { case Array(a, b) =>
      assert(ord.lt((a._2, a._3, a._1), (b._2, b._3, b._1)),
        s"order violated at pos ${a._4}")
    }
    // locality: mean adjacent cosine under semantic order beats id order
    val vecs = emb.collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { d += a(i)*b(i); na += a(i)*a(i); nb += b(i)*b(i); i += 1 }
      d / math.sqrt(na * nb)
    }
    def meanAdj(order: Seq[Long]): Double =
      order.sliding(2).map { case Seq(x, y) => cos(vecs(x), vecs(y)) }
        .sum / (order.length - 1)
    val semantic = meanAdj(byPos.map(_._1).toSeq)
    val idOrder = meanAdj(out.map(_._1).sorted.toSeq)
    assert(semantic > idOrder + 0.05,
      s"no locality win: semantic $semantic vs id-order $idOrder")
  }

  test("semantic windows: exact 128-token budget accounting — every " +
      "window but the last is full, pieces tile each doc, totals conserve") {
    import org.apache.spark.sql.functions._
    val dir = "/root/testdata/sf0.001"
    val rows = SparkEntry.queries("q_semantic_windows")(spark, dir)
      .collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty)
    rows.foreach { case (_, _, ws, n) =>
      assert(ws >= 0 && ws < 128 && n >= 1 && ws + n <= 128)
    }
    // every window except the highest id carries exactly 128 tokens
    val byWin = rows.groupBy(_._1).view.mapValues(_.map(_._4).sum).toMap
    val last = byWin.keys.max
    byWin.foreach { case (w, tot) =>
      if (w != last) assert(tot == 128, s"window $w holds $tot")
      else assert(tot >= 1 && tot <= 128)
    }
    // conservation: piece totals equal each doc's token count, and the
    // stream total equals the sum over embedded, non-empty docs
    val toks = queries.Q.t(spark, dir, "documents")
      .filter(col("text").isNotNull)
      .select(col("doc_id"),
        graft.operators.TextAnalysis.tokenCountWs(col("text")).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val byDoc = rows.groupBy(_._2).view.mapValues(_.map(_._4).sum).toMap
    byDoc.foreach { case (d, tot) => assert(tot == toks(d), s"doc $d") }
    assert(rows.map(_._4).sum ==
      byDoc.keys.toSeq.map(toks).sum)
  }
}
