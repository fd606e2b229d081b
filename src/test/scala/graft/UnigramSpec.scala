package graft

import graft.operators.Unigram
import org.apache.spark.sql.functions._

/** Unigram-LM tokenizer training (operators/Unigram.scala): candidate
  * counting, the bounded Viterbi DP (hand-computed + brute-force law),
  * the deterministic tie-break, and the hard-EM recount. */
class UnigramSpec extends SparkSpec {

  private def costDf(m: Map[String, Long]) = {
    import org.apache.spark.sql.types._
    spark.createDataFrame(
      java.util.Arrays.asList(m.toSeq.sortBy(_._1)
        .map { case (p, c) => org.apache.spark.sql.Row(p, c) }: _*),
      StructType(Seq(StructField("piece", StringType),
        StructField("cost", LongType))))
  }

  private def vocabDf(m: Map[String, Long]) = {
    import org.apache.spark.sql.types._
    spark.createDataFrame(
      java.util.Arrays.asList(m.toSeq.sortBy(_._1)
        .map { case (w, f) => org.apache.spark.sql.Row(w, f) }: _*),
      StructType(Seq(StructField("word", StringType),
        StructField("freq", LongType))))
  }

  private def segPieces(words: Map[String, Long],
      costs: Map[String, Long], maxPieceLen: Int): Map[String, Seq[String]] =
    Unigram.viterbiSegment(vocabDf(words), costDf(costs), maxPieceLen, 8)
      .collect()
      .map(r => (r.getString(0), r.getString(2)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSeq.sorted).toMap

  test("viterbiSegment picks the cheaper segmentation") {
    // ab+ab = 300 beats a+b+a+b = 400 and mixed = 350
    val got = segPieces(Map("abab" -> 1L),
      Map("a" -> 100L, "b" -> 100L, "ab" -> 150L), 2)
    assert(got("abab") == Seq("ab", "ab"))
  }

  test("viterbiSegment tie-break prefers the shorter final piece") {
    // ab+ab = a+b+a+b = 400: at every position the (cost, j) struct min
    // picks the smaller j, so the single-char path wins deterministically
    val got = segPieces(Map("abab" -> 1L),
      Map("a" -> 100L, "b" -> 100L, "ab" -> 200L), 2)
    assert(got("abab") == Seq("a", "a", "b", "b"))
  }

  test("viterbiSegment matches a driver-side brute-force DP with the " +
      "same tie-break on random vocabularies") {
    val rnd = new scala.util.Random(7)
    val alpha = "abc"
    val words = (1 to 25).map { _ =>
      (1 to (1 + rnd.nextInt(6))).map(_ => alpha(rnd.nextInt(3))).mkString
    }.distinct.map(w => w -> (1L + rnd.nextInt(5))).toMap
    val L = 3
    // candidate pieces from the operator itself (single chars guaranteed)
    val cand = Unigram.candidatePieces(vocabDf(words), L, minCount = 2L)
    val costs = Unigram.pieceCosts(cand).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // reference DP: best(i) = min over j of (best(i-j) + cost, j),
    // smaller j on ties — then walk back emitting the chosen pieces
    def reference(w: String): Seq[String] = {
      val best = Array.fill(w.length + 1)((Long.MaxValue, 0))
      best(0) = (0L, 0)
      for (i <- 1 to w.length) {
        val picks = (1 to math.min(L, i)).flatMap { j =>
          val piece = w.substring(i - j, i)
          costs.get(piece).filter(_ => best(i - j)._1 != Long.MaxValue)
            .map(c => (best(i - j)._1 + c, j))
        }
        if (picks.nonEmpty) best(i) = picks.min
      }
      var pos = w.length
      val out = scala.collection.mutable.ArrayBuffer[String]()
      while (pos > 0) {
        val j = best(pos)._2
        out += w.substring(pos - j, pos); pos -= j
      }
      out.toSeq.sorted
    }
    val got = segPieces(words, costs, L)
    words.keys.foreach { w =>
      assert(got(w) == reference(w), s"word $w diverged from reference DP")
    }
  }

  test("unsegmentable words drop from counts AND segmentation (the " +
      "pruned-model serving path — regression for the codegen NPE on " +
      "null DP states)") {
    // model lacks 'c'/'d': "cd" and "abcd" are unsegmentable; "ab"
    // segments as the single piece (150 < 100+100)
    val vocab = vocabDf(Map("ab" -> 1L, "cd" -> 2L, "abcd" -> 3L))
    val costs = Map("a" -> 100L, "b" -> 100L, "ab" -> 150L)
    val counts = Unigram.viterbiCounts(vocab, costDf(costs), 2, 8)
      .collect().map(r => (r.getString(0), r.getLong(2))).toMap
    assert(counts == Map("ab" -> 1L))
    val seg = Unigram.viterbiSegment(vocab, costDf(costs), 2, 8)
      .collect().map(r => (r.getString(0), r.getString(2)))
    assert(seg.toSeq == Seq(("ab", "ab")))
  }

  test("fertilityOov is TOTAL: every word is counted, and both fallback " +
      "classes (out-of-window, unsegmentable) serve as char sequences") {
    val docs = spark.createDataFrame(
      java.util.Arrays.asList(
        org.apache.spark.sql.Row(1L, "abcdefghij ab xq", "en")),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("doc_id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("text",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("lang",
          org.apache.spark.sql.types.StringType))))
    val costs = Map("a" -> 100L, "b" -> 100L, "ab" -> 150L)
    val out = Unigram.fertilityOov(docs, "doc_id", "text", "lang",
        costDf(costs), maxPieceLen = 2, maxWordLen = 4)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))
    // "abcdefghij": len 10 > window 4 -> 10 char pieces (fallback);
    // "ab": in-window, DP picks the single piece (150 < 200);
    // "xq": in-window but unsegmentable (no x/q costs) -> 2 (fallback)
    assert(out.toSeq == Seq(("en", 3L, 13L, 2L)))
  }

  test("viterbiEncode round-trip: pieces in k order concatenate back to " +
      "the word, and the piece multiset equals viterbiSegment's") {
    val rnd = new scala.util.Random(23)
    val alpha = "abcd"
    val words = (1 to 30).map { _ =>
      (1 to (1 + rnd.nextInt(7))).map(_ => alpha(rnd.nextInt(4))).mkString
    }.distinct.map(w => w -> (1L + rnd.nextInt(4))).toMap
    val cand = Unigram.candidatePieces(vocabDf(words), 3, minCount = 2L)
    val costs = Unigram.pieceCosts(cand)
    val enc = Unigram.viterbiEncode(vocabDf(words), costs, 3, 8)
      .collect().map(r => (r.getString(0), r.getInt(2), r.getString(3)))
    val byWord = enc.groupBy(_._1)
    words.keys.foreach { w =>
      val pieces = byWord(w).sortBy(_._2)
      assert(pieces.map(_._2).toSeq == (1 to pieces.length),
        s"$w: k not contiguous from 1")
      assert(pieces.map(_._3).mkString == w, s"$w: round-trip failed")
    }
    val segMultiset = Unigram.viterbiSegment(vocabDf(words), costs, 3, 8)
      .collect().map(r => (r.getString(0), r.getString(2))).sorted.toSeq
    assert(enc.map(e => (e._1, e._3)).sorted.toSeq == segMultiset)
  }

  test("trainOnce conserves weighted character mass and recounts from " +
      "the segmentation") {
    val docs = strDf("text", Seq("aba ab aba", "ab b ab ab"))
    val out = Unigram.trainOnce(docs, "text", maxPieceLen = 2,
      maxWordLen = 8, minCount = 1L)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    // Σ n(piece)·len(piece) = Σ freq(word)·len(word): aba×2, ab×4, b×1
    val charMass = out.map { case (p, n, _) => n * p.length }.sum
    assert(charMass == 2L * 3 + 4L * 2 + 1L * 1)
    // counts are positive and costs are valid micro-nats of the recount:
    // more frequent pieces never cost more
    val byN = out.sortBy(-_._2).toSeq
    byN.sliding(2).foreach {
      case Seq((_, n1, c1), (_, n2, c2)) =>
        if (n1 > n2) assert(c1 < c2)
        else if (n1 == n2) assert(c1 == c2)
      case _ => ()
    }
  }

  test("pruneVocab: keeps all single chars, ranks multi pieces by the " +
      "single-char fallback loss, and hand-checks the loss formula") {
    import org.apache.spark.sql.types._
    def df(rows: Seq[(String, Long, Long)]) = spark.createDataFrame(
      java.util.Arrays.asList(rows.map { case (p, n, c) =>
        org.apache.spark.sql.Row(p, n, c) }: _*),
      StructType(Seq(StructField("piece", StringType),
        StructField("n", LongType), StructField("cost", LongType))))
    val trained = df(Seq(("a", 5L, 100L), ("b", 3L, 200L),
      ("ab", 4L, 250L), ("ba", 2L, 260L), ("aa", 1L, 180L)))
    val out = Unigram.pruneVocab(trained, trained, keepPieces = 2)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        Option(r.get(3)).map(_.asInstanceOf[Long]))).toSet
    // losses: ab → 4·(100+200−250)=200; ba → 2·(200+100−260)=80;
    // aa → 1·(100+100−180)=20 → top-2 keeps ab, ba; chars always kept
    assert(out == Set(
      ("a", 5L, 100L, None), ("b", 3L, 200L, None),
      ("ab", 4L, 250L, Some(200L)), ("ba", 2L, 260L, Some(80L))))
  }

  test("fertility: bounded per word by construction and matches a " +
      "hand-counted corpus") {
    val docs = spark.createDataFrame(
      java.util.Arrays.asList(
        org.apache.spark.sql.Row(1L, "aba ab", "en"),
        org.apache.spark.sql.Row(2L, "ab ab b", "fr")),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("doc_id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("text",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("lang",
          org.apache.spark.sql.types.StringType))))
    val out = Unigram.fertility(docs, "doc_id", "text", "lang",
        maxPieceLen = 2, maxWordLen = 8, minCount = 1L)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    out.foreach { case (_, nWords, nPieces) =>
      assert(nPieces >= nWords && nPieces <= nWords * 8)
    }
    assert(out.map(_._1).toSeq == Seq("en", "fr"))
  }
}
