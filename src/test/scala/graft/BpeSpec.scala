package graft

import graft.operators.Bpe
import org.apache.spark.sql.functions._

/** Distributed BPE training (operators/Bpe.scala): pair counting, greedy
  * merge semantics, deterministic tie-breaks, early stop, and the
  * train/apply round-trip on the classic low/lower/lowest corpus. */
class BpeSpec extends SparkSpec {

  private def docs = strDf("text",
    Seq("low low low", "lower lowest"))

  test("pairCounts: frequency-weighted adjacent char pairs") {
    val got = Bpe.pairCounts(Bpe.vocab(docs, "text"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // low×3, lower×1, lowest×1 → (l,o) and (o,w) appear in all 5
    assert(got("l o") == 5L && got("o w") == 5L)
    assert(got("w e") == 2L && got("e r") == 1L && got("s t") == 1L)
  }

  test("mergePair is greedy left-to-right: (a,a) over aaa gives [aa, a]") {
    import spark.implicits._
    val out = Seq(Seq("a", "a", "a")).toDF("syms")
      .select(Bpe.mergePair(col("syms"), "a", "a").as("m"))
      .head().getSeq[String](0)
    assert(out == Seq("aa", "a"))
  }

  test("train: merge order is (l,o) then (lo,w) then (low,e) — counts " +
      "argmaxed, 5-way tie broken lexicographically") {
    val (merges, vocab) = Bpe.train(docs, "text", 3)
    assert(merges == Seq(("l", "o"), ("lo", "w"), ("low", "e")))
    val syms = vocab.collect()
      .map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    assert(syms("low") == Seq("low"))
    assert(syms("lower") == Seq("lowe", "r"))
    assert(syms("lowest") == Seq("lowe", "s", "t"))
  }

  test("train stops early when no pair repeats (freq < 2 never merges)") {
    val (merges, _) = Bpe.train(strDf("text", Seq("ab cd")), "text", 10)
    assert(merges.isEmpty)
  }

  test("applyMerges reproduces the trained symbolization") {
    val (merges, trained) = Bpe.train(docs, "text", 3)
    val applied = Bpe.applyMerges(Bpe.vocab(docs, "text"), merges)
      .collect().map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    val want = trained.collect()
      .map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    assert(applied == want)
  }
}
