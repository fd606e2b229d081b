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
    val r = Bpe.train(docs, "text", 3)
    assert(r.merges == Seq(("l", "o"), ("lo", "w"), ("low", "e")))
    assert(r.rounds == 3) // batch=1: one round per merge
    val syms = r.vocab.collect()
      .map(row => row.getString(0) -> row.getSeq[String](1)).toMap
    assert(syms("low") == Seq("low"))
    assert(syms("lower") == Seq("lowe", "r"))
    assert(syms("lowest") == Seq("lowe", "s", "t"))
  }

  test("train stops early when no pair repeats (freq < 2 never merges)") {
    val r = Bpe.train(strDf("text", Seq("ab cd")), "text", 10)
    assert(r.merges.isEmpty && r.rounds == 0)
  }

  test("applyMerges reproduces the trained symbolization") {
    val r = Bpe.train(docs, "text", 3)
    val applied = Bpe.applyMerges(Bpe.vocab(docs, "text"), r.merges)
      .collect().map(row => row.getString(0) -> row.getSeq[String](1)).toMap
    val want = r.vocab.collect()
      .map(row => row.getString(0) -> row.getSeq[String](1)).toMap
    assert(applied == want)
  }

  // Planted corpus where batching is provably safe: the top pairs are
  // mutually symbol-disjoint and merging any of them mints no pair that
  // could outrank a later pick ("ab" collapses to one symbol, so no new
  // adjacency appears). ab×5 > cd×4 > ef×3 > gh×2.
  private def disjointDocs = strDf("text",
    Seq("ab ab ab ab ab cd cd cd cd", "ef ef ef gh gh"))

  test("batched train ≡ sequential train on a disjoint-top-pair corpus, " +
      "in 1 round instead of 4") {
    val seq = Bpe.train(disjointDocs, "text", 4)
    val bat = Bpe.train(disjointDocs, "text", 4, batch = 4)
    assert(seq.merges == Seq(("a", "b"), ("c", "d"), ("e", "f"), ("g", "h")))
    assert(bat.merges == seq.merges)
    assert(seq.rounds == 4 && bat.rounds == 1)
    val sv = seq.vocab.collect()
      .map(row => row.getString(0) -> row.getSeq[String](1)).toMap
    val bv = bat.vocab.collect()
      .map(row => row.getString(0) -> row.getSeq[String](1)).toMap
    assert(bv == sv)
  }

  test("batched train skips overlapping pairs within a round: the greedy " +
      "pick still wins, the overlap defers to the next round") {
    // counts: (l,o)=5, (o,w)=5, (w,e)=2 — (o,w) shares o with the pick
    // (l,o), and (w,e) shares w with nothing picked yet → round 1 takes
    // (l,o) and (w,e); round 2 re-counts and sees (lo,w).
    val bat = Bpe.train(docs, "text", 3, batch = 2)
    assert(bat.merges.take(2) == Seq(("l", "o"), ("w", "e")))
    assert(bat.rounds == 2)
  }
}
