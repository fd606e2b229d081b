package graft

import graft.operators.Linkage
import org.apache.spark.sql.functions._

/** Record linkage (operators/Linkage.scala): blocked fuzzy pairing,
  * block capping, and canonical-record resolution on planted records. */
class LinkageSpec extends SparkSpec {

  // Two real entities ("ann"/"anne" typo pair, "bob"/"bbb" 1-edit pair in
  // one block), one singleton, and a cross-block near-pair that blocking
  // must NOT link (declared recall trade).
  private def recs = {
    import spark.implicits._
    Seq((1L, "ann smith", 10L), (2L, "anne smith", 30L),
      (3L, "bob jones", 20L), (4L, "bbb jones", 5L),
      (5L, "zoe black", 7L), (6L, "nnn smith", 99L))
      .toDF("id", "name", "bal")
  }

  test("blockedFuzzyPairs: links within a block at maxDist, never across " +
      "blocks") {
    val pairs = Linkage.blockedFuzzyPairs(recs, "id", "name",
        substring(col("name"), 1, 1), maxDist = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // (1,2) lev=1; (3,4) lev=1; (2,6) lev=2 but blocks 'a' vs 'n' differ.
    assert(pairs == Set((1L, 2L), (3L, 4L)))
  }

  test("capBlocks drops an oversized block: degenerate key cannot go " +
      "quadratic, small blocks keep full recall") {
    import spark.implicits._
    val flood = (10L to 120L).map(i => (i, "same prefix x", 1L))
    val df = recs.union(flood.toDF("id", "name", "bal"))
    val pairs = Linkage.blockedFuzzyPairs(df, "id", "name",
        substring(col("name"), 1, 1), maxDist = 2, maxBlock = 50)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // the 111-member 's' block is dropped; 'a'/'b' blocks survive intact
    assert(pairs == Set((1L, 2L), (3L, 4L)))
  }

  test("resolveEntities: min-id entity labels, singleton self-label, " +
      "argmax canonical with min-id tiebreak") {
    val got = Linkage.resolveEntities(recs, "id", "name",
        substring(col("name"), 1, 1), maxDist = 2, rankCol = col("bal"))
      .collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(got == Map(
      1L -> (2L, 2L, 30L),   // ann+anne; canon = anne (higher bal)
      3L -> (2L, 3L, 20L),   // bob+bbb; canon = bob
      5L -> (1L, 5L, 7L),    // singleton
      6L -> (1L, 6L, 99L)))  // blocked away from the smiths
  }

  test("same-block records that FAIL the verify predicate stay separate " +
      "entities (block co-membership is not linkage — a block-min CC " +
      "seed would wrongly fuse these)") {
    import spark.implicits._
    // All three share block 'm'; only 1↔2 are within edit distance 2.
    // Record 9 ("maximilian overy") is a blocking-key neighbor only — any
    // shortcut that seeds component labels with the block's minimum id
    // would label it into entity 1. Pins Dedup.connectedComponents'
    // documented refusal of that shortcut.
    val df = Seq((1L, "mia wong", 10L), (2L, "mina wong", 20L),
      (9L, "maximilian overy", 99L)).toDF("id", "name", "bal")
    val got = Linkage.resolveEntities(df, "id", "name",
        substring(col("name"), 1, 1), maxDist = 2, rankCol = col("bal"))
      .collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
    assert(got == Map(1L -> (2L, 2L), 9L -> (1L, 9L)))
  }

  test("blockedFuzzyPairs spreads a single-partition input before the " +
      "pair expansion (the |block|² verify must not run in one task)") {
    // Compact parquet tables arrive as ONE scan partition; the capBlocks
    // census rides broadcast joins and preserves that, so without the
    // operator's spreadForCompute the whole pair expansion + Levenshtein
    // verify serializes into a single task. Pin the spread: the pair
    // plan's root RDD must be wider than its 1-partition input.
    val narrow = recs.repartition(1)
    assert(narrow.rdd.getNumPartitions == 1)
    val pairs = Linkage.blockedFuzzyPairs(narrow, "id", "name",
      substring(col("name"), 1, 1), maxDist = 2)
    assert(pairs.rdd.getNumPartitions > 1,
      s"pair expansion runs in ${pairs.rdd.getNumPartitions} partition(s)")
    // and the spread must not change WHAT is produced
    assert(pairs.collect().map(r => (r.getLong(0), r.getLong(1))).toSet ==
      Set((1L, 2L), (3L, 4L)))
  }

  test("resolveEntities tiebreak: equal ranks resolve to the smallest id") {
    import spark.implicits._
    val df = Seq((7L, "pat lee", 50L), (8L, "pat dee", 50L))
      .toDF("id", "name", "bal")
    val got = Linkage.resolveEntities(df, "id", "name",
        substring(col("name"), 1, 1), maxDist = 2, rankCol = col("bal"))
      .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
    assert(got == Map(7L -> 7L))
  }
}
