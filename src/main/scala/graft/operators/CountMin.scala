package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Count-Min frequency sketch — the mergeable heavy-hitter / frequency
 * counterpart of the HLL distinct sketches in [[Scale.sketchDistinct]]
 * (Cormode & Muthukrishnan 2005). A d×w grid of counters; every key
 * increments one counter per row (bucket chosen by an independent hash),
 * and a key's estimate is the MINIMUM of its d counters: always ≥ the true
 * count, over by at most the collision mass in its luckiest bucket.
 *
 * Scale design (100 TB):
 *  - the build is ONE scan + one partial-aggregating shuffle that collapses
 *    to ≤ d·w cells (a few KB) regardless of input size — map-side combine
 *    does almost all the work;
 *  - sketches merge by cell-wise addition ([[merge]]), so per-day / per-
 *    shard sketches compose exactly — frequency monitoring stays a
 *    delta-sized job like [[Scale.mergeCounts]];
 *  - estimation is a broadcast join of the tiny cell table against the
 *    candidate keys — the corpus is never rescanned.
 *
 * The bucket hash is the portable md5 family (first `hexW` hex digits of
 * md5(salt|key), giving w = 16^hexW buckets per row): any engine with md5
 * reproduces the entire sketch — cells, estimates, and overestimates —
 * bit-for-bit, which is what lets the DuckDB oracle hash-check an
 * "approximate" operator exactly.
 */
object CountMin {

  /** Default depth-4 hash family; width 16² = 256 buckets per row. */
  val defaultSalts: Seq[String] = Seq("cms0", "cms1", "cms2", "cms3")
  val defaultHexW = 2

  private def buckets(key: Column, salts: Seq[String], hexW: Int): Column =
    array(salts.map(s =>
      substring(md5(concat(lit(s), lit("|"), key.cast("string"))), 1, hexW)): _*)

  /** Build the cell table (row, bucket, n): one scan, d cells emitted per
    * input row, partial-aggregated map-side down to ≤ d·16^hexW rows. */
  def sketch(df: DataFrame, key: Column,
      salts: Seq[String] = defaultSalts, hexW: Int = defaultHexW): DataFrame =
    df.select(posexplode(buckets(key, salts, hexW)).as(Seq("row", "bucket")))
      .groupBy("row", "bucket")
      .agg(count(lit(1)).as("n"))

  /** Merge sketches built with the SAME hash family: cell-wise addition —
    * `merge(sketch(A), sketch(B)) == sketch(A ∪ B)` exactly. */
  def merge(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b).groupBy("row", "bucket").agg(sum("n").as("n"))

  /**
   * Point estimates for candidate keys: min over the d counters, with an
   * absent cell counting 0 (a key never seen estimates 0 only if one of
   * its buckets is empty). The cell table broadcasts; candidates are never
   * shuffled beyond their own group-by.
   */
  def estimate(cells: DataFrame, keys: DataFrame, keyCol: String,
      salts: Seq[String] = defaultSalts, hexW: Int = defaultHexW): DataFrame =
    keys.select(col(keyCol),
        posexplode(buckets(col(keyCol), salts, hexW)).as(Seq("row", "bucket")))
      .join(broadcast(cells), Seq("row", "bucket"), "left")
      .groupBy(keyCol)
      .agg(min(coalesce(col("n"), lit(0L))).as("cms_est"))
}
