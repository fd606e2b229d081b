package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Record linkage (entity resolution) over structured records — the
 * row-level twin of the document near-dup pipeline (Dedup): where the
 * reference anonymizes columns one table at a time
 * (`src/executor/executor.ts` walks tables independently), a real
 * de-identification pass first has to LINK the near-duplicate records
 * that describe the same entity, or the "anonymized" table still leaks
 * identity through its duplicates.
 *
 * Same scale discipline as Dedup: candidates meet only inside a blocking
 * key (never all-pairs), oversized blocks are capped by the shared
 * [[Dedup.capBlocks]] guard, and clusters come from the shared
 * [[Dedup.connectedComponents]] (min-label + pointer halving). The verify
 * predicate is exact Levenshtein — engine-portable, so the whole pipeline
 * oracle-checks.
 */
object Linkage {

  /**
   * Blocked fuzzy self-join: candidate pairs share `blockKey`; a pair
   * matches when the edit distance between their `nameCol` values is at
   * most `maxDist`. Returns (a, b) id pairs with a < b.
   *
   * Shape: one shuffle on the block key, pair expansion bounded by
   * [[Dedup.capBlocks]] (a degenerate key — an empty name, a default
   * value — cannot go quadratic), then a scan-local codegen'd Levenshtein
   * verify. At 100 TB the block key is the knob: longer prefix → smaller
   * blocks → fewer verifies, at some recall cost (declared semantics,
   * same trade as MinHash banding).
   *
   * (A FastSS deletion-1-neighborhood candidate join — O(matches) instead
   * of O(Σ|block|²) candidates for maxDist = 1 — was measured here and
   * REJECTED: on digit-heavy keys the deletion variants collide across
   * rows, and the ×(len+1) explode plus the pair-distinct shuffle cost
   * more than the banded-Levenshtein verifies they save, 3.2s vs 2.6s on
   * q_fuzzy_join at sf0.1. Blocks capped at [[Dedup.DefaultMaxBlock]]
   * keep the quadratic term bounded, so the simple join stays the right
   * shape even at scale.)
   */
  def blockedFuzzyPairs(df: DataFrame, idCol: String, nameCol: String,
      blockKey: Column, maxDist: Int,
      maxBlock: Int = Dedup.DefaultMaxBlock): DataFrame = {
    // Persisted: BOTH self-join sides consume the capped frame, and
    // without the persist each side re-runs the block census and its
    // anti-join probe (the physical plan showed four source scans).
    // Freed by releaseAfterUse once the caller's first action over the
    // pair frame completes (in resolveEntities that is CC's init probe,
    // which materializes the persisted symmetrized edge list — after
    // that the keyed frame has no consumer).
    // Spread first: the capBlocks census rides broadcast joins, so the
    // capped frame inherits the SCAN's partitioning — a compact table
    // arrives as one partition and the |block|²-pair expansion plus its
    // Levenshtein verify would run in a single task (see
    // Dedup.containmentPairs for the same hazard).
    val keyed = Scale.spreadForCompute(
      Dedup.capBlocks(
        df.select(col(idCol).as("__id"), col(nameCol).as("__nm"),
          blockKey.as("__blk")),
        "__blk", maxBlock),
      col("__id"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val a = keyed.select(col("__id").as("a"), col("__nm").as("__na"),
      col("__blk"))
    val b = keyed.select(col("__id").as("b"), col("__nm").as("__nb"),
      col("__blk"))
    // Verify funnel, cheapest test first: |len(a)-len(b)| <= maxDist is a
    // necessary condition for edit distance <= maxDist and costs two
    // already-computed lengths per pair, so most of a block's pair
    // expansion dies before any DP matrix is built. The survivor check is
    // the THRESHOLDED levenshtein (banded O(n·k) DP that bails once the
    // distance provably exceeds maxDist, returning -1) — not the full
    // O(n²) distance.
    Scale.releaseAfterUse(
      a.join(b, "__blk").filter(col("a") < col("b"))
        .filter(abs(length(col("__na")) - length(col("__nb"))) <= maxDist)
        .filter(levenshtein(col("__na"), col("__nb"), maxDist) >= 0)
        .select("a", "b"),
      Seq(keyed))
  }

  /**
   * End-to-end entity resolution: fuzzy pairs → connected components →
   * one canonical record per entity. Every input row appears exactly once
   * in the output, labeled with its entity id (the component's minimum
   * record id; singletons label themselves — same convention as
   * q_dedup_survivor). The canonical member is the argmax of `rankCol`
   * (ties to the smallest id), computed as ONE max(struct) hash aggregate
   * — partial aggregation map-side, no per-entity windows.
   *
   * Storage note: the result aggregates over a localCheckpoint-backed
   * label table whose RDD blocks outlive this call (freeing them on the
   * caller's first action would leave the lazy result unable to ever
   * recompute — worse than the cached blocks). A session composing many
   * resolutions frees them after materializing via
   * `GraftBridge.freeCheckpoint` (the `Curate.run` pattern); the
   * Verify/Bench harnesses sweep RDD blocks per query anyway.
   *
   * Returns (entity, n_members, canon_id, canon_rank).
   */
  def resolveEntities(df: DataFrame, idCol: String, nameCol: String,
      blockKey: Column, maxDist: Int, rankCol: Column): DataFrame = {
    val edges = blockedFuzzyPairs(df, idCol, nameCol, blockKey, maxDist)
    val labels = Dedup.connectedComponents(edges, "a", "b")
    val members = df.select(col(idCol).as("__mid"), rankCol.as("__rank"))
      .join(labels, col("__mid") === col("id"), "left")
      .select(coalesce(col("comp"), col("__mid")).as("entity"),
        col("__mid"), col("__rank"))
    members.groupBy("entity")
      .agg(count(lit(1)).as("n_members"),
        max(struct(col("__rank").as("r"), (-col("__mid")).as("ni"))).as("m"))
      .select(col("entity"), col("n_members"), (-col("m.ni")).as("canon_id"),
        col("m.r").as("canon_rank"))
  }
}
