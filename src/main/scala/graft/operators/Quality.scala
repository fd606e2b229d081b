package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Table-level data-quality operators: a Deequ-style constraint suite and
 * distribution-drift measurement. The reference validates data only
 * implicitly (type probing before anonymisation,
 * `src/config/config-generator.ts:40-60`); a production pipeline publishes
 * an explicit validation report per ingest and alerts on drift between
 * sources/snapshots. Both operators are single-scan: N row-level
 * constraints fold into ONE hash aggregate (not N scans), and drift
 * reduces the input to a tiny (group × bin) cell table before any join.
 *
 * Every metric is an exact long count or ONE IEEE division of two exact
 * longs, so reports are bit-identical across engines and re-runs — the
 * property that lets a 100 TB pipeline diff today's report against
 * yesterday's byte-for-byte.
 */
object Quality {

  /** One row-level constraint: `ok` must be a boolean expression over a
    * single row of the target table (null counts as failed). */
  final case class RowCheck(name: String, column: String, ok: Column)

  /**
   * Validation report over one table: all row-level checks plus exact
   * uniqueness checks, computed in a SINGLE aggregate pass over the scan
   * (each check is one conditional-sum column; uniqueness adds
   * count(distinct) which Catalyst folds into the same Expand-based
   * aggregate). The wide one-row result is then pivoted to one row per
   * constraint with an in-memory explode — no second scan, no shuffle
   * beyond the one partial/final aggregate exchange.
   *
   * metric = passing fraction (one division of exact longs; 1.0 on an
   * empty table — every constraint is vacuously true). passed = zero
   * failures.
   */
  def report(df: DataFrame, checks: Seq[RowCheck],
      uniqueCols: Seq[String] = Nil): DataFrame = {
    require(checks.nonEmpty || uniqueCols.nonEmpty, "no constraints given")
    val aggs =
      checks.map(c => sum(when(c.ok, 0L).otherwise(1L)).as(s"__f_${c.name}")) ++
        uniqueCols.map(c => count_distinct(col(c)).as(s"__d_$c"))
    val wide = df.agg(count(lit(1)).as("__n"), aggs: _*)
    val n = col("__n")
    def row(name: String, column: String, failed: Column) = struct(
      lit(name).as("constraint"), lit(column).as("column"),
      failed.as("n_failed"),
      when(n === 0, 1.0).otherwise((n - failed).cast("double") / n)
        .as("metric"),
      (failed === 0).as("passed"))
    val rows =
      checks.map(c => row(c.name, c.column, coalesce(col(s"__f_${c.name}"), lit(0L)))) ++
        uniqueCols.map(c => row("unique", c, n - col(s"__d_$c")))
    wide.select(explode(array(rows: _*)).as("r")).select(col("r.*"))
  }

  /**
   * Referential-integrity check as one report row: counts child rows whose
   * `fk` value has no match in `parent(pk)` (null fk counts as an orphan —
   * a training-data join would drop it). Plans as a broadcast left-anti
   * join when the parent is small, a shuffled anti join otherwise; either
   * way one pass over the child. Union the row onto [[report]]'s output.
   */
  def refIntegrity(child: DataFrame, fk: String, parent: DataFrame,
      pk: String): DataFrame = {
    val orphans = child.select(col(fk))
      .join(parent.select(col(pk).as(fk)), Seq(fk), "left_anti")
      .agg(count(lit(1)).as("__orph"))
    val n = child.agg(count(lit(1)).as("__n"))
    orphans.crossJoin(n).select(
      lit("ref_integrity").as("constraint"), lit(fk).as("column"),
      col("__orph").as("n_failed"),
      when(col("__n") === 0, 1.0)
        .otherwise((col("__n") - col("__orph")).cast("double") / col("__n"))
        .as("metric"),
      (col("__orph") === 0).as("passed"))
  }

  /**
   * Distribution drift per group: the exact total-variation distance
   * between each group's distribution over `bin` and the corpus-wide
   * distribution. TVD(s) = ½ Σ_b |c_sb/N_s − n_b/N| — computed as the
   * integer Σ_b |c_sb·N − n_b·N_s| followed by ONE division by 2·N·N_s,
   * so the result is bit-exact (no per-bin floating sums).
   *
   * Scale shape: the input collapses map-side to a (group × bin) cell
   * table; group totals and bin totals are second-level aggregates of the
   * CELLS (never the input), and the group×bin dense frame is a
   * broadcast-able cross of two tiny dimension tables — zero-count cells
   * (a bin the group never hit) still contribute |0 − n_b·N_s|, which a
   * naive cells-only join would silently drop.
   *
   * Integer headroom: counts are exact longs, but the cross products
   * c·N and n_b·N_s run in decimal(38,0) (as tCloseness's do), so the
   * audit has no ~3·10⁹-row long-overflow ceiling — a 100 TB corpus with
   * 10¹² rows stays far inside decimal(38,0)'s 38 digits (products of
   * two ≤10¹⁹ counts).
   */
  def driftTvd(df: DataFrame, groupCol: String, bin: Column): DataFrame =
    driftTvdFromCells(
      df.groupBy(col(groupCol), bin.as("__bin")).agg(count(lit(1)).as("__c")),
      groupCol)

  /** [[driftTvd]] over pre-aggregated (group, __bin, __c) cells — the
    * injection point that lets a spec drive multi-billion counts without
    * materializing the rows (mirrors `Privacy.tClosenessFromCounts`). */
  def driftTvdFromCells(cellsIn: DataFrame, groupCol: String): DataFrame = {
    def dec(c: Column) = c.cast("decimal(38,0)")
    val cells = cellsIn
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val grpTot = cells.groupBy(col(groupCol)).agg(sum(col("__c")).as("__ns"))
    val binTot = cells.groupBy(col("__bin")).agg(sum(col("__c")).as("__nb"))
    val total = binTot.agg(sum(col("__nb")).as("__N"))
    Scale.releaseAfterUse(
      grpTot.crossJoin(broadcast(binTot)).crossJoin(broadcast(total))
        .join(cells, Seq(groupCol, "__bin"), "left")
        .groupBy(col(groupCol), col("__ns"), col("__N"))
        .agg(sum(abs(dec(coalesce(col("__c"), lit(0L))) * dec(col("__N")) -
          dec(col("__nb")) * dec(col("__ns")))).as("__num"))
        .select(col(groupCol),
          (col("__num").cast("double") /
            (dec(lit(2L)) * dec(col("__N")) * dec(col("__ns"))).cast("double"))
            .as("tvd")),
      Seq(cells))
  }

  /**
   * Seasonal anomaly verdict over pre-aggregated (event_type, day, hour,
   * n) cells: each cell compares against the mean count of its
   * (event_type, hour-of-day) slot across days — computed WITHOUT
   * division (n·slot_cells > 2·slot_sum, exact long cross-multiplication,
   * engine-portable). The cells/verdict seam mirrors
   * [[driftTvdFromCells]]: batch builds cells from raw nanos
   * (q_anomaly), streaming maintains the same cell table incrementally
   * (Streams.seasonalCells) — ONE verdict lineage over both.
   */
  def seasonalAnomalyFromCells(cellsIn: DataFrame): DataFrame = {
    val cells = cellsIn
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val slots = cells.groupBy("event_type", "hour")
      .agg(count(lit(1)).as("slot_cells"), sum(col("n")).as("slot_sum"))
    Scale.releaseAfterUse(
      cells.join(broadcast(slots), Seq("event_type", "hour"))
        .select(col("event_type"), col("day"), col("hour"), col("n"),
          (col("n") * col("slot_cells") > lit(2) * col("slot_sum"))
            .as("is_anomaly")),
      Seq(cells))
  }

  /**
   * Deflate-compressibility signal: raw UTF-8 length and raw-DEFLATE
   * length per document. Highly repetitive text (boilerplate, spam, SEO
   * keyword stuffing) compresses far below prose; near-random text
   * barely compresses — the classic cheap curation filter that catches
   * what word-level rules miss (RefinedWeb/Gopher-style pipelines gate on
   * exactly this). Runs in mapPartitions with ONE Deflater reused per
   * partition (reset per row, fixed level/strategy, payload never leaves
   * the executor); the JDK's zlib is deterministic for fixed input and
   * settings, so re-runs reproduce byte lengths exactly. The byte
   * lengths are engine-specific (no SQL engine exposes deflate), so the
   * registered query oracle-checks raw_len exactly and brackets
   * deflate_len with the deflate format's worst-case bound
   * (5 bytes per started 16 KiB stored block + the final empty block) —
   * the sketch-verdict pattern (q_agg_approx).
   */
  def compressionStats(df: DataFrame, idCol: String, textCol: String)
      : DataFrame = {
    import org.apache.spark.sql.Encoders
    implicit val enc = Encoders.product[CompressStat]
    df.select(col(idCol).cast("long"), col(textCol))
      .as(Encoders.tuple(Encoders.scalaLong, Encoders.STRING))
      .mapPartitions { rows =>
        val deflater =
          new java.util.zip.Deflater(java.util.zip.Deflater.DEFAULT_COMPRESSION,
            /* nowrap = raw deflate, no zlib header */ true)
        val buf = new Array[Byte](8192)
        rows.map { case (id, text) =>
          val bytes = Option(text).getOrElse("")
            .getBytes(java.nio.charset.StandardCharsets.UTF_8)
          deflater.reset()
          deflater.setInput(bytes)
          deflater.finish()
          var out = 0L
          while (!deflater.finished()) out += deflater.deflate(buf)
          CompressStat(id, bytes.length.toLong, out)
        }
      }.toDF()
  }
}

/** Per-document compressibility measurement (see
  * [[Quality.compressionStats]]). */
final case class CompressStat(doc_id: Long, raw_len: Long, deflate_len: Long)
