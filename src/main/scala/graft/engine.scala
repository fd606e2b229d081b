package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions.col

/**
 * Plan execution (reference `src/executor/executor.ts:87-147`, re-expressed
 * for Spark's read→transform→write model; Spark has no in-place UPDATE, and
 * copy-on-write is strictly safer than the reference's write-then-rollback).
 *
 * Design notes for 100 TB scale:
 *  - one `select` per table fuses every column transform into a single
 *    whole-stage-codegen pass (the reference's one-UPDATE-per-table fusion,
 *    `query-builder.ts:14-61`);
 *  - nothing is collected to the driver; dry-run is a distributed `count()`;
 *  - a table whose plan leaves every column untouched is skipped entirely
 *    (`executor.ts:120-124`).
 */
object Engine {

  /**
   * Compile one table's plan to its output column list. Type-safety
   * normalization (`executor.ts:45-85`) runs here against the live schema —
   * the Spark analogue of the reference's pre-UPDATE type re-probe
   * (`executor.ts:24-38`).
   */
  def compileTable(df: DataFrame, planned: Seq[PlannedColumn]): Seq[Column] = {
    val byName = planned.map(p => p.column -> p).toMap
    df.schema.fields.toSeq.map { f =>
      byName.get(f.name) match {
        case Some(p) =>
          val eff = Strategies.normalizeFor(p.strategy, f.dataType)
          Strategies.compile(f.name, eff, p.params, f.dataType)
        case None => col(f.name)
      }
    }
  }

  /** True if the plan transforms nothing on this table (skip, `executor.ts:120-124`). */
  def isNoop(df: DataFrame, planned: Seq[PlannedColumn]): Boolean = {
    val types = df.schema.fields.map(f => f.name -> f.dataType).toMap
    !planned.exists { p =>
      types.get(p.column).exists { dt =>
        Strategies.normalizeFor(p.strategy, dt) != Strategy.Keep &&
        !p.strategy.isInstanceOf[Strategy.Unknown]
      }
    }
  }

  /** Transform every planned table; catalog maps bare table name → DataFrame. */
  def transform(plan: Plan, catalog: Map[String, DataFrame]): Map[String, DataFrame] =
    plan.tables.flatMap { pt =>
      catalog.get(pt.name).map { df =>
        pt.table -> df.select(compileTable(df, pt.columns): _*)
      }
    }.toMap

  /**
   * Dry run: per-table affected-row counts, no write (the reference's
   * rowCount per UPDATE inside a rolled-back transaction,
   * `executor.ts:100-137`). The count equals full table cardinality because
   * the reference's UPDATEs carry no WHERE.
   */
  def dryRun(plan: Plan, catalog: Map[String, DataFrame]): Map[String, Long] =
    transform(plan, catalog).map { case (t, df) => t -> df.count() }

  /**
   * Apply: write each transformed table as parquet under `outDir/<name>`.
   * Row counts are read back from parquet footers (metadata-only scan) so the
   * transform runs exactly once — no second pass over the data.
   */
  def apply(plan: Plan, catalog: Map[String, DataFrame], outDir: String): Map[String, Long] =
    transform(plan, catalog).map { case (t, df) =>
      val path = s"$outDir/${t.replace('.', '_')}"
      df.write.mode("overwrite").parquet(path)
      t -> df.sparkSession.read.parquet(path).count()
    }

  /** Driver-side total, as the reference's report sums (`main.ts:80-83`). */
  def totalRows(counts: Map[String, Long]): Long = counts.values.sum
}
