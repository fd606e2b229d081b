package graft

import org.scalatest.funsuite.AnyFunSuite

/** Plan resolution parity (reference `src/planner/plan-builder.ts`,
  * `src/validators/preflight.ts`). Pure driver logic — no Spark session. */
class PlannerSpec extends AnyFunSuite {

  private val global: Seq[(String, Seq[String])] = Seq(
    "EMAIL_FAKE" -> Seq("email", "c_name"),
    "HASH_SHA256" -> Seq("phone"),
    "REDACT" -> Seq("email")) // email ALSO under REDACT: first entry must win

  test("precedence: explicit table rule beats global beats KEEP") {
    val cols = Seq(ColumnRule("email", Some("SET_NULL")))
    assert(Planner.resolveStrategy("email", cols, global).strategy == Strategy.SetNull)
    assert(Planner.resolveStrategy("email", Seq(ColumnRule("email")), global)
      .strategy == Strategy.EmailFake)
    assert(Planner.resolveStrategy("other", Seq(ColumnRule("other")), global)
      .strategy == Strategy.Keep)
  }

  test("global map resolves in insertion order when a column appears twice") {
    assert(Planner.resolveStrategy("email", Seq(ColumnRule("email")), global)
      .strategy == Strategy.EmailFake) // not REDACT
  }

  test("duplicate column entries: ANY same-named entry with a strategy wins for all") {
    // reference plan-builder.ts:25-27 searches the whole list
    val cols = Seq(ColumnRule("c"), ColumnRule("c", Some("REDACT")))
    assert(Planner.resolveStrategy("c", cols, Nil).strategy == Strategy.Redact)
  }

  test("params ride along with the explicit rule") {
    val cols = Seq(ColumnRule("c", Some("TRUNCATE"), StrategyParams(Some(2))))
    assert(Planner.resolveStrategy("c", cols, Nil).params.n.contains(2))
  }

  test("splitTable rejects bare and malformed names as the reference throws") {
    assert(Planner.splitTable("public.customer") == ("public", "customer"))
    for (bad <- Seq("customer", ".customer", "public.", ""))
      assertThrows[IllegalArgumentException](Planner.splitTable(bad))
    // reference's full.split(".") destructuring drops extra segments
    assert(Planner.splitTable("a.b.c") == ("a", "b"))
  }

  test("denylist matches raw rule string or bare name; disabled rules drop") {
    val cfg = Config(
      reviewed = true,
      scope = Scope("public", Seq("public.region", "nation")),
      columnStrategy = Seq("REDACT" -> Seq("x")),
      rules = Seq(
        TableRule("public.customer", enabled = true, Seq(ColumnRule("x"))),
        TableRule("public.region", enabled = true, Seq(ColumnRule("x"))),
        TableRule("public.nation", enabled = true, Seq(ColumnRule("x"))),
        TableRule("public.part", enabled = false, Seq(ColumnRule("x")))))
    val plan = Planner.buildPlan(cfg, "t")
    assert(plan.tables.map(_.table) == Seq("public.customer"))
    assert(plan.tables.head.columns.head.strategy == Strategy.Redact)
  }

  test("preflight gates mirror the reference's four checks") {
    val good = Config(reviewed = true,
      columnStrategy = Seq("KEEP" -> Seq("id")),
      rules = Seq(TableRule("public.t", enabled = true)))
    assert(Planner.preflight(good, Planner.Apply).isEmpty)
    assert(Planner.preflight(good.copy(version = 2), Planner.DryRun)
      .exists(_.contains("version")))
    assert(Planner.preflight(good.copy(reviewed = false), Planner.Apply)
      .exists(_.contains("reviewed")))
    assert(Planner.preflight(good.copy(reviewed = false), Planner.DryRun).isEmpty)
    assert(Planner.preflight(good.copy(rules = Nil), Planner.DryRun)
      .exists(_.contains("enabled")))
    assert(Planner.preflight(good.copy(columnStrategy = Nil), Planner.DryRun)
      .exists(_.contains("column_strategy")))
  }
}
