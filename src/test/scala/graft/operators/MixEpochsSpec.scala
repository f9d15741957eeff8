package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Data-constrained mix planning: a hand-computed waterfall, the
  * infeasible-budget regime (deficit exceeds total headroom — every
  * language saturates at the cap), the single-language degenerate case,
  * and the real-corpus invariants that define the operator (cap never
  * exceeded, budget conserved up to the floor residual, all three
  * waterfall arms live on the shipped thresholds). */
class MixEpochsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val Sf = "/root/testdata/sf0.01"
  private val Scale = Sampling.EpochScale

  /** lang -> (u_tokens, requested, granted, epochs_fp) */
  private def run(u: Seq[(String, Long)], m: Long, cap: Long): Map[String, (Long, Long, Long, Long)] = {
    import spark.implicits._
    Sampling.mixEpochsPlanOfTokens(u.toDF("lang", "u_tokens"), m, cap)
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
  }

  test("crafted waterfall: capped language's surplus flows to the one with headroom") {
    // u = {a: 100, b: 1000}, B = 3*1100 = 3300, equal share 1650 each.
    // a caps at 4*100 = 400 (headroom 0); b keeps 1650 (headroom 2350).
    // Deficit 3300 - 2050 = 1250 <= 2350 flows entirely to b -> 2900.
    val p = run(Seq("a" -> 100L, "b" -> 1000L), m = 3L, cap = 4L)
    assert(p("a") === ((100L, 1650L, 400L, 4L * Scale)))
    assert(p("b") === ((1000L, 1650L, 2900L, 2900L * Scale / 1000L)))
    // single receiver -> zero floor loss: the budget is exactly conserved
    assert(p.values.map(_._3).sum === 3300L)
  }

  test("infeasible budget: every language saturates at the cap, the rest is unfillable") {
    // B = 5*1100 = 5500 > cap*Su = 4400: pass-2 shares exceed every
    // headroom, least() clamps, and granted = cap*u for ALL languages.
    val p = run(Seq("a" -> 100L, "b" -> 1000L), m = 5L, cap = 4L)
    assert(p("a")._3 === 400L && p("b")._3 === 4000L)
    assert(p.values.forall(_._4 === 4L * Scale))
  }

  test("single language: equal share is the whole budget, no waterfall") {
    val p = run(Seq("only" -> 7L), m = 3L, cap = 4L)
    assert(p("only") === ((7L, 21L, 21L, 3L * Scale)))
  }

  test("zero-headroom pass-2 guard: cap 0 grants nothing and does not divide by zero") {
    val p = run(Seq("a" -> 10L, "b" -> 20L), m = 2L, cap = 0L)
    assert(p.values.forall(v => v._3 === 0L && v._4 === 0L))
  }

  test("sf0.01: cap respected, budget conserved to the floor residual, all three arms live") {
    val rows = SparkEntry_mixEpochs().collect()
    val cap = Sampling.MixEpochCap
    val uSum = rows.map(_.getLong(1)).sum
    val budget = Sampling.MixBudgetMult * uSum
    // every epochs_fp at or under the cap; granted at or under cap*u
    assert(rows.forall(r => r.getLong(4) <= cap * Scale))
    assert(rows.forall(r => r.getLong(3) <= cap * r.getLong(1)))
    // feasible regime (3x budget vs 4-epoch cap): conserved up to < nlang
    val granted = rows.map(_.getLong(3)).sum
    assert(granted <= budget)
    assert(budget - granted < rows.length,
      s"waterfall must conserve the budget up to the floor residual: $budget vs $granted")
    // all arms live on the real corpus: at least one language pinned at the
    // cap, at least one receiving pass-2 surplus above its equal share
    assert(rows.exists(_.getLong(4) === cap * Scale), "no language hit the repeat cap")
    assert(rows.exists(r => r.getLong(3) > r.getLong(2)), "no language received waterfall surplus")
    assert(rows.exists(r => r.getLong(3) < r.getLong(2)), "no language was clipped")
    // epochs_fp is exactly the floored fixed-point ratio
    rows.foreach { r =>
      val expect = (BigInt(Scale) * r.getLong(3) / r.getLong(1)).toLong
      assert(r.getLong(4) === expect, s"epochs_fp mismatch for ${r.getString(0)}")
    }
  }

  test("deterministic across runs") {
    val a = SparkEntry_mixEpochs().collect().map(_.toString).sorted
    val b = SparkEntry_mixEpochs().collect().map(_.toString).sorted
    assert(a.sameElements(b))
  }

  private def SparkEntry_mixEpochs() =
    graft.SparkEntry.queries("mix_epochs_plan")(spark, Sf)
      .orderBy(col("lang"))
}
