package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

class AuditSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val Sf = "/root/testdata/sf0.001"

  test("testdata star schema audits clean, with real cardinalities") {
    val rows = Audit.fkIntegrity(spark, Sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(rows.size === 7)
    // Clean corpus: zero orphans on every edge, nonzero cardinalities.
    // (Unreferenced parents are informational, not violations: at sf0.001
    // the 10 suppliers cover only 10 of 25 nations.)
    rows.foreach { case (fk, (childRows, distinctKeys, orphans, _)) =>
      assert(orphans === 0L, fk)
      assert(childRows > 0L, fk)
      assert(distinctKeys > 0L && distinctKeys <= childRows, fk)
    }
    assert(rows("supplier.s_nationkey->nation.n_nationkey")._4 === 15L)
    // nation has 25 rows / 25 distinct region-referencing keys? No — 25
    // nations over 5 regions: distinct child keys = 5.
    assert(rows("nation.n_regionkey->region.r_regionkey")._1 === 25L)
    assert(rows("nation.n_regionkey->region.r_regionkey")._2 === 5L)
  }

  test("injected violations are counted: orphans (incl. NULL keys) and unreferenced parents") {
    import spark.implicits._
    val child = Seq(
      (1L, Option(10L)), (2L, Option(10L)), // two rows on a live parent
      (3L, Option(99L)), (4L, Option(99L)), (5L, Option(99L)), // three orphaned rows, one bad key
      (6L, None) // NULL FK = orphan (a join would drop it)
    ).toDF("id", "fk")
    val parent = Seq(10L, 20L, 30L).toDF("pk") // 20 and 30 are never referenced
    val r = Audit.edgeProfileOn(child, "fk", parent, "pk", "child.fk->parent.pk").collect().head
    assert(r.getString(0) === "child.fk->parent.pk")
    assert(r.getLong(1) === 6L) // child_rows
    assert(r.getLong(2) === 2L) // distinct non-null keys: 10, 99
    assert(r.getLong(3) === 4L) // orphan rows: three 99s + the NULL
    assert(r.getLong(4) === 2L) // unreferenced parents: 20, 30
  }
}
