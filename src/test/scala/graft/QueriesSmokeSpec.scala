package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Smoke: every registered query runs on sf0.001 and returns a sane
  * result. Value-level correctness is covered by the DuckDB oracle
  * (driver gate + tools/check.py).
  */
class QueriesSmokeSpec extends AnyFunSuite with Matchers with SparkSessionSetup {

  test("entry returns rows") {
    SparkEntry.entry(spark).count() should be > 0L
  }

  test("every oracle key has a matching query") {
    SparkEntry.oracleSql.keySet.diff(SparkEntry.queries.keySet) shouldBe empty
  }

  test("registry invariants: full oracle coverage, naming, monotone size") {
    // round 6 closed with 93 queries, EVERY one DuckDB-oracled — a
    // future refactor must not silently drop queries or regress a
    // query to rows-only (the weaker driver check)
    SparkEntry.queries.size should be >= 93
    SparkEntry.queries.keySet.diff(SparkEntry.oracleSql.keySet) shouldBe empty
    all(SparkEntry.queries.keys) should startWith("q_")
    all(SparkEntry.oracleSql.values.map(_.trim)) should not be empty
  }

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"$name runs on sf0.001") {
      val df = fn(spark, sfDir)
      df.columns.length should be > 0
      noException should be thrownBy df.count()
    }
  }
}
