package graft

import org.scalatest.funsuite.AnyFunSuite

/** Driver-contract sanity: the queries/oracle maps must stay consistent —
  * a typo'd oracle key would silently orphan the oracle and weaken the
  * correctness gate.
  */
class SparkEntrySpec extends AnyFunSuite {

  test("every oracle key names an existing query") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracles without queries: $orphans")
  }

  test("oracle SQL strings are non-trivial") {
    SparkEntry.oracleSql.foreach { case (k, sql) =>
      assert(sql.trim.toUpperCase.startsWith("SELECT") || sql.trim.toUpperCase.startsWith("WITH"),
        s"$k oracle does not look like SQL")
      assert(sql.length > 30, s"$k oracle suspiciously short")
    }
  }

  test("query names are stable kebab/snake identifiers") {
    SparkEntry.queries.keys.foreach { k =>
      assert(k.matches("[a-z0-9_]+"), s"query name '$k' not snake_case")
    }
  }

  test("non-oracled queries are the documented hash/approximate set") {
    val rowsOnly = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    val expected = Set(
      "q_extract_pipeline", "q_extract_summary", // pipeline itself: golden fixtures gate it
      "q_garbled_signal", "q_postprocess_chain", // kernel dumps: unit suites gate them
      "q_ann_lsh", "q_ann_ivf", // approximate search
      "q_approx_distinct" // sketch estimates engine-specific
    )
    assert(rowsOnly == expected, s"unexpected rows-only set: ${rowsOnly -- expected} / missing: ${expected -- rowsOnly}")
  }
}
