package graft

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

/** Pins the documentation's declared-surface counts to `SparkEntry` itself,
  * so README/BASELINE can never drift from the real query registry again
  * (round-3 verdict: docs said 79/77 while the surface was 85/82).
  */
class BookkeepingSpec extends AnyFunSuite {

  test("every declared query has an oracle, except the documented sketches") {
    val rowsOnly = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(rowsOnly == Set("q31_approx_distinct", "q42_approx_percentile"),
      s"undeclared rows-only queries: $rowsOnly — add oracle SQL or document why not")
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracle SQL with no query: $orphans")
  }

  test("README and BASELINE cite the real declared/oracle counts") {
    val declared = SparkEntry.queries.size
    val withOracle = SparkEntry.oracleSql.size
    val readme = Files.readString(Paths.get("README.md"))
    assert(readme.contains(s"$withOracle of the $declared declared"),
      s"README.md must cite '$withOracle of the $declared declared' — " +
        "update the Cross-engine determinism bullet to the real surface")
    val baseline = Files.readString(Paths.get("BASELINE.md"))
    assert(baseline.contains(s"$declared declared total"),
      s"BASELINE.md's latest round row must cite '$declared declared total'")
  }
}
