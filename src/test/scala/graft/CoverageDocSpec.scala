package graft

import org.scalatest.funsuite.AnyFunSuite

/** COVERAGE.md is the document the next round trusts — its oracle-gate
  * count must track the registry, not drift by hand.
  */
class CoverageDocSpec extends AnyFunSuite {

  private def coverageText: String = {
    val f = Seq("COVERAGE.md", "/root/repo/COVERAGE.md")
      .map(new java.io.File(_)).find(_.isFile)
      .getOrElse(fail("COVERAGE.md not found"))
    new String(java.nio.file.Files.readAllBytes(f.toPath), "UTF-8")
  }

  test("documented oracle-gate count equals SparkEntry.queries.size") {
    val m = raw"(\d+) oracle gate queries".r.findFirstMatchIn(coverageText)
    assert(m.isDefined, "COVERAGE.md must state the oracle gate count")
    assert(m.get.group(1).toInt == SparkEntry.queries.size,
      s"COVERAGE.md says ${m.get.group(1)} gates but SparkEntry registers " +
        s"${SparkEntry.queries.size} — update the doc")
  }

  test("every registered query has an oracle and vice versa") {
    assert(SparkEntry.oracleSql.keySet == SparkEntry.queries.keySet,
      s"oracle/query key mismatch: only-in-queries=" +
        s"${SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet}, " +
        s"only-in-oracle=${SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet}")
  }
}
