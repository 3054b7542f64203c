package graft

import org.scalatest.funsuite.AnyFunSuite

/** Registry-consistency guards for the bench harness: the tier map and
  * the oracle map are hand-kept beside `SparkEntry.queries`, and both
  * have drifted silently before (q115/q116 were appended to the ingest
  * set by hand). Pure bookkeeping assertions — no SparkSession. */
class BenchSpec extends AnyFunSuite {

  private val names = SparkEntry.queries.keySet

  test("every registered query follows qNN_name and maps to a tier") {
    names.foreach { n =>
      assert(Bench.queryNum(n) > 0,
        s"query '$n' does not follow the qNN_ naming convention — " +
          "tierOf would silently bucket it by the -1 fallback")
      assert(Set("core", "ingest_sink", "extension")(Bench.tierOf(n)))
    }
  }

  test("every ingest_sink tier member names a registered query") {
    val registered = names.map(Bench.queryNum)
    val stale = Bench.ingestSinkNums.diff(registered)
    assert(stale.isEmpty,
      s"ingest_sink tier carries unregistered query numbers: $stale — " +
        "remove them or register the queries")
  }

  test("query numbers are unique (the compact bench keys depend on it)") {
    // The stdout summary keys queries by their qNN prefix; a duplicate
    // number would make two suite entries collide in the artifact.
    val dup = names.groupBy(Bench.queryNum).filter(_._2.size > 1)
    assert(dup.isEmpty, s"duplicate query numbers: $dup")
  }

  test("every oracle entry names a registered query") {
    val stale = SparkEntry.oracleSql.keySet.diff(names)
    assert(stale.isEmpty, s"oracleSql keys with no query: $stale")
  }
}
