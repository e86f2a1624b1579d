package graft

import org.scalatest.funsuite.AnyFunSuite

/** Guards the bench-emission contract: the driver captures only a
  * bounded tail of stdout, and round 4 lost seven queries' numbers to
  * an oversized summary line. These checks fail the build before a
  * future query addition regresses that fix.
  */
class BenchContractSpec extends AnyFunSuite {

  test("qNN short keys are unique across the query inventory") {
    val names = SparkEntry.queries.keys.toSeq
    val short = names.map(_.takeWhile(_ != '_'))
    assert(short.distinct.size == names.size,
      s"colliding qNN prefixes: ${short.diff(short.distinct).distinct}")
    // the base-36 summary keys go through toLong, so "q01"/"q1" would
    // silently merge even though their string prefixes differ
    val nums = short.map(_.stripPrefix("q").toLong)
    assert(nums.distinct.size == names.size,
      s"colliding numeric keys: ${nums.diff(nums.distinct).distinct}")
  }

  test("worst-case summary line stays well inside the capture window") {
    val names = SparkEntry.queries.keys.toSeq.sorted
    // worst case mirrors Bench's emission: base-36 keys and f1
    // values display-clamped to 9.9 (3 chars) — the clamp is what
    // makes this a true bound rather than a hope
    val line = names.map(n =>
        "\"" + java.lang.Long.toString(
          n.takeWhile(_ != '_').stripPrefix("q").toLong, 36) + "\":9.9")
      .mkString(
        """{"metric":"total","value":99999.999,"unit":"sec","queries":{""",
        ",",
        // Bench emits sf as its basename — mirror that exactly, the
        // bound is only honest if the template matches the emission
        """},"sf":"sf0.1"}""")
    assert(line.length < 2000,
      s"summary line would be ${line.length} bytes — the r4 truncation " +
        "started near 2.3 KB; shorten keys or split the line")
  }

  test("every query has an oracle (the driver gate sees no no_oracle rows)") {
    val missing = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(missing.isEmpty, s"queries without oracle SQL: $missing")
  }
}
