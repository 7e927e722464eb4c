package graft

import org.scalatest.funsuite.AnyFunSuite

/** The compact stdout summary contract: the LAST line the bench main
  * prints must survive a harness that keeps only a short tail of
  * stdout (the driver keeps ~2000 chars), so it is hard-bounded and
  * still parseable JSON with the headline totals. */
class BenchSpec extends AnyFunSuite {

  private def fakeResults(n: Int): Seq[(String, Double, Boolean)] =
    (0 until n).map(i =>
      (f"q${i}%03d_some_longer_query_name", 0.05 * (i + 1), true))

  test("compact summary stays under the tail budget at full registry scale") {
    // 300 queries ≈ 2× the current registry — the bound must hold as
    // the registry keeps growing, not just at today's size.
    val line = Bench.compactSummary(fakeResults(300), total = 1234.5,
      nPasses = 3, failed = 0, sfJson = "/root/testdata/sf0.1",
      heavyJson = ""","heavy":{"queries":{"x":{"sec":27.612},"y":{"sec":8.389}}}""",
      fullPath = "BENCH_full.json")
    assert(line.length <= 1900, s"compact line ${line.length} chars")
    assert(!line.contains('\n'))
  }

  test("compact summary is balanced JSON carrying totals, slowest-first queries, and the dropped count") {
    val line = Bench.compactSummary(fakeResults(300), total = 42.0,
      nPasses = 3, failed = 2, sfJson = "sf", heavyJson = "",
      fullPath = "BENCH_full.json")
    assert(line.count(_ == '{') == line.count(_ == '}'))
    assert(line.startsWith("""{"metric":"total","value":42.00,"""))
    assert(line.contains(""""n_queries":300"""))
    assert(line.contains(""""failed":2"""))
    assert(line.contains(""""full":"BENCH_full.json""""))
    // Slowest first: q299 (15.0 s) must appear before q298, and the
    // fast tail is the dropped part.
    val i299 = line.indexOf("q299")
    val i298 = line.indexOf("q298")
    assert(i299 >= 0 && i298 > i299)
    val dropped = """"queries_dropped":(\d+)""".r
      .findFirstMatchIn(line).get.group(1).toInt
    val kept = """"q\d{3}_""".r.findAllIn(line).size
    assert(kept + dropped == 300)
    assert(dropped > 0, "300 entries cannot all fit the budget")
  }

  test("compact summary sums the heavy block's seconds and skips failed entries") {
    val line = Bench.compactSummary(fakeResults(3), total = 1.0,
      nPasses = 3, failed = 0, sfJson = "sf",
      heavyJson = ""","heavy":{"queries":{"a":{"sec":10.000,"mb_per_s":3.1},"b":{"sec":-1.000}}}""",
      fullPath = "f.json")
    assert(line.contains(""""heavy_total_sec":10.00"""))
    // All 3 tiny entries fit: nothing dropped.
    assert(line.contains(""""queries_dropped":0"""))
  }
}
