package graft

import org.scalatest.funsuite.AnyFunSuite

/** The driver reads ONE stdout line from a 2000-char tail (shared
  * with sbt's ~106-char success trailer); round 4's bench outage was
  * exactly this line overflowing the window. Pins: the budget holds
  * for the CURRENT inventory, keeps holding at 3× inventory growth
  * (the degradation ladder engages), and a mass failure cannot
  * overflow the printed failure list. Structural-JSON checks guard
  * the driver's json.loads. */
class BenchLineSpec extends AnyFunSuite {

  private val names: Seq[String] =
    QueryInventory.all.map(_.name) ++ EngineOps.queries.keys.toSeq.sorted
  private val headline = QueryInventory.all.map(_.name).toSet

  private def balanced(s: String): Boolean = {
    var depth = 0; var inStr = false; var prev = ' '
    s.foreach { c =>
      if (inStr) { if (c == '"' && prev != '\\') inStr = false }
      else c match {
        case '"' => inStr = true
        case '{' | '[' => depth += 1
        case '}' | ']' => depth -= 1
        case _ =>
      }
      prev = c
    }
    depth == 0 && !inStr
  }

  test("printed line fits the tail budget for the current inventory") {
    val results = names.zipWithIndex.map { case (n, i) => n -> (0.1 + (i % 17) * 0.37) }
    val sentinel = Seq(0.08, 0.11, 0.09, 0.31)
    val line = Bench.printedLine(results, headline, "/root/testdata/sf0.1", sentinel)
    assert(line.length <= 1800, s"printed line is ${line.length} chars")
    assert(line.startsWith("{\"metric\":\"headline_total\""))
    assert(balanced(line))
    // the contention sentinel rides the printed line
    assert(line.contains("\"sentinel\":{\"min\":0.080,\"max\":0.310"))
    assert(line.contains("\"n\":4}"))
  }

  test("sentinel fragment: empty samples render null, spread is max/min") {
    assert(BenchUtil.sentinelJson(Nil) == "\"sentinel\":null")
    val frag = BenchUtil.sentinelJson(Seq(0.1, 0.4))
    assert(frag.contains("\"spread\":4.000"), frag)
  }

  test("a failed resample refines to the established value, never to failed") {
    assert(BenchUtil.refine(0.3, Some(-1.0)) == 0.3)
    assert(BenchUtil.refine(0.3, Some(0.2)) == 0.2)
    assert(BenchUtil.refine(0.3, Some(0.5)) == 0.3)
    assert(BenchUtil.refine(0.3, None) == 0.3)
    assert(BenchUtil.refine(-1.0, Some(0.2)) == -1.0) // p1/p2 failure stands
  }

  test("one-sided pass failure is salvageable under the replicate rule") {
    assert(BenchUtil.oneFailed(-1.0, 0.3) && BenchUtil.oneFailed(0.3, -1.0))
    assert(!BenchUtil.oneFailed(0.3, 0.4) && !BenchUtil.oneFailed(-1.0, -1.0))
    assert(BenchUtil.minOk(0.3, 0.4) == 0.3)
    assert(BenchUtil.minOk(-1.0, 0.3) == 0.3) // provisional — combine() arbitrates
    assert(BenchUtil.minOk(-1.0, -1.0) == -1.0)
    // salvaged pair + resample that replicates success → min of valid
    assert(BenchUtil.combine(-1.0, 0.3, Some(0.2)) == 0.2)
    assert(BenchUtil.combine(0.3, -1.0, Some(0.5)) == 0.3)
    // salvaged pair + failed resample → 2 of 3 samples failed → failed
    assert(BenchUtil.combine(-1.0, 0.3, Some(-1.0)) == -1.0)
    // an established pair is never flipped to failed by a flaky extra
    assert(BenchUtil.combine(0.3, 0.4, Some(-1.0)) == 0.3)
    // a both-failed pair stays failed (no resample is even requested)
    assert(BenchUtil.combine(-1.0, -1.0, None) == -1.0)
  }

  test("dirty flag: spread >= 2x or collapsed floor, printed at top level") {
    assert(!BenchUtil.isDirty(Nil))
    assert(!BenchUtil.isDirty(Seq(0.1, 0.15)))
    assert(BenchUtil.isDirty(Seq(0.1, 0.25)))
    assert(BenchUtil.isDirty(Seq(0.0, 0.1))) // floor collapsed: never clean
    val results = names.zipWithIndex.map { case (n, i) => n -> (0.1 + (i % 17) * 0.37) }
    val clean = Bench.printedLine(results, headline, "sf", Seq(0.1, 0.15))
    val contended = Bench.printedLine(results, headline, "sf", Seq(0.1, 0.5))
    assert(clean.contains("\"dirty\":false,\"sentinel\":"), clean)
    assert(contended.contains("\"dirty\":true,\"sentinel\":"), contended)
  }

  // production lines ALWAYS carry a sentinel fragment (pass 1 records
  // at least one probe) — the budget tests must include it or they
  // certify lines ~80 chars shorter than the real ones
  private val sentinel = Seq(0.081, 0.112, 0.095, 0.310)

  test("budget holds at 3x inventory growth (degradation ladder engages)") {
    val extras = (1 to names.size * 2).map(i => s"qz${i}_future_entry")
    val grown = names ++ extras
    val results = grown.zipWithIndex.map { case (n, i) => n -> (0.1 + (i % 13) * 0.53) }
    val line = Bench.printedLine(results, headline ++ extras, "/root/testdata/sf0.1", sentinel)
    assert(line.length <= 1800, s"printed line is ${line.length} chars")
    assert(balanced(line))
  }

  test("mass failure cannot overflow the printed failure list") {
    val results = names.map(n => n -> -1.0)
    val line = Bench.printedLine(results, headline, "/root/testdata/sf0.1", sentinel)
    assert(line.length <= 1800, s"printed line is ${line.length} chars")
    assert(line.contains("more\""))
    assert(balanced(line))
  }
}
