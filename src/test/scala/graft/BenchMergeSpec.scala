package graft

import org.scalatest.funsuite.AnyFunSuite

/** The cross-sweep minimum merge behind BENCH's `queries_min` /
  * `value_min` fields (VERDICT r14 task #1): per-query min over the
  * round's same-surface, same-sf full sweeps in bench_full.jsonl.
  */
class BenchMergeSpec extends AnyFunSuite {

  private val now = java.time.Instant.parse("2026-08-16T12:00:00Z")
  private val sf  = "/root/testdata/sf0.1"

  private def withHistory(lines: Seq[String])(
      f: java.nio.file.Path => Unit): Unit = {
    val p = java.nio.file.Files.createTempFile("benchmerge", ".jsonl")
    try {
      java.nio.file.Files.writeString(p, lines.mkString("", "\n", "\n"))
      f(p)
    } finally java.nio.file.Files.deleteIfExists(p)
  }

  private def entry(at: String, sfDir: String,
                    qs: Map[String, Double]): String = {
    val qj = qs.map { case (k, v) => s""""$k":$v""" }
      .mkString("{", ",", "}")
    s"""{"at":"$at","metric":"total","value":1.0,"queries":$qj,"sf":"$sfDir"}"""
  }

  test("same-surface same-sf sweeps inside 24h merge to per-query minima") {
    val cur = Map("q1" -> 5.0, "q2" -> 1.0)
    withHistory(Seq(
      entry("2026-08-16T09:00:00Z", sf, Map("q1" -> 3.0, "q2" -> 2.0)),
      entry("2026-08-16T11:00:00Z", sf, Map("q1" -> 4.0, "q2" -> 0.5)))) { p =>
      val (mins, n) = Bench.mergedMins(p, sf, cur, now)
      assert(n === 3)
      assert(mins === Map("q1" -> 3.0, "q2" -> 0.5))
    }
  }

  test("stale, different-sf, different-surface, and bad lines are ignored") {
    val cur = Map("q1" -> 5.0, "q2" -> 1.0)
    withHistory(Seq(
      // > 24h old: a previous round's container, not this round's
      entry("2026-08-14T09:00:00Z", sf, Map("q1" -> 0.1, "q2" -> 0.1)),
      // different sf: a sf0.001 probe sweep
      entry("2026-08-16T09:00:00Z", "/root/testdata/sf0.001",
        Map("q1" -> 0.01, "q2" -> 0.01)),
      // different query-name set: code changed mid-round
      entry("2026-08-16T10:00:00Z", sf, Map("q1" -> 0.2)),
      entry("2026-08-16T10:30:00Z", sf,
        Map("q1" -> 0.2, "q2" -> 0.2, "q3" -> 0.2)),
      // unparseable garbage must never kill the bench
      "not json at all",
      entry("2026-08-16T11:00:00Z", sf, Map("q1" -> 4.0, "q2" -> 2.0)))) { p =>
      val (mins, n) = Bench.mergedMins(p, sf, cur, now)
      assert(n === 2) // only the last entry qualifies
      assert(mins === Map("q1" -> 4.0, "q2" -> 1.0))
    }
  }

  test("missing history file returns the current sweep unchanged") {
    val cur = Map("q1" -> 5.0)
    val ghost = java.nio.file.Paths.get("/tmp/graft_no_such_history.jsonl")
    val (mins, n) = Bench.mergedMins(ghost, sf, cur, now)
    assert(n === 1)
    assert(mins === cur)
  }

  test("mergedStats: the median companion is the LOWER median over " +
    "the same filtered sweeps and reuses the min's filters " +
    "(VERDICT r15 #7)") {
    val cur = Map("q1" -> 5.0, "q2" -> 1.0)
    withHistory(Seq(
      entry("2026-08-16T09:00:00Z", sf, Map("q1" -> 3.0, "q2" -> 2.0)),
      // filtered out: different surface — must not enter the median
      entry("2026-08-16T09:30:00Z", sf, Map("q1" -> 99.0)),
      entry("2026-08-16T11:00:00Z", sf, Map("q1" -> 4.0, "q2" -> 0.5)))) { p =>
      val (mins, meds, n) = Bench.mergedStats(p, sf, cur, now)
      assert(n === 3)
      assert(mins === Map("q1" -> 3.0, "q2" -> 0.5))
      // q1 over {3,4,5} -> 4; q2 over {0.5,1,2} -> 1 (true middles);
      // masking scenario: a single lucky min (q2 0.5) does not drag
      // the median below the steady state
      assert(meds === Map("q1" -> 4.0, "q2" -> 1.0))
    }
    // even sweep count: LOWER median (order statistic, no averaging)
    withHistory(Seq(
      entry("2026-08-16T11:00:00Z", sf, Map("q1" -> 4.0, "q2" -> 0.5)))) { p =>
      val (_, meds, n) = Bench.mergedStats(p, sf, cur, now)
      assert(n === 2)
      assert(meds === Map("q1" -> 4.0, "q2" -> 0.5))
    }
  }
}
