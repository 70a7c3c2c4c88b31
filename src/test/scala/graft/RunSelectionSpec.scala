package graft

import org.scalatest.funsuite.AnyFunSuite

class RunSelectionSpec extends AnyFunSuite {

  test("unset, empty, and all-whitespace SPARK_GRAFT_ONLY select " +
    "everything — never nothing") {
    for (env <- Seq(None, Some(""), Some("   "), Some(" , ,"))) {
      val only = RunSelection.parse(env)
      assert(only.isEmpty, s"$env must parse as unrestricted")
      assert(RunSelection.selects(only, "q01_agg_pricing_summary"))
    }
  }

  test("comma-separated prefixes select by startsWith, with trimming") {
    val only = RunSelection.parse(Some(" q22, zz_ "))
    assert(only === Some(Seq("q22", "zz_")))
    assert(RunSelection.selects(only, "q221_mojibake"))
    assert(RunSelection.selects(only, "zz_probe_duckdb_version"))
    assert(!RunSelection.selects(only, "q01_agg_pricing_summary"))
  }
}
