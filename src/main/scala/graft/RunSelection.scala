package graft

/** Shared SPARK_GRAFT_ONLY subset-selection semantics for the two
  * driver mains (Verify, Bench): a comma-separated list of name
  * PREFIXES. Whitespace around entries is ignored; an unset, empty,
  * or all-whitespace value means "no restriction" — never "select
  * nothing" (an empty selection would silently dump/bench zero
  * queries and read as a green-but-vacuous run).
  */
object RunSelection {
  def parse(env: Option[String]): Option[Seq[String]] =
    env.map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
      .filter(_.nonEmpty)

  def selects(only: Option[Seq[String]], name: String): Boolean =
    only.forall(_.exists(name.startsWith))
}
