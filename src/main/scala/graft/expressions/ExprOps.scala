package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

object ExprOps {

  /** Let-binding for column expressions.
    *
    * Catalyst's CollapseProject freely inlines a projected expression
    * into every downstream reference, and a reference inside a
    * higher-order-function lambda is re-evaluated once per element —
    * so an expensive array expression used under `transform(sequence(
    * 0, 63), ...)` gets recomputed 64× per row (measured: the MinHash
    * signature stage went from 207 s to 3 s at sf0.1 with this fix).
    *
    * `bind(e)(f)` evaluates `e` exactly once by wrapping it as the
    * single element of an array and passing it to `f` as a lambda
    * variable: `transform(array(e), v => f(v))[0]`. Lambda variables
    * are plain slot reads — safe to reference any number of times.
    */
  def bind(value: Column)(f: Column => Column): Column =
    transform(array(value), v => f(v)).getItem(0)
}
