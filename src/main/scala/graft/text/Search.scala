package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Positional inverted index + exact phrase search — the
  * corpus-exploration surface a curation team runs against a crawl
  * ("which documents contain this exact phrase, how often") and the
  * exact-match complement of the decontamination stack: gram-hash
  * decontamination (q73/q91) asks "does ANY benchmark window occur",
  * this asks "WHERE does this specific phrase occur".
  *
  * The index is the classic (term, doc, pos) posting frame. A phrase
  * of n terms matches at anchor position p iff term_i sits at p + i
  * for every i, so the query plan is: filter the postings to each
  * phrase term (predicate pushdown makes this scan term-selective),
  * shift each term's positions by −i to its anchor, and equi-join
  * the n frames on (doc, anchor). Overlapping occurrences count
  * individually ("batch batch batch" contains "batch batch" twice) —
  * the positions contract, which regex scans get wrong
  * (non-overlapping semantics) and the oracle reproduces with an
  * explicit position walk.
  *
  * Scale shape: the posting build is one explode (map-only); each
  * phrase-term filter is a selective scan; the joins key on
  * (doc, anchor) — co-partitioned across stages, sized by the
  * RAREST term's posting list after the first join. At 100 TB the
  * posting frame is written bucketed by term so a phrase query reads
  * only its terms' buckets.
  */
object Search {

  /** (term, doc, pos) postings over whitespace tokens — pos is
    * 0-based. One map-only explode; NULL/empty text yields no rows.
    */
  def positionalPostings(docs: DataFrame, idCol: String,
                         textCol: String): DataFrame =
    docs
      .select(col(idCol), posexplode(TextOps.tokens(col(textCol)))
        .as(Seq("pos", "term")))
      .select(col("term"), col(idCol), col("pos"))

  /** Per-document occurrence count of an exact token phrase:
    * (idCol, n_matches), docs with ≥ 1 match only. Overlapping
    * occurrences each count.
    */
  def phraseCount(docs: DataFrame, idCol: String, textCol: String,
                  phrase: Seq[String]): DataFrame = {
    require(phrase.nonEmpty, "empty phrase")
    require(phrase.forall(t => t != null && t.nonEmpty), "blank phrase term")
    val postings = positionalPostings(docs, idCol, textCol)
    val anchors = phrase.zipWithIndex.map { case (t, i) =>
      postings.filter(col("term") === t)
        .select(col(idCol), (col("pos") - i).as("anchor"))
    }
    anchors
      .reduce((a, b) => a.join(b, Seq(idCol, "anchor")))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_matches"))
  }
}
