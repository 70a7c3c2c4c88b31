package graft.text

import graft.expressions.ExprOps.bind
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL canonicalization for crawl-style corpus dedup: web pipelines
  * (Common Crawl processing, C4, RefinedWeb) dedupe and join on a
  * NORMALIZED url, because the same page arrives as casing variants,
  * with or without `www.`, with default ports, fragments, tracking
  * parameters, and reordered query strings. The rule set here is the
  * standard safe subset (RFC 3986 §6 syntax-based normalization plus
  * the conventional tracking-param strip):
  *
  *  - scheme and host lowercase (path/query stay case-sensitive)
  *  - fragment dropped
  *  - default port dropped (`:80` for http, `:443` for https)
  *  - leading `www.` dropped
  *  - tracking params dropped (`utm_*`, `fbclid`, `gclid`, `ref`)
  *  - remaining query params sorted (byte order), empties dropped
  *  - trailing slashes on the path dropped (root `/` → empty)
  *
  * Inputs without a `scheme://` prefix canonicalize to NULL — the
  * caller's unparseable bucket. Percent-encoding and userinfo are
  * passed through untouched (both are rare in crawl frontiers and
  * case-normalizing them is not semantics-preserving in general).
  *
  * Pure codegen'd expressions over let-bound intermediates — a row
  * map with no UDF, no shuffle, linear at any scale; canonical form
  * is a fixed point (spec-asserted), so re-running a pipeline over
  * already-canonical urls is a no-op.
  */
object UrlOps {

  private val schemeRe = "^([A-Za-z][A-Za-z0-9+.-]*)://"
  private val trackingRe = "^(utm_[^=&]*|fbclid|gclid|ref)(=.*)?$"

  def canonicalizeUrl(url: Column): Column =
    bind(trim(url)) { u =>
      bind(lower(regexp_extract(u, schemeRe, 1))) { scheme =>
        bind(regexp_replace(regexp_replace(u, schemeRe, ""), "#.*$", "")) { noFrag =>
          bind(lower(regexp_extract(noFrag, "^([^/?]*)", 1))) { hostport =>
            val defPort = when(scheme === "http", regexp_replace(hostport, ":80$", ""))
              .when(scheme === "https", regexp_replace(hostport, ":443$", ""))
              .otherwise(hostport)
            bind(regexp_replace(defPort, "^www\\.", "")) { host =>
              bind(regexp_replace(noFrag, "^[^/?]*", "")) { pathQuery =>
                val path = regexp_replace(
                  regexp_extract(pathQuery, "^([^?]*)", 1), "/+$", "")
                val query = regexp_extract(pathQuery, "\\?(.*)$", 1)
                val params = filter(split(query, "&"),
                  p => p =!= "" && !p.rlike(trackingRe))
                bind(array_join(array_sort(params), "&")) { qs =>
                  when(scheme === "" || url.isNull, lit(null).cast("string"))
                    .otherwise(concat(scheme, lit("://"), host, path,
                      when(qs === "", lit("")).otherwise(concat(lit("?"), qs))))
                }
              }
            }
          }
        }
      }
    }

  /** Lowercase host of a url (no port, no userinfo): the blocklist
    * matching key. Userinfo is stripped BEFORE the host — the classic
    * `http://trusted.com@evil.com/` spoof puts the real host after
    * the `@`. No-scheme inputs → NULL.
    */
  def hostOf(url: Column): Column =
    bind(trim(url)) { u =>
      when(regexp_extract(u, schemeRe, 1) === "", lit(null).cast("string"))
        .otherwise(regexp_replace(regexp_replace(
          lower(regexp_extract(regexp_replace(u, schemeRe, ""), "^([^/?#]*)", 1)),
          "^[^@]*@", ""), ":[0-9]*$", ""))
    }

  /** Every domain suffix of the url's host, most-specific first:
    * `a.b.example.com` → [a.b.example.com, b.example.com,
    * example.com, com]. Blocklist membership of ANY suffix blocks the
    * url (registrable-domain entries block all subdomains). NULL host
    * → empty array.
    */
  def domainSuffixes(url: Column): Column =
    bind(hostOf(url)) { h =>
      when(h.isNull, array().cast("array<string>"))
        .otherwise(bind(split(h, "\\.")) { parts =>
          transform(sequence(lit(0), size(parts) - 1),
            i => array_join(slice(parts, i + 1, size(parts)), "."))
        })
    }

  /** Domain blocklist filtering — the first gate of every crawl
    * pipeline (spam/adult/malware domain lists): drop rows whose host
    * IS a blocked domain or a subdomain of one. Rows whose url has no
    * parseable host are KEPT (route them via [[canonicalizeUrl]]'s
    * NULL bucket if they need review).
    *
    * 100 TB shape: each url explodes to its #labels domain suffixes
    * (≤ ~6 rows, map-side) and semi-joins the blocklist on the suffix
    * string; blocklists are thousands-to-millions of rows, so the
    * join side carries no broadcast hint — AQE broadcasts the normal
    * case and shuffle-joins a giant list; the matched-id set then
    * anti-joins back. No per-row scan of the list (the literal-OR
    * chain a small list invites is O(|list|) per row and unusable at
    * a million entries).
    */
  def filterBlockedDomains(df: org.apache.spark.sql.DataFrame, idCol: String,
                           urlCol: String,
                           blocklist: org.apache.spark.sql.DataFrame,
                           domainCol: String): org.apache.spark.sql.DataFrame = {
    val hit = df.select(col(idCol), explode(domainSuffixes(col(urlCol))).as("__suf"))
      .join(blocklist.select(lower(trim(col(domainCol))).as("__suf")).distinct(),
        Seq("__suf"), "left_semi")
      .select(idCol).distinct()
    df.join(hit, Seq(idCol), "left_anti")
  }

  /** Canonical-url exact dedup: one row per canonical url with the
    * minimum id (the keeper) and the occurrence count. Unparseable
    * urls (NULL canonical) group together for the caller to route.
    * Scale shape: a row map plus one count aggregate keyed on the
    * canonical string — identical to exact text dedup.
    */
  def dedupByUrl(df: org.apache.spark.sql.DataFrame, idCol: String,
                 urlCol: String): org.apache.spark.sql.DataFrame =
    df.withColumn("url_canon", canonicalizeUrl(col(urlCol)))
      .groupBy("url_canon")
      .agg(min(col(idCol)).as(idCol), count(lit(1)).as("dup_count"))
}
