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
