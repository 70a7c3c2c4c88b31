package graft

import graft.text.UrlOps
import org.apache.spark.sql.functions._

class UrlOpsSpec extends SparkSpec {
  import spark.implicits._

  private def canon(urls: Seq[String]): Seq[Option[String]] =
    urls.toDF("url")
      .select(UrlOps.canonicalizeUrl(col("url")).as("c"))
      .collect().map(r => Option(r.getString(0))).toSeq

  test("canonicalizeUrl applies each rule: case, www, default ports, " +
    "fragment, tracking params, param sort, trailing slash") {
    val cases = Seq(
      // scheme+host lowercase, path case KEPT
      "HTTPS://EXAMPLE.COM/Keep/Case" -> Some("https://example.com/Keep/Case"),
      // non-default port kept; :80 is only default for http
      "http://example.com:8080/x" -> Some("http://example.com:8080/x"),
      "https://example.com:80/x" -> Some("https://example.com:80/x"),
      "https://example.com:443/x" -> Some("https://example.com/x"),
      "http://www.example.com" -> Some("http://example.com"),
      // trailing slashes collapse, root slash drops
      "http://example.com/a/b///" -> Some("http://example.com/a/b"),
      "http://example.com/" -> Some("http://example.com"),
      // tracking strip incl. bare 'ref'; survivors byte-sorted
      "http://example.com/?z=1&y=2&utm_x=3&ref" ->
        Some("http://example.com?y=2&z=1"),
      // 'refresh' is NOT 'ref' — the tracking match is whole-key
      "http://example.com/p?refresh=1" -> Some("http://example.com/p?refresh=1"),
      "http://example.com/p?ref=abc" -> Some("http://example.com/p"),
      // fragment drops even when it contains a '?'
      "http://example.com/p#frag?not=query" -> Some("http://example.com/p"),
      // unknown scheme: no default-port rule, rest applies
      "ftp://Example.com/F" -> Some("ftp://example.com/F"),
      // unparseable -> NULL
      "relative/path" -> None,
      "" -> None)
    assert(canon(cases.map(_._1)) === cases.map(_._2))
    // NULL input -> NULL
    assert(canon(Seq(null.asInstanceOf[String])) === Seq(None))
  }

  test("canonical form is a fixed point: canonicalizing twice == once") {
    val urls = Seq(
      "HTTP://WWW.Example.com:80/Path/?utm_source=x&b=2&a=1#frag",
      "https://Example.com:443/",
      "http://example.com/?z=1&y=2&ref",
      "ftp://X.y/Z/")
    val once = canon(urls).flatten
    assert(once.nonEmpty)
    assert(canon(once) === once.map(Some(_)))
  }

  test("hostOf and domainSuffixes: userinfo stripped before the host, " +
    "port and case normalized, suffixes most-specific-first") {
    val hosts = Seq(
      "http://trusted.com@evil.com/x",
      "https://A.B.Example.COM:8443/p",
      "no scheme here")
      .toDF("url").select(UrlOps.hostOf(col("url")).as("h"))
      .collect().map(r => Option(r.getString(0))).toSeq
    assert(hosts === Seq(Some("evil.com"), Some("a.b.example.com"), None))
    val sufs = Seq("https://a.b.example.com/x").toDF("url")
      .select(UrlOps.domainSuffixes(col("url")).as("s"))
      .head().getSeq[String](0)
    assert(sufs === Seq("a.b.example.com", "b.example.com", "example.com", "com"))
  }

  test("filterBlockedDomains: exact + subdomain + spoof + case/port " +
    "blocked; lookalikes and hostless rows kept") {
    val docs = Seq(
      (1L, "https://good.com/page"),
      (2L, "https://evil.com/x"),
      (3L, "http://a.b.evil.com/y"),
      (4L, "https://notevil.com/z"),
      (5L, "http://trusted.com@evil.com/spoof"),
      (6L, "https://EVIL.com:8443/up"),
      (7L, "plain text")).toDF("doc_id", "url")
    val kept = UrlOps.filterBlockedDomains(docs, "doc_id", "url",
        Seq("evil.com").toDF("domain"), "domain")
      .select("doc_id").as[Long].collect().toSet
    assert(kept === Set(1L, 4L, 7L))
  }

  test("dedupByUrl: variants collapse to min id with counts; " +
    "unparseable urls share the NULL bucket") {
    val docs = Seq(
      (5L, "http://a.com/x?b=1&a=1"),
      (2L, "HTTP://WWW.A.com:80/x/?a=1&b=1&utm_k=v"),
      (9L, "junk"),
      (3L, "also junk")).toDF("doc_id", "url")
    val got = UrlOps.dedupByUrl(docs, "doc_id", "url")
      .collect().map(r => (Option(r.getString(0)), r.getLong(1), r.getLong(2))).toSet
    assert(got === Set(
      (Some("http://a.com/x?a=1&b=1"), 2L, 2L),
      (None, 3L, 2L)))
  }
}
