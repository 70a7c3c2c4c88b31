package graft

import graft.expressions.{CosineSim, JaccardSim, NfcNormalize, TextStats}
import graft.functions.RefFunctions
import graft.text.TextOps
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SQL-surface registration: installs graft's custom expressions and
  * parity functions into the session's function registry so plain
  * `spark.sql(...)` (and any SQL-authoring user of the engine) can
  * call them:
  *
  *   SparkSession.builder().withExtensions(new GraftExtensions)...
  *
  * Functions:
  *  - cosine_sim(a, b)       — codegen'd fused cosine (CosineSim)
  *  - jaccard_sim(a, b)      — single-pass set Jaccard (JaccardSim)
  *  - graft_text_stats(s)    — fused text statistics struct (English
  *                             stopword set)
  *  - normalize_text(s)      — dedup-key normalization (lowercase,
  *                             punctuation stripped, whitespace
  *                             collapsed), same tree as the column API
  *  - hash_bucket(k)         — uniform [0, 2^32) md5 bucket, the
  *                             deterministic-sampling primitive
  *  - standardize_parcel(s)  — county parcel normalizer
  *  - reformat_phone(s)      — NANP phone formatter
  *  - redact_pii(s)          — regex PII redaction w/ place protection
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  import GraftExtensions.{expectArgs, hashBucketBuilder, normalizeTextBuilder}

  private def info(name: String, usage: String) =
    new ExpressionInfo("graft", null, name, usage, "", "", "", "", "", "", "scala_udf")

  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((FunctionIdentifier("cosine_sim"),
      info("cosine_sim", "cosine_sim(a, b) - cosine similarity of two numeric arrays"),
      expectArgs("cosine_sim", 2)(args => CosineSim(args(0), args(1)))))
    e.injectFunction((FunctionIdentifier("jaccard_sim"),
      info("jaccard_sim", "jaccard_sim(a, b) - Jaccard similarity of two string arrays"),
      expectArgs("jaccard_sim", 2)(args => JaccardSim(args(0), args(1)))))
    e.injectFunction((FunctionIdentifier("graft_text_stats"),
      info("graft_text_stats", "graft_text_stats(s) - single-pass text statistics"),
      expectArgs("graft_text_stats", 1)(args =>
        TextStats(args.head, Seq(TextOps.EnStopwords)))))
    e.injectFunction((FunctionIdentifier("normalize_text"),
      info("normalize_text", "normalize_text(s) - lowercase, strip punctuation, collapse whitespace"),
      normalizeTextBuilder))
    e.injectFunction((FunctionIdentifier("nfc_normalize"),
      info("nfc_normalize", "nfc_normalize(s) - canonical Unicode NFC normalization"),
      expectArgs("nfc_normalize", 1)(args => NfcNormalize(args.head))))
    e.injectFunction((FunctionIdentifier("hash_bucket"),
      info("hash_bucket", "hash_bucket(k) - uniform [0, 2^32) md5 bucket of the key"),
      hashBucketBuilder))
    e.injectPlannerStrategy(_ => graft.plans.AsOfStrategy)
  }
}

object GraftExtensions {
  import org.apache.spark.sql.catalyst.expressions.{Cast, Conv, Literal, Lower, Md5, RegExpReplace, StringTrim, Substring}
  import org.apache.spark.sql.types.{BinaryType, LongType, StringType}

  /** Arity guard for function builders: a wrong-arity SQL call gets a
    * proper AnalysisException (Spark's own WRONG_NUM_ARGS error class)
    * instead of the builder's NoSuchElementException / silent
    * truncation to the first argument (ADVICE r7).
    */
  private[graft] def expectArgs(name: String, n: Int)(
      build: Seq[Expression] => Expression): Seq[Expression] => Expression =
    args =>
      if (args.size == n) build(args)
      else throw new org.apache.spark.sql.AnalysisException(
        errorClass = "WRONG_NUM_ARGS.WITHOUT_SUGGESTION",
        messageParameters = Map(
          "functionName" -> s"`$name`",
          "expectedNum" -> n.toString,
          "actualNum" -> args.size.toString,
          "docroot" -> "https://spark.apache.org/docs/latest"))

  /** Catalyst twins of `TextOps.normalizeText` / `SplitOps.hashBucket`
    * (the column-API trees arrive at the function registry as
    * unresolved column nodes, which the SQL path cannot evaluate, so
    * the trees are built from expression classes directly).
    * GraftExtensionsSpec asserts SQL and DataFrame results agree.
    */
  private[graft] val normalizeTextBuilder: Seq[Expression] => Expression =
    expectArgs("normalize_text", 1)(args =>
      StringTrim(RegExpReplace(
        RegExpReplace(Lower(args.head), Literal("[^\\p{L}\\p{N}\\s]"), Literal("")),
        Literal("\\s+"), Literal(" "))))
  private[graft] val hashBucketBuilder: Seq[Expression] => Expression =
    expectArgs("hash_bucket", 1)(args =>
      Cast(Conv(Substring(Md5(Cast(Cast(args.head, StringType), BinaryType)),
        Literal(1), Literal(8)), Literal(16), Literal(10)), LongType))

  /** Install on a LIVE session (builder extensions only apply to new
    * sessions): registers the expression functions through the
    * session's function registry plus the Scala UDFs. Idempotent.
    */
  def install(spark: org.apache.spark.sql.SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("cosine_sim",
      expectArgs("cosine_sim", 2)(args => CosineSim(args(0), args(1))), "scala_udf")
    reg.createOrReplaceTempFunction("jaccard_sim",
      expectArgs("jaccard_sim", 2)(args => JaccardSim(args(0), args(1))), "scala_udf")
    reg.createOrReplaceTempFunction("graft_text_stats",
      expectArgs("graft_text_stats", 1)(args =>
        TextStats(args.head, Seq(TextOps.EnStopwords))), "scala_udf")
    reg.createOrReplaceTempFunction("normalize_text", normalizeTextBuilder, "scala_udf")
    reg.createOrReplaceTempFunction("nfc_normalize",
      expectArgs("nfc_normalize", 1)(args => NfcNormalize(args.head)), "scala_udf")
    reg.createOrReplaceTempFunction("hash_bucket", hashBucketBuilder, "scala_udf")
    registerUdfs(spark)
  }

  /** Scala-UDF registrations that need a live session (procedural
    * parity functions). Idempotent.
    */
  def registerUdfs(spark: org.apache.spark.sql.SparkSession): Unit = {
    spark.udf.register("standardize_parcel", RefFunctions.standardizeParcelNum _)
    spark.udf.register("reformat_phone", RefFunctions.reformatPhone _)
    spark.udf.register("redact_pii",
      (s: String) => RefFunctions.redactPii(s, retainLocation = true))
    spark.udf.register("rolling_hash", TextOps.rollingHash _)
    spark.udf.register("compression_ratio", (s: String) =>
      if (s == null || s.isEmpty) null
      else {
        val raw = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
        val d = new java.util.zip.Deflater(java.util.zip.Deflater.BEST_SPEED)
        d.setInput(raw); d.finish()
        val buf = new Array[Byte](64)
        var total = 0L
        while (!d.finished()) total += d.deflate(buf)
        d.end()
        java.lang.Double.valueOf(total.toDouble / raw.length)
      })
    spark.udf.register("wkt_point", (lng: java.lang.Double, lat: java.lang.Double) =>
      if (lng == null || lat == null) null
      else f"POINT(${lng.doubleValue()}%.6f ${lat.doubleValue()}%.6f)")
  }
}
