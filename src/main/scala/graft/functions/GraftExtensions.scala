package graft.functions

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
import org.apache.spark.sql.graft.Bridge

/** Session-extension registrar for the native graft expressions —
  * `SparkSession.builder().withExtensions(new GraftExtensions)` (or
  * `spark.sql.extensions=graft.functions.GraftExtensions`) makes them
  * SQL-callable:
  *
  * {{{
  *   SELECT cosine_similarity(a.embedding, b.embedding)
  *   SELECT simhash64(split(text, '\\s+'))
  * }}}
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((Bridge.functionId("minhash_sig"),
      Bridge.functionInfo("minhash_sig",
        "minhash_sig(shingle_hashes, n) - n-element MinHash signature of a bigint array"),
      (exprs: Seq[Expression]) =>
        MinhashSig(exprs(0), GraftExtensions.intLiteral(exprs(1), "minhash_sig", "n"))))
    e.injectFunction((Bridge.functionId("srp_buckets"),
      Bridge.functionInfo("srp_buckets",
        "srp_buckets(vec, bits, tables) - per-table sign-random-projection LSH buckets"),
      (exprs: Seq[Expression]) => SrpBuckets(exprs(0),
        GraftExtensions.intLiteral(exprs(1), "srp_buckets", "bits"),
        GraftExtensions.intLiteral(exprs(2), "srp_buckets", "tables"))))
    e.injectFunction((Bridge.functionId("nearest_centroid"),
      Bridge.functionInfo("nearest_centroid",
        "nearest_centroid(vec, centroids) - argmax-cosine centroid id over an array of (centroid_id, centroid) structs"),
      (exprs: Seq[Expression]) => NearestCentroid(exprs(0), exprs(1))))
    e.injectFunction((Bridge.functionId("cosine_similarity"),
      Bridge.functionInfo("cosine_similarity",
        "cosine_similarity(a, b) - double-precision cosine of two float arrays"),
      (exprs: Seq[Expression]) => CosineSimilarity(exprs(0), exprs(1))))
    e.injectFunction((Bridge.functionId("simhash64"),
      Bridge.functionInfo("simhash64",
        "simhash64(tokens) - 64-bit SimHash of a string array"),
      (exprs: Seq[Expression]) => Simhash64(exprs.head)))
    e.injectFunction((Bridge.functionId("token_set_jaccard"),
      Bridge.functionInfo("token_set_jaccard",
        "token_set_jaccard(a, b) - set-semantics Jaccard of two string arrays"),
      (exprs: Seq[Expression]) => TokenSetJaccard(exprs(0), exprs(1))))
    e.injectFunction((Bridge.functionId("cms_estimate"),
      Bridge.functionInfo("cms_estimate",
        "cms_estimate(sketch, item) - count estimate for a bigint item from a count_min_sketch binary"),
      (exprs: Seq[Expression]) => CmsEstimate(exprs(0), exprs(1))))
    e.injectFunction((Bridge.functionId("bloom_might_contain"),
      Bridge.functionInfo("bloom_might_contain",
        "bloom_might_contain(filter, item) - membership probe for a bigint item against a serialized bloom filter"),
      (exprs: Seq[Expression]) => BloomMightContain(exprs(0), exprs(1))))
    e.injectFunction((Bridge.functionId("unicode_normalize"),
      Bridge.functionInfo("unicode_normalize",
        "unicode_normalize(text, 'NFC'|'NFD'|'NFKC'|'NFKD') - UAX #15 Unicode normalization"),
      (exprs: Seq[Expression]) => UnicodeNormalize(exprs(0),
        GraftExtensions.strLiteral(exprs(1), "unicode_normalize", "form"))))
  }
}

object GraftExtensions {
  /** Scalar params (hash counts, table counts) must be constants — a
    * per-row value would make the output schema row-dependent. */
  private[functions] def intLiteral(e: Expression, fn: String,
                                    arg: String): Int = e match {
    case Literal(v: Int, org.apache.spark.sql.types.IntegerType) => v
    case other => throw new IllegalArgumentException(
      s"$fn: argument '$arg' must be an integer literal, got $other")
  }

  /** The normalization form is part of the plan (it selects the
    * generated code), so it must be a string literal too. */
  private[functions] def strLiteral(e: Expression, fn: String,
                                    arg: String): String = e match {
    case Literal(v: org.apache.spark.unsafe.types.UTF8String,
        org.apache.spark.sql.types.StringType) => v.toString
    case other => throw new IllegalArgumentException(
      s"$fn: argument '$arg' must be a string literal, got $other")
  }

  /** Register the same functions on an already-built session (the
    * driver owns the session in the Verify/Bench contract). */
  def register(spark: SparkSession): Unit = {
    Bridge.registerFunction(spark, "cosine_similarity",
      exprs => CosineSimilarity(exprs(0), exprs(1)))
    Bridge.registerFunction(spark, "simhash64",
      exprs => Simhash64(exprs.head))
    Bridge.registerFunction(spark, "token_set_jaccard",
      exprs => TokenSetJaccard(exprs(0), exprs(1)))
    Bridge.registerFunction(spark, "nearest_centroid",
      exprs => NearestCentroid(exprs(0), exprs(1)))
    Bridge.registerFunction(spark, "minhash_sig",
      exprs => MinhashSig(exprs(0), intLiteral(exprs(1), "minhash_sig", "n")))
    Bridge.registerFunction(spark, "srp_buckets",
      exprs => SrpBuckets(exprs(0),
        intLiteral(exprs(1), "srp_buckets", "bits"),
        intLiteral(exprs(2), "srp_buckets", "tables")))
    Bridge.registerFunction(spark, "cms_estimate",
      exprs => CmsEstimate(exprs(0), exprs(1)))
    Bridge.registerFunction(spark, "bloom_might_contain",
      exprs => BloomMightContain(exprs(0), exprs(1)))
    Bridge.registerFunction(spark, "unicode_normalize",
      exprs => UnicodeNormalize(exprs(0),
        strLiteral(exprs(1), "unicode_normalize", "form")))
  }
}
