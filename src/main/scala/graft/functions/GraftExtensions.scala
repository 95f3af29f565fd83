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
  def apply(e: SparkSessionExtensions): Unit =
    GraftExtensions.builders.foreach { case (name, usage, build) =>
      e.injectFunction((Bridge.functionId(name),
        Bridge.functionInfo(name, usage), build))
    }
}

object GraftExtensions {
  /** Arity gate for the registered builders: a short SQL call like
    * `unicode_normalize('x')` must fail as an analysis-time
    * IllegalArgumentException naming the function and its expected
    * signature, not as an IndexOutOfBoundsException from `exprs(1)`. */
  private[functions] def arity(exprs: Seq[Expression], n: Int,
                               fn: String): Seq[Expression] = {
    if (exprs.length != n) throw new IllegalArgumentException(
      s"$fn expects $n argument(s), got ${exprs.length} — see the " +
        "function's usage string")
    exprs
  }

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

  /** One (name, usage, arity-checked builder) row per SQL-exposed
    * native expression — the single table both the extension path
    * ([[GraftExtensions.apply]]) and the already-built-session path
    * ([[register]]) install, so the two registrations cannot drift. */
  private[functions] val builders
      : Seq[(String, String, Seq[Expression] => Expression)] = Seq(
    ("minhash_sig",
      "minhash_sig(shingle_hashes, n) - n-element MinHash signature of a bigint array",
      exprs => { arity(exprs, 2, "minhash_sig")
        MinhashSig(exprs(0), intLiteral(exprs(1), "minhash_sig", "n")) }),
    ("srp_buckets",
      "srp_buckets(vec, bits, tables) - per-table sign-random-projection LSH buckets",
      exprs => { arity(exprs, 3, "srp_buckets")
        SrpBuckets(exprs(0),
          intLiteral(exprs(1), "srp_buckets", "bits"),
          intLiteral(exprs(2), "srp_buckets", "tables")) }),
    ("nearest_centroid",
      "nearest_centroid(vec, centroids) - argmax-cosine centroid id over an array of (centroid_id, centroid) structs",
      exprs => { arity(exprs, 2, "nearest_centroid")
        NearestCentroid(exprs(0), exprs(1)) }),
    ("cosine_similarity",
      "cosine_similarity(a, b) - double-precision cosine of two float arrays",
      exprs => { arity(exprs, 2, "cosine_similarity")
        CosineSimilarity(exprs(0), exprs(1)) }),
    ("simhash64",
      "simhash64(tokens) - 64-bit SimHash of a string array",
      exprs => { arity(exprs, 1, "simhash64")
        Simhash64(exprs.head) }),
    ("token_set_jaccard",
      "token_set_jaccard(a, b) - set-semantics Jaccard of two string arrays",
      exprs => { arity(exprs, 2, "token_set_jaccard")
        TokenSetJaccard(exprs(0), exprs(1)) }),
    ("cms_estimate",
      "cms_estimate(sketch, item) - count estimate for a bigint item from a count_min_sketch binary",
      exprs => { arity(exprs, 2, "cms_estimate")
        CmsEstimate(exprs(0), exprs(1)) }),
    ("bloom_might_contain",
      "bloom_might_contain(filter, item) - membership probe for a bigint item against a serialized bloom filter",
      exprs => { arity(exprs, 2, "bloom_might_contain")
        BloomMightContain(exprs(0), exprs(1)) }),
    ("unicode_normalize",
      "unicode_normalize(text, 'NFC'|'NFD'|'NFKC'|'NFKD') - UAX #15 Unicode normalization",
      exprs => { arity(exprs, 2, "unicode_normalize")
        UnicodeNormalize(exprs(0),
          strLiteral(exprs(1), "unicode_normalize", "form")) }),
    ("dsum_exact",
      "dsum_exact(x) - exact decimal(25,6) sum of a double, as double;" +
        " value-identical to CAST(sum(CAST(x AS DECIMAL(25,6))) AS" +
        " DOUBLE) at integer-accumulator speed (DecimalDoubleSum)",
      exprs => { arity(exprs, 1, "dsum_exact")
        DecimalDoubleSum(exprs.head) }))

  /** Register the same functions on an already-built session (the
    * driver owns the session in the Verify/Bench contract). */
  def register(spark: SparkSession): Unit =
    builders.foreach { case (name, _, build) =>
      Bridge.registerFunction(spark, name, build)
    }
}
