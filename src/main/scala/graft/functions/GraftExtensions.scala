package graft.functions

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.expressions.Expression
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
  }
}

object GraftExtensions {
  /** Register the same functions on an already-built session (the
    * driver owns the session in the Verify/Bench contract). */
  def register(spark: SparkSession): Unit = {
    Bridge.registerFunction(spark, "cosine_similarity",
      exprs => CosineSimilarity(exprs(0), exprs(1)))
    Bridge.registerFunction(spark, "simhash64",
      exprs => Simhash64(exprs.head))
    Bridge.registerFunction(spark, "token_set_jaccard",
      exprs => TokenSetJaccard(exprs(0), exprs(1)))
  }
}
