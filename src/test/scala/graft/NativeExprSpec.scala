package graft

import org.apache.spark.sql.functions._
import graft.ext.{DedupOps, TextOps, VectorOps}
import graft.functions.{native, GraftExtensions}

/** The native Catalyst expressions must be bit-identical to their
  * composed-builtins formulations, and SQL-callable once registered. */
class NativeExprSpec extends SparkSpec {
  import spark.implicits._

  test("native cosine == higher-order cosine, bitwise, on real data") {
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val a = emb.select(col("vec_id").as("ida"), col("embedding").as("ea"))
    val b = emb.select(col("vec_id").as("idb"), col("embedding").as("eb"))
    val pairs = a.join(b, col("ida") < col("idb")).limit(500)
    val diffs = pairs.select(
        VectorOps.cosine(col("ea"), col("eb")).as("nat"),
        VectorOps.cosineHof(col("ea"), col("eb")).as("hof"))
      .filter(col("nat") =!= col("hof"))
      .count()
    assert(diffs == 0)
  }

  test("native simhash64 == column-formulated simhash, bitwise") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val diffs = docs.select(
        native.simhash64(TextOps.tokens(col("text"))).as("nat"),
        DedupOps.simhash(TextOps.tokens(col("text"))).as("hof"))
      .filter(col("nat") =!= col("hof"))
      .count()
    assert(diffs == 0)
  }

  test("expressions are SQL-callable after runtime registration") {
    GraftExtensions.register(spark)
    val r = spark.sql(
      """SELECT cosine_similarity(array(1.0F, 0.0F), array(1.0F, 0.0F)) c,
        |       simhash64(array('a', 'b')) s""".stripMargin).head()
    assert(r.getDouble(0) == 1.0)
    assert(r.getLong(1) != 0L)
  }

  test("native SRP buckets == higher-order SRP buckets, bitwise") {
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val diffs = emb.select(
        VectorOps.srpBuckets(col("embedding"), 8, 4).as("nat"),
        VectorOps.srpBucketsHof(col("embedding"), 8, 4).as("hof"))
      .filter(to_json(col("nat")) =!= to_json(col("hof")))
      .count()
    assert(diffs == 0)
  }

  test("token_set_jaccard matches builtin intersect/union ratio") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val t = graft.ext.TextOps.tokens(col("text"))
    val a = docs.select(col("doc_id").as("ida"),
      array_distinct(t).as("ta"))
    val b = docs.select(col("doc_id").as("idb"),
      array_distinct(t).as("tb"))
    val pairs = a.join(b, col("ida") < col("idb")).limit(300)
    val diffs = pairs.select(
        graft.functions.native.token_set_jaccard(col("ta"), col("tb"))
          .as("nat"),
        (size(array_intersect(col("ta"), col("tb"))).cast("double") /
          size(array_union(col("ta"), col("tb")))).as("hof"))
      .filter(col("nat") =!= col("hof"))
      .count()
    assert(diffs == 0)
  }

  test("null inputs propagate as null") {
    val r = spark.range(1).select(
      native.cosine_similarity(lit(null).cast("array<float>"),
        lit(null).cast("array<float>")).as("c"),
      native.simhash64(lit(null).cast("array<string>")).as("s")).head()
    assert(r.isNullAt(0) && r.isNullAt(1))
  }
}
