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

  test("native bloom_might_contain has no false negatives and rejects " +
    "most non-members at the configured fpp") {
    val keys = (0L until 5000L by 5).toDF("k")
    val bf = keys.stat.bloomFilter("k", 1000L, 0.03)
    val out = new java.io.ByteArrayOutputStream()
    bf.writeTo(out)
    val probed = (0L until 5000L).toDF("k")
      .select(col("k"), native.bloom_might_contain(
        lit(out.toByteArray), col("k")).as("hit"))
      .as[(Long, Boolean)].collect()
    // every true member must probe TRUE — a false negative breaks the
    // anti-join-bloom equivalence proof
    assert(probed.forall { case (k, hit) => k % 5 != 0 || hit })
    // and the 4000 non-members mostly probe FALSE (fpp 3% → ~120
    // phantoms expected; 10x slack keeps the assertion unflaky)
    val phantoms = probed.count { case (k, hit) => k % 5 != 0 && hit }
    assert(phantoms < 1200, s"phantom rate implausible: $phantoms/4000")
  }

  test("expressions are SQL-callable after runtime registration") {
    GraftExtensions.register(spark)
    val r = spark.sql(
      """SELECT cosine_similarity(array(1.0F, 0.0F), array(1.0F, 0.0F)) c,
        |       simhash64(array('a', 'b')) s""".stripMargin).head()
    assert(r.getDouble(0) == 1.0)
    assert(r.getLong(1) != 0L)
  }

  test("unicode_normalize: codegen path == interpreted eval == JDK " +
    "reference, and SQL-callable with a literal form") {
    GraftExtensions.register(spark)
    // decomposed accent + fullwidth + ligature on real corpus text
    val mess = "\u0301 \uFF21\uFB01 "
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
      .select(concat(lit("e"), lit(mess), col("text")).as("t"))
    for (form <- Seq("NFC", "NFKC")) {
      val f = java.text.Normalizer.Form.valueOf(form)
      val mismatches = docs.select(col("t"),
          graft.functions.native.unicode_normalize(col("t"), form)
            .as("n"))
        .collect()
        .count(r => r.getString(1) !=
          java.text.Normalizer.normalize(r.getString(0), f))
      assert(mismatches === 0, form)
    }
    val viaSql = spark.sql(
      "SELECT unicode_normalize('e\u0301', 'NFC') n")
      .head().getString(0)
    assert(viaSql === "\u00e9")
    // non-literal form is rejected loudly, not mis-planned
    intercept[Exception] {
      spark.sql("SELECT unicode_normalize('x', lower('NFC'))").collect()
    }
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

  test("native minhash_sig == higher-order minhash signature, bitwise") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val hashed = docs.select(
      transform(DedupOps.shingles(TextOps.tokens(col("text")), 3),
        x => xxhash64(x)).as("h"))
    val diffs = hashed.select(
        native.minhash_sig(col("h"), 64).as("nat"),
        DedupOps.minhashSignatureFromHashes(col("h"), 64).as("hof"))
      .filter(col("nat") =!= col("hof"))
      .count()
    assert(diffs == 0)
  }

  test("cosine of a zero vector is NULL (not NaN), native and HOF") {
    val zero = array(lit(0f), lit(0f))
    val v = array(lit(1f), lit(2f))
    val r = spark.range(1).select(
      native.cosine_similarity(zero, v).as("nat"),
      VectorOps.cosineHof(zero, v).as("hof")).head()
    assert(r.isNullAt(0) && r.isNullAt(1))
  }

  test("SQL natives implicitly cast double arrays (no garbage floats)") {
    GraftExtensions.register(spark)
    // double literals — without declared inputTypes these bind as
    // array<double> and getFloat reads wrong bytes (silent garbage)
    val r = spark.sql(
      "SELECT cosine_similarity(array(1.0, 2.0), array(1.0, 2.0)) c").head()
    assert(math.abs(r.getDouble(0) - 1.0) < 1e-9)
    val m = spark.sql(
      "SELECT minhash_sig(array(1, 2, 3), 8) s").head()
    assert(m.getSeq[Long](0).length == 8)
  }

  test("simhash64 tolerates NULL tokens, matching the column form") {
    GraftExtensions.register(spark)
    val r = spark.sql(
      """SELECT simhash64(array('a', CAST(NULL AS STRING), 'b')) nat,
        |       simhash64(array('a', 'b')) no_null""".stripMargin).head()
    // matches the column form: a NULL token raises the majority total
    // without voting for any bit
    val colForm = spark.range(1).select(DedupOps.simhash(
      array(lit("a"), lit(null).cast("string"), lit("b"))).as("s")).head()
    assert(r.getLong(0) == colForm.getLong(0))
  }

  test("native nearest_centroid == higher-order fold on real embeddings") {
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val cents = VectorOps.ivfCentroids(emb, "vec_id", "embedding", 4)
    val nat = VectorOps.assignToCentroids(emb, "vec_id", "embedding",
        cents).as[(Long, Long)].collect().toMap
    val hof = VectorOps.assignToCentroidsHof(emb, "vec_id", "embedding",
        cents).as[(Long, Long)].collect().toMap
    assert(nat == hof)
    assert(nat.nonEmpty)
  }

  test("null inputs propagate as null") {
    val r = spark.range(1).select(
      native.cosine_similarity(lit(null).cast("array<float>"),
        lit(null).cast("array<float>")).as("c"),
      native.simhash64(lit(null).cast("array<string>")).as("s")).head()
    assert(r.isNullAt(0) && r.isNullAt(1))
  }

  test("native ngram_hashes == the Scala seed-chain model, bitwise, " +
    "incl. unicode / nulls / short arrays") {
    import org.apache.spark.sql.catalyst.expressions.{XXH64,
      XxHash64Function}
    import org.apache.spark.sql.types.StringType
    import org.apache.spark.unsafe.types.UTF8String
    def model(toks: Seq[String], n: Int, seed: Long): Seq[Long] =
      (0 to toks.length - n).map { i =>
        toks.slice(i, i + n).foldLeft(seed) { (h, t) =>
          if (t == null) XXH64.hashLong(0L, h)
          else XxHash64Function.hash(UTF8String.fromString(t),
            StringType, h)
        }
      }
    val cases: Seq[Seq[String]] = Seq(
      Seq("a", "b", "c", "d"),
      Seq("héllo", "wörld", "héllo"),
      Seq("a", null, "c"),
      Seq("only"),
      Seq())
    for (n <- Seq(1, 2, 3); seed <- Seq(42L, 1337L); toks <- cases) {
      val got = Seq(toks).toDF("t")
        .select(native.ngram_hashes(col("t"), n, seed).as("g"))
        .as[Seq[Long]].head()
      assert(got === model(toks, n, seed), s"n=$n seed=$seed toks=$toks")
    }
    // boundary discrimination the string-join form lacks
    val joined = Seq(Seq("ab", "c"), Seq("a", "bc"))
    val hs = joined.map(t => Seq(t).toDF("t")
      .select(native.ngram_hashes(col("t"), 2, 42L).as("g"))
      .as[Seq[Long]].head().head)
    assert(hs.distinct.size == 2)
  }

  test("native char_ngram_md5_buckets == the transform/substr + " +
    "md5Bucket composition, bitwise — ASCII, accented, CJK, astral, " +
    "short, empty") {
    val cases = Seq(
      "hello world", "héllo wörld", "中文分词测试", "naïve café",
      "mixed 中en文", "a😀b😀c", // astral: emoji are ONE char
      "ab", "a", "", "  spaces  kept  ", "ABC lowered?")
    for (n <- Seq(2, 3, 4); d <- Seq(7, 4096); s <- cases) {
      val df = Seq(s).toDF("t").select(lower(trim(col("t"))).as("s"))
      val composed = df.select(
        when(length(col("s")) >= n,
          transform(sequence(lit(1), length(col("s")) - (n - 1)),
            i => graft.ext.SamplingOps.md5Bucket(
              col("s").substr(i, lit(n)), d)))
        .otherwise(array().cast("array<bigint>")).as("b"))
        .as[Seq[Long]].head()
      val got = df.select(
          native.char_ngram_md5_buckets(col("s"), n, d).as("b"))
        .as[Seq[Long]].head()
      assert(got === composed, s"n=$n d=$d s='$s'")
    }
    // null string → null array (null-intolerant, like the builtins)
    val nullRow = Seq(Option.empty[String]).toDF("t")
      .select(native.char_ngram_md5_buckets(col("t"), 3, 16).as("b"))
      .collect().head
    assert(nullRow.isNullAt(0))
  }

  test("native token_ngram_md5_buckets == the concat_ws-gram + " +
    "md5Bucket composition, bitwise — incl. null-token skip and " +
    "short arrays") {
    def composed(toks: Seq[String], n: Int, d: Int): Seq[Long] =
      Seq(Tuple1(toks)).toDF("t").select(
        when(size(col("t")) >= n,
          transform(sequence(lit(1), size(col("t")) - (n - 1)),
            i => graft.ext.SamplingOps.md5Bucket(
              concat_ws(" ", slice(col("t"), i, lit(n))), d)))
        .otherwise(array().cast("array<bigint>")).as("b"))
        .as[Seq[Long]].head()
    val cases: Seq[Seq[String]] = Seq(
      Seq("the", "quick", "brown", "fox"),
      Seq("héllo", "wörld", "中文"),
      Seq("a", null, "c", "d"), // concat_ws skips nulls + separator
      Seq("", "empty", ""),     // empty tokens still separate
      Seq("only"), Seq())
    for (n <- Seq(1, 2, 3); d <- Seq(13, 4096); toks <- cases) {
      val got = Seq(Tuple1(toks)).toDF("t")
        .select(native.token_ngram_md5_buckets(col("t"), n, d).as("b"))
        .as[Seq[Long]].head()
      assert(got === composed(toks, n, d), s"n=$n d=$d toks=$toks")
    }
  }

  test("intersect_count_sorted == size(array_intersect) on sorted " +
    "distinct long arrays — codegen AND interpreted paths") {
    val rnd = new scala.util.Random(7)
    val cases: Seq[(Seq[Long], Seq[Long])] =
      (Seq.tabulate(40) { _ =>
        val a = Seq.fill(rnd.nextInt(120))(rnd.nextInt(200).toLong)
          .distinct.sorted
        val b = Seq.fill(rnd.nextInt(120))(rnd.nextInt(200).toLong)
          .distinct.sorted
        (a, b)
      }) ++ Seq(
        (Seq.empty[Long], Seq(1L, 2L)),
        (Seq.empty[Long], Seq.empty[Long]),
        (Seq(Long.MinValue, 0L, Long.MaxValue),
         Seq(Long.MinValue, 1L, Long.MaxValue)))
    val df = cases.toDF("a", "b")
    val got = df.select(
        native.intersect_count_sorted(col("a"), col("b")).as("n"),
        size(array_intersect(col("a"), col("b"))).as("m"))
      .as[(Int, Int)].collect()
    got.zip(cases).foreach { case ((n, m), c) =>
      assert(n == m, s"case $c: native=$n builtin=$m")
    }
    // interpreted eval (no codegen) agrees — collect via a filter that
    // blocks whole-stage codegen is brittle; instead call eval directly
    import org.apache.spark.sql.catalyst.util.ArrayData
    val e = graft.functions.SortedLongIntersectCount(
      org.apache.spark.sql.catalyst.expressions.Literal(
        ArrayData.toArrayData(Array(1L, 3L, 5L)),
        org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.LongType)),
      org.apache.spark.sql.catalyst.expressions.Literal(
        ArrayData.toArrayData(Array(2L, 3L, 4L, 5L)),
        org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.LongType)))
    assert(e.eval(null) == 2)
  }

  test("dsum_exact == sum(cast(decimal(25,6))) bitwise: real data, " +
    "adversarial midpoints, nulls, empty groups, high-cardinality merge") {
    def dsumCast(c: org.apache.spark.sql.Column) =
      sum(c.cast("decimal(25,6)")).cast("double")
    def dsumNat(c: org.apache.spark.sql.Column) =
      graft.functions.DecimalDoubleSum.column(c)
    // real bench data, low- and high-cardinality groupings (the
    // high-card one exercises partial/merge across many groups)
    val li = Tables.lineitem(spark, "/root/testdata/sf0.001")
    for (key <- Seq("l_returnflag", "l_orderkey")) {
      val a = li.groupBy(col(key)).agg(
        dsumCast(col("l_extendedprice")).as("s1"),
        dsumCast(col("l_quantity") * col("l_extendedprice")).as("s2"))
      val b = li.groupBy(col(key)).agg(
        dsumNat(col("l_extendedprice")).as("s1"),
        dsumNat(col("l_quantity") * col("l_extendedprice")).as("s2"))
      val bad = a.join(b, Seq(key))
        .filter(!(a("s1") <=> b("s1")) || !(a("s2") <=> b("s2"))).count()
      assert(bad == 0, s"dsum_exact mismatch grouped by $key")
    }
    // adversarial values: exact rounding midpoints at the 7th decimal
    // (the slow path), negatives (HALF_UP is round-away), tiny and
    // large magnitudes, nulls, and one all-null group (sum => null)
    val adv = spark.range(0, 50000).selectExpr(
      "pmod(id, 37) AS g",
      """CASE pmod(id, 8)
         WHEN 0 THEN cast(id AS double) / 3.0
         WHEN 1 THEN -(cast(id AS double) + 0.0000005)
         WHEN 2 THEN cast(id AS double) * 1e-7
         WHEN 3 THEN 0.0000005 + id
         WHEN 4 THEN -1e9 - cast(id AS double) * 0.9999995
         WHEN 5 THEN cast(id AS double) * 12345.6789012345
         WHEN 6 THEN cast(id AS double) * -1e10
         ELSE cast(null AS double) END AS v""")
      .union(spark.range(0, 10).selectExpr("cast(99 AS bigint) AS g",
        "cast(null AS double) AS v"))
    val a = adv.groupBy("g").agg(dsumCast(col("v")).as("s"))
    val b = adv.groupBy("g").agg(dsumNat(col("v")).as("s"))
    val bad = a.join(b, Seq("g")).filter(!(a("s") <=> b("s"))).count()
    assert(bad == 0, "dsum_exact mismatch on adversarial values")
    // the all-null group must be NULL under both forms
    assert(b.filter(col("g") === 99).select("s").head().isNullAt(0))
  }
}
