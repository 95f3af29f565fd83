package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.ops.Relational

/** Deduplication for training-data pipelines: exact, MinHash+LSH,
  * SimHash, n-gram Jaccard. All Spark-native column expressions and
  * joins; hash families are keyed by literal seeds (xxhash64(x, seed))
  * so every signature is deterministic across runs and executors.
  *
  * Scale design:
  *   - exact dedup: one hash-shuffle on a 256-bit digest, never on the
  *     full text (shuffling 100 TB of text to dedupe it is the classic
  *     mistake; shuffling 32-byte digests is ~free);
  *   - MinHash/LSH: per-doc signature is a narrow map; candidate
  *     generation shuffles (band, bandHash) pairs — corpus-linear, not
  *     pairwise; only bucket-mates are compared exactly;
  *   - SimHash: 64-bit signature; near-dup = signature XOR popcount ≤
  *     r, candidate-pruned by band equality on 16-bit chunks.
  */
object DedupOps {

  // ------------------------------------------------------------------
  // Exact dedup
  // ------------------------------------------------------------------

  /** Exact duplicate groups by full equality of `textCol`: one
    * surviving doc id (minimum) + duplicate count per distinct text. */
  def exactDupGroups(df: DataFrame, idCol: String,
                     textCol: String): DataFrame =
    df.groupBy(col(textCol))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))
      .select("keep_id", "n_copies")

  /** Exact dedup at scale: group on sha2-256 of the text so the
    * shuffle carries 32-byte digests, not documents. Deterministic
    * survivor (min id). */
  def exactDedupByHash(df: DataFrame, idCol: String,
                       textCol: String): DataFrame = {
    val hashed = df.withColumn("__h", sha2(col(textCol), 256))
    Relational.dedupeByKeyOrdered(hashed, Seq("__h"), Seq(col(idCol)))
      .drop("__h")
  }

  // ------------------------------------------------------------------
  // MinHash + LSH
  // ------------------------------------------------------------------

  /** Word n-gram shingles from a token array. Docs shorter than n
    * produce a single whole-doc shingle. */
  def shingles(tokens: Column, n: Int): Column =
    when(size(tokens) < n, array(concat_ws(" ", tokens)))
      .otherwise(transform(sequence(lit(0), size(tokens) - n),
        i => concat_ws(" ", slice(tokens, i + lit(1), lit(n)))))

  /** MinHash signature: element j = min over shingles of
    * xxhash64(shingle, j) — a keyed hash family, deterministic. */
  def minhashSignature(shingleCol: Column, numHashes: Int): Column =
    transform(sequence(lit(0), lit(numHashes - 1)),
      j => array_min(transform(shingleCol, x => xxhash64(x, j))))

  /** Estimated Jaccard from two signatures: fraction of agreeing
    * positions. */
  def minhashJaccard(sigA: Column, sigB: Column): Column =
    size(filter(zip_with(sigA, sigB, (a, b) => a === b),
      x => x)).cast("double") / size(sigA)

  /** Per-doc LSH band keys: the signature split into `bands` rows of
    * `rowsPerBand`, each band hashed to one long. Docs sharing any
    * (band index, band hash) are candidates. */
  def lshBandKeys(sig: Column, bands: Int, rowsPerBand: Int): Column =
    transform(sequence(lit(0), lit(bands - 1)),
      b => struct(b.as("band"),
        xxhash64(slice(sig, b * lit(rowsPerBand) + lit(1), lit(rowsPerBand)))
          .as("band_hash")))

  /** MinHash/LSH near-duplicate pairs with exact-jaccard verification.
    *
    * @param df         corpus
    * @param threshold  exact token-set Jaccard cut for verified pairs
    * @return (id_a, id_b, est_jaccard, jaccard) with id_a < id_b */
  def minhashNearDupPairs(df: DataFrame, idCol: String, textCol: String,
                          shingleSize: Int = 3, numHashes: Int = 64,
                          bands: Int = 16,
                          threshold: Double = 0.5): DataFrame = {
    val rowsPerBand = numHashes / bands
    val toks = TextOps.tokens(col(textCol))
    val sigd = df.select(col(idCol).as("doc_id"),
        array_distinct(toks).as("__tokset"),
        minhashSignature(shingles(toks, shingleSize), numHashes)
          .as("__sig"))
    val banded = sigd.select(col("doc_id"), col("__tokset"), col("__sig"),
        explode(lshBandKeys(col("__sig"), bands, rowsPerBand))
          .as("__band"))
    val a = banded.select(col("__band"), col("doc_id").as("id_a"),
      col("__tokset").as("__ta"), col("__sig").as("__sa"))
    val b = banded.select(col("__band"), col("doc_id").as("id_b"),
      col("__tokset").as("__tb"), col("__sig").as("__sb"))
    val cand = a.join(b, Seq("__band"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b", "__ta", "__tb", "__sa", "__sb")
      .dropDuplicates("id_a", "id_b")
    cand
      .withColumn("est_jaccard",
        round(minhashJaccard(col("__sa"), col("__sb")), 6))
      .withColumn("jaccard",
        round(size(array_intersect(col("__ta"), col("__tb"))).cast("double") /
          size(array_union(col("__ta"), col("__tb"))), 6))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "est_jaccard", "jaccard")
  }

  // ------------------------------------------------------------------
  // SimHash
  // ------------------------------------------------------------------

  /** 64-bit SimHash over tokens: bit i is the sign of the sum over
    * tokens of ±1 depending on bit i of the token hash. Built from 64
    * statically-unrolled bit terms (shift amounts must be literals in
    * the Column API); token hashes are computed once. */
  def simhash(tokens: Column): Column = {
    val hashes = transform(tokens, t => xxhash64(t))
    val terms = (0 until 64).map { i =>
      val ones = size(filter(hashes,
        h => shiftright(h, i).bitwiseAND(1L) === 1L))
      // bitSum = ones - (total - ones) > 0  ⇔  2·ones > total
      when(ones * 2 > size(hashes), lit(1L << i)).otherwise(lit(0L))
    }
    terms.reduce(_ + _)
  }

  /** Hamming distance between two 64-bit signatures. */
  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** SimHash near-dup pairs: the signature is split into
    * `maxDistance + 1` chunks, so by pigeonhole any pair within
    * Hamming distance `maxDistance` agrees on ≥1 chunk — candidates
    * are chunk-mates, verified by full Hamming distance. Larger
    * `maxDistance` → narrower chunks → more (cheap) false candidates. */
  def simhashNearDupPairs(df: DataFrame, idCol: String, textCol: String,
                          maxDistance: Int = 3): DataFrame = {
    val sigd = df.select(col(idCol).as("doc_id"),
      simhash(TextOps.tokens(col(textCol))).as("__sig"))
    val nChunks = math.min(maxDistance + 1, 64)
    val base = 64 / nChunks
    val extra = 64 % nChunks
    val chunkStructs = (0 until nChunks).map { i =>
      val off = i * base + math.min(i, extra)
      val w = base + (if (i < extra) 1 else 0)
      val mask = if (w >= 64) -1L else (1L << w) - 1
      struct(lit(i).as("chunk"),
        shiftright(col("__sig"), off).bitwiseAND(mask).as("chunk_val"))
    }
    val chunked = sigd.select(col("doc_id"), col("__sig"),
      explode(array(chunkStructs: _*)).as("__c"))
    val a = chunked.select(col("__c"), col("doc_id").as("id_a"),
      col("__sig").as("__sa"))
    val b = chunked.select(col("__c"), col("doc_id").as("id_b"),
      col("__sig").as("__sb"))
    a.join(b, Seq("__c"))
      .filter(col("id_a") < col("id_b"))
      .dropDuplicates("id_a", "id_b")
      .withColumn("hamming_distance", hamming(col("__sa"), col("__sb")))
      .filter(col("hamming_distance") <= maxDistance)
      .select("id_a", "id_b", "hamming_distance")
  }

  // ------------------------------------------------------------------
  // n-gram Jaccard
  // ------------------------------------------------------------------

  /** Exact token-set Jaccard for all (a < b) pairs within a blocking
    * key (e.g. language+source) — the verification-quality measure,
    * viable when blocks are small. */
  def ngramJaccardPairs(df: DataFrame, idCol: String, textCol: String,
                        blockCols: Seq[String]): DataFrame = {
    val base = df.select((col(idCol).as("doc_id") +:
      array_distinct(TextOps.tokens(col(textCol))).as("__tok") +:
      blockCols.map(col)): _*)
    val a = base.toDF(("id_a" +: "__ta" +: blockCols): _*)
    val b = base.toDF(("id_b" +: "__tb" +: blockCols): _*)
    a.join(b, blockCols)
      .filter(col("id_a") < col("id_b"))
      .withColumn("jaccard",
        round(size(array_intersect(col("__ta"), col("__tb"))).cast("double") /
          size(array_union(col("__ta"), col("__tb"))), 6))
      .select((blockCols.map(col) :+ col("id_a") :+ col("id_b") :+
        col("jaccard")): _*)
  }
}
