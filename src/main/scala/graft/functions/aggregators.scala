package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Element-wise mean of a dense vector column — the custom AGGREGATE
  * extension point (`Aggregator` + `functions.udaf`), complementing
  * the scalar `Expression`s in [[expressions]].
  *
  * Scale rationale: the composable formulation (posexplode → group by
  * (key, dim) → regroup, see the `vector_centroids` query) shuffles
  * rows × dims rows; this aggregate's partial buffers are ONE
  * (sum-vector, count) pair per partition per group — the shuffle
  * carries partials, not elements, exactly like a built-in partial
  * aggregate. The IVF mean-recompute and any embedding-pooling
  * pipeline is this shape.
  *
  * Null/ragged handling: null AND empty vectors are ignored (an
  * empty vector carries no components, and counting it would dilute
  * the mean — and make the buffer-merge order observable); the
  * buffer sizes itself from the first non-empty vector seen and
  * shorter/longer vectors contribute their overlapping prefix
  * (min-length, consistent with [[CosineSimilarity]]); a group with
  * no non-empty vectors yields an empty array. Counts are summed in
  * every merge branch, so results are partition-layout independent. */
object VectorAvg extends Aggregator[Seq[Float], (Array[Double], Long), Seq[Double]] {

  override def zero: (Array[Double], Long) = (Array.empty[Double], 0L)

  override def reduce(b: (Array[Double], Long),
                      a: Seq[Float]): (Array[Double], Long) = {
    if (a == null || a.isEmpty) b
    else {
      val buf = if (b._1.isEmpty) new Array[Double](a.length) else b._1
      val n = math.min(buf.length, a.length)
      var i = 0
      while (i < n) { buf(i) += a(i); i += 1 }
      (buf, b._2 + 1)
    }
  }

  override def merge(x: (Array[Double], Long),
                     y: (Array[Double], Long)): (Array[Double], Long) = {
    val sum =
      if (x._1.isEmpty) y._1
      else if (y._1.isEmpty) x._1
      else {
        val n = math.min(x._1.length, y._1.length)
        var i = 0
        while (i < n) { x._1(i) += y._1(i); i += 1 }
        x._1
      }
    (sum, x._2 + y._2)
  }

  override def finish(b: (Array[Double], Long)): Seq[Double] =
    if (b._2 == 0) Seq.empty
    else b._1.toSeq.map(_ / b._2)

  override def bufferEncoder: Encoder[(Array[Double], Long)] =
    ExpressionEncoder[(Array[Double], Long)]()
  override def outputEncoder: Encoder[Seq[Double]] =
    ExpressionEncoder[Seq[Double]]()

  /** Column form for untyped DataFrame aggregation. */
  def column(vec: Column): Column =
    udaf(this, ExpressionEncoder[Seq[Float]]()).apply(vec)
}
