package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{AttributeReference, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.ImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._

/** Exact deterministic sum of a double column at INTEGER speed — the
  * native replacement for the engine-wide exact-decimal discipline
  * `CAST(sum(CAST(x AS DECIMAL(25,6))) AS DOUBLE)` (QueryDef.dsum).
  *
  * WHY: the decimal form is the hot path of every aggregate-family
  * query (measured at bench SF: six grouped decimal sums over the
  * 600k-row lineitem cost 2.11 s vs 0.25 s for the same six double
  * sums — 8.5×). The cost is structural: the sum buffer is
  * decimal(35,6), which exceeds Spark's compact-long precision (18),
  * so every per-row update deserializes, adds, and reserializes a
  * BigDecimal-backed Decimal through the UnsafeRow aggregation
  * buffer.
  *
  * WHAT: per row, x is rounded to the SAME decimal(25,6) unscaled
  * value the Cast produces; the unscaled values accumulate in a
  * 128-bit two's-complement integer held as two LONG buffer slots —
  * plain fixed-width buffer fields, so the aggregate runs inside
  * HashAggregateExec with primitive buffer access, no BigDecimal in
  * the loop. The final value converts the 128-bit sum back through
  * `new BigDecimal(unscaled, 6).doubleValue()`, which is precisely
  * the decimal(35,6) → double cast. Integer addition is associative
  * and commutative, so the result is bit-identical across
  * partitionings and run orders — the same determinism argument as
  * the decimal discipline, minus its per-row cost.
  *
  * BIT-EQUALITY with the Cast, per row: the slow path IS the Cast's
  * arithmetic — `BigDecimal.valueOf(x).setScale(6, HALF_UP)` (Spark's
  * Decimal(double) uses the same valueOf, i.e. shortest-repr
  * semantics). The fast path applies only when |x·1e6| < 4e12 AND the
  * scaled value sits > 2e-3 from a rounding midpoint; in that region
  * the accumulated double error (shortest-repr distance ≤ 0.5 ulp,
  * product rounding ≤ 0.5 ulp, ulp(4e12) ≈ 4.9e-4 — total < 1.5e-3)
  * cannot move the value across the midpoint, so nearest-integer
  * rounding equals HALF_UP and equals the slow path. Values at or
  * near midpoints (x with an exact 5 in the 7th decimal) take the
  * slow path and stay exact.
  *
  * Overflow posture (ANSI sessions — this repo's default): a per-row
  * value needing more than 25 digits throws, like the Cast; a SUM
  * beyond decimal(35,6) (|Σ| ≥ 10^29 — unreachable for any corpus
  * here) throws at evaluation rather than at the individual add, a
  * timing difference with no in-range observable. The 128-bit
  * accumulator itself wraps only past 2^127 ≈ 1.7e32 — beyond the
  * 10^29 error bound, so the check always fires first for any sum a
  * single pass can accumulate. NaN / infinities throw, as the ANSI
  * cast does. Null inputs are skipped; an all-null (or empty) group
  * yields NULL — sum semantics.
  */
case class DecimalDoubleSum(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends ImperativeAggregate with UnaryLike[Expression]
  with org.apache.spark.sql.catalyst.expressions.ImplicitCastInputTypes {

  override def prettyName: String = "dsum_exact"
  override def inputTypes: Seq[DataType] = Seq(DoubleType)
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def withNewMutableAggBufferOffset(
      newOffset: Int): ImperativeAggregate =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(
      newOffset: Int): ImperativeAggregate =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(
      newChild: Expression): DecimalDoubleSum = copy(child = newChild)

  override def aggBufferSchema: StructType = StructType(Seq(
    StructField("hi", LongType, nullable = false),
    StructField("lo", LongType, nullable = false),
    StructField("seen", BooleanType, nullable = false)))
  override lazy val aggBufferAttributes: Seq[AttributeReference] = Seq(
    AttributeReference("hi", LongType, nullable = false)(),
    AttributeReference("lo", LongType, nullable = false)(),
    AttributeReference("seen", BooleanType, nullable = false)())
  override lazy val inputAggBufferAttributes: Seq[AttributeReference] =
    aggBufferAttributes.map(_.newInstance())

  override def initialize(buffer: InternalRow): Unit = {
    buffer.setLong(mutableAggBufferOffset, 0L)
    buffer.setLong(mutableAggBufferOffset + 1, 0L)
    buffer.setBoolean(mutableAggBufferOffset + 2, false)
  }

  /** 128-bit add of (vhi, vlo) into the mutable buffer. The carry is
    * the unsigned-overflow bit of the low-word add, branch-free. */
  private def add128(buffer: InternalRow, vhi: Long, vlo: Long): Unit = {
    val off = mutableAggBufferOffset
    val lo = buffer.getLong(off + 1)
    val nlo = lo + vlo // Java wraps; the carry recovers the overflow
    val carry = ((lo & vlo) | ((lo | vlo) & ~nlo)) >>> 63
    buffer.setLong(off, buffer.getLong(off) + vhi + carry)
    buffer.setLong(off + 1, nlo)
  }

  override def update(buffer: InternalRow, input: InternalRow): Unit = {
    val v = child.eval(input)
    if (v != null) {
      val x = v.asInstanceOf[Double]
      val y = x * 1e6
      val ay = math.abs(y)
      if (ay < 4e12) {
        val frac = y - math.floor(y)
        if (math.abs(frac - 0.5) > 2e-3) {
          // fast path: unambiguous nearest-integer == Cast's HALF_UP
          val lo = math.round(y)
          add128(buffer, lo >> 63, lo) // sign-extended high word
        } else slowUpdate(buffer, x)
      } else slowUpdate(buffer, x)
    }
    buffer.setBoolean(mutableAggBufferOffset + 2,
      v != null || buffer.getBoolean(mutableAggBufferOffset + 2))
  }

  private def slowUpdate(buffer: InternalRow, x: Double): Unit = {
    val u = DecimalDoubleSum.unscaled6Exact(x)
    add128(buffer, u.shiftRight(64).longValueExact(), u.longValue())
  }

  override def merge(buffer: InternalRow,
                     inputBuffer: InternalRow): Unit = {
    val in = inputAggBufferOffset
    add128(buffer, inputBuffer.getLong(in), inputBuffer.getLong(in + 1))
    if (inputBuffer.getBoolean(in + 2))
      buffer.setBoolean(mutableAggBufferOffset + 2, true)
  }

  override def eval(buffer: InternalRow): Any = {
    val off = mutableAggBufferOffset
    if (!buffer.getBoolean(off + 2)) return null
    val hi = buffer.getLong(off)
    val lo = buffer.getLong(off + 1)
    val unscaled = java.math.BigInteger.valueOf(hi).shiftLeft(64)
      .add(new java.math.BigInteger(java.lang.Long.toUnsignedString(lo)))
    if (unscaled.abs.compareTo(DecimalDoubleSum.maxSum35) >= 0)
      throw new ArithmeticException(
        s"dsum_exact overflow: |$unscaled| exceeds Decimal(35, 6)")
    new java.math.BigDecimal(unscaled, 6).doubleValue()
  }
}

object DecimalDoubleSum {
  private val maxSum35 = new java.math.BigInteger("1" + "0" * 35)

  /** The Cast double→decimal(25,6) arithmetic, verbatim: Spark's
    * Decimal(double) goes through BigDecimal.valueOf (shortest-repr)
    * and changePrecision(25, 6) rounds HALF_UP and rejects values
    * needing more than 25 digits. */
  private[functions] def unscaled6Exact(x: Double): java.math.BigInteger = {
    if (java.lang.Double.isNaN(x) || java.lang.Double.isInfinite(x))
      throw new ArithmeticException(
        s"dsum_exact: $x cannot be represented as Decimal(25, 6)")
    val bd = java.math.BigDecimal.valueOf(x)
      .setScale(6, java.math.RoundingMode.HALF_UP)
    if (bd.precision > 25)
      throw new ArithmeticException(
        s"dsum_exact overflow: $x cannot be represented as Decimal(25, 6)")
    bd.unscaledValue()
  }

  /** Column form: exact decimal(25,6)-sum-as-double of `c`. */
  def column(c: Column): Column =
    Bridge.column(DecimalDoubleSum(
      Bridge.expression(c.cast("double"))).toAggregateExpression())
}
