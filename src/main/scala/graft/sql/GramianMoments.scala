package graft.sql

import java.io.{ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Exact-integer first/second-moment accumulator over an `array<double>`
  * column — the one corpus-sized pass of [[graft.operators.Pca]], as a
  * BOUNDED custom aggregate instead of a d²-per-row `posexplode` expansion.
  *
  * The explode formulation pushes d(d+1)/2 generated rows per input row
  * through a hash aggregate (4,096× row amplification at d=64 — billions of
  * generate+probe operations per million input rows); this buffer does the
  * same d²/2 multiply-adds in a tight JVM loop per row and sends ONE
  * `1 + 1 + d + d(d+1)/2` long vector per partition through the shuffle.
  *
  * Determinism contract — IDENTICAL to the expression formulation it
  * replaces (the DuckDB oracle replays it): every term is quantized to an
  * integer before summation (`round(x_i * 1e9)` for first moments,
  * `round(x_i * x_j * 1e9)` for products, HALF_UP on the double's shortest
  * decimal representation — Spark's and DuckDB's `round`) and accumulated
  * in 64-bit longs, so partition order and merge order cannot move the
  * result. Null vectors are skipped; a null ELEMENT contributes no term
  * (the `sum`-skips-null behavior of the expression form) but the row still
  * counts. Ragged vector lengths fail loudly.
  *
  * Output layout (array<bigint>): `[d, n, s9_0..s9_{d-1}, p9 upper triangle
  * row-major (i ≤ j)]`; empty input → empty array.
  */
case class GramianMoments(
    vec: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[GramianMoments.Buffer] {

  override def children: Seq[Expression] = Seq(vec)

  override def checkInputDataTypes(): TypeCheckResult = vec.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_gramian expects array<double>, got $t")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullable: Boolean = false

  override def prettyName: String = "graft_gramian"

  override def createAggregationBuffer(): GramianMoments.Buffer =
    new GramianMoments.Buffer

  override def update(buf: GramianMoments.Buffer,
      input: InternalRow): GramianMoments.Buffer = {
    val v = vec.eval(input)
    if (v != null) buf.add(v.asInstanceOf[ArrayData])
    buf
  }

  override def merge(a: GramianMoments.Buffer,
      b: GramianMoments.Buffer): GramianMoments.Buffer = a.mergeFrom(b)

  override def eval(buf: GramianMoments.Buffer): Any =
    new GenericArrayData(buf.result.map(_.asInstanceOf[Any]))

  override def serialize(buf: GramianMoments.Buffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    val r = buf.result
    out.writeInt(r.length)
    r.foreach(out.writeLong)
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): GramianMoments.Buffer = {
    val in = new DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val n = in.readInt()
    val arr = new Array[Long](n)
    var i = 0
    while (i < n) { arr(i) = in.readLong(); i += 1 }
    GramianMoments.Buffer.fromResult(arr)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): GramianMoments =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): GramianMoments =
    copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): GramianMoments =
    copy(vec = newChildren(0))
}

object GramianMoments {

  private val Q9 = 1.0e9

  /** `round(t)` with the EXACT semantics of Spark's `round(double, 0)`
    * followed by `cast("long")`: HALF_UP on the shortest decimal
    * representation of the double (scala BigDecimal(d) == valueOf ==
    * Double.toString), then truncation of the whole double. The fast path
    * (floor arithmetic on |t|) is taken whenever the fraction is farther
    * than 1e-6 from the .5 boundary, where binary-vs-decimal representation
    * cannot change the outcome; boundary-adjacent values take the exact
    * BigDecimal path. */
  private[graft] def qRound(t: Double): Long = {
    val a = math.abs(t)
    val fl = math.floor(a)
    val frac = a - fl
    // the decimal repr sits within half an ulp of the binary value, so the
    // guard must be at least one ulp wide at large magnitudes
    if (math.abs(frac - 0.5) > math.max(1e-6, math.ulp(a))) {
      val r = if (frac >= 0.5) fl + 1.0 else fl
      val signed = if (t < 0) -r else r
      signed.toLong
    } else {
      // matches round(t).cast("long"): decimal HALF_UP to a whole DOUBLE,
      // then truncate
      BigDecimal(t).setScale(0, BigDecimal.RoundingMode.HALF_UP)
        .toDouble.toLong
    }
  }

  final class Buffer {
    private[GramianMoments] var d: Int = -1
    private[GramianMoments] var n: Long = 0L
    private[GramianMoments] var s: Array[Long] = null // first moments ×1e9
    private[GramianMoments] var p: Array[Long] = null // upper-tri products ×1e9

    private def init(dim: Int): Unit = {
      d = dim
      s = new Array[Long](dim)
      p = new Array[Long](dim * (dim + 1) / 2)
    }

    def add(v: ArrayData): Unit = {
      val dim = v.numElements()
      if (d == -1) init(dim)
      else if (dim != d) throw new IllegalArgumentException(
        s"graft_gramian: ragged vector lengths (saw $d then $dim)")
      n += 1
      var i = 0
      var t = 0 // running upper-triangle offset of row i
      while (i < d) {
        if (!v.isNullAt(i)) {
          val xi = v.getDouble(i)
          s(i) += qRound(xi * Q9)
          var j = i
          while (j < d) {
            if (!v.isNullAt(j)) p(t + j - i) += qRound(xi * v.getDouble(j) * Q9)
            j += 1
          }
        }
        t += d - i
        i += 1
      }
    }

    def mergeFrom(b: Buffer): Buffer = {
      if (b.d == -1) this
      else if (d == -1) b
      else {
        if (b.d != d) throw new IllegalArgumentException(
          s"graft_gramian: ragged vector lengths across partitions ($d vs ${b.d})")
        n += b.n
        var i = 0
        while (i < s.length) { s(i) += b.s(i); i += 1 }
        var j = 0
        while (j < p.length) { p(j) += b.p(j); j += 1 }
        this
      }
    }

    def result: Array[Long] =
      if (d == -1) Array.empty[Long]
      else Array(d.toLong, n) ++ s ++ p
  }

  object Buffer {
    def fromResult(arr: Array[Long]): Buffer = {
      val buf = new Buffer
      if (arr.nonEmpty) {
        val dim = arr(0).toInt
        buf.d = dim
        buf.n = arr(1)
        buf.s = java.util.Arrays.copyOfRange(arr, 2, 2 + dim)
        buf.p = java.util.Arrays.copyOfRange(arr, 2 + dim, arr.length)
      }
      buf
    }
  }
}
