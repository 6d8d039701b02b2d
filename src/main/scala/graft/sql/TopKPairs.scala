package graft.sql

import java.io.{ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded top-k aggregate — the skew-safe replacement for the
  * `row_number() OVER (PARTITION BY key ORDER BY score DESC) <= k` window:
  * a window drags EVERY row of the hottest key through one task, while this
  * aggregate keeps at most k (score, id) pairs per group in its buffer and
  * merges buffers map-side, so a 10⁸-row hot key still combines before the
  * shuffle and only k·|groups| pairs ever cross the wire — the plan shape a
  * 100 TB per-key selection needs.
  *
  * Ordering is total and engine-reproducible: score DESC, id ASC on ties.
  * Output: array<struct<score double, id bigint>> in rank order (explode +
  * posexplode for (rank, row) output). State serializes as plain
  * length-prefixed pairs for partial-aggregation exchange. Exposed as SQL
  * aggregate `graft_topk(score, id, k)`.
  */
case class TopKPairs(
    score: Expression,
    id: Expression,
    kExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKPairs.Buffer] {

  private lazy val k: Int = kExpr.eval(InternalRow.empty) match {
    case i: Int => i
    case l: Long => l.toInt
    case other => throw new IllegalArgumentException(s"graft_topk k: $other")
  }

  override def children: Seq[Expression] = Seq(score, id, kExpr)

  override def checkInputDataTypes(): TypeCheckResult =
    (score.dataType, id.dataType) match {
      case (DoubleType, LongType) =>
        if (kExpr.foldable) TypeCheckResult.TypeCheckSuccess
        else TypeCheckResult.TypeCheckFailure("graft_topk k must be a literal")
      case (s, i) => TypeCheckResult.TypeCheckFailure(
        s"graft_topk expects (double, bigint, int), got ($s, $i)")
    }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("score", DoubleType, nullable = false),
    StructField("id", LongType, nullable = false))), containsNull = false)

  override def nullable: Boolean = false

  override def prettyName: String = "graft_topk"

  override def createAggregationBuffer(): TopKPairs.Buffer =
    new TopKPairs.Buffer(k)

  override def update(buf: TopKPairs.Buffer, input: InternalRow): TopKPairs.Buffer = {
    val s = score.eval(input)
    val i = id.eval(input)
    if (s != null && i != null)
      buf.offer(s.asInstanceOf[Double], i.asInstanceOf[Long])
    buf
  }

  override def merge(a: TopKPairs.Buffer, b: TopKPairs.Buffer): TopKPairs.Buffer = {
    b.foreach((s, i) => a.offer(s, i))
    a
  }

  override def eval(buf: TopKPairs.Buffer): Any = {
    val rows = buf.sortedDescending.map { case (s, i) =>
      InternalRow(s, i): Any
    }
    new GenericArrayData(rows)
  }

  override def serialize(buf: TopKPairs.Buffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { (s, i) => out.writeDouble(s); out.writeLong(i) }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): TopKPairs.Buffer = {
    val in = new DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = new TopKPairs.Buffer(k)
    var j = 0
    while (j < n) { buf.offer(in.readDouble(), in.readLong()); j += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKPairs =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): TopKPairs =
    copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKPairs =
    copy(score = newChildren(0), id = newChildren(1), kExpr = newChildren(2))
}

object TopKPairs {
  /** Bounded keep-best set: a min-heap ordered by "badness" whose head is
    * the WORST kept pair, so an incoming better pair evicts it in O(log k).
    * Better = higher score, then lower id. */
  final class Buffer(k: Int) {
    require(k >= 1, s"graft_topk k must be >= 1, got $k")
    // head = worst kept: ascending score, then DESCENDING id
    private val heap = new java.util.PriorityQueue[(Double, Long)](
      math.max(k, 1),
      (a: (Double, Long), b: (Double, Long)) => {
        val c = java.lang.Double.compare(a._1, b._1)
        if (c != 0) c else java.lang.Long.compare(b._2, a._2)
      })

    def size: Int = heap.size()

    def offer(s: Double, i: Long): Unit = {
      // NaN scores are unrankable and DROPPED deterministically: primitive
      // comparisons are always false for NaN while Double.compare ranks it
      // above everything, so keeping NaNs would make the kept set depend on
      // arrival order (in while the heap is filling, out once it's full)
      if (java.lang.Double.isNaN(s)) return
      if (heap.size() < k) { heap.add((s, i)); () }
      else {
        val worst = heap.peek()
        // the SAME total order as the heap comparator (Double.compare, so
        // -0.0 < 0.0 consistently) — a primitive >/== here disagreed on
        // signed zeros, making eviction outcomes arrival-order-dependent
        val c = java.lang.Double.compare(s, worst._1)
        val better = c > 0 || (c == 0 && i < worst._2)
        if (better) { heap.poll(); heap.add((s, i)); () }
      }
    }

    def foreach(f: (Double, Long) => Unit): Unit = {
      val it = heap.iterator()
      while (it.hasNext) { val p = it.next(); f(p._1, p._2) }
    }

    /** Kept pairs best-first: score DESC, id ASC — through Double.compare,
      * the same total order as the heap/offer, so signed zeros cannot
      * reorder by heap iteration order. */
    def sortedDescending: Array[(Double, Long)] = {
      val arr = heap.toArray(new Array[(Double, Long)](heap.size()))
      scala.util.Sorting.stableSort(arr, (a: (Double, Long), b: (Double, Long)) => {
        val c = java.lang.Double.compare(a._1, b._1)
        c > 0 || (c == 0 && a._2 < b._2)
      })
      arr
    }
  }
}
