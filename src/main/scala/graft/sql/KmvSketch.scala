package graft.sql

import java.io.{ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** KMV (k-minimum-values) distinct sketch — the bounded, MERGEABLE answer
  * to "how many distinct X, and how many distinct X do two slices share"
  * over data too big for exact `count(distinct)`. The buffer keeps the k
  * smallest DISTINCT hash values seen; for a uniform hash on [0, 2^60) the
  * k-th smallest estimates the distinct count as (k-1) * 2^60 / kth
  * (Bar-Yossef et al. 2002), and two groups' sketches combine by taking
  * the k smallest of their union — so per-slice sketches roll up to
  * corpus-level cardinality and PAIRWISE OVERLAP estimates without
  * re-touching the data.
  *
  * Why not HLL (Spark's approx_count_distinct)? HLL unions but cannot
  * intersect; KMV supports the intersection estimate (Jaccard over the
  * union sketch × union estimate) that corpus-overlap audits need, and its
  * output is a plain sorted array<bigint> any engine can replay — the
  * md5-prefix hash convention keeps the whole construction
  * oracle-checkable in SQL.
  *
  * Scale shape: the buffer is a capped TreeSet of k longs regardless of
  * input size; partial aggregation combines map-side, so only k values per
  * group cross the shuffle. Exposed as SQL aggregate `graft_kmv(hash, k)`
  * → sorted-ascending array<bigint> (size < k means the group had fewer
  * than k distinct values — the exact branch).
  */
case class KmvSketch(
    hash: Expression,
    kExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KmvSketch.Buffer] {

  private lazy val k: Int = kExpr.eval(InternalRow.empty) match {
    case i: Int => i
    case l: Long => l.toInt
    case other => throw new IllegalArgumentException(s"graft_kmv k: $other")
  }

  override def children: Seq[Expression] = Seq(hash, kExpr)

  override def checkInputDataTypes(): TypeCheckResult = hash.dataType match {
    case LongType =>
      if (kExpr.foldable) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure("graft_kmv k must be a literal")
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_kmv expects a bigint hash, got $t")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullable: Boolean = false

  override def prettyName: String = "graft_kmv"

  override def createAggregationBuffer(): KmvSketch.Buffer =
    new KmvSketch.Buffer(k)

  override def update(buf: KmvSketch.Buffer, input: InternalRow): KmvSketch.Buffer = {
    val h = hash.eval(input)
    if (h != null) buf.offer(h.asInstanceOf[Long])
    buf
  }

  override def merge(a: KmvSketch.Buffer, b: KmvSketch.Buffer): KmvSketch.Buffer = {
    b.foreach(a.offer)
    a
  }

  override def eval(buf: KmvSketch.Buffer): Any =
    new GenericArrayData(buf.sortedAscending.map(_.asInstanceOf[Any]))

  override def serialize(buf: KmvSketch.Buffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach(out.writeLong)
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): KmvSketch.Buffer = {
    val in = new DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = new KmvSketch.Buffer(k)
    var j = 0
    while (j < n) { buf.offer(in.readLong()); j += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvSketch =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): KmvSketch =
    copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): KmvSketch =
    copy(hash = newChildren(0), kExpr = newChildren(1))
}

object KmvSketch {
  /** The k smallest distinct longs seen so far. TreeSet gives dedup +
    * ordered eviction of the largest in O(log k); k is sketch-sized
    * (tens to thousands), so the memory is a few KB per group. */
  final class Buffer(k: Int) {
    require(k >= 2, s"graft_kmv k must be >= 2, got $k")
    private val set = new java.util.TreeSet[java.lang.Long]()

    def size: Int = set.size()

    def offer(h: Long): Unit =
      if (set.size() < k) { set.add(h); () }
      else if (h < set.last()) {
        if (set.add(h)) { set.remove(set.last()); () }
      }

    def foreach(f: Long => Unit): Unit = {
      val it = set.iterator()
      while (it.hasNext) f(it.next())
    }

    def sortedAscending: Array[Long] = {
      val arr = new Array[Long](set.size())
      var i = 0
      val it = set.iterator()
      while (it.hasNext) { arr(i) = it.next(); i += 1 }
      arr
    }
  }
}
