package graft.functions

import java.io.{ByteArrayOutputStream, DataOutputStream}
import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra–Gries frequent-items sketch as a native mergeable aggregate
  * (`TypedImperativeAggregate`) — the §2.5 "custom aggregate" tier next
  * to the scalar Expressions and the GroupTopK whole-operator plan.
  *
  * Finds heavy hitters WITHOUT a full groupBy: each partition keeps at
  * most `k-1` counters (decrement-all on overflow), partial summaries
  * merge associatively (Agarwal et al., "Mergeable Summaries", PODS'12:
  * sum counts, then subtract the (k)-th largest and drop non-positive),
  * and every reported count is a lower bound within n/k of the true
  * count. Items with true count > n/k are GUARANTEED present. At 100 TB
  * that is a fixed-memory one-pass answer to "what are the dominant
  * values" where an exact groupBy would shuffle the full key set; when
  * the column's cardinality is <= k the summary never evicts and the
  * counts are exact (which is what the oracle query pins down).
  */
object FreqItems {

  // java.lang.Long values: scala.Long type-args would make HashMap.get
  // unbox absent keys to 0 instead of null
  type Buffer = java.util.HashMap[UTF8String, java.lang.Long]

  case class FreqItemsAgg(child: Expression, k: Int,
                          override val mutableAggBufferOffset: Int = 0,
                          override val inputAggBufferOffset: Int = 0)
      extends TypedImperativeAggregate[Buffer] with ImplicitCastInputTypes {
    require(k > 1, "k must be > 1")

    override def inputTypes: Seq[DataType] = Seq(StringType)
    override def children: Seq[Expression] = Seq(child)
    override def nullable: Boolean = false
    override def dataType: DataType = ArrayType(StructType(Seq(
      StructField("item", StringType, nullable = false),
      StructField("lb", LongType, nullable = false))), containsNull = false)
    override def prettyName: String = "graft_freq_items"

    override def createAggregationBuffer(): Buffer = new Buffer()

    override def update(buf: Buffer, input: InternalRow): Buffer = {
      val v = child.eval(input)
      if (v != null) add(buf, v.asInstanceOf[UTF8String], 1L, k)
      buf
    }

    override def merge(buf: Buffer, other: Buffer): Buffer = {
      val it = other.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        val cur = buf.get(e.getKey)
        buf.put(e.getKey,
          if (cur ne null) java.lang.Long.valueOf(cur + e.getValue) else e.getValue)
      }
      shrink(buf, k)
      buf
    }

    /** Deterministic output order: count desc, item asc. */
    override def eval(buf: Buffer): Any = {
      val entries = new Array[(UTF8String, Long)](buf.size())
      val it = buf.entrySet().iterator()
      var i = 0
      while (it.hasNext) { val e = it.next(); entries(i) = (e.getKey, e.getValue.longValue()); i += 1 }
      val sorted = entries.sortBy { case (s, c) => (-c, s) }
      new GenericArrayData(sorted.map { case (s, c) =>
        InternalRow(s, c) }.asInstanceOf[Array[Any]])
    }

    override def serialize(buf: Buffer): Array[Byte] = {
      val bos = new ByteArrayOutputStream()
      val out = new DataOutputStream(bos)
      out.writeInt(buf.size())
      val it = buf.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        val b = e.getKey.getBytes
        out.writeInt(b.length); out.write(b); out.writeLong(e.getValue)
      }
      out.flush(); bos.toByteArray
    }

    override def deserialize(bytes: Array[Byte]): Buffer = {
      val in = ByteBuffer.wrap(bytes)
      val n = in.getInt
      val buf = new Buffer()
      var i = 0
      while (i < n) {
        val len = in.getInt
        val b = new Array[Byte](len); in.get(b)
        buf.put(UTF8String.fromBytes(b), java.lang.Long.valueOf(in.getLong))
        i += 1
      }
      buf
    }

    override def withNewMutableAggBufferOffset(o: Int): FreqItemsAgg =
      copy(mutableAggBufferOffset = o)
    override def withNewInputAggBufferOffset(o: Int): FreqItemsAgg =
      copy(inputAggBufferOffset = o)
    override protected def withNewChildrenInternal(
        cs: IndexedSeq[Expression]): FreqItemsAgg = copy(child = cs.head)
  }

  /** MG update: increment if tracked or room; else decrement all. */
  private def add(buf: Buffer, v: UTF8String, inc: Long, k: Int): Unit = {
    val cur = buf.get(v)
    if (cur ne null) buf.put(v, java.lang.Long.valueOf(cur + inc))
    else if (buf.size() < k - 1) buf.put(v.clone(), java.lang.Long.valueOf(inc))
    else {
      val it = buf.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        if (e.getValue <= inc) it.remove()
        else e.setValue(java.lang.Long.valueOf(e.getValue - inc))
      }
    }
  }

  /** Mergeable-summaries shrink: keep the k-1 largest, subtracting the
    * k-th largest count from the survivors. */
  private def shrink(buf: Buffer, k: Int): Unit = {
    if (buf.size() <= k - 1) return
    val counts = new Array[Long](buf.size())
    val it0 = buf.values().iterator()
    var i = 0
    while (it0.hasNext) { counts(i) = it0.next().longValue(); i += 1 }
    java.util.Arrays.sort(counts)
    val kth = counts(counts.length - k) // k-th largest
    val it = buf.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      if (e.getValue <= kth) it.remove()
      else e.setValue(java.lang.Long.valueOf(e.getValue - kth))
    }
  }

  // ------------------------------------------------------------- Column API

  /** array<struct<item,lb>> of ≤ k-1 frequent items, count desc. */
  def freqItems(c: Column, k: Int): Column =
    GraftBridge.column(FreqItemsAgg(GraftBridge.expression(c), k)
      .toAggregateExpression())
}
