package graft.functions

import java.io.{ByteArrayOutputStream, DataOutputStream}
import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Mergeable QUANTILE sketch as a native aggregate — the order-statistics
  * member of the sketch family (KMV distinct / CMS frequency /
  * Misra–Gries heavy hitters): a bottom-k-BY-HASH value sample.
  *
  * The buffer keeps the payload values of the k smallest distinct
  * CONTENT HASHES seen (hash and value are separate child expressions —
  * feed the md5-60bit idiom over a unique row key). Bottom-k of a
  * uniform hash is a uniform k-sample WITHOUT replacement, so the
  * sample's order statistics estimate the population quantiles with the
  * usual ~1/√k error — and, unlike a KLL/GK compactor whose state
  * depends on merge order, "the values of the k smallest hashes" is a
  * pure function of the input SET: deterministic under any partitioning
  * or merge tree, and REPLAYABLE in external SQL as
  * `row_number() OVER (ORDER BY hash) <= k` — which is what lets the
  * sampled quantiles be oracle-checked value-for-value (the
  * q_kmv_overlap property, carried to quantiles).
  *
  * At 100 TB: each partition ships ≤ k (hash, value) pairs per group;
  * no per-group sort of the data, no value-domain-sized state. The
  * exact-percentile companions (q_percentile_disc's bounded-domain
  * histogram, GroupRank ranks) stay the right tool when the value
  * domain is small or exactness is required; this sketch is the
  * fixed-budget answer when it is not.
  */
object QuantileSample {

  /** hash → value, ordered by hash; capped at the k smallest hashes. */
  type Buffer = java.util.TreeMap[java.lang.Long, java.lang.Double]

  case class QuantileSampleAgg(hashChild: Expression, valueChild: Expression,
                               k: Int,
                               override val mutableAggBufferOffset: Int = 0,
                               override val inputAggBufferOffset: Int = 0)
      extends TypedImperativeAggregate[Buffer] with ImplicitCastInputTypes {
    require(k > 1, "k must be > 1")

    override def inputTypes: Seq[DataType] = Seq(LongType, DoubleType)
    override def children: Seq[Expression] = Seq(hashChild, valueChild)
    override def nullable: Boolean = false
    override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
    override def prettyName: String = "graft_quantile_sample"

    override def createAggregationBuffer(): Buffer = new Buffer()

    override def update(buf: Buffer, input: InternalRow): Buffer = {
      val h = hashChild.eval(input)
      val v = valueChild.eval(input)
      if (h != null && v != null)
        add(buf, h.asInstanceOf[Long], v.asInstanceOf[Double])
      buf
    }

    override def merge(buf: Buffer, other: Buffer): Buffer = {
      val it = other.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        add(buf, e.getKey.longValue(), e.getValue.doubleValue())
      }
      buf
    }

    /** The sampled values, sorted ASCENDING BY VALUE — ready for
      * element_at order-statistics. */
    override def eval(buf: Buffer): Any = {
      val vals = new Array[Double](buf.size())
      val it = buf.values().iterator()
      var i = 0
      while (it.hasNext) { vals(i) = it.next().doubleValue(); i += 1 }
      java.util.Arrays.sort(vals)
      val out = new Array[Any](vals.length)
      i = 0
      while (i < vals.length) { out(i) = vals(i); i += 1 }
      new GenericArrayData(out)
    }

    override def serialize(buf: Buffer): Array[Byte] = {
      val bos = new ByteArrayOutputStream()
      val out = new DataOutputStream(bos)
      out.writeInt(buf.size())
      val it = buf.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        out.writeLong(e.getKey.longValue())
        out.writeDouble(e.getValue.doubleValue())
      }
      out.flush(); bos.toByteArray
    }

    override def deserialize(bytes: Array[Byte]): Buffer = {
      val in = ByteBuffer.wrap(bytes)
      val n = in.getInt
      val buf = new Buffer()
      var i = 0
      while (i < n) {
        buf.put(java.lang.Long.valueOf(in.getLong),
          java.lang.Double.valueOf(in.getDouble))
        i += 1
      }
      buf
    }

    /** Insert, keeping only the k smallest distinct hashes. A repeat
      * hash (only possible via a 60-bit collision when a unique row
      * key feeds the hash) keeps the MIN value — a commutative,
      * merge-order-independent tie-break, so the buffer stays a pure
      * function of the input SET even in the collision case, and the
      * oracle replays it as min(value) GROUP BY hash before the
      * bottom-k rank. Skips the insert when the hash is a new key ≥
      * the current k-th smallest. */
    private def add(buf: Buffer, h: Long, v: Double): Unit = {
      val key = java.lang.Long.valueOf(h)
      val cur = buf.get(key)
      if (cur != null) {
        if (v < cur.doubleValue()) { buf.put(key, java.lang.Double.valueOf(v)); () }
      } else if (buf.size() < k) {
        buf.put(key, java.lang.Double.valueOf(v)); ()
      } else if (h < buf.lastKey().longValue()) {
        buf.put(key, java.lang.Double.valueOf(v))
        buf.pollLastEntry(); ()
      }
    }

    override def withNewMutableAggBufferOffset(o: Int): QuantileSampleAgg =
      copy(mutableAggBufferOffset = o)
    override def withNewInputAggBufferOffset(o: Int): QuantileSampleAgg =
      copy(inputAggBufferOffset = o)
    override protected def withNewChildrenInternal(
        cs: IndexedSeq[Expression]): QuantileSampleAgg =
      copy(hashChild = cs(0), valueChild = cs(1))
  }

  // ------------------------------------------------------------- Column API

  /** array<double>, ascending: the values carried by the k smallest
    * distinct `hash` entries. Feed `hash` the md5-60bit idiom over a
    * UNIQUE row key so the sample is deterministic, uniform, and
    * SQL-replayable. */
  def quantileSample(hash: Column, value: Column, k: Int): Column =
    GraftBridge.column(QuantileSampleAgg(
      GraftBridge.expression(hash), GraftBridge.expression(value), k)
      .toAggregateExpression())
}
