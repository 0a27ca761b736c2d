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

/** KMV ("k minimum values" / theta-style) distinct sketch as a native
  * mergeable aggregate — the set-operation companion of the HLL wrapper
  * in `operators.Sketches`: HLL union-merges but cannot intersect; a
  * KMV sketch is a uniform bottom-k sample of the distinct hash space,
  * so two sketches support union AND intersection estimates (Beyer et
  * al., SIGMOD'07 / the DataSketches theta family).
  *
  * The buffer keeps the k smallest DISTINCT hash values seen; partial
  * buffers merge by set-union + trim. Because "k smallest distinct
  * elements of a set" is partition- and order-independent, the sketch
  * is fully DETERMINISTIC — same input multiset, same sketch, under any
  * partitioning or merge tree (unlike HLL register races or sampled
  * sketches), which is what lets `q_kmv_overlap` be oracle-checked
  * value-for-value in SQL. Estimators (caller-side arithmetic over the
  * emitted array): distinct ≈ (k−1)·M/θ with θ = k-th smallest hash,
  * M = hash-space size; for union U of two sketches, |A∩B| ≈
  * (|{x ∈ bottomK(U) : x ∈ A ∩ B}| / k) · est(U).
  *
  * At 100 TB: each partition ships ≤ k longs per group — no
  * (group, value) distinct shuffle, no value-domain-sized state; error
  * is ~1/√k regardless of cardinality.
  */
object KmvSketch {

  type Buffer = java.util.TreeSet[java.lang.Long]

  case class KmvAgg(child: Expression, k: Int,
                    override val mutableAggBufferOffset: Int = 0,
                    override val inputAggBufferOffset: Int = 0)
      extends TypedImperativeAggregate[Buffer] with ImplicitCastInputTypes {
    require(k > 1, "k must be > 1")

    override def inputTypes: Seq[DataType] = Seq(LongType)
    override def children: Seq[Expression] = Seq(child)
    override def nullable: Boolean = false
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def prettyName: String = "graft_kmv"

    override def createAggregationBuffer(): Buffer = new Buffer()

    override def update(buf: Buffer, input: InternalRow): Buffer = {
      val v = child.eval(input)
      if (v != null) add(buf, v.asInstanceOf[Long])
      buf
    }

    override def merge(buf: Buffer, other: Buffer): Buffer = {
      val it = other.iterator()
      while (it.hasNext) add(buf, it.next().longValue())
      buf
    }

    /** Ascending array of the ≤ k smallest distinct hashes. */
    override def eval(buf: Buffer): Any = {
      val out = new Array[Any](buf.size())
      val it = buf.iterator()
      var i = 0
      while (it.hasNext) { out(i) = it.next().longValue(); i += 1 }
      new GenericArrayData(out)
    }

    override def serialize(buf: Buffer): Array[Byte] = {
      val bos = new ByteArrayOutputStream()
      val out = new DataOutputStream(bos)
      out.writeInt(buf.size())
      val it = buf.iterator()
      while (it.hasNext) out.writeLong(it.next().longValue())
      out.flush(); bos.toByteArray
    }

    override def deserialize(bytes: Array[Byte]): Buffer = {
      val in = ByteBuffer.wrap(bytes)
      val n = in.getInt
      val buf = new Buffer()
      var i = 0
      while (i < n) { buf.add(java.lang.Long.valueOf(in.getLong)); i += 1 }
      buf
    }

    /** Insert, keeping only the k smallest distinct values. Skips the
      * add entirely when the value is ≥ the current k-th smallest — the
      * steady-state fast path once the buffer saturates. */
    private def add(buf: Buffer, v: Long): Unit = {
      if (buf.size() < k) { buf.add(java.lang.Long.valueOf(v)); () }
      else if (v < buf.last().longValue()) {
        if (buf.add(java.lang.Long.valueOf(v))) { buf.pollLast(); () }
      }
    }

    override def withNewMutableAggBufferOffset(o: Int): KmvAgg =
      copy(mutableAggBufferOffset = o)
    override def withNewInputAggBufferOffset(o: Int): KmvAgg =
      copy(inputAggBufferOffset = o)
    override protected def withNewChildrenInternal(
        cs: IndexedSeq[Expression]): KmvAgg = copy(child = cs.head)
  }

  // ------------------------------------------------------------- Column API

  /** array<long>: the k smallest distinct values of (long-typed) `c`,
    * ascending. Feed it a content-stable uniform hash (the md5-60bit
    * idiom) for a deterministic, SQL-replayable distinct sketch. */
  def kmv(c: Column, k: Int): Column =
    GraftBridge.column(KmvAgg(GraftBridge.expression(c), k)
      .toAggregateExpression())
}
