package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Count-Min sketch (Cormode & Muthukrishnan, J.Alg'05) as a native
  * mergeable aggregate — the POINT-FREQUENCY companion of the sketch
  * family: HLL/KMV answer "how many distinct", Misra–Gries answers
  * "which items are frequent", CMS answers "how often does THIS item
  * occur" for any item, with a one-sided error (never underestimates;
  * overestimate ≤ εN with prob 1−δ for w = ⌈e/ε⌉, d = ⌈ln 1/δ⌉).
  *
  * The buffer is the d×w counter matrix flattened row-major into
  * Array[Long]; partial buffers merge by element-wise addition, so the
  * sketch is partition- and merge-tree-INDEPENDENT — fully
  * deterministic for a given input multiset, which is what lets
  * `q_cms_counts` replay the exact bucket sums in SQL and match
  * value-for-value.
  *
  * The d row-hashes are BIT SLICES of one caller-supplied uniform hash
  * (the md5-60bit idiom): row i buckets on bits [12i, 12i+log2(w)).
  * That trades the pairwise-independence premise of the formal CMS
  * bound for a single hash computation per row and exact SQL
  * replayability; with a cryptographic source hash the slices are
  * independent in practice. d·12 must fit the 60 supplied bits.
  *
  * At 100 TB: per-group shuffle cost is the fixed d·w longs (128 KiB
  * at 4×4096) regardless of corpus size or key cardinality — vs the
  * (group, token)-sized exact count shuffle; estimates for ANY token
  * are O(d) array lookups on the emitted sketch.
  */
object CmsSketch {

  case class CmsAgg(child: Expression, depth: Int, width: Int,
                    override val mutableAggBufferOffset: Int = 0,
                    override val inputAggBufferOffset: Int = 0)
      extends TypedImperativeAggregate[Array[Long]]
      with ImplicitCastInputTypes {
    require(depth >= 1 && depth * 12 <= 60,
      "depth must be in [1,5]: each row consumes 12 bits of the 60-bit hash")
    require(width >= 2 && (width & (width - 1)) == 0 && width <= 4096,
      "width must be a power of two <= 4096 (12 usable bits per row)")

    override def inputTypes: Seq[DataType] = Seq(LongType)
    override def children: Seq[Expression] = Seq(child)
    override def nullable: Boolean = false
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def prettyName: String = "graft_cms"

    override def createAggregationBuffer(): Array[Long] =
      new Array[Long](depth * width)

    override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
      val v = child.eval(input)
      if (v != null) {
        val h = v.asInstanceOf[Long]
        var i = 0
        while (i < depth) {
          buf(i * width + (((h >>> (i * 12)) & (width - 1)).toInt)) += 1L
          i += 1
        }
      }
      buf
    }

    override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
      var i = 0
      while (i < buf.length) { buf(i) += other(i); i += 1 }
      buf
    }

    /** Row-major d×w counter matrix. Estimate for hash h:
      * min over i of sketch[i·w + ((h >>> 12i) & (w−1))]. */
    override def eval(buf: Array[Long]): Any = {
      val out = new Array[Any](buf.length)
      var i = 0
      while (i < buf.length) { out(i) = buf(i); i += 1 }
      new GenericArrayData(out)
    }

    override def serialize(buf: Array[Long]): Array[Byte] = {
      val bb = ByteBuffer.allocate(buf.length * 8)
      var i = 0
      while (i < buf.length) { bb.putLong(buf(i)); i += 1 }
      bb.array()
    }

    override def deserialize(bytes: Array[Byte]): Array[Long] = {
      val bb = ByteBuffer.wrap(bytes)
      val buf = new Array[Long](bytes.length / 8)
      var i = 0
      while (i < buf.length) { buf(i) = bb.getLong; i += 1 }
      buf
    }

    override def withNewMutableAggBufferOffset(o: Int): CmsAgg =
      copy(mutableAggBufferOffset = o)
    override def withNewInputAggBufferOffset(o: Int): CmsAgg =
      copy(inputAggBufferOffset = o)
    override protected def withNewChildrenInternal(
        cs: IndexedSeq[Expression]): CmsAgg = copy(child = cs.head)
  }

  // ------------------------------------------------------------- Column API

  /** array<long> of d·w counters (row-major). Feed a content-stable
    * uniform 60-bit hash (the md5-60bit idiom). */
  def cms(c: Column, depth: Int, width: Int): Column =
    GraftBridge.column(CmsAgg(GraftBridge.expression(c), depth, width)
      .toAggregateExpression())
}
