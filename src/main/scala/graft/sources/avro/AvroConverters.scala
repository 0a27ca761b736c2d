package graft.sources.avro

import java.math.BigInteger
import java.nio.ByteBuffer

import scala.jdk.CollectionConverters._

import org.apache.avro.{LogicalTypes, Schema}
import org.apache.avro.Schema.Type
import org.apache.avro.generic.{GenericData, GenericFixed, GenericRecord}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData, ArrayData, MapData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Avro ⇄ Catalyst schema and value conversion for the self-contained
  * avro datasource (see [[GraftAvroDataSource]]). Covers the Avro types
  * a Spark table round-trips through: all primitives, string, bytes,
  * fixed, enum, arrays, string-keyed maps, nested records, and
  * `union[null, T]` nullability, plus the date / timestamp-millis /
  * timestamp-micros / local-timestamp / decimal logical types.
  * Multi-branch unions (beyond null) are deliberately unsupported —
  * they have no faithful Catalyst shape.
  */
object AvroConverters {

  // ---------------------------------------------------------------- schema

  /** Catalyst struct → Avro record schema (the write-side mapping).
    * Timestamps become `timestamp-micros` (Catalyst's native precision),
    * dates `date`-logical ints, decimals `decimal`-logical bytes. */
  def toAvroSchema(st: StructType, recordName: String = "topLevelRecord",
                   namespace: String = "graft.avro"): Schema = {
    val fields = st.fields.map { f =>
      new Schema.Field(f.name, toAvroField(f.dataType, f.nullable, f.name, namespace),
        null, if (f.nullable) Schema.Field.NULL_DEFAULT_VALUE else null)
    }
    Schema.createRecord(recordName, null, namespace, false, fields.toList.asJava)
  }

  private def toAvroField(dt: DataType, nullable: Boolean, name: String,
                          ns: String): Schema = {
    val base = dt match {
      case BooleanType => Schema.create(Type.BOOLEAN)
      case IntegerType | ShortType | ByteType => Schema.create(Type.INT)
      case LongType => Schema.create(Type.LONG)
      case FloatType => Schema.create(Type.FLOAT)
      case DoubleType => Schema.create(Type.DOUBLE)
      case StringType => Schema.create(Type.STRING)
      case BinaryType => Schema.create(Type.BYTES)
      case DateType => LogicalTypes.date().addToSchema(Schema.create(Type.INT))
      case TimestampType =>
        LogicalTypes.timestampMicros().addToSchema(Schema.create(Type.LONG))
      case TimestampNTZType =>
        LogicalTypes.localTimestampMicros().addToSchema(Schema.create(Type.LONG))
      case d: DecimalType =>
        LogicalTypes.decimal(d.precision, d.scale).addToSchema(Schema.create(Type.BYTES))
      case ArrayType(et, containsNull) =>
        Schema.createArray(toAvroField(et, containsNull, name, ns))
      case MapType(StringType, vt, valueContainsNull) =>
        Schema.createMap(toAvroField(vt, valueContainsNull, name, ns))
      case st: StructType => toAvroSchema(st, name, ns + "." + name)
      case other => throw new UnsupportedOperationException(
        s"graft-avro cannot write Catalyst type $other (field $name)")
    }
    if (nullable) Schema.createUnion(Schema.create(Type.NULL), base) else base
  }

  /** Avro schema → (Catalyst type, nullable). */
  def toCatalystType(s: Schema): (DataType, Boolean) = s.getType match {
    case Type.UNION =>
      val (branches, nulls) = s.getTypes.asScala.partition(_.getType != Type.NULL)
      if (branches.size != 1) throw new UnsupportedOperationException(
        s"graft-avro cannot read multi-branch union $s")
      (toCatalystType(branches.head)._1, nulls.nonEmpty)
    case Type.BOOLEAN => (BooleanType, false)
    case Type.INT => s.getLogicalType match {
      case _: LogicalTypes.Date => (DateType, false)
      case _ => (IntegerType, false)
    }
    case Type.LONG => s.getLogicalType match {
      case _: LogicalTypes.TimestampMillis | _: LogicalTypes.TimestampMicros =>
        (TimestampType, false)
      case _: LogicalTypes.LocalTimestampMillis | _: LogicalTypes.LocalTimestampMicros =>
        (TimestampNTZType, false)
      case _ => (LongType, false)
    }
    case Type.FLOAT => (FloatType, false)
    case Type.DOUBLE => (DoubleType, false)
    case Type.STRING | Type.ENUM => (StringType, false)
    case Type.BYTES | Type.FIXED => s.getLogicalType match {
      case d: LogicalTypes.Decimal => (DecimalType(d.getPrecision, d.getScale), false)
      case _ => (BinaryType, false)
    }
    case Type.ARRAY =>
      val (et, n) = toCatalystType(s.getElementType)
      (ArrayType(et, n), false)
    case Type.MAP =>
      val (vt, n) = toCatalystType(s.getValueType)
      (MapType(StringType, vt, n), false)
    case Type.RECORD =>
      val fields = s.getFields.asScala.map { f =>
        val (dt, n) = toCatalystType(f.schema())
        StructField(f.name(), dt, n)
      }
      (StructType(fields.toSeq), false)
    case other => throw new UnsupportedOperationException(
      s"graft-avro cannot read Avro type $other")
  }

  /** The non-null branch of a `union[null, T]`, or the schema itself. */
  private def nonNull(s: Schema): Schema =
    if (s.getType == Type.UNION) s.getTypes.asScala.find(_.getType != Type.NULL).get
    else s

  // ---------------------------------------------------------------- read

  /** Per-datum converter Avro runtime value → Catalyst internal value. */
  def avroToCatalyst(avro: Schema, dt: DataType): Any => Any = {
    val s = nonNull(avro)
    val conv: Any => Any = (s.getType, dt) match {
      case (Type.BOOLEAN, BooleanType) | (Type.FLOAT, FloatType) |
           (Type.DOUBLE, DoubleType) | (Type.INT, IntegerType) |
           (Type.INT, DateType) | (Type.LONG, LongType) => identity
      case (Type.LONG, TimestampType) | (Type.LONG, TimestampNTZType) =>
        s.getLogicalType match {
          case _: LogicalTypes.TimestampMillis | _: LogicalTypes.LocalTimestampMillis =>
            v => v.asInstanceOf[Long] * 1000L
          case _ => identity
        }
      case (Type.STRING, StringType) | (Type.ENUM, StringType) =>
        v => UTF8String.fromString(v.toString)
      case (Type.BYTES, BinaryType) => v => byteBufferToBytes(v)
      case (Type.FIXED, BinaryType) => v => v.asInstanceOf[GenericFixed].bytes().clone()
      case (Type.BYTES, d: DecimalType) =>
        v => Decimal(new java.math.BigDecimal(
          new BigInteger(byteBufferToBytes(v)), d.scale), d.precision, d.scale)
      case (Type.FIXED, d: DecimalType) =>
        v => Decimal(new java.math.BigDecimal(
          new BigInteger(v.asInstanceOf[GenericFixed].bytes()), d.scale),
          d.precision, d.scale)
      case (Type.ARRAY, ArrayType(et, _)) =>
        val ec = avroToCatalyst(s.getElementType, et)
        v => new GenericArrayData(
          v.asInstanceOf[java.util.Collection[Any]].asScala.map(ec).toArray)
      case (Type.MAP, MapType(StringType, vt, _)) =>
        val vc = avroToCatalyst(s.getValueType, vt)
        v => {
          val m = v.asInstanceOf[java.util.Map[Any, Any]].asScala
          ArrayBasedMapData(
            m.keys.map(k => UTF8String.fromString(k.toString)).toArray,
            m.values.map(vc).toArray)
        }
      case (Type.RECORD, st: StructType) => recordToRow(s, st).asInstanceOf[Any => Any]
      case (a, c) => throw new UnsupportedOperationException(
        s"graft-avro cannot convert Avro $a to Catalyst $c")
    }
    v => if (v == null) null else conv(v)
  }

  /** GenericRecord → InternalRow for struct `st`, matching fields by name
    * against record schema `s` (so a pruned/reordered reader schema works). */
  def recordToRow(s: Schema, st: StructType): Any => InternalRow = {
    val converters = st.fields.map { f =>
      val af = s.getField(f.name)
      require(af != null, s"field ${f.name} missing from Avro schema $s")
      (af.pos(), avroToCatalyst(af.schema(), f.dataType))
    }
    v => {
      val rec = v.asInstanceOf[GenericRecord]
      val out = new Array[Any](converters.length)
      var i = 0
      while (i < converters.length) {
        out(i) = converters(i)._2(rec.get(converters(i)._1))
        i += 1
      }
      new GenericInternalRow(out)
    }
  }

  private def byteBufferToBytes(v: Any): Array[Byte] = v match {
    case bb: ByteBuffer =>
      val b = new Array[Byte](bb.remaining()); bb.duplicate().get(b); b
    case arr: Array[Byte] => arr
  }

  // ---------------------------------------------------------------- write

  /** Per-datum converter Catalyst internal value → Avro runtime value. */
  def catalystToAvro(dt: DataType, avro: Schema): Any => Any = {
    val s = nonNull(avro)
    val conv: Any => Any = dt match {
      case BooleanType | IntegerType | LongType | FloatType | DoubleType |
           DateType | TimestampType | TimestampNTZType => identity
      case StringType => v => v.asInstanceOf[UTF8String].toString
      case BinaryType => v => ByteBuffer.wrap(v.asInstanceOf[Array[Byte]])
      case _: DecimalType =>
        v => ByteBuffer.wrap(
          v.asInstanceOf[Decimal].toJavaBigDecimal.unscaledValue().toByteArray)
      case ArrayType(et, _) =>
        val ec = catalystToAvro(et, s.getElementType)
        v => {
          val arr = v.asInstanceOf[ArrayData]
          val out = new java.util.ArrayList[Any](arr.numElements())
          var i = 0
          while (i < arr.numElements()) {
            val e = arr.get(i, et)
            out.add(if (e == null) null else ec(e)); i += 1
          }
          out
        }
      case MapType(StringType, vt, _) =>
        val vc = catalystToAvro(vt, s.getValueType)
        v => {
          val m = v.asInstanceOf[MapData]
          val out = new java.util.HashMap[String, Any](m.numElements())
          val ks = m.keyArray(); val vs = m.valueArray()
          var i = 0
          while (i < m.numElements()) {
            val mv = vs.get(i, vt)
            out.put(ks.getUTF8String(i).toString, if (mv == null) null else vc(mv))
            i += 1
          }
          out
        }
      case st: StructType => rowToRecord(st, s).asInstanceOf[Any => Any]
      case other => throw new UnsupportedOperationException(
        s"graft-avro cannot write Catalyst type $other")
    }
    v => if (v == null) null else conv(v)
  }

  /** InternalRow → GenericRecord for record schema `s` (write side). */
  def rowToRecord(st: StructType, s: Schema): Any => GenericRecord = {
    val converters = st.fields.zipWithIndex.map { case (f, i) =>
      val af = s.getFields.get(i)
      (f.dataType, catalystToAvro(f.dataType, af.schema()))
    }
    v => {
      val row = v.asInstanceOf[InternalRow]
      val rec = new GenericData.Record(s)
      var i = 0
      while (i < converters.length) {
        val (fdt, c) = converters(i)
        rec.put(i, if (row.isNullAt(i)) null else c(row.get(i, fdt)))
        i += 1
      }
      rec
    }
  }
}
