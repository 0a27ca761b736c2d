package graft.sources.avro

import java.util.UUID

import scala.jdk.CollectionConverters._

import org.apache.avro.Schema
import org.apache.avro.file.{CodecFactory, DataFileReader, DataFileWriter}
import org.apache.avro.generic.{GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.avro.mapred.FsInput
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriter, DataWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, SupportsTruncate, Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.util.SerializableConfiguration

/** Self-contained Avro datasource (`format("graft-avro")`) built on the
  * Avro core + avro-mapred jars that ship inside Spark's own classpath —
  * no external spark-avro module needed. Generalizes the reference's
  * input path (`spark.read.format("avro")`, reference App.java:93-95)
  * for deployments where the connector jar isn't staged.
  *
  * Scale design:
  *  - **Splittable reads**: each file is carved into byte ranges of
  *    `spark.sql.files.maxPartitionBytes`; a reader seeks to the first
  *    Avro sync marker at-or-after its range start and consumes blocks
  *    until past its range end — the standard container-format split
  *    protocol, so one 10 GB file parallelizes across executors instead
  *    of pinning one task.
  *  - **Column pruning at the IO layer**: `SupportsPushDownRequiredColumns`
  *    feeds a pruned *reader schema* into Avro schema resolution, which
  *    byte-skips the dropped fields during decode — unneeded columns are
  *    never materialized (Avro can't skip IO like parquet, but it skips
  *    the alloc + decode).
  *  - **Staged commit**: writers land task files under a per-query
  *    staging dir; the driver-side commit moves them into place and
  *    (for truncate/overwrite) removes the previous generation — a torn
  *    job never leaves a half-new directory.
  */
class GraftAvroDataSource extends TableProvider with DataSourceRegister {

  override def shortName(): String = "graft-avro"

  override def supportsExternalMetadata(): Boolean = true

  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val spark = SparkSession.active
    val conf = spark.sessionState.newHadoopConf()
    val files = GraftAvro.listFiles(options, conf)
    require(files.nonEmpty, "graft-avro: no .avro files found at " +
      GraftAvro.paths(options).mkString(","))
    val in = new FsInput(new Path(files.head.path), conf)
    try {
      val r = DataFileReader.openReader(in, new GenericDatumReader[GenericRecord]())
      try AvroConverters.toCatalystType(r.getSchema)._1.asInstanceOf[StructType]
      finally r.close()
    } finally in.close()
  }

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: java.util.Map[String, String]): Table =
    new GraftAvroTable(schema, properties)
}

private[avro] case class AvroFileStatus(path: String, len: Long)

private[avro] object GraftAvro {

  /** Paths from the options map: `path` (single) or `paths` (Spark's
    * JSON-array form for `load(paths: _*)`). */
  def paths(options: java.util.Map[String, String]): Seq[String] = {
    val ci = new CaseInsensitiveStringMap(options)
    val multi = Option(ci.get("paths")).map(parseJsonStringArray).getOrElse(Nil)
    val single = Option(ci.get("path")).toSeq
    (single ++ multi).distinct
  }

  /** Minimal parser for Spark's `paths` option (a JSON array of strings
    * with `\`-escapes) — avoids dragging a JSON library into the hot
    * path for what is always a small driver-side list. */
  private def parseJsonStringArray(s: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    val cur = new StringBuilder
    var inStr = false; var esc = false
    s.foreach { c =>
      if (!inStr) { if (c == '"') inStr = true }
      else if (esc) { cur.append(c); esc = false }
      else c match {
        case '\\' => esc = true
        case '"' => out += cur.result(); cur.clear(); inStr = false
        case other => cur.append(other)
      }
    }
    out.result()
  }

  /** Expand each path (file, dir, or glob) to its data files. */
  def listFiles(options: java.util.Map[String, String],
                conf: org.apache.hadoop.conf.Configuration): Seq[AvroFileStatus] =
    paths(options).flatMap { p =>
      val hp = new Path(p)
      val fs = hp.getFileSystem(conf)
      Option(fs.globStatus(hp)).toSeq.flatten.flatMap { st =>
        if (st.isDirectory) fs.listStatus(st.getPath).toSeq else Seq(st)
      }
    }.filter(st => st.getPath.getName.endsWith(".avro") && st.getLen > 0)
      .map(st => AvroFileStatus(st.getPath.toString, st.getLen))
}

private[avro] class GraftAvroTable(tableSchema: StructType,
                                   properties: java.util.Map[String, String])
  extends Table with SupportsRead with SupportsWrite {

  override def name(): String = "graft-avro:" + GraftAvro.paths(properties).mkString(",")

  override def schema(): StructType = tableSchema

  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.BATCH_WRITE,
      TableCapability.TRUNCATE)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new AvroScanBuilder(tableSchema, options)

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new AvroWriteBuilder(info,
      GraftAvro.paths(info.options).headOption.orElse(
        GraftAvro.paths(properties).headOption)
        .getOrElse(throw new IllegalArgumentException("graft-avro: no write path")))
}

// ------------------------------------------------------------------- read

private[avro] class AvroScanBuilder(fullSchema: StructType,
                                    options: CaseInsensitiveStringMap)
  extends ScanBuilder with SupportsPushDownRequiredColumns {

  private var required: StructType = fullSchema

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan = new AvroScan(required, options)
}

private[avro] class AvroScan(required: StructType,
                             options: CaseInsensitiveStringMap) extends Scan with Batch {

  override def readSchema(): StructType = required

  override def toBatch: Batch = this

  override def description(): String =
    s"graft-avro ${GraftAvro.paths(options).mkString(",")} " +
      s"ReadSchema: ${required.simpleString}"

  override def planInputPartitions(): Array[InputPartition] = {
    val spark = SparkSession.active
    val conf = spark.sessionState.newHadoopConf()
    val files = GraftAvro.listFiles(options, conf)
    // Split granularity: the same session knob the file sources honor,
    // overridable per-read for tests; floored so the split bookkeeping
    // can't dominate genuinely tiny files.
    val splitBytes = math.max(16L << 10,
      org.apache.spark.network.util.JavaUtils.byteStringAsBytes(
        Option(options.get("maxPartitionBytes")).getOrElse(
          spark.conf.get("spark.sql.files.maxPartitionBytes", "134217728"))))
    files.flatMap { f =>
      (0L until f.len by splitBytes).map { start =>
        AvroInputPartition(f.path, start, math.min(start + splitBytes, f.len))
      }
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory = {
    val conf = new SerializableConfiguration(
      SparkSession.active.sessionState.newHadoopConf())
    AvroReaderFactory(required, conf)
  }
}

private[avro] case class AvroInputPartition(file: String, start: Long, end: Long)
  extends InputPartition

private[avro] case class AvroReaderFactory(required: StructType,
                                           conf: SerializableConfiguration)
  extends PartitionReaderFactory {

  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new AvroPartitionReader(partition.asInstanceOf[AvroInputPartition], required,
      conf.value)
}

/** Reads the Avro blocks whose first sync marker falls inside
  * [start, end): `sync(start)` seeks to the next block boundary,
  * `pastSync(end)` stops after the range — together every block lands in
  * exactly one partition (the avro-mapred split contract). */
private[avro] class AvroPartitionReader(p: AvroInputPartition,
                                        required: StructType,
                                        conf: org.apache.hadoop.conf.Configuration)
  extends PartitionReader[InternalRow] {

  private val in = new FsInput(new Path(p.file), conf)
  private val datumReader = new GenericDatumReader[GenericRecord]()
  private val reader = DataFileReader.openReader(in, datumReader)
  // Pruned READER schema = the file's record filtered to the required
  // fields; Avro schema resolution then byte-skips everything else.
  private val prunedSchema: Schema = {
    val fileSchema = reader.getSchema
    val fields = required.fields.map { f =>
      val src = fileSchema.getField(f.name)
      require(src != null, s"graft-avro: column ${f.name} not in ${p.file}")
      new Schema.Field(src.name(), src.schema(), null, src.defaultVal())
    }
    Schema.createRecord(fileSchema.getName, null, fileSchema.getNamespace, false,
      fields.toList.asJava)
  }
  datumReader.setExpected(prunedSchema)
  reader.sync(p.start)

  private val toRow = AvroConverters.recordToRow(prunedSchema, required)
  private var current: InternalRow = _
  private var datum: GenericRecord = _ // reused by Avro across next() calls

  override def next(): Boolean =
    if (reader.hasNext && !reader.pastSync(p.end)) {
      datum = reader.next(datum)
      current = toRow(datum)
      true
    } else false

  override def get(): InternalRow = current

  override def close(): Unit = reader.close() // closes the FsInput too
}

// ------------------------------------------------------------------ write

private[avro] class AvroWriteBuilder(info: LogicalWriteInfo, path: String)
  extends WriteBuilder with SupportsTruncate {

  private var doTruncate = false

  override def truncate(): WriteBuilder = { doTruncate = true; this }

  override def build(): Write = new Write {
    override def toBatch: BatchWrite = new AvroBatchWrite(info.schema(), path,
      doTruncate, info.queryId(),
      new SerializableConfiguration(SparkSession.active.sessionState.newHadoopConf()),
      Option(info.options.get("compression")).getOrElse("snappy"))
  }
}

private[avro] case class AvroCommitMessage(staged: Seq[String]) extends WriterCommitMessage

private[avro] class AvroBatchWrite(schema: StructType, path: String,
                                   truncate: Boolean, queryId: String,
                                   conf: SerializableConfiguration,
                                   codec: String) extends BatchWrite {

  private val stagingDir = s"$path/.graft-staging-$queryId"

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    AvroWriterFactory(schema, stagingDir, conf, codec)

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val fs = new Path(path).getFileSystem(conf.value)
    val dest = new Path(path)
    fs.mkdirs(dest)
    val previous =
      if (truncate) fs.listStatus(dest).filter(st =>
        st.isFile && st.getPath.getName.endsWith(".avro")).map(_.getPath)
      else Array.empty[Path]
    for (m <- messages; staged <- m.asInstanceOf[AvroCommitMessage].staged) {
      val sp = new Path(staged)
      fs.rename(sp, new Path(dest, sp.getName))
    }
    previous.foreach(fs.delete(_, false))
    fs.delete(new Path(stagingDir), true)
    fs.create(new Path(dest, "_SUCCESS"), true).close()
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = {
    val fs = new Path(path).getFileSystem(conf.value)
    fs.delete(new Path(stagingDir), true)
  }
}

private[avro] case class AvroWriterFactory(schema: StructType, stagingDir: String,
                                           conf: SerializableConfiguration,
                                           codec: String) extends DataWriterFactory {

  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new AvroDataWriter(schema, stagingDir, partitionId, taskId, conf.value, codec)
}

private[avro] class AvroDataWriter(schema: StructType, stagingDir: String,
                                   partitionId: Int, taskId: Long,
                                   conf: org.apache.hadoop.conf.Configuration,
                                   codec: String) extends DataWriter[InternalRow] {

  private val avroSchema = AvroConverters.toAvroSchema(schema)
  private val toRecord = AvroConverters.rowToRecord(schema, avroSchema)
  private val file = new Path(stagingDir,
    f"part-$partitionId%05d-$taskId-${UUID.randomUUID.toString.take(8)}.avro")
  private val fs: FileSystem = file.getFileSystem(conf)
  private val writer = {
    val w = new DataFileWriter(new GenericDatumWriter[GenericRecord](avroSchema))
    w.setCodec(codec match {
      case "snappy" => CodecFactory.snappyCodec()
      case "deflate" => CodecFactory.deflateCodec(CodecFactory.DEFAULT_DEFLATE_LEVEL)
      case "null" | "none" | "uncompressed" => CodecFactory.nullCodec()
      case other => CodecFactory.fromString(other)
    })
    w.create(avroSchema, fs.create(file, true))
  }

  override def write(row: InternalRow): Unit = writer.append(toRecord(row))

  override def commit(): WriterCommitMessage = {
    writer.close()
    AvroCommitMessage(Seq(file.toString))
  }

  override def abort(): Unit = {
    writer.close()
    fs.delete(file, false)
  }

  override def close(): Unit = ()
}
