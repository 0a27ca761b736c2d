package graft.sources

import org.apache.spark.sql.{DataFrame, DataFrameReader, SparkSession}
import org.apache.spark.sql.types.StructType

/** Format-pluggable table reader, generalizing the reference's
  * `spark.read.format("avro").load(files)` (reference App.java:93-95).
  *
  * Formats are Spark datasource names, so anything on the classpath
  * plugs in. `avro` needs the external spark-avro module jar at deploy
  * time (not shipped in this offline container — parquet/csv/json are
  * the tested paths).
  */
object TableLoader {

  val SupportedFormats: Set[String] = Set("parquet", "csv", "json", "avro", "orc")

  def read(spark: SparkSession, format: String, path: String,
           schema: Option[StructType] = None,
           options: Map[String, String] = Map.empty): DataFrame = {
    require(SupportedFormats.contains(format), s"unsupported format: $format")
    var base: DataFrameReader = spark.read.format(format).options(options)
    // header applies with AND without an explicit schema — otherwise the
    // header line comes back as a data row
    if (format == "csv") base = base.option("header", "true")
    val withSchema = schema.fold {
      // CSV/JSON without an explicit schema would trigger an extra
      // inference scan — fine locally, wasteful at 100 TB; callers
      // should pass a schema for text formats.
      if (format == "csv") base.option("inferSchema", "true") else base
    }(base.schema(_))
    withSchema.load(path)
  }

  /** Explicit file-list variant (the reference lists *.avro files via
    * an HDFS client before loading, App.java:59-84). Spark accepts the
    * multi-path form natively — no manual FS listing layer needed. */
  def readFiles(spark: SparkSession, format: String,
                files: Seq[String]): DataFrame =
    spark.read.format(format).load(files: _*)
}
