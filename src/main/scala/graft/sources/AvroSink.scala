package graft.sources

import org.apache.avro.Schema
import org.apache.avro.generic.{GenericData, GenericRecord}
import org.apache.avro.mapred.AvroKey
import org.apache.avro.mapreduce.{AvroJob, AvroKeyInputFormat, AvroKeyOutputFormat}
import org.apache.hadoop.io.NullWritable
import org.apache.hadoop.mapreduce.Job
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** REAL Avro container-file sink/source built directly on avro-core +
  * avro-mapred (both ship in Spark's own jars directory — no
  * spark-avro needed). Closes the reference's `WriteToAvro` surface
  * (e.g. qalert_requests_dataflow.py:145-146) with genuine `.avro`
  * object-container files:
  *
  *  - the write goes through `AvroKeyOutputFormat` +
  *    `saveAsNewAPIHadoopFile`, so it inherits the Hadoop commit
  *    protocol (task-attempt temp dirs, atomic task commit, _SUCCESS
  *    marker) — retry- and speculation-safe like Spark's own file
  *    sinks, on any Hadoop FileSystem;
  *  - records never shuffle: Row → GenericRecord conversion happens
  *    map-side inside the single write stage (GenericRecord is not
  *    serializable, and never needs to be);
  *  - the schema is the reference's flat shape — every field a
  *    `["null", T]` union with null default ([[structToAvsc]]),
  *    validated/conformed first when a declared schema is supplied.
  */
object AvroSink {

  private val AvroName = "[A-Za-z_][A-Za-z0-9_]*".r

  /** Spark StructType → flat nullable Avro record schema JSON (every
    * field `["null", T]` with null default — the reference's avsc
    * envelope; conv_avsc_to_bq_schema gcs_utils.py:249-268).
    */
  def structToAvsc(schema: StructType, recordName: String = "graft_record"): String = {
    def avroType(dt: DataType): String = dt match {
      case StringType                        => "\"string\""
      case LongType                          => "\"long\""
      case IntegerType | ShortType | ByteType => "\"int\""
      case DoubleType                        => "\"double\""
      case FloatType                         => "\"float\""
      case BooleanType                       => "\"boolean\""
      case BinaryType                        => "\"bytes\""
      case TimestampType => "{\"type\":\"long\",\"logicalType\":\"timestamp-micros\"}"
      case DateType      => "{\"type\":\"int\",\"logicalType\":\"date\"}"
      case _: DecimalType => "\"string\"" // reference degrades decimals to string
      case other => throw new IllegalArgumentException(
        s"unsupported type for the flat Avro envelope: $other — flatten/serialize " +
          "(to_json, array_join, ...) before the Avro stage; silent toString " +
          "encoding would write engine-runtime garbage")
    }
    require(AvroName.matches(recordName), s"invalid Avro record name: $recordName")
    schema.fields.foreach(f => require(AvroName.matches(f.name),
      s"field '${f.name}' is not a valid Avro name — rename before the Avro stage"))
    val fields = schema.fields.map(f =>
      s"""{"name":"${f.name}","type":["null",${avroType(f.dataType)}],"default":null}""")
      .mkString(",")
    s"""{"type":"record","name":"$recordName","fields":[$fields]}"""
  }

  /** One Spark value → the Avro-generic value the schema expects. */
  private def toAvro(v: Any, dt: DataType): AnyRef = v match {
    case null => null
    case _ => dt match {
      case StringType  => v.toString
      case LongType    => java.lang.Long.valueOf(v.asInstanceOf[Number].longValue())
      case IntegerType | ShortType | ByteType =>
        java.lang.Integer.valueOf(v.asInstanceOf[Number].intValue())
      case DoubleType  => java.lang.Double.valueOf(v.asInstanceOf[Number].doubleValue())
      case FloatType   => java.lang.Float.valueOf(v.asInstanceOf[Number].floatValue())
      case BooleanType => java.lang.Boolean.valueOf(v.asInstanceOf[Boolean])
      case BinaryType  => java.nio.ByteBuffer.wrap(v.asInstanceOf[Array[Byte]])
      case TimestampType => v match {
        // both external representations, so the write works regardless
        // of spark.sql.datetime.java8API.enabled
        case ts: java.sql.Timestamp =>
          java.lang.Long.valueOf(ts.getTime * 1000L + (ts.getNanos / 1000) % 1000)
        case i: java.time.Instant =>
          java.lang.Long.valueOf(i.getEpochSecond * 1000000L + i.getNano / 1000)
        case other => throw new IllegalArgumentException(s"not a timestamp: $other")
      }
      case DateType => v match {
        case d: java.sql.Date       => java.lang.Integer.valueOf(d.toLocalDate.toEpochDay.toInt)
        case ld: java.time.LocalDate => java.lang.Integer.valueOf(ld.toEpochDay.toInt)
        case other => throw new IllegalArgumentException(s"not a date: $other")
      }
      case _: DecimalType => v.toString
      case other => throw new IllegalArgumentException(
        s"unsupported type for the flat Avro envelope: $other")
    }
  }

  /** Write `df` as Avro object-container files at `path` (overwrite).
    * When `schema` is given, the frame is conformed to it first —
    * the reference's schema-validated Avro stage.
    */
  def writeAvro(df: DataFrame, path: String,
                schema: Option[StructType] = None,
                recordName: String = "graft_record"): Unit = {
    val out = schema.fold(df)(SchemaRegistry.conformToSchema(df, _))
    val sparkSchema = out.schema
    val avsc = structToAvsc(sparkSchema, recordName)
    val spark = out.sparkSession
    val hconf = spark.sparkContext.hadoopConfiguration
    val p  = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(hconf)
    val job = Job.getInstance(hconf)
    AvroJob.setOutputKeySchema(job, new Schema.Parser().parse(avsc))
    val fields = sparkSchema.fields
    // write-new-then-swap: the job lands in a temp sibling first, so a
    // mid-job failure leaves any previous output at `path` intact (the
    // Hadoop commit protocol gives task-level atomicity only — a naive
    // delete-then-write loses the old data on job failure)
    val tmp = new org.apache.hadoop.fs.Path(
      p.getParent, p.getName + ".inprogress")
    if (fs.exists(tmp) && !fs.delete(tmp, true))
      throw new java.io.IOException(s"could not clear $tmp")
    out.rdd.mapPartitions { rows =>
      // Schema objects are not serializable: re-parse once per task
      val taskSchema = new Schema.Parser().parse(avsc)
      rows.map { row =>
        val rec = new GenericData.Record(taskSchema)
        var i = 0
        while (i < fields.length) {
          rec.put(i, toAvro(row.get(i), fields(i).dataType))
          i += 1
        }
        (new AvroKey[GenericRecord](rec), NullWritable.get())
      }
    }.saveAsNewAPIHadoopFile(tmp.toString,
      classOf[AvroKey[GenericRecord]], classOf[NullWritable],
      classOf[AvroKeyOutputFormat[GenericRecord]], job.getConfiguration)
    if (fs.exists(p) && !fs.delete(p, true))
      throw new java.io.IOException(s"could not overwrite $path")
    if (!fs.rename(tmp, p))
      throw new java.io.IOException(s"rename $tmp -> $p failed")
  }

  /** Reverse mapping for [[readAvro]]: the flat envelope back to Spark
    * types (unions drop null; logical timestamp-micros/date restore
    * their Spark types).
    */
  private def avroToSpark(s: Schema): DataType = {
    val t = if (s.getType == Schema.Type.UNION) {
      val nonNull = s.getTypes.stream
        .filter(_.getType != Schema.Type.NULL).toArray(new Array[Schema](_))
      // the flat envelope is ["null", T]; a wider union has no single
      // Spark type — mistyping it silently would transpose values
      require(nonNull.length == 1,
        s"unsupported multi-branch union $s — only [null, T] unions are flat")
      nonNull.head
    } else s
    t.getType match {
      case Schema.Type.STRING  => StringType
      case Schema.Type.LONG =>
        if (t.getLogicalType != null && t.getLogicalType.getName == "timestamp-micros")
          TimestampType else LongType
      case Schema.Type.INT =>
        if (t.getLogicalType != null && t.getLogicalType.getName == "date")
          DateType else IntegerType
      case Schema.Type.DOUBLE  => DoubleType
      case Schema.Type.FLOAT   => FloatType
      case Schema.Type.BOOLEAN => BooleanType
      case Schema.Type.BYTES   => BinaryType
      case _                   => StringType
    }
  }

  /** Read Avro container files written by [[writeAvro]] (or any flat
    * `["null", T]`-union Avro drop). The schema comes from the first
    * file's header (driver-side, one open); records are read BY FIELD
    * NAME, so part files sharing field names in a different order
    * still land in the right columns (a field absent from some file
    * reads as null). Records are converted to Rows map-side within
    * the read stage; timestamps/dates honor
    * `spark.sql.datetime.java8API.enabled`.
    */
  def readAvro(spark: SparkSession, path: String): DataFrame = {
    val hconf = spark.sparkContext.hadoopConfiguration
    val p  = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(hconf)
    val first = fs.listStatus(p).map(_.getPath)
      .filter(_.getName.endsWith(".avro")).sortBy(_.getName).headOption
      .getOrElse(throw new java.io.FileNotFoundException(s"no .avro files under $path"))
    val headerSchema = {
      val in = fs.open(first)
      try {
        val r = new org.apache.avro.file.DataFileStream(in,
          new org.apache.avro.generic.GenericDatumReader[GenericRecord]())
        try r.getSchema finally r.close()
      } finally in.close()
    }
    val sparkFields = headerSchema.getFields
    val structType = StructType(sparkFields.toArray(Array.empty[Schema.Field]).map(f =>
      StructField(f.name, avroToSpark(f.schema), nullable = true)))
    val fieldTypes = structType.fields.map(_.dataType)
    val fieldNames = structType.fields.map(_.name)
    val java8 = spark.conf.get("spark.sql.datetime.java8API.enabled", "false") == "true"
    val rows = spark.sparkContext.newAPIHadoopFile(
        path + "/*.avro",
        classOf[AvroKeyInputFormat[GenericRecord]],
        classOf[AvroKey[GenericRecord]], classOf[NullWritable], hconf)
      .mapPartitions(_.map { case (k, _) =>
        val rec = k.datum()
        Row.fromSeq(fieldTypes.indices.map { i =>
          // name-based lookup: robust to part files whose fields share
          // names but not positions; an absent field reads as null
          val v = if (rec.getSchema.getField(fieldNames(i)) == null) null
            else rec.get(fieldNames(i))
          (v, fieldTypes(i)) match {
            case (null, _) => null
            case (v, StringType)  => v.toString
            case (v, BinaryType)  =>
              val bb = v.asInstanceOf[java.nio.ByteBuffer]
              val arr = new Array[Byte](bb.remaining()); bb.duplicate().get(arr); arr
            case (v, TimestampType) =>
              val micros = v.asInstanceOf[java.lang.Long].longValue()
              if (java8)
                java.time.Instant.ofEpochSecond(Math.floorDiv(micros, 1000000L),
                  Math.floorMod(micros, 1000000L) * 1000L)
              else {
                val ts = new java.sql.Timestamp(Math.floorDiv(micros, 1000L))
                ts.setNanos((Math.floorMod(micros, 1000000L) * 1000L).toInt)
                ts
              }
            case (v, DateType) =>
              val ld = java.time.LocalDate.ofEpochDay(
                v.asInstanceOf[java.lang.Integer].longValue())
              if (java8) ld else java.sql.Date.valueOf(ld)
            case (v, _) => v
          }
        })
      })
    spark.createDataFrame(rows, structType)
  }
}
