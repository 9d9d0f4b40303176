package graft.serializers

import java.io.ByteArrayOutputStream
import java.nio.channels.Channels

import scala.jdk.CollectionConverters._

import org.apache.arrow.memory.RootAllocator
import org.apache.arrow.vector._
import org.apache.arrow.vector.ipc.ArrowStreamWriter
import org.apache.arrow.vector.types.{FloatingPointPrecision, TimeUnit => ATimeUnit}
import org.apache.arrow.vector.types.pojo.{ArrowType, Field => AField, FieldType, Schema => ASchema}
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** Arrow IPC stream sink (F4, formatters/geoarrow.py:18-40): a result page
  * as one `application/vnd.apache.arrow.stream` payload, built with the
  * public arrow-vector API (on the Spark classpath). */
object ArrowIpc {

  private def arrowType(dt: DataType): ArrowType = dt match {
    case StringType => ArrowType.Utf8.INSTANCE
    case IntegerType => new ArrowType.Int(32, true)
    case ShortType => new ArrowType.Int(16, true)
    case LongType => new ArrowType.Int(64, true)
    case FloatType => new ArrowType.FloatingPoint(FloatingPointPrecision.SINGLE)
    case DoubleType => new ArrowType.FloatingPoint(FloatingPointPrecision.DOUBLE)
    case BooleanType => ArrowType.Bool.INSTANCE
    case BinaryType => ArrowType.Binary.INSTANCE
    case DateType => new ArrowType.Date(org.apache.arrow.vector.types.DateUnit.DAY)
    case _: TimestampType => new ArrowType.Timestamp(ATimeUnit.MICROSECOND, "UTC")
    case other => throw new IllegalArgumentException(s"unsupported type: $other")
  }

  def serialize(rows: Seq[Row], schema: StructType): Array[Byte] = {
    val allocator = new RootAllocator()
    try {
      val fields = schema.fields.map(f =>
        new AField(f.name, FieldType.nullable(arrowType(f.dataType)), null)).toList
      val root = VectorSchemaRoot.create(new ASchema(fields.asJava), allocator)
      try {
        root.allocateNew()
        rows.zipWithIndex.foreach { case (row, i) =>
          schema.fields.zipWithIndex.foreach { case (f, c) =>
            val vec = root.getVector(c)
            val v = row.get(c)
            if (v == null) vec.asInstanceOf[FieldVector] match {
              case fv: BaseFixedWidthVector => fv.setNull(i)
              case fv: BaseVariableWidthVector => fv.setNull(i)
              case fv => fv.setNull(i)
            } else (f.dataType, vec) match {
              case (StringType, x: VarCharVector) =>
                x.setSafe(i, v.toString.getBytes("UTF-8"))
              case (IntegerType, x: IntVector) => x.setSafe(i, v.asInstanceOf[Int])
              case (ShortType, x: SmallIntVector) => x.setSafe(i, v.asInstanceOf[Short])
              case (LongType, x: BigIntVector) => x.setSafe(i, v.asInstanceOf[Long])
              case (FloatType, x: Float4Vector) => x.setSafe(i, v.asInstanceOf[Float])
              case (DoubleType, x: Float8Vector) => x.setSafe(i, v.asInstanceOf[Double])
              case (BooleanType, x: BitVector) =>
                x.setSafe(i, if (v.asInstanceOf[Boolean]) 1 else 0)
              case (BinaryType, x: VarBinaryVector) =>
                x.setSafe(i, v.asInstanceOf[Array[Byte]])
              case (DateType, x: DateDayVector) =>
                x.setSafe(i, v.asInstanceOf[java.sql.Date].toLocalDate.toEpochDay.toInt)
              case (_: TimestampType, x: TimeStampMicroTZVector) =>
                x.setSafe(i, v.asInstanceOf[java.sql.Timestamp].getTime * 1000L)
              case (dt, x) => throw new IllegalArgumentException(s"$dt -> ${x.getClass}")
            }
          }
        }
        root.setRowCount(rows.size)
        val out = new ByteArrayOutputStream()
        val writer = new ArrowStreamWriter(root, null, Channels.newChannel(out))
        writer.start(); writer.writeBatch(); writer.end(); writer.close()
        out.toByteArray
      } finally root.close()
    } finally allocator.close()
  }
}
