package graft.geo

import java.nio.ByteBuffer

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types._
import org.locationtech.jts.geom.{Envelope, Geometry}
import org.locationtech.jts.operation.union.UnaryUnionOp

/** Geometric aggregates (SURVEY.md §2.4 A7/A8).
  *
  * `TypedImperativeAggregate` gives map-side partial aggregation for free:
  * each task folds its partition locally and only the serialized partial
  * buffer crosses the shuffle — at 100 TB the shuffle carries one geometry /
  * envelope per (group × task), not per row.
  *
  * Union is O(n²) if folded naively (SURVEY §7 "hard parts"); we batch
  * inputs and collapse with JTS `UnaryUnionOp` (cascaded union) every
  * `CollapseAt` geometries, so cost stays O(n log n)-ish and buffer memory
  * stays bounded.
  */
case class StUnionAggr(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[ArrayBuffer[Geometry]] {

  private val CollapseAt = 512

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = true
  override def dataType: DataType = BinaryType
  override def prettyName: String = "st_union_aggr"

  override def createAggregationBuffer(): ArrayBuffer[Geometry] = ArrayBuffer.empty

  private def collapse(buf: ArrayBuffer[Geometry]): Unit = {
    val u = UnaryUnionOp.union(
      scala.jdk.CollectionConverters.BufferHasAsJava(buf).asJava)
    buf.clear()
    if (u != null) buf += u
  }

  override def update(buf: ArrayBuffer[Geometry], input: InternalRow): ArrayBuffer[Geometry] = {
    val v = child.eval(input)
    if (v != null) {
      buf += GeoIO.fromWkb(v.asInstanceOf[Array[Byte]])
      if (buf.size >= CollapseAt) collapse(buf)
    }
    buf
  }

  override def merge(buf: ArrayBuffer[Geometry], other: ArrayBuffer[Geometry]): ArrayBuffer[Geometry] = {
    buf ++= other
    if (buf.size >= CollapseAt) collapse(buf)
    buf
  }

  override def eval(buf: ArrayBuffer[Geometry]): Any =
    if (buf.isEmpty) null
    else {
      collapse(buf)
      GeoIO.toWkb(buf.head)
    }

  override def serialize(buf: ArrayBuffer[Geometry]): Array[Byte] = {
    collapse(buf)
    if (buf.isEmpty) Array.emptyByteArray else GeoIO.toWkb(buf.head)
  }
  override def deserialize(bytes: Array[Byte]): ArrayBuffer[Geometry] =
    if (bytes.isEmpty) ArrayBuffer.empty
    else ArrayBuffer(GeoIO.fromWkb(bytes))

  override def withNewMutableAggBufferOffset(o: Int): StUnionAggr =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): StUnionAggr =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]) =
    copy(child = c.head)
}

/** Extent-as-geometry aggregate: folds envelopes (8 doubles of state, not
  * geometries) — the cheap formulation SURVEY A8 calls for, and the
  * normative `ST_Extent` semantics (engine.py:152-168 MIN/MAX formulation). */
case class StEnvelopeAggr(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Envelope] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = true
  override def dataType: DataType = BinaryType
  override def prettyName: String = "st_envelope_aggr"

  override def createAggregationBuffer(): Envelope = new Envelope()

  override def update(env: Envelope, input: InternalRow): Envelope = {
    val v = child.eval(input)
    if (v != null) {
      env.expandToInclude(
        GeoIO.fromWkb(v.asInstanceOf[Array[Byte]]).getEnvelopeInternal)
    }
    env
  }

  override def merge(env: Envelope, other: Envelope): Envelope = {
    env.expandToInclude(other); env
  }

  override def eval(env: Envelope): Any =
    if (env.isNull) null
    else GeoIO.toWkb(GeoIO.factory.toGeometry(env))

  override def serialize(env: Envelope): Array[Byte] = {
    val bb = ByteBuffer.allocate(32)
    if (env.isNull) bb.putDouble(1).putDouble(-1).putDouble(1).putDouble(-1)
    else bb.putDouble(env.getMinX).putDouble(env.getMaxX)
      .putDouble(env.getMinY).putDouble(env.getMaxY)
    bb.array()
  }
  override def deserialize(bytes: Array[Byte]): Envelope = {
    val bb = ByteBuffer.wrap(bytes)
    val (minX, maxX, minY, maxY) =
      (bb.getDouble, bb.getDouble, bb.getDouble, bb.getDouble)
    if (minX > maxX) new Envelope() else new Envelope(minX, maxX, minY, maxY)
  }

  override def withNewMutableAggBufferOffset(o: Int): StEnvelopeAggr =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): StEnvelopeAggr =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]) =
    copy(child = c.head)
}
