package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftInternal
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** S2 + K11 as a single-pass aggregate: per kafka (topic, partition), the
  * max offset and max record timestamp, maintained in a tiny
  * partition-count-sized buffer.
  *
  * Designed to ride inside `df.observe(...)` on the WRITE job, so offset
  * bookkeeping (`channel/Worker.save:89-101`) and the VTTS inputs
  * (`CommitState.vtts:155-178`) are collected while the batch streams
  * through the writer — no second scan of the batch
  * (the reference's worker also tracks offsets inline on the write path).
  *
  * Output: map<"topic-partition", struct<max_offset long, max_ts long>>
  * with max_ts null when the partition saw no non-null timestamp.
  */
case class OffsetsAgg(
    topic: Expression,
    partition: Expression,
    offset: Expression,
    ts: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0
) extends TypedImperativeAggregate[mutable.HashMap[String, (Long, Long, Boolean)]] {

  override def children: Seq[Expression] = Seq(topic, partition, offset, ts)
  override def nullable: Boolean = false
  override def dataType: DataType = OffsetsAgg.OutType

  // analysis-time rejection: `offset`/`ts` are read numerically — a
  // string-typed column would otherwise pass analysis and die mid-job
  // with an opaque per-row ClassCastException
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    def numeric(e: Expression, what: String): Option[String] = e.dataType match {
      case _: org.apache.spark.sql.types.NumericType => None
      case other => Some(s"$what must be numeric, got ${other.sql}")
    }
    val problems = numeric(offset, "offset").toSeq ++
      (ts.dataType match {
        case _: org.apache.spark.sql.types.NumericType | org.apache.spark.sql.types.NullType =>
          Nil
        case other => Seq(s"ts must be numeric (epoch micros) or null, got ${other.sql}")
      })
    if (problems.isEmpty) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"offsets_agg: ${problems.mkString("; ")}")
  }

  override def createAggregationBuffer(): mutable.HashMap[String, (Long, Long, Boolean)] =
    mutable.HashMap.empty

  override def update(
      buf: mutable.HashMap[String, (Long, Long, Boolean)],
      input: InternalRow
  ): mutable.HashMap[String, (Long, Long, Boolean)] = {
    val t = topic.eval(input)
    val p = partition.eval(input)
    val o = offset.eval(input)
    if (t == null || p == null || o == null) return buf
    val key = s"${t.toString}-${p.toString}"
    val off = OffsetsAgg.toLongValue(o)
    val tsv = ts.eval(input)
    val (hasTs, tsl) =
      if (tsv == null) (false, Long.MinValue) else (true, OffsetsAgg.toLongValue(tsv))
    buf.get(key) match {
      case None => buf(key) = (off, tsl, hasTs)
      case Some((o0, t0, h0)) =>
        buf(key) = (math.max(o0, off), math.max(t0, tsl), h0 || hasTs)
    }
    buf
  }

  override def merge(
      a: mutable.HashMap[String, (Long, Long, Boolean)],
      b: mutable.HashMap[String, (Long, Long, Boolean)]
  ): mutable.HashMap[String, (Long, Long, Boolean)] = {
    b.foreach { case (k, (o1, t1, h1)) =>
      a.get(k) match {
        case None => a(k) = (o1, t1, h1)
        case Some((o0, t0, h0)) => a(k) = (math.max(o0, o1), math.max(t0, t1), h0 || h1)
      }
    }
    a
  }

  override def eval(buf: mutable.HashMap[String, (Long, Long, Boolean)]): Any = {
    val entries = buf.toSeq.sortBy(_._1)
    val keys = new GenericArrayData(entries.map(e => UTF8String.fromString(e._1)).toArray[Any])
    val vals = new GenericArrayData(entries.map { case (_, (o, t, h)) =>
      InternalRow(o, if (h) t else null)
    }.toArray[Any])
    new ArrayBasedMapData(keys, vals)
  }

  override def serialize(buf: mutable.HashMap[String, (Long, Long, Boolean)]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (k, (o, t, h)) =>
      out.writeUTF(k); out.writeLong(o); out.writeLong(t); out.writeBoolean(h)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[String, (Long, Long, Boolean)] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = mutable.HashMap.empty[String, (Long, Long, Boolean)]
    (0 until n).foreach { _ =>
      val k = in.readUTF(); val o = in.readLong(); val t = in.readLong(); val h = in.readBoolean()
      buf(k) = (o, t, h)
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): OffsetsAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): OffsetsAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): OffsetsAgg =
    copy(topic = newChildren(0), partition = newChildren(1), offset = newChildren(2),
      ts = newChildren(3))
}

object OffsetsAgg {
  // DecimalType passes the NumericType gate but Spark's Decimal does NOT
  // implement java.lang.Number — a bare asInstanceOf[Number] would crash
  // per-row on the common DECIMAL(20,0) unsigned-bigint mapping
  private[functions] def toLongValue(v: Any): Long = v match {
    case d: Decimal => d.toLong
    case n: java.lang.Number => n.longValue()
    case other =>
      throw new IllegalArgumentException(
        s"offsets_agg: non-numeric runtime value of ${other.getClass.getName}")
  }

  val OutType: DataType = MapType(
    StringType,
    StructType(Seq(
      StructField("max_offset", LongType, nullable = false),
      StructField("max_ts", LongType, nullable = true))),
    valueContainsNull = false)

  /** Column form for use in `df.observe`. */
  def apply(topic: Column, partition: Column, offset: Column, ts: Column): Column =
    GraftInternal.column(
      new OffsetsAgg(
        GraftInternal.expression(topic),
        GraftInternal.expression(partition),
        GraftInternal.expression(offset),
        GraftInternal.expression(ts)
      ).toAggregateExpression())
}
