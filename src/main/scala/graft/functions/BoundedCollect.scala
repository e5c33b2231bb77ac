package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Aggregation buffer: the TRUE group count plus at most `cap` member
  * values — the memory guard is the point, so the buffer never grows
  * past the cap no matter how hot the group is. */
final class BoundedCollectBuffer(var n: Long, val items: ArrayBuffer[InternalRow])

/** bounded_collect(struct, cap) → struct<n: bigint, members: array<struct>>:
  * collect_list with a hard size cap plus an exact count — the
  * candidate-generation primitive for LSH banding. A plain
  * collect_list materializes a web-scale boilerplate bucket (millions
  * of near-identical rows sharing one band signature) in a single
  * executor buffer before any size gate can drop it; the previous
  * workaround — aggregate counts first, semi-join the safe keys, then
  * collect — kept memory bounded but paid the banding scan + signature
  * kernel TWICE. This aggregate does it in ONE pass: `n` counts every
  * row, `members` stops appending at `cap`, so an oversized bucket
  * costs O(cap) memory and is identified by `n` alone. Plans through
  * ObjectHashAggregate with partial aggregation — partial buffers merge
  * by summing counts and topping up members to the cap, so map-side
  * combining still shrinks the shuffle.
  *
  * Contract: callers must size `cap` ABOVE their acceptance threshold
  * (cap = MaxBucket + 1): a group with n ≤ MaxBucket < cap is complete,
  * and a group with n > MaxBucket is dropped without its members ever
  * having been fully buffered.
  */
case class BoundedCollect(
    child: Expression,
    cap: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[BoundedCollectBuffer] with UnaryLike[Expression] {

  require(cap > 0, "cap must be positive")
  private def childStruct: StructType = child.dataType.asInstanceOf[StructType]

  override def nullable: Boolean = false
  override def dataType: DataType = StructType(Seq(
    StructField("n", LongType, nullable = false),
    StructField("members", ArrayType(child.dataType, containsNull = false),
      nullable = false)))

  override def createAggregationBuffer(): BoundedCollectBuffer =
    new BoundedCollectBuffer(0L, ArrayBuffer.empty)

  override def update(b: BoundedCollectBuffer, input: InternalRow): BoundedCollectBuffer = {
    val v = child.eval(input)
    if (v != null) {
      b.n += 1
      if (b.items.length < cap) b.items += v.asInstanceOf[InternalRow].copy()
    }
    b
  }

  override def merge(b: BoundedCollectBuffer, o: BoundedCollectBuffer): BoundedCollectBuffer = {
    b.n += o.n
    var i = 0
    while (b.items.length < cap && i < o.items.length) {
      b.items += o.items(i)
      i += 1
    }
    b
  }

  override def eval(b: BoundedCollectBuffer): Any =
    InternalRow(b.n, new GenericArrayData(b.items.toArray[Any]))

  @transient private lazy val itemProj =
    UnsafeProjection.create(Array[DataType](child.dataType))

  override def serialize(b: BoundedCollectBuffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeLong(b.n)
    out.writeInt(b.items.length)
    b.items.foreach { r =>
      val bytes = itemProj(InternalRow(r)).getBytes
      out.writeInt(bytes.length)
      out.write(bytes)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): BoundedCollectBuffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readLong()
    val len = in.readInt()
    val items = new ArrayBuffer[InternalRow](len)
    var i = 0
    while (i < len) {
      val l = in.readInt()
      val arr = new Array[Byte](l)
      in.readFully(arr)
      val row = new UnsafeRow(1)
      row.pointTo(arr, l)
      items += row.getStruct(0, childStruct.size).copy()
      i += 1
    }
    new BoundedCollectBuffer(n, items)
  }

  override def withNewMutableAggBufferOffset(offset: Int): BoundedCollect =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): BoundedCollect =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildInternal(c: Expression): BoundedCollect =
    copy(child = c)
  override def prettyName: String = "bounded_collect"
}
