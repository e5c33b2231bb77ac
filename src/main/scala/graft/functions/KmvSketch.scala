package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** kmv_sketch(hash, k) → array<bigint>: the k minimum DISTINCT hash
  * values, ascending — a KMV/theta distinct-count sketch (Bar-Yossef et
  * al. 2002; the Theta-sketch family, Dasgupta et al.).
  *
  * Why this shape at 100 TB: like q91's HLL the buffer is fixed-size and
  * the merge is associative (k-smallest of a union = k-smallest of the
  * merged k-smallest sets), so partial sketches combine map-side and
  * only O(k) longs per group cross the shuffle. UNLIKE HLL, the sketch
  * retains an actual uniform SAMPLE of the keyspace below θ = the k-th
  * minimum — which is what makes set INTERSECTION (and difference)
  * estimable after the fact: common hashes below min(θ_A, θ_B) are a
  * uniform sample of A∩B. HLL cannot do intersections except by
  * inclusion-exclusion, whose error explodes for small overlaps.
  *
  * Determinism is the graft twist: the hash is the caller's (md5-derived
  * in q99), not an internal RNG, so the sketch content — not just its
  * error bound — is bit-reproducible on ANY engine, including DuckDB via
  * a window rank. A sketch with an exact SQL oracle.
  *
  * Buffer: a TreeSet capped at k — O(log k) insert, O(1) max probe;
  * values ≥ the current k-th minimum are rejected without allocation,
  * so a hot group costs O(k) memory no matter its cardinality.
  */
final class KmvBuffer(val set: java.util.TreeSet[java.lang.Long])

case class KmvSketch(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KmvBuffer] with UnaryLike[Expression] {

  require(k > 0, "k must be positive")

  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def createAggregationBuffer(): KmvBuffer =
    new KmvBuffer(new java.util.TreeSet[java.lang.Long]())

  private def add(b: KmvBuffer, v: Long): Unit = {
    if (b.set.size < k) { b.set.add(v); () }
    else if (v < b.set.last) {
      // only mutate when v is genuinely new AND under the k-th minimum
      if (b.set.add(v)) { b.set.pollLast(); () }
    }
  }

  override def update(b: KmvBuffer, input: InternalRow): KmvBuffer = {
    val v = child.eval(input)
    if (v != null) add(b, v.asInstanceOf[Long])
    b
  }

  override def merge(b: KmvBuffer, o: KmvBuffer): KmvBuffer = {
    val it = o.set.iterator()
    var go = true
    while (go && it.hasNext) {
      val v = it.next().longValue()
      // other is ascending: once v can't enter, nothing later can
      if (b.set.size == k && v >= b.set.last) go = false else add(b, v)
    }
    b
  }

  override def eval(b: KmvBuffer): Any = {
    val arr = new Array[Any](b.set.size)
    val it = b.set.iterator()
    var i = 0
    while (it.hasNext) { arr(i) = it.next().longValue(); i += 1 }
    new GenericArrayData(arr)
  }

  override def serialize(b: KmvBuffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(b.set.size)
    val it = b.set.iterator()
    while (it.hasNext) out.writeLong(it.next().longValue())
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): KmvBuffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val set = new java.util.TreeSet[java.lang.Long]()
    var i = 0
    while (i < n) { set.add(in.readLong()); i += 1 }
    new KmvBuffer(set)
  }

  override def withNewMutableAggBufferOffset(offset: Int): KmvSketch =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): KmvSketch =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildInternal(c: Expression): KmvSketch =
    copy(child = c)
  override def prettyName: String = "kmv_sketch"
}
