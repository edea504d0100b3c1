package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** K-minimum-values sketch state: the k smallest DISTINCT hash values seen.
  *
  * This is the scalable shape for sketch-based cardinality estimation at
  * 10^12 rows: a TypedImperativeAggregate gets map-side partial
  * aggregation for free, so each task reduces its partition to ≤ k longs
  * before anything crosses the wire — the shuffle moves O(partitions × k)
  * values, never the data (the declarative alternative,
  * `distinct().orderBy().limit(k)`, shuffles every distinct key). Unlike
  * HLL-family sketches the KMV state is a pure deterministic function of
  * the input SET — merge order, partitioning and engine cannot change
  * which k hashes are smallest — which is what lets the q82 DuckDB twin
  * recompute the sketch AND its estimate value-exact (an
  * approx_count_distinct could never cross-engine-match).
  */
case class KMinValues(child: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]]
  with UnaryLike[Expression] {

  require(k >= 2, s"k must be >= 2: $k")
  // type check at analysis (a constructor require would read
  // child.dataType before the attribute is resolved)
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"kmv_sketch expects a LONG hash column, got ${child.dataType}")

  override def prettyName: String = "kmv_sketch"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long]()

  private def trim(b: java.util.TreeSet[java.lang.Long]): Unit =
    while (b.size() > k) b.pollLast()

  override def update(b: java.util.TreeSet[java.lang.Long],
      input: InternalRow): java.util.TreeSet[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null && (b.size() < k || v.asInstanceOf[Long] < b.last())) {
      b.add(v.asInstanceOf[Long]); trim(b)
    }
    b
  }

  override def merge(b: java.util.TreeSet[java.lang.Long],
      o: java.util.TreeSet[java.lang.Long]): java.util.TreeSet[java.lang.Long] = {
    b.addAll(o); trim(b); b
  }

  /** Ascending array of the ≤ k minima (TreeSet iterates sorted). */
  override def eval(b: java.util.TreeSet[java.lang.Long]): Any = {
    val out = new Array[Long](b.size())
    val it = b.iterator()
    var i = 0
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    new GenericArrayData(out)
  }

  override def serialize(b: java.util.TreeSet[java.lang.Long]): Array[Byte] = {
    val buf = ByteBuffer.allocate(4 + 8 * b.size())
    buf.putInt(b.size())
    val it = b.iterator()
    while (it.hasNext) buf.putLong(it.next())
    buf.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] = {
    val buf = ByteBuffer.wrap(bytes)
    val n = buf.getInt
    val b = createAggregationBuffer()
    var i = 0
    while (i < n) { b.add(buf.getLong); i += 1 }
    b
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KMinValues =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KMinValues =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): KMinValues =
    copy(child = newChild)
}

object KmvFunctions {
  /** Aggregate Column: ascending array of the k smallest distinct values
    * of a long hash column.
    */
  def kmv_sketch(c: Column, k: Int): Column =
    Bridge.column(KMinValues(Bridge.expression(c), k).toAggregateExpression())
}
