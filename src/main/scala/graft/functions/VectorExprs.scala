package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

/** Embedding kernels as native expressions. The Column twins
  * (SimilaritySearch.cosine / bandBuckets) build on Spark's higher-order
  * functions, which evaluate interpreted with per-element boxing — fine
  * for correctness, ~10× too slow as the ANN hot path (128 plane dots ×
  * 64 dims per vector). These run the same left-fold float→double loops
  * over primitive arrays; OperatorSpec pins expression == Column twin.
  */
object VectorEvals {

  /** cosine over two float arrays — same op order as the Column twin
    * (left-fold dot, left-fold norms, sqrt, divide) so results are
    * bit-identical. Mismatched lengths yield NULL exactly like the twin
    * (zip_with pads with null → null dot), so a corrupt/truncated
    * embedding surfaces as an excluded row instead of a plausible score.
    * A zero-norm side yields 0.0, NOT NaN: Spark sorts NaN first under
    * `ORDER BY sim DESC`, so a NaN here would crown the zero vector the
    * nearest neighbor of everything.
    */
  def cosineF(a: ArrayData, b: ArrayData): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var dot = 0.0
    var i = 0
    while (i < n) {
      dot += a.getFloat(i).toDouble * b.getFloat(i).toDouble
      i += 1
    }
    var na = 0.0
    i = 0
    while (i < n) { val x = a.getFloat(i).toDouble; na += x * x; i += 1 }
    var nb = 0.0
    i = 0
    while (i < n) { val x = b.getFloat(i).toDouble; nb += x * x; i += 1 }
    if (na == 0.0 || nb == 0.0) return 0.0
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  /** per-band signed-projection buckets: band b packs the sign bits of its
    * bandBits planes (same bit layout as the Column twin).
    */
  def lshBuckets(v: ArrayData, planes: Array[Double], bands: Int, bandBits: Int): ArrayData = {
    val dim = v.numElements()
    val out = new Array[Any](bands)
    var b = 0
    while (b < bands) {
      var bucket = 0L
      var j = 0
      while (j < bandBits) {
        val p = (b * bandBits + j) * dim
        var dot = 0.0
        var i = 0
        while (i < dim) { dot += v.getFloat(i).toDouble * planes(p + i); i += 1 }
        if (dot >= 0) bucket |= (1L << j)
        j += 1
      }
      out(b) = bucket
      b += 1
    }
    new GenericArrayData(out)
  }
}

case class CosineExpr(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true // null on dim mismatch, like the HOF twin
  override def prettyName: String = "cosine_f"
  override def nullSafeEval(a: Any, b: Any): Any =
    VectorEvals.cosineF(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  // cosineF itself returns null on mismatched lengths → re-check after call
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val tmp = ctx.freshName("cosRes")
      s"""
        java.lang.Double $tmp = graft.functions.VectorEvals.cosineF($a, $b);
        ${ev.isNull} = ($tmp == null);
        ${ev.value} = ${ev.isNull} ? -1.0 : $tmp.doubleValue();
      """
    })
  override protected def withNewChildrenInternal(l: Expression, r: Expression): CosineExpr =
    copy(left = l, right = r)
}

case class LshBucketsExpr(child: Expression, planes: Array[Double],
    bands: Int, bandBits: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "lsh_buckets"
  override def nullSafeEval(input: Any): Any =
    VectorEvals.lshBuckets(input.asInstanceOf[ArrayData], planes, bands, bandBits)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val planesRef = ctx.addReferenceObj("planes", planes, "double[]")
    defineCodeGen(ctx, ev,
      c => s"graft.functions.VectorEvals.lshBuckets($c, $planesRef, $bands, $bandBits)")
  }
  override protected def withNewChildInternal(newChild: Expression): LshBucketsExpr =
    copy(child = newChild)
}

object VectorFunctions {
  def cosine_f(a: Column, b: Column): Column =
    Bridge.column(CosineExpr(Bridge.expression(a), Bridge.expression(b)))
  def lsh_buckets(v: Column, planes: Array[Array[Double]], bands: Int, bandBits: Int): Column =
    Bridge.column(LshBucketsExpr(Bridge.expression(v), planes.flatten, bands, bandBits))
}
