package graft.expr

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType}

/** Product-quantization encoder: per subspace, the argmin-distance
  * codebook centroid, in ONE JVM pass straight to `array<int>`.
  *
  * Drop-in replacement (identical codes) for the Column-space ranking
  * `array_sort(array(struct(||c||²−2v·c, i), ...)).getItem(0)` per
  * subspace — which builds and sorts a kCodes-element struct array per
  * subspace per row (m·k struct allocations; for m=32, k=256 that is 8192
  * expression nodes and the generated code falls out of whole-stage
  * codegen). Ties break to the lower code id, exactly as the sorted
  * (distance, code) struct ranking does.
  *
  * The codebook rides along as a codegen reference object — KBs, inlined
  * once per task, never shuffled. */
case class PqEncode(child: Expression, codebooks: Array[Array[Array[Double]]])
    extends UnaryExpression {

  require(codebooks.nonEmpty && codebooks.forall(_.nonEmpty),
    "pq_encode: empty codebooks")

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "pq_encode"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(DoubleType | FloatType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"pq_encode requires array<float|double>, got ${t.simpleString}")
    }

  @transient private lazy val isFloat =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(input: Any): Any =
    PqEncode.compute(input.asInstanceOf[ArrayData], codebooks, isFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cbRef = ctx.addReferenceObj("codebooks", codebooks, "double[][][]")
    defineCodeGen(ctx, ev,
      s => s"graft.expr.PqEncode$$.MODULE$$.compute($s, $cbRef, $isFloat)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object PqEncode {

  def compute(vec: ArrayData, codebooks: Array[Array[Array[Double]]],
      isFloat: Boolean): ArrayData = {
    val m = codebooks.length
    val codes = new Array[Int](m)
    var j = 0
    var off = 0
    while (j < m) {
      val cb = codebooks(j)
      val dsub = cb(0).length
      var best = 0
      var bestD = Double.MaxValue
      var c = 0
      while (c < cb.length) {
        val cent = cb(c)
        // same ||c||² − 2·(v·c) ranking value as the Column-space encode,
        // accumulated in the same sequential order — bit-identical argmin
        var c2 = 0.0
        var dot = 0.0
        var i = 0
        while (i < dsub) {
          val x = if (isFloat) vec.getFloat(off + i).toDouble
                  else vec.getDouble(off + i)
          c2 += cent(i) * cent(i)
          dot += x * cent(i)
          i += 1
        }
        val d = c2 - dot * 2.0
        if (d < bestD) { bestD = d; best = c }
        c += 1
      }
      codes(j) = best
      off += dsub
      j += 1
    }
    new GenericArrayData(codes)
  }

  def apply(vec: Column, codebooks: Array[Array[Array[Double]]]): Column =
    GraftBridge.column(PqEncode(GraftBridge.expression(vec), codebooks))
}
