package graft.expr

import org.apache.spark.sql.{Column, GraftBridge, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** k-permutation MinHash signature over an `array<long>` of element hashes,
  * in ONE pass: k running minima updated per element, permutation j being
  * the splitmix64 finalizer over `h + φ·(j+1)` (independent avalanche
  * streams from one 64-bit key — the standard splitmix64 stream
  * construction).
  *
  * WHY CUSTOM: the composable form — k × `array_min(transform(hs, …))` —
  * evaluates k interpreted HOF lambdas and allocates k intermediate arrays
  * per row (HigherOrderFunction never enters whole-stage codegen; measured
  * single-task, interpreted, ~20 s for 5 k docs × 300 shingles × k=64).
  * This kernel is two primitive loops, codegen-friendly, zero intermediate
  * allocation: ~100× less overhead on the same workload.
  *
  * Null elements are skipped; a null array yields null. */
case class MinHashSig(child: Expression, k: Int) extends UnaryExpression {

  require(k > 0, "minhash k must be positive")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "minhash_sig"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"minhash_sig requires array<bigint>, got ${t.simpleString}")
    }

  override def nullSafeEval(input: Any): Any =
    MinHashSig.compute(input.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.expr.MinHashSig$$.MODULE$$.compute($a, $k)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinHashSig {
  private final val Phi = 0x9e3779b97f4a7c15L // 2^64 / golden ratio

  /** splitmix64 finalizer — full-avalanche 64-bit mix. */
  @inline private def mix(z0: Long): Long = {
    var z = z0
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** Shared eval/codegen kernel. */
  def compute(a: ArrayData, k: Int): ArrayData = {
    val mins = new Array[Long](k)
    java.util.Arrays.fill(mins, Long.MaxValue)
    val n = a.numElements()
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i)) {
        val h = a.getLong(i)
        var j = 0
        while (j < k) {
          val x = mix(h + Phi * (j + 1))
          if (x < mins(j)) mins(j) = x
          j += 1
        }
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  def apply(hashes: Column, k: Int): Column =
    GraftBridge.column(MinHashSig(GraftBridge.expression(hashes), k))

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "minhash_sig", { exprs =>
        val k = if (exprs(1).foldable) exprs(1).eval() else null
        k match {
          case n: Number => MinHashSig(exprs.head, n.intValue())
          case _ => throw new IllegalArgumentException(
            s"minhash_sig: argument 'k' must be an integer literal, got ${exprs(1).sql}")
        }
      }, "built-in")
}
