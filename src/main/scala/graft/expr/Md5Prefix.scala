package graft.expr

import java.security.MessageDigest

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** First `nHex` hex characters of md5(utf8(s)), parsed base-16 — the exact
  * value of the repo's portability idiom
  * `conv(substring(md5(s), 1, nHex), 16, 10)` (the [[graft.llm.Sampling]]
  * digest convention, mirrored by DuckDB's
  * `CAST(concat('0x', substring(md5(s), 1, nHex)) AS BIGINT)`), WITHOUT the
  * string round-trip: the composable form materializes the full 32-char hex
  * digest, substrings it, and re-parses the digits — three UTF8String
  * allocations per evaluation, dominating the md5-bucket hot paths
  * (DSIR gram buckets, CMS cells, winnowing fingerprints, digest-uniform
  * sampling — the top rows of the session-3 bench). Here the first
  * nHex/2 digest BYTES fold directly into a long.
  *
  * Value-identity with the composable form is pinned by a parity spec; the
  * DuckDB oracles keep the string form — that is the point of the idiom
  * (any engine that can md5 a string reproduces the value). */
case class Md5Prefix(child: Expression, nHex: Int) extends UnaryExpression {

  // 14 hex = 56 bits: the value always fits a signed long, preserving
  // exact parity with the conv(...) form (16 hex can exceed Long.MaxValue,
  // where conv's unsigned string no longer casts).
  require(nHex >= 2 && nHex <= 14 && nHex % 2 == 0,
    s"nHex must be even in [2,14]: $nHex")

  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "md5_prefix"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"md5_prefix requires a string argument, got ${child.dataType.simpleString}")

  override def nullSafeEval(input: Any): Any =
    Md5Prefix.eval(input.asInstanceOf[UTF8String], nHex)

  // MODULE$ call, not `graft.expr.Md5Prefix.eval(...)`: the companion's
  // static forwarder for `eval` is suppressed by the case class's inherited
  // Expression.eval, so the bare-class form fails Janino compilation and
  // silently drops the WHOLE projection to interpreted mode.
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expr.Md5Prefix$$.MODULE$$.eval($c, $nHex)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object Md5Prefix {
  private val mdPool: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("MD5"))

  /** Static helper shared by interpreted eval and generated code. */
  def eval(s: UTF8String, nHex: Int): Long = {
    val md = mdPool.get()
    md.reset()
    val digest = md.digest(s.getBytes)
    var v = 0L
    var i = 0
    val nBytes = nHex / 2
    while (i < nBytes) {
      v = (v << 8) | (digest(i) & 0xffL)
      i += 1
    }
    v
  }

  def apply(c: Column, nHex: Int): Column =
    GraftBridge.column(Md5Prefix(GraftBridge.expression(c), nHex))
}
