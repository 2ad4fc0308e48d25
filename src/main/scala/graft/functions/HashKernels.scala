package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.{columnOf, expressionOf}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Per-row signature kernels for the dedup pipeline. The round-1 d3/d4
  * formulations exploded tokens/shingles and min/sum-aggregated the md5
  * material back per document — correct and map-side combined, but the
  * dominant cost was the explode → shuffle → 16-32 aggregate path. These
  * kernels compute the ENTIRE per-document signature in one pass over
  * the array column: no explode, no shuffle until the (tiny) band
  * bucket join. The arithmetic is bit-identical to the SQL oracles
  * (hex-string md5 chunks, lexicographic minima, ±1 nibble sums), so
  * hash parity is untouched.
  *
  * The generated code calls these static kernels directly — a plain
  * static call inside the fused stage, not per-element lambda dispatch.
  */
object HashKernels {

  private val md5Local: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("MD5"))

  private val HEX = "0123456789abcdef".getBytes("US-ASCII")

  private def hex32(digest: Array[Byte]): Array[Byte] = {
    val out = new Array[Byte](32)
    var i = 0
    while (i < 16) {
      out(2 * i) = HEX((digest(i) >> 4) & 0xf)
      out(2 * i + 1) = HEX(digest(i) & 0xf)
      i += 1
    }
    out
  }

  /** SimHash over the token MULTISET: for every token, md5-hex; hex
    * position p (1-based, 1..32) contributes +1 if the digit is 8..f
    * else -1; output bit p = '1' iff the sum is positive. Identical to
    * `sum(CASE WHEN substr(md5(tok), pos, 1) IN ('8'..'f') ...)` +
    * `string_agg(... ORDER BY pos)` in the oracle. */
  def simhash32(tokens: ArrayData): UTF8String = {
    val md = md5Local.get()
    val counts = new Array[Int](32)
    val n = tokens.numElements()
    var i = 0
    while (i < n) {
      if (!tokens.isNullAt(i)) {
        md.reset()
        val digest = md.digest(tokens.getUTF8String(i).getBytes)
        var p = 0
        while (p < 32) {
          val nibble =
            if ((p & 1) == 0) (digest(p >> 1) >> 4) & 0xf
            else digest(p >> 1) & 0xf
          counts(p) += (if (nibble >= 8) 1 else -1)
          p += 1
        }
      }
      i += 1
    }
    val out = new Array[Byte](32)
    var p = 0
    while (p < 32) {
      out(p) = if (counts(p) > 0) '1'.toByte else '0'.toByte
      p += 1
    }
    UTF8String.fromBytes(out)
  }

  /** 16 MinHash values from 4 md5 streams: digest k = md5("k:" ++ s) as
    * 32 hex chars, split into four 8-hex chunks; value (k, j) is the
    * lexicographic minimum of chunk j over all shingles. Order: k*4+j.
    * Identical to `min(substr(md5(k || ':' || s), 1 + 8j, 8))`. */
  def minhash16(shingles: ArrayData): ArrayData = {
    val md = md5Local.get()
    val mins = new Array[Array[Byte]](16)
    val prefixes = Array("0:", "1:", "2:", "3:").map(_.getBytes("US-ASCII"))
    val n = shingles.numElements()
    var i = 0
    while (i < n) {
      if (!shingles.isNullAt(i)) {
        val sBytes = shingles.getUTF8String(i).getBytes
        var k = 0
        while (k < 4) {
          md.reset()
          md.update(prefixes(k))
          val hex = hex32(md.digest(sBytes))
          var j = 0
          while (j < 4) {
            val idx = k * 4 + j
            val cur = mins(idx)
            // lexicographic byte compare of the 8-hex chunk vs current min
            var replace = cur == null
            if (!replace) {
              var b = 0
              var cmp = 0
              while (b < 8 && cmp == 0) {
                cmp = (hex(8 * j + b) & 0xff) - (cur(b) & 0xff)
                b += 1
              }
              replace = cmp < 0
            }
            if (replace) {
              val chunk = new Array[Byte](8)
              System.arraycopy(hex, 8 * j, chunk, 0, 8)
              mins(idx) = chunk
            }
            j += 1
          }
          k += 1
        }
      }
      i += 1
    }
    val out = new Array[AnyRef](16)
    var m = 0
    while (m < 16) {
      out(m) = if (mins(m) == null) null else UTF8String.fromBytes(mins(m))
      m += 1
    }
    new GenericArrayData(out)
  }
}

/** Base for array<string> → signature expressions dispatching to a
  * static [[HashKernels]] method from both interpreted and generated
  * code. */
abstract class HashKernelExpression extends UnaryExpression {
  protected def kernelMethod: String

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${dt.sql}")
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.HashKernels.$kernelMethod($a);")
}

/** 32-bit SimHash of a token array as a '0'/'1' string. */
case class SimHash32(child: Expression) extends HashKernelExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "simhash32"
  override protected def kernelMethod: String = "simhash32"
  override def nullSafeEval(v: Any): Any =
    HashKernels.simhash32(v.asInstanceOf[ArrayData])
  override protected def withNewChildInternal(newChild: Expression): SimHash32 =
    copy(child = newChild)
}

object SimHash32 {
  def of(tokens: Column): Column = columnOf(SimHash32(expressionOf(tokens)))
}

/** 16 MinHash chunk-minima of a shingle array (order k*4+j). */
case class MinHash16(child: Expression) extends HashKernelExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = true)
  override def prettyName: String = "minhash16"
  override protected def kernelMethod: String = "minhash16"
  override def nullSafeEval(v: Any): Any =
    HashKernels.minhash16(v.asInstanceOf[ArrayData])
  override protected def withNewChildInternal(newChild: Expression): MinHash16 =
    copy(child = newChild)
}

object MinHash16 {
  def of(shingles: Column): Column = columnOf(MinHash16(expressionOf(shingles)))
}
