package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.{columnOf, expressionOf}
import org.apache.spark.sql.types.{DataType, DoubleType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Edit/similarity distances Spark lacks natively, as codegen'd Catalyst
  * expressions (no UDFs — §2.8). Both are pinned BIT-FOR-BIT to DuckDB's
  * built-ins (`damerau_levenshtein`, `jaro_winkler_similarity`), which
  * makes them directly oracle-gateable — the semantics below were probed
  * against DuckDB, not assumed:
  *
  *  - Damerau–Levenshtein is the FULL variant (Lowrance–Wagner, with the
  *    last-occurrence alphabet table), not optimal-string-alignment:
  *    DL("CA","ABC") = 2, where OSA gives 3.
  *  - Jaro: match window = max(|a|,|b|)/2 − 1 clamped to 0 (window 0
  *    admits only same-index matches, so jaro("ab","ba") = 0);
  *    transpositions t = ⌊mismatched-match-positions / 2⌋ with INTEGER
  *    floor (jaro("abcdef","bcadef") = (1 + 1 + 5/6)/3, t = ⌊3/2⌋ = 1);
  *    EITHER empty string → 0.0, including both-empty ("" vs "" is 0,
  *    not 1).
  *  - Winkler boost: applied only when jaro > 0.7, common prefix capped
  *    at 4, scale p = 0.1, computed as j + ℓ·0.1·(1 − j) in that order
  *    (the 9-decimal value hash needs the same double rounding path).
  *
  * Both kernels operate on Unicode code points, matching DuckDB's
  * grapheme-agnostic codepoint comparison for the BMP+ range.
  *
  * Scale shape: per-row O(|a|·|b|) scalar work inside the fused stage —
  * these are for post-blocking verification (candidate pairs from
  * d12/er2-style blocking), never as a join predicate over the cross
  * product.
  */
object StringDistances {

  private def codePoints(s: UTF8String): Array[Int] = {
    val str = s.toString
    val n = str.codePointCount(0, str.length)
    val out = new Array[Int](n)
    var i = 0
    var k = 0
    while (k < n) {
      val cp = str.codePointAt(i)
      out(k) = cp
      i += Character.charCount(cp)
      k += 1
    }
    out
  }

  /** Full Damerau–Levenshtein distance (adjacent-transposition edit
    * distance with the alphabet last-row table). */
  def damerauLevenshtein(aStr: UTF8String, bStr: UTF8String): Int = {
    val a = codePoints(aStr)
    val b = codePoints(bStr)
    val la = a.length
    val lb = b.length
    if (la == 0) return lb
    if (lb == 0) return la
    val maxDist = la + lb
    // d is (la+2) x (lb+2), flattened; row stride lb+2
    val stride = lb + 2
    val d = new Array[Int]((la + 2) * stride)
    d(0) = maxDist
    var i = 0
    while (i <= la) {
      d((i + 1) * stride) = maxDist
      d((i + 1) * stride + 1) = i
      i += 1
    }
    var j = 0
    while (j <= lb) {
      d(j + 1) = maxDist
      d(stride + j + 1) = j
      j += 1
    }
    val da = new java.util.HashMap[Integer, Integer]()
    i = 1
    while (i <= la) {
      var db = 0
      j = 1
      while (j <= lb) {
        val k = { val v = da.get(Integer.valueOf(b(j - 1))); if (v == null) 0 else v.intValue() }
        val l = db
        val cost = if (a(i - 1) == b(j - 1)) { db = j; 0 } else 1
        val subst = d(i * stride + j) + cost
        val insert = d((i + 1) * stride + j) + 1
        val delete = d(i * stride + j + 1) + 1
        val trans = d(k * stride + l) + (i - k - 1) + 1 + (j - l - 1)
        var m = subst
        if (insert < m) m = insert
        if (delete < m) m = delete
        if (trans < m) m = trans
        d((i + 1) * stride + j + 1) = m
        j += 1
      }
      da.put(Integer.valueOf(a(i - 1)), Integer.valueOf(i))
      i += 1
    }
    d((la + 1) * stride + lb + 1)
  }

  /** Jaro similarity with DuckDB's conventions (see object doc). */
  def jaro(aStr: UTF8String, bStr: UTF8String): Double = {
    val a = codePoints(aStr)
    val b = codePoints(bStr)
    val la = a.length
    val lb = b.length
    if (la == 0 || lb == 0) return 0.0
    var window = (if (la > lb) la else lb) / 2 - 1
    if (window < 0) window = 0
    val aMatch = new Array[Boolean](la)
    val bMatch = new Array[Boolean](lb)
    var m = 0
    var i = 0
    while (i < la) {
      val lo = if (i - window > 0) i - window else 0
      val hi = if (i + window < lb - 1) i + window else lb - 1
      var j = lo
      var found = false
      while (j <= hi && !found) {
        if (!bMatch(j) && a(i) == b(j)) {
          aMatch(i) = true
          bMatch(j) = true
          m += 1
          found = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    var mismatches = 0
    var k = 0
    i = 0
    while (i < la) {
      if (aMatch(i)) {
        while (!bMatch(k)) k += 1
        if (a(i) != b(k)) mismatches += 1
        k += 1
      }
      i += 1
    }
    val t = mismatches / 2 // integer floor — pinned against DuckDB
    val md = m.toDouble
    (md / la + md / lb + (md - t) / md) / 3.0
  }

  /** Jaro–Winkler similarity with DuckDB's conventions. */
  def jaroWinkler(aStr: UTF8String, bStr: UTF8String): Double = {
    val j = jaro(aStr, bStr)
    if (j <= 0.7) return j
    val a = codePoints(aStr)
    val b = codePoints(bStr)
    val max = if (a.length < b.length) a.length else b.length
    val cap = if (max < 4) max else 4
    var l = 0
    while (l < cap && a(l) == b(l)) l += 1
    j + l * 0.1 * (1.0 - j)
  }
}

/** Base for (string, string) → scalar distance expressions dispatching
  * to a static [[StringDistances]] kernel from both interpreted and
  * generated code. */
abstract class StringDistanceExpression extends BinaryExpression {
  protected def kernelMethod: String

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, StringType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (string, string), got (${l.sql}, ${r.sql})")
    }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.StringDistances.$kernelMethod($a, $b);")
}

/** Full Damerau–Levenshtein distance (DuckDB `damerau_levenshtein`). */
case class DamerauLevenshtein(left: Expression, right: Expression)
    extends StringDistanceExpression {
  override def dataType: DataType = IntegerType
  override def prettyName: String = "damerau_levenshtein"
  override protected def kernelMethod: String = "damerauLevenshtein"
  override def nullSafeEval(a: Any, b: Any): Any =
    StringDistances.damerauLevenshtein(
      a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DamerauLevenshtein =
    copy(left = newLeft, right = newRight)
}

object DamerauLevenshtein {
  def of(a: Column, b: Column): Column =
    columnOf(DamerauLevenshtein(expressionOf(a), expressionOf(b)))
}

/** Jaro–Winkler similarity (DuckDB `jaro_winkler_similarity`). */
case class JaroWinkler(left: Expression, right: Expression)
    extends StringDistanceExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "jaro_winkler"
  override protected def kernelMethod: String = "jaroWinkler"
  override def nullSafeEval(a: Any, b: Any): Any =
    StringDistances.jaroWinkler(
      a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaroWinkler =
    copy(left = newLeft, right = newRight)
}

object JaroWinkler {
  def of(a: Column, b: Column): Column =
    columnOf(JaroWinkler(expressionOf(a), expressionOf(b)))
}
