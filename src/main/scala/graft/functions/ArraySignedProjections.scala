package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.{columnOf, expressionOf}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native codegen'd kernels for the similarity/LSH hot path.
  *
  * The interpreted higher-order-function formulation
  * (`aggregate(zip_with(...))` per hyperplane) dispatches a lambda per
  * element per plane — measured ~11× slower than codegen'd loops
  * elsewhere in this repo, and the round-1 bench's dominant ANN cost.
  * These expressions keep the exact integer arithmetic (order-independent
  * sums over quantized micro-unit longs), so every DuckDB oracle that
  * restates the math stays bit-identical; only the evaluation engine
  * changes.
  */

/** All hyperplane projections of one quantized vector in a single pass:
  * `out[p] = Σ_i arr[i] * signs[p][i]` over `array<bigint>`. One data
  * load serves every plane (vs one interpreted traversal per plane).
  * Null elements contribute 0.
  */
case class ArraySignedProjections(child: Expression, signs: Seq[Seq[Int]])
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "array_signed_projections"

  @transient private lazy val signArr: Array[Array[Int]] =
    signs.map(_.toArray).toArray

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint>, got ${dt.sql}")
  }

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val out = new Array[Long](signArr.length)
    var p = 0
    while (p < signArr.length) {
      val s = signArr(p)
      val n = math.min(arr.numElements(), s.length)
      var acc = 0L
      var i = 0
      while (i < n) {
        if (!arr.isNullAt(i)) acc += arr.getLong(i) * s(i)
        i += 1
      }
      out(p) = acc
      p += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val signsRef = ctx.addReferenceObj("signs", signArr, "int[][]")
    nullSafeCodeGen(ctx, ev, a => {
      val out = ctx.freshName("out")
      val p = ctx.freshName("p")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val s = ctx.freshName("s")
      val n = ctx.freshName("n")
      s"""
         |long[] $out = new long[$signsRef.length];
         |for (int $p = 0; $p < $signsRef.length; $p++) {
         |  int[] $s = $signsRef[$p];
         |  int $n = $a.numElements() < $s.length ? $a.numElements() : $s.length;
         |  long $acc = 0L;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if (!$a.isNullAt($i)) { $acc += $a.getLong($i) * (long) $s[$i]; }
         |  }
         |  $out[$p] = $acc;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): ArraySignedProjections =
    copy(child = newChild)
}

object ArraySignedProjections {
  def project(arr: Column, signs: Seq[Seq[Int]]): Column =
    columnOf(ArraySignedProjections(expressionOf(arr), signs))
}

/** LSH bucket ids for every hash table in one pass: plane p of table t is
  * signs row `t*groupSize + p`, and bucket_t gets bit p set iff that
  * projection is positive. Returns `array<int>` of `signs.length /
  * groupSize` buckets. Collapsing the per-table bucket construction into
  * the expression keeps the logical plan O(1) in table count — the
  * `concat(when(...))` column-per-table form made Catalyst analysis the
  * dominant cost once tables × planes grew past ~100 columns.
  *
  * Bucket identity (not representation) is what the LSH join consumes, so
  * the SQL oracles may keep their '0'/'1'-string buckets: x and y collide
  * on the int form iff they collide on the string form.
  */
case class ArrayLshBuckets(child: Expression, signs: Seq[Seq[Int]], groupSize: Int)
    extends UnaryExpression {

  require(groupSize > 0 && groupSize < 31 && signs.length % groupSize == 0,
    s"plane count ${signs.length} must be a positive multiple of groupSize $groupSize")

  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.IntegerType, containsNull = false)
  override def prettyName: String = "array_lsh_buckets"

  @transient private lazy val signArr: Array[Array[Int]] =
    signs.map(_.toArray).toArray

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint>, got ${dt.sql}")
  }

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val nBuckets = signArr.length / groupSize
    val out = new Array[Int](nBuckets)
    var g = 0
    while (g < nBuckets) {
      var bucket = 0
      var p = 0
      while (p < groupSize) {
        val s = signArr(g * groupSize + p)
        val n = math.min(arr.numElements(), s.length)
        var acc = 0L
        var i = 0
        while (i < n) {
          if (!arr.isNullAt(i)) acc += arr.getLong(i) * s(i)
          i += 1
        }
        if (acc > 0L) bucket |= (1 << p)
        p += 1
      }
      out(g) = bucket
      g += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val signsRef = ctx.addReferenceObj("signs", signArr, "int[][]")
    nullSafeCodeGen(ctx, ev, a => {
      val out = ctx.freshName("out")
      val g = ctx.freshName("g")
      val p = ctx.freshName("p")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val s = ctx.freshName("s")
      val n = ctx.freshName("n")
      val bucket = ctx.freshName("bucket")
      s"""
         |int[] $out = new int[$signsRef.length / $groupSize];
         |for (int $g = 0; $g < $out.length; $g++) {
         |  int $bucket = 0;
         |  for (int $p = 0; $p < $groupSize; $p++) {
         |    int[] $s = $signsRef[$g * $groupSize + $p];
         |    int $n = $a.numElements() < $s.length ? $a.numElements() : $s.length;
         |    long $acc = 0L;
         |    for (int $i = 0; $i < $n; $i++) {
         |      if (!$a.isNullAt($i)) { $acc += $a.getLong($i) * (long) $s[$i]; }
         |    }
         |    if ($acc > 0L) { $bucket |= (1 << $p); }
         |  }
         |  $out[$g] = $bucket;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): ArrayLshBuckets =
    copy(child = newChild)
}

object ArrayLshBuckets {
  def buckets(arr: Column, signs: Seq[Seq[Int]], groupSize: Int): Column =
    columnOf(ArrayLshBuckets(expressionOf(arr), signs, groupSize))
}

/** Exact integer dot product of two `array<bigint>` columns — the
  * rescoring kernel (dot and norms of quantized vectors). Overflow-safe
  * for the quantization in use: |x| ≤ 10⁷ per element, 64 dims ⇒
  * |Σ| ≤ 64·10¹⁴ < 2⁶³. Null elements contribute 0.
  */
case class ArrayLongDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "array_dot_q"

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType) = dt match {
      case ArrayType(LongType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (array<bigint>, array<bigint>), got " +
        s"(${left.dataType.sql}, ${right.dataType.sql})")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0L
    var i = 0
    while (i < n) {
      if (!x.isNullAt(i) && !y.isNullAt(i)) acc += x.getLong(i) * y.getLong(i)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = $a.numElements() < $b.numElements() ? $a.numElements() : $b.numElements();
         |long $acc = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i) && !$b.isNullAt($i)) {
         |    $acc += $a.getLong($i) * $b.getLong($i);
         |  }
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ArrayLongDot =
    copy(left = newLeft, right = newRight)
}

object ArrayLongDot {
  def dotQ(a: Column, b: Column): Column =
    columnOf(ArrayLongDot(expressionOf(a), expressionOf(b)))
}

/** Exact integer squared-L2 distance of two `array<bigint>` columns —
  * the product-quantization assignment kernel (v9). Overflow-safe for
  * the quantization in use: |x−y| ≤ 2·10⁷ per element, ≤ 64 dims ⇒
  * |Σ(x−y)²| ≤ 64·4·10¹⁴ < 2⁶³. Element pairs with a null side
  * contribute 0 (ArrayLongDot's convention).
  */
case class ArrayLongL2(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "array_l2_q"

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType) = dt match {
      case ArrayType(LongType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (array<bigint>, array<bigint>), got " +
        s"(${left.dataType.sql}, ${right.dataType.sql})")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0L
    var i = 0
    while (i < n) {
      if (!x.isNullAt(i) && !y.isNullAt(i)) {
        val dv = x.getLong(i) - y.getLong(i)
        acc += dv * dv
      }
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val dv = ctx.freshName("dv")
      s"""
         |int $n = $a.numElements() < $b.numElements() ? $a.numElements() : $b.numElements();
         |long $acc = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i) && !$b.isNullAt($i)) {
         |    long $dv = $a.getLong($i) - $b.getLong($i);
         |    $acc += $dv * $dv;
         |  }
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ArrayLongL2 =
    copy(left = newLeft, right = newRight)
}

object ArrayLongL2 {
  def l2Q(a: Column, b: Column): Column =
    columnOf(ArrayLongL2(expressionOf(a), expressionOf(b)))
}

/** Sign-bit binary quantization: packs the signs of `len` consecutive
  * elements of an `array<float>` (starting at `lo`) into one long — bit
  * i set iff element `lo + i` ≥ 0. Two calls quantize a 64-dim
  * embedding into a 16-byte binary code (v14's Hamming path): a 16×
  * smaller corpus representation whose distance is two XOR+popcount
  * instructions, the standard first-pass filter before exact rescoring
  * at retrieval scale. Null/missing elements contribute a 0 bit (the
  * kernels' skip convention).
  */
case class ArraySignBits(child: Expression, lo: Int, len: Int)
    extends UnaryExpression {

  require(lo >= 0 && len >= 1 && len <= 63, "sign-bit window must fit a long")

  override def dataType: DataType = LongType
  override def prettyName: String = "array_sign_bits"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(org.apache.spark.sql.types.FloatType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float>, got ${dt.sql}")
  }

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val n = x.numElements()
    var acc = 0L
    var i = 0
    while (i < len) {
      val idx = lo + i
      if (idx < n && !x.isNullAt(idx) && x.getFloat(idx) >= 0f)
        acc |= 1L << i
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val idx = ctx.freshName("idx")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = $a.numElements();
         |long $acc = 0L;
         |for (int $i = 0; $i < $len; $i++) {
         |  int $idx = $lo + $i;
         |  if ($idx < $n && !$a.isNullAt($idx) && $a.getFloat($idx) >= 0f) {
         |    $acc |= 1L << $i;
         |  }
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): ArraySignBits =
    copy(child = newChild)
}

object ArraySignBits {
  /** Column API: pack signs of elements [lo, lo+len) into a long. */
  def signBits(a: Column, lo: Int, len: Int): Column =
    columnOf(ArraySignBits(expressionOf(a), lo, len))
}
