package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodegenFallback, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType, StringType}
import org.apache.spark.unsafe.hash.Murmur3_x86_32

/** Native Catalyst expressions for the similarity/dedup hot paths.
  *
  * The higher-order-function formulations (`zip_with` + `aggregate`) are
  * correct but interpreted per element with an array allocation per row —
  * measured 130+ s for the sf0.1 all-pairs cosine. These expressions run a
  * tight primitive loop inside whole-stage codegen (DotProduct) or a single
  * eval pass (MinHashSig/SimHash64 — one traversal instead of k), which is
  * the preference-order (b) answer from SURVEY.md §7.2: a custom
  * `Expression` before any custom physical operator.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  // inputs are produced by graft's own operators as array<double>
  override def dataType: DataType = DoubleType
  override def prettyName: String = "dot_product"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += x.getDouble(i) * y.getDouble(i); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      s"""
         |int n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double acc = 0.0;
         |for (int i = 0; i < n; i++) {
         |  acc += $a.getDouble(i) * $b.getDouble(i);
         |}
         |${ev.value} = acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

/** One-pass MinHash signature over an array<string> shingle set: for each
  * shingle the 64-bit hash is computed once and k affine transforms update
  * k running minima — versus k full traversals (and k hash recomputations)
  * in the HOF formulation. */
case class MinHashSig(child: Expression, k: Int)
    extends UnaryExpression with CodegenFallback {

  // input: array<string> shingles (produced by TextFunctions.shingles)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig"

  private val P = 2147483647L // 2^31-1
  private val as: Array[Long] =
    Array.tabulate(k)(i => 1103515245L * (i + 1) % P)
  private val bs: Array[Long] =
    Array.tabulate(k)(i => 12345L * (i + 7) % P)

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val mins = Array.fill(k)(Long.MaxValue)
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      val s = arr.getUTF8String(i)
      val h = java.lang.Math.floorMod(
        Murmur3_x86_32.hashUnsafeBytes(
          s.getBaseObject, s.getBaseOffset, s.numBytes(), 42).toLong, P)
      var j = 0
      while (j < k) {
        val v = java.lang.Math.floorMod(as(j) * h + bs(j), P)
        if (v < mins(j)) mins(j) = v
        j += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  override protected def withNewChildInternal(c: Expression): MinHashSig =
    copy(child = c)
}

/** One-pass 64-bit SimHash over an array<string> token list: per-bit
  * majority vote of token hashes in a single traversal (the HOF version
  * re-aggregates the token array 64 times). Token hash = two rounds of
  * murmur3 to fill 64 bits. */
case class SimHash64(child: Expression)
    extends UnaryExpression with CodegenFallback {

  // input: array<string> tokens (produced by TextFunctions.tokens)
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val votes = new Array[Int](64)
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      val s = arr.getUTF8String(i)
      val lo = Murmur3_x86_32.hashUnsafeBytes(
        s.getBaseObject, s.getBaseOffset, s.numBytes(), 42).toLong & 0xffffffffL
      val hi = Murmur3_x86_32.hashUnsafeBytes(
        s.getBaseObject, s.getBaseOffset, s.numBytes(), 977).toLong & 0xffffffffL
      val h = (hi << 32) | lo
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) sig |= (1L << b)
      b += 1
    }
    java.lang.Long.valueOf(sig)
  }

  override protected def withNewChildInternal(c: Expression): SimHash64 =
    copy(child = c)
}

/** Column-level entry points. */
object VectorExpressions {
  import ColumnBridge.{column, expression}
  def dotProduct(a: Column, b: Column): Column =
    column(DotProduct(expression(a), expression(b)))
  def minhashSig(shingles: Column, k: Int): Column =
    column(MinHashSig(expression(shingles), k))
  def simhash64(toks: Column): Column =
    column(SimHash64(expression(toks)))
}
