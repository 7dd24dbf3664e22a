package graft.plans

import org.apache.spark.sql.catalyst.expressions.{BoundReference, Literal}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DoubleType}
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Direct checks on the native Catalyst expressions that the plan-level
  * specs exercise only indirectly. */
class VectorExpressionsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("two DotProducts in one codegen scope declare disjoint locals " +
      "(a collision would silently fall the whole stage back to " +
      "interpreted execution)") {
    val ref = BoundReference(0, ArrayType(DoubleType), nullable = false)
    val ctx = new CodegenContext
    val c1 = DotProduct(ref, ref).genCode(ctx)
    val c2 = DotProduct(ref, ref).genCode(ctx)
    val decls = """(?:int|double) (\w+)""".r
    val names = (decls.findAllMatchIn(c1.code.toString) ++
      decls.findAllMatchIn(c2.code.toString)).map(_.group(1)).toSeq
    assert(names.distinct.size == names.size,
      s"duplicate local declarations across two instances: $names " +
        "(janino rejects the stage, Spark logs WARN and runs interpreted)")
  }

  test("cosine over a 3-dot projection executes inside one stage and " +
      "matches the interpreted value") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // cosine(a, b) = dot/(sqrt(dot)·sqrt(dot)) — THREE DotProducts in one
    // projection, the composition that used to collide
    val df = Seq((Seq(1.0, 2.0, 3.0), Seq(3.0, 2.0, 1.0)))
      .toDF("a", "b")
      .select(graft.functions.VectorFunctions.cosine(col("a"), col("b"))
        .as("c"))
    val got = df.head.getDouble(0)
    val expect = 10.0 / (math.sqrt(14.0) * math.sqrt(14.0))
    assert(got == expect, s"$got != $expect")
  }

  test("PlaneSignBits equals the per-plane sign of the masked sum; " +
      "ElementSignBits equals the per-dimension sign") {
    val v = Array(0.5, -1.5, 2.0, -0.25)
    val arr = Literal.create(ArrayData.toArrayData(v),
      ArrayType(DoubleType))
    // plane 0: all +1 → sum 0.75 ≥ 0 → bit set
    // plane 1: mask 0b0010 (+v1, others −) → -1.5-0.5-2.0+0.25 < 0 → clear
    val masks = IndexedSeq(0xfL, 0x2L)
    val sig = PlaneSignBits(arr, masks).eval(null).asInstanceOf[Long]
    assert(sig == 1L, s"sig $sig")
    // masks are a value-equal Seq (not an Array): two semantically
    // identical expressions must compare equal or Catalyst
    // canonicalization / CSE can never unify them
    assert(PlaneSignBits(arr, IndexedSeq(0xfL, 0x2L)) ==
      PlaneSignBits(arr, Vector(0xfL, 0x2L)))
    val esig = ElementSignBits(arr).eval(null).asInstanceOf[Long]
    // bits where v_i > 0: dims 0 and 2
    assert(esig == ((1L << 0) | (1L << 2)), s"esig $esig")
  }
}
