package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.types._

/** Whole-stage-codegen product-quantization encoder: vector →
  * `array<tinyint>` of per-subspace argmin codes under literal codebooks.
  *
  * The portable encode path ([[graft.pipeline.Pq.encodeFold]]) evaluates
  * m·k interpreted `aggregate` folds per row — at m=8, k=16 that is 128
  * higher-order-function evaluations per vector, the dominant cost of
  * the one-time corpus encode that builds a PQ/IVF×PQ index. This
  * expression compiles the whole argmin search to one primitive loop and
  * accumulates each squared distance in exactly the portable path's
  * order (element order, left-associated double sums from 0.0, ties to
  * the LOWER code — `array_min` on (dist², code) structs compares dist²
  * first, then code, which a strict `<` scan in code order reproduces),
  * so both paths produce bit-identical codes and stay interchangeable
  * under the q_pq value oracle.
  *
  * The codebook child must be a foldable `array<array<array<float>>>`
  * literal (m × k × subDim) — KBs, evaluated once at plan time and
  * shipped to the generated code as a reference object, not as inline
  * source.
  */
case class PqEncode(left: Expression, right: Expression)
    extends BinaryExpression {

  private def isVec(dt: DataType): Boolean = dt match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult = {
    val cbOk = right.dataType match {
      case ArrayType(ArrayType(inner, _), _) => isVec(inner)
      case _ => false
    }
    if (!isVec(left.dataType))
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects an array<float|double> vector, got " +
          left.dataType.simpleString)
    else if (!cbOk || !right.foldable)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects a foldable array<array<array<float|double>>> " +
          s"codebook literal, got ${right.dataType.simpleString}")
    else TypeCheckResult.TypeCheckSuccess
  }

  override def dataType: DataType = ArrayType(ByteType, containsNull = false)
  override def prettyName: String = "pq_encode"

  @transient private lazy val vecIsFloat: Boolean =
    left.dataType.asInstanceOf[ArrayType].elementType == FloatType

  // m × k × subDim, doubles — same values the portable path sees after
  // its cast("double") of the float centroid literals
  @transient private lazy val codebooks: Array[Array[Array[Double]]] = {
    val cbIsFloat = right.dataType.asInstanceOf[ArrayType].elementType
      .asInstanceOf[ArrayType].elementType
      .asInstanceOf[ArrayType].elementType == FloatType
    val m = right.eval().asInstanceOf[ArrayData]
    Array.tabulate(m.numElements()) { j =>
      val cents = m.getArray(j)
      Array.tabulate(cents.numElements()) { c =>
        val cent = cents.getArray(c)
        Array.tabulate(cent.numElements()) { p =>
          if (cbIsFloat) cent.getFloat(p).toDouble else cent.getDouble(p)
        }
      }
    }
  }

  private def m: Int = codebooks.length
  private def k: Int = codebooks.head.length
  private def subDim: Int = codebooks.head.head.length

  override protected def nullSafeEval(vec: Any, cb: Any): Any = {
    val v = vec.asInstanceOf[ArrayData]
    // UnsafeArrayData accessors do no bounds checking: a short vector
    // would read past the array and yield nondeterministic garbage codes
    if (v.numElements() != m * subDim)
      throw new IllegalArgumentException(
        s"pq_encode: vector has ${v.numElements()} elements, " +
          s"codebooks expect ${m * subDim}")
    val out = new Array[Byte](m)
    var j = 0
    while (j < m) {
      val off = j * subDim
      var best = 0
      var bestD = Double.PositiveInfinity
      var c = 0
      while (c < k) {
        val cent = codebooks(j)(c)
        var d = 0.0
        var p = 0
        while (p < subDim) {
          val x = if (vecIsFloat) v.getFloat(off + p).toDouble
                  else v.getDouble(off + p)
          val diff = x - cent(p)
          d += diff * diff
          p += 1
        }
        if (d < bestD) { bestD = d; best = c }
        c += 1
      }
      out(j) = best.toByte
      j += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cbRef = ctx.addReferenceObj("pqCodebooks", codebooks,
      "double[][][]")
    val getter = if (vecIsFloat) "getFloat" else "getDouble"
    // fresh names: two instances of this expression can share one
    // generated function scope (see CosineSimilarity)
    val out = ctx.freshName("out"); val j = ctx.freshName("j")
    val c = ctx.freshName("c"); val p = ctx.freshName("p")
    val best = ctx.freshName("best"); val bestD = ctx.freshName("bestD")
    val d = ctx.freshName("d"); val cent = ctx.freshName("cent")
    val diff = ctx.freshName("diff"); val off = ctx.freshName("off")
    nullSafeCodeGen(ctx, ev, (vec, _) =>
      s"""
         |if ($vec.numElements() != ${m * subDim}) {
         |  throw new IllegalArgumentException(
         |    "pq_encode: vector has " + $vec.numElements() +
         |    " elements, codebooks expect ${m * subDim}");
         |}
         |byte[] $out = new byte[$m];
         |for (int $j = 0; $j < $m; $j++) {
         |  int $off = $j * $subDim;
         |  int $best = 0;
         |  double $bestD = Double.POSITIVE_INFINITY;
         |  for (int $c = 0; $c < $k; $c++) {
         |    double[] $cent = $cbRef[$j][$c];
         |    double $d = 0.0;
         |    for (int $p = 0; $p < $subDim; $p++) {
         |      double $diff = (double) $vec.$getter($off + $p) - $cent[$p];
         |      $d += $diff * $diff;
         |    }
         |    if ($d < $bestD) { $bestD = $d; $best = $c; }
         |  }
         |  $out[$j] = (byte) $best;
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($out);
       """.stripMargin)
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): PqEncode =
    copy(left = newLeft, right = newRight)
}
