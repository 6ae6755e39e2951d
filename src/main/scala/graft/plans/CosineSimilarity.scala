package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Whole-stage-codegen cosine similarity over two float or double array
  * columns (each side independently — a dequantized `array<double>`
  * against a float query literal is the int8-serving shape).
  *
  * Spark's higher-order array functions (`zip_with`/`aggregate`) evaluate
  * interpreted — no codegen — which makes them the bottleneck of
  * vector-heavy plans (LSH verify joins score 10⁵–10⁹ candidate pairs).
  * This native expression compiles to a tight primitive loop and
  * accumulates (dot, ‖a‖², ‖b‖²) in exactly the same element order as the
  * portable fold in [[graft.pipeline.Similarity.cosine]], so both paths
  * produce bit-identical doubles and stay interchangeable under the value
  * oracle (the fold casts each element to double before multiplying —
  * exactly this loop's widening).
  *
  * This is the §7.3 "custom Expression where built-ins genuinely can't
  * express it efficiently" case; everything else in the engine stays on
  * stock Catalyst operators.
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  private def elemType(e: Expression): Option[DataType] = e.dataType match {
    case ArrayType(t @ (FloatType | DoubleType), _) => Some(t)
    case _ => None
  }

  override def checkInputDataTypes(): TypeCheckResult = {
    if (Seq(left, right).forall(elemType(_).isDefined))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects two array<float>/array<double> arguments, " +
        s"got ${left.dataType.simpleString} and " +
        s"${right.dataType.simpleString}")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "cosine_sim"

  @transient private lazy val leftIsFloat = elemType(left).contains(FloatType)
  @transient private lazy val rightIsFloat = elemType(right).contains(FloatType)

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dp = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val xv = if (leftIsFloat) x.getFloat(i).toDouble else x.getDouble(i)
      val yv = if (rightIsFloat) y.getFloat(i).toDouble else y.getDouble(i)
      dp += xv * yv; na += xv * xv; nb += yv * yv
      i += 1
    }
    dp / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // every local gets a fresh name: two instances of this expression can
    // land in ONE generated function scope, where fixed names like `i`
    // collide and silently drop the whole projection to interpreted mode
    val dp = ctx.freshName("dp"); val na = ctx.freshName("na")
    val nb = ctx.freshName("nb"); val n = ctx.freshName("n")
    val i = ctx.freshName("i"); val x = ctx.freshName("x")
    val y = ctx.freshName("y")
    def get(arr: String, isFloat: Boolean) =
      if (isFloat) s"(double) $arr.getFloat($i)" else s"$arr.getDouble($i)"
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"""
         |double $dp = 0.0, $na = 0.0, $nb = 0.0;
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |for (int $i = 0; $i < $n; $i++) {
         |  double $x = ${get(a, leftIsFloat)};
         |  double $y = ${get(b, rightIsFloat)};
         |  $dp += $x * $y;
         |  $na += $x * $x;
         |  $nb += $y * $y;
         |}
         |${ev.value} = $dp / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
       """.stripMargin)
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): CosineSimilarity =
    copy(left = newLeft, right = newRight)
}

/** Session extensions registering the engine's native functions — enable
  * with `.config("spark.sql.extensions", "graft.plans.GraftExtensions")`.
  * [[graft.pipeline.Similarity]] auto-detects the registration and falls
  * back to the portable (bit-identical) fold when absent.
  */
object GraftExtensions {
  /** True iff the active session registered native function `name` —
    * the single detection point behind every auto-upgrading operator
    * ([[graft.pipeline.Similarity.cosine]], `Pq.encode`,
    * `TextOps.winnowFingerprints`).
    */
  def hasNative(name: String): Boolean =
    org.apache.spark.sql.SparkSession.getActiveSession
      .exists(_.catalog.functionExists(name))
}

class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_sim"),
      (children: Seq[Expression]) => {
        require(children.length == 2, "cosine_sim takes exactly 2 arguments")
        CosineSimilarity(children.head, children(1))
      }))
    ext.injectFunction((
      FunctionIdentifier("pq_encode"),
      new ExpressionInfo(classOf[PqEncode].getName, "pq_encode"),
      (children: Seq[Expression]) => {
        require(children.length == 2, "pq_encode takes exactly 2 arguments")
        PqEncode(children.head, children(1))
      }))
    ext.injectFunction((
      FunctionIdentifier("winnow_select"),
      new ExpressionInfo(classOf[WinnowSelect].getName, "winnow_select"),
      (children: Seq[Expression]) => {
        require(children.length == 3,
          "winnow_select takes exactly 3 arguments (text, k, w)")
        WinnowSelect(children.head, children(1), children(2))
      }))
    ext.injectFunction((
      FunctionIdentifier("winnow_select64"),
      new ExpressionInfo(classOf[WinnowSelect64].getName, "winnow_select64"),
      (children: Seq[Expression]) => {
        require(children.length == 3,
          "winnow_select64 takes exactly 3 arguments (text, k, w)")
        WinnowSelect64(children.head, children(1), children(2))
      }))
    ext.injectFunction((
      FunctionIdentifier("nfc_normalize"),
      new ExpressionInfo(classOf[NfcNormalize].getName, "nfc_normalize"),
      (children: Seq[Expression]) => {
        require(children.length == 1,
          "nfc_normalize takes exactly 1 argument")
        NfcNormalize(children.head)
      }))
  }
}
