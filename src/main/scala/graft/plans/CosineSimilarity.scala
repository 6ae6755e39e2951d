package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Whole-stage-codegen cosine similarity over two `array<float>` columns.
  *
  * Spark's higher-order array functions (`zip_with`/`aggregate`) evaluate
  * interpreted — no codegen — which makes them the bottleneck of
  * vector-heavy plans (LSH verify joins score 10⁵–10⁹ candidate pairs).
  * This native expression compiles to a tight primitive loop and
  * accumulates (dot, ‖a‖², ‖b‖²) in exactly the same element order as the
  * portable fold in [[graft.pipeline.Similarity.cosine]], so both paths
  * produce bit-identical doubles and stay interchangeable under the value
  * oracle.
  *
  * This is the §7.3 "custom Expression where built-ins genuinely can't
  * express it efficiently" case; everything else in the engine stays on
  * stock Catalyst operators.
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects two array<float> arguments, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "cosine_sim"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dp = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val xv = x.getFloat(i).toDouble
      val yv = y.getFloat(i).toDouble
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
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"""
         |double $dp = 0.0, $na = 0.0, $nb = 0.0;
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |for (int $i = 0; $i < $n; $i++) {
         |  double $x = (double) $a.getFloat($i);
         |  double $y = (double) $b.getFloat($i);
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
  }
}
