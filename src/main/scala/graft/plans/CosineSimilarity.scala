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

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"""
         |double ${ev.value}_dp = 0.0, ${ev.value}_na = 0.0, ${ev.value}_nb = 0.0;
         |int ${ev.value}_n = java.lang.Math.min($a.numElements(), $b.numElements());
         |for (int i = 0; i < ${ev.value}_n; i++) {
         |  double x = (double) $a.getFloat(i);
         |  double y = (double) $b.getFloat(i);
         |  ${ev.value}_dp += x * y;
         |  ${ev.value}_na += x * x;
         |  ${ev.value}_nb += y * y;
         |}
         |${ev.value} = ${ev.value}_dp /
         |  (java.lang.Math.sqrt(${ev.value}_na) * java.lang.Math.sqrt(${ev.value}_nb));
       """.stripMargin)

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): CosineSimilarity =
    copy(left = newLeft, right = newRight)
}

/** Session extensions registering the engine's native functions — enable
  * with `.config("spark.sql.extensions", "graft.plans.GraftExtensions")`.
  * [[graft.pipeline.Similarity]] auto-detects the registration and falls
  * back to the portable (bit-identical) fold when absent.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_sim"),
      (children: Seq[Expression]) => {
        require(children.length == 2, "cosine_sim takes exactly 2 arguments")
        CosineSimilarity(children.head, children(1))
      }))
  }
}
