package graft.diff.comparator

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodeGenerator, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.graftext._
import org.apache.spark.sql.types.{BooleanType, DataType}

/**
 * Lifts an arbitrary `scala.math.Equiv[T]` into a Catalyst expression so
 * user-defined equivalences run inside whole-stage codegen instead of as a
 * Scala UDF. Null semantics: (null, null) -> true, one null -> false,
 * otherwise `equiv.equiv(l, r)`. The result is non-nullable Boolean.
 *
 * This is the only place the engine drops below the public Column API, same
 * as the reference (/root/reference/src/main/scala/uk/co/gresearch/spark/diff/
 * comparator/EquivDiffComparator.scala:28-116), re-implemented for Spark 4.1's
 * Column/ColumnNode split via the [[org.apache.spark.sql.graftext]] shim.
 */
case class EquivDiffComparator[T](equiv: math.Equiv[T], inputDataType: Option[DataType] = None)
    extends DiffComparator {
  override def equiv(left: Column, right: Column): Column =
    EquivExpression(left.asExpression, right.asExpression, equiv, inputDataType).asColumn
}

private[graft] case class EquivExpression[T](
    left: Expression,
    right: Expression,
    equivalence: math.Equiv[T],
    inputDataType: Option[DataType])
  extends BinaryExpression {

  override def dataType: DataType = BooleanType
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult =
    if (sameType(left.dataType, right.dataType) &&
        inputDataType.forall(sameType(_, left.dataType))) {
      TypeCheckResult.TypeCheckSuccess
    } else {
      TypeCheckResult.TypeCheckFailure(
        s"input types ${left.dataType.catalogString} and ${right.dataType.catalogString} " +
          s"must match${inputDataType.map(t => s" ${t.catalogString}").getOrElse("")}")
    }

  override def eval(input: InternalRow): Any = {
    val l = left.eval(input)
    val r = right.eval(input)
    if (l == null && r == null) true
    else if (l == null || r == null) false
    else equivalence.equiv(l.asInstanceOf[T], r.asInstanceOf[T])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val equivRef = ctx.addReferenceObj("equiv", equivalence, classOf[math.Equiv[_]].getName)
    val leftGen = left.genCode(ctx)
    val rightGen = right.genCode(ctx)
    def boxed(value: String, dt: DataType): String =
      if (CodeGenerator.isPrimitiveType(dt)) s"${CodeGenerator.boxedType(dt)}.valueOf($value)"
      else value
    val lVal = boxed(leftGen.value.toString, left.dataType)
    val rVal = boxed(rightGen.value.toString, right.dataType)
    val resultCode =
      code"""
        ${leftGen.code}
        ${rightGen.code}
        boolean ${ev.value} = false;
        if (${leftGen.isNull} && ${rightGen.isNull}) {
          ${ev.value} = true;
        } else if (!${leftGen.isNull} && !${rightGen.isNull}) {
          ${ev.value} = $equivRef.equiv($lVal, $rVal);
        }
      """
    ev.copy(code = resultCode, isNull = FalseLiteral)
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
