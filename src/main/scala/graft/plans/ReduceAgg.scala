package graft.plans

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, AttributeReference, Cast, Expression, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.DeclarativeAggregate
import org.apache.spark.sql.catalyst.plans.logical.{LocalRelation, Project}
import org.apache.spark.sql.GraftSqlShims
import org.apache.spark.sql.types.DataType

/** User-defined declarative fold aggregate — the Spark-native form of the
  * reference's `reduce_agg(inputValue, initialState, inputFunction,
  * combineFunction)` (reference: presto-main/src/main/java/com/facebook/
  * presto/operator/aggregation/ReduceAggregationFunction.java:1,
  * presto-docs/src/main/sphinx/functions/aggregate.rst:114).
  *
  * The caller supplies the fold as ordinary Column lambdas; they are
  * applied to placeholder attributes and run through the session analyzer
  * once (function resolution + implicit type coercion), producing concrete
  * Catalyst expressions that become the aggregate's update/merge
  * expressions. The result is a [[DeclarativeAggregate]]: Tungsten
  * HashAggregate with MAP-SIDE PARTIAL AGGREGATION and whole-stage codegen
  * — each executor folds its partition locally and ships one state value
  * per group, exactly the 100 TB posture (unlike the naive
  * `aggregate(collect_list(...))` spelling, which ships every row).
  *
  * Contract (documented restrictions, all inherited from the reference):
  *  - the fold state type is `init`'s type; the input is coerced to it;
  *  - `update` must be insensitive to input order and `merge` associative/
  *    commutative for results to be deterministic under partitioning —
  *    true of the reference's reduce_agg as well (its docs require
  *    commutative input functions);
  *  - `init` must be an identity for `merge` (merge(init, s) = s): empty
  *    partitions contribute `init` partials, so a non-identity init would
  *    fold in once per empty partition.
  */
object Reduce {

  /** `reduceAgg(v, lit(1L))((s, t) => (s * t) % M, (a, b) => (a * b) % M)` */
  def reduceAgg(input: Column, init: Column)(
      update: (Column, Column) => Column,
      merge: (Column, Column) => Column): Column = {
    val spark = SparkSession.active
    val initE = GraftSqlShims.expression(init)
    require(initE.foldable, "reduce_agg initial state must be a literal")
    val stateType = initE.dataType
    val state = AttributeReference("reduce_state", stateType, nullable = true)()
    val inAttr = AttributeReference("reduce_input", stateType, nullable = true)()
    val updateE = analyzed(spark, update(GraftSqlShims.column(state),
      GraftSqlShims.column(inAttr)), Seq(state, inAttr), stateType)
    // merge is resolved against two state-typed placeholders; FoldAgg
    // rewires them to the buffer/input-buffer attribute pair at planning
    val rightAttr = AttributeReference("reduce_state_r", stateType, nullable = true)()
    val mergeE = analyzed(spark, merge(GraftSqlShims.column(state),
      GraftSqlShims.column(rightAttr)), Seq(state, rightAttr), stateType)
    val agg = FoldAgg(GraftSqlShims.expression(input), initE,
      updateE, mergeE, state, inAttr, rightAttr)
    GraftSqlShims.column(agg.toAggregateExpression())
  }

  /** Resolve a caller-built expression over placeholder attributes: one
    * analyzer pass gives function resolution and implicit type coercion,
    * so the stored update/merge expressions are fully concrete by the time
    * physical planning consumes them.
    */
  private def analyzed(spark: SparkSession, c: Column, attrs: Seq[Attribute],
                       stateType: DataType): Expression = {
    val plan = Project(Seq(Alias(GraftSqlShims.expression(c), "e")()),
      LocalRelation(attrs))
    val resolved = spark.sessionState.analyzer.execute(plan)
      .asInstanceOf[Project].projectList.head.asInstanceOf[Alias].child
    if (resolved.dataType == stateType) resolved
    else Cast(resolved, stateType)
  }
}

/** The aggregate node built by [[Reduce.reduceAgg]]. `updateE`/`mergeE`
  * are pre-resolved expression trees over the placeholder attributes;
  * update/mergeExpressions substitute the placeholders with the live
  * buffer attributes (and the coerced input) at planning time.
  */
case class FoldAgg(
    input: Expression,
    init: Expression,
    updateE: Expression,
    mergeE: Expression,
    state: AttributeReference,
    inAttr: AttributeReference,
    rightAttr: AttributeReference) extends DeclarativeAggregate {

  override def prettyName: String = "graft_reduce_agg"
  override def children: Seq[Expression] = Seq(input, init)
  override def nullable: Boolean = true
  override def dataType: DataType = init.dataType

  override val aggBufferAttributes: Seq[AttributeReference] = Seq(state)
  override lazy val initialValues: Seq[Expression] = Seq(init)

  override lazy val updateExpressions: Seq[Expression] = Seq(
    updateE.transformUp {
      case a: AttributeReference if a.exprId == inAttr.exprId =>
        if (input.dataType == state.dataType) input
        else Cast(input, state.dataType)
    })

  override lazy val mergeExpressions: Seq[Expression] = Seq(
    mergeE.transformUp {
      case a: AttributeReference if a.exprId == state.exprId => state.left
      case a: AttributeReference if a.exprId == rightAttr.exprId => state.right
    })

  override lazy val evaluateExpression: Expression = state

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(input = newChildren(0), init = newChildren(1))
}
