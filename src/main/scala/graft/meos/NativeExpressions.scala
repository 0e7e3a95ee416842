package graft.meos

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.DataType
import org.apache.spark.sql.{Column, Encoders, SparkSession}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions — the §7.2 "promote hot UDFs" path.
  *
  * [[TGeompointParseExpr]] is the WKT parser (`tgeompoint_in`,
  * `meos/src/tinst.rs:24`) as a first-class `Expression`:
  *  - `foldable` for literal WKT, so golden literals constant-fold at plan
  *    time (SURVEY §4.2's explicit optimizer item) — a parse in a WHERE
  *    clause against a literal costs zero at runtime;
  *  - `doGenCode` emits a direct static call inside whole-stage codegen —
  *    no ScalaUDF closure dispatch, no Row boxing of `CodegenFallback`;
  *  - null-intolerant: null WKT → null value, skipping the parse.
  *
  * The same pattern applies to the remaining codec UDFs if profiles
  * demand; parsing is the hot one (every ingest row pays it).
  */
object NativeExpressions {

  /** Executor-side bridge: parse text → Catalyst InternalRow of the
    * temporal-value struct. One serializer per JVM (thread-safe use via
    * copy()). */
  object TGeomBridge {
    private def enc: ExpressionEncoder[TGeom.Val] =
      ExpressionEncoder(Encoders.product[TGeom.Val]
        .asInstanceOf[org.apache.spark.sql.catalyst.encoders.AgnosticEncoder[TGeom.Val]])
    private lazy val serializer = enc.createSerializer()
    val valDataType: DataType = enc.schema

    def parseToRow(wkt: UTF8String): InternalRow =
      serializer(TGeom.parse(wkt.toString)).copy()
  }

  case class TGeompointParseExpr(child: Expression)
      extends UnaryExpression {
    override def dataType: DataType = TGeomBridge.valDataType
    override def prettyName: String = "tgeompoint_parse"

    override def nullSafeEval(input: Any): Any =
      TGeomBridge.parseToRow(input.asInstanceOf[UTF8String])

    override protected def doGenCode(ctx: CodegenContext,
                                     ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = graft.meos.NativeExpressions.TGeomBridge.parseToRow($c);")

    override protected def withNewChildInternal(newChild: Expression)
        : TGeompointParseExpr = copy(child = newChild)
  }

  /** Column-level API. */
  def tgeompointParse(wkt: Column): Column = {
    import org.apache.spark.sql.GraftShims
    GraftShims.column(TGeompointParseExpr(GraftShims.expression(wkt)))
  }

  /** SQL registration (native builder, not a UDF). */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "tgeompoint_parse", exprs => TGeompointParseExpr(exprs.head),
      "built-in")
}
