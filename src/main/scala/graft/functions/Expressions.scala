package graft.functions

import org.apache.spark.sql.{Column, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the fingerprint hot path.
  *
  * SimHash/Hamming run per-row inside dedup sweeps over every document of
  * the corpus, so they are implemented as codegen'd `Expression`s rather
  * than Scala UDFs (prompt preference order: native Expression > UDF):
  * no boxing/serialization per row, and the Hamming distance inlines as
  * `Long.bitCount(a ^ b)` in generated code.
  */
case class SimHash64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullSafeEval(v: Any): Any =
    graft.dedup.SimHash.simhash(v.asInstanceOf[UTF8String].toString)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.dedup.SimHash.simhash($c.toString())")
  override protected def withNewChildInternal(c: Expression): SimHash64 = copy(c)
  override def prettyName: String = "simhash64"
}

case class HammingDistance(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = IntegerType
  override def nullSafeEval(a: Any, b: Any): Any =
    java.lang.Long.bitCount(a.asInstanceOf[Long] ^ b.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"java.lang.Long.bitCount($a ^ $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): HammingDistance = copy(l, r)
  override def prettyName: String = "hamming"
}

object GraftFunctions {
  /** Column forms resolve through the function registry (call register()
    * once per session); Spark 4 keeps Expression->Column private. */
  def simhash64(c: Column): Column = org.apache.spark.sql.functions.call_function("simhash64", c)
  def hamming(a: Column, b: Column): Column = org.apache.spark.sql.functions.call_function("hamming", a, b)

  /** Register for SQL use on an existing session. */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "simhash64", exprs => SimHash64(exprs.head), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "hamming", exprs => HammingDistance(exprs(0), exprs(1)), "scala_udf")
  }
}

/** SparkSessionExtensions wiring — `--conf spark.sql.extensions=
  * graft.functions.GraftExtensions` injects the functions into every
  * session of the application (the (c)-tier registration path). */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      org.apache.spark.sql.catalyst.FunctionIdentifier("simhash64"),
      new ExpressionInfo(classOf[SimHash64].getName, "simhash64"),
      (exprs: Seq[Expression]) => SimHash64(exprs.head)))
    e.injectFunction((
      org.apache.spark.sql.catalyst.FunctionIdentifier("hamming"),
      new ExpressionInfo(classOf[HammingDistance].getName, "hamming"),
      (exprs: Seq[Expression]) => HammingDistance(exprs(0), exprs(1))))
  }
}
