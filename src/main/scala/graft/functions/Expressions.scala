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

/** First 8 bytes of MD5(UTF-8) as a signed Long bit pattern — the
  * engine-wide oracle-replicable hash primitive
  * (DuckDB: ('0x'||substr(md5(s),1,16))::UBIGINT), exposed as a codegen'd
  * expression for column-level use (deterministic sampling, fingerprints). */
case class Md5Top64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullSafeEval(v: Any): Any =
    graft.Hashing.md5Long(v.asInstanceOf[UTF8String].toString)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.Hashing.md5Long($c.toString())")
  override protected def withNewChildInternal(c: Expression): Md5Top64 = copy(c)
  override def prettyName: String = "md5_top64"
}

object GraftFunctions {
  /** Column forms resolve through the function registry (call register()
    * once per session); Spark 4 keeps Expression->Column private. */
  def simhash64(c: Column): Column = org.apache.spark.sql.functions.call_function("simhash64", c)
  def hamming(a: Column, b: Column): Column = org.apache.spark.sql.functions.call_function("hamming", a, b)
  def md5Top64(c: Column): Column = org.apache.spark.sql.functions.call_function("md5_top64", c)

  /** Distributed Bloom-filter build over a column (returns ONE binary row —
    * the serialized filter). Wraps Spark's own `BloomFilterAggregate` (the
    * expression behind runtime join-filter injection) over `xxhash64(c)`;
    * `items`/`bits` are clamped by Spark to the runtime-filter maxima
    * (4M items / 8 MB), so oversizing degrades to more false positives,
    * never to an error. Pair with [[bloomMightContain]] using the SAME
    * column expression on the probe side. */
  def bloomAgg(c: Column, items: Column, bits: Column): Column =
    org.apache.spark.sql.functions.call_function("graft_bloom_agg", c, items, bits)

  /** Probe a [[bloomAgg]]-built filter: false positives possible, false
    * negatives impossible — safe as a PRE-JOIN prune in front of an exact
    * equi-join (the join re-checks equality; results are unchanged). */
  def bloomMightContain(filter: Column, c: Column): Column =
    org.apache.spark.sql.functions.call_function("graft_bloom_might_contain", filter, c)

  /** Register for SQL use on an existing session. */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "simhash64", exprs => SimHash64(exprs.head), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "hamming", exprs => HammingDistance(exprs(0), exprs(1)), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "md5_top64", exprs => Md5Top64(exprs.head), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_bloom_agg",
      exprs => new org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate(
        new org.apache.spark.sql.catalyst.expressions.XxHash64(Seq(exprs(0))),
        exprs(1), exprs(2)).toAggregateExpression(),
      "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_bloom_might_contain",
      exprs => org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
        exprs(0),
        new org.apache.spark.sql.catalyst.expressions.XxHash64(Seq(exprs(1)))),
      "scala_udf")
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
    e.injectFunction((
      org.apache.spark.sql.catalyst.FunctionIdentifier("md5_top64"),
      new ExpressionInfo(classOf[Md5Top64].getName, "md5_top64"),
      (exprs: Seq[Expression]) => Md5Top64(exprs.head)))
  }
}
