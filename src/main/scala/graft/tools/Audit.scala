package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode

/** Ad-hoc plan audit for one SparkEntry query: executes it (AQE final
  * plan), prints the formatted plan plus the scan/exchange tallies the
  * CLAUDE.md plan-audit discipline asks for.
  * Usage: `sbt "runMain graft.tools.Audit <query> [sfDir]"`. */
object Audit {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse(sys.error("usage: Audit <query> [sfDir]"))
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = graft.SparkEntry.queries(name)(spark, sfDir)
    df.collect()
    val plan = df.queryExecution.explainString(ExplainMode.fromString("formatted"))
    println(plan)
    // the formatted tree prints shared/adaptive subtrees repeatedly — count
    // DISTINCT node ids, not line occurrences
    def ids(p: String) = s"\\((\\d+)\\) $p".r.findAllMatchIn(plan).map(_.group(1)).toSet.size
    println(s"AUDIT $name: scans=${ids("Scan parquet")} " +
      s"exchanges=${ids("Exchange")} reused=${ids("ReusedExchange")} " +
      s"windowGroupLimits=${ids("WindowGroupLimit")} " +
      // formatted explain marks codegen as "[codegen id : N]" annotations,
      // never the literal node name — count distinct ids
      s"codegenSpans=${"\\[codegen id : (\\d+)\\]".r.findAllMatchIn(plan).map(_.group(1)).toSet.size}")
  }
}
