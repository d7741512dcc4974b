package graft

import org.apache.spark.sql.execution.ExplainMode
import org.apache.spark.sql.functions._
import graft.layout.ZOrder

/** Z-order layout (driver gate: q_zorder). */
class ZOrderSpec extends SparkSuiteBase {
  import spark.implicits._

  /** reference interleave: bit-by-bit loop */
  private def morton(x: Long, y: Long): Long = {
    var z = 0L
    var i = 0
    while (i < 31) {
      z |= ((x >> i) & 1L) << (2 * i)
      z |= ((y >> i) & 1L) << (2 * i + 1)
      i += 1
    }
    z
  }

  test("zorder: magic-mask chain equals the bit-by-bit interleave") {
    val rnd = new scala.util.Random(7)
    val rows = (0 until 500).map { _ =>
      (rnd.nextLong() & 0x7FFFFFFFL, rnd.nextLong() & 0x7FFFFFFFL)
    } ++ Seq((0L, 0L), (0x7FFFFFFFL, 0x7FFFFFFFL), (0L, 0x7FFFFFFFL))
    val got = rows.toDF("x", "y")
      .select(col("x"), col("y"), ZOrder.value(col("x"), col("y")))
      .as[(Long, Long, Long)].collect()
    got.foreach { case (x, y, z) =>
      assert(z == morton(x, y), s"($x, $y): got $z want ${morton(x, y)}")
      assert(z >= 0)
    }
  }

  test("zorder: layout gives tight envelopes on BOTH axes — a y-selective box " +
      "touches few z files but every x-sorted file") {
    // 64x64 grid, 16 files of ~256 rows. Morton splits it into 16x16 tiles,
    // so the box (all x, y < 4) intersects ~4 tiles; an x-sorted layout
    // stripes by x and every file spans all y.
    val grid = (for (x <- 0 until 64; y <- 0 until 64) yield (x.toLong, y.toLong))
    val df = grid.toDF("x", "y")
    def hits(laid: org.apache.spark.sql.DataFrame): Long =
      ZOrder.envelopes(laid, col("x"), col("y"))
        .where(col("y_min") < 4 && col("x_min") < 64)
        .count()
    val zHits = hits(ZOrder.layout(df, col("x"), col("y"), 16))
    val xHits = hits(df.repartitionByRange(16, col("x")).sortWithinPartitions("x"))
    assert(xHits >= 12, s"x-sorted layout should touch nearly all files: $xHits")
    assert(zHits <= 8, s"z layout should touch few files: $zHits")
    assert(zHits < xHits)
  }

  test("zorder: value is a pure codegen chain — no UDF, no exchange") {
    // a range scan, not a local relation: LocalTableScan constant-folds the
    // whole projection and leaves nothing to inspect
    val df = spark.range(100)
      .select(col("id").as("x"), (col("id") * 7).as("y"))
    val plan = df.select(ZOrder.value(col("x"), col("y")))
      .queryExecution.explainString(ExplainMode.fromString("formatted"))
    assert(!plan.contains("ScalaUDF"), plan)
    assert(!plan.contains("Exchange"), plan)
    // formatted mode marks whole-stage-codegen'd operators with `*`
    // and a `[codegen id : N]` tag
    assert(plan.contains("[codegen id"), plan)
  }

  test("zorder: layout plan is exactly one range exchange") {
    val df = (0 until 1000).map(i => (i.toLong, (i * 13 % 997).toLong)).toDF("x", "y")
    val plan = ZOrder.layout(df, col("x"), col("y"), 8)
      .queryExecution.explainString(ExplainMode.fromString("formatted"))
    val exchanges = "\\(\\d+\\) Exchange".r.findAllIn(plan).length
    assert(exchanges == 1, s"expected one range Exchange:\n$plan")
    assert(plan.contains("rangepartitioning"), plan)
  }
}
