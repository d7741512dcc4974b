package graft

/** Guards the driver contract itself: entry() returns rows on any plain
  * session, every query name has either an oracle or a documented
  * rows-only backing, and oracle SQL references only real tables. */
class EntrySpec extends SparkSuiteBase {

  test("entry() flagship returns rows") {
    val rows = SparkEntry.entry(spark).collect()
    assert(rows.nonEmpty)
    assert(rows.map(_.getAs[Long]("count")).sum == 300) // all pages accounted for
  }

  test("every oracle key is a query key; oracle tables exist in testdata") {
    val qs = SparkEntry.queries.keySet
    val os = SparkEntry.oracleSql.keySet
    assert(os.subsetOf(qs), s"oracle-only keys: ${os -- qs}")
    val known = Set("region", "nation", "customer", "supplier", "part",
      "orders", "lineitem", "events", "documents", "embeddings")
    SparkEntry.oracleSql.foreach { case (name, sql) =>
      val lower = sql.toLowerCase
      // crude but effective: every FROM/JOIN target must be a known table
      // or a CTE defined in the same statement
      val ctes = "(?i)\\b([a-z_0-9]+)\\s*(?:\\([a-z_, ]*\\))?\\s*as\\s*(?:materialized\\s*)?\\(".r
        .findAllMatchIn(sql).map(_.group(1).toLowerCase).toSet
      // drop extract(hour FROM ts)-style intra-function FROMs and the
      // IS [NOT] DISTINCT FROM operator (its FROM is not a table clause)
      val scannable = lower.replaceAll("(?i)extract\\s*\\([^)]*\\)", "")
        .replaceAll("(?i)is\\s+(not\\s+)?distinct\\s+from", "<=>")
      val targets = "(?i)(?:from|join)\\s+([a-z_0-9]+)".r
        .findAllMatchIn(scannable).map(_.group(1)).toSet
      // `range` is DuckDB's table function (FROM range(16) r(j))
      val unknown = targets -- known -- ctes -- Set("unnest", "range")
      assert(unknown.isEmpty, s"$name references unknown tables: $unknown")
    }
  }

  test("all queries run on sf0.001 without exceptions") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val n = fn(spark, "/root/testdata/sf0.001").count()
      assert(n >= 0, name)
    }
  }
}
