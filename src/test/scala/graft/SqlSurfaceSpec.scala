package graft

import graft.corpus.PageGen
import graft.extract.Extract

/** The spark.sql(...) surface: the whole downstream side of the pipeline —
  * dedup window, chunk stats, retrieval-ish filtering — runnable as plain
  * SQL over registered views, including the engine's custom functions. */
class SqlSurfaceSpec extends SparkSuiteBase {
  import spark.implicits._
  implicit lazy val sp: org.apache.spark.sql.SparkSession = spark

  test("end-to-end SQL: extract view -> window dedup -> aggregate") {
    graft.functions.GraftFunctions.register(spark)
    val pages = spark.range(200).map(i => PageGen.row(42L, i))
    Extract.run(pages)
      .filter(d => d.err.isEmpty && d.text.nonEmpty)
      .map(d => (d.url, d.text)).toDF("url", "text")
      .createOrReplaceTempView("docs_v")

    val out = spark.sql(
      """WITH hashed AS (
        |  SELECT url, text, sha2(CAST(text AS BINARY), 256) AS h,
        |         simhash64(text) AS sh
        |  FROM docs_v),
        | ranked AS (
        |  SELECT url, h, sh,
        |         row_number() OVER (PARTITION BY h ORDER BY url) AS rn
        |  FROM hashed)
        |SELECT count(*) AS total,
        |       sum(CASE WHEN rn > 1 THEN 1 ELSE 0 END) AS dups,
        |       count(DISTINCT sh) AS distinct_simhashes
        |FROM ranked""".stripMargin).head()

    val total = out.getLong(0)
    val dups = out.getLong(1)
    val distinctSh = out.getLong(2)
    assert(total > 100)
    assert(dups > 0) // planted exact duplicates exist in the 200-page corpus
    // identical texts share a simhash → strictly fewer distinct simhashes
    assert(distinctSh <= total - dups)
  }

  test("SQL retrieval shape: LIKE filter + order + limit over the docs view") {
    val rows = spark.sql(
      """SELECT url FROM docs_v
        | WHERE text LIKE '%Newton Raphson%'
        | ORDER BY url LIMIT 5""".stripMargin).collect()
    assert(rows.nonEmpty) // the pinned passage appears in ~1/16 articles
  }

  test("md5_top64 from SQL matches Hashing.md5Long; deterministic sampling usable as a WHERE clause") {
    graft.functions.GraftFunctions.register(spark)
    val got = spark.sql("SELECT md5_top64('hello world')").head().getLong(0)
    assert(got == Hashing.md5Long("hello world"))
    // the sampling predicate in plain SQL keeps a stable, repeatable subset
    val n1 = spark.sql(
      "SELECT count(*) FROM docs_v WHERE pmod(md5_top64(url) & 9223372036854775807, 100) < 30")
      .head().getLong(0)
    val n2 = spark.sql(
      "SELECT count(*) FROM docs_v WHERE pmod(md5_top64(url) & 9223372036854775807, 100) < 30")
      .head().getLong(0)
    assert(n1 == n2 && n1 > 0)
  }
}
