package graft.events

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Backward as-of join — "for each left event, the single most recent
  * right event of the same key at-or-before it" (last-touch attribution,
  * price-at-trade lookup). Spark has no ASOF operator; the naive
  * encodings are a per-key range join (O(n·m) per key) or a correlated
  * top-1 subquery (a join + window over the CROSS product). This is the
  * union-tag formulation instead: tag right rows 0 and left rows 1,
  * sort each key once by (ts, tag), and carry the latest right row
  * forward with `last(_, ignoreNulls)` over the running frame — O((n+m)
  * log(n+m)) per key, ONE exchange on the key serving both the window
  * and any downstream per-key aggregate.
  *
  * Semantics pinned by [[AsOfSpec]] and gate ★ q_asof against DuckDB's
  * native `ASOF LEFT JOIN` (l.ts >= r.ts):
  *   - ties INCLUDED: a right row at exactly the left ts matches (tag 0
  *     sorts before tag 1 at equal ts);
  *   - multiple right rows at the same (key, instant) resolve to the MAX
  *     id — the case is ill-defined in every ASOF engine, so it is made
  *     deterministic here by the window's own sort order (id ascending
  *     within an instant; `last` carries the final one — no pre-collapse
  *     aggregate, no second exchange; DuckDB's pick is otherwise
  *     arbitrary, so its oracle collapses with max() first);
  *   - unmatched left rows survive with null match columns (left-outer).
  *
  * All arithmetic on exact epoch MICROSECONDS (see [[Sessions]]) — no
  * float anywhere, hash-exact across engines and partitionings.
  *
  * 100 TB: the shuffle key is the raw user/instrument key (high
  * cardinality — hash-partitions evenly; never a precomputed bucket,
  * CLAUDE.md pitfall); per-key work is a sort that spills, never a
  * driver collect. Skewed keys degrade to a big external sort, not OOM.
  */
object AsOf {

  /** (key, lid, ts_us, r_id, r_ts_us, gap_us) — one row per left event;
    * r_* and gap null when no right row precedes it. */
  def prior(left: DataFrame, right: DataFrame, keyCol: String,
            tsCol: String, idCol: String): DataFrame = {
    val r = right.select(col(keyCol).cast("long").as("key"),
      unix_micros(col(tsCol).cast("timestamp")).as("ts_us"),
      col(idCol).cast("long").as("rid"))
    val l = left.select(col(keyCol).cast("long").as("key"),
      unix_micros(col(tsCol).cast("timestamp")).as("ts_us"),
      col(idCol).cast("long").as("lid"))
    val u = r.select(col("key"), col("ts_us"), lit(0L).as("tag"),
        col("rid").as("ord"), lit(null).cast("long").as("lid"),
        struct(col("rid"), col("ts_us").as("r_ts_us")).as("r"))
      .unionByName(l.select(col("key"), col("ts_us"), lit(1L).as("tag"),
        col("lid").as("ord"), col("lid"),
        lit(null).cast("struct<rid:bigint,r_ts_us:bigint>").as("r")))
    // `ord` (= id within each tag) makes the sort total AND resolves the
    // multi-right-at-same-instant case: among equal-(ts, tag=0) rows the
    // running `last` carries the max-id one, no pre-collapse aggregate
    val w = Window.partitionBy("key").orderBy("ts_us", "tag", "ord")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    u.withColumn("m", last("r", ignoreNulls = true).over(w))
      .where(col("tag") === 1L)
      .select(col("key"), col("lid"), col("ts_us"),
        col("m.rid").as("r_id"), col("m.r_ts_us").as("r_ts_us"),
        (col("ts_us") - col("m.r_ts_us")).as("gap_us"))
  }
}
