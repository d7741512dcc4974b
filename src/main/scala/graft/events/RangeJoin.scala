package graft.events

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bucketed band (range) join — all (left, right) pairs of the same key
  * with |l.ts − r.ts| ≤ radius. Spark plans a raw inequality join as
  * key-equi + per-key NestedLoop (O(n·m) per key — a power user with
  * 10⁶ events is a 10¹²-pair task). The standard fix is temporal
  * bucketing: with bucket width = radius, every qualifying pair is at
  * most one bucket apart, so exploding ONE side into its 3 candidate
  * buckets {b−1, b, b+1} and equi-joining on (key, bucket) bounds the
  * candidate set by local density, and a cheap exact |Δ| ≤ radius filter
  * finishes. Each pair survives exactly once — the un-exploded side
  * lives in exactly one bucket, which can equal at most one of the
  * other side's three candidates — so no distinct pass is needed.
  *
  * The EXPLODED side is the left/probe side by convention: explode
  * before the shuffle multiplies only the (key, ts, id) triple, not a
  * payload. Plan: one ×3 generate, one hash join on (key, bucket), the
  * exact band filter riding the join — no window, no NestedLoop.
  *
  * Integer micros only (`ts div radius` — Long division, floor for the
  * non-negative epoch range; Spark's `/` on longs would return DOUBLE,
  * CLAUDE.md pitfall). Hash-exact across engines; gate ★ q_range_join
  * checks against DuckDB's plain inequality join.
  *
  * 100 TB: shuffle keys are (raw key, time bucket) — high cardinality,
  * even under per-user skew because a hot user's events spread across
  * time buckets. Worst case reverts to true pair density (all events of
  * a key inside one radius), which is the OUTPUT size — unavoidable.
  */
object RangeJoin {

  /** (key, lid, l_ts_us, rid, r_ts_us, delta_us) for every same-key pair
    * with |l−r| ≤ radiusUs; delta signed l−r. Inner: unmatched rows drop. */
  def withinRadius(left: DataFrame, right: DataFrame, keyCol: String,
                   tsCol: String, idCol: String, radiusUs: Long): DataFrame = {
    require(radiusUs > 0, "radiusUs must be positive")
    def norm(df: DataFrame, id: String, ts: String) =
      df.select(col(keyCol).cast("long").as("key"),
        unix_micros(col(tsCol).cast("timestamp")).as(ts),
        col(idCol).cast("long").as(id))
    val l = norm(left, "lid", "l_ts_us")
      .withColumn("b0", expr(s"l_ts_us div ${radiusUs}L"))
      .withColumn("bucket", explode(array(col("b0") - 1, col("b0"), col("b0") + 1)))
      .drop("b0")
    val r = norm(right, "rid", "r_ts_us")
      .withColumn("bucket", expr(s"r_ts_us div ${radiusUs}L"))
    l.join(r, Seq("key", "bucket"))
      .where(abs(col("l_ts_us") - col("r_ts_us")) <= radiusUs)
      .select(col("key"), col("lid"), col("l_ts_us"),
        col("rid"), col("r_ts_us"),
        (col("l_ts_us") - col("r_ts_us")).as("delta_us"))
  }
}
