package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact deduplication as pure window/aggregate plans (no UDFs, fully
  * codegen'd, one shuffle each).
  *
  * D2/F3 (SURVEY.md §2.6): corpus-wide whole-document dedup, the reference's
  * `seen_files.json` sha256-registry keep-first semantics
  * (src/services/RAG/convert_to_embeddings.py:559-570). Losers are kept as
  * rows with `duplicate_of` so lineage survives, mirroring the reference's
  * metadata-only dup rows.
  *
  * Scale note: partitionBy(hash) shuffles on a high-cardinality key —
  * uniform by construction, no salting needed; AQE coalesces the tail.
  */
object ExactDedup {

  /** Annotate each row with keep/duplicate_of by hash of `col` (keep-first
    * by `order`). */
  def annotate(df: DataFrame, hashCol: Column, order: Column): DataFrame = {
    val w = Window.partitionBy(hashCol).orderBy(order)
    df.withColumn("dup_rank", row_number().over(w))
      .withColumn("duplicate_of", first(order).over(w))
      .withColumn("is_duplicate", col("dup_rank") > 1)
      .drop("dup_rank")
  }

  /** Keep-first distinct over a content hash. */
  def keepFirst(df: DataFrame, hashCol: Column, order: Column): DataFrame = {
    val w = Window.partitionBy(hashCol).orderBy(order)
    df.withColumn("dup_rank", row_number().over(w))
      .filter(col("dup_rank") === 1)
      .drop("dup_rank")
  }
}

/** MinHash signatures + LSH banding for near-duplicate detection at corpus
  * scale (SURVEY.md §2.6 D3 — absent in the reference, required by the
  * north star).
  *
  * Design for 10^12 docs: the signature is computed per-row in one pass
  * (no shingle explosion through a shuffle); only the b band hashes per doc
  * are exploded (b rows/doc), grouped by (band, hash) to get candidate
  * buckets, pairs verified by exact Jaccard, and keep-first resolved by
  * min-url-per-cluster. Total: one narrow map + two shuffles.
  */
object MinHash {

  val NumHashes = 128
  val Bands = 32
  val RowsPerBand = 4 // Bands * RowsPerBand == NumHashes
  val ShingleWords = 5

  /** (a,b) parameters of the 128 affine hash family. Deliberately
    * oracle-replicable: a is a 32-bit odd constant and values are masked to
    * 63 bits, so DuckDB can reproduce `(a*h+b) mod 2^63` in HUGEINT
    * arithmetic without 128-bit overflow (a*h < 2^96). Derived from
    * splitmix64 of the index — pure, seed-free, reproducible anywhere. */
  lazy val coeffs: Array[(Long, Long)] = Array.tabulate(NumHashes) { j =>
    val a = (graft.Hashing.mix64(0x5eed0001L + j) & 0xffffffffL) | 1L
    val b = graft.Hashing.mix64(0x5eed0002L + j) & Long.MaxValue
    (a, b)
  }

  /** Word 5-gram shingle hashes: md5-top-64 of the space-joined shingle
    * (DuckDB: ('0x'||substr(md5(s),1,16))::UBIGINT). Texts shorter than one
    * shingle hash the whole token string; empty → no shingles. */
  def shingles(text: String): Array[Long] = {
    val toks = tokenize(text)
    if (toks.length < ShingleWords) {
      if (toks.isEmpty) Array.empty
      else Array(graft.Hashing.md5Long(toks.mkString(" ")))
    } else {
      val out = new Array[Long](toks.length - ShingleWords + 1)
      var i = 0
      while (i <= toks.length - ShingleWords) {
        val sb = new StringBuilder
        var k = 0
        while (k < ShingleWords) { if (k > 0) sb.append(' '); sb.append(toks(i + k)); k += 1 }
        out(i) = graft.Hashing.md5Long(sb.toString)
        i += 1
      }
      out
    }
  }

  def tokenize(text: String): Array[String] =
    text.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty)

  /** 128-long MinHash signature of a text; empty text → all Long.MaxValue.
    * Each slot is min_j over shingles of (a_j*h + b_j) mod 2^63 — the 63-bit
    * mask keeps signed Long comparison == unsigned comparison and the empty
    * identity Long.MaxValue == the domain maximum. */
  def signature(text: String): Array[Long] = {
    val sh = shingles(text)
    val sig = Array.fill(NumHashes)(Long.MaxValue)
    var i = 0
    while (i < sh.length) {
      val h = sh(i)
      var j = 0
      while (j < NumHashes) {
        val (a, b) = coeffs(j)
        val v = (a * h + b) & Long.MaxValue
        if (v < sig(j)) sig(j) = v
        j += 1
      }
      i += 1
    }
    sig
  }

  /** Band hashes (Bands entries) of a signature. */
  def bandHashes(sig: Array[Long]): Array[Long] = {
    val out = new Array[Long](Bands)
    var b = 0
    while (b < Bands) {
      var h = 0xcbf29ce484222325L
      var r = 0
      while (r < RowsPerBand) {
        h ^= sig(b * RowsPerBand + r)
        h *= 0x100000001b3L
        r += 1
      }
      out(b) = h
      b += 1
    }
    out
  }

  def jaccard(a: Array[Long], b: Array[Long]): Double = {
    if (a.isEmpty && b.isEmpty) return 1.0
    val sa = a.toSet; val sb = b.toSet
    val inter = sa.intersect(sb).size
    val union = sa.size + sb.size - inter
    if (union == 0) 1.0 else inter.toDouble / union
  }

  /** Signature-estimated Jaccard. */
  def estJaccard(sigA: Array[Long], sigB: Array[Long]): Double = {
    var eq = 0; var i = 0
    while (i < NumHashes) { if (sigA(i) == sigB(i)) eq += 1; i += 1 }
    eq.toDouble / NumHashes
  }

  /** Full LSH near-dup pipeline over (id: String, text: String) columns.
    * Returns candidate pairs verified by exact shingle Jaccard >= threshold,
    * as (id_a, id_b, jaccard) with id_a < id_b.
    *
    * Plan shape: map (sig+bands) → explode bands (b rows/doc) →
    * groupBy(band, hash) self-pairing within small buckets → shuffle-join
    * texts back for verification. Bucket size is capped to keep the
    * pair-blowup bounded under adversarial skew (all-identical corpora).
    */
  def nearDupPairs(df: DataFrame, idCol: String, textCol: String,
                   threshold: Double = 0.8, maxBucket: Int = 64): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._

    val withBands = df
      .select(col(idCol).cast("string").as("id"), col(textCol).cast("string").as("text"))
      .as[(String, String)]
      .mapPartitions { it =>
        it.flatMap { case (id, text) =>
          val bands = bandHashes(signature(text))
          bands.iterator.zipWithIndex.map { case (h, b) => (id, b, h) }
        }
      }
      .toDF("id", "band", "bhash")

    // candidate pairs: ids sharing a (band, bhash) bucket
    val buckets = withBands
      .groupBy($"band", $"bhash")
      .agg(slice(sort_array(collect_list($"id")), 1, maxBucket).as("ids"))
      .filter(size($"ids") > 1)

    val pairs = buckets
      .select(explode(expr(
        "filter(flatten(transform(ids, (a, i) -> transform(slice(ids, i + 2, size(ids)), b -> struct(a, b)))), p -> p.a < p.b)"
      )).as("p"))
      .select($"p.a".as("id_a"), $"p.b".as("id_b"))
      .distinct()

    // verify with exact shingle Jaccard (join texts back; broadcast-unsafe
    // at scale, so plain shuffle joins on id)
    val texts = df.select(col(idCol).cast("string").as("id"), col(textCol).cast("string").as("text"))
    val verified = pairs
      .join(texts.withColumnRenamed("id", "id_a").withColumnRenamed("text", "text_a"), "id_a")
      .join(texts.withColumnRenamed("id", "id_b").withColumnRenamed("text", "text_b"), "id_b")
      .select($"id_a", $"id_b", $"text_a", $"text_b")
      .as[(String, String, String, String)]
      .map { case (idA, idB, textA, textB) =>
        (idA, idB, jaccard(shingles(textA), shingles(textB)))
      }
      .toDF("id_a", "id_b", "jaccard")
      .filter($"jaccard" >= threshold)
    verified.select($"id_a", $"id_b", round($"jaccard", 6).as("jaccard"))
  }

  /** Near-dup keep-first: drop every doc that has a verified neighbor with a
    * smaller id (single-link approximation of connected components — exact
    * for the pair/cluster shapes the corpus generator emits; iterate for
    * full CC if chains matter). */
  def dropNearDups(df: DataFrame, idCol: String, textCol: String,
                   threshold: Double = 0.8): DataFrame = {
    val losers = nearDupPairs(df, idCol, textCol, threshold)
      .select(col("id_b").as("loser")).distinct()
    df.join(losers, df(idCol).cast("string") === col("loser"), "left_anti")
  }
}

/** SimHash (Charikar) 64-bit fingerprints: near-dups have small Hamming
  * distance; candidate generation splits the fingerprint into 4 16-bit
  * tables so any pair within distance 3 shares at least one table key
  * (pigeonhole). */
object SimHash {

  /** Charikar fingerprint with term-frequency weights. The feature hash is
    * md5-top-64 (graft.Hashing.md5Long), so the DuckDB oracle can recompute
    * the identical fingerprint in SQL. */
  def simhash(text: String): Long = {
    val toks = MinHash.tokenize(text)
    if (toks.isEmpty) return 0L
    val acc = new Array[Int](64)
    // term-frequency weighting
    val tf = scala.collection.mutable.HashMap.empty[String, Int]
    toks.foreach(t => tf.update(t, tf.getOrElse(t, 0) + 1))
    tf.foreach { case (t, w) =>
      val h = graft.Hashing.md5Long(t)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) acc(b) += w else acc(b) -= w
        b += 1
      }
    }
    var out = 0L
    var b = 0
    while (b < 64) { if (acc(b) > 0) out |= (1L << b); b += 1 }
    out
  }

  def hamming(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)

  /** Near-dup pairs with Hamming distance <= maxDist over (id, text).
    *
    * Scale shape mirrors [[MinHash.nearDupPairs]]: band keys emitted in the
    * same narrow map that computes the fingerprint (4 rows/doc, no vector
    * payload), buckets capped at `maxBucket` members so a degenerate
    * all-identical corpus generates O(n * cap) pairs instead of O(n^2), and
    * the Hamming filter is the codegen'd native expression computed once. */
  def nearDupPairs(df: DataFrame, idCol: String, textCol: String, maxDist: Int = 3,
                   maxBucket: Int = 64): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    val banded = df
      .select(col(idCol).cast("string").as("id"), col(textCol).cast("string").as("text"))
      .as[(String, String)]
      .mapPartitions(_.flatMap { case (id, t) =>
        val s = simhash(t)
        (0 until 4).iterator.map(k => (id, s, k, (s >>> (k * 16)) & 0xffffL))
      })
      .toDF("id", "sim", "tbl", "key")
    val buckets = banded
      .groupBy($"tbl", $"key")
      .agg(slice(array_sort(collect_list(struct($"id", $"sim"))), 1, maxBucket).as("members"))
      .filter(size($"members") > 1)
    buckets
      .select(explode(expr(
        "filter(flatten(transform(members, (m, i) -> transform(slice(members, i + 2, size(members)), " +
        "n -> struct(m.id as id_a, n.id as id_b, m.sim as sim_a, n.sim as sim_b)))), p -> p.id_a < p.id_b)"
      )).as("p"))
      .select($"p.id_a".as("id_a"), $"p.id_b".as("id_b"), $"p.sim_a".as("sim_a"), $"p.sim_b".as("sim_b"))
      .distinct()
      .withColumn("hamming", graft.functions.GraftFunctions.hamming(col("sim_a"), col("sim_b")))
      .filter(col("hamming") <= maxDist)
      .select(col("id_a"), col("id_b"), col("hamming"))
  }
}
