package graft.index

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** TF-IDF/BM25 inverted index + retrieval join — the zero-egress replacement
  * for the reference's remote-embedding + Chroma vector top-k
  * (SURVEY.md §2.8 R2/R4; reference: src/utils/course_outline/rag_py.py:266-291,
  * Chroma HNSW config convert_to_embeddings.py:524).
  *
  * Everything is built-in expressions — tokenize/explode/groupBy — so the
  * whole build is two hash aggregates with map-side partials, and retrieval
  * is a semi-join on term + one TakeOrderedAndProject.
  *
  * FROZEN scoring constants: k1 = 1.2, b = 0.75,
  * idf = ln((N - df + 0.5)/(df + 0.5) + 1)  (the Robertson/Sparck-Jones form
  * used by Lucene; published formula, public knowledge).
  */
object Bm25 {

  val K1 = 1.2
  val B = 0.75

  /** Lowercase alphanumeric tokenizer as a Column (matches
    * MinHash.tokenize). */
  def tokensCol(text: Column): Column =
    filter(split(lower(text), "[^a-z0-9]+"), t => length(t) > 0)

  /** Term frequencies per (doc, term): one explode + one aggregate. */
  def termFreq(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol).as("doc"), explode(tokensCol(col(textCol))).as("term"))
      .groupBy("doc", "term").agg(count(lit(1)).as("tf"))

  /** Document lengths (token counts). */
  def docLen(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol).as("doc"), size(tokensCol(col(textCol))).cast("long").as("dl"))

  final case class Index(postings: DataFrame, docLens: DataFrame) {
    /** Driver-side corpus stats — LAZY, one pass over docLens only if a
      * caller actually needs the scalars (specs). The production build path
      * (IndexJob.build) instead rides these metrics on the doclen WRITE via
      * observe(), so building a segment stays a zero-extra-pass operation
      * at 100 TB. */
    lazy val stats: (Long, Double) = {
      val r = docLens.agg(count(lit(1)).as("n"),
        coalesce(avg(col("dl").cast("double")), lit(0.0)).as("avgdl")).head()
      (r.getLong(0), r.getDouble(1))
    }
    def nDocs: Long = stats._1
    def avgdl: Double = stats._2
  }

  /** Build the index tables. postings: (term, df, postings ARRAY<STRUCT<doc,tf>>)
    * materialization-ready (SURVEY.md §2.8 R4); docLens: (doc, dl). Pure
    * plan construction — no driver action happens here. */
  def build(docs: DataFrame, idCol: String, textCol: String): Index = {
    val tf = termFreq(docs, idCol, textCol)
    // dl from tf (one tokenize; see scoredAll). Token-empty docs carry no
    // terms, so excluding them from doclen/stats matches retrieval exactly.
    val dl = tf.groupBy("doc").agg(sum("tf").as("dl"))
    // EXPLICIT-width repartition by term before the list aggregate:
    // partial aggregation buys nothing for collect_list (the partial
    // buffers carry every row — same shuffle bytes as the raw tf rows)
    // while its final merge concentrates on however few partitions AQE
    // coalesces the tiny-statistics exchange to; hot terms (stopword-class
    // posting lists are corpus-sized) then build+sort+write on ONE task
    // (measured: a 7.7 s single-task stage on a 34-term vocabulary).
    // Pre-clustered input turns the aggregate single-phase — each task
    // builds complete per-term lists directly — and the explicit
    // cores-derived width (defaultParallelism, cluster-scaled, not a
    // local constant) keeps the build wide. Array content and order are
    // unchanged (sort_array sorts the finished list).
    val parts = math.max(tf.sparkSession.sparkContext.defaultParallelism, 1)
    val postings = tf.repartition(parts, col("term")).groupBy("term")
      .agg(count(lit(1)).as("df"),
        sort_array(collect_list(struct(col("doc"), col("tf")))).as("postings"))
    Index(postings, dl)
  }

  /** Classic TF-IDF scoring (the north star's other scorer): score =
    * Σ_q tf · ln((N+1)/(df+1)). Same plan shape as BM25 — broadcast query
    * terms, window df, one aggregate. Rounded for oracle parity. */
  def tfidfScores(docs: DataFrame, idCol: String, textCol: String, query: String): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val tf = termFreq(docs, idCol, textCol)
    // N = row count (ids are unique by caller contract — same contract the
    // build path's dedup enforces). count() over zero columns resolves from
    // parquet footer stats: no tokenize pass, no distinct shuffle.
    val n = docs.count()
    val qTerms = graft.dedup.MinHash.tokenize(query).distinct.toSeq.toDF("term")
    val wTerm = org.apache.spark.sql.expressions.Window.partitionBy("term")
    tf.join(broadcast(qTerms), "term")
      .withColumn("df", count(lit(1)).over(wTerm))
      .withColumn("w", col("tf").cast("double") *
        log((lit(n.toDouble) + 1.0) / (col("df").cast("double") + 1.0)))
      .groupBy(col("doc"))
      .agg(round(sum("w"), 4).as("score"))
  }

  /** All matching docs with rounded BM25 scores (no top-k cutoff) — the
    * oracle-comparable form: rounding avoids cross-engine ulp noise and no
    * LIMIT means no boundary sensitivity. */
  def scores(docs: DataFrame, idCol: String, textCol: String, query: String): DataFrame =
    scoredAll(docs, idCol, textCol, query)
      .select(col("doc"), round(col("score"), 4).as("score"))

  /** Score all docs for a query string; returns (doc, score) top-k.
    *
    * Plan: tiny query-term table (broadcast) semi-joins the flat (doc, term,
    * tf) relation — the 100-TB-scale shape: the big side is shuffled by term
    * once at build time, the query side is <100 rows, and top-k is
    * TakeOrderedAndProject (no global sort).
    */
  def search(docs: DataFrame, idCol: String, textCol: String, query: String, k: Int): DataFrame =
    scoredAll(docs, idCol, textCol, query)
      .orderBy(desc("score"), asc("doc"))
      .limit(k)
      .select(col("doc"), round(col("score"), 4).as("score"))

  /** Champion-list retrieval (the index-pruning scheme of Manning,
    * Raghavan & Schütze, IIR §7.1.3): per query term keep only the `r`
    * docs with the highest tf (ties to the smaller doc — an ALL-INTEGER
    * selection), then score the candidate UNION exactly with full-corpus
    * BM25 statistics. The approximation is the candidate CUT, not the
    * scores: a doc outside every champion list cannot be returned — the
    * published trade that bounds per-query work by |query|·r candidate
    * rows instead of the full posting lists (at 100 TB a stop-word-ish
    * query term's posting list is corpus-sized; its champions are r rows).
    * Deterministic end-to-end: integer champion selection + the [[scores]]
    * float discipline on the candidate set.
    *
    * Plan shape: ONE corpus tokenize (the scoredAll-shared tf subtree);
    * champions are a `row_number ≤ r` window directly above the
    * query-pruned tf — WindowGroupLimit map-side truncation per term; the
    * candidate semi-join bounds every downstream row count. Returns ALL
    * candidates with rounded scores (callers cut top-k; no boundary-
    * sensitive limit inside). */
  def championSearch(docs: DataFrame, idCol: String, textCol: String,
                     query: String, r: Int): DataFrame = {
    require(r >= 1, s"r $r")
    val scored = scoredAll(docs, idCol, textCol, query)
    val qTerms = graft.dedup.MinHash.tokenize(query).distinct.toSeq
    val spark = docs.sparkSession
    import spark.implicits._
    val tf = termFreq(docs.filter(col(idCol).isNotNull), idCol, textCol)
      .join(broadcast(qTerms.toDF("term")), "term")
    val wTerm = org.apache.spark.sql.expressions.Window
      .partitionBy("term").orderBy(desc("tf"), asc("doc"))
    val candidates = tf
      .withColumn("__graft_champ_rn", row_number().over(wTerm))
      .filter(col("__graft_champ_rn") <= r)
      .select("doc").distinct()
    scored.join(candidates, Seq("doc"), "left_semi")
      .select(col("doc"), round(col("score"), 4).as("score"))
  }

  /** MaxScore-pruned EXACT top-k retrieval (Turtle & Flood 1995; the
    * upper-bound family behind Lucene's MaxScore/block-max WAND), adapted
    * to the dataflow shape: unlike [[championSearch]] the cut here is
    * provably LOSSLESS — the result is bit-identical to full-corpus
    * scoring under the rounded-(score DESC, doc) total order (the order
    * the oracle pins; [[search]]'s raw-score-order cut can differ from it
    * exactly when ranks k and k+1 tie at 4 dp), only the rescoring work
    * shrinks.
    *
    * Three bounded phases over the query-pruned posting relation:
    *  1. seed a threshold θ: exact-score the per-term champion docs
    *     (top-`seedR` by integer (tf DESC, doc) — WindowGroupLimit) and
    *     take the k-th best RAW score (θ = -∞ when fewer than k seeds:
    *     a subset's k-th best is a valid lower bound of the corpus k-th
    *     best only when the subset has k members);
    *  2. prune: per matched doc an upper bound Σ_t idf(t)·(k1+1) — the
    *     tf-saturation supremum, so ub ≥ score(doc) always — computed
    *     WITHOUT the doc-length join (df-only arithmetic); docs with
    *     ub < θ − 1e-4 cannot enter the top-k EVEN under the 4-dp
    *     rounded-score contract (a doc tying the k-th rounded score is
    *     within half a quantum of θ; the full-quantum slack covers that
    *     plus representation error — the CLAUDE.md float discipline
    *     applied to a pruning predicate);
    *  3. exact-rescore survivors with full-corpus statistics and cut
    *     top-k on (rounded score DESC, doc) — a total order, so
    *     orderBy+limit (TakeOrderedAndProject) equals the oracle's
    *     row_number cut.
    *
    * At 100 TB: every per-doc branch is bounded by the query-matched
    * posting rows; the dl join and float scoring run only over seed ∪
    * survivor docs — the published saving, with docs matching only
    * low-idf (stop-word-ish) terms dropped before any length
    * normalization is computed. */
  def maxScoreSearch(docs: DataFrame, idCol: String, textCol: String,
                     query: String, k: Int, seedR: Int = 25): DataFrame =
    maxScoreParts(docs, idCol, textCol, query, k, seedR)._1

  /** [[maxScoreSearch]] plus its diagnostics legs, for specs: returns
    * (topk, survivors (doc), matched (doc)) — survivors ⊂ matched is the
    * evidence the bound binds. */
  private[graft] def maxScoreParts(docs: DataFrame, idCol: String, textCol: String,
                                   query: String, k: Int, seedR: Int):
      (DataFrame, DataFrame, DataFrame) = {
    require(k >= 1, s"k $k")
    require(seedR >= 1, s"seedR $seedR")
    val spark = docs.sparkSession
    import spark.implicits._
    val scored = scoredAll(docs, idCol, textCol, query)
    val qTerms = graft.dedup.MinHash.tokenize(query).distinct.toSeq
    // mirror scoredAll's subtrees exactly (same filter, same aggregates) so
    // AQE's stage cache reuses the corpus tokenize across every leg
    val tfAll = termFreq(docs.filter(col(idCol).isNotNull), idCol, textCol)
    val dl = tfAll.groupBy("doc").agg(sum("tf").as("dl"))
    // identical aggregate shape to scoredAll's stats (n AND avgdl) even
    // though only n is read here — canonical-equal subtrees stage-cache
    val stats = dl.agg(count(lit(1)).cast("double").as("n"),
      avg(col("dl").cast("double")).as("avgdl"))
    val wTerm = org.apache.spark.sql.expressions.Window.partitionBy("term")
    val matchedTf = tfAll.join(broadcast(qTerms.toDF("term")), "term")
      .withColumn("df", count(lit(1)).over(wTerm))
    // phase 1 — θ from exact champion scores (raw doubles, pre-rounding)
    val wChamp = org.apache.spark.sql.expressions.Window
      .partitionBy("term").orderBy(desc("tf"), asc("doc"))
    val ranked = matchedTf.withColumn("__graft_ms_rn", row_number().over(wChamp))
    val seeds = ranked
      .filter(col("__graft_ms_rn") <= seedR)
      .select("doc").distinct()
    val theta = scored.join(seeds, Seq("doc"), "left_semi")
      .orderBy(desc("score"), asc("doc")).limit(k)
      .agg(count(lit(1)).as("c"), min("score").as("m"))
      .select(when(col("c") < k, lit(Double.MinValue))
        .otherwise(col("m")).as("theta"))
    // phase 2 — df-only saturation bound, no dl join. Built over the SAME
    // ranked relation as the seeds, with no-op references to the rank and
    // avgdl columns (0·x terms): without them Catalyst's per-branch column
    // pruning forks this subtree into its own narrower aggregate chain and
    // the corpus tokenize runs THREE times instead of once (plan-audited;
    // the no-ops make every leg canonical-equal so AQE's stage cache
    // reuses one tokenize+shuffle across seed/ub/rescore).
    val survivors = ranked.crossJoin(broadcast(stats))
      .withColumn("idf", log(lit(1.0) +
        (col("n") - col("df").cast("double") + lit(0.5)) / (col("df").cast("double") + lit(0.5)))
        + lit(0.0) * col("avgdl"))
      .groupBy("doc").agg(sum(col("idf") * lit(K1 + 1.0)
        + lit(0.0) * col("__graft_ms_rn")).as("ub"))
      .crossJoin(broadcast(theta))
      .filter(col("ub") >= col("theta") - lit(1e-4))
      .select("doc")
    // phase 3 — exact rescore of survivors only, rounded-order top-k
    val topk = scored.join(survivors, Seq("doc"), "left_semi")
      .select(col("doc"), round(col("score"), 4).as("score"))
      .orderBy(desc("score"), asc("doc"))
      .limit(k)
    (topk, survivors, matchedTf.select("doc").distinct())
  }

  /** The θ-seed convention shared by the pruned-top-k variants: per-term
    * champions by integer (tf DESC, doc) — a WindowGroupLimit cut —
    * exactly scored, θ = the k-th best RAW score, −∞ when fewer than k
    * seeds (a subset's k-th best lower-bounds the corpus k-th best only
    * at full k). [[maxScoreParts]] and IndexJob.topkSearch keep this
    * FUSED into their own `ranked` relation on purpose — their survivor
    * legs share that exact subtree (0·x-pinned) for stage-cache reuse —
    * so any change to the convention here must be mirrored there. */
  private def thetaSeed(matchedTf: DataFrame, scored: DataFrame,
                        k: Int, seedR: Int): DataFrame = {
    val wChamp = org.apache.spark.sql.expressions.Window
      .partitionBy("term").orderBy(desc("tf"), asc("doc"))
    val seeds = matchedTf
      .withColumn("__graft_ms_rn", row_number().over(wChamp))
      .filter(col("__graft_ms_rn") <= seedR)
      .select("doc").distinct()
    scored.join(seeds, Seq("doc"), "left_semi")
      .orderBy(desc("score"), asc("doc")).limit(k)
      .agg(count(lit(1)).as("c"), min("score").as("m"))
      .select(when(col("c") < k, lit(Double.MinValue))
        .otherwise(col("m")).as("theta"))
  }

  /** Block-Max WAND-pruned EXACT top-k (Ding & Suel, SIGIR'11 "Faster
    * top-k document retrieval using block-max indexes"), adapted to the
    * dataflow shape: [[maxScoreSearch]] with the pruning bound sharpened
    * from the per-TERM tf-saturation supremum idf·(k1+1) to the per-BLOCK
    * one — posting rows sort by doc within term and split into
    * `blockSize`-row blocks (the same layout [[PostingsCodec]] compresses),
    * each block contributes at most
    *
    *   idf·(k1+1)·bm/(bm + k1·(1−b))      bm = max tf in the block
    *
    * (tf/(tf+c) is increasing in tf and the dl term of the BM25
    * denominator is ≥ 0, so the bound dominates every member's true
    * contribution while reading NO document length). A doc's upper bound
    * sums its blocks' bounds — strictly tighter than MaxScore's whenever
    * any block's bm is finite, so the survivor set only shrinks: the
    * block-granular metadata is what turns a stop-word-ish term from "every
    * matched doc survives at idf·(k1+1)" into "only docs in high-tf blocks
    * survive". Same θ seeding, same θ − 1e-4 rounding slack, same exact
    * rescore — the cut stays provably LOSSLESS under the rounded-(score
    * DESC, doc) order the oracle pins.
    *
    * At 100 TB the block assignment is one extra `row_number` ride on the
    * already-required term exchange (block max is a window over (term,
    * block) — clustering-satisfied by the term partitioning, no new
    * shuffle), and the dl join + float scoring still run only over seed ∪
    * survivor docs — the published BMW saving in dataflow form. */
  def blockMaxSearch(docs: DataFrame, idCol: String, textCol: String,
                     query: String, k: Int, seedR: Int = 25,
                     blockSize: Int = 128): DataFrame =
    blockMaxParts(docs, idCol, textCol, query, k, seedR, blockSize)._1

  /** [[blockMaxSearch]] plus diagnostics legs: (topk, survivors (doc),
    * matched (doc)) — with [[maxScoreParts]]' survivors on the same seeds,
    * specs assert the block bound is a strict refinement. */
  private[graft] def blockMaxParts(docs: DataFrame, idCol: String, textCol: String,
                                   query: String, k: Int, seedR: Int, blockSize: Int):
      (DataFrame, DataFrame, DataFrame) = {
    require(k >= 1, s"k $k")
    require(seedR >= 1, s"seedR $seedR")
    require(blockSize >= 1, s"blockSize $blockSize")
    val spark = docs.sparkSession
    import spark.implicits._
    val scored = scoredAll(docs, idCol, textCol, query)
    val qTerms = graft.dedup.MinHash.tokenize(query).distinct.toSeq
    // subtrees mirror scoredAll exactly (same filter, same aggregates) so
    // AQE's stage cache reuses the corpus tokenize across every leg — the
    // maxScoreParts plan-audit discipline
    val tfAll = termFreq(docs.filter(col(idCol).isNotNull), idCol, textCol)
    val dl = tfAll.groupBy("doc").agg(sum("tf").as("dl"))
    val stats = dl.agg(count(lit(1)).cast("double").as("n"),
      avg(col("dl").cast("double")).as("avgdl"))
    val wTerm = org.apache.spark.sql.expressions.Window.partitionBy("term")
    val matchedTf = tfAll.join(broadcast(qTerms.toDF("term")), "term")
      .withColumn("df", count(lit(1)).over(wTerm))
    // phase 1 — θ from exact champion scores (the shared [[thetaSeed]]:
    // its single-window stack sits directly under the rank filter — the
    // WindowGroupLimit adjacency — and both it and the block stack below
    // hang off the SAME df-window term exchange of `matchedTf`, so the
    // corpus-side subtree shuffles once; only the tiny post-exchange
    // window legs fork)
    val theta = thetaSeed(matchedTf, scored, k, seedR)
    // block layout ride: doc-order row number assigns PostingsCodec's
    // blocks; the block max is a window clustered by (term, block) —
    // satisfied by the term hash partitioning, no second shuffle
    val wDoc = org.apache.spark.sql.expressions.Window
      .partitionBy("term").orderBy("doc")
    val blocked = matchedTf
      .withColumn("__graft_bmw_rn0", row_number().over(wDoc) - 1)
      .withColumn("__graft_bmw_block", expr(s"cast(__graft_bmw_rn0 div $blockSize as bigint)"))
    val wBlock = org.apache.spark.sql.expressions.Window
      .partitionBy("term", "__graft_bmw_block")
    // phase 2 — per-block saturation bound, no dl join. The 0·avgdl no-op
    // keeps the broadcast stats subtree identical to scoredAll's (pruning
    // it to n-only forks the dl aggregate into a second corpus tokenize —
    // the maxScoreParts per-branch-pruning lesson).
    val survivors = blocked
      .withColumn("__graft_bmw_bm", max("tf").over(wBlock))
      .crossJoin(broadcast(stats))
      .withColumn("idf", log(lit(1.0) +
        (col("n") - col("df").cast("double") + lit(0.5)) / (col("df").cast("double") + lit(0.5)))
        + lit(0.0) * col("avgdl"))
      .groupBy("doc").agg(sum(
        col("idf") * lit(K1 + 1.0) * col("__graft_bmw_bm").cast("double") /
          (col("__graft_bmw_bm").cast("double") + lit(K1 * (1.0 - B)))).as("ub"))
      .crossJoin(broadcast(theta))
      .filter(col("ub") >= col("theta") - lit(1e-4))
      .select("doc")
    // phase 3 — exact rescore of survivors only, rounded-order top-k
    val topk = scored.join(survivors, Seq("doc"), "left_semi")
      .select(col("doc"), round(col("score"), 4).as("score"))
      .orderBy(desc("score"), asc("doc"))
      .limit(k)
    (topk, survivors, matchedTf.select("doc").distinct())
  }

  /** Exact-phrase occurrence counts per doc (positional retrieval — the
    * query class BM25's bag-of-words scoring cannot express).
    *
    * Single-shuffle slot-fill formulation: every occurrence of phrase term
    * i at token position p claims anchor position p - i; an anchor whose k
    * distinct slots are all claimed is a genuine phrase occurrence
    * (token positions are unique within a doc, so slot i can only be
    * claimed by a token equal to phrase[i] at exactly anchor + i — which
    * also makes count(*) == count(distinct slot), sparing the aggregate an
    * Expand). The exploded token relation is filtered by the broadcast
    * k-row slot table BEFORE the one (doc, anchor) exchange — the 100-TB
    * shape: only phrase-term occurrences ever shuffle, overlapping and
    * repeated-term phrases fall out of the same arithmetic.
    *
    * @return (doc, n_matches) for docs containing the phrase at least once.
    */
  def phraseMatches(docs: DataFrame, idCol: String, textCol: String, phrase: String): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val terms = graft.dedup.MinHash.tokenize(phrase).toSeq
    require(terms.nonEmpty, "phrase must contain at least one token")
    val k = terms.length
    val slots = terms.zipWithIndex.toDF("term", "slot")
    docs.filter(col(idCol).isNotNull)
      .select(col(idCol).as("doc"), posexplode(tokensCol(col(textCol))).as(Seq("pos", "term")))
      .join(broadcast(slots), "term")
      .select(col("doc"), (col("pos") - col("slot")).as("anchor"))
      .filter(col("anchor") >= 0)
      .groupBy("doc", "anchor")
      .agg(count(lit(1)).as("filled"))
      .filter(col("filled") === k)
      .groupBy("doc")
      .agg(count(lit(1)).as("n_matches"))
  }

  /** Proximity co-occurrence window counts — the positional feature
    * class BETWEEN bag-of-words BM25 and exact phrases (the Büttcher/
    * Clarke term-proximity family): per doc, the number of token
    * positions `a` whose width-`w` window [a, a+w) contains ALL query
    * terms, in any order. Docs where the terms cluster tightly score
    * many windows; docs that merely mention them far apart score none.
    *
    * Interval slot-fill formulation (the [[phraseMatches]] shape with
    * intervals instead of exact offsets): an occurrence of term t at
    * position p covers anchors [p−w+1, p]; an anchor covered by every
    * distinct query term is a counted window. Only query-term
    * occurrences explode (×w, both query-bounded), the one exchange is
    * the (doc, anchor) aggregate, everything is integer. */
  def proximityWindows(docs: DataFrame, idCol: String, textCol: String,
                       query: String, w: Int): DataFrame =
    proximityOf(
      docs.filter(col(idCol).isNotNull)
        .select(col(idCol).as("doc"),
          posexplode(tokensCol(col(textCol))).as(Seq("pos", "term"))),
      query, w)

  /** [[proximityWindows]] over an arbitrary (doc, pos, term) positional
    * relation — shared with the index-resident form
    * (IndexJob.proximitySearch). */
  private[graft] def proximityOf(pos: DataFrame, query: String, w: Int): DataFrame = {
    require(w >= 1, s"window width $w")
    val spark = pos.sparkSession
    import spark.implicits._
    val terms = graft.dedup.MinHash.tokenize(query).distinct.toSeq
    require(terms.nonEmpty, "query must contain at least one token")
    pos.join(broadcast(terms.toDF("term")), "term")
      .select(col("doc"), col("term"),
        explode(expr(s"sequence(greatest(pos - ${w - 1}, 0), pos)")).as("a"))
      .distinct()
      .groupBy("doc", "a").agg(count(lit(1)).as("filled"))
      .filter(col("filled") === terms.length)
      .groupBy("doc").agg(count(lit(1)).as("n_windows"))
  }

  private[graft] def scoredAll(docs: DataFrame, idCol: String, textCol: String, query: String): DataFrame = {
    // explicit isnotnull(id) on the SHARED input: the dl join side gets this
    // filter pushed from the equi-join anyway, the tf side does not (a
    // Window blocks the pushdown) — without it the two subtrees canonicalize
    // differently and AQE's stage cache cannot reuse the tokenize exchange.
    // Semantically a no-op (null ids never survive the equi-join).
    scoredAllFromTf(termFreq(docs.filter(col(idCol).isNotNull), idCol, textCol), query)
  }

  /** [[scoredAll]] from a PRECOMPUTED (doc, term, tf) relation — the same
    * plan body, split out so multi-pass callers (PRF's feedback pass +
    * expanded re-score) can tokenize the corpus once, materialize the tf
    * relation, and feed both passes from it. */
  private[graft] def scoredAllFromTf(tf: DataFrame, query: String): DataFrame = {
    val spark = tf.sparkSession
    import spark.implicits._
    // dl derived from tf (dl == Σ_term tf, definitionally — and identically
    // to the oracle, whose dl also comes from the token relation): ONE
    // tokenize of the corpus instead of two. The (doc,term) aggregate
    // subtree is shared between tf and dl, so ReuseExchange materializes the
    // tokenize+shuffle once — at 100 TB tokenization is the dominant scan
    // cost, so this halves it.
    val dl = tf.groupBy("doc").agg(sum("tf").as("dl"))
    // corpus stats as a broadcast 1-row relation instead of an eager head():
    // no extra driver action per call — the whole score is one job.
    val stats = dl.agg(count(lit(1)).cast("double").as("n"),
      avg(col("dl").cast("double")).as("avgdl"))

    val qTerms = graft.dedup.MinHash.tokenize(query).distinct.toSeq.toDF("term")
    // df via a window over the already-filtered tf relation: (doc,term) rows
    // are unique, so count(*) over term == document frequency. This avoids a
    // third tokenize+aggregate subtree.
    val wTerm = org.apache.spark.sql.expressions.Window.partitionBy("term")
    tf.join(broadcast(qTerms), "term")
      .withColumn("df", count(lit(1)).over(wTerm))
      .join(dl, "doc")
      .crossJoin(broadcast(stats))
      .withColumn("idf", log(lit(1.0) + (col("n") - col("df").cast("double") + lit(0.5)) / (col("df").cast("double") + lit(0.5))))
      .withColumn("score",
        col("idf") * (col("tf").cast("double") * (lit(K1) + 1.0)) /
          (col("tf").cast("double") + lit(K1) * (lit(1.0) - lit(B) + lit(B) * col("dl").cast("double") / col("avgdl"))))
      .groupBy("doc").agg(sum("score").as("score"))
  }
}
