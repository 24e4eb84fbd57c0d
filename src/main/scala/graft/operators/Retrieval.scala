package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Hybrid-retrieval rank fusion.
  *
  * Reciprocal-rank fusion (Cormack, Clarke & Buettcher, "Reciprocal Rank
  * Fusion outperforms Condorcet and individual Rank Learning Methods",
  * SIGIR 2009): fused(d) = Σ_legs 1/(k + rank_leg(d)), summed over the
  * legs that ranked d at all. Ranks are exact integers, so the score is
  * computed as the integer surrogate 1e6/(k+rank) under integer division
  * — bit-for-bit reproducible across engines, no float ever enters the
  * fusion (the same no-float trick the bm25/tfidf family uses).
  *
  * Scale shape: every leg is a bounded per-query top-K list (|queries|·K
  * rows — tiny by construction, whatever the corpus size), so fusion is
  * one union + one groupBy on (query_id, doc_id) over |queries|·ΣK rows
  * and a bounded per-query window. All corpus-sized work lives in the
  * legs; fusing L legs never touches the corpus again.
  */
object Retrieval {

  /** Fuse ranking legs into a per-query top-`k` list.
    *
    * Each leg must carry (query_id, doc_id, rank) with rank 1-based and
    * dense within the leg. Output: (query_id, rank, doc_id, rrf_score,
    * legs) where `legs` counts how many input legs ranked the doc —
    * consensus hits sort first at equal depth because they sum more
    * reciprocal terms, which is the whole point of RRF. Ties break on
    * doc_id so the cut is deterministic across engines. */
  def rrfFuse(legs: Seq[DataFrame], k: Int, rrfK: Int = 60): DataFrame = {
    require(legs.nonEmpty, "rrfFuse needs at least one ranking leg")
    val all = legs
      .map(_.select(col("query_id"), col("doc_id"), col("rank")))
      .reduce(_ unionByName _)
    val fused = all
      .withColumn("contrib", expr(s"1000000L div (${rrfK}L + rank)"))
      .groupBy(col("query_id"), col("doc_id"))
      .agg(sum(col("contrib")).as("rrf_score"), count(lit(1)).as("legs"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("rrf_score").desc, col("doc_id"))
    fused.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("doc_id"),
        col("rrf_score"), col("legs"))
  }

  /** The BM25 inverted index as a pushable store frame: token →
    * (df, members) where members are the token's postings —
    * (doc_id, tf, dl) structs sorted by doc_id, doc LENGTH DENORMALIZED
    * into the posting (the classic search-engine layout: scoring a
    * posting must not join a second doc-length store). The retrieval leg
    * of the store-backed index family (LSH dedup, IVF ANN, BM25 lexical).
    *
    * Scale: tokenize scan + two keyed aggs (tf, dl) + one token groupBy.
    * Posting lists of stop-word-grade terms are the hot-value concern —
    * `maxDf` drops tokens whose document frequency exceeds the cap BEFORE
    * the posting collect (the maxPostings pattern; BM25 barely weights
    * df ≈ n terms anyway, so a production cap near n/2 changes nothing a
    * stop-word-free query can retrieve — measured: the closed-vocab sf1
    * corpus' uncapped hot postings are ~all of the 6.7×/decade index
    * build growth). Default uncapped for the exactness oracle; chunk
    * oversized survivors (w9) if a domain term still explodes. */
  def bm25IndexFrame(docs: DataFrame, idCol: String, textCol: String,
      maxDf: Long = Long.MaxValue): DataFrame = {
    val toks = docs.select(col(idCol).as("doc_id"),
      explode(graft.functions.TextOps.tokens(col(textCol))).as("token"))
    val tf = toks.groupBy(col("doc_id"), col("token"))
      .agg(count(lit(1)).as("tf"))
    val dl = toks.groupBy(col("doc_id")).agg(count(lit(1)).as("dl"))
    // capped path pays a window over token — whose shuffle+sort the
    // groupBy below reuses (the ngramJaccardPairs co-partitioning trick);
    // uncapped (oracle) path skips it entirely
    val byToken =
      if (maxDf == Long.MaxValue) tf.join(dl, "doc_id")
      else tf.join(dl, "doc_id")
        .withColumn("__df", count(lit(1)).over(
          Window.partitionBy(col("token"))))
        .filter(col("__df") <= maxDf)
        .drop("__df")
    byToken
      .groupBy(col("token"))
      .agg(count(lit(1)).as("df"),
        sort_array(collect_list(struct(col("doc_id"), col("tf"), col("dl"))))
          .as("members"))
  }

  /** Corpus-constant store frame for [[bm25IndexFrame]]: one row,
    * n = corpus doc count, t = total token count. */
  def bm25StatsFrame(docs: DataFrame, idCol: String,
      textCol: String): DataFrame =
    docs.select(col(idCol).as("doc_id"),
        size(graft.functions.TextOps.tokens(col(textCol))).cast("long")
          .as("dl"))
      .filter(col("dl") > 0)
      .agg(lit(1).as("stats_id"), count(lit(1)).as("n"),
        sum(col("dl")).as("t"))

  /** SHARDED posting lists — the production layout for corpora whose
    * vocabulary is small relative to corpus size (this synthetic corpus is
    * the extreme: 31 tokens, so every posting list is ~6.5% of the corpus
    * and grows without bound; measured: the unsharded build OOMs its
    * aggregation buffers at sf10 while this layout builds fine). Key =
    * (token, shard) with shard = doc_id mod nShards: the hot token's
    * collect spreads over nShards reducers (the salting pattern) and every
    * store value is bounded by df/nShards. df is stored per shard row
    * (the token-level count) so the prober needs no extra round. A df CAP
    * (`bm25IndexFrame.maxDf`) is NOT the answer here: on a closed
    * vocabulary any binding cap drops the entire vocabulary — caps are for
    * open-vocab stop words (df ≈ n), sharding is for value size. */
  def bm25IndexFrameSharded(docs: DataFrame, idCol: String, textCol: String,
      nShards: Int): DataFrame = {
    require(nShards > 0, s"nShards must be positive, got $nShards")
    val toks = docs.select(col(idCol).as("doc_id"),
      explode(graft.functions.TextOps.tokens(col(textCol))).as("token"))
    val tf = toks.groupBy(col("doc_id"), col("token"))
      .agg(count(lit(1)).as("tf"))
    val dl = toks.groupBy(col("doc_id")).agg(count(lit(1)).as("dl"))
    // df via a PARTIAL-AGGREGATED token count, joined back — never a
    // window over token: a window partition holds the hot token's entire
    // posting and must SORT it (measured: that sort, not the sharded
    // collect, is what OOM'd a 16-shard build at sf10 — 6M rows in one
    // window partition), while the agg combines map-side to |vocab| rows
    val dfreq = tf.groupBy(col("token")).agg(count(lit(1)).as("df"))
    tf.join(dl, "doc_id")
      // shuffle-HASH, not sort-merge: the build side is ≤1 row per token
      // per partition while the probe side streams the hot posting — a
      // sort-merge join would re-buffer exactly the rows the window did
      .join(dfreq.hint("shuffle_hash"), "token")
      .groupBy(col("token"), pmod(col("doc_id"), lit(nShards)).as("shard"))
      .agg(max(col("df")).as("df"),
        sort_array(collect_list(struct(col("doc_id"), col("tf"), col("dl"))))
          .as("members"))
  }

  /** Recommended shard count for [[bm25IndexFrameSharded]]:
    * ⌈max df / targetPostingRows⌉ — the hottest token's posting list
    * divided by the per-store-value posting budget, so every (token,
    * shard) value stays bounded at ~targetPostingRows entries no matter
    * how the corpus grows (a pinned nShards re-inflates value size
    * linearly with the corpus; this formula is what keeps it flat at
    * 100 TB). One cheap aggregation pass — the tf/df frames it touches
    * are the same shapes the build recomputes, and df combines map-side
    * to |vocab| rows. targetPostingRows = 100k ⇒ a few MB per collected
    * posting array, well inside an executor's row budget. */
  def recommendedShards(docs: DataFrame, idCol: String, textCol: String,
      targetPostingRows: Long = 100000L): Int = {
    require(targetPostingRows > 0,
      s"targetPostingRows must be positive, got $targetPostingRows")
    val maxDf = docs.select(col(idCol).as("doc_id"),
        explode(graft.functions.TextOps.tokens(col(textCol))).as("token"))
      .groupBy(col("doc_id"), col("token")).agg(count(lit(1)))
      .groupBy(col("token")).agg(count(lit(1)).as("df"))
      .agg(coalesce(max(col("df")), lit(0L)))
      .collect()(0).getLong(0)
    math.max(1L, math.ceil(maxDf.toDouble / targetPostingRows).toLong)
      .min(Int.MaxValue).toInt
  }

  /** Probe the sharded index: the key set is tokens × all nShards shard
    * ids (a constant fan-out of point reads per token), members union
    * across shards, df read from any shard row. With the default
    * `maxFetch` the numbers equal the unsharded probe and the stateless
    * scorer by construction — the `bm25_index_sharded` oracle is
    * `bm25_retrieval`'s SQL verbatim.
    *
    * `maxFetch` is IMPACT-ORDERED EARLY TERMINATION (the WAND-family
    * idea, public knowledge): each fetched token's posting list is
    * truncated to its `maxFetch` highest-impact entries (tf desc, doc_id
    * tie-break) ONCE PER TOKEN before the query join, so scoring work is
    * O(query terms × maxFetch) instead of O(query terms × df). On a
    * closed-vocabulary corpus that bound is what keeps the probe alive:
    * every doc shares every term, so the exact join is quadratic in the
    * corpus (measured: the sf10 exact probe explodes ~7·10¹⁰ candidate
    * rows and dies; truncated, it's linear). The recall tradeoff is the
    * standard one — a doc ranked only by low-tf tails can be missed —
    * and the truncation is replayed exactly by the `bm25_index_topfetch`
    * oracle.
    *
    * Accident guard (exact path only): same Σ df budget as
    * [[probeBm25Index]] — the per-token df is already on every fetched
    * shard row, so the exact posting-explosion size is known BEFORE any
    * explode; inputs past `maxFetchedPostings` REFUSE with a pointer to
    * the bounded `maxFetch` mode instead of running a workload-quadratic
    * explode to OOM (measured at sf10: SPILL_OUT_OF_MEMORY without this
    * check). The truncated path is bounded by construction
    * (≤ tokens × maxFetch rows) and never consults the budget. */
  def probeBm25IndexSharded(engine: graft.core.GraftEngine, store: String,
      statsStore: String, queries: DataFrame, idCol: String,
      textCol: String, nShards: Int, topTerms: Int = 3,
      k: Int = 5, maxFetch: Int = Int.MaxValue,
      maxFetchedPostings: Long = 2000000000L): DataFrame = {
    val st = engine.servingView(statsStore).select(col("n"), col("t"))
      .collect()(0)
    val n = st.getLong(0)
    val t = st.getLong(1)
    val qtf = queries.select(col(idCol).as("query_id"),
        explode(graft.functions.TextOps.tokens(col(textCol))).as("token"))
      .groupBy(col("query_id"), col("token"))
      .agg(count(lit(1)).as("qtf"))
    val keySet = qtf.select(col("token")).distinct()
      .select(col("token"), explode(sequence(lit(0), lit(nShards - 1)))
        .as("shard"))
    val hits = engine.batchGet(store, keySet)
    // per-token view: df from any shard row, members = union across shards
    val byToken = hits.groupBy(col("token"))
      .agg(max(col("df")).as("df"),
        flatten(collect_list(col("members"))).as("members"))
    val wq = Window.partitionBy(col("query_id"))
      .orderBy(col("tscore").desc, col("token"))
    val qterms = qtf.join(byToken, "token")
      .withColumn("tscore", col("qtf") * expr(s"${n}L div df"))
      .withColumn("rk", row_number().over(wq))
      .filter(col("rk") <= topTerms)
    // two candidate shapes, each right for its regime:
    //  - EXACT (maxFetch = ∞): explode members per (query, token) — the
    //    quadratic output is inherent, and the per-qterm explode
    //    distributes it across qterm rows; a token-keyed join would
    //    funnel everything through |vocab| skewed join keys (measured
    //    4× slower at sf1 on the 31-token corpus).
    //  - TRUNCATED: explode ONCE per token, keep each token's maxFetch
    //    highest-impact entries, then join — the truncation must happen
    //    before the query join to bound the output at all.
    val cand =
      if (maxFetch == Int.MaxValue) {
        // budget check before the quadratic-capable explode — one scalar
        // agg over scalar columns (pruning keeps members out of the scan)
        val fetched = qterms.agg(coalesce(sum(col("df")), lit(0L)))
          .collect()(0).getLong(0)
        graft.core.Guard.admit(fetched <= maxFetchedPostings,
          s"probeBm25IndexSharded would explode $fetched posting rows for " +
            s"this query batch (budget $maxFetchedPostings) — the exact " +
            "probe is workload-quadratic on closed-vocabulary corpora. " +
            "Pass maxFetch (impact-ordered top-fetch, the " +
            "bm25_index_topfetch production path) for corpus-scale " +
            "serving, or raise maxFetchedPostings explicitly for a " +
            "deliberate exactness study.")
        qterms
          .select(col("query_id"), col("df"), explode(col("members")).as("m"))
          .select(col("query_id"), col("df"),
            col("m").getField("doc_id").as("doc_id"),
            col("m").getField("tf").as("tf"),
            col("m").getField("dl").as("dl"))
          .filter(col("doc_id") =!= col("query_id"))
      } else {
        val postings = byToken
          .select(col("token"), explode(col("members")).as("m"))
          .select(col("token"), col("m").getField("doc_id").as("doc_id"),
            col("m").getField("tf").as("tf"), col("m").getField("dl").as("dl"))
          .withColumn("__imp", row_number().over(
            Window.partitionBy(col("token"))
              .orderBy(col("tf").desc, col("doc_id"))))
          .filter(col("__imp") <= maxFetch)
          .drop("__imp")
        qterms.select(col("query_id"), col("token"), col("df"))
          .join(postings, "token")
          .filter(col("doc_id") =!= col("query_id"))
      }
    val wr = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("doc_id"))
    cand
      .withColumn("term_score",
        expr(s"((1000000L * (2L*${n}L - 2L*df + 1L)) div (2L*df + 1L)) * " +
          s"((44L * tf * ${t}L * 1000L) div " +
          s"(20L * tf * ${t}L + 6L * ${t}L + 18L * dl * ${n}L))"))
      .groupBy(col("query_id"), col("doc_id"))
      .agg(sum(col("term_score")).as("score"))
      .withColumn("rank", row_number().over(wr))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("doc_id"), col("score"))
  }

  /** Incremental BM25 index maintenance for NEW documents: the affected
    * tokens are exactly the delta's distinct tokens, so read their
    * current postings (batchGet point reads), merge in the new (doc_id,
    * tf, dl) entries, put the rebuilt postings through the RT log, and
    * bump the 1-row stats store — cost O(delta tokens + affected
    * postings). Everything the scorer reads (df from the posting row,
    * n/t from stats, tf/dl from members) is updated, so probes after an
    * upsert rank exactly as a full rebuild (PipelineSpec differential).
    * Document UPDATES/DELETES change old postings and are the repush
    * path's job, same as the reference's batch-push refresh. */
  def bm25IndexUpsert(engine: graft.core.GraftEngine, store: String,
      statsStore: String, delta: DataFrame, idCol: String, textCol: String,
      tsMs: Long): Unit = {
    val toks = delta.select(col(idCol).as("doc_id"),
      explode(graft.functions.TextOps.tokens(col(textCol))).as("token"))
    val tf = toks.groupBy(col("doc_id"), col("token"))
      .agg(count(lit(1)).as("tf"))
    val dl = toks.groupBy(col("doc_id")).agg(count(lit(1)).as("dl"))
    val fresh = tf.join(dl, "doc_id")
      .groupBy(col("token"))
      .agg(count(lit(1)).as("new_df"),
        collect_list(struct(col("doc_id"), col("tf"), col("dl")))
          .as("new_members"))
      .persist()
    val existing = engine.batchGet(store,
      fresh.select(col("token")).distinct())
    val rebuilt = fresh.join(existing, Seq("token"), "left")
      .select(col("token"),
        (coalesce(col("df"), lit(0L)) + col("new_df")).as("df"),
        array_sort(concat(
          coalesce(col("members"),
            array().cast(existing.schema("members").dataType)),
          col("new_members"))).as("members"))
    engine.put(store, rebuilt, tsMs)
    val prev = engine.servingView(statsStore)
      .select(col("stats_id"), col("n"), col("t")).collect()(0)
    val deltaStats = dl.agg(count(lit(1)).as("dn"), sum(col("dl")).as("dt"))
      .collect()(0)
    engine.put(statsStore,
      delta.sparkSession.createDataFrame(
        java.util.Arrays.asList(org.apache.spark.sql.Row(
          prev.getAs[Any]("stats_id"),
          prev.getLong(1) + deltaStats.getLong(0),
          prev.getLong(2) + deltaStats.getLong(1))),
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("stats_id",
            engine.servingView(statsStore).schema("stats_id").dataType),
          org.apache.spark.sql.types.StructField("n",
            org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("t",
            org.apache.spark.sql.types.LongType)))), tsMs)
    fresh.unpersist()
  }

  /** Serve BM25 top-`k` from the store-backed index: tokenize the query
    * batch, fetch its distinct tokens' postings in ONE batchGet round
    * (bucket-set-pruned point reads — the corpus is never scanned), pick
    * the `topTerms` highest-leverage query terms from the FETCHED df
    * values, score the already-fetched postings with the exact integer
    * BM25 surrogate, rank. Corpus stats come from the 1-row stats store.
    *
    * Identical numbers to the stateless scorer by construction
    * (`ann`-style pin: the `bm25_index_probe` oracle is
    * `bm25_retrieval`'s SQL verbatim). Per-query-batch cost is
    * O(query tokens + fetched postings) — independent of corpus size for
    * fixed vocabulary overlap; index maintenance = incremental push /
    * repush of changed tokens' postings.
    *
    * Accident guard: on a closed-vocabulary corpus the selected query
    * terms' df values each grow with n, so the exploded posting count is
    * workload-quadratic (measured ~7·10¹⁰ candidate rows at sf10 — the
    * query dies). The exact fetched-posting count Σ df over the selected
    * (query, term) pairs is known from the already-fetched df column
    * BEFORE any explode; inputs past `maxFetchedPostings` are REFUSED
    * with a pointer to [[probeBm25IndexSharded]]'s impact-ordered
    * top-fetch (the bm25_index_topfetch production path). */
  def probeBm25Index(engine: graft.core.GraftEngine, store: String,
      statsStore: String, queries: DataFrame, idCol: String,
      textCol: String, topTerms: Int = 3, k: Int = 5,
      maxFetchedPostings: Long = 2000000000L): DataFrame = {
    val st = engine.servingView(statsStore).select(col("n"), col("t"))
      .collect()(0)
    val n = st.getLong(0)
    val t = st.getLong(1)
    val qtf = queries.select(col(idCol).as("query_id"),
        explode(graft.functions.TextOps.tokens(col(textCol))).as("token"))
      .groupBy(col("query_id"), col("token"))
      .agg(count(lit(1)).as("qtf"))
    val hits = engine.batchGet(store, qtf.select(col("token")).distinct())
    val wq = Window.partitionBy(col("query_id"))
      .orderBy(col("tscore").desc, col("token"))
    val qterms = qtf.join(hits, "token")
      .withColumn("tscore", col("qtf") * expr(s"${n}L div df"))
      .withColumn("rk", row_number().over(wq))
      .filter(col("rk") <= topTerms)
    // budget check is one scalar agg over scalar columns (column pruning
    // keeps the members arrays out of the scan) — the explode below is
    // the quadratic-capable step, so it never runs on refused input
    val fetched = qterms.agg(coalesce(sum(col("df")), lit(0L)))
      .collect()(0).getLong(0)
    graft.core.Guard.admit(fetched <= maxFetchedPostings,
      s"probeBm25Index would explode $fetched posting rows for this " +
        s"query batch (budget $maxFetchedPostings) — the exact probe is " +
        "workload-quadratic on closed-vocabulary corpora. Use " +
        "probeBm25IndexSharded's impact-ordered top-fetch (the " +
        "bm25_index_topfetch production path) for corpus-scale serving, " +
        "or raise maxFetchedPostings explicitly for a deliberate " +
        "exactness study.")
    val cand = qterms
      .select(col("query_id"), col("df"), explode(col("members")).as("m"))
      .select(col("query_id"), col("df"), col("m").getField("doc_id").as("doc_id"),
        col("m").getField("tf").as("tf"), col("m").getField("dl").as("dl"))
      .filter(col("doc_id") =!= col("query_id"))
    val wr = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("doc_id"))
    cand
      .withColumn("term_score",
        expr(s"((1000000L * (2L*${n}L - 2L*df + 1L)) div (2L*df + 1L)) * " +
          s"((44L * tf * ${t}L * 1000L) div " +
          s"(20L * tf * ${t}L + 6L * ${t}L + 18L * dl * ${n}L))"))
      .groupBy(col("query_id"), col("doc_id"))
      .agg(sum(col("term_score")).as("score"))
      .withColumn("rank", row_number().over(wr))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("doc_id"), col("score"))
  }
}
