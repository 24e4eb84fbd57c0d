package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextOps

/** Document deduplication for training-data pipelines: exact, MinHash+LSH,
  * SimHash, and n-gram-Jaccard near-dup detection.
  *
  * Everything is hash-join shaped (no cross joins): candidate generation is
  * an equi-join on bucket keys (LSH bands / simhash bands / shared shingles),
  * so the work scales with bucket sizes, not n². All hashing is md5-based and
  * reproducible in the DuckDB oracle.
  */
object Dedup {

  /** Exact dedup on the normalized-text fingerprint: one shuffle on the
    * 128-bit fingerprint; keeper = min id (deterministic). */
  def exact(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.groupBy(TextOps.fingerprint(col(textCol)).as("fingerprint"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("copies"))

  /** Incremental exact dedup — the production crawl shape: flag each NEW
    * batch document that duplicates the EXISTING corpus (left-semi on the
    * fingerprint — the corpus side ships only its distinct fingerprints,
    * never its text) or an earlier row of the same batch (min-id keeper
    * within the batch fingerprint group). One fingerprint shuffle each;
    * at 100 TB the corpus fingerprint set is a fraction of corpus bytes
    * and both joins are plain equi-joins.
    *
    * Output: every batch row with `dup_of_corpus` / `dup_in_batch` flags —
    * keep = NOT(dup_of_corpus) AND NOT(dup_in_batch).
    */
  def incrementalExact(corpus: DataFrame, batch: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val corpusFp = corpus
      .select(TextOps.fingerprint(col(textCol)).as("fingerprint")).distinct()
    val batchFp = batch.select(col(idCol).as("id"),
      TextOps.fingerprint(col(textCol)).as("fingerprint"))
    val inCorpus = batchFp.join(corpusFp, Seq("fingerprint"), "left_semi")
      .select(col("id")).withColumn("__dc", lit(true))
    val firstInBatch = batchFp.groupBy(col("fingerprint"))
      .agg(min(col("id")).as("first_id"))
    batchFp
      .join(firstInBatch, Seq("fingerprint"))
      .join(inCorpus, Seq("id"), "left_outer")
      .select(col("id"), col("fingerprint"),
        coalesce(col("__dc"), lit(false)).as("dup_of_corpus"),
        (col("id") =!= col("first_id")).as("dup_in_batch"))
  }

  /** Distinct word-n-gram shingle set per doc (the Jaccard universe) — the
    * one-pass [[graft.functions.ShingleSet]] expression (≡
    * array_distinct(TextOps.shingles), minus the interpreted lambda chain). */
  def shingleSets(df: DataFrame, idCol: String, textCol: String,
      n: Int): DataFrame =
    df.select(col(idCol).as("id"),
      graft.functions.ShingleExpr.shingleSet(col(textCol), n).as("shingles"))
      // shingling is referenced by every downstream join side; computing it
      // once per doc beats recomputing per reference
      .persist()

  /** (id, bandkey) LSH band rows for a shingled frame — the unit every
    * MinHash candidate generator joins on, and the unit the store-backed
    * index ([[lshIndexFrame]]/[[probeLshIndex]]) persists and probes.
    * Signature via the custom MinHashSig expression: ONE md5 + one tight
    * k-min loop per shingle (the HOF formulation paid k interpreted
    * transform lambdas per row — measured ~2× the whole-query wall time). */
  def bandRows(shingled: DataFrame, k: Int, bands: Int): DataFrame = {
    require(k % bands == 0, "k must divide into bands")
    val rows = k / bands
    shingled
      .filter(size(col("shingles")) > 0)
      .select(col("id"), TextOps.bandKeys(
        graft.functions.MinHashExpr.minhashSig(col("shingles"), k),
        bands, rows).as("bandkeys"))
      .select(col("id"), explode(col("bandkeys")).as("bandkey"))
  }

  /** MinHash-LSH candidate pairs: signature of k md5-min hashes, banded into
    * `bands` groups; docs sharing any band key become a candidate pair.
    * Pair enumeration is an equi-join on the band key. */
  def minhashCandidates(shingled: DataFrame, k: Int, bands: Int): DataFrame = {
    // band keys are exploded and persisted once; both join sides reference
    // the persisted frame, so the signature is computed once per doc
    val sig = bandRows(shingled, k, bands).persist()
    val l = sig.as("l"); val r = sig.as("r")
    l.join(r, col("l.bandkey") === col("r.bandkey") &&
        col("l.id") < col("r.id"))
      .select(col("l.id").as("id_a"), col("r.id").as("id_b"))
      .distinct()
  }

  /** Exact Jaccard for candidate pairs (verification step after LSH). */
  def jaccardVerify(candidates: DataFrame, shingled: DataFrame,
      minJaccard: Double): DataFrame = {
    val a = shingled.select(col("id").as("id_a"), col("shingles").as("sh_a"))
    val b = shingled.select(col("id").as("id_b"), col("shingles").as("sh_b"))
    candidates.join(a, "id_a").join(b, "id_b")
      .withColumn("inter", size(array_intersect(col("sh_a"), col("sh_b"))))
      .withColumn("jaccard", col("inter").cast("double") /
        (size(col("sh_a")) + size(col("sh_b")) - col("inter")))
      .filter(col("jaccard") >= minJaccard)
      .select(col("id_a"), col("id_b"), round(col("jaccard"), 6).as("jaccard"))
  }

  /** Cross-side MinHash-LSH candidates for incremental crawl dedup: the
    * new batch's band keys equi-join the CORPUS's band keys — the corpus
    * never self-joins and ships only (id, bandkey) band rows, so the work
    * is O(batch × collisions), not O(corpus²): the shape that lets a
    * nightly crawl delta dedup against a 100 TB corpus. Pair columns are
    * (id_batch, id_corpus); verify against shingles as usual. */
  def crossMinhashCandidates(corpusSh: DataFrame, batchSh: DataFrame,
      k: Int, bands: Int): DataFrame =
    bandRows(batchSh, k, bands).as("b")
      .join(bandRows(corpusSh, k, bands).as("c"),
        col("b.bandkey") === col("c.bandkey"))
      .select(col("b.id").as("id_batch"), col("c.id").as("id_corpus"))
      .distinct()

  /** The PERSISTED LSH index frame: bandkey → sorted distinct corpus doc
    * ids — what a production pipeline pushes into a key-value store ONCE
    * so that every nightly crawl delta dedups by point reads instead of
    * re-scanning the corpus. Hot bands (more than `maxPostings` docs) are
    * dropped with the usual recall argument: a pair living only in a hot
    * band is boilerplate-cluster noise routed through [[exact]] first.
    *
    * Scale shape: one groupBy on the band key (map-side partial
    * collect_set), value size bounded by `maxPostings` — at 100 TB the
    * index is a fraction of corpus bytes (ids, not text) and lives behind
    * the engine's bucketed store layout, so a probe batch touches only
    * the buckets its band keys hash to. */
  def lshIndexFrame(corpusSh: DataFrame, k: Int, bands: Int,
      maxPostings: Int = 1 << 20): DataFrame =
    bandRows(corpusSh, k, bands)
      .groupBy(col("bandkey"))
      .agg(sort_array(collect_set(col("id"))).as("ids"))
      .filter(size(col("ids")) <= maxPostings)

  /** Probe a store-backed LSH index with a crawl batch: the batch's band
    * keys become a batchGet key set (bucket-set-pruned point reads — the
    * corpus is NEVER scanned), hit lists explode back into
    * (id_batch, id_corpus) candidates. Result ≡
    * [[crossMinhashCandidates]] recomputed from the full corpus, provided
    * the store holds [[lshIndexFrame]] of that corpus (initial push +
    * `addToSetAA` element-adds for every indexed delta since).
    *
    * This is the O(delta) dedup shape: index maintenance is an append of
    * the delta's band rows (A/A set-union CRDT — commutative, no
    * read-modify-write), and probing costs |batch band keys| point reads
    * against a 100-TB corpus. */
  def probeLshIndex(engine: graft.core.GraftEngine, store: String,
      batchSh: DataFrame, k: Int, bands: Int): DataFrame = {
    val probes = bandRows(batchSh, k, bands)
    val hits = engine.batchGet(store, probes.select(col("bandkey")).distinct())
    probes.join(hits, "bandkey")
      .select(col("id").as("id_batch"), explode(col("ids")).as("id_corpus"))
      .distinct()
  }

  /** C4-style span-level dedup: split each document into consecutive
    * `spanTokens`-token spans, fingerprint each span, and keep only the
    * globally-first occurrence (min (doc_id, span_idx)) of every distinct
    * span — removing boilerplate repeated across documents while leaving
    * unique text intact. (C4 removes duplicate three-sentence spans the
    * same way; this corpus has no sentence boundaries, so spans are fixed
    * token windows.)
    *
    * Scale shape: keeper election is a groupBy on the span fingerprint
    * with map-side partial aggregation (min of a (doc_id, span_idx)
    * struct) — a boilerplate span repeated 10^6 times combines map-side
    * instead of landing on one window task; the join back is a plain
    * equi-join on the fingerprint; reassembly is one doc_id shuffle.
    *
    * Output: one row per non-empty doc — doc_id, n_spans, kept_spans,
    * md5 of the reassembled (kept spans in order) text.
    */
  def spanDedup(df: DataFrame, idCol: String, textCol: String,
      spanTokens: Int = 10): DataFrame = {
    val k = spanTokens
    val spans = df
      .select(col(idCol).cast("long").as("doc_id"),
        TextOps.tokens(col(textCol)).as("t"))
      // ceil(|t| / k) in exact integer arithmetic
      .withColumn("n_spans",
        floor((size(col("t")) + (k - 1)) / lit(k)).cast("int"))
      .filter(col("n_spans") > 0)
      .select(col("doc_id"),
        posexplode(transform(sequence(lit(0), col("n_spans") - 1),
          i => concat_ws(" ", slice(col("t"), i * k + 1, lit(k))))))
      .select(col("doc_id"), col("pos").as("span_idx"),
        col("col").as("span"), md5(col("col")).as("fp"))
    val keeper = spans.groupBy(col("fp"))
      .agg(min(struct(col("doc_id"), col("span_idx"))).as("keeper"))
    spans.join(keeper, Seq("fp"))
      .withColumn("kept", col("doc_id") === col("keeper.doc_id") &&
        col("span_idx") === col("keeper.span_idx"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_spans"),
        sum(col("kept").cast("long")).as("kept_spans"),
        md5(array_join(transform(array_sort(collect_list(
          when(col("kept"), struct(col("span_idx"), col("span"))))),
          s => s.getField("span")), " ")).as("out_md5"))
  }

  /** SimHash near-dup pairs with Hamming distance ≤ 1 over the 16-bit
    * signature. Two 8-bit bands: distance ≤ 1 guarantees one intact band
    * (pigeonhole), so the band equi-join finds every qualifying pair.
    *
    * SCALE WARNING: 256 values per band ⇒ Θ(n²/256) random-pair
    * candidates — measured 1.67 s @ sf0.1 → 9.82 s @ sf1. This stays as
    * the compact verification baseline; corpus-scale signature dedup goes
    * through [[simhashPairs64]] (65536 values/band, near-flat across the
    * same decade, wider hamming budget).
    *
    * Accident guard (same contract as [[ngramJaccardPairs]]): a degenerate
    * corpus (boilerplate-dominated — everything in one band bucket) joins
    * up to n²/2 pairs per band, so the budget is enforced against the
    * worst case n². Inputs past √maxCandidatePairs docs are REFUSED with a
    * pointer to the scale path; raise the budget explicitly only for a
    * deliberate exactness study. */
  def simhashPairs(df: DataFrame, idCol: String, textCol: String,
      maxCandidatePairs: Long = 100000000000L): DataFrame = {
    val rowCap = math.sqrt(maxCandidatePairs.toDouble).toLong
    val probeLimit = math.min(rowCap, (Int.MaxValue - 1).toLong).toInt
    val probed = df.select(lit(1).as("__c")).limit(probeLimit + 1).count()
    graft.core.Guard.admit(probed <= rowCap,
      s"simhashPairs (16-bit, 2×8-bit bands) admits up to n² candidate " +
        s"pairs on a bucket-degenerate corpus and its input has at least " +
        s"$probed docs (cap $rowCap rows for the $maxCandidatePairs-pair " +
        "budget). Use simhashPairs64 (4×16-bit bands, bucket-capped, " +
        "hamming ≤ 3 — the dedup_simhash64 production path) for " +
        "corpus-scale signature dedup, or raise maxCandidatePairs " +
        "explicitly for a deliberate exactness study.")
    val sh = df.select(col(idCol).as("id"),
      graft.functions.SimHashExpr.simhash16(
        TextOps.tokens(col(textCol))).as("simhash"))
    val banded = sh.select(col("id"), col("simhash"),
      explode(array(
        concat(lit("hi:"), (col("simhash") / 256).cast("int").cast("string")),
        concat(lit("lo:"), (col("simhash") % 256).cast("string")))).as("bandkey"))
      .persist()
    val l = banded.as("l"); val r = banded.as("r")
    l.join(r, col("l.bandkey") === col("r.bandkey") &&
        col("l.id") < col("r.id"))
      .select(col("l.id").as("id_a"), col("r.id").as("id_b"),
        TextOps.hamming16(col("l.simhash"), col("r.simhash")).as("hamming"))
      .distinct()
      .filter(col("hamming") <= 1)
  }

  /** 64-bit SimHash near-dup pairs — the SCALE path for signature dedup
    * (Charikar's simhash with Manku-style banded candidate generation,
    * both public knowledge). 4 bands × 16 bits: Hamming ≤ 3 guarantees at
    * least one intact band (pigeonhole: 3 flipped bits touch ≤ 3 of 4
    * bands), so the band equi-join finds every qualifying pair — and each
    * band has 65536 values, so random-text candidate pairs grow
    * Θ(n²/65536) per band vs the 16-bit scheme's Θ(n²/256): a 256× fewer
    * false candidates at the same corpus size, the difference between a
    * band join that survives 100× scale-up and one that doesn't.
    *
    * Scale guards, mirroring [[ngramJaccardPairs]]:
    *  - `maxPostings` caps a band BUCKET's size before the self-join (a
    *    boilerplate-dominated corpus puts millions of near-identical docs
    *    in one bucket → df²/2 joined pairs); dropped buckets lose only
    *    pairs whose OTHER three bands are all broken, i.e. genuinely
    *    distant docs plus near-dups of the hottest boilerplate — route
    *    those through [[exact]] first.
    *  - The bucket cap is a WINDOW count over bandkey, not an agg +
    *    anti-join: the window's shuffle+sort on bandkey is exactly what
    *    the self-join needs, so the persisted result co-partitions both
    *    join sides and the join adds no further exchange.
    *
    * @return (id_a, id_b, hamming) with hamming ≤ maxHamming */
  def simhashPairs64(df: DataFrame, idCol: String, textCol: String,
      maxHamming: Int = 3, maxPostings: Int = 1 << 20): DataFrame = {
    require(maxHamming < 4,
      s"4×16-bit banding only guarantees recall for hamming ≤ 3 " +
        s"(pigeonhole over 4 bands); got maxHamming=$maxHamming")
    val sh = df.select(col(idCol).as("id"),
      graft.functions.SimHashExpr.simhash64(
        TextOps.tokens(col(textCol))).as("simhash"))
    val banded = sh.select(col("id"), col("simhash"),
      explode(array((0 until 4).map { j =>
        concat(lit(s"$j:"),
          shiftrightunsigned(col("simhash"), (3 - j) * 16)
            .bitwiseAND(lit(0xffffL)).cast("string"))
      }: _*)).as("bandkey"))
    val posts = banded
      .withColumn("__df", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("bandkey"))))
      .filter(col("__df") <= maxPostings)
      .drop("__df")
      .persist()
    val l = posts.as("l"); val r = posts.as("r")
    l.join(r, col("l.bandkey") === col("r.bandkey") &&
        col("l.id") < col("r.id"))
      .select(col("l.id").as("id_a"), col("r.id").as("id_b"),
        bit_count(col("l.simhash").bitwiseXOR(col("r.simhash")))
          .as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  /** n-gram-Jaccard pairs via a shared-shingle inverted index: explode
    * distinct shingles, equi-join on the shingle, count shared shingles per
    * pair, then Jaccard.
    *
    * Scale guard: a shingle shared by d docs contributes d²/2 joined pairs,
    * so one hot "stop shingle" (a boilerplate phrase across millions of
    * docs) makes a quadratic bucket. `maxPostings` drops shingles whose
    * document frequency exceeds the cap BEFORE the self-join, bounding every
    * bucket at maxPostings²/2. Set it well above the corpus's true near-dup
    * cluster size and the ≥-t output set is unchanged in practice (two docs
    * with J ≥ 0.5 share half their shingles — losing the few stop-shingles
    * they ALSO share still leaves shared discriminative shingles, and the
    * Jaccard itself is computed from exact set sizes, not postings). For
    * exactness-critical corpora route through [[minhashCandidates]] +
    * [[jaccardVerify]] instead.
    *
    * Accident guard (mirrors [[Similarity.cosinePairs]]'s refusal): with
    * the DEFAULT maxPostings (2²⁰, effectively uncapped on test corpora)
    * this is the exact Θ(n²)-capable baseline, so the call refuses inputs
    * whose worst-case candidate count — n·min(n, maxPostings)/2, since a
    * doc's posting can meet at most maxPostings−1 others per bucket —
    * exceeds `maxCandidatePairs` (default 5·10¹⁰ = √budget ≈ 316k docs
    * uncapped, the same default budget as simhashPairs; the earlier
    * 5·10¹¹ admitted a 500k-doc corpus whose exact self-join SPILL
    * exceeded a 75 GB host disk — the pair budget models compute, so its
    * default must sit below where the shuffle spill, which grows with the
    * same n·min(n,df) term, outruns one host). The bound SCALES WITH THE
    * CAP: at maxPostings = 64 the production path admits ~1.5·10⁹ docs
    * before refusing, so `dedup_ngram_capped` stays corpus-scale while
    * the uncapped form refuses past ~316k docs. The row probe is a constant
    * projection limited to rowCap+1 — column-pruned and early-terminating,
    * never a full count of a big corpus. Raise maxCandidatePairs
    * EXPLICITLY for a deliberate exactness study. */
  def ngramJaccardPairs(shingled: DataFrame, minJaccard: Double,
      maxPostings: Int = 1 << 20,
      maxCandidatePairs: Long = 50000000000L): DataFrame = {
    val budget2 = 2L * maxCandidatePairs // f(n) = n·min(n, maxPostings) ≤ 2B
    val rowCap =
      if (maxPostings.toLong * maxPostings >= budget2)
        math.sqrt(budget2.toDouble).toLong
      else budget2 / maxPostings
    val probeLimit = math.min(rowCap, (Int.MaxValue - 1).toLong).toInt
    val probed = shingled.select(lit(1).as("__c")).limit(probeLimit + 1).count()
    graft.core.Guard.admit(probed <= rowCap,
      s"ngramJaccardPairs with maxPostings=$maxPostings admits up to " +
        s"n*min(n,maxPostings)/2 candidate pairs and its input has at " +
        s"least $probed docs (cap $rowCap rows for the " +
        s"$maxCandidatePairs-pair budget). Use the document-frequency " +
        "cap (maxPostings, e.g. 64 — the dedup_ngram_capped production " +
        "path) or minhashCandidates+jaccardVerify for corpus-scale " +
        "near-dup detection, or raise maxCandidatePairs explicitly for " +
        "a deliberate exactness study.")
    val sized = shingled.filter(size(col("shingles")) > 0)
      .select(col("id"), col("shingles"), size(col("shingles")).as("n"))
    val exploded = sized.select(col("id"), col("n"),
      explode(col("shingles")).as("sh"))
    // document-frequency cap: one extra keyed aggregation, then filter —
    // the join below can no longer see a bucket larger than maxPostings.
    // Deliberately a WINDOW over sh, not a partial-agged count + anti-join:
    // the window's shuffle+sort on sh is exactly the self-join's
    // requirement, and the persisted result keeps that partitioning and
    // ordering, so the sort-merge join below adds NO further exchange.
    // (Measured: the "cheaper" agg+broadcast-anti-join variant loses the
    // co-partitioning and re-shuffles BOTH join sides — 125 s vs ~35 s on
    // the sf1 postings.)
    val posts = exploded
      .withColumn("__df", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("sh"))))
      .filter(col("__df") <= maxPostings)
      .drop("__df")
      .persist()
    val l = posts.as("l"); val r = posts.as("r")
    // length bound: J(a,b) ≥ t implies |a| ≥ t·|b| (and symmetrically),
    // so pairs outside the t-band can be pruned BEFORE pair aggregation —
    // semantics-preserving for the ≥ t output set
    val tInv = math.ceil(1.0 / minJaccard).toLong
    val shared = l.join(r, col("l.sh") === col("r.sh") &&
        col("l.id") < col("r.id") &&
        col("l.n") <= lit(tInv) * col("r.n") &&
        col("r.n") <= lit(tInv) * col("l.n"))
      .groupBy(col("l.id").as("id_a"), col("r.id").as("id_b"),
        col("l.n").as("n_a"), col("r.n").as("n_b"))
      .agg(count(lit(1)).as("inter"))
    shared
      .withColumn("jaccard", col("inter").cast("double") /
        (col("n_a") + col("n_b") - col("inter")))
      .filter(col("jaccard") >= minJaccard)
      .select(col("id_a"), col("id_b"), round(col("jaccard"), 6).as("jaccard"))
  }

  /** DIRECTED n-gram containment pairs: C(a→b) = |A∩B| / |A| ≥ t emits
    * (id_inner, id_outer, containment) — "a's n-grams are mostly inside
    * b". The asymmetric companion to [[ngramJaccardPairs]]: Jaccard misses
    * a short document wholly quoted inside a long one (the union in the
    * denominator drowns it), while containment is exactly the
    * quote/partial-scrape/boilerplate-inclusion detector a curation
    * pipeline runs next to near-dup removal (broder's resemblance vs
    * containment distinction — public knowledge).
    *
    * Same inverted-index geometry as Jaccard — one posting self-join, one
    * pair aggregation, then BOTH directions emitted from the same
    * intersection counts (no second join). The length-ratio prune does
    * not apply (containment is what the ratio prune would discard), so
    * the document-frequency cap is the load-bearing scale guard here;
    * same accident guard as the Jaccard form. */
  def containmentPairs(shingled: DataFrame, minContainment: Double,
      maxPostings: Int = 1 << 20,
      maxCandidatePairs: Long = 50000000000L): DataFrame = {
    val budget2 = 2L * maxCandidatePairs
    val rowCap =
      if (maxPostings.toLong * maxPostings >= budget2)
        math.sqrt(budget2.toDouble).toLong
      else budget2 / maxPostings
    val probeLimit = math.min(rowCap, (Int.MaxValue - 1).toLong).toInt
    val probed = shingled.select(lit(1).as("__c")).limit(probeLimit + 1).count()
    graft.core.Guard.admit(probed <= rowCap,
      s"containmentPairs with maxPostings=$maxPostings admits up to " +
        s"n*min(n,maxPostings)/2 candidate pairs and its input has at " +
        s"least $probed docs (cap $rowCap rows). Use the " +
        "document-frequency cap (maxPostings, e.g. 64) or raise " +
        "maxCandidatePairs explicitly for a deliberate exactness study.")
    val sized = shingled.filter(size(col("shingles")) > 0)
      .select(col("id"), col("shingles"), size(col("shingles")).as("n"))
    val exploded = sized.select(col("id"), col("n"),
      explode(col("shingles")).as("sh"))
    // window-over-sh cap, NOT agg+anti-join — same co-partitioning
    // argument as ngramJaccardPairs (the window pre-pays the self-join's
    // shuffle+sort on sh)
    val posts = exploded
      .withColumn("__df", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("sh"))))
      .filter(col("__df") <= maxPostings)
      .drop("__df")
      .persist()
    val l = posts.as("l"); val r = posts.as("r")
    val shared = l.join(r, col("l.sh") === col("r.sh") &&
        col("l.id") < col("r.id"))
      .groupBy(col("l.id").as("id_a"), col("r.id").as("id_b"),
        col("l.n").as("n_a"), col("r.n").as("n_b"))
      .agg(count(lit(1)).as("inter"))
      .persist()
    val aInB = shared
      .withColumn("containment", col("inter").cast("double") / col("n_a"))
      .filter(col("containment") >= minContainment)
      .select(col("id_a").as("id_inner"), col("id_b").as("id_outer"),
        round(col("containment"), 6).as("containment"))
    val bInA = shared
      .withColumn("containment", col("inter").cast("double") / col("n_b"))
      .filter(col("containment") >= minContainment)
      .select(col("id_b").as("id_inner"), col("id_a").as("id_outer"),
        round(col("containment"), 6).as("containment"))
    aInB.unionByName(bInA)
  }

  /** Training-corpus decontamination: for every training doc, the best
    * (max) overlap with any eval-set doc, where overlap = |shared shingles|
    * / |eval shingles| — "what fraction of this eval example's n-grams
    * appear in this training doc" (the standard n-gram contamination
    * metric: the eval set leaking INTO training is what poisons a
    * benchmark, so the denominator is the eval side, not Jaccard).
    *
    * Scale shape: the eval set is always tiny next to the corpus (hundreds
    * of benchmark examples vs billions of docs), so its exploded n-gram
    * index is BROADCAST — the training side streams through a map-side
    * join + one keyed aggregation, no shuffle of the corpus and no
    * inverted-index self-join. Returns one row per training doc (docs with
    * no shared shingle keep overlap 0.0 and a null eval id), so the output
    * is a complete audit column, joinable back onto the corpus.
    *
    * @param train shingled training corpus (id, shingles) — [[shingleSets]]
    * @param evalSet shingled eval/benchmark set (id, shingles)
    * @param minOverlap contamination threshold for the `contaminated` flag
    */
  def contamination(train: DataFrame, evalSet: DataFrame,
      minOverlap: Double = 0.5): DataFrame = {
    val evalN = evalSet.filter(size(col("shingles")) > 0)
      .select(col("id").as("eval_id"), size(col("shingles")).as("n_eval"))
    val evalPosts = evalSet.filter(size(col("shingles")) > 0)
      .select(col("id").as("eval_id"), explode(col("shingles")).as("sh"))
    val trainPosts = train.select(col("id").as("train_id"),
      explode(col("shingles")).as("sh"))
    val overlaps = trainPosts.join(broadcast(evalPosts), "sh")
      .groupBy("train_id", "eval_id").agg(count(lit(1)).as("inter"))
      .join(broadcast(evalN), "eval_id")
      .withColumn("overlap", col("inter").cast("double") / col("n_eval"))
    // best eval match per training doc (ties → smallest eval id)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("train_id"))
      .orderBy(col("overlap").desc, col("eval_id"))
    val best = overlaps
      .withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1)
      .select(col("train_id"), col("eval_id"),
        round(col("overlap"), 6).as("overlap"))
    train.select(col("id").as("train_id")).join(best, Seq("train_id"), "left")
      .select(col("train_id"), col("eval_id"),
        coalesce(col("overlap"), lit(0.0)).as("overlap"),
        (coalesce(col("overlap"), lit(0.0)) >= minOverlap).as("contaminated"))
  }

  /** Decontamination SPAN SURGERY — the step after [[contamination]]'s
    * flag: instead of dropping a contaminated document wholesale, remove
    * exactly the token positions covered by any eval-set shingle match and
    * keep the rest (the PaLM/GPT-3-style "excise the overlapping window"
    * treatment; wholesale dropping wastes the clean 99% of a long doc that
    * quotes one benchmark item).
    *
    * A token position is removed iff some `n`-gram starting at i matches an
    * eval shingle and covers it (positions i..i+n−1; same shingle identity
    * as [[shingleSets]], so flag and surgery agree on what "contaminated"
    * means). Scale shape: the eval gram set BROADCASTS (it is the eval
    * set, not the corpus); the corpus side is one narrow positional
    * explode + broadcast semi-join — the corpus never shuffles on gram
    * keys; covered-position dedup and the per-doc rebuild are keyed on
    * doc id with state bounded by doc length.
    *
    * @return one row per train doc: n_tokens, n_removed, md5 of the
    *         surviving tokens (space-joined), clean flag */
  def decontamSurgery(train: DataFrame, evalSet: DataFrame, idCol: String,
      textCol: String, n: Int = 3): DataFrame = {
    import graft.functions.TextOps
    val evalGrams = shingleSets(evalSet, idCol, textCol, n)
      .select(explode(col("shingles")).as("g")).distinct()
    val toks = train.select(col(idCol).as("id"),
      TextOps.tokens(col(textCol)).as("t"))
    val hits = toks.filter(size(col("t")) >= n)
      .select(col("id"), col("t"),
        explode(sequence(lit(1), size(col("t")) - (n - 1))).as("i"))
      .withColumn("g", array_join(slice(col("t"), col("i"), lit(n)), ""))
      .join(broadcast(evalGrams), Seq("g"), "left_semi")
    val covered = hits
      .select(col("id"), explode(sequence(col("i"),
        col("i") + (n - 1))).as("p"))
      .groupBy(col("id"))
      .agg(array_sort(collect_set(col("p"))).as("cov"))
    toks.join(covered, Seq("id"), "left")
      .withColumn("kept", filter(col("t"), (x, idx) =>
        col("cov").isNull || !array_contains(col("cov"), idx + 1)))
      .select(col("id"), size(col("t")).cast("long").as("n_tokens"),
        (size(col("t")) - size(col("kept"))).cast("long").as("n_removed"),
        md5(array_join(col("kept"), " ")).as("kept_hash"),
        (size(col("t")) === size(col("kept"))).as("clean"))
  }

  /** Connected components over duplicate pairs → duplicate CLUSTERS: the
    * step after pair detection in a real dedup pipeline (near-duplication
    * is transitive in intent — keep one doc per component, not per pair;
    * pairwise keeps A of (A,B) and B of (B,C) and still ships two
    * near-copies).
    *
    * Algorithm: min-label propagation with pointer jumping. Each round is
    * (1) lbl(v) := min(lbl(v), min over neighbors lbl(u)) — one equi-join +
    * keyed agg — and (2) lbl(v) := lbl(lbl(v)) — one more equi-join — so a
    * length-L chain converges in O(log L) rounds, not O(L). Every round
    * `localCheckpoint`s to truncate lineage (mandatory for iterative plans;
    * without it round k replays rounds 1..k-1). All shuffles are on node
    * ids — no broadcast of anything unbounded, no driver-side graph.
    *
    * @param pairs frame with two node-id columns (each row one undirected
    *              edge; orientation and duplicates don't matter)
    * @return (id, cluster_id) — one row per node that appears in any pair;
    *         cluster_id = min node id of its component
    */
  /** LEAKAGE-SAFE dataset splits: assign train/val/test by the duplicate
    * CLUSTER, not the document — two near-copies hashed independently can
    * straddle train and test (the leakage `split_leakage` detects after
    * the fact); keying the split hash on the cluster id puts every member
    * of a near-dup cluster in the SAME split by construction. Singleton
    * docs (no duplicate pair) key on their own id, so their assignment is
    * identical to the plain [[graft.functions.TextOps.splitAssign]].
    * Shape: [[clusters]]' pointer-jumping CC + one left join + the narrow
    * hash filter — nothing new shuffles beyond the CC itself. */
  def splitByCluster(ids: DataFrame, idCol: String, pairs: DataFrame,
      trainPct: Int = 80, valPct: Int = 10): DataFrame = {
    val cl = clusters(pairs).withColumnRenamed("id", idCol)
    ids.select(col(idCol)).join(cl, Seq(idCol), "left")
      .withColumn("split_key", coalesce(col("cluster_id"), col(idCol)))
      .select(col(idCol), col("cluster_id"), col("split_key"),
        graft.functions.TextOps.splitAssign(col("split_key"), trainPct,
          valPct).as("split"))
  }

  def clusters(pairs: DataFrame, idA: String = "id_a",
      idB: String = "id_b"): DataFrame = {
    val e = pairs.select(col(idA).cast("long").as("a"),
      col(idB).cast("long").as("b"))
    val und = e.union(e.select(col("b").as("a"), col("a").as("b")))
      .distinct().persist()
    var labels = und.select(col("a").as("id")).distinct()
      .select(col("id"), col("id").as("lbl")).localCheckpoint()
    var changed = 1L
    while (changed > 0) {
      // (1) neighbor-min, carrying the previous label as `old` so the
      // convergence check below is a filter on the already-materialized
      // round result — not an extra join+count against the prior labels
      val nbrMin = und
        .join(labels.withColumnRenamed("id", "a"), "a")
        .groupBy(col("b").as("id")).agg(min(col("lbl")).as("nlbl"))
      // checkpointed BEFORE the self-join so prop computes once, not twice
      val prop = labels.select(col("id"), col("lbl").as("old"))
        .join(nbrMin, Seq("id"), "left")
        .select(col("id"), col("old"),
          least(col("old"), coalesce(col("nlbl"), col("old"))).as("lbl"))
        .localCheckpoint()
      // (2) pointer jump: follow lbl one hop (lbl is itself a node id)
      val jump = prop
        .join(prop.select(col("id").as("lbl"), col("lbl").as("plbl")).as("p"),
          Seq("lbl"), "left")
        .select(col("id"), col("old"), coalesce(col("plbl"), col("lbl")).as("lbl"))
        .localCheckpoint()
      changed = jump.filter(col("lbl") =!= col("old")).count()
      labels = jump.drop("old")
    }
    und.unpersist()
    labels.select(col("id"), col("lbl").as("cluster_id"))
  }

  /** Duplicated-substring profile via PREFIX DOUBLING (the suffix-array
    * construction trick, run distributed): level-k fingerprints cover
    * token spans of length 2^k, built from two overlapping level-(k−1)
    * fingerprints — fp_k(d,p) = md5(fp_{k−1}(d,p) || fp_{k−1}(d,p+2^{k−1}))
    * — so each doubling is ONE self-equi-join on (doc, position) and the
    * whole profile costs log(maxSpan) joins, never a quadratic substring
    * comparison. A span is "duplicated" when its fingerprint occurs at ≥2
    * (doc, pos) sites corpus-wide (Lee et al.'s exact-substring dedup
    * signal, which fixed-length span dedup [[spanDedup]] can only
    * approximate at one width).
    *
    * Returns one row per level: span length, duplicated sites, distinct
    * duplicated fingerprints, and docs containing a duplicated span —
    * the profile that picks the right dedup span width for a corpus.
    * Scale: positions explode the corpus ×1 per level (bounded by
    * maxPow ≤ 5 here), every step is a keyed equi-join or partial-agged
    * count on fingerprints. */
  def dupSpanProfile(df: DataFrame, idCol: String, textCol: String,
      maxPow: Int = 5): DataFrame = {
    require(maxPow >= 0 && maxPow <= 8, s"maxPow in [0,8], got $maxPow")
    val spark = df.sparkSession
    // partition by doc id ONCE: every doubling self-join keys on
    // (id, pos±step), and HashPartitioning(id) satisfies that join's
    // clustered distribution (all of a doc's positions co-locate), so
    // levels 1..maxPow add sorts but NO further exchanges — the join
    // output projects id through, and persist preserves the partitioning
    var fp = df
      .select(col(idCol).as("id"),
        posexplode(graft.functions.TextOps.tokens(col(textCol))))
      .select(col("id"), col("pos"), col("col").as("fp"))
      .repartition(col("id"))
      .persist()
    // each level's stats row is computed EAGERLY (a 1-row aggregate) so
    // the previous level's cache can be dropped before the next doubling
    // — only one level of fingerprints is ever materialized at a time
    def levelStats(level: DataFrame, k: Int): (Long, Long, Long, Long) = {
      // dup_sites (Σ count over duplicated fingerprints) and
      // dup_fingerprints (their number) come straight from the per-fp
      // count aggregate — the old single agg computed BOTH with a
      // 3-way multi-distinct over the semi-joined level, which plans as
      // an Expand ×3 of every surviving site row. Only docs_affected
      // still needs the semi-join, and its single-column distinct
      // dedups map-side with no Expand. Same numbers, ~one full pass
      // of CPU less per level.
      val dupFps = level.groupBy(col("fp")).agg(count(lit(1)).as("__c"))
        .filter(col("__c") >= 2).persist()
      val agg = dupFps
        .agg(coalesce(sum(col("__c")), lit(0L)), count(lit(1))).head()
      val docs = level.join(dupFps, Seq("fp"), "left_semi")
        .select(col("id")).distinct().count()
      dupFps.unpersist()
      (1L << k, agg.getLong(0), agg.getLong(1), docs)
    }
    val rows = Seq.newBuilder[(Long, Long, Long, Long)]
    rows += levelStats(fp, 0)
    for (k <- 1 to maxPow) {
      val step = 1 << (k - 1)
      val l = fp.as("l"); val r = fp.as("r")
      val next = l.join(r,
          col("l.id") === col("r.id") && col("r.pos") === col("l.pos") + step)
        .select(col("l.id").as("id"), col("l.pos").as("pos"),
          md5(concat_ws("|", col("l.fp"), col("r.fp"))).as("fp"))
        .persist()
      rows += levelStats(next, k)
      fp.unpersist()
      fp = next
    }
    fp.unpersist()
    import spark.implicits._
    rows.result().toDF("span_len", "dup_sites", "dup_fingerprints",
      "docs_affected")
  }
}
