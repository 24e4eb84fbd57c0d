package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** BPE tokenizer training: the iterative greedy merge loop that turns a
  * word-frequency table into a merge list (the artifact a tokenizer ships).
  * `bpe_pair_stats` computes ONE round's statistic; this runs the actual
  * loop — select the most frequent adjacent symbol pair, merge it
  * everywhere, recount — which is what "train a tokenizer on the corpus"
  * means.
  *
  * Scale shape: every step works on the VOCABULARY (distinct word ×
  * frequency — sublinear in corpus size; the corpus is touched once to
  * build the word counts), so a 100-TB corpus trains over a few-hundred-MB
  * vocab frame. Pair counting is one partial-aggregated groupBy per step;
  * the argmax is a 1-row driver fetch (the merge decision must serialize
  * the loop — same driver-coordination shape as the k-means Lloyd steps in
  * [[Similarity]]); the merge apply is a narrow map over the vocab.
  *
  * Determinism contract (shared with the DuckDB oracle, which unrolls the
  * same steps as CTEs):
  *  - symbols ride in a single space-delimited string padded with one
  *    leading/trailing space, so a merge is `replace(sym, " a b ", " ab ")`
  *    — leftmost non-overlapping in both engines;
  *  - the replace runs TWICE per step: a run of identical symbols hides
  *    every second match from one pass (the match consumes the separator
  *    the next match needs); two passes converge for runs ≤ 5, and both
  *    engines apply the identical two-pass rule so the oracle is exact by
  *    construction regardless;
  *  - argmax tie-break: highest count, then lexicographically smallest
  *    pair;
  *  - no end-of-word marker (merges never cross words because each word
  *    is its own symbol string; a production tokenizer would append one —
  *    orthogonal to the loop's shape).
  */
object Bpe {

  final case class Merge(step: Int, pair: String, count: Long)

  /** @param words (word: String, f: Long) vocabulary with corpus counts
    * @param batch merges applied per Spark iteration. 1 (default) is the
    *        EXACT sequential greedy loop — one recount job per merge, the
    *        oracle path. Larger batches apply up to `batch`
    *        symbol-DISJOINT pairs from one count (the standard batched-BPE
    *        optimization, public knowledge): a merge only perturbs counts
    *        of pairs sharing one of its symbols, so disjoint picks keep
    *        their batch-start counts exact; the approximation is only that
    *        a pair CREATED by an earlier pick (x,ab) cannot be chosen
    *        until the next batch — a real 32k-merge vocab trains in
    *        steps/batch recount jobs instead of steps (the driver-loop
    *        cost curve StressCheck's 100-merge case pins).
    * @return the chosen merges in order, and the vocab with its final
    *         space-delimited symbol encoding (`word`, `f`, `sym`) */
  def trainMerges(spark: SparkSession, words: DataFrame, steps: Int,
      batch: Int = 1): (Seq[Merge], DataFrame) = {
    require(steps >= 1, s"steps must be >= 1, got $steps")
    require(batch >= 1, s"batch must be >= 1, got $batch")
    // char-split via a zero-width regex; the (?=.) guard stops the split
    // from also matching at end-of-string (Spark splits with limit -1,
    // which would append a trailing empty symbol)
    var vocab = words.select(col("word"), col("f").cast("long").as("f"),
      concat(lit(" "),
        array_join(split(col("word"), "(?!^)(?=.)"), " "), lit(" ")).as("sym"))
      .persist()
    vocab.count() // materialize before the loop re-derives from it
    val merges = scala.collection.mutable.ArrayBuffer.empty[Merge]
    var step = 1
    while (step <= steps) {
      val want = math.min(batch, steps - step + 1)
      val s = split(trim(col("sym")), " ")
      val top = vocab
        // single-symbol words have no pairs — and would make the
        // sequence() below DESCEND through index 0 (ANSI array error)
        .filter(size(s) >= 2)
        .select(col("f"), explode(
          transform(sequence(lit(1), size(s) - 1),
            i => concat(element_at(s, i), lit(" "), element_at(s, i + 1))))
          .as("pair"))
        .groupBy(col("pair")).agg(sum(col("f")).as("cnt"))
        .orderBy(col("cnt").desc, col("pair").asc)
        // over-fetch so conflict skips still fill the batch; want=1 keeps
        // the original single-argmax semantics (picked head = argmax)
        .limit(math.max(4 * want, 4)).collect()
      if (top.isEmpty) return (merges.toSeq, vocab) // nothing left to merge
      val used = scala.collection.mutable.Set.empty[String]
      val picked = scala.collection.mutable.ArrayBuffer.empty[(String, Long)]
      top.iterator.takeWhile(_ => picked.size < want).foreach { r =>
        val p = r.getString(0)
        val syms = p.split(" ")
        if (syms.forall(!used(_))) {
          picked += ((p, r.getLong(1))); used ++= syms
        }
      }
      picked.foreach { case (p, c) => merges += Merge(step, p, c); step += 1 }
      val prev = vocab
      val applied = prev.withColumn("sym",
        picked.foldLeft(col("sym")) { case (c, (p, _)) =>
          val pat = lit(s" $p "); val rep = lit(" " + p.replace(" ", "") + " ")
          org.apache.spark.sql.functions.replace(
            org.apache.spark.sql.functions.replace(c, pat, rep), pat, rep)
        })
      // SEVER THE LINEAGE each iteration: chaining hundreds of
      // withColumns grows the logical plan and the RDD dependency chain
      // without bound — re-analysis goes quadratic, the driver heap dies
      // near ~90 sequential merges, and DAG traversal StackOverflows
      // (both found by StressCheck bpe100; plan-only rebasing fixed the
      // heap but left the RDD chain). localCheckpoint materializes the
      // step AND replaces the dependency graph with the checkpointed
      // blocks — the standard iterative-algorithm idiom; superseded
      // checkpoints are freed by the ContextCleaner once unreferenced.
      vocab = applied.localCheckpoint()
      prev.unpersist()
    }
    (merges.toSeq, vocab)
  }
}
