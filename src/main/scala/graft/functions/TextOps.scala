package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines:
  * tokenization, shingling, MinHash/SimHash signatures, language id,
  * quality scoring, fingerprinting.
  *
  * Everything is a pure Catalyst column composition (codegen'd, distributed,
  * no driver-side work) and — deliberately — reproducible in ANSI SQL so the
  * DuckDB oracle can verify it:
  *  - hashing is md5-based (identical hex output in both engines),
  *  - MinHash uses the lexicographic MIN of md5 strings under k seeded
  *    re-hashes (a valid min-wise permutation family),
  *  - SimHash uses the 16 md5 nibbles of each token as 16 signed votes.
  */
object TextOps {

  /** Whitespace tokenization, lowercased, empty tokens dropped.
    * DuckDB twin: list_filter(string_split(lower(t), ' '), x -> x <> ''). */
  def tokens(text: Column): Column =
    filter(split(lower(text), " "), t => t =!= "")

  def tokenCount(text: Column): Column = size(tokens(text))

  // ---- *FromTokens variants -------------------------------------------------
  // Catalyst's projection collapse re-inlines a derived tokens column into
  // every consumer, so a stats query computes the tokenization per derived
  // column. These variants take an already-materialized tokens column
  // (e.g. from a persisted projection) and compute everything from it.

  def langScoresFrom(toks: Column): Seq[(String, Column)] =
    langMarkers.map { case (lang, words) =>
      lang -> size(filter(toks, t => t.isin(words.map(lit): _*)))
    }

  /** Argmax over (lang, score) columns: langs visited in the given
    * (alphabetical) order, replaced only on a strictly greater score — ties
    * keep the earlier lang; zero votes everywhere → 'und'. */
  def argmaxLang(scores: Seq[(String, Column)]): Column =
    scores.foldLeft((lit("und"), lit(0))) {
      case ((bestLang, bestScore), (lang, score)) =>
        (when(score > bestScore, lit(lang)).otherwise(bestLang),
          when(score > bestScore, score).otherwise(bestScore))
    }._1

  def langIdFrom(toks: Column): Column = argmaxLang(langScoresFrom(toks))

  def qualityScoreFrom(text: Column, toks: Column): Column = {
    val nTok = greatest(size(toks), lit(1)).cast("double")
    val lenSig = least(length(text), lit(500)).cast("double") / 500.0
    val stopHits = size(filter(toks,
      t => t.isin(langMarkers.toMap.apply("en").map(lit): _*))).cast("double")
    val stopSig = least(stopHits * 5.0 / nTok, lit(1.0))
    val longSig = size(filter(toks, t => length(t) >= 4)).cast("double") / nTok
    round((lenSig + stopSig + longSig) / 3.0, 6)
  }

  /** Word n-gram shingles as strings joined by ''. */
  def shingles(text: Column, n: Int): Column = {
    val toks = tokens(text)
    // guard: Spark's sequence(1,0) counts DOWN, so short docs need an
    // explicit empty-array branch
    when(size(toks) < n, array().cast("array<string>"))
      .otherwise(transform(sequence(lit(1), size(toks) - (n - 1)),
        i => concat_ws("", slice(toks, i, lit(n)))))
  }

  /** k-element MinHash signature via the two-hash construction
    * (Kirsch–Mitzenmacher): one md5 per shingle yields h1/h2 (32-bit halves),
    * g_i = (h1 + i·h2) mod (2³¹−1); signature element i = min over shingles
    * of g_i. One hash per shingle instead of k — the md5 is the whole cost.
    * DuckDB twin uses ('0x'||substr(md5(s),..))::BIGINT identically. */
  def minhashSignature(shinglesCol: Column, k: Int): Column = {
    val hs = transform(shinglesCol, s => md5(s))
    array((0 until k).map { i =>
      array_min(transform(hs, h =>
        (conv(substring(h, lit(1), lit(8)), 16, 10).cast("long") +
          lit(i.toLong) * conv(substring(h, lit(9), lit(8)), 16, 10).cast("long"))
          % 2147483647L))
    }: _*)
  }

  /** LSH band key: hash of the band's slice of the signature, prefixed by
    * the band index so different bands never collide. */
  def bandKeys(signature: Column, bands: Int, rowsPerBand: Int): Column =
    array((0 until bands).map { b =>
      md5(concat_ws("|", lit(b.toString),
        concat_ws(",", transform(
          slice(signature, b * rowsPerBand + 1, rowsPerBand),
          x => x.cast("string")))))
    }: _*)

  /** 16-bit SimHash over tokens. Bit i (i=1..16, MSB first) is set when the
    * sum over tokens of (+1 if nibble i of md5(token) ≥ 8 else −1) is > 0. */
  def simhash16(text: Column): Column = {
    val toks = tokens(text)
    // single pass: one md5 per token, votes accumulated as a 16-int array
    // (the per-bit-aggregate formulation would re-hash every token 16×)
    val bitVotes = aggregate(
      transform(toks, t => md5(t)), // hash materialized once per token
      array_repeat(lit(0), 16),
      (acc, h) => zip_with(acc, sequence(lit(1), lit(16)), (a, i) =>
        a + when(instr(lit("89abcdef"), substring(h, i, lit(1))) > 0, 1)
          .otherwise(-1)))
    (0 until 16).map { i =>
      when(element_at(bitVotes, i + 1) > 0, lit(1 << (15 - i))).otherwise(lit(0))
    }.reduce(_ + _)
  }

  /** Hamming distance between two simhash16 values (bit-count of xor). */
  def hamming16(a: Column, b: Column): Column =
    bit_count(a.bitwiseXOR(b))

  /** Stopword-vote language id over {en,fr,es,de,zh} — an n-gram/stopword
    * heuristic chosen to be exactly reproducible in SQL: score(lang) =
    * number of tokens that are in lang's marker list; argmax wins, ties
    * broken by alphabetical lang code, no votes → 'und'. */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "die", "das", "und", "nicht", "ist", "ich", "ein", "mit", "von"),
    "en" -> Seq("the", "and", "of", "to", "is", "in", "that", "it", "for", "with"),
    "es" -> Seq("el", "la", "los", "las", "es", "en", "que", "por", "una", "para"),
    "fr" -> Seq("le", "la", "les", "et", "est", "dans", "que", "pour", "une", "des"),
    "zh" -> Seq("的", "是", "了", "在", "我", "有", "和", "不", "人", "这"))

  def langScores(text: Column): Seq[(String, Column)] =
    langScoresFrom(tokens(text))

  /** Argmax lang; langs visited in alphabetical order and replaced only on a
    * strictly greater score, so ties keep the alphabetically-first lang;
    * zero votes everywhere → 'und'. */
  def langId(text: Column): Column = langIdFrom(tokens(text))

  /** Quality score in [0,1]: mean of three simple signals —
    * length signal  = least(n_chars,500)/500,
    * stopword ratio = en-marker hits / tokens (clamped to 1, scaled ×5),
    * short-token penalty inverse = tokens with len≥4 / tokens. */
  def qualityScore(text: Column): Column =
    qualityScoreFrom(text, tokens(text))

  /** Winnowing fingerprint (rolling-hash document sketch) — the one-pass
    * [[graft.functions.WinnowFingerprints]] expression; see its scaladoc
    * for the semantics twin and why a column-function formulation (which
    * re-inlines tokenization into every transform lambda) goes quadratic
    * in document length. */
  def winnowFingerprints(text: Column, k: Int = 3, w: Int = 4): Column =
    WinnowExpr.winnow(text, k, w)

  /** Document fingerprint: md5 of the normalized text (lowercased,
    * whitespace collapsed to single spaces, trimmed) — the exact-dedup key. */
  def fingerprint(text: Column): Column =
    md5(trim(regexp_replace(lower(text), "\\s+", " ")))

  // ---- PII scrubbing ---------------------------------------------------------

  /** Patterns chosen to be valid in BOTH Java regex (Spark) and RE2
    * (DuckDB): no lookaround, no backreferences. URLs are replaced before
    * emails (an email never contains '://', but a URL's non-space run would
    * swallow a trailing email), phones last (placeholders contain no
    * digits, so the phone pass can't match across an earlier replacement).
    * The URL tail is an explicit character class, not \S: Java's \s
    * includes vertical tab (\x0B) while RE2's does not, so \S would bound
    * the match differently in Spark vs DuckDB on control-character text. */
  val urlRe = "https?://[^ \\t\\n\\x0B\\f\\r]+"
  val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val phoneRe = "\\+?[0-9][0-9()\\- ]{6,}[0-9]"

  /** PII redaction for training corpora: URLs, emails, phone numbers →
    * typed placeholders, with per-kind match counts (the audit signal a
    * scrubbing pipeline reports). Pure codegen'd column ops — one pass per
    * pattern, no UDF. Returns struct(redacted, n_urls, n_emails, n_phones). */
  def redactPii(text: Column): Column = {
    val afterUrl = regexp_replace(text, urlRe, "<URL>")
    val afterEmail = regexp_replace(afterUrl, emailRe, "<EMAIL>")
    val afterPhone = regexp_replace(afterEmail, phoneRe, "<PHONE>")
    struct(
      afterPhone.as("redacted"),
      size(regexp_extract_all(text, lit(urlRe), lit(0))).as("n_urls"),
      size(regexp_extract_all(afterUrl, lit(emailRe), lit(0))).as("n_emails"),
      size(regexp_extract_all(afterEmail, lit(phoneRe), lit(0))).as("n_phones"))
  }

  // ---- Deterministic dataset splits ------------------------------------------

  /** Stable train/val/test assignment from the id alone: bucket =
    * first 4 md5 hex digits mod 100, so membership is reproducible across
    * runs/engines and independent of row order or partitioning (never use
    * rand() for splits — resuming a pipeline would reshuffle membership).
    * DuckDB twin: ('0x' || substr(md5(id::VARCHAR), 1, 4))::INT % 100. */
  def splitBucket(id: Column): Column =
    conv(substring(md5(id.cast("string")), 1, 4), 16, 10).cast("int") % 100

  /** Named split from percentage cut points: [0,trainPct) → 'train',
    * [trainPct, trainPct+valPct) → 'val', rest → 'test'. */
  def splitAssign(id: Column, trainPct: Int = 80, valPct: Int = 10): Column = {
    val b = splitBucket(id)
    when(b < trainPct, "train")
      .when(b < trainPct + valPct, "val")
      .otherwise("test")
  }
}
