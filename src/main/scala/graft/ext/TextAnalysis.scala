package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import TextFns._

/** Text analysis for training-data pipelines: quality scoring, language ID,
  * token counting, fingerprinting. Per-row projections only — no shuffles,
  * fully codegen'd; at 100 TB these run at scan speed.
  */
object TextAnalysis {

  /** Stopword profiles for the n-gram/stopword-vote language heuristic.
    * Deterministic tie-break: profile order below. */
  val LangProfiles: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "is", "to", "a", "in"),
    "de" -> Seq("der", "die", "das", "und", "ist", "ein"),
    "fr" -> Seq("le", "la", "les", "et", "est", "une"),
    "es" -> Seq("el", "los", "las", "es", "una", "y"))

  private def hits(toks: Column, words: Seq[String]): Column =
    size(filter(toks, t => t.isInCollection(words))).cast("bigint")

  /** Quality metrics per document: token counts (whitespace + BPE-ish
    * regex), average token length, punctuation & stopword ratios. */
  def textStats(docs: DataFrame): DataFrame = {
    val staged = docs.select(col("doc_id"), col("text"),
      tokens(col("text")).as("__toks"))
    val toks = col("__toks") // attribute read — tokenize once per row
    val nToks = size(toks).cast("bigint")
    val charLen = length(col("text")).cast("bigint")
    val punct = (length(col("text")) -
      length(regexp_replace(col("text"), "[.,!?;:]", ""))).cast("bigint")
    val stopHits = hits(toks, LangProfiles.head._2)
    val sumTokLen = aggregate(toks, lit(0L), (a, t) => a + length(t))
    val bpe = regexp_count(col("text"), lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"))
      .cast("bigint")
    staged.select(
      col("doc_id"),
      charLen.as("n_chars"),
      nToks.as("n_tokens"),
      bpe.as("n_bpe_tokens"),
      when(nToks === 0, lit(0.0))
        .otherwise(round(sumTokLen / nToks, 4)).as("avg_token_len"),
      when(charLen === 0, lit(0.0))
        .otherwise(round(punct / charLen, 6)).as("punct_ratio"),
      when(nToks === 0, lit(0.0))
        .otherwise(round(stopHits / nToks, 4)).as("stopword_ratio"))
  }

  /** Stopword-vote language ID with deterministic profile-order tiebreak.
    * Returns (doc_id, lang (labelled), pred_lang, per-profile hit counts). */
  def langId(docs: DataFrame): DataFrame = {
    val staged = docs.select(col("doc_id"), col("lang"),
      tokens(col("text")).as("__toks"))
    val toks = col("__toks")
    val hitCols = LangProfiles.map { case (l, ws) => l -> hits(toks, ws) }
    // argmax with first-profile-wins tiebreak, unrolled as a when-chain
    val maxHits = greatest(hitCols.map(_._2): _*)
    val chain = hitCols.reverse.foldLeft(lit("und")) { case (acc, (l, h)) =>
      when(h === maxHits && maxHits > 0, lit(l)).otherwise(acc)
    }
    staged.select(
      col("doc_id") +: col("lang") +: chain.as("pred_lang") +:
        hitCols.map { case (l, h) => h.as(s"${l}_hits") }: _*)
  }

  /** Normalized sha256 fingerprint per doc (exact-dedup key). */
  def fingerprints(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), fingerprint(col("text")).as("fp"))

  /** Corpus-wide heavy hitters: exact top-k tokens by frequency. Shape at
    * scale: explode → hash-aggregate with map-side partial counts (each
    * partition emits ≤ |vocab| rows, not |tokens|), then TakeOrdered for
    * the top-k — the driver sees k rows. For vocabularies too large even
    * for partial maps, swap the exact count for count-min sketch +
    * candidate re-count; the fixture vocabulary is small, so exact is both
    * the oracle and the right plan. */
  def heavyHitters(docs: DataFrame, k: Int = 20): DataFrame =
    docs.select(explode(tokens(col("text"))).as("token"))
      .groupBy("token").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("token"))
      .limit(k)
}
