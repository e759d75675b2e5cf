package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Text-analysis primitives for the training-data pipeline operators
  * (dedup, language-ID, quality scoring, token counting,
  * fingerprinting). Everything is a plain Column expression so it
  * stays inside whole-stage codegen, and every hash is *portable*:
  * derived from md5 hex (identical in Spark and DuckDB) rather than
  * engine-specific hash functions, so the oracle can recompute it.
  */
object TextFns {

  /** Modulus for portable token hashing (fits products with small
    * multipliers in int64 — no ANSI overflow).
    */
  val HashMod = 1000000007L

  /** Whitespace tokenizer (the testdata's documents are single-space
    * separated word tokens).
    */
  def tokenize(c: Column): Column = split(c, " ")

  /** Portable 60-bit token hash: first 15 hex chars of md5, as a long,
    * reduced mod [[HashMod]]. DuckDB twin:
    * `CAST(('0x' || substr(md5(tok), 1, 15)) AS BIGINT) % 1000000007`.
    */
  def tokHash(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast(LongType) % HashMod

  /** Injective 128-bit fingerprint of a (sorted) token array, used as
    * the identical-set identity by the dedup/similarity compression
    * stages. Each element is length-prefixed ("len:tok") before the
    * NUL join, so the encoding decodes unambiguously even when a token
    * itself contains NUL — possible, since NUL is not whitespace and
    * [[tokenize]] splits only on spaces. Without the prefix,
    * ["a<NUL>b"] and ["a","b"] would hash equal and falsely merge two
    * different sets into one J=1.0 duplicate group (ADVICE r10). md5
    * keeps the grouping shuffle at 16 bytes per row, never the array.
    */
  def setIdentity(arr: Column): Column =
    md5(concat_ws("\u0000",
      transform(arr, t => concat(length(t).cast(StringType), lit(":"), t))))

  /** BPE-ish token regex: letter runs, digit runs, single other chars. */
  val TokenRe = "[a-z]+|[0-9]+|[^a-z0-9 ]"

  /** Count of tokens from `toks` that appear in `set`. */
  def markerCount(toksCol: String, set: Seq[String]): Column = {
    val inList = set.map(s => s"'$s'").mkString(", ")
    expr(s"CAST(size(filter($toksCol, t -> t IN ($inList))) AS BIGINT)")
  }

  /** Stopword list used by the quality score (arbitrary but fixed). */
  val Stopwords = Seq("a", "the", "of", "and")

  /** Language marker sets for the n-gram/stopword language-ID
    * heuristic. (The synthetic corpus shares one vocabulary, so this
    * demonstrates the operator shape; real marker sets plug in the
    * same way.)
    */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of"),
    "es" -> Seq("el", "la", "los"),
    "de" -> Seq("der", "die", "das"),
    "fr" -> Seq("le", "les", "une"),
    "zh" -> Seq("de5", "shi4", "le5"))
}
