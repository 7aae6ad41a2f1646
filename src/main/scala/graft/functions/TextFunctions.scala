package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Text-analysis column primitives for the LLM-pipeline operators: engine-
  * portable hashing, tokenization, shingling, rolling-hash fingerprints.
  *
  * Everything here is a pure Column program (codegen-friendly, no UDFs) and
  * every hash is **engine-portable**: derived from `md5`, which Spark and
  * DuckDB compute identically, so the DuckDB oracle can re-derive the exact
  * same values. The arithmetic stays strictly inside signed-64-bit range:
  * token hashes are reduced mod [[HashPrime]] (< 2^31) before any multiply
  * by a coefficient (< 2^31), bounding products below 2^62.
  */
object TextFunctions {

  /** 2^31 − 1, a Mersenne prime — modulus for all rolling/affine hashing. */
  val HashPrime: Long = 2147483647L

  /** First 32 bits of md5 as an unsigned value in [0, 2^32). */
  def hash32(c: Column): Column =
    conv(substring(md5(c), 1, 8), 16, 10).cast(LongType)

  /** Second 32 bits of md5 — an independent hash for 64-bit constructions. */
  def hash32b(c: Column): Column =
    conv(substring(md5(c), 9, 8), 16, 10).cast(LongType)

  /** Whitespace tokenization (the corpus is single-space separated). */
  def tokens(text: Column): Column = split(text, " ")

  /** BPE-ish subword segmentation: letter runs, digit runs, single
    * punctuation marks — the standard pre-tokenizer regex shape.
    */
  val BpeTokenPattern = "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]"

  /** k-word shingles of a token array: positions j .. j+k-1 joined by a
    * single space; empty array when the document is shorter than k.
    *
    * `toks` must be an ALREADY-PROJECTED attribute, not a raw `tokens(...)`
    * expression: the lambda reads it k+1 times, and an inlined split would
    * re-tokenize the document once per read per window.
    */
  def shingles(toks: Column, k: Int): Column =
    when(
      size(toks) >= k,
      transform(
        sequence(lit(0), size(toks) - k),
        j => concat_ws(" ", (1 to k).map(i => element_at(toks, j + i)): _*)
      )
    ).otherwise(array().cast(ArrayType(StringType)))

  /** Shingle array → array of 32-bit hashes reduced mod [[HashPrime]]. */
  def shingleHashes(sh: Column): Column =
    transform(sh, s => pmod(hash32(s), lit(HashPrime)))

  /** Polynomial rolling hash of a whole string, char by char:
    * `acc ← (acc*31 + code) mod HashPrime`. Deterministic and cheap; the
    * document-identity fingerprint.
    */
  def rollingHash(text: Column): Column =
    aggregate(
      transform(split(text, ""), c => ascii(c).cast(LongType)),
      lit(0L),
      (acc, code) => pmod(acc * 31L + code, lit(HashPrime))
    )

  /** Window-minimum step of winnowing over an ALREADY-MATERIALIZED gram-
    * hash array column. Important: pass an attribute reference (a column
    * projected in a previous select), never the raw hash expression — the
    * lambda reads the array once per window, and an inlined expression
    * would recompute every md5 per window (measured 60× slowdown).
    */
  def winnowMins(gramHashes: Column, w: Int): Column =
    array_distinct(
      when(
        size(gramHashes) >= w,
        transform(
          sequence(lit(0), size(gramHashes) - w),
          j => array_min(slice(gramHashes, j + 1, lit(w)))
        )
      ).otherwise(gramHashes)
    )

  /** Stopword profiles for the language-ID heuristic. */
  val LangProfiles: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "mit", "ein"),
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is", "it"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "un", "es"),
    "fr" -> Seq("le", "la", "de", "et", "les", "des", "un", "une"),
    "zh" -> Seq("de", "shi", "le", "zai", "he", "you", "wo", "ta")
  )

  /** Character-bigram profiles — the n-gram half of the language-ID
    * heuristic (orthography-characteristic bigrams per language).
    */
  val LangBigramProfiles: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("ch", "ei", "en", "er", "sc", "ie", "un", "de"),
    "en" -> Seq("th", "he", "in", "er", "an", "re", "on", "at"),
    "es" -> Seq("es", "de", "la", "os", "ar", "en", "el", "ue"),
    "fr" -> Seq("le", "es", "en", "de", "re", "nt", "ou", "ai"),
    "zh" -> Seq("zh", "sh", "ng", "ia", "uo", "ao", "ei", "ou")
  )

  /** All character bigrams of a text (positions 1..len−1), multiplicity
    * preserved. Pass an attribute-backed column; the lambda reads it per
    * position.
    */
  def charBigrams(text: Column): Column =
    when(
      length(text) >= 2,
      transform(sequence(lit(1), length(text) - 1), i => substring(text, i, lit(2)))
    ).otherwise(array().cast(ArrayType(StringType)))
}
