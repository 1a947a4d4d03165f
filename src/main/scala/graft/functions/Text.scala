package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis column functions for the LLM-data-pipeline operators:
  * tokenization, shingling, portable 32-bit hashing, rolling-hash
  * fingerprints, and quality/language signals.
  *
  * Everything here is built from codegen'd built-ins (no UDFs) and is
  * engine-portable: the same formulas are expressible in ANSI-ish SQL, which
  * is what the DuckDB oracles do. Determinism rule: any hash used for keys
  * or signatures derives from md5 (stable across engines/JVMs), never from
  * `hash()`/`xxhash64` whose seeds are engine-specific.
  */
object Text {

  /** Whitespace tokenization; consecutive separators collapse. */
  def tokens(text: Column): Column = split(trim(text), "\\s+")

  /** Distinct word k-grams ("shingles") joined by single spaces — the unit
    * of near-dup comparison. Empty array when the doc has fewer than k
    * tokens (never a descending `sequence`).
    */
  def shingles(toks: Column, k: Int): Column = {
    val grams = transform(
      sequence(lit(1), size(toks) - (k - 1)),
      i => concat_ws(" ", (0 until k).map(o => element_at(toks, (i + o).cast("int"))): _*))
    when(size(toks) >= k, array_distinct(grams)).otherwise(array().cast("array<string>"))
  }

  /** Consecutive NON-overlapping k-token blocks joined by single spaces —
    * the unit of exact span dedup ([[graft.operators.TextDedup.spanDedup]]).
    * Unlike [[shingles]] (overlapping, distinct, for similarity), blocks
    * tile the document: order and multiplicity are preserved so the
    * document can be REBUILT from its surviving blocks. The final block
    * may be shorter than k; empty array for an empty token list (never a
    * descending `sequence`).
    */
  def blocks(toks: Column, k: Int): Column = {
    require(k > 0, s"block size must be positive, got $k")
    when(size(toks) > 0,
      transform(
        sequence(lit(0), floor((size(toks) - 1) / lit(k)).cast("int")),
        i => concat_ws(" ", slice(toks, i * k + 1, lit(k)))))
      .otherwise(array().cast("array<string>"))
  }

  /** Portable 32-bit hash: first 8 hex chars of md5("<seed>:<value>") as a
    * non-negative long in [0, 2^32). Stable across Spark and any SQL engine
    * with md5 — the basis for minhash/simhash/LSH signatures.
    */
  def hash32(value: Column, seed: Int): Column =
    conv(substring(md5(concat(lit(s"$seed:"), value)), 1, 8), 16, 10).cast("long")

  /** Seedless portable 32-bit hash (one md5 per value; derive families of
    * hashes from it with [[affine]] instead of re-hashing — 16× cheaper
    * for minhash signatures).
    */
  def baseHash32(value: Column): Column =
    conv(substring(md5(value), 1, 8), 16, 10).cast("long")

  /** Universal-hash family member j over a base hash:
    * ((2j+1)·(b mod p) + (40503j+1)) mod p with p = 2^31−1. Stays in
    * long range (31·2^31 ≪ 2^63) and is portable SQL arithmetic.
    */
  val HashP = 2147483647L
  def affine(base: Column, j: Int): Column =
    (lit(2L * j + 1) * (base % HashP) + lit(40503L * j + 1)) % HashP

  /** Polynomial rolling hash over the token stream:
    * fold(acc = (acc*31 + hash32(t)) mod (2^31-1)). Order-sensitive (unlike
    * a bag-of-words hash) — two docs with the same tokens in different
    * order fingerprint differently. Fits in long: acc < 2^31, *31 + 2^32 <
    * 2^37.
    */
  def rollingHash(toks: Column): Column =
    aggregate(transform(toks, t => hash32(t, 0)), lit(0L),
      (acc, h) => (acc * 31 + h) % 2147483647L)

  /** BPE-ish word-piece pattern: contraction suffixes, letter runs capped
    * at 4 chars (long words split into multiple pieces, like a subword
    * vocabulary would), digit runs capped at 3 (GPT-style number chunking),
    * single non-space symbols. RE2-safe (no lookaround) so the DuckDB
    * oracle evaluates the identical pattern; alternation is leftmost-first
    * in both engines.
    */
  val BpePattern = """'(?:s|t|re|ve|m|ll|d)|\p{L}{1,4}|\p{N}{1,3}|[^\s\p{L}\p{N}]"""

  /** All BPE-ish pieces of the text, in order — `size` of this is the
    * token-count estimate a tokenizer-budget pipeline needs; pieces per
    * whitespace word is the fertility signal.
    */
  def bpePieces(text: Column): Column =
    regexp_extract_all(text, lit(BpePattern), lit(0))

  /** Whitespace-normalized lowercase form for exact-content fingerprints. */
  def normalized(text: Column): Column =
    lower(regexp_replace(trim(text), "\\s+", " "))

  /** Stopword list shared with the oracle SQL (subset of the synthetic
    * corpus vocabulary on purpose, so counts are non-trivial).
    */
  val Stopwords: Seq[String] = Seq("the", "a", "of", "to", "in", "is", "and")

  def stopwordCount(toks: Column): Column =
    size(filter(toks, t => t.isin(Stopwords: _*))).cast("long")

  /** Per-language marker words for the n-gram/stopword language-ID
    * heuristic. Checked in declaration order (deterministic tie-break).
    */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "is"),
    "de" -> Seq("der", "die", "das"),
    "fr" -> Seq("le", "la", "les"),
    "es" -> Seq("el", "los", "las"))

  /** Language guess: the first language (in [[LangMarkers]] order) whose
    * marker-word count is maximal and positive; "und" when no marker hits.
    */
  def langGuess(toks: Column): Column = {
    val scores = LangMarkers.map { case (lang, ws) =>
      lang -> size(filter(toks, t => t.isin(ws: _*)))
    }
    val best = greatest(scores.map(_._2): _*)
    scores.foldRight(lit("und")) { case ((lang, s), otherwise) =>
      when(s === best && s > 0, lit(lang)).otherwise(otherwise)
    }
  }

  /** PII scrubbing — the redaction pass every shipped training corpus
    * runs. Patterns are RE2-safe (no lookaround/backrefs, like
    * [[bpePieces]]) so Java regex and the DuckDB twin match identical
    * spans; application ORDER is part of the contract (emails first so
    * their digits can't be half-eaten as phone numbers, IPs before
    * generic digit runs). Deliberately conservative, high-precision
    * patterns — a production deployment swaps in its compliance set, the
    * operator shape (ordered replace chain + per-pattern counts) is what
    * the engine owns.
    */
  val PiiPatterns: Seq[(String, String, String)] = Seq(
    ("email", "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b", "<IP>"),
    ("phone", "\\+\\d[\\d() -]{6,}\\d", "<PHONE>"),
    ("idnum", "\\b\\d{9,}\\b", "<ID>"))

  /** Text with every [[PiiPatterns]] occurrence replaced by its token,
    * applied in declaration order.
    */
  def redactPii(text: Column): Column =
    PiiPatterns.foldLeft(text) { case (acc, (_, re, token)) =>
      regexp_replace(acc, re, token)
    }

  /** Per-pattern match counts (`n_<name>` columns), counted on the SAME
    * progressively-redacted stream the replacements see — so a span
    * consumed by an earlier pattern is never double-counted by a later
    * one (the DuckDB twin counts on the same intermediate strings).
    */
  def piiCounts(text: Column): Seq[Column] = {
    val staged = PiiPatterns.scanLeft(text) { case (acc, (_, re, token)) =>
      regexp_replace(acc, re, token)
    }
    PiiPatterns.zip(staged).map { case ((name, re, _), stage) =>
      regexp_count(stage, lit(re)).cast("long").as(s"n_$name")
    }
  }
}
