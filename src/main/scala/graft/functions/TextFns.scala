package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis column functions for large-scale training-data
  * pipelines. Everything is built from codegen'd Catalyst built-ins (no
  * UDFs) so whole-stage codegen and pushdown survive — at 100 TB the
  * scan + these projections stay one narrow stage.
  *
  * Determinism contract: every function here is a pure function of its
  * input strings (md5-based hashing, no JVM hashCode), so results are
  * reproducible across engines — the DuckDB oracles in
  * graft.queries.TextDedup re-state these formulas in SQL.
  */
object TextFns {

  /** Single-space-collapsed, edge-trimmed text: ONE regex pass (collapse
    * every whitespace run to one space) + a cheap non-regex trim of the
    * now-single-space edges. Spark's trim() only strips spaces, so
    * trimming before collapsing would leave \n/\t edges behind — and
    * split() keeps trailing empties, leaking an empty token. */
  private def wsCollapsed(text: Column): Column =
    trim(regexp_replace(text, "\\s+", " "))

  /** Whitespace-normalized lowercase text: the canonical form for exact
    * dedup fingerprints. */
  def normalized(text: Column): Column =
    lower(wsCollapsed(text))

  /** Whitespace tokens of the trimmed text. */
  def tokens(text: Column): Column = split(wsCollapsed(text), " ")

  /** Word n-gram shingles, space-joined: the unit for Jaccard/MinHash
    * near-dup detection. slice() is 1-based. Docs shorter than n tokens
    * yield an empty set (sequence(1, 0) counts DOWN, so the short case
    * must be guarded, not clamped). */
  def shingles(toks: Column, n: Int): Column =
    when(size(toks) >= n,
      transform(
        sequence(lit(1), size(toks) - lit(n - 1)),
        i => array_join(slice(toks, i, lit(n)), " ")))
      .otherwise(array().cast("array<string>"))

  /** Word n-gram shingles via a zero-width lookahead regex anchored at
    * token starts — one codegen'd expression, measured ~11× faster than
    * the higher-order-function formulation (HOFs are interpreted).
    * Produces the same shingle set as [[shingles]].
    *
    * The lookahead matches a single literal space between tokens, so the
    * input is whitespace-collapsed (case-preserving — NOT [[normalized]],
    * which lowercases) first: newlines/tabs/runs of spaces then yield the
    * same shingles as the tokens()-based form and the SQL oracles.
    */
  def shinglesRegex(text: Column, n: Int): Column =
    regexp_extract_all(wsCollapsed(text),
      lit("(?<![^\\s])(?=(\\S+(?: \\S+){" + (n - 1) + "}))"), lit(1))

  /** Exact-dedup fingerprint: md5 of the normalized text. */
  def fingerprint(text: Column): Column = md5(normalized(text))

  /** Prefix fingerprint over the first n tokens — collapses documents
    * that share a long prefix (cheap near-dup family). */
  def prefixFingerprint(text: Column, n: Int): Column =
    md5(array_join(slice(tokens(text), 1, n), " "))

  /** One MinHash value: min over the shingle set of md5(seed:shingle).
    * Hex-string min is a valid uniform min-hash (md5 is uniform on hex
    * strings) and needs no 64-bit integer conversion, which keeps the
    * same expression valid in the SQL oracle. */
  def minhash(shingleCol: Column, seed: Int): Column =
    array_min(transform(shingleCol, s => md5(concat(lit(s"$seed:"), s))))

  /** Count of alphabetic characters. */
  def alphaChars(text: Column): Column =
    length(regexp_replace(text, "[^a-zA-Z]", ""))

  /** Count of punctuation characters. */
  def punctChars(text: Column): Column =
    length(regexp_replace(text, "[^.,;:!?]", ""))

  /** Count of tokens belonging to a fixed stopword list. */
  def stopwordHits(toks: Column, stopwords: Seq[String]): Column =
    size(filter(toks, t => t.isin(stopwords.map(lit(_)): _*)))

  /** BPE-ish subword count: alphabetic runs + digit runs + isolated
    * non-space symbols, the usual pre-tokenizer regex family. */
  def subwordCount(text: Column): Column =
    size(regexp_extract_all(text, lit("[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]"), lit(0)))
}
