package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Public text-processing functions — the building blocks of the
  * training-data pipeline catalog (normalization, tokenization,
  * shingling, hashing, fingerprints), exposed as composable `Column`
  * functions so library users can build their own pipelines. Everything
  * here is built-in-function composition: whole-stage codegen'd, no UDFs.
  *
  * Engine-portability contract (kept in sync with the DuckDB oracles in
  * graft.queries): md5-based hashing, left-fold rolling hash, whitespace
  * semantics of `\s+` splitting. See PipelineCatalog / NearDupCatalog for
  * the SQL mirror of each function.
  */
object Text {

  /** Canonical normalization: lowercase, trim, collapse whitespace runs. */
  def normalize(text: Column): Column =
    regexp_replace(lower(trim(text)), "\\s+", " ")

  /** Whitespace tokens of the trimmed text, original case. */
  def wsTokens(text: Column): Column = split(trim(text), "\\s+")

  /** Whitespace tokens of the normalized text. */
  def normTokens(text: Column): Column = split(normalize(text), " ")

  /** Exact-dedup content key: md5 of the normalized text. */
  def contentHash(text: Column): Column = md5(normalize(text))

  /** Evaluate `value` once and bind it for reuse inside `body`. Spark has
    * no `let` and CollapseProject re-inlines projections, so an expression
    * referenced k times is evaluated k times — ruinous when the expression
    * is a tokenize/regex chain referenced per array element. A
    * higher-order-function lambda variable IS a let: wrap the value in a
    * 1-element array, `transform` binds it once, the body reuses it.
    */
  def bound(value: Column)(body: Column => Column): Column =
    element_at(transform(array(value), v => body(v)), 1)

  /** Word n-grams over a token array; whole input as one gram when the
    * doc is shorter than n. Native expression (graft.expressions
    * .WordNgrams): the composed HOF form was interpreted per row and
    * re-evaluated element_at per gram element — and before `bound`, it
    * re-ran the tokenizer per element (measured 10×); the native loop
    * reads the token array once inside whole-stage codegen.
    */
  def wordNgrams(toks: Column, n: Int): Column = {
    import org.apache.spark.sql.GraftSqlBridge
    GraftSqlBridge.column(
      graft.expressions.WordNgrams(GraftSqlBridge.expression(toks), n))
  }

  /** Distinct word n-gram shingles of the normalized text. */
  def shingles(text: Column, n: Int = 3): Column =
    array_distinct(wordNgrams(normTokens(text), n))

  /** MinHash signature: k columns, each the lexicographic minimum of
    * `md5(seed || '|' || shingle)` — deterministic and engine-portable.
    * All k minimums come from ONE compact expression
    * (graft.expressions.MinhashSignature): the composed
    * `array_min(transform(md5))` form is value-identical but its k
    * generated-code segments cost ~2.4 s of Janino compilation per plan
    * shape at k = 12 (see the expression's scaladoc).
    */
  def minhashSignature(shingleArr: Column, k: Int): Seq[Column] = {
    import org.apache.spark.sql.GraftSqlBridge
    // The k getItem columns share ONE signature evaluation per row via
    // codegen subexpression elimination (identical deterministic subtree).
    val sig = GraftSqlBridge.column(
      graft.expressions.MinhashSignature(GraftSqlBridge.expression(shingleArr), k))
    (0 until k).map(i => sig.getItem(i).as(s"s$i"))
  }

  /** |A ∩ B| of two SORTED, duplicate-free string arrays — the
    * zero-allocation verification kernel (see
    * graft.expressions.IntersectCardSorted for the contract).
    */
  def intersectCardSorted(a: Column, b: Column): Column = {
    import org.apache.spark.sql.GraftSqlBridge
    GraftSqlBridge.column(graft.expressions.IntersectCardSorted(
      GraftSqlBridge.expression(a), GraftSqlBridge.expression(b)))
  }

  /** Order-insensitive set fingerprint: md5 of the sorted distinct token
    * set.
    */
  def setFingerprint(text: Column): Column =
    md5(array_join(array_sort(array_distinct(normTokens(text))), " "))

  /** Order-sensitive rolling polynomial hash over characters, mod 1e9+7.
    * Native expression (graft.expressions.RollingHash): the composed
    * `aggregate(split(...))` fold was value-identical but ran on the
    * interpreted HOF path and allocated a per-char array per row —
    * winnowing evaluates it once per positional n-gram (measured there).
    */
  def rollingHash(text: Column): Column = {
    import org.apache.spark.sql.GraftSqlBridge
    GraftSqlBridge.column(graft.expressions.RollingHash(
      GraftSqlBridge.expression(lower(trim(text)))))
  }

  /** Content-defined chunking over the normalized token stream: a token
    * whose polynomial hash (the [[rollingHash]] recurrence, applied per
    * token) satisfies `h % mod == 0` ENDS a chunk, so boundaries are
    * decided by content, not position — an edit re-aligns at the next
    * boundary instead of shifting every downstream block (the
    * rsync/Rabin-CDC property; CdcSpec proves the ≤1-chunk blast
    * radius). Expected chunk length ≈ `mod` tokens. One per-row fold,
    * whole-stage-codegen'd; catalog entry `doc_cdc_chunks`.
    */
  def cdcChunks(text: Column, mod: Int = 8): Column = {
    // Same recurrence as rollingHash, applied per TOKEN (tokens are
    // already normalized — no second lower/trim); the native expression
    // replaces a fold-within-fold on the interpreted HOF path.
    def tokHash(t: Column) = {
      import org.apache.spark.sql.GraftSqlBridge
      GraftSqlBridge.column(graft.expressions.RollingHash(
        GraftSqlBridge.expression(t)))
    }
    val emptyArr = array().cast("array<string>")
    aggregate(
      filter(normTokens(text), t => t =!= ""),
      struct(emptyArr.as("done"), emptyArr.as("cur")),
      (acc, t) => bound(concat(acc.getField("cur"), array(t))) { cur2 =>
        when(tokHash(t) % mod === 0,
          struct(concat(acc.getField("done"),
            array(array_join(cur2, " "))).as("done"), emptyArr.as("cur")))
          .otherwise(struct(acc.getField("done").as("done"), cur2.as("cur")))
      },
      acc => concat(acc.getField("done"),
        when(size(acc.getField("cur")) > 0,
          array(array_join(acc.getField("cur"), " "))).otherwise(emptyArr)))
  }

  /** Count of tokens contained in a fixed word set. */
  def tokensInSet(toks: Column, words: Seq[String]): Column =
    size(filter(toks, t => t.isInCollection(words)))

  /** BPE-style pre-tokenization count: letter runs | digit runs | other
    * symbol runs (the GPT-2 split shape).
    */
  def bpeTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit(raw"\p{L}+|\p{N}+|[^\s\p{L}\p{N}]+"), lit(0)))

  private val EmailRe = raw"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
  private val Ipv4Re  = raw"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
  private val PhoneRe = raw"\b\d{3}[-.]\d{3}[-.]\d{4}\b"

  /** PII redaction: emails, IPv4 addresses, and xxx-xxx-xxxx phone
    * numbers replaced with typed placeholders. Email first — its local
    * part can contain digits and dots that the narrower patterns would
    * otherwise bite into. All three are RE2-compatible so the same
    * patterns run on engines with either regex dialect. Per-row
    * projection, whole-stage codegen'd. Catalog entry: `doc_pii_redact`
    * (PipelineCatalog.piiRedact), which derives a deterministic
    * PII-bearing suffix in both engines so the oracle is non-vacuous on
    * the digit-free synthetic corpus; the replacement-order contract is
    * pinned in TextSpec.
    */
  def redactPii(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, EmailRe, "<EMAIL>"),
        Ipv4Re, "<IP>"),
      PhoneRe, "<PHONE>")

  /** Count of PII matches, the three patterns counted INDEPENDENTLY on
    * the raw text — deliberately not "number of replacements
    * [[redactPii]] makes": redaction replaces sequentially, so a phone-
    * or IP-shaped substring inside an email local part (555-867-5309@x.com)
    * counts twice here but redacts once (the email replacement consumes
    * it). Cross-engine equality holds because the oracle mirrors this
    * exact independent-count formula; on real crawl data read n_pii as
    * "PII pattern hits", an upper bound on redactions, not a redaction
    * count.
    */
  def piiCount(text: Column): Column =
    size(regexp_extract_all(text, lit(EmailRe), lit(0))) +
      size(regexp_extract_all(text, lit(Ipv4Re), lit(0))) +
      size(regexp_extract_all(text, lit(PhoneRe), lit(0)))
}
