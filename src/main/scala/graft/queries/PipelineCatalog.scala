package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.CacheOnce._
import graft.Tables
import graft.functions.Text

/** Large-scale training-data pipeline operators over the `documents` table
  * (doc_id, text, lang, source, n_chars): dedup, text analysis, language
  * ID, fingerprinting. Everything here is either a per-row projection
  * (embarrassingly parallel, whole-stage codegen'd, no shuffle) or a
  * single hash-shuffle on a high-cardinality key — the shapes that survive
  * 100 TB unchanged.
  *
  * Cross-engine determinism: all text ops are exact (string/integer); all
  * ratios are rounded to 6 decimals on both sides before comparison.
  */
object PipelineCatalog {

  private def documents(s: SparkSession, d: String) = Tables.documents(s, d)

  /** CUSUM band half-width, in value units (±H around the global-mean
    * drift line): 500 separates a persistent shift from random-walk noise
    * on this corpus (6 / 50 / 509 breaching users at sf0.001/0.01/0.1).
    */
  private val CusumH = 500

  /** The fixed BM25 query, shared by the batch entry and the streaming
    * term-state fold (Transforms.bm25TermState / bm25Fold).
    */
  private[graft] val Bm25Terms = Seq("dup", "scan", "merge")

  /** Canonical normalization: lowercase, trim, collapse whitespace runs. */
  private val normSql = raw"regexp_replace(lower(trim(text)), '\s+', ' ', 'g')"

  /** Whitespace tokens of the trimmed text (no empty tokens). */
  private val toksSql = raw"string_split_regex(trim(text), '\s+')"

  /** Tokens of the NORMALIZED text (mirror of Text.normTokens).
    * `private[queries]`: ScaleCatalog interpolates the same snippet so
    * the two catalogs' oracles cannot drift apart.
    */
  private[queries] val normToksSql = s"string_split_regex($normSql, ' ')"

  // Declared BEFORE every entry that interpolates them into an oracle
  // string: object vals initialize in declaration order, and an entry
  // defined above these would bake `null` into its SQL.
  private val stopwords = Seq(
    "the", "a", "an", "and", "of", "to", "in", "is", "it", "that", "for", "on", "with")
  private val stopListSql = stopwords.map(w => s"'$w'").mkString(", ")

  // -------------------------------------------------------------------
  // Exact deduplication
  // -------------------------------------------------------------------

  /** Exact dedup by content hash of the normalized text: one row per
    * distinct content, canonical doc = min doc_id, plus the duplicate
    * count. One shuffle keyed on a 128-bit hash — uniform by construction,
    * no skew, no all-pairs anything; at 100 TB this is a single
    * hash-aggregate over the corpus.
    */
  val exactDedup: CatalogEntry = CatalogEntry(
    "doc_exact_dedup",
    (s, d) => documents(s, d)
      .select(Text.contentHash(col("text")).as("content_hash"), col("doc_id"))
      .groupBy("content_hash")
      .agg(min("doc_id").as("canonical_id"), count(lit(1)).as("n_copies")),
    Some(s"""SELECT md5($normSql) AS content_hash,
             MIN(doc_id) AS canonical_id, COUNT(*) AS n_copies
             FROM documents GROUP BY 1"""))

  /** Incremental (cross-snapshot) dedup — the production recurrence: a new
    * crawl increment arrives and only content whose SIGNATURE is not
    * already in the base corpus may enter. The key is the 32-bit SimHash
    * (signature equality ⇒ same/near-same token profile — the d = 0
    * Manku decision), which is what production incremental dedup keys on:
    * byte-exact keys miss every trivially perturbed recrawl. Here the
    * deterministic `doc_id % 10` split stands in for the two snapshots
    * (base = 0–6, increment = 7–9); production swaps in two tables on the
    * same seam.
    *
    * 100 TB shape: at scale the BASE signature set is corpus-sized —
    * never broadcastable — so membership is a shuffle LEFT ANTI join
    * keyed on the uniform signature (no skew by construction). The
    * increment is typically ≪ base, exactly the asymmetry Spark's runtime
    * bloom-filter injection exploits (PlanSpec proves our join shapes are
    * eligible): the increment side builds the filter, the base scan drops
    * non-candidates before the shuffle.
    */
  val incrementalDedup: CatalogEntry = CatalogEntry(
    "doc_incremental_dedup",
    (s, d) => {
      val sig = NearDupCatalog.simhashDF(s, d)
      val base = sig.filter(col("doc_id") % 10 < 7).select("simhash").distinct()
      sig.filter(col("doc_id") % 10 >= 7)
        .join(base, Seq("simhash"), "leftanti")
        .select("doc_id", "simhash")
    },
    Some(s"""WITH ${NearDupCatalog.simhashCtesSql},
                  base AS (SELECT DISTINCT simhash FROM sig WHERE doc_id % 10 < 7)
             SELECT doc_id, simhash
             FROM sig
             WHERE doc_id % 10 >= 7
               AND simhash NOT IN (SELECT simhash FROM base)"""))

  /** Per-source adaptive quality gate (the Gopher-style rule): score every
    * document with the composite quality heuristic and keep those at or
    * above their OWN source's 25th percentile — a fixed global cutoff
    * over- or under-prunes sources with different base quality, so the
    * threshold adapts per source.
    *
    * 100 TB shape: scoring is a pure per-row projection; the threshold
    * aggregate reads only (source, score) — column-pruned — into a
    * sources-sized result that then rides a BROADCAST join back onto the
    * corpus (a window over `source` would instead shuffle the whole
    * corpus by a low-cardinality skewed key). The threshold is the
    * ceil(n/4)-th ORDER STATISTIC, not an interpolated percentile: an
    * interpolated quantile is a DERIVED float whose last bits differ
    * between engines at rounding boundaries (measured: a 2-row flutter
    * at sf0.01), while an order statistic is an actual score from the
    * data — the keep comparison is bit-exact by construction. Exact
    * order statistics sort within each source group; at heavy-group
    * scale `approx_percentile` is the drop-in (same note as
    * `value_percentiles`).
    */
  val qualityFilter: CatalogEntry = CatalogEntry(
    "doc_quality_filter",
    (s, d) => {
      val scored = documents(s, d).select(
        col("doc_id"), col("source"),
        round(
          least(size(Text.wsTokens(col("text"))) / lit(50.0), lit(1.0)) * 0.5 +
          Text.tokensInSet(Text.wsTokens(col("text")), stopwords) /
            size(Text.wsTokens(col("text"))) * 0.3 +
          (lit(1.0) - expr("length(text) - length(regexp_replace(text, '[.,;:!?]', ''))") /
            length(col("text"))) * 0.2, 6).as("quality_score"))
      val thr = scored.groupBy("source")
        .agg(count(lit(1)).as("n"), sort_array(collect_list(col("quality_score"))).as("ss"))
        .select(col("source"),
          element_at(col("ss"), ceil(col("n") * 0.25).cast("int")).as("q25"))
      scored.join(broadcast(thr), Seq("source"))
        .filter(col("quality_score") >= col("q25"))
        .select(col("doc_id"), col("source"), col("quality_score"), col("q25"))
    },
    Some(s"""WITH scored AS (
               SELECT doc_id, source,
                      ROUND(LEAST(len($toksSql) / 50.0, 1.0) * 0.5
                            + len(list_filter($toksSql, t -> t IN ($stopListSql)))
                              / len($toksSql) * 0.3
                            + (1.0 - (length(text) - length(regexp_replace(text, '[.,;:!?]', '', 'g')))
                              / length(text)) * 0.2, 6) AS quality_score
               FROM documents),
             thr AS (SELECT source,
                            list_sort(list(quality_score))[CAST(ceil(count(*) * 0.25) AS INT)] AS q25
                     FROM scored GROUP BY source)
             SELECT doc_id, scored.source, quality_score, q25
             FROM scored JOIN thr ON scored.source = thr.source
             WHERE quality_score >= q25"""))

  /** Benchmark decontamination — the eval-set hygiene step every training
    * pipeline runs before a model ever sees the corpus: flag every corpus
    * document sharing at least one 8-word gram with the benchmark set
    * (8–13-gram overlap is the standard published decontamination rule;
    * 8 chosen so the flag is exact n-gram containment, not topicality).
    * The benchmark here is the deterministic `doc_id % 50 = 0` slice —
    * in production it is an external eval-set table on the same seam.
    *
    * 100 TB shape: benchmark gram sets are tiny relative to the corpus
    * (eval suites, not crawls), so the membership probe is an explicitly
    * BROADCAST left-semi join against the corpus's exploded grams — the
    * corpus is touched in ONE per-row pass (gram explode + hashed probe),
    * never shuffled; only the distinct contaminated doc_id set (bounded
    * by the benchmark's true matches) reaches a shuffle.
    */
  val decontaminate: CatalogEntry = CatalogEntry(
    "doc_decontaminate",
    (s, d) => {
      val docs = documents(s, d)
      val isBench = col("doc_id") % 50 === 0
      val benchGrams = docs.filter(isBench)
        .select(explode(Text.shingles(col("text"), 8)).as("g")).distinct()
      val corpus = docs.filter(!isBench)
      val hits = corpus
        .select(col("doc_id"), explode(Text.shingles(col("text"), 8)).as("g"))
        .join(broadcast(benchGrams), Seq("g"), "leftsemi")
        .select("doc_id").distinct()
        .withColumn("contaminated", lit(true))
      corpus.join(hits, Seq("doc_id"), "left")
        .select(col("doc_id"), coalesce(col("contaminated"), lit(false)).as("contaminated"))
    },
    Some(raw"""WITH t AS (SELECT doc_id, string_split_regex(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS t
                          FROM documents),
                    g AS (SELECT DISTINCT doc_id,
                                 unnest(CASE WHEN len(t) < 8 THEN [array_to_string(t, ' ')]
                                   ELSE [array_to_string(t[i:i+7], ' ') for i in range(1, len(t) - 6)] END) AS g
                          FROM t),
                    bench AS (SELECT DISTINCT g FROM g WHERE doc_id % 50 = 0)
               SELECT d.doc_id,
                      EXISTS (SELECT 1 FROM g x JOIN bench b ON b.g = x.g
                              WHERE x.doc_id = d.doc_id) AS contaminated
               FROM documents d
               WHERE d.doc_id % 50 <> 0"""))

  /** Per-document keyword extraction: the top-3 terms by tf·(N/df) — the
    * log-free monotone form of tf-idf, chosen deliberately: `ln()` is a
    * libm call whose last bit differs across engines and a 1-ulp score
    * difference can flip a ranking tie, while `(tf·N)/df` is ONE
    * correctly-rounded IEEE division of exact integers — bit-identical
    * everywhere, same ranking as the log form (ln is monotone). Ties
    * break by term ascending.
    *
    * 100 TB shape: tf is one (doc, term) shuffle, df one (term) shuffle
    * off tf's already-distinct rows, the corpus count rides a broadcast
    * 1-row cross join, and the top-3 is a per-doc sort of that DOCUMENT's
    * terms only — per-doc vocabulary is bounded by document length, not
    * corpus size, so the collect_list group never exceeds a few thousand
    * entries regardless of scale (a global ranking window would instead
    * sort the full corpus-wide term list).
    */
  val topTerms: CatalogEntry = CatalogEntry(
    "doc_top_terms",
    (s, d) => {
      val docs = documents(s, d)
      val tf = docs.select(col("doc_id"), explode(Text.normTokens(col("text"))).as("term"))
        .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
      val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
      val n = docs.agg(count(lit(1)).as("n_docs"))
      // tf·N in DECIMAL(38,0) (r16 envelope audit): the long product
      // would silently wrap past 2⁶³ in Spark while DuckDB raises — and
      // at fleet scale tf·n_docs crosses 2⁶³ while both factors are
      // ordinary longs. Exact decimal product → one double division;
      // bit-identical to the long form wherever the product fits 2⁵³
      // (every sf the oracle runs).
      val scored = tf.join(dfreq, Seq("term")).crossJoin(broadcast(n))
        .select(col("doc_id"), col("term"),
          round((col("tf").cast("decimal(38,0)") * col("n_docs")).cast("double")
            / col("df"), 6).as("score"))
      scored.groupBy("doc_id")
        .agg(slice(array_sort(collect_list(
          struct((-col("score")).as("ns"), col("term").as("t")))), 1, 3).as("top"))
        .select(col("doc_id"), posexplode(col("top")))
        .select(col("doc_id"), (col("pos") + 1).cast("long").as("term_rank"),
          col("col.t").as("term"), (-col("col.ns")).as("score"))
    },
    Some(s"""WITH toks AS (SELECT doc_id, unnest($normToksSql) AS term FROM documents),
                  tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2),
                  df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
                  n AS (SELECT count(*) AS n_docs FROM documents),
                  scored AS (SELECT doc_id, tf.term,
                                    ROUND((tf * n_docs) / df, 6) AS score
                             FROM tf JOIN df USING (term) CROSS JOIN n),
                  r AS (SELECT doc_id, term, score,
                               row_number() OVER (PARTITION BY doc_id
                                                  ORDER BY score DESC, term ASC) AS rk
                        FROM scored)
             SELECT doc_id, CAST(rk AS BIGINT) AS term_rank, term, score
             FROM r WHERE rk <= 3"""))

  /** Adjacent-token collocation mining: the 20 strongest bigram
    * associations by c(ab)² / (c(a)·c(b)) — the log-free monotone PMI
    * surrogate (counts CAST TO DOUBLE before multiplying, identically
    * in both engines, so there is no Int64 wrap anywhere — r16 envelope
    * audit: unlike the long-product forms this one degrades past 2⁵³
    * SYMMETRICALLY, both engines rounding the same product to the same
    * double; ln() would differ in the last ulp and can flip ranking
    * ties). Support floor c(ab) ≥ 5 kills hapax noise. Windowed at w = 1 deliberately: cost stays LINEAR in
    * corpus tokens (a document-level co-occurrence matrix is quadratic
    * in document length — not a 100 TB shape). Two token-keyed
    * aggregations + a global top-k (TakeOrdered, never a full sort).
    */
  val tokenCooccurrence: CatalogEntry = CatalogEntry(
    "token_cooccurrence",
    (s, d) => {
      val toks = documents(s, d).select(Text.normTokens(col("text")).as("t"))
      val pairs = toks.filter(size(col("t")) >= 2)
        .select(explode(Text.wordNgrams(col("t"), 2)).as("bg"))
        .select(split(col("bg"), " ").getItem(0).as("tok_a"),
          split(col("bg"), " ").getItem(1).as("tok_b"))
        .groupBy("tok_a", "tok_b").agg(count(lit(1)).as("c_ab"))
      val uni = toks.select(explode(col("t")).as("tok"))
        .groupBy("tok").agg(count(lit(1)).as("c"))
      pairs
        .join(uni.select(col("tok").as("tok_a"), col("c").as("c_a")), Seq("tok_a"))
        .join(uni.select(col("tok").as("tok_b"), col("c").as("c_b")), Seq("tok_b"))
        .filter(col("c_ab") >= 5)
        .select(col("tok_a"), col("tok_b"), col("c_ab"),
          round((col("c_ab").cast("double") * col("c_ab").cast("double")) /
            (col("c_a").cast("double") * col("c_b").cast("double")), 6).as("assoc"))
        .orderBy(col("assoc").desc, col("tok_a"), col("tok_b"))
        .limit(20)
    },
    Some(s"""WITH src AS (SELECT $normToksSql AS tl FROM documents),
                  bg AS (SELECT g[1] AS tok_a, g[2] AS tok_b, COUNT(*) AS c_ab
                         FROM (SELECT unnest([tl[i:i+1] for i in range(1, len(tl))]) AS g
                               FROM src WHERE len(tl) >= 2)
                         GROUP BY 1, 2),
                  uni AS (SELECT tok, COUNT(*) AS c
                          FROM (SELECT unnest(tl) AS tok FROM src) GROUP BY tok)
             SELECT bg.tok_a, bg.tok_b, bg.c_ab,
                    ROUND((CAST(c_ab AS DOUBLE) * CAST(c_ab AS DOUBLE)) /
                          (CAST(ua.c AS DOUBLE) * CAST(ub.c AS DOUBLE)), 6) AS assoc
             FROM bg JOIN uni ua ON ua.tok = bg.tok_a
                     JOIN uni ub ON ub.tok = bg.tok_b
             WHERE c_ab >= 5
             ORDER BY assoc DESC, tok_a, tok_b LIMIT 20"""))

  private val FluencyScale = 1000000L // integer-lattice probability scale

  /** Per-document fluency score under the corpus's own MLE bigram model —
    * the transcendental-free analog of perplexity-based quality filtering
    * (CCNet scores documents with a 5-gram KenLM; here the model is the
    * corpus bigram table and the score is the mean conditional
    * probability instead of its log, which ranks garbled text the same
    * way without an `ln()` whose last bit differs across engines). Each
    * bigram position contributes `floor(1e6·c(xy)/c(x·))` — one exact
    * integer division on exact counts — so the per-doc sum is a BIGINT,
    * partition-order-free, and the single closing division is one
    * correctly-rounded IEEE op in both engines. Docs with < 2 tokens
    * have no bigram evidence and are omitted (scoring them 0 would
    * conflate "unscorable" with "maximally disfluent").
    *
    * 100 TB shape: bigram counts are one (x,y)-keyed aggregation of the
    * token stream; the left marginal c(x·) is re-aggregated OFF the
    * count table (vocabulary²-bounded), never a second corpus pass; the
    * per-position score join keys on (x,y) against that same table —
    * corpus-linear work, and the marginal table is broadcastable at any
    * scale (vocabulary-bounded).
    */
  val bigramFluency: CatalogEntry = CatalogEntry(
    "doc_bigram_fluency",
    (s, d) => {
      val toks = documents(s, d)
        .select(col("doc_id"), Text.normTokens(col("text")).as("tl"))
      val bg = toks.filter(size(col("tl")) >= 2)
        .select(col("doc_id"), explode(Text.wordNgrams(col("tl"), 2)).as("bgs"))
        .select(col("doc_id"),
          split(col("bgs"), " ").getItem(0).as("x"),
          split(col("bgs"), " ").getItem(1).as("y"))
      val cxy = bg.groupBy("x", "y").agg(count(lit(1)).as("c_xy"))
      val cx = cxy.groupBy("x").agg(sum("c_xy").as("c_x"))
      bg.join(cxy, Seq("x", "y"))
        .join(cx, Seq("x"))
        // 10⁶·c_xy in DECIMAL(38,0) (r16 envelope audit): the long form
        // wraps past c_xy > 2⁶³/10⁶ ≈ 9·10¹² — a count a COMMON bigram
        // reaches on a 100 TB corpus — silently in Spark, loudly in
        // DuckDB. Exact decimal product, integral div (long result),
        // value-identical wherever the long form didn't wrap.
        .select(col("doc_id"),
          expr(s"(CAST(c_xy AS DECIMAL(38,0)) * $FluencyScale) DIV c_x").as("sc"))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_bigrams"), sum("sc").as("ssum"))
        .select(col("doc_id"), col("n_bigrams"),
          round(col("ssum").cast("double") /
            (col("n_bigrams") * FluencyScale).cast("double"), 6).as("fluency"))
        .orderBy("doc_id")
    },
    Some(s"""WITH src AS (SELECT doc_id, $normToksSql AS tl FROM documents),
                  bg AS (SELECT doc_id, g[1] AS x, g[2] AS y
                         FROM (SELECT doc_id,
                                 unnest([tl[i:i+1] for i in range(1, len(tl))]) AS g
                               FROM src WHERE len(tl) >= 2)),
                  cxy AS (SELECT x, y, COUNT(*) AS c_xy FROM bg GROUP BY 1, 2),
                  cx AS (SELECT x, CAST(SUM(c_xy) AS BIGINT) AS c_x FROM cxy GROUP BY 1),
                  sc AS (SELECT doc_id, (c_xy * $FluencyScale) // c_x AS sc
                         FROM bg JOIN cxy USING (x, y) JOIN cx USING (x))
             SELECT doc_id, COUNT(*) AS n_bigrams,
                    ROUND(CAST(SUM(sc) AS DOUBLE) /
                          CAST(COUNT(*) * $FluencyScale AS DOUBLE), 6) AS fluency
             FROM sc GROUP BY doc_id ORDER BY doc_id"""))

  // -------------------------------------------------------------------
  // Text analysis
  // -------------------------------------------------------------------

  /** Per-document quality statistics: token count, punctuation count,
    * stopword ratio, average token length, and a composite quality score —
    * the length/punct/stopword heuristics of a C4/Gopher-style quality
    * filter. Pure per-row projection: no shuffle at any scale.
    */
  val textStats: CatalogEntry = CatalogEntry(
    "doc_text_stats",
    (s, d) => documents(s, d).select(
      col("doc_id"),
      size(Text.wsTokens(col("text"))).cast("long").as("n_tokens"),
      length(col("text")).cast("long").as("n_chars_m"),
      expr("length(text) - length(regexp_replace(text, '[.,;:!?]', ''))")
        .cast("long").as("punct_cnt"),
      Text.tokensInSet(Text.wsTokens(col("text")), stopwords).cast("long").as("stop_cnt"))
      .withColumn("stop_ratio", round(col("stop_cnt") / col("n_tokens"), 6))
      .withColumn("avg_token_len",
        round((col("n_chars_m") - col("punct_cnt")) / col("n_tokens"), 6))
      .withColumn("quality_score", round(
        least(col("n_tokens") / lit(50.0), lit(1.0)) * 0.5 +
        col("stop_cnt") / col("n_tokens") * 0.3 +
        (lit(1.0) - col("punct_cnt") / col("n_chars_m")) * 0.2, 6)),
    Some(s"""SELECT doc_id,
             CAST(len($toksSql) AS BIGINT) AS n_tokens,
             CAST(length(text) AS BIGINT) AS n_chars_m,
             CAST(length(text) - length(regexp_replace(text, '[.,;:!?]', '', 'g')) AS BIGINT) AS punct_cnt,
             CAST(len(list_filter($toksSql, t -> t IN ($stopListSql))) AS BIGINT) AS stop_cnt,
             ROUND(stop_cnt / n_tokens, 6) AS stop_ratio,
             ROUND((n_chars_m - punct_cnt) / n_tokens, 6) AS avg_token_len,
             ROUND(LEAST(n_tokens / 50.0, 1.0) * 0.5
                   + stop_cnt / n_tokens * 0.3
                   + (1.0 - punct_cnt / n_chars_m) * 0.2, 6) AS quality_score
             FROM documents"""))

  /** Curriculum quality tiers: every document globally ranked by the
    * composite quality score (best first, doc_id tiebreak) and bucketed
    * into 10 equal-count tiers — the global ordering a curriculum-
    * learning schedule consumes. The rank comes from
    * [[graft.operators.GlobalRank]] (range partition + zipWithIndex: one
    * wide shuffle, no single-partition window); the tier then divides the
    * 0-based rank by the exact corpus count, which rides in as a
    * broadcast one-row scalar. At 100 TB the only wide exchange is the
    * range shuffle and its skew ceiling is one range bucket.
    */
  val qualityTiers: CatalogEntry = CatalogEntry(
    "doc_quality_tiers",
    (s, d) => {
      val scored = documents(s, d).select(
        col("doc_id"),
        size(Text.wsTokens(col("text"))).cast("long").as("n_tokens"),
        length(col("text")).cast("long").as("n_chars_m"),
        expr("length(text) - length(regexp_replace(text, '[.,;:!?]', ''))")
          .cast("long").as("punct_cnt"),
        Text.tokensInSet(Text.wsTokens(col("text")), stopwords).cast("long").as("stop_cnt"))
        .select(col("doc_id"),
          round(
            least(col("n_tokens") / lit(50.0), lit(1.0)) * 0.5 +
            col("stop_cnt") / col("n_tokens") * 0.3 +
            (lit(1.0) - col("punct_cnt") / col("n_chars_m")) * 0.2, 6).as("quality_score"))
      val ranked = graft.operators.GlobalRank.withRank(
        scored, Seq(col("quality_score").desc, col("doc_id").asc),
        numPartitions = graft.operators.GlobalRank.sessionPartitions(scored))
      // The total branch deliberately re-references `scored`, NOT a
      // cache: Catalyst prunes count(1) down to a zero-column parquet
      // scan (ReadSchema: struct<> — row-group metadata only), so the
      // regex scoring runs exactly once (r19 plan audit).
      ranked
        .crossJoin(broadcast(scored.agg(count(lit(1)).as("total"))))
        .select(col("doc_id"), col("quality_score"), col("rank"),
          expr("((rank - 1) * 10) div total").as("tier"))
    },
    Some(s"""WITH scored AS (
               SELECT doc_id,
                      ROUND(LEAST(len($toksSql) / 50.0, 1.0) * 0.5
                            + len(list_filter($toksSql, t -> t IN ($stopListSql))) / len($toksSql) * 0.3
                            + (1.0 - (length(text) - length(regexp_replace(text, '[.,;:!?]', '', 'g'))) / length(text)) * 0.2,
                            6) AS quality_score
               FROM documents)
             SELECT doc_id, quality_score,
                    CAST(ROW_NUMBER() OVER (ORDER BY quality_score DESC, doc_id) AS BIGINT) AS rank,
                    CAST(((ROW_NUMBER() OVER (ORDER BY quality_score DESC, doc_id) - 1) * 10)
                         // (COUNT(*) OVER ()) AS BIGINT) AS tier
             FROM scored"""))

  /** Quality × duplication contingency — the "is boilerplate also
    * low-quality?" diagnostic that decides whether dedup and quality
    * filtering are redundant or complementary on a corpus: per quality
    * decile (THE tier definition — [[qualityTiers]] composed verbatim,
    * oracle included), the share of docs that sit in at least one
    * ≥-threshold near-dup pair. If dup share concentrates in low tiers,
    * the quality gate already removes most boilerplate and dedup's
    * marginal value is small; a flat profile means both passes earn
    * their cost. The pair list is the LSH family's shared derivation
    * (NearDupCatalog.lshPairs — the decontaminate/clean-corpus
    * composition direction); the contingency aggregate is
    * 10-cell-bounded.
    */
  val qualityVsDup: CatalogEntry = CatalogEntry(
    "doc_quality_vs_dup",
    (s, d) => {
      val e = NearDupCatalog.lshPairs(s, d)
      val dupDocs = e.select(col("doc_a").as("doc_id"))
        .union(e.select(col("doc_b").as("doc_id"))).distinct()
        .withColumn("is_dup", lit(1L))
      qualityTiers.build(s, d).select(col("doc_id"), col("tier"))
        .join(dupDocs, Seq("doc_id"), "left")
        .groupBy("tier")
        .agg(count(lit(1)).as("n_docs"),
          sum(coalesce(col("is_dup"), lit(0L))).as("n_dup"))
        .select(col("tier"), col("n_docs"), col("n_dup"),
          round(col("n_dup").cast("double") / col("n_docs"), 6).as("dup_share"))
        .orderBy("tier")
    },
    Some(s"""WITH RECURSIVE ${NearDupCatalog.lshPairsCtesSql},
            dd AS (SELECT DISTINCT doc_id FROM (
                     SELECT doc_a AS doc_id FROM lsh_pairs
                     UNION ALL SELECT doc_b FROM lsh_pairs)),
            qt AS (${qualityTiers.oracle.get})
          SELECT qt.tier, CAST(COUNT(*) AS BIGINT) AS n_docs,
                 CAST(SUM(CASE WHEN dd.doc_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_dup,
                 ROUND(CAST(SUM(CASE WHEN dd.doc_id IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE)
                       / COUNT(*), 6) AS dup_share
          FROM qt LEFT JOIN dd ON dd.doc_id = qt.doc_id
          GROUP BY qt.tier ORDER BY qt.tier"""))

  private val FhDims = 16 // feature-hash slots

  /** Signed feature hashing (the hashing trick — Weinberger et al.
    * 2009): every document becomes a sparse [[FhDims]]-slot
    * bag-of-words vector with NO vocabulary dictionary — slot = the
    * token hash's first hex digit, sign = parity of its second, weight
    * = Σ signs over occurrences (the sign debiases collisions: colliding
    * tokens cancel in expectation instead of inflating the slot). This
    * is the classical-ML featurizer (logreg/linear-SVM on text) that
    * needs no fit step, no broadcast vocabulary, and survives schema
    * drift — the reason ad-click pipelines run it at exactly this
    * scale. Output is LONG-FORMAT SPARSE (zero slots dropped): the only
    * representation whose size tracks content, not dims × docs.
    *
    * Exactness: weights are signed INTEGER counts — one (doc, slot)
    * aggregate, order-free; slot/sign come from md5 hex digits via the
    * position-in-'0123456789abcdef' device (locate/strpos — argument
    * orders differ between engines, the position is the same). One
    * token explode + one uniform (doc_id, dim) shuffle.
    */
  val featureHash: CatalogEntry = CatalogEntry(
    "doc_feature_hash",
    (s, d) => documents(s, d)
      .select(col("doc_id"), explode(Text.normTokens(col("text"))).as("tok"))
      .filter(col("tok") =!= "")
      .select(col("doc_id"),
        expr("md5(concat('fh|', tok))").as("h"))
      .select(col("doc_id"),
        expr("locate(substring(h, 1, 1), '0123456789abcdef') - 1").cast("long").as("dim"),
        when(substring(col("h"), 2, 1).isin("0", "2", "4", "6", "8", "a", "c", "e"), 1L)
          .otherwise(-1L).as("sign"))
      .groupBy("doc_id", "dim")
      .agg(sum(col("sign")).as("weight"))
      .filter(col("weight") =!= 0)
      .orderBy("doc_id", "dim"),
    Some(s"""WITH toks AS (SELECT doc_id, md5('fh|' || tok) AS h
                           FROM (SELECT doc_id, unnest($normToksSql) AS tok
                                 FROM documents)
                           WHERE tok <> ''),
                  cells AS (SELECT doc_id,
                                   CAST(strpos('0123456789abcdef', substr(h, 1, 1)) - 1
                                        AS BIGINT) AS dim,
                                   CASE WHEN substr(h, 2, 1) IN ('0','2','4','6','8','a','c','e')
                                        THEN 1 ELSE -1 END AS sign
                            FROM toks)
             SELECT doc_id, dim, CAST(SUM(sign) AS BIGINT) AS weight
             FROM cells GROUP BY doc_id, dim
             HAVING SUM(sign) <> 0
             ORDER BY doc_id, dim"""))

  private[graft] val DsirBuckets = 1024

  /** The corpus as hashed-bigram bucket rows (doc_id, lang, b) — the
    * DSIR feature stream: bucket = first 8 md5 hex digits of
    * "ds|" + bigram, mod [[DsirBuckets]] (the engine-portable hex
    * device shared with the sketch family). */
  private[graft] def dsirGrams(docs: DataFrame): DataFrame = docs
    .select(col("doc_id"), col("lang"), Text.normTokens(col("text")).as("t"))
    .filter(size(col("t")) >= 2)
    .select(col("doc_id"), col("lang"),
      explode(Text.wordNgrams(col("t"), 2)).as("g"))
    .select(col("doc_id"), col("lang"),
      pmod(conv(substring(md5(concat(lit("ds|"), col("g"))), 1, 8), 16, 10)
        .cast("long"), lit(DsirBuckets.toLong)).as("b"))

  /** Both corpus-level bucket histograms in ONE aggregate: cr = raw
    * (whole-corpus) count, ct = target-subset count (lang = 'en'), per
    * bucket — ≤ [[DsirBuckets]] output rows regardless of corpus size. */
  private[graft] def dsirPerBucket(grams: DataFrame): DataFrame = grams
    .groupBy("b")
    .agg(count(lit(1)).as("cr"),
      sum(when(col("lang") === "en", 1L).otherwise(0L)).as("ct"))

  /** Bucket weights from the (b, cr, ct) histogram — pure integer
    * arithmetic end-to-end, shared by the batch entry and the
    * streamed-cells parity test so the model can never drift: with
    * ct' = ct+1, cr' = cr+1, T' = t_tot+B, R' = r_tot+B (add-one
    * smoothing), the signed ratio (p_t − p_r)/(p_t + p_r) equals
    * (ct'·R' − cr'·T') / (ct'·R' + cr'·T') EXACTLY in integers, and the
    * stored weight is sign(num) · (10⁴·|num|) div den — scaled-integer
    * truncation of a nonnegative quotient, identical in both engines,
    * zero float operations (the log-ratio's TV-style surrogate; same
    * substitution family as the PMI and BM25-idf surrogates in this
    * catalog, monotone in the posterior odds a bucket gives the
    * target). */
  /** Long-safe ceiling for [[dsirWeights]]' scaled-integer FAST path:
    * the final product 10⁴·|num| must fit a signed 64-bit long, and
    * |num| ≤ den, so den ≤ Long.MaxValue/10⁴ keeps every long
    * intermediate exact. Shared with DsirSpec's boundary property so
    * code and test can't drift. */
  private[graft] val DsirLongSafeDen: Long = Long.MaxValue / 10000L

  /** Decimal-safe ceiling for [[dsirWeights]]' WIDE path: the wide
    * branch computes 10⁴·|num| in DECIMAL(38,0), so |num| ≤ den must
    * stay under 10³⁴; held at 10³³ for a full decimal digit of margin.
    * den ≈ 2·G² for a corpus of G grams, so the wide path covers
    * G ≈ 2·10¹⁶ bigrams — tens of petabytes of text — before the final
    * guard trips. Shared with DsirSpec's wide-boundary fixture. */
  private[graft] val DsirDecSafeDen: BigInt = BigInt(10).pow(33)

  private[graft] def dsirWeights(perBucket: DataFrame): DataFrame = {
    val b = lit(DsirBuckets.toLong)
    val dec38 = "decimal(38,0)"
    val tot = perBucket.agg(sum("cr").as("r_tot"), sum("ct").as("t_tot"))
    perBucket.crossJoin(broadcast(tot))
      // Both products in DECIMAL(38,0) from the start: each is
      // ≤ (2⁶³)² ≈ 8.5·10³⁷ < 10³⁸, so num/den below are EXACT for any
      // long-typed histogram — the boundary predicate can never be fed
      // a wrapped operand (the r15 advice hazard: a den past 2⁶⁴ could
      // wrap back into the legal long range and silently flip weights).
      .select(col("b"),
        ((col("ct") + 1L).cast(dec38) * (col("r_tot") + b).cast(dec38)).as("tp"),
        ((col("cr") + 1L).cast(dec38) * (col("t_tot") + b).cast(dec38)).as("rp"))
      .select(col("b"), (col("tp") - col("rp")).as("num"),
        (col("tp") + col("rp")).as("den"))
      .select(col("b"),
        // Three-way dispatch on the EXACT den, per row (CaseWhen
        // evaluates only the matched branch):
        //   den ≤ 2⁶³/10⁴ — long fast path: the decimals cast down
        //     exactly and the division is codegen-primitive (every
        //     test sf and any single-node corpus lands here);
        //   den ≤ 10³³  — wide path: the same scaled-integer
        //     truncation carried out in DECIMAL(38,0), bit-identical
        //     semantics, exact to tens-of-PB corpora (auto-selected:
        //     the operator DEGRADES to exact-decimal, not an error);
        //   beyond — fail loudly as part of the RESULT expression (a
        //     detached assert column would be pruned); weights must
        //     never come from a rounded or overflowed quotient.
        when(col("den") <= lit(DsirLongSafeDen),
          when(col("num") < 0, -1L).otherwise(1L) *
            expr("(10000 * cast(abs(num) as bigint)) div cast(den as bigint)"))
        .when(col("den") <= lit(new java.math.BigDecimal(DsirDecSafeDen.bigInteger)),
          when(col("num") < 0, -1L).otherwise(1L) *
            expr(s"(cast(10000 as $dec38) * abs(num)) div den"))
        .otherwise(raise_error(concat(
          lit(s"dsirWeights: den exceeds the decimal-safe boundary $DsirDecSafeDen " +
            "(10^4*|num| would overflow DECIMAL(38,0)); den="),
          col("den").cast("string"))).cast("long")).as("w"))
  }

  /** DSIR-style importance weights (Xie et al. 2023, "Data Selection
    * for Language Models via Importance Resampling"): every document
    * scored by how much more its hashed-bigram profile looks like a
    * TARGET distribution (here the lang = 'en' slice — the quality
    * proxy) than like the raw corpus — the weight that importance
    * resampling then samples by ([[TrainPrepCatalog]]'s A-ES weighted
    * sampler is the companion consumer). Bigrams hash into
    * [[DsirBuckets]] buckets (the hashing trick, as
    * [[featureHash]]), so the MODEL is two 1024-bin histograms —
    * broadcast-small forever — and the per-bucket log-ratio is replaced
    * by the exact-integer TV-style surrogate in [[dsirWeights]] (zero
    * libm, zero float-order exposure; monotone per bucket in the
    * log-ratio it stands in for).
    *
    * 100 TB shape: one token explode; ONE ≤1024-row corpus aggregate
    * for both histograms (map-combined — the model build is a free
    * rider on a scan); per-doc (doc, bucket) cells join the weight
    * table BROADCAST; one per-doc sum. Nothing quadratic, nothing
    * driver-side; histogram cells are linear and mergeable, so the
    * model also maintains live as streamed keyed state
    * (StreamingQueries.streamingDsirCells — StreamingSpec pins the
    * drained weight table bit-for-bit). At true 100 TB counts the
    * integer products approach 2⁶³ (10⁴·|num| ≤ 10⁴·den): past
    * [[DsirLongSafeDen]] the per-row dispatch in [[dsirWeights]]
    * AUTO-SELECTS the DECIMAL(38,0) wide path — same scaled-integer
    * truncation, exact to [[DsirDecSafeDen]] (tens-of-PB corpora) —
    * and only beyond THAT fails loudly in-plan. The boundary predicate
    * reads den computed exactly in decimal, so no wrapped long can
    * ever steer the dispatch. DsirSpec's boundary property drives
    * synthetic histograms to within 1e-6 of the long envelope and pins
    * BOTH branches BigInt-exact on their sides of it. Longs keep the
    * hot path codegen-primitive at every test sf.
    *
    * Determinism: weights and scores are BIGINT sums of BIGINT terms —
    * order-free; the one closing double division per doc (score /
    * (n_grams·10⁴)) is correctly rounded from identical operands in
    * both engines.
    */
  /** Per-doc scoring against a weight table — factored so PlanSpec can
    * pin the interior plan (the entry's own result is checkpoint-
    * truncated): (doc, bucket) cells, BROADCAST weight join, one
    * per-doc sum. The raw form (no presentation round/sort) also feeds
    * the resampling entry, which must not pay a corpus sort before its
    * bounded-heap reservoir. */
  private[graft] def dsirScoreRaw(grams: DataFrame, w: DataFrame): DataFrame =
    grams.groupBy("doc_id", "b").agg(count(lit(1)).as("c"))
      .join(broadcast(w), Seq("b"))
      .groupBy("doc_id")
      .agg(sum("c").as("n_grams"), sum(col("c") * col("w")).as("dsir_scaled"))

  private[graft] def dsirScore(grams: DataFrame, w: DataFrame): DataFrame =
    dsirScoreRaw(grams, w)
      .select(col("doc_id"), col("n_grams"), col("dsir_scaled"),
        round(col("dsir_scaled").cast("double") /
          (col("n_grams") * lit(10000.0)), 6).as("dsir_per_gram"))
      .orderBy("doc_id")

  /** First-8-hex-digits-to-int in DuckDB SQL (the engine-portable hex
    * device) — shared by the two DSIR oracles. */
  private def dsirHex2IntSql(h: String): String =
    (1 to 8).map(j =>
      s"(strpos('0123456789abcdef', substr($h, $j, 1)) - 1) * ${math.pow(16, 8 - j).toLong}")
      .mkString("(", " + ", ")")

  /** The DSIR model + per-doc score as DuckDB CTEs (src → grams →
    * histograms → integer weights → per-doc cells → score) — ONE text
    * shared by `doc_dsir_weights` and `doc_dsir_resample` so the two
    * oracles can never drift. */
  private def dsirOracleCtes: String =
    s"""src AS (SELECT doc_id, lang, $normToksSql AS tl FROM documents),
        grams AS (SELECT doc_id, lang,
                         ${dsirHex2IntSql("md5('ds|' || g[1] || ' ' || g[2])")} % $DsirBuckets AS b
                  FROM (SELECT doc_id, lang,
                               unnest([tl[i:i+1] for i in range(1, len(tl))]) AS g
                        FROM src WHERE len(tl) >= 2)),
        cnts AS (SELECT b, CAST(COUNT(*) AS BIGINT) AS cr,
                        CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS ct
                 FROM grams GROUP BY b),
        tot AS (SELECT CAST(SUM(cr) AS BIGINT) AS r_tot,
                       CAST(SUM(ct) AS BIGINT) AS t_tot FROM cnts),
        nd AS (SELECT b,
                      (ct + 1) * (r_tot + $DsirBuckets) - (cr + 1) * (t_tot + $DsirBuckets) AS num,
                      (ct + 1) * (r_tot + $DsirBuckets) + (cr + 1) * (t_tot + $DsirBuckets) AS den
               FROM cnts CROSS JOIN tot),
        w AS (SELECT b, (CASE WHEN num < 0 THEN -1 ELSE 1 END)
                        * ((10000 * ABS(num)) // den) AS w FROM nd),
        cells AS (SELECT doc_id, b, CAST(COUNT(*) AS BIGINT) AS c
                  FROM grams GROUP BY 1, 2),
        score AS (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_grams,
                         CAST(SUM(c * w) AS BIGINT) AS dsir_scaled
                  FROM cells JOIN w USING (b) GROUP BY doc_id)"""

  val dsirWeightsEntry: CatalogEntry = CatalogEntry(
    "doc_dsir_weights",
    (s, d) => {
      val grams = dsirGrams(documents(s, d)).cacheOnce()
      val out = dsirScore(grams, dsirWeights(dsirPerBucket(grams)))
        .localCheckpoint()
      grams.unpersist(blocking = false)
      out
    },
    Some(
      s"""WITH $dsirOracleCtes
          SELECT doc_id, n_grams, dsir_scaled,
                 ROUND(CAST(dsir_scaled AS DOUBLE) / (n_grams * 10000.0), 6) AS dsir_per_gram
          FROM score ORDER BY doc_id"""))

  /** Resample size for `doc_dsir_resample`. */
  private[graft] val DsirSampleK = 25

  /** A-ES sampling key over the per-doc DSIR scores: the positive
    * integer sampling weight is the truncated per-gram scaled weight
    * shifted into [1, 2·10⁴+1] — wgt = 10001 + sign(s)·(|s| div n) with
    * the abs-then-divide form so truncation is engine-identical (the
    * nonnegative-quotient device of [[dsirWeights]]) — and the key is
    * Efraimidis–Spirakis ln(u)/wgt with u the doc's deterministic md5
    * uniform ([[TrainPrepCatalog]]'s `wsample` contract, "dsirs|" salt).
    * Monotone: a more target-like document gets a larger wgt, hence a
    * higher inclusion probability. */
  private[graft] def dsirSampleKeyed(scored: DataFrame): DataFrame = {
    val h = conv(substring(md5(concat(lit("dsirs|"), col("doc_id").cast("string"))),
      1, 8), 16, 10).cast("long")
    scored.select(col("doc_id"),
        (lit(10001L) + when(col("dsir_scaled") < 0L, -1L).otherwise(1L) *
          expr("abs(dsir_scaled) div n_grams")).as("wgt"))
      .select(col("doc_id"),
        (log((h + 1) / lit(4294967296.0)) / col("wgt")).as("k"))
  }

  /** Global bounded-heap top-K over an A-ES keyed frame: ≤ K (key, doc)
    * candidates per map partition, ONE ≤ K-entry final merge — the same
    * reservoir plan as [[TrainPrepCatalog.weightedTopK]] without the
    * per-source grouping (DSIR selects a training subset globally). */
  private[graft] def dsirTopK(keyed: DataFrame): DataFrame = {
    val topn = udaf(new graft.combine.TopNAgg(DsirSampleK))
    keyed.agg(topn(col("k"), col("doc_id")).as("top"))
      .select(posexplode(col("top.entries")))
      .select(col("col.event_id").as("doc_id"),
        (col("pos") + 1).cast("long").as("rn"))
  }

  /** DSIR importance RESAMPLING — the pipeline step the weights exist
    * for (Xie et al. 2023 §2: select the training subset by sampling
    * proportionally to the importance weights): compose the hashed-
    * bigram model ([[dsirWeights]]) with the A-ES weighted reservoir
    * ([[TrainPrepCatalog.weightedTopK]]'s machinery) to draw the
    * [[DsirSampleK]] docs, without replacement, with inclusion
    * probability monotone in the DSIR score.
    *
    * 100 TB shape: everything up to the per-doc score is
    * `doc_dsir_weights`' plan (one token explode, ≤1024-row broadcast
    * model, per-doc sum); the selection adds ONE bounded-heap global
    * aggregate (ObjectHashAggregate — ≤ K candidates per partition, one
    * ≤ K merge) — no corpus sort, no window, no second scan. The
    * reservoir is the aggregation buffer, so the selection stage also
    * runs unchanged as a complete-mode streaming query (StreamingSpec
    * pins the replay bit-for-bit).
    *
    * Cross-engine floats: u is exact-integer-derived and correctly
    * rounded identically; ln() may differ by 1 ulp cross-libm, so rank
    * boundaries could in principle flutter if two keys sat within ~2
    * ulp. Measured at sf0.01 and sf0.1: the smallest adjacent-key gap
    * across the top-(K+1) is ≥ 2e-3 relative — eleven orders of
    * magnitude of margin (same device as the `doc_weighted_sample`
    * adjudication).
    */
  val dsirResample: CatalogEntry = CatalogEntry(
    "doc_dsir_resample",
    (s, d) => {
      val grams = dsirGrams(documents(s, d)).cacheOnce()
      val out = dsirTopK(dsirSampleKeyed(
          dsirScoreRaw(grams, dsirWeights(dsirPerBucket(grams)))))
        .localCheckpoint()
      grams.unpersist(blocking = false)
      out
    },
    Some(
      s"""WITH $dsirOracleCtes,
            wg AS (SELECT doc_id,
                          10001 + (CASE WHEN dsir_scaled < 0 THEN -1 ELSE 1 END)
                                  * (ABS(dsir_scaled) // n_grams) AS wgt
                   FROM score),
            keyed AS (SELECT doc_id,
                             ln((${dsirHex2IntSql("md5('dsirs|' || CAST(doc_id AS VARCHAR))")} + 1)
                                / 4294967296.0) / wgt AS k
                      FROM wg)
          SELECT doc_id, CAST(rn AS BIGINT) AS rn FROM (
            SELECT doc_id, row_number() OVER (ORDER BY k DESC, doc_id) AS rn
            FROM keyed)
          WHERE rn <= $DsirSampleK"""))

  /** Token counting two ways: whitespace tokens and a BPE-ish regex
    * pre-tokenization (letter runs | digit runs | single other-symbol
    * runs — the GPT-2-style split shape). Per-row, no shuffle.
    */
  val tokenCount: CatalogEntry = CatalogEntry(
    "doc_token_count",
    (s, d) => documents(s, d).select(
      col("doc_id"),
      size(Text.wsTokens(col("text"))).cast("long").as("ws_tokens"),
      Text.bpeTokenCount(col("text")).cast("long").as("bpe_tokens")),
    Some(raw"""SELECT doc_id,
             CAST(len($toksSql) AS BIGINT) AS ws_tokens,
             CAST(len(regexp_extract_all(text, '\p{L}+|\p{N}+|[^\s\p{L}\p{N}]+')) AS BIGINT) AS bpe_tokens
             FROM documents"""))

  // -------------------------------------------------------------------
  // Language identification (stopword-profile heuristic)
  // -------------------------------------------------------------------

  private val langProfiles: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "and", "of", "to", "in", "is"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein"),
    "es" -> Seq("el", "la", "los", "que", "y", "es", "una"),
    "fr" -> Seq("le", "les", "et", "est", "une", "dans", "pour"))

  /** Adds `pred_lang` + `best_score` (and the per-language scores) to a
    * documents frame — the ONE scoring/argmax definition shared by
    * [[langId]] and [[langIdConfusion]], so the confusion matrix cannot
    * drift from the classifier it claims to audit.
    */
  private def withLangPred(df: DataFrame): DataFrame = {
    val scored = langProfiles.foldLeft(df) { case (acc, (lang, words)) =>
      acc.withColumn(s"score_$lang",
        Text.tokensInSet(Text.normTokens(col("text")), words).cast("long"))
    }
    val best = langProfiles.map(p => col(s"score_${p._1}")).reduce(greatest(_, _))
    val pred = langProfiles.foldRight(lit("und")) { case ((lang, _), els) =>
      when(col(s"score_$lang") === col("best_score") && col("best_score") > 0, lit(lang)).otherwise(els)
    }
    scored.withColumn("best_score", best).withColumn("pred_lang", pred)
  }

  /** Oracle mirror of [[withLangPred]]: doc_id, declared lang, pred_lang,
    * best_score over `documents`. Shared by both oracles.
    */
  private val langPredSql: String = {
    val scoreSelects = langProfiles.map { case (lang, words) =>
      val list = words.map(w => s"'$w'").mkString(", ")
      raw"CAST(len(list_filter(string_split_regex(lower(trim(text)), '\s+'), t -> t IN ($list))) AS BIGINT) AS score_$lang"
    }
    val bestExpr = langProfiles.map(p => s"score_${p._1}").reduce((a, b) => s"GREATEST($a, $b)")
    val predExpr = langProfiles.foldRight("'und'") { case ((lang, _), els) =>
      s"CASE WHEN score_$lang = best_score AND best_score > 0 THEN '$lang' ELSE $els END"
    }
    s"""SELECT doc_id, lang, $predExpr AS pred_lang, best_score FROM (
          SELECT *, $bestExpr AS best_score FROM (
            SELECT doc_id, lang, text,
           ${scoreSelects.mkString(",\n           ")}
            FROM documents))"""
  }

  /** Language ID via per-language stopword hit counts; argmax with a fixed
    * priority tie-break (profile order). Per-row projection. Documents
    * with no hits in any profile are labeled 'und'.
    */
  val langId: CatalogEntry = CatalogEntry(
    "doc_lang_id",
    (s, d) => withLangPred(documents(s, d))
      .select(col("doc_id"), col("pred_lang"), col("best_score")),
    Some(s"SELECT doc_id, pred_lang, best_score FROM ($langPredSql)"))

  /** Language-ID confusion matrix: the detector's predictions cross-
    * tabulated against the corpus's DECLARED lang column, with each
    * cell's share of its declared-language row — the per-language
    * precision/recall picture that says whether a lang filter is about
    * to throw away the wrong documents (the detector audit every
    * multilingual pipeline runs before filtering on predictions).
    *
    * Scale: scoring is the same per-row projection as [[langId]] —
    * declared lang rides the SAME scan (no join back on doc_id, which
    * would shuffle the corpus twice); both aggregates are bounded by
    * langs × (langs+1) cells, and the row-total rides a broadcast join.
    */
  val langIdConfusion: CatalogEntry = CatalogEntry(
    "lang_id_confusion",
    (s, d) => {
      // The cell frame feeds BOTH the row totals and the final join; left
      // lazy, each branch would re-run the scoring scan over the corpus
      // (Spark does not CTE-share DataFrame subtrees). localCheckpoint
      // materializes the langs×(langs+1) cells once — the knnRecall
      // device.
      val per = withLangPred(documents(s, d))
        .groupBy("lang", "pred_lang").agg(count(lit(1)).as("n_docs"))
        .localCheckpoint(eager = true)
      val tot = per.groupBy("lang").agg(sum("n_docs").cast("long").as("n_lang"))
      per.join(broadcast(tot), Seq("lang"))
        .select(col("lang"), col("pred_lang"), col("n_docs"),
          round(col("n_docs").cast("double") / col("n_lang"), 6).as("share"))
        .orderBy("lang", "pred_lang")
    },
    Some(s"""WITH p AS ($langPredSql),
                  per AS (SELECT lang, pred_lang, COUNT(*) AS n_docs
                          FROM p GROUP BY 1, 2),
                  tot AS (SELECT lang, CAST(SUM(n_docs) AS BIGINT) AS n_lang
                          FROM per GROUP BY lang)
             SELECT per.lang AS lang, pred_lang, n_docs,
                    ROUND(CAST(n_docs AS DOUBLE) / n_lang, 6) AS share
             FROM per JOIN tot ON tot.lang = per.lang
             ORDER BY per.lang, pred_lang"""))

  /** First-seen n-gram novelty per document — the marginal-diversity
    * signal a curation order exposes (the complement of the repetition /
    * dup family: not "how much of this doc exists elsewhere" but "how
    * much did THIS doc add when it arrived"). Grams are the house
    * 3-token shingles; a gram's owner is the minimum doc_id containing
    * it (doc_id = arrival order in this corpus), and a doc's novelty is
    * the fraction of its distinct grams it owns. Near-1 docs are fresh
    * content; near-0 docs arrived after their content already existed —
    * the keep-order-aware variant of a dup score, and the statistic
    * behind "diminishing data returns" curves over a crawl.
    *
    * Scale shape: one gram-keyed shuffle for the MIN owner (map-side
    * combined), one gram-keyed join back (fan-out = gram df, linear in
    * the index — never df²), one doc-keyed aggregate. The gram index is
    * cached once for its two consumers and released after the
    * checkpoint.
    */
  val docNovelty: CatalogEntry = CatalogEntry(
    "doc_novelty",
    (s, d) => {
      val g = documents(s, d)
        .select(col("doc_id"), explode(Text.shingles(col("text"), 3)).as("sh"))
        .cacheOnce()
      val first = g.groupBy("sh").agg(min("doc_id").as("first_doc"))
      val out = g.join(first, Seq("sh"))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_grams"),
          sum(when(col("first_doc") === col("doc_id"), 1L).otherwise(0L)).as("n_novel"))
        .select(col("doc_id"), col("n_grams"), col("n_novel"),
          round(col("n_novel") / col("n_grams"), 6).as("novelty"))
        .orderBy("doc_id")
        .localCheckpoint()
      g.unpersist(blocking = false)
      out
    },
    Some(
      raw"""WITH sh AS (SELECT DISTINCT doc_id, sh FROM (
              SELECT doc_id, unnest(CASE WHEN len(t) < 3 THEN [array_to_string(t, ' ')]
                ELSE [array_to_string(t[i:i+2], ' ') for i in range(1, len(t)-1)] END) AS sh
              FROM (SELECT doc_id, string_split_regex(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS t
                    FROM documents))),
            f AS (SELECT sh, MIN(doc_id) AS first_doc FROM sh GROUP BY sh)
          SELECT s.doc_id, CAST(COUNT(*) AS BIGINT) AS n_grams,
                 CAST(SUM(CASE WHEN f.first_doc = s.doc_id THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_novel,
                 ROUND(CAST(SUM(CASE WHEN f.first_doc = s.doc_id THEN 1 ELSE 0 END) AS DOUBLE)
                       / COUNT(*), 6) AS novelty
          FROM sh s JOIN f USING (sh)
          GROUP BY s.doc_id ORDER BY s.doc_id"""))

  /** The per-document metadata sidecar a curated corpus release ships
    * next to the text (the document-level companion of
    * `pipeline_dataset_card`'s source-level datasheet): declared and
    * DETECTED language, token volume, quality score + decile, exact-dup
    * flag, and the split assignment — every column produced by the
    * catalog's own operator composed verbatim (oracles included), so
    * the manifest can never disagree with the operators a consumer
    * would run. Downstream filters read THIS frame instead of
    * re-deriving per notebook — the corpus-side feature store.
    *
    * Shape: four doc_id-keyed hash joins plus one content-hash join
    * over per-row projections; at fleet scale the per-row columns ride
    * ONE scan (the withLangPred fusion pattern) and only the dup flag
    * keeps its hash-keyed shuffle — the joins here are the composition
    * honesty trade the quality-report entry documents.
    */
  val docManifest: CatalogEntry = CatalogEntry(
    "pipeline_doc_manifest",
    (s, d) => {
      val base = documents(s, d).select(col("doc_id"), col("source"), col("lang"),
        size(Text.normTokens(col("text"))).cast("long").as("n_tokens"),
        Text.contentHash(col("text")).as("content_hash"))
      val lid = langId.build(s, d).select(col("doc_id"), col("pred_lang"))
      val qt = qualityTiers.build(s, d)
        .select(col("doc_id"), col("quality_score"), col("tier"))
      val dup = exactDedup.build(s, d).select("content_hash", "canonical_id")
      val split = TrainPrepCatalog.splitAssign.build(s, d)
      base.join(lid, Seq("doc_id")).join(qt, Seq("doc_id"))
        .join(split, Seq("doc_id")).join(dup, Seq("content_hash"))
        .select(col("doc_id"), col("source"), col("lang"), col("pred_lang"),
          col("n_tokens"), col("quality_score"), col("tier"),
          (col("doc_id") =!= col("canonical_id")).as("is_exact_dup"), col("split"))
        .orderBy("doc_id")
    },
    Some(s"""WITH lid AS ($langPredSql),
                  qt AS (${qualityTiers.oracle.get}),
                  dup AS (${exactDedup.oracle.get}),
                  sp AS (${TrainPrepCatalog.splitAssign.oracle.get}),
                  base AS (SELECT doc_id, source, lang,
                                  CAST(len($normToksSql) AS BIGINT) AS n_tokens,
                                  md5($normSql) AS content_hash
                           FROM documents)
             SELECT b.doc_id, b.source, b.lang, lid.pred_lang, b.n_tokens,
                    qt.quality_score, qt.tier,
                    b.doc_id <> dup.canonical_id AS is_exact_dup, sp.split
             FROM base b
             JOIN lid ON lid.doc_id = b.doc_id
             JOIN qt ON qt.doc_id = b.doc_id
             JOIN sp ON sp.doc_id = b.doc_id
             JOIN dup ON dup.content_hash = b.content_hash
             ORDER BY b.doc_id"""))

  // -------------------------------------------------------------------
  // Document fingerprinting
  // -------------------------------------------------------------------

  /** Two content fingerprints per document: a set fingerprint (md5 of the
    * sorted distinct token set — order-insensitive) and a rolling
    * polynomial hash over characters (order-sensitive, mod 1e9+7). Both
    * per-row, exact, engine-portable.
    */
  val fingerprint: CatalogEntry = CatalogEntry(
    "doc_fingerprint",
    (s, d) => documents(s, d).select(
      col("doc_id"),
      Text.setFingerprint(col("text")).as("set_fp"),
      Text.rollingHash(col("text")).as("roll_fp")),
    Some(raw"""SELECT doc_id,
             md5(array_to_string(list_sort(list_distinct(string_split_regex(lower(trim(text)), '\s+'))), ' ')) AS set_fp,
             list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform(string_split(lower(trim(text)), ''), c -> CAST(ascii(c) AS BIGINT))), (acc, c) -> (acc * 31 + c) % 1000000007) AS roll_fp
             FROM documents"""))

  /** Per-source boilerplate profile over an arbitrary documents frame —
    * the [[boilerplateNgrams]] body, seamed out so the spec can inject a
    * corpus with KNOWN boilerplate (the driver corpus is word salad;
    * real templates are what the operator exists for).
    */
  /** The (source, shingle) document-frequency counts — the ONE
    * corpus-touching stage of [[boilerplateNgrams]]. Linear, mergeable
    * keyed state (each doc contributes ≤ 1 per shingle via the per-row
    * array_distinct), so it also maintains live as a complete-mode
    * streaming aggregate; StreamingSpec drains it together with
    * [[boilerplateSrcDocs]] and replays the profile bit-for-bit.
    */
  private[graft] def boilerplateCounts(docs: DataFrame): DataFrame = docs
    .select(col("source"), explode(Text.shingles(col("text"), 3)).as("sh"))
    .groupBy("source", "sh")
    .agg(count(lit(1)).as("df"))

  /** Docs-per-source companion state of [[boilerplateCounts]]. */
  private[graft] def boilerplateSrcDocs(docs: DataFrame): DataFrame =
    docs.groupBy("source").agg(count(lit(1)).as("docs"))

  /** The corpus-independent profile stage over drained/materialized
    * (source, sh, df) + (source, docs) frames.
    */
  private[graft] def boilerplateProfile(df: DataFrame, perSrc: DataFrame): DataFrame =
    df.join(broadcast(perSrc), "source")
      .withColumn("boiler", col("df") >= 3L && col("df") * 20L >= col("docs"))
      .groupBy("source", "docs")
      .agg(count(lit(1)).as("n_shingles"),
        sum(when(col("boiler"), 1L).otherwise(0L)).as("n_boiler"),
        max(when(col("boiler"), col("df"))).as("max_boiler_df"),
        sum(when(col("boiler"), col("df")).otherwise(0L)).as("boiler_hits"))
      .select(col("source"), col("docs"), col("n_shingles"), col("n_boiler"),
        col("max_boiler_df"), col("boiler_hits"),
        round(col("n_boiler").cast("double") / col("n_shingles"), 6).as("boiler_share"))
      .orderBy("source")

  /** Full batch composition (counts + docs → profile) over an arbitrary
    * documents frame — the entry body, seamed for the synthetic spec.
    */
  private[graft] def boilerplateFrom(docs: DataFrame): DataFrame =
    boilerplateProfile(boilerplateCounts(docs), boilerplateSrcDocs(docs))

  /** Cross-document boilerplate detection per source — the C4/CCNet
    * cleaning step this catalog's WITHIN-doc [[repetition]] and
    * PAIRWISE [[NearDupCatalog]] families cannot express: a navigation
    * header, cookie banner, or license footer is a shingle that recurs
    * across MANY documents of one source while each document and each
    * pair look individually fine (Raffel et al. 2020 §2.2 drop
    * boilerplate lines; Wenzek et al. 2019 dedup at paragraph level for
    * exactly this reason). A trigram shingle is boilerplate in its
    * source when it appears in ≥ 3 documents AND ≥ 5% of them (both
    * thresholds integer compares — 20·df ≥ docs, no float policy); the
    * per-source profile reports how much template mass a cleaning pass
    * would strip.
    *
    * 100 TB shape: NO pair join anywhere — this is a document-frequency
    * profile, not a similarity search. One corpus pass explodes the
    * per-doc DISTINCT shingle arrays (array_distinct per row, so the
    * (source, shingle) aggregate is map-combined doc-frequency
    * counting); the per-source doc counts are a sources-sized broadcast;
    * the rollup is sources-sized. Skewed sources shard like any hash
    * aggregate. The flagged-shingle set (not emitted here) is the
    * sources-sized broadcast a production strip pass would apply
    * per-row, the [[decontaminate]] topology.
    */
  val boilerplateNgrams: CatalogEntry = CatalogEntry(
    "doc_boilerplate_ngrams",
    (s, d) => boilerplateFrom(documents(s, d)),
    Some(
      raw"""WITH t AS (SELECT doc_id, source,
                              string_split_regex(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS t
                       FROM documents),
            sh AS (SELECT DISTINCT doc_id, source, sh FROM (
                     SELECT doc_id, source,
                            unnest(CASE WHEN len(t) < 3 THEN [array_to_string(t, ' ')]
                                        ELSE [array_to_string(t[i:i+2], ' ') for i in range(1, len(t)-1)] END) AS sh
                     FROM t)),
            df AS (SELECT source, sh, CAST(COUNT(*) AS BIGINT) AS df
                   FROM sh GROUP BY 1, 2),
            docs AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS docs
                     FROM documents GROUP BY 1)
            SELECT d.source, docs, COUNT(*) AS n_shingles,
                   CAST(SUM(CASE WHEN df >= 3 AND df * 20 >= docs THEN 1 ELSE 0 END) AS BIGINT) AS n_boiler,
                   MAX(CASE WHEN df >= 3 AND df * 20 >= docs THEN df END) AS max_boiler_df,
                   CAST(SUM(CASE WHEN df >= 3 AND df * 20 >= docs THEN df ELSE 0 END) AS BIGINT) AS boiler_hits,
                   ROUND(CAST(SUM(CASE WHEN df >= 3 AND df * 20 >= docs THEN 1 ELSE 0 END) AS DOUBLE)
                         / COUNT(*), 6) AS boiler_share
            FROM df d JOIN docs USING (source)
            GROUP BY d.source, docs ORDER BY d.source"""))

  /** Sessionization (gaps-and-islands): per-user sessions split on >30 min
    * idle gaps, reported as session count + largest session. Windows
    * partition by user_id — the per-key ordering a cluster performs as a
    * single shuffle + in-partition sort; no global sort anywhere.
    * (Streaming counterpart: `session_window` with a watermark.)
    */
  val userSessions: CatalogEntry = CatalogEntry(
    "user_sessions",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("user_id").orderBy("tss", "event_id")
      val gapS = 1800L
      Tables.events(s, d)
        .select(col("user_id"), col("event_id"), unix_timestamp(col("ts")).as("tss"))
        .withColumn("new_s",
          when(lag("tss", 1).over(w).isNull ||
            col("tss") - lag("tss", 1).over(w) > gapS, 1L).otherwise(0L))
        .withColumn("sid", sum("new_s").over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy(col("user_id"), col("sid"))
        .agg(count(lit(1)).as("n"))
        .groupBy(col("user_id").as("driver_id"))
        .agg(count(lit(1)).as("n_sessions"), max("n").as("max_session_events"))
    },
    Some("""WITH base AS (
              -- FLOOR before the cast: DuckDB CAST(double AS BIGINT) rounds
              -- half-away-from-zero while Spark's unix_timestamp truncates;
              -- sub-second fractions >= .5s would shift tss by 1s and can flip
              -- session splits at the 1800s boundary.
              SELECT user_id, event_id, CAST(FLOOR(epoch(ts)) AS BIGINT) AS tss FROM events),
            flags AS (
              SELECT user_id, event_id, tss,
                     CASE WHEN lag(tss) OVER w IS NULL OR tss - lag(tss) OVER w > 1800
                          THEN 1 ELSE 0 END AS new_s
              FROM base WINDOW w AS (PARTITION BY user_id ORDER BY tss, event_id)),
            sess AS (
              SELECT user_id,
                     SUM(new_s) OVER (PARTITION BY user_id ORDER BY tss, event_id
                                      ROWS UNBOUNDED PRECEDING) AS sid
              FROM flags),
            per AS (SELECT user_id, sid, count(*) AS n FROM sess GROUP BY 1, 2)
          SELECT user_id AS driver_id, COUNT(*) AS n_sessions, MAX(n) AS max_session_events
          FROM per GROUP BY user_id"""))

  /** Idle-gap thresholds swept by [[sessionGapSweep]], seconds. */
  private[graft] val SessionGapsS: Seq[Long] = Seq(300L, 900L, 1800L, 3600L)

  /** The sessionization gap knob measured in-catalog — the
    * [[userSessions]] 30-minute threshold is a convention, not a law,
    * and picking it blind is how pipelines ship sessions that are
    * really visits (gap too wide) or visits shredded into clicks (gap
    * too narrow). One sweep row per gap in [[SessionGapsS]]: total
    * sessions, the largest session, and mean events/session — the
    * elbow in n_sessions(gap) is the evidence a deployment picks its
    * threshold from (the `emb_ivf_probe_sweep` / `doc_lsh_calibration`
    * pattern applied to the sessionizer).
    *
    * 100 TB shape: the expensive part — the per-user (ts, event_id)
    * sort behind lag() — runs ONCE; every sweep point reuses the same
    * delta column. The explode multiplies rows by |gaps| (4) only for
    * the island-numbering window (keyed by (gap, user) — 4× the keys,
    * not a serialization point), and everything after is
    * sessions-sized. Gap-independent metrics could skip the explode
    * entirely (n_sessions is just 1 + count(delta > g) per user); the
    * explode is paid for max_session_events, which needs real island
    * boundaries per gap.
    *
    * Determinism: counts and maxima are exact integers; the one double
    * division (mean events/session) divides exact longs — identical
    * IEEE op in both engines, then ROUND 6.
    */
  val sessionGapSweep: CatalogEntry = CatalogEntry(
    "user_session_gap_sweep",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val wl = Window.partitionBy("user_id").orderBy("tss", "event_id")
      val deltas = Tables.events(s, d)
        .select(col("user_id"), col("event_id"), unix_timestamp(col("ts")).as("tss"))
        .withColumn("delta", col("tss") - lag("tss", 1).over(wl))
      val wg = Window.partitionBy("gap_s", "user_id").orderBy("tss", "event_id")
      deltas
        .withColumn("gap_s", explode(typedLit(SessionGapsS)))
        .withColumn("new_s",
          when(col("delta").isNull || col("delta") > col("gap_s"), 1L).otherwise(0L))
        .withColumn("sid", sum("new_s").over(
          wg.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy(col("gap_s"), col("user_id"), col("sid"))
        .agg(count(lit(1)).as("n"))
        .groupBy("gap_s")
        .agg(count(lit(1)).as("n_sessions"), sum("n").as("n_events"),
          max("n").as("max_session_events"))
        .select(col("gap_s"), col("n_sessions"), col("max_session_events"),
          round(col("n_events").cast("double") / col("n_sessions"), 6)
            .as("avg_session_events"))
        .orderBy("gap_s")
    },
    Some(s"""WITH base AS (
               SELECT user_id, event_id, CAST(FLOOR(epoch(ts)) AS BIGINT) AS tss
               FROM events),
             del AS (
               SELECT user_id, event_id, tss,
                      tss - lag(tss) OVER (PARTITION BY user_id
                                           ORDER BY tss, event_id) AS delta
               FROM base),
             g AS (SELECT CAST(unnest([${SessionGapsS.mkString(", ")}]) AS BIGINT) AS gap_s),
             ex AS (
               SELECT g.gap_s, d.user_id, d.event_id, d.tss,
                      CASE WHEN d.delta IS NULL OR d.delta > g.gap_s
                           THEN 1 ELSE 0 END AS new_s
               FROM del d CROSS JOIN g),
             sess AS (
               SELECT gap_s, user_id,
                      SUM(new_s) OVER (PARTITION BY gap_s, user_id
                                       ORDER BY tss, event_id
                                       ROWS UNBOUNDED PRECEDING) AS sid
               FROM ex),
             per AS (SELECT gap_s, user_id, sid, CAST(COUNT(*) AS BIGINT) AS n
                     FROM sess GROUP BY 1, 2, 3)
             SELECT gap_s, COUNT(*) AS n_sessions,
                    CAST(MAX(n) AS BIGINT) AS max_session_events,
                    ROUND(CAST(SUM(n) AS DOUBLE) / COUNT(*), 6) AS avg_session_events
             FROM per GROUP BY gap_s ORDER BY gap_s"""))

  /** Discrete hazard curve of inter-event gaps (Kaplan–Meier's
    * complement in bucketed form; Kleinbaum & Klein 2012 ch. 2):
    * per power-of-two-seconds bucket b, the probability a user who has
    * been idle INTO the bucket returns within it —
    * h(b) = n_b / Σ_{j≥b} n_j. The curve is what prices the
    * sessionizer's gap knob ([[sessionGapSweep]] prices its OUTPUT;
    * this prices the assumption underneath): the session boundary
    * belongs where the hazard has flattened — past the cliff, waiting
    * longer barely changes the return probability. The companion to
    * `user_survival_km`'s per-user view, aggregated corpus-wide.
    *
    * Exactness device: buckets are ceil-log2 WITHOUT libm —
    * bucket(δ) = length(bin(δ)) for δ ≥ 1 (δ = 0 → bucket 0), the
    * token_heaps_curve integer/string device — so the whole curve is
    * exact-integer until one ROUND 6 division per bucket; bucket
    * bounds are exact shifts.
    *
    * 100 TB shape: gaps come from ONE user-partitioned lag window (the
    * [[sessionGapSweep]] pass — never a global window); buckets
    * map-combine to ≤ ~40 rows; the at-risk tail sum is a triangular
    * join on that checkpoint-truncated frame. The lag stage streams
    * live as graft.streaming.StreamingQueries.streamingGapDeltas
    * (per-user last-timestamp state, the streamingTransitionPairs
    * shape) feeding the same [[bucketsFromDeltas]] aggregate in the
    * same query; the drained buckets replay [[hazardFrom]] bit-for-bit
    * (StreamingSpec). session_window (sessionsByUser) remains the live
    * form of the boundary DECISION this curve prices.
    */
  /** The corpus-touching lag stage shared by [[gapHazard]] and
    * [[userBurstiness]]: per user, the inter-event gaps in seconds from
    * ONE user-partitioned lag window ordered by (tss, event_id). The
    * live form is graft.streaming.StreamingQueries.streamingGapDeltas —
    * per-user keyed state holding the last timestamp (the
    * streamingTransitionPairs shape), emitting each closed gap as it
    * arrives; StreamingSpec pins the drained replay against the batch
    * entries bit-for-bit.
    */
  private[graft] def gapDeltas(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val wl = Window.partitionBy("user_id").orderBy("tss", "event_id")
    events
      .select(col("user_id"), col("event_id"), unix_timestamp(col("ts")).as("tss"))
      .withColumn("delta", col("tss") - lag("tss", 1).over(wl))
      .filter(col("delta").isNotNull)
      .select(col("user_id"), col("delta"))
  }

  /** The ceil-log2 bucket aggregate over a (user_id, delta) gap frame —
    * batch and streaming share it verbatim (the gap stream feeds it in
    * update mode: a keyed COUNT is linear and mergeable). */
  private[graft] def bucketsFromDeltas(deltas: DataFrame): DataFrame =
    deltas
      .select(when(col("delta") <= 0L, 0L)
        .otherwise(length(expr("bin(delta)")).cast("long")).as("b"))
      .groupBy("b").agg(count(lit(1)).as("n_gaps"))

  private[graft] def gapBuckets(events: DataFrame): DataFrame =
    bucketsFromDeltas(gapDeltas(events))

  /** The ≤ ~40-row hazard report over a drained (b, n_gaps) frame. */
  private[graft] def hazardFrom(bucketsRaw: DataFrame): DataFrame = {
    val b = bucketsRaw.localCheckpoint(eager = true)
    b.as("a").join(broadcast(b.as("c")), col("c.b") >= col("a.b"))
      .groupBy(col("a.b").as("b"), col("a.n_gaps").as("n_gaps"))
      .agg(sum(col("c.n_gaps")).as("at_risk"))
      .select(col("b"),
        when(col("b") === 0L, lit(0L))
          .otherwise(expr("shiftleft(CAST(1 AS BIGINT), CAST(b - 1 AS INT))"))
          .as("gap_lo_s"),
        (expr("shiftleft(CAST(1 AS BIGINT), CAST(b AS INT))") - 1L).as("gap_hi_s"),
        col("n_gaps"), col("at_risk"),
        round(col("n_gaps").cast("double") / col("at_risk"), 6).as("hazard"))
      .orderBy("b")
  }

  val gapHazard: CatalogEntry = CatalogEntry(
    "user_gap_hazard",
    (s, d) => hazardFrom(gapBuckets(Tables.events(s, d))),
    Some(raw"""WITH base AS (SELECT user_id, event_id,
                                    CAST(FLOOR(epoch(ts)) AS BIGINT) AS tss
                             FROM events),
                    del AS (SELECT tss - lag(tss) OVER (PARTITION BY user_id
                                     ORDER BY tss, event_id) AS delta
                            FROM base),
                    bk AS (SELECT CASE WHEN delta <= 0 THEN 0
                                       ELSE length(bin(delta)) END AS b,
                                  CAST(COUNT(*) AS BIGINT) AS n_gaps
                           FROM del WHERE delta IS NOT NULL GROUP BY 1)
               SELECT CAST(a.b AS BIGINT) AS b,
                      CAST(CASE WHEN a.b = 0 THEN 0
                                ELSE CAST(1 AS BIGINT) << (a.b - 1) END AS BIGINT) AS gap_lo_s,
                      (CAST(1 AS BIGINT) << a.b) - 1 AS gap_hi_s,
                      a.n_gaps, CAST(SUM(c.n_gaps) AS BIGINT) AS at_risk,
                      ROUND(CAST(a.n_gaps AS DOUBLE) / SUM(c.n_gaps), 6) AS hazard
               FROM bk a JOIN bk c ON c.b >= a.b
               GROUP BY a.b, a.n_gaps ORDER BY a.b"""))

  /** Goh–Barabási burstiness coefficient per user (Goh & Barabási 2008):
    * B = (σ − μ)/(σ + μ) over the user's inter-event gaps — the scale-free
    * signature that separates bursty humans (B → 1), Poisson arrivals
    * (B ≈ 0), and metronomic bots (B → −1). The per-user companion to
    * [[gapHazard]]'s corpus-wide curve: the hazard prices the session
    * gap knob, this flags WHICH users violate its premise (a scripted
    * account's regular cadence distorts any inter-event statistic, so
    * bot screening reads this column before trusting the rest).
    *
    * Exactness device: gaps ride the shared [[gapDeltas]] lag stage;
    * per user the entry keeps only (n, Σδ, Σδ²) — exact integers, Σδ²
    * and the discriminant M = n·Σδ² − (Σδ)² in DECIMAL(38,0) (δ² alone
    * crosses 2⁶³ for multi-decade gaps and n·Σδ² crosses it at fleet
    * event volumes — the chao1 at-birth envelope discipline; the oracle
    * mirrors with HUGEINT). Multiplying B's numerator and denominator
    * by n removes both divisions: B = (√M − Σδ)/(√M + Σδ). M ≥ 0
    * exactly (Cauchy–Schwarz on integers), √ is IEEE correctly rounded
    * in both engines, and the one closing division is guarded: Σδ = 0
    * (all gaps zero — and then M = 0 too, so the denominator is 0)
    * yields NULL in both engines, never an ANSI ÷0 or a fabricated
    * value. All-equal gaps give M = 0 → B = −1, the documented limit.
    *
    * 100 TB shape: the lag window is the family's one corpus stage
    * (user-partitioned, streams live via streamingGapDeltas feeding a
    * user-keyed SUM — linear, mergeable); the report is one map-combined
    * user-keyed aggregate, output sized by the user population.
    */
  /** The burstiness report over a (user_id, delta) gap frame — ONE
    * definition shared by the batch entry and StreamingSpec's drained
    * replay, so the two cannot drift. */
  private[graft] def burstinessFromDeltas(deltas: DataFrame): DataFrame = {
    val dec38 = "decimal(38,0)"
    val m = (col("n_gaps").cast(dec38) * col("sum_s2")
      - col("sum_s").cast(dec38) * col("sum_s")).cast("double")
    deltas
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_gaps"), sum("delta").as("sum_s"),
        sum(col("delta").cast(dec38) * col("delta")).as("sum_s2"))
      .select(col("user_id"), col("n_gaps"), col("sum_s").as("total_gap_s"),
        when(col("sum_s") > 0L,
          round((sqrt(m) - col("sum_s").cast("double"))
            / (sqrt(m) + col("sum_s").cast("double")), 6)).as("burstiness"))
      .orderBy("user_id")
  }

  val userBurstiness: CatalogEntry = CatalogEntry(
    "user_burstiness",
    (s, d) => burstinessFromDeltas(gapDeltas(Tables.events(s, d))),
    Some(raw"""WITH base AS (SELECT user_id, event_id,
                                    CAST(FLOOR(epoch(ts)) AS BIGINT) AS tss
                             FROM events),
                    del AS (SELECT user_id,
                                   tss - lag(tss) OVER (PARTITION BY user_id
                                     ORDER BY tss, event_id) AS delta
                            FROM base),
                    agg AS (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_gaps,
                                   CAST(SUM(delta) AS BIGINT) AS sum_s,
                                   SUM(CAST(delta AS HUGEINT) * delta) AS sum_s2
                            FROM del WHERE delta IS NOT NULL GROUP BY user_id)
               SELECT user_id, n_gaps, sum_s AS total_gap_s,
                      CASE WHEN sum_s > 0 THEN ROUND(
                        (sqrt(CAST(CAST(n_gaps AS HUGEINT) * sum_s2
                                   - CAST(sum_s AS HUGEINT) * sum_s AS DOUBLE))
                         - CAST(sum_s AS DOUBLE))
                        / (sqrt(CAST(CAST(n_gaps AS HUGEINT) * sum_s2
                                     - CAST(sum_s AS HUGEINT) * sum_s AS DOUBLE))
                           + CAST(sum_s AS DOUBLE)), 6)
                      END AS burstiness
               FROM agg ORDER BY user_id"""))

  /** The composite cleaning pipeline — the engine's pieces chained the
    * way a training-data pipeline actually runs them:
    *
    *   quality filter (≥ 25 whitespace tokens)
    *     → exact dedup (deterministic min-id survivor per content hash)
    *     → near-dup removal (MinHash-LSH pairs ≥ 0.5, higher id dropped)
    *     → per-source corpus stats (docs kept, tokens kept)
    *
    * Every stage reuses an oracle-checked operator (Text, Dedup,
    * NearDupCatalog.lshPairs); the oracle runs the identical composition
    * in SQL via the shared LSH CTEs.
    */
  /** Stages 1–2 of the cleaning pipeline (quality filter → exact dedup)
    * over an arbitrary documents frame — shared by the batch entry below
    * and the streaming-convergence test of
    * `StreamingQueries.streamingCleanCorpus`.
    */
  private[graft] def qualityDedup(docs: DataFrame, minTokens: Int = 25): DataFrame = {
    val base = docs
      .select(col("doc_id"), col("source"), col("text"),
        size(Text.wsTokens(col("text"))).cast("long").as("n_tokens"))
      .filter(col("n_tokens") >= minTokens)
    graft.operators.Dedup.exactByContent(base, col("text"), col("doc_id"))
  }

  val cleanCorpus: CatalogEntry = CatalogEntry(
    "pipeline_clean_corpus",
    (s, d) => {
      val exact = qualityDedup(documents(s, d))
      val cleaned = graft.operators.Dedup.dropNearDuplicates(
        exact, col("doc_id"), NearDupCatalog.lshPairs(s, d))
      cleaned.groupBy("source")
        .agg(count(lit(1)).as("docs_kept"), sum("n_tokens").as("tokens_kept"))
    },
    Some(s"""WITH ${NearDupCatalog.lshPairsCtesSql},
              q AS (SELECT doc_id, source,
                           CAST(len($toksSql) AS BIGINT) AS n_tokens,
                           md5($normSql) AS h
                    FROM documents
                    WHERE len($toksSql) >= 25),
              keep AS (SELECT doc_id, source, n_tokens FROM (
                         SELECT *, row_number() OVER (PARTITION BY h ORDER BY doc_id) AS rn
                         FROM q) WHERE rn = 1)
            SELECT source, COUNT(*) AS docs_kept,
                   CAST(SUM(n_tokens) AS BIGINT) AS tokens_kept
            FROM keep
            WHERE doc_id NOT IN (SELECT doc_b FROM lsh_pairs)
            GROUP BY source"""))

  /** The training-prep composite — the end-to-end path from raw corpus to
    * training chunks, each stage an oracle-checked operator reused
    * verbatim:
    *
    *   quality filter (≥ 25 whitespace tokens)
    *     → exact dedup (deterministic min-id survivor per content hash)
    *     → train-split selection (doc_split_assign's md5 hex rule)
    *     → sliding-window chunking (doc_chunk's 32/24 token windows)
    *
    * Scale shape: ONE shuffle end to end (the dedup's content-hash
    * window); split selection and chunking are per-row projections that
    * ride the dedup output — at 100 TB the composite costs the same as
    * its most expensive stage, not the sum of four passes.
    */
  val trainPrep: CatalogEntry = CatalogEntry(
    "pipeline_train_prep",
    (s, d) => {
      val cleaned = qualityDedup(documents(s, d))
      val train = cleaned.filter(
        TrainPrepCatalog.splitHx(col("doc_id")) < TrainPrepCatalog.TrainBound)
      TrainPrepCatalog.chunkTokens(
        train.select(col("doc_id"), col("source"), Text.normTokens(col("text")).as("toks")),
        "doc_id", "source")
    },
    Some(s"""WITH q AS (SELECT doc_id, source, text, md5($normSql) AS h
                        FROM documents WHERE len($toksSql) >= 25),
                  keep AS (SELECT doc_id, source, text FROM (
                             SELECT *, row_number() OVER (PARTITION BY h ORDER BY doc_id) AS rn
                             FROM q) WHERE rn = 1),
                  train AS (SELECT doc_id, source, $normToksSql AS toks
                            FROM keep
                            WHERE ${TrainPrepCatalog.splitHxSql("doc_id")} < '${TrainPrepCatalog.TrainBound}')
             SELECT doc_id, source, g AS chunk_start,
                    array_to_string(toks[g+1 : g+${TrainPrepCatalog.ChunkLen}], ' ') AS chunk_text,
                    CAST(LEAST(${TrainPrepCatalog.ChunkLen}, len(toks) - g) AS BIGINT) AS n_tokens
             FROM train,
                  UNNEST(generate_series(0, len(toks) - 1, ${TrainPrepCatalog.ChunkStride})) AS u(g)"""))

  /** Sequence packing for training: documents are concatenated per source
    * in doc_id order and chunked into fixed token budgets — each doc gets
    * the bin it STARTS in and its token offset inside that bin (the
    * concat-then-chunk packing every LLM pretraining loader performs;
    * docs may straddle a boundary, exactly as the loader's chunker does).
    * One RANGE shuffle on (source, doc_id) read twice (the
    * withPrefixSumPerKey two-pass prefix-offset device, r18) + exact
    * BIGINT running sums: no global sort, O(partitions + sources)
    * driver traffic, deterministic across cluster sizes. At 100 TB the
    * skew ceiling is a range bucket — the biggest source spans buckets
    * instead of bounding the job as one keyed-window sort task.
    */
  private val BinBudget = 512L

  val packBins: CatalogEntry = CatalogEntry(
    "doc_pack_bins",
    (s, d) => {
      // Exclusive per-source prefix sum via withPrefixSumPerKey (range
      // shuffle + driver offsets, r18): bit-identical to the former
      // coalesce(SUM OVER (… AND 1 PRECEDING), 0) keyed window — the
      // operator's 0-start empty frame and null-skip ARE that window's
      // semantics — but a dominating source now spans range buckets
      // instead of serializing one window sort task.
      val base = documents(s, d)
        .select(col("source"), col("doc_id"),
          size(Text.wsTokens(col("text"))).cast("long").as("n_tokens"))
      graft.operators.GlobalRank.withPrefixSumPerKey(
          base, Seq("source"), Seq(col("doc_id")), "n_tokens",
          numPartitions = graft.operators.GlobalRank.sessionPartitions(base),
          cumCol = "cum_before", inclusive = false)
        .select(col("doc_id"), col("source"), col("n_tokens"),
          expr(s"cum_before div $BinBudget").as("bin_id"),
          (col("cum_before") % BinBudget).as("bin_offset"))
    },
    Some(s"""SELECT doc_id, source, n_tokens,
                    CAST(cb // $BinBudget AS BIGINT) AS bin_id,
                    CAST(cb % $BinBudget AS BIGINT) AS bin_offset
             FROM (SELECT doc_id, source,
                          CAST(len($toksSql) AS BIGINT) AS n_tokens,
                          COALESCE(SUM(CAST(len($toksSql) AS BIGINT)) OVER (
                            PARTITION BY source ORDER BY doc_id
                            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cb
                   FROM documents)"""))

  /** Curriculum packing — the composite that turns a scored corpus into
    * curriculum-ordered training shards: global quality DECILE (via
    * [[graft.operators.GlobalRank]] — one range shuffle, no
    * single-partition window) → deterministic md5 shard within the tier
    * (256-way, so the packing window's skew ceiling is tier/256, the
    * [[shuffleOrder]] trick) → greedy token-budget bins per (tier,
    * shard). A loader then reads bins tier-by-tier: easy data first,
    * shard-parallel within each tier. Budget shared with
    * [[packBins]].
    */
  val pipelineCurriculum: CatalogEntry = CatalogEntry(
    "pipeline_curriculum",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val scored = documents(s, d).select(
        col("doc_id"),
        size(Text.wsTokens(col("text"))).cast("long").as("n_tokens"),
        length(col("text")).cast("long").as("n_chars_m"),
        expr("length(text) - length(regexp_replace(text, '[.,;:!?]', ''))")
          .cast("long").as("punct_cnt"),
        Text.tokensInSet(Text.wsTokens(col("text")), stopwords).cast("long").as("stop_cnt"))
        .select(col("doc_id"), col("n_tokens"),
          round(
            least(col("n_tokens") / lit(50.0), lit(1.0)) * 0.5 +
            col("stop_cnt") / col("n_tokens") * 0.3 +
            (lit(1.0) - col("punct_cnt") / col("n_chars_m")) * 0.2, 6).as("quality_score"))
      // The count branch re-references `scored` un-cached on purpose:
      // Catalyst prunes it to a zero-column metadata scan (r19 plan
      // audit, plans/r19/before/pipeline_curriculum.txt ReadSchema:
      // struct<>) — the regex scoring runs once, inside the rank pass.
      val ranked = graft.operators.GlobalRank.withRank(
        scored, Seq(col("quality_score").desc, col("doc_id").asc),
        numPartitions = graft.operators.GlobalRank.sessionPartitions(scored))
        .crossJoin(broadcast(scored.agg(count(lit(1)).as("total"))))
        .select(col("doc_id"), col("n_tokens"),
          expr("((rank - 1) * 10) div total").as("tier"),
          conv(substring(md5(concat(lit("curr|"), col("doc_id").cast("string"))), 1, 2),
            16, 10).cast("long").as("shard"))
      val w = Window.partitionBy("tier", "shard").orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
      ranked
        .withColumn("cum_before", coalesce(sum(col("n_tokens")).over(w), lit(0L)))
        .select(col("doc_id"), col("tier"), col("shard"), col("n_tokens"),
          expr(s"cum_before div $BinBudget").as("bin_id"))
    },
    Some(s"""WITH scored AS (
               SELECT doc_id, CAST(len($toksSql) AS BIGINT) AS n_tokens,
                      ROUND(LEAST(len($toksSql) / 50.0, 1.0) * 0.5
                            + len(list_filter($toksSql, t -> t IN ($stopListSql))) / len($toksSql) * 0.3
                            + (1.0 - (length(text) - length(regexp_replace(text, '[.,;:!?]', '', 'g'))) / length(text)) * 0.2,
                            6) AS quality_score
               FROM documents),
             ranked AS (
               SELECT doc_id, n_tokens,
                      CAST(((ROW_NUMBER() OVER (ORDER BY quality_score DESC, doc_id) - 1) * 10)
                           // (COUNT(*) OVER ()) AS BIGINT) AS tier,
                      md5('curr|' || CAST(doc_id AS VARCHAR)) AS h
               FROM scored),
             sharded AS (
               SELECT doc_id, n_tokens, tier,
                      CAST((instr('0123456789abcdef', substr(h, 1, 1)) - 1) * 16
                           + instr('0123456789abcdef', substr(h, 2, 1)) - 1 AS BIGINT) AS shard
               FROM ranked)
           SELECT doc_id, tier, shard, n_tokens,
                  CAST(COALESCE(SUM(n_tokens) OVER (
                    PARTITION BY tier, shard ORDER BY doc_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) // $BinBudget AS BIGINT) AS bin_id
           FROM sharded"""))

  /** Schema-on-read JSON extraction: pull a typed field out of the
    * `events.props` JSON column and aggregate it per event type.
    * Per-row parse + one small-key aggregate — the shape never changes
    * with scale (no shuffle grows with the JSON payload, only with the
    * 5-value key). Real pipelines do this instead of pre-flattening:
    * the raw event keeps its open schema, extraction is late-bound.
    */
  /** Equi-depth decile statistics over the value stream — the
    * equal-POPULATION histogram (each bucket holds exactly n/10 rows)
    * that equi-width bucketing cannot give on skewed data: per decile,
    * the row count, value bounds and decimal-exact sum. Bucket
    * membership comes from the distributed global rank
    * ([[graft.operators.GlobalRank]] — one range shuffle, never a
    * single-partition NTILE window), then a 10-key aggregate.
    */
  val eventsValueDeciles: CatalogEntry = CatalogEntry(
    "events_value_deciles",
    (s, d) => {
      val v = Tables.events(s, d).select(col("event_id"), col("value"))
      val ranked = graft.operators.GlobalRank.withRank(
        v, Seq(col("value").asc, col("event_id").asc),
        numPartitions = graft.operators.GlobalRank.sessionPartitions(v))
      ranked
        .crossJoin(broadcast(v.agg(count(lit(1)).as("total"))))
        .select(col("value"), expr("((rank - 1) * 10) div total").as("decile"))
        .groupBy("decile")
        .agg(count(lit(1)).as("n"), min("value").as("lo"), max("value").as("hi"),
          Exact.dsum(col("value")).as("total_value"))
    },
    Some(s"""SELECT decile, COUNT(*) AS n, MIN(value) AS lo, MAX(value) AS hi,
                    ${Exact.sqlSum("value")} AS total_value
             FROM (SELECT value,
                          CAST(((ROW_NUMBER() OVER (ORDER BY value, event_id) - 1) * 10)
                               // (COUNT(*) OVER ()) AS BIGINT) AS decile
                   FROM events)
             GROUP BY decile"""))

  /** Per-key compaction — the "latest state" snapshot a changelog
    * becomes after compaction (the batch analogue of upsert
    * materialization): for every user, the most recent event's fields,
    * "most recent" pinned by the total order (ts, event_id). ONE struct
    * argmax in a single keyed aggregate — no ranking window, no
    * self-join; at 100 TB this is one shuffle on the key with map-side
    * partial argmax.
    */
  val eventsLatestState: CatalogEntry = CatalogEntry(
    "events_latest_state",
    (s, d) => Transforms.latestState(Tables.events(s, d)),
    Some("""SELECT user_id, ts AS last_ts, event_id AS last_event_id,
                   event_type AS last_type, value AS last_value
            FROM (SELECT *, row_number() OVER (PARTITION BY user_id
                                               ORDER BY ts DESC, event_id DESC) AS rn
                  FROM events) WHERE rn = 1"""))

  /** Key-skew report — the diagnostic that decides WHEN to salt (the
    * [[graft.operators.Salting]] companion): per-key counts reduced to
    * the corpus-level skew statistics (key count, hottest key's share of
    * the mean, coefficient of variation). The moments ride EXACT integer
    * sums (Σc, Σc² over BIGINT counts), so the derived doubles are the
    * same one-shot IEEE expressions in both engines. Two tiny aggregates:
    * the per-key count shuffle (the thing being measured) and a scalar
    * fold — free at any scale.
    */
  val eventsKeySkew: CatalogEntry = CatalogEntry(
    "events_key_skew",
    (s, d) => Transforms.keySkewFold(Transforms.keyCounts(Tables.events(s, d))),
    Some("""SELECT n_keys, max_cnt,
                   ROUND(sx / n_keys, 6) AS mean_cnt,
                   ROUND(max_cnt * n_keys / sx, 6) AS skew_ratio,
                   ROUND(SQRT(sx2 / n_keys - (sx / n_keys) * (sx / n_keys))
                         / (sx / n_keys), 6) AS cv
            FROM (SELECT CAST(COUNT(*) AS BIGINT) AS n_keys,
                         CAST(MAX(c) AS BIGINT) AS max_cnt,
                         CAST(SUM(c) AS BIGINT) AS sx,
                         CAST(SUM(c * c) AS BIGINT) AS sx2
                  FROM (SELECT COUNT(*) AS c FROM events GROUP BY user_id))"""))

  /** Time-series resample + gap-fill — the feature-engineering step that
    * turns an irregular event stream into the fixed-cadence grid a model
    * consumes: per user, one row per hour from the user's first to last
    * active hour, carrying that hour's event count and the last observed
    * value FORWARD-FILLED across silent hours. Deterministic "last in
    * hour" = max by the total order (ts, event_id). Shape: one
    * (user, hour) aggregate collapses the stream to ≤ users×hours rows,
    * the grid explodes from a per-user bounds row (calendar-sized, not
    * event-sized), and the fill is a user-partitioned running window —
    * every stage keyed, nothing global, state ∝ users × calendar at any
    * corpus size.
    */
  val eventsResample: CatalogEntry = CatalogEntry(
    "events_resample_1h",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val hourly = Tables.events(s, d)
        .select(col("user_id"), date_trunc("hour", col("ts")).as("hour"),
          struct(col("ts"), col("event_id"), col("value")).as("tv"))
        .groupBy("user_id", "hour")
        .agg(count(lit(1)).as("n_events"), max(col("tv")).getField("value").as("hv"))
      val grid = hourly.groupBy("user_id")
        .agg(min("hour").as("h0"), max("hour").as("h1"))
        .select(col("user_id"), explode(expr("sequence(h0, h1, interval 1 hour)")).as("hour"))
      val w = Window.partitionBy("user_id").orderBy("hour")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      grid.join(hourly, Seq("user_id", "hour"), "left")
        .select(col("user_id"), col("hour"),
          coalesce(col("n_events"), lit(0L)).as("n_events"),
          last(col("hv"), ignoreNulls = true).over(w).as("last_value"))
    },
    Some("""WITH hr AS (
              SELECT user_id, date_trunc('hour', ts) AS hour, value,
                     row_number() OVER (PARTITION BY user_id, date_trunc('hour', ts)
                                        ORDER BY ts DESC, event_id DESC) AS rn,
                     COUNT(*) OVER (PARTITION BY user_id, date_trunc('hour', ts)) AS n
              FROM events),
            hourly AS (SELECT user_id, hour, n, value AS hv FROM hr WHERE rn = 1),
            bounds AS (SELECT user_id, MIN(hour) AS h0, MAX(hour) AS h1 FROM hourly GROUP BY user_id),
            grid AS (SELECT user_id, unnest(generate_series(h0, h1, INTERVAL '1 hour')) AS hour FROM bounds)
          SELECT g.user_id, g.hour,
                 CAST(COALESCE(h.n, 0) AS BIGINT) AS n_events,
                 last_value(h.hv IGNORE NULLS) OVER (
                   PARTITION BY g.user_id ORDER BY g.hour ROWS UNBOUNDED PRECEDING) AS last_value
          FROM grid g LEFT JOIN hourly h ON h.user_id = g.user_id AND h.hour = g.hour"""))

  /** Schema profiler — the data-quality report a pipeline reads before
    * trusting a new drop: per column, the row count, null count and exact
    * distinct cardinality. ONE scan: each row explodes into #cols
    * (col_name, stringified value) pairs and a single aggregate computes
    * all three stats (the string cast is injective per engine, so the
    * distinct count over strings equals the distinct count over native
    * values — each oracle leg counts natively). At 100 TB the shuffle
    * carries one row per DISTINCT (column, value) pair — the floor for
    * any exact profile; swap countDistinct for approx_count_distinct when
    * estimates suffice.
    */
  val eventsProfile: CatalogEntry = CatalogEntry(
    "events_profile",
    (s, d) => {
      val cols = Seq("event_id", "ts", "user_id", "event_type", "value", "props")
      Tables.events(s, d)
        .select(explode(array(cols.map(c =>
          struct(lit(c).as("col_name"), col(c).cast("string").as("v"))): _*)).as("kv"))
        .select(col("kv.col_name").as("col_name"), col("kv.v").as("v"))
        .groupBy("col_name")
        .agg(count(lit(1)).as("n_rows"),
          sum(when(col("v").isNull, 1L).otherwise(0L)).as("n_nulls"),
          countDistinct(col("v")).as("n_distinct"))
    },
    Some(Seq("event_id", "ts", "user_id", "event_type", "value", "props").map { c =>
      s"""SELECT '$c' AS col_name, COUNT(*) AS n_rows,
                 COUNT(*) - COUNT($c) AS n_nulls,
                 CAST(COUNT(DISTINCT $c) AS BIGINT) AS n_distinct FROM events"""
    }.mkString(" UNION ALL ")))

  val eventsJsonKv: CatalogEntry = CatalogEntry(
    "events_json_kv",
    (s, d) => Tables.events(s, d)
      .select(col("event_type"),
        get_json_object(col("props"), "$.k").cast("long").as("k"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), sum(col("k")).as("k_sum"),
        min(col("k")).as("k_min"), max(col("k")).as("k_max"))
      .orderBy("event_type"),
    Some("""SELECT event_type, COUNT(*) AS n,
                   CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS k_sum,
                   MIN(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS k_min,
                   MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS k_max
            FROM events GROUP BY event_type ORDER BY event_type"""))

  /** Ordered per-user running total — the feature-engineering window
    * shape (cumulative spend/exposure per entity). One shuffle on
    * user_id, per-partition sort, NO global sort. The running sum runs
    * in DECIMAL: Spark accumulates sequentially but DuckDB evaluates
    * windowed SUM over a segment tree, so a double running sum would
    * diverge by summation order — decimal is associative-exact, making
    * tree and sequential evaluation bit-identical; the final cast routes
    * through the usual correctly-rounded path.
    */
  val userRunningTotal: CatalogEntry = CatalogEntry(
    "user_running_total",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      import org.apache.spark.sql.types.DecimalType
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.events(s, d)
        .select(col("user_id"), col("event_id"),
          sum(col("value").cast(DecimalType(18, 4))).over(w)
            .cast("double").as("running_value"))
    },
    Some("""SELECT user_id, event_id,
                   CAST(CAST(SUM(CAST(value AS DECIMAL(18,4)))
                        OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS UNBOUNDED PRECEDING) AS VARCHAR) AS DOUBLE)
                     AS running_value
            FROM events"""))

  /** The analytic-window family in one keyed pass: per event, the gap to
    * the user's previous event (lag), the value delta, and the event's
    * percent_rank within the user's history — the sequential features a
    * behavioral model consumes. All four functions evaluate over ONE
    * user-partitioned sort (a single hash exchange + per-partition sort);
    * percent_rank's (rank-1)/(n-1) divides exact integers, so the double
    * is bit-identical cross-engine.
    */
  val eventsWindowFamily: CatalogEntry = CatalogEntry(
    "events_window_family",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      Tables.events(s, d)
        .select(col("user_id"), col("event_id"),
          (unix_micros(col("ts")) - lag(unix_micros(col("ts")), 1).over(w))
            .as("micros_since_prev"),
          round(col("value") - lag(col("value"), 1).over(w), 6).as("value_delta"),
          round(percent_rank().over(w), 6).as("pct_rank"))
    },
    Some("""SELECT user_id, event_id,
                   CAST(epoch_us(ts) - lag(epoch_us(ts), 1) OVER w AS BIGINT)
                     AS micros_since_prev,
                   ROUND(value - lag(value, 1) OVER w, 6) AS value_delta,
                   ROUND(percent_rank() OVER w, 6) AS pct_rank
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)"""))

  /** Deterministic stratified sampling: per-source keep rates applied
    * via a content-independent hash test — substr(md5(doc_id), 1, 4)
    * compared against the rate as a hex threshold. Pure per-row
    * predicate: no shuffle, no RNG state, reproducible across engines,
    * cluster sizes and reruns (the property that makes a training-mix
    * resample auditable). Even-numbered sources keep ~50% ('8000'/16^4),
    * odd ~25% ('4000') — the downsampling knob a source_mix_weights
    * decision feeds.
    */
  val stratifiedSample: CatalogEntry = CatalogEntry(
    "doc_stratified_sample",
    (s, d) => {
      val thr = when(
        regexp_extract(col("source"), "(\\d+)$", 1).cast("int") % 2 === 0, lit("8000"))
        .otherwise(lit("4000"))
      documents(s, d)
        .select(col("doc_id"), col("source"))
        .filter(substring(md5(col("doc_id").cast("string")), 1, 4) < thr)
    },
    Some("""SELECT doc_id, source FROM documents
            WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) <
                  CASE WHEN CAST(regexp_extract(source, '(\d+)$', 1) AS INT) % 2 = 0
                       THEN '8000' ELSE '4000' END"""))

  /** Salted two-phase aggregation as a first-class catalog entry: count
    * and exact decimal sum per user, routed through operators/Salting's
    * shape — partial aggregation on (key, salt) splits any hot key
    * across `saltBuckets` uniform sub-keys, the final aggregation merges
    * partials per key. The oracle is the PLAIN single-phase aggregation:
    * salting must be result-invisible (counts are integers; the value
    * sum stays DECIMAL through BOTH phases — summing per-salt doubles
    * would re-order float addition — and casts to double only at the
    * end). This testdata's keys are uniform; the entry pins the
    * correctness contract so the operator is safe to reach for when a
    * skewed corpus needs it.
    */
  val saltedUserAgg: CatalogEntry = CatalogEntry(
    "events_salted_agg",
    (s, d) => {
      import org.apache.spark.sql.types.DecimalType
      Tables.events(s, d)
        .select(col("user_id"), col("value"),
          pmod(hash(col("event_id")), lit(16)).as("salt"))
        .groupBy("user_id", "salt")
        .agg(count(lit(1)).as("pc"),
          sum(col("value").cast(DecimalType(18, 4))).as("ps"))
        .groupBy(col("user_id").as("driver_id"))
        .agg(sum("pc").as("cnt"), sum("ps").cast("double").as("total_value"))
    },
    Some(s"""SELECT user_id AS driver_id, COUNT(*) AS cnt,
             ${Exact.sqlSum("value", 18, 4)} AS total_value
             FROM events GROUP BY user_id"""))

  /** Per-type z-score outlier detection — the monitoring primitive of a
    * streaming-analytics engine (flag measures > 3σ from their group
    * mean). Two-pass shape: one tiny-key aggregate (#event-types rows)
    * broadcast back over the stream, then a per-row projection — at
    * 100 TB the fact table is scanned twice and shuffled never.
    *
    * Cross-engine determinism end to end: the sums are DECIMAL-exact
    * (sqlSum varchar-routed back to double, the Exact contract), n is an
    * exact BIGINT, and mean/var/z are then derived with the SAME IEEE
    * double expression shape in both engines — identical inputs +
    * identical op sequence = identical bits, so even the z² > 9
    * membership boundary cannot flutter. var > 0 guards the degenerate
    * constant-group case (NaN ordering differs between engines).
    */
  val zscoreOutliers: CatalogEntry = CatalogEntry(
    "events_zscore_outliers",
    (s, d) => Transforms.zscoreFlag(Tables.events(s, d),
      Transforms.zscoreStats(Tables.events(s, d))),
    Some(s"""SELECT event_id, event_type, value, ROUND(zr, 6) AS z
             FROM (SELECT event_id, event_type, value, vr,
                          (value - mean) / sqrt(vr) AS zr
                   FROM (SELECT e.event_id, e.event_type, e.value,
                                st.sx / st.n AS mean,
                                st.sx2 / st.n - (st.sx / st.n) * (st.sx / st.n) AS vr
                         FROM events e
                         JOIN (SELECT event_type,
                                      ${Exact.sqlSum("value", 18, 4)} AS sx,
                                      ${Exact.sqlToDouble(
                                        "SUM(CAST(CAST(value AS DECIMAL(18,4)) * CAST(value AS DECIMAL(18,4)) AS DECIMAL(38,8)))")} AS sx2,
                                      COUNT(*) AS n
                               FROM events GROUP BY event_type) st
                           ON e.event_type = st.event_type))
             WHERE vr > 0 AND zr * zr > 9"""))

  /** AS-OF attribution: each purchase matched to the same user's latest
    * click at or before it — through the custom whole-operator Catalyst
    * extension (graft.plans.AsOfJoinPlan → AsOfJoinStrategy →
    * AsOfJoinExec): a sort-merge with a forward-only pointer, never the
    * range-join-then-rank blow-up (see the operator's scaladoc for the
    * cost argument). Ties are pinned: greatest ts, then greatest
    * event_id. The oracle states the same semantic declaratively
    * (ranked window over the range join — fine at oracle scale, the
    * blow-up is exactly what the operator exists to avoid).
    */
  val eventsAsofJoin: CatalogEntry = CatalogEntry(
    "events_asof_join",
    (s, d) => {
      val ev = Tables.events(s, d)
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id").as("purchase_id"), col("user_id").as("p_user"),
          col("ts").as("p_ts"))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("event_id").as("click_id"), col("user_id").as("c_user"),
          col("ts").as("c_ts"))
      graft.plans.AsOf.join(purchases, clicks,
          "p_user", "p_ts", "c_user", "c_ts", "click_id")
        .select(col("purchase_id"), col("p_user").as("user_id"), col("click_id"))
    },
    Some("""WITH p AS (SELECT event_id AS pe, user_id, ts FROM events
                       WHERE event_type = 'purchase'),
                 c AS (SELECT event_id AS ce, user_id, ts FROM events
                       WHERE event_type = 'click'),
                 m AS (SELECT pe, ce,
                              row_number() OVER (PARTITION BY pe
                                ORDER BY c.ts DESC, ce DESC) AS rn
                       FROM p JOIN c ON c.user_id = p.user_id AND c.ts <= p.ts)
            SELECT p.pe AS purchase_id, p.user_id,
                   (SELECT ce FROM m WHERE m.pe = p.pe AND rn = 1) AS click_id
            FROM p"""))

  /** FORWARD as-of — time-to-conversion: each click matched to the same
    * user's NEXT purchase at or after it (ties: smallest purchase id),
    * plus the latency in microseconds. Same custom sort-merge exec as
    * [[eventsAsofJoin]], reversed through negated time keys
    * ([[graft.plans.AsOf.joinForward]]) — one physical operator, both
    * directions, still a linear merge with zero pair blow-up.
    */
  val eventsAsofNext: CatalogEntry = CatalogEntry(
    "events_asof_next",
    (s, d) => {
      val ev = Tables.events(s, d)
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("event_id").as("click_id"), col("user_id").as("c_user"),
          col("ts").as("c_ts"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id").as("purchase_id"), col("user_id").as("p_user"),
          col("ts").as("p_ts"))
      graft.plans.AsOf.joinForward(clicks, purchases,
          "c_user", "c_ts", "p_user", "p_ts", "purchase_id")
        .select(col("click_id"), col("c_user").as("user_id"), col("purchase_id"),
          (unix_micros(col("p_ts")) - unix_micros(col("c_ts"))).as("micros_to_purchase"))
    },
    Some("""WITH c AS (SELECT event_id AS ce, user_id, ts FROM events
                       WHERE event_type = 'click'),
                 p AS (SELECT event_id AS pe, user_id, ts FROM events
                       WHERE event_type = 'purchase'),
                 m AS (SELECT ce, pe, epoch_us(p.ts) - epoch_us(c.ts) AS dt,
                              row_number() OVER (PARTITION BY ce
                                ORDER BY p.ts ASC, pe ASC) AS rn
                       FROM c JOIN p ON p.user_id = c.user_id AND p.ts >= c.ts)
            SELECT c.ce AS click_id, c.user_id,
                   (SELECT pe FROM m WHERE m.ce = c.ce AND rn = 1) AS purchase_id,
                   (SELECT CAST(dt AS BIGINT) FROM m WHERE m.ce = c.ce AND rn = 1)
                     AS micros_to_purchase
            FROM c"""))

  /** Pure-range join (no equi key at all): every (click, purchase) pair
    * across ALL users within ±5 minutes of each other — the co-occurrence
    * shape behind burst/fraud correlation. Catalyst would plan the naive
    * form as a BroadcastNestedLoopJoin comparing every pair; the
    * operators/RangeJoin bucketing turns it into a hash equi-join on
    * 5-minute buckets with the exact timestamp predicate as residual and
    * arithmetic assign-once dedup. Bucket coverage runs on floor-second
    * epochs padded by 1 s (unit-floor slack), the residual on exact
    * timestamps — so bucketing can only over-cover, never miss.
    */
  val eventsRangeJoin: CatalogEntry = CatalogEntry(
    "events_range_join",
    (s, d) => {
      val ev = Tables.events(s, d)
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("event_id").as("click_id"), col("ts").as("c_ts"))
        .withColumn("c_lo", col("c_ts").cast("long") - 301)
        .withColumn("c_hi", col("c_ts").cast("long") + 301)
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id").as("purchase_id"), col("ts").as("p_ts"))
        .withColumn("p_e", col("p_ts").cast("long"))
      graft.operators.RangeJoin.intervalOverlap(
          clicks, purchases, "c_lo", "c_hi", "p_e", "p_e", width = 300L,
          residual = col("p_ts") >= col("c_ts") - expr("INTERVAL 5 MINUTES") &&
            col("p_ts") <= col("c_ts") + expr("INTERVAL 5 MINUTES"))
        .select(col("click_id"), col("purchase_id"))
    },
    Some("""SELECT a.event_id AS click_id, b.event_id AS purchase_id
            FROM events a JOIN events b
              ON a.event_type = 'click' AND b.event_type = 'purchase'
             AND b.ts >= a.ts - INTERVAL 5 MINUTE
             AND b.ts <= a.ts + INTERVAL 5 MINUTE"""))

  /** PII scan + redaction (emails / IPv4 / phone numbers → typed
    * placeholders) — the scrubbing pass every crawl corpus goes through
    * before training. The synthetic corpus is digit-free, so to keep the
    * oracle NON-vacuous each doc first derives a deterministic
    * PII-bearing suffix (an email always; an IP on even ids; a phone on
    * ids ≡ 0 mod 3) — both engines derive the identical string, then the
    * scan counts and the redactor rewrites it, so the regex semantics
    * themselves (dialect, greediness, replace-all) are what the hash
    * compare certifies. Patterns are RE2-compatible (Text.redactPii), so
    * the same source strings run under Java regex (Spark) and RE2
    * (DuckDB).
    *
    * 100 TB shape: pure per-row projection — three regex passes inside
    * whole-stage codegen, zero shuffles. Behavioral contract (ordering:
    * email before IP before phone, so an email's dotted local part is
    * never bitten by the narrower patterns) is pinned in TextSpec.
    */
  val piiRedact: CatalogEntry = CatalogEntry(
    "doc_pii_redact",
    (s, d) => {
      val id = col("doc_id")
      val tainted = concat(
        col("text"),
        lit(" contact user"), id.cast("string"), lit("@crawl.example.com"),
        when(id % 2 === 0,
          concat(lit(" from 10."), (id % 200).cast("string"), lit(".0."),
            ((id * 7) % 250).cast("string"))).otherwise(lit("")),
        when(id % 3 === 0, lit(" call 555-867-5309")).otherwise(lit("")))
      documents(s, d).select(
        col("doc_id"),
        Text.piiCount(tainted).cast("long").as("n_pii"),
        Text.redactPii(tainted).as("redacted"))
    },
    Some(raw"""WITH t AS (
                 SELECT doc_id,
                        text || ' contact user' || CAST(doc_id AS VARCHAR) || '@crawl.example.com'
                          || CASE WHEN doc_id % 2 = 0
                                  THEN ' from 10.' || CAST(doc_id % 200 AS VARCHAR)
                                         || '.0.' || CAST((doc_id * 7) % 250 AS VARCHAR)
                                  ELSE '' END
                          || CASE WHEN doc_id % 3 = 0 THEN ' call 555-867-5309' ELSE '' END AS tx
                 FROM documents)
               SELECT doc_id,
                      CAST(len(regexp_extract_all(tx, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'))
                         + len(regexp_extract_all(tx, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b'))
                         + len(regexp_extract_all(tx, '\b\d{3}[-.]\d{3}[-.]\d{4}\b')) AS BIGINT) AS n_pii,
                      regexp_replace(
                        regexp_replace(
                          regexp_replace(tx,
                            '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
                          '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g'),
                        '\b\d{3}[-.]\d{3}[-.]\d{4}\b', '<PHONE>', 'g') AS redacted
               FROM t"""))

  /** Robust outlier detection: per-type MAD flags — |x − median| >
    * 3·1.4826·MAD (the σ-consistent median-absolute-deviation rule) —
    * the heavy-tail-safe complement of `events_zscore_outliers`, whose
    * mean/stddev a single extreme value drags. Medians go through the
    * exact `percentile` ↔ `quantile_cont` pair already proven
    * bit-identical by `value_percentiles`; the threshold compare runs on
    * raw doubles (identical operands → identical IEEE product on both
    * engines), rounding only the REPORTED med/mad.
    *
    * 100 TB shape: two keyed aggregates over the fact table (median,
    * then MAD of deviations) with the #types-sized stats frames riding
    * back on broadcasts — the fact table shuffles never; exact
    * percentiles sort within small per-type groups, approx_percentile
    * is the heavy-group drop-in (same note as `value_percentiles`).
    */
  val madOutliers: CatalogEntry = CatalogEntry(
    "events_mad_outliers",
    (s, d) => {
      val ev = Tables.events(s, d).select(col("event_type"), col("value"))
      val med = ev.groupBy("event_type").agg(expr("percentile(value, 0.5)").as("med"))
      val dev = ev.join(broadcast(med), Seq("event_type"))
        .select(col("event_type"), abs(col("value") - col("med")).as("adev"), col("med"))
      val mad = dev.groupBy("event_type").agg(expr("percentile(adev, 0.5)").as("mad"))
      dev.join(broadcast(mad), Seq("event_type"))
        .groupBy("event_type")
        .agg(round(max("med"), 6).as("med"), round(max("mad"), 6).as("mad"),
          count(lit(1)).as("n"),
          sum(when(col("adev") > lit(4.4478) * col("mad"), 1L).otherwise(0L)).as("n_outliers"))
    },
    Some("""WITH med AS (SELECT event_type, quantile_cont(value, 0.5) AS med
                         FROM events GROUP BY 1),
                 dev AS (SELECT e.event_type, ABS(e.value - m.med) AS adev, m.med
                         FROM events e JOIN med m USING (event_type)),
                 mad AS (SELECT event_type, quantile_cont(adev, 0.5) AS mad
                         FROM dev GROUP BY 1)
            SELECT d.event_type, ROUND(MAX(d.med), 6) AS med, ROUND(MAX(mad.mad), 6) AS mad,
                   COUNT(*) AS n,
                   CAST(SUM(CASE WHEN d.adev > CAST(4.4478 AS DOUBLE) * mad.mad
                                 THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
            FROM dev d JOIN mad USING (event_type)
            GROUP BY d.event_type"""))

  /** Two-sided 5 % trimmed mean per event type (the classical robust
    * location estimate; Tukey & McLaughlin 1963) — drop each type's
    * k = ⌊n/20⌋ smallest and largest values by EXACT rank, average the
    * rest. Completes the robust-statistics family: `events_zscore_*`
    * assumes normality, `events_mad_outliers` flags points, the trimmed
    * mean is the level estimate that survives the heavy tails both
    * detect (a mean the top 5 % can't drag is what a revenue dashboard
    * should chart).
    *
    * Exactness: ranks are bit-identical to the oracle's keyed
    * row_number (total order (value, event_id); null values excluded in
    * BOTH engines — Spark sorts nulls first, DuckDB last); the trim
    * boundary n div 20 is integer in both; the kept-set mean rides the
    * [[Exact]] decimal-sum device, ROUND 6.
    *
    * Scale device: ranks come from [[graft.operators.GlobalRank
    * .withRankPerKey]] — THE near-unique-order-key case ((value,
    * event_id): one rank per row, no grid collapse exists) where a
    * keyed window would sort the WHOLE corpus in #types tasks (5 here —
    * the fat-key pathology at its worst), while the range shuffle keeps
    * the skew ceiling at a range bucket. Per-type counts ride a
    * broadcast back; the keep-filter and decimal sums map-combine.
    */
  val trimmedMean: CatalogEntry = CatalogEntry(
    "events_trimmed_mean",
    (s, d) => {
      // event_type IS NOT NULL in BOTH engines (the markovStationary
      // convention, r18 ADVICE): a NULL group would otherwise be
      // silently dropped by the null-unsafe equi-join below while the
      // oracle's GROUP BY keeps it. Latent on this testdata (no NULL
      // types) — pinned so the contract cannot flutter if data changes.
      val ev = Tables.events(s, d)
        .select(col("event_type"), col("event_id"), col("value"))
        .filter(col("value").isNotNull && col("event_type").isNotNull)
      val ranked = graft.operators.GlobalRank.withRankPerKey(
        ev, Seq("event_type"), Seq(col("value"), col("event_id")),
        numPartitions = graft.operators.GlobalRank.sessionPartitions(ev),
        rankCol = "r")
      // `totals` re-reads the pruned (event_type, value) columns rather
      // than caching `ev`: a two-column map-combined re-scan is the
      // documented "scan twice, shuffle never" shape (zscore family) —
      // cheaper than pinning a corpus-sized cache at scale.
      val totals = ev.groupBy("event_type").agg(count(lit(1)).as("n"))
      ranked.join(broadcast(totals), Seq("event_type"))
        .filter(col("r") > expr("n div 20") &&
          col("r") <= col("n") - expr("n div 20"))
        .groupBy("event_type")
        .agg(max("n").as("n"),
          expr("max(n div 20)").as("k_trimmed_each_side"),
          count(lit(1)).as("n_kept"),
          round(Exact.davg(col("value")), 6).as("trimmed_mean"))
        .orderBy("event_type")
    },
    Some(s"""WITH ranked AS (SELECT event_type, value,
                                    row_number() OVER (PARTITION BY event_type
                                      ORDER BY value, event_id) AS r,
                                    COUNT(*) OVER (PARTITION BY event_type) AS n
                             FROM events
                             WHERE value IS NOT NULL AND event_type IS NOT NULL),
                  kept AS (SELECT event_type, value, n FROM ranked
                           WHERE r > n // 20 AND r <= n - (n // 20))
             SELECT event_type, CAST(MAX(n) AS BIGINT) AS n,
                    CAST(MAX(n // 20) AS BIGINT) AS k_trimmed_each_side,
                    CAST(COUNT(*) AS BIGINT) AS n_kept,
                    ROUND(${Exact.sqlAvg("value")}, 6) AS trimmed_mean
             FROM kept GROUP BY event_type ORDER BY event_type"""))

  /** Event-time disorder profile: per type, how out-of-order the stream
    * actually arrives — disorder of an event = running-max(event time in
    * ARRIVAL order, per user) − its own event time. This is the
    * statistic that SIZES a watermark: `max_disorder_s` is the delay
    * that loses nothing, `p99_disorder_s` the delay that loses 1% —
    * read against `streamingDedup`/windowed aggs' `watermarkDelay` knob.
    * Arrival order is `event_id` (the ingest sequence the batch table
    * preserves); a live pipeline would stamp arrival time at the source.
    *
    * 100 TB shape: ONE user-partitioned window (running max rides the
    * per-user sort, never a global order) + one #types-key aggregate.
    * Exact p99 sorts per-type deviations; approx_percentile is the
    * heavy-group drop-in (same note as `value_percentiles`).
    */
  val disorderProfile: CatalogEntry = CatalogEntry(
    "events_disorder_profile",
    (s, d) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id").orderBy("event_id")
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
      Tables.events(s, d)
        .select(col("event_type"), col("user_id"), col("event_id"),
          col("ts").cast("long").as("ts_s"))
        .withColumn("disorder_s", max("ts_s").over(w) - col("ts_s"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"),
          sum(when(col("disorder_s") > 0, 1L).otherwise(0L)).as("n_out_of_order"),
          max("disorder_s").as("max_disorder_s"),
          round(expr("percentile(disorder_s, 0.99)"), 6).as("p99_disorder_s"))
    },
    Some("""SELECT event_type, COUNT(*) AS n,
                   CAST(SUM(CASE WHEN disorder_s > 0 THEN 1 ELSE 0 END) AS BIGINT)
                     AS n_out_of_order,
                   MAX(disorder_s) AS max_disorder_s,
                   ROUND(quantile_cont(disorder_s, 0.99), 6) AS p99_disorder_s
            FROM (SELECT event_type,
                         MAX(CAST(FLOOR(epoch(ts)) AS BIGINT))
                           OVER (PARTITION BY user_id ORDER BY event_id
                                 ROWS UNBOUNDED PRECEDING)
                           - CAST(FLOOR(epoch(ts)) AS BIGINT) AS disorder_s
                  FROM events)
            GROUP BY event_type"""))

  /** SCD2 interval build: the change stream folded into slowly-changing-
    * dimension rows — per user, each event opens a validity interval
    * [valid_from, valid_to) closed by the NEXT event (epoch seconds;
    * NULL = current row). The companion statistic is the time-weighted
    * value mean per user — Σ value·dt / Σ dt over the CLOSED intervals,
    * the correct average of a step function (the plain row mean
    * over-weights rapid flappers). Both stay integer/decimal-exact: dt
    * is a long, value·dt sums in DECIMAL, ONE double division at the
    * end.
    *
    * 100 TB shape: one user-keyed window (lead rides the per-user sort)
    * and, for the summary, one aggregate over the same shuffle — the
    * interval table itself is the operator's output contract
    * (`events_latest_state` is its "current rows only" projection).
    * Ties (same user, same second) are ordered by event_id — the same
    * total-order discipline as `user_running_total`.
    */
  val scd2Intervals: CatalogEntry = CatalogEntry(
    "events_scd2_intervals",
    (s, d) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id").orderBy("ts_s", "event_id")
      Tables.events(s, d)
        .select(col("user_id"), col("event_id"), col("event_type"),
          col("value"), col("ts").cast("long").as("ts_s"))
        .withColumn("valid_to", lead("ts_s", 1).over(w))
        .select(col("user_id"), col("event_id"), col("event_type"),
          col("ts_s").as("valid_from"), col("valid_to"),
          (coalesce(col("valid_to"), col("ts_s")) - col("ts_s")).as("duration_s"))
    },
    Some("""SELECT user_id, event_id, event_type,
                   tss AS valid_from, valid_to,
                   COALESCE(valid_to, tss) - tss AS duration_s
            FROM (SELECT user_id, event_id, event_type,
                         CAST(FLOOR(epoch(ts)) AS BIGINT) AS tss,
                         lead(CAST(FLOOR(epoch(ts)) AS BIGINT), 1)
                           OVER (PARTITION BY user_id
                                 ORDER BY CAST(FLOOR(epoch(ts)) AS BIGINT), event_id)
                           AS valid_to
                  FROM events)"""))

  /** Time-weighted value mean per user over [[scd2Intervals]]' closed
    * intervals — see that entry's scaladoc for the exactness argument.
    */
  val timeWeightedValue: CatalogEntry = CatalogEntry(
    "user_time_weighted_value",
    (s, d) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id").orderBy("ts_s", "event_id")
      Tables.events(s, d)
        .select(col("user_id"), col("event_id"), col("value"),
          col("ts").cast("long").as("ts_s"))
        .withColumn("dt", lead("ts_s", 1).over(w) - col("ts_s"))
        .filter(col("dt").isNotNull)
        .groupBy("user_id")
        .agg(sum("dt").as("total_s"),
          sum(col("value").cast(org.apache.spark.sql.types.DecimalType(28, 6)) * col("dt"))
            .cast("double").as("vdt"))
        .filter(col("total_s") > 0)
        .select(col("user_id"), col("total_s"),
          round(col("vdt") / col("total_s"), 6).as("tw_mean"))
    },
    Some(s"""SELECT user_id, CAST(SUM(dt) AS BIGINT) AS total_s,
                    ROUND(${Exact.sqlToDouble("SUM(CAST(value AS DECIMAL(28,6)) * dt)")}
                          / CAST(SUM(dt) AS BIGINT), 6) AS tw_mean
             FROM (SELECT user_id, value,
                          lead(CAST(FLOOR(epoch(ts)) AS BIGINT), 1)
                            OVER (PARTITION BY user_id
                                  ORDER BY CAST(FLOOR(epoch(ts)) AS BIGINT), event_id)
                            - CAST(FLOOR(epoch(ts)) AS BIGINT) AS dt
                   FROM events)
             WHERE dt IS NOT NULL
             GROUP BY user_id
             HAVING SUM(dt) > 0"""))

  /** Per-type linear trend + correlation of value against event time —
    * the drift statistic of a monitoring layer (is this metric creeping
    * up?), computed as ONE tiny-key moment aggregate: n, Σx, Σx², Σy,
    * Σy², Σxy per group in a single scan with map-side combine, then
    * slope/intercept/Pearson-r derived per group. At 100 TB this is a
    * one-shuffle query whose reduce side is #event-types rows — the
    * textbook distributed-regression shape (moments commute, the closed
    * form does not need the data twice).
    *
    * Determinism: x is epoch seconds re-based to 2024-01-01 (exact
    * BIGINT); every moment is DECIMAL-exact (products of scale-0 and
    * scale-4 decimals are exact, sums associative); the double phase
    * derives cov/var/slope/r with the IDENTICAL expression shape in both
    * engines — identical exact inputs + identical IEEE op sequence
    * (sqrt is correctly rounded by spec) = identical bits, then ROUND 6.
    */
  /** Classical additive seasonal decomposition of the per-type hourly
    * series — trend (centered 25-hour moving average over the DENSE
    * hourly grid), seasonal (mean detrended value per hour-of-day), and
    * remainder, the textbook `decompose()` every monitoring stack runs
    * before alerting on a metric (the trend/seasonality-aware sibling of
    * [[cusumBreach]] and `events_dow_seasonality`).
    *
    * Exactness (the bigram-fluency integer-lattice discipline): hourly
    * sums ride DECIMAL cents (×10⁴); the trend stays the exact rational
    * `Σwindow/25·10⁴` (numerator only — never divided mid-pipeline);
    * detrended values ride the ×25 lattice (`25c − Σ`), seasonal means
    * the ×25·cnt lattice, so remainder = `(d25·cnt − Σd25)/(25·cnt·10⁴)`
    * is ONE closing correctly-rounded IEEE division per output value —
    * identical bits in both engines, no partition-order float sums.
    * Edge hours without a full centered window are dropped (both
    * engines state `COUNT(*) OVER == 25`).
    *
    * Scale shape: one (type, hour) aggregate, a per-type grid join
    * (resample pattern), one 25-row window keyed by type — re-keyable by
    * (type, chunk) with tail context exactly as `events_ewma_salted`
    * demonstrates if a type serializes — and one (type, hour-of-day)
    * aggregate joined back broadcast-small.
    */
  val seasonalDecompose: CatalogEntry = CatalogEntry(
    "events_seasonal_decompose",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      import org.apache.spark.sql.types.DecimalType
      val hc = Tables.events(s, d)
        .select(col("event_type"), date_trunc("hour", col("ts")).as("h"),
          col("value").cast(DecimalType(18, 4)).as("v"))
        .groupBy("event_type", "h")
        .agg((sum(col("v")) * 10000).cast("long").as("c"))
      // The grid frame derives from hc, so joining on grid("event_type")
      // === hc("event_type") resolves both sides to the SAME attribute
      // (Spark's "trivially true equals predicate" WARN). House style:
      // rename the derived side so the join condition names two distinct
      // attributes.
      val grid = hc.groupBy("event_type")
        .agg(min("h").as("h0"), max("h").as("h1"))
        .select(col("event_type").as("gtype"),
          explode(expr("sequence(h0, h1, interval 1 hour)")).as("g"))
      val dg = grid.join(hc,
          col("gtype") === hc("event_type") && col("g") === col("h"), "left")
        .select(col("gtype").as("event_type"), col("g"),
          coalesce(col("c"), lit(0L)).as("c"))
      val wnd = Window.partitionBy("event_type").orderBy("g").rowsBetween(-12, 12)
      val dt = dg
        .select(col("event_type"), col("g"), col("c"),
          sum("c").over(wnd).as("tsum"), count(lit(1)).over(wnd).as("twn"))
        .filter(col("twn") === 25)
        .withColumn("d25", lit(25L) * col("c") - col("tsum"))
      val ssn = dt.groupBy(col("event_type").as("stype"), hour(col("g")).as("hod"))
        .agg(sum("d25").as("ssum"), count(lit(1)).as("scnt"))
      dt.join(broadcast(ssn),
          col("event_type") === col("stype") && hour(col("g")) === col("hod"))
        .select(col("event_type"), col("g").as("hour"),
          round(col("tsum").cast("double") / lit(250000.0), 6).as("trend"),
          round(col("ssum").cast("double") / (col("scnt") * lit(250000.0)), 6)
            .as("seasonal"),
          round((col("d25") * col("scnt") - col("ssum")).cast("double")
            / (col("scnt") * lit(250000.0)), 6).as("remainder"))
        .orderBy("event_type", "hour")
    },
    Some(
      raw"""WITH hc AS (SELECT event_type, date_trunc('hour', ts) AS h,
                               CAST(SUM(CAST(value AS DECIMAL(18,4))) * 10000 AS BIGINT) AS c
                        FROM events GROUP BY 1, 2),
            bounds AS (SELECT event_type, MIN(h) AS h0, MAX(h) AS h1 FROM hc GROUP BY 1),
            grid AS (SELECT event_type, unnest(generate_series(h0, h1, INTERVAL '1 hour')) AS g
                     FROM bounds),
            dg AS (SELECT g.event_type, g.g, COALESCE(hc.c, 0) AS c
                   FROM grid g LEFT JOIN hc ON hc.event_type = g.event_type AND hc.h = g.g),
            tw AS (SELECT event_type, g, c,
                          CAST(SUM(c) OVER wnd AS BIGINT) AS tsum,
                          COUNT(*) OVER wnd AS twn
                   FROM dg WINDOW wnd AS (PARTITION BY event_type ORDER BY g
                                          ROWS BETWEEN 12 PRECEDING AND 12 FOLLOWING)),
            dt AS (SELECT event_type, g, CAST(25 * c - tsum AS BIGINT) AS d25, tsum
                   FROM tw WHERE twn = 25),
            ssn AS (SELECT event_type, EXTRACT(hour FROM g) AS hod,
                           CAST(SUM(d25) AS BIGINT) AS ssum, COUNT(*) AS scnt
                    FROM dt GROUP BY 1, 2)
          SELECT dt.event_type, dt.g AS hour,
                 ROUND(CAST(dt.tsum AS DOUBLE) / CAST(250000 AS DOUBLE), 6) AS trend,
                 ROUND(CAST(s.ssum AS DOUBLE) / (s.scnt * CAST(250000 AS DOUBLE)), 6)
                   AS seasonal,
                 ROUND(CAST(dt.d25 * s.scnt - s.ssum AS DOUBLE)
                       / (s.scnt * CAST(250000 AS DOUBLE)), 6) AS remainder
          FROM dt JOIN ssn s ON s.event_type = dt.event_type
                            AND s.hod = EXTRACT(hour FROM dt.g)
          ORDER BY dt.event_type, hour"""))

  val eventsValueTrend: CatalogEntry = CatalogEntry(
    "events_value_trend",
    (s, d) => Transforms.trendDerive(Transforms.trendMoments(Tables.events(s, d))),
    Some(s"""WITH e AS (SELECT event_type,
                               CAST(FLOOR(epoch(ts)) AS BIGINT) - 1704067200 AS x,
                               value
                        FROM events),
                 m AS (SELECT event_type, COUNT(*) AS n,
                              ${Exact.sqlToDouble("SUM(CAST(x AS DECIMAL(38,0)))")} AS sx,
                              ${Exact.sqlToDouble("SUM(CAST(x * x AS DECIMAL(38,0)))")} AS sxx,
                              ${Exact.sqlSum("value", 18, 4)} AS sy,
                              ${Exact.sqlToDouble(
                                "SUM(CAST(CAST(value AS DECIMAL(18,4)) * CAST(value AS DECIMAL(18,4)) AS DECIMAL(38,8)))")} AS syy,
                              ${Exact.sqlToDouble(
                                "SUM(CAST(CAST(x AS DECIMAL(18,0)) * CAST(value AS DECIMAL(18,4)) AS DECIMAL(38,4)))")} AS sxy
                       FROM e GROUP BY event_type)
             SELECT event_type, n,
                    ROUND((CAST(n AS DOUBLE) * sxy - sx * sy) / (CAST(n AS DOUBLE) * sxx - sx * sx), 6) AS slope,
                    ROUND((sy - ((CAST(n AS DOUBLE) * sxy - sx * sy) / (CAST(n AS DOUBLE) * sxx - sx * sx)) * sx) / CAST(n AS DOUBLE), 6) AS intercept,
                    ROUND((CAST(n AS DOUBLE) * sxy - sx * sy)
                          / (SQRT(CAST(n AS DOUBLE) * sxx - sx * sx) * SQRT(CAST(n AS DOUBLE) * syy - sy * sy)), 6) AS corr
             FROM m"""))

  /** Theil–Sen robust trend per event type (Theil 1950; Sen 1968): the
    * MEDIAN of all pairwise slopes over the daily-mean series — the
    * robust-statistics complement to [[eventsValueTrend]]'s OLS fit
    * (one wild day moves an OLS slope arbitrarily; the pairwise-slope
    * median has a 29.3% breakdown point) and to `events_mad_outliers`
    * on the dispersion side.
    *
    * 100 TB shape — the two-stage device is the whole point: the
    * corpus-linear work is ONE map-combined (type, day) aggregate; the
    * O(n²) pairwise stage then runs on the #days-bounded daily series
    * (time-bounded, not corpus-bounded — 10× the data is the same ~90
    * points per type), so the quadratic never touches raw rows. Median
    * via per-type rank window (partitioned, never global) + the
    * middle-position average.
    *
    * Determinism: daily means are decimal-exact sums over exact counts
    * (one correctly-rounded division per day — identical bits both
    * engines); each pairwise slope is one subtraction + one division of
    * identical doubles; the middle-rank average sums ≤ 2 doubles (IEEE
    * addition is commutative, so shuffle order is irrelevant), rounded
    * once.
    */
  /** The pairwise-median machinery over a (event_type, day, v) daily
    * series — factored so the suite can pin the breakdown property on a
    * hand-built series with a planted wild outlier. */
  private[graft] def theilSenFrom(daily: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val pairs = daily.as("a").join(daily.as("b"),
        col("a.event_type") === col("b.event_type") && col("a.day") < col("b.day"))
      .select(col("a.event_type").as("event_type"),
        ((col("b.v") - col("a.v")) / (col("b.day") - col("a.day"))).as("slope"))
    val ranked = pairs.withColumn("rn",
      row_number().over(Window.partitionBy("event_type").orderBy("slope")))
    val np = pairs.groupBy("event_type").agg(count(lit(1)).as("n_pairs"))
    val nd = daily.groupBy("event_type").agg(count(lit(1)).as("n_days"))
    ranked.join(broadcast(np), "event_type")
      .filter(col("rn") === expr("(n_pairs + 1) div 2") ||
        col("rn") === expr("(n_pairs + 2) div 2"))
      .groupBy("event_type")
      .agg(first("n_pairs").as("n_pairs"),
        round(avg("slope"), 6).as("theil_sen_slope"))
      .join(broadcast(nd), "event_type")
      .select(col("event_type"), col("n_days"), col("n_pairs"),
        col("theil_sen_slope"))
      .orderBy("event_type")
  }

  /** The (event_type, day) daily-mean aggregate feeding [[theilSenFrom]]
    * — the entry's ONLY corpus-touching stage, factored so the streaming
    * form (StreamingQueries.streamingDailyMeans) replays the identical
    * arithmetic: the decimal sum is exact/associative and the count
    * exact, so any arrival order or batch split drains to the same
    * doubles and the downstream pairwise-median slope is bit-identical
    * (StreamingSpec pins it against this entry). */
  private[graft] def dailyMeans(events: DataFrame): DataFrame =
    events
      .select(col("event_type"), expr("unix_timestamp(ts) div 86400").as("day"),
        col("value"))
      .groupBy("event_type", "day")
      .agg((Exact.dsum(col("value"), 18, 4) / count(lit(1))).as("v"))

  val theilSen: CatalogEntry = CatalogEntry(
    "events_theil_sen",
    // cacheOnce (r19): `daily` feeds FOUR plan branches (both pair
    // legs, n_pairs, n_days) — uncached, the corpus-linear (type, day)
    // aggregate re-scanned events FIVE times (r19 plan audit: 5×
    // `Scan parquet` of events with non-empty schema). The cached frame
    // is #types × #days rows — model-sized forever; harness teardown
    // drops it per entry.
    (s, d) => theilSenFrom(dailyMeans(Tables.events(s, d)).cacheOnce()),
    Some(s"""WITH daily AS (SELECT event_type,
                                   CAST(FLOOR(epoch(ts)) AS BIGINT) // 86400 AS day,
                                   ${Exact.sqlSum("value", 18, 4)} / COUNT(*) AS v
                            FROM events GROUP BY 1, 2),
                 pr AS (SELECT a.event_type, (b.v - a.v) / (b.day - a.day) AS slope
                        FROM daily a JOIN daily b
                          ON b.event_type = a.event_type AND a.day < b.day),
                 rk AS (SELECT event_type, slope,
                               row_number() OVER (PARTITION BY event_type
                                                  ORDER BY slope) AS rn,
                               COUNT(*) OVER (PARTITION BY event_type) AS np
                        FROM pr),
                 nd AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_days
                        FROM daily GROUP BY 1)
             SELECT rk.event_type, nd.n_days, CAST(MAX(np) AS BIGINT) AS n_pairs,
                    ROUND(AVG(slope), 6) AS theil_sen_slope
             FROM rk JOIN nd ON nd.event_type = rk.event_type
             WHERE rn = (np + 1) // 2 OR rn = (np + 2) // 2
             GROUP BY rk.event_type, nd.n_days
             ORDER BY rk.event_type"""))

  /** The (event_type, day) daily value-sum series on the ×10⁴ integer
    * lattice ([[seasonalDecompose]]'s cents device) — the ONE
    * corpus-touching aggregate [[seriesCorrFrom]] runs on. Exact BIGINT
    * cells: linear, mergeable, so the series also maintains live as
    * streamed keyed state (StreamingSpec replays the correlation table
    * from the drained frame bit-for-bit). */
  private[graft] def dailyCents(events: DataFrame): DataFrame = events
    .select(col("event_type"), expr("unix_timestamp(ts) div 86400").as("day"),
      col("value").cast(org.apache.spark.sql.types.DecimalType(18, 4)).as("v"))
    .groupBy("event_type", "day")
    .agg((sum(col("v")) * 10000).cast("long").as("c"))

  /** Pairwise Pearson correlation from a MATERIALIZED (type, day, c)
    * daily-series frame — corpus-independent: every input is
    * series-sized (≤ #types × #days rows). Moments ride DECIMAL(38,0)
    * (exact, associative — the c products reach ~10²¹ at sf0.1, past
    * BIGINT); the derive phase converts each exact moment combination
    * to a correctly-rounded double and applies the IDENTICAL IEEE
    * expression shape in both engines (num / (√va·√vb), one ROUND 6) —
    * the [[eventsValueTrend]] determinism argument, per pair. Constant
    * series (zero variance) report null rather than a NaN division. */
  private[graft] def seriesCorrFrom(daily: DataFrame): DataFrame = {
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    val m = daily.as("a").join(daily.as("b"),
        col("a.day") === col("b.day") &&
          col("a.event_type") < col("b.event_type"))
      .select(col("a.event_type").as("type_a"), col("b.event_type").as("type_b"),
        col("a.c").cast(dec).as("x"), col("b.c").cast(dec).as("y"))
      .groupBy("type_a", "type_b")
      .agg(count(lit(1)).as("n_days"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("y") * col("y")).as("syy"),
        sum(col("x") * col("y")).as("sxy"))
    val va = (col("n_days") * col("sxx") - col("sx") * col("sx")).cast("double")
    val vb = (col("n_days") * col("syy") - col("sy") * col("sy")).cast("double")
    val num = (col("n_days") * col("sxy") - col("sx") * col("sy")).cast("double")
    m.filter(col("n_days") >= 2)
      .select(col("type_a"), col("type_b"), col("n_days"),
        when(va > 0.0 && vb > 0.0,
          round(num / (sqrt(va) * sqrt(vb)), 6)).as("pearson_r"))
      .orderBy("type_a", "type_b")
  }

  /** Cross-series similarity: pairwise Pearson correlation between the
    * event types' daily value-sum series — "which metrics move
    * together", the time-series similarity-search primitive (cf. "Time
    * Series Similarity Search for Streaming Data in Distributed
    * Systems", EDBT 2019) at the series level, and the cross-series
    * sibling of [[eventsValueTrend]]'s within-series moments.
    *
    * 100 TB shape: the corpus collapses to the (type, day) cents series
    * in ONE map-combined aggregate (the [[dailyMeans]] /
    * [[seasonalDecompose]] pattern); the all-pairs stage then runs
    * entirely over that ≤ #types×#days frame — the day-keyed self-join,
    * the moment aggregate, and the derive are all corpus-independent,
    * so "compare every pair of metrics" costs one scan no matter how
    * many trillion events feed the series. Wide type universes shard
    * the pair space by (type_a bucket, type_b bucket) — the standard
    * blocked all-pairs device (`emb_gram_matrix`'s argument) — before
    * the moment aggregate; at 5 types the plain join IS the plan.
    *
    * Determinism: daily cells are exact BIGINT cents; pair moments are
    * exact DECIMAL(38,0); each output value is derived from exact
    * inputs through one fixed IEEE expression (correctly-rounded casts,
    * sqrt correctly rounded by spec, one closing division) — identical
    * bits in both engines, then ROUND 6.
    */
  val seriesCorrelation: CatalogEntry = CatalogEntry(
    "events_series_correlation",
    (s, d) => {
      val daily = dailyCents(Tables.events(s, d)).cacheOnce()
      val out = seriesCorrFrom(daily).localCheckpoint()
      daily.unpersist(blocking = false)
      out
    },
    Some(
      raw"""WITH daily AS (SELECT event_type,
                                  CAST(FLOOR(epoch(ts)) AS BIGINT) // 86400 AS day,
                                  CAST(SUM(CAST(value AS DECIMAL(18,4))) * 10000 AS BIGINT) AS c
                           FROM events GROUP BY 1, 2),
            m AS (SELECT a.event_type AS type_a, b.event_type AS type_b,
                         CAST(COUNT(*) AS BIGINT) AS n_days,
                         SUM(CAST(a.c AS DECIMAL(38,0))) AS sx,
                         SUM(CAST(b.c AS DECIMAL(38,0))) AS sy,
                         SUM(CAST(a.c AS DECIMAL(38,0)) * CAST(a.c AS DECIMAL(38,0))) AS sxx,
                         SUM(CAST(b.c AS DECIMAL(38,0)) * CAST(b.c AS DECIMAL(38,0))) AS syy,
                         SUM(CAST(a.c AS DECIMAL(38,0)) * CAST(b.c AS DECIMAL(38,0))) AS sxy
                  FROM daily a JOIN daily b
                    ON b.day = a.day AND a.event_type < b.event_type
                  GROUP BY 1, 2)
          SELECT type_a, type_b, n_days,
                 CASE WHEN ${Exact.sqlToDouble("n_days * sxx - sx * sx")} > 0
                       AND ${Exact.sqlToDouble("n_days * syy - sy * sy")} > 0
                      THEN ROUND(${Exact.sqlToDouble("n_days * sxy - sx * sy")}
                                 / (sqrt(${Exact.sqlToDouble("n_days * sxx - sx * sx")})
                                    * sqrt(${Exact.sqlToDouble("n_days * syy - sy * sy")})), 6)
                 END AS pearson_r
          FROM m WHERE n_days >= 2
          ORDER BY type_a, type_b"""))

  /** Holt's linear-trend recursion (Holt 1957; Hyndman & Athanasopoulos,
    * FPP3 §8.2) over a (type, day, cents) daily frame — level + trend
    * state per series with α = β = 1/2, plus the one-step-ahead forecast
    * and RMSE. Shared by the batch entry and the StreamingSpec replay of
    * the drained [[dailyCents]] state.
    *
    * Cross-engine determinism: the recursion is a LEFT FOLD over the
    * day-ordered cents values — l₁ = y₁, b₁ = 0, then
    * lₜ = ½·yₜ + ½·(l + b), bₜ = ½·(lₜ − l) + ½·b, sse += (yₜ − (l+b))².
    * Inputs are exact BIGINT cents (exact doubles), the α literal "0.5"
    * halves exactly in binary, and both engines evaluate the IDENTICAL
    * expression tree element-by-element in the same order (Spark
    * `aggregate`, DuckDB `list_reduce` — the [[labelCentroids]] ordered-
    * fold device carrying a struct state), so every intermediate is
    * bit-identical; the closing derives (÷10⁴ rescale, one sqrt —
    * correctly rounded by IEEE — one division) are one fixed expression
    * shape each, then ROUND 6.
    */
  private[graft] def holtFrom(daily: DataFrame): DataFrame = {
    val holtSt =
      """aggregate(
           slice(ys, 2, size(ys) - 1),
           named_struct('l', ys[0], 'b', CAST(0.0 AS DOUBLE), 'sse', CAST(0.0 AS DOUBLE)),
           (acc, y) -> named_struct(
             'l', 0.5 * y + 0.5 * (acc.l + acc.b),
             'b', 0.5 * ((0.5 * y + 0.5 * (acc.l + acc.b)) - acc.l) + 0.5 * acc.b,
             'sse', acc.sse + (y - (acc.l + acc.b)) * (y - (acc.l + acc.b))))"""
    daily
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_days"),
        expr("transform(array_sort(collect_list(struct(day, c))), x -> CAST(x.c AS DOUBLE))")
          .as("ys"))
      .filter(col("n_days") >= 2)
      .select(col("event_type"), col("n_days"), expr(holtSt).as("st"))
      .select(col("event_type"), col("n_days"),
        round(col("st.l") / 10000.0, 6).as("level"),
        round(col("st.b") / 10000.0, 6).as("trend"),
        round((col("st.l") + col("st.b")) / 10000.0, 6).as("forecast_next"),
        round(sqrt(col("st.sse") / (col("n_days") - 1)) / 10000.0, 6).as("rmse_1step"))
      .orderBy("event_type")
  }

  /** Per-type trend-aware smoothing of the daily value series — Holt's
    * linear method, the member of the exponential-smoothing family the
    * catalog was missing: [[ScaleCatalog.eventsEwma]] tracks the LEVEL of
    * the last 16 events, [[seasonalDecompose]] removes a day-of-week
    * shape, this one carries (level, trend) state so a steadily growing
    * metric forecasts ahead instead of lagging behind, and its one-step
    * RMSE prices how predictable each series is.
    *
    * 100 TB shape: the corpus collapses to the (type, day) cents lattice
    * in ONE map-combined aggregate (the [[dailyCents]] device, linear and
    * mergeable — the same frame streams as live keyed state); the
    * recursion then runs per type over a ≤ #days array — series-sized,
    * corpus-independent, embarrassingly parallel across types. The fold
    * is inherently sequential IN t — that is the algorithm, not a plan
    * defect; what matters at scale is that the sequential part never
    * touches the corpus (cf. the same argument for [[theilSen]]'s
    * pair stage).
    */
  val holtTrend: CatalogEntry = CatalogEntry(
    "events_holt_trend",
    (s, d) => holtFrom(dailyCents(Tables.events(s, d))),
    // Oracle note — the fold is a RECURSIVE CTE, not list_reduce: DuckDB
    // 1.0's list_reduce with a STRUCT accumulator is not a pure fold
    // (measured: fields rebind mid-step — {'a': acc.a+1, 'b': acc.a}
    // over two steps from {0, 99} yields b = 2, the sequential value,
    // and other shapes match neither pure nor sequential). A recursive
    // CTE carries l/b/sse as separate columns with standard simultaneous
    // UPDATE semantics — bit-identical to Spark's (pure) aggregate fold.
    Some(
      raw"""WITH RECURSIVE daily AS (SELECT event_type,
                                  CAST(FLOOR(epoch(ts)) AS BIGINT) // 86400 AS day,
                                  CAST(SUM(CAST(value AS DECIMAL(18,4))) * 10000 AS BIGINT) AS c
                           FROM events GROUP BY 1, 2),
            ser AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_days,
                           list(CAST(c AS DOUBLE) ORDER BY day) AS ys
                    FROM daily GROUP BY 1),
            rec AS (
              SELECT event_type, n_days, ys, 1 AS t, ys[1] AS l,
                     CAST(0.0 AS DOUBLE) AS b, CAST(0.0 AS DOUBLE) AS sse
              FROM ser WHERE n_days >= 2
              UNION ALL
              SELECT event_type, n_days, ys, t + 1,
                     0.5 * ys[t + 1] + 0.5 * (l + b),
                     0.5 * ((0.5 * ys[t + 1] + 0.5 * (l + b)) - l) + 0.5 * b,
                     sse + (ys[t + 1] - (l + b)) * (ys[t + 1] - (l + b))
              FROM rec WHERE t < n_days)
            SELECT event_type, n_days,
                   ROUND(l / 10000.0, 6) AS level,
                   ROUND(b / 10000.0, 6) AS trend,
                   ROUND((l + b) / 10000.0, 6) AS forecast_next,
                   ROUND(sqrt(sse / (n_days - 1)) / 10000.0, 6) AS rmse_1step
            FROM rec WHERE t = n_days ORDER BY event_type"""))

  /** The Page–Hinkley fold over a (type, day, cents) daily frame — the
    * [[holtFrom]] device applied to drift detection, seamed for the
    * spec's drained-state replay. State per step: running sum s (for
    * the mean), the PH statistic u_t = Σᵢ(xᵢ − x̄ᵢ), its running min,
    * and the maximal excursion u_t − min — all four updated from the
    * PREVIOUS state simultaneously (the recursive-CTE semantics both
    * engines share; the u-update expression is repeated VERBATIM in the
    * min/exc fields so every IEEE op sequence is identical). */
  private[graft] def pageHinkleyFrom(daily: DataFrame): DataFrame = {
    val phSt =
      """aggregate(
           slice(ys, 2, size(ys) - 1),
           named_struct('t', CAST(1 AS BIGINT), 's', ys[0],
                        'u', CAST(0.0 AS DOUBLE), 'minu', CAST(0.0 AS DOUBLE),
                        'exc', CAST(0.0 AS DOUBLE)),
           (acc, y) -> named_struct(
             't', acc.t + 1,
             's', acc.s + y,
             'u', acc.u + (y - (acc.s + y) / (acc.t + 1)),
             'minu', LEAST(acc.minu, acc.u + (y - (acc.s + y) / (acc.t + 1))),
             'exc', GREATEST(acc.exc,
               acc.u + (y - (acc.s + y) / (acc.t + 1)) - acc.minu)))"""
    daily
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_days"),
        expr("transform(array_sort(collect_list(struct(day, c))), x -> CAST(x.c AS DOUBLE))")
          .as("ys"))
      .filter(col("n_days") >= 2)
      .select(col("event_type"), col("n_days"), expr(phSt).as("st"))
      .select(col("event_type"), col("n_days"),
        round(col("st.u") / 10000.0, 6).as("ph_final"),
        round(col("st.minu") / 10000.0, 6).as("ph_min"),
        round(col("st.exc") / 10000.0, 6).as("ph_excursion"))
      .orderBy("event_type")
  }

  /** Page–Hinkley change detection per event type (Page 1954; Hinkley
    * 1971; the sequential form surveyed in Gama et al. 2014 §3.1) — the
    * drift-detector family member the catalog was missing:
    * [[ScaleCatalog.eventsEwma]] smooths the level, [[cusumBreach]]
    * accumulates deviations from a FIXED reference, PH accumulates
    * deviations from the RUNNING mean — u_t = Σ(xᵢ − x̄ᵢ) — so a regime
    * shift shows up as u_t rising away from its historical minimum with
    * NO baseline parameter to choose. Reported per series: the final
    * statistic, its running minimum, and the maximal excursion
    * max_t(u_t − min_{i<t} u_i) — the quantity a deployment thresholds
    * (alarm when excursion > λ); the λ knob is left to the reader like
    * the KN MLE step, keeping policy out of the cross-engine compare.
    *
    * Determinism: the fold runs in doubles over the exact cents lattice
    * with ONE expression shape per field, mirrored VERBATIM by the
    * oracle's recursive CTE (the [[holtTrend]] device — DuckDB
    * list_reduce is not a pure fold, measured r16) — bit-identical
    * sequences of IEEE ops in both engines.
    *
    * 100 TB shape: the corpus collapses to the (type, day) cents
    * lattice in ONE map-combined aggregate (the shared [[dailyCents]]
    * frame — the same live keyed state the streaming siblings
    * maintain); the sequential fold never touches the corpus
    * (series-sized, parallel across types — the [[holtTrend]]
    * argument).
    */
  val pageHinkley: CatalogEntry = CatalogEntry(
    "events_page_hinkley",
    (s, d) => pageHinkleyFrom(dailyCents(Tables.events(s, d))),
    Some(
      raw"""WITH RECURSIVE daily AS (SELECT event_type,
                                  CAST(FLOOR(epoch(ts)) AS BIGINT) // 86400 AS day,
                                  CAST(SUM(CAST(value AS DECIMAL(18,4))) * 10000 AS BIGINT) AS c
                           FROM events GROUP BY 1, 2),
            ser AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_days,
                           list(CAST(c AS DOUBLE) ORDER BY day) AS ys
                    FROM daily GROUP BY 1),
            rec AS (
              SELECT event_type, n_days, ys, 1 AS t, ys[1] AS s,
                     CAST(0.0 AS DOUBLE) AS u, CAST(0.0 AS DOUBLE) AS minu,
                     CAST(0.0 AS DOUBLE) AS exc
              FROM ser WHERE n_days >= 2
              UNION ALL
              SELECT event_type, n_days, ys, t + 1, s + ys[t + 1],
                     u + (ys[t + 1] - (s + ys[t + 1]) / (t + 1)),
                     LEAST(minu, u + (ys[t + 1] - (s + ys[t + 1]) / (t + 1))),
                     GREATEST(exc, u + (ys[t + 1] - (s + ys[t + 1]) / (t + 1)) - minu)
              FROM rec WHERE t < n_days)
            SELECT event_type, n_days,
                   ROUND(u / 10000.0, 6) AS ph_final,
                   ROUND(minu / 10000.0, 6) AS ph_min,
                   ROUND(exc / 10000.0, 6) AS ph_excursion
            FROM rec WHERE t = n_days ORDER BY event_type"""))

  /** Prominent-day detection over a (type, day, cents) daily frame —
    * the [[eventsDailyPeaks]] body, seamed for the spec's driver replay.
    * A day is a peak when it strictly exceeds BOTH neighbors (series
    * endpoints never qualify — their missing neighbor makes the
    * comparison NULL, false in both engines) and clears the series
    * lower median by ≥ 20%, as the integer compare 5·c ≥ 6·med.
    */
  private[graft] def peaksFrom(daily: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val wr = Window.partitionBy("event_type").orderBy("c", "day")
    val med = daily
      .withColumn("rn", row_number().over(wr))
      .withColumn("n", count(lit(1)).over(Window.partitionBy("event_type")))
      .filter(col("rn") === expr("(n + 1) div 2"))
      .select(col("event_type"), col("c").as("med"))
    val wd = Window.partitionBy("event_type").orderBy("day")
    daily
      .withColumn("pc", lag("c", 1).over(wd))
      .withColumn("nc", lead("c", 1).over(wd))
      .join(broadcast(med), "event_type")
      .filter(col("c") > col("pc") && col("c") > col("nc") &&
        col("c") * 5L >= col("med") * 6L)
      // med = 0 guard (r16 advice): a qualifying peak over a zero lower
      // median would be Infinity in Spark but NULL in DuckDB (double
      // division by zero) — emit NULL vs_median in both engines on that
      // pathological value distribution.
      .select(col("event_type"), col("day"), col("c").as("cents"),
        when(col("med") =!= 0L,
          round(col("c").cast("double") / col("med"), 6)).as("vs_median"))
      .orderBy("event_type", "day")
  }

  /** Per-type prominent days — the spike review queue next to the
    * smoothers: [[ScaleCatalog.eventsEwma]] tracks the level,
    * [[holtTrend]] the trend, [[cusumBreach]] persistent SHIFTS; this
    * flags the single loud days (release-day traffic, an incident's
    * error burst) that none of those isolate. Raw local maxima are
    * mostly noise on a zipf-ish daily series (9-10 of 30 days qualify
    * at sf0.01); the ≥ 1.2×-lower-median prominence floor — an INTEGER
    * compare, no float policy — cuts that to the 3-6 genuinely loud
    * days per type.
    *
    * Determinism: cents cells are exact BIGINTs; the lower median is a
    * rank-selected CELL VALUE (row_number over (c, day) — never an
    * interpolated average, so it stays integer); neighbors compare as
    * integers; the one double division (vs_median) divides exact
    * BIGINTs, then ROUND 6.
    *
    * 100 TB shape: the corpus collapses to the (type, day) lattice in
    * ONE map-combined aggregate (the shared [[dailyCents]] frame — the
    * same state the streaming siblings maintain live); the median
    * ranking, neighbor lags, and prominence filter are all windows over
    * that ≤ types×days frame — series-sized, corpus-independent.
    */
  val eventsDailyPeaks: CatalogEntry = CatalogEntry(
    "events_daily_peaks",
    (s, d) => {
      val daily = dailyCents(Tables.events(s, d)).cacheOnce()
      val out = peaksFrom(daily).localCheckpoint()
      daily.unpersist(blocking = false)
      out
    },
    Some(
      raw"""WITH daily AS (SELECT event_type,
                                  CAST(FLOOR(epoch(ts)) AS BIGINT) // 86400 AS day,
                                  CAST(SUM(CAST(value AS DECIMAL(18,4))) * 10000 AS BIGINT) AS c
                           FROM events GROUP BY 1, 2),
            med AS (SELECT event_type, c AS med FROM (
                      SELECT event_type, c,
                             row_number() OVER (PARTITION BY event_type ORDER BY c, day) AS rn,
                             COUNT(*) OVER (PARTITION BY event_type) AS n
                      FROM daily) WHERE rn = (n + 1) // 2),
            x AS (SELECT d.event_type, day, c,
                         lag(c) OVER (PARTITION BY d.event_type ORDER BY day) AS pc,
                         lead(c) OVER (PARTITION BY d.event_type ORDER BY day) AS nc,
                         med
                  FROM daily d JOIN med m ON m.event_type = d.event_type)
            SELECT event_type, day, c AS cents,
                   CASE WHEN med <> 0
                        THEN ROUND(CAST(c AS DOUBLE) / med, 6) END AS vs_median
            FROM x WHERE c > pc AND c > nc AND c * 5 >= med * 6
            ORDER BY event_type, day"""))

  /** BM25 relevance top-20 for a fixed three-term query — the retrieval
    * primitive of a RAG/search layer, with the one substitution the
    * engine's no-libm rule forces: the idf factor is the RAW Robertson
    * odds (N − df + ½)/(df + ½) instead of its logarithm. For a FIXED
    * query this is a per-term positive constant, so per-term ranking is
    * identical and the cross-term mix just weights rare terms more
    * steeply than log would — documented surrogate, same family as the
    * PMI and TV-distance substitutions elsewhere in this catalog.
    *
    * Scale shape: the token explode is filtered to the query terms
    * per-row (the scan IS the inverted-index probe — at 100 TB only
    * matching postings reach the shuffle), tf aggregates on (doc, term),
    * df and the corpus length stats are tiny broadcasts, and the top-20
    * is a TakeOrdered — never a global sort materialization. Per-doc
    * scores sum the ≤3 per-term scores in FIXED term order (conditional
    * single-element sums), so no float fold order is left to the engine.
    */
  val bm25TopK: CatalogEntry = CatalogEntry(
    "doc_bm25_topk",
    (s, d) => {
      val Seq(q1, q2, q3) = PipelineCatalog.Bm25Terms
      // k1 = 1.2, b = 0.75. k1+1 is written as the LITERAL 2.2, never
      // computed: 1.2+1.0 in doubles lands exactly on a representability
      // half-way point, so the computed constant need not equal the
      // oracle's parsed literal 2.2.
      val k1 = lit(1.2)
      val k1p1 = lit(2.2)
      val b = lit(0.75)
      // Three plan branches read the tokenized projection (stats, the
      // lens join, tf) — cache it or the corpus is regex-tokenized 3×.
      val docs = documents(s, d)
        .select(col("doc_id"), graft.functions.Text.normTokens(col("text")).as("toks"))
        .cacheOnce()
      val lens = docs.select(col("doc_id"), size(col("toks")).cast("long").as("len"))
      val stats = lens.agg(count(lit(1)).as("nd"), sum(col("len")).as("suml"))
        .select(col("nd"), (col("suml").cast("double") / col("nd")).as("avgl"))
      val tf = docs.select(col("doc_id"), explode(col("toks")).as("tok"))
        .filter(col("tok").isin(q1, q2, q3))
        .groupBy("doc_id", "tok").agg(count(lit(1)).as("tf"))
      val df = tf.groupBy("tok").agg(count(lit(1)).as("df"))
      val term = tf.join(broadcast(df), "tok")
        .join(lens, "doc_id")
        .crossJoin(broadcast(stats))
        .withColumn("idf",
          ((col("nd") - col("df")).cast("double") + lit(0.5))
            / (col("df").cast("double") + lit(0.5)))
        .withColumn("tfn",
          col("tf").cast("double") * k1p1
            / (col("tf").cast("double")
              + k1 * (lit(1.0) - b
                + b * (col("len").cast("double") / col("avgl")))))
        .withColumn("ts", col("idf") * col("tfn"))
      val scored = term.groupBy("doc_id").agg(
        sum(when(col("tok") === q1, col("ts"))).as("s1"),
        sum(when(col("tok") === q2, col("ts"))).as("s2"),
        sum(when(col("tok") === q3, col("ts"))).as("s3"))
        .select(col("doc_id"),
          round(coalesce(col("s1"), lit(0.0)) + coalesce(col("s2"), lit(0.0))
            + coalesce(col("s3"), lit(0.0)), 6).as("score"))
      // Global rank WITHOUT an unpartitioned window (PlanLint's ban): the
      // top-20 is a TakeOrdered; ranking those 20 rows goes through
      // GlobalRank (range shuffle + zipWithIndex) like every other global
      // ordering in this catalog — trivially cheap at 20 rows, and the
      // plan stays scale-shaped if the cut ever widens.
      graft.operators.GlobalRank.withRank(
        scored.orderBy(col("score").desc, col("doc_id")).limit(20),
        Seq(col("score").desc, col("doc_id")), numPartitions = 2, rankCol = "rank")
    },
    Some(s"""WITH docs AS (SELECT doc_id, $normToksSql AS toks FROM documents),
                  lens AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS len FROM docs),
                  stats AS (SELECT COUNT(*) AS nd,
                                   ${Exact.sqlToDouble("SUM(len)")} / COUNT(*) AS avgl
                            FROM lens),
                  tf AS (SELECT doc_id, tok, COUNT(*) AS tf FROM (
                           SELECT doc_id, unnest(toks) AS tok FROM docs)
                         WHERE tok IN ('dup', 'scan', 'merge')
                         GROUP BY doc_id, tok),
                  dfx AS (SELECT tok, COUNT(*) AS df FROM tf GROUP BY tok),
                  term AS (SELECT t.doc_id, t.tok,
                                  ((CAST(s.nd - d.df AS DOUBLE) + 0.5)
                                   / (CAST(d.df AS DOUBLE) + 0.5))
                                  * (CAST(t.tf AS DOUBLE) * 2.2
                                     / (CAST(t.tf AS DOUBLE)
                                        + 1.2 * (1.0 - 0.75
                                          + 0.75 * (CAST(l.len AS DOUBLE) / s.avgl))))
                                    AS ts
                           FROM tf t
                           JOIN dfx d ON d.tok = t.tok
                           JOIN lens l ON l.doc_id = t.doc_id
                           CROSS JOIN stats s),
                  scored AS (SELECT doc_id,
                                    ROUND(COALESCE(SUM(CASE WHEN tok = 'dup' THEN ts END), 0.0)
                                          + COALESCE(SUM(CASE WHEN tok = 'scan' THEN ts END), 0.0)
                                          + COALESCE(SUM(CASE WHEN tok = 'merge' THEN ts END), 0.0), 6)
                                      AS score
                             FROM term GROUP BY doc_id)
             SELECT doc_id, score, CAST(rank AS BIGINT) AS rank FROM (
               SELECT doc_id, score,
                      ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) AS rank
               FROM scored)
             WHERE rank <= 20"""))

  /** CUSUM change-point detection per user: the first event where the
    * cumulative deviation of the user's values from the GLOBAL mean
    * leaves the ±H band — the sequential-analysis complement of the
    * pointwise outlier entries (`events_zscore_outliers` flags single
    * extremes; CUSUM catches a persistent small shift long before any
    * single point is extreme). One user-partitioned sort (row_number and
    * the running sum share it) + a broadcast global-moment scalar + a
    * first-breach window over the breach rows only.
    *
    * Exactness device: the mean is never divided out. S_k = Σv_i − k·μ
    * is scaled by N: N·S_k = N·cums_k − k·ΣV — every term an exact
    * DECIMAL product — and the band check compares against H·N, so the
    * breach set is integer-exact with ZERO divisions (the emitted
    * deviation divides once, after the fact). Decimal widths are sized
    * to the catalog corpus (N ≤ 1e10, cums ≤ 1e23/1e4); they widen
    * mechanically for larger fleets.
    */
  /** The batch CUSUM pipeline over an arbitrary events frame — shared by
    * the catalog entry and StreamingSpec's stream≡batch parity test (the
    * streaming form in StreamingQueries.streamingCusumBreach replays the
    * same division-free decimal band test per micro-batch).
    */
  private[graft] def cusumBreachOver(events: DataFrame, h: Long = CusumH.toLong): DataFrame = {
      import org.apache.spark.sql.expressions.Window
      import org.apache.spark.sql.types.DecimalType
      // TRY_CAST, not cast: the documented hostile-value contract (NaN /
      // ±Infinity / >14-integer-digit values become NULL — the row keeps
      // its row_number, the running sum skips it) is non-ANSI cast
      // behavior; under Spark 4's default ANSI mode a plain cast would
      // instead throw mid-aggregate. The streaming fold replays exactly
      // these semantics (StreamingQueries.streamingCusumBreach).
      val vd = expr("try_cast(value AS DECIMAL(18,4))")
      val g = events.agg(sum(vd).as("sy"), count(lit(1)).as("n"))
      val w = Window.partitionBy("user_id").orderBy("tss", "event_id")
      val r = events
        .select(col("user_id"), col("event_id"), col("value"),
          col("ts").cast("long").as("tss"))
        .withColumn("k", row_number().over(w).cast("long"))
        // COALESCE to 0: a prefix of all-NULL values (every one rejected
        // by the try_cast) must leave the running sum at ZERO — the
        // streaming fold's state starts at 0 and skips rejected rows, and
        // SUM-over-window would instead be NULL until the first castable
        // value, silently suppressing the band test on those rows.
        .withColumn("cums",
          coalesce(
            sum(vd).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)),
            lit(0).cast(DecimalType(18, 4))))
        .crossJoin(broadcast(g))
        .withColumn("numer",
          (col("n").cast(DecimalType(10, 0)) * col("cums").cast(DecimalType(27, 4)))
            - (col("k").cast(DecimalType(10, 0)) * col("sy").cast(DecimalType(27, 4))))
        .filter(abs(col("numer")) >
          (lit(h).cast(DecimalType(10, 0)) * col("n").cast(DecimalType(10, 0)))
            .cast(DecimalType(38, 4)))
        .withColumn("dev",
          round(col("numer").cast("double") / col("n").cast("double"), 6))
      r.withColumn("rn", row_number().over(
          Window.partitionBy("user_id").orderBy("k")))
        .filter(col("rn") === 1)
        .select(col("user_id"), col("k").as("breach_k"),
          col("tss").as("breach_ts"), col("dev"))
  }

  val cusumBreach: CatalogEntry = CatalogEntry(
    "events_cusum_breach",
    (s, d) => cusumBreachOver(Tables.events(s, d)),
    Some(s"""WITH g AS (SELECT SUM(CAST(value AS DECIMAL(18,4))) AS sy, COUNT(*) AS n
                        FROM events),
                  r AS (SELECT user_id, event_id, tss,
                               CAST(ROW_NUMBER() OVER w AS BIGINT) AS k,
                               SUM(CAST(value AS DECIMAL(18,4)))
                                 OVER (PARTITION BY user_id ORDER BY tss, event_id
                                       ROWS UNBOUNDED PRECEDING) AS cums
                        FROM (SELECT user_id, event_id, value,
                                     CAST(FLOOR(epoch(ts)) AS BIGINT) AS tss
                              FROM events)
                        WINDOW w AS (PARTITION BY user_id ORDER BY tss, event_id)),
                  br AS (SELECT user_id, k, tss,
                                (CAST(n AS DECIMAL(10,0)) * CAST(cums AS DECIMAL(27,4)))
                                - (CAST(k AS DECIMAL(10,0)) * CAST(sy AS DECIMAL(27,4)))
                                  AS numer,
                                n
                         FROM r CROSS JOIN g
                         WHERE ABS((CAST(n AS DECIMAL(10,0)) * CAST(cums AS DECIMAL(27,4)))
                                   - (CAST(k AS DECIMAL(10,0)) * CAST(sy AS DECIMAL(27,4))))
                               > CAST(CAST($CusumH AS DECIMAL(10,0))
                                      * CAST(n AS DECIMAL(10,0)) AS DECIMAL(38,4)))
             SELECT user_id, breach_k, breach_ts, dev FROM (
               SELECT user_id, k AS breach_k, tss AS breach_ts,
                      ROUND(${Exact.sqlToDouble("numer")} / CAST(n AS DOUBLE), 6) AS dev,
                      ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY k) AS rn
               FROM br)
             WHERE rn = 1"""))

  /** The curation report: per quality tier (from [[qualityTiers]]), the
    * signals a data-curation team reads before setting keep thresholds —
    * doc count, mean length, mean quality, mean intra-doc repetition,
    * exact-dup losers, repetitive-doc count. Definitions are SINGLE-
    * SOURCED: the Spark side calls the sibling entries' builders, and the
    * oracle embeds the sibling entries' own oracle SQL as subqueries — a
    * drifted formula would break this entry's hash, not just its own.
    *
    * Cost: the sibling projections + doc-keyed joins + a 10-row
    * aggregate. Mean-of-ratio columns re-cast the per-doc 6-dp values to
    * DECIMAL(10,6) (exact by construction after ROUND 6) so the cross-doc
    * sums are associative and order-free.
    */
  val qualityReport: CatalogEntry = CatalogEntry(
    "pipeline_quality_report",
    (s, d) => {
      import org.apache.spark.sql.types.DecimalType
      import org.apache.spark.sql.expressions.Window
      val tiers = qualityTiers.build(s, d).select(col("doc_id"), col("quality_score"), col("tier"))
      val rep = TrainPrepCatalog.repetition.build(s, d)
        .select(col("doc_id"), col("dup_frac"), col("repetitive"))
      // The canonical rule comes from exactDedup's own output (the per-doc
      // hash projection is the one unavoidable restatement — its
      // definition is still the shared Text.contentHash).
      val dupFlag = documents(s, d)
        .select(col("doc_id"), Text.contentHash(col("text")).as("content_hash"))
        .join(exactDedup.build(s, d).select("content_hash", "canonical_id"), "content_hash")
        .select(col("doc_id"), (col("doc_id") =!= col("canonical_id")).as("is_dup"))
      val toks = documents(s, d)
        .select(col("doc_id"), size(Text.wsTokens(col("text"))).cast("long").as("n_tokens"))
      tiers.join(rep, "doc_id").join(dupFlag, "doc_id").join(toks, "doc_id")
        .groupBy("tier").agg(
          count(lit(1)).as("n_docs"),
          sum(col("n_tokens")).as("tok_sum"),
          sum(col("quality_score").cast(DecimalType(10, 6))).as("q_sum"),
          sum(col("dup_frac").cast(DecimalType(10, 6))).as("df_sum"),
          sum(when(col("is_dup"), 1L).otherwise(0L)).as("dup_docs"),
          sum(when(col("repetitive"), 1L).otherwise(0L)).as("repetitive_docs"))
        .select(col("tier"), col("n_docs"),
          round(col("tok_sum").cast("double") / col("n_docs").cast("double"), 6).as("mean_tokens"),
          round(col("q_sum").cast("double") / col("n_docs").cast("double"), 6).as("mean_quality"),
          round(col("df_sum").cast("double") / col("n_docs").cast("double"), 6).as("mean_dup_frac"),
          col("dup_docs"), col("repetitive_docs"))
    },
    Some(s"""WITH tiers AS MATERIALIZED (SELECT doc_id, quality_score, tier
                                         FROM (${qualityTiers.oracle.get})),
                  rep AS MATERIALIZED (SELECT doc_id, dup_frac, repetitive
                                       FROM (${TrainPrepCatalog.repetition.oracle.get})),
                  dupflag AS (SELECT h.doc_id, h.doc_id != x.canonical_id AS is_dup
                              FROM (SELECT doc_id, md5($normSql) AS content_hash
                                    FROM documents) h
                              JOIN (${exactDedup.oracle.get}) x
                                ON x.content_hash = h.content_hash),
                  toks AS (SELECT doc_id, CAST(len($toksSql) AS BIGINT) AS n_tokens
                           FROM documents)
             SELECT tier, COUNT(*) AS n_docs,
                    ROUND(${Exact.sqlToDouble("SUM(n_tokens)")} / CAST(COUNT(*) AS DOUBLE), 6)
                      AS mean_tokens,
                    ROUND(${Exact.sqlToDouble("SUM(CAST(quality_score AS DECIMAL(10,6)))")}
                          / CAST(COUNT(*) AS DOUBLE), 6) AS mean_quality,
                    ROUND(${Exact.sqlToDouble("SUM(CAST(dup_frac AS DECIMAL(10,6)))")}
                          / CAST(COUNT(*) AS DOUBLE), 6) AS mean_dup_frac,
                    CAST(SUM(CASE WHEN is_dup THEN 1 ELSE 0 END) AS BIGINT) AS dup_docs,
                    CAST(SUM(CASE WHEN repetitive THEN 1 ELSE 0 END) AS BIGINT) AS repetitive_docs
             FROM tiers
             JOIN rep USING (doc_id)
             JOIN dupflag USING (doc_id)
             JOIN toks USING (doc_id)
             GROUP BY tier"""))

  /** Lag-1 autocorrelation of value per event type — the serial-dependence
    * statistic that separates a genuinely random stream from a trending /
    * mean-reverting one (the third leg of the time-series family next to
    * [[Transforms.trendMoments]] and [[cusumBreach]]). Pearson r over the
    * (vₜ₋₁, vₜ) pairs of the type's (ts, event_id)-ordered stream: one
    * type-partitioned sort produces the lag pairs, then a tiny-key moment
    * aggregate (pair count, Σa, Σb, Σa², Σb², Σab — DECIMAL-exact) and
    * the same fixed-shape IEEE double closed form as the trend entry.
    */
  val autocorrLag1: CatalogEntry = CatalogEntry(
    "events_autocorr_lag1",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      import org.apache.spark.sql.types.DecimalType
      val w = Window.partitionBy("event_type").orderBy("tss", "event_id")
      val pairs = Tables.events(s, d)
        .select(col("event_type"), col("event_id"), col("value"),
          col("ts").cast("long").as("tss"))
        .withColumn("prev", lag("value", 1).over(w))
        .filter(col("prev").isNotNull)
      val ad = col("prev").cast(DecimalType(18, 4))
      val bd = col("value").cast(DecimalType(18, 4))
      val m = pairs.groupBy("event_type").agg(
        count(lit(1)).as("n_pairs"),
        sum(ad).as("sad"),
        sum(bd).as("sbd"),
        sum((ad * ad).cast(DecimalType(38, 8))).as("saad"),
        sum((bd * bd).cast(DecimalType(38, 8))).as("sbbd"),
        sum((ad * bd).cast(DecimalType(38, 8))).as("sabd"))
      val n = col("n_pairs").cast("double")
      val sa = col("sad").cast("double")
      val sb = col("sbd").cast("double")
      val saa = col("saad").cast("double")
      val sbb = col("sbbd").cast("double")
      val sab = col("sabd").cast("double")
      // Degenerate-group guard: a single-pair or constant-value type has
      // zero variance on one side → 0/0 = NaN, whose engine encoding is
      // not portable. Variance terms are exact-input doubles, so the
      // > 0 membership is bit-deterministic; degenerate groups are
      // dropped on BOTH sides (autocorrelation is undefined there).
      m.where((n * saa - sa * sa) > 0 && (n * sbb - sb * sb) > 0)
        .select(col("event_type"), col("n_pairs"),
          round((n * sab - sa * sb)
            / (sqrt(n * saa - sa * sa) * sqrt(n * sbb - sb * sb)), 6).as("autocorr"))
    },
    Some(s"""WITH p AS (SELECT event_type, value,
                               lag(value, 1) OVER (PARTITION BY event_type
                                                   ORDER BY tss, event_id) AS prev
                        FROM (SELECT event_type, event_id, value,
                                     CAST(FLOOR(epoch(ts)) AS BIGINT) AS tss
                              FROM events)),
                  m AS (SELECT event_type, COUNT(*) AS n_pairs,
                               ${Exact.sqlSum("prev", 18, 4)} AS sa,
                               ${Exact.sqlSum("value", 18, 4)} AS sb,
                               ${Exact.sqlToDouble(
                                 "SUM(CAST(CAST(prev AS DECIMAL(18,4)) * CAST(prev AS DECIMAL(18,4)) AS DECIMAL(38,8)))")} AS saa,
                               ${Exact.sqlToDouble(
                                 "SUM(CAST(CAST(value AS DECIMAL(18,4)) * CAST(value AS DECIMAL(18,4)) AS DECIMAL(38,8)))")} AS sbb,
                               ${Exact.sqlToDouble(
                                 "SUM(CAST(CAST(prev AS DECIMAL(18,4)) * CAST(value AS DECIMAL(18,4)) AS DECIMAL(38,8)))")} AS sab
                        FROM p WHERE prev IS NOT NULL GROUP BY event_type)
             SELECT event_type, n_pairs,
                    ROUND((CAST(n_pairs AS DOUBLE) * sab - sa * sb)
                          / (SQRT(CAST(n_pairs AS DOUBLE) * saa - sa * sa)
                             * SQRT(CAST(n_pairs AS DOUBLE) * sbb - sb * sb)), 6)
                      AS autocorr
             FROM m
             WHERE (CAST(n_pairs AS DOUBLE) * saa - sa * sa) > 0
               AND (CAST(n_pairs AS DOUBLE) * sbb - sb * sb) > 0"""))

  /** Intra-document repeated-block removal — the REWRITE companion of the
    * measurement entries (`doc_repetition` scores repetition,
    * `doc_dup_spans` inventories cross-doc spans; this one actually
    * deduplicates text the way a C4/MassiveText cleanup pass does):
    * the token stream is cut into fixed 2-token blocks and every later
    * occurrence of an identical block inside the SAME document is
    * dropped, first kept, order preserved. Keep-first is expressed as
    * `first-index-of(block) == my-index` — one higher-order filter over
    * the per-doc block array, no shuffle at all (the whole operator is a
    * per-row projection; per-doc cost is blocks², bounded by document
    * length). The oracle mirrors it with list_position over the same
    * step-2 slices and an ORDER BY i string_agg.
    */
  val blockDedup: CatalogEntry = CatalogEntry(
    "doc_block_dedup",
    (s, d) => {
      // Empty-token guard: sequence(0, -1) would DESCEND ([0, -1] — two
      // phantom blocks) for a zero-token doc, while the oracle's range()
      // comprehension yields none. normTokens never returns an empty
      // array today (split() keeps one element), but the case must be
      // DEFINED identically in both engines: zero tokens ⇒ zero blocks.
      val out = Text.bound(
        Text.bound(Text.normTokens(col("text"))) { tl =>
          when(size(tl) >= 1,
            transform(
              sequence(lit(0), floor((size(tl) - 1) / 2).cast("int")),
              k => concat_ws(" ", slice(tl, k * 2 + 1, lit(2)))))
            .otherwise(array().cast("array<string>"))
        }) { cs =>
        Text.bound(filter(cs, (c, i) => array_position(cs, c) === (i + 1).cast("long"))) {
          kept =>
            struct(array_join(kept, " ").as("clean_text"),
              (size(cs) - size(kept)).cast("long").as("n_dropped"))
        }
      }
      documents(s, d)
        .select(col("doc_id"), out.getField("clean_text").as("clean_text"),
          out.getField("n_dropped").as("n_dropped"))
        .orderBy("doc_id")
    },
    Some(s"""WITH toks AS (SELECT doc_id, $normToksSql AS tl FROM documents),
                  chunks AS (SELECT doc_id,
                                    [array_to_string(tl[i : i+1], ' ')
                                     for i in range(1, len(tl)+1, 2)] AS cs
                             FROM toks),
                  flat AS (SELECT doc_id, cs, unnest(cs) AS c,
                                  generate_subscripts(cs, 1) AS i
                           FROM chunks),
                  kept AS (SELECT doc_id, c, i,
                                  list_position(cs, c) = i AS keep
                           FROM flat),
                  agg AS (SELECT doc_id,
                                 string_agg(c, ' ' ORDER BY i) FILTER (WHERE keep)
                                   AS clean_text,
                                 CAST(COUNT(*) - COUNT(*) FILTER (WHERE keep) AS BIGINT)
                                   AS n_dropped
                          FROM kept GROUP BY doc_id)
             -- LEFT JOIN from chunks keeps a zero-block doc as ('', 0) —
             -- the same row the Spark guard emits — instead of dropping it.
             SELECT ch.doc_id,
                    COALESCE(a.clean_text, '') AS clean_text,
                    COALESCE(a.n_dropped, CAST(0 AS BIGINT)) AS n_dropped
             FROM chunks ch LEFT JOIN agg a USING (doc_id)
             ORDER BY ch.doc_id"""))

  private val CdcMod = 8
  private val CdcP = 1000000007L

  /** Content-defined chunking dedup (the Rabin/gear-CDC shape rsync and
    * dedup filesystems use, applied to text): the token stream is cut
    * where a per-TOKEN hash hits `h(tok) % 8 == 0`, so boundaries are
    * decided by CONTENT, not position — insert one sentence into a
    * document and fixed-size blocks all shift (every block after the
    * edit re-hashes as new), while CDC boundaries re-align immediately
    * and only the edited chunk changes. Expected chunk length = the
    * boundary modulus (8 tokens). The entry reports, per document, how
    * many of its chunks also occur verbatim in ANOTHER document — the
    * cross-doc boilerplate measure `doc_dup_spans` approximates with
    * fixed windows, now shift-invariant.
    *
    * Execution shape: chunking is a pure per-row fold (one `aggregate`
    * HOF building the chunk list, a nested fold computing each token's
    * polynomial hash — all whole-stage-codegen'd, ZERO shuffle to find
    * boundaries); the only shuffles are the dedup groupBy on the chunk
    * fingerprint and the per-doc rollup — at 100 TB that is the
    * irreducible dedup shuffle, carrying md5 fingerprints (16 bytes),
    * never chunk text. The boundary hash is the house polynomial
    * (mod 1e9+7, `Text.rollingHash`'s recurrence) applied per token, so
    * both engines derive identical cut points. Zero-token docs are
    * DEFINED as zero chunks (LEFT JOIN + COALESCE on both sides,
    * blockDedup's discipline).
    */
  val cdcChunks: CatalogEntry = CatalogEntry(
    "doc_cdc_chunks",
    (s, d) => {
      val chunks = documents(s, d)
        .select(col("doc_id"), explode(Text.cdcChunks(col("text"), CdcMod)).as("chunk"))
        .select(col("doc_id"), md5(col("chunk")).as("fp"))
      val nd = chunks.groupBy("fp").agg(countDistinct("doc_id").as("ndocs"))
      val per = chunks.join(nd, Seq("fp"))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_chunks"),
          count(when(col("ndocs") >= 2, 1)).as("n_dup_chunks"))
      documents(s, d).select(col("doc_id")).join(per, Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("n_chunks"), lit(0L)).as("n_chunks"),
          coalesce(col("n_dup_chunks"), lit(0L)).as("n_dup_chunks"),
          when(coalesce(col("n_chunks"), lit(0L)) > 0,
            round(col("n_dup_chunks").cast("double") / col("n_chunks"), 6))
            .otherwise(lit(0.0)).as("dup_ratio"))
    },
    Some(s"""WITH toks AS (SELECT doc_id,
                                  list_filter($normToksSql, t -> t <> '') AS tl
                           FROM documents),
                  flat AS (SELECT doc_id, unnest(tl) AS tok,
                                  generate_subscripts(tl, 1) AS pos
                           FROM toks),
                  marked AS (SELECT doc_id, tok, pos,
                                    CASE WHEN list_reduce(
                                           list_prepend(CAST(0 AS BIGINT),
                                             list_transform(string_split(tok, ''),
                                               c -> CAST(ascii(c) AS BIGINT))),
                                           (acc, c) -> (acc * 31 + c) % $CdcP)
                                         % $CdcMod = 0 THEN 1 ELSE 0 END AS bf
                             FROM flat),
                  cid AS (SELECT doc_id, tok, pos,
                                 COALESCE(SUM(bf) OVER (
                                   PARTITION BY doc_id ORDER BY pos
                                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                                   0) AS chunk_id
                          FROM marked),
                  chunks AS (SELECT doc_id, chunk_id,
                                    md5(string_agg(tok, ' ' ORDER BY pos)) AS fp
                             FROM cid GROUP BY doc_id, chunk_id),
                  nd AS (SELECT fp, COUNT(DISTINCT doc_id) AS ndocs
                         FROM chunks GROUP BY fp),
                  per AS (SELECT c.doc_id,
                                 CAST(COUNT(*) AS BIGINT) AS n_chunks,
                                 CAST(COUNT(*) FILTER (WHERE ndocs >= 2) AS BIGINT)
                                   AS n_dup_chunks
                          FROM chunks c JOIN nd USING (fp) GROUP BY c.doc_id)
             SELECT d.doc_id,
                    COALESCE(per.n_chunks, CAST(0 AS BIGINT)) AS n_chunks,
                    COALESCE(per.n_dup_chunks, CAST(0 AS BIGINT)) AS n_dup_chunks,
                    CASE WHEN COALESCE(per.n_chunks, 0) > 0
                         THEN ROUND(CAST(per.n_dup_chunks AS DOUBLE) / per.n_chunks, 6)
                         ELSE 0.0 END AS dup_ratio
             FROM documents d LEFT JOIN per ON per.doc_id = d.doc_id"""))

  /** log10(1 + 1/d) for d = 1..9, pre-rounded to the house 6-decimal
    * lattice and baked into BOTH plans as literals — the expected
    * first-significant-digit law is a CONSTANT of the test, so neither
    * engine's log10 is ever evaluated (libm log differences can't leak
    * into the compare, the same literal-constant device as the Benford
    * family's textbook tables).
    */
  private val BenfordP =
    Seq(0.30103, 0.176091, 0.124939, 0.09691, 0.079181,
      0.066947, 0.057992, 0.051153, 0.045757)

  /** Benford first-significant-digit audit per event type (Newcomb 1881;
    * Benford 1938; Nigrini 1996 — the standard forensic screen for
    * fabricated or pipeline-corrupted numeric columns): the observed
    * digit-1..9 distribution of `value` next to the Benford expectation
    * and the per-digit absolute deviation. A synthetic generator that
    * draws values uniformly, a unit-conversion bug, or a truncating
    * ingest all bend this profile long before means/percentiles move —
    * the value-column sibling of `source_ks_drift`'s shape monitoring.
    *
    * Cross-engine digit extraction rides the house 10⁻⁶ lattice: value →
    * ROUND(·,6) → DECIMAL(18,6) → ×10⁶ → |BIGINT|, then the first char
    * of the INTEGER's decimal rendering — integer-to-string is
    * engine-identical, where double-to-string formatting is not. The
    * lattice shifts the decimal point only (×10⁶), which never changes
    * the first SIGNIFICANT digit of a nonzero value. Zeros (nothing
    * survives |·|>0) carry no leading digit and are excluded by law, not
    * by data luck. frac and abs_dev are ONE double division from exact
    * integers against the [[BenfordP]] literals.
    *
    * 100 TB shape: pure per-row projection into a (type, digit) keyed
    * count — map-side combined, output 9 × #types rows. The digit grid
    * (9 rows, broadcast) left-joins the counts so a digit an event type
    * NEVER produces still reports its full Benford deviation — absent
    * digits are the loudest fraud signal, and an inner join would
    * silently drop exactly them. The count frame is localCheckpointed
    * (tiny) so totals derive from it instead of a second corpus scan.
    */
  /** The (event_type, digit) count — the entry's ONLY corpus-touching
    * stage, a linear keyed aggregate, so it doubles as live streaming
    * state (StreamingQueries.streamingBenfordCounts delegates here; the
    * drained frame replays [[benfordFrom]] bit-for-bit).
    */
  private[graft] def benfordCounts(events: DataFrame): DataFrame =
    events
      .select(col("event_type"),
        abs((round(col("value"), 6).cast("decimal(18,6)") * 1000000)
          .cast("long")).as("av"))
      .filter(col("av") > 0)
      .select(col("event_type"),
        substring(col("av").cast("string"), 1, 1).cast("long").as("digit"))
      .groupBy("event_type", "digit").agg(count(lit(1)).as("n"))

  /** The per-digit profile from counted digits — grid-sized batch work,
    * factored so the streaming test replays it on drained state.
    */
  private[graft] def benfordFrom(s: SparkSession, cnt: DataFrame): DataFrame = {
    val tot = cnt.groupBy("event_type").agg(sum("n").as("n_type"))
    val digits = s.range(1, 10).select(col("id").as("digit"))
    val p = element_at(
      array(BenfordP.map(lit): _*), col("digit").cast("int"))
    tot.crossJoin(broadcast(digits))
      .join(cnt, Seq("event_type", "digit"), "left")
      .select(col("event_type"), col("digit"),
        coalesce(col("n"), lit(0L)).as("n"), col("n_type"),
        round(coalesce(col("n"), lit(0L)).cast("double") / col("n_type"), 6)
          .as("frac"),
        p.as("benford_p"),
        round(abs(coalesce(col("n"), lit(0L)).cast("double") / col("n_type") - p), 6)
          .as("abs_dev"))
  }

  val benfordProfile: CatalogEntry = CatalogEntry(
    "events_benford_profile",
    (s, d) => benfordFrom(s, benfordCounts(Tables.events(s, d)).localCheckpoint()),
    Some {
      val pList = BenfordP.mkString("[", ", ", "]")
      s"""WITH cnt AS (SELECT event_type, digit, CAST(COUNT(*) AS BIGINT) AS n FROM (
                         SELECT event_type,
                                CAST(substr(CAST(av AS VARCHAR), 1, 1) AS BIGINT) AS digit
                         FROM (SELECT event_type,
                                      ABS(CAST(CAST(ROUND(value, 6) AS DECIMAL(18,6))
                                               * 1000000 AS BIGINT)) AS av
                               FROM events)
                         WHERE av > 0)
                       GROUP BY 1, 2),
            tot AS (SELECT event_type, CAST(SUM(n) AS BIGINT) AS n_type
                    FROM cnt GROUP BY 1),
            digits AS (SELECT CAST(unnest(range(1, 10)) AS BIGINT) AS digit)
          SELECT t.event_type, d.digit,
                 COALESCE(c.n, 0) AS n, t.n_type,
                 ROUND(CAST(COALESCE(c.n, 0) AS DOUBLE) / t.n_type, 6) AS frac,
                 ($pList)[d.digit] AS benford_p,
                 ROUND(ABS(CAST(COALESCE(c.n, 0) AS DOUBLE) / t.n_type
                           - ($pList)[d.digit]), 6) AS abs_dev
          FROM tot t CROSS JOIN digits d
               LEFT JOIN cnt c ON c.event_type = t.event_type AND c.digit = d.digit"""
    })

  /** k-anonymity audit threshold: equivalence classes smaller than this
    * are flagged re-identifiable (5 is the conventional release bar).
    */
  private val KAnonBar = 5

  /** QI equivalence-class sizes — `events_k_anonymity`'s ONLY
    * corpus-touching stage, a plain keyed COUNT over the
    * quasi-identifier triple (event_type, day, 50-unit value bucket on
    * the 10⁻⁶ lattice) — linear/mergeable, so it doubles as live
    * streaming state (StreamingQueries.streamingKAnonCounts delegates
    * here; the drained classes replay [[kAnonFrom]] bit-for-bit).
    */
  private[graft] def kAnonCounts(events: DataFrame): DataFrame =
    events
      .select(col("event_type"),
        expr("unix_timestamp(ts) div 86400").as("day"),
        abs((round(col("value"), 6).cast("decimal(18,6)") * 1000000)
          .cast("long")).as("av"))
      .select(col("event_type"), col("day"),
        expr("av div 50000000").as("vbucket")) // integral div, the `//` mirror
      .groupBy("event_type", "day", "vbucket")
      .agg(count(lit(1)).as("k"))

  /** The per-type audit report from counted classes — #types-sized
    * batch work, factored so the streaming test replays it on drained
    * state.
    */
  private[graft] def kAnonFrom(cnt: DataFrame): DataFrame =
    cnt.groupBy("event_type")
      .agg(count(lit(1)).as("n_groups"),
        sum("k").as("n_rows"),
        sum(when(col("k") < KAnonBar, 1L).otherwise(0L)).as("n_groups_risky"),
        sum(when(col("k") < KAnonBar, col("k")).otherwise(lit(0L))).as("n_rows_risky"),
        min("k").as("min_k"),
        round(expr("percentile(k, 0.5)"), 6).as("med_k"))

  /** k-anonymity audit of the event table (Samarati & Sweeney 1998 —
    * the release bar privacy reviews actually apply to training data):
    * treat (event_type, day, coarse value bucket) as the
    * quasi-identifier an adversary could link on, and report per type
    * how many QI equivalence classes fall below k = [[KAnonBar]] and
    * how much row mass sits in them — the rows that would need
    * suppression or generalization before release. min_k = 1 means a
    * UNIQUE fingerprint exists; n_rows_risky is the suppression cost.
    * The day and value coordinates ride the house devices
    * (unix_timestamp div ↔ epoch //, the 10⁻⁶ lattice integer-divided
    * into 50-unit buckets) so both engines bucket identically; med_k
    * uses the proven percentile ↔ quantile_cont pair.
    *
    * 100 TB shape: ONE keyed count over the corpus (map-side combined,
    * QI-cardinality output = #types × #days × ≤10 buckets), then a
    * #types-sized rollup. The corpus-touching count stage streams as
    * live keyed state (streamingKAnonCounts, StreamingSpec-pinned).
    */
  val kAnonymity: CatalogEntry = CatalogEntry(
    "events_k_anonymity",
    (s, d) => kAnonFrom(kAnonCounts(Tables.events(s, d))),
    Some(s"""WITH cnt AS (SELECT event_type,
                                 CAST(FLOOR(epoch(ts)) AS BIGINT) // 86400 AS day,
                                 ABS(CAST(CAST(ROUND(value, 6) AS DECIMAL(18,6))
                                          * 1000000 AS BIGINT)) // 50000000 AS vbucket,
                                 CAST(COUNT(*) AS BIGINT) AS k
                          FROM events GROUP BY 1, 2, 3)
             SELECT event_type,
                    CAST(COUNT(*) AS BIGINT) AS n_groups,
                    CAST(SUM(k) AS BIGINT) AS n_rows,
                    CAST(SUM(CASE WHEN k < $KAnonBar THEN 1 ELSE 0 END) AS BIGINT) AS n_groups_risky,
                    CAST(SUM(CASE WHEN k < $KAnonBar THEN k ELSE 0 END) AS BIGINT) AS n_rows_risky,
                    CAST(MIN(k) AS BIGINT) AS min_k,
                    ROUND(quantile_cont(k, 0.5), 6) AS med_k
             FROM cnt GROUP BY event_type"""))

  val all: Seq[CatalogEntry] =
    Seq(exactDedup, incrementalDedup, decontaminate, qualityFilter, topTerms, textStats,
      qualityTiers,
      tokenCount, langId, fingerprint, boilerplateNgrams, userSessions, sessionGapSweep, gapHazard, userBurstiness, cleanCorpus, trainPrep,
      tokenCooccurrence, eventsLatestState, eventsKeySkew, eventsValueDeciles,
      eventsResample,
      eventsProfile, eventsJsonKv,
      userRunningTotal, eventsWindowFamily, stratifiedSample, saltedUserAgg, zscoreOutliers,
      eventsAsofJoin, eventsAsofNext, eventsRangeJoin, packBins, pipelineCurriculum,
      piiRedact, madOutliers, trimmedMean, disorderProfile, scd2Intervals, timeWeightedValue,
      eventsValueTrend, theilSen, bm25TopK, cusumBreach, qualityReport, autocorrLag1,
      blockDedup, cdcChunks, bigramFluency, langIdConfusion, qualityVsDup,
      featureHash, docManifest, docNovelty, seasonalDecompose, dsirWeightsEntry,
      dsirResample, seriesCorrelation, holtTrend, pageHinkley, eventsDailyPeaks, benfordProfile,
      kAnonymity)
}
