package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.CacheOnce._
import graft.Tables

/** Near-duplicate detection over `documents` — the LSH family. The cardinal
  * scale rule: NO all-pairs join anywhere. Candidate generation is always
  * bucketed (LSH band buckets, or source blocks for the n-gram variant);
  * exact similarity is computed only on candidates.
  *
  * Engine-portable hashing: MinHash uses lexicographic MIN over
  * `md5(seed || '|' || shingle)` hex strings — deterministic and identical
  * in Spark and DuckDB, so the oracle runs the whole LSH pipeline in SQL
  * and must match bit-for-bit.
  *
  * Negative result, kept so it is not re-tried: deriving the K hashes
  * Kirsch–Mitzenmacher-style (one md5 per shingle, h_i = h1 + i·h2 over
  * the digest's 48-bit halves) was implemented, oracle-verified, and
  * REJECTED. Linearly-derived h_i are correlated across i, so a pair's
  * signature components tend to agree or disagree TOGETHER — band
  * collisions stop being independent trials and recall collapses
  * precisely where LSH must not miss (two planted pairs at Jaccard 0.95
  * and 0.91 escaped all 4 bands at sf0.001; independent seeded hashes
  * catch them with P ≈ 0.9997). KM is sound for Bloom-filter membership,
  * not for banded min-wise signatures. The measured speedup was also nil
  * at sf0.1 — MinhashSignature's single-pass loop already amortizes the
  * K digests below the scan cost.
  */
object NearDupCatalog {

  private def documents(s: SparkSession, d: String) = Tables.documents(s, d)

  private val K = 12 // minhash signature length
  private val Bands = 4 // LSH bands (rows per band = K / Bands = 3)
  private val Rows = K / Bands
  private val JaccardThreshold = 0.5
  private val CoreK = 2 // k-core order: 2 separates chains from cycles
  private val KCoreRounds = 6 // fixed peel rounds (oracle unrolls the same 6)

  private val shinglesSql =
    raw"""SELECT DISTINCT doc_id, sh FROM (
            SELECT doc_id, unnest(CASE WHEN len(t) < 3 THEN [array_to_string(t, ' ')]
              ELSE [array_to_string(t[i:i+2], ' ') for i in range(1, len(t)-1)] END) AS sh
            FROM (SELECT doc_id, string_split_regex(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS t
                  FROM documents))"""

  /** MinHash + LSH near-duplicate pairs: shingle → K-hash MinHash signature
    * → band buckets → candidate pairs from bucket collisions only → exact
    * Jaccard verification on candidates → pairs ≥ threshold.
    *
    * At 100 TB: shingling and signatures are per-row; the band join keys on
    * (band_idx, 128-bit band hash) — collision buckets are tiny by
    * construction, so the candidate join is sparse; exact verification
    * touches only candidate pairs. This is the standard scalable MinHash
    * dedup (Broder 1997; Leskovec et al., Mining of Massive Datasets ch.3).
    */
  /** Per-doc shingle ARRAY (no explode): signatures become a pure per-row
    * projection — `array_min(transform(...))` per hash — so the signature
    * stage needs ZERO shuffles (the exploded form paid a distinct shuffle
    * plus a 12-aggregate groupBy). Values are identical: MIN over the
    * exploded group ≡ array_min over the distinct array.
    */
  private def shingleArraysDF(s: SparkSession, d: String): DataFrame =
    documents(s, d)
      .select(col("doc_id"), graft.functions.Text.shingles(col("text"), 3).as("shs"))

  /** The LSH pair list as a reusable builder — also consumed by the
    * composite cleaning pipeline (PipelineCatalog.cleanCorpus).
    */
  private[queries] def lshPairs(s: SparkSession, d: String): DataFrame =
    lshPairs(s, d, scala.collection.mutable.ListBuffer.empty)

  /** As [[lshPairs]], but appends every internally-cached intermediate to
    * `caches` so a caller that MATERIALIZES the pair list (dupClusters,
    * which localCheckpoints it) can unpersist them instead of leaking two
    * cached frames per call. The plain overload keeps them cached for the
    * lifetime of the returned lazy frame (they feed two plan branches
    * each, so they must stay resident until the consumer's action runs).
    */
  private[queries] def lshPairs(s: SparkSession, d: String,
      caches: scala.collection.mutable.ListBuffer[DataFrame]): DataFrame = {
    val (arrays, _, cand) = lshCandidateStage(s, d, caches)
    // Exact verification on the two sorted shingle sets — a linear
    // merge count per candidate pair, no exploded shingle join.
    cand
      .join(arrays.select(col("doc_id").as("da"), col("shsrt").as("shs_a")), Seq("da"))
      .join(arrays.select(col("doc_id").as("db"), col("shsrt").as("shs_b")), Seq("db"))
      .select(col("da").as("doc_a"), col("db").as("doc_b"),
        graft.functions.Text.bound(
          graft.functions.Text.intersectCardSorted(col("shs_a"), col("shs_b"))) { ni =>
          round(ni / (size(col("shs_a")) + size(col("shs_b")) - ni), 6)
        }.as("jaccard"))
      .filter(col("jaccard") >= JaccardThreshold)
  }

  /** The shared candidate stage of the LSH pipeline — (shingle arrays
    * with a sorted copy, K-column signatures, distinct band-collision
    * pairs da < db), each cached via `caches`. Consumed THRESHOLDED by
    * [[lshPairs]] and uncut by the calibration entry, so the index and
    * its diagnostic cannot drift apart.
    *
    * Per-row signatures (array_min over md5 transforms): ZERO shuffles
    * before the tiny band self-join. Correct performance depends on
    * Text.wordNgrams let-binding its token array — without it the
    * tokenizer re-evaluates per array element (measured 10×).
    * The cached intermediates each feed two plan branches.
    * shsrt: the shingle set re-sorted lexicographically ONCE per doc, so
    * pair verification is a zero-allocation linear merge count instead
    * of a per-pair hash-set intersection.
    *
    * The r7 "regression" suspicion on this refactor was re-measured in r8
    * (isolated bench, sf0.1, three runs): doc_near_dup_lsh 1.69–2.04 s vs
    * 1.75 s in the r7 full run — and the r6→r7 delta was a uniform ~1.2×
    * across ALL seven near-dup entries including ones that never touch
    * this stage (doc_sorted_neighborhood 1.08→1.38 s), i.e. host
    * throughput swing, not the shared-stage caching. Verdict: keep the
    * shared stage unconditionally cached (its frames each feed ≥2 plan
    * branches, and the harness clears the cache between entries).
    */
  private def lshCandidateStage(s: SparkSession, d: String,
      caches: scala.collection.mutable.ListBuffer[DataFrame])
      : (DataFrame, DataFrame, DataFrame) = {
    def reg(df: DataFrame): DataFrame = { val c = df.cacheOnce(); caches += c; c }
    val arrays = reg(shingleArraysDF(s, d)
      .withColumn("shsrt", sort_array(col("shs"))))
    val sigCols = graft.functions.Text.minhashSignature(col("shs"), K)
    val sig = reg(arrays.select(col("doc_id") +: sigCols: _*))
    val bandStructs = (0 until Bands).map { b =>
      val parts = (0 until Rows).map(r => col(s"s${b * Rows + r}"))
      struct(lit(b).as("band"), md5(concat(parts: _*)).as("h"))
    }
    val bands = sig.select(col("doc_id"), explode(array(bandStructs: _*)).as("bh"))
      .select(col("doc_id"), col("bh.band").as("band"), col("bh.h").as("h"))
    val cand = bands.as("a").join(bands.as("b"),
        col("a.band") === col("b.band") && col("a.h") === col("b.h") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("da"), col("b.doc_id").as("db"))
      .distinct()
    (arrays, sig, cand)
  }

  /** The LSH pipeline as a reusable CTE list ending in `lsh_pairs
    * (doc_a, doc_b, jaccard)` — spliced into dependent oracles.
    */
  private[queries] val lshPairsCtesSql: String = {
    val mins = (0 until K).map(i => s"MIN(md5(concat('$i', '|', sh))) AS s$i").mkString(", ")
    val bandSelects = (0 until Bands).map { b =>
      val parts = (0 until Rows).map(r => s"s${b * Rows + r}").mkString(", ")
      s"SELECT doc_id, $b AS band, md5(concat($parts)) AS h FROM sig"
    }.mkString(" UNION ALL ")
    s"""sh AS ($shinglesSql),
        sig AS (SELECT doc_id, $mins FROM sh GROUP BY doc_id),
        bands AS ($bandSelects),
        cand AS (SELECT DISTINCT a.doc_id AS da, b.doc_id AS db FROM bands a
                 JOIN bands b ON a.band = b.band AND a.h = b.h AND a.doc_id < b.doc_id),
        ni AS (SELECT c.da, c.db, count(*) AS n_inter FROM cand c
               JOIN sh sa ON sa.doc_id = c.da
               JOIN sh sb ON sb.doc_id = c.db AND sb.sh = sa.sh
               GROUP BY c.da, c.db),
        sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
        lsh_pairs AS (
          SELECT ni.da AS doc_a, ni.db AS doc_b,
                 ROUND(n_inter / (za.n + zb.n - n_inter), 6) AS jaccard
          FROM ni JOIN sz za ON za.doc_id = ni.da JOIN sz zb ON zb.doc_id = ni.db
          WHERE ROUND(n_inter / (za.n + zb.n - n_inter), 6) >= $JaccardThreshold)"""
  }

  val nearDupLsh: CatalogEntry = CatalogEntry(
    "doc_near_dup_lsh",
    lshPairs,
    Some(s"WITH $lshPairsCtesSql SELECT doc_a, doc_b, jaccard FROM lsh_pairs"))

  /** 32-bit SimHash over distinct tokens: bit j votes by the parity of hex
    * digit j of md5(token); the per-doc sum of ±1 votes thresholds at 0.
    * Per-row tokenize + one hash-aggregate per doc — no joins at all; at
    * scale, Hamming-distance bucketing on the signature gives the
    * candidate stage (Charikar 2002, Manku et al. 2007).
    */
  /** Per-doc 32-bit simhash frame (doc_id, simhash) — shared by the
    * signature entry and the collision-group dedup entry.
    */
  private[queries] def simhashDF(s: SparkSession, d: String): DataFrame = {
    // Per-row native signature (graft.expressions.Simhash32): the
    // signature stage has ZERO exchanges — the exploded 32-aggregate
    // formulation it replaces shuffled every token row.
    import org.apache.spark.sql.GraftSqlBridge
    val sig = GraftSqlBridge.column(graft.expressions.Simhash32(
      GraftSqlBridge.expression(graft.functions.Text.normTokens(col("text")))))
    documents(s, d).select(col("doc_id"), sig.as("simhash"))
  }

  /** The same signature as CTEs ending in `sig (doc_id, simhash)`. */
  private[queries] val simhashCtesSql: String = {
    val votes = (0 until 32).map(j =>
      s"SUM(CASE WHEN substr(hx, ${j + 1}, 1) IN ('1','3','5','7','9','b','d','f') THEN 1 ELSE -1 END) AS v$j")
      .mkString(", ")
    val bits = (0 until 32).map(j => s"CASE WHEN v$j > 0 THEN ${1L << j} ELSE 0 END").mkString(" + ")
    raw"""toks AS (
            SELECT DISTINCT doc_id, md5(tok) AS hx FROM (
              SELECT doc_id, unnest(list_distinct(string_split_regex(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' '))) AS tok
              FROM documents)),
          votes AS (SELECT doc_id, $votes FROM toks GROUP BY doc_id),
          sig AS (SELECT doc_id, CAST($bits AS BIGINT) AS simhash FROM votes)"""
  }

  val simHash: CatalogEntry = CatalogEntry(
    "doc_simhash",
    (s, d) => simhashDF(s, d),
    Some(s"WITH $simhashCtesSql SELECT doc_id, simhash FROM sig"))

  /** SimHash dedup decision: collision groups — every signature carried
    * by more than one doc, with the group size and the canonical
    * (minimum) doc id. One hash-aggregate keyed on the signature; no
    * joins.
    *
    * Why collision groups and not Manku-style Hamming-≤3 byte-band
    * candidates: measured on this corpus's ~30-word vocabulary the
    * signatures are so densely packed that Hamming ≤ 3 covers ~9% of ALL
    * pairs (5.6K of 125K at sf0.01) and every byte-band bucket is hot —
    * banding degenerates toward all-pairs. That is a property of the
    * corpus, not the algorithm: with a realistic vocabulary the byte
    * bands (pigeonhole: d ≤ 3 over 4 bands forces ≥ 1 band collision)
    * are the correct candidate stage, and this entry's group form is the
    * d = 0 special case whose scale shape (single aggregation) is
    * corpus-independent.
    */
  val simHashDupGroups: CatalogEntry = CatalogEntry(
    "doc_simhash_dup_groups",
    (s, d) => simhashDF(s, d)
      .groupBy("simhash")
      .agg(count(lit(1)).as("n_docs"), min("doc_id").as("canonical_doc"))
      .filter(col("n_docs") > 1),
    Some(s"""WITH $simhashCtesSql
             SELECT simhash, COUNT(*) AS n_docs, MIN(doc_id) AS canonical_doc
             FROM sig GROUP BY simhash HAVING COUNT(*) > 1"""))

  /** Word-bigram Jaccard similarity, blocked by `source` (the crawl-
    * snapshot analogue): pairs are generated only within a block and only
    * through shared bigrams (an inverted-index join) — never all-pairs.
    * Emits pairs ≥ 0.3.
    *
    * Scale note: the index join's fan-out is Σ df² per (block, gram). On
    * natural zipfian text the standard mitigation is df/prefix filtering
    * of candidate-generating grams; it is deliberately NOT applied here
    * because (a) exact Jaccard then still needs the full-set intersection
    * for candidates (measured slower on this corpus's dense 30-word
    * vocabulary, where df-filtering prunes almost nothing), and (b) block
    * size caps the worst case at |block|² regardless. For unbounded
    * blocks, doc_near_dup_lsh is the scale path.
    */
  private val NgramThreshold = 0.3 // = 3/10; prefix length derives from the rational form

  /** The distinct word-bigram index (doc_id, source, bg) of a documents
    * frame — shared by both n-gram Jaccard modes and their tests.
    */
  private[graft] def bigramIndex(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), col("source"),
      // array_distinct BEFORE the explode: rows carry doc_id, so
      // per-doc distinctness IS global distinctness of (doc_id, source,
      // bg) — per-row dedup replaces what used to be a full shuffle of
      // the exploded index (.distinct()).
      explode(array_distinct(graft.functions.Text.wordNgrams(
        graft.functions.Text.normTokens(col("text")), 2))).as("bg"))

  /** Candidate (da, db) pairs within a source block, from the inverted
    * bigram index. `prefixFilter = false` joins on EVERY shared gram
    * (fan-out Σ df² per (block, gram)); `true` applies Chaudhuri/Bayardo
    * prefix filtering: order each doc's grams by ascending block df
    * (ties by gram string — a global total order per block) and join only
    * the first n − ceil(t·n) + 1 of them. Any pair with Jaccard ≥ t
    * shares at least one gram in both prefixes, so filtering is EXACT:
    * same final pair set, hot high-df grams never generate candidates.
    */
  /** Per-doc gram arrays in prefix order (ascending block df, ties by
    * gram — a global total order per block), plus the doc's gram count:
    * ONE doc_id shuffle yields the prefix order, the size AND the full
    * gram set for verification. The earlier window-rank formulation paid
    * three doc_id-keyed exchanges for the same information (row_number
    * window + per-doc size + collect_set). The df join stays a shuffle
    * join: at 100 TB the block vocabulary is far too big to broadcast.
    */
  private[graft] def perDocByDf(bg: DataFrame): DataFrame = {
    val dfreq = bg.groupBy("source", "bg").agg(count(lit(1)).as("df"))
    bg.join(dfreq, Seq("source", "bg"))
      .groupBy("doc_id", "source")
      .agg(sort_array(collect_list(struct(col("df"), col("bg")))).as("sorted"))
      .select(col("doc_id"), col("source"),
        transform(col("sorted"), _.getField("bg")).as("gs"),
        // Lexicographically re-sorted copy for merge-count verification
        // (gs itself must stay in prefix order for the slice).
        sort_array(transform(col("sorted"), _.getField("bg"))).as("gsrt"),
        size(col("sorted")).as("n"))
  }

  /** The first n − ceil(t·n) + 1 grams of each doc in prefix order,
    * exploded. Prefix length with t = 3/10 computed as ceil((n*3)/10.0):
    * n*3 is exact, and whenever 10 | 3n the quotient is an exact
    * integer — no float boundary case can shorten the prefix and drop a
    * true pair (0.3*20 = 6.000000000000001 would).
    */
  private def prefixSide(perDoc: DataFrame): DataFrame =
    perDoc.select(col("doc_id"), col("source"),
      explode(slice(col("gs"), lit(1),
        (col("n") - ceil((col("n") * 3) / lit(10.0)) + 1).cast("int"))).as("bg"))

  /** Candidate (da, db) pairs within a source block, from the inverted
    * bigram index; see [[prefixSide]] for the exactness argument — any
    * pair with Jaccard ≥ t shares at least one gram in both prefixes, so
    * hot high-df grams never generate candidates yet no true pair is
    * lost.
    */
  private[graft] def candidatePairs(bg: DataFrame, prefixFilter: Boolean): DataFrame = {
    val side = if (!prefixFilter) bg else prefixSide(perDocByDf(bg))
    side.as("a").join(side.as("b"),
        col("a.source") === col("b.source") && col("a.bg") === col("b.bg") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("da"), col("b.doc_id").as("db"))
      .distinct()
  }

  /** Full n-gram Jaccard pipeline over a documents frame; both modes
    * return the identical pair set (prefix filtering is exact), so the
    * two catalog entries share one oracle SQL spec.
    */
  private[graft] def ngramJaccardFrom(docs: DataFrame, prefixFilter: Boolean): DataFrame =
    // The bigram index feeds several branches (candidate join sides + set
    // sizes) — materialize once.
    ngramJaccardFromIndex(bigramIndex(docs).cacheOnce(), prefixFilter,
      scala.collection.mutable.ListBuffer.empty)

  /** As [[ngramJaccardFrom]] but over an ALREADY-CACHED bigram index, so
    * a caller that computed the index for its own purposes (the cost-based
    * chooser's df statistic) reuses one materialization instead of paying
    * the tokenize+explode scan twice. Internal caches (the prefix mode's
    * per-doc frame) are appended to `caches` for the caller to release.
    */
  private[graft] def ngramJaccardFromIndex(bg: DataFrame, prefixFilter: Boolean,
      caches: scala.collection.mutable.ListBuffer[DataFrame]): DataFrame = {
    if (!prefixFilter) {
      // Unfiltered: the candidate join on every shared gram IS the
      // intersection count — one pass.
      val sz = bg.groupBy("doc_id").agg(count(lit(1)).as("n"))
      bg.as("a").join(bg.as("b"),
          col("a.source") === col("b.source") && col("a.bg") === col("b.bg") &&
            col("a.doc_id") < col("b.doc_id"))
        .groupBy(col("a.doc_id").as("da"), col("b.doc_id").as("db"))
        .agg(count(lit(1)).as("n_inter"))
        .join(sz.as("za"), col("za.doc_id") === col("da"))
        .join(sz.as("zb"), col("zb.doc_id") === col("db"))
        .select(col("da").as("doc_a"), col("db").as("doc_b"),
          round(col("n_inter") / (col("za.n") + col("zb.n") - col("n_inter")), 6).as("jaccard"))
        .filter(col("jaccard") >= NgramThreshold)
    } else {
      // Prefix-filtered: ONE cached per-doc frame carries prefix order,
      // the lexicographically sorted gram set and the size, so candidates
      // come from prefix grams only and each candidate pair verifies via
      // a zero-allocation merge count over the sorted sets — the pair's
      // sizes ride the same joins (no separate sz frame; the window
      // formulation this replaces paid two extra doc_id exchanges and
      // measured 5.8 s vs 2.4 s unfiltered at sf0.1's dense vocabulary).
      val perDoc = { val c = perDocByDf(bg).cacheOnce(); caches += c; c }
      // Full PPJoin (Xiao 2008), not the prefix filter alone: the first
      // joined match's positions (pa, pb) in the shared block total
      // order bound the true intersection by 1 + min(na−1−pa, nb−1−pb)
      // — valid because prefixes are DOWNWARD-CLOSED in that order, so
      // a shared gram ordered before the first joined match would
      // itself have joined (coveredPrefixPlan has the same argument).
      // Prune in the integer form 13·bound ≥ 3·(na+nb) − 13, strictly
      // looser than round(j,6) ≥ 0.3 for na+nb < 2.3M tokens, so no
      // qualifying pair is dropped; r11 measured it pruning 33% of
      // candidates (436,005 → 292,151) before the array-shipping
      // verification stage. The min-position aggregate replaces the
      // candidate distinct at the same shuffle count.
      val side = perDoc.select(col("doc_id"), col("source"), col("n"),
        posexplode(slice(col("gs"), lit(1),
          (col("n") - ceil((col("n") * 3) / lit(10.0)) + 1).cast("int")))
          .as(Seq("p", "bg")))
      val cand = side.as("a").join(side.as("b"),
          col("a.source") === col("b.source") && col("a.bg") === col("b.bg") &&
            col("a.doc_id") < col("b.doc_id"))
        .groupBy(col("a.doc_id").as("da"), col("b.doc_id").as("db"))
        .agg(min(struct(col("a.p").as("pa"), col("b.p").as("pb"))).as("m"),
          max(col("a.n")).as("pna"), max(col("b.n")).as("pnb"))
        .filter(lit(13) * (lit(1) + least(col("pna") - 1 - col("m.pa"),
            col("pnb") - 1 - col("m.pb")))
          >= lit(3) * (col("pna") + col("pnb")) - 13)
        .select("da", "db")
      cand
        .join(perDoc.select(col("doc_id").as("da"), col("gsrt").as("gs_a"), col("n").as("na")),
          Seq("da"))
        .join(perDoc.select(col("doc_id").as("db"), col("gsrt").as("gs_b"), col("n").as("nb")),
          Seq("db"))
        .select(col("da").as("doc_a"), col("db").as("doc_b"),
          graft.functions.Text.bound(
            graft.functions.Text.intersectCardSorted(col("gs_a"), col("gs_b"))) { ni =>
            round(ni / (col("na") + col("nb") - ni), 6)
          }.as("jaccard"))
        .filter(col("jaccard") >= NgramThreshold)
    }
  }

  /** Second negative result, measured and kept so it is not re-tried: a
    * "blocked merge" topology — per-doc sorted gram arrays (zero-shuffle
    * projection), within-block |m|² pair join on `source` alone, native
    * merge-count verification, no gram index at all — seemed like the
    * dense-vocab winner on paper (the index join's Σ df² ≈ 3.9M rows at
    * sf0.1 vs 623K direct pairs). Measured in the same JVM, min-of-3:
    * 7.5 s vs 2.1 s naive. The pair COUNT is smaller but each pair pays a
    * ~2·ḡ-element STRING merge (~32M string comparisons); the inverted
    * index's fan-out rows are, by contrast, nearly free (codegen'd hash
    * probe + map-side-combined count). Lesson: compare work in
    * comparisons, not in rows — Σ df² join rows beat |m|²·ḡ string
    * compares until grams are hashed to fixed-width ints, and hashing
    * would break the oracle's exact-intersection claim.
    */

  /** Cost-based mode choice for the n-gram Jaccard pipeline: prefix
    * filtering exploits DOCUMENT-FREQUENCY SKEW (hot grams generate the
    * candidate blow-up, and they sit outside every doc's low-df prefix)
    * — with a flat df distribution there is nothing to prune and the
    * second verification pass is pure overhead (both regimes measured:
    * 92% candidate pruning on the zipfian spec corpus vs 15% on this
    * dense one). The statistic is the df coefficient of variation
    * (stddev/mean over (block, gram) frequencies), computed by ONE tiny
    * aggregate over the gram index — at 100 TB this is the same
    * pay-a-small-scan-to-pick-the-plan trade AQE makes, decided here at
    * build time because the choice changes the whole topology.
    */
  private[graft] def ngramMode(bg: DataFrame): String = {
    val r = bg.groupBy("source", "bg").agg(count(lit(1)).as("df"))
      .agg(avg("df").as("m"), stddev_pop("df").as("s")).head()
    // Empty/degenerate index (no grams, or a single gram type): the
    // aggregates come back null — nothing to prune, take the naive plan.
    if (r.isNullAt(0) || r.isNullAt(1)) "naive"
    else if (r.getDouble(1) / math.max(1e-9, r.getDouble(0)) > 0.7) "prefix"
    else "naive"
  }

  /** n-gram Jaccard with the mode chosen by [[ngramMode]]'s df-skew
    * statistic. Both modes return the identical pair set, so this only
    * trades plan topology, never results.
    *
    * The index is computed ONCE: the mode statistic's action materializes
    * the cached bigram index, the chosen pipeline reuses it, and the
    * (tiny, threshold-filtered) pair result is eagerly localCheckpoint'ed
    * so every internal cache can be released before returning.
    *
    * COST, measured (r8, sf0.1, local[32]): the chooser is cache-neutral
    * in STORAGE (one index materialization either way) but not in
    * wall-clock — it serializes one extra stat job (the 1/8-sample df
    * aggregate + head) before the pipeline can be built, worth roughly
    * 0.3–0.8 s here vs the chooser-less r6 entry (2.55 s → 3.3–4.0 s
    * isolated across three runs; the r7 full-suite 4.23 s reading was
    * additionally inflated by the documented ±30% host swing — the same
    * r6→r7 comparison shows a uniform ~1.2× on near-dup entries that
    * don't touch this code at all). The stat job count is pinned in
    * NearDupSpec so a second silent materialization cannot creep in.
    */
  private[graft] def ngramJaccardAuto(docs: DataFrame): DataFrame = {
    val caches = scala.collection.mutable.ListBuffer.empty[DataFrame]
    val bg = bigramIndex(docs).cacheOnce()
    caches += bg
    // The CV statistic is estimated on a 1/8 hash-sample of GRAM TYPES:
    // each sampled gram keeps its EXACT df (sampling types, not rows), so
    // per-type frequencies are unbiased and the CV estimate is stable
    // wherever the type count is non-trivial — while the stat shuffle
    // shrinks 8×. (Sampling rows instead would Poisson-inflate the CV of
    // low-df grams and bias the decision toward prefix.)
    val sample = bg.filter(pmod(xxhash64(col("source"), col("bg")), lit(8)) === 0)
    val mode = ngramMode(sample)
    val out = ngramJaccardFromIndex(bg, mode == "prefix", caches).localCheckpoint()
    caches.foreach(_.unpersist(blocking = false))
    out
  }

  /** Default catalog entry — the COST-BASED path: [[ngramMode]]'s df-skew
    * statistic picks naive vs prefix-filtered per corpus, so the plan a
    * user gets is the one that survives a zipfian 100 TB crawl (prefix)
    * AND the one that wins on a dense vocabulary (naive). The oracle is
    * mode-independent: both plans return the identical pair set. The
    * mode switch itself is pinned in NearDupSpec (zipfian ⇒ prefix,
    * this testdata ⇒ naive).
    */
  val ngramJaccard: CatalogEntry = CatalogEntry(
    "doc_ngram_jaccard",
    (s, d) => ngramJaccardAuto(documents(s, d)),
    Some(
      raw"""WITH bg AS (
              SELECT DISTINCT doc_id, source, bg FROM (
                SELECT doc_id, source, unnest(CASE WHEN len(t) < 2 THEN [array_to_string(t, ' ')]
                  ELSE [array_to_string(t[i:i+1], ' ') for i in range(1, len(t))] END) AS bg
                FROM (SELECT doc_id, source, string_split_regex(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS t
                      FROM documents))),
            ni AS (SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS n_inter
                   FROM bg a JOIN bg b ON a.source = b.source AND a.bg = b.bg AND a.doc_id < b.doc_id
                   GROUP BY 1, 2),
            sz AS (SELECT doc_id, count(*) AS n FROM bg GROUP BY doc_id)
          SELECT ni.da AS doc_a, ni.db AS doc_b,
                 ROUND(n_inter / (za.n + zb.n - n_inter), 6) AS jaccard
          FROM ni JOIN sz za ON za.doc_id = ni.da JOIN sz zb ON zb.doc_id = ni.db
          WHERE ROUND(n_inter / (za.n + zb.n - n_inter), 6) >= 0.3"""))

  /** The prefix-filtered mode as its own entry, against the SAME naive SQL
    * spec — the strongest correctness statement available: two different
    * physical plans, one declarative definition. When each wins
    * (measured, see NearDupSpec's zipfian test + bench notes): on zipfian
    * text the hot grams dominate Σ df² and prefix filtering collapses the
    * candidate join; on this testdata's dense ~30-word vocabulary nearly
    * every gram survives the prefix (t = 0.3 keeps ~70% of each doc) and
    * the two extra shuffles (df + rank) just add latency — which is why
    * the default entry routes through [[ngramJaccardAuto]] and this one
    * force-pins the prefix plan so both topologies stay oracle-checked
    * every round regardless of what the chooser picks.
    */
  val ngramJaccardPrefix: CatalogEntry = CatalogEntry(
    "doc_ngram_jaccard_prefix",
    (s, d) => ngramJaccardFrom(documents(s, d), prefixFilter = true),
    ngramJaccard.oracle)

  /** The Jaccard chooser's PREFIX route exercised ORGANICALLY under the
    * correctness gate — the [[containmentCoveredZipf]] device extended
    * to the Jaccard family (round-12 next-step #4): the SAME cost-based
    * [[ngramJaccardAuto]] pipeline, run over the deterministic zipfian
    * mirror corpus [[zipfDocs]]. The df-skew statistic reads CV ≈ 1.5
    * there and routes to the prefix-filtered plan at build time, so the
    * auto path's prefix branch is hash-checked against the
    * mode-independent naive-join oracle every round (PlanSpec pins the
    * routing decision on the entry's exact sample statistic; the
    * force-pinned [[ngramJaccardPrefix]] keeps covering the prefix
    * kernel on the dense corpus, where the chooser organically takes
    * naive). With this, BOTH choosers (containment and Jaccard) have
    * both branches oracle-exercised through their auto routes.
    */
  val ngramJaccardZipf: CatalogEntry = CatalogEntry(
    "doc_ngram_jaccard_zipf",
    (s, d) => ngramJaccardAuto(zipfDocs(documents(s, d))),
    Some(
      raw"""WITH zd AS (
              SELECT doc_id, source,
                [ 'w' || CAST(CAST(FLOOR(4096.0/((
                      (strpos('0123456789abcdef', substr(md5(doc_id::VARCHAR || ':' || i::VARCHAR),1,1))-1)*256
                    + (strpos('0123456789abcdef', substr(md5(doc_id::VARCHAR || ':' || i::VARCHAR),2,1))-1)*16
                    + (strpos('0123456789abcdef', substr(md5(doc_id::VARCHAR || ':' || i::VARCHAR),3,1))-1) )+1)) AS INT) AS VARCHAR)
                  FOR i IN range(1,41) ] AS t
              FROM documents),
            bg AS (SELECT DISTINCT doc_id, source,
                     unnest([array_to_string(t[i:i+1], ' ') for i in range(1, len(t))]) AS bg
                   FROM zd),
            ni AS (SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS n_inter
                   FROM bg a JOIN bg b ON a.source = b.source AND a.bg = b.bg AND a.doc_id < b.doc_id
                   GROUP BY 1, 2),
            sz AS (SELECT doc_id, count(*) AS n FROM bg GROUP BY doc_id)
          SELECT ni.da AS doc_a, ni.db AS doc_b,
                 ROUND(n_inter / (za.n + zb.n - n_inter), 6) AS jaccard
          FROM ni JOIN sz za ON za.doc_id = ni.da JOIN sz zb ON zb.doc_id = ni.db
          WHERE ROUND(n_inter / (za.n + zb.n - n_inter), 6) >= 0.3"""))

  /** Near-dup CLUSTER resolution: connected components over the LSH pair
    * graph, labeling every involved doc with its component's minimum
    * doc_id — the step that turns a pair list into a per-cluster keep/drop
    * decision. Iterative min-label propagation: each round is one
    * edges⋈labels shuffle + a min-aggregate, and the driver reads ONE
    * scalar (the label sum, monotonically non-increasing) to detect the
    * fixpoint — no row data ever reaches the driver. Rounds needed =
    * graph diameter; near-dup components are short chains (diameter ≤ a
    * few), and the 20-round cap is the standard guard. At 100 TB the
    * per-round cost is proportional to the EDGE list (pairs), which LSH
    * already bounded far below the corpus; [[dupClustersStar]] is the
    * diameter-independent variant (Kiveris et al. 2014), oracle-checked
    * against the same fixpoint. Both run through
    * [[graft.operators.ConnectedComponents]].
    *
    * Oracle: the same fixpoint as a DuckDB recursive reachability CTE —
    * MIN over each doc's reachable set ≡ propagation's converged label.
    */
  /** The LSH pair list as a materialized, flat-lineage edge frame: the
    * builder's internal caches are dropped as soon as the checkpoint is
    * written, so NOTHING upstream of the edge list stays resident while a
    * components algorithm iterates over it.
    */
  private def lshEdges(s: SparkSession, d: String): DataFrame = {
    val upstream = scala.collection.mutable.ListBuffer.empty[DataFrame]
    val pairs = lshPairs(s, d, upstream)
      .select(col("doc_a"), col("doc_b")).localCheckpoint()
    upstream.foreach(_.unpersist(blocking = false))
    pairs
  }

  private val dupClustersOracle = Some(
    s"""WITH RECURSIVE $lshPairsCtesSql,
             e AS (SELECT doc_a AS a, doc_b AS b FROM lsh_pairs
                   UNION SELECT doc_b, doc_a FROM lsh_pairs),
             reach(a, b) AS (SELECT DISTINCT a, a FROM e
                             UNION
                             SELECT r.a, e.b FROM reach r JOIN e ON r.b = e.a)
             SELECT a AS doc_id, MIN(b) AS cluster_id
             FROM reach GROUP BY a ORDER BY a""")

  /** The converged (doc_id, cluster_id) labeling of the LSH pair graph —
    * the ONE label-propagation run both cluster-consuming entries
    * ([[dupClusters]], [[dupKeepBest]]) derive from. A composed pipeline
    * that needs both the structural labels and the keep decision calls
    * this once and feeds both derivations, instead of paying a second
    * full CC iteration over the identical edge list (round-10 item #5).
    * NOT memoized across entries: the labels sit on localCheckpoint
    * blocks that the harness's between-entry hygiene
    * ([[graft.SessionHygiene.dropEntryState]]) unpersists, so a cached
    * frame would be rebuilt-from-truncated-lineage poison; sharing is
    * by composition within one build chain, the lshPairs/caches rule.
    */
  private[queries] def dupLabels(s: SparkSession, d: String): DataFrame =
    graft.operators.ConnectedComponents
      // probeEvery measured a WASH here (2.6–3.4 s at sf0.1 for both 1
      // and 3, within run variance): the LSH pair derivation dominates
      // the entry, so per-round probing keeps the simpler default. The
      // fused cadence stays available on the operator for graphs where
      // job latency, not edge work, is the bottleneck.
      .labelPropagation(lshEdges(s, d), probeEvery = 1)
      .toDF("doc_id", "cluster_id")

  val dupClusters: CatalogEntry = CatalogEntry(
    "doc_dup_clusters",
    (s, d) => dupLabels(s, d).orderBy("doc_id"),
    dupClustersOracle)

  /** The same cluster resolution through the alternating large-star /
    * small-star algorithm (Kiveris 2014) — diameter-independent O(log² n)
    * rounds, the scale path when components are long chains rather than
    * near-dup clumps. Same oracle as [[dupClusters]]: two different
    * iteration schemes, one declarative fixpoint definition.
    */
  val dupClustersStar: CatalogEntry = CatalogEntry(
    "doc_dup_clusters_star",
    (s, d) => graft.operators.ConnectedComponents.alternatingStar(lshEdges(s, d))
      .toDF("doc_id", "cluster_id").orderBy("doc_id"),
    dupClustersOracle)

  private val PrScale = 1000000000000L
  private val PrIters = 10

  /** PageRank centrality over the near-dup pair graph — the principled
    * "which copy is canonical" signal: in a duplication neighbourhood
    * the most-linked (most-recrawled, most-quoted) document accumulates
    * rank mass, so cluster resolution can keep the authoritative copy
    * instead of the arbitrary min-id. Computed by
    * [[graft.operators.PageRank]] in FIXED-POINT integer arithmetic
    * (floor divisions only) — float PageRank's partition-ordered sums
    * can never hash-match an oracle; integer mass is order-free, so the
    * 10-iteration result is bit-identical in both engines. The oracle
    * unrolls the 10 iterations as chained CTEs over the same lsh_pairs
    * derivation (aggregation in a recursive term is not portable SQL).
    */
  val pagerank: CatalogEntry = CatalogEntry(
    "doc_pagerank",
    (s, d) => graft.operators.PageRank.ranks(lshEdges(s, d), PrIters, PrScale)
      .toDF("doc_id", "r").orderBy("doc_id"),
    Some {
      val base = s"(($PrScale * 15) // 100) // (SELECT n FROM nn)"
      val steps = (1 to PrIters).map { k =>
        val prev = if (k == 1) "r0" else s"r${k - 1}"
        s"""r$k AS (SELECT e.dst AS node,
                           CAST($base + (85 * SUM(p.r // d.outdeg)) // 100 AS BIGINT) AS r
                    FROM e JOIN $prev p ON p.node = e.src JOIN deg d ON d.src = e.src
                    GROUP BY e.dst)"""
      }.mkString(",\n             ")
      s"""WITH RECURSIVE $lshPairsCtesSql,
             e AS (SELECT doc_a AS src, doc_b AS dst FROM lsh_pairs
                   UNION ALL SELECT doc_b, doc_a FROM lsh_pairs),
             deg AS (SELECT src, COUNT(*) AS outdeg FROM e GROUP BY src),
             nn AS (SELECT COUNT(*) AS n FROM deg),
             r0 AS (SELECT src AS node, CAST($PrScale // (SELECT n FROM nn) AS BIGINT) AS r
                    FROM deg),
             $steps
           SELECT node AS doc_id, r FROM r$PrIters ORDER BY doc_id"""
    })

  /** Containment detection, PREFIX-FILTERED — the scale path of
    * [[containmentProfile]] for the question that matters operationally:
    * which docs are at least HALF-covered by another same-source doc
    * (t = 1/2), with their exact max coverage and cover count. The
    * Chaudhuri prefix bound transfers to the asymmetric measure:
    * |A∩B| ≥ t·|A| forces at least one of A's first n − ⌈t·n⌉ + 1
    * df-ordered grams to occur in B, so candidates come from SUBJECT
    * prefixes joined against the full index — hot grams sit outside
    * every prefix and never generate candidates. Exactness for the
    * reported docs: every pair with containment ≥ t survives the
    * filter, and a qualifying doc's true max IS such a pair; sub-t
    * pairs may be pruned but can never be the max of a doc that
    * qualifies. ⌈n/2⌉ computes on n/2.0 — exact in binary, no float
    * boundary can shorten a prefix (unlike 3/10, cf. [[prefixSide]]).
    *
    * Cost history (the r10 board's most expensive honest entry): the
    * prefix plan ran 4.6–5.2 s isolated at sf0.1/local[32] — the dense
    * ~30-word test vocabulary defeats the prefix prune (prefixes keep
    * ~everything; measured r11: 760,881 of 1,245,000 possible directed
    * in-source pairs survive as candidates, and a PPJoin positional
    * bound prunes only 25% more), so the per-pair array verification
    * ships 2×|grams| strings per candidate and dominates. That is why
    * the DEFAULT entry is now cost-based ([[containmentCoveredAuto]]):
    * on this corpus the counted plan wins, on zipfian text the prefix
    * plan wins, and both stay oracle-pinned as entries.
    */
  /** Prefix-filtered covered computation over an already-cached per-doc
    * frame (no caching or checkpointing here — callers own lifecycle).
    *
    * Now the FULL PPJoin stack (Xiao et al. 2008), not the prefix filter
    * alone: candidate pairs carry the positions of their first match in
    * A's df-order, and because both docs' gram lists share the block's
    * total order (df asc, gram asc — [[perDocByDf]]), every other shared
    * gram sits after that match in BOTH lists, so
    * `1 + min(na−1−pa, nb−1−pb)` upper-bounds the true intersection.
    * Pairs whose bound cannot reach the threshold are pruned BEFORE the
    * per-pair sorted-array verification — the stage that ships 2×|grams|
    * strings per pair and dominates this plan (r11 measured the bound
    * pruning 25% of candidates on this corpus: 760,881 → 572,471).
    * Exactness: the prune condition is the integer form
    * `2·bound ≥ na−1`, strictly looser than the post-round threshold
    * `round(ni/na,6) ≥ 0.5` for any na < 10⁶, so no qualifying pair is
    * dropped; the min-position aggregate replaces the old distinct (same
    * shuffle count).
    *
    * Round 12 adds the remaining PPJoin §3.1 piece, the LENGTH filter
    * `2·nb ≥ na−1` (ni ≤ nb, so containment ≥ ½ bounds the target's
    * length from below), placed IN the join condition so short targets
    * are dropped at the probe, before the candidate aggregate. Measured
    * on the dense sf0.1 corpus: 1,501,582 → 1,338,535 gram-pair rows
    * into the aggregate (−11%; the uniform ~40-token doc lengths leave
    * little to prune here — length variance is what it feeds on). The
    * final candidate set is UNCHANGED (577,334 either way): with pb ≥ 0
    * the positional bound `1 + min(na−1−pa, nb−1−pb) ≥ (na−1)/2`
    * implies `2·nb ≥ na−1`, so the length filter is subsumed at the
    * candidate stage — its entire value is the earlier placement, one
    * integer compare per probed row.
    */
  private[graft] def coveredPrefixPlan(perDoc: DataFrame): DataFrame = {
      val subjPrefix = perDoc.select(col("doc_id"), col("source"), col("n").as("na"),
        posexplode(slice(col("gs"), lit(1),
          (col("n") - ceil(col("n") / 2.0) + 1).cast("int"))).as(Seq("pa", "bg")))
      val full = perDoc.select(col("doc_id"), col("source"), col("n").as("nb"),
        posexplode(col("gs")).as(Seq("pb", "bg")))
      val cand = subjPrefix.as("a").join(full.as("b"),
          col("a.source") === col("b.source") && col("a.bg") === col("b.bg") &&
            col("a.doc_id") =!= col("b.doc_id") &&
            // PPJoin LENGTH filter (Xiao 2008 §3.1): ni ≤ nb, so
            // containment ≥ t needs 2·nb ≥ na (integer-loosened to
            // na−1, the positional bound's exactness argument). Applied
            // IN the join condition, it prunes gram-pair rows before
            // the candidate aggregate ever sees them — short subjects
            // stop pairing with much-shorter targets at the probe.
            col("a.na") - 1 <= lit(2) * col("b.nb"))
        .groupBy(col("a.doc_id").as("da"), col("b.doc_id").as("db"))
        .agg(min(struct(col("pa"), col("pb"))).as("m"),
          max(col("na")).as("pna"), max(col("nb")).as("pnb"))
        .filter(lit(2) * (lit(1) +
            least(col("pna") - 1 - col("m.pa"), col("pnb") - 1 - col("m.pb")))
          >= col("pna") - 1)
        .select("da", "db")
      cand
        .join(perDoc.select(col("doc_id").as("da"), col("gsrt").as("gs_a"), col("n").as("na")),
          Seq("da"))
        .join(perDoc.select(col("doc_id").as("db"), col("gsrt").as("gs_b")), Seq("db"))
        .select(col("da"), col("na"),
          graft.functions.Text.bound(
            graft.functions.Text.intersectCardSorted(col("gs_a"), col("gs_b"))) { ni =>
            round(ni / col("na"), 6)
          }.as("cont"))
        .filter(col("cont") >= 0.5)
        .groupBy(col("da").as("doc_id"), col("na").as("n_grams"))
        .agg(max("cont").as("max_containment"),
          count(lit(1)).as("n_half_covering"))
  }

  /** Counted (inverted-index) covered computation: the candidate gram
    * join IS the intersection count — the same one-pass topology as
    * [[containmentProfile]] and naive-mode Jaccard, restricted at the
    * end to the ≥ t rows the covered question wants. No per-pair array
    * verification, no prefix machinery: on a dense vocabulary where the
    * prefix keeps ~everything, the array join ships 2×|grams| strings
    * per candidate pair, and this form beats it (measured r11: see the
    * entry scaladoc); on a zipfian corpus the Σ df² fan-out explodes and
    * the prefix form wins — exactly the naive/prefix trade the Jaccard
    * family established. */
  private[graft] def coveredCountedPlan(bg: DataFrame): DataFrame = {
      val sz = bg.groupBy("doc_id").agg(count(lit(1)).as("n"))
      // Symmetric pair intersections counted ONCE (da < db halves the
      // gram join), mirrored to both directions for the per-subject max.
      val pairs = bg.as("a").join(bg.as("b"),
          col("a.source") === col("b.source") && col("a.bg") === col("b.bg") &&
            col("a.doc_id") < col("b.doc_id"))
        .groupBy(col("a.doc_id").as("da"), col("b.doc_id").as("db"))
        .agg(count(lit(1)).as("n_inter"))
      pairs.union(pairs.select(col("db"), col("da"), col("n_inter")))
        .join(sz.as("za"), col("za.doc_id") === col("da"))
        .select(col("da"),
          // Match the prefix plan's output schema exactly (int n_grams).
          col("za.n").cast("int").as("na"),
          round(col("n_inter") / col("za.n"), 6).as("cont"))
        .filter(col("cont") >= 0.5)
        .groupBy(col("da").as("doc_id"), col("na").as("n_grams"))
        .agg(max("cont").as("max_containment"),
          count(lit(1)).as("n_half_covering"))
  }

  /** The prefix-pinned covered pipeline (kept as its own entry and for
    * the suite's semantic tests). */
  private[graft] def containmentCoveredFrom(docs: DataFrame): DataFrame = {
      val perDoc = perDocByDf(bigramIndex(docs)).cacheOnce()
      val out = coveredPrefixPlan(perDoc).localCheckpoint()
      perDoc.unpersist(blocking = false)
      out
  }

  /** Cost-based covered pipeline: [[ngramMode]]'s df-skew statistic (on
    * the shared 1/8 gram-type sample) routes between the counted and
    * prefix plans — identical result set either way, so the oracle is
    * mode-independent. The bigram index is materialized ONCE: the stat's
    * action fills the cache, the chosen plan reuses it (the prefix route
    * builds its per-doc frame FROM the cached index, not from a second
    * tokenize pass).
    */
  private[graft] def containmentCoveredAuto(docs: DataFrame): DataFrame = {
    val caches = scala.collection.mutable.ListBuffer.empty[DataFrame]
    val bg = bigramIndex(docs).cacheOnce()
    caches += bg
    val sample = bg.filter(pmod(xxhash64(col("source"), col("bg")), lit(8)) === 0)
    val mode = ngramMode(sample)
    val out = (if (mode == "prefix") {
        val perDoc = perDocByDf(bg).cacheOnce()
        caches += perDoc
        coveredPrefixPlan(perDoc)
      } else coveredCountedPlan(bg)).localCheckpoint()
    caches.foreach(_.unpersist(blocking = false))
    out
  }

  /** Deterministic ZIPFIAN mirror corpus, derived in-query from the
    * documents table: doc ids and source blocks are kept, the text is
    * replaced by 40 tokens drawn from a zipf-ish rank distribution —
    * token i of doc d is `w⌊4096/(h+1)⌋` where h is the integer value of
    * the first 3 hex digits of md5(d || ':' || i). With h uniform on
    * [0, 4096), rank r = ⌊4096/(h+1)⌋ gets probability ≈ 1/(r(r+1)) —
    * the heavy-head/long-tail profile of natural text (rank 1 carries
    * ~half the token mass; measured bigram-df CV 1.55 vs the testdata
    * corpus's ≤ 0.7) — in PURE INTEGER arithmetic both engines evaluate
    * bit-identically (no pow/log whose libm rounding could disagree at
    * a floor boundary). This is the fixture that makes the containment
    * chooser's PREFIX route fire ORGANICALLY under the correctness
    * gate: the dense testdata corpus routes every auto entry to
    * counted, so without it the prefix branch was only hash-checked via
    * the force-pinned entry. */
  private[graft] def zipfDocs(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), col("source"),
      expr("""array_join(transform(sequence(1, 40), i ->
        concat('w', cast(4096 div (cast(conv(substring(md5(concat(cast(doc_id as string), ':', cast(i as string))), 1, 3), 16, 10) as int) + 1) as string))), ' ')""")
        .as("text"))

  /** The containment chooser's PREFIX route exercised organically under
    * the correctness gate: the SAME cost-based pipeline as
    * [[containmentCovered]], run over [[zipfDocs]] — the df-skew
    * statistic reads CV ≈ 1.5 on this corpus and routes to the PPJoin
    * prefix plan at build time, so the auto path's prefix branch is
    * hash-checked against the mode-independent counted oracle every
    * round (PlanSpec pins the routing decision and the
    * intersect_card_sorted kernel in the chosen interior plan; the
    * force-pinned [[containmentCoveredPrefix]] keeps covering the
    * kernel on the dense corpus).
    */
  val containmentCoveredZipf: CatalogEntry = CatalogEntry(
    "doc_containment_covered_zipf",
    (s, d) => containmentCoveredAuto(zipfDocs(documents(s, d))),
    Some(
      raw"""WITH zd AS (
              SELECT doc_id, source,
                [ 'w' || CAST(CAST(FLOOR(4096.0/((
                      (strpos('0123456789abcdef', substr(md5(doc_id::VARCHAR || ':' || i::VARCHAR),1,1))-1)*256
                    + (strpos('0123456789abcdef', substr(md5(doc_id::VARCHAR || ':' || i::VARCHAR),2,1))-1)*16
                    + (strpos('0123456789abcdef', substr(md5(doc_id::VARCHAR || ':' || i::VARCHAR),3,1))-1) )+1)) AS INT) AS VARCHAR)
                  FOR i IN range(1,41) ] AS t
              FROM documents),
            bg AS (SELECT DISTINCT doc_id, source,
                     unnest([array_to_string(t[i:i+1], ' ') for i in range(1, len(t))]) AS bg
                   FROM zd),
            sz AS (SELECT doc_id, count(*) AS n FROM bg GROUP BY doc_id),
            ni AS (SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS n_inter
                   FROM bg a JOIN bg b ON a.source = b.source AND a.bg = b.bg AND a.doc_id <> b.doc_id
                   GROUP BY 1, 2)
          SELECT ni.da AS doc_id, za.n AS n_grams,
                 MAX(ROUND(n_inter / za.n, 6)) AS max_containment,
                 CAST(SUM(CASE WHEN ROUND(n_inter / za.n, 6) >= 0.5 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_half_covering
          FROM ni JOIN sz za ON za.doc_id = ni.da
          GROUP BY ni.da, za.n
          HAVING MAX(ROUND(n_inter / za.n, 6)) >= 0.5"""))

  val containmentCovered: CatalogEntry = CatalogEntry(
    "doc_containment_covered",
    (s, d) => containmentCoveredAuto(documents(s, d)),
    Some(
      raw"""WITH bg AS (
              SELECT DISTINCT doc_id, source, bg FROM (
                SELECT doc_id, source, unnest(CASE WHEN len(t) < 2 THEN [array_to_string(t, ' ')]
                  ELSE [array_to_string(t[i:i+1], ' ') for i in range(1, len(t))] END) AS bg
                FROM (SELECT doc_id, source, string_split_regex(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS t
                      FROM documents))),
            sz AS (SELECT doc_id, count(*) AS n FROM bg GROUP BY doc_id),
            ni AS (SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS n_inter
                   FROM bg a JOIN bg b ON a.source = b.source AND a.bg = b.bg AND a.doc_id <> b.doc_id
                   GROUP BY 1, 2)
          SELECT ni.da AS doc_id, za.n AS n_grams,
                 MAX(ROUND(n_inter / za.n, 6)) AS max_containment,
                 CAST(SUM(CASE WHEN ROUND(n_inter / za.n, 6) >= 0.5 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_half_covering
          FROM ni JOIN sz za ON za.doc_id = ni.da
          GROUP BY ni.da, za.n
          HAVING MAX(ROUND(n_inter / za.n, 6)) >= 0.5"""))

  private val SpanW = 8 // span width (tokens) — matches doc_dup_spans
  private val SpanPosScale = 16777216L // 2^24, the winnowing encoding

  /** Span-dedup REWRITE statistics — the decision data of the exact
    * -substring dedup transform (Lee et al. 2022: remove every repeated
    * span, keep its first occurrence): for each document, how many of
    * its [[SpanW]]-token positional grams are repeats of an earlier
    * occurrence (corpus order = (doc_id, pos), first kept), how many
    * TOKENS the union of those repeat spans covers, and the keep ratio
    * after scrubbing. [[dupSpans]] inventories the spans; this entry
    * says what the rewrite would do to each document.
    *
    * Exact union-coverage without an interval fold: positions are
    * strictly increasing per doc and all spans share width W, so
    * |∪ [pᵢ, pᵢ+W−1]| = W + Σ min(W, pᵢ − pᵢ₋₁) — one lag window over
    * the (small) dup-position list, integer arithmetic end to end. The
    * first-occurrence owner is MIN(doc_id·2²⁴ + pos) per gram — the
    * winnowing encoding, same injectivity bound, same loud guard.
    *
    * Scale: one gram-keyed MIN shuffle (map-combined) + one linear
    * join back + a doc-keyed window over dup positions only — never
    * pair-quadratic; the corpus is touched once.
    */
  val spanDedup: CatalogEntry = CatalogEntry(
    "doc_span_dedup",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      import graft.functions.Text
      val toks = documents(s, d)
        // A row with no doc_id can neither own nor be attributed spans —
        // drop it at ingest (null would otherwise null the range guard's
        // condition below and misfire the >=2^39 raise on a missing id).
        .filter(col("doc_id").isNotNull)
        .select(col("doc_id"), Text.normTokens(col("text")).as("tl"))
        .cacheOnce()
      // The MIN(doc_id·2^24 + pos) ownership encoding is injective (and
      // free of silent long wrap) only while pos < 2^24 AND doc_id <
      // 2^39 — guard BOTH loudly: a wrapped owner would corrupt
      // first-occurrence decisions while oracle equality masked it.
      val grams = toks.filter(size(col("tl")) >= SpanW)
        .select(col("doc_id"),
          posexplode(Text.wordNgrams(col("tl"), SpanW)).as(Seq("pos", "g")))
        .select(
          when(col("doc_id") < lit(1L << 39), col("doc_id"))
            .otherwise(expr(s"cast(raise_error('doc_span_dedup: doc_id >= 2^39; " +
              s"widen the ownership encoding') as bigint)")).as("doc_id"),
          when(col("pos") < lit(SpanPosScale), col("pos").cast("long"))
            .otherwise(expr(s"cast(raise_error('doc_span_dedup: gram position >= " +
              s"$SpanPosScale (2^24); raise SpanPosScale') as bigint)")).as("pos"),
          col("g"))
      val own = grams.groupBy("g")
        .agg(min(col("doc_id") * SpanPosScale + col("pos")).as("o"))
      val wd = Window.partitionBy("doc_id").orderBy("pos")
      val cov = grams.join(own, Seq("g"))
        .filter(col("doc_id") * SpanPosScale + col("pos") =!= col("o"))
        .select(col("doc_id"), col("pos"),
          lag("pos", 1).over(wd).as("prev"))
        .select(col("doc_id"),
          when(col("prev").isNull, lit(SpanW.toLong))
            .otherwise(least(lit(SpanW.toLong), col("pos") - col("prev"))).as("cv"))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_dup_grams"), sum("cv").as("removed"))
      val out = toks.select(col("doc_id"), size(col("tl")).cast("long").as("n_tokens"))
        .join(cov, Seq("doc_id"), "left")
        .select(col("doc_id"), col("n_tokens"),
          coalesce(col("n_dup_grams"), lit(0L)).as("n_dup_grams"),
          coalesce(col("removed"), lit(0L)).as("n_tokens_removed"),
          round((col("n_tokens") - coalesce(col("removed"), lit(0L)))
            / col("n_tokens"), 6).as("keep_ratio"))
        .orderBy("doc_id")
        .localCheckpoint()
      toks.unpersist(blocking = false)
      out
    },
    Some(
      raw"""WITH toks AS (SELECT doc_id, ${PipelineCatalog.normToksSql} AS tl FROM documents),
            g AS (SELECT doc_id, CAST(pg.pos AS BIGINT) AS pos, pg.g
                  FROM (SELECT doc_id,
                          unnest([{'pos': i - 1, 'g': array_to_string(tl[i:i+${SpanW - 1}], ' ')}
                                  for i in range(1, len(tl) - ${SpanW - 2})]) AS pg
                        FROM toks WHERE len(tl) >= $SpanW)),
            own AS (SELECT g, MIN(doc_id * $SpanPosScale + pos) AS o FROM g GROUP BY g),
            dup AS (SELECT gr.doc_id, gr.pos
                    FROM g gr JOIN own ON own.g = gr.g
                    WHERE gr.doc_id * $SpanPosScale + gr.pos <> own.o),
            cv AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_dup_grams,
                          CAST(SUM(CASE WHEN prev IS NULL THEN $SpanW
                                        ELSE LEAST($SpanW, pos - prev) END) AS BIGINT) AS removed
                   FROM (SELECT doc_id, pos,
                                lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) AS prev
                         FROM dup)
                   GROUP BY doc_id),
            nt AS (SELECT doc_id, CAST(len(tl) AS BIGINT) AS n_tokens FROM toks)
          SELECT nt.doc_id, nt.n_tokens,
                 COALESCE(cv.n_dup_grams, 0) AS n_dup_grams,
                 COALESCE(cv.removed, 0) AS n_tokens_removed,
                 ROUND(CAST(nt.n_tokens - COALESCE(cv.removed, 0) AS DOUBLE)
                       / nt.n_tokens, 6) AS keep_ratio
          FROM nt LEFT JOIN cv ON cv.doc_id = nt.doc_id
          ORDER BY nt.doc_id"""))

  /** The prefix-filtered covered plan force-pinned as its own entry,
    * against the SAME oracle — the [[ngramJaccardPrefix]] pattern: both
    * topologies stay oracle-checked every round regardless of what the
    * chooser picks for the default entry, and the zipfian-corpus scale
    * path cannot silently rot while the test corpus keeps routing the
    * default to the counted plan.
    */
  val containmentCoveredPrefix: CatalogEntry = CatalogEntry(
    "doc_containment_covered_prefix",
    (s, d) => containmentCoveredFrom(documents(s, d)),
    containmentCovered.oracle)

  /** Triangle count + local clustering coefficient over the near-dup
    * graph — the density diagnostic that separates CLIQUE-like
    * duplication neighbourhoods (template families, boilerplate — high
    * coefficient, safe to collapse to one canonical doc) from CHAIN-like
    * ones (drifting revisions — low coefficient, collapsing loses
    * distinct content). Standard distributed triangle enumeration: on
    * min-id-oriented edges (a<b), join two-paths b⋈c through a, then a
    * semi join against the edge set closes each wedge — work ∝ Σ deg²,
    * never all-triples. Coefficient = 2T / (deg·(deg−1)) from exact
    * integers, rounded once.
    */
  val graphTriangles: CatalogEntry = CatalogEntry(
    "doc_graph_triangles",
    (s, d) => {
      val e = lshEdges(s, d) // (doc_a < doc_b), unique
        .select(col("doc_a").as("u"), col("doc_b").as("v"))
        .cacheOnce()
      val sym = e.union(e.select(col("v").as("u"), col("u").as("v")))
      val deg = sym.groupBy("u").agg(count(lit(1)).as("deg"))
      // Wedges u<v<w centered anywhere: ordered edges (u,v) and (u,w),
      // v<w; the closing edge (v,w) is ordered too, so ONE semi join.
      val wedges = e.as("x").join(e.as("y"),
          col("x.u") === col("y.u") && col("x.v") < col("y.v"))
        .select(col("x.u").as("a"), col("x.v").as("b"), col("y.v").as("c"))
      val tris = wedges.join(e.select(col("u").as("b"), col("v").as("c")),
        Seq("b", "c"), "left_semi")
      val perNode = tris.select(explode(array(col("a"), col("b"), col("c"))).as("u"))
        .groupBy("u").agg(count(lit(1)).as("tri"))
      val out = deg.join(perNode, Seq("u"), "left")
        .select(col("u").as("doc_id"), col("deg"),
          coalesce(col("tri"), lit(0L)).as("triangles"))
        .withColumn("clustering_coef",
          when(col("deg") < 2, lit(0.0))
            .otherwise(round(col("triangles") * 2 / (col("deg") * (col("deg") - 1)), 6)))
        .localCheckpoint()
      e.unpersist(blocking = false)
      out
    },
    Some(s"""WITH RECURSIVE $lshPairsCtesSql,
               e AS (SELECT doc_a AS u, doc_b AS v FROM lsh_pairs),
               sym AS (SELECT u, v FROM e UNION ALL SELECT v, u FROM e),
               deg AS (SELECT u, COUNT(*) AS deg FROM sym GROUP BY u),
               tri AS (SELECT x.u AS a, x.v AS b, y.v AS c
                       FROM e x JOIN e y ON y.u = x.u AND x.v < y.v
                       WHERE EXISTS (SELECT 1 FROM e z WHERE z.u = x.v AND z.v = y.v)),
               pn AS (SELECT n AS u, COUNT(*) AS tri FROM (
                        SELECT a AS n FROM tri UNION ALL SELECT b FROM tri
                        UNION ALL SELECT c FROM tri) GROUP BY n)
             SELECT deg.u AS doc_id, deg.deg, COALESCE(pn.tri, 0) AS triangles,
                    CASE WHEN deg.deg < 2 THEN 0.0
                         ELSE ROUND(COALESCE(pn.tri, 0) * 2 / (deg.deg * (deg.deg - 1)), 6)
                    END AS clustering_coef
             FROM deg LEFT JOIN pn ON pn.u = deg.u"""))

  /** Containment coverage profile — the asymmetric dedup signal Jaccard
    * misses: a short document fully quoted inside a longer one has
    * containment |A∩B|/|A| ≈ 1 while Jaccard |A∩B|/|A∪B| stays far below
    * any threshold. For EVERY document: the maximum fraction of its
    * bigrams covered by any other same-source document, and how many
    * documents cover at least half of it (docs with no overlap report 0).
    * Same one-pass inverted-index topology as the naive Jaccard mode —
    * the directed candidate join on shared grams IS the intersection
    * count — then a doc_id-keyed aggregate; the only new cost over the
    * Jaccard entry is the ×2 directed fan-out. At 100 TB the same
    * df-skew caveat applies; note the prefix-filter machinery (the
    * containment t·|A| bound, Chaudhuri 2006) prunes against a
    * THRESHOLD, and this profile has none — it reports max_containment
    * over ALL overlapping pairs — so it composes with the covered
    * entries' router but cannot bolt on here without changing
    * semantics.
    *
    * r15 adjudication of the r14 1.50×-of-record baseline flag:
    * isolated min-of-5 at sf0.1 measured 3.325 s @ cal_32t 0.467 =
    * 1.11× of the 2.746 s record — in-band; the record was flattered by
    * fixed-order seeding adjacency (the bias r15's order-shuffled
    * seeding removes) and the 4.15 s driver reading was full-run
    * co-tenant inflation. Code untouched; record re-seeded.
    */
  val containmentProfile: CatalogEntry = CatalogEntry(
    "doc_containment_profile",
    (s, d) => {
      val bg = bigramIndex(documents(s, d)).cacheOnce()
      val sz = bg.groupBy("doc_id").agg(count(lit(1)).as("n"))
      // Intersections are symmetric: count each unordered pair ONCE
      // (da < db halves the gram join's fan-out and the pair aggregate),
      // then mirror the tiny pair list to both directions.
      val pairs = bg.as("a").join(bg.as("b"),
          col("a.source") === col("b.source") && col("a.bg") === col("b.bg") &&
            col("a.doc_id") < col("b.doc_id"))
        .groupBy(col("a.doc_id").as("da"), col("b.doc_id").as("db"))
        .agg(count(lit(1)).as("n_inter"))
      val cont = pairs
        .union(pairs.select(col("db"), col("da"), col("n_inter")))
        .join(sz.as("za"), col("za.doc_id") === col("da"))
        .select(col("da"), round(col("n_inter") / col("za.n"), 6).as("cont"))
        .groupBy("da")
        .agg(max(col("cont")).as("max_containment"),
          sum(when(col("cont") >= 0.5, 1L).otherwise(0L)).as("n_half_covering"))
      val out = sz
        .join(cont, col("doc_id") === col("da"), "left")
        .select(col("doc_id"), col("n").as("n_grams"),
          coalesce(col("max_containment"), lit(0.0)).as("max_containment"),
          coalesce(col("n_half_covering"), lit(0L)).as("n_half_covering"))
        .localCheckpoint()
      bg.unpersist(blocking = false)
      out
    },
    Some(
      raw"""WITH bg AS (
              SELECT DISTINCT doc_id, source, bg FROM (
                SELECT doc_id, source, unnest(CASE WHEN len(t) < 2 THEN [array_to_string(t, ' ')]
                  ELSE [array_to_string(t[i:i+1], ' ') for i in range(1, len(t))] END) AS bg
                FROM (SELECT doc_id, source, string_split_regex(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS t
                      FROM documents))),
            sz AS (SELECT doc_id, count(*) AS n FROM bg GROUP BY doc_id),
            ni AS (SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS n_inter
                   FROM bg a JOIN bg b ON a.source = b.source AND a.bg = b.bg AND a.doc_id <> b.doc_id
                   GROUP BY 1, 2),
            c AS (SELECT da, MAX(ROUND(n_inter / za.n, 6)) AS max_containment,
                         SUM(CASE WHEN ROUND(n_inter / za.n, 6) >= 0.5 THEN 1 ELSE 0 END) AS n_half_covering
                  FROM ni JOIN sz za ON za.doc_id = ni.da GROUP BY da)
          SELECT sz.doc_id, sz.n AS n_grams,
                 COALESCE(c.max_containment, 0.0) AS max_containment,
                 CAST(COALESCE(c.n_half_covering, 0) AS BIGINT) AS n_half_covering
          FROM sz LEFT JOIN c ON c.da = sz.doc_id"""))

  /** Cross-document repeated-span inventory — the exact-substring dedup
    * signal (Lee et al. 2022, "Deduplicating Training Data Makes Language
    * Models Better"): every 8-token span that occurs in ≥ 2 documents,
    * with its document count, total occurrence count (within-doc repeats
    * included — hence [[graft.functions.Text.wordNgrams]] raw, not the
    * distinct shingle set), and earliest carrier. Distinct from
    * `doc_decontaminate` (which flags corpus docs against a designated
    * benchmark slice): this is the corpus-global span census a
    * span-removal pass consumes.
    *
    * 100 TB shape: per-row n-gram projection, then ONE hash-shuffle
    * keyed on the span — uniform high-cardinality key, the same
    * single-aggregate topology as exact dedup. Output is keyed by the
    * span's md5 so the result stays narrow no matter the span width; the
    * suffix-array formulation the paper uses is the single-machine
    * equivalent — the shuffle IS the distributed sort it replaces.
    */
  val dupSpans: CatalogEntry = CatalogEntry(
    "doc_dup_spans",
    (s, d) => documents(s, d)
      .select(col("doc_id"),
        explode(graft.functions.Text.wordNgrams(
          graft.functions.Text.normTokens(col("text")), 8)).as("g"))
      .groupBy("g")
      .agg(countDistinct("doc_id").as("n_docs"), count(lit(1)).as("n_occ"),
        min("doc_id").as("first_doc"))
      .filter(col("n_docs") >= 2)
      .select(md5(col("g")).as("span_hash"), col("n_docs"), col("n_occ"),
        col("first_doc")),
    Some(
      raw"""WITH t AS (SELECT doc_id, string_split_regex(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS t
                       FROM documents),
                g AS (SELECT doc_id, unnest(CASE WHEN len(t) < 8 THEN [array_to_string(t, ' ')]
                        ELSE [array_to_string(t[i:i+7], ' ') for i in range(1, len(t) - 6)] END) AS g
                      FROM t)
            SELECT md5(g) AS span_hash, COUNT(DISTINCT doc_id) AS n_docs,
                   COUNT(*) AS n_occ, MIN(doc_id) AS first_doc
            FROM g GROUP BY g HAVING COUNT(DISTINCT doc_id) >= 2"""))

  /** Sorted-neighborhood near-dup candidates (Hernández & Stolfo 1995):
    * sort the corpus by its normalized text, compare each doc only to its
    * w−1 = 2 successors in the total order, keep pairs at Jaccard ≥ 0.5
    * on 3-shingles. The third candidate-generation scheme next to LSH
    * banding and gram blocking: near-identical texts are lexicographic
    * neighbors, so the candidate count is ≤ (w−1)·n — linear, no
    * all-pairs join, no hash buckets.
    *
    * 100 TB shape: the global order comes from
    * [[graft.operators.GlobalRank]] (range shuffle + zipWithIndex), NOT
    * an unpartitioned window — no single-task sort. Neighbor pairing is
    * an equi-join on rank+offset (narrow, uniform), and verification
    * reuses the sorted-shingle linear merge from the LSH path. The
    * window w trades recall for cost exactly as in the paper; multi-pass
    * SNM (different sort keys per pass) composes by unioning pair lists.
    */
  val sortedNeighborhood: CatalogEntry = CatalogEntry(
    "doc_sorted_neighborhood",
    (s, d) => {
      val docs = documents(s, d).select(col("doc_id"),
        graft.functions.Text.normalize(col("text")).as("k"),
        sort_array(graft.functions.Text.shingles(col("text"), 3)).as("shs"))
      val ranked = graft.operators.GlobalRank
        .withRank(docs, Seq(col("k"), col("doc_id")), 32, "r").cacheOnce()
      val probes = ranked.select(col("doc_id").as("da"), col("shs").as("shs_a"),
          col("r"), explode(array(lit(1L), lit(2L))).as("off"))
        .select(col("da"), col("shs_a"), (col("r") + col("off")).as("r"))
      val out = probes.join(ranked.select(col("r"), col("doc_id").as("db"),
          col("shs").as("shs_b")), Seq("r"))
        .select(least(col("da"), col("db")).as("doc_a"),
          greatest(col("da"), col("db")).as("doc_b"),
          graft.functions.Text.bound(
            graft.functions.Text.intersectCardSorted(col("shs_a"), col("shs_b"))) { ni =>
            round(ni / (size(col("shs_a")) + size(col("shs_b")) - ni), 6)
          }.as("jaccard"))
        .filter(col("jaccard") >= JaccardThreshold)
        .localCheckpoint()
      ranked.unpersist(blocking = false)
      out
    },
    Some(
      s"""WITH sh AS ($shinglesSql),
              k AS (SELECT doc_id, regexp_replace(lower(trim(text)), '\\s+', ' ', 'g') AS k
                    FROM documents),
              r AS (SELECT doc_id, row_number() OVER (ORDER BY k, doc_id) AS r FROM k),
              p AS (SELECT a.doc_id AS da, b.doc_id AS db
                    FROM r a JOIN r b ON b.r - a.r IN (1, 2)),
              ni AS (SELECT p.da, p.db, count(*) AS n_inter
                     FROM p JOIN sh x ON x.doc_id = p.da
                            JOIN sh y ON y.doc_id = p.db AND y.sh = x.sh
                     GROUP BY 1, 2),
              sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id)
          SELECT LEAST(ni.da, ni.db) AS doc_a, GREATEST(ni.da, ni.db) AS doc_b,
                 ROUND(n_inter / (za.n + zb.n - n_inter), 6) AS jaccard
          FROM ni JOIN sz za ON za.doc_id = ni.da JOIN sz zb ON zb.doc_id = ni.db
          WHERE ROUND(n_inter / (za.n + zb.n - n_inter), 6) >= $JaccardThreshold"""))

  /** The keep/drop DECISION over resolved dup clusters: per cluster, the
    * survivor is the member with the most content (max whitespace-token
    * count, ties to the smallest doc_id) — the production "keep best"
    * policy, vs [[dupClusters]]' structural min-id label and
    * cleanCorpus's min-id survivor. Emitted per cluster with its member
    * count and the winning length, so a drop pass is one broadcast
    * anti-join of keepers against the labeled corpus.
    *
    * 100 TB shape: the labels frame is bounded by docs-in-some-pair
    * (LSH already collapsed the corpus); both policy aggregates key on
    * cluster_id over that frame, and the max-tokens frame that rides
    * back in is CLUSTERS-sized — broadcastable by construction.
    */
  val dupKeepBest: CatalogEntry = CatalogEntry(
    "doc_dup_keep_best",
    (s, d) => keepBestFrom(dupLabels(s, d), documents(s, d)),
    keepBestOracle)

  /** The keep decision as a function of an ALREADY-LABELED cluster frame —
    * so a composed pipeline reuses one [[dupLabels]] run for both the
    * labels themselves and this derivation (no second CC iteration).
    */
  private[queries] def keepBestFrom(labels: DataFrame, docs: DataFrame): DataFrame = {
      val nt = docs.select(col("doc_id"),
        size(graft.functions.Text.wsTokens(col("text"))).cast("long").as("n_tokens"))
      val j = labels.join(nt, Seq("doc_id"))
      val m = j.groupBy("cluster_id")
        .agg(max("n_tokens").as("max_tokens"), count(lit(1)).as("n_members"))
      j.join(broadcast(m), Seq("cluster_id"))
        .filter(col("n_tokens") === col("max_tokens"))
        .groupBy("cluster_id", "max_tokens", "n_members")
        .agg(min("doc_id").as("keeper_id"))
        .select(col("cluster_id"), col("keeper_id"), col("n_members"), col("max_tokens"))
  }

  private def keepBestOracle = Some(
      raw"""WITH RECURSIVE $lshPairsCtesSql,
             e AS (SELECT doc_a AS a, doc_b AS b FROM lsh_pairs
                   UNION SELECT doc_b, doc_a FROM lsh_pairs),
             reach(a, b) AS (SELECT DISTINCT a, a FROM e
                             UNION
                             SELECT r.a, e.b FROM reach r JOIN e ON r.b = e.a),
             labels AS (SELECT a AS doc_id, MIN(b) AS cluster_id FROM reach GROUP BY a),
             nt AS (SELECT doc_id,
                           CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS n_tokens
                    FROM documents),
             m AS (SELECT l.cluster_id, MAX(n.n_tokens) AS max_tokens,
                          CAST(COUNT(*) AS BIGINT) AS n_members
                   FROM labels l JOIN nt n ON n.doc_id = l.doc_id GROUP BY 1)
           SELECT m.cluster_id, MIN(l.doc_id) AS keeper_id,
                  MAX(m.n_members) AS n_members, MAX(m.max_tokens) AS max_tokens
           FROM m JOIN labels l ON l.cluster_id = m.cluster_id
                JOIN nt n ON n.doc_id = l.doc_id AND n.n_tokens = m.max_tokens
           GROUP BY m.cluster_id""")

  /** MinHash estimator calibration on the LSH candidates: per candidate
    * pair, the signature-agreement estimate (matching components / K, the
    * unbiased Jaccard estimator MinHash is built on) NEXT TO the exact
    * sorted-merge Jaccard and their absolute error — index quality
    * measured as data, the text sibling of `emb_knn_recall`. Unlike
    * `doc_near_dup_lsh` there is NO threshold: calibration wants the
    * uncut error distribution, false positives included.
    *
    * Cost is the near-dup pipeline's own candidate stage plus two
    * K-column signature lookups per pair — no extra corpus pass, so the
    * diagnostic rides at candidate (not corpus) scale. Zero-intersection
    * candidates cannot exist (equal band hash ⇒ equal min-md5 strings ⇒
    * a shared shingle), but the oracle still outer-joins the
    * intersection counts so the two sides agree by construction, not by
    * that argument.
    */
  val lshCalibration: CatalogEntry = CatalogEntry(
    "doc_lsh_calibration",
    (s, d) => {
      // Same candidate stage object as lshPairs — the calibration can
      // never measure a different index than the one in production.
      val (arrays, sig, cand) =
        lshCandidateStage(s, d, scala.collection.mutable.ListBuffer.empty)
      val sa = sig.select(col("doc_id").as("da") +:
        (0 until K).map(i => col(s"s$i").as(s"a$i")): _*)
      val sb = sig.select(col("doc_id").as("db") +:
        (0 until K).map(i => col(s"s$i").as(s"b$i")): _*)
      val matches = (0 until K)
        .map(i => when(col(s"a$i") === col(s"b$i"), 1).otherwise(0))
        .reduce(_ + _)
      cand.join(sa, "da").join(sb, "db")
        .join(arrays.select(col("doc_id").as("da"), col("shsrt").as("shs_a")), Seq("da"))
        .join(arrays.select(col("doc_id").as("db"), col("shsrt").as("shs_b")), Seq("db"))
        .select(col("da").as("doc_a"), col("db").as("doc_b"),
          round(matches.cast("double") / lit(K), 6).as("est_sim"),
          graft.functions.Text.bound(
            graft.functions.Text.intersectCardSorted(col("shs_a"), col("shs_b"))) { ni =>
            round(ni / (size(col("shs_a")) + size(col("shs_b")) - ni), 6)
          }.as("jaccard"))
        .withColumn("abs_err", round(abs(col("est_sim") - col("jaccard")), 6))
    },
    Some {
      val est = (0 until K)
        .map(i => s"CASE WHEN a.s$i = b.s$i THEN 1 ELSE 0 END")
        .mkString(" + ")
      s"""WITH $lshPairsCtesSql
          SELECT doc_a, doc_b, est_sim, jaccard,
                 ROUND(ABS(est_sim - jaccard), 6) AS abs_err
          FROM (SELECT c.da AS doc_a, c.db AS doc_b,
                       ROUND(CAST(($est) AS DOUBLE) / $K, 6) AS est_sim,
                       ROUND(COALESCE(ni.n_inter, 0)
                             / (za.n + zb.n - COALESCE(ni.n_inter, 0)), 6) AS jaccard
                FROM cand c
                JOIN sig a ON a.doc_id = c.da
                JOIN sig b ON b.doc_id = c.db
                LEFT JOIN ni ON ni.da = c.da AND ni.db = c.db
                JOIN sz za ON za.doc_id = c.da
                JOIN sz zb ON zb.doc_id = c.db)"""
    })

  /** SimHash near-duplicates by Hamming distance — the Manku–Jain–Sarma
    * construction (WWW 2007, Google's crawl dedup): split the 32-bit
    * signature into 4 byte blocks; by pigeonhole, two signatures within
    * Hamming distance 3 (3 differing bits touch at most 3 blocks) agree
    * EXACTLY on at least one block, so candidates come from 4 block-keyed
    * equi self-joins and only candidates pay the popcount. Unlike the
    * md5-banded MinHash (Jaccard on shingle sets), this prices SEMANTIC
    * bit drift of the simhash family — the two candidate generators
    * catch different duplicate classes and production crawl dedup runs
    * both. Recall is EXACT, not probabilistic: every pair within
    * distance ≤ 3 shares a block by construction (the spec recounts this
    * against a brute-force sweep), distance-0 pairs (the
    * [[simHashDupGroups]] collisions) included as hamming = 0.
    *
    * 100 TB shape: 4 tables × 256 buckets on a 32-bit signature — the
    * in-bucket pair work is Σ|bucket|², the accepted simhash-index
    * bound; production widens to 64-bit signatures with 16-bit blocks
    * (4 tables × 65536 buckets — same plan, 256× smaller buckets), a
    * constant swap in [[simhashDF]]. The pair columns carry two LONGS
    * (signatures ride along; no shingle text ever shuffles), and the
    * exact filter is two integer ops per candidate.
    */
  val simhashHamming: CatalogEntry = CatalogEntry(
    "doc_simhash_hamming",
    (s, d) => {
      val sig = simhashDF(s, d).cacheOnce() // feeds all 4 block tables
      val bands = sig.select(col("doc_id"), col("simhash"),
        explode(array((0 until 4).map(k => struct(lit(k).as("k"),
          expr(s"shiftright(simhash, ${8 * k}) & 255").as("v"))): _*)).as("b"))
        .select(col("doc_id"), col("simhash"), col("b.k").as("k"), col("b.v").as("v"))
      bands.as("a").join(bands.as("b"),
          col("a.k") === col("b.k") && col("a.v") === col("b.v") &&
            col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
          col("a.simhash").as("ha"), col("b.simhash").as("hb"))
        .distinct()
        .select(col("doc_a"), col("doc_b"),
          expr("bit_count(ha ^ hb)").cast("long").as("hamming"))
        .filter(col("hamming") <= 3)
    },
    Some(s"""WITH $simhashCtesSql,
              bands AS (SELECT doc_id, simhash, ks.k, (simhash >> (8 * ks.k)) & 255 AS v
                        FROM sig CROSS JOIN (SELECT unnest(range(0, 4)) AS k) ks),
              cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
                              a.simhash AS ha, b.simhash AS hb
                       FROM bands a JOIN bands b
                         ON a.k = b.k AND a.v = b.v AND a.doc_id < b.doc_id)
            SELECT doc_a, doc_b, CAST(bit_count(xor(ha, hb)) AS BIGINT) AS hamming
            FROM cand WHERE bit_count(xor(ha, hb)) <= 3"""))

  /** b-bit minwise hashing (Li & König, WWW 2010) measured against the
    * full signature AND the exact Jaccard on the SAME candidate pairs:
    * per pair, the 2-bit component-agreement count next to the full
    * 128-bit agreement count, both bias-corrected estimates, and their
    * absolute errors vs the exact sorted-merge Jaccard. The b-bit
    * estimator inverts E[agree] ≈ J + (1 − J)/2^b — for b = 2,
    * Ĵ = (4C − 1)/3 with C the agreement fraction (the paper's
    * small-density simplification: non-matching minima land on any of
    * the 2^b low-bit values uniformly; exact on random permutations,
    * an approximation for md5-ranked minima, WHICH IS EXACTLY WHAT
    * err_b2 measures as data). est_b2 < 0 happens when agreement falls
    * below the 1/4 chance floor — preserved, not clamped, so the
    * estimator's true sampling error is visible.
    *
    * Why it earns a row next to `doc_lsh_calibration`: the b-bit trade
    * is STORAGE — the dedup index at 100 TB carries the signature per
    * document, and 2 bits × K components is 3 bytes vs the 192-byte
    * full-md5 signature, a 64× shrink the paper shows costs only a
    * variance factor. This entry prices that trade on the production
    * index's own candidates (same [[lshCandidateStage]] object — no
    * drift possible), at candidate scale, not corpus scale.
    *
    * Exactness: agreement counts are integer; both estimates are ONE
    * double division from integers (÷K and ÷3K against literal
    * denominators); the low-2-bit extraction reads the LAST hex char of
    * the md5 (lowercase on both engines) — integer arithmetic, no
    * float anywhere before the final rounded divisions.
    */
  val bbitMinhash: CatalogEntry = CatalogEntry(
    "doc_bbit_minhash",
    (s, d) => {
      val (arrays, sig, cand) =
        lshCandidateStage(s, d, scala.collection.mutable.ListBuffer.empty)
      val sa = sig.select(col("doc_id").as("da") +:
        (0 until K).map(i => col(s"s$i").as(s"a$i")): _*)
      val sb = sig.select(col("doc_id").as("db") +:
        (0 until K).map(i => col(s"s$i").as(s"b$i")): _*)
      val kFull = (0 until K)
        .map(i => when(col(s"a$i") === col(s"b$i"), 1L).otherwise(0L))
        .reduce(_ + _)
      def low2(c: org.apache.spark.sql.Column) =
        conv(substring(c, 32, 1), 16, 10).cast("long") % 4
      val kB2 = (0 until K)
        .map(i => when(low2(col(s"a$i")) === low2(col(s"b$i")), 1L).otherwise(0L))
        .reduce(_ + _)
      cand.join(sa, "da").join(sb, "db")
        .join(arrays.select(col("doc_id").as("da"), col("shsrt").as("shs_a")), Seq("da"))
        .join(arrays.select(col("doc_id").as("db"), col("shsrt").as("shs_b")), Seq("db"))
        .select(col("da").as("doc_a"), col("db").as("doc_b"),
          kFull.as("k_full"), kB2.as("k_b2"),
          graft.functions.Text.bound(
            graft.functions.Text.intersectCardSorted(col("shs_a"), col("shs_b"))) { ni =>
            round(ni / (size(col("shs_a")) + size(col("shs_b")) - ni), 6)
          }.as("jaccard"))
        .withColumn("est_full", round(col("k_full").cast("double") / K, 6))
        .withColumn("est_b2",
          round((col("k_b2") * 4 - lit(K.toLong)).cast("double") / lit(3.0 * K), 6))
        .withColumn("err_full", round(abs(col("est_full") - col("jaccard")), 6))
        .withColumn("err_b2", round(abs(col("est_b2") - col("jaccard")), 6))
    },
    Some {
      val kf = (0 until K)
        .map(i => s"CASE WHEN a.s$i = b.s$i THEN 1 ELSE 0 END")
        .mkString(" + ")
      def low2(side: Char, i: Int) =
        s"((strpos('0123456789abcdef', substr($side.s$i, 32, 1)) - 1) % 4)"
      val kb = (0 until K)
        .map(i => s"CASE WHEN ${low2('a', i)} = ${low2('b', i)} THEN 1 ELSE 0 END")
        .mkString(" + ")
      s"""WITH $lshPairsCtesSql
          SELECT doc_a, doc_b, k_full, k_b2, jaccard,
                 ROUND(CAST(k_full AS DOUBLE) / $K, 6) AS est_full,
                 ROUND(CAST(k_b2 * 4 - $K AS DOUBLE) / ${3.0 * K}, 6) AS est_b2,
                 ROUND(ABS(ROUND(CAST(k_full AS DOUBLE) / $K, 6) - jaccard), 6) AS err_full,
                 ROUND(ABS(ROUND(CAST(k_b2 * 4 - $K AS DOUBLE) / ${3.0 * K}, 6) - jaccard), 6) AS err_b2
          FROM (SELECT c.da AS doc_a, c.db AS doc_b,
                       CAST(($kf) AS BIGINT) AS k_full,
                       CAST(($kb) AS BIGINT) AS k_b2,
                       ROUND(COALESCE(ni.n_inter, 0)
                             / (za.n + zb.n - COALESCE(ni.n_inter, 0)), 6) AS jaccard
                FROM cand c
                JOIN sig a ON a.doc_id = c.da
                JOIN sig b ON b.doc_id = c.db
                LEFT JOIN ni ON ni.da = c.da AND ni.db = c.db
                JOIN sz za ON za.doc_id = c.da
                JOIN sz zb ON zb.doc_id = c.db)"""
    })

  /** k-core decomposition of the dup graph (k = 2, the smallest core that
    * separates dup CHAINS from dup CLIQUES): repeatedly peel nodes of
    * degree < k, emit the surviving nodes with their residual degree —
    * the graph-density complement of `doc_graph_triangles` (a node can
    * have many neighbors yet zero triangles; the 2-core keeps exactly the
    * cyclic cores where transitive dup resolution is non-trivial).
    *
    * The catalog form peels a FIXED $KCoreRounds rounds so the DuckDB
    * oracle can UNROLL the same rounds as plain CTEs — both engines
    * compute "the ≥k-bound after R peels" even on an unconverged chain,
    * so equality is by construction, not by a convergence argument. Each
    * round is edge-proportional (degree aggregate + two semi joins) and
    * the edge list is materialized per round (the dupClusters A/B: with
    * self-referencing rounds the fused plan grows ~5× per round).
    * Production swaps the fixed bound for the dupClusters-style
    * one-scalar-per-round fixpoint probe.
    */
  val graphKCore: CatalogEntry = CatalogEntry(
    "doc_graph_kcore",
    (s, d) => {
      var e = lshEdges(s, d).select(col("doc_a").as("u"), col("doc_b").as("v"))
      // The edge frame is checkpointed — the gate count is one cheap
      // scan of resident blocks; sub-threshold peel rounds run in a
      // child session carrying the small-graph profile (see
      // operators.SmallGraph), the final aggregate back on the caller's.
      e = graft.operators.SmallGraph.rebase(e,
        graft.operators.SmallGraph.sessionFor(s, e.count()))
      locally {
        for (_ <- 1 to KCoreRounds) {
          val sym = e.union(e.select(col("v").as("u"), col("u").as("v")))
          val alive = sym.groupBy("u").agg(count(lit(1)).as("deg"))
            .filter(col("deg") >= CoreK).select("u")
          // Negative result, measured so it is not re-tried: fusing two
          // peel rounds between checkpoints (the PageRank round-fusion
          // trade, 45e7014) is SLOWER here — 2.62 s vs 2.16 s isolated at
          // sf0.1 — because a fused step references its un-cached
          // predecessor ~5× and recomputes the semi joins; PageRank's
          // fused frame was a cached rank vector, this one is a join
          // pipeline. Per-round materialization of the shrinking edge
          // list is the cheaper trade.
          e = e.join(alive, Seq("u"), "left_semi")
            .join(alive.withColumnRenamed("u", "v"), Seq("v"), "left_semi")
            .select("u", "v").localCheckpoint()
        }
      }
      e = graft.operators.SmallGraph.rebase(e, s)
      val sym = e.union(e.select(col("v").as("u"), col("u").as("v")))
      sym.groupBy("u").agg(count(lit(1)).as("core_deg"))
        .select(col("u").as("doc_id"), col("core_deg"))
    },
    Some {
      // MATERIALIZED is load-bearing: DuckDB inlines plain CTEs at every
      // reference, and each unrolled round references its predecessor ~5
      // times — 5^rounds re-evaluations of the whole LSH pipeline without
      // it (observed as an fd-exhaustion error, not just slowness).
      val rounds = (0 until KCoreRounds).map { r =>
        s"""d$r AS MATERIALIZED (SELECT n, COUNT(*) AS deg FROM (
                      SELECT u AS n FROM e$r UNION ALL SELECT v FROM e$r) GROUP BY n),
            e${r + 1} AS MATERIALIZED (SELECT u, v FROM e$r
                          WHERE u IN (SELECT n FROM d$r WHERE deg >= $CoreK)
                            AND v IN (SELECT n FROM d$r WHERE deg >= $CoreK))"""
      }.mkString(",\n")
      s"""WITH RECURSIVE $lshPairsCtesSql,
            e0 AS MATERIALIZED (SELECT doc_a AS u, doc_b AS v FROM lsh_pairs),
            $rounds
          SELECT n AS doc_id, deg AS core_deg FROM (
            SELECT n, COUNT(*) AS deg FROM (
              SELECT u AS n FROM e$KCoreRounds
              UNION ALL SELECT v FROM e$KCoreRounds) GROUP BY n)"""
    })

  /** Cross-source contamination matrix — provenance over the near-dup
    * graph: every ≥-threshold LSH pair bucketed by its UNORDERED source
    * pair (`least/greatest` canonicalization), with each cell's share of
    * all dup pairs. The diagonal is within-source boilerplate; an
    * off-diagonal hot cell says one source republishes another — the
    * signal that decides which source to drop or down-weight before
    * training (the provenance sibling of `source_divergence_matrix`,
    * which compares vocabularies, not copies).
    *
    * Shape: the edge list is the same flat checkpointed frame the
    * components/PageRank entries consume; attaching sources is two
    * doc_id-keyed hash joins against the (doc_id, source) projection —
    * edge-list-sized work, and at fleet scale the projection would ride
    * the LSH pipeline's own columns instead (carry `source` through the
    * signature stage and the joins disappear). The cell aggregate is
    * |sources|²-bounded; the total rides ONE broadcast scalar.
    */
  val sourceDupMatrix: CatalogEntry = CatalogEntry(
    "source_dup_matrix",
    (s, d) => {
      val e = lshEdges(s, d)
      val src = documents(s, d).select(col("doc_id"), col("source"))
      val pairs = e
        .join(src.select(col("doc_id").as("doc_a"), col("source").as("sa")),
          Seq("doc_a"))
        .join(src.select(col("doc_id").as("doc_b"), col("source").as("sb")),
          Seq("doc_b"))
        .select(least(col("sa"), col("sb")).as("src_a"),
          greatest(col("sa"), col("sb")).as("src_b"))
      val tot = pairs.agg(count(lit(1)).as("n_total"))
      pairs.groupBy("src_a", "src_b").agg(count(lit(1)).as("n_pairs"))
        .crossJoin(broadcast(tot))
        .select(col("src_a"), col("src_b"), col("n_pairs"),
          round(col("n_pairs").cast("double") / col("n_total"), 6).as("share"))
        .orderBy("src_a", "src_b")
    },
    Some(s"""WITH RECURSIVE $lshPairsCtesSql,
               sp AS (SELECT LEAST(da.source, db.source) AS src_a,
                             GREATEST(da.source, db.source) AS src_b
                      FROM lsh_pairs p
                      JOIN documents da ON da.doc_id = p.doc_a
                      JOIN documents db ON db.doc_id = p.doc_b),
               tot AS (SELECT COUNT(*) AS n_total FROM sp)
             SELECT src_a, src_b, CAST(COUNT(*) AS BIGINT) AS n_pairs,
                    ROUND(CAST(COUNT(*) AS DOUBLE) / n_total, 6) AS share
             FROM sp, tot
             GROUP BY src_a, src_b, n_total
             ORDER BY src_a, src_b"""))

  private val LpaRounds = 4 // synchronous label-propagation rounds (unrolled oracle)

  /** Label-propagation communities (Raghavan 2007) over the near-dup
    * graph — the DENSITY view next to the connectivity family: connected
    * components ([[dupClusters]]) merge everything reachable, LPA
    * instead converges on locally-dominant labels, splitting a chain of
    * weakly-bridged boilerplate families where CC reports one blob.
    * Each node adopts the most frequent label among its neighbors
    * (min-label on frequency ties — deterministic), synchronously, for a
    * FIXED [[LpaRounds]] rounds so the DuckDB oracle can unroll the same
    * rounds as plain CTEs — both engines compute "labels after R
    * synchronous rounds" even where LPA would oscillate, so equality is
    * by construction (the [[graphKCore]] discipline).
    *
    * Per-round cost is edge-proportional: one neighbor-label join, a
    * (node, label) count whose size is bounded by Σ distinct neighbor
    * labels, and a struct-max argmax — never a rank window over the
    * graph. Each round's label frame is localCheckpoint'd (the
    * [[dupClusters]] lineage discipline); the argmax aggregate replaces
    * the oracle's per-node row_number, same (count DESC, label ASC)
    * order.
    */
  val lpaCommunities: CatalogEntry = CatalogEntry(
    "doc_lpa_communities",
    (s, d) => {
      val e = lshEdges(s, d)
      val sym = e.select(col("doc_a").as("n"), col("doc_b").as("m"))
        .union(e.select(col("doc_b").as("n"), col("doc_a").as("m")))
        .localCheckpoint(eager = true)
      // Fixed rounds over the (checkpointed, cheap-to-count) edge frame
      // run in the small-graph child session when sub-threshold (see
      // operators.SmallGraph); the result rebases back to the caller's.
      val symS = graft.operators.SmallGraph.rebase(sym,
        graft.operators.SmallGraph.sessionFor(s, sym.count()))
      var lbl = symS.select(col("n")).distinct().select(col("n"), col("n").as("lbl"))
      locally {
        for (_ <- 1 to LpaRounds) {
          lbl = symS
            .join(lbl.select(col("n").as("m"), col("lbl")), Seq("m"))
            .groupBy("n", "lbl").agg(count(lit(1)).as("c"))
            .groupBy("n")
            .agg(max(struct(col("c"), (-col("lbl")).as("nl"))).as("mx"))
            .select(col("n"), (-col("mx.nl")).as("lbl"))
            .localCheckpoint()
        }
      }
      lbl = graft.operators.SmallGraph.rebase(lbl, s)
      lbl.select(col("n").as("doc_id"), col("lbl").as("community"))
        .orderBy("doc_id")
    },
    Some {
      val rounds = (0 until LpaRounds).map { r =>
        s"""l${r + 1} AS MATERIALIZED (SELECT n, lbl FROM (
              SELECT cn.n, cn.lbl,
                     row_number() OVER (PARTITION BY cn.n
                                        ORDER BY cn.c DESC, cn.lbl) AS rk
              FROM (SELECT e.n, l.lbl, COUNT(*) AS c
                    FROM e JOIN l$r l ON l.n = e.m GROUP BY 1, 2) cn)
            WHERE rk = 1)"""
      }.mkString(",\n")
      s"""WITH RECURSIVE $lshPairsCtesSql,
            e AS MATERIALIZED (SELECT doc_a AS n, doc_b AS m FROM lsh_pairs
                               UNION ALL SELECT doc_b, doc_a FROM lsh_pairs),
            l0 AS MATERIALIZED (SELECT DISTINCT n, n AS lbl FROM e),
            $rounds
          SELECT n AS doc_id, lbl AS community FROM l$LpaRounds ORDER BY doc_id"""
    })

  /** Train/eval leakage through NEAR-duplicates: every ≥-threshold LSH
    * pair bucketed by its unordered split pair (THE split definition —
    * [[TrainPrepCatalog.splitAssign]] composed verbatim, oracle CTEs
    * included, so this audit can never measure a different split than
    * the one assigned). The split hash keys on doc_id, not content, so
    * duplicated CONTENT lands in independent splits — off-diagonal
    * cells with `leaked = true` are eval rows whose near-twin is in
    * train, the contamination that silently inflates held-out metrics
    * (a content-keyed split would fix exact dups but still not
    * near-dups; this matrix measures the real exposure either way).
    * The expected cross-split share under independence is
    * 2·(0.9·0.05 + 0.9·0.05 + 0.05·0.05) ≈ 9.5% of dup pairs — a
    * pipeline gate alerts when the TRAIN-EVAL cells are nonzero at all.
    *
    * Shape: rides the shared checkpointed LSH edge list (the
    * components/PageRank frame); split labels are per-row md5
    * projections attached by two doc_id-keyed joins (at fleet scale the
    * label rides the signature stage's own columns instead); the cell
    * aggregate is 3²-bounded and the total is ONE broadcast scalar —
    * the `source_dup_matrix` shape pointed at the split axis.
    */
  val splitLeakage: CatalogEntry = CatalogEntry(
    "doc_split_leakage",
    (s, d) => {
      val e = lshEdges(s, d)
      val sp = TrainPrepCatalog.splitAssign.build(s, d)
      val pairs = e
        .join(sp.select(col("doc_id").as("doc_a"), col("split").as("sa")), Seq("doc_a"))
        .join(sp.select(col("doc_id").as("doc_b"), col("split").as("sb")), Seq("doc_b"))
        .select(least(col("sa"), col("sb")).as("split_a"),
          greatest(col("sa"), col("sb")).as("split_b"))
      val tot = pairs.agg(count(lit(1)).as("n_total"))
      pairs.groupBy("split_a", "split_b").agg(count(lit(1)).as("n_pairs"))
        .crossJoin(broadcast(tot))
        .select(col("split_a"), col("split_b"), col("n_pairs"),
          (col("split_a") =!= col("split_b")).as("leaked"),
          round(col("n_pairs").cast("double") / col("n_total"), 6).as("share"))
        .orderBy("split_a", "split_b")
    },
    Some {
      val splitSql = TrainPrepCatalog.splitAssign.oracle.get
      s"""WITH RECURSIVE $lshPairsCtesSql,
            sp AS (SELECT LEAST(pa.split, pb.split) AS split_a,
                          GREATEST(pa.split, pb.split) AS split_b
                   FROM lsh_pairs p
                   JOIN ($splitSql) pa ON pa.doc_id = p.doc_a
                   JOIN ($splitSql) pb ON pb.doc_id = p.doc_b),
            tot AS (SELECT COUNT(*) AS n_total FROM sp)
          SELECT split_a, split_b, CAST(COUNT(*) AS BIGINT) AS n_pairs,
                 split_a <> split_b AS leaked,
                 ROUND(CAST(COUNT(*) AS DOUBLE) / n_total, 6) AS share
          FROM sp, tot GROUP BY split_a, split_b, n_total
          ORDER BY split_a, split_b"""
    })

  private val WinGram = 3 // winnowing k-gram size (matches the shingle width)
  private val WinWindow = 4 // consecutive gram hashes per winnowing window
  private val WinPosScale = 16777216L // 2^24 — far above any per-doc gram count
  private val WinDfCap = 100 // fingerprints in more docs are boilerplate; drop
  private val WinMinShared = 2 // report pairs sharing at least this many prints

  /** Winnowing fingerprint overlap (Schleimer–Wilkerson–Aiken 2003, the
    * MOSS selector): hash every positional [[WinGram]]-gram with the
    * house rolling hash, slide a [[WinWindow]]-hash window over each
    * document, and keep each window's minimum — rightmost on hash ties,
    * encoded arithmetically as `MIN(h·2^24 − pos)` so one window-min
    * aggregate yields both the winning hash and the tie rule (no nested
    * window-over-window). Windows are "prefix-padded": every gram
    * position closes a window (frames shorter than W at the start), i.e.
    * winnowing after padding the hash stream with +∞ — docs shorter than
    * one full window still fingerprint, and both engines state the same
    * frame (`ROWS BETWEEN W−1 PRECEDING AND CURRENT ROW`). Unlike the
    * set-based shingle family above, selected prints carry POSITIONAL
    * evidence: winnowing guarantees any shared run of ≥ W+K−1 tokens
    * yields a shared print, so `shared` lower-bounds copied-run count —
    * the plagiarism/quote detector, not a similarity estimate.
    *
    * Scale: selection is per-row (one window shuffle on doc_id);
    * candidate generation is a fingerprint-bucket equi-join — never
    * all-pairs — after a df-cap ([[WinDfCap]]) kills boilerplate hot
    * keys, the same ubiquity guard the heavy-hitter entries apply.
    * Overlap denominators use the POST-cap print sets, so the ratio is
    * consistent with the join domain. The 3-use `kept` frame is tiny
    * (prints, not grams) and localCheckpoint'd once.
    */
  val winnowOverlap: CatalogEntry = CatalogEntry(
    "doc_winnow_overlap",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      import graft.functions.Text
      val grams = documents(s, d)
        .select(col("doc_id"), Text.normTokens(col("text")).as("tl"))
        .filter(size(col("tl")) >= WinGram)
        .select(col("doc_id"),
          posexplode(Text.wordNgrams(col("tl"), WinGram)).as(Seq("pos", "g")))
        .select(col("doc_id"),
          // The MIN(h·2^24 − pos) encoding is injective only while
          // pos < WinPosScale; a doc with ≥ 2^24 grams would borrow into
          // the hash field and fingerprint WRONG in both engines (oracle
          // equality would mask it). Fail loudly instead: the guard rides
          // the pos value itself so column pruning cannot drop it.
          when(col("pos") < lit(WinPosScale), col("pos").cast("long"))
            .otherwise(expr(s"cast(raise_error('doc_winnow_overlap: gram position >= " +
              s"$WinPosScale (2^24); raise WinPosScale') as bigint)")).as("pos"),
          Text.rollingHash(col("g")).as("h"))
      val w = Window.partitionBy("doc_id").orderBy("pos")
        .rowsBetween(-(WinWindow - 1), Window.currentRow)
      val kept = grams
        .select(col("doc_id"),
          min(col("h") * WinPosScale - col("pos")).over(w).as("wk"))
        .select(col("doc_id"),
          expr(s"(wk + ${WinPosScale - 1}) DIV $WinPosScale").as("h"))
        .distinct()
        .localCheckpoint(eager = true)
      val rare = kept.groupBy("h").agg(count(lit(1)).as("df"))
        .filter(col("df") <= WinDfCap).select("h")
      val capped = kept.join(rare, Seq("h"), "left_semi")
        .localCheckpoint(eager = true)
      val sizes = capped.groupBy("doc_id").agg(count(lit(1)).as("n"))
      capped.as("a").join(capped.as("b"),
          col("a.h") === col("b.h") && col("a.doc_id") < col("b.doc_id"))
        .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
        .agg(count(lit(1)).as("shared"))
        .filter(col("shared") >= WinMinShared)
        .join(sizes.select(col("doc_id").as("doc_a"), col("n").as("na")), Seq("doc_a"))
        .join(sizes.select(col("doc_id").as("doc_b"), col("n").as("nb")), Seq("doc_b"))
        .select(col("doc_a"), col("doc_b"), col("shared"),
          round(col("shared").cast("double") / least(col("na"), col("nb")), 6)
            .as("overlap"))
        .orderBy("doc_a", "doc_b")
    },
    Some {
      // DuckDB's range() rejects lateral column bounds, so positions ride
      // a {'pos', 'g'} struct comprehension (0-based pos to match Spark's
      // posexplode); the hash body is the doc_fingerprint rolling-hash
      // mirror applied to the gram string.
      val gramHashSql =
        s"""list_reduce(list_prepend(CAST(0 AS BIGINT),
              list_transform(string_split(lower(trim(pg.g)), ''),
                c -> CAST(ascii(c) AS BIGINT))),
              (acc, c) -> (acc * 31 + c) % 1000000007)"""
      s"""WITH toks AS (SELECT doc_id, ${PipelineCatalog.normToksSql} AS tl FROM documents),
            grams AS (SELECT doc_id, CAST(pg.pos AS BIGINT) AS pos, $gramHashSql AS h
                      FROM (SELECT doc_id,
                              unnest([{'pos': i - 1, 'g': array_to_string(tl[i:i+${WinGram - 1}], ' ')}
                                      for i in range(1, len(tl) - ${WinGram - 2})]) AS pg
                            FROM toks WHERE len(tl) >= $WinGram)),
            sel AS (SELECT doc_id,
                           MIN(h * $WinPosScale - pos) OVER (
                             PARTITION BY doc_id ORDER BY pos
                             ROWS BETWEEN ${WinWindow - 1} PRECEDING AND CURRENT ROW) AS wk
                    FROM grams),
            fps AS (SELECT DISTINCT doc_id,
                           (wk + ${WinPosScale - 1}) // $WinPosScale AS h FROM sel),
            rare AS (SELECT h FROM (SELECT h, COUNT(*) AS df FROM fps GROUP BY h)
                     WHERE df <= $WinDfCap),
            kept AS (SELECT doc_id, h FROM fps WHERE h IN (SELECT h FROM rare)),
            sz AS (SELECT doc_id, COUNT(*) AS n FROM kept GROUP BY doc_id),
            pr AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                          CAST(COUNT(*) AS BIGINT) AS shared
                   FROM kept a JOIN kept b ON a.h = b.h AND a.doc_id < b.doc_id
                   GROUP BY 1, 2 HAVING COUNT(*) >= $WinMinShared)
          SELECT doc_a, doc_b, shared,
                 ROUND(CAST(shared AS DOUBLE) / LEAST(sa.n, sb.n), 6) AS overlap
          FROM pr JOIN sz sa ON sa.doc_id = pr.doc_a
                  JOIN sz sb ON sb.doc_id = pr.doc_b
          ORDER BY doc_a, doc_b"""
    })

  val all: Seq[CatalogEntry] = Seq(nearDupLsh, simHash, simHashDupGroups, simhashHamming,
    ngramJaccard, ngramJaccardPrefix, ngramJaccardZipf,
    containmentProfile, containmentCovered,
    containmentCoveredPrefix, containmentCoveredZipf,
    dupClusters, dupClustersStar, pagerank, graphTriangles, graphKCore, dupSpans,
    sortedNeighborhood, dupKeepBest, lshCalibration, bbitMinhash, sourceDupMatrix,
    winnowOverlap, splitLeakage, lpaCommunities, spanDedup)
}
