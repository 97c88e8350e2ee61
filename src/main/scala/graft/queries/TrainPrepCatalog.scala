package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.CacheOnce._
import graft.Tables
import graft.functions.Text

/** Training-set preparation operators over `documents` — the steps between
  * a cleaned corpus and a training run: deterministic split assignment,
  * repetition screening (Gopher-style), domain mixing weights, and
  * vocabulary document frequencies. Everything is a per-row projection or
  * a single small aggregation — the shapes that are free at 100 TB.
  *
  * Cross-engine determinism: split hashing compares md5 HEX PREFIXES
  * lexicographically where a threshold test suffices; where an INTEGER
  * is needed (shuffle shards, sampling uniforms) Spark's conv() is
  * mirrored in DuckDB by per-char instr('0123456789abcdef', …) place
  * arithmetic — same value, no conv() required. Ratios of exact
  * integers divide as doubles identically in both engines and are
  * rounded to 6 decimals.
  */
object TrainPrepCatalog {

  private def documents(s: SparkSession, d: String) = Tables.documents(s, d)

  private val toksSql = raw"string_split_regex(trim(text), '\s+')"

  /** SQL mirror of Text.normTokens (kept in sync with PipelineCatalog). */
  private val normToksSql =
    raw"string_split_regex(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ')"

  /** Deterministic train/val/test assignment by salted content-id hash:
    * the first two md5 hex chars partition [0,256) into 230/13/13
    * (≈ 90/5/5). Hash of the id, not the row position — stable under
    * re-sharding, re-ordering, and incremental appends, which is the
    * property a reproducible training split actually needs.
    *
    * THE split definition: salt + bounds live here once and are shared
    * by every consumer (`split_token_divergence`, PipelineCatalog's
    * train-prep composite) — a drift monitor measuring a different split
    * than the one assigned would silently lie.
    */
  private[queries] val SplitSalt = "split|"
  private[queries] val TrainBound = "e6"
  private[queries] val ValBound = "f3"

  /** The two-hex-char split hash of a doc_id column (Spark side). */
  private[queries] def splitHx(id: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    substring(md5(concat(lit(SplitSalt), id.cast("string"))), 1, 2)

  /** Same hash in DuckDB SQL over a doc_id expression. */
  private[queries] def splitHxSql(id: String): String =
    s"substr(md5('$SplitSalt' || CAST($id AS VARCHAR)), 1, 2)"

  val splitAssign: CatalogEntry = CatalogEntry(
    "doc_split_assign",
    (s, d) => documents(s, d).select(
      col("doc_id"), splitHx(col("doc_id")).as("hx"))
      .select(col("doc_id"),
        when(col("hx") < TrainBound, "train")
          .when(col("hx") < ValBound, "val")
          .otherwise("test").as("split")),
    Some(s"""SELECT doc_id,
                   CASE WHEN hx < '$TrainBound' THEN 'train'
                        WHEN hx < '$ValBound' THEN 'val'
                        ELSE 'test' END AS split
            FROM (SELECT doc_id, ${splitHxSql("doc_id")} AS hx
                  FROM documents)"""))

  /** Repetition screening: duplicate word-bigram fraction per document
    * (the Gopher/MassiveText "repetition" family of quality signals).
    * Pure per-row projection; the short-doc case (< 2 tokens) falls back
    * to the whole text as its single gram, mirroring Text.wordNgrams.
    */
  val repetition: CatalogEntry = CatalogEntry(
    "doc_repetition",
    (s, d) => {
      val grams = Text.wordNgrams(Text.normTokens(col("text")), 2)
      documents(s, d).select(
        col("doc_id"),
        size(grams).cast("long").as("n_bigrams"),
        size(array_distinct(grams)).cast("long").as("n_distinct"))
        .withColumn("dup_frac",
          round(lit(1.0) - col("n_distinct") / col("n_bigrams"), 6))
        .withColumn("repetitive", col("dup_frac") > 0.2)
    },
    Some(raw"""SELECT doc_id,
                 CAST(len(bgs) AS BIGINT) AS n_bigrams,
                 CAST(len(list_distinct(bgs)) AS BIGINT) AS n_distinct,
                 ROUND(1.0 - len(list_distinct(bgs)) / len(bgs), 6) AS dup_frac,
                 ROUND(1.0 - len(list_distinct(bgs)) / len(bgs), 6) > 0.2 AS repetitive
               FROM (
                 SELECT doc_id,
                        CASE WHEN len(t) < 2 THEN [array_to_string(t, ' ')]
                             ELSE [array_to_string(t[i:i+1], ' ') for i in range(1, len(t))] END AS bgs
                 FROM (SELECT doc_id, string_split_regex(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS t
                       FROM documents))"""))

  /** Domain mixing weights: per-source token share and the up/down-
    * sampling weight that would flatten the mix to uniform-over-sources
    * (weight ∝ target share / actual share). One 20-group aggregation
    * plus a scalar broadcast — at 100 TB the per-source aggregate is the
    * only shuffle and its cardinality is the domain count.
    */
  val mixWeights: CatalogEntry = CatalogEntry(
    "source_mix_weights",
    (s, d) => {
      val per = documents(s, d)
        .select(col("source"), size(Text.wsTokens(col("text"))).cast("long").as("n_tokens"))
        .groupBy("source")
        .agg(count(lit(1)).as("docs"), sum("n_tokens").as("tokens"))
      val totals = per.agg(sum("tokens").as("total"), count(lit(1)).as("n_src"))
      per
        .crossJoin(broadcast(totals))
        .select(col("source"), col("docs"), col("tokens"),
          round(col("tokens") / col("total"), 6).as("token_share"),
          round(col("total") / (col("n_src") * col("tokens")), 6).as("mix_weight"))
    },
    Some(s"""SELECT source, docs, tokens,
                    ROUND(tokens / total, 6) AS token_share,
                    ROUND(total / (n_src * tokens), 6) AS mix_weight
             FROM (SELECT source, COUNT(*) AS docs,
                          CAST(SUM(len($toksSql)) AS BIGINT) AS tokens,
                          CAST(SUM(SUM(len($toksSql))) OVER () AS BIGINT) AS total,
                          COUNT(*) OVER () AS n_src
                   FROM documents GROUP BY source)"""))

  /** Epoch token-budget planner — the quota computation a data-mixing
    * budgeter runs before a training read (the APPLY step of the
    * mixing-weight literature: The Pile's per-set epochs, Gao et al.
    * 2020; DoReMi's domain weights, Xie et al. 2023): give every source
    * an equal slice of a HALF-epoch token budget (the flattened mix
    * [[mixWeights]] targets — budget_s = Σtokens ∕ (2·n_src), exact
    * integer division) and report, per source, how many documents fit
    * when the loader reads the source in the deterministic shuffle
    * order (THE `doc_shuffle_order` law — salt and hash reused verbatim,
    * so the planner predicts exactly what that loader will read). A doc
    * is taken iff its INCLUSIVE running token count stays within the
    * budget (no overshoot; fill_ratio < 1 shows the truncation loss).
    * Under-budget sources (fill 1.0 with docs to spare vs exhausted
    * early) are the up/down-sampling signal read next to `mix_weight`.
    *
    * 100 TB shape: one per-row projection, ONE range shuffle read twice
    * (the cum sum rides withPrefixSumPerKey's two-pass prefix offsets,
    * r18 — a dominating source spans range buckets; production can
    * still split the quota across the shuffle law's 256 shards,
    * budget_s/256 per (source, shard), for quota-local accounting), a
    * #sources rollup, and a 1-row broadcast total.
    * Exactness: tokens and budgets are BIGINT end-to-end (integer div
    * on both engines); fill_ratio is the one rounded division.
    */
  val tokenBudget: CatalogEntry = CatalogEntry(
    "pipeline_token_budget",
    (s, d) => {
      val h = md5(concat(lit("shuffle|"), col("doc_id").cast("string")))
      // Null-text docs count as 0-token docs EXPLICITLY (both engines):
      // they are "available" and takeable at zero cost. (Under the old
      // window form a leading all-null frame produced a NULL cum by
      // accident of SUM's null-skip; the coalesce pins the semantics.)
      // cacheOnce (r19, guide §2.3/§5): `docs` feeds BOTH the budget
      // total and the prefix-sum pass, and — unlike the count-only
      // branches Catalyst prunes to a metadata scan elsewhere — the
      // total here needs sum(n_tokens), so without the cache the WHOLE
      // corpus was read and TOKENIZED twice (the r18 plan's second
      // `Scan parquet ReadSchema: struct<text,source>`). The cached
      // frame is the narrow (source, doc_id, n_tokens, h) proxy —
      // bytes-per-row metadata, not text — the guide §8 "decide with
      // small rows" shape; harness teardown drops it per entry.
      val docs = documents(s, d)
        .select(col("source"), col("doc_id"),
          coalesce(size(Text.wsTokens(col("text"))).cast("long"), lit(0L))
            .as("n_tokens"), h.as("h")).cacheOnce()
      val tot = docs.agg(sum("n_tokens").as("total"),
          countDistinct("source").as("n_src"))
        .select(when(col("n_src") > 0, expr("total div (2 * n_src)"))
          .otherwise(lit(0L)).as("budget_tokens"))
      // Inclusive per-source prefix sum in shuffle order via
      // withPrefixSumPerKey (range shuffle + driver offsets, r18) — the
      // production sharding note below still applies, but even the
      // UNSHARDED form no longer serializes a dominating source into
      // one keyed-window sort task.
      val cum = graft.operators.GlobalRank.withPrefixSumPerKey(
        docs, Seq("source"), Seq(col("h"), col("doc_id")), "n_tokens",
        numPartitions = graft.operators.GlobalRank.sessionPartitions(docs),
        cumCol = "cum", inclusive = true)
      cum.crossJoin(broadcast(tot))
        .groupBy("source")
        .agg(count(lit(1)).as("docs_available"),
          sum("n_tokens").as("tokens_available"),
          max("budget_tokens").as("budget_tokens"),
          sum(when(col("cum") <= col("budget_tokens"), 1L).otherwise(0L))
            .as("docs_taken"),
          sum(when(col("cum") <= col("budget_tokens"), col("n_tokens"))
            .otherwise(lit(0L))).as("tokens_taken"))
        .withColumn("fill_ratio",
          round(col("tokens_taken").cast("double") / col("budget_tokens"), 6))
    },
    Some(s"""WITH d AS (SELECT source, doc_id,
                               COALESCE(CAST(len($toksSql) AS BIGINT), 0) AS n_tokens,
                               md5('shuffle|' || CAST(doc_id AS VARCHAR)) AS h
                        FROM documents),
                  b AS (SELECT CASE WHEN COUNT(DISTINCT source) > 0
                                    THEN CAST(SUM(n_tokens) AS BIGINT)
                                         // (2 * COUNT(DISTINCT source))
                                    ELSE 0 END AS budget_tokens
                        FROM d),
                  c AS (SELECT source, n_tokens,
                               SUM(n_tokens) OVER (PARTITION BY source
                                 ORDER BY h, doc_id ROWS UNBOUNDED PRECEDING) AS cum
                        FROM d)
             SELECT source, CAST(COUNT(*) AS BIGINT) AS docs_available,
                    CAST(SUM(n_tokens) AS BIGINT) AS tokens_available,
                    CAST(MAX(b.budget_tokens) AS BIGINT) AS budget_tokens,
                    CAST(SUM(CASE WHEN cum <= b.budget_tokens THEN 1 ELSE 0 END) AS BIGINT) AS docs_taken,
                    CAST(SUM(CASE WHEN cum <= b.budget_tokens THEN n_tokens ELSE 0 END) AS BIGINT) AS tokens_taken,
                    ROUND(CAST(SUM(CASE WHEN cum <= b.budget_tokens THEN n_tokens ELSE 0 END) AS DOUBLE)
                          / MAX(b.budget_tokens), 6) AS fill_ratio
             FROM c CROSS JOIN b GROUP BY source"""))

  /** Vocabulary document frequencies: top 20 tokens by df (ties broken by
    * token). The global top-k is a TakeOrdered after the one token
    * aggregation — no full sort at any scale.
    */
  val tokenDf: CatalogEntry = CatalogEntry(
    "token_df",
    (s, d) => documents(s, d)
      .select(col("doc_id"), explode(array_distinct(Text.normTokens(col("text")))).as("token"))
      .groupBy("token")
      .agg(count(lit(1)).as("df"))
      .orderBy(col("df").desc, col("token"))
      .limit(20),
    Some(raw"""SELECT token, CAST(COUNT(*) AS BIGINT) AS df FROM (
                 SELECT DISTINCT doc_id, unnest(list_distinct(string_split_regex(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' '))) AS token
                 FROM documents)
               GROUP BY token ORDER BY df DESC, token LIMIT 20"""))

  /** Ranks reported by the Zipf curve: powers of two through 1024 —
    * log-spaced so 11 rows trace the whole rank–frequency line a
    * log-log Zipf fit reads, while every statistic stays EXACT (ranks
    * and counts are integers; no log, no regression enters the compare;
    * the fit slope is a driver-side step on the reported points).
    */
  private val ZipfRanks: Seq[Int] = (0 to 10).map(1 << _)

  /** Rank–frequency (Zipf) curve of the unigram distribution: for each
    * power-of-two rank, the token, its count, cumulative count, and
    * corpus shares — the statistic behind tokenizer-vocabulary sizing
    * (how much mass the top-k covers), stopword-list cutoffs, and
    * sampling-temperature choices; a corpus whose curve flattens has
    * been template-flooded (the duplication shows up here before dedup
    * runs). Zipf's law (Zipf 1949; Piantadosi 2014 review) predicts a
    * straight log-log line — the entry emits the measured points and
    * leaves the fit to the reader, keeping libm out of the oracle
    * compare (the Benford-family device).
    *
    * 100 TB shape: ONE (token) count shuffle — the irreducible vocab
    * aggregate, map-side combined — then TakeOrderedAndProject bounds
    * the global sort to the top max(ZipfRanks) rows (per-partition
    * heaps + driver merge, never a full-vocab single-partition sort);
    * the cumulative window runs on those ≤ 1024 rows. Totals ride a
    * 1-row broadcast. Ties break on the token string in both engines.
    */
  val tokenZipfCurve: CatalogEntry = CatalogEntry(
    "token_zipf_curve",
    (s, d) => {
      val counts = documents(s, d)
        .select(explode(Text.normTokens(col("text"))).as("token"))
        .groupBy("token").agg(count(lit(1)).as("c"))
        .localCheckpoint() // one vocab frame feeds the top slice AND the total
      val tot = counts.agg(sum("c").as("n_total"))
      // Global rank WITHOUT a single-partition window: the bounded top
      // slice rides the house GlobalRank (range shuffle + zipWithIndex),
      // and the cumulative count is a bounded triangular join — 11 kept
      // ranks × ≤ 1024 ranked rows, never corpus-sized.
      val ranked = graft.operators.GlobalRank.withRank(
        counts.orderBy(col("c").desc, col("token")).limit(ZipfRanks.max),
        Seq(col("c").desc, col("token").asc), 4).cacheOnce()
      val pts = ranked.filter(col("rank").isin(ZipfRanks.map(i => Long.box(i.toLong)): _*))
      pts.as("a").join(broadcast(ranked.as("b")), col("b.rank") <= col("a.rank"))
        .groupBy(col("a.rank").as("rank"), col("a.token").as("token"),
          col("a.c").as("c"))
        .agg(sum(col("b.c")).as("cum_c"))
        .crossJoin(broadcast(tot))
        .select(col("rank"), col("token"), col("c"), col("cum_c"),
          round(col("c").cast("double") / col("n_total"), 6).as("frac"),
          round(col("cum_c").cast("double") / col("n_total"), 6).as("cum_frac"))
    },
    Some {
      val ranksList = ZipfRanks.mkString("(", ", ", ")")
      s"""WITH counts AS (SELECT token, CAST(COUNT(*) AS BIGINT) AS c FROM (
                            SELECT unnest($normToksSql) AS token FROM documents)
                          GROUP BY token),
            tot AS (SELECT CAST(SUM(c) AS BIGINT) AS n_total FROM counts),
            top AS (SELECT token, c,
                           row_number() OVER (ORDER BY c DESC, token) AS rank,
                           SUM(c) OVER (ORDER BY c DESC, token
                             ROWS UNBOUNDED PRECEDING) AS cum_c
                    FROM counts QUALIFY rank <= ${ZipfRanks.max})
          SELECT CAST(rank AS BIGINT) AS rank, token, c,
                 CAST(cum_c AS BIGINT) AS cum_c,
                 ROUND(CAST(c AS DOUBLE) / t.n_total, 6) AS frac,
                 ROUND(CAST(cum_c AS DOUBLE) / t.n_total, 6) AS cum_frac
          FROM top CROSS JOIN tot t
          WHERE rank IN $ranksList"""
    })

  /** Inverted-index build — the retrieval artifact: for each of the 20
    * highest-df tokens, its df and a CAPPED posting list (the 15 lowest
    * doc_ids, '|'-joined — capping is what keeps the artifact bounded
    * when a stopword's postings would be corpus-sized). One token
    * aggregate produces both the ranking and the bounded list; emitting
    * postings as a joined STRING keeps the oracle hash engine-neutral
    * (list column representations differ across engines).
    */
  val tokenPostings: CatalogEntry = CatalogEntry(
    "token_postings",
    (s, d) => documents(s, d)
      .select(col("doc_id"), explode(array_distinct(Text.normTokens(col("text")))).as("token"))
      .groupBy("token")
      .agg(count(lit(1)).as("df"),
        concat_ws("|",
          slice(sort_array(collect_list(col("doc_id"))), 1, 15)).as("postings"))
      .orderBy(col("df").desc, col("token"))
      .limit(20),
    Some(raw"""SELECT token, CAST(COUNT(*) AS BIGINT) AS df,
                      array_to_string(list_sort(list(doc_id))[1:15], '|') AS postings
               FROM (
                 SELECT DISTINCT doc_id, unnest(list_distinct(string_split_regex(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' '))) AS token
                 FROM documents)
               GROUP BY token ORDER BY df DESC, token LIMIT 20"""))

  /** Sliding-window chunking — the step between a cleaned corpus and an
    * embedding/training run: each document becomes ceil(n/stride) chunks
    * of up to `ChunkLen` tokens starting every `ChunkStride` tokens
    * (overlap = len − stride). Pure per-row generate + projection: no
    * shuffle anywhere, output size ≈ input × len/stride — at 100 TB the
    * chunker rides the scan and is bounded by write bandwidth, not
    * compute. Chunk identity is (doc_id, chunk_start), not a global
    * ordinal: a corpus-wide ordinal would need a total order (range
    * shuffle) for numbering that nothing downstream requires.
    */
  private[graft] val ChunkLen = 32
  private[graft] val ChunkStride = 24

  /** Chunk a frame carrying a `toks` array column: one output row per
    * (input row × stride start), keeping `carry` columns. Generate +
    * project only — composable into any pipeline without adding a
    * shuffle.
    */
  private[graft] def chunkTokens(withToks: DataFrame, carry: String*): DataFrame = {
    val keep = carry.map(col)
    withToks
      .select(keep :+ col("toks") :+
        explode(sequence(lit(0), greatest(size(col("toks")) - 1, lit(0)),
          lit(ChunkStride))).as("chunk_start"): _*)
      .select(keep :+ col("chunk_start").cast("long").as("chunk_start") :+
        array_join(slice(col("toks"), col("chunk_start") + 1, lit(ChunkLen)), " ")
          .as("chunk_text") :+
        least(lit(ChunkLen), size(col("toks")) - col("chunk_start"))
          .cast("long").as("n_tokens"): _*)
  }

  val chunk: CatalogEntry = CatalogEntry(
    "doc_chunk",
    (s, d) => chunkTokens(
      documents(s, d).select(col("doc_id"), Text.normTokens(col("text")).as("toks")),
      "doc_id"),
    Some(s"""SELECT doc_id, g AS chunk_start,
                    array_to_string(toks[g+1 : g+$ChunkLen], ' ') AS chunk_text,
                    CAST(LEAST($ChunkLen, len(toks) - g) AS BIGINT) AS n_tokens
             FROM (SELECT doc_id, $normToksSql AS toks FROM documents),
                  UNNEST(generate_series(0, len(toks) - 1, $ChunkStride)) AS u(g)"""))

  /** Deterministic global training shuffle: every document gets a
    * reproducible pseudo-random position (shard, pos) — order by the
    * salted md5 of the id, never by ingest order. The permutation is a
    * property of the ids alone: stable under re-sharding, engine
    * changes, and incremental re-runs, which is what "the same data
    * order for the same training run" actually requires.
    *
    * 100 TB shape: the sort is per-SHARD (first md5 byte → 256
    * independent window partitions, each sorting n/256 rows locally),
    * never a corpus-wide total order — a global ROW_NUMBER would funnel
    * every row through one range-partitioned sort whose skew ceiling is
    * a single partition. Consumers read shards in (shard, pos) order;
    * raising the shard-prefix width to 3–4 hex chars scales the
    * parallelism to any cluster without changing the permutation law.
    */
  val shuffleOrder: CatalogEntry = CatalogEntry(
    "doc_shuffle_order",
    (s, d) => {
      val h = md5(concat(lit("shuffle|"), col("doc_id").cast("string")))
      documents(s, d)
        .select(col("doc_id"), h.as("h"))
        .select(col("doc_id"), col("h"),
          conv(substring(col("h"), 1, 2), 16, 10).cast("long").as("shard"))
        .withColumn("pos",
          row_number().over(
            Window.partitionBy("shard").orderBy(col("h"), col("doc_id")))
            .cast("long"))
        .select("doc_id", "shard", "pos")
    },
    Some("""SELECT doc_id,
                   CAST((instr('0123456789abcdef', substr(h, 1, 1)) - 1) * 16
                        + instr('0123456789abcdef', substr(h, 2, 1)) - 1 AS BIGINT) AS shard,
                   CAST(ROW_NUMBER() OVER (
                     PARTITION BY substr(h, 1, 2) ORDER BY h, doc_id) AS BIGINT) AS pos
            FROM (SELECT doc_id,
                         md5('shuffle|' || CAST(doc_id AS VARCHAR)) AS h
                  FROM documents)"""))

  /** Corpus length distribution: document counts per 64-char bucket with
    * the share of the corpus in each. The histogram every curation run
    * reads before choosing truncation/packing budgets. One tiny-key
    * aggregation (bucket count ≈ max_len/64) — free at any scale.
    */
  val lengthHistogram: CatalogEntry = CatalogEntry(
    "doc_length_histogram",
    (s, d) => documents(s, d)
      .select(((col("n_chars") / 64).cast("long") * 64).as("bucket"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("docs"))
      .transform(h => h.crossJoin(broadcast(h.agg(sum("docs").as("total_docs")))))
      .select(col("bucket"), col("docs"),
        round(col("docs") / col("total_docs"), 6).as("share")),
    Some("""SELECT (n_chars // 64) * 64 AS bucket, COUNT(*) AS docs,
                   ROUND(COUNT(*) / SUM(COUNT(*)) OVER (), 6) AS share
            FROM documents GROUP BY 1"""))

  /** Corpus composition report: document and token counts per
    * (source, language) with each cell's share of its source — the
    * mix table a data-curation review reads next to source_mix_weights.
    * One aggregation whose key cardinality is #sources × #languages.
    */
  val sourceLangMix: CatalogEntry = CatalogEntry(
    "source_lang_mix",
    (s, d) => documents(s, d)
      .select(col("source"), col("lang"),
        size(Text.wsTokens(col("text"))).cast("long").as("n_tokens"))
      .groupBy("source", "lang")
      .agg(count(lit(1)).as("docs"), sum("n_tokens").as("tokens"))
      .withColumn("src_share",
        round(col("docs") / sum("docs").over(Window.partitionBy("source")), 6)),
    Some(s"""SELECT source, lang, COUNT(*) AS docs,
                    CAST(SUM(len($toksSql)) AS BIGINT) AS tokens,
                    ROUND(COUNT(*) / SUM(COUNT(*)) OVER (PARTITION BY source), 6)
                      AS src_share
             FROM documents GROUP BY source, lang"""))

  /** Weighted rebalancing sampler — source_mix_weights APPLIED: keep each
    * document with probability min(1, mix_weight(source)), so
    * over-represented sources are down-sampled toward the uniform-over-
    * sources token mix (under-represented sources keep everything;
    * up-sampling is repetition, a different operator). The keep decision
    * is md5-deterministic per doc_id — no RNG state, identical across
    * engines, cluster sizes and re-runs — and the per-source rates ride
    * a BROADCAST join (#sources rows), so the corpus is touched in one
    * per-row pass. The u < rate comparison is bit-deterministic: u is an
    * exact integer / 65536.0 and the rate divides exact BIGINTs — same
    * IEEE ops in both engines.
    */
  val mixSample: CatalogEntry = CatalogEntry(
    "doc_mix_sample",
    (s, d) => {
      val per = documents(s, d)
        .select(col("source"), size(Text.wsTokens(col("text"))).cast("long").as("n_tokens"))
        .groupBy("source")
        .agg(sum("n_tokens").as("tokens"))
      val totals = per.agg(sum("tokens").as("total"), count(lit(1)).as("n_src"))
      val rates = per
        .crossJoin(broadcast(totals))
        .select(col("source"),
          least(lit(1.0), col("total") / (col("n_src") * col("tokens"))).as("keep_rate"))
      val u = conv(substring(md5(concat(lit("mix|"), col("doc_id").cast("string"))), 1, 4),
        16, 10).cast("long") / lit(65536.0)
      documents(s, d).join(broadcast(rates), "source")
        .filter(u < col("keep_rate"))
        .select(col("doc_id"), col("source"), round(col("keep_rate"), 6).as("keep_rate"))
    },
    Some(s"""WITH rates AS (
               SELECT source, LEAST(1.0, total / (n_src * tokens)) AS keep_rate
               FROM (SELECT source, CAST(SUM(len($toksSql)) AS BIGINT) AS tokens,
                            CAST(SUM(SUM(len($toksSql))) OVER () AS BIGINT) AS total,
                            COUNT(*) OVER () AS n_src
                     FROM documents GROUP BY source)),
             keyed AS (
               SELECT doc_id, source,
                      ((instr('0123456789abcdef', substr(h, 1, 1)) - 1) * 4096
                       + (instr('0123456789abcdef', substr(h, 2, 1)) - 1) * 256
                       + (instr('0123456789abcdef', substr(h, 3, 1)) - 1) * 16
                       + (instr('0123456789abcdef', substr(h, 4, 1)) - 1)) / 65536.0 AS u
               FROM (SELECT doc_id, source,
                            md5('mix|' || CAST(doc_id AS VARCHAR)) AS h
                     FROM documents))
             SELECT k.doc_id, k.source, ROUND(r.keep_rate, 6) AS keep_rate
             FROM keyed k JOIN rates r ON k.source = r.source
             WHERE k.u < r.keep_rate"""))

  /** DuckDB integer value of the first `k` hex chars of `hexExpr` —
    * per-char instr place arithmetic, the SQL mirror of Spark's
    * conv(substring(…), 16, 10).
    */
  private def hexPrefixIntSql(hexExpr: String, k: Int): String =
    (1 to k).map { i =>
      val place = math.pow(16, k - i).toLong
      s"(instr('0123456789abcdef', substr($hexExpr, $i, 1)) - 1) * $place"
    }.mkString("(", " + ", ")")

  /** Deterministic per-source k-sample — the inspection/eval slice every
    * curation run pulls per domain: the `SampleK` docs with the smallest
    * salted-md5 uniform per source. Runs on the bounded-heap combine
    * aggregator (graft.combine.TopNAgg), so each map partition ships at
    * most k candidates per source — shuffle volume is partitions × k ×
    * #sources regardless of corpus size, where a ranking window would
    * shuffle and sort every row. Hash-ordered, so the sample is stable
    * under re-sharding and appends only grow/replace it predictably.
    */
  private val SampleK = 20

  val samplePerSource: CatalogEntry = CatalogEntry(
    "doc_sample_per_source",
    (s, d) => {
      val topn = udaf(new graft.combine.TopNAgg(SampleK))
      // TopNAgg keeps the LARGEST values; negate the 32-bit hash uniform
      // so "top" = smallest u. Exact: 32-bit ints are exact doubles.
      val u = conv(substring(md5(concat(lit("sample|"), col("doc_id").cast("string"))),
        1, 8), 16, 10).cast("long")
      documents(s, d)
        .select(col("source"), col("doc_id"), (-u).cast("double").as("negu"))
        .groupBy("source")
        .agg(topn(col("negu"), col("doc_id")).as("top"))
        .select(col("source"), posexplode(col("top.entries")))
        .select(col("source"), col("col.event_id").as("doc_id"),
          (col("pos") + 1).cast("long").as("rn"))
    },
    Some(s"""SELECT source, doc_id, CAST(rn AS BIGINT) AS rn FROM (
               SELECT source, doc_id,
                      row_number() OVER (PARTITION BY source
                        ORDER BY ${hexPrefixIntSql("h", 8)}, doc_id) AS rn
               FROM (SELECT source, doc_id,
                            md5('sample|' || CAST(doc_id AS VARCHAR)) AS h
                     FROM documents))
             WHERE rn <= $SampleK"""))

  /** Replica count for [[bootstrapCi]]. */
  private[graft] val BootR = 200

  /** Poisson(1) inverse-CDF thresholds on the 32-bit uniform lattice:
    * T_k = ⌊CDF(k) · 2³²⌋ for k = 0..9 (weight 10 beyond — mass 1e-8,
    * unreachable on a 2³² lattice in practice). FIXED integer literals,
    * committed once: the weight decision is an integer compare in both
    * engines, so no libm exp() and no float threshold can drift a
    * replica weight between Spark and the oracle.
    */
  private val BootPoissonT: Seq[Long] = Seq(
    1580030168L, 3160060337L, 3950075421L, 4213413783L, 4279248373L,
    4292415291L, 4294609777L, 4294923276L, 4294962463L, 4294966817L)

  /** Poisson bootstrap (Chamandy et al. 2012, "Estimating uncertainty
    * for massive data streams" — the resampling scheme that works when
    * you cannot hold n in one place): a 95% confidence interval for the
    * corpus mean tokens-per-document from [[BootR]] replicas, each doc
    * entering replica r with an independent Poisson(1) weight derived
    * from its deterministic md5 uniform ("boot|r|doc_id" salt,
    * [[BootPoissonT]] integer thresholds). The point estimate every
    * dataset card reports ([[datasetCard]]) gets its missing error bar:
    * whether 412.3 mean tokens is 412.3 ± 2 or ± 40 decides if a drift
    * alarm ([[ksDrift]]) is signal or sampling noise.
    *
    * CI convention: the symmetric (k, R+1−k) order-statistic interval
    * with k = ⌈0.025·R⌉ = 5 — the 5th smallest and 5th largest replica
    * means, both found by bounded heaps ([[graft.combine.TopNAgg]]),
    * never a global sort. Replicas with zero total weight (possible
    * only on near-empty corpora — P ≈ e^(−n)) are dropped rather than
    * dividing by zero; on a corpus that small the interval row is
    * empty, which is the honest answer.
    *
    * Determinism: weights and token counts are exact integers; each
    * replica mean is ONE division of exact BIGINTs; selection ties
    * break by replica id (TopNAgg (value, id) order ↔ the oracle's
    * row_number).
    *
    * 100 TB shape: the explode multiplies rows by R=[[BootR]] but
    * feeds STRAIGHT into a map-combined groupBy(r) — partial
    * aggregation collapses each partition to ≤ R rows before the
    * shuffle, so network volume is partitions × R regardless of corpus
    * size, and no replica ever materializes. Everything after the
    * replica frame is R-sized. This is the standard distributed
    * bootstrap: n draws with replacement needs global coordination,
    * n independent Poisson(1) weights needs none.
    */
  /** Corpus-touching stage of [[bootstrapCi]] — the per-replica weighted
    * sums (r, Σw·x, Σw): plain keyed SUMs of exact integers (linear,
    * mergeable), factored out so structured streaming maintains the
    * identical aggregate live
    * (graft.streaming.StreamingQueries.streamingBootReplicaSums — the
    * streamingBenfordCounts delegation pattern). The point-estimate
    * moments ride the SAME frame as the sentinel row r = −1 with w = 1
    * (so swx = Σx, sw = n_docs), which also collapses the batch entry
    * from two corpus scans (replicas + point estimate) to ONE. State is
    * ≤ R+1 rows — replica-bounded, never corpus-bounded. */
  private[graft] def bootReplicaSums(docs: DataFrame): DataFrame = {
    val wCase = BootPoissonT.zipWithIndex
      .map { case (t, k) => s"WHEN u < ${t}L THEN ${k}L" }
      .mkString("CASE ", " ", s" ELSE ${BootPoissonT.size}L END")
    docs
      .select(col("doc_id"),
        size(graft.functions.Text.wsTokens(col("text"))).cast("long").as("x"))
      .withColumn("r", explode(sequence(lit(-1L), lit(BootR - 1L))))
      // The r = -1 sentinel row's weight is unconditionally 1, so its
      // hash is never read — guard u with the same r < 0 branch
      // (CaseWhen evaluates lazily in codegen) so the sentinel skips
      // one md5 per document per batch (r17 advice). wCase's
      // `u < t` reads NULL for the sentinel, but the outer when()
      // never consults it there.
      .withColumn("u", when(col("r") >= 0L, conv(substring(md5(concat(
        lit("boot|"), col("r").cast("string"), lit("|"),
        col("doc_id").cast("string"))), 1, 8), 16, 10).cast("long")))
      .withColumn("w", when(col("r") < 0L, lit(1L)).otherwise(expr(wCase)))
      .groupBy("r")
      .agg(sum(col("w") * col("x")).as("swx"), sum("w").as("sw"))
  }

  /** The replica-sized interval stage of [[bootstrapCi]] over a drained
    * (r, swx, sw) frame — everything downstream of the corpus; batch and
    * streaming replay share it verbatim. */
  private[graft] def bootCiFrom(sums: DataFrame): DataFrame = {
    // The frame is <= R+1 rows after the map-combined groupBy —
    // eager-checkpoint it so the corpus explode runs ONCE and both
    // order-statistic heaps read the truncated frame (keeps the entry's
    // plan honest for PlanSpec, no cache bookkeeping).
    val all = sums.localCheckpoint(eager = true)
    val reps = all
      .filter(col("r") >= 0L && col("sw") > 0L)
      .select(col("r"), (col("swx").cast("double") / col("sw")).as("m"))
    val k = 5 // ceil(0.025 * BootR)
    val loHeap = udaf(new graft.combine.TopNAgg(k))
    // size guard: on a near-empty corpus with < k surviving replicas
    // the interval is undefined — emit NO row (the oracle's rk = 5
    // row is equally absent), never an ANSI out-of-bounds element_at.
    val lo = reps.agg(loHeap(-col("m"), col("r")).as("t"))
      .filter(size(col("t.entries")) >= k)
      .select((-element_at(col("t.entries"), k).getField("value")).as("lo"))
    val hi = reps.agg(loHeap(col("m"), col("r")).as("t"))
      .filter(size(col("t.entries")) >= k)
      .select(element_at(col("t.entries"), k).getField("value").as("hi"))
    // Point estimate off the r = -1 sentinel row: sw = n_docs, swx = Σx,
    // so pm = swx/sw is the same exact-int division the two-scan form
    // computed as sum(x)/count(*).
    val pt = all.filter(col("r") < 0L)
      .select(col("sw").as("n_docs"),
        (col("swx").cast("double") / col("sw")).as("pm"))
    pt.crossJoin(broadcast(lo)).crossJoin(broadcast(hi))
      .select(col("n_docs"), lit(BootR.toLong).as("n_replicas"),
        round(col("pm"), 6).as("mean_tokens"),
        round(col("lo"), 6).as("ci_lo"), round(col("hi"), 6).as("ci_hi"))
  }

  val bootstrapCi: CatalogEntry = CatalogEntry(
    "doc_bootstrap_ci",
    (s, d) => bootCiFrom(bootReplicaSums(documents(s, d))),
    Some {
      val wCaseSql = BootPoissonT.zipWithIndex
        .map { case (t, k) => s"WHEN u < $t THEN $k" }
        .mkString("CASE ", " ", s" ELSE ${BootPoissonT.size} END")
      s"""WITH base AS (SELECT doc_id, CAST(len($toksSql) AS BIGINT) AS x
                        FROM documents),
            reps AS (SELECT CAST(r AS BIGINT) AS r FROM range(0, $BootR) t(r)),
            u AS (SELECT r, x,
                         ${hexPrefixIntSql(s"md5('boot|' || CAST(r AS VARCHAR) || '|' || CAST(doc_id AS VARCHAR))", 8)} AS u
                  FROM base CROSS JOIN reps),
            w AS (SELECT r, x, $wCaseSql AS w FROM u),
            m AS (SELECT r, CAST(SUM(w * x) AS DOUBLE) / SUM(w) AS m
                  FROM w GROUP BY r HAVING SUM(w) > 0),
            lo AS (SELECT m FROM (SELECT m, row_number() OVER (ORDER BY m ASC, r) AS rk
                                  FROM m) WHERE rk = 5),
            hi AS (SELECT m FROM (SELECT m, row_number() OVER (ORDER BY m DESC, r) AS rk
                                  FROM m) WHERE rk = 5),
            pt AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
                          CAST(SUM(x) AS DOUBLE) / COUNT(*) AS pm FROM base)
          SELECT n_docs, CAST($BootR AS BIGINT) AS n_replicas,
                 ROUND(pm, 6) AS mean_tokens,
                 ROUND(lo.m, 6) AS ci_lo, ROUND(hi.m, 6) AS ci_hi
          FROM pt CROSS JOIN lo CROSS JOIN hi"""
    })

  /** Long-safe ceiling for [[knP]]'s FAST path, on the HALF-denominator
    * h = c_a·ndd: with h ≤ 2⁶³/4 the full den = 4·h fits a signed long,
    * and every numerator intermediate is bounded by den (4·c_ab ≤ 4·c_a
    * since c_ab ≤ c_a; 3·n1a·n1b ≤ 3·c_a·ndd because n1a ≤ c_a and
    * n1b ≤ ndd), so the whole long-path computation is wrap-free.
    * Shared with KneserNeySpec's boundary property so code and test
    * can't drift — the `dsirWeights` dispatch recipe
    * ([[PipelineCatalog.DsirLongSafeDen]]). */
  private[graft] val KnLongSafeHalf: Long = Long.MaxValue / 4L

  /** Decimal-safe ceiling for [[knP]]'s WIDE path, again on h = c_a·ndd:
    * h ≤ 10³⁷/4 keeps den = 4·h ≤ 10³⁷ and every DECIMAL(38,0)
    * intermediate (each numerator addend is ≤ den; their sum ≤ 2·den)
    * under 10³⁸ — exact for bigram tables up to h ≈ 2.5·10³⁶, i.e.
    * c_a·ndd products far past any long. h itself is always exact:
    * c_a, ndd are longs, so c_a·ndd ≤ (2⁶³)² ≈ 8.5·10³⁷ < 10³⁸.
    * Shared with KneserNeySpec's wide-boundary fixture. */
  private[graft] val KnDecSafeHalf: BigInt = BigInt(10).pow(37) / 4

  /** The KN-smoothed probability p(y|x) from the five exact counts —
    * ONE definition shared by [[kneserNey]] and KneserNeySpec's
    * hand-built frames. Three-way dispatch on the exact half-denominator
    * h = c_a·ndd (computed in DECIMAL(38,0), where it is exact for ANY
    * long inputs), the [[PipelineCatalog.dsirWeights]] recipe:
    * h ≤ 2⁶³/4 — long fast path, codegen-primitive, every test sf and
    * any single-node corpus; h ≤ 10³⁷/4 — the same formula carried out
    * in DECIMAL(38,0), exact to far-past-fleet-scale bigram tables
    * (the operator DEGRADES to exact-decimal, not an error — under this
    * build's Spark 4.1.2 ANSI-on default the long form would RAISE at
    * the 2⁶³ boundary, and with ANSI disabled it would silently wrap
    * while DuckDB raises; the decimal path avoids both failure modes);
    * beyond — fail loudly INSIDE the result expression
    * (a detached assert column would be pruned). Both wide-path
    * operands reach the one closing double division as round-to-nearest
    * casts of exact integers, so the division input is as good as any
    * double representation of the true ratio.
    */
  private[graft] def knP(cab: Column, ca: Column, n1a: Column, n1b: Column,
      ndd: Column): Column = {
    val dec38 = "decimal(38,0)"
    val h = (ca.cast(dec38) * ndd.cast(dec38)).as("h")
    val longP = (greatest(cab * 4L - 3L, lit(0L)) * ndd
      + lit(3L) * n1a * n1b).cast("double") / (lit(4L) * ca * ndd)
    val wideP = (greatest(cab.cast(dec38) * lit(4L).cast(dec38) - lit(3L).cast(dec38),
        lit(0L).cast(dec38)) * ndd.cast(dec38)
      + lit(3L).cast(dec38) * n1a.cast(dec38) * n1b.cast(dec38)).cast("double") /
      (h * lit(4L).cast(dec38)).cast("double")
    when(h <= lit(KnLongSafeHalf).cast(dec38), longP)
      .when(h <= lit(new java.math.BigDecimal(KnDecSafeHalf.bigInteger)), wideP)
      .otherwise(raise_error(concat(
        lit(s"knP: c_a*ndd exceeds the decimal-safe boundary $KnDecSafeHalf " +
          "(a DECIMAL(38,0) intermediate would overflow); c_a*ndd="),
        h.cast("string"))).cast("double"))
  }

  /** Corpus-touching stage of [[kneserNey]] — the (x, y) bigram count, a
    * plain keyed COUNT (linear, mergeable), factored out so structured
    * streaming maintains the identical aggregate live
    * (graft.streaming.StreamingQueries.streamingKnBigramCounts — the
    * streamingBenfordCounts delegation pattern) and the drained frame
    * replays the full smoothed report via [[knFrom]] bit-for-bit. */
  private[graft] def knBigramCounts(docs: DataFrame): DataFrame = docs
    .select(graft.functions.Text.normTokens(col("text")).as("tl"))
    .filter(size(col("tl")) >= 2)
    .select(explode(graft.functions.Text.wordNgrams(col("tl"), 2)).as("bgs"))
    .select(split(col("bgs"), " ").getItem(0).as("x"),
      split(col("bgs"), " ").getItem(1).as("y"))
    .groupBy("x", "y").agg(count(lit(1)).as("c_ab"))

  /** The vocab-sized smoothing + ranking stage of [[kneserNey]] over a
    * drained (x, y, c_ab) count frame — everything downstream of the
    * corpus; batch and streaming replay share it verbatim. */
  private[graft] def knFrom(bgRaw: DataFrame): DataFrame = {
    val bg = bgRaw.localCheckpoint(eager = true)
    val ca = bg.groupBy("x").agg(sum("c_ab").as("c_a"), count(lit(1)).as("n1a"))
    val cb = bg.groupBy("y").agg(count(lit(1)).as("n1b"))
    val nn = bg.agg(count(lit(1)).as("ndd"))
    bg.join(broadcast(ca), Seq("x")).join(broadcast(cb), Seq("y"))
      .crossJoin(broadcast(nn))
      .select(col("x"), col("y"), col("c_ab"),
        knP(col("c_ab"), col("c_a"), col("n1a"), col("n1b"), col("ndd")).as("p"))
      .orderBy(desc("p"), asc("x"), asc("y")).limit(20)
      .select(col("x"), col("y"), col("c_ab"), round(col("p"), 6).as("p_kn"))
  }

  /** Kneser–Ney smoothed bigram probabilities (Kneser & Ney 1995; Chen &
    * Goodman 1998 §2.7) — the LM-standard absolute-discount smoothing
    * next to [[graft.queries.PipelineCatalog]]'s unsmoothed MLE
    * `doc_bigram_fluency`: what makes KN special is the CONTINUATION
    * back-off (a word's unigram weight is how many distinct contexts it
    * follows, not how often it appears — "Francisco" is frequent but
    * only ever follows "San", so it gets almost no back-off mass). Top
    * 20 bigrams by smoothed p(y|x), discount D = 0.75.
    *
    * Exactness device: D = 3/4 is DYADIC, so the entire formula clears
    * to one exact-integer ratio —
    *   p·(4·c_a·N) = max(4·c_ab − 3, 0)·N + 3·N1+(x·)·N1+(·y)
    * with N the distinct-bigram count; both engines compute num/den
    * exactly (the oracle in BIGINT — exact at any sf DuckDB runs;
    * Spark via [[knP]]'s long/DECIMAL(38,0) dispatch, exact to
    * c_a·ndd ≈ 2.5·10³⁶), perform ONE double division (bit-identical on
    * the shared fast path), rank on that double (ties by (x, y)), and
    * ROUND 6 for the report.
    *
    * 100 TB shape: ONE bigram explode feeds the (x, y) count
    * (map-combined — the frame every stat derives from; the same keyed
    * state a streaming deployment maintains live — see
    * [[knBigramCounts]]); context and continuation tables are
    * vocab-sized broadcasts; the top-20 is a TakeOrdered, never a
    * global sort.
    */
  val kneserNey: CatalogEntry = CatalogEntry(
    "token_kneser_ney",
    (s, d) => knFrom(knBigramCounts(documents(s, d))),
    Some(
      raw"""WITH t AS (SELECT string_split_regex(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS tl
                       FROM documents),
            bg AS (SELECT tl[i] AS x, tl[i + 1] AS y
                   FROM t, LATERAL unnest(range(1, len(tl))) u(i)
                   WHERE len(tl) >= 2),
            cab AS (SELECT x, y, CAST(COUNT(*) AS BIGINT) AS c_ab FROM bg GROUP BY 1, 2),
            ca AS (SELECT x, CAST(SUM(c_ab) AS BIGINT) AS c_a,
                          CAST(COUNT(*) AS BIGINT) AS n1a FROM cab GROUP BY 1),
            cb AS (SELECT y, CAST(COUNT(*) AS BIGINT) AS n1b FROM cab GROUP BY 1),
            nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS ndd FROM cab),
            scored AS (SELECT x, y, c_ab,
                              CAST(GREATEST(c_ab * 4 - 3, 0) * ndd + 3 * n1a * n1b AS DOUBLE)
                              / (4 * c_a * ndd) AS p
                       FROM cab JOIN ca USING (x) JOIN cb USING (y) CROSS JOIN nn)
            SELECT x, y, c_ab, ROUND(p, 6) AS p_kn
            FROM scored ORDER BY p DESC, x, y LIMIT 20"""))

  /** Audit sample budget allocated by [[neymanAllocation]]. */
  private val NeymanBudget = 1000L

  /** Neyman-optimal stratified sample allocation (Neyman 1934): split a
    * [[NeymanBudget]]-doc QA/audit budget across sources proportional
    * to N_h·S_h — stratum size × token-count standard deviation — the
    * allocation that minimizes the variance of the corpus-wide
    * estimate. The design step that belongs in front of
    * [[samplePerSource]]'s flat k-per-source draw: a big noisy crawl
    * source earns more audit rows than a small homogeneous curated one,
    * and proportional-to-size alone over-samples uniform strata.
    *
    * Determinism: per-source moments are DECIMAL-exact sums; mean /
    * variance / sd derive through ONE fixed IEEE expression shape
    * (sample variance (sx2 − sx·sx/n)/(n−1), floored at 0 against
    * cancellation, sqrt correctly rounded); the weight TOTAL is a
    * source-ordered fold (the [[graft.queries.EmbeddingCatalog]]
    * ordered-fold device — a frame-summed double would be partition-
    * order dependent); shares and the rounded allocations are one
    * derive each. Single-doc sources carry zero weight (sd undefined →
    * documented as 0), so they fall to the flat floor a production
    * design adds, not to a NaN.
    *
    * 100 TB shape: ONE corpus pass computes the (source, n, Σx, Σx²)
    * moment grid (map-combined); everything after — fold, shares,
    * rounding — is sources-sized. The rounded allocations may drift
    * from the budget by ±#sources/2 (largest-remainder repair is a
    * sources-sized follow-up a deployment adds; reported drift keeps
    * the law checkable).
    */
  val neymanAllocation: CatalogEntry = CatalogEntry(
    "source_neyman_allocation",
    (s, d) => {
      val dec = org.apache.spark.sql.types.DecimalType(28, 4)
      val m = documents(s, d)
        .select(col("source"),
          size(graft.functions.Text.wsTokens(col("text"))).cast("long").as("x"))
        .groupBy("source")
        .agg(count(lit(1)).as("n"),
          sum(col("x").cast(dec)).as("sx"), sum((col("x") * col("x")).cast(dec)).as("sx2"))
        .select(col("source"), col("n"),
          (col("sx").cast("double") / col("n")).as("mean_tokens"),
          when(col("n") >= 2L,
            sqrt(greatest(
              (col("sx2").cast("double") - col("sx").cast("double") * col("sx").cast("double") / col("n"))
                / (col("n") - 1L), lit(0.0))))
            .otherwise(lit(0.0)).as("sd"))
        .withColumn("w", col("n") * col("sd"))
        .localCheckpoint(eager = true)
      val tot = m
        .groupBy()
        .agg(expr("""aggregate(array_sort(collect_list(struct(source, w))),
                               CAST(0.0 AS DOUBLE), (acc, s) -> acc + s.w)""").as("wtot"))
      // Degenerate-corpus guard (r16 advice): when EVERY source carries
      // zero weight (all single-doc or constant token length) wtot = 0
      // and 0.0/0.0 is NaN in Spark but NULL in DuckDB (double division
      // by zero) — emit NULL share/alloc in both engines instead. w ≥ 0
      // always (w = n·sd), so wtot > 0 ⇔ some source has real spread.
      m.crossJoin(broadcast(tot))
        .select(col("source"), col("n").as("n_docs"),
          round(col("mean_tokens"), 6).as("mean_tokens"),
          round(col("sd"), 6).as("sd_tokens"),
          when(col("wtot") > 0.0,
            round(col("w") / col("wtot"), 6)).as("share"),
          when(col("wtot") > 0.0,
            round(lit(NeymanBudget) * (col("w") / col("wtot")), 0).cast("long"))
            .as("n_alloc"))
        .orderBy("source")
    },
    Some(s"""WITH m AS (
               SELECT source, CAST(COUNT(*) AS BIGINT) AS n,
                      SUM(CAST(len($toksSql) AS DECIMAL(28,4))) AS sx,
                      SUM(CAST(len($toksSql) * len($toksSql) AS DECIMAL(28,4))) AS sx2
               FROM documents GROUP BY source),
             der AS (
               SELECT source, n,
                      ${Exact.sqlToDouble("sx")} / n AS mean_tokens,
                      CASE WHEN n >= 2
                           THEN sqrt(GREATEST((${Exact.sqlToDouble("sx2")}
                                               - ${Exact.sqlToDouble("sx")} * ${Exact.sqlToDouble("sx")} / n)
                                              / (n - 1), 0.0))
                           ELSE 0.0 END AS sd
               FROM m),
             w AS (SELECT source, n, mean_tokens, sd, n * sd AS w FROM der),
             tot AS (SELECT list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                              list(w ORDER BY source)), (acc, v) -> acc + v) AS wtot
                     FROM w)
             SELECT source, n AS n_docs,
                    ROUND(mean_tokens, 6) AS mean_tokens,
                    ROUND(sd, 6) AS sd_tokens,
                    CASE WHEN wtot > 0 THEN ROUND(w / wtot, 6) END AS share,
                    CASE WHEN wtot > 0
                         THEN CAST(ROUND($NeymanBudget * (w / wtot), 0) AS BIGINT)
                    END AS n_alloc
             FROM w CROSS JOIN tot ORDER BY source"""))

  /** Corpus-touching stage of [[goodTuring]] — the unigram count table,
    * a plain keyed COUNT (linear, mergeable), factored out so structured
    * streaming maintains it live (graft.streaming.StreamingQueries
    * .streamingUnigramCounts — the knBigramCounts delegation pattern);
    * the drained table replays the full frequency-of-frequencies report
    * via [[goodTuringFrom]] bit-for-bit. State is vocab-bounded. */
  private[graft] def unigramCounts(docs: DataFrame): DataFrame = docs
    .select(explode(Text.normTokens(col("text"))).as("token"))
    .groupBy("token").agg(count(lit(1)).as("c"))

  /** The count-of-counts report of [[goodTuring]] over a drained
    * (token, c) table — everything downstream of the corpus. */
  private[graft] def goodTuringFrom(countsRaw: DataFrame): DataFrame = {
    // One vocab frame feeds the count-of-counts AND the total.
    val counts = countsRaw.localCheckpoint(eager = true)
    val cc = counts.groupBy("c").agg(count(lit(1)).as("n_r"))
      .localCheckpoint(eager = true) // <= #distinct-count-values rows
    val tot = counts.agg(sum("c").as("n_total"))
    val next = cc.select((col("c") - 1L).as("c"), col("n_r").as("n_next"))
    cc.join(broadcast(next), Seq("c"), "left")
      .crossJoin(broadcast(tot))
      .select(col("c").as("r"), col("n_r"),
        coalesce(col("n_next"), lit(0L)).as("n_r1"),
        // (r+1)·N_{r+1} = total token mass of the (r+1)-count class
        // <= N <= 2^63, and r·N_r <= N likewise — both products are
        // wrap-free for ANY corpus a long can count, so no decimal
        // widening is needed (unlike the cross-class products in knP).
        when(col("n_next").isNotNull,
          round(((col("c") + 1L) * col("n_next")).cast("double") / col("n_r"), 6))
          .as("r_star"),
        round((col("c") * col("n_r")).cast("double") / col("n_total"), 6)
          .as("mass_frac"))
      .orderBy("r").limit(20)
  }

  /** Good–Turing frequency-of-frequencies (Good 1953; the
    * Gale & Sampson 1995 "simple Good–Turing" setup): for each observed
    * count r, how many vocabulary types carry it (N_r), the Turing
    * re-estimate r* = (r+1)·N_{r+1}/N_r, and the probability mass the
    * class holds (r·N_r/N). The r = 1 row IS the missing-mass estimate
    * (P₀ = N₁/N, its mass_frac) — the number that says how much of the
    * next corpus shard will be unseen vocabulary, the companion
    * smoothing evidence to [[kneserNey]]'s held-out discounting (KN's
    * D = 0.75 approximates n₁/(n₁+2n₂) — readable off this table).
    * Bottom-20 counts ascending: the sparse region where GT matters.
    *
    * Determinism: every statistic is a ratio of exact BIGINTs with ONE
    * double division, then ROUND 6; r* is NULL when N_{r+1} = 0 (count
    * gap) in both engines — never a smoothed fiction.
    *
    * 100 TB shape: ONE token-count shuffle (map-combined — the same
    * vocab table [[tokenZipfCurve]] builds, streamed live as
    * [[unigramCounts]]); count-of-counts collapses vocab to
    * ≤ #distinct-count-values rows; the r+1 self-join and the total ride
    * broadcasts of that tiny frame.
    */
  val goodTuring: CatalogEntry = CatalogEntry(
    "token_good_turing",
    (s, d) => goodTuringFrom(unigramCounts(documents(s, d))),
    Some(s"""WITH counts AS (SELECT token, CAST(COUNT(*) AS BIGINT) AS c FROM (
                               SELECT unnest($normToksSql) AS token FROM documents)
                             GROUP BY token),
                  cc AS (SELECT c, CAST(COUNT(*) AS BIGINT) AS n_r FROM counts GROUP BY c),
                  tot AS (SELECT CAST(SUM(c) AS BIGINT) AS n_total FROM counts)
             SELECT cc.c AS r, cc.n_r,
                    COALESCE(n2.n_r, 0) AS n_r1,
                    CASE WHEN n2.n_r IS NOT NULL
                         THEN ROUND(CAST((cc.c + 1) * n2.n_r AS DOUBLE) / cc.n_r, 6)
                    END AS r_star,
                    ROUND(CAST(cc.c * cc.n_r AS DOUBLE) / n_total, 6) AS mass_frac
             FROM cc LEFT JOIN cc n2 ON n2.c = cc.c + 1 CROSS JOIN tot
             ORDER BY r LIMIT 20"""))

  /** Corpus-touching stage of [[chao1Richness]] — the (source, token)
    * count grid, a plain keyed COUNT (linear, mergeable), factored out
    * so structured streaming maintains it live
    * (graft.streaming.StreamingQueries.streamingSourceTokenCounts); the
    * drained grid replays the per-source richness report via
    * [[chao1From]] bit-for-bit. State is per-source-vocab-bounded. */
  private[graft] def sourceTokenCounts(docs: DataFrame): DataFrame = docs
    .select(col("source"), explode(Text.normTokens(col("text"))).as("token"))
    .groupBy("source", "token").agg(count(lit(1)).as("c"))

  /** The source-sized richness report of [[chao1Richness]] over a
    * drained (source, token, c) grid. */
  private[graft] def chao1From(grid: DataFrame): DataFrame = grid
    .groupBy("source")
    .agg(sum("c").as("n_tokens"), count(lit(1)).as("v_obs"),
      sum(when(col("c") === 1L, 1L).otherwise(0L)).as("f1"),
      sum(when(col("c") === 2L, 1L).otherwise(0L)).as("f2"))
    .select(col("source"), col("n_tokens"), col("v_obs"), col("f1"), col("f2"),
      // F1·(F1−1) in DECIMAL(38,0): hapax counts cross the 2^63 product
      // envelope near F1 ≈ 3·10⁹ — routine for a crawl source at fleet
      // scale (the same r16 envelope audit as doc_top_terms; exact
      // product, one double division, bit-identical below 2^53).
      round(col("v_obs") +
        (col("f1").cast("decimal(38,0)") * (col("f1") - 1L)).cast("double")
          / (lit(2L) * (col("f2") + 1L)), 6).as("chao1"),
      // Good's sample-coverage estimate 1 − F1/n: every source in the
      // grid has n_tokens >= 1 (empty-token docs never reach the
      // explode), so the division is total.
      round(lit(1.0) - col("f1").cast("double") / col("n_tokens"), 6)
        .as("coverage"))
    .orderBy("source")

  /** Chao1 vocabulary-richness estimate per source (Chao 1984, the
    * bias-corrected form; Good 1953 coverage): observed types V, hapax
    * F₁ and doubleton F₂ counts, the nonparametric floor on TRUE
    * vocabulary size chao1 = V + F₁(F₁−1)/(2(F₂+1)), and Good's
    * coverage 1 − F₁/n — how much of the source's token mass its
    * observed vocabulary already explains. The corpus-design readout:
    * a source whose chao1 far exceeds V is under-sampled (more crawl
    * budget surfaces genuinely new vocabulary); one whose coverage ≈ 1
    * is exhausted — the quantitative form of the "diminishing returns
    * per source" judgement [[neymanAllocation]] makes for VARIANCE and
    * [[samplePerSource]] ignores entirely.
    *
    * Determinism: all five count columns are exact BIGINTs off ONE
    * grid; the bias-corrected denominator 2(F₂+1) is never zero (why
    * that form is chosen over the classic F₁²/2F₂); each estimate is
    * one double division (+ one IEEE add) then ROUND 6.
    *
    * 100 TB shape: ONE (source, token) count shuffle (map-combined,
    * streamed live as [[sourceTokenCounts]]), then a source-keyed
    * rollup of that grid — nothing after the grid exceeds #sources
    * rows.
    */
  val chao1Richness: CatalogEntry = CatalogEntry(
    "source_chao1_richness",
    (s, d) => chao1From(sourceTokenCounts(documents(s, d))),
    Some(s"""WITH grid AS (SELECT source, token, CAST(COUNT(*) AS BIGINT) AS c FROM (
                             SELECT source, unnest($normToksSql) AS token FROM documents)
                           GROUP BY source, token),
                  agg AS (SELECT source, CAST(SUM(c) AS BIGINT) AS n_tokens,
                                 CAST(COUNT(*) AS BIGINT) AS v_obs,
                                 CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS f1,
                                 CAST(SUM(CASE WHEN c = 2 THEN 1 ELSE 0 END) AS BIGINT) AS f2
                          FROM grid GROUP BY source)
             SELECT source, n_tokens, v_obs, f1, f2,
                    ROUND(v_obs + CAST(f1 * (f1 - 1) AS DOUBLE) / (2 * (f2 + 1)), 6) AS chao1,
                    ROUND(1.0 - CAST(f1 AS DOUBLE) / n_tokens, 6) AS coverage
             FROM agg ORDER BY source"""))

  /** Corpus-touching stages of [[heapsCurve]] — the token
    * first-occurrence frame (keyed MIN, linear and mergeable: min is
    * the canonical streaming-safe order statistic) and, implicitly, the
    * document-id set the rank stage orders (a keyed dedup — the
    * exact-dedup state shape). Factored so structured streaming
    * maintains the first-occurrence table live
    * (graft.streaming.StreamingQueries.streamingFirstOccurrence) and
    * the drained frame replays the curve via [[heapsFrom]]. */
  private[graft] def firstOccurrence(docs: DataFrame): DataFrame = docs
    .select(col("doc_id"), explode(Text.normTokens(col("text"))).as("token"))
    .groupBy("token").agg(min("doc_id").as("first_doc"))

  /** The grid stage of [[heapsCurve]] over a drained (token, first_doc)
    * frame plus the document-id frame that defines prefix order. */
  private[graft] def heapsFrom(docIds: DataFrame, fo: DataFrame): DataFrame = {
    // Global doc rank WITHOUT a single-partition window — the house
    // GlobalRank (range shuffle + zipWithIndex), corpus-scalable.
    val ranked = graft.operators.GlobalRank.withRank(
      docIds.select(col("doc_id")), Seq(col("doc_id").asc),
      graft.operators.GlobalRank.sessionPartitions(docIds), "drank")
    // n_docs off the doc-id projection directly (a pruned column scan),
    // NOT off `ranked` — the rank RDD's lineage is lazy and would
    // re-execute the whole range shuffle for this one count.
    val nd = docIds.agg(count(lit(1)).as("n_docs"))
    // kmin = ceil(log2(first_rank)) WITHOUT libm: length(bin(r−1)) =
    // floor(log2(r−1))+1 = ceil(log2(r)) for r ≥ 2 — pure integer/string
    // ops, identical in both engines (the log-free device family).
    val km = fo.join(ranked, col("first_doc") === ranked("doc_id"))
      .select(when(col("drank") <= 1L, 0L)
        .otherwise(length(expr("bin(drank - 1)")).cast("long")).as("kmin"))
      .groupBy("kmin").agg(count(lit(1)).as("new_vocab"))
      .localCheckpoint(eager = true) // <= 64 rows forever
    val grid = km.agg(max("kmin").as("km"))
      .select(explode(sequence(lit(0L), col("km"))).as("k"))
    grid.join(broadcast(km), col("kmin") <= col("k"))
      .groupBy("k").agg(sum("new_vocab").as("vocab"))
      .crossJoin(broadcast(nd))
      .select(col("k"),
        least(expr("shiftleft(CAST(1 AS BIGINT), CAST(k AS INT))"), col("n_docs"))
          .as("n_docs_prefix"),
        col("vocab"))
      .orderBy("k")
  }

  /** Heaps'-law vocabulary-growth curve (Heaps 1978; Herdan 1960):
    * distinct-vocabulary size after the first 2ᵏ documents (doc_id
    * order), one row per power-of-two prefix — the dual of
    * [[tokenZipfCurve]]'s rank-frequency points (the two laws are two
    * views of one distribution) and the measurement behind every
    * "vocabulary will grow like n^β" capacity claim a tokenizer or
    * embedding-table budget rests on. A curve that flattens early says
    * the corpus is template-flooded; one still steep at the last point
    * says vocabulary (and [[chao1Richness]]'s unseen mass) keeps
    * coming.
    *
    * Exactness device: a token counts toward prefix k iff its
    * first-occurrence RANK ≤ 2ᵏ, i.e. iff ceil(log2(rank)) ≤ k — and
    * ceil(log2(r)) = length(bin(r−1)) in pure integer/string ops (no
    * libm), so the whole curve is exact-integer grid arithmetic: each
    * token lands in one kmin bucket, the curve is the cumulative sum
    * over ≤ 64 buckets.
    *
    * 100 TB shape: ONE (token → min doc_id) aggregate (map-combined
    * keyed MIN — streams live as [[firstOccurrence]]); one GlobalRank
    * range-shuffle over doc ids (never a global window); one vocab-sized
    * equi-join of the two; everything after is ≤ 64 rows. */
  val heapsCurve: CatalogEntry = CatalogEntry(
    "token_heaps_curve",
    (s, d) => {
      val docs = documents(s, d)
      heapsFrom(docs.select("doc_id"), firstOccurrence(docs))
    },
    Some(s"""WITH ranked AS (SELECT doc_id,
                                    row_number() OVER (ORDER BY doc_id) AS drank
                             FROM documents),
                  fo AS (SELECT token, MIN(doc_id) AS first_doc FROM (
                           SELECT doc_id, unnest($normToksSql) AS token FROM documents)
                         GROUP BY token),
                  km AS (SELECT CASE WHEN drank <= 1 THEN 0
                                     ELSE length(bin(drank - 1)) END AS kmin,
                                CAST(COUNT(*) AS BIGINT) AS new_vocab
                         FROM fo JOIN ranked ON ranked.doc_id = fo.first_doc
                         GROUP BY 1),
                  nd AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents),
                  grid AS (SELECT CAST(k AS BIGINT) AS k FROM range(0, 64) t(k)
                           WHERE k <= (SELECT MAX(kmin) FROM km))
             SELECT k,
                    LEAST(CAST(1 AS BIGINT) << k, n_docs) AS n_docs_prefix,
                    CAST(SUM(new_vocab) AS BIGINT) AS vocab
             FROM grid JOIN km ON km.kmin <= grid.k CROSS JOIN nd
             GROUP BY k, n_docs ORDER BY k"""))

  /** Corpus-touching stage of [[tokenBurstiness]] — the (doc, token)
    * count grid, a plain keyed COUNT (linear, mergeable), factored out
    * so structured streaming maintains it live
    * (graft.streaming.StreamingQueries.streamingDocTokenCounts); the
    * drained grid replays the adaptation report via [[burstinessFrom]]
    * bit-for-bit. State is one row per occupied (doc, token) cell. */
  private[graft] def docTokenCounts(docs: DataFrame): DataFrame = docs
    .select(col("doc_id"), explode(Text.normTokens(col("text"))).as("token"))
    .groupBy("doc_id", "token").agg(count(lit(1)).as("c"))

  /** The vocab-sized adaptation report of [[tokenBurstiness]] over a
    * drained (doc_id, token, c) grid. */
  private[graft] def burstinessFrom(grid: DataFrame): DataFrame = grid
    .groupBy("token")
    .agg(sum("c").as("tf"), count(lit(1)).as("df1"),
      sum(when(col("c") >= 2L, 1L).otherwise(0L)).as("df2"))
    .filter(col("df1") >= 5L)
    .select(col("token"), col("tf"), col("df1"), col("df2"),
      round(col("df2").cast("double") / col("df1"), 6).as("adapt"))
    .orderBy(desc("adapt"), asc("token")).limit(20)

  /** Word burstiness via Church & Gale's adaptation statistic (Church
    * 2000, "Empirical Estimates of Adaptation: The chance of Two
    * Noriegas is closer to p/2 than p²"): per token, the probability a
    * document that mentions it once mentions it AGAIN —
    * adapt = df₂/df₁ (docs with ≥ 2 occurrences over docs with ≥ 1).
    * Content words adapt (a doc about Noriega repeats "noriega");
    * function words don't — so the top-20 by adaptation is a
    * STOPWORD-FREE topical-term extractor with zero frequency cutoffs,
    * and a token whose adapt is near 1 across a whole SOURCE marks
    * boilerplate repetition ([[graft.queries.PipelineCatalog]]'s
    * `doc_repetition` measures the same pathology within one doc).
    * Support floor df₁ ≥ 5 kills hapax noise.
    *
    * Determinism: all three stats are exact BIGINTs off ONE grid; adapt
    * is one double division, ROUND 6; ties break on the token.
    *
    * 100 TB shape: ONE (doc, token) count shuffle (map-combined,
    * streamed live as [[docTokenCounts]] — the same grid
    * `doc_top_terms`' tf stage builds), then a token-keyed rollup;
    * the top-20 is a TakeOrdered.
    */
  val tokenBurstiness: CatalogEntry = CatalogEntry(
    "token_burstiness",
    (s, d) => burstinessFrom(docTokenCounts(documents(s, d))),
    Some(s"""WITH grid AS (SELECT doc_id, token, CAST(COUNT(*) AS BIGINT) AS c FROM (
                             SELECT doc_id, unnest($normToksSql) AS token FROM documents)
                           GROUP BY 1, 2),
                  t AS (SELECT token, CAST(SUM(c) AS BIGINT) AS tf,
                               CAST(COUNT(*) AS BIGINT) AS df1,
                               CAST(SUM(CASE WHEN c >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS df2
                        FROM grid GROUP BY token)
             SELECT token, tf, df1, df2,
                    ROUND(CAST(df2 AS DOUBLE) / df1, 6) AS adapt
             FROM t WHERE df1 >= 5
             ORDER BY adapt DESC, token LIMIT 20"""))

  /** Per-source Gini concentration of document token counts (Gini 1912,
    * rank form; Dorfman 1979) — length inequality as a data-quality
    * signal: a template-flooded source has NEAR-UNIFORM lengths (Gini
    * → 0) while an organic crawl mixes tweets and treatises (high
    * Gini), so the coefficient flags both pathologies the mean hides.
    * G = (2·Σ r·xᵣ)/(n·Σx) − (n+1)/n over docs ranked by (length,
    * doc_id) WITHIN their source.
    *
    * Determinism: ranks come from [[graft.operators.GlobalRank
    * .withRankPerKey]] — a range shuffle on (source, x, doc_id) plus
    * driver-summed per-partition offsets, bit-identical to
    * `row_number() OVER (PARTITION BY source ORDER BY x, doc_id)` (the
    * oracle's form, GlobalRankSpec-pinned) but never holding a whole
    * source in one sort task: the r17 verdict's fat-source hazard —
    * one crawl source owning >50 % of a 100 TB corpus serializes a
    * keyed window — is gone, the skew ceiling is a range bucket. Rank
    * ties share equal x so Σ r·x is tie-order invariant; Σ r·x rides
    * DECIMAL(38,0) (r·x crosses 2⁶³ once a source holds ~3·10⁹ docs —
    * the fleet envelope again); the Gini is ONE fixed IEEE expression
    * of exact integers, ROUND 6. Null-length docs (null text) are
    * excluded before ranking in BOTH engines — Spark orders nulls
    * first, DuckDB last, so leaving them in would shift every rank.
    * All-empty sources (Σx = 0) emit no row (0/0 is NaN in Spark but
    * NULL in DuckDB).
    *
    * 100 TB shape: one pruned projection, ONE range shuffle read twice
    * (run-length counts, then ranked emit — O(partitions + sources)
    * driver traffic), one source-keyed rollup.
    */
  val sourceGini: CatalogEntry = CatalogEntry(
    "source_gini_length",
    (s, d) => {
      val dec38 = "decimal(38,0)"
      val lens = documents(s, d)
        .select(col("source"), col("doc_id"),
          size(graft.functions.Text.wsTokens(col("text"))).cast("long").as("x"))
        .filter(col("x").isNotNull)
      graft.operators.GlobalRank.withRankPerKey(
          lens, Seq("source"), Seq(col("x"), col("doc_id")),
          numPartitions = graft.operators.GlobalRank.sessionPartitions(lens),
          rankCol = "r")
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"), sum("x").as("total_tokens"),
          sum(col("r").cast(dec38) * col("x")).as("srx"))
        .filter(col("total_tokens") > 0L)
        .select(col("source"), col("n_docs"), col("total_tokens"),
          round(lit(2.0) * col("srx").cast("double")
            / (col("n_docs").cast(dec38) * col("total_tokens")).cast("double")
            - (col("n_docs") + 1L).cast("double") / col("n_docs"), 6).as("gini"))
        .orderBy("source")
    },
    Some(s"""WITH lens AS (SELECT source, doc_id,
                                  CAST(len($toksSql) AS BIGINT) AS x
                           FROM documents
                           WHERE len($toksSql) IS NOT NULL),
                  ranked AS (SELECT source, x,
                                    row_number() OVER (PARTITION BY source
                                      ORDER BY x, doc_id) AS r
                             FROM lens),
                  agg AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
                                 CAST(SUM(x) AS BIGINT) AS total_tokens,
                                 SUM(r * x) AS srx
                          FROM ranked GROUP BY source)
             SELECT source, n_docs, total_tokens,
                    ROUND(2.0 * CAST(srx AS DOUBLE) / CAST(n_docs * total_tokens AS DOUBLE)
                          - CAST(n_docs + 1 AS DOUBLE) / n_docs, 6) AS gini
             FROM agg WHERE total_tokens > 0 ORDER BY source"""))

  /** Corpus-touching stage of [[sourceReadability]] — the per-source
    * (docs, words, sentence-marks, vowel-groups) sums: per-row integer
    * regex counts folded into ONE source-keyed aggregate (linear,
    * mergeable, map-combined; streams live as
    * graft.streaming.StreamingQueries.streamingReadabilitySums — the
    * streamingBenfordCounts delegation pattern, StreamingSpec pins the
    * drained replay). Null texts contribute NULL counts (SUM skips them
    * in both engines) but still count into n_docs (COUNT(*) semantics,
    * matching the oracle).
    */
  private[graft] def readabilitySums(docs: DataFrame): DataFrame =
    docs
      .select(col("source"),
        size(Text.wsTokens(col("text"))).cast("long").as("w"),
        expr("size(regexp_extract_all(text, '[.!?]+', 0))").cast("long").as("st"),
        expr("size(regexp_extract_all(lower(text), '[aeiouy]+', 0))").cast("long").as("sy"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"), sum("w").as("n_words"),
        sum("st").as("n_sentences"), sum("sy").as("n_syllables"))

  /** The Flesch report over a drained readability-sums frame — batch and
    * streaming replay share it verbatim. */
  private[graft] def readabilityFrom(sums: DataFrame): DataFrame =
    sums.select(col("source"), col("n_docs"), col("n_words"),
        col("n_sentences"), col("n_syllables"),
        when(col("n_sentences") > 0L && col("n_words") > 0L,
          round(lit(206.835)
            - lit(1.015) * col("n_words").cast("double") / col("n_sentences")
            - lit(84.6) * col("n_syllables").cast("double") / col("n_words"), 6))
          .as("flesch"))
      .orderBy("source")

  /** Flesch reading ease per source (Flesch 1948; the standard
    * 206.835 − 1.015·(words/sentences) − 84.6·(syllables/words)) with
    * the classical vowel-group syllable heuristic — the
    * readability-band profile a corpus designer reads next to
    * `doc_quality_tiers` when balancing a training mix: a source whose
    * score collapses is boilerplate or OCR garbage (`doc_repetition`
    * tells which), one that spikes is fragment soup.
    *
    * Exactness device: all three inputs are INTEGER run counts
    * (whitespace tokens; '[.!?]+' sentence-mark runs; '[aeiouy]+'
    * vowel groups over the lowercased text — regex classes with
    * identical Java/RE2 semantics), summed exactly per source; the
    * score is ONE fixed IEEE expression of those exact integers (two
    * divisions, left-associated exactly as the oracle writes it),
    * ROUND 6. Sources with zero sentences or zero words report NULL —
    * never an ANSI ÷0.
    *
    * 100 TB shape: per-row projections into one map-combined
    * source-keyed aggregate — output sized by the source vocabulary;
    * the sums stream live ([[readabilitySums]]).
    */
  val sourceReadability: CatalogEntry = CatalogEntry(
    "source_readability",
    (s, d) => readabilityFrom(readabilitySums(documents(s, d))),
    Some {
      val sents = raw"len(regexp_extract_all(text, '[.!?]+'))"
      val sylls = raw"len(regexp_extract_all(lower(text), '[aeiouy]+'))"
      s"""SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
                 CAST(SUM(len($toksSql)) AS BIGINT) AS n_words,
                 CAST(SUM($sents) AS BIGINT) AS n_sentences,
                 CAST(SUM($sylls) AS BIGINT) AS n_syllables,
                 CASE WHEN SUM($sents) > 0 AND SUM(len($toksSql)) > 0
                      THEN ROUND(206.835
                             - 1.015 * CAST(SUM(len($toksSql)) AS DOUBLE)
                               / SUM($sents)
                             - 84.6 * CAST(SUM($sylls) AS DOUBLE)
                               / SUM(len($toksSql)), 6)
                 END AS flesch
          FROM documents GROUP BY source ORDER BY source"""
    })

  /** Corpus-touching stage of [[sourceLengthQuartiles]] — the
    * (source, length) COUNT grid: keyed COUNT, linear, mergeable,
    * map-combined; streams live as
    * graft.streaming.StreamingQueries.streamingSourceLengthCounts.
    * Grid cardinality is bounded by #sources × distinct token lengths
    * (≲ max document length) — an operational constant, NEVER corpus
    * volume.
    */
  private[graft] def sourceLengthCounts(docs: DataFrame): DataFrame =
    docs
      .select(col("source"),
        size(graft.functions.Text.wsTokens(col("text"))).cast("long").as("x"))
      .filter(col("x").isNotNull)
      .groupBy("source", "x").agg(count(lit(1)).as("c"))

  /** The quartile report over a drained (source, x, c) length grid —
    * batch entry and streaming replay share it verbatim. The value at
    * ascending rank k is the smallest x whose cumulative count reaches
    * k, so exact per-source quantiles need only a cumulative window
    * over the GRID (distinct lengths per source — bounded rows, not
    * documents; a dominating source cannot serialize it, unlike a
    * per-document keyed window).
    */
  private[graft] def quartilesFromLengthGrid(grid: DataFrame): DataFrame = {
    val cum = grid
      .withColumn("cum", sum("c").over(
        Window.partitionBy("source").orderBy("x")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("n_docs", sum("c").over(Window.partitionBy("source")))
    cum.groupBy("source")
      .agg(max("n_docs").as("n_docs"),
        min(when(col("cum") >= expr("(n_docs + 3) div 4"), col("x"))).as("p25"),
        min(when(col("cum") >= expr("(n_docs + 1) div 2"), col("x"))).as("p50"),
        min(when(col("cum") >= expr("(3 * n_docs + 3) div 4"), col("x"))).as("p75"),
        min(when(col("cum") >= expr("(9 * n_docs + 9) div 10"), col("x"))).as("p90"))
      .orderBy("source")
  }

  /** Exact per-source token-length quartiles (p25/p50/p75/p90, the
    * lower-value ⌈q·n⌉ order statistic — exact, never interpolated or
    * sketched): the length profile that decides per-source packing
    * budgets ([[packSequences]]) and truncation losses
    * ([[tokenBudget]]'s fill_ratio) — a mean-length table hides exactly
    * the bimodality (tweets + treatises) these quantiles expose.
    *
    * Two exact devices exist for per-key order statistics and the suite
    * pins their equality (TrainPrepSpec): the GENERAL form ranks every
    * row via [[graft.operators.GlobalRank.withRankPerKey]] (needed when
    * the order key is near-unique — scores, timestamps); token LENGTHS
    * collapse to a bounded value domain, so this entry rides the
    * cheaper grid form — count per (source, length), then quantiles
    * from cumulative counts over grid rows. The per-source window here
    * orders DISTINCT LENGTHS (≲ max doc length rows per source, an
    * operational constant), not documents — a dominating source adds
    * mass to grid cells, not rows to the window, so the fat-source
    * hazard that moved `source_gini_length` off keyed windows does not
    * arise.
    *
    * Exactness: counts, cumulative sums, and the ⌈q·n⌉ indexes
    * ((n+3) div 4 etc.) are BIGINT end-to-end; the reported quantiles
    * are input values, no arithmetic to diverge.
    *
    * 100 TB shape: ONE (source, length) grid shuffle (map-combined,
    * streams live), a grid-sized window, a source-keyed rollup.
    */
  val sourceLengthQuartiles: CatalogEntry = CatalogEntry(
    "source_length_quartiles",
    (s, d) => quartilesFromLengthGrid(sourceLengthCounts(documents(s, d))),
    Some(s"""WITH lens AS (SELECT source, CAST(len($toksSql) AS BIGINT) AS x
                           FROM documents
                           WHERE len($toksSql) IS NOT NULL),
                  grid AS (SELECT source, x, CAST(COUNT(*) AS BIGINT) AS c
                           FROM lens GROUP BY source, x),
                  cums AS (SELECT source, x,
                                  SUM(c) OVER (PARTITION BY source ORDER BY x
                                    ROWS UNBOUNDED PRECEDING) AS cum,
                                  SUM(c) OVER (PARTITION BY source) AS n
                           FROM grid)
             SELECT source, CAST(MAX(n) AS BIGINT) AS n_docs,
                    MIN(CASE WHEN cum >= (n + 3) // 4 THEN x END) AS p25,
                    MIN(CASE WHEN cum >= (n + 1) // 2 THEN x END) AS p50,
                    MIN(CASE WHEN cum >= (3 * n + 3) // 4 THEN x END) AS p75,
                    MIN(CASE WHEN cum >= (9 * n + 9) // 10 THEN x END) AS p90
             FROM cums GROUP BY source ORDER BY source"""))

  /** Distribution drift between the train and val splits: total-variation
    * distance between their unigram distributions, plus vocabulary sizes
    * and overlap — the check that a hash split didn't skew token
    * coverage (the same statistic monitors corpus drift between crawl
    * snapshots). TV distance is chosen over KL/JS deliberately: it is
    * PURE INTEGER ARITHMETIC until one final division —
    * TV = Σ|c_t·N_v − v_t·N_t| / (2·N_t·N_v) over exact counts — no
    * `ln()` libm call whose last bit differs across engines (same
    * rationale as `doc_top_terms`' log-free tf-idf). The integer sum is
    * order-independent, so the one double division is bit-identical
    * everywhere.
    *
    * 100 TB shape: one (split, token) hash-aggregate over the corpus, a
    * vocab-sized outer join of the two count vectors, and a scalar
    * aggregate — the per-token counts fit in long until corpus sizes
    * approach 2⁶³/N; the decimal widening is where the oracle's HUGEINT
    * would go when they don't.
    */
  /** The divergence computation as a LAZY frame, caches registered into
    * `caches` — the entry materializes it (localCheckpoint) and releases
    * them; PlanSpec inspects THIS frame's plan, because the entry's
    * checkpoint erases the join topology from the executed plan.
    */
  private[graft] def splitDivergenceFrame(docs: DataFrame,
      caches: scala.collection.mutable.ListBuffer[DataFrame]): DataFrame = {
    val hx = splitHx(col("doc_id"))
    val toks = docs
      .select(when(hx < TrainBound, "train").when(hx < ValBound, "val").as("split"),
        explode(Text.normTokens(col("text"))).as("tok"))
      .filter(col("split").isNotNull)
    val cnt = toks.groupBy("tok").agg(
      sum(when(col("split") === "train", 1L).otherwise(0L)).as("ct"),
      sum(when(col("split") === "val", 1L).otherwise(0L)).as("cv")).cacheOnce()
    caches += cnt
    // The |c_t·N_v − c_v·N_t| sum needs the totals alongside every
    // token row: broadcast the 1-row totals back onto the count vector.
    val totals = cnt.agg(sum("ct").as("nt"), sum("cv").as("nv"))
    val tv = cnt.crossJoin(broadcast(totals))
      .agg(sum(abs(col("ct") * col("nv") - col("cv") * col("nt"))).as("num"),
        first(col("nt")).as("nt"), first(col("nv")).as("nv"))
      // One-sided degenerate split (all mass in train or all in val):
      // TV against an empty distribution is 1 by the zero-overlap
      // convention (source_divergence_matrix); both-empty stays null.
      // CaseWhen branches evaluate lazily, so the division never runs
      // with a zero denominator (ANSI divide-by-zero).
      .select(when(col("nt") > 0 && col("nv") > 0,
          round(col("num") / (lit(2.0) * col("nt") * col("nv")), 6))
        .otherwise(when(
          coalesce(col("nt"), lit(0L)) + coalesce(col("nv"), lit(0L)) > 0,
          lit(1.0)).otherwise(lit(null).cast("double"))).as("tv_distance"))
    val stats = cnt.agg(
      sum("ct").as("n_train_tokens"), sum("cv").as("n_val_tokens"),
      sum(when(col("ct") > 0, 1L).otherwise(0L)).as("vocab_train"),
      sum(when(col("cv") > 0, 1L).otherwise(0L)).as("vocab_val"),
      sum(when(col("ct") > 0 && col("cv") > 0, 1L).otherwise(0L)).as("vocab_shared"))
    stats.crossJoin(tv)
  }

  val splitDivergence: CatalogEntry = CatalogEntry(
    "split_token_divergence",
    (s, d) => {
      val caches = scala.collection.mutable.ListBuffer.empty[DataFrame]
      val res = splitDivergenceFrame(documents(s, d), caches).localCheckpoint()
      caches.foreach(_.unpersist(blocking = false))
      res
    },
    Some(s"""WITH toks AS (
               SELECT CASE WHEN hx < '$TrainBound' THEN 'train'
                           WHEN hx < '$ValBound' THEN 'val' END AS split,
                      unnest(t) AS tok
               FROM (SELECT ${splitHxSql("doc_id")} AS hx,
                            $normToksSql AS t
                     FROM documents)
               WHERE hx < '$ValBound'),
             cnt AS (SELECT tok,
                            CAST(SUM(CASE WHEN split = 'train' THEN 1 ELSE 0 END) AS BIGINT) AS ct,
                            CAST(SUM(CASE WHEN split = 'val' THEN 1 ELSE 0 END) AS BIGINT) AS cv
                     FROM toks GROUP BY tok),
             tot AS (SELECT CAST(SUM(ct) AS BIGINT) AS nt, CAST(SUM(cv) AS BIGINT) AS nv FROM cnt)
             SELECT (SELECT CAST(SUM(ct) AS BIGINT) FROM cnt) AS n_train_tokens,
                    (SELECT CAST(SUM(cv) AS BIGINT) FROM cnt) AS n_val_tokens,
                    (SELECT CAST(SUM(CASE WHEN ct > 0 THEN 1 ELSE 0 END) AS BIGINT) FROM cnt) AS vocab_train,
                    (SELECT CAST(SUM(CASE WHEN cv > 0 THEN 1 ELSE 0 END) AS BIGINT) FROM cnt) AS vocab_val,
                    (SELECT CAST(SUM(CASE WHEN ct > 0 AND cv > 0 THEN 1 ELSE 0 END) AS BIGINT) FROM cnt) AS vocab_shared,
                    (SELECT CASE
                              WHEN MAX(nt) > 0 AND MAX(nv) > 0
                              THEN ROUND(CAST(SUM(ABS(ct * nv - cv * nt)) AS DOUBLE)
                                         / (2.0 * MAX(nt) * MAX(nv)), 6)
                              WHEN COALESCE(MAX(nt), 0) + COALESCE(MAX(nv), 0) > 0
                              THEN 1.0
                            END
                     FROM cnt, tot) AS tv_distance"""))

  /** Pairwise distribution distance across SOURCES: the full
    * total-variation matrix between every pair of source unigram
    * distributions — the statistic a mixing-weight tuner reads (two
    * near-identical sources are redundant mass; a far-outlier source
    * needs its own mixing weight). Same integer-exact TV construction as
    * [[splitDivergence]]: Σ|c_a·N_b − c_b·N_a| stays in long until ONE
    * final double division per pair.
    *
    * The inner token join only sees SHARED tokens; the one-sided mass a
    * TV distance must also count (a token in src_a only contributes
    * c_a·N_b to the numerator) is recovered in closed form from the
    * totals — Σ_{a-only} c_a = N_a − Σ_shared c_a — so no outer join is
    * ever needed, and pairs come from the tiny totals×totals frame so
    * even a zero-overlap pair surfaces (at its correct TV of 1).
    *
    * 100 TB shape: one (source, token) aggregate over the corpus, then a
    * token-keyed self-join whose fan-out is bounded by #sources² per
    * token — sources are a handful, so the join output is ~vocab ×
    * #sources²/2, independent of corpus row count; totals ride a
    * broadcast of a #sources-row frame.
    */
  val sourceDivergence: CatalogEntry = CatalogEntry(
    "source_divergence_matrix",
    (s, d) => {
      val cnt = documents(s, d)
        .select(col("source"), explode(Text.normTokens(col("text"))).as("tok"))
        .groupBy("source", "tok").agg(count(lit(1)).as("c")).cacheOnce()
      val tot = cnt.groupBy("source").agg(sum("c").as("n"))
      val pairsAll = tot.select(col("source").as("src_a"), col("n").as("na"))
        .join(broadcast(tot.select(col("source").as("src_b"), col("n").as("nb"))),
          col("src_a") < col("src_b"))
      val shared = cnt.as("a").join(cnt.as("b"),
          col("a.tok") === col("b.tok") && col("a.source") < col("b.source"))
        .select(col("a.source").as("src_a"), col("b.source").as("src_b"),
          col("a.c").as("ca"), col("b.c").as("cb"))
        .join(broadcast(tot.select(col("source").as("src_a"), col("n").as("na"))), Seq("src_a"))
        .join(broadcast(tot.select(col("source").as("src_b"), col("n").as("nb"))), Seq("src_b"))
        .groupBy("src_a", "src_b")
        .agg(sum(lit(1L)).as("shared_terms"),
          sum(col("ca")).as("sca"), sum(col("cb")).as("scb"),
          sum(abs(col("ca") * col("nb") - col("cb") * col("na"))).as("num0"))
      val out = pairsAll.join(shared, Seq("src_a", "src_b"), "left")
        .select(col("src_a"), col("src_b"),
          round((coalesce(col("num0"), lit(0L)) +
              (col("na") - coalesce(col("sca"), lit(0L))) * col("nb") +
              (col("nb") - coalesce(col("scb"), lit(0L))) * col("na")) /
            (lit(2.0) * col("na") * col("nb")), 6).as("tv_distance"),
          coalesce(col("shared_terms"), lit(0L)).as("shared_terms"))
        .localCheckpoint()
      cnt.unpersist(blocking = false)
      out
    },
    Some(s"""WITH cnt AS (SELECT source, tok, CAST(COUNT(*) AS BIGINT) AS c
                          FROM (SELECT source, unnest($normToksSql) AS tok FROM documents)
                          GROUP BY source, tok),
                  tot AS (SELECT source, CAST(SUM(c) AS BIGINT) AS n FROM cnt GROUP BY source),
                  pairs AS (SELECT ta.source AS src_a, ta.n AS na, tb.source AS src_b, tb.n AS nb
                            FROM tot ta JOIN tot tb ON ta.source < tb.source),
                  shared AS (SELECT a.source AS src_a, b.source AS src_b,
                                    CAST(COUNT(*) AS BIGINT) AS shared_terms,
                                    CAST(SUM(a.c) AS BIGINT) AS sca,
                                    CAST(SUM(b.c) AS BIGINT) AS scb,
                                    CAST(SUM(ABS(a.c * tb.n - b.c * ta.n)) AS BIGINT) AS num0
                             FROM cnt a JOIN cnt b ON a.tok = b.tok AND a.source < b.source
                                  JOIN tot ta ON ta.source = a.source
                                  JOIN tot tb ON tb.source = b.source
                             GROUP BY 1, 2)
             SELECT p.src_a, p.src_b,
                    ROUND(CAST(COALESCE(s.num0, 0) + (p.na - COALESCE(s.sca, 0)) * p.nb
                               + (p.nb - COALESCE(s.scb, 0)) * p.na AS DOUBLE)
                          / (2.0 * p.na * p.nb), 6) AS tv_distance,
                    COALESCE(s.shared_terms, 0) AS shared_terms
             FROM pairs p LEFT JOIN shared s
               ON s.src_a = p.src_a AND s.src_b = p.src_b"""))

  /** Tokenizer fertility per (source, lang): BPE-ish tokens per
    * whitespace word — the multiplier that converts word counts into
    * token budgets (cost estimates, packing targets, per-language
    * sampling correction; fertility far from ~1.3 flags a language the
    * tokenizer splits badly). Corpus-level ratio of two exact integer
    * sums with ONE double division — bit-identical cross-engine, the
    * file-wide device.
    *
    * 100 TB shape: both counts are per-row projections folded into one
    * (source, lang)-keyed aggregate — map-side combined, output sized by
    * the mix, not the corpus.
    */
  val tokenizerFertility: CatalogEntry = CatalogEntry(
    "doc_tokenizer_fertility",
    (s, d) => documents(s, d)
      .select(col("source"), col("lang"),
        Text.bpeTokenCount(col("text")).cast("long").as("bpe"),
        size(Text.wsTokens(col("text"))).cast("long").as("ws"))
      .groupBy("source", "lang")
      .agg(count(lit(1)).as("docs"),
        sum("bpe").as("bpe_tokens"), sum("ws").as("ws_tokens"))
      .select(col("source"), col("lang"), col("docs"),
        col("bpe_tokens"), col("ws_tokens"),
        round(col("bpe_tokens") / col("ws_tokens"), 6).as("fertility")),
    Some(raw"""SELECT source, lang, COUNT(*) AS docs,
                      CAST(SUM(len(regexp_extract_all(text, '\p{L}+|\p{N}+|[^\s\p{L}\p{N}]+'))) AS BIGINT) AS bpe_tokens,
                      CAST(SUM(len($toksSql)) AS BIGINT) AS ws_tokens,
                      ROUND(CAST(SUM(len(regexp_extract_all(text, '\p{L}+|\p{N}+|[^\s\p{L}\p{N}]+'))) AS DOUBLE)
                            / SUM(len($toksSql)), 6) AS fertility
               FROM documents GROUP BY source, lang"""))

  /** Per-source vocabulary diversity: the Gini–Simpson index
    * 1 − Σp² = (N² − Σc²)/N² of each source's unigram distribution plus
    * its raw vocab/token counts — the diversity-collapse monitor a
    * synthetic-data pipeline watches (mode collapse shows up as Σc²
    * spiking long before the vocab count moves). Simpson is the
    * engine-exact stand-in for Shannon entropy: same monotone response
    * to concentration, but INTEGER-exact until one final division — no
    * ln() libm divergence (the same substitution family as the PMI and
    * TV-distance entries).
    *
    * Shape: one (source, token) count shuffle, then a source-keyed
    * rollup of Σc and Σc² — both decimal-exact; N² forms in doubles from
    * the exact N identically in both engines.
    */
  val tokenDiversity: CatalogEntry = CatalogEntry(
    "source_token_diversity",
    (s, d) => {
      import org.apache.spark.sql.types.DecimalType
      val counts = Tables.documents(s, d)
        .select(col("source"), explode(Text.normTokens(col("text"))).as("tok"))
        .groupBy("source", "tok").agg(count(lit(1)).as("c"))
      val m = counts.groupBy("source").agg(
        sum(col("c")).as("n_tokens"),
        count(lit(1)).as("n_vocab"),
        sum((col("c").cast(DecimalType(18, 0)) * col("c").cast(DecimalType(18, 0)))
          .cast(DecimalType(38, 0))).as("s2d"))
      val nd = col("n_tokens").cast("double")
      m.select(col("source"), col("n_tokens"), col("n_vocab"),
        round((nd * nd - col("s2d").cast("double")) / (nd * nd), 6)
          .as("simpson_diversity"))
    },
    Some(s"""WITH counts AS (SELECT source, tok, COUNT(*) AS c FROM (
                              SELECT source, unnest($normToksSql) AS tok
                              FROM documents)
                             GROUP BY source, tok),
                  m AS (SELECT source,
                               CAST(SUM(c) AS BIGINT) AS n_tokens,
                               COUNT(*) AS n_vocab,
                               ${Exact.sqlToDouble("SUM(CAST(CAST(c AS DECIMAL(18,0)) * CAST(c AS DECIMAL(18,0)) AS DECIMAL(38,0)))")} AS s2
                        FROM counts GROUP BY source)
             SELECT source, n_tokens, n_vocab,
                    ROUND((CAST(n_tokens AS DOUBLE) * CAST(n_tokens AS DOUBLE) - s2)
                          / (CAST(n_tokens AS DOUBLE) * CAST(n_tokens AS DOUBLE)), 6)
                      AS simpson_diversity
             FROM m"""))

  /** Exact two-sample Kolmogorov–Smirnov drift statistic between every
    * source pair on the per-doc token-count distribution — the
    * distribution-shape companion to `source_divergence_matrix` (which
    * compares vocabularies): D = max_x |F_a(x) − F_b(x)|, the standard
    * monitor for "did this source's length profile shift away from the
    * others" (a recrawl that truncates pages, a boilerplate change).
    *
    * Exactness device: ECDF differences stay RATIONAL — cum_a/n_a −
    * cum_b/n_b compares as the integer |cum_a·n_b − cum_b·n_a|, so the
    * max is found in exact arithmetic and only the final statistic
    * divides once as double (both engines compute the identical
    * long-product denominator first). Integer headroom: cum·n products
    * bound by n_a·n_b < 2^63 up to ~3e9 docs per source; beyond that the
    * same query runs in DECIMAL.
    *
    * 100 TB shape: the corpus is touched once (per-(source, x) histogram
    * with map-side combine); everything after runs on histogram-sized
    * frames — the ECDF grid is |support| × #sources rows (support =
    * distinct integer token counts, bounded by max doc length, NOT by
    * corpus size), the pair join is grid-sized with a total order over
    * (x, source), and source totals ride a broadcast. The ECDF frame is
    * localCheckpointed because the pair comparison reads it twice.
    */
  val ksDrift: CatalogEntry = CatalogEntry(
    "source_ks_drift",
    (s, d) => {
      val vals = documents(s, d)
        .select(col("source"), size(Text.normTokens(col("text"))).as("x"))
      val hist = vals.groupBy("source", "x").agg(count(lit(1)).as("c"))
      val tot = vals.groupBy("source").agg(count(lit(1)).as("n"))
      val grid = vals.select("x").distinct()
      val e = grid.crossJoin(broadcast(tot))
        .join(hist, Seq("source", "x"), "left")
        .select(col("source"), col("n"), col("x"), coalesce(col("c"), lit(0L)).as("c"))
        .withColumn("cum", sum("c").over(
          Window.partitionBy("source").orderBy("x")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .localCheckpoint()
      e.as("a").join(e.as("b"),
          col("a.x") === col("b.x") && col("a.source") < col("b.source"))
        .select(col("a.source").as("src_a"), col("b.source").as("src_b"),
          col("a.n").as("na"), col("b.n").as("nb"),
          abs(col("a.cum") * col("b.n") - col("b.cum") * col("a.n")).as("dnum"))
        .groupBy("src_a", "src_b", "na", "nb")
        .agg(max("dnum").as("dmax"))
        .select(col("src_a"), col("src_b"),
          round(col("dmax").cast("double") /
            (col("na") * col("nb")).cast("double"), 6).as("ks_stat"))
    },
    Some(s"""WITH vals AS (SELECT source, len($normToksSql) AS x FROM documents),
                  hist AS (SELECT source, x, CAST(COUNT(*) AS BIGINT) AS c
                           FROM vals GROUP BY source, x),
                  tot AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n
                          FROM vals GROUP BY source),
                  grid AS (SELECT DISTINCT x FROM vals),
                  e AS (SELECT t.source, t.n, g.x,
                               SUM(COALESCE(h.c, 0)) OVER (
                                 PARTITION BY t.source ORDER BY g.x
                                 ROWS UNBOUNDED PRECEDING) AS cum
                        FROM grid g CROSS JOIN tot t
                             LEFT JOIN hist h ON h.source = t.source AND h.x = g.x)
             SELECT a.source AS src_a, b.source AS src_b,
                    ROUND(CAST(MAX(ABS(a.cum * b.n - b.cum * a.n)) AS DOUBLE)
                          / CAST(MAX(a.n) * MAX(b.n) AS DOUBLE), 6) AS ks_stat
             FROM e a JOIN e b ON a.x = b.x AND a.source < b.source
             GROUP BY a.source, b.source"""))

  private val BpeK = 5

  /** BPE vocabulary induction — the first `BpeK` merges of byte-pair
    * encoding trained on the corpus word-frequency table, exactly the
    * Sennrich et al. 2016 procedure every production tokenizer
    * (GPT-2/LLaMA-style BPE) starts from: count adjacent symbol pairs
    * weighted by word frequency, merge the most frequent pair corpus-wide
    * (ties broken lexicographically — pinned in BOTH engines), rewrite
    * every word greedily left-to-right, repeat. The output is the merge
    * table itself (rank, pair, merged symbol, pair count) — the artifact
    * a tokenizer ships.
    *
    * Distribution shape (the KMeans discipline): the corpus is touched
    * ONCE — the word-count aggregate collapses 100 TB of text into a
    * vocabulary-sized frame (map-side combined), and all `BpeK`
    * iterations run on that frame: pair counting is a per-row index
    * comprehension + one vocabulary-sized aggregate, the argmax is ONE
    * driver row per iteration (legitimate model traffic, like KMeans
    * centroids), and the merge rewrite is a per-row fold
    * (whole-stage-codegen'd HOF) whose greedy leftmost-first semantics
    * the fold gives for free. Each iteration localCheckpoints the
    * re-written vocabulary to truncate lineage. The oracle unrolls the
    * same K iterations as chained CTEs (pair CTE → 1-row argmax CTE →
    * rewrite CTE with the identical list fold), so both engines walk the
    * same merge path symbol-for-symbol. Assumes K ≪ reachable merges
    * (an exhausted corpus would end the Spark loop and the CTE chain
    * differently — at K=5 on any real corpus this is vacuous).
    */
  val bpeMerges: CatalogEntry = CatalogEntry(
    "token_bpe_merges",
    (s, d) => {
      val emptyArr = array().cast("array<string>")
      var words = documents(s, d)
        .select(explode(filter(Text.normTokens(col("text")), t => t =!= "")).as("w"))
        .groupBy("w").agg(count(lit(1)).as("cnt"))
        .select(col("cnt"), filter(split(col("w"), ""), c => c =!= "").as("sym"))
        .localCheckpoint()
      val merges = Seq.newBuilder[(Long, String, String, String, Long)]
      var k = 1
      var exhausted = false
      while (k <= BpeK && !exhausted) {
        val topArr = words.filter(size(col("sym")) >= 2)
          .select(col("cnt"), explode(transform(
            sequence(lit(1), size(col("sym")) - 1),
            i => struct(element_at(col("sym"), i).as("a"),
              element_at(col("sym"), i + 1).as("b")))).as("p"))
          .groupBy(col("p.a").as("a"), col("p.b").as("b"))
          .agg(sum("cnt").as("c"))
          .orderBy(desc("c"), col("a"), col("b"))
          .limit(1).collect()
        if (topArr.isEmpty) {
          // No mergeable pair left (empty or fully-collapsed corpus):
          // stop early with the merges learned so far instead of
          // indexing into an empty argmax.
          exhausted = true
        } else {
          val top = topArr(0)
          val (a, b, c) = (top.getString(0), top.getString(1), top.getLong(2))
          merges += ((k.toLong, a, b, a + b, c))
          words = words.select(col("cnt"),
            aggregate(col("sym"), emptyArr,
              (acc, sv) =>
                // CaseWhen evaluates branches in order: element_at(acc, -1)
                // only runs once acc is non-empty (ANSI-safe).
                when(size(acc) === 0, concat(acc, array(sv)))
                  .otherwise(when(element_at(acc, -1) === lit(a) && sv === lit(b),
                    concat(slice(acc, lit(1), size(acc) - 1), array(lit(a + b))))
                    .otherwise(concat(acc, array(sv))))).as("sym"))
            .localCheckpoint()
        }
        k += 1
      }
      import s.implicits._
      merges.result().toDF("merge_rank", "lhs", "rhs", "merged", "pair_count")
    },
    Some {
      val rows = (1 to BpeK).map { k =>
        s"""SELECT CAST($k AS BIGINT) AS merge_rank, a AS lhs, b AS rhs,
                   a || b AS merged, c AS pair_count FROM m$k"""
      }.mkString("\n             UNION ALL ")
      s"""WITH $bpeChainSql
           $rows"""
    })

  /** The greedy leftmost-first rewrite of one merge step, as DuckDB list
    * SQL over a `sym` column — shared by the merge chain (weighted
    * vocabulary) and the encode chain (distinct words).
    */
  private def bpeFoldSql(mCte: String): String =
    s"""list_reduce(
          list_prepend(CAST([] AS VARCHAR[]),
            list_transform(sym, s -> [s])),
          (acc, x) -> CASE WHEN len(acc) > 0 AND acc[-1] = $mCte.a
                                AND x[1] = $mCte.b
                      THEN list_concat(acc[1:len(acc) - 1],
                                       [$mCte.a || $mCte.b])
                      ELSE list_concat(acc, x) END)"""

  /** The w0→wK / m1..mK BPE-induction CTE chain (word-frequency table,
    * per-step pair argmax, greedy rewrite) — ONE generator for both the
    * merge-table oracle and the encode oracle, so the two cannot drift.
    */
  private lazy val bpeChainSql: String = {
    val w0 =
      s"""w0 AS (SELECT CAST(COUNT(*) AS BIGINT) AS cnt,
                        list_filter(string_split(w, ''), c -> c <> '') AS sym
                 FROM (SELECT unnest(list_filter($normToksSql, t -> t <> '')) AS w
                       FROM documents)
                 GROUP BY w)"""
    val steps = (1 to BpeK).map { k =>
      s"""p$k AS (SELECT cnt, pr.a AS a, pr.b AS b
                  FROM (SELECT cnt,
                               unnest(list_transform(range(1, len(sym)),
                                 i -> {'a': sym[i], 'b': sym[i + 1]})) AS pr
                        FROM w${k - 1} WHERE len(sym) >= 2)),
           m$k AS (SELECT a, b, CAST(SUM(cnt) AS BIGINT) AS c FROM p$k
                   GROUP BY a, b ORDER BY c DESC, a, b LIMIT 1),
           w$k AS (SELECT cnt, ${bpeFoldSql("m")} AS sym
                   FROM w${k - 1}, m$k m)"""
    }.mkString(",\n             ")
    s"""$w0,
             $steps"""
  }

  /** BPE ENCODING with the induced merges — the apply half of the
    * tokenizer pair ([[bpeMerges]] learns the table; this entry runs it
    * over the corpus and reports per-source symbol compression, the
    * fertility metric by which tokenizers are compared). The merge table
    * arrives as [[BpeK]] driver rows (the KMeans model-traffic
    * discipline, composed from `token_bpe_merges` verbatim); encoding
    * then happens at the DISTINCT-WORD level — each vocabulary word is
    * rewritten once through the rank-ordered greedy folds — and the
    * corpus rejoins the encoded lengths by word. At 100 TB that is the
    * only sane shape: the fold runs |vocab| times, not |corpus tokens|
    * times, and the (word → length) table is vocabulary-sized. The
    * oracle rides the SAME m1..mK argmax CTEs as the merge oracle plus a
    * v-chain over distinct words, so learn and apply cannot diverge.
    */
  val bpeEncode: CatalogEntry = CatalogEntry(
    "token_bpe_encode",
    (s, d) => {
      val emptyArr = array().cast("array<string>")
      val merges = bpeMerges.build(s, d).orderBy("merge_rank")
        .select("lhs", "rhs").collect()
        .map(r => (r.getString(0), r.getString(1))).toSeq
      val docsW = documents(s, d).select(col("source"),
        filter(Text.normTokens(col("text")), t => t =!= "").as("ws"))
      var vocab = docsW.select(explode(col("ws")).as("w")).distinct()
        .select(col("w"), filter(split(col("w"), ""), c => c =!= "").as("sym"))
        .localCheckpoint()
      for ((a, b) <- merges) {
        vocab = vocab.select(col("w"),
          aggregate(col("sym"), emptyArr,
            (acc, sv) =>
              when(size(acc) === 0, concat(acc, array(sv)))
                .otherwise(when(element_at(acc, -1) === lit(a) && sv === lit(b),
                  concat(slice(acc, lit(1), size(acc) - 1), array(lit(a + b))))
                  .otherwise(concat(acc, array(sv))))).as("sym"))
          .localCheckpoint()
      }
      val enc = vocab.select(col("w"),
        size(col("sym")).cast("long").as("n_sym"),
        size(filter(split(col("w"), ""), c => c =!= "")).cast("long").as("n_chr"))
      docsW.select(col("source"), explode(col("ws")).as("w"))
        .join(enc, Seq("w"))
        .groupBy("source")
        .agg(count(lit(1)).as("n_words"),
          sum("n_chr").as("n_chars"), sum("n_sym").as("n_symbols"))
        .select(col("source"), col("n_words"), col("n_chars"), col("n_symbols"),
          round(col("n_chars").cast("double") / col("n_symbols"), 6).as("compression"))
        .orderBy("source")
    },
    Some {
      val vSteps = (1 to BpeK).map { k =>
        s"""v$k AS (SELECT w, ${bpeFoldSql("m")} AS sym
                    FROM v${k - 1}, m$k m)"""
      }.mkString(",\n             ")
      s"""WITH $bpeChainSql,
             v0 AS (SELECT DISTINCT w,
                           list_filter(string_split(w, ''), c -> c <> '') AS sym
                    FROM (SELECT unnest(list_filter($normToksSql, t -> t <> '')) AS w
                          FROM documents)),
             $vSteps,
             enc AS (SELECT w, CAST(len(sym) AS BIGINT) AS n_sym,
                            CAST(len(list_filter(string_split(w, ''), c -> c <> '')) AS BIGINT) AS n_chr
                     FROM v$BpeK),
             dw AS (SELECT source, unnest(list_filter($normToksSql, t -> t <> '')) AS w
                    FROM documents)
           SELECT source, COUNT(*) AS n_words,
                  CAST(SUM(n_chr) AS BIGINT) AS n_chars,
                  CAST(SUM(n_sym) AS BIGINT) AS n_symbols,
                  ROUND(CAST(CAST(SUM(n_chr) AS BIGINT) AS DOUBLE)
                        / CAST(SUM(n_sym) AS BIGINT), 6) AS compression
           FROM dw JOIN enc USING (w)
           GROUP BY source ORDER BY source"""
    })

  /** The dataset card — the per-source datasheet a corpus release ships
    * (Datasheets-for-Datasets style): volume (docs, tokens, mean length),
    * dominant language, exact-duplicate exposure (share of docs whose
    * normalized content hash occurs ≥2 times CORPUS-WIDE — cross-source
    * duplication counts against both sources), and the train-split share
    * under THE split definition (`splitHx` — the same salt/bounds as
    * `doc_split_assign`, so the card can never disagree with the split).
    *
    * One summary artifact composed from four aggregates: the corpus is
    * touched once to build the per-doc projection (tokens / hash / split
    * flag — all per-row), the duplicate exposure rides the exact-dedup
    * groupBy on the 16-byte hash (the irreducible dedup shuffle), and
    * everything after is source-level — top-lang via the max-count +
    * max-lang tie-break join (both engines pin ties identically), card
    * assembly via broadcast joins. Ratios are exact-integer divisions,
    * ROUND 6, the file-wide device.
    */
  val datasetCard: CatalogEntry = CatalogEntry(
    "pipeline_dataset_card",
    (s, d) => {
      val docs = documents(s, d).select(col("source"), col("lang"),
          size(Text.normTokens(col("text"))).cast("long").as("ntok"),
          Text.contentHash(col("text")).as("h"),
          (splitHx(col("doc_id")) < TrainBound).as("is_train"))
      val dupes = docs.groupBy("h").agg(count(lit(1)).as("nh"))
      val base = docs.join(dupes, Seq("h"))
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"), sum("ntok").as("n_tokens"),
          count(when(col("nh") >= 2, 1)).as("n_dup"),
          count(when(col("is_train"), 1)).as("n_train"))
      val lc = docs.groupBy("source", "lang").agg(count(lit(1)).as("c"))
      val mx = lc.groupBy("source").agg(max("c").as("mc"))
      val top = lc.join(broadcast(mx), Seq("source"))
        .filter(col("c") === col("mc"))
        .groupBy("source").agg(max("lang").as("top_lang"))
      base.join(broadcast(top), Seq("source"))
        .select(col("source"), col("n_docs"), col("n_tokens"),
          round(col("n_tokens").cast("double") / col("n_docs"), 6).as("mean_doc_tokens"),
          col("top_lang"),
          round(col("n_dup").cast("double") / col("n_docs"), 6).as("dup_doc_ratio"),
          round(col("n_train").cast("double") / col("n_docs"), 6).as("train_share"))
    },
    Some(s"""WITH docs AS (SELECT source, lang,
                                  CAST(len($normToksSql) AS BIGINT) AS ntok,
                                  md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS h,
                                  ${splitHxSql("doc_id")} AS hx
                           FROM documents),
                  dupes AS (SELECT h, CAST(COUNT(*) AS BIGINT) AS nh
                            FROM docs GROUP BY h),
                  base AS (SELECT source,
                                  CAST(COUNT(*) AS BIGINT) AS n_docs,
                                  CAST(SUM(ntok) AS BIGINT) AS n_tokens,
                                  CAST(COUNT(*) FILTER (WHERE nh >= 2) AS BIGINT) AS n_dup,
                                  CAST(COUNT(*) FILTER (WHERE hx < '$TrainBound') AS BIGINT)
                                    AS n_train
                           FROM docs JOIN dupes USING (h) GROUP BY source),
                  lc AS (SELECT source, lang, CAST(COUNT(*) AS BIGINT) AS c
                         FROM docs GROUP BY source, lang),
                  mx AS (SELECT source, MAX(c) AS mc FROM lc GROUP BY source),
                  top AS (SELECT lc.source, MAX(lang) AS top_lang
                          FROM lc JOIN mx ON mx.source = lc.source AND lc.c = mx.mc
                          GROUP BY lc.source)
             SELECT b.source, b.n_docs, b.n_tokens,
                    ROUND(CAST(b.n_tokens AS DOUBLE) / b.n_docs, 6) AS mean_doc_tokens,
                    t.top_lang,
                    ROUND(CAST(b.n_dup AS DOUBLE) / b.n_docs, 6) AS dup_doc_ratio,
                    ROUND(CAST(b.n_train AS DOUBLE) / b.n_docs, 6) AS train_share
             FROM base b JOIN top t ON t.source = b.source"""))

  /** Positional phrase search — the query class a doc-level inverted
    * index (`token_postings`) cannot answer: exact adjacent-phrase
    * occurrences located by POSITION intersection. The phrase itself is
    * derived in-query (the corpus's most frequent bigram, min-phrase on
    * count ties via a min-struct argmax — no corpus-specific literals
    * baked into the entry), then the token stream is pruned to the two
    * phrase terms' positional postings and joined on
    * (doc_id, pos + 1 = pos) — the classic positional-index phrase
    * algorithm, executed as a pair of filtered scans and one equi join.
    *
    * 100 TB shape: the phrase argmax is a (bigram)-keyed count + a
    * 1-row reduction; the postings filters prune the exploded token
    * stream to two terms' rows BEFORE any shuffle (predicate on the
    * scan), and the intersection join keys on (doc_id, pos) — work is
    * postings-sized, never corpus². The phrase scalar rides a broadcast
    * 1-row cross join, the house scalar pattern.
    */
  val phraseSearch: CatalogEntry = CatalogEntry(
    "doc_phrase_search",
    (s, d) => {
      import graft.functions.Text
      val toksArr = documents(s, d)
        .select(col("doc_id"), Text.normTokens(col("text")).as("tl"))
      val top = toksArr.filter(size(col("tl")) >= 2)
        .select(explode(Text.wordNgrams(col("tl"), 2)).as("bg"))
        .groupBy("bg").agg(count(lit(1)).as("c"))
        .agg(min(struct((-col("c")).as("nc"), col("bg").as("bg"))).as("m"))
        .select(col("m.bg").as("phrase"))
      val toks = toksArr
        .select(col("doc_id"), posexplode(col("tl")).as(Seq("pos", "tok")))
        .crossJoin(broadcast(top))
      val first = toks
        .filter(col("tok") === split(col("phrase"), " ").getItem(0))
        .select(col("doc_id"), col("phrase"), col("pos").as("pa"))
      val second = toks
        .filter(col("tok") === split(col("phrase"), " ").getItem(1))
        .select(col("doc_id").as("doc_b"), col("pos").as("pb"))
      first.join(second,
          col("doc_b") === col("doc_id") && col("pb") === col("pa") + 1)
        .groupBy("doc_id", "phrase")
        .agg(count(lit(1)).as("n_occ"), min(col("pa")).cast("long").as("first_pos"))
        .orderBy("doc_id")
    },
    Some(s"""WITH src AS (SELECT doc_id, $normToksSql AS tl FROM documents),
                  bgc AS (SELECT g AS bg, COUNT(*) AS c FROM (
                            SELECT unnest([array_to_string(tl[i:i+1], ' ')
                                           for i in range(1, len(tl))]) AS g
                            FROM src WHERE len(tl) >= 2)
                          GROUP BY g),
                  top AS (SELECT bg AS phrase FROM bgc
                          ORDER BY c DESC, bg LIMIT 1),
                  toks AS (SELECT doc_id, CAST(pt.pos AS INT) AS pos, pt.t AS tok
                           FROM (SELECT doc_id,
                                   unnest([{'pos': i - 1, 't': tl[i]}
                                           for i in range(1, len(tl) + 1)]) AS pt
                                 FROM src)),
                  fa AS (SELECT t.doc_id, p.phrase, t.pos AS pa
                         FROM toks t, top p
                         WHERE t.tok = string_split(p.phrase, ' ')[1]),
                  fb AS (SELECT t.doc_id, t.pos AS pb
                         FROM toks t, top p
                         WHERE t.tok = string_split(p.phrase, ' ')[2])
             SELECT fa.doc_id, fa.phrase, CAST(COUNT(*) AS BIGINT) AS n_occ,
                    CAST(MIN(fa.pa) AS BIGINT) AS first_pos
             FROM fa JOIN fb ON fb.doc_id = fa.doc_id AND fb.pb = fa.pa + 1
             GROUP BY fa.doc_id, fa.phrase ORDER BY fa.doc_id"""))

  /** Trigram substring-search index (the pg_trgm architecture): a
    * candidate document must contain EVERY character trigram of the
    * search pattern, so an inverted trigram index answers arbitrary
    * INFIX queries — the case a prefix/B-tree index cannot touch — with
    * one index join + exact `instr` verification on candidates only.
    * Patterns are derived in-query (the up-to-5-char infixes starting
    * at char 2 — `substring(tok, 2, 5)`, so a 4-char infix for an
    * exactly-5-char token — of the corpus's three most frequent ≥5-char
    * tokens: a total-order top-3, no baked literals), and the entry reports per pattern the candidate count,
    * the verified match count, and the index's precision: the
    * trigram-cover condition is NECESSARY but not sufficient (trigrams
    * may match out of order / non-adjacently), which is exactly the
    * false-positive rate a deployment needs measured.
    *
    * 100 TB shape: the index is text-length-linear and distinct per doc
    * (one explode + per-row dedup); the candidate join keys on trigram
    * (patterns-side tiny, broadcast); `instr` runs on candidates only,
    * never the corpus — the architecture that turns LIKE '%x%' from a
    * full scan into postings-sized work.
    */
  val trigramSearch: CatalogEntry = CatalogEntry(
    "doc_trigram_search",
    (s, d) => {
      import graft.functions.Text
      val nd = documents(s, d)
        .select(col("doc_id"), Text.normalize(col("text")).as("t"))
        .cacheOnce()
      val tg = nd.filter(length(col("t")) >= 3)
        .select(col("doc_id"), explode(array_distinct(
          expr("transform(sequence(1, length(t) - 2), i -> substring(t, i, 3))")))
          .as("g"))
      val pat = documents(s, d)
        .select(explode(Text.normTokens(col("text"))).as("tok"))
        .filter(length(col("tok")) >= 5)
        .groupBy("tok").agg(count(lit(1)).as("c"))
        .orderBy(desc("c"), col("tok")).limit(3)
        .select(substring(col("tok"), 2, 5).as("pattern")).distinct()
      val ptg = pat.select(col("pattern"), explode(array_distinct(
          expr("transform(sequence(1, length(pattern) - 2), i -> substring(pattern, i, 3))")))
          .as("g"))
      val pn = ptg.groupBy("pattern").agg(count(lit(1)).as("ng"))
      val cand = tg.join(broadcast(ptg), Seq("g"))
        .groupBy("pattern", "doc_id").agg(count(lit(1)).as("nm"))
        .join(broadcast(pn), Seq("pattern"))
        .filter(col("nm") === col("ng"))
        .select("pattern", "doc_id")
      val out = cand.join(nd, Seq("doc_id"))
        .select(col("pattern"),
          when(expr("instr(t, pattern)") > 0, 1L).otherwise(0L).as("hit"))
        .groupBy("pattern")
        .agg(count(lit(1)).as("n_candidates"), sum("hit").as("n_matched"))
        .select(col("pattern"), col("n_candidates"), col("n_matched"),
          round(col("n_matched") / col("n_candidates"), 6).as("match_precision"))
        .orderBy("pattern")
        .localCheckpoint()
      nd.unpersist(blocking = false)
      out
    },
    Some(
      raw"""WITH nd AS (SELECT doc_id,
                               regexp_replace(lower(trim(text)), '\s+', ' ', 'g') AS t
                        FROM documents),
            tg AS (SELECT DISTINCT doc_id, g FROM (
                     SELECT doc_id, unnest([substr(t, i, 3) for i in range(1, len(t) - 1)]) AS g
                     FROM nd WHERE len(t) >= 3)),
            tokc AS (SELECT tok, COUNT(*) AS c FROM (
                       SELECT unnest($normToksSql) AS tok FROM documents)
                     WHERE len(tok) >= 5 GROUP BY tok),
            pat AS (SELECT DISTINCT substr(tok, 2, 5) AS pattern FROM (
                      SELECT tok FROM tokc ORDER BY c DESC, tok LIMIT 3)),
            ptg AS (SELECT DISTINCT pattern,
                           unnest([substr(pattern, i, 3) for i in range(1, len(pattern) - 1)]) AS g
                    FROM pat),
            pn AS (SELECT pattern, COUNT(*) AS ng FROM ptg GROUP BY pattern),
            cand AS (SELECT p.pattern, t.doc_id, COUNT(*) AS nm
                     FROM ptg p JOIN tg t ON t.g = p.g GROUP BY 1, 2),
            cv AS (SELECT c.pattern, c.doc_id
                   FROM cand c JOIN pn ON pn.pattern = c.pattern AND c.nm = pn.ng),
            ver AS (SELECT cv.pattern,
                           CASE WHEN instr(nd.t, cv.pattern) > 0 THEN 1 ELSE 0 END AS hit
                    FROM cv JOIN nd ON nd.doc_id = cv.doc_id)
          SELECT pattern, CAST(COUNT(*) AS BIGINT) AS n_candidates,
                 CAST(SUM(hit) AS BIGINT) AS n_matched,
                 ROUND(CAST(SUM(hit) AS DOUBLE) / COUNT(*), 6) AS match_precision
          FROM ver GROUP BY pattern ORDER BY pattern"""))

  private val PackBudget = 512 // tokens per training sequence

  /** Sequence PACKING statistics — the concat-and-chunk packing every
    * autoregressive pretraining run applies (documents concatenated in
    * a deterministic order, the token stream cut every [[PackBudget]]
    * tokens into fixed-length training sequences): per source, how many
    * sequences the corpus packs into, how many documents STRADDLE a
    * sequence boundary (the fragment count that motivates
    * attention-masking or best-fit packing), and the tail waste the
    * final partial sequence pads. The packing order is (source,
    * doc_id) — stable under re-sharding, the property a reproducible
    * data order needs (same contract as `doc_shuffle_order`).
    *
    * Everything is exact integer arithmetic on one keyed running sum:
    * doc d covers token interval [cum−n, cum) of its source's stream,
    * so it straddles a boundary iff ⌊(cum−n)/B⌋ ≠ ⌊(cum−1)/B⌋, and the
    * sequence count is ⌊(total−1)/B⌋+1. Zero-token docs are excluded
    * (they occupy no interval; counting them as "packed" would inflate
    * docs/sequence).
    *
    * 100 TB shape: ONE range shuffle read twice (the
    * [[graft.operators.GlobalRank.withPrefixSumPerKey]] two-pass
    * prefix-offset device — prefix addition is associative, so
    * partition offsets compose exactly) + one source-keyed aggregate.
    * A dominating source spans range buckets instead of serializing
    * one keyed-window sort task (r18; previously documented as a
    * re-key escape hatch, now the operator itself).
    */
  val packSequences: CatalogEntry = CatalogEntry(
    "doc_pack_sequences",
    (s, d) => {
      val B = PackBudget
      val toks = documents(s, d)
        .select(col("source"), col("doc_id"),
          size(Text.normTokens(col("text"))).cast("long").as("n"))
        .filter(col("n") > 0)
      // The running sum rides withPrefixSumPerKey (range shuffle +
      // driver offsets), not a keyed window: the scaladoc's fat-source
      // re-key is now the operator itself — a source holding most of a
      // 100 TB corpus spans range buckets instead of serializing one
      // window sort task (the r18 source_gini_length device, sum form).
      graft.operators.GlobalRank.withPrefixSumPerKey(
          toks, Seq("source"), Seq(col("doc_id")), "n",
          numPartitions = graft.operators.GlobalRank.sessionPartitions(toks),
          cumCol = "cum", inclusive = true)
        .select(col("source"), col("n"), col("cum"),
          expr(s"(cum - n) div $B").as("first_seq"),
          expr(s"(cum - 1) div $B").as("last_seq"))
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          sum("n").as("total_tokens"),
          (expr(s"(max(cum) - 1) div $B") + 1).as("n_sequences"),
          sum(when(col("first_seq") =!= col("last_seq"), 1L).otherwise(0L))
            .as("n_split_docs"))
        .select(col("source"), col("n_docs"), col("total_tokens"),
          col("n_sequences"), col("n_split_docs"),
          (col("n_sequences") * B - col("total_tokens")).as("tail_waste"),
          round(col("total_tokens") / (col("n_sequences") * B), 6)
            .as("pack_efficiency"))
        .orderBy("source")
    },
    Some(
      raw"""WITH toks AS (SELECT doc_id, source,
                     CAST(len($normToksSql) AS BIGINT) AS n
                   FROM documents),
            cm AS (SELECT source, n,
                     SUM(n) OVER (PARTITION BY source ORDER BY doc_id) AS cum
                   FROM toks WHERE n > 0),
            mk AS (SELECT source, n, cum,
                     (cum - n) // $PackBudget AS first_seq,
                     (cum - 1) // $PackBudget AS last_seq
                   FROM cm),
            agg AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
                      CAST(SUM(n) AS BIGINT) AS total_tokens,
                      CAST((MAX(cum) - 1) // $PackBudget + 1 AS BIGINT) AS n_sequences,
                      CAST(SUM(CASE WHEN first_seq <> last_seq THEN 1 ELSE 0 END) AS BIGINT)
                        AS n_split_docs
                    FROM mk GROUP BY source)
          SELECT source, n_docs, total_tokens, n_sequences, n_split_docs,
                 n_sequences * $PackBudget - total_tokens AS tail_waste,
                 ROUND(CAST(total_tokens AS DOUBLE) / (n_sequences * $PackBudget), 6)
                   AS pack_efficiency
          FROM agg ORDER BY source"""))

  /** Weighted reservoir sample size per source. */
  private val WSampleK = 10

  /** TOKEN-WEIGHTED per-source sample — Efraimidis–Spirakis A-ES
    * ("Weighted random sampling with a reservoir", IPL 2006): keep the
    * [[WSampleK]] docs per source with the largest u^(1/w) — equivalently
    * the largest ln(u)/w, computed that way to stay monotone-safe — where
    * u is the doc's deterministic md5 uniform and w its token count.
    * Inclusion probability scales with w, which is what a TRAINING
    * sample wants: sampling documents uniformly under-represents the
    * long documents that dominate token mass; A-ES samples tokens,
    * without replacement, in one pass. Completes the sampling family:
    * Bernoulli rebalance ([[mixSample]]), uniform k ([[samplePerSource]]),
    * weighted k (this).
    *
    * Same bounded-heap plan as [[samplePerSource]]: TopNAgg keeps ≤ K
    * (key, doc) candidates per source per map partition
    * (ObjectHashAggregate, no window, no corpus sort) — shuffle volume
    * partitions × K × #sources regardless of corpus size.
    *
    * Cross-engine floats: u = (h+1)/2³² is exact-integer-derived and
    * correctly rounded identically in both engines; ln() may differ by
    * 1 ulp cross-libm, so selection/rank boundaries could in principle
    * flutter if two keys sat within ~2 ulp. Measured at sf0.01 and
    * sf0.1: the smallest adjacent-key gap across every source's top-11
    * is ≥ 9e-4 relative — twelve orders of magnitude of margin.
    */
  /** The A-ES key ln(u)/w over (doc_id, text) — factored so the entry
    * and the streaming-parity test derive it identically. */
  private[graft] def wsampleKeyCol: org.apache.spark.sql.Column = {
    val h = conv(substring(md5(concat(lit("wsample|"), col("doc_id").cast("string"))),
      1, 8), 16, 10).cast("long")
    val w = greatest(lit(1L), size(Text.wsTokens(col("text"))).cast("long"))
    log((h + 1) / lit(4294967296.0)) / w
  }

  /** The bounded-heap reservoir over a (source, doc_id, k) frame. A-ES
    * is LITERALLY a reservoir algorithm, and TopNAgg's merge is its
    * reservoir update — so this same aggregation runs unchanged as a
    * streaming complete-mode query (the kmvSketch device): Spark keeps
    * the ≤K-entry buffer as state per source, merges each micro-batch
    * into it, and after the stream drains the emitted sample equals the
    * batch entry bit-for-bit (StreamingSpec). */
  private[graft] def weightedTopK(keyed: DataFrame): DataFrame = {
    val topn = udaf(new graft.combine.TopNAgg(WSampleK))
    keyed.groupBy("source")
      .agg(topn(col("k"), col("doc_id")).as("top"))
      .select(col("source"), posexplode(col("top.entries")))
      .select(col("source"), col("col.event_id").as("doc_id"),
        (col("pos") + 1).cast("long").as("rn"))
  }

  val weightedSample: CatalogEntry = CatalogEntry(
    "doc_weighted_sample",
    (s, d) => weightedTopK(
      documents(s, d).select(col("source"), col("doc_id"), wsampleKeyCol.as("k"))),
    Some(s"""SELECT source, doc_id, CAST(rn AS BIGINT) AS rn FROM (
               SELECT source, doc_id,
                      row_number() OVER (PARTITION BY source
                        ORDER BY k DESC, doc_id) AS rn
               FROM (SELECT source, doc_id,
                            ln((${hexPrefixIntSql("md5('wsample|' || CAST(doc_id AS VARCHAR))", 8)} + 1)
                               / 4294967296.0)
                              / GREATEST(1, len($toksSql)) AS k
                     FROM documents))
             WHERE rn <= $WSampleK"""))

  val all: Seq[CatalogEntry] = Seq(splitAssign, repetition, mixWeights, tokenDf,
    tokenPostings, chunk, shuffleOrder, lengthHistogram, sourceLangMix, mixSample,
    samplePerSource, weightedSample, splitDivergence, sourceDivergence,
    tokenizerFertility, tokenDiversity, ksDrift, bpeMerges, bpeEncode, datasetCard,
    phraseSearch, trigramSearch, packSequences, tokenZipfCurve, tokenBudget,
    bootstrapCi, kneserNey, neymanAllocation, goodTuring, chao1Richness,
    heapsCurve, tokenBurstiness, sourceGini, sourceReadability,
    sourceLengthQuartiles)
}
