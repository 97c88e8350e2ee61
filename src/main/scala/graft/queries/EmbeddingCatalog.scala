package graft.queries

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.CacheOnce._
import graft.Tables

/** Similarity search over the `embeddings` table (vec_id, embedding:
  * FLOAT[64], label): brute-force cosine top-k as the exact baseline, a
  * random-hyperplane-LSH bucketed variant as the scale path, and bucketed
  * cosine near-dup pairs.
  *
  * Determinism across engines: dot products are explicit LEFT folds over
  * per-element double products (same order in Spark `aggregate` and DuckDB
  * `list_reduce`); scores are rounded to 6 decimals before ranking;
  * vec_id breaks ties. The LSH hyperplanes are a fixed ±1 matrix derived
  * from md5 parities at build time and embedded as literals in BOTH the
  * Spark expressions and the oracle SQL.
  */
object EmbeddingCatalog {

  private def embeddings(s: SparkSession, d: String) = Tables.embeddings(s, d)

  private val Dim = 64
  private val K = 5 // top-k neighbours
  private val NQueries = 8 // vec_id < NQueries are the query vectors
  private val Planes = 4 // LSH hyperplanes -> 16 buckets
  private val NearDupThreshold = 0.3
  // SemDeDup prunes at the same cosine as the LSH near-dup family — the
  // two entries differ in HOW candidates are generated, not in what
  // counts as a duplicate.
  private val SemDedupThreshold = 0.3
  // Gram-matrix integer lattice: floor(x·y·1e9 + 0.5) per row. |x·y| ≤ 1
  // keeps the per-row term ≤ 1e9 → signed-64 headroom to ~9e9 rows.
  private val GramScale = 1.0e9
  // Matryoshka shortlist width: the first 16 of 64 dims (1/4 the scan
  // bytes); the exact full-width rerank absorbs the recall loss.
  private val MrlPrefixDim = 16

  /** Deterministic ±1 hyperplane matrix: sign = parity of the first hex
    * digit of md5(prefix + "p_i"). Same constants are inlined into the
    * oracle SQL; distinct prefixes give independent hash tables.
    */
  private def signsFor(prefix: String, planes: Int): Seq[Seq[Int]] = {
    val md = MessageDigest.getInstance("MD5")
    (0 until planes).map { p =>
      (0 until Dim).map { i =>
        val hex = md.digest(s"$prefix${p}_$i".getBytes(StandardCharsets.UTF_8))
          .map("%02x".format(_)).mkString
        if ("13579bdf".contains(hex.charAt(0))) 1 else -1
      }
    }
  }

  private[graft] val planeSigns: Seq[Seq[Int]] = signsFor("", Planes)

  private val BandTables = 4 // independent LSH tables for the banded near-dup
  private val BandPlanes = 8 // planes per table -> 256 buckets per table
  private[graft] val bandedSigns: Seq[Seq[Seq[Int]]] =
    (0 until BandTables).map(t => signsFor(s"t$t:", BandPlanes))

  /** Spark SQL expr: left-fold dot product of two double-cast float arrays. */
  private def dotExpr(a: String, b: String): String =
    s"aggregate(zip_with($a, $b, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"

  /** DuckDB: same left fold via list_reduce over a product comprehension. */
  private def dotSql(a: String, b: String): String =
    s"list_reduce(list_prepend(CAST(0.0 AS DOUBLE), [CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE) for i in range(1, ${Dim + 1})]), (acc, v) -> acc + v)"

  /** Signed projection onto a ±1 plane — a literal ±-sum, 0-based
    * (Spark) / 1-based (DuckDB) element access.
    */
  private def projExprFor(signs: Seq[Int], v: String, oneBased: Boolean): String =
    signs.zipWithIndex.map { case (s, i) =>
      val idx = if (oneBased) i + 1 else i
      val op = if (s > 0) "+" else "-"
      s"$op CAST($v[$idx] AS DOUBLE)"
    }.mkString(" ")

  /** LSH bucket id = Σ_p (proj_p > 0) * 2^p, for an arbitrary sign matrix. */
  private def bucketExprFor(planes: Seq[Seq[Int]], v: String, oneBased: Boolean): String =
    planes.zipWithIndex.map { case (signs, p) =>
      s"(CASE WHEN (${projExprFor(signs, v, oneBased)}) > 0 THEN ${1 << p} ELSE 0 END)"
    }.mkString(" + ")

  /** LSH bucket id over the default query-LSH planes. */
  private def bucketExpr(v: String, oneBased: Boolean): String =
    bucketExprFor(planeSigns, v, oneBased)

  /** Pair-time cosine: only the cross dot product is evaluated per pair —
    * each side's norm (`qn`/`cn`) is computed ONCE per row before the
    * join (3× fewer higher-order-function folds in the hot pair loop).
    * The oracle recomputes norms inline — arithmetically identical.
    */
  private def cosineCol: org.apache.spark.sql.Column =
    round(graft.functions.Vectors.cosineWithNorms(col("qe"), col("ce"), col("qn"), col("cn")), 6)
  private val cosineSql =
    s"ROUND(${dotSql("q.embedding", "c.embedding")} / (SQRT(${dotSql("q.embedding", "q.embedding")}) * SQRT(${dotSql("c.embedding", "c.embedding")})), 6)"

  /** Shared tail: bounded-heap top-K per query (graft.combine.TopNAgg —
    * partial aggregation ships ≤K candidates per map partition).
    */
  private def topKPerQuery(scored: DataFrame): DataFrame = {
    val topk = udaf(new graft.combine.TopNAgg(K))
    scored.groupBy("query_id")
      .agg(topk(col("score"), col("cand_id")).as("top"))
      .select(col("query_id"), posexplode(col("top.entries")))
      .select(col("query_id"), col("col.event_id").as("vec_id"),
        col("col.value").as("score"), (col("pos") + 1).cast("long").as("rn"))
  }

  private val ShortlistC = 4 * K // shortlist width of the approx→rerank family

  /** Shared shortlist→exact-rerank tail of the approximate-scoring ANN
    * family ([[knnSq8]], [[knnMrl]], [[knnMrlIvf]]): bound the
    * approx-scored (query_id, cand_id, score) pairs to [[ShortlistC]]
    * per query with the bounded-heap TopNAgg, then rerank ONLY the
    * shortlist with the exact full-width cosine and keep the final
    * top-K. The candidate norm is computed AFTER the shortlist join:
    * each candidate appears in at most [[NQueries]] pairs, so the
    * per-pair fold costs ≤ NQueries folds per SHORTLISTED row vs one
    * fold for EVERY corpus row pre-join (the pre-join rationale applies
    * to many-pairs-per-row joins only).
    */
  private def shortlistRerank(emb: DataFrame, scored: DataFrame): DataFrame = {
    import graft.functions.Vectors
    val topc = udaf(new graft.combine.TopNAgg(ShortlistC))
    val cands = scored.groupBy("query_id")
      .agg(topc(col("score"), col("cand_id")).as("top"))
      .select(col("query_id"), explode(col("top.entries")).as("e"))
      .select(col("query_id"), col("e.event_id").as("short_cand"))
    val queriesFull = emb.filter(col("vec_id") < NQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("qe"))
      .withColumn("qn", Vectors.norm(col("qe")))
    val corpusFull = emb.select(col("vec_id").as("cand_id"), col("embedding").as("ce"))
    val rer = corpusFull
      .join(broadcast(cands), col("cand_id") === col("short_cand"))
      .withColumn("cn", Vectors.norm(col("ce")))
      .join(broadcast(queriesFull), Seq("query_id"))
      .select(col("query_id"), col("cand_id"), cosineCol.as("score"))
    topKPerQuery(rer)
  }

  /** Oracle counterpart of [[shortlistRerank]]: the `cand` CTE bounding
    * `scoredCte` to [[ShortlistC]] rows per query by `scoreCol`, plus the
    * exact-cosine rerank SELECT. Callers prepend their scoring CTEs
    * (`WITH ..., <this>`), keeping the tail byte-identical across the
    * family so a rerank change cannot drift one oracle.
    */
  private def shortlistRerankSql(scoredCte: String, scoreCol: String): String =
    s"""cand AS (SELECT query_id, cand_id FROM (
                   SELECT query_id, cand_id,
                          row_number() OVER (PARTITION BY query_id ORDER BY $scoreCol DESC, cand_id) AS rn
                   FROM $scoredCte) WHERE rn <= $ShortlistC)
        SELECT query_id, vec_id, score, CAST(rn AS BIGINT) AS rn FROM (
          SELECT cand.query_id, c.vec_id AS vec_id, $cosineSql AS score,
                 row_number() OVER (PARTITION BY cand.query_id ORDER BY $cosineSql DESC, c.vec_id) AS rn
          FROM cand
          JOIN embeddings c ON c.vec_id = cand.cand_id
          JOIN embeddings q ON q.vec_id = cand.query_id)
        WHERE rn <= $K"""

  /** Brute-force exact cosine top-K: the small query set broadcasts against
    * the corpus — one linear scan, no shuffle of the corpus, map-side
    * bounded top-K then a K-row-per-query merge. At 100 TB this IS the
    * correct exact-KNN plan (scan dominates; broadcast keeps it
    * shuffle-free).
    */
  private val bruteOracleSql =
    s"""SELECT query_id, vec_id, score, CAST(rn AS BIGINT) AS rn FROM (
          SELECT q.vec_id AS query_id, c.vec_id AS vec_id, $cosineSql AS score,
                 row_number() OVER (PARTITION BY q.vec_id ORDER BY $cosineSql DESC, c.vec_id) AS rn
          FROM embeddings q JOIN embeddings c ON c.vec_id != q.vec_id
          WHERE q.vec_id < $NQueries) WHERE rn <= $K"""

  val knnBrute: CatalogEntry = CatalogEntry(
    "emb_knn_brute",
    (s, d) => {
      val emb = embeddings(s, d)
      val queries = emb.filter(col("vec_id") < NQueries)
        .select(col("vec_id").as("query_id"), col("embedding").as("qe"))
        .withColumn("qn", graft.functions.Vectors.norm(col("qe")))
      val corpus = emb.select(col("vec_id").as("cand_id"), col("embedding").as("ce"))
        .withColumn("cn", graft.functions.Vectors.norm(col("ce")))
      val scored = corpus.join(broadcast(queries), col("cand_id") =!= col("query_id"))
        .select(col("query_id"), col("cand_id"), cosineCol.as("score"))
      topKPerQuery(scored)
    },
    Some(bruteOracleSql))

  /** LSH-bucketed approximate top-K: both sides hash to a
    * random-hyperplane bucket; candidates are corpus vectors in the
    * query's bucket only (1/2^planes of the corpus in expectation), then
    * exact cosine + bounded top-K. The scale path when the query set is
    * itself large: the join keys on the bucket id, so it hash-partitions
    * instead of broadcasting a scan.
    */
  private lazy val lshOracleSql = {
    val qb = bucketExpr("q.embedding", oneBased = true)
    val cb = bucketExpr("c.embedding", oneBased = true)
    s"""SELECT query_id, vec_id, score, CAST(rn AS BIGINT) AS rn FROM (
          SELECT q.vec_id AS query_id, c.vec_id AS vec_id, $cosineSql AS score,
                 row_number() OVER (PARTITION BY q.vec_id ORDER BY $cosineSql DESC, c.vec_id) AS rn
          FROM embeddings q JOIN embeddings c
            ON ($cb) = ($qb) AND c.vec_id != q.vec_id
          WHERE q.vec_id < $NQueries) WHERE rn <= $K"""
  }

  val knnLsh: CatalogEntry = CatalogEntry(
    "emb_knn_lsh",
    (s, d) => {
      val emb = embeddings(s, d)
        .withColumn("bucket", graft.functions.Vectors.hyperplaneBucket(col("embedding"), planeSigns))
      val queries = emb.filter(col("vec_id") < NQueries)
        .select(col("vec_id").as("query_id"), col("embedding").as("qe"), col("bucket"))
        .withColumn("qn", graft.functions.Vectors.norm(col("qe")))
      val corpus = emb.select(col("vec_id").as("cand_id"), col("embedding").as("ce"),
        col("bucket").as("cbucket"))
        .withColumn("cn", graft.functions.Vectors.norm(col("ce")))
      val scored = corpus.join(broadcast(queries),
          col("cbucket") === col("bucket") && col("cand_id") =!= col("query_id"))
        .select(col("query_id"), col("cand_id"), cosineCol.as("score"))
      topKPerQuery(scored)
    },
    Some(lshOracleSql))

  /** Embedding-cosine near-duplicate pairs, bucketed: only pairs that
    * collide in the hyperplane bucket are scored (never all-pairs), kept
    * when rounded cosine ≥ threshold.
    *
    * BASELINE entry, kept for the bucketing-granularity comparison: one
    * table of 4 hyperplanes ⇒ 16 buckets ⇒ pair work ~n²/16 — fine at
    * test scale, too coarse for a 100 TB corpus. The SCALE PATH is
    * [[nearDupBanded]] (`emb_near_dup_banded`): 4 independent 8-plane
    * tables ⇒ ~n²/64 pair work at HIGHER recall (0.89 vs 0.65 for
    * cosine ≥ 0.9 pairs; derivation in the README). Production use
    * should take the banded entry.
    */
  val nearDupCosine: CatalogEntry = CatalogEntry(
    "emb_near_dup",
    (s, d) => {
      val emb = embeddings(s, d)
        .withColumn("bucket", graft.functions.Vectors.hyperplaneBucket(col("embedding"), planeSigns))
      val a = emb.select(col("vec_id").as("vec_a"), col("embedding").as("qe"), col("bucket"))
        .withColumn("qn", graft.functions.Vectors.norm(col("qe")))
      val b = emb.select(col("vec_id").as("vec_b"), col("embedding").as("ce"),
        col("bucket").as("cbucket"))
        .withColumn("cn", graft.functions.Vectors.norm(col("ce")))
      a.join(b, col("bucket") === col("cbucket") && col("vec_a") < col("vec_b"))
        .select(col("vec_a"), col("vec_b"), cosineCol.as("cosine"))
        .filter(col("cosine") >= NearDupThreshold)
    },
    Some {
      val qb = bucketExpr("q.embedding", oneBased = true)
      val cb = bucketExpr("c.embedding", oneBased = true)
      s"""SELECT q.vec_id AS vec_a, c.vec_id AS vec_b, $cosineSql AS cosine
          FROM embeddings q JOIN embeddings c
            ON ($qb) = ($cb) AND q.vec_id < c.vec_id
          WHERE $cosineSql >= $NearDupThreshold"""
    })

  /** Multi-probe LSH top-K: the recall upgrade of [[knnLsh]] — each query
    * probes its own bucket AND every Hamming-1 neighbor bucket (flip one
    * hyperplane bit), recovering near-neighbors that fell just across one
    * hyperplane. 1+Planes probes ⇒ candidate set grows ~(1+Planes)/2^Planes
    * of the corpus, still far from a scan (Lv et al., VLDB 2007).
    */
  val knnLshMultiprobe: CatalogEntry = CatalogEntry(
    "emb_knn_lsh_multiprobe",
    (s, d) => {
      val emb = embeddings(s, d)
        .withColumn("bucket", graft.functions.Vectors.hyperplaneBucket(col("embedding"), planeSigns))
      val probes = array(
        (col("bucket").cast("int") +: (0 until Planes).map(p =>
          col("bucket").bitwiseXOR(lit(1 << p)).cast("int"))): _*)
      val queries = emb.filter(col("vec_id") < NQueries)
        .select(col("vec_id").as("query_id"), col("embedding").as("qe"),
          explode(probes).as("probe"))
        .withColumn("qn", graft.functions.Vectors.norm(col("qe")))
      val corpus = emb.select(col("vec_id").as("cand_id"), col("embedding").as("ce"),
        col("bucket").as("cbucket"))
        .withColumn("cn", graft.functions.Vectors.norm(col("ce")))
      val scored = corpus.join(broadcast(queries),
          col("cbucket") === col("probe") && col("cand_id") =!= col("query_id"))
        .select(col("query_id"), col("cand_id"), cosineCol.as("score"))
        .distinct() // a candidate can collide through several probes
      topKPerQuery(scored)
    },
    Some {
      val qb = bucketExpr("q.embedding", oneBased = true)
      val cb = bucketExpr("c.embedding", oneBased = true)
      val probeList = (Seq(s"($qb)") ++ (0 until Planes).map(p => s"xor(($qb), ${1 << p})"))
        .mkString(", ")
      s"""SELECT query_id, vec_id, score, CAST(rn AS BIGINT) AS rn FROM (
            SELECT q.vec_id AS query_id, c.vec_id AS vec_id, $cosineSql AS score,
                   row_number() OVER (PARTITION BY q.vec_id ORDER BY $cosineSql DESC, c.vec_id) AS rn
            FROM embeddings q JOIN embeddings c
              ON ($cb) IN ($probeList) AND c.vec_id != q.vec_id
            WHERE q.vec_id < $NQueries) WHERE rn <= $K"""
    })

  private val IvfCentroidLo = 100L // centroids = data-sampled vectors 100..115
  private val IvfCentroidHi = 115L
  /** Query probe depth of the IVF family. 4 is the value
    * [[ivfProbeSweep]] justifies, not fiat: on the trained quantizer
    * (sf0.01) probes 2→4 buys recall 0.75→0.90 for 13%→26% of the
    * brute-force pair work, while 4→8 buys only +0.05 for another 2× —
    * the knee is at 4. Must be a member of [[SweepProbes]] so the
    * sweep's row for the default IS its measured justification. */
  private val IvfProbes = 4

  /** IVF top-K: the inverted-file ANN alternative to hyperplane LSH. A
    * fixed sample of corpus vectors acts as the coarse quantizer
    * (production IVF trains k-means; sampling keeps the operator
    * deterministic for the oracle — the structure is identical): every
    * vector is assigned to its nearest centroid cell (one broadcast pass,
    * map-side argmax), queries probe their `IvfProbes` nearest cells, and
    * exact cosine reranks only the probed cells' members. At 100 TB cells
    * are the partitioning unit: assignment is a narrow scan, the search
    * join keys on cell id.
    */
  val knnIvf: CatalogEntry = CatalogEntry(
    "emb_knn_ivf",
    (s, d) => {
      import graft.functions.Vectors
      val emb = embeddings(s, d)
      val cent = emb.filter(col("vec_id").between(IvfCentroidLo, IvfCentroidHi))
        .select(col("vec_id").as("cid"), col("embedding").as("cemb"))
        .withColumn("cnorm", Vectors.norm(col("cemb")))
      // Cell assignment: argmax rounded cosine, smallest cid on ties.
      val scoredCells = emb
        .withColumn("vnorm", Vectors.norm(col("embedding")))
        .crossJoin(broadcast(cent))
        .withColumn("csim", round(
          Vectors.dot(col("embedding"), col("cemb")) / (col("vnorm") * col("cnorm")), 6))
      val assign = scoredCells
        .groupBy("vec_id")
        .agg(max(struct(col("csim"), (-col("cid")).as("negcid"))).as("best"))
        .select(col("vec_id"), (-col("best.negcid")).cast("long").as("cell"))
      val corpus = emb.join(assign, "vec_id")
        .select(col("vec_id").as("cand_id"), col("embedding").as("ce"), col("cell"))
        .withColumn("cn", expr("SQRT(" + dotExpr("ce", "ce") + ")"))
      // Query probes: top-IvfProbes cells by the same score.
      val probeTop = udaf(new graft.combine.TopNAgg(IvfProbes))
      val probes = scoredCells.filter(col("vec_id") < NQueries)
        .groupBy(col("vec_id").as("query_id"))
        .agg(probeTop(col("csim"), col("cid")).as("top"))
        .select(col("query_id"), posexplode(col("top.entries")))
        .select(col("query_id"), col("col.event_id").as("probe_cell"))
      val queries = emb.filter(col("vec_id") < NQueries)
        .select(col("vec_id").as("query_id"), col("embedding").as("qe"))
        .withColumn("qn", expr("SQRT(" + dotExpr("qe", "qe") + ")"))
        .join(probes, "query_id")
      val scored = corpus.join(broadcast(queries),
          col("cell") === col("probe_cell") && col("cand_id") =!= col("query_id"))
        .select(col("query_id"), col("cand_id"), cosineCol.as("score"))
        .distinct()
      topKPerQuery(scored)
    },
    Some {
      val centSim = // rounded cosine between vector e and centroid c
        s"ROUND(${dotSql("e.embedding", "c.embedding")} / (SQRT(${dotSql("e.embedding", "e.embedding")}) * SQRT(${dotSql("c.embedding", "c.embedding")})), 6)"
      s"""WITH cent AS (SELECT vec_id AS cid, embedding FROM embeddings
                        WHERE vec_id BETWEEN $IvfCentroidLo AND $IvfCentroidHi),
            cellscore AS (
              SELECT e.vec_id, c.cid, $centSim AS csim
              FROM embeddings e CROSS JOIN (SELECT cid, embedding FROM cent) c(cid, embedding)),
            assign AS (
              SELECT vec_id, cid AS cell FROM (
                SELECT vec_id, cid,
                       row_number() OVER (PARTITION BY vec_id ORDER BY csim DESC, cid) AS rn
                FROM cellscore) WHERE rn = 1),
            probes AS (
              SELECT vec_id AS query_id, cid AS probe_cell FROM (
                SELECT vec_id, cid,
                       row_number() OVER (PARTITION BY vec_id ORDER BY csim DESC, cid) AS rn
                FROM cellscore WHERE vec_id < $NQueries) WHERE rn <= $IvfProbes)
          SELECT query_id, vec_id, score, CAST(rn AS BIGINT) AS rn FROM (
            SELECT p.query_id, a.vec_id, $cosineSql AS score,
                   row_number() OVER (PARTITION BY p.query_id ORDER BY $cosineSql DESC, a.vec_id) AS rn
            FROM probes p
            JOIN assign a ON a.cell = p.probe_cell
            JOIN embeddings c ON c.vec_id = a.vec_id AND c.vec_id != p.query_id
            JOIN embeddings q ON q.vec_id = p.query_id)
          WHERE rn <= $K"""
    })

  /** Banded multi-table near-dup — the 100 TB-safe granularity upgrade of
    * [[nearDupCosine]]: `BandTables` independent hyperplane tables of
    * `BandPlanes` planes each (256 buckets/table); a pair is a candidate
    * iff it collides in at least one table's FULL bucket id.
    *
    * Bucket-population math: within-bucket self-join work is
    * Σ_tables n²/2^planes, so 4 tables × 8 planes costs 4·n²/256 = n²/64
    * — 4× less pair work than the single 16-bucket table, while recall
    * RISES for true near-dups: at cosine 0.95 a plane agrees with
    * p = 1 − θ/π ≈ 0.90, so one 8-plane table retains p⁸ ≈ 0.43 and four
    * tables retain 1−(1−p⁸)⁴ ≈ 0.89 (vs 0.65 for the 4-plane table). At
    * 100 TB the knobs scale independently: more planes shrink buckets,
    * more tables buy recall back — never an all-pairs join.
    */
  val nearDupBanded: CatalogEntry = CatalogEntry(
    "emb_near_dup_banded",
    (s, d) => {
      import graft.functions.Vectors
      val emb = embeddings(s, d).cacheOnce() // feeds bands + both scoring joins
      // The doc-LSH shape: shuffle only (vec_id, table, bucket) tuples —
      // never vectors — through the ONE collision self-join; candidate
      // pairs are distinct'd, then vectors join back for exact scoring.
      val bands = emb.select(col("vec_id"),
        posexplode(Vectors.hyperplaneBuckets(col("embedding"), bandedSigns)).as(Seq("t", "b")))
      val cand = bands.as("a").join(bands.as("b"),
          col("a.t") === col("b.t") && col("a.b") === col("b.b") &&
            col("a.vec_id") < col("b.vec_id"))
        .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"))
        .distinct()
      val withNorm = emb.withColumn("nrm", Vectors.norm(col("embedding")))
      cand
        .join(withNorm.select(col("vec_id").as("vec_a"), col("embedding").as("qe"),
          col("nrm").as("qn")), Seq("vec_a"))
        .join(withNorm.select(col("vec_id").as("vec_b"), col("embedding").as("ce"),
          col("nrm").as("cn")), Seq("vec_b"))
        .select(col("vec_a"), col("vec_b"), cosineCol.as("cosine"))
        .filter(col("cosine") >= NearDupThreshold)
    },
    Some {
      val bucketCols = (0 until BandTables)
        .map(t => s"${bucketExprFor(bandedSigns(t), "embedding", oneBased = true)} AS b$t")
        .mkString(", ")
      val cosAB =
        s"ROUND(${dotSql("a.embedding", "b.embedding")} / (SQRT(${dotSql("a.embedding", "a.embedding")}) * SQRT(${dotSql("b.embedding", "b.embedding")})), 6)"
      val branches = (0 until BandTables).map { t =>
        s"""SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, $cosAB AS cosine
            FROM bucketed a JOIN bucketed b ON a.b$t = b.b$t AND a.vec_id < b.vec_id"""
      }.mkString(" UNION ")
      s"""WITH bucketed AS (SELECT vec_id, embedding, $bucketCols FROM embeddings)
          SELECT vec_a, vec_b, cosine FROM ($branches) WHERE cosine >= $NearDupThreshold"""
    })

  /** cent/dist/assign/probes CTE block of the frozen-kmeans IVF oracles
    * ([[knnIvfKmeans]] and the MRL-over-IVF composition): centroid VALUES
    * literals from the frozen model, KMeans.sqDist's arithmetic
    * (|v|² − 2 v·c + |c|² with left-fold dot products — bit-identical
    * across engines, so the raw distance orders identically and needs no
    * ROUND), nearest-cell assignment, and each query's [[IvfProbes]]
    * nearest probe cells. One definition so a centroid or distance change
    * cannot drift one oracle and not the other.
    */
  private lazy val ivfCoreCtes: String = {
    val centRows = IvfCentroids.kmeans16.map { case (cid, c) =>
      val lst = c.mkString("[", ", ", "]")
      val cn2 = c.map(x => x * x).sum // same Scala left fold Spark's literal uses
      s"($cid, $lst, $cn2)"
    }.mkString(", ")
    val distE = s"${dotSql("e.embedding", "e.embedding")} - 2.0 * ${dotSql("e.embedding", "c.cemb")} + c.cn2"
    s"""cent(cid, cemb, cn2) AS (SELECT * FROM (VALUES $centRows) v(cid, cemb, cn2)),
        dist AS (SELECT e.vec_id, c.cid, $distE AS d
                 FROM embeddings e CROSS JOIN cent c),
        assign AS (SELECT vec_id, cid AS cell FROM (
                     SELECT vec_id, cid,
                            row_number() OVER (PARTITION BY vec_id ORDER BY d, cid) AS rn
                     FROM dist) WHERE rn = 1)"""
  }

  private lazy val ivfAssignCtes: String =
    s"""$ivfCoreCtes,
        probes AS (SELECT vec_id AS query_id, cid AS probe_cell FROM (
                     SELECT vec_id, cid,
                            row_number() OVER (PARTITION BY vec_id ORDER BY d, cid) AS rn
                     FROM dist WHERE vec_id < $NQueries) WHERE rn <= $IvfProbes)"""

  /** Prefix-dim ([[MrlPrefixDim]]) dot product / cosine between
    * `q.embedding` and `c.embedding` — the MRL scoring shared by
    * [[knnMrl]]'s oracle and the MRL-over-IVF oracle.
    */
  private def dotPfxSql(a: String, b: String): String =
    s"list_reduce(list_prepend(CAST(0.0 AS DOUBLE), [CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE) for i in range(1, ${MrlPrefixDim + 1})]), (acc, v) -> acc + v)"
  private lazy val prefixCosSql: String =
    s"ROUND(${dotPfxSql("q.embedding", "c.embedding")} / (SQRT(${dotPfxSql("q.embedding", "q.embedding")}) * SQRT(${dotPfxSql("c.embedding", "c.embedding")})), 6)"

  /** IVF with the TRAINED coarse quantizer — [[knnIvf]]'s structure with
    * the sampled centroids replaced by the frozen k-means model
    * ([[IvfCentroids.kmeans16]], produced by graft.operators.KMeans.fit).
    * Because the quantizer is a literal, cell assignment and query
    * probing are pure per-row projections (argmin over 16 codegen'd
    * dot-product distances — ZERO shuffles and no centroid join at all);
    * only the probed-cell rerank joins. Cells are disjoint, so a
    * candidate reaches a query through at most one probe — no distinct
    * needed before top-k. This is the production IVF split: train
    * offline, ship constants, assign map-side.
    */
  val knnIvfKmeans: CatalogEntry = CatalogEntry(
    "emb_knn_ivf_kmeans",
    (s, d) => {
      import graft.functions.Vectors
      val emb = embeddings(s, d)
      val cells = graft.operators.KMeans.sortedCells(col("embedding"), IvfCentroids.kmeans16)
      val corpus = emb.select(col("vec_id").as("cand_id"), col("embedding").as("ce"),
          cells.getItem(0).getField("cid").cast("long").as("cell"))
        .withColumn("cn", Vectors.norm(col("ce")))
      val queries = emb.filter(col("vec_id") < NQueries)
        .select(col("vec_id").as("query_id"), col("embedding").as("qe"),
          explode(slice(cells, 1, IvfProbes)).as("probe"))
        .select(col("query_id"), col("qe"), col("probe.cid").cast("long").as("probe_cell"))
        .withColumn("qn", Vectors.norm(col("qe")))
      val scored = corpus.join(broadcast(queries),
          col("cell") === col("probe_cell") && col("cand_id") =!= col("query_id"))
        .select(col("query_id"), col("cand_id"), cosineCol.as("score"))
      topKPerQuery(scored)
    },
    Some(
      s"""WITH $ivfAssignCtes
          SELECT query_id, vec_id, score, CAST(rn AS BIGINT) AS rn FROM (
            SELECT p.query_id, a.vec_id, $cosineSql AS score,
                   row_number() OVER (PARTITION BY p.query_id ORDER BY $cosineSql DESC, a.vec_id) AS rn
            FROM probes p
            JOIN assign a ON a.cell = p.probe_cell
            JOIN embeddings c ON c.vec_id = a.vec_id AND c.vec_id != p.query_id
            JOIN embeddings q ON q.vec_id = p.query_id)
          WHERE rn <= $K"""))

  /** Scalar-quantized (int8) ANN with exact rerank — the
    * memory-bandwidth scale path (Faiss's SQ8 / IndexScalarQuantizer
    * idea): quantize every vector to 64 int8 codes against the corpus's
    * global absolute-max scale, rank candidates by INTEGER dot product
    * (4 B/dim float reads become 1 B/dim, and the scoring loop is exact
    * integer arithmetic — bit-identical across engines, no float-fold
    * concerns in the hot path), keep the top 4K per query, then rerank
    * just those with the exact cosine.
    *
    * At 100 TB the quantized corpus scan reads 1/4 the bytes of the
    * float scan and the rerank touches only 4K · |queries| vectors via a
    * broadcast semi-lookup — the standard quantize→shortlist→rerank ANN
    * architecture. Quantization uses floor (not round: engines disagree
    * on half-way ties) — recall loss vs round is negligible and the
    * exact rerank absorbs it.
    */
  val knnSq8: CatalogEntry = CatalogEntry(
    "emb_knn_sq8",
    (s, d) => {
      import org.apache.spark.sql.Column
      val emb = embeddings(s, d)
      val mx = emb.agg(
        max(array_max(transform(col("embedding"), x => abs(x.cast("double"))))).as("m"))
      def quant(v: Column): Column =
        transform(v, x => floor(lit(127.0) * x.cast("double") / col("m")).cast("int"))
      val corpus = emb.crossJoin(broadcast(mx))
        .select(col("vec_id").as("cand_id"), quant(col("embedding")).as("cq"))
      val queries = emb.filter(col("vec_id") < NQueries).crossJoin(broadcast(mx))
        .select(col("vec_id").as("query_id"), quant(col("embedding")).as("qq"))
      val iscore = aggregate(zip_with(col("cq"), col("qq"), (a, b) => a * b),
        lit(0L), (acc, v) => acc + v)
      val scored = corpus.join(broadcast(queries), col("cand_id") =!= col("query_id"))
        .select(col("query_id"), col("cand_id"), iscore.cast("double").as("score"))
      shortlistRerank(emb, scored)
    },
    Some {
      val absList = s"[abs(CAST(embedding[i] AS DOUBLE)) for i in range(1, ${Dim + 1})]"
      val q8List =
        s"[CAST(floor(127.0 * CAST(embedding[i] AS DOUBLE) / m) AS INT) for i in range(1, ${Dim + 1})]"
      val idot =
        s"list_reduce(list_prepend(CAST(0 AS BIGINT), [CAST(qq.q[i] * cc.q[i] AS BIGINT) for i in range(1, ${Dim + 1})]), (acc, v) -> acc + v)"
      s"""WITH mx AS (SELECT MAX(list_max($absList)) AS m FROM embeddings),
            q8 AS (SELECT vec_id, $q8List AS q FROM embeddings, mx),
            iscored AS (SELECT qq.vec_id AS query_id, cc.vec_id AS cand_id, $idot AS iscore
                        FROM q8 qq JOIN q8 cc ON cc.vec_id != qq.vec_id
                        WHERE qq.vec_id < $NQueries),
            ${shortlistRerankSql("iscored", "iscore")}"""
    })

  /** One half (32 bits) of the packed sign code: bit j set iff dimension
    * `half*32 + j` is strictly positive. Two BIGINT halves rather than one
    * 64-bit word because DuckDB's `<<` raises on `1 << 63` — the split
    * keeps every shift literal ≤ 2^31 and both engines in plain signed
    * arithmetic. Same string drives the Spark expr (0-based element
    * access) and the oracle (1-based).
    */
  private[graft] def bqPackExpr(half: Int, v: String, oneBased: Boolean): String =
    (0 until 32).map { j =>
      val idx = half * 32 + j + (if (oneBased) 1 else 0)
      s"(CASE WHEN CAST($v[$idx] AS DOUBLE) > 0 THEN ${1L << j} ELSE 0 END)"
    }.mkString("CAST(", " + ", " AS BIGINT)")

  /** Scoring CTEs of the binary-quantization oracle: pack each vector to
    * two sign-bit halves, score every (query, candidate) pair by Hamming
    * similarity = 64 − popcount(xor) summed over the halves.
    */
  private lazy val bqScoredCtes =
    s"""bq AS (SELECT vec_id,
                      ${bqPackExpr(0, "embedding", oneBased = true)} AS h0,
                      ${bqPackExpr(1, "embedding", oneBased = true)} AS h1
               FROM embeddings),
        hscored AS (SELECT qq.vec_id AS query_id, cc.vec_id AS cand_id,
                           CAST(64 - bit_count(xor(qq.h0, cc.h0))
                                   - bit_count(xor(qq.h1, cc.h1)) AS DOUBLE) AS hscore
                    FROM bq qq JOIN bq cc ON cc.vec_id != qq.vec_id
                    WHERE qq.vec_id < $NQueries)"""

  private lazy val bqOracleSql =
    s"WITH $bqScoredCtes, ${shortlistRerankSql("hscored", "hscore")}"

  /** Binary-quantization ANN (1-bit sign codes — the BQ path of modern
    * vector stores): each 64-dim vector compresses to ONE 8-byte code
    * (a sign bit per dimension, packed via [[bqPackExpr]]), the
    * shortlist scans the corpus in code space with Hamming similarity —
    * two XOR + POPCNT ops per pair, integer-exact, bit-identical across
    * engines, no float fold anywhere in the hot loop — and the exact
    * full-width cosine reranks only the top-[[ShortlistC]] through the
    * shared [[shortlistRerank]] tail.
    *
    * Sign-agreement concentration (Charikar 2002: P[bits agree] =
    * 1 − θ/π per direction) is what makes 64 axis sign bits a usable
    * angular proxy; the exact rerank absorbs the quantization loss, and
    * [[knnRecall]]'s `bq` rows measure that loss as data instead of
    * asserting it. At 100 TB this is the minimum-bytes shortlist of the
    * quantization family: 8 B/vector — 32× fewer scan bytes than the
    * float corpus, 8× fewer than [[knnSq8]] — Hamming ties broken by the
    * rerank's deterministic (score, vec_id) order, popcount vectorizes,
    * and the rerank touches ShortlistC·|queries| rows via the broadcast
    * semi-lookup.
    */
  val knnBq: CatalogEntry = CatalogEntry(
    "emb_knn_bq",
    (s, d) => {
      val emb = embeddings(s, d)
      val codes = emb.select(col("vec_id"),
        expr(bqPackExpr(0, "embedding", oneBased = false)).as("h0"),
        expr(bqPackExpr(1, "embedding", oneBased = false)).as("h1"))
      val corpus = codes.select(col("vec_id").as("cand_id"),
        col("h0").as("c0"), col("h1").as("c1"))
      val queries = codes.filter(col("vec_id") < NQueries)
        .select(col("vec_id").as("query_id"), col("h0").as("q0"), col("h1").as("q1"))
      val scored = corpus.join(broadcast(queries), col("cand_id") =!= col("query_id"))
        .select(col("query_id"), col("cand_id"),
          expr("CAST(64 - bit_count(c0 ^ q0) - bit_count(c1 ^ q1) AS DOUBLE)").as("score"))
      shortlistRerank(emb, scored)
    },
    Some(bqOracleSql))


  private val PqM = 8 // subspaces
  private val PqS = Dim / PqM // dims per subspace
  private val PqShortlist = 64

  /** Product-quantization ANN (PQ/ADC — Jégou et al. 2011), completing
    * the quantization family next to [[knnSq8]]: each vector compresses
    * to 8 one-byte codes (one nearest-centroid id per 8-dim subspace;
    * codebooks = the same frozen data-sampled centroids the IVF entries
    * use, sub-sliced), a query precomputes an 8×16 dot-product table,
    * and the asymmetric-distance shortlist score is the SUM of table
    * lookups — the corpus is scanned in code space (8 B/vector vs 256 B
    * floats), then exact cosine reranks the top-64 only.
    *
    * Cross-engine exactness: each table cell is rounded then carried as
    * DECIMAL(18,6), so the 8-term ADC sum is associative-exact (a double
    * sum would be partition-order-dependent and could flip shortlist
    * boundaries); code assignment argmins ROUNDED squared L2 with min-id
    * ties. At 100 TB the ADC pass is the scale winner of the family:
    * the shuffle keys on (subspace, code) against a 1024-row broadcast
    * table and the rerank touches 64 rows per query.
    */
  /** Subspace-j rounded squared L2 between two array columns — the PQ
    * chunk arithmetic, ONE definition shared by [[knnPq]]'s encode, the
    * IVFADC residual encode ([[ivfPqFrom]]), and the distortion
    * diagnostic ([[pqDistortion]]) so the codes and their measurement
    * can never drift. */
  private def pqD2Chunk(v: String, c: String, j: Int): org.apache.spark.sql.Column =
    round(expr(
      s"""aggregate(zip_with(slice($v, ${j * PqS + 1}, $PqS), slice($c, ${j * PqS + 1}, $PqS),
           (x, y) -> (CAST(x AS DOUBLE) - CAST(y AS DOUBLE)) * (CAST(x AS DOUBLE) - CAST(y AS DOUBLE))),
           CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"""), 6)

  /** The PQ/ADC approximate-score frame (query_id, cand_id, ap): codes
    * from the broadcast-codebook argmin encode, per-query 8×16 DECIMAL
    * distance tables, the associative-exact ADC sum — everything of
    * [[knnPq]] upstream of the shortlist, factored so the
    * shortlist-width sweep measures THE SAME scores production ranks
    * (one definition, no drift).
    */
  private def pqApproxFrame(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.Column
    val emb = embeddings(s, d)
    val cent = emb.filter(col("vec_id").between(IvfCentroidLo, IvfCentroidHi))
      .select(col("vec_id").as("cid"), col("embedding").as("cemb"))
    def d2Chunk(v: String, c: String, j: Int): Column = pqD2Chunk(v, c, j)
    def dotChunk(v: String, c: String, j: Int): Column = round(expr(
      s"""aggregate(zip_with(slice($v, ${j * PqS + 1}, $PqS), slice($c, ${j * PqS + 1}, $PqS),
           (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)),
           CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"""), 6)
    // Encode: per vector per subspace, the L2-nearest centroid chunk.
    val aggs = (0 until PqM).map(j =>
      min(struct(d2Chunk("embedding", "cemb", j).as("d2"), col("cid").as("cid"))).as(s"b$j"))
    val codes = emb.crossJoin(broadcast(cent))
      .groupBy("vec_id")
      .agg(aggs.head, aggs.tail: _*)
      .select(col("vec_id").as("cand_id") +:
        (0 until PqM).map(j => col(s"b$j.cid").as(s"c$j")): _*)
    val codeRows = codes.select(col("cand_id"), explode(array(
        (0 until PqM).map(j => struct(lit(j).as("j"), col(s"c$j").as("code"))): _*)).as("jc"))
      .select(col("cand_id"), col("jc.j").as("j"), col("jc.code").as("code"))
    // Per-query ADC table: 8 queries × 8 subspaces × 16 codes.
    val qtab = emb.filter(col("vec_id") < NQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("qemb"))
      .crossJoin(broadcast(cent))
      .select(col("query_id"), col("cid"), explode(array(
        (0 until PqM).map(j => struct(lit(j).as("j"),
          dotChunk("qemb", "cemb", j).cast("decimal(18,6)").as("t"))): _*)).as("jt"))
      .select(col("query_id"), col("jt.j").as("j"), col("cid").as("code"), col("jt.t").as("t"))
    codeRows.join(broadcast(qtab), Seq("j", "code"))
      .filter(col("cand_id") =!= col("query_id"))
      .groupBy("query_id", "cand_id")
      .agg(sum(col("t")).as("ap"))
  }

  /** The ADC pipeline as oracle CTEs ending in `approx (query_id,
    * cand_id, ap)` — ONE text shared by [[knnPq]] and the
    * shortlist-width sweep. */
  private def pqAdcOracleCtes: String =
    s"""cent AS (SELECT vec_id AS cid, embedding FROM embeddings
                 WHERE vec_id BETWEEN $IvfCentroidLo AND $IvfCentroidHi),
            js AS (SELECT CAST(unnest(range(0, $PqM)) AS INT) AS j),
            esub AS (SELECT e.vec_id, js.j, e.embedding[js.j*$PqS+1 : js.j*$PqS+$PqS] AS a
                     FROM embeddings e CROSS JOIN js),
            csub AS (SELECT c.cid, js.j, c.embedding[js.j*$PqS+1 : js.j*$PqS+$PqS] AS b
                     FROM cent c CROSS JOIN js),
            codes AS (
              SELECT vec_id AS cand_id, j, cid AS code FROM (
                SELECT e.vec_id, e.j, c.cid,
                  row_number() OVER (PARTITION BY e.vec_id, e.j ORDER BY
                    ROUND(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                      [(CAST(e.a[i] AS DOUBLE) - CAST(c.b[i] AS DOUBLE)) * (CAST(e.a[i] AS DOUBLE) - CAST(c.b[i] AS DOUBLE)) for i in range(1, ${PqS + 1})]),
                      (acc, v) -> acc + v), 6) ASC, c.cid ASC) AS rn
                FROM esub e JOIN csub c ON c.j = e.j) WHERE rn = 1),
            qtab AS (
              SELECT e.vec_id AS query_id, e.j, c.cid AS code,
                     CAST(ROUND(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                       [CAST(e.a[i] AS DOUBLE) * CAST(c.b[i] AS DOUBLE) for i in range(1, ${PqS + 1})]),
                       (acc, v) -> acc + v), 6) AS DECIMAL(18,6)) AS t
              FROM esub e JOIN csub c ON c.j = e.j WHERE e.vec_id < $NQueries),
            approx AS (
              SELECT qt.query_id, cd.cand_id, SUM(qt.t) AS ap
              FROM codes cd JOIN qtab qt ON qt.j = cd.j AND qt.code = cd.code
              WHERE cd.cand_id != qt.query_id GROUP BY 1, 2)"""

  val knnPq: CatalogEntry = CatalogEntry(
    "emb_knn_pq",
    (s, d) => {
      val emb = embeddings(s, d)
      val approx = pqApproxFrame(s, d)
      val topc = udaf(new graft.combine.TopNAgg(PqShortlist))
      val cands = approx.groupBy("query_id")
        .agg(topc(col("ap").cast("double"), col("cand_id")).as("top"))
        .select(col("query_id"), explode(col("top.entries")).as("e"))
        .select(col("query_id"), col("e.event_id").as("pq_cand"))
      val queriesFull = emb.filter(col("vec_id") < NQueries)
        .select(col("vec_id").as("query_id"), col("embedding").as("qe"))
        .withColumn("qn", graft.functions.Vectors.norm(col("qe")))
      val corpusFull = emb.select(col("vec_id").as("cand_id"), col("embedding").as("ce"))
        .withColumn("cn", graft.functions.Vectors.norm(col("ce")))
      val rer = corpusFull
        .join(broadcast(cands), col("cand_id") === col("pq_cand"))
        .join(broadcast(queriesFull), Seq("query_id"))
        .select(col("query_id"), col("cand_id"), cosineCol.as("score"))
      topKPerQuery(rer)
    },
    Some {
      s"""WITH $pqAdcOracleCtes,
            shortlist AS (
              SELECT query_id, cand_id FROM (
                SELECT query_id, cand_id,
                  row_number() OVER (PARTITION BY query_id
                    ORDER BY CAST(CAST(ap AS VARCHAR) AS DOUBLE) DESC, cand_id) AS rn
                FROM approx) WHERE rn <= $PqShortlist)
          SELECT query_id, vec_id, score, CAST(rn AS BIGINT) AS rn FROM (
            SELECT s.query_id, c.vec_id, $cosineSql AS score,
                   row_number() OVER (PARTITION BY s.query_id ORDER BY $cosineSql DESC, c.vec_id) AS rn
            FROM shortlist s JOIN embeddings c ON c.vec_id = s.cand_id
            JOIN embeddings q ON q.vec_id = s.query_id) WHERE rn <= $K"""
    })



  /** PQ encode as a reusable stage: per (vector, subspace), the
    * L2-nearest codebook chunk (min-cid ties) AND its quantization
    * error on the 10⁻⁶ integer lattice — (vec_id, j, code, d2s) rows.
    * The argmin is a keyed MIN-struct aggregate over the broadcast
    * codebook — linear/mergeable — so the SAME definition runs as live
    * streaming state (StreamingQueries.streamingPqCells; StreamingSpec
    * drains it and replays the distortion report bit-for-bit). d2s is
    * exact: round(d², 6) → DECIMAL(18,6) → ×10⁶ → BIGINT, the knnPq
    * qtab device. */
  private[graft] def pqEncodeCells(emb: DataFrame, cent: DataFrame): DataFrame = {
    val aggs = (0 until PqM).map(j =>
      min(struct(pqD2Chunk("embedding", "cemb", j).as("d2"), col("cid").as("cid"))).as(s"b$j"))
    emb.crossJoin(broadcast(cent))
      .groupBy("vec_id")
      .agg(aggs.head, aggs.tail: _*)
      .select(col("vec_id"), explode(array((0 until PqM).map(j =>
        struct(lit(j.toLong).as("j"), col(s"b$j.cid").cast("long").as("code"),
          col(s"b$j.d2").as("d2"))): _*)).as("e"))
      .select(col("vec_id"), col("e.j").as("j"), col("e.code").as("code"),
        (col("e.d2").cast("decimal(18,6)") * 1000000).cast("long").as("d2s"))
  }

  /** The per-subspace report from encoded cells — factored so the
    * streaming test can replay it on drained state. */
  private[graft] def pqDistortionFrom(enc: DataFrame): DataFrame = {
    val byCode = enc.groupBy("j", "code")
      .agg(count(lit(1)).as("n"), sum("d2s").as("ds"))
    byCode.groupBy("j")
      .agg(sum("n").as("nv"),
        count(lit(1)).as("cu"),
        max(struct(col("n"), (-col("code")).as("negc"))).as("top"),
        sum("ds").as("dsc"))
      .select(col("j"), col("nv").cast("long").as("n_vectors"),
        col("cu").cast("long").as("codes_used"),
        (-col("top.negc")).cast("long").as("top_code"),
        col("top.n").cast("long").as("top_code_n"),
        col("dsc").cast("long").as("distortion_scaled"),
        round(col("dsc") / (col("nv") * lit(1000000.0)), 6).as("mean_d2"))
      .orderBy("j")
  }

  /** PQ codebook-quality report — the diagnostic every PQ deployment
    * derives before trusting the codes (Jégou, Douze & Schmid 2011
    * measure exactly this: per-subquantizer quantization MSE, §III),
    * completing the index-diagnostics family ([[ivfCells]] reports
    * cell balance, [[ivfProbeSweep]] the probe knob, this the code
    * quality): per subspace j, the vector count, DISTINCT CODES USED
    * (dead codes waste the codebook — 16 available here), the
    * most-populated code and its population (imbalance: one hot code
    * means the subspace barely discriminates), and the total/mean
    * quantization error of the chosen codes.
    *
    * 100 TB shape: the encode is the ONE broadcast-codebook corpus
    * pass [[knnPq]] itself pays (shared [[pqD2Chunk]] arithmetic — the
    * measurement can never drift from the production encode); the
    * report then lives at (j, code) granularity — ≤ 8×16 rows of
    * map-combined exact-integer state, nothing corpus-sized past the
    * scan. Streaming form: the encode cells are keyed-min state
    * (StreamingQueries.streamingPqCells), drained and replayed in
    * StreamingSpec.
    *
    * Determinism: counts and the ×10⁶-scaled error sums are BIGINT
    * end-to-end (the d² lattice device); mean_d2 is ONE closing
    * correctly-rounded double division from identical integers; argmax
    * code ties break on the smaller code id in both engines.
    */
  /** The emb_pq_distortion oracle as CTE text over an arbitrary
    * embedding source `src` (vec_id, embedding) — ONE definition shared
    * by the natural-order entry (src = embeddings) and the OPQ-permuted
    * entry (src = its pemb CTE), so the two reports are computed by
    * construction-identical SQL and their mean_d2 columns compare
    * apples-to-apples.
    */
  private def pqDistortionOracleCtes(src: String): String = {
    val sq = s"""ROUND(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        [(CAST(e.a[i] AS DOUBLE) - CAST(c.b[i] AS DOUBLE)) * (CAST(e.a[i] AS DOUBLE) - CAST(c.b[i] AS DOUBLE)) for i in range(1, ${PqS + 1})]),
        (acc, v) -> acc + v), 6)"""
    s"""cent AS (SELECT vec_id AS cid, embedding FROM $src
                 WHERE vec_id BETWEEN $IvfCentroidLo AND $IvfCentroidHi),
            js AS (SELECT CAST(unnest(range(0, $PqM)) AS INT) AS j),
            esub AS (SELECT e.vec_id, js.j, e.embedding[js.j*$PqS+1 : js.j*$PqS+$PqS] AS a
                     FROM $src e CROSS JOIN js),
            csub AS (SELECT c.cid, js.j, c.embedding[js.j*$PqS+1 : js.j*$PqS+$PqS] AS b
                     FROM cent c CROSS JOIN js),
            d2t AS (SELECT e.vec_id, e.j, c.cid, $sq AS d2
                    FROM esub e JOIN csub c ON c.j = e.j),
            enc AS (SELECT j, cid AS code,
                           CAST(CAST(d2 AS DECIMAL(18,6)) * 1000000 AS BIGINT) AS d2s FROM (
                      SELECT vec_id, j, cid, d2,
                             row_number() OVER (PARTITION BY vec_id, j
                                                ORDER BY d2 ASC, cid ASC) AS rn
                      FROM d2t) WHERE rn = 1),
            bycode AS (SELECT j, code, CAST(COUNT(*) AS BIGINT) AS n,
                              CAST(SUM(d2s) AS BIGINT) AS ds
                       FROM enc GROUP BY 1, 2),
            topc AS (SELECT j, code AS top_code, n AS top_code_n FROM (
                       SELECT j, code, n,
                              row_number() OVER (PARTITION BY j ORDER BY n DESC, code ASC) AS rn
                       FROM bycode) WHERE rn = 1),
            agg AS (SELECT j, CAST(SUM(n) AS BIGINT) AS n_vectors,
                           CAST(COUNT(*) AS BIGINT) AS codes_used,
                           CAST(SUM(ds) AS BIGINT) AS distortion_scaled
                    FROM bycode GROUP BY j)"""
  }

  private val pqDistortionOracleSelect =
    """SELECT CAST(a.j AS BIGINT) AS j, a.n_vectors, a.codes_used,
                 CAST(t.top_code AS BIGINT) AS top_code,
                 CAST(t.top_code_n AS BIGINT) AS top_code_n,
                 a.distortion_scaled,
                 ROUND(CAST(a.distortion_scaled AS DOUBLE) / (a.n_vectors * 1000000.0), 6) AS mean_d2
          FROM agg a JOIN topc t ON t.j = a.j
          ORDER BY j"""

  val pqDistortion: CatalogEntry = CatalogEntry(
    "emb_pq_distortion",
    (s, d) => {
      val emb = embeddings(s, d)
      val cent = emb.filter(col("vec_id").between(IvfCentroidLo, IvfCentroidHi))
        .select(col("vec_id").as("cid"), col("embedding").as("cemb"))
      pqDistortionFrom(pqEncodeCells(emb, cent))
    },
    Some(s"WITH ${pqDistortionOracleCtes("embeddings")}\n          $pqDistortionOracleSelect"))

  /** Per-dimension second-moment frame (d, n, s1, s2) on the 10⁻⁶
    * lattice — [[opqPermute]]'s ONLY corpus-touching stage and a linear
    * keyed aggregate, so it doubles as live streaming state
    * (StreamingQueries.streamingOpqMoments delegates here; StreamingSpec
    * drains it and replays the permutation + report bit-for-bit).
    * Sums are DECIMAL-exact: s1 ≤ n·10⁷ and s2 ≤ n·10¹⁴ stay inside the
    * widths [[opqPermOf]] later multiplies (which bound n ≤ 10¹² — a
    * 100 TB corpus of 256-byte vectors is ~4·10¹¹, inside the bound,
    * and the guard below fails LOUDLY rather than wrap).
    */
  private[graft] def opqMoments(emb: DataFrame): DataFrame =
    emb.select(posexplode(col("embedding")).as(Seq("d", "x")))
      .select(col("d").cast("long").as("d"),
        (round(col("x").cast("double"), 6).cast("decimal(18,6)") * 1000000)
          .cast("long").as("xs"))
      .groupBy("d")
      .agg(count(lit(1)).as("n"),
        sum(col("xs").cast("decimal(19,0)")).cast("decimal(19,0)").as("s1"),
        sum((col("xs").cast("decimal(13,0)") * col("xs").cast("decimal(13,0)"))
          .cast("decimal(26,0)")).cast("decimal(26,0)").as("s2"))

  /** The variance-ranked snake permutation from a moments frame: dims
    * sorted by EXACT integer variance numerator n·s2 − s1² (DECIMAL —
    * n(12)·s2(26) and s1(19)² both fit width 38 exactly on both
    * engines), then dealt into the [[PqM]] subspaces boustrophedon
    * (rank r → subspace r%M on even deals, M−1−r%M on odd) so every
    * subspace receives one dim from each variance octile. Returns
    * perm(k) = the original dim at permuted position k (position k =
    * j·[[PqS]] + slot). Driver-side work is ONE bounded collect of
    * [[Dim]] rows — index metadata, like collecting a codebook, never
    * corpus-sized.
    */
  private[graft] def opqPermOf(mom: DataFrame): Seq[Int] = {
    val ranked = mom
      .select(col("d"), col("n"),
        (col("n").cast("decimal(12,0)") * col("s2").cast("decimal(26,0)") -
          col("s1").cast("decimal(19,0)") * col("s1").cast("decimal(19,0)"))
          .as("varn"))
      .orderBy(col("varn").desc, col("d").asc)
      .select(col("d").cast("int"), col("n").cast("long"))
      .collect()
    ranked.foreach { r =>
      require(r.getLong(1) <= 1000000000000L,
        s"opqPermOf: dim count ${r.getLong(1)} exceeds the 10^12 exact-decimal bound")
    }
    val posOf = ranked.zipWithIndex.map { case (r, r0) =>
      val slot = r0 / PqM
      val pos = r0 % PqM
      val j = if (slot % 2 == 0) pos else PqM - 1 - pos
      (j * PqS + slot) -> r.getInt(0)
    }
    // Empty corpus → no moments → no ranking to improve: fall back to
    // the identity permutation so the plan still builds (the degenerate
    // sweeps require totality; array() of zero gather columns does not
    // analyze).
    if (posOf.isEmpty) (0 until Dim)
    else posOf.sortBy(_._1).map(_._2).toSeq
  }

  /** Apply a dimension permutation as a static per-row projection —
    * perm is index METADATA (64 ints), so the gather is plain codegen'd
    * element_at's, zero shuffle, zero extra scan. NULL embeddings stay
    * NULL (a bare array(getItem…) would turn them into arrays of nulls,
    * diverging from the natural entry's slice-of-NULL = NULL semantics
    * under the null-injected degenerate sweep).
    */
  private[graft] def opqApply(emb: DataFrame, perm: Seq[Int]): DataFrame =
    emb.withColumn("embedding",
      when(col("embedding").isNull, lit(null))
        .otherwise(array(perm.map(i => col("embedding").getItem(i)): _*)))

  /** Parametric OPQ-lite (Ge, He, Ke & Sun, CVPR 2013 §4: under a
    * Gaussian model the optimal space decomposition BALANCES variance
    * across subquantizers via eigenvalue allocation): rank dimensions by
    * exact variance and deal them into the [[PqM]] PQ subspaces in snake
    * order, then encode and report per-subspace distortion with the
    * SAME machinery as [[pqDistortion]] ([[pqEncodeCells]] →
    * [[pqDistortionFrom]], identical report shape) — so the OPQ gain is
    * read by diffing the two entries' mean_d2 columns directly. The
    * natural-order split concentrates the high-variance dims of this
    * corpus in few subspaces (their 16 codes can't discriminate, the
    * quantizer wastes codebook on dead subspaces); the permutation is
    * the rotation-free half of OPQ — the full rotation needs an SVD the
    * oracle could not replay exactly, and the permutation captures the
    * allocation effect the paper attributes most of the parametric gain
    * to.
    *
    * NEGATIVE RESULT on this corpus, recorded so it is not re-tried as
    * an optimization: the synthetic embeddings are nearly isotropic
    * (per-dim variance spread max/min = 1.31 at sf0.01), so allocation
    * has nothing to balance and the measured total distortion moves
    * +1.3% (378.1M vs 373.2M scaled) — noise, not gain; the paper's
    * wins come from the skewed spectra of real (PCA'd/anisotropic)
    * embeddings. The entry's value is as the INSTRUMENT: diff its
    * mean_d2 against [[pqDistortion]]'s on YOUR corpus to decide
    * whether OPQ allocation pays before paying for rotation — the same
    * measure-not-assert philosophy as doc_lsh_calibration.
    *
    * 100 TB shape: ONE extra corpus pass (the per-dim moments aggregate,
    * 64 keys, map-side combined) on top of the encode pass PQ itself
    * pays; the permutation is a 64-int driver artifact applied as a
    * codegen'd projection. Exactness: the variance RANKING is decided in
    * exact DECIMAL integers (no libm, no float accumulation ordering),
    * ties break on the smaller dim — both engines derive the identical
    * permutation, then the identical lattice-exact distortion report.
    */
  val opqPermute: CatalogEntry = CatalogEntry(
    "emb_opq_permute",
    (s, d) => {
      val emb = embeddings(s, d)
      val perm = opqPermOf(opqMoments(emb))
      val pemb = opqApply(emb.select(col("vec_id"), col("embedding")), perm)
      val pcent = pemb.filter(col("vec_id").between(IvfCentroidLo, IvfCentroidHi))
        .select(col("vec_id").as("cid"), col("embedding").as("cemb"))
      pqDistortionFrom(pqEncodeCells(pemb, pcent))
    },
    Some {
      s"""WITH dims AS (SELECT CAST(unnest(range(0, $Dim)) AS INT) AS d),
            ex AS (SELECT e.vec_id, dm.d,
                          CAST(CAST(ROUND(CAST(e.embedding[dm.d + 1] AS DOUBLE), 6)
                                    AS DECIMAL(18,6)) * 1000000 AS BIGINT) AS xs
                   FROM embeddings e CROSS JOIN dims dm),
            mom AS (SELECT d, CAST(COUNT(*) AS DECIMAL(12,0)) AS n,
                           CAST(SUM(CAST(xs AS DECIMAL(19,0))) AS DECIMAL(19,0)) AS s1,
                           CAST(SUM(CAST(xs AS DECIMAL(13,0)) * CAST(xs AS DECIMAL(13,0)))
                                AS DECIMAL(26,0)) AS s2
                    FROM ex GROUP BY d),
            ranked AS (SELECT d, row_number() OVER (ORDER BY (n * s2 - s1 * s1) DESC, d ASC) - 1 AS r0
                       FROM mom),
            alloc AS (SELECT d,
                             (CASE WHEN (r0 // $PqM) % 2 = 0 THEN r0 % $PqM
                                   ELSE ${PqM - 1} - (r0 % $PqM) END) * $PqS
                               + (r0 // $PqM) AS k
                      FROM ranked),
            permt AS (SELECT list(d ORDER BY k) AS p FROM alloc),
            pemb AS (SELECT e.vec_id,
                            [e.embedding[p[i] + 1] for i in range(1, ${Dim + 1})] AS embedding
                     FROM embeddings e CROSS JOIN permt),
            ${pqDistortionOracleCtes("pemb")}
          $pqDistortionOracleSelect"""
    })

  /** The frozen sampled-centroid table (cid, cemb, cnorm) of the
    * IVFADC family — factored so the streaming replay reads the SAME
    * static frame the batch entry broadcasts. */
  private[graft] def ivfCentroidFrame(emb: DataFrame): DataFrame =
    emb.filter(col("vec_id").between(IvfCentroidLo, IvfCentroidHi))
      .select(col("vec_id").as("cid"), col("embedding").as("cemb"))
      .withColumn("cnorm", graft.functions.Vectors.norm(col("cemb")))

  /** Per-(vector, centroid) rounded cosine — knnIvf's scoring device
    * against a broadcast centroid frame. Works unchanged on a STREAMING
    * `emb` (stream-static broadcast join, per-row projection). */
  private[graft] def ivfCellScores(emb: DataFrame, centN: DataFrame): DataFrame = {
    import graft.functions.Vectors
    emb.withColumn("vnorm", Vectors.norm(col("embedding")))
      .crossJoin(broadcast(centN))
      .withColumn("csim", round(
        Vectors.dot(col("embedding"), col("cemb")) / (col("vnorm") * col("cnorm")), 6))
  }

  /** Coarse IVFADC assignment (vec_id, cell): keyed ARGMAX over the
    * cell scores, smallest cid on ties. ONE definition shared by the
    * batch entry and StreamingQueries.streamingIvfCells — the max is
    * linear/mergeable keyed state, so structured streaming maintains
    * the identical aggregate live in update mode, and the drained
    * frame replays the batch assignment bit-for-bit (StreamingSpec
    * then re-runs codes + ADC on it and pins the final top-K). */
  private[graft] def ivfCoarseAssign(emb: DataFrame, centN: DataFrame): DataFrame =
    ivfCellScores(emb, centN)
      .groupBy("vec_id")
      .agg(max(struct(col("csim"), (-col("cid")).as("negcid"))).as("best"))
      .select(col("vec_id"), (-col("best.negcid")).cast("long").as("cell"))

  /** Everything of [[knnIvfPq]] downstream of the coarse assignment —
    * probes, residual PQ encode, ADC scan, shortlist, exact rerank —
    * factored over an injectable `assign` frame so the streaming test
    * can replay it on DRAINED live state. Query-side probes re-derive
    * from a query-only cell-score pass (NQueries rows — not
    * corpus-touching; the corpus-touching stage IS the assignment). */
  private[graft] def ivfPqFrom(emb: DataFrame, assign: DataFrame): DataFrame = {
      import org.apache.spark.sql.Column
      import graft.functions.Vectors
      val cent = emb.filter(col("vec_id").between(IvfCentroidLo, IvfCentroidHi))
        .select(col("vec_id").as("cid"), col("embedding").as("cemb"))
      val centN = ivfCentroidFrame(emb)
      val probeTop = udaf(new graft.combine.TopNAgg(IvfProbes))
      val probes = ivfCellScores(emb.filter(col("vec_id") < NQueries), centN)
        .groupBy(col("vec_id").as("query_id"))
        .agg(probeTop(col("csim"), col("cid")).as("top"))
        .select(col("query_id"), posexplode(col("top.entries")))
        .select(col("query_id"), col("col.event_id").as("probe_cell"))
      // Residual d² per subspace between a residual array and a codebook
      // chunk — the shared pqD2Chunk arithmetic over (v − cell-centroid).
      def d2Chunk(v: String, c: String, j: Int): Column = pqD2Chunk(v, c, j)
      val resOf = "zip_with(%s, %s, (x, y) -> CAST(x AS DOUBLE) - CAST(y AS DOUBLE))"
      // Encode: residual vs assigned cell, nearest codebook chunk per j.
      val withRes = emb.join(assign, "vec_id")
        .join(broadcast(cent.select(col("cid").as("cell"), col("cemb").as("acemb"))),
          Seq("cell"))
        .withColumn("res", expr(resOf.format("embedding", "acemb")))
      val aggs = (0 until PqM).map(j =>
        min(struct(d2Chunk("res", "cemb", j).as("d2"), col("cid").as("cid"))).as(s"b$j"))
      val codes = withRes.crossJoin(broadcast(cent))
        .groupBy("vec_id", "cell")
        .agg(aggs.head, aggs.tail: _*)
        .select(col("vec_id").as("cand_id") +: col("cell") +:
          (0 until PqM).map(j => col(s"b$j.cid").as(s"c$j")): _*)
      val codeRows = codes.select(col("cand_id"), col("cell"), explode(array(
          (0 until PqM).map(j => struct(lit(j).as("j"), col(s"c$j").as("code"))): _*)).as("jc"))
        .select(col("cand_id"), col("cell"), col("jc.j").as("j"), col("jc.code").as("code"))
      // Per-(query, probed cell) residual distance table: 8×2×8×16 rows.
      val qtab = probes
        .join(emb.filter(col("vec_id") < NQueries)
          .select(col("vec_id").as("query_id"), col("embedding").as("qemb")), Seq("query_id"))
        .join(broadcast(cent.select(col("cid").as("probe_cell"), col("cemb").as("pcemb"))),
          Seq("probe_cell"))
        .withColumn("qres", expr(resOf.format("qemb", "pcemb")))
        .crossJoin(broadcast(cent))
        .select(col("query_id"), col("probe_cell"), col("cid").as("code"), explode(array(
          (0 until PqM).map(j => struct(lit(j).as("j"),
            d2Chunk("qres", "cemb", j).cast("decimal(18,6)").as("t"))): _*)).as("jt"))
        .select(col("query_id"), col("probe_cell"), col("jt.j").as("j"),
          col("code"), col("jt.t").as("t"))
      // ADC over the probed cells' code lists only — the inverted file.
      val approx = codeRows.join(broadcast(qtab),
          col("cell") === col("probe_cell") && codeRows("j") === qtab("j") &&
            codeRows("code") === qtab("code"))
        .filter(col("cand_id") =!= col("query_id"))
        .groupBy("query_id", "cand_id")
        .agg(sum(col("t")).as("ad"))
      val topc = udaf(new graft.combine.TopNAgg(PqShortlist))
      val cands = approx.groupBy("query_id")
        .agg(topc(-col("ad").cast("double"), col("cand_id")).as("top"))
        .select(col("query_id"), explode(col("top.entries")).as("e"))
        .select(col("query_id"), col("e.event_id").as("pq_cand"))
      val queriesFull = emb.filter(col("vec_id") < NQueries)
        .select(col("vec_id").as("query_id"), col("embedding").as("qe"))
        .withColumn("qn", Vectors.norm(col("qe")))
      val corpusFull = emb.select(col("vec_id").as("cand_id"), col("embedding").as("ce"))
        .withColumn("cn", Vectors.norm(col("ce")))
      val rer = corpusFull
        .join(broadcast(cands), col("cand_id") === col("pq_cand"))
        .join(broadcast(queriesFull), Seq("query_id"))
        .select(col("query_id"), col("cand_id"), cosineCol.as("score"))
      topKPerQuery(rer)
  }

  /** IVF∘PQ (IVFADC — Jégou, Douze & Schmid 2011 §IV): the production
    * default the two halves of this family exist to compose — FAISS's
    * IndexIVFPQ. Coarse cells come from [[knnIvf]]'s assignment device
    * (sampled centroids, argmax rounded cosine, min-cid ties); each
    * vector then PQ-encodes its RESIDUAL against its cell's centroid
    * (residuals cluster tighter around zero than raw vectors, which is
    * why IVFADC quantizes them — §IV.B); a query probes its
    * [[IvfProbes]] nearest cells, builds one 8×16 residual
    * distance table PER PROBED CELL, and ADC-scans only those cells'
    * code lists — the inverted file. Exact cosine reranks the
    * [[PqShortlist]] survivors.
    *
    * 100 TB shape — what the composition buys over [[knnPq]] alone: the
    * ADC scan touches probes/cells of the corpus instead of all of it
    * (the code join keys on (cell, j, code) against a broadcast
    * 2·8·16-row table), memory stays 8 B + one cell id per vector, and
    * the rerank touches [[PqShortlist]] rows per query. Codebooks here
    * are the frozen data-sampled centroid chunks the PQ entry uses
    * (production trains them on residuals; the structure — and the
    * oracle — are identical either way).
    *
    * Cross-engine exactness: the [[knnPq]] devices verbatim — chunk d²
    * rounded 6 then DECIMAL(18,6) so the 8-term ADC sum is
    * associative-exact; code argmins on rounded d² with min-id ties;
    * residual elements are one IEEE subtraction per dim, the same
    * sub-sub-mul-sum sequence in both engines; shortlist ranks
    * ascending exact-decimal distance with id ties.
    *
    * Measured (emb_knn_recall, sf0.01): recall tracks [[knnIvf]]'s
    * exactly — the probed-cell ceiling (0.225 at the r15 probes=2
    * default; lifted when [[ivfProbeSweep]] justified probes=4): with
    * [[PqShortlist]] covering the probed population, the PQ stage costs
    * no recall on top of the coarse quantizer; more probes buy recall,
    * the codes buy the 32× scan compression. The harness reports both
    * rungs so the trade stays visible.
    */
  val knnIvfPq: CatalogEntry = CatalogEntry(
    "emb_knn_ivfpq",
    (s, d) => {
      val emb = embeddings(s, d)
      ivfPqFrom(emb, ivfCoarseAssign(emb, ivfCentroidFrame(emb)))
    },
    Some {
      val centSim =
        s"ROUND(${dotSql("e.embedding", "c.embedding")} / (SQRT(${dotSql("e.embedding", "e.embedding")}) * SQRT(${dotSql("c.embedding", "c.embedding")})), 6)"
      s"""WITH cent AS (SELECT vec_id AS cid, embedding FROM embeddings
                        WHERE vec_id BETWEEN $IvfCentroidLo AND $IvfCentroidHi),
            cellscore AS (
              SELECT e.vec_id, c.cid, $centSim AS csim
              FROM embeddings e CROSS JOIN (SELECT cid, embedding FROM cent) c(cid, embedding)),
            assign AS (
              SELECT vec_id, cid AS cell FROM (
                SELECT vec_id, cid,
                       row_number() OVER (PARTITION BY vec_id ORDER BY csim DESC, cid) AS rn
                FROM cellscore) WHERE rn = 1),
            probes AS (
              SELECT vec_id AS query_id, cid AS probe_cell FROM (
                SELECT vec_id, cid,
                       row_number() OVER (PARTITION BY vec_id ORDER BY csim DESC, cid) AS rn
                FROM cellscore WHERE vec_id < $NQueries) WHERE rn <= $IvfProbes),
            js AS (SELECT CAST(unnest(range(0, $PqM)) AS INT) AS j),
            csub AS (SELECT c.cid, js.j, c.embedding[js.j*$PqS+1 : js.j*$PqS+$PqS] AS b
                     FROM cent c CROSS JOIN js),
            rsub AS (SELECT e.vec_id, a.cell, js.j,
                            [CAST(e.embedding[i] AS DOUBLE) - CAST(cc.embedding[i] AS DOUBLE)
                             for i in range(js.j*$PqS+1, js.j*$PqS+$PqS+1)] AS a
                     FROM embeddings e
                     JOIN assign a ON a.vec_id = e.vec_id
                     JOIN cent cc ON cc.cid = a.cell
                     CROSS JOIN js),
            codes AS (
              SELECT vec_id AS cand_id, cell, j, cid AS code FROM (
                SELECT r.vec_id, r.cell, r.j, c.cid,
                  row_number() OVER (PARTITION BY r.vec_id, r.j ORDER BY
                    ROUND(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                      [(r.a[i] - CAST(c.b[i] AS DOUBLE)) * (r.a[i] - CAST(c.b[i] AS DOUBLE)) for i in range(1, ${PqS + 1})]),
                      (acc, v) -> acc + v), 6) ASC, c.cid ASC) AS rn
                FROM rsub r JOIN csub c ON c.j = r.j) WHERE rn = 1),
            qrsub AS (SELECT p.query_id, p.probe_cell, js.j,
                             [CAST(q.embedding[i] AS DOUBLE) - CAST(cc.embedding[i] AS DOUBLE)
                              for i in range(js.j*$PqS+1, js.j*$PqS+$PqS+1)] AS a
                      FROM probes p
                      JOIN embeddings q ON q.vec_id = p.query_id
                      JOIN cent cc ON cc.cid = p.probe_cell
                      CROSS JOIN js),
            qtab AS (
              SELECT r.query_id, r.probe_cell, r.j, c.cid AS code,
                     CAST(ROUND(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                       [(r.a[i] - CAST(c.b[i] AS DOUBLE)) * (r.a[i] - CAST(c.b[i] AS DOUBLE)) for i in range(1, ${PqS + 1})]),
                       (acc, v) -> acc + v), 6) AS DECIMAL(18,6)) AS t
              FROM qrsub r JOIN csub c ON c.j = r.j),
            approx AS (
              SELECT qt.query_id, cd.cand_id, SUM(qt.t) AS ad
              FROM codes cd JOIN qtab qt
                ON qt.probe_cell = cd.cell AND qt.j = cd.j AND qt.code = cd.code
              WHERE cd.cand_id != qt.query_id GROUP BY 1, 2),
            shortlist AS (
              SELECT query_id, cand_id FROM (
                SELECT query_id, cand_id,
                  row_number() OVER (PARTITION BY query_id
                    ORDER BY CAST(CAST(ad AS VARCHAR) AS DOUBLE) ASC, cand_id) AS rn
                FROM approx) WHERE rn <= $PqShortlist)
          SELECT query_id, vec_id, score, CAST(rn AS BIGINT) AS rn FROM (
            SELECT s.query_id, c.vec_id, $cosineSql AS score,
                   row_number() OVER (PARTITION BY s.query_id ORDER BY $cosineSql DESC, c.vec_id) AS rn
            FROM shortlist s JOIN embeddings c ON c.vec_id = s.cand_id
            JOIN embeddings q ON q.vec_id = s.query_id) WHERE rn <= $K"""
    })

  /** Filtered ANN — metadata-constrained vector search, the shape every
    * production retrieval system needs ("nearest neighbours WHERE
    * label = X"): top-K restricted to candidates sharing the query's
    * label. The predicate composes INTO the broadcast scan join (label
    * equality rides the join condition), so filtering costs nothing
    * extra — one linear pass, no post-search re-query when a filtered
    * top-K comes back short. At 100 TB this pre-filter form beats
    * post-filtering an unfiltered top-K, which silently returns fewer
    * than K under selective predicates.
    */
  val knnFiltered: CatalogEntry = CatalogEntry(
    "emb_knn_filtered",
    (s, d) => {
      import graft.functions.Vectors
      val emb = embeddings(s, d)
      val queries = emb.filter(col("vec_id") < NQueries)
        .select(col("vec_id").as("query_id"), col("embedding").as("qe"),
          col("label").as("qlabel"))
        .withColumn("qn", Vectors.norm(col("qe")))
      val corpus = emb.select(col("vec_id").as("cand_id"), col("embedding").as("ce"),
        col("label"))
        .withColumn("cn", Vectors.norm(col("ce")))
      val scored = corpus.join(broadcast(queries),
          col("cand_id") =!= col("query_id") && col("label") === col("qlabel"))
        .select(col("query_id"), col("cand_id"), cosineCol.as("score"))
      topKPerQuery(scored)
    },
    Some(s"""SELECT query_id, vec_id, score, CAST(rn AS BIGINT) AS rn FROM (
          SELECT q.vec_id AS query_id, c.vec_id AS vec_id, $cosineSql AS score,
                 row_number() OVER (PARTITION BY q.vec_id ORDER BY $cosineSql DESC, c.vec_id) AS rn
          FROM embeddings q JOIN embeddings c
            ON c.vec_id != q.vec_id AND c.label = q.label
          WHERE q.vec_id < $NQueries) WHERE rn <= $K"""))

  /** IVF index diagnostics: per-cell population and mean similarity to
    * the cell centroid — the balance/coherence report that decides
    * whether an IVF index needs re-training (empty or bloated cells ⇒
    * skewed probes; low mean similarity ⇒ centroids don't fit the data).
    * Reuses the knnIvf assignment pass (broadcast argmax over frozen
    * sampled centroids — zero shuffles before the #cells-key aggregate);
    * the mean goes through the decimal-exact sum so both engines derive
    * the identical IEEE double.
    */
  val ivfCells: CatalogEntry = CatalogEntry(
    "emb_ivf_cells",
    (s, d) => {
      import graft.functions.Vectors
      val emb = embeddings(s, d)
      val cent = emb.filter(col("vec_id").between(IvfCentroidLo, IvfCentroidHi))
        .select(col("vec_id").as("cid"), col("embedding").as("cemb"))
        .withColumn("cnorm", Vectors.norm(col("cemb")))
      val best = emb
        .withColumn("vnorm", Vectors.norm(col("embedding")))
        .crossJoin(broadcast(cent))
        .withColumn("csim", round(
          Vectors.dot(col("embedding"), col("cemb")) / (col("vnorm") * col("cnorm")), 6))
        .groupBy("vec_id")
        .agg(max(struct(col("csim"), (-col("cid")).as("negcid"))).as("best"))
        .select((-col("best.negcid")).cast("long").as("cell"), col("best.csim").as("csim"))
      best.groupBy("cell")
        .agg(count(lit(1)).as("n_vectors"),
          Exact.davg(col("csim"), 18, 6).as("mean_csim"),
          min(col("csim")).as("min_csim"))
    },
    Some {
      val centSim =
        s"ROUND(${dotSql("e.embedding", "c.embedding")} / (SQRT(${dotSql("e.embedding", "e.embedding")}) * SQRT(${dotSql("c.embedding", "c.embedding")})), 6)"
      s"""WITH cent AS (SELECT vec_id AS cid, embedding FROM embeddings
                        WHERE vec_id BETWEEN $IvfCentroidLo AND $IvfCentroidHi),
            cellscore AS (
              SELECT e.vec_id, c.cid, $centSim AS csim
              FROM embeddings e CROSS JOIN (SELECT cid, embedding FROM cent) c(cid, embedding)),
            assign AS (
              SELECT vec_id, cid AS cell, csim FROM (
                SELECT vec_id, cid, csim,
                       row_number() OVER (PARTITION BY vec_id ORDER BY csim DESC, cid) AS rn
                FROM cellscore) WHERE rn = 1)
          SELECT cell, COUNT(*) AS n_vectors,
                 ${Exact.sqlAvg("csim", 18, 6)} AS mean_csim,
                 MIN(csim) AS min_csim
          FROM assign GROUP BY cell"""
    })

  /** Hubness — the k-occurrence N_k of every vector (Radovanović,
    * Nanopoulos & Ivanović, JMLR 2010): how many OTHER vectors' top-K
    * neighbour lists contain it, measured on the kNN graph the
    * production IVF index actually serves (neighbours restricted to
    * cell-mates of the [[ivfCoarseAssign]] assignment). High-dimensional
    * concentration skews this distribution — a few hub vectors land in
    * thousands of lists and dominate retrieval/semantic-dedup decisions
    * while anti-hubs (N_k = 0) become unfindable — and the skew, not
    * recall, is the earliest symptom of a degenerate embedding space.
    * Anti-hubs are recovered by a LEFT join back to the corpus (an
    * inner join would silently drop exactly the signal rows).
    *
    * 100 TB shape: the pair stage is a cell-keyed equi self-join —
    * Σ|cell|² work, the SAME in-cell bound the IVF search itself
    * accepts, never the n² exact graph (which is unbuildable at fleet
    * scale; production hubness estimates always run on the served ANN
    * graph — what this measures). The bound is no longer a prose claim:
    * [[kmeansElbow]]'s `scan_frac` column measures Σ|cell|²/n² per
    * quantizer size k off one scan, so "production widens k with the
    * corpus to keep the pair stage bounded" is audited against an
    * in-catalog number. The bounded-heap TopNAgg ships ≤ K
    * candidates per query out of the map side; k-occurrence is then ONE
    * keyed count. The corpus-touching assignment stage is the shared
    * [[ivfCoarseAssign]] — its streaming form (streamingIvfCells,
    * StreamingSpec) covers this entry's live path too. Scores ride the
    * rounded-cosine lattice with vec_id tie-break, so the top-K
    * boundary — and therefore every count — is bit-stable cross-engine.
    */
  val hubness: CatalogEntry = CatalogEntry(
    "emb_hubness",
    (s, d) => {
      import graft.functions.Vectors
      val emb = embeddings(s, d)
      val withCell = emb.join(ivfCoarseAssign(emb, ivfCentroidFrame(emb)), "vec_id")
        .select(col("vec_id"), col("embedding"), col("cell"))
        .withColumn("nrm", Vectors.norm(col("embedding")))
        .cacheOnce() // feeds both sides of the in-cell pair join + the output spine
      val q = withCell.select(col("cell"), col("vec_id").as("query_id"),
        col("embedding").as("qe"), col("nrm").as("qn"))
      val c = withCell.select(col("cell"), col("vec_id").as("cand_id"),
        col("embedding").as("ce"), col("nrm").as("cn"))
      val scored = q.join(c, Seq("cell"))
        .filter(col("query_id") =!= col("cand_id"))
        .select(col("query_id"), col("cand_id"), cosineCol.as("score"))
      val topk = udaf(new graft.combine.TopNAgg(K))
      val occ = scored.groupBy("query_id")
        .agg(topk(col("score"), col("cand_id")).as("top"))
        .select(explode(col("top.entries")).as("e"))
        .groupBy(col("e.event_id").as("vec_id"))
        .agg(count(lit(1)).as("n_k"))
      withCell.select(col("vec_id"), col("cell"))
        .join(occ, Seq("vec_id"), "left")
        .select(col("vec_id"), col("cell"), coalesce(col("n_k"), lit(0L)).as("n_k"))
    },
    Some {
      val centSim =
        s"ROUND(${dotSql("e.embedding", "c.embedding")} / (SQRT(${dotSql("e.embedding", "e.embedding")}) * SQRT(${dotSql("c.embedding", "c.embedding")})), 6)"
      s"""WITH cent AS (SELECT vec_id AS cid, embedding FROM embeddings
                        WHERE vec_id BETWEEN $IvfCentroidLo AND $IvfCentroidHi),
            cellscore AS (
              SELECT e.vec_id, c.cid, $centSim AS csim
              FROM embeddings e CROSS JOIN (SELECT cid, embedding FROM cent) c(cid, embedding)),
            assign AS (
              SELECT vec_id, cid AS cell FROM (
                SELECT vec_id, cid,
                       row_number() OVER (PARTITION BY vec_id ORDER BY csim DESC, cid) AS rn
                FROM cellscore) WHERE rn = 1),
            wc AS (SELECT a.vec_id, a.cell, e.embedding
                   FROM assign a JOIN embeddings e ON e.vec_id = a.vec_id),
            top AS (
              SELECT query_id, cand_id FROM (
                SELECT q.vec_id AS query_id, c.vec_id AS cand_id,
                       row_number() OVER (PARTITION BY q.vec_id
                         ORDER BY $cosineSql DESC, c.vec_id) AS rn
                FROM wc q JOIN wc c ON c.cell = q.cell AND c.vec_id != q.vec_id)
              WHERE rn <= $K),
            occ AS (SELECT cand_id AS vec_id, CAST(COUNT(*) AS BIGINT) AS n_k
                    FROM top GROUP BY 1)
          SELECT w.vec_id, w.cell, COALESCE(o.n_k, 0) AS n_k
          FROM wc w LEFT JOIN occ o ON o.vec_id = w.vec_id"""
    })

  /** Intrinsic dimensionality evidence per label — the TwoNN statistic
    * of Facco, d'Errico, Rodriguez & Laio (Scientific Reports 2017):
    * for every point, μ = r₂/r₁ (second- over first-nearest-neighbour
    * distance); under a locally uniform density μ follows the Pareto
    * law F(μ) = 1 − μ^(−d) with d the INTRINSIC dimension — the number
    * that decides how hard ANN search and how meaningful cosine dedup
    * thresholds are on a corpus, independent of the 64 ambient dims.
    * The entry reports the μ distribution (quartiles + p90 via the
    * proven percentile ↔ quantile_cont pair) and n per label; the MLE
    * d = ln 2 / ln(μ_p50) is ONE driver-side step the reader applies —
    * keeping ln() (libm, engine-divergent) out of the cross-engine
    * compare entirely, the same substitution family as the
    * Simpson-for-Shannon device.
    *
    * Neighbour scope is the SERVED graph — cell-mates of the
    * [[ivfCoarseAssign]] assignment, the [[hubness]] topology — because
    * the exact n² graph is unbuildable at fleet scale and the local μ
    * only needs the two nearest points, which land in the home cell for
    * exactly the vectors where the IVF index works (emb_knn_recall
    * measures that premise). TwoNN's own exclusions apply: points whose
    * cell holds < 3 members have no r₂, and r₁ = 0 duplicates (cosine
    * rounds to 1) make μ undefined — both filtered, as in the paper.
    *
    * Exactness: distances are 1 − rounded-cosine (identical doubles),
    * μ is ONE division of those, rounded; percentiles ride the
    * value_percentiles-proven interpolation pair and round to the
    * lattice. 100 TB shape: the pair stage is the hubness in-cell
    * equi-join bound — measured per quantizer size by
    * [[kmeansElbow]]'s `scan_frac` column, so the "k widens with the
    * corpus" premise is an in-catalog number, not prose; top-2 per
    * point ships via the bounded heap; the report is #labels rows.
    */
  val intrinsicDim: CatalogEntry = CatalogEntry(
    "emb_intrinsic_dim",
    (s, d) => {
      import graft.functions.Vectors
      val emb = embeddings(s, d)
      val withCell = emb.join(ivfCoarseAssign(emb, ivfCentroidFrame(emb)), "vec_id")
        .select(col("vec_id"), col("embedding"), col("label"), col("cell"))
        .withColumn("nrm", Vectors.norm(col("embedding")))
        .cacheOnce()
      val q = withCell.select(col("cell"), col("vec_id").as("query_id"),
        col("label"), col("embedding").as("qe"), col("nrm").as("qn"))
      val c = withCell.select(col("cell"), col("vec_id").as("cand_id"),
        col("embedding").as("ce"), col("nrm").as("cn"))
      val top2 = udaf(new graft.combine.TopNAgg(2))
      val mu = q.join(c, Seq("cell"))
        .filter(col("query_id") =!= col("cand_id"))
        .select(col("query_id"), col("label"), cosineCol.as("score"), col("cand_id"))
        .groupBy("query_id", "label")
        .agg(top2(col("score"), col("cand_id")).as("top"))
        .filter(size(col("top.entries")) === 2)
        .select(col("label"),
          col("top.entries").getItem(0).getField("value").as("cos1"),
          col("top.entries").getItem(1).getField("value").as("cos2"))
        .filter(col("cos1") =!= 1.0)
        .select(col("label"),
          round((lit(1.0) - col("cos2")) / (lit(1.0) - col("cos1")), 6).as("mu"))
      mu.groupBy("label")
        .agg(count(lit(1)).as("n_points"),
          round(expr("percentile(mu, 0.25)"), 6).as("mu_p25"),
          round(expr("percentile(mu, 0.5)"), 6).as("mu_p50"),
          round(expr("percentile(mu, 0.75)"), 6).as("mu_p75"),
          round(expr("percentile(mu, 0.9)"), 6).as("mu_p90"))
    },
    Some {
      val centSim =
        s"ROUND(${dotSql("e.embedding", "c.embedding")} / (SQRT(${dotSql("e.embedding", "e.embedding")}) * SQRT(${dotSql("c.embedding", "c.embedding")})), 6)"
      s"""WITH cent AS (SELECT vec_id AS cid, embedding FROM embeddings
                        WHERE vec_id BETWEEN $IvfCentroidLo AND $IvfCentroidHi),
            cellscore AS (
              SELECT e.vec_id, c.cid, $centSim AS csim
              FROM embeddings e CROSS JOIN (SELECT cid, embedding FROM cent) c(cid, embedding)),
            assign AS (
              SELECT vec_id, cid AS cell FROM (
                SELECT vec_id, cid,
                       row_number() OVER (PARTITION BY vec_id ORDER BY csim DESC, cid) AS rn
                FROM cellscore) WHERE rn = 1),
            wc AS (SELECT a.vec_id, a.cell, e.label, e.embedding
                   FROM assign a JOIN embeddings e ON e.vec_id = a.vec_id),
            nn AS (
              SELECT query_id, label,
                     MAX(CASE WHEN rn = 1 THEN score END) AS cos1,
                     MAX(CASE WHEN rn = 2 THEN score END) AS cos2
              FROM (SELECT q.vec_id AS query_id, q.label, $cosineSql AS score,
                           row_number() OVER (PARTITION BY q.vec_id
                             ORDER BY $cosineSql DESC, c.vec_id) AS rn
                    FROM wc q JOIN wc c ON c.cell = q.cell AND c.vec_id != q.vec_id)
              WHERE rn <= 2 GROUP BY 1, 2),
            mu AS (SELECT label, ROUND((1.0 - cos2) / (1.0 - cos1), 6) AS mu
                   FROM nn WHERE cos2 IS NOT NULL AND cos1 != 1.0)
          SELECT label, CAST(COUNT(*) AS BIGINT) AS n_points,
                 ROUND(quantile_cont(mu, 0.25), 6) AS mu_p25,
                 ROUND(quantile_cont(mu, 0.5), 6) AS mu_p50,
                 ROUND(quantile_cont(mu, 0.75), 6) AS mu_p75,
                 ROUND(quantile_cont(mu, 0.9), 6) AS mu_p90
          FROM mu GROUP BY label"""
    })

  /** Per-label centroid, long format (label, dim, centroid, n_vecs) — the
    * class-summary statistic behind semantic dedup (cluster-then-keep),
    * embedding drift monitors, and IVF seeding. Each (label, dim) cell is
    * the mean of that dimension over the label's vectors, folded in
    * vec_id order — the file-wide determinism device: a shuffled double
    * SUM is not bit-stable, an ORDERED left fold is, and DuckDB's
    * `list(v ORDER BY vec_id)` + list_reduce replays the identical
    * sequence.
    *
    * 100 TB shape: posexplode is a per-row projection (64× fan-out of
    * 8-byte cells, not of rows); ONE shuffle on (label, dim) — labels ×
    * 64 keys, uniform. The collect_list group is bounded by the label's
    * vector count — the ordered fold is the ORACLE-exactness device at
    * test scale; at fleet scale the drop-in is a decimal-carried SUM
    * (associative, any order), same note as `value_percentiles`'
    * approx_percentile swap.
    */
  val labelCentroids: CatalogEntry = CatalogEntry(
    "emb_label_centroids",
    (s, d) => embeddings(s, d)
      .select(col("vec_id"), col("label"), posexplode(col("embedding")).as(Seq("dim", "v")))
      .groupBy("label", "dim")
      .agg(count(lit(1)).as("n_vecs"),
        expr("""aggregate(array_sort(collect_list(struct(vec_id, v))),
                          CAST(0.0 AS DOUBLE),
                          (acc, s) -> acc + CAST(s.v AS DOUBLE))""").as("sum_v"))
      .select(col("label"), col("dim").cast("long").as("dim"),
        round(col("sum_v") / col("n_vecs"), 6).as("centroid"), col("n_vecs")),
    Some(
      """SELECT label, CAST(dim AS BIGINT) AS dim,
                ROUND(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                                               list(CAST(v AS DOUBLE) ORDER BY vec_id)),
                                  (acc, x) -> acc + x) / COUNT(*), 6) AS centroid,
                COUNT(*) AS n_vecs
         FROM (SELECT vec_id, label, unnest(embedding) AS v,
                      generate_subscripts(embedding, 1) - 1 AS dim
               FROM embeddings)
         GROUP BY label, dim"""))

  private val MmrC = 10 // candidate pool per query for the MMR re-rank
  private val MmrK = 5 // diversified selections per query
  // λ and (1−λ) as SEPARATE literals: `1 - 0.7` computed in Scala is
  // 0.30000000000000004, while the oracle's parsed `0.3` is not — both
  // engines must see the same decimal text.
  private val MmrLambda = "0.7"
  private val MmrPenalty = "0.3"

  /** MMR diversity re-rank (Carbonell & Goldstein 1998) — the
    * redundancy-aware retrieval tail a RAG stack runs after ANN: from
    * each query's top-[[MmrC]] relevance candidates, greedily pick
    * [[MmrK]] maximizing `λ·rel − (1−λ)·max-sim-to-already-picked`, so
    * near-duplicate passages don't crowd the context window. The greedy
    * loop is UNROLLED ([[MmrK]] fixed steps) over frames that are
    * (queries × C)-sized — candidate pool, pairwise candidate sims
    * (C²·queries rows), per-step anti join + max-penalty aggregate +
    * struct-min argmax — so determinism is by construction and the
    * oracle replays the identical steps as chained CTEs with
    * row_number argmaxes.
    *
    * 100 TB shape: the corpus is touched exactly once (the relevance
    * scan, the brute/BQ linear pattern); everything after operates on
    * checkpointed candidate frames whose size is query-count-bounded,
    * independent of corpus size. MMR scores round at 6 off
    * already-rounded rel/sim inputs — one multiply-subtract sequence,
    * identical text literals both engines.
    *
    * Timing ADJUDICATION (r13, closes the r12 "drifted with no code
    * change" flag): r11 full-run 1.42 s → r12 full-run 2.46 s / 2.27 s
    * isolated, file untouched in between. Re-measured r13 isolated,
    * min of 5 at sf0.1/local[32], cal_32t 0.502 (host ~12% SLOWER than
    * the r12 run's 0.447): 1.61 s. A real regression cannot shrink on a
    * slower host with the code still untouched — the r12 readings were
    * the documented ±30% host swing, not a plan change. Baseline of
    * record for this entry: ~1.6 s at cal_32t ≈ 0.5.
    */
  val mmrRerank: CatalogEntry = CatalogEntry(
    "emb_mmr_rerank",
    (s, d) => {
      import graft.functions.Vectors
      val emb = embeddings(s, d)
      val withNorm = emb.withColumn("nrm", Vectors.norm(col("embedding")))
      val queries = withNorm.filter(col("vec_id") < NQueries)
        .select(col("vec_id").as("query_id"), col("embedding").as("qe"), col("nrm").as("qn"))
      val corpus = withNorm.select(col("vec_id").as("cand_id"),
        col("embedding").as("ce"), col("nrm").as("cn"))
      val topc = udaf(new graft.combine.TopNAgg(MmrC))
      val rel = corpus.join(broadcast(queries), col("cand_id") =!= col("query_id"))
        .select(col("query_id"), col("cand_id"), cosineCol.as("rel"))
        .groupBy("query_id").agg(topc(col("rel"), col("cand_id")).as("top"))
        .select(col("query_id"), explode(col("top.entries")).as("e"))
        .select(col("query_id"), col("e.event_id").as("cand_id"), col("e.value").as("rel"))
        .localCheckpoint(eager = true)
      val cv = corpus.join(broadcast(rel.select("query_id", "cand_id")), Seq("cand_id"))
        .select(col("query_id"), col("cand_id"), col("ce"), col("cn"))
        .localCheckpoint(eager = true)
      val sims = cv.select(col("query_id"), col("cand_id").as("ca"),
          col("ce").as("qe"), col("cn").as("qn"))
        .join(cv.select(col("query_id"), col("cand_id").as("cb"), col("ce"), col("cn")),
          Seq("query_id"))
        .filter(col("ca") =!= col("cb"))
        .select(col("query_id"), col("ca"), col("cb"), cosineCol.as("sim"))
        .localCheckpoint(eager = true)
      var selected = rel.groupBy("query_id")
        .agg(min(struct((-col("rel")).as("nr"), col("cand_id").as("c"))).as("m"))
        .select(col("query_id"), col("m.c").as("cand_id"), lit(1L).as("step"))
        .localCheckpoint(eager = true)
      for (k <- 2 to MmrK) {
        val unsel = rel.join(selected.select("query_id", "cand_id"),
          Seq("query_id", "cand_id"), "left_anti")
        val simToSel = sims
          .join(selected.select(col("query_id"), col("cand_id").as("cb")), Seq("query_id", "cb"))
          .groupBy(col("query_id"), col("ca").as("cand_id"))
          .agg(max(col("sim")).as("ms"))
        val pick = unsel.join(simToSel, Seq("query_id", "cand_id"))
          .select(col("query_id"), col("cand_id"),
            round(expr(s"$MmrLambda * rel - $MmrPenalty * ms"), 6).as("mmr"))
          .groupBy("query_id")
          .agg(min(struct((-col("mmr")).as("nm"), col("cand_id").as("c"))).as("m"))
          .select(col("query_id"), col("m.c").as("cand_id"), lit(k.toLong).as("step"))
        selected = selected.unionByName(pick).localCheckpoint(eager = true)
      }
      selected.join(rel, Seq("query_id", "cand_id"))
        .select(col("query_id"), col("step"), col("cand_id").as("vec_id"), col("rel"))
        .orderBy("query_id", "step")
    },
    Some {
      val simSql =
        s"ROUND(${dotSql("ea.embedding", "eb.embedding")} / (SQRT(${dotSql("ea.embedding", "ea.embedding")}) * SQRT(${dotSql("eb.embedding", "eb.embedding")})), 6)"
      val steps = (2 to MmrK).map { k =>
        s"""s$k AS (SELECT query_id, cand_id, $k AS step FROM (
                SELECT r.query_id, r.cand_id,
                       row_number() OVER (PARTITION BY r.query_id
                         ORDER BY ROUND($MmrLambda * r.rel - $MmrPenalty * ms.m, 6) DESC,
                                  r.cand_id) AS rk
                FROM rel r
                JOIN (SELECT si.query_id, si.ca AS cand_id, MAX(si.sim) AS m
                      FROM sims si JOIN sel${k - 1} s
                        ON s.query_id = si.query_id AND s.cand_id = si.cb
                      GROUP BY 1, 2) ms
                  ON ms.query_id = r.query_id AND ms.cand_id = r.cand_id
                WHERE NOT EXISTS (SELECT 1 FROM sel${k - 1} s2
                                  WHERE s2.query_id = r.query_id
                                    AND s2.cand_id = r.cand_id)) WHERE rk = 1),
            sel$k AS (SELECT * FROM sel${k - 1} UNION ALL SELECT * FROM s$k)"""
      }.mkString(",\n            ")
      s"""WITH rel AS (SELECT query_id, cand_id, rel FROM (
                SELECT q.vec_id AS query_id, c.vec_id AS cand_id, $cosineSql AS rel,
                       row_number() OVER (PARTITION BY q.vec_id
                         ORDER BY $cosineSql DESC, c.vec_id) AS rn
                FROM embeddings q JOIN embeddings c ON c.vec_id != q.vec_id
                WHERE q.vec_id < $NQueries) WHERE rn <= $MmrC),
            sims AS (SELECT r1.query_id, r1.cand_id AS ca, r2.cand_id AS cb, $simSql AS sim
                     FROM rel r1
                     JOIN rel r2 ON r2.query_id = r1.query_id AND r2.cand_id != r1.cand_id
                     JOIN embeddings ea ON ea.vec_id = r1.cand_id
                     JOIN embeddings eb ON eb.vec_id = r2.cand_id),
            s1 AS (SELECT query_id, cand_id, 1 AS step FROM (
                     SELECT query_id, cand_id,
                            row_number() OVER (PARTITION BY query_id
                              ORDER BY rel DESC, cand_id) AS rk FROM rel) WHERE rk = 1),
            sel1 AS (SELECT * FROM s1),
            $steps
          SELECT query_id, CAST(step AS BIGINT) AS step, cand_id AS vec_id, rel
          FROM sel$MmrK JOIN rel USING (query_id, cand_id)
          ORDER BY query_id, step"""
    })

  private val OutlierK = 3 // flagged vectors per label

  /** Per-label embedding outliers — the mislabel/contamination audit of
    * a labeled corpus: the [[OutlierK]] vectors LEAST cosine-similar to
    * their own label's centroid (a vector far from its class center is
    * a labeling error, an ingestion glitch, or genuinely hard — all
    * three are what a data-cleaning pass reviews first). Composes
    * [[labelCentroids]] verbatim (same ordered-fold means, oracle CTE
    * included), so the audit can never disagree with the published
    * centroids.
    *
    * Determinism: centroid components are the 6-dp rounded ordered-fold
    * means; the score is one left-fold dot over the fixed dim order and
    * one rounded division — the house cosine contract. Ties break by
    * vec_id via TopNAgg's (value, event_id) order, mirrored by the
    * oracle's row_number.
    *
    * Scale: summary + rescan (the heavy-hitter economics) — one corpus
    * pass builds the labels×dims centroid grid (checkpointed, tiny), one
    * pass scores every vector against its own label's BROADCAST centroid
    * array; the bottom-K is a bounded-heap aggregate shipping ≤ K rows
    * per partition per label, never a corpus-wide rank window.
    */
  val centroidOutliers: CatalogEntry = CatalogEntry(
    "emb_centroid_outliers",
    (s, d) => {
      import graft.functions.Vectors
      val centArr = labelCentroids.build(s, d)
        .groupBy("label")
        .agg(transform(array_sort(collect_list(struct(col("dim"), col("centroid")))),
          x => x.getField("centroid")).as("ce"))
        .localCheckpoint(eager = true)
      val low = udaf(new graft.combine.TopNAgg(OutlierK))
      embeddings(s, d)
        .join(broadcast(centArr), Seq("label"))
        .select(col("label"), col("vec_id"),
          round(Vectors.cosineWithNorms(
            col("embedding").cast("array<double>"), col("ce"),
            Vectors.norm(col("embedding").cast("array<double>")),
            Vectors.norm(col("ce"))), 6).as("cos"))
        .groupBy("label")
        .agg(low(-col("cos"), col("vec_id")).as("top"))
        .select(col("label"), posexplode(col("top.entries")))
        .select(col("label"), (col("pos") + 1).cast("long").as("rnk"),
          col("col.event_id").as("vec_id"), (-col("col.value")).as("cos"))
        .orderBy("label", "rnk")
    },
    Some {
      val centSql = labelCentroids.oracle.get
      val dotEC =
        s"list_reduce(list_prepend(CAST(0.0 AS DOUBLE), [CAST(e.embedding[i] AS DOUBLE) * c.ce[i] for i in range(1, ${Dim + 1})]), (acc, v) -> acc + v)"
      val dotCC =
        s"list_reduce(list_prepend(CAST(0.0 AS DOUBLE), [c.ce[i] * c.ce[i] for i in range(1, ${Dim + 1})]), (acc, v) -> acc + v)"
      s"""WITH cent AS ($centSql),
            ca AS (SELECT label, list(centroid ORDER BY dim) AS ce FROM cent GROUP BY label),
            scored AS (SELECT e.label, e.vec_id,
                              ROUND($dotEC / (SQRT(${dotSql("e.embedding", "e.embedding")}) * SQRT($dotCC)), 6) AS cos
                       FROM embeddings e JOIN ca c ON c.label = e.label),
            r AS (SELECT label, vec_id, cos,
                         row_number() OVER (PARTITION BY label ORDER BY cos ASC, vec_id) AS rnk
                  FROM scored)
          SELECT label, CAST(rnk AS BIGINT) AS rnk, vec_id, cos
          FROM r WHERE rnk <= $OutlierK ORDER BY label, rnk"""
    })

  private val MahaK = 5 // OOD candidates reported per label

  /** Per-label out-of-distribution audit by DIAGONAL Mahalanobis
    * distance (Lee et al. 2018, arXiv:1807.03888, restricted to a
    * per-dimension variance — the diagonal that stays a per-row
    * projection at any scale; a full covariance needs a d×d solve per
    * class and buys little on decorrelated embedding dims): for every
    * vector, md2 = Σᵢ (xᵢ − μ_label,ᵢ)² / (σ²_label,ᵢ + ε), and the
    * [[MahaK]] highest-md2 vectors per label are the OOD review queue.
    * The variance normalization is what [[centroidOutliers]]' cosine
    * cannot see: a vector can sit at a perfectly ordinary ANGLE yet be
    * wildly outside its class's per-dimension spread — cosine audits
    * direction, Mahalanobis audits the envelope.
    *
    * Determinism: per-(label, dim) sum and sum-of-squares ride the
    * [[labelCentroids]] ordered fold (bit-identical in both engines);
    * μ and σ² derive through ONE fixed expression shape
    * (`sum/n`, `sumsq/n − (sum/n)²`); the per-row score folds dims in
    * ascending order with a per-term fixed IEEE expression and ε the
    * shared literal 0.000001 (also the zero-variance guard — a
    * constant dimension contributes (x−μ)²/ε, loudly OOD, never a
    * division by zero); ROUND 6 before the bounded heap; ties break by
    * vec_id (TopNAgg's order, mirrored by the oracle's row_number).
    *
    * 100 TB shape: summary + rescan, same economics as
    * [[centroidOutliers]] — one corpus pass builds the labels × dims
    * moment grid (ONE shuffle on (label, dim), map-combined), the grid
    * collapses to labels×2 broadcast arrays, one pass scores every
    * vector against its own label's BROADCAST (μ, σ²) rows, and the
    * top-K is a bounded-heap aggregate shipping ≤ K rows per partition
    * per label — never a corpus-wide rank window. The ordered fold is
    * the oracle-exactness device at test scale; at fleet scale the
    * drop-in is a decimal-carried SUM (associative, any order), the
    * [[labelCentroids]] note.
    */
  val oodMahalanobis: CatalogEntry = CatalogEntry(
    "emb_ood_mahalanobis",
    (s, d) => {
      val stats = embeddings(s, d)
        .select(col("vec_id"), col("label"), posexplode(col("embedding")).as(Seq("dim", "v")))
        .groupBy("label", "dim")
        .agg(count(lit(1)).as("n_vecs"),
          expr("array_sort(collect_list(struct(vec_id, v)))").as("lst"))
        .select(col("label"), col("dim"), col("n_vecs"),
          expr("""aggregate(lst, CAST(0.0 AS DOUBLE),
                            (acc, s) -> acc + CAST(s.v AS DOUBLE))""").as("sum_v"),
          expr("""aggregate(lst, CAST(0.0 AS DOUBLE),
                            (acc, s) -> acc + CAST(s.v AS DOUBLE) * CAST(s.v AS DOUBLE))""")
            .as("sum_sq"))
        .select(col("label"), col("dim"),
          (col("sum_v") / col("n_vecs")).as("mu"),
          (col("sum_sq") / col("n_vecs")
            - (col("sum_v") / col("n_vecs")) * (col("sum_v") / col("n_vecs"))).as("va"))
      val grid = stats.groupBy("label")
        .agg(
          expr("transform(array_sort(collect_list(struct(dim, mu, va))), x -> x.mu)").as("mu"),
          expr("transform(array_sort(collect_list(struct(dim, mu, va))), x -> x.va)").as("va"))
        .localCheckpoint(eager = true)
      val top = udaf(new graft.combine.TopNAgg(MahaK))
      embeddings(s, d)
        .join(broadcast(grid), Seq("label"))
        .select(col("label"), col("vec_id"),
          expr(s"""round(aggregate(sequence(0, ${Dim - 1}), CAST(0.0 AS DOUBLE),
                     (acc, i) -> acc + (CAST(embedding[i] AS DOUBLE) - mu[i])
                                       * (CAST(embedding[i] AS DOUBLE) - mu[i])
                                       / (va[i] + 0.000001)), 6)""").as("md2"))
        .groupBy("label")
        .agg(top(col("md2"), col("vec_id")).as("top"))
        .select(col("label"), posexplode(col("top.entries")))
        .select(col("label"), (col("pos") + 1).cast("long").as("rnk"),
          col("col.event_id").as("vec_id"), col("col.value").as("md2"))
        .orderBy("label", "rnk")
    },
    Some {
      val fold =
        s"""list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
              [(CAST(e.embedding[i] AS DOUBLE) - c.mu[i]) * (CAST(e.embedding[i] AS DOUBLE) - c.mu[i]) / (c.va[i] + 0.000001)
               for i in range(1, ${Dim + 1})]),
              (acc, v) -> acc + v)"""
      s"""WITH ex AS (SELECT vec_id, label, unnest(embedding) AS v,
                             generate_subscripts(embedding, 1) - 1 AS dim
                      FROM embeddings),
            stats AS (SELECT label, dim, COUNT(*) AS n_vecs,
                             list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                               list(CAST(v AS DOUBLE) ORDER BY vec_id)),
                               (acc, x) -> acc + x) AS sum_v,
                             list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                               list(CAST(v AS DOUBLE) * CAST(v AS DOUBLE) ORDER BY vec_id)),
                               (acc, x) -> acc + x) AS sum_sq
                      FROM ex GROUP BY label, dim),
            mv AS (SELECT label, dim, sum_v / n_vecs AS mu,
                          sum_sq / n_vecs - (sum_v / n_vecs) * (sum_v / n_vecs) AS va
                   FROM stats),
            ca AS (SELECT label, list(mu ORDER BY dim) AS mu,
                          list(va ORDER BY dim) AS va
                   FROM mv GROUP BY label),
            scored AS (SELECT e.label, e.vec_id, ROUND($fold, 6) AS md2
                       FROM embeddings e JOIN ca c ON c.label = e.label),
            r AS (SELECT label, vec_id, md2,
                         row_number() OVER (PARTITION BY label
                                            ORDER BY md2 DESC, vec_id) AS rnk
                  FROM scored)
          SELECT label, CAST(rnk AS BIGINT) AS rnk, vec_id, md2
          FROM r WHERE rnk <= $MahaK ORDER BY label, rnk"""
    })

  /** SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic
    * deduplication by clustering embeddings with a frozen k-means coarse
    * quantizer, then pruning near-duplicate pairs WITHIN each cluster
    * only — the trick that turns O(n²) all-pairs cosine into
    * Σ_cells O(|cell|²) with |cell| ≈ n/k. A vector is a duplicate when a
    * SMALLER-vec_id vector in its cluster has cosine ≥ τ (keep-lowest-id,
    * the same deterministic keeper rule as the text near-dup family);
    * cross-cluster near-dups are invisible by design — the documented
    * recall trade the paper makes at web scale.
    *
    * 100 TB shape: assignment against the centroid LITERALS is a per-row
    * projection (zero shuffles, no centroid join); the only shuffle is
    * the self-join key `cell`, whose population k is a knob (√n cells
    * keeps cells near-constant); norms are computed once per row before
    * the pair loop. Same τ as `emb_near_dup` — that entry buckets by
    * random hyperplanes, this one by trained cells: LSH trades recall
    * for independence from training, SemDeDup trades training for
    * tighter candidate sets.
    */
  val semDedup: CatalogEntry = CatalogEntry(
    "emb_semdedup",
    (s, d) => {
      import graft.functions.Vectors
      val emb = embeddings(s, d)
      val cells = graft.operators.KMeans.sortedCells(col("embedding"), IvfCentroids.kmeans16)
      // Three branches (keep, cand, the final flag join) read the
      // assignment projection — cache it or the 16-centroid argmin (48
      // dim-64 dot products per row) evaluates three times.
      val assigned = emb.select(col("vec_id"), col("embedding"),
          cells.getItem(0).getField("cid").cast("long").as("cell"))
        .withColumn("vn", Vectors.norm(col("embedding")))
        .cacheOnce()
      val keep = assigned.select(col("cell"), col("vec_id").as("keep_id"),
        col("embedding").as("qe"), col("vn").as("qn"))
      val cand = assigned.select(col("cell"), col("vec_id").as("cand_id"),
        col("embedding").as("ce"), col("vn").as("cn"))
      val dups = keep.join(cand, "cell")
        .where(col("keep_id") < col("cand_id"))
        .where(cosineCol >= lit(SemDedupThreshold))
        .select(col("cand_id").as("vec_id")).distinct()
        .withColumn("dup", lit(true))
      assigned.join(dups, Seq("vec_id"), "left")
        .select(col("vec_id"), col("cell"), coalesce(col("dup"), lit(false)).as("is_dup"))
    },
    Some {
      // Same L2 assignment arithmetic as the kmeans-IVF oracle: raw
      // |v|² − 2 v·c + |c|² orders identically across engines, no ROUND.
      val centRows = IvfCentroids.kmeans16.map { case (cid, c) =>
        val lst = c.mkString("[", ", ", "]")
        val cn2 = c.map(x => x * x).sum
        s"($cid, $lst, $cn2)"
      }.mkString(", ")
      val distE = s"${dotSql("e.embedding", "e.embedding")} - 2.0 * ${dotSql("e.embedding", "c.cemb")} + c.cn2"
      s"""WITH cent(cid, cemb, cn2) AS (SELECT * FROM (VALUES $centRows) v(cid, cemb, cn2)),
            dist AS (SELECT e.vec_id, c.cid, $distE AS d
                     FROM embeddings e CROSS JOIN cent c),
            assign AS (SELECT vec_id, cid AS cell FROM (
                         SELECT vec_id, cid,
                                row_number() OVER (PARTITION BY vec_id ORDER BY d, cid) AS rn
                         FROM dist) WHERE rn = 1),
            dups AS (SELECT DISTINCT b.vec_id
                     FROM assign a JOIN assign b
                       ON a.cell = b.cell AND a.vec_id < b.vec_id
                     JOIN embeddings q ON q.vec_id = a.vec_id
                     JOIN embeddings c ON c.vec_id = b.vec_id
                     WHERE $cosineSql >= $SemDedupThreshold)
          SELECT a.vec_id, CAST(a.cell AS BIGINT) AS cell,
                 (d.vec_id IS NOT NULL) AS is_dup
          FROM assign a LEFT JOIN dups d ON d.vec_id = a.vec_id"""
    })

  /** One-pass Gram matrix X'X over the embedding corpus (upper triangle,
    * long format) — the moment statistic behind PCA / whitening /
    * covariance drift monitors, computed by `graft.combine.OuterProductAgg`:
    * a single scan, map-side partial outer products, one 2080-cell merge —
    * NEVER the explode+self-join that multiplies the corpus by dim²
    * before aggregating (64× row blow-up through a shuffle at 100 TB).
    *
    * Determinism: per-row products are snapped to a 1e-9 integer lattice
    * (floor(x·1e9 + 0.5)) and summed as Longs — associative, so partition
    * count, merge order, and engine cannot move a bit; the oracle replays
    * the identical lattice arithmetic per cell. The triangle→(i,j)
    * unflattening is a literal-array projection, not a join.
    */
  val gramMatrix: CatalogEntry = CatalogEntry(
    "emb_gram_matrix",
    (s, d) => {
      val agg = udaf(new graft.combine.OuterProductAgg(Dim, GramScale))
      val iArr = for (i <- 0 until Dim; j <- i until Dim) yield i
      val jArr = for (i <- 0 until Dim; j <- i until Dim) yield j
      embeddings(s, d)
        .agg(agg(col("embedding")).as("tri"))
        .select(posexplode(col("tri.cells")).as(Seq("pos", "sg")))
        .select(
          element_at(typedlit(iArr), col("pos") + 1).cast("long").as("i"),
          element_at(typedlit(jArr), col("pos") + 1).cast("long").as("j"),
          round(col("sg") / lit(GramScale), 6).as("g"))
    },
    Some(s"""SELECT CAST(i AS BIGINT) AS i, CAST(j AS BIGINT) AS j,
                    ROUND(CAST(SUM(CAST(FLOOR(CAST(e.embedding[i+1] AS DOUBLE)
                                               * CAST(e.embedding[j+1] AS DOUBLE)
                                               * $GramScale + 0.5) AS HUGEINT)) AS DOUBLE)
                          / $GramScale, 6) AS g
             FROM embeddings e, range(0, $Dim) ti(i), range(0, $Dim) tj(j)
             WHERE j >= i
             GROUP BY i, j"""))

  /** Matryoshka (MRL) prefix ANN — the third leg of the compression trio
    * next to SQ8 (fewer bits per dim) and PQ (codebooks): shortlist on the
    * FIRST [[MrlPrefixDim]] dimensions only (Kusupati et al. 2022 — MRL
    * embeddings front-load information so a prefix is itself a valid
    * embedding), then rerank the 4K shortlist with the exact full-width
    * cosine. At 100 TB the shortlist scan reads prefix/dim of the bytes
    * (16/64 = 1/4 here, same bandwidth win as SQ8 by a different axis) and
    * composes with it — quantize the prefix for both wins at once. These
    * embeddings are not MRL-trained, so prefix recall is the pessimistic
    * floor; the exact rerank absorbs it either way.
    */
  val knnMrl: CatalogEntry = CatalogEntry(
    "emb_knn_mrl",
    (s, d) => {
      import graft.functions.Vectors
      val emb = embeddings(s, d)
      val corpus = emb.select(col("vec_id").as("cand_id"),
          slice(col("embedding"), 1, MrlPrefixDim).as("cp"))
        .withColumn("cpn", Vectors.norm(col("cp")))
      val queries = emb.filter(col("vec_id") < NQueries)
        .select(col("vec_id").as("query_id"),
          slice(col("embedding"), 1, MrlPrefixDim).as("qp"))
        .withColumn("qpn", Vectors.norm(col("qp")))
      val pscore = round(
        Vectors.cosineWithNorms(col("qp"), col("cp"), col("qpn"), col("cpn")), 6)
      val scored = corpus.join(broadcast(queries), col("cand_id") =!= col("query_id"))
        .select(col("query_id"), col("cand_id"), pscore.as("score"))
      shortlistRerank(emb, scored)
    },
    Some(
      s"""WITH pscored AS (SELECT q.vec_id AS query_id, c.vec_id AS cand_id, $prefixCosSql AS ps
                           FROM embeddings q JOIN embeddings c ON c.vec_id != q.vec_id
                           WHERE q.vec_id < $NQueries),
            ${shortlistRerankSql("pscored", "ps")}"""))

  /** Oracle for [[knnMrlIvf]]: the IVF-kmeans assignment CTEs (same frozen
    * centroid literals and fold arithmetic as emb_knn_ivf_kmeans) feeding
    * the MRL prefix shortlist and full-width rerank. Also embedded by
    * [[knnRecall]]'s mrl_ivf row.
    */
  private lazy val mrlIvfOracleSql: String =
    s"""WITH $ivfAssignCtes,
          pscored AS (SELECT p.query_id, a.vec_id AS cand_id, $prefixCosSql AS ps
                      FROM probes p
                      JOIN assign a ON a.cell = p.probe_cell
                      JOIN embeddings c ON c.vec_id = a.vec_id AND c.vec_id != p.query_id
                      JOIN embeddings q ON q.vec_id = p.query_id),
          ${shortlistRerankSql("pscored", "ps")}"""

  /** MRL prefix shortlist WITHIN probed IVF cells — the production
    * composition of [[knnMrl]] (which shortlists by prefix over the whole
    * corpus, a deliberate n×q baseline) and [[knnIvfKmeans]] (which prunes
    * by cell but scores full-width): queries probe their [[IvfProbes]]
    * nearest k-means cells, the prefix-dim cosine ranks ONLY rows in those
    * cells, and the exact full-width cosine reranks the per-query
    * shortlist. At 100 TB the candidate scan touches probes/cells of the
    * rows AND prefix/dim of each row's bytes (2/16 × 16/64 = 1/128 of the
    * brute-force arithmetic here) — the two pruning axes multiply, which
    * is why real MRL deployments run exactly this shape (ADANNS, Rege et
    * al. 2023). Cell assignment stays a per-row projection against frozen
    * centroid literals (zero shuffles before the top-k aggregate), and
    * both shortlist and rerank joins broadcast query-sized frames only.
    */
  val knnMrlIvf: CatalogEntry = CatalogEntry(
    "emb_knn_mrl_ivf",
    (s, d) => {
      import graft.functions.Vectors
      val emb = embeddings(s, d)
      val cells = graft.operators.KMeans.sortedCells(col("embedding"), IvfCentroids.kmeans16)
      val corpus = emb.select(col("vec_id").as("cand_id"),
          slice(col("embedding"), 1, MrlPrefixDim).as("cp"),
          cells.getItem(0).getField("cid").cast("long").as("cell"))
        .withColumn("cpn", Vectors.norm(col("cp")))
      val queries = emb.filter(col("vec_id") < NQueries)
        .select(col("vec_id").as("query_id"),
          slice(col("embedding"), 1, MrlPrefixDim).as("qp"),
          explode(slice(cells, 1, IvfProbes)).as("probe"))
        .select(col("query_id"), col("qp"), col("probe.cid").cast("long").as("probe_cell"))
        .withColumn("qpn", Vectors.norm(col("qp")))
      val pscore = round(
        Vectors.cosineWithNorms(col("qp"), col("cp"), col("qpn"), col("cpn")), 6)
      val scored = corpus.join(broadcast(queries),
          col("cell") === col("probe_cell") && col("cand_id") =!= col("query_id"))
        .select(col("query_id"), col("cand_id"), pscore.as("score"))
      shortlistRerank(emb, scored)
    },
    Some(mrlIvfOracleSql))

  /** ANN quality measured as data, not guessed: per-query recall@K of
    * EVERY index variant in the catalog against the exact brute-force
    * answer — the diagnostic every index deployment runs before trusting
    * an approximate path, covering the full quantization/pruning ladder
    * (LSH, multiprobe LSH, grid IVF, trained IVF, SQ8, PQ, IVF∘PQ, BQ,
    * MRL, and the MRL∘IVF composition). All pipelines are deterministic,
    * so recall itself is deterministic and oracle-checkable. Cost: the
    * underlying scans plus a K-rows-per-query join per index — the
    * comparison is on result sets, never an extra pass over the corpus.
    * (Declared AFTER every index entry it reads: the oracle composes
    * their SQL at init time.)
    *
    * Deliberately absent rung: graph-walk ANN (HNSW, NSG). Its search
    * is a SEQUENTIAL greedy walk over a navigable graph — each hop
    * reads the previous hop's neighbors — which has no data-parallel
    * decomposition: on Spark it degenerates to either a driver-side
    * loop over a collected graph (not distributed) or one Spark job
    * per hop (latency-absurd). The partition-parallel index shapes ARE
    * this ladder: cells/buckets prune, codes compress, exact rerank
    * restores precision — the negative result recorded so the gap
    * reads as a decision, not an omission.
    */
  val knnRecall: CatalogEntry = {
    val indexes: Seq[(String, CatalogEntry)] = Seq(
      "lsh" -> knnLsh, "multiprobe" -> knnLshMultiprobe, "ivf" -> knnIvf,
      "ivf_kmeans" -> knnIvfKmeans, "sq8" -> knnSq8, "pq" -> knnPq,
      "ivfpq" -> knnIvfPq, "bq" -> knnBq, "mrl" -> knnMrl, "mrl_ivf" -> knnMrlIvf)
    CatalogEntry(
      "emb_knn_recall",
      (s, d) => {
        // The brute-force truth feeds every recallOf branch of the union;
        // left lazy it would execute the full scan+score+top-k subtree
        // once per branch. localCheckpoint materializes it eagerly (K
        // rows per query — tiny) with no cache-manager residue (house
        // pattern, cf. lineitem_bloom_semi).
        val b = knnBrute.build(s, d).select(col("query_id"), col("vec_id"))
          .localCheckpoint(eager = true)
        def recallOf(idx: String, approx: DataFrame): DataFrame = {
          val l = approx.select(col("query_id"), col("vec_id")).withColumn("hit", lit(1))
          b.join(l, Seq("query_id", "vec_id"), "left")
            .groupBy("query_id")
            .agg(count(lit(1)).as("k"),
              sum(coalesce(col("hit"), lit(0))).cast("long").as("hits"))
            .select(lit(idx).as("idx"), col("query_id"), col("k"), col("hits"),
              round(col("hits") / lit(K.toDouble), 6).as("recall"))
        }
        indexes.map { case (n, e) => recallOf(n, e.build(s, d)) }
          .reduce(_ unionByName _)
      },
      Some {
        val ctes = indexes.map { case (n, e) =>
          s"i_$n AS (SELECT query_id, vec_id FROM (${e.oracle.get}) t_$n)"
        }.mkString(",\n                  ")
        val blocks = indexes.map { case (n, _) =>
          s"""SELECT '$n' AS idx, b.query_id, COUNT(*) AS k,
                    CAST(COUNT(x.vec_id) AS BIGINT) AS hits,
                    ROUND(COUNT(x.vec_id) / CAST($K AS DOUBLE), 6) AS recall
             FROM brute b LEFT JOIN i_$n x
               ON x.query_id = b.query_id AND x.vec_id = b.vec_id
             GROUP BY b.query_id"""
        }.mkString("\n             UNION ALL\n             ")
        s"""WITH brute AS (SELECT query_id, vec_id FROM ($bruteOracleSql) tb),
                  $ctes
             $blocks"""
      })
  }

  /** Probe depths the IVF sweep measures; the committed default
    * [[IvfProbes]] must be one of them so the sweep's row for it IS the
    * measured justification of the default. */
  private val SweepProbes = Seq(1, 2, 4, 8)

  /** IVF probe-count sweep — the recall/cost KNOB measured in-catalog
    * instead of fixed by fiat (the index-tuning sibling of
    * [[knnRecall]], and the embedding twin of `doc_lsh_calibration`):
    * for probes ∈ [[SweepProbes]], recall@[[K]] of the trained-kmeans
    * IVF against the brute-force truth NEXT TO the fraction of
    * brute-force pair work actually scanned. This is the table every
    * IVF deployment derives before choosing nprobe: recall climbs with
    * probed cells, scan cost climbs linearly, and the knee justifies
    * the default.
    *
    * ONE assignment scan feeds every depth: queries rank ALL 16 cells
    * once (posexplode of the sorted-cells projection, depth = rank),
    * the probed-cell rerank join runs once at the WIDEST depth, and
    * each sweep row filters the shared scored frame by `depth <= p` —
    * cells are disjoint, so a candidate reaches a query at exactly one
    * depth and the filter is exact (PlanSpec pins the single corpus
    * scan). At 100 TB the sweep costs the widest probe's scan, not
    * |SweepProbes| scans of it.
    *
    * Determinism: hits and scanned are BIGINT counts; recall and
    * scanned_frac are one correctly-rounded double division each from
    * identical integers in both engines.
    */
  val ivfProbeSweep: CatalogEntry = CatalogEntry(
    "emb_ivf_probe_sweep",
    (s, d) => {
      import graft.functions.Vectors
      val emb = embeddings(s, d)
      val maxP = SweepProbes.max
      val cells = graft.operators.KMeans.sortedCells(col("embedding"), IvfCentroids.kmeans16)
      val corpus = emb.select(col("vec_id").as("cand_id"), col("embedding").as("ce"),
          cells.getItem(0).getField("cid").cast("long").as("cell"))
        .withColumn("cn", Vectors.norm(col("ce")))
      val queries = emb.filter(col("vec_id") < NQueries)
        .select(col("vec_id").as("query_id"), col("embedding").as("qe"),
          posexplode(slice(cells, 1, maxP)))
        .select(col("query_id"), col("qe"), (col("pos") + 1).as("depth"),
          col("col.cid").cast("long").as("probe_cell"))
        .withColumn("qn", Vectors.norm(col("qe")))
      // The shared scored frame: every (query, candidate, depth) pair at
      // the widest depth, scored exactly once. Eager localCheckpoint for
      // the same reason knnRecall checkpoints the brute truth: four
      // branches read it, and left lazy each would re-run the scan.
      val scoredAll = corpus.join(broadcast(queries),
          col("cell") === col("probe_cell") && col("cand_id") =!= col("query_id"))
        .select(col("query_id"), col("cand_id"), col("depth"), cosineCol.as("score"))
        .localCheckpoint(eager = true)
      val truth = knnBrute.build(s, d).select(col("query_id"), col("vec_id"))
        .localCheckpoint(eager = true)
      val nTot = emb.agg(count(lit(1)).as("n_corpus"))
      SweepProbes.map { p =>
        val cand = scoredAll.filter(col("depth") <= p)
        val top = topKPerQuery(cand).select(col("query_id"), col("vec_id"))
        val hitsRow = truth
          .join(broadcast(top.withColumn("hit", lit(1))),
            Seq("query_id", "vec_id"), "left")
          .agg(sum(coalesce(col("hit"), lit(0))).cast("long").as("hits"))
        val scannedRow = cand.agg(count(lit(1)).as("scanned"))
        hitsRow.crossJoin(scannedRow)
          .select(lit(p.toLong).as("probes"), col("hits"),
            round(col("hits") / lit((NQueries * K).toDouble), 6).as("recall"),
            col("scanned"))
      }.reduce(_ unionByName _)
        .crossJoin(broadcast(nTot))
        .select(col("probes"), col("hits"), col("recall"), col("scanned"),
          round(col("scanned") /
            (lit(NQueries.toLong) * (col("n_corpus") - 1L)), 6).as("scanned_frac"))
        .orderBy("probes")
    },
    Some {
      val maxP = SweepProbes.max
      val probesVals = SweepProbes.map(p => s"($p)").mkString(", ")
      s"""WITH $ivfCoreCtes,
            probed AS (SELECT vec_id AS query_id, cid AS probe_cell, rn AS depth FROM (
                         SELECT vec_id, cid,
                                row_number() OVER (PARTITION BY vec_id ORDER BY d, cid) AS rn
                         FROM dist WHERE vec_id < $NQueries) WHERE rn <= $maxP),
            scored AS (SELECT p.query_id, a.vec_id AS cand_id, p.depth, $cosineSql AS score
                       FROM probed p
                       JOIN assign a ON a.cell = p.probe_cell
                       JOIN embeddings c ON c.vec_id = a.vec_id AND c.vec_id != p.query_id
                       JOIN embeddings q ON q.vec_id = p.query_id),
            brute AS (SELECT query_id, vec_id FROM ($bruteOracleSql) tb),
            ps(probes) AS (SELECT * FROM (VALUES $probesVals) v(probes)),
            topk AS (SELECT probes, query_id, cand_id FROM (
                       SELECT ps.probes, s.query_id, s.cand_id,
                              row_number() OVER (PARTITION BY ps.probes, s.query_id
                                                 ORDER BY s.score DESC, s.cand_id) AS rn
                       FROM ps JOIN scored s ON s.depth <= ps.probes) WHERE rn <= $K),
            h AS (SELECT ps.probes, CAST(SUM(CASE WHEN t.cand_id IS NULL THEN 0 ELSE 1 END) AS BIGINT) AS hits
                  FROM ps CROSS JOIN brute b
                  LEFT JOIN topk t ON t.probes = ps.probes AND t.query_id = b.query_id
                                  AND t.cand_id = b.vec_id
                  GROUP BY ps.probes),
            sc AS (SELECT ps.probes, CAST(COUNT(*) AS BIGINT) AS scanned
                   FROM ps JOIN scored s ON s.depth <= ps.probes GROUP BY ps.probes),
            n AS (SELECT COUNT(*) AS n_corpus FROM embeddings)
          SELECT CAST(h.probes AS BIGINT) AS probes, h.hits,
                 ROUND(CAST(h.hits AS DOUBLE) / ${NQueries * K}, 6) AS recall,
                 sc.scanned,
                 ROUND(CAST(sc.scanned AS DOUBLE) / ($NQueries * (n.n_corpus - 1)), 6) AS scanned_frac
          FROM h JOIN sc ON sc.probes = h.probes CROSS JOIN n
          ORDER BY probes"""
    })

  private val SweepWidths = Seq(8, 16, 32, 64)

  /** PQ shortlist-width sweep — the OTHER knob of the quantization
    * family measured in-catalog (the [[ivfProbeSweep]] discipline
    * applied to [[knnPq]]'s `PqShortlist`): for widths ∈ [[SweepWidths]],
    * recall@[[K]] of the ADC-shortlist-then-exact-rerank pipeline
    * against the brute-force truth, NEXT TO the exact-rerank row count
    * and its fraction of brute-force pair work. The ADC scan cost is
    * width-INDEPENDENT (the corpus is scanned in code space once); what
    * the width buys is rerank recall, and what it costs is full-width
    * vector fetches — exactly the trade this table prices before anyone
    * trusts the 64 default (which must be a member of [[SweepWidths]],
    * enforced below, so its row IS its justification).
    *
    * ONE ADC pass feeds every width: the shared [[pqApproxFrame]]
    * scores are ranked once per query (checkpoint-truncated), the exact
    * rerank join runs once at the WIDEST width, and each sweep row
    * filters the reranked frame by `srank <= w` — a candidate enters at
    * exactly one rank, so the filter is exact. At 100 TB the sweep
    * costs the widest rerank, not |SweepWidths| ADC scans.
    *
    * Determinism: hits/reranked are BIGINT; the ADC rank order rides
    * the varchar-routed double cast of the DECIMAL ADC sum (knnPq's own
    * device) with cand_id ties; recall/reranked_frac are one rounded
    * division each from identical integers.
    *
    * Measured (sf0.01): recall 0.175 / 0.275 / 0.375 / 0.675 at widths
    * 8/16/32/64 — still CLIMBING at the 64 default, no knee inside the
    * swept range: on this corpus the 8-bit ADC scores rank weakly
    * (pq's recall ceiling in `emb_knn_recall` says the same), so a
    * deployment wanting recall here buys width (linear rerank cost),
    * not probes. Recorded so the default is read as "the measured
    * frontier point", not as a converged knee.
    */
  val pqShortlistSweep: CatalogEntry = CatalogEntry(
    "emb_pq_shortlist_sweep",
    (s, d) => {
      import graft.functions.Vectors
      import org.apache.spark.sql.expressions.Window
      val emb = embeddings(s, d)
      val maxW = SweepWidths.max
      val ranked = pqApproxFrame(s, d)
        .withColumn("srank", row_number().over(
          Window.partitionBy("query_id")
            .orderBy(col("ap").cast("double").desc, col("cand_id"))))
        .filter(col("srank") <= maxW)
        .localCheckpoint(eager = true)
      val queriesFull = emb.filter(col("vec_id") < NQueries)
        .select(col("vec_id").as("query_id"), col("embedding").as("qe"))
        .withColumn("qn", Vectors.norm(col("qe")))
      val corpusFull = emb.select(col("vec_id").as("cand_id"), col("embedding").as("ce"))
        .withColumn("cn", Vectors.norm(col("ce")))
      val rer = corpusFull.join(broadcast(ranked), Seq("cand_id"))
        .join(broadcast(queriesFull), Seq("query_id"))
        .select(col("query_id"), col("cand_id"), col("srank"), cosineCol.as("score"))
        .localCheckpoint(eager = true)
      val truth = knnBrute.build(s, d).select(col("query_id"), col("vec_id"))
        .localCheckpoint(eager = true)
      val nTot = emb.agg(count(lit(1)).as("n_corpus"))
      SweepWidths.map { w =>
        val cand = rer.filter(col("srank") <= w)
        val top = topKPerQuery(cand).select(col("query_id"), col("vec_id"))
        val hitsRow = truth
          .join(broadcast(top.withColumn("hit", lit(1))),
            Seq("query_id", "vec_id"), "left")
          .agg(sum(coalesce(col("hit"), lit(0))).cast("long").as("hits"))
        val rerankedRow = cand.agg(count(lit(1)).as("reranked"))
        hitsRow.crossJoin(rerankedRow)
          .select(lit(w.toLong).as("shortlist_c"), col("hits"),
            round(col("hits") / lit((NQueries * K).toDouble), 6).as("recall"),
            col("reranked"))
      }.reduce(_ unionByName _)
        .crossJoin(broadcast(nTot))
        .select(col("shortlist_c"), col("hits"), col("recall"), col("reranked"),
          round(col("reranked") /
            (lit(NQueries.toLong) * (col("n_corpus") - 1L)), 6).as("reranked_frac"))
        .orderBy("shortlist_c")
    },
    Some {
      val maxW = SweepWidths.max
      val widthVals = SweepWidths.map(w => s"($w)").mkString(", ")
      s"""WITH $pqAdcOracleCtes,
            ranked AS (SELECT query_id, cand_id, rn AS srank FROM (
                         SELECT query_id, cand_id,
                                row_number() OVER (PARTITION BY query_id
                                  ORDER BY CAST(CAST(ap AS VARCHAR) AS DOUBLE) DESC, cand_id) AS rn
                         FROM approx) WHERE rn <= $maxW),
            rer AS (SELECT r.query_id, r.cand_id, r.srank, $cosineSql AS score
                    FROM ranked r JOIN embeddings c ON c.vec_id = r.cand_id
                         JOIN embeddings q ON q.vec_id = r.query_id),
            brute AS (SELECT query_id, vec_id FROM ($bruteOracleSql) tb),
            ws(w) AS (SELECT * FROM (VALUES $widthVals) v(w)),
            topk AS (SELECT w, query_id, cand_id FROM (
                       SELECT ws.w, r.query_id, r.cand_id,
                              row_number() OVER (PARTITION BY ws.w, r.query_id
                                                 ORDER BY r.score DESC, r.cand_id) AS rn
                       FROM ws JOIN rer r ON r.srank <= ws.w) WHERE rn <= $K),
            h AS (SELECT ws.w, CAST(SUM(CASE WHEN t.cand_id IS NULL THEN 0 ELSE 1 END) AS BIGINT) AS hits
                  FROM ws CROSS JOIN brute b
                  LEFT JOIN topk t ON t.w = ws.w AND t.query_id = b.query_id
                                  AND t.cand_id = b.vec_id
                  GROUP BY ws.w),
            rc AS (SELECT ws.w, CAST(COUNT(*) AS BIGINT) AS reranked
                   FROM ws JOIN ranked r ON r.srank <= ws.w GROUP BY ws.w),
            n AS (SELECT COUNT(*) AS n_corpus FROM embeddings)
          SELECT CAST(h.w AS BIGINT) AS shortlist_c, h.hits,
                 ROUND(CAST(h.hits AS DOUBLE) / ${NQueries * K}, 6) AS recall,
                 rc.reranked,
                 ROUND(CAST(rc.reranked AS DOUBLE) / ($NQueries * (n.n_corpus - 1)), 6) AS reranked_frac
          FROM h JOIN rc ON rc.w = h.w CROSS JOIN n
          ORDER BY shortlist_c"""
    })

  /** The k-means model sweep of [[kmeansElbow]]: the committed quantizers
    * at k ∈ {2, 4, 8, 16}, each KMeans.fit(sf0.01 embeddings, iters = 5,
    * init = first k vectors) frozen by graft.tools.TrainIvf exactly like
    * [[IvfCentroids.kmeans16]].
    */
  private def elbowModels: Seq[(Int, Seq[(Int, Array[Double])])] = Seq(
    2 -> IvfCentroids.kmeans2, 4 -> IvfCentroids.kmeans4,
    8 -> IvfCentroids.kmeans8, 16 -> IvfCentroids.kmeans16)

  /** The coarse-quantizer SIZE knob measured in-catalog — the elbow
    * curve (inertia vs k) plus the cell-balance evidence that prices
    * every IVF-family trade this catalog makes: more cells = smaller
    * scanned fraction per probe but a weaker per-cell recall ceiling
    * ([[ivfProbeSweep]]'s axis), and an UNBALANCED quantizer silently
    * loses both (one fat cell re-creates brute force for its residents).
    * One row per committed model k ∈ {2,4,8,16}: total inertia (the
    * Lloyd's objective, exact on the ×10⁶ lattice), mean d², cells
    * actually used, the largest cell's population, and `scan_frac` =
    * Σ|cell|²/n² — the expected per-item corpus fraction any in-cell
    * pair stage touches ([[hubness]]/[[intrinsicDim]]'s served-graph
    * joins, one-probe IVF under a uniform query mix), the in-catalog
    * number behind the "k grows with the corpus so Σ|cell|² stays
    * bounded" production claim (r16 verdict item).
    *
    * Determinism: per-row min-distance² is KMeans.sqDist's fixed
    * |v|²−2v·c+|c|² expression (left-fold dots, centroid literals —
    * bit-identical in both engines, the [[knnIvfKmeans]] device), ROUND
    * 6 then DECIMAL(18,6)→×10⁶→BIGINT ([[pqDistortion]]'s lattice), so
    * the corpus sum is exact-integer and order-free; mean_d2 is one
    * closing derive.
    *
    * 100 TB shape: ONE corpus scan computes all four assignments
    * per row (argmin over centroid LITERALS — zero shuffles, no
    * centroid join); the explode emits 4 tiny (k, cell, d2s) structs
    * per row straight into a map-combined (k, cell) aggregate, so
    * shuffle volume is partitions × Σk cells regardless of corpus
    * size; the per-k rollup is models-sized. The sweep costs ONE pass
    * no matter how many models it prices.
    */
  val kmeansElbow: CatalogEntry = CatalogEntry(
    "emb_kmeans_elbow",
    (s, d) => {
      val perK = elbowModels.map { case (k, model) =>
        val c0 = graft.operators.KMeans.sortedCells(col("embedding"), model).getItem(0)
        struct(lit(k.toLong).as("k"),
          c0.getField("cid").cast("long").as("cell"),
          (round(c0.getField("d"), 6).cast("decimal(18,6)") * 1000000)
            .cast("long").as("d2s"))
      }
      embeddings(s, d)
        .select(explode(array(perK: _*)).as("a"))
        .select(col("a.k").as("k"), col("a.cell").as("cell"), col("a.d2s").as("d2s"))
        .groupBy("k", "cell")
        .agg(count(lit(1)).as("n"), sum("d2s").as("ds"))
        .groupBy("k")
        // Σ|cell|² in DECIMAL(38,0): per-cell n² crosses 2⁶³ once a cell
        // holds > 3·10⁹ vectors — routine at fleet scale (and exactly
        // the fat-cell regime this diagnostic exists to catch).
        .agg(sum("n").as("n_vectors"), count(lit(1)).as("cells_used"),
          max("n").as("max_cell_n"), sum("ds").as("inertia_scaled"),
          sum(col("n").cast("decimal(38,0)") * col("n")).as("sum_n2"))
        .select(col("k"), col("n_vectors"), col("cells_used"), col("max_cell_n"),
          col("inertia_scaled"),
          round(col("inertia_scaled").cast("double")
            / (col("n_vectors") * lit(1000000.0)), 6).as("mean_d2"),
          // The quadratic-bound instrument: Σ|cell|²/n² is the expected
          // fraction of the corpus an in-cell pair stage (emb_hubness /
          // emb_intrinsic_dim's served-graph topology, or one-probe IVF
          // under a uniform query mix) touches per item — the number
          // the "k grows with corpus so Σ|cell|² stays bounded"
          // production claim is audited against, measured per k off the
          // same single scan.
          round(col("sum_n2").cast("double")
            / (col("n_vectors").cast("decimal(38,0)") * col("n_vectors"))
              .cast("double"), 6).as("scan_frac"))
        .orderBy("k")
    },
    Some {
      val encCtes = elbowModels.map { case (k, model) =>
        val centRows = model.map { case (cid, c) =>
          val lst = c.mkString("[", ", ", "]")
          val cn2 = c.map(x => x * x).sum // same Scala left fold as the Spark literal
          s"($cid, $lst, $cn2)"
        }.mkString(", ")
        val distE = s"${dotSql("e.embedding", "e.embedding")} - 2.0 * ${dotSql("e.embedding", "c.cemb")} + c.cn2"
        s"""cent$k(cid, cemb, cn2) AS (SELECT * FROM (VALUES $centRows) v(cid, cemb, cn2)),
            enc$k AS (SELECT cell, CAST(CAST(ROUND(d, 6) AS DECIMAL(18,6)) * 1000000 AS BIGINT) AS d2s FROM (
                        SELECT e.vec_id, c.cid AS cell, $distE AS d,
                               row_number() OVER (PARTITION BY e.vec_id ORDER BY $distE, c.cid) AS rn
                        FROM embeddings e CROSS JOIN cent$k c) WHERE rn = 1)"""
      }.mkString(",\n            ")
      val union = elbowModels.map { case (k, _) =>
        s"SELECT $k AS k, cell, d2s FROM enc$k"
      }.mkString(" UNION ALL ")
      s"""WITH $encCtes,
            un AS ($union),
            bycell AS (SELECT k, cell, CAST(COUNT(*) AS BIGINT) AS n,
                              CAST(SUM(d2s) AS BIGINT) AS ds
                       FROM un GROUP BY 1, 2)
          SELECT CAST(k AS BIGINT) AS k, CAST(SUM(n) AS BIGINT) AS n_vectors,
                 COUNT(*) AS cells_used, CAST(MAX(n) AS BIGINT) AS max_cell_n,
                 CAST(SUM(ds) AS BIGINT) AS inertia_scaled,
                 ROUND(CAST(SUM(ds) AS DOUBLE) / (CAST(SUM(n) AS BIGINT) * 1000000.0), 6) AS mean_d2,
                 -- HUGEINT products mirror the Spark side's DECIMAL(38,0):
                 -- per-cell n^2 (and n_vectors^2 in the denominator) cross
                 -- 2^63 in exactly the fat-cell regime this column exists
                 -- to diagnose, and a BIGINT product would make DuckDB
                 -- raise where Spark still answers (r17 advice).
                 ROUND(CAST(SUM(CAST(n AS HUGEINT) * n) AS DOUBLE)
                       / CAST(CAST(SUM(n) AS HUGEINT) * SUM(n) AS DOUBLE), 6) AS scan_frac
          FROM bycell GROUP BY k ORDER BY k"""
    })

  /** Reciprocal Rank Fusion (Cormack, Clarke & Büttcher 2009) of two
    * structurally different indexes — the standard result-merging layer
    * a production retrieval stack puts over heterogeneous retrievers:
    * per (query, candidate), rrf = Σ_lists 1/(60 + rank), fused top-K by
    * that score. Fused here: the data-independent LSH index and the
    * trained IVF index, whose failure modes are uncorrelated — exactly
    * the case RRF improves on either member.
    *
    * Determinism: each 1/(60+rank) term rides the integer lattice
    * `10⁹ div (60+rank)` (positive operands, so Spark `div` and DuckDB
    * `//` agree) and the fused score is the exact BIGINT sum — no float
    * ever; ties break on vec_id. Cost: the two member shortlists (K
    * rows per query each) + one (query, cand)-keyed sum — no corpus
    * pass of its own.
    */
  val rankFusion: CatalogEntry = CatalogEntry(
    "emb_rank_fusion",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val parts = Seq(knnLsh, knnIvfKmeans).map { e =>
        e.build(s, d).select(col("query_id"), col("vec_id"),
          expr("cast(1000000000 div (60 + rn) as bigint)").as("t"))
      }
      parts.reduce(_ unionByName _)
        .groupBy("query_id", "vec_id")
        .agg(sum("t").as("rrf_scaled"))
        .withColumn("rn", row_number().over(
          Window.partitionBy("query_id")
            .orderBy(desc("rrf_scaled"), col("vec_id"))).cast("long"))
        .filter(col("rn") <= K)
        .orderBy("query_id", "rn")
    },
    Some(
      s"""WITH lsh AS (SELECT query_id, vec_id, rn FROM ($lshOracleSql) t1),
            ivfk AS (SELECT query_id, vec_id, rn FROM (${knnIvfKmeans.oracle.get}) t2),
            u AS (SELECT query_id, vec_id, 1000000000 // (60 + rn) AS t FROM lsh
                  UNION ALL
                  SELECT query_id, vec_id, 1000000000 // (60 + rn) FROM ivfk),
            f AS (SELECT query_id, vec_id, CAST(SUM(t) AS BIGINT) AS rrf_scaled
                  FROM u GROUP BY 1, 2)
          SELECT query_id, vec_id, rrf_scaled, CAST(rn AS BIGINT) AS rn FROM (
            SELECT query_id, vec_id, rrf_scaled,
                   row_number() OVER (PARTITION BY query_id
                                      ORDER BY rrf_scaled DESC, vec_id) AS rn
            FROM f) WHERE rn <= $K
          ORDER BY query_id, rn"""))

  /** Kendall rank agreement between the two fused retrievers (Kendall
    * 1938; τ-a over the tie-free shortlist ranks) — the diagnostic that
    * belongs NEXT TO [[rankFusion]]: RRF helps exactly when its members
    * disagree (uncorrelated failure modes), and this entry measures
    * that premise per query instead of assuming it. For each query, the
    * items BOTH shortlists retrieved, with concordant/discordant pair
    * counts between the two rank orders and τ = (C − D)/(m(m−1)/2);
    * queries whose shortlists share < 2 items report a NULL τ (no pair
    * evidence) in both engines — never a fabricated 0.
    *
    * Determinism: ranks are exact BIGINTs from the member entries'
    * already-pinned tie-breaks; pair orientation is the integer sign of
    * (ra_i − ra_j)·(rb_i − rb_j) (shortlist ranks ≤ K, no overflow);
    * m(m−1) div 2 has positive operands (Spark div = DuckDB //); τ is
    * ONE double division, ROUND 6.
    *
    * Scale shape: the two member shortlists are K rows per query; the
    * overlap join keys on (query, item); the pair stage is a per-query
    * self-join of ≤ K common rows — ≤ K(K−1)/2 = 45 pairs per query,
    * query-bounded, no corpus pass of its own (the members' corpus
    * stages are the family's, already streamed — streamingIvfCells).
    */
  val rankAgreement: CatalogEntry = CatalogEntry(
    "emb_rank_agreement",
    (s, d) => {
      val a = knnLsh.build(s, d)
        .select(col("query_id"), col("vec_id"), col("rn").as("ra"))
      val b = knnIvfKmeans.build(s, d)
        .select(col("query_id"), col("vec_id"), col("rn").as("rb"))
      // K rows per query after the overlap join — checkpoint so the two
      // member pipelines run once, not once per downstream branch.
      val common = a.join(b, Seq("query_id", "vec_id"))
        .localCheckpoint(eager = true)
      val pairs = common.as("x")
        .join(common.as("y"),
          col("x.query_id") === col("y.query_id") &&
            col("x.vec_id") < col("y.vec_id"))
        .select(col("x.query_id").as("query_id"),
          ((col("x.ra") - col("y.ra")) * (col("x.rb") - col("y.rb"))).as("prod"))
        .groupBy("query_id")
        .agg(sum(when(col("prod") > 0L, 1L).otherwise(0L)).as("concordant"),
          sum(when(col("prod") < 0L, 1L).otherwise(0L)).as("discordant"))
      common.groupBy("query_id").agg(count(lit(1)).as("n_common"))
        .join(pairs, Seq("query_id"), "left")
        .select(col("query_id"), col("n_common"),
          coalesce(col("concordant"), lit(0L)).as("concordant"),
          coalesce(col("discordant"), lit(0L)).as("discordant"),
          when(col("n_common") >= 2L,
            round((coalesce(col("concordant"), lit(0L))
              - coalesce(col("discordant"), lit(0L))).cast("double")
              / expr("(n_common * (n_common - 1)) div 2"), 6)).as("tau"))
        .orderBy("query_id")
    },
    Some(
      s"""WITH lsh AS (SELECT query_id, vec_id, rn AS ra FROM ($lshOracleSql) t1),
            ivfk AS (SELECT query_id, vec_id, rn AS rb FROM (${knnIvfKmeans.oracle.get}) t2),
            common AS (SELECT lsh.query_id, lsh.vec_id, ra, rb
                       FROM lsh JOIN ivfk ON ivfk.query_id = lsh.query_id
                            AND ivfk.vec_id = lsh.vec_id),
            prs AS (SELECT x.query_id,
                           CAST(SUM(CASE WHEN (x.ra - y.ra) * (x.rb - y.rb) > 0
                                         THEN 1 ELSE 0 END) AS BIGINT) AS concordant,
                           CAST(SUM(CASE WHEN (x.ra - y.ra) * (x.rb - y.rb) < 0
                                         THEN 1 ELSE 0 END) AS BIGINT) AS discordant
                    FROM common x JOIN common y ON y.query_id = x.query_id
                         AND x.vec_id < y.vec_id
                    GROUP BY x.query_id),
            nc AS (SELECT query_id, CAST(COUNT(*) AS BIGINT) AS n_common
                   FROM common GROUP BY query_id)
          SELECT nc.query_id, n_common,
                 COALESCE(concordant, 0) AS concordant,
                 COALESCE(discordant, 0) AS discordant,
                 CASE WHEN n_common >= 2
                      THEN ROUND(CAST(COALESCE(concordant, 0) - COALESCE(discordant, 0) AS DOUBLE)
                                 / ((n_common * (n_common - 1)) // 2), 6)
                 END AS tau
          FROM nc LEFT JOIN prs ON prs.query_id = nc.query_id
          ORDER BY nc.query_id"""))

  /** Power-iteration fixed point: [[PcaIters]] matvec steps on the
    * [[gramMatrix]] lattice (integers end-to-end), direction re-scaled to
    * ∞-norm [[PcaScale]] each step by a TRUNCATING division — BigInt `/`
    * in Scala and `//` in DuckDB both truncate toward zero, so the two
    * engines walk bit-identical integer vectors. Embedding coordinates
    * re-enter the projection on their own [[PcaProjScale]] lattice.
    */
  private val PcaIters = 8
  private val PcaScale = 10000L
  private val PcaProjScale = "1000000"

  /** The fixed-point dominant direction (∞-norm [[PcaScale]]) — ONE
    * corpus pass (lattice Gram) + BigInt power iteration on the collected
    * dim×dim summary. Shared by [[pcaProject]] and [[abttResidual]] so
    * the two entries walk the identical integer vector.
    */
  private def pcaDirection(emb: DataFrame): Array[BigInt] = {
    val agg = udaf(new graft.combine.OuterProductAgg(Dim, GramScale))
    val cells = emb.agg(agg(col("embedding")).as("t"))
      .select(col("t.cells")).head().getSeq[Long](0)
    // Symmetrize the upper triangle: idx(i≤j) = Σ_{r<i}(dim−r) + (j−i).
    def tri(i: Int, j: Int): Long = {
      val (a, b) = if (i <= j) (i, j) else (j, i)
      cells(a * Dim - a * (a - 1) / 2 + (b - a))
    }
    var v = Array.fill(Dim)(BigInt(PcaScale))
    (1 to PcaIters).foreach { _ =>
      val w = Array.tabulate(Dim)(i =>
        (0 until Dim).map(j => BigInt(tri(i, j)) * v(j)).sum)
      val m = w.map(_.abs).max
      if (m > 0) v = w.map(x => x * PcaScale / m) // BigInt /: truncates, = DuckDB //
    }
    v
  }

  /** Per-row integer lattice dot with the broadcast direction literal —
    * Σ_d floor(x_d·[[PcaProjScale]] + 0.5) · v_d as one codegen'd
    * zip_with/aggregate expression (shuffle-free).
    */
  private def latticeDot(v: Array[BigInt]): org.apache.spark.sql.Column =
    aggregate(
      zip_with(col("embedding"), typedlit(v.map(_.toLong).toSeq), (x, vv) =>
        floor(x.cast("double") * lit(1000000.0) + lit(0.5)).cast("long") * vv),
      lit(0L), (acc, t) => acc + t)

  /** Oracle prefix shared by the pcaProject / abttResidual oracles: the
    * lattice Gram CTE, v0, and the [[PcaIters]] unrolled power-step
    * triples, ending in `v$PcaIters` — single source so the two SQL
    * iterations cannot drift apart.
    */
  private lazy val pcaCtesSql: String = {
    val steps = (1 to PcaIters).map { k =>
      val prev = if (k == 1) "v0" else s"v${k - 1}"
      // The m > 0 CASE mirrors pcaDirection's `if (m > 0)` guard: an
      // all-zero Gram corpus keeps the previous vector in BOTH engines
      // instead of erroring (÷0) here while Spark keeps the prior v.
      // The previous value rides through w$k as `pv` (the g row with
      // j = i carries p.v for i) — v$k referencing $prev directly would
      // add a second $prev subtree per step and, under CTE inlining,
      // turn the 8-step unroll from 2^8 into 3^8 Gram-scan copies.
      s"""w$k AS (SELECT g.i AS i, SUM(g.gg * p.v) AS w,
                         MAX(CASE WHEN g.j = g.i THEN p.v END) AS pv
                  FROM g JOIN $prev p ON p.i = g.j GROUP BY g.i),
           m$k AS (SELECT MAX(ABS(w)) AS m FROM w$k),
           v$k AS (SELECT i,
                          CASE WHEN m > 0
                               THEN (CAST(w AS HUGEINT) * $PcaScale) // m
                               ELSE pv END AS v
                   FROM w$k, m$k)"""
    }.mkString(",\n             ")
    s"""g AS (SELECT t1.i AS i, t2.j AS j,
                     SUM(CAST(FLOOR(CAST(e.embedding[i+1] AS DOUBLE)
                                    * CAST(e.embedding[j+1] AS DOUBLE)
                                    * $GramScale + 0.5) AS HUGEINT)) AS gg
              FROM embeddings e, range(0, $Dim) t1(i), range(0, $Dim) t2(j)
              GROUP BY 1, 2),
      v0 AS (SELECT i, CAST($PcaScale AS HUGEINT) AS v FROM range(0, $Dim) t(i)),
      $steps"""
  }

  /** Per-vector lattice moments against the final direction, as SQL:
    * B = Σ_d E_d·v_d (the projection dot) joined per (vec, dim). */
  private lazy val pcaDotSql: String =
    s"""SELECT e.vec_id, e.label,
               SUM(CAST(FLOOR(CAST(e.embedding[t.d+1] AS DOUBLE)
                              * $PcaProjScale + 0.5) AS HUGEINT) * vf.v) AS b
        FROM embeddings e, range(0, $Dim) t(d)
        JOIN v$PcaIters vf ON vf.i = t.d
        GROUP BY e.vec_id, e.label"""

  /** Leading-principal-component projection — the "all-but-the-top"
    * whitening signal (Mu & Viswanath 2018: dominant directions of an
    * embedding cloud carry corpus-level, not semantic, information; ABTT
    * removes them) and the 1-D PCA curriculum/outlier axis. Each vector
    * reports its coordinate `pc1` along the dominant eigenvector of the
    * un-centered Gram matrix, computed as:
    *
    *  1. ONE distributed pass: the [[OuterProductAgg]] lattice Gram —
    *     dim(dim+1)/2 exact Longs, map-side combined (the gramMatrix
    *     entry's aggregate, reused);
    *  2. driver-side power iteration on that FIXED dim×dim summary —
    *     scale-independent state like a collected AQE statistic, O(k·dim²)
    *     BigInt work, NOT a per-row driver loop;
    *  3. ONE distributed projection: per-row integer dot of the lattice
    *     embedding with the broadcast integer direction, inside
    *     whole-stage codegen (zip_with/aggregate — no shuffle, no UDF).
    *
    * Exactness: every arithmetic step through the final dot product is
    * integer (lattice floor-snaps, BigInt/HUGEINT matvecs, truncating
    * rescale); the single closing division by lattice²  is one
    * correctly-rounded IEEE op. The oracle replays the identical
    * iteration as [[PcaIters]] unrolled CTE triples (matvec, ∞-norm,
    * rescale) — the PageRank unroll device, here over a 64-row vector
    * table. At 100 TB only step 1 touches the corpus.
    */
  val pcaProject: CatalogEntry = CatalogEntry(
    "emb_pca_project",
    (s, d) => {
      val emb = embeddings(s, d)
      val v = pcaDirection(emb)
      emb.select(col("vec_id"), col("label").cast("long").as("label"),
          round(latticeDot(v).cast("double") / lit(1.0e10), 6).as("pc1"))
        .orderBy("vec_id")
    },
    Some(s"""WITH $pcaCtesSql,
             dots AS ($pcaDotSql)
           SELECT vec_id, CAST(label AS BIGINT) AS label,
                  ROUND(CAST(b AS DOUBLE) / 1.0E10, 6) AS pc1
           FROM dots
           ORDER BY vec_id"""))

  /** All-but-the-top residual norm — the "remove" half of ABTT (Mu &
    * Viswanath 2018): per vector, the L2 norm of `e − (e·v̂)v̂`, i.e.
    * what remains after deleting the [[pcaProject]] component. Low
    * residual = the vector IS mostly the corpus-common direction
    * (boilerplate/frequency artifacts — prune or re-embed); the
    * distribution is the whitening diagnostic.
    *
    * Arithmetic: three integer lattice moments per row — A = Σ E_d²
    * (one shuffle-free projection), B = Σ E_d·v_d (the shared
    * [[latticeDot]]), C = Σ v_d² (a driver-side constant of the
    * direction) — then residual² = (A − B²/C)/1e12 evaluated with ONE
    * fixed IEEE op sequence (÷, ×, −, ÷, √: each correctly rounded on
    * bit-identical inputs, so both engines land the same double;
    * `greatest(0)` guards the all-top vector whose residual is exactly
    * 0 from − ulp noise). Corpus cost beyond the Gram pass: one
    * codegen'd projection, no shuffle, no join.
    */
  val abttResidual: CatalogEntry = CatalogEntry(
    "emb_abtt_residual",
    (s, d) => {
      val emb = embeddings(s, d)
      val v = pcaDirection(emb)
      val cNorm = v.map(x => x * x).sum.toLong // Σ v_d² ≤ 64·1e8 — Long-safe
      val aMom = aggregate(
        transform(col("embedding"), x =>
          graft.functions.Text.bound(
            floor(x.cast("double") * lit(1000000.0) + lit(0.5)).cast("long")) {
            e => e * e
          }),
        lit(0L), (acc, t) => acc + t)
      val bMom = latticeDot(v)
      val r2 = (aMom.cast("double") -
        (bMom.cast("double") / lit(cNorm.toDouble)) * bMom.cast("double")) /
        lit(1.0e12)
      emb.select(col("vec_id"), col("label").cast("long").as("label"),
          round(sqrt(greatest(r2, lit(0.0))), 6).as("resid_norm"))
        .orderBy("vec_id")
    },
    Some {
      val eLat = s"CAST(FLOOR(CAST(e.embedding[t.d+1] AS DOUBLE) * $PcaProjScale + 0.5) AS HUGEINT)"
      s"""WITH $pcaCtesSql,
             cn AS (SELECT SUM(v * v) AS c FROM v$PcaIters),
             dots AS ($pcaDotSql),
             amom AS (SELECT e.vec_id, SUM($eLat * $eLat) AS a
                      FROM embeddings e, range(0, $Dim) t(d)
                      GROUP BY e.vec_id)
           SELECT d.vec_id, CAST(d.label AS BIGINT) AS label,
                  ROUND(SQRT(GREATEST(
                    (CAST(a AS DOUBLE)
                     - (CAST(b AS DOUBLE) / CAST(c AS DOUBLE)) * CAST(b AS DOUBLE))
                    / 1.0E12, 0.0)), 6) AS resid_norm
           FROM dots d JOIN amom USING (vec_id) CROSS JOIN cn
           ORDER BY d.vec_id"""
    })

  /** Hard-negative mining — for EVERY vector, the most similar vector
    * with a DIFFERENT label: the pair a contrastive/metric-learning run
    * trains against (easy negatives teach nothing; the near-boundary
    * ones carry the gradient). Ties pin to the smallest candidate id
    * AFTER the 6-dp rounding both engines share, so the argmax is
    * deterministic; the argmax itself is one struct-max aggregate
    * (map-side combined — ≤1 candidate ships per partition per query),
    * never a rank window over the full score list.
    *
    * BASELINE shape, deliberately: all-pairs cross-label scan, the exact
    * authority the approximate path is measured against (the
    * emb_near_dup / emb_near_dup_banded split). The fleet-scale form IS
    * implemented: [[hardNegativesShortlist]] (`emb_hard_negatives_shortlist`)
    * mines from the banded-LSH candidate stage with the label filter
    * pushed into the collision join, and [[hardNegativesRecall]]
    * (`emb_hard_negatives_recall`) measures its coverage/agreement
    * against this baseline.
    */
  val hardNegatives: CatalogEntry = CatalogEntry(
    "emb_hard_negatives",
    (s, d) => {
      val emb = embeddings(s, d)
      val queries = emb.select(col("vec_id").as("query_id"),
          col("label").as("qlabel"), col("embedding").as("qe"))
        .withColumn("qn", graft.functions.Vectors.norm(col("qe")))
      val corpus = emb.select(col("vec_id").as("cand_id"),
          col("label").as("cand_label"), col("embedding").as("ce"))
        .withColumn("cn", graft.functions.Vectors.norm(col("ce")))
      corpus.join(broadcast(queries), col("cand_label") =!= col("qlabel"))
        .select(col("query_id"), col("qlabel"), col("cand_id"),
          col("cand_label"), cosineCol.as("score"))
        .groupBy(col("query_id").as("vec_id"),
          col("qlabel").cast("long").as("label"))
        .agg(max(struct(col("score").as("s"), (-col("cand_id")).as("nc"),
          col("cand_label").cast("long").as("nl"))).as("m"))
        .select(col("vec_id"), col("label"), (-col("m.nc")).as("neg_id"),
          col("m.nl").as("neg_label"), col("m.s").as("score"))
        .orderBy("vec_id")
    },
    Some(s"WITH $hnExactCte SELECT vec_id, label, neg_id, neg_label, score" +
      " FROM hnexact ORDER BY vec_id"))

  /** Deterministic tie-pinned cross-label argmax over a candidate set:
    * the `WHERE rn = 1` mined-negative CTE shared by the exact oracle
    * (candidates = every cross-label pair), the shortlist oracle
    * (candidates = banded-LSH collisions), and both of the recall
    * oracle's branches — one definition so the argmax tie rule cannot
    * drift between the baseline and its scale sibling.
    */
  private def hnArgmaxSql(cteName: String, fromCands: String): String =
    s"""$cteName AS (SELECT vec_id, label, neg_id, neg_label, score FROM (
          SELECT q.vec_id AS vec_id, CAST(q.label AS BIGINT) AS label,
                 c.vec_id AS neg_id, CAST(c.label AS BIGINT) AS neg_label,
                 $cosineSql AS score,
                 row_number() OVER (PARTITION BY q.vec_id
                                    ORDER BY $cosineSql DESC, c.vec_id) AS rn
          FROM $fromCands)
        WHERE rn = 1)"""

  /** Exact-baseline CTE: all-pairs cross-label candidates. */
  private lazy val hnExactCte: String =
    hnArgmaxSql("hnexact", "embeddings q JOIN embeddings c ON c.label != q.label")

  /** Shortlist CTE block: banded-LSH candidate generation (the
    * [[nearDupBanded]] tables, directional, label filter in the collision
    * join) feeding the shared argmax.
    */
  private lazy val hnShortCtes: String = {
    val bucketCols = (0 until BandTables)
      .map(t => s"${bucketExprFor(bandedSigns(t), "embedding", oneBased = true)} AS b$t")
      .mkString(", ")
    val collide = (0 until BandTables).map(t => s"a.b$t = b.b$t").mkString(" OR ")
    s"""hnbuck AS (SELECT vec_id, label, embedding, $bucketCols FROM embeddings),
        hncand AS (SELECT DISTINCT a.vec_id AS query_id, b.vec_id AS cand_id
                   FROM hnbuck a JOIN hnbuck b
                     ON ($collide) AND a.vec_id != b.vec_id AND a.label != b.label),
        ${hnArgmaxSql("hnshort",
          """hncand h JOIN embeddings q ON q.vec_id = h.query_id
                      JOIN embeddings c ON c.vec_id = h.cand_id""")}"""
  }

  /** Shortlist-composed hard-negative mining — the fleet-scale form of
    * [[hardNegatives]]: candidates come from the banded-LSH collision
    * stage (the [[nearDupBanded]] tables — `BandTables` independent
    * `BandPlanes`-plane hash tables), with the cross-label filter pushed
    * INTO the collision join, then the SAME tie-pinned struct-max argmax
    * the exact baseline runs, over the shortlist only.
    *
    * 100 TB shape (the emb_near_dup → emb_near_dup_banded split, applied
    * to mining): the collision self-join shuffles only (vec_id, label,
    * table, bucket) tuples — never vectors — keyed on (table, bucket), so
    * pair work is Σ_tables n²/2^planes ≈ n²/64 instead of the baseline's
    * label-complement n² broadcast scan, and both knobs (planes ↓ bucket
    * size, tables ↑ recall) scale independently. Vectors join back to the
    * DISTINCT candidate pairs by id for exact scoring; the argmax is
    * map-side combined (≤1 candidate ships per partition per query).
    * Recall vs the exact baseline is MEASURED, not guessed —
    * [[hardNegativesRecall]] reports per-label coverage/agreement/gap.
    * Vectors the bands never pair cross-label are absent here (the
    * documented approximate trade; coverage quantifies it).
    */
  val hardNegativesShortlist: CatalogEntry = CatalogEntry(
    "emb_hard_negatives_shortlist",
    (s, d) => {
      import graft.functions.Vectors
      val emb = embeddings(s, d).cacheOnce() // feeds bands + both scoring joins
      val bands = emb.select(col("vec_id"), col("label"),
        posexplode(Vectors.hyperplaneBuckets(col("embedding"), bandedSigns)).as(Seq("t", "b")))
      val cand = bands.as("a").join(bands.as("b"),
          col("a.t") === col("b.t") && col("a.b") === col("b.b") &&
            col("a.vec_id") =!= col("b.vec_id") && col("a.label") =!= col("b.label"))
        .select(col("a.vec_id").as("query_id"), col("b.vec_id").as("cand_id"))
        .distinct()
      val withNorm = emb.withColumn("nrm", Vectors.norm(col("embedding")))
      cand
        .join(withNorm.select(col("vec_id").as("query_id"), col("label").as("qlabel"),
          col("embedding").as("qe"), col("nrm").as("qn")), Seq("query_id"))
        .join(withNorm.select(col("vec_id").as("cand_id"), col("label").as("cand_label"),
          col("embedding").as("ce"), col("nrm").as("cn")), Seq("cand_id"))
        .select(col("query_id"), col("qlabel"), col("cand_id"),
          col("cand_label"), cosineCol.as("score"))
        .groupBy(col("query_id").as("vec_id"),
          col("qlabel").cast("long").as("label"))
        .agg(max(struct(col("score").as("s"), (-col("cand_id")).as("nc"),
          col("cand_label").cast("long").as("nl"))).as("m"))
        .select(col("vec_id"), col("label"), (-col("m.nc")).as("neg_id"),
          col("m.nl").as("neg_label"), col("m.s").as("score"))
        .orderBy("vec_id")
    },
    Some(s"WITH $hnShortCtes SELECT vec_id, label, neg_id, neg_label, score" +
      " FROM hnshort ORDER BY vec_id"))

  /** Shortlist-mining quality measured as data (the [[knnRecall]] device
    * applied to [[hardNegativesShortlist]]): per label, how many vectors
    * the banded shortlist mined at all (coverage), how often it found the
    * EXACT hardest negative (agreement), and the mean similarity it gave
    * up when it didn't (mean_gap, over mined vectors — decimal-summed so
    * the mean is partition-order-free). Both pipelines are deterministic,
    * so the report is oracle-checkable; cost is the two underlying runs
    * plus a |vectors|-sized join — never a third corpus pass.
    */
  val hardNegativesRecall: CatalogEntry = CatalogEntry(
    "emb_hard_negatives_recall",
    (s, d) => {
      import org.apache.spark.sql.types.DecimalType
      val exact = hardNegatives.build(s, d)
        .select(col("vec_id"), col("label"), col("neg_id").as("exact_neg"),
          col("score").as("exact_score"))
      val short = hardNegativesShortlist.build(s, d)
        .select(col("vec_id"), col("neg_id").as("short_neg"),
          col("score").as("short_score"))
      exact.join(short, Seq("vec_id"), "left")
        .groupBy("label")
        .agg(count(lit(1)).as("n_vecs"),
          count(col("short_neg")).as("n_mined"),
          sum(when(col("short_neg") === col("exact_neg"), 1).otherwise(0))
            .cast("long").as("n_exact_match"),
          sum(when(col("short_neg").isNotNull,
            col("exact_score").cast(DecimalType(18, 6))
              - col("short_score").cast(DecimalType(18, 6)))).as("gapsum"))
        .select(col("label"), col("n_vecs"), col("n_mined"), col("n_exact_match"),
          round(col("n_mined").cast("double") / col("n_vecs"), 6).as("coverage"),
          round(col("n_exact_match").cast("double") / col("n_vecs"), 6).as("agreement"),
          round(col("gapsum").cast("double") / col("n_mined"), 6).as("mean_gap"))
        .orderBy("label")
    },
    Some(s"""WITH $hnExactCte,
                  $hnShortCtes
             SELECT e.label, COUNT(*) AS n_vecs,
                    COUNT(s.neg_id) AS n_mined,
                    CAST(SUM(CASE WHEN s.neg_id = e.neg_id THEN 1 ELSE 0 END)
                         AS BIGINT) AS n_exact_match,
                    ROUND(COUNT(s.neg_id) / CAST(COUNT(*) AS DOUBLE), 6) AS coverage,
                    ROUND(SUM(CASE WHEN s.neg_id = e.neg_id THEN 1 ELSE 0 END)
                          / CAST(COUNT(*) AS DOUBLE), 6) AS agreement,
                    ROUND(CAST(SUM(CASE WHEN s.neg_id IS NOT NULL
                                        THEN CAST(e.score AS DECIMAL(18,6))
                                             - CAST(s.score AS DECIMAL(18,6)) END)
                               AS DOUBLE) / COUNT(s.neg_id), 6) AS mean_gap
             FROM hnexact e LEFT JOIN hnshort s USING (vec_id)
             GROUP BY e.label ORDER BY e.label"""))

  /** Label-noise audit: near-duplicate vector pairs whose LABELS
    * disagree — near-identical content carrying conflicting annotations
    * is the classic label-noise signature (the pair-level signal
    * confident-learning methods aggregate), and the cheapest
    * high-precision review queue an annotation pipeline gets: every
    * flagged pair is two concrete examples an annotator can adjudicate.
    * Complements [[centroidOutliers]] (distribution-level suspicion)
    * with pair-level evidence. Rides [[nearDupCosine]]'s bucketed
    * candidate stage verbatim (oracle included); labels attach via two
    * id-keyed joins — at fleet scale the label rides the LSH
    * projection's own columns instead.
    */
  val labelNoisePairs: CatalogEntry = CatalogEntry(
    "emb_label_noise_pairs",
    (s, d) => {
      val lab = embeddings(s, d).select(col("vec_id"), col("label"))
      nearDupCosine.build(s, d)
        .join(lab.select(col("vec_id").as("vec_a"), col("label").as("label_a")), Seq("vec_a"))
        .join(lab.select(col("vec_id").as("vec_b"), col("label").as("label_b")), Seq("vec_b"))
        .filter(col("label_a") =!= col("label_b"))
        .select(col("vec_a"), col("vec_b"), col("label_a"), col("label_b"), col("cosine"))
        .orderBy("vec_a", "vec_b")
    },
    Some(s"""WITH nd AS (${nearDupCosine.oracle.get})
             SELECT nd.vec_a, nd.vec_b, ea.label AS label_a, eb.label AS label_b,
                    nd.cosine
             FROM nd JOIN embeddings ea ON ea.vec_id = nd.vec_a
                     JOIN embeddings eb ON eb.vec_id = nd.vec_b
             WHERE ea.label <> eb.label
             ORDER BY nd.vec_a, nd.vec_b"""))

  /** The contrastive training-pair set — the dataset artifact a
    * representation-learning run consumes, assembled from the catalog's
    * own mining stages composed verbatim (oracles included): positives
    * are the ≥-threshold near-duplicate pairs ([[nearDupCosine]] — the
    * "semantically same" signal), negatives are each vector's hardest
    * cross-label neighbour ([[hardNegatives]] — the pairs a margin loss
    * learns most from). One frame, `pair_type` labeled, so the trainer
    * reads a single manifest; costs are the two underlying runs plus a
    * union — never a third corpus pass.
    */
  val contrastivePairs: CatalogEntry = CatalogEntry(
    "emb_contrastive_pairs",
    (s, d) => {
      val pos = nearDupCosine.build(s, d)
        .select(col("vec_a").as("anchor_id"), col("vec_b").as("other_id"),
          lit("pos").as("pair_type"), col("cosine").as("sim"))
      val neg = hardNegatives.build(s, d)
        .select(col("vec_id").as("anchor_id"), col("neg_id").as("other_id"),
          lit("neg").as("pair_type"), col("score").as("sim"))
      pos.unionByName(neg).orderBy("pair_type", "anchor_id", "other_id")
    },
    Some(s"""WITH pos AS (${nearDupCosine.oracle.get}),
                  neg AS (${hardNegatives.oracle.get})
             SELECT vec_a AS anchor_id, vec_b AS other_id,
                    'pos' AS pair_type, cosine AS sim FROM pos
             UNION ALL
             SELECT vec_id, neg_id, 'neg', score FROM neg
             ORDER BY pair_type, anchor_id, other_id"""))

  // The default probe depth must be one of the measured sweep points:
  // the sweep's row for the default IS its justification, and a default
  // the sweep never measured is fiat again. (Checked here, after both
  // vals initialize — object vals init in declaration order.)
  require(SweepProbes.contains(IvfProbes),
    s"IvfProbes=$IvfProbes is not a measured sweep point $SweepProbes")
  require(SweepWidths.contains(PqShortlist),
    s"PqShortlist=$PqShortlist is not a measured sweep point $SweepWidths")

  val all: Seq[CatalogEntry] =
    Seq(knnBrute, knnLsh, knnLshMultiprobe, knnIvf, knnIvfKmeans, knnSq8, knnPq,
      knnIvfPq, knnBq, knnRecall, ivfProbeSweep, pqShortlistSweep, pqDistortion, opqPermute, kmeansElbow, knnFiltered, ivfCells, hubness, intrinsicDim, nearDupCosine, nearDupBanded,
      labelCentroids, centroidOutliers, oodMahalanobis, mmrRerank, semDedup, gramMatrix, knnMrl, knnMrlIvf, pcaProject,
      abttResidual, hardNegatives, hardNegativesShortlist, hardNegativesRecall,
      contrastivePairs, labelNoisePairs, rankFusion, rankAgreement)
}
