package graft.queries

import graft.multimodal.Multimodal

/** Catalog surface for the multimodal plumbing (graft.multimodal): all
  * three paths have exact SQL oracles (the fake codec is deliberately
  * SQL-derivable from the payload bytes; the feature histogram rides on
  * the corpus being ASCII, where byte ≡ codepoint).
  */
object MultimodalCatalog {

  /** Batched "decode" of every media payload. */
  val mediaDecode: CatalogEntry = CatalogEntry(
    "media_decode",
    (s, d) => Multimodal.decode(Multimodal.mediaDataset(s, d)).toDF(),
    Some("""SELECT media_id, kind, n_bytes, md5(text) AS checksum, dec_width, dec_height FROM (
              SELECT doc_id AS media_id,
                     CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
                     CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
                     text,
                     CASE WHEN doc_id % 3 = 0 THEN CAST(doc_id % 512 + 64 AS INT)
                          ELSE CAST(16 + octet_length(encode(text)) % 64 AS INT) END AS dec_width,
                     CASE WHEN doc_id % 3 = 0 THEN CAST(doc_id % 384 + 48 AS INT)
                          ELSE CAST(16 + octet_length(encode(text)) % 48 AS INT) END AS dec_height
              FROM documents)"""))

  /** One-to-many frame sampling of the video payloads (every 500 ms). */
  val mediaFrames: CatalogEntry = CatalogEntry(
    "media_frame_sample",
    (s, d) => Multimodal.sampleFrames(Multimodal.mediaDataset(s, d)).toDF(),
    Some("""WITH v AS (
              SELECT doc_id AS media_id,
                     CAST(octet_length(encode(text)) AS BIGINT) AS len,
                     GREATEST(1, (n_chars * 10) // 500) AS n_frames
              FROM documents WHERE doc_id % 3 = 2)
            SELECT media_id, i AS frame_idx,
                   (i * len) // n_frames AS frame_off,
                   LEAST(len - (i * len) // n_frames, GREATEST(1, len // n_frames)) AS frame_len
            FROM (SELECT media_id, len, n_frames, unnest(range(0, n_frames)) AS i FROM v)"""))

  /** Byte-histogram features, exploded to driver-sortable scalar rows
    * (media_id, bin, value). The histogram is a per-byte count / payload
    * length — and because the corpus is ASCII, byte ≡ codepoint, so the
    * identical histogram is SQL-derivable in DuckDB from the text. Counts
    * and lengths are exact integers, so the single double division is
    * bit-deterministic across engines (IEEE 754 round-to-nearest).
    */
  val mediaFeatures: CatalogEntry = CatalogEntry(
    "media_features",
    (s, d) => Multimodal.features(Multimodal.mediaDataset(s, d)).toDF()
      .selectExpr("media_id", "posexplode(histogram) AS (bin, value)"),
    Some("""WITH docs AS (
              SELECT doc_id AS media_id, text,
                     GREATEST(1, octet_length(encode(text))) AS n
              FROM documents),
            bins AS (SELECT CAST(unnest(range(0, 16)) AS INT) AS bin),
            cnts AS (
              SELECT media_id, ascii(c) // 16 AS bin, COUNT(*) AS cnt
              FROM (SELECT media_id, unnest(string_split(text, '')) AS c FROM docs)
              WHERE c <> ''
              GROUP BY 1, 2)
            SELECT d.media_id, b.bin,
                   COALESCE(c.cnt, 0) / CAST(d.n AS DOUBLE) AS value
            FROM docs d CROSS JOIN bins b
            LEFT JOIN cnts c ON c.media_id = d.media_id AND c.bin = b.bin"""))

  /** Batched thumbnail "resize" of the image payloads: one integer
    * scale fits (w, h) into 64×64; the payload stub keeps every
    * scale-th byte. ASCII corpus ⇒ the subsampled byte string is
    * SQL-derivable, so even the checksum has an exact oracle.
    */
  val mediaResize: CatalogEntry = CatalogEntry(
    "media_resize",
    (s, d) => Multimodal.resize(Multimodal.mediaDataset(s, d)).toDF(),
    Some("""WITH imgs AS (
              SELECT doc_id AS media_id, text,
                     octet_length(encode(text)) AS len,
                     CAST(doc_id % 512 + 64 AS INT) AS w,
                     CAST(doc_id % 384 + 48 AS INT) AS h
              FROM documents WHERE doc_id % 3 = 0),
            s AS (SELECT *, GREATEST(1, (w + 63) // 64, (h + 63) // 64) AS scale FROM imgs)
            SELECT media_id,
                   CAST(GREATEST(1, w // scale) AS INT) AS out_width,
                   CAST(GREATEST(1, h // scale) AS INT) AS out_height,
                   CAST((len + scale - 1) // scale AS BIGINT) AS out_bytes,
                   md5(array_to_string([substr(text, CAST(i AS INT), 1)
                                        for i in range(1, len + 1, scale)], '')) AS checksum
            FROM s"""))

  /** Byte-identical media dedup — the asset-level pass a multimodal
    * corpus runs before any expensive perceptual hashing: md5 over the
    * RAW payload bytes, one uniform hash-shuffle keyed on (kind,
    * checksum), keep the smallest media_id as canonical. The checksum
    * is computed on the binary column (no decode), so the pass costs a
    * linear scan at any corpus size; DuckDB mirrors it on the same bytes
    * (the payload IS the document's UTF-8 text by construction of the
    * synthetic media lake, `Multimodal.mediaTable`).
    */
  val mediaDedup: CatalogEntry = CatalogEntry(
    "media_dedup",
    (s, d) => {
      import org.apache.spark.sql.functions._
      Multimodal.mediaDataset(s, d).toDF()
        .select(col("media_id"), col("kind"), md5(col("data")).as("checksum"))
        .groupBy("kind", "checksum")
        .agg(min("media_id").as("canonical_id"), count(lit(1)).as("n_copies"))
    },
    Some("""SELECT kind, md5(text) AS checksum,
                   MIN(doc_id) AS canonical_id, COUNT(*) AS n_copies
            FROM (SELECT doc_id,
                         CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image'
                              WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
                         text
                  FROM documents)
            GROUP BY kind, checksum"""))

  val all: Seq[CatalogEntry] =
    Seq(mediaDecode, mediaFrames, mediaFeatures, mediaResize, mediaDedup)
}
