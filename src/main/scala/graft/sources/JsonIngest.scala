package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.{StringType, StructType}

/** Fault-tolerant JSON-lines ingestion — the front door for crawl-scale
  * corpora where a malformed line per million is a certainty and one bad
  * record must never kill a 100 TB job.
  *
  * Schema is EXPLICIT (inference over a lake is a full extra scan), mode
  * is PERMISSIVE, and unparseable lines land intact in a corrupt-record
  * column so the caller gets BOTH frames: clean rows for the pipeline,
  * raw rejects for quarantine/debugging. That split is the load-bearing
  * contract — FAILFAST kills the job, DROPMALFORMED silently loses data;
  * quarantine is the only option that scales operationally.
  *
  * Spark caveat, documented upstream: a query that references ONLY the
  * corrupt-record column of a JSON scan is disallowed (the parser prunes
  * to nothing and would report no corruption), so the split materializes
  * the parsed frame once (localCheckpoint) before filtering. At scale
  * that is the same single parse the job needed anyway.
  */
object JsonIngest {

  final val CorruptCol = "_corrupt_record"

  /** Returns (clean, quarantined): `clean` has exactly `schema`'s
    * columns; `quarantined` is one string column of raw reject lines.
    */
  def readSplit(
      spark: SparkSession,
      path: String,
      schema: StructType): (DataFrame, DataFrame) = {
    val parsed = spark.read
      .schema(schema.add(CorruptCol, StringType))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptCol)
      .json(path)
      .localCheckpoint()
    val clean = parsed.filter(col(CorruptCol).isNull)
      .select(schema.fieldNames.map(col).toIndexedSeq: _*)
    val bad = parsed.filter(col(CorruptCol).isNotNull)
      .select(col(CorruptCol).as("raw_line"))
    (clean, bad)
  }
}
