package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch stage-timing diagnostic for the LSH pipeline (not part of the
  * engine surface).
  */
object TimeStages {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"$label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2fs")
      r
    }

    import graft.functions.Text
    val docs = graft.Tables.documents(spark, sfDir)
    time("scan docs")(docs.count())
    val arrays = docs.select(col("doc_id"), Text.shingles(col("text"), 3).as("shs"))
    time("shingle arrays collect")(arrays.queryExecution.toRdd.count())
    // Formulation A: per-row array_min(transform(md5)) — interpreted HOF.
    val sigA = arrays.select(col("doc_id") +: Text.minhashSignature(col("shs"), 12): _*)
    time("sig A (HOF md5) evaluate")(sigA.queryExecution.toRdd.count())
    // Formulation B: exploded rows + codegen md5 + groupBy min.
    val sh = docs.select(col("doc_id"), explode(Text.shingles(col("text"), 3)).as("sh")).distinct()
    val minCols = (0 until 12).map(i =>
      min(md5(concat(lit(i.toString), lit("|"), col("sh")))).as(s"s$i"))
    val sigB = sh.groupBy("doc_id").agg(minCols.head, minCols.tail: _*)
    time("sig B (exploded codegen)")(sigB.queryExecution.toRdd.count())
    time("sig B again")(sigB.queryExecution.toRdd.count())
    val sigC = sigB.cache()
    time("sig B cached")(sigC.count())
    val bandStructs = (0 until 4).map { b =>
      val parts = (0 until 3).map(r => col(s"s${b * 3 + r}"))
      struct(lit(b).as("band"), md5(concat(parts: _*)).as("h"))
    }
    val bands = sigC.select(col("doc_id"), explode(array(bandStructs: _*)).as("bh"))
      .select(col("doc_id"), col("bh.band").as("band"), col("bh.h").as("h"))
    time("bands")(bands.count())
    val cand = bands.as("a").join(bands.as("b"),
        col("a.band") === col("b.band") && col("a.h") === col("b.h") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("da"), col("b.doc_id").as("db")).distinct()
    time("candidates")(cand.count())
    time("full catalog query")(
      graft.SparkEntry.queries("doc_near_dup_lsh")(spark, sfDir).count())
    time("full catalog query again")(
      graft.SparkEntry.queries("doc_near_dup_lsh")(spark, sfDir).count())
    spark.stop()
  }
}
