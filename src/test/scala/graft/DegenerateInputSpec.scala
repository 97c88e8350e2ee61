package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Degenerate-input totality, catalog-wide: at 100 TB an empty source, a
  * single-row partition, or a sprinkling of NULLs in nullable columns is
  * an operating condition, not an anomaly — a filter that matches
  * nothing, a new tenant with no history, a feed with missing fields.
  * Every catalog entry must return a defined (possibly empty) frame on
  * these inputs instead of throwing from a driver-side head()/argmax, a
  * sketch built over zero rows, or a typed encoder fed a null primitive.
  * The crash sites these sweeps originally found — BPE's pair argmax,
  * PageRank's node-count guard, the Bloom build over zero keys, the
  * split-divergence division by an empty split's token total, the Gram
  * aggregator's null vector, the media encoder's null ids — are fixed
  * and held here so new entries can't regress the contract.
  */
class DegenerateInputSpec extends AnyFunSuite {
  import TestSpark.{sf0001, spark}

  private val tables = Seq("region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  private def fixture(tag: String)(
      prep: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame): String =
    fixtureByTable(tag)((_, df) => prep(df))

  private def fixtureByTable(tag: String)(
      prep: (String, org.apache.spark.sql.DataFrame) => org.apache.spark.sql.DataFrame)
      : String = {
    val out = java.nio.file.Files.createTempDirectory(s"graft-deg-$tag").toString
    tables.foreach { t =>
      prep(t, spark.read.parquet(s"$sf0001/$t.parquet"))
        .coalesce(1).write.mode("overwrite").parquet(s"$out/$t.parquet")
    }
    out
  }

  private def sweep(dir: String): Seq[String] =
    graft.queries.Catalog.all.flatMap { e =>
      val r =
        try { e.build(spark, dir).count(); None }
        catch {
          case ex: Throwable =>
            val msg = Option(ex.getMessage).getOrElse("")
              .linesIterator.toSeq.headOption.getOrElse("").take(120)
            Some(s"${e.name}: ${ex.getClass.getSimpleName} $msg")
        }
      SessionHygiene.dropEntryState(spark)
      r
    }

  test("every catalog entry is total on an empty corpus") {
    val failures = sweep(fixture("empty")(_.limit(0)))
    assert(failures.isEmpty,
      s"${failures.size} entries throw on empty input:\n${failures.mkString("\n")}")
  }

  test("every catalog entry is total on single-row tables") {
    // One row per table breaks referential integrity (joins go empty) and
    // degenerates every per-group statistic to n=1 — the sweep that found
    // split_token_divergence dividing by an empty split's token total.
    val failures = sweep(fixture("one")(_.limit(1)))
    assert(failures.isEmpty,
      s"${failures.size} entries throw on single-row input:\n${failures.mkString("\n")}")
  }

  test("every catalog entry is total with nulls sprinkled into every column") {
    // ~1 in 7 values of every column independently nulled (hash-seeded,
    // deterministic). This is the sweep that found the Gram aggregator
    // NPE on null vectors and the media encoder's NOT_NULL violations.
    val failures = sweep(fixture("null") { df =>
      df.columns.zipWithIndex.foldLeft(df) { case (d, (c, i)) =>
        d.withColumn(c,
          when(pmod(xxhash64(col(c), lit(i)), lit(7)) === 0, lit(null))
            .otherwise(col(c)))
      }
    })
    assert(failures.isEmpty,
      s"${failures.size} entries throw on null-injected input:\n${failures.mkString("\n")}")
  }

  test("every catalog entry is total with all mass on one key") {
    // Maximal skew as an operating condition: every row of every table
    // carries the SAME group/join key — what a 100 TB feed produces when
    // an upstream default value swallows a column (hotMass 1.0, one
    // user's sessions, one basket, one language, every keyed window a
    // single partition). This is the sweep that uniquely exercises the
    // skew toolkit's degenerate corner: the salt paths, the sketch
    // router (CM bound reads 1.0), and AQE's skew split all face a
    // single-key world. Keys collapse to the column's MIN value so
    // referential integrity survives — the hot key EXISTS in its
    // dimension, keeping joins populated rather than vacuously empty.
    val keyCols = Map(
      "events" -> Seq("user_id", "event_type"),
      "documents" -> Seq("lang", "source"),
      "embeddings" -> Seq("label"),
      "lineitem" -> Seq("l_orderkey", "l_partkey", "l_suppkey",
        "l_returnflag", "l_linestatus"),
      "orders" -> Seq("o_custkey", "o_orderstatus", "o_orderpriority"),
      "customer" -> Seq("c_nationkey", "c_mktsegment"),
      "supplier" -> Seq("s_nationkey"),
      "part" -> Seq("p_brand", "p_type"),
      "nation" -> Seq("n_regionkey"))
    val failures = sweep(fixtureByTable("onekey") { (t, df) =>
      keyCols.getOrElse(t, Nil).foldLeft(df) { (d, c) =>
        val v = d.select(min(col(c))).head.get(0)
        // Cast back to the column's declared type: an all-null column at
        // this sf would otherwise make lit(v) NullType and silently
        // rewrite the schema — degrade to the null-injection case instead.
        d.withColumn(c, lit(v).cast(d.schema(c).dataType))
      }
    })
    assert(failures.isEmpty,
      s"${failures.size} entries throw on all-mass-one-key input:\n${failures.mkString("\n")}")
  }

  test("every catalog entry is total on a clock-stuck feed (one timestamp everywhere)") {
    // Fifth sweep: every temporal column collapses to its MIN value —
    // what a 100 TB feed produces when an upstream clock sticks or a
    // backfill stamps one ingestion time. Every time series becomes one
    // point (trend/autocorr/Theil-Sen/correlation have zero pairs),
    // every window one bucket, every session one burst, every trailing
    // window a single day, date joins all-hit — the temporal degeneracy
    // the one-key sweep is to keys.
    val tsCols = Map(
      "events" -> Seq("ts"),
      "orders" -> Seq("o_orderdate"),
      "lineitem" -> Seq("l_shipdate"))
    val failures = sweep(fixtureByTable("onets") { (t, df) =>
      tsCols.getOrElse(t, Nil).foldLeft(df) { (d, c) =>
        val v = d.select(min(col(c))).head.get(0)
        d.withColumn(c, lit(v).cast(d.schema(c).dataType))
      }
    })
    assert(failures.isEmpty,
      s"${failures.size} entries throw on a clock-stuck feed:\n${failures.mkString("\n")}")
  }
}
