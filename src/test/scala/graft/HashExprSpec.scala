package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{Text, Vectors}

/** The two compile-cost-collapsing hash expressions (MinhashSignature,
  * HyperplaneBuckets) must be VALUE-IDENTICAL to the composed built-in
  * forms they replaced — the oracle SQL still mirrors the composed form,
  * so any divergence is a silent correctness break.
  */
class HashExprSpec extends AnyFunSuite {
  import TestSpark.{sf0001, spark}

  private lazy val docs = Tables.documents(spark, sf0001).limit(80)
    .select(col("doc_id"), Text.shingles(col("text"), 3).as("shs"))
  private lazy val emb = Tables.embeddings(spark, sf0001).limit(80)

  test("MinhashSignature equals the composed array_min(transform(md5)) per hash") {
    val k = 12
    val native = docs.select(col("doc_id") +: Text.minhashSignature(col("shs"), k): _*)
    val composed = docs.select(col("doc_id") +: (0 until k).map { i =>
      array_min(transform(col("shs"), s =>
        md5(concat(lit(i.toString), lit("|"), s)))).as(s"s$i")
    }: _*)
    val n = native.collect().map(r => r.getLong(0) -> r.toSeq.tail).toMap
    val c = composed.collect().map(r => r.getLong(0) -> r.toSeq.tail).toMap
    assert(n.nonEmpty && n == c)
  }

  test("MinhashSignature: empty and null-element arrays produce NULL, not garbage") {
    import org.apache.spark.sql.GraftSqlBridge
    val sig = GraftSqlBridge.column(graft.expressions.MinhashSignature(
      GraftSqlBridge.expression(col("shs")), 3))
    val rows = spark.sql(
      """SELECT * FROM VALUES (array('a b c', 'b c d')), (array()),
         (CAST(NULL AS ARRAY<STRING>)), (array('a b c', NULL)) t(shs)""")
      .select(sig.as("sig")).collect()
    assert(rows(0).getSeq[String](0).length == 3)
    assert(rows(1).isNullAt(0) && rows(2).isNullAt(0) && rows(3).isNullAt(0))
  }

  test("MinhashSignature participates in whole-stage codegen") {
    val plan = docs.select(Text.minhashSignature(col("shs"), 4): _*)
      .queryExecution.executedPlan.toString
    // The shingle HOF projection below it legitimately falls out of
    // codegen; the minhash projection itself must be in a starred span.
    assert("""\*\(\d+\) Project \[minhash_signature""".r.findFirstIn(plan).isDefined,
      s"fell out of codegen:\n$plan")
  }

  test("HyperplaneBuckets equals the composed per-plane projection sum") {
    val tables = graft.queries.EmbeddingCatalog.bandedSigns
    val native = emb.select(col("vec_id"),
      Vectors.hyperplaneBuckets(col("embedding"), tables).as("b"))
    def composedBucket(planes: Seq[Seq[Int]]) =
      planes.zipWithIndex.map { case (signs, p) =>
        when(Vectors.project(col("embedding"), signs) > 0, lit(1 << p)).otherwise(lit(0))
      }.reduce(_ + _)
    val composed = emb.select(col("vec_id"),
      array(tables.map(composedBucket): _*).as("b"))
    val n = native.collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    val c = composed.collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    assert(n.nonEmpty && n == c)
  }

  test("word_ngrams and simhash32 are callable from SQL after registration") {
    graft.expressions.GraftExtensions.register(spark)
    val row = spark.sql(
      """SELECT word_ngrams(array('a','b','c'), 2) AS ng,
                simhash32(array('a','b','c')) AS sh""").collect().head
    assert(row.getSeq[String](0) == Seq("a b", "b c"))
    assert(row.getLong(1) ==
      graft.expressions.Simhash32.compute(
        org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
          Array("a", "b", "c").map(org.apache.spark.unsafe.types.UTF8String.fromString))))
  }

  test("minhash_signature is callable from SQL after registration") {
    graft.expressions.GraftExtensions.register(spark)
    docs.createOrReplaceTempView("docs_mh")
    val viaSql = spark.sql(
      "SELECT doc_id, minhash_signature(shs, 4) AS sig FROM docs_mh")
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    val viaApi = docs.select(col("doc_id") +: Text.minhashSignature(col("shs"), 4): _*)
      .collect().map(r => r.getLong(0) -> r.toSeq.tail.map(String.valueOf)).toMap
    assert(viaSql.nonEmpty && viaSql.view.mapValues(_.toSeq).toMap == viaApi)
    val err = intercept[Exception] {
      spark.sql("SELECT minhash_signature(array('a'), 1 + 1) FROM VALUES (1) t(x)").collect()
    }
    assert(err.getMessage.contains("INT literal"), err.getMessage)
  }

  test("WordNgrams equals the composed HOF form (incl. short docs and nulls)") {
    def composed(t: org.apache.spark.sql.Column, n: Int) = Text.bound(t) { tt =>
      when(size(tt) < n, array(array_join(tt, " ")))
        .otherwise(transform(sequence(lit(0), size(tt) - n), i =>
          concat_ws(" ", (0 until n).map(j => element_at(tt, i + j + 1)): _*)))
    }
    val edge = spark.sql(
      """SELECT * FROM VALUES (array('a')), (array('a','b')), (array('a','b','c','d')),
         (array('a', CAST(NULL AS STRING), 'c')), (array('')) t(toks)""")
    Seq(2, 3).foreach { n =>
      val rows = edge.select(Text.wordNgrams(col("toks"), n).as("nat"),
        composed(col("toks"), n).as("cmp")).collect()
      rows.foreach(r => assert(r.getSeq[String](0) == r.getSeq[String](1), s"n=$n: $r"))
      val docRows = Tables.documents(spark, sf0001).limit(60)
        .select(Text.wordNgrams(Text.normTokens(col("text")), n).as("nat"),
          composed(Text.normTokens(col("text")), n).as("cmp")).collect()
      docRows.foreach(r => assert(r.getSeq[String](0) == r.getSeq[String](1)))
    }
  }

  test("IntersectCardSorted equals size(array_intersect) on sorted shingle sets") {
    val pairs = docs.withColumn("shsrt", sort_array(col("shs")))
      .as("a").crossJoin(docs.withColumn("shsrt", sort_array(col("shs"))).as("b"))
      .filter(col("a.doc_id") < col("b.doc_id")).limit(500)
      .select(
        Text.intersectCardSorted(col("a.shsrt"), col("b.shsrt")).as("merge"),
        size(array_intersect(col("a.shs"), col("b.shs"))).as("hash"))
      .collect()
    assert(pairs.nonEmpty)
    pairs.foreach(r => assert(r.getInt(0) == r.getInt(1), r))
    // Edge cases: empty sides, disjoint, identical.
    val edgeRows = Seq(
      (Seq.empty[String], Seq("x")), (Seq("x"), Seq.empty[String]),
      (Seq("a", "b"), Seq("c", "d")), (Seq("a", "b", "c"), Seq("a", "b", "c")))
    import spark.implicits._
    val got = edgeRows.toDF("a", "b")
      .select(Text.intersectCardSorted(col("a"), col("b"))).as[Int].collect().toSeq
    assert(got == Seq(0, 0, 0, 3), got)
  }

  test("Simhash32 equals the exploded 32-aggregate formulation") {
    import org.apache.spark.sql.GraftSqlBridge
    val base = Tables.documents(spark, sf0001).limit(120)
    val native = base.select(col("doc_id"),
      GraftSqlBridge.column(graft.expressions.Simhash32(GraftSqlBridge.expression(
        Text.normTokens(col("text"))))).as("simhash"))
    val odd = Seq("1", "3", "5", "7", "9", "b", "d", "f")
    val toks = base.select(col("doc_id"),
      explode(array_distinct(Text.normTokens(col("text")))).as("tok"))
      .withColumn("hx", md5(col("tok")))
    val voteCols = (0 until 32).map(j =>
      sum(when(substring(col("hx"), j + 1, 1).isin(odd: _*), 1).otherwise(-1)).as(s"v$j"))
    val bits = (0 until 32).map(j => when(col(s"v$j") > 0, lit(1L << j)).otherwise(lit(0L)))
    val composed = toks.groupBy("doc_id").agg(voteCols.head, voteCols.tail: _*)
      .select(col("doc_id"), bits.reduce(_ + _).as("simhash"))
    val n = native.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val c = composed.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(n.nonEmpty && n == c)
  }

  test("interpreted and codegen paths agree (MinhashSignature)") {
    val k = 6
    val on = docs.select(col("doc_id") +: Text.minhashSignature(col("shs"), k): _*).collect()
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    try {
      val off = docs.select(col("doc_id") +: Text.minhashSignature(col("shs"), k): _*).collect()
      assert(on.map(_.toSeq).toSeq == off.map(_.toSeq).toSeq)
    } finally spark.conf.set("spark.sql.codegen.wholeStage", "true")
  }

  test("RollingHash equals the composed aggregate(split) fold on the corpus and edge cases") {
    import spark.implicits._
    val composed = (c: org.apache.spark.sql.Column) =>
      aggregate(
        filter(split(lower(trim(c)), ""), ch => ch =!= ""),
        lit(0L),
        (acc, ch) => (acc * 31 + ascii(ch)) % 1000000007L)
    val corpus = Tables.documents(spark, sf0001).select(col("doc_id"), col("text"))
    val both = corpus.select(col("doc_id"),
      Text.rollingHash(col("text")).as("native"), composed(col("text")).as("hof"))
    assert(both.filter(col("native") =!= col("hof")).count() == 0,
      "native rolling hash diverges from the composed fold on the corpus")
    // Edge cases: empty, whitespace-only, single char, case/trim noise.
    val edges = Seq("", "   ", "x", "  MiXeD Case\t", "a b  c").toDF("text")
    val e = edges.select(Text.rollingHash(col("text")).as("n"),
      composed(col("text")).as("h")).collect()
    assert(e.forall(r => r.getLong(0) == r.getLong(1)))
    // Codegen-off path matches codegen-on (both eval strategies).
    val on = both.select("native").as[Long].collect().toSeq
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    try {
      val off = both.select("native").as[Long].collect().toSeq
      assert(on == off)
    } finally spark.conf.set("spark.sql.codegen.wholeStage", "true")
  }
}
