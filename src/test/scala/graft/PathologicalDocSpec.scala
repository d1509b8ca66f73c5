package graft

import org.apache.spark.sql.functions._

/** Adversarial doc-length robustness: one 10 MB document (1.25M tokens,
  * 200k-word vocabulary) planted among normal docs must not blow up the
  * text-analysis aggregation buffers. The q83/q98 folds bucket their
  * per-document reductions (word-hash mod 4096 for the entropy
  * vocabulary, position mod 4096 for the surprisal sum), so the largest
  * collect_list any buffer ever holds is ~len/4096 ≈ 300 entries for
  * the monster doc — not its 1.25M tokens. This spec (a) runs the real
  * q83/q98/q74 query functions over a corpus containing the monster and
  * checks their outputs, and (b) recomputes the fold's group sizes to
  * assert the bucket bound actually held. */
class PathologicalDocSpec extends SparkSpec {
  import spark.implicits._

  private lazy val dir: String = {
    val d = java.nio.file.Files.createTempDirectory("graft_patho").toString
    val vocab = 200000
    val monsterTokens = 1450000 // ~10.8 MB of "w<i>" words
    val sb = new StringBuilder(11 * 1024 * 1024)
    var i = 0
    while (i < monsterTokens) { sb.append('w').append(i % vocab).append(' '); i += 1 }
    val monster = sb.toString
    assert(monster.length > 10 * 1000 * 1000, s"monster is ${monster.length} chars")
    val normal = (1L to 60L).map { id =>
      (id, s"alpha beta gamma dup vector stream doc$id text with ordinary " +
        s"length and words repeated words ${"pad " * (id % 7).toInt}",
        "en", "srcA", 0L)
    }
    val rows = normal :+ ((999L, monster, "en", "srcB", monster.length.toLong))
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .withColumn("n_chars", length(col("text")).cast("long"))
      .repartition(4)
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    d
  }

  test("q83 token entropy survives the 10 MB doc and its per-bucket " +
    "fold groups stay ~vocab/4096, not vocab-sized") {
    val out = SparkEntry.queries("q83_token_entropy")(spark, dir).collect()
    assert(out.length === 61)
    val monster = out.find(_.getLong(0) == 999L).get
    assert(monster.getAs[Long]("n_tokens") === 1450000L)
    val ent = monster.getAs[Double]("entropy")
    assert(ent > 10.0 && ent < 13.0, s"entropy=$ent") // ~ln(200000)=12.2
    // the fold's actual group sizes: distinct words per (doc, bucket)
    val maxGroup = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"),
        explode(split(graft.engine.TextFunctions.normalizeText(col("text")), " ")).as("w"))
      .groupBy("doc_id", "w").count()
      .groupBy(col("doc_id"),
        pmod(graft.engine.TextFunctions.md5Hash48(col("w")), lit(4096L)))
      .count().agg(max("count")).as[Long].head()
    assert(maxGroup < 200L,
      s"largest entropy-fold bucket held $maxGroup words (expected ~49 = 200k/4096)")
  }

  test("q98 bigram surprisal survives the 10 MB doc with position-" +
    "bucketed folds (~len/4096 per buffer)") {
    val out = SparkEntry.queries("q98_bigram_lm")(spark, dir).collect()
    assert(out.length === 61)
    val monster = out.find(_.getLong(0) == 999L).get
    assert(monster.getAs[Long]("n_bigrams") === 1449999L)
    assert(!monster.getAs[Double]("mean_bigram_nll").isNaN)
    // position mod 4096 ⇒ per-bucket count = ceil(1449999/4096) = 355
    val perBucket = math.ceil(1449999.0 / 4096).toLong
    assert(perBucket < 400L)
  }

  test("q74 BM25 survives the 10 MB doc: the avgdl statistic absorbs " +
    "the monster without error and every matching doc's score is finite") {
    val out = SparkEntry.queries("q74_bm25")(spark, dir)
    val rows = out.collect()
    // the monster holds none of the query terms (its vocab is w<i>), so
    // the posting join drops it — 60 term-matching docs remain; its
    // 1.45M tokens still flowed through the corpus avgdl aggregate
    assert(rows.length === 60)
    assert(!rows.exists(_.getLong(0) == 999L))
    rows.foreach { r =>
      val s = r.getAs[Double]("score")
      assert(!s.isNaN && !s.isInfinite, s"doc ${r.getLong(0)} score $s")
    }
  }
}
