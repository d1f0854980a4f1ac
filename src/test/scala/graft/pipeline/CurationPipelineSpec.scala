package graft.pipeline

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class CurationPipelineSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  // each row exercises one filter; the English keepers are real prose so
  // langId / quality / repetition all pass them
  private val en1 = "the quick brown fox jumps over the lazy dog and then it runs into the forest with the others"
  private val en2 = "a small group of people walked to the old house near the river and they talked about the weather for a while"
  private def corpus = {
    import spark.implicits._
    Seq(
      (1L, s"<p>$en1</p>"),                       // keeper (markup stripped)
      (2L, en2),                                  // keeper
      (3L, s"<div>$en1</div>"),                   // exact dup of 1 post-strip
      (4L, "der schnelle braune fuchs springt über den faulen hund und läuft schnell durch den dunklen wald nach hause"), // off-language
      (5L, "buy now " * 30),                      // repetition bomb
      (6L, "!!! ### $$$ %%% ^^^ &&& *** ((( )))") // punctuation soup
    ).map { case (id, t) => (id, t.trim) }.toDF("doc_id", "text")
  }

  test("curate keeps clean unique English prose, drops each junk class") {
    val out = CurationPipeline.curate(corpus).collect()
    assert(out.map(_.getLong(0)).sorted.toSeq == Seq(1L, 2L))
    val byId = out.map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(byId(1L) == en1, "markup stripped, text otherwise intact")
    assert(out.forall(_.getString(2) == "en"))
  }

  test("run writes deterministic bounded shards and reports the funnel") {
    val d1 = java.nio.file.Files.createTempDirectory("cur1").toString
    val d2 = java.nio.file.Files.createTempDirectory("cur2").toString
    val cfg = CurationPipeline.Config(nShards = 2, maxRecordsPerShard = 10)
    val funnel = CurationPipeline.run(corpus, d1, cfg)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(funnel("raw") == 6 && funnel("curated") == 2 &&
      funnel("shards_written") == 2)
    CurationPipeline.run(corpus, d2, cfg)
    // byte-deterministic re-run: same rows, same seq assignment
    val a = spark.read.parquet(d1).collect().map(_.toSeq).toSet
    val b = spark.read.parquet(d2).collect().map(_.toSeq).toSet
    assert(a == b && a.nonEmpty)
    // packing metadata present on every row
    assert(spark.read.parquet(d1).columns.toSet
      .intersect(Set("seq_id", "n_tok")) == Set("seq_id", "n_tok"))
  }
}
