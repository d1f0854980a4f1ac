package graft.pipeline

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The incremental/appendable IVF index: cell-partitioned appends under
  * SigIndex's marker-manifest visibility, partition-pruned multi-batch
  * search, grace-windowed folds, and the centroid-drift retrain with its
  * atomic generation flip. */
class IvfIndexSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private lazy val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
  private val cents = Similarity.fixedCentroids(8, 64)

  private def freshIndex(): String = {
    val dir = Files.createTempDirectory("ivf_inc").toString + "/idx"
    IvfIndex.init(spark, dir, cents)
    dir
  }

  private def resultSet(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(_.toSeq).toSet

  test("N-batch appends answer exactly like the one-shot probe; any batch split") {
    val q = emb.where(col("vec_id") < 10)
    val expect = resultSet(Similarity.ivfProbe(emb, q, 3, cents, nProbe = 3))
    for (splits <- Seq(Seq(0), Seq(0, 1), Seq(0, 1, 2))) {
      val dir = freshIndex()
      splits.foreach(b => assert(IvfIndex.append(
        emb.where(col("vec_id") % splits.length === b), dir, s"b$b")))
      assert(resultSet(IvfIndex.search(spark, dir, q, 3, nProbe = 3)) == expect,
        s"split into ${splits.length} batches diverged")
    }
  }

  test("search partition-prunes every live batch directory to the probed cells") {
    val dir = freshIndex()
    (0 until 3).foreach(b => IvfIndex.append(
      emb.where(col("vec_id") % 3 === b), dir, s"b$b"))
    val res = IvfIndex.search(spark, dir, emb.where(col("vec_id") < 10), 3, nProbe = 3)
    res.collect()
    val plan = res.queryExecution.executedPlan.toString
    assert(plan.replaceAll("\\s", "")
      .matches("(?s).*PartitionFilters:\\[[^\\]]*cell.*"),
      s"cell probe not a partition filter:\n${plan.take(1500)}")
    // the on-disk layout: every batch directory is partitioned by cell
    val f = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    (0 until 3).foreach { b =>
      val cellDirs = f.listStatus(
          new org.apache.hadoop.fs.Path(s"$dir/gen-0/batch=b$b"))
        .filter(_.isDirectory).map(_.getPath.getName).count(_.startsWith("cell="))
      assert(cellDirs >= 1 && cellDirs <= 8, s"batch b$b layout")
    }
  }

  test("replayed batch name is detected and skipped; its rows are readable") {
    val dir = freshIndex()
    assert(IvfIndex.append(emb.where(col("vec_id") < 100), dir, "b0"))
    val before = IvfIndex.read(spark, dir).count()
    assert(!IvfIndex.append(emb.where(col("vec_id") < 100), dir, "b0"))
    assert(IvfIndex.read(spark, dir).count() == before)
    assert(IvfIndex.readBatch(spark, dir, "b0").get.count() == before)
    assert(IvfIndex.readBatch(spark, dir, "never").isEmpty)
  }

  test("a batch directory without a marker is invisible (crashed append)") {
    val dir = freshIndex()
    IvfIndex.append(emb.where(col("vec_id") < 50), dir, "b0")
    // simulate a crash: directory written, marker never published
    emb.where(col("vec_id") >= 50 && col("vec_id") < 80)
      .select(col("vec_id").as("cid"),
        col("embedding").cast("array<double>").as("ce"))
      .withColumn("cell", lit(0))
      .write.partitionBy("cell").parquet(s"$dir/gen-0/batch=ghost")
    assert(IvfIndex.read(spark, dir).count() == 50)
    assert(!IvfIndex.contains(spark, dir, "ghost"))
  }

  test("compact folds aged batches: same answers, fewer dirs, replay detection survives") {
    val dir = freshIndex()
    (0 until 4).foreach(b => IvfIndex.append(
      emb.where(col("vec_id") % 4 === b), dir, s"b$b"))
    val q = emb.where(col("vec_id") < 10)
    val before = resultSet(IvfIndex.search(spark, dir, q, 3, nProbe = 3))
    IvfIndex.compact(spark, dir, graceMs = 0L)
    assert(resultSet(IvfIndex.search(spark, dir, q, 3, nProbe = 3)) == before)
    val f = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val batchDirs = f.listStatus(new org.apache.hadoop.fs.Path(s"$dir/gen-0"))
      .filter(_.isDirectory).map(_.getPath.getName).filter(_.startsWith("batch="))
    assert(batchDirs.length == 1, s"fold left ${batchDirs.mkString(",")}")
    // folded names still count as landed — a late replay is not re-appended
    (0 until 4).foreach(b => assert(IvfIndex.contains(spark, dir, s"b$b")))
    (0 until 4).foreach(b => assert(!IvfIndex.append(
      emb.where(col("vec_id") % 4 === b), dir, s"b$b")))
  }

  test("skew measures quantizer drift; maybeRetrain fires only past the threshold") {
    val dir = freshIndex()
    IvfIndex.append(emb, dir, "b0")
    val s = IvfIndex.skew(spark, dir)
    assert(s >= 1.0 && s < 8.0, s"skew $s out of range for 8 cells")
    assert(IvfIndex.maybeRetrain(spark, dir, maxSkew = 1000.0).isEmpty)
    assert(IvfIndex.currentGen(spark, dir).contains(0L))
  }

  test("retrain: atomic generation flip, answers match the new quantizer, names carry") {
    val dir = freshIndex()
    (0 until 3).foreach(b => IvfIndex.append(
      emb.where(col("vec_id") % 3 === b), dir, s"b$b"))
    val gen = IvfIndex.retrain(spark, dir, k = 8, iters = 2, trainLimit = 500)
    assert(gen == 1L && IvfIndex.currentGen(spark, dir).contains(1L))
    // the new generation answers exactly like an in-memory probe over the
    // SAME retrained quantizer — assignment + search moved coherently
    val newCents = IvfIndex.centroids(spark, dir)
    val q = emb.where(col("vec_id") < 10)
    assert(resultSet(IvfIndex.search(spark, dir, q, 3, nProbe = 3)) ==
      resultSet(Similarity.ivfProbe(emb, q, 3, newCents, nProbe = 3)))
    // replay detection survives the flip: old names are carried forward
    (0 until 3).foreach(b => assert(IvfIndex.contains(spark, dir, s"b$b")))
    (0 until 3).foreach(b => assert(!IvfIndex.append(
      emb.where(col("vec_id") % 3 === b), dir, s"b$b")))
    // the retired generation vacuums after the grace window
    IvfIndex.compact(spark, dir, graceMs = 0L)
    val f = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(!f.exists(new org.apache.hadoop.fs.Path(s"$dir/gen-0")))
    assert(resultSet(IvfIndex.search(spark, dir, q, 3, nProbe = 3)) ==
      resultSet(Similarity.ivfProbe(emb, q, 3, newCents, nProbe = 3)))
  }

  test("appends after a retrain land in the new generation and keep answering") {
    val dir = freshIndex()
    IvfIndex.append(emb.where(col("vec_id") % 2 === 0), dir, "b0")
    IvfIndex.retrain(spark, dir, k = 8, iters = 2, trainLimit = 500)
    assert(IvfIndex.append(emb.where(col("vec_id") % 2 === 1), dir, "b1"))
    val newCents = IvfIndex.centroids(spark, dir)
    val q = emb.where(col("vec_id") < 10)
    assert(resultSet(IvfIndex.search(spark, dir, q, 3, nProbe = 3)) ==
      resultSet(Similarity.ivfProbe(emb, q, 3, newCents, nProbe = 3)))
  }
}
