package graft.pipeline

import org.apache.spark.sql.SparkSession

/** Driver-direct reads of the tiny quantizer-state parquets the ANN
  * indexes persist (`centroids/`, `codebooks/`, `imicb/`, `rotation/` —
  * bounded k×dims / M×Ks×subDims doubles, metadata by construction).
  *
  * These files used to be read with `spark.read.parquet(...).collect()`:
  * a full distributed-job round trip (driver → scheduler → task →
  * collect) per read, several times per append/search, to fetch a few KB
  * that the DRIVER itself consumes (the arrays ride into codegen'd
  * expressions as literals). Reading the parquet pages directly on the
  * driver removes those jobs entirely — the optimization-guide discipline
  * that metadata reads must not cost cluster round trips (§1.2 "remove
  * unnecessary passes", §5 "the driver should do almost no DATA work" —
  * this is not data work; it is the same bytes the old collect() already
  * landed on the driver, minus the job scaffolding).
  *
  * The schema read here is exactly what the writers produce
  * (`toDF(...).repartition(1).write.parquet`): leading INT32 key
  * column(s) and one trailing `array<double>` in Spark's standard
  * three-level LIST layout. Row order across/within files is
  * insignificant — every consumer sorts by the key columns, as the old
  * `orderBy(...).collect()` did. */
private[pipeline] object QuantizerFiles {

  private def files(spark: SparkSession,
                    path: String): Seq[org.apache.hadoop.fs.Path] = {
    val p = new org.apache.hadoop.fs.Path(path)
    val f = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    f.listStatus(p).toSeq
      .filter(st => st.isFile && st.getPath.getName.endsWith(".parquet"))
      .map(_.getPath)
  }

  private def foreachRow(spark: SparkSession, path: String)(
      fn: org.apache.parquet.example.data.Group => Unit): Unit = {
    val conf = spark.sparkContext.hadoopConfiguration
    files(spark, path).foreach { fp =>
      val rd = org.apache.parquet.hadoop.ParquetReader
        .builder(new org.apache.parquet.hadoop.example.GroupReadSupport(), fp)
        .withConf(conf).build()
      try {
        var g = rd.read()
        while (g != null) { fn(g); g = rd.read() }
      } finally rd.close()
    }
  }

  /** The trailing `array<double>` field (index `at`) of a row group —
    * Spark's three-level LIST layout: `group (LIST) { repeated group list
    * { element }}`. */
  private def vec(g: org.apache.parquet.example.data.Group,
                  at: Int): Array[Double] = {
    val lst = g.getGroup(at, 0)
    Array.tabulate(lst.getFieldRepetitionCount(0))(i =>
      lst.getGroup(0, i).getDouble(0, 0))
  }

  /** Rows of an `(INT32 key, array<double>)` parquet (centroids,
    * rotation), key-sorted. */
  def readIntVec(spark: SparkSession, path: String): Array[Array[Double]] = {
    val buf = scala.collection.mutable.ArrayBuffer[(Int, Array[Double])]()
    foreachRow(spark, path)(g => buf += ((g.getInteger(0, 0), vec(g, 1))))
    buf.sortBy(_._1).map(_._2).toArray
  }

  /** Rows of an `(INT32 m, INT32 j, array<double>)` parquet (PQ/IMI
    * codebooks), grouped by `m` and `j`-sorted — [[Similarity.readCodebooks]]'
    * `[m][ks][subDims]` shape. */
  def readIntIntVec(spark: SparkSession,
                    path: String): Array[Array[Array[Double]]] = {
    val buf = scala.collection.mutable.ArrayBuffer[(Int, Int, Array[Double])]()
    foreachRow(spark, path)(g =>
      buf += ((g.getInteger(0, 0), g.getInteger(1, 0), vec(g, 2))))
    buf.groupBy(_._1).toSeq.sortBy(_._1)
      .map(_._2.sortBy(_._2).map(_._3).toArray).toArray
  }
}
