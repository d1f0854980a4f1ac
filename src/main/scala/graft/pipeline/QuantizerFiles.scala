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
    val out = f.listStatus(p).toSeq
      .filter(st => st.isFile && st.getPath.getName.endsWith(".parquet"))
      .map(_.getPath)
    // fail LOUD on a footer-less directory (crashed/partial write): the
    // old spark.read.parquet threw here; silently returning zero rows
    // would surface as empty quantizers far from the corrupt-metadata
    // cause. Every writer (ours and the legacy Spark one) emits ≥ 1
    // .parquet file even for zero rows, so emptiness is always damage.
    if (out.isEmpty)
      throw new IllegalStateException(
        s"no parquet files under $path — quantizer/sidecar metadata " +
          "missing or partially written (crashed write?)")
    out
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

  // ---- driver-direct writers ----------------------------------------------
  // The quantizer/sidecar values being persisted are DRIVER ARRAYS (a few
  // KB); `toDF(...).repartition(1).write.parquet` spent a full Spark job
  // (plan + schedule + task + commit protocol) per write to move bytes the
  // driver already holds. These writers produce the SAME file layout —
  // Spark-readable standard three-level LISTs — with zero jobs.

  private def listField(name: String): org.apache.parquet.schema.Type =
    org.apache.parquet.schema.Types.optionalGroup()
      .as(org.apache.parquet.schema.LogicalTypeAnnotation.listType())
      .addField(org.apache.parquet.schema.Types.repeatedGroup()
        .addField(org.apache.parquet.schema.Types
          .optional(org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName.DOUBLE)
          .named("element"))
        .named("list"))
      .named(name)

  private def intField(name: String): org.apache.parquet.schema.Type =
    org.apache.parquet.schema.Types
      .optional(org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName.INT32)
      .named(name)

  private def writeGroups(spark: SparkSession, path: String,
                          schema: org.apache.parquet.schema.MessageType)(
      fill: (org.apache.parquet.example.data.simple.SimpleGroupFactory,
             org.apache.parquet.example.data.Group => Unit) => Unit): Unit = {
    val conf = spark.sparkContext.hadoopConfiguration
    val dir = new org.apache.hadoop.fs.Path(path)
    val f = dir.getFileSystem(conf)
    f.delete(dir, true) // mode("overwrite") semantics
    f.mkdirs(dir)
    // stage-then-rename commit (the FileOutputCommitter discipline the
    // replaced Spark write had): the in-progress name does not end in
    // .parquet, so readers — whose file filter only admits *.parquet —
    // never observe a footer-less partial file; a crash mid-write leaves
    // only the staged file and [[files]] fails loud on the empty result.
    // ASSUMES an atomic FileSystem.rename (HDFS / local FS — the store's
    // deployment substrate); on an object store whose rename is
    // copy+delete (S3A) a concurrent reader could observe a partial
    // .parquet, the same caveat every rename-committed layout here has.
    // The delete(dir) above also sweeps any crashed write's stale
    // `.inprogress` leftover on the rewrite path; a never-rewritten dir's
    // orphan is inert (the read filter never admits it).
    val base = s"part-00000-${java.util.UUID.randomUUID()}.parquet"
    val staged = new org.apache.hadoop.fs.Path(dir, s"$base.inprogress")
    val file = new org.apache.hadoop.fs.Path(dir, base)
    val factory = new org.apache.parquet.example.data.simple.SimpleGroupFactory(schema)
    val w = org.apache.parquet.hadoop.example.ExampleParquetWriter
      .builder(org.apache.parquet.hadoop.util.HadoopOutputFile.fromPath(staged, conf))
      .withType(schema).build()
    try fill(factory, g => w.write(g)) finally w.close()
    if (!f.rename(staged, file))
      throw new IllegalStateException(s"could not commit $staged to $file")
  }

  private def addVec(g: org.apache.parquet.example.data.Group, field: String,
                     v: Array[Double]): Unit = {
    val lst = g.addGroup(field)
    var i = 0
    while (i < v.length) { lst.addGroup("list").add("element", v(i)); i += 1 }
  }

  /** Write `(key, vector)` rows (centroids / rotation layout). */
  def writeIntVec(spark: SparkSession, path: String, keyName: String,
                  vecName: String, rows: Iterable[(Int, Array[Double])]): Unit = {
    val schema = new org.apache.parquet.schema.MessageType("spark_schema",
      intField(keyName), listField(vecName))
    writeGroups(spark, path, schema) { (fac, write) =>
      rows.foreach { case (k, v) =>
        val g = fac.newGroup()
        g.add(keyName, k); addVec(g, vecName, v)
        write(g)
      }
    }
  }

  /** Write `(m, j, vector)` rows (PQ/IMI codebooks layout). */
  def writeIntIntVec(spark: SparkSession, path: String,
                     rows: Iterable[(Int, Int, Array[Double])]): Unit = {
    val schema = new org.apache.parquet.schema.MessageType("spark_schema",
      intField("m"), intField("j"), listField("c"))
    writeGroups(spark, path, schema) { (fac, write) =>
      rows.foreach { case (m, j, v) =>
        val g = fac.newGroup()
        g.add("m", m); g.add("j", j); addVec(g, "c", v)
        write(g)
      }
    }
  }

  /** Write a single-column `bv BIGINT` parquet (decision sidecars — the
    * values are a bounded driver array by construction). */
  def writeLongs(spark: SparkSession, path: String, name: String,
                 values: Iterable[Long]): Unit = {
    val schema = new org.apache.parquet.schema.MessageType("spark_schema",
      org.apache.parquet.schema.Types
        .optional(org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName.INT64)
        .named(name))
    writeGroups(spark, path, schema) { (fac, write) =>
      values.foreach { v =>
        val g = fac.newGroup()
        g.add(name, v)
        write(g)
      }
    }
  }
}
