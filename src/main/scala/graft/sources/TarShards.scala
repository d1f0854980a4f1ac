package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** WebDataset-style tar shards — the de-facto large-scale training-data
  * container (Aizman et al., "High Performance I/O For Large Scale Deep
  * Learning"; the `webdataset` loader convention): a dataset is a set of
  * POSIX tar files, a SAMPLE is the run of adjacent entries sharing a
  * basename key (`000123.txt`, `000123.json`, `000123.jpg`, …), and
  * training jobs stream whole shards sequentially.
  *
  * Pure-JDK ustar read/write (the format is a 512-byte octal-field header
  * per entry + payload padded to 512 — no compression layer here; wrap
  * the shard bytes in gzip externally if desired).
  *
  * Scale shape: a shard is one binary blob; [[entries]]/[[samples]] are
  * NARROW per-row flatMaps (no shuffle — sample grouping uses tar
  * adjacency, the same property the webdataset loader exploits), so a
  * 100 TB corpus of 1 GB shards reads as one task per shard, exactly the
  * sequential-IO pattern the format was designed for. [[writeShards]]
  * shuffles once on the shard key, builds each tar in its writer task,
  * and emits byte-deterministic shards (fixed mtime/uid, key-sorted
  * entries) so a re-run reproduces identical files.
  */
object TarShards {

  private val BlockSize = 512

  private def octal(v: Long, width: Int): Array[Byte] = {
    // width-1 octal digits + NUL, zero-padded — the most portable encoding
    val s = java.lang.Long.toOctalString(v)
    val pad = "0" * (width - 1 - s.length) + s
    (pad + "\u0000").getBytes(java.nio.charset.StandardCharsets.US_ASCII)
  }

  /** One ustar header block for a regular file. */
  private def header(name: String, size: Long): Array[Byte] = {
    require(name.getBytes("UTF-8").length <= 100, s"tar entry name too long: $name")
    val b = new Array[Byte](BlockSize)
    val nameB = name.getBytes("UTF-8")
    System.arraycopy(nameB, 0, b, 0, nameB.length)
    System.arraycopy(octal(420, 8), 0, b, 100, 8) // mode 0644
    System.arraycopy(octal(0, 8), 0, b, 108, 8) // uid
    System.arraycopy(octal(0, 8), 0, b, 116, 8) // gid
    System.arraycopy(octal(size, 12), 0, b, 124, 12)
    System.arraycopy(octal(0, 12), 0, b, 136, 12) // mtime 0: determinism
    java.util.Arrays.fill(b, 148, 156, ' '.toByte) // chksum field = spaces
    b(156) = '0' // typeflag: regular file
    System.arraycopy("ustar\u000000".getBytes("US-ASCII"), 0, b, 257, 8)
    var sum = 0L
    var i = 0
    while (i < BlockSize) { sum += b(i) & 0xff; i += 1 }
    val chk = octal(sum, 7) // 6 digits + NUL, then a space
    System.arraycopy(chk, 0, b, 148, 7)
    b(155) = ' '
    b
  }

  /** Write one entry (header + payload + block padding) to a stream. */
  private def writeEntry(out: java.io.OutputStream, name: String,
                         payload: Array[Byte]): Unit = {
    out.write(header(name, payload.length.toLong))
    out.write(payload)
    val pad = (BlockSize - payload.length % BlockSize) % BlockSize
    if (pad > 0) out.write(new Array[Byte](pad))
  }

  /** The end-of-archive marker (two zero blocks). */
  private def writeTrailer(out: java.io.OutputStream): Unit =
    out.write(new Array[Byte](2 * BlockSize))

  /** Serialize (name, payload) entries into one ustar archive (entry
    * order preserved; two zero blocks terminate). Byte-deterministic. */
  def writeTar(entries: Seq[(String, Array[Byte])]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    entries.foreach { case (name, payload) => writeEntry(out, name, payload) }
    writeTrailer(out)
    out.toByteArray
  }

  /** Transparent gzip: `.tar.gz` shards (the other common WebDataset
    * on-disk form) inflate before the walk; plain tars pass through. */
  private def gunzipIfNeeded(b: Array[Byte]): Array[Byte] =
    if (b.length >= 2 && (b(0) & 0xff) == 0x1f && (b(1) & 0xff) == 0x8b) {
      val in = new java.util.zip.GZIPInputStream(
        new java.io.ByteArrayInputStream(b))
      try in.readAllBytes() finally in.close()
    } else b

  /** Parse an ustar archive (gzip-transparent) into (name, payload)
    * entries. Tolerates GNU and pax archives by SKIPPING their metadata
    * pseudo-entries (long-name 'L'/'K', pax 'x'/'g') and directory
    * entries; a malformed header — bad checksum included — or a
    * truncated archive (no end-of-archive blocks) aborts the walk
    * (returning the entries parsed so far would hide corruption —
    * callers get None). */
  def readTar(raw: Array[Byte]): Option[Seq[(String, Array[Byte])]] = {
    val b = try gunzipIfNeeded(raw)
            catch { case _: java.io.IOException => return None }
    val out = Seq.newBuilder[(String, Array[Byte])]
    var off = 0
    def octalAt(o: Int, w: Int): Long = {
      var v = 0L
      var i = o
      val end = o + w
      var seen = false
      while (i < end) {
        val c = b(i) & 0xff
        if (c >= '0' && c <= '7') { v = v * 8 + (c - '0'); seen = true; i += 1 }
        else if ((c == 0 || c == ' ') && !seen) i += 1 // leading pad
        else i = end
      }
      v
    }
    try {
      var done = false // set by the end-of-archive zero block — REQUIRED:
      // an archive that just stops (truncated download) is corrupt, not
      // "complete so far"
      while (!done && off + BlockSize <= b.length) {
        if (b.slice(off, off + BlockSize).forall(_ == 0)) done = true // end block
        else {
          val nameEnd = {
            var i = off
            while (i < off + 100 && b(i) != 0) i += 1
            i
          }
          val name = new String(b, off, nameEnd - off, "UTF-8")
          val size = octalAt(off + 124, 12)
          val typeflag = b(off + 156).toChar
          // header checksum (sum of bytes with the chksum field read as
          // spaces) — the format's defense against accepting a payload
          // block or flipped bytes as a header
          var sum = 0L
          var ci = off
          while (ci < off + BlockSize) {
            sum += (if (ci >= off + 148 && ci < off + 156) ' '.toLong
                    else (b(ci) & 0xff).toLong)
            ci += 1
          }
          if (sum != octalAt(off + 148, 8)) return None
          if (name.isEmpty || size < 0 || off + BlockSize + size > b.length) return None
          val payloadStart = off + BlockSize
          if (typeflag == '0' || typeflag == 0.toChar)
            out += name -> java.util.Arrays.copyOfRange(b, payloadStart,
              payloadStart + size.toInt)
          // 'L'/'K'/'x'/'g'/'5'…: metadata or directory — skip payload
          val pad = (BlockSize - size % BlockSize) % BlockSize
          off = payloadStart + size.toInt + pad.toInt
        }
      }
      if (done) Some(out.result()) else None
    } catch { case _: ArrayIndexOutOfBoundsException => None }
  }

  /** WebDataset key/extension split: `dir/000123.seg.txt` →
    * ("dir/000123", "seg.txt") — everything up to the FIRST dot of the
    * basename is the sample key, the rest the extension (the webdataset
    * loader's convention, which allows dotted extensions). */
  def splitKey(name: String): (String, String) = {
    val slash = name.lastIndexOf('/')
    val dot = name.indexOf('.', slash + 1)
    if (dot < 0) (name, "") else (name.substring(0, dot), name.substring(dot + 1))
  }

  /** Explode tar shards into one row per file entry:
    * (shard_id, name, key, ext, size, payload). Narrow flatMap — no
    * shuffle; a shard whose bytes fail to parse contributes no rows (a
    * corrupt shard must not kill a 100k-shard read; count them via the
    * `entries IS EMPTY` delta against the shard listing). */
  def entries(shards: DataFrame): DataFrame = {
    val spark = shards.sparkSession
    import spark.implicits._
    shards.select(col("shard_id").cast("long"), col("tar")).as[(Long, Array[Byte])]
      .flatMap { case (sid, tar) =>
        readTar(tar).getOrElse(Nil).map { case (name, payload) =>
          val (key, ext) = splitKey(name)
          (sid, name, key, ext, payload.length.toLong, payload)
        }
      }.toDF("shard_id", "name", "key", "ext", "size", "payload")
  }

  /** Assemble WebDataset SAMPLES: adjacent entries sharing a key become
    * one row (shard_id, key, exts map<ext, payload>). Grouping uses tar
    * ADJACENCY inside the per-shard walk — still a narrow flatMap, no
    * shuffle (the loader convention requires a sample's files to be
    * contiguous in the shard, which [[writeShards]] guarantees). */
  def samples(shards: DataFrame): DataFrame = {
    val spark = shards.sparkSession
    import spark.implicits._
    shards.select(col("shard_id").cast("long"), col("tar")).as[(Long, Array[Byte])]
      .flatMap { case (sid, tar) =>
        val es = readTar(tar).getOrElse(Nil)
        val out = scala.collection.mutable.ArrayBuffer.empty[(Long, String, Map[String, Array[Byte]])]
        var curKey: String = null
        var cur = Map.empty[String, Array[Byte]]
        es.foreach { case (name, payload) =>
          val (key, ext) = splitKey(name)
          if (key != curKey) {
            if (curKey != null) out += ((sid, curKey, cur))
            curKey = key; cur = Map.empty
          }
          cur += ext -> payload
        }
        if (curKey != null) out += ((sid, curKey, cur))
        out
      }.toDF("shard_id", "key", "exts")
  }

  /** Pack a (doc_id, text) corpus into `nShards` WebDataset tar shards at
    * `dir/shard-NNNNN.tar`: shard = doc_id % nShards, entries
    * `<doc_id padded>.txt` (+ `.meta` with the decimal byte length —
    * a second per-sample file, as real WebDataset samples carry),
    * key-sorted within the shard so samples are contiguous and the shard
    * bytes are deterministic across runs and partitionings. ONE shuffle
    * (the shard key); each writer task builds its tars sequentially. */
  def writeShards(docs: DataFrame, dir: String, nShards: Int): Unit = {
    val spark = docs.sparkSession
    import spark.implicits._
    // Hadoop FS, not java.nio: writer tasks run on executors, and the
    // shard dir is hdfs://-or-s3a://-shaped at fleet scale
    val serConf = new org.apache.spark.util.SerializableConfiguration(
      spark.sparkContext.hadoopConfiguration)
    val root = new org.apache.hadoop.fs.Path(dir)
    root.getFileSystem(serConf.value).mkdirs(root)
    docs.select(col("doc_id").cast("long"), col("text"))
      .withColumn("shard", pmod(col("doc_id"), lit(nShards.toLong)))
      .repartition(nShards, col("shard"))
      .sortWithinPartitions(col("shard"), col("doc_id"))
      .select(col("shard"), col("doc_id"), col("text"))
      .as[(Long, Long, String)]
      .foreachPartition { (it: Iterator[(Long, Long, String)]) =>
        // STREAMING writer: rows arrive (shard, doc_id)-sorted, so each
        // shard's entries go straight to its FS stream as they come —
        // no partition materialization, no whole-tar buffer (a 1 GB
        // shard costs one 512-byte header buffer, not 1 GB of heap)
        var fs: org.apache.hadoop.fs.FileSystem = null
        var out: java.io.OutputStream = null
        var curShard = -1L
        def closeShard(): Unit = if (out != null) {
          writeTrailer(out); out.close(); out = null
        }
        try {
          it.foreach { case (shard, id, text) =>
            if (shard != curShard) {
              closeShard()
              if (fs == null)
                fs = new org.apache.hadoop.fs.Path(dir).getFileSystem(serConf.value)
              out = fs.create(new org.apache.hadoop.fs.Path(dir,
                f"shard-$shard%05d.tar"), true)
              curShard = shard
            }
            val bytes = Option(text).getOrElse("").getBytes("UTF-8")
            writeEntry(out, f"$id%08d.txt", bytes)
            writeEntry(out, f"$id%08d.meta",
              bytes.length.toString.getBytes("US-ASCII"))
          }
        } finally closeShard()
      }
  }

  /** Read a directory of tar shards into the (shard_id, tar) relation
    * [[entries]]/[[samples]] consume — shard_id parsed from the
    * `shard-NNNNN.tar` name. Uses Spark's binaryFile source, so shards
    * split across executors one file per row. */
  def readShards(spark: SparkSession, dir: String): DataFrame =
    spark.read.format("binaryFile").option("pathGlobFilter", "*.tar*").load(dir)
      .select(
        regexp_extract(col("path"), "shard-(\\d+)\\.tar(\\.gz)?$", 1)
          .cast("long").as("shard_id"),
        col("content").as("tar"))
}
