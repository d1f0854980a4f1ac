package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Frequency-domain audio features over PCM columns: an in-place radix-2
  * FFT (Cooley–Tukey, the standard published algorithm), non-overlapping
  * rectangular-window framing, and per-frame dominant-frequency (peak
  * spectral bin) extraction — the backbone of audio fingerprinting,
  * voice-activity detection, and spectrogram featurization in a training
  * pipeline.
  *
  * Everything here is a narrow per-document map (decode bytes → frames →
  * FFT → integer bin) with no shuffle at all; at 100 TB the work
  * distributes as one pass over the blob column.
  *
  * The gate ([[wavSpectrogramStats]]) synthesizes square-wave WAVs whose
  * samples are pure integer arithmetic, decodes them through the REAL
  * RIFF walk, and reports each frame's peak bin. The DuckDB oracle
  * recomputes the same answer with a direct O(n²) DFT — a different
  * algorithm whose floating-point rounding differs in the last ulps, so
  * agreement on the integer argmax certifies the FFT (a square wave's
  * fundamental carries ≥9× the power of its strongest harmonic; ulp noise
  * cannot flip the winner).
  */
object Audio {

  /** In-place iterative radix-2 FFT (decimation in time, bit-reversal
    * permutation then butterflies). `re.length` must be a power of two. */
  def fft(re: Array[Double], im: Array[Double]): Unit = {
    val n = re.length
    require(n == im.length && (n & (n - 1)) == 0, s"fft size $n not a power of 2")
    // bit-reversal permutation
    var i = 1
    var j = 0
    while (i < n) {
      var bit = n >> 1
      while ((j & bit) != 0) { j ^= bit; bit >>= 1 }
      j |= bit
      if (i < j) {
        val tr = re(i); re(i) = re(j); re(j) = tr
        val ti = im(i); im(i) = im(j); im(j) = ti
      }
      i += 1
    }
    // butterflies
    var len = 2
    while (len <= n) {
      val ang = -2.0 * math.Pi / len
      val wr = math.cos(ang)
      val wi = math.sin(ang)
      var base = 0
      while (base < n) {
        var cr = 1.0
        var ci = 0.0
        var k = 0
        while (k < len / 2) {
          val ur = re(base + k); val ui = im(base + k)
          val vr = re(base + k + len / 2) * cr - im(base + k + len / 2) * ci
          val vi = re(base + k + len / 2) * ci + im(base + k + len / 2) * cr
          re(base + k) = ur + vr; im(base + k) = ui + vi
          re(base + k + len / 2) = ur - vr; im(base + k + len / 2) = ui - vi
          val ncr = cr * wr - ci * wi
          ci = cr * wi + ci * wr; cr = ncr
          k += 1
        }
        base += len
      }
      len <<= 1
    }
  }

  /** Power spectrum |X[b]|² for b = 0..n/2 of a real frame. */
  def powerSpectrum(frame: Array[Double]): Array[Double] = {
    val re = frame.clone()
    val im = new Array[Double](frame.length)
    fft(re, im)
    Array.tabulate(frame.length / 2 + 1)(b => re(b) * re(b) + im(b) * im(b))
  }

  /** Dominant non-DC bin of a frame: argmax of |X[b]|² over 1..n/2,
    * lowest bin on ties. */
  def peakBin(frame: Array[Double]): Int = {
    val p = powerSpectrum(frame)
    var best = 1
    var b = 2
    while (b < p.length) {
      if (p(b) > p(best)) best = b
      b += 1
    }
    best
  }

  /** Frame `samples` into non-overlapping `frameLen` windows (dropping
    * the trailing partial frame, the standard STFT convention) and emit
    * each frame's peak bin. */
  def spectrogramPeaks(samples: Array[Double], frameLen: Int): Seq[(Int, Int)] =
    (0 until samples.length / frameLen).map { f =>
      (f, peakBin(samples.slice(f * frameLen, (f + 1) * frameLen)))
    }

  /** 16-bit LE PCM samples from a WAV blob's data chunk — the shared
    * validated RIFF walk ([[Multimodal.pcm16DataChunk]]: truncation
    * clamped, malformed chunk sizes rejected instead of looping). */
  def wavSamples(b: Array[Byte]): Option[Array[Double]] = {
    def le16(off: Int) = (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)
    Multimodal.pcm16DataChunk(b).map { case (dataOff, clamped) =>
      Array.tabulate(clamped / 2)(k => ((le16(dataOff + 2 * k) << 16) >> 16).toDouble)
    }
  }

  /** Gate frame length (64 samples → 33 power bins). */
  val GateFrameLen = 64

  /** Fixture samples for the gate: two 64-sample frames per doc, frame f
    * a ±1000 square wave at integer bin `(doc_id + f) % 15 + 1` —
    * integer-exact, so the SQL oracle regenerates them verbatim. */
  def gateSample(id: Long, frame: Int, k: Int): Int = {
    val f = ((id + frame) % 15).toInt + 1
    if ((k * f) % GateFrameLen < GateFrameLen / 2) 1000 else -1000
  }

  /** Spectrogram gate: synthesize the square-wave WAV, decode it through
    * the real RIFF/PCM walk, frame + FFT, report each frame's peak bin. */
  def wavSpectrogramStats(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    docs.select(col("doc_id").cast("long")).as[Long]
      .flatMap { id =>
        val samples = Array.tabulate(2 * GateFrameLen) { g =>
          gateSample(id, g / GateFrameLen, g % GateFrameLen).toShort
        }
        val wav = synthWavPcm(samples, sampleRate = 8000)
        val pcm = wavSamples(wav).get
        spectrogramPeaks(pcm, GateFrameLen).map { case (f, bin) =>
          (id, f, bin)
        }
      }.toDF("doc_id", "frame_idx", "peak_bin")
  }

  /** Mel scale (O'Shaughnessy 1987): mel = 2595·log₁₀(1 + f/700). */
  def hzToMel(f: Double): Double = 2595.0 * math.log10(1.0 + f / 700.0)
  def melToHz(m: Double): Double = 700.0 * (math.pow(10.0, m / 2595.0) - 1.0)

  /** Triangular mel filterbank over `nBins` linear power bins (0..n/2 of
    * an `2·(nBins−1)`-point FFT at `sampleRate`): `nMels` filters with
    * centers equally spaced on the mel scale, each row normalized to the
    * standard unit-peak triangle. */
  def melFilterbank(nBins: Int, nMels: Int, sampleRate: Int): Array[Array[Double]] =
    fbCache.computeIfAbsent((nBins, nMels, sampleRate),
      _ => buildMelFilterbank(nBins, nMels, sampleRate))

  // one filterbank per parameter triple per JVM: mfccFrame runs per
  // FRAME at corpus scale, and rebuilding the matrix each call would
  // dominate the featurization cost
  private val fbCache =
    new java.util.concurrent.ConcurrentHashMap[(Int, Int, Int), Array[Array[Double]]]()

  private def buildMelFilterbank(nBins: Int, nMels: Int,
                                 sampleRate: Int): Array[Array[Double]] = {
    val nFft = 2 * (nBins - 1)
    val fMax = sampleRate / 2.0
    val mels = Array.tabulate(nMels + 2)(i => hzToMel(fMax) * i / (nMels + 1))
    val binF = Array.tabulate(nBins)(b => b.toDouble * sampleRate / nFft)
    Array.tabulate(nMels) { m =>
      val (lo, c, hi) = (melToHz(mels(m)), melToHz(mels(m + 1)), melToHz(mels(m + 2)))
      Array.tabulate(nBins) { b =>
        val f = binF(b)
        if (f <= lo || f >= hi) 0.0
        else if (f <= c) (f - lo) / (c - lo)
        else (hi - f) / (hi - c)
      }
    }
  }

  /** Orthonormal DCT-II of `x` (the MFCC decorrelation transform). */
  def dct2(x: Array[Double]): Array[Double] = {
    val n = x.length
    Array.tabulate(n) { k =>
      var s = 0.0
      var i = 0
      while (i < n) {
        s += x(i) * math.cos(math.Pi * k * (2 * i + 1) / (2.0 * n))
        i += 1
      }
      s * (if (k == 0) math.sqrt(1.0 / n) else math.sqrt(2.0 / n))
    }
  }

  /** MFCCs of one frame: power spectrum → mel energies → ln (floored at
    * `floor`, default 1e-10, against empty filters) → DCT-II, first
    * `nCoef` kept. The gate passes floor=1.0: the square-wave fixture's
    * true harmonic powers are ≥ ~1e5 while FFT-vs-direct-DFT cancellation
    * residue in silent bins is ≤ ~1e-3, so the floor snaps residue-only
    * filters to ln(1)=0 IDENTICALLY in both engines — the same
    * robust-quantity trick q_mm_spectrogram plays with the integer
    * argmax. */
  def mfccFrame(frame: Array[Double], nMels: Int, nCoef: Int,
                sampleRate: Int, floor: Double = 1e-10): Array[Double] = {
    val p = powerSpectrum(frame)
    val fb = melFilterbank(p.length, nMels, sampleRate)
    val logMel = Array.tabulate(nMels) { m =>
      var e = 0.0
      var b = 0
      while (b < p.length) { e += fb(m)(b) * p(b); b += 1 }
      math.log(math.max(e, floor))
    }
    dct2(logMel).take(nCoef)
  }

  /** MFCC gate geometry: the spectrogram fixture frames (64 samples, 33
    * bins at 8 kHz), 10 mel filters, first 4 coefficients. */
  val GateMels = 10
  val GateCoefs = 4
  val GateSampleRate = 8000
  val GateMfccFloor = 1.0

  /** MFCC gate: synthesize the SAME square-wave WAV family as
    * [[wavSpectrogramStats]], decode through the real RIFF walk, and run
    * the full power-spectrum → mel filterbank → ln → DCT-II chain. One
    * row per (doc, frame, coefficient), rounded to 6 decimals — the
    * oracle recomputes it from a direct DFT with the filterbank and DCT
    * matrices baked as literals generated from THESE Scala arrays. */
  def wavMfccStats(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    docs.select(col("doc_id").cast("long")).as[Long]
      .flatMap { id =>
        val samples = Array.tabulate(2 * GateFrameLen) { g =>
          gateSample(id, g / GateFrameLen, g % GateFrameLen).toShort
        }
        val pcm = wavSamples(synthWavPcm(samples, GateSampleRate)).get
        (0 until pcm.length / GateFrameLen).flatMap { f =>
          val frame = pcm.slice(f * GateFrameLen, (f + 1) * GateFrameLen)
          mfccFrame(frame, GateMels, GateCoefs, GateSampleRate, GateMfccFloor)
            .zipWithIndex.map { case (v, k) => (id, f, k, v) }
        }
      }.toDF("doc_id", "frame_idx", "coef_idx", "mfcc")
      .withColumn("mfcc", round(col("mfcc"), 6))
  }

  /** Linear PCM resampler, half-sample-center convention with edge
    * clamp (the 1-D sibling of Images.bilinearResize): output sample x
    * blends the two nearest input samples at sx = (x+0.5)·n/m − 0.5,
    * round-half-up back to integers. */
  def resampleLinear(samples: Array[Double], outLen: Int): Array[Double] = {
    val n = samples.length
    val out = new Array[Double](outLen)
    var x = 0
    while (x < outLen) {
      val sxRaw = (x + 0.5) * n / outLen - 0.5
      val sx = math.min(math.max(sxRaw, 0.0), (n - 1).toDouble)
      val i0 = sx.toInt
      val i1 = math.min(i0 + 1, n - 1)
      val f = sx - i0
      out(x) = math.floor((1 - f) * samples(i0) + f * samples(i1) + 0.5)
      x += 1
    }
    out
  }

  /** Resample gate: decode the q_mm_audio_feats WAV fixture family and
    * 2× upsample — at ratio ½ every blend weight is a quarter (dyadic),
    * so both engines compute identical integers; the oracle spells the
    * interpolation out over the closed-form PCM samples. */
  def wavResampleStats(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    docs.select(col("doc_id").cast("long")).as[Long]
      .filter(_ % 2 == 0)
      .mapPartitions(_.map { id =>
        val wav = Multimodal.synthWav(
          channels = if (id % 3 == 0) 2 else 1,
          sampleRate = 8000 * (1 + (id % 3).toInt),
          bitsPerSample = 16,
          nFrames = (id % 50).toInt + 1)
        val pcm = wavSamples(wav).get
        val up = resampleLinear(pcm, pcm.length * 2)
        var s = 0L
        var i = 0
        while (i < up.length) { s += (i + 1).toLong * up(i).toLong; i += 1 }
        (id, pcm.length.toLong, up.length.toLong, s)
      }).toDF("doc_id", "n_in", "n_out", "wsum")
  }

  // ---- G.711 companded telephony PCM (ITU-T G.711: µ-law / A-law) -----
  // the 8-bit formats the speech slice of a web/audio corpus actually
  // arrives in; pure integer expansion, so the oracle reproduces it

  /** Expand one µ-law byte: complement, then ((mant·8 + 0x84) << exp) −
    * 0x84, negative when the (complemented) sign bit is set. */
  def muLawToPcm(u0: Int): Int = {
    val u = ~u0 & 0xff
    val mag = ((((u & 0x0f) << 3) + 0x84) << ((u >> 4) & 7)) - 0x84
    if ((u & 0x80) != 0) -mag else mag
  }

  /** Expand one A-law byte: xor 0x55; segment 0 is linear, higher
    * segments shift — and the SIGN convention is µ-law's opposite (set
    * bit ⇒ positive). */
  def aLawToPcm(a0: Int): Int = {
    val a = a0 ^ 0x55
    val exp = (a >> 4) & 7
    val mant = a & 0x0f
    val mag = if (exp == 0) (mant << 4) + 8 else ((mant << 4) + 0x108) << (exp - 1)
    if ((a & 0x80) != 0) mag else -mag
  }

  /** Locate a WAV data chunk of ANY of the supported sample codings:
    * returns (dataOff, clampedLen, audioFormat) for format 1 (16-bit
    * PCM), 6 (A-law, 8-bit) or 7 (µ-law, 8-bit); same malformed-chunk
    * guards as the PCM16 walk. */
  def wavDataChunkAny(b: Array[Byte]): Option[(Int, Int, Int)] = {
    if (b.length < 12 ||
      !(b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F')) return None
    def le16(off: Int) = (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)
    def le32(off: Int) = le16(off) | (le16(off + 2) << 16)
    var off = 12
    var dataOff = -1; var dataLen = 0; var bits = 0; var fmt = 0
    var ok = true
    while (ok && off + 8 <= b.length) {
      val id4 = new String(b, off, 4, "US-ASCII")
      val sz = le32(off + 4)
      if (sz < 0) return None
      if (id4 == "fmt " && off + 24 <= b.length) {
        fmt = le16(off + 8)
        bits = le16(off + 22)
      }
      if (id4 == "data") { dataOff = off + 8; dataLen = sz }
      val next = off.toLong + 8L + sz + (sz & 1)
      if (next > b.length) ok = false else off = next.toInt
    }
    val supported = (fmt == 1 && bits == 16) ||
      ((fmt == 6 || fmt == 7) && bits == 8)
    if (!supported || dataOff < 0) None
    else Some((dataOff, math.max(0, math.min(dataLen, b.length - dataOff)), fmt))
  }

  /** Linear samples from a WAV of any supported coding: 16-bit PCM reads
    * as-is; µ-law / A-law bytes expand through the G.711 tables; IMA
    * ADPCM blocks decode through the state machine — the output feeds
    * the same FFT/MFCC/resample operators untouched. */
  def wavSamplesAny(b: Array[Byte]): Option[Array[Double]] =
    wavDataChunkAny(b).map { case (dataOff, len, fmt) =>
      fmt match {
        case 1 =>
          def le16(off: Int) = (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)
          Array.tabulate(len / 2)(k => ((le16(dataOff + 2 * k) << 16) >> 16).toDouble)
        case 7 => Array.tabulate(len)(k => muLawToPcm(b(dataOff + k) & 0xff).toDouble)
        case _ => Array.tabulate(len)(k => aLawToPcm(b(dataOff + k) & 0xff).toDouble)
      }
    }.orElse(imaAdpcmSamples(b))

  // ---- IMA/DVI ADPCM (WAV format 0x11) ---------------------------------
  // the 4-bit block-structured speech coding (IMA "DVI4" — the published
  // step/index tables); pure integer state machine, so a recursive-CTE
  // oracle replays it exactly

  val ImaStepTable: Array[Int] = Array(
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
    41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
    190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
    724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
    6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
    16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767)

  val ImaIndexTable: Array[Int] = Array(-1, -1, -1, -1, 2, 4, 6, 8,
    -1, -1, -1, -1, 2, 4, 6, 8)

  /** One ADPCM step: (predictor, index) × nibble → next state. */
  def imaStep(pred: Int, index: Int, nibble: Int): (Int, Int) = {
    val step = ImaStepTable(index)
    var diff = step >> 3
    if ((nibble & 1) != 0) diff += step >> 2
    if ((nibble & 2) != 0) diff += step >> 1
    if ((nibble & 4) != 0) diff += step
    val p = if ((nibble & 8) != 0) pred - diff else pred + diff
    (math.max(-32768, math.min(32767, p)),
      math.max(0, math.min(88, index + ImaIndexTable(nibble))))
  }

  /** Decode a mono IMA-ADPCM WAV data chunk: each `blockAlign`-byte block
    * opens with (predictor int16 LE, index u8, reserved) — the predictor
    * IS the block's first sample — followed by nibbles, LOW nibble first,
    * (blockAlign−4)·2 per block; a trailing partial block yields its
    * decodable prefix. */
  def imaAdpcmSamples(b: Array[Byte]): Option[Array[Double]] = {
    if (b.length < 12 ||
      !(b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F')) return None
    def le16(off: Int) = (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)
    def le32(off: Int) = le16(off) | (le16(off + 2) << 16)
    var off = 12
    var dataOff = -1; var dataLen = 0; var fmt = 0; var blockAlign = 0
    var channels = 0
    var ok = true
    while (ok && off + 8 <= b.length) {
      val id4 = new String(b, off, 4, "US-ASCII")
      val sz = le32(off + 4)
      if (sz < 0) return None
      if (id4 == "fmt " && off + 24 <= b.length) {
        fmt = le16(off + 8)
        channels = le16(off + 10)
        blockAlign = le16(off + 20)
      }
      if (id4 == "data") { dataOff = off + 8; dataLen = sz }
      val next = off.toLong + 8L + sz + (sz & 1)
      if (next > b.length) ok = false else off = next.toInt
    }
    if (fmt != 0x11 || channels != 1 || blockAlign < 5 || dataOff < 0) return None
    val len = math.max(0, math.min(dataLen, b.length - dataOff))
    val out = scala.collection.mutable.ArrayBuffer.empty[Double]
    var blk = dataOff
    while (blk + 4 <= dataOff + len) {
      var pred = (le16(blk) << 16) >> 16 // sign-extend
      var idx = b(blk + 2) & 0xff
      if (idx > 88) return None
      out += pred.toDouble
      val end = math.min(blk + blockAlign, dataOff + len)
      var p = blk + 4
      while (p < end) {
        val byte = b(p) & 0xff
        var half = 0
        while (half < 2) {
          val (np, ni) = imaStep(pred, idx, if (half == 0) byte & 0xf else byte >> 4)
          pred = np; idx = ni
          out += pred.toDouble
          half += 1
        }
        p += 1
      }
      blk += blockAlign
    }
    Some(out.toArray)
  }

  /** Mono IMA-ADPCM WAV around an explicit nibble stream (one block):
    * fixture synthesizer for the gate. `nibbles.length` must be even
    * (nibbles pack two per byte). */
  def synthWavImaAdpcm(pred0: Int, idx0: Int, nibbles: Array[Int],
                       sampleRate: Int): Array[Byte] = {
    require(nibbles.length % 2 == 0 && idx0 >= 0 && idx0 <= 88)
    val blockAlign = 4 + nibbles.length / 2
    val bb = java.nio.ByteBuffer.allocate(44 + blockAlign)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + blockAlign)
      .put("WAVE".getBytes("US-ASCII"))
    bb.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(0x11.toShort)
      .putShort(1.toShort).putInt(sampleRate)
      .putInt(sampleRate * blockAlign / (nibbles.length + 1))
      .putShort(blockAlign.toShort)
      .putShort(4.toShort)
    bb.put("data".getBytes("US-ASCII")).putInt(blockAlign)
    bb.putShort(pred0.toShort).put(idx0.toByte).put(0.toByte)
    nibbles.grouped(2).foreach { case Array(lo, hi) =>
      bb.put(((hi << 4) | (lo & 0xf)).toByte)
    }
    bb.array()
  }

  /** ADPCM gate: one doc_id-derived block per doc (nibble k =
    * (k·7 + id) mod 16 — sweeps signs, magnitudes and index moves;
    * initial predictor/index also id-derived), decoded through the real
    * RIFF walk + state machine; the position-weighted sum pins every
    * decoded sample. */
  def wavAdpcmStats(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    docs.select(col("doc_id").cast("long")).as[Long]
      .mapPartitions(_.map { id =>
        val n = 2 * ((id % 25).toInt + 1)
        val nibbles = Array.tabulate(n)(k => ((k * 7 + id) % 16).toInt)
        val pred0 = ((id * 131) % 4096).toInt - 2048
        val idx0 = (id % 89).toInt
        val pcm = imaAdpcmSamples(synthWavImaAdpcm(pred0, idx0, nibbles, 8000)).get
        var s = 0L
        var k = 0
        while (k < pcm.length) { s += (k + 1).toLong * pcm(k).toLong; k += 1 }
        (id, pcm.length.toLong, s)
      }).toDF("doc_id", "n_samples", "wsum")
  }

  /** Mono 8-bit companded WAV around explicit G.711 bytes (`fmt` 6 or
    * 7). */
  def synthWavG711(fmt: Int, payload: Array[Byte], sampleRate: Int): Array[Byte] = {
    require(fmt == 6 || fmt == 7)
    val bb = java.nio.ByteBuffer.allocate(44 + payload.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + payload.length)
      .put("WAVE".getBytes("US-ASCII"))
    bb.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(fmt.toShort)
      .putShort(1.toShort).putInt(sampleRate)
      .putInt(sampleRate) // byte rate: 1 byte/sample mono
      .putShort(1.toShort)
      .putShort(8.toShort)
    bb.put("data".getBytes("US-ASCII")).putInt(payload.length)
    bb.put(payload)
    bb.array()
  }

  /** G.711 gate: µ-law WAVs for even ids, A-law for odd, payload byte
    * k = (k·31 + doc_id) mod 256 (sweeps every segment and both signs),
    * decoded through the real RIFF walk + expansion; the position-
    * weighted sum pins every byte's linear value. */
  def wavG711Stats(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    docs.select(col("doc_id").cast("long")).as[Long]
      .mapPartitions(_.map { id =>
        val n = (id % 40).toInt + 1
        val payload = Array.tabulate(n)(k => ((k * 31 + id) % 256).toByte)
        val fmt = if (id % 2 == 0) 7 else 6
        val pcm = wavSamplesAny(synthWavG711(fmt, payload, 8000)).get
        var s = 0L
        var k = 0
        while (k < pcm.length) { s += (k + 1).toLong * pcm(k).toLong; k += 1 }
        (id, pcm.length.toLong, s)
      }).toDF("doc_id", "n_samples", "wsum")
  }

  /** Canonical 44-byte-header mono 16-bit PCM WAV around explicit
    * samples (the payload-controlled sibling of [[Multimodal.synthWav]]). */
  def synthWavPcm(samples: Array[Short], sampleRate: Int): Array[Byte] = {
    val dataLen = samples.length * 2
    val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
    bb.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1.toShort)
      .putShort(1.toShort).putInt(sampleRate)
      .putInt(sampleRate * 2)
      .putShort(2.toShort)
      .putShort(16.toShort)
    bb.put("data".getBytes("US-ASCII")).putInt(dataLen)
    samples.foreach(bb.putShort)
    bb.array()
  }
}
