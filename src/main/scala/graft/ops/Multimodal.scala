package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing (SURVEY.md §2.12 X4): treat image/audio/video
  * payloads as opaque `binary` columns with a typed metadata struct, and run
  * decode / feature-extraction as partition-local transforms.
  *
  * The decode kernels parse REAL container formats (since r7 — earlier
  * rounds stubbed them): P6 PPM headers with exact raster geometry, RIFF
  * WAV chunk walking to the data range, and the GV1 video container's
  * header-derived frame table — the oracle gates depend on the parsed
  * geometry, not on a fake. Only the heavyweight codec families that the
  * container formats here don't need (JPEG entropy decode, MP3, H.264) are
  * out of scope. At 100 TB the payload column would be a lazy pointer
  * (path + offset) materialized only inside the decode partition — both
  * shapes are supported here.
  */
object Multimodal {

  /** Metadata struct carried next to every binary payload. */
  val metaSchema: StructType = StructType(Seq(
    StructField("n_bytes", LongType),
    StructField("content_md5", StringType),
    StructField("media_type", StringType)))

  /** Wrap a source column as an opaque media payload + metadata. The digest
    * is computed on the base64 rendering so the same fingerprint is
    * reproducible in any engine.
    */
  def asMedia(df: DataFrame, idCol: String, payload: org.apache.spark.sql.Column,
              mediaType: String): DataFrame = {
    val bin = payload.cast(BinaryType)
    df.select(col(idCol),
      bin.as("media"),
      struct(
        length(bin).cast("long").as("n_bytes"),
        md5(base64(bin)).as("content_md5"),
        lit(mediaType).as("media_type")).as("meta"))
  }

  /** Byte-range sample of the payload (the "frame sample" of an opaque
    * stream): `n` evenly spaced slices of `sliceLen` bytes.
    */
  def sampleSlices(df: DataFrame, n: Int, sliceLen: Int): DataFrame = {
    val total = col("meta.n_bytes")
    // span floor is 0, not 1: a payload of exactly sliceLen bytes must
    // yield every slice at offset 1 (the full payload) — a floor of 1
    // shifted all-but-the-first slice off by one byte
    val offsets = transform(sequence(lit(0), lit(n - 1)),
      i => (i * greatest(total - sliceLen, lit(0L)) / lit(math.max(n - 1, 1))) + 1)
    df.withColumn("slices",
      transform(offsets, o => base64(col("media").substr(o.cast("int"), lit(sliceLen)))))
  }

  /** X4 lazy-pointer variant (SURVEY.md §2.12): at 100 TB the payload bytes
    * cannot ride through every shuffle — the row carries only a
    * `(path, offset, n_bytes)` pointer into the media store, and bytes are
    * materialized partition-locally AFTER all shuffles, immediately before
    * the decode kernel. Joins/filters/repartitions upstream move ~50 bytes
    * per row instead of megabytes.
    */
  val pointerSchema: StructType = StructType(Seq(
    StructField("path", StringType),
    StructField("offset", LongType),
    StructField("n_bytes", LongType)))

  /** Wrap pointer columns as the lazy media representation: (id, ptr,
    * meta). No payload bytes anywhere in the schema.
    */
  def asMediaPointers(df: DataFrame, idCol: String,
                      path: org.apache.spark.sql.Column,
                      offset: org.apache.spark.sql.Column,
                      nBytes: org.apache.spark.sql.Column,
                      mediaType: String): DataFrame =
    df.select(col(idCol),
      struct(path.as("path"), offset.cast("long").as("offset"),
        nBytes.cast("long").as("n_bytes")).as("ptr"),
      struct(nBytes.cast("long").as("n_bytes"),
        lit(mediaType).as("media_type")).as("meta"))

  /** Materialize pointer rows into payload bytes, partition-locally: each
    * partition opens its referenced files once (small channel cache), reads
    * the byte ranges, and emits (id, media). This is the LAST step before a
    * decode kernel — everything upstream shuffles pointers only. Local
    * filesystem reader; an object-store deployment swaps in its ranged-GET
    * client here, the Spark plumbing is identical.
    */
  def materializePointers(df: DataFrame, idCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val typed: Dataset[PointerRow] = df.select(
      col(idCol).cast("long").as("id"),
      col("ptr.path").as("path"),
      col("ptr.offset").as("offset"),
      col("ptr.n_bytes").as("nBytes")).as[PointerRow]
    typed.mapPartitions { it =>
      val channels = scala.collection.mutable.Map.empty[String, java.nio.channels.FileChannel]
      def channel(p: String) = channels.getOrElseUpdate(p,
        java.nio.channels.FileChannel.open(java.nio.file.Paths.get(p),
          java.nio.file.StandardOpenOption.READ))
      // close on TASK completion, not on iterator exhaustion: a limit/take
      // or task failure abandons the iterator mid-stream and would leak
      // the handles until GC
      Option(org.apache.spark.TaskContext.get()).foreach(_.addTaskCompletionListener[Unit] { _ =>
        channels.values.foreach(ch => scala.util.Try(ch.close())); channels.clear()
      })
      new Iterator[MediaRow] {
        override def hasNext: Boolean = {
          val more = it.hasNext
          if (!more) { channels.values.foreach(_.close()); channels.clear() }
          more
        }
        override def next(): MediaRow = {
          val row = it.next()
          // a Spark binary cell is a JVM byte[]: hard ~2 GiB ceiling
          // (HotSpot caps arrays a few elements below Int.MaxValue — an
          // allocate at the exact boundary dies as OutOfMemoryError, which
          // Spark's handler treats as executor-fatal). Fail loudly rather
          // than let .toInt wrap to a silently-short read.
          require(row.nBytes >= 0 && row.nBytes <= Int.MaxValue - 8,
            s"payload of ${row.nBytes} bytes at ${row.path}:${row.offset} exceeds the " +
              "2 GiB binary-cell limit - split oversized media into ranged pointer rows")
          val buf = java.nio.ByteBuffer.allocate(row.nBytes.toInt)
          val ch = channel(row.path)
          var pos = row.offset
          while (buf.hasRemaining) {
            val n = ch.read(buf, pos)
            require(n >= 0, s"EOF at $pos reading ${row.nBytes} bytes of ${row.path}")
            pos += n
          }
          MediaRow(row.id, buf.array())
        }
      }
    }.toDF("id", "media")
  }

  /** Binary PPM (P6) payload built with pure Column expressions: the
    * standard `P6\n<w> <h>\n255\n` ASCII header followed by w·h RGB
    * triples, pixel bytes drawn cyclically from the UTF-8 bytes of `text`
    * (empty text falls back to a single 'x' byte so the cycle is never
    * empty). PPM is the simplest real raster container (netpbm, public
    * spec) — small enough to decode without codec libraries, real enough
    * that [[decodePpm]] must genuinely parse a header to get the
    * dimensions right. Fully engine-portable: the DuckDB oracle twin
    * rebuilds the identical bytes with repeat/encode/substring.
    */
  /** First `nBytes` bytes of the endlessly-repeated UTF-8 byte cycle of
    * `text` (empty text falls back to one 'x' byte). The deterministic
    * "payload generator" both container encoders draw from — portable: the
    * DuckDB twin is repeat/encode/substr over the same bytes.
    */
  private def cycledBytes(text: org.apache.spark.sql.Column,
                          nBytes: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val base = coalesce(nullif(text, lit("")), lit("x"))
    val len = octet_length(base).cast("long")
    // ceil(nBytes/len) repeats of the byte cycle, then truncate
    val k = floor((nBytes + len - lit(1L)) / len).cast("int")
    call_function("repeat", base, k).cast(BinaryType).substr(lit(1), nBytes.cast("int"))
  }

  def encodePpm(text: org.apache.spark.sql.Column, w: org.apache.spark.sql.Column,
                h: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val npix = w.cast("long") * h.cast("long") * lit(3L)
    val header = concat_ws("", lit("P6\n"), w.cast("string"), lit(" "),
      h.cast("string"), lit("\n255\n")).cast(BinaryType)
    concat(header, cycledBytes(text, npix))
  }

  /** P6 payload whose raster is `base` bytes cycled over all but the last
    * `patchBytes` positions, with `patch` bytes cycled over the tail — the
    * "same image, small local edit" fixture for perceptual near-dup:
    * rows sharing `base` differ only in the trailing patch region, so
    * their dHashes sit a few bits apart, while different bases decorrelate
    * the whole raster. Portable: the DuckDB twin rebuilds both segments
    * with repeat/substr over the same bytes.
    */
  def encodePpmPatch(base: org.apache.spark.sql.Column, patch: org.apache.spark.sql.Column,
                     w: Int, h: Int, patchBytes: Int): org.apache.spark.sql.Column = {
    val npix = w.toLong * h * 3
    require(patchBytes > 0 && patchBytes < npix,
      s"patchBytes ($patchBytes) must sit inside the $npix-byte raster")
    val header = lit(s"P6\n$w $h\n255\n").cast(BinaryType)
    concat(header, cycledBytes(base, lit(npix - patchBytes)),
      cycledBytes(patch, lit(patchBytes.toLong)))
  }

  /** X4d: perceptual difference-hash (dHash) of a P6 payload — the image
    * twin of SimHash: a 64-bit fingerprint whose Hamming distance tracks
    * visual similarity, robust to resolution because it compares a fixed
    * 9×8 sample grid, not raw pixels.
    *
    * Kernel (all integer, engine-portable): nearest-neighbor sample the
    * raster at grid points (px, py) = (gx·w/9, gy·h/8) for gx ∈ [0,9),
    * gy ∈ [0,8); per-sample brightness = r+g+b (0..765, exact); bit
    * gy·8+gx of the hash is 1 iff brightness(gx+1, gy) > brightness(gx, gy)
    * (strict, row-wise gradient sign). Decode runs partition-local after
    * all shuffles like every kernel here — only (id, 8-byte hash) ever
    * rides an exchange, which is what makes the downstream banded Hamming
    * self-join ([[Dedup.hamming64NearDupPairs]]) a corpus-scale plan.
    *
    * Output: (id, dhash) — one LONG per image.
    */
  def ppmDHash(df: DataFrame, idCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val typed: Dataset[MediaRow] =
      df.select(col(idCol).cast("long").as("id"), col("media")).as[MediaRow]
    typed.mapPartitions(_.map { row =>
      val b = row.media
      val (width, height, _, dataAt) = ppmHeader(b, row.id)
      require(width > 0 && height > 0, s"row ${row.id}: dHash needs a nonempty raster")
      // 9 columns x 8 rows of brightness samples -> 8x8 horizontal gradients
      val g = Array.tabulate(8, 9) { (gy, gx) =>
        val px = gx * width / 9
        val py = gy * height / 8
        val off = dataAt + (py * width + px) * 3
        (b(off) & 0xFF) + (b(off + 1) & 0xFF) + (b(off + 2) & 0xFF)
      }
      var hash = 0L
      var gy = 0
      while (gy < 8) {
        var gx = 0
        while (gx < 8) {
          if (g(gy)(gx + 1) > g(gy)(gx)) hash |= (1L << (gy * 8 + gx))
          gx += 1
        }
        gy += 1
      }
      (row.id, hash)
    }).toDF("id", "dhash")
  }

  /** Little-endian 32/16-bit binary renderings of an integral column —
    * RIFF header fields (hex → byte-swapped pairs → unhex; pure built-in
    * expressions, codegen'd).
    */
  private def le32(v: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val h = lpad(hex(v.cast("long")), 8, "0")
    unhex(concat(h.substr(7, 2), h.substr(5, 2), h.substr(3, 2), h.substr(1, 2)))
  }
  private def le16(v: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val h = lpad(hex(v.cast("long")), 4, "0")
    unhex(concat(h.substr(3, 2), h.substr(1, 2)))
  }

  /** Canonical 44-byte RIFF/WAVE header (PCM, mono, 16-bit) + `nSamples`
    * little-endian samples drawn from the text byte cycle. Like
    * [[encodePpm]], a REAL container built from pure Column expressions so
    * the DuckDB twin can rebuild the identical bytes.
    */
  def encodeWav(text: org.apache.spark.sql.Column, nSamples: org.apache.spark.sql.Column,
                sampleRate: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val dataSize = nSamples.cast("long") * lit(2L)
    concat(
      lit("RIFF").cast(BinaryType), le32(lit(36L) + dataSize),
      lit("WAVE").cast(BinaryType),
      lit("fmt ").cast(BinaryType), le32(lit(16L)),
      le16(lit(1L)), le16(lit(1L)), // PCM, mono
      le32(sampleRate), le32(sampleRate.cast("long") * lit(2L)), // byte rate
      le16(lit(2L)), le16(lit(16L)), // block align, bits/sample
      lit("data").cast(BinaryType), le32(dataSize),
      cycledBytes(text, dataSize))
  }

  /** RIFF/WAVE payload whose PCM bytes are `base` cycled over all but the
    * last `patchSamples` samples, with `patch` bytes cycled over the tail —
    * the audio twin of [[encodePpmPatch]]: rows sharing `base` are "the
    * same recording with a small trailing edit" (energy hashes a few bits
    * apart), different bases decorrelate the whole sample stream. The
    * sample count should NOT be a multiple of the energy-hash segment
    * count or of the base byte-cycle length, so segment boundaries sweep
    * through cycle phases instead of aliasing (see [[wavEnergyHash]]).
    * Portable: the DuckDB twin rebuilds both byte segments with
    * repeat/substr.
    */
  def encodeWavPatch(base: org.apache.spark.sql.Column, patch: org.apache.spark.sql.Column,
                     nSamples: Int, sampleRate: Int, patchSamples: Int): org.apache.spark.sql.Column = {
    require(patchSamples > 0 && patchSamples < nSamples,
      s"patchSamples ($patchSamples) must sit inside the $nSamples-sample stream")
    val dataSize = nSamples.toLong * 2
    concat(
      lit("RIFF").cast(BinaryType), le32(lit(36L) + lit(dataSize)),
      lit("WAVE").cast(BinaryType),
      lit("fmt ").cast(BinaryType), le32(lit(16L)),
      le16(lit(1L)), le16(lit(1L)), // PCM, mono
      le32(lit(sampleRate.toLong)), le32(lit(sampleRate.toLong * 2L)),
      le16(lit(2L)), le16(lit(16L)),
      lit("data").cast(BinaryType), le32(lit(dataSize)),
      cycledBytes(base, lit(dataSize - patchSamples * 2L)),
      cycledBytes(patch, lit(patchSamples * 2L)))
  }

  /** X4g: perceptual audio fingerprint — the audio twin of [[ppmDHash]]:
    * a 64-bit energy-gradient hash whose Hamming distance tracks acoustic
    * similarity. The decoded PCM is cut into 65 equal spans (span j covers
    * samples [j·n/65, (j+1)·n/65) — integer floor boundaries, so the twin
    * is engine-portable), each folded to its exact energy Σv² (LONG: a
    * 16-bit sample squared needs 31 bits, spans stay far below 2^63), and
    * bit j is 1 iff mean energy rises: E(j+1)·len(j) > E(j)·len(j+1),
    * cross-multiplied so the comparison stays in exact integers — the
    * PER-SAMPLE normalization matters, because floor boundaries make span
    * lengths differ by one and a raw-sum comparison would encode the
    * fixed length pattern (identical for every clip) instead of content,
    * correlating unrelated clips. The hash is the temporal energy-envelope
    * shape, robust to amplitude-preserving local edits. Decode runs
    * partition-local after all shuffles like every kernel here; only
    * (id, 8-byte hash) rides an exchange, which makes the downstream
    * banded Hamming self-join ([[Dedup.hamming64NearDupPairs]]) the same
    * corpus-scale plan images use.
    *
    * Output: (id, ahash) — one LONG per clip.
    */
  def wavEnergyHash(df: DataFrame, idCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val typed: Dataset[MediaRow] =
      df.select(col(idCol).cast("long").as("id"), col("media")).as[MediaRow]
    typed.mapPartitions(_.map { row =>
      val (_, dataAt, n) = wavDataRange(row.media, row.id)
      require(n > 0, s"row ${row.id}: energy hash needs a nonempty data chunk")
      val e = new Array[Long](65)
      val len = new Array[Long](65)
      var j = 0
      while (j < 65) {
        val a = j * n / 65
        val b = (j + 1) * n / 65
        var s = 0L
        var i = a
        while (i < b) {
          val v = wavSample(row.media, dataAt, i)
          s += v.toLong * v
          i += 1
        }
        e(j) = s
        len(j) = b - a
        j += 1
      }
      var hash = 0L
      j = 0
      while (j < 64) {
        // mean-energy comparison in exact integers (e ≤ n·2^30, len ≤ n:
        // the cross-products stay far below 2^63 for any real clip)
        if (e(j + 1) * len(j) > e(j) * len(j + 1)) hash |= (1L << j)
        j += 1
      }
      (row.id, hash)
    }).toDF("id", "ahash")
  }

  /** Partition-local REAL decode kernel for RIFF/WAVE payloads: validates
    * the RIFF envelope, walks the chunk list (any order, unknown chunks
    * skipped with even-size padding per the RIFF spec), reads the PCM
    * format from `fmt `, then folds the 16-bit little-endian samples of
    * `data` into mean amplitude, peak and a checksum. Sample rate and
    * count come from the PARSED header/chunk sizes, so offset or
    * endianness bugs break the oracle hash.
    */
  /** The RIFF chunk walk shared by [[decodeWav]] and [[decodeWavSamples]]:
    * validates the envelope, returns (sampleRate, dataAt, nSamples).
    */
  private def wavDataRange(b: Array[Byte], rid: Long): (Int, Int, Int) = {
    def ascii(p: Int, n: Int) = new String(b, p, n, java.nio.charset.StandardCharsets.US_ASCII)
    def u16(p: Int): Int = (b(p) & 0xFF) | ((b(p + 1) & 0xFF) << 8)
    def u32(p: Int): Long = (b(p) & 0xFFL) | ((b(p + 1) & 0xFFL) << 8) |
      ((b(p + 2) & 0xFFL) << 16) | ((b(p + 3) & 0xFFL) << 24)
    require(b != null && b.length >= 44 && ascii(0, 4) == "RIFF" && ascii(8, 4) == "WAVE",
      s"row $rid: not a RIFF/WAVE payload")
    require(u32(4) == b.length - 8,
      s"row $rid: RIFF size ${u32(4)} != payload ${b.length - 8}")
    var p = 12
    var sampleRate = -1
    var dataAt = -1
    var dataLen = 0L
    while (p + 8 <= b.length) {
      val id = ascii(p, 4)
      val size = u32(p + 4) // unsigned: 0..2^32-1, never negative as Long
      // bound-check the DECLARED size before trusting it: a corrupt size
      // must fail loudly here, not hang the walk (a truncated-Int advance
      // of 0/negative would loop forever) or read past the buffer
      require(size <= b.length - p - 8,
        s"row $rid: chunk '$id' declares $size bytes at $p, payload has ${b.length - p - 8}")
      if (id == "fmt ") {
        require(size >= 16, s"row $rid: fmt chunk too short ($size < 16)")
        require(u16(p + 8) == 1 && u16(p + 10) == 1 && u16(p + 22) == 16,
          s"row $rid: decoder supports PCM mono 16-bit only")
        sampleRate = u32(p + 12).toInt
      } else if (id == "data") { dataAt = p + 8; dataLen = size }
      p += 8 + size.toInt + (size.toInt & 1) // RIFF pads chunks to even size
    }
    require(sampleRate > 0 && dataAt >= 0, s"row $rid: missing fmt/data chunk")
    require(dataAt + dataLen <= b.length, s"row $rid: data chunk truncated")
    (sampleRate, dataAt, (dataLen / 2).toInt)
  }

  private def wavSample(b: Array[Byte], dataAt: Int, i: Int): Int =
    (((b(dataAt + 2 * i) & 0xFF) | ((b(dataAt + 2 * i + 1) & 0xFF) << 8)).toShort).toInt

  def decodeWav(df: DataFrame, idCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val typed: Dataset[MediaRow] =
      df.select(col(idCol).cast("long").as("id"), col("media")).as[MediaRow]
    typed.mapPartitions(_.map { row =>
      val (sampleRate, dataAt, n) = wavDataRange(row.media, row.id)
      var sum = 0L
      var peak = 0
      var i = 0
      while (i < n) {
        val v = wavSample(row.media, dataAt, i)
        sum += v
        if (math.abs(v) > peak) peak = math.abs(v)
        i += 1
      }
      WavStats(row.id, sampleRate, n, if (n == 0) 0.0 else sum.toDouble / n, peak, sum)
    }).toDF("id", "sample_rate", "n_samples", "mean_amp", "peak", "pcm_checksum")
  }

  /** Decode to the raw PCM sample array — the handoff from the
    * partition-local byte kernel to column-expression feature extraction
    * ([[wavFrameEnergy]]). Runs after all shuffles like every decode here;
    * the samples column is ephemeral plan-internal state, never an
    * exchange payload.
    */
  def decodeWavSamples(df: DataFrame, idCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val typed: Dataset[MediaRow] =
      df.select(col(idCol).cast("long").as("id"), col("media")).as[MediaRow]
    typed.mapPartitions(_.map { row =>
      val (sampleRate, dataAt, n) = wavDataRange(row.media, row.id)
      (row.id, sampleRate, Array.tabulate(n)(i => wavSample(row.media, dataAt, i)).toSeq)
    }).toDF("id", "sample_rate", "smp")
  }

  /** X4f: frame-level audio features — fixed `frameLen`-sample windows
    * over the decoded PCM (tail kept short), each reduced to RMS energy
    * and peak: the frame-sample + feature-extract step of an audio
    * pipeline (VAD/energy gating runs on exactly these frames). Decode is
    * the partition-local kernel; framing and the energy folds are pure
    * column expressions over the samples array — map-side, no shuffle at
    * any scale. Sums accumulate in LONG (a 16-bit sample squared needs 31
    * bits; frames would overflow INT), divisions and the sqrt run in
    * double and round to 6 dp, so frames are engine-portable.
    *
    * Output: (id, frame_idx, n_in_frame, rms, peak).
    */
  def wavFrameEnergy(df: DataFrame, idCol: String, frameLen: Int = 16): DataFrame = {
    require(frameLen > 0, s"frameLen must be positive: $frameLen")
    decodeWavSamples(df, idCol)
      // A structurally valid WAV with an empty data chunk (n_samples = 0)
      // must yield zero frames — without this guard the ceil-div upper
      // bound is -1 and Spark's sequence(0,-1) infers step -1, emitting
      // two garbage frames [0,-1].
      .where(size(col("smp")) > 0)
      .select(col("id"), posexplode(
        // integer ceil-div (n + L-1)/L via floor: exact — array sizes sit
        // far below the 2^52 double-integer ceiling
        transform(sequence(lit(0),
            floor((size(col("smp")) + (frameLen - 1)) / frameLen).cast("int") - 1),
          i => slice(col("smp"), i * frameLen + 1, lit(frameLen)))).as(Seq("frame_idx", "__fr")))
      .select(col("id"), col("frame_idx").cast("long").as("frame_idx"),
        size(col("__fr")).cast("long").as("n_in_frame"),
        round(sqrt(aggregate(col("__fr"), lit(0L),
            (acc, v) => acc + v.cast("long") * v).cast("double") / size(col("__fr"))), 6).as("rms"),
        aggregate(col("__fr"), lit(0), (acc, v) => greatest(acc, abs(v))).as("peak"))
  }

  /** X4e: nearest-neighbor resize of a parsed P6 raster — the downsample
    * step of an image pipeline (thumbnailing before feature extraction),
    * partition-local like every kernel here. Target pixel (x2, y2) samples
    * source pixel (x2·w/w2, y2·h/h2) — the same integer floor map the
    * dHash grid uses, so the twin is engine-portable. Emits the RESIZED
    * raster's exact per-channel sums/means and checksum instead of bytes:
    * any header-walk, offset, or rounding bug changes the sums, which is
    * a stronger gate than comparing a blob the driver can't diff.
    *
    * Output: (id, width, height, mean_r, mean_g, mean_b, px_checksum) of
    * the w2×h2 result.
    */
  def ppmResizeStats(df: DataFrame, idCol: String, w2: Int, h2: Int): DataFrame = {
    require(w2 > 0 && h2 > 0, s"target dims must be positive: ${w2}x$h2")
    val spark = df.sparkSession
    import spark.implicits._
    val typed: Dataset[MediaRow] =
      df.select(col(idCol).cast("long").as("id"), col("media")).as[MediaRow]
    typed.mapPartitions(_.map { row =>
      val b = row.media
      val (w, h, _, dataAt) = ppmHeader(b, row.id)
      var sr = 0L; var sg = 0L; var sb = 0L
      var y2 = 0
      while (y2 < h2) {
        val py = y2 * h / h2
        var x2 = 0
        while (x2 < w2) {
          val px = x2 * w / w2
          val off = dataAt + (py * w + px) * 3
          sr += b(off) & 0xFF; sg += b(off + 1) & 0xFF; sb += b(off + 2) & 0xFF
          x2 += 1
        }
        y2 += 1
      }
      val n = w2.toLong * h2
      (row.id, w2, h2, sr.toDouble / n, sg.toDouble / n, sb.toDouble / n,
        sr + sg + sb)
    }).toDF("id", "width", "height", "mean_r", "mean_g", "mean_b", "px_checksum")
  }

  /** Deterministic multi-frame container for the video fixture — a real
    * parseable format the way [[encodePpm]]/[[encodeWav]] are: ASCII
    * header `GV1\n<nframes> <w> <h>\n255\n` followed by `nframes` raw
    * w·h·3-byte rasters back to back (frame f occupies byte range
    * [f·w·h·3, (f+1)·w·h·3) of the payload body — an MJPEG-like
    * concatenation). Frame bytes cycle from `text`, so consecutive frames
    * differ by cycle phase and the twin rebuilds them with repeat/substr.
    */
  def encodeGvid(text: org.apache.spark.sql.Column, nFrames: org.apache.spark.sql.Column,
                 w: Int, h: Int): org.apache.spark.sql.Column = {
    val body = nFrames.cast("long") * (w.toLong * h * 3)
    val header = concat_ws("", lit("GV1\n"), nFrames.cast("string"),
      lit(s" $w $h\n255\n")).cast(BinaryType)
    concat(header, cycledBytes(text, body))
  }

  /** X4v: video frame-sampling + per-frame feature extraction — the step a
    * video curation pipeline runs before anything model-shaped (sample
    * every `every`-th frame, reduce each to cheap features). The kernel
    * PARSES the GV1 header for real (frame count and dimensions come from
    * the bytes, the raster offsets from the parsed geometry), strides the
    * frame list, and folds each sampled frame to exact per-channel sums —
    * only (id, frame_idx, 4 numbers) ever leave the partition, the frames
    * never ride an exchange.
    *
    * Output: (id, frame_idx, mean_r, mean_g, mean_b, px_checksum) — one
    * row per SAMPLED frame.
    */
  def gvidFrameStats(df: DataFrame, idCol: String, every: Int): DataFrame = {
    require(every > 0, s"frame stride must be positive: $every")
    val spark = df.sparkSession
    import spark.implicits._
    val typed: Dataset[MediaRow] =
      df.select(col(idCol).cast("long").as("id"), col("media")).as[MediaRow]
    typed.mapPartitions(_.flatMap { row =>
      val b = row.media
      val (nFrames, w, h, dataAt) = gvidHeader(b, row.id)
      val frameBytes = w * h * 3
      (0 until nFrames by every).iterator.map { f =>
        val at = dataAt + f * frameBytes
        var sr = 0L; var sg = 0L; var sb = 0L
        var i = 0
        while (i < frameBytes) {
          sr += b(at + i) & 0xFF; sg += b(at + i + 1) & 0xFF; sb += b(at + i + 2) & 0xFF
          i += 3
        }
        val n = w.toLong * h
        (row.id, f.toLong, sr.toDouble / n, sg.toDouble / n, sb.toDouble / n,
          sr + sg + sb)
      }
    }).toDF("id", "frame_idx", "mean_r", "mean_g", "mean_b", "px_checksum")
  }

  /** The GV1 header walk shared by [[gvidFrameStats]] and
    * [[gvidTemporalHash]]: validates the magic, parses frame count /
    * geometry / maxval, and checks the body length matches the declared
    * frame list exactly. Returns (nFrames, w, h, dataAt).
    */
  private def gvidHeader(b: Array[Byte], rid: Long): (Int, Int, Int, Int) = {
    require(b != null && b.length > 4 && b(0) == 'G' && b(1) == 'V' &&
      b(2) == '1' && b(3) == '\n', s"row $rid: not a GV1 payload")
    var p = 4
    def readInt(): Int = {
      while (p < b.length && (b(p) == ' ' || b(p) == '\n')) p += 1
      var v = 0
      require(p < b.length && b(p) >= '0' && b(p) <= '9',
        s"row $rid: malformed GV1 header at $p")
      while (p < b.length && b(p) >= '0' && b(p) <= '9') { v = v * 10 + (b(p) - '0'); p += 1 }
      v
    }
    val nFrames = readInt(); val w = readInt(); val h = readInt(); val maxval = readInt()
    require(maxval == 255, s"row $rid: GV1 maxval $maxval unsupported")
    require(p < b.length && b(p) == '\n', s"row $rid: missing header terminator")
    p += 1
    require(b.length - p == nFrames.toLong * (w * h * 3),
      s"row $rid: body ${b.length - p} != $nFrames frames of ${w * h * 3}")
    (nFrames, w, h, p)
  }

  /** GV1 payload whose frame stream is `base` bytes cycled over all but
    * the last `patchFrames` frames, with `patch` bytes cycled over the
    * trailing frames — the video twin of [[encodePpmPatch]] /
    * [[encodeWavPatch]]: rows sharing `base` (and a frame count) are "the
    * same clip with a re-shot ending", so their temporal hashes sit a few
    * bits apart, while different bases decorrelate the whole stream.
    * Portable: the DuckDB twin rebuilds both byte segments with
    * repeat/substr.
    */
  def encodeGvidPatch(base: org.apache.spark.sql.Column, patch: org.apache.spark.sql.Column,
                      nFrames: org.apache.spark.sql.Column, w: Int, h: Int,
                      patchFrames: Int): org.apache.spark.sql.Column = {
    require(patchFrames > 0, s"patchFrames must be positive: $patchFrames")
    val frameBytes = w.toLong * h * 3
    val body = nFrames.cast("long") * lit(frameBytes)
    val header = concat_ws("", lit("GV1\n"), nFrames.cast("string"),
      lit(s" $w $h\n255\n")).cast(BinaryType)
    concat(header, cycledBytes(base, body - lit(patchFrames * frameBytes)),
      cycledBytes(patch, lit(patchFrames * frameBytes)))
  }

  /** X4h: perceptual video fingerprint — the temporal twin of [[ppmDHash]]
    * (spatial) and [[wavEnergyHash]] (acoustic): a 64-bit
    * brightness-envelope hash whose Hamming distance tracks temporal
    * similarity. Each frame folds to its exact brightness Σ(r+g+b) (LONG),
    * the frame list is cut into 65 floor-boundary spans (span j covers
    * frames [j·nf/65, (j+1)·nf/65) — needs nf ≥ 65 so no span is empty),
    * and bit j is 1 iff mean brightness rises: B(j+1)·len(j) >
    * B(j)·len(j+1), cross-multiplied so the comparison stays in exact
    * integers (the PER-FRAME normalization matters: floor boundaries make
    * span lengths differ by one, and a raw-sum comparison would encode the
    * length pattern — identical for every clip of a given frame count —
    * instead of content). Robust to amplitude-preserving local edits;
    * a re-shot ending moves only the trailing spans' bits. Decode runs
    * partition-local after all shuffles like every kernel here; only
    * (id, 8-byte hash) rides an exchange, so the downstream banded
    * Hamming self-join ([[Dedup.hamming64NearDupPairs]]) is the same
    * corpus-scale plan images and audio use.
    *
    * Output: (id, vhash) — one LONG per clip.
    */
  def gvidTemporalHash(df: DataFrame, idCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val typed: Dataset[MediaRow] =
      df.select(col(idCol).cast("long").as("id"), col("media")).as[MediaRow]
    typed.mapPartitions(_.map { row =>
      val b = row.media
      val (nFrames, w, h, dataAt) = gvidHeader(b, row.id)
      require(nFrames >= 65, s"row ${row.id}: temporal hash needs >= 65 frames, got $nFrames")
      val frameBytes = w * h * 3
      val bright = new Array[Long](nFrames)
      var f = 0
      while (f < nFrames) {
        val at = dataAt + f * frameBytes
        var s = 0L
        var i = 0
        while (i < frameBytes) { s += b(at + i) & 0xFF; i += 1 }
        bright(f) = s
        f += 1
      }
      val e = new Array[Long](65)
      val len = new Array[Long](65)
      var j = 0
      while (j < 65) {
        val a = j * nFrames / 65
        val z = (j + 1) * nFrames / 65
        var s = 0L
        var i = a
        while (i < z) { s += bright(i); i += 1 }
        e(j) = s
        len(j) = z - a
        j += 1
      }
      var hash = 0L
      j = 0
      while (j < 64) {
        // mean-brightness comparison in exact integers (e ≤ nf·765·w·h,
        // len ≤ nf: the cross-products stay far below 2^63)
        if (e(j + 1) * len(j) > e(j) * len(j + 1)) hash |= (1L << j)
        j += 1
      }
      (row.id, hash)
    }).toDF("id", "vhash")
  }

  /** The P6 header walk shared by [[decodePpm]] and [[ppmDHash]]: parses
    * magic, whitespace/`#` comments, width, height, maxval and the single
    * whitespace separator, validates sane bounds and raster length, and
    * returns (width, height, maxval, rasterOffset).
    */
  private def ppmHeader(b: Array[Byte], rid: Long): (Int, Int, Int, Int) = {
    require(b != null && b.length > 2 && b(0) == 'P' && b(1) == '6',
      s"row $rid: not a P6 PPM payload")
    var p = 2
    def skipSpace(): Unit = {
      var more = true
      while (more && p < b.length) {
        val c = b(p)
        if (c == ' ' || c == '\n' || c == '\t' || c == '\r') p += 1
        else if (c == '#') { while (p < b.length && b(p) != '\n') p += 1 } // comment to EOL
        else more = false
      }
    }
    def parseInt(): Int = {
      skipSpace()
      require(p < b.length && b(p) >= '0' && b(p) <= '9', s"row $rid: bad PPM header int at byte $p")
      var v = 0
      while (p < b.length && b(p) >= '0' && b(p) <= '9') {
        v = v * 10 + (b(p) - '0'); p += 1
        // fail loudly, never wrap: a forged header like 4294967296 would
        // otherwise overflow to an arbitrary (possibly negative) dimension
        // and slip past the raster-length require below
        require(v >= 0 && v <= 100000000, s"row $rid: PPM header int overflows sane bounds")
      }
      v
    }
    val width = parseInt()
    val height = parseInt()
    val maxval = parseInt()
    // maxval > 255 means 2 bytes per sample (big-endian) per the netpbm
    // spec — this kernel reads 1-byte samples only, so reject rather than
    // silently misdecode a 16-bit raster
    require(maxval > 0 && maxval < 256,
      s"row $rid: PPM maxval $maxval unsupported (2-byte-per-sample rasters not handled)")
    p += 1 // exactly ONE whitespace byte separates maxval from raster data
    val npix = width.toLong * height * 3
    require(b.length - p >= npix, s"row $rid: raster truncated (${b.length - p} of $npix bytes)")
    (width, height, maxval, p)
  }

  /** Partition-local REAL decode kernel for PPM (P6) payloads: parses the
    * ASCII header (magic, whitespace/`#` comments, width, height, maxval,
    * single whitespace separator) from the raw bytes, then folds the
    * w·h·3 pixel bytes into per-channel means and a checksum. Everything
    * downstream — dimensions, means, checksum — derives from the PARSED
    * header, so any header/offset bug breaks the oracle hash. Runs after
    * all shuffles, exactly like [[materializePointers]]'s contract: bytes
    * never ride an exchange.
    */
  def decodePpm(df: DataFrame, idCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val typed: Dataset[MediaRow] =
      df.select(col(idCol).cast("long").as("id"), col("media")).as[MediaRow]
    typed.mapPartitions(_.map { row =>
      val b = row.media
      val (width, height, maxval, p) = ppmHeader(b, row.id)
      val npix = width.toLong * height * 3
      val sums = new Array[Long](3)
      var checksum = 0L
      var i = 0
      while (i < npix) {
        val v = b(p + i) & 0xFF
        sums(i % 3) += v
        checksum += v
        i += 1
      }
      val nch = width.toLong * height
      // 0-pixel rasters: 0.0 means, not NaN (same contract as decodeWav's
      // n == 0 guard)
      def mean(c: Int) = if (nch == 0) 0.0 else sums(c).toDouble / nch
      PpmStats(row.id, width, height, maxval,
        mean(0), mean(1), mean(2), checksum)
    }).toDF("id", "width", "height", "maxval", "mean_r", "mean_g", "mean_b", "px_checksum")
  }

  /** Partition-local byte-stride featurizer: feature j = mean of payload
    * bytes at positions ≡ j (mod dim), scaled to [0,1) — a codec-free
    * content fingerprint (cheap corruption/modality drift signal). For a
    * decode that parses an actual container format see [[decodePpm]]. The
    * plumbing — typed Dataset, mapPartitions batching, fixed-width feature
    * output — is the JVM analog of a Python `mapInPandas` feature stage.
    */
  def byteFeatures(df: DataFrame, idCol: String, dim: Int = 8): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val typed: Dataset[MediaRow] =
      df.select(col(idCol).cast("long").as("id"), col("media")).as[MediaRow]
    typed.mapPartitions { it =>
      it.map { row =>
        val sums = new Array[Double](dim)
        val counts = new Array[Long](dim)
        var i = 0
        val bytes = if (row.media == null) Array.empty[Byte] else row.media
        while (i < bytes.length) {
          val j = i % dim
          sums(j) += (bytes(i) & 0xFF) / 256.0
          counts(j) += 1
          i += 1
        }
        val feats = Array.tabulate(dim)(j => if (counts(j) == 0) 0.0 else sums(j) / counts(j))
        FeatureRow(row.id, feats)
      }
    }.toDF("id", "features")
  }
}

/** Top-level row types for the decode kernel (nested private case classes
  * break Janino-generated encoder access).
  */
final case class MediaRow(id: Long, media: Array[Byte])
final case class FeatureRow(id: Long, features: Array[Double])
final case class PointerRow(id: Long, path: String, offset: Long, nBytes: Long)
final case class PpmStats(id: Long, width: Int, height: Int, maxval: Int,
                          mean_r: Double, mean_g: Double, mean_b: Double, px_checksum: Long)
final case class WavStats(id: Long, sample_rate: Int, n_samples: Long,
                          mean_amp: Double, peak: Int, pcm_checksum: Long)
