package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables

/** Multimodal-column block (SURVEY §2G): image/audio/video payloads as
  * opaque `binary` columns with typed metadata, batch-transformed per
  * partition. The Spark-side plumbing — schema, partition-aligned batch
  * shape, feature output contract — is real; the codec itself is a
  * clearly-marked deterministic STUB because no image/audio libraries
  * exist in this container. Swapping `stubDecode` for a JNI/FFmpeg/JPEG
  * call is the only change needed on a real cluster.
  */
object Multimodal {

  private val FeatureDims = 8

  /** STUB codec: stands in for image/audio decode. Deterministic byte
    * statistics per stride — NOT a real decoder. */
  private def stubDecode(payload: Array[Byte]): Array[Float] = {
    val out = new Array[Float](FeatureDims)
    var i = 0
    while (i < payload.length) {
      out(i % FeatureDims) += (payload(i) & 0xff).toFloat / 255f
      i += 1
    }
    out
  }

  /** Exact integer form of the stub's per-dim accumulation (byte sums per
    * stride class). Emitted alongside the float feature so the operator
    * has a cross-engine-checkable projection: float arrays are neither
    * hashable nor bit-comparable through the driver's pandas path, but
    * these sums are plain BIGINTs an oracle can recompute byte-for-byte. */
  private def byteSums(payload: Array[Byte]): Array[Long] = {
    val out = new Array[Long](FeatureDims)
    var i = 0
    while (i < payload.length) {
      out(i % FeatureDims) += (payload(i) & 0xff).toLong
      i += 1
    }
    out
  }

  private val pipelineSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("media_type", StringType),
    StructField("n_bytes", IntegerType),
    StructField("feature", ArrayType(FloatType)),
    StructField("byte_sums", ArrayType(LongType))))

  /** Binary-column pipeline: payload + metadata struct in, fixed-width
    * feature vector out. mapPartitions keeps the codec call batched per
    * partition (one codec context per task, zero shuffles); at 100 TB the
    * partitioning key is the storage layout, not a re-shuffle. */
  def binaryPipeline(s: SparkSession, dir: String): DataFrame = {
    val withPayload = Tables.documents(s, dir).select(
      col("doc_id"),
      col("text").cast("binary").as("payload"),
      struct(
        when(pmod(col("doc_id"), lit(3)) === 0, "image/png")
          .when(pmod(col("doc_id"), lit(3)) === 1, "audio/wav")
          .otherwise(lit("video/mp4")).as("media_type"),
        length(col("text")).as("n_bytes")).as("meta"))
    val enc = RowEncoder.encoderFor(pipelineSchema)
    withPayload.mapPartitions { rows =>
      rows.map { r =>
        val payload = r.getAs[Array[Byte]]("payload")
        val meta = r.getAs[Row]("meta")
        Row(r.getLong(0), meta.getString(0), meta.getInt(1),
          stubDecode(payload).toSeq, byteSums(payload).toSeq)
      }
    }(enc)
  }

  /** Driver-checkable projection of the pipeline: the per-dim byte sums
    * as scalar BIGINT columns (the float `feature` array stays in the
    * library output / specs — arrays crash the driver's comparator). The
    * documents corpus is pure ASCII, so a SQL oracle can recompute every
    * sum from code points. */
  def binaryPipelineChecked(s: SparkSession, dir: String): DataFrame = {
    val dims = (0 until FeatureDims).map(d =>
      col("byte_sums").getItem(d).as(s"b$d"))
    binaryPipeline(s, dir)
      .select(col("doc_id") +: col("media_type") +: col("n_bytes").cast("bigint")
        .as("n_bytes") +: dims: _*)
  }

  /** Frame sampling over duration metadata: every 5th "second" of a
    * pseudo-duration derived from n_chars — the video-frame-sample shape
    * (sequence + posexplode, no UDF, no shuffle). */
  def frameSample(s: SparkSession, dir: String): DataFrame = {
    Tables.documents(s, dir)
      .select(col("doc_id"), (col("n_chars") / 10).cast("int").as("duration_s"))
      .select(col("doc_id"), col("duration_s"),
        explode(sequence(lit(0), col("duration_s"), lit(5))).as("frame_idx"))
      .select(col("doc_id"), col("duration_s"), col("frame_idx"),
        substring(md5(concat_ws(":", col("doc_id"), col("frame_idx"))), 1, 16)
          .as("frame_key"))
  }

  /** Block-average downsample of a `gridW`-wide byte grid by `factor`
    * (floor of the integer mean of the present cells) — the
    * thumbnail/pooling kernel of an image pre-processing leg. Integer
    * math throughout, so the result is exactly recomputable (by the
    * SQL oracle on the stub grid; by the spec on decoded pixels). */
  private val GridW = 16
  private def blockResize(grid: Array[Byte], gridW: Int, factor: Int)
      : (Int, Long) = {
    val ow = (gridW + factor - 1) / factor
    val rows = (grid.length + gridW - 1) / gridW
    val orows = math.max((rows + factor - 1) / factor, 1)
    val sums = new Array[Long](orows * ow)
    val cnts = new Array[Int](orows * ow)
    var i = 0
    while (i < grid.length) {
      val oi = (i / gridW / factor) * ow + (i % gridW / factor)
      sums(oi) += (grid(i) & 0xff)
      cnts(oi) += 1
      i += 1
    }
    var n = 0
    var total = 0L
    var j = 0
    while (j < sums.length) {
      if (cnts(j) > 0) { n += 1; total += sums(j) / cnts(j) }
      j += 1
    }
    (n, total)
  }

  /** REAL image decode — the codec seam's real leg, feasible in this
    * container because javax.imageio's PNG/JPEG/BMP/GIF readers are
    * pure JVM (no native libs): a payload whose magic bytes name one
    * of those formats decodes to its integer BT.601 luma grid
    * (per-pixel (299·R + 587·G + 114·B)/1000 — all-integer, so the
    * spec re-derives the expected output from the same decoded pixels
    * exactly; for JPEG the decode itself is deterministic for a given
    * payload, which is all the byte-exactness contract needs); any
    * other payload returns None and keeps the deterministic stub grid,
    * so the text-payload corpus (and its SQL oracle) is bit-unchanged.
    * Decode failures of a claimed-image payload return None too —
    * quarantine-not-crash, the etl_quarantine discipline. */
  private[graft] def decodeImage(payload: Array[Byte])
      : Option[(Int, Array[Byte])] = {
    def b(i: Int): Int = payload(i) & 0xff
    val isImage = payload.length > 8 && (
      (b(0) == 0x89 && b(1) == 'P' && b(2) == 'N' && b(3) == 'G') ||
        (b(0) == 0xff && b(1) == 0xd8 && b(2) == 0xff) || // JPEG
        (b(0) == 'B' && b(1) == 'M') ||                   // BMP
        (b(0) == 'G' && b(1) == 'I' && b(2) == 'F' && b(3) == '8'))
    if (!isImage) None
    else try {
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(payload))
      if (img == null) None
      else {
        val w = img.getWidth
        val h = img.getHeight
        val px = new Array[Byte](w * h)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val rgb = img.getRGB(x, y)
            px(y * w + x) = ((((rgb >> 16) & 0xff) * 299 +
              ((rgb >> 8) & 0xff) * 587 + (rgb & 0xff) * 114) / 1000)
              .toByte
            x += 1
          }
          y += 1
        }
        Some((w, px))
      }
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  private val resizeSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("n_bytes_in", LongType),
    StructField("n_bytes_out", LongType),
    StructField("resized_sum", LongType)))

  /** Resize/pooling pipeline over the binary payload: same batched
    * mapPartitions codec boundary as binaryPipeline, with a per-doc
    * integer projection (output size + output byte sum) the DuckDB
    * oracle recomputes from code points — the transform is verified
    * byte-for-byte, not just "runs". */
  def resize(s: SparkSession, dir: String): DataFrame =
    resizeRows(Tables.documents(s, dir).select(
      col("doc_id"), col("text").cast("binary").as("payload")))

  /** The resize pipeline over arbitrary (doc_id, payload) rows —
    * package-visible so the spec can drive the REAL decode leg with a
    * generated PNG payload (the bundled corpus is text bytes, which
    * keep the stub grid and the SQL oracle bit-for-bit). */
  private[graft] def resizeRows(withPayload: DataFrame): DataFrame = {
    val enc = RowEncoder.encoderFor(resizeSchema)
    withPayload.mapPartitions { rows =>
      rows.map { r =>
        val payload = r.getAs[Array[Byte]]("payload")
        // real-decode leg first (PNG → luma grid at the image's own
        // width), stub grid otherwise — one shared pooling kernel
        val (n, total) = decodeImage(payload) match {
          case Some((w, px)) => blockResize(px, w, factor = 2)
          case None => blockResize(payload, GridW, factor = 2)
        }
        Row(r.getLong(0), payload.length.toLong, n.toLong, total)
      }
    }(enc)
  }

  private val FrameLen = 256
  private val FrameHop = 128

  /** REAL WAV PCM decode — the codec seam's audio leg, feasible in
    * this container because javax.sound.sampled's WAV reader is pure
    * JVM (the decodeImage precedent): a payload with the RIFF/WAVE
    * magic decodes to one unsigned-8-bit amplitude byte per sample
    * frame — 16-bit PCM maps via the unsigned grid (s+32768)>>8,
    * multi-channel frames average channel-wise (integer division) —
    * all-integer, so the spec re-derives the expected frames from the
    * PCM bytes it generated itself. Any other payload (the whole text
    * corpus) returns None and keeps the raw-byte framing, so the SQL
    * oracle is bit-unchanged. Non-PCM encodings and decode failures of
    * a claimed-WAV payload return None too — quarantine-not-crash, the
    * etl_quarantine discipline. */
  private[graft] def decodeWavPcm(payload: Array[Byte])
      : Option[Array[Byte]] = {
    val isWav = payload.length > 44 &&
      payload(0) == 'R' && payload(1) == 'I' && payload(2) == 'F' &&
      payload(3) == 'F' && payload(8) == 'W' && payload(9) == 'A' &&
      payload(10) == 'V' && payload(11) == 'E'
    if (!isWav) None
    else try {
      val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(payload))
      val fmt = ais.getFormat
      val enc = fmt.getEncoding
      val signed =
        enc == javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED
      val unsigned =
        enc == javax.sound.sampled.AudioFormat.Encoding.PCM_UNSIGNED
      val bits = fmt.getSampleSizeInBits
      val ch = fmt.getChannels
      if ((!signed && !unsigned) || (bits != 8 && bits != 16) || ch < 1)
        None
      else {
        val raw = ais.readAllBytes()
        val bps = bits / 8
        val frameBytes = bps * ch
        val nFrames = raw.length / frameBytes
        val outArr = new Array[Byte](nFrames)
        var f = 0
        while (f < nFrames) {
          var acc = 0
          var c = 0
          while (c < ch) {
            val off = f * frameBytes + c * bps
            val u =
              if (bits == 8) {
                if (signed) (raw(off) + 128) & 0xff else raw(off) & 0xff
              } else {
                val v16 =
                  if (fmt.isBigEndian)
                    ((raw(off) & 0xff) << 8) | (raw(off + 1) & 0xff)
                  else
                    ((raw(off + 1) & 0xff) << 8) | (raw(off) & 0xff)
                val ug =
                  if (signed) (v16.toShort.toInt + 32768) else v16
                ug >> 8
              }
            acc += u
            c += 1
          }
          outArr(f) = (acc / ch).toByte
          f += 1
        }
        Some(outArr)
      }
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  private val audioSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("frame_idx", IntegerType),
    StructField("energy", LongType),
    StructField("peak", IntegerType)))

  /** Audio framing leg: the payload as fixed 256-byte windows on a
    * 128-byte hop — the STFT window/hop shape of an audio feature
    * pipeline: per frame, the exact "energy" (sum) and peak over the
    * amplitude bytes. WAV payloads frame over REAL decoded PCM samples
    * ([[decodeWavPcm]]); anything else frames over the raw bytes, so
    * the text corpus (and its SQL oracle) is bit-unchanged. Same
    * batched mapPartitions codec boundary as binaryPipeline (one
    * decoder context per task, zero shuffles); inputs shorter than one
    * window emit no frames — dropped, not padded, on both engines.
    * Integer math only, so every frame row is recomputed byte-for-byte
    * by the oracle. */
  def audioWindow(s: SparkSession, dir: String): DataFrame =
    audioWindowRows(Tables.documents(s, dir).select(
      col("doc_id"), col("text").cast("binary").as("payload")))

  /** The framing pipeline over arbitrary (doc_id, payload) rows —
    * package-visible so the spec can drive the REAL WAV decode leg
    * with a generated RIFF/WAVE payload (the resizeRows precedent). */
  private[graft] def audioWindowRows(withPayload: DataFrame)
      : DataFrame = {
    val enc = RowEncoder.encoderFor(audioSchema)
    withPayload.mapPartitions { rows =>
      rows.flatMap { r =>
        val id = r.getLong(0)
        val raw = r.getAs[Array[Byte]](1)
        val payload = decodeWavPcm(raw).getOrElse(raw)
        val n = if (payload.length < FrameLen) 0
          else (payload.length - FrameLen) / FrameHop + 1
        (0 until n).iterator.map { k =>
          var e = 0L
          var p = 0
          var j = k * FrameHop
          val end = j + FrameLen
          while (j < end) {
            val b = payload(j) & 0xff
            e += b
            if (b > p) p = b
            j += 1
          }
          Row(id, k, e, p)
        }
      }
    }(enc)
  }

  private val PhashBits = 32

  /** STUB perceptual hash: 32-bit average-hash over stride classes —
    * bit d is set iff the mean byte of class (i % 32) exceeds the
    * payload's global mean byte. The comparison is exact integer
    * cross-multiplication (sum_d · n_total > sum_total · n_d), so there
    * is no float anywhere and the oracle recomputes every bit from code
    * points. A real image pipeline swaps this for aHash/pHash over
    * decoded 8×8 luma — the fingerprint-then-bucket machinery is
    * identical. */
  private def stubPhash(payload: Array[Byte]): Long = {
    if (payload.isEmpty) return 0L
    val sums = new Array[Long](PhashBits)
    val cnts = new Array[Long](PhashBits)
    var total = 0L
    var i = 0
    while (i < payload.length) {
      val b = (payload(i) & 0xff).toLong
      sums(i % PhashBits) += b
      cnts(i % PhashBits) += 1
      total += b
      i += 1
    }
    var fp = 0L
    var d = 0
    while (d < PhashBits) {
      if (sums(d) * payload.length > total * cnts(d)) fp |= 1L << d
      d += 1
    }
    fp
  }

  private val phashSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("phash", LongType)))

  /** Perceptual-hash near-dup buckets over the binary payloads: the
    * fingerprint runs at the batched mapPartitions codec boundary (the
    * binaryPipeline discipline), then one map-side-combinable groupBy
    * turns identical fingerprints into dedup buckets — per doc, its
    * fingerprint, the bucket width and the bucket's canonical (min) doc.
    * At 100 TB this is exactly dedup_exact's shape on a 32-bit key:
    * linear, one shuffle, no pairing. */
  def phashDedup(s: SparkSession, dir: String): DataFrame = {
    val withPayload = Tables.documents(s, dir).select(
      col("doc_id"), col("text").cast("binary").as("payload"))
    val enc = RowEncoder.encoderFor(phashSchema)
    val fps = withPayload.mapPartitions { rows =>
      rows.map { r =>
        Row(r.getLong(0), stubPhash(r.getAs[Array[Byte]]("payload")))
      }
    }(enc)
    val buckets = fps.groupBy(col("phash"))
      .agg(count(lit(1)).as("n_bucket"),
        min(col("doc_id")).as("canonical_id"))
    fps.join(buckets, "phash")
      .select(col("doc_id"), col("phash"), col("n_bucket"),
        col("canonical_id"))
  }

  /** Shard-packing plan over the binary payloads — the WebDataset-style
    * layout step that turns N opaque media files into fixed-size training
    * shards: payloads are laid out in deterministic content-hash order
    * and assigned to the 8 KiB shard their START offset falls in
    * (offset-based sharding — payloads stay whole, a boundary item is
    * flagged `spans_next` for the tar writer's carry logic). Each
    * shard's span is exactly the budget, so shard sizes never drift no
    * matter how skewed payload sizes are.
    *
    * Scale shape: pure arithmetic on payload LENGTHS (no payload bytes
    * move until the write itself); the global running offset is
    * `Ranking.bucketedPrefixSum` over derived hex-prefix buckets of the
    * hash — never a single-task global cumsum. Budget is a power of two
    * so shard ids are exact bit shifts. */
  def shardPack(s: SparkSession, dir: String): DataFrame = {
    val budgetBits = 13 // 8 KiB per shard
    val budget = 1L << budgetBits
    val hc = Ranking.hexCharsFor(graft.Tables.rowCount(s, dir, "documents"))
    val items = Tables.documents(s, dir)
      .select(col("doc_id"), length(col("text")).cast("long").as("n_bytes"))
      .withColumn("hk",
        md5(concat(lit("shard:"), col("doc_id").cast("string"))))
      .withColumn("__bkt", Ranking.hexPrefixBucket(col("hk"), hc))
    val cum = Ranking.bucketedPrefixSum(items, "__bkt", 1 << (4 * hc),
      Seq(col("hk"), col("doc_id")), col("n_bytes"), "start_off")
    cum.select(
        shiftright(col("start_off"), budgetBits).as("shard_id"),
        col("doc_id"), col("n_bytes"),
        (col("start_off") - shiftright(col("start_off"), budgetBits)
          * lit(budget)).as("offset_in_shard"),
        (col("start_off") + col("n_bytes") >
          (shiftright(col("start_off"), budgetBits) + 1) * lit(budget))
          .as("spans_next"))
  }

  /** POSIX ustar header for one tar member — hand-rolled because the
    * container has no commons-compress, and tar is 512-byte arithmetic:
    * name(100) mode(8) uid(8) gid(8) size(12, octal) mtime(12)
    * chksum(8) typeflag(1) linkname(100) magic("ustar\0") version("00")
    * + zero padding. All metadata pinned (mode 0644, uid/gid/mtime 0)
    * so the archive bytes are a pure function of (name, payload) —
    * deterministic across runs and engines. */
  private[graft] def tarHeader(name: String, size: Long): Array[Byte] = {
    val h = new Array[Byte](512)
    def put(off: Int, s: String): Unit = {
      val b = s.getBytes(java.nio.charset.StandardCharsets.US_ASCII)
      System.arraycopy(b, 0, h, off, b.length)
    }
    put(0, name.take(100))
    put(100, "0000644\u0000")
    put(108, "0000000\u0000")
    put(116, "0000000\u0000")
    put(124, f"$size%011o\u0000")
    put(136, "00000000000\u0000")
    java.util.Arrays.fill(h, 148, 156, ' '.toByte) // chksum as spaces
    h(156) = '0'                                   // regular file
    put(257, "ustar\u000000")
    var sum = 0L
    var i = 0
    while (i < 512) { sum += h(i) & 0xff; i += 1 }
    put(148, f"$sum%06o\u0000 ")
    h
  }

  /** Streaming tar reader for the round-trip spec and any downstream
    * consumer: (member name, payload bytes) in archive order. */
  private[graft] def readTar(bytes: Array[Byte])
      : Seq[(String, Array[Byte])] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[(String,
      Array[Byte])]
    var p = 0
    while (p + 512 <= bytes.length && bytes(p) != 0) {
      val name = new String(bytes, p, 100,
        java.nio.charset.StandardCharsets.US_ASCII).takeWhile(_ != 0)
      val size = java.lang.Long.parseLong(new String(bytes, p + 124, 11,
        java.nio.charset.StandardCharsets.US_ASCII).trim, 8)
      val data = java.util.Arrays.copyOfRange(bytes, p + 512,
        p + 512 + size.toInt)
      out += ((name, data))
      p += 512 + ((size.toInt + 511) / 512) * 512
    }
    out.toSeq
  }

  /** Landing dir for the written shards (the mhLshDir contract:
    * computable from `dir` alone). */
  private[graft] def shardsDir(dir: String): String =
    graft.Tables.landingDir("tarshards", dir)

  /** REAL shard writer — the tar leg that completes [[shardPack]]'s
    * plan into a WebDataset-style training handoff: every planned
    * shard becomes an actual tar archive (one member per document,
    * named `<doc_id>.txt`, metadata pinned — see [[tarHeader]]) in a
    * landing dir, written by the task that owns the shard's rows
    * (repartition on shard_id; payload bytes move exactly once, to
    * their writer). Members keep the plan's deterministic content-hash
    * order; end-of-archive is the two zero blocks with no blocking-
    * factor padding, so the archive size is exact 512-byte arithmetic.
    *
    * The emitted MANIFEST is the op's checkable output — per shard:
    * member count, payload bytes, and the tar's byte size, each a pure
    * function of the plan that the SQL oracle recomputes (tar_bytes =
    * Σ (512 + ceil(n/512)·512) + 1024). The round-trip spec reads the
    * written archives back member-by-member and asserts byte equality
    * with the source payloads. At 100 TB the 8 KiB test budget becomes
    * the usual 100 MB-1 GB shard (budgetBits is the only knob); the
    * write pattern — one task streams its shards to storage — is the
    * production shape already. */
  def shardWrite(s: SparkSession, dir: String): DataFrame =
    shardWriteImpl(s, dir, forceHadoopFs = false)

  /** Implementation seam: `forceHadoopFs = true` routes the write
    * through the Hadoop FileSystem branch even when the resolved FS is
    * local — the spec's way of exercising the remote-FS code path
    * (ChecksumFileSystem under `file:`) without a real HDFS/S3A. */
  private[graft] def shardWriteImpl(s: SparkSession, dir: String,
      forceHadoopFs: Boolean): DataFrame = {
    val out = shardsDir(dir)
    // reset the landing dir on the driver (idempotent re-run)
    val outPath = new org.apache.hadoop.fs.Path(out)
    val fs = outPath.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (fs.exists(outPath)) fs.delete(outPath, true)
    fs.mkdirs(outPath)
    // Resolve local-vs-remote ONCE, on the driver, through the SAME
    // configuration the mkdirs above used (fs.defaultFS included): the
    // java.io fast path is taken only when the resolved FileSystem is
    // actually the local one, so a scheme-less path on a cluster whose
    // defaultFS is HDFS/S3A routes every executor write through the
    // Hadoop API against the directory the driver just prepared —
    // never to executor-local java.io disk. The executor re-resolves
    // from the driver-QUALIFIED URI (scheme+authority pinned), so both
    // sides name the same filesystem by construction.
    val qualified = fs.makeQualified(outPath)
    val isLocal = !forceHadoopFs &&
      (fs.isInstanceOf[org.apache.hadoop.fs.LocalFileSystem] ||
        fs.isInstanceOf[org.apache.hadoop.fs.RawLocalFileSystem])
    val localDir = if (isLocal) qualified.toUri.getPath else null
    val outUri = qualified.toString
    val plan = shardPack(s, dir)
      .join(Tables.documents(s, dir)
        .select(col("doc_id"), col("text").cast("binary").as("payload")),
        "doc_id")
      .select(col("shard_id"), col("offset_in_shard"), col("doc_id"),
        col("payload"))
      .repartition(col("shard_id"))
    val schema = StructType(Seq(
      StructField("shard_id", LongType),
      StructField("n_members", LongType),
      StructField("n_payload_bytes", LongType),
      StructField("tar_bytes", LongType)))
    val enc = RowEncoder.encoderFor(schema)
    plan.sortWithinPartitions(col("shard_id"), col("offset_in_shard"),
        col("doc_id"))
      .mapPartitions { rows =>
        // The executor re-resolves the driver-qualified URI (scheme and
        // authority pinned above) — local/HDFS/S3A all route through
        // the same FileSystem API. Checksums off: Hadoop's
        // ChecksumFileSystem otherwise writes a .crc twin per archive —
        // double the file creates for a landing whose tar bytes are
        // already manifest-verified end to end. Plain local paths skip
        // the Hadoop stream wrappers entirely (measured ~3ms of
        // per-archive overhead on the many-small-tar test budget; a
        // production 100 MB-1 GB shard never notices, and an HDFS/S3A
        // landing keeps the FileSystem branch).
        val fs2 =
          if (isLocal) null
          else {
            val f = new org.apache.hadoop.fs.Path(outUri)
              .getFileSystem(new org.apache.hadoop.conf.Configuration())
            f.setWriteChecksum(false)
            f.setVerifyChecksum(false)
            f
          }
        // Commit protocol: each archive streams into a temp name that
        // carries the TASK ATTEMPT id, and is renamed to its final name
        // only after the end-of-archive blocks are flushed — a
        // speculative or zombie attempt writing the same shard can
        // never corrupt a committed archive (attempts write disjoint
        // temp files; the bytes are deterministic, so whichever rename
        // lands first is the archive). A task that dies mid-shard
        // leaves only an un-renamed temp behind — the completion
        // listener below closes the in-flight stream.
        val attemptId = Option(org.apache.spark.TaskContext.get())
          .map(_.taskAttemptId()).getOrElse(0L)
        var cur = -1L
        var os: java.io.OutputStream = null
        var tmpName: String = null
        var finName: String = null
        Option(org.apache.spark.TaskContext.get()).foreach(
          _.addTaskCompletionListener[Unit] { _ =>
            if (os != null) {
              try os.close() catch { case _: java.io.IOException => () }
              os = null
            }
          })
        def create(fin: String): java.io.OutputStream = {
          finName = fin
          tmpName = s"$fin.$attemptId.tmp"
          if (isLocal)
            new java.io.BufferedOutputStream(
              new java.io.FileOutputStream(
                new java.io.File(localDir, tmpName)), 1 << 16)
          else fs2.create(
            new org.apache.hadoop.fs.Path(outUri, tmpName), true)
        }
        def commit(): Unit =
          if (isLocal) {
            val t = new java.io.File(localDir, tmpName)
            val f = new java.io.File(localDir, finName)
            if (!t.renameTo(f) && !(f.exists() && t.delete()))
              sys.error(s"shard commit failed: $tmpName -> $finName")
          } else {
            val t = new org.apache.hadoop.fs.Path(outUri, tmpName)
            val f = new org.apache.hadoop.fs.Path(outUri, finName)
            // first committed attempt wins; a later identical attempt
            // just drops its temp
            if (fs2.exists(f)) fs2.delete(t, false)
            else if (!fs2.rename(t, f))
              sys.error(s"shard commit failed: $tmpName -> $finName")
          }
        var nm = 0L
        var pb = 0L
        var tb = 0L
        def close(): Option[Row] = {
          if (os == null) None
          else {
            os.write(new Array[Byte](1024)) // end-of-archive
            os.close(); os = null
            commit()
            Some(Row(cur, nm, pb, tb + 1024L))
          }
        }
        val body = rows.flatMap { r =>
          val sid = r.getLong(0)
          val fin = if (sid != cur) close() else None
          if (sid != cur) {
            cur = sid; nm = 0L; pb = 0L; tb = 0L
            os = create(f"shard-$sid%06d.tar")
          }
          val payload = r.getAs[Array[Byte]](3)
          os.write(tarHeader(s"${r.getLong(2)}.txt", payload.length.toLong))
          os.write(payload)
          val pad = (512 - payload.length % 512) % 512
          if (pad > 0) os.write(new Array[Byte](pad))
          nm += 1L; pb += payload.length.toLong
          tb += 512L + payload.length.toLong + pad
          fin.iterator
        }
        body ++ new Iterator[Row] {
          private var done = false
          def hasNext: Boolean = !done && os != null
          def next(): Row = { done = true; close().get }
        }
      }(enc)
      .orderBy(col("shard_id"))
  }

  /** Byte-distribution stats over the binary payload — the cheap
    * corruption / wrong-codec detector a media landing runs before any
    * decode: distinct byte count, collision probability (the Simpson
    * index — compressed/encrypted payloads sit near 1/256, text far
    * above) and the top byte's share. The histogram is built per
    * payload inside `mapPartitions` (256 boxed longs per row, one codec
    * context per task, no shuffle); every output is an exact integer or
    * one integer division, so the ASCII corpus lets a SQL oracle
    * recompute byte-for-byte from code points. */
  def byteStats(s: SparkSession, dir: String): DataFrame = {
    val schema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("n_bytes", LongType),
      StructField("n_distinct", LongType),
      StructField("coll_pairs", LongType),
      StructField("max_n", LongType)))
    val enc = RowEncoder.encoderFor(schema)
    val withPayload = Tables.documents(s, dir)
      .filter(length(col("text")) > 0)
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
    val counted = withPayload.mapPartitions { rows =>
      rows.map { r =>
        val p = r.getAs[Array[Byte]]("payload")
        val h = new Array[Long](256)
        var i = 0
        while (i < p.length) { h(p(i) & 0xff) += 1L; i += 1 }
        var dist = 0L; var coll = 0L; var mx = 0L
        var b = 0
        while (b < 256) {
          val n = h(b)
          if (n > 0L) { dist += 1L; coll += n * (n - 1L)
            if (n > mx) mx = n }
          b += 1
        }
        Row(r.getLong(0), p.length.toLong, dist, coll, mx)
      }
    }(enc)
    counted.select(col("doc_id"), col("n_bytes"), col("n_distinct"),
      round(col("coll_pairs").cast("double")
        / nullif(col("n_bytes") * (col("n_bytes") - 1L), lit(0L))
          .cast("double"), 6).as("collision_prob"),
      round(col("max_n").cast("double") / col("n_bytes").cast("double"), 6)
        .as("top_byte_share"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "mm_byte_stats" -> (byteStats _),
    "mm_shard_pack" -> (shardPack _),
    "mm_phash_dedup" -> (phashDedup _),
    "mm_binary_pipeline" -> (binaryPipelineChecked _),
    "mm_frame_sample" -> (frameSample _),
    "mm_audio_window" -> (audioWindow _),
    "mm_resize" -> (resize _),
    "mm_shard_write" -> (shardWrite _))

  val oracles: Map[String, String] = Map(
    // byte histogram re-derived from code points (ASCII corpus);
    // integer counts, two identically-ordered divisions
    "mm_byte_stats" ->
      """WITH ch AS (
        |  SELECT doc_id, unnest(regexp_split_to_array(text, '')) AS c
        |  FROM documents WHERE length(text) > 0),
        |cc AS (SELECT doc_id, c, COUNT(*) AS n FROM ch
        |  GROUP BY doc_id, c),
        |agg AS (
        |  SELECT doc_id, CAST(SUM(n) AS BIGINT) AS n_bytes,
        |    COUNT(*) AS n_distinct,
        |    CAST(SUM(n * (n - 1)) AS BIGINT) AS coll,
        |    CAST(MAX(n) AS BIGINT) AS max_n
        |  FROM cc GROUP BY doc_id)
        |SELECT doc_id, n_bytes, n_distinct,
        |  ROUND(CAST(coll AS DOUBLE)
        |    / CAST(NULLIF(n_bytes * (n_bytes - 1), 0) AS DOUBLE), 6)
        |    AS collision_prob,
        |  ROUND(CAST(max_n AS DOUBLE) / CAST(n_bytes AS DOUBLE), 6)
        |    AS top_byte_share
        |FROM agg""".stripMargin,
    // same hash order and exclusive prefix sum as the Spark side; shard
    // id and offset from integer division on the start offset
    "mm_shard_pack" ->
      """WITH t AS (
        |  SELECT doc_id, CAST(length(text) AS BIGINT) AS n_bytes,
        |    md5('shard:' || CAST(doc_id AS VARCHAR)) AS hk
        |  FROM documents),
        |o AS (
        |  SELECT doc_id, n_bytes,
        |    CAST(COALESCE(SUM(n_bytes) OVER (ORDER BY hk, doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS BIGINT) AS so
        |  FROM t)
        |SELECT CAST(so // 8192 AS BIGINT) AS shard_id, doc_id, n_bytes,
        |  CAST(so - (so // 8192) * 8192 AS BIGINT) AS offset_in_shard,
        |  so + n_bytes > ((so // 8192) + 1) * 8192 AS spans_next
        |FROM o""".stripMargin,
    // the written manifest is pure 512-byte arithmetic over the same
    // plan: tar_bytes = Σ (512 header + payload padded to 512) + the
    // two end-of-archive zero blocks
    "mm_shard_write" ->
      """WITH t AS (
        |  SELECT doc_id, CAST(length(text) AS BIGINT) AS n_bytes,
        |    md5('shard:' || CAST(doc_id AS VARCHAR)) AS hk
        |  FROM documents),
        |o AS (
        |  SELECT doc_id, n_bytes,
        |    CAST(COALESCE(SUM(n_bytes) OVER (ORDER BY hk, doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS BIGINT) AS so
        |  FROM t)
        |SELECT CAST(so // 8192 AS BIGINT) AS shard_id,
        |  COUNT(*) AS n_members,
        |  CAST(SUM(n_bytes) AS BIGINT) AS n_payload_bytes,
        |  CAST(SUM(512 + ((n_bytes + 511) // 512) * 512) + 1024
        |    AS BIGINT) AS tar_bytes
        |FROM o GROUP BY 1 ORDER BY 1""".stripMargin,
    // every phash bit recomputed from code points: bit d set iff the
    // stride class's byte sum cross-multiplied beats the global sum
    // (exact integers, strict >, matching stubPhash)
    "mm_phash_dedup" ->
      """WITH pos AS (
        |  SELECT doc_id, length(text) AS len,
        |    unnest(range(length(text))) AS i, text
        |  FROM documents),
        |b AS (
        |  SELECT doc_id, len, i % 32 AS d,
        |    unicode(substr(text, CAST(i AS INT) + 1, 1)) AS v
        |  FROM pos),
        |cls AS (
        |  SELECT doc_id, MAX(len) AS len, d, SUM(v) AS sv, COUNT(*) AS nv
        |  FROM b GROUP BY doc_id, d),
        |tot AS (SELECT doc_id, SUM(v) AS st FROM b GROUP BY doc_id),
        |fp AS (
        |  SELECT c.doc_id,
        |    COALESCE(CAST(SUM(CASE WHEN c.sv * c.len > t.st * c.nv
        |      THEN (CAST(1 AS BIGINT) << CAST(c.d AS INT)) END) AS BIGINT),
        |      0) AS phash
        |  FROM cls c JOIN tot t USING (doc_id) GROUP BY c.doc_id),
        |bk AS (
        |  SELECT phash, COUNT(*) AS n_bucket, MIN(doc_id) AS canonical_id
        |  FROM fp GROUP BY phash)
        |SELECT doc_id, phash, n_bucket, canonical_id
        |FROM fp JOIN bk USING (phash)""".stripMargin,
    // ASCII corpus: unicode(char) == byte value; // is integer division
    "mm_audio_window" ->
      """WITH frames AS (
        |  SELECT doc_id, text,
        |    unnest(range((length(text) - 256) // 128 + 1)) AS k
        |  FROM documents WHERE length(text) >= 256),
        |bytes AS (
        |  SELECT doc_id, k,
        |    unicode(substr(text, CAST(k * 128 + j + 1 AS INT), 1)) AS b
        |  FROM (SELECT doc_id, text, k, unnest(range(256)) AS j
        |        FROM frames))
        |SELECT doc_id, CAST(k AS INT) AS frame_idx,
        |  CAST(SUM(b) AS BIGINT) AS energy, CAST(MAX(b) AS INT) AS peak
        |FROM bytes GROUP BY doc_id, k""".stripMargin,
    "mm_binary_pipeline" -> {
      // per-dim byte sums over stride classes i % 8 == d; text is ASCII so
      // unicode(single char) == byte value and char length == byte length
      val dimCols = (0 until FeatureDims).map(d =>
        s"  COALESCE(CAST(SUM(CASE WHEN i % 8 = $d THEN unicode(substr(text, CAST(i AS INT) + 1, 1)) END) AS BIGINT), 0) AS b$d").mkString(",\n")
      s"""WITH pos AS (
         |  SELECT doc_id, text,
         |    CASE WHEN doc_id % 3 = 0 THEN 'image/png'
         |         WHEN doc_id % 3 = 1 THEN 'audio/wav'
         |         ELSE 'video/mp4' END AS media_type,
         |    CAST(length(text) AS BIGINT) AS n_bytes,
         |    unnest(range(length(text))) AS i
         |  FROM documents)
         |SELECT doc_id, media_type, n_bytes,
         |$dimCols
         |FROM pos GROUP BY doc_id, media_type, n_bytes""".stripMargin
    },
    "mm_resize" ->
      """WITH pos AS (
        |  SELECT doc_id, length(text) AS len, unnest(range(length(text))) AS i,
        |    text
        |  FROM documents),
        |px AS (
        |  SELECT doc_id, len,
        |    (i // 16) // 2 AS orow, (i % 16) // 2 AS ocol,
        |    unicode(substr(text, CAST(i AS INT) + 1, 1)) AS b
        |  FROM pos),
        |op AS (
        |  SELECT doc_id, MAX(len) AS len, orow, ocol,
        |    SUM(b) // COUNT(*) AS ob
        |  FROM px GROUP BY doc_id, orow, ocol)
        |SELECT doc_id, CAST(MAX(len) AS BIGINT) AS n_bytes_in,
        |  COUNT(*) AS n_bytes_out,
        |  CAST(SUM(ob) AS BIGINT) AS resized_sum
        |FROM op GROUP BY doc_id""".stripMargin,
    "mm_frame_sample" ->
      """WITH d AS (
        |  SELECT doc_id, CAST(n_chars // 10 AS INT) AS duration_s
        |  FROM documents)
        |SELECT doc_id, duration_s,
        |  CAST(unnest(range(0, duration_s + 1, 5)) AS INT) AS frame_idx,
        |  substr(md5(CAST(doc_id AS VARCHAR) || ':' ||
        |    CAST(unnest(range(0, duration_s + 1, 5)) AS VARCHAR)), 1, 16)
        |    AS frame_key
        |FROM d""".stripMargin)
}
