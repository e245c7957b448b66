package graft

import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {

  test("binary pipeline: schema contract and deterministic stub features") {
    val df = operators.Multimodal.binaryPipeline(spark, sfTiny)
    assert(df.schema.fieldNames.toSeq ==
      Seq("doc_id", "media_type", "n_bytes", "feature", "byte_sums"))
    val r1 = df.orderBy("doc_id").first()
    val r2 = operators.Multimodal.binaryPipeline(spark, sfTiny)
      .orderBy("doc_id").first()
    assert(r1 == r2, "stub decode must be deterministic")
    assert(r1.getSeq[Float](3).length == 8)
    // n_bytes matches the payload the codec saw
    val bad = df.join(Tables.documents(spark, sfTiny), "doc_id")
      .filter(col("n_bytes") =!= length(col("text"))).count()
    assert(bad == 0)
  }

  test("resize: quarter-ish output, sums bounded by byte range") {
    val r = operators.Multimodal.resize(spark, sfTiny)
    assert(r.count() == Tables.documents(spark, sfTiny).count())
    assert(r.filter(col("n_bytes_out") > col("n_bytes_in")).count() == 0)
    // factor-2 block pooling over a 16-wide grid: output cells ≈ in/4
    // (+ partial-row/column slack)
    assert(r.filter(col("n_bytes_out") * 4 >
      col("n_bytes_in") + lit(32)).count() == 0)
    assert(r.filter(col("resized_sum") > col("n_bytes_out") * 255)
      .count() == 0, "a pooled byte stays within [0, 255]")
    assert(r.filter(col("n_bytes_out") < 1).count() == 0)
  }

  test("frame sample: every 5th second inclusive of zero and duration") {
    val df = operators.Multimodal.frameSample(spark, sfTiny)
    val byDoc = df.groupBy("doc_id", "duration_s")
      .agg(count(lit(1)).as("n"), max("frame_idx").as("mx"))
    val bad = byDoc.filter(
      col("n") =!= (col("duration_s") / 5).cast("int") + 1 ||
        col("mx") > col("duration_s")).count()
    assert(bad == 0)
  }

  test("audio window: frame grid matches the hop formula; a sampled " +
      "doc's frames recompute exactly") {
    val a = operators.Multimodal.audioWindow(spark, sfTiny)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    assert(a.filter(col("peak") > 255 || col("peak") < 0).count() == 0)
    assert(a.filter(col("energy") > 256L * 255L ||
      col("energy") < col("peak")).count() == 0)
    // per-doc frame count == the window/hop formula over n_chars (ASCII:
    // byte length == char length); short docs emit zero frames
    val counts = a.groupBy("doc_id").agg(count(lit(1)).as("n"),
      max("frame_idx").as("mx"))
    val expected = Tables.documents(spark, sfTiny)
      .select(col("doc_id"), col("n_chars"),
        when(col("n_chars") < 256, 0L)
          .otherwise(floor((col("n_chars") - 256) / 128) + 1).as("want"))
    val j = expected.join(counts, Seq("doc_id"), "left")
    assert(j.filter(coalesce(col("n"), lit(0L)) =!= col("want"))
      .count() == 0, "frame counts must match the hop formula")
    // byte-exact recompute for one real document
    val doc = Tables.documents(spark, sfTiny)
      .filter(col("n_chars") >= 300).orderBy(col("doc_id").desc)
      .select(col("doc_id"), col("text")).head()
    val bytes = doc.getString(1).getBytes("UTF-8")
    val want = (0 to (bytes.length - 256) / 128).map { k =>
      val slice = bytes.slice(k * 128, k * 128 + 256).map(_ & 0xff)
      (k, slice.map(_.toLong).sum, slice.max)
    }
    val got = a.filter(col("doc_id") === doc.getLong(0))
      .orderBy(col("frame_idx"))
      .collect().map(r => (r.getInt(1), r.getLong(2), r.getInt(3))).toSeq
    assert(got == want, s"doc ${doc.getLong(0)}: got ${got.take(3)} " +
      s"want ${want.take(3)}")
    a.unpersist()
  }

  test("mm_resize REAL decode: a generated PNG decodes through " +
      "javax.imageio and the output re-derives from the same pixels; " +
      "text payloads keep the stub grid bit-for-bit") {
    import java.awt.image.BufferedImage
    // a 20x12 RGB gradient whose luma we can recompute independently
    val (w, h) = (20, 12)
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w)
      img.setRGB(x, y, ((x * 12) << 16) | ((y * 20) << 8) | (x + y))
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", baos)
    val png = baos.toByteArray
    // expected: integer BT.601 luma grid -> 2x block-average pooling
    val luma = Array.tabulate(h * w) { i =>
      val (y, x) = (i / w, i % w)
      (((x * 12) * 299 + (y * 20) * 587 + (x + y) * 114) / 1000).toByte
    }
    val ow = (w + 1) / 2
    val cells = luma.zipWithIndex
      .groupBy { case (_, i) => (i / w / 2) * ow + (i % w / 2) }
    val wantN = cells.size.toLong
    val wantSum = cells.values
      .map(c => c.map(_._1 & 0xff).map(_.toLong).sum / c.length).sum
    val textBytes = "a plain text payload, not an image".getBytes("UTF-8")
    import spark.implicits._
    val df = Seq((1L, png), (2L, textBytes)).toDF("doc_id", "payload")
    val got = operators.Multimodal.resizeRows(df)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got(1L) == ((png.length.toLong, wantN, wantSum)),
      s"PNG leg: got ${got(1L)}, want ($wantN, $wantSum) from pixels")
    // stub parity: a non-image payload must produce EXACTLY what the
    // corpus oracle computes (16-wide grid, 2x pooling) — the real
    // decoder's presence changes nothing for text bytes
    val gw = 16
    val sow = (gw + 1) / 2
    val sCells = textBytes.zipWithIndex
      .groupBy { case (_, i) => (i / gw / 2) * sow + (i % gw / 2) }
    val sWant = (textBytes.length.toLong, sCells.size.toLong,
      sCells.values.map(c => c.map(_._1 & 0xff).map(_.toLong).sum
        / c.length).sum)
    assert(got(2L) == sWant, s"stub leg diverged: ${got(2L)} vs $sWant")
  }

  test("mm_resize REAL decode: a generated JPEG rides the same seam — " +
      "expected output re-derived from ImageIO's own decoded pixels") {
    import java.awt.image.BufferedImage
    val (w, h) = (24, 16)
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w)
      img.setRGB(x, y, ((x * 10) << 16) | ((y * 15) << 8) | ((x * y) % 256))
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", baos)
    val jpg = baos.toByteArray
    assert((jpg(0) & 0xff) == 0xff && (jpg(1) & 0xff) == 0xd8,
      "generated payload must carry the JPEG magic")
    // JPEG decode is lossy vs the source but DETERMINISTIC for the
    // payload: the expectation derives from the decoded pixels, which
    // is exactly the byte-exactness contract the operator makes
    val back = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(jpg))
    val luma = Array.tabulate(h * w) { i =>
      val rgb = back.getRGB(i % w, i / w)
      ((((rgb >> 16) & 0xff) * 299 + ((rgb >> 8) & 0xff) * 587 +
        (rgb & 0xff) * 114) / 1000).toByte
    }
    val ow = (w + 1) / 2
    val cells = luma.zipWithIndex
      .groupBy { case (_, i) => (i / w / 2) * ow + (i % w / 2) }
    val wantN = cells.size.toLong
    val wantSum = cells.values
      .map(c => c.map(_._1 & 0xff).map(_.toLong).sum / c.length).sum
    import spark.implicits._
    val got = operators.Multimodal.resizeRows(
        Seq((7L, jpg)).toDF("doc_id", "payload"))
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got(7L) == ((jpg.length.toLong, wantN, wantSum)),
      s"JPEG leg: got ${got(7L)}, want ($wantN, $wantSum)")
  }

  test("mm_shard_write round-trip: every written tar reads back " +
      "member-by-member byte-equal to the source payloads, and the " +
      "manifest is exact 512-byte arithmetic") {
    val manifest = operators.Multimodal.shardWrite(spark, sfTiny)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val docs = Tables.documents(spark, sfTiny)
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1).getBytes("UTF-8")).toMap
    val plan = operators.Multimodal.shardPack(spark, sfTiny)
      .select(col("shard_id"), col("doc_id")).collect()
      .map(r => r.getLong(1) -> r.getLong(0)).toMap
    val outDir = new java.io.File(
      new java.net.URI("file://" +
        operators.Multimodal.shardsDir(sfTiny)).getPath)
    val tars = outDir.listFiles().filter(_.getName.endsWith(".tar"))
    assert(tars.length == manifest.size, "one archive per manifest row")
    var members = 0L
    tars.foreach { f =>
      val sid = f.getName.stripPrefix("shard-").stripSuffix(".tar").toLong
      val bytes = java.nio.file.Files.readAllBytes(f.toPath)
      val (nm, pb, tb) = manifest(sid)
      assert(bytes.length.toLong == tb,
        s"shard $sid: file ${bytes.length}B vs manifest ${tb}B")
      val read = operators.Multimodal.readTar(bytes)
      assert(read.length.toLong == nm, s"shard $sid member count")
      assert(read.map(_._2.length.toLong).sum == pb,
        s"shard $sid payload bytes")
      read.foreach { case (name, payload) =>
        val id = name.stripSuffix(".txt").toLong
        assert(plan(id) == sid, s"doc $id landed in shard $sid, " +
          s"plan says ${plan(id)}")
        assert(java.util.Arrays.equals(payload, docs(id)),
          s"doc $id: tar payload diverges from the source bytes")
      }
      members += read.length
    }
    assert(members == docs.size, "every document is in exactly one shard")
  }

  test("mm_audio_window REAL decode: a generated 16-bit PCM WAV " +
      "decodes through javax.sound and the frames re-derive from the " +
      "same samples; a stereo WAV averages channels; text payloads " +
      "keep the raw-byte framing bit-for-bit") {
    import javax.sound.sampled._
    def wavBytes(samples: Array[Short], channels: Int): Array[Byte] = {
      // interleaved 16-bit little-endian PCM frames
      val pcm = new Array[Byte](samples.length * 2)
      samples.zipWithIndex.foreach { case (s, i) =>
        pcm(2 * i) = (s & 0xff).toByte
        pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
      }
      val fmt = new AudioFormat(8000f, 16, channels, true, false)
      val ais = new AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), fmt,
        samples.length / channels)
      val bos = new java.io.ByteArrayOutputStream()
      AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
      bos.toByteArray
    }
    def amp(s: Short): Int = (s.toInt + 32768) >> 8
    // 700 mono sample frames -> 700 amplitude bytes -> 4 windows
    val mono = Array.tabulate(700)(i =>
      ((i * 2347 + 11) % 65536 - 32768).toShort)
    // 600 stereo frames: amplitude = channel-average (integer division)
    val stereo = Array.tabulate(1200)(i =>
      ((i * 911 + 5) % 65536 - 32768).toShort)
    def expectedFrames(a: Array[Int]): Seq[(Int, Long, Int)] = {
      val n = if (a.length < 256) 0 else (a.length - 256) / 128 + 1
      (0 until n).map { k =>
        val w = a.slice(k * 128, k * 128 + 256)
        (k, w.map(_.toLong).sum, w.max)
      }
    }
    val monoAmp = mono.map(amp)
    val stereoAmp = Array.tabulate(600)(f =>
      (amp(stereo(2 * f)) + amp(stereo(2 * f + 1))) / 2)
    val text = ("not a wav, just bytes " * 20).getBytes("UTF-8")
    val textAmp = text.map(_ & 0xff)
    import spark.implicits._
    val got = operators.Multimodal.audioWindowRows(
        Seq((1L, wavBytes(mono, 1)), (2L, wavBytes(stereo, 2)),
          (3L, text)).toDF("doc_id", "payload"))
      .collect()
      .groupBy(_.getLong(0))
      .view.mapValues(_.map(r =>
        (r.getInt(1), r.getLong(2), r.getInt(3))).sortBy(_._1).toSeq)
      .toMap
    assert(got(1L) == expectedFrames(monoAmp), "mono WAV leg")
    assert(got(2L) == expectedFrames(stereoAmp), "stereo WAV leg")
    assert(got(3L) == expectedFrames(textAmp),
      "non-WAV payloads must keep the raw-byte framing")
  }

  test("mm_shard_write Hadoop-FS branch: forcing the remote-FS code " +
      "path through the local ChecksumFileSystem writes the same " +
      "byte-exact archives, with checksums off (no .crc twins) and " +
      "no leftover temp files") {
    val manifest = operators.Multimodal
      .shardWriteImpl(spark, sfTiny, forceHadoopFs = true)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val docs = Tables.documents(spark, sfTiny)
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1).getBytes("UTF-8")).toMap
    val outDir = new java.io.File(
      new java.net.URI("file://" +
        operators.Multimodal.shardsDir(sfTiny)).getPath)
    val files = outDir.listFiles()
    assert(!files.exists(_.getName.endsWith(".crc")),
      "setWriteChecksum(false) must suppress ChecksumFileSystem's " +
        ".crc twin per archive")
    assert(!files.exists(_.getName.endsWith(".tmp")),
      "every temp file must be renamed away by the commit")
    val tars = files.filter(_.getName.endsWith(".tar"))
    assert(tars.length == manifest.size, "one archive per manifest row")
    var members = 0L
    tars.foreach { f =>
      val sid = f.getName.stripPrefix("shard-").stripSuffix(".tar").toLong
      val bytes = java.nio.file.Files.readAllBytes(f.toPath)
      val (nm, pb, tb) = manifest(sid)
      assert(bytes.length.toLong == tb,
        s"shard $sid: file ${bytes.length}B vs manifest ${tb}B")
      val read = operators.Multimodal.readTar(bytes)
      assert(read.length.toLong == nm, s"shard $sid member count")
      assert(read.map(_._2.length.toLong).sum == pb,
        s"shard $sid payload bytes")
      read.foreach { case (name, payload) =>
        val id = name.stripSuffix(".txt").toLong
        assert(java.util.Arrays.equals(payload, docs(id)),
          s"doc $id: tar payload diverges from the source bytes")
      }
      members += read.length
    }
    assert(members == docs.size, "every document is in exactly one shard")
  }
}
