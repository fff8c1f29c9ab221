package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.multimodal.MultimodalOps

class MultimodalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val payloads = MultimodalOps.withSyntheticPayload(
    Seq((0L, "abcd"), (1L, ""), (2L, "a" * 5000)).toDF("doc_id", "text"),
    "doc_id", "text")

  test("payload schema: binary blob + typed metadata struct") {
    val sch = payloads.schema
    assert(sch("payload").dataType.typeName == "binary")
    val metaFields = sch("meta").dataType.asInstanceOf[org.apache.spark.sql.types.StructType]
      .fields.map(f => (f.name, f.dataType)).toSeq
    assert(metaFields == MultimodalOps.MetadataSchema.fields.map(f => (f.name, f.dataType)).toSeq)
    val meta = payloads.filter($"doc_id" === 0L).select("meta.n_bytes")
      .head().getLong(0)
    assert(meta == 4L)
  }

  test("feature extraction: hand-computed stats for a known payload") {
    val f = MultimodalOps.extractFeatures(payloads, "doc_id")
      .collect().map(r => r.getAs[Long]("id") ->
        (r.getAs[Long]("nBytes"), r.getAs[Double]("meanByte"),
         r.getAs[Double]("byteEntropy"), r.getAs[Int]("nFrames"))).toMap
    // "abcd" = bytes 97,98,99,100 → mean 98.5, entropy log2(4)=2, 1 frame
    assert(f(0L) == ((4L, 98.5, 2.0, 1)))
    // empty payload degrades to zeros, 0 frames
    assert(f(1L) == ((0L, 0.0, 0.0, 0)))
    // 5000 identical bytes → entropy 0, 2 frames at 4096
    assert(f(2L)._3 == 0.0 && f(2L)._4 == 2)
  }

  test("frame sampling: stride-2 frames with correct lengths") {
    val frames = MultimodalOps.sampleFrames(payloads, "doc_id",
        frameSize = 1024, stride = 2)
      .select(col("doc_id"), col("frame_idx"), length(col("frame_bytes")).as("len"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
    // doc 2: 5000 bytes → frames 0..4; kept 0,2,4 with lens 1024,1024,904
    val d2 = frames.filter(_._1 == 2L).sortBy(_._2)
    assert(d2.map(_._2).toSeq == Seq(0, 2, 4))
    assert(d2.map(_._3).toSeq == Seq(1024, 1024, 904))
    // doc 0: 4 bytes → frame 0 only
    assert(frames.filter(_._1 == 0L).map(_._3).toSeq == Seq(4))
  }

  test("resize stub: hand-computed checksums, empty payload, factor walk") {
    val r = MultimodalOps.resizePayloads(payloads, "doc_id", factor = 2)
      .collect().map(row => row.getAs[Long]("id") ->
        (row.getAs[Long]("inBytes"), row.getAs[Long]("outBytes"),
         row.getAs[Long]("byteSum"), row.getAs[Long]("weightedSum"))).toMap
    // "abcd" factor 2 keeps bytes [a,c] = [97,99]: sum 196, wsum 0*97+1*99
    assert(r(0L) == ((4L, 2L, 196L, 99L)))
    assert(r(1L) == ((0L, 0L, 0L, 0L)))
    // 5000 × 'a'(97), factor 2 → 2500 kept, sum 2500*97, wsum 97*(0+..+2499)
    assert(r(2L) == ((5000L, 2500L, 2500L * 97, 97L * (2499L * 2500L / 2))))
  }

  test("multimodal parquet layout: metadata predicates prune without touching payload") {
    val dir = java.nio.file.Files.createTempDirectory("graft_mm").toString
    payloads.write.mode("overwrite").parquet(dir)
    // metadata-only query: the payload column must not even be read
    val metaOnly = spark.read.parquet(dir)
      .filter(col("meta.n_bytes") > 100L)
      .select(col("doc_id"), col("meta.n_bytes"))
    assert(metaOnly.collect().map(_.getLong(0)).toSeq == Seq(2L))
    val plan = metaOnly.queryExecution.executedPlan.toString
    val read = plan.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(!read.contains("payload"), read)
    // and the nested predicate reaches the scan as a pushed filter
    assert(plan.contains("PushedFilters: [") &&
      plan.contains("n_bytes"), plan.linesIterator.take(25).mkString("\n"))
  }

  test("REAL codec (javax.imageio): PNG round-trip decodes and resizes " +
       "through the same batched scaffold; garbage payloads quarantine") {
    // generate real PNGs with known geometry and a solid known color —
    // the decode must recover all three exactly (PNG is lossless)
    def png(w: Int, h: Int, r: Int, g: Int, b: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      val rgb = (r << 16) | (g << 8) | b
      for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, rgb)
      val out = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(img, "png", out), "JDK PNG writer missing")
      out.toByteArray
    }
    val rows = Seq(
      (0L, png(8, 6, 30, 60, 90)),    // luma (30+60+90)/3 = 60
      (1L, png(16, 4, 255, 255, 255)), // luma 255
      (2L, "not an image".getBytes("UTF-8")))
    val df = rows.toDF("id", "payload")

    val decoded = MultimodalOps.decodeImages(df, "id", MultimodalOps.ImageIoCodec)
      .collect().map(r => r.getLong(0) ->
        (r.getInt(1), r.getInt(2), r.getDouble(3), r.getBoolean(4))).toMap
    assert(decoded(0L) == ((8, 6, 60.0, true)))
    assert(decoded(1L) == ((16, 4, 255.0, true)))
    assert(decoded(2L)._4 == false) // quarantined, not a task failure

    // real bilinear resize: solid-color images stay solid, so the resized
    // mean luma is exact too; geometry must be the requested one
    val resized = MultimodalOps.resizeImages(
        df, "id", MultimodalOps.ImageIoCodec, w = 4, h = 3)
      .collect().map(r => r.getLong(0) ->
        (r.getInt(1), r.getInt(2), r.getDouble(3), r.getBoolean(4))).toMap
    assert(resized(0L) == ((4, 3, 60.0, true)))
    assert(resized(1L) == ((4, 3, 255.0, true)))
    assert(resized(2L)._4 == false)
  }

  test("REAL multi-frame codec (gif): keyframe round-trip exact, stride " +
       "sampling, quarantine on garbage") {
    import graft.multimodal.MultimodalOps
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // closed-form colors survive GIF palettization exactly (solid frames)
    val ids = Seq(0L, 5L, 11L).toDF("doc_id")
    val gifs = MultimodalOps.synthesizeGifs(ids, "doc_id")
    val all = MultimodalOps.sampleKeyframes(gifs, "doc_id", 1)
      .orderBy("doc_id", "frame_idx").collect()
    Seq(0L, 5L, 11L).foreach { id =>
      val frames = all.filter(_.getLong(0) == id)
      assert(frames.length == (4 + id % 3).toInt, s"doc $id frame count")
      frames.foreach { r =>
        val f = r.getInt(1)
        assert(r.getInt(2) == 16 && r.getInt(3) == 16 && r.getBoolean(5))
        val expected = (((id * 13 + f * 29) % 256) +
          ((id * 7 + f * 31) % 256) + ((id * 3 + f * 37) % 256)) / 3.0
        assert(r.getDouble(4) == expected, s"doc $id frame $f luma")
      }
    }
    // stride 2 keeps frames 0, 2, 4, …
    val strided = MultimodalOps.sampleKeyframes(gifs, "doc_id", 2)
      .filter(col("doc_id") === 5L).select("frame_idx").collect()
      .map(_.getInt(0)).sorted.toSeq
    assert(strided == Seq(0, 2, 4)) // 6 frames for id 5
    // undecodable payload → one visible ok=false row, never a failure
    val bad = Seq((9L, "not a gif".getBytes)).toDF("doc_id", "payload")
    val q = MultimodalOps.sampleKeyframes(bad, "doc_id", 1).collect()
    assert(q.length == 1 && !q(0).getBoolean(5) && q(0).getInt(1) == -1)
    // invalid stride is CALLER error — loud at plan time, never a mass
    // quarantine (stride 0 would have silently flagged every payload)
    assertThrows[IllegalArgumentException] {
      MultimodalOps.sampleKeyframes(gifs, "doc_id", 0)
    }
  }

  test("scene cuts: hand-computed luma deltas, threshold discrimination, " +
       "per-video lag (first frame never a cut row)") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // doc 0: lumas 0, 97/3, 194/3, 97 — steady +97/3 drift (32.33),
    // below the 40 threshold: three delta rows, zero cuts
    val res = graft.queries.MultimodalQueries.queries("q_video_scene_cuts")(
      spark, TestSpark.Sf0001).collect()
    val d0 = res.filter(_.getLong(0) == 0L)
    assert(d0.map(_.getInt(1)).toSeq == Seq(1, 2, 3), "frames 1..3 only")
    d0.foreach { r =>
      assert(math.abs(r.getDouble(2) - 97.0 / 3) < 1e-4, "steady drift")
      assert(r.getInt(3) == 0, "below threshold: not a cut")
    }
    // a doc whose channels wrap mod 256 inside the frame plan reads as a
    // cut: delta |97-256k|/3 >= 53 for k >= 1. Find one in the output and
    // pin that BOTH classes occur (the threshold discriminates).
    val deltas = res.map(_.getDouble(2))
    assert(deltas.exists(_ < 40.0) && deltas.exists(_ > 40.0),
      "both cut and non-cut deltas must occur")
    res.filter(_.getDouble(2) > 40.0).foreach { r =>
      assert(r.getInt(3) == 1)
      // wrapped deltas are exactly |97 - 256k|/3 for k in 1..3
      val k = Seq(1, 2, 3).map(k => math.abs(97.0 - 256.0 * k) / 3)
      assert(k.exists(v => math.abs(v - r.getDouble(2)) < 1e-4),
        s"delta ${r.getDouble(2)} must be a wrap value")
    }
    // only the doc_id % 4 slice is scanned
    assert(res.forall(_.getLong(0) % 4 == 0))
    // PLAN SHAPE: pairing happens INSIDE the decode (framePairs), so the
    // plan has no Window node and no exchange except the serving-edge
    // sort — the lag-window formulation would shuffle the whole frame
    // table on video id before lagging
    val plan = graft.queries.MultimodalQueries.queries("q_video_scene_cuts")(
      spark, TestSpark.Sf0001).queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), "no lag window in the plan")
    // the serving-edge sort plus (r16) the Par.spread round-robin of the
    // doc_id SPINE before the codec kernel — the structural claim stays
    // "no shuffle of the decoded FRAME table": the only hash exchange is
    // the sort's range partitioning; the spread moves bare ids
    val exchanges = "Exchange".r.findAllIn(plan).length
    assert(exchanges <= 2, s"only the serving-edge sort and the id-spine spread may exchange, saw:\n$plan")
    assert(!plan.contains("Exchange hashpartitioning(doc_id"),
      s"the frame table must never hash-shuffle on video id:\n$plan")
  }

  test("REAL multi-frame codec (MJPEG-in-AVI): hand demux + JDK JPEG " +
       "decode, luma within codec tolerance, stride sampling, quarantine") {
    import graft.multimodal.MultimodalOps
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val ids = Seq(0L, 5L, 11L).toDF("doc_id")
    val avis = MultimodalOps.synthesizeAvis(ids, "doc_id")
    val all = MultimodalOps.sampleAviKeyframes(avis, "doc_id", 1)
      .orderBy("doc_id", "frame_idx").collect()
    Seq(0L, 5L, 11L).foreach { id =>
      val frames = all.filter(_.getLong(0) == id)
      assert(frames.length == (4 + id % 3).toInt, s"doc $id frame count")
      frames.foreach { r =>
        val f = r.getInt(1)
        assert(r.getInt(2) == 16 && r.getInt(3) == 16 && r.getBoolean(5))
        // JPEG is lossy: a solid 16×16 frame round-trips its mean luma
        // to within a few gray levels (DC quantization + YCbCr
        // rounding) — pin the tolerance, not bit-equality
        val expected = (((id * 13 + f * 29) % 256) +
          ((id * 7 + f * 31) % 256) + ((id * 3 + f * 37) % 256)) / 3.0
        assert(math.abs(r.getDouble(4) - expected) <= 4.0,
          s"doc $id frame $f luma ${r.getDouble(4)} vs $expected")
      }
    }
    val strided = MultimodalOps.sampleAviKeyframes(avis, "doc_id", 2)
      .filter(col("doc_id") === 5L).select("frame_idx").collect()
      .map(_.getInt(0)).sorted.toSeq
    assert(strided == Seq(0, 2, 4))
    // a WAV-shaped RIFF (right grammar, wrong form type) and plain
    // garbage both quarantine cleanly
    val bad = Seq(
      (8L, "RIFF   WAVE".getBytes("US-ASCII")),
      (9L, "not an avi".getBytes)).toDF("doc_id", "payload")
    val q = MultimodalOps.sampleAviKeyframes(bad, "doc_id", 1).collect()
    assert(q.length == 2 && q.forall(r => !r.getBoolean(5) && r.getInt(1) == -1))
    assertThrows[IllegalArgumentException] {
      MultimodalOps.sampleAviKeyframes(avis, "doc_id", 0)
    }
    // a TRUNCATED container (crash-torn file) yields the frames before
    // the tear, never a task failure
    val full = avis.filter(col("doc_id") === 5L)
      .select("payload").head().getAs[Array[Byte]](0)
    val torn = Seq((5L, full.take(full.length - 7))).toDF("doc_id", "payload")
    val tq = MultimodalOps.sampleAviKeyframes(torn, "doc_id", 1).collect()
    assert(tq.forall(_.getBoolean(5)) && tq.length < 6 && tq.nonEmpty,
      s"torn AVI should decode a PREFIX of the 6 frames, got ${tq.length}")
  }

  test("NONSTANDARD PNG-bearing AVI decodes via the SPI-sniff fallback " +
       "instead of quarantining (r14 verdict #8); garbage frames still " +
       "quarantine") {
    import graft.multimodal.MultimodalOps
    // author 00dc chunks carrying PNGs — a container this library never
    // writes but a permissive producer might; the JPEG fast path rejects
    // the bytes and the decode must fall back to format sniffing
    def pngOf(gray: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(
        16, 16, java.awt.image.BufferedImage.TYPE_INT_RGB)
      val g = img.createGraphics()
      try { g.setColor(new java.awt.Color(gray, gray, gray))
            g.fillRect(0, 0, 16, 16) } finally g.dispose()
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    val avi = MultimodalOps.encodeAviContainer(
      Seq(pngOf(40), pngOf(200)), 16, 16, 10)
    val decoded = MultimodalOps.decodeAviKeyframes(avi, 1)
    assert(decoded.isDefined, "PNG frames must decode via the fallback")
    val frames = decoded.get
    assert(frames.map(t => (t._1, t._2, t._3)) == Seq((0, 16, 16), (1, 16, 16)))
    // PNG is LOSSLESS — unlike the JPEG tests, luma pins exactly
    assert(frames.map(_._4) == Seq(40.0, 200.0), frames.toString)
    // bytes NO reader recognizes still take the quarantine path
    val junk = MultimodalOps.encodeAviContainer(
      Seq(Array.fill[Byte](64)(0x5A)), 16, 16, 10)
    assert(MultimodalOps.decodeAviKeyframes(junk, 1).isEmpty)
  }

  test("REAL two-stream container (interleaved MJPEG + PCM16 AVI): both " +
       "streams demux, audio lane byte-exact, torn-file prefix, quarantine") {
    import graft.multimodal.MultimodalOps
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val ids = Seq(0L, 5L, 11L).toDF("doc_id")
    val avs = MultimodalOps.synthesizeAvAvis(ids, "doc_id")
    val stats = MultimodalOps.demuxAvStats(avs, "doc_id")
      .orderBy("doc_id").collect()
    assert(stats.length == 3 && stats.forall(_.getBoolean(9)))
    Seq(0L, 5L, 11L).foreach { id =>
      val r = stats.find(_.getLong(0) == id).get
      val n = (4 + id % 3).toInt
      assert(r.getInt(1) == n, s"doc $id n_frames")
      assert(r.getInt(2) == 16 && r.getInt(3) == 16)
      assert(r.getInt(4) == 1600, s"doc $id sample_rate")
      assert(r.getLong(5) == 160L * n, s"doc $id n_samples")
      // the PCM lane is LOSSLESS: exact integer aggregates of the plan
      val plan = (0 until 160 * n).map(k => ((id * 31 + k * 7) % 2001) - 1000)
      assert(r.getLong(6) == plan.sum, s"doc $id sum_samples")
      assert(r.getInt(7) == plan.min && r.getInt(8) == plan.max)
    }
    // a video-only AVI (no auds stream) and garbage both quarantine
    val videoOnly = MultimodalOps.synthesizeAvis(Seq(3L).toDF("doc_id"), "doc_id")
      .select(col("doc_id"), col("payload"))
    val q = MultimodalOps.demuxAvStats(
      videoOnly.unionByName(Seq((9L, "junk".getBytes)).toDF("doc_id", "payload")),
      "doc_id").collect()
    assert(q.length == 2 && q.forall(r => !r.getBoolean(9)))
    // a crash-torn payload still demuxes the interleaved PREFIX: fewer
    // frames, proportionally less audio, never a task failure
    val full = avs.filter(col("doc_id") === 5L)
      .select("payload").head().getAs[Array[Byte]](0)
    val torn = MultimodalOps.demuxAviAv(full.take(full.length / 2))
    assert(torn.isDefined, "torn two-stream AVI must still demux the prefix")
    assert(torn.get.jpegs.nonEmpty && torn.get.jpegs.size < 6)
    assert(torn.get.pcm.nonEmpty && torn.get.pcm.length < 160 * 6 * 2)
    assert(torn.get.sampleRate == 1600)
  }

  test("extraction is distributed: no single-partition collapse") {
    val docs = graft.tables.Tables.documents(spark, TestSpark.Sf0001)
    val feats = MultimodalOps.extractFeatures(
      MultimodalOps.withSyntheticPayload(docs, "doc_id", "text").repartition(4),
      "doc_id")
    assert(feats.rdd.getNumPartitions >= 4)
    assert(feats.count() == docs.count())
  }
}
