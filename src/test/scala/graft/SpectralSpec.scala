package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.audio.SpectralOps

/** The upstream acoustic pipeline (SpectralOps): the FFT stage cannot be
  * replayed by the DuckDB oracle, so its physics is pinned here —
  * Parseval energy conservation, tone-bin dominance, agreement with a
  * naive O(n²) DFT — plus the framing layout, decidecade labels, and
  * the no-shuffle plan shape of the map stage. */
class SpectralSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def naivePowerSpectrum(x: Array[Double]): Array[Double] = {
    val n = x.length
    val w = SpectralOps.hannWindow(n)
    val y = Array.tabulate(n)(i => x(i) * w(i))
    Array.tabulate(n / 2 + 1) { k =>
      var re = 0.0; var im = 0.0
      var i = 0
      while (i < n) {
        val a = -2.0 * math.Pi * k * i / n
        re += y(i) * math.cos(a); im += y(i) * math.sin(a)
        i += 1
      }
      val p = re * re + im * im
      if (k == 0 || k == n / 2) p else 2.0 * p
    }
  }

  test("hann window: endpoints zero, center one, symmetric") {
    val w = SpectralOps.hannWindow(256)
    assert(w(0) == 0.0 && math.abs(w(128) - 1.0) < 1e-12)
    (1 until 256).foreach(i => assert(math.abs(w(i) - w(256 - i)) < 1e-12))
  }

  test("Parseval: sum of one-sided power bins = N * windowed energy") {
    val rnd = new scala.util.Random(7)
    val n = 256
    val frame = Array.fill(n)(rnd.nextGaussian())
    val w = SpectralOps.hannWindow(n)
    val p = SpectralOps.framePower(frame, w)
    val energy = frame.zip(w).map { case (x, wi) => x * wi * x * wi }.sum
    assert(math.abs(p.sum - n * energy) / (n * energy) < 1e-12,
      s"${p.sum} vs ${n * energy}")
  }

  test("bin-aligned tone concentrates in its Hann mainlobe (k-1..k+1)") {
    val n = 256; val sr = 1024
    val f = 8 * sr / n // exactly bin 8
    val frame = Array.tabulate(n)(i => math.sin(2 * math.Pi * f * i / sr.toDouble))
    val p = SpectralOps.framePower(frame, SpectralOps.hannWindow(n))
    val lobe = p(7) + p(8) + p(9)
    assert(lobe / p.sum > 0.99, s"mainlobe carries ${lobe / p.sum}")
    assert(p(8) > p(7) && p(8) > p(9))
  }

  test("FFT power spectrum agrees with the naive O(n^2) DFT") {
    val rnd = new scala.util.Random(42)
    val frame = Array.fill(256)(rnd.nextGaussian())
    val fast = SpectralOps.framePower(frame, SpectralOps.hannWindow(256))
    val slow = naivePowerSpectrum(frame)
    val scale = slow.max
    fast.zip(slow).zipWithIndex.foreach { case ((a, b), k) =>
      assert(math.abs(a - b) / scale < 1e-9, s"bin $k: $a vs $b")
    }
  }

  test("ISO R10 nominal decidecade centers") {
    assert(SpectralOps.nominalCenter(18) == 63.0)
    assert(SpectralOps.nominalCenter(20) == 100.0)
    assert(SpectralOps.nominalCenter(21) == 125.0)
    assert(SpectralOps.nominalCenter(26) == 400.0)
    assert(SpectralOps.nominalCenter(13) == 20.0)
  }

  test("framing layout: hop-overlapped slices, expected frame count") {
    import spark.implicits._
    val df = Seq((1L, (0 until 1024).map(_.toDouble).toArray))
      .toDF("doc_id", "samples")
    val framed = SpectralOps.frameWaveform(df, "samples", 256, 128)
      .orderBy("frame_idx").collect()
    assert(framed.length == 7) // (1024-256)/128 + 1
    framed.foreach { r =>
      val fi = r.getInt(r.fieldIndex("frame_idx"))
      val fr = r.getSeq[Double](r.fieldIndex("frame"))
      assert(fr.length == 256)
      assert(fr.head == fi * 128.0 && fr.last == fi * 128.0 + 255.0)
    }
  }

  test("waveforms shorter than one frame contribute zero frames") {
    // sequence(0, negative) defaults to step -1 in Spark — without the
    // guard a 59-sample tolerant partial decode would emit NEGATIVE
    // frame indices with end-relative slices feeding corrupt partials
    import spark.implicits._
    val short = Seq((1L, Array.fill(59)(0.5)), (2L, Array.fill(300)(0.5)))
      .toDF("doc_id", "samples")
    val framed = SpectralOps.frameWaveform(short, "samples", 256, 128)
    val rows = framed.select("doc_id", "frame_idx").collect()
      .map(r => (r.getLong(0), r.getInt(1))).toSeq.sorted
    assert(rows == Seq((2L, 0))) // doc 1: zero frames; doc 2: exactly one
  }

  test("synthesis kernel ≡ expression formulation, bit for bit") {
    // the mapPartitions kernel replaced the interpreted transform-lambda
    // on the hot path; same Math.sin, same operation order — every
    // sample must be == (not approx), or the fixture seam would shift
    val ids = spark.range(40).select(col("id").as("doc_id"))
    def collectWaves(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("doc_id").collect()
        .map(r => (r.getLong(0), r.getSeq[Double](1).toArray)).toSeq
    val kernel = collectWaves(SpectralOps.synthesizeWaves(ids, "doc_id", 1024, 512))
    val expr = collectWaves(SpectralOps.synthesizeWavesExpr(ids, "doc_id", 1024, 512))
    assert(kernel.map(_._1) == expr.map(_._1))
    kernel.zip(expr).foreach { case ((id, k), (_, e)) =>
      assert(java.util.Arrays.equals(k, e), s"doc $id waveforms differ")
    }
  }

  test("detectEvents: islands merge consecutive hot frames; window is " +
       "per-recording, never global") {
    import spark.implicits._
    // doc 1: hot 0-2, cold 3, hot 5-6 → two events; doc 2: all cold
    val partials = Seq(
      (1L, 0, 63.0, 2000000000000L), (1L, 1, 63.0, 2000000000000L),
      (1L, 2, 63.0, 1500000000000L), (1L, 3, 63.0, 1000000000L),
      (1L, 5, 63.0, 3000000000000L), (1L, 6, 63.0, 2500000000000L),
      (2L, 0, 63.0, 500000000L), (2L, 1, 63.0, 500000000L)
    ).toDF("doc_id", "frame_idx", "band", "p_nano")
    val events = SpectralOps.detectEvents(partials, "doc_id",
        1000000000000L, 1024, 128)
      .orderBy("doc_id", "start_frame").collect()
    assert(events.length == 2)
    assert(events(0).getLong(0) == 1L && events(0).getInt(1) == 0 &&
      events(0).getInt(2) == 2 && events(0).getLong(3) == 3 &&
      events(0).getLong(4) == 2000000000000L)
    assert(events(1).getInt(1) == 5 && events(1).getInt(2) == 6 &&
      events(1).getLong(3) == 2)
    // start/end seconds derive from the hop
    assert(events(1).getDouble(5) == 5 * 128.0 / 1024)
    assert(events(1).getDouble(6) == (6 * 128.0 + 128) / 1024)
    // the island window must be partitioned by recording — a global
    // window would serialize the whole corpus through one partition
    // (logical plan: AQE wraps the physical one before execution)
    val wins = SpectralOps.detectEvents(partials, "doc_id",
        1000000000000L, 1024, 128)
      .queryExecution.optimizedPlan.collect {
        case w: org.apache.spark.sql.catalyst.plans.logical.Window => w
      }
    assert(wins.nonEmpty && wins.forall(_.partitionSpec.nonEmpty))
  }

  test("decimation: passband tone preserved, above-output-Nyquist tone " +
       "attenuated, DC gain unity") {
    import spark.implicits._
    val taps = SpectralOps.designLowpass(63, 0.45 / 2)
    assert(math.abs(taps.sum - 1.0) < 1e-12) // unit DC gain by construction
    val sr = 1024
    // 50 Hz sits well inside the decimated (sr/2=512 → Nyquist 256) band;
    // 400 Hz is above it and must NOT alias through
    val n = 4096
    val wave = Array.tabulate(n) { i =>
      val t = i.toDouble / sr
      math.sin(2 * math.Pi * 50 * t) + math.sin(2 * math.Pi * 400 * t)
    }
    val out = SpectralOps.decimateWaves(
        Seq((1L, wave)).toDF("doc_id", "samples"), "doc_id", "samples", 2)
      .select("samples").collect()(0).getSeq[Double](0).toArray
    assert(out.length == (n - 63) / 2 + 1)
    // spectral check on one 512-sample frame of the decimated signal
    // (output rate 512 Hz → bin = 1 Hz): 50 Hz strong, alias of 400 Hz
    // (folds to 112 Hz) down > 30 dB relative
    val frame = out.slice(0, 512)
    val p = SpectralOps.framePower(frame, SpectralOps.hannWindow(512))
    val p50 = p.slice(48, 53).max
    val pAlias = p.slice(110, 115).max
    assert(p50 > 1000 * pAlias,
      s"passband $p50 vs alias $pAlias — anti-alias filter not working")

    // shorter-than-filter inputs contribute ZERO samples — integer
    // division truncating toward zero made (62-63)/2+1 == 1 and the
    // kernel read past the array (truncated-decode input shape)
    val short = SpectralOps.decimateWaves(
        Seq((1L, Array.fill(62)(0.5)), (2L, Array.fill(63)(0.5)))
          .toDF("doc_id", "samples"), "doc_id", "samples", 2)
      .selectExpr("doc_id", "size(samples) AS n").collect()
      .map(r => (r.getLong(0), r.getInt(1))).toMap
    assert(short(1L) == 0 && short(2L) == 1, short.toString)
  }

  test("FFT cross-correlation agrees with the naive formulation") {
    val rnd = new scala.util.Random(7)
    val a = Array.fill(300)(rnd.nextDouble() - 0.5)
    val b = Array.fill(300)(rnd.nextDouble() - 0.5)
    val fft = SpectralOps.crossCorrelation(a, b, 40)
    val naive = SpectralOps.crossCorrelationNaive(a, b, 40)
    assert(fft.length == 81 && naive.length == 81)
    fft.indices.foreach { i =>
      assert(math.abs(fft(i) - naive(i)) < 1e-9,
        s"lag ${i - 40}: ${fft(i)} vs ${naive(i)}")
    }
  }

  test("TDOA end-to-end: the peak lag recovers the planted delay, " +
       "per-pair window only") {
    val ids = spark.range(40).select(col("id").as("doc_id"))
    val pairs = SpectralOps.synthesizeDelayedPairs(ids, "doc_id", 1024, 1024)
    val peaks = SpectralOps.tdoaPeaks(
      SpectralOps.pairCorrelations(pairs, "doc_id", 32), "doc_id", 1024)
      .orderBy("doc_id").collect()
    assert(peaks.length == 40)
    peaks.foreach { r =>
      val id = r.getLong(0)
      val expected = (id % 50).toInt - 24
      assert(r.getInt(1) == expected,
        s"doc $id: peak lag ${r.getInt(1)} != planted delay $expected")
      // round() is half-away-from-zero in both Spark and DuckDB
      val expSec = BigDecimal(expected / 1024.0)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(r.getDouble(2) == expSec)
    }
    val wins = SpectralOps.tdoaPeaks(
      SpectralOps.pairCorrelations(pairs, "doc_id", 32), "doc_id", 1024)
      .queryExecution.optimizedPlan.collect {
        case w: org.apache.spark.sql.catalyst.plans.logical.Window => w
      }
    assert(wins.nonEmpty && wins.forall(_.partitionSpec.nonEmpty))
  }

  test("fused frame→FFT→band kernel ≡ unfused stages, row for row") {
    import spark.implicits._
    val waves = SpectralOps.synthesizeWaves(
      spark.range(20).select(col("id").as("doc_id")), "doc_id", 1024, 1024)
    val framed = SpectralOps.frameWaveform(waves, "samples", 256, 128)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("doc_id", "frame_idx", "band").collect()
        .map(r => (r.getLong(0), r.getInt(r.fieldIndex("frame_idx")),
          r.getDouble(r.fieldIndex("band")), r.getLong(r.fieldIndex("p_nano"))))
        .toSeq
    val unfused = rows(SpectralOps.bandPartials(
      SpectralOps.powerSpectra(framed, "doc_id", 256), "doc_id", 1024, 256)
      .withColumn("doc_id", col("doc_id").cast("long")))
    val fused = rows(SpectralOps.bandPartialsFused(framed, "doc_id", 1024, 256))
    assert(fused == unfused && fused.nonEmpty)
    // the fused plan has NO shuffle before its output (one narrow map)
    val p = SpectralOps.bandPartialsFused(framed, "doc_id", 1024, 256)
      .queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), p)
  }

  test("pipeline: tone energy lands in the right decidecade; map stage " +
       "plans shuffle-free") {
    import spark.implicits._
    // doc_id 0 → f1=20 Hz, f2=80 Hz tones (synthesizeWaves' derivation)
    val waves = SpectralOps.synthesizeWaves(
      Seq(0L).toDF("doc_id"), "doc_id", 1024, 1024)
    val spectra = SpectralOps.powerSpectra(
      SpectralOps.frameWaveform(waves, "samples", 256, 128), "doc_id", 256)
    // framing + FFT are one narrow map: no Exchange in the stage's plan
    assert(!spectra.queryExecution.executedPlan.toString.contains("Exchange"))
    val db = SpectralOps.welchBandDb(
        SpectralOps.bandPartials(spectra, "doc_id", 1024, 256), "doc_id")
      .collect().map(r => r.getDouble(1) -> r.getDouble(2)).toMap
    // 20 Hz → decidecade 13 (nominal 20); 80 Hz → 19 (nominal 80). The
    // Hann mainlobe is ±1 FFT bin at ~-6 dB, and at these frequencies
    // the adjacent bin falls in the NEIGHBORING decidecade (16/25 around
    // 20 Hz; 63/100 around 80 Hz) — so those bands legitimately carry
    // mainlobe energy. Everything else is sidelobe floor and must sit
    // >20 dB below the tones.
    val toneBands = Set(20.0, 80.0)
    val mainlobe = toneBands ++ Set(16.0, 25.0, 63.0, 100.0)
    val toneMin = toneBands.map(db).min
    // sidelobe bands may be absent entirely (power below the nano-unit
    // floor → dropped by welchBandDb) — absence IS ">20 dB below"
    val rest = db.view.filterKeys(b => !mainlobe.contains(b)).values
    assert(rest.isEmpty || toneMin - rest.max > 20.0,
      s"tone bands $toneMin dB vs loudest sidelobe band ${rest.maxOption}")
    // and within the mainlobe the tone's own band is the peak (at 80 Hz
    // the whole ±1-bin lobe fits INSIDE decidecade 19, so 63/100 may be
    // absent entirely — compare only bands that surfaced)
    Seq(16.0, 25.0, 63.0, 100.0).flatMap(db.get).foreach { side =>
      assert(toneMin > side, s"mainlobe side band $side >= tone $toneMin")
    }
  }

  test("exceedance levels: L10 ≥ L50 ≥ L90 per band, ranks from the " +
      "full frame population") {
    val r = graft.SparkEntry.queries("q_audio_exceedance")(
        spark, TestSpark.Sf0001).collect()
    assert(r.nonEmpty)
    r.foreach { row =>
      val (l10, l50, l90) = (Option(row.get(1)).map(_.asInstanceOf[Double]),
        Option(row.get(2)).map(_.asInstanceOf[Double]),
        Option(row.get(3)).map(_.asInstanceOf[Double]))
      // exceedance is antitone in q: the level exceeded 10% of the time
      // is at least the median, which is at least the 90%-exceeded floor
      for (a <- l10; b <- l50) assert(a >= b, s"L10 $a < L50 $b @ ${row.get(0)}")
      for (b <- l50; c <- l90) assert(b >= c, s"L50 $b < L90 $c @ ${row.get(0)}")
      // every band saw every frame: n = docs × frames-per-doc
      assert(row.getLong(4) > 0)
    }
  }

  test("M-weighted broadband ≤ unweighted broadband (peak-normalized " +
      "curve never amplifies)") {
    import spark.implicits._
    val weighted = graft.SparkEntry.queries("q_audio_weighted")(
        spark, TestSpark.Sf0001)
      .select("doc_id", "weighted_db").as[(Long, Double)].collect().toMap
    // unweighted broadband: 10·log10(Σ_b mean_p_b) from the same partials
    val waves = SpectralOps.synthesizeWaves(
      graft.tables.Tables.documents(spark, TestSpark.Sf0001).select("doc_id"),
      "doc_id", 1024, 1024)
    val broadband = SpectralOps.welchBandDb(
        SpectralOps.bandPartialsFused(
          SpectralOps.frameWaveform(waves, "samples", 256, 128),
          "doc_id", 1024, 256), "doc_id")
      .groupBy(col("doc_id"))
      .agg(sum(expr("pow(10.0, value_db / 10.0)")).as("lin"))
      .select(col("doc_id"), (lit(10.0) * log(10.0, col("lin"))).as("bb_db"))
      .as[(Long, Double)].collect().toMap
    assert(weighted.nonEmpty && weighted.keySet == broadband.keySet)
    weighted.foreach { case (id, wdb) =>
      assert(wdb <= broadband(id) + 1e-6,
        s"doc $id weighted $wdb > broadband ${broadband(id)}")
    }
  }

  test("SEL: islands line up with the detections; cumulative energy ≥ " +
      "any single frame's share") {
    val sel = graft.SparkEntry.queries("q_audio_sel")(spark, TestSpark.Sf0001)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2)) ->
        (r.getLong(3), r.getDouble(4))).toMap
    val det = graft.SparkEntry.queries("q_audio_detections")(
        spark, TestSpark.Sf0001)
      .collect().map(r => ((r.getLong(0), r.getInt(1), r.getInt(2)),
        r.getLong(4))).toMap
    assert(sel.nonEmpty && sel.keySet == det.keySet,
      "SEL islands must be exactly the detection islands")
    sel.foreach { case (k, (n, selDb)) =>
      // Σ frame_p ≥ peak_p ⇒ SEL ≥ the peak frame's own exposure
      val peakDb = 10.0 * math.log10(det(k).toDouble / 1e9 * (128.0 / 1024))
      assert(selDb >= peakDb - 1e-6, s"island $k SEL $selDb < peak-frame $peakDb")
      assert(n >= 1)
    }
  }

  test("LTSA: cell × band coverage tiles the corpus — per-band frame " +
      "counts sum back to the full population") {
    import spark.implicits._
    val ltsa = graft.SparkEntry.queries("q_audio_ltsa")(spark, TestSpark.Sf0001)
    val perBand = ltsa.groupBy(col("band")).agg(sum(col("n")).as("total"))
      .as[(Double, Long)].collect().toMap
    val docs = graft.tables.Tables.documents(spark, TestSpark.Sf0001).count()
    // every recording contributes its 7 hop-overlapped frames to every
    // band that carries any power; tone bands carry power in all docs
    assert(perBand.values.max == docs * 7,
      s"densest band covers ${perBand.values.max}, expected ${docs * 7}")
    // cells partition doc_id space: no cell outside [0, maxDoc/16]
    val cells = ltsa.select("time_cell").distinct()
      .as[Long].collect().sorted
    assert(cells.head >= 0 && cells.distinct.length == cells.length)
  }
}
