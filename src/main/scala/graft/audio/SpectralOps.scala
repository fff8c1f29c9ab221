package graft.audio

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Upstream acoustic pipeline — waveform → Welch power spectra →
  * 1/3-octave (decidecade) band levels — in-engine.
  *
  * The reference API only SERVES band-level PSD tables; the math that
  * produces them (windowed FFT frames, power averaging, decidecade
  * banding, dB conversion) lives in its upstream `orcasound_noise`
  * package (`docs/upstream-notes.md:10-16,140-158` describes the
  * products; `acoustic_util.py` holds the dB-domain math). A user
  * switching to this engine shouldn't need a separate single-node
  * pipeline to make the data the engine serves — this module computes
  * the same products distributed:
  *
  *  - framing/windowing are pure column expressions (slice over the
  *    sample array — codegen, no shuffle, frames never leave their
  *    partition);
  *  - the FFT runs per-partition via JTransforms (`DoubleFFT_1D`, on
  *    Spark's own classpath) inside `mapPartitions` — the legitimate
  *    per-element imperative kernel, same scaffold contract as
  *    [[graft.multimodal.MultimodalOps]] batched decode: one plan per
  *    transform, embarrassingly parallel, 100 TB of audio streams
  *    through executors without driver involvement;
  *  - banding + Welch averaging + dB are plain relational aggregates,
  *    integer-nano-unit exact where cross-engine hashes need them.
  *
  * Scale: a hydrophone-year at 48 kHz is ~1.5 TB of raw samples; the
  * whole pipeline is one narrow map (frame+FFT+band partial) followed
  * by one keyed aggregate per (recording, band) — shuffle rows are
  * band-level partials (dozens per frame), never samples.
  */
object SpectralOps {

  /** Periodic Hann window (the Welch default): w[i] = 0.5·(1−cos(2πi/N)). */
  def hannWindow(n: Int): Array[Double] =
    Array.tabulate(n)(i => 0.5 * (1.0 - math.cos(2.0 * math.Pi * i / n)))

  /** Cut a sample-array column into hop-overlapped frames — pure
    * expressions: `(n - frameLen) / hop + 1` frames per recording, each
    * a `slice` of the array. Output `(…, frame_idx, frame)`. */
  def frameWaveform(df: DataFrame, samplesCol: String,
                    frameLen: Int, hop: Int): DataFrame = {
    require(frameLen > 0 && hop > 0, s"frameLen=$frameLen hop=$hop")
    val nFrames = floor((size(col(samplesCol)) - frameLen) / hop) + 1
    // a waveform SHORTER than one frame contributes zero frames — NOT
    // explode(sequence(0, negative)): Spark's sequence defaults to step
    // −1 when stop < start, which would emit negative frame indices,
    // end-relative slices and corrupt partials (a truncated archive WAV
    // the tolerant decoder partial-decoded is exactly this shape)
    val idxs = when(nFrames > 0,
      sequence(lit(0), nFrames.cast("int") - 1)).otherwise(array())
    df.withColumn("frame_idx", explode(idxs))
      .withColumn("frame",
        slice(col(samplesCol), col("frame_idx") * hop + 1, lit(frameLen)))
      .drop(samplesCol)
  }

  /** One frame's Hann-windowed one-sided power spectrum (length
    * `frameLen/2 + 1`), real FFT via JTransforms. Power convention:
    * `|X_k|²`, with the two half-spectrum duplicates (all bins except DC
    * and Nyquist) folded in ×2 — Parseval then reads
    * `Σ_k P_k = N · Σ_i (w_i·x_i)²` (pinned in SpectralSpec). */
  private[graft] def framePower(frame: Array[Double], window: Array[Double])
      : Array[Double] = {
    val n = frame.length
    val buf = new Array[Double](n)
    var i = 0
    while (i < n) { buf(i) = frame(i) * window(i); i += 1 }
    new org.jtransforms.fft.DoubleFFT_1D(n.toLong).realForward(buf)
    // JTransforms realForward packing: buf(0)=Re(0), buf(1)=Re(n/2),
    // buf(2k)=Re(k), buf(2k+1)=Im(k) for 0<k<n/2
    val out = new Array[Double](n / 2 + 1)
    out(0) = buf(0) * buf(0)
    out(n / 2) = buf(1) * buf(1)
    var k = 1
    while (k < n / 2) {
      val re = buf(2 * k); val im = buf(2 * k + 1)
      out(k) = 2.0 * (re * re + im * im)
      k += 1
    }
    out
  }

  /** Per-frame power spectra for a framed Dataset — the imperative FFT
    * kernel per partition; everything stays partition-local. Input rows
    * `(id, frame_idx, frame)`; output `(id, frame_idx, bins)`. */
  def powerSpectra(framed: DataFrame, idCol: String, frameLen: Int): DataFrame = {
    val spark = framed.sparkSession
    import spark.implicits._
    val ds: Dataset[(Long, Int, Array[Double])] = framed
      .select(col(idCol).cast("long"), col("frame_idx").cast("int"), col("frame"))
      .as[(Long, Int, Array[Double])]
    ds.mapPartitions { it =>
      // window + FFT plan built once per partition, reused per frame
      val window = hannWindow(frameLen)
      it.map { case (id, fi, frame) => (id, fi, framePower(frame, window)) }
    }.toDF(idCol, "frame_idx", "bins")
  }

  /** ISO R10 nominal decidecade (1/3-octave) center for decidecade index
    * d = round(10·log10(f)): nominal = R10[d mod 10] · 10^(d div 10) —
    * the 63/80/100/125… labels the reference's PSD tables carry
    * (`docs/upstream-notes.md:153-158`). */
  private val R10 = Array(1.0, 1.25, 1.6, 2.0, 2.5, 3.15, 4.0, 5.0, 6.3, 8.0)
  def nominalCenter(decidecade: Int): Double = {
    require(decidecade >= 0, s"decidecade $decidecade")
    R10(decidecade % 10) * math.pow(10.0, decidecade / 10)
  }

  /** Fold per-frame FFT bins into per-frame DECIDECADE BAND partials with
    * integer-nano-unit exactness: each bin's power rounds to nano-units
    * (long) once, bins belonging to one band SUM as integers — the
    * cross-engine-deterministic seam discipline (every later mean is an
    * integer sum ÷ count). Bin k's frequency is k·sr/frameLen; DC and
    * bins below `fLo` are dropped (no decidecade), Nyquist kept. Band
    * labels are the ISO nominal centers. Output
    * `(id, frame_idx, band, p_nano)`. */
  def bandPartials(spectra: DataFrame, idCol: String, sampleRate: Int,
                   frameLen: Int, fLo: Double = 10.0): DataFrame = {
    val binHz = sampleRate.toDouble / frameLen
    // band lookup per bin index, computed ONCE on the driver (bin count
    // is frameLen/2+1) and applied as a literal map — no per-row log10
    val bandOfBin: Seq[(Int, Double)] = (0 to frameLen / 2).flatMap { k =>
      val f = k * binHz
      if (f < fLo) None
      else Some(k -> nominalCenter(math.round(10.0 * math.log10(f)).toInt))
    }
    val bandMap = map(bandOfBin.flatMap { case (k, b) =>
      Seq(lit(k), lit(b)) }: _*)
    spectra
      .select(col(idCol), col("frame_idx"),
        posexplode(col("bins")).as(Seq("bin", "p")))
      .withColumn("band", element_at(bandMap, col("bin")))
      .filter(col("band").isNotNull)
      .groupBy(col(idCol), col("frame_idx"), col("band"))
      .agg(sum(round(col("p") * lit(1e9), 0).cast("long")).as("p_nano"))
  }

  /** FUSED frame→FFT→band kernel: [[powerSpectra]] + [[bandPartials]] in
    * one `mapPartitions` pass, emitting `(id, frame_idx, band, p_nano)`
    * directly — the row stream narrows from bins (129/frame through a
    * posexplode + map lookup + first aggregate) to band partials
    * (~20/frame) before anything touches a shuffle. Bit-identical to the
    * unfused pair by construction: same per-bin nano rounding, same
    * integer band sums (SpectralSpec pins fused ≡ unfused row-for-row),
    * so the seam fixture and the DuckDB oracle are unchanged. This is
    * the production path; the unfused stages remain for spectrum-level
    * consumers. */
  def bandPartialsFused(framed: DataFrame, idCol: String, sampleRate: Int,
                        frameLen: Int, fLo: Double = 10.0): DataFrame = {
    val spark = framed.sparkSession
    import spark.implicits._
    val binHz = sampleRate.toDouble / frameLen
    // driver-computed bin→band routing, closed over by the kernel
    val bandLabels = (0 to frameLen / 2).flatMap { k =>
      val f = k * binHz
      if (f < fLo) None
      else Some(nominalCenter(math.round(10.0 * math.log10(f)).toInt))
    }.distinct.sorted.toArray
    val bandIdxOfBin: Array[Int] = (0 to frameLen / 2).map { k =>
      val f = k * binHz
      if (f < fLo) -1
      else bandLabels.indexOf(
        nominalCenter(math.round(10.0 * math.log10(f)).toInt))
    }.toArray
    framed
      .select(col(idCol).cast("long"), col("frame_idx").cast("int"), col("frame"))
      .as[(Long, Int, Array[Double])]
      .mapPartitions { it =>
        val window = hannWindow(frameLen)
        it.flatMap { case (id, fi, frame) =>
          val p = framePower(frame, window)
          val acc = new Array[Long](bandLabels.length)
          var k = 0
          while (k < p.length) {
            val b = bandIdxOfBin(k)
            if (b >= 0) acc(b) += math.round(p(k) * 1e9)
            k += 1
          }
          acc.indices.iterator.map(b => (id, fi, bandLabels(b), acc(b)))
        }
      }.toDF(idCol, "frame_idx", "band", "p_nano")
  }

  /** Welch band levels from band partials: mean band power over frames,
    * in dB — `10·log10(Σ p_nano / n_frames / 1e9)`. The sum is integer
    * (exact under any aggregation order); only the final log10 is
    * floating, the same cross-engine contract as q_db_energy_mean.
    * Bands with zero total power at nano resolution are below the
    * representable noise floor and are dropped — emitting −∞ dB rows
    * would put a non-finite through every downstream consumer (P4's
    * whole job is removing those). */
  def welchBandDb(partials: DataFrame, idCol: String): DataFrame =
    partials.groupBy(col(idCol), col("band"))
      .agg(sum(col("p_nano")).as("p_sum"), count(lit(1)).as("n_frames"))
      .filter(col("p_sum") > 0)
      .select(col(idCol), col("band"),
        round(lit(10.0) * log(10.0,
          col("p_sum").cast("double") / col("n_frames") / lit(1e9)), 6)
          .as("value_db"),
        col("n_frames"))

  /** Deterministic synthetic waveforms keyed by document id — two tones,
    * frequencies derived from the id (the stand-in for reading real
    * audio payloads; the spectral pipeline downstream is the real
    * thing). Generated by a per-partition kernel: the higher-order
    * `transform` lambda formulation ([[synthesizeWavesExpr]]) runs
    * INTERPRETED per element (PERF.md lesson 1) and alone cost more
    * than the whole FFT+band stage — the kernel is ~2× at sf0.1.
    * Bit-identical to the expression form (same `Math.sin`, same
    * operation order — SpectralSpec pins kernel ≡ expression), so the
    * fixture seam and every oracle are unchanged. */
  def synthesizeWaves(docs: DataFrame, idCol: String,
                      sampleRate: Int, nSamples: Int): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col(idCol).cast("long"))
      .as[Long]
      .mapPartitions { it =>
        it.map { id =>
          val f1 = (id % 13).toDouble * 7.5 + 20.0
          val f2 = (id % 5).toDouble * 30.0 + 80.0
          val out = new Array[Double](nSamples)
          var i = 0
          while (i < nSamples) {
            val t = i.toDouble / sampleRate
            out(i) = math.sin(t * f1 * (2.0 * math.Pi)) +
              0.5 * math.sin(t * f2 * (2.0 * math.Pi))
            i += 1
          }
          (id, out)
        }
      }.toDF(idCol, "samples")
  }

  /** Deterministic BURST waveforms for detection testing: a full-scale
    * tone confined to an id-derived sample span over a faint (-40 dB)
    * continuous background tone — so frame energy crosses a detection
    * threshold only inside the burst, at id-varied positions/widths.
    * Kernel-generated like [[synthesizeWaves]]. */
  def synthesizeBursts(docs: DataFrame, idCol: String,
                       sampleRate: Int, nSamples: Int): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col(idCol).cast("long"))
      .as[Long]
      .mapPartitions { it =>
        it.map { id =>
          val f1 = (id % 13).toDouble * 7.5 + 20.0
          val f2 = (id % 5).toDouble * 30.0 + 80.0
          val start = ((id * 37) % (nSamples / 2)).toInt
          val len = nSamples / 4 + ((id % 5) * (nSamples / 16)).toInt
          val out = new Array[Double](nSamples)
          var i = 0
          while (i < nSamples) {
            val t = i.toDouble / sampleRate
            val burst = if (i >= start && i < start + len)
              math.sin(t * f1 * (2.0 * math.Pi)) else 0.0
            out(i) = burst + 0.01 * math.sin(t * f2 * (2.0 * math.Pi))
            i += 1
          }
          (id, out)
        }
      }.toDF(idCol, "samples")
  }

  /** Threshold-crossing EVENT DETECTION over band partials — the
    * detection product of the reference's domain (loud-interval
    * extraction from hydrophone PSD). Frame-level total power is the
    * integer sum of that frame's band partials (exact, order-free);
    * consecutive hot frames merge into one event via gaps-and-islands
    * (`frame_idx − row_number` per recording). The only window is
    * PARTITIONED BY recording — bounded by one recording's frame count,
    * never global — and everything upstream of it is a partial
    * aggregate, so the plan scales as one shuffle on the recording key.
    * Output: `(id, start_frame, end_frame, n_frames, peak_p_nano)`
    * + start/end seconds derived from the hop. */
  def detectEvents(partials: DataFrame, idCol: String, thresholdNano: Long,
                   sampleRate: Int, hop: Int): DataFrame =
    detectEventsFromTotals(
      partials.groupBy(col(idCol), col("frame_idx"))
        .agg(sum(col("p_nano")).as("frame_p")),
      idCol, thresholdNano, sampleRate, hop)

  /** The islands stage of [[detectEvents]], over ALREADY-SUMMED frame
    * totals `(id, frame_idx, frame_p)` — the entry point the streaming
    * twin uses (its running aggregate IS the frame-total stage; integer
    * sums are batch-boundary-free, so the batch oracle applies). */
  def detectEventsFromTotals(totals: DataFrame, idCol: String,
      thresholdNano: Long, sampleRate: Int, hop: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val frameTotals = totals.filter(col("frame_p") > thresholdNano)
    val w = Window.partitionBy(col(idCol)).orderBy(col("frame_idx"))
    frameTotals
      .withColumn("island", col("frame_idx") - row_number().over(w))
      .groupBy(col(idCol), col("island"))
      .agg(min("frame_idx").as("start_frame"),
           max("frame_idx").as("end_frame"),
           count(lit(1)).as("n_frames"),
           max("frame_p").as("peak_p_nano"))
      .select(col(idCol), col("start_frame"), col("end_frame"),
        col("n_frames"), col("peak_p_nano"),
        round(col("start_frame") * hop.toDouble / sampleRate, 6).as("start_sec"),
        round((col("end_frame") * hop.toDouble + hop) / sampleRate, 6).as("end_sec"))
  }

  /** Full cross-correlation `corr(lag) = Σ_t a[t]·b[t+lag]` for
    * `lag ∈ [−maxLag, maxLag]`, via FFT (pad to the next power of two ≥
    * 2·n so circular wraparound cannot reach the window, multiply
    * conj(A)·B, inverse): O(n log n) against the naive O(n·maxLag) —
    * SpectralSpec pins FFT ≡ naive, the same discipline as the DFT pin.
    * Result index `i` holds lag `i − maxLag`. */
  private[graft] def crossCorrelation(a: Array[Double], b: Array[Double],
      maxLag: Int): Array[Double] = {
    val n = math.max(a.length, b.length)
    require(maxLag < n, s"maxLag=$maxLag n=$n")
    var m = 1
    while (m < 2 * n) m <<= 1
    val fa = new Array[Double](2 * m); val fb = new Array[Double](2 * m)
    var i = 0
    while (i < a.length) { fa(2 * i) = a(i); i += 1 }
    i = 0
    while (i < b.length) { fb(2 * i) = b(i); i += 1 }
    val fft = new org.jtransforms.fft.DoubleFFT_1D(m.toLong)
    fft.complexForward(fa); fft.complexForward(fb)
    // C = conj(A)·B, in place over fa
    i = 0
    while (i < m) {
      val ar = fa(2 * i); val ai = fa(2 * i + 1)
      val br = fb(2 * i); val bi = fb(2 * i + 1)
      fa(2 * i) = ar * br + ai * bi      // Re(conj(A)B)
      fa(2 * i + 1) = ar * bi - ai * br  // Im(conj(A)B)
      i += 1
    }
    fft.complexInverse(fa, true)
    // circular layout: lag τ≥0 at index τ, τ<0 at m+τ
    Array.tabulate(2 * maxLag + 1) { j =>
      val lag = j - maxLag
      fa(2 * (if (lag >= 0) lag else m + lag))
    }
  }

  /** Naive O(n·maxLag) cross-correlation — the independent formulation
    * the FFT kernel is pinned against. */
  private[graft] def crossCorrelationNaive(a: Array[Double], b: Array[Double],
      maxLag: Int): Array[Double] =
    Array.tabulate(2 * maxLag + 1) { j =>
      val lag = j - maxLag
      var s = 0.0
      var t = math.max(0, -lag)
      val tEnd = math.min(a.length, b.length - lag)
      while (t < tEnd) { s += a(t) * b(t + lag); t += 1 }
      s
    }

  /** Two-sensor recordings of one source: channel `a` is the burst
    * waveform, channel `b` the same signal delayed by an id-derived
    * sample count in [−24, 25] (zero-padded at the edges) — the
    * geometry stand-in for a hydrophone pair hearing one event at a
    * time-difference-of-arrival. Kernel-generated; the true delay is
    * recoverable as `(id % 50) − 24`, which SpectralSpec uses to pin
    * end-to-end lag recovery. */
  def synthesizeDelayedPairs(docs: DataFrame, idCol: String,
                             sampleRate: Int, nSamples: Int): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col(idCol).cast("long"))
      .as[Long]
      .mapPartitions { it =>
        it.map { id =>
          val f1 = (id % 13).toDouble * 7.5 + 20.0
          val start = ((id * 37) % (nSamples / 2)).toInt
          val len = nSamples / 4
          val a = new Array[Double](nSamples)
          var i = 0
          while (i < nSamples) {
            val t = i.toDouble / sampleRate
            if (i >= start && i < start + len)
              a(i) = math.sin(t * f1 * (2.0 * math.Pi))
            i += 1
          }
          val d = (id % 50).toInt - 24
          val b = new Array[Double](nSamples)
          i = math.max(0, d)
          while (i < nSamples && i - d < nSamples) {
            if (i - d >= 0) b(i) = a(i - d)
            i += 1
          }
          (id, a, b)
        }
      }.toDF(idCol, "chan_a", "chan_b")
  }

  /** Per-pair cross-correlation in integer nano-units — the oracle seam
    * for TDOA: one row per (pair, lag), `corr_nano = round(corr·1e9)`.
    * The FFT kernel runs per partition (pairs never leave their
    * partition; output is 2·maxLag+1 rows per pair, not samples). */
  def pairCorrelations(pairs: DataFrame, idCol: String,
                       maxLag: Int): DataFrame = {
    val spark = pairs.sparkSession
    import spark.implicits._
    pairs.select(col(idCol).cast("long"), col("chan_a"), col("chan_b"))
      .as[(Long, Array[Double], Array[Double])]
      .mapPartitions(_.flatMap { case (id, a, b) =>
        val c = crossCorrelation(a, b, maxLag)
        c.indices.iterator.map(j =>
          (id, j - maxLag, math.round(c(j) * 1e9)))
      })
      .toDF(idCol, "lag", "corr_nano")
  }

  /** TDOA estimate per pair: the lag maximizing correlation (ties break
    * to the smallest lag — deterministic, and what the DuckDB oracle
    * replays). The window is PARTITIONED BY pair and bounded by
    * 2·maxLag+1 rows, never global. */
  def tdoaPeaks(corr: DataFrame, idCol: String, sampleRate: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(idCol))
      .orderBy(col("corr_nano").desc, col("lag").asc)
    corr.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col(idCol), col("lag").as("lag_samples"),
        round(col("lag") / sampleRate.toDouble, 6).as("lag_sec"),
        col("corr_nano").as("peak_corr_nano"))
  }

  /** Windowed-sinc low-pass FIR: cutoff `fc` as a fraction of the
    * sample rate (0 < fc < 0.5), Hamming window, unit DC gain
    * (coefficients normalized to Σh = 1 so passband amplitude is
    * preserved). Designed once on the driver, closed over by kernels. */
  def designLowpass(numTaps: Int, fc: Double): Array[Double] = {
    require(numTaps % 2 == 1 && fc > 0 && fc < 0.5, s"taps=$numTaps fc=$fc")
    val c = numTaps / 2
    val h = Array.tabulate(numTaps) { k =>
      val x = k - c
      val sinc = if (x == 0) 2.0 * fc
        else math.sin(2.0 * math.Pi * fc * x) / (math.Pi * x)
      val w = 0.54 - 0.46 * math.cos(2.0 * math.Pi * k / (numTaps - 1))
      sinc * w
    }
    val s = h.sum
    h.map(_ / s)
  }

  /** Anti-aliased decimation by `factor`: FIR low-pass at 0.45 of the
    * output SAMPLE RATE (= 0.9 of the output Nyquist — the transition
    * band occupies the top 10%), then keep every `factor`-th filtered
    * sample —
    * the hydrophone-pipeline stage that turns a 48 kHz archive into
    * analysis-rate waveforms without aliasing ship noise into the
    * bands. Per-partition kernel (filter state never crosses rows, rows
    * never cross partitions); output sample n is
    * `Σ_k h[k]·x[n·factor + k]` (causal, length ⌊(N−taps)/factor⌋+1). */
  def decimateWaves(df: DataFrame, idCol: String, samplesCol: String,
      factor: Int, numTaps: Int = 63): DataFrame = {
    require(factor >= 2, s"factor=$factor")
    val spark = df.sparkSession
    import spark.implicits._
    val taps = designLowpass(numTaps, 0.45 / factor)
    df.select(col(idCol).cast("long"), col(samplesCol))
      .as[(Long, Array[Double])]
      .mapPartitions(_.map { case (id, x) =>
        // explicit shorter-than-filter branch: integer division truncates
        // TOWARD ZERO, so (len − taps)/factor + 1 evaluates to 1 (not ≤0)
        // for len just under taps and max(0, ·) alone would read past the
        // array — the same short-input shape frameWaveform guards
        val nOut =
          if (x.length < taps.length) 0
          else (x.length - taps.length) / factor + 1
        val out = new Array[Double](nOut)
        var n = 0
        while (n < nOut) {
          var acc = 0.0
          var k = 0
          val base = n * factor
          while (k < taps.length) { acc += taps(k) * x(base + k); k += 1 }
          out(n) = acc
          n += 1
        }
        (id, out)
      })
      .toDF(idCol, "samples")
  }

  /** The pure-column-expression formulation of [[synthesizeWaves]] —
    * kept as the independent formulation the kernel is pinned against
    * (the same contract FunctionsSpec uses for every native kernel). */
  def synthesizeWavesExpr(docs: DataFrame, idCol: String,
                          sampleRate: Int, nSamples: Int): DataFrame = {
    val id = col(idCol)
    val f1 = (id % 13).cast("double") * 7.5 + 20.0
    val f2 = (id % 5).cast("double") * 30.0 + 80.0
    docs.select(id.as(idCol))
      .withColumn("samples", transform(sequence(lit(0), lit(nSamples - 1)), i => {
        val t = i.cast("double") / sampleRate
        sin(t * f1 * (2.0 * math.Pi)) +
          lit(0.5) * sin(t * f2 * (2.0 * math.Pi))
      }))
  }
}
