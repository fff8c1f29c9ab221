package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.audio.{SpectralOps, WavCodec}

/** Pins the REAL audio codec seam: RIFF/WAVE encode (pure Scala) →
  * decode through the JDK's `javax.sound.sampled` — an actual parser +
  * transcoder, not a stub — and the determinism contract that makes the
  * decoded path oracle-compatible: decode∘encode ≡ driver-side
  * quantization `round(x·32767)/32767`, exactly. */
class WavCodecSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import WavCodec._

  private def quantize(x: Double): Double =
    math.round(math.max(-1.0, math.min(1.0, x)) * 32767.0) / 32767.0

  test("PCM16 round-trip is exact quantization, clipping included") {
    val samples = Array.tabulate(512) { i =>
      math.sin(i * 0.1) * 1.4 - 0.2 // excursions beyond ±1 exercise clamping
    }
    val wav = encodePcm16(samples, 48000)
    assert(new String(wav.slice(0, 4), "US-ASCII") == "RIFF")
    assert(new String(wav.slice(8, 12), "US-ASCII") == "WAVE")
    val WavData(sr, decoded) = JavaSoundDecoder.decode(wav).get
    assert(sr == 48000)
    assert(decoded.length == samples.length)
    samples.indices.foreach { i =>
      assert(decoded(i) == quantize(samples(i)),
        s"sample $i: ${decoded(i)} != ${quantize(samples(i))}")
    }
  }

  test("undecodable payloads yield None / ok=false rows, never failures") {
    assert(JavaSoundDecoder.decode("not audio".getBytes).isEmpty)
    assert(JavaSoundDecoder.decode(Array.empty[Byte]).isEmpty)
    // a truncated header (RIFF magic but nothing else)
    assert(JavaSoundDecoder.decode("RIFFxxxxWAVE".getBytes).isEmpty)

    import spark.implicits._
    val df = Seq(
      (1L, encodePcm16(Array(0.0, 0.5, -0.5), 8000)),
      (2L, "garbage".getBytes)).toDF("id", "wav")
    val out = decodeWaves(df, "id", "wav").orderBy("id").collect()
    assert(out(0).getBoolean(3) && out(0).getInt(1) == 8000)
    assert(!out(1).getBoolean(3) && out(1).getInt(1) == -1)
  }

  test("stereo input averages to mono through the JDK transcoder") {
    // hand-build a 2-channel PCM16 WAV: L = 1000, R = 3000 per frame
    val n = 16
    val dataLen = n * 4
    val buf = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes).putInt(36 + dataLen).put("WAVE".getBytes)
      .put("fmt ".getBytes).putInt(16).putShort(1).putShort(2)
      .putInt(16000).putInt(16000 * 4).putShort(4).putShort(16)
      .put("data".getBytes).putInt(dataLen)
    (0 until n).foreach { _ => buf.putShort(1000).putShort(3000) }
    val WavData(sr, mono) = JavaSoundDecoder.decode(buf.array()).get
    assert(sr == 16000 && mono.length == n)
    mono.foreach(v => assert(v == 2000.0 / 32767.0))
  }

  test("fast PCM16 path ≡ JDK decoder, and falls back for other encodings") {
    // mono PCM16: both decoders, identical output
    val mono = encodePcm16(Array.tabulate(64)(i => math.sin(i * 0.3)), 22050)
    val f = FastWavDecoder.decode(mono).get
    val j = JavaSoundDecoder.decode(mono).get
    assert(f.sampleRate == j.sampleRate)
    assert(java.util.Arrays.equals(f.samples, j.samples))

    // stereo PCM16: the fast path averages like the JDK path
    val n = 8
    val buf = java.nio.ByteBuffer.allocate(44 + n * 4)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes).putInt(36 + n * 4).put("WAVE".getBytes)
      .put("fmt ".getBytes).putInt(16).putShort(1).putShort(2)
      .putInt(16000).putInt(16000 * 4).putShort(4).putShort(16)
      .put("data".getBytes).putInt(n * 4)
    (0 until n).foreach(_ => buf.putShort(-500).putShort(1500))
    val fs = FastWavDecoder.decodePcm16Direct(buf.array()).get
    val js = JavaSoundDecoder.decode(buf.array()).get
    assert(java.util.Arrays.equals(fs.samples, js.samples))

    // 8-bit unsigned PCM: fast path declines, FastWavDecoder still
    // decodes through the JDK transcoder
    val n8 = 16
    val b8 = java.nio.ByteBuffer.allocate(44 + n8)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b8.put("RIFF".getBytes).putInt(36 + n8).put("WAVE".getBytes)
      .put("fmt ".getBytes).putInt(16).putShort(1).putShort(1)
      .putInt(8000).putInt(8000).putShort(1).putShort(8)
      .put("data".getBytes).putInt(n8)
    (0 until n8).foreach(_ => b8.put(192.toByte)) // +0.5 full scale
    assert(FastWavDecoder.decodePcm16Direct(b8.array()).isEmpty)
    val d8 = FastWavDecoder.decode(b8.array()).get
    assert(d8.sampleRate == 8000 && d8.samples.length == n8)
    d8.samples.foreach(v => assert(math.abs(v - 0.5) < 0.01, v.toString))

    // hostile declared chunk size near Int.MaxValue: int arithmetic
    // would wrap the bounds check negative and read far past the buffer
    // — must be a clean decline on both paths, never a task failure
    val hostile = {
      val h = java.nio.ByteBuffer.allocate(60)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      h.put("RIFF".getBytes).putInt(52).put("WAVE".getBytes)
        .put("fmt ".getBytes).putInt(16).putShort(1).putShort(1)
        .putInt(8000).putInt(16000).putShort(2).putShort(16)
        .put("data".getBytes).putInt(2147483640)
      h.array()
    }
    // a zero declared sample rate: the STRICT fast path declines and
    // defers — and whatever the JDK then does (empirically it tolerates
    // sr=0 and decodes) the composite decoder must match it exactly, so
    // swapping the default decoder never changed observable behavior
    val srZero = {
      val z = java.nio.ByteBuffer.allocate(48)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      z.put("RIFF".getBytes).putInt(40).put("WAVE".getBytes)
        .put("fmt ".getBytes).putInt(16).putShort(1).putShort(1)
        .putInt(0).putInt(0).putShort(2).putShort(16)
        .put("data".getBytes).putInt(4).putShort(100).putShort(200)
      z.array()
    }
    assert(FastWavDecoder.decodePcm16Direct(srZero).isEmpty)
    assert(FastWavDecoder.decode(srZero).map(w => (w.sampleRate, w.samples.toSeq)) ==
      JavaSoundDecoder.decode(srZero).map(w => (w.sampleRate, w.samples.toSeq)))

    // the strict direct path declines; the composite decoder defers to
    // the JDK, which clamps the read to the available bytes — either
    // way a BOUNDED, non-throwing outcome
    assert(FastWavDecoder.decodePcm16Direct(hostile).isEmpty)
    assert(FastWavDecoder.decode(hostile).map(_.samples.toSeq) ==
      JavaSoundDecoder.decode(hostile).map(_.samples.toSeq))

    // truncated data chunk: the STRICT direct path declines (declared
    // size past the buffer), the composite decoder then matches the
    // JDK's tolerant partial decode — no throw either way
    val trunc = mono.slice(0, mono.length - 10)
    assert(FastWavDecoder.decodePcm16Direct(trunc).isEmpty)
    val ft = FastWavDecoder.decode(trunc); val jt = JavaSoundDecoder.decode(trunc)
    assert(ft.map(_.samples.toSeq) == jt.map(_.samples.toSeq))
  }

  test("decoded-WAV band partials ≡ quantized-sample band partials") {
    // The load-bearing pin for q_audio_wav_psd's oracle: running the
    // spectral pipeline on decode(encode(x)) must produce byte-identical
    // integer partials to running it on driver-quantized x.
    val (sr, ns, fl, hop) = (1024, 512, 256, 128)
    val ids = spark.range(0, 10).toDF("doc_id")
    val waves = SpectralOps.synthesizeWaves(ids, "doc_id", sr, ns)

    val quantized = waves.withColumn("samples",
      transform(col("samples"), x =>
        round(greatest(lit(-1.0), least(lit(1.0), x)) * 32767.0, 0) / 32767.0))
    val direct = SpectralOps.bandPartialsFused(
      SpectralOps.frameWaveform(quantized, "samples", fl, hop), "doc_id", sr, fl)

    val decoded = WavCodec.decodeWaves(
      WavCodec.encodeWaves(waves, "doc_id", "samples", sr), "doc_id", "wav")
    assert(decoded.filter(!col("ok")).count() == 0)
    val viaWav = SpectralOps.bandPartialsFused(
      SpectralOps.frameWaveform(decoded.drop("sample_rate", "ok"),
        "samples", fl, hop), "doc_id", sr, fl)

    assert(direct.exceptAll(viaWav).count() == 0)
    assert(viaWav.exceptAll(direct).count() == 0)
    assert(viaWav.count() > 0)
  }
}
