package graft

import java.io.IOException

import graft.operators.{Audio, Multimodal, Wav}

/** WAV codec correctness: a golden-blob byte-for-byte encode check
  * (hand-computed RIFF layout), decode round trips, parser validation and
  * unknown-chunk tolerance, and the planted-sample contract the DuckDB
  * oracles rely on.
  */
class WavSpec extends SparkSpecBase {

  private val golden = Wav.Audio(8000,
    Array[Short](0, 1, -1, 32767, -32768))

  test("encode produces the hand-computed golden RIFF bytes") {
    // RIFF | size 46 | WAVE | fmt _ | 16 | PCM | mono | 8000 | 16000 |
    // align 2 | 16 bit | data | 10 | samples LE
    val want =
      "52494646" + "2e000000" + "57415645" +
        "666d7420" + "10000000" + "0100" + "0100" + "401f0000" +
        "803e0000" + "0200" + "1000" +
        "64617461" + "0a000000" +
        "0000" + "0100" + "ffff" + "ff7f" + "0080"
    val got = Wav.encode(golden).map("%02x".format(_)).mkString
    assert(got === want)
  }

  test("decode round-trips encode over seeded random clips") {
    val rng = new scala.util.Random(97)
    for (_ <- 1 to 50) {
      val n = rng.nextInt(200)
      val a = Wav.Audio(4000 + rng.nextInt(44100),
        Array.fill(n)(rng.nextInt(65536).toShort))
      assert(Wav.decode(Wav.encode(a)) === a)
    }
  }

  test("decoder skips unknown chunks (including odd-size word alignment)") {
    val base = Wav.encode(golden)
    // splice a LIST chunk of ODD body size 5 (+1 alignment pad) between
    // the fmt and data chunks (fmt ends at byte 36)
    val extra = "LIST".getBytes("US-ASCII") ++
      Array[Byte](5, 0, 0, 0) ++ Array[Byte](1, 2, 3, 4, 5, 0)
    val spliced = base.slice(0, 36) ++ extra ++ base.slice(36, base.length)
    // RIFF outer size field is not re-derived by the parser; chunk walk is
    assert(Wav.decode(spliced) === golden)
  }

  test("decoder rejects malformed streams loudly") {
    val ok = Wav.encode(golden)
    def corrupt(f: Array[Byte] => Array[Byte]): Unit =
      intercept[IOException] { Wav.decode(f(ok.clone())) }
    corrupt { b => b(0) = 'X'.toByte; b } // bad RIFF magic
    corrupt { b => b(10) = 'X'.toByte; b } // bad WAVE magic
    corrupt { b => b(20) = 3; b } // non-PCM format code
    corrupt { b => b(22) = 2; b } // stereo
    corrupt { b => b(34) = 8; b } // 8-bit samples
    corrupt(b => b.slice(0, b.length - 3)) // truncated data chunk
    corrupt(b => b.slice(0, 12)) // no chunks at all
    // hostile declared chunk size near Int.MaxValue: must be the clean
    // overrun IOException, not an Int-overflow slip-through (OOM/ SIOOBE)
    corrupt { b =>
      b(40) = 0xf4.toByte; b(41) = 0xff.toByte
      b(42) = 0xff.toByte; b(43) = 0x7f.toByte; b
    }
    // data before fmt: swap the chunks
    val noFmt = ok.slice(0, 12) ++ ok.slice(36, ok.length)
    intercept[IOException] { Wav.decode(noFmt) }
    // zero / negative sample rate in fmt (bytes 24-27 little-endian)
    corrupt { b => b(24) = 0; b(25) = 0; b(26) = 0; b(27) = 0; b }
    corrupt { b => b(24) = 0; b(25) = 0; b(26) = 0; b(27) = 0x80.toByte; b }
  }

  test("synthWavBlob decodes back to the planted closed-form samples") {
    // a non-dup doc: every sample is the h60 closed form
    val a7 = Wav.decode(Audio.synthWavBlob(7L))
    assert(a7.sampleRate === Audio.SampleRate)
    val seed7 = Audio.wavSeed(7L)
    assert(seed7 === 7L)
    assert(a7.samples.length === Audio.nSamplesOf(seed7))
    a7.samples.zipWithIndex.foreach { case (v, i) =>
      assert(v.toInt === Audio.sampleOf(seed7, i), s"sample $i")
    }
    // a dup doc pair, cross parity: same group seed, sample 0 perturbed to
    // opposite extremes, identical everywhere else
    val g = Multimodal.DupGroups
    val idA = 0L * 4; val idB = (0L + g) * 4 // group 0, parities 0 and 1
    assert(Audio.wavSeed(idA) === Audio.wavSeed(idB))
    val (da, db) = (Wav.decode(Audio.synthWavBlob(idA)),
      Wav.decode(Audio.synthWavBlob(idB)))
    assert(da.samples(0) === 32767.toShort)
    assert(db.samples(0) === (-32768).toShort)
    assert(da.samples.drop(1).toSeq === db.samples.drop(1).toSeq)
  }

  test("mm_audio_dedup finds the planted groups at the expected share counts") {
    val rows = SparkEntry.queries("mm_audio_dedup")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    Graft.releaseCaches(spark)
    assert(rows.nonEmpty, "planted dup groups must surface")
    // every reported pair is a true dup-group pair (both ids % 4 == 0 with
    // the same group key) and the share count is EBands or EBands-1
    rows.foreach { case (a, b, n) =>
      assert(a % 4 == 0 && b % 4 == 0, s"pair ($a,$b) not planted")
      assert((a / 4) % Multimodal.DupGroups == (b / 4) % Multimodal.DupGroups,
        s"pair ($a,$b) crosses groups")
      val sameParity = (a / 4) % 2 == (b / 4) % 2
      assert(n == (if (sameParity) Audio.EBands.toLong else Audio.EBands - 1L),
        s"pair ($a,$b) shares $n bands")
    }
    // and both parities of group pairing actually occur (non-vacuous)
    assert(rows.exists(_._3 == Audio.EBands.toLong))
    assert(rows.exists(_._3 == Audio.EBands - 1L))
  }
}
