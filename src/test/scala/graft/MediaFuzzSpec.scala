package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.functions.MediaImpl

/** Malformed-container fuzzing for the PNG/WAV byte kernels: ANY seeded
  * corruption of a valid payload (truncation, byte flips, 4-byte window
  * smashes that hit chunk lengths / IHDR dims, random garbage) must come
  * back as a well-formed ok=false row — never a throw, OOB read, runaway
  * allocation, or non-termination. Pins the r3-ADVICE guards (negative
  * chunk len, truncated IHDR) plus the Long-math bounds walk and the
  * decoded-size sanity cap against regression.
  *
  * Same fixed-seed Gen loop as PropertiesSpec (the scalatestplus bridge is
  * not in the offline cache).
  */
class MediaFuzzSpec extends SparkSpec {

  private def forAll[A](gen: Gen[A], n: Int = 300)(f: A => Unit): Unit = {
    var seed = Seed(4242L)
    var i = 0
    while (i < n) {
      gen.apply(Gen.Parameters.default, seed).foreach(f)
      seed = seed.next
      i += 1
    }
  }

  private val validPng = MediaImpl.pngEncode(16, 12, 7L)
  private val validWav = MediaImpl.wavEncode(8000, 2, 400, 11L)

  /** One seeded corruption of `base`. */
  private def corrupt(base: Array[Byte], rngSeed: Long): Array[Byte] = {
    val rng = new scala.util.Random(rngSeed)
    val out = base.clone()
    rng.nextInt(4) match {
      case 0 => // truncate anywhere (including inside the header/signature)
        out.take(rng.nextInt(out.length))
      case 1 => // flip 1-8 random bytes
        (0 until 1 + rng.nextInt(8)).foreach { _ =>
          out(rng.nextInt(out.length)) = rng.nextInt(256).toByte
        }
        out
      case 2 => // smash a random 4-byte window (chunk lens, IHDR dims, RIFF lens)
        val off = rng.nextInt(math.max(1, out.length - 4))
        (0 until 4).foreach(i => out(off + i) = rng.nextInt(256).toByte)
        out
      case 3 => // pure garbage of assorted sizes
        val g = new Array[Byte](rng.nextInt(200))
        rng.nextBytes(g)
        g
    }
  }

  private def assertWellFormedPng(bytes: Array[Byte]): Unit = {
    val row = MediaImpl.pngStats(bytes) // must not throw
    assert(row.numFields === 8)
    if (!row.getBoolean(0)) {
      assert(row.getInt(1) === 0 && row.getInt(2) === 0)
      assert(row.getBinary(7).length === 0)
    }
  }

  private def assertWellFormedWav(bytes: Array[Byte]): Unit = {
    val row = MediaImpl.wavStats(bytes) // must not throw
    assert(row.numFields === 5)
    if (!row.getBoolean(0)) {
      assert(row.getLong(1) === 0L && row.getLong(2) === 0L && row.getInt(3) === 0)
    }
  }

  test("valid payloads decode ok=true (fixture sanity)") {
    assert(MediaImpl.pngStats(validPng).getBoolean(0))
    assert(MediaImpl.wavStats(validWav).getBoolean(0))
  }

  test("fuzz: corrupted PNGs always yield a well-formed row, never a throw") {
    forAll(Gen.choose(0L, Long.MaxValue)) { s =>
      assertWellFormedPng(corrupt(validPng, s))
    }
    // directed cases the random walk can miss: maxed chunk len (Int-overflow
    // seam), huge IHDR dims (allocation bomb), truncated signature
    val maxLen = validPng.clone()
    maxLen(8) = 0x7f.toByte; maxLen(9) = 0xff.toByte
    maxLen(10) = 0xff.toByte; maxLen(11) = 0xff.toByte
    assertWellFormedPng(maxLen)
    val hugeDims = validPng.clone()
    (16 to 23).foreach(i => hugeDims(i) = 0x7f.toByte) // w = h = 0x7f7f7f7f
    assertWellFormedPng(hugeDims)
    assertWellFormedPng(validPng.take(7))
    assertWellFormedPng(Array.emptyByteArray)
    assertWellFormedPng(null)
  }

  test("fuzz: corrupted WAVs always yield a well-formed row, never a throw") {
    forAll(Gen.choose(0L, Long.MaxValue)) { s =>
      assertWellFormedWav(corrupt(validWav, s))
    }
    // directed: garbage fmt-chunk len near 2^31 (the Long-advance seam)
    val bigChunk = validWav.clone()
    bigChunk(16) = 0xf0.toByte; bigChunk(17) = 0xff.toByte
    bigChunk(18) = 0xff.toByte; bigChunk(19) = 0x7f.toByte
    assertWellFormedWav(bigChunk)
    assertWellFormedWav(validWav.take(43))
    assertWellFormedWav(Array.emptyByteArray)
    assertWellFormedWav(null)
  }
}
