package graft.log

import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Paths}

/** Adversarial robustness of the log-block parser (the [[LanceFuzzSpec]]
  * discipline applied to S9): corrupt bytes must either recover (the
  * parser's own skip-to-next-magic semantics) or fail with an ordinary
  * exception — never a runaway interior-length allocation (readSized) or
  * a hang. Real reference log bytes seed the corpus where available so
  * flips land inside genuine envelopes; a synthetic corpus otherwise.
  */
class LogFuzzSpec extends AnyFunSuite {

  private val dir = Paths.get("/root/reference/crates/core/tests/data/log_files")

  private def seedBytes(): Array[Byte] = {
    if (Files.exists(dir)) {
      val found = Files.walk(dir).filter(p => p.getFileName.toString.contains(".log."))
        .findFirst()
      if (found.isPresent) return Files.readAllBytes(found.get())
    }
    // magic + plausible envelope + garbage interior
    val out = new java.io.ByteArrayOutputStream()
    out.write(LogFormat.Magic)
    val body = Array.tabulate[Byte](64)(i => (i * 31).toByte)
    val len = java.nio.ByteBuffer.allocate(8).putLong(body.length.toLong).array()
    out.write(len); out.write(body)
    out.toByteArray
  }

  /** Exceptions and empty/partial recovery are both valid outcomes; an
    * Error (OOM from an unbounded allocation, StackOverflow) fails.
    */
  private def mustBeBounded(bytes: Array[Byte], ctx: String): Unit =
    try { LogFileParser.parse(bytes, InstantRange.all); () }
    catch {
      case _: Exception => ()
      case e: Throwable => fail(s"non-exception escaped for $ctx: $e")
    }

  test("random garbage never over-allocates or hangs") {
    val rnd = new scala.util.Random(0x10f0f5eedL)
    (0 until 300).foreach { i =>
      val n = rnd.nextInt(400)
      val b = new Array[Byte](n)
      rnd.nextBytes(b)
      if (i % 2 == 0 && n >= 6) // half start with real magic so the walk engages
        System.arraycopy(LogFormat.Magic, 0, b, 0, 6)
      mustBeBounded(b, s"garbage #$i")
    }
  }

  test("single-byte corruptions of real log bytes stay bounded") {
    val full = seedBytes()
    val rnd = new scala.util.Random(0x5eedf115L)
    val positions = (0 until math.min(full.length, 300)) ++
      Seq.fill(200)(rnd.nextInt(full.length))
    positions.foreach { p =>
      val b = full.clone()
      b(p) = (b(p) ^ (1 << rnd.nextInt(8))).toByte
      mustBeBounded(b, s"flip at $p")
    }
  }

  test("every truncation of real log bytes stays bounded") {
    val full = seedBytes()
    (0 until full.length by math.max(1, full.length / 200)).foreach { cut =>
      mustBeBounded(java.util.Arrays.copyOfRange(full, 0, cut), s"cut at $cut")
    }
  }

  test("a corrupt interior length inside a valid envelope fails closed") {
    // valid magic + envelope length, interior declares a huge metadata
    // count/length — readSized must reject before allocating
    val out = new java.io.ByteArrayOutputStream()
    val body = new java.io.ByteArrayOutputStream()
    val d = new java.io.DataOutputStream(body)
    d.writeInt(1) // format version
    d.writeInt(LogFormat.AvroDataBlock)
    d.writeInt(1) // one metadata entry
    d.writeInt(0) // key
    d.writeInt(Int.MaxValue) // hostile length
    val bodyBytes = body.toByteArray
    out.write(LogFormat.Magic)
    out.write(java.nio.ByteBuffer.allocate(8).putLong(bodyBytes.length.toLong).array())
    out.write(bodyBytes)
    val e = intercept[Exception] {
      LogFileParser.parse(out.toByteArray, InstantRange.all)
    }
    // the rejection must come from the BOUNDED read (readSized's require
    // naming the hostile length), not from an EOF after a huge allocation
    assert(e.getMessage != null && e.getMessage.contains("exceeds remaining"),
      s"expected readSized rejection, got: $e")
  }
}
