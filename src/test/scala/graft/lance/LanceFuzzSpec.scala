package graft.lance

import org.scalatest.funsuite.AnyFunSuite
import org.apache.hadoop.conf.Configuration
import org.apache.spark.sql.types._

/** Adversarial robustness of the Lance parser: corrupt bytes must fail
  * CLOSED with an ordinary exception — never a runaway allocation (the
  * pbFields/readAt length validation), an infinite loop (readVarint
  * bounds), or silently-wrong rows. Deterministic seed so failures
  * reproduce.
  */
class LanceFuzzSpec extends AnyFunSuite {

  private def validBytes(): Array[Byte] = {
    val conf = new Configuration()
    val schema = StructType(Seq(
      StructField("k", IntegerType), StructField("s", StringType),
      StructField("v", ArrayType(FloatType, containsNull = false)),
      StructField("o", DoubleType)))
    val rows: Seq[Seq[Any]] = (0 until 19).map { k =>
      Seq(k, s"s-$k" * (k % 3 + 1),
        // NULL list rows (r13 some_nulls offsets branch) mixed with
        // valid ones, so truncations/corruptions hit that path too
        if (k % 6 == 2) null else (0 to k % 4).map(i => i / 3.0f),
        if (k % 5 == 0) null else k / 7.0)
    }
    val path = java.nio.file.Files.createTempDirectory("lancefuzz").resolve("v.lance")
    LanceWriter.write(path.toString, conf, schema, rows, pageRows = 7)
    java.nio.file.Files.readAllBytes(path)
  }

  /** Full parse + decode of every column from an in-memory buffer, with
    * the same bounds discipline the file-backed readAt applies.
    */
  private def parseAndDecode(bytes: Array[Byte]): Unit = {
    val readAt = (pos: Long, n: Int) => {
      if (pos < 0 || n < 0 || pos + n > bytes.length)
        throw new UnsupportedOperationException(
          s"range [$pos, ${pos + n}) outside ${bytes.length}B buffer")
      java.util.Arrays.copyOfRange(bytes, pos.toInt, pos.toInt + n)
    }
    val lf = LanceFormat.parse(bytes.length.toLong, readAt)
    lf.topLevel.foreach { c =>
      LanceFormat.decode(c, readAt,
        if (c.field.logicalType == "list") LanceFormat.decode(lf.childOf(c), readAt, Array.empty)
        else Array.empty)
    }
  }

  /** Exceptions are the fail-closed contract; anything else (an Error —
    * OOM from a runaway allocation, StackOverflow) fails the test. The
    * ctx string names the failing input in scalatest's stack trace.
    */
  private def mustFailClosed(bytes: Array[Byte], ctx: String): Unit =
    try parseAndDecode(bytes)
    catch {
      case _: Exception => ()
      case e: Throwable => fail(s"non-exception escaped for $ctx: $e")
    }

  test("random garbage never decodes, allocates wildly, or hangs") {
    val rnd = new scala.util.Random(0x1a5cef00d1L)
    (0 until 400).foreach { i =>
      val n = rnd.nextInt(300)
      val b = new Array[Byte](n)
      rnd.nextBytes(b)
      if (i % 2 == 0 && n >= 44) {
        // a plausible tail: valid magic + version so parsing goes deeper
        b(n - 4) = 'L'; b(n - 3) = 'A'; b(n - 2) = 'N'; b(n - 1) = 'C'
        b(n - 8) = 0; b(n - 7) = 0; b(n - 6) = 3; b(n - 5) = 0
      }
      mustFailClosed(b, s"garbage #$i")
    }
  }

  test("every truncation of a valid file fails closed") {
    val full = validBytes()
    // every length from 0 to full-1 in steps of 3 (plus the 40B footer
    // boundary region byte-by-byte)
    val cuts = (0 until full.length by 3) ++ (full.length - 45 until full.length)
    cuts.filter(c => c >= 0 && c < full.length).foreach { cut =>
      mustFailClosed(java.util.Arrays.copyOfRange(full, 0, cut), s"cut at $cut")
    }
  }

  test("single-byte corruptions fail closed or decode within bounds") {
    val full = validBytes()
    val rnd = new scala.util.Random(0xbadc0ffeeL)
    // the metadata tail (last 400B) byte-by-byte, plus 200 random data
    // positions — a flip may land in string content and legally decode;
    // the assertion is NO Error ever escapes (bounded allocations, no
    // hangs), which mustFailClosed enforces by construction
    val positions =
      (math.max(0, full.length - 400) until full.length) ++
        Seq.fill(200)(rnd.nextInt(full.length))
    positions.foreach { p =>
      val b = full.clone()
      b(p) = (b(p) ^ (1 << rnd.nextInt(8))).toByte
      mustFailClosed(b, s"flip at $p")
    }
  }

  test("a corrupt buffer size in an otherwise-valid file cannot over-allocate") {
    // file-backed path: the Hadoop readAt must reject out-of-file ranges
    val conf = new Configuration()
    val dir = java.nio.file.Files.createTempDirectory("lancefuzzf")
    val p = dir.resolve("t.lance")
    val full = validBytes()
    // corrupt the column-metadata start to point past EOF
    val bb = java.nio.ByteBuffer.wrap(full, full.length - 40, 8)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.putLong(full.length.toLong * 1000)
    java.nio.file.Files.write(p, full)
    val e = intercept[Exception] {
      LanceFormat.readMetadata(p.toString, conf)
    }
    assert(e.getMessage != null)
  }
}
