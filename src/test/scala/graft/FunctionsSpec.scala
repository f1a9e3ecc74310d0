package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.GraftFunctions

/** Property-style tests (seeded random corpus) for the S8/S9 scalar ops
  * (SURVEY.md §7.4: decode parity with Python codecs.decode + strict
  * UTF-8 truth table). */
class FunctionsSpec extends AnyFunSuite {
  import GraftFunctions.hexDecodeUtf8Strict

  private def toHex(b: Array[Byte]): String = b.map("%02x".format(_)).mkString
  private val rnd = new scala.util.Random(42)

  test("decode(hex(s)) round-trips strings") {
    for (_ <- 1 to 200) {
      val s = rnd.alphanumeric.take(rnd.nextInt(40)).mkString
      assert(hexDecodeUtf8Strict(toHex(s.getBytes("UTF-8"))) == s)
    }
    assert(hexDecodeUtf8Strict(toHex("héllo wörld ✓".getBytes("UTF-8"))) == "héllo wörld ✓")
  }

  test("odd-length hex -> null") {
    assert(hexDecodeUtf8Strict("abc") == null)
    assert(hexDecodeUtf8Strict("f") == null)
  }

  test("non-hex characters -> null") {
    assert(hexDecodeUtf8Strict("zz") == null)
    assert(hexDecodeUtf8Strict("68g9") == null)
  }

  test("invalid UTF-8 byte sequences -> null (not U+FFFD)") {
    assert(hexDecodeUtf8Strict("ff") == null)   // never valid in UTF-8
    assert(hexDecodeUtf8Strict("80") == null)   // lone continuation byte
    assert(hexDecodeUtf8Strict("c328") == null) // truncated 2-byte seq
  }

  test("null/empty input") {
    assert(hexDecodeUtf8Strict(null) == null)
    assert(hexDecodeUtf8Strict("") == "")
  }

  test("random bytes: decode matches strict JVM charset semantics") {
    for (_ <- 1 to 500) {
      val arr = Array.fill(rnd.nextInt(24))(rnd.nextInt(256).toByte)
      val got = hexDecodeUtf8Strict(toHex(arr))
      val strict =
        try {
          val d = java.nio.charset.StandardCharsets.UTF_8.newDecoder()
            .onMalformedInput(java.nio.charset.CodingErrorAction.REPORT)
            .onUnmappableCharacter(java.nio.charset.CodingErrorAction.REPORT)
          d.decode(java.nio.ByteBuffer.wrap(arr)).toString
        } catch { case _: Exception => null }
      assert(got == strict, s"hex=${toHex(arr)}")
    }
  }

  test("uppercase hex accepted") {
    assert(hexDecodeUtf8Strict("48454C4C4F") == "HELLO")
  }

  private def acMatch(patterns: Seq[String], text: String): Seq[Int] = {
    val a = new graft.functions.AhoAutomaton(patterns)
    val arr = a.matched(org.apache.spark.unsafe.types.UTF8String.fromString(text))
    (0 until arr.numElements()).map(arr.getInt)
  }

  test("aho-corasick: classic overlapping-suffix worked example") {
    // the textbook he/she/his/hers automaton: "ushers" must fire
    // she (via goto), he and hers (via the fail/emit chains), not his
    assert(acMatch(Seq("he", "she", "his", "hers"), "ushers") == Seq(0, 1, 3))
    assert(acMatch(Seq("he", "she", "his", "hers"), "uhis") == Seq(2))
    assert(acMatch(Seq("he", "she", "his", "hers"), "xyz").isEmpty)
  }

  test("aho-corasick: distinct ascending ids, repeats counted once") {
    assert(acMatch(Seq("ab", "b", "abc"), "zababcab") == Seq(0, 1, 2))
  }

  test("aho-corasick: case-insensitive on both sides") {
    assert(acMatch(Seq("Scan", "JOIN"), "full SCAN then join") == Seq(0, 1))
  }

  test("aho-corasick: matches equal brute-force contains on random text") {
    val pats = Seq("aa", "ab", "ba", "aab", "bba", "abab", "b")
    for (_ <- 1 to 300) {
      val s = Array.fill(rnd.nextInt(30))(if (rnd.nextBoolean()) 'a' else 'b').mkString
      val want = pats.zipWithIndex.filter { case (p, _) => s.contains(p) }.map(_._2)
      assert(acMatch(pats, s) == want, s"text=$s")
    }
  }

  test("aho-corasick: empty or blank pattern list rejected") {
    intercept[IllegalArgumentException](new graft.functions.AhoAutomaton(Nil))
    intercept[IllegalArgumentException](new graft.functions.AhoAutomaton(Seq("ok", "")))
  }

  test("winnow kernel: nibble-assembled 60-bit hash equals the hex-parse reference") {
    import graft.functions.WinnowFingerprintsHelper
    import org.apache.spark.unsafe.types.UTF8String
    val rnd = new scala.util.Random(7)
    for (_ <- 1 to 200) {
      val words = Seq.fill(4)(Array.fill(1 + rnd.nextInt(6))(
        ('a' + rnd.nextInt(26)).toChar).mkString)
      val gram = words.mkString(" ")
      // k = token count and w = 1 → the single gram IS the fingerprint
      val row = WinnowFingerprintsHelper.eval(UTF8String.fromString(gram), 4, 1)
      assert(row.getLong(0) == 1L)
      assert(row.getArray(1).toLongArray().toSeq ==
        Seq(WinnowFingerprintsHelper.hash60Reference(gram)), gram)
    }
  }
}
