package graft.functions

import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

/**
 * Property-style tests for the native text kernels against straightforward
 * JVM-reference implementations, over adversarial inputs: spaces (incl.
 * leading/trailing/double/empty), mixed case, digits, punctuation, and
 * multibyte unicode (exercises the regex fallback and byte-scan word
 * splitting). Deterministically seeded — 500 random texts per property.
 */
class TextKernelsPropSpec extends AnyFunSuite {

  private val pool = Vector("", " ", "  ", ".", "!?", "héllo", "wörld",
    "İstanbul", "漢字", "a1b2", "THE", "the", "of", "and", "to", "x-y_z",
    "42", "w1", "W1", "abc", "ABC", "aA9", "…", "a.b@c.d")

  private def texts(seed: Long, n: Int): Seq[String] = {
    val rnd = new scala.util.Random(seed)
    (0 until n).map { _ =>
      val k = rnd.nextInt(12)
      (0 until k).map(_ => pool(rnd.nextInt(pool.size))).mkString(" ")
    }
  }

  test("wordCount == split(' ', -1).length over 500 adversarial texts") {
    texts(42L, 500).foreach { s =>
      assert(TextKernels.wordCount(UTF8String.fromString(s)) ===
        s.split(" ", -1).length, s"text=[$s]")
    }
  }

  test("stopwordCount == count of words IN the stopword set") {
    val stop = Seq("the", "a", "of", "and", "to")
    val bytes = stop.map(_.getBytes("UTF-8")).toArray
    val hashes = bytes.map(b => org.apache.spark.sql.catalyst.expressions.XXH64
      .hashUnsafeBytes(b, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET,
        b.length, TextKernels.Seed))
    texts(43L, 500).foreach { s =>
      val expect = s.split(" ", -1).count(stop.contains)
      assert(TextKernels.stopwordCount(UTF8String.fromString(s), hashes, bytes)
        === expect, s"text=[$s]")
    }
  }

  test("regexTokenCount == Java regex token count over lowercased text") {
    val p = java.util.regex.Pattern.compile(TextKernels.TokenRegex)
    texts(44L, 500).foreach { s =>
      // reference path mirrors the Column form: lower via UTF8String
      val m = p.matcher(UTF8String.fromString(s).toLowerCase.toString)
      var expect = 0
      while (m.find()) expect += 1
      assert(TextKernels.regexTokenCount(UTF8String.fromString(s)) === expect,
        s"text=[$s]")
    }
  }

  test("normalizeSpaces == regexp_replace(trim(lower(text)), ' +', ' ')") {
    val extra = Seq("", " ", "   ", "  A  B  ", " İstanbul  MIX ", "a", "A  ",
      "漢字  ΣΙΓΜΑ  x")
    (texts(46L, 500) ++ extra).foreach { s =>
      // Spark's trim strips 0x20 only (Java String.trim strips <= 0x20) —
      // mirror the Column semantics exactly
      val expect = UTF8String.fromString(s).toLowerCase.toString
        .replaceAll("^ +", "").replaceAll(" +$", "").replaceAll(" +", " ")
      assert(TextKernels.normalizeSpaces(UTF8String.fromString(s)).toString
        === expect, s"text=[$s]")
    }
  }

  test("piiRedact kernel == sequential 3-pass replaceAll spec over 800 adversarial texts") {
    // PII-shaped fragments + traps: literal placeholders in the INPUT
    // (the count rule counts placeholders PRESENT, not inserted), pattern
    // prefixes/suffixes, overlapping shapes (an email whose local part is
    // a phone, an ip glued to a domain), and multibyte noise
    val piiPool = Vector("a@b.co", "x@y", "jan.de-vries+x@mail.example.org",
      "1.2.3.4", "999.999.999.999", "10.0.255.7", "1.2.3.4.5", "1.2.3.",
      "+31-20-555-0199", "06-1234-5678", "12-34", "12-34-56a@b.com",
      "+12-34-56-78-90", "<EMAIL>", "<IP>", "<PHONE>", "plain", "a.b@c.d",
      "@", "user@", ".com", "a@b.com1.2.3.4", "héllo", "漢字", "",
      "a@1.2.3.4.com", "12-34-56@x.com")
    val seps = Vector(" ", "", ",", " x ", "-", ".")
    val rnd = new scala.util.Random(47L)
    val cases = (0 until 800).map { _ =>
      val k = rnd.nextInt(8)
      (0 until k).map(_ => piiPool(rnd.nextInt(piiPool.size)))
        .mkString(seps(rnd.nextInt(seps.size)))
    }
    def cnt(s: String, tok: String): Long = {
      var n = 0L; var i = s.indexOf(tok)
      while (i >= 0) { n += 1; i = s.indexOf(tok, i + tok.length) }
      n
    }
    cases.foreach { s =>
      val ref = s.replaceAll(TextKernels.EmailRe, "<EMAIL>")
        .replaceAll(TextKernels.Ipv4Re, "<IP>")
        .replaceAll(TextKernels.PhoneRe, "<PHONE>")
      val row = TextKernels.piiRedact(UTF8String.fromString(s))
      assert(row.getUTF8String(0).toString === ref, s"text=[$s]")
      assert(row.getLong(1) === cnt(ref, "<EMAIL>"), s"n_emails text=[$s]")
      assert(row.getLong(2) === cnt(ref, "<IP>"), s"n_ips text=[$s]")
      assert(row.getLong(3) === cnt(ref, "<PHONE>"), s"n_phones text=[$s]")
    }
  }

  test("shingleHashes cardinality == distinct w-word windows") {
    val rnd = new scala.util.Random(45L)
    texts(45L, 500).foreach { s =>
      val w = 1 + rnd.nextInt(6)
      val words = s.split(" ", -1)
      val expect =
        if (words.length < w) 0
        else words.sliding(w).map(_.mkString(graft.llm.TextOps.ShingleSep)).toSet.size
      val got = TextKernels.shingleHashes(UTF8String.fromString(s), w).numElements()
      assert(got === expect, s"text=[$s] w=$w")
    }
  }
}
