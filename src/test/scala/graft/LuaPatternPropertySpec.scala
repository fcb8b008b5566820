package graft

import scala.util.Random

import org.scalatest.funsuite.AnyFunSuite

import graft.transform.LuaPattern

/** Differential test for the pattern engine on the subset where Lua
  * patterns and java.util.regex agree exactly: literal characters,
  * the %d/%a/%s classes (↦ regex \d [a-zA-Z] \s over an ASCII
  * alphabet), '.', sets of literals, and the greedy/optional
  * quantifiers * + ? on single items (Lua's greedy semantics match
  * regex's for these). Lazy '-' maps to regex *? . Random patterns ×
  * random subjects, comparing first-match bounds and gsub outputs.
  *
  * The Lua-only features (%b, %f, back-references, position captures)
  * have no regex twin and are covered by the fixed vectors in
  * LuaScriptSpec instead.
  */
class LuaPatternPropertySpec extends AnyFunSuite {

  private val Alphabet = "ab1 2xZ."

  /** One random item in both syntaxes (lua, regex). */
  private def genItem(rnd: Random): (String, String) =
    rnd.nextInt(6) match {
      case 0 => ("%d", "\\d")
      case 1 => ("%a", "[a-zA-Z]")
      case 2 => ("%s", "\\s")
      case 3 => (".", ".")
      case 4 =>
        val c = Alphabet.charAt(rnd.nextInt(Alphabet.length))
        if ("^$()%.[]*+-?".indexOf(c) >= 0)
          (s"%$c", java.util.regex.Pattern.quote(c.toString))
        else (c.toString, java.util.regex.Pattern.quote(c.toString))
      case _ =>
        val cs = Seq.fill(1 + rnd.nextInt(3))(
          "ab12xZ".charAt(rnd.nextInt(6))).distinct
        (s"[${cs.mkString}]", s"[${cs.mkString}]")
    }

  private def genPattern(rnd: Random): (String, String) = {
    val items = Seq.fill(1 + rnd.nextInt(4)) {
      val (l, r) = genItem(rnd)
      rnd.nextInt(5) match {
        case 0 => (l + "*", r + "*")
        case 1 => (l + "+", r + "+")
        case 2 => (l + "?", r + "?")
        case 3 => (l + "-", r + "*?")
        case _ => (l, r)
      }
    }
    (items.map(_._1).mkString, items.map(_._2).mkString)
  }

  private def genSubject(rnd: Random): String =
    Seq.fill(rnd.nextInt(12))(
      Alphabet.charAt(rnd.nextInt(Alphabet.length))).mkString

  test("random patterns: first-match bounds and gsub agree with " +
      "java.util.regex on the shared subset, 300 trials") {
    val seed = 0xBEEF
    val rnd = new Random(seed)
    for (trial <- 1 to 300) {
      val (luaPat, rePat) = genPattern(rnd)
      val s = genSubject(rnd)
      val re = java.util.regex.Pattern.compile(rePat)
      val m = re.matcher(s)
      val expected =
        if (m.find()) Some((m.start + 1, m.end)) else None
      val got = LuaPattern.find(s, luaPat).map(r => (r._1, r._2))
      assert(got == expected,
        s"trial $trial (seed=$seed): find mismatch for " +
          s"lua='$luaPat' regex='$rePat' subject='$s'")

      val (luaOut, _) = LuaPattern.gsub(s, luaPat, "#")
      val reOut = re.matcher(s).replaceAll(
        java.util.regex.Matcher.quoteReplacement("#"))
      // regex replaceAll and Lua gsub treat empty matches the same
      // way (advance one char, keep it) — outputs must be identical
      assert(luaOut == reOut,
        s"trial $trial (seed=$seed): gsub mismatch for " +
          s"lua='$luaPat' subject='$s': lua='$luaOut' re='$reOut'")
    }
  }

  test("fixed vectors from the Lua manual") {
    assert(LuaPattern.matchFirst("hello world", "%a+")
      .contains(Seq(Right("hello"))))
    assert(LuaPattern.find("hello world", "o wor")
      .map(r => (r._1, r._2)).contains((5, 9)))
    assert(LuaPattern.gsub("hello world", "o", "0") ==
      ("hell0 w0rld", 2L))
    assert(LuaPattern.gsub("hello world", "%w+", "<%0>") ==
      ("<hello> <world>", 2L))
    assert(LuaPattern.gsub("hello world from Lua", "(%w+)%s*(%w+)",
      "%2 %1") == ("world hello Lua from", 2L))
    // %b and frontier
    assert(LuaPattern.matchFirst("x = (a+(b*c))-d", "%b()")
      .contains(Seq(Right("(a+(b*c))"))))
    assert(LuaPattern.gsub("THE (quick) fox", "%f[%a]%u+%f[%A]",
      "X") == ("X (quick) fox", 1L))
    // empty-match gsub terminates and interleaves
    assert(LuaPattern.gsub("abc", "x*", "-") == ("-a-b-c-", 4L))
  }
}
