package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.Zh

/** Property tests (SURVEY.md §5.3) over the scalar zh kernel — pure
  * JVM-side, no Spark session. scalacheck generators with a fixed seed
  * (deterministic, no scalatestplus bridge in the offline cache). */
class ZhPropertySpec extends AnyFunSuite {

  // mixed-script strings: CJK, Latin, digits, punctuation, empty
  private val hanChars = "北京市臺灣頭髮干乾燥发廣場语言"
  private val mixedString: Gen[String] = Gen.listOf(Gen.frequency(
    3 -> Gen.oneOf(hanChars.toSeq),
    5 -> Gen.alphaNumChar,
    1 -> Gen.oneOf(' ', ',', '。', '!'),
    1 -> Gen.oneOf('こ', 'ん', '한', 'Я'))).map(_.mkString)

  private val cases: Seq[String] =
    Gen.listOfN(500, mixedString)(Gen.Parameters.default, Seed(42L)).get

  test("hasHan agrees with the Java regex \\p{IsHan} on arbitrary strings") {
    cases.foreach { s =>
      assert(Zh.hasHan(s) == s.matches("(?s).*\\p{IsHan}.*"), s"input: $s")
    }
  }

  test("toSimplified is a projection: applying it twice changes nothing") {
    cases.foreach { s =>
      val once = Zh.toSimplified(s)
      assert(Zh.toSimplified(once) == once, s"input: $s")
    }
  }

  test("conversion preserves codepoint count (ICU Han transforms are 1:1)") {
    cases.foreach { s =>
      val t = Zh.toTraditional(s)
      assert(t.codePointCount(0, t.length) == s.codePointCount(0, s.length), s"input: $s")
    }
  }

  test("hasHan is invariant under Simplified↔Traditional conversion") {
    cases.foreach { s =>
      assert(Zh.hasHan(Zh.toSimplified(s)) == Zh.hasHan(s) &&
        Zh.hasHan(Zh.toTraditional(s)) == Zh.hasHan(s), s"input: $s")
    }
  }
}
