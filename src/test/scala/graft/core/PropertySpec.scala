package graft.core

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** Property tests per SURVEY.md §5.2. */
object KernelProps extends Properties("kernel") {

  // strings over a char distribution that exercises every sanitizer branch
  private val nastyChar: Gen[Char] = Gen.frequency(
    (10, Gen.alphaNumChar),
    (3, Gen.oneOf(' ', '\t', '\n', '\r')),
    (1, Gen.oneOf('"', '\\', '\u0000', '\u0007', '\u009f')),
    (1, Gen.oneOf('\u200b', '\u200c', '\ufeff')),
    (1, Gen.oneOf('\u00e9', '\u4e2d', '\u0634', '\u0436')))
  private val nastyString: Gen[String] = Gen.listOf(nastyChar).map(_.mkString)

  property("fused clean == literal step-by-step reference port") =
    forAll(nastyString) { s =>
      TextClean.clean(s) == TextClean.cleanReference(s)
    }

  property("clean is idempotent") = forAll(nastyString) { s =>
    val once = TextClean.clean(s)
    TextClean.clean(once) == once
  }

  property("clean output is printable ASCII") = forAll(nastyString) { s =>
    TextClean.clean(s).forall(c => c >= 0x20 && c <= 0x7e)
  }

  property("clean output has no double spaces and is trimmed") = forAll(nastyString) { s =>
    val out = TextClean.clean(s)
    !out.contains("  ") && out == out.trim
  }

  private val asciiText: Gen[String] =
    Gen.listOf(Gen.frequency((8, Gen.alphaNumChar), (2, Gen.const(' ')))).map(_.mkString)

  property("consensus of identical passes is identity") =
    forAll(asciiText, Gen.choose(1, 4)) { (s, n) =>
      Consensus.merge(Seq.fill(n)(s)) == s
    }

  property("consensus equals head when all passes equal") = forAll(asciiText) { s =>
    Consensus.merge(Seq(s, s)) == s
  }

  property("confidence of identical passes is 100") =
    forAll(asciiText, Gen.choose(2, 4)) { (s, n) =>
      Confidence.pairwise(Seq.fill(n)(s)) == 100.0
    }

  property("ratio is in [0,1] and ratio(a,a) == 1") =
    forAll(asciiText, asciiText) { (a, b) =>
      val x = DiffLib.ratio(a, b)
      x >= 0.0 && x <= 1.0 && DiffLib.ratio(a, a) == 1.0
    }

  property("two-pass confidence is the single pair ratio × 100") =
    forAll(asciiText, asciiText) { (a, b) =>
      // NB: SequenceMatcher.ratio is NOT symmetric (verified against CPython:
      // ratio("Y  ", " \x00 Y") = 0.2857 but reversed = 0.5714; the NUL
      // in the second string is written as an escape (plain-ASCII file)) - the
      // pipeline always compares passes in pass order, which this pins.
      Confidence.pairwise(Seq(a, b)) == DiffLib.ratio(a, b) * 100.0
    }

  property("lang detect is total and returns a known language") =
    forAll(nastyString) { s =>
      LangDetect.langs.contains(LangDetect.detect(s))
    }

  // --- round-6 kernel fast paths: each must equal its reference form ---

  private val keywordish: Gen[String] = Gen.listOf(Gen.frequency(
    (6, Gen.alphaNumChar.map(_.toLower)),
    (2, Gen.const(' ')),
    (1, Gen.oneOf("contrato", "lease", "la", "de", "mietvertrag", "année",
      "mês", "el", "the", "und").flatMap(w => Gen.const(w))))).map(_.mkString(" "))

  property("single-scan lang detect == literal reference port") =
    forAll(Gen.oneOf(nastyString, keywordish)) { s =>
      LangDetect.detect(s) == LangDetect.detectReference(s)
    }

  property("two-pass consensus fast path == general vote loop") =
    forAll(asciiText, asciiText) { (a, b) =>
      Consensus.merge(Seq(a, b)) == Consensus.mergeVote(Seq(a, b))
    }

  property("equal-input ratio fast path == full matcher (exactly 1.0)") =
    forAll(nastyString) { a =>
      val slow = new DiffLib.SequenceMatcher(a, new String(a)).ratio()
      slow == 1.0 && DiffLib.ratio(a, new String(a)) == slow
    }

  property("incremental Hash64.pickFrom == pick on fixture-shaped keys") =
    forAll(Gen.alphaNumStr, Gen.choose(0, 100000), Gen.choose(1, 64)) { (p, i, n) =>
      Hash64.pickFrom(Hash64.prefixState(p + "#w"), i, n) ==
        Hash64.pick(p + "#w" + i, n)
    }
}
