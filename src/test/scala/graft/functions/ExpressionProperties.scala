package graft.functions

import org.scalacheck.{Gen, Prop, Properties}
import org.apache.spark.unsafe.types.UTF8String

/** Property-based contracts for the native expressions' eval paths —
  * pure JVM calls against reference implementations, no SparkSession
  * (codegen/eval agreement is covered by FunctionsSpec's Spark-side
  * parity tests; these hammer the shared scalar logic with random
  * unicode and vectors). */
object ExpressionProperties extends Properties("expressions") {

  private val anyString: Gen[String] = Gen.oneOf(
    Gen.asciiPrintableStr,
    // includes a supplementary-plane char (surrogate pair in UTF-16) —
    // the case where byte/char/codepoint counting diverge
    Gen.listOf(Gen.oneOf("a", "Z", "ä", "ß", "你", "好", "🙂", " "))
      .map(_.mkString))

  property("char_ngrams emits numChars-n+1 grams, each of n chars, in order") =
    Prop.forAll(anyString, Gen.choose(1, 5)) { (s, n) =>
      val out = CharNgrams.compute(UTF8String.fromString(s), n)
      val chars = s.codePointCount(0, s.length)
      val grams = out.array.map(_.asInstanceOf[UTF8String].toString)
      grams.length == math.max(0, chars - n + 1) &&
        grams.forall(g => g.codePointCount(0, g.length) == n) &&
        // reassembly: consecutive grams overlap by n-1 chars
        grams.toSeq == (0 to chars - n).map { i =>
          val a = s.offsetByCodePoints(0, i)
          val b = s.offsetByCodePoints(0, i + n)
          s.substring(a, b)
        }
    }

  property("lsh_bucket is invariant to positive scaling of the vector") =
    Prop.forAll(Gen.long, Gen.choose(1, 16)) { (seed, planes) =>
      val rnd = new scala.util.Random(seed)
      val v = Array.fill(16)(rnd.nextFloat() * 2 - 1)
      def bucket(vec: Array[Float]): Int = {
        val signs = LshBucket.signMatrix(planes, 16)
        (0 until planes).map { p =>
          val dot = (0 until 16).map(i => vec(i).toDouble * signs(p * 16 + i)).sum
          if (dot >= 0) 1 << p else 0
        }.sum
      }
      // hyperplane LSH depends only on direction: scaling by a positive
      // constant must not change the bucket
      bucket(v) == bucket(v.map(_ * 7.5f))
    }

  property("planeSign is stable and ±1") =
    Prop.forAll(Gen.choose(0, 63), Gen.choose(0, 2047)) { (p, i) =>
      val s = LshBucket.planeSign(p, i)
      (s == 1 || s == -1) && s == LshBucket.planeSign(p, i)
    }
}
