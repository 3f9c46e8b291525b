package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the vector / fingerprint hot paths.
  *
  * Why custom expressions (SURVEY.md §4 "custom work only in
  * north-star extensions"): the generated-term-sum cosine used by the
  * oracle queries is bit-exact but emits O(dim) expression nodes per
  * plan — fine for dim=64, hostile to plan size and compile time at
  * dim=1024+. This expression evaluates the same left-to-right IEEE
  * sequence (dot and both norms accumulated in index order) inside a
  * single codegen'd loop: same bits, O(1) plan nodes, any dimension.
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<float> arguments, got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "cosine_sim"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0; var nx = 0.0; var ny = 0.0
    var i = 0
    while (i < n) {
      val xi = x.getFloat(i).toDouble
      val yi = y.getFloat(i).toDouble
      dot += xi * yi; nx += xi * xi; ny += yi * yi
      i += 1
    }
    dot / (math.sqrt(nx) * math.sqrt(ny))
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny")
      val xi = ctx.freshName("xi")
      val yi = ctx.freshName("yi")
      s"""
         |int $n = java.lang.Math.min($x.numElements(), $y.numElements());
         |double $dot = 0.0; double $nx = 0.0; double $ny = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $xi = (double) $x.getFloat($i);
         |  double $yi = (double) $y.getFloat($i);
         |  $dot += $xi * $yi; $nx += $xi * $xi; $ny += $yi * $yi;
         |}
         |${ev.value} = $dot / (java.lang.Math.sqrt($nx) * java.lang.Math.sqrt($ny));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimilarity =
    copy(left = newLeft, right = newRight)
}

/** Dot product of two float vectors, accumulated left to right in one
  * codegen'd loop — EXACTLY the `dot` accumulator of
  * [[CosineSimilarity]] (same index order, same IEEE sequence), split
  * out so pair stages that carry pre-computed per-row norms evaluate
  * ONE loop per pair instead of cosine_sim's three (r13, guide step 4:
  * `dot_product(x, y) / (nx * ny)` is bit-identical to
  * `cosine_sim(x, y)` when nx/ny are the rows' own
  * `sqrt(dot_product(v, v))` — multiplication commutes in IEEE 754).
  * The generated-term-sum column form ([[graft.operators.VectorOps]])
  * emits O(dim) expression nodes, which at dim=64 already falls out of
  * whole-stage codegen inside join stages (measured: a 64-term
  * expression-tree dot in q291's pair stage ran ~30× slower than this
  * loop).
  *
  * LENGTH CONTRACT (r14, VERDICT r13 item 2): like [[CosineSimilarity]],
  * the loop runs over `min(|x|, |y|)` elements. The hoisted-norm
  * identity above therefore additionally assumes FIXED-LENGTH vectors:
  * for ragged pairs, `cosine_sim` truncates BOTH norm accumulations to
  * the shorter length, while a per-row `sqrt(dot_product(v, v))` norm
  * uses each row's full length — the two diverge the moment lengths
  * differ. Every corpus embedding is dim-64 by the generator contract
  * (and the oracle gate hashes would catch a violation), but any new
  * hoist site over potentially ragged vectors must either pad/slice to
  * a common length first or keep `cosine_sim`. */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<float> arguments, got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "dot_product"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0
    var i = 0
    while (i < n) {
      dot += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    dot
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      s"""
         |int $n = java.lang.Math.min($x.numElements(), $y.numElements());
         |double $dot = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $dot += ((double) $x.getFloat($i)) * ((double) $y.getFloat($i));
         |}
         |${ev.value} = $dot;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

/** Random-hyperplane LSH bucket id: bit p of the result is set iff the
  * signed projection of the vector onto plane p is >= 0. The plane
  * coefficients are data-independent ±1 signs derived from md5 parity
  * (see [[LshBucket.planeSign]]), so any engine — including the DuckDB
  * oracle's generated term-sum SQL — computes the identical bucket.
  *
  * Why native (same argument as [[CosineSimilarity]]): the generated
  * column form emits planes×dim expression nodes (4×64 ≈ 256 here;
  * dim=1024 would be ~4k — hostile to janino compile time and plan
  * size). This evaluates all planes in one codegen'd loop over a
  * precomputed sign matrix: same left-to-right IEEE accumulation per
  * plane, O(1) plan nodes, any dimension.
  */
case class LshBucket(child: Expression, planes: Int, dim: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (planes < 1 || planes > 30) TypeCheckResult.TypeCheckFailure(
      // plane p sets bit p of an Int bucket: p=31 is the sign bit and
      // p>=32 wraps `1 << p` silently onto low bits (bucket collisions
      // with no error) — reject outside [1, 30] at analysis time
      s"$prettyName: planes must be in [1, 30], got $planes")
    else if (dim < 1) TypeCheckResult.TypeCheckFailure(
      s"$prettyName: dim must be >= 1, got $dim")
    else child.dataType match {
      case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires an array<float> argument, got ${other.simpleString}")
    }
  override def dataType: DataType = IntegerType
  override def prettyName: String = "lsh_bucket"

  @transient private lazy val signs: Array[Double] =
    LshBucket.signMatrix(planes, dim)

  override def nullable: Boolean = true

  /** A vector shorter than `dim` has no defined projection onto the
    * planes — yield null (an explicit contract; silent truncation
    * would bucket it differently from the generated column, which
    * errors on the out-of-range element_at under ANSI mode, and from
    * the oracle SQL, whose out-of-range v[i] null-propagates). */
  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    if (v.numElements() < dim) return null
    var bucket = 0
    var p = 0
    while (p < planes) {
      val off = p * dim
      var dot = 0.0
      var i = 0
      while (i < dim) {
        dot += v.getFloat(i).toDouble * signs(off + i)
        i += 1
      }
      if (dot >= 0.0) bucket |= (1 << p)
      p += 1
    }
    bucket
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val s = ctx.addReferenceObj("lshSigns", signs, "double[]")
      val bucket = ctx.freshName("bucket")
      val p = ctx.freshName("p")
      val off = ctx.freshName("off")
      val dot = ctx.freshName("dot")
      val i = ctx.freshName("i")
      s"""
         |if ($v.numElements() < $dim) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $bucket = 0;
         |  for (int $p = 0; $p < $planes; $p++) {
         |    int $off = $p * $dim;
         |    double $dot = 0.0;
         |    for (int $i = 0; $i < $dim; $i++) {
         |      $dot += ((double) $v.getFloat($i)) * $s[$off + $i];
         |    }
         |    if ($dot >= 0.0) $bucket |= (1 << $p);
         |  }
         |  ${ev.value} = $bucket;
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): LshBucket =
    copy(child = newChild)
}

object LshBucket {

  /** ±1 pseudo-random hyperplane coefficient for LSH plane `p`,
    * dimension `i`: sign = parity of the ascii code of hex char 1 of
    * md5("p:i") — data-independent, identical in any engine. The single
    * source of truth; [[graft.operators.VectorOps]] generates the
    * oracle SQL from the same function. */
  def planeSign(p: Int, i: Int): Int = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$p:$i".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    if (hex.charAt(0).toInt % 2 == 1) 1 else -1
  }

  /** Flat planes×dim sign matrix, row-major by plane. */
  def signMatrix(planes: Int, dim: Int): Array[Double] =
    Array.tabulate(planes * dim)(k => planeSign(k / dim, k % dim).toDouble)

  /** Extract a literal int argument at SQL registration time. */
  def litInt(e: Expression, what: String): Int = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, IntegerType) => v
    case other => throw new IllegalArgumentException(
      s"lsh_bucket: $what must be an integer literal, got $other")
  }
}

/** Character n-grams in one pass over the string's UTF-8 bytes.
  *
  * Why native: `transform(sequence(1, len-n+1), i -> substr(text, i, n))`
  * re-scans the string on every call to find the char offset (UTF-8 is
  * variable-width), making the explosion O(len²) per document. This
  * walks the byte array once to index char starts, then slices — O(len)
  * total, and each gram shares the same semantics as `substr(i, n)`
  * (character-based, so multi-byte text agrees with the SQL oracle). */
case class CharNgrams(child: Expression, n: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case _: StringType if n >= 1 => TypeCheckResult.TypeCheckSuccess
      case _: StringType => TypeCheckResult.TypeCheckFailure(s"$prettyName requires n >= 1, got $n")
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a string argument, got ${other.simpleString}")
    }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "char_ngrams"

  override def nullSafeEval(input: Any): Any =
    CharNgrams.compute(input.asInstanceOf[UTF8String], n)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      // one static call — stays inside whole-stage codegen, no
      // per-element expression interpretation
      s"${ev.value} = graft.functions.CharNgrams.compute($c, $n);"
    })

  override protected def withNewChildInternal(newChild: Expression): CharNgrams =
    copy(child = newChild)
}

object CharNgrams {

  /** O(len): one byte walk to index char starts, then byte slices. */
  def compute(s: UTF8String, n: Int): org.apache.spark.sql.catalyst.util.GenericArrayData = {
    val bytes = s.getBytes
    // char-start offsets (numChars + 1 entries, last = total bytes)
    val starts = new Array[Int](s.numChars() + 1)
    var pos = 0
    var i = 0
    while (pos < bytes.length) {
      starts(i) = pos
      pos += UTF8String.numBytesForFirstByte(bytes(pos))
      i += 1
    }
    starts(i) = bytes.length
    val numChars = i
    val out = new Array[Any](math.max(0, numChars - n + 1))
    var g = 0
    while (g < out.length) {
      out(g) = UTF8String.fromBytes(
        java.util.Arrays.copyOfRange(bytes, starts(g), starts(g + n)))
      g += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
}

/** Polynomial rolling hash (Rabin–Karp) over a string's UTF-8 bytes:
  * h = (h * 31 + byte) mod 1e9+7, accumulated left to right in plain
  * long arithmetic (31 * (1e9+6) + 255 < 2^63 — no overflow). The
  * content-fingerprint primitive for shingling/winnowing at any scale,
  * evaluated in one codegen'd loop (no per-character expression nodes).
  */
case class RollingHash(child: Expression)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case _: StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a string argument, got ${other.simpleString}")
    }
  override def dataType: DataType = LongType
  override def prettyName: String = "rolling_hash"

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    var h = 0L
    var i = 0
    while (i < bytes.length) {
      h = (h * 31 + (bytes(i) & 0xff)) % 1000000007L
      i += 1
    }
    h
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val bytes = ctx.freshName("bytes")
      val h = ctx.freshName("h")
      val i = ctx.freshName("i")
      s"""
         |byte[] $bytes = $c.getBytes();
         |long $h = 0L;
         |for (int $i = 0; $i < $bytes.length; $i++) {
         |  $h = ($h * 31L + ($bytes[$i] & 0xff)) % 1000000007L;
         |}
         |${ev.value} = $h;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): RollingHash =
    copy(child = newChild)
}
