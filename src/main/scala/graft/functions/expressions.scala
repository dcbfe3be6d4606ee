package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the engine's numeric hot paths.
  *
  * The higher-order-function formulations (zip_with + aggregate) are
  * semantically identical but allocate an intermediate array per call and
  * evaluate a lambda per element; these expressions compile to tight
  * primitive loops inside whole-stage codegen — the difference is ~5-10×
  * on the brute-force kNN and sketching paths. Same preference order the
  * engine documents: builtin > custom codegen Expression > UDF.
  */

/** Sequential dot product of two array<double> columns (bit-identical to a
  * left-to-right summation in any other engine). Mismatched lengths use
  * the common prefix; null *elements* are treated as 0.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] =
    Seq(ArrayType(DoubleType), ArrayType(DoubleType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      if (!x.isNullAt(i) && !y.isNullAt(i)) s += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i) && !$b.isNullAt($i)) {
         |    $s += $a.getDouble($i) * $b.getDouble($i);
         |  }
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Index of the nearest centroid — squared-Euclidean argmin of an
  * array<double> vector over a centroid TABLE (array<array<double>>),
  * ties to the lowest cell id. The scale formulation of
  * `IvfIndex.assignCell`: the per-cell literal expression tree generates
  * O(nCells·dim) source and falls off the JIT/whole-stage-codegen cliff
  * past a few hundred cells (observed: codegen disabled at 126 cells ×
  * 64 dims), while this single expression loops over the same table
  * inside one tight method at any nCells.
  *
  * Arithmetic is REPLICATED from the literal form so assignments are
  * bit-identical and plan-shape changes can never move a vector across
  * cells: d(c) = (Σv² - 2.0·Σv·c) + Σc², each Σ a left-to-right pass,
  * null elements skipped exactly as [[DotProduct]] skips them.
  */
case class CellArgmin(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] =
    Seq(ArrayType(DoubleType), ArrayType(ArrayType(DoubleType)))
  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_cell_argmin"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val v = a.asInstanceOf[ArrayData]
    val table = b.asInstanceOf[ArrayData]
    val nv = v.numElements()
    var vv = 0.0
    var i = 0
    while (i < nv) { if (!v.isNullAt(i)) vv += v.getDouble(i) * v.getDouble(i); i += 1 }
    var best = 0
    var bestD = Double.MaxValue
    var c = 0
    val m = table.numElements()
    while (c < m) {
      if (!table.isNullAt(c)) {
        val ctr = table.getArray(c)
        val n = math.min(nv, ctr.numElements())
        var vc = 0.0
        var cc = 0.0
        var k = 0
        while (k < n) {
          if (!v.isNullAt(k) && !ctr.isNullAt(k)) vc += v.getDouble(k) * ctr.getDouble(k)
          k += 1
        }
        k = 0
        val nc = ctr.numElements()
        while (k < nc) {
          if (!ctr.isNullAt(k)) cc += ctr.getDouble(k) * ctr.getDouble(k)
          k += 1
        }
        val d = (vv - 2.0 * vc) + cc
        if (d < bestD) { bestD = d; best = c }
      }
      c += 1
    }
    best
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val nv = ctx.freshName("nv")
      val vv = ctx.freshName("vv")
      val best = ctx.freshName("best")
      val bestD = ctx.freshName("bestD")
      val m = ctx.freshName("m")
      val c = ctx.freshName("c")
      val ctr = ctx.freshName("ctr")
      val n = ctx.freshName("n")
      val nc = ctx.freshName("nc")
      val vc = ctx.freshName("vc")
      val cc = ctx.freshName("cc")
      val d = ctx.freshName("d")
      val i = ctx.freshName("i")
      val k = ctx.freshName("k")
      s"""
         |int $nv = $a.numElements();
         |double $vv = 0.0;
         |for (int $i = 0; $i < $nv; $i++) {
         |  if (!$a.isNullAt($i)) { $vv += $a.getDouble($i) * $a.getDouble($i); }
         |}
         |int $best = 0;
         |double $bestD = Double.MAX_VALUE;
         |int $m = $b.numElements();
         |for (int $c = 0; $c < $m; $c++) {
         |  if (!$b.isNullAt($c)) {
         |    org.apache.spark.sql.catalyst.util.ArrayData $ctr = $b.getArray($c);
         |    int $n = java.lang.Math.min($nv, $ctr.numElements());
         |    double $vc = 0.0;
         |    double $cc = 0.0;
         |    for (int $k = 0; $k < $n; $k++) {
         |      if (!$a.isNullAt($k) && !$ctr.isNullAt($k)) {
         |        $vc += $a.getDouble($k) * $ctr.getDouble($k);
         |      }
         |    }
         |    int $nc = $ctr.numElements();
         |    for (int $k = 0; $k < $nc; $k++) {
         |      if (!$ctr.isNullAt($k)) { $cc += $ctr.getDouble($k) * $ctr.getDouble($k); }
         |    }
         |    double $d = ($vv - 2.0 * $vc) + $cc;
         |    if ($d < $bestD) { $bestD = $d; $best = $c; }
         |  }
         |}
         |${ev.value} = $best;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** The `nProbe` nearest cell ids (ascending distance, ties → lower cell
  * id) — the multi-cell companion of [[CellArgmin]] for the IVF probe
  * path, replacing the literal per-cell struct array + array_sort
  * formulation that hits the same generated-code cliff. Ordering
  * replicates array_sort over struct(distance, cell): ascending by
  * distance, then by cell id; distances use CellArgmin's exact
  * arithmetic, so probeCells(…)(0) ≡ assignCell(…) bit-for-bit. nProbe
  * is a plan-time constant (like [[BpeTokens]]' merge table).
  */
case class CellTopCells(left: Expression, right: Expression, nProbe: Int)
    extends BinaryExpression with ExpectsInputTypes {

  require(nProbe > 0, s"nProbe must be positive, got $nProbe")

  override def inputTypes: Seq[DataType] =
    Seq(ArrayType(DoubleType), ArrayType(ArrayType(DoubleType)))
  override def dataType: DataType = ArrayType(IntegerType)
  override def prettyName: String = "graft_cell_topk"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val v = a.asInstanceOf[ArrayData]
    val table = b.asInstanceOf[ArrayData]
    val nv = v.numElements()
    var vv = 0.0
    var i = 0
    while (i < nv) { if (!v.isNullAt(i)) vv += v.getDouble(i) * v.getDouble(i); i += 1 }
    val m = table.numElements()
    val keep = math.min(nProbe, m)
    val heapD = new Array[Double](keep)
    val heapC = new Array[Int](keep)
    var size = 0
    var c = 0
    while (c < m) {
      if (!table.isNullAt(c)) {
        val ctr = table.getArray(c)
        val n = math.min(nv, ctr.numElements())
        var vc = 0.0
        var cc = 0.0
        var k = 0
        while (k < n) {
          if (!v.isNullAt(k) && !ctr.isNullAt(k)) vc += v.getDouble(k) * ctr.getDouble(k)
          k += 1
        }
        k = 0
        val nc = ctr.numElements()
        while (k < nc) {
          if (!ctr.isNullAt(k)) cc += ctr.getDouble(k) * ctr.getDouble(k)
          k += 1
        }
        val d = (vv - 2.0 * vc) + cc
        // insertion into the sorted keep-list ((d, cell) ascending);
        // cells arrive in id order, so equal distances naturally keep
        // the lower id first — the array_sort struct ordering.
        if (size < keep || d < heapD(size - 1)) {
          var pos = if (size < keep) size else keep - 1
          while (pos > 0 && heapD(pos - 1) > d) {
            heapD(pos) = heapD(pos - 1); heapC(pos) = heapC(pos - 1); pos -= 1
          }
          heapD(pos) = d; heapC(pos) = c
          if (size < keep) size += 1
        }
      }
      c += 1
    }
    new GenericArrayData(heapC.take(size).map(Int.box))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val nv = ctx.freshName("nv")
      val vv = ctx.freshName("vv")
      val m = ctx.freshName("m")
      val keep = ctx.freshName("keep")
      val heapD = ctx.freshName("heapD")
      val heapC = ctx.freshName("heapC")
      val size = ctx.freshName("size")
      val c = ctx.freshName("c")
      val ctr = ctx.freshName("ctr")
      val n = ctx.freshName("n")
      val nc = ctx.freshName("nc")
      val vc = ctx.freshName("vc")
      val cc = ctx.freshName("cc")
      val d = ctx.freshName("d")
      val i = ctx.freshName("i")
      val k = ctx.freshName("k")
      val pos = ctx.freshName("pos")
      val out = ctx.freshName("out")
      s"""
         |int $nv = $a.numElements();
         |double $vv = 0.0;
         |for (int $i = 0; $i < $nv; $i++) {
         |  if (!$a.isNullAt($i)) { $vv += $a.getDouble($i) * $a.getDouble($i); }
         |}
         |int $m = $b.numElements();
         |int $keep = java.lang.Math.min($nProbe, $m);
         |double[] $heapD = new double[$keep];
         |int[] $heapC = new int[$keep];
         |int $size = 0;
         |for (int $c = 0; $c < $m; $c++) {
         |  if (!$b.isNullAt($c)) {
         |    org.apache.spark.sql.catalyst.util.ArrayData $ctr = $b.getArray($c);
         |    int $n = java.lang.Math.min($nv, $ctr.numElements());
         |    double $vc = 0.0;
         |    double $cc = 0.0;
         |    for (int $k = 0; $k < $n; $k++) {
         |      if (!$a.isNullAt($k) && !$ctr.isNullAt($k)) {
         |        $vc += $a.getDouble($k) * $ctr.getDouble($k);
         |      }
         |    }
         |    int $nc = $ctr.numElements();
         |    for (int $k = 0; $k < $nc; $k++) {
         |      if (!$ctr.isNullAt($k)) { $cc += $ctr.getDouble($k) * $ctr.getDouble($k); }
         |    }
         |    double $d = ($vv - 2.0 * $vc) + $cc;
         |    if ($size < $keep || $d < $heapD[$size - 1]) {
         |      int $pos = ($size < $keep) ? $size : $keep - 1;
         |      while ($pos > 0 && $heapD[$pos - 1] > $d) {
         |        $heapD[$pos] = $heapD[$pos - 1]; $heapC[$pos] = $heapC[$pos - 1]; $pos--;
         |      }
         |      $heapD[$pos] = $d; $heapC[$pos] = $c;
         |      if ($size < $keep) { $size++; }
         |    }
         |  }
         |}
         |Object[] $out = new Object[$size];
         |for (int $i = 0; $i < $size; $i++) { $out[$i] = Integer.valueOf($heapC[$i]); }
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** 64-bit SimHash of an array<string> token column, one pass: per token an
  * xxhash64 (seed 42 — same value Spark's xxhash64 yields for that
  * string), ±1 bit votes, sign per bit position. Null tokens are skipped.
  */
case class SimHash64(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_simhash64"

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val votes = new Array[Int](64)
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val h = XXH64.hashUTF8String(arr.getUTF8String(i), 42L)
        var j = 0
        while (j < 64) {
          votes(j) += (if (((h >>> j) & 1L) == 1L) 1 else -1)
          j += 1
        }
      }
      i += 1
    }
    var res = 0L
    var j = 0
    while (j < 64) {
      if (votes(j) > 0) res |= (1L << j)
      j += 1
    }
    res
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val votes = ctx.freshName("votes")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val h = ctx.freshName("h")
      val res = ctx.freshName("res")
      val xxh = classOf[XXH64].getName
      s"""
         |int[] $votes = new int[64];
         |for (int $i = 0; $i < $a.numElements(); $i++) {
         |  if (!$a.isNullAt($i)) {
         |    long $h = $xxh.hashUTF8String($a.getUTF8String($i), 42L);
         |    for (int $j = 0; $j < 64; $j++) {
         |      $votes[$j] += ((($h >>> $j) & 1L) == 1L) ? 1 : -1;
         |    }
         |  }
         |}
         |long $res = 0L;
         |for (int $j = 0; $j < 64; $j++) {
         |  if ($votes[$j] > 0) $res |= (1L << $j);
         |}
         |${ev.value} = $res;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Count of tokens (array<string>) that belong to a fixed word set —
  * the kernel behind stopword counting and marker-word language ID.
  * Replaces `size(filter(tokens, isInCollection(set)))`: Spark's HOFs are
  * CodegenFallback, so that formulation runs interpreted AND loses
  * common-subexpression elimination (four language passes re-split the
  * text four times). Here the generated code is one hash-set probe per
  * token and the projection stays in whole-stage codegen.
  */
case class TokensInSet(child: Expression, words: Seq[String])
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_tokens_in_set"

  // UTF8String set, built once per expression instance and shipped via
  // the codegen reference mechanism (addReferenceObj).
  @transient private lazy val set: java.util.HashSet[UTF8String] = {
    val s = new java.util.HashSet[UTF8String](words.length * 2)
    words.foreach(w => s.add(UTF8String.fromString(w)))
    s
  }

  override protected def nullSafeEval(input: Any): Any =
    TokensInSet.countIn(input.asInstanceOf[ArrayData], set)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val setRef = ctx.addReferenceObj("wordSet", set, classOf[java.util.HashSet[_]].getName)
      s"${ev.value} = graft.functions.TokensInSet.countIn($a, (java.util.HashSet) $setRef);"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TokensInSet {
  def countIn(arr: ArrayData, set: java.util.HashSet[UTF8String]): Int = {
    var n = 0
    var i = 0
    val len = arr.numElements()
    while (i < len) {
      if (!arr.isNullAt(i) && set.contains(arr.getUTF8String(i))) n += 1
      i += 1
    }
    n
  }
}

/** Single-pass distinct w-shingle hashes of a text column.
  *
  * Equivalent to `array_distinct(transform(shingles(text, w), xxhash64))`
  * over whitespace-split tokens — but with no intermediate token array, no
  * shingle-string concatenation, and no interpreted higher-order functions
  * (Spark's HOFs are CodegenFallback and knock the whole projection out of
  * whole-stage codegen). Because tokens are the single-space splits of the
  * text, every space-joined w-shingle IS a contiguous byte range of the
  * original string, so each hash is one XXH64 over that range (seed 42 —
  * the same value Spark's `xxhash64` yields for the shingle string) with
  * zero allocation per shingle.
  *
  * Hashes keep first-occurrence order, matching array_distinct.
  */
object ShingleHasher {
  def shingleHashes(text: UTF8String, w: Int): ArrayData = {
    val base = text.getBaseObject
    val off = text.getBaseOffset
    val len = text.numBytes()
    // Token start byte-offsets: a UTF-8 continuation byte is >= 0x80, so
    // scanning for raw 0x20 never splits inside a multi-byte char.
    var nStarts = 1
    var b = 0
    while (b < len) { if (text.getByte(b) == 0x20) nStarts += 1; b += 1 }
    val nTokens = nStarts
    if (nTokens < w) return new GenericArrayData(Array.emptyLongArray)
    val starts = new Array[Int](nStarts)
    var s = 1
    b = 0
    while (b < len) {
      if (text.getByte(b) == 0x20) { starts(s) = b + 1; s += 1 }
      b += 1
    }
    val m = nTokens - w + 1
    val out = new Array[Long](m)
    val seen = new java.util.HashSet[java.lang.Long](m * 2)
    var cnt = 0
    var i = 0
    while (i < m) {
      val start = starts(i)
      // end of token i+w-1: one byte before the next token's start, or EOS
      val end = if (i + w < nTokens) starts(i + w) - 1 else len
      val h = XXH64.hashUnsafeBytes(base, off + start, end - start, 42L)
      if (seen.add(h)) { out(cnt) = h; cnt += 1 }
      i += 1
    }
    new GenericArrayData(if (cnt == m) out else java.util.Arrays.copyOf(out, cnt))
  }
}

/** Whitespace tokenization, `graft_tokens(text)` → array<string>, with
  * EXACT `split(text, "\\s+")` (limit -1) semantics: maximal runs of
  * ASCII whitespace ([ \t\n\x0B\f\r] — Java's \s) are single delimiters,
  * a leading run yields a leading empty token, a trailing run a trailing
  * one, and "" yields [""]. One byte scan instead of the regex engine —
  * tokenization fronts every text-analysis column, so it is the hottest
  * string operation in the engine. Multi-byte UTF-8 is safe: whitespace
  * bytes are ASCII and continuation bytes are ≥ 0x80. Token bytes are
  * copied out (never views into a reusable row/vector buffer).
  */
object WhitespaceTokenizer {
  @inline private def isWs(b: Byte): Boolean =
    b == 0x20 || (b >= 0x09 && b <= 0x0d)

  def tokens(text: UTF8String): ArrayData = {
    val bytes = text.getBytes
    val len = bytes.length
    val out = new scala.collection.mutable.ArrayBuffer[AnyRef](8)
    var start = 0
    var i = 0
    while (i < len) {
      if (isWs(bytes(i))) {
        out += UTF8String.fromBytes(java.util.Arrays.copyOfRange(bytes, start, i))
        while (i < len && isWs(bytes(i))) i += 1
        start = i
      } else i += 1
    }
    out += UTF8String.fromBytes(java.util.Arrays.copyOfRange(bytes, start, len))
    new GenericArrayData(out.toArray)
  }
}

case class WhitespaceTokens(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_tokens"

  override protected def nullSafeEval(input: Any): Any =
    WhitespaceTokenizer.tokens(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, t =>
      s"${ev.value} = graft.functions.WhitespaceTokenizer.tokens($t);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Banded-LSH bucket keys of a minhash signature: `graft_band_buckets(
  * sig, bands, rows)` → array<long> of length `bands`, where bucket b is
  * a seed-42 XXH64.hashLong chain over (b, sig[b·rows], …,
  * sig[b·rows+rows-1]). Engine-defined values — NOT equal to the
  * `xxhash64(lit(b), sig(i)…)` Column chain this replaced (that hashed
  * the band index via hashInt); index buckets written by one formulation
  * cannot be probed by the other. The point is expression SIZE: one
  * small expression instead of `bands` structs × (rows+1)-ary hashes,
  * whose analysis + codegen compilation dominated the LSH stage's
  * latency.
  */
object BandBucketer {
  def buckets(sig: ArrayData, bands: Int, rows: Int): ArrayData = {
    // Loud error on a parameter mismatch — an unchecked getLong past the
    // array on UnsafeArrayData is a raw-memory read producing silently
    // wrong buckets (the replaced Column formulation threw under ANSI).
    require(sig.numElements() >= bands * rows,
      s"signature has ${sig.numElements()} elements; bands=$bands x rows=$rows needs ${bands * rows}")
    val out = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var h = XXH64.hashLong(b.toLong, 42L)
      var r = 0
      while (r < rows) {
        h = XXH64.hashLong(sig.getLong(b * rows + r), h)
        r += 1
      }
      out(b) = h
      b += 1
    }
    new GenericArrayData(out)
  }
}

case class BandBuckets(child: Expression, bands: Int, rows: Int)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(ArrayType(LongType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_band_buckets"

  override protected def nullSafeEval(input: Any): Any =
    BandBucketer.buckets(input.asInstanceOf[ArrayData], bands, rows)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.BandBucketer.buckets($a, $bands, $rows);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Catalyst wrapper for [[ShingleHasher]]: `graft_shingle_set(text, w)` →
  * array<long>. The generated code is a single static call, so the
  * surrounding projection stays inside whole-stage codegen.
  */
case class ShingleHashes(child: Expression, w: Int)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_shingle_set"

  override protected def nullSafeEval(input: Any): Any =
    ShingleHasher.shingleHashes(input.asInstanceOf[UTF8String], w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, t =>
      s"${ev.value} = graft.functions.ShingleHasher.shingleHashes($t, $w);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** k-element MinHash signature of an array<long> shingle-hash column in a
  * single pass. Hash family: double hashing over two XXH64 draws,
  * h_i(x) = h1(x) + i·h2(x) (mod 2⁶⁴, JVM wrap) with h2 forced odd so
  * every h_i is a bijection of the key space — the Kirsch–Mitzenmacher
  * construction, which preserves MinHash's collision behavior while
  * costing 2 strong hashes + k multiply-adds per element instead of k
  * strong hashes (the signature pass dominated the near-dup pipeline at
  * k=128). Empty input yields a signature of Long.MaxValue sentinels
  * (callers filter empty shingle sets). Null elements are skipped.
  */
case class MinHashSignature(child: Expression, k: Int)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(ArrayType(LongType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_minhash"

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val mins = Array.fill(k)(Long.MaxValue)
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val x = arr.getLong(i)
        val h1 = XXH64.hashLong(x, 0L)
        val h2 = XXH64.hashLong(x, 1L) | 1L
        var h = h1
        var f = 0
        while (f < k) {
          if (h < mins(f)) mins(f) = h
          h += h2
          f += 1
        }
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val mins = ctx.freshName("mins")
      val i = ctx.freshName("i")
      val f = ctx.freshName("f")
      val x = ctx.freshName("x")
      val h = ctx.freshName("h")
      val h2 = ctx.freshName("h2")
      val xxh = classOf[XXH64].getName
      val gad = classOf[GenericArrayData].getName
      s"""
         |long[] $mins = new long[$k];
         |java.util.Arrays.fill($mins, Long.MAX_VALUE);
         |for (int $i = 0; $i < $a.numElements(); $i++) {
         |  if (!$a.isNullAt($i)) {
         |    long $x = $a.getLong($i);
         |    long $h = $xxh.hashLong($x, 0L);
         |    long $h2 = $xxh.hashLong($x, 1L) | 1L;
         |    for (int $f = 0; $f < $k; $f++) {
         |      if ($h < $mins[$f]) $mins[$f] = $h;
         |      $h += $h2;
         |    }
         |  }
         |}
         |${ev.value} = new $gad($mins);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Single-pass multi-set marker counting for language ID:
  * `graft_lang_scores(text, sets)` → array<int>, where `sets` is a
  * literal array of marker-word lists and slot i counts tokens of
  * `lower(text)` that fall in set i.
  *
  * Exactly equivalent to `graft_tokens_in_set(graft_tokens(lower(text)),
  * set_i)` per set — but ONE byte scan over the raw text replaces
  * lower-copy + token-array materialization + one probe pass per set
  * (tokenization order: Unicode lowercasing never produces or consumes
  * ASCII whitespace, so lowercase-then-split and split-then-lowercase
  * yield the same tokens). Tokens are lowercased into a reused scratch
  * buffer when pure ASCII (the corpus norm); rare multi-byte tokens take
  * the UTF8String.toLowerCase path for full parity with `lower()`. Each
  * token makes ONE map probe; the value is a bitmask of the sets the
  * word belongs to, so overlapping sets still count independently.
  */
object MarkerCounter {
  /** word(lowercase) → bitmask of set indexes; ≤ 32 sets. */
  def buildMask(sets: Seq[Seq[String]]): java.util.HashMap[UTF8String, Integer] = {
    require(sets.length <= 32, "at most 32 marker sets")
    // The 64-byte scratch is a fast-path SIZING choice, not a soundness
    // bound (over-scratch tokens take the Unicode fallback probe), but
    // keep marker words inside it so the common all-ASCII probe never
    // allocates.
    require(sets.flatten.forall(_.getBytes("UTF-8").length <= 64),
      "marker words must be <= 64 UTF-8 bytes")
    val m = new java.util.HashMap[UTF8String, Integer]()
    sets.zipWithIndex.foreach { case (words, i) =>
      words.foreach { w =>
        val k = UTF8String.fromString(w.toLowerCase)
        val prev = m.get(k)
        m.put(k, Integer.valueOf((if (prev == null) 0 else prev.intValue()) | (1 << i)))
      }
    }
    m
  }

  def score(text: UTF8String, mask: java.util.HashMap[UTF8String, Integer],
            nSets: Int): ArrayData = {
    val bytes = text.getBytes
    val len = bytes.length
    val counts = new Array[Int](nSets)
    val scratch = new Array[Byte](64) // longest marker word is far shorter
    var start = 0
    var i = 0
    while (i <= len) {
      val atWs = i < len &&
        (bytes(i) == 0x20 || (bytes(i) >= 0x09 && bytes(i) <= 0x0d))
      if (atWs || i == len) {
        val tlen = i - start
        if (tlen > 0) {
          // ASCII fast path: lowercase into the scratch buffer; bail to
          // the single slow-path probe on any byte >= 0x80 OR a token
          // longer than the scratch. Over-scratch tokens MUST still be
          // probed: byte-SHRINKING lowercase mappings (U+212A KELVIN
          // SIGN → 'k', U+017F → 's') mean a >64-byte token can
          // lowercase to a ≤64-byte marker word, so skipping would
          // diverge from tokensInSet(tokens(lower(text))) (ADVICE r4).
          var ascii = tlen <= scratch.length
          var j = 0
          while (j < tlen && ascii) {
            val b = bytes(start + j)
            if (b < 0) ascii = false
            else scratch(j) = if (b >= 'A' && b <= 'Z') (b + 32).toByte else b
            j += 1
          }
          val hit: Integer =
            if (ascii) mask.get(UTF8String.fromBytes(scratch, 0, tlen))
            else mask.get(UTF8String.fromBytes(
              java.util.Arrays.copyOfRange(bytes, start, i)).toLowerCase)
          if (hit != null) {
            var m = hit.intValue()
            while (m != 0) {
              val s = java.lang.Integer.numberOfTrailingZeros(m)
              counts(s) += 1
              m &= m - 1
            }
          }
        }
        // skip the whitespace run
        i += 1
        while (i < len && (bytes(i) == 0x20 || (bytes(i) >= 0x09 && bytes(i) <= 0x0d))) i += 1
        start = i
      } else i += 1
    }
    new GenericArrayData(counts)
  }
}

case class LangScores(child: Expression, sets: Seq[Seq[String]])
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "graft_lang_scores"

  @transient private lazy val mask = MarkerCounter.buildMask(sets)

  override protected def nullSafeEval(input: Any): Any =
    MarkerCounter.score(input.asInstanceOf[UTF8String], mask, sets.length)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, t => {
      val maskRef = ctx.addReferenceObj("markerMask", mask, classOf[java.util.HashMap[_, _]].getName)
      s"${ev.value} = graft.functions.MarkerCounter.score($t, (java.util.HashMap) $maskRef, ${sets.length});"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Greedy merge-table BPE subword tokenization (`graft_bpe_tokens(text,
  * merges)` → array<string>): the inference-time byte-pair-encoding
  * algorithm a pretraining pipeline budgets tokens with, over a FIXED
  * merge table (rank-ordered "left right" pairs — the artifact BPE
  * training produces).
  *
  * Algorithm, defined exactly (the q91 DuckDB oracle replays it
  * step-for-step as a recursive CTE): words are single-space splits of
  * the text (the `string_split(text, ' ')` parity unit; empty words
  * contribute nothing); each word starts as its code-point sequence;
  * then repeatedly the adjacent pair with the LOWEST merge rank — the
  * LEFTMOST occurrence on ties — concatenates, until no adjacent pair is
  * in the table. One merge per step keeps the recurrence first-order
  * (state = symbol list), which is what makes it expressible as a
  * recursive CTE; for non-overlapping pairs it visits the same merges as
  * the merge-all-occurrences formulation, and for self-overlapping pairs
  * ("a a" on "aaa") it is the well-defined leftmost-first resolution.
  *
  * Scale shape: a per-row kernel inside whole-stage codegen — no shuffle,
  * no UDF serialization; cost is O(word_len × merges_applied) with a
  * constant-time hash probe per adjacent pair. The merge table rides the
  * expression as a reference object (broadcast with the plan, built once
  * per executor), the `graft_tokens_in_set` pattern.
  */
object BpeTokenizer {

  /** Rank map from rank-ordered "left right" merge strings. Symbols never
    * contain spaces (words are space-splits), so the space-joined pair is
    * an unambiguous key.
    */
  def buildRanks(merges: Seq[String]): java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer](merges.size * 2)
    merges.zipWithIndex.foreach { case (pair, rank) =>
      require(pair.split(" ", -1).length == 2,
        s"merge must be 'left right', got '$pair'")
      require(m.put(pair, Int.box(rank)) == null, s"duplicate merge '$pair'")
    }
    m
  }

  def tokens(text: UTF8String, ranks: java.util.HashMap[String, Integer]): ArrayData = {
    val out = new scala.collection.mutable.ArrayBuffer[AnyRef](16)
    val s = text.toString
    val n = s.length
    var wStart = 0
    var i = 0
    while (i <= n) {
      if (i == n || s.charAt(i) == ' ') {
        if (i > wStart) encodeWord(s.substring(wStart, i), ranks, out)
        wStart = i + 1
      }
      i += 1
    }
    new GenericArrayData(out.toArray)
  }

  private def encodeWord(
      word: String,
      ranks: java.util.HashMap[String, Integer],
      out: scala.collection.mutable.ArrayBuffer[AnyRef]): Unit = {
    // Code points, not chars: DuckDB's substr/len count characters, and a
    // supplementary-plane glyph must be ONE initial symbol on both sides.
    val syms = new java.util.ArrayList[String](word.length)
    var i = 0
    while (i < word.length) {
      val cc = Character.charCount(word.codePointAt(i))
      syms.add(word.substring(i, i + cc))
      i += cc
    }
    var merging = syms.size >= 2
    while (merging) {
      var bestRank = Int.MaxValue
      var bestPos = -1
      var j = 0
      while (j < syms.size - 1) {
        val r = ranks.get(syms.get(j) + " " + syms.get(j + 1))
        if (r != null && r < bestRank) { bestRank = r; bestPos = j }
        j += 1
      }
      if (bestPos < 0) merging = false
      else {
        syms.set(bestPos, syms.get(bestPos) + syms.get(bestPos + 1))
        syms.remove(bestPos + 1)
        merging = syms.size >= 2
      }
    }
    var k = 0
    while (k < syms.size) { out += UTF8String.fromString(syms.get(k)); k += 1 }
  }
}

case class BpeTokens(child: Expression, merges: Seq[String])
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_bpe_tokens"

  @transient private lazy val ranks = BpeTokenizer.buildRanks(merges)

  override protected def nullSafeEval(input: Any): Any =
    BpeTokenizer.tokens(input.asInstanceOf[UTF8String], ranks)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, t => {
      val ranksRef = ctx.addReferenceObj("bpeRanks", ranks,
        classOf[java.util.HashMap[_, _]].getName)
      s"${ev.value} = graft.functions.BpeTokenizer.tokens($t, $ranksRef);"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Hashed-feature linear scoring (`graft_hash_logit(text, weights, bias)`
  * → double): the log-odds z = bias + Σ_tokens weights[h(token)] of a
  * logistic quality classifier over hashed word-unigram features — the
  * scoring half of the standard trainable quality filter (the third leg
  * beside heuristics and the LM perplexity filter). Keeping z (sigmoid is
  * monotone) spares both engine and oracle an exp() parity concern.
  *
  * The feature hash is deliberately DuckDB-replayable:
  *   h(w) = list_reduce(codepoints(w), (a, c) -> (a*31 + c) % D) % D
  * i.e. the accumulator STARTS at the first code point (list_reduce has
  * no init), every subsequent step folds mod D, and the outer mod covers
  * the single-code-point case (a lone CJK glyph exceeds D). Tokens are
  * single-space splits, empties skipped.
  *
  * Scale shape: per-row codegen kernel, no shuffle; the weight vector
  * (small, e.g. 64-1024 buckets) rides the plan as a reference object —
  * the model-as-parameter pattern shared with the LM and ANN indexes.
  */
object HashedLogit {

  /** The list_reduce-parity polynomial hash (see object doc). */
  def hashToken(word: String, dim: Int): Int = {
    var acc = 0L
    var i = 0
    var first = true
    while (i < word.length) {
      val cp = word.codePointAt(i)
      i += Character.charCount(cp)
      if (first) { acc = cp; first = false }
      else acc = (acc * 31L + cp) % dim
    }
    (acc % dim).toInt
  }

  def score(text: UTF8String, weights: Array[Double], bias: Double): Double = {
    val s = text.toString
    val n = s.length
    var z = bias
    var wStart = 0
    var i = 0
    while (i <= n) {
      if (i == n || s.charAt(i) == ' ') {
        if (i > wStart)
          z += weights(hashToken(s.substring(wStart, i), weights.length))
        wStart = i + 1
      }
      i += 1
    }
    z
  }
}

case class HashedLogitScore(child: Expression, weights: Seq[Double], bias: Double)
    extends UnaryExpression with ExpectsInputTypes {

  require(weights.nonEmpty, "graft_hash_logit needs a non-empty weight vector")
  require(java.lang.Double.isFinite(bias) && weights.forall(java.lang.Double.isFinite),
    "graft_hash_logit weights/bias must be finite (bias is embedded as a codegen literal)")

  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_hash_logit"

  @transient private lazy val w = weights.toArray

  override protected def nullSafeEval(input: Any): Any =
    HashedLogit.score(input.asInstanceOf[UTF8String], w, bias)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, t => {
      val wRef = ctx.addReferenceObj("logitWeights", w, "double[]")
      s"${ev.value} = graft.functions.HashedLogit.score($t, $wRef, ${bias}d);"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Bloom-filter membership probe over a serialized
  * `org.apache.spark.util.sketch.BloomFilter`, the scan-side half of
  * bloom semi-join reduction ([[graft.operators.BloomJoin]]): the dim
  * side's key set is sketched once into a few hundred KB, and this
  * expression drops non-joining fact rows BEFORE they reach the shuffle.
  * False positives only pass extra rows through — the join behind it
  * keeps the result exact. The filter deserializes once per expression
  * instance and ships to generated code via the reference mechanism;
  * the probe itself is two hash mults and d bit tests, fully inside
  * whole-stage codegen.
  */
case class BloomMightContain(child: Expression, bloomBytes: Array[Byte])
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(LongType)
  override def dataType: DataType = BooleanType
  override def prettyName: String = "graft_bloom_contains"

  @transient private lazy val bloom: org.apache.spark.util.sketch.BloomFilter =
    org.apache.spark.util.sketch.BloomFilter.readFrom(
      new java.io.ByteArrayInputStream(bloomBytes))

  override protected def nullSafeEval(input: Any): Any =
    bloom.mightContainLong(input.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val ref = ctx.addReferenceObj("bloom", bloom,
        classOf[org.apache.spark.util.sketch.BloomFilter].getName)
      s"${ev.value} = $ref.mightContainLong($a);"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Greedy longest-match subword tokenization (`graft_wordpiece(text,
  * vocab)` → array<string>): the WordPiece-style APPLY step — words
  * split on single spaces, each consumed left to right by the longest
  * vocabulary piece matching at the cursor. A position no piece matches
  * (a character outside the training corpus) emits that single
  * character itself and advances — deterministic, replayable unknown
  * handling, mirrored by the SQL oracle's coalesce fallback.
  *
  * Same model-as-parameter shape as the BPE/logit kernels: the
  * vocabulary rides the plan as a reference object (a hash set plus its
  * max piece length), the per-row loop is O(len · maxPieceLen) set
  * probes inside whole-stage codegen, no shuffle.
  */
object WordPieceTokenizer {

  final class Vocab(pieces: Seq[String]) extends Serializable {
    val set = new java.util.HashSet[String](pieces.length * 2)
    pieces.foreach(set.add)
    val maxLen: Int = if (pieces.isEmpty) 1 else pieces.map(_.length).max
  }

  // Same separator class as WhitespaceTokenizer ([ \t\n\x0B\f\r]): the
  // trainer tokenizes through graft_tokens and the oracle through
  // \s+-split, so the APPLY step must agree on what a word is — an
  // ASCII-space-only split would treat "a\tb" as one word and emit "\t"
  // as a piece the vocabulary never saw.
  @inline private def isWs(c: Char): Boolean =
    c == ' ' || (c >= '\t' && c <= '\r')

  def tokens(text: UTF8String, vocab: Vocab): ArrayData = {
    val s = text.toString
    val out = new scala.collection.mutable.ArrayBuffer[UTF8String]()
    var wStart = 0
    var i = 0
    val n = s.length
    while (i <= n) {
      if (i == n || isWs(s.charAt(i))) {
        var pos = wStart
        while (pos < i) {
          var l = math.min(vocab.maxLen, i - pos)
          var matched = 1 // fallback: the single char itself
          var found = false
          while (l >= 1 && !found) {
            if (vocab.set.contains(s.substring(pos, pos + l))) {
              matched = l
              found = true
            }
            l -= 1
          }
          out += UTF8String.fromString(s.substring(pos, pos + matched))
          pos += matched
        }
        wStart = i + 1
      }
      i += 1
    }
    new GenericArrayData(out.toArray[Any])
  }
}

case class WordPieceTokens(child: Expression, vocab: Seq[String])
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_wordpiece"

  @transient private lazy val v = new WordPieceTokenizer.Vocab(vocab)

  override protected def nullSafeEval(input: Any): Any =
    WordPieceTokenizer.tokens(input.asInstanceOf[UTF8String], v)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, t => {
      val vRef = ctx.addReferenceObj("wpVocab", v,
        classOf[WordPieceTokenizer.Vocab].getName)
      s"${ev.value} = graft.functions.WordPieceTokenizer.tokens($t, $vRef);"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Optimal (Viterbi) subword segmentation under a fully-integer
  * objective: fewest pieces first, then greatest total piece weight —
  * the exact-arithmetic stand-in for the unigram-LM Viterbi decode
  * (same DP structure; an integer objective instead of float log-probs,
  * because float tie semantics are engine-dependent in a way a hash
  * gate cannot pin — the reason WordPiece.trainVocab stops at the seed
  * step). Against the greedy longest-match tokenizer this is the
  * GLOBAL optimum per word: it can never emit more pieces, and the
  * ViterbiSpec pins cases where greedy is strictly worse.
  *
  * Determinism pins: words split on the engine-wide whitespace class; a
  * position covered by no piece emits its single character at weight 0
  * (the WordPiece fallback); DP tie on (count, weight) prefers the
  * LONGEST last piece, making the emitted token sequence unique.
  *
  * Same model-as-parameter shape as the other tokenizers: the
  * (piece → weight) map rides the plan as a reference object; the
  * per-row DP is O(len · maxPieceLen) map probes inside whole-stage
  * codegen, no shuffle.
  */
object ViterbiSegmenter {

  final class Model(pieces: Seq[String], weights: Seq[Long]) extends Serializable {
    require(pieces.length == weights.length,
      s"pieces/weights length mismatch: ${pieces.length} vs ${weights.length}")
    val w = new java.util.HashMap[String, java.lang.Long](pieces.length * 2)
    pieces.zip(weights).foreach { case (p, wt) => w.put(p, java.lang.Long.valueOf(wt)) }
    val maxLen: Int = if (pieces.isEmpty) 1 else pieces.map(_.length).max
  }

  @inline private def isWs(c: Char): Boolean =
    c == ' ' || (c >= '\t' && c <= '\r')

  /** DP over s[start, end); appends the optimal token sequence to `out`
    * when non-null; returns (pieceCount, weightSum).
    */
  private def segmentWord(
      s: String, start: Int, end: Int, m: Model,
      out: scala.collection.mutable.ArrayBuffer[UTF8String]): (Long, Long) = {
    val n = end - start
    val cnt = new Array[Long](n + 1)
    val sw = new Array[Long](n + 1)
    val back = new Array[Int](n + 1)
    var p = 1
    while (p <= n) {
      var bestCnt = Long.MaxValue
      var bestSw = Long.MinValue
      var bestJ = 0
      // longest candidate first: strict-improvement updates keep the
      // longest last piece on an exact (cnt, sw) tie
      var j = math.min(p, m.maxLen)
      while (j >= 1) {
        val wt = m.w.get(s.substring(start + p - j, start + p))
        if (wt != null || j == 1) {
          val c = cnt(p - j) + 1
          val v = sw(p - j) + (if (wt != null) wt.longValue else 0L)
          if (c < bestCnt || (c == bestCnt && v > bestSw)) {
            bestCnt = c; bestSw = v; bestJ = j
          }
        }
        j -= 1
      }
      cnt(p) = bestCnt; sw(p) = bestSw; back(p) = bestJ
      p += 1
    }
    if (out != null && n > 0) {
      val lens = new scala.collection.mutable.ArrayBuffer[Int](n)
      var q = n
      while (q > 0) { lens += back(q); q -= back(q) }
      var pos = start
      var i = lens.length - 1
      while (i >= 0) {
        out += UTF8String.fromString(s.substring(pos, pos + lens(i)))
        pos += lens(i)
        i -= 1
      }
    }
    (cnt(n), sw(n))
  }

  private def perWord[A](text: UTF8String, m: Model,
      out: scala.collection.mutable.ArrayBuffer[UTF8String]): (Long, Long) = {
    val s = text.toString
    var totCnt = 0L
    var totSw = 0L
    var wStart = 0
    var i = 0
    val n = s.length
    while (i <= n) {
      if (i == n || isWs(s.charAt(i))) {
        if (i > wStart) {
          val (c, v) = segmentWord(s, wStart, i, m, out)
          totCnt += c; totSw += v
        }
        wStart = i + 1
      }
      i += 1
    }
    (totCnt, totSw)
  }

  def tokens(text: UTF8String, m: Model): ArrayData = {
    val out = new scala.collection.mutable.ArrayBuffer[UTF8String]()
    perWord(text, m, out)
    new GenericArrayData(out.toArray[Any])
  }

  def stats(text: UTF8String, m: Model): org.apache.spark.sql.catalyst.InternalRow = {
    val (c, v) = perWord(text, m, null)
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](c, v))
  }
}

case class ViterbiTokens(child: Expression, pieces: Seq[String], weights: Seq[Long])
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_viterbi"

  @transient private lazy val m = new ViterbiSegmenter.Model(pieces, weights)

  override protected def nullSafeEval(input: Any): Any =
    ViterbiSegmenter.tokens(input.asInstanceOf[UTF8String], m)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, t => {
      val mRef = ctx.addReferenceObj("viterbiModel", m,
        classOf[ViterbiSegmenter.Model].getName)
      s"${ev.value} = graft.functions.ViterbiSegmenter.tokens($t, $mRef);"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

case class ViterbiStats(child: Expression, pieces: Seq[String], weights: Seq[Long])
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = StructType(Seq(
    StructField("n_tokens", LongType, nullable = false),
    StructField("sum_weight", LongType, nullable = false)))
  override def prettyName: String = "graft_viterbi_stats"

  @transient private lazy val m = new ViterbiSegmenter.Model(pieces, weights)

  override protected def nullSafeEval(input: Any): Any =
    ViterbiSegmenter.stats(input.asInstanceOf[UTF8String], m)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, t => {
      val mRef = ctx.addReferenceObj("viterbiModel", m,
        classOf[ViterbiSegmenter.Model].getName)
      s"${ev.value} = graft.functions.ViterbiSegmenter.stats($t, $mRef);"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Elementwise vector add/subtract over two array<double> columns —
  * `graft_vec_add(a, b)` / `graft_vec_sub(a, b)` → array<double> of the
  * common-prefix length. Each element is the single IEEE double op
  * `a[i] ± b[i]` (no re-association), so results are bit-identical to
  * any engine evaluating the same per-element arithmetic — the property
  * the IVF-PQ residual/reconstruction oracle replay rests on. A null
  * element on either side yields a null element (the testdata carries
  * none). The zip_with HOF computes the same values but is
  * CodegenFallback and allocates a lambda frame per element; this is one
  * primitive loop via [[VecArith.combine]], inlined in whole-stage
  * codegen.
  */
object VecArith {
  def combine(a: ArrayData, b: ArrayData, sign: Double): ArrayData = {
    val n = math.min(a.numElements(), b.numElements())
    val out = new Array[Any](n)
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i) && !b.isNullAt(i))
        out(i) = a.getDouble(i) + sign * b.getDouble(i)
      i += 1
    }
    new GenericArrayData(out)
  }
}

case class VecElementwise(left: Expression, right: Expression, subtract: Boolean)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] =
    Seq(ArrayType(DoubleType), ArrayType(DoubleType))
  override def dataType: DataType = ArrayType(DoubleType, containsNull = true)
  override def prettyName: String = if (subtract) "graft_vec_sub" else "graft_vec_add"

  private def sign: Double = if (subtract) -1.0 else 1.0

  override protected def nullSafeEval(a: Any, b: Any): Any =
    VecArith.combine(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData], sign)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.VecArith.combine($a, $b, ${sign});")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Deflate helper behind [[DeflateLen]]: one `Deflater` per thread,
  * `reset()` between rows — a Deflater wraps native zlib state whose
  * per-row allocation would dominate the kernel. `nowrap = true` (raw
  * DEFLATE, no zlib header/adler) and a pinned level keep the byte count
  * a pure function of the input.
  */
object DeflateKernel {
  final val Level = 6

  private val local = new ThreadLocal[java.util.zip.Deflater] {
    override def initialValue(): java.util.zip.Deflater =
      new java.util.zip.Deflater(Level, true)
  }

  def deflatedLength(s: UTF8String): Int = {
    val d = local.get()
    d.reset()
    d.setInput(s.getBytes)
    d.finish()
    val buf = new Array[Byte](8192)
    var total = 0
    while (!d.finished()) total += d.deflate(buf)
    total
  }

  /** Full compressed payload — spec-only (round-trip proof); the hot
    * path never materializes it.
    */
  def deflateBytes(bytes: Array[Byte]): Array[Byte] = {
    val d = new java.util.zip.Deflater(Level, true)
    try {
      d.setInput(bytes)
      d.finish()
      val out = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](8192)
      while (!d.finished()) out.write(buf, 0, d.deflate(buf))
      out.toByteArray
    } finally d.end()
  }

  def inflateBytes(bytes: Array[Byte]): Array[Byte] = {
    val inf = new java.util.zip.Inflater(true)
    try {
      // Inflater(nowrap=true) requires one extra dummy input byte after
      // the raw stream (documented java.util.zip quirk).
      inf.setInput(bytes :+ 0.toByte)
      val out = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](8192)
      while (!inf.finished()) {
        val n = inf.inflate(buf)
        if (n == 0 && inf.needsInput()) throw new java.io.EOFException("truncated deflate stream")
        out.write(buf, 0, n)
      }
      out.toByteArray
    } finally inf.end()
  }
}

/** DEFLATE-compressed byte count of a string's UTF-8 encoding — the
  * compression-ratio quality signal (highly repetitive or templated text
  * compresses far below natural prose; several public curation recipes
  * threshold on it alongside the heuristic and LM signals). Not
  * SQL-expressible, so its query is rows-only-checked; DeflateSpec pins
  * the inflate∘deflate identity and the repetitive≪prose ordering
  * instead of platform-dependent exact counts.
  */
case class DeflateLen(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_deflate_len"

  override protected def nullSafeEval(input: Any): Any =
    DeflateKernel.deflatedLength(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.DeflateKernel.deflatedLength($a);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** HTML → text boilerplate removal — the CCNet/jusText-style extraction
  * kernel behind `graft_html_text` ([[HtmlExtractText]]): the ingestion
  * front door for Common-Crawl-shaped corpora. One single-pass state
  * machine, no regex engine, no DOM allocation:
  *
  *  1. `<script>/<style>/<head>/<noscript>/<svg>/<template>/<iframe>`
  *     subtrees are dropped whole (scan to the matching close tag —
  *     these elements do not nest in valid HTML).
  *  2. Comments `<!-- -->` and doctypes are dropped; a bare `<` that
  *     opens no tag is literal text.
  *  3. Block-level tags (p, div, h1-h6, li, table cells, nav, footer,
  *     br, …) delimit candidate text blocks.
  *  4. Character entities decode inline (`&amp; &lt; &gt; &quot; &apos;
  *     &nbsp; &copy;`, `&#NNN;`, `&#xHH;`); unknown entities stay
  *     literal.
  *  5. Per block, whitespace is collapsed to single spaces and trimmed;
  *     a block is KEPT iff its normalized length ≥ `minChars` AND its
  *     link density (decoded non-space chars inside `<a>` ÷ all decoded
  *     non-space chars) ≤ `maxLinkPct`% — the jusText/CCNet block
  *     heuristic: navigation and footer chrome is short and link-dense,
  *     body prose is long and link-sparse.
  *
  * Kept blocks join with a single `\n`. Deterministic, allocation-
  * bounded by the input, executor-safe.
  */
object HtmlTextExtractor {

  private val SkipTags =
    Set("script", "style", "head", "noscript", "svg", "template", "iframe")
  private val BlockTags = Set(
    "p", "div", "h1", "h2", "h3", "h4", "h5", "h6", "li", "ul", "ol",
    "table", "thead", "tbody", "tfoot", "tr", "td", "th", "br", "hr",
    "section", "article", "header", "footer", "nav", "aside", "main",
    "blockquote", "pre", "title", "body", "html", "form", "figure",
    "figcaption", "dl", "dt", "dd", "address", "fieldset", "option",
    "select", "textarea")

  @inline private def isWs(c: Char): Boolean =
    c == ' ' || (c >= '\t' && c <= '\r')

  // Test-only instrumentation: when the flag is on, every kernel
  // invocation is counted — PipelineSpec pins that the crawl loop's
  // URL-level policy gates run BEFORE extraction (a blocked-domain
  // page's html must never reach this kernel; r17 verdict "what's
  // wrong" #1). Off by default: production cost is one volatile read
  // per page, noise next to the parse itself.
  @volatile var countInvocations: Boolean = false
  val invocations = new java.util.concurrent.atomic.LongAdder

  def extract(html: UTF8String, minChars: Int, maxLinkPct: Int): UTF8String = {
    if (countInvocations) invocations.increment()
    val s = html.toString
    val n = s.length
    val out = new java.lang.StringBuilder
    val block = new java.lang.StringBuilder
    var linkChars = 0
    var totalChars = 0
    var linkDepth = 0
    var i = 0

    def flush(): Unit = {
      // collapse whitespace runs to single spaces, trim
      val norm = new java.lang.StringBuilder(block.length)
      var j = 0
      var pendingSpace = false
      while (j < block.length) {
        val c = block.charAt(j)
        if (isWs(c)) { if (norm.length > 0) pendingSpace = true }
        else {
          if (pendingSpace) { norm.append(' '); pendingSpace = false }
          norm.append(c)
        }
        j += 1
      }
      if (norm.length >= minChars &&
          linkChars * 100L <= maxLinkPct.toLong * totalChars) {
        if (out.length > 0) out.append('\n')
        out.append(norm)
      }
      block.setLength(0); linkChars = 0; totalChars = 0
    }

    def appendText(c: Char): Unit = {
      block.append(c)
      if (!isWs(c)) {
        totalChars += 1
        if (linkDepth > 0) linkChars += 1
      }
    }

    // decode the entity starting at s(i) == '&'; returns the next index
    def entity(at: Int): Int = {
      var j = at + 1
      val lim = math.min(n, at + 12)
      while (j < lim && s.charAt(j) != ';') j += 1
      if (j >= lim || s.charAt(j) != ';') { appendText('&'); return at + 1 }
      val name = s.substring(at + 1, j)
      val decoded: Int = name match {
        case "amp" => '&'
        case "lt" => '<'
        case "gt" => '>'
        case "quot" => '"'
        case "apos" => '\''
        case "nbsp" => ' '
        case "copy" => 0xa9
        case _ if name.length > 1 && name.charAt(0) == '#' =>
          try {
            val cp =
              if (name.charAt(1) == 'x' || name.charAt(1) == 'X')
                Integer.parseInt(name.substring(2), 16)
              else Integer.parseInt(name.substring(1))
            if (Character.isValidCodePoint(cp)) cp else -1
          } catch { case _: NumberFormatException => -1 }
        case _ => -1
      }
      if (decoded < 0) { appendText('&'); at + 1 }
      else {
        Character.toChars(decoded).foreach(appendText)
        j + 1
      }
    }

    // s(i) == '<' and s(i+1) starts a name or '/': parse the tag, handle
    // quotes in attribute values, return index past '>'
    def tag(at: Int): Int = {
      var j = at + 1
      var closing = false
      if (j < n && s.charAt(j) == '/') { closing = true; j += 1 }
      val nameStart = j
      while (j < n && (s.charAt(j).isLetter || s.charAt(j).isDigit)) j += 1
      val name = s.substring(nameStart, j).toLowerCase(java.util.Locale.ROOT)
      // scan to the closing '>' honoring quoted attribute values
      var quote: Char = 0
      while (j < n && (quote != 0 || s.charAt(j) != '>')) {
        val c = s.charAt(j)
        if (quote != 0) { if (c == quote) quote = 0 }
        else if (c == '"' || c == '\'') quote = c
        j += 1
      }
      val end = if (j < n) j + 1 else n
      if (!closing && SkipTags.contains(name)) {
        flush()
        // drop the subtree: scan to "</name" then past its '>'. The
        // prefix match alone would let "</header>" close a <head> skip
        // (and "</scripted>" a <script> skip), leaking the rest of the
        // skipped subtree into the text — so the char after the name
        // must end the tag name (the HTML5 script-end rule: '>', '/',
        // or whitespace).
        val lower = "</" + name
        var k = end
        var found = -1
        while (found < 0 && k + lower.length <= n) {
          // regionMatches first: it fail-fasts on the first char at the
          // (overwhelmingly common) non-matching position; the boundary
          // check only runs on an actual "</name" hit
          if (s.regionMatches(true, k, lower, 0, lower.length) &&
              (k + lower.length >= n || {
                val c = s.charAt(k + lower.length)
                c == '>' || c == '/' || isWs(c)
              })) found = k
          else k += 1
        }
        if (found < 0) return n // unterminated: rest of input is the subtree
        var m = found + lower.length
        while (m < n && s.charAt(m) != '>') m += 1
        return if (m < n) m + 1 else n
      }
      if (BlockTags.contains(name)) flush()
      if (name == "a") {
        if (closing) linkDepth = math.max(0, linkDepth - 1)
        else linkDepth += 1
      }
      end
    }

    while (i < n) {
      val c = s.charAt(i)
      if (c == '<') {
        if (i + 3 < n && s.charAt(i + 1) == '!' && s.charAt(i + 2) == '-' &&
            s.charAt(i + 3) == '-') {
          val close = s.indexOf("-->", i + 4)
          i = if (close < 0) n else close + 3
        } else if (i + 1 < n && s.charAt(i + 1) == '!') {
          // doctype / CDATA-ish declaration: skip to '>'
          val close = s.indexOf('>', i + 1)
          i = if (close < 0) n else close + 1
        } else if (i + 1 < n &&
            (s.charAt(i + 1).isLetter || s.charAt(i + 1) == '/')) {
          i = tag(i)
        } else { appendText('<'); i += 1 }
      } else if (c == '&') {
        i = entity(i)
      } else { appendText(c); i += 1 }
    }
    flush()
    UTF8String.fromString(out.toString)
  }
}

/** `graft_html_text(html, minChars, maxLinkPct)` — boilerplate-removed
  * text of an HTML document ([[HtmlTextExtractor]]). Blocks shorter than
  * `minChars` normalized chars or with link density above `maxLinkPct`%
  * are dropped; survivors join with '\n'.
  */
case class HtmlExtractText(child: Expression, minChars: Int, maxLinkPct: Int)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_html_text"

  override protected def nullSafeEval(input: Any): Any =
    HtmlTextExtractor.extract(input.asInstanceOf[UTF8String], minChars, maxLinkPct)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, t =>
      s"${ev.value} = graft.functions.HtmlTextExtractor.extract($t, $minChars, $maxLinkPct);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Unicode text-repair kernels behind `graft_nfc` ([[NfcNormalize]]) and
  * `graft_fix_mojibake` ([[FixMojibake]]) — the encoding-hygiene pass a
  * crawl corpus needs before any byte-level dedup or tokenization:
  * visually-identical strings in different normal forms (e + U+0301 vs
  * é) hash differently, split token statistics, and defeat exact dedup;
  * CP1252-mis-decoded UTF-8 ("Ã©" for "é" — the classic mojibake of web
  * text round-tripped through a legacy default charset) poisons
  * language-ID and quality scoring. Public-pattern reference: the fix
  * pipeline of the ftfy tool and the normalization front of CCNet.
  */
object TextFixKernels {

  /** Unicode NFC normalization. Fast path: `isNormalized` is a scan with
    * no allocation, and real corpora are overwhelmingly already-NFC.
    */
  def nfc(s: UTF8String): UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }

  /** char → the CP1252 byte that decodes to it, for bytes 0x80..0xFF
    * (Java's windows-1252 maps the five undefined positions to their C1
    * controls, so the table is total and bijective on this range).
    */
  private val cp1252Inverse: Array[Int] = {
    val inv = Array.fill(0x10000)(-1)
    val cs = java.nio.charset.Charset.forName("windows-1252")
    var b = 0x80
    while (b <= 0xFF) {
      val ch = new String(Array(b.toByte), cs).charAt(0)
      inv(ch.toInt) = b
      b += 1
    }
    inv
  }

  /** Repair UTF-8-bytes-decoded-as-CP1252 mojibake, conservatively:
    * each maximal run of characters that CP1252 could have produced from
    * high bytes is mapped back to those bytes and strictly re-decoded as
    * UTF-8 — the run is replaced ONLY if the whole run decodes (all-or-
    * nothing per run, so a lone genuine 'é', or mixed legitimate Latin-1
    * prose, is never touched: its byte run is not valid UTF-8). Single
    * pass; doubly-encoded text needs two applications. ASCII is identity.
    */
  def fixMojibake(s: UTF8String): UTF8String = {
    val str = s.toString
    val n = str.length
    var i = 0
    var suspicious = false
    while (i < n && !suspicious) {
      suspicious = cp1252Inverse(str.charAt(i).toInt) >= 0
      i += 1
    }
    if (!suspicious) return s
    val out = new java.lang.StringBuilder(n)
    val dec = java.nio.charset.StandardCharsets.UTF_8.newDecoder()
      .onMalformedInput(java.nio.charset.CodingErrorAction.REPORT)
      .onUnmappableCharacter(java.nio.charset.CodingErrorAction.REPORT)
    i = 0
    while (i < n) {
      val c = str.charAt(i)
      if (cp1252Inverse(c.toInt) < 0) {
        out.append(c)
        i += 1
      } else {
        var j = i
        while (j < n && cp1252Inverse(str.charAt(j).toInt) >= 0) j += 1
        val run = str.substring(i, j)
        // a single high char can never be a complete multi-byte sequence
        if (j - i < 2) out.append(run)
        else {
          val bytes = new Array[Byte](j - i)
          var k = 0
          while (k < j - i) {
            bytes(k) = cp1252Inverse(str.charAt(i + k).toInt).toByte
            k += 1
          }
          try {
            dec.reset()
            out.append(dec.decode(java.nio.ByteBuffer.wrap(bytes)).toString)
          } catch {
            case _: java.nio.charset.CharacterCodingException => out.append(run)
          }
        }
        i = j
      }
    }
    UTF8String.fromString(out.toString)
  }

  /** The corruption [[fixMojibake]] inverts — UTF-8 bytes decoded as
    * CP1252. Fixture/test helper (and documentation of the model).
    */
  def mojibake(s: String): String =
    new String(s.getBytes(java.nio.charset.StandardCharsets.UTF_8),
      java.nio.charset.Charset.forName("windows-1252"))
}

/** `graft_nfc(text)` — Unicode NFC normalization ([[TextFixKernels]]). */
case class NfcNormalize(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_nfc"

  override protected def nullSafeEval(input: Any): Any =
    TextFixKernels.nfc(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, t =>
      s"${ev.value} = graft.functions.TextFixKernels.nfc($t);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `graft_fix_mojibake(text)` — CP1252-mojibake repair ([[TextFixKernels]]). */
case class FixMojibake(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_fix_mojibake"

  override protected def nullSafeEval(input: Any): Any =
    TextFixKernels.fixMojibake(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, t =>
      s"${ev.value} = graft.functions.TextFixKernels.fixMojibake($t);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Charset-aware byte decoding behind `graft_decode(bin, charset)` —
  * the crawl loop's body decode. `CAST(body AS STRING)` assumes UTF-8;
  * a real crawl is ~10-15% legacy-charset pages (ISO-8859-1,
  * Windows-1252, Shift_JIS, …) whose bytes CAST garbles irreversibly,
  * poisoning extraction, language-ID and every downstream hash. Spark's
  * builtin `decode(bin, charset)` takes a LITERAL charset only — the
  * crawl's charset is a per-row column (the `Content-Type` header), so
  * this is a per-row kernel: charset objects cached per label
  * (`Charset.forName` per row would dominate), WHATWG-ish label
  * aliases Java lacks normalized, unknown/unsupported labels fall back
  * to UTF-8 (the browser default), malformed/unmappable input decodes
  * to U+FFFD (browser semantics — deterministic, never throws).
  */
object CharsetKernels {

  private val Utf8 = java.nio.charset.StandardCharsets.UTF_8
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[String, java.nio.charset.Charset]()

  // The label is ATTACKER-CONTROLLED (a Content-Type parameter):
  // adversarial pages minting unique charset= tokens must not grow
  // executor memory without bound over a long crawl (r16 ADVICE).
  // Labels over the length cap skip the CACHE (not resolution: they
  // still resolve via canonOf, uncached — the real IANA name
  // Extended_UNIX_Code_Packed_Format_for_Japanese is 45 chars and must
  // decode as EUC-JP, not forced-UTF-8 mojibake; r17 ADVICE), and the
  // cache itself is size-capped: on overflow, unknown labels fall
  // back to UTF-8 uncached (correctness unchanged, lookup just loses
  // its memoization for the junk tail).
  private val MaxLabelLen = 40
  private val MaxCacheSize = 1024

  private def canonOf(k: String): java.nio.charset.Charset = {
    val canon = k match {
      case "latin-1" | "latin1" | "l1" | "iso8859-1" => "ISO-8859-1"
      case "unicode-1-1-utf-8" | "x-utf-8" => "UTF-8"
      case "win-1252" | "x-cp1252" => "windows-1252"
      case other => other
    }
    try java.nio.charset.Charset.forName(canon)
    catch { case _: Exception => Utf8 }
  }

  private def resolve(label: String): java.nio.charset.Charset = {
    val key = label.trim.toLowerCase(java.util.Locale.ROOT)
    if (key.isEmpty || key == "utf-8" || key == "utf8") Utf8
    else if (key.length > MaxLabelLen) canonOf(key)
    else {
      val hit = cache.get(key)
      if (hit != null) hit
      else {
        val cs = canonOf(key)
        if (cache.size < MaxCacheSize) cache.putIfAbsent(key, cs): Unit
        cs
      }
    }
  }

  def decode(bytes: Array[Byte], label: UTF8String): UTF8String = {
    val cs = resolve(label.toString)
    if (cs eq Utf8) {
      // fast path: already UTF-8 on the wire — one validity scan, no
      // transcode; invalid sequences take the replacing decoder below
      val s = UTF8String.fromBytes(bytes)
      if (s.isValid) return s
    }
    val dec = cs.newDecoder()
      .onMalformedInput(java.nio.charset.CodingErrorAction.REPLACE)
      .onUnmappableCharacter(java.nio.charset.CodingErrorAction.REPLACE)
    UTF8String.fromString(
      dec.decode(java.nio.ByteBuffer.wrap(bytes)).toString)
  }
}

/** `graft_decode(bin, charset)` — see [[CharsetKernels]]. */
case class CharsetDecode(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(BinaryType, StringType)
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_decode"

  override protected def nullSafeEval(b: Any, cs: Any): Any =
    CharsetKernels.decode(b.asInstanceOf[Array[Byte]],
      cs.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (b, cs) =>
      s"${ev.value} = graft.functions.CharsetKernels.decode($b, $cs);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Char-n-gram language-ID scoring kernel behind
  * `graft_ngram_lang_scores(text, vocab, weights, defaults)` — the
  * trained-profile counterpart of [[MarkerCounter]]: one code-point walk
  * over the raw text, one map probe per character BIGRAM, integer score
  * accumulation per language. Grams in the trained vocabulary add that
  * language's quantized log-probability weight; out-of-vocabulary grams
  * add the language's smoothing default. All-integer arithmetic (the
  * weights are bit-quantized at train time, [[graft.text.CharNgramLangId]])
  * makes the scores engine- and summation-order-independent — a DuckDB
  * recompute agrees EXACTLY, no float rounding protocol needed.
  *
  * Code points, not UTF-16 units: the byte walk uses UTF-8 lead-byte
  * widths, so CJK text (3-byte chars) grams identically to how SQL
  * `substr` (both Spark and DuckDB count code points) would build them.
  */
object NgramLangScorer {

  def buildIndex(vocab: Seq[String]): java.util.HashMap[UTF8String, Integer] = {
    val m = new java.util.HashMap[UTF8String, Integer](vocab.length * 2)
    vocab.zipWithIndex.foreach { case (g, i) =>
      m.put(UTF8String.fromString(g), Integer.valueOf(i))
    }
    m
  }

  def score(text: UTF8String, index: java.util.HashMap[UTF8String, Integer],
      weights: Array[Array[Long]], defaults: Array[Long]): ArrayData = {
    val bytes = text.getBytes
    val nLangs = weights.length
    val scores = new Array[Long](nLangs)
    var prev = -1 // byte offset of the previous code point's first byte
    var i = 0
    while (i < bytes.length) {
      val w = UTF8String.numBytesForFirstByte(bytes(i))
      val end = math.min(i + w, bytes.length) // clamp malformed tails
      if (prev >= 0) {
        val gram = UTF8String.fromBytes(bytes, prev, end - prev)
        val idx = index.get(gram)
        var l = 0
        if (idx == null) {
          while (l < nLangs) { scores(l) += defaults(l); l += 1 }
        } else {
          val k = idx.intValue()
          while (l < nLangs) { scores(l) += weights(l)(k); l += 1 }
        }
      }
      prev = i
      i = end
    }
    new GenericArrayData(scores)
  }
}

case class NgramLangScores(child: Expression, vocab: Seq[String],
    weights: Seq[Seq[Long]], defaults: Seq[Long])
    extends UnaryExpression with ExpectsInputTypes {
  require(weights.length == defaults.length,
    "one weight row and one default per language")
  require(weights.forall(_.length == vocab.length),
    "each language's weight row must align with the vocabulary")

  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_ngram_lang_scores"

  @transient private lazy val index = NgramLangScorer.buildIndex(vocab)
  @transient private lazy val wArr = weights.map(_.toArray).toArray
  @transient private lazy val dArr = defaults.toArray

  override protected def nullSafeEval(input: Any): Any =
    NgramLangScorer.score(input.asInstanceOf[UTF8String], index, wArr, dArr)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, t => {
      val idxRef = ctx.addReferenceObj("ngramIdx", index,
        classOf[java.util.HashMap[_, _]].getName)
      val wRef = ctx.addReferenceObj("ngramW", wArr, "long[][]")
      val dRef = ctx.addReferenceObj("ngramD", dArr, "long[]")
      s"${ev.value} = graft.functions.NgramLangScorer.score($t, " +
        s"(java.util.HashMap) $idxRef, (long[][]) $wRef, (long[]) $dRef);"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Width-`w` CHARACTER-window hashes of a string — the primitive behind
  * exact-substring deduplication ([[graft.dedup.ExactSubstr]]; the
  * Spark-first realization of the ExactSubstr side of Lee et al. 2021,
  * "Deduplicating Training Data Makes Language Models Better", which the
  * original implements with a suffix array on one machine).
  *
  * One byte scan finds the code-point start offsets (a UTF-8 continuation
  * byte is >= 0x80, so positions are CHARACTER positions — the same unit
  * DuckDB's `substr`/`length` count, which is what makes the oracle's
  * string-equality recompute land on identical window boundaries); each
  * window hashes its UTF-8 byte range with seed-42 XXH64 (byte equality
  * <=> string equality, so hash-grouping equals window-text grouping up
  * to 64-bit collisions — over-MARK-only polarity, P ~ n_windows^2/2^65:
  * ~1e-8 at the sf0.1 corpus' ~1.3M windows).
  *
  * `every` = 1 emits ALL windows (the oracle-exact mode: one row per
  * character — the shuffle is corpus-chars x 16 bytes after explode).
  * `every` = k > 1 emits the WINNOWING selection (Schleimer et al. 2003):
  * the rightmost-minimal hash of every k consecutive windows, deduped —
  * ~2/(k+1) of the rows with a GUARANTEE (not a probability): any two
  * identical substrings of length >= w + k - 1 select at least one
  * identical fingerprint, so duplicated-span DETECTION stays exact for
  * spans >= w + k - 1 and only the reported span BOUNDARIES loosen by
  * < k characters per side (ExactSubstrSpec pins the containment/
  * coverage contract differentially against every=1).
  */
object CharWindowHasher {
  def windows(text: UTF8String, w: Int, every: Int): ArrayData = {
    val base = text.getBaseObject
    val off = text.getBaseOffset
    val len = text.numBytes()
    // char start byte-offsets (+ sentinel at len)
    var nChars = 0
    var b = 0
    while (b < len) {
      if ((text.getByte(b) & 0xc0) != 0x80) nChars += 1
      b += 1
    }
    val m = nChars - w + 1
    if (m <= 0) return new GenericArrayData(Array.empty[Any])
    val starts = new Array[Int](nChars + 1)
    var c = 0
    b = 0
    while (b < len) {
      if ((text.getByte(b) & 0xc0) != 0x80) { starts(c) = b; c += 1 }
      b += 1
    }
    starts(nChars) = len
    val hs = new Array[Long](m)
    var i = 0
    while (i < m) {
      val s = starts(i)
      hs(i) = XXH64.hashUnsafeBytes(base, off + s, starts(i + w) - s, 42L)
      i += 1
    }
    val rows: Array[Any] =
      if (every <= 1) {
        val out = new Array[Any](m)
        i = 0
        while (i < m) {
          out(i) = new org.apache.spark.sql.catalyst.expressions
            .GenericInternalRow(Array[Any](i + 1, hs(i)))
          i += 1
        }
        out
      } else {
        // winnowing: rightmost min per k-window via a monotonic deque
        // (pop-while->=" keeps the RIGHTMOST minimal — the original
        // tie-break, which makes selection position-consistent inside
        // any shared substring); consecutive duplicate selections
        // collapse. m < k degenerates to one global selection.
        val k = math.min(every, m)
        val dq = new Array[Int](m)
        var head = 0
        var tail = 0 // exclusive
        val sel = new scala.collection.mutable.ArrayBuffer[Int](m / k + 1)
        i = 0
        while (i < m) {
          while (tail > head && hs(dq(tail - 1)) >= hs(i)) tail -= 1
          dq(tail) = i; tail += 1
          if (head < tail && dq(head) <= i - k) head += 1
          if (i >= k - 1) {
            val pick = dq(head)
            if (sel.isEmpty || sel(sel.length - 1) != pick) sel += pick
          }
          i += 1
        }
        sel.map(p => new org.apache.spark.sql.catalyst.expressions
          .GenericInternalRow(Array[Any](p + 1, hs(p))): Any).toArray
      }
    new GenericArrayData(rows)
  }
}

/** `graft_char_windows(text, w, every)` → array<struct<pos:int,h:bigint>>
  * — see [[CharWindowHasher]]. `pos` is the 1-based CHARACTER position of
  * the window start (the unit `substring`/DuckDB `substr` count).
  */
case class CharWindowHashes(child: Expression, w: Int, every: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(w >= 1, s"window width must be >= 1, got $w")
  require(every >= 1, s"winnowing step must be >= 1, got $every")
  require(every == 1 || every < w,
    s"winnowing step ($every) must stay under the window width ($w) so " +
      "selected fingerprints of one true span merge into one reported span")

  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("pos", IntegerType, nullable = false),
    StructField("h", LongType, nullable = false))), containsNull = false)
  override def prettyName: String = "graft_char_windows"

  override protected def nullSafeEval(input: Any): Any =
    CharWindowHasher.windows(input.asInstanceOf[UTF8String], w, every)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, t =>
      s"${ev.value} = graft.functions.CharWindowHasher.windows($t, $w, $every);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Character-bigram explode in ONE byte pass — the training-side twin of
  * [[NgramLangScores]]'s code-point walk ([[graft.text.CharNgramLangId]]
  * trains on these). The obvious SQL framing,
  * `transform(sequence(1, len-1), i -> substr(text, i, 2))`, is
  * O(len²): every `substr` re-scans the string from byte 0 to count
  * code points, so a 100 KB document costs ~10¹⁰ byte reads. Here the
  * code-point start offsets are found once (a UTF-8 continuation byte
  * is ≥ 0x80) and each bigram is an O(bigram-bytes) slice of a single
  * materialized byte array — linear in document length, and the same
  * code-point framing the DuckDB oracle rebuilds with `substr`.
  */
object CharBigramsKernel {
  def bigrams(text: UTF8String): ArrayData = {
    val bytes = text.getBytes // one copy; slices below are O(slice)
    val len = bytes.length
    var nChars = 0
    var b = 0
    while (b < len) {
      if ((bytes(b) & 0xc0) != 0x80) nChars += 1
      b += 1
    }
    val m = nChars - 1
    if (m <= 0) return new GenericArrayData(Array.empty[Any])
    val starts = new Array[Int](nChars + 1)
    var c = 0
    b = 0
    while (b < len) {
      if ((bytes(b) & 0xc0) != 0x80) { starts(c) = b; c += 1 }
      b += 1
    }
    starts(nChars) = len
    val out = new Array[Any](m)
    var i = 0
    while (i < m) {
      out(i) = UTF8String.fromBytes(bytes, starts(i), starts(i + 2) - starts(i))
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** `graft_char_bigrams(text)` → array<string> — see
  * [[CharBigramsKernel]]. Empty array below two code points; null in,
  * null out.
  */
case class CharBigrams(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_char_bigrams"

  override protected def nullSafeEval(input: Any): Any =
    CharBigramsKernel.bigrams(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, t =>
      s"${ev.value} = graft.functions.CharBigramsKernel.bigrams($t);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Aho–Corasick multi-pattern scanner — the blocklist primitive
  * ([[graft.text.Blocklist]]): ONE automaton pass per document finds
  * every occurrence of every pattern (O(bytes + hits)), where the naive
  * plan is |patterns| `instr`/regex passes over the corpus — the
  * difference between 1× and 10⁴× scan cost for a real bad-phrase list.
  *
  * Matching is BYTE-level over UTF-8 (self-synchronizing: byte equality
  * ⟺ string equality, and a match can never start or end inside a
  * multi-byte char). Counting is leftmost-greedy NON-overlapping per
  * pattern — exactly `replace(text, p, '')` arithmetic, which is what
  * lets DuckDB recompute every count with strlen/replace: occurrences
  * arrive in end-position order, and one [start > lastEnd] check per hit
  * replays the left-to-right take-and-jump scan (fixed pattern length
  * makes earliest-end ≡ earliest-start).
  *
  * The goto function is flattened to a full DFA over a dense
  * state×256 int array at build time (fail links resolved once, so the
  * scan loop is two array reads per byte). Dense is right for
  * dictionary-scale lists (1k × 20-byte patterns ≈ 20k states × 256 ×
  * 4 B ≈ 20 MB — broadcast-variable territory, built once per executor);
  * a production 10⁵-phrase list (~2M states, ~2 GB dense) would switch
  * this layout to a double-array (base/check) trie — same automaton,
  * ~100× smaller.
  *
  * Tasks deserialize this object from the plan's reference array, so an
  * instance-local lazy would rebuild the DFA on EVERY task — at 20 MB a
  * build, that dominates short tasks. The compiled automaton therefore
  * lives in an executor-global cache keyed by the pattern-list content
  * ([[AhoCorasick.compile]]): every task of every query sharing the
  * blocklist reuses one build per JVM.
  */
object AhoCorasick {
  /** content-keyed executor-global DFA cache; bounded by EVICT-ONE (a
    * JVM sees a handful of distinct blocklists). Not clear-on-overflow —
    * under 32 concurrent tasks a full clear stampedes every in-flight
    * blocklist into a simultaneous rebuild — and not insert-reject
    * either: a long-lived executor whose cache filled with old lists
    * would then rebuild every NEW blocklist on every task forever.
    * Concurrent evict+insert can transiently overshoot the bound by a
    * few entries; harmless.
    */
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[String, (Array[Int], Array[Array[Int]])]()
  private val MaxCached = 8

  private[functions] def compile(
      patterns: Array[Array[Byte]],
      build: () => (Array[Int], Array[Array[Int]])): (Array[Int], Array[Array[Int]]) = {
    val md = java.security.MessageDigest.getInstance("SHA-256")
    patterns.foreach { p =>
      md.update((p.length >> 24).toByte); md.update((p.length >> 16).toByte)
      md.update((p.length >> 8).toByte); md.update(p.length.toByte)
      md.update(p)
    }
    val key = java.util.Base64.getEncoder.encodeToString(md.digest())
    val hit = cache.get(key)
    if (hit != null) hit
    else {
      if (cache.size >= MaxCached) {
        val victims = cache.keys()
        if (victims.hasMoreElements) cache.remove(victims.nextElement()): Unit
      }
      cache.computeIfAbsent(key, _ => build())
    }
  }
}

class AhoCorasick(pids: Array[Long], patterns: Array[Array[Byte]])
    extends Serializable {
  require(pids.length == patterns.length)
  require(patterns.forall(_.length > 0), "empty blocklist pattern")

  private val nPat = patterns.length
  @transient private lazy val compiled: (Array[Int], Array[Array[Int]]) =
    AhoCorasick.compile(patterns, () => buildDfa())

  private def buildDfa(): (Array[Int], Array[Array[Int]]) = {
    // Dense layout budget, checked loudly BEFORE allocation: the flat
    // transition table is (totalLen+1)*256 ints (~1 KB per pattern byte),
    // so past ~8.3M total pattern bytes the Int multiplication would
    // overflow into a NegativeArraySizeException (and well before that
    // the table stops fitting executor memory). A 10⁵⁺-phrase production
    // list belongs in the double-array (base/check) trie layout the
    // scaladoc describes, not this dense table.
    val totalLen = patterns.map(_.length.toLong).sum
    require(totalLen < Int.MaxValue / 256 - 1,
      s"blocklist too large for the dense DFA layout: $totalLen pattern " +
        s"bytes needs a ${(totalLen + 1) * 256 * 4}-byte transition table " +
        "— switch to a double-array (base/check) trie for lists this size")
    val maxStates = totalLen.toInt + 1
    val next = Array.fill(maxStates * 256)(-1)
    val ownOut = Array.fill(maxStates)(List.empty[Int])
    var nStates = 1
    // trie
    var p = 0
    while (p < nPat) {
      var s = 0
      val bytes = patterns(p)
      var i = 0
      while (i < bytes.length) {
        val c = bytes(i) & 0xff
        if (next(s * 256 + c) == -1) { next(s * 256 + c) = nStates; nStates += 1 }
        s = next(s * 256 + c)
        i += 1
      }
      ownOut(s) = p :: ownOut(s)
      p += 1
    }
    // BFS: fail links resolved INTO the transition table (full DFA) and
    // output lists collapsed through the fail chain
    val fail = new Array[Int](nStates)
    val out = new Array[Array[Int]](nStates)
    out(0) = ownOut(0).toArray
    val queue = new java.util.ArrayDeque[Integer]()
    var c = 0
    while (c < 256) {
      val t = next(c)
      if (t == -1) next(c) = 0
      else { fail(t) = 0; queue.add(t) }
      c += 1
    }
    while (!queue.isEmpty) {
      val s = queue.poll().intValue()
      out(s) = (ownOut(s) ++ out(fail(s))).toArray
      c = 0
      while (c < 256) {
        val t = next(s * 256 + c)
        if (t == -1) next(s * 256 + c) = next(fail(s) * 256 + c)
        else { fail(t) = next(fail(s) * 256 + c); queue.add(t) }
        c += 1
      }
    }
    (next, out)
  }

  /** Per-pattern non-overlapping counts: array<struct<pid:long,n:long>>,
    * patterns with zero hits omitted, ordered by pattern index (stable
    * across rows — pids ship in caller order).
    */
  def scan(text: UTF8String): ArrayData = {
    val (next, out) = compiled
    val counts = new Array[Long](nPat)
    val lastEnd = new Array[Int](nPat)
    java.util.Arrays.fill(lastEnd, -1)
    val len = text.numBytes()
    var s = 0
    var i = 0
    while (i < len) {
      s = next(s * 256 + (text.getByte(i) & 0xff))
      val hits = out(s)
      var j = 0
      while (j < hits.length) {
        val p = hits(j)
        val start = i - patterns(p).length + 1
        if (start > lastEnd(p)) { counts(p) += 1; lastEnd(p) = i }
        j += 1
      }
      i += 1
    }
    var nHit = 0
    var p = 0
    while (p < nPat) { if (counts(p) > 0) nHit += 1; p += 1 }
    val rows = new Array[Any](nHit)
    var k = 0
    p = 0
    while (p < nPat) {
      if (counts(p) > 0) {
        rows(k) = new org.apache.spark.sql.catalyst.expressions
          .GenericInternalRow(Array[Any](pids(p), counts(p)))
        k += 1
      }
      p += 1
    }
    new GenericArrayData(rows)
  }
}

/** `graft_ac_scan(text, pids, patterns)` → array<struct<pid:long,
  * n:long>> — see [[AhoCorasick]]. The pattern arrays ride the plan as
  * literals (a blocklist is dictionary-small); the DFA builds once per
  * executor through the content-keyed [[AhoCorasick.compile]] cache (a
  * plain instance-lazy would rebuild per deserialized task).
  */
case class AcScan(child: Expression, pids: Seq[Long], patterns: Seq[String])
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("pid", LongType, nullable = false),
    StructField("n", LongType, nullable = false))), containsNull = false)
  override def prettyName: String = "graft_ac_scan"

  @transient private lazy val ac = new AhoCorasick(
    pids.toArray,
    patterns.map(_.getBytes(java.nio.charset.StandardCharsets.UTF_8)).toArray)

  override protected def nullSafeEval(input: Any): Any =
    ac.scan(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, t => {
      val acRef = ctx.addReferenceObj("acAutomaton", ac,
        classOf[AhoCorasick].getName)
      s"${ev.value} = $acRef.scan($t);"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
