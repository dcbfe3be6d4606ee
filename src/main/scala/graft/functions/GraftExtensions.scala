package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.{ArrayType, BinaryType, IntegerType, LongType, StringType}

/** SparkSessionExtensions entry point registering the engine's native
  * expressions as SQL functions (`spark.sql.extensions =
  * graft.functions.GraftExtensions`, set by EngineSession). Callers use
  * `functions.call_function("graft_dot", a, b)` — public API end to end.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    // The engine's custom whole-operator plans (currently the native
    // as-of join — graft.plans.AsOfJoinPlan → AsOfJoinExec /
    // BroadcastAsOfJoinExec) plus the optimizer rule that lets filters
    // push through the custom node down to the scan.
    ext.injectPlannerStrategy(_ => graft.plans.GraftStrategies)
    ext.injectOptimizerRule(_ => graft.plans.PushFilterThroughAsOfJoin)

    ext.injectFunction((
      FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
      (children: Seq[Expression]) => {
        require(children.length == 2, "graft_dot(arrayA, arrayB)")
        DotProduct(children(0), children(1))
      }))

    ext.injectFunction((
      FunctionIdentifier("graft_simhash64"),
      new ExpressionInfo(classOf[SimHash64].getName, "graft_simhash64"),
      (children: Seq[Expression]) => {
        require(children.length == 1, "graft_simhash64(tokens)")
        SimHash64(children.head)
      }))

    ext.injectFunction((
      FunctionIdentifier("graft_cell_argmin"),
      new ExpressionInfo(classOf[CellArgmin].getName, "graft_cell_argmin"),
      (children: Seq[Expression]) => {
        require(children.length == 2, "graft_cell_argmin(vector, centroidTable)")
        CellArgmin(children(0), children(1))
      }))

    ext.injectFunction((
      FunctionIdentifier("graft_cell_topk"),
      new ExpressionInfo(classOf[CellTopCells].getName, "graft_cell_topk"),
      (children: Seq[Expression]) => children match {
        case Seq(v, table, Literal(n: Int, IntegerType)) =>
          CellTopCells(v, table, n)
        case _ => throw new IllegalArgumentException(
          "graft_cell_topk(vector, centroidTable, nProbe) with a literal int nProbe")
      }))

    ext.injectFunction((
      FunctionIdentifier("graft_shingle_set"),
      new ExpressionInfo(classOf[ShingleHashes].getName, "graft_shingle_set"),
      (children: Seq[Expression]) => children match {
        case Seq(text, Literal(w: Int, IntegerType)) => ShingleHashes(text, w)
        case _ => throw new IllegalArgumentException(
          "graft_shingle_set(text, w) with literal int w")
      }))

    ext.injectFunction((
      FunctionIdentifier("graft_tokens"),
      new ExpressionInfo(classOf[WhitespaceTokens].getName, "graft_tokens"),
      (children: Seq[Expression]) => {
        require(children.length == 1, "graft_tokens(text)")
        WhitespaceTokens(children.head)
      }))

    ext.injectFunction((
      FunctionIdentifier("graft_band_buckets"),
      new ExpressionInfo(classOf[BandBuckets].getName, "graft_band_buckets"),
      (children: Seq[Expression]) => children match {
        case Seq(sig, Literal(b: Int, IntegerType), Literal(r: Int, IntegerType)) =>
          BandBuckets(sig, b, r)
        case _ => throw new IllegalArgumentException(
          "graft_band_buckets(sig, bands, rows) with literal int bands/rows")
      }))

    ext.injectFunction((
      FunctionIdentifier("graft_tokens_in_set"),
      new ExpressionInfo(classOf[TokensInSet].getName, "graft_tokens_in_set"),
      (children: Seq[Expression]) => children match {
        case Seq(toks, Literal(arr: org.apache.spark.sql.catalyst.util.ArrayData,
            org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.StringType, _))) =>
          TokensInSet(toks,
            (0 until arr.numElements()).map(i => arr.getUTF8String(i).toString))
        case _ => throw new IllegalArgumentException(
          "graft_tokens_in_set(tokens, words) with a literal string-array words")
      }))

    ext.injectFunction((
      FunctionIdentifier("graft_bpe_tokens"),
      new ExpressionInfo(classOf[BpeTokens].getName, "graft_bpe_tokens"),
      (children: Seq[Expression]) => children match {
        case Seq(text, Literal(arr: org.apache.spark.sql.catalyst.util.ArrayData,
            ArrayType(StringType, _))) =>
          BpeTokens(text,
            (0 until arr.numElements()).map(i => arr.getUTF8String(i).toString))
        case _ => throw new IllegalArgumentException(
          "graft_bpe_tokens(text, merges) with a literal string-array of " +
            "rank-ordered 'left right' merges")
      }))

    ext.injectFunction((
      FunctionIdentifier("graft_hash_logit"),
      new ExpressionInfo(classOf[HashedLogitScore].getName, "graft_hash_logit"),
      (children: Seq[Expression]) => children match {
        case Seq(text, Literal(arr: org.apache.spark.sql.catalyst.util.ArrayData,
            ArrayType(org.apache.spark.sql.types.DoubleType, _)),
            Literal(bias: Double, org.apache.spark.sql.types.DoubleType)) =>
          HashedLogitScore(text, arr.toDoubleArray().toSeq, bias)
        case _ => throw new IllegalArgumentException(
          "graft_hash_logit(text, weights, bias) with a literal double-array " +
            "weights and literal double bias")
      }))

    ext.injectFunction((
      FunctionIdentifier("graft_topk"),
      new ExpressionInfo(classOf[TopKByScore].getName, "graft_topk"),
      (children: Seq[Expression]) => children match {
        case Seq(score, payload, Literal(k: Int, IntegerType)) =>
          TopKByScore(score, payload, k)
        case _ => throw new IllegalArgumentException(
          "graft_topk(score, payload, k) with literal int k")
      }))

    ext.injectFunction((
      FunctionIdentifier("graft_minhash"),
      new ExpressionInfo(classOf[MinHashSignature].getName, "graft_minhash"),
      (children: Seq[Expression]) => children match {
        case Seq(arr, Literal(k: Int, IntegerType)) => MinHashSignature(arr, k)
        case _ => throw new IllegalArgumentException(
          "graft_minhash(shingleHashes, k) with literal int k")
      }))

    ext.injectFunction((
      FunctionIdentifier("graft_wordpiece"),
      new ExpressionInfo(classOf[WordPieceTokens].getName, "graft_wordpiece"),
      (children: Seq[Expression]) => children match {
        case Seq(text, Literal(arr: org.apache.spark.sql.catalyst.util.ArrayData,
            ArrayType(StringType, _))) =>
          WordPieceTokens(text,
            (0 until arr.numElements()).map(i => arr.getUTF8String(i).toString))
        case _ => throw new IllegalArgumentException(
          "graft_wordpiece(text, vocab) with a literal string-array vocab")
      }))

    ext.injectFunction((
      FunctionIdentifier("graft_bloom_contains"),
      new ExpressionInfo(classOf[BloomMightContain].getName, "graft_bloom_contains"),
      (children: Seq[Expression]) => children match {
        case Seq(key, Literal(bytes: Array[Byte], BinaryType)) =>
          BloomMightContain(key, bytes)
        case _ => throw new IllegalArgumentException(
          "graft_bloom_contains(key, bloomBytes) with a literal binary " +
            "serialized org.apache.spark.util.sketch.BloomFilter")
      }))

    ext.injectFunction((
      FunctionIdentifier("graft_lang_scores"),
      new ExpressionInfo(classOf[LangScores].getName, "graft_lang_scores"),
      (children: Seq[Expression]) => children match {
        case Seq(text, Literal(arr: org.apache.spark.sql.catalyst.util.ArrayData,
            ArrayType(ArrayType(StringType, _), _))) =>
          LangScores(text,
            (0 until arr.numElements()).map { i =>
              val inner = arr.getArray(i)
              (0 until inner.numElements()).map(j => inner.getUTF8String(j).toString)
            })
        case _ => throw new IllegalArgumentException(
          "graft_lang_scores(text, sets) with a literal array-of-string-arrays sets")
      }))

    ext.injectFunction((
      FunctionIdentifier("graft_ngram_lang_scores"),
      new ExpressionInfo(classOf[NgramLangScores].getName, "graft_ngram_lang_scores"),
      (children: Seq[Expression]) => children match {
        case Seq(text,
            Literal(vs: org.apache.spark.sql.catalyst.util.ArrayData,
              ArrayType(StringType, _)),
            Literal(ws: org.apache.spark.sql.catalyst.util.ArrayData,
              ArrayType(ArrayType(LongType, _), _)),
            Literal(ds: org.apache.spark.sql.catalyst.util.ArrayData,
              ArrayType(LongType, _))) =>
          NgramLangScores(text,
            (0 until vs.numElements()).map(i => vs.getUTF8String(i).toString),
            (0 until ws.numElements()).map(i => ws.getArray(i).toLongArray().toSeq),
            ds.toLongArray().toSeq)
        case _ => throw new IllegalArgumentException(
          "graft_ngram_lang_scores(text, vocab, weights, defaults) with " +
            "literal string vocab, long-array-per-language weights, and " +
            "long defaults")
      }))

    // graft_viterbi / graft_viterbi_stats share one (pieces, weights)
    // literal-unpacking shape.
    def viterbiArgs(children: Seq[Expression]): Option[(Expression, Seq[String], Seq[Long])] =
      children match {
        case Seq(text,
            Literal(ps: org.apache.spark.sql.catalyst.util.ArrayData,
              ArrayType(StringType, _)),
            Literal(ws: org.apache.spark.sql.catalyst.util.ArrayData,
              ArrayType(LongType, _))) =>
          Some((text,
            (0 until ps.numElements()).map(i => ps.getUTF8String(i).toString),
            (0 until ws.numElements()).map(ws.getLong)))
        case _ => None
      }

    ext.injectFunction((
      FunctionIdentifier("graft_viterbi"),
      new ExpressionInfo(classOf[ViterbiTokens].getName, "graft_viterbi"),
      (children: Seq[Expression]) => viterbiArgs(children) match {
        case Some((text, ps, ws)) => ViterbiTokens(text, ps, ws)
        case None => throw new IllegalArgumentException(
          "graft_viterbi(text, pieces, weights) with literal string/long arrays")
      }))

    ext.injectFunction((
      FunctionIdentifier("graft_viterbi_stats"),
      new ExpressionInfo(classOf[ViterbiStats].getName, "graft_viterbi_stats"),
      (children: Seq[Expression]) => viterbiArgs(children) match {
        case Some((text, ps, ws)) => ViterbiStats(text, ps, ws)
        case None => throw new IllegalArgumentException(
          "graft_viterbi_stats(text, pieces, weights) with literal string/long arrays")
      }))

    ext.injectFunction((
      FunctionIdentifier("graft_vec_add"),
      new ExpressionInfo(classOf[VecElementwise].getName, "graft_vec_add"),
      (children: Seq[Expression]) => {
        require(children.length == 2, "graft_vec_add(arrayA, arrayB)")
        VecElementwise(children(0), children(1), subtract = false)
      }))

    ext.injectFunction((
      FunctionIdentifier("graft_vec_sub"),
      new ExpressionInfo(classOf[VecElementwise].getName, "graft_vec_sub"),
      (children: Seq[Expression]) => {
        require(children.length == 2, "graft_vec_sub(arrayA, arrayB)")
        VecElementwise(children(0), children(1), subtract = true)
      }))

    ext.injectFunction((
      FunctionIdentifier("graft_deflate_len"),
      new ExpressionInfo(classOf[DeflateLen].getName, "graft_deflate_len"),
      (children: Seq[Expression]) => {
        require(children.length == 1, "graft_deflate_len(text)")
        DeflateLen(children.head)
      }))

    ext.injectFunction((
      FunctionIdentifier("graft_nfc"),
      new ExpressionInfo(classOf[NfcNormalize].getName, "graft_nfc"),
      (children: Seq[Expression]) => {
        require(children.length == 1, "graft_nfc(text)")
        NfcNormalize(children.head)
      }))

    ext.injectFunction((
      FunctionIdentifier("graft_fix_mojibake"),
      new ExpressionInfo(classOf[FixMojibake].getName, "graft_fix_mojibake"),
      (children: Seq[Expression]) => {
        require(children.length == 1, "graft_fix_mojibake(text)")
        FixMojibake(children.head)
      }))

    ext.injectFunction((
      FunctionIdentifier("graft_decode"),
      new ExpressionInfo(classOf[CharsetDecode].getName, "graft_decode"),
      (children: Seq[Expression]) => children match {
        case Seq(bin, charset) => CharsetDecode(bin, charset)
        case _ => throw new IllegalArgumentException(
          "graft_decode(bin, charset)")
      }))

    ext.injectFunction((
      FunctionIdentifier("graft_html_text"),
      new ExpressionInfo(classOf[HtmlExtractText].getName, "graft_html_text"),
      (children: Seq[Expression]) => children match {
        case Seq(html, Literal(minChars: Int, IntegerType),
            Literal(maxLinkPct: Int, IntegerType)) =>
          HtmlExtractText(html, minChars, maxLinkPct)
        case _ => throw new IllegalArgumentException(
          "graft_html_text(html, minChars, maxLinkPct) with literal int thresholds")
      }))

    ext.injectFunction((
      FunctionIdentifier("graft_char_windows"),
      new ExpressionInfo(classOf[CharWindowHashes].getName, "graft_char_windows"),
      (children: Seq[Expression]) => children match {
        case Seq(text, Literal(w: Int, IntegerType), Literal(e: Int, IntegerType)) =>
          CharWindowHashes(text, w, e)
        case _ => throw new IllegalArgumentException(
          "graft_char_windows(text, width, every) with literal int width/every")
      }))

    ext.injectFunction((
      FunctionIdentifier("graft_char_bigrams"),
      new ExpressionInfo(classOf[CharBigrams].getName, "graft_char_bigrams"),
      (children: Seq[Expression]) => children match {
        case Seq(text) => CharBigrams(text)
        case _ => throw new IllegalArgumentException(
          "graft_char_bigrams(text)")
      }))

    ext.injectFunction((
      FunctionIdentifier("graft_ac_scan"),
      new ExpressionInfo(classOf[AcScan].getName, "graft_ac_scan"),
      (children: Seq[Expression]) => children match {
        case Seq(text,
            Literal(ps: org.apache.spark.sql.catalyst.util.ArrayData,
              ArrayType(LongType, _)),
            Literal(pats: org.apache.spark.sql.catalyst.util.ArrayData,
              ArrayType(StringType, _))) =>
          AcScan(text,
            (0 until ps.numElements()).map(ps.getLong),
            (0 until pats.numElements()).map(i => pats.getUTF8String(i).toString))
        case _ => throw new IllegalArgumentException(
          "graft_ac_scan(text, pids, patterns) with literal long/string arrays")
      }))
  }
}
