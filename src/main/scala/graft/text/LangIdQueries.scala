package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver-contract queries for [[CharNgramLangId]] — the trainable
  * char-bigram language-ID profiles (q228 training contract, q229
  * frozen-profile scoring) — and the Curation encoding-hygiene
  * composite (q230).
  *
  * The labeled fixture corpus is SYNTHESIZED deterministically from
  * `documents.doc_id` alone (the q93/q94 seeded-fixture discipline):
  * six language cohorts (doc_id % 6) — four Latin languages built from
  * 12-word characteristic vocabularies, plus Chinese (CJK Unified
  * Ideographs) and Japanese (hiragana) built by code-point arithmetic,
  * with NO whitespace (the case word-marker language ID cannot touch
  * and char-n-grams exist for). Every byte is reproducible in DuckDB
  * with `range`/`substr`/`chr`, so training weights AND scores get full
  * relational oracles — the integer-quantized model makes the compare
  * exact, with no float protocol.
  */
object LangIdQueries {

  /** Sorted language codes; cohort k (doc_id % 6) uses `FixLangs(k)`. */
  val FixLangs: Seq[String] = Seq("de", "en", "es", "fr", "ja", "zh")

  /** 12 characteristic words per Latin language (ASCII only — the
    * fixture must be byte-identical however the source file is edited).
    */
  val LatinVocab: Map[String, Seq[String]] = Map(
    "de" -> Seq("der", "und", "nicht", "sich", "auch", "wenn", "aber",
      "nach", "wird", "beim", "doch", "jetzt"),
    "en" -> Seq("the", "and", "with", "that", "have", "this", "from",
      "they", "know", "want", "been", "good"),
    "es" -> Seq("los", "una", "para", "pero", "como", "usted", "todos",
      "desde", "hasta", "cuando", "entre", "sobre"),
    "fr" -> Seq("les", "une", "dans", "pour", "avec", "vous", "mais",
      "nous", "comme", "bien", "sans", "leurs"))

  /** CJK alphabets as single-character strings — Spark's `chr()` is
    * ASCII-mod-256, so code points are materialized here and indexed
    * with `element_at`; DuckDB's `chr()` IS code-point-based and the
    * oracles use it directly.
    */
  private val ZhAlphabet: Seq[String] =
    (0 until 256).map(i => new String(Character.toChars(0x4E00 + i)))
  private val JaAlphabet: Seq[String] =
    (0 until 80).map(i => new String(Character.toChars(0x3041 + i)))

  private def docs(s: SparkSession, dir: String): DataFrame =
    graft.sources.Tables.load(s, dir, "documents")

  /** The labeled corpus: one synthesized doc per documents row. */
  def fixtureCorpus(s: SparkSession, dir: String): DataFrame = {
    val id = col("doc_id")
    def latin(lang: String) = array_join(
      transform(sequence(lit(1), lit(40)),
        i => element_at(typedlit(LatinVocab(lang)),
          ((id * 7 + i * 13) % 12 + 1).cast("int"))), " ")
    def cjk(alphabet: Seq[String], mod: Int, a: Int, b: Int) = concat_ws("",
      transform(sequence(lit(1), lit(120)),
        i => element_at(typedlit(alphabet),
          ((id * a + i * b) % mod + 1).cast("int"))))
    docs(s, dir).select(
      id,
      element_at(typedlit(FixLangs), (id % 6 + 1).cast("int")).as("lang"),
      when(id % 6 === 0, latin("de"))
        .when(id % 6 === 1, latin("en"))
        .when(id % 6 === 2, latin("es"))
        .when(id % 6 === 3, latin("fr"))
        .when(id % 6 === 4, cjk(JaAlphabet, 80, 29, 11))
        .otherwise(cjk(ZhAlphabet, 256, 31, 17)).as("text"))
  }

  /** DuckDB mirror of [[fixtureCorpus]]. */
  private val corpusSql: String = {
    def latin(lang: String) = {
      val words = LatinVocab(lang).map(w => s"'$w'").mkString(", ")
      s"array_to_string(list_transform(range(1, 41), i -> ([$words])[" +
        s"((doc_id * 7 + i * 13) % 12)::INT + 1]), ' ')"
    }
    def cjk(base: Int, mod: Int, a: Int, b: Int) =
      s"array_to_string(list_transform(range(1, 121), i -> chr($base + " +
        s"((doc_id * $a + i * $b) % $mod)::INT)), '')"
    s"""corpus AS (
       |  SELECT doc_id,
       |    (['de','en','es','fr','ja','zh'])[(doc_id % 6)::INT + 1] AS lang,
       |    CASE (doc_id % 6)::INT
       |      WHEN 0 THEN ${latin("de")}
       |      WHEN 1 THEN ${latin("en")}
       |      WHEN 2 THEN ${latin("es")}
       |      WHEN 3 THEN ${latin("fr")}
       |      WHEN 4 THEN ${cjk(0x3041, 80, 29, 11)}
       |      ELSE ${cjk(0x4E00, 256, 31, 17)} END AS text
       |  FROM documents)""".stripMargin
  }

  /** DuckDB recompute of the trained model: bigram counts, per-language
    * totals, global vocab size, top-64 profiles (count desc, gram asc),
    * dense union-vocab weights via the exact integer-bit quantization
    * (`length(bin(x)) - 1` = ilog2). Ends with CTE `w` carrying one row
    * per (lang, vocab gram).
    */
  private val modelSql: String =
    s"""$corpusSql,
       |g AS (
       |  SELECT lang, substr(text, i, 2) AS gram
       |  FROM (SELECT lang, text, unnest(range(1, length(text))) AS i
       |        FROM corpus WHERE length(text) >= 2)),
       |c AS (SELECT lang, gram, count(*)::BIGINT AS c FROM g GROUP BY 1, 2),
       |n AS (SELECT lang, sum(c)::BIGINT AS n FROM c GROUP BY 1),
       |v AS (SELECT count(DISTINCT gram)::BIGINT AS v FROM c),
       |prof AS (
       |  SELECT lang, gram, c FROM (
       |    SELECT lang, gram, c,
       |      row_number() OVER (PARTITION BY lang ORDER BY c DESC, gram) AS rn
       |    FROM c) WHERE rn <= 64),
       |vocab AS (SELECT DISTINCT gram FROM prof),
       |w AS (
       |  SELECT l.lang, vb.gram,
       |    (length(bin(greatest(((coalesce(p.c, 0) + 1) * 1099511627776)
       |        // (n.n + (SELECT v FROM v)), 1))) - 1)::BIGINT AS weight,
       |    (length(bin(greatest(1099511627776
       |        // (n.n + (SELECT v FROM v)), 1))) - 1)::BIGINT AS default_w,
       |    n.n AS n_grams, (SELECT v FROM v) AS vocab_global
       |  FROM (SELECT DISTINCT lang FROM c) l
       |  CROSS JOIN vocab vb
       |  LEFT JOIN prof p ON p.lang = l.lang AND p.gram = vb.gram
       |  JOIN n ON n.lang = l.lang)""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // TRAINING CONTRACT: the entire learned weight matrix, one row per
    // (language, union-vocab gram) — profile membership, quantized
    // weight, smoothing default, per-language gram totals, and global
    // vocab size are ALL recomputed relationally by DuckDB. A counting,
    // ranking, tie-break, smoothing, or quantization bug anywhere in
    // training is a hash fail, not a "model looks plausible".
    "q228_langid_train" -> { (s, dir) =>
      import s.implicits._
      val model = CharNgramLangId.train(fixtureCorpus(s, dir), "text", "lang")
      val rows = for {
        li <- model.langs.indices
        vi <- model.vocab.indices
      } yield (model.langs(li), model.vocab(vi), model.weights(li)(vi),
        model.defaults(li), model.nGramsByLang(li), model.vocabGlobal)
      s.createDataset(rows)
        .toDF("lang", "gram", "weight", "default_w", "n_grams", "vocab_global")
        .orderBy(col("lang"), col("gram"))
    },

    // FROZEN-PROFILE SCORING through the codegen kernel
    // (graft_ngram_lang_scores): every fixture doc scored in one
    // code-point pass, argmax with sorted-first tie-break. The oracle
    // retrains the identical integer model and replays every per-doc
    // per-language score SUM — exact, because the weights are integer
    // bits. CJK cohorts (no whitespace) ride the same kernel.
    "q229_langid_score" -> { (s, dir) =>
      val corpus = fixtureCorpus(s, dir)
      val model = CharNgramLangId.train(corpus, "text", "lang")
      corpus.select(
        col("doc_id"),
        model.predict(col("text")).as("pred"),
        array_max(model.scores(col("text"))).as("score_pred"),
        (model.predict(col("text")) === col("lang")).as("correct"))
        .orderBy(col("doc_id"))
    },

    // Curation ENCODING-HYGIENE composite: planted NFD-decomposed and
    // CP1252-mojibake twins of real documents must normalize to their
    // originals' exact bytes and collapse in EXACT dedup — the r11/r12
    // verdicts' "corrupted twins must not split dedup groups" contract.
    // Quality gate neutralized (minQuality=0) and near-dup disabled
    // (threshold > 1 verifies nothing) so the composite isolates
    // hygiene → exact-dedup. The oracle normalizes with DuckDB's OWN
    // nfc_normalize + the mirrored mojibake replacement and counts
    // distinct texts.
    "q230_curation_hygiene" -> { (s, dir) =>
      import s.implicits._
      val d = docs(s, dir).select(col("doc_id"), col("text"))
      // built from escapes, never literal glyphs: an editor or VCS
      // normalization pass must not be able to change the fixture bytes
      val eAcute = "\u00e9"
      val nfd = "e\u0301"
      val mojibake = "\u00c3\u00a9"
      val base = d.select(col("doc_id").as("id"),
        concat(col("text"), lit(" caf" + eAcute)).as("text"))
      val nfdTwins = d.filter(col("doc_id") % 10 === 0)
        .select((col("doc_id") + 1000000L).as("id"),
          concat(col("text"), lit(" caf" + nfd)).as("text"))
      val mojiTwins = d.filter(col("doc_id") % 20 === 0)
        .select((col("doc_id") + 3000000L).as("id"),
          concat(col("text"), lit(" caf" + mojibake)).as("text"))
      val corpus = base.unionByName(nfdTwins).unionByName(mojiTwins)
      val (_, r) = Curation.run(corpus, "id", "text",
        minQuality = 0.0, neardupThreshold = 1.01, normalizeText = true)
      Seq((r.input_docs, r.texts_normalized, r.after_quality,
        r.after_exact_dedup, r.after_neardup))
        .toDF("input_docs", "texts_normalized", "after_quality",
          "after_exact_dedup", "after_neardup")
    }
  )

  val oracles: Map[String, String] = Map(
    "q228_langid_train" ->
      s"""WITH $modelSql
         |SELECT lang, gram, weight, default_w, n_grams, vocab_global
         |FROM w ORDER BY lang, gram""".stripMargin,

    "q229_langid_score" ->
      s"""WITH $modelSql,
         |dg AS (
         |  SELECT doc_id, lang, substr(text, i, 2) AS gram
         |  FROM (SELECT doc_id, lang, text,
         |          unnest(range(1, length(text))) AS i
         |        FROM corpus WHERE length(text) >= 2)),
         |ld AS (SELECT DISTINCT lang AS plang, default_w FROM w),
         |sc AS (
         |  SELECT d.doc_id, l.plang,
         |    sum(coalesce(w.weight, l.default_w))::BIGINT AS sc
         |  FROM dg d CROSS JOIN ld l
         |  LEFT JOIN w ON w.lang = l.plang AND w.gram = d.gram
         |  GROUP BY 1, 2),
         |best AS (
         |  SELECT doc_id, plang, sc,
         |    row_number() OVER (PARTITION BY doc_id
         |      ORDER BY sc DESC, plang ASC) AS rn
         |  FROM sc)
         |SELECT c.doc_id, b.plang AS pred, b.sc AS score_pred,
         |  (b.plang = c.lang) AS correct
         |FROM best b JOIN corpus c USING (doc_id)
         |WHERE b.rn = 1 ORDER BY c.doc_id""".stripMargin,

    "q230_curation_hygiene" ->
      """WITH planted AS (
        |  SELECT doc_id AS id, text || ' caf' || chr(233) AS text
        |  FROM documents
        |  UNION ALL
        |  SELECT doc_id + 1000000, text || ' caf' || 'e' || chr(769)
        |  FROM documents WHERE doc_id % 10 = 0
        |  UNION ALL
        |  SELECT doc_id + 3000000, text || ' caf' || chr(195) || chr(169)
        |  FROM documents WHERE doc_id % 20 = 0),
        |norm AS (
        |  SELECT id, text AS raw,
        |    nfc_normalize(replace(text, chr(195) || chr(169), chr(233)))
        |      AS text
        |  FROM planted)
        |SELECT count(*)::BIGINT AS input_docs,
        |  count(*) FILTER (WHERE text <> raw)::BIGINT AS texts_normalized,
        |  count(*)::BIGINT AS after_quality,
        |  count(DISTINCT text)::BIGINT AS after_exact_dedup,
        |  count(DISTINCT text)::BIGINT AS after_neardup
        |FROM norm""".stripMargin
  )
}
