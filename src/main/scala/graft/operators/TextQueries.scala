package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.functions._

/** Text-analysis operators over `documents` (SURVEY.md §2.3): language-ID
  * scoring, quality scoring, token counting, winnowing fingerprints. All
  * ratios are integer-count divisions materialized as one double division
  * each, with identical expression shape in the oracle SQL (same operands,
  * same order → identical IEEE doubles in both engines).
  */
object TextQueries {

  /** THE stop-word list of the quality cut — the one definition the batch
    * queries (text_quality, pipeline_clean_corpus) and the streaming
    * intake ([[graft.streaming.CurationStream]]) all share, so their
    * admit/reject decisions can never silently drift. The oracle SQL
    * hardcodes the same list; drift there fails the driver's hash gate. */
  private[graft] val StopWords = Seq("the", "a", "of", "and", "to", "in", "is")

  /** Marker token lists per language for the n-gram scoring heuristic. */
  private val markers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "to"),
    "de" -> Seq("der", "die", "und", "ist", "das"),
    "fr" -> Seq("le", "la", "et", "les", "des"),
    "es" -> Seq("el", "los", "y", "una", "por"),
    "zh" -> Seq("de", "shi", "zai", "le", "wo"))

  /** Language-ID by marker-token counting: per-language score = number of
    * tokens in that language's marker list; prediction = argmax with
    * first-listed-language tiebreak (deterministic CASE chain). */
  val langId = QueryDef(
    "text_lang_id",
    (spark, dir) => {
      val tok = Tables.documents(spark, dir)
        .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
      val scoreCols = markers.map { case (lang, ms) =>
        sum(when(col("tok").isin(ms: _*), 1).otherwise(0)).as(s"s_$lang")
      }
      val argmax = markers.map(_._1).foldRight(lit("und"): org.apache.spark.sql.Column) {
        case (lang, elseCol) =>
          when(markers.map(_._1).filter(_ != lang).foldLeft(col(s"s_$lang") > 0) {
            // strictly greater than every earlier language, >= every later one
            (acc, other) =>
              if (markers.indexWhere(_._1 == other) <
                markers.indexWhere(_._1 == lang))
                acc && col(s"s_$lang") > col(s"s_$other")
              else acc && col(s"s_$lang") >= col(s"s_$other")
          }, lit(lang)).otherwise(elseCol)
      }
      tok.groupBy(col("doc_id"))
        .agg(scoreCols.head, scoreCols.tail: _*)
        .withColumn("lang_pred", argmax)
    },
    Some {
      val scores = markers.map { case (lang, ms) =>
        val inList = ms.map(m => s"'$m'").mkString(", ")
        s"sum(CASE WHEN tok IN ($inList) THEN 1 ELSE 0 END) AS s_$lang"
      }.mkString(", ")
      val langs = markers.map(_._1)
      val argmax = langs.zipWithIndex.map { case (lang, i) =>
        val conds = (s"s_$lang > 0" +:
          langs.zipWithIndex.filter(_._1 != lang).map { case (other, j) =>
            if (j < i) s"s_$lang > s_$other" else s"s_$lang >= s_$other"
          }).mkString(" AND ")
        s"WHEN $conds THEN '$lang'"
      }.mkString(" ")
      // CAST: sum(INTEGER) yields HUGEINT → float64 through pandas,
      // diverging from Spark's BIGINT in the driver's hash compare.
      s"""
      SELECT doc_id, ${langs.map(l => s"CAST(s_$l AS BIGINT) AS s_$l").mkString(", ")},
             CASE $argmax ELSE 'und' END AS lang_pred
      FROM (
        SELECT doc_id, $scores
        FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
              FROM documents)
        GROUP BY doc_id)
      """
    })

  /** Quality scoring: token stats + stopword ratio + short-token ratio,
    * combined into one score. */
  val quality = QueryDef(
    "text_quality",
    (spark, dir) => {
      val stop = StopWords
      val tok = Tables.documents(spark, dir)
        .select(col("doc_id"), col("n_chars"),
          explode(split(col("text"), " ")).as("tok"))
      tok.groupBy(col("doc_id"), col("n_chars")).agg(
          count(lit(1)).as("n_tokens"),
          sum(length(col("tok"))).as("sum_tok_len"),
          sum(when(col("tok").isin(stop: _*), 1).otherwise(0)).as("n_stop"),
          sum(when(length(col("tok")) <= 2, 1).otherwise(0)).as("n_short"))
        .select(col("doc_id"), col("n_tokens"),
          (col("sum_tok_len").cast("double") / col("n_tokens").cast("double"))
            .as("avg_tok_len"),
          (col("n_stop").cast("double") / col("n_tokens").cast("double"))
            .as("stop_ratio"),
          (col("n_short").cast("double") / col("n_tokens").cast("double"))
            .as("short_ratio"),
          ((col("n_stop").cast("double") / col("n_tokens").cast("double")) -
            (col("n_short").cast("double") / col("n_tokens").cast("double")))
            .as("quality"))
    },
    Some("""
      SELECT doc_id, n_tokens,
             CAST(sum_tok_len AS DOUBLE) / CAST(n_tokens AS DOUBLE) AS avg_tok_len,
             CAST(n_stop AS DOUBLE) / CAST(n_tokens AS DOUBLE) AS stop_ratio,
             CAST(n_short AS DOUBLE) / CAST(n_tokens AS DOUBLE) AS short_ratio,
             (CAST(n_stop AS DOUBLE) / CAST(n_tokens AS DOUBLE)) -
             (CAST(n_short AS DOUBLE) / CAST(n_tokens AS DOUBLE)) AS quality
      FROM (
        SELECT doc_id, count(*) AS n_tokens, sum(length(tok)) AS sum_tok_len,
               sum(CASE WHEN tok IN ('the','a','of','and','to','in','is')
                        THEN 1 ELSE 0 END) AS n_stop,
               sum(CASE WHEN length(tok) <= 2 THEN 1 ELSE 0 END) AS n_short
        FROM (SELECT doc_id, n_chars, unnest(string_split(text, ' ')) AS tok
              FROM documents)
        GROUP BY doc_id)
    """))

  /** Token counting: whitespace tokens vs BPE-ish regex tokens (runs of
    * alphanumerics, 1-based capture group in both dialects). */
  val tokenCount = QueryDef(
    "text_token_count",
    (spark, dir) =>
      Tables.documents(spark, dir).select(
        col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("n_ws_tokens"),
        size(regexp_extract_all(col("text"), lit("([a-z0-9]+)"), lit(1)))
          .cast("long").as("n_re_tokens"),
        length(col("text")).cast("long").as("len_chars")),
    Some("""
      SELECT doc_id,
             len(string_split(text, ' ')) AS n_ws_tokens,
             len(regexp_extract_all(text, '([a-z0-9]+)', 1)) AS n_re_tokens,
             length(text) AS len_chars
      FROM documents
    """))

  /** Winnowing document fingerprint: md5 over ordered word 3-shingles, min
    * over a 4-shingle sliding window, distinct mins = the fingerprint set
    * (summarized as count + lexicographic min/max so the result stays one
    * row per doc). */
  val fingerprint = QueryDef(
    "text_fingerprint",
    (spark, dir) => {
      graft.functions.NgramExprs.register(spark)
      val toks = Tables.documents(spark, dir)
        .select(col("doc_id"), split(col("text"), " ").as("toks"))
      val sh = toks.select(col("doc_id"),
          posexplode(call_function("word_ngrams", col("toks"), lit(3)))
            .as(Seq("i", "shingle")))
        .withColumn("h", md5(col("shingle")))
      val winMin = sh.withColumn("win_min",
        min(col("h")).over(org.apache.spark.sql.expressions.Window
          .partitionBy(col("doc_id")).orderBy(col("i"))
          .rowsBetween(0, 3)))
      winMin.select(col("doc_id"), col("win_min")).distinct()
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_fp"),
          min(col("win_min")).as("fp_min"),
          max(col("win_min")).as("fp_max"))
    },
    Some("""
      WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
      idx AS (SELECT doc_id, toks,
                     unnest(generate_series(1, greatest(len(toks) - 2, 1))) AS i
              FROM t),
      sh AS (SELECT doc_id, i,
                    md5(array_to_string(list_slice(toks, i, i + 2), ' ')) AS h
             FROM idx),
      wm AS (SELECT DISTINCT doc_id,
                    min(h) OVER (PARTITION BY doc_id ORDER BY i
                                 ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING)
                      AS win_min
             FROM sh)
      SELECT doc_id, count(*) AS n_fp, min(win_min) AS fp_min,
             max(win_min) AS fp_max
      FROM wm GROUP BY 1
    """))

  /** Multimodal column plumbing (§2.3): media payload as an opaque binary
    * column + deterministic metadata extraction (the decode itself is
    * stubbed — no codec libs in this environment — but the schema, binary
    * handling, and batch shape are real; see functions.Multimodal for the
    * typed mapPartitions path). */
  val multimodalMeta = QueryDef(
    "multimodal_meta",
    (spark, dir) =>
      Tables.documents(spark, dir)
        .withColumn("payload", col("text").cast("binary"))
        .select(
          col("doc_id"),
          length(col("payload")).cast("long").as("n_bytes"),
          // substr-then-encode (chars → bytes), matching the oracle's
          // encode(substr(text,1,8)): slicing the encoded payload instead
          // would split multi-byte sequences and diverge on non-ASCII text.
          hex(expr("CAST(substring(text, 1, 8) AS BINARY)")).as("head_hex"),
          (lit(16) + length(col("payload")) % 64).cast("long").as("fake_width"),
          (lit(16) + (length(col("payload")).cast("long") / lit(64L)).cast("long") % 64)
            .cast("long").as("fake_height"),
          (lit(1) + length(col("payload")) % 4).cast("long").as("fake_frames")),
    Some("""
      SELECT doc_id,
             octet_length(encode(text)) AS n_bytes,
             hex(encode(substr(text, 1, 8))) AS head_hex,
             16 + octet_length(encode(text)) % 64 AS fake_width,
             16 + (octet_length(encode(text)) // 64) % 64 AS fake_height,
             1 + octet_length(encode(text)) % 4 AS fake_frames
      FROM documents
    """))

  /** The composed corpus-cleaning flow (§2.3's point, end to end in one
    * plan): quality-filter → exact-dedup (keep the smallest doc_id per
    * content hash) → md5-ranked stratified sample of 10 per source. Each
    * stage is its own oracle-checked operator elsewhere; this pins that
    * they COMPOSE — filters push below the dedup aggregation, the sample
    * window runs on the deduped survivors only. */
  val cleanCorpus = QueryDef(
    "pipeline_clean_corpus",
    (spark, dir) => {
      import org.apache.spark.sql.expressions.Window
      val stop = StopWords
      val quality = Tables.documents(spark, dir)
        .select(col("doc_id"), col("source"), col("lang"), col("text"),
          explode(split(col("text"), " ")).as("tok"))
        .groupBy(col("doc_id"), col("source"), col("lang"), col("text"))
        .agg(count(lit(1)).as("n_tok"),
          sum(when(col("tok").isin(stop: _*), 1).otherwise(0)).as("n_stop"),
          sum(when(length(col("tok")) <= 2, 1).otherwise(0)).as("n_short"))
        // integer cross-multiply: keep docs with stopwords > short tokens
        // (the "quality > 0" cut), exact in both engines
        .filter(col("n_stop") > col("n_short"))
      val deduped = quality
        .withColumn("rep",
          min(col("doc_id")).over(
            Window.partitionBy(md5(col("text")))))
        .filter(col("doc_id") === col("rep"))
      val w = Window.partitionBy(col("source"))
        .orderBy(md5(concat(col("doc_id").cast("string"), lit(":"),
          col("lang"))), col("doc_id"))
      deduped
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 10)
        .select(col("doc_id"), col("source"), col("rn").cast("long").as("rn"))
    },
    Some("""
      WITH q AS (
        SELECT doc_id, source, lang, text,
               sum(CASE WHEN tok IN ('the','a','of','and','to','in','is')
                        THEN 1 ELSE 0 END) AS n_stop,
               sum(CASE WHEN length(tok) <= 2 THEN 1 ELSE 0 END) AS n_short
        FROM (SELECT doc_id, source, lang, text,
                     unnest(string_split(text, ' ')) AS tok
              FROM documents)
        GROUP BY 1, 2, 3, 4
        HAVING n_stop > n_short),
      d AS (
        SELECT doc_id, source, lang FROM (
          SELECT doc_id, source, lang,
                 min(doc_id) OVER (PARTITION BY md5(text)) AS rep
          FROM q)
        WHERE doc_id = rep)
      SELECT doc_id, source, rn FROM (
        SELECT doc_id, source,
               row_number() OVER (
                 PARTITION BY source
                 ORDER BY md5(doc_id || ':' || lang), doc_id) AS rn
        FROM d)
      WHERE rn <= 10
    """))

  val defs: Seq[QueryDef] = Seq(
    langId, quality, tokenCount, fingerprint, multimodalMeta, cleanCorpus)
}
