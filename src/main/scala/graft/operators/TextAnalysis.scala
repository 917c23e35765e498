package graft.operators

import graft.{QueryDef, Tables}
import graft.functions.Functions._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Text-analysis operators for the LLM-training-data pipeline over the
  * `documents` table: token counting, quality scoring, language ID,
  * document fingerprinting. The reference has no text pipeline (its
  * documents are order rows); these are the beyond-reference operators
  * a 100 TB corpus pipeline needs (builder brief, "text analysis").
  *
  * All are per-row Column expressions — no shuffle, no UDF, fully
  * whole-stage-codegen; a 1000-executor scan applies them at read
  * bandwidth. Cross-engine float rule: every derived ratio is a
  * division of exact integer counts (identical doubles on any IEEE
  * engine), rounded only at emission.
  */
object TextAnalysis {

  /** Stopword lists for the n-gram language heuristic. Deliberately
    * tiny — the point is deterministic scoring, not model quality.
    */
  val StopEn = Seq("the", "a", "of", "and", "to", "in", "is")
  val StopDe = Seq("der", "die", "das", "und", "ist", "ein")
  val StopFr = Seq("le", "la", "les", "et", "est", "un")
  val StopEs = Seq("el", "los", "las", "y", "es", "un")

  private def hits(toks: Column, words: Seq[String]): Column =
    size(filter(toks, t => t.isin(words.map(lit(_)): _*)))

  /** Tokenization + size/shape stats per document. */
  def tokenStats(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      size(tokens(col("text"))).cast("long").as("n_tokens"),
      length(regexp_replace(col("text"), "\\s+", "")).cast("long")
        .as("n_token_chars"),
      size(array_distinct(tokens(col("text")))).cast("long")
        .as("n_distinct_tokens"))
      .withColumn("avg_token_len",
        round(col("n_token_chars").cast("double") / col("n_tokens"), 6))

  /** Quality scoring: type-token ratio, stopword ratio, length score,
    * blended 0..1 quality with a keep/drop flag — the shape of a
    * corpus-filtering pass (C4-style gate per document).
    */
  def qualityScore(docs: DataFrame): DataFrame = {
    val t = tokens(col("text"))
    docs.select(
      col("doc_id"),
      size(t).cast("long").as("n_tokens"),
      size(array_distinct(t)).cast("long").as("n_distinct"),
      hits(t, StopEn).cast("long").as("n_stop"))
      .withColumn("ttr",
        col("n_distinct").cast("double") / col("n_tokens"))
      .withColumn("stop_ratio",
        col("n_stop").cast("double") / col("n_tokens"))
      .withColumn("len_score",
        least(col("n_tokens").cast("double") / 100.0d, lit(1.0d)))
      .withColumn("quality",
        round(col("ttr") * 0.5d + col("len_score") * 0.3d
          + col("stop_ratio") * 0.2d, 6))
      .withColumn("keep", (col("quality") >= 0.4d).cast("int"))
      .select(col("doc_id"), col("n_tokens"), round(col("ttr"), 6).as("ttr"),
        round(col("stop_ratio"), 6).as("stop_ratio"), col("quality"),
        col("keep"))
  }

  /** Language ID by stopword-hit voting with fixed priority
    * en > de > fr > es on ties; 'und' when nothing hits.
    */
  def langId(docs: DataFrame): DataFrame = {
    val t = tokens(col("text"))
    val scored = docs.select(
      col("doc_id"), col("lang").as("lang_label"),
      hits(t, StopEn).cast("long").as("en_hits"),
      hits(t, StopDe).cast("long").as("de_hits"),
      hits(t, StopFr).cast("long").as("fr_hits"),
      hits(t, StopEs).cast("long").as("es_hits"))
    val m = greatest(col("en_hits"), col("de_hits"), col("fr_hits"),
      col("es_hits"))
    scored.withColumn("pred_lang",
      when(m === 0, "und")
        .when(col("en_hits") === m, "en")
        .when(col("de_hits") === m, "de")
        .when(col("fr_hits") === m, "fr")
        .otherwise("es"))
  }

  val Bm25K1 = 1.2
  val Bm25B = 0.75
  val Bm25Terms = Seq("spark", "vector", "hash")

  /** BM25 relevance of every document against a fixed query-term set
    * — the corpus-ranking pass of a retrieval/quality pipeline.
    *
    * Shape: per-doc term frequencies are scan-bandwidth expressions;
    * the corpus statistics (N, Σdl, per-term df) are ONE tiny
    * aggregate row broadcast back over the scan — no shuffle of the
    * corpus itself, so the op is two scans + a broadcast at any scale.
    *
    * Determinism: tf/dl/df/N are exact integers; avgdl is one
    * division; the score is a fixed-shape double expression (the
    * oracle mirrors operand order and literals exactly), ln is the
    * only transcendental, and the result is rounded at emission.
    */
  def bm25(docs: DataFrame, terms: Seq[String] = Bm25Terms,
           k1: Double = Bm25K1, b: Double = Bm25B): DataFrame = {
    val t = tokens(lower(col("text")))
    val base = docs.select(
      col("doc_id") +: size(t).cast("long").as("dl") +:
        terms.map(w =>
          size(filter(t, x => x === lit(w))).cast("long").as(s"tf_$w")): _*)
    val aggs = count(lit(1)).cast("long").as("n_docs") +:
      sum(col("dl")).as("sum_dl") +:
      terms.map(w =>
        sum((col(s"tf_$w") > 0).cast("long")).as(s"df_$w"))
    val stats = base.agg(aggs.head, aggs.tail: _*)
    val avgdl = col("sum_dl").cast("double") / col("n_docs")
    def idf(w: String) =
      log((col("n_docs").cast("double") - col(s"df_$w") + 0.5d) /
        (col(s"df_$w") + 0.5d) + 1.0d)
    def tnorm(w: String) =
      (col(s"tf_$w").cast("double") * lit(k1 + 1)) /
        (col(s"tf_$w").cast("double") +
          lit(k1) * (lit(1 - b) + lit(b) * col("dl").cast("double") / avgdl))
    val score = terms.map(w => idf(w) * tnorm(w)).reduce(_ + _)
    base.join(broadcast(stats))
      .select(col("doc_id") +: col("dl") +: terms.map(w => col(s"tf_$w")) :+
        round(score, 6).as("bm25"): _*)
  }

  /** Per-doc cross-entropy under the corpus unigram LM — the
    * perplexity-style quality filter (high score = tokens the corpus
    * finds surprising = gibberish or off-distribution text; the
    * production form swaps the unigram model for a KenLM/ngram model,
    * same dataflow).
    *
    * Shape at scale: vocabulary aggregate (one groupBy on token),
    * token stream re-joins the vocab on the token key, per-doc
    * aggregate. Determinism: each token's negative-log-prob is
    * quantized to micro-units BEFORE the per-doc sum (distributed
    * double-sum order is engine-internal; quantized sums are exact
    * integer arithmetic — same device as sim_centroids).
    */
  def unigramLogprob(docs: DataFrame): DataFrame = {
    val tok = docs.select(col("doc_id"),
      explode(tokens(lower(col("text")))).as("tk"))
    val vocab = tok.groupBy(col("tk")).agg(count(lit(1)).as("cnt"))
    val total = vocab.agg(sum(col("cnt")).as("total"))
    val scored = tok
      .join(vocab, Seq("tk"))
      .join(broadcast(total))
      .withColumn("q_nll",
        round(log(col("cnt").cast("double") / col("total")) * -1000000.0d)
          .cast("long"))
    scored.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"), sum(col("q_nll")).as("q_sum"))
      .withColumn("avg_nll",
        round(col("q_sum").cast("double") / 1000000.0d / col("n_tokens"), 6))
      .select(col("doc_id"), col("n_tokens"), col("avg_nll"))
  }

  /** Canonical-text fingerprint: md5 of the normalized text plus its
    * 60-bit integer form — the key for exact dedup and shard routing.
    */
  def fingerprint(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      md5Hex(normText(col("text"))).as("fp"),
      hex60(normText(col("text"))).as("fp_int"))

  // ---- driver-contract registry ----

  private def docs(s: SparkSession, d: String) = Tables.documents(s, d)

  private def sqlHits(words: Seq[String]) =
    s"len(list_filter(string_split_regex(trim(text),'\\s+'), " +
      s"x -> x IN (${words.map(w => s"'$w'").mkString(",")})))"

  val defs: Seq[QueryDef] = Seq(

    QueryDef("txt_token_stats",
      (s, d) => tokenStats(docs(s, d)),
      Some("""SELECT doc_id,
             |CAST(len(string_split_regex(trim(text),'\s+')) AS BIGINT) AS n_tokens,
             |CAST(len(regexp_replace(text,'\s+','','g')) AS BIGINT) AS n_token_chars,
             |CAST(len(list_distinct(string_split_regex(trim(text),'\s+'))) AS BIGINT) AS n_distinct_tokens,
             |ROUND(CAST(len(regexp_replace(text,'\s+','','g')) AS DOUBLE)
             |  / len(string_split_regex(trim(text),'\s+')), 6) AS avg_token_len
             |FROM documents""".stripMargin)),

    QueryDef("txt_quality",
      (s, d) => qualityScore(docs(s, d)),
      Some(s"""WITH q AS (SELECT doc_id,
              |  CAST(len(string_split_regex(trim(text),'\\s+')) AS BIGINT) AS n_tokens,
              |  CAST(len(list_distinct(string_split_regex(trim(text),'\\s+'))) AS BIGINT) AS n_distinct,
              |  CAST(${sqlHits(StopEn)} AS BIGINT) AS n_stop
              |  FROM documents),
              |r AS (SELECT doc_id, n_tokens,
              |  CAST(n_distinct AS DOUBLE)/n_tokens AS ttr,
              |  CAST(n_stop AS DOUBLE)/n_tokens AS stop_ratio,
              |  LEAST(CAST(n_tokens AS DOUBLE)/100.0, 1.0) AS len_score
              |  FROM q)
              |SELECT doc_id, n_tokens, ROUND(ttr,6) AS ttr,
              |ROUND(stop_ratio,6) AS stop_ratio,
              |ROUND(ttr*0.5 + len_score*0.3 + stop_ratio*0.2, 6) AS quality,
              |CAST(ROUND(ttr*0.5 + len_score*0.3 + stop_ratio*0.2, 6) >= 0.4 AS INT) AS keep
              |FROM r""".stripMargin)),

    QueryDef("txt_lang_id",
      (s, d) => langId(docs(s, d)),
      Some(s"""WITH h AS (SELECT doc_id, lang AS lang_label,
              |  CAST(${sqlHits(StopEn)} AS BIGINT) AS en_hits,
              |  CAST(${sqlHits(StopDe)} AS BIGINT) AS de_hits,
              |  CAST(${sqlHits(StopFr)} AS BIGINT) AS fr_hits,
              |  CAST(${sqlHits(StopEs)} AS BIGINT) AS es_hits
              |  FROM documents)
              |SELECT *, CASE
              |  WHEN GREATEST(en_hits,de_hits,fr_hits,es_hits) = 0 THEN 'und'
              |  WHEN en_hits = GREATEST(en_hits,de_hits,fr_hits,es_hits) THEN 'en'
              |  WHEN de_hits = GREATEST(en_hits,de_hits,fr_hits,es_hits) THEN 'de'
              |  WHEN fr_hits = GREATEST(en_hits,de_hits,fr_hits,es_hits) THEN 'fr'
              |  ELSE 'es' END AS pred_lang
              |FROM h""".stripMargin)),

    QueryDef("txt_fingerprint",
      (s, d) => fingerprint(docs(s, d)),
      Some("""SELECT doc_id,
             |md5(lower(regexp_replace(trim(text),'\s+',' ','g'))) AS fp,
             |CAST(concat('0x', substr(md5(lower(regexp_replace(trim(text),'\s+',' ','g'))),1,15)) AS BIGINT) AS fp_int
             |FROM documents""".stripMargin)),

    // BPE-ish tokenizer: letter runs / digit runs / punctuation runs
    // as separate tokens (the pre-tokenization split BPE vocabularies
    // assume), counted per doc.
    QueryDef("txt_regex_tokens",
      (s, d) => docs(s, d).select(
        col("doc_id"),
        size(regexp_extract_all(col("text"),
          lit("[a-z]+|[0-9]+|[^a-z0-9\\s]+"), lit(0))).cast("long")
          .as("n_bpe_tokens"),
        size(array_distinct(regexp_extract_all(col("text"),
          lit("[a-z]+|[0-9]+|[^a-z0-9\\s]+"), lit(0)))).cast("long")
          .as("n_bpe_distinct")),
      Some("""SELECT doc_id,
             |CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9\s]+')) AS BIGINT) AS n_bpe_tokens,
             |CAST(len(list_distinct(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9\s]+'))) AS BIGINT) AS n_bpe_distinct
             |FROM documents""".stripMargin)),

    // Quantile-threshold quality filter: drop the bottom decile by
    // quality score — the corpus-filtering gate expressed with an
    // exact rank window (percent_rank with a deterministic tie-break),
    // so any engine draws the same cut. At extreme scale the same
    // gate uses approx_percentile on a sample; the exact form is the
    // oracle-checkable contract.
    QueryDef("txt_quality_filter",
      (s, d) => {
        val q = qualityScore(docs(s, d))
        val w = org.apache.spark.sql.expressions.Window
          .orderBy(col("quality"), col("doc_id"))
        q.withColumn("pr", percent_rank().over(w))
          .filter(col("pr") >= 0.1d)
          .select(col("doc_id"), col("quality"), round(col("pr"), 6).as("pr"))
      },
      Some(s"""WITH q AS (SELECT doc_id,
              |  ROUND(CAST(len(list_distinct(string_split_regex(trim(text),'\\s+'))) AS DOUBLE)
              |      / len(string_split_regex(trim(text),'\\s+')) * 0.5
              |    + LEAST(CAST(len(string_split_regex(trim(text),'\\s+')) AS DOUBLE)/100.0, 1.0) * 0.3
              |    + CAST(${sqlHits(StopEn)} AS DOUBLE)
              |      / len(string_split_regex(trim(text),'\\s+')) * 0.2, 6) AS quality
              |  FROM documents)
              |SELECT doc_id, quality, ROUND(pr, 6) AS pr FROM (
              |  SELECT doc_id, quality,
              |    PERCENT_RANK() OVER (ORDER BY quality, doc_id) AS pr FROM q)
              |WHERE pr >= 0.1""".stripMargin)),

    // Corpus report: per-source doc counts + mean quality — the mean
    // goes through DECIMAL so partial-aggregation order can't move it.
    QueryDef("txt_corpus_report",
      (s, d) => {
        val q = qualityScore(docs(s, d))
          .join(docs(s, d).select(col("doc_id"), col("source")), Seq("doc_id"))
        q.groupBy(col("source"))
          .agg(count(lit(1)).as("n_docs"),
            sum(col("n_tokens")).as("total_tokens"),
            (sum(col("quality").cast("decimal(16,6)")).cast("double") /
              count(lit(1))).as("mean_quality"))
      },
      Some(s"""WITH q AS (SELECT doc_id, source,
              |  CAST(len(string_split_regex(trim(text),'\\s+')) AS BIGINT) AS n_tokens,
              |  ROUND(CAST(len(list_distinct(string_split_regex(trim(text),'\\s+'))) AS DOUBLE)
              |      / len(string_split_regex(trim(text),'\\s+')) * 0.5
              |    + LEAST(CAST(len(string_split_regex(trim(text),'\\s+')) AS DOUBLE)/100.0, 1.0) * 0.3
              |    + CAST(${sqlHits(StopEn)} AS DOUBLE)
              |      / len(string_split_regex(trim(text),'\\s+')) * 0.2, 6) AS quality
              |  FROM documents)
              |SELECT source, COUNT(*) AS n_docs,
              |CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
              |CAST(SUM(CAST(quality AS DECIMAL(16,6))) AS DOUBLE) / COUNT(*) AS mean_quality
              |FROM q GROUP BY source""".stripMargin)),

    // The 100 TB form of the same gate: threshold from
    // approx_percentile (one sketch pass, no global sort/window) —
    // sketch internals are engine-specific, so rows-only check, while
    // txt_quality_filter above is the exact oracle-checked contract.
    QueryDef("txt_quality_filter_approx",
      (s, d) => {
        val q = qualityScore(docs(s, d))
        val cut = q.agg(
          expr("approx_percentile(quality, 0.1, 10000)").as("cut"))
        q.join(broadcast(cut))
          .filter(col("quality") >= col("cut"))
          .select(col("doc_id"), col("quality"))
      },
      None),

    QueryDef("txt_unigram_logprob",
      (s, d) => unigramLogprob(docs(s, d)),
      Some("""WITH tok AS (SELECT doc_id,
             |    unnest(string_split_regex(trim(lower(text)),'\s+')) AS tk
             |  FROM documents),
             |vocab AS (SELECT tk, COUNT(*) AS cnt FROM tok GROUP BY 1),
             |tot AS (SELECT SUM(cnt) AS total FROM vocab),
             |scored AS (SELECT doc_id,
             |    CAST(ROUND(ln(CAST(cnt AS DOUBLE) / total) * -1000000.0) AS BIGINT) AS q_nll
             |  FROM tok JOIN vocab USING (tk), tot)
             |SELECT doc_id, COUNT(*) AS n_tokens,
             |ROUND(CAST(SUM(q_nll) AS DOUBLE) / 1000000.0 / COUNT(*), 6) AS avg_nll
             |FROM scored GROUP BY doc_id""".stripMargin)),

    QueryDef("txt_bm25",
      (s, d) => bm25(docs(s, d)),
      Some {
        val terms = Bm25Terms
        val k1p1 = s"${Bm25K1 + 1}"
        val oneMinusB = s"${1 - Bm25B}"
        val tfCols = terms.map(w =>
          s"""CAST(len(list_filter(string_split_regex(trim(lower(text)),'\\s+'),
             |      x -> x = '$w')) AS BIGINT) AS tf_$w""".stripMargin)
          .mkString(",\n    ")
        val dfCols = terms.map(w =>
          s"CAST(SUM(CASE WHEN tf_$w > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df_$w")
          .mkString(",\n    ")
        val scoreTerms = terms.map(w =>
          s"""ln((CAST(n_docs AS DOUBLE) - df_$w + 0.5) / (df_$w + 0.5) + 1.0)
             |  * ((CAST(tf_$w AS DOUBLE) * $k1p1) / (CAST(tf_$w AS DOUBLE)
             |    + $Bm25K1 * ($oneMinusB + $Bm25B * CAST(dl AS DOUBLE)
             |      / (CAST(sum_dl AS DOUBLE) / n_docs))))""".stripMargin)
          .mkString("\n  + ")
        s"""WITH base AS (SELECT doc_id,
           |    CAST(len(string_split_regex(trim(lower(text)),'\\s+')) AS BIGINT) AS dl,
           |    $tfCols
           |  FROM documents),
           |stats AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
           |    SUM(dl) AS sum_dl,
           |    $dfCols
           |  FROM base)
           |SELECT doc_id, dl, ${terms.map(w => s"tf_$w").mkString(", ")},
           |ROUND($scoreTerms, 6) AS bm25
           |FROM base, stats""".stripMargin
      }),

    // Corpus n-gram document frequency, top 20 — the boilerplate /
    // contamination detector (an n-gram in half the corpus is
    // template text). Scale shape: groupBy on the shingle string
    // (map-side partial counts), then a distributed
    // TakeOrderedAndProject for the top-k — NO single-partition sort
    // of the full n-gram table; the rank window runs over 20 rows.
    QueryDef("txt_ngram_freq",
      (s, d) => {
        val df = Dedup.docShingles(docs(s, d))
          .groupBy(col("s").as("ngram"))
          .agg(count(lit(1)).as("n_docs"))
        val top = df.orderBy(col("n_docs").desc, col("ngram")).limit(20)
        top.withColumn("rank", row_number().over(
          org.apache.spark.sql.expressions.Window
            .orderBy(col("n_docs").desc, col("ngram"))))
          .select(col("rank").cast("long").as("rank"),
            col("ngram"), col("n_docs"))
      },
      Some("""WITH toks AS (SELECT doc_id,
             |    string_split_regex(trim(lower(text)),'\s+') t FROM documents),
             |sh0 AS (SELECT doc_id, unnest(list_distinct(list_transform(
             |    generate_series(1, greatest(len(t)-2, 0)),
             |    i -> array_to_string(t[i:i+2], ' ')))) AS s
             |  FROM toks),
             |df AS (SELECT s AS ngram, COUNT(*) AS n_docs FROM sh0 GROUP BY 1)
             |SELECT CAST(ROW_NUMBER() OVER (ORDER BY n_docs DESC, ngram) AS BIGINT) AS rank,
             |ngram, n_docs FROM df
             |ORDER BY n_docs DESC, ngram LIMIT 20""".stripMargin)),

    // Polynomial rolling hash over the character stream — the
    // shard-stable fingerprint; fold-with-0 here equals DuckDB's
    // reduce-with-first-element since 0*31+c0 = c0.
    QueryDef("txt_rolling_hash",
      (s, d) => docs(s, d).select(
        col("doc_id"),
        aggregate(
          transform(split(normText(col("text")), ""), c => ascii(c).cast("long")),
          lit(0L),
          (acc, c) => (acc * 31L + c) % 1000000007L).as("rhash")),
      Some("""SELECT doc_id,
             |list_reduce(list_transform(
             |  string_split(lower(regexp_replace(trim(text),'\s+',' ','g')), ''),
             |  c -> CAST(ord(c) AS BIGINT)),
             |  (a, b) -> (a * 31 + b) % 1000000007) AS rhash
             |FROM documents""".stripMargin))
  )
}
