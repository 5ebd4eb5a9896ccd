package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis operators a large-scale training-data pipeline needs,
  * over the `documents` table: token counting, quality scoring,
  * language-ID heuristic, document fingerprinting, token-set dedup.
  * All are pure column expressions (whole-stage codegen, no UDFs) with
  * exact DuckDB-SQL oracles.
  */
object TextQueries {
  import Tables.t

  private val toks: Column = split(col("text"), " ")
  private def stopCount(words: Seq[String]): Column =
    size(filter(toks, w => w.isin(words.map(lit): _*)))

  private val en = Seq("the", "of", "and", "a", "to")
  private val es = Seq("el", "la", "de", "y", "que")
  private val de = Seq("der", "die", "das", "und", "zu")

  private def duckStop(words: Seq[String]): String =
    s"len(list_filter(string_split(text, ' '), w -> w IN (${words.map(w => s"'$w'").mkString(",")})))"

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q22_text_stats",
      (s, d) => t(s, d, "documents").select(
        col("doc_id"),
        size(toks).as("n_tokens"),
        length(col("text")).cast("bigint").as("n_chars"),
        // avg token length via exact integer arithmetic, one final division
        ((length(col("text")) - (size(toks) - 1)).cast("double") /
          size(toks).cast("double")).as("avg_tok_len")),
      Some("""SELECT doc_id,
        CAST(len(string_split(text, ' ')) AS INTEGER) AS n_tokens,
        CAST(length(text) AS BIGINT) AS n_chars,
        CAST(length(text) - (len(string_split(text, ' ')) - 1) AS DOUBLE)
          / CAST(len(string_split(text, ' ')) AS DOUBLE) AS avg_tok_len
        FROM documents""")),

    QueryDef("q23_quality_score",
      (s, d) => t(s, d, "documents").select(
        col("doc_id"),
        stopCount(en).as("n_stop"),
        (stopCount(en).cast("double") / size(toks).cast("double")).as("stop_ratio"),
        (length(col("text")).between(100, 2000) && size(toks) >= 20 &&
          stopCount(en) >= 1).as("passes_quality")),
      Some(s"""SELECT doc_id,
        CAST(${duckStop(en)} AS INTEGER) AS n_stop,
        CAST(${duckStop(en)} AS DOUBLE) / CAST(len(string_split(text, ' ')) AS DOUBLE) AS stop_ratio,
        (length(text) BETWEEN 100 AND 2000 AND len(string_split(text, ' ')) >= 20
         AND ${duckStop(en)} >= 1) AS passes_quality
        FROM documents""")),

    QueryDef("q24_langid_heuristic",
      (s, d) => {
        val (cEn, cEs, cDe) = (stopCount(en), stopCount(es), stopCount(de))
        t(s, d, "documents").select(
          col("doc_id"), col("lang").as("lang_declared"),
          when(cEn >= cEs && cEn >= cDe, "en")
            .when(cEs >= cDe, "es").otherwise("de").as("lang_pred"))
      },
      Some(s"""SELECT doc_id, lang AS lang_declared,
        CASE WHEN ${duckStop(en)} >= ${duckStop(es)} AND ${duckStop(en)} >= ${duckStop(de)} THEN 'en'
             WHEN ${duckStop(es)} >= ${duckStop(de)} THEN 'es' ELSE 'de' END AS lang_pred
        FROM documents""")),

    QueryDef("q25_fingerprint",
      (s, d) => t(s, d, "documents").select(
        col("doc_id"),
        md5(lower(regexp_replace(col("text"), "\\s+", " "))).as("fingerprint")),
      Some("""SELECT doc_id,
        md5(lower(regexp_replace(text, '\s+', ' ', 'g'))) AS fingerprint
        FROM documents""")),

    QueryDef("q26_token_regex_count",
      (s, d) => t(s, d, "documents").select(
        col("doc_id"),
        regexp_count(col("text"), lit("[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]")).as("n_bpe_ish")),
      Some("""SELECT doc_id,
        CAST(len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]')) AS INTEGER) AS n_bpe_ish
        FROM documents""")),

    // near-dup by token-set fingerprint (dedup family, exact variant):
    // identical vocabularies collide regardless of word order/repeats
    QueryDef("q27_tokenset_dedup",
      (s, d) => t(s, d, "documents")
        .withColumn("set_fp",
          md5(concat_ws(" ", array_sort(array_distinct(toks)))))
        .groupBy("set_fp")
        .agg(min(col("doc_id")).as("keep_doc_id"), count(lit(1)).as("n_members")),
      Some("""SELECT md5(array_to_string(list_sort(list_distinct(string_split(text, ' '))), ' ')) AS set_fp,
        min(doc_id) AS keep_doc_id, count(*) AS n_members
        FROM documents GROUP BY 1""")))
}
