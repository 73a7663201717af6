"""Text-analysis operators for training-data pipelines.

All pure JVM-side column expressions (split / higher-order array functions /
regexp) — no Python in the row path, so everything whole-stage-codegens and
the same logic is expressible 1:1 in the DuckDB oracle:

- token counting: whitespace words + a BPE-ish regex segmentation;
- quality scoring: length, punctuation ratio, stopword ratio, mean word
  length, composite [0,1] score;
- language ID: marker-stopword voting with a deterministic priority
  tiebreak (a classic n-gram/function-word heuristic — at this fixture's
  scale real models are out of scope; the operator shape is what matters);
- document fingerprinting: min-hash over all 8-char character windows
  (winnowing-style robust fingerprint; md5 is engine-portable).

The reference has no text operators (it is a metrics engine); these implement
the training-data charter of SURVEY.md §7.1.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

BPE_ISH = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"

STOPWORDS = ["a", "an", "and", "in", "of", "the", "to"]

LANG_MARKERS = {  # deterministic priority order = list order
    "en": ["the", "a", "of", "and", "to", "in", "is"],
    "es": ["el", "la", "de", "y", "que", "los", "es"],
    "fr": ["le", "la", "de", "et", "les", "des", "est"],
}


def _words(text_col: str) -> Column:
    return F.split(F.col(text_col), " ")


def _token_count_exprs(text_col: str) -> list[Column]:
    return [
        F.size(_words(text_col)).alias("n_words"),
        F.size(F.regexp_extract_all(F.col(text_col), F.lit(BPE_ISH), 0))
         .alias("n_bpe"),
    ]


def token_counts(docs: DataFrame, text_col: str = "text",
                 id_col: str = "doc_id") -> DataFrame:
    """(doc_id, n_words, n_bpe): whitespace tokens and BPE-ish regex tokens."""
    return docs.select(F.col(id_col).alias("doc_id"),
                       *_token_count_exprs(text_col))


def _quality_exprs(text_col: str) -> list[Column]:
    w = _words(text_col)
    n_chars = F.length(F.col(text_col)).cast("double")
    n_words = F.size(w).cast("double")
    n_punct = (n_chars - F.length(
        F.regexp_replace(F.col(text_col), "[^A-Za-z0-9 ]", ""))).cast("double")
    n_stop = F.size(F.filter(
        w, lambda x: F.array_contains(F.array(*[F.lit(s) for s in STOPWORDS]),
                                      F.lower(x)))).cast("double")
    sum_word_len = F.aggregate(w, F.lit(0).cast("double"),
                               lambda acc, x: acc + F.length(x))
    punct_ratio = F.try_divide(n_punct, n_chars)
    stop_ratio = F.try_divide(n_stop, n_words)
    mean_word_len = F.try_divide(sum_word_len, n_words)
    score = F.greatest(F.lit(0.0), F.least(F.lit(1.0),
        F.lit(0.4) * F.least(stop_ratio * 5, F.lit(1.0))
        + F.lit(0.3) * (F.lit(1.0) - F.least(punct_ratio * 10, F.lit(1.0)))
        + F.lit(0.3) * F.least(n_words / 100, F.lit(1.0))))
    return [
        n_chars.cast("long").alias("n_chars"),
        n_words.cast("long").alias("n_words"),
        punct_ratio.alias("punct_ratio"),
        stop_ratio.alias("stop_ratio"),
        mean_word_len.alias("mean_word_len"),
        score.alias("quality_score"),
    ]


def quality_scores(docs: DataFrame, text_col: str = "text",
                   id_col: str = "doc_id") -> DataFrame:
    """Per-doc quality features + composite score in [0, 1].

    punct_ratio: non-[alnum/space] chars / chars; stop_ratio: stopword tokens
    / tokens; mean_word_len: Σ|w| / #w. Score rewards stopword presence and
    length, penalizes punctuation soup — a standard cheap pre-filter shape
    (what matters is the exact, portable arithmetic, pinned by the oracle).
    """
    return docs.select(F.col(id_col).alias("doc_id"),
                       *_quality_exprs(text_col))


def _langid_exprs(text_col: str) -> list[Column]:
    w = _words(text_col)

    def marker_count(markers: list[str]) -> Column:
        arr = F.array(*[F.lit(s) for s in markers])
        # single-arg lambda: a 2-arg lambda would be called as (elem, index)
        return F.size(F.filter(w, lambda x: F.array_contains(arr, F.lower(x))))

    scores = {lang: marker_count(markers)
              for lang, markers in LANG_MARKERS.items()}
    best = None
    for lang in LANG_MARKERS:          # priority order: first strict max wins
        cond = (scores[lang] > 0)
        for other in LANG_MARKERS:
            if other == lang:
                continue
            op = (scores[lang] >= scores[other]) \
                if list(LANG_MARKERS).index(other) > list(LANG_MARKERS).index(lang) \
                else (scores[lang] > scores[other])
            cond = cond & op
        best = F.when(cond, F.lit(lang)) if best is None else best.when(cond, F.lit(lang))
    return [
        best.otherwise(F.lit("und")).alias("lang_pred"),
        F.greatest(*scores.values()).cast("long").alias("lang_score"),
    ]


def language_id(docs: DataFrame, text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """(doc_id, lang_pred, lang_score): marker-stopword vote per language.

    Score = #tokens in the language's marker set (with multiplicity).
    Prediction = highest score; ties resolve in LANG_MARKERS order; all-zero
    → 'und'. One pass, no explode — per-language conditional counts via
    higher-order filter.
    """
    return docs.select(F.col(id_col).alias("doc_id"),
                       *_langid_exprs(text_col))


def quality_language_profile(docs: DataFrame, text_col: str = "text",
                             id_col: str = "doc_id") -> DataFrame:
    """Token counts + quality features + language ID in ONE scan-stage
    select: composing the per-doc operators as sibling column expressions
    costs a single pass over the text column with no shuffle, where joining
    their individual frames would shuffle each on doc_id."""
    n_bpe = _token_count_exprs(text_col)[1]   # n_words already in quality
    return docs.select(F.col(id_col).alias("doc_id"),
                       *_quality_exprs(text_col),
                       n_bpe,
                       *_langid_exprs(text_col))


def _fingerprint_expr(window: int, text_col: str) -> Column:
    t = F.col(text_col)
    n = F.length(t)
    mins = F.array_min(F.transform(
        F.sequence(F.lit(1), n - (window - 1)),
        lambda i: F.md5(t.substr(i, F.lit(window)))))
    return F.when(n >= window, mins).otherwise(F.md5(t)).alias("fingerprint")


def fingerprints(docs: DataFrame, window: int = 8, text_col: str = "text",
                 id_col: str = "doc_id") -> DataFrame:
    """(doc_id, fingerprint): min md5 over all ``window``-char substrings.

    Winnowing-style content fingerprint, robust to local edits anywhere
    outside the minimizing window; md5-hex min is engine-portable (string
    order). Docs shorter than ``window`` hash whole-text.
    """
    return docs.select(F.col(id_col).alias("doc_id"),
                       _fingerprint_expr(window, text_col))


def top_tokens(seq: DataFrame, k: int = 5,
               partition_col: str = "source") -> DataFrame:
    """Top-k most frequent token ids per partition — the vocabulary-drift /
    boilerplate surface (a partition whose top tokens shift or concentrate
    signals template contamination).

    explode → (partition, token) hash count (map-side combined: the shuffle
    carries one partial per distinct key per task, not one row per token) →
    per-partition window top-k, count-desc with token-id tiebreak so the
    result is total-ordered and engine-portable.
    """
    from pyspark.sql import Window

    counts = (
        seq.select(F.col(partition_col).alias("partition_id"),
                   F.explode("tokens").alias("token"))
           .groupBy("partition_id", "token")
           .agg(F.count(F.lit(1)).alias("cnt"))
    )
    w = Window.partitionBy("partition_id") \
              .orderBy(F.desc("cnt"), F.col("token"))
    return counts.withColumn("rank", F.row_number().over(w)) \
                 .filter(F.col("rank") <= k)


def _repetition_exprs(k: int, text_col: str) -> list[Column]:
    words = F.split(F.col(text_col), " ")
    n = F.size(words)
    grams = F.transform(
        F.sequence(F.lit(1), n - (k - 1)),
        lambda i: F.xxhash64(F.array_join(F.slice(words, i, k), " ")))
    grams = F.when(n >= k, grams).otherwise(F.array().cast("array<bigint>"))
    n_grams = F.size(grams)
    rep = F.when(n_grams > 0,
                 1.0 - F.try_divide(F.size(F.array_distinct(grams)), n_grams)) \
           .otherwise(F.lit(0.0))
    word_dup = F.when(n > 0,
                      1.0 - F.try_divide(F.size(F.array_distinct(words)), n)) \
                .otherwise(F.lit(0.0))
    return [n.alias("n_words"), n_grams.alias("n_grams"),
            rep.alias("rep_ratio"), word_dup.alias("word_dup_ratio")]


def repetition_scores(docs: DataFrame, k: int = 3,
                      text_col: str = "text",
                      id_col: str = "doc_id") -> DataFrame:
    """Within-document repetition (the Gopher/C4-style quality rule:
    heavily repeated n-grams signal boilerplate/spam): ``rep_ratio`` =
    1 − distinct-k-grams / total-k-grams, plus the word-level duplicate
    fraction. Pure array expressions — computed inside the scan, no
    shuffle, no explode."""
    return docs.select(F.col(id_col).alias("doc_id"),
                       *_repetition_exprs(k, text_col))


def text_profile(docs: DataFrame, window: int = 8, k: int = 3,
                 text_col: str = "text",
                 id_col: str = "doc_id") -> DataFrame:
    """Content fingerprint + repetition scores in ONE scan-stage select
    (single pass, no shuffle — sibling expressions, not a doc_id join)."""
    return docs.select(F.col(id_col).alias("doc_id"),
                       _fingerprint_expr(window, text_col),
                       *_repetition_exprs(k, text_col))


PII_PATTERNS = {
    # deliberately simple, engine-portable regexes (same syntax in DuckDB)
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "phone": r"\+?[0-9]{3}[-. ][0-9]{3}[-. ][0-9]{4}",
    "ssn": r"[0-9]{3}-[0-9]{2}-[0-9]{4}",
}


def pii_scan(docs: DataFrame, text_col: str = "text",
             id_col: str = "doc_id") -> DataFrame:
    """PII-pattern counts per doc (scrub-before-training hygiene): one
    ``regexp_count`` per pattern, all inside the scan stage — a wide table
    costs one pass regardless of pattern count."""
    cols = [F.regexp_count(F.col(text_col), F.lit(rx)).alias(f"n_{name}")
            for name, rx in PII_PATTERNS.items()]
    total = sum((F.col(f"n_{n}") for n in list(PII_PATTERNS)[1:]),
                F.col(f"n_{list(PII_PATTERNS)[0]}"))
    return docs.select(F.col(id_col).alias("doc_id"), *cols) \
               .withColumn("n_pii", total)
