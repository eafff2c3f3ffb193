"""Text analysis: token counting, quality scoring, language id, fingerprints.

All pure Spark SQL expressions (whole-stage-codegen friendly, no Python),
each with an exactly-matching DuckDB formulation for the oracle gate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

STOPWORDS = ["the", "a", "and", "of", "to", "in", "is", "on", "for", "with"]

# tiny marker lexicons for a deterministic language-id heuristic
LANG_MARKERS = {
    "en": ["the", "and", "is"],
    "es": ["el", "la", "que"],
    "de": ["der", "die", "und"],
    "fr": ["le", "la", "et"],
    "zh": ["de", "shi", "le"],
}


def token_stats(docs: DataFrame) -> DataFrame:
    """Whitespace tokens + BPE-ish subword estimate (≈ chars/4 heuristic and
    punct-split pieces), per doc."""
    ws = "filter(split(text, ' '), w -> length(w) > 0)"
    return docs.selectExpr(
        "cast(doc_id as long) as doc_id",
        f"size({ws}) as n_words",
        "length(text) as n_chars",
        f"cast(ceil(length(replace(text, ' ', '')) / 4.0) as bigint) as n_subwords_est",
        f"size(filter({ws}, w -> w rlike '^[0-9]+$')) as n_numeric",
        # nullif guard: a zero-word doc (empty/whitespace text) must yield
        # NULL, not a DIVIDE_BY_ZERO under ANSI Spark (oracle matches)
        f"cast(aggregate({ws}, 0L, (a, w) -> a + length(w)) as double)"
        f" / nullif(size({ws}), 0) as mean_word_len",
    )


def quality_score(docs: DataFrame) -> DataFrame:
    """Deterministic quality features + combined score in [0,1]."""
    ws = "filter(split(text, ' '), w -> length(w) > 0)"
    stop_arr = "array(" + ",".join(f"'{s}'" for s in STOPWORDS) + ")"
    return docs.selectExpr(
        "cast(doc_id as long) as doc_id",
        f"size({ws}) as n_words",
        f"size(filter({ws}, w -> array_contains({stop_arr}, w))) as n_stop",
        f"size(array_distinct({ws})) as n_distinct",
        # nullif guards: empty/zero-word docs yield NULL ratios (not a
        # DIVIDE_BY_ZERO under ANSI Spark); quality_ppm defines them as 0
        f"round(size(filter({ws}, w -> array_contains({stop_arr}, w))) / cast(nullif(size({ws}), 0) as double), 6) as stop_ratio",
        "round(length(regexp_replace(text, '[^.,;:!?]', '')) / cast(nullif(length(text), 0) as double), 6) as punct_ratio",
        f"round(size(array_distinct({ws})) / cast(nullif(size({ws}), 0) as double), 6) as distinct_ratio",
    ).selectExpr(
        "doc_id", "n_words", "stop_ratio", "punct_ratio", "distinct_ratio",
        # integer-exact parts-per-million score: engine-portable, no float rounding
        "case when n_words = 0 then 0L else "
        "cast(least(cast(n_words as bigint) * 4000L, 400000L)"
        " + least((1500000L * n_stop) div n_words, 300000L)"
        " + (300000L * n_distinct) div n_words as bigint) end as quality_ppm",
    )


def lang_id(docs: DataFrame) -> DataFrame:
    """Marker-word voting; deterministic tie-break by language name."""
    ws = "filter(split(text, ' '), w -> length(w) > 0)"
    score_cols = []
    for lang, markers in sorted(LANG_MARKERS.items()):
        arr = "array(" + ",".join(f"'{m}'" for m in markers) + ")"
        score_cols.append(f"size(filter({ws}, w -> array_contains({arr}, w))) as hits_{lang}")
    df = docs.selectExpr("cast(doc_id as long) as doc_id", "lang as labeled_lang", *score_cols)
    langs = sorted(LANG_MARKERS)
    struct_arr = ("array(" + ",".join(
        f"named_struct('hits', hits_{lang}, 'lang', '{lang}')" for lang in langs) + ")")
    return df.selectExpr(
        "doc_id", "labeled_lang", *[f"hits_{lang}" for lang in langs],
        f"array_max({struct_arr}).lang as predicted_lang",
    )


def fingerprint(docs: DataFrame) -> DataFrame:
    """Order-sensitive document fingerprint: sum(word_id(i) * (i+1)) mod 2^61
    plus an order-free xor-ish sum — cheap near-exact-dup key."""
    wid = ("(length(w)*31 + ascii(substr(w, 1, 1))*7 + "
           "ascii(substr(w, length(w), 1))) % 50000")
    ws = "filter(split(text, ' '), w -> length(w) > 0)"
    return docs.selectExpr(
        "cast(doc_id as long) as doc_id",
        # size guard: sequence(1, 0) is DESCENDING [1, 0] in Spark, which
        # null-pads zip_with and nulls the fold — a zero-word doc's
        # fingerprint is defined as 0 (oracle matches with its own guard)
        f"case when size({ws}) = 0 then 0L else "
        f"aggregate(zip_with({ws}, sequence(1, size({ws})), (w, i) -> cast({wid} as bigint) * i), "
        f"0L, (a, x) -> (a + x) % 2305843009213693951L) end as fp_ordered",
        f"aggregate({ws}, 0L, (a, w) -> (a + cast({wid} as bigint) * cast({wid} as bigint)) "
        f"% 2305843009213693951L) as fp_bag",
    )
