"""Text analysis operators for large-scale training-data pipelines:
language ID, quality scoring, token counting, document fingerprinting.

Everything here is Spark built-ins (split / higher-order array functions /
regexp) — JVM-side, whole-stage-codegen'd, no Python in the hot path — so
the operators scale to 100 TB document corpora limited only by scan + one
shuffle for any grouped aggregation on top.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import Column, DataFrame, functions as F

__all__ = [
    "token_count", "bpe_ish_token_count", "char_count", "distinct_token_ratio",
    "punctuation_ratio", "stopword_hits", "language_id", "quality_score",
    "doc_fingerprint", "text_metrics",
    "dup_line_fraction", "dup_line_char_fraction", "top_ngram_char_fraction",
    "dup_ngram_fraction", "repetition_metrics", "hashing_embedding",
    "corpus_stats",
    "c4_line_filter", "c4_page_keep", "c4_clean",
    "gopher_quality_metrics", "gopher_quality_filter",
    "markdown_to_text",
]

# minimal per-language stopword signatures for the n-gram/stopword heuristic
_LANG_STOPWORDS = {
    "en": ["the", "a", "of", "and", "to", "in", "is"],
    "de": ["der", "die", "das", "und", "ist", "ein"],
    "fr": ["le", "la", "les", "et", "est", "un"],
    "es": ["el", "la", "los", "y", "es", "un"],
    "it": ["il", "la", "gli", "e", "è", "un"],
}


def _tokens(text) -> Column:
    c = F.col(text) if isinstance(text, str) else text
    return F.split(c, " ")


def token_count(text) -> Column:
    """Whitespace token count."""
    return F.size(_tokens(text)).cast("long")


def bpe_ish_token_count(text) -> Column:
    """BPE-ish proxy: count of word / punctuation units via regexp —
    ``\\w+|[^\\w\\s]`` (the classic GPT-2 pre-tokenizer shape)."""
    c = F.col(text) if isinstance(text, str) else text
    return F.regexp_count(c, F.lit(r"\w+|[^\w\s]")).cast("long")


def char_count(text) -> Column:
    c = F.col(text) if isinstance(text, str) else text
    return F.length(c).cast("long")


def distinct_token_ratio(text) -> Column:
    """|distinct tokens| / |tokens| — lexical diversity quality signal."""
    t = _tokens(text)
    return F.size(F.array_distinct(t)) / F.size(t)


def punctuation_ratio(text) -> Column:
    c = F.col(text) if isinstance(text, str) else text
    return F.regexp_count(c, F.lit(r"[^\w\s]")) / F.greatest(F.length(c), F.lit(1))


def stopword_hits(text, lang: str = "en") -> Column:
    """Number of tokens that are stopwords of `lang`."""
    words = _LANG_STOPWORDS[lang]
    t = _tokens(text)
    arr = F.array(*[F.lit(w) for w in words])
    return F.size(F.filter(t, lambda x: F.array_contains(arr, x))).cast("long")


def language_id(text) -> Column:
    """Heuristic language ID: the language with the most stopword hits
    (ties broken by fixed language order); 'und' when no hits."""
    hit_cols = [
        F.struct(stopword_hits(text, lang).alias("hits"), F.lit(i).alias("ord"),
                 F.lit(lang).alias("lang"))
        for i, lang in enumerate(_LANG_STOPWORDS)
    ]
    best = F.array_max(F.array(*[
        F.struct(c.getField("hits").alias("hits"),
                 (-c.getField("ord")).alias("negord"),
                 c.getField("lang").alias("lang"))
        for c in hit_cols
    ]))
    return F.when(best.getField("hits") > 0, best.getField("lang")).otherwise(F.lit("und"))


def quality_score(text) -> Column:
    """Composite quality score in [0,1]:
    0.4·min(1, tokens/64) + 0.4·distinct_ratio + 0.2·(1 − punct_ratio)."""
    t = token_count(text).cast("double")
    return (
        0.4 * F.least(t / F.lit(64.0), F.lit(1.0))
        + 0.4 * distinct_token_ratio(text)
        + 0.2 * (1.0 - punctuation_ratio(text))
    )


def doc_fingerprint(text, modulus: int = 2147483647,
                    method: str = "vectorized") -> Column:
    """Deterministic polynomial rolling hash over characters:
    h = (h*31 + codepoint(ch)) mod M — engine-portable (same result is
    computable in any SQL dialect with a reduce/fold), used for
    order-sensitive near-identity fingerprinting.

    method='vectorized' (default): Arrow-batched numpy — each batch
    decodes docs to code-point rows (one C-level utf-32 encode per doc,
    no per-char Python) and runs Horner column-wise across ALL docs at
    once, so the sequential dependency costs max-doc-length vector ops,
    not total-chars scalar ops. Measured vs the Catalyst HOF (local[32],
    min-of-3): even at ~300-char bench docs, and 2.0x faster at ~3 KB
    docs (0.96 s vs 1.9 s over 50k docs) — F.aggregate's lambda
    evaluates per character, so the gap widens with document length and
    real web corpora sit on the long side.

    method='sql': the declarative F.aggregate fold — keep for plans that
    must stay UDF-free."""
    c = F.col(text) if isinstance(text, str) else text
    if method == "sql":
        chars = F.split(c, "")
        return F.aggregate(
            chars,
            F.lit(0).cast("long"),
            lambda acc, ch: (acc * 31 + F.ascii(ch)) % modulus,
        )

    from rasterframes_spark.functions._kernel import lazy_pandas_udf

    @lazy_pandas_udf("long")
    def fp(s: pd.Series) -> pd.Series:
        vals = s.values
        out = np.empty(len(vals), dtype=object)
        nz = [i for i, t in enumerate(vals) if t is not None]
        if nz:
            codes = [np.frombuffer(str(vals[i]).encode("utf-32-le"),
                                   dtype="<u4").astype("int64") for i in nz]
            lens = np.array([len(a) for a in codes], dtype="int64")
            L = int(lens.max()) if len(lens) else 0
            mat = np.zeros((len(codes), L), dtype="int64")
            for r, a in enumerate(codes):
                mat[r, :len(a)] = a
            h = np.zeros(len(codes), dtype="int64")
            for j in range(L):
                live = lens > j
                h[live] = (h[live] * 31 + mat[live, j]) % modulus
            for t, i in enumerate(nz):
                out[i] = int(h[t])
        return pd.Series(out, dtype=object)

    return fp(c)


# ---------------------------------------------------------------------------
# Repetition metrics (the Gopher / MassiveText quality-filter family:
# Rae et al. 2021, Table A1). All pure Catalyst higher-order array
# functions over the per-document line/token arrays — per-doc scalars in
# one narrow projection, no explode, no shuffle, no Python.


def _lines(text) -> Column:
    c = F.col(text) if isinstance(text, str) else text
    return F.filter(F.split(c, "\n"), lambda l: F.length(l) > 0)


def _word_ngrams(text, n: int) -> Column:
    # zip_with fold over n shifted slices (r9): a transform-over-
    # positions lambda re-inlines the token expression per element
    # (O(words^2) interpreted); zip_with children evaluate once per row
    toks = F.filter(_tokens(text), lambda t: F.length(t) > 0)
    k = F.greatest(F.size(toks) - (n - 1), F.lit(0))
    g = F.slice(toks, 1, F.greatest(k, F.lit(1)))
    for i in range(1, n):
        g = F.zip_with(g, F.slice(toks, i + 1, F.greatest(k, F.lit(1))),
                       lambda a, b: F.concat(a, F.lit(" "), b))
    return F.when(k > 0, g).otherwise(F.array().cast("array<string>"))


def dup_line_fraction(text) -> Column:
    """Fraction of lines that are repeats of an earlier line:
    (n_lines − n_distinct_lines) / n_lines; 0 for empty docs."""
    ls = _lines(text)
    return F.when(F.size(ls) > 0,
                  (F.size(ls) - F.size(F.array_distinct(ls)))
                  / F.size(ls).cast("double")).otherwise(F.lit(0.0))


def dup_line_char_fraction(text) -> Column:
    """Fraction of line characters contained in repeated line occurrences
    (every occurrence beyond a line's first counts its full length).

    One ``aggregate`` fold over the SORTED line array with a
    (prev, extra-chars) struct accumulator — equal lines are adjacent
    after the sort, so a single linear pass attributes repeat chars."""
    ls = _lines(text)
    total = F.aggregate(ls, F.lit(0).cast("long"),
                        lambda acc, x: acc + F.length(x))
    extra = F.aggregate(
        F.array_sort(ls),
        F.struct(F.lit(None).cast("string").alias("prev"),
                 F.lit(0).cast("long").alias("extra")),
        lambda acc, x: F.struct(
            x.alias("prev"),
            (acc["extra"] + F.when(x == acc["prev"], F.length(x))
             .otherwise(F.lit(0))).alias("extra")),
        lambda acc: acc["extra"])
    return F.when(total > 0, extra / total.cast("double")).otherwise(F.lit(0.0))


def top_ngram_char_fraction(text, n: int = 2) -> Column:
    """Fraction of document characters covered by the single most
    frequent word ``n``-gram: count(top gram) · len(top gram) / len(doc).
    Ties break to the lexicographically smallest gram.

    Run-length scan over the sorted n-gram array (aggregate with a
    (prev, run, best_gram, best) accumulator) — no explode, no
    per-doc groupBy."""
    grams = _word_ngrams(text, n)
    c = F.col(text) if isinstance(text, str) else text
    best = F.aggregate(
        F.array_sort(grams),
        F.struct(F.lit(None).cast("string").alias("prev"),
                 F.lit(0).cast("long").alias("run"),
                 F.lit(None).cast("string").alias("best_gram"),
                 F.lit(0).cast("long").alias("best")),
        lambda acc, x: F.struct(
            x.alias("prev"),
            F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1))
            .alias("run"),
            F.when(F.when(x == acc["prev"], acc["run"] + 1)
                   .otherwise(F.lit(1)) > acc["best"], x)
            .otherwise(acc["best_gram"]).alias("best_gram"),
            F.greatest(F.when(x == acc["prev"], acc["run"] + 1)
                       .otherwise(F.lit(1)), acc["best"]).alias("best")),
    )
    return F.when(
        best["best"] > 0,
        best["best"] * F.length(best["best_gram"])
        / F.greatest(F.length(c), F.lit(1)).cast("double"),
    ).otherwise(F.lit(0.0))


def dup_ngram_fraction(text, n: int = 5) -> Column:
    """Fraction of word ``n``-grams that are repeats of an earlier
    occurrence: (n_grams − n_distinct) / n_grams; 0 when the doc is
    shorter than ``n`` tokens."""
    g = _word_ngrams(text, n)
    return F.when(F.size(g) > 0,
                  (F.size(g) - F.size(F.array_distinct(g)))
                  / F.size(g).cast("double")).otherwise(F.lit(0.0))


def repetition_metrics(df: DataFrame, text_col: str = "text",
                       top_ns: tuple = (2, 3, 4),
                       dup_ns: tuple = (5, 10),
                       method: str = "vectorized") -> DataFrame:
    """All Gopher-style repetition signals in one projection. The usual
    filter is e.g. ``dup_line_frac <= 0.30 AND top_2gram_char_frac <=
    0.20 AND dup_5gram_frac <= 0.15``.

    method='vectorized' (default): ONE Arrow crossing computing every
    metric per batch in python dict/Counter passes — measured ~40x
    faster than the Catalyst HOF route at 5k x ~100-token docs (0.4 s vs
    17.5 s): per-element interpreted lambda folds (sort + 4-field struct
    accumulator per n-gram) dominate there. Value-identical (same
    rationals, same rounding site).

    method='sql': the pure-Catalyst per-metric expressions
    (:func:`dup_line_fraction` et al.) — zero Python, composes into any
    plan; right when the projection must stay UDF-free (e.g. streaming
    plans you want fully declarative, or SQL-mirrored oracles)."""
    names = (["dup_line_frac", "dup_line_char_frac"]
             + [f"top_{n}gram_char_frac" for n in top_ns]
             + [f"dup_{n}gram_frac" for n in dup_ns])
    if method == "sql":
        cols = [
            F.round(dup_line_fraction(text_col), 6).alias("dup_line_frac"),
            F.round(dup_line_char_fraction(text_col), 6)
            .alias("dup_line_char_frac"),
        ]
        cols += [F.round(top_ngram_char_fraction(text_col, n), 6)
                 .alias(f"top_{n}gram_char_frac") for n in top_ns]
        cols += [F.round(dup_ngram_fraction(text_col, n), 6)
                 .alias(f"dup_{n}gram_frac") for n in dup_ns]
        return df.select("*", *cols)

    import collections

    from rasterframes_spark.functions._kernel import lazy_pandas_udf
    from rasterframes_spark.pipeline.skew import spread as _spread

    # engage the cores before the per-doc Python pass (no-op at scale
    # or for well-partitioned inputs; see text_metrics — r14)
    df = _spread(df)

    schema = ", ".join(f"{n} double" for n in names)

    @lazy_pandas_udf(f"struct<{schema}>")
    def metrics(s: pd.Series) -> pd.DataFrame:
        rows = []
        for v in s.values:
            if v is None:
                rows.append((None,) * len(names))
                continue
            t = str(v)
            lines = [l for l in t.split("\n") if l]
            nl = len(lines)
            dl = (nl - len(set(lines))) / nl if nl else 0.0
            tot = sum(len(l) for l in lines)
            cnt = collections.Counter(lines)
            extra = sum((k - 1) * len(l) for l, k in cnt.items())
            dlc = extra / tot if tot else 0.0
            # tokens: raw text split on single spaces — EXACTLY the HOF
            # path's tokenization (newline-joined tokens stay one token)
            toks = [x for x in t.split(" ") if x]
            row = [dl, dlc]
            for n in top_ns:
                grams = [" ".join(toks[j:j + n])
                         for j in range(len(toks) - n + 1)]
                if grams:
                    gc = collections.Counter(grams)
                    mx = max(gc.values())
                    g = min(x for x, k in gc.items() if k == mx)
                    row.append(mx * len(g) / max(len(t), 1))
                else:
                    row.append(0.0)
            for n in dup_ns:
                grams = [" ".join(toks[j:j + n])
                         for j in range(len(toks) - n + 1)]
                row.append((len(grams) - len(set(grams))) / len(grams)
                           if grams else 0.0)
            rows.append(tuple(row))
        return pd.DataFrame(rows, columns=names)

    c = F.col(text_col) if isinstance(text_col, str) else text_col
    m = metrics(c).alias("__rep")
    out = df.select("*", m)
    return out.select("*", *[F.round(F.col(f"__rep.{n}"), 6).alias(n)
                             for n in names]).drop("__rep")


def text_metrics(df: DataFrame, text_col: str = "text") -> DataFrame:
    """All per-document metrics in one projection.

    (r14: measured adding a ``_spread`` here — the projection is almost
    all Catalyst with one already-vectorized fingerprint UDF, and the
    round-robin text shuffle cost more than the parallelism bought:
    interleaved A/B 1.15x median. Left as a pure projection.)"""
    return df.select(
        "*",
        token_count(text_col).alias("n_tokens"),
        bpe_ish_token_count(text_col).alias("n_bpe_tokens"),
        char_count(text_col).alias("n_chars_m"),
        F.round(distinct_token_ratio(text_col), 6).alias("distinct_ratio"),
        F.round(punctuation_ratio(text_col), 6).alias("punct_ratio"),
        language_id(text_col).alias("lang_pred"),
        F.round(quality_score(text_col), 6).alias("quality"),
        doc_fingerprint(text_col).alias("fingerprint"),
    )


def hashing_embedding(text, dim: int = 64, seed: int = 42,
                      normalize: bool = True) -> Column:
    """Model-free text embedding via the hashing trick: each token hashes
    to a bucket in [0, dim) with a +/-1 sign from a second hash; the doc
    vector is the signed bucket-count histogram (optionally L2
    normalized). Deterministic, no vocabulary, no model — the standard
    baseline featurizer when no learned embedder is available, and it
    composes directly with cosine_topk / lsh_ann_topk /
    embedding_neardup_pairs / quantize_embeddings.

    Vectorized Arrow pass: one C-speed hash over every token in the
    batch, np.add.at scatter per doc — no python per-token loop."""
    d = int(dim)
    c = F.col(text) if isinstance(text, str) else text

    from rasterframes_spark.functions._kernel import lazy_pandas_udf

    @lazy_pandas_udf("array<double>")
    def emb(s: pd.Series) -> pd.Series:
        out = np.empty(len(s), dtype=object)
        vals = s.values
        docs = [str(v).split() if v is not None else None for v in vals]
        lens = np.array([len(t) if t is not None else 0 for t in docs])
        flat = np.array([tok for t in docs if t for tok in t], dtype=object)
        if len(flat):
            h = pd.util.hash_array(flat)
            idx = (h % np.uint64(d)).astype(np.int64)
            sign = np.where(((h >> np.uint64(32))
                             & np.uint64(1)).astype(bool), 1.0, -1.0)
        pos = 0
        for i, toks in enumerate(docs):
            if toks is None:
                continue
            n = lens[i]
            v = np.zeros(d)
            if n:
                np.add.at(v, idx[pos:pos + n], sign[pos:pos + n])
                pos += n
            if normalize:
                nrm = float(np.sqrt((v * v).sum()))
                if nrm > 0:
                    v = v / nrm
            out[i] = v
        return pd.Series(out, dtype=object)

    _ = seed  # reserved: pandas hash key is fixed; seed kept for API stability
    return emb(c)


def corpus_stats(docs, text_col: str = "text",
                 source_col: str | None = "source") -> dict:
    """One-call corpus profile — the report a curation job prints before
    touching anything: doc/source counts, token and char distributions
    (exact mean, GK-sketch p50/p95), exact-duplicate rate, and the
    language mix.  TWO Spark jobs total (one global agg + one small
    language groupBy), all built-ins, no Python in the hot path; at
    100 TB this is a single pass over the text column.

    Returns a plain dict (driver-sized by construction — every value is
    a scalar or a small map).
    """
    from pyspark.sql import functions as F

    c = F.col(text_col)
    toks = token_count(c)
    has_src = source_col is not None and source_col in docs.columns
    aggs = [
        F.count("*").alias("n_docs"),
        F.sum(toks).alias("total_tokens"),
        F.avg(toks).alias("mean_tokens"),
        F.percentile_approx(toks, [0.5, 0.95]).alias("tok_q"),
        F.avg(F.length(c)).alias("mean_chars"),
        F.percentile_approx(F.length(c), [0.5, 0.95]).alias("chr_q"),
        # dup rate compares distinct NON-NULL texts against the non-null
        # doc count: xxhash64 does NOT null-propagate (NULL hashes to the
        # seed-fold), so nulls are masked out explicitly — otherwise every
        # null-text row counted as a duplicate of the others against
        # n_docs, and the null bucket inflated the distinct count
        F.countDistinct(F.when(c.isNotNull(), F.xxhash64(c)))
        .alias("n_distinct_texts"),
        F.count(c).alias("n_nonnull_texts"),
    ]
    if has_src:
        aggs.append(F.countDistinct(F.col(source_col)).alias("n_sources"))
    row = docs.agg(*aggs).head()
    langs = {r["l"]: r["n"] for r in docs.groupBy(
        language_id(c).alias("l")).agg(F.count("*").alias("n")).collect()}
    n = row["n_docs"]
    out = {
        "n_docs": int(n),
        "total_tokens": int(row["total_tokens"] or 0),
        "mean_tokens": float(row["mean_tokens"] or 0.0),
        "p50_tokens": int(row["tok_q"][0]) if row["tok_q"] else 0,
        "p95_tokens": int(row["tok_q"][1]) if row["tok_q"] else 0,
        "mean_chars": float(row["mean_chars"] or 0.0),
        "p50_chars": int(row["chr_q"][0]) if row["chr_q"] else 0,
        "p95_chars": int(row["chr_q"][1]) if row["chr_q"] else 0,
        "exact_dup_rate": (
            1.0 - row["n_distinct_texts"] / row["n_nonnull_texts"]
            if row["n_nonnull_texts"] else 0.0),
        "n_null_texts": int(n - row["n_nonnull_texts"]),
        "languages": langs,
    }
    if has_src:
        out["n_sources"] = int(row["n_sources"])
    return out


# ---------------------------------------------------------------------------
# C4 cleanup (Raffel et al. 2020, "Exploring the Limits of Transfer
# Learning...", §2.2) — the canonical web-scrape line/page filter. All
# pure Catalyst (split + HOF filter + regexp), no UDF, no shuffle.
# ---------------------------------------------------------------------------


_C4_TERMINAL = '[.!?"\']$'   # period / ! / ? / end quote, on the trimmed line


def c4_line_filter(text, min_words: int = 3,
                   ban: tuple = ("javascript",)) -> Column:
    """C4 line rules: keep only lines that end in terminal punctuation,
    have at least ``min_words`` words, and contain none of the ``ban``
    words (case-insensitive; the paper bans 'javascript' — the cookie/JS
    boilerplate signature). Returns the document rebuilt from the kept
    lines (newline-joined; empty string when nothing survives)."""
    c = F.col(text) if isinstance(text, str) else text

    def ok(line):
        t = F.trim(line)
        cond = t.rlike(_C4_TERMINAL) & (
            F.size(F.filter(F.split(t, r"\s+"),
                            lambda w: F.length(w) > 0)) >= int(min_words))
        low = F.lower(t)
        for b in ban:
            cond = cond & ~low.contains(b.lower())
        return cond

    return F.array_join(F.filter(F.split(c, "\n"), ok), "\n")


def c4_page_keep(cleaned_text, min_sentences: int = 5) -> Column:
    """C4 page rules over the line-filtered text: drop pages containing
    'lorem ipsum' (placeholder boilerplate) or a curly brace (leaked
    code/markup), or with fewer than ``min_sentences`` sentences
    (terminal-punctuation count). Boolean keep verdict."""
    c = (F.col(cleaned_text) if isinstance(cleaned_text, str)
         else cleaned_text)
    nsent = F.regexp_count(c, F.lit(r"[.!?]"))
    return (~F.lower(c).contains("lorem ipsum") & ~c.contains("{")
            & (nsent >= int(min_sentences)))


def c4_clean(df: DataFrame, text_col: str = "text", min_words: int = 3,
             min_sentences: int = 5, ban: tuple = ("javascript",),
             out_col: str = "c4_text") -> DataFrame:
    """The full C4 cleanup: line-filter every document, then drop pages
    failing the page rules. Adds ``out_col`` with the cleaned text and
    returns only surviving pages. One narrow projection + filter —
    Catalyst pushes it to the scan; at 100 TB this is a map-only pass."""
    out = df.withColumn(out_col, c4_line_filter(F.col(text_col),
                                                min_words, ban))
    return out.where(c4_page_keep(F.col(out_col), min_sentences))


# ---------------------------------------------------------------------------
# Gopher / MassiveText document-quality rules (Rae et al. 2021, Table A1
# "quality filtering" — the companion of the repetition family above).
# Pure Catalyst; one narrow projection, no shuffle, no Python.
# ---------------------------------------------------------------------------


_GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")


def gopher_quality_metrics(text) -> Column:
    """The seven Gopher quality signals as one struct column:

    n_words, mean_word_len, symbol_word_ratio (# and ellipsis per word),
    bullet_line_frac (lines starting with a bullet), ellipsis_line_frac
    (lines ending in an ellipsis), alpha_word_frac (words containing at
    least one letter), stopword_count (how many of Gopher's 8 common
    English words appear at least once)."""
    c = F.col(text) if isinstance(text, str) else text
    words = F.filter(F.split(c, r"\s+"), lambda w: F.length(w) > 0)
    nw = F.size(words)
    nwd = F.greatest(nw, F.lit(1)).cast("double")
    total_chars = F.aggregate(words, F.lit(0).cast("long"),
                              lambda a, w: a + F.length(w))
    lines = F.filter(F.split(c, "\n"),
                     lambda l: F.length(F.trim(l)) > 0)
    nl = F.greatest(F.size(lines), F.lit(1)).cast("double")
    bullets = F.size(F.filter(
        lines, lambda l: F.trim(l).rlike(r"^[•‣▪\-\*]")))
    ellipses = F.size(F.filter(
        lines, lambda l: F.trim(l).rlike(r"(\.\.\.|…)$")))
    alpha = F.size(F.filter(words, lambda w: w.rlike("[A-Za-z]")))
    stop_arr = F.array(*[F.lit(s) for s in _GOPHER_STOPWORDS])
    stops = F.size(F.array_intersect(
        F.array_distinct(F.transform(words, F.lower)), stop_arr))
    symbols = F.regexp_count(c, F.lit(r"#|\.\.\.|…"))
    return F.struct(
        nw.cast("long").alias("n_words"),
        (total_chars / nwd).alias("mean_word_len"),
        (symbols / nwd).alias("symbol_word_ratio"),
        (bullets / nl).alias("bullet_line_frac"),
        (ellipses / nl).alias("ellipsis_line_frac"),
        (alpha / nwd).alias("alpha_word_frac"),
        stops.cast("int").alias("stopword_count"))


def gopher_quality_filter(df: DataFrame, text_col: str = "text",
                          min_words: int = 50, max_words: int = 100_000,
                          min_mean_word_len: float = 3.0,
                          max_mean_word_len: float = 10.0,
                          max_symbol_word_ratio: float = 0.1,
                          max_bullet_line_frac: float = 0.90,
                          max_ellipsis_line_frac: float = 0.30,
                          min_alpha_word_frac: float = 0.80,
                          min_stopwords: int = 2,
                          metrics_col: str | None = None) -> DataFrame:
    """Drop documents failing the Gopher quality rules (paper defaults:
    50-100k words, mean word length 3-10, <=10% symbols/word, <=90%
    bullet lines, <=30% ellipsis lines, >=80% alphabetic words, >=2 of
    the 8 common stop words). ``metrics_col`` keeps the metrics struct
    on the survivors for auditing. Map-only — Catalyst evaluates the
    whole predicate at the scan."""
    m = gopher_quality_metrics(F.col(text_col))
    out = df.withColumn("__gq", m)
    g = F.col("__gq")
    keep = ((g["n_words"] >= int(min_words))
            & (g["n_words"] <= int(max_words))
            & (g["mean_word_len"] >= float(min_mean_word_len))
            & (g["mean_word_len"] <= float(max_mean_word_len))
            & (g["symbol_word_ratio"] <= float(max_symbol_word_ratio))
            & (g["bullet_line_frac"] <= float(max_bullet_line_frac))
            & (g["ellipsis_line_frac"] <= float(max_ellipsis_line_frac))
            & (g["alpha_word_frac"] >= float(min_alpha_word_frac))
            & (g["stopword_count"] >= int(min_stopwords)))
    out = out.where(keep)
    if metrics_col:
        return out.withColumnRenamed("__gq", metrics_col)
    return out.drop("__gq")


def markdown_to_text(text) -> Column:
    """Markdown -> plain text: the GitHub/docs-corpus ingest pass.

    Strips the syntax that would pollute token statistics while keeping
    every word: code fences (markers dropped, code text kept — dropping
    code bodies is a policy for ``c4_clean``-style filters, not the
    renderer), inline-code backticks, images to their alt text, links to
    their anchor text, heading/blockquote/list markers, emphasis
    markers, table pipes and horizontal rules. One codegen'd
    ``regexp_replace`` chain — no UDF, no shuffle."""
    c = F.col(text) if isinstance(text, str) else text
    # code fences: drop the ``` marker lines (keep fenced content)
    c = F.regexp_replace(c, r"(?m)^\s*(```+|~~~+)[^\n]*$", "")
    # images ![alt](url) -> alt, then links [text](url) -> text
    c = F.regexp_replace(c, r"!\[([^\]]*)\]\([^)]*\)", r"$1")
    c = F.regexp_replace(c, r"\[([^\]]+)\]\([^)]*\)", r"$1")
    # reference-style link definitions: whole line goes
    c = F.regexp_replace(c, r"(?m)^\s*\[[^\]]+\]:\s+\S+[^\n]*$", "")
    # headings / blockquotes / list markers at line start
    c = F.regexp_replace(c, r"(?m)^\s*#{1,6}\s+", "")
    c = F.regexp_replace(c, r"(?m)^\s*>\s?", "")
    c = F.regexp_replace(c, r"(?m)^\s*([-*+]|\d+\.)\s+", "")
    # horizontal rules and table separator rows (|---|:---:|)
    c = F.regexp_replace(c, r"(?m)^\s*([-*_]\s*){3,}$", "")
    c = F.regexp_replace(c, r"(?m)^\s*\|?[-:\s|]*-[-:\s|]*\|?\s*$", "")
    # emphasis/strikethrough/inline code markers (keep the words);
    # underscores only at word edges — snake_case identifiers keep theirs
    c = F.regexp_replace(c, r"(\*\*|\*|~~|`)", "")
    c = F.regexp_replace(c, r"(?<!\w)_{1,2}(?=\S)|(?<=\S)_{1,2}(?!\w)", "")
    # table pipes -> spaces (never across line ends); collapse leftovers
    c = F.regexp_replace(c, r"(?m)^[ \t]*\|", "")
    c = F.regexp_replace(c, r"[ \t]*\|[ \t]*", " ")
    c = F.regexp_replace(c, r"(?m)[ \t]+$", "")
    c = F.regexp_replace(c, r"\n{3,}", "\n\n")
    return F.btrim(c, F.lit(" \n\t"))
