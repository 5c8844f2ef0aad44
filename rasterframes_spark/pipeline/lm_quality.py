"""Character n-gram language-model quality scoring (the CCNet signal).

The classic web-corpus quality filter: train a small character LM on an
in-domain (or whole-corpus) sample, score every document by bits per
character, drop the tails.  Pure Spark shapes:

- **Training** (`train_char_lm`): n-gram and (n-1)-gram counting runs
  DISTRIBUTED as pure Catalyst (``transform(sequence(...))`` +
  ``explode`` + groupBy — no UDF); only the aggregated gram table
  reaches the driver (optionally capped at ``top_grams`` most frequent
  for web-scale alphabets; uncapped for the oracle-checked config).
- **Scoring** (`lm_bits_per_char`): the gram tables broadcast inside
  one Arrow-batched pandas pass; additively-smoothed backoff
  ``P(c|ctx) = (cnt(ctx·c) + a) / (cnt(ctx) + a·V)`` with V = distinct
  characters in the training corpus.

Both halves are closed-form enough that DuckDB re-derives the ENTIRE
train+score computation in SQL (the ``ppl`` family of the
``text_quality`` oracle slot) — the training counts, the vocabulary
size, and every document's bits/char all value-match.
"""

from __future__ import annotations

import math

import pandas as pd

from pyspark.sql import DataFrame, functions as F

__all__ = ["train_char_lm", "lm_bits_per_char"]


def _grams(text_col: str, n: int):
    # NB: guard short strings explicitly — Spark's sequence(1, 0) yields
    # the DESCENDING [1, 0], not an empty array
    return F.expr(
        f"case when length({text_col}) >= {n} then "
        f"transform(sequence(1, length({text_col}) - {n - 1}),"
        f" i -> substring({text_col}, i, {n})) "
        f"else array() end")


#: Default driver-side gram-table cap.  An order-3 char-gram count over a
#: CJK-heavy web corpus is millions of distinct grams; collecting them all
#: can OOM the driver, so the default is bounded.  Pass ``top_grams=None``
#: to opt out explicitly (exact counts, e.g. for oracle verification).
DEFAULT_TOP_GRAMS = 1 << 20


def train_char_lm(df: DataFrame, text_col: str = "text", order: int = 3,
                  alpha: float = 0.1,
                  top_grams: int | None = DEFAULT_TOP_GRAMS) -> dict:
    """Count ``order``-grams and their contexts over the corpus column.

    Returns ``{"order", "alpha", "vocab_size", "grams": {str: int},
    "contexts": {str: int}}``.  ``top_grams`` caps the driver-side gram
    table for huge alphabets (CJK corpora; default ``2**20``); pass
    ``None`` explicitly for exact, uncapped counts.  When capped, the
    retained CONTEXT set is derived from the retained grams (each kept
    gram's (n-1)-gram context count is always present), so the smoothed
    ``P(c|ctx) = (cnt(g)+a)/(cnt(ctx)+aV)`` stays <= 1 — truncating the
    two tables independently could drop a kept gram's context and yield
    probabilities above 1 (negative bits/char).
    """
    if order < 2:
        raise ValueError("train_char_lm: order must be >= 2")
    gq = (df.select(F.explode(_grams(text_col, order)).alias("g"))
          .groupBy("g").agg(F.count(F.lit(1)).alias("n")))
    cq = (df.select(F.explode(_grams(text_col, order - 1)).alias("g"))
          .groupBy("g").agg(F.count(F.lit(1)).alias("n")))
    if top_grams:
        gq = gq.orderBy(F.desc("n"), F.asc("g")).limit(int(top_grams))
        # Exact counts for exactly the contexts the kept grams need
        # (<= top_grams rows, so the broadcast semi-join is bounded).
        kept_ctx = gq.select(
            F.expr("substring(g, 1, length(g) - 1)").alias("g")).distinct()
        cq = cq.join(F.broadcast(kept_ctx), "g", "left_semi")
    vocab = (df.select(F.explode(_grams(text_col, 1)).alias("c"))
             .agg(F.countDistinct("c")).head()[0]) or 1
    return {
        "order": int(order),
        "alpha": float(alpha),
        "vocab_size": int(vocab),
        "grams": {r["g"]: int(r["n"]) for r in gq.collect()},
        "contexts": {r["g"]: int(r["n"]) for r in cq.collect()},
    }


def lm_bits_per_char(df: DataFrame, model: dict, text_col: str = "text",
                     out_col: str = "lm_bits_per_char") -> DataFrame:
    """Append each document's average bits per character under the
    model (lower = more in-domain / fluent; the CCNet head/middle/tail
    split keys on exactly this number).  Documents shorter than the
    model order score null."""
    order = model["order"]
    alpha = model["alpha"]
    v = model["vocab_size"]
    grams = model["grams"]
    ctxs = model["contexts"]

    def run(batches):
        log2 = math.log(2.0)
        for pdf in batches:
            vals = []
            for t in pdf[text_col]:
                if t is None or len(t) < order:
                    vals.append(None)
                    continue
                total = 0.0
                m = len(t) - order + 1
                for i in range(m):
                    g = t[i:i + order]
                    c = g[:-1]
                    p = (grams.get(g, 0) + alpha) \
                        / (ctxs.get(c, 0) + alpha * v)
                    total -= math.log(p) / log2
                vals.append(total / m)
            pdf = pdf.copy()
            pdf[out_col] = pd.array(vals, dtype="float64")
            yield pdf

    schema = ", ".join(f"{f.name} {f.dataType.simpleString()}"
                       for f in df.schema.fields) + f", {out_col} double"
    return df.mapInPandas(run, schema=schema)
