"""Trainable byte-level BPE tokenizer — the real thing, Spark-first.

``bpe_ish_token_count`` (pipeline/text.py) is a regex proxy; training
pipelines that budget by tokens need the actual merge-based count.  This
module implements GPT-2-style byte-level BPE:

- **Training** (`train_bpe`): the corpus-scale part — per-word frequency
  counting — runs DISTRIBUTED (regexp pre-tokenization exploded to
  (word, count) partial aggregates; only the bounded top-``max_words``
  distinct words reach the driver, ~the IVF-centroid pattern).  The
  merge loop itself is inherently sequential and runs on the driver over
  that bounded word-frequency table — exactly how production BPE
  trainers work (they too train on a bounded sample).
- **Encoding** (`bpe_encode` / `bpe_token_count`): the merge ranks
  broadcast to executors; one Arrow-batched pandas pass applies the
  greedy lowest-rank merge loop per pre-token with an LRU word cache
  (web text repeats words heavily, so amortized cost is ~a dict hit per
  token).

Byte-level alphabet = 256 initial symbols, so ANY text round-trips:
``bpe_decode(bpe_encode(x)) == x`` byte-for-byte, which is the
self-oracle the tests pin alongside hand-computed merge sequences.
No SQL oracle: iterative merging is not expressible in DuckDB — the
driver records this operator's gate as pytest-verified (the
genuinely-non-SQL-expressible class the correctness contract allows).
"""

from __future__ import annotations

import re
from collections import Counter

import pandas as pd

from pyspark.sql import DataFrame, functions as F

__all__ = ["train_bpe", "bpe_encode", "bpe_token_count", "bpe_decode",
           "bpe_encode_text"]

# GPT-2-ish pre-tokenizer: leading-space words, numbers, punctuation runs
# re.ASCII keeps \w/\s identical to the JVM regex used in the
# distributed counting stage (Java \w is ASCII-only)
_PRETOK = re.compile(r" ?\w+| ?[^\w\s]+|\s+", re.ASCII)


def _pretokenize(text: str) -> list[str]:
    return _PRETOK.findall(text)


def train_bpe(df: DataFrame, text_col: str = "text",
              num_merges: int = 1000, max_words: int = 100_000) -> dict:
    """Learn a byte-level BPE model from a corpus column.

    Returns ``{"merges": [(sym_a, sym_b), ...]}`` where symbols are
    `bytes`; merge order IS the rank table.  The distributed stage ships
    only (pre-token, count) partial aggregates; the driver sees at most
    ``max_words`` distinct pre-tokens (most-frequent first, ties broken
    by token bytes for determinism).
    """
    c = F.col(text_col)
    words = (df.select(F.explode(
        F.expr(r"regexp_extract_all(" + text_col
               + r", ' ?\\w+| ?[^\\w\\s]+|\\s+', 0)")).alias("w"))
        .groupBy("w").agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("w"))
        .limit(int(max_words))
        .collect())
    _ = c
    freqs = {r["w"].encode("utf-8"): int(r["n"]) for r in words}
    # driver merge loop over the bounded word table
    seqs = {w: [bytes([b]) for b in w] for w in freqs}
    merges: list[tuple[bytes, bytes]] = []
    for _ in range(int(num_merges)):
        pair_counts: Counter = Counter()
        for w, seq in seqs.items():
            n = freqs[w]
            for a, b in zip(seq, seq[1:]):
                pair_counts[(a, b)] += n
        if not pair_counts:
            break
        # deterministic argmax: count desc, then lexicographic pair
        best, bc = None, -1
        for p, n in pair_counts.items():
            if n > bc or (n == bc and (best is None or p < best)):
                best, bc = p, n
        if bc < 2:
            break
        merges.append(best)
        ab = best[0] + best[1]
        for w, seq in seqs.items():
            if best[0] not in seq:
                continue
            out = []
            i = 0
            while i < len(seq):
                if (i + 1 < len(seq) and seq[i] == best[0]
                        and seq[i + 1] == best[1]):
                    out.append(ab)
                    i += 2
                else:
                    out.append(seq[i])
                    i += 1
            seqs[w] = out
    return {"merges": merges}


def _encode_word(w: bytes, ranks: dict) -> list[bytes]:
    seq = [bytes([b]) for b in w]
    while len(seq) > 1:
        best_i, best_r = -1, None
        for i in range(len(seq) - 1):
            r = ranks.get((seq[i], seq[i + 1]))
            if r is not None and (best_r is None or r < best_r):
                best_i, best_r = i, r
        if best_r is None:
            break
        seq[best_i:best_i + 2] = [seq[best_i] + seq[best_i + 1]]
    return seq


def bpe_encode_text(text: str, model: dict,
                    _cache: dict | None = None) -> list[bytes]:
    """Pure-python reference encoder (also the executor kernel)."""
    ranks = model.get("_ranks")
    if ranks is None:
        ranks = {tuple(p): i for i, p in enumerate(model["merges"])}
    out: list[bytes] = []
    for tok in _pretokenize(text):
        w = tok.encode("utf-8")
        if _cache is not None:
            enc = _cache.get(w)
            if enc is None:
                enc = _encode_word(w, ranks)
                if len(_cache) < 200_000:
                    _cache[w] = enc
        else:
            enc = _encode_word(w, ranks)
        out.extend(enc)
    return out


def bpe_decode(tokens: list[bytes]) -> str:
    return b"".join(tokens).decode("utf-8")


def bpe_encode(df: DataFrame, model: dict, text_col: str = "text",
               out_col: str = "bpe_tokens") -> DataFrame:
    """Append an ``array<binary>`` column of BPE tokens (byte symbols).
    The merges table broadcasts inside the Arrow-batched closure; one
    python crossing per batch."""
    merges = list(model["merges"])

    def run(batches):
        ranks = {tuple(p): i for i, p in enumerate(merges)}
        m = {"merges": merges, "_ranks": ranks}
        cache: dict = {}
        for pdf in batches:
            pdf = pdf.copy()
            pdf[out_col] = [
                bpe_encode_text(t if t is not None else "", m, cache)
                for t in pdf[text_col]]
            yield pdf

    schema = ", ".join(f"{f.name} {f.dataType.simpleString()}"
                       for f in df.schema.fields) \
        + f", {out_col} array<binary>"
    return df.mapInPandas(run, schema=schema)


def bpe_token_count(df: DataFrame, model: dict, text_col: str = "text",
                    out_col: str = "bpe_n_tokens") -> DataFrame:
    """Append the real merge-based token count (the number training
    budgets actually depend on — the regex proxy overcounts rare words
    and undercounts merged frequent ones)."""
    merges = list(model["merges"])

    def run(batches):
        ranks = {tuple(p): i for i, p in enumerate(merges)}
        m = {"merges": merges, "_ranks": ranks}
        cache: dict = {}
        for pdf in batches:
            pdf = pdf.copy()
            pdf[out_col] = pd.array(
                [len(bpe_encode_text(t if t is not None else "", m, cache))
                 for t in pdf[text_col]], dtype="int64")
            yield pdf

    schema = ", ".join(f"{f.name} {f.dataType.simpleString()}"
                       for f in df.schema.fields) \
        + f", {out_col} bigint"
    return df.mapInPandas(run, schema=schema)
