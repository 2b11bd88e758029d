"""Text → token ids: a deterministic greedy longest-match subword
tokenizer (wordpiece-style, no ## continuation marks).

This is the stage that FEEDS the engine — raw documents become the
``tokens array<int>`` column everything downstream (encode, dedup,
pack_chunks) operates on.  The algorithm is the simplest deterministic
subword scheme: split on single spaces, then per word repeatedly take
the LONGEST vocabulary entry matching at the cursor (falling back to
``UNK_ID`` + advance-one-char when no entry matches, so any unicode
input tokenizes totally).  Deterministic and engine-reproducible by
construction — the DuckDB oracle replays it exactly with a recursive
CTE over the same vocabulary.

Spark shape: a Pandas UDF (Arrow-batched) — genuine per-character
control flow is the sanctioned UDF case; there is no JVM expression
for longest-match scanning.  The UDF is embarrassingly parallel
(zero exchanges, whole-stage scan → udf → output) and keeps a
size-capped word → ids memo per partition: corpus word frequency is
Zipfian, so the memo turns the per-character loop into a dict hit for
the bulk of occurrences while the cap bounds worker memory.  The vocabulary here is a fixed demo table (ASCII singles
+ common English merges); a production run swaps in a learned one —
every code path is vocabulary-agnostic.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F

_MERGES = (
    "the", "ing", "ion", "and", "ent", "er", "re", "on", "at", "or",
    "en", "ti", "es", "te", "an", "in", "is", "it", "ou", "ar",
    "st", "nd", "al", "ed", "to", "of", "ll", "th", "he", "se",
)
_CHARS = ("abcdefghijklmnopqrstuvwxyz"
          "ABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789.,;:!?-_'()")

VOCAB: dict[str, int] = {}
for _c in _CHARS:
    VOCAB[_c] = len(VOCAB)
for _m in _MERGES:
    VOCAB[_m] = len(VOCAB)
UNK_ID = len(VOCAB)
_MAX_LEN = max(len(t) for t in VOCAB)


def tokenize_word(w: str) -> list[int]:
    """Greedy longest-match ids for one word (the reference scalar
    implementation — the UDF memoizes it, the oracle replays it)."""
    out: list[int] = []
    pos, n = 0, len(w)
    while pos < n:
        for ln in range(min(_MAX_LEN, n - pos), 0, -1):
            tid = VOCAB.get(w[pos:pos + ln])
            if tid is not None:
                out.append(tid)
                pos += ln
                break
        else:
            out.append(UNK_ID)
            pos += 1
    return out


def wordpiece_tokenize(df: DataFrame, col: str = "text",
                       id_col: str = "doc_id") -> DataFrame:
    """(id_col, tokens array<int>, n_tok int) for every document; empty
    or NULL text yields an empty array (documents are never dropped)."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # per-PARTITION word memo, size-capped: Zipfian reuse makes most
        # occurrences a dict hit, while the cap bounds worker memory on
        # web-scale partitions full of distinct "words" (URLs, hashes)
        memo: dict[str, list[int]] = {}
        MEMO_CAP = 1 << 20

        def doc_tokens(text) -> list[int]:
            if text is None:
                return []
            out: list[int] = []
            for w in text.split(" "):
                if not w:
                    continue
                ids = memo.get(w)
                if ids is None:
                    ids = tokenize_word(w)
                    if len(memo) < MEMO_CAP:
                        memo[w] = ids
                out.extend(ids)
            return out

        for pdf in batches:
            toks = pdf[col].map(doc_tokens)
            yield pd.DataFrame({
                id_col: pdf[id_col],
                "tokens": toks,
                "n_tok": toks.map(len).astype("int32"),
            })

    id_type = df.schema[id_col].dataType.simpleString()
    out_schema = f"{id_col} {id_type}, tokens array<int>, n_tok int"
    return df.select(id_col, col).mapInPandas(fn, schema=out_schema)


def tokenize_oracle_ctes(table: str = "documents") -> str:
    """The recursive-CTE bodies replaying :func:`wordpiece_tokenize` in
    DuckDB over ``table`` (which needs ``doc_id`` and ``text``): one
    state per (doc, word, cursor), each step taking the longest
    vocabulary entry matching at the cursor (LATERAL top-1 by length)
    or UNK+advance-1.  Returned WITHOUT the ``WITH RECURSIVE`` keyword
    so composite oracles can prepend their own CTEs; the final relation
    is ``step(doc_id, wi, w, pos, tid, ord)`` with one token per row
    where ``tid IS NOT NULL``, ordered within a doc by (wi, ord)."""
    vals = ", ".join("('%s', %d)" % (t.replace("'", "''"), i)
                     for t, i in VOCAB.items())
    return f"""vocab(tok, id) AS (VALUES {vals}),
words AS (
  SELECT doc_id, w, wi FROM (
    SELECT doc_id, unnest(ws) AS w, generate_subscripts(ws, 1) AS wi
    FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM {table}))
  WHERE length(w) > 0),
step(doc_id, wi, w, pos, tid, ord) AS (
  SELECT doc_id, wi, w, 0, CAST(NULL AS INT), 0 FROM words
  UNION ALL
  SELECT doc_id, wi, w, next_pos, next_tid, ord + 1 FROM (
    SELECT s.doc_id, s.wi, s.w, s.ord,
           coalesce(m.mlen, 1) + s.pos AS next_pos,
           coalesce(m.mid, {UNK_ID}) AS next_tid
    FROM step s LEFT JOIN LATERAL (
      SELECT length(v.tok) AS mlen, CAST(v.id AS INT) AS mid
      FROM vocab v
      WHERE v.tok = substr(s.w, s.pos + 1, length(v.tok))
      ORDER BY length(v.tok) DESC LIMIT 1) m ON true
    WHERE s.pos < length(s.w)))"""


def tokenize_oracle_sql(table: str = "documents") -> str:
    """DuckDB replay of :func:`wordpiece_tokenize` over ``table``:
    per-doc token count plus order- and content-sensitive checksums
    (sum and position-weighted sum of ids, positions ordered by
    (word index, step))."""
    return f"""
WITH RECURSIVE {tokenize_oracle_ctes(table)},
toks AS (
  SELECT doc_id, CAST(tid AS BIGINT) AS tid,
         row_number() OVER (PARTITION BY doc_id ORDER BY wi, ord) - 1
             AS gp
  FROM step WHERE tid IS NOT NULL)
SELECT doc_id,
       CAST(count(*) AS INT) AS n_tokens,
       CAST(sum(tid) AS BIGINT) AS tok_sum,
       CAST(sum(tid * gp) AS BIGINT) AS tok_wsum
FROM toks GROUP BY doc_id
"""
