"""Distributed BPE tokenizer training (Sennrich et al., ACL 2016).

The tokenizer-training step of an LLM data pipeline, spelled for Spark's
execution model. The classic algorithm never iterates over the corpus:
it iterates over the WORD-FREQUENCY DICTIONARY. So the corpus-sized work
here is exactly one distributed word count (one shuffle over the token
stream); every merge round after that runs on the |vocab|-row dictionary
— an adjacent-pair count (map-side combinable agg), a 1-row argmax
collect, and a row-local fold applying the merge. 100 TB of text, same
20 cheap rounds.

Everything is native Spark exprs — the merge application is an
``aggregate`` higher-order fold (greedy left-to-right non-overlapping,
the standard BPE semantics), no Python in any row path. Determinism:
pair argmax ties break on (count DESC, pair ASC); given the same corpus
the merge table is bit-identical across runs and layouts
(tests/test_bpe.py pins a hand-computed example and layout invariance).

No DuckDB oracle: 20 data-dependent iterations don't fit a SQL replay —
the q_bpe_train driver key is rows-only; correctness is pytest-gated.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

END_MARK = "▁"  # ▁ word-end sentinel (SentencePiece convention)


def word_frequencies(
    df: DataFrame, text_col: str = "text", min_count: int = 1
) -> DataFrame:
    """The one corpus-scale pass: whitespace words → (word, n) dict.
    Map-side combinable; the only shuffle keyed on the word."""
    w = df.select(
        F.explode(F.split(F.trim(F.col(text_col)), r"\s+")).alias("word")
    ).filter(F.length("word") > 0)
    out = w.groupBy("word").agg(F.count("*").cast("long").alias("n"))
    return out.filter(F.col("n") >= min_count) if min_count > 1 else out


def _merge_expr(a: str, b: str) -> str:
    """Greedy left-to-right fold replacing adjacent (a, b) with a||b —
    literal values are SQL-escaped; the fold is the textbook BPE merge
    application (non-overlapping: a merged symbol never re-merges with
    the next occurrence's left half in the same round)."""
    qa = a.replace("\\", "\\\\").replace("'", "\\'")
    qb = b.replace("\\", "\\\\").replace("'", "\\'")
    return (
        "aggregate(syms, CAST(array() AS ARRAY<STRING>), (acc, x) -> "
        f"CASE WHEN size(acc) > 0 AND element_at(acc, -1) = '{qa}' "
        f"AND x = '{qb}' "
        f"THEN concat(slice(acc, 1, size(acc) - 1), array('{qa}{qb}')) "
        "ELSE concat(acc, array(x)) END)"
    )


# A FIXED merge table over the corpus vocabulary — the "shipped
# tokenizer artifact" shape: production segmentation runs a frozen
# vocab, not a fresh training pass, so the oracle-gated q_bpe_segment
# key applies THIS table (literals on both engines, single source of
# truth) rather than a data-dependent trained one. Deliberately deep
# cascades: later merges consume earlier merges' outputs ('spar'+'k',
# 'ta'+'ble') so the rank-sequential fold semantics are actually
# exercised, not just single-step pairs.
FIXED_MERGES: list[tuple[str, str]] = [
    ("t", "h"), ("th", "e"), ("the", END_MARK),
    ("a", "g"), ("ag", "g"), ("agg", END_MARK),
    ("r", "o"), ("ro", "w"), ("row", END_MARK),
    ("s", "p"), ("sp", "a"), ("spa", "r"), ("spar", "k"), ("spark", END_MARK),
    ("a", END_MARK),
    ("e", "y"), ("k", "ey"), ("key", END_MARK),
    ("t", "a"), ("b", "l"), ("bl", "e"), ("ta", "ble"), ("table", END_MARK),
]


def fixed_merge_table() -> list[dict]:
    """FIXED_MERGES in the [{rank, left, right, merged, count}] shape
    ``bpe_segment`` consumes."""
    return [
        {"rank": i, "left": a, "right": b, "merged": a + b, "count": 0}
        for i, (a, b) in enumerate(FIXED_MERGES)
    ]


def fixed_merge_values_sql() -> str:
    """The same table as a SQL VALUES list ``(rank, l, r)`` — the
    DuckDB oracle's copy, emitted from the ONE Python source of truth
    (the q_dedup_embed_portable hyperplane-generator precedent)."""
    rows = ", ".join(
        "({}, '{}', '{}')".format(i, a.replace("'", "''"), b.replace("'", "''"))
        for i, (a, b) in enumerate(FIXED_MERGES)
    )
    return rows


def _train_on_collected(
    vocab: list[tuple[list[str], int]], num_merges: int
) -> list[dict]:
    """The merge loop on a DRIVER-LOCAL word dictionary — the classic
    in-memory BPE trainer, bit-identical to the distributed loop: pair
    counts include overlapping adjacencies (every index i), argmax ties
    break (count DESC, pair ASC — Python str comparison is code-point
    order = Spark's UTF8 binary order, which UTF-8 preserves), merges
    apply greedily left-to-right non-overlapping (the ``_merge_expr``
    fold), and training stops when the best pair count is < 2."""
    merges: list[dict] = []
    for rank in range(num_merges):
        counts: dict[tuple[str, str], int] = {}
        for syms, n in vocab:
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                counts[p] = counts.get(p, 0) + n
        if not counts:
            break
        (a, b) = min(counts, key=lambda p: (-counts[p], p))
        c = counts[(a, b)]
        if c < 2:
            break
        merges.append(
            {"rank": rank, "left": a, "right": b, "merged": a + b, "count": c}
        )
        for idx, (syms, n) in enumerate(vocab):
            out: list[str] = []
            for x in syms:
                if out and out[-1] == a and x == b:
                    out[-1] = a + b
                else:
                    out.append(x)
            vocab[idx] = (out, n)
    return merges


#: Dictionary sizes at or below this run the merge loop driver-side —
#: ~65k short words is a few MB, far under any driver budget, while 20
#: distributed rounds on a frame this small are pure job-scheduling
#: latency (r18 measurement: the sf0.1 corpus dictionary is 31 words and
#: each Spark round cost ~0.22 s of overhead). Above it the loop stays
#: fully distributed — the 100 TB (~10M-word-vocab) path is unchanged.
DRIVER_VOCAB_ROWS = 65536


def bpe_train(
    docs: DataFrame,
    text_col: str = "text",
    num_merges: int = 20,
    min_count: int = 1,
    driver_vocab_rows: int = DRIVER_VOCAB_ROWS,
) -> list[dict]:
    """Learn ``num_merges`` BPE merges from the corpus. Returns the
    merge table: [{rank, left, right, merged, count}] in learned order —
    the artifact a tokenizer ships.

    Scale: ONE corpus pass builds the word dictionary; when the
    dictionary is small (≤ ``driver_vocab_rows``, a bounded collect)
    the 20 merge rounds run driver-side in exact Python — bit-identical
    argmax/merge semantics, none of the per-round Spark job latency.
    Past the bound the loop stays distributed: the dictionary frame is
    lazily localCheckpointed every round (lineage would otherwise grow
    by one fold per merge); per round the executors see |vocab| rows
    twice (pair agg + merge fold) and the driver sees ONE row. The
    size gate is a single count over the checkpointed dictionary."""
    dict_df = word_frequencies(docs, text_col, min_count).select(
        F.expr(
            f"concat(split(word, ''), array('{END_MARK}'))"
        ).alias("syms"),
        "n",
    ).localCheckpoint(eager=False)

    if driver_vocab_rows and dict_df.count() <= driver_vocab_rows:
        vocab = [
            (list(r["syms"]), int(r["n"])) for r in dict_df.collect()
        ]
        return _train_on_collected(vocab, num_merges)

    merges: list[dict] = []
    for rank in range(num_merges):
        pairs = dict_df.select(
            F.explode(
                F.expr(
                    "CASE WHEN size(syms) < 2 THEN CAST(array() AS "
                    "ARRAY<STRUCT<a: STRING, b: STRING>>) ELSE "
                    "transform(sequence(0, size(syms) - 2), "
                    "i -> struct(syms[i] AS a, syms[i + 1] AS b)) END"
                )
            ).alias("p"),
            "n",
        )
        top = (
            pairs.groupBy("p")
            .agg(F.sum("n").alias("c"))
            .orderBy(F.col("c").desc(), F.col("p.a").asc(), F.col("p.b").asc())
            .limit(1)
            .collect()
        )
        if not top or top[0]["c"] < 2:
            break  # nothing left worth merging
        a, b, c = top[0]["p"]["a"], top[0]["p"]["b"], int(top[0]["c"])
        merges.append(
            {"rank": rank, "left": a, "right": b, "merged": a + b, "count": c}
        )
        dict_df = dict_df.select(
            F.expr(_merge_expr(a, b)).alias("syms"), "n"
        ).localCheckpoint(eager=False)
    return merges


def bpe_segment(
    df: DataFrame,
    merges: list[dict],
    text_col: str = "text",
    out_col: str = "bpe_tokens",
) -> DataFrame:
    """Apply a learned merge table to text — per-word char split + the
    merge folds in learned order, all native exprs (the fold chain is
    ``len(merges)`` nested expressions; fine for the tens-of-merges
    regime this trainer targets — a production 32k-merge vocab would
    compile the merge table into a pandas_udf trie instead)."""
    words = df.withColumn(
        "_w", F.split(F.trim(F.col(text_col)), r"\s+")
    )
    seg = (
        f"transform(_w, wrd -> concat(split(wrd, ''), array('{END_MARK}')))"
    )
    col = F.expr(seg)
    words = words.withColumn("_syms_list", col)
    # fold each learned merge over every word's symbol array, in order
    apply_all = "x"
    for m in merges:
        qa = m["left"].replace("\\", "\\\\").replace("'", "\\'")
        qb = m["right"].replace("\\", "\\\\").replace("'", "\\'")
        apply_all = (
            "aggregate(" + apply_all + ", CAST(array() AS ARRAY<STRING>), "
            f"(acc, s) -> CASE WHEN size(acc) > 0 AND "
            f"element_at(acc, -1) = '{qa}' AND s = '{qb}' "
            f"THEN concat(slice(acc, 1, size(acc) - 1), array('{qa}{qb}')) "
            "ELSE concat(acc, array(s)) END)"
        )
    return words.withColumn(
        out_col,
        F.expr(f"flatten(transform(_syms_list, x -> {apply_all}))"),
    ).drop("_w", "_syms_list")


def bpe_segment_by_key(
    df: DataFrame,
    merges: list[dict],
    key_col: str = "doc_id",
    text_col: str = "text",
    out_col: str = "bpe_tokens",
) -> DataFrame:
    """Keyed segmenter using the DICTIONARY TRICK (the same insight
    bpe_train rides): fold each DISTINCT word exactly once on a
    vocab-sized frame, broadcast the (word → symbols) map back onto
    the positional word stream, and reassemble each document's token
    sequence in order. Zipf makes the distinct-word frame bounded
    (vocab-sized) at any corpus size, so the nested fold expression —
    the expensive part of :func:`bpe_segment`, which re-folds every
    word INSTANCE — runs on thousands of rows instead of billions.
    Identical output to ``bpe_segment`` (pytest-pinned, INCLUDING
    empty/whitespace-only documents: the word stream deliberately keeps
    zero-length words — ``split(trim(text), '\\s+')`` yields them for
    empty texts and texts with leading non-space whitespace, and both
    the per-row fold and the DuckDB oracle segment them to
    ``['', END_MARK]`` — a length filter here would drop such docs from
    the output entirely and break the hash gate); this is the form the
    oracle-gated q_bpe_segment key runs."""
    words = df.select(
        key_col,
        F.posexplode(
            F.split(F.trim(F.col(text_col)), r"\s+")
        ).alias("_pos", "_fs_word"),
    )
    vocab = words.select("_fs_word").distinct()
    seg = bpe_segment(
        vocab, merges, text_col="_fs_word", out_col="_syms"
    ).select("_fs_word", "_syms")
    joined = words.join(F.broadcast(seg), "_fs_word")
    return joined.groupBy(key_col).agg(
        F.flatten(
            F.expr(
                "transform(array_sort(collect_list(struct(_pos, _syms))),"
                " x -> x._syms)"
            )
        ).alias(out_col)
    )


def bpe_segment_fast(
    df: DataFrame,
    merges: list[dict],
    text_col: str = "text",
    out_col: str = "bpe_tokens",
) -> DataFrame:
    """Production segmenter for LARGE merge tables: an Arrow-batched
    pandas_udf applying merges by RANK PRIORITY with a per-word cache —
    the path a 32k-merge production vocab takes (the native
    ``bpe_segment`` compiles one nested fold per merge, fine for tens of
    merges, quadratic plan growth beyond). Rank-priority application is
    equivalent to sequential rank-order application (a merge can never
    create an adjacency of literal earlier-merge symbols), which the
    tests assert empirically against the native segmenter."""
    from pyspark.sql.functions import pandas_udf

    ranks = {(m["left"], m["right"]): m["rank"] for m in merges}

    @pandas_udf("array<string>")
    def seg(texts: pd.Series) -> pd.Series:
        cache: dict[str, list[str]] = {}

        def word_syms(w: str) -> list[str]:
            got = cache.get(w)
            if got is not None:
                return got
            syms = list(w) + [END_MARK]
            while len(syms) > 1:
                best_rank, best_i = None, -1
                for i in range(len(syms) - 1):
                    r = ranks.get((syms[i], syms[i + 1]))
                    if r is not None and (best_rank is None or r < best_rank):
                        best_rank, best_i = r, i
                if best_rank is None:
                    break
                syms[best_i : best_i + 2] = [
                    syms[best_i] + syms[best_i + 1]
                ]
            cache[w] = syms
            return syms

        return texts.map(
            lambda t: [
                s
                for w in (t or "").strip().split()
                for s in word_syms(w)
            ]
        )

    return df.withColumn(out_col, seg(F.col(text_col)))
