"""Distributed BPE training (functions/bpe.py): hand-computed merge
sequence, greedy non-overlapping application, determinism across
layouts, and segmentation round-trip."""

from __future__ import annotations

from dbt_snowflake_feature_store_spark.functions import bpe
from dbt_snowflake_feature_store_spark.functions.bpe import END_MARK as E


def _docs(spark, texts):
    return spark.createDataFrame([(i, t) for i, t in enumerate(texts)],
                                 "doc_id long, text string")


def test_hand_computed_merges(spark):
    """The Sennrich toy corpus: low (x5), lower (x2), newest (x6),
    widest (x3). First merges must follow the exact pair-frequency
    order with the (count desc, pair asc) tiebreak."""
    texts = (
        ["low"] * 5 + ["lower"] * 2 + ["newest"] * 6 + ["widest"] * 3
    )
    docs = _docs(spark, [" ".join(texts)])
    merges = bpe.bpe_train(docs, num_merges=4)
    got = [(m["left"], m["right"], m["count"]) for m in merges]
    # pair counts round 1: (e,s)=9, (s,t)=9, (t,▁)=9, (w,e)=8 … tie on 9
    # broken by pair asc: ('e','s') < ('s','t') < ('t','▁')
    assert got[0] == ("e", "s", 9)
    assert got[1] == ("es", "t", 9)
    assert got[2] == ("est", E, 9)
    # next: lo (7) vs we (8): 'w','e' was consumed? 'newest'→n e w est▁:
    # (w, est▁) count 6, (l,o)=7, (n,e)=6, (e,w)=6, (o,w)=7, (w,▁)=5 …
    assert got[3] == ("l", "o", 7)


def test_greedy_non_overlapping(spark):
    """'aaa' under merge (a,a): greedy left-to-right gives (aa, a) —
    the merged symbol never re-merges in the same round."""
    docs = _docs(spark, ["aaa aaa aaa"])
    merges = bpe.bpe_train(docs, num_merges=1)
    assert (merges[0]["left"], merges[0]["right"]) == ("a", "a")
    seg = bpe.bpe_segment(docs, merges).head()["bpe_tokens"]
    assert list(seg) == ["aa", "a", E] * 3


def test_layout_invariance(spark):
    """Same corpus, different partitioning → identical merge table."""
    texts = ["the cat sat on the mat", "the bat and the cat", "mat cat"] * 7
    a = bpe.bpe_train(_docs(spark, texts).repartition(1), num_merges=6)
    b = bpe.bpe_train(_docs(spark, texts).repartition(13), num_merges=6)
    assert a == b


def test_segment_applies_merges_in_order(spark):
    texts = ["banana bandana"] * 4
    docs = _docs(spark, texts)
    merges = bpe.bpe_train(docs, num_merges=3)
    seg = bpe.bpe_segment(docs, merges).head()["bpe_tokens"]
    # re-joining segments reproduces the original words + end marks
    assert "".join(seg) == "banana" + E + "bandana" + E
    # at least one learned merge actually shortened the symbol stream
    assert len(seg) < len("banana") + len("bandana") + 2


def test_stops_when_no_pair_repeats(spark):
    docs = _docs(spark, ["ab cd ef"])
    merges = bpe.bpe_train(docs, num_merges=10)
    # every adjacent pair occurs once -> count<2 -> stop immediately
    assert merges == []


def test_min_count_prunes_rare_words(spark):
    docs = _docs(spark, ["zz zz zz qq"])
    merges = bpe.bpe_train(docs, num_merges=1, min_count=2)
    assert merges[0]["left"] == "z" and merges[0]["count"] == 3


def test_fast_segmenter_matches_native(spark):
    """The Arrow rank-priority segmenter (production path for big merge
    tables) equals the native fold segmenter word-for-word on the real
    corpus — the sequential-vs-priority equivalence, checked."""
    from dbt_snowflake_feature_store_spark.sources import read_table

    docs = read_table(spark, "/root/testdata/sf0.001", "documents").limit(80)
    merges = bpe.bpe_train(docs, num_merges=12)
    a = {
        r["doc_id"]: list(r["bpe_tokens"])
        for r in bpe.bpe_segment(docs, merges).select(
            "doc_id", "bpe_tokens"
        ).collect()
    }
    b = {
        r["doc_id"]: list(r["bpe_tokens"])
        for r in bpe.bpe_segment_fast(docs, merges).select(
            "doc_id", "bpe_tokens"
        ).collect()
    }
    assert a == b


def test_fast_segmenter_greedy_tie(spark):
    """'aaa' under merge (a,a): priority application gives the same
    leftmost-greedy (aa, a) split as the fold."""
    docs = _docs(spark, ["aaa"])
    merges = [{"rank": 0, "left": "a", "right": "a", "merged": "aa", "count": 9}]
    got = bpe.bpe_segment_fast(docs, merges).head()["bpe_tokens"]
    assert list(got) == ["aa", "a", E]


def test_fixed_merge_table_cascades(spark):
    """The frozen FIXED_MERGES artifact (q_bpe_segment's table) drives
    deep cascades: 'table' resolves through (t,a),(b,l),(bl,e),
    (ta,ble),(table,▁) to the single token 'table▁', and 'the'/'spark'
    collapse likewise. Hand-computed pins for the oracle-gated key."""
    from dbt_snowflake_feature_store_spark.functions.bpe import (
        bpe_segment,
        fixed_merge_table,
    )

    df = spark.createDataFrame(
        [("table the spark agg",)], ["text"]
    )
    out = bpe_segment(df, fixed_merge_table()).head()["bpe_tokens"]
    assert out == ["table▁", "the▁", "spark▁", "agg▁"]


def test_fixed_table_fast_matches_native_on_corpus(spark):
    """bpe_segment_fast (rank-priority pandas_udf trie) must equal the
    native rank-sequential fold under the FROZEN table on the real
    documents corpus — extends the trained-table equivalence pin to
    the q_bpe_segment artifact."""
    from dbt_snowflake_feature_store_spark.functions.bpe import (
        bpe_segment,
        bpe_segment_fast,
        fixed_merge_table,
    )
    from dbt_snowflake_feature_store_spark.sources import read_table

    d = read_table(spark, "/root/testdata/sf0.001", "documents").select(
        "doc_id", "text"
    )
    m = fixed_merge_table()
    native = {
        r["doc_id"]: r["bpe_tokens"] for r in bpe_segment(d, m).collect()
    }
    fast = {
        r["doc_id"]: r["bpe_tokens"]
        for r in bpe_segment_fast(d, m).collect()
    }
    assert native == fast


def test_segment_by_key_matches_per_row_fold(spark):
    """bpe_segment_by_key (dictionary trick, the q_bpe_segment form)
    must produce byte-identical token sequences to the per-instance
    bpe_segment fold on the real corpus."""
    from dbt_snowflake_feature_store_spark.functions.bpe import (
        bpe_segment,
        bpe_segment_by_key,
        fixed_merge_table,
    )
    from dbt_snowflake_feature_store_spark.sources import read_table

    d = read_table(spark, "/root/testdata/sf0.001", "documents").select(
        "doc_id", "text"
    )
    m = fixed_merge_table()
    per_row = {
        r["doc_id"]: r["bpe_tokens"] for r in bpe_segment(d, m).collect()
    }
    by_key = {
        r["doc_id"]: r["bpe_tokens"]
        for r in bpe_segment_by_key(d, m).collect()
    }
    assert per_row == by_key


def test_segment_by_key_keeps_empty_and_whitespace_docs(spark):
    """ADVICE r8: empty / whitespace-only documents lose every word row
    to the length filter — they must still come back, one row per doc,
    with exactly the token stream the per-row fold (and the DuckDB
    oracle) produce — both segment the zero-length pseudo-word to
    ['', END_MARK], so an empty doc yields that pair, never a dropped
    row."""
    from dbt_snowflake_feature_store_spark.functions.bpe import (
        END_MARK,
        bpe_segment,
        bpe_segment_by_key,
        fixed_merge_table,
    )

    d = spark.createDataFrame(
        [(1, "the cat"), (2, ""), (3, "   \t  "), (4, "dog")],
        "doc_id long, text string",
    )
    m = fixed_merge_table()
    per_row = {
        r["doc_id"]: r["bpe_tokens"] for r in bpe_segment(d, m).collect()
    }
    by_key = {
        r["doc_id"]: r["bpe_tokens"]
        for r in bpe_segment_by_key(d, m).collect()
    }
    assert set(by_key) == {1, 2, 3, 4}
    assert by_key[2] == ["", END_MARK]
    # trim() strips spaces only, so the tab survives and splits into
    # TWO empty words — mirror of DuckDB's trim/regexp_split semantics
    assert by_key[3] == ["", END_MARK, "", END_MARK]
    assert per_row == by_key


def test_driver_and_distributed_paths_agree(spark):
    """r18: the size-gated driver-side merge loop must be bit-identical
    to the distributed loop — same pair counts (overlapping adjacencies
    included), same (count DESC, pair ASC) argmax, same greedy
    non-overlapping merge application, same early stop."""
    texts = [
        "the cat sat on the mat",
        "a b ab ab aaa aaa aaa",
        "low lower lowest newer newest wider",
        "the the the mat mat",
    ]
    docs = _docs(spark, texts)
    fast = bpe.bpe_train(docs, num_merges=8)  # driver path (tiny vocab)
    slow = bpe.bpe_train(docs, num_merges=8, driver_vocab_rows=0)
    assert fast == slow
