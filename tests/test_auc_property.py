"""Property pin for q_auc_mann_whitney's midrank identity: the
group-form Σ_pos 2·midrank = Σ_groups pos_g·(lo_g + hi_g) — the
spelling that lets the key avoid materializing per-row .5 midranks —
must equal the textbook tied-rank AUC (pandas average ranks) on
arbitrary tied inputs."""

from __future__ import annotations

from fractions import Fraction

import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st


@st.composite
def scored_labels(draw):
    n = draw(st.integers(min_value=2, max_value=60))
    scores = draw(
        st.lists(
            st.integers(min_value=0, max_value=8),  # few values → many ties
            min_size=n, max_size=n,
        )
    )
    labels = draw(
        st.lists(st.integers(min_value=0, max_value=1), min_size=n, max_size=n)
    )
    # need both classes for AUC to exist
    if all(l == 0 for l in labels):
        labels[0] = 1
    if all(l == 1 for l in labels):
        labels[0] = 0
    return scores, labels


@given(scored_labels())
@settings(max_examples=200, deadline=None)
def test_group_identity_matches_textbook_tied_auc(case):
    scores, labels = case
    df = pd.DataFrame({"s": scores, "y": labels})

    # textbook: average (mid) ranks, AUC = (R_pos - P(P+1)/2) / (P*N)
    df["r"] = df["s"].rank(method="average")
    p = int(df["y"].sum())
    n = len(df) - p
    auc_ref = (
        Fraction(df.loc[df["y"] == 1, "r"].sum()) - Fraction(p * (p + 1), 2)
    ) / Fraction(p * n)

    # the key's group form over ROW_NUMBER ranks (ties broken arbitrarily
    # inside a tied-value group — the identity must be invariant to that)
    df2 = df.sort_values(["s"]).reset_index(drop=True)
    df2["rn"] = range(1, len(df2) + 1)
    g = df2.groupby("s").agg(lo=("rn", "min"), hi=("rn", "max"), pos=("y", "sum"))
    sum2r = int((g["pos"] * (g["lo"] + g["hi"])).sum())
    u2 = sum2r - p * (p + 1)
    auc_group = Fraction(u2, 2 * p * n)

    assert auc_group == auc_ref
