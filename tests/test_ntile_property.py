"""Property pin for q_quantile_norm's hand-spelled per-group NTILE:
the row_number+count CASE form must equal SQL NTILE(k) (first n mod k
buckets get one extra row) for every (n, k), including n < k and the
exact-multiple edge."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st


def _sql_ntile(n: int, k: int) -> list[int]:
    """Reference NTILE(k) over n rows (1-based buckets, SQL remainder
    rule): first n % k buckets get floor(n/k)+1 rows, the rest get
    floor(n/k)."""
    q, r = divmod(n, k)
    out = []
    b = 1
    for bucket in range(1, k + 1):
        size = q + 1 if bucket <= r else q
        out.extend([bucket] * size)
    return out


def _case_form(rn: int, cnt: int, k: int) -> int:
    """The exact CASE expression q_quantile_norm spells in both
    engines (integer DIV semantics via //; all operands positive)."""
    if cnt % k * (cnt // k + 1) >= rn:
        return (rn - 1) // (cnt // k + 1) + 1
    return k - (cnt - rn) // max(cnt // k, 1)


@given(
    n=st.integers(min_value=1, max_value=400),
    k=st.integers(min_value=1, max_value=40),
)
@settings(max_examples=300, deadline=None)
def test_case_form_equals_sql_ntile(n, k):
    ref = _sql_ntile(n, k)
    got = [_case_form(rn, n, k) for rn in range(1, n + 1)]
    assert got == ref, (n, k)
