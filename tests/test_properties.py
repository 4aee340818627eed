"""Property-based tests (hypothesis) for the pure/deterministic layers.

The reference uses only example-based tests (SURVEY.md §5); these
properties pin the invariants the engine's correctness rests on:
identifier hygiene idempotence, hash determinism, and the MinHash
similarity estimate actually tracking Jaccard.
"""

from __future__ import annotations

import string

import pytest
from hypothesis import given, settings, strategies as st

from pandabase_spark.names import clean_name, is_clean
from pandabase_spark.operators.dedup import _perm_constants, _M31
from pandabase_spark.operators.similarity import _hyperplanes


name_alphabet = st.text(
    alphabet=string.ascii_letters + string.digits + " ()+-/*\";=&|#><^%{}.,_",
    min_size=1,
    max_size=40,
)


@given(name_alphabet)
@settings(max_examples=300, deadline=None)
def test_clean_name_idempotent(raw):
    try:
        cleaned = clean_name(raw)
    except NameError:
        return  # rejected names (digit-leading, @) are allowed to raise
    assert clean_name(cleaned) == cleaned
    assert is_clean(cleaned)


@given(st.integers(min_value=0, max_value=4096))
def test_perm_constants_in_field(i):
    a, b = _perm_constants(i)
    assert 1 <= a < _M31
    assert 0 <= b < _M31
    # stability: same index → same constants (no hidden RNG state)
    assert (a, b) == _perm_constants(i)


@given(st.integers(min_value=1, max_value=24), st.integers(min_value=1, max_value=128))
@settings(max_examples=50, deadline=None)
def test_hyperplanes_deterministic_and_bounded(planes, dim):
    hp1 = _hyperplanes(planes, dim)
    hp2 = _hyperplanes(planes, dim)
    assert hp1 == hp2
    assert len(hp1) == planes and all(len(p) == dim for p in hp1)
    assert all(-1.0 <= v <= 1.0 for p in hp1 for v in p)


def _minhash_sig_py(shingles: set[int], num_perm: int) -> list[int]:
    """Pure-python mirror of the Spark minhash fold (same constants)."""
    out = []
    for i in range(num_perm):
        a, b = _perm_constants(i)
        out.append(min(((h % _M31) * a + b) % _M31 for h in shingles))
    return out


@given(
    st.sets(st.integers(min_value=0, max_value=2**50), min_size=5, max_size=80),
    st.sets(st.integers(min_value=0, max_value=2**50), min_size=5, max_size=80),
)
@settings(max_examples=60, deadline=None)
def test_minhash_estimates_jaccard(sa, sb):
    """Signature agreement rate ≈ Jaccard within a loose statistical
    band (128 permutations → σ ≈ 0.044; allow 4σ)."""
    num_perm = 128
    siga = _minhash_sig_py(sa, num_perm)
    sigb = _minhash_sig_py(sb, num_perm)
    est = sum(x == y for x, y in zip(siga, sigb)) / num_perm
    true_j = len(sa & sb) / len(sa | sb)
    assert abs(est - true_j) <= 0.18


def test_minhash_identical_sets_estimate_one():
    s = set(range(100, 160))
    assert _minhash_sig_py(s, 64) == _minhash_sig_py(s, 64)
    est = sum(
        x == y for x, y in zip(_minhash_sig_py(s, 64), _minhash_sig_py(s, 64))
    ) / 64
    assert est == 1.0
