"""Property-based round-trip tests for the codec-free multimodal
encoders/decoders (round 12).

The planted-fixture tests pin specific payloads; hypothesis explores
the input space — arbitrary sample values at every legal bit width,
arbitrary image dims (odd widths exercise BMP stride padding), frame
counts × sampling strides, and multi-channel WAV — asserting the
encoder dual inverts to the identity everywhere.  This is the
guarantee the decode hash row (multimodal_decode_stats) leans on:
stats are computed from DECODED arrays, so encode→decode must be the
identity for the DuckDB oracle's closed forms to be valid.
"""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from realtime_data_pipeline_spark.functions import multimodal

# keep examples small: correctness is about layout arithmetic, not
# volume, and the CI budget belongs to the Spark suites
_SETTINGS = dict(max_examples=60, deadline=None)


@st.composite
def _wav_case(draw):
    bits = draw(st.sampled_from([8, 16, 32]))
    lo, hi = {8: (-128, 127), 16: (-32768, 32767),
              32: (-(2**31), 2**31 - 1)}[bits]
    n_ch = draw(st.integers(1, 4))
    n_frames = draw(st.integers(0, 40))
    samples = draw(
        st.lists(st.integers(lo, hi), min_size=n_frames * n_ch,
                 max_size=n_frames * n_ch)
    )
    rate = draw(st.integers(1, 192_000))
    return bits, n_ch, rate, np.array(samples, dtype=np.int64)


@given(_wav_case())
@settings(**_SETTINGS)
def test_wav_roundtrip_property(case):
    bits, n_ch, rate, samples = case
    grate, gch, got = multimodal.decode_wav(
        multimodal.encode_wav(samples, rate=rate, bits=bits, n_ch=n_ch)
    )
    assert (grate, gch) == (rate, n_ch)
    assert got.dtype == np.int64 and got.tolist() == samples.tolist()


@given(
    w=st.integers(1, 16),
    h=st.integers(1, 12),
    seed=st.integers(0, 2**31 - 1),
    gray=st.booleans(),
)
@settings(**_SETTINGS)
def test_ppm_roundtrip_property(w, h, seed, gray):
    rng = np.random.default_rng(seed)
    shape = (h, w) if gray else (h, w, 3)
    px = rng.integers(0, 256, size=shape, dtype=np.uint8)
    got = multimodal.decode_ppm(multimodal.encode_ppm(px))
    assert got.shape == px.shape and got.tolist() == px.tolist()


@given(w=st.integers(1, 16), h=st.integers(1, 12),
       seed=st.integers(0, 2**31 - 1))
@settings(**_SETTINGS)
def test_bmp_roundtrip_property(w, h, seed):
    # every w mod 4 residue appears, exercising all stride paddings
    rng = np.random.default_rng(seed)
    px = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    got = multimodal.decode_bmp(multimodal.encode_bmp(px))
    assert got.shape == px.shape and got.tolist() == px.tolist()


@given(
    w2=st.integers(1, 8),
    h2=st.integers(1, 6),
    nf=st.integers(1, 12),
    every_n=st.integers(1, 5),
    seed=st.integers(0, 2**31 - 1),
    cspace=st.sampled_from([b"C420", b"C422", b"C444", b"Cmono",
                            b"C420jpeg", b"C420mpeg2", b"C420paldv"]),
)
@settings(**_SETTINGS)
def test_y4m_sampling_property(w2, h2, nf, every_n, seed, cspace):
    # even dims keep every chroma fraction integral
    w, h = 2 * w2, 2 * h2
    rng = np.random.default_rng(seed)
    frames = [
        rng.integers(0, 256, size=(h, w), dtype=np.uint8)
        for _ in range(nf)
    ]
    gw, gh, got = multimodal.sample_frames(
        multimodal.encode_y4m(frames, cspace=cspace), every_n=every_n
    )
    assert (gw, gh) == (w, h)
    want = frames[::every_n]
    assert len(got) == len(want)
    for g, f in zip(got, want):
        assert g.tolist() == f.tolist()


@given(seed=st.integers(0, 2**31 - 1), n=st.integers(0, 64))
@settings(**_SETTINGS)
def test_wav_any_truncation_raises_named_error(seed, n):
    """Chopping ANY nonzero number of bytes off a well-formed WAV must
    raise the named truncation/parse errors — never an opaque numpy
    buffer error and never a silent short read."""
    rng = np.random.default_rng(seed)
    samples = rng.integers(-32768, 32767, size=8, dtype=np.int64)
    data = multimodal.encode_wav(samples)
    cut = min(len(data) - 1, n + 1)
    try:
        rate, n_ch, got = multimodal.decode_wav(data[: len(data) - cut])
        # decodes that survive must have parsed a CONSISTENT prefix:
        # every sample present and intact is the planted value
        assert got.tolist() == samples[: got.size].tolist()
    except ValueError as e:
        msg = str(e)
        assert (
            "truncated" in msg
            or "not a multiple" in msg
            or "missing fmt/data" in msg
            or "not a RIFF/WAVE payload" in msg
        ), msg
