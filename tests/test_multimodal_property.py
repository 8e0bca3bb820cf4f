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


@st.composite
def _qoi_case(draw):
    """Image generator biased toward every QOI op type: low-cardinality
    palettes (INDEX + RUN), smooth gradients (DIFF/LUMA), uniform noise
    (RGB/RGBA literals), and alpha flips (RGBA at channels=4)."""
    h = draw(st.integers(1, 12))
    w = draw(st.integers(1, 12))
    channels = draw(st.sampled_from([3, 4]))
    kind = draw(st.sampled_from(["noise", "palette", "gradient", "flat"]))
    seed = draw(st.integers(0, 2**31 - 1))
    rng = np.random.default_rng(seed)
    if kind == "noise":
        px = rng.integers(0, 256, size=(h, w, channels), dtype=np.uint8)
    elif kind == "palette":
        palette = rng.integers(0, 256, size=(3, channels), dtype=np.uint8)
        px = palette[rng.integers(0, 3, size=(h, w))]
    elif kind == "gradient":
        steps = rng.integers(-2, 3, size=(h, w, channels)).astype(np.int64)
        px = (np.cumsum(steps.reshape(-1, channels), axis=0) % 256).astype(
            np.uint8
        ).reshape((h, w, channels))
    else:
        px = np.full((h, w, channels), rng.integers(0, 256), dtype=np.uint8)
    return px


@given(_qoi_case())
@settings(**_SETTINGS)
def test_qoi_roundtrip_property(px):
    got = multimodal.decode_qoi(multimodal.encode_qoi(px))
    assert got.dtype == np.uint8
    assert got.shape == px.shape
    assert got.tolist() == px.tolist()


@given(seed=st.integers(0, 2**31 - 1), n=st.integers(1, 80))
@settings(**_SETTINGS)
def test_qoi_any_truncation_raises_named_error(seed, n):
    """Chopping ANY nonzero number of bytes off a well-formed QOI must
    raise a named error — the end-marker check makes silent short
    reads impossible (the marker is always the payload's last 8
    bytes, so every truncation destroys it)."""
    rng = np.random.default_rng(seed)
    px = rng.integers(0, 256, size=(4, 4, 3), dtype=np.uint8)
    data = multimodal.encode_qoi(px)
    cut = min(len(data) - 1, n)
    try:
        multimodal.decode_qoi(data[: len(data) - cut])
        raise AssertionError("truncated QOI decoded without error")
    except ValueError as e:
        msg = str(e)
        assert (
            "truncated" in msg
            or "missing QOI end marker" in msg
            or "not a QOI payload" in msg
            or "overruns" in msg
            # deep truncation can trip the pre-allocation pixel-count
            # bound before the stream walk even starts — still the
            # named-error contract
            or "can encode at most" in msg
        ), msg


def test_qoi_index_insert_on_run_matches_reference_decoder():
    """The spec's color cache holds EVERY seen pixel, including a
    run's pixel.  A conforming third-party encoder may emit
    QOI_OP_INDEX against the slot filled by a run of the INITIAL
    (0,0,0,255) state — a decoder that skips the run-insert returns
    the zero-initialized cache entry instead.  Build that stream by
    hand (our encoder never relies on it) and check the decode."""
    import struct

    start = (0, 0, 0, 255)
    slot = multimodal._qoi_hash(*start)
    # 3 pixels: RUN(2) of the initial state, then INDEX(slot) -> same
    stream = bytes([0xC0 | 1, slot])
    data = (
        multimodal._QOI_MAGIC
        + struct.pack(">II", 3, 1)
        + bytes((4, 0))
        + stream
        + multimodal._QOI_END
    )
    got = multimodal.decode_qoi(data)
    assert got.shape == (1, 3, 4)
    assert [tuple(p) for p in got.reshape(-1, 4)] == [start] * 3


@given(
    seed=st.integers(0, 2**31 - 1),
    h=st.integers(1, 9),
    w=st.integers(1, 9),
    ch=st.sampled_from([1, 2, 3, 4]),
    forced=st.one_of(st.none(), st.integers(0, 4)),
)
@settings(**_SETTINGS)
def test_png_roundtrip_property(seed, h, w, ch, forced):
    """Any uint8 image, any channel count, heuristic or forced filter:
    encode_png -> decode_png is the identity."""
    rng = np.random.default_rng(seed)
    shape = (h, w) if ch == 1 else (h, w, ch)
    px = rng.integers(0, 256, size=shape, dtype=np.uint8)
    got = multimodal.decode_png(multimodal.encode_png(px, filters=forced))
    assert got.shape == px.shape and got.tolist() == px.tolist()


@given(seed=st.integers(0, 2**31 - 1), n=st.integers(1, 64))
@settings(**_SETTINGS)
def test_png_any_truncation_raises_named_error(seed, n):
    """Chopping ANY nonzero number of bytes off a well-formed PNG must
    raise a named error — the chunk-length/CRC framing makes silent
    short reads impossible (IEND is always the last 12 bytes, so
    every truncation destroys the chunk walk)."""
    rng = np.random.default_rng(seed)
    px = rng.integers(0, 256, size=(4, 4, 3), dtype=np.uint8)
    data = multimodal.encode_png(px)
    cut = min(len(data) - 1, n)
    try:
        multimodal.decode_png(data[: len(data) - cut])
        raise AssertionError("truncated PNG decoded without error")
    except ValueError as e:
        msg = str(e)
        assert (
            "truncated" in msg
            or "not a PNG payload" in msg
            or "CRC mismatch" in msg
            or "missing ID" in msg
            or "missing IHDR" in msg
            or "size mismatch" in msg
            or "corrupt PNG IDAT" in msg
        ), msg


@given(seed=st.integers(0, 2**31 - 1))
@settings(**_SETTINGS)
def test_png_single_byte_corruption_never_silently_wrong(seed):
    """Flip one byte anywhere in a well-formed PNG: either the decode
    raises a named error (CRC catches chunk-body damage; structural
    checks catch framing damage) or — only if the flip landed in a
    region that decodes to the same pixels, which CRC coverage makes
    impossible past the signature — the result is unchanged."""
    rng = np.random.default_rng(seed)
    px = rng.integers(0, 256, size=(3, 5, 3), dtype=np.uint8)
    data = bytearray(multimodal.encode_png(px))
    i = int(rng.integers(0, len(data)))
    data[i] ^= int(rng.integers(1, 256))
    try:
        got = multimodal.decode_png(bytes(data))
        assert got.tolist() == px.tolist()  # flip must have been inert
    except (ValueError, NotImplementedError):
        pass  # named rejection is the expected outcome
