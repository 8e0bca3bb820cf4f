"""Multimodal pipeline tests (VERDICT r2 item 10).

The decode step is import-gated (`functions/multimodal.py`): this
container ships no codecs, so the activation path would otherwise go
untested until a deployment with PIL/soundfile lights it up silently.
The codec tests below are skip-marked on the import — present and
runnable, skipped here — and the stub contract (NotImplementedError
when the codec is absent) is pinned unconditionally.
"""

from __future__ import annotations

import numpy as np
import pytest

from realtime_data_pipeline_spark import tables
from realtime_data_pipeline_spark.functions import multimodal

from conftest import SF_DIR


def _has_pil() -> bool:
    try:
        import PIL  # noqa: F401

        return True
    except ImportError:
        return False


def _has_soundfile() -> bool:
    try:
        import soundfile  # noqa: F401

        return True
    except ImportError:
        return False


@pytest.mark.skipif(not _has_pil(), reason="PIL not available in this container")
def test_decode_image_activates_with_codec():
    """When PIL exists, decode_image must return a real image object
    for a non-stdlib-codec payload (JPEG) — the import-gated path
    activates correctly.  (PNG no longer reaches this gate: it
    decodes natively via stdlib zlib in decode_png.)"""
    import io

    from PIL import Image

    buf = io.BytesIO()
    Image.new("RGB", (4, 4), color=(1, 2, 3)).save(buf, format="JPEG")
    img = multimodal.decode_image(buf.getvalue())
    assert img.size == (4, 4)


def test_decode_image_stub_contract_without_codec():
    """Without PIL the stub must raise NotImplementedError (not a bare
    ImportError escaping from inside) so callers can gate on it.
    JPEG is the canonical still-gated format now that PNG decodes
    natively."""
    if _has_pil():
        pytest.skip("PIL present; stub path not reachable")
    with pytest.raises(NotImplementedError):
        multimodal.decode_image(b"\xff\xd8\xff\xe0\x00\x10JFIF")


def test_sample_frames_stub_contract():
    with pytest.raises(NotImplementedError):
        multimodal.sample_frames(b"0123456789")


@pytest.mark.skipif(
    not _has_soundfile(), reason="soundfile not available in this container"
)
def test_audio_codec_available_marker():
    """Placeholder that fires if an audio codec ever appears, flagging
    that an audio decode kernel should be wired like decode_image."""
    raise AssertionError(
        "soundfile became available — wire an audio decode kernel and test it"
    )


def test_byte_histogram_matches_numpy_oracle(spark):
    """The codec-free extraction kernel must agree with a local numpy
    computation on the same payloads (kernel correctness, not just
    plumbing)."""
    docs = tables.load_table(spark, SF_DIR, "documents").limit(50)
    media = multimodal.attach_media(docs)
    got = {
        r["doc_id"]: r["byte_hist"]
        for r in multimodal.byte_histogram(media).collect()
    }
    for row in docs.select("doc_id", "text").collect():
        arr = np.frombuffer(row["text"].encode("utf-8"), dtype=np.uint8)
        want = np.bincount(arr >> 6, minlength=4)[:4].tolist()
        assert got[row["doc_id"]] == want


def test_frame_sample_stats_matches_numpy_oracle(spark):
    docs = tables.load_table(spark, SF_DIR, "documents").limit(50)
    media = multimodal.attach_media(docs)
    got = {
        r["doc_id"]: (r["n_frames"], r["frame_energy"])
        for r in multimodal.frame_sample_stats(media).collect()
    }
    stride, fb = multimodal.FRAME_STRIDE, multimodal.FRAME_BYTES
    for row in docs.select("doc_id", "text").collect():
        arr = np.frombuffer(row["text"].encode("utf-8"), dtype=np.uint8)
        mask = (np.arange(arr.size) % stride) < fb
        want = ((arr.size + stride - 1) // stride, int(arr[mask].sum()))
        assert got[row["doc_id"]] == want


def test_audio_signal_stats_numpy_oracle(spark):
    """The mapInPandas PCM kernel vs a direct numpy computation over
    the same payload bytes — per-doc exact integer equality."""
    docs = tables.load_table(spark, SF_DIR, "documents").where(
        "text IS NOT NULL"
    )
    got = {
        r["doc_id"]: (r["n_samples"], r["sq_power"], r["zero_crossings"])
        for r in multimodal.audio_signal_stats(
            multimodal.attach_media(docs)
        ).collect()
    }
    for row in docs.select("doc_id", "text").collect():
        a = np.frombuffer(
            row["text"].encode("utf-8"), dtype=np.uint8
        ).astype(np.int64) - multimodal.PCM_CENTER
        neg = a < 0
        want = (
            a.size,
            int((a * a).sum()),
            int((neg[:-1] != neg[1:]).sum()),
        )
        assert got[row["doc_id"]] == want, row["doc_id"]


# ---------------------------------------------------------------------------
# Codec-free REAL decoders (round 11): WAV PCM, netpbm, BMP, y4m.
# Payloads are synthesized byte-for-byte in the tests from the public
# format specs, so every decode is checked against a known array.
# ---------------------------------------------------------------------------


def _wav_bytes(samples: np.ndarray, rate: int = 8000, bits: int = 16,
               n_ch: int = 1) -> bytes:
    import struct

    if bits == 8:
        pcm = (samples + 128).astype(np.uint8).tobytes()
    elif bits == 16:
        pcm = samples.astype("<i2").tobytes()
    else:
        pcm = samples.astype("<i4").tobytes()
    align = n_ch * bits // 8
    fmt = struct.pack("<HHIIHH", 1, n_ch, rate, rate * align, align, bits)
    chunks = b"fmt " + struct.pack("<I", len(fmt)) + fmt
    chunks += b"data" + struct.pack("<I", len(pcm)) + pcm
    if len(pcm) % 2:  # word alignment padding after an odd chunk
        chunks += b"\x00"
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


def test_decode_wav_16bit_roundtrip():
    want = np.array([0, 1, -1, 32767, -32768, 1000], dtype=np.int64)
    rate, n_ch, got = multimodal.decode_wav(_wav_bytes(want, rate=44100))
    assert (rate, n_ch) == (44100, 1)
    assert got.tolist() == want.tolist()


def test_decode_wav_8bit_recenters():
    want = np.array([0, 127, -128, 5], dtype=np.int64)
    rate, n_ch, got = multimodal.decode_wav(_wav_bytes(want, bits=8))
    assert got.tolist() == want.tolist()  # unsigned-offset undone


def test_decode_wav_odd_data_chunk_is_word_aligned():
    want = np.array([1, -2, 3], dtype=np.int64)  # 3 bytes of 8-bit PCM
    rate, n_ch, got = multimodal.decode_wav(_wav_bytes(want, bits=8))
    assert got.tolist() == want.tolist()


def test_decode_wav_rejects_compressed():
    import struct

    fmt = struct.pack("<HHIIHH", 85, 1, 8000, 8000, 1, 16)  # tag 85 = MP3
    body = b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", 0)
    data = b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body
    with pytest.raises(NotImplementedError):
        multimodal.decode_wav(data)
    with pytest.raises(ValueError):
        multimodal.decode_wav(b"not a wav")


def test_decode_ppm_p6_and_p5_with_comment():
    px = np.arange(24, dtype=np.uint8).reshape((2, 4, 3))
    data = b"P6\n# a comment\n4 2\n255\n" + px.tobytes()
    got = multimodal.decode_ppm(data)
    assert got.shape == (2, 4, 3) and got.tolist() == px.tolist()
    gray = np.arange(8, dtype=np.uint8).reshape((2, 4))
    got5 = multimodal.decode_ppm(b"P5 4 2 255\n" + gray.tobytes())
    assert got5.tolist() == gray.tolist()


def test_decode_bmp_24bit_bottom_up_with_padding():
    import struct

    # 3x2 RGB image; BMP rows are BGR, bottom-up, padded to 4 bytes
    want = np.array(
        [[[255, 0, 0], [0, 255, 0], [0, 0, 255]],
         [[1, 2, 3], [4, 5, 6], [7, 8, 9]]], dtype=np.uint8
    )
    rows = b""
    for r in want[::-1]:  # bottom-up
        row = b"".join(bytes([b, g, rr]) for rr, g, b in r.tolist())
        rows += row + b"\x00" * ((4 - len(row) % 4) % 4)
    px_off = 14 + 40
    hdr = b"BM" + struct.pack("<IHHI", px_off + len(rows), 0, 0, px_off)
    dib = struct.pack("<IiiHHIIiiII", 40, 3, 2, 1, 24, 0, len(rows),
                      2835, 2835, 0, 0)
    got = multimodal.decode_bmp(hdr + dib + rows)
    assert got.shape == (2, 3, 3) and got.tolist() == want.tolist()


def _y4m_bytes(frames: list[np.ndarray], cspace: bytes = b"C420") -> bytes:
    h, w = frames[0].shape
    out = b"YUV4MPEG2 W%d H%d F25:1 Ip A1:1 %s\n" % (w, h, cspace)
    chroma = (w * h) // 2 if cspace == b"C420" else 0
    for f in frames:
        out += b"FRAME\n" + f.tobytes() + b"\x07" * chroma
    return out


def test_sample_frames_y4m_luma_planes():
    frames = [np.full((4, 6), i, dtype=np.uint8) for i in range(5)]
    w, h, got = multimodal.sample_frames(_y4m_bytes(frames), every_n=2)
    assert (w, h) == (6, 4)
    assert [g[0, 0] for g in got] == [0, 2, 4]  # frames 0, 2, 4
    assert all(g.shape == (4, 6) for g in got)


def test_sample_frames_y4m_mono():
    frames = [np.zeros((2, 2), dtype=np.uint8)]
    w, h, got = multimodal.sample_frames(
        _y4m_bytes(frames, cspace=b"Cmono"), every_n=1
    )
    assert len(got) == 1 and got[0].shape == (2, 2)


def test_decode_image_dispatches_to_codec_free_formats():
    px = np.zeros((2, 2, 3), dtype=np.uint8)
    assert multimodal.decode_image(
        b"P6 2 2 255\n" + px.tobytes()
    ).shape == (2, 2, 3)


def test_wav_decode_through_mapinpandas(spark):
    """The decode step runs through the SAME Arrow plumbing as the
    registry kernels: WAV payloads decoded per batch, exact integer
    sq-power checked against numpy on the driver."""
    import pandas as pd
    from pyspark.sql.types import (LongType, StructField, StructType)

    waves = {
        1: np.array([3, -3, 10], dtype=np.int64),
        2: np.array([-7, 7], dtype=np.int64),
        3: np.array([], dtype=np.int64),
    }
    rows = [(k, _wav_bytes(v)) for k, v in waves.items()]
    df = spark.createDataFrame(rows, "doc_id long, data binary")

    schema = StructType([
        StructField("doc_id", LongType()),
        StructField("sq_power", LongType()),
    ])

    def _extract(batches):
        for pdf in batches:
            out = []
            for data in pdf["data"]:
                _, _, s = multimodal.decode_wav(bytes(data))
                out.append(int((s * s).sum()))
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "sq_power": out})

    got = {r.doc_id: r.sq_power for r in
           df.mapInPandas(_extract, schema=schema).collect()}
    want = {k: int((v * v).sum()) for k, v in waves.items()}
    assert got == want


# ---------------------------------------------------------------------------
# Truncation / unknown-variant error paths (ADVICE r11): the decoders
# must fail with a NAMED error, not an opaque numpy buffer error or a
# silent short read.
# ---------------------------------------------------------------------------


def test_decode_wav_truncated_chunk_raises_named_error():
    good = _wav_bytes(np.array([1, -2, 3, -4], dtype=np.int64))
    # a short final data chunk under the 0xFFFFFFFF sentinel is the
    # streaming-writer case (tested below); a truncated NON-data chunk
    # is structural corruption.  Chop mid-fmt: keep the RIFF header +
    # "fmt " id + size field but only part of the fmt body.
    with pytest.raises(ValueError, match="truncated WAVE chunk"):
        multimodal.decode_wav(good[:24])
    # chopping into the final data chunk — transit truncation under an
    # honest declared size — raises the structural error whether or
    # not the remainder is sample-aligned (a silent short read would
    # be indistinguishable from corruption)
    with pytest.raises(ValueError, match="truncated WAVE chunk"):
        multimodal.decode_wav(good[:-3])
    with pytest.raises(ValueError, match="truncated WAVE chunk"):
        multimodal.decode_wav(good[:-2])


def test_decode_wav_streaming_placeholder_data_size():
    """Streaming-written WAVs (piped encoder output) carry the
    canonical 0xFFFFFFFF placeholder data-chunk size because the
    writer cannot seek back to patch the header; exactly that sentinel
    decodes best-effort as the remaining bytes.  An ARBITRARY stale
    overrun is indistinguishable from truncation in transit and raises
    the structural error instead (ADVICE r12 relaxed this; ADVICE r13
    narrowed it back to the sentinel)."""
    import struct

    want = np.array([5, -6, 7, -8], dtype=np.int64)
    good = _wav_bytes(want)
    # the data chunk is the final chunk in _wav_bytes output: its size
    # field sits 4 bytes before its 8-byte body
    size_off = len(good) - 8 - 4
    assert good[size_off - 4 : size_off] == b"data"

    def _patched(declared):
        return (
            good[:size_off]
            + struct.pack("<I", declared)
            + good[size_off + 4 :]
        )

    rate, n_ch, got = multimodal.decode_wav(_patched(0xFFFFFFFF))
    assert got.tolist() == want.tolist()
    for stale in (9, 10_000):
        with pytest.raises(ValueError, match="truncated WAVE chunk"):
            multimodal.decode_wav(_patched(stale))


def test_decode_wav_misaligned_pcm_raises_named_error():
    import struct

    # declare a data chunk whose size is NOT a multiple of the 16-bit
    # sample width (size honest, content misaligned)
    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16)
    body = b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", 3) + b"\x01\x02\x03" + b"\x00"
    data = b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body
    with pytest.raises(ValueError, match="not a multiple"):
        multimodal.decode_wav(data)


def test_pnm_truncated_header_raises_value_error():
    with pytest.raises(ValueError, match="truncated netpbm header"):
        multimodal.decode_ppm(b"P6 4 2")  # maxval never arrives
    with pytest.raises(ValueError, match="truncated netpbm header"):
        multimodal.decode_ppm(b"P5\n# only a comment\n")


def test_sample_frames_rejects_10bit_and_unknown_colorspaces():
    frames = [np.zeros((2, 2), dtype=np.uint8)]
    with pytest.raises(NotImplementedError, match="C420p10"):
        multimodal.sample_frames(_y4m_bytes(frames, cspace=b"C420p10"))
    with pytest.raises(NotImplementedError, match="C411"):
        multimodal.sample_frames(_y4m_bytes(frames, cspace=b"C411"))


def test_sample_frames_c420_suffix_variants_still_decode():
    # C420jpeg/C420mpeg2 share C420's plane sizes and must keep working
    frames = [np.full((2, 4), 9, dtype=np.uint8)]
    h, w = frames[0].shape
    out = b"YUV4MPEG2 W%d H%d F25:1 C420jpeg\n" % (w, h)
    out += b"FRAME\n" + frames[0].tobytes() + b"\x07" * ((w * h) // 2)
    gw, gh, got = multimodal.sample_frames(out, every_n=1)
    assert (gw, gh) == (w, h) and got[0].tolist() == frames[0].tolist()


# ---------------------------------------------------------------------------
# Round 12: encoder duals + the decode hash row's planted payloads.
# encode_X → decode_X must be the identity on every planted payload,
# because the registry oracle recomputes stats from the planted
# formulas — any asymmetry would be a hash mismatch in disguise.
# ---------------------------------------------------------------------------


@pytest.mark.parametrize(
    "bits,bad",
    [(8, 128), (8, -129), (16, 40000), (16, -32769), (32, 2**31)],
)
def test_encode_wav_out_of_range_raises_at_synthesis(bits, bad):
    """astype would silently WRAP an out-of-range amplitude (40000 →
    -25536 at 16-bit), surfacing as an oracle hash mismatch three
    layers away; encode_wav must fail loudly at synthesis instead
    (ADVICE r12)."""
    with pytest.raises(ValueError, match="out of range"):
        multimodal.encode_wav(np.array([0, bad], dtype=np.int64), bits=bits)
    # boundary values still encode
    lo, hi = -(1 << (bits - 1)), (1 << (bits - 1)) - 1
    _, _, got = multimodal.decode_wav(
        multimodal.encode_wav(np.array([lo, hi], dtype=np.int64), bits=bits)
    )
    assert got.tolist() == [lo, hi]


@pytest.mark.parametrize("doc_id", [0, 1, 2, 7, 59, 499])
def test_encoder_decoder_roundtrip_identity(doc_id):
    rate, s = multimodal.planted_wav(doc_id)
    grate, gch, gs = multimodal.decode_wav(multimodal.encode_wav(s, rate=rate))
    assert (grate, gch) == (rate, 1) and gs.tolist() == s.tolist()

    ppm = multimodal.planted_ppm(doc_id)
    assert multimodal.decode_ppm(multimodal.encode_ppm(ppm)).tolist() == ppm.tolist()

    bmp = multimodal.planted_bmp(doc_id)
    assert multimodal.decode_bmp(multimodal.encode_bmp(bmp)).tolist() == bmp.tolist()

    frames = multimodal.planted_y4m(doc_id)
    w, h = frames[0].shape[1], frames[0].shape[0]
    gw, gh, got = multimodal.sample_frames(
        multimodal.encode_y4m(frames), every_n=1
    )
    assert (gw, gh) == (w, h)
    assert [g.tolist() for g in got] == [f.tolist() for f in frames]

    qoi = multimodal.planted_qoi(doc_id)
    assert multimodal.decode_qoi(multimodal.encode_qoi(qoi)).tolist() == qoi.tolist()


def _qoi_op_mix(data: bytes) -> dict:
    ops = {"RGB": 0, "RGBA": 0, "INDEX": 0, "DIFF": 0, "LUMA": 0, "RUN": 0}
    pos, end = 14, len(data) - 8
    while pos < end:
        b1 = data[pos]
        if b1 == 0xFE:
            ops["RGB"] += 1
            pos += 4
        elif b1 == 0xFF:
            ops["RGBA"] += 1
            pos += 5
        else:
            tag = b1 >> 6
            if tag == 2:
                ops["LUMA"] += 1
                pos += 2
            else:
                ops[{0: "INDEX", 1: "DIFF", 3: "RUN"}[tag]] += 1
                pos += 1
    return ops


def test_qoi_planted_payloads_actually_compress_with_mixed_ops():
    """The hash row's QOI leg must exercise real compression, not a
    degenerate all-literal stream: planted images encode strictly
    smaller than raw and the streams contain RUN chunks plus delta
    (LUMA) chunks — so the decoder's state machine, not a byte copy,
    reconstructs the pixels the oracle recomputes closed-form."""
    for doc_id in (0, 1, 2, 7, 59, 499):
        px = multimodal.planted_qoi(doc_id)
        enc = multimodal.encode_qoi(px)
        assert len(enc) < px.size, (doc_id, len(enc), px.size)
        ops = _qoi_op_mix(enc)
        assert ops["RUN"] > 0 and ops["LUMA"] + ops["DIFF"] > 0, (doc_id, ops)


def test_qoi_encoder_uses_index_and_diff_ops():
    # a 2-color alternating row re-encounters cached colors -> INDEX
    pal = np.array([[10, 20, 30], [200, 100, 50]], dtype=np.uint8)
    px = pal[np.arange(12) % 2].reshape((1, 12, 3))
    ops = _qoi_op_mix(multimodal.encode_qoi(px))
    assert ops["INDEX"] >= 9, ops
    # +1 per channel per pixel -> DIFF chunks
    grad = (np.arange(8, dtype=np.int64)[None, :, None] + np.zeros((1, 8, 3), np.int64)) % 256
    ops = _qoi_op_mix(multimodal.encode_qoi(grad.astype(np.uint8)))
    assert ops["DIFF"] >= 6, ops


def test_qoi_rgba_alpha_change_roundtrip():
    px = np.zeros((2, 3, 4), dtype=np.uint8)
    px[..., 3] = 255
    px[1, 1] = (9, 8, 7, 42)  # alpha flip forces QOI_OP_RGBA
    enc = multimodal.encode_qoi(px)
    assert _qoi_op_mix(enc)["RGBA"] >= 1
    assert multimodal.decode_qoi(enc).tolist() == px.tolist()


def test_qoi_named_errors():
    good = multimodal.encode_qoi(multimodal.planted_qoi(1))
    with pytest.raises(ValueError, match="not a QOI payload"):
        multimodal.decode_qoi(b"nope")
    with pytest.raises(ValueError, match="truncated QOI stream"):
        multimodal.decode_qoi(good[:-10])
    with pytest.raises(ValueError, match="missing QOI end marker"):
        multimodal.decode_qoi(good[:-1] + b"\x02")
    with pytest.raises(ValueError, match="channels"):
        multimodal.decode_qoi(good[:12] + b"\x05" + good[13:])
    import struct

    # run overrunning the declared pixel count: 1x1 image, RUN(5)
    bad = (
        multimodal._QOI_MAGIC + struct.pack(">II", 1, 1) + bytes((3, 0))
        + bytes([0xC0 | 4]) + multimodal._QOI_END
    )
    with pytest.raises(ValueError, match="overruns"):
        multimodal.decode_qoi(bad)


def test_qoi_hostile_dims_rejected_before_allocation():
    """A tiny payload declaring astronomically large dims must raise
    the module's named error BEFORE the (h*w, 4) allocation — one
    chunk byte encodes at most 62 pixels (QOI_OP_RUN max), so the
    stream length bounds the believable pixel count (ADVICE r13).
    The 22-byte minimum (header + end marker) with 2^32-1 x 2^32-1
    dims would otherwise attempt a ~7e19-byte numpy allocation."""
    import struct

    hostile = (
        multimodal._QOI_MAGIC
        + struct.pack(">II", 0xFFFFFFFF, 0xFFFFFFFF)
        + bytes((4, 0))
        + multimodal._QOI_END
    )
    with pytest.raises(ValueError, match="can encode at most"):
        multimodal.decode_qoi(hostile)
    # via the public dispatch too — the path a hostile documents-table
    # payload would take
    with pytest.raises(ValueError, match="can encode at most"):
        multimodal.decode_image(hostile)
    # the bound must not over-reject: a 1x1 image from a single
    # RUN(1) chunk byte (23 bytes total — the minimum decodable
    # stream) sits at the edge and still decodes, to the spec's
    # initial previous-pixel (0,0,0)
    one = (
        multimodal._QOI_MAGIC + struct.pack(">II", 1, 1) + bytes((3, 0))
        + bytes([0xC0]) + multimodal._QOI_END
    )
    got = multimodal.decode_qoi(one)
    assert got.shape == (1, 1, 3) and got.tolist() == [[[0, 0, 0]]]


def test_decode_image_dispatches_qoi():
    px = multimodal.planted_qoi(5)
    got = multimodal.decode_image(multimodal.encode_qoi(px))
    assert got.tolist() == px.tolist()


def test_encode_bmp_pads_odd_width_rows():
    # w=3 -> 9-byte rows padded to 12; the decoder must strip the pad
    px = np.arange(2 * 3 * 3, dtype=np.uint8).reshape((2, 3, 3))
    data = multimodal.encode_bmp(px)
    assert multimodal.decode_bmp(data).tolist() == px.tolist()


def test_decode_stats_wsum_catches_row_flip():
    # the position-weighted checksum is flip-sensitive: a decoder that
    # forgot the bottom-up flip would produce a different wsum
    px = multimodal.planted_bmp(3)
    flat = px.reshape(-1).astype(np.int64)
    w = (flat * (np.arange(flat.size) + 1)).sum()
    flipped = px[::-1].reshape(-1).astype(np.int64)
    wf = (flipped * (np.arange(flat.size) + 1)).sum()
    assert w != wf


# ---------------------------------------------------------------------------
# Round-12 review fixes: the y4m suffix whitelist must accept all
# spec-standard same-size C420 variants and reject different-stride
# ones; netpbm comment truncation gets the named error.
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("suffix", [b"", b"jpeg", b"paldv", b"mpeg2"])
def test_sample_frames_accepts_all_same_size_c420_variants(suffix):
    frames = [np.full((2, 4), 5, dtype=np.uint8)]
    h, w = frames[0].shape
    out = b"YUV4MPEG2 W%d H%d F25:1 C420%s\n" % (w, h, suffix)
    out += b"FRAME\n" + frames[0].tobytes() + b"\x07" * ((w * h) // 2)
    gw, gh, got = multimodal.sample_frames(out, every_n=1)
    assert (gw, gh) == (w, h) and got[0].tolist() == frames[0].tolist()


def test_sample_frames_rejects_extra_plane_variants():
    # C444alpha carries a 4th (alpha) plane — 4x luma per frame, a
    # different stride than C444's 3x; must raise, not mis-walk
    frames = [np.zeros((2, 2), dtype=np.uint8)]
    with pytest.raises(NotImplementedError, match="C444alpha"):
        multimodal.sample_frames(_y4m_bytes(frames, cspace=b"C444alpha"))


def test_pnm_comment_without_newline_raises_named_error():
    with pytest.raises(ValueError, match="truncated netpbm header"):
        multimodal.decode_ppm(b"P5\n# comment with no newline")


def test_decode_stats_independent_of_arrow_batch_size(spark):
    """The decode row's two chained mapInPandas kernels must be
    row-independent: a pathological 7-row Arrow batch size produces
    byte-identical results to the default 10k (r12 probe — also run
    registry-wide for every pandas-kernel query at sf0.01)."""
    from realtime_data_pipeline_spark.plans.registry import REGISTRY

    key = "spark.sql.execution.arrow.maxRecordsPerBatch"
    fn = REGISTRY["multimodal_decode_stats"].fn
    old = spark.conf.get(key)
    try:
        baseline = sorted(map(tuple, fn(spark, SF_DIR).collect()))
        spark.conf.set(key, "7")
        tiny = sorted(map(tuple, fn(spark, SF_DIR).collect()))
    finally:
        spark.conf.set(key, old)
    assert tiny == baseline


@pytest.mark.parametrize("shape", [(0, 0, 3), (0, 5, 3), (4, 0, 4), (1, 1, 3)])
def test_qoi_degenerate_dims_roundtrip(shape):
    """Zero-area and 1x1 images are legal QOI headers: the chunk walk
    is empty (or one op) and the end marker must still be enforced."""
    px = np.zeros(shape, dtype=np.uint8)
    enc = multimodal.encode_qoi(px)
    got = multimodal.decode_qoi(enc)
    assert got.shape == px.shape and got.tolist() == px.tolist()
    if shape[0] * shape[1] == 0:
        with pytest.raises(ValueError, match="missing QOI end marker"):
            multimodal.decode_qoi(enc[:-1])


# ---------------------------------------------------------------- PNG


def test_png_roundtrip_every_filter_type_and_shape():
    """Forced filters 0-4 and a per-row mix, across gray / gray+alpha
    / RGB / RGBA and degenerate 1x1 — byte-exact roundtrips."""
    rng = np.random.default_rng(11)
    for shape in [(1, 1), (4, 5), (3, 7, 2), (6, 4, 3), (5, 5, 4)]:
        px = rng.integers(0, 256, size=shape, dtype=np.uint8)
        h = shape[0]
        for filt in (None, 0, 1, 2, 3, 4, [i % 5 for i in range(h)]):
            got = multimodal.decode_png(multimodal.encode_png(px, filters=filt))
            assert got.shape == px.shape and got.tolist() == px.tolist(), (
                shape,
                filt,
            )


def _png_row_filters(data: bytes) -> list:
    """Filter byte of each row, read back from the (re-inflated) IDAT."""
    import struct
    import zlib

    pos, idat, dims = 8, b"", None
    while pos + 8 <= len(data):
        (ln,) = struct.unpack_from(">I", data, pos)
        ctype = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + ln]
        if ctype == b"IHDR":
            w, h, _d, color = struct.unpack_from(">IIBB", body)
            dims = (w, h, multimodal._PNG_CHANNELS[color])
        elif ctype == b"IDAT":
            idat += body
        pos += 12 + ln
    w, h, ch = dims
    raw = zlib.decompress(idat)
    return [raw[y * (w * ch + 1)] for y in range(h)]


def test_png_heuristic_compresses_gradients_with_real_filters():
    """The default per-row selector must pick NON-None filters on
    gradient content and beat raw size — proving the hash-checked
    payloads exercise the unfilter machinery, not a stored-byte
    path."""
    grad = (
        np.add.outer(np.arange(48), np.arange(40))[:, :, None]
        .repeat(3, 2)
        .astype(np.uint8)
    )
    enc = multimodal.encode_png(grad)
    assert len(enc) < grad.size * 0.25, len(enc) / grad.size
    fts = set(_png_row_filters(enc))
    assert fts - {0}, fts  # at least one of Sub/Up/Average/Paeth


def test_planted_png_payloads_decode_and_filter_mix():
    for doc_id in (0, 1, 7, 38, 123):
        px = multimodal.planted_png(doc_id)
        enc = multimodal.encode_png(px)
        assert multimodal.decode_png(enc).tolist() == px.tolist()
        assert len(enc) < px.size + 57  # compresses vs raw + overhead
        assert set(_png_row_filters(enc)) - {0}, doc_id


def test_png_model_twin_unfilter():
    """Independent in-test reference decoder (naive chunk walk +
    unfilter, written without looking at the production loop) must
    agree with decode_png on randomly-filtered random content — the
    model-twin discipline used for the upsert sink and QOI."""
    import struct
    import zlib

    def ref_decode(data):
        pos, idat = 8, b""
        while pos + 8 <= len(data):
            (ln,) = struct.unpack_from(">I", data, pos)
            ctype = data[pos + 4 : pos + 8]
            body = data[pos + 8 : pos + 8 + ln]
            if ctype == b"IHDR":
                w, h, _d, color = struct.unpack_from(">IIBB", body)
                ch = multimodal._PNG_CHANNELS[color]
            elif ctype == b"IDAT":
                idat += body
            pos += 12 + ln
        raw = zlib.decompress(idat)
        stride = w * ch
        rows, prior = [], [0] * stride
        for y in range(h):
            ft = raw[y * (stride + 1)]
            line = list(raw[y * (stride + 1) + 1 : (y + 1) * (stride + 1)])
            rec = []
            for x in range(stride):
                a = rec[x - ch] if x >= ch else 0
                b = prior[x]
                c = prior[x - ch] if x >= ch else 0
                if ft == 0:
                    v = line[x]
                elif ft == 1:
                    v = line[x] + a
                elif ft == 2:
                    v = line[x] + b
                elif ft == 3:
                    v = line[x] + (a + b) // 2
                else:
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    if pa <= pb and pa <= pc:
                        pr = a
                    elif pb <= pc:
                        pr = b
                    else:
                        pr = c
                    v = line[x] + pr
                rec.append(v & 0xFF)
            rows.append(rec)
            prior = rec
        arr = np.array(rows, dtype=np.uint8)
        return arr.reshape((h, w)) if ch == 1 else arr.reshape((h, w, ch))

    rng = np.random.default_rng(99)
    for shape in [(7, 6), (5, 9, 3), (6, 6, 4)]:
        px = rng.integers(0, 256, size=shape, dtype=np.uint8)
        filt = [int(f) for f in rng.integers(0, 5, size=shape[0])]
        enc = multimodal.encode_png(px, filters=filt)
        assert ref_decode(enc).tolist() == multimodal.decode_png(enc).tolist()


def test_png_named_errors():
    import struct
    import zlib

    def chunk(t, b):
        return (
            struct.pack(">I", len(b))
            + t
            + b
            + struct.pack(">I", zlib.crc32(t + b) & 0xFFFFFFFF)
        )

    def ihdr(w, h, depth=8, color=2, interlace=0):
        return chunk(
            b"IHDR", struct.pack(">IIBBBBB", w, h, depth, color, 0, 0, interlace)
        )

    sig = multimodal._PNG_SIG
    good = multimodal.encode_png(multimodal.planted_png(3))
    with pytest.raises(ValueError, match="not a PNG payload"):
        multimodal.decode_png(b"nope")
    with pytest.raises(ValueError, match="truncated PNG chunk"):
        multimodal.decode_png(good[:-7])
    bad = bytearray(good)
    bad[40] ^= 0xFF
    with pytest.raises(ValueError, match="CRC mismatch"):
        multimodal.decode_png(bytes(bad))
    with pytest.raises(NotImplementedError, match="interlace"):
        multimodal.decode_png(
            sig + ihdr(4, 4, interlace=1)
            + chunk(b"IDAT", zlib.compress(b"\x00" * 52)) + chunk(b"IEND", b"")
        )
    with pytest.raises(NotImplementedError, match="bit depth 16"):
        multimodal.decode_png(
            sig + ihdr(4, 4, depth=16)
            + chunk(b"IDAT", zlib.compress(b"\x00" * 104)) + chunk(b"IEND", b"")
        )
    with pytest.raises(NotImplementedError, match="palette"):
        multimodal.decode_png(
            sig + ihdr(4, 4, color=3)
            + chunk(b"IDAT", zlib.compress(b"\x00" * 20)) + chunk(b"IEND", b"")
        )
    with pytest.raises(ValueError, match="size mismatch"):
        multimodal.decode_png(
            sig + ihdr(4, 4)
            + chunk(b"IDAT", zlib.compress(b"\x00" * 10)) + chunk(b"IEND", b"")
        )
    # zip bomb: 1x1 header, 10 MB of inflated zeros — the bounded
    # inflate stops at the declared size and raises the named error
    with pytest.raises(ValueError, match="size mismatch"):
        multimodal.decode_png(
            sig + ihdr(1, 1, color=0)
            + chunk(b"IDAT", zlib.compress(b"\x00" * 10_000_000))
            + chunk(b"IEND", b"")
        )
    # hostile dims: (2^31-1)^2 pixels declared from a tiny stream —
    # must raise the named error without attempting the allocation
    # (the QOI hostile-dims discipline; also ssize_t-safe)
    with pytest.raises(ValueError, match="size mismatch"):
        multimodal.decode_png(
            sig + ihdr(2**31 - 1, 2**31 - 1)
            + chunk(b"IDAT", zlib.compress(b"\x00" * 100))
            + chunk(b"IEND", b"")
        )
    with pytest.raises(ValueError, match="corrupt PNG IDAT"):
        multimodal.decode_png(
            sig + ihdr(2, 2, color=0)
            + chunk(b"IDAT", b"\x99\x99\x99") + chunk(b"IEND", b"")
        )
    with pytest.raises(ValueError, match="missing IDAT"):
        multimodal.decode_png(sig + ihdr(2, 2) + chunk(b"IEND", b""))
    with pytest.raises(ValueError, match="filter type 5"):
        multimodal.decode_png(
            sig + ihdr(2, 1)
            + chunk(b"IDAT", zlib.compress(bytes([5]) + b"\x00" * 6))
            + chunk(b"IEND", b"")
        )
    with pytest.raises(ValueError, match="zero dimension"):
        multimodal.encode_png(np.zeros((0, 3), dtype=np.uint8))
    with pytest.raises(ValueError, match="zero dimension"):
        multimodal.decode_png(
            sig + ihdr(0, 4) + chunk(b"IDAT", zlib.compress(b""))
            + chunk(b"IEND", b"")
        )


def test_decode_image_dispatches_png():
    px = multimodal.planted_png(5)
    got = multimodal.decode_image(multimodal.encode_png(px))
    assert got.tolist() == px.tolist()
