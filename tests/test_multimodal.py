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
    """When PIL exists, decode_image must return a real image object for
    a valid payload — the import-gated path activates correctly."""
    import io

    from PIL import Image

    buf = io.BytesIO()
    Image.new("RGB", (4, 4), color=(1, 2, 3)).save(buf, format="PNG")
    img = multimodal.decode_image(buf.getvalue())
    assert img.size == (4, 4)


def test_decode_image_stub_contract_without_codec():
    """Without PIL the stub must raise NotImplementedError (not a bare
    ImportError escaping from inside) so callers can gate on it."""
    if _has_pil():
        pytest.skip("PIL present; stub path not reachable")
    with pytest.raises(NotImplementedError):
        multimodal.decode_image(b"\x89PNG\r\n")


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
