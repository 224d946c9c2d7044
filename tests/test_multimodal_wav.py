"""The r14 real-WAV audio path: attach_wav_blob must emit GENUINE
RIFF/WAVE payloads (independently parseable by stdlib wave), and the
chunker must derive its window boundaries from the parsed header — not
from a constant — and reject payloads it cannot honestly decode.
"""

from __future__ import annotations

import io
import wave

import pandas as pd
import pytest

from project_samanvay_a_true_hybrid_htap_database_spark.operators.multimodal import (
    _WAV_SR,
    _wav_chunk,
    attach_wav_blob,
    audio_chunks,
)
from project_samanvay_a_true_hybrid_htap_database_spark.sources import (
    load_table,
)

SF_DIR = "/root/testdata/sf0.001"


def test_wav_blobs_are_genuine_riff_payloads(spark):
    rows = attach_wav_blob(spark, SF_DIR).limit(5).collect()
    texts = {
        r["doc_id"]: r["text"]
        for r in load_table(spark, SF_DIR, "documents")
        .select("doc_id", "text")
        .collect()
    }
    assert rows
    for r in rows:
        b = bytes(r["content"])
        assert b[:4] == b"RIFF" and b[8:12] == b"WAVE"
        with wave.open(io.BytesIO(b), "rb") as w:
            assert w.getnchannels() == 1
            assert w.getsampwidth() == 2
            assert w.getframerate() == _WAV_SR
            # one sample per utf-8 byte of the source text
            assert w.getnframes() == len(texts[r["doc_id"]].encode("utf-8"))


def test_chunk_boundaries_come_from_the_parsed_header(spark):
    """Window/hop are sr*20ms / sr*10ms of the HEADER's sample rate: feed
    the chunker a hand-built WAV at a different rate and the boundaries
    must follow it (16000 Hz -> window 320, hop 160)."""
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(16000)
        w.writeframes(b"\x01\x00" * 500)  # 500 samples of amplitude 1
    pdf = pd.DataFrame({"doc_id": [7], "content": [buf.getvalue()]})
    out = pd.concat(list(_wav_chunk(iter([pdf]))))
    assert list(out["sr"].unique()) == [16000]
    assert list(out["start_sample"]) == [0, 160, 320, 480]
    assert list(out["n_samples"]) == [320, 320, 180, 20]
    assert list(out["sum_amp"]) == [320, 320, 180, 20]  # decoded, not sliced


def test_chunker_rejects_undecodable_payloads():
    stereo = io.BytesIO()
    with wave.open(stereo, "wb") as w:
        w.setnchannels(2)
        w.setsampwidth(2)
        w.setframerate(8000)
        w.writeframes(b"\x00\x00" * 8)
    pdf = pd.DataFrame({"doc_id": [1], "content": [stereo.getvalue()]})
    with pytest.raises(ValueError, match="mono 16-bit"):
        list(_wav_chunk(iter([pdf])))
    garbage = pd.DataFrame({"doc_id": [2], "content": [b"not a wav"]})
    with pytest.raises(wave.Error):
        list(_wav_chunk(iter([garbage])))


def test_audio_chunks_counts_match_text_lengths(spark):
    got = audio_chunks(spark, SF_DIR)
    per_doc = {
        r["doc_id"]: r["n"]
        for r in got.groupBy("doc_id").count().withColumnRenamed("count", "n").collect()
    }
    texts = {
        r["doc_id"]: len(r["text"].encode("utf-8"))
        for r in load_table(spark, SF_DIR, "documents")
        .select("doc_id", "text")
        .collect()
    }
    hop = _WAV_SR * 10 // 1000
    for doc_id, n_bytes in texts.items():
        want = (n_bytes + hop - 1) // hop if n_bytes else 0
        assert per_doc.get(doc_id, 0) == want


def test_vad_segments_merge_consecutive_active_chunks(spark):
    """Segments are maximal runs: within a doc, segment chunk spans are
    disjoint, ordered, and separated by at least one INACTIVE chunk."""
    from collections import defaultdict

    from project_samanvay_a_true_hybrid_htap_database_spark.operators.multimodal import (
        _VAD_THR,
        audio_chunks,
        audio_vad_segments,
    )

    segs = defaultdict(list)
    for r in audio_vad_segments(spark, SF_DIR).collect():
        segs[r["doc_id"]].append(r)
    assert segs, "VAD vacuous on this corpus"
    active = {
        (r["doc_id"], r["chunk_idx"])
        for r in audio_chunks(spark, SF_DIR).collect()
        if r["sum_sq"] >= _VAD_THR * r["n_samples"]
    }
    covered = set()
    for doc_id, rows in segs.items():
        rows.sort(key=lambda r: r["seg_idx"])
        prev_end = None
        for r in rows:
            span = range(r["start_chunk"], r["start_chunk"] + r["n_chunks"])
            for c in span:
                assert (doc_id, c) in active  # every chunk in a segment is active
                covered.add((doc_id, c))
            if prev_end is not None:
                assert r["start_chunk"] > prev_end + 1  # a gap separates runs
            prev_end = span[-1]
    assert covered == active  # every active chunk lands in exactly one segment
