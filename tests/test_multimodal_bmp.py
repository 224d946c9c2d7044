"""The r14 real-BMP image path: attach_bmp_blob must emit spec-compliant
uncompressed 24-bit BMP payloads, and the decoder must honor the format's
real quirks — bottom-up row storage and 4-byte row strides — to recover
the pixel grid before the nearest-neighbor resample.
"""

from __future__ import annotations

import struct

import pandas as pd
import pytest

from project_samanvay_a_true_hybrid_htap_database_spark.operators.multimodal import (
    _bmp_resize,
    attach_bmp_blob,
    multimodal_bmp_resize,
)

SF_DIR = "/root/testdata/sf0.001"


def test_bmp_blobs_are_spec_compliant(spark):
    rows = attach_bmp_blob(spark, SF_DIR).limit(8).collect()
    assert rows
    for r in rows:
        b = bytes(r["content"])
        assert b[:2] == b"BM"
        size, _r1, _r2, off = struct.unpack("<IHHI", b[2:14])
        assert size == len(b) and off == 54
        hsz, w, h, planes, bpp = struct.unpack("<IiiHH", b[14:30])
        assert hsz == 40 and planes == 1 and bpp == 24
        assert w == 8 + r["doc_id"] % 9
        stride = (3 * w + 3) & ~3
        assert len(b) - off == stride * h  # rows really padded to 4 bytes


def test_decoder_undoes_bottom_up_and_stride(spark):
    """Hand-build a 3x2 BMP whose rows differ: if the decoder forgets the
    bottom-up flip or mis-sizes the stride, the sums come out wrong."""
    w, h = 3, 2
    stride = (3 * w + 3) & ~3  # 12 — includes 3 pad bytes per row
    # logical top-down grid: row0 = [1, 2, 3], row1 = [10, 20, 30]
    row0 = bytes([1, 1, 1, 2, 2, 2, 3, 3, 3]) + b"\x00" * (stride - 9)
    row1 = bytes([10, 10, 10, 20, 20, 20, 30, 30, 30]) + b"\x00" * (
        stride - 9
    )
    pixel = row1 + row0  # bottom-up storage: LAST logical row first
    off = 54
    hdr = struct.pack("<2sIHHI", b"BM", off + len(pixel), 0, 0, off)
    info = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(pixel), 2835, 2835, 0, 0
    )
    pdf = pd.DataFrame({"doc_id": [5], "content": [hdr + info + pixel]})
    out = pd.concat(list(_bmp_resize(iter([pdf]))))
    assert list(out["px_sum"]) == [1 + 2 + 3 + 10 + 20 + 30]
    # NN resample to 8x8: src_y = (ty*2)//8 -> rows 0,0,0,0,1,1,1,1;
    # src_x = (tx*3)//8 -> cols 0,0,0,1,1,1,2,2 of the TOP-DOWN grid
    want = 4 * (3 * 1 + 3 * 2 + 2 * 3) + 4 * (3 * 10 + 3 * 20 + 2 * 30)
    assert list(out["resized_sum"]) == [want]


def test_decoder_rejects_non_bmp_and_top_down():
    garbage = pd.DataFrame({"doc_id": [1], "content": [b"not a bmp"]})
    with pytest.raises(ValueError, match="not a BMP"):
        list(_bmp_resize(iter([garbage])))
    # negative height = top-down storage (valid BMP, but outside this
    # decoder's honest support) must raise, not silently mis-decode
    off = 54
    pixel = b"\x00" * 4
    hdr = struct.pack("<2sIHHI", b"BM", off + len(pixel), 0, 0, off)
    info = struct.pack(
        "<IiiHHIIiiII", 40, 1, -1, 1, 24, 0, len(pixel), 2835, 2835, 0, 0
    )
    td = pd.DataFrame({"doc_id": [2], "content": [hdr + info + pixel]})
    with pytest.raises(ValueError, match="bottom-up 24-bit"):
        list(_bmp_resize(iter([td])))


def test_registered_entry_matches_fixture_closed_form(spark):
    """Spot-check the decode against the fixture's closed form computed
    independently in Python (not via the oracle)."""
    got = {
        r["doc_id"]: r
        for r in multimodal_bmp_resize(spark, SF_DIR).limit(2000).collect()
    }
    from project_samanvay_a_true_hybrid_htap_database_spark.sources import (
        load_table,
    )

    texts = {
        r["doc_id"]: r["text"]
        for r in load_table(spark, SF_DIR, "documents")
        .select("doc_id", "text")
        .collect()
    }
    assert set(got) == set(texts)
    for doc_id in list(texts)[:25]:
        w = 8 + doc_id % 9
        h = 8 + len(texts[doc_id].encode("utf-8")) % 7
        px = sum(
            (doc_id * 7 + y * 31 + x * 13) % 256
            for y in range(h)
            for x in range(w)
        )
        rz = sum(
            (doc_id * 7 + ((ty * h) // 8) * 31 + ((tx * w) // 8) * 13) % 256
            for ty in range(8)
            for tx in range(8)
        )
        r = got[doc_id]
        assert (r["width"], r["height"]) == (w, h)
        assert r["px_sum"] == px and r["resized_sum"] == rz
