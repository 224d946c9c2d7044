"""JSONL / CSV ingest-export fidelity on HOSTILE content (r10).

The registered round-trip queries prove fidelity on the driver corpus;
these pin the cases that corpus cannot exercise: embedded commas, quotes,
newlines, unicode, empty strings, and nulls must survive both formats
byte-exactly, and a malformed JSONL line must surface in the corrupt
audit instead of killing the ingest or silently vanishing.
"""

from __future__ import annotations

import os

from project_samanvay_a_true_hybrid_htap_database_spark.sources import textio

HOSTILE = [
    (0, 'comma, separated, "quoted", done', "en", "web", 32),
    (1, "line one\nline two\nline three", "en", "logs", 28),
    (2, 'she said "hi, there" — naïve café ☕', "fr", "web", 35),
    (3, "", "en", "empty", 0),
    (4, None, "en", "nulls", 0),
    (5, "trailing backslash \\ and tab\tchar", "en", "web", 33),
]


def _hostile_df(spark):
    return spark.createDataFrame(
        HOSTILE,
        "doc_id long, text string, lang string, source string, n_chars long",
    )


def _rows(df):
    return sorted(tuple(r) for r in df.select(*textio.DOC_COLS).collect())


def test_jsonl_roundtrip_hostile(spark, tmp_path):
    src = _hostile_df(spark)
    out = str(tmp_path / "jsonl")
    textio.write_documents_jsonl(src, out)
    back = textio.read_documents_jsonl(spark, out)
    assert _rows(back) == _rows(src)


def test_csv_roundtrip_hostile(spark, tmp_path):
    src = _hostile_df(spark)
    out = str(tmp_path / "csv")
    textio.write_documents_csv(src, out)
    back = textio.read_documents_csv(spark, out)
    got, want = _rows(back), _rows(src)
    # CSV cannot distinguish null from empty string in an unquoted field;
    # Spark writes null as empty — normalize BOTH sides the way every
    # warehouse CSV contract does, and assert everything else is exact.
    norm = lambda rows: [  # noqa: E731
        tuple("" if v is None else v for v in r) for r in rows
    ]
    assert norm(got) == norm(want)


def test_jsonl_corrupt_lines_surface_in_audit(spark, tmp_path):
    """The DROP/AUDIT split: the data path survives malformed lines and
    keeps every clean row (count-safe — a bare .count() works), and the
    paired audit counts exactly the dropped lines."""
    out = str(tmp_path / "dirty")
    os.makedirs(out)
    with open(os.path.join(out, "part-0.json"), "w") as fh:
        fh.write(
            '{"doc_id": 1, "text": "good line", "lang": "en",'
            ' "source": "web", "n_chars": 9}\n'
        )
        fh.write("this is not json at all\n")
        fh.write('{"doc_id": 2, "text": "also good",')  # truncated object
        fh.write("\n")
        fh.write(
            '{"doc_id": 3, "text": "fine", "lang": "en",'
            ' "source": "web", "n_chars": 4}\n'
        )
    clean = textio.read_documents_jsonl(spark, out)
    assert clean.count() == 2  # the pruning-safe count the driver gate runs
    assert sorted(r.doc_id for r in clean.collect()) == [1, 3]
    assert textio.jsonl_corrupt_count(spark, out) == 2


def test_exports_are_reused_not_rewritten(spark):
    """The identity-keyed export dir makes repeated invocations serve the
    SAME materialized export (the _index_dir discipline): same path, and
    the _SUCCESS mtime does not move on a second call."""
    sf = "/root/testdata/sf0.001"
    a = textio.documents_jsonl_roundtrip(spark, sf)
    d = textio._export_dir("jsonl", sf)
    marker = os.path.join(d, "_SUCCESS")
    t0 = os.stat(marker).st_mtime_ns
    b = textio.documents_jsonl_roundtrip(spark, sf)
    assert os.stat(marker).st_mtime_ns == t0
    assert _rows(a) == _rows(b) and a.count() > 0
