"""Property tests for the r11 segment-level cleaning operators: the
reassembly invariant (segments cover the tokenized text exactly), the
keep-first rule of the intra-doc scrub, boilerplate set semantics, and the
closed-form entropy/KL identities — all against brute-force Python on the
collected test corpus (bounded at sf0.001)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from project_samanvay_a_true_hybrid_htap_database_spark.functions.textfns import (
    token_segments,
    tokens,
)
from project_samanvay_a_true_hybrid_htap_database_spark.operators import text
from project_samanvay_a_true_hybrid_htap_database_spark.sources import load_table

SF_DIR = "/root/testdata/sf0.001"


def _py_segments(txt: str, seg: int) -> list[str]:
    toks = txt.strip().lower().split(" ")
    return [" ".join(toks[i : i + seg]) for i in range(0, max(len(toks), 1), seg)]


@pytest.fixture(scope="module")
def docs(spark):
    return {
        r["doc_id"]: (r["text"], r["source"])
        for r in load_table(spark, SF_DIR, "documents").collect()
    }


class TestReassemblyInvariant:
    def test_segments_cover_tokenized_text(self, spark):
        df = load_table(spark, SF_DIR, "documents").select(
            F.trim(F.lower("text")).alias("orig"),
            F.array_join(
                token_segments(tokens("text"), text.BOILERPLATE_SEG_TOKENS), " "
            ).alias("re"),
        )
        assert df.filter(F.col("orig") != F.col("re")).count() == 0

    def test_spark_segments_match_python(self, spark, docs):
        got = {
            r["doc_id"]: list(r["segs"])
            for r in load_table(spark, SF_DIR, "documents")
            .select("doc_id", token_segments(tokens("text"), 4).alias("segs"))
            .collect()
        }
        for did, (txt, _) in docs.items():
            assert got[did] == _py_segments(txt, 4), did


class TestIntraDocScrub:
    def test_keep_first_matches_bruteforce(self, spark, docs):
        got = {
            r["doc_id"]: r
            for r in text.dedup_segments_within_doc(spark, SF_DIR).collect()
        }
        for did, (txt, _) in docs.items():
            segs = _py_segments(txt, text.INTRADOC_SEG_TOKENS)
            seen: list[str] = []
            for s in segs:
                if s not in seen:
                    seen.append(s)
            r = got[did]
            assert r["n_segments"] == len(segs)
            assert r["n_kept"] == len(seen)
            assert r["clean_text"] == " ".join(seen)

    def test_idempotent_on_clean_docs(self, spark):
        """A doc whose segments are already unique passes through verbatim."""
        out = text.dedup_segments_within_doc(spark, SF_DIR)
        clean = out.filter(F.col("n_kept") == F.col("n_segments"))
        assert clean.filter(
            F.length("clean_text") == 0
        ).count() <= out.filter(F.length("clean_text") == 0).count()
        # and kept == segments implies text unchanged vs reassembly
        df = load_table(spark, SF_DIR, "documents").select(
            "doc_id", F.trim(F.lower("text")).alias("orig")
        )
        j = clean.join(df, "doc_id")
        assert j.filter(F.col("clean_text") != F.col("orig")).count() == 0


class TestBoilerplate:
    def test_flagged_set_matches_bruteforce(self, spark, docs):
        from collections import defaultdict

        per = defaultdict(set)
        src_docs = defaultdict(int)
        for did, (txt, src) in docs.items():
            src_docs[src] += 1
            for s in set(_py_segments(txt, text.BOILERPLATE_SEG_TOKENS)):
                per[(src, s)].add(did)
        want = {
            (src, s): len(ds)
            for (src, s), ds in per.items()
            if len(ds) >= text.BOILERPLATE_MIN_DOCS
        }
        got = {
            (r["source"], r["segment"]): r["n_docs"]
            for r in text.boilerplate_segments_report(spark, SF_DIR).collect()
        }
        assert got == want

    def test_scrub_drops_exactly_flagged_occurrences(self, spark, docs):
        flagged = {
            (r["source"], r["segment"])
            for r in text.boilerplate_segments_report(spark, SF_DIR).collect()
        }
        got = {
            r["doc_id"]: r for r in text.boilerplate_scrub(spark, SF_DIR).collect()
        }
        for did, (txt, src) in docs.items():
            segs = _py_segments(txt, text.BOILERPLATE_SEG_TOKENS)
            kept = [s for s in segs if (src, s) not in flagged]
            r = got[did]
            assert r["n_segments"] == len(segs)
            assert r["n_dropped"] == len(segs) - len(kept)
            assert r["clean_text"] == " ".join(kept)

    def test_some_boilerplate_exists_at_test_sf(self, spark):
        """The planted near-duplicate docs guarantee a non-trivial flagged
        set; a zero-row report would make the scrub test vacuous."""
        assert text.boilerplate_segments_report(spark, SF_DIR).count() > 0


class TestEntropyAndKl:
    def test_entropy_matches_bruteforce(self, spark, docs):
        got = {
            r["doc_id"]: r["entropy_bits"]
            for r in text.char_entropy_score(spark, SF_DIR).collect()
        }
        alpha = set(text.ENTROPY_ALPHABET)
        for did, (txt, _) in list(docs.items())[:100]:
            s = txt.lower()
            n = len(s)
            counts = {}
            for ch in s:
                b = ch if ch in alpha else "\x00"
                counts[b] = counts.get(b, 0) + 1
            ent = -sum(
                (c / n) * math.log2(c / n) for c in counts.values() if c > 0
            )
            assert abs(got[did] - ent) < 2e-6, did

    def test_entropy_in_natural_text_band(self, spark):
        out = text.char_entropy_score(spark, SF_DIR)
        stats = out.agg(
            F.min("entropy_bits").alias("lo"), F.max("entropy_bits").alias("hi")
        ).collect()[0]
        assert 2.5 < stats["lo"] and stats["hi"] < 5.5

    def test_kl_nonnegative_and_bounded(self, spark):
        rows = text.source_token_kl(spark, SF_DIR).collect()
        assert len(rows) > 0
        for r in rows:
            # Gibbs: KL >= 0 (up to the 1e-6 floor-truncation grain)
            assert r["kl_bits"] >= -1e-6, r
            assert r["kl_bits"] < 10.0, r

    def test_kl_matches_bruteforce(self, spark, docs):
        from collections import Counter, defaultdict

        src_counts: dict[str, Counter] = defaultdict(Counter)
        for _, (txt, src) in docs.items():
            src_counts[src].update(txt.strip().lower().split(" "))
        corpus = Counter()
        for c in src_counts.values():
            corpus.update(c)
        n_corpus = sum(corpus.values())
        got = {
            r["source"]: (r["n_tokens"], r["kl_bits"])
            for r in text.source_token_kl(spark, SF_DIR).collect()
        }
        for src, c in src_counts.items():
            n_s = sum(c.values())
            kl = sum(
                (v / n_s) * math.log2((v / n_s) / (corpus[t] / n_corpus))
                for t, v in c.items()
            )
            nt, klb = got[src]
            assert nt == n_s
            assert abs(klb - kl) < 2e-6, src


class TestCrossDocScrub:
    def test_keep_first_corpus_wide_matches_bruteforce(self, spark, docs):
        got = {
            r["doc_id"]: r
            for r in text.dedup_segments_across_docs(spark, SF_DIR).collect()
        }
        seen: set[str] = set()
        for did in sorted(docs):  # first occurrence by (doc_id, pos)
            txt, _ = docs[did]
            segs = _py_segments(txt, text.BOILERPLATE_SEG_TOKENS)
            kept = []
            for s in segs:
                if s not in seen:
                    seen.add(s)
                    kept.append(s)
            r = got[did]
            assert r["n_segments"] == len(segs), did
            assert r["n_dropped"] == len(segs) - len(kept), did
            assert r["clean_text"] == " ".join(kept), did

    def test_every_segment_survives_exactly_once(self, spark):
        """The operator's contract: one copy of every distinct segment
        corpus-wide — total kept == distinct segments in the corpus."""
        out = text.dedup_segments_across_docs(spark, SF_DIR)
        kept_total = out.agg(
            F.sum(F.col("n_segments") - F.col("n_dropped"))
        ).collect()[0][0]
        distinct = (
            load_table(spark, SF_DIR, "documents")
            .select(
                F.explode(
                    token_segments(tokens("text"), text.BOILERPLATE_SEG_TOKENS)
                ).alias("s")
            )
            .agg(F.countDistinct("s"))
            .collect()[0][0]
        )
        assert kept_total == distinct
