"""Concat-and-chunk sequence packing: exact chunk maps, straddling
semantics, determinism, and a property check against a pure-Python
reference."""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from opentelemetry_collector_spark.trainingdata import chunk_stats, pack_chunks


def reference_pack(rows, budget):
    """rows: [(part, id, tok)] → {(part, chunk, id): tokens_in_chunk}
    — the naive sequential layout the Spark version must reproduce."""
    out = {}
    by_part = {}
    for part, i, tok in sorted(rows):
        by_part.setdefault(part, []).append((i, tok))
    for part, docs in by_part.items():
        off = 0
        for i, tok in docs:
            if tok <= 0:
                continue
            start, end = off, off + tok
            off = end
            for k in range(start // budget, (end - 1) // budget + 1):
                out[(part, k, i)] = min(end, (k + 1) * budget) - max(
                    start, k * budget
                )
    return out


class TestPackChunks:
    @pytest.fixture(scope="class")
    def docs(self, spark):
        rows = [
            ("en", 1, 100), ("en", 2, 100), ("en", 3, 100),  # straddler: doc 3
            ("de", 10, 256), ("de", 11, 1),                  # exact boundary
            ("fr", 20, 600),                                 # spans 3 chunks
            ("zh", 30, 0),                                   # dropped
        ]
        return spark.createDataFrame(rows, "lang string, doc_id long, n_tokens long")

    def test_exact_chunk_map(self, spark, docs):
        got = {
            (r["lang"], r["chunk_id"], r["id"]): r["tokens_in_chunk"]
            for r in pack_chunks(docs, 256, part_col="lang").collect()
        }
        want = reference_pack(
            [(r["lang"], r["doc_id"], r["n_tokens"]) for r in docs.collect()],
            256,
        )
        assert got == want
        # en doc 3 straddles: 56 tokens in chunk 0, 44 in chunk 1
        assert got[("en", 0, 3)] == 56 and got[("en", 1, 3)] == 44
        # de doc 10 fills chunk 0 exactly; doc 11 starts chunk 1
        assert got[("de", 0, 10)] == 256 and got[("de", 1, 11)] == 1
        # fr doc 20 spans chunks 0..2
        assert {k[1] for k in got if k[0] == "fr"} == {0, 1, 2}
        # zero-token zh doc occupies nothing
        assert not any(k[0] == "zh" for k in got)

    def test_stats(self, spark, docs):
        packed = pack_chunks(docs, 256, part_col="lang")
        stats = {r["lang"]: r for r in chunk_stats(packed, "lang").collect()}
        en = stats["en"]
        assert (en["n_chunks"], en["n_docs"], en["n_straddlers"]) == (2, 3, 1)
        assert en["total_tokens"] == 300
        fr = stats["fr"]
        assert (fr["n_chunks"], fr["n_straddlers"]) == (3, 1)

    def test_budget_validated(self, docs):
        with pytest.raises(ValueError):
            pack_chunks(docs, 0)

    def test_tied_order_key_rows_do_not_overlap(self, spark):
        """Regression: rows tied on order_col must still get disjoint
        spans. Spark's default window frame is RANGE, under which ties
        share one cumulative end (two 5-token docs would both get
        end=10); the ROWS frame + id tiebreaker keeps the layout a
        bijection onto [0, total_tokens)."""
        docs = spark.createDataFrame(
            [(1, "2024-01-01", 5), (2, "2024-01-01", 5), (3, "2024-01-02", 5)],
            "doc_id long, ingest_date string, n_tokens long",
        )
        rows = pack_chunks(docs, 100, order_col="ingest_date").collect()
        spans = sorted((r["start"], r["end"], r["id"]) for r in rows)
        assert spans == [(0, 5, 1), (5, 10, 2), (10, 15, 3)]
        assert sum(r["tokens_in_chunk"] for r in rows) == 15

    def test_huge_offsets_use_integer_division(self, spark):
        """Regression: chunk ids must come from integer `div`, not
        floor(double division). At start = 2^55 + 2^40 - 1 the long→
        double cast rounds UP past the chunk boundary, so the float
        path assigns the next doc to chunk 32769 only and silently
        drops its token in chunk 32768."""
        S, B = 2**55 + 2**40 - 1, 2**40
        docs = spark.createDataFrame(
            [(1, S), (2, 5)], "doc_id long, n_tokens long"
        )
        got = {
            (r["chunk_id"], r["id"]): r["tokens_in_chunk"]
            for r in pack_chunks(docs, B).collect()
            if r["id"] == 2
        }
        # doc 2 spans [S, S+5): 1 token ends chunk 32768, 4 in 32769
        assert got == {(32768, 2): 1, (32769, 2): 4}

    def test_global_stream_without_part_col(self, spark):
        docs = spark.createDataFrame(
            [(1, 5), (2, 5), (3, 5)], "doc_id long, n_tokens long"
        )
        got = {
            (r["chunk_id"], r["id"]): r["tokens_in_chunk"]
            for r in pack_chunks(docs, 7).collect()
        }
        want = {
            (k[1], k[2]): v
            for k, v in reference_pack([(0, 1, 5), (0, 2, 5), (0, 3, 5)], 7).items()
        }
        assert got == want

    @given(
        st.lists(
            st.tuples(
                st.sampled_from(["a", "b"]),
                st.integers(0, 50),
            ),
            min_size=0,
            max_size=20,
            unique_by=lambda t: t,
        ),
        st.integers(1, 40),
    )
    # slow lane: random-corpora parity; td_pack driver row re-verifies
    @pytest.mark.slow
    @settings(max_examples=20, deadline=None)
    def test_matches_reference_on_random_corpora(self, spark, toks, budget):
        rows = [(part, i, tok) for i, (part, tok) in enumerate(toks)]
        if not rows:
            return
        df = spark.createDataFrame(rows, "lang string, doc_id long, n_tokens long")
        got = {
            (r["lang"], r["chunk_id"], r["id"]): r["tokens_in_chunk"]
            for r in pack_chunks(df, budget, part_col="lang").collect()
        }
        assert got == reference_pack(rows, budget)
        # invariant: per-doc tokens_in_chunk sums to the doc's count
        per_doc = {}
        for (part, _k, i), v in got.items():
            per_doc[i] = per_doc.get(i, 0) + v
        for part, i, tok in rows:
            if tok > 0:
                assert per_doc[i] == tok, i
