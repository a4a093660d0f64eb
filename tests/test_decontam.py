"""Benchmark decontamination + chunk-level exact substring dedup.
Goldens are independent pure-Python implementations."""

import hashlib

import pytest
from pyspark.sql import functions as F

from opentelemetry_collector_spark.trainingdata import (
    contamination,
    decontaminate,
    eval_ngram_set,
    eval_short_widths,
    chunk_dedup_stats,
    chunk_hash_col,
)
from opentelemetry_collector_spark.trainingdata.dedup import CHUNK_WIDTH


def py_ngrams(text: str, n: int) -> set[str]:
    toks = text.strip().lower().split()
    if len(toks) >= n:
        return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}
    return {" ".join(toks)}


TRAIN = [
    # doc 0 contains eval doc 100's exact question as a span
    (0, "intro text then what is the capital of france and more filler words here"),
    # doc 1 shares nothing with the eval set
    (1, "completely unrelated content about distributed query planning engines"),
    # doc 2 contains TWO eval n-grams (overlapping eval doc 101)
    (2, "the mitochondria is the powerhouse of the cell said the exam"),
    # doc 3 shorter than n tokens, no overlap
    (3, "tiny doc"),
]
EVAL = [
    (100, "what is the capital of france"),
    (101, "the mitochondria is the powerhouse of the cell"),
    (102, "short q"),  # shorter than n → whole-text fallback n-gram
]
N = 5


@pytest.fixture(scope="module")
def train(spark):
    return spark.createDataFrame(TRAIN, "doc_id long, text string").cache()


@pytest.fixture(scope="module")
def evaldf(spark):
    return spark.createDataFrame(EVAL, "doc_id long, text string").cache()


def py_contamination():
    ev, widths = set(), set()
    for _, t in EVAL:
        ev |= py_ngrams(t, N)
        w = len(t.strip().lower().split())
        if 0 < w < N:
            widths.add(w)  # short eval prompts → containment widths
    out = {}
    for i, t in TRAIN:
        ngs = py_ngrams(t, N)
        for w in widths:
            ngs |= py_ngrams(t, w)
        hits = len(ngs & ev)
        if hits:
            out[i] = (len(ngs), hits)
    return out


class TestDecontam:
    def test_eval_ngram_set_includes_short_doc_fallback(self, evaldf):
        grams = {r["g"] for r in eval_ngram_set(evaldf, N).collect()}
        assert "short q" in grams  # whole-text fallback
        assert "what is the capital of" in grams

    def test_contamination_matches_python(self, train, evaldf):
        rows = contamination(train, evaldf, n=N).collect()
        got = {r["doc_id"]: (r["total_ngrams"], r["hit_ngrams"]) for r in rows}
        assert got == py_contamination()
        # clean docs are absent, not zero-rowed
        assert 1 not in got and 3 not in got
        # fraction is hits/total rounded to 6dp
        for r in rows:
            assert r["contamination"] == round(
                r["hit_ngrams"] / r["total_ngrams"], 6
            )

    def test_decontaminate_strict_drops_any_hit(self, train, evaldf):
        kept = {r["doc_id"] for r in decontaminate(train, evaldf, n=N).collect()}
        assert kept == {1, 3}

    def test_decontaminate_max_hits_threshold(self, train, evaldf):
        golden = py_contamination()
        # doc 2 has more hits than doc 0; a threshold between them
        # keeps the lightly-contaminated doc
        lo = golden[0][1]
        kept = {
            r["doc_id"]
            for r in decontaminate(train, evaldf, n=N, max_hits=lo).collect()
        }
        assert 0 in kept and 2 not in kept

    def test_exact_eval_doc_is_contaminated(self, spark, evaldf):
        # a training doc that IS an eval doc: every n-gram hits
        # (short_widths=() pins the pure width-n semantics)
        t = spark.createDataFrame(
            [(7, "what is the capital of france")], "doc_id long, text string"
        )
        [r] = contamination(t, evaldf, n=N, short_widths=()).collect()
        assert r["hit_ngrams"] == r["total_ngrams"]
        assert r["contamination"] == 1.0

    def test_eval_short_widths_probe(self, evaldf):
        # 'short q' is the only sub-n eval doc → one width
        assert eval_short_widths(evaldf, N) == [2]

    def test_short_eval_prompt_caught_by_containment(self, spark, evaldf):
        # a training doc EMBEDDING the short benchmark prompt (not
        # equal to it) must be flagged: the auto short-width grams on
        # the training side collide with the eval whole-text fallback
        t = spark.createDataFrame(
            [(8, "the answer to short q is x y z"),
             (9, "no benchmark material anywhere in here")],
            "doc_id long, text string",
        )
        got = {r["doc_id"]: r for r in contamination(t, evaldf, n=N).collect()}
        assert 8 in got and 9 not in got
        assert got[8]["hit_ngrams"] == 1  # the contained 'short q' 2-gram
        # and the strict filter drops it
        kept = {r["doc_id"] for r in decontaminate(t, evaldf, n=N).collect()}
        assert kept == {9}

    def test_hash_grams_report_identical(self, train, evaldf):
        # the production wire format (grams as xxhash64 longs) must
        # produce the identical report — hash equality is implied by
        # string equality, and this corpus has no 64-bit collisions
        want = sorted(
            contamination(train, evaldf, n=N).collect(),
            key=lambda r: r["doc_id"],
        )
        got = sorted(
            contamination(train, evaldf, n=N, hash_grams=True).collect(),
            key=lambda r: r["doc_id"],
        )
        assert [tuple(r) for r in got] == [tuple(r) for r in want]

    def test_hash_grams_join_key_is_long(self, train, evaldf):
        # the point of hash_grams: the broadcast and the probe carry
        # 8-byte longs, not gram strings
        ev = eval_ngram_set(evaldf, N).select(
            F.xxhash64("g").alias("g")
        )
        assert dict(ev.dtypes)["g"] == "bigint"
        plan = contamination(
            train, evaldf, n=N, hash_grams=True
        )._jdf.queryExecution().executedPlan().toString()
        assert "xxhash64" in plan, plan

    def test_hash_grams_decontaminate_same_survivors(self, train, evaldf):
        kept = {
            r["doc_id"]
            for r in decontaminate(train, evaldf, n=N, hash_grams=True).collect()
        }
        assert kept == {1, 3}


def py_chunks(text: str, width: int) -> list[str]:
    toks = text.strip().lower().split()
    n_full = len(toks) // width
    return [
        hashlib.md5(" ".join(toks[i * width : (i + 1) * width]).encode()).hexdigest()
        for i in range(n_full)
    ]


BOILER = " ".join(f"w{i}" for i in range(CHUNK_WIDTH))  # one aligned chunk
UNIQ = lambda tag: " ".join(f"{tag}{i}" for i in range(CHUNK_WIDTH))  # noqa: E731

CHUNK_DOCS = [
    (0, BOILER + " " + UNIQ("a")),        # boiler + unique → fraction 0.5
    (1, BOILER + " " + UNIQ("b")),        # shares the boiler chunk
    (2, UNIQ("c") + " " + UNIQ("d")),     # all unique → absent
    (3, "short"),                          # < width tokens → no chunks
    (4, UNIQ("e") + " tail words"),       # tail dropped → 1 chunk, unique
]


@pytest.fixture(scope="module")
def chunk_docs(spark):
    return spark.createDataFrame(CHUNK_DOCS, "doc_id long, text string").cache()


class TestChunkDedup:
    def test_chunk_hash_col_matches_python(self, chunk_docs):
        rows = chunk_docs.select(
            "doc_id", chunk_hash_col(F.col("text")).alias("chs")
        ).collect()
        got = {r["doc_id"]: list(r["chs"]) for r in rows}
        for i, t in CHUNK_DOCS:
            assert got[i] == py_chunks(t, CHUNK_WIDTH), i

    def test_short_doc_has_no_chunks(self, chunk_docs):
        [r] = (
            chunk_docs.filter("doc_id = 3")
            .select(chunk_hash_col(F.col("text")).alias("chs"))
            .collect()
        )
        assert list(r["chs"]) == []

    def test_stats_flag_shared_chunk_only(self, chunk_docs):
        rows = chunk_dedup_stats(chunk_docs).collect()
        got = {r["doc_id"]: r for r in rows}
        assert set(got) == {0, 1}
        for i in (0, 1):
            assert got[i]["n_chunks"] == 2
            assert got[i]["dup_chunks"] == 1
            assert got[i]["dup_fraction"] == 0.5

    def test_within_doc_repeat_needs_second_doc(self, spark):
        # a chunk repeated twice INSIDE one doc is not boilerplate
        # (min_docs counts distinct docs) ...
        solo = spark.createDataFrame(
            [(0, BOILER + " " + BOILER)], "doc_id long, text string"
        )
        assert chunk_dedup_stats(solo).count() == 0
        # ... but once a second doc shares it, BOTH occurrences count
        both = spark.createDataFrame(
            [(0, BOILER + " " + BOILER), (1, BOILER + " " + UNIQ("z"))],
            "doc_id long, text string",
        )
        got = {r["doc_id"]: r for r in chunk_dedup_stats(both).collect()}
        assert got[0]["dup_chunks"] == 2 and got[0]["dup_fraction"] == 1.0
        assert got[1]["dup_chunks"] == 1

    # slow lane: random-corpora parity; td_chunk_dedup driver row re-verifies
    @pytest.mark.slow
    def test_property_parity_random_corpora(self, spark):
        """Hypothesis parity: contamination (auto short widths) and
        chunk_dedup_stats vs the pure-Python models on random
        small-vocab corpora. Examples are token-namespaced per case so
        ONE DataFrame / one Spark job covers all of them (grams can
        never collide across cases)."""
        from hypothesis import given, settings, strategies as st

        vocab = ["alpha", "beta", "gamma", "delta", "eps"]
        # min_size=1: the empty string tokenizes differently across
        # engines (Spark split gives [''], Python split gives []) and
        # is not a meaningful document
        text_st = st.lists(
            st.sampled_from(vocab), min_size=1, max_size=2 * CHUNK_WIDTH + 3
        ).map(" ".join)
        corpus_st = st.lists(text_st, min_size=1, max_size=5)
        n = 3

        def py_decontam_model(train, evals, widths):
            # widths come from the WHOLE batched eval frame (the Spark
            # call is one corpus), not per-case
            ev = set()
            for t in evals:
                ev |= py_ngrams(t, n)
            out = {}
            for i, t in train:
                ngs = py_ngrams(t, n)
                for w in widths:
                    ngs |= py_ngrams(t, w)
                hits = len(ngs & ev)
                if hits:
                    out[i] = (len(ngs), hits)
            return out

        def py_chunk_model(train):
            from collections import Counter

            owners = {}
            for i, t in train:
                for h in set(py_chunks(t, CHUNK_WIDTH)):
                    owners.setdefault(h, set()).add(i)
            boiler = {h for h, s in owners.items() if len(s) >= 2}
            out = {}
            for i, t in train:
                chs = py_chunks(t, CHUNK_WIDTH)
                dup = sum(1 for h in chs if h in boiler)
                if dup:
                    out[i] = (len(chs), dup)
            return out

        @settings(max_examples=5, deadline=None)
        @given(st.lists(st.tuples(corpus_st, corpus_st), min_size=1, max_size=6))
        def run(cases):
            def ns(case_idx, text):
                return " ".join(f"c{case_idx}_{t}" for t in text.split())

            global_widths = {
                w
                for _, evals in cases
                for w in (len(t.split()) for t in evals)
                if 0 < w < n
            }
            train_rows, eval_rows, models = [], [], {}
            for ci, (train, evals) in enumerate(cases):
                train = [(ci * 100 + j, ns(ci, t)) for j, t in enumerate(train)]
                evals_ns = [ns(ci, t) for t in evals]
                eval_rows += [(ci * 100 + 50 + j, e) for j, e in enumerate(evals_ns)]
                train_rows += train
                models[ci] = (
                    py_decontam_model(train, evals_ns, global_widths),
                    py_chunk_model(train),
                )
            tr = spark.createDataFrame(train_rows, "doc_id long, text string")
            # fallback eval row uses un-namespaced sentinel tokens that
            # can never collide with any case's grams
            ev = spark.createDataFrame(
                eval_rows or [(0, "sentinel0 sentinel1 sentinel2")],
                "doc_id long, text string",
            )
            got_c = {
                r["doc_id"]: (r["total_ngrams"], r["hit_ngrams"])
                for r in contamination(tr, ev, n=n).collect()
            }
            got_k = {
                r["doc_id"]: (r["n_chunks"], r["dup_chunks"])
                for r in chunk_dedup_stats(tr).collect()
            }
            want_c, want_k = {}, {}
            for ci, (mc, mk) in models.items():
                want_c.update(mc)
                want_k.update(mk)
            assert got_c == want_c
            assert got_k == want_k

        run()

    def test_unaligned_shared_text_is_documented_miss(self, spark):
        # positional chunking only catches boundary-aligned repeats —
        # the documented trade-off vs suffix arrays (shift by one token
        # → different chunks). MinHash/Jaccard cover the unaligned case.
        shifted = spark.createDataFrame(
            [(0, BOILER + " " + UNIQ("a")), (1, "shift " + BOILER)],
            "doc_id long, text string",
        )
        assert chunk_dedup_stats(shifted).count() == 0
