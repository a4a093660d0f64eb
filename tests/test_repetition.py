"""Gopher-style intra-document repetition metrics: pure-Python
reference, Spark pandas-UDF parity, DuckDB-expressibility of every
definition, and the keep-filter semantics."""

from __future__ import annotations

import duckdb
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

from opentelemetry_collector_spark.trainingdata import (
    GOPHER_THRESHOLDS,
    gopher_repetition_filter,
    repetition_metrics,
    repetition_metrics_py,
)
from opentelemetry_collector_spark.trainingdata.repetition import (
    DUP_NGRAM_NS,
    METRIC_FIELDS,
    TOP_NGRAM_NS,
)


class TestPyReference:
    def test_empty_and_none(self):
        for t in (None, "", "   \n  \n"):
            m = repetition_metrics_py(t)
            assert m["n_lines"] == 0
            assert all(m[f] == 0.0 for f in METRIC_FIELDS if f != "n_lines")

    def test_no_repetition(self):
        m = repetition_metrics_py("alpha beta\ngamma delta epsilon")
        assert m["n_lines"] == 2
        assert m["dup_line_frac"] == 0.0
        assert m["dup_line_char_frac"] == 0.0
        assert m["top_2gram_char_frac"] > 0  # a top bigram always exists
        assert m["dup_5gram_char_frac"] == 0.0

    def test_duplicate_lines_counted_beyond_first(self):
        # "ab" x3 + "cdef" x1: 2 of 4 lines are repeats; repeat chars
        # = (3-1)*2 = 4 of total 3*2+4 = 10
        m = repetition_metrics_py("ab\nab\nab\ncdef")
        assert m["n_lines"] == 4
        assert m["dup_line_frac"] == pytest.approx(2 / 4)
        assert m["dup_line_char_frac"] == pytest.approx(4 / 10)

    def test_line_strip_does_not_merge_distinct(self):
        m = repetition_metrics_py("  ab \t\nab\r\nxy")
        assert m["n_lines"] == 3
        assert m["dup_line_frac"] == pytest.approx(1 / 3)

    def test_paragraphs_split_on_blank_line(self):
        text = "para one\nsecond line\n\npara one\nsecond line\n\ntail"
        m = repetition_metrics_py(text)
        # 3 paragraphs, first two identical (incl. inner newline)
        assert m["dup_para_frac"] == pytest.approx(1 / 3)
        p = "para one\nsecond line"
        assert m["dup_para_char_frac"] == pytest.approx(
            len(p) / (2 * len(p) + len("tail"))
        )
        # line-level view sees the same repetition: 5 non-empty lines,
        # 3 distinct
        assert m["dup_line_frac"] == pytest.approx(2 / 5)

    def test_top_ngram_counts_all_occurrences(self):
        # "x y" appears 3x (len 3); total chars = len(joined)
        text = "x y a x y b x y"
        m = repetition_metrics_py(text)
        assert m["top_2gram_char_frac"] == pytest.approx(3 * 3 / len(text))

    def test_top_ngram_is_most_frequent_not_max_coverage(self):
        # the most repeated bigram is 'a a' (count 3); the count-2
        # long bigram must NOT win on raw coverage product
        text = "a a a a longtokenone longtokentwo longtokenone longtokentwo"
        m = repetition_metrics_py(text)
        assert m["top_2gram_char_frac"] == pytest.approx(3 * 3 / len(text))

    def test_top_ngram_count_tie_breaks_to_longest(self):
        # 'bb bb' and 'a a' both occur twice; the longer gram decides
        text = "a a x a a y bb bb z bb bb"
        m = repetition_metrics_py(text)
        assert m["top_2gram_char_frac"] == pytest.approx(2 * 5 / len(text))

    def test_dup_ngram_counts_all_occurrences(self):
        # the 5-gram "a b c d e" occurs twice (disjoint), each len 9;
        # dup metric counts BOTH occurrences (Gopher), total len(text)
        text = "a b c d e z a b c d e"
        m = repetition_metrics_py(text)
        assert m["dup_5gram_char_frac"] == pytest.approx(2 * 9 / len(text))
        # no 6-gram repeats ("...e z a..." windows are all distinct)
        assert m["dup_6gram_char_frac"] == 0.0

    def test_fewer_tokens_than_n_is_zero(self):
        m = repetition_metrics_py("only four tokens here")
        for n in DUP_NGRAM_NS:
            assert m[f"dup_{n}gram_char_frac"] == 0.0
        assert m["top_4gram_char_frac"] > 0.0

    def test_overlap_can_exceed_one_documented(self):
        # overlapping occurrences each count — the documented >1 case
        m = repetition_metrics_py("a a a a")
        assert m["top_2gram_char_frac"] == pytest.approx(3 * 3 / 7)
        assert m["top_2gram_char_frac"] > 1.0

    @given(
        st.lists(
            st.text(alphabet="ab \n", min_size=0, max_size=12),
            min_size=0,
            max_size=8,
        )
    )
    @settings(max_examples=60, deadline=None)
    def test_invariants_on_random_text(self, parts):
        text = "\n".join(parts)
        m = repetition_metrics_py(text)
        assert 0 <= m["dup_line_frac"] <= 1
        assert 0 <= m["dup_line_char_frac"] <= 1
        assert 0 <= m["dup_para_frac"] <= 1
        assert 0 <= m["dup_para_char_frac"] <= 1
        for n in DUP_NGRAM_NS + TOP_NGRAM_NS:
            key = (
                f"top_{n}gram_char_frac"
                if n in TOP_NGRAM_NS
                else f"dup_{n}gram_char_frac"
            )
            assert m[key] >= 0
        # duplicating the whole doc drives line-dup to >= 1/2
        m2 = repetition_metrics_py(text + "\n" + text)
        if m["n_lines"]:
            assert m2["dup_line_frac"] >= 0.5 - 1e-9


class TestSparkParity:
    @pytest.fixture(scope="class")
    def docs(self, spark):
        rows = [
            (0, "ab\nab\nab\ncdef"),
            (1, "para\n\npara\n\nx y a x y b x y"),
            (2, ""),
            (3, None),
            (4, "a b c d e z a b c d e"),
            (5, "  ab \t\nab\r\nxy"),
            (6, "one two three four five six seven " * 4),
        ]
        return spark.createDataFrame(rows, "doc_id long, text string")

    def test_udf_matches_python(self, docs):
        got = {
            r["doc_id"]: r["m"].asDict()
            for r in docs.select(
                "doc_id", repetition_metrics(F.col("text")).alias("m")
            ).collect()
        }
        for row in docs.collect():
            want = repetition_metrics_py(row["text"])
            for f in METRIC_FIELDS:
                assert got[row["doc_id"]][f] == pytest.approx(want[f]), (
                    row["doc_id"],
                    f,
                )

    def test_filter_keeps_clean_drops_repetitive(self, docs):
        kept = {
            r["doc_id"]
            for r in docs.filter(
                gopher_repetition_filter(repetition_metrics(F.col("text")))
            ).collect()
        }
        # doc 0: 50% duplicate lines -> dropped; doc 6: the same
        # 7-gram 4x -> dropped; empty/None/clean docs kept
        assert 0 not in kept
        assert 6 not in kept
        assert {2, 3} <= kept

    def test_filter_rejects_unknown_and_empty_thresholds(self, docs):
        m = repetition_metrics(F.col("text"))
        with pytest.raises(ValueError):
            gopher_repetition_filter(m, {"nope": 0.5})
        with pytest.raises(ValueError):
            gopher_repetition_filter(m, {})

    def test_plan_is_single_arrow_eval_no_shuffle(self, docs):
        df = docs.select(repetition_metrics(F.col("text")).alias("m"))
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        assert plan.count("ArrowEvalPython") == 1, plan


class TestDuckDBParity:
    """The DuckDB rendition used by the td_repetition oracle must
    reproduce the Python/Spark numbers exactly (exact-int numerators,
    one final division)."""

    def test_line_and_ngram_metrics_match(self):
        texts = [
            "ab\nab\nab\ncdef",
            "x y a x y b x y",
            "a b c d e z a b c d e",
            "one two three four five six seven " * 4,
            "single",
        ]
        con = duckdb.connect()
        con.execute(
            "CREATE TABLE d AS SELECT * FROM (VALUES "
            + ", ".join(f"({i}, ?)" for i in range(len(texts)))
            + ") t(doc_id, text)",
            texts,
        )
        rows = con.execute(
            """
WITH lin AS (
  SELECT doc_id, l, count(*) AS c
  FROM d, UNNEST(list_filter(list_transform(
        string_split(text, chr(10)),
        x -> trim(x, ' ' || chr(9) || chr(13))), x -> x <> '')) AS u(l)
  GROUP BY 1, 2
), lstat AS (
  SELECT doc_id,
         CAST(sum(c) - count(*) AS DOUBLE) / sum(c) AS dup_line_frac,
         CASE WHEN sum(c * length(l)) > 0
              THEN CAST(sum(CASE WHEN c > 1 THEN (c - 1) * length(l) ELSE 0 END) AS DOUBLE)
                   / sum(c * length(l)) ELSE 0.0 END AS dup_line_char_frac
  FROM lin GROUP BY 1
), tok AS (
  SELECT doc_id,
         list_filter(string_split_regex(text, '\\s+'), x -> x <> '') AS tk
  FROM d
), tks AS (
  SELECT doc_id, tk, length(array_to_string(tk, ' ')) AS total FROM tok
), ng AS (
  SELECT doc_id, total,
         array_to_string(list_slice(tk, i.i, i.i + 1), ' ') AS g
  FROM tks, UNNEST(generate_series(1, greatest(len(tk) - 1, 0))) AS i(i)
), cnt AS (
  SELECT doc_id, any_value(total) AS total, g, count(*) AS c
  FROM ng GROUP BY doc_id, g
), top2 AS (
  SELECT doc_id,
         CAST(max(c * length(g)) AS DOUBLE) / any_value(total) AS top_2gram_char_frac
  FROM cnt WHERE total > 0 GROUP BY 1
)
SELECT d.doc_id, coalesce(lstat.dup_line_frac, 0.0) AS dlf,
       coalesce(lstat.dup_line_char_frac, 0.0) AS dlcf,
       coalesce(top2.top_2gram_char_frac, 0.0) AS t2
FROM d LEFT JOIN lstat USING (doc_id) LEFT JOIN top2 USING (doc_id)
ORDER BY doc_id
"""
        ).fetchall()
        for doc_id, dlf, dlcf, t2 in rows:
            want = repetition_metrics_py(texts[doc_id])
            assert dlf == pytest.approx(want["dup_line_frac"]), doc_id
            assert dlcf == pytest.approx(want["dup_line_char_frac"]), doc_id
            assert t2 == pytest.approx(want["top_2gram_char_frac"]), doc_id


class TestNumpyFastPath:
    """repetition_metrics_np is an EXACT reimplementation (integer
    gram codes via chained np.unique — no hashing), used by the UDF
    above _NP_MIN_TOKENS. Profile record (round 5, sf0.1 documents):
    the Counter n-gram loop is 97% of the operator's Python CPU
    (line/para stats 3%); the numpy path measured ~3x faster at 512
    tokens and ~3.5x at 20k tokens, crossover ~100-500 tokens —
    hence the 512-token dispatch."""

    @given(
        st.lists(
            st.text(alphabet="ab \n", min_size=0, max_size=12),
            min_size=0,
            max_size=10,
        )
    )
    @settings(max_examples=80, deadline=None)
    def test_np_equals_py_exactly(self, parts):
        from opentelemetry_collector_spark.trainingdata.repetition import (
            repetition_metrics_np,
        )

        text = "\n".join(parts)
        assert repetition_metrics_np(text) == repetition_metrics_py(text)
        assert repetition_metrics_np(text + "\n\n" + text) == (
            repetition_metrics_py(text + "\n\n" + text)
        )

    def test_np_equals_py_on_structured_cases(self):
        import random

        from opentelemetry_collector_spark.trainingdata.repetition import (
            repetition_metrics_np,
        )

        rng = random.Random(321)
        vocab = ["tok%d" % i for i in range(30)] + ["a", "xx", "<>", "日本"]
        cases = [None, "", "a", "a a a a a a a a", "x " * 2000]
        for _ in range(60):
            m = rng.choice([1, 2, 4, 9, 10, 11, 64, 600, 1500])
            cases.append(" ".join(rng.choice(vocab) for _ in range(m)))
        # long doc: exercises the dispatch threshold inside the UDF path
        cases.append(" ".join("w%d" % (i % 3) for i in range(5000)))
        for t in cases:
            assert repetition_metrics_np(t) == repetition_metrics_py(t), (
                t[:50] if t else t
            )
