"""Deterministic synthetic transcript tables (FIXTURES.md §1-2).

Input shape per BASELINE.json input_hint:
    conv_id:string, turn_idx:int32, role:string, text:string,
    tool:string, ts:timestamp

Properties exercised (mirroring the reference's test-data generators,
cf. internal/testdata/log.go:31-304):
  * skewed conversation sizes — a few conversations ~100x the median
    turn count, so salting/AQE-skew paths have real work;
  * text embeds a grok-able structure "[<level>] <component>: ...
    duration=<n>ms" with ~5% of rows NOT matching (EXTRACT must no-op,
    cf. processor/processorhelper/attraction.go:273-276);
  * ts monotone non-decreasing within a conversation, spread over
    hours, with duplicate timestamps inside a conversation so that
    turn_idx is the load-bearing tiebreak;
  * tool set only when role='tool'.

Everything is a pure function of (seed, n_convs) — no wall clock, no
external data.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

ROLES = np.array(["user", "assistant", "system", "tool"])
# role → (role_class, severity_number); severity values mirror the
# reference's severity enum spirit (consumer/pdata/log.go:116-142).
ROLE_LOOKUP = [
    ("user", "human", 9),
    ("assistant", "model", 10),
    ("system", "control", 13),
    ("tool", "machine", 5),
    # extra dim row with no fact rows — pins unmatched-dim semantics
    ("moderator", "control", 17),
]
TOOLS = np.array(["search", "python", "browser", "calculator", "shell"])
TOOL_LOOKUP = [
    ("search", "retrieval", False),
    ("python", "code", True),
    ("browser", "retrieval", False),
    ("calculator", "code", False),
    # 'shell' intentionally ABSENT from the lookup: pins left-join /
    # missing-key semantics (from_attribute missing ⇒ no action,
    # attraction.go:248-255).
]
LEVELS = np.array(["debug", "info", "warn", "error"])
COMPONENTS = np.array(["planner", "retriever", "executor", "critic", "router"])
WORDS = np.array(
    "the quick brown fox jumps over lazy dog while agent runs tool call "
    "plan step answer query result token stream batch merge sort".split()
)

BASE_TS = np.datetime64("2025-01-01T00:00:00", "us")


def conv_sizes(rng: np.random.Generator, n_convs: int) -> np.ndarray:
    """Skewed turn counts: median ~8, with ~1% of convs at ~100x."""
    sizes = rng.geometric(1 / 8.0, size=n_convs).astype(np.int64) + 1
    n_hot = max(1, n_convs // 100)
    hot = rng.choice(n_convs, size=n_hot, replace=False)
    sizes[hot] = sizes[hot] * 100 + rng.integers(0, 200, size=n_hot)
    return sizes


def make_transcripts_pdf(n_convs: int = 100, seed: int = 42) -> pd.DataFrame:
    rng = np.random.default_rng(seed)
    sizes = conv_sizes(rng, n_convs)
    n = int(sizes.sum())

    conv_ord = np.repeat(np.arange(n_convs), sizes)
    conv_id = np.char.add("conv-", conv_ord.astype("U10"))
    # dense 0-based turn_idx within each conversation
    starts = np.concatenate(([0], np.cumsum(sizes)[:-1]))
    turn_idx = (np.arange(n) - np.repeat(starts, sizes)).astype(np.int32)

    role = ROLES[rng.integers(0, len(ROLES), size=n)]
    turn_idx0 = turn_idx == 0
    role[turn_idx0] = "user"  # conversations open with a user turn

    tool = np.where(role == "tool", TOOLS[rng.integers(0, len(TOOLS), size=n)], None)

    level = LEVELS[rng.integers(0, len(LEVELS), size=n)]
    component = COMPONENTS[rng.integers(0, len(COMPONENTS), size=n)]
    duration = rng.integers(1, 5000, size=n)
    freetext = np.char.add(
        np.char.add(WORDS[rng.integers(0, len(WORDS), size=n)], " "),
        WORDS[rng.integers(0, len(WORDS), size=n)],
    )
    text = np.array(
        [
            f"[{lv}] {cp}: {ft} duration={du}ms"
            for lv, cp, ft, du in zip(level, component, freetext, duration)
        ],
        dtype=object,
    )
    # ~5% of rows carry unstructured text (EXTRACT no-op path)
    unmatched = rng.random(n) < 0.05
    text[unmatched] = np.char.add("plain freeform note ", freetext[unmatched])

    # ts: per-conversation start offset + non-negative gaps; ~10% of
    # gaps are zero → duplicate timestamps within a conversation.
    conv_start = rng.integers(0, 3600 * 24, size=n_convs) * 1_000_000
    gaps = rng.integers(0, 120, size=n) * 1_000_000
    gaps[rng.random(n) < 0.10] = 0
    gaps[turn_idx0] = 0
    within = np.concatenate([np.cumsum(gaps[s : s + c]) for s, c in zip(starts, sizes)])
    ts = BASE_TS + (np.repeat(conv_start, sizes) + within).astype("timedelta64[us]")

    return pd.DataFrame(
        {
            "conv_id": conv_id,
            "turn_idx": turn_idx,
            "role": role,
            "text": text.astype(str),
            "tool": tool,
            "ts": ts,
        }
    )


def role_lookup_pdf() -> pd.DataFrame:
    return pd.DataFrame(ROLE_LOOKUP, columns=["role", "role_class", "severity_number"])


def tool_lookup_pdf() -> pd.DataFrame:
    return pd.DataFrame(TOOL_LOOKUP, columns=["tool", "tool_category", "is_sensitive"])


TRANSCRIPT_DDL = (
    "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp"
)


def make_transcripts_df(spark, n_convs: int = 100, seed: int = 42):
    return spark.createDataFrame(make_transcripts_pdf(n_convs, seed), schema=TRANSCRIPT_DDL)


def role_lookup_df(spark):
    return spark.createDataFrame(
        role_lookup_pdf(), schema="role string, role_class string, severity_number int"
    )


def tool_lookup_df(spark):
    return spark.createDataFrame(
        tool_lookup_pdf(), schema="tool string, tool_category string, is_sensitive boolean"
    )
