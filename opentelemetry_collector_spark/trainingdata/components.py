"""Connected components over near-duplicate pair graphs.

Near-dup PAIRS are not yet a dedup decision: collisions are transitive
(A~B and B~C must collapse into ONE cluster so exactly one survivor is
kept), and at 10^9+ documents the textbook driver-side union-find is
impossible — the edge list never fits one machine. This implements the
alternating large-star / small-star algorithm (Kiveris et al.,
"Connected Components in MapReduce and Beyond", ACM SoCC 2014) as pure
DataFrame ops: each iteration is a groupBy + join that shuffles only
(long, long) node pairs, and the edge set converges to a star forest
rooted at each component's minimum id in O(log^2 n) iterations — 2-5
in practice on dedup graphs, whose components are small and dense.

Reference parity note: the reference collector has no graph operator
(its dedup story ends at batching, processor/batch); this module is
part of the training-data extension family (SURVEY.md north-star
table), same contract as trainingdata/dedup.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["connected_components", "near_dup_survivors"]


def _canonical(edges: DataFrame) -> DataFrame:
    """Undirected edge set as distinct (u, v) with u > v, self-loops
    dropped — the shape small-star expects and the cheapest distinct
    representation (one row per undirected edge)."""
    return (
        edges.select(
            F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
        )
        .filter(F.col("u") != F.col("v"))
        .dropDuplicates(["u", "v"])
    )


def _large_star(edges: DataFrame) -> DataFrame:
    """large-star: every node u connects each STRICTLY LARGER neighbor
    to the minimum of its neighborhood (including u itself). Shrinks
    tall chains toward local minima without ever increasing the edge
    count beyond 2x (Kiveris et al., Lemma 1)."""
    adj = edges.union(
        edges.select(F.col("v").alias("u"), F.col("u").alias("v"))
    )
    mins = (
        adj.groupBy("u")
        .agg(F.min("v").alias("mn"))
        .select("u", F.least("mn", "u").alias("m"))
    )
    return (
        adj.join(mins, "u")
        .filter(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .filter(F.col("u") != F.col("v"))
        .dropDuplicates(["u", "v"])
    )


def _small_star(edges: DataFrame) -> DataFrame:
    """small-star: every node u re-attaches its smaller-or-equal
    neighbors (and itself) to the minimum among them — after a
    large-star pass this flattens local trees into stars."""
    orient = _canonical(edges)
    mins = orient.groupBy("u").agg(F.min("v").alias("m"))
    attach_lo = orient.join(mins, "u").select(
        F.col("v").alias("u"), F.col("m").alias("v")
    )
    attach_self = mins.select("u", F.col("m").alias("v"))
    return (
        attach_lo.union(attach_self)
        .filter(F.col("u") != F.col("v"))
        .dropDuplicates(["u", "v"])
    )


def _fingerprint(edges: DataFrame) -> tuple[int, int]:
    """(edge count, order-independent content hash) — one small agg
    job per iteration, used as the fixpoint check. xxhash64 is reduced
    mod 2^31 before summing so the ANSI-mode long sum cannot overflow
    below ~4 * 10^12 edges."""
    row = edges.agg(
        F.count(F.lit(1)).alias("n"),
        F.coalesce(
            F.sum(F.pmod(F.xxhash64("u", "v"), F.lit(2**31))), F.lit(0)
        ).alias("h"),
    ).first()
    return int(row["n"]), int(row["h"])


def connected_components(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 25,
) -> DataFrame:
    """(node, component) for every node in ``pairs``, where component
    is the MINIMUM node id of its connected component — the canonical
    deterministic cluster label (stable across runs, engines and row
    orders, so downstream survivor selection is reproducible).

    Each alternating round is two groupBy/join stages over (long,
    long) rows only. Every round's edge frame is eagerly
    ``localCheckpoint``-ed: iterative self-joins otherwise compound
    the LOGICAL plan (each round embeds two copies of the previous
    round's tree), and Catalyst re-analysis goes super-linear after a
    handful of rounds even when the data itself is persisted —
    checkpointing truncates the lineage so round N plans over a
    materialized scan, the same reason GraphFrames checkpoints its
    iterations. Superseded checkpoint RDDs are reclaimed by Spark's
    ContextCleaner once the driver drops the reference; at most the
    last two edge generations are reachable here. The fixpoint test
    costs one tiny agg job per round — a star forest is a fixpoint of
    both stars, and Kiveris et al. prove convergence in O(log^2 n)
    rounds.

    Non-numeric node ids (string doc ids, uuids) are supported via a
    surrogate-id mapping: distinct raw ids get a session-local long id
    (checkpointed so the assignment is frozen for the run), the star
    algorithm runs on longs, and components are relabelled afterwards
    as ``min(raw id)`` per component — so the public contract
    (component = minimum node id, in the id's own ordering) holds for
    strings exactly as for longs, and a silent ``cast('long')`` NULL
    can never drop edges.
    """
    from pyspark.sql import types as T

    a_type = pairs.schema[id_a].dataType
    b_type = pairs.schema[id_b].dataType
    integral = (T.ByteType, T.ShortType, T.IntegerType, T.LongType)
    if isinstance(a_type, integral) and isinstance(b_type, integral):
        edges = _canonical(
            pairs.select(F.col(id_a).cast("long").alias("u"),
                         F.col(id_b).cast("long").alias("v"))
        )
        return _star_forest(edges, max_iter)

    # surrogate mapping for non-integral ids; monotonically_increasing_id
    # is only stable within one materialization, so the mapping MUST be
    # checkpointed before reuse across the two edge-side joins
    raw_a = pairs.select(F.col(id_a).cast("string").alias("raw"))
    raw_b = pairs.select(F.col(id_b).cast("string").alias("raw"))
    mapping = (
        raw_a.union(raw_b)
        .dropDuplicates(["raw"])
        .withColumn("nid", F.monotonically_increasing_id())
        .localCheckpoint(eager=True)
    )
    edges = _canonical(
        pairs.select(F.col(id_a).cast("string").alias("ra"),
                     F.col(id_b).cast("string").alias("rb"))
        .join(mapping.select(F.col("raw").alias("ra"), F.col("nid").alias("u")), "ra")
        .join(mapping.select(F.col("raw").alias("rb"), F.col("nid").alias("v")), "rb")
        .select("u", "v")
    )
    comps = _star_forest(edges, max_iter)
    labelled = comps.join(
        mapping.select(F.col("nid").alias("node"), F.col("raw").alias("node_raw")),
        "node",
    )
    comp_min = labelled.groupBy("component").agg(
        F.min("node_raw").alias("component_raw")
    )
    return labelled.join(comp_min, "component").select(
        F.col("node_raw").alias("node"),
        F.col("component_raw").alias("component"),
    )


def _star_forest(edges: DataFrame, max_iter: int) -> DataFrame:
    """Run the alternating rounds on canonical (long u, long v) edges
    and read the final star forest as (node, component=min-id)."""
    edges = edges.localCheckpoint(eager=True)
    fp = _fingerprint(edges)
    if fp[0] == 0:
        return edges.select(
            F.col("u").alias("node"), F.col("v").alias("component")
        )
    for _ in range(max_iter):
        edges = _small_star(_large_star(edges)).localCheckpoint(eager=True)
        nfp = _fingerprint(edges)
        if nfp == fp:
            break
        fp = nfp
    else:
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds"
        )
    # the fixpoint is a star forest: one (child, root) edge per
    # non-root node; roots get their own self-labelled row
    assign = edges.select(F.col("u").alias("node"), F.col("v").alias("component"))
    roots = (
        edges.select(F.col("v").alias("node"))
        .dropDuplicates(["node"])
        .select("node", F.col("node").alias("component"))
    )
    return assign.union(roots)


def near_dup_survivors(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    id_a: str = "id_a",
    id_b: str = "id_b",
) -> DataFrame:
    """The deduplicated corpus: every row of ``df`` except non-minimum
    members of a near-dup component. One call from candidate pairs to
    the kept corpus — the composition a curation pipeline actually
    runs (minhash_lsh_pairs → connected_components → survivors).

    Scale shape: the dropped-id set is one long column (non-root star
    nodes), LEFT ANTI joined against the corpus — Spark broadcasts it
    when small (the common case: duplicates are a fraction of the
    corpus) and AQE handles the shuffle when it is not. The survivor
    per component is the MINIMUM id — deterministic across runs and
    engines, so incremental re-dedup keeps the same representatives.
    """
    comps = connected_components(pairs, id_a=id_a, id_b=id_b)
    dropped = comps.filter(F.col("node") != F.col("component")).select(
        F.col("node").alias(id_col)
    )
    return df.join(dropped, id_col, "left_anti")
