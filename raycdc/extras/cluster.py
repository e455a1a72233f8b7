"""Connected components over near-duplicate pair streams, plus
cluster-canonical survivor selection.

The dedup family (``exact_jaccard_pairs`` / ``minhash_near_dup`` /
``simhash_near_dup`` / ``embedding_near_dup``) emits PAIRS; a curation
pipeline needs CLUSTERS: every document labeled with its duplicate
group's representative so exactly one member survives. Reference
analog: the UID-remap table maps every observed UID to one canonical
replacement id (``DeidentificationController.java:102-117``); here the
canonical id is the component minimum.

Algorithm: distributed hash-to-min label propagation::

    L0(v)     = min(v, min direct neighbor)
    L_{t+1}(v) = min(L_t(v), min over neighbors w of L_t(w))

which converges to the component minimum in O(diameter) rounds.
Near-dup components are short chains in practice (a handful of hops);
corpora with adversarially long chains should switch to
large-star/small-star (Kiveris et al., *Connected Components in
MapReduce and Beyond*, SoCC'14) — the same join/groupby building
blocks, O(log n) rounds.

Scale shape, per round: ONE bounded-bucket :func:`raycdc.ops.hash_join`
of the (static) symmetric edge list against the label table, plus ONE
combiner groupby-min (:func:`raycdc.ops.partial_groupby_agg`). The
label table is materialized each round — it is O(nodes that appear in
a pair), tiny next to the corpus, and materializing keeps the lazy
plan depth constant across rounds. The corpus itself is never touched.

Convergence detection never ships label rows to the driver: each round
computes an order-independent u64 signature of the label table (sum of
``splitmix64(h(node) ^ h(label))`` mod 2^61-1, block-partial then a
scalar ``Dataset.sum``). Labels only ever decrease, so an unchanged
signature is a fixed point (false-equal probability ~2^-61 per round).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data


_SIG_MOD = (1 << 61) - 1  # Mersenne prime: residues sum associatively


def _sym_edges(pairs: ray.data.Dataset, id_a: str, id_b: str) -> ray.data.Dataset:
    """(id_a, id_b) pairs → symmetric (node, nbr) edge list."""

    def sym(t: pa.Table) -> pa.Table:
        a = t.column(id_a).combine_chunks()
        b = t.column(id_b).combine_chunks()
        return pa.table({
            "node": pa.chunked_array([a, b]).combine_chunks(),
            "nbr": pa.chunked_array([b, a]).combine_chunks(),
        })

    return pairs.map_batches(sym, batch_format="pyarrow")


def _label_signature(labels: ray.data.Dataset) -> int:
    """Order-independent content signature of a (node, cluster) table."""
    from raycdc.util import splitmix64, str_hash_u64

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"sig": pa.array([0], pa.int64())})
        h = splitmix64(
            str_hash_u64(t.column("node").cast(pa.string()))
            ^ str_hash_u64(t.column("cluster").cast(pa.string()), seed=1)
        )
        s = int((h % np.uint64(_SIG_MOD)).sum() % _SIG_MOD)
        return pa.table({"sig": pa.array([s], pa.int64())})

    total = labels.map_batches(partial, batch_format="pyarrow").sum("sig")
    return int((total or 0) % _SIG_MOD)


def connected_components(
    pairs: ray.data.Dataset,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_rounds: int = 32,
    num_buckets: int = 64,
) -> ray.data.Dataset:
    """Label every node that appears in ``pairs`` with the minimum id of
    its connected component. Returns a Dataset ``(node, cluster)`` with
    one row per distinct node.

    ``max_rounds`` bounds propagation (= the max component diameter the
    call can resolve); hitting it raises so a silently-unconverged
    labeling can never be consumed as exact."""
    from raycdc.ops import hash_join, partial_groupby_agg

    edges = _sym_edges(pairs, id_a, id_b)

    def self_min(t: pa.Table) -> pa.Table:
        c = pc.min_element_wise(t.column("node"), t.column("cluster"))
        return pa.table({"node": t.column("node"), "cluster": c})

    labels = partial_groupby_agg(
        edges, "node", {"cluster": ("nbr", "min")}, batch_size=65536
    ).map_batches(self_min, batch_format="pyarrow").materialize()
    if labels.count() == 0:
        # typed empty result (an empty materialized Dataset has no schema
        # to feed the per-round join)
        sch = pairs.schema()  # ray.data Schema wrapper: parallel names/types
        id_type = dict(zip(sch.names, sch.types))[id_a]
        return ray.data.from_arrow(
            pa.table({"node": pa.array([], id_type), "cluster": pa.array([], id_type)})
        )
    sig = _label_signature(labels)

    for _ in range(max_rounds):
        # propagate each node's label across every edge: join labels onto
        # the edge list by the NEIGHBOR endpoint, emitting (node, lbl(nbr))
        by_nbr = labels.map_batches(
            lambda t: pa.table({"nbr": t.column("node"), "cluster": t.column("cluster")}),
            batch_format="pyarrow",
        )
        prop = hash_join(edges, by_nbr, key="nbr", num_buckets=num_buckets).map_batches(
            lambda t: t.select(["node", "cluster"]), batch_format="pyarrow"
        )
        labels_new = partial_groupby_agg(
            prop.union(labels), "node", {"cluster": ("cluster", "min")},
            batch_size=65536,
        ).materialize()
        sig_new = _label_signature(labels_new)
        labels = labels_new
        if sig_new == sig:
            return labels
        sig = sig_new
    raise RuntimeError(
        f"connected_components did not converge in {max_rounds} rounds — "
        "component diameter exceeds max_rounds; raise it or use a "
        "large-star/small-star variant for adversarial chain shapes"
    )


def dedup_survivors(
    docs: ray.data.Dataset,
    pairs: ray.data.Dataset,
    id_col: str = "doc_id",
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_rounds: int = 32,
    num_buckets: int = 64,
) -> ray.data.Dataset:
    """Keep exactly one document per duplicate cluster (the component-
    minimum id) plus every unpaired document: ``docs`` anti-joined
    against the non-canonical cluster members. Both sides stream; the
    corpus is touched once by the anti join."""
    from raycdc.ops import hash_join

    cc = connected_components(
        pairs, id_a=id_a, id_b=id_b, max_rounds=max_rounds, num_buckets=num_buckets
    )
    if cc.count() == 0:
        return docs

    def losers(t: pa.Table) -> pa.Table:
        keep = pc.not_equal(t.column("node"), t.column("cluster"))
        return pa.table({id_col: t.column("node").filter(keep)})

    non_canonical = cc.map_batches(losers, batch_format="pyarrow")
    return hash_join(docs, non_canonical, key=id_col, how="anti", num_buckets=num_buckets)
