"""Unit and property tests for the exact-overlap dedup family
(containment / shared-window / content-defined chunks) and the
triangle-counting graph operator added in round 7."""

from __future__ import annotations

from pyspark.sql import functions as F

from spark_flink_streaming_example_with_test_spark.operators.dedup import (
    cdc_chunks,
    containment_pairs,
    ngram_jaccard_pairs,
    shared_gram_pairs,
)
from spark_flink_streaming_example_with_test_spark.operators.graph import triangle_counts


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


# --- containment_pairs ------------------------------------------------


def test_containment_detects_embedded_excerpt(spark):
    """A doc that is a verbatim slice of another has containment 1.0
    even though Jaccard is low — the asymmetric case the operator
    exists for."""
    long_words = " ".join(f"w{i}" for i in range(40))
    excerpt = " ".join(f"w{i}" for i in range(10, 18))  # 8-word slice
    df = _docs(spark, [(1, long_words), (2, excerpt), (3, "x y z q r s t u")])
    got = {
        (r.id_a, r.id_b): r.containment
        for r in containment_pairs(df, shingle_len=5, threshold=0.5).collect()
    }
    assert got == {(1, 2): 1.0}
    jac = ngram_jaccard_pairs(df, shingle_len=5, threshold=0.5).collect()
    assert jac == []  # symmetric Jaccard misses the same pair


def test_containment_never_below_jaccard(spark, sf_dir):
    """containment >= jaccard for every pair (min(a,b) <= union)."""
    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .filter(F.col("doc_id") < 200)
    )
    c = containment_pairs(docs, shingle_len=3, threshold=0.0)
    j = ngram_jaccard_pairs(docs, shingle_len=3, threshold=0.0)
    joined = c.join(j, ["id_a", "id_b"]).collect()
    assert joined, "expected overlapping pairs in fixture"
    assert all(r.containment >= r.jaccard for r in joined)


# --- shared_gram_pairs ------------------------------------------------


def test_shared_gram_pairs_counts_distinct_windows(spark):
    a = "a b c d e f g h i j"  # windows: a..h, b..i, c..j
    b = "a b c d e f g h X Y"  # shares exactly window a..h
    df = _docs(spark, [(1, a), (2, b)])
    rows = shared_gram_pairs(df, window_len=8).collect()
    assert [(r.id_a, r.id_b, r.n_shared_windows) for r in rows] == [(1, 2, 1)]


def test_shared_gram_pairs_short_docs_excluded(spark):
    df = _docs(spark, [(1, "a b c"), (2, "a b c"), (3, "")])
    assert shared_gram_pairs(df, window_len=8).collect() == []


# --- cdc_chunks -------------------------------------------------------


def test_cdc_chunks_reassemble_to_document(spark):
    """Chunks concatenated in chunk_id order reproduce the lowered
    token stream exactly — no token lost or duplicated."""
    rows = [
        (1, "The quick brown fox jumps over the lazy dog again and again"),
        (2, "one"),
        (3, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
    ]
    df = _docs(spark, rows)
    got = (
        cdc_chunks(df)
        .groupBy("doc_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("chunk_id", "chunk"))),
                    lambda s: s["chunk"],
                ),
                " ",
            ).alias("rebuilt"),
            F.sum("n_tokens").alias("n"),
        )
        .collect()
    )
    expect = {i: t.lower() for i, t in rows}
    for r in got:
        assert r.rebuilt == expect[r.doc_id]
        assert r.n == len(expect[r.doc_id].split(" "))
    assert len(got) == len(rows)


def test_cdc_chunks_shift_robust_vs_fixed_segments(spark):
    """Inserting one token at the front changes only the chunk
    containing the edit: every chunk after the first boundary is
    byte-identical between the two versions — the content-defined
    property that fixed-length segmentation lacks."""
    base = " ".join(f"tok{i}" for i in range(200))
    edited = "INSERTED " + base
    df = _docs(spark, [(1, base), (2, edited)])
    chunks = {
        (r.doc_id, r.chunk_id): r.chunk for r in cdc_chunks(df).collect()
    }
    base_chunks = [v for (d, _), v in sorted(chunks.items()) if d == 1]
    edit_chunks = [v for (d, _), v in sorted(chunks.items()) if d == 2]
    # same number of boundaries after the edit point -> suffix chunks align
    shared = set(base_chunks) & set(edit_chunks)
    # all but the first chunk of each version must be shared verbatim
    assert set(base_chunks[1:]) <= shared
    assert set(edit_chunks[1:]) <= shared


# --- triangle_counts --------------------------------------------------


def test_triangle_counts_k4(spark):
    """K4 has 4 triangles; every node participates in 3. Reversed
    duplicates and self-loops must not inflate the count."""
    edges = [
        (a, b) for a in range(4) for b in range(4) if a != b
    ] + [(0, 0), (2, 2)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r.node: r.n_triangles for r in triangle_counts(df).collect()}
    assert got == {0: 3, 1: 3, 2: 3, 3: 3}


def test_triangle_counts_triangle_free_graph(spark):
    df = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3), (3, 0)], "src long, dst long"
    )  # 4-cycle: no triangles
    assert triangle_counts(df).collect() == []


# --- ensemble detector voting --------------------------------------


def test_detector_vote_counts_all_categories(spark):
    """The fixture's random embeddings never agree with the text
    detector, so the catalog query structurally cannot emit a
    'both' row — pin the voting branch on synthetic pair sets that
    cover every category (incl. the both branch the query exists
    for)."""
    from pyspark.sql import functions as F

    from spark_flink_streaming_example_with_test_spark.plans.llm import detector_vote_counts

    tp = spark.createDataFrame(
        [(1, 2), (1, 3), (4, 5)], "id_a long, id_b long"
    ).withColumn("in_text", F.lit(True))
    ep = spark.createDataFrame(
        [(1, 2), (6, 7)], "id_a long, id_b long"
    ).withColumn("in_emb", F.lit(True))
    got = {
        r.detector: r.n_pairs
        for r in detector_vote_counts(tp, ep).collect()
    }
    assert got == {"both": 1, "text_only": 2, "embedding_only": 1}


# --- bounded-depth BFS -----------------------------------------------


def test_bfs_hops_min_distance_with_cycles(spark):
    """Diamond + cycle back to the root: every node keeps its FIRST
    (minimal) discovery distance even though longer paths to the
    same nodes exist (0->1->3->0 revisits the root; 0->1->3 and
    0->2->3 both reach 3)."""
    from spark_flink_streaming_example_with_test_spark.operators.graph import bfs_hops_unrolled

    edges = spark.createDataFrame(
        [(0, 1), (0, 2), (1, 3), (2, 3), (3, 0), (3, 4), (4, 5)],
        "src long, dst long",
    )
    got = {
        r.node: r.dist
        for r in bfs_hops_unrolled(edges, root=0, n_hops=3).collect()
    }
    assert got == {0: 0, 1: 1, 2: 1, 3: 2, 4: 3}


def test_bfs_frontier_only_expansion(spark):
    """The per-hop join touches only the newly discovered frontier,
    not the whole visited set: after the frontier empties (all
    reachable nodes found), extra hops add nothing and the visited
    set stays fixed."""
    from spark_flink_streaming_example_with_test_spark.operators.graph import bfs_hops_unrolled

    edges = spark.createDataFrame(
        [(0, 1), (1, 0)], "src long, dst long"
    )  # 2-cycle: everything reachable within 1 hop
    shallow = sorted(
        map(tuple, bfs_hops_unrolled(edges, root=0, n_hops=1).collect())
    )
    deep = sorted(
        map(tuple, bfs_hops_unrolled(edges, root=0, n_hops=5).collect())
    )
    assert shallow == deep == [(0, 0), (1, 1)]


# --- label propagation communities -----------------------------------


def test_lpa_two_cliques_with_bridge(spark):
    """Two 4-cliques joined by one bridge edge: after 2 synchronous
    rounds every clique member carries its clique's minimum label —
    majority vote keeps the bridge from merging the communities
    (a min-label flood WOULD merge them)."""
    from spark_flink_streaming_example_with_test_spark.operators.graph import label_propagation_communities

    clique_a = [(a, b) for a in range(4) for b in range(4) if a < b]
    clique_b = [(a + 10, b + 10) for a, b in clique_a]
    edges = spark.createDataFrame(
        clique_a + clique_b + [(3, 10)], "src long, dst long"
    )
    got = {
        r.node: r.community
        for r in label_propagation_communities(edges, rounds=2).collect()
    }
    assert {got[n] for n in range(4)} == {0}
    assert {got[n] for n in range(10, 14)} == {10}


def test_lpa_self_loop_only_nodes_kept(spark):
    """A node appearing only as a self-loop has no neighbor to vote
    but must still be in the output with its own label (round-7
    ADVICE, low: these were silently dropped when self-loops were
    filtered from the symmetrized edge set)."""
    from spark_flink_streaming_example_with_test_spark.operators.graph import label_propagation_communities

    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (99, 99)], "src long, dst long"
    )
    got = {
        r.node: r.community
        for r in label_propagation_communities(edges, rounds=2).collect()
    }
    assert got[99] == 99
    assert set(got) == {0, 1, 2, 99}


def test_lpa_fixed_rounds_choice_is_evidence_backed(spark, sf_dir):
    """Evidence record for the fixed rounds=2 choice in
    community_label_propagation. The round-7 VERDICT hypothesized
    that round 3 REFINES round 2 (no merges reverse); measured on
    the ring+chord fixture graph that is FALSE — synchronous
    majority propagation is not monotone (round-3 communities span
    many round-2 communities; labels oscillate, the well-known
    synchronous-LPA behavior Raghavan et al. address with
    asynchronous updates). The fixed unroll is therefore justified
    by DETERMINISM + oracle replayability, not convergence, and this
    test pins the properties that actually hold:
    determinism across runs, full node coverage, and non-degenerate
    structure (communities neither collapse to one nor stay fully
    singleton) at both 2 and 3 rounds."""
    from spark_flink_streaming_example_with_test_spark.operators.graph import label_propagation_communities
    from spark_flink_streaming_example_with_test_spark.plans.analytics import _ring_chord_edges

    edges = _ring_chord_edges(spark, sf_dir)
    l2 = {
        r.node: r.community
        for r in label_propagation_communities(edges, rounds=2).collect()
    }
    l2_again = {
        r.node: r.community
        for r in label_propagation_communities(edges, rounds=2).collect()
    }
    assert l2 == l2_again  # deterministic: fixed rounds, total tiebreak
    l3 = {
        r.node: r.community
        for r in label_propagation_communities(edges, rounds=3).collect()
    }
    assert set(l2) == set(l3)  # same node coverage regardless of rounds
    for labels in (l2, l3):
        n_comm = len(set(labels.values()))
        assert 1 < n_comm < len(labels)  # non-degenerate structure
    # The refinement hypothesis is false: document the measured
    # counterexample magnitude so a future round doesn't re-test it.
    from collections import defaultdict

    by_l3 = defaultdict(set)
    for node, c3 in l3.items():
        by_l3[c3].add(l2[node])
    n_spanning = sum(1 for parents in by_l3.values() if len(parents) > 1)
    assert n_spanning > 0, (
        "refinement unexpectedly holds now — if the fixture graph "
        "changed, re-evaluate whether rounds=2 remains the right "
        "fixed unroll"
    )
