"""Property-based invariants for corpus chunking and $set updates: for
ANY document token counts and window parameters, chunks tile the doc
with exact stride/overlap and cover every token; for ANY criteria
match-set, set_matching rewrites exactly the matching rows."""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

from maggma_spark.operators.corpus import chunk_documents
from maggma_spark.operators.merge import set_matching


@given(
    n_tokens=st.lists(st.integers(0, 40), min_size=1, max_size=6),
    max_tokens=st.integers(1, 12),
    overlap_frac=st.integers(0, 99),
)
@settings(max_examples=12, deadline=None)
def test_chunk_documents_tiling_invariants(spark, n_tokens, max_tokens,
                                           overlap_frac):
    overlap = (overlap_frac * max_tokens) // 100  # always < max_tokens
    stride = max_tokens - overlap
    rows = [(i, " ".join(f"t{i}_{j}" for j in range(n)))
            for i, n in enumerate(n_tokens)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = chunk_documents(df, max_tokens=max_tokens, overlap=overlap)
    by_doc: dict[int, list] = {}
    for r in out.collect():
        by_doc.setdefault(r["key"], []).append(r)
    for i, n in enumerate(n_tokens):
        chunks = sorted(by_doc.get(i, []), key=lambda r: r["chunk_id"])
        if n == 0:
            assert chunks == []
            continue
        # chunk ids contiguous from 0; every token covered exactly once
        # at its first-covering chunk; no chunk exceeds max_tokens
        assert [c["chunk_id"] for c in chunks] == list(range(len(chunks)))
        seen = set()
        for c in chunks:
            toks = c["chunk_text"].split()
            assert 1 <= len(toks) <= max_tokens
            assert len(toks) == c["n_tokens"]
            start = c["chunk_id"] * stride
            assert toks == [f"t{i}_{j}"
                            for j in range(start, min(start + max_tokens, n))]
            seen.update(range(start, min(start + max_tokens, n)))
        assert seen == set(range(n)), "every token must land in a chunk"


@given(
    vals=st.lists(st.integers(0, 9), min_size=1, max_size=20),
    targets=st.sets(st.integers(0, 9), max_size=5),
)
@settings(max_examples=12, deadline=None)
def test_set_matching_rewrites_exactly_matches(spark, vals, targets):
    rows = [(i, v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "id long, v long")
    out = set_matching(df, {"v": {"$in": sorted(targets)}}, {"tag": "hit"})
    got = {r["id"]: r["tag"] for r in out.collect()}
    for i, v in enumerate(vals):
        assert got[i] == ("hit" if v in targets else None)


@given(
    fr=st.lists(st.integers(1, 50), min_size=2, max_size=5),
    n_rows=st.integers(10, 200),
    seed=st.integers(0, 3),
)
@settings(max_examples=10, deadline=None)
def test_assign_splits_total_coverage_property(spark, fr, n_rows, seed):
    """For ANY fraction vector (normalized) and key set: every row gets
    exactly one split, and membership is a pure function of (seed, key)
    — invariant to row order and extra rows."""
    from maggma_spark.operators.corpus import assign_splits

    total = sum(fr)
    fractions = {f"s{i}": v / total for i, v in enumerate(fr)}
    df = spark.createDataFrame([(i,) for i in range(n_rows)], "k long")
    out = {r["k"]: r["split"] for r in
           assign_splits(df, "k", fractions, seed=seed).collect()}
    assert len(out) == n_rows
    assert all(v is not None and v in fractions for v in out.values())
    bigger = spark.createDataFrame([(i,) for i in range(n_rows * 2)],
                                   "k long")
    out2 = {r["k"]: r["split"] for r in
            assign_splits(bigger, "k", fractions, seed=seed).collect()}
    assert all(out2[k] == v for k, v in out.items())


@given(
    weights=st.lists(st.integers(1, 1000), min_size=5, max_size=40),
    k=st.integers(1, 10),
)
@settings(max_examples=10, deadline=None)
def test_weighted_sample_size_and_determinism_property(spark, weights, k):
    """For ANY positive integer weights: exactly min(k, n) rows are
    selected and the selection is layout-independent."""
    from maggma_spark.operators.corpus import weighted_sample

    df = spark.createDataFrame(list(enumerate(weights)), "k long, w long")
    got = {r["k"] for r in weighted_sample(df, "k", "w", k=k).collect()}
    assert len(got) == min(k, len(weights))
    got2 = {r["k"] for r in weighted_sample(
        df.repartition(5), "k", "w", k=k).collect()}
    assert got == got2
