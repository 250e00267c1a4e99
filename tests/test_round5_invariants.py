"""Internal-consistency invariants of the round-5 operators — relations
between output columns that must hold regardless of fixture content,
complementing the DuckDB value parity in test_parity.py."""

from __future__ import annotations

from oraaud_kafka_spark import registry

from .conftest import SF_DIR

registry.load_all()


def test_inverted_index_postings_consistent(spark):
    rows = registry.QUERIES["q_text_inverted_index"](spark, SF_DIR).collect()
    assert rows
    for r in rows:
        ids = [int(x) for x in r.postings.split(",")]
        assert r.df == len(ids), f"{r.term}: df != posting count"
        assert ids == sorted(set(ids)), f"{r.term}: postings not sorted-unique"


def test_length_buckets_padding_math(spark):
    rows = registry.QUERIES["q_pack_length_buckets"](spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r.min_len <= r.bucket_max <= r.max_len_bound
        assert r.total_tokens <= r.n_docs * r.bucket_max
        assert r.padding_waste == r.n_docs * r.bucket_max - r.total_tokens
        assert r.padding_waste >= 0


def test_pipeline_card_respects_gopher_floor(spark):
    """Every surviving doc passed the >=50-word Gopher rule, so each
    language's token volume must be at least 50 x its doc count."""
    rows = registry.QUERIES["q_corpus_pipeline_card"](spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r.n_docs > 0
        assert r.total_tokens >= 50 * r.n_docs


def test_bpe_pairs_ranked_and_formed(spark):
    rows = registry.QUERIES["q_text_bpe_pair_counts"](spark, SF_DIR).collect()
    assert rows
    counts = [r.n for r in rows]
    assert counts == sorted(counts, reverse=True)
    assert all("+" in r.pair for r in rows)


def test_top_paths_are_event_type_sequences(spark):
    rows = registry.QUERIES["q_events_top_paths"](spark, SF_DIR).collect()
    assert rows
    types = {"signup", "view", "click", "purchase", "error"}
    for r in rows:
        assert r.n_sessions >= 1
        assert set(r.path.split(">")) <= types, f"unexpected step in {r.path!r}"


def test_semantic_dedup_drops_only_non_minimal(spark):
    """The lowest vec_id of every cluster can never be dropped (no
    lower-id neighbor exists)."""
    rows = registry.QUERIES["q_dedup_semantic"](spark, SF_DIR).collect()
    first_of_cluster: dict[int, int] = {}
    for r in sorted(rows, key=lambda r: r.vec_id):
        first_of_cluster.setdefault(r.cid, r.vec_id)
    for r in rows:
        if r.vec_id == first_of_cluster[r.cid]:
            assert not r.dropped, f"cluster-min vec {r.vec_id} dropped"
