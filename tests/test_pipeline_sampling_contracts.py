"""Semantic contracts for the sampling/retrieval operators beyond value
parity with the oracle: determinism across partitioning, budget/ordering
invariants — the properties a training pipeline actually relies on."""

from __future__ import annotations

from cloudfloe_spark.queries import all_queries

CATALOG = all_queries()


def test_stratified_split_fractions_partition_each_language(spark, sf_dir):
    rows = CATALOG["pipeline_stratified_split"].fn(spark, sf_dir).collect()
    by_lang: dict[str, float] = {}
    for r in rows:
        assert r.split in ("train", "val", "test")
        assert r.n_docs > 0
        by_lang[r.lang] = by_lang.get(r.lang, 0.0) + r.frac
    # fractions within a language partition it (rounding slack 4 decimals x3)
    for lang, total in by_lang.items():
        assert abs(total - 1.0) < 3e-4, (lang, total)
    # train dominates under the 80/10/10 hash split
    trains = {r.lang: r.n_docs for r in rows if r.split == "train"}
    others = [r for r in rows if r.split != "train"]
    for r in others:
        assert trains[r.lang] > r.n_docs, (r.lang, r.split)


def test_split_membership_is_partitioning_invariant(spark, sf_dir):
    """The split is a pure function of doc_id: recomputing after an
    arbitrary repartition yields the identical (lang, split) histogram."""
    from pyspark.sql import functions as F

    from cloudfloe_spark.functions.text import portable_hash64
    from cloudfloe_spark.sources.tables import load_table

    d = load_table(spark, sf_dir, "documents")
    bucket = portable_hash64(F.col("doc_id").cast("string"), seed=7) % 100
    a = d.select(bucket.alias("b")).groupBy("b").count().collect()
    b = (
        d.repartition(13, "lang")
        .select(bucket.alias("b"))
        .groupBy("b")
        .count()
        .collect()
    )
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_language_rebalance_respects_budget_and_rates(spark, sf_dir):
    rows = CATALOG["pipeline_language_rebalance"].fn(spark, sf_dir).collect()
    total_before = sum(r.n_before for r in rows)
    total_kept = sum(r.n_kept for r in rows)
    n_langs = len(rows)
    per_lang_budget = total_before * 0.6 / n_langs
    for r in rows:
        assert 0 < r.rate <= 1.0
        assert r.n_kept <= r.n_before
        # hash sampling is binomial around rate*n: allow generous slack
        expected = r.rate * r.n_before
        assert abs(r.n_kept - expected) <= max(10, 0.2 * expected), (
            r.lang,
            r.n_kept,
            expected,
        )
        # no language may exceed its equal share (plus sampling slack)
        assert r.n_kept <= per_lang_budget * 1.2 + 10, (r.lang, r.n_kept)
    assert total_kept < total_before


def test_bm25_ranking_is_strictly_ordered(spark, sf_dir):
    rows = CATALOG["text_bm25_topk"].fn(spark, sf_dir).collect()
    assert [r.rnk for r in rows] == list(range(1, len(rows) + 1))
    for a, b in zip(rows, rows[1:]):
        assert (a.bm25, -a.doc_id) >= (b.bm25, -b.doc_id)
        assert a.bm25 > 0


def test_ivf_mrr_values_are_valid_reciprocal_ranks(spark, sf_dir):
    rows = CATALOG["sim_ivf_mrr_eval"].fn(spark, sf_dir).collect()
    assert len(rows) == 5  # one per query vector
    for r in rows:
        assert 0 <= r.found_rank <= 10
        if r.found_rank == 0:
            assert r.rr == 0.0
        else:
            assert abs(r.rr - round(1.0 / r.found_rank, 4)) < 1e-9
