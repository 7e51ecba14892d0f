"""Semantic contracts of the round-4 curation operators: Gopher rule
battery, URL canonicalization, temperature mixture, SemDeDup clustered
semantic dedup, and the end-to-end training funnel.

The value-exact oracles already pin cross-engine equality; these tests pin
the SEMANTIC invariants a correct implementation must satisfy regardless
of fixture values (flag logic, canonicalization idempotence-by-class,
monotone funnel counts, in-cluster-only dup pairs)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from projeto_de_etl_com_api_do_meta_spark.queries.registry import (
    QUERIES,
    _load_all,
)

_load_all()


def _run(name, spark, sf_dir):
    return QUERIES[name].fn(spark, sf_dir)


# -- Gopher rule battery -----------------------------------------------------


def test_gopher_keep_iff_all_rules(spark, sf_dir):
    from projeto_de_etl_com_api_do_meta_spark.queries.text_cleaning import (
        _GOPHER_MAX_MWL_BP,
        _GOPHER_MAX_WORDS,
        _GOPHER_MIN_DISTINCT_BP,
        _GOPHER_MIN_MWL_BP,
        _GOPHER_MIN_STOPS,
        _GOPHER_MIN_WORDS,
    )

    rows = _run("text_gopher_quality_rules", spark, sf_dir).collect()
    assert rows
    kept = 0
    for r in rows:
        expect = (
            _GOPHER_MIN_WORDS <= r.n_words <= _GOPHER_MAX_WORDS
            and _GOPHER_MIN_MWL_BP <= r.mean_wordlen_bp <= _GOPHER_MAX_MWL_BP
            and r.stop_hits >= _GOPHER_MIN_STOPS
            and r.distinct_ratio_bp >= _GOPHER_MIN_DISTINCT_BP
        )
        assert r.keep == int(expect), r
        kept += r.keep
    # the battery must neither pass nor reject the whole corpus
    assert 0 < kept < len(rows)


def test_gopher_rejects_synthetic_bad_docs(spark):
    from projeto_de_etl_com_api_do_meta_spark.queries.text_cleaning import (
        gopher_metrics,
    )

    bad = spark.createDataFrame(
        [
            (1, "too short"),  # < min words
            (2, " ".join(["the"] * 50)),  # distinct ratio 1/50 = 2% < 20%
            (3, " ".join(["verylongwordindeed"] * 40)),  # mwl 18 > 8, no stops
            (4, "the cat sat on the mat and a dog ran to it quickly"),  # good
        ],
        ["doc_id", "text"],
    )
    got = {r.doc_id: r.keep for r in gopher_metrics(bad).collect()}
    assert got == {1: 0, 2: 0, 3: 0, 4: 1}


# -- URL canonicalization ----------------------------------------------------


def test_url_dedup_merges_equivalence_classes(spark, sf_dir):
    df = _run("web_url_canonical_dedup", spark, sf_dir)
    rows = df.collect()
    assert rows
    # synthesized raw URLs differ per doc (unique #fragment) yet collapse to
    # the 7 x 13 x 3 canonical grid — canonicalization really merged them
    n_docs_total = sum(r.n_docs for r in rows)
    assert len(rows) <= 7 * 13 * 3 < n_docs_total
    for r in rows:
        u = r.canonical_url
        assert u.startswith("http://site")  # lowercased, www. stripped
        assert ":80" not in u and "#" not in u  # default port + fragment gone
        assert "/./" not in u and ".." not in u  # dot segments resolved
        q = u.split("?", 1)[1]
        assert q.split("&") == sorted(q.split("&"))  # params sorted


# -- Temperature mixture -----------------------------------------------------


def test_temperature_mixture_flattens_distribution(spark, sf_dir):
    rows = _run("corpus_temperature_mixture", spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 <= r.rate_bp <= 10000
        assert 0 <= r.n_kept <= r.n_total
    # alpha<1 upweights small sources: any strictly-smaller source must get
    # a keep rate >= a strictly-larger one (rate ~ 1/sqrt(n), modulo cap)
    by_n = sorted(rows, key=lambda r: r.n_total)
    for a, b in zip(by_n, by_n[1:]):
        if a.n_total < b.n_total:
            assert a.rate_bp >= b.rate_bp, (a, b)


# -- SemDeDup ----------------------------------------------------------------


def test_semdedup_pairs_are_in_cluster_and_canonical_smaller(spark, sf_dir):
    dups = _run("dedup_semantic_clustered", spark, sf_dir)
    asg = _run("embed_kmeans_lloyd", spark, sf_dir).select("vec_id", "cid")
    rows = dups.collect()
    assert rows  # tau tuned to the fixture's similarity range
    cid_of = {r.vec_id: r.cid for r in asg.collect()}
    for r in rows:
        assert r.canonical_id < r.vec_id
        assert cid_of[r.vec_id] == r.cid == cid_of[r.canonical_id]
        assert r.n_matches >= 1


# -- Training funnel ---------------------------------------------------------


@pytest.fixture(scope="module")
def funnel_rows(spark, sf_dir):
    return (
        _run("pipeline_training_funnel", spark, sf_dir)
        .orderBy("stage_id")
        .collect()
    )


def test_funnel_stages_chain_and_shrink(funnel_rows):
    assert [r.stage for r in funnel_rows] == [
        "quality",
        "exact_dedup",
        "near_dedup",
        "decontaminate",
        "train_split",
    ]
    for r in funnel_rows:
        assert 0 <= r.n_out <= r.n_in  # a filter stage never grows the corpus
    for a, b in zip(funnel_rows, funnel_rows[1:]):
        assert a.n_out == b.n_in  # each stage feeds the next exactly


def test_funnel_agrees_with_standalone_stage_ops(spark, sf_dir, funnel_rows):
    # stage 1 must equal the standalone Gopher battery's keep count
    gopher = _run("text_gopher_quality_rules", spark, sf_dir)
    n_keep = gopher.agg(F.sum("keep")).collect()[0][0]
    assert funnel_rows[0].n_out == n_keep
    # eval slice (doc_id%20==0) can never survive decontamination
    assert funnel_rows[3].n_out <= funnel_rows[3].n_in


# -- WordPiece tokenizer application ------------------------------------------


def test_wordpiece_hand_derived_pieces(spark, sf_dir):
    """Greedy longest-match, ## continuation, and whole-word [UNK] on
    hand-derived words — including the greedy traps the vocab plants."""
    rows = {
        r.word: r
        for r in _run("corpus_wordpiece_tokenize", spark, sf_dir).collect()
    }
    # greedy start: 'val' (len 3) beats 'va'; then '##ue'
    assert rows["value"].pieces == "val ##ue"
    # '##tch' beats '##t' mid-word
    assert rows["batch"].pieces == "ba ##tch"
    assert rows["customer"].pieces == "cu ##stomer"
    # no 'q' piece anywhere -> whole word is one [UNK], n_wp == 1
    assert rows["query"].pieces == "[UNK]"
    assert rows["query"].n_wp == 1 and rows["query"].unk == 1
    # single-char word
    assert rows["a"].pieces == "a" and rows["a"].n_wp == 1
    for r in rows.values():
        assert r.unk in (0, 1)
        assert r.n_wp >= 1
        if not r.unk:
            # pieces reassemble the word exactly (boundary correctness)
            assert "".join(p.lstrip("#") for p in r.pieces.split(" ")) == r.word
