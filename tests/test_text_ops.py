"""Text operator semantics: tokenization, stats, fingerprint, SimHash."""

from __future__ import annotations

from pyspark.sql import functions as F

from projeto_de_etl_com_api_do_meta_spark.operators.text import (
    bpe_ish_token_count,
    doc_stats,
    fingerprint_md5,
    hamming64,
    predict_lang,
    simhash64,
)


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_doc_stats_counts(spark):
    df = _docs(spark, ["the cat sat on the mat"])
    row = doc_stats(df).first()
    assert row.token_count == 6
    assert row.char_count == 22
    assert row.distinct_tokens == 5  # 'the' repeats
    assert abs(row.stopword_ratio - 2 / 6) < 1e-6  # 6dp-rounded; 'the' x2
    assert row.punct_ratio == 0.0


def test_bpe_ish_token_count(spark):
    df = _docs(spark, ["hello world42 a-b!"])
    n = df.select(bpe_ish_token_count("text").alias("n")).first().n
    # hello | world | 42 | a | - | b | !
    assert n == 7


def test_fingerprint_normalizes_case_and_whitespace(spark):
    df = _docs(spark, ["Hello   World", "hello world", "different text"])
    fps = [r.fp for r in df.select(fingerprint_md5("text").alias("fp")).collect()]
    assert fps[0] == fps[1]
    assert fps[0] != fps[2]


def test_simhash_identical_texts_equal(spark):
    df = _docs(spark, ["spark join filter window", "spark join filter window"])
    hs = [r.h for r in df.select(simhash64("text").alias("h")).collect()]
    assert hs[0] == hs[1]


def test_simhash_near_dup_closer_than_unrelated(spark):
    base = "the quick brown fox jumps over the lazy dog " * 5
    near = base.replace("lazy", "sleepy")
    far = "completely unrelated words about databases and query planners " * 5
    df = _docs(spark, [base, near, far])
    hdf = df.select("doc_id", simhash64("text").alias("h"))
    a, b, c = [r.h for r in hdf.orderBy("doc_id").collect()]
    pairs = spark.createDataFrame([(a, b), (a, c)], "x string, y string")
    d_near, d_far = [
        r.d for r in pairs.select(hamming64(F.col("x"), F.col("y")).alias("d")).collect()
    ]
    assert d_near < d_far


def test_predict_lang_deterministic_tiebreak(spark):
    # No markers at all -> every score 0 -> alphabetically first language.
    df = _docs(spark, ["xyzzy plugh"])
    assert predict_lang(df).first().pred_lang == "de"


def test_predict_lang_picks_marker_language(spark):
    df = _docs(spark, ["der hund und die katze und das haus"])
    assert predict_lang(df).first().pred_lang == "de"


def _poly(s: str) -> int:
    h = 0
    for c in s:
        h = (h * 31 + ord(c)) % 1_000_000_007
    return h


def test_char_poly_hash_matches_python(spark):
    from projeto_de_etl_com_api_do_meta_spark.operators.text import char_poly_hash

    df = _docs(spark, ["the quick brown fox"])
    got = df.select(char_poly_hash(F.col("text")).alias("h")).first().h
    assert got == _poly("the quick brown fox")


def test_winnow_fingerprints_semantics(spark):
    from projeto_de_etl_com_api_do_meta_spark.operators.text import (
        winnow_fingerprints,
    )

    words = [f"w{i}" for i in range(10)]
    text = " ".join(words)
    df = _docs(spark, [text, "too few tokens"])
    rows = {r.doc_id: r for r in winnow_fingerprints(df, k=4, window=4).collect()}

    # Doc 0: 10 tokens -> 7 ordered 4-grams; windows of 4 -> 4 minima.
    grams = [" ".join(words[i : i + 4]) for i in range(7)]
    hs = [_poly(g) for g in grams]
    wins = sorted({min(hs[i : i + 4]) for i in range(4)})
    r0 = rows[0]
    assert r0.n_kgrams == 7
    assert r0.poly_fp == _poly(text)
    assert r0.n_fps == len(wins)
    assert r0.min_fp == wins[0]

    # Doc 1: 3 tokens < k -> no k-grams, empty fingerprint set.
    r1 = rows[1]
    assert r1.n_kgrams == 0
    assert r1.n_fps == 0
    assert r1.min_fp is None


def test_scrub_pii_patterns(spark):
    from pyspark.sql import functions as F

    from projeto_de_etl_com_api_do_meta_spark.queries.text_cleaning import scrub_pii

    rows = [
        ("mail me at a.b+c%d@sub.example.co.uk today", "mail me at <EMAIL> today"),
        ("see https://x.io/p?q=1#f and http://y.z/a", "see <URL> and <URL>"),
        ("call +1-555-0100 now", "call <PHONE> now"),
        ("digits-only 12345 stay", "digits-only 12345 stay"),  # no leading +
        ("no pii here", "no pii here"),
        # order: email inside URL path is already gone with the URL
        ("go http://h.com/u@e.com end", "go <URL> end"),
    ]
    df = spark.createDataFrame(rows, "raw string, want string")
    got = df.select("want", scrub_pii(F.col("raw")).alias("got")).collect()
    for r in got:
        assert r.got == r.want


def test_misra_gries_candidates_superset(spark):
    from collections import Counter

    from projeto_de_etl_com_api_do_meta_spark.operators.text import (
        misra_gries_candidates,
    )

    # Skewed corpus: 'hot' words well above n/k, long tail of unique noise.
    rows = []
    for i in range(200):
        rows.append((i, "hot1 hot2 " + f"noise{i} noise{i+1000}"))
    df = spark.createDataFrame(rows, "doc_id long, text string").repartition(7)
    k = 10
    cands = set(misra_gries_candidates(df, "text", k=k))
    counts = Counter(w for _, t in rows for w in t.split(" "))
    n = sum(counts.values())
    true_heavy = {w for w, c in counts.items() if c * k > n}
    assert true_heavy  # test is vacuous otherwise
    assert true_heavy <= cands  # MG guarantee: candidates are a superset


def test_scrub_pii_idempotent(spark):
    from pyspark.sql import functions as F

    from projeto_de_etl_com_api_do_meta_spark.queries.text_cleaning import scrub_pii

    rows = [
        ("a a@b.co http://x.y +1-555-000 end",),
        ("plain text no pii",),
        ("<EMAIL> already scrubbed <URL> <PHONE>",),
    ]
    df = spark.createDataFrame(rows, "raw string")
    once = scrub_pii(F.col("raw"))
    twice = scrub_pii(once)
    bad = df.select(once.alias("a"), twice.alias("b")).where(
        F.col("a") != F.col("b")
    )
    assert bad.count() == 0


def test_word_entropy_uniform_and_degenerate(tmp_path, spark):
    """Entropy semantics pinned on constructed docs: a one-word doc has
    entropy 0; a k-distinct uniform doc has entropy ln(k)."""
    import math

    from projeto_de_etl_com_api_do_meta_spark.queries.analysis_extra import (
        text_word_entropy,
    )

    rows = [
        (1, "same same same same", "en", "s", 19),
        (2, "a b c d", "en", "s", 7),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    out = {
        r.doc_id: r.entropy_bps
        for r in text_word_entropy(spark, str(tmp_path)).collect()
    }
    assert out[1] == 0
    assert out[2] == math.floor(10000 * math.log(4))


def test_daily_anomaly_flags_spike(tmp_path, spark):
    """A flat series with one 10x spike flags exactly that day."""
    import datetime as dt

    from projeto_de_etl_com_api_do_meta_spark.queries.analysis_extra import (
        events_daily_anomaly,
    )

    rows = []
    eid = 0
    for day in range(1, 21):
        n = 50 if day != 15 else 500
        # tiny deterministic per-day jitter so the trailing stddev is nonzero
        n += day % 3
        for i in range(n):
            rows.append(
                (eid, dt.datetime(2024, 3, day, 12, 0, i % 60), 1, "view", 1.0, "{}")
            )
            eid += 1
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    out = events_daily_anomaly(spark, str(tmp_path)).collect()
    flagged = {r.day.day for r in out if r.is_anomaly == 1}
    assert flagged == {15}


def test_countmin_sketch_never_underestimates(spark, sf_dir):
    from projeto_de_etl_com_api_do_meta_spark.queries.analysis_extra import (
        corpus_countmin_sketch,
    )

    rows = corpus_countmin_sketch(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.est_count >= r.true_count  # one-sided CMS error bound


def test_bloom_gate_no_false_negatives_and_prunes(spark):
    from projeto_de_etl_com_api_do_meta_spark.operators.text import (
        bloom_build,
        bloom_might_contain,
    )
    from pyspark.sql import functions as F

    m_bits, k = 1 << 14, 4
    members = spark.range(200).select(
        F.concat(F.lit("member_"), F.col("id")).alias("v")
    )
    bits = bloom_build(members, "v", m_bits, k)
    # Every member passes the gate (blooms never false-negative).
    kept = members.where(bloom_might_contain(bits, "v", m_bits, k)).count()
    assert kept == 200
    # Non-members are overwhelmingly pruned (FP rate ~(1-e^-kn/m)^k << 1).
    others = spark.range(2000).select(
        F.concat(F.lit("other_"), F.col("id")).alias("v")
    )
    passed = others.where(bloom_might_contain(bits, "v", m_bits, k)).count()
    assert passed < 100  # < 5% leak at these parameters


def test_substring_winnow_guarantee(spark):
    """Winnowing guarantee: a shared span of >= GRAM_LEN + W - 1 chars must
    be detected (both docs report n_dup_fps > 0)."""
    import pyspark.sql.functions as F

    from projeto_de_etl_com_api_do_meta_spark.queries.documents_queries import (
        _GRAM_LEN,
        _WINNOW_W,
        text_substring_dup_winnow,
    )

    shared = "x".join(str(i) for i in range(40))  # deterministic filler
    shared = (shared * 4)[: _GRAM_LEN + _WINNOW_W - 1]
    rows = [
        (0, "aaa unique prefix zero " + shared + " tail zero"),
        (1, "bbb another lead-in " + shared + " differing tail"),
        (2, "ccc entirely unrelated document with no shared span at all"),
    ]
    import tempfile

    d = tempfile.mkdtemp(prefix="winnow_t_")
    spark.createDataFrame(
        [(i, t, "en", "src0", len(t)) for i, t in rows],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.mode("overwrite").parquet(f"{d}/documents.parquet")
    out = {r.doc_id: r.n_dup_fps for r in text_substring_dup_winnow(spark, d).collect()}
    assert out[0] > 0 and out[1] > 0
    assert out[2] == 0


def test_badwords_matches_three_word_phrase(tmp_path, spark):
    """The gram lengths are derived from the longest blocklist entry (r4
    verdict item 7): a 3-word phrase must match on word boundaries, and a
    doc shorter than the longest phrase must not error or false-match."""
    from projeto_de_etl_com_api_do_meta_spark.queries.text_cleaning import (
        _BAD_MAX_N,
        _BAD_PHRASES,
        text_badwords_filter,
    )

    assert "sort merge join" in _BAD_PHRASES and _BAD_MAX_N >= 3
    rows = [
        (1, "prefer a sort merge join here", "en", "s", 29),
        (2, "sort merge joins are fine", "en", "s", 25),  # boundary: no hit
        (3, "ok", "en", "s", 2),  # shorter than the longest phrase
        (4, "dup sort merge join dup", "en", "s", 23),  # multi-phrase doc
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    out = {r.doc_id: r for r in text_badwords_filter(spark, str(tmp_path)).collect()}
    assert out[1].n_hits == 1 and out[1].phrases == "sort merge join"
    assert 2 not in out and 3 not in out
    assert out[4].n_hits == 3 and out[4].phrases == "dup,sort merge join"


def test_bloom_semi_reduction_prunes_fact_side(spark, sf_dir):
    """join_bloom_semi_reduction's gate must keep every true match (no
    false negatives) while pruning most non-matching fact rows BEFORE the
    join's exchange — the 16 KB sketch buys ~dimension-selectivity shuffle
    reduction with byte-identical results (oracle = the plain join)."""
    from pyspark.sql import functions as F

    from projeto_de_etl_com_api_do_meta_spark.io import load_table
    from projeto_de_etl_com_api_do_meta_spark.operators.text import (
        bloom_build,
        bloom_might_contain,
    )
    from projeto_de_etl_com_api_do_meta_spark.queries.joins import (
        _BSJ_K,
        _BSJ_M,
    )

    cust = (
        load_table(spark, sf_dir, "customer")
        .where(F.col("c_acctbal") > 9000)
        .select("c_custkey")
    )
    orders = load_table(spark, sf_dir, "orders").select("o_custkey")
    bits = bloom_build(cust, "c_custkey", _BSJ_M, _BSJ_K)
    gated = orders.where(bloom_might_contain(bits, "o_custkey", _BSJ_M, _BSJ_K))
    n_orders, n_gated = orders.count(), gated.count()
    n_true = orders.join(cust, orders.o_custkey == cust.c_custkey).count()
    assert n_true <= n_gated  # no false negatives: every match survives
    assert n_gated < n_orders * 0.5  # and most non-matches are pruned
