"""Unit tests for the round-11 operators (ordinal association, regression
diagnostics, GOF, long-memory, complexity, retrieval eval/scoring, lexical
richness, data vault, bit-packing codec).

Strategy (SURVEY §5): semantics pinned by independent brute-force
recomputation in pure Python/NumPy on the sf0.001 fixture (the DuckDB
oracle differ is the cross-engine gate; these tests protect against the
two engines agreeing on the WRONG formula)."""

from __future__ import annotations

import math
import os
import random

import pytest

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


def _events(spark, sf_dir):
    from projeto_de_etl_com_api_do_meta_spark.io import load_table

    return load_table(spark, sf_dir, "events")


class TestBitpackCodec:
    def test_golden(self):
        from projeto_de_etl_com_api_do_meta_spark.queries.analytics_r11 import (
            bitpack_decode,
            bitpack_encode,
        )

        assert bitpack_encode([]) == b"\x00\x00\x00\x00"
        assert bitpack_decode(bitpack_encode([])) == []
        # one 6-bit value fits the first payload byte
        assert bitpack_encode([5]) == b"\x01\x00\x00\x00\x05"
        # length formula: 4 + ceil(6n/8)
        for n in range(0, 40):
            buf = bitpack_encode(list(range(n)))
            assert len(buf) == 4 + (6 * n + 7) // 8

    def test_roundtrip_randomized(self):
        from projeto_de_etl_com_api_do_meta_spark.queries.analytics_r11 import (
            bitpack_decode,
            bitpack_encode,
        )

        rng = random.Random(41)
        for _ in range(300):
            vals = [rng.randint(0, 63) for _ in range(rng.randint(0, 50))]
            assert bitpack_decode(bitpack_encode(vals)) == vals

    def test_clamps_out_of_range(self):
        from projeto_de_etl_com_api_do_meta_spark.queries.analytics_r11 import (
            bitpack_decode,
            bitpack_encode,
        )

        assert bitpack_decode(bitpack_encode([64, 100, -3])) == [63, 63, 0]


class TestBruteForceParity:
    """Collected-fixture brute force: recompute each statistic from the
    raw rows in pure Python and compare to the operator's output."""

    @pytest.fixture(scope="class")
    def daily(self, spark):
        rows = (
            _events(spark, SF_DIR)
            .selectExpr(
                "CAST(ts AS DATE) AS day",
                "CAST(event_type = 'click' AS INT) AS is_click",
                "CAST(event_type = 'view' AS INT) AS is_view",
            )
            .groupBy("day")
            .agg({"is_click": "sum", "is_view": "sum"})
            .collect()
        )
        out = sorted((r[0], int(r[2]), int(r[1])) for r in rows)
        # columns arrive as (day, sum(is_click), sum(is_view)) — map by name
        rows2 = []
        for r in sorted(rows, key=lambda r: r["day"]):
            rows2.append(
                (r["day"], int(r["sum(is_click)"]), int(r["sum(is_view)"]))
            )
        del out
        return rows2

    def test_durbin_watson_formula(self, spark, daily):
        from projeto_de_etl_com_api_do_meta_spark.queries.stats_r11 import (
            ml_durbin_watson,
        )

        xs = [x for _, x, _ in daily]
        ys = [y for _, _, y in daily]
        n = len(xs)
        sx, sy = sum(xs), sum(ys)
        sxx = sum(x * x for x in xs)
        sxy = sum(x * y for x, y in zip(xs, ys))
        resid = [
            round(
                (
                    y
                    - (
                        sy / n
                        + (n * sxy - sx * sy) / (n * sxx - sx * sx) * (x - sx / n)
                    )
                )
                * 1e6
            )
            for x, y in zip(xs, ys)
        ]
        num = sum(
            ((a - b) * (a - b)) // 1000000 for a, b in zip(resid[1:], resid[:-1])
        )
        den = sum((e * e) // 1000000 for e in resid)
        want = round(num / den, 6)
        got = ml_durbin_watson(spark, SF_DIR).collect()[0]
        assert got["n_days"] == n
        assert got["dw_stat"] == pytest.approx(want, abs=1e-9)
        # residual independence scale: DW lives in [0, 4]
        assert 0.0 <= got["dw_stat"] <= 4.0

    def test_permutation_entropy_brute(self, spark):
        from projeto_de_etl_com_api_do_meta_spark.queries.stats_r11 import (
            events_permutation_entropy,
        )

        rows = (
            _events(spark, SF_DIR)
            .selectExpr("event_type AS g", "CAST(ts AS DATE) AS day")
            .groupBy("g", "day")
            .count()
            .collect()
        )
        series: dict = {}
        for r in rows:
            series.setdefault(r["g"], []).append((r["day"], int(r["count"])))
        got = {
            r["event_type"]: r
            for r in events_permutation_entropy(spark, SF_DIR).collect()
        }
        for g, pts in series.items():
            xs = [x for _, x in sorted(pts)]
            pats: dict = {}
            for i in range(2, len(xs)):
                x0, x1, x2 = xs[i - 2], xs[i - 1], xs[i]
                code = 4 * (x0 <= x1) + 2 * (x0 <= x2) + (x1 <= x2)
                pats[code] = pats.get(code, 0) + 1
            ntot = sum(pats.values())
            h_e9 = sum(
                round(-1e9 * (c / ntot) * math.log(c / ntot))
                for c in pats.values()
            )
            want = round(h_e9 / 1e9 / math.log(6.0), 6)
            assert got[g]["n_windows"] == ntot
            assert got[g]["n_patterns"] == len(pats)
            assert got[g]["perm_entropy"] == pytest.approx(want, abs=1e-9)

    def test_gamma_brute_force_pairs(self, spark):
        """Concordant/discordant counts from the spine must equal the
        O(n^2)-style count over the (group, bucket, count) histogram."""
        from projeto_de_etl_com_api_do_meta_spark.queries.stats_r11 import (
            ml_goodman_kruskal_gamma,
        )

        rows = (
            _events(spark, SF_DIR)
            .where("value IS NOT NULL")
            .selectExpr("event_type AS g", "CAST(round(value) AS BIGINT) AS v")
            .groupBy("g", "v")
            .count()
            .collect()
        )
        hist = [(r["g"], int(r["v"]), int(r["count"])) for r in rows]
        c = d = t = 0
        for ga, va, ca in hist:
            for gb, vb, cb in hist:
                if ga >= gb:
                    continue
                if va < vb:
                    c += ca * cb
                elif va > vb:
                    d += ca * cb
                else:
                    t += ca * cb
        got = ml_goodman_kruskal_gamma(spark, SF_DIR).collect()[0]
        assert (got["c_pairs"], got["d_pairs"], got["ty_pairs"]) == (c, d, t)
        if c + d:
            assert got["gamma"] == pytest.approx(round((c - d) / (c + d), 6))

    def test_hurst_rs_brute(self, spark):
        from projeto_de_etl_com_api_do_meta_spark.queries.stats_r11 import (
            ml_hurst_rs,
        )

        rows = (
            _events(spark, SF_DIR)
            .selectExpr("CAST(ts AS DATE) AS day")
            .groupBy("day")
            .count()
            .collect()
        )
        xs = [int(r["count"]) for r in sorted(rows, key=lambda r: r["day"])]
        got = {r["w"]: r for r in ml_hurst_rs(spark, SF_DIR).collect()}
        for w in (2, 4, 8, 16):
            total = 0
            blocks = 0
            for b0 in range(0, len(xs) - w + 1, w):
                blk = xs[b0 : b0 + w]
                s1 = sum(blk)
                cum = 0
                devs = []
                for k, x in enumerate(blk, 1):
                    cum += x
                    devs.append(w * cum - k * s1)
                r_int = max(devs) - min(devs)
                var_int = sum((w * x - s1) ** 2 for x in blk)
                if var_int > 0:
                    total += round(1e6 * r_int * math.sqrt(w / var_int))
                    blocks += 1
            if blocks:
                assert got[w]["n_blocks"] == blocks
                assert got[w]["sum_rs_e6"] == total
        # hurst of a real series lands in a sane band
        h = next(iter(got.values()))["hurst"]
        assert -0.5 <= h <= 1.5

    def test_map_eval_brute(self, spark):
        from projeto_de_etl_com_api_do_meta_spark.queries.analytics_r11 import (
            retrieval_map_eval,
        )
        from projeto_de_etl_com_api_do_meta_spark.queries.retrieval_extra import (
            _EVAL_K,
            _EVAL_QUERIES,
        )
        from projeto_de_etl_com_api_do_meta_spark.io import load_table

        emb = load_table(spark, SF_DIR, "embeddings").collect()
        vecs = {r["vec_id"]: (r["label"], list(r["embedding"])) for r in emb}
        got = {r["query_id"]: r for r in retrieval_map_eval(spark, SF_DIR).collect()}
        for qid in range(_EVAL_QUERIES):
            qlabel, qv = vecs[qid]
            qv = [float(x) for x in qv]
            scored = []
            for did, (dlabel, dv) in vecs.items():
                if did == qid:
                    continue
                dv = [float(x) for x in dv]
                dot = sum(a * b for a, b in zip(qv, dv))
                cos = round(
                    dot
                    / (
                        math.sqrt(sum(a * a for a in qv))
                        * math.sqrt(sum(a * a for a in dv))
                    ),
                    6,
                )
                scored.append((-cos, did, dlabel))
            scored.sort()
            topk = scored[:_EVAL_K]
            cum = 0
            ap_e9 = 0
            n_rel = 0
            for r, (_, _, dlabel) in enumerate(topk, 1):
                if dlabel == qlabel:
                    cum += 1
                    n_rel += 1
                    ap_e9 += (1000000000 * cum) // r
            r_total = sum(
                1 for did, (dl, _) in vecs.items() if dl == qlabel and did != qid
            )
            want_ap = (
                0.0
                if r_total == 0
                else round(ap_e9 / 1e9 / min(_EVAL_K, r_total), 6)
            )
            assert got[qid]["n_rel_topk"] == n_rel
            assert got[qid]["n_rel_total"] == r_total
            assert got[qid]["ap_e9"] == ap_e9
            assert got[qid]["avg_precision"] == pytest.approx(want_ap, abs=1e-9)

    def test_yule_k_brute(self, spark):
        from projeto_de_etl_com_api_do_meta_spark.io import load_table
        from projeto_de_etl_com_api_do_meta_spark.queries.analytics_r11 import (
            corpus_yule_k_richness,
        )
        import re

        docs = load_table(spark, SF_DIR, "documents").collect()
        tf: dict = {}
        for r in docs:
            for w in re.split(r"\s+", r["text"].strip().lower()):
                tf.setdefault(r["source"], {})
                tf[r["source"]][w] = tf[r["source"]].get(w, 0) + 1
        got = {
            r["source"]: r for r in corpus_yule_k_richness(spark, SF_DIR).collect()
        }
        for src, counts in tf.items():
            n = sum(counts.values())
            sm2 = sum(m * m for m in counts.values())
            v = len(counts)
            v1 = sum(1 for m in counts.values() if m == 1)
            assert got[src]["n_tokens"] == n
            assert got[src]["n_types"] == v
            assert got[src]["v1_hapax"] == v1
            assert got[src]["sm2"] == sm2
            assert got[src]["yule_k"] == pytest.approx(
                round(1e4 * (sm2 - n) / (n * n), 6), abs=1e-9
            )

    def test_mahalanobis_outlier_flag(self, spark, daily):
        from projeto_de_etl_com_api_do_meta_spark.queries.stats_r11 import (
            ml_mahalanobis_outliers,
        )

        got = ml_mahalanobis_outliers(spark, SF_DIR).collect()
        assert len(got) == len(daily)
        for r in got:
            assert r["is_outlier"] == (1 if r["d2_e6"] > 5991465 else 0)
        # mean d^2 over days ~ 2 for a 2-dim standardized cloud
        mean_d2 = sum(r["d2_e6"] for r in got) / len(got) / 1e6
        assert 0.5 <= mean_d2 <= 4.0

    def test_chow_f_nonnegative_and_segments_cover(self, spark, daily):
        from projeto_de_etl_com_api_do_meta_spark.queries.stats_r11 import (
            ml_chow_test,
        )

        got = ml_chow_test(spark, SF_DIR).collect()[0]
        assert got["n1"] + got["n2"] == len(daily)
        assert got["n1"] > 0 and got["n2"] > 0
        # pooled SSE >= sum of segment SSEs (n-scaled comparison), so F >= 0
        assert got["chow_f"] >= 0.0

    def test_cvm_matches_ks_family_domain(self, spark):
        from projeto_de_etl_com_api_do_meta_spark.queries.stats_r11 import (
            ml_cramer_von_mises,
        )

        got = ml_cramer_von_mises(spark, SF_DIR).collect()[0]
        # brute force from the raw values
        rows = (
            _events(spark, SF_DIR)
            .where("value IS NOT NULL AND event_type IN ('click', 'view')")
            .selectExpr(
                "CASE WHEN event_type = 'click' THEN 1 ELSE 2 END AS s",
                "CAST(round(value * 100) AS BIGINT) AS v",
            )
            .collect()
        )
        from collections import Counter

        c1 = Counter(r["v"] for r in rows if r["s"] == 1)
        c2 = Counter(r["v"] for r in rows if r["s"] == 2)
        n1, n2 = sum(c1.values()), sum(c2.values())
        vs = sorted(set(c1) | set(c2))
        m1 = m2 = 0
        tsum = 0
        for v in vs:
            m1 += c1.get(v, 0)
            m2 += c2.get(v, 0)
            gap = m1 / n1 - m2 / n2
            tsum += round(1e9 * (c1.get(v, 0) + c2.get(v, 0)) * gap * gap)
        want_t = round(n1 * n2 / ((n1 + n2) ** 2) * tsum / 1e9, 6)
        assert got["n1"] == n1 and got["n2"] == n2
        assert got["cvm_e9"] == tsum
        assert got["cvm_t"] == pytest.approx(want_t, abs=1e-9)


class TestDataVault:
    def test_hash_keys_and_counts(self, spark):
        import hashlib

        from projeto_de_etl_com_api_do_meta_spark.io import load_table
        from projeto_de_etl_com_api_do_meta_spark.queries.analytics_r11 import (
            warehouse_data_vault_build,
        )

        got = {
            r["entity"]: r
            for r in warehouse_data_vault_build(spark, SF_DIR).collect()
        }
        orders = load_table(spark, SF_DIR, "orders").collect()
        cust = load_table(spark, SF_DIR, "customer").collect()
        assert got["hub_customer"]["n_rows"] == len(cust)
        assert got["hub_order"]["n_rows"] == len(orders)
        # hub keys are unique (business keys are)
        assert got["hub_customer"]["n_distinct_hk"] == len(cust)
        assert got["hub_order"]["n_distinct_hk"] == len(orders)
        # spot-check one link hash against hashlib
        r0 = orders[0]
        hk = hashlib.md5(
            f"{r0['o_custkey']}|{r0['o_orderkey']}".encode()
        ).hexdigest()
        mn = got["link_customer_order"]["min_hk"]
        mx = got["link_customer_order"]["max_hk"]
        assert mn <= hk <= mx

    def test_lm_dirichlet_prefers_term_density(self, spark):
        """A doc that matches more query terms with shorter length must
        outrank a long doc with one match — sanity on the decomposition."""
        from projeto_de_etl_com_api_do_meta_spark.queries.analytics_r11 import (
            retrieval_lm_dirichlet,
        )

        rows = retrieval_lm_dirichlet(spark, SF_DIR).collect()
        assert 1 <= len(rows) <= 10
        scores = [r["lmd_micro"] for r in rows]
        assert scores == sorted(scores, reverse=True)


class TestBatch2BruteForce:
    def test_theil_u_brute(self, spark):
        from projeto_de_etl_com_api_do_meta_spark.io import load_table
        from projeto_de_etl_com_api_do_meta_spark.queries.analytics_r11b import (
            ml_theil_u_uncertainty,
        )

        docs = load_table(spark, SF_DIR, "documents").collect()
        from collections import Counter

        nxy = Counter((r["lang"], r["source"]) for r in docs)
        nx = Counter(r["lang"] for r in docs)
        ny = Counter(r["source"] for r in docs)
        n = len(docs)
        hx = sum(round(-1e9 * (c / n) * math.log(c / n)) for c in nx.values())
        hy = sum(round(-1e9 * (c / n) * math.log(c / n)) for c in ny.values())
        mi = sum(
            round(1e9 * (c / n) * math.log(c * n / (nx[x] * ny[y])))
            for (x, y), c in nxy.items()
        )
        got = ml_theil_u_uncertainty(spark, SF_DIR).collect()[0]
        assert got["n_docs"] == n
        assert got["hx_e9"] == hx
        assert got["hy_e9"] == hy
        assert got["mi_e9"] == mi
        assert got["u_lang_given_source"] == pytest.approx(
            round(mi / hx, 6), abs=1e-9
        )
        # U lives in [0, 1] (up to the e9 fixing)
        assert -1e-6 <= got["u_lang_given_source"] <= 1 + 1e-6

    def test_theil_index_decomposition_domain(self, spark):
        from projeto_de_etl_com_api_do_meta_spark.queries.analytics_r11b import (
            agg_theil_index,
        )

        got = agg_theil_index(spark, SF_DIR).collect()[0]
        # Theil T and L are nonnegative for any distribution
        assert got["theil_t"] >= 0.0
        assert got["theil_l"] >= 0.0
        # and bounded by ln(n)
        assert got["theil_t"] <= math.log(got["n"])

    def test_bartlett_brute(self, spark):
        from projeto_de_etl_com_api_do_meta_spark.queries.analytics_r11b import (
            ml_bartlett_test,
        )

        rows = (
            _events(spark, SF_DIR)
            .where("value IS NOT NULL")
            .selectExpr(
                "event_type AS g", "CAST(round(value * 100) AS BIGINT) AS v"
            )
            .collect()
        )
        groups: dict = {}
        for r in rows:
            groups.setdefault(r["g"], []).append(int(r["v"]))
        terms = []
        for vs in groups.values():
            ni, s, q = len(vs), sum(vs), sum(v * v for v in vs)
            if ni < 2:
                continue
            ss_i = round((ni * q - s * s) / ni)
            lnterm = round(1e9 * (ni - 1) * math.log((ni * q - s * s) / ni / (ni - 1)))
            inv = round(1e12 / (ni - 1))
            terms.append((ni, ss_i, lnterm, inv))
        k = len(terms)
        n_tot = sum(t[0] for t in terms)
        ss_w = sum(t[1] for t in terms)
        sum_ln = sum(t[2] for t in terms)
        sum_inv = sum(t[3] for t in terms)
        want = round(
            (
                (n_tot - k) * math.log(ss_w / (n_tot - k))
                - sum_ln / 1e9
            )
            / (1.0 + (sum_inv / 1e12 - 1.0 / (n_tot - k)) / (3.0 * (k - 1))),
            6,
        )
        got = ml_bartlett_test(spark, SF_DIR).collect()[0]
        assert got["k"] == k and got["n_tot"] == n_tot
        assert got["ss_w"] == ss_w
        assert got["bartlett_t"] == pytest.approx(want, abs=1e-9)
        assert got["bartlett_t"] >= 0.0

    def test_weighted_kappa_identity_rater_is_one(self, spark, tmp_path):
        """If both raters see the same value (zero noise shift would need a
        fixture), at least pin: kappa_w of the real op stays in [-1, 1] and
        num/den are consistent with the returned kappa."""
        from projeto_de_etl_com_api_do_meta_spark.queries.analytics_r11b import (
            ml_cohen_kappa_weighted,
        )

        got = ml_cohen_kappa_weighted(spark, SF_DIR).collect()[0]
        assert -1.0 <= got["kappa_w"] <= 1.0
        want = round(1.0 - got["num"] * got["n"] / got["den"], 6)
        assert got["kappa_w"] == pytest.approx(want, abs=1e-9)

    def test_jarque_bera_brute(self, spark):
        from projeto_de_etl_com_api_do_meta_spark.queries.analytics_r11b import (
            ml_jarque_bera,
        )

        rows = (
            _events(spark, SF_DIR)
            .where("value IS NOT NULL")
            .selectExpr("CAST(round(value) AS BIGINT) AS v")
            .collect()
        )
        vs = [int(r["v"]) for r in rows]
        n = len(vs)
        s1 = sum(vs)
        s2 = sum(v * v for v in vs)
        s3 = sum(v**3 for v in vs)
        s4 = sum(v**4 for v in vs)
        got = ml_jarque_bera(spark, SF_DIR).collect()[0]
        assert (got["n"], got["s1"], got["s2"], got["s3"], got["s4"]) == (
            n,
            s1,
            s2,
            s3,
            s4,
        )
        var = (n * s2 - s1 * s1) / n / n
        g1 = (n * n * s3 - 3.0 * n * s1 * s2 + 2.0 * s1**3) / n**3 / var**1.5
        assert got["skewness"] == pytest.approx(round(g1, 6), abs=1e-6)
        assert got["jb_stat"] >= 0.0

    def test_adamic_adar_brute(self, spark):
        from projeto_de_etl_com_api_do_meta_spark.io import load_table
        from projeto_de_etl_com_api_do_meta_spark.queries.analytics_r11b import (
            graph_adamic_adar,
        )

        orders = load_table(spark, SF_DIR, "orders").collect()
        li = load_table(spark, SF_DIR, "lineitem").collect()
        o2c = {r["o_orderkey"]: r["o_custkey"] for r in orders}
        cp = {(o2c[r["l_orderkey"]], r["l_partkey"]) for r in li}
        from collections import Counter, defaultdict

        dp = Counter(p for _, p in cp)
        by_part = defaultdict(list)
        for c, p in cp:
            by_part[p].append(c)
        scores: dict = {}
        commons: dict = {}
        for p, custs in by_part.items():
            if dp[p] < 2:
                continue
            w = round(1e9 / math.log(dp[p]))
            custs = sorted(custs)
            for i in range(len(custs)):
                for j in range(i + 1, len(custs)):
                    key = (custs[i], custs[j])
                    scores[key] = scores.get(key, 0) + w
                    commons[key] = commons.get(key, 0) + 1
        want = sorted(
            (
                (-s, a, b, commons[(a, b)])
                for (a, b), s in scores.items()
                if commons[(a, b)] >= 3
            ),
        )[:50]
        got = graph_adamic_adar(spark, SF_DIR).collect()
        assert len(got) == len(want)
        for r, (negs, a, b, cn) in zip(got, want):
            assert (r["cust_a"], r["cust_b"]) == (a, b)
            assert r["aa_e9"] == -negs
            assert r["common_parts"] == cn


class TestBatch3:
    def test_dod_codec_golden(self):
        from projeto_de_etl_com_api_do_meta_spark.queries.analytics_r11c import (
            dod_decode,
            dod_encode,
        )

        assert dod_encode([]) == b"\x00"
        assert dod_decode(dod_encode([])) == []
        # regular cadence: dods are all 0 -> one byte each
        ts = [1000, 1060, 1120, 1180, 1240]
        buf = dod_encode(ts)
        # varint(5)=1, varint(1000)=2, zz(60)=120 -> 1 byte, 3 dod zeros
        assert len(buf) == 1 + 2 + 1 + 3
        assert dod_decode(buf) == ts

    def test_dod_codec_randomized(self):
        from projeto_de_etl_com_api_do_meta_spark.queries.analytics_r11c import (
            dod_decode,
            dod_encode,
        )

        rng = random.Random(53)
        for _ in range(300):
            n = rng.randint(0, 60)
            # microsecond-epoch range (the query's grain after the sf0.1
            # epoch()-rounding divergence was fixed)
            ts = sorted(
                rng.randint(1_500_000_000_000_000, 1_800_000_000_000_000)
                for _ in range(n)
            )
            assert dod_decode(dod_encode(ts)) == ts

    def test_dod_analytic_size_matches_encoder(self):
        """The oracle's varint-size CASE must equal the real encoder's
        output length on randomized sorted streams."""
        from projeto_de_etl_com_api_do_meta_spark.queries.analytics_r11c import (
            _varint,
            _zigzag,
            dod_encode,
        )

        def vsize(u):
            for k, lim in enumerate(
                (
                    128,
                    16384,
                    2097152,
                    268435456,
                    34359738368,
                    4398046511104,
                    562949953421312,
                    72057594037927936,
                ),
                1,
            ):
                if u < lim:
                    return k
            return 9

        rng = random.Random(59)
        for _ in range(100):
            n = rng.randint(1, 40)
            ts = sorted(
                rng.randint(1_500_000_000_000_000, 1_800_000_000_000_000)
                for _ in range(n)
            )
            want = vsize(n) + vsize(ts[0])
            if n >= 2:
                want += vsize(_zigzag(ts[1] - ts[0]))
            for i in range(2, n):
                dod = (ts[i] - ts[i - 1]) - (ts[i - 1] - ts[i - 2])
                want += vsize(_zigzag(dod))
            assert len(dod_encode(ts)) == want, ts
            # and the python vsize agrees with the actual varint length
            assert all(
                vsize(u) == len(_varint(u)) for u in (0, 127, 128, 300, 2**20)
            )

    def test_granger_brute(self, spark):
        from projeto_de_etl_com_api_do_meta_spark.queries.analytics_r11c import (
            ml_granger_causality,
        )

        rows = (
            _events(spark, SF_DIR)
            .selectExpr(
                "CAST(ts AS DATE) AS day",
                "CAST(event_type = 'click' AS INT) AS c",
                "CAST(event_type = 'view' AS INT) AS v",
            )
            .groupBy("day")
            .agg({"c": "sum", "v": "sum"})
            .collect()
        )
        srt = sorted(rows, key=lambda r: r["day"])
        xs = [int(r["sum(c)"]) for r in srt]
        ys = [int(r["sum(v)"]) for r in srt]

        def sse_pair(d, r1, r2):
            n = len(d)
            sd, s1, s2 = sum(d), sum(r1), sum(r2)
            sdd = sum(a * a for a in d)
            s11 = sum(a * a for a in r1)
            s22 = sum(a * a for a in r2)
            s12 = sum(a * b for a, b in zip(r1, r2))
            s1d = sum(a * b for a, b in zip(r1, d))
            s2d = sum(a * b for a, b in zip(r2, d))
            sse_r = round(
                1e6
                * (
                    (n * sdd - sd * sd)
                    - (n * s1d - s1 * sd) ** 2 / (n * s11 - s1 * s1)
                )
                / n
                / n
            )
            det = (n * s11 - s1 * s1) * (n * s22 - s2 * s2) - (
                n * s12 - s1 * s2
            ) ** 2
            expl = (
                (n * s22 - s2 * s2) * (n * s1d - s1 * sd) ** 2
                - 2.0 * (n * s12 - s1 * s2) * (n * s1d - s1 * sd) * (n * s2d - s2 * sd)
                + (n * s11 - s1 * s1) * (n * s2d - s2 * sd) ** 2
            ) / det
            sse_u = round(1e6 * ((n * sdd - sd * sd) - expl) / n / n)
            return n, sse_r, sse_u

        got = {r["direction"]: r for r in ml_granger_causality(spark, SF_DIR).collect()}
        # x->y: dependent y_t, r1 = y_{t-1}, r2 = x_{t-1}
        n, sr, su = sse_pair(ys[1:], ys[:-1], xs[:-1])
        assert got["x->y"]["n_pairs"] == n
        assert got["x->y"]["sse_r_e6"] == sr
        assert got["x->y"]["sse_u_e6"] == su
        want_f = round((sr - su) / (su / (n - 3)), 6)
        assert got["x->y"]["granger_f"] == pytest.approx(want_f, abs=1e-9)
        # unrestricted model can never fit worse
        for r in got.values():
            assert r["sse_u_e6"] <= r["sse_r_e6"] + 1  # +1 for e6 rounding
            assert r["granger_f"] >= 0.0

    def test_transfer_entropy_brute(self, spark):
        from collections import Counter

        from projeto_de_etl_com_api_do_meta_spark.queries.analytics_r11c import (
            events_transfer_entropy,
        )

        rows = (
            _events(spark, SF_DIR)
            .selectExpr(
                "CAST(ts AS DATE) AS day",
                "CAST(event_type = 'click' AS INT) AS c",
                "CAST(event_type = 'view' AS INT) AS v",
            )
            .groupBy("day")
            .agg({"c": "sum", "v": "sum"})
            .collect()
        )
        srt = sorted(rows, key=lambda r: r["day"])
        xs = [int(r["sum(c)"]) for r in srt]
        ys = [int(r["sum(v)"]) for r in srt]
        sx = [1 if xs[i] > xs[i - 1] else 0 for i in range(1, len(xs))]
        sy = [1 if ys[i] > ys[i - 1] else 0 for i in range(1, len(ys))]

        def te(target, other):
            joint = Counter(
                (target[i], target[i - 1], other[i - 1])
                for i in range(1, len(target))
            )
            n = sum(joint.values())
            c_t1o1 = Counter()
            c_tt1 = Counter()
            c_t1 = Counter()
            for (t, t1, o1), c in joint.items():
                c_t1o1[(t1, o1)] += c
                c_tt1[(t, t1)] += c
                c_t1[t1] += c
            s = sum(
                round(
                    1e9
                    * (c / n)
                    * math.log(c * c_t1[t1] / (c_t1o1[(t1, o1)] * c_tt1[(t, t1)]))
                )
                for (t, t1, o1), c in joint.items()
            )
            return n, s

        got = {
            r["direction"]: r for r in events_transfer_entropy(spark, SF_DIR).collect()
        }
        n, s = te(sy, sx)
        assert got["x->y"]["n_transitions"] == n
        assert got["x->y"]["te_sum_e9"] == s
        assert got["x->y"]["transfer_entropy"] == pytest.approx(
            round(s / 1e9, 6), abs=1e-9
        )

    def test_partial_correlation_brute(self, spark):
        from projeto_de_etl_com_api_do_meta_spark.queries.analytics_r11c import (
            ml_partial_correlation,
        )

        rows = (
            _events(spark, SF_DIR)
            .selectExpr(
                "CAST(ts AS DATE) AS day",
                "CAST(event_type = 'click' AS INT) AS c",
                "CAST(event_type = 'view' AS INT) AS v",
                "CAST(event_type = 'purchase' AS INT) AS p",
            )
            .groupBy("day")
            .agg({"c": "sum", "v": "sum", "p": "sum"})
            .collect()
        )
        xs = [int(r["sum(c)"]) for r in rows]
        ys = [int(r["sum(v)"]) for r in rows]
        zs = [int(r["sum(p)"]) for r in rows]
        n = len(xs)

        def cm(a, b):
            return n * sum(p * q for p, q in zip(a, b)) - sum(a) * sum(b)

        got = ml_partial_correlation(spark, SF_DIR).collect()[0]
        r_xy = cm(xs, ys) / math.sqrt(cm(xs, xs) * cm(ys, ys))
        assert got["r_xy"] == pytest.approx(round(r_xy, 6), abs=1e-6)
        num = cm(xs, ys) * cm(zs, zs) - cm(xs, zs) * cm(ys, zs)
        den = math.sqrt(
            (cm(xs, xs) * cm(zs, zs) - cm(xs, zs) ** 2)
            * (cm(ys, ys) * cm(zs, zs) - cm(ys, zs) ** 2)
        )
        assert got["partial_r_xy_z"] == pytest.approx(round(num / den, 6), abs=1e-6)
        assert -1.0 <= got["partial_r_xy_z"] <= 1.0


class TestBatch4:
    def test_markov_stationary_brute(self, spark):
        """The 16-iteration integer fold must match a pure-Python replay of
        the same integer arithmetic, and the result must sum to ~1."""
        from collections import Counter

        from projeto_de_etl_com_api_do_meta_spark.queries.analytics_r11d import (
            _MK_STATES,
            events_markov_stationary,
        )

        rows = (
            _events(spark, SF_DIR)
            .selectExpr("user_id", "ts", "event_id", "event_type")
            .collect()
        )
        by_user: dict = {}
        for r in rows:
            by_user.setdefault(r["user_id"], []).append(
                (r["ts"], r["event_id"], r["event_type"])
            )
        trans = Counter()
        for seq in by_user.values():
            seq.sort()
            for (_, _, a), (_, _, b) in zip(seq, seq[1:]):
                trans[(a, b)] += 1
        idx = {s: i for i, s in enumerate(_MK_STATES)}
        c = [[0] * 5 for _ in range(5)]
        for (a, b), n in trans.items():
            c[idx[a]][idx[b]] += n
        p = [
            [((c[i][j] + 1) * 10**12) // (sum(c[i]) + 5) for j in range(5)]
            for i in range(5)
        ]
        v = [200000] * 5
        for _ in range(16):
            v = [
                sum(v[i] * p[i][j] for i in range(5)) // 10**12
                for j in range(5)
            ]
        got = {
            r["state"]: r for r in events_markov_stationary(spark, SF_DIR).collect()
        }
        for j, s in enumerate(_MK_STATES):
            assert got[s]["stationary_e6"] == v[j], s
            assert got[s]["n_transitions_out"] == sum(c[j])
        total = sum(r["stationary_e6"] for r in got.values())
        assert abs(total - 1_000_000) <= 16 * 5  # floor loss per iteration

    def test_prf_excludes_query_terms_and_ranks(self, spark):
        from projeto_de_etl_com_api_do_meta_spark.queries.analytics_r11d import (
            _PRF_TERMS,
            retrieval_prf_expansion,
        )

        rows = retrieval_prf_expansion(spark, SF_DIR).collect()
        assert 1 <= len(rows) <= 10
        for r in rows:
            assert r["term"] not in _PRF_TERMS
            assert len(r["term"]) >= 3
            assert r["n_feedback_docs"] >= 1
        scores = [r["score_micro"] for r in rows]
        assert scores == sorted(scores, reverse=True)


class TestBatch5:
    def test_shapley_brute(self, spark):
        """Exact Shapley values must match a pure-Python coalition replay,
        and efficiency must hold: sum(phi_e24) == 24*(v(full) - v(empty))."""
        from math import factorial

        from projeto_de_etl_com_api_do_meta_spark.queries.analytics_r11e import (
            _SH_CHANNELS,
            events_shapley_attribution,
        )

        rows = (
            _events(spark, SF_DIR)
            .selectExpr("user_id", "ts", "event_id", "event_type")
            .collect()
        )
        by_user: dict = {}
        for r in rows:
            by_user.setdefault(r["user_id"], []).append(
                (r["ts"], r["event_id"], r["event_type"])
            )
        bit = dict(_SH_CHANNELS)
        masks: list[int] = []
        for seq in by_user.values():
            seq.sort()
            types = [t for _, _, t in seq]
            if "purchase" not in types:
                continue
            p = types.index("purchase")
            masks.append(sum({bit[t] for t in types[:p]}))
        v = [sum(1 for m in masks if (m & s) == m) for s in range(16)]
        got = {
            r["channel"]: r
            for r in events_shapley_attribution(spark, SF_DIR).collect()
        }
        assert set(got) == {ch for ch, _ in _SH_CHANNELS}
        total = 0
        for ch, b in _SH_CHANNELS:
            phi24 = sum(
                factorial(bin(s).count("1"))
                * factorial(3 - bin(s).count("1"))
                * (v[s | b] - v[s])
                for s in range(16)
                if not s & b
            )
            assert got[ch]["shapley_e24"] == phi24, ch
            total += phi24
        assert total == 24 * (v[15] - v[0])

    def test_cuped_brute(self, spark):
        import numpy as np

        from projeto_de_etl_com_api_do_meta_spark.queries.analytics_r11e import (
            ml_cuped_adjustment,
        )

        rows = (
            _events(spark, SF_DIR)
            .selectExpr("user_id", "event_type", "value")
            .collect()
        )
        agg: dict = {}
        for r in rows:
            x, y = agg.setdefault(r["user_id"], [0, 0])
            if r["event_type"] in ("view", "click"):
                agg[r["user_id"]][0] += 1
            elif r["event_type"] == "purchase":
                agg[r["user_id"]][1] += int(
                    np.floor(r["value"] * 100.0 + 0.5)
                )
        uid = sorted(agg)
        xs = np.array([agg[u][0] for u in uid], dtype=float)
        ys = np.array([agg[u][1] for u in uid], dtype=float)
        va = np.array([u % 2 == 0 for u in uid])
        n = len(uid)
        cov = n * (xs * ys).sum() - xs.sum() * ys.sum()
        varx = n * (xs * xs).sum() - xs.sum() ** 2
        theta = 0.0 if varx <= 0 else cov / varx
        got = ml_cuped_adjustment(spark, SF_DIR).collect()[0]
        assert got["n_a"] == int(va.sum())
        assert got["n_b"] == n - int(va.sum())
        diff_raw = ys[va].mean() - ys[~va].mean()
        assert got["diff_raw_cents"] == pytest.approx(diff_raw, abs=1e-4)
        assert got["theta"] == pytest.approx(theta, abs=1e-6)
        diff_cuped = diff_raw - theta * (xs[va].mean() - xs[~va].mean())
        assert got["diff_cuped_cents"] == pytest.approx(diff_cuped, abs=1e-4)
        assert 0.0 <= got["rho2"] <= 1.0

    def test_qini_monotone_and_totals(self, spark):
        from projeto_de_etl_com_api_do_meta_spark.queries.analytics_r11e import (
            ml_qini_uplift,
        )

        rows = ml_qini_uplift(spark, SF_DIR).collect()
        assert rows, "qini curve must be non-empty"
        cuts = [r["n_clicks_cut"] for r in rows]
        assert cuts == sorted(cuts, reverse=True)
        for prev, cur in zip(rows, rows[1:]):
            assert cur["cn_t"] >= prev["cn_t"]
            assert cur["cconv_t"] >= prev["cconv_t"]
        last = rows[-1]
        # the last cut covers the whole population
        assert last["cn_t"] + last["cn_c"] > 0
        # qini at full coverage: 1e6*conv_t - floor(1e6*conv_c*n_t/n_c)
        if last["cn_c"]:
            expect = 1_000_000 * last["cconv_t"] - (
                1_000_000 * last["cconv_c"] * last["cn_t"]
            ) // last["cn_c"]
            assert last["qini_micro"] == expect

    def test_eb_shrinkage_brute(self, spark):
        from projeto_de_etl_com_api_do_meta_spark.queries.analytics_r11e import (
            _EB_N_CAMPAIGNS,
            ml_empirical_bayes_ctr,
        )

        rows = (
            _events(spark, SF_DIR)
            .selectExpr("user_id", "event_type")
            .collect()
        )
        n: dict = {}
        x: dict = {}
        for r in rows:
            c = r["user_id"] % _EB_N_CAMPAIGNS
            n[c] = n.get(c, 0) + 1
            if r["event_type"] == "purchase":
                x[c] = x.get(c, 0) + 1
        p = {c: (1_000_000 * x.get(c, 0)) // n[c] for c in n}
        k = len(n)
        m = sum(p.values()) // k
        v = sum((pi - m) ** 2 for pi in p.values()) // k
        kk = 0 if v == 0 else max((m * (1_000_000 - m)) // v - 1, 0)
        got = {r["campaign"]: r for r in ml_empirical_bayes_ctr(spark, SF_DIR).collect()}
        assert set(got) == set(n)
        for c in n:
            assert got[c]["raw_rate_e6"] == p[c], c
            expect = (1_000_000 * x.get(c, 0) + m * kk) // (n[c] + kk)
            assert got[c]["shrunk_rate_e6"] == expect, c
            assert got[c]["prior_strength"] == kk
            # shrinkage pulls toward the prior mean
            lo, hi = min(p[c], m), max(p[c], m)
            assert lo - 1 <= got[c]["shrunk_rate_e6"] <= hi + 1


class TestBatch6:
    def test_hits_brute(self, spark):
        """Integer HITS replay: 4 rounds of sum + floor-normalize to 1e9."""
        from projeto_de_etl_com_api_do_meta_spark.io import load_table
        from projeto_de_etl_com_api_do_meta_spark.queries.analytics_r11f import (
            _HITS_ROUNDS,
            _HITS_TOPK,
            graph_hits_hubs,
        )

        orders = {
            r["o_orderkey"]: r["o_custkey"]
            for r in load_table(spark, SF_DIR, "orders")
            .select("o_orderkey", "o_custkey")
            .collect()
        }
        edges = set()
        for r in (
            load_table(spark, SF_DIR, "lineitem")
            .select("l_orderkey", "l_partkey")
            .collect()
        ):
            if r["l_orderkey"] in orders:
                edges.add((orders[r["l_orderkey"]], r["l_partkey"]))
        h = {c: 1 for c, _ in edges}
        a = {}
        for _ in range(_HITS_ROUNDS):
            a = {}
            for c, p in edges:
                a[p] = a.get(p, 0) + h.get(c, 0)
            asum = sum(a.values())
            a = {p: (10**9 * v) // asum for p, v in a.items()}
            h = {}
            for c, p in edges:
                h[c] = h.get(c, 0) + a.get(p, 0)
            hsum = sum(h.values())
            h = {c: (10**9 * v) // hsum for c, v in h.items()}
        exp_a = sorted(a.items(), key=lambda kv: (-kv[1], kv[0]))[:_HITS_TOPK]
        exp_h = sorted(h.items(), key=lambda kv: (-kv[1], kv[0]))[:_HITS_TOPK]
        got = graph_hits_hubs(spark, SF_DIR).collect()
        got_a = [(r["node_key"], r["score_e9"]) for r in got if r["role"] == "authority"]
        got_h = [(r["node_key"], r["score_e9"]) for r in got if r["role"] == "hub"]
        assert got_a == exp_a
        assert got_h == exp_h

    def test_pacf_brute(self, spark):
        """DL recursion replay from the exact integer ACF path."""
        from collections import Counter

        from projeto_de_etl_com_api_do_meta_spark.queries.analytics_r11f import (
            _PACF_MAX_LAG,
            ml_pacf_durbin_levinson,
        )

        days = Counter(
            r["d"]
            for r in _events(spark, SF_DIR).selectExpr("CAST(ts AS DATE) AS d").collect()
        )
        xs = [days[d] for d in sorted(days)]
        n, s = len(xs), sum(xs)
        cent = [n * x - s for x in xs]
        d2 = sum(r * r for r in cent)
        rho = {}
        for k in range(1, _PACF_MAX_LAG + 1):
            num = sum(cent[t] * cent[t + k] for t in range(n - k)) if n > k else 0
            r_e9 = 0 if d2 == 0 else int(round(num * 1e9 / d2))
            rho[k] = r_e9 / 1e9
        f = {(1, 1): rho[1]}
        for k in range(2, _PACF_MAX_LAG + 1):
            num = rho[k] - sum(f[(k - 1, j)] * rho[k - j] for j in range(1, k))
            den = 1.0 - sum(f[(k - 1, j)] * rho[j] for j in range(1, k))
            f[(k, k)] = 0.0 if den == 0.0 else num / den
            if k < _PACF_MAX_LAG:
                for j in range(1, k):
                    f[(k, j)] = f[(k - 1, j)] - f[(k, k)] * f[(k - 1, k - j)]
        import math

        got = {r["lag"]: r for r in ml_pacf_durbin_levinson(spark, SF_DIR).collect()}
        for k in range(1, _PACF_MAX_LAG + 1):
            exp = int(math.floor(f[(k, k)] * 1e6 + 0.5))
            assert got[k]["pacf_e6"] == exp, k
            assert got[k]["n_days"] == n

    def test_periodicity_brute(self, spark):
        from collections import Counter

        from projeto_de_etl_com_api_do_meta_spark.queries.analytics_r11f import (
            events_hidden_periodicity,
        )

        days = Counter(
            r["d"]
            for r in _events(spark, SF_DIR).selectExpr("CAST(ts AS DATE) AS d").collect()
        )
        xs = [days[d] for d in sorted(days)]
        n, s, sxx = len(xs), sum(xs), sum(x * x for x in xs)
        got = {r["period"]: r for r in events_hidden_periodicity(spark, SF_DIR).collect()}
        assert set(got) == set(range(2, 11))
        for p in range(2, 11):
            sr: dict = {}
            nr: dict = {}
            for t, x in enumerate(xs):
                sr[t % p] = sr.get(t % p, 0) + x
                nr[t % p] = nr.get(t % p, 0) + 1
            fold = sum((1_000_000 * sr[r] * sr[r]) // nr[r] for r in sr)
            ssb = fold - (1_000_000 * s * s) // n
            sst = 1_000_000 * sxx - (1_000_000 * s * s) // n
            assert got[p]["ssb_e6"] == ssb, p
            assert got[p]["sst_e6"] == sst, p
            assert 0 <= got[p]["strength"] <= 1.0 or sst == 0

    def test_cms_brute(self, spark):
        import hashlib
        from collections import Counter

        from projeto_de_etl_com_api_do_meta_spark.queries.analytics_r11f import (
            _CMS_D,
            _CMS_W,
            agg_count_min_sketch,
        )

        uids = [r["user_id"] for r in _events(spark, SF_DIR).select("user_id").collect()]
        true = Counter(uids)

        def bucket(j, uid):
            return int(hashlib.md5(f"{j}:{uid}".encode()).hexdigest()[:8], 16) % _CMS_W

        cells: Counter = Counter()
        for uid, cnt in true.items():
            for j in range(_CMS_D):
                cells[(j, bucket(j, uid))] += cnt
        got = agg_count_min_sketch(spark, SF_DIR).collect()
        assert len(got) == 10
        for r in got:
            uid = r["user_id"]
            est = min(cells[(j, bucket(j, uid))] for j in range(_CMS_D))
            assert r["true_n"] == true[uid]
            assert r["cms_est"] == est
            assert r["overestimate"] == est - true[uid] >= 0


class TestBatch7:
    def test_cdc_brute(self, spark):
        """Pure-Python CDC replay: same charset symbols, same polynomial."""
        import hashlib
        from collections import Counter

        from projeto_de_etl_com_api_do_meta_spark.io import load_table
        from projeto_de_etl_com_api_do_meta_spark.queries.analytics_r11g import (
            _CDC_B,
            _CDC_CHARSET,
            _CDC_M,
            _CDC_MASK,
            _CDC_W,
            dedup_cdc_chunking,
        )

        docs = [
            (r["doc_id"], r["text"].lower())
            for r in load_table(spark, SF_DIR, "documents")
            .select("doc_id", "text")
            .collect()
        ]
        chunk_counts: Counter = Counter()
        chunk_docs: dict = {}
        chunk_len: dict = {}
        total = 0
        for doc_id, text in docs:
            syms = [
                _CDC_CHARSET.find(ch) + 1 for ch in text
            ]  # instr: 1-based, 0 if absent
            bps = set()
            for i in range(_CDC_W, len(text) + 1):
                h = (
                    sum(
                        syms[i - _CDC_W + j - 1] * _CDC_B ** (_CDC_W - j)
                        for j in range(1, _CDC_W + 1)
                    )
                    % _CDC_M
                )
                if h % _CDC_MASK == 0:
                    bps.add(i)
            bps.add(len(text))
            bs = [0] + sorted(bps)
            for k in range(len(bs) - 1):
                c = text[bs[k]: bs[k + 1]]
                if not c:
                    continue
                key = hashlib.md5(c.encode()).hexdigest()
                chunk_counts[key] += 1
                chunk_docs.setdefault(key, set()).add(doc_id)
                chunk_len[key] = len(c)
                total += 1
        got = dedup_cdc_chunking(spark, SF_DIR).collect()[0]
        assert got["total_chunks"] == total
        assert got["distinct_chunks"] == len(chunk_counts)
        assert got["dup_chunks"] == total - len(chunk_counts)
        assert got["total_bytes"] == sum(
            chunk_len[k] * c for k, c in chunk_counts.items()
        )
        assert got["dedup_saved_bytes"] == sum(
            chunk_len[k] * (c - 1) for k, c in chunk_counts.items()
        )
        assert got["cross_doc_chunks"] == sum(
            1 for k in chunk_counts if len(chunk_docs[k]) > 1
        )

    def test_cdc_shift_invariance(self):
        """The CDC property fixed windows lack: a shared passage chunks
        identically after an arbitrary-length prefix shift."""
        import hashlib

        from projeto_de_etl_com_api_do_meta_spark.queries.analytics_r11g import (
            _CDC_B,
            _CDC_CHARSET,
            _CDC_M,
            _CDC_MASK,
            _CDC_W,
        )

        def chunks(text):
            syms = [_CDC_CHARSET.find(ch) + 1 for ch in text]
            bps = {len(text)}
            for i in range(_CDC_W, len(text) + 1):
                h = (
                    sum(
                        syms[i - _CDC_W + j - 1] * _CDC_B ** (_CDC_W - j)
                        for j in range(1, _CDC_W + 1)
                    )
                    % _CDC_M
                )
                if h % _CDC_MASK == 0:
                    bps.add(i)
            bs = [0] + sorted(bps)
            return [
                hashlib.md5(text[a:b].encode()).hexdigest()
                for a, b in zip(bs, bs[1:])
                if b > a
            ]

        shared = "the quick brown fox jumps over the lazy dog " * 8
        c1 = chunks("prefix one " + shared)
        c2 = chunks("a totally different and much longer prefix two " + shared)
        # interior chunks of the shared passage align despite the shift
        assert set(c1) & set(c2), "shifted shared passage must share chunks"

    def test_roaring_brute(self, spark):
        from projeto_de_etl_com_api_do_meta_spark.queries.analytics_r11g import (
            _RB_ARRAY_MAX,
            _RB_CHUNK,
            io_roaring_bitmap_stats,
        )

        rows = (
            _events(spark, SF_DIR)
            .select("event_type", "event_id")
            .distinct()
            .collect()
        )
        per: dict = {}
        for r in rows:
            per.setdefault((r["event_type"], r["event_id"] // _RB_CHUNK), []).append(
                r["event_id"]
            )
        got = {
            (r["event_type"], r["chunk"]): r
            for r in io_roaring_bitmap_stats(spark, SF_DIR).collect()
        }
        assert set(got) == set(per)
        for key, ids in per.items():
            ids.sort()
            runs = sum(
                1 for i, v in enumerate(ids) if i == 0 or ids[i - 1] != v - 1
            )
            n = len(ids)
            r = got[key]
            assert r["n"] == n and r["runs"] == runs
            if 4 * runs + 2 <= min(2 * n, 8192):
                assert r["container"] == "run"
                assert r["container_bytes"] == 4 * runs + 2
            elif n <= _RB_ARRAY_MAX:
                assert r["container"] == "array"
                assert r["container_bytes"] == 2 * n
            else:
                assert r["container"] == "bitmap"
                assert r["container_bytes"] == 8192


class TestBatch8:
    def test_hll_brute(self, spark):
        import hashlib
        import math

        from projeto_de_etl_com_api_do_meta_spark.queries.analytics_r11h import (
            _HLL_ALPHA,
            _HLL_M,
            agg_hyperloglog_exact,
        )

        uids = {r["user_id"] for r in _events(spark, SF_DIR).select("user_id").collect()}
        regs = [0] * _HLL_M
        for uid in uids:
            h = int(hashlib.md5(str(uid).encode()).hexdigest()[:8], 16)
            b, w = h % _HLL_M, h // _HLL_M
            rho = 27 if w == 0 else 27 - w.bit_length()
            regs[b] = max(regs[b], rho)
        z_num = sum(2 ** (32 - m) for m in regs)
        e = _HLL_ALPHA * _HLL_M * _HLL_M * 4294967296.0 / z_num
        v = regs.count(0)
        if e <= 2.5 * _HLL_M and v > 0:
            e = _HLL_M * math.log(_HLL_M / v)
        got = agg_hyperloglog_exact(spark, SF_DIR).collect()[0]
        assert got["z_num"] == z_num
        assert got["v_zero"] == v
        assert got["true_distinct"] == len(uids)
        assert got["estimate_e4"] == int(math.floor(e * 1e4 + 0.5))
        # a 64-register HLL should land within ~26% (2 sigma) of truth
        assert abs(e - len(uids)) / len(uids) < 0.4

    def test_rqa_brute(self, spark):
        from collections import Counter

        from projeto_de_etl_com_api_do_meta_spark.queries.analytics_r11h import (
            events_recurrence_quantification,
        )

        days = Counter(
            r["d"] for r in _events(spark, SF_DIR).selectExpr("CAST(ts AS DATE) AS d").collect()
        )
        xs = [days[d] for d in sorted(days)]
        n = len(xs)
        e = (max(xs) - min(xs)) // 10
        rec = {
            (i, j)
            for i in range(n)
            for j in range(i + 1, n)
            if abs(xs[i] - xs[j]) <= e
        }
        in_lines = sum(
            1
            for (i, j) in rec
            if (i - 1, j - 1) in rec or (i + 1, j + 1) in rec
        )
        got = events_recurrence_quantification(spark, SF_DIR).collect()[0]
        assert got["n_days"] == n
        assert got["eps"] == e
        assert got["n_recurrent"] == len(rec)
        assert got["n_in_lines"] == in_lines
        import math
        assert got["rr_e6"] == int(
            math.floor(2e6 * len(rec) / (n * (n - 1)) + 0.5)
        )

    def test_bwt_brute(self, spark):
        import hashlib

        from projeto_de_etl_com_api_do_meta_spark.io import load_table
        from projeto_de_etl_com_api_do_meta_spark.queries.analytics_r11h import (
            _BWT_DOC_CAP,
            io_bwt_transform,
        )

        docs = {
            r["doc_id"]: r["text"].lower()
            for r in load_table(spark, SF_DIR, "documents")
            .where(f"doc_id < {_BWT_DOC_CAP}")
            .select("doc_id", "text")
            .collect()
        }
        got = {r["doc_id"]: r for r in io_bwt_transform(spark, SF_DIR).collect()}
        assert set(got) == set(docs)

        def runs(s):
            return 0 if not s else 1 + sum(
                1 for a, b in zip(s, s[1:]) if a != b
            )

        for doc_id, text in docs.items():
            rots = sorted(text[i:] + text[:i] for i in range(len(text)))
            bwt = "".join(r[-1] for r in rots) if text else ""
            r = got[doc_id]
            assert r["bwt_md5"] == hashlib.md5(bwt.encode()).hexdigest()
            assert r["runs_before"] == runs(text)
            assert r["runs_after"] == runs(bwt)
            # BWT clusters runs: never (much) worse on these word corpora
            assert r["runs_after"] <= r["runs_before"] + 2

    def test_entropy_rate_brute(self, spark):
        import math
        from collections import Counter

        from projeto_de_etl_com_api_do_meta_spark.queries.analytics_r11d import (
            _MK_STATES,
        )
        from projeto_de_etl_com_api_do_meta_spark.queries.analytics_r11h import (
            events_markov_entropy_rate,
        )

        rows = (
            _events(spark, SF_DIR)
            .selectExpr("user_id", "ts", "event_id", "event_type")
            .collect()
        )
        by_user: dict = {}
        for r in rows:
            by_user.setdefault(r["user_id"], []).append(
                (r["ts"], r["event_id"], r["event_type"])
            )
        trans = Counter()
        for seq in by_user.values():
            seq.sort()
            for (_, _, a), (_, _, b) in zip(seq, seq[1:]):
                trans[(a, b)] += 1
        idx = {s: i for i, s in enumerate(_MK_STATES)}
        c = [[0] * 5 for _ in range(5)]
        for (a, b), k in trans.items():
            c[idx[a]][idx[b]] += k
        p = [
            [((c[i][j] + 1) * 10**12) // (sum(c[i]) + 5) for j in range(5)]
            for i in range(5)
        ]
        v = [200000] * 5
        for _ in range(16):
            v = [
                sum(v[i] * p[i][j] for i in range(5)) // 10**12
                for j in range(5)
            ]
        h = 0.0
        for i in range(5):
            for j in range(5):
                pij = p[i][j] / 1e12
                pi = v[i] / 1e6
                h += pi * pij * math.log(pij)
        got = events_markov_entropy_rate(spark, SF_DIR).collect()[0]
        assert got["n_transitions"] == sum(trans.values())
        assert got["entropy_rate_nats_e6"] == int(math.floor(-h * 1e6 + 0.5))
        assert 0 < got["entropy_rate_nats_e6"] <= int(math.log(5) * 1e6) + 1


class TestBatch9:
    def _daily(self, spark):
        from collections import Counter

        cx, cy = Counter(), Counter()
        for r in _events(spark, SF_DIR).selectExpr(
            "CAST(ts AS DATE) AS d", "event_type"
        ).collect():
            if r["event_type"] == "click":
                cx[r["d"]] += 1
            elif r["event_type"] == "purchase":
                cy[r["d"]] += 1
        days = sorted(set(cx) | set(cy) | {
            r["d"] for r in _events(spark, SF_DIR).selectExpr("CAST(ts AS DATE) AS d").distinct().collect()
        })
        return days, [cx[d] for d in days], [cy[d] for d in days]

    def test_xicor_brute(self, spark):
        from projeto_de_etl_com_api_do_meta_spark.queries.analytics_r11i import (
            ml_xicor_correlation,
        )

        days, xs, ys = self._daily(spark)
        n = len(days)

        def xi(x, y):
            order = sorted(range(n), key=lambda i: (x[i], days[i]))
            r = [sum(1 for j in range(n) if y[j] <= y[i]) for i in range(n)]
            el = [sum(1 for j in range(n) if y[j] >= y[i]) for i in range(n)]
            num = n * sum(
                abs(r[order[k + 1]] - r[order[k]]) for k in range(n - 1)
            )
            den = 2 * sum(l * (n - l) for l in el)
            return 0 if den == 0 else 1_000_000 - (1_000_000 * num) // den

        got = {r["direction"]: r for r in ml_xicor_correlation(spark, SF_DIR).collect()}
        assert got["clicks_to_purchases"]["xi_e6"] == xi(xs, ys)
        assert got["purchases_to_clicks"]["xi_e6"] == xi(ys, xs)
        assert got["clicks_to_purchases"]["n_days"] == n

    def test_tail_dependence_brute(self, spark):
        import numpy as np

        from projeto_de_etl_com_api_do_meta_spark.queries.analytics_r11i import (
            ml_tail_dependence,
        )

        agg: dict = {}
        for r in _events(spark, SF_DIR).selectExpr(
            "user_id", "event_type", "value"
        ).collect():
            x, y = agg.setdefault(r["user_id"], [0, 0])
            if r["event_type"] in ("view", "click"):
                agg[r["user_id"]][0] += 1
            elif r["event_type"] == "purchase":
                agg[r["user_id"]][1] += int(np.floor(r["value"] * 100 + 0.5))
        xs = sorted(v[0] for v in agg.values())
        ys = sorted(v[1] // 100 for v in agg.values())
        n = len(xs)

        def order_stat(vals, k):
            return vals[k - 1]  # k-th smallest, 1-based

        k_hi = (9 * n + 9) // 10
        k_lo = (n + 9) // 10
        tx_hi, ty_hi = order_stat(xs, k_hi), order_stat(ys, k_hi)
        tx_lo, ty_lo = order_stat(xs, k_lo), order_stat(ys, k_lo)
        got = ml_tail_dependence(spark, SF_DIR).collect()[0]
        assert (got["tx_hi"], got["ty_hi"]) == (tx_hi, ty_hi)
        assert (got["tx_lo"], got["ty_lo"]) == (tx_lo, ty_lo)
        nx = sum(1 for v in agg.values() if v[0] > tx_hi)
        nj = sum(1 for v in agg.values() if v[0] > tx_hi and v[1] // 100 > ty_hi)
        assert got["nx_hi"] == nx and got["nj_hi"] == nj
        if nx:
            assert got["lambda_upper_e6"] == (1_000_000 * nj) // nx

    def test_allan_brute(self, spark):
        from collections import Counter

        from projeto_de_etl_com_api_do_meta_spark.queries.analytics_r11i import (
            _AV_TAUS,
            events_allan_variance,
        )

        days = Counter(
            r["d"] for r in _events(spark, SF_DIR).selectExpr("CAST(ts AS DATE) AS d").collect()
        )
        xs = [days[d] for d in sorted(days)]
        got = {r["tau"]: r for r in events_allan_variance(spark, SF_DIR).collect()}
        assert set(got) == set(_AV_TAUS)
        for tau in _AV_TAUS:
            m = [
                (1_000_000 * sum(xs[b * tau:(b + 1) * tau])) // tau
                for b in range(len(xs) // tau)
            ]
            diffs = [m[k + 1] - m[k] for k in range(len(m) - 1)]
            avar = 0 if not diffs else sum(d * d for d in diffs) // (2 * len(diffs))
            assert got[tau]["m_blocks"] == len(m), tau
            assert got[tau]["avar_e12"] == avar, tau

    def test_cindex_brute(self, spark):
        import datetime as dt

        from projeto_de_etl_com_api_do_meta_spark.queries.analytics_r11i import (
            ml_survival_cindex,
        )

        rows = _events(spark, SF_DIR).selectExpr(
            "user_id", "ts", "event_type"
        ).collect()
        signup: dict = {}
        for r in rows:
            if r["event_type"] == "signup":
                if r["user_id"] not in signup or r["ts"] < signup[r["user_id"]]:
                    signup[r["user_id"]] = r["ts"]
        max_d = max(r["ts"] for r in rows).date()
        purch: dict = {}
        for r in rows:
            u = r["user_id"]
            if (
                r["event_type"] == "purchase"
                and u in signup
                and r["ts"] >= signup[u]
            ):
                if u not in purch or r["ts"] < purch[u]:
                    purch[u] = r["ts"]
        score: dict = {}
        for r in rows:
            if r["event_type"] in ("view", "click"):
                score[r["user_id"]] = score.get(r["user_id"], 0) + 1
        subj = []
        for u, sts in signup.items():
            if u in purch:
                subj.append(((purch[u].date() - sts.date()).days, 1, score.get(u, 0)))
            else:
                subj.append(((max_d - sts.date()).days, 0, score.get(u, 0)))
        comp = conc = ties = 0
        for (ti, evi, si) in subj:
            if evi != 1:
                continue
            for (tj, _, sj) in subj:
                if tj > ti:
                    comp += 1
                    if si > sj:
                        conc += 1
                    elif si == sj:
                        ties += 1
        got = ml_survival_cindex(spark, SF_DIR).collect()[0]
        assert got["n_subjects"] == len(subj)
        assert got["comparable"] == comp
        assert got["concordant"] == conc
        assert got["tied_score"] == ties
        if comp:
            assert got["cindex_e6"] == (1_000_000 * (2 * conc + ties)) // (2 * comp)


class TestBatch10:
    def test_sax_brute(self, spark):
        import math
        from collections import Counter

        from projeto_de_etl_com_api_do_meta_spark.queries.analytics_r11j import (
            _SAX_BREAKS,
            _SAX_SEGMENTS,
            events_sax_symbolic,
        )

        per: dict = {}
        for r in _events(spark, SF_DIR).selectExpr(
            "event_type", "CAST(ts AS DATE) AS d"
        ).collect():
            per.setdefault(r["event_type"], Counter())[r["d"]] += 1
        got = {r["event_type"]: r for r in events_sax_symbolic(spark, SF_DIR).collect()}
        assert set(got) == set(per)
        for g, days in per.items():
            xs = [days[d] for d in sorted(days)]
            n, s = len(xs), sum(xs)
            sxx = sum(x * x for x in xs)
            segs: dict = {}
            for t, x in enumerate(xs):
                k = (t * _SAX_SEGMENTS) // n
                a, b = segs.get(k, (0, 0))
                segs[k] = (a + x, b + 1)
            word = ""
            for k in sorted(segs):
                ssum, scnt = segs[k]
                paa = ((1_000_000 * ssum) // scnt) / 1e6
                var = (n * sxx - s * s) / (n * n)
                z = 0.0 if n * sxx - s * s <= 0 else (paa - s / n) / math.sqrt(var)
                word += (
                    "a" if z < _SAX_BREAKS[0]
                    else "b" if z < _SAX_BREAKS[1]
                    else "c" if z < _SAX_BREAKS[2]
                    else "d"
                )
            assert got[g]["sax_word"] == word, g
            assert got[g]["n_days"] == n

    def test_matrix_profile_brute(self, spark):
        from collections import Counter

        from projeto_de_etl_com_api_do_meta_spark.queries.analytics_r11j import (
            _MP_EXCL,
            _MP_M,
            events_matrix_profile,
        )

        days = Counter(
            r["d"] for r in _events(spark, SF_DIR).selectExpr("CAST(ts AS DATE) AS d").collect()
        )
        xs = [days[d] for d in sorted(days)]
        n = len(xs)
        nwin = n - _MP_M + 1
        got = {r["window_start"]: r for r in events_matrix_profile(spark, SF_DIR).collect()}
        assert set(got) == set(range(1, nwin + 1))
        profile = {}
        for i in range(1, nwin + 1):
            best = None
            for j in range(1, nwin + 1):
                if abs(j - i) <= _MP_EXCL:
                    continue
                d = sum(
                    (xs[i - 1 + k] - xs[j - 1 + k]) ** 2 for k in range(_MP_M)
                )
                if best is None or d < best[0] or (d == best[0] and j < best[1]):
                    best = (d, j)
            profile[i] = best
            assert got[i]["nn_sq_dist"] == best[0], i
            assert got[i]["nn_start"] == best[1], i
        gmin = min(v[0] for v in profile.values())
        gmax = max(v[0] for v in profile.values())
        for i in profile:
            assert got[i]["is_motif"] == (1 if profile[i][0] == gmin else 0)
            assert got[i]["is_discord"] == (1 if profile[i][0] == gmax else 0)


class TestBatch11:
    def test_platt_newton_brute(self, spark):
        """Replay the 8 Newton iterations in pure Python from the exact
        per-score cells; the fitted curve must also genuinely calibrate
        (monotone in score when the data are monotone)."""
        import math

        from projeto_de_etl_com_api_do_meta_spark.queries.analytics_r11k import (
            _PL_ITERS,
            _PL_PROBES,
            ml_platt_scaling,
        )

        agg: dict = {}
        for r in _events(spark, SF_DIR).selectExpr(
            "user_id", "event_type"
        ).collect():
            s, y = agg.setdefault(r["user_id"], [0, 0])
            if r["event_type"] in ("view", "click"):
                agg[r["user_id"]][0] += 1
            elif r["event_type"] == "purchase":
                agg[r["user_id"]][1] = 1
        cells: dict = {}
        for s, y in agg.values():
            pos, neg = cells.get(s, (0, 0))
            cells[s] = (pos + y, neg + (1 - y))
        cl = sorted((float(s), float(p), float(n)) for s, (p, n) in cells.items())
        n_pos = sum(p for _, p, _ in cl)
        n_neg = sum(n for _, _, n in cl)
        a, b = 0.0, math.log((n_neg + 1.0) / (n_pos + 1.0))
        for _ in range(_PL_ITERS):
            g1 = g2 = h11 = h12 = h22 = 0.0
            for s, pos, neg in cl:
                p = 1.0 / (1.0 + math.exp(-(a * s + b)))
                w = (pos + neg) * p * (1.0 - p)
                r_ = (pos + neg) * p - pos
                g1 += r_ * s
                g2 += r_
                h11 += w * s * s
                h12 += w * s
                h22 += w
            det = h11 * h22 - h12 * h12
            if det != 0.0:
                a, b = a - (g1 * h22 - g2 * h12) / det, b - (
                    g2 * h11 - g1 * h12
                ) / det
        got = ml_platt_scaling(spark, SF_DIR).collect()[0]
        assert got["n_pos"] == int(n_pos) and got["n_neg"] == int(n_neg)
        assert got["a_e6"] == int(math.floor(a * 1e6 + 0.5))
        assert got["b_e6"] == int(math.floor(b * 1e6 + 0.5))
        for s in _PL_PROBES:
            exp = int(
                math.floor(1e6 / (1.0 + math.exp(-(a * s + b))) + 0.5)
            )
            assert got[f"p_cal_s{s}_e6"] == exp
        # Newton must have converged to a stationary point: one more
        # gradient evaluation is ~zero relative to the Hessian scale
        g1 = g2 = 0.0
        for s, pos, neg in cl:
            p = 1.0 / (1.0 + math.exp(-(a * s + b)))
            g1 += ((pos + neg) * p - pos) * s
            g2 += (pos + neg) * p - pos
        assert abs(g2) < 1e-6 * max(1.0, n_pos + n_neg)


class TestBatch12:
    def test_bradley_terry_brute(self, spark):
        from collections import Counter

        from projeto_de_etl_com_api_do_meta_spark.queries.analytics_r11d import (
            _MK_STATES,
        )
        from projeto_de_etl_com_api_do_meta_spark.queries.analytics_r11l import (
            _BT_ITERS,
            _BT_K,
            ml_bradley_terry,
        )

        daily: dict = {}
        for r in _events(spark, SF_DIR).selectExpr(
            "CAST(ts AS DATE) AS d", "event_type"
        ).collect():
            daily.setdefault(r["d"], Counter())[r["event_type"]] += 1
        w = [[0] * _BT_K for _ in range(_BT_K)]
        for cnts in daily.values():
            for a in range(_BT_K):
                for b in range(_BT_K):
                    if a != b and cnts[_MK_STATES[a]] > cnts[_MK_STATES[b]]:
                        w[a][b] += 1
        pi = [1.0 / _BT_K] * _BT_K
        for _ in range(_BT_ITERS):
            raw = []
            for i in range(_BT_K):
                wi = sum(w[i][j] for j in range(_BT_K) if j != i)
                den = sum(
                    0.0
                    if pi[i] + pi[j] == 0.0
                    else (w[i][j] + w[j][i]) / (pi[i] + pi[j])
                    for j in range(_BT_K)
                    if j != i
                )
                raw.append(pi[i] if den == 0.0 else wi / den)
            tot = sum(raw)
            pi = raw if tot == 0.0 else [r_ / tot for r_ in raw]
        import math

        got = {r["event_type"]: r for r in ml_bradley_terry(spark, SF_DIR).collect()}
        assert set(got) == set(_MK_STATES)
        for i, s in enumerate(_MK_STATES):
            assert got[s]["wins"] == sum(w[i][j] for j in range(_BT_K) if j != i)
            assert got[s]["strength_e6"] == int(math.floor(pi[i] * 1e6 + 0.5)), s
        # strengths are a probability vector
        total = sum(r["strength_e6"] for r in got.values())
        assert abs(total - 1_000_000) <= _BT_K


class TestBatch13:
    def test_good_turing_brute(self, spark):
        from collections import Counter

        from projeto_de_etl_com_api_do_meta_spark.io import load_table
        from projeto_de_etl_com_api_do_meta_spark.queries.analytics_r11m import (
            _GT_MAX_R,
            corpus_good_turing,
        )

        tc: Counter = Counter()
        for r in load_table(spark, SF_DIR, "documents").select("text").collect():
            t = r["text"].strip().lower()
            if t:
                tc.update(t.split())
        nr: Counter = Counter(tc.values())
        n_tokens = sum(r_ * c for r_, c in nr.items())
        vocab = sum(nr.values())
        got = {r["r"]: r for r in corpus_good_turing(spark, SF_DIR).collect()}
        expect_rs = sorted(nr)[:_GT_MAX_R]
        assert sorted(got) == expect_rs
        for r_ in expect_rs:
            row = got[r_]
            assert row["n_r"] == nr[r_]
            exp_star = (
                0
                if (r_ + 1) not in nr
                else ((r_ + 1) * 1_000_000 * nr[r_ + 1]) // nr[r_]
            )
            assert row["r_star_e6"] == exp_star, r_
            assert row["n_tokens"] == n_tokens and row["vocab"] == vocab
            assert row["p_unseen_e6"] == (
                0 if n_tokens == 0 else (1_000_000 * nr.get(1, 0)) // n_tokens
            )
