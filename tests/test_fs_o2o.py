"""Semantic pins for the Fellegi–Sunter EM and one-to-one assignment
queries (this session's ER additions):

- ``er_fs_em`` — m/u/λ and log2 weights must equal an INDEPENDENT
  pair-level EM recompute in plain Python (the query aggregates the
  2^F pattern census first; the recompute iterates raw pairs, a
  different summation order — agreement to ~1e-9 proves the census
  collapse is exact, not an approximation), and on the fixture the
  m-probability must dominate u for every feature (the unsupervised
  learner actually separates matches from non-matches).
- ``er_one_to_one`` — the output must be a matching (no endpoint twice),
  must exactly equal a plain-Python replay of the same fixed-round
  locally-dominant algorithm INCLUDING per-round attribution, and every
  matched edge must belong to the sequential greedy maximum-weight
  matching (locally-dominant rounds are a prefix of greedy under a
  strict total order).
"""

from __future__ import annotations

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from blink_spark import er_queries, scoring

SF_DIR = "/root/testdata/sf0.001"


def _scored_rows(spark):
    cols = [c for c, _ in er_queries.FS_FEATURES]
    return (
        er_queries._scored(spark, SF_DIR)
        .select("left_id", "right_id", "match_p", *cols)
        .collect()
    )


def test_fs_em_matches_pair_level_python_recompute(spark):
    rows = _scored_rows(spark)
    nf = len(er_queries.FS_FEATURES)
    agrees = [
        tuple(
            float(r[c]) >= t for c, t in er_queries.FS_FEATURES
        )
        for r in rows
    ]
    lam = er_queries.FS_LAM0
    m = [er_queries.FS_M0] * nf
    u = [er_queries.FS_U0] * nf
    for _ in range(er_queries.FS_ITERS):
        sum_n = sum_rn = sum_un = 0.0
        am, au = [0.0] * nf, [0.0] * nf
        for a in agrees:  # pair-level (not census-level) — independent order
            pm, pu = lam, 1.0 - lam
            for i in range(nf):
                pm *= m[i] if a[i] else 1.0 - m[i]
                pu *= u[i] if a[i] else 1.0 - u[i]
            r = pm / (pm + pu)
            sum_n += 1.0
            sum_rn += r
            sum_un += 1.0 - r
            for i in range(nf):
                if a[i]:
                    am[i] += r
                    au[i] += 1.0 - r
        lam = sum_rn / sum_n
        m = [
            max(min(am[i] / sum_rn, er_queries.FS_PMAX), er_queries.FS_PMIN)
            for i in range(nf)
        ]
        u = [
            max(min(au[i] / sum_un, er_queries.FS_PMAX), er_queries.FS_PMIN)
            for i in range(nf)
        ]

    got = {r.feature: r for r in er_queries.q_er_fs_em(spark, SF_DIR).collect()}
    assert set(got) == {c for c, _ in er_queries.FS_FEATURES}
    tol = 2e-6  # query output is rounded to 6dp
    for i, (name, _) in enumerate(er_queries.FS_FEATURES):
        g = got[name]
        assert abs(g.m - m[i]) < tol, (name, g.m, m[i])
        assert abs(g.u - u[i]) < tol, (name, g.u, u[i])
        assert abs(g.w_agree - math.log2(m[i] / u[i])) < tol
        assert abs(
            g.w_disagree - math.log2((1.0 - m[i]) / (1.0 - u[i]))
        ) < tol
        assert abs(g.lam - lam) < tol


def test_fs_em_separates_matches_on_fixture(spark):
    got = {r.feature: r for r in er_queries.q_er_fs_em(spark, SF_DIR).collect()}
    for name, r in got.items():
        assert r.m > r.u, (name, r.m, r.u)  # agreement is evidence FOR a match
        assert r.w_agree > 0.0 > r.w_disagree, name
        assert 0.0 < r.lam < 1.0


def test_fs_posteriors_match_python_recompute(spark):
    rows = _scored_rows(spark)
    nf = len(er_queries.FS_FEATURES)
    census = {}
    for r in rows:
        a = tuple(float(r[c]) >= t for c, t in er_queries.FS_FEATURES)
        n, nl = census.get(a, (0, 0))
        census[a] = (n + 1, nl + (float(r.match_p) >= scoring.MATCH_TAU))
    lam, m, u = er_queries._fs_em_params(
        [(a, float(n)) for a, (n, _) in census.items()]
    )
    got = er_queries.q_er_fs_posteriors(spark, SF_DIR).collect()
    assert len(got) == len(census)
    assert sum(r.n_pairs for r in got) == len(rows)
    for r in got:
        a = tuple(bool(r[f"agree_{c}"]) for c, _ in er_queries.FS_FEATURES)
        n, nl = census[a]
        assert r.n_pairs == n
        assert r.n_logistic_match == nl
        post = er_queries._fs_posterior(list(a), lam, m, u)
        assert abs(r.fs_posterior - post) < 2e-6
        assert r.fs_match == (post >= 0.5)
    # on the fixture the unsupervised and supervised decisions agree on
    # the all-agree and all-disagree patterns (the bulk of the mass)
    for r in got:
        ags = [bool(r[f"agree_{c}"]) for c, _ in er_queries.FS_FEATURES]
        if all(ags):
            assert r.fs_match and r.n_logistic_match == r.n_pairs
        if not any(ags):
            assert not r.fs_match and r.n_logistic_match == 0


def test_fs_tf_matches_python_recompute(spark):
    from blink_spark import blocking

    reps = blocking.representatives(
        er_queries._with_sig(spark, SF_DIR)
    ).select("path_stem").collect()
    counts = {}
    for r in reps:
        counts[r.path_stem] = counts.get(r.path_stem, 0) + 1
    n = float(sum(counts.values()))
    u = sum((c / n) ** 2 for c in counts.values())
    got = {r.path_stem: r for r in er_queries.q_er_fs_tf(spark, SF_DIR).collect()}
    assert set(got) == set(counts)
    tol = 2e-6
    for stem, c in counts.items():
        g = got[stem]
        assert g.n_records == c
        assert abs(g.tf - c / n) < tol
        assert abs(g.tf_adjustment - math.log2(u / (c / n))) < tol
        # rare stems gain weight, common ones lose it
        assert (g.tf_adjustment > 0) == (c / n < u) or abs(c / n - u) < tol
    assert abs(sum(c / n for c in counts.values()) - 1.0) < 1e-9


def test_fs_em_params_metamorphic_invariances():
    # EM on pattern censuses must be invariant to (a) scaling every count
    # by a power of two (exact in IEEE arithmetic) and (b) pattern order
    # (approximately — summation order changes)
    patterns = [
        ((True, True, True, True), 900.0),
        ((True, True, False, True), 120.0),
        ((False, False, False, False), 2000.0),
        ((False, True, False, False), 300.0),
        ((True, False, False, True), 7.0),
    ]
    lam, m, u = er_queries._fs_em_params(patterns)
    lam4, m4, u4 = er_queries._fs_em_params(
        [(a, n * 4.0) for a, n in patterns]
    )
    assert (lam4, m4, u4) == (lam, m, u)  # exact: 4x scales sums exactly
    lamr, mr, ur = er_queries._fs_em_params(list(reversed(patterns)))
    assert abs(lamr - lam) < 1e-12
    assert all(abs(a - b) < 1e-12 for a, b in zip(mr + ur, m + u))


def test_golden_record_matches_python_survivorship(spark):
    clusters = {
        r.file_id: r.cluster_id
        for r in er_queries._clusters(spark, SF_DIR).collect()
    }
    ing = er_queries._ingested(spark, SF_DIR).select(
        "file_id", "repo", "path", "commit", "lang", "n_tokens"
    ).collect()
    members = {}
    for r in ing:
        members.setdefault(clusters[r.file_id], []).append(r)
    got = {
        r.cluster_id: r
        for r in er_queries.q_er_golden_record(spark, SF_DIR).collect()
    }
    expected_ids = {cid for cid, ms in members.items() if len(ms) >= 2}
    assert set(got) == expected_ids
    for cid in expected_ids:
        ms = members[cid]
        g = got[cid]
        assert g.n_members == len(ms)
        assert g.n_repos == len({r.repo for r in ms})
        assert g.latest_commit == max(r.commit for r in ms)
        lang_counts = {}
        for r in ms:
            lang_counts[r.lang] = lang_counts.get(r.lang, 0) + 1
        assert g.lang == min(
            lang_counts, key=lambda v: (-lang_counts[v], v)
        )
        best = min(ms, key=lambda r: (-r.n_tokens, r.file_id))
        assert g.canonical_path == best.path
        assert g.canonical_n_tokens == best.n_tokens


def _python_locally_dominant(edges, rounds):
    """Replay q_er_one_to_one's fixed-round algorithm in plain Python.

    ``edges``: {(l, r): p} with l < r.  Returns {(l, r): round}.
    """
    matched = {}
    live = dict(edges)
    for rnd in range(1, rounds + 1):
        best = {}
        for (l, r), p in live.items():
            for node, partner in ((l, r), (r, l)):
                cur = best.get(node)
                # rank-1 under (match_p DESC, partner ASC)
                if cur is None or (-p, partner) < (-cur[0], cur[1]):
                    best[node] = (p, partner)
        this_round = [
            (l, r)
            for (l, r) in live
            if best[l][1] == r and best[r][1] == l
        ]
        gone = set()
        for l, r in this_round:
            matched[(l, r)] = rnd
            gone.add(l)
            gone.add(r)
        live = {
            e: p for e, p in live.items() if e[0] not in gone and e[1] not in gone
        }
    return matched


def test_one_to_one_matches_python_replay_and_greedy(spark):
    rows = _scored_rows(spark)
    edges = {
        (r.left_id, r.right_id): float(r.match_p)
        for r in rows
        if float(r.match_p) >= scoring.MATCH_TAU
    }
    assert edges, "fixture must produce thresholded edges"
    expected = _python_locally_dominant(edges, er_queries.O2O_ROUNDS)

    out = er_queries.q_er_one_to_one(spark, SF_DIR).collect()
    got = {(r.left_id, r.right_id): r.match_round for r in out}

    # exact parity with the Python replay, per-round attribution included
    assert got == expected

    # it is a matching: no endpoint appears twice
    seen = set()
    for l, r in got:
        assert l not in seen and r not in seen
        seen.add(l)
        seen.add(r)

    # every matched edge belongs to the sequential greedy matching
    greedy, taken = set(), set()
    for (l, r), p in sorted(edges.items(), key=lambda kv: (-kv[1], kv[0])):
        if l not in taken and r not in taken:
            greedy.add((l, r))
            taken.add(l)
            taken.add(r)
    assert set(got) <= greedy


def test_model_disagreement_consistent_with_posterior_table(spark):
    """The pair-level disagreement queue must reconcile exactly with the
    pattern-level agreement table: per pattern, the number of emitted
    pairs equals n_pairs - n_logistic_match when FS says match, and
    n_logistic_match when FS says non-match; every emitted row carries
    the pattern's posterior and a genuine decision conflict."""
    pats = {
        tuple(bool(r[f"agree_{c}"]) for c, _ in er_queries.FS_FEATURES): r
        for r in er_queries.q_er_fs_posteriors(spark, SF_DIR).collect()
    }
    got = er_queries.q_er_model_disagreement(spark, SF_DIR).collect()
    per_pattern: dict[tuple, int] = {}
    for r in got:
        a = tuple(bool(r[f"agree_{c}"]) for c, _ in er_queries.FS_FEATURES)
        per_pattern[a] = per_pattern.get(a, 0) + 1
        p = pats[a]
        assert abs(r.fs_posterior - p.fs_posterior) < 2e-6
        assert r.fs_match == p.fs_match
        assert r.logistic_match != r.fs_match
        assert r.logistic_match == (
            float(r.match_p) >= scoring.MATCH_TAU - 1e-9
        )
    for a, p in pats.items():
        expected = (
            p.n_pairs - p.n_logistic_match if p.fs_match else p.n_logistic_match
        )
        assert per_pattern.get(a, 0) == expected, a
    # no duplicate pairs in the queue
    keys = [(r.left_id, r.right_id) for r in got]
    assert len(keys) == len(set(keys))


def test_fs_waterfall_reconciles_with_em_and_posteriors(spark):
    """Every waterfall row must decompose consistently: feature terms
    carry exactly er_fs_em's w_agree/w_disagree per the agree flag, the
    running cum is the left-fold of prior + weights, and 2^total odds
    reproduce er_fs_posteriors' pattern posterior."""
    import math

    em = {r.feature: r for r in er_queries.q_er_fs_em(spark, SF_DIR).collect()}
    lam = next(iter(em.values())).lam
    posts = {
        "".join(
            "T" if r[f"agree_{c}"] else "F" for c, _ in er_queries.FS_FEATURES
        ): r
        for r in er_queries.q_er_fs_posteriors(spark, SF_DIR).collect()
    }
    wf = er_queries.q_er_fs_waterfall(spark, SF_DIR).collect()
    by_pat: dict[str, list] = {}
    for r in wf:
        by_pat.setdefault(r.pattern, []).append(r)
    assert set(by_pat) == set(posts)
    tol = 5e-6  # both sides rounded to 6dp
    for pat, rows in by_pat.items():
        rows.sort(key=lambda r: r.term_index)
        assert [r.term for r in rows] == ["prior"] + [
            c for c, _ in er_queries.FS_FEATURES
        ]
        assert abs(rows[0].log2_weight - math.log2(lam / (1 - lam))) < tol
        assert rows[0].agree == ""
        cum = rows[0].log2_weight
        for i, (name, _) in enumerate(er_queries.FS_FEATURES):
            r = rows[i + 1]
            expected_w = (
                em[name].w_agree if pat[i] == "T" else em[name].w_disagree
            )
            assert r.agree == pat[i]
            assert abs(r.log2_weight - expected_w) < tol
            cum += r.log2_weight
            assert abs(r.cum_log_odds - cum) < tol
        odds = 2.0 ** rows[-1].cum_log_odds
        assert abs(rows[0].fs_posterior - odds / (1 + odds)) < tol
        assert abs(rows[0].fs_posterior - posts[pat].fs_posterior) < tol
        assert all(abs(r.fs_posterior - rows[0].fs_posterior) < 1e-12 for r in rows)
        assert rows[0].n_pairs == posts[pat].n_pairs
