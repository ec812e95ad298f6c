"""Semantic pins for the graph/blocking diagnostics added this session:

- ``er_blocking_rules`` — every reported count must equal an independent
  plain-Python recompute from the raw (file_id, block_key) membership and
  rep-level gold labels (the query routes pair-sets through the capped
  ``blocking.candidate_pairs`` machinery; the replay builds them naively —
  agreement proves the cap/salt path drops or invents nothing), and the
  union recall must decompose: shared + unique-per-rule = union.
- ``er_threshold_clusters`` — per-threshold cluster metrics must equal a
  plain union-find replay over the same thresholded edges (an entirely
  different closure algorithm from large-star/small-star), and the sweep
  must be monotone in the threshold where mathematics demands it.
- ``er_triangles`` — wedge/triangle counts must equal a brute-force
  adjacency-set recompute per cluster, and 3T ≤ W must hold row-wise
  (every triangle closes exactly three wedges).
"""

from __future__ import annotations

import os
import sys
from itertools import combinations

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from blink_spark import blocking, er_queries

SF_DIR = "/root/testdata/sf0.001"


def test_blocking_rules_match_python_recompute(spark):
    memb = er_queries._membership(spark, SF_DIR).select(
        "file_id", "block_key"
    ).collect()
    gold = {
        r.file_id: r.gold_cluster
        for r in er_queries._rep_gold(spark, SF_DIR).collect()
    }
    rule_of = lambda k: "composite_key" if k.startswith("ck:") else "minhash_band"  # noqa: E731
    blocks: dict[tuple[str, str], list[str]] = {}
    for r in memb:
        blocks.setdefault((rule_of(r.block_key), r.block_key), []).append(
            r.file_id
        )
    exp = {
        rule: dict(n_blocks=0, n_pair_slots=0, pairs=set())
        for rule in ("composite_key", "minhash_band")
    }
    for (rule, _), members in blocks.items():
        e = exp[rule]
        e["n_blocks"] += 1
        n = len(members)
        e["n_pair_slots"] += n * (n - 1) // 2
        for a, b in combinations(sorted(members), 2):
            e["pairs"].add((a, b))
    union_gold = {
        p
        for e in exp.values()
        for p in e["pairs"]
        if gold[p[0]] == gold[p[1]]
    }
    assert union_gold, "fixture must produce gold pairs in blocks"

    got = {r.rule: r for r in er_queries.q_er_blocking_rules(spark, SF_DIR).collect()}
    assert set(got) == set(exp)
    for rule, e in exp.items():
        g = got[rule]
        other = exp["minhash_band" if rule == "composite_key" else "composite_key"]
        gold_pairs = {p for p in e["pairs"] if gold[p[0]] == gold[p[1]]}
        uniq = e["pairs"] - other["pairs"]
        assert g.n_blocks == e["n_blocks"]
        assert g.n_pair_slots == e["n_pair_slots"]
        assert g.n_pairs == len(e["pairs"])
        assert g.n_gold_pairs == len(gold_pairs)
        assert g.n_unique_pairs == len(uniq)
        assert g.n_unique_gold_pairs == len(
            {p for p in uniq if gold[p[0]] == gold[p[1]]}
        )
        assert abs(g.recall_vs_union - len(gold_pairs) / len(union_gold)) < 2e-6
    # decomposition: union gold = shared gold + each rule's unique gold
    shared_gold = {
        p
        for p in exp["composite_key"]["pairs"] & exp["minhash_band"]["pairs"]
        if gold[p[0]] == gold[p[1]]
    }
    assert len(union_gold) == (
        len(shared_gold)
        + got["composite_key"].n_unique_gold_pairs
        + got["minhash_band"].n_unique_gold_pairs
    )


class _UF:
    def __init__(self):
        self.p: dict[str, str] = {}

    def find(self, x):
        p = self.p
        while p.setdefault(x, x) != x:
            p[x] = p[p[x]]
            x = p[x]
        return x

    def union(self, a, b):
        ra, rb = self.find(a), self.find(b)
        if ra != rb:
            self.p[max(ra, rb)] = min(ra, rb)


def test_threshold_clusters_match_union_find_replay(spark):
    scored = er_queries._scored(spark, SF_DIR).select(
        "left_id", "right_id", "match_p"
    ).collect()
    sha = blocking.exact_dup_edges(
        er_queries._ingested(spark, SF_DIR)
    ).select("left_id", "right_id").collect()
    gold = {
        r.file_id: r.gold_cluster
        for r in er_queries._ingested(spark, SF_DIR)
        .select("file_id", "gold_cluster")
        .collect()
    }
    gsz: dict[str, int] = {}
    for g in gold.values():
        gsz[g] = gsz.get(g, 0) + 1
    gold_pairs = sum(n * (n - 1) // 2 for n in gsz.values())

    got = {
        round(r.tau, 6): r
        for r in er_queries.q_er_threshold_clusters(spark, SF_DIR).collect()
    }
    assert set(got) == {round(t, 6) for t in er_queries.THRESHOLD_TAUS}

    for tau in er_queries.THRESHOLD_TAUS:
        uf = _UF()
        for fid in gold:
            uf.find(fid)
        n_edges = 0
        for r in scored:
            if float(r.match_p) >= tau:
                n_edges += 1
                uf.union(r.left_id, r.right_id)
        for r in sha:
            uf.union(r.left_id, r.right_id)
        members: dict[str, list[str]] = {}
        for fid in gold:
            members.setdefault(uf.find(fid), []).append(fid)
        sizes = [len(v) for v in members.values()]
        pred = sum(n * (n - 1) // 2 for n in sizes)
        correct = 0
        for ms in members.values():
            cg: dict[str, int] = {}
            for fid in ms:
                cg[gold[fid]] = cg.get(gold[fid], 0) + 1
            correct += sum(m * (m - 1) // 2 for m in cg.values())
        g = got[round(tau, 6)]
        assert g.n_match_edges == n_edges
        assert g.n_clusters == sum(1 for n in sizes if n >= 2)
        assert g.max_cluster_size == max(sizes)
        assert g.n_matched_files == sum(n for n in sizes if n >= 2)
        assert g.pred_pairs == pred
        assert g.correct_pairs == correct
        assert g.gold_pairs == gold_pairs
        p = correct / pred if pred > 0 else -1.0
        r_ = correct / gold_pairs
        assert abs(g.precision - p) < 2e-6
        assert abs(g.recall - r_) < 2e-6
        f1 = 2 * p * r_ / (p + r_) if p > 0 and p + r_ > 0 else -1.0
        assert abs(g.f1 - f1) < 2e-6

    # monotone in tau: fewer edges ⇒ refinement ⇒ recall cannot rise
    taus = sorted(er_queries.THRESHOLD_TAUS)
    for lo, hi in zip(taus, taus[1:]):
        assert got[round(hi, 6)].n_match_edges <= got[round(lo, 6)].n_match_edges
        assert got[round(hi, 6)].pred_pairs <= got[round(lo, 6)].pred_pairs
        assert got[round(hi, 6)].recall <= got[round(lo, 6)].recall + 1e-9


def test_triangles_match_bruteforce_recompute(spark):
    edges = [
        (r.left_id, r.right_id)
        for r in er_queries._edges(spark, SF_DIR).collect()
    ]
    clusters: dict[str, str] = {
        r.file_id: r.cluster_id
        for r in er_queries._clusters(spark, SF_DIR).collect()
    }
    adj: dict[str, set[str]] = {}
    for a, b in edges:
        assert a < b, "edges must be canonically oriented"
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    exp: dict[str, dict[str, int]] = {}
    sizes: dict[str, int] = {}
    for fid, cid in clusters.items():
        sizes[cid] = sizes.get(cid, 0) + 1
    for cid, n in sizes.items():
        if n >= 2:
            exp[cid] = dict(n_members=n, n_edges=0, n_wedges=0, n_triangles=0)
    for a, b in edges:
        exp[clusters[a]]["n_edges"] += 1
    for v, nb in adj.items():
        d = len(nb)
        exp[clusters[v]]["n_wedges"] += d * (d - 1) // 2
    for a, b in edges:
        # common neighbors c with a<b<c close a triangle counted once
        for c in adj[a] & adj[b]:
            if c > b:
                exp[clusters[a]]["n_triangles"] += 1

    got = {r.cluster_id: r for r in er_queries.q_er_triangles(spark, SF_DIR).collect()}
    assert set(got) == set(exp)
    for cid, e in exp.items():
        g = got[cid]
        assert g.n_members == e["n_members"]
        assert g.n_edges == e["n_edges"]
        assert g.n_wedges == e["n_wedges"]
        assert g.n_triangles == e["n_triangles"]
        # every triangle closes exactly 3 wedges
        assert 3 * g.n_triangles <= g.n_wedges or g.n_wedges == 0
        if g.n_wedges > 0:
            assert abs(g.transitivity - 3.0 * g.n_triangles / g.n_wedges) < 2e-6
        else:
            assert g.transitivity == -1.0
    # the fixture's sha-duplicate stars guarantee at least one chain-like
    # (triangle-free) structure AND the dense score blocks at least one
    # triangle-rich one — both regimes must be represented
    assert any(g.n_triangles > 0 for g in got.values())


def test_rand_index_matches_python_recompute(spark):
    lbl = (
        er_queries._clusters(spark, SF_DIR)
        .join(
            er_queries._ingested(spark, SF_DIR).select(
                "file_id", "gold_cluster"
            ),
            "file_id",
        )
        .collect()
    )
    cells: dict[tuple[str, str], int] = {}
    rows: dict[str, int] = {}
    cols: dict[str, int] = {}
    for r in lbl:
        cells[(r.cluster_id, r.gold_cluster)] = (
            cells.get((r.cluster_id, r.gold_cluster), 0) + 1
        )
        rows[r.cluster_id] = rows.get(r.cluster_id, 0) + 1
        cols[r.gold_cluster] = cols.get(r.gold_cluster, 0) + 1
    c2 = lambda n: n * (n - 1) // 2  # noqa: E731
    a = sum(c2(m) for m in cells.values())
    b1 = sum(c2(n) for n in rows.values())
    b2 = sum(c2(n) for n in cols.values())
    n = len(lbl)
    tot = c2(n)
    exp_a = b1 * b2 / tot

    g = er_queries.q_er_rand_index(spark, SF_DIR).collect()[0]
    tol = 2e-6
    assert g.n_records == n
    assert g.pred_pairs == b1
    assert g.gold_pairs == b2
    assert g.agree_pairs == a
    assert abs(g.rand_index - (tot - b1 - b2 + 2 * a) / tot) < tol
    assert abs(g.adjusted_rand - (a - exp_a) / ((b1 + b2) / 2 - exp_a)) < tol
    assert abs(g.fowlkes_mallows - a / (b1 * b2) ** 0.5) < tol
    assert abs(g.jaccard_index - a / (b1 + b2 - a)) < tol
    # the pipeline is pairwise-exact on the fixture (F1 = 1.0), so every
    # pair-counting index must sit at its optimum — a regression here
    # means the clustering drifted from gold
    for v in (g.rand_index, g.adjusted_rand, g.fowlkes_mallows, g.jaccard_index):
        assert abs(v - 1.0) < tol


def test_bipartite_link_matches_python_replay(spark):
    rows = er_queries._scored(spark, SF_DIR).select(
        "left_id", "right_id", "match_p"
    ).collect()
    is_a = lambda fid: fid[63] in set("02468ace")  # noqa: E731
    cross = []
    for r in rows:
        if is_a(r.left_id) != is_a(r.right_id):
            a, b = (
                (r.left_id, r.right_id)
                if is_a(r.left_id)
                else (r.right_id, r.left_id)
            )
            cross.append((a, b, float(r.match_p)))
    assert cross, "fixture must yield cross-source pairs"
    best_a: dict[str, tuple[float, str]] = {}
    best_b: dict[str, tuple[float, str]] = {}
    for a, b, p in cross:
        if a not in best_a or (-p, b) < (-best_a[a][0], best_a[a][1]):
            best_a[a] = (p, b)
        if b not in best_b or (-p, a) < (-best_b[b][0], best_b[b][1]):
            best_b[b] = (p, a)

    got = er_queries.q_er_bipartite_link(spark, SF_DIR).collect()
    assert len(got) == len(best_a)
    from blink_spark import scoring

    for g in got:
        p, b = best_a[g.a_id]
        assert g.b_id == b
        assert abs(g.match_p - p) < 2e-6
        assert g.is_match == (p >= scoring.MATCH_TAU)
        assert g.mutual_best == (best_b[b][1] == g.a_id)
    # sources are disjoint by construction and mutual-best rows form a
    # matching on the B side (each B record claimed at most once)
    assert all(is_a(g.a_id) and not is_a(g.b_id) for g in got)
    claimed = [g.b_id for g in got if g.mutual_best]
    assert len(claimed) == len(set(claimed))
    assert claimed, "fixture must yield at least one mutual-best link"


def _py_phonetic_key(s: str) -> str:
    """Plain-Python replay of blocking.phonetic_key_col's documented spec
    (Soundex-style, H/W transparency deliberately omitted)."""
    s = "".join(ch for ch in s.lower() if "a" <= ch <= "z")
    if not s:
        return ""
    table = dict(zip("abcdefghijklmnopqrstuvwxyz", "01230120022455012623010202"))
    code = "".join(table[ch] for ch in s)
    collapsed = []
    for ch in code:
        if not collapsed or collapsed[-1] != ch:
            collapsed.append(ch)
    rest = "".join(c for c in collapsed[1:] if c != "0")
    return s[0].upper() + (rest[:3] + "000")[:3]


def test_phonetic_block_matches_python_replay(spark):
    reps = blocking.representatives(
        er_queries._with_sig(spark, SF_DIR)
    ).select("file_id", "path_stem", "gold_cluster").collect()
    # classic soundex sanity anchors for the key function itself
    assert _py_phonetic_key("Robert") == "R163"
    assert _py_phonetic_key("Rupert") == "R163"
    assert _py_phonetic_key("parse_args") == "P626"
    assert _py_phonetic_key("parseargs") == "P626"
    assert _py_phonetic_key("parsargs") == "P626"
    assert _py_phonetic_key("") == ""

    blocks: dict[str, list[str]] = {}
    gold = {}
    for r in reps:
        gold[r.file_id] = r.gold_cluster
        k = _py_phonetic_key(r.path_stem)
        if k:
            blocks.setdefault("px:" + k, []).append(r.file_id)
    expected = {}
    for key, members in blocks.items():
        for a, b in combinations(sorted(members), 2):
            expected[(a, b)] = (key, gold[a] == gold[b])

    got = er_queries.q_er_phonetic_block(spark, SF_DIR).collect()
    assert len(got) == len(expected)
    for r in got:
        key, is_gold = expected[(r.left_id, r.right_id)]
        assert r.block_key == key
        assert r.is_gold == is_gold
    # the phonetic blocker must find sound-alike gold pairs; on this
    # corpus at least one pair it finds is NOT in the production
    # candidate set (it generalizes across langs), and vice versa
    prod = {
        (r.left_id, r.right_id)
        for r in er_queries._pairs(spark, SF_DIR)
        .select("left_id", "right_id")
        .collect()
    }
    assert any(p not in prod for p in expected)
    assert any(v[1] for v in expected.values())


def _py_clk(stem: str):
    """Plain-Python replay of the CLK Bloom encoding + distinct bigrams."""
    import hashlib

    pad = "_" + stem.lower() + "_"
    bi = [pad[i : i + 2] for i in range(len(pad) - 1)]
    positions = set()
    for b in bi:
        h = int(hashlib.md5(b.encode()).hexdigest()[:15], 16)
        h1, h2 = h // (1 << 30), h % (1 << 30)
        for i in range(er_queries.CLK_K):
            positions.add((h1 + i * h2) % er_queries.CLK_M)
    return sorted(positions), set(bi)


def test_clk_linkage_matches_python_replay(spark):
    reps = blocking.representatives(
        er_queries._with_sig(spark, SF_DIR)
    ).select("file_id", "path_stem", "gold_cluster").collect()
    enc = {}
    gold = {}
    for r in reps:
        enc[r.file_id] = _py_clk(r.path_stem)
        gold[r.file_id] = r.gold_cluster

    got = er_queries.q_er_clk_linkage(spark, SF_DIR).collect()
    assert got, "fixture must yield candidate pairs"
    dice = lambda a, b: 2.0 * len(set(a) & set(b)) / (len(set(a)) + len(set(b)))  # noqa: E731
    for r in got:
        lc, lb = enc[r.left_id]
        rc, rb = enc[r.right_id]
        assert abs(r.clk_dice - dice(lc, rc)) < 2e-6
        assert abs(r.stem_dice - dice(lb, rb)) < 2e-6
        assert r.is_gold == (gold[r.left_id] == gold[r.right_id])
    # linkage utility of the encoding (asserted on the PINNED-EQUAL
    # Python replay — at sf0.001 every candidate pair has identical
    # stems, so the corpus offers no variance to separate): similar
    # stems must outscore dissimilar ones through the encoding, and
    # self-similarity is exactly 1
    d = lambda a, b: dice(_py_clk(a)[0], _py_clk(b)[0])  # noqa: E731
    assert d("parse_args", "parse_args") == 1.0
    assert d("parse_args", "parse_arg") > d("parse_args", "zlib_stream")
    assert d("tokenizer", "tokeniser") > d("tokenizer", "event_loop")
    # the Bloom collision floor only ever inflates similarity: encoded
    # Dice dominates plaintext Dice whenever the encoding is saturated
    # enough to collide, and identical stems stay identical
    for r in got:
        if r.stem_dice == 1.0:
            assert r.clk_dice == 1.0


def test_nmi_matches_python_recompute(spark):
    import math

    lbl = (
        er_queries._clusters(spark, SF_DIR)
        .join(
            er_queries._ingested(spark, SF_DIR).select(
                "file_id", "gold_cluster"
            ),
            "file_id",
        )
        .collect()
    )
    n = len(lbl)
    rows: dict[str, int] = {}
    cols: dict[str, int] = {}
    cells: dict[tuple[str, str], int] = {}
    for r in lbl:
        rows[r.cluster_id] = rows.get(r.cluster_id, 0) + 1
        cols[r.gold_cluster] = cols.get(r.gold_cluster, 0) + 1
        cells[(r.cluster_id, r.gold_cluster)] = (
            cells.get((r.cluster_id, r.gold_cluster), 0) + 1
        )
    ent = lambda cs: sum(-(c / n) * math.log(c / n) for c in cs)  # noqa: E731
    hp, hg, hj = ent(rows.values()), ent(cols.values()), ent(cells.values())
    mi = hp + hg - hj
    g = er_queries.q_er_nmi(spark, SF_DIR).collect()[0]
    tol = 2e-6
    assert g.n_records == n
    assert abs(g.h_pred - hp) < tol
    assert abs(g.h_gold - hg) < tol
    assert abs(g.mutual_info - mi) < tol
    assert abs(g.nmi - mi / math.sqrt(hp * hg)) < tol
    hom, com = mi / hg, mi / hp
    assert abs(g.homogeneity - hom) < tol
    assert abs(g.completeness - com) < tol
    assert abs(g.v_measure - 2 * hom * com / (hom + com)) < tol
    # the fixture clustering is exact, so every index must sit at 1.0
    for v in (g.nmi, g.homogeneity, g.completeness, g.v_measure):
        assert abs(v - 1.0) < tol
    # and the two marginal entropies must coincide with the joint
    assert abs(g.h_pred - g.h_gold) < tol
