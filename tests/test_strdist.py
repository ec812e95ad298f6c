"""Parity + correctness pins for the extended string-distance panel
(blink_spark.strdist), no Spark session needed.

Two regimes, matching the module's contract:
- the six SQL-expressible distances are fuzzed against their own DuckDB
  oracle fragments (the exact SQL emitted into er_string_panel), raw
  unicode in, proj() on both sides — this IS the oracle contract;
- the six alignment-DP / phonetic kernels have no plain-SQL form, so
  each is pinned against an independent naive formulation (recursive
  memo, substring enumeration, alignment enumeration) plus invariants.
"""

from __future__ import annotations

import math
from functools import lru_cache
from itertools import combinations

import duckdb
import pytest
from hypothesis import given, settings, strategies as st

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from blink_spark import strdist

ALPHA = "abcXYZ019._-üπ"
words = st.text(alphabet=ALPHA, min_size=0, max_size=18)

_con = duckdb.connect()


@pytest.mark.parametrize("col", sorted(strdist.SQL_PANEL))
@settings(max_examples=200, deadline=None)
@given(a=words, b=words)
def test_sql_panel_parity(col, a, b):
    """Python kernel == the DuckDB fragment the oracle query embeds,
    including the proj() canonicalization on both sides."""
    sql_fn = strdist.SQL_PANEL[col]
    expr = sql_fn(strdist.sql_proj("a"), strdist.sql_proj("b"))
    want = _con.execute(
        f"SELECT {expr} FROM (SELECT ?::VARCHAR AS a, ?::VARCHAR AS b)",
        [a, b],
    ).fetchone()[0]
    got = strdist.PY_PANEL[col](strdist.proj(a), strdist.proj(b))
    assert math.isclose(got, float(want), abs_tol=1e-9), (col, a, b, got, want)


# word strings: spaces + separators so the whitespace tokenizer and the
# multi-token structure are actually exercised
WALPHA = "ab c.x_1- "
wordseqs = st.text(alphabet=WALPHA, min_size=0, max_size=24)


@pytest.mark.parametrize("col", sorted(strdist.SQL_WORD_PANEL))
@settings(max_examples=200, deadline=None)
@given(a=wordseqs, b=wordseqs)
def test_sql_word_panel_parity(col, a, b):
    """Word-level (qval=None) kernels == the DuckDB fragments the
    er_string_panel_word oracle embeds."""
    sql_fn = strdist.SQL_WORD_PANEL[col]
    expr = sql_fn(strdist.sql_proj("a"), strdist.sql_proj("b"))
    want = _con.execute(
        f"SELECT {expr} FROM (SELECT ?::VARCHAR AS a, ?::VARCHAR AS b)",
        [a, b],
    ).fetchone()[0]
    got = strdist.WORD_PANEL[col](strdist.proj(a), strdist.proj(b))
    assert math.isclose(got, float(want), abs_tol=1e-9), (col, a, b, got, want)


@settings(max_examples=200, deadline=None)
@given(a=wordseqs, b=wordseqs)
def test_word_panel_invariants(a, b):
    """Naive-formulation pins for the multiset family: brute-force token
    intersection, the Dice↔Jaccard identity, the overlap ≥ cosine ≥
    Jaccard sandwich, Hamming-vs-equality, and Monge-Elkan identity."""
    ta, tb = a.split(), b.split()
    # brute-force multiset intersection (no Counter)
    pool = list(tb)
    inter = 0
    for t in ta:
        if t in pool:
            pool.remove(t)
            inter += 1
    j = strdist.jaccard_word_sim(a, b)
    d = strdist.sorensen_word_sim(a, b)
    o = strdist.overlap_word_sim(a, b)
    c = strdist.cosine_word_sim(a, b)
    if ta or tb:
        assert math.isclose(
            j, inter / (len(ta) + len(tb) - inter) if (len(ta) + len(tb) - inter) else 1.0,
            abs_tol=1e-12,
        )
        assert math.isclose(d, 2 * inter / (len(ta) + len(tb)), abs_tol=1e-12)
    # Dice↔Jaccard identity: D = 2J/(1+J)
    assert math.isclose(d, 2 * j / (1 + j), abs_tol=1e-9)
    if ta and tb:
        assert o + 1e-12 >= c >= j - 1e-12
    for v in (j, d, o, c):
        assert -1e-12 <= v <= 1 + 1e-12
    h = strdist.hamming_word_sim(a, b)
    assert (h == 1.0) == (ta == tb)
    assert math.isclose(strdist.monge_elkan_word(a, a), 1.0, abs_tol=1e-12)
    # single-token coincidence: ME(word) == normalized DL on the token
    if len(ta) == 1 and len(tb) == 1:
        mx = max(len(ta[0]), len(tb[0]))
        dl = 1.0 - strdist.damerau_levenshtein(ta[0], tb[0]) / mx
        assert math.isclose(strdist.monge_elkan_word(a, b), dl, abs_tol=1e-12)


# ---------------------------------------------------------------------------
# independent naive formulations for the DP kernels
# ---------------------------------------------------------------------------

def _nw_naive(a: str, b: str) -> int:
    @lru_cache(maxsize=None)
    def rec(i, j):
        if i == 0:
            return -j
        if j == 0:
            return -i
        s = 1 if a[i - 1] == b[j - 1] else -1
        return max(rec(i - 1, j - 1) + s, rec(i - 1, j) - 1, rec(i, j - 1) - 1)

    return rec(len(a), len(b))


def _lcs_seq_naive(a: str, b: str) -> int:
    @lru_cache(maxsize=None)
    def rec(i, j):
        if i == 0 or j == 0:
            return 0
        if a[i - 1] == b[j - 1]:
            return rec(i - 1, j - 1) + 1
        return max(rec(i - 1, j), rec(i, j - 1))

    return rec(len(a), len(b))


def _editex_naive(a: str, b: str) -> int:
    # same spec as the kernel: group-aware substitution, discounted
    # deletion of h/w or doubled letters, first-char deletion cost 1
    def dele(s, i):  # cost of deleting s[i-1] (1-based)
        prev = s[i - 2] if i > 1 else s[0]
        cur = s[i - 1]
        return 1 if cur in ("h", "w") or prev == cur else 2

    @lru_cache(maxsize=None)
    def rec(i, j):
        if i == 0 and j == 0:
            return 0
        if i == 0:
            return rec(0, j - 1) + dele(b, j)
        if j == 0:
            return rec(i - 1, 0) + dele(a, i)
        return min(
            rec(i - 1, j) + dele(a, i),
            rec(i, j - 1) + dele(b, j),
            rec(i - 1, j - 1) + strdist._editex_sub(a[i - 1], b[j - 1]),
        )

    return rec(len(a), len(b))


def _sw_naive(a: str, b: str) -> int:
    """Local alignment via an independent formulation: the best GLOBAL
    alignment score over all substring pairs (clamped at 0)."""
    best = 0
    for i in range(len(a) + 1):
        for k in range(i, len(a) + 1):
            for j in range(len(b) + 1):
                for l in range(j, len(b) + 1):
                    best = max(best, _nw_naive(a[i:k], b[j:l]))
    return best


def _gotoh_naive(a: str, b: str) -> float:
    """Affine-gap global alignment via monotone-matching enumeration:
    score = Σ ±1 over matched pairs + affine penalty per maximal
    unmatched run in each string (runs of the two strings are separate
    gaps, matching Gotoh's state model)."""
    n, m = len(a), len(b)

    def gap_cost(runs):
        return sum(
            strdist.GOTOH_GAP_OPEN + strdist.GOTOH_GAP_EXT * (r - 1)
            for r in runs
            if r > 0
        )

    def runs(unmatched_sorted, total):
        # maximal runs of consecutive indices among the unmatched set
        out, cur = [], 0
        prev = None
        for i in range(total):
            if i in unmatched_sorted:
                if prev is not None and i == prev + 1 and cur:
                    cur += 1
                else:
                    if cur:
                        out.append(cur)
                    cur = 1
                prev = i
        if cur:
            out.append(cur)
        return out

    best = -float("inf")
    for k in range(min(n, m) + 1):
        for ia in combinations(range(n), k):
            for jb in combinations(range(m), k):
                s = sum(1.0 if a[x] == b[y] else -1.0 for x, y in zip(ia, jb))
                ua = set(range(n)) - set(ia)
                ub = set(range(m)) - set(jb)
                s -= gap_cost(runs(ua, n)) + gap_cost(runs(ub, m))
                best = max(best, s)
    return best


short = st.text(alphabet="abch", min_size=0, max_size=6)
tiny = st.text(alphabet="abch", min_size=1, max_size=4)


@settings(max_examples=150, deadline=None)
@given(a=short, b=short)
def test_nw_matches_naive(a, b):
    mx = max(len(a), len(b))
    want = 1.0 if mx == 0 else (_nw_naive(a, b) + mx) / (2.0 * mx)
    assert math.isclose(strdist.needleman_wunsch_sim(a, b), want, abs_tol=1e-12)


@settings(max_examples=150, deadline=None)
@given(a=short, b=short)
def test_lcs_seq_matches_naive(a, b):
    assert strdist.lcs_seq_len(a, b) == _lcs_seq_naive(a, b)
    # substring ⊆ subsequence
    assert strdist.lcs_str_len(a, b) <= strdist.lcs_seq_len(a, b)


@settings(max_examples=150, deadline=None)
@given(a=short, b=short)
def test_editex_matches_naive(a, b):
    assert strdist.editex_dist(a, b) == _editex_naive(a, b)


@settings(max_examples=60, deadline=None)
@given(a=st.text(alphabet="abch", max_size=4), b=st.text(alphabet="abch", max_size=4))
def test_sw_matches_naive(a, b):
    if not a or not b:
        return
    assert math.isclose(
        strdist.smith_waterman_sim(a, b),
        _sw_naive(a, b) / min(len(a), len(b)),
        abs_tol=1e-12,
    )


@settings(max_examples=40, deadline=None)
@given(a=tiny, b=tiny)
def test_gotoh_matches_naive(a, b):
    want = max(0.0, _gotoh_naive(a, b)) / min(len(a), len(b))
    assert math.isclose(strdist.gotoh_sim(a, b), want, abs_tol=1e-9), (a, b)


@settings(max_examples=150, deadline=None)
@given(a=short, b=short)
def test_gotoh_dominates_linear_gaps(a, b):
    """Affine gaps (open 1, ext 0.4) can only beat per-char gaps (1), so
    the Gotoh score must dominate the NW score."""
    if not a or not b:
        return
    mx = max(len(a), len(b))
    nw_score = strdist.needleman_wunsch_sim(a, b) * 2.0 * mx - mx
    gotoh_score = strdist.gotoh_sim(a, b) * min(len(a), len(b))
    # unconditional: gotoh_sim clamps its raw score at 0, so even when
    # the NW raw score goes negative the clamped Gotoh score dominates
    assert gotoh_score + 1e-9 >= nw_score


@settings(max_examples=200, deadline=None)
@given(a=words, b=words)
def test_strcmp95_bounds_and_dominance(a, b):
    """strcmp95 adds only non-negative adjustments on top of Jaro-Winkler
    → always within [0,1] and ≥ the engine's JW on the same strings."""
    pa, pb = strdist.proj(a), strdist.proj(b)
    got = strdist.strcmp95(pa, pb)
    assert 0.0 <= got <= 1.0
    from blink_spark import scoring

    jw = scoring.jaro_winkler(pa.encode(), pb.encode())
    assert got + 1e-12 >= jw, (pa, pb, got, jw)


@settings(max_examples=150, deadline=None)
@given(a=st.text(alphabet="dhtm", max_size=4), b=st.text(alphabet="dhtm", max_size=4))
def test_strcmp95_reduces_to_jw(a, b):
    """With no similar-char pairs in the alphabet and the long-string
    conditions unreachable (len ≤ 4), strcmp95 IS Jaro-Winkler."""
    from blink_spark import scoring

    assert math.isclose(
        strdist.strcmp95(a, b),
        scoring.jaro_winkler(a.encode(), b.encode()),
        abs_tol=1e-12,
    )


@pytest.mark.parametrize(
    "fn",
    sorted({**strdist.PY_PANEL, **strdist.DP_PANEL}),
)
@settings(max_examples=100, deadline=None)
@given(a=words, b=words)
def test_identity_and_bounds(fn, a, b):
    f = {**strdist.PY_PANEL, **strdist.DP_PANEL}[fn]
    pa, pb = strdist.proj(a), strdist.proj(b)
    v = f(pa, pb)
    assert 0.0 <= v <= 1.0 + 1e-12, (fn, pa, pb, v)
    ident = f(pa, pa)
    if fn == "strcmp95_base" and not pa:
        assert ident == 0.0  # jaro convention: any empty side → 0
    else:
        assert math.isclose(ident, 1.0, abs_tol=1e-12), (fn, pa, ident)


def test_word_panel_degenerate_sentinels():
    """textdistance quick_answer fidelity (ADVICE r4): both-empty → 1.0,
    exactly-one-empty → 0.0, for every multiset word kernel."""
    for fn in ("jaccard_word_sim", "sorensen_word_sim",
               "overlap_word_sim", "cosine_word_sim"):
        f = getattr(strdist, fn)
        assert f("", "") == 1.0, fn
        assert f("", "abc def") == 0.0, fn
        assert f("abc def", "") == 0.0, fn
