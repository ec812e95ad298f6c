"""Extended string-distance panel — the rest of the reference's
20-distance textdistance grid (``scripts/prepare_nil_dataset.py:209-253``).

Nine distances already ship in the scoring hot path (``scoring.py``:
Jaro-Winkler, Jaro, Damerau-Levenshtein, char-set Jaccard, Levenshtein +
shingle-set Jaccard/Sorensen-Dice/overlap/cosine).  This module adds the
remaining grid rows as ONE Arrow-batched kernel evaluated per DISTINCT
basename pair (the same distinct-pair trick score_pairs uses — the panel
depends only on the basename strings, and distinct pairs are orders of
magnitude fewer than candidate pairs, so the Python round-trip never
touches the O(pairs) hot path):

SQL-expressible (DuckDB oracle mirrors below; query ``er_string_panel``
is strict oracle-green):

- ``hamming``      positional mismatches + length gap, normalized
- ``mlipns``       MLIPNS 0/1 acceptance over the Hamming count
- ``bag``          multiset (bag) distance, normalized
- ``tversky``      asymmetric char-set Tversky (alpha=0.7, beta=0.3)
- ``monge_elkan``  token-level Monge-Elkan, Damerau-Levenshtein inner
- ``lcs_str``      longest common SUBSTRING ratio

Alignment-DP / phonetic (no tractable plain-SQL form — the driver
records the rows-only check for ``er_string_panel_full``; parity is
instead fuzz-pinned against independent naive implementations in
``tests/test_strdist.py``):

- ``strcmp95``     Winkler's strcmp95 (similar-char partial credit +
                   prefix boost + long-string adjustment)
- ``nw``           Needleman-Wunsch global alignment, normalized
- ``gotoh``        Gotoh global alignment with affine gaps, normalized
- ``sw``           Smith-Waterman local alignment, normalized
- ``lcs_seq``      longest common SUBSEQUENCE ratio
- ``editex``       Zobel-Dart phonetic edit distance, normalized

The reference's remaining name, Tanimoto, is ``log2`` of the Jaccard
coefficient — a monotone transform of the ``jaccard_sh``/``charjac_base``
columns already emitted — and is intentionally not duplicated.

Fidelity note: the kernels above are CHARACTER-level variants of the
reference grid.  textdistance's default ``qval=None`` tokenizes on
whitespace (word-level sequences), and its Monge-Elkan splits tokens
with ``str.split()`` where the char-level one splits on ``[^a-z0-9]+``.
On the single-token basename strings the char panel scores, the two
conventions coincide; character-level is the right granularity for
filename keys.  The reference's ACTUAL word-level semantics are
implemented separately in the WORD_PANEL section below (positional
Hamming, multiset Jaccard/Sorensen/overlap/cosine, ``str.split()``
Monge-Elkan) and exercised over multi-token path sequences by
``er_string_panel_word``, oracle-gated and fuzz-pinned against naive
formulations in ``tests/test_strdist.py``.

Parity contract (mirrors the lev_path contract in scoring.py): every
distance operates on ``proj(s) = lower(regexp_replace(s, '[^ -~]', '?'))``
— non-printable-ASCII codepoints project to '?' BEFORE lowercasing, so
byte/codepoint/locale semantics can never diverge between Spark and
DuckDB, and ASCII lower() is identical everywhere.  The reference panel
lowercases both sides the same way (``prepare_nil_dataset.py:246``).
"""

from __future__ import annotations

import math
import re
from collections import Counter

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType, StructField, StructType

from blink_spark.scoring import (
    _jaro,
    char_jaccard,
    damerau_levenshtein,
    jaro_winkler,
)

TVERSKY_ALPHA = 0.7
TVERSKY_BETA = 0.3

_TOKEN_SPLIT = re.compile(r"[^a-z0-9]+")
_NON_PRINTABLE = re.compile(r"[^ -~]")


def proj(s: str | None) -> str:
    """The cross-engine canonical form: non-printable-ASCII → '?', then
    ASCII lower.  SQL mirror: ``sql_proj``."""
    return _NON_PRINTABLE.sub("?", s or "").lower()


def sql_proj(expr: str) -> str:
    return f"lower(regexp_replace({expr}, '[^ -~]', '?', 'g'))"


# ---------------------------------------------------------------------------
# SQL-expressible distances (each fn has a sql_* mirror; fuzz-pinned)
# ---------------------------------------------------------------------------

def hamming_count(a: str, b: str) -> int:
    """Positional mismatches over the aligned prefix + the length gap —
    the CHARACTER-level Hamming count (textdistance's ``qval=None``
    tokenizes on whitespace, i.e. word-level sequences; this panel is
    uniformly character-level — see the module-docstring fidelity
    note)."""
    n = min(len(a), len(b))
    return sum(a[i] != b[i] for i in range(n)) + abs(len(a) - len(b))


def hamming_sim(a: str, b: str) -> float:
    mx = max(len(a), len(b))
    return 1.0 - hamming_count(a, b) / mx if mx else 1.0


def sql_hamming(a: str, b: str) -> str:
    ham = (
        f"(coalesce(list_sum(list_transform("
        f"generate_series(1, least(len({a}), len({b}))), "
        f"i -> CASE WHEN ({a})[i] = ({b})[i] THEN 0 ELSE 1 END)), 0) "
        f"+ abs(len({a}) - len({b})))"
    )
    return (
        f"(CASE WHEN greatest(len({a}), len({b})) = 0 THEN 1.0 "
        f"ELSE 1.0 - CAST({ham} AS DOUBLE) / greatest(len({a}), len({b})) "
        f"END)"
    )


def mlipns(a: str, b: str, threshold: float = 0.25, max_mismatches: int = 2) -> float:
    """MLIPNS 0/1 acceptance (textdistance ``MLIPNS`` semantics: peel up
    to ``max_mismatches`` mismatching positions off the Hamming count and
    accept if the mismatch ratio ever drops to ``threshold``)."""
    ham = hamming_count(a, b)
    maxlen = max(len(a), len(b))
    if maxlen == 0:
        return 1.0
    if a and b:
        for k in range(max_mismatches + 1):
            if maxlen - k == 0:
                return 1.0
            if (ham - k) <= threshold * (maxlen - k):
                return 1.0
    return 1.0 if maxlen - (max_mismatches + 1) == 0 and a and b else 0.0


def sql_mlipns(a: str, b: str) -> str:
    ham = (
        f"(coalesce(list_sum(list_transform("
        f"generate_series(1, least(len({a}), len({b}))), "
        f"i -> CASE WHEN ({a})[i] = ({b})[i] THEN 0 ELSE 1 END)), 0) "
        f"+ abs(len({a}) - len({b})))"
    )
    mx = f"greatest(len({a}), len({b}))"
    both = f"(len({a}) > 0 AND len({b}) > 0)"
    return (
        f"(CASE WHEN {mx} = 0 THEN 1.0 "
        f"WHEN NOT {both} THEN 0.0 "
        f"WHEN {ham} <= 0.25 * {mx} THEN 1.0 "
        f"WHEN {mx} - 1 = 0 THEN 1.0 "
        f"WHEN ({ham} - 1) <= 0.25 * ({mx} - 1) THEN 1.0 "
        f"WHEN {mx} - 2 = 0 THEN 1.0 "
        f"WHEN ({ham} - 2) <= 0.25 * ({mx} - 2) THEN 1.0 "
        f"WHEN {mx} - 3 = 0 THEN 1.0 "
        f"ELSE 0.0 END)"
    )


def bag_sim(a: str, b: str) -> float:
    """Bag (multiset) distance: max of the two one-sided multiset
    differences, normalized by the longer length."""
    mx = max(len(a), len(b))
    if mx == 0:
        return 1.0
    counts: dict[str, int] = {}
    for c in a:
        counts[c] = counts.get(c, 0) + 1
    common = 0
    for c in b:
        if counts.get(c, 0) > 0:
            counts[c] -= 1
            common += 1
    dist = max(len(a) - common, len(b) - common)
    return 1.0 - dist / mx


def sql_bag(a: str, b: str) -> str:
    # common-with-multiplicity = sum over distinct chars of a of
    # min(count_a, count_b); chars absent from a contribute 0 regardless
    common = (
        f"coalesce(list_sum(list_transform("
        f"list_distinct(string_split({a}, '')), "
        f"c -> least(len(list_filter(string_split({a}, ''), x -> x = c)), "
        f"len(list_filter(string_split({b}, ''), x -> x = c))))), 0)"
    )
    return (
        f"(CASE WHEN greatest(len({a}), len({b})) = 0 THEN 1.0 "
        f"ELSE 1.0 - CAST(greatest(len({a}) - {common}, len({b}) - {common}) "
        f"AS DOUBLE) / greatest(len({a}), len({b})) END)"
    )


def tversky_sim(
    a: str, b: str, alpha: float = TVERSKY_ALPHA, beta: float = TVERSKY_BETA
) -> float:
    """Asymmetric char-set Tversky index — the generalization the
    reference grid carries alongside Jaccard (alpha=beta=1) and Dice
    (alpha=beta=0.5); the asymmetric weights give a distinct signal."""
    sa, sb = set(a), set(b)
    if not sa and not sb:
        return 1.0
    inter = len(sa & sb)
    denom = inter + alpha * len(sa - sb) + beta * len(sb - sa)
    return inter / denom if denom else 0.0


def sql_tversky(a: str, b: str) -> str:
    da = f"list_distinct(string_split({a}, ''))"
    db = f"list_distinct(string_split({b}, ''))"
    inter = f"len(list_intersect({da}, {db}))"
    only_a = f"(len({da}) - {inter})"
    only_b = f"(len({db}) - {inter})"
    denom = f"({inter} + {TVERSKY_ALPHA} * {only_a} + {TVERSKY_BETA} * {only_b})"
    return (
        f"(CASE WHEN len({a}) = 0 AND len({b}) = 0 THEN 1.0 "
        f"WHEN {denom} = 0 THEN 0.0 "
        f"ELSE CAST({inter} AS DOUBLE) / {denom} END)"
    )


def _tokens(s: str) -> list[str]:
    return [t for t in _TOKEN_SPLIT.split(s) if t]


def monge_elkan_dl(a: str, b: str) -> float:
    """Token-level Monge-Elkan with a normalized Damerau-Levenshtein
    inner similarity (the canonical definition; the reference grid's
    MongeElkan row uses the same inner algorithm but splits tokens with
    ``str.split()`` where this splits on ``[^a-z0-9]+`` — see the
    module-docstring fidelity note).  Asymmetric by definition — pairs
    arrive in canonical left<right order, so the direction is
    deterministic."""
    ta, tb = _tokens(a), _tokens(b)
    if not ta and not tb:
        return 1.0
    if not ta or not tb:
        return 0.0
    total = 0.0
    for x in ta:
        best = 0.0
        for y in tb:
            sim = 1.0 - damerau_levenshtein(x, y) / max(len(x), len(y))
            if sim > best:
                best = sim
        total += best
    return total / len(ta)


def sql_monge_elkan(a: str, b: str) -> str:
    ta = f"list_filter(regexp_split_to_array({a}, '[^a-z0-9]+'), t -> t <> '')"
    tb = f"list_filter(regexp_split_to_array({b}, '[^a-z0-9]+'), t -> t <> '')"
    inner = (
        f"list_max(list_transform({tb}, tb_t -> "
        f"1.0 - CAST(damerau_levenshtein(ta_t, tb_t) AS DOUBLE) "
        f"/ greatest(length(ta_t), length(tb_t))))"
    )
    return (
        f"(CASE WHEN len({ta}) = 0 AND len({tb}) = 0 THEN 1.0 "
        f"WHEN len({ta}) = 0 OR len({tb}) = 0 THEN 0.0 "
        f"ELSE list_avg(list_transform({ta}, ta_t -> {inner})) END)"
    )


def lcs_str_len(a: str, b: str) -> int:
    """Longest common SUBSTRING length (single-row DP over the shorter
    string)."""
    if not a or not b:
        return 0
    if len(a) > len(b):
        a, b = b, a
    best = 0
    prev = [0] * (len(a) + 1)
    for cb in b:
        cur = [0] * (len(a) + 1)
        for i, ca in enumerate(a, 1):
            if ca == cb:
                cur[i] = prev[i - 1] + 1
                if cur[i] > best:
                    best = cur[i]
        prev = cur
    return best


def lcs_str_sim(a: str, b: str) -> float:
    mx = max(len(a), len(b))
    return lcs_str_len(a, b) / mx if mx else 1.0


def sql_lcs_str(a: str, b: str) -> str:
    # max substring length L of a occurring in b: probe every (start, L)
    # of the FIRST argument with contains() — O(len(a)^2) probes per
    # distinct pair, fine for basenames
    best = (
        f"coalesce(list_max(flatten(list_transform("
        f"generate_series(1, len({a})), i -> list_transform("
        f"generate_series(1, len({a}) - i + 1), l -> "
        f"CASE WHEN contains({b}, substr({a}, i, l)) THEN l ELSE 0 END)))), 0)"
    )
    return (
        f"(CASE WHEN greatest(len({a}), len({b})) = 0 THEN 1.0 "
        f"ELSE CAST({best} AS DOUBLE) / greatest(len({a}), len({b})) END)"
    )


SQL_PANEL = {
    "hamming_base": sql_hamming,
    "mlipns_base": sql_mlipns,
    "bag_base": sql_bag,
    "tversky_base": sql_tversky,
    "monge_elkan_base": sql_monge_elkan,
    "lcs_str_base": sql_lcs_str,
}

PY_PANEL = {
    "hamming_base": hamming_sim,
    "mlipns_base": mlipns,
    "bag_base": bag_sim,
    "tversky_base": tversky_sim,
    "monge_elkan_base": monge_elkan_dl,
    "lcs_str_base": lcs_str_sim,
}


# ---------------------------------------------------------------------------
# Word-level (qval=None) panel — the reference grid's ACTUAL token
# semantics: ``textdistance.X(qval=None)`` treats each string as its
# whitespace-token sequence (``str.split()``) and the set-family
# distances operate on token MULTISETS (Counter intersection = sum of
# min multiplicities).  These run next to the character-level panel
# above (char-level is the right granularity for filename keys; word
# level is the reference parity surface for multi-token strings —
# ``scripts/prepare_nil_dataset.py:209-253``).
# ---------------------------------------------------------------------------

def _wtokens(s: str) -> list[str]:
    """``str.split()`` — textdistance's qval=None external tokenizer
    (splits on whitespace runs, strips ends)."""
    return s.split()


def _wcounts(ta: list[str], tb: list[str]) -> tuple[int, int, int]:
    """(|A∩B|, |A|, |B|) with multiset intersection."""
    ca = Counter(ta)
    cb = Counter(tb)
    inter = sum((ca & cb).values())
    return inter, len(ta), len(tb)


def hamming_word_sim(a: str, b: str) -> float:
    """Positional token-sequence Hamming similarity: matches at aligned
    positions / max token count (textdistance Hamming, qval=None)."""
    ta, tb = _wtokens(a), _wtokens(b)
    mx = max(len(ta), len(tb))
    if mx == 0:
        return 1.0
    return sum(1 for x, y in zip(ta, tb) if x == y) / mx


def jaccard_word_sim(a: str, b: str) -> float:
    inter, la, lb = _wcounts(_wtokens(a), _wtokens(b))
    union = la + lb - inter
    return inter / union if union else 1.0


def sorensen_word_sim(a: str, b: str) -> float:
    inter, la, lb = _wcounts(_wtokens(a), _wtokens(b))
    return 2.0 * inter / (la + lb) if la + lb else 1.0


def overlap_word_sim(a: str, b: str) -> float:
    """Degenerate inputs follow textdistance's quick_answer: 1.0 only
    when BOTH token lists are empty, 0.0 when exactly one is."""
    inter, la, lb = _wcounts(_wtokens(a), _wtokens(b))
    if la == 0 and lb == 0:
        return 1.0
    mn = min(la, lb)
    return inter / mn if mn else 0.0


def cosine_word_sim(a: str, b: str) -> float:
    """Same quick_answer sentinels as :func:`overlap_word_sim`."""
    inter, la, lb = _wcounts(_wtokens(a), _wtokens(b))
    if la == 0 and lb == 0:
        return 1.0
    return inter / math.sqrt(la * lb) if la and lb else 0.0


def monge_elkan_word(a: str, b: str) -> float:
    """Monge-Elkan with the REFERENCE's tokenizer (``str.split()``, not
    the ``[^a-z0-9]+`` splitter of :func:`monge_elkan_dl`) and the same
    normalized Damerau-Levenshtein inner similarity."""
    ta, tb = _wtokens(a), _wtokens(b)
    if not ta and not tb:
        return 1.0
    if not ta or not tb:
        return 0.0
    total = 0.0
    for x in ta:
        best = 0.0
        for y in tb:
            sim = 1.0 - damerau_levenshtein(x, y) / max(len(x), len(y))
            if sim > best:
                best = sim
        total += best
    return total / len(ta)


def _sql_wtok(expr: str) -> str:
    return (
        f"list_filter(regexp_split_to_array({expr}, '\\s+'), t -> t <> '')"
    )


def _sql_winter(ta: str, tb: str) -> str:
    """Multiset token intersection |A∩B| as a pure list expression."""
    return (
        f"coalesce(list_sum(list_transform(list_distinct({ta}), t -> "
        f"least(len(list_filter({ta}, x -> x = t)), "
        f"len(list_filter({tb}, x -> x = t))))), 0)"
    )


def sql_hamming_word(a: str, b: str) -> str:
    ta, tb = _sql_wtok(a), _sql_wtok(b)
    matches = (
        f"coalesce(list_sum(list_transform("
        f"range(1, least(len({ta}), len({tb})) + 1), "
        f"i -> CASE WHEN {ta}[i] = {tb}[i] THEN 1 ELSE 0 END)), 0)"
    )
    return (
        f"(CASE WHEN greatest(len({ta}), len({tb})) = 0 THEN 1.0 "
        f"ELSE CAST({matches} AS DOUBLE) / greatest(len({ta}), len({tb})) END)"
    )


def sql_jaccard_word(a: str, b: str) -> str:
    ta, tb = _sql_wtok(a), _sql_wtok(b)
    inter = _sql_winter(ta, tb)
    return (
        f"(CASE WHEN len({ta}) + len({tb}) - {inter} = 0 THEN 1.0 "
        f"ELSE CAST({inter} AS DOUBLE) / (len({ta}) + len({tb}) - {inter}) END)"
    )


def sql_sorensen_word(a: str, b: str) -> str:
    ta, tb = _sql_wtok(a), _sql_wtok(b)
    inter = _sql_winter(ta, tb)
    return (
        f"(CASE WHEN len({ta}) + len({tb}) = 0 THEN 1.0 "
        f"ELSE 2.0 * {inter} / (len({ta}) + len({tb})) END)"
    )


def sql_overlap_word(a: str, b: str) -> str:
    ta, tb = _sql_wtok(a), _sql_wtok(b)
    inter = _sql_winter(ta, tb)
    return (
        f"(CASE WHEN len({ta}) = 0 AND len({tb}) = 0 THEN 1.0 "
        f"WHEN least(len({ta}), len({tb})) = 0 THEN 0.0 "
        f"ELSE CAST({inter} AS DOUBLE) / least(len({ta}), len({tb})) END)"
    )


def sql_cosine_word(a: str, b: str) -> str:
    ta, tb = _sql_wtok(a), _sql_wtok(b)
    inter = _sql_winter(ta, tb)
    return (
        f"(CASE WHEN len({ta}) = 0 AND len({tb}) = 0 THEN 1.0 "
        f"WHEN len({ta}) = 0 OR len({tb}) = 0 THEN 0.0 "
        f"ELSE CAST({inter} AS DOUBLE) / sqrt(CAST(len({ta}) AS DOUBLE) * len({tb})) END)"
    )


def sql_monge_elkan_word(a: str, b: str) -> str:
    ta, tb = _sql_wtok(a), _sql_wtok(b)
    inner = (
        f"list_max(list_transform({tb}, tb_t -> "
        f"1.0 - CAST(damerau_levenshtein(ta_t, tb_t) AS DOUBLE) "
        f"/ greatest(length(ta_t), length(tb_t))))"
    )
    return (
        f"(CASE WHEN len({ta}) = 0 AND len({tb}) = 0 THEN 1.0 "
        f"WHEN len({ta}) = 0 OR len({tb}) = 0 THEN 0.0 "
        f"ELSE list_avg(list_transform({ta}, ta_t -> {inner})) END)"
    )


WORD_PANEL = {
    "hamming_w": hamming_word_sim,
    "jaccard_w": jaccard_word_sim,
    "sorensen_w": sorensen_word_sim,
    "overlap_w": overlap_word_sim,
    "cosine_w": cosine_word_sim,
    "monge_elkan_w": monge_elkan_word,
}

SQL_WORD_PANEL = {
    "hamming_w": sql_hamming_word,
    "jaccard_w": sql_jaccard_word,
    "sorensen_w": sql_sorensen_word,
    "overlap_w": sql_overlap_word,
    "cosine_w": sql_cosine_word,
    "monge_elkan_w": sql_monge_elkan_word,
}


# ---------------------------------------------------------------------------
# Alignment-DP / phonetic distances (kernel-only; no plain-SQL form)
# ---------------------------------------------------------------------------

def lcs_seq_len(a: str, b: str) -> int:
    """Longest common SUBSEQUENCE length (classic DP, one rolling row)."""
    if not a or not b:
        return 0
    if len(a) > len(b):
        a, b = b, a
    prev = [0] * (len(a) + 1)
    for cb in b:
        cur = [0] * (len(a) + 1)
        for i, ca in enumerate(a, 1):
            cur[i] = prev[i - 1] + 1 if ca == cb else max(prev[i], cur[i - 1])
        prev = cur
    return prev[len(a)]


def lcs_seq_sim(a: str, b: str) -> float:
    mx = max(len(a), len(b))
    return lcs_seq_len(a, b) / mx if mx else 1.0


def needleman_wunsch_sim(a: str, b: str) -> float:
    """Global alignment (match +1, mismatch −1, gap −1), mapped onto
    [0, 1] via (score + maxlen) / (2·maxlen): identical strings → 1,
    worst case (all gaps/mismatches) → 0."""
    mx = max(len(a), len(b))
    if mx == 0:
        return 1.0
    prev = [-j for j in range(len(b) + 1)]
    for i, ca in enumerate(a, 1):
        cur = [-i] + [0] * len(b)
        for j, cb in enumerate(b, 1):
            cur[j] = max(
                prev[j - 1] + (1 if ca == cb else -1),
                prev[j] - 1,
                cur[j - 1] - 1,
            )
        prev = cur
    return (prev[len(b)] + mx) / (2.0 * mx)


def smith_waterman_sim(a: str, b: str) -> float:
    """Local alignment (match +1, mismatch −1, gap −1) normalized by the
    best achievable local score, min(len): sim = best/minlen."""
    if not a and not b:
        return 1.0
    if not a or not b:
        return 0.0
    best = 0
    prev = [0] * (len(b) + 1)
    for ca in a:
        cur = [0] * (len(b) + 1)
        for j, cb in enumerate(b, 1):
            cur[j] = max(
                0,
                prev[j - 1] + (1 if ca == cb else -1),
                prev[j] - 1,
                cur[j - 1] - 1,
            )
            if cur[j] > best:
                best = cur[j]
        prev = cur
    return best / min(len(a), len(b))


GOTOH_GAP_OPEN = 1.0
GOTOH_GAP_EXT = 0.4


def gotoh_sim(a: str, b: str) -> float:
    """Gotoh global alignment with affine gaps (match +1, mismatch −1,
    open −1, extend −0.4), normalized as max(0, score)/minlen."""
    if not a and not b:
        return 1.0
    if not a or not b:
        return 0.0
    NEG = float("-inf")
    n = len(b)

    def gap(k: int) -> float:
        return -(GOTOH_GAP_OPEN + GOTOH_GAP_EXT * (k - 1)) if k else 0.0

    # M = align ends in match/mismatch; X = gap in b (consume a); Y = gap in a
    m_prev = [gap(j) if j == 0 else NEG for j in range(n + 1)]
    m_prev[0] = 0.0
    x_prev = [NEG] * (n + 1)
    y_prev = [NEG] * (n + 1)
    for j in range(1, n + 1):
        y_prev[j] = gap(j)
    for i, ca in enumerate(a, 1):
        m_cur = [NEG] * (n + 1)
        x_cur = [NEG] * (n + 1)
        y_cur = [NEG] * (n + 1)
        x_cur[0] = gap(i)
        for j, cb in enumerate(b, 1):
            s = 1.0 if ca == cb else -1.0
            m_cur[j] = max(m_prev[j - 1], x_prev[j - 1], y_prev[j - 1]) + s
            x_cur[j] = max(
                m_prev[j] - GOTOH_GAP_OPEN,
                x_prev[j] - GOTOH_GAP_EXT,
                y_prev[j] - GOTOH_GAP_OPEN,
            )
            y_cur[j] = max(
                m_cur[j - 1] - GOTOH_GAP_OPEN,
                y_cur[j - 1] - GOTOH_GAP_EXT,
                x_cur[j - 1] - GOTOH_GAP_OPEN,
            )
        m_prev, x_prev, y_prev = m_cur, x_cur, y_cur
    score = max(m_prev[n], x_prev[n], y_prev[n])
    return max(0.0, score) / min(len(a), len(b))


# Winkler's strcmp95 similar-character table (partial credit 0.3 for
# "similar" unmatched characters — OCR/phonetic confusions, incl. the
# digit-letter pairs from the published strcmp95.c).
_STRCMP95_PAIRS = [
    ("A", "E"), ("A", "I"), ("A", "O"), ("A", "U"), ("B", "V"), ("E", "I"),
    ("E", "O"), ("E", "U"), ("I", "O"), ("I", "U"), ("O", "U"), ("I", "Y"),
    ("E", "Y"), ("C", "G"), ("E", "F"), ("W", "U"), ("W", "V"), ("X", "K"),
    ("S", "Z"), ("X", "S"), ("Q", "C"), ("U", "V"), ("M", "N"), ("L", "I"),
    ("Q", "O"), ("P", "R"), ("I", "J"), ("2", "Z"), ("5", "S"), ("8", "B"),
    ("1", "I"), ("1", "L"), ("0", "O"), ("0", "Q"), ("C", "K"), ("G", "J"),
]
_SIMILAR: set[tuple[str, str]] = set()
for _x, _y in _STRCMP95_PAIRS:
    _SIMILAR.add((_x, _y))
    _SIMILAR.add((_y, _x))


def strcmp95(a: str, b: str, long_strings: bool = False) -> float:
    """Winkler's strcmp95: Jaro with 0.3 partial credit for 'similar'
    unmatched characters, the standard prefix boost, and (opt-in) the
    long-string adjustment.  ``long_strings`` defaults to False to match
    the reference grid's ``textdistance.StrCmp95()`` default
    (``scripts/prepare_nil_dataset.py:209-253``); when enabled the guard
    follows the published strcmp95.c (first char not a digit), not a
    both-isalpha variant.  Comparison is case-insensitive per the
    original (inputs here are already lowercased by proj(); the table is
    consulted in upper case)."""
    len1, len2 = len(a), len(b)
    if len1 == 0 or len2 == 0:
        # mirror the engine's Jaro convention: any empty side → 0
        return 0.0
    au, bu = a.upper(), b.upper()
    window = max(len1, len2) // 2 - 1
    if window < 0:
        window = 0
    flags1 = [False] * len1
    flags2 = [False] * len2
    m = 0
    for i, c in enumerate(au):
        lo, hi = max(0, i - window), min(len2, i + window + 1)
        for j in range(lo, hi):
            if not flags2[j] and bu[j] == c:
                flags1[i] = flags2[j] = True
                m += 1
                break
    if m == 0:
        return 0.0
    matched1 = [au[i] for i in range(len1) if flags1[i]]
    matched2 = [bu[j] for j in range(len2) if flags2[j]]
    t = sum(x != y for x, y in zip(matched1, matched2)) // 2
    # similar-character partial credit over the UNmatched residue
    rest1 = [au[i] for i in range(len1) if not flags1[i]]
    rest2 = [bu[j] for j in range(len2) if not flags2[j]]
    used = [False] * len(rest2)
    sim_credit = 0.0
    for c in rest1:
        for j, d in enumerate(rest2):
            if not used[j] and (c, d) in _SIMILAR:
                used[j] = True
                sim_credit += 0.3
                break
    ms = m + sim_credit
    weight = (ms / len1 + ms / len2 + (m - t) / m) / 3.0
    if weight <= 0.7:
        return weight
    # prefix boost (identical chars only, up to 4)
    prefix = 0
    for x, y in zip(au[:4], bu[:4]):
        if x != y:
            break
        prefix += 1
    weight += prefix * 0.1 * (1.0 - weight)
    # long-string adjustment (strcmp95.c: applied only when the caller
    # opts in, and only when the first character is not a digit)
    if long_strings:
        minlen = min(len1, len2)
        if minlen > 4 and m > prefix + 1 and 2 * m >= minlen + prefix:
            if not au[0].isdigit():
                weight += (1.0 - weight) * (
                    (m - prefix - 1) / (len1 + len2 - 2 * prefix + 2)
                )
    return weight


# Zobel-Dart Editex phonetic groups; a letter may sit in several groups.
_EDITEX_GROUPS = [
    "aeiouy", "bp", "ckq", "dt", "lr", "mn", "gj", "fpv", "sxz", "csz",
]
_GROUPS_OF: dict[str, set[int]] = {}
for _gi, _g in enumerate(_EDITEX_GROUPS):
    for _c in _g:
        _GROUPS_OF.setdefault(_c, set()).add(_gi)


def _editex_sub(a: str, b: str) -> int:
    if a == b:
        return 0
    if _GROUPS_OF.get(a, set()) & _GROUPS_OF.get(b, set()):
        return 1
    return 2


def _editex_del(prev: str, cur: str) -> int:
    # deleting a silent-ish letter (h/w, or a doubled letter) costs 1
    if cur in ("h", "w") or prev == cur:
        return 1
    return 2


def editex_dist(a: str, b: str) -> int:
    """Zobel & Dart's Editex edit distance (group-aware substitution,
    discounted deletion of h/w and doubled letters)."""
    la, lb = len(a), len(b)
    if la == 0 and lb == 0:
        return 0
    if la == 0:
        return editex_dist(b, a)
    prev_row = [0] * (lb + 1)
    for j in range(1, lb + 1):
        prev_row[j] = prev_row[j - 1] + _editex_del(b[j - 2] if j > 1 else b[0], b[j - 1])
    for i in range(1, la + 1):
        cur = [0] * (lb + 1)
        cur[0] = prev_row[0] + _editex_del(a[i - 2] if i > 1 else a[0], a[i - 1])
        for j in range(1, lb + 1):
            cur[j] = min(
                prev_row[j] + _editex_del(a[i - 2] if i > 1 else a[0], a[i - 1]),
                cur[j - 1] + _editex_del(b[j - 2] if j > 1 else b[0], b[j - 1]),
                prev_row[j - 1] + _editex_sub(a[i - 1], b[j - 1]),
            )
        prev_row = cur
    return prev_row[lb]


def editex_sim(a: str, b: str) -> float:
    """Editex normalized: 1 − dist / (2·maxlen) (2 is the max per-char
    cost, so the ratio is in [0, 1])."""
    mx = max(len(a), len(b))
    return 1.0 - editex_dist(a, b) / (2.0 * mx) if mx else 1.0


DP_PANEL = {
    "strcmp95_base": strcmp95,
    "nw_base": needleman_wunsch_sim,
    "gotoh_base": gotoh_sim,
    "sw_base": smith_waterman_sim,
    "lcs_seq_base": lcs_seq_sim,
    "editex_base": editex_sim,
}


# ---------------------------------------------------------------------------
# Arrow kernels (evaluated once per distinct basename pair)
# ---------------------------------------------------------------------------

_EXT_COLS = list(PY_PANEL)
_EXT_SCHEMA = StructType([StructField(c, DoubleType()) for c in _EXT_COLS])

_FULL_COLS = list(PY_PANEL) + list(DP_PANEL) + [
    "jw_base", "jaro_base", "damerau_base", "charjac_base", "lev_base",
]
_FULL_SCHEMA = StructType([StructField(c, DoubleType()) for c in _FULL_COLS])


def _ext_batch(a: pd.Series, b: pd.Series) -> pd.DataFrame:
    """SQL-expressible extended panel (inputs are ALREADY proj()-ed by the
    caller — the projection lives in the DataFrame plan so the emitted
    columns and the oracle see identical strings)."""
    rows = [
        tuple(fn(x or "", y or "") for fn in PY_PANEL.values())
        for x, y in zip(a, b)
    ]
    return pd.DataFrame(rows, columns=_EXT_COLS)


def _full_batch(a: pd.Series, b: pd.Series) -> pd.DataFrame:
    """All extended + DP distances + the classic five on the same
    projected basenames — the complete textdistance grid in one
    Arrow round-trip."""
    rows = []
    for x, y in zip(a, b):
        x, y = x or "", y or ""
        xb, yb = x.encode(), y.encode()  # ASCII after proj(); bytes == chars
        mx = max(len(xb), len(yb))
        rows.append(
            tuple(fn(x, y) for fn in PY_PANEL.values())
            + tuple(fn(x, y) for fn in DP_PANEL.values())
            + (
                jaro_winkler(xb, yb),
                _jaro(xb, yb),
                1.0 - damerau_levenshtein(xb, yb) / mx if mx else 1.0,
                char_jaccard(xb, yb),
                lcs_like_lev_sim(x, y),
            )
        )
    return pd.DataFrame(rows, columns=_FULL_COLS)


def lcs_like_lev_sim(a: str, b: str) -> float:
    """Levenshtein similarity normalized by max length (plain DP — the
    hot path uses Spark's JVM levenshtein; this exists only so the full
    panel is self-contained in one kernel)."""
    la, lb = len(a), len(b)
    if la == 0 and lb == 0:
        return 1.0
    prev = list(range(lb + 1))
    for i, ca in enumerate(a, 1):
        cur = [i] + [0] * lb
        for j, cb in enumerate(b, 1):
            cur[j] = min(
                prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)
            )
        prev = cur
    return 1.0 - prev[lb] / max(la, lb)


_WORD_COLS = list(WORD_PANEL)
_WORD_SCHEMA = StructType([StructField(c, DoubleType()) for c in _WORD_COLS])


def _word_batch(a: pd.Series, b: pd.Series) -> pd.DataFrame:
    """Word-level (qval=None) panel — inputs already proj()-ed."""
    rows = [
        tuple(fn(x or "", y or "") for fn in WORD_PANEL.values())
        for x, y in zip(a, b)
    ]
    return pd.DataFrame(rows, columns=_WORD_COLS)


ext_panel_udf = F.pandas_udf(_ext_batch, _EXT_SCHEMA)
full_panel_udf = F.pandas_udf(_full_batch, _FULL_SCHEMA)
word_panel_udf = F.pandas_udf(_word_batch, _WORD_SCHEMA)


def proj_col(c: F.Column) -> F.Column:
    """Spark mirror of proj(): project non-printable ASCII, then lower."""
    return F.lower(F.regexp_replace(c, "[^ -~]", "?"))
