"""Property-based parity fuzzing (no Spark session needed): the Python
string-distance implementations must agree with DuckDB on arbitrary
inputs, not just the hand-picked cases — these functions define the
oracle contract for every scored pair. Plus NetPBM codec round-trip."""

from __future__ import annotations

import math
import os
import sys

import duckdb
import numpy as np
from hypothesis import given, settings, strategies as st

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from blink_spark import multimodal, scoring

# path-basename-like alphabet plus some unicode to stress indexing
ALPHA = "abcXYZ019._-üπ"
words = st.text(alphabet=ALPHA, min_size=0, max_size=24)

_con = duckdb.connect()


def _duck(sql: str, a: str, b: str):
    return _con.execute(sql, [a, b]).fetchone()[0]


# DuckDB's string distances are BYTE-based (UTF-8); the engine calls its
# implementations on encoded bytes (scoring._panel_batch) — fuzz the same
# calling convention, unicode included.

@settings(max_examples=300, deadline=None)
@given(words, words)
def test_damerau_levenshtein_parity(a, b):
    got = scoring.damerau_levenshtein(a.encode(), b.encode())
    want = _duck("SELECT damerau_levenshtein(?, ?)", a, b)
    assert got == want, (a, b, got, want)


@settings(max_examples=300, deadline=None)
@given(words, words)
def test_jaro_and_jw_parity(a, b):
    assert math.isclose(
        scoring._jaro(a.encode(), b.encode()),
        _duck("SELECT jaro_similarity(?, ?)", a, b),
        abs_tol=1e-12,
    ), (a, b)
    assert math.isclose(
        scoring.jaro_winkler(a.encode(), b.encode()),
        _duck("SELECT jaro_winkler_similarity(?, ?)", a, b),
        abs_tol=1e-12,
    ), (a, b)


@settings(max_examples=300, deadline=None)
@given(
    st.text(alphabet=ALPHA, min_size=1, max_size=24),
    st.text(alphabet=ALPHA, min_size=1, max_size=24),
)
def test_char_jaccard_parity(a, b):
    got = scoring.char_jaccard(a.encode(), b.encode())
    want = _duck("SELECT jaccard(?, ?)", a, b)
    assert math.isclose(got, want, abs_tol=1e-12), (a, b, got, want)


@settings(max_examples=60, deadline=None)
@given(
    st.integers(min_value=1, max_value=40),
    st.integers(min_value=1, max_value=40),
    st.booleans(),
    st.integers(min_value=0, max_value=2**32 - 1),
)
def test_ppm_round_trip(w, h, color, seed):
    rng = np.random.RandomState(seed)
    shape = (h, w, 3) if color else (h, w)
    img = rng.randint(0, 256, size=shape).astype(np.uint8)
    out = multimodal.decode_image(multimodal.encode_ppm(img))
    assert out.shape == img.shape
    assert (out == img).all()
