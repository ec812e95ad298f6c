"""Deterministic synthetic source-code corpus (FIXTURES.md §1-2).

Generates the engine's input table — one row per source-code file version,
``(repo, path, commit, lang, content)`` per ``BASELINE.json input_hint`` —
plus a ``gold_cluster`` column (ground-truth entity id, the analog of the
reference's gold ``Wikipedia_ID`` on every benchmark mention,
``blink/main_dense.py:195-241``).

Everything is a pure function of (seed, scale): fixed ``RandomState(42)``,
no wall clock, no unseeded RNG — mirrors the reference's fixed-seed
discipline (``blink/common/params.py:84-85``, seed 1234 splits at
``scripts/feature_ablation_study.py:925``).

Cluster member mutations (the "mention variety" analog):
- exact duplicates            → MUST match (content_sha equality)
- comment-line insertion      → near-duplicates, MUST match
- single identifier rename    → should match (high shingle overlap)
Hard negatives: independent canonical bodies sharing the same
``(lang, path_stem)`` blocking key — same block, MUST NOT match.
Pathological skew: LICENSE-style clusters with hundreds of members
(exercises salting; the failure mode the single-node reference never faced).
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd

SEED = 42

LANGS = [("py", "py"), ("java", "java"), ("c", "c"), ("js", "js"), ("go", "go")]
STEMS = [
    "utils", "parse_args", "config", "main", "client", "server", "cache",
    "logger", "models", "schema", "handlers", "router", "auth", "metrics",
    "worker", "queue", "storage", "codec", "session", "validate",
]
DIRS = ["src", "lib", "core", "internal", "pkg", "app", "common", "tools"]

_VOCAB_A = [
    "load", "parse", "merge", "split", "flush", "retry", "batch", "chunk",
    "encode", "decode", "index", "lookup", "insert", "remove", "update",
    "scan", "filter", "reduce", "map", "fold", "hash", "sign", "verify",
    "open", "close", "read", "write", "seek", "sync", "poll", "wait",
]
_VOCAB_B = [
    "buffer", "stream", "record", "table", "column", "row", "field", "key",
    "value", "node", "edge", "graph", "tree", "list", "queue", "stack",
    "cursor", "handle", "socket", "packet", "frame", "block", "page",
    "segment", "shard", "token", "span", "offset", "limit", "count",
]
_VOCAB_C = [
    "timeout", "backoff", "quorum", "replica", "leader", "epoch", "term",
    "txn", "commit", "abort", "lease", "clock", "delta", "snapshot",
    "journal", "manifest", "catalog", "region", "bucket", "prefix",
]

ROWS_BY_SF = {0.001: 600, 0.01: 2400, 0.1: 24000}


def _ident(rng: np.random.RandomState) -> str:
    return f"{_VOCAB_A[rng.randint(len(_VOCAB_A))]}_{_VOCAB_B[rng.randint(len(_VOCAB_B))]}{rng.randint(100)}"


def _canonical_body(rng: np.random.RandomState, cluster_idx: int) -> str:
    """A code-looking canonical file body with cluster-specific identifiers."""
    n_lines = int(rng.randint(12, 36))
    idents = [_ident(rng) for _ in range(6)]
    lines = []
    for _ in range(n_lines):
        kind = rng.randint(4)
        a = _VOCAB_A[rng.randint(len(_VOCAB_A))]
        b = _VOCAB_B[rng.randint(len(_VOCAB_B))]
        c = _VOCAB_C[rng.randint(len(_VOCAB_C))]
        ident = idents[rng.randint(len(idents))]
        if kind == 0:
            lines.append(f"def {a}_{b}({ident}, {c}):")
        elif kind == 1:
            lines.append(f"    {ident} = {a}({b}, {c}={rng.randint(1000)})")
        elif kind == 2:
            lines.append(f"    if {ident}.{a}({b}):")
        else:
            lines.append(f"    return {a}_{b}({ident}, {c})")
    lines.append(f"# cluster marker {cluster_idx}")
    return "\n".join(lines)


def _license_body(rng: np.random.RandomState, kind: int) -> str:
    head = ["permission", "notice", "warranty", "liability"][kind % 4]
    n = int(rng.randint(18, 26))
    words = []
    for _ in range(n * 8):
        pool = (_VOCAB_A, _VOCAB_B, _VOCAB_C)[rng.randint(3)]
        words.append(pool[rng.randint(len(pool))])
    lines = [f"{head} license text variant {kind}"]
    for i in range(0, len(words), 8):
        lines.append(" ".join(words[i : i + 8]))
    return "\n".join(lines)


def _mutate(rng: np.random.RandomState, body: str, kind: int) -> str:
    """Seeded near-duplicate mutations; keep shingle overlap high."""
    lines = body.split("\n")
    if kind == 0:  # exact duplicate
        return body
    if kind == 1:  # insert 1-3 comment lines
        for _ in range(int(rng.randint(1, 4))):
            pos = int(rng.randint(len(lines)))
            a = _VOCAB_A[rng.randint(len(_VOCAB_A))]
            c = _VOCAB_C[rng.randint(len(_VOCAB_C))]
            lines.insert(pos, f"# note {a} {c} {rng.randint(100)}")
        return "\n".join(lines)
    # kind == 2: single identifier rename (global)
    toks = [t for t in body.replace("\n", " ").split(" ") if "_" in t and "(" not in t]
    if toks:
        tgt = toks[int(rng.randint(len(toks)))].strip(",:.()=")
        if tgt:
            return body.replace(tgt, tgt + "x")
    return body


def generate_source_files(sf: float, seed: int = SEED) -> pd.DataFrame:
    rng = np.random.RandomState(seed)
    target_rows = ROWS_BY_SF.get(sf, max(60, int(round(240_000 * sf))))

    rows: list[tuple[str, str, str, str, str, str]] = []

    def emit(cluster_id: str, lang: str, ext: str, stem: str, body: str) -> None:
        repo = f"org{rng.randint(40)}/repo{rng.randint(50)}"
        d = DIRS[rng.randint(len(DIRS))]
        commit = "".join(f"{b:02x}" for b in rng.randint(0, 256, size=20))
        rows.append((repo, f"{d}/{stem}.{ext}", commit, lang, body, cluster_id))

    # pathological skew blocks: 2 license "entities" with many exact members
    n_license = max(20, target_rows // 12)
    for kind in range(2):
        body = _license_body(rng, kind)
        for _ in range(n_license):
            mut = _mutate(rng, body, int(rng.randint(2)))  # exact or comments
            emit(f"license{kind}", "txt", "txt", "LICENSE", mut)

    cluster_idx = 0
    while len(rows) < target_rows:
        lang, ext = LANGS[rng.randint(len(LANGS))]
        stem = STEMS[rng.randint(len(STEMS))]
        body = _canonical_body(rng, cluster_idx)
        cid = f"c{cluster_idx}"
        # ~20% singletons (NIL analog: mention with no duplicate)
        n_members = 1 if rng.rand() < 0.2 else int(rng.randint(2, 7))
        emit(cid, lang, ext, stem, body)
        for _ in range(n_members - 1):
            emit(cid, lang, ext, stem, _mutate(rng, body, int(rng.randint(3))))
        cluster_idx += 1

    df = pd.DataFrame(
        rows, columns=["repo", "path", "commit", "lang", "content", "gold_cluster"]
    )
    # deterministic interleave (seeded), so clusters aren't file-adjacent
    perm = np.random.RandomState(seed + 1).permutation(len(df))
    return df.iloc[perm].reset_index(drop=True)


def sf_from_dir(sf_dir: str) -> float:
    """Parse '/root/testdata/sf0.01' → 0.01."""
    base = os.path.basename(os.path.normpath(sf_dir))
    if base.startswith("sf"):
        return float(base[2:])
    return 0.01


def fixture_path(sf: float, root: str | None = None) -> str:
    root = root or os.path.join(os.path.dirname(os.path.dirname(__file__)), "fixtures")
    return os.path.join(root, f"source_files_sf{sf}.parquet")


def ensure_fixture(sf: float, root: str | None = None) -> str:
    """Write (once) and return the deterministic fixture parquet path."""
    path = fixture_path(sf, root)
    if not os.path.exists(path):
        os.makedirs(os.path.dirname(path), exist_ok=True)
        df = generate_source_files(sf)
        df.to_parquet(path, index=False)
    return path
