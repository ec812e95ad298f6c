"""Edge-case pins for the corpus-hygiene ops added late in round 3:
PII detection/redaction (tricky negatives: version strings, five-octet
runs, bare '@'), the trigram-LM scorer on degenerate short texts, and the
decontamination census's benchmark-side exclusion invariant."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from blink_spark import textops


def _pii_counts(spark, text, doc_id=1):
    # doc_id=1 matches none of the augmentation mods -> aug == text
    df = spark.createDataFrame([(doc_id, text)], "doc_id long, text string")
    df = df.withColumn("aug", textops._pii_augmented_col())
    row = df.select(
        F.regexp_count("aug", F.lit(textops.PII_EMAIL_RE)).alias("e"),
        F.regexp_count("aug", F.lit(textops.PII_IP_RE)).alias("i"),
        F.regexp_count("aug", F.lit(textops.PII_PHONE_RE)).alias("p"),
    ).collect()[0]
    return row.e, row.i, row.p


def test_pii_positives(spark):
    assert _pii_counts(spark, "mail bob.smith+x@sub.example.co.uk now") == (1, 0, 0)
    assert _pii_counts(spark, "ping 10.0.0.1 then 192.168.1.255") == (0, 2, 0)
    assert _pii_counts(spark, "call +44 123 4567 today") == (0, 0, 1)


def test_pii_tricky_negatives(spark):
    # version strings and bare @ must not fire
    assert _pii_counts(spark, "upgrade to v1.2.3 or 2.0 now") == (0, 0, 0)
    assert _pii_counts(spark, "user @ host, see docs") == (0, 0, 0)
    # unspaced phone-like digits don't match the phone pattern
    assert _pii_counts(spark, "id +15550142 is not a phone") == (0, 0, 0)


def test_pii_five_octet_run_counts_once(spark):
    # \b\d{1,3}(\.\d{1,3}){3}\b on "1.2.3.4.5": the first window
    # "1.2.3.4" ends before '.5' where \b holds between '4' and '.'.
    # Pin the behavior (exactly one match, same in the DuckDB oracle's
    # RE2) so a regex edit can't silently change the census.
    assert _pii_counts(spark, "path 1.2.3.4.5 deep") == (0, 1, 0)


def test_pii_redaction_removes_all_matches(spark):
    df = spark.createDataFrame(
        [(7 * 11 * 13, "base text")], "doc_id long, text string"
    )  # doc_id hits all three augmentation mods
    aug = df.withColumn("aug", textops._pii_augmented_col())
    red = aug.select(
        F.regexp_replace(
            F.regexp_replace(
                F.regexp_replace(
                    F.col("aug"), textops.PII_EMAIL_RE, "<EMAIL>"
                ),
                textops.PII_IP_RE,
                "<IP>",
            ),
            textops.PII_PHONE_RE,
            "<PHONE>",
        ).alias("r")
    ).collect()[0].r
    assert "<EMAIL>" in red and "<IP>" in red and "<PHONE>" in red
    for pat in (textops.PII_EMAIL_RE, textops.PII_IP_RE, textops.PII_PHONE_RE):
        assert (
            spark.range(1)
            .select(F.regexp_count(F.lit(red), F.lit(pat)).alias("n"))
            .collect()[0]
            .n
            == 0
        )


def test_trigram_logprob_short_and_repetitive_docs(spark):
    rows = [
        (0, "ab"),        # shorter than n: the text itself is the one gram
        (1, "aaaaaaaa"),  # one distinct trigram, highest corpus count
        (2, "abcdefgh"),  # all-distinct trigrams
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    import blink_spark.textops as t

    orig = t.load_documents
    t.load_documents = lambda _s, _d: df
    try:
        out = {r.doc_id: r for r in t.q_doc_trigram_logprob(spark, "x").collect()}
    finally:
        t.load_documents = orig
    assert out[0].n_trigrams == 1
    assert out[1].n_trigrams == 6
    assert out[2].n_trigrams == 6
    # the repetitive doc is the most "typical" under its own LM: lower
    # cross-entropy than the all-distinct doc
    assert out[1].xent_bits < out[2].xent_bits


def test_decontamination_excludes_benchmark_docs_from_output(spark):
    import blink_spark.textops as t

    rows = [(i, "alpha beta gamma delta epsilon zeta eta theta iota") for i in
            range(0, 120, 10)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    orig = t.load_documents
    t.load_documents = lambda _s, _d: df
    try:
        out = t.q_doc_decontamination(spark, "x").collect()
    finally:
        t.load_documents = orig
    ids = {r.doc_id for r in out}
    assert all(i % t.DECON_BENCH_MOD != 0 for i in ids)
    # every non-benchmark doc here shares its 8-gram with doc 0/50/100
    assert all(r.n_contaminated == r.n_shingles for r in out)


def _plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_bm25_probe_side_broadcasts(spark):
    df = textops.q_doc_bm25_search(spark, "/root/testdata/sf0.001")
    plan = _plan(df)
    # query terms + df dictionary + corpus stats all broadcast: the
    # postings never shuffle on the term for the probe
    assert plan.count("BroadcastExchange") >= 2
    assert "CartesianProduct" not in plan


def test_trigram_lm_model_broadcasts(spark):
    df = textops.q_doc_trigram_logprob(spark, "/root/testdata/sf0.001")
    plan = _plan(df)
    # the trigram-count "model" is vocabulary-sized -> broadcast probe;
    # the 1-row total is a broadcast nested-loop, never a cartesian
    assert "BroadcastExchange" in plan
    assert "CartesianProduct" not in plan


def test_pii_census_is_scan_only(spark):
    df = textops.q_doc_pii_census(spark, "/root/testdata/sf0.001")
    plan = _plan(df)
    # embarrassingly parallel: no exchange of any kind in the plan
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan


def test_lang_source_pivot_is_single_aggregate(spark):
    df = textops.q_doc_lang_source_pivot(spark, "/root/testdata/sf0.001")
    plan = _plan(df)
    # explicit pivot values -> no extra distinct-scan to discover
    # columns; Spark's pivot is the two-level aggregate (corpus shuffles
    # ONCE on (source, lang) partials; the second exchange re-keys only
    # the pre-aggregated cell table on source).  "Exchange (" matches
    # tree nodes once; the details section renders them as "(N)
    # Exchange".
    assert plan.count("Exchange (") <= 2
    # one corpus scan feeds the whole crosstab, column-pruned to the
    # three referenced columns
    assert plan.count("+- Scan parquet") == 1
    assert "ReadSchema: struct<lang:string,source:string,n_chars:bigint>" in plan
    assert "CartesianProduct" not in plan
    rows = {r.source: r for r in df.collect()}
    # absent (lang, source) cells canonicalize to 0, never NULL
    assert all(
        getattr(r, c) is not None
        for r in rows.values()
        for c in df.columns
        if c != "source"
    )


def test_chunk_sliding_covers_every_token_exactly(spark):
    chunks = textops.q_doc_chunk_sliding(spark, "/root/testdata/sf0.001")
    rows = chunks.collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    toks = {
        r.doc_id: r.n_tokens
        for r in textops.q_doc_token_stats(
            spark, "/root/testdata/sf0.001"
        ).select("doc_id", "n_tokens").collect()
    }
    for doc_id, rs in by_doc.items():
        rs.sort(key=lambda r: r.chunk_idx)
        n = toks[doc_id]
        # contiguous chunk ids, every chunk non-empty and ≤ CHUNK_TOKENS
        assert [r.chunk_idx for r in rs] == list(range(len(rs)))
        assert all(0 < r.n_chunk_tokens <= textops.CHUNK_TOKENS for r in rs)
        # the last window reaches the end of the document: its start +
        # length == n (slice clamps), and one more stride would be empty
        last = rs[-1]
        assert last.chunk_idx * textops.CHUNK_STRIDE + last.n_chunk_tokens == n
        assert (last.chunk_idx + 1) * textops.CHUNK_STRIDE >= n
    # every non-empty doc chunked
    assert set(by_doc) == {d for d, n in toks.items() if n > 0}


def test_pack_sequences_greedy_invariants(spark):
    packed = textops.q_doc_pack_sequences(
        spark, "/root/testdata/sf0.001"
    ).collect()
    from collections import defaultdict

    seqs = defaultdict(list)
    for r in packed:
        seqs[(r.shard, r.seq_id)].append(r)
    for (shard, seq_id), rs in seqs.items():
        rs.sort(key=lambda r: r.pos_in_seq)
        # positions contiguous from 0; fill never exceeds the budget
        assert [r.pos_in_seq for r in rs] == list(range(len(rs)))
        assert sum(r.n_tokens for r in rs) <= textops.PACK_BUDGET
    # greedy tightness: consecutive sequences in a shard could not be
    # merged (first doc of seq k+1 does not fit in seq k)
    by_shard = defaultdict(dict)
    for (shard, seq_id), rs in seqs.items():
        by_shard[shard][seq_id] = rs
    for shard, m in by_shard.items():
        for k in range(len(m) - 1):
            fill_k = sum(r.n_tokens for r in m[k])
            first_next = min(m[k + 1], key=lambda r: r.pos_in_seq)
            assert fill_k + first_next.n_tokens > textops.PACK_BUDGET
    # every doc packed exactly once
    ids = [r.doc_id for r in packed]
    assert len(ids) == len(set(ids)) == 500


def test_bpe_merges_match_python_recompute(spark):
    """doc_bpe_merges must equal a regex-module recompute of the first
    BPE merge census (Python `re` vs Java regex vs DuckDB RE2 — a third
    engine agreeing pins the pretokenizer's cross-engine contract), and
    the ranking must be the deterministic (count DESC, pair ASC) order."""
    import re
    from collections import Counter

    docs = textops.load_documents(spark, "/root/testdata/sf0.001").select(
        "text"
    ).collect()
    tok_re = re.compile(textops.BPE_TOKEN_RE)
    word_re = re.compile(r"^ ?[A-Za-z]+$")
    words = Counter()
    for r in docs:
        for w in tok_re.findall(r.text):
            if word_re.match(w):
                words[w] += 1
    pairs = Counter()
    for w, n in words.items():
        for i in range(len(w) - 1):
            pairs[w[i : i + 2]] += n
    expected = sorted(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[
        : textops.BPE_MERGE_TOP_K
    ]

    got = sorted(
        textops.q_doc_bpe_merges(spark, "/root/testdata/sf0.001").collect(),
        key=lambda r: r.rank,
    )
    assert [(r.pair, r.n_occurrences) for r in got] == expected
    assert [r.rank for r in got] == list(range(1, len(got) + 1))
    # the fixture corpus is English-heavy: the space-joined bigrams that
    # seed real BPE vocabularies must dominate the head
    assert any(r.pair.startswith(" ") for r in got[:10])
