"""A/B evidence for the round-4 near-dup band-join fix: the pre-fix
fat-payload uncapped band self-join vs the shared capped+salted ids-only
path (``blocking.banded_pairs`` + post-dedup payload fetch), on a corpus
with a HOT boilerplate band — the degenerate case the fix exists for.

Corpus: N_DOCS synthetic documents; near-dup families of ~4 variants each
(the signal), plus N_BOILER documents sharing one boilerplate prefix long
enough to dominate their minhash bands (the hot key: at corpus scale this
is the LICENSE / generated-header pathology). The old plan carries both
sides' full shingle-hash arrays through the O(hot²) pre-dedup pair
shuffle; the new plan carries two longs and salts the hot band.

Usage: python tools/neardup_ab.py [n_docs] [n_boiler] [variant: old|new|both]
Prints one JSON line per variant: {"variant", "wall_s", "n_pairs"}.
Run each variant in a FRESH process for honest peak-memory/GC behavior:
the tool recurses via subprocess when asked for `both`.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_DOCS = int(sys.argv[1]) if len(sys.argv) > 1 else 40_000
N_BOILER = int(sys.argv[2]) if len(sys.argv) > 2 else 3_000
VARIANT = sys.argv[3] if len(sys.argv) > 3 else "both"

BOILER = (
    "license apache version two permission granted free of charge to any "
    "person obtaining copy of this software and associated documentation "
    "files to deal in the software without restriction including rights "
    "to use copy modify merge publish distribute sublicense and sell "
)


def build_corpus(spark):
    from pyspark.sql import functions as F

    base = spark.range(N_DOCS).select(F.col("id").alias("doc_id"))
    # family text: ~30 hash-derived tokens keyed by doc_id//4 so each
    # family of 4 is a near-dup cluster with essentially no cross-family
    # shingle overlap (a closed 14-word alphabet collided bands across
    # families at 60k docs, drowning the hot-band signal under an O(n²/16)
    # verify join); variant word salts per member
    fam = (F.col("doc_id") / 4).cast("long")
    words = F.concat_ws(
        " ",
        *[
            F.substring(F.md5(F.concat(fam.cast("string"), F.lit(f"_{i}"))), 1, 8)
            for i in range(30)
        ],
    )
    variant_salt = F.concat(F.lit("v"), F.pmod(F.col("doc_id"), 4).cast("string"))
    text = F.concat_ws(" ", words, variant_salt)
    # boilerplate prefix on the first N_BOILER docs — long enough that
    # their minhash bands collide: the hot band
    text = F.when(
        F.col("doc_id") < N_BOILER, F.concat_ws(" ", F.lit(BOILER * 3), text)
    ).otherwise(text)
    return base.select("doc_id", text.alias("text"))


def run(variant: str) -> dict:
    from pyspark.sql import functions as F

    from blink_spark import blocking, minhash, scoring, textops
    from blink_spark.session import get_spark

    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "48g")
    spark = get_spark(
        app_name=f"neardup_ab_{variant}",
        master="local[16]",
        shuffle_partitions=128,
    )
    spark.sparkContext.setLogLevel("ERROR")
    docs = build_corpus(spark).persist()
    docs.count()

    toks = minhash.tokens_col(F.col("text"))
    df = docs.withColumn("tokens", toks)
    df = df.withColumn("shingles", minhash.shingles_col(F.col("tokens")))
    df = df.withColumn(
        "sh_hashes", minhash.shingle_hashes_col(F.col("shingles"))
    )

    t0 = time.monotonic()
    if variant == "old":
        # pre-round-4 plan: fat payload through the uncapped band join
        d2 = df.withColumn(
            "minhash_sig", minhash.minhash_signature_col(F.col("sh_hashes"))
        ).withColumn("band_keys", minhash.band_keys_col(F.col("minhash_sig")))
        memb = d2.select("doc_id", "sh_hashes", F.explode("band_keys").alias("bk"))
        left = memb.select(
            F.col("doc_id").alias("left_id"), F.col("sh_hashes").alias("l_h"), "bk"
        )
        right = memb.select(
            F.col("doc_id").alias("right_id"), F.col("sh_hashes").alias("r_h"), "bk"
        )
        pairs = (
            left.join(right, "bk")
            .filter(F.col("left_id") < F.col("right_id"))
            .select("left_id", "right_id", "l_h", "r_h")
            .dropDuplicates(["left_id", "right_id"])
        )
        out = pairs.withColumn(
            "jaccard", scoring.jaccard_col(F.col("l_h"), F.col("r_h"))
        ).filter(F.col("jaccard") >= textops.NEAR_DUP_TAU)
    else:
        feat = df.select(
            F.col("doc_id").alias("file_id"),
            "sh_hashes",
            minhash.band_keys_col(
                minhash.minhash_signature_col(F.col("sh_hashes"))
            ).alias("block_keys"),
        ).persist()
        memb = feat.select("file_id", F.explode("block_keys").alias("block_key"))
        pairs = blocking.banded_pairs(memb)
        fetched = scoring.pair_feature_join(
            pairs, feat.select("file_id", "sh_hashes"), broadcast_features=False
        )
        out = fetched.withColumn(
            "jaccard", scoring.jaccard_col(F.col("l_sh_hashes"), F.col("r_sh_hashes"))
        ).filter(F.col("jaccard") >= textops.NEAR_DUP_TAU)
    n = out.count()
    wall = time.monotonic() - t0
    spark.stop()
    return {
        "variant": variant,
        "n_docs": N_DOCS,
        "n_boiler": N_BOILER,
        "wall_s": round(wall, 2),
        "n_pairs": n,
    }


def main() -> None:
    if VARIANT in ("old", "new"):
        print(json.dumps(run(VARIANT)))
        return
    for v in ("old", "new"):
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__),
             str(N_DOCS), str(N_BOILER), v],
            capture_output=True, text=True,
        )
        line = out.stdout.strip().splitlines()[-1] if out.stdout.strip() else ""
        if out.returncode != 0:
            print(json.dumps({
                "variant": v,
                "error": (out.stderr or "failed")[-400:],
            }))
        else:
            print(line)


if __name__ == "__main__":
    main()
