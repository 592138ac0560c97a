"""Big-document verify rehearsal (round 10): measure verify="full" vs
verify="estimate" where the estimate path is DESIGNED to win — web-scale
document sizes.

The sf replicas average ~52 shingles/doc, so their hashed verify arrays
(~416 B/side) are already fingerprint-sized and the estimate's interpreted
byte-agreement count costs more than the array join it skips (BASELINE
round-10). Real web documents run 300-3000 shingles; there the 32-long
fingerprints undercut the arrays 10-100x. This script synthesizes that
regime deterministically:

* ``n_docs`` documents of ``words_per_doc`` words drawn from a vocabulary
  sized to keep background trigram overlap low (uniform corpus shape);
* every ``dup_every``-th document is a near-dup of its predecessor (tail
  mutation — jaccard ~0.9);

and runs minhash_portable_pairs at the autotuned uniform geometry
(256 hashes, r=2/b=128) both ways, printing wall time, emitted pairs, and
the equality check. Shuffle bytes: read the "shuffle write" totals off the
stage metrics via spark.sparkContext.statusTracker-less route — we report
the candidate count and rely on the per-mode wall + the sf10 spill
accounting in bench_sf3_whales.py for byte-level claims.

Usage: python scripts/bigdoc_verify_rehearsal.py [n_docs] [words_per_doc]
       (defaults 20000 x 600)
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    import numpy as np
    from pyspark.sql import functions as F

    from apollo_spark.ops.dedup import minhash_portable_pairs
    from apollo_spark.session import get_spark

    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 20000
    wpd = int(sys.argv[2]) if len(sys.argv) > 2 else 600
    spark = get_spark("bigdoc_verify")
    spark.sparkContext.setLogLevel("ERROR")

    rng = np.random.default_rng(7)
    vocab = np.array([f"w{i}" for i in range(50000)])
    rows = []
    prev_words = None
    for i in range(n_docs):
        if prev_words is not None and i % 10 == 9:
            # near-dup of predecessor: mutate the last 5% of words
            words = prev_words.copy()
            k = max(1, len(words) // 20)
            words[-k:] = vocab[rng.integers(0, len(vocab), k)]
        else:
            words = vocab[rng.integers(0, len(vocab), wpd)]
        rows.append((i, " ".join(words.tolist())))
        prev_words = words
    d = spark.createDataFrame(rows, "doc_id long, text string").repartition(32).persist()
    d.count()

    out = {}
    pair_sets = {}
    for mode in ("full", "estimate"):
        t0 = time.time()
        pairs = minhash_portable_pairs(
            d,
            n=3,
            num_hashes=256,
            bands=128,
            threshold=0.5,
            max_bucket=64,
            max_bucket_mode="reband",
            verify=mode,
        )
        got = {(r["id_a"], r["id_b"]): r["jaccard"] for r in pairs.collect()}
        out[mode] = {"secs": round(time.time() - t0, 2), "pairs": len(got)}
        pair_sets[mode] = got
        spark.catalog.clearCache()
        d.persist().count()  # re-pin the corpus for the next mode

    out["equal"] = pair_sets["full"] == pair_sets["estimate"]
    out["n_docs"], out["words_per_doc"] = n_docs, wpd
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
