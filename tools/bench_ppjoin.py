"""PPJoin growth diagnostics: time the exact set-similarity join at a
given corpus and report the candidate/true-pair ratio.

The claim under test (ROADMAP / docs/scale.md): candidate generation is
prefix-bounded while OUTPUT is inherently quadratic on gen_scale corpora
(a C-copy scale-up grows every near-dup cluster to C members, so true
pairs grow Θ(C²)). If candidates/true-pairs stays a small constant as the
corpus grows, runtime growth is output-bound — the algorithm is doing no
avoidable work — rather than candidate-bound (filter decay).

Usage: python tools/bench_ppjoin.py [sf_dir] [runs]
"""

import sys
import time

sys.path.insert(0, ".")

from backtest_crew_datalake_spark.session import get_spark  # noqa: E402
from backtest_crew_datalake_spark.queries import load  # noqa: E402
from backtest_crew_datalake_spark.pipeline.dedup import (  # noqa: E402
    _ppjoin_candidates,
    _ppjoin_verify,
    ppjoin_pairs,
)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = get_spark()
    docs_tbl = load(spark, sf_dir, "documents")

    times = []
    n_pairs = None
    for _ in range(runs):
        t0 = time.time()
        n_pairs = ppjoin_pairs(docs_tbl, n=3, threshold=0.6).count()
        times.append(time.time() - t0)

    # candidate count measured once, outside the timed runs (the count
    # itself is diagnostic work the production query never does)
    docs, cand = _ppjoin_candidates(docs_tbl, "text", "doc_id", 3, 0.6)
    n_cand = cand.count()

    med = sorted(times)[len(times) // 2]
    print(
        f"dir={sf_dir} median={med:.1f}s times={[round(t, 1) for t in times]} "
        f"candidates={n_cand} true_pairs={n_pairs} "
        f"cand_per_pair={n_cand / max(1, n_pairs):.2f}"
    )


if __name__ == "__main__":
    main()
