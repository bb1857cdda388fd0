#!/usr/bin/env python3
"""Interleaved same-session A/B for the r14 LM-family shared-projection
persists (+ the _okapi_topk persist): old (HEAD) vs new (working tree),
alternating order every round, median over clean rounds.

Usage: ab_lm.py [rounds] [query ...]
"""
from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent))

import lm_old  # noqa: E402

from kafka_dbsync_spark import get_spark  # noqa: E402
import kafka_dbsync_spark.operators.corpus as C  # noqa: E402
import kafka_dbsync_spark.queries as Q  # noqa: E402

SF = "/root/testdata/sf0.1"
PATCH = {
    "bigram_lm_perplexity": lm_old.bigram_lm_perplexity_OLD,
    "trigram_backoff_perplexity": lm_old.trigram_backoff_perplexity_OLD,
    "dsir_importance_weights": lm_old.dsir_importance_weights_OLD,
    "moore_lewis_scores": lm_old.moore_lewis_scores_OLD,
    "nb_train_tables": lm_old.nb_train_tables_OLD,
    "_okapi_topk": lm_old._okapi_topk_OLD,
}
DEFAULT_QUERIES = [
    "lm_perplexity",
    "lm_trigram_backoff",
    "dsir_weights",
    "moore_lewis_selection",
    "nb_source_predict",
    "bm25_search",
    "bm25_phrase_search",
]


def run(spark, name, old: bool) -> float:
    saved = {}
    if old:
        for k, v in PATCH.items():
            saved[k] = getattr(C, k)
            setattr(C, k, v)
    try:
        t0 = time.perf_counter()
        Q.QUERIES[name](spark, SF).write.format("noop").mode(
            "overwrite"
        ).save()
        return time.perf_counter() - t0
    finally:
        for k, v in saved.items():
            setattr(C, k, v)


def main():
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    queries = sys.argv[2:] or DEFAULT_QUERIES
    spark = get_spark(app_name="ab-lm")
    for name in queries:
        # warm both paths once
        run(spark, name, old=True)
        run(spark, name, old=False)
        ts = {"old": [], "new": []}
        for rnd in range(rounds):
            order = ["old", "new"] if rnd % 2 == 0 else ["new", "old"]
            for tag in order:
                dt = run(spark, name, old=(tag == "old"))
                ts[tag].append(dt)
        for tag in ("old", "new"):
            xs = sorted(ts[tag])
            print(
                f"{name:24s} {tag}: median {xs[len(xs) // 2]:.3f} "
                f"best {xs[0]:.3f} all {[round(x, 2) for x in ts[tag]]}",
                flush=True,
            )


if __name__ == "__main__":
    main()
