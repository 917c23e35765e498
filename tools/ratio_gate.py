#!/usr/bin/env python3
"""Scale-ratio gate: diff a scale-smoke bench artifact (default
BENCH_sf1.json, 10x data) against the sf0.1 per-query map
(BENCH_detail.json) and FAIL on any query whose time grew more than
THRESHOLD x on 10x data, unless it is on the documented
quadratic-by-design whitelist below.

This is the automated form of the round-5 verdict's manual audit: a
linear-plan query on 10x data on 32 local cores should land well under
15x (10x work, some constant overheads); anything above that either
has a scale cliff or needs a written justification HERE, next to the
name, where the next reader finds it.

Usage: python3 tools/ratio_gate.py [BENCH_sf1.json [BENCH_detail.json]]
Exit 0 = gate passes; 1 = violations found.
"""
import json
import sys

THRESHOLD = 15.0
# Queries whose cost is super-linear BY DESIGN, each with the reason it
# is allowed to stay that way (all are ground-truth/monitor roles with a
# registered linear-path sibling, or solver internals):
WHITELIST = {
    "dedup_ngram_jaccard":
        "exact all-shingle Jaccard - the ground-truth monitor the LSH "
        "path (dedup_minhash_lsh) is measured against; production runs "
        "the registered linear sibling dedup_ngram_jaccard_capped "
        "(df-capped co-count join). Measured 14.9x at round-9 sf1 - "
        "one box wobble from the 15x threshold, whitelisted round 10 "
        "so an honest exact-by-design plan cannot flip the gate red "
        "on a loaded box",
    "dedup_containment":
        "exact containment over the all-shingle co-count join - same "
        "ground-truth role as dedup_ngram_jaccard; production runs "
        "dedup_containment_capped (df-capped, linear)",
    "dedup_threshold_sweep":
        "knob-tuning monitor: exact pair curve over the bounded monitor "
        "sample; sample share is the cost knob",
    "dedup_clusters":
        "exact-edge connected components - ground truth for "
        "dedup_clusters_lsh (the registered production path)",
    "dedup_cluster_agreement":
        "clustering-agreement monitor - CONTAINS the whitelisted "
        "exact-edge CC (dedup_clusters) by construction as its ground "
        "truth side; production runs dedup_clusters_lsh, and sampling "
        "the exact side would split clusters and distort the very "
        "transitivity effect the monitor measures (round-12 byte_gate "
        "finding: 78x shuffle_rd at sf1, wall 12.6x - the exact "
        "co-count join, same class as dedup_ngram_jaccard)",
    "ml_item_similarity":
        "uncapped exact item-item cosine - ground truth for "
        "ml_item_similarity_capped (the registered scale path)",
    "ml_als_recommendations":
        "spark.ml ALS blocked factor cross-product - solver-internal "
        "CartesianProduct, documented rows-only",
    "ml_precision_at_10":
        "the ONE uncapped all-users ranking-eval twin kept as ground "
        "truth - ml_ndcg_at_10 / ml_map_at_10 / ml_matrix_stats ride "
        "the capped similarity + bounded md5 user sample (the "
        "registered linear eval path, round-7)",
}


def load(path):
    with open(path) as f:
        d = json.load(f)
    q = dict(d.get("queries", {}))
    # The bench re-times any query whose in-run reading exceeded 4x
    # its committed value and records both numbers; the retime is the
    # uncontended measurement, so the gate judges THAT one (the in-run
    # spike stays visible in the artifact for attribution).
    for name, t in d.get("retimed", {}).items():
        if name in q and t > 0:
            q[name] = min(q[name], t)
    return q


def main():
    sf1_path = sys.argv[1] if len(sys.argv) > 1 else "BENCH_sf1.json"
    base_path = sys.argv[2] if len(sys.argv) > 2 else "BENCH_detail.json"
    sf1, base = load(sf1_path), load(base_path)
    bad, whitelisted = [], []
    for name, t1 in sorted(sf1.items()):
        t0 = base.get(name)
        if t0 is None or t0 <= 0:
            continue
        if t1 <= 0:
            # a negative sf1 time means the query FAILED at scale —
            # that is the worst possible ratio, not a skip
            bad.append((float("inf"), t1, t0, name))
            continue
        # ignore sub-second sf0.1 times with small sf1 absolutes:
        # fixed overheads (plan, broadcast, JIT) dominate and the
        # ratio is noise, not a scale signal
        if t0 < 0.5 and t1 < 5.0:
            continue
        ratio = t1 / t0
        if ratio > THRESHOLD:
            if name in WHITELIST:
                whitelisted.append((ratio, t1, t0, name))
            else:
                bad.append((ratio, t1, t0, name))
    for r, t1, t0, n in sorted(whitelisted, reverse=True):
        print(f"ALLOW {r:6.1f}x  sf1={t1:8.2f}s sf0.1={t0:6.2f}s  {n}"
              f"  ({WHITELIST[n].split(' - ')[0]})")
    for r, t1, t0, n in sorted(bad, reverse=True):
        print(f"FAIL  {r:6.1f}x  sf1={t1:8.2f}s sf0.1={t0:6.2f}s  {n}")
    print(f"== {len(bad)} violations, {len(whitelisted)} whitelisted, "
          f"threshold {THRESHOLD}x")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
