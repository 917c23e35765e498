#!/usr/bin/env python3
"""Bytes-moved scale gate: the shuffle-volume twin of ratio_gate.py.

Wall seconds on a shared box are noisy (the round-6 692 s-vs-378 s
contention episode cost a judge session); SHUFFLE BYTES are not - the
bench's SparkListener records per-query shuffle read/write next to the
seconds (the `io` map in BENCH_detail.json / BENCH_sf1.json). This
gate diffs those: on 10x data a linear-plan query should shuffle ~10x
the bytes; anything past THRESHOLD x is a plan-level scale cliff no
box wobble can explain, unless it is on the quadratic-by-design
whitelist shared with ratio_gate (imported from there - one list, one
set of written justifications).

Queries with tiny sf0.1 shuffle volume (< MIN_BASE bytes) are skipped:
ratios over near-zero bases are noise (broadcast-only plans shuffle
KBs of metadata).

Usage: python3 tools/byte_gate.py [BENCH_sf1.json [BENCH_detail.json]]
Exit 0 = gate passes; 1 = violations found.
"""
import json
import sys

from ratio_gate import WHITELIST

THRESHOLD = 30.0       # 10x data, 3x superlinearity headroom
MIN_BASE = 10_000_000  # 10 MB: below this, ratios are metadata noise


def load_io(path):
    with open(path) as f:
        d = json.load(f)
    return d.get("io", {})


def main():
    sf1_path = sys.argv[1] if len(sys.argv) > 1 else "BENCH_sf1.json"
    base_path = sys.argv[2] if len(sys.argv) > 2 else "BENCH_detail.json"
    sf1, base = load_io(sf1_path), load_io(base_path)
    bad, allowed, checked = [], 0, 0
    for name, io1 in sorted(sf1.items()):
        io0 = base.get(name)
        if not io0:
            continue
        b1 = io1.get("shuffle_rd", 0)
        b0 = io0.get("shuffle_rd", 0)
        if b0 < MIN_BASE:
            continue
        checked += 1
        r = b1 / b0
        if r <= THRESHOLD:
            continue
        if name in WHITELIST:
            allowed += 1
            print(f"ALLOW {r:6.1f}x  sf1={b1/1e9:7.2f}GB "
                  f"sf0.1={b0/1e6:7.1f}MB  {name}  ({WHITELIST[name]})")
            continue
        bad.append(name)
        print(f"FAIL  {r:6.1f}x  sf1={b1/1e9:7.2f}GB "
              f"sf0.1={b0/1e6:7.1f}MB  {name}")
    print(f"== {len(bad)} violations, {allowed} whitelisted, "
          f"{checked} checked (base >= {MIN_BASE/1e6:.0f}MB), "
          f"threshold {THRESHOLD}x")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
