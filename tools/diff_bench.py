#!/usr/bin/env python3
"""Cross-round per-query bench diff.

Usage: tools/diff_bench.py BENCH_DETAIL_rNN.json BENCH_DETAIL_rMM.json [topK]

Prints the top regressions and improvements between two per-round
detail artifacts (warm best per query), plus the headline deltas and
both runs' host-window verdicts — the manual counterpart of Bench's
in-artifact `regressions` block, for judge-facing attribution tables
and for adjudicating whether an entry is code or run-band noise.
"""
import json
import sys


def load(path):
    with open(path) as f:
        d = json.load(f)
    return d


def main():
    if len(sys.argv) < 3:
        print(__doc__)
        sys.exit(2)
    a, b = load(sys.argv[1]), load(sys.argv[2])
    top_k = int(sys.argv[3]) if len(sys.argv) > 3 else 12
    qa, qb = a["queries"], b["queries"]
    shared = [q for q in qb if q in qa and qa[q] >= 0 and qb[q] >= 0]
    rows = [(q, qa[q], qb[q], qb[q] - qa[q]) for q in shared]
    print(f"A = {sys.argv[1]}: total {a['value']}s over {a['n_queries']} "
          f"queries, window_ok={a.get('window_ok')}")
    print(f"B = {sys.argv[2]}: total {b['value']}s over {b['n_queries']} "
          f"queries, window_ok={b.get('window_ok')}")
    only_b = sorted(set(qb) - set(qa))
    only_a = sorted(set(qa) - set(qb))
    if only_b:
        print(f"new in B ({len(only_b)}): {', '.join(only_b)}")
    if only_a:
        print(f"removed in B ({len(only_a)}): {', '.join(only_a)}")
    shared_a = sum(qa[q] for q in shared)
    shared_b = sum(qb[q] for q in shared)
    print(f"shared-{len(shared)} subtotal: {shared_a:.1f}s -> {shared_b:.1f}s "
          f"({(shared_b - shared_a) / max(shared_a, 1e-9) * 100:+.1f}%)")
    print(f"\ntop {top_k} regressions (B slower):")
    for q, va, vb, d in sorted(rows, key=lambda r: -r[3])[:top_k]:
        if d <= 0:
            break
        flag = " <- gate" if vb > 1.5 * va and vb > va + 0.2 else ""
        print(f"  {va:7.3f} -> {vb:7.3f}  ({d:+.3f})  {q}{flag}")
    print(f"\ntop {top_k} improvements (B faster):")
    for q, va, vb, d in sorted(rows, key=lambda r: r[3])[:top_k]:
        if d >= 0:
            break
        print(f"  {va:7.3f} -> {vb:7.3f}  ({d:+.3f})  {q}")


if __name__ == "__main__":
    main()
