#!/usr/bin/env python3
"""Assemble BENCH_x16.json from a pair of Bench runs (x16 + x1 reference).

Usage: mk_bench_x16.py <x16.log> <x16_full.json> <x1.log> <x1_full.json> <refreshed-narrative-file>

Each log must contain the three raw "metric" JSON lines Bench prints;
the full maps are the SPARK_GRAFT_FULL_OUT files of the same runs. The
output keeps the long-standing artifact shape: protocol block + the
x16 total/detail/spread + the x1 reference total/detail.
"""
import json, sys

def metric_lines(path):
    out = {}
    for ln in open(path):
        ln = ln.strip()
        if ln.startswith('{') and '"metric"' in ln:
            try:
                d = json.loads(ln)
            except json.JSONDecodeError:
                continue
            out[d['metric']] = d  # last wins
    return out

def main():
    x16log, x16full, x1log, x1full, narrative = sys.argv[1:6]
    m16, m1 = metric_lines(x16log), metric_lines(x1log)
    f16, f1 = json.load(open(x16full)), json.load(open(x1full))
    doc = {
        "protocol": {
            "corpus": "ScaleCheck-derived x16 of sf0.1 (structure-preserving: disjoint replica shingle/token universes, sign-flip-orthogonal embeddings, key-shifted TPC-H facts with shared fixed dims)",
            "derive_cmd": "runMain graft.ScaleCheck 16 deriveonly",
            "bench_env": {
                "SPARK_GRAFT_SF_DIR": "/tmp/graft_scale/x16",
                "SPARK_GRAFT_CPUS": "32",
                "SPARK_GRAFT_SESSION_CONF": "graft.neardup.n=32000",
                "SPARK_GRAFT_SKIP": "d03_ngram_jaccard,d13_semdedup_recall",
                "SPARK_GRAFT_PASSES": "1",
            },
            "skipped_reason": "d03 and d13 are the declared-quadratic small-SF ground-truth validators (brute-force pair scans), not scale-path operators (SCALING.md)",
            "refreshed": open(narrative).read().strip(),
            "reference_x1": "solo steady-state run, same code, driver-identical protocol (2 passes, min), /root/testdata/sf0.1",
        },
        "total": m16["total"],
        "detail": {"metric": "detail", "queries": f16["queries"], "sf": f16["sf"]},
        "spread": {"metric": "spread", "spread": f16["spread"]},
        "x1_total": m1["total"],
        "x1_detail": {"metric": "detail", "queries": f1["queries"], "sf": f1["sf"]},
    }
    json.dump(doc, open("/root/repo/BENCH_x16.json", "w"), indent=1)
    n16, n1 = f16["n"], f1["n"]
    print(f"x16 total {f16['total']} s over {n16} (noisy {len(f16['noisy'])}); "
          f"x1 total {f1['total']} s over {n1} (noisy {len(f1['noisy'])}); "
          f"ratio {f16['total']/f1['total']:.2f}")

if __name__ == "__main__":
    main()
