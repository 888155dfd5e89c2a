"""Paired N->4N scaling measurement — the round-3 recorded protocol.

Runs `repeats` interleaved PAIRS of fresh-JVM runs (local[N] then local[4N]
back-to-back) and reports the per-pair efficiency ratios plus their median.
Pairwise ratios, NOT per-level medians: on a shared-host VM the two legs of
a back-to-back pair drift together, so their ratio cancels common-mode host
noise; medians taken independently per level across time windows
re-introduce it (BENCH_SCALING.md methodology).

Usage: python scripts/scaling_pairs.py [n_conv] [N] [pairs]
Prints one JSON line with the pair table, the median efficiency, and the
output-identity checksums.
"""
import json
import os
import statistics
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, HERE)

from scaling_bench import hardware_ceiling, run_level  # noqa: E402


def main():
    n_conv = int(sys.argv[1]) if len(sys.argv) > 1 else 300_000
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    pairs = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    n4 = 4 * n

    rows = []
    for i in range(pairs):
        lo = run_level(n, n_conv)
        hi = run_level(n4, n_conv)
        eff = (hi["turns_per_sec"] / lo["turns_per_sec"]) / 4.0
        rows.append({"pair": i, "wall_n": lo["wall_sec"],
                     "wall_4n": hi["wall_sec"],
                     "tps_n": lo["turns_per_sec"],
                     "tps_4n": hi["turns_per_sec"],
                     "eff": round(eff, 3),
                     "checks": [(lo["n_triples"], lo["triples_checksum"]),
                                (hi["n_triples"], hi["triples_checksum"])]})
        print(f"pair {i}: local[{n}]={lo['wall_sec']}s "
              f"local[{n4}]={hi['wall_sec']}s eff={eff:.3f}", flush=True)
        time.sleep(5)

    checks = {c for r in rows for c in r["checks"]}
    assert len(checks) == 1, f"output diverged: {checks}"
    med = statistics.median(r["eff"] for r in rows)
    hw = hardware_ceiling(n, n4)
    print(json.dumps({
        "n_conv": n_conv, "n": n, "n4": n4,
        "pairs": [{k: r[k] for k in
                   ("pair", "wall_n", "wall_4n", "tps_n", "tps_4n", "eff")}
                  for r in rows],
        "median_efficiency": round(med, 3),
        "hw_ceiling_efficiency": round(hw / 4, 3),
        "n_triples": rows[0]["checks"][0][0],
        "checksum": rows[0]["checks"][0][1],
    }))


if __name__ == "__main__":
    main()
