"""Calibration-QUALIFIED paired N->4N scaling measurement (VERDICT r4 #1).

Round 4's raw pairwise ratios (0.774-0.798) were measured in windows whose
own hardware ceiling was ~4% below round 3's, while engine/ceiling stayed
~0.85 across rounds — i.e. the WINDOW, not the engine, moved the raw
number.  To make the BASELINE.json raw >=0.8 bar measurable rather than
arguable, each pair is now QUALIFIED by the same-window hardware ceiling:

* the pure-Python multiprocessing ceiling (best-of-3, scaling_bench.
  hardware_ceiling) runs immediately BEFORE and AFTER each fresh-JVM pair;
* a pair counts only when BOTH calibrations clear the floor (default 0.95
  efficiency for the 1->4 pair — the ceiling round 3's accepted windows
  showed);
* a window whose PRE-calibration already misses the floor skips the
  expensive Spark pair entirely and retries after a pause;
* collection continues until `pairs` qualified pairs exist or
  `max_attempts` is hit — the full attempt history (including disqualified
  pairs) is always reported; nothing is dropped silently.

Pairwise ratios of back-to-back fresh-JVM runs, NOT per-level medians: the
two legs of a pair drift together on a shared host, so their ratio cancels
common-mode noise (BENCH_SCALING.md methodology).

If the host never offers a floor-clearing window (the documented fallback
clause), pairs still RUN whenever the pre-calibration clears the lower
``run_floor``: every attempt's pre/post ceiling and engine/ceiling ratio is
recorded, so the round's evidence is the full qualified-window protocol
plus the window-normalized ratio — measured, not argued.

Usage:
  python scripts/scaling_pairs.py [n_conv] [N] [pairs] [floor] \
      [max_attempts] [run_floor]
Prints one JSON line: attempt table, qualified-pair raw ratios + median,
per-pair engine/ceiling, output-identity checksum.
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
    floor = float(sys.argv[4]) if len(sys.argv) > 4 else 0.95
    max_attempts = int(sys.argv[5]) if len(sys.argv) > 5 else 4 * pairs
    run_floor = float(sys.argv[6]) if len(sys.argv) > 6 else floor
    n4 = 4 * n

    attempts, qualified, ran, checks = [], [], [], set()
    while len(qualified) < pairs and len(attempts) < max_attempts \
            and len(ran) < pairs + 2:
        i = len(attempts)
        pre = hardware_ceiling(n, n4) / 4
        if pre < run_floor:
            attempts.append({"attempt": i, "pre_ceiling": round(pre, 3),
                             "run_floor": run_floor, "skipped": True})
            print(f"attempt {i}: window disqualified before the pair "
                  f"(ceiling {pre:.3f} < run-floor {run_floor}) — waiting",
                  flush=True)
            time.sleep(60)
            continue
        lo = run_level(n, n_conv)
        hi = run_level(n4, n_conv)
        post = hardware_ceiling(n, n4) / 4
        eff = (hi["turns_per_sec"] / lo["turns_per_sec"]) / 4.0
        ceiling = (pre + post) / 2
        ok = pre >= floor and post >= floor
        row = {"attempt": i, "pre_ceiling": round(pre, 3),
               "post_ceiling": round(post, 3),
               "wall_n": lo["wall_sec"], "wall_4n": hi["wall_sec"],
               "tps_n": lo["turns_per_sec"], "tps_4n": hi["turns_per_sec"],
               "eff": round(eff, 3),
               "eff_over_ceiling": round(eff / ceiling, 3),
               "qualified": ok}
        attempts.append(row)
        ran.append(row)
        checks.update([(lo["n_triples"], lo["triples_checksum"]),
                       (hi["n_triples"], hi["triples_checksum"])])
        if ok:
            qualified.append(row)
        print(f"attempt {i}: local[{n}]={lo['wall_sec']}s "
              f"local[{n4}]={hi['wall_sec']}s eff={eff:.3f} "
              f"ceiling=({pre:.3f},{post:.3f}) "
              f"{'QUALIFIED' if ok else 'disqualified-post'}", flush=True)
        time.sleep(5)

    assert len(checks) <= 1, f"output diverged: {checks}"
    out = {"n_conv": n_conv, "n": n, "n4": n4, "floor": floor,
           "run_floor": run_floor, "attempts": attempts,
           "n_qualified": len(qualified), "n_ran": len(ran)}
    if qualified:
        out["qualified_eff"] = [r["eff"] for r in qualified]
        out["median_qualified_eff"] = round(
            statistics.median(r["eff"] for r in qualified), 3)
    if ran:
        out["ran_eff"] = [r["eff"] for r in ran]
        out["median_ran_eff"] = round(
            statistics.median(r["eff"] for r in ran), 3)
        out["median_eff_over_ceiling"] = round(
            statistics.median(r["eff_over_ceiling"] for r in ran), 3)
    if checks:
        (out["n_triples"], out["checksum"]), = [checks.pop()]
    print(json.dumps(out))


if __name__ == "__main__":
    main()
