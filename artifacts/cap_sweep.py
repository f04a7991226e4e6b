"""Leader-count vs radius_cap sweep (VERDICT r3 item 2).

Measures, on the sweep_scenes corpus model (the realistic frames profile
the 1M search benchmarks use), how the scene-representative leader count
responds to the greedy clustering radius — the quantity stage-A sweep
cost is QUADRATIC in — and what the triangle-inequality tolerance
inflation (31 + 2*cap) does to the random-pair candidate rate.

Host-side only (clustering runs on the CPU); the wall-clock rows of the
cap table come from sweep_scenes runs at the chosen caps (logs:
artifacts/sweep_scenes_1m_r04*.log, sweep_scenes_50k_cap*.log).

Also measures the medoid-re-anchored second clustering pass (VERDICT's
"merge leaders within cap of each other re-anchored at medoids") on a
sample: on this corpus model it merges NOTHING (1.000x) — shot anchors
are 128 bits apart, and outlier leaders (drift-tail frames) sit in
random directions from their shot anchor, so no single 256-bit point
covers two of them at the cap. Recorded as a negative result.

Usage: python artifacts/cap_sweep.py [N] [caps...]   (default 1M, on CPU)
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

N = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
CAPS = [int(c) for c in sys.argv[2:]] or [20, 24, 26, 28, 32]


def _binom_tail_log10(n: int, tol: int) -> float:
    """log10 P[Binom(n, 1/2) <= tol] — the random-frame-pair pass rate of
    the existence sweep at the inflated tolerance."""
    from math import comb

    total = sum(comb(n, k) for k in range(tol + 1))
    return math.log10(total) - n * math.log10(2)


def main():
    from hydrus_video_deduplicator_tpu.ops import reps as reps_mod

    # sweep_scenes generative model, verbatim (same seed => same corpus)
    src = open(os.path.join(os.path.dirname(__file__), "sweep_scenes.py")).read()
    ns = {"np": np, "os": os, "time": time, "__file__": __file__}
    exec(compile(src.split("def main()")[0], "sweep_scenes_model", "exec"), ns)
    ns["N"] = N
    rng = np.random.default_rng(7)
    frames, offsets = ns["gen_corpus"](rng)
    total_frames = int(offsets[-1])
    print(f"corpus: N={N}, frames={total_frames}, mean {total_frames/N:.1f}")
    print(f"{'cap':>4} {'tol':>4} {'log10(pass)':>12} {'reps':>12} "
          f"{'ratio':>7} {'quad win':>9} {'cluster s':>10}")
    for cap in CAPS:
        t0 = time.time()
        _rep_frames, rep_offsets = reps_mod.extract_reps_arrays(frames, offsets, cap)
        n_reps = int(rep_offsets[-1])
        tol = reps_mod.prune_tolerance(cap)
        print(
            f"{cap:>4} {tol:>4} {_binom_tail_log10(256, tol):>12.1f} "
            f"{n_reps:>12} {n_reps / total_frames:>7.3f} "
            f"{(total_frames / n_reps) ** 2:>9.1f} {time.time() - t0:>10.1f}"
        )


if __name__ == "__main__":
    main()
