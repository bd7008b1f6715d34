"""Fixed-cores size-scaling probe: does throughput RISE with input size?

The e2e 8->32 efficiency at 3M docs reads ~0.5 with ~144 s/build of
non-core-scaling time (Amdahl fit of a same-window pair). This probe
separates the two candidate explanations at FIXED parallelism by
interleaving two warm children that differ only in input size (docs and
4*docs):

  - if docs/s at 4n >> docs/s at n, the non-scaling time is per-BUILD
    overhead (stage barriers, scheduling, commit protocol) that
    amortizes with input size — the 100 TB story holds and the sandbox
    measurement is input-bound, not engine-bound;
  - if docs/s is flat, the engine has a real per-doc serial component.

Usage: python scripts/size_probe.py [--cores 32] [--docs 1500000]
       [--factor 4] [--trials 3] [--mode e2e]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from scaling_bench import _Level  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cores", type=int, default=32)
    ap.add_argument("--docs", type=int, default=1_500_000)
    ap.add_argument("--factor", type=int, default=4)
    ap.add_argument("--trials", type=int, default=3)
    ap.add_argument("--mode", default="e2e", choices=["e2e", "datapath"])
    args = ap.parse_args()

    small = _Level(args.cores, args.docs, 16, args.mode)
    big = _Level(args.cores, args.docs * args.factor, 16, args.mode)
    try:
        print(f"warmup {args.docs}: {small.run_trial()[0]:.1f}s", flush=True)
        print(f"warmup {args.docs * args.factor}: {big.run_trial()[0]:.1f}s",
              flush=True)
        ts, tb = [], []
        for t in range(args.trials):
            ds, ss, _ = small.run_trial()
            db, sb, _ = big.run_trial()
            ts.append(ds)
            tb.append(db)
            print(
                f"round {t}: {args.docs} docs {ds:.1f}s "
                f"({args.docs / ds:,.0f} docs/s, steal {ss:.0%}) | "
                f"{args.docs * args.factor} docs {db:.1f}s "
                f"({args.docs * args.factor / db:,.0f} docs/s, steal {sb:.0%})"
                f" | throughput ratio {(args.docs * args.factor / db) / (args.docs / ds):.2f}x",
                flush=True,
            )
    finally:
        small.close()
        big.close()
    tput_s = args.docs / min(ts)
    tput_b = args.docs * args.factor / min(tb)
    print(json.dumps({
        "cores": args.cores, "mode": args.mode,
        "docs_small": args.docs, "docs_big": args.docs * args.factor,
        "best_small_sec": round(min(ts), 2), "best_big_sec": round(min(tb), 2),
        "docs_per_sec_small": round(tput_s, 1),
        "docs_per_sec_big": round(tput_b, 1),
        "throughput_gain_at_4x_size": round(tput_b / tput_s, 3),
    }))


if __name__ == "__main__":
    main()
