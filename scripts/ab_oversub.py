"""Same-window A/B of partitioning/config variants (env-driven).

Two warm children at the SAME parallelism, differing only in the env
given by --a / --b (e.g. WSE_PARTITION_MODE=plain vs =salted, or
WSE_KEY_OVERSUB=1 vs =64). Trials alternate A,B,A,B,... so both
variants sample the same VM-noise window — the only comparison the
sandbox's 2-3x throughput drift allows.

Usage: python scripts/ab_oversub.py [--cores 32] [--docs 120000]
       [--trials 3] [--mode datapath]
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
    ap.add_argument("--docs", type=int, default=120_000)
    ap.add_argument("--trials", type=int, default=3)
    ap.add_argument("--mode", default="datapath", choices=["e2e", "datapath"])
    ap.add_argument(
        "--a", default="WSE_PARTITION_MODE=plain",
        help="variant A env, comma-separated KEY=VAL",
    )
    ap.add_argument(
        "--b", default="WSE_PARTITION_MODE=salted",
        help="variant B env, comma-separated KEY=VAL",
    )
    args = ap.parse_args()

    def _env(spec: str) -> dict:
        return dict(kv.split("=", 1) for kv in spec.split(",") if kv)

    a = _Level(args.cores, args.docs, 16, args.mode, extra_env=_env(args.a))
    b = _Level(args.cores, args.docs, 16, args.mode, extra_env=_env(args.b))
    try:
        print(f"warmup A({args.a}): {a.run_trial()[0]:.1f}s", flush=True)
        print(f"warmup B({args.b}): {b.run_trial()[0]:.1f}s", flush=True)
        ta, tb = [], []
        for t in range(args.trials):
            da, sa, _ = a.run_trial()
            db, sb, _ = b.run_trial()
            ta.append(da)
            tb.append(db)
            print(
                f"round {t}: A({args.a}) {da:.1f}s (steal {sa:.0%}) | "
                f"B({args.b}) {db:.1f}s (steal {sb:.0%}) | "
                f"B/A speedup {da / db:.3f}",
                flush=True,
            )
    finally:
        a.close()
        b.close()
    print(json.dumps({
        "cores": args.cores, "docs": args.docs, "mode": args.mode,
        "a_best": round(min(ta), 2), "a": args.a,
        "b_best": round(min(tb), 2), "b": args.b,
        "pairwise_speedup_b_over_a": [round(x / y, 3) for x, y in zip(ta, tb)],
        "best_speedup_b_over_a": round(min(ta) / min(tb), 3),
    }))


if __name__ == "__main__":
    main()
