"""Four-way interleaved A/B: mapInArrow encode vs all-JVM sqlenc encode
at two parallelism levels (VERDICT r4 #2).

The question the north rule cares about: is the remaining 4->16 scaling
gap the Python/Arrow worker crossing in the reduce stage? sqlenc
(blocks.build_block_index_sql) removes Python from the reduce entirely;
if its pair efficiency is materially higher than the arrow build's IN
THE SAME NOISE WINDOW, the crossing is the residual. Round-4 lesson:
only in-sequence interleaved trials are admissible on this box, so all
FOUR configurations (arrow@L, arrow@H, sql@L, sql@H) run as warm child
processes and each round times them back-to-back.

Usage:
    python scripts/probe_sqlenc_ab.py [--docs 1500000] [--trials 2]
        [--low 4] [--high 16] [--warmups 1]
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
    ap.add_argument("--docs", type=int, default=1_500_000)
    ap.add_argument("--trials", type=int, default=2)
    ap.add_argument("--low", type=int, default=4)
    ap.add_argument("--high", type=int, default=16)
    ap.add_argument("--warmups", type=int, default=1)
    ap.add_argument(
        "--mode", default="datapath", choices=["datapath", "e2e"],
        help="datapath = blocks action only; e2e = full 4-action build "
        "(the headline scaling job) — same 4-way interleaving either way",
    )
    ap.add_argument(
        "--env-b", default="",
        help="extra KEY=VAL,KEY=VAL env for the 'sql' side only — e.g. "
        "WSE_TOKENIZER=split turns that side into the zero-Python-"
        "crossing build (JVM tokenize for the ASCII slice + JVM encode)",
    )
    args = ap.parse_args()

    env_b = dict(
        kv.split("=", 1) for kv in args.env_b.split(",") if "=" in kv
    )
    if "WSE_TOKENIZER" in env_b and args.mode != "e2e":
        # the datapath child hardcodes the pandas tokenizer
        # (scaling_bench.py); only the e2e build reads WSE_TOKENIZER —
        # silently no-opping would mislabel the A/B as zero-crossing
        ap.error("--env-b WSE_TOKENIZER=... requires --mode e2e")
    ratio = args.high / args.low
    mk = lambda cores, mode: _Level(  # noqa: E731
        cores,
        args.docs,
        16,
        args.mode,
        extra_env=(
            {"WSE_BUILD_MODE": mode, **env_b} if mode != "agg" else {}
        ),
    )
    kids = {
        ("arrow", args.low): mk(args.low, "agg"),
        ("arrow", args.high): mk(args.high, "agg"),
        ("sql", args.low): mk(args.low, "sqlenc"),
        ("sql", args.high): mk(args.high, "sqlenc"),
    }
    order = [
        ("arrow", args.low), ("arrow", args.high),
        ("sql", args.low), ("sql", args.high),
    ]
    results: dict[tuple[str, int], list[float]] = {k: [] for k in kids}
    try:
        for w in range(args.warmups):
            for k in order:
                dt, steal, _ = kids[k].run_trial()
                print(f"warmup {w} {k[0]}@{k[1]}: {dt:.1f}s (steal {steal:.0%})",
                      flush=True)
        for t in range(args.trials):
            row = {}
            for k in order:
                dt, steal, _ = kids[k].run_trial()
                results[k].append(dt)
                row[k] = (dt, steal)
                print(f"round {t} {k[0]}@{k[1]}: {dt:.1f}s (steal {steal:.0%})",
                      flush=True)
            for mode in ("arrow", "sql"):
                eff = (
                    row[(mode, args.low)][0] / row[(mode, args.high)][0]
                ) / ratio
                print(f"  round {t} {mode} pair efficiency: {eff:.3f}",
                      flush=True)
    finally:
        for k in kids.values():
            k.close()

    summary = {
        "docs": args.docs, "low": args.low, "high": args.high,
        "mode": args.mode,
    }
    for mode in ("arrow", "sql"):
        lo = results[(mode, args.low)]
        hi = results[(mode, args.high)]
        pairs = sorted((l / h) / ratio for l, h in zip(lo, hi))
        summary[mode] = {
            "low_sec": [round(x, 1) for x in lo],
            "high_sec": [round(x, 1) for x in hi],
            "pair_efficiencies": [round(e, 3) for e in pairs],
            "median_pair": round(pairs[len(pairs) // 2], 3),
            "best_pair": round(pairs[-1], 3),
        }
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
