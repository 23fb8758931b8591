#!/usr/bin/env python
"""Run the synthetic heterogeneous-federation accuracy study (ACCURACY.md).

On a TPU host this runs the real engines at full ViLT-B/32 width across
modes x seeds and prints the cross-seed mean±std table; elsewhere it runs
tiny shapes (same code path).  See ``feddat_tpu/study.py`` for the design.

    python scripts/accuracy_study.py [--seeds 0,1,2] [--rounds 8]
        [--modes none,adapter,dat] [--out runs_accuracy]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None) -> int:
    p = argparse.ArgumentParser("accuracy_study")
    p.add_argument("--modes", default="none,adapter,dat")
    p.add_argument("--family", default="vilt", choices=["vilt", "albef"])
    p.add_argument("--seeds", default="0,1,2")
    p.add_argument("--rounds", type=int, default=8)
    p.add_argument("--clients", type=int, default=4)
    p.add_argument("--lr", type=float, default=5e-3)
    p.add_argument("--out", default=None, help="directory for per-run history JSONs")
    p.add_argument("--smoke", action="store_true", help="force tiny shapes")
    p.add_argument("--attn_impl", default=None, choices=["block", "layer"],
                   help="full-scale kernel for eligible modes (default block)")
    args = p.parse_args(argv)

    from feddat_tpu.utils.observability import enable_compilation_cache

    enable_compilation_cache()

    from feddat_tpu.study import format_study, run_study

    results = run_study(
        modes=[m.strip() for m in args.modes.split(",") if m.strip()],
        seeds=[int(s) for s in args.seeds.split(",")],
        attn_impl=args.attn_impl,
        num_clients=args.clients,
        comm_rounds=args.rounds,
        full_scale=False if args.smoke else None,
        lr=args.lr,
        out_dir=args.out,
        family=args.family,
    )
    print(format_study(results))
    print(json.dumps({m: r["table"] for m, r in results.items()}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
