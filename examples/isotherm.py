"""Sorption-isotherm campaign CLI: restart-aware pressure sweeps with
uncertainty-targeted stopping (mpmc_tpu/campaign.py).

Each pressure point runs C vmapped GCMC chains on-device and stops when
the cross-chain SEM of <N> reaches the target (or at --max-steps);
points warm-start from the previous pressure's equilibrated chains, and
--checkpoint-dir makes the whole campaign resumable.

    python examples/isotherm.py examples/h2_sorption.inp \
        --pressures 0.1 0.5 1 5 10 --chains 32 --target-rel-sem 0.02 \
        --checkpoint-dir iso_ckpt -o iso.csv
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))

import jax


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("input", help="base input script (.inp)")
    ap.add_argument("--pressures", type=float, nargs="+", required=True)
    ap.add_argument("--chains", type=int, default=16)
    ap.add_argument("--target-rel-sem", type=float, default=0.02,
                    help="stop a point when SEM(<N>)/<N> falls below this")
    ap.add_argument("--min-steps", type=int, default=5000)
    ap.add_argument("--max-steps", type=int, default=100000)
    ap.add_argument("--equil-blocks", type=int, default=2,
                    help="corrtime blocks discarded as equilibration")
    ap.add_argument("--checkpoint-dir", default=None,
                    help="directory for resumable campaign state")
    ap.add_argument("--cold-start", action="store_true",
                    help="fresh chains per pressure (no warm start)")
    ap.add_argument("-o", "--output", default="isotherm.csv")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args(argv)
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from mpmc_tpu import campaign
    from mpmc_tpu.io import input_script

    job = input_script.parse_file(args.input)
    rows = campaign.run_isotherm(
        job, pressures=args.pressures, chains=args.chains,
        target_rel_sem=args.target_rel_sem, min_steps=args.min_steps,
        max_steps=args.max_steps, equil_blocks=args.equil_blocks,
        checkpoint_dir=args.checkpoint_dir, log=sys.stdout,
        warm_start=not args.cold_start)
    campaign.write_csv(rows, args.output)
    print(f"isotherm written to {args.output}")


if __name__ == "__main__":
    sys.exit(main())
