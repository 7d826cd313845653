"""Sorption-isotherm driver: sweep pressures, batched chains per point.

The production workflow MPMC users run campaign-style (one MPI job per
pressure) collapses to one script: each pressure point runs C vmapped
GCMC chains on-device, with EoS fugacities, and writes a CSV isotherm
(<N>, wt%, Qst per point).

    python examples/isotherm.py examples/h2_sorption.inp \
        --pressures 0.1 0.5 1 5 10 --chains 32 --steps 20000 -o iso.csv
"""
from __future__ import annotations

import argparse
import csv
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))

import jax
import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("input", help="base input script (.inp)")
    ap.add_argument("--pressures", type=float, nargs="+", required=True)
    ap.add_argument("--chains", type=int, default=16)
    ap.add_argument("--steps", type=int, default=20000)
    ap.add_argument("--equil-frac", type=float, default=0.3,
                    help="fraction of blocks discarded as equilibration")
    ap.add_argument("-o", "--output", default="isotherm.csv")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args(argv)
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from mpmc_tpu.io import input_script
    from mpmc_tpu.mc import fugacity as fug_mod
    from mpmc_tpu.mc import metropolis
    from mpmc_tpu.mc import run as run_mod
    from mpmc_tpu.parallel import multichain
    from mpmc_tpu.utils.averages import Averages

    base = input_script.parse_file(args.input)
    rows = []
    for p_atm in args.pressures:
        job = input_script.parse_file(args.input)
        job.pressure = p_atm
        job.cfg = job.cfg.__class__(**{
            **{f.name: getattr(job.cfg, f.name)
               for f in job.cfg.__dataclass_fields__.values()},
            "numsteps": args.steps})
        su = run_mod.setup(job)
        state = metropolis.initialize(su.state, su.params, su.cfg,
                                      su.thermo)
        states = multichain.stack_states(state, args.chains,
                                         seed=su.cfg.seed)
        corr = max(su.cfg.corrtime, 1)
        n_blocks = max(args.steps // corr, 1)
        avgs = Averages()
        for b in range(n_blocks):
            states, _ = multichain.run_chunk_batched(
                states, su.params, su.cfg, su.thermo, corr)
            states = multichain.initialize_batched(
                states, su.params, su.cfg, su.thermo)
            if b < int(args.equil_frac * n_blocks):
                continue
            for c in range(args.chains):
                st = jax.tree_util.tree_map(lambda x: x[c], states)
                avgs.add(run_mod.observables(su, st))
        row = {
            "pressure_atm": p_atm,
            "fugacity_atm": float(np.asarray(su.thermo.fugacity)[0]),
            "N_mean": avgs.mean("N"),
            "N_sem": avgs.sem("N"),
            "wt_pct": avgs.mean("wt_pct"),
            "qst_kj_mol": avgs.qst(job.temperature),
        }
        rows.append(row)
        print(" ".join(f"{k}={v:.5g}" for k, v in row.items()),
              flush=True)

    with open(args.output, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=list(rows[0]))
        w.writeheader()
        w.writerows(rows)
    print(f"isotherm written to {args.output}")


if __name__ == "__main__":
    sys.exit(main())
