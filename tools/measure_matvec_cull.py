"""Polar matvec cutoff-culling feasibility (r5; r4 verdict item 6 /
weak #1): the Thole dipole tensor is masked to zero outside rc, so what
fraction of the dense O(N'^2) matvec's flops are masked zeros at bench
size — and could a cell-list-culled TILE pass actually skip them?

Two distinct quantities:
- in_cutoff_pair_fraction: element-level masked-zero fraction.  On a
  VPU this by itself saves nothing (masked lanes still execute).
- block-pair cullable fraction: the fraction a TILE pass could skip —
  a block pair is cullable only when EVERY cross pair is outside rc.
  Geometric bound: with the flagship's derived cutoff rc = L/2, the
  max min-image distance between two points is L*sqrt(3)/2 ~ 0.866 L,
  so two blocks of diameter d are cullable only if their center
  distance exceeds L/2 + d <= 0.866 L, i.e. d <= 0.366 L ~ 30.7 A at
  bench size — but 128 contiguous sites at bench density occupy a
  ~19 A cube (diagonal 33.5 A) even under a perfect spatial sort, so
  NO block of >=128 sites can be fully outside another's cutoff
  sphere.  This script verifies that bound numerically (exact
  block-min distances, current ordering AND a cell-sorted
  permutation) and quantifies the opportunity that DOES exist for
  explicit small cutoffs (rc << L configs).

Writes MEASURE_MATVEC_CULL.json.
"""
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))


def block_cull_fraction(pos, L, rc, block):
    """Fraction of (ordered) block pairs whose min cross-pair
    min-image distance exceeds rc (fully cullable)."""
    n = pos.shape[0]
    nb = n // block
    pos = pos[:nb * block]
    mins = np.empty((nb, nb), np.float32)
    for i in range(nb):
        pi = pos[i * block:(i + 1) * block]
        d = pi[:, None, :] - pos[None, :, :]
        d -= L * np.round(d / L)
        r2 = (d * d).sum(-1).reshape(block, nb, block)
        mins[i] = r2.min(axis=(0, 2))
    return float((mins > rc * rc).mean()), nb


def main():
    from mpmc_tpu.models import systems
    from mpmc_tpu.ops.pairs import derived_cutoff

    params, state, cfg, thermo = systems.mof_h2_gcmc(
        n_side=21, spacing=4.0, n_h2=256, capacity=512,
        polarization=True)
    alive = np.asarray(state.atom_alive(params))
    pol = alive & (np.asarray(params.polar) > 0)
    pos = np.asarray(state.pos, np.float32)[pol]
    L = float(np.asarray(state.box)[0, 0])
    rc = float(np.asarray(derived_cutoff(state.box, cfg)))
    n = pos.shape[0]

    out = {"system": "mof_h2_gcmc n_side=21 (bench size)",
           "n_polar_sites": int(n), "box_L": L, "rc_derived": rc}

    # element-level masked-zero fraction (sampled rows; exact enough)
    rows = pos[:: max(1, n // 2000)]
    d = rows[:, None, :] - pos[None, :, :]
    d -= L * np.round(d / L)
    r2 = (d * d).sum(-1)
    out["in_cutoff_pair_fraction"] = round(float((r2 < rc * rc).mean()),
                                           4)

    # tile-level cullable fraction, current ordering and cell-sorted
    cell = rc / 4.0
    key = np.floor(pos / cell).astype(np.int64)
    order = np.lexsort((key[:, 2], key[:, 1], key[:, 0]))
    res = {}
    for label, p in (("current_order", pos),
                     ("cell_sorted", pos[order])):
        res[label] = {}
        for block in (128, 512, 1024):
            frac, nb = block_cull_fraction(p, L, rc, block)
            res[label][f"block_{block}"] = {
                "cullable_block_pair_fraction": round(frac, 4),
                "n_blocks": nb}
    out["derived_rc_L_over_2"] = res

    # the explicit-small-cutoff opportunity (rc << L): same lattice,
    # cutoff 14 A — the regime where a culled tile pass WOULD pay
    rc_s = 14.0
    rows = pos[:: max(1, n // 2000)]
    d = rows[:, None, :] - pos[None, :, :]
    d -= L * np.round(d / L)
    r2 = (d * d).sum(-1)
    frac_in = float((r2 < rc_s * rc_s).mean())
    cell = rc_s / 2.0
    key = np.floor(pos / cell).astype(np.int64)
    order = np.lexsort((key[:, 2], key[:, 1], key[:, 0]))
    small = {"in_cutoff_pair_fraction": round(frac_in, 4)}
    for block in (128, 512):
        frac, nb = block_cull_fraction(pos[order], L, rc_s, block)
        small[f"block_{block}_cell_sorted"] = {
            "cullable_block_pair_fraction": round(frac, 4),
            "n_blocks": nb}
    out["explicit_rc_14A"] = small

    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "MEASURE_MATVEC_CULL.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
