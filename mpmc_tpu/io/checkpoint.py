"""Exact checkpoint/resume: full simulation pytree + averages + RNG key.

The reference can only resume approximately — its ``pqr_restart`` stores
positions, so a resumed run restarts averages from zero and re-seeds the
RNG (SURVEY.md §5 "Checkpoint / resume").  The rebuild checkpoints the
complete SimState pytree (positions, box, alive mask, PRNG key, cached
structure factor/dipoles/fields, accumulated energies, step counter) plus
the running averages, so a resumed trajectory is bit-identical to an
uninterrupted one.  PQR restart files are still written for
interoperability (io/output.py).

Format: one ``.npz`` with the flattened state leaves + a JSON sidecar
entry for the averages and metadata.  No orbax dependency — the state is
a few MB at most.
"""
from __future__ import annotations

import json
from typing import Optional, Tuple

import jax
import numpy as np

from mpmc_tpu.state import SimState
from mpmc_tpu.utils.averages import Averages

_FORMAT_VERSION = 1


def save(path: str, state: SimState, avgs: Optional[Averages] = None,
         extra: Optional[dict] = None) -> None:
    leaves, treedef = jax.tree_util.tree_flatten(state)
    payload = {f"leaf_{i}": np.asarray(x) for i, x in enumerate(leaves)}
    meta = {
        "version": _FORMAT_VERSION,
        "n_leaves": len(leaves),
        "has_sk": state.sk_re is not None,
        "has_e0": state.e0 is not None,
        "has_e_frozen": state.e_frozen is not None,
        "extra": extra or {},
    }
    if avgs is not None:
        meta["averages"] = {k: list(v) for k, v in avgs.samples.items()}
    payload["meta_json"] = np.frombuffer(
        json.dumps(meta).encode(), dtype=np.uint8)
    np.savez(path, **payload)


def load(path: str, like: SimState) -> Tuple[SimState, Averages, dict]:
    """Restore (state, averages, extra).  ``like`` provides the pytree
    structure (build the system from the same inputs first)."""
    with np.load(path) as z:
        meta = json.loads(bytes(z["meta_json"]).decode())
        if meta["version"] != _FORMAT_VERSION:
            raise ValueError(f"checkpoint version {meta['version']} "
                             f"unsupported")
        leaves = [z[f"leaf_{i}"] for i in range(meta["n_leaves"])]
    ref_leaves, treedef = jax.tree_util.tree_flatten(like)
    if len(ref_leaves) != len(leaves):
        raise ValueError(
            f"checkpoint has {len(leaves)} leaves; current system has "
            f"{len(ref_leaves)} — was it built from the same inputs?")
    for i, (a, b) in enumerate(zip(leaves, ref_leaves)):
        if tuple(a.shape) != tuple(np.shape(b)):
            raise ValueError(
                f"checkpoint leaf {i} shape {a.shape} != system "
                f"{np.shape(b)} — capacities or species differ")
    state = jax.tree_util.tree_unflatten(treedef, leaves)
    avgs = Averages()
    for k, v in meta.get("averages", {}).items():
        avgs.samples[k] = list(v)
    return state, avgs, meta.get("extra", {})


def template_state(state: SimState, cfg, params, thermo) -> SimState:
    """A state with every optional cache materialized (so the checkpoint
    pytree structure is stable regardless of when it is saved)."""
    from mpmc_tpu.mc import metropolis
    if state.sk_re is None or state.e_frozen is None:
        return metropolis.initialize(state, params, cfg, thermo)
    return state
