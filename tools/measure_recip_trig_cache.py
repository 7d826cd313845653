"""Round-6 candidate 4 decision measurement: would cached [N,K] trig
planes beat the per-trial O(N K) sin/cos pass in move_deltas'
polar_ewald recip-field delta?

The delta field at every unmoved site is (thole.move_deltas):

    d_rec = (sin(phase) * (w dSre)) @ kv - (cos(phase) * (w dSim)) @ kv,
    phase = pos @ kv.T                                  [N,K]

Candidate: keep sin(phase)/cos(phase) resident in HBM (2 x [N,K] f32,
~147 MB at 10.8k/kmax 7), row-update them on accepted moves (O(A K)),
and turn the per-trial work into two weighted [N,K]@[K,3] matmuls.
The recompute variant pays the [N,3]@[3,K] phase matmul + 2x18M
transcendentals; the cached variant pays 147 MB of HBM reads.  Both
are timed as 32-deep chained jits (per-call D2H swamps singles,
CLAUDE.md), with the chain carrying a varying dS so nothing hoists.

Writes MEASURE_RECIP_TRIG.json.
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))

import jax
import jax.numpy as jnp

from mpmc_tpu.models import systems
from mpmc_tpu.ops import ewald

CHAIN = 32


def main():
    params, state, cfg, thermo = systems.mof_h2_gcmc(
        n_side=21, spacing=4.0, n_h2=256, capacity=512,
        polarization=True)
    pos = state.pos
    kv, pw = ewald.ktable(state.box, cfg)
    K = kv.shape[0]
    N = pos.shape[0]
    w = jnp.asarray(np.random.default_rng(0).normal(size=K),
                    jnp.float32)

    def chain_recompute(d0):
        def body(d, _):
            phase = pos @ kv.T
            out = (jnp.sin(phase) * (w * d[0])[None, :]) @ kv \
                - (jnp.cos(phase) * (w * d[1])[None, :]) @ kv
            s = jnp.sum(out)
            return jnp.stack([d[1] + 1e-6 * s, d[0]]), None
        d, _ = jax.lax.scan(body, d0, None, length=CHAIN)
        return jnp.sum(d)

    sinp = jnp.sin(pos @ kv.T)
    cosp = jnp.cos(pos @ kv.T)

    def chain_cached(d0):
        def body(d, _):
            out = (sinp * (w * d[0])[None, :]) @ kv \
                - (cosp * (w * d[1])[None, :]) @ kv
            s = jnp.sum(out)
            return jnp.stack([d[1] + 1e-6 * s, d[0]]), None
        d, _ = jax.lax.scan(body, d0, None, length=CHAIN)
        return jnp.sum(d)

    d0 = jnp.stack([jnp.ones((K,), jnp.float32) * 1e-3,
                    jnp.ones((K,), jnp.float32) * 2e-3])
    f_re = jax.jit(chain_recompute)
    f_ca = jax.jit(chain_cached)

    def t_ms(fn):
        np.asarray(fn(d0))
        best = np.inf
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(fn(d0))
            best = min(best, (time.perf_counter() - t0) / CHAIN)
        return best * 1e3

    out = {"system": "mof_h2_gcmc n_side=21", "n_sites": int(N),
           "n_kvecs": int(K),
           "trig_plane_bytes": int(2 * N * K * 4),
           "recompute_ms_per_trial": round(t_ms(f_re), 4),
           "cached_planes_ms_per_trial": round(t_ms(f_ca), 4)}
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "MEASURE_RECIP_TRIG.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
