"""MFU/roofline accounting for the three hot kernels (r3 verdict item
4): fused µVT interleaved, the restricted Pallas pair pass, and the
Thole dipole matvec.  Each gets a documented flops+bytes model and an
achieved-fraction-of-peak number, where "peak" is MEASURED on this
chip by microbenchmarks (practical VPU f32 FMA rate, practical exp()
rate, HBM stream bandwidth) rather than taken from a spec sheet — the
axon tunnel + clock state make spec numbers unanchored.

Flop-equivalent models (documented here, used below):
- dipole matvec: N'^2 pairs x ~56 flop-equivalents (9 min-image, 6 r2,
  ~12 rsqrt+exp damping as measured-equivalent transcendental cost,
  5 mdotr, 12 coef, 12 accumulate) — raw-flop fraction is ALSO
  reported with exp counted as 1.
- pair pass (restricted refresh): (N-F) x N pairs x ~44 flop-equiv
  (LJ + erfc poly + min-image).
- fused µVT step: 2 masked pair passes (2 x N x ~40) + S(k) delta
  (Nk x A x ~12 trig-equiv) per step; VMEM-resident (HBM ~0), so the
  bound is VPU latency, not bandwidth — reported vs VPU peak.

Run: python tools/measure_roofline.py   (real TPU)
"""
import dataclasses
import json
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))

import jax
import jax.numpy as jnp
import numpy as np


def _wall(fn, *args, reps=4):
    np.asarray(fn(*args))
    t0 = time.perf_counter()
    for _ in range(reps):
        np.asarray(fn(*args))
    return (time.perf_counter() - t0) / reps


def measure_peaks(out):
    """Practical chip peaks: f32 FMA, exp(), HBM stream, MXU bf16.

    Tunnel discipline: every jitted prober returns a SCALAR (D2H of a
    large array costs seconds over the axon tunnel and swamped the
    k-differencing in the first version of this tool — the in-jit
    reduction runs once per call in both k points, so it cancels in
    the (w_hi - w_lo) difference)."""
    M = 8 * 1024 * 1024        # 32 MB f32 operand (VMEM-resident loop)

    @partial(jax.jit, static_argnames=("k",))
    def fma_k(x, k):
        def body(i, a):
            return a * np.float32(1.0000001) + np.float32(1e-9)
        return jnp.sum(jax.lax.fori_loop(0, k, body, x))

    @partial(jax.jit, static_argnames=("k",))
    def exp_k(x, k):
        def body(i, a):
            return jnp.exp(a * np.float32(1e-8))
        return jnp.sum(jax.lax.fori_loop(0, k, body, x))

    x = jnp.ones((M,), jnp.float32)
    w8, w24 = _wall(exp_k, x, 8), _wall(exp_k, x, 24)
    out["vpu_exp_peak_gops"] = round(M * 16 / (w24 - w8) / 1e9, 2)

    # HBM stream: big copy-scale (read + write 2 GB/iter)
    B = 256 * 1024 * 1024      # 1 GB f32

    @partial(jax.jit, static_argnames=("k",))
    def stream_k(x, k):
        def body(i, a):
            return a * np.float32(0.9999999)
        return jnp.sum(jax.lax.fori_loop(0, k, body, x))

    xb = jnp.ones((B,), jnp.float32)
    w2, w6 = _wall(stream_k, xb, 2), _wall(stream_k, xb, 6)
    out["hbm_stream_gbps"] = round(2.0 * 4.0 * B / (w6 - w2) / 1e9, 1)

    # MXU anchor: bf16 matmul chain
    K = 8192

    @partial(jax.jit, static_argnames=("k",))
    def mm_k(a, b, k):
        def body(i, acc):
            return jax.lax.dot(acc, b,
                               precision=jax.lax.Precision.DEFAULT)
        return jnp.sum(jax.lax.fori_loop(0, k, body, a)
                       .astype(jnp.float32))

    a = jnp.ones((K, K), jnp.bfloat16)
    w2m, w6m = _wall(mm_k, a, a, 2), _wall(mm_k, a, a, 6)
    out["mxu_bf16_peak_tflops"] = round(
        2.0 * K ** 3 * 4 / (w6m - w2m) / 1e12, 1)
    # VPU f32 anchor: a direct FMA micro-probe is not measurable over
    # the tunnel (elementwise loops are HBM/latency-bound at 32 MB and
    # noise-bound at VMEM sizes), so derive it from the MEASURED MXU
    # rate: clock = mxu_tflops / (4 MXUs x 128x128 x 2), VPU = 8x128
    # lanes x 2 FMA flops x 2 issue x clock.  At the 197-TF spec this
    # gives 3.6 TF; the anchor scales with the chip's real clock state.
    clock_ghz = out["mxu_bf16_peak_tflops"] * 1e12 / (4 * 128 * 128
                                                      * 2) / 1e9
    out["vpu_f32_peak_tflops_derived"] = round(
        8 * 128 * 2 * 2 * clock_ghz * 1e9 / 1e12, 2)
    out["clock_ghz_from_mxu"] = round(clock_ghz, 2)
    for k in ("vpu_exp_peak_gops", "hbm_stream_gbps",
              "mxu_bf16_peak_tflops", "vpu_f32_peak_tflops_derived",
              "clock_ghz_from_mxu"):
        print(json.dumps({k: out[k]}), flush=True)


def main():
    from mpmc_tpu.mc import metropolis
    from mpmc_tpu.models import systems
    from mpmc_tpu.ops import thole
    from mpmc_tpu.parallel import multichain

    out = {}
    measure_peaks(out)
    kernels = {}

    # ---- Thole dipole matvec ----------------------------------------
    params, state, cfg, thermo = systems.mof_h2_gcmc(
        n_side=21, spacing=4.0, n_h2=256, capacity=512,
        polarization=True)
    state = metropolis.initialize(state, params, cfg, thermo)
    alive = state.atom_alive(params)
    n_pol = int(np.asarray(alive & (params.polar > 0)).sum())

    @partial(jax.jit, static_argnames=("k",))
    def mv_k(mu, k):
        def body(i, m):
            return thole.dipole_matvec(state.pos, state.box, alive,
                                       params, cfg, m) * 0.999
        return jnp.sum(jax.lax.fori_loop(0, k, body, mu))

    w8, w24 = _wall(mv_k, state.mu, 8), _wall(mv_k, state.mu, 24)
    t_mv = (w24 - w8) / 16
    n_pad = state.pos.shape[0]          # masked O(N N') dense tiles
    fe = n_pad * n_pol * 56.0
    raw = n_pad * n_pol * 45.0
    kernels["thole_dipole_matvec"] = {
        "ms": round(t_mv * 1e3, 3), "n_polar": n_pol,
        "model": "N_pad*N_pol pairs x 56 flop-equiv (45 raw)",
        "flop_equiv_tflops": round(fe / t_mv / 1e12, 3),
        "pct_vpu_peak": round(100 * fe / t_mv / 1e12
                              / out["vpu_f32_peak_tflops_derived"], 1),
        "raw_pct_vpu_peak": round(100 * raw / t_mv / 1e12
                                  / out["vpu_f32_peak_tflops_derived"], 1)}

    # ---- restricted Pallas pair pass (refresh) ----------------------
    # measured on the NON-polar f32 bench config (the polar config's
    # initialize includes the SCF solve, which is not the pair pass
    # this row tracks); scalar-reduced return per the tunnel rule
    params2, state2, cfg2, thermo2 = systems.mof_h2_gcmc(
        n_side=21, spacing=4.0, n_h2=256, capacity=512,
        temperature=77.0, pressure=1.0, dtype="float32")
    cfg2 = dataclasses.replace(cfg2, fused_mc=True)
    st2 = metropolis.initialize(state2, params2, cfg2, thermo2)
    F = metropolis.frozen_refresh_rows(params2, cfg2)

    @partial(jax.jit, static_argnames=("k",))
    def refresh_k(st, k):
        def body(i, s):
            # defeat LICM: initialize() does not write pos, so a
            # loop-invariant pos lets XLA hoist the whole pair pass
            # out of the while loop (measured: 30x-too-fast slope);
            # the where() makes pos formally depend on i (never taken)
            s = s.replace(pos=jnp.where(i < 0, 0.0, s.pos))
            return metropolis.initialize.__wrapped__(
                s, params2, cfg2, thermo2, frozen_rows=F)
        fin = jax.lax.fori_loop(0, k, body, st)
        return fin.energy.rd + fin.energy.es_real + jnp.sum(fin.sk_re)

    w2, w10 = (_wall(refresh_k, st2, 2, reps=6),
               _wall(refresh_k, st2, 10, reps=6))
    t_rf = (w10 - w2) / 8
    n = st2.pos.shape[0]
    pairs = (n - F) * n
    fe_r = pairs * 44.0
    kernels["restricted_pair_refresh"] = {
        "ms": round(t_rf * 1e3, 3), "rows": int(n - F),
        "model": "(N-F)*N pairs x 44 flop-equiv (whole refresh "
                 "program incl. recip, pair-pass dominated)",
        "flop_equiv_tflops": round(fe_r / t_rf / 1e12, 3),
        "pct_vpu_peak": round(100 * fe_r / t_rf / 1e12
                              / out["vpu_f32_peak_tflops_derived"], 1)}

    # ---- fused µVT interleaved (headline) ---------------------------
    C, K = 48, 4096
    states = multichain.stack_states(st2, C)
    states, _ = metropolis.run_chunk_fused_uvt_multi(
        states, params2, cfg2, thermo2, K)
    np.asarray(states.pos)
    t0 = time.perf_counter()
    for _ in range(3):
        states, _ = metropolis.run_chunk_fused_uvt_multi(
            states, params2, cfg2, thermo2, K)
    np.asarray(states.pos)
    agg = 3 * K * C / (time.perf_counter() - t0)
    n2 = state2.pos.shape[0]
    nk = 1739.0      # ~kvectors at kmax 7 (half-space)
    fe_s = 2 * n2 * 40.0 + nk * 3 * 12.0
    kernels["fused_uvt_interleaved_c48"] = {
        "agg_steps_per_s": round(agg, 0),
        "model": "per step: 2 masked pair passes x N x 40 + S(k) "
                 "delta; VMEM-resident (HBM~0) -> latency-bound",
        "flop_equiv_tflops": round(fe_s * agg / 1e12, 3),
        "pct_vpu_peak": round(100 * fe_s * agg / 1e12
                              / out["vpu_f32_peak_tflops_derived"], 1)}

    out["kernels"] = kernels
    print(json.dumps({"kernels": kernels}, indent=1), flush=True)
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "MEASURE_ROOFLINE.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print("wrote", path)


if __name__ == "__main__":
    main()
