"""Minimal repro harness for the XLA-CPU segfault (r3 verdict item 6).

Symptom: a long single-process CPU test run segfaults after hundreds of
cached executables — first observed compiling the ~180th test's scan,
then (r3) INSIDE test_fused_mc after ~75 Pallas-interpret tests.  The
mitigation is tests/conftest.py's jax.clear_caches() every module.

This harness isolates the ingredients in SUBPROCESSES (a crash kills
the child, not the sweep) and records how far each variant gets:

  jit     : K distinct jitted lax.scan programs (control)
  pallas  : K distinct Pallas interpret-mode kernels
  mix     : alternating scan + pallas-interpret (the suite's shape)
  mix40   : mix + jax.clear_caches() every 40 (the mitigation)

Distinctness comes from varying shapes (forces fresh compilations and
cache growth, like a test suite does).

    python tools/segfault_repro.py          # full sweep -> JSON
    python tools/segfault_repro.py child <mode> <K>   # internal
"""
from __future__ import annotations

import json
import os
import subprocess
import sys

os.environ["JAX_PLATFORMS"] = "cpu"


def child(mode: str, k: int) -> None:
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np
    from jax.experimental import pallas as pl

    def scan_prog(i):
        n = 64 + (i % 97)

        @jax.jit
        def f(x):
            def body(c, t):
                return c * 0.999 + jnp.sum(x[t % n]) * 1e-6, c
            return jax.lax.scan(body, jnp.float32(0.0),
                                jnp.arange(16 + i % 7))[0]
        return float(f(jnp.ones((n, 8), jnp.float32)))

    def pallas_prog(i):
        n = 128 * (1 + i % 13)

        def kern(x_ref, o_ref):
            o_ref[...] = x_ref[...] * np.float32(2.0) + np.float32(i % 5)

        f = pl.pallas_call(
            kern, out_shape=jax.ShapeDtypeStruct((8, n), jnp.float32),
            interpret=True)
        return float(jax.jit(f)(jnp.ones((8, n), jnp.float32)).sum())

    for i in range(k):
        if mode == "jit":
            scan_prog(i)
        elif mode == "pallas":
            pallas_prog(i)
        elif mode in ("mix", "mix40"):
            (scan_prog if i % 2 else pallas_prog)(i)
            if mode == "mix40" and i % 40 == 39:
                jax.clear_caches()
        if i % 25 == 24:
            print(i + 1, flush=True)
    print("DONE", flush=True)


def main():
    if len(sys.argv) > 1 and sys.argv[1] == "child":
        child(sys.argv[2], int(sys.argv[3]))
        return
    out = {}
    K = int(os.environ.get("SEGFAULT_K", "400"))
    for mode in ("jit", "pallas", "mix", "mix40"):
        p = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "child", mode,
             str(K)],
            capture_output=True, text=True, timeout=7200)
        lines = [l for l in p.stdout.splitlines() if l.strip()]
        done = lines and lines[-1] == "DONE"
        progressed = ([int(l) for l in lines if l.isdigit()] or [0])[-1]
        out[mode] = {"completed": done, "rc": p.returncode,
                     "progressed_to": progressed if not done else K,
                     "stderr_tail": p.stderr[-300:] if p.returncode
                     else ""}
        print(json.dumps({mode: out[mode]}), flush=True)
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "MEASURE_SEGFAULT_REPRO.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print("wrote", path)


if __name__ == "__main__":
    main()
