"""A/B microbench: PPPM force+energy, XLA GEMM spread vs Pallas spread.

Times one fused force evaluation (fwd + analytic/autodiff bwd) at
N=100,001 for both spread paths, at 32^3 and 64^3, plus a chunk sweep
for the Pallas kernel. Drives the gate decision in
``ops/pppm_pallas.py:pallas_spread_ok`` (the dense-factor budget) with
same-session numbers.

Usage: python scripts/bench_spread_ab.py [n_particles]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from cavmd_tpu.utils.jitcache import enable_persistent_cache

enable_persistent_cache()


def time_fn(fn, *args, reps=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps * 1e3  # ms


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100_001
    rng = np.random.default_rng(0)
    box = jnp.asarray([170.0, 170.0, 170.0], jnp.float32)
    pos = jnp.asarray((rng.random((n, 3)) - 0.5) * np.asarray(box),
                      jnp.float32)
    q = jnp.asarray(rng.standard_normal(n), jnp.float32)
    q = q - q.mean()  # neutral

    from cavmd_tpu.ops.pppm import (
        PPPMParams,
        pppm_force_and_energy,
        pppm_force_and_energy_pallas,
    )

    print(f"backend={jax.default_backend()} N={n}")
    for k in (32, 64):
        mesh = (k,) * 3
        params, order = PPPMParams.create(
            np.asarray(box), mesh=mesh, order=6, kappa=0.35,
            dtype=jnp.float32,
        )

        f_ref = e_ref = None
        # XLA dense path: (N, Ky*Kz) f32 factor = n*k*k*4 bytes; skip
        # where it would OOM-or-thrash (>2 GB at 64^3/100k incl. bwd)
        dense_gb = n * k * k * 4 / 2**30
        if dense_gb < 1.0:
            xla = jax.jit(lambda p: pppm_force_and_energy(
                p, q, box, params, order, mesh))
            ms = time_fn(xla, pos)
            f_ref, e_ref = xla(pos)
            print(f"  {k}^3 XLA GEMM spread: {ms:7.2f} ms/eval "
                  f"(dense factor {dense_gb*1024:.0f} MB)")
        else:
            print(f"  {k}^3 XLA GEMM spread: skipped "
                  f"(dense factor {dense_gb:.1f} GB)")

        for stacked in (False, True):
            for chunk in (None, 128, 256, 512):
                try:
                    pal = jax.jit(
                        lambda p, c=chunk, s=stacked:
                        pppm_force_and_energy_pallas(
                            p, q, box, params, order, mesh, chunk=c,
                            stacked=s))
                    ms = time_fn(pal, pos)
                    f_p, e_p = pal(pos)
                    tag = "auto" if chunk is None else str(chunk)
                    var = "stacked" if stacked else "per-axis"
                    line = (f"  {k}^3 Pallas {var:>8} (chunk {tag:>4}): "
                            f"{ms:7.2f} ms/eval")
                    if f_ref is not None:
                        scale = float(jnp.abs(f_ref).max())
                        dev = float(jnp.abs(f_p - f_ref).max()) / scale
                        line += f"  max force dev vs XLA {dev:.1e}"
                    print(line)
                except Exception as exc:  # VMEM OOM at large chunks: report
                    print(f"  {k}^3 Pallas stacked={stacked} (chunk {chunk}): "
                          f"FAILED {type(exc).__name__}: {str(exc)[:120]}")


if __name__ == "__main__":
    main()
