"""Benchmark: MD steps/sec at the reference scale (init-0.gsd conditions).

Reproduces the BASELINE.md anchor workload: 501 particles (500 molecular
atoms + 1 photon), full force mix (cavity + harmonic bonds + shifted LJ
r_cut 15 + Ewald short + PPPM 32^3 order 6), Bussi molecular bath +
Langevin cavity bath, per-step on-device energy audit — i.e. the same
physics the reference runs at ~134 steps/s on 1 CPU core (ipynb cell 35).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "steps/s", "vs_baseline": N/134}

Runs on the default JAX backend (the real TPU chip under axon).
"""

from __future__ import annotations

import json
import time

BASELINE_STEPS_PER_SEC = 134.0  # reference CPU TPS (BASELINE.md)


def main():
    import jax

    from cavmd_tpu.integrate import run_steps
    from __graft_entry__ import _build

    step, state, snap, ff, methods, kT = _build()

    runner = jax.jit(
        lambda s, n: run_steps(step, s, n), static_argnums=(1,)
    )

    # warmup / compile
    chunk = 1000
    state, obs = runner(state, chunk)
    jax.block_until_ready(state.position)

    # timed: several chunks
    n_chunks = 5
    t0 = time.perf_counter()
    for _ in range(n_chunks):
        state, obs = runner(state, chunk)
    jax.block_until_ready(state.position)
    wall = time.perf_counter() - t0

    steps_per_sec = n_chunks * chunk / wall

    # ns/day at the reference's adaptive-dt plateau (~0.39 fs, BASELINE.md)
    dt_fs = 0.25
    ns_per_day = steps_per_sec * dt_fs * 1e-6 * 86400

    result = {
        "metric": "md_steps_per_sec_n501_cavity_full_mix",
        "value": round(steps_per_sec, 1),
        "unit": "steps/s",
        "vs_baseline": round(steps_per_sec / BASELINE_STEPS_PER_SEC, 2),
        "detail": {
            "n_particles": int(snap.N),
            "backend": jax.default_backend(),
            "device": str(jax.devices()[0]),
            "dtype": str(snap.position.dtype),
            "ns_per_day_at_0.25fs": round(ns_per_day, 2),
            "baseline_steps_per_sec": BASELINE_STEPS_PER_SEC,
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
