"""Sweep the cols kernel's j-window split slot (jsplit) at N=100k.

Times the full production step (same workload as bench_large_n) with the
two-capacity-class j-window pinned at each candidate split slot;
``jsplit=0`` is the single-window round-2 kernel. Used to pick the auto
formula's anchor (docs/performance.md records the measurements).

Usage: python scripts/bench_jsplit_sweep.py [n_molecules] [slots...]
"""

from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from cavmd_tpu.utils.jitcache import enable_persistent_cache

enable_persistent_cache()


def main():
    args = [a for a in sys.argv[1:]]
    n_mol = int(args[0]) if args else 50_000
    slots = [int(a) for a in args[1:]] or [0, 28, 32, 36, 40]

    import cavmd_tpu.ops.pallas_kernels as pk

    orig = pk.fused_cell_cols_pallas
    from cavmd_tpu.drivers.workloads import build_large_n

    for js in slots:
        pk.fused_cell_cols_pallas = functools.partial(orig, jsplit=js)
        try:
            runner, state, snap, ff = build_large_n(n_mol)
            chunk = 100
            state, _ = runner(state, chunk)  # compile + warm
            jax.block_until_ready(state.position)
            t0 = time.perf_counter()
            n_chunks = 3
            for _ in range(n_chunks):
                state, _ = runner(state, chunk)
            jax.block_until_ready(state.position)
            dt = (time.perf_counter() - t0) / (n_chunks * chunk)
            print(f"jsplit={js}: {dt * 1e3:.2f} ms/step", flush=True)
        finally:
            pk.fused_cell_cols_pallas = orig


if __name__ == "__main__":
    main()
