"""Microbench: i-side tile-assembly strategies for the cell kernel.

The N=100k step budget charges ~2.5 ms to the i-side row gather
(`rows[idx]` with idx = (C, cap) bucket slots — 221k rows of 32 B). TPU
gathers are row-count-bound, not byte-bound, at this row size, so the
candidates are:

  a) rows[idx]                 — current: C*cap = 221k tiny rows
  b) rows[perm]                — cell-sorted compact order: N = 100k rows
  c) dynamic-slice per cell    — (C,) starts, slice (cap, R): 4913 fat rows
  d) b + c chained             — sort then slice (the sorted-layout plan)

plus the force-readout gather (100k rows of the padded slot array).

Usage: python scripts/bench_gather_paths.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def time_fn(fn, *args, reps=50):
    out = jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps * 1e3  # ms


def main():
    n = 100_001
    C, cap, R = 4913, 45, 8
    rng = np.random.default_rng(0)

    rows = jnp.asarray(rng.standard_normal((n + 1, R)), jnp.float32)
    # bucket_idx: each particle in exactly one slot, rest sentinel n
    perm_np = rng.permutation(n)
    occ_np = np.bincount(perm_np % C, minlength=C)  # ~Poisson(20.4)
    idx_np = np.full((C, cap), n, np.int64)
    fill = np.zeros(C, np.int64)
    for p in perm_np:
        c = p % C
        if fill[c] < cap:
            idx_np[c, fill[c]] = p
            fill[c] += 1
    idx = jnp.asarray(idx_np, jnp.int32)
    perm = jnp.asarray(perm_np, jnp.int32)
    starts = jnp.asarray(np.minimum(np.cumsum(occ_np) - occ_np, n - cap),
                         jnp.int32)

    print(f"backend={jax.default_backend()} N={n} C={C} cap={cap} R={R}")

    a = jax.jit(lambda r: r[idx])
    print(f"a) rows[idx]        (C*cap={C*cap} rows x {R*4} B): "
          f"{time_fn(a, rows):6.3f} ms")

    b = jax.jit(lambda r: r[perm])
    print(f"b) rows[perm]       (N={n} rows x {R*4} B):        "
          f"{time_fn(b, rows):6.3f} ms")

    def slice_cells(r):
        return jax.vmap(
            lambda s: jax.lax.dynamic_slice(r, (s, 0), (cap, R))
        )(starts)

    c = jax.jit(slice_cells)
    print(f"c) per-cell slices  (C={C} rows x {cap*R*4} B):      "
          f"{time_fn(c, rows):6.3f} ms")

    d = jax.jit(lambda r: slice_cells(r[perm]))
    print(f"d) sort+slice       (b then c):                    "
          f"{time_fn(d, rows):6.3f} ms")

    # positions-only sort (12 B rows) — same row count as (b)
    pos = rows[:, :3]
    e = jax.jit(lambda r: r[perm])
    print(f"e) pos[perm]        (N rows x 12 B):               "
          f"{time_fn(e, pos):6.3f} ms")

    # force readout: (C*cap, 3) padded -> (N, 3) via slot_of
    padded = jnp.asarray(rng.standard_normal((C * cap, 3)), jnp.float32)
    slot_np = np.zeros(n, np.int64)
    for c_ in range(C):
        for s in range(cap):
            if idx_np[c_, s] < n:
                slot_np[idx_np[c_, s]] = c_ * cap + s
    slot = jnp.asarray(slot_np, jnp.int32)
    f = jax.jit(lambda o: o[slot])
    print(f"f) out[slot_of]     (N rows x 12 B):               "
          f"{time_fn(f, padded):6.3f} ms")

    # one-hot matmul alternative for (b): N x N is impossible, but the
    # SORT itself can ride a cheaper primitive: lax.sort by key
    keys = jnp.asarray(rng.integers(0, C, n), jnp.int32)
    g = jax.jit(lambda r: jax.lax.sort((keys, r[:n]), num_keys=1)[1])
    print(f"g) lax.sort rows by cell key (N rows):             "
          f"{time_fn(g, rows):6.3f} ms")


if __name__ == "__main__":
    main()
