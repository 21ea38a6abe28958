"""Op-level profile of the domain CHUNK program alone (no rebuild glue).

Isolates the shard_map 10-step scan body that scripts/profile_domain_step
could not see inside its opaque closed_call: builds loc/dat/rep once via
the rebuild + scatter_in, then traces chunk(10) by itself. The measured
per-step cost here is the true in-chunk step price; its diff vs the
unsharded step (10.7 ms) is the step-side S=1 overhead to cut.

Usage: python scripts/profile_domain_chunk.py [n_molecules]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cavmd_tpu.utils.jitcache import enable_persistent_cache

enable_persistent_cache()

from profile_domain_glue import profile_fn  # noqa: E402


def main():
    import jax
    import numpy as np
    from jax.sharding import Mesh, PartitionSpec as P

    from cavmd_tpu.core import PhysicalConstants as PC
    from cavmd_tpu.drivers.workloads import build_large_n
    from cavmd_tpu.integrate import MethodSpec, resolve_methods
    from cavmd_tpu.parallel import domain as D

    n_mol = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000
    _, state, snap, ff = build_large_n(n_mol)
    kT = PC.kT_from_kelvin(100.0)
    methods = resolve_methods(snap, (
        MethodSpec(kind="bussi", group="molecular", kT=kT,
                   tau=PC.ps_to_atomic_units(5.0)),
        MethodSpec(kind="langevin", group="cavity", kT=kT,
                   gamma=PC.gamma_from_tau_ps(5.0)),
    ), ff.l_typeid)

    plan = D.plan_domain(snap, ff, 1)
    pack = ff.cell_pallas_pack
    mesh = Mesh(np.asarray(jax.devices()[:1]), (D.AXIS,))

    step = D.make_domain_step(ff, methods, plan, use_pallas=True)

    def run_chunk(loc, rep, dat):
        def body(carry, _):
            l, r = carry
            l, r, obs = step(l, r, dat)
            return (l, r), obs

        (loc2, rep2), obs = jax.lax.scan(body, (loc, rep), None, length=10)
        return loc2, rep2, obs

    lspec, rspec = P(D.AXIS), P()
    chunk = jax.jit(D._shard_map(
        run_chunk, mesh, in_specs=(lspec, rspec, lspec),
        out_specs=(lspec, rspec, rspec),
    ))

    rebuild = jax.jit(lambda p, b, q: D._rebuild_one(
        p, plan, b, ff.bond_k_per, ff.bond_r0_per, ff.pair_inert, q))
    scat_in = jax.jit(lambda st, da: D._scatter_in(st, da, plan, ff, pack))
    data = rebuild(state.position, state.box_L, state.charge)
    loc, dat, rep = scat_in(state, data)

    ms = profile_fn("chunk(10) only", lambda l, r, d: chunk(l, r, d)[0],
                    (loc, rep, dat), top=35, reps=10)
    print(f"in-chunk step: {ms / 10:.3f} ms/step (unsharded: ~10.7)")


if __name__ == "__main__":
    main()
