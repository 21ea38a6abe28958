"""Op-level diff of the domain chunk program vs the unsharded runner.

scripts/profile_domain_rebuild.py put the S=1 in-chunk step at ~15.8
ms/step vs 10.7 unsharded; this traces both 10-step programs and prints
their top self-time ops so the +5 ms/step gets names before it gets
"optimized". Usage: python scripts/profile_domain_step.py [n_molecules]
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

    from cavmd_tpu.core import PhysicalConstants as PC
    from cavmd_tpu.drivers.workloads import build_large_n
    from cavmd_tpu.integrate import MethodSpec, resolve_methods
    from cavmd_tpu.parallel import domain as D

    n_mol = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000
    runner, state, snap, ff = build_large_n(n_mol)
    kT = PC.kT_from_kelvin(100.0)
    methods = resolve_methods(snap, (
        MethodSpec(kind="bussi", group="molecular", kT=kT,
                   tau=PC.ps_to_atomic_units(5.0)),
        MethodSpec(kind="langevin", group="cavity", kT=kT,
                   gamma=PC.gamma_from_tau_ps(5.0)),
    ), ff.l_typeid)

    plan = D.plan_domain(snap, ff, 1)
    drun = D.make_domain_runner(ff, methods, plan, rebuild_every=10)

    profile_fn("unsharded 10 steps", lambda s: runner(s, 10)[0],
               (state,), top=20, reps=10)
    profile_fn("domain 10 steps + 1 rebuild", lambda s: drun(s, 10)[0],
               (state,), top=30, reps=10)


if __name__ == "__main__":
    main()
