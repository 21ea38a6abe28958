"""Mesh-sharded MD step: particle-axis SPMD with XLA-inserted collectives.

The scaling recipe (SURVEY.md §2.4, "How to Scale Your Model" style): pick a
mesh (replica x atoms), annotate the state's shardings
(:func:`cavmd_tpu.parallel.mesh.state_shardings`), and jit the same fused
step — GSPMD partitions the program and inserts the collectives:

- the cavity force's global dipole reduction -> one ``psum`` over 'atoms'
  (replacing the reference GPU's two-stage block reduction + 2 D2H copies,
  CavityForceComputeGPU.cu:323-377, 471-504, 549, 597);
- thermostat group-KE reductions -> ``psum`` (replacing
  ``ComputeThermo::compute`` + the MPI_Bcast pattern of Thermostat.h:297 —
  under SPMD the scalar result is computed once, replicated);
- PPPM charge spreading -> per-shard partial grids combined by ``psum``;
  the 32^3 FFT is replicated (it is tiny next to the pair work);
- pair forces: each shard computes its row block of the (N, N) interaction
  against all-gathered positions.

All collectives ride ICI; there is no host synchronization in the step.
"""

from __future__ import annotations

import jax

from cavmd_tpu.integrate.integrator import MDState, run_steps
from cavmd_tpu.parallel.mesh import state_shardings


def make_sharded_step(step_fn, mesh, state_template: MDState, *, batched=False):
    """jit the fused step with particle-axis (and replica-axis) shardings."""
    shardings = state_shardings(mesh, state_template, batched=batched)
    return jax.jit(step_fn, in_shardings=(shardings,))


def make_sharded_runner(step_fn, mesh, state_template: MDState, *, batched=False):
    """jit a chunked scan runner with sharded carry state.

    Returns ``run(state, n_steps) -> (state, obs)``; ``n_steps`` static.
    """
    shardings = state_shardings(mesh, state_template, batched=batched)

    def runner(state, n_steps):
        return run_steps(step_fn, state, n_steps)

    return jax.jit(runner, in_shardings=(shardings,), static_argnums=(1,))


def shard_state(state: MDState, mesh, *, batched=False) -> MDState:
    """Place an MDState onto the mesh with the canonical shardings."""
    shardings = state_shardings(mesh, state, batched=batched)
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, s), state, shardings
    )
