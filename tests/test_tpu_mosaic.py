"""Opt-in real-TPU Mosaic compile checks (CAVMD_TPU_TESTS=1).

CI forces the CPU backend (conftest.py), so the Pallas kernels normally
run interpret-mode only and nothing in the suite compiles Mosaic. These
tests close that gap when a TPU is reachable: each spawns a clean
subprocess (the conftest's platform force is process-wide and cannot be
undone in-process) that attaches the real chip, compiles the kernel
through Mosaic, and checks the numerics against the XLA path.

Opt-in rather than auto-detected because probing the axon TPU plugin
*hangs* (not errors) when the tunnel is down — an auto-skip probe would
stall the whole suite. Run: ``CAVMD_TPU_TESTS=1 pytest -m tpu``.
"""

import os
import subprocess
import sys

import pytest

pytestmark = [
    pytest.mark.tpu,
    pytest.mark.skipif(
        os.environ.get("CAVMD_TPU_TESTS") != "1",
        reason="real-TPU tests are opt-in: set CAVMD_TPU_TESTS=1",
    ),
]

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_SPREAD_CHECK = """
import sys
sys.path.insert(0, %r)  # not PYTHONPATH: env vars break axon discovery
import jax, jax.numpy as jnp, numpy as np
assert jax.default_backend() == "tpu", jax.default_backend()

from cavmd_tpu.ops.pppm import PPPMParams, pppm_force_and_energy, \\
    pppm_force_and_energy_pallas

rng = np.random.default_rng(5)
n = 4096
box = jnp.asarray([60.0, 60.0, 60.0], jnp.float32)
pos = jnp.asarray((rng.random((n, 3)) - 0.5) * np.asarray(box), jnp.float32)
q = jnp.asarray(rng.standard_normal(n), jnp.float32)
q = q - q.mean()

for mesh in ((32, 32, 32), (8, 16, 32)):
    params, order = PPPMParams.create(
        np.asarray(box), mesh=mesh, order=6, kappa=0.35, dtype=jnp.float32)
    f_ref, e_ref = jax.jit(
        lambda p: pppm_force_and_energy(p, q, box, params, order, mesh))(pos)
    for stacked in (False, True):
        f_p, e_p = jax.jit(
            lambda p, s=stacked: pppm_force_and_energy_pallas(
                p, q, box, params, order, mesh, stacked=s))(pos)
        scale = float(jnp.abs(f_ref).max())
        dev = float(jnp.abs(f_p - f_ref).max()) / scale
        ed = abs(float(e_p) - float(e_ref)) / abs(float(e_ref))
        assert dev < 1e-3, (mesh, stacked, dev)
        assert ed < 1e-4, (mesh, stacked, ed)
        print(f"mesh {mesh} stacked={stacked}: Mosaic spread "
              f"force dev {dev:.1e} energy {ed:.1e}")
print("MOSAIC_SPREAD_OK")
"""


def test_mosaic_spread_compiles_and_matches_xla():
    """Compile the Pallas spread (fwd + analytic bwd) through Mosaic on
    the real chip and compare against the XLA GEMM path — the check the
    interpret-mode suite cannot perform."""
    proc = subprocess.run(
        [sys.executable, "-c", _SPREAD_CHECK % REPO],
        capture_output=True, text=True, timeout=600,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "MOSAIC_SPREAD_OK" in proc.stdout, proc.stdout


_CELL_CHECK = """
import sys
sys.path.insert(0, %r)
import jax, jax.numpy as jnp, numpy as np
assert jax.default_backend() == "tpu", jax.default_backend()

from cavmd_tpu.drivers.workloads import build_large_n

# 3000 molecules -> N=6001 > the 4096 cell-mode threshold: the step runs
# the fused Pallas cell kernel (Mosaic) end to end
runner, state, snap, ff = build_large_n(3000)
state, obs = runner(state, 20)
jax.block_until_ready(state.position)
assert not bool(np.any(np.asarray(obs["cell_overflow"]))), "overflow"
from cavmd_tpu.integrate import universe_energy
eu = np.asarray(universe_energy(obs))
drift = float(eu.max() - eu.min())
assert drift < 5.0, drift  # f32 large-N band, see bench_large_n.py
print(f"cell-mode 20 steps, universe drift {drift:.2e} Ha")
print("MOSAIC_CELL_OK")
"""


def test_mosaic_cell_kernel_steps():
    """Run the production cell-mode step (fused Pallas cell kernel) on
    the real chip for 20 steps with the overflow and conservation
    oracles."""
    proc = subprocess.run(
        [sys.executable, "-c", _CELL_CHECK % REPO],
        capture_output=True, text=True, timeout=600,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "MOSAIC_CELL_OK" in proc.stdout, proc.stdout


_DOMAIN_CHECK = """
import sys
sys.path.insert(0, %r)
import jax, jax.numpy as jnp, numpy as np
assert jax.default_backend() == "tpu", jax.default_backend()

from cavmd_tpu.core import PhysicalConstants as PC
from cavmd_tpu.core import add_cavity_particle, make_diatomic_system
from cavmd_tpu.integrate import (
    ForceField, MethodSpec, init_state, resolve_methods,
)
from cavmd_tpu.parallel.domain import make_domain_runner, plan_domain

snap = make_diatomic_system(550, box_L=65.0, temperature_K=100.0, seed=0,
                            dtype=np.float64).astype(jnp.float32)
snap = add_cavity_particle(snap, coupling=1e-3, freq_cm1=2000.0,
                           temperature_K=100.0, seed=1)
ff = ForceField.create(snap, coupling=1e-3, freq_cm1=2000.0, r_cut=8.0,
                       pair_mode="cell", pppm_mesh=(16, 16, 16))
kT = PC.kT_from_kelvin(100.0)
methods = resolve_methods(
    snap,
    (MethodSpec(kind="bussi", group="molecular", kT=kT,
                tau=PC.ps_to_atomic_units(5.0)),
     MethodSpec(kind="langevin", group="cavity", kT=kT,
                gamma=PC.gamma_from_tau_ps(5.0))),
    ff.l_typeid,
)
# threefry pinned: this test compares trajectories across two DIFFERENT
# compiled programs on TPU, and only threefry guarantees identical bits
# (the TPU default is rbg — throughput PRNG, bits not program-portable)
state = init_state(snap, ff, dt=PC.fs_to_atomic_units(0.5), seed=7,
                   rng_impl="threefry")
plan = plan_domain(snap, ff, 1)  # one slab on the one real chip

# XLA-tile domain path vs Pallas-tile domain path: same shard_map
# structure (halo ppermute, psums, per-shard PPPM spread), only the tile
# kernel differs — so any deviation is the Mosaic kernel itself
run_xla = make_domain_runner(ff, methods, plan, rebuild_every=3,
                             use_pallas=False)
fin_x, obs_x = run_xla(state, 6)
jax.block_until_ready(fin_x.position)
print("XLA-tile domain runner done", flush=True)
run_pl = make_domain_runner(ff, methods, plan, rebuild_every=3,
                            use_pallas=True)
fin_p, obs_p = run_pl(state, 6)
jax.block_until_ready(fin_p.position)
print("Pallas-tile domain runner done", flush=True)
np.testing.assert_allclose(np.asarray(fin_p.position),
                           np.asarray(fin_x.position),
                           rtol=2e-5, atol=2e-5)
np.testing.assert_allclose(np.asarray(obs_p["lj"]),
                           np.asarray(obs_x["lj"]), rtol=1e-4, atol=1e-6)
assert not np.asarray(obs_p["cell_overflow"]).any()
print("MOSAIC_DOMAIN_OK")
"""


def test_mosaic_domain_runner_pallas_in_shard_map():
    """Compile the domain pipeline with the Pallas tile kernel INSIDE
    shard_map through Mosaic on the real chip (S=1 mesh) and compare
    against the XLA-tile domain path — the shard_map x pallas_call
    composition the interpret-mode suite (tests/test_domain.py) can only
    emulate."""
    proc = subprocess.run(
        [sys.executable, "-c", _DOMAIN_CHECK % REPO],
        capture_output=True, text=True, timeout=900,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "MOSAIC_DOMAIN_OK" in proc.stdout, proc.stdout
