"""Pallas fused pair kernel vs the jnp fused path (interpret mode, f32)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cavmd_tpu.core import add_cavity_particle, make_diatomic_system
from cavmd_tpu.integrate import ForceField
from cavmd_tpu.ops.lj import fused_pair_force
from cavmd_tpu.ops.pallas_kernels import PallasPairPack, make_fused_pair_pallas


def test_pallas_pair_matches_jnp():
    snap = make_diatomic_system(40, box_L=28.0, seed=5)
    snap = add_cavity_particle(
        snap, coupling=1e-3, freq_cm1=2000.0, temperature_K=100.0, seed=6
    )
    ff = ForceField.create(snap, coupling=1e-3, r_cut=12.0)
    pos32 = snap.position.astype(jnp.float32)
    box32 = snap.box_L.astype(jnp.float32)
    pair32 = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.float32) if x.dtype.kind == "f" else x,
        ff.lj_pair,
    )
    f_ref, elj_ref, eew_ref = fused_pair_force(
        pos32, box32, pair32, ff.qq_pair.astype(jnp.float32),
        ff.coulomb_active, jnp.float32(ff.kappa), ff.coulomb_rcut,
    )

    pack = PallasPairPack.create(
        ff.lj_pair, np.asarray(ff.qq_pair), np.asarray(ff.coulomb_active),
        snap.N, tile=8,
    )
    run = make_fused_pair_pallas(
        pack, float(ff.kappa), ff.coulomb_rcut, tile=8, interpret=True
    )
    f, elj, eew = run(pos32, box32)

    scale = float(jnp.abs(f_ref).max())
    np.testing.assert_allclose(
        np.asarray(f), np.asarray(f_ref), atol=2e-6 * scale
    )
    # erfc approximation: 1.5e-7 absolute -> loose relative tolerance
    assert float(elj) == pytest.approx(float(elj_ref), rel=1e-5, abs=1e-9)
    assert float(eew) == pytest.approx(float(eew_ref), rel=1e-4, abs=1e-8)
