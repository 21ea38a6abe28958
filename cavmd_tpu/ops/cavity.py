"""Cavity-QED light-matter force: H = 1/2 K q^2 + g (q.d) + (g^2/2K) d^2.

TPU-native rebuild of the reference plugin's core physics
(``src/CavityForceCompute.cc:131-208`` and the GPU kernels in
``src/CavityForceComputeGPU.cu``). Semantics preserved exactly:

- photon = the unique particle of type ``'L'`` (located by typeid);
- ``d = sum_i q_i * r_i^unwrapped`` over all *non-photon* particles
  (cc:113-129) — the global dipole reduction;
- only x,y components of the photon coordinate and dipole couple
  (cc:169-171): ``E_harm = 1/2 K |q|^2`` (full 3D), ``E_coup = g d_xy.q_xy``,
  ``E_self = g^2/(2K) |d_xy|^2`` (cc:174-176);
- molecular force ``F_i = -g q_i (q_xy + (g/K) d_xy)`` with the z component
  forced to zero (cc:183-199); photon force ``F_L = -K q - g d_xy``
  (cc:203-207);
- the energy is *not* distributed into per-particle PE (cc:178-180) — it is
  reported through the component getters.

Unlike the reference GPU path (two device->host syncs per step,
``CavityForceComputeGPU.cu:549,597``), everything here is one fused XLA
computation: an elementwise unwrap, one ``sum`` reduction (a ``psum`` when
the particle axis is sharded), and an elementwise force write. No host
round-trips; the N<100k bound of the CUDA kernel (cu:395) does not exist.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from cavmd_tpu.core.box import unwrap_positions


class CavityParams(NamedTuple):
    """Parameters of the single cavity mode.

    Parity: ``cavity_force_params`` (reference ``src/CavityForceCompute.h:28-54``)
    with ``K = phmass * omegac**2`` computed the same way.
    """

    omegac: jnp.ndarray  # cavity frequency, a.u.
    couplstr: jnp.ndarray  # coupling strength g, a.u.
    phmass: jnp.ndarray  # photon mass (default 1.0)

    @property
    def K(self):
        return self.phmass * self.omegac**2

    @staticmethod
    def create(omegac, couplstr, phmass=1.0, dtype=None):
        return CavityParams(
            jnp.asarray(omegac, dtype=dtype),
            jnp.asarray(couplstr, dtype=dtype),
            jnp.asarray(phmass, dtype=dtype),
        )


def molecular_dipole(position, image, box_L, charge, photon_mask):
    """Global molecular dipole ``d = sum_i q_i r_i`` (photon excluded).

    The one global reduction of the cavity force — on a sharded particle
    axis this lowers to a single ``psum`` over ICI.
    """
    unwrapped = unwrap_positions(position, image, box_L)
    w = jnp.where(photon_mask, 0.0, charge)
    return jnp.sum(w[:, None] * unwrapped, axis=0)


def cavity_force(position, image, box_L, charge, typeid, l_typeid, params):
    """Compute cavity forces and the three energy components.

    Args:
        position, image: wrapped positions (N,3) and image flags (N,3).
        box_L: (3,) box lengths.
        charge: (N,) charges.
        typeid: (N,) integer type ids.
        l_typeid: static int — the typeid of the photon type 'L'.
        params: CavityParams.

    Returns:
        (forces (N,3), energies dict with 'harmonic', 'coupling',
        'dipole_self' keys). If no photon exists, forces and energies are
        all zero (parity: cc:149-156).
    """
    dtype = position.dtype
    photon_mask = typeid == l_typeid
    has_photon = jnp.any(photon_mask)

    unwrapped = unwrap_positions(position, image, box_L)

    # global dipole reduction, photon excluded (cc:120-128)
    w = jnp.where(photon_mask, jnp.zeros((), dtype), charge)
    dipole = jnp.sum(w[:, None] * unwrapped, axis=0)

    # photon coordinate: select the (unique) photon row without host sync
    q_photon = jnp.sum(
        jnp.where(photon_mask[:, None], unwrapped, jnp.zeros((), dtype)), axis=0
    )

    xy = jnp.asarray([1.0, 1.0, 0.0], dtype=dtype)
    q_xy = q_photon * xy
    d_xy = dipole * xy

    K = params.K.astype(dtype)
    g = params.couplstr.astype(dtype)

    e_harm = 0.5 * K * jnp.dot(q_photon, q_photon)
    e_coup = g * jnp.dot(d_xy, q_xy)
    e_self = 0.5 * (g * g / K) * jnp.dot(d_xy, d_xy)

    # molecular forces: F_i = -g q_i (q_xy + (g/K) d_xy), z zeroed (cc:183-199)
    Dq = q_xy + (g / K) * d_xy
    f_mol = (-g * charge)[:, None] * Dq[None, :] * xy[None, :]

    # photon force: -K q (3D) - g d_xy (cc:203-207)
    f_photon = -K * q_photon - g * d_xy

    forces = jnp.where(photon_mask[:, None], f_photon[None, :], f_mol)

    zero = jnp.zeros((), dtype)
    forces = jnp.where(has_photon, forces, jnp.zeros_like(forces))
    energies = {
        "harmonic": jnp.where(has_photon, e_harm, zero),
        "coupling": jnp.where(has_photon, e_coup, zero),
        "dipole_self": jnp.where(has_photon, e_self, zero),
    }
    return forces, energies


def cavity_total_energy(energies):
    """Total cavity energy = harmonic + coupling + dipole self-energy.

    Parity: the Python wrapper's ``.energy`` override which sums components
    instead of per-particle PE (reference ``src/cavitymd/forces.py:209-212``).
    """
    return energies["harmonic"] + energies["coupling"] + energies["dipole_self"]
