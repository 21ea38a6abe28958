"""Snapshot: structure-of-arrays scene description, a JAX pytree.

Mirrors the consumed HOOMD ``Snapshot``/GSD frame schema (SURVEY.md §2.3):
particles (position, image, velocity, mass, charge, diameter, typeid, types),
bonds (group, typeid, types) and an orthorhombic box — so GSD inits and the
reference ``05_advanced_run`` workflow map 1:1 (cavity-particle injection,
frame selection, trajectory output).

Static metadata (type names) lives in pytree aux data; all numeric fields are
arrays, so a ``Snapshot`` can be passed through jit/vmap/shard_map directly.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from cavmd_tpu.core.box import Box, unwrap_positions


@dataclasses.dataclass(frozen=True)
class Snapshot:
    """Structure-of-arrays particle + topology scene (a pytree)."""

    # particle data
    position: jnp.ndarray  # (N, 3)
    image: jnp.ndarray  # (N, 3) int32
    velocity: jnp.ndarray  # (N, 3)
    mass: jnp.ndarray  # (N,)
    charge: jnp.ndarray  # (N,)
    diameter: jnp.ndarray  # (N,)
    typeid: jnp.ndarray  # (N,) int32
    # topology
    bond_group: jnp.ndarray  # (Nb, 2) int32
    bond_typeid: jnp.ndarray  # (Nb,) int32
    # box
    box_L: jnp.ndarray  # (3,)
    # static metadata
    types: Tuple[str, ...] = ()
    bond_types: Tuple[str, ...] = ()

    @property
    def N(self) -> int:
        return self.position.shape[0]

    @property
    def n_bonds(self) -> int:
        return self.bond_group.shape[0]

    @property
    def box(self) -> Box:
        return Box(self.box_L)

    def type_index(self, name: str) -> int:
        """Integer typeid for a named particle type (HOOMD ``getTypeByName``)."""
        return self.types.index(name)

    def unwrapped_positions(self):
        return unwrap_positions(self.position, self.image, self.box_L)

    def replace(self, **kwargs) -> "Snapshot":
        return dataclasses.replace(self, **kwargs)

    def strip_tail(self, n_real: int) -> "Snapshot":
        """Keep the first ``n_real`` particles, dropping trailing
        sharding-padding ghosts (appended after all real rows by
        ``parallel.pad_snapshot_to``, so bond indices stay valid)."""
        if n_real >= self.N:
            return self
        return self.replace(
            position=self.position[:n_real],
            image=self.image[:n_real],
            velocity=self.velocity[:n_real],
            mass=self.mass[:n_real],
            charge=self.charge[:n_real],
            diameter=self.diameter[:n_real],
            typeid=self.typeid[:n_real],
            types=tuple(t for t in self.types if t != "__ghost__"),
        )

    def astype(self, dtype) -> "Snapshot":
        """Cast all floating-point fields to ``dtype`` (int fields untouched)."""

        def cast(x):
            x = jnp.asarray(x)
            if jnp.issubdtype(x.dtype, jnp.floating):
                return x.astype(dtype)
            return x

        return Snapshot(
            position=cast(self.position),
            image=jnp.asarray(self.image, jnp.int32),
            velocity=cast(self.velocity),
            mass=cast(self.mass),
            charge=cast(self.charge),
            diameter=cast(self.diameter),
            typeid=jnp.asarray(self.typeid, jnp.int32),
            bond_group=jnp.asarray(self.bond_group, jnp.int32),
            bond_typeid=jnp.asarray(self.bond_typeid, jnp.int32),
            box_L=cast(self.box_L),
            types=self.types,
            bond_types=self.bond_types,
        )

    @staticmethod
    def create(
        position,
        box_L,
        *,
        velocity=None,
        image=None,
        mass=None,
        charge=None,
        diameter=None,
        typeid=None,
        types=("A",),
        bond_group=None,
        bond_typeid=None,
        bond_types=(),
        dtype=None,
    ) -> "Snapshot":
        """Build a snapshot from (possibly partial) NumPy/JAX arrays."""
        position = jnp.asarray(position, dtype=dtype)
        n = position.shape[0]
        dtype = position.dtype

        def arr(x, default, shape, dt=dtype):
            if x is None:
                return jnp.full(shape, default, dtype=dt)
            return jnp.asarray(x, dtype=dt).reshape(shape)

        bond_group = (
            jnp.zeros((0, 2), jnp.int32)
            if bond_group is None
            else jnp.asarray(bond_group, jnp.int32).reshape(-1, 2)
        )
        nb = bond_group.shape[0]
        return Snapshot(
            position=position,
            image=arr(image, 0, (n, 3), jnp.int32),
            velocity=arr(velocity, 0.0, (n, 3)),
            mass=arr(mass, 1.0, (n,)),
            charge=arr(charge, 0.0, (n,)),
            diameter=arr(diameter, 1.0, (n,)),
            typeid=arr(typeid, 0, (n,), jnp.int32),
            bond_group=bond_group,
            bond_typeid=arr(bond_typeid, 0, (nb,), jnp.int32),
            box_L=jnp.asarray(box_L, dtype=dtype),
            types=tuple(types),
            bond_types=tuple(bond_types),
        )


jax.tree_util.register_dataclass(
    Snapshot,
    data_fields=[
        "position",
        "image",
        "velocity",
        "mass",
        "charge",
        "diameter",
        "typeid",
        "bond_group",
        "bond_typeid",
        "box_L",
    ],
    meta_fields=["types", "bond_types"],
)


def add_cavity_particle(
    snapshot: Snapshot,
    *,
    coupling: float,
    freq_cm1: float,
    temperature_K: float,
    finite_q: bool = False,
    phmass: float = 1.0,
    seed: int = 0,
) -> Snapshot:
    """Inject the photon pseudo-particle (type ``'L'``) into a molecular scene.

    Parity with reference ``examples/05_advanced_run.py:453-537``
    (``create_cavity_particle``): the photon starts at the origin (q=0 mode)
    or at the displaced equilibrium ``-g*d/omega_c^2`` with z zeroed
    (finite-q mode); thermal position noise of width ``sqrt(kT/omega_c^2)``
    is added only when the coupling is non-zero. The new particle has
    charge 0, mass ``phmass``, diameter 1, typeid = index of 'L'.

    Host-side (NumPy) function — runs once at setup, not in the hot loop.
    """
    from cavmd_tpu.core.units import PhysicalConstants

    rng = np.random.default_rng(seed)
    box_L = np.asarray(snapshot.box_L)
    pos = np.asarray(snapshot.position)
    img = np.asarray(snapshot.image)
    charge = np.asarray(snapshot.charge)

    unwrapped = pos + img * box_L[None, :]
    dipmom = np.einsum("i,ij->j", charge, unwrapped)

    omegac = PhysicalConstants.omega_from_cm1(freq_cm1)
    kT = PhysicalConstants.kT_from_kelvin(temperature_K)

    if finite_q:
        newpos = -dipmom * coupling / omegac**2
        newpos[-1] = 0.0
    else:
        newpos = np.zeros(3)
    if coupling != 0.0:
        sigma = np.sqrt(kT / omegac**2)
        newpos = rng.normal(loc=newpos, scale=sigma, size=3)

    image_flags = np.floor((newpos + box_L / 2) / box_L)
    newpos = newpos - image_flags * box_L

    types = snapshot.types if "L" in snapshot.types else snapshot.types + ("L",)
    l_typeid = types.index("L")
    dtype = pos.dtype

    return snapshot.replace(
        position=jnp.concatenate(
            [snapshot.position, jnp.asarray([newpos], dtype=dtype)]
        ),
        image=jnp.concatenate(
            [snapshot.image, jnp.asarray([image_flags], jnp.int32)]
        ),
        velocity=jnp.concatenate(
            [snapshot.velocity, jnp.zeros((1, 3), dtype=dtype)]
        ),
        mass=jnp.concatenate(
            [snapshot.mass, jnp.asarray([phmass], dtype=dtype)]
        ),
        charge=jnp.concatenate([snapshot.charge, jnp.zeros((1,), dtype=dtype)]),
        diameter=jnp.concatenate(
            [snapshot.diameter, jnp.ones((1,), dtype=dtype)]
        ),
        typeid=jnp.concatenate(
            [snapshot.typeid, jnp.asarray([l_typeid], jnp.int32)]
        ),
        types=types,
    )
