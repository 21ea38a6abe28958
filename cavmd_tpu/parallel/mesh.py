"""Device-mesh helpers for replica (data) and particle (spatial) parallelism.

The reference's parallelism axes (SURVEY.md §2.4) map to a 2-D
``jax.sharding.Mesh``:

- **replica axis** ('replica'): independent trajectories — the SLURM array
  dimension of the reference (submit.sh ``--array=0-499``) becomes a batched
  leading axis, vmapped on one chip and sharded across chips;
- **atom axis** ('atoms'): spatial data parallelism — the domain
  decomposition the reference only inherits MPI hooks for
  (Thermostat.h:297-303) becomes particle-axis sharding with XLA-inserted
  collectives (psum for the dipole/KE reductions and the PPPM grid).

Collectives ride ICI within a slice; the design keeps every reduction a
single ``psum`` — there is no host round-trip anywhere in the step.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_replica: int = 1, n_atoms_shards: int | None = None, devices=None):
    """Build a (replica, atoms) mesh over the available devices."""
    devices = devices if devices is not None else jax.devices()
    n_dev = len(devices)
    if n_atoms_shards is None:
        n_atoms_shards = n_dev // n_replica
    need = n_replica * n_atoms_shards
    assert need <= n_dev, (
        f"mesh {n_replica}x{n_atoms_shards} needs {need} devices, "
        f"have {n_dev}"
    )
    arr = np.asarray(devices[:need]).reshape(n_replica, n_atoms_shards)
    return Mesh(arr, axis_names=("replica", "atoms"))


def state_shardings(mesh: Mesh, state, *, batched: bool):
    """Per-leaf NamedShardings for an MDState (or batched MDState).

    Particle arrays shard over 'atoms' (and 'replica' when batched);
    scalars/box/bonds replicate over 'atoms' (bonds index globally-gathered
    particles; they are small).
    """
    r = ("replica",) if batched else ()

    def spec_for(path, leaf):
        name = path[-1].name if hasattr(path[-1], "name") else str(path[-1])
        ndim = leaf.ndim
        batch_dims = len(r)
        core_ndim = ndim - batch_dims
        if name in ("position", "image", "velocity", "forces",
                    "cell_anchor") and core_ndim == 2:
            return P(*r, "atoms", None)
        if name in ("mass", "charge", "typeid") and core_ndim == 1:
            return P(*r, "atoms")
        return P(*r, *([None] * core_ndim))

    leaves_with_path = jax.tree_util.tree_flatten_with_path(state)[0]
    specs = [spec_for(path, leaf) for path, leaf in leaves_with_path]
    treedef = jax.tree_util.tree_structure(state)
    return jax.tree_util.tree_unflatten(
        treedef, [NamedSharding(mesh, s) for s in specs]
    )


def pad_snapshot_to(snapshot, multiple: int):
    """Pad particle arrays so N divides the atoms-shard count.

    Padding particles are massive, chargeless, typeless-inert ghosts far
    outside interaction range is NOT safe under PBC — instead they are
    zero-charge particles of a dedicated ghost type with no pair
    interactions, pinned by infinite mass (velocity 0, force ignored).
    """
    import jax.numpy as jnp

    n = snapshot.N
    pad = (-n) % multiple
    if pad == 0:
        return snapshot, 0
    dtype = snapshot.position.dtype
    ghost_type = len(snapshot.types)
    big = jnp.asarray(1e30, dtype)
    # spread ghosts along a box diagonal so no two are coincident (r = 0
    # pairs would poison masked pair kernels with 0 * inf)
    frac = (jnp.arange(pad, dtype=dtype)[:, None] + 0.5) / pad - 0.5
    ghost_pos = frac * snapshot.box_L[None, :]
    return snapshot.replace(
        position=jnp.concatenate([snapshot.position, ghost_pos]),
        image=jnp.concatenate([snapshot.image, jnp.zeros((pad, 3), jnp.int32)]),
        velocity=jnp.concatenate(
            [snapshot.velocity, jnp.zeros((pad, 3), dtype)]
        ),
        mass=jnp.concatenate([snapshot.mass, jnp.full((pad,), big)]),
        charge=jnp.concatenate([snapshot.charge, jnp.zeros((pad,), dtype)]),
        diameter=jnp.concatenate([snapshot.diameter, jnp.ones((pad,), dtype)]),
        typeid=jnp.concatenate(
            [snapshot.typeid, jnp.full((pad,), ghost_type, jnp.int32)]
        ),
        types=snapshot.types + ("__ghost__",),
    ), pad
