"""Full-state checkpointing: exact-resume beyond the reference's GSD frames.

The reference's checkpoint mechanism is physical-state-only (GSD frames;
thermostat internal state and RNG state are NOT saved — SURVEY.md §5
caveat). This module saves the *complete* MDState pytree — positions,
velocities, images, cached forces, dt, elapsed time, timestep, RNG key,
all reservoir accumulators and MTTK internal DOF — so a resumed run
continues bit-exactly where it stopped.
"""

from __future__ import annotations

import numpy as np

import jax

from cavmd_tpu.integrate.integrator import MDState


def _leaf_names(state):
    paths_and_leaves = jax.tree_util.tree_flatten_with_path(state)[0]
    names, leaves = [], []
    for path, leaf in paths_and_leaves:
        names.append(jax.tree_util.keystr(path))
        leaves.append(leaf)
    return names, leaves


def save_checkpoint(path: str, state: MDState):
    """Save an MDState to a .npz file (complete, exact-resume)."""
    names, leaves = _leaf_names(state)
    np.savez_compressed(
        path, __names__=np.asarray(names, dtype=object),
        **{f"leaf_{i}": np.asarray(l) for i, l in enumerate(leaves)},
    )


def load_checkpoint(path: str, template: MDState) -> MDState:
    """Load an MDState saved by :func:`save_checkpoint`.

    ``template`` provides the pytree structure (and device placement);
    leaf names are cross-checked against the file.
    """
    import jax.numpy as jnp

    with np.load(path, allow_pickle=True) as data:
        names = list(data["__names__"])
        t_names, t_leaves = _leaf_names(template)
        if names != t_names:
            raise ValueError(
                f"checkpoint structure mismatch: {names} vs {t_names}"
            )
        leaves = [
            jnp.asarray(data[f"leaf_{i}"]) for i in range(len(names))
        ]
    treedef = jax.tree_util.tree_structure(template)
    return jax.tree_util.tree_unflatten(treedef, leaves)
