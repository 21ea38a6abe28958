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


def _is_typed_key(leaf) -> bool:
    dt = getattr(leaf, "dtype", None)
    return dt is not None and jax.dtypes.issubdtype(dt, jax.dtypes.prng_key)


def save_checkpoint(path: str, state: MDState):
    """Save an MDState to a .npz file (complete, exact-resume).

    Typed PRNG key leaves (``rng_impl="rbg"`` states) are opaque to
    NumPy; they are stored as their raw ``key_data`` bits — the impl is
    re-bound from the resume template's key on load.
    """
    names, leaves = _leaf_names(state)
    leaves = [
        jax.random.key_data(l) if _is_typed_key(l) else l for l in leaves
    ]
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
        leaves = []
        for i, tmpl in enumerate(t_leaves):
            raw = jnp.asarray(data[f"leaf_{i}"])
            if _is_typed_key(tmpl):
                raw = jax.random.wrap_key_data(
                    raw, impl=jax.random.key_impl(tmpl)
                )
            leaves.append(raw)
    treedef = jax.tree_util.tree_structure(template)
    return jax.tree_util.tree_unflatten(treedef, leaves)
