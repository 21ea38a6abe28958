"""Orthorhombic periodic box: wrap/unwrap/minimum-image, as pure JAX functions.

Replaces the consumed HOOMD ``BoxDim`` surface (see SURVEY.md §2.3). Only
orthorhombic boxes are supported — the reference workflow never uses tilt
factors (``examples/05_advanced_run.py`` reads ``configuration.box[:3]``).
All functions are shape-static and jit/vmap/shard-friendly.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class Box(NamedTuple):
    """Orthorhombic periodic box with edge lengths ``L = (Lx, Ly, Lz)``."""

    L: jnp.ndarray  # (3,)

    @property
    def volume(self):
        return jnp.prod(self.L)

    @staticmethod
    def cubic(L, dtype=None):
        return Box(jnp.asarray([L, L, L], dtype=dtype))

    @staticmethod
    def from_lengths(Lx, Ly, Lz, dtype=None):
        return Box(jnp.asarray([Lx, Ly, Lz], dtype=dtype))


def unwrap_positions(positions, images, box_L):
    """Unwrap wrapped positions using integer image flags.

    ``r_unwrapped = r + image * L`` — parity with reference
    ``src/cavitymd/utils.py:68-86`` and ``CavityForceCompute.cc:91-111``.

    Args:
        positions: (..., 3) wrapped positions.
        images: (..., 3) integer image flags.
        box_L: (3,) box edge lengths.
    """
    positions = jnp.asarray(positions)
    box_L = jnp.asarray(box_L, dtype=positions.dtype)
    return positions + jnp.asarray(images, dtype=positions.dtype) * box_L


def wrap_positions(positions, box_L):
    """Wrap positions into the primary box centered at the origin.

    Returns ``(wrapped, image_flags)`` with
    ``image = floor((x + L/2) / L)`` and ``wrapped = x - image * L`` —
    parity with the reference's ``wrap_position`` helper
    (``examples/05_advanced_run.py:487-494``).
    """
    positions = jnp.asarray(positions)
    box_L = jnp.asarray(box_L, dtype=positions.dtype)
    image = jnp.floor((positions + 0.5 * box_L) / box_L)
    wrapped = positions - image * box_L
    return wrapped, image.astype(jnp.int32)


def rewrap(positions, images, box_L):
    """Re-wrap positions that may have drifted out of the primary box,
    accumulating the overflow into the existing image flags."""
    delta_wrapped, delta_img = wrap_positions(positions, box_L)
    return delta_wrapped, images + delta_img


def minimum_image(dr, box_L):
    """Apply the minimum-image convention to displacement vectors ``dr``."""
    dr = jnp.asarray(dr)
    box_L = jnp.asarray(box_L, dtype=dr.dtype)
    return dr - box_L * jnp.round(dr / box_L)
