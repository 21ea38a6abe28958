"""Energy minimization (displacement-capped steepest descent + FIRE).

The reference workflow starts from a pre-equilibrated GSD
(``examples/init-0.gsd``, absent from the mirror — BASELINE.md note); the
generated replacement scene needs relaxation before production MD. FIRE
(Bitzek et al. 2006) runs entirely on-device under ``lax.scan``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from cavmd_tpu.core.box import rewrap
from cavmd_tpu.core.snapshot import Snapshot


def fire_minimize(
    snapshot: Snapshot,
    ff,
    *,
    n_steps: int = 500,
    dt: float = 4.0,
    max_disp: float = 0.1,
    f_alpha: float = 0.99,
    exclude_types: tuple = ("L",),
):
    """FIRE minimization of the force-field energy. Returns a new Snapshot.

    Particles whose type is in ``exclude_types`` (the photon) are frozen.
    """
    dtype = snapshot.position.dtype
    frozen = jnp.zeros(snapshot.N, bool)
    for t in exclude_types:
        if t in snapshot.types:
            frozen = frozen | (snapshot.typeid == snapshot.types.index(t))
    mobile = (~frozen)[:, None]

    def force_fn(pos, image):
        f, _ = ff.compute(
            pos, image, snapshot.box_L, snapshot.charge, snapshot.typeid,
            snapshot.bond_group, snapshot.bond_typeid,
        )
        return f * mobile

    def body(carry, _):
        pos, image, vel, alpha, dt_cur = carry
        f = force_fn(pos, image)
        # FIRE velocity mixing
        power = jnp.sum(f * vel)
        fnorm = jnp.sqrt(jnp.sum(f * f)) + jnp.finfo(dtype).tiny
        vnorm = jnp.sqrt(jnp.sum(vel * vel))
        vel = (1.0 - alpha) * vel + alpha * vnorm * f / fnorm
        # reset on uphill
        vel = jnp.where(power > 0, vel, jnp.zeros_like(vel))
        alpha = jnp.where(power > 0, alpha * f_alpha, jnp.asarray(0.1, dtype))
        dt_cur = jnp.where(
            power > 0,
            jnp.minimum(dt_cur * 1.1, jnp.asarray(dt * 4.0, dtype)),
            dt_cur * 0.5,
        )
        vel = vel + dt_cur * f  # unit-mass descent dynamics
        disp = dt_cur * vel
        # cap displacement per step
        dmax = jnp.sqrt(jnp.max(jnp.sum(disp * disp, axis=1)))
        scale = jnp.minimum(1.0, max_disp / jnp.maximum(dmax, 1e-30))
        pos, image = rewrap(pos + disp * scale * mobile, image, snapshot.box_L)
        return (pos, image, vel, alpha, dt_cur), None

    init = (
        snapshot.position,
        snapshot.image,
        jnp.zeros_like(snapshot.position),
        jnp.asarray(0.1, dtype),
        jnp.asarray(dt, dtype),
    )
    (pos, image, *_), _ = jax.lax.scan(body, init, None, length=n_steps)
    return snapshot.replace(position=pos, image=image)
