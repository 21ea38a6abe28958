"""Counter-based RNG keying for deterministic, timestep-addressed streams.

The reference seeds a Philox-style counter RNG per (identifier, timestep,
seed, instance) — ``Seed(RNGIdentifier::BussiThermostat, timestep, seed)``
with the group's first member tag as instance id
(``src/BussiReservoirThermostat.h:63-67``). The JAX-native equivalent is
``fold_in`` chains on a threefry key: deterministic, order-independent,
reproducible under vmap (each replica folds its own replica id) and under
resharding (keys derive from logical step, not execution order).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# stream identifiers (parity role: hoomd RNGIdentifier enum)
STREAM_BUSSI = 1
STREAM_LANGEVIN = 2
STREAM_MTTK = 3
STREAM_THERMALIZE = 4
STREAM_BROWNIAN = 5


def stream_key(seed_key, stream_id: int, timestep, instance: int = 0):
    """Key for (stream, timestep, instance) — the counter-RNG pattern.

    ``timestep`` may be a traced int32 (inside ``lax.scan``).
    """
    k = jax.random.fold_in(seed_key, stream_id)
    k = jax.random.fold_in(k, instance)
    return jax.random.fold_in(k, jnp.asarray(timestep, jnp.uint32))


def master_key(seed: int, impl: str | None = None):
    """Root key for an MDState's RNG streams.

    ``impl=None`` (the default) resolves per backend: **rbg on TPU,
    threefry elsewhere**. rbg (XLA's RngBitGenerator-backed PRNG) is a
    measured 8.8% faster full MD step on the N=501 flagship on v5e
    (16.9k -> 18.5k steps/s same-session; the threefry bit computation is
    a real VPU cost at small N), and every thermostat-distribution test
    holds for either PRNG — so throughput hardware gets the fast stream
    by default. The tradeoff (and why CPU stays threefry): threefry2x32
    is the only JAX PRNG whose bits are guaranteed invariant under
    sharding/partitioning and across compiler versions — the
    sharded==unsharded bitwise comparator tests and any
    trajectory-reproducibility workflow rely on that. Pass
    ``impl="threefry"`` explicitly (CLI ``--rng-impl threefry``) for
    bitwise-reproducible TPU runs; a given compiled rbg program is still
    deterministic for a fixed seed, but its bits are not portable across
    JAX versions or device meshes.
    """
    if impl is None or impl == "auto":
        impl = "rbg" if jax.default_backend() == "tpu" else "threefry"
    if impl == "threefry":
        # old-style uint32 key: bit-compatible with every existing test
        return jax.random.PRNGKey(seed)
    return jax.random.key(seed, impl=impl)
