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

    ``impl=None`` (default) is threefry2x32 — the only JAX PRNG whose
    bits are guaranteed invariant under sharding/partitioning and across
    compiler versions, which the sharded==unsharded bitwise comparator
    tests rely on. ``impl="rbg"`` swaps in XLA's RngBitGenerator-backed
    PRNG: measured 8.8% faster full MD step on the N=501 flagship on v5e
    (16.9k -> 18.5k steps/s same-session; the threefry bit computation is
    a real VPU cost at small N). rbg bits are NOT guaranteed stable
    across JAX/compiler versions or device meshes — use it for
    throughput, not for bitwise-reproducible sharded runs.
    """
    if impl is None or impl == "threefry":
        # old-style uint32 key: bit-compatible with every existing test
        return jax.random.PRNGKey(seed)
    return jax.random.key(seed, impl=impl)
