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


def master_key(seed: int):
    return jax.random.PRNGKey(seed)
