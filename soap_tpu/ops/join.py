"""Device sort-based joins: the TPU replacement for VirgoDC's MPI
``parallel_match`` / ``fetch_elements`` (used by the reference at
``SOAP/group_membership.py:54-94`` and throughout combine).

A match of N needles against M haystack keys is: sort the haystack once
(XLA radix sort), then a vectorized ``searchsorted`` + equality check —
O((N+M) log M) on-device with no dynamic shapes.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


@jax.jit
def match_index(needles: jnp.ndarray, haystack: jnp.ndarray) -> jnp.ndarray:
    """Index into ``haystack`` of each needle, or -1 when absent.

    Keys must be unique in ``haystack`` (particle IDs are).
    """
    order = jnp.argsort(haystack)
    sorted_keys = haystack[order]
    pos = jnp.searchsorted(sorted_keys, needles)
    pos = jnp.minimum(pos, sorted_keys.shape[0] - 1)
    hit = sorted_keys[pos] == needles
    return jnp.where(hit, order[pos], -1)


def match_payload(
    needles: jnp.ndarray,
    haystack: jnp.ndarray,
    payload: jnp.ndarray,
    fill,
) -> jnp.ndarray:
    """Payload of the matching haystack row per needle, or ``fill``."""
    idx = match_index(needles, haystack)
    safe = jnp.maximum(idx, 0)
    return jnp.where(idx >= 0, payload[safe], fill)
