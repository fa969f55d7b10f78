"""Multi-chip execution: chunk x halo data parallelism over a device mesh.

The reference's two parallelism levels (SURVEY.md §2.5) map onto a 2D
``jax.sharding.Mesh``:

 - ``'chunks'`` axis — the inter-node chunk parallelism (P1): each mesh
   slice owns one spatial chunk's particle arrays (the TPU analogue of
   one compute node's shared-memory copy,
   ``SOAP/core/task_queue.py:63-216`` + ``chunk_tasks.py``);
 - ``'halos'`` axis — the intra-node halo parallelism (P2): a chunk's
   halo batch is sharded across the chips of its slice, replacing the
   RMA atomic work claiming (``SOAP/core/halo_tasks.py:319-357``) with
   static batched sharding.

Chunk particle arrays are sharded along ``'chunks'`` and replicated
along ``'halos'``; halo inputs are sharded along both.  The per-halo
computation is embarrassingly parallel (that is the point of the
design); cross-chip collectives appear only in the global statistics
(``psum``) and, at combine time, in distributed sorts.
"""

from __future__ import annotations

from functools import partial
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from soap_tpu.models.context import HaloContext
from soap_tpu.models.halo_slice import HaloParticles, HaloScalars
from soap_tpu.pipeline.engine import HaloTypeSpec, _halo_fn


def make_mesh(n_devices: int, n_chunks: int = 1) -> Mesh:
    """Create the (chunks, halos) mesh over the first n_devices."""
    devices = np.array(jax.devices()[:n_devices]).reshape(n_chunks, -1)
    return Mesh(devices, ("chunks", "halos"))


def sharded_batch_step(
    mesh: Mesh,
    ctx: HaloContext,
    specs: Tuple[HaloTypeSpec, ...],
):
    """Build the jitted multi-chip halo-batch step.

    Inputs (leading axes): gathered halo particle buffers with shape
    (C, B, K, ...) — C chunks, B halos per chunk, K padded candidates —
    sharded ('chunks', 'halos'); the function evaluates every spec's
    property DAG and returns {group: {key: (C, B, ...)}} with the same
    sharding, plus a psum'd global halo count (exercises ICI).
    """
    densities = tuple(spec.target_density(ctx) for spec in specs)
    fn = _halo_fn(ctx, specs, densities)

    def step(parts: HaloParticles, scalars: HaloScalars):
        # vmap over chunks, then halos; XLA partitions both axes over
        # the mesh with no communication
        out = jax.vmap(jax.vmap(fn))(parts, scalars)
        n_done = jnp.sum((scalars.index >= 0).astype(jnp.int32))
        return out, n_done

    data_sharding = NamedSharding(mesh, P("chunks", "halos"))
    replicated = NamedSharding(mesh, P())

    jitted = jax.jit(
        step,
        in_shardings=(data_sharding, data_sharding),
        out_shardings=(data_sharding, replicated),
    )
    return jitted


def shard_halo_inputs(
    mesh: Mesh,
    parts: HaloParticles,
    scalars: HaloScalars,
):
    """Place (C, B, ...) host arrays onto the mesh."""
    sharding = NamedSharding(mesh, P("chunks", "halos"))

    def put(x):
        return jax.device_put(jnp.asarray(x), sharding)

    return (
        jax.tree_util.tree_map(put, parts),
        jax.tree_util.tree_map(put, scalars),
    )
