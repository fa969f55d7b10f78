"""Device-resident cell-sorted particle grid (spatial index).

TPU-native replacement for the reference's shared-memory ``SharedMesh``
(``SOAP/core/shared_mesh.py:10-200``): particles are sorted by flat cell
key with a device sort, per-cell counts come from a segment sum and
offsets from an exclusive cumsum.  Queries do not walk cells dynamically
(no data-dependent control flow on TPU); instead, a halo's overlapped cell
block is enumerated as a *static-size* cube of cells and the ragged
per-cell ranges are expanded into a padded candidate index list (see
``soap_tpu/ops/gather.py``).

Resolution policy: the reference uses ``(n/1000)^(1/3)`` cells per
dimension (``SOAP/core/chunk_tasks.py:296-304``) — appropriate there
because its mesh queries filter candidates by exact distance one halo
at a time on the CPU.  Here the WHOLE padded candidate set flows
through the gathered property DAG, so candidate slack multiplies every
downstream cost (gather, radius sort, masked reductions): with ~1000
particles per cell a ~1 Mpc-radius halo's 2-cell search cube covers
hundreds of times its sphere volume.  The TPU default is therefore
much finer — ``SOAP_TPU_GRID_PER_CELL`` particles per cell (default
16), clipped to [1, 192] cells per dimension (the summed-area tables
grow as dims^3: 192^3 is ~85 MB per particle type).
"""

from __future__ import annotations

import os as _os
from dataclasses import dataclass
from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def choose_resolution(n_particles: int) -> int:
    """Cells per dimension for a chunk grid (see module docstring)."""
    per_cell = float(_os.environ.get("SOAP_TPU_GRID_PER_CELL", "16"))
    return int(
        np.clip(round((n_particles / per_cell) ** (1.0 / 3.0)), 1, 192)
    )


@dataclass(frozen=True)
class GridSpec:
    """Static description of a chunk grid (hashable; safe as a jit static)."""

    origin: Tuple[float, float, float]  # grid origin in wrapped coordinates
    cell_size: Tuple[float, float, float]
    dims: Tuple[int, int, int]
    periodic: bool  # wrap cell indices (grid covers the full box)

    @property
    def n_cells(self) -> int:
        return self.dims[0] * self.dims[1] * self.dims[2]


def make_grid_spec(
    pos_min: np.ndarray,
    pos_max: np.ndarray,
    n_particles: int,
    periodic: bool = False,
    resolution: int | None = None,
) -> GridSpec:
    """Host-side: choose grid geometry for a chunk's wrapped positions."""
    if resolution is None:
        resolution = choose_resolution(n_particles)
    extent = np.maximum(pos_max - pos_min, 1e-6)
    # small epsilon so the max particle lands inside the last cell
    cell = extent / resolution * (1.0 + 1e-5)
    return GridSpec(
        origin=tuple(float(v) for v in pos_min),
        cell_size=tuple(float(v) for v in cell),
        dims=(resolution, resolution, resolution),
        periodic=periodic,
    )


def cell_index_of(spec: GridSpec, pos_hi: jnp.ndarray) -> jnp.ndarray:
    """Flat cell key per particle (row-major over dims)."""
    origin = jnp.asarray(spec.origin, dtype=pos_hi.dtype)
    cell = jnp.asarray(spec.cell_size, dtype=pos_hi.dtype)
    dims = jnp.asarray(spec.dims, dtype=jnp.int32)
    ijk = jnp.floor((pos_hi - origin) / cell).astype(jnp.int32)
    if spec.periodic:
        ijk = jnp.mod(ijk, dims)
    else:
        ijk = jnp.clip(ijk, 0, dims - 1)
    return (ijk[..., 0] * spec.dims[1] + ijk[..., 1]) * spec.dims[2] + ijk[..., 2]


@partial(jax.jit, static_argnames=("spec",))
def build_grid(
    spec: GridSpec, pos_hi: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Sort particles into cells on device.

    Returns (order, cell_offsets, cell_counts):
     - ``order``: permutation sorting particles by cell key (apply it to
       every per-particle array of this particle type);
     - ``cell_offsets[c]``: first sorted row of cell ``c``;
     - ``cell_counts[c]``: number of particles in cell ``c``.
    """
    keys = cell_index_of(spec, pos_hi)
    order = jnp.argsort(keys)
    counts = jnp.zeros(spec.n_cells, dtype=jnp.int32).at[keys].add(1)
    offsets = jnp.concatenate(
        [jnp.zeros(1, jnp.int32), jnp.cumsum(counts)[:-1].astype(jnp.int32)]
    )
    return order, offsets, counts


def halo_cell_ranges(
    spec: GridSpec,
    cell_offsets: jnp.ndarray,
    cell_counts: jnp.ndarray,
    centre: jnp.ndarray,  # (3,) wrapped coordinates, f32
    radius: jnp.ndarray,  # scalar f32
    cube: int,  # static: cells per axis of the search cube
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(starts, counts) of the cube of cells overlapping a search sphere.

    ``cube`` is a static per-bucket bound on ``ceil(2r/cell)+1``; cells of
    the cube outside the sphere's actual AABB (or outside a non-periodic
    grid) get count 0.  Shapes are (cube**3,).
    """
    origin = jnp.asarray(spec.origin, dtype=jnp.float32)
    cell = jnp.asarray(spec.cell_size, dtype=jnp.float32)
    dims = jnp.asarray(spec.dims, dtype=jnp.int32)

    lo = jnp.floor((centre - radius - origin) / cell).astype(jnp.int32)
    hi = jnp.floor((centre + radius - origin) / cell).astype(jnp.int32)

    ax = jnp.arange(cube, dtype=jnp.int32)
    # per-axis candidate indices and validity
    idx = lo[None, :] + ax[:, None]  # (cube, 3)
    in_span = idx <= hi[None, :]
    if spec.periodic:
        wrapped = jnp.mod(idx, dims[None, :])
        valid_ax = in_span
        # avoid double counting when the span exceeds the grid size
        valid_ax &= ax[:, None] < dims[None, :]
    else:
        wrapped = jnp.clip(idx, 0, dims[None, :] - 1)
        valid_ax = in_span & (idx >= 0) & (idx < dims[None, :])

    ii, jj, kk = jnp.meshgrid(ax, ax, ax, indexing="ij")
    flat = (
        wrapped[ii.ravel(), 0] * spec.dims[1] + wrapped[jj.ravel(), 1]
    ) * spec.dims[2] + wrapped[kk.ravel(), 2]
    valid = (
        valid_ax[ii.ravel(), 0]
        & valid_ax[jj.ravel(), 1]
        & valid_ax[kk.ravel(), 2]
    )
    starts = jnp.where(valid, cell_offsets[flat], 0)
    counts = jnp.where(valid, cell_counts[flat], 0)
    return starts, counts
