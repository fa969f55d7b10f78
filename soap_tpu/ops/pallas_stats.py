"""Pallas TPU kernel: fused masked moments over a halo's particle slice.

The base statistics of every halo type — per-particle-type counts, masses,
centre-of-mass and bulk-velocity moments, and the scalar velocity second
moment — are ~15 separate masked reductions over the same (K,) buffers in
the lazy DAG.  This kernel computes them all in ONE pass over VMEM-staged
data, cutting HBM traffic on the hot path (the reference's analogue is a
chain of numpy reductions per halo, e.g.
``SOAP/particle_selection/subhalo_properties.py:326-900``).

Layout notes (see the TPU tiling constraints): all inputs are (K,)
vectors reshaped to (K/128, 128) blocks inside the kernel; position and
velocity components are passed as separate planes rather than (K, 3)
arrays so the lane dimension stays 128-aligned.

Outputs per particle-type segment g (static row ranges) plus the total:
  [count, sum m, sum m*x, sum m*y, sum m*z,
   sum m*vx, sum m*vy, sum m*vz, sum m*|v|^2]

Falls back to pure jnp (identical math) off-TPU; the Pallas path is
exercised in interpreter mode by the tests.
"""

from __future__ import annotations

from functools import partial
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

N_STATS = 9


def _moments_ref(mass, x, y, z, vx, vy, vz, sel, segments):
    """jnp reference implementation (and off-TPU fallback)."""
    m = jnp.where(sel, mass, 0.0)
    outs = []
    for lo, hi in segments:
        mm = m[lo:hi]
        outs.append(
            jnp.stack(
                [
                    jnp.sum(sel[lo:hi].astype(jnp.float32)),
                    jnp.sum(mm),
                    jnp.sum(mm * x[lo:hi]),
                    jnp.sum(mm * y[lo:hi]),
                    jnp.sum(mm * z[lo:hi]),
                    jnp.sum(mm * vx[lo:hi]),
                    jnp.sum(mm * vy[lo:hi]),
                    jnp.sum(mm * vz[lo:hi]),
                    jnp.sum(
                        mm
                        * (
                            vx[lo:hi] * vx[lo:hi]
                            + vy[lo:hi] * vy[lo:hi]
                            + vz[lo:hi] * vz[lo:hi]
                        )
                    ),
                ]
            )
        )
    return jnp.stack(outs)


#: halos per Pallas program (the sublane tile for f32)
ROWS_PER_PROGRAM = 8


def _kernel(mass_ref, x_ref, y_ref, z_ref, vx_ref, vy_ref, vz_ref, sel_ref,
            out_ref, *, segments):
    sel = sel_ref[:]  # (8, K)
    m = mass_ref[:] * sel
    x, y, z = x_ref[:], y_ref[:], z_ref[:]
    vx, vy, vz = vx_ref[:], vy_ref[:], vz_ref[:]
    v2 = vx * vx + vy * vy + vz * vz
    cols = []
    for lo, hi in segments:
        mm = m[:, lo:hi]
        # keepdims reductions stay 2D throughout (Mosaic-friendly)
        cols += [
            jnp.sum(sel[:, lo:hi], axis=1, keepdims=True),
            jnp.sum(mm, axis=1, keepdims=True),
            jnp.sum(mm * x[:, lo:hi], axis=1, keepdims=True),
            jnp.sum(mm * y[:, lo:hi], axis=1, keepdims=True),
            jnp.sum(mm * z[:, lo:hi], axis=1, keepdims=True),
            jnp.sum(mm * vx[:, lo:hi], axis=1, keepdims=True),
            jnp.sum(mm * vy[:, lo:hi], axis=1, keepdims=True),
            jnp.sum(mm * vz[:, lo:hi], axis=1, keepdims=True),
            jnp.sum(mm * v2[:, lo:hi], axis=1, keepdims=True),
        ]
    # single vector store (scalar stores to VMEM are not supported)
    out_ref[:] = jnp.concatenate(cols, axis=1)  # (8, n_seg * 9)


@partial(jax.jit, static_argnames=("segments", "interpret"))
def masked_moments_batch(
    mass: jnp.ndarray,  # (B, K)
    pos: jnp.ndarray,  # (B, K, 3) halo-relative
    vel: jnp.ndarray,  # (B, K, 3)
    sel: jnp.ndarray,  # (B, K) bool
    segments: Tuple[Tuple[int, int], ...],  # static (lo, hi) per group
    interpret: bool = False,
) -> jnp.ndarray:
    """(B, n_seg, 9) fused moments (see module docstring).

    B must be a multiple of 8 (the f32 sublane tile); the engine's batch
    sizes are powers of two >= 8 by construction.
    """
    from jax.experimental import pallas as pl

    B, K = mass.shape
    sel_f = sel.astype(jnp.float32)
    x, y, z = pos[:, :, 0], pos[:, :, 1], pos[:, :, 2]
    vx, vy, vz = vel[:, :, 0], vel[:, :, 1], vel[:, :, 2]

    import os

    # On by default on TPU; SOAP_TPU_PALLAS=0 opts out.  (Index maps use
    # ``i * 0`` instead of a literal 0: under x64 mode the literal
    # becomes an i64 constant and Mosaic rejects the mixed
    # (i32, i64) index tuple — the round-1 "toolchain skew" was this.)
    use_pallas = interpret or (
        os.environ.get("SOAP_TPU_PALLAS", "1") != "0"
        and jax.default_backend() == "tpu"
    )
    if use_pallas and B % ROWS_PER_PROGRAM == 0 and K % 128 == 0:
        try:
            in_spec = pl.BlockSpec(
                (ROWS_PER_PROGRAM, K), lambda i: (i, i * 0)
            )
            flat = pl.pallas_call(
                partial(_kernel, segments=segments),
                grid=(B // ROWS_PER_PROGRAM,),
                in_specs=[in_spec] * 8,
                out_specs=pl.BlockSpec(
                    (ROWS_PER_PROGRAM, len(segments) * N_STATS),
                    lambda i: (i, i * 0),
                ),
                out_shape=jax.ShapeDtypeStruct(
                    (B, len(segments) * N_STATS), jnp.float32
                ),
                interpret=interpret,
            )(mass, x, y, z, vx, vy, vz, sel_f)
            return flat.reshape(B, len(segments), N_STATS)
        except Exception:
            pass
    # fallback: identical jnp math
    return jax.vmap(
        lambda m, xx, yy, zz, vxx, vyy, vzz, s: _moments_ref(
            m, xx, yy, zz, vxx, vyy, vzz, s, segments
        )
    )(mass, x, y, z, vx, vy, vz, sel_f)


def masked_moments(
    mass: jnp.ndarray,  # (K,)
    pos: jnp.ndarray,
    vel: jnp.ndarray,
    sel: jnp.ndarray,
    segments: Tuple[Tuple[int, int], ...],
    interpret: bool = False,
) -> jnp.ndarray:
    """Single-halo convenience wrapper; pads the batch axis to 8."""
    out = masked_moments_batch(
        jnp.tile(mass[None], (ROWS_PER_PROGRAM, 1)),
        jnp.tile(pos[None], (ROWS_PER_PROGRAM, 1, 1)),
        jnp.tile(vel[None], (ROWS_PER_PROGRAM, 1, 1)),
        jnp.tile(sel[None], (ROWS_PER_PROGRAM, 1)),
        segments,
        interpret=interpret,
    )
    return out[0]
