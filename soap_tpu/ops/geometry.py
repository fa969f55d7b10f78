"""Position handling: hi/lo float32 splits and periodic wrapping.

TPUs have no fast float64, but SWIFT snapshot coordinates need ~1e-9
relative precision (kpc-scale structure in Gpc-scale boxes).  Instead of
emulated f64, positions are carried as an unevaluated hi+lo float32 pair
(double-float), split once on the host.  Halo-relative offsets are then
computed as ``(hi - c_hi) + (lo - c_lo)``: the leading-order cancellation
happens in the *hi* parts exactly (both are f32 values close to each
other), so the result keeps full f32 precision of the small relative
separation — equivalent precision to the reference's f64 pipeline at
catalogue (lossy-compression) tolerance.

The reference performs the equivalent recentring in f64 on the host
(``SOAP/core/chunk_tasks.py:48-50``, ``SOAP/core/halo_tasks.py:107-117``).
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
import numpy as np


def split_hi_lo(x: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Split float64 host array into (hi, lo) float32 with x == hi + lo.

    Routed through the multithreaded C++ kernel when available (billions
    of coordinates at staging time); numpy otherwise."""
    from soap_tpu import native

    out = native.split_hi_lo(np.asarray(x, dtype=np.float64))
    if out is not None:
        return out
    hi = x.astype(np.float32)
    lo = (x - hi.astype(np.float64)).astype(np.float32)
    return hi, lo


def periodic_offset(
    pos_hi: jnp.ndarray,
    pos_lo: jnp.ndarray,
    centre_hi: jnp.ndarray,
    centre_lo: jnp.ndarray,
    boxsize: float,
) -> jnp.ndarray:
    """Offset of particles from a centre, wrapped to the nearest image.

    Matches the reference's box_wrap convention (shift centre to box
    middle, wrap, shift back — ``chunk_tasks.py:48-50``), expressed as a
    minimum-image offset.  All inputs are hi/lo f32 pairs; the wrap
    correction is applied to the hi difference where it is an exact
    multiple of the box.
    """
    d_hi = pos_hi - centre_hi
    d_lo = pos_lo - centre_lo
    box = jnp.float32(boxsize)
    wrap = jnp.round(d_hi / box) * box
    return (d_hi - wrap) + d_lo


def radius_squared(offset: jnp.ndarray) -> jnp.ndarray:
    """Squared radius from an (…, 3) offset array."""
    return jnp.sum(offset * offset, axis=-1)
