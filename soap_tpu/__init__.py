"""soap_tpu: TPU-native halo-property pipeline (SWIFT/SOAP-compatible).

A ground-up JAX/XLA/Pallas rebuild of the SOAP spherical-overdensity and
aperture processor: SWIFT snapshots + halo-finder catalogues in,
unit-annotated sorted HDF5 halo catalogues out.  The MPI shared-memory
design of the reference is replaced by device-resident particle chunks,
cell-sorted grids, padded ragged gathers and vmapped fused reduction
kernels over batches of halos, sharded across a TPU mesh with pjit.
"""

import jax as _jax

# 64-bit mode is required for correctness, not convenience: particle IDs
# are uint64 (>2^32 in production boxes) and the membership join would
# silently truncate them under JAX's default x32 mode.  Float arrays are
# unaffected — dtypes are preserved, and all device compute is f32.
_jax.config.update("jax_enable_x64", True)

__version__ = "0.1.0"

# Numeric-sanitization parity with the reference
# (``SOAP/compute_halo_properties.py:44``, README.md:169-181): host-side
# numpy overflow / invalid / divide errors raise instead of warning, so a
# silent unit/overflow bug cannot survive into the catalogue.
import numpy as _np

_np.seterr(divide="raise", over="raise", invalid="raise")
