"""soap_tpu: TPU-native halo-property pipeline (SWIFT/SOAP-compatible).

A ground-up JAX/XLA/Pallas rebuild of the SOAP spherical-overdensity and
aperture processor: SWIFT snapshots + halo-finder catalogues in,
unit-annotated sorted HDF5 halo catalogues out.  The MPI shared-memory
design of the reference is replaced by device-resident particle chunks,
cell-sorted grids, padded ragged gathers and vmapped fused reduction
kernels over batches of halos, sharded across a TPU mesh with pjit.
"""

import os as _os

if _os.environ.get("SOAP_TPU_READER_WORKER") == "1":
    # spawn-launched reader worker subprocesses only touch h5py/numpy;
    # skip the jax runtime entirely (fast startup, and fork-after-jax
    # deadlocks are impossible because we never fork)
    _jax = None
else:
    import jax as _jax

    # 64-bit mode is required for correctness, not convenience: particle
    # IDs are uint64 (>2^32 in production boxes) and the membership join
    # would silently truncate them under JAX's default x32 mode.  Float
    # arrays are unaffected — dtypes are preserved, and all device
    # compute is f32.
    _jax.config.update("jax_enable_x64", True)

# Persistent XLA compilation cache: the pipeline's device programs are
# large (hundreds of fused property kernels) and first-compile costs
# minutes per bucket shape on TPU; caching them across processes turns
# warm starts, restarts and repeated benches into cache hits.  Opt out
# with SOAP_TPU_COMPILATION_CACHE=0, redirect with =<dir>.
_cache = _os.environ.get("SOAP_TPU_COMPILATION_CACHE", "")
if _cache != "0" and _jax is not None:
    if not _cache:
        _cache = _os.path.join(
            _os.path.expanduser("~"), ".cache", "soap_tpu_xla"
        )
    try:
        _os.makedirs(_cache, exist_ok=True)
        _jax.config.update("jax_compilation_cache_dir", _cache)
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        _jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:  # cache is an optimization, never a requirement
        pass

__version__ = "0.1.0"

# Numeric-sanitization parity with the reference
# (``SOAP/compute_halo_properties.py:44``, README.md:169-181): host-side
# numpy overflow / invalid / divide errors raise instead of warning, so a
# silent unit/overflow bug cannot survive into the catalogue.
import numpy as _np

_np.seterr(divide="raise", over="raise", invalid="raise")
