"""soap_tpu: TPU-native halo-property pipeline (SWIFT/SOAP-compatible).

A ground-up JAX/XLA/Pallas rebuild of the SOAP spherical-overdensity and
aperture processor: SWIFT snapshots + halo-finder catalogues in,
unit-annotated sorted HDF5 halo catalogues out.  The MPI shared-memory
design of the reference is replaced by device-resident particle chunks,
cell-sorted grids, padded ragged gathers and vmapped fused reduction
kernels over batches of halos, sharded across a TPU mesh with pjit.
"""

__version__ = "0.1.0"
