"""Multi-chip execution: shard_map-based MSM and FFT over a device mesh.

This is the TPU-native replacement for the reference's OpenMP surface
(reference: curves/bn254/scalar_multiplication.cpp:650-772 omp-batched MSM;
polynomials/polynomial_arithmetic.cpp:129-264 thread-partitioned FFT;
types.hpp:52-68 domain loops): data parallelism over a jax.sharding.Mesh
with ICI collectives (all_to_all for FFT stage exchange, all_gather for MSM
partial reduction) instead of shared-memory threads.
"""

from .fft import sharded_fft, sharded_ifft, sharded_coset_fft
from .msm import sharded_msm, sharded_msm_batched
from .mesh import default_mesh

__all__ = [
    "sharded_fft",
    "sharded_ifft",
    "sharded_coset_fft",
    "sharded_msm",
    "sharded_msm_batched",
    "default_mesh",
]
