"""barretenberg_tpu: a TPU-native BN254 elliptic-curve + PLONK proving library.

A from-scratch JAX/XLA/Pallas re-design of the capability surface of the
reference Barretenberg library (BN254 field/curve arithmetic, Pippenger MSM,
radix-2 FFTs over Fr, and the PLONK "waffle" proof system), built for TPU:
planar limb vectors on VPU lanes, sort+scan MSM, mesh-sharded FFT/MSM via
shard_map, host-side transcript hashing.
"""

__version__ = "0.1.0"
