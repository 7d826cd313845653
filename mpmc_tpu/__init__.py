"""mpmc_tpu — a TPU-native molecular Monte Carlo framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of MPMC
(smann95/mpmc): rigid-molecule NVT/NPT/uVT Monte Carlo of gas sorption in
porous materials with LJ / repulsion-dispersion potentials, Ewald
electrostatics, Thole-Applequist polarization solved self-consistently,
Feynman-Hibbs quantum corrections, fugacity-driven GCMC, and
parallel-tempering replicas over a TPU device mesh.

Design (SURVEY.md §7): pure functional state on padded arrays with alive
masks, masked O(N^2) tile kernels, lax.scan Metropolis, threefry PRNG,
shard_map replica parallelism.
"""

__version__ = "0.1.0"

from mpmc_tpu import constants  # noqa: F401
