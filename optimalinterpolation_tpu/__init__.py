"""TPU-native Gaussian-process optimal interpolation.

A from-scratch JAX/XLA/Pallas framework with the capabilities of
``William-gregory/OptimalInterpolation`` (local exact-GP interpolation of
CryoSat-2 + Sentinel-3 radar freeboards; Gregory et al. 2021), re-designed
TPU-first: the reference's per-grid-cell serial scipy/LAPACK loop farmed over
MPI ranks becomes batched, masked, vmapped/sharded tensor programs.

Layer map (mirrors SURVEY.md section 1):
  ops/       kernels (Matern family, SE), masked linalg, smoothing, Pallas
  models/    exact GP, batched hyperparameter optimization, Nystrom, SVGP
  data/      readers, window flattening, padded neighborhood gather, synthetic
  pipeline/  two-pass daily field production, season batching
  parallel/  device mesh + sharding over the cells/days axes
  io/        reference-compatible pickle + quicklook NetCDF
  native/    C++ data-plane (along-track binner, neighbor gather)
"""

__version__ = "0.1.0"

from optimalinterpolation_tpu import ops, models  # noqa: F401
