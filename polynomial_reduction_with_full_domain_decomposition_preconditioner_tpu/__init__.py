"""TPU-native spectral-element Poisson framework with the capabilities of
metalcycling/polynomial_reduction_with_full_domain_decomposition_preconditioner.

Brand-new design for TPU (JAX / XLA / Pallas / shard_map), not a port:
matrix-free SEM operators run as element-batched MXU contractions, the
whole Krylov iteration compiles to one XLA program, and distribution is
SPMD over a jax.sharding.Mesh with psum/interface-vector exchanges instead
of MPI+gslib.

Layer map (mirrors SURVEY.md section 1):
  utils/    GLL spectral primitives, timers, logging      (ref L0, C8, C9)
  mesh/     mesh generation, partitioning, exchange plans (ref mesh files)
  ops/      device kernels: SEM apply, gather-scatter,
            CSR/ELL SpMV, interpolation cascades          (ref L1, L2)
  solvers/  Domain (fine level) + Krylov + preconditioners (ref L3, L4)
  amg/      algebraic multigrid setup + V-cycle           (ref AMG/, hypre)
  io/       field output                                  (ref Silo output)

SPMD plumbing (the reference's MPI layer) lives with its consumers:
collectives in ops/gather_scatter.py, partition plans in mesh/partition.py.
"""

__version__ = "0.1.0"
