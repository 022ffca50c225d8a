"""Reference-faithful fem-amg oracle at production size with inner
FGMRES(8): the P1-FEM spectral-equivalence V-cycle is per-application
weaker than the matrix-free hybrid, and inner Krylov dimension
compensates (measured small-scale: i4 16 vs i8 8 outer iterations
against the hybrid's 7)."""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from polynomial_reduction_with_full_domain_decomposition_preconditioner_tpu.runtime.config import Config
from polynomial_reduction_with_full_domain_decomposition_preconditioner_tpu.runtime.driver import run_simulation

cfg = Config(mesh="kershaw", shape=(16, 16, 16), epsilon=0.3,
             poly_degree=7, poly_reduction=6, inner="fem-amg",
             inner_iterations=8, max_iterations=200)
rec = run_simulation(cfg, out=sys.stderr)
with open("artifacts/femamg_production_16cubed_i8.json", "w") as fh:
    json.dump(rec, fh, indent=1)
print(json.dumps({k: rec[k] for k in
                  ("iterations", "converged", "solve_seconds")}))
