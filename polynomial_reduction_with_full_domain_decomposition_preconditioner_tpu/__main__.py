"""CLI entry point (the reference's ./poisson binary, poisson.cpp:40-68).

    python -m polynomial_reduction_with_full_domain_decomposition_preconditioner_tpu \
        7 6 1 1 --mesh kershaw --shape 16,16,16 --epsilon 0.3
"""

import sys

from .runtime.config import Config
from .runtime.distributed import initialize_multihost
from .runtime.driver import run_simulation


def main(argv=None):
    # multi-host bootstrap (no-op unless PRFDD_COORDINATOR is set); must
    # run before any JAX use (the reference's MPI_Init, poisson.cpp:84-89)
    initialize_multihost()
    cfg = Config.from_args(sys.argv[1:] if argv is None else argv)
    result = run_simulation(cfg)
    return 0 if result["converged"] else 1


if __name__ == "__main__":
    raise SystemExit(main())
