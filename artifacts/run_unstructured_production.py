"""Re-measure the scrambled-Kershaw production artifact (2.1M points).

Same config as the original artifacts/unstructured_production_16cubed
record (scramble=7, f32 preconditioner): the number that tracks the
unstructured assembly-kernel improvements.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from polynomial_reduction_with_full_domain_decomposition_preconditioner_tpu.runtime.config import Config
    from polynomial_reduction_with_full_domain_decomposition_preconditioner_tpu.runtime.driver import run_simulation

    cfg = Config(
        poly_degree=7, poly_reduction=6,
        mesh="kershaw", shape=(16, 16, 16), scramble=7,
        solver="fgmres", stype="float32", ptype="float32",
        inner="amg", inner_iterations=4, max_iterations=200,
        checkpoint="/root/repo/.ckpt_cache",
    )
    t0 = time.time()
    rec = run_simulation(cfg, out=sys.stderr)
    rec["wall_seconds"] = time.time() - t0
    with open("artifacts/unstructured_production_16cubed.json", "w") as fh:
        json.dump(rec, fh, indent=1)
    print("DONE", rec["iterations"], rec["converged"],
          round(rec["solve_seconds"], 3))
    return 0 if rec["converged"] else 1


if __name__ == "__main__":
    sys.exit(main())
