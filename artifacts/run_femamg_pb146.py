"""PB_146 fem-amg verification (VERDICT r4 item 1): run the
reference-faithful low-order FEM AMG inner preconditioner
(`subdomain.tpp:2749-3472` role) on the pebble-bed PB_146 mesh and
commit the iteration count against the hybrid baseline recorded in
artifacts/pebble_production_pb146.json (5 iterations).

fem-amg only — the hybrid side is already committed; re-running it
here would double the setup cost for no new information.

Usage: python artifacts/run_femamg_pb146.py [inner_iters=8]
Writes artifacts/femamg_pb146.json
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from polynomial_reduction_with_full_domain_decomposition_preconditioner_tpu.runtime.config import Config
from polynomial_reduction_with_full_domain_decomposition_preconditioner_tpu.runtime.driver import run_simulation


def main():
    ii = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    cfg = Config(
        mesh="pebble", shape=(32, 32, 32), num_pebbles=146,
        solid_fraction=0.2, mesh_seed=5,
        poly_degree=7, poly_reduction=6, max_iterations=200,
        inner="fem-amg", inner_iterations=ii,
        ptype="bfloat16", num_vectors=6, ztype="bfloat16",
        checkpoint="/root/repo/.ckpt_cache",
    )
    t0 = time.time()
    rec = run_simulation(cfg, out=sys.stderr)
    out = {
        "mesh": "pb146",
        "fem-amg": {
            "inner_iterations": ii,
            "iterations": rec["iterations"],
            "converged": rec["converged"],
            "solve_seconds": rec["solve_seconds"],
            "max_error": rec["max_error"],
            "residual_history": rec["residual_history"],
        },
        "hybrid_baseline": {
            "iterations": 5,
            "source": "artifacts/pebble_production_pb146.json",
        },
        "total_seconds": time.time() - t0,
    }
    with open("artifacts/femamg_pb146.json", "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps({"iterations": rec["iterations"],
                      "converged": rec["converged"]}))
    return 0 if rec["converged"] else 1


if __name__ == "__main__":
    raise SystemExit(main())
