"""Scrambled-Kershaw production with a bfloat16 inner preconditioner.

The structured production path already runs its composite inner in
bfloat16 (the PTYPE cast at the tree boundary, subdomain.okl:268 role)
— the outer FGMRES is flexible, so an inexact preconditioner only
changes iteration counts, not correctness. This measures the same
trade on the unstructured path: every face/edge-block dssum, Chebyshev
sweep, and V-cycle leg at half the HBM traffic.

Usage: python artifacts/run_unstructured_bf16.py  (real TPU)
Writes artifacts/unstructured_production_16cubed_bf16.json
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
        solver="fgmres", stype="float32", ptype="bfloat16",
        inner="amg", inner_iterations=4, max_iterations=200,
        checkpoint="/root/repo/.ckpt_cache",
    )
    t0 = time.time()
    rec = run_simulation(cfg, out=sys.stderr)
    rec["wall_seconds"] = time.time() - t0
    with open("artifacts/unstructured_production_16cubed_bf16.json",
              "w") as fh:
        json.dump(rec, fh, indent=1)
    print("DONE", rec["iterations"], rec["converged"],
          round(rec["solve_seconds"], 3))
    return 0 if rec["converged"] else 1


if __name__ == "__main__":
    sys.exit(main())
