"""Reference-faithful fem-amg oracle on the UNSTRUCTURED mesh family at
production size (round-4: the oracle now covers every composite
configuration). Runs `inner="fem-amg"` vs the hybrid `inner="amg"` on
TPU and records both iteration counts:

  scrambled  -> scrambled-connectivity Kershaw 16^3 N=7 (2.1M pts)
  pb146      -> pebble bed PB_146 (26.2k els, 13.4M pts)

Usage: python artifacts/run_femamg_unstructured.py [scrambled|pb146]
           [inner_iters=8]
Writes artifacts/femamg_unstructured_{tag}.json
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from polynomial_reduction_with_full_domain_decomposition_preconditioner_tpu.runtime.config import Config
from polynomial_reduction_with_full_domain_decomposition_preconditioner_tpu.runtime.driver import run_simulation


def main():
    tag = sys.argv[1] if len(sys.argv) > 1 else "scrambled"
    ii = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    base = dict(poly_degree=7, poly_reduction=6, max_iterations=200,
                checkpoint="/root/repo/.ckpt_cache")
    if tag == "scrambled":
        base.update(mesh="kershaw", shape=(16, 16, 16), epsilon=0.3,
                    scramble=7)
    elif tag == "pb146":
        # bf16 fem tree + short restart: the assembled 118M-nnz level-0
        # BSR is the HBM driver at this size (the hybrid needs none)
        base.update(mesh="pebble", shape=(32, 32, 32), num_pebbles=146,
                    solid_fraction=0.2, mesh_seed=5, ptype="bfloat16",
                    num_vectors=6, ztype="bfloat16")
    else:
        raise SystemExit(f"unknown tag {tag}")

    recs = {}
    for inner, its in (("fem-amg", ii), ("amg", 4)):
        cfg = Config(inner=inner, inner_iterations=its, **base)
        rec = run_simulation(cfg, out=sys.stderr)
        recs[inner] = {
            "inner_iterations": its,
            "iterations": rec["iterations"],
            "converged": rec["converged"],
            "solve_seconds": rec["solve_seconds"],
            "max_error": rec["max_error"],
            "residual_history": rec["residual_history"],
        }
    out = {"mesh": tag, **recs}
    with open(f"artifacts/femamg_unstructured_{tag}.json", "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps({k: (v["iterations"], v["converged"])
                      for k, v in recs.items()}))
    return 0 if all(v["converged"] for v in recs.values()) else 1


if __name__ == "__main__":
    sys.exit(main())
