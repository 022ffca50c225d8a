"""fem-amg quality ablation at the reference's own default inner(4).

Round-4 finding: the reference-faithful fem-amg oracle needs inner
FGMRES(8) for iteration-class parity with the hybrid (13 vs 12 at 16^3
N=7); at the reference's default inner(4) (subdomain.hpp:229-234) it
sits at ~26 outer iterations — the FEM-SEM equivalence constant, not the
AMG hierarchy, was the diagnosis (exact SEM-Q1 blocks changed nothing).

This closes VERDICT round-4 weak #3 with a measured ablation of the
remaining V-cycle-strength knobs at inner(4), Kershaw 16^3 N=7 on TPU:

  base   1 V-cycle, Chebyshev order 2   (reference defaults)
  cheb4  1 V-cycle, Chebyshev order 4   (stronger level smoothing)
  v22    2 V-cycles, Chebyshev order 2  (the V(2,2)-strength analog:
                                         twice the cycle work per inner
                                         application)
  c4v2   2 V-cycles, Chebyshev order 4

Writes artifacts/femamg_i4_ablate.json with outer iteration counts.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from polynomial_reduction_with_full_domain_decomposition_preconditioner_tpu.runtime.config import Config
from polynomial_reduction_with_full_domain_decomposition_preconditioner_tpu.runtime.driver import run_simulation

ABLATIONS = {
    "base":  dict(num_vcycles=1, cheby_order=2),
    "cheb4": dict(num_vcycles=1, cheby_order=4),
    "v22":   dict(num_vcycles=2, cheby_order=2),
    "c4v2":  dict(num_vcycles=2, cheby_order=4),
}


def main():
    out = {}
    for tag, kw in ABLATIONS.items():
        cfg = Config(mesh="kershaw", shape=(16, 16, 16), epsilon=0.3,
                     poly_degree=7, poly_reduction=6,
                     inner="fem-amg", inner_iterations=4,
                     max_iterations=200,
                     checkpoint="/root/repo/.ckpt_cache", **kw)
        rec = run_simulation(cfg, out=sys.stderr)
        out[tag] = {"knobs": kw, "iterations": rec["iterations"],
                    "converged": rec["converged"],
                    "solve_seconds": rec["solve_seconds"]}
        print(f"{tag}: {rec['iterations']} iterations "
              f"({rec['solve_seconds']:.2f}s)", file=sys.stderr)
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "femamg_i4_ablate.json"), "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps({t: v["iterations"] for t, v in out.items()}))
    return 0 if all(v["converged"] for v in out.values()) else 1


if __name__ == "__main__":
    sys.exit(main())
