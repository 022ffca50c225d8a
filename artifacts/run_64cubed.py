"""One-chip Kershaw 64^3 N=7 run — the reference's headline mesh size
(run.py:26: Kershaw 64^3 at 32-1024 ranks on Summit) on a single TPU.

134M element points / 91M nodes. FCG outer (GMRES(20)'s 40-vector basis
would not fit in 16 GB HBM; FCG is the reference's solver_id=0 path,
domain.tpp:613-725), bf16 composite preconditioner, f32 outer.

Usage:  python artifacts/run_64cubed.py [shape_exponent]
Writes: artifacts/scaleup_64cubed.json
"""

import io
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    m = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    from polynomial_reduction_with_full_domain_decomposition_preconditioner_tpu.runtime.config import Config
    from polynomial_reduction_with_full_domain_decomposition_preconditioner_tpu.runtime.driver import run_simulation

    cfg = Config(mesh="kershaw", shape=(m, m, m), epsilon=0.3,
                 poly_degree=7, poly_reduction=6,
                 stype="float32", ptype="bfloat16",
                 solver="fcg", max_iterations=200,
                 checkpoint="/root/repo/.ckpt_cache")
    t0 = time.time()
    buf = io.StringIO()
    rec = run_simulation(cfg, out=buf)
    rec["wall_seconds"] = time.time() - t0
    sys.stderr.write(buf.getvalue()[-3000:] + "\n")
    with open(f"artifacts/scaleup_{m}cubed.json", "w") as fh:
        json.dump(rec, fh, indent=1)
    print("DONE", m, rec["iterations"], rec["converged"],
          rec["solve_seconds"])
    return 0


if __name__ == "__main__":
    sys.exit(main())
