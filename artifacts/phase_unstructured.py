"""Device-measured phase regions of the UNSTRUCTURED production solve.

Runs Domain.phase_chain (difference-timed jitted region chains — the
reference's timed-region taxonomy, poisson.cpp:259-358) on the
scrambled-Kershaw production config to locate the remaining per-
iteration cost after the face+edge-block dssum.

Usage: python artifacts/phase_unstructured.py   (real TPU)
Writes artifacts/phase_unstructured_16cubed.json
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from functools import partial
    import jax.numpy as jnp
    from polynomial_reduction_with_full_domain_decomposition_preconditioner_tpu.mesh import generator as mg
    from polynomial_reduction_with_full_domain_decomposition_preconditioner_tpu.mesh.partition import partition_mesh
    from polynomial_reduction_with_full_domain_decomposition_preconditioner_tpu.solvers.domain import Domain
    from polynomial_reduction_with_full_domain_decomposition_preconditioner_tpu.solvers import subdomain as sub
    from polynomial_reduction_with_full_domain_decomposition_preconditioner_tpu.runtime.checkpoint import cached_mesh_builder
    from polynomial_reduction_with_full_domain_decomposition_preconditioner_tpu.runtime.phases import _chain_time

    ckpt = "/root/repo/.ckpt_cache"
    base = partial(mg.kershaw_mesh, (16, 16, 16), epsilon=0.3)
    builder = cached_mesh_builder(
        lambda o: mg.scramble_mesh(base(o), seed=7), ckpt,
        "kershaw_16x16x16_e0.3_s7")
    t0 = time.time()
    mesh = builder(7)
    dom = Domain(partition_mesh(mesh, 1, structured=False),
                 dtype=jnp.float32)
    pre = sub.composite_dd(dom, builder, poly_reduction=6, inner="amg",
                           ptype=jnp.float32, num_iterations=4,
                           fine_mesh=mesh)
    print(f"setup {time.time()-t0:.1f}s", file=sys.stderr)

    u_star = dom.initial_function(4, seed=0)
    f = dom.manufacture_rhs(u_star)

    kinds = ("nrm", "op", "dssum", "cnrm", "comp_op", "comp_dssum",
             "inner_precond", "tree_cascade", "tree_rhs")
    ct = {}
    for k in kinds:
        ct[k] = _chain_time(dom, pre, k, f, iters=12)
        print(f"{k}: {ct[k]*1e3:.3f} ms", file=sys.stderr)

    ki = 4
    regions = {
        "domain.operator_application": ct["op"] - ct["dssum"],
        "domain.inner_products+vector_ops": ct["nrm"],
        "subdomain.stitching (outer dssum)": ct["dssum"] - ct["nrm"],
        "subdomain.tree_construction": ct["tree_cascade"],
        "subdomain.tree_exchange": ct["tree_rhs"] - ct["tree_cascade"],
        f"subdomain.operator_application (x{ki})":
            ct["comp_op"] - ct["cnrm"],
        f"subdomain.assembly comp_dssum (x{ki}+)":
            ct["comp_dssum"] - ct["cnrm"],
        f"subdomain.preconditioner vcycle (x{ki})":
            ct["inner_precond"] - ct["cnrm"],
        "subdomain.vector_ops (cnrm)": ct["cnrm"],
    }
    for k, v in regions.items():
        print(f"{k}: {v*1e3:.3f} ms", file=sys.stderr)
    with open("artifacts/phase_unstructured_16cubed.json", "w") as fh:
        json.dump({"chains_ms": {k: v * 1e3 for k, v in ct.items()},
                   "regions_ms": {k: v * 1e3 for k, v in regions.items()}},
                  fh, indent=1)
    print("DONE")


if __name__ == "__main__":
    sys.exit(main())
