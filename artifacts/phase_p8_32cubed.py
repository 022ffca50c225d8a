"""P=8 virtual-mesh phase profile at Kershaw 32^3 N=7.

Round-3 VERDICT gap: the only committed 64^3 phase profile was P=1,
where the composite is a single full-order group and the tree
construction/exchange phases measure 0.0 — the multi-group hot path
(rings at reduced orders, restriction cascade, ring ppermute + coarse
all_gather, far-field z-merge) had no recorded timings. This runs the
device-measured region chains (Domain.phase_chain, difference-timed
fori_loop chains) on an 8-shard virtual CPU mesh at 32^3 N=7, where
every group/tree region is structurally identical to a real 8-chip run.

CPU caveat: absolute numbers are single-core XLA-CPU timings — use them
RELATIVELY across regions; the real-chip P=1 profile
(artifacts/phase_64cubed.json) complements with absolute TPU numbers.

Usage: python artifacts/phase_p8_32cubed.py [m] [P] [chain_iters]
Writes artifacts/phase_p{P}_{m}cubed.json
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    m = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    Pn = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    iters = int(sys.argv[3]) if len(sys.argv) > 3 else 4

    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", Pn)

    import jax.numpy as jnp
    from functools import partial
    from polynomial_reduction_with_full_domain_decomposition_preconditioner_tpu.mesh import generator as mg
    from polynomial_reduction_with_full_domain_decomposition_preconditioner_tpu.mesh.partition import partition_mesh
    from polynomial_reduction_with_full_domain_decomposition_preconditioner_tpu.solvers.domain import Domain
    from polynomial_reduction_with_full_domain_decomposition_preconditioner_tpu.solvers import subdomain as sub
    from polynomial_reduction_with_full_domain_decomposition_preconditioner_tpu.runtime.phases import _chain_time
    from polynomial_reduction_with_full_domain_decomposition_preconditioner_tpu.runtime.checkpoint import cached_mesh_builder
    from polynomial_reduction_with_full_domain_decomposition_preconditioner_tpu.runtime.driver import _enable_compile_cache
    _enable_compile_cache()

    ckpt = "/root/repo/.ckpt_cache"
    shape = (m, m, m)
    builder = cached_mesh_builder(
        partial(mg.kershaw_mesh, shape, epsilon=0.3), ckpt,
        f"kershaw_{m}x{m}x{m}_e0.3_sNone")
    t0 = time.time()
    mesh = builder(7)
    sd = partition_mesh(mesh, Pn)
    dmesh = jax.make_mesh((Pn,), ("shard",))
    dom = Domain(sd, dtype=jnp.float32, device_mesh=dmesh)
    print(f"mesh+domain {time.time()-t0:.1f}s  shards={Pn} "
          f"ragged={dom.ragged}", file=sys.stderr)

    t0 = time.time()
    pre = sub.composite_dd(
        dom, builder, poly_reduction=6, inner="amg", ptype=jnp.bfloat16,
        num_iterations=4, fine_mesh=mesh,
        chain_cache=os.path.join(ckpt, f"chain_kershaw_{m}cubed.npz"))
    print(f"preconditioner setup {time.time()-t0:.1f}s", file=sys.stderr)

    u_star = dom.initial_function(4, seed=0)
    f = dom.manufacture_rhs(u_star)

    kinds = ("nrm", "op", "dssum", "cnrm", "comp_op", "comp_dssum",
             "inner_precond", "tree_cascade", "tree_rhs",
             "inner_smooth", "inner_transfer", "inner_coarse",
             # round-5 sub-kinds: tree-exchange legs + assemble half
             "tree_rings", "tree_coarse", "comp_assemble")
    ct = {}
    for k in kinds:
        t0 = time.time()
        ct[k] = _chain_time(dom, pre, k, f, iters=iters, repeats=2)
        print(f"  {k}: {ct[k]*1e3:.3f} ms/app  "
              f"(measured in {time.time()-t0:.1f}s)", file=sys.stderr)

    regions = {
        "domain.operator_application": ct["op"] - ct["dssum"],
        "domain.inner_products+vector_operations": ct["nrm"],
        "subdomain.stitching (outer dssum)": ct["dssum"] - ct["nrm"],
        "subdomain.tree_construction (restriction cascade)":
            ct["tree_cascade"],
        "subdomain.tree_exchange (rings ppermute + coarse all_gather + "
        "far)": ct["tree_rhs"] - ct["tree_cascade"],
        "subdomain.operator_application (per inner app)":
            ct["comp_op"] - ct["cnrm"],
        "subdomain.preconditioner.assemble+unassemble":
            ct["comp_dssum"] - ct["cnrm"],
        "subdomain.preconditioner.vcycle (total)":
            ct["inner_precond"] - ct["cnrm"],
        "subdomain.preconditioner.smooth_leg (1 Chebyshev)":
            ct["inner_smooth"] - ct["cnrm"],
        "subdomain.preconditioner.transfer_legs (R+P)":
            ct["inner_transfer"] - ct["cnrm"],
        "subdomain.preconditioner.coarse_grid_solver":
            ct["inner_coarse"] - ct["inner_transfer"],
        "subdomain.inner_products+vector_operations": ct["cnrm"],
        # round-5 splits (poisson.cpp:259-358 one-for-one): tree
        # exchange legs + assemble/unassemble halves
        "subdomain.tree_exchange.rings (ppermute legs)":
            ct["tree_rings"] - ct["tree_cascade"],
        "subdomain.tree_exchange.coarse (all_gather)":
            ct["tree_coarse"] - ct["tree_cascade"],
        "subdomain.tree_exchange.superdomain (far restrict)":
            (ct["tree_rhs"] - ct["tree_rings"]
             - ct["tree_coarse"] + ct["tree_cascade"]),
        "subdomain.preconditioner.assemble (gather half)":
            ct["comp_assemble"] - ct["cnrm"],
        "subdomain.preconditioner.unassemble (scatter+stitch half)":
            ct["comp_dssum"] - ct["comp_assemble"],
    }
    regions = {k: max(v, 0.0) for k, v in regions.items()}
    for k, v in regions.items():
        print(f"{k}: {v*1e3:.3f} ms", file=sys.stderr)

    rec = {
        "mesh": f"kershaw eps=0.3 {m}^3 N=7 r=6",
        "shards": Pn,
        "backend": "cpu-virtual (single core; relative numbers)",
        "chain_iters": iters,
        "raw_ms": {k: v * 1e3 for k, v in ct.items()},
        "regions_ms": {k: v * 1e3 for k, v in regions.items()},
    }
    path = f"artifacts/phase_p{Pn}_{m}cubed.json"
    with open(path, "w") as fh:
        json.dump(rec, fh, indent=1)
    print("DONE", path)
    return 0


if __name__ == "__main__":
    sys.exit(main())
