"""Device-measured region chains at the 64^3 headline size: where do
the 325 ms/outer-iteration go? (The reference's timed-region taxonomy,
poisson.cpp:259-358, at the scale it benchmarks.)

Usage: python artifacts/phase_64cubed.py [m]   (default 64)
Writes artifacts/phase_{m}cubed.json
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    m = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    import jax
    import jax.numpy as jnp
    from functools import partial
    from polynomial_reduction_with_full_domain_decomposition_preconditioner_tpu.mesh import generator as mg
    from polynomial_reduction_with_full_domain_decomposition_preconditioner_tpu.mesh.partition import partition_mesh
    from polynomial_reduction_with_full_domain_decomposition_preconditioner_tpu.solvers.domain import Domain
    from polynomial_reduction_with_full_domain_decomposition_preconditioner_tpu.solvers import subdomain as sub
    from polynomial_reduction_with_full_domain_decomposition_preconditioner_tpu.runtime.checkpoint import cached_mesh_builder
    from polynomial_reduction_with_full_domain_decomposition_preconditioner_tpu.runtime.phases import _chain_time

    cache_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    ckpt = "/root/repo/.ckpt_cache"
    shape = (m, m, m)
    builder = cached_mesh_builder(
        partial(mg.kershaw_mesh, shape, epsilon=0.3), ckpt,
        f"kershaw_{m}x{m}x{m}_e0.3_sNone")
    t0 = time.time()
    mesh = builder(7)
    dom = Domain(partition_mesh(mesh, 1), dtype=jnp.float32)
    print(f"mesh {time.time()-t0:.0f}s", file=sys.stderr)
    t0 = time.time()
    pre = sub.composite_dd(
        dom, builder, poly_reduction=6, inner="amg", ptype=jnp.bfloat16,
        num_iterations=4, fine_mesh=mesh,
        chain_cache=os.path.join(ckpt, f"chain_kershaw_{m}cubed.npz"))
    print(f"precond {time.time()-t0:.0f}s", file=sys.stderr)
    u_star = dom.initial_function(4, seed=0)
    f = dom.manufacture_rhs(u_star)
    u_star.delete()

    out = {}
    for k in ("nrm", "op", "dssum", "cnrm", "comp_op", "comp_dssum",
              "inner_precond", "tree_cascade", "tree_rhs",
              # round-5 sub-kinds (P=1: tree legs are degenerate but the
              # assemble half is the real gather cost)
              "tree_rings", "tree_coarse", "comp_assemble"):
        t0 = time.time()
        out[k] = _chain_time(dom, pre, k, f, iters=8, repeats=3)
        print(f"{k}: {out[k]*1e3:.2f} ms/application "
              f"(measured in {time.time()-t0:.0f}s)", file=sys.stderr)
    with open(f"artifacts/phase_{m}cubed.json", "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps({k: round(v * 1e3, 3) for k, v in out.items()}))


if __name__ == "__main__":
    main()
