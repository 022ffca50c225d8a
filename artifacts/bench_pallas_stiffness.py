"""A/B microbench: fused Pallas SEM stiffness apply vs the XLA lattice
path, f32 and bf16, 2.1M and 33.5M point lattices, on the real chip."""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time, numpy as np, jax, jax.numpy as jnp
import polynomial_reduction_with_full_domain_decomposition_preconditioner_tpu.ops.sem as sem
from polynomial_reduction_with_full_domain_decomposition_preconditioner_tpu.utils.gll import diff_matrix


def timed_chain(make_fn, *args, iters=30):
    f1 = jax.jit(make_fn(iters)); f2 = jax.jit(make_fn(2 * iters))
    float(f1(*args)); float(f2(*args))
    b1 = b2 = float("inf")
    for _ in range(3):
        t0 = time.time(); float(f1(*args)); b1 = min(b1, time.time() - t0)
        t0 = time.time(); float(f2(*args)); b2 = min(b2, time.time() - t0)
    return (b2 - b1) / iters


n = 8
for dt_io in (jnp.float32, jnp.bfloat16):
    for shape in [(128, 128, 128), (128, 512, 512)]:
        rng = np.random.default_rng(0)
        U = jnp.asarray(rng.standard_normal(shape), dt_io)
        G = tuple(jnp.asarray(rng.standard_normal(shape), dt_io)
                  for _ in range(6))
        D = jnp.asarray(diff_matrix(n), dt_io)
        npts = U.size
        bs = jnp.dtype(dt_io).itemsize
        for name, flag in [("pallas", True), ("xla", False)]:
            sem._PALLAS_STIFFNESS = flag

            def make(nit):
                def f(u, *g):
                    out = jax.lax.fori_loop(
                        0, nit,
                        lambda i, w: sem.stiffness_apply_lattice(w, g, D, 3),
                        u)
                    return out.ravel()[0].astype(jnp.float32)
                return f

            dt = timed_chain(make, U, *G)
            gbs = npts * bs * 8 / dt / 1e9
            print(f"{np.dtype(dt_io).name} {shape} {name}: "
                  f"{dt*1e6:.0f} us/apply  {gbs:.0f} GB/s", flush=True)
        sem._PALLAS_STIFFNESS = True
        a = sem.stiffness_apply_lattice(U, G, D, 3)
        sem._PALLAS_STIFFNESS = False
        b = sem.stiffness_apply_lattice(U, G, D, 3)
        err = float((jnp.max(jnp.abs((a - b).astype(jnp.float32)))
                     / jnp.max(jnp.abs(b.astype(jnp.float32)))))
        print(f"{np.dtype(dt_io).name} {shape} rel err pallas vs xla: "
              f"{err:.2e}", flush=True)
sem._PALLAS_STIFFNESS = True
