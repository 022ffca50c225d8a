import time, sys
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
from polynomial_reduction_with_full_domain_decomposition_preconditioner_tpu.ops import sem
from polynomial_reduction_with_full_domain_decomposition_preconditioner_tpu.mesh.layout import elements_to_lattice
from polynomial_reduction_with_full_domain_decomposition_preconditioner_tpu.utils.gll import diff_matrix

def timed_chain(make_fn, *args, iters=50):
    f1 = jax.jit(make_fn(iters)); f2 = jax.jit(make_fn(2*iters))
    float(f1(*args)); float(f2(*args))
    b1 = b2 = float("inf")
    for _ in range(3):
        t0=time.time(); float(f1(*args)); b1=min(b1,time.time()-t0)
        t0=time.time(); float(f2(*args)); b2=min(b2,time.time()-t0)
    return (b2-b1)/iters

dim, n = 3, 8
E = 4096
npe = n**dim
rng = np.random.default_rng(0)
for dtype in (jnp.float32, jnp.bfloat16):
    u = jnp.asarray(rng.random((E, npe)), dtype=dtype)
    geom = jnp.asarray(rng.random((E, npe, 6)), dtype=dtype)
    D = jnp.asarray(diff_matrix(n), dtype=dtype)
    DT_all, D_all = sem.dense_derivative_ops(n, dim)
    DT_all = jnp.asarray(DT_all, dtype=dtype); D_all = jnp.asarray(D_all, dtype=dtype)

    # (a) element-layout tensor-product
    mk_tp = lambda nit: (lambda g, v: jax.lax.fori_loop(0, nit,
        lambda i, w: sem.stiffness_apply(w, g, D, dim), v).ravel()[0])
    dt = timed_chain(mk_tp, geom, u)
    print(f"{dtype.__name__} tensor-elem: {dt*1e6:.0f} us", flush=True)

    # (b) dense element form
    mk_d = lambda nit: (lambda g, v: jax.lax.fori_loop(0, nit,
        lambda i, w: sem.stiffness_apply_dense(w, g, DT_all, D_all, dim), v).ravel()[0])
    dt = timed_chain(mk_d, geom, u)
    print(f"{dtype.__name__} dense-elem:  {dt*1e6:.0f} us", flush=True)

    # (c) lattice tensor-product (the current production path)
    grid = (16, 16, 16)
    Ul = jnp.asarray(elements_to_lattice(np.asarray(u, np.float32), grid, n, dim), dtype=dtype)
    Gl = jnp.asarray(elements_to_lattice(np.asarray(geom, np.float32), grid, n, dim), dtype=dtype)
    mk_l = lambda nit: (lambda g, v: jax.lax.fori_loop(0, nit,
        lambda i, w: sem.stiffness_apply_lattice(w, g, D, dim), v).ravel()[0])
    dt = timed_chain(mk_l, Gl, Ul)
    print(f"{dtype.__name__} tensor-lattice: {dt*1e6:.0f} us", flush=True)
