import time, jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
_PREC = jax.lax.Precision.HIGHEST

def timed_chain(make_fn, *args, iters=50):
    f1 = jax.jit(make_fn(iters)); f2 = jax.jit(make_fn(2*iters))
    float(f1(*args)); float(f2(*args))
    b1 = b2 = float("inf")
    for _ in range(3):
        t0=time.time(); float(f1(*args)); b1=min(b1,time.time()-t0)
        t0=time.time(); float(f2(*args)); b2=min(b2,time.time()-t0)
    return (b2-b1)/iters

from polynomial_reduction_with_full_domain_decomposition_preconditioner_tpu.ops import sem
from polynomial_reduction_with_full_domain_decomposition_preconditioner_tpu.utils.gll import diff_matrix
rng = np.random.default_rng(0)
n = 8
U = jnp.asarray(rng.random((128,128,128)), dtype=jnp.float32)
G = jnp.asarray(rng.random((128,128,128,6)), dtype=jnp.float32)
D = jnp.asarray(diff_matrix(n), dtype=jnp.float32)
mk = lambda nit: (lambda g, v: jax.lax.fori_loop(0, nit,
    lambda i, w: sem.stiffness_apply_lattice(w, g, D, 3), v).ravel()[0])
print("x64-on lattice 3D-in/out:", f"{timed_chain(mk, G, U)*1e6:.0f} us", flush=True)
# flat wrapper (the Domain.operator form)
uf = U.reshape(-1)
mkf = lambda nit: (lambda g, v: jax.lax.fori_loop(0, nit,
    lambda i, w: sem.stiffness_apply_lattice(w.reshape(128,128,128), g, D, 3).reshape(-1), v).ravel()[0])
print("x64-on lattice flat-in/out:", f"{timed_chain(mkf, G, uf)*1e6:.0f} us", flush=True)
