import time, jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
_HI = jax.lax.Precision.HIGHEST
from polynomial_reduction_with_full_domain_decomposition_preconditioner_tpu.utils.gll import diff_matrix

def timed_chain(make_fn, *args, iters=50):
    f1 = jax.jit(make_fn(iters)); f2 = jax.jit(make_fn(2*iters))
    float(f1(*args)); float(f2(*args))
    b1 = b2 = float("inf")
    for _ in range(3):
        t0=time.time(); float(f1(*args)); b1=min(b1,time.time()-t0)
        t0=time.time(); float(f2(*args)); b2=min(b2,time.time()-t0)
    return (b2-b1)/iters

n = 8
D = diff_matrix(n)
Dbig = np.kron(np.eye(128 // n), D)          # (128, 128) block-diag
DbigT = Dbig.T

def dmul128(M, U, axis):
    """contract 128-chunks of `axis` with the block-diag operator M."""
    shape = U.shape
    g = shape[axis] // 128
    split = shape[:axis] + (g, 128) + shape[axis+1:]
    V = U.reshape(split)
    letters = "zyxwvuts"[:V.ndim]
    k = letters[axis + 1]
    out = letters.replace(k, "a")
    V = jnp.einsum(f"a{k},{letters}->{out}", M, V, precision=_HI)
    return V.reshape(shape)

def apply_bd(U, G, Db, DbT):
    Dr = dmul128(Db, U, 2)
    Ds = dmul128(Db, U, 1)
    Dt = dmul128(Db, U, 0)
    Wr = G[...,0]*Dr + G[...,3]*Ds + G[...,4]*Dt
    Ws = G[...,3]*Dr + G[...,1]*Ds + G[...,5]*Dt
    Wt = G[...,4]*Dr + G[...,5]*Ds + G[...,2]*Dt
    return dmul128(DbT, Wr, 2) + dmul128(DbT, Ws, 1) + dmul128(DbT, Wt, 0)

rng = np.random.default_rng(0)
for dtype in (jnp.float32, jnp.bfloat16):
    U = jnp.asarray(rng.random((128,128,128)), dtype=dtype)
    G = jnp.asarray(rng.random((128,128,128,6)), dtype=dtype)
    Db = jnp.asarray(Dbig, dtype=dtype); DbT = jnp.asarray(DbigT, dtype=dtype)
    mk = lambda nit: (lambda g, v: jax.lax.fori_loop(0, nit,
        lambda i, w: apply_bd(w, g, Db, DbT), v).ravel()[0])
    dt = timed_chain(mk, G, U)
    print(f"{dtype.__name__} blockdiag-lattice: {dt*1e6:.0f} us", flush=True)

# correctness vs reference form
from polynomial_reduction_with_full_domain_decomposition_preconditioner_tpu.ops import sem
U = jnp.asarray(rng.random((16,16,16)), dtype=jnp.float32)  # too small for 128 chunks; use 128-wide
U = jnp.asarray(rng.random((128,128,128)), dtype=jnp.float32)
G = jnp.asarray(rng.random((128,128,128,6)), dtype=jnp.float32)
Df = jnp.asarray(D, dtype=jnp.float32)
a = sem.stiffness_apply_lattice(U, G, Df, 3)
b = apply_bd(U, G, jnp.asarray(Dbig, jnp.float32), jnp.asarray(DbigT, jnp.float32))
print("max rel diff:", float(jnp.abs(a-b).max() / jnp.abs(a).max()))
