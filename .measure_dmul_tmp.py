import time, jax, jax.numpy as jnp, numpy as np
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

def dmul_named(D, U, axis, n):   # current form
    shape = U.shape
    m = shape[axis] // n
    split = shape[:axis] + (m, n) + shape[axis+1:]
    V = U.reshape(split)
    letters = "zyxwvuts"[:V.ndim]
    k = letters[axis+1]
    out = letters.replace(k, "a")
    V = jnp.einsum(f"a{k},{letters}->{out}", D, V, precision=_PREC)
    return V.reshape(shape)

def dmul_last(D, U, axis, n):    # moveaxis-to-last form
    shape = U.shape
    m = shape[axis] // n
    split = shape[:axis] + (m, n) + shape[axis+1:]
    V = U.reshape(split)
    V = jnp.moveaxis(V, axis+1, -1)
    V = jnp.einsum("ak,...k->...a", D, V, precision=_PREC)
    V = jnp.moveaxis(V, -1, axis+1)
    return V.reshape(shape)

def apply_lat(dmul, U, G, D):
    n = D.shape[0]
    Dt = D.T
    Dr = dmul(D, U, 2, n); Ds = dmul(D, U, 1, n); Dt_ = dmul(D, U, 0, n)
    Wr = G[...,0]*Dr + G[...,3]*Ds + G[...,4]*Dt_
    Ws = G[...,3]*Dr + G[...,1]*Ds + G[...,5]*Dt_
    Wt = G[...,4]*Dr + G[...,5]*Ds + G[...,2]*Dt_
    return dmul(Dt, Wr, 2, n) + dmul(Dt, Ws, 1, n) + dmul(Dt, Wt, 0, n)

from polynomial_reduction_with_full_domain_decomposition_preconditioner_tpu.utils.gll import diff_matrix
rng = np.random.default_rng(0)
n = 8
for dtype in (jnp.float32, jnp.bfloat16):
    U = jnp.asarray(rng.random((128,128,128)), dtype=dtype)
    G = jnp.asarray(rng.random((128,128,128,6)), dtype=dtype)
    D = jnp.asarray(diff_matrix(n), dtype=dtype)
    for name, dm in (("named", dmul_named), ("movelast", dmul_last)):
        mk = lambda nit: (lambda g, v: jax.lax.fori_loop(0, nit,
            lambda i, w: apply_lat(dm, w, g, D), v).ravel()[0])
        print(dtype.__name__, name, f"{timed_chain(mk, G, U)*1e6:.0f} us", flush=True)
