"""All-device multilevel V-cycle with Chebyshev smoothing.

TPU-native rebuild of the reference's AMG apply engine
(/root/reference/subdomain.tpp:3987-4159 + AMG/kernels.cu): per-level
Chebyshev/Jacobi smoothing over extracted level matrices, restriction,
coarse solve, prolongation. Differences by design:

- The reference splits levels GPU/CPU at ``level_cutoff`` and captures the
  GPU legs into CUDA graphs (subdomain.tpp:3644-3704). Here the WHOLE
  V-cycle is one jit-traced function: XLA gives whole-graph launch for
  free (SURVEY.md section 2.3(4)) and every level stays in HBM.
- The coarsest solve is a precomputed dense inverse applied as a matvec on
  the MXU, replacing the host-side ``hypre_GaussElimSolve``
  (subdomain.tpp:4080-4088) — no device->host bounce.
- Level SpMV uses the padded-ELL layout (ops/csr.py), the TPU-friendly
  replacement for cusparse CSR SpMV (AMG/csr_matrix.cpp:112-134).

The Chebyshev smoother matches hypre relax_type=16 semantics
(subdomain.tpp:3480-3497): diagonal-preconditioned Chebyshev on
[fraction * lmax, lmax] with fraction 0.3, lmax estimated at setup by
power iteration on D^{-1}A.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..ops.csr import (EllMatrix, ell_from_csr, ell_spmv, BsrMatrix,
                       bsr_from_csr, bsr_stack, bsr_spmv)
from .composite import HostHierarchy

__all__ = ["pack_hierarchies", "vcycle_apply", "CHEBY_FRACTION"]

CHEBY_FRACTION = 0.3   # hypre's cheby_fraction default (relax_type=16)

_BSR_BLOCK = 16   # measured 1.3 Gnnz/s at 275k rows (10x the ELL gathers)


def pack_hierarchies(hiers: list[HostHierarchy], dtype=jnp.float32,
                     stack: bool = True, select=None, put=None):
    """Device pytree for one or many shards' hierarchies. All sparse
    operators pack as block-sparse BSR (ops/csr.bsr_spmv) — the ELL
    gather form measured ~0.1 Gnnz/s on TPU and faulted at multi-million
    rows; BSR runs >= 1 Gnnz/s and uses only contiguous takes.

    With stack=True every leaf gets a leading shard axis (for shard_map);
    with stack=False a single hierarchy is packed unstacked.
    select/put: multi-process local-only setup — ``hiers`` covers EVERY
    shard (patterns shape the SPMD-consistent pads), ``select`` names
    this process's shards (values materialize for those only), and
    ``put`` (e.g. Domain.shard_put) places each stacked leaf as a global
    jax.Array.
    """
    if not stack:
        hiers2 = [hiers[0]]
        pack = lambda mats: bsr_from_csr(mats[0], block=_BSR_BLOCK,
                                         dtype=dtype)
        arr = lambda xs: jnp.asarray(np.asarray(xs[0]), dtype=dtype)
    else:
        hiers2 = hiers
        sel = list(range(len(hiers))) if select is None else list(select)
        pack = lambda mats: bsr_stack(mats, block=_BSR_BLOCK, dtype=dtype,
                                      select=select)
        arr = lambda xs: jnp.asarray(np.stack([np.asarray(xs[p])
                                               for p in sel]), dtype=dtype)
        if put is not None:
            _p, _a = pack, arr
            pack = lambda mats: jax.tree.map(
                lambda x: put(np.asarray(x)), _p(mats))
            arr = lambda xs: put(np.asarray(_a(xs)))
    squeeze = lambda e: e

    nlev = len(hiers2[0].mats)
    levels = []
    for l in range(nlev):
        A = squeeze(pack([h.mats[l] for h in hiers2]))
        diag = [h.mats[l].diagonal() for h in hiers2]
        invd = [np.where(d > 0, 1.0 / d, 0.0) for d in diag]
        levels.append({
            "A": A,
            "invd": arr(invd),
            "lmax": (arr([h.lmaxs[l] for h in hiers2])
                     if l < nlev - 1 else arr([1.0 for _ in hiers2])),
        })
    tree = {
        "levels": levels,
        "prolongs": [squeeze(pack([h.prolongs[l] for h in hiers2]))
                     for l in range(nlev - 1)],
        "restricts": [squeeze(pack([h.prolongs[l].T.tocsr() for h in hiers2]))
                      for l in range(nlev - 1)],
        "coarse_inv": arr([h.coarse_inv for h in hiers2]),
        "Q": squeeze(pack([h.Q for h in hiers2])),
        "Qt": squeeze(pack([h.Q.T.tocsr() for h in hiers2])),
        "dof_mask": arr([h.dof_mask for h in hiers2]),
    }
    return tree


def _apply(A, x):
    """Level-operator dispatch: BsrMatrix, CooMatrix, EllMatrix, or any
    callable x -> A x (the matrix-free SEM composite operator of the
    hybrid V-cycle)."""
    if callable(A):
        return A(x)
    from ..ops.csr import sparse_spmv
    return sparse_spmv(A, x)


def cheby_smooth(A, invd, lmax, f, u, order: int):
    """Diagonal-preconditioned Chebyshev smoothing on [0.3*lmax, lmax]
    (the fused smoother ops of AMG/kernels.cu:25-76, here fused by XLA).
    A: EllMatrix or a matrix-free callable. Fields may be PYTREES of
    arrays (the composite problem keeps per-group lattices unflattened)."""
    tm = jax.tree.map
    lmin = CHEBY_FRACTION * lmax
    theta = 0.5 * (lmax + lmin)
    delta = 0.5 * (lmax - lmin)
    sigma = theta / delta
    rho = 1.0 / sigma
    r = f if u is None else tm(jnp.subtract, f, _apply(A, u))
    d = tm(lambda iv, rl: iv * rl / theta, invd, r)
    if u is None:
        u = d
    else:
        u = tm(jnp.add, u, d)
    for _ in range(order - 1):
        r = tm(jnp.subtract, r, _apply(A, d))
        rho_new = 1.0 / (2.0 * sigma - rho)
        d = tm(lambda dl, iv, rl: rho_new * rho * dl
               + (2.0 * rho_new / delta) * (iv * rl), d, invd, r)
        rho = rho_new
        u = tm(jnp.add, u, d)
    return u


def vcycle_apply(tree, f, *, cheby_order: int = 2, num_cycles: int = 1):
    """One-or-more V(1,1) cycles on an assembled-DOF right-hand side.

    Pure traced function: levels/prolongs are a static Python list, so the
    whole cycle compiles to one XLA program (the reference's CUDA-graph
    trick, subdomain.tpp:3644-3704, for free)."""
    levels = tree["levels"]
    prolongs = tree["prolongs"]
    restricts = tree["restricts"]
    nlev = len(levels)

    def cycle(l, fl):
        if l == nlev - 1:
            return jnp.dot(tree["coarse_inv"], fl,
                           precision=jax.lax.Precision.HIGHEST)
        lv = levels[l]
        u = cheby_smooth(lv["A"], lv["invd"], lv["lmax"], fl, None,
                         cheby_order)
        r = fl - _apply(lv["A"], u)
        fc = _apply(restricts[l], r)
        uc = cycle(l + 1, fc)
        u = u + _apply(prolongs[l], uc)
        return cheby_smooth(lv["A"], lv["invd"], lv["lmax"], fl, u,
                            cheby_order)

    u = cycle(0, f)
    for _ in range(num_cycles - 1):
        u = u + cycle(0, f - _apply(levels[0]["A"], u))
    return u


def pack_chain(info: dict, dtype=jnp.float32) -> dict:
    """Device pytree for a replicated tensor-grid chain (amg/composite.
    coarsen_chain_info output): level matrices in stencil form
    (ops/stencil.py — dense rolls, no gathers), transfers as per-axis
    dense factors (MXU contractions)."""
    from ..ops.stencil import stencil_from_csr

    dim = len(info["shapes"][0])
    nlev = len(info["mats"])
    levels = []
    for l in range(nlev):
        A = info["mats"][l]
        d = A.diagonal()
        levels.append({
            "coefs": stencil_from_csr(A, info["shapes"][l], dtype=dtype),
            "invd": jnp.asarray(np.where(d > 0, 1.0 / d, 0.0), dtype=dtype),
            "lmax": jnp.asarray(info["lmaxs"][l] if l < nlev - 1 else 1.0,
                                dtype=dtype),
        })
    return {
        "levels": levels,
        "factors": [[jnp.asarray(F, dtype=dtype) for F in Fs]
                    for Fs in info["factors"]],
        "masks": [jnp.asarray(m, dtype=dtype) for m in info["masks"]],
        "coarse_inv": jnp.asarray(info["coarse_inv"], dtype=dtype),
    }


def chain_vcycle(chain: dict, f, *, cheby_order: int = 2):
    """V(1,1) cycle on a pack_chain tree — all stencil rolls and dense
    per-axis contractions (zero gathers)."""
    from ..ops.stencil import stencil_apply
    from ..ops.interp import axis_contract

    levels = chain["levels"]
    dim = levels[0]["coefs"].ndim - 1  # static (from array rank)
    nlev = len(levels)

    def transfer(l, v, down: bool):
        """down: restrict level l -> l+1 (factors transposed); up:
        prolong level l+1 -> l."""
        Fs = chain["factors"][l]
        shape_in = levels[l if down else l + 1]["coefs"].shape[1:]
        V = v.reshape(shape_in)
        for ax, F in enumerate(Fs):
            V = axis_contract(F.T if down else F, V, ax)
        V = V.reshape(-1)
        return V * chain["masks"][l + 1 if down else l]

    def cycle(l, fl):
        if l == nlev - 1:
            return jnp.dot(chain["coarse_inv"], fl,
                           precision=jax.lax.Precision.HIGHEST)
        lv = levels[l]
        A = lambda x: stencil_apply(lv["coefs"], x, dim)
        u = cheby_smooth(A, lv["invd"], lv["lmax"], fl, None, cheby_order)
        fc = transfer(l, fl - A(u), down=True)
        u = u + transfer(l, cycle(l + 1, fc), down=False)
        return cheby_smooth(A, lv["invd"], lv["lmax"], fl, u, cheby_order)

    return cycle(0, f)


def composite_preconditioner(tree, *, cheby_order: int = 2,
                             num_cycles: int = 1):
    """(r_lattice -> z_lattice) low-order preconditioner apply: gather to
    DOFs, V-cycle(s), scatter back (subdomain.tpp:3995-4158)."""
    def apply(r):
        f = _apply(tree["Qt"], r) * tree["dof_mask"]
        v = vcycle_apply(tree, f, cheby_order=cheby_order,
                         num_cycles=num_cycles)
        return _apply(tree["Q"], v * tree["dof_mask"])

    return apply
