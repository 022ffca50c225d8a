"""Sparse matrices: host-side CSR setup + TPU-friendly ELL device SpMV.

Rebuild of the reference's CSR layer (/root/reference/csr_matrix.{hpp,tpp,
okl}: COO accumulation + sort/dedup assembly, device SpMV, weighted SpMV,
transpose, diagonal) and the cuSPARSE usage in the AMG mini-library
(AMG/csr_matrix.cpp:112-134).

Design split (SURVEY.md section 7.1): *setup* is host-side scipy/numpy —
assembly, transpose, SpGEMM (hypre's host SpGEMM role, subdomain.tpp:2401)
— while the *solve path* uses a padded ELL layout: row-per-lane dense
gathers instead of CSR row loops, because irregular per-row loops are
TPU-hostile while wide gathers ride the VPU. Rows are sorted into width
buckets at setup to bound padding waste.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import jax
import jax.numpy as jnp
import scipy.sparse as sp

__all__ = ["assemble_csr", "EllMatrix", "ell_from_csr", "ell_spmv",
           "ell_spmv_range", "ell_spmv_weight", "BsrMatrix",
           "bsr_from_csr", "bsr_stack", "bsr_spmv", "CooMatrix",
           "coo_from_csr", "coo_stack", "coo_spmv", "sparse_spmv"]


def assemble_csr(rows, cols, vals, shape, drop_tol: float = 0.0):
    """COO -> CSR with duplicate summation (csr_matrix.tpp:94-180).

    The reference drops entries below a tolerance (1e-12 double / 1e-6
    float, csr_matrix.tpp:61-64); pass drop_tol to match.
    """
    m = sp.coo_matrix((vals, (rows, cols)), shape=shape).tocsr()
    m.sum_duplicates()
    if drop_tol > 0.0:
        m.data[np.abs(m.data) < drop_tol] = 0.0
        m.eliminate_zeros()
    return m


@jax.tree_util.register_dataclass
@dataclass
class EllMatrix:
    """Padded ELL sparse matrix on device.

    values/cols are (num_rows, K); padding entries have value 0 and column
    index num_cols (reads a zero slot of the padded input vector).
    ``row_perm`` maps padded storage row -> original row; the SpMV result
    is returned in original row order via inverse permutation
    ``inv_perm``. Rows may be sorted by nnz at setup to reduce K waste.
    """
    values: jax.Array     # (R, K)
    cols: jax.Array       # (R, K) int32
    inv_perm: jax.Array   # (num_rows,) int32: output gather indices


def ell_from_csr(m: sp.csr_matrix, sort_rows: bool = True,
                 dtype=np.float32, width: int | None = None) -> EllMatrix:
    """width: pad to at least this many columns (for stacking same-shape
    matrices from different shards into one SPMD array)."""
    m = m.tocsr()
    num_rows, num_cols = m.shape
    counts = np.diff(m.indptr)
    K = max(int(counts.max()) if num_rows else 0, 1, width or 1)

    order = (np.argsort(-counts, kind="stable") if sort_rows
             else np.arange(num_rows))
    vals = np.zeros((num_rows, K), dtype=dtype)
    colsp = np.full((num_rows, K), num_cols, dtype=np.int32)
    # fill row r of storage from original row order[r]
    src_rows = order
    for k in range(K):
        sel = counts[src_rows] > k
        rr = src_rows[sel]
        idx = m.indptr[rr] + k
        vals[sel, k] = m.data[idx]
        colsp[sel, k] = m.indices[idx]
    inv_perm = np.empty(num_rows, dtype=np.int32)
    inv_perm[order] = np.arange(num_rows, dtype=np.int32)
    return EllMatrix(values=jnp.asarray(vals), cols=jnp.asarray(colsp),
                     inv_perm=jnp.asarray(inv_perm))


def ell_spmv(m: EllMatrix, x, num_cols: int | None = None):
    """y = A x. x has the matrix's column count; returns original row order.

    Equivalent of csr_matrix.okl:5-18 ``multiply`` (and with a caller-side
    multiply by weight, okl:35-48 ``multiply_weight``).
    """
    xp = jnp.concatenate([x, jnp.zeros((1,), x.dtype)])
    contrib = m.values * xp[m.cols]          # (R, K) dense gathers
    y_sorted = contrib.sum(axis=1)
    return y_sorted[m.inv_perm]


def ell_spmv_range(m: EllMatrix, x, row_start: int, row_end: int):
    """Row-range SpMV: y[i] = (A x)[i] for row_start <= i < row_end, zero
    elsewhere (the csr_matrix.okl:20-33 ``multiply_range`` role). The range
    is applied as a mask in original row order — static shapes, no slicing.

    NOTE: the bound convention deliberately differs from the reference —
    there ``row_end`` is inclusive (csr_matrix.okl:21: ``i <= row_end``);
    here the range is half-open [row_start, row_end) to match Python/numpy
    slicing. Callers porting reference call sites must pass end+1."""
    y = ell_spmv(m, x)
    rows = jnp.arange(y.shape[0])
    return jnp.where((rows >= row_start) & (rows < row_end), y, 0.0)


def ell_spmv_weight(m: EllMatrix, x, weight):
    """Diagonally-weighted SpMV: y = diag(weight) A x
    (csr_matrix.okl:35-48 ``multiply_weight``)."""
    return weight * ell_spmv(m, x)


# ---------------------------------------------------------------------------
# BSR: block-sparse rows with dense blocks — the production sparse kernel.
#
# The plain ELL SpMV gathers x[cols] elementwise, which XLA lowers to
# ~0.1 Gnnz/s on TPU (and giant gathers have faulted the runtime). The
# BSR form replaces it with TPU-native primitives: the only gather is a
# take of CONTIGUOUS x row-blocks (nb, B), the products are one batched
# (B, B) x (B,) matvec einsum (bandwidth-bound on the block values), and
# the row reduction is a sorted segment-sum. For mesh matrices in a
# locality-preserving ordering the stored-block fill is high enough that
# the effective rate is bandwidth-limited — measured well beyond the
# >= 1 Gnnz/s target (BASELINE.md). The reference's cuSPARSE CSR SpMV
# role (AMG/csr_matrix.cpp:112-134) for irregular matrices.


from dataclasses import field


@jax.tree_util.register_dataclass
@dataclass
class BsrMatrix:
    """Block-sparse-row matrix with dense (B, B) blocks on device.
    Shape metadata is static (pytree-transparent).

    Two value layouts (TPU tiling pads the LAST TWO dims to (8|16, 128)):

    - ``"row"``: vals (nb, B, B) — natural for the batched-matvec
      einsum, but the minor dim B pads to 128: a 16x physical blowup at
      B=8 (observed: 2.46 GB of PB_146 fem values would occupy 39 GB).
      Fine for small/medium nb.
    - ``"tr"``: vals (B, B, nb) — the minor dim is nb (≈ zero pad;
      second-minor B pads to the 8/16 sublane tile only), so multi-
      million-block fem trees store at ~1-2x their logical size. The
      SpMV runs a chunked gather+contract+segment-sum over nb.
    """
    vals: jax.Array       # row: (nb, B, B); tr: (B, B, nb); +P leading
    bcols: jax.Array      # (nb,) int32 block-column ids
    brows: jax.Array      # (nb,) int32 block-row ids, sorted ascending
    n_rows: int = field(metadata=dict(static=True), default=0)
    n_cols: int = field(metadata=dict(static=True), default=0)
    layout: str = field(metadata=dict(static=True), default="row")

    @property
    def block(self) -> int:
        # works for both bare and (P,)-stacked values
        return self.vals.shape[-3] if self.layout == "tr" \
            else self.vals.shape[-1]


def _bsr_arrays(m: sp.csr_matrix, block: int, dtype):
    n_rows, n_cols = m.shape
    nrb = -(-n_rows // block)
    ncb = -(-n_cols // block)
    mp = sp.csr_matrix(m)
    mp.resize((nrb * block, ncb * block))
    mb = sp.bsr_matrix(mp, blocksize=(block, block))
    mb.sort_indices()
    brows = np.repeat(np.arange(nrb, dtype=np.int32),
                      np.diff(mb.indptr)).astype(np.int32)
    return (np.asarray(mb.data, dtype=dtype),
            mb.indices.astype(np.int32), brows)


# switch to the transposed layout when the row layout's tiling pad would
# dominate HBM: nb*B*B logical elements beyond this use (B, B, nb)
_TR_THRESHOLD = 1 << 26


def _pick_layout(layout, nb, block):
    if layout != "auto":
        return layout
    return "tr" if nb * block * block > _TR_THRESHOLD else "row"


def bsr_from_csr(m: sp.csr_matrix, block: int = 16,
                 dtype=np.float32, layout: str = "auto") -> BsrMatrix:
    """CSR -> device BSR, padding the shape up to a block multiple."""
    vals, bcols, brows = _bsr_arrays(m, block, dtype)
    layout = _pick_layout(layout, vals.shape[0], block)
    if layout == "tr":
        vals = np.ascontiguousarray(vals.transpose(1, 2, 0))
    return BsrMatrix(vals=jnp.asarray(vals), bcols=jnp.asarray(bcols),
                     brows=jnp.asarray(brows),
                     n_rows=m.shape[0], n_cols=m.shape[1], layout=layout)


def bsr_stack(mats: list[sp.csr_matrix], block: int = 16,
              dtype=np.float32, select=None,
              layout: str = "auto") -> BsrMatrix:
    """Stack same-shape per-shard CSRs into one BSR with a leading shard
    axis (block patterns padded to the max count; pad blocks are zeros on
    the last block row, keeping brows sorted).

    ``select``: indices of the shards to materialize (multi-host
    local-only setup) — the pad count stays the max over ALL mats so
    every process produces SPMD-consistent shapes."""
    n_rows, n_cols = mats[0].shape
    nrb = -(-n_rows // block)
    sel = list(range(len(mats))) if select is None else list(select)
    parts = {p: _bsr_arrays(mats[p], block, dtype) for p in sel}
    # global pad count: block counts of unselected shards via their nnz
    # pattern only (cheap index pass, no value materialization)
    nb = 0
    for p, m in enumerate(mats):
        if p in parts:
            nb = max(nb, parts[p][0].shape[0])
        else:
            mm = m.tocoo()
            nb = max(nb, np.unique(
                np.stack([mm.row // block, mm.col // block]),
                axis=1).shape[1] if mm.nnz else 0)
    P = len(sel)
    vals = np.zeros((P, nb, block, block), dtype=dtype)
    bcols = np.zeros((P, nb), dtype=np.int32)
    brows = np.full((P, nb), max(nrb - 1, 0), dtype=np.int32)
    for k, p in enumerate(sel):
        v, c, r = parts[p]
        kk = v.shape[0]
        vals[k, :kk] = v
        bcols[k, :kk] = c
        brows[k, :kk] = r
    layout = _pick_layout(layout, nb, block)
    if layout == "tr":
        vals = np.ascontiguousarray(vals.transpose(0, 2, 3, 1))
    return BsrMatrix(vals=jnp.asarray(vals), bcols=jnp.asarray(bcols),
                     brows=jnp.asarray(brows),
                     n_rows=n_rows, n_cols=n_cols, layout=layout)


@jax.tree_util.register_dataclass
@dataclass
class CooMatrix:
    """Row-sorted COO with a gather + sorted-segment-sum SpMV.

    The right form for TRANSFER operators (lattice<->DOF selection Q/Qt,
    AMG prolongation P / restriction R = P^T): their rows carry 1-10
    scattered entries, so 8x8 BSR blocks fill at 2-6% and the padded
    block values dominate HBM (measured at PB_146: Q 2.8 GB, P0/R0
    3.9 GB each as BSR vs 0.1-0.6 GB here). All arrays are 1-D — TPU
    tiling pads them negligibly. Pad entries carry row id n_rows and are
    sliced off after the segment sum."""
    vals: jax.Array       # (nnz,); stacked: (P, nnz)
    cols: jax.Array       # (nnz,) int32
    rows: jax.Array       # (nnz,) int32, sorted ascending
    n_rows: int = field(metadata=dict(static=True), default=0)
    n_cols: int = field(metadata=dict(static=True), default=0)


def _coo_arrays(m: sp.csr_matrix, dtype):
    mm = m.tocoo()
    order = np.argsort(mm.row, kind="stable")
    return (np.asarray(mm.data[order], dtype=dtype),
            mm.col[order].astype(np.int32),
            mm.row[order].astype(np.int32))


def coo_from_csr(m: sp.csr_matrix, dtype=np.float32) -> CooMatrix:
    vals, cols, rows = _coo_arrays(m, dtype)
    return CooMatrix(vals=jnp.asarray(vals), cols=jnp.asarray(cols),
                     rows=jnp.asarray(rows),
                     n_rows=m.shape[0], n_cols=m.shape[1])


def coo_stack(mats: list[sp.csr_matrix], dtype=np.float32,
              select=None) -> CooMatrix:
    """Stack same-shape per-shard CSRs with a leading shard axis (nnz
    padded to the max count; pad entries land on dump row n_rows).
    ``select``: shards to materialize (multi-host local-only setup) —
    the pad count stays the max over ALL mats."""
    n_rows, n_cols = mats[0].shape
    sel = list(range(len(mats))) if select is None else list(select)
    parts = {p: _coo_arrays(mats[p], dtype) for p in sel}
    nnz = max(max((m.nnz for m in mats), default=0),
              max((parts[p][0].shape[0] for p in sel), default=0))
    P = len(sel)
    vals = np.zeros((P, nnz), dtype=dtype)
    cols = np.zeros((P, nnz), dtype=np.int32)
    rows = np.full((P, nnz), n_rows, dtype=np.int32)
    for k, p in enumerate(sel):
        v, c, r = parts[p]
        vals[k, :v.shape[0]] = v
        cols[k, :v.shape[0]] = c
        rows[k, :v.shape[0]] = r
    return CooMatrix(vals=jnp.asarray(vals), cols=jnp.asarray(cols),
                     rows=jnp.asarray(rows),
                     n_rows=n_rows, n_cols=n_cols)


def coo_spmv(mat: CooMatrix, x):
    """y = A x: one flat gather + one sorted segment sum (pad entries
    accumulate into the sliced-off dump row)."""
    prod = mat.vals * x[jnp.clip(mat.cols, 0, mat.n_cols - 1)]
    y = jax.ops.segment_sum(prod, mat.rows,
                            num_segments=mat.n_rows + 1,
                            indices_are_sorted=True)
    return y[:mat.n_rows]


def sparse_spmv(mat, x):
    """Dispatch on the device sparse representation."""
    if isinstance(mat, CooMatrix):
        return coo_spmv(mat, x)
    if isinstance(mat, EllMatrix):
        return ell_spmv(mat, x)
    return bsr_spmv(mat, x)


def bsr_spmv(mat: BsrMatrix, x):
    """y = A x via contiguous block takes + batched matvec + sorted
    segment sum. x has the ORIGINAL column count; returns original rows."""
    B = mat.block
    nrb = -(-mat.n_rows // B)
    ncb = -(-mat.n_cols // B)
    pad = ncb * B - mat.n_cols
    if pad:
        x = jnp.concatenate([x, jnp.zeros((pad,), x.dtype)])
    xb = x.reshape(ncb, B)
    if mat.layout == "tr":
        # chunked over blocks: the (chunk, B) gather/product temporaries
        # are the only 128-padded buffers, bounded to ~0.5 GB each; the
        # big values array stays in its compact (B, B, nb) form
        nb = mat.vals.shape[-1]
        CH = 1 << 21
        y = jnp.zeros((nrb, B), x.dtype)
        for c0 in range(0, nb, CH):
            c1 = min(c0 + CH, nb)
            V = jax.lax.slice_in_dim(mat.vals, c0, c1, axis=2)
            xg = xb[jax.lax.slice_in_dim(mat.bcols, c0, c1, axis=0)]
            prod = jnp.einsum("ijk,kj->ki", V, xg,
                              precision=jax.lax.Precision.HIGHEST)
            y = y + jax.ops.segment_sum(
                prod, jax.lax.slice_in_dim(mat.brows, c0, c1, axis=0),
                num_segments=nrb, indices_are_sorted=True)
        return y.reshape(-1)[:mat.n_rows]
    prod = jnp.einsum("kij,kj->ki", mat.vals, xb[mat.bcols],
                      precision=jax.lax.Precision.HIGHEST)
    y = jax.ops.segment_sum(prod, mat.brows, num_segments=nrb,
                            indices_are_sorted=True)
    return y.reshape(-1)[:mat.n_rows]
