"""Gather + one-hot-MXU SpMM — the uniform-sparsity hot kernel.

Replaces the reference's ``torch.spmm`` (reference layer.py:102,106) in the
regime where :mod:`textgcn_tpu.ops.pallas_spmm`'s BSR kernel cannot win:
graphs whose edges do NOT cluster into dense tiles (uniform random structure,
mean-degree ~10-100). XLA's ``segment_sum`` path there is scatter-bound and
reaches only ~6% of HBM roofline.

TPU-first decomposition of ``Â @ X``:

1. **Gather-scale (XLA):** ``p[e] = val[e] * X[col[e]]`` — the unavoidable
   random read of X rows. XLA's gather kernel is the hardware path for
   512-byte random reads; the multiply and a bf16 downcast fuse into it, so
   the materialized edge-product stream is half-width.
2. **Segment reduce (Pallas):** stream ``p`` **sequentially** (edges are
   row-sorted) in K-edge chunks; each chunk belongs to one W-row output
   window that stays resident in VMEM across consecutive chunks. The
   in-window reduction is a one-hot matmul on the MXU:
   ``out[w] += S @ p_chunk`` with ``S[r, k] = (local_row[k] == r)`` built
   on-the-fly in VMEM. Scatter never touches HBM; Y is written exactly once.

Host-side planning (:func:`build_onehot_plan`) pads the edge stream so no
chunk straddles a window boundary, and groups windows into fixed-size
superchunks so the [E', F] product stream is bounded in HBM (processed under
``lax.scan``).

The backward of ``A @ x`` w.r.t. ``x`` is ``Aᵀ @ g`` — a second plan built
from the transposed COO (shared when A is symmetric, which sym-normalized Â
always is).
"""
from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["col", "val", "lrow", "wloc"],
    meta_fields=["n_nodes", "n_edges", "k", "w", "w_sc", "n_sc", "c_sc"],
)
@dataclasses.dataclass(frozen=True)
class OneHotPlan:
    """Padded, superchunked edge layout for :func:`spmm_onehot`.

    Shapes (all leading dim = n_sc superchunks):
      col:  [n_sc, c_sc*k] int32 — gather indices (phantom edges point at 0)
      val:  [n_sc, c_sc*k] float32 — edge weights (phantom edges are 0)
      lrow: [n_sc, c_sc, k] int32 — row index local to the chunk's window;
            phantom edges carry ``w`` (one past the window) so their one-hot
            column is all zeros.
      wloc: [n_sc, c_sc] int32 — window id local to the superchunk,
            non-decreasing within each superchunk.
    Static:
      k: edges per chunk (grid step);  w: output rows per window;
      w_sc: windows per superchunk;    c_sc: chunks per superchunk.
    """

    col: jnp.ndarray
    val: jnp.ndarray
    lrow: jnp.ndarray
    wloc: jnp.ndarray
    n_nodes: int
    n_edges: int
    k: int
    w: int
    w_sc: int
    n_sc: int
    c_sc: int


def choose_onehot_k(
    row: np.ndarray,
    n_nodes: int,
    w: int = 512,
    f_hint: int = 256,
    max_pad_frac: float = 0.10,
) -> int:
    """Largest chunk size in {4096, 2048, 1024, 512} whose phantom-edge
    padding stays under ``max_pad_frac`` (each window's edges pad to a
    chunk multiple; padded slots still gather).

    Bigger k halves grid steps AND — decisively — keeps dense streams in
    ONE superchunk: the R8 docword one-hot pass measured 37.7 ms at
    k=2048/n_sc=2 vs 23.1 ms = 83% of the gather wall at k=4096/n_sc=1
    (the lax.scan over superchunks serializes gather and reduce stages).
    Sparse streams (the hybrid residual: tens of edges per window chunk)
    would pay multi-x phantom gathers at large k, so k must follow the
    per-window occupancy. k=4096 is capped to f_hint ≤ 256 lanes (the
    [k, f_pad] product block must fit VMEM double-buffered next to the
    [w, k] one-hot matrix; k=8192 at f=256 measured a VMEM OOM).
    """
    row = np.asarray(row, dtype=np.int64)
    e = max(len(row), 1)
    n_win = max(1, -(-n_nodes // w))
    counts = np.bincount(row // w, minlength=n_win)
    k_max = 4096 if f_hint <= 256 else 2048
    for k in (4096, 2048, 1024, 512):
        if k > k_max:
            continue
        padded = int((np.maximum(-(-counts // k), 1) * k).sum())
        if padded - e <= max_pad_frac * e:
            return k
    return 512


def build_onehot_plan(
    row: np.ndarray,
    col: np.ndarray,
    val: np.ndarray,
    n_nodes: int,
    k: int = 2048,
    w: int = 512,
    max_p_bytes: int = 1 << 30,
    f_hint: int = 256,
) -> OneHotPlan:
    """Host-side planner. ``row`` need not be pre-sorted.

    Args:
      k: chunk size (edges per Pallas grid step), multiple of 128.
      w: window size (output rows resident in VMEM), multiple of 8.
      max_p_bytes: bound on the bf16 [E_sc, F] product stream per superchunk
        (assuming features of width ``f_hint``); sets the lax.scan chunking.
    """
    assert k % 128 == 0 and w % 8 == 0
    row = np.asarray(row, dtype=np.int64)
    col = np.asarray(col, dtype=np.int64)
    val = np.asarray(val, dtype=np.float64)
    order = np.argsort(row, kind="stable")
    row, col, val = row[order], col[order], val[order]

    n_win = max(1, -(-n_nodes // w))
    counts = np.bincount(row // w, minlength=n_win).astype(np.int64)
    chunks_per_win = np.maximum(1, -(-counts // k))

    # superchunk sizing: fixed windows-per-superchunk so output offsets are
    # static; bound the per-superchunk bf16 product stream
    mean_chunk_bytes = k * _round_up(f_hint, 128) * 2
    total_bytes = int(chunks_per_win.sum()) * mean_chunk_bytes
    n_sc = max(1, -(-total_bytes // max_p_bytes))
    w_sc = -(-n_win // n_sc)
    n_sc = -(-n_win // w_sc)

    # chunks per superchunk = max over superchunks (others pad with phantoms)
    sc_of_win = np.arange(n_win) // w_sc
    c_per_sc = np.bincount(
        sc_of_win, weights=chunks_per_win, minlength=n_sc
    ).astype(np.int64)
    c_sc = int(c_per_sc.max())

    # vectorized scatter of the edge stream into its padded layout:
    # window wi's edges sit contiguously starting at chunk boundary
    # (global chunk offset of wi, rebased to its superchunk) * k
    ck = c_sc * k
    src_off = np.concatenate([[0], np.cumsum(counts)])
    chunk_off = np.concatenate([[0], np.cumsum(chunks_per_win)])  # global
    sc_chunk_off = np.concatenate([[0], np.cumsum(c_per_sc)])
    win_pe = np.repeat(np.arange(n_win), counts)  # window of each edge
    idx_in_win = np.arange(len(row)) - src_off[win_pe]
    sc_pe = sc_of_win[win_pe]
    base = (chunk_off[win_pe] - sc_chunk_off[sc_pe]) * k
    dst = sc_pe * ck + base + idx_in_win

    out_col = np.zeros(n_sc * ck, dtype=np.int32)
    out_val = np.zeros(n_sc * ck, dtype=np.float32)
    out_lrow = np.full(n_sc * ck, w, dtype=np.int32)
    out_col[dst] = col
    out_val[dst] = val
    out_lrow[dst] = row - win_pe.astype(np.int64) * w
    out_col = out_col.reshape(n_sc, ck)
    out_val = out_val.reshape(n_sc, ck)
    out_lrow = out_lrow.reshape(n_sc, ck)

    # chunk -> local window id; phantom chunks keep the superchunk's last
    # local window (already visited: windows ascend), accumulating zeros
    win_of_chunk = np.repeat(np.arange(n_win), chunks_per_win)
    sc_of_chunk = sc_of_win[win_of_chunk]
    pos_in_sc = np.arange(len(win_of_chunk)) - sc_chunk_off[sc_of_chunk]
    last_local = (
        np.minimum((np.arange(n_sc) + 1) * w_sc, n_win) - 1 - np.arange(n_sc) * w_sc
    )
    out_wloc = np.repeat(
        np.maximum(last_local, 0)[:, None], c_sc, axis=1
    ).astype(np.int32)
    out_wloc[sc_of_chunk, pos_in_sc] = (win_of_chunk - sc_of_chunk * w_sc).astype(
        np.int32
    )

    return OneHotPlan(
        col=jnp.asarray(out_col),
        val=jnp.asarray(out_val),
        lrow=jnp.asarray(out_lrow.reshape(n_sc, c_sc, k)),
        wloc=jnp.asarray(out_wloc),
        n_nodes=int(n_nodes),
        n_edges=int(len(row)),
        k=int(k),
        w=int(w),
        w_sc=int(w_sc),
        n_sc=int(n_sc),
        c_sc=int(c_sc),
    )


def _onehot_kernel(wloc_ref, lrow_ref, p_ref, o_ref, *, w: int):
    i = pl.program_id(0)
    is_new = jnp.logical_or(
        i == 0, wloc_ref[jnp.maximum(i - 1, 0)] != wloc_ref[i]
    )

    @pl.when(is_new)
    def _():
        o_ref[...] = jnp.zeros_like(o_ref)

    k = lrow_ref.shape[-1]
    rows = jax.lax.broadcasted_iota(jnp.int32, (w, k), 0)
    s = (rows == lrow_ref[0]).astype(p_ref.dtype)
    o_ref[...] += jax.lax.dot(
        s, p_ref[...], preferred_element_type=jnp.float32
    )


def _onehot_kernel_base(wloc_ref, lrow_ref, base_ref, p_ref, o_ref, *, w: int):
    """One-hot reduce that ACCUMULATES ONTO a base: each window initializes
    from ``base_ref`` (same index map as the output) instead of zeros.
    Fuses the hybrid layout's ``bsr_out + onehot_out`` add into the
    residual kernel — the [n_pad, F] f32 add's read+read+write never
    touches HBM as a separate op."""
    i = pl.program_id(0)
    is_new = jnp.logical_or(
        i == 0, wloc_ref[jnp.maximum(i - 1, 0)] != wloc_ref[i]
    )

    @pl.when(is_new)
    def _():
        o_ref[...] = base_ref[...]

    k = lrow_ref.shape[-1]
    rows = jax.lax.broadcasted_iota(jnp.int32, (w, k), 0)
    s = (rows == lrow_ref[0]).astype(p_ref.dtype)
    o_ref[...] += jax.lax.dot(
        s, p_ref[...], preferred_element_type=jnp.float32
    )


def _reduce_call(p, lrow, wloc, *, k, w, w_sc, c_sc, interpret, base=None):
    """One Pallas call: [c_sc*k, F] products -> [w_sc*w, F] output rows.

    With ``base`` ([w_sc*w, F] f32), windows initialize from it instead
    of zeros (fused accumulate — see :func:`_onehot_kernel_base`). Shared
    by the resident-plan path (:func:`_spmm_onehot_impl`) and the sorted
    edge-stream path (:mod:`textgcn_tpu.ops.streamed_sorted`), which
    reduces each streamed chunk into a window range of its beyond-HBM
    accumulator.
    """
    f_pad = p.shape[-1]
    # Mosaic block shapes: last two dims must be (8k, 128k)-aligned or match
    # the array — a unit middle dim satisfies that for the per-chunk row ids
    lrow = lrow.reshape(c_sc, 1, k)
    in_specs = [
        pl.BlockSpec((1, 1, k), lambda i, wloc: (i, 0, 0)),
        pl.BlockSpec((k, f_pad), lambda i, wloc: (i, 0)),
    ]
    args = (wloc, lrow, p)
    kernel = partial(_onehot_kernel, w=w)
    base_bytes = 0
    if base is not None:
        in_specs = [
            in_specs[0],
            pl.BlockSpec((w, f_pad), lambda i, wloc: (wloc[i], 0)),
            in_specs[1],
        ]
        args = (wloc, lrow, base, p)
        kernel = partial(_onehot_kernel_base, w=w)
        base_bytes = w_sc * w * f_pad * 4
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(c_sc,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((w, f_pad), lambda i, wloc: (wloc[i], 0)),
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((w_sc * w, f_pad), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * c_sc * w * k * f_pad,
            bytes_accessed=c_sc * k * f_pad * p.dtype.itemsize
            + w_sc * w * f_pad * 4 + base_bytes,
            transcendentals=0,
        ),
        interpret=interpret,
    )(*args)


def _spmm_onehot_impl(
    plan: OneHotPlan,
    x,
    interpret: bool = False,
    *,
    xp_padded=None,
    base=None,
    keep_padded: bool = False,
):
    """A @ x through the gather + one-hot-MXU pipeline.

    Keyword extensions for the hybrid fast path (graph/reorder.py):
      xp_padded: pre-padded/cast [>=n, f_pad] feature table shared with
        the BSR leg (skips this impl's own pad+downcast; extra rows
        beyond the plan's cols are never gathered).
      base: [w_sc*w, f_pad] f32 — windows initialize from it instead of
        zeros, fusing the two legs' add (requires n_sc == 1).
      keep_padded: return the padded [w_sc*w, f_pad] f32 output without
        the [:n, :f] slice (requires n_sc == 1).
    """
    n, f = plan.n_nodes, x.shape[-1]
    f_pad = _round_up(f, 128)
    if xp_padded is not None:
        xp = xp_padded
        f_pad = xp.shape[-1]
    else:
        xp = x if f == f_pad else jnp.pad(x, ((0, 0), (0, f_pad - f)))
        # gather from a bf16 copy: the random-row gather is byte-bound, so
        # one cheap streaming downcast of X halves the dominant traffic;
        # the edge product is bf16 anyway (f32 accumulation in the MXU
        # reduce)
        xp = xp.astype(jnp.bfloat16)
    val16 = plan.val.astype(jnp.bfloat16)
    if (base is not None or keep_padded) and plan.n_sc != 1:
        raise ValueError("base/keep_padded need a single-superchunk plan")

    def one(col_s, val_s, lrow_s, wloc_s, base_s=None):
        p = xp[col_s] * val_s[:, None].astype(xp.dtype)
        return _reduce_call(
            p, lrow_s, wloc_s, k=plan.k, w=plan.w, w_sc=plan.w_sc,
            c_sc=plan.c_sc, interpret=interpret, base=base_s,
        )

    if plan.n_sc == 1:
        y = one(plan.col[0], val16[0], plan.lrow[0], plan.wloc[0], base)
        if keep_padded:
            return y
    else:
        # Multi-superchunk stages cost ~45% extra regardless of loop
        # construct (R8 docword forced to n_sc=3: 33.3 ms unrolled,
        # 33.5 ms scanned, vs 22.7 ms single-superchunk at the SAME k)
        # — the split itself is the penalty, so the planner maximizes
        # max_p_bytes headroom and n_sc=1 is the hot configuration;
        # the scan here only serves genuinely beyond-budget streams.
        _, ys = jax.lax.scan(
            lambda c, args: (c, one(*args)),
            None,
            (plan.col, val16, plan.lrow, plan.wloc),
        )
        y = ys.reshape(plan.n_sc * plan.w_sc * plan.w, f_pad)
    return y[:n, :f]


@partial(jax.custom_vjp, nondiff_argnums=(3,))
def spmm_onehot(plan_fwd: OneHotPlan, plan_bwd: OneHotPlan, x, interpret=False):
    """``A @ x`` via the gather + one-hot-MXU kernel.

    Differentiable in ``x``: the cotangent is ``Aᵀ @ g`` computed with
    ``plan_bwd`` (pass the forward plan again when A is symmetric). Plans are
    constants (adjacency weights are not trained), mirroring
    :func:`textgcn_tpu.ops.spmm.spmm_coo_segment`.
    """
    return _spmm_onehot_impl(plan_fwd, x, interpret)


def _fwd(plan_fwd, plan_bwd, x, interpret):
    return _spmm_onehot_impl(plan_fwd, x, interpret), plan_bwd


def _bwd(interpret, plan_bwd, g):
    return None, None, _spmm_onehot_impl(plan_bwd, g, interpret)


spmm_onehot.defvjp(_fwd, _bwd)

# jit at definition (interpret is static): direct eager calls would
# otherwise dispatch the scan/gather op-by-op — ruinous through a tunnel
spmm_onehot = jax.jit(spmm_onehot, static_argnums=(3,))


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["fwd", "bwd"],
    meta_fields=["n_nodes", "n_edges", "symmetric"],
)
@dataclasses.dataclass(frozen=True)
class OneHotGraph:
    """Graph container dispatching SpMM to the one-hot kernel.

    ``bwd`` is the transpose plan; for symmetric A it aliases ``fwd`` (no
    extra memory — same pytree leaves).
    """

    fwd: OneHotPlan
    bwd: OneHotPlan
    n_nodes: int
    n_edges: int
    symmetric: bool

    @staticmethod
    def from_coo(
        row: np.ndarray,
        col: np.ndarray,
        val: np.ndarray,
        n_nodes: int,
        symmetric: bool = False,
        k: int = None,
        w: int = 512,
        max_p_bytes: int = 2 << 30,
        f_hint: int = 256,
    ) -> "OneHotGraph":
        """``k=None`` (default) picks the chunk size from the per-window
        edge occupancy (:func:`choose_onehot_k`) — dense streams get
        k=4096 single-superchunk plans, sparse residuals small chunks."""
        if k is None:
            k = choose_onehot_k(row, n_nodes, w=w, f_hint=f_hint)
        fwd = build_onehot_plan(
            row, col, val, n_nodes, k=k, w=w, max_p_bytes=max_p_bytes,
            f_hint=f_hint,
        )
        bwd = (
            fwd
            if symmetric
            else build_onehot_plan(
                col, row, val, n_nodes, k=k, w=w, max_p_bytes=max_p_bytes,
                f_hint=f_hint,
            )
        )
        return OneHotGraph(
            fwd=fwd,
            bwd=bwd,
            n_nodes=int(n_nodes),
            n_edges=fwd.n_edges,
            symmetric=bool(symmetric),
        )

    @staticmethod
    def from_sparse_graph(g, symmetric: bool = False, **kw) -> "OneHotGraph":
        e = g.n_edges
        return OneHotGraph.from_coo(
            np.asarray(g.row)[:e],
            np.asarray(g.col)[:e],
            np.asarray(g.val)[:e],
            g.n_nodes,
            symmetric=symmetric,
            **kw,
        )
