"""Pallas TPU kernel: fused basis-mix R-GCN message + block-CSR segment-sum.

The R-GCN hot loop (/root/reference/models.py:200-202 via PyG RGCNConv) is
gather -> relation-typed transform -> scatter-mean. On this jax/Mosaic stack
the data-dependent gather/scatter themselves CANNOT be expressed efficiently
in Pallas (`tpu.dynamic_gather` is single-vreg only; there is no scatter
lowering at all — see kernels/README.md for the measurements), so XLA's
native emitters keep the gather. What CAN be fused into one kernel is
everything between: the per-edge basis mixing, the message matmul, the edge
masking and the segment reduction — with the reduction expressed as an
indicator matmul over host-aligned edge blocks instead of a scatter:

  * the host sorts edges by destination and packs them into fixed blocks of
    `eblk` edges such that every block only targets one aligned chunk of
    `rows` output rows (power-law rows simply span several consecutive
    blocks of the same chunk);
  * the kernel computes msg = (att_e ⊗ xs) @ basis on the MXU, then
    out_chunk += indicatorᵀ @ msg — also an MXU matmul — accumulating
    across consecutive blocks of the same chunk via output-block revisiting.

Training-capable: rgcn_aggregate_pallas carries a custom_vjp whose forward
is the Pallas kernel and whose backward is the plain XLA formulation (the
op is linear in x/att/basis, so the transpose is a dst-gather plus two
matmuls XLA handles well). The XLA strategies in models/rgcn.py remain the
default production path (see README.md).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


def pallas_available() -> bool:
    try:
        from jax.experimental import pallas as pl  # noqa: F401
        from jax.experimental.pallas import tpu as pltpu  # noqa: F401

        return True
    except ImportError:
        return False


# ---------------------------------------------------------------------------
# Host-side block alignment
# ---------------------------------------------------------------------------

def block_align_edges(
    edge_src: np.ndarray,
    edge_dst: np.ndarray,
    edge_type: np.ndarray,
    edge_mask: np.ndarray,
    num_nodes: int,
    eblk: int = 1024,  # 1-D int32 operands must match the T(1024) XLA tiling
    rows: int = 256,
    num_blocks: Optional[int] = None,
    edge_canon: Optional[np.ndarray] = None,
    ukey_vals: Optional[np.ndarray] = None,
):
    """Sort/pad edges into dst-aligned blocks for the Pallas kernel.

    Returns (src, dst_local, etype, mask, chunk_of_block, first_of_chunk,
    n_blocks, ukey): edge arrays of shape [n_blocks*eblk]; block b only
    contains edges whose dst lies in chunk `chunk_of_block[b]` (rows
    [c*rows, (c+1)*rows)); blocks of one chunk are consecutive and
    `first_of_chunk[b]` marks the first (for output-accumulator init).

    `edge_canon` (the undirected-pair ids of GraphBatch.edge_canon) enables
    training-time edge dropout on the Pallas path: `ukey` carries
    pair*2 + (src<dst) — the same directed-edge dropout key convention as
    the blocked plans (ops/blocked.py plan_blocked_edges) — so the keep
    decision can be recomputed on device per step as a stateless hash.
    Without it, ukey is None and dropout is rejected at forward time.

    `ukey_vals`: precomputed per-edge key values to carry instead of the
    canon-derived ones — used by block_align_edges_transposed, where
    src/dst arrive swapped and the direction bit must still refer to the
    ORIGINAL orientation so both plans drop the same edges.
    """
    assert num_nodes % rows == 0, (num_nodes, rows)
    real = np.nonzero(edge_mask)[0]
    order = real[np.argsort(edge_dst[real], kind="stable")]
    dst_sorted = edge_dst[order]
    chunk_ids = dst_sorted // rows

    # per-chunk edge counts -> per-chunk block counts
    n_chunks = num_nodes // rows
    counts = np.bincount(chunk_ids, minlength=n_chunks)
    blocks_per_chunk = np.maximum(1, -(-counts // eblk))
    n_blocks = int(blocks_per_chunk.sum())
    if num_blocks is not None:
        if n_blocks > num_blocks:
            raise ValueError(f"need {n_blocks} blocks > requested {num_blocks}")
        # distribute the extra blocks to chunk 0 (they hold only padding)
        blocks_per_chunk[0] += num_blocks - n_blocks
        n_blocks = num_blocks

    E = n_blocks * eblk
    src = np.zeros(E, np.int32)
    dstl = np.zeros(E, np.int32)
    etyp = np.zeros(E, np.int32)
    mask = np.zeros(E, np.float32)
    make_ukey = edge_canon is not None or ukey_vals is not None
    ukey = np.zeros(E, np.int32) if make_ukey else None
    chunk_of_block = np.zeros(n_blocks, np.int32)
    first_of_chunk = np.zeros(n_blocks, np.int32)

    starts = np.concatenate([[0], np.cumsum(counts)])
    b = 0
    for c in range(n_chunks):
        es, ee = starts[c], starts[c + 1]
        idx = order[es:ee]
        for k in range(int(blocks_per_chunk[c])):
            sub = idx[k * eblk : (k + 1) * eblk]
            n = len(sub)
            o = b * eblk
            src[o : o + n] = edge_src[sub]
            dstl[o : o + n] = edge_dst[sub] - c * rows
            etyp[o : o + n] = edge_type[sub]
            mask[o : o + n] = 1.0
            if ukey is not None:
                ukey[o : o + n] = (
                    ukey_vals[sub] if ukey_vals is not None
                    else edge_canon[sub] * 2
                    + (edge_src[sub] < edge_dst[sub]))
            chunk_of_block[b] = c
            first_of_chunk[b] = 1 if k == 0 else 0
            b += 1
    return (src, dstl, etyp, mask, chunk_of_block, first_of_chunk, n_blocks,
            ukey)


def block_align_edges_transposed(
    edge_src: np.ndarray,
    edge_dst: np.ndarray,
    edge_type: np.ndarray,
    edge_mask: np.ndarray,
    num_nodes: int,
    eblk: int = 1024,
    rows: int = 256,
    num_blocks: Optional[int] = None,
    edge_canon: Optional[np.ndarray] = None,
):
    """SRC-sorted alignment: the same packing with src/dst roles swapped.

    The backward dx of the aggregate is structurally the forward with
    src<->dst exchanged (scatter to src of basis-mixed g[dst]), so the same
    Pallas kernel computes it given blocks aligned on SRC chunks. In the
    returned tuple, element 0 gathers from the ORIGINAL dst (the cotangent
    rows) and element 1 is the ORIGINAL src local to its chunk (the dx
    scatter target). ukey still keys the ORIGINAL direction so both plans
    recompute identical dropout masks on device.
    """
    uv = None
    if edge_canon is not None:
        uv = (edge_canon * 2 + (edge_src < edge_dst)).astype(np.int32)
    return block_align_edges(
        edge_dst, edge_src, edge_type, edge_mask, num_nodes,
        eblk=eblk, rows=rows, num_blocks=num_blocks, ukey_vals=uv)


# ---------------------------------------------------------------------------
# The kernel
# ---------------------------------------------------------------------------

def _kernel(chunk_ref, first_ref, xs_ref, ae_ref, dstl_ref, mask_ref,
            basis_ref, out_ref, *, rows: int):
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    b = pl.program_id(0)
    xs = xs_ref[:]                       # [eblk, Cin]
    ae = ae_ref[:]                       # [eblk, B]
    eblk, cin = xs.shape
    nb = ae.shape[1]
    # msg = sum_b ae[:, b] * (xs @ basis_b)  — B static small matmuls
    # (Mosaic cannot collapse a [eblk, B, Cin] intermediate into 2-D).
    msg = None
    for bi in range(nb):
        h = jnp.dot(xs, basis_ref[bi * cin : (bi + 1) * cin, :],
                    preferred_element_type=jnp.float32)
        term = ae[:, bi][:, None] * h
        msg = term if msg is None else msg + term
    msg = msg * mask_ref[:][:, None]     # [eblk, Cout]

    row_ids = jax.lax.broadcasted_iota(jnp.int32, (eblk, rows), 1)
    onehot = (dstl_ref[:][:, None] == row_ids).astype(jnp.float32)

    contrib = jax.lax.dot_general(      # [rows, Cout] = onehot^T @ msg
        onehot, msg, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(first_ref[b] == 1)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    out_ref[:] += contrib


@functools.partial(jax.jit, static_argnames=("rows", "num_nodes", "interpret"))
def _aggregate_fwd(xs, ae, dstl, mask, basis_flat, chunk_of_block,
                   first_of_chunk, *, rows: int, num_nodes: int,
                   interpret: bool = False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n_blocks = chunk_of_block.shape[0]
    eblk = xs.shape[0] // n_blocks
    cout = basis_flat.shape[1]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,  # chunk_of_block, first_of_chunk
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((eblk, xs.shape[1]), lambda b, c, f: (b, 0)),
            pl.BlockSpec((eblk, ae.shape[1]), lambda b, c, f: (b, 0)),
            pl.BlockSpec((eblk,), lambda b, c, f: (b,)),
            pl.BlockSpec((eblk,), lambda b, c, f: (b,)),
            pl.BlockSpec(basis_flat.shape, lambda b, c, f: (0, 0)),
        ],
        out_specs=pl.BlockSpec((rows, cout), lambda b, c, f: (c[b], 0)),
    )
    return pl.pallas_call(
        functools.partial(_kernel, rows=rows),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((num_nodes, cout), jnp.float32),
        interpret=interpret,
    )(chunk_of_block, first_of_chunk, xs, ae, dstl, mask, basis_flat)


def _bwd_kernel(chunk_ref, first_ref, gv_ref, xs_ref, ae_ref, dstl_ref,
                mask_ref, basisT_ref, dx_ref, dae_ref, dbasis_ref,
                *, rows: int):
    """One pass over src-sorted blocks computes ALL THREE gradients:

      dx chunk   += onehot(src_local)ᵀ @ (Σ_b ae_b · (gv @ basis_bᵀ))  (MXU)
      dae[b, e]   = ⟨gv_e @ basis_bᵀ, xs_e⟩   (per-edge, summed by type
                    outside — datt is a tiny [R, B] XLA segment-sum)
      dbasis_b   += (ae_b · xs)ᵀ @ gv                                   (MXU)

    where gv = g[dst]·mask is the masked cotangent gather (done in XLA,
    like the forward's x[src]). The t_b = gv @ basis_bᵀ intermediates are
    shared between dx and dae, and nothing per-edge ever leaves VMEM."""
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    b = pl.program_id(0)
    gv = gv_ref[:] * mask_ref[:][:, None]   # [eblk, Cout]
    xs = xs_ref[:]                          # [eblk, Cin]
    ae = ae_ref[:]                          # [eblk, B]
    eblk, cin = xs.shape
    cout = gv.shape[1]
    nb = ae.shape[1]

    dxs = None
    dae_rows = []
    for bi in range(nb):
        t = jnp.dot(gv, basisT_ref[bi * cout : (bi + 1) * cout, :],
                    preferred_element_type=jnp.float32)   # [eblk, Cin]
        term = ae[:, bi][:, None] * t
        dxs = term if dxs is None else dxs + term
        dae_rows.append(jnp.sum(t * xs, axis=1))          # [eblk]
    dae_ref[:] = jnp.stack(dae_rows, axis=0)              # [B, eblk]

    row_ids = jax.lax.broadcasted_iota(jnp.int32, (eblk, rows), 1)
    onehot = (dstl_ref[:][:, None] == row_ids).astype(jnp.float32)
    contrib = jax.lax.dot_general(        # [rows, Cin] = onehotᵀ @ dxs
        onehot, dxs, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(first_ref[b] == 1)
    def _():
        dx_ref[:] = jnp.zeros_like(dx_ref)

    dx_ref[:] += contrib

    @pl.when(b == 0)
    def _():
        dbasis_ref[:] = jnp.zeros_like(dbasis_ref)

    for bi in range(nb):
        db = jax.lax.dot_general(         # [Cin, Cout] = (ae_b·xs)ᵀ @ gv
            ae[:, bi][:, None] * xs, gv, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        dbasis_ref[bi * cin : (bi + 1) * cin, :] += db


@functools.partial(jax.jit,
                   static_argnames=("rows", "num_nodes_out", "interpret"))
def _aggregate_bwd(gv, xs, ae, dstl, mask, basisT_flat, chunk_of_block,
                   first_of_chunk, *, rows: int, num_nodes_out: int,
                   interpret: bool = False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n_blocks = chunk_of_block.shape[0]
    eblk = gv.shape[0] // n_blocks
    cin = xs.shape[1]
    cout = gv.shape[1]
    nb = ae.shape[1]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((eblk, cout), lambda b, c, f: (b, 0)),
            pl.BlockSpec((eblk, cin), lambda b, c, f: (b, 0)),
            pl.BlockSpec((eblk, nb), lambda b, c, f: (b, 0)),
            pl.BlockSpec((eblk,), lambda b, c, f: (b,)),
            pl.BlockSpec((eblk,), lambda b, c, f: (b,)),
            pl.BlockSpec(basisT_flat.shape, lambda b, c, f: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((rows, cin), lambda b, c, f: (c[b], 0)),
            pl.BlockSpec((nb, eblk), lambda b, c, f: (0, b)),
            pl.BlockSpec((nb * cin, cout), lambda b, c, f: (0, 0)),
        ],
    )
    return pl.pallas_call(
        functools.partial(_bwd_kernel, rows=rows),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((num_nodes_out, cin), jnp.float32),
            jax.ShapeDtypeStruct((nb, n_blocks * eblk), jnp.float32),
            jax.ShapeDtypeStruct((nb * cin, cout), jnp.float32),
        ],
        interpret=interpret,
    )(chunk_of_block, first_of_chunk, gv, xs, ae, dstl, mask, basisT_flat)


def _dst_global(aligned, rows: int):
    """Reconstruct global dst ids from (dst_local, chunk_of_block)."""
    src, dstl, etyp, mask, chunk_of_block, first_of_chunk = aligned[:6]
    n_blocks = chunk_of_block.shape[0]
    eblk = src.shape[0] // n_blocks
    chunk_per_edge = jnp.repeat(chunk_of_block, eblk)
    return dstl + chunk_per_edge * rows


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def rgcn_aggregate_pallas(x, att, basis, aligned, rows: int,
                          num_nodes: int, interpret: bool = False):
    """Fused masked segment-SUM of basis-mixed messages over aligned blocks.

    x [N, Cin] node features; att [R, B]; basis [B, Cin, Cout];
    `aligned` = (src, dst_local, etype, mask, chunk_of_block, first_of_chunk
    [, ukey]) from block_align_edges (device arrays; a 7th ukey element —
    the dropout key stream — is carried by training batches and ignored
    here: callers fold dropout into `mask` before the call). Returns
    [num_nodes, Cout] sums (divide by degree outside for mean). Gathers
    stay in XLA; everything else is one Pallas kernel. Differentiable in
    x/att/basis (custom_vjp with an XLA backward).
    """
    src, dstl, etyp, mask, chunk_of_block, first_of_chunk = aligned[:6]
    nb, cin, cout = basis.shape
    xs = x[src]                     # XLA gather
    ae = att[etyp]                  # XLA gather
    return _aggregate_fwd(
        xs, ae, dstl, mask, basis.reshape(nb * cin, cout),
        chunk_of_block, first_of_chunk,
        rows=rows, num_nodes=num_nodes, interpret=interpret,
    )


def _aggregate_vjp_fwd(x, att, basis, aligned, rows, num_nodes, interpret):
    out = rgcn_aggregate_pallas(x, att, basis, aligned, rows, num_nodes,
                                interpret)
    return out, (x, att, basis, aligned)


def _aggregate_vjp_bwd(rows, num_nodes, interpret, res, g):
    """XLA backward: the op is linear — per-edge grad is a dst-gather of g,
    then the transposed basis-mix matmuls and segment-sums."""
    x, att, basis, aligned = res
    src, dstl, etyp, mask, chunk_of_block, first_of_chunk = aligned[:6]
    nb, cin, cout = basis.shape
    dst = _dst_global(aligned, rows)

    gmsg = g[dst] * mask[:, None]                      # [Ep, Cout]
    xs = x[src]                                        # [Ep, Cin]
    ae = att[etyp]                                     # [Ep, B]
    bflat = basis.reshape(nb * cin, cout)

    dz = gmsg @ bflat.T                                # [Ep, B*Cin]
    dz3 = dz.reshape(-1, nb, cin)
    # d xs = sum_b ae_b * dz_b ; scatter back to x rows
    dxs = jnp.einsum("eb,ebi->ei", ae, dz3)
    dx = jax.ops.segment_sum(dxs, src, num_segments=x.shape[0])
    # d ae = <dz_b, xs> ; scatter back to att rows
    dae = jnp.einsum("ebi,ei->eb", dz3, xs)
    datt = jax.ops.segment_sum(dae, etyp, num_segments=att.shape[0])
    # d basis = z^T @ gmsg with z = ae ⊗ xs
    z = (ae[:, :, None] * xs[:, None, :]).reshape(-1, nb * cin)
    dbasis = (z.T @ gmsg).reshape(nb, cin, cout)
    return dx, datt, dbasis, None


rgcn_aggregate_pallas.defvjp(_aggregate_vjp_fwd, _aggregate_vjp_bwd)


# ---------------------------------------------------------------------------
# Training variant: Pallas forward AND Pallas backward (src-sorted twin plan)
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def rgcn_aggregate_pallas_train(x, att, basis, aligned, aligned_t,
                                rows: int, num_nodes: int,
                                interpret: bool = False):
    """rgcn_aggregate_pallas with a PALLAS backward.

    `aligned_t` is the src-sorted twin plan (block_align_edges_transposed):
    the dx scatter-to-src is the same indicator-matmul kernel with roles
    swapped, and datt/dbasis fall out of the same pass (no [E, B·Cin]
    intermediate ever leaves VMEM — the XLA-backward variant materializes
    one, kernels/README.md round-5 measurements). Both plans' masks must
    carry identical dropout keeps (callers fold the stateless hash into
    each mask before the call — models/igmc.py does)."""
    src, dstl, etyp, mask, chunk_of_block, first_of_chunk = aligned[:6]
    nb, cin, cout = basis.shape
    xs = x[src]
    ae = att[etyp]
    return _aggregate_fwd(
        xs, ae, dstl, mask, basis.reshape(nb * cin, cout),
        chunk_of_block, first_of_chunk,
        rows=rows, num_nodes=num_nodes, interpret=interpret,
    )


def _train_vjp_fwd(x, att, basis, aligned, aligned_t, rows, num_nodes,
                   interpret):
    out = rgcn_aggregate_pallas_train(x, att, basis, aligned, aligned_t,
                                      rows, num_nodes, interpret)
    return out, (x, att, basis, aligned_t)


def _train_vjp_bwd(rows, num_nodes, interpret, res, g):
    x, att, basis, aligned_t = res
    gsrc_t, srcl_t, etyp_t, mask_t = aligned_t[:4]
    chunk_t, first_t = aligned_t[4:6]
    nb, cin, cout = basis.shape
    n_blocks = chunk_t.shape[0]
    eblk = gsrc_t.shape[0] // n_blocks

    gv = g[gsrc_t]                                  # cotangent rows @ dst
    src_glob = srcl_t + jnp.repeat(chunk_t, eblk) * rows
    xs = x[src_glob]                                # features @ src
    ae = att[etyp_t]
    basisT = basis.transpose(0, 2, 1).reshape(nb * cout, cin)
    dx, dae, dbasis_flat = _aggregate_bwd(
        gv, xs, ae, srcl_t, mask_t, basisT, chunk_t, first_t,
        rows=rows, num_nodes_out=x.shape[0], interpret=interpret)
    datt = jax.ops.segment_sum(dae.T, etyp_t,
                               num_segments=att.shape[0])   # [R, B]
    dbasis = dbasis_flat.reshape(nb, cin, cout)
    return dx, datt, dbasis, None, None


rgcn_aggregate_pallas_train.defvjp(_train_vjp_fwd, _train_vjp_bwd)
