"""Graph convolution layers as functional param pytrees.

`rgcn_apply` reproduces the math of PyG 1.4.2's RGCNConv — the layer the
reference IGMC stacks four of (/root/reference/models.py:182-184, :200-202):

    W_r  = sum_b att[r, b] * basis[b]                 (basis decomposition)
    m_e  = x[src_e] @ W_{type_e}                      (per-edge message)
    out_i = mean_{e: dst_e = i} m_e + x_i @ root + bias

The mean is over ALL incoming edges (PyG 1.4.2 used a single aggr='mean'
propagate, not per-relation means), and nodes with no incoming edges get 0.
Parameters `basis`/`att` are exposed so the ARR regularizer can read them
exactly as the reference does (/root/reference/train_eval.py:167-174).

Two compute strategies, selected by edge/node balance at trace time:
  * "dispatch": H = einsum(x, W) over all relations — one big MXU matmul of
    [N, in] x [in, R*out] — then a per-edge gather H[type_e, src_e].
    FLOPs ~ N*in*R*out; wins when E >> N*R / (modest R).
  * "per-edge": gather x[src], batched tiny matmuls per edge.
    FLOPs ~ E*in*out; wins for very large R (yahoo_music R=71) with small E.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from ..ops.segment import masked_segment_mean


# ---------------------------------------------------------------------------
# init helpers (torch-parity distributions)
# ---------------------------------------------------------------------------

def _uniform(key, shape, bound):
    return jax.random.uniform(key, shape, minval=-bound, maxval=bound,
                              dtype=jnp.float32)


def rgcn_init(key, in_channels: int, out_channels: int, num_relations: int,
              num_bases: int):
    """PyG-1.4.2 init: every tensor ~ U(±1/sqrt(num_bases * in_channels))."""
    k1, k2, k3, k4 = jax.random.split(key, 4)
    bound = 1.0 / math.sqrt(num_bases * in_channels)
    return {
        "basis": _uniform(k1, (num_bases, in_channels, out_channels), bound),
        "att": _uniform(k2, (num_relations, num_bases), bound),
        "root": _uniform(k3, (in_channels, out_channels), bound),
        "bias": _uniform(k4, (out_channels,), bound),
    }


def rgcn_relation_weights(params):
    """W_r = att @ basis, shape [R, in, out] (what ARR regularizes)."""
    R, B = params["att"].shape
    _, i, o = params["basis"].shape
    w = params["att"] @ params["basis"].reshape(B, i * o)
    return w.reshape(R, i, o)


def rgcn_apply(params, x, edge_src, edge_dst, edge_type, edge_mask,
               num_nodes: int, strategy: str = "auto", aggr: str = "mean",
               compute_dtype=None):
    """Relational graph convolution over a padded edge list.

    `aggr`: 'mean' (PyG 1.4.2 RGCNConv default — mean over ALL incoming
    edges), 'sum', or 'relmean' (Schlichtkrull 1/c_{i,r}: mean within each
    relation, summed across relations).

    `compute_dtype`: optional lower precision (jnp.bfloat16) for the message
    transform + gather — halves the gather/scatter bytes of the hot loop
    (~1.4x measured on v5e); aggregation and the root/bias path stay f32."""
    w = rgcn_relation_weights(params)  # [R, in, out]
    R, Cin, Cout = w.shape
    E = edge_src.shape[0]
    xc = x if compute_dtype is None else x.astype(compute_dtype)
    if compute_dtype is not None:
        w = w.astype(compute_dtype)

    if strategy == "auto":
        # dispatch costs N*R*Cin*Cout MACs (and an R*N-row gather table),
        # basis-mix costs E*B*Cin*Cout MACs but gathers only from N rows.
        strategy = "dispatch" if E >= num_nodes * R // 4 else "basis-mix"

    if strategy == "dispatch":
        # One MXU-sized matmul for every relation's transform of every node,
        # then a single flattened-index gather (one gather op beats the
        # two-level h[type, src] advanced-indexing form on TPU).
        cd = compute_dtype or jnp.float32
        h = jnp.einsum("ni,rio->rno", xc, w,
                       preferred_element_type=cd)  # [R, N, out]
        msg = h.reshape(R * num_nodes, Cout)[edge_type * num_nodes + edge_src]
    elif strategy == "basis-mix":
        # Gather once from the N-row table, mix bases per edge, one MXU
        # matmul [E, B*Cin] @ [B*Cin, Cout]. R-independent: the right shape
        # for many relations (yahoo_music R=71) where the dispatch table
        # (R*N rows) would blow past VMEM.
        xs = xc[edge_src]                              # [E, in]
        ae = params["att"][edge_type].astype(xs.dtype)  # [E, B]
        nb, Cin_, _ = params["basis"].shape
        z = (ae[:, :, None] * xs[:, None, :]).reshape(E, nb * Cin_)
        msg = z @ params["basis"].reshape(nb * Cin_, Cout).astype(xs.dtype)
    else:  # "per-edge": per-edge relation-typed weight gather (reference-shaped)
        xs = xc[edge_src]             # [E, in]
        we = w[edge_type]             # [E, in, out]
        msg = jnp.einsum("ei,eio->eo", xs, we,
                         preferred_element_type=w.dtype)

    msg = msg.astype(jnp.float32)
    if aggr == "mean":
        agg = masked_segment_mean(msg, edge_dst, edge_mask, num_nodes)
    elif aggr == "sum":
        m = edge_mask.astype(msg.dtype)[:, None]
        agg = jax.ops.segment_sum(msg * m, edge_dst, num_segments=num_nodes)
    elif aggr == "relmean":
        # mean within each (dst, relation) bucket, summed over relations
        seg = edge_dst * R + edge_type
        m = edge_mask.astype(msg.dtype)
        s = jax.ops.segment_sum(msg * m[:, None], seg,
                                num_segments=num_nodes * R)
        cnt = jax.ops.segment_sum(m, seg, num_segments=num_nodes * R)
        per_rel = s / jnp.maximum(cnt, 1.0)[:, None]
        agg = per_rel.reshape(num_nodes, R, Cout).sum(axis=1)
    else:
        raise ValueError(f"unknown aggr {aggr}")
    out = agg + x @ params["root"] + params["bias"]
    return out


def rgcn_dense_apply(params, x, edge_src, edge_dst, edge_type,
                     mask_f, mask_r, aggr: str = "mean", compute_dtype=None,
                     per_basis: bool = False):
    """Relational graph convolution over DENSE-BLOCKED batches (batching/
    dense.py): x is [B, n, C], edges are FORWARD-only [B, E] graph-local
    indices, and messages flow in both directions (the reverse direction is
    the transposed contraction of the same stored edges).

    Same math as rgcn_apply, different execution: the per-edge gather and
    the segment scatter both become batched one-hot matmuls —

        gather:  xs  = src_onehot @ x                       [B,E,n]@[B,n,C]
        mix:     t   = (att[type] * mask) outer xs          [B,E,nb*C]
        scatter: z   = dst_onehotT @ t                      [B,n,E]@[B,E,nb*C]
        project: agg = z @ basis.reshape(nb*C, out)

    — every FLOP lands on the MXU; there is no serial row addressing in the
    forward OR the backward (the transpose of a matmul is a matmul). This is
    ~30x faster end-to-end than the flat segment formulation on v5e at IGMC
    shapes (bench.py), at the cost of O(B*E*n) extra MAC work that the MXU
    absorbs.

    `mask_f` / `mask_r`: float/bool [B, E] keep-masks per direction (edge
    dropout may differ between directions unless force_undirected).
    """
    B, n, Cin = x.shape
    nb, _, Cout = params["basis"].shape
    R = params["att"].shape[0]
    cd = compute_dtype or jnp.float32

    mf = mask_f.astype(cd)
    mr = mask_r.astype(cd)
    # NOTE: the one-hots are layer-invariant, but hoisting them out of the
    # layer loop (with or without an optimization_barrier) measured equal
    # or slower — XLA's own rematerialization schedule is already optimal
    # here (results_archive/dense_strategy_study_r05/probe_hoist.log).
    src_oh = jax.nn.one_hot(edge_src, n, dtype=cd)   # [B, E, n]
    dst_oh = jax.nn.one_hot(edge_dst, n, dtype=cd)
    rel_oh = jax.nn.one_hot(edge_type, R, dtype=cd)  # [B, E, R]
    att_e = rel_oh @ params["att"].astype(cd)        # [B, E, nb] (MXU gather)

    xc = x.astype(cd)
    xs = jnp.einsum("ben,bnc->bec", src_oh, xc)      # x[src] via matmul
    xd = jnp.einsum("ben,bnc->bec", dst_oh, xc)

    if aggr == "relmean":
        # Schlichtkrull 1/c_{i,r}: fold the per-(dst, relation) inverse
        # count into the per-edge attention coefficients, per direction.
        cnt = (jnp.einsum("be,bei,ber->bir", mf, dst_oh, rel_oh)
               + jnp.einsum("be,bei,ber->bir", mr, src_oh, rel_oh))
        cinv = 1.0 / jnp.maximum(cnt, 1.0)
        coef_f = jnp.einsum("bei,ber,bir->be", dst_oh, rel_oh, cinv)
        coef_r = jnp.einsum("bei,ber,bir->be", src_oh, rel_oh, cinv)
        af = att_e * (mf * coef_f)[..., None]
        ar = att_e * (mr * coef_r)[..., None]
    else:
        af = att_e * mf[..., None]
        ar = att_e * mr[..., None]

    if per_basis:
        # per-basis fused scatters: nb small dots whose lhs multiply
        # (af_k * xs) fuses into the dot operand read — avoids
        # materializing the [B, E, nb*Cin] outer product (the dense
        # trunk's largest single cost in the round-5 xplane profile)
        zs = []
        for k in range(nb):
            sf = jnp.einsum("bei,bec->bic", dst_oh, af[..., k, None] * xs,
                            preferred_element_type=jnp.float32)
            sr = jnp.einsum("bei,bec->bic", src_oh, ar[..., k, None] * xd,
                            preferred_element_type=jnp.float32)
            zs.append(sf + sr)
        z = jnp.stack(zs, axis=2).reshape(B, n, nb * Cin)
    else:
        # t[b,e,(k,c)] = af[b,e,k] * xs[b,e,c]; z = dst_ohT @ t (and rev)
        tf = jnp.einsum("bek,bec->bekc", af, xs).reshape(B, -1, nb * Cin)
        tr = jnp.einsum("bek,bec->bekc", ar, xd).reshape(B, -1, nb * Cin)
        z = (jnp.einsum("bei,bem->bim", dst_oh, tf,
                        preferred_element_type=jnp.float32)
             + jnp.einsum("bei,bem->bim", src_oh, tr,
                          preferred_element_type=jnp.float32))
    agg = (z @ params["basis"].reshape(nb * Cin, Cout)).astype(jnp.float32)

    if aggr == "mean":
        deg = (jnp.einsum("be,bei->bi", mf, dst_oh)
               + jnp.einsum("be,bei->bi", mr, src_oh)).astype(jnp.float32)
        agg = agg / jnp.maximum(deg, 1.0)[..., None]
    elif aggr not in ("sum", "relmean"):
        raise ValueError(f"unknown aggr {aggr}")
    return agg + x @ params["root"] + params["bias"]


def rgcn_dense_bipartite_apply(params, x, num_u: int, edge_src, edge_dst,
                               edge_type, mask_f, mask_r,
                               aggr: str = "mean", compute_dtype=None):
    """rgcn_dense_apply for the BIPARTITE slot layout (batching/dense.py
    DenseBatch.num_u): users occupy rows [0, num_u) and items rows
    [num_u, n) with a STATIC boundary, and every stored forward edge is
    user->item (graphs/extract.py). Each one-hot therefore spans only its
    own side — [B, E, nu] and [B, E, nv] instead of two [B, E, n] — which
    HALVES both the indicator MACs (the MXU cost the dense trunk is
    limited by at bf16) and the VPU one-hot materialization, with
    bit-identical math to the unified layout (tests/test_dense_bipartite).

        fwd messages: gather from users, scatter to items
        rev messages: gather from items, scatter to users

    `edge_dst` is the GLOBAL item row (>= num_u); padded edges must hold a
    valid row (collate_dense pads with num_u) so one_hot stays in range.
    """
    B, n, Cin = x.shape
    nu = int(num_u)
    nv = n - nu
    nb, _, Cout = params["basis"].shape
    R = params["att"].shape[0]
    cd = compute_dtype or jnp.float32

    mf = mask_f.astype(cd)
    mr = mask_r.astype(cd)
    src_oh = jax.nn.one_hot(edge_src, nu, dtype=cd)        # [B, E, nu]
    dst_oh = jax.nn.one_hot(edge_dst - nu, nv, dtype=cd)   # [B, E, nv]
    rel_oh = jax.nn.one_hot(edge_type, R, dtype=cd)        # [B, E, R]
    att_e = rel_oh @ params["att"].astype(cd)              # [B, E, nb]

    xc = x.astype(cd)
    xu = xc[:, :nu]
    xv = xc[:, nu:]
    xs = jnp.einsum("beu,buc->bec", src_oh, xu)            # x[src] (users)
    xd = jnp.einsum("bev,bvc->bec", dst_oh, xv)            # x[dst] (items)

    if aggr == "relmean":
        # per-(node, relation) incoming counts, one side each: forward
        # edges land on items, reverse on users
        cnt_v = jnp.einsum("be,bev,ber->bvr", mf, dst_oh, rel_oh)
        cnt_u = jnp.einsum("be,beu,ber->bur", mr, src_oh, rel_oh)
        cinv_v = 1.0 / jnp.maximum(cnt_v, 1.0)
        cinv_u = 1.0 / jnp.maximum(cnt_u, 1.0)
        coef_f = jnp.einsum("bev,ber,bvr->be", dst_oh, rel_oh, cinv_v)
        coef_r = jnp.einsum("beu,ber,bur->be", src_oh, rel_oh, cinv_u)
        af = att_e * (mf * coef_f)[..., None]
        ar = att_e * (mr * coef_r)[..., None]
    else:
        af = att_e * mf[..., None]
        ar = att_e * mr[..., None]

    tf = jnp.einsum("bek,bec->bekc", af, xs).reshape(B, -1, nb * Cin)
    tr = jnp.einsum("bek,bec->bekc", ar, xd).reshape(B, -1, nb * Cin)
    zv = jnp.einsum("bev,bem->bvm", dst_oh, tf,
                    preferred_element_type=jnp.float32)    # [B, nv, nb*Cin]
    zu = jnp.einsum("beu,bem->bum", src_oh, tr,
                    preferred_element_type=jnp.float32)    # [B, nu, nb*Cin]
    z = jnp.concatenate([zu, zv], axis=1)                  # [B, n, nb*Cin]
    # basis projection in f32 on the f32-accumulated z, exactly as
    # rgcn_dense_apply does (small: n*nb*Cin*Cout MACs)
    agg = (z @ params["basis"].reshape(nb * Cin, Cout)).astype(jnp.float32)

    if aggr == "mean":
        deg_u = jnp.einsum("be,beu->bu", mr, src_oh)
        deg_v = jnp.einsum("be,bev->bv", mf, dst_oh)
        deg = jnp.concatenate([deg_u, deg_v], axis=1).astype(jnp.float32)
        agg = agg / jnp.maximum(deg, 1.0)[..., None]
    elif aggr not in ("sum", "relmean"):
        raise ValueError(f"unknown aggr {aggr}")
    return agg + x @ params["root"] + params["bias"]


def rgcn_dense_relslot_apply(params, x, edge_src, edge_dst, rel_caps,
                             mask_f, mask_r, aggr: str = "mean",
                             compute_dtype=None, num_u=None):
    """rgcn_dense_apply over a RELATION-SLOTTED edge axis (batching/
    dense.py DenseBatch.rel_caps): relation-r edges sit in the static
    segment [off_r, off_r + caps[r]), so the relation is known from the
    POSITION. Two VPU costs of the edge formulation disappear outright —
    the [B, E, R] rel one-hot and the [B, E, nb*Cin] outer product (the
    largest single op in the round-5 xplane profile) — replaced by R tiny
    block dots xs[:, seg_r] @ W_r with W = att @ basis computed once per
    layer. The gathers and the single full-width scatter are unchanged.

    `num_u`: optional bipartite node-slot boundary (DenseBatch.num_u) —
    composes: per-side one-hot widths plus relation-slotted projection.
    Supports aggr 'mean' and 'sum' ('relmean' would need per-segment
    degree folds; use the edge formulation there)."""
    B, n, Cin = x.shape
    nb, _, Cout = params["basis"].shape
    cd = compute_dtype or jnp.float32
    if aggr not in ("mean", "sum"):
        raise ValueError(f"relslot strategy supports mean/sum, not {aggr}")

    W = rgcn_relation_weights(params).astype(cd)      # [R, Cin, Cout]
    xc = x.astype(cd)
    mf = mask_f.astype(cd)
    mr = mask_r.astype(cd)

    if num_u is None:
        src_oh = jax.nn.one_hot(edge_src, n, dtype=cd)
        dst_oh = jax.nn.one_hot(edge_dst, n, dtype=cd)
        xs = jnp.einsum("ben,bnc->bec", src_oh, xc)
        xd = jnp.einsum("ben,bnc->bec", dst_oh, xc)
    else:
        nu = int(num_u)
        src_oh = jax.nn.one_hot(edge_src, nu, dtype=cd)
        dst_oh = jax.nn.one_hot(edge_dst - nu, n - nu, dtype=cd)
        xs = jnp.einsum("beu,buc->bec", src_oh, xc[:, :nu])
        xd = jnp.einsum("bev,bvc->bec", dst_oh, xc[:, nu:])

    msgs_f, msgs_r = [], []
    off = 0
    for r, cap in enumerate(rel_caps):
        seg = slice(off, off + int(cap))
        off += int(cap)
        msgs_f.append(xs[:, seg] @ W[r])
        msgs_r.append(xd[:, seg] @ W[r])
    msg_f = jnp.concatenate(msgs_f, axis=1) * mf[..., None]  # [B, E, Cout]
    msg_r = jnp.concatenate(msgs_r, axis=1) * mr[..., None]

    if num_u is None:
        agg = (jnp.einsum("bei,beo->bio", dst_oh, msg_f,
                          preferred_element_type=jnp.float32)
               + jnp.einsum("bei,beo->bio", src_oh, msg_r,
                            preferred_element_type=jnp.float32))
        if aggr == "mean":
            deg = (jnp.einsum("be,bei->bi", mf, dst_oh)
                   + jnp.einsum("be,bei->bi", mr, src_oh))
    else:
        zv = jnp.einsum("bev,beo->bvo", dst_oh, msg_f,
                        preferred_element_type=jnp.float32)
        zu = jnp.einsum("beu,beo->buo", src_oh, msg_r,
                        preferred_element_type=jnp.float32)
        agg = jnp.concatenate([zu, zv], axis=1)
        if aggr == "mean":
            deg = jnp.concatenate(
                [jnp.einsum("be,beu->bu", mr, src_oh),
                 jnp.einsum("be,bev->bv", mf, dst_oh)], axis=1)
    agg = agg.astype(jnp.float32)
    if aggr == "mean":
        agg = agg / jnp.maximum(deg.astype(jnp.float32), 1.0)[..., None]
    return agg + x @ params["root"] + params["bias"]


def build_dense_adj(edge_src, edge_dst, edge_type, mask, num_relations: int,
                    node_slot: int, compute_dtype=None):
    """Per-relation dense adjacency A[b, r, i, j] = Σ_e mask·1[type_e=r,
    dst_e=i, src_e=j] for a dense-blocked batch ([B, E] forward edges).

    A is independent of the layer parameters AND the feature width, so one
    build (≈ the MAC cost of a single edge-formulation layer) is shared by
    every R-GCN layer of the forward — the basis of the `adjacency`
    strategy of rgcn_dense_adj_apply. Built as one-hot matmuls (no
    scatter): the (relation, dst) pair indexes a combined one-hot.
    """
    B, E = edge_src.shape
    cd = compute_dtype or jnp.float32
    comb = jax.nn.one_hot(edge_type * node_slot + edge_dst,
                          num_relations * node_slot, dtype=cd)   # [B,E,R·n]
    comb = comb * mask.astype(cd)[..., None]
    src_oh = jax.nn.one_hot(edge_src, node_slot, dtype=cd)       # [B,E,n]
    A = jnp.einsum("bem,bej->bmj", comb, src_oh,
                   preferred_element_type=jnp.float32)
    return A.reshape(B, num_relations, node_slot, node_slot).astype(cd)


def rgcn_dense_adj_apply(params, x, adj_f, adj_r=None, aggr: str = "mean",
                         compute_dtype=None, inv_deg=None):
    """R-GCN layer over a dense-blocked batch via PRECOMPUTED per-relation
    adjacencies (build_dense_adj) — same math as rgcn_dense_apply with a
    different contraction order of the same 4-tensor network
    (A · att · x · basis):

        M[b,r,j,o] = Σ_k att[r,k] · (x[b,j,:] @ basis[k])    (per-node)
        zf[b,i,o]  = Σ_{r,j} A_f[b,r,i,j] · M[b,r,j,o]       (dst i ← src j)
        zr[b,i,o]  = Σ_{r,j} A_r[b,r,j,i] · M[b,r,j,o]       (reverse)

    This "M-ordering" materializes only per-NODE tensors ([B,n,nb,Cout]
    and [B,R,n,Cout]) — there is no per-edge [B,E,nb·C] outer product
    (the edge path's dominant VPU cost, round-5 xplane profile) and no
    per-layer [B,nb,n,n] W (the round-2 adjacency path's HBM cost).
    Per layer ≈ n·nb·Cin·Cout + R·nb·n·Cout + 2·R·n²·Cout MACs vs the
    edge formulation's ≈ 2·E·n·(Cin + nb·Cin); the O(E) A-build is paid
    once per FORWARD and shared by all layers.

    `adj_r`: separate reverse-direction adjacency when edge-dropout masks
    are NOT tied across directions (force_undirected=False); None means
    reuse `adj_f`. `inv_deg` [B, n]: precomputed 1/max(deg,1) for
    aggr='mean' (layer-independent, so the caller computes it once);
    required iff aggr='mean'.
    """
    B, n, Cin = x.shape
    nb, _, Cout = params["basis"].shape
    cd = compute_dtype or jnp.float32

    att = params["att"].astype(cd)                       # [R, nb]
    xc = x.astype(cd)
    basis = params["basis"].astype(cd)                   # [nb, Cin, Cout]
    h = jnp.einsum("bjc,kco->bjko", xc, basis)           # [B, n, nb, Cout]
    m = jnp.einsum("rk,bjko->brjo", att, h)              # [B, R, n, Cout]
    af = adj_f.astype(cd)
    ar = af if adj_r is None else adj_r.astype(cd)
    zf = jnp.einsum("brij,brjo->bio", af, m,
                    preferred_element_type=jnp.float32)
    zr = jnp.einsum("brji,brjo->bio", ar, m,
                    preferred_element_type=jnp.float32)
    agg = (zf + zr).astype(jnp.float32)

    if aggr == "mean":
        agg = agg * inv_deg[..., None]
    elif aggr != "sum":
        raise ValueError(f"adjacency strategy supports mean/sum, not {aggr}")
    return agg + x @ params["root"] + params["bias"]


def dense_adj_degrees(adj_f, adj_r=None):
    """Incoming-edge count per node row from the precomputed adjacencies
    (forward edges land on dst=i via adj_f[..., i, :]; reverse on src=i
    via adj_r[..., :, i]) — the aggr='mean' denominator, shared by every
    layer."""
    ar = adj_f if adj_r is None else adj_r
    deg = adj_f.sum(axis=(1, 3)) + ar.sum(axis=(1, 2))
    return 1.0 / jnp.maximum(deg.astype(jnp.float32), 1.0)


# ---------------------------------------------------------------------------
# Plain GCN conv (for the GNN / DGCNN variants, /root/reference/models.py:13-120)
# ---------------------------------------------------------------------------

def gcn_init(key, in_channels: int, out_channels: int):
    """PyG GCNConv init: glorot weight, zero bias."""
    k1, _ = jax.random.split(key)
    bound = math.sqrt(6.0 / (in_channels + out_channels))
    return {
        "weight": _uniform(k1, (in_channels, out_channels), bound),
        "bias": jnp.zeros((out_channels,), jnp.float32),
    }


def gcn_dense_apply(params, x, edge_src, edge_dst, mask_f, mask_r,
                    node_mask):
    """GCN layer over DENSE-BLOCKED batches ([B, n, C] slots, forward-only
    [B, E] edges applied in both directions): same math as gcn_apply —
    self-loops + symmetric D^-1/2 (A+I) D^-1/2 — with the gather/scatter
    as batched one-hot matmuls, mirroring rgcn_dense_apply. Powers the
    dense layout for the GNN / DGCNN model family
    (/root/reference/models.py:13-120)."""
    B, n, _ = x.shape
    h = x @ params["weight"]
    cd = h.dtype
    mf = mask_f.astype(cd)
    mr = mask_r.astype(cd)
    nm = node_mask.astype(cd)
    src_oh = jax.nn.one_hot(edge_src, n, dtype=cd)   # [B, E, n]
    dst_oh = jax.nn.one_hot(edge_dst, n, dtype=cd)
    deg = (jnp.einsum("be,bei->bi", mf, dst_oh)
           + jnp.einsum("be,bei->bi", mr, src_oh)) + nm
    dinv = jnp.where(deg > 0, jax.lax.rsqrt(jnp.maximum(deg, 1e-12)), 0.0)
    dsrc = jnp.einsum("bei,bi->be", src_oh, dinv)
    ddst = jnp.einsum("bei,bi->be", dst_oh, dinv)
    coef = dsrc * ddst
    hs = jnp.einsum("bei,bic->bec", src_oh, h)       # h[src]
    hd = jnp.einsum("bei,bic->bec", dst_oh, h)       # h[dst]
    agg = (jnp.einsum("bei,bec->bic", dst_oh, hs * (coef * mf)[..., None])
           + jnp.einsum("bei,bec->bic", src_oh, hd * (coef * mr)[..., None]))
    self_loop = h * (dinv * dinv * nm)[..., None]
    return agg + self_loop + params["bias"]


def gcn_apply(params, x, edge_src, edge_dst, edge_mask, node_mask,
              num_nodes: int):
    """GCN with added self-loops and symmetric D^-1/2 (A+I) D^-1/2 norm."""
    h = x @ params["weight"]
    em = edge_mask.astype(h.dtype)
    nm = node_mask.astype(h.dtype)
    # degree including self-loop, counting only real edges/nodes
    deg = jax.ops.segment_sum(em, edge_dst, num_segments=num_nodes) + nm
    dinv = jnp.where(deg > 0, jax.lax.rsqrt(jnp.maximum(deg, 1e-12)), 0.0)
    coef = dinv[edge_src] * dinv[edge_dst] * em
    agg = jax.ops.segment_sum(h[edge_src] * coef[:, None], edge_dst,
                              num_segments=num_nodes)
    self_loop = h * (dinv * dinv * nm)[:, None]
    return agg + self_loop + params["bias"]


# ---------------------------------------------------------------------------
# Dense layers (torch.nn.Linear parity)
# ---------------------------------------------------------------------------

def linear_init(key, in_features: int, out_features: int):
    """torch.nn.Linear default init: U(±1/sqrt(fan_in)) for weight and bias."""
    k1, k2 = jax.random.split(key)
    bound = 1.0 / math.sqrt(in_features)
    return {
        "weight": _uniform(k1, (in_features, out_features), bound),
        "bias": _uniform(k2, (out_features,), bound),
    }


def linear_apply(params, x):
    return x @ params["weight"] + params["bias"]
