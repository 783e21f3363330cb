"""Edge-partitioned model parallelism: ONE giant batch-graph sharded across chips.

This is the "long-context" scaling path (SURVEY.md §5): where the reference
bounds subgraph size with --max-nodes-per-hop / --sample-ratio
(/root/reference/Main.py:88-93), the TPU-native answer to giant batches is to
partition the disjoint batch-graph itself:

  * nodes are block-partitioned over the ('data',) mesh axis — chip d owns
    the contiguous global node range [d*Nl, (d+1)*Nl);
  * every edge lives on the chip that owns its DESTINATION, so the
    segment-sum aggregation is entirely chip-local;
  * the only communication is one tiled all_gather of the (small) layer
    input features per R-GCN layer — boundary-feature exchange riding ICI —
    plus one all_gather of the final states for target readout and the psum
    GSPMD inserts for gradients.

Per-edge messages use the basis-mix formulation (models/rgcn.py): gather
from the all-gathered [N, Cin] table, mix the (at most num_bases) bases per
edge, one MXU matmul — per-chip FLOPs scale with local edges only, so the
compute (and the edges/sec metric) scales linearly with chips while the
all_gather volume stays N*Cin*4 bytes per layer.

Edge dropout across chips: the two directed copies of an undirected edge may
land on different chips, so the mask-broadcast trick of ops/dropout.py does
not apply. Instead each edge carries its global canonical-pair id and the
keep decision is a stateless integer hash of (seed, pair id) — both copies
compute the same Bernoulli with no communication.

Comm/compute overlap (the next step on real multi-chip slices, per
BASELINE.json): split each chip's edges into intra-chip (source owned
locally — messages computable from x BEFORE the exchange) and boundary
(source remote) groups at partition time, aggregate the intra-chip group
while the layer's all_gather is in flight, then add the boundary
contribution. XLA's latency-hiding scheduler performs this overlap when
the gather result is not on the critical path of the first segment-sum;
validating the schedule needs a real ICI profile, which a single tunneled
chip cannot produce — hence not speculatively enabled here.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from ..batching.batch import GraphBatch
from ..models.igmc import IGMCConfig, arr_regularizer
from ..models.rgcn import linear_apply
from ..ops.dropout import feature_dropout


# ---------------------------------------------------------------------------
# Host-side partitioner
# ---------------------------------------------------------------------------

@dataclass
class EPBatch:
    """One collated GraphBatch, edge-partitioned for D chips.

    All arrays carry a leading device axis [D, ...] to be sharded over
    ('data',). Node/graph axes are block-partitioned; `edge_src` stays a
    GLOBAL node index (it addresses the all-gathered feature table) while
    `edge_dst` is LOCAL to the owning chip's node block.
    """

    node_label: np.ndarray   # int32 [D, Nl]
    node_mask: np.ndarray    # bool  [D, Nl]
    edge_src: np.ndarray     # int32 [D, El]  global node index
    edge_dst: np.ndarray     # int32 [D, El]  local node index on owner chip
    edge_type: np.ndarray    # int32 [D, El]
    edge_pair: np.ndarray    # int32 [D, El]  global undirected-pair id
    edge_mask: np.ndarray    # bool  [D, El]
    y: np.ndarray            # float32 [D, Bl]
    graph_mask: np.ndarray   # bool  [D, Bl]
    target_u: np.ndarray     # int32 [D, Bl]  global node index
    target_v: np.ndarray     # int32 [D, Bl]  global node index
    u_feat: Optional[np.ndarray] = None  # float32 [D, Bl, du]
    v_feat: Optional[np.ndarray] = None  # float32 [D, Bl, dv]

    @property
    def num_devices(self) -> int:
        return self.node_label.shape[0]


def _register_pytree():
    fields = [
        "node_label", "node_mask", "edge_src", "edge_dst", "edge_type",
        "edge_pair", "edge_mask", "y", "graph_mask", "target_u", "target_v",
        "u_feat", "v_feat",
    ]
    jax.tree_util.register_pytree_node(
        EPBatch,
        lambda b: ([getattr(b, f) for f in fields], None),
        lambda _, xs: EPBatch(*xs),
    )


_register_pytree()


def partition_batch(batch: GraphBatch, n_devices: int,
                    edge_pad_per_device: Optional[int] = None) -> EPBatch:
    """Partition a flat collated batch: node blocks, dst-owned edges.

    Requires num_nodes and num_graphs divisible by n_devices (collate pads
    are already pow-of-2-ish; callers pick pads accordingly). Per-device
    edge capacity defaults to the max owner load rounded up to 8.
    """
    D = n_devices
    N, E, B = batch.num_nodes, batch.num_edges, batch.num_graphs
    if N % D or B % D:
        raise ValueError(f"node pad {N} and graph pad {B} must divide by {D}")
    Nl, Bl = N // D, B // D

    dst = np.asarray(batch.edge_dst)
    emask = np.asarray(batch.edge_mask)
    owner = np.where(emask, dst // Nl, -1)  # padded edges unassigned
    counts = np.bincount(owner[owner >= 0], minlength=D)
    El = edge_pad_per_device or max(8, int(-(-counts.max() // 8) * 8))
    if counts.max() > El:
        raise ValueError(f"device edge load {counts.max()} > capacity {El}")

    def z(shape, dt):
        return np.zeros(shape, dt)

    out = EPBatch(
        node_label=np.asarray(batch.node_label).reshape(D, Nl),
        node_mask=np.asarray(batch.node_mask).reshape(D, Nl),
        edge_src=z((D, El), np.int32), edge_dst=z((D, El), np.int32),
        edge_type=z((D, El), np.int32), edge_pair=z((D, El), np.int32),
        edge_mask=z((D, El), bool),
        y=np.asarray(batch.y).reshape(D, Bl),
        graph_mask=np.asarray(batch.graph_mask).reshape(D, Bl),
        target_u=np.asarray(batch.target_u).reshape(D, Bl),
        target_v=np.asarray(batch.target_v).reshape(D, Bl),
        u_feat=(None if batch.u_feat is None
                else np.asarray(batch.u_feat).reshape(D, Bl, -1)),
        v_feat=(None if batch.v_feat is None
                else np.asarray(batch.v_feat).reshape(D, Bl, -1)),
    )
    src = np.asarray(batch.edge_src)
    etype = np.asarray(batch.edge_type)
    pair = np.asarray(batch.edge_canon)
    # One stable sort by owner, then per-device slots = rank within owner.
    real = np.nonzero(owner >= 0)[0]
    order = real[np.argsort(owner[real], kind="stable")]
    own = owner[order]
    starts = np.searchsorted(own, np.arange(D))
    slot = np.arange(len(order)) - starts[own]
    out.edge_src[own, slot] = src[order]
    out.edge_dst[own, slot] = dst[order] - own * Nl
    out.edge_type[own, slot] = etype[order]
    out.edge_pair[own, slot] = pair[order]
    out.edge_mask[own, slot] = True
    return out


# ---------------------------------------------------------------------------
# Stateless hash dropout (communication-free force_undirected)
# ---------------------------------------------------------------------------

def dropout_key_ids(force_undirected: bool, epair, esrc):
    """The hash-dropout stream id per edge. force_undirected keys on the
    undirected pair id (both directed copies agree, zero communication);
    otherwise the GLOBAL source node is mixed in so each directed copy
    drops independently, matching edge_dropout on the flat path.
    (edge_dst is chip-local and unusable as a key.)"""
    if force_undirected:
        return epair
    return (epair.astype(jnp.uint32) * jnp.uint32(0x9E3779B1)
            + esrc.astype(jnp.uint32))


def hash_edge_keep(seed: jnp.ndarray, pair_id: jnp.ndarray, p: float):
    """Bernoulli(1-p) keep decision as a murmur-style hash of (seed, pair id).

    Deterministic in (seed, pair id): both directed copies of an undirected
    edge agree with zero communication, on any chip.
    """
    h = pair_id.astype(jnp.uint32) * jnp.uint32(0x9E3779B9)
    h = h + seed.astype(jnp.uint32)
    h = h ^ (h >> 16)
    h = h * jnp.uint32(0x85EBCA6B)
    h = h ^ (h >> 13)
    h = h * jnp.uint32(0xC2B2AE35)
    h = h ^ (h >> 16)
    u = h.astype(jnp.float32) * (1.0 / 4294967296.0)
    return u >= p


# ---------------------------------------------------------------------------
# Sharded IGMC forward
# ---------------------------------------------------------------------------

def make_ep_forward(cfg: IGMCConfig, mesh: Mesh):
    """Build igmc_forward over an EPBatch under shard_map.

    Matches models/igmc.py igmc_forward numerically (eval mode): same trunk,
    same mean aggregation, same target readout — verified by tests/test_ep.py.
    """
    Pd = P("data")

    def local_forward(params, nl, nmask, esrc, edst, etype, epair, emask,
                      tu, tv, uf, vf, seed, training):
        # strip the leading local device axis (size 1 inside shard_map)
        nl, nmask = nl[0], nmask[0]
        esrc, edst, etype = esrc[0], edst[0], etype[0]
        epair, emask = epair[0], emask[0]
        tu, tv = tu[0], tv[0]
        Nl = nl.shape[0]

        x = jax.nn.one_hot(nl, cfg.num_features, dtype=jnp.float32)
        x = x * nmask[:, None].astype(jnp.float32)

        em = emask
        if training and cfg.adj_dropout > 0:
            key_id = dropout_key_ids(cfg.force_undirected, epair, esrc)
            em = jnp.logical_and(em, hash_edge_keep(seed, key_id, cfg.adj_dropout))
        emf = em.astype(jnp.float32)

        states = []
        for conv in params["convs"]:
            x_full = lax.all_gather(x, "data", tiled=True)   # [N, Cin] boundary exchange
            xs = x_full[esrc]                                # [El, Cin]
            ae = conv["att"][etype]                          # [El, B]
            nb, Cin, Cout = conv["basis"].shape
            z = (ae[:, :, None] * xs[:, None, :]).reshape(-1, nb * Cin)
            msg = z @ conv["basis"].reshape(nb * Cin, Cout)  # MXU
            if cfg.aggr == "relmean":
                # mean within each (dst, relation) bucket, summed over
                # relations — identical to the flat trunk (models/rgcn.py)
                R = cfg.num_relations
                seg = edst * R + etype
                s = jax.ops.segment_sum(msg * emf[:, None], seg,
                                        num_segments=Nl * R)
                cnt = jax.ops.segment_sum(emf, seg, num_segments=Nl * R)
                s = (s / jnp.maximum(cnt, 1.0)[:, None]
                     ).reshape(Nl, R, Cout).sum(axis=1)
            else:
                s = jax.ops.segment_sum(msg * emf[:, None], edst,
                                        num_segments=Nl)
                if cfg.aggr == "mean":
                    cnt = jax.ops.segment_sum(emf, edst, num_segments=Nl)
                    s = s / jnp.maximum(cnt, 1.0)[:, None]
                elif cfg.aggr != "sum":
                    raise NotImplementedError(
                        f"EP path supports aggr mean/sum/relmean, not {cfg.aggr}")
            x = jnp.tanh(s + x @ conv["root"] + conv["bias"])
            states.append(x)
        cs = jnp.concatenate(states, axis=1)                 # [Nl, sum(latent)]
        cs_full = lax.all_gather(cs, "data", tiled=True)     # [N, sum(latent)]

        h = jnp.concatenate([cs_full[tu], cs_full[tv]], axis=1)  # [Bl, 2*sum]
        if cfg.side_features:
            h = jnp.concatenate([h, uf[0], vf[0]], axis=1)
        h = jax.nn.relu(linear_apply(params["lin1"], h))
        if training:
            k = jax.random.fold_in(jax.random.PRNGKey(seed),
                                   lax.axis_index("data"))
            h = feature_dropout(k, h, 0.5, True)
        out = linear_apply(params["lin2"], h)[:, 0] * cfg.multiply_by
        return out[None]                                     # [1, Bl]

    def forward(params, ep: EPBatch, seed, training: bool = False):
        uf = ep.u_feat if ep.u_feat is not None else jnp.zeros(
            (ep.num_devices, ep.y.shape[1], 0), jnp.float32)
        vf = ep.v_feat if ep.v_feat is not None else jnp.zeros(
            (ep.num_devices, ep.y.shape[1], 0), jnp.float32)
        f = shard_map(
            partial(local_forward, training=training),
            mesh=mesh,
            in_specs=(P(), Pd, Pd, Pd, Pd, Pd, Pd, Pd, Pd, Pd, Pd, Pd, P()),
            out_specs=Pd,
        )
        return f(params, ep.node_label, ep.node_mask, ep.edge_src,
                 ep.edge_dst, ep.edge_type, ep.edge_pair, ep.edge_mask,
                 ep.target_u, ep.target_v, uf, vf, seed)  # [D, Bl]

    return forward


# ---------------------------------------------------------------------------
# Train / eval steps
# ---------------------------------------------------------------------------

def make_ep_train_step(cfg: IGMCConfig, optimizer, ARR: float, mesh: Mesh):
    fwd = make_ep_forward(cfg, mesh)
    rep = NamedSharding(mesh, P())
    shd = NamedSharding(mesh, P("data"))

    def loss_fn(params, ep: EPBatch, seed):
        preds = fwd(params, ep, seed, training=True)        # [D, Bl]
        gmask = ep.graph_mask.astype(jnp.float32)
        n = jnp.maximum(gmask.sum(), 1.0)
        loss = jnp.sum(((preds - ep.y) ** 2) * gmask) / n
        if ARR != 0.0:
            loss = loss + ARR * arr_regularizer(params)
        return loss, n

    @partial(jax.jit, donate_argnums=(0, 1))
    def step(params, opt_state, ep, seed):
        (loss, n), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, ep, seed)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss, n

    return step, shd, rep


def make_ep_eval_step(cfg: IGMCConfig, mesh: Mesh):
    fwd = make_ep_forward(cfg, mesh)

    @jax.jit
    def step(params, ep: EPBatch):
        preds = fwd(params, ep, jnp.uint32(0), training=False)
        gmask = ep.graph_mask.astype(jnp.float32)
        sse = jnp.sum(((preds - ep.y) ** 2) * gmask)
        return sse, gmask.sum(), preds

    return step
