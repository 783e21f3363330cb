"""ctypes marshalling for the C++ extraction engine (native/extract.cpp).

Two-phase protocol: run (threads do the BFS) -> sizes -> fill packed arrays
-> free. Returns a list of Subgraph views over one packed allocation —
zero Python-level per-edge work.
"""

from __future__ import annotations

import ctypes as ct

import numpy as np

from .extract import Subgraph


def _as(arr, dtype):
    a = np.ascontiguousarray(arr, dtype=dtype)
    return a, a.ctypes.data_as(ct.c_void_p)


def extract_many_native(links, labels, A, h, sample_ratio, max_nodes_per_hop,
                        u_features, v_features, class_values, seed, lib,
                        indices=None):
    lib.igmc_extract_run.restype = ct.c_void_p
    lib.igmc_extract_run.argtypes = [ct.c_void_p] * 3 + [ct.c_int64] + \
        [ct.c_void_p] * 3 + [ct.c_int64] + [ct.c_void_p, ct.c_void_p,
        ct.c_int64, ct.c_void_p, ct.c_int32, ct.c_double, ct.c_int64,
        ct.c_uint64, ct.c_int32]
    lib.igmc_extract_sizes.argtypes = [ct.c_void_p] * 4
    lib.igmc_extract_fill.argtypes = [ct.c_void_p] * 7
    lib.igmc_extract_free.argtypes = [ct.c_void_p]

    us, vs = links
    n = len(us)
    u_indptr, p1 = _as(A.u_indptr, np.int64)
    u_indices, p2 = _as(A.u_indices, np.int32)
    u_data, p3 = _as(A.u_data, np.float32)
    v_indptr, p4 = _as(A.v_indptr, np.int64)
    v_indices, p5 = _as(A.v_indices, np.int32)
    v_data, p6 = _as(A.v_data, np.float32)
    lu, p7 = _as(us, np.int64)
    lv, p8 = _as(vs, np.int64)

    mnph = -1 if max_nodes_per_hop is None else int(max_nodes_per_hop)
    if indices is None:
        sid_ptr, _sid_keep = ct.c_void_p(None), None
    else:
        _sid_keep, sid_ptr = _as(indices, np.int64)
    handle = lib.igmc_extract_run(
        p1, p2, p3, A.num_users, p4, p5, p6, A.num_items,
        p7, p8, n, sid_ptr, int(h), float(sample_ratio), mnph,
        int(seed) & (2**64 - 1), 0,
    )
    try:
        node_counts = np.zeros(n, np.int64)
        edge_counts = np.zeros(n, np.int64)
        num_u = np.zeros(n, np.int32)
        lib.igmc_extract_sizes(
            handle, node_counts.ctypes.data_as(ct.c_void_p),
            edge_counts.ctypes.data_as(ct.c_void_p),
            num_u.ctypes.data_as(ct.c_void_p),
        )
        node_offsets = np.zeros(n + 1, np.int64)
        edge_offsets = np.zeros(n + 1, np.int64)
        np.cumsum(node_counts, out=node_offsets[1:])
        np.cumsum(edge_counts, out=edge_offsets[1:])

        node_label = np.zeros(int(node_offsets[-1]), np.int32)
        src = np.zeros(int(edge_offsets[-1]), np.int32)
        dst = np.zeros(int(edge_offsets[-1]), np.int32)
        etype = np.zeros(int(edge_offsets[-1]), np.int32)
        lib.igmc_extract_fill(
            handle, node_offsets.ctypes.data_as(ct.c_void_p),
            edge_offsets.ctypes.data_as(ct.c_void_p),
            node_label.ctypes.data_as(ct.c_void_p),
            src.ctypes.data_as(ct.c_void_p),
            dst.ctypes.data_as(ct.c_void_p),
            etype.ctypes.data_as(ct.c_void_p),
        )
    finally:
        lib.igmc_extract_free(handle)

    out = []
    for i in range(n):
        ns, ne = node_offsets[i], node_offsets[i + 1]
        es, ee = edge_offsets[i], edge_offsets[i + 1]
        y = float(class_values[labels[i]]) if class_values is not None \
            else float(labels[i])
        uf = vf = None
        if u_features is not None and v_features is not None:
            uf = np.asarray(u_features[us[i]]).reshape(-1).astype(np.float32)
            vf = np.asarray(v_features[vs[i]]).reshape(-1).astype(np.float32)
        out.append(Subgraph(
            src=src[es:ee], dst=dst[es:ee], etype=etype[es:ee],
            node_label=node_label[ns:ne], num_u=int(num_u[i]),
            num_v=int(ne - ns - num_u[i]), y=y, u_feat=uf, v_feat=vf,
        ))
    return out
