"""Qualitative visualization: render best/worst-predicted enclosing subgraphs.

Parity with /root/reference/train_eval.py:248-322 and
util_functions.py:314-324: predict over the test graphs, rank by prediction
(or true rating / random), and draw the top-5 and bottom-5 subgraphs as
bipartite layouts — nodes colored by hop/side label with the target user/item
highlighted, edges colored by rating on a rainbow colormap — into
results/<run>/visualization_<data>_<sort_by>.pdf.
"""

from __future__ import annotations

import os

import numpy as np

from ..batching.dataset import BatchLoader


def subgraph_to_nx(g):
    """Convert one extracted Subgraph to a networkx graph with type attrs."""
    import networkx as nx

    G = nx.Graph()
    G.add_nodes_from(range(g.num_nodes))
    for s, d, t in zip(g.src.tolist(), g.dst.tolist(), g.etype.tolist()):
        G.add_edge(s, d, type=int(t))
    for i, lbl in enumerate(g.node_label.tolist()):
        G.nodes[i]["type"] = int(lbl)
    G.graph["rating"] = float(g.y)
    return G


def visualize(forward, params, dataset, res_dir, data_name, class_values,
              batch_size=50, num=5, sort_by="prediction"):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    import networkx as nx

    from .loop import make_eval_step, predict_all

    eval_fn = make_eval_step(forward)
    loader = BatchLoader(dataset, batch_size, shuffle=False)
    R, Y = predict_all(eval_fn, params, loader)

    if sort_by == "true":
        order = np.argsort(Y).tolist()
    elif sort_by == "prediction":
        order = np.argsort(R).tolist()
    else:  # random
        order = np.random.permutation(len(R)).tolist()

    hi_idx = order[-num:][::-1]
    lo_idx = order[:num]
    graphs = [subgraph_to_nx(dataset.get(i)) for i in hi_idx + lo_idx]
    scores = [R[i] for i in hi_idx] + [R[i] for i in lo_idx]
    ys = [Y[i] for i in hi_idx] + [Y[i] for i in lo_idx]

    type_to_color = {0: "xkcd:red", 1: "xkcd:blue", 2: "xkcd:orange",
                     3: "xkcd:lightblue", 4: "y", 5: "g"}

    plt.axis("off")
    f = plt.figure(figsize=(20, 10))
    axs = f.subplots(2, num)
    cmap = plt.get_cmap("rainbow")
    vmin, vmax = float(min(class_values)), float(max(class_values))
    sm = plt.cm.ScalarMappable(cmap=cmap, norm=plt.Normalize(vmin=vmin, vmax=vmax))
    sm.set_array([])

    for i, g in enumerate(graphs):
        ax = axs[i // num, i % num]
        ax.axis("off")
        u_nodes = [n for n, d in g.nodes(data=True) if d["type"] % 2 == 0]
        pos = nx.drawing.layout.bipartite_layout(g, u_nodes)
        u0 = 0
        v0 = len(u_nodes)
        node_colors = [type_to_color.get(d["type"] % 6, "gray")
                       for _, d in g.nodes(data=True)]
        edge_types = nx.get_edge_attributes(g, "type")
        edge_colors = [float(class_values[edge_types[e]]) for e in g.edges()]
        nx.draw_networkx(
            g, pos, with_labels=False, node_size=150,
            node_color=node_colors, edge_color=edge_colors, ax=ax,
            edge_cmap=cmap, edge_vmin=vmin, edge_vmax=vmax,
        )
        # re-draw targets on top
        nx.draw_networkx_nodes(g, {u0: pos[u0]}, nodelist=[u0], node_size=150,
                               node_color="xkcd:red", ax=ax)
        if v0 in pos:
            nx.draw_networkx_nodes(g, {v0: pos[v0]}, nodelist=[v0],
                                   node_size=150, node_color="xkcd:blue", ax=ax)
        ax.set_title("{:.4f} ({:})".format(scores[i], ys[i]),
                     x=0.5, y=-0.05, fontsize=20)

    f.subplots_adjust(right=0.85)
    cbar_ax = f.add_axes([0.88, 0.15, 0.02, 0.7])
    ticks = list(class_values)
    if len(ticks) > 20:
        ticks = np.linspace(vmin, vmax, 20, dtype=int).tolist()
    cbar = plt.colorbar(sm, cax=cbar_ax, ticks=ticks)
    cbar.ax.tick_params(labelsize=22)
    out = os.path.join(res_dir, f"visualization_{data_name}_{sort_by}.pdf")
    f.savefig(out, bbox_inches="tight")
    plt.close(f)
    print(f"saved {out}")
    return out
