"""Reference-style PyTorch GGNN training-step baseline (CPU).

A from-scratch torch implementation following the reference's *algorithmic*
shape -- dynamic edge-list extraction with nonzero(), per-edge-type message
MLPs over the edge list, dense 0/1 summation matmul, GRUCell update, gather
readout, tiered APD head, KLDiv(batchmean) loss, Adam step (see
graphinvent/gnn/summation_mpnn.py:80-149 + gnn/mpnn.py:229-303 for the
structure being mirrored; no code is copied).  Used by bench.py to produce
the ``vs_baseline`` ratio on the hardware available in this environment
(the reference's own GPU numbers were never published -- BASELINE.md).

Run:  python tools/torch_baseline.py  -> prints edges/s
"""

from __future__ import annotations

import json
import time

import numpy as np
import torch
import torch.nn as nn

N_NODES, N_FEAT, N_EDGE = 13, 8, 3
HIDDEN, MSG, ENN_H, ENN_D = 100, 100, 250, 4
MLP1_H, MLP2_H, DEPTH = 500, 500, 4
GATHER_W, GATT_H, GEMB_H = 100, 250, 250
F_ADD_PER_NODE = 5 * 3 * 3          # atom types * charges * bonds
APD = N_NODES * F_ADD_PER_NODE + N_NODES * N_EDGE + 1


def _mlp(i, h, o, d):
    layers = []
    sizes = [i] + [h] * d + [o]
    for a, b in zip(sizes[:-1], sizes[1:]):
        lin = nn.Linear(a, b)
        nn.init.xavier_uniform_(lin.weight)
        layers += [lin, nn.SELU()]
    return nn.Sequential(*layers)


class TorchGGNN(nn.Module):
    def __init__(self):
        super().__init__()
        self.msg_nns = nn.ModuleList(
            [_mlp(HIDDEN, ENN_H, MSG, ENN_D) for _ in range(N_EDGE)])
        self.gru = nn.GRUCell(MSG, HIDDEN)
        self.gather_att = _mlp(N_FEAT + HIDDEN, GATT_H, GATHER_W, DEPTH)
        self.gather_emb = _mlp(HIDDEN, GEMB_H, GATHER_W, DEPTH)
        self.f_add1 = _mlp(HIDDEN, MLP1_H, F_ADD_PER_NODE, DEPTH)
        self.f_conn1 = _mlp(HIDDEN, MLP1_H, N_EDGE, DEPTH)
        self.f_add2 = _mlp(N_NODES * F_ADD_PER_NODE + GATHER_W, MLP2_H,
                           N_NODES * F_ADD_PER_NODE, DEPTH)
        self.f_conn2 = _mlp(N_NODES * N_EDGE + GATHER_W, MLP2_H,
                            N_NODES * N_EDGE, DEPTH)
        self.f_term2 = _mlp(GATHER_W, MLP2_H, 1, DEPTH)

    def forward(self, nodes, edges):
        B = nodes.shape[0]
        adjacency = edges.sum(3)
        eb, en, en2 = adjacency.nonzero(as_tuple=True)       # dynamic shapes
        nb, nn_idx = adjacency.sum(-1).nonzero(as_tuple=True)
        same_b = nb.view(-1, 1) == eb
        same_n = nn_idx.view(-1, 1) == en
        summation = (same_b & same_n).float()
        edge_feats = edges[eb, en, en2, :]

        hidden = torch.zeros(B, N_NODES, HIDDEN)
        hidden[:, :, :N_FEAT] = nodes
        node_states = hidden[nb, nn_idx, :]
        for _ in range(3):
            nghb_states = hidden[eb, en2, :]
            ev = edge_feats.unsqueeze(-1)
            masked = ev * nghb_states.unsqueeze(1)
            terms = sum(ev[:, e, :] * self.msg_nns[e](masked[:, e, :])
                        for e in range(N_EDGE))
            messages = summation @ terms
            node_states = self.gru(messages, node_states)
            hidden = hidden.clone()
            hidden[nb, nn_idx, :] = node_states

        mask = adjacency.sum(-1) != 0
        cat = torch.cat([hidden, nodes], dim=2)
        energies = self.gather_att(cat) - (~mask).float().unsqueeze(-1) * 1e6
        att = torch.softmax(energies, dim=1)
        emb = self.gather_emb(hidden)
        graph_emb = (att * emb).sum(1)

        fa1 = self.f_add1(hidden).reshape(B, -1)
        fc1 = self.f_conn1(hidden).reshape(B, -1)
        fa2 = self.f_add2(torch.cat([fa1, graph_emb], 1))
        fc2 = self.f_conn2(torch.cat([fc1, graph_emb], 1))
        ft2 = self.f_term2(graph_emb)
        return torch.cat([fa2, fc2, ft2], dim=1)


def synthetic_batch(batch_size: int, seed: int = 0):
    rng = np.random.default_rng(seed)
    nodes = np.zeros((batch_size, N_NODES, N_FEAT), np.float32)
    edges = np.zeros((batch_size, N_NODES, N_NODES, N_EDGE), np.float32)
    apds = np.zeros((batch_size, APD), np.float32)
    for b in range(batch_size):
        n = int(rng.integers(8, N_NODES + 1))
        for i in range(n):
            nodes[b, i, int(rng.integers(0, 5))] = 1
            nodes[b, i, 5 + 1] = 1
        for i in range(n - 1):                       # chain
            t = int(rng.integers(0, N_EDGE))
            edges[b, i, i + 1, t] = edges[b, i + 1, i, t] = 1
        extra = int(rng.integers(0, 3))              # ring closures
        for _ in range(extra):
            i, j = sorted(rng.choice(n, 2, replace=False).tolist())
            if edges[b, i, j].sum() == 0 and i != j:
                edges[b, i, j, 0] = edges[b, j, i, 0] = 1
        apds[b, int(rng.integers(0, APD))] = 1
    return nodes, edges, apds


def run(batch_size: int = 1000, n_steps: int = 4) -> float:
    torch.manual_seed(0)
    model = TorchGGNN()
    opt = torch.optim.Adam(model.parameters(), lr=1e-4)
    nodes_np, edges_np, apds_np = synthetic_batch(batch_size)
    nodes = torch.from_numpy(nodes_np)
    edges = torch.from_numpy(edges_np)
    apds = torch.from_numpy(apds_np)
    target = apds / apds.sum(1, keepdim=True)
    crit = nn.KLDivLoss(reduction="batchmean")
    edges_per_batch = float(edges_np.sum() / 2)

    # warmup
    out = model(nodes, edges)
    loss = crit(torch.log_softmax(out, dim=1), target)
    loss.backward()
    opt.step()

    t0 = time.time()
    for _ in range(n_steps):
        opt.zero_grad()
        out = model(nodes, edges)
        loss = crit(torch.log_softmax(out, dim=1), target)
        loss.backward()
        opt.step()
    dt = time.time() - t0
    return edges_per_batch * n_steps / dt


if __name__ == "__main__":
    eps = run()
    print(json.dumps({"torch_cpu_edges_per_s": eps}))
