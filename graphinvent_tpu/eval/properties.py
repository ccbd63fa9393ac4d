"""Vectorized molecular-property statistics over batches of graph tensors.

Rebuilds Analyzer.get_molecular_properties (Analyzer.py:311-599) with NumPy
reductions over the padded node/edge tensors instead of per-graph Python
loops.  Keys and value layouts match the reference's ts-properties CSV
(util.py:715-742) so files interoperate.

Deviations (documented):
  * statistics are computed exactly over the full set rather than with the
    reference's running weighted average (Analyzer.py:601-705), which
    over-weights the final partial group;
  * nodes with degree 0 are excluded from the edges-per-node histogram (the
    reference wraps them into the last bin via hist[n_edges - 1] with
    n_edges == 0, Analyzer.py:365-368).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from graphinvent_tpu.config import GraphInventConfig


def graph_set_properties(cfg: GraphInventConfig, nodes: np.ndarray,
                         edges: np.ndarray, n_nodes: np.ndarray,
                         epoch_key: str = "Training set",
                         smiles: Optional[Sequence[Optional[str]]] = None,
                         validity: Optional[np.ndarray] = None,
                         n_edges_to_bin: int = 10) -> Dict[Tuple[str, str], object]:
    """nodes (B,M,Fn), edges (B,M,M,E), n_nodes (B,) -> property dict with
    ("epoch_key", "property") tuple keys (reference: Analyzer.py:583-597)."""
    B = nodes.shape[0]
    nodes = np.asarray(nodes, np.float32)
    edges = np.asarray(edges, np.float32)
    n_nodes = np.asarray(n_nodes, np.int64)

    # number of nodes per graph
    n_nodes_hist = np.bincount(n_nodes, minlength=cfg.max_n_nodes + 1).astype(float)
    avg_n_nodes = float(n_nodes.mean()) if B else 0.0

    # node feature histograms: sum of one-hots over batch+node
    nodes_hist = nodes.sum(axis=(0, 1))
    offs = cfg.feature_offsets
    atom_type_hist = nodes_hist[:offs[0]]
    formal_charge_hist = nodes_hist[offs[0]:offs[1]]
    if cfg.n_imp_H:
        numh_hist = nodes_hist[offs[1]:offs[2]]
    else:
        numh_hist = np.zeros(0)
    if cfg.use_chirality:
        corr = 1 if cfg.n_imp_H else 0
        chirality_hist = nodes_hist[offs[1 + corr]:offs[2 + corr]]
    else:
        chirality_hist = np.zeros(0)

    # edges per node
    degree = edges.sum(axis=(2, 3))                      # (B, M)
    deg_vals = degree[degree > 0].astype(np.int64)
    deg_vals = np.clip(deg_vals, 1, n_edges_to_bin)
    n_edges_hist = np.bincount(deg_vals - 1,
                               minlength=n_edges_to_bin).astype(float)
    total = n_edges_hist.sum()
    avg_n_edges = float((n_edges_hist * np.arange(1, n_edges_to_bin + 1)).sum()
                        / total) if total else 0.0

    # bond type histogram
    edge_feature_hist = edges.sum(axis=(0, 1, 2)) / 2.0

    props: Dict[Tuple[str, str], object] = {
        (epoch_key, "n_nodes_hist"): n_nodes_hist,
        (epoch_key, "avg_n_nodes"): round(avg_n_nodes, 3),
        (epoch_key, "atom_type_hist"): atom_type_hist,
        (epoch_key, "formal_charge_hist"): formal_charge_hist,
        (epoch_key, "n_edges_hist"): n_edges_hist,
        (epoch_key, "avg_n_edges"): round(avg_n_edges, 3),
        (epoch_key, "edge_feature_hist"): edge_feature_hist,
        (epoch_key, "numh_hist"): numh_hist,
        (epoch_key, "chirality_hist"): chirality_hist,
    }

    if smiles is not None:
        uniq = {s for s in smiles if s is not None}
        props[(epoch_key, "fraction_unique")] = (
            round(len(uniq) / len(smiles), 3) if smiles else 0.0)
    if validity is not None:
        props[(epoch_key, "fraction_valid")] = round(float(np.mean(validity)), 3)
    elif epoch_key == "Training set":
        props[(epoch_key, "fraction_valid")] = 1.0
        props.setdefault((epoch_key, "fraction_unique"), 0.0)
    return props


def merge_ts_properties(parts: List[Dict], weights: List[int]) -> Dict:
    """Weighted merge of per-group property dicts (exact, unlike the
    reference's running average): histograms sum, and the averages are
    recomputed FROM the merged histograms -- a molecule-weighted average of
    per-part means would bias per-node statistics (avg_n_edges) whenever
    parts differ in nodes-per-molecule."""
    if not parts:
        return {}
    out: Dict = {}
    wsum = float(sum(weights))
    for key in parts[0]:
        vals = [np.asarray(p[key], dtype=float) for p in parts]
        name = key[1]
        if name.endswith("_hist"):
            out[key] = sum(vals)                       # histograms: plain sums
        else:
            out[key] = round(float(
                sum(v * w for v, w in zip(vals, weights)) / wsum), 3)
    for key in list(out):
        epoch_key, name = key
        if name == "avg_n_nodes":
            hist = out.get((epoch_key, "n_nodes_hist"))
            if hist is not None and np.sum(hist):      # bin k = k nodes
                out[key] = round(float(
                    np.sum(hist * np.arange(len(hist))) / np.sum(hist)), 3)
        elif name == "avg_n_edges":
            hist = out.get((epoch_key, "n_edges_hist"))
            if hist is not None and np.sum(hist):      # bin k = k+1 edges
                out[key] = round(float(
                    np.sum(hist * np.arange(1, len(hist) + 1))
                    / np.sum(hist)), 3)
    return out


def properties_to_csv_rows(props: Dict[Tuple[str, str], object]) -> List[str]:
    """Serialises in the reference's ts-properties format
    (``('Training set', 'n_nodes_hist');[...]``, util.py:715-742)."""
    rows = []
    for key, value in props.items():
        if isinstance(value, np.ndarray):
            value = [round(float(v), 3) for v in value]
        rows.append(f"\"{key}\";{value}")
    return rows


def write_ts_properties_csv(path: str, props: Dict) -> None:
    import csv as _csv
    with open(path, "w", newline="") as fh:
        w = _csv.writer(fh, delimiter=";")
        for key, value in props.items():
            if isinstance(value, np.ndarray):
                value = [float(round(float(v), 3)) for v in value]
            w.writerow([key, value])


def load_ts_properties_csv(path: str) -> Dict:
    """Reads a ts-properties CSV written by us or by the reference
    (util.py:196-238)."""
    import ast
    import csv as _csv
    out: Dict = {}
    with open(path, newline="") as fh:
        for row in _csv.reader(fh, delimiter=";"):
            if len(row) != 2:
                continue
            key = ast.literal_eval(row[0])
            try:
                value = ast.literal_eval(row[1])
            except (ValueError, SyntaxError):
                value = row[1]
            if isinstance(value, list):
                value = np.asarray(value, dtype=float)
            out[tuple(key)] = value
    return out
