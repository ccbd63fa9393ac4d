"""Feature-mode coverage: aromatic bonds, implicit-H features, chirality.

The reference supports four featurization toggles (use_aromatic_bonds,
ignore_H/use_explicit_H, use_chirality; parameters/defaults.py:45-55); each
changes the APD dimensions (constants.py:56-95).
"""

import numpy as np
import pytest

from graphinvent_tpu.config import preset, test_config as tiny_config
from graphinvent_tpu.chem import mol_from_smiles, mol_to_smiles
from graphinvent_tpu.chem.molgraph import (
    decoding_route, graph_to_mol, ordered_graph,
)


def test_aromatic_bonds_roundtrip():
    cfg = preset("GGNN", use_aromatic_bonds=True)
    assert cfg.n_edge_features == 4
    for s in ["c1ccccc1", "Cc1ccncc1", "CC(=O)Nc1ccc(O)cc1"]:
        m = mol_from_smiles(s, kekulize_mol=False)
        nodes, edges, n = ordered_graph(m, cfg)
        assert edges.shape[-1] == 4
        assert edges[..., 3].sum() > 0           # aromatic bonds present
        m2 = graph_to_mol(nodes, edges, n, cfg)
        assert m2.is_valid()
        assert mol_to_smiles(m2) == mol_to_smiles(m)


def test_aromatic_route_apds_one_hot():
    cfg = preset("GGNN", use_aromatic_bonds=True)
    m = mol_from_smiles("c1ccncc1", kekulize_mol=False)
    route = list(decoding_route(m, cfg))
    assert len(route) == len(m.bonds) + 2
    for _, _, apd in route:
        assert apd.sum() == 1
        assert apd.shape == (cfg.dim_apd,)


def test_implicit_h_featurization_roundtrip():
    cfg = preset("GGNN", ignore_H=False)
    for s in ["CCO", "CC(=O)N", "C[N+](C)(C)C"]:
        m = mol_from_smiles(s)
        nodes, edges, n = ordered_graph(m, cfg)
        assert nodes.shape[-1] == cfg.n_node_features == 12
        m2 = graph_to_mol(nodes, edges, n, cfg)
        assert mol_to_smiles(m2) == mol_to_smiles(m)


def test_chirality_featurization():
    cfg = preset("GGNN", use_chirality=True)
    assert cfg.n_chirality == 3
    m = mol_from_smiles("C[C@H](N)C(=O)O")
    nodes, edges, n = ordered_graph(m, cfg)
    assert nodes.shape[-1] == cfg.n_node_features
    # exactly one chirality column set per atom
    chir_block = nodes[:n, cfg.feature_offsets[-2]:cfg.feature_offsets[-1]]
    assert (chir_block.sum(axis=1) == 1).all()
    # the stereocenter is not in the "None" column
    assert chir_block[:, 1:].sum() >= 1


def test_model_forward_all_modes():
    import jax
    from graphinvent_tpu.models import apply_model, init_model
    for kw in [dict(use_aromatic_bonds=True), dict(ignore_H=False),
               dict(use_chirality=True)]:
        cfg = tiny_config("GGNN", **kw)
        params = init_model(cfg, jax.random.PRNGKey(0))
        m = mol_from_smiles("CCO")
        nodes, edges, n = ordered_graph(m, cfg)
        out = apply_model(cfg, params,
                          np.asarray(nodes, np.float32)[None],
                          np.asarray(edges, np.float32)[None])
        assert out.shape == (1, cfg.dim_apd)
        assert np.isfinite(np.asarray(out)).all()
