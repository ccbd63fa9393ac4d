import os

import pytest

from graphinvent_tpu.config import GraphInventConfig, MODEL_PRESETS, preset


def test_default_dims_match_reference():
    # GDB-13 defaults: 5 atom types, 3 charges, ignore_H, no chirality
    cfg = preset("GGNN")
    assert cfg.n_node_features == 8
    assert cfg.n_edge_features == 3
    assert cfg.dim_f_add == (13, 5, 3, 3)
    assert cfg.len_f_add == 585
    assert cfg.len_f_conn == 39
    assert cfg.dim_apd == 625          # 585 + 39 + 1
    assert cfg.len_f_add_per_node == 45
    assert cfg.feature_offsets == (5, 8)


def test_imp_h_dims():
    cfg = preset("GGNN", ignore_H=False)
    assert cfg.n_imp_H == 4
    assert cfg.n_node_features == 12
    assert cfg.dim_f_add == (13, 5, 3, 4, 3)


def test_aromatic_bonds_dims():
    cfg = preset("GGNN", use_aromatic_bonds=True)
    assert cfg.n_edge_features == 4
    assert cfg.dim_f_add == (13, 5, 3, 4)


def test_presets_exist_for_all_models():
    for name in ("MNN", "S2V", "AttS2V", "GGNN", "AttGGNN", "EMN"):
        assert name in MODEL_PRESETS
        cfg = preset(name)
        assert cfg.model == name


def test_csv_roundtrip(tmp_path):
    cfg = preset("AttGGNN", batch_size=77, init_lr=3e-4,
                 atom_types=("C", "N"))
    path = tmp_path / "input.csv"
    cfg.write_csv(str(path))
    cfg2 = GraphInventConfig.from_csv(str(path))
    assert cfg2.model == "AttGGNN"
    assert cfg2.batch_size == 77
    assert cfg2.init_lr == 3e-4
    assert cfg2.atom_types == ("C", "N")


def test_explicit_and_ignore_h_conflict():
    with pytest.raises(ValueError):
        preset("GGNN", use_explicit_H=True, ignore_H=True)


def test_preprocessing_params_check(tmp_path):
    cfg = preset("GGNN", dataset_dir=str(tmp_path), max_n_nodes=13)
    with open(tmp_path / "preprocessing_params.csv", "w") as fh:
        fh.write("max_n_nodes;10\n")
    with pytest.raises(ValueError):
        cfg.check_preprocessing_params()
    with open(tmp_path / "preprocessing_params.csv", "w") as fh:
        fh.write("max_n_nodes;13\n")
    cfg.check_preprocessing_params()   # no raise
