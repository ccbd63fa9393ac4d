import os

import h5py
import numpy as np
import pytest

from graphinvent_tpu.config import preset
from graphinvent_tpu.data import BlockLoader, HDFDataset
from graphinvent_tpu.data.preprocess import (
    Preprocessor, combine_shards, preprocess_dataset, read_smiles_file,
)

SMILES = ["CC", "CCC", "CCO", "CC(C)C", "C1CC1", "OC1CC1", "NCCN", "CC#N",
          "CC=O", "CSC"]


@pytest.fixture()
def dataset_dir(tmp_path):
    for split, rows in [("train", SMILES), ("valid", SMILES[:4]),
                        ("test", SMILES[4:8])]:
        with open(tmp_path / f"{split}.smi", "w") as fh:
            fh.write("SMILES Name\n")
            for i, s in enumerate(rows):
                fh.write(f"{s} {i}\n")
    return str(tmp_path) + "/"


def test_read_smiles_header(dataset_dir):
    rows = read_smiles_file(os.path.join(dataset_dir, "train.smi"))
    assert rows == SMILES


def test_preprocess_creates_valid_hdf(dataset_dir):
    cfg = preset("GGNN", dataset_dir=dataset_dir, batch_size=16,
                 job_type="preprocess")
    preprocess_dataset(cfg)
    with h5py.File(os.path.join(dataset_dir, "train.h5")) as f:
        nodes, edges, apds = f["nodes"][:], f["edges"][:], f["APDs"][:]
    assert nodes.dtype == np.int8
    assert nodes.shape[1:] == (13, 8)
    assert edges.shape[1:] == (13, 13, 3)
    assert apds.shape[1] == cfg.dim_apd
    # every APD has positive mass and at least n_molecules terminations
    assert (apds.sum(1) >= 1).all()
    assert (apds[:, -1] > 0).sum() >= 1
    # ts-properties written for the training set
    assert os.path.exists(os.path.join(dataset_dir, "train.csv"))


def test_preprocess_dedupes_subgraphs(dataset_dir):
    """The empty graph appears in every molecule's route; after dedupe it
    must appear once per group with summed APD mass."""
    cfg = preset("GGNN", dataset_dir=dataset_dir, batch_size=1000,
                 job_type="preprocess")
    pre = Preprocessor(cfg, os.path.join(dataset_dir, "valid.smi"))
    pre.run()
    with h5py.File(os.path.join(dataset_dir, "valid.h5")) as f:
        nodes, apds = f["nodes"][:], f["APDs"][:]
    empty_rows = np.where(nodes.reshape(len(nodes), -1).sum(1) == 0)[0]
    assert len(empty_rows) == 1                 # deduped
    assert apds[empty_rows[0]].sum() == 4       # one count per molecule


def test_refuses_overwrite(dataset_dir):
    cfg = preset("GGNN", dataset_dir=dataset_dir, batch_size=16,
                 job_type="preprocess")
    preprocess_dataset(cfg)
    with pytest.raises(OSError):
        preprocess_dataset(cfg)


def test_sharded_preprocessing_and_combine(dataset_dir):
    cfg = preset("GGNN", dataset_dir=dataset_dir, batch_size=16)
    smi = os.path.join(dataset_dir, "train.smi")
    paths = []
    for shard in range(2):
        p = Preprocessor(cfg, smi, shard_index=shard, num_shards=2)
        paths.append(p.run())
    out = combine_shards(paths, os.path.join(dataset_dir, "combined.h5"))
    with h5py.File(out) as f:
        n_combined = f["nodes"].shape[0]
    # single-shard run for comparison (dedupe groups differ slightly by
    # ordering, but total subgraph mass must match)
    p_all = Preprocessor(cfg, smi)
    p_all.run()
    with h5py.File(os.path.join(dataset_dir, "train.h5")) as f:
        apd_mass_single = f["APDs"][:].sum()
    with h5py.File(out) as f:
        apd_mass_combined = f["APDs"][:].sum()
    assert apd_mass_single == apd_mass_combined


def test_block_loader_covers_dataset(dataset_dir):
    cfg = preset("GGNN", dataset_dir=dataset_dir, batch_size=16)
    Preprocessor(cfg, os.path.join(dataset_dir, "train.smi")).run()
    ds = HDFDataset(os.path.join(dataset_dir, "train.h5"))
    loader = BlockLoader(ds, batch_size=7, block_size=20, seed=0)
    total_valid = 0
    for batch in loader:
        assert batch["nodes"].shape[0] == 7          # fixed shapes
        assert batch["valid"].shape == (7,)
        total_valid += int(batch["valid"].sum())
    assert total_valid == len(ds)
    assert len(loader) >= total_valid // 7


def test_block_loader_sharding(dataset_dir):
    cfg = preset("GGNN", dataset_dir=dataset_dir, batch_size=16)
    Preprocessor(cfg, os.path.join(dataset_dir, "valid.smi")).run()
    ds = HDFDataset(os.path.join(dataset_dir, "valid.h5"))
    n0 = sum(int(b["valid"].sum()) for b in
             BlockLoader(ds, 4, 8, shard_index=0, num_shards=2, seed=0))
    n1 = sum(int(b["valid"].sum()) for b in
             BlockLoader(ds, 4, 8, shard_index=1, num_shards=2, seed=0))
    assert n0 + n1 == len(ds)


def test_loader_reads_reference_hdf():
    """Our loader must consume HDF files produced by the reference."""
    path = "/root/reference/data/pre-training/gdb13_1K-debug/train.h5"
    if not os.path.exists(path):
        pytest.skip("reference debug HDF not available")
    ds = HDFDataset(path)
    assert len(ds) == 150
    batch = next(iter(BlockLoader(ds, 10, 50, seed=0)))
    assert batch["nodes"].shape == (10, 13, 8)
    assert batch["apds"].shape[1] == 625
