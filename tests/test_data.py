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


def test_restarted_preprocess_writes_train_csv(dataset_dir, monkeypatch):
    """A crash mid-preprocess + restart must still produce train.csv AND a
    byte-identical HDF to an uninterrupted run (round-2 verdict: the old
    streamed-statistics path silently skipped train.csv on restart)."""
    from graphinvent_tpu.eval.properties import load_ts_properties_csv

    cfg = preset("GGNN", dataset_dir=dataset_dir, batch_size=8,
                 job_type="preprocess")
    smi = os.path.join(dataset_dir, "train.smi")

    # uninterrupted reference run
    Preprocessor(cfg, smi, is_training_set=True).run()
    with h5py.File(os.path.join(dataset_dir, "train.h5")) as f:
        ref = {k: f[k][:] for k in ("nodes", "edges", "APDs")}
    ref_props = load_ts_properties_csv(os.path.join(dataset_dir, "train.csv"))
    os.remove(os.path.join(dataset_dir, "train.h5"))
    os.remove(os.path.join(dataset_dir, "train.csv"))

    # crash after 5 molecules
    orig_routes = Preprocessor._routes
    state = {"n": 0}

    def crashing(self, start=0):
        for item in orig_routes(self, start):
            if state["n"] >= 5:
                raise RuntimeError("simulated crash")
            state["n"] += 1
            yield item

    monkeypatch.setattr(Preprocessor, "_routes", crashing)
    with pytest.raises(RuntimeError):
        Preprocessor(cfg, smi, is_training_set=True).run()
    monkeypatch.setattr(Preprocessor, "_routes", orig_routes)
    assert os.path.exists(os.path.join(dataset_dir, "index.restart"))

    Preprocessor(cfg, smi, is_training_set=True).run(restart=True)
    with h5py.File(os.path.join(dataset_dir, "train.h5")) as f:
        for k in ("nodes", "edges", "APDs"):
            np.testing.assert_array_equal(f[k][:], ref[k])
    props = load_ts_properties_csv(os.path.join(dataset_dir, "train.csv"))
    assert props.keys() == ref_props.keys()
    for k in props:
        np.testing.assert_allclose(np.asarray(props[k], dtype=float),
                                   np.asarray(ref_props[k], dtype=float))


def test_ts_properties_match_molecule_statistics(dataset_dir):
    """train.csv (recomputed from the finished HDF's terminate rows) must
    equal direct statistics over the full molecules."""
    from graphinvent_tpu.chem import mol_from_smiles
    from graphinvent_tpu.chem.molgraph import ordered_graph
    from graphinvent_tpu.data.preprocess import ts_properties_from_hdf
    from graphinvent_tpu.eval.properties import graph_set_properties

    cfg = preset("GGNN", dataset_dir=dataset_dir, batch_size=16)
    smi = os.path.join(dataset_dir, "train.smi")
    Preprocessor(cfg, smi, is_training_set=True).run()
    props, n_mols = ts_properties_from_hdf(
        cfg, os.path.join(dataset_dir, "train.h5"), chunk=7)
    assert n_mols == len(SMILES)

    graphs = [ordered_graph(mol_from_smiles(s), cfg) for s in SMILES]
    expected = graph_set_properties(
        cfg, np.stack([g[0] for g in graphs]).astype(np.float32),
        np.stack([g[1] for g in graphs]).astype(np.float32),
        np.asarray([g[2] for g in graphs]))
    for k, v in expected.items():
        # chunked parts round means to 3 decimals before the weighted merge
        np.testing.assert_allclose(np.asarray(props[k], dtype=float),
                                   np.asarray(v, dtype=float), atol=5e-3)


def test_preprocess_job_reachable_sharding(dataset_dir, tmp_path):
    """The preprocess JOB honors preprocess_num_shards: a 2-shard run
    combines into the same dataset mass as unsharded, removes shard files,
    and writes train.csv + preprocessing_params.csv (round-2 verdict item:
    sharding existed but preprocess_dataset couldn't invoke it)."""
    cfg = preset("GGNN", dataset_dir=dataset_dir, batch_size=16,
                 job_type="preprocess", preprocess_num_shards=2)
    preprocess_dataset(cfg)
    for split in ("train", "valid", "test"):
        assert os.path.exists(os.path.join(dataset_dir, f"{split}.h5"))
        assert not os.path.exists(
            os.path.join(dataset_dir, f"{split}.h5.shard0"))
    assert os.path.exists(os.path.join(dataset_dir, "train.csv"))
    assert os.path.exists(os.path.join(dataset_dir,
                                       "preprocessing_params.csv"))
    with h5py.File(os.path.join(dataset_dir, "train.h5")) as f:
        mass_sharded = f["APDs"][:].sum()
        n_term = (f["APDs"][:, -1] > 0).sum()
    assert n_term >= 1

    # unsharded run in a second dir for comparison
    dir2 = str(tmp_path / "unsharded") + "/"
    os.makedirs(dir2)
    import shutil
    shutil.copy(os.path.join(dataset_dir, "train.smi"), dir2)
    cfg2 = preset("GGNN", dataset_dir=dir2, batch_size=16,
                  job_type="preprocess")
    preprocess_dataset(cfg2)
    with h5py.File(os.path.join(dir2, "train.h5")) as f:
        assert f["APDs"][:].sum() == mass_sharded

    # the resulting config check passes against the written params file
    preset("GGNN", dataset_dir=dataset_dir).check_preprocessing_params()


def test_preprocess_single_shard_job(dataset_dir):
    """preprocess_shard_index runs exactly one shard (the reference's
    one-shard-per-SLURM-job flow) and writes no combined file."""
    cfg = preset("GGNN", dataset_dir=dataset_dir, batch_size=16,
                 job_type="preprocess", preprocess_num_shards=2,
                 preprocess_shard_index=1)
    preprocess_dataset(cfg)
    assert os.path.exists(os.path.join(dataset_dir, "train.h5.shard1"))
    assert not os.path.exists(os.path.join(dataset_dir, "train.h5"))
    assert not os.path.exists(os.path.join(dataset_dir, "train.h5.shard0"))

    # complete the manual merge flow: run shard 0, merge with the CLI, and
    # check the merge step completes the dataset (train.csv AND
    # preprocessing_params.csv -- without the latter every later job loses
    # the config cross-check silently)
    import subprocess, sys
    preprocess_dataset(cfg.replace(preprocess_shard_index=0))
    job_dir = os.path.join(dataset_dir, "prejob/")
    os.makedirs(job_dir, exist_ok=True)
    cfg.replace(job_dir=job_dir).write_csv(os.path.join(job_dir, "input.csv"))
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    subprocess.run(
        [sys.executable, os.path.join(repo, "tools", "combine_hdfs.py"),
         os.path.join(dataset_dir, "train.h5"),
         os.path.join(dataset_dir, "train.h5.shard0"),
         os.path.join(dataset_dir, "train.h5.shard1"),
         "--job-dir", job_dir],
        check=True, env=dict(os.environ, JAX_PLATFORMS="cpu"))
    assert os.path.exists(os.path.join(dataset_dir, "train.h5"))
    assert os.path.exists(os.path.join(dataset_dir, "train.csv"))
    assert os.path.exists(os.path.join(dataset_dir,
                                       "preprocessing_params.csv"))
    preset("GGNN", dataset_dir=dataset_dir).check_preprocessing_params()


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


def test_packed_loader_roundtrips_exactly(dataset_dir):
    """The bitpacked streamed wire format must decode to the same batches
    the plain loader yields (byte-exact: 0/1 one-hots survive packbits)."""
    import jax.numpy as jnp
    from graphinvent_tpu.train.step import batch_arrays

    cfg = preset("GGNN", dataset_dir=dataset_dir, batch_size=16)
    Preprocessor(cfg, os.path.join(dataset_dir, "train.smi")).run()
    ds = HDFDataset(os.path.join(dataset_dir, "train.h5"))
    plain = list(BlockLoader(ds, 7, 20, seed=0))
    packed = list(BlockLoader(ds, 7, 20, seed=0, packed=True))
    assert len(plain) == len(packed)
    for p, q in zip(plain, packed):
        assert set(q) == {"nodes_p", "edges_p", "apds", "valid"}
        assert q["nodes_p"].dtype == np.uint8
        assert q["apds"].dtype == np.int8
        # nodes/edges pack 32x vs float32 (8x bits + 4x width), APDs 4x
        # (int8 counts aren't 0/1); at N=13 the APD term dominates so the
        # total is >=4x, at ChEMBL dims the N^2 edge term makes it ~25x
        assert (q["nodes_p"].nbytes + q["edges_p"].nbytes) * 32 \
            <= p["nodes"].nbytes + p["edges"].nbytes + 32 * 8
        plain_bytes = p["nodes"].nbytes + p["edges"].nbytes + p["apds"].nbytes
        packed_bytes = q["nodes_p"].nbytes + q["edges_p"].nbytes + q["apds"].nbytes
        assert packed_bytes * 4 < plain_bytes
        nodes, edges, apds, valid = batch_arrays(
            cfg, {k: jnp.asarray(v) for k, v in q.items()}, jnp.float32)
        np.testing.assert_array_equal(np.asarray(nodes), p["nodes"])
        np.testing.assert_array_equal(np.asarray(edges), p["edges"])
        np.testing.assert_array_equal(np.asarray(apds), p["apds"])
        np.testing.assert_array_equal(np.asarray(valid), p["valid"])
    # sparse APD wire (round 5): identical reconstruction, ~27x smaller
    # APD component
    sparse = list(BlockLoader(ds, 7, 20, seed=0, packed=True, apd_nnz=32))
    for p, q in zip(plain, sparse):
        assert set(q) == {"nodes_p", "edges_p", "apds_i", "apds_v", "valid"}
        assert q["apds_i"].nbytes + q["apds_v"].nbytes < p["apds"].nbytes / 8
        _, _, apds, _ = batch_arrays(
            cfg, {k: jnp.asarray(v) for k, v in q.items()}, jnp.float32)
        np.testing.assert_array_equal(np.asarray(apds), p["apds"])


def test_sparse_apds_overflow_falls_back_dense():
    from graphinvent_tpu.data.loader import sparse_apds

    apds = np.zeros((4, 100), np.int8)
    apds[0, :5] = 3
    idx, val = sparse_apds(apds, 8)
    rebuilt = np.zeros_like(apds)
    np.add.at(rebuilt, (np.repeat(np.arange(4), 8).reshape(4, 8), idx), val)
    np.testing.assert_array_equal(rebuilt, apds)
    apds[1, :9] = 1                      # 9 nonzeros > cap 8
    assert sparse_apds(apds, 8) is None
