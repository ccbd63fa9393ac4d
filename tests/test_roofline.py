"""tools/roofline.py helpers (the measurement harness behind BASELINE.md's
speed-of-light tables and bench.py's mfu/sol_fraction fields)."""

import numpy as np

from graphinvent_tpu.config import preset


def test_synthetic_batch_is_chemistry_shaped():
    from tools.roofline import synthetic_batch
    for n in (13, 40):
        cfg = preset("GGNN", max_n_nodes=n)
        nodes, edges, apds = synthetic_batch(cfg, batch_size=16, seed=2)
        assert edges.shape == (16, n, n, cfg.n_edge_features)
        # symmetric adjacency, no self loops, one bond type per pair
        adj = edges.sum(-1)
        np.testing.assert_array_equal(adj, np.swapaxes(adj, 1, 2))
        assert np.all(np.diagonal(adj, axis1=1, axis2=2) == 0)
        assert adj.max() == 1
        # degree capped at 4 (organic valence) so packed capacities hold
        assert adj.sum(-1).max() <= 4
        # one-hot APD target per row
        np.testing.assert_array_equal(apds.sum(1), np.ones(16))
        # every graph non-empty and connected as a chain at minimum
        assert (adj.sum((1, 2)) >= 2).all()


def test_roofline_row_cpu_no_spec():
    """Measurement path runs end-to-end on CPU; MFU fields only appear
    with a known chip spec."""
    from tools.roofline import chip_spec, roofline_row

    class FakeDev:
        device_kind = "cpu"

    assert chip_spec(FakeDev()) is None
    cfg = preset("MNN", batch_size=8, epochs=1, compute_dtype="float32")
    row = roofline_row(cfg, None, n_steps=2)
    assert row["flops"] > 0 and row["step_time_s"] > 0
    assert row["edges_per_s"] > 0
    assert "mfu" not in row

    class FakeV5e:
        device_kind = "TPU v5 lite"

    spec = chip_spec(FakeV5e())
    assert spec["name"] == "TPU v5e"
