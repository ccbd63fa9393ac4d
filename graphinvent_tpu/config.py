"""Configuration system for graphinvent-tpu.

A single frozen dataclass replaces the reference's import-time global
``constants`` namedtuple (reference: graphinvent/parameters/constants.py:135-266
and graphinvent/parameters/defaults.py:93-441).  Differences by design:

* explicit, serializable, passed by value -- no import-time side effects;
* ``input.csv`` override files are still understood (same ``;``-delimited
  format, reference: parameters/load.py:98-115) but values are parsed with
  ``ast.literal_eval`` instead of ``eval``;
* optimizer/scheduler state is checkpointed together with the model (the
  reference silently re-initialised Adam on restart, Workflow.py:208-237).

Derived tensor dimensions mirror parameters/constants.py:38-95 exactly so the
HDF files written by the reference can be consumed unchanged.
"""

from __future__ import annotations

import ast
import dataclasses
import json
import os
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional, Tuple

MODEL_NAMES = ("MNN", "S2V", "AttS2V", "GGNN", "AttGGNN", "EMN")

# Bond type encoding (reference: parameters/constants.py:159-166).  We use
# plain string names instead of rdkit.BondType enums; order is identical.
BOND_TYPES = ("single", "double", "triple")
BOND_TYPES_AROMATIC = ("single", "double", "triple", "aromatic")
BOND_ORDERS = {0: 1.0, 1: 2.0, 2: 3.0, 3: 1.5}  # index -> bond order


# --------------------------------------------------------------------------
# Per-model hyperparameter presets (reference: parameters/defaults.py:145-433).
# --------------------------------------------------------------------------
_COMMON_MLP = dict(
    mlp1_depth=4, mlp1_dropout_p=0.0, mlp1_hidden_dim=500,
    mlp2_depth=4, mlp2_dropout_p=0.0, mlp2_hidden_dim=500,
)
_GATHER = dict(
    gather_att_depth=4, gather_att_dropout_p=0.0, gather_att_hidden_dim=250,
    gather_emb_depth=4, gather_emb_dropout_p=0.0, gather_emb_hidden_dim=250,
    gather_width=100,
)

MODEL_PRESETS: Dict[str, Dict[str, Any]] = {
    "MNN": dict(
        hidden_node_features=100, message_passes=3, message_size=100,
        **_COMMON_MLP,
    ),
    "S2V": dict(
        enn_depth=4, enn_dropout_p=0.0, enn_hidden_dim=250,
        hidden_node_features=100, message_passes=3, message_size=100,
        s2v_lstm_computations=3, s2v_memory_size=100,
        **_COMMON_MLP,
    ),
    "AttS2V": dict(
        att_depth=4, att_dropout_p=0.0, att_hidden_dim=250,
        enn_depth=4, enn_dropout_p=0.0, enn_hidden_dim=250,
        hidden_node_features=100, message_passes=3, message_size=100,
        s2v_lstm_computations=3, s2v_memory_size=100,
        **_COMMON_MLP,
    ),
    "GGNN": dict(
        enn_depth=4, enn_dropout_p=0.0, enn_hidden_dim=250,
        hidden_node_features=100, message_passes=3, message_size=100,
        **_COMMON_MLP, **_GATHER,
    ),
    "AttGGNN": dict(
        att_depth=4, att_dropout_p=0.0, att_hidden_dim=250,
        msg_depth=4, msg_dropout_p=0.0, msg_hidden_dim=250,
        hidden_node_features=100, message_passes=3, message_size=100,
        **_COMMON_MLP, **_GATHER,
    ),
    "EMN": dict(
        att_depth=4, att_dropout_p=0.0, att_hidden_dim=250,
        edge_emb_depth=4, edge_emb_dropout_p=0.0, edge_emb_hidden_dim=250,
        edge_emb_size=100,
        msg_depth=4, msg_dropout_p=0.0, msg_hidden_dim=250,
        message_passes=3,
        **_COMMON_MLP, **_GATHER,
    ),
}


@dataclass(frozen=True)
class GraphInventConfig:
    """All job parameters + model hyperparameters + derived dimensions.

    Field names intentionally match the reference's parameter dictionary keys
    (parameters/defaults.py:93-128) so that ``input.csv`` job files written for
    the reference work unchanged.
    """

    # ---- chemistry / featurization -------------------------------------
    atom_types: Tuple[str, ...] = ("C", "N", "O", "S", "Cl")
    formal_charge: Tuple[int, ...] = (-1, 0, 1)
    imp_H: Tuple[int, ...] = (0, 1, 2, 3)
    chirality: Tuple[str, ...] = ("None", "R", "S")
    max_n_nodes: int = 13
    use_aromatic_bonds: bool = False
    use_canon: bool = True
    use_chirality: bool = False
    use_explicit_H: bool = False
    ignore_H: bool = True
    decoding_route: str = "bfs"

    # ---- job -----------------------------------------------------------
    job_type: str = "train"              # preprocess|train|generate|test|fine-tune
    job_dir: str = "./output/"
    dataset_dir: str = "data/gdb13_1K/"
    restart: bool = False
    device: str = "tpu"                  # accepted for compat; ignored (jax picks)

    # ---- training ------------------------------------------------------
    batch_size: int = 1000
    block_size: int = 100000
    # device-resident epoch budget: datasets whose int8 arrays fit under
    # this many GiB of HBM skip the block loader entirely (train/
    # device_data.py).  A v5e keeps ~10 GiB free beside reference-dim
    # models; raise it for big HBM parts, lower it for big models.
    device_data_gb: float = 6.0
    # streamed (bigger-than-HBM) training wire format: bitpack the 0/1
    # node/edge tensors and keep APDs int8 on the host->device upload
    # (~8x smaller; unpacked on device inside the jitted step) and push
    # batch k+1's upload onto a worker thread while batch k computes
    stream_packed: bool = True
    stream_upload_ahead: bool = True
    # sparse APD targets on the streamed wire: fixed-width (index, value)
    # slots per row (the dense int8 APD row was ~70% of the packed upload
    # bytes; measured max 8 nonzeros/row on the 100k ChEMBL-proxy set).
    # Batches where a row exceeds the cap fall back to the dense wire
    # automatically; 0 disables.  Also bounds the host RSS the leaky axon
    # tunnel client retains per upload (docs/9 round 5).
    stream_apd_nnz: int = 32
    # inference forwards route the stacked edge-type ENN through the fused
    # Pallas kernel (models/fused_enn.py) on single-device TPU: the XLA
    # path writes every (E,B,N,250) hidden layer to HBM, the kernel keeps
    # them in VMEM (measured 1.53x on the ENN at N=40 B=1000 bf16)
    fused_inference_enn: bool = True
    # RL replay-gradient remat granularity: checkpoint every k-th scan
    # carry (1 = per-step remat).  Swept in round 5; 1 measured fastest
    # at N=40 B=500 (BASELINE.md RL table)
    rl_remat_segment: int = 1
    epochs: int = 100
    init_lr: float = 1e-4
    max_rel_lr: float = 1.0
    min_rel_lr: float = 1e-4
    weights_initialization: str = "uniform"
    model: str = "GGNN"
    sample_every: int = 10
    # chunked-restart support: when resuming (restart=True) with epochs set
    # to the REMAINING chunk, set this to the original total so the
    # OneCycle LR plan keeps its shape (0 = use epochs).  Needed when one
    # process cannot carry a whole run -- e.g. the axon tunnel client
    # retains every host->device staging buffer (~uploaded bytes of host
    # RSS; docs/9 round 5), so >HBM streamed runs chunk across processes.
    schedule_epochs: int = 0
    generation_epoch: int = 30
    n_samples: int = 2000
    n_workers: int = 2
    # two-phase straggler harvest for generate jobs (sampling/two_phase.py):
    # cap phase-1 at this many rounds and resume live rows in compacted
    # continuation batches.  0 = off (the default; worthwhile only at
    # long-tail dims -- see the round-5 occupancy table, e.g. 57 at N=80).
    # Single-host, unmeshed jobs only; ignored otherwise.
    gen_two_phase_rounds: int = 0
    seed: int = 0
    # activation compute dtype: bfloat16 is the production default (matmuls
    # run at the MXU's full rate with f32 accumulation; losses/optimizer stay
    # f32).  Set "float32" for bit-exact parity work.
    compute_dtype: str = "bfloat16"

    # ---- RL fine-tuning ------------------------------------------------
    score_components: Tuple[str, ...] = ("QED", "drd2_activity", "target_size=13")
    score_thresholds: Tuple[float, ...] = (0.5, 0.5, 0.0)
    score_type: str = "binary"
    qsar_models: Dict[str, str] = field(
        default_factory=lambda: {"drd2_activity": "data/fine-tuning/qsar_model.pickle"})
    pretrained_model_dir: str = "output/"
    sigma: float = 20.0
    alpha: float = 0.5

    # ---- tensorboard / misc -------------------------------------------
    tensorboard_dir: str = "tensorboard/"

    # ---- parallelism ---------------------------------------------------
    dp_devices: int = 0                  # 0 => all visible devices on the data axis
    mp_devices: int = 1                  # model-parallel axis size (APD head sharding)
    # edge-partitioned graph sharding (the sequence-parallel analogue,
    # SURVEY.md §2.2): node/neighbor axes of every (B,N,·)/(B,N,N,·)
    # activation shard over the mesh's ``graph`` axis; XLA turns the message
    # contraction into local partials + reduce-scatter over ICI.
    graph_devices: int = 1
    # multi-host execution (parallel/multihost.py): every process runs the
    # same job with host 0's ip:port here, plus num_processes and a unique
    # process_id (or the GRAPHINVENT_COORDINATOR/_NUM_PROCESSES/_PROCESS_ID
    # environment variables).  batch_size stays GLOBAL; each host feeds
    # batch_size // num_processes rows from its own block shard.
    coordinator_address: str = ""
    num_processes: int = 1
    process_id: int = -1                 # -1 => from env
    # sharded preprocessing (data/preprocess.py): split each .smi into
    # num_shards molecule shards.  Single process: 0/1 = no sharding; >1 runs
    # all shards sequentially then combines, unless preprocess_shard_index
    # picks ONE shard (the reference's one-shard-per-SLURM-job flow,
    # tools/submit-split-preprocessing-supercloud.py; combine afterwards with
    # tools/combine_hdfs.py).  Multi-host: defaults to one shard per process,
    # process 0 combines + writes train.csv.
    preprocess_num_shards: int = 0
    preprocess_shard_index: int = -1

    # ---- model hyperparameters (filled from MODEL_PRESETS) -------------
    hidden_node_features: int = 100
    message_passes: int = 3
    message_size: int = 100
    mlp1_depth: int = 4
    mlp1_dropout_p: float = 0.0
    mlp1_hidden_dim: int = 500
    mlp2_depth: int = 4
    mlp2_dropout_p: float = 0.0
    mlp2_hidden_dim: int = 500
    enn_depth: int = 4
    enn_dropout_p: float = 0.0
    enn_hidden_dim: int = 250
    att_depth: int = 4
    att_dropout_p: float = 0.0
    att_hidden_dim: int = 250
    msg_depth: int = 4
    msg_dropout_p: float = 0.0
    msg_hidden_dim: int = 250
    gather_att_depth: int = 4
    gather_att_dropout_p: float = 0.0
    gather_att_hidden_dim: int = 250
    gather_emb_depth: int = 4
    gather_emb_dropout_p: float = 0.0
    gather_emb_hidden_dim: int = 250
    gather_width: int = 100
    s2v_lstm_computations: int = 3
    s2v_memory_size: int = 100
    edge_emb_depth: int = 4
    edge_emb_dropout_p: float = 0.0
    edge_emb_hidden_dim: int = 250
    edge_emb_size: int = 100
    # EMN: run per-edge MLPs over a fixed-capacity packed edge list instead
    # of all N^2 dense slots (identical math; see models/mpnn.py)
    emn_packed: bool = True
    # Sampler action budget per graph (0 = the reference's 2*max_n_nodes
    # sizing, GraphGenerator.py:172).  A molecule of b bonds needs b + 2
    # actions, so the default clips only graphs denser than ~2 bonds/atom:
    # across all 3009 GDB-13 1K molecules the measured maximum is 20 of
    # the default 26 (zero clipped).  Raise for unusually dense chemistry.
    gen_max_actions: int = 0

    big_negative: float = -1e6
    big_positive: float = 1e6

    # ------------------------------------------------------------------
    # Derived dimensions (reference: parameters/constants.py:23-95,166-210)
    # ------------------------------------------------------------------
    @property
    def n_edge_features(self) -> int:
        return 4 if self.use_aromatic_bonds else 3

    @property
    def bond_types(self) -> Tuple[str, ...]:
        return BOND_TYPES_AROMATIC if self.use_aromatic_bonds else BOND_TYPES

    @property
    def n_atom_types(self) -> int:
        return len(self.atom_types)

    @property
    def n_formal_charge(self) -> int:
        return len(self.formal_charge)

    @property
    def n_imp_H(self) -> int:
        use = not self.use_explicit_H and not self.ignore_H
        return len(self.imp_H) if use else 0

    @property
    def n_chirality(self) -> int:
        return len(self.chirality) if self.use_chirality else 0

    @property
    def n_node_features(self) -> int:
        return (self.n_atom_types + self.n_formal_charge
                + self.n_imp_H + self.n_chirality)

    @property
    def dim_nodes(self) -> Tuple[int, int]:
        return (self.max_n_nodes, self.n_node_features)

    @property
    def dim_edges(self) -> Tuple[int, int, int]:
        return (self.max_n_nodes, self.max_n_nodes, self.n_edge_features)

    @property
    def dim_f_add(self) -> Tuple[int, ...]:
        """Shape of the f_add APD block (constants.py:56-89)."""
        dims: List[int] = [self.max_n_nodes, self.n_atom_types, self.n_formal_charge]
        if self.n_imp_H:
            dims.append(self.n_imp_H)
        if self.use_chirality:
            dims.append(self.n_chirality)
        dims.append(self.n_edge_features)
        return tuple(dims)

    @property
    def dim_f_conn(self) -> Tuple[int, int]:
        return (self.max_n_nodes, self.n_edge_features)

    @property
    def len_f_add(self) -> int:
        n = 1
        for d in self.dim_f_add:
            n *= d
        return n

    @property
    def len_f_add_per_node(self) -> int:
        return self.len_f_add // self.max_n_nodes

    @property
    def len_f_conn(self) -> int:
        return self.max_n_nodes * self.n_edge_features

    @property
    def len_f_conn_per_node(self) -> int:
        return self.n_edge_features

    @property
    def gen_action_budget(self) -> int:
        """Per-graph action/likelihood slots for sampling (see
        ``gen_max_actions``)."""
        return self.gen_max_actions or 2 * self.max_n_nodes

    @property
    def dim_apd(self) -> int:
        return self.len_f_add + self.len_f_conn + 1

    # ------------------------------------------------------------------
    # Feature-vector segment offsets (reference: util.py:26-47)
    # ------------------------------------------------------------------
    @property
    def feature_offsets(self) -> Tuple[int, ...]:
        """Cumulative end-indices of each one-hot segment in a node feature row."""
        sizes = [self.n_atom_types, self.n_formal_charge]
        if self.n_imp_H:
            sizes.append(self.n_imp_H)
        if self.use_chirality:
            sizes.append(self.n_chirality)
        out, acc = [], 0
        for s in sizes:
            acc += s
            out.append(acc)
        return tuple(out)

    # ------------------------------------------------------------------
    def validate(self) -> "GraphInventConfig":
        if self.use_explicit_H and self.ignore_H:
            raise ValueError("Cannot use explicit Hs and ignore Hs at the same "
                             "time (reference: constants.py:154-156).")
        if self.model not in MODEL_NAMES:
            raise ValueError(f"model must be one of {MODEL_NAMES}, got {self.model!r}")
        if self.job_type not in ("preprocess", "train", "generate", "test", "fine-tune"):
            raise ValueError(f"invalid job_type {self.job_type!r}")
        if self.decoding_route not in ("bfs", "dfs"):
            raise ValueError(f"invalid decoding_route {self.decoding_route!r}")
        if len(self.score_components) != len(self.score_thresholds):
            raise ValueError("score_components and score_thresholds do not match")
        # score components are only consumed by fine-tune jobs; the
        # reference's OWN default is the degenerate "target_size=13" with
        # max_n_nodes=13, so validating other job types would reject every
        # default config
        for comp in (self.score_components
                     if self.job_type == "fine-tune" else ()):
            if comp.startswith("target_size"):
                try:
                    target = int(comp.split("=", 1)[1])
                except (IndexError, ValueError):
                    raise ValueError(
                        f"malformed score component {comp!r}: expected "
                        f"'target_size=<int>'")
                # the reference's 1 - |n-target|/(max-target) divides by zero
                # at target == max_n_nodes (ScoringFunction.py:111-129); a
                # real round-4 run with it scored 0.0 throughout (docs/7)
                if not (0 < target < self.max_n_nodes):
                    raise ValueError(
                        f"target_size={target} must satisfy 0 < target < "
                        f"max_n_nodes ({self.max_n_nodes}): the score "
                        f"1 - |n - target|/(max_n_nodes - target) is "
                        f"degenerate at the boundary")
        return self

    # ------------------------------------------------------------------
    def replace(self, **kw: Any) -> "GraphInventConfig":
        return dataclasses.replace(self, **kw).validate()

    def to_dict(self) -> Dict[str, Any]:
        return dataclasses.asdict(self)

    def to_json(self) -> str:
        return json.dumps(self.to_dict(), indent=2, default=list)

    # ------------------------------------------------------------------
    # input.csv compatibility layer
    # ------------------------------------------------------------------
    @staticmethod
    def _parse_value(value: str) -> Any:
        value = value.strip()
        try:
            return ast.literal_eval(value)
        except (ValueError, SyntaxError):
            return value  # plain string

    @classmethod
    def from_overrides(cls, overrides: Dict[str, Any],
                       base: Optional["GraphInventConfig"] = None) -> "GraphInventConfig":
        """Builds a config from a dict of overrides, applying the model preset
        first (mirroring defaults.py:135-141 + 441) and then explicit values."""
        model = str(overrides.get("model", (base.model if base else "GGNN")))
        merged: Dict[str, Any] = {}
        if base is not None:
            merged.update(base.to_dict())
        merged.update(MODEL_PRESETS.get(model, {}))
        field_names = {f.name for f in dataclasses.fields(cls)}
        for key, value in overrides.items():
            if key in field_names:
                merged[key] = value
        merged["model"] = model
        merged = {k: v for k, v in merged.items() if k in field_names}
        # normalise list -> tuple for hashability of the frozen dataclass
        for key in ("atom_types", "formal_charge", "imp_H", "chirality",
                    "score_components", "score_thresholds"):
            if key in merged and isinstance(merged[key], list):
                merged[key] = tuple(merged[key])
        return cls(**merged).validate()

    @classmethod
    def from_csv(cls, csv_path: str,
                 base: Optional["GraphInventConfig"] = None) -> "GraphInventConfig":
        """Reads a reference-format ``input.csv`` (``key;value`` lines)."""
        overrides: Dict[str, Any] = {}
        with open(csv_path) as fh:
            for line in fh:
                line = line.strip()
                if not line or ";" not in line:
                    continue
                key, _, value = line.partition(";")
                overrides[key.strip()] = cls._parse_value(value)
        return cls.from_overrides(overrides, base=base)

    @classmethod
    def from_job_dir(cls, job_dir: str,
                     base: Optional["GraphInventConfig"] = None) -> "GraphInventConfig":
        """Loads ``<job_dir>/input.csv`` if present, then pins job_dir."""
        job_dir = job_dir if job_dir.endswith("/") else job_dir + "/"
        csv_path = os.path.join(job_dir, "input.csv")
        if os.path.exists(csv_path):
            cfg = cls.from_csv(csv_path, base=base)
        else:
            cfg = (base or cls()).validate()
        return cfg.replace(job_dir=job_dir)

    def write_csv(self, csv_path: str) -> None:
        """Writes this config in the reference's input.csv format."""
        with open(csv_path, "w") as fh:
            for key, value in sorted(self.to_dict().items()):
                if isinstance(value, tuple):
                    value = list(value)
                fh.write(f"{key};{value!r}\n" if isinstance(value, str)
                         else f"{key};{value}\n")

    def check_preprocessing_params(self) -> None:
        """Cross-checks this config against ``preprocessing_params.csv`` in the
        dataset dir (reference: constants.py:223-247)."""
        csv_file = os.path.join(self.dataset_dir, "preprocessing_params.csv")
        if not os.path.exists(csv_file):
            return
        me = self.to_dict()
        with open(csv_file) as fh:
            for line in fh:
                line = line.strip()
                if not line or ";" not in line:
                    continue
                key, _, value = line.partition(";")
                key = key.strip()
                if key not in me:
                    continue
                want = self._parse_value(value)
                have = me[key]
                if isinstance(have, tuple):
                    have = list(have)
                if isinstance(want, tuple):
                    want = list(want)
                if want != have:
                    raise ValueError(
                        f"Training job parameter {key!r}={have!r} does not match "
                        f"preprocessing value {want!r} "
                        f"(reference check: constants.py:239-244).")


def preset(model: str = "GGNN", **overrides: Any) -> GraphInventConfig:
    """Convenience constructor: model preset + overrides."""
    overrides = dict(overrides)
    overrides["model"] = model
    return GraphInventConfig.from_overrides(overrides)


# A tiny config for tests: gdb13-like chemistry, small nets.
def test_config(model: str = "GGNN", **overrides: Any) -> GraphInventConfig:
    small = dict(
        mlp1_depth=2, mlp1_hidden_dim=24, mlp2_depth=2, mlp2_hidden_dim=24,
        enn_depth=2, enn_hidden_dim=12, att_depth=2, att_hidden_dim=12,
        msg_depth=2, msg_hidden_dim=12,
        gather_att_depth=2, gather_att_hidden_dim=12,
        gather_emb_depth=2, gather_emb_hidden_dim=12, gather_width=10,
        hidden_node_features=16, message_size=16, message_passes=2,
        s2v_lstm_computations=2, s2v_memory_size=16,
        edge_emb_depth=2, edge_emb_hidden_dim=12, edge_emb_size=16,
        batch_size=8, block_size=64, epochs=2, n_samples=8, sample_every=1,
        compute_dtype="float32",   # deterministic CPU tests / torch parity
    )
    small.update(overrides)
    return preset(model, **small)
