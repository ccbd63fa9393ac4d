"""Import reference GraphINVENT (PyTorch) checkpoints as parameter pytrees.

Lets users of the reference migrate pretrained models directly: a
``model_restart_{epoch}.pth`` saved by the reference's ``Workflow``
(reference Workflow.py:493-500, ``torch.save(self.model.state_dict(), ..)``)
loads into this framework's corresponding model with identical math.

Key mapping (reference module attribute -> our param pytree):

  msg_nns.{e}.seq.{3l}.weight/bias      -> msg_nns.layers[l].{w,b}[e]   (stacked)
  att_nns.{e}.seq.{3l}.*                -> att_nns.layers[l].*[e]       (stacked)
  enn.seq.{3l}.* / att_enn.seq.{3l}.*   -> enn.layers[l].* / att_enn...
  embedding_nn / emb_msg_nn / att_msg_nn (EMN)   -> same names
  gru.weight_ih -> gru.w_ih  (+ weight_hh/bias_ih/bias_hh)
  gather.att_nn.seq.{3l}.* / gather.emb_nn...    -> gather.att_nn / emb_nn
  APDReadout.fAddNet1 -> apd.f_add_1  (fConnNet1/fAddNet2/fConnNet2/fTermNet2
                                       -> f_conn_1/f_add_2/f_conn_2/f_term_2)
  s2v.embedding_matrix.* -> s2v.embedding.*; s2v.lstm.weight_ih -> s2v.lstm.w_ih
  message_weights (MNN) -> message_weights  (same (M, H, E) layout,
                                             reference gnn/mpnn.py:22-30)

The reference MLP wraps each linear in [Linear, SELU, AlphaDropout]
(gnn/modules.py:160-164), so linears sit at Sequential indices 0, 3, 6, ...
Supports v2.0 checkpoints (plain state_dict).  v1.0 checkpoints pickle the
whole module object and can only be unpickled where the reference package
is importable (reference util.py:828-850) -- convert those to a state_dict
first.
"""

from __future__ import annotations

from typing import Any, Dict, Mapping

import numpy as np

from graphinvent_tpu.config import GraphInventConfig

Params = Any


def _to_np(v) -> np.ndarray:
    if hasattr(v, "detach"):
        v = v.detach().cpu().numpy()
    return np.asarray(v, np.float32)


def _mlp(sd: Mapping, prefix: str) -> Params:
    layers = []
    l = 0
    while f"{prefix}.seq.{3 * l}.weight" in sd:
        layers.append({"w": _to_np(sd[f"{prefix}.seq.{3 * l}.weight"]),
                       "b": _to_np(sd[f"{prefix}.seq.{3 * l}.bias"])})
        l += 1
    if not layers:
        raise KeyError(f"no linear layers found under {prefix!r} "
                       f"(expected {prefix}.seq.0.weight)")
    return {"layers": layers}


def _stacked_mlp(sd: Mapping, prefix: str, n_stack: int) -> Params:
    per = [_mlp(sd, f"{prefix}.{e}") for e in range(n_stack)]
    n_layers = len(per[0]["layers"])
    return {"layers": [
        {"w": np.stack([p["layers"][l]["w"] for p in per]),
         "b": np.stack([p["layers"][l]["b"] for p in per])}
        for l in range(n_layers)]}


def _cell(sd: Mapping, prefix: str) -> Params:
    return {"w_ih": _to_np(sd[f"{prefix}.weight_ih"]),
            "w_hh": _to_np(sd[f"{prefix}.weight_hh"]),
            "b_ih": _to_np(sd[f"{prefix}.bias_ih"]),
            "b_hh": _to_np(sd[f"{prefix}.bias_hh"])}


def _gather(sd: Mapping, prefix: str = "gather") -> Params:
    return {"att_nn": _mlp(sd, f"{prefix}.att_nn"),
            "emb_nn": _mlp(sd, f"{prefix}.emb_nn")}


def _apd(sd: Mapping, prefix: str = "APDReadout") -> Params:
    return {"f_add_1": _mlp(sd, f"{prefix}.fAddNet1"),
            "f_conn_1": _mlp(sd, f"{prefix}.fConnNet1"),
            "f_add_2": _mlp(sd, f"{prefix}.fAddNet2"),
            "f_conn_2": _mlp(sd, f"{prefix}.fConnNet2"),
            "f_term_2": _mlp(sd, f"{prefix}.fTermNet2")}


def _s2v(sd: Mapping, prefix: str = "s2v") -> Params:
    return {"embedding": {
                "w": _to_np(sd[f"{prefix}.embedding_matrix.weight"]),
                "b": _to_np(sd[f"{prefix}.embedding_matrix.bias"])},
            "lstm": _cell(sd, f"{prefix}.lstm")}


def params_from_torch_state_dict(cfg: GraphInventConfig,
                                 sd: Mapping) -> Params:
    """Converts a reference state_dict into this framework's param pytree
    for ``cfg.model``; validates shapes against a freshly-initialised
    template."""
    sd = {k[7:] if k.startswith("module.") else k: v for k, v in sd.items()}
    model = cfg.model
    E = cfg.n_edge_features
    if model == "MNN":
        params: Dict[str, Any] = {
            "message_weights": _to_np(sd["message_weights"]),
            "gru": _cell(sd, "gru"),
            "apd": _apd(sd)}
    elif model == "S2V":
        params = {"enn": _mlp(sd, "enn"), "gru": _cell(sd, "gru"),
                  "s2v": _s2v(sd), "apd": _apd(sd)}
    elif model == "AttS2V":
        params = {"enn": _mlp(sd, "enn"), "att_enn": _mlp(sd, "att_enn"),
                  "gru": _cell(sd, "gru"), "s2v": _s2v(sd), "apd": _apd(sd)}
    elif model == "GGNN":
        params = {"msg_nns": _stacked_mlp(sd, "msg_nns", E),
                  "gru": _cell(sd, "gru"), "gather": _gather(sd),
                  "apd": _apd(sd)}
    elif model == "AttGGNN":
        params = {"msg_nns": _stacked_mlp(sd, "msg_nns", E),
                  "att_nns": _stacked_mlp(sd, "att_nns", E),
                  "gru": _cell(sd, "gru"), "gather": _gather(sd),
                  "apd": _apd(sd)}
    elif model == "EMN":
        params = {"embedding_nn": _mlp(sd, "embedding_nn"),
                  "emb_msg_nn": _mlp(sd, "emb_msg_nn"),
                  "att_msg_nn": _mlp(sd, "att_msg_nn"),
                  "gru": _cell(sd, "gru"), "gather": _gather(sd),
                  "apd": _apd(sd)}
    else:
        raise ValueError(f"unknown model {model!r}")
    _validate(cfg, params)
    return params


def _validate(cfg: GraphInventConfig, params: Params) -> None:
    import jax
    from graphinvent_tpu.models import init_model
    template = init_model(cfg, jax.random.PRNGKey(0))
    t_flat, t_def = jax.tree_util.tree_flatten(
        jax.tree_util.tree_map(lambda x: tuple(x.shape), template))
    p_flat, p_def = jax.tree_util.tree_flatten(
        jax.tree_util.tree_map(lambda x: tuple(x.shape), params))
    if t_def != p_def:
        raise ValueError(
            f"imported param tree structure does not match {cfg.model}: "
            f"expected {t_def}, got {p_def}")
    for ts, ps in zip(t_flat, p_flat):
        if ts != ps:
            raise ValueError(
                f"imported param shape mismatch for {cfg.model}: expected "
                f"{ts}, got {ps} (check that the checkpoint was trained "
                f"with the same dataset/hyperparameters)")


def load_torch_checkpoint(cfg: GraphInventConfig, path: str) -> Params:
    """Loads a reference ``.pth`` checkpoint file (v2.0 state_dict format;
    a v1.0 whole-module pickle is accepted when it unpickles)."""
    import torch
    obj = torch.load(path, map_location="cpu", weights_only=False)
    if hasattr(obj, "state_dict") and not isinstance(obj, dict):
        obj = obj.state_dict()      # v1.0: whole module was pickled
    return params_from_torch_state_dict(cfg, obj)
