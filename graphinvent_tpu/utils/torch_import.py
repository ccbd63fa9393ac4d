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
Supports both checkpoint generations (reference util.py:828-850):

* v2.0: plain ``state_dict`` -- loaded directly;
* v1.0: the whole ``nn.Module`` object was pickled.  When the reference
  package is importable the module unpickles normally and its
  ``state_dict()`` is used; when it is NOT importable, a stub unpickler
  substitutes placeholder classes for the reference's module classes and
  the state_dict is reconstructed by walking the ``_parameters`` /
  ``_buffers`` / ``_modules`` dicts (torch's own pickle layout), so v1.0
  checkpoints migrate without installing the reference.
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


class _StubModule:
    """Placeholder for classes that cannot be imported while unpickling a
    v1.0 whole-module checkpoint (the reference's gnn.mpnn.* classes)."""

    def __init__(self, *args, **kwargs) -> None:
        pass

    def __setstate__(self, state) -> None:
        if isinstance(state, dict):
            self.__dict__.update(state)
        else:
            self.__dict__["_state"] = state


def _stub_pickle_module():
    """A pickle-module shim whose Unpickler falls back to stub classes for
    anything unimportable; torch's tensor reconstruction functions import
    normally so the weights come through intact."""
    import pickle
    import types

    class Unpickler(pickle.Unpickler):
        def find_class(self, module, name):
            try:
                return super().find_class(module, name)
            except (ImportError, AttributeError):
                return type(name, (_StubModule,), {"__module__": module})

    m = types.ModuleType("graphinvent_tpu._stub_pickle")
    m.Unpickler = Unpickler
    m.load = pickle.load
    m.loads = pickle.loads
    return m


def _state_dict_from_module_obj(obj, prefix: str = "") -> Dict[str, Any]:
    """Rebuilds ``state_dict()`` from a (possibly stub-class) unpickled
    nn.Module object graph: torch modules pickle their tensors under the
    ``_parameters`` / ``_buffers`` dicts and submodules under ``_modules``."""
    out: Dict[str, Any] = {}
    d = getattr(obj, "__dict__", {}) or {}
    for name, p in (d.get("_parameters") or {}).items():
        if p is not None:
            out[prefix + name] = p
    for name, b in (d.get("_buffers") or {}).items():
        if b is not None:
            out[prefix + name] = b
    for name, sub in (d.get("_modules") or {}).items():
        if sub is not None:
            out.update(_state_dict_from_module_obj(sub, prefix + name + "."))
    return out


def load_torch_checkpoint(cfg: GraphInventConfig, path: str) -> Params:
    """Loads a reference ``.pth`` checkpoint file: v2.0 state_dict, or a
    v1.0 whole-module pickle (with or without the reference importable)."""
    import torch
    try:
        obj = torch.load(path, map_location="cpu", weights_only=False)
    except (ModuleNotFoundError, AttributeError):
        obj = torch.load(path, map_location="cpu", weights_only=False,
                         pickle_module=_stub_pickle_module())
    if not isinstance(obj, dict):
        if isinstance(obj, _StubModule) or not hasattr(obj, "state_dict"):
            obj = _state_dict_from_module_obj(obj)   # v1.0 via stub classes
        else:
            obj = obj.state_dict()                   # v1.0, class importable
    return params_from_torch_state_dict(cfg, obj)
