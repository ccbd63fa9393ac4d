"""Six MPNN model families in a dense, MXU-friendly TPU formulation."""

from graphinvent_tpu.models.mpnn import MODEL_REGISTRY, init_model, apply_model

__all__ = ["MODEL_REGISTRY", "init_model", "apply_model"]
