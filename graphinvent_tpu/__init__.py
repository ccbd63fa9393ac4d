"""graphinvent-tpu: a TPU-native molecular graph generation framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
MolecularAI/GraphINVENT: six MPNN variants (MNN, S2V, AttS2V, GGNN, AttGGNN,
EMN) over dense padded molecular graphs, APD-based autoregressive graph
generation fully on device, KL-divergence training, RL fine-tuning, and a
self-contained chemistry kernel (no RDKit dependency).
"""

__version__ = "0.1.0"

from graphinvent_tpu.config import GraphInventConfig, MODEL_NAMES, preset

__all__ = ["GraphInventConfig", "MODEL_NAMES", "preset", "__version__"]
