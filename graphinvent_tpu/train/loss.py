"""Training loss: KL divergence between target and predicted APDs.

Reference: Workflow.loss (Workflow.py:833-860) --
``KLDivLoss(reduction="batchmean")(LogSoftmax(output), target/target.sum())``.
Targets can encode more than one correct action (duplicate subgraphs get
their APDs summed during preprocessing, DataProcesser.py:203-231), hence the
renormalization.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def apd_kl_loss(logits: jnp.ndarray, targets: jnp.ndarray,
                valid: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """logits (B, A) raw APD output; targets (B, A) non-negative counts.

    ``valid`` optionally masks padded rows (all-zero targets) so that fixed
    batch shapes can be jitted; reduction divides by the number of valid
    rows (== torch "batchmean" over the true batch).
    """
    logp = jax.nn.log_softmax(logits, axis=1)
    tsum = jnp.sum(targets, axis=1, keepdims=True)
    safe = jnp.maximum(tsum, 1e-30)
    t = targets / safe
    elt = jnp.where(t > 0, t * (jnp.log(jnp.maximum(t, 1e-30)) - logp), 0.0)
    per_row = jnp.sum(elt, axis=1)
    if valid is None:
        return jnp.sum(per_row) / logits.shape[0]
    valid = valid.astype(per_row.dtype)
    return jnp.sum(per_row * valid) / jnp.maximum(jnp.sum(valid), 1.0)


def correct_action_likelihoods(logits: jnp.ndarray, targets: jnp.ndarray
                               ) -> jnp.ndarray:
    """Probability mass the model assigns to the correct action(s) per row
    (reference: Analyzer.get_validation_likelihood, Analyzer.py:754-766).
    Returns (B,) probabilities; caller applies -log."""
    probs = jax.nn.softmax(logits, axis=1)
    tsum = jnp.sum(targets, axis=1, keepdims=True)
    t = targets / jnp.maximum(tsum, 1e-30)
    return jnp.sum(t * probs, axis=1)
