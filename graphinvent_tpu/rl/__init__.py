"""RL fine-tuning (policy-gradient with augmented likelihood)."""
