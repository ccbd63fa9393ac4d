"""TPU kernels (Pallas) for the message-passing hot path."""
