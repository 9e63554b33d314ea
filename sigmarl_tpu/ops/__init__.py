"""First-party TPU Pallas kernels for the geometry hot path."""
