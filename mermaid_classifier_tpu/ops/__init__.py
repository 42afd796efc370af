"""TPU compute ops: Pallas kernels and jitted compute-path functions."""
