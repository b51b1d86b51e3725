"""Numerics substrate: audio frontend, attention, masking, losses, sampling,
segment (ragged word-level) ops, and Pallas TPU kernels."""
