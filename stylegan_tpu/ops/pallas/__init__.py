"""Pallas TPU kernels for the hot, bandwidth-bound ops."""
