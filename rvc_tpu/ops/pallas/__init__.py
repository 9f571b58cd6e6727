"""Pallas TPU kernels for the hottest custom ops."""
