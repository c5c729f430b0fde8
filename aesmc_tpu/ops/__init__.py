"""Pallas/Mosaic TPU kernels for the hot inner ops."""
