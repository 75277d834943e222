"""Pallas TPU kernels for the hot ops.

Each kernel has an XLA reference implementation in gedepth_tpu.ops and a
parity test; kernels are opt-in via dispatchers that check the backend.
"""
