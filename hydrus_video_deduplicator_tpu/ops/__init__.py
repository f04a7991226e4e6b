"""Pallas TPU kernels for the hot compute paths.

- :mod:`.pdq_pallas`  — fused PDQ luma+tent-filter+decimate kernel (VMEM-resident
  per frame; the HBM-bandwidth-optimal hash path).
- :mod:`.similarity`  — bit-packed Hamming / MXU ±1 similarity primitives.
"""
