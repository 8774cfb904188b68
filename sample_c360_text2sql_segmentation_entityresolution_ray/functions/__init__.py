"""Deterministic, vectorized kernels shared by the pipeline stages.

Everything here is pure-Python/numpy/pandas, process-deterministic
(fixed hash keys, no ``PYTHONHASHSEED`` dependence), and safe to call
inside ``map_batches`` workers.
"""
