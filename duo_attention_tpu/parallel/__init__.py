"""Parallelism: one JAX mesh replaces torchrun+NCCL+tensor_parallel+accelerate
(reference inventory: SURVEY.md §2.6)."""
