"""Evaluation & benchmark suite.

Counterparts of the reference's eval/ tree (SURVEY.md §2.3): NIAH harness,
LongBench pred+eval, efficiency benchmarks. Scoring implementations are
written from scratch to the published metric definitions.
"""
