"""Gate-identification training subsystem (reference: duo_attn/train.py,
data.py, loss.py, ulysses/ — SURVEY.md §2.1)."""
