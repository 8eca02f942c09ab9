"""Pattern artifact IO + sparsify + head-ordering unit tests.

The reference leaves these untested (SURVEY.md §4); they encode
correctness-critical behavior. Reference pattern artifacts at
/root/reference/attn_patterns are used as data fixtures to prove
byte-compatibility with reference-trained patterns.
"""

import os

import numpy as np
import pytest

from duo_attention_tpu.patterns import (
    expand_kv_perm,
    head_permutation,
    load_attn_pattern,
    num_full_kv_heads_per_layer,
    reordered_gate_matrix,
    save_attn_pattern,
    sparsify_attention_heads,
)

REF_PATTERNS = "/root/reference/attn_patterns"


def test_save_load_roundtrip(tmp_path):
    heads = np.random.default_rng(0).uniform(0, 1, (4, 8))
    save_attn_pattern(str(tmp_path), heads, sink_size=32, recent_size=128)
    loaded, sink, recent = load_attn_pattern(str(tmp_path))
    assert sink == 32 and recent == 128
    np.testing.assert_allclose(loaded, heads, atol=1e-12)


@pytest.mark.skipif(
    not os.path.isdir(REF_PATTERNS), reason="reference patterns unavailable"
)
def test_load_reference_patterns():
    """Reference-trained TSVs load directly (format compatibility)."""
    for model_dir in sorted(os.listdir(REF_PATTERNS)):
        runs = os.listdir(os.path.join(REF_PATTERNS, model_dir))
        run_dir = os.path.join(REF_PATTERNS, model_dir, runs[0])
        heads, sink, recent = load_attn_pattern(run_dir)
        assert heads.ndim == 2
        assert heads.shape[0] == 32  # all released models have 32 layers
        assert heads.shape[1] in (8, 32)  # GQA or MHA
        assert heads.min() >= 0 and heads.max() <= 1
        assert sink > 0 and recent > 0


def test_sparsify_sparsity_levels():
    rng = np.random.default_rng(1)
    heads = rng.uniform(0, 1, (8, 8))
    for target in [0.0, 0.25, 0.5, 0.75, 1.0]:
        binary, actual = sparsify_attention_heads(heads, sparsity=target)
        assert set(np.unique(binary)) <= {0.0, 1.0}
        assert abs(actual - target) < 0.05
    # threshold-only mode works (reference had a latent bug here)
    binary, actual = sparsify_attention_heads(heads, threshold=0.5)
    assert set(np.unique(binary)) <= {0.0, 1.0}


def test_sparsify_extremes():
    heads = np.ones((4, 4)) * 0.5
    b0, s0 = sparsify_attention_heads(heads, sparsity=0.0)
    assert b0.sum() == 16 and s0 == 0.0  # no heads pruned
    b1, s1 = sparsify_attention_heads(heads, sparsity=1.0)
    assert b1.sum() == 0 and s1 == 1.0  # all pruned


def test_head_permutation_stable():
    gates = np.array([0.1, 0.9, 0.2, 0.8, 0.95, 0.0])
    perm, num_full = head_permutation(gates)
    assert num_full == 3
    # full heads first, preserving relative order; then streaming heads
    np.testing.assert_array_equal(perm, [1, 3, 4, 0, 2, 5])


def test_expand_kv_perm():
    perm = np.array([2, 0, 1])
    expanded = expand_kv_perm(perm, repeats=2)
    np.testing.assert_array_equal(expanded, [4, 5, 0, 1, 2, 3])


def test_reordered_gate_matrix():
    gates = np.array([[0.9, 0.1, 0.8], [0.0, 0.0, 1.0]])
    assert num_full_kv_heads_per_layer(gates) == (2, 1)
    np.testing.assert_array_equal(
        reordered_gate_matrix(gates), [[1, 1, 0], [1, 0, 0]]
    )


def test_visualize_head_map(tmp_path):
    import os

    from duo_attention_tpu.patterns import visualize_head_map

    rng = np.random.default_rng(0)
    heads = rng.uniform(size=(8, 4))
    out = os.path.join(tmp_path, "map.png")
    visualize_head_map(heads, out, title="test")
    assert os.path.getsize(out) > 0
