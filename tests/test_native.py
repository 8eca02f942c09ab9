"""Native checkpoint layout engine tests (C++ via ctypes).

Validates the multithreaded transpose+gather against numpy, the numpy
fallback, and the zero-copy safetensors mmap reader feeding it.
"""

import os

import numpy as np
import pytest

from duo_attention_tpu import native


@pytest.fixture(scope="module")
def lib():
    lib = native.load_library()
    if lib is None:
        pytest.skip("no C++ toolchain available")
    return lib


@pytest.mark.parametrize("dtype", [np.float32, np.float16, np.int64])
@pytest.mark.parametrize("shape", [(64, 64), (257, 129), (1000, 48)])
def test_transpose_matches_numpy(lib, dtype, shape):
    rng = np.random.default_rng(0)
    x = rng.standard_normal(shape).astype(dtype)
    np.testing.assert_array_equal(native.transpose_gather(x), x.T)


def test_transpose_bf16_bitpattern(lib):
    import ml_dtypes

    rng = np.random.default_rng(1)
    x = rng.standard_normal((300, 200)).astype(ml_dtypes.bfloat16)
    got = native.transpose_gather(x)
    np.testing.assert_array_equal(
        got.view(np.uint16), np.ascontiguousarray(x.T).view(np.uint16)
    )


def test_transpose_with_gather(lib):
    rng = np.random.default_rng(2)
    x = rng.standard_normal((128, 96)).astype(np.float32)
    perm = rng.permutation(128)
    got = native.transpose_gather(x, perm)
    np.testing.assert_array_equal(got, x[perm].T)


def test_transpose_with_col_gather(lib):
    rng = np.random.default_rng(5)
    x = rng.standard_normal((96, 128)).astype(np.float32)
    cperm = rng.permutation(128)
    got = native.transpose_gather(x, col_perm=cperm)
    np.testing.assert_array_equal(got, x[:, cperm].T)


def test_transpose_with_both_gathers(lib):
    rng = np.random.default_rng(6)
    x = rng.standard_normal((70, 90)).astype(np.float16)
    perm = rng.permutation(70)
    cperm = rng.permutation(90)
    got = native.transpose_gather(x, perm=perm, col_perm=cperm)
    np.testing.assert_array_equal(got, x[perm][:, cperm].T)


def test_copy_mt(lib):
    rng = np.random.default_rng(3)
    x = rng.standard_normal((1000, 333)).astype(np.float32)
    np.testing.assert_array_equal(native.copy_mt(x), x)


def test_mmap_safetensors_roundtrip(tmp_path):
    from safetensors.numpy import save_file

    import ml_dtypes
    from duo_attention_tpu.models.convert import mmap_safetensors

    rng = np.random.default_rng(4)
    tensors = {
        "a": rng.standard_normal((17, 33)).astype(np.float32),
        "b": rng.standard_normal((8, 4, 2)).astype(ml_dtypes.bfloat16),
        "c": rng.integers(0, 100, (5,)).astype(np.int64),
    }
    path = os.path.join(tmp_path, "model.safetensors")
    save_file(dict(tensors), path)
    loaded = mmap_safetensors(path)
    assert set(loaded) == set(tensors)
    for k in tensors:
        assert loaded[k].dtype == tensors[k].dtype
        np.testing.assert_array_equal(np.asarray(loaded[k]), tensors[k])
