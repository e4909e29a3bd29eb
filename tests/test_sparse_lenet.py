"""SparseLeNet (device-resident im2col + block-ELL SpMM LeNet) and the
numpy im2col oracle — the NN-chain pieces behind the
``sparse_lenet_infer_b256`` bench record.

Parity contract: the reference's eps (1e-6 relative,
``SimSpGEMM.cpp:283``) against the dense flax forward at HIGHEST matmul
precision (default conv precision quantizes patches to bf16 — the bug
this round's im2col precision fix removed).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from outerspace_tpu.nn.export import im2col, im2col_np


class TestIm2colNp:
    def test_matches_jnp_multichannel(self):
        rng = np.random.default_rng(0)
        x = rng.random((3, 14, 14, 6)).astype(np.float32)
        assert np.array_equal(
            np.asarray(im2col(jnp.asarray(x), 5, 0)), im2col_np(x, 5, 0)
        )

    def test_matches_jnp_padded(self):
        rng = np.random.default_rng(1)
        x = rng.random((2, 28, 28, 1)).astype(np.float32)
        assert np.array_equal(
            np.asarray(im2col(jnp.asarray(x), 5, 2)), im2col_np(x, 5, 2)
        )

    def test_jnp_extraction_is_exact(self):
        # the HIGHEST-precision identity-kernel conv must extract the
        # input values bit-exactly (default precision quantized to bf16)
        rng = np.random.default_rng(2)
        x = rng.random((1, 8, 8, 2)).astype(np.float32)
        got = np.asarray(im2col(jnp.asarray(x), 3, 0))
        assert got.dtype == np.float32
        # every patch value must be one of the input's exact f32 values
        assert np.isin(got.ravel(), x.ravel()).all()


@pytest.mark.slow
class TestSparseLeNet:
    """Interpret-mode Pallas on CPU — slow tier."""

    def _params(self):
        import os

        art = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "data", "saved_weights", "LeNet", "pruned_finetuned",
        )
        if os.path.exists(art):
            from outerspace_tpu.nn.train import load_params

            return load_params(art)
        from outerspace_tpu.nn.models import LeNet
        from outerspace_tpu.nn.prune import prune_params

        params = LeNet().init(
            jax.random.PRNGKey(0), jnp.zeros((2, 28, 28, 1))
        )["params"]
        return prune_params(params, sparsity_level=0.25)

    def test_parity_vs_dense_flax(self):
        from outerspace_tpu.nn.models import LeNet
        from outerspace_tpu.nn.sparse_infer import SparseLeNet

        params = self._params()
        rng = np.random.default_rng(3)
        x = rng.random((4, 28, 28, 1)).astype(np.float32)
        with jax.default_matmul_precision("float32"):
            dense = np.asarray(LeNet().apply({"params": params}, jnp.asarray(x))[0])
        got = np.asarray(SparseLeNet(params)(x))
        err = np.max(np.abs(got - dense)) / max(np.max(np.abs(dense)), 1e-9)
        assert err < 1e-5, err

    def test_matches_spgemm_chain(self):
        # the two sparse paths (block-ELL SpMM chain vs the scipy
        # sparse-sparse SpGEMM chain) must agree with each other
        from outerspace_tpu.nn.sparse_infer import (
            SparseLeNet,
            lenet_forward_spgemm,
        )

        params = self._params()
        rng = np.random.default_rng(4)
        x = rng.random((3, 28, 28, 1)).astype(np.float32)
        a = np.asarray(SparseLeNet(params)(x))
        b = lenet_forward_spgemm(params, x, backend="scipy")
        err = np.max(np.abs(a - b)) / max(np.max(np.abs(b)), 1e-9)
        assert err < 1e-5, err

    def test_flat_input_reshape(self):
        from outerspace_tpu.nn.sparse_infer import SparseLeNet

        params = self._params()
        rng = np.random.default_rng(5)
        x = rng.random((2, 784)).astype(np.float32)
        out = np.asarray(SparseLeNet(params)(x))
        assert out.shape == (2, 10)
        assert np.isfinite(out).all()
