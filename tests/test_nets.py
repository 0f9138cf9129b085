"""Network architecture parity tests.

Parameter counts are golden values computed from the reference torch models
(BN running statistics excluded on both sides; flax keeps them in
``batch_stats``): ResUNet 17,007,744 (default) / 4,252,224 (nc=32..256),
XDenseUNet 397,113, SubNet(8) 79,716.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from galaxy_deconv_tpu.nets import ResUNet, SubNet, XDenseUNet


def n_params(tree):
    return sum(int(np.prod(x.shape)) for x in jax.tree.leaves(tree))


@pytest.fixture(scope="module")
def key():
    return jax.random.PRNGKey(0)


class TestResUNet:
    def test_param_count_default(self, key):
        net = ResUNet()
        v = net.init(key, jnp.zeros((1, 48, 48, 1)))
        assert n_params(v["params"]) == 17_007_744

    def test_param_count_small(self, key):
        net = ResUNet(features=(32, 64, 128, 256))
        v = net.init(key, jnp.zeros((1, 48, 48, 1)))
        assert n_params(v["params"]) == 4_252_224

    def test_shape_and_nonmultiple_of_8(self, key):
        net = ResUNet(features=(8, 16, 32, 64))
        for hw in (48, 45):
            v = net.init(key, jnp.zeros((2, hw, hw, 1)))
            out = net.apply(v, jnp.ones((2, hw, hw, 1)))
            assert out.shape == (2, hw, hw, 1)
            assert np.isfinite(np.asarray(out)).all()

    def test_no_batch_stats(self, key):
        v = ResUNet(features=(8, 16, 32, 64)).init(key, jnp.zeros((1, 48, 48, 1)))
        assert set(v.keys()) == {"params"}


class TestSubNet:
    def test_param_count(self, key):
        net = SubNet(n_outputs=8)
        v = net.init(key, jnp.zeros((1, 48, 48)), jnp.zeros((1,)))
        assert n_params(v["params"]) == 79_716

    def test_outputs_positive(self, key):
        net = SubNet(n_outputs=8)
        psf = jax.random.uniform(key, (3, 48, 48)) * 0.01
        v = net.init(key, psf, jnp.ones((3,)))
        out = net.apply(v, psf, jnp.ones((3, 1, 1, 1)))
        assert out.shape == (3, 8)
        assert (np.asarray(out) > 0).all()

    def test_two_rho_variant(self, key):
        net = SubNet(n_outputs=16)  # Poisson solver: 2 * n_iters outputs
        v = net.init(key, jnp.zeros((1, 48, 48)), jnp.zeros((1,)))
        out = net.apply(v, jnp.ones((2, 48, 48)) * 0.01, jnp.ones((2,)))
        assert out.shape == (2, 16)


class TestXDenseUNet:
    pytestmark = pytest.mark.slow

    def test_param_count_and_shape(self, key):
        net = XDenseUNet()
        v = net.init(key, jnp.zeros((1, 48, 48, 1)))
        assert n_params(v["params"]) == 397_113
        assert "batch_stats" in v
        out = net.apply(v, jnp.ones((2, 48, 48, 1)))
        assert out.shape == (2, 48, 48, 1)

    def test_train_mode_updates_stats(self, key):
        net = XDenseUNet()
        v = net.init(key, jnp.zeros((1, 48, 48, 1)))
        x = jax.random.normal(key, (2, 48, 48, 1))
        out, mutated = net.apply(v, x, True, mutable=["batch_stats"])
        assert out.shape == (2, 48, 48, 1)
        diff = jax.tree.map(lambda a, b: np.abs(np.asarray(a) - np.asarray(b)).max(),
                            v["batch_stats"], mutated["batch_stats"])
        assert max(jax.tree.leaves(diff)) > 0
