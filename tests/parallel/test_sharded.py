"""Multi-chip sharding tests on the 8-virtual-device CPU mesh.

Validates that the sharded training step and sharded extraction produce the
same numbers as their single-device references — the house differential-test
style (SURVEY.md §4 category 2) applied to the parallelism layer.
"""

import unittest

import jax
import jax.numpy as jnp
import numpy as np
import optax

from mermaid_classifier_tpu.models.efficientnet import (
    EfficientNetBackbone,
    EfficientNetConfig,
    init_backbone_params,
)
from mermaid_classifier_tpu.parallel.mesh import default_mesh_spec, make_mesh
from mermaid_classifier_tpu.parallel.sharded_extract import make_sharded_feature_fn
from mermaid_classifier_tpu.parallel.sharded_train import ShardedHeadTrainer

TINY_CONFIG = EfficientNetConfig(
    stem_channels=8,
    stages=((1, 8, 1, 1, 3), (6, 16, 1, 2, 3)),
    head_channels=32,
    feature_dim=32,
    patch_size=32,
)


class TestMeshSpec(unittest.TestCase):
    def test_factorizations(self):
        self.assertEqual((default_mesh_spec(8).data, default_mesh_spec(8).model), (4, 2))
        self.assertEqual((default_mesh_spec(1).data, default_mesh_spec(1).model), (1, 1))
        self.assertEqual((default_mesh_spec(6).data, default_mesh_spec(6).model), (3, 2))
        spec = default_mesh_spec(8, model_parallel=4)
        self.assertEqual((spec.data, spec.model), (2, 4))

    def test_odd_devices_fall_back_to_pure_data(self):
        spec = default_mesh_spec(7)
        self.assertEqual((spec.data, spec.model), (7, 1))

    def test_make_mesh_axes(self):
        mesh = make_mesh(8)
        self.assertEqual(mesh.axis_names, ("data", "model"))
        self.assertEqual(mesh.devices.size, 8)


class TestShardedHeadTrainer(unittest.TestCase):
    LAYERS = (12, 8, 6, 4)

    def _reference_step(self, params, opt_state, xb, yb, wb, n_real, opt, alpha):
        def loss_fn(p):
            x = xb
            n = len(p["W"])
            for i in range(n):
                x = x @ p["W"][i] + p["b"][i]
                if i < n - 1:
                    x = jax.nn.relu(x)
            logp = jax.nn.log_softmax(x, axis=1)
            ce = -jnp.take_along_axis(logp, yb[:, None], axis=1)[:, 0]
            data_loss = jnp.sum(wb * ce) / jnp.sum(wb)
            sq = sum(jnp.sum(w * w) for w in p["W"])
            return data_loss + (0.5 * alpha / n_real) * sq

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    def test_matches_single_device_step(self):
        mesh = make_mesh(8)
        trainer = ShardedHeadTrainer(
            mesh, self.LAYERS, learning_rate=1e-3, alpha=0.01
        )
        params = trainer.init_params(seed=3)
        opt_state = trainer.init_opt_state(params)

        ref_params = jax.tree.map(np.asarray, params)
        ref_params = {
            "W": [jnp.asarray(w) for w in ref_params["W"]],
            "b": [jnp.asarray(b) for b in ref_params["b"]],
        }
        ref_opt = optax.adam(1e-3, eps_root=0.0)
        ref_opt_state = ref_opt.init(ref_params)

        rng = np.random.default_rng(0)
        for step in range(3):
            x = rng.standard_normal((16, self.LAYERS[0])).astype(np.float32)
            y = rng.integers(0, self.LAYERS[-1], size=16).astype(np.int32)
            w = np.ones(16, dtype=np.float32)
            w[-2:] = 0.0  # padding rows
            xd, yd, wd = trainer.place_batch(x, y, w)
            params, opt_state, loss = trainer.train_step(
                params, opt_state, xd, yd, wd, 14.0
            )
            ref_params, ref_opt_state, ref_loss = self._reference_step(
                ref_params,
                ref_opt_state,
                jnp.asarray(x),
                jnp.asarray(y),
                jnp.asarray(w),
                14.0,
                ref_opt,
                0.01,
            )
            self.assertAlmostEqual(
                float(loss), float(ref_loss), places=5, msg=f"step {step}"
            )

        for w_sharded, w_ref in zip(params["W"], ref_params["W"]):
            np.testing.assert_allclose(
                np.asarray(w_sharded), np.asarray(w_ref), rtol=1e-5, atol=1e-6
            )

    def test_predict_proba_rows_sum_to_one(self):
        mesh = make_mesh(8)
        trainer = ShardedHeadTrainer(mesh, self.LAYERS)
        params = trainer.init_params(seed=0)
        x = np.random.default_rng(1).standard_normal((8, 12)).astype(np.float32)
        probs = np.asarray(trainer.predict_proba(params, jnp.asarray(x)))
        np.testing.assert_allclose(probs.sum(axis=1), 1.0, atol=1e-5)


class TestShardedExtract(unittest.TestCase):
    def test_matches_unsharded_backbone(self):
        # Pin the flax impl on BOTH sides so the differential isolates
        # sharding alone (folded-vs-flax schedule equivalence is pinned
        # separately in tests/ops and tests/models).
        mesh = make_mesh(8)
        variables = init_backbone_params(0, TINY_CONFIG)
        run = make_sharded_feature_fn(
            mesh, variables, TINY_CONFIG, backbone_impl="flax"
        )
        patches = (
            np.random.default_rng(0)
            .standard_normal((16, 32, 32, 3))
            .astype(np.float32)
        )
        sharded_out = np.asarray(run(jnp.asarray(patches)))

        model = EfficientNetBackbone(config=TINY_CONFIG)
        ref_out = np.asarray(jax.jit(model.apply)(variables, jnp.asarray(patches)))
        np.testing.assert_allclose(sharded_out, ref_out, rtol=1e-4, atol=1e-5)

    def test_folded_sharded_matches_folded_single(self):
        """The default sharded schedule (folded) against the same folded
        forward on one device: sharding must not move the numbers."""
        from mermaid_classifier_tpu.ops.fused_mbconv import (
            apply_folded,
            fold_backbone,
        )

        mesh = make_mesh(8)
        variables = init_backbone_params(0, TINY_CONFIG)
        run = make_sharded_feature_fn(mesh, variables, TINY_CONFIG)
        patches = (
            np.random.default_rng(1)
            .standard_normal((16, 32, 32, 3))
            .astype(np.float32)
        )
        sharded_out = np.asarray(run(jnp.asarray(patches)))
        folded = fold_backbone(variables, TINY_CONFIG)
        ref_out = np.asarray(
            jax.jit(lambda p: apply_folded(folded, TINY_CONFIG, p))(
                jnp.asarray(patches)
            )
        )
        np.testing.assert_allclose(sharded_out, ref_out, rtol=1e-5, atol=1e-6)

    def test_rejects_indivisible_batch(self):
        mesh = make_mesh(8)
        variables = init_backbone_params(0, TINY_CONFIG)
        run = make_sharded_feature_fn(mesh, variables, TINY_CONFIG)
        with self.assertRaises(ValueError):
            run(jnp.zeros((3, 32, 32, 3), jnp.float32))


class TestShardedServe(unittest.TestCase):
    """The mesh-sharded calibrated head must be numerically identical to
    the single-device head_apply (differential, house style)."""

    def _head(self, n_classes=5, dim=12, seed=3):
        from mermaid_classifier_tpu.inference.head import HeadParams

        rng = np.random.default_rng(seed)
        sizes = (dim, 8, n_classes)
        return HeadParams(
            [rng.standard_normal((i, o)).astype(np.float32) * 0.5
             for i, o in zip(sizes[:-1], sizes[1:])],
            [rng.standard_normal(o).astype(np.float32) * 0.1
             for o in sizes[1:]],
            rng.standard_normal(n_classes).astype(np.float32) - 1.0,
            rng.standard_normal(n_classes).astype(np.float32) * 0.2,
        )

    def test_matches_single_device_head(self):
        from mermaid_classifier_tpu.inference.head import head_apply
        from mermaid_classifier_tpu.parallel.sharded_serve import (
            make_sharded_head_fn,
        )

        mesh = make_mesh(8)
        head = self._head()
        serve = make_sharded_head_fn(mesh, head)
        feats = np.random.default_rng(0).standard_normal((32, 12)).astype(
            np.float32
        )
        sharded = serve(feats)
        single = np.asarray(head_apply(head.as_pytree(), jnp.asarray(feats)))
        np.testing.assert_allclose(sharded, single, rtol=1e-6, atol=1e-7)
        np.testing.assert_allclose(sharded.sum(axis=1), 1.0, atol=1e-5)

    def test_rejects_bad_shapes(self):
        from mermaid_classifier_tpu.parallel.sharded_serve import (
            make_sharded_head_fn,
        )

        mesh = make_mesh(8)
        serve = make_sharded_head_fn(mesh, self._head())
        with self.assertRaisesRegex(ValueError, "not divisible"):
            serve(np.zeros((3, 12), np.float32))
        with self.assertRaisesRegex(ValueError, "must be"):
            serve(np.zeros((8, 5), np.float32))


if __name__ == "__main__":
    unittest.main()
