"""Data + tensor parallel MLP-head training step over a device mesh.

The reference head trains on one CPU host (reference: trainer.py:83-293,
SURVEY.md §2.2 — no collective backend exists). This module is the TPU
growth path: the same weighted-CE + per-minibatch-L2 + Adam semantics as
``train.mlp_classifier`` (the single-chip spec), expressed as one jitted
step over a ``(data, model)`` mesh:

- batch axis sharded over "data" (pure data parallelism);
- hidden layers sharded over "model" Megatron-style — even layers split the
  output dim (column parallel), odd layers split the input dim (row
  parallel), so XLA inserts a single all-reduce per layer pair and gradient
  all-reduces over "data"; all collectives ride ICI.

Sharding is declarative: parameters are placed with `NamedSharding` and the
step is plain `jax.jit` — XLA's SPMD partitioner derives every collective.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from mermaid_classifier_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS

_HIGHEST = jax.lax.Precision.HIGHEST


def _param_specs(n_layers: int) -> list[tuple[P, P]]:
    """(weight, bias) PartitionSpecs per layer, alternating column/row
    parallel. Column-parallel layers shard the bias with the output dim;
    row-parallel layers keep it replicated (it is added after the psum)."""
    specs = []
    for i in range(n_layers):
        if i % 2 == 0:
            specs.append((P(None, MODEL_AXIS), P(MODEL_AXIS)))
        else:
            specs.append((P(MODEL_AXIS, None), P()))
    return specs


class ShardedHeadTrainer:
    """Sharded training-step factory for the classifier head.

    Semantics contract (pinned by tests against train.mlp_classifier): one
    ``train_step`` call == one Adam update on one mini-batch with
    ``loss = sum(w_i * ce_i)/sum(w_i) + 0.5*alpha/n_real * sum(W^2)``.
    """

    def __init__(
        self,
        mesh: Mesh,
        layer_sizes: tuple[int, ...],
        *,
        learning_rate: float = 1e-4,
        beta_1: float = 0.9,
        beta_2: float = 0.999,
        epsilon: float = 1e-8,
        alpha: float = 0.0001,
    ) -> None:
        if len(layer_sizes) < 2:
            raise ValueError("layer_sizes needs at least (input_dim, n_classes)")
        self.mesh = mesh
        self.layer_sizes = tuple(int(s) for s in layer_sizes)
        self.alpha = float(alpha)
        # eps_root=0.0: bit-identical to torch Adam (see train.mlp_classifier).
        self._opt = optax.adam(
            learning_rate, b1=beta_1, b2=beta_2, eps=epsilon, eps_root=0.0
        )
        n_layers = len(self.layer_sizes) - 1
        self._specs = _param_specs(n_layers)
        self._batch_x_sharding = NamedSharding(mesh, P(DATA_AXIS, None))
        self._batch_1d_sharding = NamedSharding(mesh, P(DATA_AXIS))
        self._step = jax.jit(self._train_step, donate_argnums=(0, 1))
        self._fwd = jax.jit(self._predict_proba)

    # -- parameter placement -------------------------------------------------

    def shard_params(self, params: dict) -> dict:
        """Place a {"W": [...], "b": [...]} pytree onto the mesh with the
        alternating column/row layout."""
        ws = [
            jax.device_put(w, NamedSharding(self.mesh, spec_w))
            for w, (spec_w, _) in zip(params["W"], self._specs)
        ]
        bs = [
            jax.device_put(b, NamedSharding(self.mesh, spec_b))
            for b, (_, spec_b) in zip(params["b"], self._specs)
        ]
        return {"W": ws, "b": bs}

    def init_params(self, seed: int = 0) -> dict:
        """Xavier-uniform weights / zero biases (the single-chip init
        contract, train.mlp_classifier), placed sharded."""
        key = jax.random.PRNGKey(int(seed))
        sizes = self.layer_sizes
        weights, biases = [], []
        for i, (fan_in, fan_out) in enumerate(zip(sizes[:-1], sizes[1:])):
            limit = math.sqrt(6.0 / (fan_in + fan_out))
            w = jax.random.uniform(
                jax.random.fold_in(key, i),
                (fan_in, fan_out),
                dtype=jnp.float32,
                minval=-limit,
                maxval=limit,
            )
            weights.append(w)
            biases.append(jnp.zeros((fan_out,), dtype=jnp.float32))
        return self.shard_params({"W": weights, "b": biases})

    def init_opt_state(self, params: dict):
        # zeros_like preserves each param's sharding, so Adam moments land
        # laid out exactly like their parameters.
        return self._opt.init(params)

    # -- the step ------------------------------------------------------------

    def _forward_logits(self, params: dict, x: jax.Array) -> jax.Array:
        n = len(params["W"])
        for i in range(n):
            x = (
                jax.lax.dot_general(
                    x,
                    params["W"][i],
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    precision=_HIGHEST,
                    preferred_element_type=jnp.float32,
                )
                + params["b"][i]
            )
            if i < n - 1:
                x = jax.nn.relu(x)
        return x

    def _train_step(self, params, opt_state, xb, yb, wb, n_real):
        def loss_fn(p):
            logits = self._forward_logits(p, xb)
            logp = jax.nn.log_softmax(logits, axis=1)
            ce = -jnp.take_along_axis(logp, yb[:, None], axis=1)[:, 0]
            data_loss = jnp.sum(wb * ce) / jnp.sum(wb)
            sq = jnp.asarray(0.0, dtype=jnp.float32)
            for w in p["W"]:
                sq = sq + jnp.sum(w * w)
            return data_loss + (0.5 * self.alpha / n_real) * sq

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = self._opt.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    def _predict_proba(self, params, x):
        return jax.nn.softmax(self._forward_logits(params, x), axis=1)

    # -- public API ----------------------------------------------------------

    def place_batch(self, x: np.ndarray, y: np.ndarray, w: np.ndarray):
        """Shard a host mini-batch over the data axis. Rows must divide the
        data-axis size (pad with w=0 rows upstream — the fixed-shape
        discipline every batch already follows)."""
        xd = jax.device_put(jnp.asarray(x, jnp.float32), self._batch_x_sharding)
        yd = jax.device_put(jnp.asarray(y, jnp.int32), self._batch_1d_sharding)
        wd = jax.device_put(jnp.asarray(w, jnp.float32), self._batch_1d_sharding)
        return xd, yd, wd

    def train_step(self, params, opt_state, xb, yb, wb, n_real: float):
        """One sharded Adam update; returns (params, opt_state, loss)."""
        return self._step(
            params, opt_state, xb, yb, wb, jnp.float32(n_real)
        )

    def predict_proba(self, params, x) -> jax.Array:
        return self._fwd(params, x)
