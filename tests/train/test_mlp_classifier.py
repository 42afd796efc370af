"""Differential and semantics tests for the JAX MLPClassifier.

Modeled on the reference's differential test strategy
(reference: tests/pyspacer/test_mlp_benchmark.py): the same battery runs
against sklearn's MLPClassifier and ours, plus exact-step parity against a
hand-written numpy Adam reference for the update-rule semantics.
"""

import pickle

import jax.numpy as jnp
import numpy as np
import pytest

from mermaid_classifier_tpu.train.mlp_classifier import MLPClassifier


def make_clusters(n_per_class=200, n_classes=4, dim=16, seed=0):
    rng = np.random.default_rng(seed)
    centers = rng.normal(0.0, 4.0, size=(n_classes, dim))
    X, y = [], []
    for k in range(n_classes):
        X.append(rng.normal(0.0, 1.0, size=(n_per_class, dim)) + centers[k])
        y.extend([f"class_{k}"] * n_per_class)
    X = np.vstack(X).astype(np.float32)
    y = np.asarray(y)
    order = rng.permutation(len(y))
    return X[order], y[order]


class TestAPI:
    def test_partial_fit_bookkeeping(self):
        X, y = make_clusters(n_per_class=30)
        clf = MLPClassifier(hidden_layer_sizes=(8,), random_state=0)
        classes = sorted(set(y))
        for i in range(3):
            clf.partial_fit(X, y, classes=classes)
            assert clf.n_iter_ == i + 1
            assert len(clf.loss_curve_) == i + 1
        assert list(clf.classes_) == classes
        assert clf.n_features_in_ == X.shape[1]
        proba = clf.predict_proba(X)
        assert proba.shape == (len(y), len(classes))
        np.testing.assert_allclose(proba.sum(axis=1), 1.0, atol=1e-12)
        preds = clf.predict(X)
        assert set(preds) <= set(classes)

    def test_unknown_label_raises(self):
        X, y = make_clusters(n_per_class=10, n_classes=2)
        clf = MLPClassifier(random_state=0)
        clf.partial_fit(X, y, classes=sorted(set(y)))
        bad_y = np.array(["nope"] * len(y))
        with pytest.raises(ValueError, match="not in classes_"):
            clf.partial_fit(X, bad_y)

    def test_feature_count_mismatch_raises(self):
        X, y = make_clusters(n_per_class=10, n_classes=2, dim=8)
        clf = MLPClassifier(random_state=0)
        clf.partial_fit(X, y, classes=sorted(set(y)))
        with pytest.raises(ValueError, match="features"):
            clf.partial_fit(X[:, :4], y)
        with pytest.raises(ValueError, match="features"):
            clf.predict_proba(X[:, :4])

    def test_not_fitted_raises(self):
        clf = MLPClassifier()
        with pytest.raises(RuntimeError, match="not fitted"):
            clf.predict(np.zeros((1, 4), dtype=np.float32))

    def test_invalid_activation_solver(self):
        with pytest.raises(ValueError, match="activation"):
            MLPClassifier(activation="tanh")
        with pytest.raises(ValueError, match="solver"):
            MLPClassifier(solver="sgd")

    def test_get_set_params(self):
        clf = MLPClassifier(hidden_layer_sizes=(5,), alpha=0.5)
        params = clf.get_params()
        assert params["alpha"] == 0.5
        clf.set_params(alpha=0.1)
        assert clf.alpha == 0.1
        with pytest.raises(ValueError, match="Invalid parameter"):
            clf.set_params(bogus=1)

    def test_class_weight_validation(self):
        X, y = make_clusters(n_per_class=10, n_classes=3)
        classes = sorted(set(y))
        clf = MLPClassifier(class_weight={classes[0]: 1.0}, random_state=0)
        with pytest.raises(ValueError, match="missing weights"):
            clf.partial_fit(X, y, classes=classes)
        clf = MLPClassifier(
            class_weight={c: -1.0 for c in classes}, random_state=0
        )
        with pytest.raises(ValueError, match="negative"):
            clf.partial_fit(X, y, classes=classes)


class TestReproducibility:
    def test_seeded_runs_identical(self):
        X, y = make_clusters(n_per_class=50)
        classes = sorted(set(y))
        results = []
        for _ in range(2):
            clf = MLPClassifier(hidden_layer_sizes=(16,), random_state=7)
            for _ in range(3):
                clf.partial_fit(X, y, classes=classes)
            results.append((list(clf.loss_curve_), clf.predict_proba(X[:20])))
        assert results[0][0] == results[1][0]
        np.testing.assert_array_equal(results[0][1], results[1][1])

    def test_random_state_none_advances(self):
        # random_state=None shuffles differently across calls but is made
        # reproducible by np.random.seed (sklearn's global-singleton
        # semantics; reference: torch_classifier.py:150-157).
        X, y = make_clusters(n_per_class=50)
        classes = sorted(set(y))

        def run():
            np.random.seed(123)
            clf = MLPClassifier(hidden_layer_sizes=(16,), random_state=None)
            for _ in range(2):
                clf.partial_fit(X, y, classes=classes)
            return list(clf.loss_curve_)

        assert run() == run()

    def test_pickle_roundtrip(self):
        X, y = make_clusters(n_per_class=40)
        classes = sorted(set(y))
        clf = MLPClassifier(hidden_layer_sizes=(16,), random_state=3)
        clf.partial_fit(X, y, classes=classes)
        restored = pickle.loads(pickle.dumps(clf))
        np.testing.assert_array_equal(
            clf.predict_proba(X[:10]), restored.predict_proba(X[:10])
        )
        # Resumed training must continue from the same optimizer state:
        # one more epoch on each must stay identical.
        clf.partial_fit(X, y)
        restored.partial_fit(X, y)
        assert clf.loss_curve_ == restored.loss_curve_
        np.testing.assert_array_equal(
            clf.predict_proba(X[:10]), restored.predict_proba(X[:10])
        )


def _numpy_reference_epoch(weights, biases, adam_m, adam_v, t0, X, y_idx, *,
                           batch_size, lr, b1, b2, eps, alpha, class_w, seed):
    """Step-exact float32 numpy reference for one partial_fit call: seeded
    shuffle, mini-batch weighted CE + per-batch L2, torch-style Adam."""
    n = X.shape[0]
    rng = np.random.default_rng(seed)
    order = np.arange(n)
    rng.shuffle(order)
    Xs, ys = X[order].astype(np.float32), y_idx[order]
    total_loss, t = 0.0, t0
    for start in range(0, n, batch_size):
        end = min(start + batch_size, n)
        xb, yb = Xs[start:end], ys[start:end]
        mb = end - start
        # forward
        acts = [xb.astype(np.float32)]
        for li, (W, b) in enumerate(zip(weights, biases)):
            z = acts[-1] @ W + b
            if li < len(weights) - 1:
                z = np.maximum(z, 0.0)
            acts.append(z.astype(np.float32))
        logits = acts[-1].astype(np.float32)
        zmax = logits.max(axis=1, keepdims=True)
        ex = np.exp(logits - zmax)
        p = ex / ex.sum(axis=1, keepdims=True)
        w_i = class_w[yb] if class_w is not None else np.ones(mb, dtype=np.float32)
        logp = (logits - zmax) - np.log(ex.sum(axis=1, keepdims=True))
        ce = -logp[np.arange(mb), yb]
        data_loss = float((w_i * ce).sum() / w_i.sum())
        reg = 0.5 * alpha / mb * sum(float((W ** 2).sum()) for W in weights)
        loss = data_loss + reg
        # backward
        onehot = np.zeros_like(p)
        onehot[np.arange(mb), yb] = 1.0
        dlogits = (p - onehot) * (w_i / w_i.sum())[:, None]
        grads_W = [None] * len(weights)
        grads_b = [None] * len(weights)
        delta = dlogits
        for li in range(len(weights) - 1, -1, -1):
            grads_W[li] = acts[li].T @ delta + (alpha / mb) * weights[li]
            grads_b[li] = delta.sum(axis=0)
            if li > 0:
                delta = (delta @ weights[li].T) * (acts[li] > 0)
        # adam
        t += 1
        for li in range(len(weights)):
            for g, param, m, v in (
                (grads_W[li], weights, adam_m[0], adam_v[0]),
                (grads_b[li], biases, adam_m[1], adam_v[1]),
            ):
                m[li] = b1 * m[li] + (1 - b1) * g
                v[li] = b2 * v[li] + (1 - b2) * g * g
                mhat = m[li] / (1 - b1 ** t)
                vhat = v[li] / (1 - b2 ** t)
                param[li] = param[li] - lr * mhat / (np.sqrt(vhat) + eps)
        total_loss += loss * mb
    return total_loss / n, t


class TestNumericalParityVsNumpyReference:
    def test_update_rule_matches_numpy_adam(self):
        """The jitted scan epoch must match a step-by-step numpy Adam+CE
        implementation: same shuffle, same weighted CE, same per-batch L2
        scaling, same bias-corrected Adam — including an uneven tail batch."""
        rng = np.random.default_rng(0)
        n, d, k = 53, 12, 3  # 53 % batch_size(16) != 0 exercises tail padding
        X = rng.normal(size=(n, d)).astype(np.float32)
        y = rng.integers(0, k, size=n)
        labels = np.array([f"c{i}" for i in range(k)])
        y_named = labels[y]
        class_weight = {"c0": 0.5, "c1": 2.0, "c2": 1.0}

        clf = MLPClassifier(
            hidden_layer_sizes=(8,),
            batch_size=16,
            learning_rate_init=0.01,
            alpha=0.3,
            random_state=11,
            class_weight=class_weight,
        )
        clf.partial_fit(X, y_named, classes=list(labels))

        # numpy reference starting from the SAME initial weights
        init = MLPClassifier(
            hidden_layer_sizes=(8,), random_state=11, class_weight=class_weight
        )
        init.partial_fit(X[:1], y_named[:1], classes=list(labels))  # trigger init
        # re-init cleanly: pull the xavier init by constructing fresh params
        init2 = MLPClassifier(
            hidden_layer_sizes=(8,), random_state=11, class_weight=class_weight
        )
        init2.classes_ = np.unique(labels)
        init2.n_features_in_ = d
        init2._init_params()
        weights = [np.asarray(w, dtype=np.float32).copy() for w in init2._params["W"]]
        biases = [np.asarray(b, dtype=np.float32).copy() for b in init2._params["b"]]
        adam_m = (
            [np.zeros_like(w) for w in weights],
            [np.zeros_like(b) for b in biases],
        )
        adam_v = (
            [np.zeros_like(w) for w in weights],
            [np.zeros_like(b) for b in biases],
        )
        cw = np.array([class_weight[c] for c in labels], dtype=np.float32)
        ref_loss, _ = _numpy_reference_epoch(
            weights, biases, adam_m, adam_v, 0, X, y,
            batch_size=16, lr=0.01, b1=0.9, b2=0.999, eps=1e-8,
            alpha=0.3, class_w=cw, seed=11,
        )

        assert clf.loss_curve_[0] == pytest.approx(ref_loss, rel=1e-4, abs=1e-5)
        for got_w, ref_w in zip(clf.coefs_, weights):
            np.testing.assert_allclose(got_w, ref_w, rtol=1e-4, atol=1e-5)
        for got_b, ref_b in zip(clf.intercepts_, biases):
            np.testing.assert_allclose(got_b, ref_b, rtol=1e-4, atol=1e-5)


class TestSklearnParity:
    """Statistical parity with sklearn's MLPClassifier on separable clusters
    (reference analog: tests/pyspacer/test_mlp_benchmark.py:285-407)."""

    def test_accuracy_and_proba_close_to_sklearn(self):
        from sklearn.neural_network import MLPClassifier as SkMLP

        X, y = make_clusters(n_per_class=150, n_classes=4, dim=16, seed=1)
        X_train, y_train = X[:480], y[:480]
        X_test, y_test = X[480:], y[480:]
        classes = sorted(set(y))

        ours = MLPClassifier(hidden_layer_sizes=(32,), random_state=1)
        theirs = SkMLP(hidden_layer_sizes=(32,), random_state=1, solver="adam")
        for epoch in range(30):
            ours.partial_fit(X_train, y_train, classes=classes)
            theirs.partial_fit(X_train, y_train, classes=classes)

        acc_ours = float(np.mean(ours.predict(X_test) == y_test))
        acc_theirs = float(np.mean(theirs.predict(X_test) == y_test))
        assert acc_ours >= acc_theirs - 0.05
        assert acc_ours >= 0.85

        proba_diff = np.mean(
            np.abs(ours.predict_proba(X_test) - theirs.predict_proba(X_test))
        )
        assert proba_diff < 0.05

    def test_fit_converges(self):
        X, y = make_clusters(n_per_class=60, n_classes=3, dim=8, seed=2)
        clf = MLPClassifier(
            hidden_layer_sizes=(16,), random_state=0, max_iter=50, tol=1e-3
        )
        clf.fit(X, y)
        assert clf.n_iter_ <= 50
        assert clf.loss_curve_[-1] < clf.loss_curve_[0]
        assert float(np.mean(clf.predict(X) == y)) > 0.9


class TestBatchingEquivalence:
    """Gradient-step accounting and loss-curve semantics
    (reference analog: test_mlp_benchmark.py BatchingEquivalenceTest)."""

    def _opt_step_count(self, clf) -> int:
        import jax

        leaves = jax.tree.leaves(clf._opt_state)
        # optax.adam's count leaf is the only scalar int32.
        counts = [int(x) for x in leaves if getattr(x, "shape", None) == ()]
        assert counts, "no count leaf found in opt state"
        return counts[0]

    def test_steps_per_partial_fit(self):
        rng = np.random.default_rng(0)
        X = rng.standard_normal((10, 4)).astype(np.float32)
        y = np.array(["a", "b"] * 5)
        clf = MLPClassifier((4,), batch_size=4, random_state=0)
        clf.partial_fit(X, y, classes=["a", "b"])
        # ceil(10 / 4) = 3 optimizer steps per partial_fit call.
        assert self._opt_step_count(clf) == 3
        clf.partial_fit(X, y)
        assert self._opt_step_count(clf) == 6
        assert clf.n_iter_ == 2
        assert len(clf.loss_curve_) == 2

    def test_full_batch_equals_manual_single_step(self):
        # batch_size >= n gives exactly one Adam step whose loss equals the
        # full-batch regularised loss.
        rng = np.random.default_rng(1)
        X = rng.standard_normal((8, 3)).astype(np.float32)
        y = np.array(["a", "b"] * 4)
        clf = MLPClassifier((4,), batch_size=100, random_state=0, alpha=0.01,
                            shuffle=False)
        clf.partial_fit(X, y, classes=["a", "b"])
        assert self._opt_step_count(clf) == 1

    def test_loss_curve_is_size_weighted_average(self):
        # With two mini-batches of sizes 4 and 2, loss_curve_[0] must be
        # (4*l0 + 2*l1)/6 — the reference's averaging contract
        # (torch_classifier.py:295-301). Verify against a manual replay of
        # the same shuffled order.
        rng = np.random.default_rng(2)
        n, d = 6, 3
        X = rng.standard_normal((n, d)).astype(np.float32)
        y = np.array(["a", "b", "a", "b", "a", "b"])

        clf = MLPClassifier((4,), batch_size=4, random_state=5, alpha=0.0)
        clf.partial_fit(X, y, classes=["a", "b"])

        # Replay: same seed -> same shuffle order; same init (random_state).
        order = np.arange(n)
        np.random.default_rng(5).shuffle(order)
        ref = MLPClassifier((4,), batch_size=4, random_state=5, alpha=0.0,
                            shuffle=False)
        # Losses of each mini-batch BEFORE its update, from a fresh clone
        # stepping through the same batches.
        Xs, ys = X[order], y[order]
        ref.partial_fit(Xs, ys, classes=["a", "b"])
        assert clf.loss_curve_[0] == pytest.approx(ref.loss_curve_[0], rel=1e-5)


class TestMeshDataParallel:
    """mesh-sharded partial_fit must be numerically identical to
    single-device (the global mini-batch Adam step is the same update)."""

    def test_identical_to_single_device(self):
        from mermaid_classifier_tpu.parallel.mesh import make_mesh

        rng = np.random.default_rng(0)
        n, d, k = 64, 12, 4
        X = rng.standard_normal((n, d)).astype(np.float32)
        y = np.asarray([f"c{i}" for i in rng.integers(0, k, n)])
        classes = sorted(set(y.tolist()) | {f"c{i}" for i in range(k)})

        plain = MLPClassifier((8,), batch_size=16, random_state=3)
        sharded = MLPClassifier((8,), batch_size=16, random_state=3,
                                mesh=make_mesh(8))
        for _ in range(3):
            plain.partial_fit(X, y, classes=classes)
            sharded.partial_fit(X, y, classes=classes)

        assert plain.loss_curve_ == pytest.approx(sharded.loss_curve_, rel=2e-5)
        for wa, wb in zip(plain.coefs_, sharded.coefs_):
            np.testing.assert_allclose(wa, wb, rtol=2e-5, atol=1e-6)
        np.testing.assert_allclose(
            plain.predict_proba(X), sharded.predict_proba(X),
            rtol=1e-4, atol=1e-6,
        )

    def test_pickle_drops_mesh(self):
        import pickle

        from mermaid_classifier_tpu.parallel.mesh import make_mesh

        clf = MLPClassifier((4,), batch_size=8, random_state=0,
                            mesh=make_mesh(8))
        rng = np.random.default_rng(0)
        X = rng.standard_normal((16, 4)).astype(np.float32)
        y = np.asarray(["a", "b"] * 8)
        clf.partial_fit(X, y, classes=["a", "b"])
        restored = pickle.loads(pickle.dumps(clf))
        assert restored.mesh is None
        np.testing.assert_allclose(
            restored.predict_proba(X), clf.predict_proba(X), rtol=1e-6
        )


class TestResidentTraining:
    """Device-resident epochs must be BIT-IDENTICAL to streamed partial_fit
    on the gathered rows — the gather moves to the device, nothing else."""

    def _data(self, n=600, dim=12, k=4, seed=7):
        rng = np.random.default_rng(seed)
        centers = rng.normal(0, 3, size=(k, dim)).astype(np.float32)
        y_idx = rng.integers(0, k, n)
        X = (centers[y_idx] + rng.normal(0, 0.5, size=(n, dim))).astype(np.float32)
        y = np.asarray([f"c{i}" for i in y_idx])
        return X, y

    def test_resident_matches_streamed_bitwise(self):
        X, y = self._data()
        classes = sorted(set(y.tolist()))
        streamed = MLPClassifier((16, 8), learning_rate_init=1e-2,
                                 random_state=3)
        resident = MLPClassifier((16, 8), learning_rate_init=1e-2,
                                 random_state=3)
        resident.set_resident_features(X)
        rng = np.random.default_rng(0)
        for epoch in range(3):
            order = rng.permutation(len(X))
            for start in range(0, len(X), 256):
                idx = order[start:start + 256]
                streamed.partial_fit(X[idx], y[idx], classes=classes)
                resident.partial_fit_resident(idx, y[idx], classes=classes)
        assert streamed.loss_curve_ == resident.loss_curve_
        for wa, wb in zip(streamed.coefs_, resident.coefs_):
            np.testing.assert_array_equal(wa, wb)
        for ba, bb in zip(streamed.intercepts_, resident.intercepts_):
            np.testing.assert_array_equal(ba, bb)
        np.testing.assert_array_equal(
            streamed.predict_proba(X[:50]), resident.predict_proba(X[:50])
        )

    def test_predict_proba_device_input_matches_numpy(self):
        """The device fast path (export's single-upload parity gate) must
        be bit-identical to the numpy-input path — same program, same
        input bits, no host round trip."""
        import jax.numpy as jnp

        X, y = self._data()
        clf = MLPClassifier((16, 8), learning_rate_init=1e-2, random_state=3)
        clf.partial_fit(X, y, classes=sorted(set(y.tolist())))
        np.testing.assert_array_equal(
            clf.predict_proba(jnp.asarray(X)), clf.predict_proba(X)
        )
        with pytest.raises(ValueError, match="features"):
            clf.predict_proba(jnp.asarray(X[:, :5]))

    def test_predict_indices_resident_matches_proba_argmax(self):
        """The device-argmax prediction pass (the trainer's per-epoch ref
        accuracy) must be bit-identical to argmax over the renormalized
        probability matrix, for every storage dtype."""
        X, y = self._data()
        classes = sorted(set(y.tolist()))
        for dtype in ("float32", "bfloat16", "int8"):
            clf = MLPClassifier((16, 8), learning_rate_init=1e-2,
                                random_state=3)
            clf.set_resident_features(X, dtype=dtype)
            idx = np.arange(len(X), dtype=np.int32)
            clf.partial_fit_resident(idx, y, classes=classes)
            np.testing.assert_array_equal(
                clf.predict_indices_resident(idx),
                clf.predict_proba_resident(idx).argmax(axis=1),
                err_msg=dtype,
            )

    def test_eval_counts_resident_matches_sklearn_all_dtypes(self):
        """The fused accuracy+log-loss eval (two scalars cross back per
        dispatch instead of the (N, K) matrix — the trainer's per-epoch
        ref and val passes) must reproduce the host path it replaces:
        correct_count EXACTLY equals the argmax-correct count over the
        float64-renormalized matrix, and neg_log_sum/N tracks sklearn's
        log_loss to the float32-reduction band, for every storage dtype."""
        from sklearn.metrics import log_loss

        X, y = self._data()
        classes = sorted(set(y.tolist()))
        for dtype in ("float32", "bfloat16", "int8"):
            clf = MLPClassifier((16, 8), learning_rate_init=1e-2,
                                random_state=3)
            clf.set_resident_features(X, dtype=dtype)
            idx = np.arange(len(X), dtype=np.int32)
            clf.partial_fit_resident(idx, y, classes=classes)
            pos = {c: i for i, c in enumerate(clf.classes_)}
            y_idx = np.asarray([pos[v] for v in y], dtype=np.int32)
            counts = clf.eval_counts_resident(idx, y_idx)
            assert counts.shape == (2,)
            proba = clf.predict_proba_resident(idx)
            assert float(counts[0]) == float(
                (proba.argmax(axis=1) == y_idx).sum()
            ), dtype
            host_loss = float(log_loss(y, proba, labels=list(clf.classes_)))
            assert float(counts[1]) / len(idx) == pytest.approx(
                host_loss, rel=1e-5
            ), dtype

    def test_eval_counts_resident_unknown_label_rows(self):
        """Labels outside classes_ arrive as y_idx == -1: they can never
        match a prediction (counted wrong — exactly how the host
        accuracy_score comparison scores them) and contribute ZERO loss.
        Masking rows to -1 must therefore equal evaluating without them:
        same correct count exactly, same loss sum up to reduction order."""
        X, y = self._data()
        classes = sorted(set(y.tolist()))
        clf = MLPClassifier((16, 8), learning_rate_init=1e-2, random_state=3)
        clf.set_resident_features(X)
        idx = np.arange(len(X), dtype=np.int32)
        clf.partial_fit_resident(idx, y, classes=classes)
        pos = {c: i for i, c in enumerate(clf.classes_)}
        y_idx = np.asarray([pos[v] for v in y], dtype=np.int32)
        masked = y_idx.copy()
        masked[:10] = -1
        full = clf.eval_counts_resident(idx, masked)
        tail = clf.eval_counts_resident(idx[10:], y_idx[10:])
        assert float(full[0]) == float(tail[0])
        assert float(full[1]) == pytest.approx(float(tail[1]), rel=1e-6)

    def test_eval_counts_resident_shape_mismatch_raises(self):
        X, y = self._data(n=64)
        clf = MLPClassifier((8,), random_state=0)
        clf.set_resident_features(X)
        idx = np.arange(len(X), dtype=np.int32)
        clf.partial_fit_resident(idx, y, classes=sorted(set(y.tolist())))
        with pytest.raises(ValueError, match="y_indices"):
            clf.eval_counts_resident(idx, np.zeros(5, np.int32))

    def test_resident_with_class_weights_and_padding(self):
        X, y = self._data(n=130)  # forces a ragged tail mini-batch
        classes = sorted(set(y.tolist()))
        weights = {c: 1.0 + i for i, c in enumerate(classes)}
        streamed = MLPClassifier((8,), random_state=1, class_weight=weights)
        resident = MLPClassifier((8,), random_state=1, class_weight=weights)
        resident.set_resident_features(X)
        idx = np.arange(len(X))
        streamed.partial_fit(X, y, classes=classes)
        resident.partial_fit_resident(idx, y, classes=classes)
        assert streamed.loss_curve_ == resident.loss_curve_
        for wa, wb in zip(streamed.coefs_, resident.coefs_):
            np.testing.assert_array_equal(wa, wb)

    def test_chunked_upload_equals_one_shot(self):
        """The slab-by-slab resident upload (used for multi-GB buffers so
        the tunnel never sees one opaque giant transfer) must produce a
        buffer byte-identical to a single device_put."""
        import jax

        X, _ = self._data(n=237, dim=16)
        one_shot = np.asarray(jax.device_put(X))
        chunked = np.asarray(
            MLPClassifier._chunked_device_put(X, chunk_bytes=16 * 64)
        )
        np.testing.assert_array_equal(one_shot, chunked)

    def test_bf16_buffer_behind_cosine_gate(self):
        """The bfloat16 resident buffer is a reduced-precision STORAGE
        path (compute upcasts to f32 after the gather). The house
        0.999-cosine gate applies to the COMPUTE path: through the SAME
        trained params, the resident forward over bf16-stored rows must
        agree with the host-side f32 forward to min cosine >= 0.999.
        Training from the rounded buffer is a slightly different dataset
        — trajectories may drift (measured 0.990 cross-model cosine on
        the chip at 1024-dim) — so cross-model agreement is a QUALITY
        band, not the numerics gate."""
        X, y = self._data(n=400)
        classes = sorted(set(y.tolist()))
        f32 = MLPClassifier((16, 8), learning_rate_init=1e-2, random_state=3)
        bf16 = MLPClassifier((16, 8), learning_rate_init=1e-2, random_state=3)
        f32.set_resident_features(X)
        bf16.set_resident_features(X, dtype="bfloat16")
        assert str(bf16._resident_X.dtype) == "bfloat16"
        idx = np.arange(len(X))
        for _ in range(3):
            f32.partial_fit_resident(idx, y, classes=classes)
            bf16.partial_fit_resident(idx, y, classes=classes)

        def min_cosine(a, b):
            num = np.sum(a * b, axis=1)
            den = np.linalg.norm(a, axis=1) * np.linalg.norm(b, axis=1)
            return float(np.min(num / np.maximum(den, 1e-12)))

        # THE GATE: same params, bf16-stored rows vs host f32 rows.
        p_res = bf16.predict_proba_resident(idx[:100])
        p_host = bf16.predict_proba(X[:100])
        assert min_cosine(p_host, p_res) >= 0.999
        # Quality band: the two trained models stay close.
        p_f32 = f32.predict_proba(X[:100])
        assert min_cosine(p_f32, p_host) >= 0.98
        np.testing.assert_allclose(
            f32.loss_curve_, bf16.loss_curve_, rtol=5e-2
        )

    def test_chunked_upload_bf16_equals_host_cast(self):
        """Slab-by-slab bf16 upload == one-shot host cast + device_put."""
        import jax
        import jax.numpy as jnp

        X, _ = self._data(n=237, dim=16)
        one_shot = np.asarray(
            jax.device_put(jnp.asarray(X, dtype=jnp.bfloat16)).astype(
                jnp.float32
            )
        )
        chunked = np.asarray(
            MLPClassifier._chunked_device_put(
                X, chunk_bytes=16 * 32, dtype=jnp.bfloat16
            ).astype(jnp.float32)
        )
        np.testing.assert_array_equal(one_shot, chunked)

    def test_resident_dtype_rejected(self):
        X, _ = self._data(n=8)
        with pytest.raises(ValueError, match="resident dtype"):
            MLPClassifier((8,)).set_resident_features(X, dtype="float16")

    def test_guards(self):
        X, y = self._data(n=20)
        clf = MLPClassifier((8,), random_state=0)
        with pytest.raises(ValueError, match="set_resident_features"):
            clf.partial_fit_resident(np.arange(5), y[:5], classes=sorted(set(y)))
        clf.set_resident_features(X)
        with pytest.raises(ValueError, match="out of range"):
            clf.partial_fit_resident(np.asarray([0, 99]), y[:2],
                                     classes=sorted(set(y)))
        with pytest.raises(ValueError, match="labels"):
            clf.partial_fit_resident(np.asarray([0, 1]), y[:3],
                                     classes=sorted(set(y)))

    def test_pickle_and_snapshot_drop_or_share_resident(self):
        import copy
        import pickle

        X, y = self._data(n=64)
        clf = MLPClassifier((8,), random_state=0)
        clf.set_resident_features(X)
        clf.partial_fit_resident(np.arange(64), y, classes=sorted(set(y)))
        snap = copy.deepcopy(clf)
        assert snap._resident_X is clf._resident_X  # shared device buffer
        clone = pickle.loads(pickle.dumps(clf))
        assert getattr(clone, "_resident_X", None) is None
        # Unpickled model still predicts.
        np.testing.assert_array_equal(
            clf.predict(X[:10]), clone.predict(X[:10])
        )


class TestResidentMesh:
    """Resident training over a mesh: the buffer row-shards across every
    device, gathered mini-batches train data-parallel — numerics must
    match the single-device resident run."""

    def test_sharded_resident_matches_single_device(self):
        from mermaid_classifier_tpu.parallel.mesh import make_mesh

        rng = np.random.default_rng(5)
        n, dim, k = 300, 16, 3  # n NOT divisible by 8: exercises buffer pad
        centers = rng.normal(0, 3, size=(k, dim)).astype(np.float32)
        y_idx = rng.integers(0, k, n)
        X = (centers[y_idx] + rng.normal(0, 0.5, (n, dim))).astype(np.float32)
        y = np.asarray([f"c{i}" for i in y_idx])
        classes = sorted(set(y.tolist()))

        single = MLPClassifier((12,), random_state=2)
        single.set_resident_features(X)
        sharded = MLPClassifier((12,), random_state=2,
                                mesh=make_mesh(8, model_parallel=1))
        sharded.set_resident_features(X)

        rng2 = np.random.default_rng(1)
        for _ in range(2):
            order = rng2.permutation(n)
            for s in range(0, n, 128):
                idx = order[s:s + 128]
                single.partial_fit_resident(idx, y[idx], classes=classes)
                sharded.partial_fit_resident(idx, y[idx], classes=classes)
        assert single.loss_curve_ == pytest.approx(
            sharded.loss_curve_, abs=1e-6
        )
        for wa, wb in zip(single.coefs_, sharded.coefs_):
            np.testing.assert_allclose(wa, wb, rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(
            single.predict_proba_resident(np.arange(64)),
            sharded.predict_proba_resident(np.arange(64)),
            rtol=1e-5, atol=1e-6,
        )


class TestResidentInt8:
    """int8 resident storage (symmetric per-row quantization, f32 scales,
    dequant after the on-device gather) quarters upload bytes + HBM
    footprint. Compute stays f32: training from the int8 buffer must be
    BIT-IDENTICAL to streamed partial_fit on the host-dequantized
    features, and the compute path sits behind the house 0.999-cosine
    gate like every reduced-precision path."""

    def _data(self, n=600, dim=12, k=4, seed=7):
        rng = np.random.default_rng(seed)
        centers = rng.normal(0, 3, size=(k, dim)).astype(np.float32)
        y_idx = rng.integers(0, k, n)
        X = (centers[y_idx] + rng.normal(0, 0.5, size=(n, dim))).astype(
            np.float32
        )
        y = np.asarray([f"c{i}" for i in y_idx])
        return X, y

    @staticmethod
    def _dequantized(X):
        """The exact host-side image of the int8 storage: what the device
        reconstructs after gather + dequant."""
        absmax = np.maximum(X.max(axis=1), -X.min(axis=1))
        scale = (absmax / 127.0).astype(np.float32)
        scale[scale == 0.0] = 1.0
        q = np.clip(
            np.rint(X / scale[:, None]), -127, 127
        ).astype(np.int8)
        return q.astype(np.float32) * scale[:, None], q, scale

    def test_int8_bitwise_matches_streamed_on_dequantized(self):
        X, y = self._data()
        Xdq, _, _ = self._dequantized(X)
        classes = sorted(set(y.tolist()))
        streamed = MLPClassifier((16, 8), learning_rate_init=1e-2,
                                 random_state=3)
        resident = MLPClassifier((16, 8), learning_rate_init=1e-2,
                                 random_state=3)
        resident.set_resident_features(X, dtype="int8")
        assert str(resident._resident_X.dtype) == "int8"
        rng = np.random.default_rng(0)
        for _ in range(3):
            order = rng.permutation(len(X))
            for start in range(0, len(X), 256):
                idx = order[start:start + 256]
                streamed.partial_fit(Xdq[idx], y[idx], classes=classes)
                resident.partial_fit_resident(idx, y[idx], classes=classes)
        assert streamed.loss_curve_ == resident.loss_curve_
        for wa, wb in zip(streamed.coefs_, resident.coefs_):
            np.testing.assert_array_equal(wa, wb)
        np.testing.assert_array_equal(
            streamed.predict_proba(Xdq[:50]),
            resident.predict_proba_resident(np.arange(50)),
        )

    def test_int8_behind_cosine_gate(self):
        """THE GATE: through the same trained params, the resident forward
        over int8-stored rows must agree with the host f32 forward to min
        cosine >= 0.999 (house reduced-precision discipline)."""
        X, y = self._data(n=400)
        classes = sorted(set(y.tolist()))
        f32 = MLPClassifier((16, 8), learning_rate_init=1e-2, random_state=3)
        q8 = MLPClassifier((16, 8), learning_rate_init=1e-2, random_state=3)
        f32.set_resident_features(X)
        q8.set_resident_features(X, dtype="int8")
        idx = np.arange(len(X))
        for _ in range(3):
            f32.partial_fit_resident(idx, y, classes=classes)
            q8.partial_fit_resident(idx, y, classes=classes)

        def min_cosine(a, b):
            num = np.sum(a * b, axis=1)
            den = np.linalg.norm(a, axis=1) * np.linalg.norm(b, axis=1)
            return float(np.min(num / np.maximum(den, 1e-12)))

        p_res = q8.predict_proba_resident(idx[:100])
        p_host = q8.predict_proba(X[:100])
        assert min_cosine(p_host, p_res) >= 0.999
        # Quality band: the int8-trained and f32-trained models stay close.
        p_f32 = f32.predict_proba(X[:100])
        assert min_cosine(p_f32, p_host) >= 0.98
        np.testing.assert_allclose(
            f32.loss_curve_, q8.loss_curve_, rtol=5e-2
        )

    def test_chunked_upload_int8_equals_reference_quantization(self):
        """Slab-by-slab int8 upload (preallocated scratch, no fresh
        temporaries) == the direct quantization formula."""
        X, _ = self._data(n=237, dim=16)
        _, q_ref, scale = self._dequantized(X)
        chunked = np.asarray(
            MLPClassifier._chunked_device_put(
                X, chunk_bytes=16 * 32, dtype=jnp.int8, row_scale=scale
            )
        )
        np.testing.assert_array_equal(q_ref, chunked)

    def test_int8_accuracy_band_on_synthetic_task(self):
        """Quantization is feature noise, not arithmetic drift — trained
        accuracy must hold the band vs the raw-feature run."""
        X, y = self._data(n=800)
        classes = sorted(set(y.tolist()))
        idx = np.arange(len(X))
        raw = MLPClassifier((16, 8), learning_rate_init=1e-2, random_state=0)
        q8 = MLPClassifier((16, 8), learning_rate_init=1e-2, random_state=0)
        raw.set_resident_features(X)
        q8.set_resident_features(X, dtype="int8")
        for _ in range(5):
            raw.partial_fit_resident(idx, y, classes=classes)
            q8.partial_fit_resident(idx, y, classes=classes)
        acc_raw = float(np.mean(raw.predict_resident(idx) == y))
        acc_q8 = float(np.mean(q8.predict_resident(idx) == y))
        assert acc_q8 >= acc_raw - 0.03

    def test_int8_zero_rows_safe(self):
        X = np.zeros((8, 6), dtype=np.float32)
        X[0, 0] = 2.0  # one non-degenerate row
        y = np.asarray(["a", "b"] * 4)
        clf = MLPClassifier((4,), random_state=0)
        clf.set_resident_features(X, dtype="int8")
        scale = np.asarray(clf._resident_scale)
        assert np.all(np.isfinite(scale)) and np.all(scale > 0)
        clf.partial_fit_resident(np.arange(8), y, classes=["a", "b"])
        probs = clf.predict_proba_resident(np.arange(8))
        assert np.all(np.isfinite(probs))

    def test_int8_subnormal_rows_safe(self):
        """A row of ~1e-41 values yields a SUBNORMAL absmax/127 whose f32
        reciprocal overflows to inf (0 * inf = NaN -> undefined int8
        cast); the scale floor must treat such rows as zero rows."""
        X = np.full((4, 6), 1e-41, dtype=np.float32)
        X[0, 0] = 1.0  # one healthy row
        scale = MLPClassifier._int8_row_scales(X)
        assert np.all(np.isfinite(1.0 / scale))
        clf = MLPClassifier((4,), random_state=0)
        clf.set_resident_features(X, dtype="int8")
        q = np.asarray(clf._resident_X)
        # Subnormal rows quantize to exact zeros, not saturated 127s.
        assert np.all(q[1:] == 0)
        assert q[0, 0] == 127

    def test_int8_mesh_matches_single_device(self):
        from mermaid_classifier_tpu.parallel.mesh import make_mesh

        X, y = self._data(n=300, dim=16, k=3, seed=5)
        classes = sorted(set(y.tolist()))
        single = MLPClassifier((12,), random_state=2)
        single.set_resident_features(X, dtype="int8")
        sharded = MLPClassifier((12,), random_state=2,
                                mesh=make_mesh(8, model_parallel=1))
        sharded.set_resident_features(X, dtype="int8")
        # The sharded buffer pads rows to the device count; padding rows
        # carry scale 1.0 and are never indexed.
        rng2 = np.random.default_rng(1)
        for _ in range(2):
            order = rng2.permutation(len(X))
            for s in range(0, len(X), 128):
                idx = order[s:s + 128]
                single.partial_fit_resident(idx, y[idx], classes=classes)
                sharded.partial_fit_resident(idx, y[idx], classes=classes)
        assert single.loss_curve_ == pytest.approx(
            sharded.loss_curve_, abs=1e-6
        )
        np.testing.assert_allclose(
            single.predict_proba_resident(np.arange(64)),
            sharded.predict_proba_resident(np.arange(64)),
            rtol=1e-5, atol=1e-6,
        )

    def test_storage_api_matches_quantize_path_on_mesh(self):
        """set_resident_features_storage with pre-quantized rows must
        equal set_resident_features(X, 'int8') — including the mesh
        branch (row padding, scale padding, sharding)."""
        from mermaid_classifier_tpu.parallel.mesh import make_mesh

        X, y = self._data(n=300, dim=16, k=3, seed=5)
        Xdq, q, scale = self._dequantized(X)
        classes = sorted(set(y.tolist()))
        via_x = MLPClassifier((12,), random_state=2,
                              mesh=make_mesh(8, model_parallel=1))
        via_x.set_resident_features(X, dtype="int8")
        via_storage = MLPClassifier((12,), random_state=2,
                                    mesh=make_mesh(8, model_parallel=1))
        via_storage.set_resident_features_storage(q, scale)
        np.testing.assert_array_equal(
            np.asarray(via_x._resident_X), np.asarray(via_storage._resident_X)
        )
        np.testing.assert_array_equal(
            np.asarray(via_x._resident_scale),
            np.asarray(via_storage._resident_scale),
        )
        idx = np.arange(len(X))
        via_x.partial_fit_resident(idx, y, classes=classes)
        via_storage.partial_fit_resident(idx, y, classes=classes)
        assert via_x.loss_curve_ == via_storage.loss_curve_

    def test_storage_api_guards(self):
        X, _ = self._data(n=8, dim=4)
        clf = MLPClassifier((4,))
        with pytest.raises(ValueError, match="scale vector"):
            clf.set_resident_features_storage(
                np.zeros((8, 4), np.int8), None
            )
        with pytest.raises(ValueError, match="storage dtype"):
            clf.set_resident_features_storage(X, None)  # f32 not a storage form
        with pytest.raises(ValueError, match="only valid with int8"):
            clf.set_resident_features_storage(
                X.astype(jnp.bfloat16), np.ones(8, np.float32)
            )

    def test_pickle_drops_scale_and_deepcopy_shares_it(self):
        import copy
        import pickle

        X, y = self._data(n=64)
        clf = MLPClassifier((8,), random_state=0)
        clf.set_resident_features(X, dtype="int8")
        clf.partial_fit_resident(np.arange(64), y, classes=sorted(set(y)))
        snap = copy.deepcopy(clf)
        assert snap._resident_scale is clf._resident_scale
        clone = pickle.loads(pickle.dumps(clf))
        assert getattr(clone, "_resident_scale", None) is None
        assert getattr(clone, "_resident_X", None) is None


class TestBatchSizeAndPickleCompat:
    """Scenario-parity with the reference battery: auto batch-size rule,
    explicit clipping, and resuming an OLD pickle that predates
    newer attributes (reference: tests/pyspacer/test_mlp_benchmark.py:
    262-283, 467-494)."""

    def _fitted(self, n=30, batch_size="auto"):
        rng = np.random.default_rng(0)
        X = rng.standard_normal((n, 6)).astype(np.float32)
        y = np.asarray(["a", "b"] * (n // 2))
        clf = MLPClassifier((4,), random_state=0, batch_size=batch_size)
        clf.partial_fit(X, y, classes=["a", "b"])
        return clf, X, y

    def test_auto_batch_size_is_min_200_and_n_samples(self):
        clf, _, _ = self._fitted()
        assert clf._resolve_batch_size(30) == 30
        assert clf._resolve_batch_size(1000) == 200

    def test_explicit_batch_size_clipped_to_n_samples(self):
        clf, _, _ = self._fitted(batch_size=64)
        assert clf._resolve_batch_size(10) == 10
        assert clf._resolve_batch_size(500) == 64

    def test_old_pickle_without_new_attributes_resumes(self):
        import pickle

        clf, X, y = self._fitted()
        state = clf.__getstate__()
        # Simulate a pickle written before these attributes existed.
        for attr in ("class_weight", "_class_weight_vector", "mesh",
                     "n_iter_no_change", "init"):
            state.pop(attr, None)
        blob = pickle.dumps(state)

        clone = MLPClassifier.__new__(MLPClassifier)
        clone.__setstate__(pickle.loads(blob))
        assert clone.class_weight is None
        assert clone.mesh is None
        assert clone.n_iter_no_change == 10
        assert clone.init == "reference"
        # Resumable: training continues and predictions still work.
        clone.partial_fit(X, y)
        np.testing.assert_array_equal(
            np.sort(np.unique(clone.predict(X))),
            np.sort(clone.classes_),
        )


class TestWarmResidentPrograms:
    """AOT program warming (warm_resident_programs) must only move WHEN
    compilation happens: the warmed executables are consulted first, produce
    bit-identical training/inference results, and an unwarmed geometry
    falls back to the jit path."""

    def _data(self, n=437, dim=24, k=5, seed=0):
        rng = np.random.default_rng(seed)
        X = rng.standard_normal((n, dim)).astype(np.float32)
        y = np.asarray([f"c{i}" for i in rng.integers(0, k, n)])
        return X, y

    def _train(self, X, y, warm, dtype="float32"):
        classes = sorted(set(y.tolist()))
        clf = MLPClassifier((16, 8), batch_size=64, random_state=0)
        if warm:
            stats = clf.warm_resident_programs(
                n_rows=len(X), dim=X.shape[1], n_classes=len(classes),
                train_batch_row_counts=[300, len(X) - 300],
                eval_batch_row_counts=[len(X)], dtype=dtype,
            )
            assert stats["epoch_programs"] == 2
            assert stats["forward_programs"] == 1
        clf.set_resident_features(X, dtype=dtype)
        idx = np.arange(len(X), dtype=np.int32)
        clf.partial_fit_resident(idx[:300], y[:300], classes=classes)
        clf.partial_fit_resident(idx[300:], y[300:])
        return clf, clf.predict_proba_resident(idx)

    def test_warmed_bitwise_identical_to_jit(self):
        X, y = self._data()
        cold, p_cold = self._train(X, y, warm=False)
        warm, p_warm = self._train(X, y, warm=True)
        assert cold.loss_curve_ == warm.loss_curve_
        for wa, wb in zip(cold.coefs_, warm.coefs_):
            np.testing.assert_array_equal(wa, wb)
        np.testing.assert_array_equal(p_cold, p_warm)

    def test_warmed_executables_are_used(self, monkeypatch):
        """If the lookup key ever drifts from the call-site geometry the
        warm path would silently fall back to jit (and recompile at full
        price) — so pin that the makers are NOT consulted after warming."""
        import mermaid_classifier_tpu.train.mlp_classifier as mod

        X, y = self._data()
        classes = sorted(set(y.tolist()))
        clf = MLPClassifier((16, 8), batch_size=64, random_state=0)
        clf.warm_resident_programs(
            n_rows=len(X), dim=X.shape[1], n_classes=len(classes),
            train_batch_row_counts=[300, len(X) - 300],
            eval_batch_row_counts=[len(X)],
        )
        clf.set_resident_features(X)

        def boom(*a, **k):
            raise AssertionError("fell back to the jit path")

        monkeypatch.setattr(mod, "_make_resident_epoch_fn", boom)
        monkeypatch.setattr(mod, "_jitted_forward_resident", boom)
        idx = np.arange(len(X), dtype=np.int32)
        clf.partial_fit_resident(idx[:300], y[:300], classes=classes)
        clf.partial_fit_resident(idx[300:], y[300:])
        clf.predict_proba_resident(idx)

    def test_unwarmed_geometry_falls_back(self):
        X, y = self._data()
        classes = sorted(set(y.tolist()))
        clf = MLPClassifier((16, 8), batch_size=64, random_state=0)
        clf.warm_resident_programs(
            n_rows=len(X), dim=X.shape[1], n_classes=len(classes),
            train_batch_row_counts=[123],
        )
        clf.set_resident_features(X)
        idx = np.arange(len(X), dtype=np.int32)
        clf.partial_fit_resident(idx, y, classes=classes)  # 437 != 123: jit
        assert len(clf.loss_curve_) == 1

    def test_bfloat16_resident_warm(self):
        X, y = self._data()
        cold, p_cold = self._train(X, y, warm=False, dtype="bfloat16")
        warm, p_warm = self._train(X, y, warm=True, dtype="bfloat16")
        assert cold.loss_curve_ == warm.loss_curve_
        np.testing.assert_array_equal(p_cold, p_warm)

    def test_int8_resident_warm(self):
        X, y = self._data()
        cold, p_cold = self._train(X, y, warm=False, dtype="int8")
        warm, p_warm = self._train(X, y, warm=True, dtype="int8")
        assert cold.loss_curve_ == warm.loss_curve_
        np.testing.assert_array_equal(p_cold, p_warm)

    def test_int8_warmed_executables_are_used(self, monkeypatch):
        """The int8 programs take an extra scale argument — pin that the
        warmed executable (not a jit fallback) serves the quantized
        geometry too, so key or signature drift fails loudly."""
        import mermaid_classifier_tpu.train.mlp_classifier as mod

        X, y = self._data()
        classes = sorted(set(y.tolist()))
        clf = MLPClassifier((16, 8), batch_size=64, random_state=0)
        clf.warm_resident_programs(
            n_rows=len(X), dim=X.shape[1], n_classes=len(classes),
            train_batch_row_counts=[300, len(X) - 300],
            eval_batch_row_counts=[len(X)], dtype="int8",
        )
        clf.set_resident_features(X, dtype="int8")

        def boom(*a, **k):
            raise AssertionError("fell back to the jit path")

        monkeypatch.setattr(mod, "_make_resident_epoch_fn", boom)
        monkeypatch.setattr(mod, "_jitted_forward_resident", boom)
        idx = np.arange(len(X), dtype=np.int32)
        clf.partial_fit_resident(idx[:300], y[:300], classes=classes)
        clf.partial_fit_resident(idx[300:], y[300:])
        clf.predict_proba_resident(idx)

    def _head_pytree(self, clf):
        """A shipped-artifact-shaped head pytree for clf's architecture
        (arbitrary but deterministic Platt params)."""
        import jax.numpy as jnp

        k = len(clf.classes_)
        return {
            "weights": [jnp.asarray(w) for w in clf.coefs_],
            "biases": [jnp.asarray(b) for b in clf.intercepts_],
            "a": jnp.asarray(np.linspace(-2.0, -0.5, k), dtype=jnp.float32),
            "b": jnp.asarray(np.linspace(0.1, 0.4, k), dtype=jnp.float32),
        }

    def test_warmed_head_program_bitwise_identical(self):
        """warm_resident_programs(head_row_counts=...) pre-compiles the
        eval-the-artifact program; its output must be bit-identical to the
        jit path for f32 and int8 residency."""
        for dtype in ("float32", "int8"):
            X, y = self._data()
            cold, _ = self._train(X, y, warm=False, dtype=dtype)
            idx = np.arange(len(X), dtype=np.int32)
            head = self._head_pytree(cold)
            p_cold = cold.predict_proba_resident_head(head, idx)

            classes = sorted(set(y.tolist()))
            warm = MLPClassifier((16, 8), batch_size=64, random_state=0)
            stats = warm.warm_resident_programs(
                n_rows=len(X), dim=X.shape[1], n_classes=len(classes),
                train_batch_row_counts=[300, len(X) - 300],
                head_row_counts=[len(X)], dtype=dtype,
            )
            assert stats["head_programs"] == 1
            warm.set_resident_features(X, dtype=dtype)
            warm.partial_fit_resident(idx[:300], y[:300], classes=classes)
            warm.partial_fit_resident(idx[300:], y[300:])
            p_warm = warm.predict_proba_resident_head(
                self._head_pytree(warm), idx
            )
            np.testing.assert_array_equal(p_cold, p_warm, err_msg=dtype)

    def test_warmed_pred_executable_is_used(self, monkeypatch):
        import mermaid_classifier_tpu.train.mlp_classifier as mod

        X, y = self._data()
        classes = sorted(set(y.tolist()))
        clf = MLPClassifier((16, 8), batch_size=64, random_state=0)
        stats = clf.warm_resident_programs(
            n_rows=len(X), dim=X.shape[1], n_classes=len(classes),
            train_batch_row_counts=[len(X)], pred_row_counts=[len(X)],
        )
        assert stats["pred_programs"] == 1
        clf.set_resident_features(X)
        idx = np.arange(len(X), dtype=np.int32)
        clf.partial_fit_resident(idx, y, classes=classes)

        def boom(*a, **k):
            raise AssertionError("fell back to the jit path")

        monkeypatch.setattr(mod, "_jitted_predict_resident", boom)
        clf.predict_indices_resident(idx)

    def test_warmed_eval_executable_is_used(self, monkeypatch):
        """warm_resident_programs(eval_pair_row_counts=...) pre-compiles
        the fused counts program; the dispatch must hit it (no jit
        fallback) and produce the same two scalars as the cold path."""
        import mermaid_classifier_tpu.train.mlp_classifier as mod

        X, y = self._data()
        classes = sorted(set(y.tolist()))
        cold = MLPClassifier((16, 8), batch_size=64, random_state=0)
        cold.set_resident_features(X)
        idx = np.arange(len(X), dtype=np.int32)
        cold.partial_fit_resident(idx, y, classes=classes)
        pos = {c: i for i, c in enumerate(cold.classes_)}
        y_idx = np.asarray([pos[v] for v in y], dtype=np.int32)
        expected = cold.eval_counts_resident(idx, y_idx)

        warm = MLPClassifier((16, 8), batch_size=64, random_state=0)
        stats = warm.warm_resident_programs(
            n_rows=len(X), dim=X.shape[1], n_classes=len(classes),
            train_batch_row_counts=[len(X)], eval_pair_row_counts=[len(X)],
        )
        assert stats["eval_programs"] == 1
        warm.set_resident_features(X)
        warm.partial_fit_resident(idx, y, classes=classes)

        def boom(*a, **k):
            raise AssertionError("fell back to the jit path")

        monkeypatch.setattr(mod, "_jitted_eval_resident", boom)
        np.testing.assert_array_equal(
            warm.eval_counts_resident(idx, y_idx), expected
        )

    def test_head_program_different_architecture_falls_back(self):
        """An artifact with different hidden sizes but matching (rows,
        dim, classes, dtype) must MISS the warmed executable and fall
        back to jit — the key carries the architecture; a stale hit
        would crash on mismatched avals instead of serving."""
        import jax.numpy as jnp

        X, y = self._data()
        classes = sorted(set(y.tolist()))
        clf = MLPClassifier((16, 8), batch_size=64, random_state=0)
        clf.warm_resident_programs(
            n_rows=len(X), dim=X.shape[1], n_classes=len(classes),
            train_batch_row_counts=[len(X)], head_row_counts=[len(X)],
        )
        clf.set_resident_features(X)
        idx = np.arange(len(X), dtype=np.int32)
        clf.partial_fit_resident(idx, y, classes=classes)

        k = len(classes)
        dim = X.shape[1]
        rng = np.random.default_rng(0)
        head = {
            "weights": [
                jnp.asarray(
                    rng.standard_normal((dim, 4)).astype(np.float32)
                ),
                jnp.asarray(rng.standard_normal((4, k)).astype(np.float32)),
            ],
            "biases": [
                jnp.zeros(4, jnp.float32),
                jnp.zeros(k, jnp.float32),
            ],
            "a": jnp.asarray(np.full(k, -1.0, np.float32)),
            "b": jnp.asarray(np.zeros(k, np.float32)),
        }
        out = clf.predict_proba_resident_head(head, idx)
        assert out.shape == (len(X), k)
        np.testing.assert_allclose(out.sum(axis=1), 1.0, atol=1e-5)

    def test_warmed_head_executable_is_used(self, monkeypatch):
        import mermaid_classifier_tpu.train.mlp_classifier as mod

        X, y = self._data()
        classes = sorted(set(y.tolist()))
        clf = MLPClassifier((16, 8), batch_size=64, random_state=0)
        clf.warm_resident_programs(
            n_rows=len(X), dim=X.shape[1], n_classes=len(classes),
            train_batch_row_counts=[len(X)], head_row_counts=[len(X)],
        )
        clf.set_resident_features(X)
        idx = np.arange(len(X), dtype=np.int32)
        clf.partial_fit_resident(idx, y, classes=classes)

        def boom(*a, **k):
            raise AssertionError("fell back to the jit path")

        monkeypatch.setattr(mod, "_jitted_head_apply_resident", boom)
        clf.predict_proba_resident_head(self._head_pytree(clf), idx)

    def _temp_head_pytree(self, clf, inv_t=0.5):
        """A temperature-calibrated artifact pytree (HeadParams.as_pytree
        structure for calibration='temperature')."""
        import jax.numpy as jnp

        return {
            "weights": [jnp.asarray(w) for w in clf.coefs_],
            "biases": [jnp.asarray(b) for b in clf.intercepts_],
            "inv_t": jnp.asarray(inv_t, jnp.float32),
        }

    def test_temperature_head_misses_warmed_sigmoid_program(self):
        """Regression: a temperature artifact at the SAME geometry as a
        warmed sigmoid head program must miss it (the calibration kind is
        in the key) and produce softmax(inv_t * logits) — the original key
        derivation read head_pytree['a'] and crashed with KeyError."""
        X, y = self._data()
        classes = sorted(set(y.tolist()))
        clf = MLPClassifier((16, 8), batch_size=64, random_state=0)
        clf.warm_resident_programs(
            n_rows=len(X), dim=X.shape[1], n_classes=len(classes),
            train_batch_row_counts=[len(X)], head_row_counts=[len(X)],
        )
        clf.set_resident_features(X)
        idx = np.arange(len(X), dtype=np.int32)
        clf.partial_fit_resident(idx, y, classes=classes)

        head = self._temp_head_pytree(clf, inv_t=0.5)
        out = clf.predict_proba_resident_head(head, idx)
        # Differential vs the inference-lane head on the same rows.
        from mermaid_classifier_tpu.inference.head import HeadParams, head_apply

        params = HeadParams(
            [np.asarray(w) for w in clf.coefs_],
            [np.asarray(b) for b in clf.intercepts_],
            temperature=2.0,  # inv_t = 0.5
        )
        import jax.numpy as jnp

        expected = np.asarray(
            head_apply(params.as_pytree(), jnp.asarray(X, jnp.float32))
        ).astype(np.float64)
        np.testing.assert_allclose(out, expected, atol=1e-6)
        np.testing.assert_allclose(out.sum(axis=1), 1.0, atol=1e-6)

    def test_warmed_temperature_head_executable_is_used(self, monkeypatch):
        import mermaid_classifier_tpu.train.mlp_classifier as mod

        X, y = self._data()
        classes = sorted(set(y.tolist()))
        clf = MLPClassifier((16, 8), batch_size=64, random_state=0)
        stats = clf.warm_resident_programs(
            n_rows=len(X), dim=X.shape[1], n_classes=len(classes),
            train_batch_row_counts=[len(X)], head_row_counts=[len(X)],
            head_calibration="temperature",
        )
        assert stats["head_programs"] == 1
        clf.set_resident_features(X)
        idx = np.arange(len(X), dtype=np.int32)
        clf.partial_fit_resident(idx, y, classes=classes)

        def boom(*a, **k):
            raise AssertionError("fell back to the jit path")

        monkeypatch.setattr(mod, "_jitted_head_apply_resident", boom)
        clf.predict_proba_resident_head(self._temp_head_pytree(clf), idx)

    def test_mesh_skips_warming(self):
        from mermaid_classifier_tpu.parallel.mesh import make_mesh

        clf = MLPClassifier((16, 8), batch_size=64, random_state=0,
                            mesh=make_mesh(8))
        stats = clf.warm_resident_programs(
            n_rows=100, dim=8, n_classes=3, train_batch_row_counts=[100],
        )
        assert stats.get("skipped") == "mesh"

    def test_pickle_drops_and_deepcopy_shares_execs(self):
        import copy
        import pickle

        X, y = self._data()
        warm, _ = self._train(X, y, warm=True)
        assert len(warm._resident_exec) == 3
        snap = copy.deepcopy(warm)
        assert snap._resident_exec is warm._resident_exec
        restored = pickle.loads(pickle.dumps(warm))
        assert "_resident_exec" not in restored.__dict__
        # The restored model still predicts (plain jit path).
        p = restored.predict_proba(X[:8])
        assert p.shape == (8, len(warm.classes_))
