"""Differential: our JAX MLP head vs a torch reimplementation of the
reference's TorchMLPClassifier update math (reference:
torch_classifier.py:184-302 — weighted CE + per-mini-batch L2 + torch Adam).

The reference's own differential battery runs against sklearn AND torch
(test_mlp_benchmark.py); this is the torch leg: identical init, identical
batches (shuffle disabled), per-step loss and parameter agreement within
float32 tolerance across several Adam steps.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from mermaid_classifier_tpu.train.mlp_classifier import MLPClassifier  # noqa: E402

D, H1, K = 12, 8, 3
LR, ALPHA = 1e-2, 0.01


def _torch_reference(weights, biases, xs, ys, ws, ns, steps_losses_out):
    """Replay the same mini-batches with torch Adam + weighted CE + scaled L2."""
    params = []
    for w, b in zip(weights, biases):
        tw = torch.nn.Parameter(torch.tensor(w))
        tb = torch.nn.Parameter(torch.tensor(b))
        params.extend([tw, tb])
    opt = torch.optim.Adam(params, lr=LR, betas=(0.9, 0.999), eps=1e-8)

    def forward(x):
        h = x
        n_layers = len(params) // 2
        for i in range(n_layers):
            h = h @ params[2 * i] + params[2 * i + 1]
            if i < n_layers - 1:
                h = torch.relu(h)
        return h

    for xb, yb, wb, n_real in zip(xs, ys, ws, ns):
        x = torch.tensor(xb)
        y = torch.tensor(yb, dtype=torch.long)
        w = torch.tensor(wb)
        logits = forward(x)
        logp = torch.log_softmax(logits, dim=1)
        ce = -logp.gather(1, y[:, None])[:, 0]
        data_loss = (w * ce).sum() / w.sum()
        sq = sum((p * p).sum() for p in params[0::2])
        loss = data_loss + (0.5 * ALPHA / float(n_real)) * sq
        opt.zero_grad()
        loss.backward()
        opt.step()
        steps_losses_out.append(float(loss))
    return [p.detach().numpy() for p in params]


class TestTorchParity:
    def test_per_step_losses_and_params_match(self):
        rng = np.random.default_rng(0)
        n = 40
        X = rng.standard_normal((n, D)).astype(np.float32)
        y = rng.integers(0, K, size=n)
        classes = [f"c{i}" for i in range(K)]
        y_lab = np.asarray(classes)[y]

        clf = MLPClassifier(
            (H1,), learning_rate_init=LR, alpha=ALPHA, batch_size=10,
            random_state=0, shuffle=False,
        )
        # Capture the Xavier init BEFORE any update by doing a zero-step
        # trick: init params by calling partial_fit on... instead, init via
        # the private hooks the class exposes.
        clf.classes_ = np.asarray(classes)
        clf.n_features_in_ = D
        clf._init_params()
        init_w = [w.copy() for w in clf.coefs_]
        init_b = [b.copy() for b in clf.intercepts_]
        # reset so partial_fit re-initializes identically (same seed)
        del clf._params

        for _ in range(2):  # 2 partial_fit calls x 4 mini-batches
            clf.partial_fit(X, y_lab, classes=classes)

        # Torch replay of the identical batch sequence.
        xs, ys_idx, ws, ns = [], [], [], []
        for _ in range(2):
            for s in range(0, n, 10):
                xs.append(X[s:s + 10])
                ys_idx.append(y[s:s + 10].astype(np.int64))
                ws.append(np.ones(10, np.float32))
                ns.append(10.0)
        torch_losses: list[float] = []
        final_params = _torch_reference(
            init_w, init_b, xs, ys_idx, ws, ns, torch_losses
        )

        # loss_curve_ entries are the size-weighted mean of each call's
        # 4 mini-batch losses.
        expected_curve = [
            float(np.mean(torch_losses[0:4])),
            float(np.mean(torch_losses[4:8])),
        ]
        assert clf.loss_curve_ == pytest.approx(expected_curve, rel=2e-5)

        torch_w = final_params[0::2]
        torch_b = final_params[1::2]
        for wa, wb in zip(clf.coefs_, torch_w):
            np.testing.assert_allclose(wa, wb, rtol=2e-4, atol=2e-6)
        for ba, bb in zip(clf.intercepts_, torch_b):
            np.testing.assert_allclose(ba, bb, rtol=2e-4, atol=2e-6)
