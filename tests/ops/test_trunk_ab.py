"""Schedule-string parsing of the full-trunk A/B harness stays valid: a
broken schedule name must fail loudly, and every advertised schedule must
build a runnable forward (CPU, tiny config)."""

import jax.numpy as jnp
import numpy as np
import pytest

from mermaid_classifier_tpu.experiments.trunk_ab import build_forward
from mermaid_classifier_tpu.models.efficientnet import (
    EfficientNetBackbone,
    EfficientNetConfig,
    init_backbone_params,
)

TINY = EfficientNetConfig(
    stem_channels=8,
    stages=((1, 8, 1, 1, 3), (6, 16, 1, 2, 5)),
    head_channels=32,
    feature_dim=64,
    patch_size=32,
)


@pytest.fixture(scope="module")
def model_and_vars():
    model = EfficientNetBackbone(config=TINY)
    return model, init_backbone_params(0, TINY)


@pytest.mark.parametrize("schedule", [
    "flax", "folded", "folded+taps5", "folded+im2col", "folded+dwp5",
    "folded+w8",
])
def test_schedule_builds_and_runs(schedule, model_and_vars):
    model, variables = model_and_vars
    fwd, weights = build_forward(schedule, model, variables, TINY)
    x = jnp.asarray(
        np.random.default_rng(0).standard_normal((2, 32, 32, 3)),
        jnp.float32,
    )
    if schedule == "folded+dwp5":
        # the Pallas path needs interpret mode off-TPU; route through
        # apply_folded directly with interpret.
        from mermaid_classifier_tpu.ops.fused_mbconv import apply_folded

        out = apply_folded(weights, TINY, x, dw_pallas_kernels=(5,),
                           interpret=True)
    else:
        out = fwd(weights, x)
    assert out.shape == (2, 64)
    assert np.isfinite(np.asarray(out)).all()


def test_numerics_gate_self_is_one_and_w8_passes(model_and_vars):
    """The --numerics-gate leg: a schedule gated against itself is exactly
    cosine 1.0 (same jit, same weights), and the w8 quantized trunk clears
    the same 0.999 bar the device gate applies (differential: the gate
    harness itself, not just quantize_folded, is what the on-chip A/B
    trusts)."""
    from mermaid_classifier_tpu.experiments.trunk_ab import gate_cosine

    model, variables = model_and_vars
    f_ref, w_ref = build_forward("folded", model, variables, TINY)
    assert gate_cosine(f_ref, w_ref, f_ref, w_ref, TINY, chunk=4) >= 1 - 1e-6
    f_w8, w_w8 = build_forward("folded+w8", model, variables, TINY)
    cos = gate_cosine(f_ref, w_ref, f_w8, w_w8, TINY, chunk=4)
    assert cos >= 0.999, cos


def test_unknown_schedule_rejected(model_and_vars):
    model, variables = model_and_vars
    with pytest.raises(ValueError):
        build_forward("folded+nope", model, variables, TINY)
    with pytest.raises(ValueError):
        build_forward("quantum", model, variables, TINY)
