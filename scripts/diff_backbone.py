#!/usr/bin/env python
"""Layer-by-layer activation diff: a torch EfficientNet checkpoint vs the
Flax backbone after remap + conversion.

The landing strip for real production weights (the reference's
``efficientnet.pt``, reference: build_feature_bucket.py:451-502 exists
because even its own mps/cuda devices drift): one command answers "do these
weights reproduce in this framework, and if not, WHICH layer diverges
first". Usage:

    python scripts/diff_backbone.py weights.pt                # real weights
    python scripts/diff_backbone.py weights.pt --feature-dim 1280
    python scripts/diff_backbone.py --self-test               # torch mirror

Accepts torchvision naming, lukemelas/EfficientNet-PyTorch naming (what
pyspacer-lineage checkpoints use), or this repo's canonical naming —
detected automatically, remap table printable with --dump-remap. The diff
runs the SAME canonical weights through (a) a torch execution and (b) the
converted Flax model, capturing every stem/block/head activation on an
identical probe batch, and reports per-layer max|Δ| against --layer-tol
plus the final-feature MAE against --feature-tol (the BASELINE.md <1e-4
contract). Exit 0 only when every row is green.
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tests"))


def load_state_dict(path: str):
    """torch .pt (plain state_dict or scripted module) or flat .npz."""
    if path.endswith(".npz"):
        import numpy as np

        with np.load(path, allow_pickle=False) as archive:
            return {k: archive[k] for k in archive.files}
    import torch

    try:
        payload = torch.load(path, map_location="cpu", weights_only=True)
    except Exception:
        payload = torch.jit.load(path, map_location="cpu").state_dict()
    if hasattr(payload, "state_dict"):
        payload = payload.state_dict()
    if isinstance(payload, dict) and "state_dict" in payload:
        payload = payload["state_dict"]
    # The production efficientnet.pt is a CoralNet DataParallel checkpoint
    # dict: the state_dict lives under 'net' with 'module.'-prefixed keys
    # (pyspacer load_weights semantics; the prefix strip happens in
    # models/remap.strip_module_prefix). Pinned by
    # tests/parity/test_pyspacer_lineage.py.
    if isinstance(payload, dict) and "net" in payload and isinstance(
        payload["net"], dict
    ):
        payload = payload["net"]
    return payload


def collect_torch_activations(model, probe_nchw):
    """{module_path: output ndarray} for every named submodule + '' (final)."""
    import numpy as np
    import torch

    acts: dict[str, np.ndarray] = {}

    def hook_for(name):
        def hook(_mod, _inp, out):
            acts[name] = out.detach().numpy()
        return hook

    handles = [
        mod.register_forward_hook(hook_for(name))
        for name, mod in model.named_modules()
        if name
    ]
    model.eval()
    with torch.no_grad():
        acts[""] = model(torch.from_numpy(probe_nchw)).numpy()
    for h in handles:
        h.remove()
    return acts


def collect_flax_activations(variables, config, probe_nhwc):
    """{module_path: output ndarray} via capture_intermediates + final."""
    import numpy as np

    from mermaid_classifier_tpu.models.efficientnet import EfficientNetBackbone

    model = EfficientNetBackbone(config=config)
    out, state = model.apply(
        variables, probe_nhwc, capture_intermediates=True
    )
    acts: dict[str, np.ndarray] = {"": np.asarray(out)}

    def walk(prefix, node):
        for key, value in node.items():
            if key == "__call__":
                if prefix:
                    acts[prefix] = np.asarray(value[0], dtype=np.float32)
            else:
                walk(f"{prefix}.{key}" if prefix else key, value)

    walk("", state["intermediates"])
    return acts


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("weights", nargs="?", default=None,
                        help=".pt/.npz checkpoint; omit with --self-test")
    parser.add_argument("--self-test", action="store_true",
                        help="diff against the seeded torch mirror instead"
                        " of a file (proves the harness end to end)")
    parser.add_argument("--feature-dim", type=int, default=None,
                        help="override feature_dim (e.g. 1280 for a raw"
                        " torchvision checkpoint with no 4096 projection)")
    parser.add_argument("--padding", choices=("auto", "symmetric", "tf_same"),
                        default="auto",
                        help="conv padding semantics; 'auto' picks tf_same"
                        " for lukemelas-named checkpoints (the pyspacer"
                        " lineage uses TF-SAME static asymmetric padding)"
                        " and symmetric otherwise")
    parser.add_argument("--bn-eps", type=float, default=None,
                        help="BatchNorm epsilon override (lukemelas/TF"
                        " lineage: 1e-3, the default; raw torchvision"
                        " checkpoints: 1e-5)")
    parser.add_argument("--config-json", default=None,
                        help="EfficientNetConfig.to_dict() JSON overriding"
                        " the production B0 geometry")
    parser.add_argument("--probe-batch", type=int, default=8)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--feature-tol", type=float, default=1e-4,
                        help="final-feature MAE gate (BASELINE.md contract)")
    parser.add_argument("--layer-tol", type=float, default=5e-4,
                        help="per-layer max|delta| gate")
    parser.add_argument("--dump-remap", default=None,
                        help="write the applied old->new key table as CSV")
    parser.add_argument("--save-npz", default=None,
                        help="on ALL GREEN, persist the converted weights as"
                        " a pickle-free npz PLUS the .config.json sidecar"
                        " recording the padding/bn_eps lineage decision —"
                        " build_feature_bucket/annotate_image pick the"
                        " sidecar up by default")
    parser.add_argument("--record", default=None,
                        help="write the fidelity record JSON here — the"
                        " release-blocking proof serve/release.py requires"
                        " before shipping backbone weights"
                        " (docs/release_fidelity_runbook.md)")
    args = parser.parse_args(argv)

    import numpy as np

    import jax

    jax.config.update("jax_platforms", "cpu")

    from mermaid_classifier_tpu.models.convert import (
        torch_state_dict_to_variables,
    )
    from mermaid_classifier_tpu.models.efficientnet import EfficientNetConfig
    from mermaid_classifier_tpu.models.remap import (
        detect_naming_scheme,
        remap_state_dict,
        strip_module_prefix,
    )

    if args.config_json:
        import json

        with open(args.config_json) as f:
            config_dict = json.load(f)
        if args.feature_dim:
            config_dict["feature_dim"] = args.feature_dim
        config = EfficientNetConfig.from_dict(config_dict)
    else:
        config = EfficientNetConfig(
            feature_dim=args.feature_dim or EfficientNetConfig().feature_dim
        )

    if args.self_test:
        import torch

        from parity.torch_efficientnet_ref import (
            TorchEfficientNetBackbone,
            randomize_bn_stats,
        )

        torch.manual_seed(args.seed)
        mirror = TorchEfficientNetBackbone(config)
        randomize_bn_stats(mirror, seed=args.seed)
        state_dict = mirror.state_dict()
        print("self-test: seeded torch mirror (canonical naming)")
    else:
        if not args.weights:
            parser.error("provide a weights file or --self-test")
        state_dict = load_state_dict(args.weights)

    stripped = strip_module_prefix(state_dict)
    scheme = detect_naming_scheme(stripped)

    import dataclasses

    overrides = {}
    if args.padding == "auto":
        # pyspacer-lineage (lukemelas-named) checkpoints were trained with
        # TF-SAME static asymmetric padding; running them through the
        # symmetric graph fails the 1e-4 gate at every stride-2 layer
        # (tests/parity/test_foreign_checkpoint_fidelity.py).
        if scheme == "lukemelas":
            overrides["padding"] = "tf_same"
    else:
        overrides["padding"] = args.padding
    if args.bn_eps is not None:
        overrides["bn_eps"] = args.bn_eps
    if overrides:
        config = dataclasses.replace(config, **overrides)
    print(f"padding={config.padding}, bn_eps={config.bn_eps:g}")

    canonical, applied, dropped = remap_state_dict(stripped, config, scheme)
    print(f"naming scheme: {scheme}; {len(applied)} keys mapped,"
          f" {len(dropped)} dropped ({sorted(dropped)[:3]}...)"
          if dropped else
          f"naming scheme: {scheme}; {len(applied)} keys mapped, 0 dropped")
    if args.dump_remap:
        with open(args.dump_remap, "w") as f:
            f.write("source_key,canonical_key\n")
            for old, new in sorted(applied.items()):
                f.write(f"{old},{new}\n")
        print(f"remap table -> {args.dump_remap}")

    variables = torch_state_dict_to_variables(canonical, config)
    print("conversion: OK (all keys consumed, shapes verified)")

    # Torch execution of the SAME canonical weights via the mirror.
    import torch

    from parity.torch_efficientnet_ref import TorchEfficientNetBackbone

    mirror = TorchEfficientNetBackbone(config)
    mirror.load_state_dict(
        {k: torch.as_tensor(np.asarray(v, dtype=np.float32))
         for k, v in canonical.items()
         if not k.endswith("num_batches_tracked")},
        strict=False,
    )

    rng = np.random.default_rng(args.seed)
    ps = config.patch_size
    probe_nhwc = rng.normal(size=(args.probe_batch, ps, ps, 3)).astype(np.float32)
    probe_nchw = np.transpose(probe_nhwc, (0, 3, 1, 2)).copy()

    torch_acts = collect_torch_activations(mirror, probe_nchw)
    flax_acts = collect_flax_activations(variables, config, probe_nhwc)

    # Per-layer comparison over the paths both sides expose, stem->head.
    shared = sorted(
        set(torch_acts) & set(flax_acts) - {""},
        key=lambda p: (p.count("."), p),
    )
    rows = []
    worst = 0.0
    for path in shared:
        t = torch_acts[path]
        f = flax_acts[path]
        if t.ndim == 4:  # NCHW -> NHWC
            t = np.transpose(t, (0, 2, 3, 1))
        if t.shape != f.shape:
            rows.append((path, None, f"shape {t.shape} vs {f.shape}"))
            continue
        max_abs = float(np.max(np.abs(t - f)))
        worst = max(worst, max_abs)
        rows.append((path, max_abs, None))

    n_fail = 0
    print(f"\n{'layer':44s} {'max|Δ|':>12s}  status")
    for path, max_abs, problem in rows:
        if problem:
            print(f"{path:44s} {'—':>12s}  FAIL ({problem})")
            n_fail += 1
        else:
            ok = max_abs <= args.layer_tol
            n_fail += 0 if ok else 1
            print(f"{path:44s} {max_abs:12.3e}  {'ok' if ok else 'FAIL'}")

    feature_mae = float(np.mean(np.abs(torch_acts[""] - flax_acts[""])))
    feature_ok = feature_mae <= args.feature_tol
    print(f"\nfinal feature MAE: {feature_mae:.3e}"
          f" (gate {args.feature_tol:.0e}) -> {'ok' if feature_ok else 'FAIL'}")
    if not feature_ok:
        n_fail += 1

    all_green = n_fail == 0
    if args.save_npz and all_green:
        from mermaid_classifier_tpu.models.convert import (
            backbone_sidecar_path,
            save_backbone_npz,
        )

        save_backbone_npz(args.save_npz, variables, config)
        print(f"saved: {args.save_npz} + {backbone_sidecar_path(args.save_npz)}")
    if args.record:
        # The fidelity record hashes the file the RELEASE will ship: the
        # converted npz when one was saved, else the input checkpoint.
        import hashlib
        import json
        from datetime import datetime, timezone

        hashed = args.save_npz if (args.save_npz and all_green) else args.weights
        sha = None
        if hashed:
            h = hashlib.sha256()
            with open(hashed, "rb") as f:
                for chunk in iter(lambda: f.read(1 << 20), b""):
                    h.update(chunk)
            sha = h.hexdigest()
        record = {
            "all_green": all_green,
            "n_layers_compared": len(rows),
            "n_layers_failed": n_fail,
            "feature_mae": feature_mae,
            "feature_tol": args.feature_tol,
            "layer_tol": args.layer_tol,
            "worst_layer_max_abs": worst,
            "padding": config.padding,
            "bn_eps": config.bn_eps,
            "naming_scheme": scheme,
            "weights_file": hashed,
            "weights_sha256": sha,
            "probe_batch": args.probe_batch,
            "seed": args.seed,
            "timestamp_utc": datetime.now(timezone.utc).isoformat(),
            "command": "diff_backbone.py " + " ".join(argv or sys.argv[1:]),
        }
        with open(args.record, "w") as f:
            json.dump(record, f, indent=1)
        print(f"fidelity record -> {args.record} (all_green={all_green})")

    if n_fail:
        print(f"\n{n_fail} layer(s) diverge — fix the FIRST failing layer;"
              " everything after it inherits the error.")
        return 1
    print(f"\nALL GREEN: {len(rows)} layers within {args.layer_tol:.0e},"
          f" features within {args.feature_tol:.0e}.")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
