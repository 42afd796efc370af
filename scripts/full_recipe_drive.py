#!/usr/bin/env python
"""The composed production-scale training drive: the C2 recipe, end to end,
wall-clock measured.

The reference's quality story culminates in a committed full-scale run —
457,497-row balanced subsample, 40 epochs + patience 3, ~35 minutes
wall-clock, acc 0.812 / bal 0.774 (reference:
docs/research/balancing-experiments.md:49-133). This drive composes the
SAME recipe through this framework's production CLI at the same scale:

  1. synthesize a C2-shaped corpus: ~620k points x 4096-dim features over
     80 BAGF classes with Zipf imbalance + a genuinely-rare tail, written
     as the production feature bucket (s{source}/features/i{id}.features.npz)
     plus ETL parquets and an 80-class taxonomy fixture;
  2. build the manifest with scripts/build_coralnet_manifest.py;
  3. run scripts/classifier_train.py on a generated config dir carrying the
     C2 recipe verbatim: balanced subsample at full-data budget with
     min_per_class=200 (realized ~446k rows), effective-number weights
     (cap 5000), (500,300,100) @ 1e-4, 40 epochs + patience 3,
     device-resident epochs — dataset ETL -> subsample -> trainer ->
     calibration -> 1e-6-gated export -> 9-group metrics -> registry,
     all inside the timed stage;
  4. reload the registered artifact and collect the run's metrics.

Feature model: 80 unit-norm class centers in a 32-d latent space,
per-point latent noise sigma=0.27 (calibrated so the classifier lands in
the reference's ~0.81-accuracy regime), projected to 4096-d through a
fixed random matrix — classification difficulty is real, features are
production-shaped, and nothing is copied from anywhere.

Output: ONE JSON line with per-stage seconds and
``train_full_recipe_minutes`` (the classifier_train.py wall-clock — the
number to put beside the reference's ~35 min).
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import tempfile
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

LATENT_DIM = 32
SIGMA = 0.27  # calibrated: ~0.81 val accuracy at production scale
N_ROOTS = 8
GF_IDS = ["gf-0", "gf-1", "gf-2", "gf-3"]


def log(msg: str) -> None:
    print(f"[full-recipe] {msg}", flush=True)


def wait_for_link(
    probe,
    *,
    min_mbps: float = 0.0,
    max_wait_minutes: float = 60.0,
    interval_seconds: float = 480.0,
    sleep=time.sleep,
    clock=time.time,
) -> dict:
    """Probe sustained H2D until it reads ``min_mbps`` (or the wait budget
    runs out), returning the last reading annotated with the gate outcome.

    Measured train-minutes on this environment are mostly a link-weather
    draw (every docs/runs/ record carries a link note for exactly this
    reason); gating the launch on a healthy sustained window turns a
    record attempt from a gamble into a schedule. ``min_mbps=0`` means
    probe once, record, proceed — the self-documenting default.
    """
    t0 = clock()
    readings = []
    while True:
        reading = probe()
        readings.append(reading)
        mbps = reading.get("h2d_mbps_sustained", 0.0)
        log(f"link probe: {reading}")
        if min_mbps <= 0 or mbps >= min_mbps:
            break
        waited = (clock() - t0) / 60.0
        if waited >= max_wait_minutes:
            log(f"link gate: giving up after {waited:.1f} min below"
                f" {min_mbps} MB/s — proceeding anyway")
            break
        log(f"link gate: {mbps} < {min_mbps} MB/s — sleeping"
            f" {interval_seconds:.0f}s"
            f" ({waited:.1f}/{max_wait_minutes} min waited)")
        sleep(interval_seconds)
    result = {
        **readings[-1],
        "probes": len(readings),
        "waited_minutes": round((clock() - t0) / 60.0, 1),
    }
    if min_mbps > 0:
        result["gate_mbps"] = min_mbps
        result["gate_met"] = (
            readings[-1].get("h2d_mbps_sustained", 0.0) >= min_mbps
        )
    return result


_RESIDENT_ITEMSIZE = {"float32": 4, "bfloat16": 2, "int8": 1}


def _project_vm_minutes(train_seconds: float, metrics: dict, args) -> float | None:
    """Headline minus the environment-only components (weather pre-touch +
    tunnel-rate upload), plus the same upload at a TPU VM's PCIe rate.
    Returns None when the resident stage budget was not logged."""
    pretouch = metrics.get("resident/pretouch_seconds")
    upload = metrics.get("resident/upload_stage_seconds")
    rows = metrics.get("subsample/realized_total")
    if pretouch is None or upload is None or not rows:
        return None
    # Pipelined runs: the upload thread overlaps the disk fill, so only
    # its serialized tail (how long it outlived the fill) cost wall-clock
    # — subtracting the full thread lifetime would credit away seconds
    # that never serialized. Older records lack the key; fall back.
    extra = metrics.get("resident/upload_extra_wait_seconds")
    if extra is not None:
        upload = extra
    wire_gb = (
        rows * args.dim * _RESIDENT_ITEMSIZE[args.resident_dtype] / 1e9
    )
    vm_upload_s = wire_gb / 8.0  # PCIe/DMA ~8 GB/s (bench --pcie-gbps)
    # Host-side quantization (int8) is CPU work a VM pays too — measured
    # inside the upload stage, credited back here.
    quantize_s = metrics.get("resident/quantize_seconds", 0.0) or 0.0
    projected = (
        train_seconds - pretouch - upload + quantize_s + vm_upload_s
    )
    return round(projected / 60.0, 2)


def build_taxonomy(n_classes: int, out_dir: Path) -> list[str]:
    """80 leaf BAs under 8 roots + 4 growth forms; class k maps CoralNet
    provider id (2000+k) to leaf k's BAGF combo (every 5th class GF-less,
    so the GF-relevant metric slices are non-trivial)."""
    ba_records = [
        {"id": f"ba-r{i}", "name": f"Root {i}", "parent": None}
        for i in range(N_ROOTS)
    ]
    leaves = []
    per_root = (n_classes + N_ROOTS - 1) // N_ROOTS
    for k in range(n_classes):
        root = k // per_root
        ba_id = f"ba-r{root}-c{k % per_root}"
        leaves.append(ba_id)
        ba_records.append(
            {"id": ba_id, "name": f"Class {k}", "parent": f"ba-r{root}"}
        )
    gf_names = {g: f"form {g[-1]}" for g in GF_IDS}
    mapping_records = []
    for k, ba_id in enumerate(leaves):
        gf_id = None if k % 5 == 0 else GF_IDS[k % len(GF_IDS)]
        mapping_records.append(
            {
                "provider_id": str(2000 + k),
                "provider_label": f"CN class {k}",
                "benthic_attribute_id": ba_id,
                "benthic_attribute_name": f"Class {k}",
                "growth_form_id": gf_id,
                "growth_form_name": gf_names[gf_id] if gf_id else None,
            }
        )
    out_dir.mkdir(parents=True, exist_ok=True)
    (out_dir / "benthic_attributes.json").write_text(json.dumps(ba_records))
    (out_dir / "growth_forms.json").write_text(json.dumps(gf_names))
    (out_dir / "label_mappings.json").write_text(json.dumps(mapping_records))
    return [str(2000 + k) for k in range(n_classes)]


def zipf_class_probs(n_classes: int) -> np.ndarray:
    """Zipf body + a genuinely rare tail (last 12 classes x0.05), the shape
    where balanced(min_per_class=200) at full-data budget realizes ~72% of
    the pool — mirroring the reference's 457,497-of-1.77M C2 subsample."""
    p = 1.0 / np.arange(1, n_classes + 1) ** 0.55
    n_rare = min(12, max(n_classes // 7, 1))
    p[-n_rare:] *= 0.05
    return p / p.sum()


def synthesize_corpus(
    workspace: Path,
    pool_rows: int,
    n_classes: int,
    dim: int,
    points_per_image: int,
    n_sources: int,
    seed: int,
) -> dict:
    """Feature bucket + ETL parquets, streamed image by image (O(image)
    memory however big the pool is)."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from mermaid_classifier_tpu.data.features_io import write_feature_file

    rng = np.random.default_rng(seed)
    centers = rng.normal(size=(n_classes, LATENT_DIM))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    projection = rng.normal(size=(LATENT_DIM, dim)).astype(np.float32)
    projection /= np.sqrt(LATENT_DIM)

    probs = zipf_class_probs(n_classes)
    labels = rng.choice(n_classes, size=pool_rows, p=probs)

    # ceil-sqrt grid truncated to EXACTLY points_per_image cells: a
    # round-sqrt grid undershoots for non-square counts (e.g. 50 -> 7x7
    # = 49 rowcols vs 50 features) and the feature writer rejects the
    # mismatch.
    grid = max(int(np.ceil(points_per_image**0.5)), 1)
    cell = 100
    rowcols = np.asarray(
        [
            (gr * cell + cell // 2, gc * cell + cell // 2)
            for gr in range(grid)
            for gc in range(grid)
        ],
        dtype=np.int32,
    )[:points_per_image]
    assert len(rowcols) == points_per_image

    bucket_dir = workspace / "store" / "features"
    n_images = (pool_rows + points_per_image - 1) // points_per_image
    sources = [str(101 + s) for s in range(n_sources)]
    # Feature-file writes go through a small pool with bounded in-flight
    # work: on a host with slow fresh-page allocation ("memory weather",
    # CLAUDE.md) serial write_feature_file measured ~9 MB/s; overlapping a
    # handful of writes recovers most of the loss while feature GENERATION
    # (the deterministic rng stream) stays strictly sequential.
    from collections import deque
    from concurrent.futures import ThreadPoolExecutor

    writer_pool = ThreadPoolExecutor(max_workers=4)
    in_flight: deque = deque()
    ann_rows: dict[str, list] = {
        "source_id": [], "image_id": [], "row": [], "col": [],
        "coralnet_id": [],
    }
    img_rows: dict[str, list] = {
        "source_id": [], "image_id": [], "header_status": [], "s3_key": [],
    }
    t_write = 0.0
    for img_idx in range(n_images):
        source = sources[img_idx % n_sources]
        image_id = f"{source}{img_idx:06d}"
        lo = img_idx * points_per_image
        y = labels[lo: lo + points_per_image]
        n_pts = len(y)
        latent = centers[y] + SIGMA * rng.standard_normal(
            (n_pts, LATENT_DIM)
        )
        features = (latent.astype(np.float32) @ projection).astype(np.float32)
        t0 = time.time()
        while len(in_flight) >= 8:
            in_flight.popleft().result()  # propagate write errors, bound RAM
        in_flight.append(writer_pool.submit(
            write_feature_file,
            bucket_dir / f"s{source}" / "features"
            / f"i{image_id}.features.npz",
            rowcols[:n_pts],
            features,
        ))
        t_write += time.time() - t0
        img_rows["source_id"].append(source)
        img_rows["image_id"].append(image_id)
        img_rows["header_status"].append("ok")
        img_rows["s3_key"].append(f"s{source}/images/i{image_id}.jpg")
        ann_rows["source_id"].extend([source] * n_pts)
        ann_rows["image_id"].extend([image_id] * n_pts)
        ann_rows["row"].extend(int(r) for r, _ in rowcols[:n_pts])
        ann_rows["col"].extend(int(c) for _, c in rowcols[:n_pts])
        ann_rows["coralnet_id"].extend(str(2000 + int(k)) for k in y)
        if (img_idx + 1) % 1000 == 0:
            log(f"  synthesized {img_idx + 1}/{n_images} images")

    t0 = time.time()
    while in_flight:
        in_flight.popleft().result()
    writer_pool.shutdown()
    t_write += time.time() - t0

    pq.write_table(
        pa.Table.from_pandas(pd.DataFrame(ann_rows)),
        workspace / "etl_annotations.parquet",
    )
    pq.write_table(
        pa.Table.from_pandas(pd.DataFrame(img_rows)),
        workspace / "etl_images.parquet",
    )
    class_counts = np.bincount(labels, minlength=n_classes)
    return {
        "pool_rows": int(pool_rows),
        "images": int(n_images),
        "sources": n_sources,
        "largest_class": int(class_counts.max()),
        "smallest_class": int(class_counts.min()),
        "feature_write_seconds": round(t_write, 1),
        "bucket_gb": round(pool_rows * dim * 4 / 1e9, 2),
    }


def write_config_dir(
    config_dir: Path, pool_rows: int, epochs: int, patience: int,
    resident_dtype: str = "float32", calibration_method: str = "sigmoid",
) -> None:
    """The C2 recipe verbatim (reference:
    docs/research/balancing-experiments.md:133 'Practical training recipe'):
    balanced subsample at FULL-data budget with min_per_class=200,
    effective-number weights cap 5000, 40 epochs + patience 3 on val loss,
    plus this framework's device-resident epochs."""
    config_dir.mkdir(parents=True, exist_ok=True)
    config = {
        "dataset": {
            "coralnet_manifest_uri": "manifest.parquet",
            "include_mermaid": False,
            "ref_val_ratios": [0.1, 0.1],
            "subsample": {
                "strategy": "balanced",
                "total_annotations": int(pool_rows),
                "min_per_class": 200,
            },
            "weighting": {"enabled": True, "weight_ratio_cap": 5000},
        },
        "training": {
            "epochs": int(epochs),
            "early_stopping_patience": int(patience),
            "device_resident": True,
            "resident_dtype": resident_dtype,
            "calibration_method": calibration_method,
        },
        "tracking": {
            "experiment_name": "full-recipe",
            "model_name": "mermaid-mlp-c2",
        },
    }
    import yaml

    (config_dir / "training_config.yaml").write_text(yaml.safe_dump(config))


def main(argv: list[str] | None = None) -> int:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--workdir", default=None,
                        help="workspace (default: temp dir, deleted on exit)")
    parser.add_argument("--skip-synthesize", action="store_true",
                        help="reuse the corpus already in --workdir (A/B"
                        " reruns of the timed train stage without paying"
                        " the ~10 GB corpus write again); requires a prior"
                        " run with the same --workdir and shape flags")
    parser.add_argument("--pool-rows", type=int, default=620_000,
                        help="annotation pool size; the C2 default realizes"
                        " a ~446k balanced subsample")
    parser.add_argument("--classes", type=int, default=80)
    parser.add_argument("--dim", type=int, default=4096)
    parser.add_argument("--points-per-image", type=int, default=100)
    parser.add_argument("--sources", type=int, default=20)
    parser.add_argument("--epochs", type=int, default=40)
    parser.add_argument("--patience", type=int, default=3)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--output-json", default=None,
                        help="also write the result JSON to this path")
    parser.add_argument("--cpu", action="store_true",
                        help="pin the training subprocess to the CPU backend"
                        " (tests; the measured drive runs on the chip)")
    parser.add_argument("--resident-dtype", default="float32",
                        choices=("float32", "bfloat16", "int8"),
                        help="storage precision of the device-resident"
                        " feature buffer; bfloat16 halves the upload and"
                        " HBM footprint, int8 (per-row scales) quarters"
                        " them (compute stays f32)")
    parser.add_argument("--calibration", default="sigmoid",
                        choices=("sigmoid", "temperature"),
                        help="calibration family: 'sigmoid' is the"
                        " reference-parity prefit-Platt recipe;"
                        " 'temperature' fits one scalar by NLL on the ref"
                        " split (argmax-preserving; lowers calibrated"
                        " log_loss where the sigmoid recipe raises it)")
    parser.add_argument("--link-note", default="",
                        help="free-text window conditions recorded in the"
                        " output JSON (CLAUDE.md: wall-clock uploads are"
                        " never comparable across sessions without one)")
    parser.add_argument("--skip-link-probe", action="store_true",
                        help="skip the pre-train sustained H2D probe")
    parser.add_argument("--min-link-mbps", type=float, default=0.0,
                        help="wait for the sustained H2D probe to read at"
                        " least this before starting the timed train stage"
                        " (0 = no gate). Measured train-minutes are mostly"
                        " a link-weather draw (docs/runs/); gating the"
                        " launch on a healthy window is how a record run"
                        " is scheduled rather than gambled")
    parser.add_argument("--max-link-wait-minutes", type=float, default=60.0,
                        help="give up waiting for --min-link-mbps after"
                        " this long and proceed (recorded in the output)")
    parser.add_argument("--link-probe-interval-seconds", type=float,
                        default=480.0,
                        help="sleep between probes while below the gate")
    args = parser.parse_args(argv)

    # The parent process never needs the chip: training runs in the
    # classifier_train subprocess (which owns the TPU), and the parent
    # only synthesizes (numpy) and verifies the artifact. Pin the parent
    # to CPU BEFORE any jax import: the verify-stage load_predictor
    # otherwise initializes the tunneled TPU backend just to probe a
    # 25-row forward — a first-device-interaction handshake measured at
    # 5-10 minutes of pure stall (CLAUDE.md) — and serving the
    # TPU-trained artifact on CPU is itself the cross-platform check.
    import jax

    jax.config.update("jax_platforms", "cpu")

    if args.workdir:
        workspace = Path(args.workdir)
        workspace.mkdir(parents=True, exist_ok=True)
        cleanup = None
    else:
        cleanup = tempfile.TemporaryDirectory(prefix="full_recipe_")
        workspace = Path(cleanup.name)
    log(f"workspace: {workspace}")

    stages: dict[str, float] = {}
    t_total = time.time()

    # --- stage: synthesize ---------------------------------------------------
    t0 = time.time()
    taxonomy_dir = workspace / "taxonomy"
    if args.skip_synthesize:
        if not (workspace / "etl_annotations.parquet").is_file():
            raise SystemExit(
                f"--skip-synthesize: no corpus in {workspace} (run once"
                " without the flag first)"
            )
        corpus = {"reused": True}
    else:
        build_taxonomy(args.classes, taxonomy_dir)
        corpus = synthesize_corpus(
            workspace, args.pool_rows, args.classes, args.dim,
            args.points_per_image, args.sources, args.seed,
        )
    write_config_dir(
        workspace / "config", args.pool_rows, args.epochs, args.patience,
        resident_dtype=args.resident_dtype,
        calibration_method=args.calibration,
    )
    stages["synthesize"] = time.time() - t0
    log(f"synthesize: {stages['synthesize']:.1f}s {corpus}")

    env = {
        **os.environ,
        "OBJECT_STORE_ROOT": str(workspace / "store"),
        "MERMAID_TAXONOMY_FIXTURE_DIR": str(taxonomy_dir),
        "TAXONOMY_FIXTURE_DIR": str(taxonomy_dir),
        "TRACKING_DIR": str(workspace / "tracking"),
        "FEATURE_CACHE_DIR": str(workspace / "feature_cache"),
        "CORALNET_TRAIN_DATA_BUCKET": "features",
        "MERMAID_TRAIN_DATA_BUCKET": "features",
    }
    if args.cpu:
        env["JAX_PLATFORMS"] = "cpu"

    # --- stage: manifest -----------------------------------------------------
    t0 = time.time()
    subprocess.run(
        [
            sys.executable,
            str(REPO / "scripts" / "build_coralnet_manifest.py"),
            "--annotations-parquet", str(workspace / "etl_annotations.parquet"),
            "--images-parquet", str(workspace / "etl_images.parquet"),
            "--output", str(workspace / "manifest.parquet"),
        ],
        cwd=workspace, env=env, check=True,
    )
    stages["manifest"] = time.time() - t0
    log(f"manifest: {stages['manifest']:.1f}s")

    # --- stage: link probe / healthy-window gate -----------------------------
    # Sustained (not burst) H2D in a throwaway process, the regime CLAUDE.md
    # says to judge multi-GB feasibility by — recorded in the output JSON so
    # every committed record carries its window conditions, and optionally
    # gating the timed stage on a healthy window (--min-link-mbps).
    link_probe: dict = {}
    if not (args.cpu or args.skip_link_probe):
        sys.path.insert(0, str(REPO / "scripts"))
        from feature_bucket_drive import probe_link

        t0 = time.time()
        link_probe = wait_for_link(
            lambda: probe_link(dict(os.environ)),
            min_mbps=args.min_link_mbps,
            max_wait_minutes=args.max_link_wait_minutes,
            interval_seconds=args.link_probe_interval_seconds,
        )
        stages["link_probe"] = time.time() - t0

    # --- stage: train (the timed C2 leg) ------------------------------------
    t0 = time.time()
    subprocess.run(
        [
            sys.executable,
            str(REPO / "scripts" / "classifier_train.py"),
            "--config-dir", str(workspace / "config"),
            "--run-name", "c2-full-recipe",
        ],
        cwd=workspace, env=env, check=True,
    )
    stages["train"] = time.time() - t0
    log(f"train: {stages['train']:.1f}s")

    # --- stage: verify -------------------------------------------------------
    t0 = time.time()
    from mermaid_classifier_tpu.inference.loader import load_predictor
    from mermaid_classifier_tpu.tracking.local_tracker import LocalTracker

    tracker = LocalTracker(workspace / "tracking")
    runs = tracker.runs("full-recipe")
    if not runs:
        raise SystemExit("no tracked run under experiment 'full-recipe'")
    run = runs[-1]
    metrics = run.latest_metrics()
    params = run.params()
    sections = None
    sections_csv = run.run_dir / "artifacts" / "profiled_sections.csv"
    if sections_csv.is_file():
        import csv as csv_mod

        with open(sections_csv) as f:
            sections = [
                {"name": row["name"], "seconds": round(float(row["seconds"]), 1)}
                for row in csv_mod.DictReader(f)
            ]

    model_dir = workspace / "tracking" / "_models" / "mermaid-mlp-c2"
    # Latest registered version (repeat runs in one --workdir bump vN).
    registry = max(
        (d for d in model_dir.iterdir() if d.name.lstrip("v").isdigit()),
        key=lambda d: int(d.name.lstrip("v")),
    )
    predictor = load_predictor(registry)
    proba = predictor.predict_proba(
        np.zeros((25, predictor.input_dim), dtype=np.float32)
    )
    assert proba.shape == (25, len(predictor.classes))
    stages["verify"] = time.time() - t0

    total_s = time.time() - t_total
    result = {
        "train_full_recipe_minutes": round(stages["train"] / 60.0, 2),
        "total_minutes": round(total_s / 60.0, 2),
        "stage_seconds": {k: round(v, 1) for k, v in stages.items()},
        "recipe": {
            "pool_rows": args.pool_rows,
            "classes": args.classes,
            "dim": args.dim,
            "subsample": f"balanced(total={args.pool_rows}, min_per_class=200)",
            "weighting": "effective_number(cap=5000)",
            "epochs": args.epochs,
            "patience": args.patience,
            "device_resident": True,
            "resident_dtype": args.resident_dtype,
            "calibration": args.calibration,
        },
        "subsample_realized": metrics.get("subsample/realized_total"),
        # Inside-the-train-stage budget (resident/* metrics logged by the
        # runner): disk load, device upload, and the AOT program warm that
        # overlaps it — so the headline minutes decompose without logs.
        "train_stage_breakdown": {
            key.split("/", 1)[1]: value
            for key, value in sorted(metrics.items())
            if key.startswith("resident/")
        } or None,
        # The runner's section profile (ETL phases + the training call),
        # so the train-stage minutes decompose fully: anything not in a
        # section is subprocess startup (heavy imports — page-fault-bound
        # under host memory weather).
        "profiled_sections": sections,
        "final_epoch": metrics.get("early_stop/final_epoch"),
        "best_val_epoch": metrics.get("early_stop/best_val_epoch"),
        # VM projection of the headline (same discipline as the bench
        # bucket leg's projected_vm_pps): the measured train stage minus
        # the two components that exist only on THIS environment — the
        # host-memory-weather pre-touch (a healthy host faults multi-GB
        # in ~1 s/GB) and the tunnel-rate device upload — plus the same
        # upload at PCIe rate. Every other second (ETL, epochs,
        # calibration, export, metrics) carries over as measured.
        "projected_vm_train_minutes": _project_vm_minutes(
            stages["train"], metrics, args
        ),
        "accuracy": metrics.get("accuracy"),
        "balanced_accuracy": metrics.get("balanced_accuracy"),
        "log_loss": metrics.get("log_loss"),
        # The rest of the reference's C2 metric row (reference values:
        # f1_macro 0.758, MCC 0.806, cover_R2 0.647 —
        # docs/research/balancing-experiments.md:52-56).
        "f1_macro": metrics.get("f1_macro"),
        "mcc": metrics.get("mcc"),
        "cover_median_r_squared": metrics.get("cover_median_r_squared"),
        "per_source_min_accuracy": metrics.get("per_source/min_accuracy"),
        "export_parity_max_abs_diff": metrics.get("export_parity_max_abs_diff"),
        "n_metrics_logged": len(metrics),
        "link_probe": link_probe or None,
        "link_note": args.link_note or None,
        "reference_minutes": 35.0,
        "reference_note": (
            "reference C2 confirm: 457,497-row subsample, stop at epoch 17,"
            " ~35 min (docs/research/balancing-experiments.md:84,133)"
        ),
    }
    if cleanup is not None:
        cleanup.cleanup()
    line = json.dumps(result)
    if args.output_json:
        Path(args.output_json).write_text(line + "\n")
    print(line)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
