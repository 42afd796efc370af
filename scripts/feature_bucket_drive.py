#!/usr/bin/env python
"""Extraction-at-scale drive: the bucket lane's analog of full_recipe_drive.

The reference's extraction story is an at-scale workhorse whose ONLY
progress state is the target bucket itself: a crashed/preempted worker
resumes by re-running with skip-existing, done images are never rewritten,
and the output is identical to an uninterrupted build (reference:
scripts/build_feature_bucket.py:15-22,337-349,740-757 and
docs/feature_extraction_at_scale.md:109-161). This drive PROVES that
contract at production scale on the chip, end to end:

  1. ``synthesize`` — a production-shaped corpus (default 520 JPEGs at
     realistic camera resolutions, 200 points each, across 8 sources);
  2. ``uninterrupted`` — a clean build into bucket featsA (the baseline);
  3. ``interrupted`` — the same build into featsB, SIGKILL'd mid-run the
     moment the target bucket shows ``--kill-frac`` of the images done;
  4. ``resume`` — the identical command re-run (skip-existing is the
     default), completing featsB;
  5. ``verify`` — featsB is complete with zero failures, every feature
     file finished before the kill has IDENTICAL bytes and mtime_ns after
     the resume (done images are never rewritten), and featsB is
     byte-identical to featsA (crash+resume changes nothing).

Writes a docs/runs-shaped JSON record (schema pinned by
tests/test_run_records.py) with the per-stage decomposition, the
progress-log-derived steady-state throughput, and the link conditions.

Usage (the committed production drive):
    python scripts/feature_bucket_drive.py --workdir /tmp/fb \
        --output-json /tmp/fb.json
CPU smoke (tiny backbone, small images — used by the e2e test):
    python scripts/feature_bucket_drive.py --cpu --images 40 \
        --points 24 --sources 3 --workdir /tmp/fb_smoke
"""

from __future__ import annotations

import argparse
import hashlib
import io
import json
import os
import signal
import subprocess
import sys
import tempfile
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

#: Realistic benthic-survey camera resolutions (h, w): the reference's
#: at-scale corpus is multi-megapixel JPEGs of varying shape
#: (reference: docs/feature_extraction_at_scale.md:109-135). Mixing
#: shapes also exercises the extractor's 64-px/IMAGE_BUCKET shape
#: bucketing (models/extractor.py:378-393) across compile buckets.
PRODUCTION_SIZES = ((1536, 2048), (1440, 1920), (1152, 1536))
SMOKE_SIZES = ((96, 128), (64, 64))

TINY_CONFIG = {
    "stem_channels": 8,
    "stages": [[1, 8, 1, 1, 3]],
    "head_channels": 16,
    "feature_dim": 16,
    "patch_size": 32,
}


def log(msg: str) -> None:
    print(f"[feature_bucket_drive] {msg}", flush=True)


# -- corpus -------------------------------------------------------------------


def synthesize_corpus(
    store_root: Path,
    n_images: int,
    points: int,
    n_sources: int,
    sizes: tuple[tuple[int, int], ...],
    seed: int,
    jpeg_quality: int = 90,
) -> dict:
    """JPEGs + canonical annotations.csv per source under ``imgs``.

    Images are low-frequency random fields (small noise upsampled) with a
    mild high-frequency dither: behaves like a photograph of a
    smooth scene rather than pure noise (compresses and decodes fast), and
    synthesis stays cheap on a 1-vCPU host. Fully deterministic in ``seed``.
    """
    from PIL import Image

    from mermaid_classifier_tpu.data.store import LocalFSObjectStore

    store = LocalFSObjectStore(store_root)
    rng = np.random.default_rng(seed)
    per_source = [n_images // n_sources] * n_sources
    for i in range(n_images % n_sources):
        per_source[i] += 1

    total_points = 0
    total_bytes = 0
    idx = 0
    for s in range(n_sources):
        source_id = str(s + 1)
        lines = ["image_id,image_key,row,col"]
        for _ in range(per_source[s]):
            h, w = sizes[idx % len(sizes)]
            base = rng.integers(0, 256, size=(h // 32, w // 32, 3), dtype=np.uint8)
            img = Image.fromarray(base).resize((w, h), Image.BILINEAR)
            arr = np.asarray(img, dtype=np.int16)
            dither = rng.integers(-12, 13, size=(h, w, 1), dtype=np.int16)
            arr = np.clip(arr + dither, 0, 255).astype(np.uint8)
            buf = io.BytesIO()
            Image.fromarray(arr).save(buf, format="JPEG", quality=jpeg_quality)
            key = f"s{source_id}/images/i{idx:05d}.jpg"
            store.put_bytes("imgs", key, buf.getvalue())
            total_bytes += buf.getbuffer().nbytes
            rows = rng.integers(0, h, size=points)
            cols = rng.integers(0, w, size=points)
            lines.extend(
                f"{idx:05d},{key},{r},{c}" for r, c in zip(rows, cols)
            )
            total_points += points
            idx += 1
        store.put_bytes(
            "imgs", f"s{source_id}/annotations.csv",
            ("\n".join(lines) + "\n").encode(),
        )
    return {
        "images": idx,
        "points": total_points,
        "jpeg_megabytes": round(total_bytes / 1e6, 1),
        "sizes": [list(s) for s in sizes],
    }


# -- build runs ---------------------------------------------------------------


def build_command(args, target_bucket: str, workspace: Path) -> list[str]:
    source_ids = ",".join(str(s + 1) for s in range(args.sources))
    cmd = [
        sys.executable, str(REPO / "scripts" / "build_feature_bucket.py"),
        "--source-ids", source_ids,
        "--source-bucket", "imgs",
        "--target-bucket", target_bucket,
        "--progress-log", str(workspace / f"{target_bucket}_progress.jsonl"),
        "--error-log", str(workspace / f"{target_bucket}_errors.csv"),
        "--decode-workers", str(args.decode_workers),
        "--backbone-batch", str(args.backbone_batch),
    ]
    if args.cpu:
        config_path = workspace / "tiny_backbone.json"
        if not config_path.is_file():
            config_path.write_text(json.dumps(TINY_CONFIG))
        cmd += ["--backbone-config-json", str(config_path)]
    else:
        # The production fast path: bf16 folded trunk behind the mandatory
        # device-numerics gate (auto-enforced for reduced precision).
        cmd += ["--compute-dtype", args.compute_dtype]
    return cmd


def drive_env(args, workspace: Path) -> dict:
    env = {
        **os.environ,
        "OBJECT_STORE_ROOT": str(workspace / "store"),
        # Persistent compile cache: the resume process re-traces the same
        # shape buckets; recompiles should hit the cache, not the clock.
        "JAX_COMPILATION_CACHE_DIR": str(workspace / "jax_cache"),
    }
    if args.cpu:
        env["JAX_PLATFORMS"] = "cpu"
    return env


def features_dir(workspace: Path, bucket: str) -> Path:
    return workspace / "store" / bucket


def count_feature_files(workspace: Path, bucket: str) -> int:
    root = features_dir(workspace, bucket)
    if not root.is_dir():
        return 0
    return sum(1 for _ in root.glob("s*/features/*.features.npz"))


def run_uninterrupted(cmd, env, logfile: Path) -> float:
    t0 = time.time()
    with logfile.open("w") as f:
        subprocess.run(cmd, env=env, check=True, stdout=f, stderr=subprocess.STDOUT)
    return time.time() - t0


def run_until_killed(
    cmd, env, logfile: Path, workspace: Path, bucket: str,
    kill_after_images: int, total_images: int,
) -> tuple[bool, int, float]:
    """Start the build, SIGKILL it once ``kill_after_images`` feature files
    exist in the target bucket. Returns (killed, files_at_kill, seconds)."""
    t0 = time.time()
    with logfile.open("w") as f:
        proc = subprocess.Popen(
            cmd, env=env, stdout=f, stderr=subprocess.STDOUT
        )
        try:
            while proc.poll() is None:
                done = count_feature_files(workspace, bucket)
                if done >= kill_after_images:
                    # kill -9: no atexit, no finally blocks — the hardest
                    # crash the resume discipline must survive.
                    os.kill(proc.pid, signal.SIGKILL)
                    proc.wait()
                    elapsed = time.time() - t0
                    log(
                        f"SIGKILL'd {bucket} build at {done}/{total_images}"
                        f" images after {elapsed:.1f}s"
                    )
                    return True, done, elapsed
                time.sleep(0.05)
        finally:
            if proc.poll() is None:
                proc.kill()
                proc.wait()
    return False, count_feature_files(workspace, bucket), time.time() - t0


# -- verification -------------------------------------------------------------


def snapshot_tree(root: Path) -> dict[str, tuple[int, int, str]]:
    """{relpath: (size, mtime_ns, sha256)} over every file under root."""
    out: dict[str, tuple[int, int, str]] = {}
    for path in sorted(root.rglob("*")):
        if not path.is_file():
            continue
        digest = hashlib.sha256(path.read_bytes()).hexdigest()
        st = path.stat()
        out[str(path.relative_to(root))] = (st.st_size, st.st_mtime_ns, digest)
    return out


def verify_buckets(
    workspace: Path,
    pre_resume: dict[str, tuple[int, int, str]],
    expected_images: int,
) -> dict:
    a_root = features_dir(workspace, "featsA")
    b_root = features_dir(workspace, "featsB")
    a = snapshot_tree(a_root)
    b = snapshot_tree(b_root)

    stray_parts = [k for k in b if k.endswith(".part")]
    a_files = {k: v for k, v in a.items() if not k.endswith(".part")}
    b_files = {k: v for k, v in b.items() if not k.endswith(".part")}

    missing = sorted(set(a_files) - set(b_files))
    extra = sorted(set(b_files) - set(a_files))
    mismatched = sorted(
        k for k in a_files
        if k in b_files and (a_files[k][0], a_files[k][2]) != (b_files[k][0], b_files[k][2])
    )
    rewritten = sorted(
        k for k, (size, mtime_ns, digest) in pre_resume.items()
        if not k.endswith(".part")
        and (k not in b or b[k] != (size, mtime_ns, digest))
    )
    n_features_b = sum(1 for k in b_files if k.endswith(".features.npz"))
    return {
        "featsB_feature_files": n_features_b,
        "featsB_complete": n_features_b == expected_images,
        "identical_to_uninterrupted": not (missing or extra or mismatched),
        "missing_vs_uninterrupted": missing[:10],
        "extra_vs_uninterrupted": extra[:10],
        "mismatched_vs_uninterrupted": mismatched[:10],
        "rewrites_after_resume": len(rewritten),
        "rewritten_files": rewritten[:10],
        "stray_part_files": len(stray_parts),
    }


def progress_stats(progress_log: Path, proc_start: float) -> dict:
    """Steady-state throughput from the builder's append-only progress log:
    time-to-first-image (handshake + compile + first pipeline fill) split
    from the steady per-image rate the bucket actually sustains."""
    if not progress_log.is_file():
        return {}
    records = [
        json.loads(line)
        for line in progress_log.read_text().splitlines() if line.strip()
    ]
    # The log is append-only across kill+resume: keep only this
    # process's records so resume stats don't mix in pre-kill entries.
    records = [r for r in records if r["time"] >= proc_start]
    if not records:
        return {}
    t_first = records[0]["time"]
    t_last = records[-1]["time"]
    points_after_first = sum(r.get("points", 0) for r in records[1:])
    out = {
        "images_logged": len(records),
        "first_image_seconds": round(t_first - proc_start, 2),
    }
    if len(records) > 1 and t_last > t_first:
        out["steady_points_per_sec"] = round(
            points_after_first / (t_last - t_first), 1
        )
        out["steady_ms_per_image"] = round(
            (t_last - t_first) * 1000 / (len(records) - 1), 1
        )
    return out


# -- link probe ---------------------------------------------------------------

_PROBE_SRC = r"""
import json, time
import numpy as np
import jax, jax.numpy as jnp
t0 = time.time()
dev = jax.devices()[0]
fence = jax.jit(lambda x: jnp.sum(x) * 0.0)
float(fence(jax.device_put(np.zeros(8, np.float32), dev)))  # handshake+warm
handshake = time.time() - t0
chunk = np.ones((32, 1024, 1024), np.uint8)  # 32 MB
t0 = time.time()
moved = 0
for _ in range(8):
    x = jax.device_put(chunk, dev)
    float(fence(x.reshape(-1)[:8].astype(jnp.float32)))  # fence the slab
    moved += chunk.nbytes
sustained = moved / (time.time() - t0) / 1e6
print(json.dumps({"handshake_s": round(handshake, 1),
                  "h2d_mbps_sustained": round(sustained, 1)}))
"""


def probe_link(env) -> dict:
    """Sustained (not burst) H2D probe in a throwaway process — 256 MB in
    fenced 32 MB slabs, the slab regime CLAUDE.md says to judge multi-GB
    feasibility by. Pays its own handshake; reported separately."""
    try:
        out = subprocess.run(
            [sys.executable, "-c", _PROBE_SRC], env=env,
            capture_output=True, text=True, timeout=900, check=True,
        )
        return json.loads(out.stdout.strip().splitlines()[-1])
    except Exception as exc:  # noqa: BLE001 - the probe is advisory
        # Keep the CAUSE, not the command line: CalledProcessError/
        # TimeoutExpired stringify as the full -c source, burying the
        # actual failure; stderr's tail is what diagnoses the window.
        err: dict = {"error": type(exc).__name__}
        if getattr(exc, "returncode", None) is not None:
            err["returncode"] = exc.returncode
        elif getattr(exc, "timeout", None) is not None:
            err["timeout_s"] = exc.timeout
        else:
            err["error"] = f"{type(exc).__name__}: {str(exc)[:160]}"
        stderr = getattr(exc, "stderr", None)
        if stderr:
            err["stderr_tail"] = str(stderr)[-300:]
        return err


# -- main ---------------------------------------------------------------------


def main(argv: list[str] | None = None) -> int:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--workdir", default=None)
    parser.add_argument("--images", type=int, default=520)
    parser.add_argument("--points", type=int, default=200)
    parser.add_argument("--sources", type=int, default=8)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--kill-frac", type=float, default=0.4,
                        help="fraction of images done when the interrupted"
                        " build takes SIGKILL")
    parser.add_argument("--decode-workers", type=int, default=8)
    parser.add_argument("--backbone-batch", type=int, default=128)
    parser.add_argument("--compute-dtype", default="bfloat16",
                        choices=("float32", "bfloat16"))
    parser.add_argument("--cpu", action="store_true",
                        help="tiny backbone + small images on the CPU"
                        " backend (the e2e smoke shape)")
    parser.add_argument("--skip-synthesize", action="store_true",
                        help="reuse the corpus already in --workdir")
    parser.add_argument("--skip-link-probe", action="store_true")
    parser.add_argument("--min-link-mbps", type=float, default=0.0,
                        help="wait for the sustained H2D probe to clear"
                        " this before the timed builds (0 = probe once,"
                        " record, proceed) — same healthy-window gate as"
                        " full_recipe_drive")
    parser.add_argument("--max-link-wait-minutes", type=float, default=60.0)
    parser.add_argument("--output-json", default=None)
    parser.add_argument("--link-note", default="",
                        help="free-text window conditions for the record")
    parser.add_argument(
        "--projected-vm-pps", type=float, default=20875.0,
        help="stage-budget VM projection for this pipeline from the bench"
        " (BENCH stage_budget.projected_vm_pps: decode/8 workers + PCIe"
        " + measured device compute); used only to project VM minutes",
    )
    args = parser.parse_args(argv)

    if args.workdir:
        workspace = Path(args.workdir)
        workspace.mkdir(parents=True, exist_ok=True)
        cleanup = None
    else:
        cleanup = tempfile.TemporaryDirectory(prefix="feature_bucket_drive_")
        workspace = Path(cleanup.name)
    log(f"workspace: {workspace}")

    sizes = SMOKE_SIZES if args.cpu else PRODUCTION_SIZES
    env = drive_env(args, workspace)
    stages: dict[str, float] = {}
    t_total = time.time()

    # --- synthesize ----------------------------------------------------------
    t0 = time.time()
    marker = workspace / "corpus.json"
    # The feature buckets are cleared UNCONDITIONALLY — --skip-synthesize
    # reuses the corpus (the slow stage), never a prior run's outputs.
    # Leaving featsA/featsB populated would make the uninterrupted build
    # no-op under skip-existing, the kill fire on a done bucket, and the
    # resume/idempotence "proof" vacuous — an ok=true record that proved
    # nothing.
    for bucket in ("featsA", "featsB"):
        target = features_dir(workspace, bucket)
        if target.is_dir():
            import shutil

            shutil.rmtree(target)
    if args.skip_synthesize and marker.is_file():
        corpus = json.loads(marker.read_text())
        log(f"corpus reused: {corpus}")
    else:
        corpus = synthesize_corpus(
            workspace / "store", args.images, args.points, args.sources,
            sizes, args.seed,
        )
        marker.write_text(json.dumps(corpus))
    stages["synthesize"] = round(time.time() - t0, 1)
    log(f"synthesize: {stages['synthesize']}s {corpus}")

    # --- link probe / healthy-window gate -------------------------------------
    link_probe = {}
    if not (args.cpu or args.skip_link_probe):
        sys.path.insert(0, str(REPO / "scripts"))
        from full_recipe_drive import wait_for_link

        t0 = time.time()
        link_probe = wait_for_link(
            lambda: probe_link(env),
            min_mbps=args.min_link_mbps,
            max_wait_minutes=args.max_link_wait_minutes,
        )
        stages["link_probe"] = round(time.time() - t0, 1)
        log(f"link probe: {link_probe} ({stages['link_probe']}s)")

    # --- uninterrupted baseline build (featsA) -------------------------------
    t0 = time.time()
    cmd_a = build_command(args, "featsA", workspace)
    stages["uninterrupted"] = round(
        run_uninterrupted(cmd_a, env, workspace / "featsA.log"), 1
    )
    done_a = count_feature_files(workspace, "featsA")
    stats_a = progress_stats(workspace / "featsA_progress.jsonl", t0)
    log(f"uninterrupted: {stages['uninterrupted']}s, {done_a} images {stats_a}")
    if done_a != args.images:
        log(f"FATAL: uninterrupted build wrote {done_a}/{args.images}")
        return 1

    # --- interrupted build (featsB), SIGKILL mid-run --------------------------
    kill_after = max(1, int(args.images * args.kill_frac))
    cmd_b = build_command(args, "featsB", workspace)
    killed = False
    for attempt in range(3):
        killed, files_at_kill, seconds = run_until_killed(
            cmd_b, env, workspace / "featsB_kill.log", workspace, "featsB",
            kill_after, args.images,
        )
        if killed:
            break
        # The build outran the poller (only plausible at smoke scale):
        # start over with the earliest possible kill point.
        log(f"attempt {attempt}: build finished before the kill landed; retrying")
        import shutil

        shutil.rmtree(features_dir(workspace, "featsB"), ignore_errors=True)
        kill_after = 1
    stages["interrupted_until_kill"] = round(seconds, 1)
    if not killed:
        log("FATAL: could not land the mid-run SIGKILL")
        return 1

    # --- resume (same command; skip-existing is the default) -----------------
    pre_resume = snapshot_tree(features_dir(workspace, "featsB"))
    done_before_resume = sum(
        1 for k in pre_resume if k.endswith(".features.npz")
    )
    t0 = time.time()
    with (workspace / "featsB_resume.log").open("w") as f:
        resume_proc = subprocess.run(
            cmd_b, env=env, stdout=f, stderr=subprocess.STDOUT
        )
    stages["resume"] = round(time.time() - t0, 1)
    stats_resume = progress_stats(workspace / "featsB_progress.jsonl", t0)
    log(
        f"resume: rc={resume_proc.returncode} {stages['resume']}s"
        f" (resumed past {done_before_resume} done images)"
    )
    if resume_proc.returncode != 0:
        log("FATAL: resume exited nonzero")
        return 1

    # --- verify ----------------------------------------------------------------
    t0 = time.time()
    verdicts = verify_buckets(workspace, pre_resume, args.images)
    stages["verify"] = round(time.time() - t0, 1)
    errors_csv = workspace / "featsB_errors.csv"
    failures_logged = (
        max(0, len(errors_csv.read_text().splitlines()) - 1)
        if errors_csv.is_file() else 0
    )

    points_total = corpus["points"]
    e2e_pps = round(points_total / stages["uninterrupted"], 1)
    record = {
        "images_total": args.images,
        "points_total": points_total,
        "sources": args.sources,
        "image_sizes": corpus["sizes"],
        "corpus_jpeg_megabytes": corpus["jpeg_megabytes"],
        "backbone": "tiny-cpu" if args.cpu else
                    f"b0-folded-{args.compute_dtype} (numerics-gated)",
        "stage_seconds": stages,
        "total_minutes": round((time.time() - t_total) / 60, 2),
        "uninterrupted_points_per_sec": e2e_pps,
        "uninterrupted_stats": stats_a,
        "resume_stats": stats_resume,
        "kill_resume": {
            "killed_mid_run": killed,
            "kill_signal": "SIGKILL",
            "kill_threshold_images": kill_after,
            "done_before_resume": done_before_resume,
            "resumed_images": args.images - done_before_resume,
            "failures_logged": failures_logged,
            **verdicts,
        },
        "link_probe": link_probe,
        "link_note": args.link_note or (
            "cpu smoke" if args.cpu else
            f"sustained fenced-slab H2D probe: {link_probe}"
        ),
        "projected_vm_minutes": round(
            points_total / args.projected_vm_pps / 60, 2
        ),
        "projected_vm_pps_source": "bench stage_budget.projected_vm_pps",
        "reference_note": (
            "reference analog: scripts/build_feature_bucket.py"
            " bucket-as-progress-truth resume (:15-22,:337-349,:740-757);"
            " synthetic low-frequency JPEG corpus (decode cost is below a"
            " real photo's; upload bytes and device compute are the"
            " production shape)"
        ),
    }
    ok = (
        verdicts["featsB_complete"]
        and verdicts["identical_to_uninterrupted"]
        and verdicts["rewrites_after_resume"] == 0
        and failures_logged == 0
    )
    record["ok"] = ok
    print(json.dumps(record))
    if args.output_json:
        Path(args.output_json).write_text(json.dumps(record, indent=1) + "\n")
    if cleanup is not None:
        cleanup.cleanup()
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
