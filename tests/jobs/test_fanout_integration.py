"""Multi-worker fan-out integration: the REAL launcher submits REAL
subprocess workers running the REAL extraction CLI against a shared
local-FS store — the closest single-machine analog of the reference's
N-SageMaker-jobs + S3 coordination (reference: launch_processing.py +
build_feature_bucket.py, SURVEY.md §2.2 row 1)."""

import io
import json
import textwrap
import unittest
import tempfile
from pathlib import Path

import numpy as np
import pandas as pd

from mermaid_classifier_tpu.data.feature_bucket import annotations_key, feature_key
from mermaid_classifier_tpu.data.store import LocalFSObjectStore
from mermaid_classifier_tpu.jobs import (
    JobStatus,
    LocalProcessBackend,
    launch_processing,
    parse_run_config,
    wait_for_completion,
)

REPO_ROOT = Path(__file__).resolve().parents[2]

TINY_CONFIG = {
    "stem_channels": 8,
    "stages": [[1, 8, 1, 1, 3]],
    "head_channels": 16,
    "se_ratio": 0.25,
    "feature_dim": 16,
    "mean_rgb": [0.485, 0.456, 0.406],
    "std_rgb": [0.229, 0.224, 0.225],
    "patch_size": 32,
}

SRC, DST = "imgs", "feats"


def _png_bytes(rng) -> bytes:
    from PIL import Image

    arr = rng.integers(0, 256, size=(64, 64, 3), dtype=np.uint8)
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format="PNG")
    return buf.getvalue()


class TestFanOutIntegration(unittest.TestCase):
    def test_two_workers_extract_four_sources(self):
        with tempfile.TemporaryDirectory() as td:
            tmp = Path(td)
            store_root = tmp / "store"
            store = LocalFSObjectStore(store_root)
            rng = np.random.default_rng(0)
            source_ids = ["1", "2", "3", "4"]
            for source_id in source_ids:
                key = f"s{source_id}/images/a.png"
                store.put_bytes(SRC, key, _png_bytes(rng))
                csv = pd.DataFrame(
                    [{"image_id": "a", "image_key": key, "row": 10, "col": 20},
                     {"image_id": "a", "image_key": key, "row": 30, "col": 40}]
                ).to_csv(index=False).encode()
                store.put_bytes(SRC, annotations_key(source_id), csv)

            import os

            # Append, never overwrite: the axon TPU plugin rides PYTHONPATH
            # (CLAUDE.md); the CLI pins jax_platforms=cpu itself.
            pythonpath = f"{REPO_ROOT}:{os.environ.get('PYTHONPATH', '')}".rstrip(":")
            config_json = tmp / "tiny_backbone.json"
            config_json.write_text(json.dumps(TINY_CONFIG))
            pd.DataFrame({"source_id": source_ids}).to_csv(
                tmp / "sources.csv", index=False
            )
            run_yaml = tmp / "run.yaml"
            run_yaml.write_text(textwrap.dedent(f"""\
                job:
                  entrypoint: {REPO_ROOT / 'scripts' / 'build_feature_bucket.py'}
                  env:
                    OBJECT_STORE_ROOT: "{store_root}"
                    JAX_PLATFORMS: cpu
                    PYTHONPATH: "{pythonpath}"
                processing:
                  container_args: [--source-bucket, {SRC}, --target-bucket, {DST},
                                   --backbone-config-json, "{config_json}"]
                  shard:
                    items_csv: sources.csv
                    workers: 2
                    per_worker_arg: --source-ids
                """))

            config = parse_run_config(run_yaml, strict=True)
            backend = LocalProcessBackend(log_dir=tmp / "logs")
            job_ids = launch_processing(config, backend, "itest")
            self.assertEqual(len(job_ids), 2)
            try:
                statuses = wait_for_completion(
                    backend, job_ids, poll_seconds=0.5, timeout_seconds=420
                )
            finally:
                backend.terminate_all()
            for job_id, status in statuses.items():
                log = (tmp / "logs" / f"{job_id}.log")
                detail = log.read_text()[-1500:] if log.exists() else "<no log>"
                self.assertEqual(
                    status, JobStatus.COMPLETED, f"{job_id} failed:\n{detail}"
                )

            # Every source's features + annotations landed in the target.
            for source_id in source_ids:
                self.assertTrue(
                    store.exists(DST, feature_key(source_id, "a")),
                    f"missing features for source {source_id}",
                )
                self.assertTrue(store.exists(DST, annotations_key(source_id)))


if __name__ == "__main__":
    unittest.main()
