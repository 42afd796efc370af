"""The full pipeline over the S3 HTTP dialect: the same one-command E2E
drive, with the object store pointed at the in-process fake S3 endpoint —
images, annotations, features, and worker coordination all flow through
signed S3 REST calls instead of the local filesystem.

Deadline is machine-scaled (tests/common/e2e_harness.py); on timeout the
failure names the stage that blew the budget via the smoke's stage-done
markers."""

import sys
import unittest
from pathlib import Path

REPO = Path(__file__).resolve().parents[2]
sys.path.insert(0, str(REPO))

from tests.common.e2e_harness import run_e2e  # noqa: E402


class TestEndToEndOverS3(unittest.TestCase):
    def test_pipeline_runs_against_fake_s3(self):
        import os
        import tempfile

        from tests.data.fake_s3_server import make_server

        server, state, endpoint = make_server()
        self.addCleanup(server.shutdown)

        env = {
            **os.environ,
            "AWS_ACCESS_KEY_ID": "AK",
            "AWS_SECRET_ACCESS_KEY": "SK",
            "AWS_REGION": "us-east-1",
        }
        with tempfile.TemporaryDirectory() as td:
            proc = run_e2e(
                [
                    sys.executable,
                    str(REPO / "scripts" / "e2e_smoke.py"),
                    "--workdir", td,
                    "--images-per-source", "2",
                    "--object-store-root", "s3://",
                    "--object-store-endpoint", endpoint,
                ],
                cwd=REPO,
                env=env,
            )
            if proc.returncode != 0:
                self.fail(
                    f"e2e-over-s3 failed (rc={proc.returncode})\n"
                    f"--- stdout ---\n{proc.stdout[-4000:]}\n"
                    f"--- stderr ---\n{proc.stderr[-4000:]}"
                )
            self.assertIn("PASS", proc.stdout)

        # Everything coordinated through the endpoint: images uploaded,
        # features written by the workers, all requests SigV4-signed.
        keys = {k for (b, k) in state.objects if b == "features"}
        self.assertTrue(any(k.endswith(".features.npz") for k in keys))
        self.assertTrue(any(k.endswith("annotations.csv") for k in keys))
        self.assertTrue(state.auth_headers)
        self.assertTrue(
            all(a and "AWS4-HMAC-SHA256" in a for a in state.auth_headers)
        )


if __name__ == "__main__":
    unittest.main()
