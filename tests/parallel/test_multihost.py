"""Multi-host seam: the two-process CPU dryrun must stay green.

Runs scripts/dryrun_multihost.py as a real parent process (which itself
spawns two coordinator-connected jax processes), asserting the
`parallel/` layer's DCN growth path (SURVEY.md §5.8) — global mesh
construction, a cross-process psum, and one dp+tp sharded train step —
compiles and executes across genuine process boundaries.
"""

import subprocess
import sys
import unittest
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parents[2]


class MultihostDryrunTest(unittest.TestCase):
    def test_two_process_dryrun(self):
        proc = subprocess.run(
            [
                sys.executable,
                str(REPO_ROOT / "scripts" / "dryrun_multihost.py"),
                "--processes", "2", "--local-devices", "2",
                "--timeout", "180",
            ],
            capture_output=True,
            text=True,
            timeout=220,
            cwd=REPO_ROOT,
        )
        self.assertEqual(
            proc.returncode, 0,
            f"stdout:\n{proc.stdout[-4000:]}\nstderr:\n{proc.stderr[-2000:]}",
        )
        self.assertIn("MULTIHOST_DRYRUN_OK:", proc.stdout)


if __name__ == "__main__":
    unittest.main()
