"""Driver-contract tests: __graft_entry__.dryrun_multichip must compile and
execute the sharded training + extraction paths on a virtual CPU mesh (the
exact invocation the external driver uses)."""

import subprocess
import sys
import unittest
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parents[1]


class TestDryrunMultichip(unittest.TestCase):
    def _run(self, n: int) -> None:
        proc = subprocess.run(
            [
                sys.executable,
                "-c",
                f"import __graft_entry__ as g; g.dryrun_multichip({n});"
                f" print('DRYRUN_OK')",
            ],
            cwd=REPO_ROOT,
            capture_output=True,
            text=True,
            timeout=600,
            env={
                "PATH": "/usr/bin:/bin",
                "HOME": "/tmp",
                "JAX_PLATFORMS": "cpu",
                "PYTHONPATH": str(REPO_ROOT),
            },
        )
        self.assertEqual(proc.returncode, 0, proc.stderr[-2000:])
        self.assertIn("DRYRUN_OK", proc.stdout)

    def test_eight_devices(self):
        self._run(8)

    def test_two_devices(self):
        self._run(2)


if __name__ == "__main__":
    unittest.main()
