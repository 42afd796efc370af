"""The one-command E2E drive must pass from a fresh checkout: synthetic
images -> manifest -> sharded extraction -> train -> export -> reload ->
report, all through the committed configs/example/ recipe.

The deadline is machine-scaled (tests/common/e2e_harness.py): a fixed
wall-clock limit flips red on slower hosts even though nothing is wrong;
on timeout the failure message carries the smoke's own stage-done markers
so it names the stage that blew the budget."""

import sys
import unittest
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

from tests.common.e2e_harness import run_e2e  # noqa: E402


class TestE2ESmoke(unittest.TestCase):
    def test_full_pipeline_from_committed_recipe(self):
        import tempfile

        with tempfile.TemporaryDirectory() as td:
            proc = run_e2e(
                [
                    sys.executable,
                    str(REPO / "scripts" / "e2e_smoke.py"),
                    "--workdir", td,
                    "--images-per-source", "3",
                ],
                cwd=REPO,
            )
            if proc.returncode != 0:
                self.fail(
                    f"e2e smoke failed (rc={proc.returncode})\n"
                    f"--- stdout ---\n{proc.stdout[-4000:]}\n"
                    f"--- stderr ---\n{proc.stderr[-4000:]}"
                )
            self.assertIn("PASS", proc.stdout)
            self.assertIn("stage budget:", proc.stdout)
            workspace = Path(td)
            self.assertTrue((workspace / "report.html").is_file())
            registry = workspace / "tracking" / "_models" / "mermaid-mlp-example"
            self.assertTrue((registry / "v1" / "model.npz").is_file())
            self.assertTrue((registry / "v1" / "model.json").is_file())


if __name__ == "__main__":
    unittest.main()
