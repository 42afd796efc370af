"""Guard: importing ANY training-lane module must not touch the network.

The reference learned this the hard way (taxonomy libraries used to hit
the live MERMAID API at construction) and guards it
(reference: tests/pyspacer/test_train.py:587-616); here the whole module
surface is imported in a fresh subprocess whose socket layer raises, so
an import-time API call — present or future — fails CI loudly.
"""

import subprocess
import sys
import unittest
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parents[2]

MODULES = [
    "mermaid_classifier_tpu.common.taxonomy",
    "mermaid_classifier_tpu.config.settings",
    "mermaid_classifier_tpu.config.run_config",
    "mermaid_classifier_tpu.data.dataset",
    "mermaid_classifier_tpu.data.feature_bucket",
    "mermaid_classifier_tpu.train.trainer",
    "mermaid_classifier_tpu.train.runner",
    "mermaid_classifier_tpu.metrics.coordinator",
    "mermaid_classifier_tpu.serve.annotation",
    "mermaid_classifier_tpu.tracking.local_tracker",
    "mermaid_classifier_tpu.jobs.launch",
]

_PROBE = """
# ssl subclasses socket.socket at import time, so the refusal must hook
# the CONNECT methods, never replace the class (replacing it false-fails
# the very first transitive `import ssl` on a standard Python).
import socket

class _NoNetwork(Exception):
    pass

def _refuse(*a, **k):
    raise _NoNetwork("network touched at import time")

socket.socket.connect = _refuse
socket.socket.connect_ex = _refuse
socket.create_connection = _refuse
socket.getaddrinfo = _refuse

import importlib
for name in {modules!r}:
    importlib.import_module(name)
print("NO_NETWORK_AT_IMPORT_OK")
"""


class NoNetworkAtImportTest(unittest.TestCase):
    def test_training_lane_imports_are_offline(self):
        proc = subprocess.run(
            [sys.executable, "-c", _PROBE.format(modules=MODULES)],
            capture_output=True,
            text=True,
            timeout=180,
            cwd=REPO_ROOT,
        )
        self.assertEqual(
            proc.returncode, 0,
            f"stdout:\n{proc.stdout}\nstderr:\n{proc.stderr[-3000:]}",
        )
        self.assertIn("NO_NETWORK_AT_IMPORT_OK", proc.stdout)


if __name__ == "__main__":
    unittest.main()
