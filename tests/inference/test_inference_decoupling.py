"""Architecture guard: the inference lane must import only jax/numpy/stdlib.

Runs the import in a fresh subprocess and fails if any training-only module
gets pulled in (reference: tests/pyspacer/test_inference_decoupling.py:1-55).
"""

import json
import subprocess
import sys
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parents[2]

FORBIDDEN_MODULES = [
    "flax",
    "optax",
    "scipy",
    "pandas",
    "sklearn",
    "pydantic",
    "matplotlib",
    "torch",
    "mermaid_classifier_tpu.train",
    "mermaid_classifier_tpu.config",
    "mermaid_classifier_tpu.data",
    "mermaid_classifier_tpu.metrics",
]

_PROBE = """
import json, sys
import mermaid_classifier_tpu.inference  # noqa: F401
import mermaid_classifier_tpu.inference.head  # noqa: F401
import mermaid_classifier_tpu.inference.export  # noqa: F401
import mermaid_classifier_tpu.inference.loader  # noqa: F401
print(json.dumps(sorted(sys.modules)))
"""


def test_inference_lane_is_decoupled():
    result = subprocess.run(
        [sys.executable, "-c", _PROBE],
        capture_output=True,
        text=True,
        cwd=REPO_ROOT,
        env={"PATH": "/usr/bin:/bin", "JAX_PLATFORMS": "cpu", "HOME": "/tmp"},
        check=False,
    )
    assert result.returncode == 0, result.stderr
    loaded = set(json.loads(result.stdout.strip().splitlines()[-1]))
    offenders = [
        mod
        for mod in loaded
        if any(mod == f or mod.startswith(f + ".") for f in FORBIDDEN_MODULES)
    ]
    assert not offenders, (
        f"inference lane pulled in training-only modules: {offenders}."
        " The [inference] dependency split must hold"
        " (jax/numpy/stdlib only)."
    )
