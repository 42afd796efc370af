"""Guard: the inference lane's SOURCE must stay pickle-free — the artifact
contract is npz + JSON, and no serving path may quietly grow pickle glue
(reference analog: tests/pyspacer/test_pickle_free_training.py:55, which
greps the tree for banned classifier-pickle usage)."""

import re
from pathlib import Path

INFERENCE_DIR = (
    Path(__file__).resolve().parents[2] / "mermaid_classifier_tpu" / "inference"
)

_BANNED = re.compile(
    r"^\s*(import\s+pickle|from\s+pickle\s+import|import\s+cloudpickle"
    r"|import\s+dill|allow_pickle\s*=\s*True)",
    re.MULTILINE,
)


def test_inference_lane_source_is_pickle_free():
    offenders = []
    for path in sorted(INFERENCE_DIR.rglob("*.py")):
        if match := _BANNED.search(path.read_text()):
            offenders.append(f"{path.name}: {match.group(0).strip()}")
    assert not offenders, (
        "pickle usage found in the inference lane (the shipped artifact"
        f" must stay pickle-free): {offenders}"
    )


def test_npz_loads_disallow_pickle():
    """Every np.load in the lane must pass allow_pickle=False explicitly."""
    for path in sorted(INFERENCE_DIR.rglob("*.py")):
        text = path.read_text()
        for match in re.finditer(r"np\.load\(([^)]*)\)", text):
            assert "allow_pickle=False" in match.group(1), (
                f"{path.name}: np.load without explicit allow_pickle=False:"
                f" {match.group(0)}"
            )
