"""The diff harness CLI end to end: self-test mode must stay green in
both padding modes (the landing strip real production weights will use),
and the remap-table dump must be written."""

import json
import subprocess
import sys
from pathlib import Path

import pytest

REPO_ROOT = Path(__file__).resolve().parents[2]

# Tiny geometry so the CLI runs in seconds on CPU.
TINY = {
    "stem_channels": 8,
    "stages": [[1, 8, 1, 1, 3], [6, 16, 1, 2, 5]],
    "head_channels": 32,
    "se_ratio": 0.25,
    "feature_dim": 64,
    "mean_rgb": [0.485, 0.456, 0.406],
    "std_rgb": [0.229, 0.224, 0.225],
    "patch_size": 32,
    "compute_dtype": "float32",
}


def run_cli(tmp_path, *extra):
    cfg = tmp_path / "tiny.json"
    cfg.write_text(json.dumps(TINY))
    return subprocess.run(
        [sys.executable, str(REPO_ROOT / "scripts" / "diff_backbone.py"),
         "--self-test", "--config-json", str(cfg), *extra],
        capture_output=True, text=True, timeout=180, cwd=REPO_ROOT,
    )


@pytest.mark.parametrize("padding", ["symmetric", "tf_same"])
def test_self_test_green_in_both_padding_modes(tmp_path, padding):
    proc = run_cli(tmp_path, "--padding", padding)
    assert proc.returncode == 0, proc.stdout[-3000:] + proc.stderr[-1000:]
    assert "ALL GREEN" in proc.stdout
    assert f"padding={padding}" in proc.stdout


def test_remap_table_dump(tmp_path):
    table = tmp_path / "remap.csv"
    proc = run_cli(tmp_path, "--dump-remap", str(table))
    assert proc.returncode == 0, proc.stdout[-2000:]
    lines = table.read_text().splitlines()
    assert lines[0] == "source_key,canonical_key"
    assert len(lines) > 10


def test_save_npz_persists_weights_and_config_sidecar(tmp_path):
    """--save-npz writes the converted bundle PLUS the .config.json
    sidecar recording the padding decision — so a later
    build_feature_bucket/annotate_image run can't silently fall back to
    the symmetric default graph (ADVICE round-3 medium)."""
    import json

    out = tmp_path / "converted.npz"
    proc = run_cli(tmp_path, "--padding", "tf_same", "--save-npz", str(out))
    assert proc.returncode == 0, proc.stdout[-3000:] + proc.stderr[-1000:]
    assert out.is_file()
    sidecar = tmp_path / "converted.config.json"
    assert sidecar.is_file()
    recorded = json.loads(sidecar.read_text())
    assert recorded["padding"] == "tf_same"
    assert recorded["stem_channels"] == TINY["stem_channels"]

    from mermaid_classifier_tpu.models.convert import load_backbone_bundle

    variables, config = load_backbone_bundle(str(out))
    assert config.padding == "tf_same"
    assert "params" in variables and "batch_stats" in variables
