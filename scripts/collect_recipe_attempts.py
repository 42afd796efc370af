"""Collect gated C2-drive record attempts into one honest history record.

The committed C2 records in docs/runs/ are *scheduled* (the drive's
sustained-link gate, scripts/full_recipe_drive.py --min-link-mbps), but
link weather can still degrade mid-run — so a "best" record is only
meaningful next to the attempts that didn't beat it. This collector
folds every attempt JSON from a retry session into one record carrying
each attempt's probe, measured minutes, projection, and upload waits,
so the committed evidence shows the weather distribution, not a
cherry-picked draw. (Discipline mirrors the reference's habit of
committing full experiment tables, not single best rows — reference:
docs/research/balancing-experiments.md:49-84.)

Usage:
    python scripts/collect_recipe_attempts.py /tmp/fr_attempts \
        --output docs/runs/c2_record_attempts_2026-08-19.json
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path

ATTEMPT_KEYS = (
    "train_full_recipe_minutes",
    "projected_vm_train_minutes",
    "accuracy",
    "balanced_accuracy",
    "log_loss",
    "export_parity_max_abs_diff",
    "link_probe",
    "link_note",
)

BREAKDOWN_KEYS = (
    "epochs_seconds",
    "upload_stage_seconds",
    "upload_extra_wait_seconds",
    "load_seconds",
    "warm_seconds",
    "calibration_seconds",
    "final_eval_seconds",
)


def collect(attempts_dir: Path) -> dict:
    attempts = []
    for path in sorted(attempts_dir.glob("attempt_*.json")):
        rec = json.loads(path.read_text())
        row = {"attempt": path.stem}
        row.update({k: rec[k] for k in ATTEMPT_KEYS if k in rec})
        breakdown = rec.get("train_stage_breakdown", {})
        row["train_stage_breakdown"] = {
            k: breakdown[k] for k in BREAKDOWN_KEYS if k in breakdown
        }
        attempts.append(row)
    if not attempts:
        raise SystemExit(f"no attempt_*.json under {attempts_dir}")
    minutes = [
        a["train_full_recipe_minutes"]
        for a in attempts
        if "train_full_recipe_minutes" in a
    ]
    return {
        "what": (
            "every gated record attempt from this retry session, in order"
            " — committed alongside any new best so the record is read"
            " against the weather distribution it was drawn from"
        ),
        "drive": "scripts/full_recipe_drive.py --skip-synthesize"
                 " --resident-dtype int8 (all levers default)",
        "attempts": attempts,
        "n_attempts": len(attempts),
        "best_minutes": min(minutes) if minutes else None,
        "worst_minutes": max(minutes) if minutes else None,
    }


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("attempts_dir", type=Path)
    parser.add_argument("--output", type=Path, required=True)
    args = parser.parse_args()
    record = collect(args.attempts_dir)
    args.output.write_text(json.dumps(record, indent=1, sort_keys=True))
    print(json.dumps({
        "n_attempts": record["n_attempts"],
        "best_minutes": record["best_minutes"],
        "worst_minutes": record["worst_minutes"],
        "output": str(args.output),
    }))


if __name__ == "__main__":
    main()
