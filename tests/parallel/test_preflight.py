"""Production-geometry preflight: the AOT compile proof must cover the three
production programs at real shapes on the virtual mesh, report each leg's
compile time, and fail loudly on a geometry the mesh cannot partition.

The full C2 geometry itself (449k x 4096 int8 epoch scan, B0 224^2 batch
128, 80-class head over 44.9k rows) compiles in seconds and is exercised
once per round by ``__graft_entry__.dryrun_multichip``; these tests pin the
mechanism at reduced shapes so the suite stays fast, plus one real-geometry
leg (the resident epoch — the C2 drive's core program) at full scale.
"""

import numpy as np
import pytest

import jax

from mermaid_classifier_tpu.parallel.mesh import make_mesh
from mermaid_classifier_tpu.parallel.preflight import (
    C2_GEOMETRY,
    production_geometry_report,
)


@pytest.fixture(scope="module")
def mesh():
    return make_mesh(len(jax.devices()))


REDUCED = {
    # Small enough for seconds-fast CI, still sharded: every row/batch
    # count is a non-multiple of 8 so the padding rules are exercised.
    "n_rows": 1001,
    "dim": 64,
    "n_classes": 7,
    "hidden": (16, 8),
    "val_rows": 33,
    "extract_batch": 16,
}


class TestPreflight:
    def test_reduced_geometry_all_legs(self, mesh):
        report = production_geometry_report(mesh, REDUCED)
        assert report["devices"] == mesh.devices.size
        for leg in ("extract_b0", "resident_epoch", "serve_head"):
            assert report[leg]["compile_seconds"] >= 0.0, leg
        # Padding rules mirror the runtime paths exactly.
        re = report["resident_epoch"]
        assert re["rows_padded"] == 1008  # 1001 -> next multiple of 8
        assert re["batch_rows"] == 200  # sklearn-auto, already divisible
        assert re["n_batches"] == -(-1001 // 200)
        assert report["serve_head"]["rows_padded"] == 40  # 33 -> 40

    def test_dtype_variants_compile(self, mesh):
        for dtype in ("float32", "bfloat16", "int8"):
            report = production_geometry_report(
                mesh, {**REDUCED, "resident_dtype": dtype}
            )
            assert report["resident_epoch"]["dtype"] == dtype

    def test_full_c2_resident_epoch_compiles(self, mesh):
        """The real thing for the drive's core program: the 449,099 x 4096
        int8 row-sharded epoch scan must partition and compile at FULL
        production scale (compile-only — no buffer is allocated)."""
        geo = {**C2_GEOMETRY, "extract_batch": mesh.devices.size,
               "val_rows": mesh.devices.size}
        # Shrink legs 1 and 3 to trivial shapes; leg 2 stays production.
        report = production_geometry_report(mesh, geo)
        re = report["resident_epoch"]
        assert re["rows"] == 449_099
        assert re["rows_padded"] % mesh.devices.size == 0
        assert re["dtype"] == "int8"
        # ~1.8 GB int8 buffer row-shards to ~0.23 GB/device on 8 devices.
        expected = round(
            re["rows_padded"] * re["dim"] / mesh.devices.size / 1e9, 2
        )
        assert re["buffer_gb_per_device"] == expected

    def test_indivisible_extract_batch_rejected(self, mesh):
        with pytest.raises(ValueError, match="must divide"):
            production_geometry_report(
                mesh, {**REDUCED, "extract_batch": mesh.devices.size + 1}
            )
