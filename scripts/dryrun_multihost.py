#!/usr/bin/env python
"""Two-process multi-host dryrun: prove the `parallel/` layer's DCN growth
seam compiles and executes across REAL process boundaries, no cluster
needed.

The reference scales out only by fanning independent workers over an
object store (reference: scripts/launch_processing.py:59-124; kept here as
`jobs/`). SURVEY.md §5.8 names a jax-level multi-host mesh as this
framework's growth path for anything gradient-synchronized — this script
is that seam's executable proof:

  parent: spawns N worker processes (default 2), each a separate Python
          process with K virtual CPU devices.
  worker: jax.distributed.initialize against the parent-chosen
          coordinator -> global device view (N*K devices) ->
          make_multihost_mesh (DCN dimension on the data axis only) ->
          cross-process psum check -> one ShardedHeadTrainer train step
          (dp gradient sync across processes, tp inside each process) ->
          the production MLPClassifier mesh paths: streamed partial_fit
          AND device-resident training (row-sharded buffer, f32 + int8
          storage) differentially checked against a mesh-less run.

Exit 0 only when every worker succeeds. Used by
tests/parallel/test_multihost.py; run standalone:

    python scripts/dryrun_multihost.py [--processes 2] [--local-devices 2]
"""

from __future__ import annotations

import argparse
import os
import socket
import subprocess
import sys
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO_ROOT))

OK_MARKER = "MULTIHOST_DRYRUN_OK"


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def worker(args) -> int:
    # Virtual CPU devices must be forced BEFORE jax initializes backends,
    # and the CPU pin must go through jax.config (the axon TPU plugin
    # ignores JAX_PLATFORMS — tests/conftest.py).
    # Overwrite (not merely default) any inherited device-count flag: a
    # pytest parent exports its own 8-device value via tests/conftest.py.
    flags = [
        f for f in os.environ.get("XLA_FLAGS", "").split()
        if "xla_force_host_platform_device_count" not in f
    ]
    flags.append(
        f"--xla_force_host_platform_device_count={args.local_devices}"
    )
    os.environ["XLA_FLAGS"] = " ".join(flags)

    import jax

    jax.config.update("jax_platforms", "cpu")

    import numpy as np

    from mermaid_classifier_tpu.parallel.mesh import (
        DATA_AXIS,
        MODEL_AXIS,
        initialize_distributed,
        make_multihost_mesh,
    )

    initialize_distributed(
        coordinator_address=args.coordinator,
        num_processes=args.processes,
        process_id=args.process_id,
    )
    n_total = args.processes * args.local_devices
    assert jax.process_count() == args.processes, jax.process_count()
    assert jax.device_count() == n_total, (
        f"global device count {jax.device_count()} != {n_total}"
    )
    assert jax.local_device_count() == args.local_devices

    mesh = make_multihost_mesh()
    assert mesh.devices.size == n_total

    # Cross-process collective check: a psum of ones over the whole mesh
    # must see every device on every host.
    import jax.numpy as jnp
    from jax.experimental.shard_map import shard_map
    from jax.sharding import NamedSharding, PartitionSpec as P

    ones = jax.device_put(
        np.ones((n_total, 1), np.float32),
        NamedSharding(mesh, P((DATA_AXIS, MODEL_AXIS), None)),
    )

    def total(x):
        return jax.lax.psum(jnp.sum(x), (DATA_AXIS, MODEL_AXIS))

    got = float(
        jax.jit(
            shard_map(
                total, mesh=mesh,
                in_specs=P((DATA_AXIS, MODEL_AXIS), None), out_specs=P(),
            )
        )(ones)
    )
    assert got == float(n_total), f"psum over mesh gave {got}, want {n_total}"

    # One sharded head-training step over the multi-host mesh: the dp
    # gradient all-reduce crosses the process boundary (DCN in
    # production), the tp activation collectives stay process-local (ICI).
    from mermaid_classifier_tpu.parallel.sharded_train import (
        ShardedHeadTrainer,
    )

    layers = (16, 8, 4)
    batch = 4 * n_total
    trainer = ShardedHeadTrainer(mesh, layers, learning_rate=1e-3, alpha=0.01)
    params = trainer.init_params(seed=0)
    opt_state = trainer.init_opt_state(params)
    rng = np.random.default_rng(0)  # same stream on every process: the
    # batch is globally identical, each process materializes its shard.
    x = rng.standard_normal((batch, layers[0])).astype(np.float32)
    y = rng.integers(0, layers[-1], size=batch).astype(np.int32)
    w = np.ones(batch, np.float32)
    xd, yd, wd = trainer.place_batch(x, y, w)
    params, opt_state, loss = trainer.train_step(
        params, opt_state, xd, yd, wd, float(batch)
    )
    loss = float(loss)
    assert np.isfinite(loss), loss

    # The production classifier's own mesh path across process
    # boundaries: every process supplies the identical global batch;
    # device_put shards rows over the multi-host mesh and the jitted
    # update's gradient reduction crosses DCN.
    from mermaid_classifier_tpu.train.mlp_classifier import MLPClassifier

    clf = MLPClassifier((8,), learning_rate_init=1e-3, random_state=0,
                        batch_size=2 * n_total, mesh=mesh)
    Xc = rng.standard_normal((4 * n_total, 6)).astype(np.float32)
    yc = np.asarray([f"c{v}" for v in rng.integers(0, 3, 4 * n_total)])
    clf.partial_fit(Xc, yc, classes=sorted(set(yc.tolist())))
    clf_loss = clf.loss_curve_[-1]
    assert np.isfinite(clf_loss), clf_loss

    # Device-resident training across the process boundary — the
    # production C2 shape (trainer pins the full feature matrix once,
    # row-SHARDED over every host's devices, and gathers mini-batches by
    # index): every process device_puts the identical host matrix onto
    # the global row sharding (JAX extracts each process's local shards),
    # the gather + dp gradient reduction cross DCN, and the losses must
    # match a mesh-less single-process run of the same data — the same
    # differential the single-host tests pin, here across real processes.
    # int8 storage exercises the quantized buffer + per-row scale vector
    # over the multihost sharding too.
    for rdtype in ("float32", "int8"):
        resident = MLPClassifier((8,), learning_rate_init=1e-3,
                                 random_state=0, batch_size=2 * n_total,
                                 mesh=mesh)
        local = MLPClassifier((8,), learning_rate_init=1e-3,
                              random_state=0, batch_size=2 * n_total)
        rng_r = np.random.default_rng(42)  # same stream on every process
        Xr = rng_r.standard_normal((6 * n_total, 6)).astype(np.float32)
        yr = np.asarray([f"c{v}" for v in rng_r.integers(0, 3, len(Xr))])
        resident.set_resident_features(Xr, dtype=rdtype)
        local.set_resident_features(Xr, dtype=rdtype)
        idx = np.arange(len(Xr))
        cls_list = sorted(set(yr.tolist()))
        resident.partial_fit_resident(idx, yr, classes=cls_list)
        local.partial_fit_resident(idx, yr, classes=cls_list)
        r_loss, l_loss = resident.loss_curve_[-1], local.loss_curve_[-1]
        assert np.isfinite(r_loss), r_loss
        assert abs(r_loss - l_loss) < 1e-5, (rdtype, r_loss, l_loss)
        p_mesh = resident.predict_proba_resident(idx[: 2 * n_total])
        p_local = local.predict_proba_resident(idx[: 2 * n_total])
        np.testing.assert_allclose(p_mesh, p_local, rtol=1e-5, atol=1e-6)

    print(f"{OK_MARKER} process={args.process_id} loss={loss:.4f}"
          f" clf_loss={clf_loss:.4f} resident=ok(f32,int8)", flush=True)
    return 0


def parent(args) -> int:
    import tempfile
    import time

    port = _free_port()
    coordinator = f"127.0.0.1:{port}"
    env = dict(os.environ)
    # Workers write to FILES, not pipes: a worker stuck mid-collective
    # while another floods 64KB of XLA traceback into a full pipe would
    # deadlock both; files also survive a kill so diagnostics are never
    # lost. args.timeout is ONE shared wall-clock deadline for the whole
    # fleet (a hung collective hangs every worker at once — waiting for
    # them sequentially would multiply the wait past every caller's outer
    # timeout).
    procs: list[subprocess.Popen] = []
    logs = []
    failures = 0
    try:
        for pid in range(args.processes):
            log = tempfile.NamedTemporaryFile(
                "w+", prefix=f"multihost_w{pid}_", suffix=".log",
                delete=False,
            )
            logs.append(log)
            procs.append(subprocess.Popen(
                [
                    sys.executable, str(Path(__file__).resolve()),
                    "--worker",
                    "--coordinator", coordinator,
                    "--processes", str(args.processes),
                    "--process-id", str(pid),
                    "--local-devices", str(args.local_devices),
                ],
                env=env,
                stdout=log,
                stderr=subprocess.STDOUT,
            ))
        deadline = time.monotonic() + args.timeout
        timed_out = []
        for pid, proc in enumerate(procs):
            remaining = deadline - time.monotonic()
            try:
                proc.wait(timeout=max(remaining, 0.1))
            except subprocess.TimeoutExpired:
                proc.kill()
                proc.wait()
                timed_out.append(pid)
        for pid, proc in enumerate(procs):
            out = Path(logs[pid].name).read_text()
            if pid in timed_out:
                print(f"worker {pid}: TIMEOUT after {args.timeout}s (shared"
                      " deadline)")
                failures += 1
                print("--- worker output (tail) ---")
                print(out[-4000:])
                continue
            ok = proc.returncode == 0 and OK_MARKER in out
            print(f"worker {pid}: rc={proc.returncode}"
                  f" {'ok' if ok else 'FAILED'}")
            if not ok:
                failures += 1
                print("--- worker output (tail) ---")
                print(out[-4000:])
    finally:
        # Never orphan workers or their log files, whatever raised above.
        for proc in procs:
            if proc.poll() is None:
                proc.kill()
                proc.wait()
        for log in logs:
            log.close()
            Path(log.name).unlink(missing_ok=True)
    if failures:
        return 1
    print(f"{OK_MARKER}: {args.processes} processes x"
          f" {args.local_devices} devices — global mesh, cross-process"
          " psum, sharded train step, and resident training (f32 + int8"
          " row-sharded buffer) all green")
    return 0


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--worker", action="store_true")
    parser.add_argument("--coordinator", default=None)
    parser.add_argument("--processes", type=int, default=2)
    parser.add_argument("--process-id", type=int, default=0)
    parser.add_argument("--local-devices", type=int, default=2)
    parser.add_argument("--timeout", type=float, default=240.0)
    args = parser.parse_args(argv)
    if args.worker:
        return worker(args)
    return parent(args)


if __name__ == "__main__":
    raise SystemExit(main())
