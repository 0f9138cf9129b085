"""True multi-process (N>=2 "hosts") data-parallel training smoke.

The reference has no distributed code at all (SURVEY.md 2.6); this
framework's multi-host story is jax.distributed + a 1-D data mesh with
per-process local feeding (parallel.shard_batch ->
make_array_from_process_local_data).  Real multi-host TPU slices are not
available in this environment, so this script runs the SAME code path as a
2-process CPU cluster (gloo collectives over localhost = the DCN leg), each
process owning 4 virtual devices (the ICI leg): an 8-way global mesh fed
process-locally, exactly like one process per TPU host.

Checks:
  * the global mesh spans both processes' devices,
  * one DP train step runs (gradient all-reduce crosses the process
    boundary),
  * per-step losses match a single-process 8-device run on the same global
    batch bit-for-bit-ish (rtol 1e-6) -- process-local feeding is
    numerically equivalent to single-controller execution.

Usage: python scripts/multihost_smoke.py           # coordinator: spawns 2 workers
       (workers are re-invocations of this file with _WORKER env vars set)
"""

import ast
import os
import pathlib
import re
import socket
import subprocess
import sys
import tempfile

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

N_PROC = 2
DEVICES_PER_PROC = 4
GLOBAL_BATCH = 16
STEPS = 3


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _parse_losses(text: str, tag: str, context: str) -> list:
    m = re.search(tag + r" LOSSES (\[[-+.,e\d\s]*\])", text)
    assert m, f"no '{tag} LOSSES' line in output:\n{context[-2000:]}"
    return ast.literal_eval(m.group(1))


def make_global_batch():
    import numpy as np

    rng = np.random.default_rng(0)
    obs = np.abs(rng.standard_normal((GLOBAL_BATCH, 48, 48))).astype(np.float32) * 20
    psf = np.abs(rng.standard_normal((GLOBAL_BATCH, 48, 48))).astype(np.float32)
    psf = psf / psf.sum(axis=(1, 2), keepdims=True) / 16.0
    alpha = np.full((GLOBAL_BATCH,), 50.0, np.float32)
    return {"obs": obs, "psf": psf, "alpha": alpha, "gt": obs * 0.5}


def build():
    import jax

    from galaxy_deconv_tpu.losses import MultiScaleLoss
    from galaxy_deconv_tpu.models import UnrolledADMMGaussian
    from galaxy_deconv_tpu.train import create_train_state, make_train_step
    from galaxy_deconv_tpu.train.state import default_optimizer

    model = UnrolledADMMGaussian(n_iters=2, features=(4, 8, 8, 8))
    batch = make_global_batch()
    state, opt = create_train_state(model, jax.random.PRNGKey(0), batch, default_optimizer(1e-3))
    step = make_train_step(model, MultiScaleLoss(), opt, donate=False)
    return state, step


def run_steps(state, step, sharded):
    losses = []
    for _ in range(STEPS):
        state, loss = step(state, sharded)
        losses.append(float(loss))
    return losses


def worker():
    import jax

    jax.config.update("jax_platforms", "cpu")
    pid = int(os.environ["SMOKE_PROC_ID"])
    port = int(os.environ["SMOKE_PORT"])
    jax.distributed.initialize(
        coordinator_address=f"localhost:{port}", num_processes=N_PROC, process_id=pid
    )
    assert jax.process_count() == N_PROC, jax.process_count()
    assert len(jax.devices()) == N_PROC * DEVICES_PER_PROC, len(jax.devices())
    assert len(jax.local_devices()) == DEVICES_PER_PROC

    from galaxy_deconv_tpu.parallel import make_mesh, replicated_sharding, shard_batch

    mesh = make_mesh()  # all 8 global devices, both processes
    procs = {d.process_index for d in mesh.devices.flat}
    assert procs == set(range(N_PROC)), procs

    state, step = build()
    state = jax.device_put(state, replicated_sharding(mesh))
    # per-process local slice, globally assembled (the multi-host feed path)
    n_local = GLOBAL_BATCH // N_PROC
    local = {k: v[pid * n_local:(pid + 1) * n_local] for k, v in make_global_batch().items()}
    sharded = shard_batch(local, mesh)

    losses = run_steps(state, step, sharded)
    print(f"WORKER{pid} LOSSES {losses}", flush=True)


def coordinator():
    # single-process 8-device reference run on the same global batch
    env = dict(
        os.environ,
        JAX_PLATFORMS="cpu",
        XLA_FLAGS="--xla_force_host_platform_device_count="
        + str(DEVICES_PER_PROC * N_PROC),
    )
    ref = subprocess.run(
        [sys.executable, __file__, "--single"], env=env, capture_output=True, text=True, timeout=900
    )
    assert ref.returncode == 0, ref.stderr[-2000:]
    ref_losses = _parse_losses(ref.stdout, "SINGLE", ref.stdout + ref.stderr)

    env = dict(
        os.environ,
        JAX_PLATFORMS="cpu",
        XLA_FLAGS=f"--xla_force_host_platform_device_count={DEVICES_PER_PROC}",
        SMOKE_PORT=str(_free_port()),
    )
    # worker output goes to files, not pipes: no undrained-pipe deadlock while
    # waiting on the other worker, and logs survive a kill
    procs, logs = [], []
    with tempfile.TemporaryDirectory() as tmp:
        try:
            for pid in range(N_PROC):
                log = open(pathlib.Path(tmp) / f"worker{pid}.log", "w+")
                logs.append(log)
                procs.append(
                    subprocess.Popen(
                        [sys.executable, __file__, "--worker"],
                        env=dict(env, SMOKE_PROC_ID=str(pid)),
                        stdout=log, stderr=subprocess.STDOUT, text=True,
                    )
                )
            for p in procs:
                p.wait(timeout=900)
        finally:
            for p in procs:
                if p.poll() is None:
                    p.kill()
                    p.wait()
        worker_losses = []
        for pid, (p, log) in enumerate(zip(procs, logs)):
            log.seek(0)
            out = log.read()
            log.close()
            assert p.returncode == 0, out[-2000:]
            worker_losses.append(_parse_losses(out, f"WORKER{pid}", out))

    import numpy as np

    assert np.allclose(worker_losses[0], worker_losses[1], rtol=1e-6), worker_losses
    assert np.allclose(worker_losses[0], ref_losses, rtol=1e-5), (worker_losses[0], ref_losses)
    print(f"multihost_smoke: {N_PROC} processes x {DEVICES_PER_PROC} devices, "
          f"{STEPS} DP steps, losses match single-process run: {ref_losses}")


def single():
    import jax

    jax.config.update("jax_platforms", "cpu")

    from galaxy_deconv_tpu.parallel import make_mesh, replicated_sharding, shard_batch

    mesh = make_mesh()
    state, step = build()
    state = jax.device_put(state, replicated_sharding(mesh))
    sharded = shard_batch(make_global_batch(), mesh)
    print(f"SINGLE LOSSES {run_steps(state, step, sharded)}", flush=True)


if __name__ == "__main__":
    if "--worker" in sys.argv:
        worker()
    elif "--single" in sys.argv:
        single()
    else:
        coordinator()
