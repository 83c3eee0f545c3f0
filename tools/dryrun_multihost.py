"""Multi-host (DCN) dry run: 2 CPU processes, one global mesh.

The reference's only parallelism is single-process ``nn.DataParallel``
(``/root/reference/train_partseg_shapenet.py:248-250``); the TPU-pod
translation (SURVEY.md §2.7) is ``jax.distributed.initialize`` + a mesh
spanning all hosts, with each host feeding its addressable shard.  This
tool actually exercises that path without pod hardware: it launches two
OS processes, each owning 4 virtual CPU devices, initializes the JAX
distributed runtime through ``parallel.mesh.maybe_initialize_distributed``,
shards a loader stream per process (``data.loader.shard_for_host``),
assembles global batch arrays with ``jax.make_array_from_process_local_data``,
and runs one full supervised train step (grad psum over DCN) — asserting
both processes agree on the resulting global loss.

Run:  python tools/dryrun_multihost.py          (parent: spawns workers)
      python tools/dryrun_multihost.py --worker (internal)

Covered in the suite by ``tests/test_multihost.py`` (marked slow).
"""

import argparse
import os
import socket
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
N_PROC = 2
DEV_PER_PROC = 4
GLOBAL_BATCH = 8
NPOINT = 64


def _worker() -> None:
    # env (set by the parent) must be in place before jax initializes
    import jax

    jax.config.update("jax_platforms", "cpu")  # axon plugin override
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    sys.path.insert(0, REPO)
    from __graft_entry__ import _flagship
    from prifit_tpu.data.loader import shard_for_host
    from prifit_tpu.parallel.mesh import (
        make_mesh,
        maybe_initialize_distributed,
    )
    from prifit_tpu.train.steps import make_supervised_step

    assert maybe_initialize_distributed(), "coordinator env not honored"
    assert jax.process_count() == N_PROC, jax.process_count()
    pid = jax.process_index()
    assert len(jax.devices()) == N_PROC * DEV_PER_PROC
    assert len(jax.local_devices()) == DEV_PER_PROC

    mesh = make_mesh()  # 1-D data mesh over ALL processes' devices
    repl = NamedSharding(mesh, P())
    data_shard = NamedSharding(mesh, P("data"))

    # identical params on every process (same seed), then made global
    mod, model, state, _, _, _ = _flagship(
        npoint=NPOINT, quantile=0.2, msc_iterations=2, max_num_clusters=4,
        n_per_prim=16, batch=2)

    def to_global(tree, sharding):
        return jax.tree_util.tree_map(
            lambda x: jax.make_array_from_process_local_data(
                sharding, np.asarray(x)), tree)

    state = to_global(state, repl)

    # per-process loader shard: each host loads a DIFFERENT slice of the
    # global example stream, exactly as a pod host would
    rng = np.random.default_rng(0)  # same global dataset on both hosts
    all_points = rng.normal(size=(GLOBAL_BATCH, NPOINT, 3)).astype(np.float32)
    all_target = rng.integers(0, 50, (GLOBAL_BATCH, NPOINT)).astype(np.int32)
    idx = shard_for_host(np.arange(GLOBAL_BATCH), pid, N_PROC)
    # interleaved shard -> contiguous global layout: row-major device order
    # on the 1-D mesh means process p owns global rows [p*B/2, (p+1)*B/2)
    local_rows = np.arange(GLOBAL_BATCH).reshape(N_PROC, -1)[pid]
    assert len(idx) == len(local_rows)
    pts = jax.make_array_from_process_local_data(
        data_shard, all_points[local_rows])
    tgt = jax.make_array_from_process_local_data(
        data_shard, all_target[local_rows])
    cls = jax.make_array_from_process_local_data(
        data_shard, np.zeros((GLOBAL_BATCH // N_PROC, 16), np.float32))

    sup_step = make_supervised_step(model, mod.get_loss)
    state, m = sup_step(state, pts, cls, tgt, 0.001, 0.1,
                        jax.random.PRNGKey(0))
    loss = float(np.asarray(m["loss"]))
    assert np.isfinite(loss)
    print(f"MULTIHOST process={pid} loss={loss:.6f}", flush=True)


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def main() -> None:
    port = _free_port()
    procs = []
    for pid in range(N_PROC):
        env = dict(
            os.environ,
            JAX_PLATFORMS="cpu",
            XLA_FLAGS=(f"--xla_force_host_platform_device_count"
                       f"={DEV_PER_PROC}"),
            JAX_COORDINATOR_ADDRESS=f"127.0.0.1:{port}",
            JAX_NUM_PROCESSES=str(N_PROC),
            JAX_PROCESS_ID=str(pid),
            JAX_COMPILATION_CACHE_DIR="/root/.jax_cache",
        )
        env.pop("PYTHONPATH", None)
        env["PYTHONPATH"] = REPO
        procs.append(subprocess.Popen(
            [sys.executable, os.path.abspath(__file__), "--worker"],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True))
    outs = [p.communicate(timeout=600)[0] for p in procs]
    losses = []
    for pid, (p, out) in enumerate(zip(procs, outs)):
        if p.returncode != 0:
            print(out)
            raise SystemExit(f"worker {pid} failed rc={p.returncode}")
        line = [ln for ln in out.splitlines() if "MULTIHOST" in ln][-1]
        losses.append(float(line.rsplit("loss=", 1)[1]))
    assert losses[0] == losses[1], f"processes disagree: {losses}"
    print(f"MULTIHOST DRYRUN PASSED loss={losses[0]:.6f} "
          f"(procs={N_PROC}, devices={N_PROC * DEV_PER_PROC})")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--worker", action="store_true")
    if ap.parse_args().worker:
        _worker()
    else:
        main()
