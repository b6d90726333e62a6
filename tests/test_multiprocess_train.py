"""Real 2-process semi-supervised TRAIN STEP on CPU (multi-host training).

The reference trains multi-node: one torch.distributed process per GPU,
DDP gradient all-reduce, each rank's DataLoader feeding its own device
(dist_helper.py:13-46, train_semi.py:228-265).  The TPU equivalents are
`dist.replicate_to_mesh` (state onto the global mesh), `dist.
shard_host_batch` (per-process batch slice -> global batch-sharded array)
and the fused `make_semi_step` over a mesh spanning both processes'
devices — the exact code path `train_semi.py` runs.

Three subprocesses run ONE shared harness script:
  * ranks 0+1 of a 2-process jax.distributed job (1 CPU device each,
    global mesh of 2), each feeding only its half of the global batch;
  * a single-process run over 2 virtual CPU devices with the full batch
    (the proven single-host driver path), as the numeric reference.

All three must agree on every step metric and on the post-step parameter
checksums: multi-host semi training IS single-host semi training.
"""

import json
import os
import socket
import subprocess
import sys
import textwrap

import pytest

CHILD = textwrap.dedent(
    """
    import json, os, sys
    import numpy as np

    sys.path.insert(0, os.environ["U2PL_REPO"])

    import jax
    import jax.numpy as jnp

    from u2pl_tpu.dist import (
        initialize_distributed, local_view, make_mesh, replicate_to_mesh,
        shard_host_batch,
    )

    initialize_distributed()
    nproc = jax.process_count()
    pid = jax.process_index()

    from __graft_entry__ import _flagship_cfg
    from u2pl_tpu.memobank import init_memobank
    from u2pl_tpu.models import build_model
    from u2pl_tpu.train.optim import make_optimizer
    from u2pl_tpu.train.state import copy_student_to_teacher, create_train_state
    from u2pl_tpu.train.steps import make_semi_step

    crop = 65
    cfg = _flagship_cfg(crop=crop, slim=True)
    mesh = make_mesh()
    assert mesh.devices.size == 2, mesh

    model = build_model(cfg.net, axis_name="data")
    dummy = build_model(cfg.net, axis_name=None)
    variables = jax.eval_shape(
        lambda: dummy.init(
            jax.random.PRNGKey(0), jnp.zeros((1, crop, crop, 3)), train=False
        )
    )
    tx = make_optimizer(cfg.trainer.optimizer, variables["params"], 10.0)
    bank = init_memobank(cfg.net.num_classes, 256, queue_size=128, class0_size=192)
    state = create_train_state(
        model, tx, jax.random.PRNGKey(0), (1, crop, crop, 3),
        with_teacher=True, bank=bank,
        prototype=jnp.zeros((cfg.net.num_classes, 256, 1, 256)),
    )
    state = state.replace(step=state.step + 10)  # past warmup annealing edge

    # the exact driver sequence (train_semi.py): replicate, jitted
    # student->teacher copy, global-batch feed, fused step
    state = replicate_to_mesh(mesh, state)
    state = copy_student_to_teacher(state)
    step = make_semi_step(cfg, model, tx, steps_per_epoch=10, mesh=mesh)
    key = replicate_to_mesh(mesh, jax.random.PRNGKey(1))

    GB = 2  # global batch: one image per device
    per = GB // nproc
    lo = pid * per
    out = []
    for s in range(2):
        rng = np.random.RandomState(100 + s)
        img_l = rng.randn(GB, crop, crop, 3).astype(np.float32)
        lab_l = rng.randint(0, cfg.net.num_classes, (GB, crop, crop))
        img_u = rng.randn(GB, crop, crop, 3).astype(np.float32)
        state, metrics = step(
            state,
            shard_host_batch(mesh, img_l[lo : lo + per]),
            shard_host_batch(mesh, lab_l[lo : lo + per]),
            shard_host_batch(mesh, img_u[lo : lo + per]),
            key,
        )
        m = jax.device_get(local_view(metrics))
        out.append({k: float(np.asarray(v).sum()) for k, v in m.items()})

    # rank-0 checkpoint save on the replicated global state (exercises the
    # local_view fetch inside save_checkpoint), then restore on BOTH ranks
    ckpt_dir = os.environ.get("U2PL_CKPT_DIR")
    ckpt_ok = None
    if ckpt_dir:
        from jax.experimental import multihost_utils

        from u2pl_tpu.utils.checkpoint import restore_payload, save_checkpoint

        path = os.path.join(ckpt_dir, "ckpt.ckpt")
        if pid == 0:
            save_checkpoint(path, state, epoch=1, best_miou=0.25)
        if nproc > 1:
            multihost_utils.sync_global_devices("ckpt_saved")
        payload = restore_payload(path)
        ckpt_ok = (
            payload["epoch"] == 1
            and abs(payload["best_miou"] - 0.25) < 1e-9
            and payload["step"] == 12  # started at 10, ran 2 steps
            and "teacher_state" in payload
            and "memobank" in payload
        )

    params = jax.device_get(local_view(state.params))
    checks = {
        "ckpt_ok": ckpt_ok,
        "param_sum": float(
            sum(np.float64(np.asarray(l)).sum()
                for l in jax.tree_util.tree_leaves(params))
        ),
        "teacher_sum": float(
            sum(np.float64(np.asarray(l)).sum()
                for l in jax.tree_util.tree_leaves(
                    jax.device_get(local_view(state.teacher_params))))
        ),
        "queue_occupancy": np.asarray(
            jax.device_get(local_view(state.bank.occupancy))
        ).tolist(),
    }
    print("CHILD_RESULT", pid, json.dumps({"metrics": out, "checks": checks}),
          flush=True)
    """
)


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _base_env(repo):
    env = dict(os.environ)
    # strip the axon sitecustomize TPU plumbing: children are pure-CPU
    for k in list(env):
        if k.startswith(("PALLAS_AXON", "AXON_", "TPU_")):
            env.pop(k)
    env.pop("U2PL_TPU_MULTIHOST", None)
    for k in ("JAX_COORDINATOR_ADDRESS", "JAX_NUM_PROCESSES", "JAX_PROCESS_ID"):
        env.pop(k, None)
    env["JAX_PLATFORMS"] = "cpu"
    env["U2PL_REPO"] = repo
    return env


# identical compile flags in ALL children so the numeric comparison is
# apples-to-apples; level 0 skips the CPU optimization pipeline (the SPMD
# partitioning under test is unaffected) so each child compiles in seconds
# on a 1-core driver host — same recipe as __graft_entry__.dryrun_multichip
_OPT0 = "--xla_backend_optimization_level=0"


@pytest.mark.slow
def test_two_process_semi_train_step_matches_single_process(tmp_path):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    port = _free_port()

    procs = {}
    outs = {}

    def wait_all():
        for name, p in list(procs.items()):
            if name in outs:
                continue
            try:
                out, _ = p.communicate(timeout=540)
            except subprocess.TimeoutExpired:
                for q in procs.values():
                    q.kill()
                pytest.fail(f"{name} timed out")
            outs[name] = out

    # single-process reference first (one core: avoid 3-way contention):
    # same program, 2 virtual devices, full batch — the proven driver path
    env = _base_env(repo)
    env["XLA_FLAGS"] = f"--xla_force_host_platform_device_count=2 {_OPT0}"
    env["U2PL_CKPT_DIR"] = str(tmp_path / "sp")
    os.makedirs(env["U2PL_CKPT_DIR"], exist_ok=True)
    procs["sp"] = subprocess.Popen(
        [sys.executable, "-c", CHILD], env=env,
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
    )
    wait_all()

    # 2-process distributed job: 1 virtual CPU device per process
    mp_ckpt = str(tmp_path / "mp")
    os.makedirs(mp_ckpt, exist_ok=True)
    for pid in range(2):
        env = _base_env(repo)
        env.update(
            XLA_FLAGS=f"--xla_force_host_platform_device_count=1 {_OPT0}",
            JAX_COORDINATOR_ADDRESS=f"127.0.0.1:{port}",
            JAX_NUM_PROCESSES="2",
            JAX_PROCESS_ID=str(pid),
            U2PL_CKPT_DIR=mp_ckpt,
        )
        procs[f"mp{pid}"] = subprocess.Popen(
            [sys.executable, "-c", CHILD], env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
    wait_all()

    results = {}
    for name, p in procs.items():
        assert p.returncode == 0, f"{name} failed:\n{outs[name]}"
        for line in outs[name].splitlines():
            if line.startswith("CHILD_RESULT"):
                _, _, payload = line.split(None, 2)
                results[name] = json.loads(payload)
    assert set(results) == {"mp0", "mp1", "sp"}, outs

    # both ranks of the distributed job agree bitwise (replicated outputs)
    assert results["mp0"] == results["mp1"], (results["mp0"], results["mp1"])

    # rank-0 checkpoint of the replicated global state restored on BOTH
    # ranks (and in the single-process run)
    for name in ("sp", "mp0", "mp1"):
        assert results[name]["checks"]["ckpt_ok"] is True, (
            name, results[name]["checks"],
        )

    # multi-host == single-host: same losses, thresholds, LR, queue sizes,
    # and post-2-step student/teacher parameter checksums
    ref, got = results["sp"], results["mp0"]
    assert got["checks"]["queue_occupancy"] == ref["checks"]["queue_occupancy"]
    for key in ("param_sum", "teacher_sum"):
        assert got["checks"][key] == pytest.approx(
            ref["checks"][key], rel=1e-6, abs=1e-6
        ), (key, got["checks"][key], ref["checks"][key])
    for s, (gm, rm) in enumerate(zip(got["metrics"], ref["metrics"])):
        assert set(gm) == set(rm)
        for k in rm:
            assert gm[k] == pytest.approx(rm[k], rel=1e-5, abs=1e-5), (
                s, k, gm[k], rm[k],
            )
