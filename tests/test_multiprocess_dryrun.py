"""Real 2-process jax.distributed dry run on CPU (multi-host plumbing).

The reference bootstraps one torch.distributed process per GPU
(dist_helper.py:13-46) and all_reduces validation metrics across ranks
(train_semi.py:639-641).  The TPU build's equivalents are
`dist.initialize_distributed` (env-driven jax.distributed bootstrap) and
`dist.all_sum_across_processes` (process_allgather + sum).  Here we launch
two ACTUAL processes against a local coordinator and check:

  * initialize_distributed picks up JAX_COORDINATOR_ADDRESS /
    JAX_NUM_PROCESSES / JAX_PROCESS_ID (torchrun-style env bootstrap)
  * process_count/process_index are correct in both processes
  * all_sum_across_processes returns the true cross-process sum
  * a jitted computation over a global mesh spanning both processes'
    devices executes (compiled cross-process collective)
"""

import os
import socket
import subprocess
import sys
import textwrap

import pytest

pytestmark = pytest.mark.slow

CHILD = textwrap.dedent(
    """
    import os, sys
    import numpy as np

    import jax
    import jax.numpy as jnp

    sys.path.insert(0, os.environ["U2PL_REPO"])
    from u2pl_tpu.dist import all_sum_across_processes, initialize_distributed

    initialize_distributed()
    pid = jax.process_index()
    assert jax.process_count() == 2, jax.process_count()
    assert len(jax.devices()) == 4, len(jax.devices())

    # host-side metric reduction (val inter/union)
    x = np.arange(4, dtype=np.int64) + 10 * pid
    s = all_sum_across_processes(x)
    want = 2 * np.arange(4, dtype=np.int64) + 10
    assert (s == want).all(), (s, want)

    # compiled cross-process reduction over the global mesh
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    mesh = Mesh(np.asarray(jax.devices()), ("data",))
    local = np.full((2, 3), float(pid + 1), np.float32)  # 2 rows per process
    arr = jax.make_array_from_process_local_data(
        NamedSharding(mesh, P("data")), local, (4, 3)
    )
    total = jax.jit(
        lambda a: jnp.sum(a), out_shardings=NamedSharding(mesh, P())
    )(arr)
    got = float(jax.device_get(total))
    assert got == 2 * 3 * 1.0 + 2 * 3 * 2.0, got

    print("CHILD_OK", pid, flush=True)
    """
)


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_distributed_dryrun(tmp_path):
    port = _free_port()
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    procs = []
    for pid in range(2):
        env = dict(os.environ)
        # the axon sitecustomize registers the TPU plugin at interpreter
        # startup — strip its plumbing BEFORE the child starts so the child
        # is a pure-CPU interpreter (same recipe as __graft_entry__)
        for k in list(env):
            if k.startswith(("PALLAS_AXON", "AXON_", "TPU_")):
                env.pop(k)
        env.update(
            JAX_PLATFORMS="cpu",
            XLA_FLAGS="--xla_force_host_platform_device_count=2",
            JAX_COORDINATOR_ADDRESS=f"127.0.0.1:{port}",
            JAX_NUM_PROCESSES="2",
            JAX_PROCESS_ID=str(pid),
            U2PL_REPO=repo,
        )
        env.pop("U2PL_TPU_MULTIHOST", None)
        procs.append(
            subprocess.Popen(
                [sys.executable, "-c", CHILD],
                env=env,
                stdout=subprocess.PIPE,
                stderr=subprocess.STDOUT,
                text=True,
            )
        )
    outs = []
    for pid, p in enumerate(procs):
        try:
            out, _ = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail(f"process {pid} timed out")
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"rank {pid} failed:\n{out}"
        assert f"CHILD_OK {pid}" in out, out


def test_env_bootstrap_validation(monkeypatch):
    """Malformed/partial explicit-env bootstraps must fail loudly, not with
    an uncaught int('') ValueError or a silent single-process fallthrough
    (advisor r2)."""
    import jax

    from u2pl_tpu import dist as d

    calls = []
    monkeypatch.setattr(
        jax.distributed, "initialize", lambda *a, **k: calls.append((a, k))
    )
    for k in (
        "U2PL_TPU_MULTIHOST", "JAX_COORDINATOR_ADDRESS", "COORDINATOR_ADDRESS",
        "JAX_NUM_PROCESSES", "JAX_PROCESS_ID", "SLURM_NTASKS",
        "OMPI_COMM_WORLD_SIZE",
    ):
        monkeypatch.delenv(k, raising=False)

    # clean single-process env: no-op
    d.initialize_distributed()
    assert calls == []

    # complete, well-formed triple: initializes with parsed values
    monkeypatch.setenv("JAX_COORDINATOR_ADDRESS", "127.0.0.1:1234")
    monkeypatch.setenv("JAX_NUM_PROCESSES", " 2 ")
    monkeypatch.setenv("JAX_PROCESS_ID", "1")
    d.initialize_distributed()
    assert calls and calls[-1][1]["num_processes"] == 2
    assert calls[-1][1]["process_id"] == 1

    # partial / malformed sets: loud RuntimeError naming the variables
    bad_envs = [
        {"JAX_NUM_PROCESSES": "2"},  # missing coord + proc_id
        {"JAX_COORDINATOR_ADDRESS": "h:1", "JAX_NUM_PROCESSES": "2",
         "JAX_PROCESS_ID": ""},  # set-but-empty
        {"JAX_COORDINATOR_ADDRESS": "h:1", "JAX_NUM_PROCESSES": "abc",
         "JAX_PROCESS_ID": "0"},  # non-integer
    ]
    for bad in bad_envs:
        for k in ("JAX_COORDINATOR_ADDRESS", "JAX_NUM_PROCESSES",
                  "JAX_PROCESS_ID"):
            monkeypatch.delenv(k, raising=False)
        for k, v in bad.items():
            monkeypatch.setenv(k, v)
        with pytest.raises(RuntimeError, match="bootstrap"):
            d.initialize_distributed()

    # coordinator address alone is NOT an error: auto-detection handles it
    for k in ("JAX_NUM_PROCESSES", "JAX_PROCESS_ID"):
        monkeypatch.delenv(k, raising=False)
    monkeypatch.setenv("JAX_COORDINATOR_ADDRESS", "127.0.0.1:1234")
    n = len(calls)
    d.initialize_distributed()
    assert len(calls) == n + 1 and calls[-1] == ((), {})


VAL_CHILD = textwrap.dedent(
    """
    import json, os, sys
    import numpy as np

    import jax

    sys.path.insert(0, os.environ["U2PL_REPO"])
    from u2pl_tpu.dist import initialize_distributed

    initialize_distributed()
    assert jax.process_count() == 2

    from val_harness import build_cfg_and_model, run_validate

    cfg, model, variables = build_cfg_and_model(os.environ["U2PL_VAL_ROOT"])
    miou = run_validate(
        cfg, model, variables,
        process_index=jax.process_index(), process_count=2,
    )
    print("CHILD_MIOU", jax.process_index(), repr(miou), flush=True)
    """
)

VAL_HARNESS = textwrap.dedent(
    '''
    """Shared between the parent test and the 2-process children so the
    model/config/loader construction is literally the same code path."""
    import os

    import jax
    import jax.numpy as jnp

    from u2pl_tpu.config import parse_config
    from u2pl_tpu.data.loader import build_loaders
    from u2pl_tpu.models import build_model
    from u2pl_tpu.train.validate import validate

    HW = 33
    C = 3


    def build_cfg_and_model(root):
        raw = {
            "dataset": {
                "type": "pascal",
                "batch_size": 2,
                "n_sup": 8,
                "workers": 1,
                "mean": [123.675, 116.28, 103.53],
                "std": [58.395, 57.12, 57.375],
                "ignore_label": 255,
                "train": {
                    "data_root": root,
                    "data_list": os.path.join(root, "pascal_val.txt"),
                    "crop": {"type": "center", "size": [HW, HW]},
                },
                "val": {
                    "data_root": root,
                    "data_list": os.path.join(root, "pascal_val.txt"),
                    "crop": {"type": "center", "size": [HW, HW]},
                },
            },
            "criterion": {"type": "CELoss", "kwargs": {}},
            "trainer": {
                "epochs": 1,
                "optimizer": {"type": "SGD", "kwargs": {"lr": 0.01}},
                "lr_scheduler": {"mode": "poly", "kwargs": {"power": 0.9}},
            },
            "net": {
                "num_classes": C,
                "sync_bn": False,
                "ema_decay": 0.99,
                "encoder": {
                    "type": "u2pl.models.resnet.resnet10",
                    "kwargs": {
                        "multi_grid": True,
                        "fpn": True,
                        "replace_stride_with_dilation": [False, True, True],
                    },
                },
                "decoder": {
                    "type": "u2pl.models.decoder.dec_deeplabv3_plus",
                    "kwargs": {"inner_planes": 16, "dilations": [2, 4, 6]},
                },
            },
        }
        cfg = parse_config(raw)
        model = build_model(cfg.net, axis_name=None)
        variables = model.init(
            jax.random.PRNGKey(0), jnp.zeros((1, HW, HW, 3)), train=False
        )
        return cfg, model, variables


    def run_validate(cfg, model, variables, process_index, process_count):
        _, val_loader = build_loaders(
            cfg, seed=0,
            process_index=process_index, process_count=process_count,
        )
        return validate(
            model, variables["params"], variables["batch_stats"],
            val_loader, cfg,
        )
    '''
)


def test_two_process_validate_matches_single_process(tmp_path):
    """End-to-end validate() across 2 REAL processes: process-sliced
    EpochLoaders + the cross-process inter/union reduction must reproduce
    the single-process mIoU exactly (reference train_semi.py:630-647)."""
    np_img = pytest.importorskip("PIL.Image")
    rng_data = __import__("numpy").random.RandomState(5)
    import numpy as np

    root = tmp_path / "voc"
    (root / "JPEGImages").mkdir(parents=True)
    (root / "SegmentationClassAug").mkdir()
    ids = [f"v{i:02d}" for i in range(9)]  # 9 images: ragged final batch
    for s in ids:
        img = (rng_data.rand(40, 45, 3) * 255).astype(np.uint8)
        lab = rng_data.randint(0, 3, (40, 45)).astype(np.uint8)
        np_img.fromarray(img).save(root / "JPEGImages" / f"{s}.jpg")
        np_img.fromarray(lab).save(root / "SegmentationClassAug" / f"{s}.png")
    (root / "pascal_val.txt").write_text("\n".join(ids) + "\n")
    (tmp_path / "val_harness.py").write_text(VAL_HARNESS)

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

    # single-process reference value (same harness module, in-process)
    sys.path.insert(0, str(tmp_path))
    try:
        import val_harness

        cfg, model, variables = val_harness.build_cfg_and_model(str(root))
        want = val_harness.run_validate(
            cfg, model, variables, process_index=0, process_count=1
        )
    finally:
        sys.path.remove(str(tmp_path))

    port = _free_port()
    procs = []
    for pid in range(2):
        env = dict(os.environ)
        for k in list(env):
            if k.startswith(("PALLAS_AXON", "AXON_", "TPU_")):
                env.pop(k)
        env.update(
            JAX_PLATFORMS="cpu",
            XLA_FLAGS="--xla_force_host_platform_device_count=2",
            JAX_COORDINATOR_ADDRESS=f"127.0.0.1:{port}",
            JAX_NUM_PROCESSES="2",
            JAX_PROCESS_ID=str(pid),
            U2PL_REPO=repo,
            U2PL_VAL_ROOT=str(root),
            PYTHONPATH=str(tmp_path) + os.pathsep + env.get("PYTHONPATH", ""),
        )
        env.pop("U2PL_TPU_MULTIHOST", None)
        procs.append(
            subprocess.Popen(
                [sys.executable, "-c", VAL_CHILD],
                env=env,
                stdout=subprocess.PIPE,
                stderr=subprocess.STDOUT,
                text=True,
            )
        )
    outs = []
    for pid, p in enumerate(procs):
        try:
            out, _ = p.communicate(timeout=420)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail(f"process {pid} timed out")
        outs.append(out)
    mious = {}
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"rank {pid} failed:\n{out}"
        for line in out.splitlines():
            if line.startswith("CHILD_MIOU"):
                _, rank, val = line.split(None, 2)
                mious[int(rank)] = float(eval(val))
    assert set(mious) == {0, 1}, outs
    # integer inter/union sums reduce exactly -> identical mIoU everywhere
    assert mious[0] == mious[1]
    assert abs(mious[0] - want) < 1e-12, (mious, want)
