"""TPU burn-in: 200 semi steps of ResNet-50 bf16 on a LEARNABLE synthetic
task (quantile-binned smoothed channel mix); verifies loss descent, bank
fill, and above-chance train mIoU with the real model on real hardware.

Run from the repo root: python tools/burnin.py
Observed on v5e (2026-08-16): sup_loss 6.89 -> ~2.0 over 200 steps,
uns 4.7 -> 0.4, con 3.4 -> 3.0, train mIoU 0.20 (chance 0.125)."""
import time, numpy as np, jax, jax.numpy as jnp, dataclasses
from __graft_entry__ import _flagship_cfg
from u2pl_tpu.dist import make_mesh
from u2pl_tpu.memobank import init_memobank
from u2pl_tpu.models import build_model
from u2pl_tpu.train.optim import make_optimizer
from u2pl_tpu.train.state import copy_student_to_teacher, create_train_state
from u2pl_tpu.train.steps import make_semi_step, make_semi_warmup_step
from u2pl_tpu.train.validate import make_val_step

crop, C = 257, 8
cfg = _flagship_cfg(crop=crop, num_classes=C)
cfg = dataclasses.replace(cfg, net=dataclasses.replace(cfg.net, dtype="bfloat16",
    encoder=dataclasses.replace(cfg.net.encoder, type="u2pl.models.resnet.resnet50")),
    trainer=dataclasses.replace(cfg.trainer, epochs=10))
mesh = make_mesh()
model = build_model(cfg.net, axis_name="data")
model_eval = build_model(cfg.net, axis_name=None)
dummy = build_model(cfg.net, axis_name=None)
variables = jax.eval_shape(lambda: dummy.init(jax.random.PRNGKey(0), jnp.zeros((1,crop,crop,3)), train=False))
tx = make_optimizer(cfg.trainer.optimizer, variables["params"], 10.0)
bank = init_memobank(C, 256, queue_size=4096, class0_size=6144)
state = create_train_state(model, tx, jax.random.PRNGKey(0), (1,crop,crop,3),
    with_teacher=True, bank=bank, prototype=jnp.zeros((C,256,1,256)))

# learnable task: label = quantile bin of a smoothed channel mix
rng = np.random.RandomState(0)
def make_batch(b):
    img = rng.rand(b, crop, crop, 3).astype(np.float32)
    from scipy.ndimage import uniform_filter
    mix = uniform_filter(img @ np.array([0.5, 0.3, 0.2], np.float32), size=(1, 9, 9))
    edges = np.quantile(mix, np.linspace(0, 1, C + 1)[1:-1])
    lab = np.digitize(mix, edges).astype(np.int32)
    return jnp.asarray((img - 0.5) / 0.25), jnp.asarray(lab)

spe = 20
warm = make_semi_warmup_step(cfg, model, tx, spe, mesh)
semi = make_semi_step(cfg, model, tx, spe, mesh)
key = jax.random.PRNGKey(1)
img_l, lab_l = make_batch(4)
img_u, _ = make_batch(4)
losses = []
t0=time.time()
for it in range(200):
    if it == spe:
        state = copy_student_to_teacher(state)
    fn = warm if it < spe else semi
    state, m = fn(state, img_l, lab_l, img_u, key)
    if it % 20 == 0 or it == 199:
        v = float(jax.device_get(m["sup_loss"]))
        losses.append((it, v))
        print(f"it {it}: sup_loss {v:.4f} uns {float(jax.device_get(m['uns_loss'])):.3f} con {float(jax.device_get(m['con_loss'])):.3f} ({time.time()-t0:.0f}s)", flush=True)
val = make_val_step(model_eval, C, 255)
inter, union, _ = val({"params": state.params, "batch_stats": state.batch_stats}, img_l, lab_l)
iou = np.asarray(inter) / (np.asarray(union) + 1e-10)
print("train mIoU:", float(iou.mean()), "per-class:", np.round(iou, 3).tolist())
occ = np.asarray(state.bank.occupancy)
print("bank occupancy:", occ.tolist())
assert losses[-1][1] < losses[0][1] * 0.6, (losses[0], losses[-1])
assert iou.mean() > 1.25 / C, "should beat chance"
print("BURN-IN OK")
