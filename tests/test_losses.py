"""Loss parity vs the reference PyTorch implementations (test oracle only).

compute_unsupervised_loss and the OHEM/CE criteria are deterministic, so
they are compared value-exact.  The contrastive memobank loss involves
torch RNG for anchor/negative sampling; it is tested two ways:
  * a crafted deterministic case (exactly one anchor candidate and one
    bank key per class -> with-replacement sampling has a single outcome)
    compared value-exact against the reference,
  * enqueue/bank-content parity as sets.
"""

import os
import sys

import numpy as np
import pytest

REF = "/root/reference"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REF, "u2pl")), reason="reference not mounted"
)

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from u2pl_tpu.config import ContrastiveCfg  # noqa: E402
from u2pl_tpu.losses.ce import cross_entropy_ignore, supervised_loss  # noqa: E402
from u2pl_tpu.losses.contrastive import compute_contra_memobank_loss  # noqa: E402
from u2pl_tpu.losses.ohem import ohem_cross_entropy  # noqa: E402
from u2pl_tpu.losses.unsup import compute_unsupervised_loss  # noqa: E402
from u2pl_tpu.memobank import MemoryBank, init_memobank  # noqa: E402


@pytest.fixture(scope="module")
def ref():
    if REF not in sys.path:
        sys.path.insert(0, REF)
    # skimage isn't installed; the reference imports it top-level in
    # utils.py for AEL helpers the tested code never calls — stub it.
    import types

    if "skimage" not in sys.modules:
        sk = types.ModuleType("skimage")
        skm = types.ModuleType("skimage.measure")
        skm.label = lambda *a, **k: (_ for _ in ()).throw(NotImplementedError)
        skm.regionprops = skm.label
        sk.measure = skm
        sys.modules["skimage"] = sk
        sys.modules["skimage.measure"] = skm
    # reference loss code hard-codes .cuda(); run it on CPU
    torch.Tensor.cuda = lambda self, *a, **k: self
    import torch.distributed as dist

    if not dist.is_initialized():
        dist.init_process_group(
            "gloo", init_method="tcp://127.0.0.1:29517", rank=0, world_size=1
        )
    import u2pl.utils.loss_helper as lh

    return lh


def _rand_logits(rng, shape):
    return rng.randn(*shape).astype(np.float32)


def test_ce_ignore_matches_torch(ref):
    rng = np.random.RandomState(0)
    logits = _rand_logits(rng, (2, 8, 8, 5))
    labels = rng.randint(0, 5, (2, 8, 8))
    labels[0, :2] = 255
    got = float(cross_entropy_ignore(jnp.asarray(logits), jnp.asarray(labels)))
    want = torch.nn.functional.cross_entropy(
        torch.from_numpy(logits).permute(0, 3, 1, 2),
        torch.from_numpy(labels).long(),
        ignore_index=255,
    ).item()
    assert abs(got - want) < 1e-5


def test_criterion_aux_matches_reference(ref):
    rng = np.random.RandomState(1)
    pred = _rand_logits(rng, (2, 8, 8, 19))
    aux = _rand_logits(rng, (2, 8, 8, 19))
    labels = rng.randint(0, 19, (2, 8, 8))
    labels[1, 3:] = 255
    crit = ref.Criterion(aux_weight=0.4, ignore_index=255)
    want = crit(
        [
            torch.from_numpy(pred).permute(0, 3, 1, 2),
            torch.from_numpy(aux).permute(0, 3, 1, 2),
        ],
        torch.from_numpy(labels).long(),
    ).item()
    got = float(
        supervised_loss(
            jnp.asarray(pred), jnp.asarray(labels), jnp.asarray(aux), aux_weight=0.4
        )
    )
    assert abs(got - want) < 1e-5


@pytest.mark.parametrize("min_kept", [10, 50, 10000])
def test_ohem_matches_reference(ref, min_kept):
    rng = np.random.RandomState(2)
    pred = _rand_logits(rng, (2, 16, 16, 19))
    labels = rng.randint(0, 19, (2, 16, 16))
    labels[0, :4] = 255
    crit = ref.OhemCrossEntropy2dTensor(
        ignore_index=255, thresh=0.7, min_kept=min_kept
    )
    want = crit(
        torch.from_numpy(pred).permute(0, 3, 1, 2), torch.from_numpy(labels).long()
    ).item()
    got = float(
        ohem_cross_entropy(
            jnp.asarray(pred), jnp.asarray(labels), thresh=0.7, min_kept=min_kept
        )
    )
    assert abs(got - want) < 1e-4


def test_ohem_kth_smallest_bit_matches_topk():
    """The radix-selected OHEM threshold is BIT-identical to the top_k
    lowering it replaced, so the kept pixel set is identical too — incl.
    heavy ties, duplicates, and k == n."""
    import jax

    from u2pl_tpu.losses.ohem import _kth_smallest

    rng = np.random.RandomState(7)
    for n, k in [(1000, 100), (5000, 1000), (4096, 4096), (333, 1)]:
        p = rng.rand(n).astype(np.float32)
        p[rng.rand(n) < 0.3] = np.float32(0.5)  # tie block
        p[rng.rand(n) < 0.1] = np.float32(1.0)  # the ignored-pixel filler
        got = np.asarray(_kth_smallest(jnp.asarray(p), k))
        want = np.asarray(-jax.lax.top_k(-jnp.asarray(p), k)[0][k - 1])
        assert got.tobytes() == want.tobytes(), (n, k, got, want)
        kept_got = p <= got
        kept_want = p <= want
        np.testing.assert_array_equal(kept_got, kept_want)


def test_ohem_use_weight_matches_reference(ref):
    rng = np.random.RandomState(21)
    pred = _rand_logits(rng, (2, 12, 12, 19))
    labels = rng.randint(0, 19, (2, 12, 12))
    labels[0, :2] = 255
    crit = ref.OhemCrossEntropy2dTensor(
        ignore_index=255, thresh=0.7, min_kept=50, use_weight=True
    )
    want = crit(
        torch.from_numpy(pred).permute(0, 3, 1, 2), torch.from_numpy(labels).long()
    ).item()
    got = float(
        ohem_cross_entropy(
            jnp.asarray(pred), jnp.asarray(labels), thresh=0.7, min_kept=50,
            use_weight=True,
        )
    )
    assert abs(got - want) < 1e-4


def test_criterion_use_weight_matches_reference(ref):
    # cityscapes-only path: CE + binary-weighted CE added on top — but ONLY
    # in the aux branch; without aux the reference ignores use_weight
    # (loss_helper.py:295-319 quirk)
    rng = np.random.RandomState(22)
    pred = _rand_logits(rng, (2, 10, 10, 19))
    aux = _rand_logits(rng, (2, 10, 10, 19))
    labels = rng.randint(0, 19, (2, 10, 10))
    tp = torch.from_numpy(pred).permute(0, 3, 1, 2)
    ta = torch.from_numpy(aux).permute(0, 3, 1, 2)
    tl = torch.from_numpy(labels).long()

    crit = ref.Criterion(aux_weight=0.4, ignore_index=255, use_weight=True)
    want = crit([tp, ta], tl).item()
    got = float(
        supervised_loss(
            jnp.asarray(pred), jnp.asarray(labels), jnp.asarray(aux),
            aux_weight=0.4, use_weight=True,
        )
    )
    assert abs(got - want) < 1e-4

    # non-aux branch: use_weight must be a no-op
    crit0 = ref.Criterion(aux_weight=0, ignore_index=255, use_weight=True)
    want0 = crit0(tp, tl).item()
    got0 = float(
        supervised_loss(jnp.asarray(pred), jnp.asarray(labels), use_weight=True)
    )
    assert abs(got0 - want0) < 1e-5


def test_rce_loss_matches_reference(ref):
    from u2pl_tpu.losses.rce import compute_rce_loss

    rng = np.random.RandomState(11)
    pred = _rand_logits(rng, (2, 8, 8, 5))
    target = rng.randint(0, 5, (2, 8, 8))
    target[0, :2] = 255
    want = ref.compute_rce_loss(
        torch.from_numpy(pred).permute(0, 3, 1, 2),
        torch.from_numpy(target).long(),
    ).item()
    got = float(compute_rce_loss(jnp.asarray(pred), jnp.asarray(target)))
    assert abs(got - want) < 1e-4


@pytest.mark.parametrize("percent", [20.0, 80.0, 95.0])
def test_unsup_loss_matches_reference(ref, percent):
    rng = np.random.RandomState(3)
    pred = _rand_logits(rng, (2, 16, 16, 5))
    pred_t = _rand_logits(rng, (2, 16, 16, 5))
    target = rng.randint(0, 5, (2, 16, 16))
    target[0, :3] = 255
    want = ref.compute_unsupervised_loss(
        torch.from_numpy(pred).permute(0, 3, 1, 2),
        torch.from_numpy(target).long().clone(),
        percent,
        torch.from_numpy(pred_t).permute(0, 3, 1, 2),
    ).item()
    got = float(
        compute_unsupervised_loss(
            jnp.asarray(pred), jnp.asarray(target), percent, jnp.asarray(pred_t)
        )
    )
    # fp-boundary pixels at the percentile threshold may flip between the
    # float32 on-device path and numpy's float64 percentile; allow for it
    assert abs(got - want) / max(abs(want), 1.0) < 5e-3


def _contra_cfg(**kw):
    base = dict(
        enabled=True,
        negative_high_entropy=True,
        low_rank=1,
        high_rank=3,
        current_class_threshold=0.3,
        current_class_negative_threshold=1.0,
        low_entropy_threshold=20.0,
        num_negatives=3,
        num_queries=4,
        temperature=0.5,
        max_keys_per_class_per_step=64,
    )
    base.update(kw)
    return ContrastiveCfg(**base)


def _ref_contra(ref, cfg, rep, label_l, label_u, prob_l, prob_u, low_m, high_m,
                rep_t, bank_rows, momentum=None, i_iter=0):
    """Run the reference loss on NHWC numpy inputs; returns (loss, memobank)
    or, with a momentum prototype, (loss, memobank, new_prototype)."""
    t = lambda x: torch.from_numpy(np.ascontiguousarray(x))
    nchw = lambda x: t(x).permute(0, 3, 1, 2).contiguous()
    memobank, ptrs, sizes = [], [], []
    num_classes = label_l.shape[-1]
    for c in range(num_classes):
        rows = bank_rows.get(c, np.zeros((0, rep.shape[-1]), np.float32))
        memobank.append([t(rows)])
        ptrs.append(torch.zeros(1, dtype=torch.long))
        sizes.append(30000)
    sizes[0] = 50000
    cfg_d = dict(
        current_class_threshold=cfg.current_class_threshold,
        current_class_negative_threshold=cfg.current_class_negative_threshold,
        low_rank=cfg.low_rank,
        high_rank=cfg.high_rank,
        temperature=cfg.temperature,
        num_queries=cfg.num_queries,
        num_negatives=cfg.num_negatives,
    )
    args = [
        nchw(rep),
        nchw(label_l).long(),
        nchw(label_u).long(),
        nchw(prob_l),
        nchw(prob_u),
        nchw(low_m),
        nchw(high_m),
        cfg_d,
        memobank,
        ptrs,
        sizes,
        nchw(rep_t),
    ]
    if momentum is None:
        new_keys, loss = ref.compute_contra_memobank_loss(*args)
        return float(loss.item()), memobank
    proto, new_keys, loss = ref.compute_contra_memobank_loss(
        *args, momentum_prototype=t(momentum), i_iter=i_iter
    )
    return float(loss.item()), memobank, proto.numpy()


def test_ranks_desc_matches_stable_sort():
    """The compare-count rank lowering must equal torch.sort(descending)
    positions (i.e. a stable double argsort), including on exact ties —
    reference loss_helper.py:91-97 consumes these ranks for the negative
    class-window masks."""
    import jax.numpy as jnp

    from u2pl_tpu.losses.contrastive import _ranks_desc

    rng = np.random.RandomState(11)
    p = rng.rand(257, 21).astype(np.float32)
    # force ties: quantize a block, duplicate some columns
    p[:100] = np.round(p[:100] * 4) / 4
    p[:, 7] = p[:, 3]
    p[:, 20] = p[:, 0]
    want = np.argsort(np.argsort(-p, axis=-1, kind="stable"), axis=-1, kind="stable")
    got = np.asarray(_ranks_desc(jnp.asarray(p)))
    np.testing.assert_array_equal(got, want)


def test_contrastive_deterministic_case(ref):
    """One anchor candidate + one bank key per class => sampling is
    deterministic; values must match the reference exactly."""
    rng = np.random.RandomState(4)
    C, h, w, F = 4, 4, 4, 8
    rep = rng.randn(2, h, w, F).astype(np.float32)
    rep_t = rng.randn(2, h, w, F).astype(np.float32)

    # labels: one pixel of each class in each image
    lab_l = np.zeros((1, h, w), np.int64)
    lab_u = np.zeros((1, h, w), np.int64)
    for c in range(C):
        lab_l[0, 0, c] = c
        lab_u[0, 1, c] = c
    onehot = lambda lab: np.eye(C, dtype=np.float32)[lab]
    label_l, label_u = onehot(lab_l), onehot(lab_u)

    # teacher probs: 0.9 on the label class at the designated anchor pixels,
    # uniform elsewhere (below delta_p=0.3 for C=4 -> 0.25)
    prob = np.full((2, h, w, C), 1.0 / C, np.float32)
    for c in range(C):
        prob[0, 0, c] = 0.1 / (C - 1)
        prob[0, 0, c, c] = 0.9
        prob[1, 1, c] = 0.1 / (C - 1)
        prob[1, 1, c, c] = 0.9
    prob_l, prob_u = prob[:1], prob[1:]

    # low mask only on the labeled anchor pixels (ONE candidate per class,
    # so with-replacement sampling is deterministic); high mask empty
    low_m = np.zeros((2, h, w, 1), np.float32)
    low_m[0, 0, :C, 0] = 1
    high_m = np.zeros((2, h, w, 1), np.float32)

    bank_rows = {c: rng.randn(1, F).astype(np.float32) for c in range(C)}
    cfg = _contra_cfg()

    want, _ = _ref_contra(
        ref, cfg, rep, label_l, label_u, prob_l, prob_u, low_m, high_m, rep_t,
        bank_rows,
    )

    bank = init_memobank(C, F, dtype=jnp.float32)
    keys = bank.keys
    for c in range(C):
        keys = keys.at[c, 0].set(bank_rows[c][0])
    bank = MemoryBank(keys, bank.ptr, bank.occupancy + 1, bank.sizes)

    new_bank, got = compute_contra_memobank_loss(
        jnp.asarray(rep),
        jnp.asarray(label_l),
        jnp.asarray(label_u),
        jnp.asarray(prob_l),
        jnp.asarray(prob_u),
        jnp.asarray(low_m),
        jnp.asarray(high_m),
        cfg,
        bank,
        jnp.asarray(rep_t),
        jax.random.PRNGKey(0),
    )
    got = float(got)
    assert abs(got - want) < 5e-4, (got, want)
    # nothing enqueued (high mask empty)
    np.testing.assert_array_equal(np.asarray(new_bank.occupancy), [1] * C)


def _deterministic_contra_inputs(C=4, h=4, w=4, F=8, seed=4):
    """One anchor candidate + one bank key per class (sampling is forced
    deterministic); every class valid so the prefix-indexing quirk is
    identity.  Shared by the plain and anchor_ema deterministic cases."""
    rng = np.random.RandomState(seed)
    rep = rng.randn(2, h, w, F).astype(np.float32)
    rep_t = rng.randn(2, h, w, F).astype(np.float32)
    lab_l = np.zeros((1, h, w), np.int64)
    lab_u = np.zeros((1, h, w), np.int64)
    for c in range(C):
        lab_l[0, 0, c] = c
        lab_u[0, 1, c] = c
    onehot = lambda lab: np.eye(C, dtype=np.float32)[lab]
    label_l, label_u = onehot(lab_l), onehot(lab_u)
    prob = np.full((2, h, w, C), 1.0 / C, np.float32)
    for c in range(C):
        prob[0, 0, c] = 0.1 / (C - 1)
        prob[0, 0, c, c] = 0.9
        prob[1, 1, c] = 0.1 / (C - 1)
        prob[1, 1, c, c] = 0.9
    low_m = np.zeros((2, h, w, 1), np.float32)
    low_m[0, 0, :C, 0] = 1
    high_m = np.zeros((2, h, w, 1), np.float32)
    bank_rows = {c: rng.randn(1, F).astype(np.float32) for c in range(C)}
    return rep, rep_t, label_l, label_u, prob[:1], prob[1:], low_m, high_m, bank_rows


def _bank_from_rows(C, F, bank_rows):
    bank = init_memobank(C, F, dtype=jnp.float32)
    keys = bank.keys
    for c in range(C):
        keys = keys.at[c, 0].set(bank_rows[c][0])
    return MemoryBank(keys, bank.ptr, bank.occupancy + 1, bank.sizes)


@pytest.mark.parametrize("zero_proto", [True, False])
def test_contrastive_anchor_ema(ref, zero_proto):
    """anchor_ema path (reference loss_helper.py:209-218): positives blend
    with the momentum prototype of the bank class slot (decay
    min(1 - 1/i_iter, 0.999)), the returned prototype is written back only
    at active class slots, and an all-zero prototype skips the blend but
    still records the fresh positives."""
    C, h, w, F, Q = 4, 4, 4, 8, 4
    (rep, rep_t, label_l, label_u, prob_l, prob_u, low_m, high_m,
     bank_rows) = _deterministic_contra_inputs(C, h, w, F)
    rng = np.random.RandomState(9)
    i_iter = 37
    momentum = (
        np.zeros((C, Q, 1, F), np.float32)
        if zero_proto
        else rng.randn(C, Q, 1, F).astype(np.float32)
    )

    cfg = _contra_cfg(num_queries=Q)
    want, _, want_proto = _ref_contra(
        ref, cfg, rep, label_l, label_u, prob_l, prob_u, low_m, high_m, rep_t,
        bank_rows, momentum=momentum, i_iter=i_iter,
    )

    bank = _bank_from_rows(C, F, bank_rows)
    new_proto, new_bank, got = compute_contra_memobank_loss(
        jnp.asarray(rep),
        jnp.asarray(label_l),
        jnp.asarray(label_u),
        jnp.asarray(prob_l),
        jnp.asarray(prob_u),
        jnp.asarray(low_m),
        jnp.asarray(high_m),
        cfg,
        bank,
        jnp.asarray(rep_t),
        jax.random.PRNGKey(0),
        prototype=jnp.asarray(momentum),
        i_iter=jnp.asarray(i_iter, jnp.int32),
    )
    assert abs(float(got) - want) < 5e-4, (float(got), want)
    got_proto = np.asarray(new_proto)
    assert got_proto.shape == want_proto.shape == (C, Q, 1, F)
    np.testing.assert_allclose(got_proto, want_proto, rtol=1e-5, atol=1e-6)
    # every class is active here, so every slot must have been written
    assert (np.abs(want_proto).sum(axis=(1, 2, 3)) > 0).all()


def test_contrastive_anchor_ema_inactive_class_not_written(ref):
    """A class with an EMPTY bank is skipped (reference :175-187 continue)
    BEFORE the prototype write: its slot must stay zero on both sides."""
    C, h, w, F, Q = 4, 4, 4, 8, 4
    (rep, rep_t, label_l, label_u, prob_l, prob_u, low_m, high_m,
     bank_rows) = _deterministic_contra_inputs(C, h, w, F)
    bank_rows.pop(2)  # class 2: anchors exist but no negatives in the bank
    rng = np.random.RandomState(10)
    momentum = rng.randn(C, Q, 1, F).astype(np.float32)
    i_iter = 37

    cfg = _contra_cfg(num_queries=Q)
    want, _, want_proto = _ref_contra(
        ref, cfg, rep, label_l, label_u, prob_l, prob_u, low_m, high_m, rep_t,
        bank_rows, momentum=momentum, i_iter=i_iter,
    )

    bank = init_memobank(C, F, dtype=jnp.float32)
    keys = bank.keys
    occ = bank.occupancy
    for c, rows in bank_rows.items():
        keys = keys.at[c, 0].set(rows[0])
        occ = occ.at[c].add(1)
    bank = MemoryBank(keys, bank.ptr, occ, bank.sizes)

    new_proto, _, got = compute_contra_memobank_loss(
        jnp.asarray(rep),
        jnp.asarray(label_l),
        jnp.asarray(label_u),
        jnp.asarray(prob_l),
        jnp.asarray(prob_u),
        jnp.asarray(low_m),
        jnp.asarray(high_m),
        cfg,
        bank,
        jnp.asarray(rep_t),
        jax.random.PRNGKey(0),
        prototype=jnp.asarray(momentum),
        i_iter=jnp.asarray(i_iter, jnp.int32),
    )
    assert abs(float(got) - want) < 5e-4, (float(got), want)
    got_proto = np.asarray(new_proto)
    np.testing.assert_array_equal(got_proto[2], 0.0)
    np.testing.assert_array_equal(want_proto[2], 0.0)
    np.testing.assert_allclose(got_proto, want_proto, rtol=1e-5, atol=1e-6)


def test_contrastive_enqueue_parity(ref):
    """Enqueued negative-key SETS per class must match the reference."""
    rng = np.random.RandomState(5)
    C, h, w, F = 5, 6, 6, 8
    rep = rng.randn(4, h, w, F).astype(np.float32)
    rep_t = rng.randn(4, h, w, F).astype(np.float32)
    lab_l = rng.randint(0, C, (2, h, w))
    lab_u = rng.randint(0, C, (2, h, w))
    onehot = lambda lab: np.eye(C, dtype=np.float32)[lab]
    label_l, label_u = onehot(lab_l), onehot(lab_u)
    logits = rng.randn(4, h, w, C).astype(np.float32)
    prob = np.exp(logits) / np.exp(logits).sum(-1, keepdims=True)
    prob_l, prob_u = prob[:2], prob[2:]
    low_m = (rng.rand(4, h, w, 1) > 0.5).astype(np.float32)
    high_m = (rng.rand(4, h, w, 1) > 0.3).astype(np.float32)

    cfg = _contra_cfg()
    _, ref_bank = _ref_contra(
        ref, cfg, rep, label_l, label_u, prob_l, prob_u, low_m, high_m, rep_t, {}
    )

    bank = init_memobank(C, F, dtype=jnp.float32)
    new_bank, _ = compute_contra_memobank_loss(
        jnp.asarray(rep),
        jnp.asarray(label_l),
        jnp.asarray(label_u),
        jnp.asarray(prob_l),
        jnp.asarray(prob_u),
        jnp.asarray(low_m),
        jnp.asarray(high_m),
        cfg,
        bank,
        jnp.asarray(rep_t),
        jax.random.PRNGKey(1),
    )
    for c in range(C):
        want_rows = ref_bank[c][0].numpy()
        occ = int(new_bank.occupancy[c])
        got_rows = np.asarray(new_bank.keys[c, :occ])
        assert occ == want_rows.shape[0], (c, occ, want_rows.shape)
        if occ:
            got_sorted = got_rows[np.lexsort(got_rows.T)]
            want_sorted = want_rows[np.lexsort(want_rows.T)]
            np.testing.assert_allclose(got_sorted, want_sorted, atol=1e-5)


def test_contrastive_multichip_grad_matches_torch_semantics():
    """Torch's in-place dist.all_reduce is autograd-invisible: each rank
    backprops grad(local_loss / W) while the forward VALUE becomes the
    cross-rank mean.  On a 2-device mesh the per-shard gradient must be
    exactly (standalone local gradient) / W, and the value the mean of the
    standalone local losses (a differentiable pmean would instead scale the
    post-pmean effective gradient by W^2 — ADVICE.md round 1)."""
    from jax.sharding import Mesh, PartitionSpec as P

    rng = np.random.RandomState(7)
    C, h, w, F = 4, 4, 4, 8
    W = 2
    cfg = _contra_cfg()
    key = jax.random.PRNGKey(3)

    # per-device shards; high mask empty so no enqueue -> bank identical
    # between standalone and sharded runs
    reps, rep_ts, labels_l, labels_u, probs_l, probs_u, lows = [], [], [], [], [], [], []
    onehot = lambda lab: np.eye(C, dtype=np.float32)[lab]
    for d in range(W):
        reps.append(rng.randn(2, h, w, F).astype(np.float32))
        rep_ts.append(rng.randn(2, h, w, F).astype(np.float32))
        labels_l.append(onehot(rng.randint(0, C, (1, h, w))))
        labels_u.append(onehot(rng.randint(0, C, (1, h, w))))
        logits = rng.randn(2, h, w, C).astype(np.float32)
        p = np.exp(logits) / np.exp(logits).sum(-1, keepdims=True)
        probs_l.append(p[:1])
        probs_u.append(p[1:])
        lows.append((rng.rand(2, h, w, 1) > 0.4).astype(np.float32))
    high = np.zeros((2, h, w, 1), np.float32)

    bank_np = rng.randn(C, 8, F).astype(np.float32)

    def make_bank():
        b = init_memobank(C, F, dtype=jnp.float32)
        keys = b.keys.at[:, :8].set(jnp.asarray(bank_np))
        return MemoryBank(keys, b.ptr, b.occupancy + 8, b.sizes)

    def local_loss(rep, ll, lu, pl, pu, lm, axis_name):
        _, loss = compute_contra_memobank_loss(
            rep, jnp.asarray(ll), jnp.asarray(lu), jnp.asarray(pl),
            jnp.asarray(pu), jnp.asarray(lm), jnp.asarray(high), cfg,
            make_bank(), jnp.asarray(rep_ts[0] * 0 + 1.0), key,
            axis_name=axis_name,
        )
        return loss

    # standalone per-device losses + grads (axis_name=None)
    want_vals, want_grads = [], []
    for d in range(W):
        f = lambda r, dd=d: local_loss(
            r, labels_l[dd], labels_u[dd], probs_l[dd], probs_u[dd], lows[dd], None
        )
        v, g = jax.value_and_grad(f)(jnp.asarray(reps[d]))
        want_vals.append(float(v))
        want_grads.append(np.asarray(g))

    # sharded run over 2 devices
    mesh = Mesh(np.asarray(jax.devices("cpu")[:W]), ("data",))

    def sharded_fn(rep, ll, lu, pl, pu, lm):
        def f(r):
            return local_loss(r, ll, lu, pl, pu, lm, "data")
        return jax.value_and_grad(f)(rep)

    stack = lambda xs: jnp.asarray(np.concatenate(xs, axis=0))
    vg = jax.jit(
        jax.shard_map(
            sharded_fn,
            mesh=mesh,
            in_specs=(P("data"),) * 6,
            out_specs=(P(), P("data")),
            check_vma=False,
        )
    )
    got_val, got_grad = vg(
        stack(reps), stack(labels_l), stack(labels_u),
        stack(probs_l), stack(probs_u), stack(lows),
    )

    assert abs(float(got_val) - np.mean(want_vals)) < 1e-5, (
        float(got_val), want_vals)
    got_grad = np.asarray(got_grad)
    for d in range(W):
        np.testing.assert_allclose(
            got_grad[d * 2:(d + 1) * 2], want_grads[d] / W, rtol=1e-5, atol=1e-7
        )
