"""Long-horizon convergence equivalence vs the reference trainer.

The golden step/trajectory tests prove the first steps match bit-tight;
this proves the two implementations CONVERGE TO THE SAME PLACE: both
frameworks run hundreds of steps from converter-synced weights on the
identical batch sequence (tests/convergence_common.py) — each with its
own stochastic machinery, no determinism patches — and the final
train-pool mIoU must agree within the measured stochastic seed spread.

Tolerances are calibrated from the committed 2-seed artifact
(docs/ACCURACY.md, docs/convergence_runs.json): final mIoU varies by
0.14-0.26 across seeds WITHIN each framework on this 8-image pool, while
the cross-framework mean gap is +0.048 (pascal, 200 steps) / +0.005
(city, 500 steps).  The pascal test asserts full equality at 200 steps;
the city family converges ~3x slower (OHEM trains on only the 2000
hardest pixels), so its 200-step test asserts matched learning DYNAMICS
(supervised-loss decline) and defers the at-convergence equality to the
500-step artifact — rerunnable via
`python tools/convergence_ab.py --steps_city 500 --seeds 2`.

Reference loop: train_semi.py:272-592.
"""

import os

import numpy as np
import pytest

REF = "/root/reference"
pytestmark = [
    pytest.mark.slow,
    pytest.mark.skipif(
        not os.path.isdir(os.path.join(REF, "u2pl")),
        reason="reference not mounted",
    ),
]

torch = pytest.importorskip("torch")

from convergence_common import (  # noqa: E402
    make_pool,
    make_torch_models,
    miou_np,
    run_ours,
    run_torch,
)

SPE = 25
N_STEPS = 200  # 8 epochs: warmup, copy epoch, 6 EMA/annealing epochs


def _run_both(variant):
    pool = make_pool(seed=42, n_labeled=8, n_unlabeled=8)
    raw, student, teacher = make_torch_models(variant, N_STEPS // SPE, SPE)
    # ours first: run_ours only READS the torch state dicts; run_torch
    # then trains (and mutates) the same modules
    _, losses_j, predict_j = run_ours(
        variant, pool, N_STEPS, SPE, student, teacher
    )
    _, _, losses_t, predict_t = run_torch(
        variant, pool, N_STEPS, SPE, raw, student, teacher
    )
    img_l, lab_l = pool[0], pool[1]
    m_j = miou_np(predict_j(img_l), lab_l)
    m_t = miou_np(predict_t(img_l), lab_l)
    return losses_j, losses_t, m_j, m_t


def _window(losses, lo, hi, key="sup_loss"):
    return float(np.mean([d[key] for d in losses[lo:hi]]))


def test_pascal_converges_to_same_place():
    losses_j, losses_t, m_j, m_t = _run_both("pascal")

    # both sides must have actually learned the pool (random ~ 0.11;
    # observed seeds: ours 0.845/0.884, torch 0.746/0.887)
    assert m_t > 0.6, f"torch oracle failed to learn: train mIoU {m_t:.3f}"
    assert m_j > 0.6, f"ours failed to learn: train mIoU {m_j:.3f}"
    # ... and ended in the same place, within the measured seed spread
    # (0.141 within torch itself) plus margin
    assert abs(m_j - m_t) < 0.25, (
        f"final train mIoU diverged beyond seed spread: ours {m_j:.4f} vs "
        f"torch {m_t:.4f}"
    )

    # late-window supervised losses must both be small and close
    # (observed: ours 0.27, torch 0.41)
    lj = _window(losses_j, -25, None)
    lt = _window(losses_t, -25, None)
    assert lj < 0.7 and lt < 0.7, (lj, lt)
    assert abs(lj - lt) < 0.4, f"late sup loss: ours {lj:.4f} torch {lt:.4f}"


def test_city_dynamics_track():
    losses_j, losses_t, m_j, m_t = _run_both("city")

    # at 200 steps the OHEM family has not converged (observed train mIoU
    # ours 0.25 / torch 0.04 — ordering noise, see docs/ACCURACY.md), so
    # assert matched learning DYNAMICS: supervised loss declined
    # substantially on both sides from the same start
    first_j = _window(losses_j, 25, 50)   # first semi epoch
    first_t = _window(losses_t, 25, 50)
    late_j = _window(losses_j, -25, None)
    late_t = _window(losses_t, -25, None)
    assert abs(first_j - first_t) < 0.6, (first_j, first_t)
    # observed declines at seed 0: ours 2.70->1.91 (29%), torch
    # 2.85->2.43 (15%); bound at 8% leaves seed headroom on the slower side
    assert late_j < 0.92 * first_j, f"ours did not learn: {first_j}->{late_j}"
    assert late_t < 0.92 * first_t, f"torch did not learn: {first_t}->{late_t}"
    # and neither side collapsed to NaN/zero predictions
    assert np.isfinite([late_j, late_t]).all()
    assert m_j > 0.02 and m_t > 0.02, (m_j, m_t)
