"""Teacher->student distillation for the turbo architecture track.

No reference counterpart (the turbo family itself is the TPU-specific architecture
route past the parity graph's bf16 roofline — see ``models/turbo.py``).  The closest
reference idiom is the two-phase curriculum of ``split_training.py:110-174``, where a
trained pair network's depth supervises the single-image network; here a trained
``depth4`` DispNet supervises a ``TurboDepthNet`` student that reproduces its full
4-scale sigmoid*4 disparity pyramid, so the student drops into every depth4 serving
surface unchanged.

The distillation loss is a per-scale L1 between the student and teacher pyramids
(both emit float32 disparities in [min_disp, scale + min_disp]), weighted per scale
like the reference's multi-scale depth losses (``w/2**s`` — ``my_losses.py:65-96``).
"""
from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp

from tf_depth_estimation_tpu.train.steps import _forward, _make_step


def distill_loss(student_preds, teacher_preds, scale_weights: Sequence[float]):
    """Weighted per-scale mean-L1 between two disparity pyramids of equal shapes."""
    assert len(student_preds) == len(teacher_preds)
    comps = {}
    total = 0.0
    for s, (sp, tp, w) in enumerate(zip(student_preds, teacher_preds, scale_weights)):
        assert sp.shape == tp.shape, (s, sp.shape, tp.shape)
        li = jnp.mean(jnp.abs(sp - jax.lax.stop_gradient(tp)))
        comps[f"distill_l1_s{s}"] = li
        total = total + w * li
    comps["total_loss"] = total
    return total, comps


def make_distill_step(teacher_apply, scale_weights: Sequence[float] = (1.0, 0.5, 0.25, 0.125),
                      *, remat: bool = False):
    """Returns ``step(state, teacher_variables, images) -> (state, metrics)``.

    ``state`` is the student's TrainState; the teacher runs frozen in eval mode inside
    the same jitted graph (its variables are an explicit argument, not a baked-in
    constant, so one compilation serves any teacher checkpoint).
    """

    def loss_of_params(state, teacher_variables, images, params):
        t_preds = teacher_apply(teacher_variables, images, train=False)
        t_preds = [p.astype(jnp.float32) for p in t_preds[: len(scale_weights)]]
        s_preds, new_stats = _forward(state, params, images, train=True)
        total, comps = distill_loss(
            s_preds[: len(t_preds)], t_preds, scale_weights[: len(t_preds)])
        return total, (comps, new_stats)

    return _make_step(loss_of_params, remat=remat)


def make_distill_eval(teacher_apply):
    """Returns ``eval(state, teacher_variables, images) -> metrics`` (no update).

    Metrics: full-resolution mean-abs error and abs-rel of the student vs the teacher
    (the BASELINE accuracy metric, with the teacher as the reference)."""

    def eval_step(state, teacher_variables, images):
        t_full = teacher_apply(teacher_variables, images, train=False)[0].astype(
            jnp.float32)
        s_full, _ = _forward(state, state.params, images, train=False,
                             extra=(), )
        s_full = s_full[0]
        err = jnp.abs(s_full - t_full)
        return {
            "mae_vs_teacher": jnp.mean(err),
            "absrel_vs_teacher": jnp.mean(err / jnp.maximum(t_full, 1e-3)),
        }

    return eval_step
