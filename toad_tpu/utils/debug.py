"""Numerical sanitizers: checkified training and NaN trapping.

SURVEY §5's race-detection/sanitizer row maps to *numerical* sanitizers on
TPU — there is no shared-memory racing in a jitted XLA program, but there
are NaN/Inf blowups and out-of-range labels, which the reference can only
surface as a cryptic CUDA assert or a silently-wrong loss (its CE calls,
``utils/core_utils_mtl_concat.py:213-214``, never validate label range).

Two tools, both opt-in (zero cost when off):

- :func:`enable_debug_nans` — global ``jax_debug_nans``: every jitted
  computation re-runs un-jitted on NaN and pinpoints the producing op.
- :func:`make_checked_step` — a drop-in replacement for
  :func:`toad_tpu.train.loop.make_train_step` instrumented with
  ``jax.experimental.checkify``: float checks (NaN/Inf at the producing
  primitive), index checks (gather/scatter bounds), and explicit loud
  checks that labels/site/sex are in range. Raises ``JaxRuntimeError``
  with the failing check's location instead of training on garbage.

Enabled from the training CLI via ``--debug_checks`` / ``--debug_nans``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax
from jax.experimental import checkify

from toad_tpu.models.toad_mil import ToadMIL
from toad_tpu.train.loop import make_loss_fn


def enable_debug_nans(enable: bool = True) -> None:
    """Trap NaNs everywhere (slow: disables donation-friendly fast paths)."""
    jax.config.update("jax_debug_nans", enable)


def make_checked_step(model: ToadMIL, tx: optax.GradientTransformation, cls_w: float, site_w: float):
    """Checkified analog of ``make_train_step``. Same call signature and
    return value; raises on NaN/Inf/out-of-range instead of proceeding.

    No buffer donation (checkify error state aliases would fight it) — this
    is a debugging mode, not the production step.
    """
    loss_fn = make_loss_fn(model, cls_w, site_w)
    n_classes = model.config.n_classes
    n_site = model.config.n_site_classes

    def step_body(params, opt_state, rng, batch):
        label, site, sex = batch["label"], batch["site"], batch["sex"]
        bag_mask = batch["bag_mask"].astype(bool)
        checkify.check(
            jnp.all((~bag_mask) | ((label >= 0) & (label < n_classes))),
            "origin label out of range [0, {n}): min {lo}, max {hi}",
            n=jnp.int32(n_classes), lo=label.min(), hi=label.max(),
        )
        checkify.check(
            jnp.all((~bag_mask) | ((site >= 0) & (site < n_site))),
            "site label out of range [0, {n}): min {lo}, max {hi}",
            n=jnp.int32(n_site), lo=site.min(), hi=site.max(),
        )
        checkify.check(
            jnp.all((~bag_mask) | (sex == 0) | (sex == 1)),
            "sex must be 0/1: min {lo}, max {hi}",
            lo=sex.min(), hi=sex.max(),
        )
        checkify.check(jnp.all(jnp.isfinite(batch["features"])), "non-finite feature values in batch")
        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(params, batch, rng)
        checkify.check(jnp.isfinite(loss), "loss is non-finite: {l}", l=loss)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        fmask = batch["bag_mask"]
        metrics = {
            "loss": loss,
            "cls_loss_sum": aux["cls_loss"] * fmask.sum(),
            "site_loss_sum": aux["site_loss"] * fmask.sum(),
            "n_bags": fmask.sum(),
            "cls_correct": ((aux["y_hat"] == batch["label"]) * fmask).sum(),
            "site_correct": ((aux["site_hat"] == batch["site"]) * fmask).sum(),
            "y_hat": aux["y_hat"],
            "site_hat": aux["site_hat"],
        }
        return params, opt_state, metrics

    # no index_checks: checkify's gather instrumentation breaks on optax's
    # take_along_axis(mode="fill") in this jax version, and the explicit
    # range checks above already cover every integer input
    errors = checkify.float_checks | checkify.user_checks
    checked = jax.jit(checkify.checkify(step_body, errors=errors))

    def step(params, opt_state, rng, batch):
        err, out = checked(params, opt_state, rng, batch)
        checkify.check_error(err)  # raises JaxRuntimeError with location
        return out

    return step
