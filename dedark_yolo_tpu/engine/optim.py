"""Functional SGD(nesterov)/AdamW with per-group LR, matching torch semantics.

The reference builds 3 param groups — biases (warmup to warmup_bias_lr), norm
scales (no weight decay), weights (decay) — and ramps lr/momentum per step with
np.interp during warmup (ultralytics/engine/trainer.py:317-327, 611-665). Here the
optimizer is a pure function whose hyperparameters (lr_bias, lr, momentum) are
*traced jit inputs*, so the schedule never retraces the step, and gradient
accumulation to nbs (trainer.py:253-255,340-345) is a device-side accumulator
applied every k-th call under lax.cond.

Torch-parity notes:
  - SGD: buf = mu * buf + g_wd; nesterov update = g_wd + mu * buf; wd is coupled
    (added to the gradient) exactly like torch.optim.SGD;
  - AdamW: decoupled weight decay (p -= lr * wd * p), betas = (momentum, 0.999).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class OptState(NamedTuple):
    step: jnp.ndarray          # applied-update count (int32)
    micro: jnp.ndarray         # micro-step count within accumulation window
    acc: dict                  # accumulated grads
    buf: dict                  # SGD momentum / Adam m
    buf2: dict                 # Adam v (zeros for SGD)


def label_params(params):
    """'bias' / 'norm' (ndim<=1 non-bias) / 'weight' labels per leaf."""
    def lab(path, value):
        leaf = str(getattr(path[-1], "key", "")) if path else ""
        if leaf == "bias":
            return "bias"
        if value.ndim <= 1:
            return "norm"
        return "weight"
    return jax.tree_util.tree_map_with_path(lab, params)


def init_opt_state(params):
    zeros = lambda: jax.tree_util.tree_map(jnp.zeros_like, params)
    return OptState(step=jnp.zeros((), jnp.int32), micro=jnp.zeros((), jnp.int32),
                    acc=zeros(), buf=zeros(), buf2=zeros())


def opt_update(params, grads, state: OptState, labels, *, kind="sgd",
               lr_bias, lr, momentum, weight_decay=0.0005, accumulate=1,
               clip_norm=10.0, nesterov=True, b2=0.999, eps=1e-8):
    """One optimizer call. Applies an update every `accumulate` calls.

    lr_bias / lr / momentum are traced scalars (pass fresh values per step).
    Returns (new_params, new_state, applied) — `applied` is a traced bool, True
    on the calls where the accumulated update was actually applied (callers
    gate EMA on it, reference trainer.py optimizer_step).

    Accumulated grads are SUMMED, not averaged: the loss is pre-scaled by
    batch_size (loss.sum()*bs, reference loss.py:193), so the summed gradient
    over `accumulate` micro-batches is the gradient of an nbs-sized batch —
    the reference never divides (trainer.py:340-345). Callers compensate
    weight_decay by batch*accumulate/nbs (reference trainer.py:249).
    """
    acc = jax.tree_util.tree_map(lambda a, g: a + g, state.acc, grads)
    micro = state.micro + 1
    do_apply = micro >= accumulate

    def apply_fn(operand):
        params, acc, buf, buf2, step = operand
        g = acc
        # global grad-norm clip at 10.0 (reference trainer.py:459-467)
        gnorm = jnp.sqrt(sum(jnp.sum(x.astype(jnp.float32) ** 2)
                             for x in jax.tree_util.tree_leaves(g)))
        scale = jnp.minimum(1.0, clip_norm / (gnorm + 1e-12))
        g = jax.tree_util.tree_map(lambda x: x * scale, g)
        step = step + 1

        def upd(label, p, gi, b, b2_):
            # label is a static Python string -> resolved at trace time
            lr_g = lr_bias if label == "bias" else lr
            wd = weight_decay if label == "weight" else 0.0
            if kind == "sgd":
                gw = gi + wd * p
                nb = momentum * b + gw
                delta = gw + momentum * nb if nesterov else nb
                return p - lr_g * delta, nb, b2_
            else:  # adamw
                m = momentum * b + (1 - momentum) * gi
                v = b2 * b2_ + (1 - b2) * gi * gi
                mhat = m / (1 - momentum ** step.astype(jnp.float32))
                vhat = v / (1 - b2 ** step.astype(jnp.float32))
                newp = p * (1 - lr_g * wd) - lr_g * mhat / (jnp.sqrt(vhat) + eps)
                return newp, m, v

        flat_p, treedef = jax.tree_util.tree_flatten(params)
        flat_g = jax.tree_util.tree_leaves(g)
        flat_b = jax.tree_util.tree_leaves(buf)
        flat_b2 = jax.tree_util.tree_leaves(buf2)
        flat_l = jax.tree_util.tree_leaves(labels)
        outs = [upd(l, p, gi, b, b2_) for l, p, gi, b, b2_ in
                zip(flat_l, flat_p, flat_g, flat_b, flat_b2)]
        new_p = jax.tree_util.tree_unflatten(treedef, [o[0] for o in outs])
        new_b = jax.tree_util.tree_unflatten(treedef, [o[1] for o in outs])
        new_b2 = jax.tree_util.tree_unflatten(treedef, [o[2] for o in outs])
        zero_acc = jax.tree_util.tree_map(jnp.zeros_like, acc)
        return new_p, zero_acc, new_b, new_b2, step

    def noop_fn(operand):
        return operand

    params, acc, buf, buf2, step = jax.lax.cond(
        do_apply, apply_fn, noop_fn,
        (params, acc, state.buf, state.buf2, state.step))
    micro = jnp.where(do_apply, 0, micro)
    return (params,
            OptState(step=step, micro=micro, acc=acc, buf=buf, buf2=buf2),
            do_apply)
