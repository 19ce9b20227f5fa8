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


class FlatSpec(NamedTuple):
    """Static layout of a param tree flattened into one fp32 vector.

    treedef/shapes/sizes/offsets are Python-side (hashable) metadata used at
    trace time only; the masks here are HOST numpy arrays consumed once by
    fused_init_opt_state — they must never be closure-captured inside jit
    (a 50M-element constant embed fails on the TPU backend). Precomputing
    per-element bias/weight-decay masks turns the per-leaf label dispatch
    (~500 tiny padded elementwise kernels on TPU) into one big fused kernel.
    """
    treedef: object
    shapes: tuple
    sizes: tuple
    offsets: tuple
    n: int
    bias_mask: object          # np.bool_ (n,): True where the leaf is a bias
    wd_mask: object            # np.bool_ (n,): True where weight decay applies


class FusedOptState(NamedTuple):
    """Flat optimizer state. The two masks live IN the state so they enter
    the jitted step as traced (donated) arguments and are returned unchanged
    — XLA aliases them in-place, costing nothing per step — instead of being
    embedded as giant program constants."""
    step: jnp.ndarray          # applied-update count (int32)
    micro: jnp.ndarray         # micro-step count within accumulation window
    acc: jnp.ndarray           # accumulated grads, flat fp32 (n,)
    buf: jnp.ndarray           # SGD momentum / Adam m, flat fp32 (n,)
    buf2: jnp.ndarray          # Adam v (zeros for SGD), flat fp32 (n,)
    bias_mask: jnp.ndarray     # bool (n,)
    wd_mask: jnp.ndarray       # bool (n,)


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


# --------------------------------------------------------------------- fused
# One-flat-buffer variants of the above. Numerically identical math (same
# coupled/decoupled wd, nesterov, bias correction); the only ordering change
# is the grad-norm reduction running over one vector instead of summing
# ~500 per-leaf partial sums, which differs by float addition order only.

def fused_opt_available():
    return True


def flatten_for_opt(params, labels) -> FlatSpec:
    """Build the static flat layout + per-element lr/wd masks for `params`."""
    import numpy as np
    leaves, treedef = jax.tree_util.tree_flatten(params)
    labs = jax.tree_util.tree_leaves(labels)
    shapes = tuple(tuple(l.shape) for l in leaves)
    sizes = tuple(int(l.size) for l in leaves)
    offsets, off = [], 0
    for s in sizes:
        offsets.append(off)
        off += s
    n = off
    bias = np.zeros(n, bool)
    wd = np.zeros(n, bool)
    for lab, o, s in zip(labs, offsets, sizes):
        if lab == "bias":
            bias[o:o + s] = True
        elif lab == "weight":
            wd[o:o + s] = True
    return FlatSpec(treedef=treedef, shapes=shapes, sizes=sizes,
                    offsets=tuple(offsets), n=n, bias_mask=bias, wd_mask=wd)


def flat_spec(tree) -> FlatSpec:
    """Label-free FlatSpec (layout only) — for flattening non-param trees
    such as batch_stats for the fused EMA (masks stay empty/unused)."""
    import numpy as np
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    shapes = tuple(tuple(l.shape) for l in leaves)
    sizes = tuple(int(l.size) for l in leaves)
    offsets, off = [], 0
    for s in sizes:
        offsets.append(off)
        off += s
    empty = np.zeros(off, bool)
    return FlatSpec(treedef=treedef, shapes=shapes, sizes=sizes,
                    offsets=tuple(offsets), n=off,
                    bias_mask=empty, wd_mask=empty)


def tree_to_flat(tree, spec: FlatSpec):
    leaves = jax.tree_util.tree_leaves(tree)
    return jnp.concatenate(
        [l.astype(jnp.float32).reshape(-1) for l in leaves])


def flat_to_tree(flat, spec: FlatSpec):
    leaves = [flat[o:o + s].reshape(shape) for o, s, shape in
              zip(spec.offsets, spec.sizes, spec.shapes)]
    return jax.tree_util.tree_unflatten(spec.treedef, leaves)


def fused_init_opt_state(params, spec: FlatSpec) -> FusedOptState:
    z = lambda: jnp.zeros((spec.n,), jnp.float32)
    return FusedOptState(step=jnp.zeros((), jnp.int32),
                         micro=jnp.zeros((), jnp.int32),
                         acc=z(), buf=z(), buf2=z(),
                         bias_mask=jnp.asarray(spec.bias_mask),
                         wd_mask=jnp.asarray(spec.wd_mask))


def fused_state_to_tree(state: FusedOptState, spec: FlatSpec) -> OptState:
    """Convert to the treewise OptState (checkpoint format stays stable)."""
    return OptState(step=state.step, micro=state.micro,
                    acc=flat_to_tree(state.acc, spec),
                    buf=flat_to_tree(state.buf, spec),
                    buf2=flat_to_tree(state.buf2, spec))


def fused_state_from_tree(state: OptState, spec: FlatSpec) -> FusedOptState:
    return FusedOptState(step=state.step, micro=state.micro,
                         acc=tree_to_flat(state.acc, spec),
                         buf=tree_to_flat(state.buf, spec),
                         buf2=tree_to_flat(state.buf2, spec),
                         bias_mask=jnp.asarray(spec.bias_mask),
                         wd_mask=jnp.asarray(spec.wd_mask))


def fused_opt_update(params, grads, state: FusedOptState, spec: FlatSpec, *,
                     kind="sgd", lr_bias, lr, momentum, weight_decay=0.0005,
                     accumulate=1, clip_norm=10.0, nesterov=True, b2=0.999,
                     eps=1e-8, return_flat=False):
    """Flat-buffer twin of opt_update; same signature semantics.

    `params` stays a pytree (the model needs it); it is flattened once on
    entry and unflattened once on exit — two fused copies (~2×|params| HBM
    traffic) versus the per-leaf path's hundreds of tile-padded kernels. The
    lax.cond (accumulate>1) runs over the FLAT buffer so both branches are
    single-kernel. With return_flat=True a 4th element — the updated flat
    fp32 param vector — is returned for the fused EMA to consume without
    re-flattening.
    """
    g_flat = tree_to_flat(grads, spec)
    acc = state.acc + g_flat
    micro = state.micro + 1
    do_apply = micro >= accumulate
    bias_mask, wd_mask = state.bias_mask, state.wd_mask
    p_flat = tree_to_flat(params, spec)

    def apply_fn(operand):
        p, acc, buf, buf2, step = operand
        gnorm = jnp.sqrt(jnp.sum(acc * acc))
        g = acc * jnp.minimum(1.0, clip_norm / (gnorm + 1e-12))
        step = step + 1
        lr_vec = jnp.where(bias_mask, lr_bias, lr)
        wd_vec = jnp.where(wd_mask, jnp.float32(weight_decay), 0.0)
        if kind == "sgd":
            gw = g + wd_vec * p
            nb = momentum * buf + gw
            delta = gw + momentum * nb if nesterov else nb
            newp = p - lr_vec * delta
            new_buf, new_buf2 = nb, buf2
        else:  # adamw
            m = momentum * buf + (1 - momentum) * g
            v = b2 * buf2 + (1 - b2) * g * g
            sf = step.astype(jnp.float32)
            mhat = m / (1 - momentum ** sf)
            vhat = v / (1 - b2 ** sf)
            newp = p * (1 - lr_vec * wd_vec) - lr_vec * mhat / (
                jnp.sqrt(vhat) + eps)
            new_buf, new_buf2 = m, v
        return (newp, jnp.zeros_like(acc), new_buf, new_buf2, step)

    if accumulate == 1:
        # static fast path: every call applies; skip the cond barrier
        p_flat, acc, buf, buf2, step = apply_fn(
            (p_flat, acc, state.buf, state.buf2, state.step))
        micro = jnp.zeros_like(micro)
        do_apply = jnp.bool_(True)
    else:
        p_flat, acc, buf, buf2, step = jax.lax.cond(
            do_apply, apply_fn, lambda t: t,
            (p_flat, acc, state.buf, state.buf2, state.step))
        micro = jnp.where(do_apply, 0, micro)
    out = (flat_to_tree(p_flat, spec),
           FusedOptState(step=step, micro=micro, acc=acc, buf=buf, buf2=buf2,
                         bias_mask=bias_mask, wd_mask=wd_mask),
           do_apply)
    return out + (p_flat,) if return_flat else out


def make_unflatten_diff(spec: FlatSpec):
    """Differentiable flat->tree view for the flat-master train step.

    Forward is flat_to_tree (per-leaf slice+reshape — XLA fuses it into the
    bf16 casts the loss applies anyway). The backward is defined EXACTLY as
    tree_to_flat of the cotangent tree: the segments are disjoint and cover
    [0, n), so the VJP of the slices (sum of pads) reduces to one
    concatenate — one fused kernel instead of the ~250 padded adds XLA's
    autodiff would emit. Built per-spec via closure because FlatSpec holds
    numpy masks (unhashable for nondiff_argnums)."""

    @jax.custom_vjp
    def unflat(flat):
        return flat_to_tree(flat, spec)

    def fwd(flat):
        return flat_to_tree(flat, spec), None

    def bwd(_, ct):
        return (tree_to_flat(ct, spec),)

    unflat.defvjp(fwd, bwd)
    return unflat


def fused_opt_update_flat(p_flat, g_flat, state: FusedOptState, *,
                          kind="sgd", lr_bias, lr, momentum,
                          weight_decay=0.0005, accumulate=1, clip_norm=10.0,
                          nesterov=True, b2=0.999, eps=1e-8):
    """Boundary-free twin of fused_opt_update: params AND grads arrive as
    flat fp32 vectors and the updated params leave flat.

    fused_opt_update still pays three per-leaf copy boundaries per step
    (tree_to_flat(grads), tree_to_flat(params), flat_to_tree(new params) —
    ~250 tile-padded slice/concat pieces each). When the trainer carries the
    master params flat across steps and differentiates THROUGH flat_to_tree
    (the slice VJP accumulates the gradient directly into one flat buffer),
    none of those boundaries exist and the whole opt step is pure fused
    elementwise math. At accumulate=1 the acc buffer round-trip
    (read g + write acc + read acc + write zeros = 4x|params| HBM) is
    skipped entirely — g feeds the update directly and state.acc is
    returned untouched (XLA aliases the donated buffer).
    """
    bias_mask, wd_mask = state.bias_mask, state.wd_mask

    def math(p, g, buf, buf2, step):
        gnorm = jnp.sqrt(jnp.sum(g * g))
        g = g * jnp.minimum(1.0, clip_norm / (gnorm + 1e-12))
        step = step + 1
        lr_vec = jnp.where(bias_mask, lr_bias, lr)
        wd_vec = jnp.where(wd_mask, jnp.float32(weight_decay), 0.0)
        if kind == "sgd":
            gw = g + wd_vec * p
            nb = momentum * buf + gw
            delta = gw + momentum * nb if nesterov else nb
            return p - lr_vec * delta, nb, buf2, step
        m = momentum * buf + (1 - momentum) * g
        v = b2 * buf2 + (1 - b2) * g * g
        sf = step.astype(jnp.float32)
        mhat = m / (1 - momentum ** sf)
        vhat = v / (1 - b2 ** sf)
        newp = p * (1 - lr_vec * wd_vec) - lr_vec * mhat / (
            jnp.sqrt(vhat) + eps)
        return newp, m, v, step

    if accumulate == 1:
        newp, buf, buf2, step = math(p_flat, g_flat, state.buf, state.buf2,
                                     state.step)
        return (newp,
                FusedOptState(step=step, micro=jnp.zeros_like(state.micro),
                              acc=state.acc, buf=buf, buf2=buf2,
                              bias_mask=bias_mask, wd_mask=wd_mask),
                jnp.bool_(True))
    acc = state.acc + g_flat
    micro = state.micro + 1
    do_apply = micro >= accumulate

    def apply_fn(t):
        p, acc, buf, buf2, step = t
        newp, nb, nb2, step = math(p, acc, buf, buf2, step)
        return newp, jnp.zeros_like(acc), nb, nb2, step

    newp, acc, buf, buf2, step = jax.lax.cond(
        do_apply, apply_fn, lambda t: t,
        (p_flat, acc, state.buf, state.buf2, state.step))
    micro = jnp.where(do_apply, 0, micro)
    return (newp,
            FusedOptState(step=step, micro=micro, acc=acc, buf=buf,
                          buf2=buf2, bias_mask=bias_mask, wd_mask=wd_mask),
            do_apply)


def fused_ema_update(ema_p, ema_bs, p_flat, bs_flat, updates, applied,
                     base_decay=0.9999, tau=2000.0):
    """Flat-buffer EMA step over (params, batch_stats), gated on `applied`.

    Same math as utils/ema.ema_update (d = base*(1-exp(-updates/tau)) with the
    counter incremented first; reference ModelEMA torch_utils.py:360-366), but
    one fused kernel per buffer instead of ~750 leaf-sized ones, and the
    applied-gate is a d=1 no-op blend instead of a lax.cond branch copy.
    """
    new_updates = updates + applied.astype(jnp.int32)
    d = base_decay * (1.0 - jnp.exp(-new_updates.astype(jnp.float32) / tau))
    d = jnp.where(applied, d, 1.0)
    return (ema_p * d + p_flat * (1.0 - d),
            ema_bs * d + bs_flat * (1.0 - d),
            new_updates)
