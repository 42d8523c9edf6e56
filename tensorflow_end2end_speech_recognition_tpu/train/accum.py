"""Gradient accumulation: large effective batches at microbatch memory.

The reference trains whatever batch fits one GPU (``train_ctc.py``'s fixed
``batch_size`` — SURVEY.md §2.7); there is no way to reach a larger
effective batch than memory allows. Here ``grad_accum_steps: A`` splits
each train batch into A microbatches inside the SAME jitted step — a
``lax.scan`` of value_and_grad over microbatches, then ONE optimizer
update — so activation memory scales with B/A while the update math
equals the full-batch step.

Microbatch losses are WEIGHTED means over rows (``ops/losses.batch_mean``:
short final batches are padded with weight=0 fill rows), so microbatch
results cannot simply be averaged uniformly — a microbatch holding fewer
real rows must count less. We therefore accumulate the weighted SUMS:
``sum_a(loss_a * wsum_a)`` and ``sum_a(wsum_a)`` (where ``wsum_a`` is
microbatch *a*'s row-weight total, recomputed from ``batch["weight"]``),
and divide once at the end — exactly the full-batch weighted mean, for
any weight vector. Without a ``weight`` key all microbatches weigh
``B/A`` and this reduces to the uniform average. (Loss terms that are
constant across microbatches — weight decay — survive the convex
recombination unchanged; the MoE aux loss, an unweighted token mean, is
recombined with row weights, a negligible train-only regularizer drift.)

Microbatch row layout is STRIDED, not contiguous: microbatch ``a`` holds
rows ``a, a+A, a+2A, ...``. Under data parallelism the batch axis is
block-sharded over ``data`` (contiguous rows per chip), so a contiguous
microbatch slice would land on a subset of chips and idle the rest; the
strided layout draws B/A rows evenly from EVERY chip's block — expressed
as a reshape ``[B, ...] -> [B/A, A, ...]`` (sharding stays on the major
rows axis) + a local dynamic index on the replicated A axis. Weighted
sums are row-order-invariant, so the regrouping changes nothing.

Works under every placement-only mesh (dp/tp/sp/ep/fsdp) because it is
ordinary traced code — the partitioner sees A sequential microbatch
programs and keeps its collectives per microbatch. The microbatch body
is traced ONCE (a zeros-seeded scan over ``arange(A)``), so the compiled
step carries a single copy of the forward+backward program.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def accum_value_and_grad(loss_fn, params, batch, rng, accum: int):
    """Weighted-mean ``(loss, aux), grads`` of ``loss_fn`` over ``accum``
    microbatches.

    ``loss_fn(params, microbatch, rng) -> (loss, aux)`` with scalar aux
    leaves (the task ``forward_loss`` contract: the loss is a
    ``batch_mean`` over rows, weighted by ``microbatch["weight"]`` when
    present). ``rng`` is folded with the microbatch index so
    augmentation/dropout masks stay independent across microbatches. The
    batch's leading axis must divide by ``accum``.
    """
    b = jax.tree.leaves(batch)[0].shape[0]
    if b % accum:
        raise ValueError(f"batch rows {b} not divisible by grad_accum {accum}")
    mb = b // accum
    has_weight = "weight" in batch

    def microbatch(a):
        def take(v):
            vr = jnp.reshape(v, (mb, accum) + v.shape[1:])
            return jax.lax.dynamic_index_in_dim(vr, a, axis=1, keepdims=False)

        return {k: take(v) for k, v in batch.items()}

    def one(a):
        mbatch = microbatch(a)
        (l, aux), g = jax.value_and_grad(
            lambda p: loss_fn(p, mbatch, jax.random.fold_in(rng, a)),
            has_aux=True,
        )(params)
        if has_weight:
            # batch_mean divides by max(sum(w), 1): multiplying the loss
            # back by the same quantity recovers the weighted numerator
            # exactly (an all-fill microbatch contributes 0 either way).
            w = jnp.maximum(jnp.sum(mbatch["weight"].astype(jnp.float32)), 1.0)
        else:
            w = jnp.asarray(float(mb), jnp.float32)
        return (l, aux), g, w

    def body(carry, a):
        lsum, auxsum, gsum, wsum = carry
        (l, aux), g, w = one(a)
        # cast the weight per leaf so mixed-dtype grads keep their dtype
        # (the scan carry structure must be stable)
        wadd = lambda s, x: s + x * w.astype(x.dtype)
        return (
            lsum + l * w,
            jax.tree.map(wadd, auxsum, aux),
            jax.tree.map(wadd, gsum, g),
            wsum + w,
        ), None

    shapes = jax.eval_shape(one, jax.ShapeDtypeStruct((), jnp.int32))
    zeros = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), shapes)
    (loss_z, aux_z), g_z, w_z = zeros
    (lsum, auxsum, gsum, wsum), _ = jax.lax.scan(
        body, (loss_z, aux_z, g_z, w_z), jnp.arange(accum, dtype=jnp.int32)
    )
    inv = 1.0 / wsum  # wsum >= 1 by construction
    scale = lambda t: jax.tree.map(lambda x: x * inv.astype(x.dtype), t)
    return (lsum * inv, scale(auxsum)), scale(gsum)
