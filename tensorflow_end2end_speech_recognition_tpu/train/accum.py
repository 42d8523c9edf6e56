"""Gradient accumulation: large effective batches at microbatch memory.

The reference trains whatever batch fits one GPU (``train_ctc.py``'s fixed
``batch_size`` — SURVEY.md §2.7); there is no way to reach a larger
effective batch than memory allows. Here ``grad_accum_steps: A`` splits
each train batch into A microbatches inside the SAME jitted step — a
``lax.scan`` of value_and_grad over microbatches, gradients averaged, then
ONE optimizer update — so activation memory scales with B/A while the
update math equals the full-batch step (losses are batch means over
equal-sized microbatches, so the mean of microbatch gradients IS the
full-batch gradient; tests assert equality to float tolerance).

Microbatch row layout is STRIDED, not contiguous: microbatch ``a`` holds
rows ``a, a+A, a+2A, ...``. Under data parallelism the batch axis is
block-sharded over ``data`` (contiguous rows per chip), so a contiguous
microbatch slice would land on a subset of chips and idle the rest; the
strided layout draws B/A rows evenly from EVERY chip's block — expressed
as a reshape ``[B, ...] -> [B/A, A, ...]`` (sharding stays on the major
rows axis) + a local dynamic index on the replicated A axis. Loss means
are row-order-invariant, so the regrouping changes nothing.

Works under every placement-only mesh (dp/tp/sp/ep/fsdp) because it is
ordinary traced code — the partitioner sees A sequential microbatch
programs and keeps its collectives per microbatch.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def accum_value_and_grad(loss_fn, params, batch, rng, accum: int):
    """Mean ``(loss, aux), grads`` of ``loss_fn`` over ``accum`` microbatches.

    ``loss_fn(params, microbatch, rng) -> (loss, aux)`` with scalar aux
    leaves (the task ``forward_loss`` contract). ``rng`` is folded with the
    microbatch index so augmentation/dropout masks stay independent across
    microbatches. The batch's leading axis must divide by ``accum``.
    """
    b = jax.tree.leaves(batch)[0].shape[0]
    if b % accum:
        raise ValueError(f"batch rows {b} not divisible by grad_accum {accum}")
    mb = b // accum

    def microbatch(a):
        def take(v):
            vr = jnp.reshape(v, (mb, accum) + v.shape[1:])
            return jax.lax.dynamic_index_in_dim(vr, a, axis=1, keepdims=False)

        return {k: take(v) for k, v in batch.items()}

    def one(a):
        return jax.value_and_grad(
            lambda p: loss_fn(p, microbatch(a), jax.random.fold_in(rng, a)),
            has_aux=True,
        )(params)

    (loss0, aux0), g0 = one(jnp.asarray(0, jnp.int32))

    def body(carry, a):
        lsum, auxsum, gsum = carry
        (l, aux), g = one(a)
        return (
            lsum + l,
            jax.tree.map(jnp.add, auxsum, aux),
            jax.tree.map(jnp.add, gsum, g),
        ), None

    (lsum, auxsum, gsum), _ = jax.lax.scan(
        body, (loss0, aux0, g0), jnp.arange(1, accum, dtype=jnp.int32)
    )
    inv = 1.0 / accum
    scale = lambda t: jax.tree.map(lambda x: x * inv, t)
    return (lsum * inv, scale(auxsum)), scale(gsum)
