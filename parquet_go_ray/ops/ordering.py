"""Dataset-order control for order-SENSITIVE operators.

Ray Data's streaming executor does not preserve block order by default
(``ExecutionOptions.preserve_order=False``): consumers see bundles in
completion order, which varies run to run with scheduling. Almost every
operator in this repo is order-insensitive (hash-partitioned aggregates,
filters, joins, roundtrips), but the sequence-packing family defines its
output BY dataset order — "documents are laid out contiguously in dataset
order" — so its prefix-sum pass must see blocks in the one logical order,
or the same input packs differently on every run.

``preserve_dataset_order()`` flips the context flag for exactly the
execution(s) started inside the ``with`` block and restores it after; the
cost (the executor buffers out-of-order bundles instead of emitting them
eagerly) is paid only by the order-sensitive passes, never repo-wide.
"""

from __future__ import annotations

import contextlib


@contextlib.contextmanager
def preserve_dataset_order():
    """Flip the GLOBAL context flag for datasets CREATED inside the block.

    Note Ray Datasets snapshot their DataContext at creation: this manager
    only affects `read_*`/`from_*` calls made inside the ``with``; it does
    NOT retrofit order onto a dataset built earlier — use ``ordered()`` for
    that."""
    import ray.data

    ctx = ray.data.DataContext.get_current()
    prev = ctx.execution_options.preserve_order
    ctx.execution_options.preserve_order = True
    try:
        yield
    finally:
        ctx.execution_options.preserve_order = prev


def ordered(ds):
    """Make every execution of ``ds`` — and of all datasets derived from it,
    which share its per-dataset DataContext object — emit blocks in logical
    order. Returns ``ds`` for chaining. This is the lever that works on an
    already-built dataset (the context was snapshotted when its root was
    created, so the global flag no longer reaches it)."""
    ds.context.execution_options.preserve_order = True
    return ds


@contextlib.contextmanager
def ordered_scope(ds):
    """``ordered()`` scoped to the executions started inside the ``with``
    block, restoring the dataset's previous setting after. Use when only ONE
    pass needs logical order (a prefix-sum or a pinning materialize) and the
    heavy downstream stages — shuffles, groupbys — should keep the executor's
    freedom to emit in completion order."""
    opts = ds.context.execution_options
    prev = opts.preserve_order
    opts.preserve_order = True
    try:
        yield ds
    finally:
        opts.preserve_order = prev
