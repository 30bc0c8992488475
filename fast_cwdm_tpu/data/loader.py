"""Prefetching host→device pipeline.

The reference feeds the GPU with torch DataLoader worker processes
(num_workers=12, `train.py:66-69`); here the equivalent is a thread pool
decompressing/normalizing NIfTIs plus a double-buffered `jax.device_put`
prefetcher (the north-star requirement in BASELINE.json), so the TPU never
waits on gzip inflation.
"""

from __future__ import annotations

import queue
import threading
from typing import Iterable, Iterator

import jax
import numpy as np


class ThreadedLoader:
    """Background-thread item loader: overlaps dataset __getitem__ (disk +
    gunzip + normalize) with device compute."""

    def __init__(self, dataset, *, num_workers: int = 4, max_prefetch: int = 8):
        self.dataset = dataset
        self.num_workers = max(1, num_workers)
        # a non-positive permit count would park every worker before its
        # first item and hang the consumer forever
        self.max_prefetch = max(1, max_prefetch)

    def __iter__(self) -> Iterator:
        idx_q: queue.Queue = queue.Queue()
        out_q: queue.Queue = queue.Queue()
        n = len(self.dataset)
        for i in range(n):
            idx_q.put(i)
        results: dict[int, object] = {}
        stop = threading.Event()
        # permits bound TOTAL in-flight items (processing + queued + stashed
        # in the reorder buffer) — bounding only the queue lets the reorder
        # buffer grow toward the whole dataset when one early item is slow
        permits = threading.Semaphore(self.max_prefetch)

        def worker():
            while not stop.is_set():
                # permit BEFORE claiming an index: indices are then claimed
                # in FIFO order by permit-holding workers, so the smallest
                # unfinished index always owns a permit and the consumer
                # can always make progress (acquiring after claiming can
                # deadlock: a slow early item finishes while stashed later
                # items hold every permit)
                permits.acquire()
                if stop.is_set():
                    permits.release()
                    return
                try:
                    i = idx_q.get_nowait()
                except queue.Empty:
                    permits.release()
                    return
                try:
                    out_q.put((i, self.dataset[i], None))
                except Exception as e:  # noqa: BLE001 — surfaced below
                    # a silent worker death would hang the consumer forever
                    out_q.put((i, None, e))

        threads = [
            threading.Thread(target=worker, daemon=True)
            for _ in range(self.num_workers)
        ]
        for t in threads:
            t.start()
        try:
            next_idx = 0
            received = 0
            while received < n:
                i, item, err = out_q.get()
                received += 1
                if err is not None:
                    raise RuntimeError(
                        f"dataset item {i} failed to load"
                    ) from err
                results[i] = item
                while next_idx in results:
                    yield results.pop(next_idx)
                    permits.release()
                    next_idx += 1
        finally:
            stop.set()
            for _ in threads:  # unblock workers parked on permits.acquire
                permits.release()


class _PermutedView:
    """Index-remapped dataset view: item ``i`` is ``dataset[order[i]]``.

    Lets `ThreadedLoader` (which preserves dataset index order through its
    reorder buffer) emit items in an arbitrary shuffle order, so the
    threaded path yields bit-identical sequences to the serial one.
    """

    def __init__(self, dataset, order):
        self.dataset = dataset
        self.order = order

    def __len__(self):
        return len(self.order)

    def __getitem__(self, i):
        return self.dataset[int(self.order[i])]


def shard_order_rows(
    order: np.ndarray, batch_size: int, rows: tuple[int, int]
) -> tuple[np.ndarray, int]:
    """Restrict a global sample ``order`` to this process's rows of every
    ``batch_size``-row global batch.

    The multi-host input contract (`parallel.mesh.local_batch_rows`):
    every process builds the same seeded permutation, but decodes only
    rows ``[start, stop)`` of each global batch — the rows its devices
    own. Ragged global tails are dropped (they cannot shard evenly across
    processes). Returns ``(local_order, local_batch_size)``. Shared by
    the BraTS and LIDC training input paths.
    """
    start, stop = rows
    if not (0 <= start < stop <= batch_size):
        raise ValueError(f"rows {rows} outside batch [0, {batch_size})")
    n_full = len(order) // batch_size
    local = (
        order[: n_full * batch_size]
        .reshape(n_full, batch_size)[:, start:stop]
        .reshape(-1)
    )
    return local, stop - start


def iter_items(dataset, order, num_workers: int = 0) -> Iterator:
    """Yield ``dataset`` items in ``order`` — on a decode thread pool when
    ``num_workers > 0`` — with an output sequence identical to the serial
    path for any worker count. The shared core of the BraTS and LIDC
    training input paths (the reference's DataLoader worker equivalent,
    `train.py:66-69`)."""
    if num_workers > 0:
        return iter(
            ThreadedLoader(
                _PermutedView(dataset, order),
                num_workers=num_workers,
                # give every requested worker a permit (+2 headroom) so the
                # default prefetch bound never silently parks workers; each
                # in-flight BraTS item is ~128 MB host-side, so the bound
                # stays near the worker count rather than a large multiple
                max_prefetch=max(8, num_workers + 2),
            )
        )
    return (dataset[int(i)] for i in order)


def device_resident_batches(
    dataset,
    batch_size: int,
    *,
    shuffle: bool = False,
    seed: int = 0,
    drop_last: bool = True,
    keys=None,
    cache: dict | None = None,
) -> Iterator[dict]:
    """One epoch of batches whose arrays are already HBM-resident.

    The TPU-idiomatic answer to per-step H2D for datasets that fit in
    device memory: each distinct case is decoded and `jax.device_put`
    ONCE (first epoch), then every later epoch serves the pinned arrays —
    zero host→device bytes per step. A 24-case BraTS fine-tune is
    4×32 MB×24 ≈ 3.1 GB, far under one v5e's 16 GB HBM, while the
    per-step transfer it replaces measured 1-2.6 s through a tunneled
    backend (PERF.md round-3 training analysis); on PCIe hosts it still
    removes ~128 MB/step of bus traffic.

    Pass the SAME ``cache`` dict across epochs (the caller owns it and
    with it the pinned memory's lifetime). The yielded batch sequence is
    identical to `iterate_batches(shuffle=..., seed=...)` — same
    permutation, same collation — so switching the flag changes nothing
    about the training stream (regression-tested). Single-process input
    feeding only: the multi-host `rows=` sharding contract keeps batches
    host-side by design (`TrainLoop._put` assembles the global array).
    """
    import jax.numpy as jnp

    from fast_cwdm_tpu.data.brats import MODALITIES

    keys = MODALITIES if keys is None else keys
    cache = {} if cache is None else cache

    def cached(i: int) -> dict:
        got = cache.get(i)
        if got is None:
            item = dataset[int(i)]
            if item.get("missing", "none") in keys:
                where = item.get("filedict") or item.get("subj") or "?"
                raise ValueError(
                    f"case is missing modality {item['missing']!r} but "
                    f"batches collate keys {tuple(keys)}; offending case "
                    f"files: {where}"
                )
            # cache WITH the leading batch dim: at batch_size 1 a step's
            # batch then IS the cached pytree — no per-step device work
            got = {
                k: jax.device_put(np.asarray(item[k])[None]) for k in keys
            }
            cache[i] = got
        return got

    order = np.arange(len(dataset))
    if shuffle:
        np.random.default_rng(seed).shuffle(order)
    n_full = len(order) // batch_size
    if not drop_last and len(order) % batch_size:
        n_full += 1
    for b in range(n_full):
        idxs = order[b * batch_size : (b + 1) * batch_size]
        items = [cached(i) for i in idxs]
        if len(items) == 1:
            yield items[0]
        else:
            yield {
                k: jnp.concatenate([it[k] for it in items]) for k in keys
            }


def prefetch_to_device(
    iterator: Iterable,
    *,
    size: int = 2,
    sharding=None,
    put=None,
) -> Iterator:
    """Double-buffered H2D: keep ``size`` batches already on device while
    the current one computes. ``put`` overrides the transfer (e.g. a
    mesh-sharded `shard_batch`); otherwise `jax.device_put` (optionally
    with ``sharding``) is used."""

    if put is None:

        def put(batch):
            if sharding is not None:
                return jax.tree.map(
                    lambda x: jax.device_put(np.asarray(x), sharding), batch
                )
            return jax.tree.map(
                lambda x: jax.device_put(np.asarray(x)), batch
            )

    # the put runs in a dedicated producer thread: jax.device_put can be
    # SYNCHRONOUS on tunneled/remote backends (measured 1.1 s per 128 MB
    # batch through the axon tunnel), and in the consumer thread that cost
    # serializes with the train step — threaded, it overlaps compute and
    # the step sees a ready on-device batch. Bounded queue keeps at most
    # ``size`` batches of device memory in flight.
    import queue as _queue
    from threading import Thread

    q: _queue.Queue = _queue.Queue(maxsize=max(1, size))
    sentinel = object()
    failure: list[BaseException] = []

    def _producer():
        try:
            for batch in iterator:
                q.put(put(batch))
        except BaseException as e:  # surfaced to the consumer below
            failure.append(e)
        finally:
            q.put(sentinel)

    Thread(target=_producer, daemon=True, name="h2d-prefetch").start()
    while True:
        item = q.get()
        if item is sentinel:
            if failure:
                raise failure[0]
            return
        yield item
