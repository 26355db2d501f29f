"""CheXpert embedding extraction at scale — the throughput headline.

Reference: ``chexpert-get-embedding.py:34-113`` — a batch-size-1 Python loop
over 191k JPEGs through frozen BioViL ResNet-50 with CPU PIL preprocessing,
checkpointing a torch shard every 5000 images.

TPU rebuild:
* static-shape batches through one jitted program that fuses preprocessing
  (PIL-parity matmul resize + crop + /255 + 3ch, ops/preprocess.py) with the
  ResNet-50 + projector forward;
* bfloat16 conv compute by default (fp32 statistics/accumulations);
* a host prefetch thread decodes/plans batch N+1 while the device runs
  batch N (double buffering across the host/device boundary);
* batch-sharded ``pjit`` over the data mesh when one is provided;
* crash-safe shard checkpoints in the same 5000-image cadence.
"""

from __future__ import annotations

import itertools
import queue
import threading
import time
from typing import Callable, Iterable, Iterator, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from incremental_multimodal_medical_learning_ii_tpu.data.store import (
    EmbeddingDataset,
    ShardedEmbeddingStore,
)
from incremental_multimodal_medical_learning_ii_tpu.models.biovil_image import (
    biovil_image_forward,
)
from incremental_multimodal_medical_learning_ii_tpu.ops.preprocess import (
    DevicePreprocessPlan,
    SharedSizePreprocessPlan,
    preprocess_device,
    preprocess_device_indexed,
    preprocess_device_shared,
    preprocess_host,
)
from incremental_multimodal_medical_learning_ii_tpu.parallel import mesh as mesh_lib
from incremental_multimodal_medical_learning_ii_tpu.utils.retry import retry_call

ImageLabel = Tuple[np.ndarray, np.ndarray]  # (H, W) uint8, (5,) float32


def make_encode_preprocessed_fn(dtype=jnp.bfloat16, int8: bool = False):
    """jitted (params, (B, S, S, 3) float images) -> (B, 128) embeddings.

    Params are an ARGUMENT of the returned fn, never a captured closure
    constant — capturing them would burn the weights into the executable
    at trace time."""

    def fn(p, images):
        return biovil_image_forward(p, images, dtype=dtype, int8=int8).projected_global_embedding

    return jax.jit(fn)


def make_encode_raw_indexed_fn(dtype=jnp.bfloat16, channels: int = 3, int8: bool = False):
    """jitted (params, raw u8 (B,P,P), uniq_w_h (U,crop,P), uniq_w_w, idx)
    -> (B, 128) for heterogeneous-shape batches: per-image resize matrices
    are gathered on device from U unique pairs
    (DevicePreprocessPlan.prepare_deduped), so the host uploads U matrix
    pairs instead of B dense ones (~4 MB each)."""

    def fn(p, raw, uniq_w_h, uniq_w_w, idx):
        images = preprocess_device_indexed(raw, uniq_w_h, uniq_w_w, idx, channels=channels)
        return biovil_image_forward(p, images, dtype=dtype, int8=int8).projected_global_embedding

    return jax.jit(fn)


def make_encode_raw_fn(dtype=jnp.bfloat16, channels: int = 3, int8: bool = False):
    """jitted (params, raw u8 (B,P,P), w_h, w_w) -> (B, 128); preprocessing
    fused in (params per call, as above).

    ``channels=1`` expects conv1 pre-folded for grayscale input
    (:func:`fold_grayscale_conv1`): the image tensor stays single-channel in
    HBM and conv1 runs at a third of the FLOPs, with identical math (the
    reference's ``ExpandChannels`` copies one plane three times).
    """

    def fn(p, raw, w_h, w_w):
        images = preprocess_device(raw, w_h, w_w, channels=channels)
        return biovil_image_forward(p, images, dtype=dtype, int8=int8).projected_global_embedding

    return jax.jit(fn)


def make_encode_raw_shared_fn(dtype=jnp.bfloat16, channels: int = 3, int8: bool = False):
    """jitted (params, raw u8 (B,H,W), shared w_h, w_w) -> (B, 128); the
    uniform-size fast path — only raw uint8 pixels cross the host/device
    boundary (params per call, as above)."""

    def fn(p, raw, w_h, w_w):
        images = preprocess_device_shared(raw, w_h, w_w, channels=channels)
        return biovil_image_forward(p, images, dtype=dtype, int8=int8).projected_global_embedding

    return jax.jit(fn)


def _batched(it: Iterator[ImageLabel], batch_size: int) -> Iterator[Tuple[list, np.ndarray, int]]:
    """Group into fixed-size batches; the final batch is padded by repeating
    its last image (static shapes) and carries the true count."""
    batch: list = []
    labels: list = []
    for img, lbl in it:
        batch.append(img)
        labels.append(lbl)
        if len(batch) == batch_size:
            yield batch, np.stack(labels), batch_size
            batch, labels = [], []
    if batch:
        n = len(batch)
        while len(batch) < batch_size:
            batch.append(batch[-1])
            labels.append(labels[-1])
        yield batch, np.stack(labels), n


def _prefetch(gen, depth: int = 2):
    """Run a generator in a background thread with a bounded queue.

    The consumer abandoning this generator (extraction aborting after
    exhausted retries) sets ``stop`` via the ``finally``, so the worker
    never blocks forever on a full queue — a leaked thread would pin its
    in-flight prepared batch (~hundreds of MB at production shapes) for
    the life of the process."""
    q: queue.Queue = queue.Queue(maxsize=depth)
    sentinel = object()
    stop = threading.Event()
    err: list = []

    def _put(item) -> bool:
        while not stop.is_set():
            try:
                q.put(item, timeout=0.2)
                return True
            except queue.Full:
                continue
        return False

    def worker():
        try:
            for item in gen:
                if not _put(item):
                    return
        except BaseException as e:  # propagate into the consumer
            err.append(e)
        finally:
            _put(sentinel)

    t = threading.Thread(target=worker, daemon=True)
    t.start()
    try:
        while True:
            item = q.get()
            if item is sentinel:
                if err:
                    raise err[0]
                return
            yield item
    finally:
        stop.set()


def extract_embeddings(
    images: Iterable[ImageLabel] | Callable[[int], Iterable[ImageLabel]],
    params,
    store: Optional[ShardedEmbeddingStore] = None,
    *,
    batch_size: int = 64,
    size: int = 512,
    crop: Optional[int] = None,
    dtype=jnp.bfloat16,
    checkpoint_interval: int = 5000,  # images, like the reference's 5000 batches of 1
    device_preprocess: bool = True,
    grayscale_conv1: bool = True,
    int8: bool = False,
    pad_to: int = 1024,
    mesh=None,
    prefetch_depth: int = 2,
    readback_interval: int = 4,
    trace_dir: Optional[str] = None,
    resume: bool = False,
    retries: int = 2,
    retry_backoff_s: float = 0.5,
    stats: Optional[dict] = None,
) -> EmbeddingDataset:
    """Run the full extraction pass; returns the (N, 128) dataset and writes
    shard checkpoints along the way when ``store`` is given.

    Fault tolerance (beyond the reference, whose extraction dies on any
    error and restarts from image 0 despite its shard checkpoints,
    ``chexpert-get-embedding.py:68-113``):

    * a transient backend error during dispatch or readback re-dispatches
      the in-flight batch up to ``retries`` times with exponential backoff
      before surfacing — one tunnel hiccup no longer kills a 191k-image run;
    * ``resume=True`` (requires ``store``) skips the images already covered
      by existing contiguous shards and extracts only the tail, returning
      the full glued dataset.  ``images`` may be a callable ``skip ->
      iterator`` so skipped images are never decoded (pass
      ``lambda s: manifest_image_iterator(manifest, start=s)``); a plain
      iterable is sliced instead (skipped items are drawn and discarded).

    ``stats``, if given a dict, is filled with wall-time totals:
    ``{"dispatch_s", "readback_s", "batches", "retried_batches"}`` — the
    dispatch-vs-readback split that makes a throughput number attributable
    to link phase rather than code.

    ``readback_interval`` is the number of dispatched batches read back per
    device->host sync (one batched ``device_get``), amortizing per-sync
    latency; embeddings are 128 floats per image, so even large windows
    hold trivial device memory.  Measured NEUTRAL through this benchmark
    host's tunnel (median 125 vs 142 imgs/s across link phases — noise):
    the per-batch "readback wait" there is the enqueued raw-pixel uploads
    draining (the tunnel is upload-bandwidth-bound at ~10-20 MB/s), not
    sync latency, so fewer syncs change nothing.  Kept because on a normal
    PCIe TPU host the sync cost IS per-call latency and the window is free.
    """
    crop = crop or size
    if readback_interval < 1:
        # 0 would make every flush a no-op: the window (and its ~32 MB/batch
        # of host raw buffers) grows unboundedly and no shard checkpoint is
        # ever written.
        raise ValueError(f"readback_interval must be >= 1, got {readback_interval}")
    if stats is not None:
        stats.update(dispatch_s=0.0, readback_s=0.0, batches=0, retried_batches=0)
    channels = 3
    if device_preprocess and grayscale_conv1:
        # The pipeline's 3 channels are identical (ExpandChannels,
        # DataRetrieval.py:27-40): fold conv1 over its input-channel axis and
        # keep images single-channel on device — same math, 1/3 the image
        # HBM traffic and conv1 FLOPs.
        from incremental_multimodal_medical_learning_ii_tpu.models.biovil_image import (
            fold_grayscale_conv1,
        )

        params = fold_grayscale_conv1(params)
        channels = 1
    if int8:
        # Opt-in post-training quantization of the frozen trunk (ops/quant.py);
        # folding must happen first — it operates on the float conv1 kernel.
        from incremental_multimodal_medical_learning_ii_tpu.models.biovil_image import (
            quantize_biovil_int8,
        )

        params = quantize_biovil_int8(params)
    if mesh is not None:
        # every batch is padded to exactly batch_size, so one upfront check
        # covers the whole run — without it a non-divisible size dies at the
        # first device_put mid-run with an opaque backend error
        n_shards = mesh.shape.get(mesh_lib.DATA_AXIS, mesh.devices.size)
        if batch_size % n_shards:
            raise ValueError(
                f"batch_size={batch_size} not divisible by the mesh's "
                f"{n_shards} data shards"
            )
        params = mesh_lib.replicate(mesh, params)

    if device_preprocess:
        plan = DevicePreprocessPlan(size=size, crop=crop, pad_to=pad_to)
        encode_indexed = make_encode_raw_indexed_fn(dtype=dtype, channels=channels, int8=int8)
        encode_shared = make_encode_raw_shared_fn(dtype=dtype, channels=channels, int8=int8)
        shared_plans = {}  # (h, w) -> SharedSizePreprocessPlan

        def prepare(batch_imgs):
            shapes = {im.shape for im in batch_imgs}
            if len(shapes) == 1:
                hw = next(iter(shapes))
                sp = shared_plans.get(hw)
                if sp is None:
                    sp = shared_plans[hw] = SharedSizePreprocessPlan(*hw, size=size, crop=crop)
                return ("shared", sp.prepare(batch_imgs), sp.w_h, sp.w_w)
            # heterogeneous batch: one matrix pair per DISTINCT shape + a
            # per-image gather index (uploading B dense pairs is ~4 MB/image
            # — 30x the raw pixels — on an upload-bound link)
            raw, uniq_w_h, uniq_w_w, idx = plan.prepare_deduped(batch_imgs)
            return ("indexed", raw, (uniq_w_h, uniq_w_w), idx)

        def run(prepared):
            kind, raw, wpair, extra = prepared
            if kind == "shared":
                w_h, w_w = wpair, extra  # (w_h, w_w) positional reuse
                if mesh is not None:
                    raw = mesh_lib.shard_batch(mesh, raw)
                    w_h, w_w = mesh_lib.replicate(mesh, (w_h, w_w))
                return encode_shared(params, raw, w_h, w_w)
            uniq_w_h, uniq_w_w = wpair
            idx = extra
            if mesh is not None:
                raw, idx = mesh_lib.shard_batch(mesh, (raw, idx))
                uniq_w_h, uniq_w_w = mesh_lib.replicate(mesh, (uniq_w_h, uniq_w_w))
            return encode_indexed(params, raw, uniq_w_h, uniq_w_w, idx)

    else:
        encode_pre = make_encode_preprocessed_fn(dtype=dtype, int8=int8)

        def prepare(batch_imgs):
            return np.stack([preprocess_host(im, size=size, crop=crop) for im in batch_imgs])

        def run(prepared):
            if mesh is not None:
                prepared = mesh_lib.shard_batch(mesh, prepared)
            return encode_pre(params, prepared)

    skip = 0
    all_embs: list = []
    all_labels: list = []
    if resume:
        if store is None:
            raise ValueError("resume=True requires a store")
        existing = store.total_rows()
        if existing:
            prior = store.glue()
            all_embs.append(prior.embeddings)
            all_labels.append(prior.labels)
            skip = existing

    def prepared_batches():
        if callable(images):
            it = iter(images(skip))
        else:
            it = iter(images)
            if skip:
                it = itertools.islice(it, skip, None)
        for batch_imgs, labels, n in _batched(it, batch_size):
            yield prepare(batch_imgs), labels, n

    from incremental_multimodal_medical_learning_ii_tpu.utils.profiling import (
        annotate,
        maybe_trace,
    )

    pending_embs: list = []
    pending_labels: list = []
    written = skip
    seen = skip

    def handle(embs_np, labels, n):
        nonlocal seen, written, pending_embs, pending_labels
        embs_np = embs_np[:n]
        labels = labels[:n]
        seen += n
        all_embs.append(embs_np)
        all_labels.append(labels)
        if store is not None:
            pending_embs.append(embs_np)
            pending_labels.append(labels)
            if seen - written >= checkpoint_interval:
                store.write_shard(written, np.concatenate(pending_embs), np.concatenate(pending_labels))
                written = seen
                pending_embs, pending_labels = [], []

    def dispatch(prepared):
        """run() with retry — a transient backend error (tunnel hiccup,
        FAILED_PRECONDITION) re-dispatches with exponential backoff."""

        def count(_attempt, _e):
            if stats is not None:
                stats["retried_batches"] += 1

        return retry_call(
            lambda: run(prepared), retries, retry_backoff_s, on_retry=count
        )

    def flush(window, k=None):
        """One batched device->host transfer for the oldest ``k`` dispatched
        batches, with retry: a failed readback invalidates the dispatched
        buffers, so every batch in the head is re-dispatched from the
        still-held host-side ``prepared`` arrays."""
        k = len(window) if k is None else min(k, len(window))
        if k == 0:
            return
        head = window[:k]
        del window[:k]
        with annotate("extract_readback"):
            t0 = time.perf_counter()

            def redispatch(_attempt, _e):
                # failed readback invalidates the dispatched buffers: rebuild
                # the head from the still-held host-side prepared arrays
                nonlocal head
                if stats is not None:
                    stats["retried_batches"] += len(head)
                head = [(dispatch(w[1]), w[1], w[2], w[3]) for w in head]

            arrs = retry_call(
                lambda: jax.device_get([w[0] for w in head]),
                retries, retry_backoff_s, on_retry=redispatch,
            )
            if stats is not None:
                stats["readback_s"] += time.perf_counter() - t0
        for (_, _, labels, n), arr in zip(head, arrs):
            handle(np.asarray(arr, dtype=np.float32), labels, n)

    # Windowed device pipeline: dispatch up to ``readback_interval`` batches
    # (async upload + compute enqueue), then read the whole window back in
    # ONE batched device_get; the window always runs one batch ahead (flush
    # starts only once a batch beyond it is dispatched), which at interval=1
    # is exactly the old two-deep loop.  What this buys depends on the
    # transport: on a normal PCIe host it amortizes per-sync latency; through
    # this benchmark host's tunnel it measured NEUTRAL, because the flush
    # wait is dominated by the window's 32 MB/batch raw uploads draining
    # (upload-bandwidth-bound), not by sync latency — see the docstring.
    # NOTE a fully decoupled variant (dedicated reader thread, dispatch
    # running arbitrarily far ahead) was built and A/B measured on the
    # tunneled TPU host: interleaving the big raw uploads with embedding
    # readbacks made the link ~2x SLOWER (median 50 vs 108 imgs/s over 5
    # alternating rounds) — the tunnel serves one direction well and
    # thrashes when multiplexed.  This loop stays serial: uploads, then one
    # readback.
    with maybe_trace(trace_dir):
        window: list = []  # (device result, host prepared, labels, n)
        for prepared, labels, n in _prefetch(prepared_batches(), depth=prefetch_depth):
            with annotate("extract_dispatch"):
                t0 = time.perf_counter()
                window.append((dispatch(prepared), prepared, labels, n))
                if stats is not None:
                    stats["dispatch_s"] += time.perf_counter() - t0
                    stats["batches"] += 1
            if len(window) > readback_interval:
                flush(window, readback_interval)  # keep the newest in flight
        flush(window)
    if store is not None and pending_embs:
        store.write_shard(written, np.concatenate(pending_embs), np.concatenate(pending_labels))
    if not all_embs:
        return EmbeddingDataset(np.zeros((0, 128), np.float32), np.zeros((0, 5), np.float32))
    return EmbeddingDataset(np.concatenate(all_embs), np.concatenate(all_labels))


def manifest_image_iterator(
    manifest, loader: Optional[Callable] = None, workers: int = 0, start: int = 0
) -> Iterator[ImageLabel]:
    """Iterate (raw grayscale uint8, label) pairs from a ChexpertManifest.

    ``workers > 0`` decodes with a process pool (the reference's
    ``num_workers=4`` DataLoader parallelism, ``DataRetrieval.py:151-153``);
    order is preserved. Full-resolution CheXpert JPEGs decode at ~70
    imgs/sec/core, so multi-worker decode is what keeps the chip fed there.
    ``start`` skips the first N images without decoding them (extraction
    resume).
    """
    from incremental_multimodal_medical_learning_ii_tpu.data.images import (
        load_image_raw_uint8,
    )

    labels = manifest.labels()[start:]
    paths = manifest.image_paths()[start:]
    loader = loader or load_image_raw_uint8
    if workers:
        # the pool runs whatever loader was given (it must be picklable —
        # a module-level function, not a lambda); silently decoding
        # serially would starve the chip without warning.
        # NEVER fork here: the caller has JAX initialized (multithreaded),
        # and a forked child inherits its locks mid-state — the documented
        # deadlock. forkserver/spawn start workers from a clean process;
        # the loader's module (data/images.py) is deliberately jax-free,
        # so each worker imports only numpy/PIL once.
        import multiprocessing

        methods = multiprocessing.get_all_start_methods()
        ctx = multiprocessing.get_context(
            "forkserver" if "forkserver" in methods else "spawn"
        )
        with ctx.Pool(workers) as pool:
            for idx, img in enumerate(pool.imap(loader, paths, chunksize=8)):
                yield img, labels[idx]
        return
    for idx, path in enumerate(paths):
        yield loader(path), labels[idx]
