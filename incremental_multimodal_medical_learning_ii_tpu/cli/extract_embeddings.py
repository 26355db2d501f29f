"""CheXpert embedding extraction driver (reference ``chexpert-get-embedding.py``).

Batched, fused-preprocess, bfloat16, shard-checkpointed (the reference runs
a batch-size-1 torch loop with a shard every 5000 images).

    python -m incremental_multimodal_medical_learning_ii_tpu.cli.extract_embeddings \
        --csv labels.csv --img-dir /data/chexpert/ --biovil-checkpoint biovil.pt \
        --out-dir embeddings/test

    # smoke run without data/weights:
    python -m incremental_multimodal_medical_learning_ii_tpu.cli.extract_embeddings \
        --synthetic 64 --out-dir /tmp/emb
"""

from __future__ import annotations

import argparse
import time
from pathlib import Path

import numpy as np


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--csv", help="CheXpert labels CSV (path column first)")
    p.add_argument("--img-dir", default="", help="prefix joined to CSV paths")
    p.add_argument("--biovil-checkpoint", help="biovil_image_resnet50_proj_size_128.pt")
    p.add_argument("--out-dir", required=True)
    p.add_argument("--batch-size", type=int, default=128)
    p.add_argument("--size", type=int, default=512)
    p.add_argument("--crop", type=int, default=None, help="default: same as --size")
    p.add_argument("--pad-to", type=int, default=1024)
    p.add_argument("--checkpoint-interval", type=int, default=5000)
    p.add_argument("--decode-workers", type=int, default=0,
                   help="JPEG-decode process pool size (reference num_workers=4)")
    p.add_argument("--fp32", action="store_true", help="fp32 conv compute (parity runs)")
    p.add_argument("--host-preprocess", action="store_true", help="PIL path instead of fused device path")
    p.add_argument("--no-grayscale-conv1", action="store_true",
                   help="disable the folded-conv1 grayscale fast path (keeps 3-channel images on device)")
    p.add_argument("--int8", action="store_true",
                   help="int8-quantize the frozen trunk (2x MXU peak, ~0.999 embedding "
                        "cosine vs float; not for bit-parity runs)")
    p.add_argument("--synthetic", type=int, default=0, help="N synthetic images (smoke run)")
    p.add_argument("--resume", action="store_true",
                   help="skip images already covered by shards in --out-dir")
    p.add_argument("--readback-interval", type=int, default=4,
                   help="dispatched batches per device->host sync (batched device_get)")
    p.add_argument("--retries", type=int, default=2,
                   help="per-batch re-dispatch attempts on transient backend errors")
    p.add_argument("--num-hosts", type=int, default=1,
                   help="shard the image list across this many extraction hosts; "
                   "each host writes to <out-dir>/host-<i> (merge with prepare_data)")
    p.add_argument("--host-index", type=int, default=0)
    args = p.parse_args(argv)

    from incremental_multimodal_medical_learning_ii_tpu.cli.common import (
        enable_compile_cache,
    )

    enable_compile_cache()

    import jax
    import jax.numpy as jnp

    from incremental_multimodal_medical_learning_ii_tpu.data.store import (
        ShardedEmbeddingStore,
    )
    from incremental_multimodal_medical_learning_ii_tpu.engine.extract import (
        extract_embeddings,
        manifest_image_iterator,
    )

    if not (0 <= args.host_index < args.num_hosts):
        raise SystemExit(f"--host-index {args.host_index} not in [0, {args.num_hosts})")

    def host_bounds(n_total: int):
        """Contiguous ceil-sized slice of the image list for this host
        (same partitioning as split_contiguous / Trainer.py:1214-1231)."""
        import math

        chunk = math.ceil(n_total / args.num_hosts)
        lo = min(n_total, args.host_index * chunk)
        return lo, min(n_total, lo + chunk)

    if args.synthetic:
        from incremental_multimodal_medical_learning_ii_tpu.models.biovil_image import (
            init_biovil_image_model,
        )

        params = init_biovil_image_model(jax.random.PRNGKey(0))
        lo, hi = host_bounds(args.synthetic)

        def iterator(skip=0):
            rng_local = np.random.default_rng(0)
            for i in range(args.synthetic):
                img = rng_local.integers(0, 256, size=(390, 320), dtype=np.uint8)
                lbl = (rng_local.random(5) < 0.3).astype(np.float32)
                if lo + skip <= i < hi:
                    yield img, lbl
    else:
        if not (args.csv and args.biovil_checkpoint):
            raise SystemExit("--csv and --biovil-checkpoint required (or --synthetic N)")
        import itertools

        from incremental_multimodal_medical_learning_ii_tpu.data.manifest import (
            ChexpertManifest,
        )
        from incremental_multimodal_medical_learning_ii_tpu.models.convert import (
            load_biovil_image_checkpoint,
        )

        params = load_biovil_image_checkpoint(args.biovil_checkpoint)
        manifest = ChexpertManifest.from_csv(args.csv, img_dir=args.img_dir)
        lo, hi = host_bounds(len(manifest))
        print(f"{len(manifest)} images" + (
            f"; host {args.host_index}/{args.num_hosts} takes [{lo}, {hi})"
            if args.num_hosts > 1 else ""
        ))

        def iterator(skip=0):
            it = manifest_image_iterator(
                manifest, workers=args.decode_workers, start=lo + skip
            )
            return itertools.islice(it, max(0, (hi - lo) - skip))

    out_dir = args.out_dir
    if args.num_hosts > 1:
        out_dir = str(Path(args.out_dir) / f"host-{args.host_index}")
    store = ShardedEmbeddingStore(out_dir)
    skipped = store.total_rows() if args.resume else 0
    t0 = time.perf_counter()
    ds = extract_embeddings(
        iterator,
        params,
        store=store,
        batch_size=args.batch_size,
        size=args.size,
        crop=args.crop,
        dtype=jnp.float32 if args.fp32 else jnp.bfloat16,
        checkpoint_interval=args.checkpoint_interval,
        device_preprocess=not args.host_preprocess,
        grayscale_conv1=not args.no_grayscale_conv1,
        int8=args.int8,
        pad_to=args.pad_to,
        resume=args.resume,
        retries=args.retries,
        readback_interval=args.readback_interval,
    )
    dt = time.perf_counter() - t0
    final = store.directory / "dataset.npz"
    ds.save(final)
    fresh = len(ds) - skipped
    print(
        f"extracted {fresh} embeddings in {dt:.1f}s ({fresh/max(dt,1e-9):.1f} imgs/sec)"
        + (f" [resumed past {skipped}]" if skipped else "")
        + f" -> {final} ({len(ds)} total)"
    )


if __name__ == "__main__":
    main()
