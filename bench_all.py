"""Extended benchmark suite (the driver runs bench.py; this prints the full
performance story as JSON lines — one per workload).

    python bench_all.py [--quick]
"""

import argparse
import json
import time

import numpy as np


_QUICK = False  # set by main(--quick); stamps every line (see report())


def make_bert_chained_loop(k, bert_dims, n_slabs, dtype, use_flash=False):
    """Chained-scan BERT-encode loop (ONE definition of the chaining idiom
    — the `mask + (0*acc)` perturbation that stops XLA parallelising/CSEing
    the iterations — shared by --text and --text-long)."""
    import jax
    import jax.numpy as jnp

    from incremental_multimodal_medical_learning_ii_tpu.models.cxr_bert import (
        get_projected_text_embeddings,
    )

    @jax.jit
    def loop(ids_, mask_, p):
        def body(acc, i):
            m = mask_ + (0 * acc).astype(jnp.int32)
            emb = get_projected_text_embeddings(
                p, ids_[i % n_slabs], m, bert_dims, normalize=True,
                dtype=dtype, use_flash_attention=use_flash,
            )
            return acc + emb.sum(), None

        acc, _ = jax.lax.scan(body, jnp.zeros(()), jnp.arange(k))
        return acc

    return loop


def report(metric, value, unit, baseline=None, **extras):
    """value=None marks an invalid chained-scan sample (the long scan timed
    no slower than the short one — a link-phase artifact, see
    utils/chained_timing.py); it is reported as null, never clamped.

    --quick runs stamp ``"quick": true`` on every line: their chained-scan
    windows are below the ~0.1s link-jitter floor on tunneled hosts, so the
    numbers are smoke-test signals, not comparable measurements."""
    line = {"metric": metric, "value": None, "unit": unit,
            "note": "invalid sample (link phase straddle)"}
    if value is not None:
        line = {"metric": metric, "value": round(value, 3), "unit": unit}
        if baseline:
            line["vs_baseline"] = round(value / baseline, 2)
        line.update(extras)
    if _QUICK:
        line["quick"] = True
    print(json.dumps(line))


def stage_attribution(quick: bool = False, s2d_stem: bool = False) -> None:
    """Attribute the device-side extraction forward across ResNet stages.

    Chained-scan methodology (see the kernel section below): each program
    runs preprocess + the forward truncated after stage S, K times
    sequenced through an accumulator; long-minus-short isolates device
    time; stage cost = successive differences between truncation levels.
    Emits one JSON line per stage.  Slow (7 programs x 2 scan lengths to
    compile) — run on a host with local XLA or a warm compile cache.
    """
    import jax
    import jax.numpy as jnp

    from incremental_multimodal_medical_learning_ii_tpu.models.biovil_image import (
        _projector_forward,
        fold_grayscale_conv1,
        init_biovil_image_model,
    )
    from incremental_multimodal_medical_learning_ii_tpu.utils.chained_timing import (
        time_chained,
    )
    from incremental_multimodal_medical_learning_ii_tpu.models.resnet import (
        _bottleneck_forward,
        batch_norm_inference,
        max_pool_3x3_s2,
        stem_conv_apply,
    )
    from incremental_multimodal_medical_learning_ii_tpu.ops.preprocess import (
        SharedSizePreprocessPlan,
        preprocess_device_shared,
    )

    rng = np.random.default_rng(0)
    params = fold_grayscale_conv1(init_biovil_image_model(jax.random.PRNGKey(0)))
    if s2d_stem:
        from incremental_multimodal_medical_learning_ii_tpu.models.biovil_image import (
            space_to_depth_stem,
        )

        params = space_to_depth_stem(params)
    batch = 128 if quick else 256
    plan = SharedSizePreprocessPlan(390, 320, size=512, crop=512)
    n_slabs = 4
    raw_all = jnp.asarray(
        rng.integers(0, 256, size=(n_slabs, batch, 390, 320), dtype=np.uint8)
    )
    w_h = jnp.asarray(plan.w_h)
    w_w = jnp.asarray(plan.w_w)

    def truncated_forward(p, imgs, upto):
        # upto: 0=preprocess only, 1=+stem, 2..5=+layer1..4, 6=+projector
        x = imgs.astype(jnp.bfloat16)
        if upto == 0:
            return x.astype(jnp.float32).sum()
        enc = p["encoder"]
        x = stem_conv_apply(enc["conv1"], x)  # shape-dispatches the s2d stem
        x = jax.nn.relu(batch_norm_inference(x, enc["bn1"]))
        x = max_pool_3x3_s2(x)
        if upto == 1:
            return x.astype(jnp.float32).sum()
        for li in range(4):
            stride = 1 if li == 0 else 2
            for bi, block in enumerate(enc[f"layer{li + 1}"]):
                x = _bottleneck_forward(block, x, stride if bi == 0 else 1)
            if upto == 2 + li:
                return x.astype(jnp.float32).sum()
        proj = _projector_forward(p["projector"], x)
        return jnp.mean(proj.astype(jnp.float32), axis=(1, 2)).sum()

    def make_loop(k, upto):
        @jax.jit
        def loop(raw_, w_h_, w_w_, p):
            def body(acc, i):
                wh = w_h_ + 0.0 * acc  # chain: forces sequential execution
                imgs = preprocess_device_shared(raw_[i % n_slabs], wh, w_w_, channels=1)
                return acc + truncated_forward(p, imgs, upto), None

            acc, _ = jax.lax.scan(body, jnp.zeros(()), jnp.arange(k))
            return acc

        return loop

    k_long, k_short = (8, 2) if quick else (24, 4)
    names = [
        "preprocess", "stem", "layer1", "layer2", "layer3", "layer4", "projector_pool",
    ]
    prev = 0.0
    for upto, name in enumerate(names):
        cum = time_chained(
            lambda k: make_loop(k, upto),
            lambda r: (jnp.bitwise_xor(raw_all, np.uint8(r + 1)), w_h, w_w, params),
            k_short=k_short, k_long=k_long,
        )
        if cum is None:
            # no cumulative sample: neither this stage nor the NEXT one is
            # attributable (the next delta would silently include this
            # stage's cost if prev stayed at the last valid cumulative)
            report(f"stage_{name}_ms_per_batch", None, "ms")
            prev = None
            continue
        if prev is None:
            report(f"stage_{name}_ms_per_batch", None, "ms")
        else:
            report(f"stage_{name}_ms_per_batch", (cum - prev) * 1e3, "ms")
        prev = cum


def roofline_model(batch: int = 256) -> None:
    """Analytic per-stage roofline for the BioViL ResNet-50 forward at 512²
    (pure host math — no TPU).  Per conv: flops = 2·MACs; essential HBM
    bytes = input read + output write + weights (bf16) + the residual-add
    identity read per block (conv epilogues fuse BN/ReLU/add, so the only
    extra traffic a block's skip path costs is re-reading the identity);
    compute time is derated by the MXU feed factor min(K/128,1)·min(N/128,1)
    (a K- or N-dim under the 128-lane systolic depth feeds the array
    partially).  Stage cap = Σ_conv max(t_compute, t_memory).

    Validation against chained-scan measurements (v5e, 2026-08-17, bf16,
    grayscale-folded stem): layers 1-4 measure at 87-121% of this cap —
    the forward is HBM-bandwidth-bound, not scheduler-bound; see
    docs/DESIGN.md.  FLOPs cross-checked against XLA cost analysis of the
    jitted program (43.17 GF/img total).
    """
    import os

    # same overrides bench.py honors, so measured-vs-cap stays consistent
    # across TPU generations
    peak = float(os.environ.get("IMML_PEAK_FLOPS", 197e12))  # bf16 dense FLOP/s
    bw = float(os.environ.get("IMML_HBM_BW", 819e9))  # HBM bytes/s (v5e)

    def conv_cost(h, w, cin, cout, k, stride):
        ho, wo = h // stride, w // stride
        flops = 2 * ho * wo * cin * cout * k * k * batch
        byts = (h * w * cin + ho * wo * cout + k * k * cin * cout) * 2 * batch
        feed = min(cin * k * k / 128, 1.0) * min(cout / 128, 1.0)
        return flops, byts, max(flops / (peak * feed), byts / bw), (ho, wo)

    def bottleneck_layer(h, w, cin, cmid, cout, stride, blocks):
        f = b = t = 0.0
        for bi in range(blocks):
            s = stride if bi == 0 else 1
            ci = cin if bi == 0 else cout
            ch, cw = h, w  # conv3 runs at the post-stride resolution
            for (kk, ss, a, z) in ((1, 1, ci, cmid), (3, s, cmid, cmid), (1, 1, cmid, cout)):
                df, db, dt, (ch, cw) = conv_cost(ch, cw, a, z, kk, ss)
                f, b, t = f + df, b + db, t + dt
            if bi == 0:
                df, db, dt, _ = conv_cost(h, w, ci, cout, 1, s)
                f, b, t = f + df, b + db, t + dt
            # residual identity read (the add itself fuses into conv3)
            id_bytes = ch * cw * cout * 2 * batch
            b, t = b + id_bytes, t + id_bytes / bw
            h, w = ch, cw
        return f, b, t, h, w

    stages = {}
    f, b, t, _ = conv_cost(512, 512, 1, 64, 7, 2)
    stages["stem"] = (f, b, t)
    h = w = 128
    for name, (cin, cmid, cout, stride, blocks) in {
        "layer1": (64, 64, 256, 1, 3),
        "layer2": (256, 128, 512, 2, 4),
        "layer3": (512, 256, 1024, 2, 6),
        "layer4": (1024, 512, 2048, 2, 3),
    }.items():
        f, b, t, h, w = bottleneck_layer(h, w, cin, cmid, cout, stride, blocks)
        stages[name] = (f, b, t)
    for name, (f, b, t) in stages.items():
        report(f"roofline_{name}_cap_ms", t * 1e3, "ms",
               gflops_per_img=round(f / batch / 1e9, 2),
               mb_per_img=round(b / batch / 1e6, 1))


def text_roofline(batch: int, seq: int, dims=None):
    """Analytic roofline for one CXR-BERT projected-embedding forward
    (BERT-base dims by default) at the prompt-bank shape — the text-tower
    counterpart of :func:`roofline_model` (pure host math).

    Per layer (2·MACs convention, matching the image tower / XLA):
    QKVO projections 2·4·S·H², attention scores+context 2·2·S²·H, FFN
    2·2·S·H·I.  HBM side: the layer stack's weights stream once per batch
    (amortised over the batch) plus ~per-token activation traffic; at
    batch 256 / seq 32 the tower is COMPUTE-bound (memory cap ~10x higher),
    so %-of-cap below is an MFU statement.  Returns (cap_prompts_per_sec,
    gflops_per_prompt).
    """
    import os

    from incremental_multimodal_medical_learning_ii_tpu.models.cxr_bert import BertDims

    d = dims or BertDims()
    peak = float(os.environ.get("IMML_PEAK_FLOPS", 197e12))
    bw = float(os.environ.get("IMML_HBM_BW", 819e9))
    h, i, s, L = d.hidden_size, d.intermediate_size, seq, d.num_layers
    flops_per_prompt = L * 2 * (4 * s * h * h + 2 * s * s * h + 2 * s * h * i)
    flops_per_prompt += 2 * (h * d.projection_size + d.projection_size ** 2)
    params = L * (4 * h * h + 2 * h * i + 13 * h) + d.vocab_size * h
    # weights read once per BATCH (bf16) + ~16 S×H activation tensors/layer
    bytes_per_batch = params * 2 + batch * L * 16 * s * h * 2
    t_compute = batch * flops_per_prompt / peak
    t_memory = bytes_per_batch / bw
    cap = batch / max(t_compute, t_memory)
    bound = "compute" if t_compute >= t_memory else "memory"
    report(
        "text_roofline_cap_prompts_per_sec", cap, "prompts/sec",
        gflops_per_prompt=round(flops_per_prompt / 1e9, 2),
        bound=bound, batch=batch, seq=seq,
    )
    return cap, flops_per_prompt / 1e9


def parallel_model(batch: int = 32, seq: int = 512, ways: int = 4,
                   microbatches: int = 8) -> None:
    """Analytic per-axis scaling model for the text tower (host math only;
    docs/SCALING.md 'What each axis pays' table, executable).

    For each partition axis of a BERT-base-dims encoder layer it prints the
    per-device comm bytes, per-device matmul FLOPs, the resulting
    arithmetic intensity over ICI, and the hardware's FLOPs-per-ICI-byte
    ratio — whichever is smaller decides compute- vs ICI-bound (the
    scaling-book recipe).  pp additionally reports its fill/drain bubble
    fraction.  Peak/ICI overridable via IMML_PEAK_FLOPS / IMML_ICI_BW for
    other TPU generations (defaults: v5e 197 TFLOP/s bf16, 45 GB/s per
    link direction).
    """
    import os

    from incremental_multimodal_medical_learning_ii_tpu.models.cxr_bert import BertDims

    d = BertDims()
    peak = float(os.environ.get("IMML_PEAK_FLOPS", 197e12))
    ici = float(os.environ.get("IMML_ICI_BW", 45e9))
    hw_ratio = peak / ici
    h, i_sz, b = d.hidden_size, d.intermediate_size, 2  # bf16 bytes
    B, S, T = batch, seq, ways
    # per-layer matmul FLOPs (2xMACs): QKVO 8BSH^2, FFN 4BSHI, attn 4BS^2H
    layer_flops = 8 * B * S * h * h + 4 * B * S * h * i_sz + 4 * B * S * S * h
    rows = []
    # tp: 2 ring all-reduces per layer on (B,S,H) activations
    tp_bytes = 4 * (T - 1) / T * B * S * h * b
    rows.append(("tp", layer_flops / T, tp_bytes, None))
    # sp: P-1 K/V+validity hops per layer (ops/ring_attention.py, no
    # homecoming hop)
    sp_bytes = (T - 1) * (2 * B * (S // T) * h * b + B * (S // T) * 4)
    rows.append(("sp", layer_flops / T, sp_bytes, None))
    # pp: per LAYER share of the per-boundary microbatch handoffs — each
    # non-last stage sends M activations of (B/M,S,H) per batch, i.e.
    # B*S*H*b per stage boundary, amortised over L/P layers of compute
    pp_bytes = B * S * h * b / (d.num_layers / T)
    bubble = (T - 1) / (microbatches + T - 1)
    rows.append(("pp", layer_flops / T, pp_bytes, bubble))
    for axis, flops, comm, extra in rows:
        ai = flops / comm
        extras = {"per_device_layer_gflops": round(flops / 1e9, 2),
                  "comm_mb_per_layer": round(comm / 1e6, 3),
                  "hw_flops_per_ici_byte": round(hw_ratio, 0),
                  "bound": "compute" if ai >= hw_ratio else "ICI",
                  "batch": B, "seq": S, "ways": T}
        if extra is not None:
            extras["bubble_fraction"] = round(extra, 3)
            extras["microbatches"] = microbatches
        report(f"parallel_model_{axis}_flops_per_comm_byte", ai, "flops/byte",
               **extras)


def serving_benchmark(quick: bool = False) -> None:
    """Live-endpoint serving benchmark: concurrent clients POSTing PNG CXRs
    against cli.serve, micro-batching ON (5 ms window) vs OFF (plain lock).

    Emits req/s + latency percentiles per config and the device-dispatch
    count (observability for how many requests each device call served).
    Wall latencies on this host include the tunnel RTT; the microbatch-vs-
    lock DELTA is the transferable signal.
    """
    import http.client
    import io
    import threading
    import time

    import jax
    import jax.numpy as jnp

    from incremental_multimodal_medical_learning_ii_tpu.cli.serve import make_server
    from incremental_multimodal_medical_learning_ii_tpu.inference import (
        ChexpertClassifier,
    )
    from incremental_multimodal_medical_learning_ii_tpu.models.biovil_image import (
        init_biovil_image_model,
    )
    from incremental_multimodal_medical_learning_ii_tpu.text.bank import (
        build_prompt_bank,
        synthetic_encode_fn,
    )
    from incremental_multimodal_medical_learning_ii_tpu.text.prompts import (
        create_prompts,
    )
    from incremental_multimodal_medical_learning_ii_tpu.utils.config import (
        CHEXPERT_COMPETITION_TASKS,
    )

    from PIL import Image

    rng = np.random.default_rng(0)
    # production preprocessing geometry (512 resize/crop); pad_to bounds the
    # accepted raw size — CheXpert-small images are 390x320
    clf = ChexpertClassifier(
        init_biovil_image_model(jax.random.PRNGKey(0)),
        build_prompt_bank(
            synthetic_encode_fn(), create_prompts(CHEXPERT_COMPETITION_TASKS),
            CHEXPERT_COMPETITION_TASKS,
        ),
        batch_size=8, size=512, pad_to=512, dtype=jnp.bfloat16,
    )
    n_clients = 4
    reqs_per_client = 4 if quick else 16

    pngs = []
    for i in range(n_clients * reqs_per_client):
        buf = io.BytesIO()
        Image.fromarray(
            rng.integers(0, 256, size=(390, 320), dtype=np.uint8), "L"
        ).save(buf, "PNG")
        pngs.append(buf.getvalue())

    # compile OUTSIDE the HTTP path: the first dispatch can take minutes
    # through a remote-compile tunnel, far beyond any sane client timeout
    clf.predict_arrays([np.asarray(Image.open(io.BytesIO(pngs[0])))])

    for metric, window_s in (("serve_microbatch", 0.005), ("serve_locked", 0.0)):
        srv = make_server(clf, "127.0.0.1", 0, microbatch_s=window_s)
        threading.Thread(target=srv.serve_forever, daemon=True).start()
        port = srv.server_address[1]

        def one_request(body):
            conn = http.client.HTTPConnection("127.0.0.1", port, timeout=120)
            t0 = time.perf_counter()
            conn.request("POST", "/classify", body=body,
                         headers={"Content-Type": "image/png"})
            resp = conn.getresponse()
            resp.read()
            conn.close()
            assert resp.status == 200, resp.status
            return time.perf_counter() - t0

        one_request(pngs[0])  # jit warm-up outside the timed window
        latencies: list = []
        errors: list = []
        lock = threading.Lock()

        def client(idx):
            for r in range(reqs_per_client):
                # a failed request must surface in the REPORT, not die with
                # the daemon thread: otherwise req/s and percentiles are
                # silently computed over a shrunken request set
                try:
                    lat = one_request(pngs[idx * reqs_per_client + r])
                except Exception as e:  # noqa: BLE001 - recorded, not hidden
                    with lock:
                        errors.append(f"{type(e).__name__}: {e}")
                    continue
                with lock:
                    latencies.append(lat)

        t0 = time.perf_counter()
        threads = [threading.Thread(target=client, args=(i,)) for i in range(n_clients)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        wall = time.perf_counter() - t0
        srv.shutdown()
        srv.server_close()
        if errors:
            print(f"# {metric}: {len(errors)} request(s) FAILED "
                  f"(first: {errors[0]}) — rates below cover the "
                  f"{len(latencies)} completed requests only")
        if not latencies:
            report(f"{metric}_requests_per_sec", None, "req/s",
                   failed_requests=len(errors))
            continue
        lat_ms = np.sort(np.asarray(latencies)) * 1e3
        extras = {"failed_requests": len(errors)} if errors else {}
        report(f"{metric}_requests_per_sec", len(latencies) / wall, "req/s",
               **extras)
        report(f"{metric}_latency_p50_ms", float(np.percentile(lat_ms, 50)), "ms")
        report(f"{metric}_latency_p99_ms", float(np.percentile(lat_ms, 99)), "ms")
        if srv.microbatcher is not None:
            # how many requests each device call served (incl. warm-up req)
            report(f"{metric}_requests_per_dispatch",
                   (len(latencies) + 1) / max(srv.microbatcher.dispatches, 1), "req")


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--quick", action="store_true",
                   help="small shapes/scan windows for smoke runs; every "
                   "JSON line is stamped 'quick': true because the windows "
                   "sit below the tunneled link's ~0.1s jitter floor — do "
                   "not compare quick numbers against full runs")
    p.add_argument(
        "--stages", action="store_true",
        help="per-ResNet-stage device-time attribution only (slow compiles)",
    )
    p.add_argument(
        "--fused-layer1", action="store_true", dest="fused_layer1",
        help="also time the pallas fused-layer1 encode (adds a long compile)",
    )
    p.add_argument(
        "--s2d-stem", action="store_true", dest="s2d_stem",
        help="use / also time the space-to-depth stem reformulation "
        "(models/biovil_image.py::space_to_depth_stem; exact math)",
    )
    p.add_argument(
        "--text", action="store_true",
        help="also time the CXR-BERT text tower (adds a long first compile)",
    )
    p.add_argument(
        "--text-long", action="store_true", dest="text_long",
        help="also time the text tower at radiology-REPORT length (seq 512, "
        "batch 32, bf16): dense attention vs the pallas flash kernel "
        "(measured r4: dense 687 vs flash 474 prompts/s — flash is for the "
        "O(S^2) memory it avoids, not speed, at this shape; long compiles)",
    )
    p.add_argument(
        "--serve", action="store_true",
        help="serving latency/throughput only: concurrent HTTP clients vs "
        "the live endpoint, micro-batching on vs off",
    )
    p.add_argument(
        "--roofline", action="store_true",
        help="print the analytic per-stage roofline caps (host math only; "
        "compare against --stages measurements)",
    )
    p.add_argument(
        "--parallel-model", action="store_true", dest="parallel_model",
        help="print the analytic per-axis scaling model for the text tower "
        "(tp/sp/pp comm bytes, arithmetic intensity vs the hardware "
        "FLOPs-per-ICI-byte ratio, pp bubble; host math only — "
        "docs/SCALING.md's table, executable)",
    )
    p.add_argument("--pm-batch", type=int, default=32)
    p.add_argument("--pm-seq", type=int, default=512)
    p.add_argument("--pm-ways", type=int, default=4)
    p.add_argument("--pm-microbatches", type=int, default=8)
    args = p.parse_args()
    if args.quick:
        global _QUICK
        _QUICK = True

    from incremental_multimodal_medical_learning_ii_tpu.utils.compile_cache import enable

    enable()

    if args.roofline:
        # batch must track --stages' (--quick measures batch 128) or the
        # ms-per-batch comparison the help text points at is off by 2x
        roofline_model(batch=128 if args.quick else 256)
        return
    if args.parallel_model:
        parallel_model(batch=args.pm_batch, seq=args.pm_seq,
                       ways=args.pm_ways, microbatches=args.pm_microbatches)
        return
    if args.stages:
        stage_attribution(quick=args.quick, s2d_stem=args.s2d_stem)
        return
    if args.serve:
        serving_benchmark(quick=args.quick)
        return

    import jax
    import jax.numpy as jnp

    from incremental_multimodal_medical_learning_ii_tpu.utils.chained_timing import (
        rate_or_none,
        time_chained,
    )

    rng = np.random.default_rng(0)

    # ------------------------------------------------------------------
    # 1. extraction throughput (same as bench.py)
    # ------------------------------------------------------------------
    from incremental_multimodal_medical_learning_ii_tpu.engine.extract import (
        extract_embeddings,
    )
    from incremental_multimodal_medical_learning_ii_tpu.models.biovil_image import (
        init_biovil_image_model,
    )

    params = init_biovil_image_model(jax.random.PRNGKey(0))
    batch = 128 if args.quick else 256

    def images(n):
        for _ in range(n):
            yield (
                rng.integers(0, 256, size=(390, 320), dtype=np.uint8),
                np.zeros(5, np.float32),
            )

    extract_embeddings(images(batch), params, batch_size=batch, dtype=jnp.bfloat16)
    best = 0.0
    for _ in range(2 if args.quick else 3):
        n = batch * (2 if args.quick else 4)
        t0 = time.perf_counter()
        extract_embeddings(images(n), params, batch_size=batch, dtype=jnp.bfloat16)
        best = max(best, n / (time.perf_counter() - t0))
    report("extraction_images_per_sec_per_chip", best, "images/sec", baseline=1.509)

    # device-only encode throughput: the canonical chained-scan loop
    # (utils/device_bench.py, shared with bench.py) — isolates the chip
    # from the tunnel, quantifying how far the wall number is link-bound.
    n_slabs = 4  # also used by the text section below
    from incremental_multimodal_medical_learning_ii_tpu.utils.device_bench import (
        device_encode_rate,
    )

    def time_encode_loop(metric, p, channels=3, int8=False, fused_layer1=False):
        ek_long, ek_short = (8, 2) if args.quick else (24, 4)
        rate = device_encode_rate(
            p, batch=batch, channels=channels, int8=int8,
            fused_layer1=fused_layer1, k_short=ek_short, k_long=ek_long,
        )
        report(metric, rate, "images/sec", baseline=1.509)

    from incremental_multimodal_medical_learning_ii_tpu.models.biovil_image import (
        fold_grayscale_conv1,
        quantize_biovil_int8,
    )

    params_gray = fold_grayscale_conv1(params)
    time_encode_loop("extraction_device_images_per_sec_per_chip", params_gray, channels=1)
    # opt-in int8 trunk (ops/quant.py): 2x MXU peak, half the activation HBM
    # traffic; embeddings shift by quantization error (~0.999 cosine)
    time_encode_loop(
        "extraction_device_int8_images_per_sec_per_chip",
        quantize_biovil_int8(params_gray), channels=1, int8=True,
    )
    if args.fused_layer1:
        time_encode_loop(
            "extraction_device_fused_layer1_images_per_sec_per_chip",
            params_gray, channels=1, fused_layer1=True,
        )
    if args.s2d_stem:
        from incremental_multimodal_medical_learning_ii_tpu.models.biovil_image import (
            space_to_depth_stem,
        )

        time_encode_loop(
            "extraction_device_s2d_stem_images_per_sec_per_chip",
            space_to_depth_stem(params_gray), channels=1,
        )

    # ------------------------------------------------------------------
    # 1b. text tower: CXR-BERT (BERT-base dims) sequence encode throughput
    # ------------------------------------------------------------------
    if args.text:
        from incremental_multimodal_medical_learning_ii_tpu.models.cxr_bert import (
            BertDims,
            init_cxr_bert,
        )

        dims = BertDims()
        bert = init_cxr_bert(jax.random.PRNGKey(7), dims)
        tb, ts = (64, 32) if args.quick else (256, 32)  # batch, seq (prompt-bank shape)
        ids_all = jnp.asarray(
            rng.integers(0, dims.vocab_size, size=(n_slabs, tb, ts)), jnp.int32
        )
        mask = jnp.ones((tb, ts), jnp.int32)

        def make_text_loop(k, dtype):
            return make_bert_chained_loop(k, dims, n_slabs, dtype)

        tk_long, tk_short = (8, 2) if args.quick else (24, 4)
        # analytic cap first so each measured number gets a %-of-cap (the
        # text-tower counterpart of the image roofline; at this shape the
        # tower is compute-bound, so pct_of_cap reads as MFU)
        text_cap, _ = text_roofline(tb, ts, dims)
        for metric, dtype in (
            ("text_device_prompts_per_sec_per_chip", jnp.float32),
            ("text_device_bf16_prompts_per_sec_per_chip", jnp.bfloat16),
        ):
            per_batch = time_chained(
                lambda k: make_text_loop(k, dtype),
                lambda r: ((ids_all + r + 1) % dims.vocab_size, mask, bert),
                k_short=tk_short, k_long=tk_long,
            )
            rate = rate_or_none(per_batch, tb)
            extras = {}
            if rate is not None:
                # fp32 runs HIGHEST precision (multi-pass bf16 on TPU), so
                # its % of the bf16 peak understates utilisation by design
                extras["pct_of_cap"] = round(100 * rate / text_cap, 1)
            report(metric, rate, "prompts/sec", **extras)

    # ------------------------------------------------------------------
    # 1c. text tower at radiology-REPORT length: dense vs flash attention
    # ------------------------------------------------------------------
    if args.text_long:
        from incremental_multimodal_medical_learning_ii_tpu.models.cxr_bert import (
            BertDims,
            init_cxr_bert,
        )

        ldims = BertDims()
        lbert = init_cxr_bert(jax.random.PRNGKey(7), ldims)
        lb, ls = (8, 128) if args.quick else (32, 512)
        lids_all = jnp.asarray(
            rng.integers(0, ldims.vocab_size, size=(2, lb, ls)), jnp.int32
        )
        lmask = jnp.ones((lb, ls), jnp.int32)

        def make_long_loop(k, use_flash):
            return make_bert_chained_loop(k, ldims, 2, jnp.bfloat16,
                                          use_flash=use_flash)

        long_cap, _ = text_roofline(lb, ls, ldims)
        for metric, use_flash in (
            ("text_long_device_bf16_dense_prompts_per_sec", False),
            ("text_long_device_bf16_flash_prompts_per_sec", True),
        ):
            try:
                per_batch = time_chained(
                    lambda k: make_long_loop(k, use_flash),
                    lambda r: ((lids_all + r + 1) % ldims.vocab_size, lmask, lbert),
                    k_short=2, k_long=10,
                )
            except Exception as e:
                if not use_flash:
                    raise  # dense path must run everywhere; don't mask a regression
                # pallas flash kernel is TPU-only: skip off-TPU, fail on TPU
                if jax.default_backend() != "cpu":
                    raise
                print(f"# {metric}: skipped ({type(e).__name__})")
                continue
            rate = rate_or_none(per_batch, lb)
            extras = {"seq": ls, "batch": lb}
            if rate is not None:
                extras["pct_of_cap"] = round(100 * rate / long_cap, 1)
            report(metric, rate, "prompts/sec", **extras)

    # ------------------------------------------------------------------
    # 2. fused training epoch
    # ------------------------------------------------------------------
    from incremental_multimodal_medical_learning_ii_tpu.data.store import synthetic_dataset
    from incremental_multimodal_medical_learning_ii_tpu.engine.trainer import Trainer
    from incremental_multimodal_medical_learning_ii_tpu.text.bank import (
        build_prompt_bank,
        synthetic_encode_fn,
    )
    from incremental_multimodal_medical_learning_ii_tpu.text.prompts import create_prompts
    from incremental_multimodal_medical_learning_ii_tpu.utils.config import (
        CHEXPERT_COMPETITION_TASKS,
        joint_config,
    )

    n_train = 24576 if args.quick else 191027
    bank = build_prompt_bank(
        synthetic_encode_fn(), create_prompts(CHEXPERT_COMPETITION_TASKS),
        CHEXPERT_COMPETITION_TASKS,
    )
    cfg = joint_config(batch_size=6144, epochs=1, lr=1e-3, plot_figures="off")
    trainer = Trainer(cfg, bank)
    ds = synthetic_dataset(n_train, seed=0)
    trainer.train(ds, epoch=1)  # compile
    t0 = time.perf_counter()
    for e in (2, 3, 4):
        trainer.train(ds, epoch=e)
    dt = (time.perf_counter() - t0) / 3
    report("fused_train_epoch_samples_per_sec", n_train / dt, "samples/sec")

    # device-only epoch time: the wall number above is dominated by one
    # tunnel round-trip per epoch; chain K epochs inside ONE jitted
    # fori_loop and take the long-minus-short difference so the dispatch +
    # readback cancels (same methodology as the kernel timings below).
    fe = trainer._fused_epoch
    d_embs, d_labels, d_valid = trainer._device_data(ds)
    class_mask = jnp.ones(5, jnp.float32)
    # the long run must dwarf the ~0.1s link jitter of a single round-trip
    k_pair = (32, 4) if args.quick else (64, 8)

    def make_epochs(k):
        @jax.jit
        def run(state, key, embs_, labels_, valid_, bank_):
            def body(i, carry):
                st, key_ = carry
                key_, sub = jax.random.split(key_)
                st, _ = fe(st, embs_, labels_, valid_, bank_, class_mask, 0.0, sub)
                return (st, key_)
            st, _ = jax.lax.fori_loop(0, k, body, (state, key))
            return st
        return run

    # state threads through the repeats (evolving params = fresh buffers,
    # defeating memoization); timing/guarding via utils/chained_timing.
    holder = {"state": trainer.state, "seed": 0}

    def epochs_loop_factory(k):
        run_k = make_epochs(k)

        def loop(key):
            st = run_k(holder["state"], key, d_embs, d_labels, d_valid, bank)
            holder["state"] = st
            return st.step  # np.asarray(step) inside time_chained = barrier

        return loop

    def epochs_args(_r):
        holder["seed"] += 1
        return (jax.random.PRNGKey(holder["seed"]),)

    per_epoch = time_chained(
        epochs_loop_factory, epochs_args, k_short=k_pair[1], k_long=k_pair[0]
    )
    report("fused_train_epoch_device_samples_per_sec",
           rate_or_none(per_epoch, n_train), "samples/sec")

    # ------------------------------------------------------------------
    # 3. fused eval
    # ------------------------------------------------------------------
    ev = synthetic_dataset(4096 if args.quick else 30000, seed=1)
    trainer.validate(ev, 1, 1)  # compile
    # vary params between evals: the backend memoizes identical
    # (executable, inputs) executions, which would fake the timing
    trainer.train(ds, epoch=5)
    t0 = time.perf_counter()
    trainer.validate(ev, 2, 2)
    report("eval_samples_per_sec", len(ev) / (time.perf_counter() - t0), "samples/sec")

    # ------------------------------------------------------------------
    # 4. pallas fused cosine vs unfused XLA
    # ------------------------------------------------------------------
    from incremental_multimodal_medical_learning_ii_tpu.ops.cosine import pairwise_cosine
    from incremental_multimodal_medical_learning_ii_tpu.ops.pallas_cosine import (
        pallas_pairwise_cosine,
    )

    # methodology (CLAUDE.md): per-call dispatch latency through the tunnel
    # is milliseconds — far above the ~0.5 ms kernels — so host-side timing
    # loops measure the link, not the kernel.  Instead each kernel is timed
    # INSIDE one jitted lax.scan (iterations chained through an accumulator
    # perturbing the next input, so XLA cannot parallelise or CSE them),
    # and per-iteration cost is the difference between a long and a short
    # scan, cancelling the dispatch + readback overhead.
    # the long scan must dwarf the ~0.1s link jitter (20us x 16k = 0.33s)
    k_long, k_short = (4096, 512) if args.quick else (16384, 2048)
    xs = jnp.asarray(rng.normal(size=(8, 6144, 128)).astype(np.float32))
    t = jnp.asarray(rng.normal(size=(10, 128)).astype(np.float32))

    def make_loop(fn, k):
        @jax.jit
        def loop(xs_, t_):
            def body(acc, i):
                x = xs_[i % xs_.shape[0]] + 0.0 * acc
                return acc + fn(x, t_).sum(), None
            acc, _ = jax.lax.scan(body, jnp.zeros(()), jnp.arange(k))
            return acc
        return loop

    for name, fn in (("pallas_cosine_6144x10_us", pallas_pairwise_cosine), ("xla_cosine_6144x10_us", pairwise_cosine)):
        per_iter = time_chained(
            lambda k: make_loop(fn, k),
            lambda r: (xs + np.float32(r + 1), t),  # fresh buffers: no memoization
            k_short=k_short, k_long=k_long,
        )
        report(name, per_iter * 1e6 if per_iter else None, "us")


if __name__ == "__main__":
    main()
