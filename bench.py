#!/usr/bin/env python
"""Headline benchmark: wideband dual-channel AIS decode on one TPU chip.

Synthesizes a 2.4 Msps capture centered at 162.0 MHz at FULL AIS channel
load — every 26.67 ms TDMA slot on both channels carries a packet with a
distinct payload (~75 packets/s across A+B) — runs the fused
channelize->AFC->AGC->correlate->timing->bits pipeline on device with
double-buffered int8 wire ingest, verifies CONTENT parity (payload bytes
+ channel + position, not just position proximity), and reports
sustained input throughput.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
vs_baseline is against the reference's implied operating point —
real-time decode of a 250 ksps capture (SURVEY.md section 6), i.e.
0.25 Msamples/s.

DEADLINE CONTRACT (the round-3 lesson): the driver runs this script
under an external timeout and records only what it prints.  The bench
therefore (a) works toward a wall-clock budget (AIS_TPU_BENCH_BUDGET_S,
default 1500 s) and cuts phases that no longer fit, (b) emits a
best-so-far JSON line after every completed phase (the parent keeps the
child's last line), and (c) traps SIGTERM/SIGALRM so even an external
kill still produces a parsed result.  Expensive one-time artifacts (the
synthesized full-load wire steps, the XLA executables) persist in
.bench_cache/ and .jax_cache/, so a warm run spends its budget
measuring, not compiling.

The headline is the TPU chip's number (the metric is per-chip).  The
CPU backend runs as a cross-check ONLY when budget remains after the
TPU measurement; it becomes the headline only if the TPU is
unreachable, and is then labeled "cpu-fallback".  Each backend runs in
a subprocess: the tunnel TPU's remote-compile service can fail in ways
that poison a process (ARCHITECTURE.md section 4).
"""

from __future__ import annotations

import json
import os
import signal
import subprocess
import sys
import threading
import time

BASELINE_MSPS = 0.25  # gr-ais: 2 channels from one 250 ksps SDR, real time
SLOT_SAMPLES_2P4M = 64000  # 26.67 ms AIS TDMA slot at 2.4 Msps

REPO = os.path.dirname(os.path.abspath(__file__))
CACHE_DIR = os.path.join(REPO, ".jax_cache")
BENCH_CACHE = os.path.join(REPO, ".bench_cache")
SCENE_VERSION = "v2"  # bump when _scene / encoder constants change
# v2: cr1 encoder NTF zeros split onto the two channels (CR1_A2)

# Wall-clock budget for the WHOLE bench (parent + children).  The
# driver's own timeout killed round 3's run (BENCH_r03.json rc=124), so
# the budget errs low and every phase is optional beyond the first
# measured number.
BUDGET_S = float(os.environ.get("AIS_TPU_BENCH_BUDGET_S", "1500"))
T_START = time.time()
DEADLINE = T_START + BUDGET_S


def _remaining() -> float:
    return DEADLINE - time.time()


WIRE_FMT = os.environ.get("AIS_TPU_WIRE_FMT", "cr1")
#   cr1: fs/4-IF bandpass sigma-delta at ONE bit per complex sample —
#   the ingest link (~30-50 MB/s tunnel h2d per connection) is the
#   binding constraint, and cr1 halves the bytes of ci1 (8 samples/byte
#   vs 4) while its noise-shaping notch keeps the in-band quantization
#   noise out of both AIS channels.  Hardened round 4: full impairment
#   corpus (tests/test_wire_corpus.py), headroom margin + sensitivity
#   characterization (WIRE.md), 28 dB near-far envelope
#   (tests/test_wideband.py), auto-fallback guard
#   (convert.select_wire_format), and a fused Pallas wire kernel
#   (bytes -> ±1 -> IF-folded mix -> polyphase in one VMEM pass,
#   ops/pallas_fir.py) so the halved wire does not trade ingest for
#   exec.  ci1 (2 bits/sample) remains for sensitivity-critical
#   deployments below ~18 dB Eb/N0; cd1 is entropy-shaped ci1; ci2/ci4
#   for front ends without a sigma-delta path.

# Distinct step contents cycled through every window: a real SDR stream
# never repeats bytes, so the bench must not hand the tunnel the same
# buffer twice in a row (content reuse could hit transport caches and
# flatter the number).
N_WIRES = 4


def _scene(cfg, n_in, n_core):
    """Full-load TDMA scene: distinct payloads in every slot, both channels.

    Packets are confined to the call's core span `n_core` (= step_raw):
    a packet starting in the trailing halo belongs to the NEXT stream
    step by the overlap-save ownership rule and cannot be decoded by a
    single call.
    """
    import numpy as np

    from ais_tpu.tx import aivdm_payload_to_bytes
    from ais_tpu.tx.scenario import Scenario, ScenarioPacket

    base = bytearray(aivdm_payload_to_bytes("14eG;o@034o8sd<L9i:a;WF>062D"))
    rng = np.random.default_rng(7)
    packets = []
    burst_len = 62500 + 2000  # ~231 bits at 250 sps + ramp margin
    for ci, off in enumerate(cfg.offsets_hz):
        slot0 = 3000 + ci * 17000  # de-phase the two channels' slot grids
        k = 0
        while slot0 + k * SLOT_SAMPLES_2P4M + burst_len < n_core:
            p = bytearray(base)
            # Distinct payload per packet: vary MMSI-ish bytes.
            p[1] = (k * 7 + ci) % 256
            p[2] = (k * 131) % 256
            p[3] = (k >> 8) % 256
            packets.append(
                ScenarioPacket(
                    payload=bytes(p),
                    start_sample=slot0 + k * SLOT_SAMPLES_2P4M,
                    offset_hz=float(off),
                    phase=float(rng.uniform(0, 2 * np.pi)),
                    extra_freq_hz=float(rng.uniform(-200, 200)),
                )
            )
            k += 1
    iq = Scenario(
        sample_rate=cfg.input_rate, n_samples=n_in, packets=packets, noise=0.004
    ).build()
    return iq, packets


def _load_wires(cfg, n_in, step_raw):
    """Wire steps + tx packet list for the full-load scene, disk-cached.

    Scene synthesis (GMSK-modulating ~1200 packets into a 37.9 Msample
    capture) plus N_WIRES sigma-delta encodes costs minutes of host
    time; it is deterministic, so a warm bench loads it in ~1 s.
    """
    import numpy as np

    key = f"{SCENE_VERSION}_{WIRE_FMT}_{n_in}_{N_WIRES}"
    path = os.path.join(BENCH_CACHE, f"scene_{key}.npz")
    if os.path.exists(path):
        try:
            z = np.load(path, allow_pickle=True)
            wires = [z[f"wire{k}"] for k in range(N_WIRES)]
            pk = z["packets"]  # (n, 3) object array: payload, start, off
            from ais_tpu.tx.scenario import ScenarioPacket

            tx_packets = [
                ScenarioPacket(
                    payload=bytes(p), start_sample=int(s), offset_hz=float(o)
                )
                for p, s, o in pk
            ]
            return wires, tx_packets
        except Exception:  # noqa: BLE001 — rebuild below
            pass

    from ais_tpu.ops.convert import host_bytes

    iq, tx_packets = _scene(cfg, n_in, step_raw)
    iq = (iq * 0.7).astype("complex64")
    # N_WIRES distinct step contents: circular shifts by a prime offset
    # (every packet stays inside the core span; the sigma-delta restarts
    # so the bytes differ everywhere).
    wires = [
        host_bytes(np.roll(iq, 977 * k) if k else iq, WIRE_FMT)
        for k in range(N_WIRES)
    ]
    try:
        os.makedirs(BENCH_CACHE, exist_ok=True)
        np.savez(
            path + ".tmp.npz",
            packets=np.array(
                [(p.payload, p.start_sample, p.offset_hz) for p in tx_packets],
                dtype=object,
            ),
            **{f"wire{k}": w for k, w in enumerate(wires)},
        )
        os.replace(path + ".tmp.npz", path)
    except Exception:  # noqa: BLE001 — cache is an optimization only
        pass
    return wires, tx_packets


def _content_parity(found, tx_packets, decim):
    """Fraction of transmitted packets decoded with exact payload bytes on
    the right channel near the right position."""
    chan_of = {-25e3: "A", 25e3: "B"}
    remaining = list(found)
    matched = 0
    for tp in tx_packets:
        want_pos = tp.start_sample // decim
        want_chan = chan_of.get(tp.offset_hz, "A")
        hit = None
        for i, fp in enumerate(remaining):
            if (
                fp.payload == tp.payload
                and fp.designator == want_chan
                and abs(fp.abs_sample - want_pos) < 300
            ):
                hit = i
                break
        if hit is not None:
            matched += 1
            remaining.pop(hit)
    return matched / max(len(tx_packets), 1)


def _fan_parity(found, tx_packets, decim, step_chan, n_steps, base=0):
    """Content parity for a fan window that submitted wire 0 for every
    step: step base+i re-decodes the whole scene shifted by
    (base+i)*step_chan, so the full expected packet set is
    n_steps x tx_packets at known positions.  Steps are step_chan
    (~750k channel samples) apart — far beyond the dedup window — so no
    cross-step suppression occurs."""
    from collections import defaultdict

    chan_of = {-25e3: "A", 25e3: "B"}
    by_key = defaultdict(list)
    for fp in found:
        by_key[(fp.designator, fp.payload)].append(fp.abs_sample)
    matched = 0
    for i in range(n_steps):
        for tp in tx_packets:
            want = (base + i) * step_chan + tp.start_sample // decim
            lst = by_key.get(
                (chan_of.get(tp.offset_hz, "A"), tp.payload), []
            )
            hit = next(
                (j for j, pos in enumerate(lst) if abs(pos - want) < 300),
                None,
            )
            if hit is not None:
                matched += 1
                lst.pop(hit)
    return matched / max(n_steps * len(tx_packets), 1)


def _enable_cache(jax):
    """Persistent executable cache: the tunnel's remote compile service
    takes ~15 min for the wideband program; cache hits load in ~40 s."""
    jax.config.update("jax_compilation_cache_dir", CACHE_DIR)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)


def _geometry():
    import dataclasses

    from ais_tpu.pipeline.wideband import WidebandConfig, num_taps

    # Right-size the burst table to the d2h budget: full TDMA load
    # MEASURES up to 17 detections per (channel, block) (one per
    # 26.67 ms slot in an 11760-channel-sample core, plus correlator
    # double-fires) — K=16 trips overflow recovery at host cost, so
    # K=24 carries the measured peak with ~40% margin while cutting the
    # per-step record fetch 25% (~1.06 MB -> 0.80 MB at ~10 MB/s tunnel
    # d2h, VERDICT r3 task 2); overflow recovery (pipeline/recover.py)
    # backstops pathological blocks instead of dropping packets.
    cfg = WidebandConfig()
    cfg = cfg._replace(
        demod=dataclasses.replace(cfg.demod, max_bursts_per_block=24)
    )
    # Valid-lane d2h compaction (pipeline/wideband.py:pack_wire_compact):
    # full load measures ~1300-1500 valid lanes of the 64-block
    # 3072-lane table (1174 packets + correlator double-fires), i.e.
    # ~11 per (channel, block) — 14/block-channel holds the peak with
    # ~25% margin while cutting the record fetch ~45%.  The bound MUST
    # scale with the call geometry (a fixed 1792 overflowed the
    # directory on every step of a 96-block call, sending every block
    # through host-side recovery).  Steps beyond the bound re-demod the
    # affected blocks via overflow recovery.  AIS_TPU_COMPACT_LANES=0
    # restores the dense fetch.
    # ~96 demod blocks per device call (~24 s of air time): the tunnel
    # charges ~20-25 ms fixed dispatch latency per call, so bigger calls
    # lift the exec ceiling (310 -> 580 Msps exec-only from 16 -> 64
    # blocks); with the batched host decode and the compacted fetch the
    # back half no longer penalizes large calls.  Measured r5 on the
    # fan: 64 blocks 246.1 best / 190.7 median, 96 blocks 291.7 best /
    # 269.3 median (exec_ms/sample drops ~18% — the fixed dispatch
    # amortizes); r4's 128-block attempt lost at the pre-compaction
    # fetch sizes.
    n_blocks = int(os.environ.get("AIS_TPU_BENCH_BLOCKS", "96"))
    cl = int(
        os.environ.get("AIS_TPU_COMPACT_LANES", str(14 * 2 * n_blocks))
    )
    cfg = cfg._replace(compact_lanes=cl)
    n48 = cfg.block_len + cfg.core_len * (n_blocks - 1)
    n_in = (n48 - 1) * cfg.decimation + num_taps(cfg)
    return cfg, n_in


def _split(stats: dict | None) -> dict | None:
    """Render a collect_stats dict as per-step ms + fetch fraction."""
    if not stats or not stats.get("steps"):
        return None
    n = stats["steps"]
    tot = stats["fetch_s"] + stats["host_s"]
    out = {
        "fetch_ms_per_step": round(stats["fetch_s"] / n * 1e3, 1),
        "host_ms_per_step": round(stats["host_s"] / n * 1e3, 1),
        "fetch_frac_of_collect": round(stats["fetch_s"] / tot, 3) if tot else None,
        "steps": n,
    }
    # Fan workers report the full phase split (multiproc.py): time
    # blocked on h2d, exec-lock wait, dispatch+exec, d2h, h2d enqueue.
    for key, label in (
        ("transfer_wait_s", "h2d_wait_ms_per_step"),
        ("lock_wait_s", "lock_wait_ms_per_step"),
        ("exec_s", "exec_ms_per_step"),
        ("stage_s", "stage_ms_per_step"),
    ):
        if stats.get(key):
            out[label] = round(stats[key] / n * 1e3, 1)
    return out


# ---------------------------------------------------------------------------
# Child (one backend measurement in its own process)
# ---------------------------------------------------------------------------

_BEST: dict | None = None  # child: latest result; parent: final answer


def _emit(result: dict) -> None:
    """Print a (possibly provisional) result line and remember it."""
    global _BEST
    _BEST = result
    print(json.dumps(result), flush=True)


def _child_sig(signum, frame):  # noqa: ARG001 — signal API
    """External kill: the latest emitted line is already on stdout; just
    exit cleanly so the parent's reader sees EOF promptly."""
    os._exit(0 if _BEST is not None else 1)


def _result(msps, parity, extra: dict) -> dict:
    detail = {
        "wire_format": WIRE_FMT,
        "realtime_multiple_at_2p4Msps": round(msps / 2.4, 1),
        "packet_parity_warmup": round(parity, 4),
    }
    detail.update(extra)
    if parity < 1.0:
        detail["warning"] = "packet parity below 1.0"
    return {
        "metric": "wideband_iq_msamples_per_sec_per_chip",
        "value": round(msps, 2),
        "unit": "Msamples/s (2.4 Msps dual-channel AIS decode, end-to-end)",
        "vs_baseline": round(msps / BASELINE_MSPS, 1),
        "detail": detail,
    }


def measure(backend: str) -> int:
    """One backend's measurement; emits progressively better JSON lines."""
    signal.signal(signal.SIGTERM, _child_sig)
    signal.signal(signal.SIGINT, _child_sig)
    import jax

    if backend == "cpu":
        jax.config.update("jax_platforms", "cpu")
    elif jax.default_backend() == "cpu":
        # The tunnel did not register (or came up dead): fail FAST with
        # a clear reason instead of silently measuring CPU under the
        # TPU label — the parent retries once and then falls back to
        # the labeled cpu child.
        raise RuntimeError(
            f"tpu backend requested but devices are {jax.devices()}"
        )
    _enable_cache(jax)

    from ais_tpu.pipeline.wideband import WidebandReceiver

    cfg, n_in = _geometry()

    # Launch the ingest-fan workers FIRST (TPU only): their serialized
    # ~150 s-plus warmups then overlap scene load, the parent's own
    # compile, and the whole single-process phase — in round 4 the fan
    # started warming only after all of that and burned 1199 s of a
    # 1500 s budget delivering nothing (VERDICT r4 item 1).  The parent
    # holds the shared exec lock until its own warmup decode is done so
    # the workers' lock-held warmup executions cannot degrade the
    # critical path to the first emitted headline.
    fan = None
    fan_note = None
    t_fan_launch = time.time()
    fan_workers = int(os.environ.get("AIS_TPU_FAN_WORKERS", "5"))
    # AIS_TPU_BENCH_FAN=1 forces the fan on the CPU backend — a flow
    # test for this orchestration (the real fan exists for the tunnel's
    # per-connection h2d FIFO, which CPU does not have).
    fan_enabled = backend == "tpu" or os.environ.get("AIS_TPU_BENCH_FAN") == "1"
    if fan_enabled and fan_workers > 0:
        try:
            from ais_tpu.pipeline.multiproc import MultiProcessWideband

            fan = MultiProcessWideband(
                cfg,
                n_in=n_in,
                n_workers=fan_workers,
                fmt=WIRE_FMT,
                platform=None if backend == "tpu" else "cpu",
                cache_dir=CACHE_DIR,
            )
            fan.hold_exec()
            fan.launch()
        except Exception as e:  # noqa: BLE001 — fan is an optimization only
            fan, fan_note = None, f"launch: {type(e).__name__}: {e}"[:160]

    rx = WidebandReceiver(cfg, n_in=n_in)
    n_in = rx.n_in  # decim-aligned

    t0 = time.time()
    wires, tx_packets = _load_wires(cfg, n_in, rx.step_raw)
    scene_s = time.time() - t0

    # Warm-up: compile + content-parity check.
    t0 = time.time()
    found = rx.decode_wire(wires[0], WIRE_FMT)
    compile_s = time.time() - t0
    parity = _content_parity(found, tx_packets, cfg.decimation)

    base_detail = {
        "backend": str(jax.devices()[0]),
        "tx_packets_per_call": len(tx_packets),
        "n_in_per_call": n_in,
        "scene_s": round(scene_s, 1),
        "compile_s": round(compile_s, 1),
    }

    # Provisional number the moment compile is done: one timed decode.
    # If the budget dies during the real windows, this line survives.
    t0 = time.time()
    n_pkts = len(rx.decode_wire(wires[1 % N_WIRES], WIRE_FMT))
    dt1 = time.time() - t0
    msps1 = n_in / dt1 / 1e6
    _emit(
        _result(
            msps1,
            parity,
            {
                **base_detail,
                "mode": "single-process",
                "phase": "provisional (1 step)",
                "packets_per_sec": round(n_pkts / dt1, 1),
            },
        )
    )
    # A headline exists: let the fan workers' lock-held warmups proceed,
    # overlapping the single-process windows below.  One worker warms at
    # a time (they serialize on the exec lock), so at most two clients
    # ever execute concurrently on the shared service.
    if fan is not None:
        fan.release_exec()

    # Steady state, two loop shapes per window:
    #   serial   — submit/collect one step at a time.  On the tunnel TPU
    #     this wins: the per-connection h2d channel is a strict FIFO
    #     (transfers, dispatch, fetch never overlap), so queueing only
    #     adds overhead.
    #   depth-2  — submit N+1 before collecting N.  On backends with a
    #     real async stream (CPU, PCIe TPUs) this overlaps host decode
    #     with device compute.
    # Several measurement windows; best AND median are reported (the dev
    # TPU rides a shared tunnel whose bandwidth wanders minute-to-minute
    # — the peak window is the capability number, the median the
    # expectation; both backends get identical treatment).
    iters, max_windows = 8, 3

    def run_window(depth: int):
        pkts, host_s, sub = 0, 0.0, 0

        def submit():
            nonlocal sub
            h = rx.submit_wire(wires[sub % N_WIRES], WIRE_FMT)
            sub += 1
            return h

        t0 = time.time()
        pending = [submit() for _ in range(depth)]
        done = 0
        while pending:
            th = time.time()
            pkts += len(rx.collect(pending.pop(0)))
            host_s += time.time() - th
            done += 1
            if done + len(pending) < iters:
                pending.append(submit())
        return time.time() - t0, pkts, host_s

    # Budget reserve for the fan phase (its workers have been warming
    # since the top of measure(), so the reserve covers only the fan's
    # parity window + a few timed windows): below it we skip ahead so
    # SOMETHING measured is always emitted — a tunnel-side recompile
    # stall in the single-process phase (measured once at 578 s) must
    # not starve the fan, which is where the headline comes from.
    fan_reserve = 240.0 if backend == "tpu" else 0.0

    sp_windows: list[float] = []  # per-window msps
    best = None  # (dt, pkts, host_s, depth, split)
    for _w in range(max_windows):
        for depth in (1, 2):
            rx.reset_collect_stats()
            dt, pkts, host_s = run_window(depth)
            sp_windows.append(n_in * iters / dt / 1e6)
            if best is None or dt < best[0]:
                best = (dt, pkts, host_s, depth, dict(rx.collect_stats))
        if _remaining() < fan_reserve + 90:
            break
    best_dt, total_pkts, host_s, best_depth, best_split = best
    msps = n_in * iters / best_dt / 1e6
    sp_sorted = sorted(sp_windows)
    sp_median = sp_sorted[len(sp_sorted) // 2]

    detail = {
        **base_detail,
        "mode": "single-process",
        "packets_per_sec": round(total_pkts * msps * 1e6 / (n_in * iters), 1),
        "single_process_msps": round(msps, 2),
        "single_process_median_msps": round(sp_median, 2),
        "window_msps": [round(v, 1) for v in sp_windows],
        "collect_frac": round(host_s / best_dt, 3),
        "collect_split": _split(best_split),
        "pipeline_depth": best_depth,
    }
    if fan is not None:
        # Honest labeling: these windows deliberately run while fan
        # workers warm (one at a time, under the exec lock), so windows
        # colliding with a warmup execution measure a degraded shared
        # service — best is unaffected, the median reads low.
        detail["sp_windows_overlap_worker_warmups"] = True
    _emit(_result(msps, parity, detail))

    # Multi-connection ingest fan (TPU only): the tunnel's h2d channel
    # is a per-connection FIFO, but bandwidth aggregates across client
    # connections; with executions lock-serialized the fan roughly
    # doubles sustained ingest (pipeline/multiproc.py).  One chip, one
    # host — the fan is ingest orchestration, not extra compute.
    #
    # Survivability contract (VERDICT r4 item 1 — the fan missed the
    # official capture two rounds running): the workers have been
    # warming since the top of measure(); from here on NOTHING may
    # raise.  The parent keeps sampling single-process windows while
    # polling for the first warm worker, then measures with WHOEVER is
    # warm — the parent's own thread joins the fan over its already-warm
    # receiver (parent_pump), so even one warm worker means two
    # connections; stragglers join mid-phase through the shared pull
    # queue.  Worker-count adaptivity is implicit: early windows run the
    # few-fat-connection configuration, later windows the wide one, and
    # best/median are reported across all of them.
    if fan is not None and _remaining() > 120:
        try:
            fan_detail: dict = {
                "fan_workers": fan.n_workers,
                # Workers launched at t=0: age of the fleet when the fan
                # phase begins (all of it overlapped the phases above).
                "fan_launch_age_s": round(time.time() - t_fan_launch, 1),
            }
            # Poll for the first warm worker; between polls keep
            # improving the single-process sample (each window ~2-4 s,
            # and the tunnel wanders, so more samples help the best).
            t_wait0 = time.time()
            while (
                fan.wait_ready(timeout=15.0, min_ready=1) == 0
                and _remaining() > 240
            ):
                rx.reset_collect_stats()
                dt, pkts, host_s = run_window(best_depth)
                sp_windows.append(n_in * iters / dt / 1e6)
                if dt < best_dt:
                    best_dt, best_split = dt, dict(rx.collect_stats)
                    msps = n_in * iters / best_dt / 1e6
                    sp_sorted = sorted(sp_windows)
                    detail = {
                        **detail,
                        "single_process_msps": round(msps, 2),
                        "single_process_median_msps": round(
                            sp_sorted[len(sp_sorted) // 2], 2
                        ),
                        "window_msps": [round(v, 1) for v in sp_windows],
                        "collect_split": _split(best_split),
                    }
                    _emit(_result(msps, parity, detail))
            fan_detail["fan_first_ready_s"] = round(time.time() - t_wait0, 1)
            fan_detail["fan_ready_at_start"] = fan._ready
            if fan.worker_errors:
                fan_detail["fan_worker_errors"] = "; ".join(
                    fan.worker_errors
                )[:200]
            detail = {**detail, **fan_detail}
            _emit(_result(msps, parity, detail))

            if fan._ready > 0:
                # 24 steps per window: with ~6 pull-queue participants a
                # 16-step window spends a large fraction in the drain
                # tail (each participant gets only ~2.7 steps); 4 steps
                # per participant dilutes ramp + tail in the measured
                # number.
                # 32 steps per window (was 24): in unlocked mode the
                # window's ramp (staggered first dispatches) and drain
                # tail (last straggler) dilute the measured rate by
                # ~10-15% at 24 steps; 32 cuts that to ~8-10% while a
                # worst-case degraded window (~145 Msps) still fits in
                # ~12.5 s.  Both r5 validation runs finished with >half
                # their budget to spare.
                fan_iters = int(
                    os.environ.get("AIS_TPU_FAN_ITERS", str(4 * iters))
                )
                step_chan = rx.step_raw // cfg.decimation

                def fan_window(parity_check: bool, base: int = 0):
                    """One timed fan window; the parent thread pumps the
                    shared queue alongside the workers.  parity_check
                    windows submit only wire 0 so every step's expected
                    packet set is known exactly (mixed-wire windows keep
                    the transport honest — no repeated bytes).  `base`
                    offsets the step indices: a parity RETRY must replay
                    at stream positions no deduper (parent's or any
                    worker's) has seen, or the replayed packets would be
                    suppressed and read as a parity miss."""
                    fan.reset_collect_stats()
                    t0 = time.time()
                    for i in range(fan_iters):
                        fan.submit(
                            base + i,
                            wires[0 if parity_check else i % N_WIRES],
                        )
                    fan.parent_pump(rx)
                    got = fan.drain(timeout=max(20.0, _remaining() - 40))
                    dt = time.time() - t0
                    p = (
                        _fan_parity(
                            got, tx_packets, cfg.decimation, step_chan,
                            fan_iters, base=base,
                        )
                        if parity_check
                        else None
                    )
                    return dt, p

                # Window 0: parity-checked (identical wire bytes each
                # step, so its time is excluded from the reported
                # windows — transport caches could flatter it).
                fan_parity = None
                for _attempt in range(2):  # one retry: the parity gate
                    # is load-bearing for the fan headline, so a single
                    # transient (worker death, drain timeout) must not
                    # forfeit the whole phase.
                    try:
                        # The parity window replays step positions the
                        # single-process phase already decoded on the
                        # parent's receiver: drop its dedup history so a
                        # surviving same-position entry cannot read as a
                        # parity miss; the retry additionally shifts to
                        # step indices no deduper has ever seen.
                        rx.reset_dedup()
                        dt0, fan_parity = fan_window(
                            parity_check=True, base=_attempt * 4096
                        )
                        fan_detail["fan_parity"] = round(fan_parity, 4)
                        fan_detail["fan_parity_window_msps"] = round(
                            n_in * fan_iters / dt0 / 1e6, 1
                        )
                        break
                    except Exception as e:  # noqa: BLE001
                        fan.abandon_outstanding()
                        fan_detail["fan_parity_error"] = (
                            f"{type(e).__name__}: {e}"[:160]
                        )
                        if _remaining() < 200:
                            break
                detail = {**detail, **fan_detail}
                _emit(_result(msps, parity, detail))

                fan_windows: list[float] = []
                fan_locked: list[bool] = []  # parallel: window ran locked?
                fan_best = None
                fan_max_windows = int(
                    os.environ.get("AIS_TPU_FAN_WINDOWS", "12")
                )
                # Unlocked fan windows (round 5): tools/tpu_fan_exec_probe
                # duo measured two concurrent clients each running the
                # full benched program at the solo ~51 ms/call — the
                # round-3 "concurrent executions thrash (~29 s/step)"
                # regime is gone from the current service, making the
                # exec lock the fan's own bottleneck (locked dispatches
                # measure ~158 ms under fan load vs ~54 solo).  The
                # proven locked windows run FIRST (the guaranteed
                # number), then the lock is dropped; the unlocked
                # windows must clear their own parity gate, and a >20%
                # regression vs the locked best re-locks for the rest of
                # the phase.  AIS_TPU_FAN_UNLOCK_AFTER=-1 disables.
                unlock_after = int(
                    os.environ.get("AIS_TPU_FAN_UNLOCK_AFTER", "4")
                )
                unlocked = False
                n_unlocked = 0
                for _w in range(fan_max_windows):
                    if _remaining() < 75:
                        break
                    if (
                        not unlocked
                        and unlock_after >= 0
                        and _w >= unlock_after
                        and fan._ready >= 1
                    ):
                        fan.set_serialize_exec(False)
                        unlocked = True
                        try:
                            # Unlocked parity gate: same wire-0 replay
                            # as window 0, at fresh step positions, time
                            # excluded from the reported windows.
                            rx.reset_dedup()
                            _dtn, p_nolock = fan_window(
                                parity_check=True, base=8192
                            )
                            fan_detail["fan_parity_nolock"] = round(
                                p_nolock, 4
                            )
                        except Exception as e:  # noqa: BLE001
                            fan.abandon_outstanding()
                            fan_detail["fan_parity_nolock_error"] = (
                                f"{type(e).__name__}: {e}"[:160]
                            )
                            p_nolock = None
                        if not (p_nolock or 0) >= 0.999:
                            fan.set_serialize_exec(True)
                            unlocked = False
                            unlock_after = -1  # failed the gate: stay locked
                    try:
                        dt, _ = fan_window(parity_check=False)
                    except Exception as e:  # noqa: BLE001
                        fan.abandon_outstanding()
                        fan_detail["fan_window_error"] = (
                            f"{type(e).__name__}: {e}"[:160]
                        )
                        if unlocked:
                            # A failed unlocked window (drain timeout =
                            # the thrash regime resurfacing) forfeits
                            # unlocked mode, not the phase.
                            fan.set_serialize_exec(True)
                            unlocked = False
                            unlock_after = -1
                            continue
                        if _remaining() < 150:
                            break
                        continue
                    fan_windows.append(n_in * fan_iters / dt / 1e6)
                    fan_locked.append(not unlocked)
                    n_unlocked += int(unlocked)
                    if unlocked and n_unlocked >= 2:
                        locked_best = max(
                            (
                                v
                                for v, lk in zip(fan_windows, fan_locked)
                                if lk
                            ),
                            default=None,
                        )
                        unlocked_best = max(
                            v
                            for v, lk in zip(fan_windows, fan_locked)
                            if not lk
                        )
                        if (
                            locked_best is not None
                            and unlocked_best < 0.8 * locked_best
                        ):
                            fan.set_serialize_exec(True)
                            unlocked = False
                            unlock_after = -1
                    if fan_best is None or dt < fan_best[0]:
                        fan_best = (dt, dict(fan.collect_stats))
                    fan_msps = max(fan_windows)
                    fs = sorted(fan_windows)
                    fan_detail.update(
                        {
                            "fan_msps": round(fan_msps, 2),
                            "fan_median_msps": round(fs[len(fs) // 2], 2),
                            "fan_window_msps": [
                                round(v, 1) for v in fan_windows
                            ],
                            "fan_window_locked": [
                                int(lk) for lk in fan_locked
                            ],
                            "fan_collect_split": _split(fan_best[1]),
                            "fan_h2d_mbps_per_conn": list(fan.h2d_mbps),
                            "fan_ready_now": fan._ready,
                        }
                    )
                    # The fan headline requires its own parity evidence:
                    # a window-0 content-parity of 1.0 (warmup parity
                    # covered only the single-process path).
                    if fan_msps > msps and (fan_parity or 0) >= 0.999:
                        best_was_unlocked = not fan_locked[
                            fan_windows.index(max(fan_windows))
                        ]
                        _emit(
                            _result(
                                fan_msps,
                                parity,
                                {
                                    **detail,
                                    "mode": (
                                        f"fan-{fan._ready}w+parent"
                                        + (
                                            "-nolock"
                                            if best_was_unlocked
                                            else ""
                                        )
                                    ),
                                    **fan_detail,
                                },
                            )
                        )
                    else:
                        # Fan not (yet) winning: keep the single-process
                        # headline but publish the fan numbers — a
                        # silent fan phase is indistinguishable from a
                        # skipped one.
                        _emit(
                            _result(
                                msps, parity, {**detail, **fan_detail}
                            )
                        )
                    if _remaining() < 60:
                        break
                if not fan_windows:
                    # Every timed window failed: the errors must still
                    # reach the record (the per-window emits never ran).
                    _emit(_result(msps, parity, {**detail, **fan_detail}))
            else:
                fan_detail["fan_error"] = (
                    f"0/{fan.n_workers} workers warm with "
                    f"{_remaining():.0f}s budget left — measured "
                    f"single-process only"
                )
                _emit(_result(msps, parity, {**detail, **fan_detail}))
        except Exception as e:  # noqa: BLE001 — fan is an optimization only
            if _BEST is not None and "detail" in _BEST:
                _BEST["detail"]["fan_error"] = f"{type(e).__name__}: {e}"[:200]
                _emit(_BEST)
    elif fan is None and fan_note and _BEST is not None:
        _BEST["detail"]["fan_error"] = fan_note
        _emit(_BEST)

    if fan is not None:
        try:
            fan.close()
        except Exception:  # noqa: BLE001
            pass
    return 0


def _inner(backend: str) -> int:
    # The TPU measurement later spawns fan workers that share the chip
    # with this process: nobody may preallocate the default ~75% of HBM.
    os.environ.setdefault("XLA_PYTHON_CLIENT_PREALLOCATE", "false")
    os.environ.setdefault("XLA_PYTHON_CLIENT_MEM_FRACTION", "0.3")
    try:
        return measure(backend)
    except Exception as e:  # noqa: BLE001
        if _BEST is None:
            print(json.dumps({"error": f"{type(e).__name__}: {e}"[:300]}), flush=True)
            return 1
        return 0  # a provisional line already went out — that stands


# ---------------------------------------------------------------------------
# Parent (orchestrates backends, owns the final line)
# ---------------------------------------------------------------------------

_CHILD: subprocess.Popen | None = None


def _parent_sig(signum, frame):  # noqa: ARG001 — signal API
    """Driver timeout (SIGTERM): kill the child, give its reader a beat
    to pick up the last line, print the best-so-far, exit 0."""
    if _CHILD is not None and _CHILD.poll() is None:
        try:
            _CHILD.terminate()
        except Exception:  # noqa: BLE001
            pass
        time.sleep(1.0)
    _finalize()


def _finalize() -> None:
    if _BEST is not None:
        print(json.dumps(_BEST), flush=True)
        os._exit(0)
    print(
        json.dumps(
            {
                "metric": "wideband_iq_msamples_per_sec_per_chip",
                "value": 0,
                "unit": "Msamples/s",
                "vs_baseline": 0,
                "detail": {"error": "no backend produced a result in budget"},
            }
        ),
        flush=True,
    )
    os._exit(1)


def _run_backend(backend: str, deadline: float, soft_deadline: float | None = None):
    """Run one backend child, streaming its stdout; returns the last
    valid JSON result it printed (or None) + an error string.

    `soft_deadline`: if the child has produced NO result line by this
    time, kill it there instead of at `deadline` — a TPU child stuck on
    an unresponsive tunnel must not eat the CPU fallback's budget."""
    global _CHILD
    proc = subprocess.Popen(
        [sys.executable, "-u", os.path.abspath(__file__), f"--backend={backend}"],
        stdout=subprocess.PIPE,
        stderr=subprocess.PIPE,
        text=True,
    )
    _CHILD = proc
    last: list = [None]
    err: list = [None]
    stderr_tail: list = [""]

    def reader():
        for line in proc.stdout:
            line = line.strip()
            if not line.startswith("{"):
                continue
            try:
                payload = json.loads(line)
            except ValueError:
                continue
            if "error" in payload:
                err[0] = f"{backend}: {payload['error'][:200]}"
            else:
                last[0] = payload

    def err_reader():
        # Drain stderr (JAX is chatty there); keep only a tail.  An
        # undrained PIPE would deadlock the child once the buffer fills.
        for line in proc.stderr:
            stderr_tail[0] = (stderr_tail[0] + line)[-400:]

    th = threading.Thread(target=reader, daemon=True)
    th.start()
    the = threading.Thread(target=err_reader, daemon=True)
    the.start()
    timed_out = False
    if soft_deadline is not None:
        try:
            proc.wait(timeout=max(5.0, soft_deadline - time.time()))
        except subprocess.TimeoutExpired:
            timed_out = last[0] is None  # nothing yet: give up early
    if not timed_out and proc.poll() is None:
        try:
            proc.wait(timeout=max(5.0, deadline - time.time()))
        except subprocess.TimeoutExpired:
            timed_out = True
    if timed_out:
        proc.terminate()
        try:
            proc.wait(timeout=10)
        except subprocess.TimeoutExpired:
            proc.kill()
        if err[0] is None and last[0] is None:
            err[0] = f"{backend}: timeout with no provisional result"
    th.join(timeout=5)
    the.join(timeout=5)
    _CHILD = None
    payload = last[0]
    if payload is None:
        return None, err[0] or (
            f"{backend}: rc={proc.returncode} {stderr_tail[0][-200:]}"
        )
    if payload.get("detail", {}).get("packet_parity_warmup", 0) < 0.98:
        return None, (
            f"{backend}: parity "
            f"{payload['detail'].get('packet_parity_warmup')} < 0.98"
        )
    return payload, None


def main() -> int:
    global _BEST
    if len(sys.argv) > 1 and sys.argv[1].startswith("--backend="):
        return _inner(sys.argv[1].split("=", 1)[1])

    signal.signal(signal.SIGTERM, _parent_sig)
    signal.signal(signal.SIGINT, _parent_sig)

    # The metric is per-TPU-chip: the TPU measurement is the headline
    # whenever it is valid; the CPU backend is a cross-check run only if
    # budget remains (and the clearly-labeled fallback if the TPU is
    # down).
    errors = []
    # Leave ~45 s of parent slack before the external deadline, and a
    # CPU-fallback reserve in case the TPU child never gets a number
    # out (unresponsive tunnel): a child that HAS emitted a line may
    # run to the full deadline; one that hasn't is cut at the soft one.
    tpu, err = _run_backend(
        "tpu", DEADLINE - 45, soft_deadline=DEADLINE - 45 - 420
    )
    if err:
        errors.append(err)
    if tpu is None and _remaining() > 600:
        # Transient tunnel failures (backend falling back mid-run, a
        # dead compile-service episode) killed the 96-block experiment
        # run this round; with the scene and executable caches warm a
        # second attempt is cheap and has minutes to produce a
        # provisional line before the CPU fallback reserve.
        tpu, err = _run_backend(
            "tpu",
            DEADLINE - 45,
            soft_deadline=time.time() + max(120.0, _remaining() - 360),
        )
        if err:
            errors.append(err)
    if tpu is not None:
        _BEST = tpu
        if errors:
            tpu["detail"]["errors"] = "; ".join(errors)[:300]

    cpu = None
    if _remaining() > 420 or tpu is None:
        cpu, err = _run_backend("cpu", DEADLINE - 20)
        if err:
            errors.append(err)

    if tpu is not None:
        if cpu is not None:
            tpu["detail"]["cpu_crosscheck_msps"] = cpu["value"]
        _BEST = tpu
    elif cpu is not None:
        cpu["detail"]["backend"] = f"cpu-fallback ({cpu['detail']['backend']})"
        cpu["detail"]["errors"] = "; ".join(errors)[:300]
        _BEST = cpu
    elif errors:
        _BEST = None
    _finalize()
    return 0  # unreachable; _finalize exits


if __name__ == "__main__":
    raise SystemExit(main())
