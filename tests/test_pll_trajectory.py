"""Trajectory-level parity of the MSK timing PLL port.

`ais_tpu.sync.timing.msk_timing_recovery` claims line-level fidelity to
the reference loop (lib/msk_timing_recovery_cc_impl.cc:107-206).  Packet
level e2e tests cannot catch a sign or ordering slip that still decodes
clean packets, so this file simulates the reference's published loop
equations independently in plain numpy — transcribed from the C++
equations, sharing nothing with sync/timing.py except the interpolator
bank (itself unit-tested in test_ops.py) — and asserts the (err, mu,
symbol) sequences match sample for sample.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from ais_tpu.ops.interp import DELAY, NSTEPS, NTAPS, interp_taps
from ais_tpu.sync.timing import msk_timing_recovery
from ais_tpu.tx.gmsk import modulate_bits


def reference_loop(x, mu0, sps, gain, limit, n_symbols, start_index=1):
    """Literal numpy transcription of the reference's general_work loop
    (lib/msk_timing_recovery_cc_impl.cc:138-202), run burst-scoped:

      - d_sps = sps/2 (ctor, :70): loop steps half a symbol at a time;
      - tag seeding with the mu<0 adjustment (:148-153);
      - nonlinearity e = Re[y^2 conj(y_prev)^2 - prev_nlin] (:170-178);
      - on odd iterations: err clipped to +-3, omega += (gain^2/4) err
        then clamped to d_sps +- limit, mu += gain*err (:179-184);
      - output every even iteration (:186-191);
      - advance mu += omega; iidx += floor(mu); mu -= floor(mu) (:198-201).
    """
    f32 = np.float32  # loop state in float32, like the C++ (float members)
    bank = interp_taps()
    half_sps = f32(sps / 2.0)
    gain = f32(gain)
    gain_omega = f32(gain * gain * 0.25)
    limit = f32(limit)
    mu = f32(mu0)
    iidx = int(start_index)
    if mu < 0:
        mu = f32(mu + 1.0)
        iidx -= 1
    omega = half_sps
    div = 0
    prev_y = np.complex64(0)
    prev_nlin = np.complex64(0)
    errs, mus, syms = [], [], []
    for _ in range(2 * n_symbols):
        if iidx + NTAPS > x.size:
            break
        row = bank[min(max(int(round(mu * NSTEPS)), 0), NSTEPS)]
        y = np.complex64(np.sum(x[iidx : iidx + NTAPS] * row))
        nlin = np.complex64((y * y) * np.conj(prev_y * prev_y))
        err = f32(np.real(nlin - prev_nlin))
        if div % 2 == 1:
            err_c = f32(min(max(err, f32(-3.0)), f32(3.0)))
            omega = f32(omega + gain_omega * err_c)
            omega = f32(half_sps + min(max(f32(omega - half_sps), -limit), limit))
            mu = f32(mu + gain * err_c)
        else:
            syms.append(y)
            errs.append(err)
            mus.append(mu)
        div += 1
        prev_y = y
        prev_nlin = nlin
        mu = f32(mu + omega)
        shift = np.floor(mu)
        iidx += int(shift)
        mu = f32(mu - shift)
    return np.array(syms), np.array(errs), np.array(mus)


def _test_burst(seed=0, frac_delay=0.3, snr_scale=0.02, n_bits=120, sps=5):
    rng = np.random.default_rng(seed)
    bits = rng.integers(0, 2, n_bits)
    x = np.asarray(modulate_bits(bits, sps, 0.4)).astype(np.complex64)
    # Fractional delay via the same bank (moves the true symbol phase off
    # the integer grid so the loop has something to track).
    row = interp_taps()[int(round(frac_delay * NSTEPS))]
    x = np.convolve(x, row[::-1]).astype(np.complex64)[NTAPS:-NTAPS]
    x = x + (rng.normal(size=x.size) + 1j * rng.normal(size=x.size)).astype(
        np.complex64
    ) * snr_scale
    return x.astype(np.complex64)


class TestPllTrajectory:
    @pytest.mark.parametrize("mu0", [-0.4, 0.0, 0.3, 0.7])
    def test_err_mu_symbol_sequences_match(self, mu0):
        sps, gain, limit = 5.0, 0.04, 0.01
        x = _test_burst(seed=int(abs(mu0) * 10))
        n_symbols = 80
        ref_syms, ref_errs, ref_mus = reference_loop(
            x, mu0, sps, gain, limit, n_symbols
        )
        tr = msk_timing_recovery(
            jnp.asarray(x), jnp.float32(mu0), sps, gain, limit, n_symbols
        )
        valid = np.asarray(tr.valid)
        n = min(int(valid.sum()), ref_syms.size)
        assert n >= 70  # the trajectory actually ran the packet length
        # Tolerance covers float32 (jax) vs float64 (oracle) accumulation
        # drift over the feedback loop — a sign or ordering slip produces
        # O(0.1+) divergence, 100x past this bound.
        np.testing.assert_allclose(
            np.asarray(tr.err)[:n], ref_errs[:n], rtol=1e-3, atol=2e-3
        )
        np.testing.assert_allclose(
            np.asarray(tr.mu)[:n], ref_mus[:n], rtol=1e-3, atol=2e-3
        )
        np.testing.assert_allclose(
            np.asarray(tr.symbols)[:n], ref_syms[:n], rtol=1e-3, atol=2e-3
        )

    def test_loop_converges_toward_true_offset(self):
        # Sanity on the oracle itself: with a 0.3-sample fractional delay
        # and a 0 seed, the locked mu trajectory must drift away from the
        # seed (the loop is doing something, not idling).
        sps, gain, limit = 5.0, 0.04, 0.01
        x = _test_burst(frac_delay=0.3)
        _, _, mus = reference_loop(x, 0.0, sps, gain, limit, 80)
        assert np.abs(np.diff(mus)).sum() > 0.05
