from ais_tpu.ops.firdes import gaussian, gmsk_phase_taps, low_pass  # noqa: F401
