"""Scheduler-independent DSP kernels (≈ reference algorithm/): FFT/windows, FIR/IIR,
filter design, resampling, NCO/waveforms, noise. Pure functions over jax arrays."""
