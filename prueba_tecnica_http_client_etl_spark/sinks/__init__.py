"""Sinks: file writers (K1-K4) and driver-side report rendering (K5-K6)."""
