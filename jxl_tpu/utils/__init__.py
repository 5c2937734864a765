"""Utility subsystems: tracing/metrics (trace.py)."""
