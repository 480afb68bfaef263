"""Jitted simulation loops, configs, metrics."""
