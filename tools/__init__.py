"""Bench/audit scripts — a package so shared helpers import cleanly."""
