"""Report tier: driver-side JSON situation-report assembly (reports.py)."""
