"""Streaming tier: Structured Streaming formulation of the 6-hour poll loop."""
