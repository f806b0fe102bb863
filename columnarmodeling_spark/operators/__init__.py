"""Reusable distributed operators (the engine's physical-technique layer)."""
