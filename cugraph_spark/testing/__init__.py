"""Testing/oracle helpers (cross-engine determinism utilities)."""
