"""Reference-parity oracles (seeded NumPy reimplementations)."""
